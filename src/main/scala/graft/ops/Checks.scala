package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint verification (the Deequ/Great-
  * Expectations "check suite" shape, distinct from [[Profile]]'s metric
  * sweep): each check is a named violation-count aggregate, the whole
  * suite evaluates in ONE aggregation pass over the table, and the output
  * is the audit relation a pipeline gates a publish on — (check_name,
  * n_violations, PASS/FAIL).
  *
  * Scale shape: row-predicate checks are conditional counts fused into a
  * single scan+aggregate; a uniqueness check adds an exact count-distinct
  * (Catalyst Expand — swap for approx_count_distinct when the exact
  * answer isn't worth that shuffle at 100 TB). Cross-table checks
  * (referential integrity) are anti-join counts on their own input and
  * union into the same report. Nothing row-sized reaches the driver.
  */
object Checks {
  /** Violating-row predicate check: counts rows where `violating` is
    * true (nulls don't count — write the predicate null-aware). */
  def rowCheck(name: String, violating: Column): (String, Column) =
    name -> count(when(violating, lit(1)))

  /** Uniqueness over a key: violations = n_rows − n_distinct(key). */
  def uniqueness(name: String, first: Column, rest: Column*): (String, Column) =
    name -> (count(lit(1)) - countDistinct(first, rest: _*))

  /** Evaluates the suite in one aggregation pass; returns one row per
    * check: (check_name, n_violations, status). */
  def verify(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val aggs = checks.zipWithIndex.map { case ((_, a), i) =>
      a.cast("long").as(s"__c$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case ((n, _), i) =>
      struct(lit(n).as("check_name"),
        col(s"__c$i").as("n_violations"),
        when(col(s"__c$i") === 0, lit("PASS")).otherwise(lit("FAIL"))
          .as("status"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
