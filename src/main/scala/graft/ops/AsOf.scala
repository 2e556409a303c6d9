package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time lookup) — an operator the reference's users
  * get from ksqlDB/PySpark and a staple of event pipelines.
  *
  * Implemented WITHOUT a pairwise range join: tag both sides, union them,
  * and run one window sort per key carrying the last right-side timestamp
  * forward. Cost is a single shuffle + sort on (key, ts) — linear in
  * |L| + |R|. The naive `L join R on key and r.ts <= l.ts` + max() explodes
  * quadratically per key and would not survive 100 TB; this shape does.
  *
  * Tie semantics: right rows sort before left rows at equal timestamps, so
  * the join is inclusive (right.ts == left.ts matches).
  */
object AsOf {
  /** Returns `left` plus a column `asofCol` = the greatest right-side `ts`
    * that is <= the left row's `ts` for the same `key` (null if none). */
  def lastRightTs(left: DataFrame, right: DataFrame, key: String, ts: String,
      asofCol: String = "asof_ts"): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rts", lit(null).cast(left.schema(ts).dataType))
    val r = right.select(col(key), col(ts))
      .withColumn("__side", lit(0))
      .withColumn("__rts", col(ts))
    // Align the right side onto the left schema (null-pad non-key columns).
    val rAligned = r.select(
      leftCols.map { c =>
        if (c == key || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(col("__side"), col("__rts")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(leftCols.map(col) ++ Seq(col("__side"), col("__rts")): _*)
      .unionByName(rAligned)
      .withColumn(asofCol, last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rts")
  }

  /** Tolerance-bounded as-of: [[lastRightTs]] whose match is discarded
    * (null) when staler than `tolerance` (e.g. "30 MINUTE") — the pandas
    * `merge_asof(tolerance=...)` contract, the guard that stops a
    * point-in-time enrichment from silently joining week-old state.
    * Same linear union + one-keyed-window shape; the staleness gate is
    * a codegen'd projection after the window. */
  def lastRightTsWithin(left: DataFrame, right: DataFrame, key: String,
      ts: String, tolerance: String,
      asofCol: String = "asof_ts"): DataFrame =
    lastRightTs(left, right, key, ts, asofCol)
      .withColumn(asofCol, when(
        col(asofCol) >= col(ts) - expr(s"INTERVAL $tolerance"), col(asofCol)))

  /** FORWARD as-of: `asofCol` = the smallest right-side `ts` that is >=
    * the left row's `ts` for the same `key` (null if none) — the
    * "next event after" lookup (first fill after an order, first
    * heartbeat after a deploy) that mirrors [[lastRightTs]]'s
    * point-in-time lookback. Same single union + one keyed window sort
    * — the frame flips to [current, unbounded following] with
    * `first(ignoreNulls)`; left rows sort before right rows at equal
    * timestamps so the match stays inclusive. Linear in |L| + |R| like
    * the backward form — never a pairwise range join. */
  def firstRightTs(left: DataFrame, right: DataFrame, key: String, ts: String,
      asofCol: String = "asof_ts"): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__side", lit(0))
      .withColumn("__rts", lit(null).cast(left.schema(ts).dataType))
    val r = right.select(col(key), col(ts))
      .withColumn("__side", lit(1))
      .withColumn("__rts", col(ts))
    val rAligned = r.select(
      leftCols.map { c =>
        if (c == key || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(col("__side"), col("__rts")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.select(leftCols.map(col) ++ Seq(col("__side"), col("__rts")): _*)
      .unionByName(rAligned)
      .withColumn(asofCol, first(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .drop("__side", "__rts")
  }

  /** Value-carrying backward as-of — the point-in-time (PIT) lookup
    * against a versioned dimension: `asofCol` = the right-side `valueCol`
    * from the row with the greatest right `ts` <= the left row's `ts`
    * for the same `key` (null if no version precedes). This is the
    * warehouse "dimension state at fact time" enrich over an SCD-style
    * version table, in the same linear union + one keyed window sort as
    * [[lastRightTs]] — never the quadratic `join on key and vf <= ts`
    * + arg_max the oracle cross-checks with. `right` must have at most
    * one row per (key, ts): dedupe versions first or the carried value
    * is sort-order-dependent. */
  def lastRightValue(left: DataFrame, right: DataFrame, key: String,
      ts: String, valueCol: String, asofCol: String = "asof_value"): DataFrame = {
    val leftCols = left.columns
    require(!leftCols.contains(valueCol),
      s"left already has a column named $valueCol")
    val vType = right.schema(valueCol).dataType
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(vType))
    val rAligned = right.select(col(key), col(ts), col(valueCol))
      .withColumn("__side", lit(0))
      .withColumn("__rv", col(valueCol))
      .select(
        leftCols.map { c =>
          if (c == key || c == ts) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)
        } ++ Seq(col("__side"), col("__rv")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(leftCols.map(col) ++ Seq(col("__side"), col("__rv")): _*)
      .unionByName(rAligned)
      .withColumn(asofCol, last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rv")
  }
}
