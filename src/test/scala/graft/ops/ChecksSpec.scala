package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), 10.0),
    (2L, None, -1.0),
    (2L, Some("c"), 5.0),
    (3L, Some("dd"), 0.0)
  ).toDF("id", "name", "amt")

  test("verify: one row per check, violation counts and verdicts exact") {
    val out = Checks.verify(df, Seq(
      Checks.uniqueness("uniq_id", col("id")),
      Checks.rowCheck("complete_name", col("name").isNull),
      Checks.rowCheck("positive_amt", !(col("amt") > 0)),
      Checks.rowCheck("never_fires", col("id") < 0)
    )).collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(out == Map(
      "uniq_id" -> ((1L, "FAIL")),        // 4 rows, 3 distinct ids
      "complete_name" -> ((1L, "FAIL")),
      "positive_amt" -> ((2L, "FAIL")),   // -1.0 and 0.0
      "never_fires" -> ((0L, "PASS"))))
  }

  test("verify: whole suite is one aggregate — single job, no per-check scan") {
    // All checks fuse into one Aggregate: the physical plan contains
    // exactly one scan of the input (count the LocalTableScans).
    val plan = Checks.verify(df, Seq(
      Checks.rowCheck("a", col("amt") < 0),
      Checks.rowCheck("b", col("name").isNull),
      Checks.rowCheck("c", col("id") > 2)
    )).queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size == 1, plan)
  }

  test("null predicate rows don't count as violations; empty suite rejected") {
    val d = Seq((1L, Some(5.0)), (2L, None)).toDF("id", "v")
    val out = Checks.verify(d,
        Seq(Checks.rowCheck("v_neg", col("v") < 0)))
      .collect().head
    assert(out.getLong(1) == 0L && out.getString(2) == "PASS")
    intercept[IllegalArgumentException] { Checks.verify(d, Seq.empty) }
  }

  test("multi-column uniqueness counts composite duplicates only") {
    val d = Seq((1, "x"), (1, "y"), (1, "x"), (2, "x"))
      .toDF("k1", "k2")
    val out = Checks.verify(d,
        Seq(Checks.uniqueness("u", col("k1"), col("k2"))))
      .collect().head
    assert(out.getLong(1) == 1L) // (1,x) twice
  }
}
