package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class RangeJoinSpec extends SparkSpec {

  private def windows = Tables(spark, sfDir, "orders")
    .filter(col("o_orderkey") % 97 === 0)
    .select(col("o_orderkey"), col("o_orderdate").as("w_start"),
      (col("o_orderdate") + expr("INTERVAL 7 DAY")).as("w_end"))

  private def points = Tables(spark, sfDir, "lineitem")
    .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))

  test("binned interval join equals the naive range join") {
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("o_orderkey", "l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val naive = key(points.join(windows,
      col("l_shipdate") >= col("w_start") && col("l_shipdate") < col("w_end")))
    assert(naive.nonEmpty)
    // Equality must hold at any bucket width (width only shifts cost).
    for (w <- Seq(24 * 3600L, 7L * 24 * 3600, 30L * 24 * 3600)) {
      val binned = key(RangeJoin.pointInInterval(
        points, "l_shipdate", windows, "w_start", "w_end", bucketSeconds = w))
      assert(binned == naive, s"bucketSeconds=$w")
    }
  }

  test("binned plan is an equi hash/merge join, not a nested-loop product") {
    val joined = RangeJoin.pointInInterval(
      points, "l_shipdate", windows, "w_start", "w_end")
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }
}
