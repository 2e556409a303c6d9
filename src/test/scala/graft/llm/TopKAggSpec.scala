package graft.llm

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class TopKAggSpec extends SparkSpec {

  test("bounded-heap top-k aggregator equals window-rank top-k") {
    val emb = Tables(spark, sfDir, "embeddings")
    val viaWindow = Similarity.bruteTopK(emb, col("vec_id") < 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaAgg = Similarity.bruteTopKAgg(emb, col("vec_id") < 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("approx_count_distinct within 10% of exact (HLL sanity)") {
    val li = Tables(spark, sfDir, "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"exact=$exact approx=$approx")
  }
}
