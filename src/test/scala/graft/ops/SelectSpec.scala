package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SelectSpec extends SparkSpec {
  import spark.implicits._

  test("kthSmallest matches a full sort on every rank, across buckets") {
    val rnd = new scala.util.Random(42)
    val vals = Seq.fill(5000)(rnd.nextInt(1 << 20).toLong)
    val df = vals.toDF("v").repartition(7)
    val sorted = vals.sorted
    val ranks = Seq(("k1", 1L), ("p10", 500L), ("p50", 2500L),
      ("p99", 4950L), ("max", 5000L))
    val got = Select.kthSmallest(spark, df, "v", shift = 12, ranks)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    for ((label, k) <- ranks)
      assert(got(label) === sorted((k - 1).toInt), s"rank $label")
  }

  test("kthSmallest handles duplicates and a rank inside a run of ties") {
    val vals = Seq(5L, 5L, 5L, 5L, 1L, 9L)
    val df = vals.toDF("v")
    val got = Select.kthSmallest(spark, df, "v", shift = 1,
        Seq(("a", 2L), ("b", 5L), ("c", 6L)))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("a" -> 5L, "b" -> 5L, "c" -> 9L))
  }

  test("kthSmallest rejects out-of-range ranks") {
    val df = Seq(1L, 2L).toDF("v")
    intercept[IllegalArgumentException] {
      Select.kthSmallest(spark, df, "v", 4, Seq(("bad", 3L)))
    }
    intercept[IllegalArgumentException] {
      Select.kthSmallest(spark, df, "v", 4, Seq(("bad", 0L)))
    }
  }
}
