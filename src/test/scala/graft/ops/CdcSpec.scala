package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies insert/delete/update/unchanged") {
    val oldDf = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val newDf = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("k", "v")
    val r = Cdc.snapshotDiff(oldDf, newDf, Seq("k"), Seq("v"))
      .as[(Long, String)].collect().toMap
    assert(r == Map(1L -> "delete", 2L -> "unchanged", 3L -> "update",
      4L -> "insert"))
  }

  test("bucketDigests: identical tables match, a 1-row tamper is caught") {
    val base = (0L until 1000L).map(i => (i, i * 31 % 17)).toDF("k", "v")
    def digs(df: org.apache.spark.sql.DataFrame) =
      Cdc.bucketDigests(df, "k", Seq("k", "v"), 16)
        .as[(Long, Long, Long)].collect()
        .map { case (b, d, n) => b -> ((d, n)) }.toMap
    val a = digs(base.repartition(3))
    val b = digs(base.repartition(11))
    assert(a == b, "digest not partitioning-invariant")
    val tampered = base.withColumn("v",
      when(col("k") === 123L, lit(-1L)).otherwise(col("v")))
    val c = digs(tampered)
    val bad = a.keySet.filter(k => a(k) != c(k))
    assert(bad == Set(123L % 16), s"expected only bucket ${123 % 16}: $bad")
  }
}
