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
        .select(col("bucket"), col("digest"),
          col("digest_sum").cast("string"), col("n_rows"))
        .as[(Long, Long, String, Long)].collect()
        .map { case (b, d, s, n) => b -> ((d, s, n)) }.toMap
    val a = digs(base.repartition(3))
    val b = digs(base.repartition(11))
    assert(a == b, "digest not partitioning-invariant")
    val tampered = base.withColumn("v",
      when(col("k") === 123L, lit(-1L)).otherwise(col("v")))
    val c = digs(tampered)
    val bad = a.keySet.filter(k => a(k) != c(k))
    assert(bad == Set(123L % 16), s"expected only bucket ${123 % 16}: $bad")
  }

  test("bucketDigests: even-multiplicity swap invisible to xor moves the sum") {
    // {A,A} vs {B,B} in the same bucket: xor folds both to 0 and n_rows
    // match, but the decimal hash sum separates them.
    val aa = Seq((0L, 1L), (0L, 1L)).toDF("k", "v")
    val bb = Seq((16L, 2L), (16L, 2L)).toDF("k", "v")
    def row(df: org.apache.spark.sql.DataFrame) =
      Cdc.bucketDigests(df, "k", Seq("k", "v"), 16)
        .select(col("bucket"), col("digest"),
          col("digest_sum").cast("string"), col("n_rows"))
        .as[(Long, Long, String, Long)].collect().head
    val (ba, da, sa, na) = row(aa)
    val (bc, dc, sc, nc) = row(bb)
    assert(ba == 0L && bc == 0L && da == 0L && dc == 0L && na == nc,
      "precondition: xor+count blind to this swap")
    assert(sa != sc, "digest_sum must separate the even-multiplicity swap")
  }

  test("bucketDigests quotes column names needing backticks") {
    val df = Seq((1L, 2L)).toDF("k", "odd name")
    val r = Cdc.bucketDigests(df, "k", Seq("k", "odd name"), 4).collect()
    assert(r.length == 1)
  }
}
