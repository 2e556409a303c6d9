package graft.relational

import graft.SparkSpec

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def entry = RelQueries.entries
    .find(_._1 == "q378_isotonic_fit").get._2

  test("fit is non-decreasing over bins on real data") {
    val fit = entry(spark, sfDir).collect().map(_.getLong(3)).toSeq
    assert(fit === fit.sorted)
  }

  test("planted bins reproduce classic PAVA pooling") {
    val dir = "/tmp/graft_iso_spec"
    // bins (b = n_chars div 10): y-rates 1.0, 0.0, 0.5 over three bins
    // of 2 docs each -> PAVA pools all three to 0.5 (violator at bin 2).
    val docs = Seq(
      (1L, "x", "en", "s", 100L), (2L, "x", "en", "s", 105L),
      (3L, "x", "de", "s", 110L), (4L, "x", "de", "s", 115L),
      (5L, "x", "en", "s", 120L), (6L, "x", "de", "s", 125L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = entry(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    // PAVA: [1, 0, .5] -> pool(1,0)=.5, then [.5, .5] stays -> all 5000bp
    assert(got === Seq((10L, 5000L), (11L, 5000L), (12L, 5000L)))
  }

  test("already-monotone bins are returned unchanged") {
    val dir = "/tmp/graft_iso_spec2"
    val docs = Seq(
      (1L, "x", "de", "s", 100L), (2L, "x", "de", "s", 105L),
      (3L, "x", "en", "s", 110L), (4L, "x", "de", "s", 115L),
      (5L, "x", "en", "s", 120L), (6L, "x", "en", "s", 125L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = entry(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got === Seq((10L, 0L), (11L, 5000L), (12L, 10000L)))
  }
}
