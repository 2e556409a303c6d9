package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RakeSpec extends SparkSpec {
  import spark.implicits._

  test("RAKE scores on a planted corpus match hand computation") {
    val dir = "/tmp/graft_rake_spec"
    Seq(
      (1L, "deep learning the deep model", "en", "s", 28L),
      (2L, "a deep model", "en", "s", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmQueries.entries.find(_._1 == "q373_rake_keywords").get._2
      .apply(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // phrases: "deep learning" (x1), "deep model" (x2)
    // freq(deep)=3 deg(deep)=2+2+2=6 -> 6*10000 div 3 = 20000
    // freq(learning)=1 deg=2 -> 20000; freq(model)=2 deg=4 -> 20000
    // scores: both phrases 40000; tie broken by phrase asc.
    assert(got.toSeq === Seq(
      ("deep learning", 1L, 40000L),
      ("deep model", 2L, 40000L)))
  }

  test("stopword-only and single-word documents degrade gracefully") {
    val dir = "/tmp/graft_rake_spec2"
    Seq(
      (1L, "the a the", "en", "s", 9L),
      (2L, "widget", "en", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmQueries.entries.find(_._1 == "q373_rake_keywords").get._2
      .apply(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // doc 1 contributes no phrases; doc 2 one unigram with deg=freq=1.
    assert(got.toSeq === Seq(("widget", 1L, 10000L)))
  }
}
