package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sfDir, "documents")

  test("hash-gated sampling is reproducible and nested gates compose") {
    val langCol = TextOps.langId(col("text"))
    def sample() = Curation.sampleStratified(
        docs.withColumn("lang", langCol), "doc_id", col("lang"),
        Map("en" -> 50), defaultPct = 100)
      .select("doc_id").as[Long].collect().toSet
    val s1 = sample()
    assert(s1 == sample(), "sampling not reproducible")
    // Gate at 20 of the 50-sample == gate at 20 of the full set restricted
    // to the 50-sample: the hash gate is a pure row predicate.
    val g20 = docs.filter(pmod(xxhash64(col("doc_id")), lit(100)) < 20)
      .select("doc_id").as[Long].collect().toSet
    val nested = s1.intersect(g20)
    val direct = Curation.sampleStratified(
        docs.withColumn("lang", langCol)
          .filter(col("doc_id").isInCollection(s1)), "doc_id", col("lang"),
        Map.empty, defaultPct = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(direct == nested)
  }

  test("two-level shard packing equals the single-window prefix sum") {
    val weighted = docs.select(col("doc_id"), TextOps.nTokens(col("text")).as("w"))
    val got = Curation.packShards(weighted, Seq(col("doc_id")), "w", 1000L)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    val wAll = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = weighted
      .withColumn("cum", sum("w").over(wAll))
      .select(col("doc_id"), expr("(cum - w) div 1000").as("shard_id"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    // Shards are contiguous in id order and start at 0.
    val byId = got.toSeq.sortBy(_._1).map(_._2)
    assert(byId.head == 0L)
    byId.sliding(2).foreach { case Seq(a, b) => assert(a <= b && b <= a + 1); case _ => }
  }

  test("PII scrub replaces URL, email, digit runs — in that order") {
    val in = Seq("see https://x.io/a?b=1234567 mail a.b+c@d-e.org code 9876543 ok")
      .toDF("t")
    val out = in.select(Curation.scrubPii(col("t"))).as[String].head()
    assert(out == "see <URL> mail <EMAIL> code <NUM> ok")
    val (u, e, n) = Curation.piiCounts(col("t"))
    val counts = in.select(u, e, n).as[(Long, Long, Long)].head()
    // Counts are raw pre-scrub pattern matches: the 7-digit run inside the
    // URL counts toward n_num even though the URL pass scrubs it first.
    assert(counts == ((1L, 1L, 2L)))
  }

  test("topTerms ranks are total, bounded by k, and favor rare terms") {
    val out = Curation.topTerms(docs, "doc_id", "text", k = 3)
    assert(out.filter(col("rank") < 1 || col("rank") > 3).count() == 0)
    // rank is dense per doc: every doc with >= 3 distinct terms has 1,2,3
    val bad = out.groupBy("doc_id").agg(count(lit(1)).as("n"),
        max("rank").as("mx"))
      .filter(col("mx") =!= col("n")).count()
    assert(bad == 0)
  }
}
