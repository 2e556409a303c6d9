package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Naive Bayes (q379), deterministic hash walks (q380) and Kneser-Ney
  * bigram smoothing (q382) — hand-checkable fixtures plus structural
  * laws.
  */
class ClassifyWalkSpec extends SparkSpec {
  import spark.implicits._

  // ---- naive Bayes -------------------------------------------------

  test("NB: separable two-class corpus classifies itself perfectly") {
    val docs = Seq(
      (1L, "cat cat purr", "a"), (2L, "cat purr purr", "a"),
      (3L, "dog woof woof", "b"), (4L, "dog dog woof", "b")).toDF(
      "doc_id", "text", "lang")
    val conf = Curation.naiveBayesConfusion(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(conf == Map(("a", "a") -> 2L, ("b", "b") -> 2L))
  }

  test("NB: confusion row sums equal per-label doc counts") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val conf = Curation.naiveBayesConfusion(docs, "doc_id", "text", "lang")
    val byLabel = conf.groupBy("label").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel == want)
  }

  test("NB: surprisal formula matches hand computation on one doc") {
    // Corpus: class a = "x x y" (n_a=3), class b = "y z" (n_b=2), V=3.
    // Doc 1 ("x x y", label a) scored against class b:
    //   x: c=0 -> (2+3) div 1 = 5, twice; y: c=1 -> (2+3) div 2 = 2.
    // Against class a: x: c=2 -> 6 div 3 = 2 twice; y: c=1 -> 6 div 2 = 3.
    // surprisal(a)=7 < surprisal(b)=12 -> predicted a.
    val docs = Seq((1L, "x x y", "a"), (2L, "y z", "b"))
      .toDF("doc_id", "text", "lang")
    val conf = Curation.naiveBayesConfusion(docs, "doc_id", "text", "lang")
      .filter(col("label") === "a").collect()
    assert(conf.length == 1 && conf(0).getString(1) == "a")
  }

  // ---- hash walks --------------------------------------------------

  test("walks: every start emits exactly one node per step") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L),
      (3L, 2L)).toDF("src", "dst")
    val w = Components.hashWalks(edges, steps = 4)
    val perStartStep = w.groupBy("start", "step").count()
      .filter(col("count") =!= 1).count()
    assert(perStartStep == 0)
    assert(w.filter(col("step") === 0).count() == 3)
    assert(w.count() == 3 * 5)
  }

  test("walks: transition is the xxhash64-argmin neighbor") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    // Step 1 from node 1: candidates 2 and 3; expected = argmin of
    // Spark's own xxhash64(1, 1, v), computed through the same engine.
    val expected = Seq((1L, 1L, 2L), (1L, 1L, 3L))
      .toDF("node", "st", "dst")
      .select(col("dst"), xxhash64(col("node"), col("st"), col("dst"))
        .as("h"))
      .orderBy("h", "dst").limit(1)
      .collect()(0).getLong(0)
    val got = Components.hashWalks(edges, steps = 1)
      .filter(col("start") === 1 && col("step") === 1)
      .collect()(0).getAs[Long]("node")
    assert(got == expected)
  }

  test("walks: deterministic across runs") {
    val edges = graft.Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).as("a")
      .join(graft.Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).as("b"), "l_orderkey")
      .filter(col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    def run() = Components.hashWalks(edges, steps = 2)
      .agg(sum(expr("start * 31 + node * 7 + step")).as("chk"))
      .collect()(0).getLong(0)
    assert(run() == run())
  }

  // ---- Kneser-Ney --------------------------------------------------

  test("KN: counts and smoothed score match hand computation") {
    // Corpus bigrams: "a b", "b a", "a b" (doc "a b a b"), "a c" (doc
    // "a c"). c12(a,b)=2, c1(a)=3 (a b twice + a c), n_cont(a)=2,
    // n_ctx(b)=1 (only a precedes b), n_types=3.
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val kn = Curation.kneserNeyBigrams(docs, "doc_id", "text")
      .filter(col("w1") === "a" && col("w2") === "b").collect()(0)
    assert(kn.getAs[Long]("c12") == 2L)
    assert(kn.getAs[Long]("c1") == 3L)
    assert(kn.getAs[Long]("n_cont") == 2L)
    assert(kn.getAs[Long]("n_ctx") == 1L)
    // p = ((2*2-1)*1e6) div 6 + ((1e6*2 div 6) * 1) div 3
    assert(kn.getAs[Long]("p_scaled") ==
      (3L * 1000000L) / 6L + ((2000000L / 6L) * 1L) / 3L)
  }

  test("KN: per-context observed mass lands in [1/2 - eps, 1]") {
    // Over OBSERVED continuations of w1 the smoothed mass is
    // 1 − λ(w1)·(1 − Σ_obs Pcont) ∈ [1 − λ, 1] with
    // λ = n_cont/(2·c1) ≤ 1/2; the fixed-point floors lose < 1 per
    // bigram type. So scale·(1/2) − types ≤ mass ≤ scale.
    val docs = graft.Tables(spark, sfDir, "documents").limit(50)
    val kn = Curation.kneserNeyBigrams(docs, "doc_id", "text")
    val bad = kn.groupBy("w1")
      .agg(sum("p_scaled").as("mass"), count(lit(1)).as("types"))
      .filter(col("mass") > 1000000L ||
        col("mass") < lit(500000L) - col("types"))
      .count()
    assert(bad == 0)
  }
}
