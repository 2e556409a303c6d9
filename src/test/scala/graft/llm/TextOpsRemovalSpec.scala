package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Planted-duplicate tests for [[TextOps.removeRepeatedWindows]] — the
  * Lee et al. repeated-substring removal output. */
class TextOpsRemovalSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], k: Int) =
    TextOps.removeRepeatedWindows(rows.toDF("doc_id", "text"),
        "doc_id", "text", k)
      .select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("first occurrence survives; later occurrences are cut") {
    val shared = "v w x y z"
    val r = run(Seq(
      (1L, s"a b $shared c d"),
      (2L, s"p q $shared r s")), k = 5)
    assert(r(1L) == ((9L, 0L, s"a b $shared c d")),
      "first occurrence must be untouched")
    assert(r(2L) == ((9L, 5L, "p q r s")),
      "second occurrence must lose exactly the shared span")
  }

  test("overlapping doomed windows merge into one interval") {
    // doc 2 repeats a 7-token run from doc 1: its three overlapping
    // doomed 5-windows (positions 0,1,2) must merge to ONE 7-token cut,
    // not 15 tokens of double-counted removal.
    val run7 = "t u v w x y z"
    val r = run(Seq((1L, s"$run7 end1"), (2L, s"$run7 end2")), k = 5)
    assert(r(1L)._2 == 0L)
    assert(r(2L) == ((8L, 7L, "end2")), s"got ${r(2L)}")
  }

  test("an exact duplicate document empties completely") {
    val text = "a b c d e f g"
    val r = run(Seq((1L, text), (2L, text)), k = 5)
    assert(r(1L) == ((7L, 0L, text)))
    assert(r(2L) == ((7L, 7L, "")), s"got ${r(2L)}")
  }

  test("within-document repeats keep only the first occurrence") {
    val r = run(Seq((1L, "m n o p q SEP m n o p q")), k = 5)
    // positions 6..10 repeat the window at 0..4 → cut 5 tokens
    assert(r(1L) == ((11L, 5L, "m n o p q SEP")), s"got ${r(1L)}")
  }

  test("docs shorter than k pass through untouched") {
    val r = run(Seq((1L, "a b c"), (2L, "a b c")), k = 5)
    assert(r(1L) == ((3L, 0L, "a b c")))
    assert(r(2L) == ((3L, 0L, "a b c")))
  }

  test("every shuffle keys on the 8-byte hash or doc id, never window text") {
    val df = TextOps.removeRepeatedWindows(
      Seq((1L, "a b c d e f"), (2L, "a b c d e g")).toDF("doc_id", "text"),
      "doc_id", "text", 5)
    val p = df.queryExecution.executedPlan.toString
    val parts = "Exchange hashpartitioning\\((\\w+)#".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(parts.nonEmpty, p)
    assert(parts.forall(c => Set("h", "doc_id", "s").contains(c)),
      s"unexpected shuffle keys $parts")
  }

  test("ngramNovelty: duplicate docs score 0, originals and short docs 10000") {
    val df = Seq(
      (1L, "a b c d"),   // first occurrence of both 3-grams
      (2L, "a b c d"),   // exact dup of doc 1 -> nothing novel
      (3L, "x y z w"),   // disjoint -> fully novel
      (4L, "q")          // shorter than n -> whole-doc gram, novel
    ).toDF("doc_id", "text")
    val got = TextOps.ngramNovelty(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 2L, 10000L)))
    assert(got(2L) == ((2L, 0L, 0L)))
    assert(got(3L) == ((2L, 2L, 10000L)))
    assert(got(4L) == ((1L, 1L, 10000L)))
  }

  test("ngramNovelty: partial overlap counts only the unseen grams") {
    // doc 2 shares the "b c d" 3-gram with doc 1 but adds "c d e":
    // 1 of its 2 distinct grams is novel -> 5000 bp.
    val df = Seq((1L, "a b c d"), (2L, "b c d e")).toDF("doc_id", "text")
    val got = TextOps.ngramNovelty(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) == 10000L && got(2L) == 5000L)
  }

  test("collisionStats: hand-computed bigram collision mass; extremes; " +
      "run-length form equals a groupBy replay on real docs") {
    def stats(texts: (Long, String)*) =
      texts.toSeq.toDF("doc_id", "text")
        .select(col("doc_id"), TextOps.collisionStats(col("text")).as("cs"))
        .select(col("doc_id"), col("cs.n_grams"), col("cs.sumsq"),
          col("cs.coll_ppm"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2),
            r.getLong(3))))).toMap
    // "abab": grams ab,ba,ab → counts {ab:2, ba:1}: N=3, Σc²=5,
    // ppm = 5e6 div 9 = 555555.
    // "aaaa": grams aa,aa,aa → N=3, Σc²=9, ppm = 1e6 (maximal).
    // "abcd": all distinct → N=3, Σc²=3, ppm = 333333 (minimal = 1e6/N).
    // "a": no bigram → NULL.  Case folding: "AbAb" ≡ "abab".
    val got = stats(1L -> "abab", 2L -> "aaaa", 3L -> "abcd", 4L -> "a",
      5L -> "AbAb")
    assert(got(1L).contains((3L, 5L, 555555L)), s"got ${got(1L)}")
    assert(got(2L).contains((3L, 9L, 1000000L)))
    assert(got(3L).contains((3L, 3L, 333333L)))
    assert(got(4L).isEmpty)
    assert(got(5L) == got(1L))
    // On real corpus docs, the map-side run-length aggregation must equal
    // an explode + groupBy computation of the same Σc².
    val docs = graft.Tables(spark, sfDir, "documents").limit(50)
    val viaExpr = docs
      .select(col("doc_id"), TextOps.collisionStats(col("text"))("sumsq")
        .as("sumsq"))
      .as[(Long, Long)].collect().toMap
    val t = lower(trim(col("text")))
    val viaGroup = docs
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), length(t) - 1), i => t.substr(i, lit(2))))
        .as("g"))
      .groupBy("doc_id", "g").count()
      .groupBy("doc_id").agg(sum(col("count") * col("count")).as("sumsq"))
      .as[(Long, Long)].collect().toMap
    assert(viaExpr == viaGroup)
  }
}
