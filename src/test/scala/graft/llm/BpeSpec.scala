package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("known words tokenize through the merge ranks") {
    val df = Seq("the", "join", "batch", "dup", "agg", "xyz")
      .toDF("w")
      .select(col("w"), Bpe.wordTokens(col("w")).as("toks"))
    val out = df.as[(String, Seq[String])].collect().toMap
    assert(out("the") == Seq("the"))       // (t,h) then (th,e)
    assert(out("join") == Seq("join"))     // (i,n), (j,o), (jo,in)
    assert(out("batch") == Seq("bat", "c", "h")) // (a,t), (b,at); (t,h) consumed by rank 6
    assert(out("dup") == Seq("dup"))       // (u,p) then (d,up)
    assert(out("agg") == Seq("a", "gg"))
    assert(out("xyz") == Seq("x", "y", "z")) // no applicable merges
  }

  test("decode(encode(word)) == word on random lowercase words") {
    val rng = new scala.util.Random(7L)
    val words = Seq.fill(300)(
      (1 to (1 + rng.nextInt(12))).map(_ => ('a' + rng.nextInt(26)).toChar).mkString)
    val df = words.toDF("w")
      .select(col("w"),
        Bpe.decodeIds(transform(Bpe.wordTokens(col("w")), t =>
          coalesce(element_at(typedLit(Bpe.vocab), t), lit(-1)))).as("rt"))
    assert(df.filter(col("w") =!= col("rt")).count() == 0)
  }

  test("train learns the hand-computed merges on a toy corpus") {
    // words: "abab" x2, "ab" x1.
    // round 1 pairs: (a,b) = 2*2+1 = 5, (b,a) = 2 -> learn (a,b)
    // round 2 pairs over {" ab ab ", " ab "}: (ab,ab) = 2 -> learn (ab,ab)
    val docs = Seq((1L, "abab ab"), (2L, "abab")).toDF("doc_id", "text")
    val got = Bpe.train(docs, "doc_id", "text", nMerges = 2)
      .orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq((1L, "a", "b", "ab"), (2L, "ab", "ab", "abab")))
  }

  test("token ids cover the vocab; no unknowns on the corpus alphabet") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val ids = Bpe.encode(docs, "doc_id", "text")
    assert(ids.count() == docs.count())
    // corpus is lowercase words over the merge alphabet -> no -1 ids
    assert(ids.filter(col("token_ids").rlike("(^| )-1( |$)")).count() == 0)
    // subword compression: fewer BPE tokens than characters
    val chars = docs.agg(sum(length(regexp_replace(col("text"), "\\s", ""))))
      .head.getLong(0)
    val toks = ids.agg(sum(col("n_tokens"))).head.getLong(0)
    assert(toks < chars, s"BPE must compress: $toks tokens vs $chars chars")
  }
}
