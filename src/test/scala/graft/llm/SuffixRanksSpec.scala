package graft.llm

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Prefix-doubling suffix ranks (q393). */
class SuffixRanksSpec extends SparkSpec {
  import spark.implicits._

  /** Scala replay: dense rank by token, then `rounds` doublings of
    * dense rank over (r[p], r[p+gap] or 0). */
  private def brute(stream: Seq[String], rounds: Int): Map[Long, Long] = {
    def dense[T: Ordering](xs: Seq[T]): Map[T, Long] =
      xs.distinct.sorted.zipWithIndex
        .map { case (v, i) => v -> (i + 1L) }.toMap
    val n = stream.length
    var r = { val d = dense(stream); stream.map(d) }
    for (k <- 1 to rounds) {
      val gap = 1 << (k - 1)
      val pairs = (0 until n).map(p =>
        (r(p), if (p + gap < n) r(p + gap) else 0L))
      val d = dense(pairs)
      r = pairs.map(d)
    }
    (0 until n).map(p => p.toLong -> r(p)).toMap
  }

  test("ranks equal the scala prefix-doubling replay on a planted corpus") {
    val docs = Seq(
      (1L, "a b c a b c d"), (2L, "b c a b x"), (3L, "z a b c a"))
      .toDF("doc_id", "text")
    val stream = Seq("a b c a b c d", "b c a b x", "z a b c a")
      .flatMap(_.split("\\s+").toSeq)
    val got = TextOps.suffixRanks(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute(stream, 2))
  }

  test("rank order agrees with lexicographic 4-token context order") {
    val docs = Tables(spark, sfDir, "documents").limit(20)
      .orderBy("doc_id")
    val stream = docs.collect().flatMap(
      _.getAs[String]("text").trim.split("\\s+").toSeq)
    // context with implicit end-sentinel: shorter context sorts first
    def ctx(p: Int) = stream.slice(p, math.min(p + 4, stream.length)).toSeq
    val got = TextOps.suffixRanks(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val ord = math.Ordering.Implicits.seqOrdering[Seq, String]
    for (p <- 0 until stream.length by 7;
         q <- 0 until stream.length by 11 if p != q) {
      val cmp = ord.compare(ctx(p), ctx(q))
      val rcmp = got(p).compare(got(q))
      assert(cmp.sign == rcmp.sign,
        s"p=$p q=$q ctx=${ctx(p)} vs ${ctx(q)} ranks ${got(p)},${got(q)}")
    }
  }
}
