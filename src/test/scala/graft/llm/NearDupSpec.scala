package graft.llm

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class NearDupSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir, "documents")

  test("MinHash-LSH candidates cover all high-Jaccard pairs (recall)") {
    val exact = NearDup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    val lsh = NearDup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, bands = 16, rowsPerBand = 4, tau = 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact -- lsh
    assert(missed.isEmpty,
      s"LSH missed ${missed.size}/${exact.size} pairs with Jaccard >= 0.8: $missed")
  }

  test("MinHash signature agreement estimates Jaccard within tolerance") {
    val exact = NearDup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
    val lsh = NearDup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.0)
    val joined = exact.join(lsh, Seq("d1", "d2"))
      .select(abs(col("jaccard") - col("est_jaccard")).as("err"))
      .agg(max("err")).head.getDouble(0)
    assert(joined < 0.25, s"max |jaccard - est| = $joined")
  }

  test("SimHash chunk blocking is exact for Hamming <= 3 (vs brute force)") {
    val sigs = NearDup.simhashSignatures(docs, "doc_id", "text")
    val brute = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        expr("bit_count(a.sig ^ b.sig)").as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = NearDup.simhashPairs(docs, "doc_id", "text", 3)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"blocking mismatch: only-brute=${brute -- blocked} only-blocked=${blocked -- brute}")
  }

  test("jaccardPairs df-cap: generous cap equals uncapped; tight cap lower-bounds") {
    def asMap(maxDf: Option[Long], tau: Double) =
      NearDup.jaccardPairs(docs, "doc_id", "text", 3, tau, maxDf)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exact = asMap(None, 0.1)
    assert(exact.nonEmpty)
    // A cap no gram's document frequency reaches is a no-op.
    assert(asMap(Some(Long.MaxValue), 0.1) == exact)
    // A binding cap only thins candidates and lowers jaccard (n_common counts
    // kept grams only; sizes stay exact) — never invents pairs or raises it.
    val tight = asMap(Some(3L), 0.1)
    assert(tight.keySet.subsetOf(exact.keySet))
    tight.foreach { case (k, j) =>
      assert(j <= exact(k) + 1e-12, s"capped jaccard $j above exact ${exact(k)} for $k")
    }
  }

  test("prefix-filtered Jaccard join is exactly the naive inverted-index join") {
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // Two thresholds: prefix length depends on tau, so exercise both a
    // tight and a loose prefix.
    for (tau <- Seq(0.3, 0.8)) {
      val naive = asMap(NearDup.jaccardPairs(docs, "doc_id", "text", 3, tau))
      val pref = asMap(NearDup.jaccardPairsPrefix(docs, "doc_id", "text", 3, tau))
      assert(naive.nonEmpty)
      assert(pref == naive,
        s"tau=$tau: only-naive=${naive.keySet -- pref.keySet} " +
          s"only-prefix=${pref.keySet -- naive.keySet}")
    }
  }

  test("incremental LSH = full LSH pairs restricted to the batch/corpus cut") {
    val docs = Tables(spark, sfDir, "documents")
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val index = NearDup.minhashSignatures(corpus, "doc_id", "text", 3, 64)
    val inc = NearDup.minhashLshAgainstIndex(batch, "doc_id", "text",
        index, n = 3, bands = 16, rowsPerBand = 4, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Full-corpus pairs crossing the cut, reoriented batch -> corpus.
    val full = NearDup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        if (a % 10 == 0 && b % 10 != 0) Some((a, b))
        else if (b % 10 == 0 && a % 10 != 0) Some((b, a))
        else None
      }.toSet
    assert(inc == full && inc.nonEmpty)
  }

  test("word n-grams: count and content") {
    import spark.implicits._
    val toks = Seq("a b c d").toDF("text")
      .select(NearDup.wordNgrams(TextOps.tokens(col("text")), 3).as("g"))
      .as[Seq[String]].head()
    assert(toks == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(NearDup.wordNgrams(TextOps.tokens(col("text")), 3).as("g"))
      .as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("editDistance1Pairs equals the naive quadratic join") {
    import spark.implicits._
    // planted: substitution (abcd/abed), deletion (abcd/abd), insertion
    // (abd/xabd is dist 1? x+abd = insertion at front), unrelated, dupes
    val names = Seq("abcd", "abed", "abd", "xabd", "zzzz", "abcd", "ab")
    val df = names.toDF("s")
    val fast = NearDup.editDistance1Pairs(df, "s")
      .as[(String, String)].collect().toSet
    val uniq = names.distinct
    val naive = (for {
      a <- uniq; b <- uniq if a < b
      if levenshteinRef(a, b) <= 1
    } yield (a, b)).toSet
    assert(fast == naive && naive.nonEmpty)
    assert(fast.contains(("abcd", "abed")) && fast.contains(("abcd", "abd"))
      && fast.contains(("abd", "xabd")) && fast.contains(("ab", "abd")))
  }

  test("editDistance1Edges equals the naive within-block quadratic join") {
    import spark.implicits._
    // two blocks; cross-block near-matches (abcd in 1 vs abed in 2) must
    // NOT pair; zero-run names (a0001/a0002) exercise the key dedup
    val rows = Seq((1L, 1, "abcd"), (2L, 1, "abd"), (3L, 2, "abed"),
      (4L, 2, "abee"), (5L, 1, "a0001"), (6L, 1, "a0002"), (7L, 2, "zzzz"))
    val df = rows.toDF("id", "blk", "s")
    val fast = NearDup.editDistance1Edges(df, "id", "s", "blk")
      .as[(Long, Long)].collect().toSet
    val naive = (for {
      (ia, ba, sa) <- rows; (ib, bb, sb) <- rows
      if ba == bb && sa < sb && levenshteinRef(sa, sb) <= 1
    } yield (ia, ib)).toSet
    assert(fast == naive && naive.nonEmpty)
    val block = rows.map(r => r._1 -> r._2).toMap
    assert(fast.contains((1L, 2L)) && fast.contains((5L, 6L))
      && fast.contains((3L, 4L))
      && fast.forall { case (a, b) => block(a) == block(b) })
  }

  test("containmentPairs: fragment flagged inside container, not vice versa") {
    import spark.implicits._
    // doc 2 is a verbatim fragment of doc 1 (all of its 3-grams are in
    // doc 1), but doc 1 is much larger: containment(2→1)=100%, while
    // containment(1→2) and jaccard are both small. doc 3 is unrelated.
    val body = (1 to 30).map(i => s"w$i").mkString(" ")
    val frag = (5 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, body), (2L, frag), (3L, "x y z q r s"))
      .toDF("doc_id", "text")
    val out = NearDup.containmentPairs(docs, "doc_id", "text",
        n = 3, minPct = 80)
      .select("d_sub", "d_sup").as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 1L)), s"got $out")
    // symmetric near-identical pair emits BOTH directions
    val twins = Seq((1L, "a b c d e f"), (2L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val both = NearDup.containmentPairs(twins, "doc_id", "text",
        n = 3, minPct = 80)
      .select("d_sub", "d_sup").as[(Long, Long)].collect().toSet
    assert(both == Set((1L, 2L), (2L, 1L)), s"got $both")
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
