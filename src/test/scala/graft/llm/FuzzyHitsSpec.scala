package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyHitsSpec extends SparkSpec {
  import spark.implicits._

  test("symDeletePairs == brute-force levenshtein <= 2 (lossless blocking)") {
    val words = Seq("kitten", "sitten", "sittin", "sitting", "mitten",
      "bitten", "kit", "kite", "kates", "abcdef", "abcfed", "zzzzzz",
      "a", "ab", "ba", "id0001", "id0002", "id0010", "id0100", "id9999")
    val df = words.toDF("w")
    val got = NearDup.symDeletePairs(df, "w")
      .select("name_a", "name_b", "dist").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val brute = (for {
      a <- words; b <- words if a < b
      d = levDist(a, b) if d >= 0 && d <= 2
    } yield (a, b, d)).toSet
    assert(got === brute)
  }

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("hitsExact: hand-computed integer path counts on a tiny graph") {
    // 1->10, 1->11, 2->10 (hubs 1,2; auths 10,11).
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (1L, 10L))
      .toDF("src", "dst")
    val (hub, auth) = Components.hitsExact(e, rounds = 2)
    // a1: 10->2, 11->1. h1: 1 = a1(10)+a1(11) = 3, 2 = a1(10) = 2.
    // a2: 10 = h1(1)+h1(2) = 5, 11 = h1(1) = 3. h2: 1 = 5+3 = 8, 2 = 5.
    val h = hub.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = auth.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h === Map(1L -> 8L, 2L -> 5L))
    assert(a === Map(10L -> 5L, 11L -> 3L))
  }

  test("hitsExact ranking is normalization-invariant (duplicate edges ignored)") {
    val e = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (3L, 12L),
      (3L, 13L)).toDF("src", "dst")
    val (hub, _) = Components.hitsExact(e, rounds = 2)
    val ranked = hub.orderBy(col("score").desc, col("id"))
      .collect().map(_.getLong(0)).toSeq
    // 3 touches the most authority mass; 1 only the shared auth 10.
    assert(ranked.head === 3L && ranked.last === 1L)
  }
}
