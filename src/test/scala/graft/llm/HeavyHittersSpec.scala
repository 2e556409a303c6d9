package graft.llm

import graft.SparkSpec

/** The two-pass exact-heavy-hitters contract: output == brute-force
  * GROUP BY + threshold, for any data and any k — the Misra-Gries sketch
  * may prune aggressively, but its superset guarantee plus the exact
  * recount make the final answer exact. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def brute(items: Seq[String], k: Int): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
  }

  test("exact == brute force on skewed random streams, several (seed, k)") {
    for (seed <- Seq(1, 7, 42); k <- Seq(2, 5, 11)) {
      val rnd = new scala.util.Random(seed)
      // zipf-ish: hot singletons plus a random cold tail
      val items = Seq.fill(50 + rnd.nextInt(250)) {
        rnd.nextInt(16) match {
          case x if x < 8 => "a"
          case x if x < 12 => "b"
          case x if x < 14 => "c"
          case _ => "r" + rnd.nextInt(50)
        }
      }
      val df = items.toDF("item").repartition(5)
      val got = HeavyHitters.exact(spark, df, "item", k)
        .as[(String, Long)].collect().toMap
      assert(got == brute(items, k), s"seed=$seed k=$k")
    }
  }

  test("MG sketch never exceeds k entries and keeps every true heavy hitter") {
    val items = Seq.fill(500)("hot") ++ (1 to 400).map(i => s"cold$i")
    val agg = new HeavyHitters.MisraGries(10)
    val sketch = items.foldLeft(agg.zero)(agg.reduce)
    assert(sketch.size <= 10)
    assert(sketch.contains("hot")) // freq 500 > 900/10
    // merge path preserves the invariant too
    val (l, r) = items.splitAt(137)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(merged.size <= 10 && merged.contains("hot"))
  }
}
