package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Quadratic dominance reference (min x, max y). */
  private def brute(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    rows.filter { b =>
      !rows.exists(a =>
        (a._2 < b._2 && a._3 >= b._3) || (a._2 <= b._2 && a._3 > b._3))
    }.toSet

  private def run(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    Skyline.skyline2D(rows.toDF("id", "x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect().toSet

  test("matches quadratic dominance on seeded random data with ties") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      // small value ranges force plenty of x-ties and exact-duplicate
      // (x, y) pairs — the tie-group edge cases
      val rows = (1L to 300L).map(i =>
        (i, rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      assert(run(rows) == brute(rows), s"trial $trial")
    }
  }

  test("exact (x, y) duplicates survive together; staircase is kept whole") {
    // staircase: each point better on one dim — all survive; the
    // duplicated corner survives twice
    val stairs = Seq((1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L),
      (4L, 1L, 1L), (5L, 9L, 0L))
    // (5, 9, 0) is dominated by (3,3,3); both (x=1,y=1) rows survive
    assert(run(stairs) == Set((1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L),
      (4L, 1L, 1L)))
  }

  test("cross-partition carry: a far-partition point dominates later ones") {
    // x spread wide so range partitioning splits; the single best point
    // (x=0, y=1000) dominates everything else — skyline is exactly it
    val rows = (1L to 500L).map(i => (i, i * 100L, 500L - i)) :+
      (999L, 0L, 1000L)
    assert(run(rows) == Set((999L, 0L, 1000L)))
  }

  test("sweep windows are __bkt-partitioned; one corpus hash exchange") {
    val df = Skyline.skyline2D(
      (1L to 100L).map(i => (i, i % 13, i % 7)).toDF("id", "x", "y"),
      "x", "y")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // partitioned form prints Window [...], [__bkt#..], [x#.. ASC];
    // a GLOBAL x-ordered window would print Window [...], [x#.. ASC]
    // directly (the single-partition scale-killer). The only global
    // window allowed is the carry, ordered by __bkt over one row per
    // bucket (post-aggregate, metadata-sized).
    assert("\\], \\[__bkt#\\w+L?\\], \\[x#".r.findFirstIn(p).isDefined, p)
    assert("Window \\[[^\\]]*\\], \\[x#".r.findFirstIn(p).isEmpty, p)
    // the corpus shuffles ONCE, on the bucket key; bounds/carry move by
    // broadcast only
    assert("Exchange hashpartitioning\\(__bkt".r.findAllIn(p).size >= 1, p)
    assert("Exchange hashpartitioning\\((?!__bkt)".r.findAllIn(p).isEmpty, p)
  }
}
