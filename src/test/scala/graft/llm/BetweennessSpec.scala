package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bounded-depth Brandes betweenness (q386). */
class BetweennessSpec extends SparkSpec {
  import spark.implicits._

  private def sym(es: Seq[(Long, Long)]) =
    (es ++ es.map(_.swap)).toDF("src", "dst")

  test("path graph: hand-computed truncated dependencies") {
    // Path 1-2-3-4, pivots = {1, 2} (two smallest ids), depth 3.
    // Pivot 1: delta(3) = 1e9 (via 4), delta(2) = 2e9 (via 3).
    // Pivot 2: delta(3) = 1e9 (via 4); node 1 has no deeper successor.
    val got = Components.betweennessPivots(
        sym(Seq((1L, 2L), (2L, 3L), (3L, 4L))), nPivots = 2, depth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 2000000000L, 3L -> 2000000000L))
  }

  test("diamond: split shortest paths halve the dependency") {
    // 1 -> {2,3} -> 4 (undirected diamond), pivots {1,2}, depth 2.
    // Pivot 1: sigma(4) = 2 via 2 and 3; delta(2) = delta(3) =
    //   (1*(1e9+0)) div 2 = 5e8.
    // Pivot 2: levels {2}->{1,4,3}->{...}; from 2, nodes 1,3,4 are all
    //   level-1; level-2 holds nothing new except via 1/3/4... verify
    //   only pivot-1's halving to keep the fixture hand-checkable.
    val got = Components.betweennessPivots(
        sym(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))),
        nPivots = 1, depth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 500000000L, 3L -> 500000000L))
  }

  test("matches a scala Brandes replay on a seeded random graph") {
    val rng = new scala.util.Random(11)
    val n = 12
    val es = (0 until 30).map { _ =>
      val a = rng.nextInt(n); var b = rng.nextInt(n)
      while (b == a) b = rng.nextInt(n)
      (a.toLong, b.toLong)
    }.distinct
    val edges = (es ++ es.map(_.swap)).distinct
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val depth = 3
    val pivots = edges.map(_._1).distinct.sorted.take(2)
    val want = scala.collection.mutable.Map[Long, BigInt]()
      .withDefaultValue(BigInt(0))
    pivots.foreach { s =>
      var lev = Vector(Map(s -> BigInt(1)))
      var seen = Set(s)
      for (_ <- 1 to depth) {
        val nxt = scala.collection.mutable.Map[Long, BigInt]()
          .withDefaultValue(BigInt(0))
        lev.last.foreach { case (u, sig) =>
          adj.getOrElse(u, Nil).foreach(v => if (!seen(v)) nxt(v) += sig) }
        lev :+= nxt.toMap
        seen ++= nxt.keys
      }
      var dNext = Map[Long, BigInt]()
      for (k <- (depth - 1) to 1 by -1) {
        val d = scala.collection.mutable.Map[Long, BigInt]()
          .withDefaultValue(BigInt(0))
        lev(k).foreach { case (v, sig) =>
          adj.getOrElse(v, Nil).foreach { w =>
            lev(k + 1).get(w).foreach { wsig =>
              d(v) += sig * (BigInt(1000000000) +
                dNext.getOrElse(w, BigInt(0))) / wsig
            }
          }
        }
        // nodes with no DAG successor emit no row (inner-join shape)
        val dm = d.toMap.filter(_._2 > 0)
        dm.foreach { case (v, x) => want(v) += x }
        dNext = dm
      }
    }
    val got = Components.betweennessPivots(
        edges.toDF("src", "dst"), nPivots = 2, depth = depth)
      .collect().map(r => r.getLong(0) -> BigInt(r.getLong(1))).toMap
    assert(got == want.toMap.filter(_._2 > 0))
  }
}
