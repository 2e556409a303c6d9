package graft.llm

import graft.SparkSpec

class SccSpec extends SparkSpec {
  import spark.implicits._

  private def bruteScc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def reach(s: Long): Set[Long] = {
      var seen = Set(s); var frontier = List(s)
      while (frontier.nonEmpty) {
        val v = frontier.head; frontier = frontier.tail
        for (w <- adj.getOrElse(v, Nil) if !seen(w)) {
          seen += w; frontier = w :: frontier
        }
      }
      seen
    }
    val r = nodes.map(v => v -> reach(v)).toMap
    nodes.map { v =>
      val scc = nodes.filter(w => r(v)(w) && r(w)(v)).toSet + v
      v -> scc.min
    }.toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val got = Components
      .stronglyConnectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(got === bruteScc(edges))
  }

  test("planted: two cycles joined by a one-way bridge stay separate SCCs") {
    // cycle A {1,2,3}, cycle B {10,11}, bridge 3->10, tail 20->1, sink 11->30.
    check(Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 10L),
      (3L, 10L), (20L, 1L), (11L, 30L)))
  }

  test("planted: nested structure with shared max-ids across classes") {
    // The coloring trap case: two distinct SCCs whose color classes
    // collide through a high-id common ancestor 99.
    check(Seq((99L, 1L), (1L, 2L), (2L, 1L), (99L, 10L), (10L, 11L),
      (11L, 10L), (2L, 5L), (11L, 5L)))
  }

  test("random digraphs match brute mutual-reachability") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 30
      val edges = Seq.fill(70)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      check(edges)
    }
  }

  test("pure DAG: every vertex is its own SCC") {
    check(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L)))
  }
}
