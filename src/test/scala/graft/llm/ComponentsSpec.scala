package graft.llm

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference CC: union-find over the edge list, components labeled by
    * their min vertex id. */
  private def bruteCC(vertices: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(vertices.map(v => v -> v): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    vertices.map(v => v -> find(v)).toMap
  }

  private def runCC(vertices: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(
        vertices.toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, two components, singleton — worst case for pure propagation") {
    // A 12-vertex chain exercises the pointer-jumping (naive propagation
    // needs 11 rounds; compressed needs ~4), plus a separate triangle and
    // an isolated vertex.
    val chain = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq
    val tri = Seq((20L, 21L), (21L, 22L), (20L, 22L))
    val verts = (0L until 12L) ++ Seq(20L, 21L, 22L, 30L)
    val got = runCC(verts, chain ++ tri)
    assert(got == bruteCC(verts, chain ++ tri))
    assert(got(11L) == 0L && got(22L) == 20L && got(30L) == 30L)
  }

  test("property: matches union-find on seeded random graphs") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 8) {
      val n = 2 + rng.nextInt(29)
      val verts = (0L until n.toLong).toSeq
      val es = Seq.fill(rng.nextInt(41)) {
        val a = rng.nextInt(n - 1)
        val b = a + 1 + rng.nextInt(n - 1 - a)
        (a.toLong, b.toLong)
      }
      assert(runCC(verts, es) == bruteCC(verts, es),
        s"mismatch on n=$n edges=$es")
    }
  }

  test("near-dup graph on testdata clusters planted duplicates together") {
    val docs = Tables(spark, sfDir, "documents")
    val pairs = NearDup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.8)
    val endpoints = pairs.select(col("d1").as("id"))
      .union(pairs.select(col("d2").as("id"))).distinct()
    val cc = Components.connectedComponents(endpoints,
      pairs.select(col("d1").as("src"), col("d2").as("dst")))
    val got = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val es = pairs.select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = bruteCC(got.keys.toSeq, es)
    assert(got == expected)
    // Every edge's endpoints share a component (pairs really merged).
    es.foreach { case (a, b) => assert(got(a) == got(b)) }
  }
}
