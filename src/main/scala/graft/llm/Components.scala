package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the step that turns near-dup
  * PAIRS (jaccardPairs / minhashLshPairs / simhashPairs / nearDupPairsLsh)
  * into per-document CLUSTER assignments, so a dedup pipeline can keep one
  * representative per cluster instead of reasoning about pairwise drops.
  * The reference's dedup (Redis exact-hash, fetch_data_energinet.py:68-72)
  * never needs this because exact-duplicate groups are equivalence classes
  * by construction; near-dup similarity is NOT transitive, and the standard
  * resolution (used by large-corpus dedup pipelines) is clustering the
  * similarity graph's connected components.
  *
  * Algorithm: iterative min-label propagation with path compression —
  * each round every vertex takes the minimum label among itself and its
  * neighbors, then labels are compressed one hop (label <- label(label),
  * pointer-jumping), which converges in O(log diameter) rounds instead of
  * O(diameter) on chain-shaped components. The driver loop carries only a
  * per-round METADATA aggregate (the label checksum for the convergence
  * test); labels live in a DataFrame throughout — nothing per-vertex ever
  * reaches the driver, and each round's label frame is eagerly
  * materialized (localCheckpoint) so lineage stays flat, the same
  * discipline as Similarity.ivfTopKKmeans. This is the alternating-star
  * family of MapReduce CC algorithms (Kiveris et al., "Connected
  * Components in MapReduce and Beyond") in DataFrame form.
  *
  * 100 TB posture: every round is one join + one aggregation on
  * (vertex, label) pairs — two longs per edge endpoint — shuffled on ids.
  * Pass only vertices that appear in an edge (near-dup graph endpoints are
  * a tiny fraction of a corpus) and coalesce singletons to themselves
  * outside, as q76 does.
  */
object Components {
  /** Labels every vertex with the minimum vertex id reachable from it.
    *
    * @param vertices one column `id`
    * @param edges    two columns `src`, `dst` (undirected; orientation and
    *                 duplicates don't matter)
    * @return (id, component) with component = min id in the component
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIters: Int = 50): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = vertices.select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    // Min-propagation only ever lowers labels, so the label sum strictly
    // decreases until the fixpoint — an exact, overflow-safe (decimal)
    // convergence test that costs one tiny aggregate per round.
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
    var sum0 = checksum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val nbrMin = e.join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nl")).as("nbr"))
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
      // Pointer-jumping: follow the label one hop (label <- label(label)).
      val compressed = stepped
        .join(stepped.select(col("id").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("id"), coalesce(col("ll"), col("label")).as("label"))
      val next = compressed.localCheckpoint(true)
      labels.unpersist()
      labels = next
      val sum1 = checksum(labels)
      converged = sum1.compareTo(sum0) == 0
      sum0 = sum1
      iter += 1
    }
    labels.select(col("id"), col("label").as("component"))
  }

  /** Deterministic integer-scaled PageRank over a directed edge list:
    * ranks are 64-bit integers (true rank × `scale`), contributions use
    * integer floor division, and the damping step is integer
    * multiply-then-divide — every iteration is EXACT int64 arithmetic, so
    * the result is bit-identical across engines, partitionings, task
    * retries, and aggregation orders. (IEEE-double PageRank is none of
    * those: float sums reorder under shuffle, so two runs of the same job
    * can rank ties differently.) The price is bounded precision: pick
    * `scale` so `dampNum · |V| · scale` fits in int64 — 10⁶ is fine up to
    * ~10⁸ vertices; drop to 10³ beyond that or switch the sums to
    * decimal(38,0).
    *
    * Dangling mass is dropped (a vertex with no out-edges absorbs rank) —
    * the common simplification; feed a symmetrized edge list to avoid
    * dangling vertices entirely. Per iteration: one join edges⋈ranks on
    * src + one aggregation on dst — the same two-longs-per-edge shuffle
    * discipline as [[connectedComponents]], with per-round
    * localCheckpoint keeping lineage flat. */
  def pageRankScaled(edges: DataFrame, iters: Int, scale: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint(true)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
    val tele = (dampDen - dampNum) * scale / dampDen
    var ranks = vertices.select(col("id"), lit(scale).as("r"))
    var i = 0
    while (i < iters) {
      // Per-SOURCE contribution first (|V| rows — a vertex-sized join of
      // ranks⋈outdeg), so the edge list is joined exactly ONCE per round;
      // joining ranks and outdeg into the edges separately would run two
      // edge-sized joins per iteration.
      val perSrc = ranks.withColumnRenamed("id", "src")
        .join(outdeg, "src")
        .select(col("src"), expr("r div deg").as("c"))
      val contrib = e.join(perSrc, "src")
        .groupBy(col("dst").as("id")).agg(sum(col("c")).as("s"))
      val next = vertices
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(tele) + expr(s"($dampNum * coalesce(s, 0L)) div $dampDen")).as("r"))
        .localCheckpoint(true)
      ranks.unpersist()
      ranks = next
      i += 1
    }
    ranks
  }
}
