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
}
