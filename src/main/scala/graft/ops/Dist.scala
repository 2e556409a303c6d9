package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed replacements for the two global-window shapes that are
  * scale-killers when written naively: a `Window.orderBy(...)` with no
  * `partitionBy` funnels the ENTIRE relation through one task — fine on
  * a 25-row dimension, fatal on a corpus-cardinality relation at 100 TB.
  *
  * Both helpers use the classic two-level parallel scan (the same scheme
  * [[graft.llm.Curation.packShards]] documents for shard packing):
  * range-partition by the total order, compute per-partition local
  * values with a partition-local window, then cumulate one tiny
  * nPart-row offset table (metadata, not data) and broadcast it back.
  * Range partitions are numbered in key order, so `spark_partition_id`
  * ascending IS the global order of the ranges — the only global window
  * ever run is over those nPart metadata rows.
  *
  * Outputs depend only on the total order, never on partition
  * boundaries, so partitioning changes the parallel structure, not the
  * result — safe under any `nPart` and bit-identical to the
  * single-window formulation.
  *
  * Contrast [[Layout.globalRowNumber]]: that scheme keys its offset
  * table by a COARSE VALUE and assumes the coarse key has
  * metadata-scale cardinality — its offsets window becomes the
  * single-partition funnel when the coarse key grows with the corpus
  * (the q393 suffix-rank case, where the round-k rank cardinality
  * approaches corpus size). These range-partitioned variants have no
  * such assumption: the offset table is always exactly nPart rows. */
object Dist {
  /** Global 1-based row number over `orderCols` (must be a total order —
    * include a unique tie-break column last). On a DISTINCT input this
    * equals `dense_rank()` over the same order, which is how callers get
    * a distributed dense rank: dense-rank(x) = row_number over
    * SELECT DISTINCT x. */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column], outCol: String,
      nPart: Int = 32): DataFrame = {
    val parts = df.repartitionByRange(nPart, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy("__pid").orderBy(orderCols: _*)
    val local = parts.withColumn("__rn", row_number().over(wLocal).cast("long"))
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(wOff), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__off")
  }

  /** Distributed exact NTILE(k) over a total order: standard SQL bucket
    * semantics (q = n div k, r = n mod k; buckets 1..r hold q+1 rows,
    * the rest q), computed from [[globalRowNumber]] plus ONE broadcast
    * one-row count — never an unpartitioned corpus window. Bit-identical
    * to `ntile(k).over(Window.orderBy(orderCols))` for any total order.
    * The count aggregate re-reads `df`; inside one query plan the
    * optimizer's exchange reuse dedups it against the ranked side. */
  def globalNtile(df: DataFrame, orderCols: Seq[Column], k: Int,
      outCol: String, nPart: Int = 32): DataFrame = {
    require(k >= 1, s"ntile bucket count must be >= 1, got $k")
    val rn = globalRowNumber(df, orderCols, "__ntrn", nPart)
    val cnt = df.agg(count(lit(1)).as("__ntn"))
    rn.crossJoin(broadcast(cnt))
      .withColumn(outCol, expr(
        s"""CASE WHEN __ntrn <= (__ntn % $k) * (__ntn div $k + 1)
            THEN (__ntrn - 1) div (__ntn div $k + 1) + 1
            ELSE (__ntn % $k) +
              (__ntrn - (__ntn % $k) * (__ntn div $k + 1) - 1)
                div (__ntn div $k) + 1 END"""))
      .drop("__ntrn", "__ntn")
  }

  /** Global EXCLUSIVE prefix sum of `weightCol` (long) in `orderCols`
    * order: each row gets the exact sum of all weights strictly before
    * it. Row one gets 0. */
  def exclusivePrefixSum(df: DataFrame, orderCols: Seq[Column],
      weightCol: String, outCol: String, nPart: Int = 32): DataFrame = {
    val parts = df.repartitionByRange(nPart, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parts.withColumn("__cum", sum(col(weightCol)).over(wLocal))
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy("__pid")
      .agg(sum(col(weightCol)).as("__psum"))
      .withColumn("__poff", coalesce(sum("__psum").over(wOff), lit(0L)))
      .select("__pid", "__poff")
    local.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__cum") + col("__poff") - col(weightCol))
      .drop("__pid", "__cum", "__poff")
  }
}
