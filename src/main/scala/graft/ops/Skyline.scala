package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) operator — Börzsönyi et al., ICDE 2001
  * ("The Skyline Operator"): the rows not DOMINATED under
  * (minimize `minCol`, maximize `maxCol`); A dominates B when A is no
  * worse on both dimensions and strictly better on at least one. Ties on
  * both dimensions survive together (neither dominates).
  *
  * 2-D skylines don't need the quadratic dominance test: sorted by the
  * minimized dimension, a row survives iff no strictly-cheaper row
  * reaches its `maxCol` and it tops its own cost tie-group. The sweep is
  * NOT a global single-partition window (the scale-killer shape): each
  * row gets a monotone range-bucket id computed as a pure expression of
  * its cost against broadcast one-row min/max bounds, the running max
  * runs per bucket, and the cross-partition carry is a prefix max over
  * ONE ROW PER BUCKET (metadata-sized, the packSequences two-level
  * discipline) broadcast back. Equal costs share a bucket by
  * construction, so the tie-group frame never spans buckets, and a row
  * in an earlier bucket is always strictly cheaper. At 100 TB: ONE
  * hash shuffle of the input on the bucket key, a broadcast two-value
  * bounds row, an nBuckets-row carry — nothing pairwise, nothing
  * single-partition. Heavily clustered costs can skew a bucket; raise
  * `nBuckets` (ids are dense longs, the carry stays tiny) — the
  * standard salting escape (q61) does not apply because bucket order
  * must stay monotone in cost.
  */
object Skyline {

  /** @param minCol integer-valued dimension to minimize (exact ties;
    *               value spread × nBuckets must fit int64)
    * @param maxCol integer-valued dimension to maximize
    * @return input rows on the Pareto frontier */
  def skyline2D(df: DataFrame, minCol: String, maxCol: String,
      nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val bounds = df.agg(min(col(minCol)).cast("long").as("__lo"),
      max(col(minCol)).cast("long").as("__hi"))
    // monotone in cost, equal costs share a bucket, range [0, nBuckets);
    // floor gives a LONG key (a double key would defeat hash/sort
    // locality printing and cost normalization per row); the least()
    // clamp guards the half-ulp rounding edge at extreme value spreads
    val bkt = least(
      floor((col(minCol).cast("long") - col("__lo")).cast("double") * nBuckets /
        (col("__hi") - col("__lo") + 1)),
      lit(nBuckets - 1L))
    val bucketed = df.crossJoin(broadcast(bounds))
      .withColumn("__bkt", bkt)
    // strictly-cheaper rows within the bucket: range frame (-inf, -1]
    // over the cost value; cost tie-group: range frame [0, 0] — same
    // partitioning and ordering, one exchange, one sort
    val wLocal = Window.partitionBy(col("__bkt")).orderBy(col(minCol))
    val local = bucketed
      .withColumn("__loc_cheaper", max(col(maxCol))
        .over(wLocal.rangeBetween(Window.unboundedPreceding, -1)))
      .withColumn("__tie_max", max(col(maxCol))
        .over(wLocal.rangeBetween(0, 0)))
    // cross-bucket carry: every row in an earlier bucket is strictly
    // cheaper, so its bucket max dominates the same way a local cheaper
    // row does — one row per bucket, prefix-maxed and broadcast back
    val carry = local.groupBy("__bkt").agg(max(col(maxCol)).as("__bmax"))
      .withColumn("__before_max", max(col("__bmax")).over(
        Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)))
      .select("__bkt", "__before_max")
    local.join(broadcast(carry), Seq("__bkt"))
      .withColumn("__cheaper_max",
        greatest(coalesce(col("__loc_cheaper").cast("long"), lit(Long.MinValue)),
          coalesce(col("__before_max").cast("long"), lit(Long.MinValue))))
      .filter(col(maxCol) === col("__tie_max") &&
        col("__cheaper_max") < col(maxCol).cast("long"))
      .drop("__bkt", "__lo", "__hi", "__loc_cheaper", "__tie_max",
        "__before_max", "__cheaper_max")
  }
}
