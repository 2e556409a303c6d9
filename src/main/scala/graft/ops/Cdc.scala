package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing (batch CDC): classify every key of two table
  * versions as insert / delete / update / unchanged — the
  * change-data-capture primitive for day-over-day reconciliation of a
  * warehouse table (the governed view of the reference's re-landed day
  * files) when no transaction log exists.
  *
  * Scale shape: ONE full-outer join keyed on the primary key — both
  * sides shuffle once on the key, the comparison is a map-side
  * projection, and the usual consumer (per-class counts, or the
  * update/insert rows feeding a MERGE) aggregates or filters without
  * another corpus shuffle. Null-safe comparison (`<=>`) so NULL→value
  * and value→NULL count as updates, not unchanged.
  */
object Cdc {
  /** @param keys  primary-key columns (same names both sides)
    * @param cols  payload columns compared for update detection
    * @return keys ++ (change: insert|delete|update|unchanged)
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String], cols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ cols).map(col): _*)
      .withColumn("__in_old", lit(1))
    val n = cols.foldLeft(
        newDf.select((keys ++ cols).map(col): _*)
          .withColumn("__in_new", lit(1))) {
      (df, c) => df.withColumnRenamed(c, s"__new_$c")
    }
    val changed = cols.map(c => !(col(c) <=> col(s"__new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("__in_new").isNull, "delete")
          .when(col("__in_old").isNull, "insert")
          .when(changed, "update")
          .otherwise("unchanged"))
      .select(keys.map(col) :+ col("change"): _*)
  }

  /** Merkle-style bucket digests for cheap replica comparison: rows hash
    * to a 64-bit xxhash64 over `cols`, fold into per-bucket `bit_xor`
    * digests (bucket = keyCol mod nBuckets). Two table versions compare
    * by joining the two |nBuckets|-row digest relations — the full rows
    * never co-shuffle, so verifying a 100 TB replica costs one scan per
    * side plus a metadata-sized join; only mismatched buckets need a
    * row-level [[snapshotDiff]] afterwards. bit_xor is order- and
    * partitioning-invariant (abelian), which is what makes the digest
    * deterministic under any execution plan.
    *
    * bit_xor alone is blind to EVEN multiplicities (buckets {A,A} and
    * {B,B} both xor to 0 with equal n_rows), so a second order-invariant
    * fold — the wraparound SUM of the same hashes in DECIMAL(38,0) — is
    * emitted alongside: a duplicated-row swap that cancels in the xor
    * still moves the sum (and colliding BOTH folds plus the row count
    * requires an engineered multiset, not a replication fault). */
  def bucketDigests(df: DataFrame, keyCol: String, cols: Seq[String],
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val quoted = cols.map(c => s"`${c.replace("`", "``")}`").mkString(", ")
    df.groupBy(pmod(col(keyCol), lit(nBuckets)).as("bucket"))
      .agg(expr(s"bit_xor(xxhash64($quoted))").as("digest"),
        expr(s"sum(cast(xxhash64($quoted) as decimal(38,0)))")
          .as("digest_sum"),
        count(lit(1)).as("n_rows"))
  }
}
