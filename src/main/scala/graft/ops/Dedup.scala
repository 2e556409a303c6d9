package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup scope — the reference's two distinct semantics, made explicit
  * because they are easy to silently conflate (SURVEY.md §7 known-hard).
  */
sealed trait DedupScope
object DedupScope {
  /** D2: state never cleared — statbank producer keeps every seen hash
    * forever (reference producers/statbank/fetch_data_statbank.py:116-121).
    * Idempotent re-ingest across runs. */
  case object Global extends DedupScope

  /** D1: state cleared per event-time window — energinet producer clears
    * its Redis hash after each day (reference
    * producers/energinet/fetch_data_energinet.py:170-179): duplicates
    * collapse within a day, identical records on different days BOTH
    * survive. */
  final case class PerWindow(timeCol: String, duration: String = "1 day")
      extends DedupScope
}

/** Batch dedup operators (D1/D2/D3). Streaming variants live in
  * graft.streaming.Streams (dropDuplicatesWithinWatermark / dropDuplicates
  * with unbounded state).
  *
  * Scale notes: `dropDuplicates(keys)` is a hash-partitioned first-agg —
  * one shuffle on the key columns, map-side partial dedup for free. The
  * per-window variant adds the window bucket to the shuffle key so state
  * is bounded per day, exactly mirroring the reference's daily state clear.
  */
object Dedup {
  def exact(df: DataFrame, keys: Seq[String], scope: DedupScope): DataFrame =
    scope match {
      case DedupScope.Global =>
        df.dropDuplicates(keys)
      case DedupScope.PerWindow(t, d) =>
        df.withColumn("__dedup_w", window(col(t), d))
          .dropDuplicates(keys :+ "__dedup_w")
          .drop("__dedup_w")
    }

  /** Deterministic keeper: the row with the minimal `orderCol` per key
    * group survives (dropDuplicates keeps an arbitrary row — fine for
    * counts, wrong for reproducible pipelines). Single shuffle via
    * row_number. */
  def keeperFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** D3: processed-window checkpoint — drop work units already recorded in
    * a processed log (reference fetch_data_energinet.py:150-154 skips whole
    * days found in Redis). A left_anti join: broadcastable when the log is
    * small, shuffle-partitioned otherwise; at 100 TB the log is partition
    * metadata, never the data itself. */
  def checkpointFilter(units: DataFrame, processed: DataFrame,
      keyCols: Seq[String]): DataFrame =
    units.join(processed, keyCols, "left_anti")
}
