package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics WITHOUT a global sort — the distributed
  * selection primitive for "give me the exact p50/p90/p99" on a relation
  * where `orderBy().limit(k)` would range-shuffle the whole column and
  * approx_percentile would not be exact.
  *
  * Two passes over the data, both narrow-ish:
  *  1. a histogram on `value >> shift` (one map-side-combined groupBy;
  *     the collected histogram is range/2^shift rows — METADATA, the only
  *     driver state). Driver arithmetic locates each requested rank's
  *     bucket and residual rank within it.
  *  2. one scan filtered to the union of hit buckets (a pushable range
  *     predicate — on a sorted/bucketed layout this prunes files), a
  *     per-(bucket, value) count, a per-bucket cumsum window (each
  *     bucket's distinct values only — bounded by 2^shift), and a
  *     broadcast join against the rank spec.
  *
  * At 100 TB the full-sort alternative shuffles the entire column once
  * per query; this shape shuffles only the hit buckets' value counts
  * (≤ requested-ranks × 2^shift rows). Choose `shift` so the level-1
  * histogram stays ≤ ~10^4 buckets; for wider domains add a second
  * narrowing level with the same recurrence.
  */
object Select {
  /** Exact 1-based k-th smallest of non-negative long column `valueCol`
    * for each labelled rank in `ranks`. Returns (label, k, value). */
  def kthSmallest(spark: SparkSession, df: DataFrame, valueCol: String,
      shift: Int, ranks: Seq[(String, Long)]): DataFrame = {
    require(shift >= 0 && shift < 63, s"bad shift $shift")
    val b = shiftright(col(valueCol), shift).as("b")
    // Metadata-sized: range/2^shift rows, the documented driver state.
    val hist = df.groupBy(b).agg(count(lit(1)).as("n"))
      .orderBy("b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val specs = ranks.map { case (label, k) =>
      require(k >= 1, s"rank $label: k must be >= 1, got $k")
      var rem = k
      var i = 0
      while (i < hist.length && rem > hist(i)._2) { rem -= hist(i)._2; i += 1 }
      require(i < hist.length, s"rank $label: k=$k exceeds row count")
      (label, k, hist(i)._1, rem)
    }
    val spec = spark.createDataFrame(specs)
      .toDF("label", "k", "b", "resid")
    val hit = specs.map(_._3).distinct
    df.filter(shiftright(col(valueCol), shift).isin(hit: _*))
      .groupBy(shiftright(col(valueCol), shift).as("b"),
        col(valueCol).as("value"))
      .agg(count(lit(1)).as("n"))
      .withColumn("cum",
        sum("n").over(Window.partitionBy("b").orderBy("value")))
      .join(broadcast(spec), Seq("b"))
      .filter(col("cum") >= col("resid"))
      .groupBy("label", "k").agg(min("value").as("value"))
      .orderBy("k")
  }
}
