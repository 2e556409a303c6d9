package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure interval join (no equi-key) without a cross product.
  *
  * Spark plans `points JOIN intervals ON pt BETWEEN start AND end` with no
  * equi-condition as a BroadcastNestedLoopJoin — O(|P| * |I|) comparisons
  * and a broadcast of one whole side, which does not survive 100 TB. The
  * standard fix is binning: quantize time into fixed-width buckets, explode
  * each interval over every bucket it overlaps, equi-join points to
  * intervals on the bucket (hash shuffle — linear), and keep the exact
  * range predicate as a residual filter. Cost is
  * O(|P| + |I| * avgBucketsPerInterval + |candidate pairs|), and the
  * shuffle key is a single long.
  *
  * Bucket width trades replication for candidate precision: width ~ the
  * median interval length keeps both the per-interval explosion and the
  * residual-filter kill rate small.
  */
object RangeJoin {
  /** Join `points` (timestamp column `ptCol`) to `intervals` (columns
    * `startCol` inclusive, `endCol` exclusive) on containment, binned into
    * `bucketSeconds`-wide buckets. Returns all point-row x interval-row
    * matches with both sides' columns. */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long = 7L * 24 * 3600): DataFrame = {
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c) / bucketSeconds).cast("long")
    val p = points.withColumn("__bucket", bucketOf(col(ptCol)))
    // Explode each interval over every bucket it can overlap. Including
    // end's bucket even when end sits exactly on a boundary only adds
    // candidates the residual filter kills — never loses a match.
    val i = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    p.join(i, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
