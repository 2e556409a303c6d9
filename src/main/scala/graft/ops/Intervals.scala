package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval sweeps — the associative-window forms of two analytics that
  * are quadratic when written naively:
  *
  *  - union length of overlapping intervals per key (billable time,
  *    SLA coverage) — naive: self-join to subtract overlaps;
  *  - trailing-window distinct keys per day (7-day actives) — naive:
  *    day×activity range join + COUNT(DISTINCT), which cannot be
  *    expressed as a sliding window because distinct is not
  *    subtractable.
  *
  * Both reduce to keyed lag/lead windows plus boundary deltas, linear
  * in the input and shuffling only on the key. The quadratic forms
  * remain the cross-checks: the DuckDB oracles of q249/q262 and the
  * scalacheck laws in PropertySpec run them against these sweeps.
  */
object Intervals {
  /** Total length of the union of half-open intervals [st, en) per key,
    * with overlapping/touching intervals merged: returns
    * (key, covered, n_segments). `covered` is exact as long as st/en
    * are integers (microseconds, days). A new segment starts where an
    * interval's start clears the running max of every earlier end —
    * running max is associative, so this is one keyed sort, not a
    * self-join. Touching intervals ([a,b) then [b,c)) merge into one
    * segment. */
  def unionPerKey(df: DataFrame, key: String, st: String, en: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(st)
    val prev = Window.partitionBy(key).orderBy(st)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__pm", max(col(en)).over(prev))
      .withColumn("__new",
        (col("__pm").isNull || col(st) > col("__pm")).cast("long"))
      .withColumn("__seg", sum("__new").over(w))
      .groupBy(col(key), col("__seg"))
      .agg((max(col(en)) - min(col(st))).as("__len"))
      .groupBy(col(key))
      .agg(sum("__len").cast("long").as("covered"),
        count(lit(1)).as("n_segments"))
  }

  /** The union of half-open intervals [st, en) per key as explicit
    * DISJOINT segments (key, st, en) — [[unionPerKey]]'s segment pass
    * without the final length fold, for callers that need the merged
    * intervals themselves (difference, gap reports). Touching
    * intervals merge; one keyed sort, linear in the input. */
  def mergePerKey(df: DataFrame, key: String, st: String, en: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(st)
    val prev = Window.partitionBy(key).orderBy(st)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__pm", max(col(en)).over(prev))
      .withColumn("__new",
        (col("__pm").isNull || col(st) > col("__pm")).cast("long"))
      .withColumn("__seg", sum("__new").over(w))
      .groupBy(col(key), col("__seg"))
      .agg(min(col(st)).as("__st"), max(col(en)).as("__en"))
      .select(col(key), col("__st").as(st), col("__en").as(en))
  }

  /** Interval DIFFERENCE: keyed disjoint segments (from [[mergePerKey]])
    * minus a global set of DISJOINT blocked intervals (bst, ben) —
    * blackout windows, maintenance freezes. `blocked` must be
    * calendar-sized (it broadcasts; every segment row is tested against
    * it in a nested-loop join, so keep it to thousands of rows, which
    * is what a calendar-derived blackout set always is). Returns the
    * remaining (key, st, en) pieces, half-open, positive-length only.
    *
    * Sweep per segment: clip each overlapping blocked interval into the
    * segment, then each clip closes the piece that started at the
    * previous clip's end (or the segment start), and the last clip
    * opens the tail piece. Segments with no overlap pass through whole
    * (the left join's null row becomes the full-segment piece). One
    * keyed window over (key, st) — nothing corpus-sized re-shuffles. */
  def subtractBlocked(segs: DataFrame, keys: Seq[String], st: String,
      en: String, blocked: DataFrame, bst: String, ben: String): DataFrame = {
    val j = segs.join(broadcast(blocked),
      col(bst) < col(en) && col(st) < col(ben), "left")
    // Clips within one segment are disjoint (blocked is disjoint), so
    // ordering by the clipped start equals ordering by bst.
    val w = Window.partitionBy((keys :+ st).map(col): _*).orderBy("__cst")
    // greatest/least SKIP nulls in Spark, so an unmatched left-join row
    // would silently clip to the segment itself — guard on the match.
    j.select(keys.map(col) ++ Seq(col(st), col(en),
        when(col(bst).isNotNull, greatest(col(bst), col(st))).as("__cst"),
        when(col(bst).isNotNull, least(col(ben), col(en))).as("__cen")): _*)
      .withColumn("__prev", lag(col("__cen"), 1).over(w))
      .withColumn("__last", lead(col("__cst"), 1).over(w).isNull)
      .select(keys.map(col) :+ explode(array(
        struct(coalesce(col("__prev"), col(st)).as("ps"),
          coalesce(col("__cst"), col(en)).as("pe")),
        struct(when(col("__last") && col("__cen").isNotNull, col("__cen"))
          .as("ps"), col(en).as("pe")))).as("__p"): _*)
      .filter(col("__p.ps") < col("__p.pe"))
      .select(keys.map(col) ++
        Seq(col("__p.ps").as(st), col("__p.pe").as(en)): _*)
  }

  /** For every day that appears in `df`, the number of distinct keys
    * with at least one row in the trailing `windowDays`-day window
    * (inclusive): returns (day_num, active). Input is one row per
    * (key, dayNum) — dedupe first. The sweep: merge each key's active
    * days into gap-≤(windowDays−1) segments via one lag/lead window,
    * emit +1 at segment start and −1 at segment end + windowDays, and
    * running-sum the deltas over the day spine — calendar-grain, so
    * the unpartitioned cumsum is metadata-sized at any corpus scale. */
  def rollingActiveCounts(df: DataFrame, key: String, dayNum: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val gap = windowDays - 1
    val w = Window.partitionBy(key).orderBy(dayNum)
    val seg = df
      .withColumn("__prev", lag(col(dayNum), 1).over(w))
      .withColumn("__next", lead(col(dayNum), 1).over(w))
    val starts = seg
      .filter(col("__prev").isNull || col(dayNum) - col("__prev") > gap)
      .select(col(dayNum).as("day_num"), lit(1L).as("__delta"))
    val ends = seg
      .filter(col("__next").isNull || col("__next") - col(dayNum) > gap)
      .select((col(dayNum) + windowDays).as("day_num"), lit(-1L).as("__delta"))
    val spine = df.select(col(dayNum).as("day_num")).distinct()
    starts.unionByName(ends)
      .unionByName(spine.withColumn("__delta", lit(0L)))
      .groupBy("day_num").agg(sum("__delta").as("__d"))
      .withColumn("active",
        sum("__d").over(Window.orderBy("day_num")).cast("long"))
      .join(spine, Seq("day_num"), "left_semi")
      .select("day_num", "active")
  }
}
