package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler: per column — null count, exact distinct
  * count, min and max rendered to a normalized string — emitted as one
  * row per column. The data-quality sweep run before committing a new
  * source into a corpus.
  *
  * Scale shape: ALL columns profile in a SINGLE aggregation pass over the
  * table (then a metadata-sized explode pivots the 1-row aggregate to
  * long form). Multiple exact count-distincts in one aggregate plan via
  * Catalyst's Expand — one scan at the cost of an |specs|-way row
  * multiplication in the shuffle, the standard one-pass/with-expand
  * trade; swap `countDistinct` for `approx_count_distinct` when the exact
  * count isn't worth that shuffle at 100 TB.
  *
  * min/max are computed on the NATIVE column type (so ordering is the
  * type's, not lexicographic) and only then rendered through `fmt` —
  * profile("9.0") < profile("10.0") stays numerically ordered.
  */
object Profile {
  /** Column to profile; `fmt` renders the typed min/max aggregate to a
    * string (must return a string-typed column). */
  final case class Spec(name: String, fmt: Column => Column = _.cast("string"))

  def profile(df: DataFrame, specs: Seq[Spec]): DataFrame = {
    require(specs.nonEmpty, "profile of zero columns")
    val aggs = specs.flatMap { sp =>
      val c = col(sp.name)
      Seq(
        count(when(c.isNull, lit(1))).as(s"__nn_${sp.name}"),
        countDistinct(c).as(s"__nd_${sp.name}"),
        sp.fmt(min(c)).as(s"__mn_${sp.name}"),
        sp.fmt(max(c)).as(s"__mx_${sp.name}"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = specs.map { sp =>
      struct(lit(sp.name).as("col_name"),
        col(s"__nn_${sp.name}").as("n_nulls"),
        col(s"__nd_${sp.name}").as("n_distinct"),
        col(s"__mn_${sp.name}").as("min_str"),
        col(s"__mx_${sp.name}").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Equi-width histogram of a numeric column: data-derived [min, max]
    * bounds, `nBins` equal bins, the max value folded into the last bin.
    * bin = min(nBins−1, floor((x − mn) · nBins / (mx − mn))) — fixed-order
    * IEEE double arithmetic, so bin assignment is bit-identical across
    * engines. Two aggregate passes (bounds, then counts) with the 1-row
    * bounds broadcast into the binning projection — nothing row-sized
    * crosses the driver. Only non-empty bins are emitted. */
  def histogram(df: DataFrame, c: Column, nBins: Int): DataFrame = {
    require(nBins > 0)
    val bounds = df.agg(min(c.cast("double")).as("__mn"),
      max(c.cast("double")).as("__mx"))
    df.select(c.cast("double").as("__v"))
      .crossJoin(broadcast(bounds))
      .select(when(col("__mx") === col("__mn"), lit(0))
        .otherwise(least(lit(nBins - 1),
          floor((col("__v") - col("__mn")) * lit(nBins.toDouble) /
            (col("__mx") - col("__mn")))))
        .cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }

  /** Equi-DEPTH histogram (quantile binning): bucket boundaries are the
    * exact interpolated percentiles at i/nBins, so bins hold ~equal row
    * counts — the feature-discretization / data-skew diagnostic
    * complement of the equi-width [[histogram]]. Boundaries come from one
    * aggregate (a 1-row broadcast back over the scan — the q82 map-side
    * gate shape, no corpus shuffle before the bin groupBy). A value lands
    * in bin i (0-based) when it exceeds boundary i; ties at a boundary go
    * to the lower bin (`>` comparisons, matching SQL `CASE WHEN v > b`).
    * Integral inputs keep the percentile interpolation exact in every
    * engine (q29 precedent). */
  def equiDepthHistogram(df: DataFrame, colName: String, nBins: Int): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val c = col(colName)
    val ps = (1 until nBins).map(i => i.toDouble / nBins)
    val bounds = df.agg(
      expr(s"percentile($colName, array(${ps.mkString(", ")}))").as("__bs"))
    val bin = (1 until nBins).foldLeft(lit(0)) { (acc, i) =>
      acc + when(c.cast("double") > element_at(col("__bs"), i), 1).otherwise(0)
    }
    df.crossJoin(broadcast(bounds))
      .select(bin.cast("int").as("bin"), c.cast("double").as("__v"))
      .groupBy("bin").agg(count(lit(1)).as("n"),
        min(col("__v")).as("lo"), max(col("__v")).as("hi"))
  }
}
