package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-filling operators for sparse observation streams (sensor feeds,
  * slowly-updating dimensions, intermittent telemetry): carry the last
  * known value forward along event time within each key.
  *
  * Forward fill is `last(value, ignoreNulls = true)` over a
  * ROWS UNBOUNDED PRECEDING frame — a single keyed window, one shuffle on
  * the partition key, no self-join and no driver state. The order columns
  * must form a total order within a key (include a unique id as the last
  * tie-break) or the fill is nondeterministic under retries.
  */
object Fill {
  /** `valueCol` with nulls replaced by the most recent non-null value in
    * (`orderCols` order) within the same `partCols` group; leading nulls
    * (no prior observation) stay null. */
  def forwardFill(df: DataFrame, partCols: Seq[Column], orderCols: Seq[Column],
      valueCol: String, as: String): DataFrame = {
    val w = Window.partitionBy(partCols: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Linear interpolation across gaps: null `valueCol` rows get
    * v_prev + (v_next - v_prev) * (t - t_prev)/(t_next - t_prev) between
    * the nearest known observations in `timeCol` order (a LONG/INT column
    * — exact integer deltas); leading/trailing gaps take the nearest
    * known value flat. Two keyed windows over ONE shuffle on the
    * partition key (same sort order, so the planner reuses the exchange
    * and sort); the lerp itself is a fixed-order IEEE expression — one
    * subtraction pair, one multiply, one division — so interpolated
    * values are bit-stable across engines and partitionings.
    *
    * `timeCol` must be UNIQUE within a partition (it is the whole sort
    * key — duplicate times make prev/next assignment partition-dependent,
    * like forwardFill without a tie-break). A null row exactly BETWEEN
    * two equal-time observations (nt == pt) takes the previous value
    * flat rather than dividing by zero. */
  def interpolateLinear(df: DataFrame, partCols: Seq[Column], timeCol: String,
      valueCol: String, as: String): DataFrame = {
    val back = Window.partitionBy(partCols: _*).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(partCols: _*).orderBy(col(timeCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pv = last(col(valueCol), ignoreNulls = true).over(back)
    val pt = last(when(col(valueCol).isNotNull, col(timeCol)),
      ignoreNulls = true).over(back)
    val nv = first(col(valueCol), ignoreNulls = true).over(fwd)
    val nt = first(when(col(valueCol).isNotNull, col(timeCol)),
      ignoreNulls = true).over(fwd)
    df.withColumn(as,
      when(col(valueCol).isNotNull, col(valueCol))
        .when(pv.isNull, nv)
        .when(nv.isNull, pv)
        .when(nt === pt, pv)
        .otherwise(pv + (nv - pv) * (col(timeCol) - pt).cast("double") /
          (nt - pt).cast("double")))
  }
}
