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
}
