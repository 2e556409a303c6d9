package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-input normalization (SURVEY §2.3): the Energinet response envelope
  * `{"total": N, "dataset": "...", "records": [...]}` is unwrapped to one
  * row per record (fetch_data_energinet.py:97,166), and date parameters
  * are validated before use (P6, :83-87).
  */
object Normalize {
  /** S1 normalize: explode the `records` array of a response envelope into
    * contract-shaped rows. */
  def explodeEnvelope(df: DataFrame, jsonCol: String,
      recordSchema: StructType): DataFrame = {
    val envSchema = StructType(Seq(
      StructField("total", LongType),
      StructField("dataset", StringType),
      StructField("records", ArrayType(recordSchema))))
    df.select(from_json(col(jsonCol), envSchema).as("__env"))
      .select(explode(col("__env.records")).as("__rec"))
      .select(recordSchema.fieldNames.map(f => col(s"__rec.$f")).toIndexedSeq: _*)
  }

  /** P6: non-null, non-blank validation filter. */
  def validNonBlank(c: Column): Column = c.isNotNull && trim(c) =!= ""
}
