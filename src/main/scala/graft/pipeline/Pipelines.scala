package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._
import graft.schemas.Contracts

/** The reference's two ingest graphs composed end-to-end from the operator
  * library (SURVEY §3 E1/E2) — the module §7's build plan calls `pipeline`.
  *
  * E1 (energinet): envelope JSON → records (S1) → contract projection (P3)
  * → canonical key (P5) → per-day dedup (D1) → keyed Avro frames (K1).
  * E1' (statbank): JSON-STAT cube → flatten (P1) → Bil54 contract shape
  * (P2 dimension mapping) → global dedup (D2) → keyed Avro frames.
  *
  * Every stage is a narrow or single-shuffle transform; the only state is
  * the dedup key — per-day-bounded for E1 (the reference clears Redis
  * daily), global for E1' (statbank never clears). Sink legs are frame
  * DataFrames: `.write.format("kafka")` in production, files here.
  */
object Pipelines {
  val ciAvro: String =
    AvroSerDe.avroSchemaFor("ConsumptionIndustry", Contracts.consumptionIndustry)
  val bil54Avro: String =
    AvroSerDe.avroSchemaFor("Bil54", Contracts.bil54)

  /** E1: ConsumptionIndustry envelopes (column `jsonCol`) → deduped keyed
    * Avro frames. */
  def energinetE1(envelopes: DataFrame, jsonCol: String = "js"): DataFrame = {
    val records = Normalize.explodeEnvelope(envelopes, jsonCol,
      Contracts.consumptionIndustry)
    val enforced = Contracts.enforce(records, Contracts.consumptionIndustry)
    val keyed = enforced
      .withColumn("__ts", to_timestamp(col("HourUTC")))
      .withColumn("__key",
        Keys.canonicalKey(Contracts.consumptionIndustry.fieldNames.toSeq))
    val deduped = Dedup
      .exact(keyed, Seq("__key"), DedupScope.PerWindow("__ts", "1 day"))
      .drop("__ts", "__key")
    AvroSerDe.encode(deduped, ciAvro, keyCol = "HourUTC")
  }

  /** E1' (statbank): JSON-STAT cubes (column `jsonCol`) → Bil54-shaped
    * rows → globally-deduped keyed Avro frames. Dimension mapping and the
    * DRIV two-code fallback follow the reference's extraction (P2). */
  def statbankE1(cubes: DataFrame, jsonCol: String = "js"): DataFrame = {
    val flat = JsonStat.flatten(cubes, jsonCol,
      Seq("OMRÅDE", "BILTYPE", "BRUG", "EJER", "DRIV", "ContentsCode", "Tid"))
    val shaped = flat.select(
      col("OMRÅDE").as("region"),
      col("BILTYPE").as("type_of_vehicle"),
      col("BRUG").as("terms_of_use"),
      col("DRIV").as("propellant"),
      col("ContentsCode").as("content_label"),
      lit("number").as("unit"),
      col("Tid").as("time"),
      col("value").cast("int").as("value"),
      col("label"), col("source"), col("updated"),
      lit(null).cast("string").as("documentation"),
      col("table_id"),
      coalesce(col("decimals"), lit(0)).as("decimals"))
    val enforced = Contracts.enforce(shaped, Contracts.bil54)
    val deduped = Dedup.exact(
      enforced.withColumn("__key",
        Keys.canonicalKey(Contracts.bil54.fieldNames.toSeq)),
      Seq("__key"), DedupScope.Global).drop("__key")
    AvroSerDe.encode(deduped, bil54Avro, keyCol = "time")
  }

  /** E2: frames (key, Avro value) → decoded contract rows → widened
    * analytics view (the ksqlDB stream + HDFS sink leg in one). */
  def consumeE2(frames: DataFrame): DataFrame =
    Contracts.widenFloats(
      AvroSerDe.decode(frames, ciAvro, Contracts.consumptionIndustry))
}
