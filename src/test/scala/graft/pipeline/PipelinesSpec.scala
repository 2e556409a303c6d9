package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.SparkSpec
import graft.ops.JsonStatFixture

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  private def env(records: String) =
    s"""{"total": 9, "dataset": "ConsumptionIndustry", "records": [$records]}"""
  private def rec(hour: String, muni: String, kwh: Double) =
    s"""{"HourUTC": "$hour", "HourDK": "$hour", "MunicipalityNo": "$muni",
        "Branche": "Erhverv", "ConsumptionkWh": $kwh}"""

  test("E1: envelope -> contract -> per-day dedup -> keyed Avro frames") {
    val envelopes = Seq(env(Seq(
      rec("2024-12-01T10:00:00", "101", 1.5),
      rec("2024-12-01T10:00:00", "101", 1.5), // same-day dup -> collapsed
      rec("2024-12-02T10:00:00", "101", 1.5), // next-day recurrence -> kept
      rec("2024-12-01T11:00:00", "155", 2.0)
    ).mkString(","))).toDF("js")
    val frames = Pipelines.energinetE1(envelopes)
    assert(frames.columns.toSeq == Seq("key", "value"))
    assert(frames.count() == 3)
    // E2 closes the loop: decode back to the contract and widen.
    val back = Pipelines.consumeE2(frames)
    assert(back.schema("ConsumptionkWh").dataType == DoubleType)
    assert(back.filter(col("MunicipalityNo") === "101").count() == 2)
  }

  test("E1' statbank: cube -> Bil54 rows -> global dedup -> frames") {
    // Same cube twice: global dedup (D2) makes re-ingest idempotent.
    val cubes = Seq(JsonStatFixture.json, JsonStatFixture.json).toDF("js")
    val frames = Pipelines.statbankE1(cubes)
    val keys = frames.select("key").as[String].collect().sorted
    assert(keys.toSeq == Seq("2024M10", "2024M11"))
  }
}
