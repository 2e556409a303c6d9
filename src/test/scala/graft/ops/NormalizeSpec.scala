package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.schemas.Contracts

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("S1: envelope explodes to one row per record") {
    val env =
      """{"total": 2, "dataset": "ConsumptionIndustry", "records": [
        |{"HourUTC": "2024-12-01T10:00:00", "HourDK": "2024-12-01T11:00:00",
        | "MunicipalityNo": "101", "Branche": "Erhverv", "ConsumptionkWh": 1234.5},
        |{"HourUTC": "2024-12-01T11:00:00", "HourDK": "2024-12-01T12:00:00",
        | "MunicipalityNo": "101", "Branche": "Privat", "ConsumptionkWh": 99.0}]}""".stripMargin
    val out = Normalize.explodeEnvelope(Seq(env).toDF("js"), "js",
      Contracts.consumptionIndustry)
    assert(out.count() == 2)
    assert(out.columns.toSeq == Contracts.consumptionIndustry.fieldNames.toSeq)
    assert(out.filter(col("Branche") === "Privat").count() == 1)
  }

  test("S1: empty records array yields zero rows") {
    val env = """{"total": 0, "dataset": "X", "records": []}"""
    val out = Normalize.explodeEnvelope(Seq(env).toDF("js"), "js",
      Contracts.consumptionIndustry)
    assert(out.count() == 0)
  }

  test("P6: date validation filter") {
    val df = Seq("2024-01-01", "", "  ", null).toDF("d")
    assert(df.filter(Normalize.validNonBlank(col("d"))).count() == 1)
  }
}
