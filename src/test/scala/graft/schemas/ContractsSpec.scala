package graft.schemas

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.types._
import graft.SparkSpec

class ContractsSpec extends SparkSpec {
  import spark.implicits._

  test("P3 enforce projects to exact contract fields and types") {
    val raw = Seq(("2024-12-01T10:00", "2024-12-01T11:00", "101", "Erhverv",
        1234.5, "extra"))
      .toDF("HourUTC", "HourDK", "MunicipalityNo", "Branche",
        "ConsumptionkWh", "junk")
    val out = Contracts.enforce(raw, Contracts.consumptionIndustry)
    assert(out.columns.toSeq ==
      Seq("HourUTC", "HourDK", "MunicipalityNo", "Branche", "ConsumptionkWh"))
    assert(out.schema("ConsumptionkWh").dataType == FloatType)
  }

  test("P3 enforce fails on contract miss (serializer-error parity)") {
    val raw = Seq(("x")).toDF("HourUTC")
    intercept[AnalysisException] {
      Contracts.enforce(raw, Contracts.consumptionIndustry)
    }
  }

  test("P8 widenFloats: float -> double, everything else untouched") {
    val df = Seq((1.5f, "s", 2)).toDF("f", "s", "i")
    val out = Contracts.widenFloats(df)
    assert(out.schema("f").dataType == DoubleType)
    assert(out.schema("s").dataType == StringType)
    assert(out.schema("i").dataType == IntegerType)
    assert(out.head.getDouble(0) == 1.5)
  }

  test("contract field counts match the avsc sources") {
    assert(Contracts.consumptionIndustry.fields.length == 5)
    assert(Contracts.productionConsumptionSettlement.fields.length == 28)
    assert(Contracts.bil52.fields.length == 6)
    assert(Contracts.bil54.fields.length == 14)
    // PCS: every field nullable (all-union schema)
    assert(Contracts.productionConsumptionSettlement.fields.forall(_.nullable))
  }
}
