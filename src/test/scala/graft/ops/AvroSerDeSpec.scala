package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.schemas.Contracts

class AvroSerDeSpec extends SparkSpec {
  import spark.implicits._

  private val ciAvro =
    AvroSerDe.avroSchemaFor("ConsumptionIndustry", Contracts.consumptionIndustry)

  test("K1/P3/P4: ConsumptionIndustry round-trips through Avro binary") {
    val rows = Seq(
      ("2024-12-01T10:00", "2024-12-01T11:00", "101", "Erhverv", 1234.5f),
      ("2024-12-01T11:00", "2024-12-01T12:00", "155", "Privat", 0.25f))
    val df = rows.toDF("HourUTC", "HourDK", "MunicipalityNo", "Branche",
      "ConsumptionkWh")
    val encoded = AvroSerDe.encode(df, ciAvro, keyCol = "HourUTC")
    assert(encoded.columns.toSeq == Seq("key", "value"))
    val keys = encoded.select("key").as[String].collect().sorted
    assert(keys.toSeq == Seq("2024-12-01T10:00", "2024-12-01T11:00"))
    val decoded = AvroSerDe.decode(encoded, ciAvro, Contracts.consumptionIndustry)
    val back = decoded.as[(String, String, String, String, Float)].collect().toSet
    assert(back == rows.toSet)
  }

  test("nullable union fields survive the round trip as nulls") {
    val schema = StructType(Seq(
      StructField("a", StringType, nullable = true),
      StructField("x", FloatType, nullable = true)))
    val avro = AvroSerDe.avroSchemaFor("Nullable", schema)
    val df = spark.createDataFrame(
      java.util.List.of(Row("k", null), Row(null, 2.5f)), schema)
    val back = AvroSerDe.decode(
      AvroSerDe.encode(df, avro, keyCol = "a"), avro, schema).collect()
    assert(back.map(r => (r.get(0), r.get(1))).toSet ==
      Set(("k", null), (null, 2.5f)))
  }

  test("schema evolution: v2 reader decodes v1 bytes by name with defaults (D6)") {
    // Registry-style "latest version wins": bytes were produced under v1
    // (a, x); the reader's v2 schema ADDS a defaulted field y and REORDERS
    // to (y, x, a). Avro resolution must default y and the row assembly must
    // map by field name — positional mapping would shift every value.
    val v1 = StructType(Seq(
      StructField("a", StringType, nullable = false),
      StructField("x", FloatType, nullable = false)))
    val v1Avro = AvroSerDe.avroSchemaFor("Rec", v1)
    val v2Avro =
      """{"type": "record", "name": "Rec", "fields": [
        |  {"name": "y", "type": ["null", "long"], "default": null},
        |  {"name": "x", "type": "float"},
        |  {"name": "a", "type": "string"}]}""".stripMargin
    val v2Spark = StructType(Seq(
      StructField("y", LongType, nullable = true),
      StructField("x", FloatType, nullable = false),
      StructField("a", StringType, nullable = false)))
    val encoded = AvroSerDe.encode(
      Seq(("k1", 1.5f), ("k2", -2f)).toDF("a", "x"), v1Avro, keyCol = "a")
    val back = AvroSerDe.decodeEvolved(encoded, v1Avro, v2Avro, v2Spark)
      .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
    assert(back == Set((null, 1.5f, "k1"), (null, -2f, "k2")))
  }

  test("Confluent wire framing round-trips (magic 0x00 + BE schema id)") {
    val payload = Array[Byte](1, 2, 3, 4)
    val framed = AvroSerDe.frame(payload, schemaId = 7)
    assert(framed.length == 9 && framed(0) == 0x00)
    val (id, back) = AvroSerDe.deframe(framed)
    assert(id == 7 && back.toSeq == payload.toSeq)
  }

  test("avroSchemaFor maps the contract type surface") {
    assert(ciAvro.contains("\"float\""))
    val pcs = AvroSerDe.avroSchemaFor("PCS", Contracts.productionConsumptionSettlement)
    // all 28 fields are ["null", T] unions with default null
    assert("\\[\"null\"".r.findAllIn(pcs).length == 28)
    assert("\"default\": null".r.findAllIn(pcs).length == 28)
  }
}
