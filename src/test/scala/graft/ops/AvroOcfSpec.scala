package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.types._
import graft.SparkSpec

class AvroOcfSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("ocf").toString

  test("K2: OCF round trip preserves rows; one container file per partition") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("x", DoubleType, nullable = false)))
    val avro = AvroSerDe.avroSchemaFor("Rec", schema)
    val df = (1L to 100L).map(i => (i, s"n$i", i * 0.5)).toDF("id", "name", "x")
      .repartition(3)
    val dir = tmpDir()
    AvroOcf.write(df, avro, dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".avro")).filterNot(_.startsWith(".")).sorted
    assert(files.length == 3, files.toSeq)
    val back = AvroOcf.read(spark, dir, avro, schema)
      .as[(Long, String, Double)].collect().toSet
    assert(back == (1L to 100L).map(i => (i, s"n$i", i * 0.5)).toSet)
  }

  test("K2+D6: v2 reader schema resolves v1 container files (added default field)") {
    val v1 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = false)))
    val v1Avro = AvroSerDe.avroSchemaFor("Rec", v1)
    val dir = tmpDir()
    AvroOcf.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), v1Avro, dir)
    // v2 adds a defaulted field and reorders; resolution fills tag = null.
    val v2Avro =
      """{"type": "record", "name": "Rec", "fields": [
        |  {"name": "tag", "type": ["null", "string"], "default": null},
        |  {"name": "name", "type": "string"},
        |  {"name": "id", "type": "long"}]}""".stripMargin
    val v2 = StructType(Seq(
      StructField("tag", StringType, nullable = true),
      StructField("name", StringType, nullable = false),
      StructField("id", LongType, nullable = false)))
    val back = AvroOcf.read(spark, dir, v2Avro, v2)
      .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
    assert(back == Set((null, "a", 1L), (null, "b", 2L)))
  }

  test("K2: empty partitions write no files; write overwrites prior contents") {
    val schema = StructType(Seq(StructField("id", LongType, nullable = false)))
    val avro = AvroSerDe.avroSchemaFor("Rec", schema)
    val dir = tmpDir()
    AvroOcf.write(Seq(1L, 2L).toDF("id").repartition(8), avro, dir)
    val firstFiles = new java.io.File(dir).listFiles().map(_.getName)
      .count(f => f.endsWith(".avro") && !f.startsWith("."))
    assert(firstFiles <= 2, s"expected <=2 non-empty part files, got $firstFiles")
    // Overwrite with a single row: stale part files must not survive.
    AvroOcf.write(Seq(9L).toDF("id").repartition(1), avro, dir)
    val back = AvroOcf.read(spark, dir, avro, schema).as[Long].collect().toSeq
    assert(back == Seq(9L))
  }
}
