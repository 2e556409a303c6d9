package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}
import graft.ops.{AvroOcf, AvroSerDe}

class AvroDaySinkSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("value", DoubleType), StructField("day", StringType)))

  test("sink lands day=... dirs of published Avro files, no staging residue") {
    val base = Files.createTempDirectory("daysink").toString + "/t"
    val ev = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
    ev.repartition(col("day"))
      .write.format("graft.sources.v2.AvroDaySink")
      .option("path", base).mode("append").save()
    val days = new java.io.File(base).listFiles().map(_.getName).sorted
    assert(days.nonEmpty && days.forall(_.startsWith("day=")), days.mkString(","))
    // The local FS writes .crc checksum sidecars; only data files matter.
    val files = new java.io.File(base).listFiles().flatMap(_.listFiles())
      .filterNot(_.getName.endsWith(".crc"))
    assert(files.forall(f => f.getName.endsWith(".avro")),
      "staged .tmp files must not survive commit: " +
        files.map(_.getName).mkString(","))
    // Re-reading EVERY day through the OCF source recovers the exact input.
    val avroJson = AvroSerDe.avroSchemaFor("SinkRecord", sch)
    val got = days.map(dd => AvroOcf.read(spark, s"$base/$dd", avroJson, sch))
      .reduce(_.unionByName(_))
      .as[(Long, Long, Double, String)].collect().toSet
    val expected = ev.as[(Long, Long, Double, String)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("streaming leg: two checkpointed micro-batches land epoch-named files") {
    val src = Files.createTempDirectory("daysrc").toString
    val base = Files.createTempDirectory("daysink").toString + "/t"
    val ck = Files.createTempDirectory("dayck").toString
    def push(rows: Seq[(Long, Long, Double, String)]): Unit =
      rows.toDF("event_id", "user_id", "value", "day")
        .coalesce(1).write.mode("append").parquet(src)
    push(Seq((1L, 10L, 1.0, "2024-03-01"), (2L, 11L, 2.0, "2024-03-02")))
    val stream = spark.readStream.schema(sch).parquet(src)
    val q = stream.writeStream.format("graft.sources.v2.AvroDaySink")
      .option("path", base).option("checkpointLocation", ck).start()
    q.processAllAvailable()
    push(Seq((3L, 12L, 3.0, "2024-03-01")))
    q.processAllAvailable()
    q.stop()
    val days = new java.io.File(base).listFiles().map(_.getName).sorted
    assert(days.toSeq == Seq("day=2024-03-01", "day=2024-03-02"), days.mkString(","))
    val names = new java.io.File(base).listFiles().flatMap(_.listFiles())
      .map(_.getName).filterNot(_.endsWith(".crc"))
    assert(names.forall(n => n.startsWith("part-e") && n.endsWith(".avro")),
      names.mkString(","))
    val avroJson = AvroSerDe.avroSchemaFor("SinkRecord", sch)
    val got = days.map(dd => AvroOcf.read(spark, s"$base/$dd", avroJson, sch))
      .reduce(_.unionByName(_))
      .as[(Long, Long, Double, String)].collect().toSet
    assert(got == Set((1L, 10L, 1.0, "2024-03-01"), (2L, 11L, 2.0, "2024-03-02"),
      (3L, 12L, 3.0, "2024-03-01")))
  }

  test("a task spanning several days opens one writer per day, all published") {
    val base = Files.createTempDirectory("daysink").toString + "/t"
    val rows = Seq(
      (1L, 10L, 1.5, "2024-02-01"), (2L, 11L, 2.5, "2024-02-02"),
      (3L, 12L, 3.5, "2024-02-03"), (4L, 13L, 4.5, "2024-02-01"))
    rows.toDF("event_id", "user_id", "value", "day")
      .coalesce(1) // one task sees all days
      .write.format("graft.sources.v2.AvroDaySink")
      .option("path", base).mode("append").save()
    val days = new java.io.File(base).listFiles().map(_.getName).sorted
    assert(days.toSeq == Seq("day=2024-02-01", "day=2024-02-02", "day=2024-02-03"))
    val avroJson = AvroSerDe.avroSchemaFor("SinkRecord", sch)
    val got = days.map(dd => AvroOcf.read(spark, s"$base/$dd", avroJson, sch))
      .reduce(_.unionByName(_))
      .as[(Long, Long, Double, String)].collect().toSet
    assert(got == rows.toSet)
  }
}
