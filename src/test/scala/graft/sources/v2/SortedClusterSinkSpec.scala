package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.{SparkSpec, Tables}
import graft.ops.{AvroOcf, AvroSerDe}

class SortedClusterSinkSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("event_id", LongType), StructField("day", StringType),
    StructField("user_id", LongType), StructField("value", DoubleType)))

  test("declared distribution+ordering: adversarially shuffled input " +
      "lands exactly ONE sorted file per day") {
    val base = Files.createTempDirectory("sortsink").toString + "/t"
    val ev = Tables(spark, sfDir, "events")
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("user_id"), col("value").cast("double").as("value"))
      .repartition(8, pmod(xxhash64(col("event_id")), lit(8)))
    ev.write.format("graft.sources.v2.SortedClusterSink")
      .option("path", base).option("clusterCol", "day")
      .option("sortCol", "event_id").mode("append").save()
    val files = new java.io.File(base).listFiles()
      .filterNot(_.getName.endsWith(".crc"))
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".avro")),
      files.map(_.getName).mkString(","))
    // clustered distribution ⇒ every day hashes to exactly one task ⇒
    // exactly one file per day
    val days = ev.select("day").distinct().as[String].collect()
    assert(files.length == days.length,
      s"${files.length} files for ${days.length} days")
    // each file individually: one day only, event_id strictly sorted
    val avroJson = AvroSerDe.avroSchemaFor("SortedRecord", sch)
    files.foreach { f =>
      val tmp = Files.createTempDirectory("one").toString
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(tmp, f.getName))
      val rows = AvroOcf.read(spark, tmp, avroJson, sch)
        .select("event_id", "day").as[(Long, String)].collect()
      assert(rows.map(_._2).distinct.length == 1, s"${f.getName} mixes days")
      assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq,
        s"${f.getName} not sorted")
    }
    // round trip: content identical to the input
    val got = AvroOcf.read(spark, base, avroJson, sch)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == ev.as[(Long, String, Long, Double)].collect().toSet)
  }

  test("the writer enforces the contract: out-of-order rows are " +
      "rejected, resumed clusters are rejected") {
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val avroJson = AvroSerDe.avroSchemaFor("SortedRecord", sch)
    def row(id: Long, day: String): InternalRow =
      InternalRow(id, UTF8String.fromString(day), 1L, 0.0)
    def freshWriter() = {
      val dir = Files.createTempDirectory("wenforce").toString
      new SortedClusterWriter(sch, avroJson, dir, "day", "event_id",
        conf, 0)
    }
    val w1 = freshWriter()
    w1.write(row(1, "a")); w1.write(row(2, "a"))
    intercept[IllegalArgumentException] { w1.write(row(1, "a")) }
    val w2 = freshWriter()
    w2.write(row(1, "a")); w2.write(row(5, "b"))
    intercept[IllegalArgumentException] { w2.write(row(9, "a")) }
  }
}
