package graft.sources.v2

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DayWindowSourceSpec extends SparkSpec {
  import spark.implicits._

  private def read(from: String, to: String) =
    spark.read.format("graft.sources.v2.DayWindowSource")
      .option("from", from).option("to", to).load()

  test("one input partition per day-window, inclusive bounds") {
    val df = read("2024-01-01", "2024-01-05")
    assert(df.rdd.getNumPartitions == 5)
    // 24 hours x 3 municipalities x 2 branches per day
    assert(df.count() == 5L * 24 * 3 * 2)
    val days = df.select(substring(col("HourUTC"), 1, 10)).distinct()
      .as[String].collect().sorted
    assert(days.toSeq == Seq("2024-01-01", "2024-01-02", "2024-01-03",
      "2024-01-04", "2024-01-05"))
  }

  test("column pruning is pushed into the reader") {
    val df = read("2024-01-01", "2024-01-02").select("ConsumptionkWh")
    assert(df.schema.fieldNames.toSeq == Seq("ConsumptionkWh"))
    assert(df.count() == 2L * 24 * 3 * 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("DayWindowScan"), s"plan: $plan")
    assert(plan.contains("ReadSchema: struct<ConsumptionkWh:float>") ||
      !plan.contains("HourUTC"), s"pruning missing in: $plan")
  }

  test("S3/D3 streaming: self-checkpointing resume ingests only new days") {
    val outDir = java.nio.file.Files.createTempDirectory("dw-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("dw-ck").toString
    def run(to: String): Unit = {
      val stream = spark.readStream.format("graft.sources.v2.DayWindowSource")
        .option("from", "2024-01-01").option("to", to).load()
      val q = stream.writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir).start()
      q.processAllAvailable(); q.stop()
    }
    run("2024-01-03")
    assert(spark.read.parquet(outDir).count() == 3L * 144)
    // Restart with an extended range, same checkpoint: only days 4-5 land.
    run("2024-01-05")
    val df = spark.read.parquet(outDir)
    assert(df.count() == 5L * 144)
    assert(df.select(substring(col("HourUTC"), 1, 10)).distinct().count() == 5)
  }

  test("deterministic across reads and composes with engine ops") {
    val a = read("2024-01-03", "2024-01-03").collect().toSet
    val b = read("2024-01-03", "2024-01-03").collect().toSet
    assert(a == b && a.nonEmpty)
    // feeds the contract pipeline: enforce + widen
    val widened = graft.schemas.Contracts.widenFloats(
      read("2024-01-03", "2024-01-03"))
    assert(widened.schema("ConsumptionkWh").dataType ==
      org.apache.spark.sql.types.DoubleType)
  }
}
