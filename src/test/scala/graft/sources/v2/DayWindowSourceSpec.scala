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

  test("S2 agg pushdown: ungrouped count/min/max answered from metadata, no HashAggregate") {
    val df = read("2024-01-01", "2024-01-09")
      .agg(count(lit(1)).as("n"), min("HourUTC").as("lo"), max("HourUTC").as("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("DayWindowAggScan"), s"pushdown missing: $plan")
    assert(!plan.contains("HashAggregate"), s"agg not fully pushed: $plan")
    val row = df.as[(Long, String, String)].collect().head
    assert(row == ((9L * 144, "2024-01-01T00:00", "2024-01-09T23:00")))
  }

  test("S2 agg pushdown declines sums and grouped aggregates (exact fallback)") {
    val sums = read("2024-01-01", "2024-01-02")
      .agg(sum(col("ConsumptionkWh").cast("double")).as("s"))
    assert(sums.queryExecution.executedPlan.toString.contains("HashAggregate"))
    val expected = read("2024-01-01", "2024-01-02")
      .select(col("ConsumptionkWh").cast("double")).as[Double].collect().sum
    assert(math.abs(sums.as[Double].collect().head - expected) < 1e-6)

    val grouped = read("2024-01-01", "2024-01-02")
      .groupBy("Branche").agg(count(lit(1)).as("n"))
    assert(grouped.queryExecution.executedPlan.toString.contains("HashAggregate"))
    assert(grouped.as[(String, Long)].collect().toMap ==
      Map("Erhverv" -> 144L, "Privat" -> 144L))
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

  test("HourUTC range filters prune whole day partitions") {
    val base = read("2024-01-01", "2024-01-10")
    val filtered = base.filter(col("HourUTC") >= "2024-01-04T00:00" &&
      col("HourUTC") < "2024-01-06T00:00")
    // 10 days narrowed to 3 partitions (days 04..06 — lower bound exact,
    // upper bound conservative to the day granularity).
    assert(filtered.rdd.getNumPartitions == 3,
      s"got ${filtered.rdd.getNumPartitions} partitions")
    // Residual filters still applied exactly: only days 04 and 05 rows.
    val days = filtered.select(substring(col("HourUTC"), 1, 10)).distinct()
      .as[String].collect().sorted
    assert(days.toSeq == Seq("2024-01-04", "2024-01-05"))
    assert(filtered.count() == 2L * 144)
  }

  test("daysPerTrigger paces the stream one day per micro-batch (D5)") {
    val outDir = java.nio.file.Files.createTempDirectory("dw-pace-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("dw-pace-ck").toString
    val stream = spark.readStream.format("graft.sources.v2.DayWindowSource")
      .option("from", "2024-01-01").option("to", "2024-01-03")
      .option("daysPerTrigger", "1").load()
    val q = stream.writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir).start()
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(outDir).count() == 3L * 144)
    assert(q.recentProgress.count(_.numInputRows > 0) == 3,
      "each day should land in its own micro-batch")
  }

  test("runtime filtering prunes day partitions through a join") {
    import scala.jdk.CollectionConverters._
    DayWindowReader.recordFetches = true
    DayWindowReader.fetchedDays.clear()
    val fact = read("2024-01-01", "2024-01-07")
    // the dim must be a real (file-backed) relation with its own filter —
    // a literal LocalRelation never qualifies as a DPP filtering side
    Seq("2024-01-02T05:00", "2024-01-05T17:00", "zzz-no-match")
      .toDF("hour").write.mode("overwrite").parquet("/tmp/graft_rf_dim")
    val dim = spark.read.parquet("/tmp/graft_rf_dim")
      .filter(col("hour") < "9")
    val out = fact.join(broadcast(dim), col("HourUTC") === col("hour"))
    assert(out.count() == 2L * 3 * 2) // 2 hours x 3 muni x 2 branches
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression"), p)
    val fetched = DayWindowReader.fetchedDays.asScala.toSet
    assert(fetched == Set("2024-01-02", "2024-01-05"),
      s"runtime filter did not prune; fetched: $fetched")
  }

  test("plain row scan still fetches every day (no over-pruning)") {
    import scala.jdk.CollectionConverters._
    DayWindowReader.recordFetches = true
    DayWindowReader.fetchedDays.clear()
    val df = read("2024-01-01", "2024-01-03")
    // collect() forces the row path (a bare count() is answered by the
    // pushed aggregate from metadata — zero fetches, by design)
    assert(df.collect().length == 3 * 24 * 3 * 2)
    assert(DayWindowReader.fetchedDays.asScala.toSet ==
      Set("2024-01-01", "2024-01-02", "2024-01-03"))
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
