package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class SkewSinksSpec extends SparkSpec {
  import spark.implicits._

  test("salted count equals plain count on a skewed key") {
    // 90% of rows share one key — the classic hot-key shape.
    val df = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i.toLong))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedCount(df, Seq("k"), buckets = 8, saltFrom = Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join on a skewed key") {
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toLong))
      .toDF("key", "payload")
    val small = Seq((1L, "hot-dim"), (950L, "cold-dim")).toDF("key", "dim")
    val plain = big.join(small, "key").select("key", "payload", "dim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(big, small, "key", buckets = 8,
        bigSaltFrom = Seq("payload")).select("key", "payload", "dim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("day-partitioned sink enables partition pruning") {
    val path = Files.createTempDirectory("daypart").toString + "/events"
    val ev = Tables(spark, sfDir, "events")
    Sinks.writeDayPartitioned(ev, "ts", path)
    val one = Sinks.readDay(spark, path, "2024-01-05")
    // Correctness: only that day's rows.
    val expected = ev.filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05").count()
    assert(one.count() == expected && expected > 0)
    // Plan evidence: the filter became a partition filter at the scan.
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-05"),
      s"expected partition pruning in plan:\n$plan")
  }
}
