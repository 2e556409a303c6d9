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

  private def dropBucketTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete()
    }
    if (loc.exists()) rm(loc)
  }

  test("bucketed tables join without an exchange (co-located join)") {
    dropBucketTable("orders_bkt"); dropBucketTable("cust_bkt")
    val ev = Tables(spark, sfDir, "orders")
    Sinks.writeBucketed(ev, "orders_bkt", "o_custkey", 8)
    Sinks.writeBucketed(Tables(spark, sfDir, "customer")
      .withColumnRenamed("c_custkey", "o_custkey"), "cust_bkt", "o_custkey", 8)
    // Force the shuffle-join path — otherwise broadcast makes this vacuous.
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_bkt")
        .join(spark.table("cust_bkt"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // correctness unchanged vs unbucketed join
      val expected = Tables(spark, sfDir, "orders").join(
        Tables(spark, sfDir, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey").count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
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

  test("AQE splits a skewed sort-merge join at runtime (skew=true)") {
    import spark.implicits._
    // 90% of left rows share one key — the shape AQE's skew-join rule
    // exists for. Thresholds forced low so the ~KB test partitions
    // qualify as "skewed"; at production scale the defaults fire on the
    // same plan. ops.Skew's salting remains for the cases AQE cannot
    // rewrite (aggregations, custom execs).
    val left = (0 until 20000)
      .map(i => (if (i % 10 != 0) 7L else i.toLong, i.toLong)).toDF("k", "v")
    val right = (0L until 100L).map(k => (k, k * 2)).toDF("k", "w")
    val prior = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
    try {
      val joined = left.join(right, "k")
      // collect() (not count()) so THIS plan executes and AQE finalizes it;
      // 18000 hot-key rows + the 10 cold keys < 100 that match the right.
      assert(joined.collect().length == 18010)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join rewrite in:\n$plan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("compact collapses a fragmented sink dir, preserving contents") {
    val base = Files.createTempDirectory("compact").toString + "/t"
    val ev = Tables(spark, sfDir, "events").select("event_id", "user_id")
    ev.repartition(40).write.parquet(base)
    def dataFiles() = new java.io.File(base).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val before = dataFiles()
    assert(before >= 40, s"fragmented landing expected, got $before files")
    val expected = ev.orderBy("event_id", "user_id").collect().toSeq
    Sinks.compact(spark, base, targetRowsPerFile = 500L)
    val after = dataFiles()
    val rows = ev.count()
    val wantFiles = ((rows + 499) / 500).toInt
    assert(after == wantFiles, s"expected $wantFiles files after compact, got $after")
    val got = spark.read.parquet(base)
      .orderBy("event_id", "user_id").collect().toSeq
    assert(got == expected, "compaction must not change contents")
    // No staging/backup residue left beside the live tree.
    val residue = new java.io.File(base).getParentFile.listFiles()
      .map(_.getName).filter(_.startsWith(".compact-"))
    assert(residue.isEmpty, residue.mkString(","))
  }
}
