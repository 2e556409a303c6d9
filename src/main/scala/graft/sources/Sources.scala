package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Source operators (SURVEY §2.1): range discovery (S2), day-window
  * incremental scan (S3) with checkpoint skip (D3) and rate limiting (D5),
  * and JDBC import (S7).
  *
  * The REST fetch itself (S1/S4) is injected as `fetchDay` — a function
  * producing the day's DataFrame (driver-side HTTP + createDataFrame for
  * small slices; a DataSourceV2 with one InputPartition per day-window at
  * scale). Everything around it — discovery, windowing, skip, pacing — is
  * engine code and is what the reference hand-rolls
  * (fetch_data_energinet.py:104-186).
  */
object Sources {
  /** S2: min/max range discovery over a source column (the reference's two
    * limit=1 probes sorted ASC/DESC, fetch_data_energinet.py:104-135), with
    * the same env-style overrides: explicit bounds win when given. */
  def discoverRange(df: DataFrame, colName: String,
      fromOverride: Option[String] = None,
      toOverride: Option[String] = None): (String, String) = {
    lazy val row = df.agg(min(col(colName)).cast("string"),
      max(col(colName)).cast("string")).head
    val lo = fromOverride.getOrElse(row.getString(0))
    val hi = toOverride.getOrElse(row.getString(1))
    require(lo <= hi, s"inverted range: $lo > $hi") // guard, :127-128
    (lo, hi)
  }

  /** S3: the day-window list for [from, to] as a DataFrame (metadata-sized
    * at any scale: one row per day). */
  def dayWindows(spark: SparkSession, from: String, to: String): DataFrame =
    spark.range(1).select(explode(sequence(
        to_date(lit(from)), to_date(lit(to)), expr("interval 1 day"))).as("d"))
      .select(col("d").cast("string").as("day"))

  /** S3+D3+D5: incremental daily ingest — iterate pending day windows
    * (already-processed days skipped via anti-join, the reference's Redis
    * day checkpoint), fetch each day's slice, union the plans. The day
    * list is collected (it is metadata — one string per day); the per-day
    * data itself never touches the driver.
    *
    * `minSecondsPerWindow` is the reference's rate limiter
    * (fetch_data_energinet.py:156-158): sleep so each fetch call takes at
    * least that long — pass 0 for batch replays.
    */
  def incrementalIngest(spark: SparkSession, from: String, to: String,
      processedLog: DataFrame, fetchDay: String => DataFrame,
      minSecondsPerWindow: Double = 0.0): DataFrame = {
    val pending = Dedup.checkpointFilter(
        dayWindows(spark, from, to), processedLog, Seq("day"))
      .orderBy("day")
      .collect().map(_.getString(0))
    val parts = pending.map { day =>
      val t0 = System.nanoTime()
      val df = fetchDay(day)
      val elapsed = (System.nanoTime() - t0) / 1e9
      if (elapsed < minSecondsPerWindow)
        Thread.sleep(((minSecondsPerWindow - elapsed) * 1000).toLong)
      df
    }
    if (parts.isEmpty) spark.emptyDataFrame
    else parts.reduce(_ unionByName _)
  }

  /** S7: JDBC table import (the Sqoop leg). `partitionColumn` bounds enable
    * parallel range-partitioned reads — the 100 TB posture for RDBMS
    * import; unpartitioned reads are single-task. */
  def jdbcTable(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val withProps = props.foldLeft(base) { case (b, (k, v)) => b.option(k, v) }
    val withPart = partitionColumn match {
      case Some((c, lo, hi, n)) => withProps
        .option("partitionColumn", c).option("lowerBound", lo)
        .option("upperBound", hi).option("numPartitions", n)
      case None => withProps
    }
    withPart.load()
  }

  /** S5 (shape only — no Kafka broker in this container): the reader plan
    * for a Kafka topic; the returned stream carries the standard
    * key/value/topic/partition/offset/timestamp columns that
    * AvroSerDe.decode consumes. */
  def kafkaStream(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
}
