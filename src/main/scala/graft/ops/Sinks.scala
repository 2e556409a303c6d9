package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch sink operators (K2/K3 batch legs + the partition-pruning posture:
  * the reference's per-day checkpoint skip becomes partition pruning once
  * tables are day-partitioned, SURVEY §4). */
object Sinks {
  /** Write a table partitioned by event-time day. Readers filtering on
    * `day` prune partitions at planning time — the 100 TB analogue of the
    * reference's "skip processed days" (D3): a day once landed is one
    * directory, never rescanned unless asked for. */
  def writeDayPartitioned(df: DataFrame, tsCol: String, path: String,
      mode: String = "overwrite"): Unit =
    df.withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.partitionBy("day").mode(mode).parquet(path)

  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("day") === day)

  /** Bucketed table write: co-locates rows by join key at write time so
    * repeated fact-fact joins on that key run with NO exchange — the
    * pre-shuffle trade that pays for itself after one join at 100 TB.
    * Both sides must use the same bucket count. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // A previous session (fresh in-memory catalog) may have left the managed
    // location behind with no catalog entry; CREATE refuses to reuse it.
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.bucketBy(buckets, key).sortBy(key)
      .format("parquet").mode("overwrite").saveAsTable(table)
  }
}
