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

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetRowsPerFile`-row files, then atomically swap directories.
    * The operational companion to every streaming file sink here: a
    * micro-batch sink lands one file per trigger per partition, and a year
    * of 1-minute triggers is half a million files whose footer reads —
    * driver-side at planning — come to dominate scan startup. Compaction
    * restores the scan-friendly layout without changing contents.
    *
    * The file count comes from an exact row count (one cheap
    * count-from-statistics pass) and the rewrite is `repartition(n)` —
    * round-robin, no shuffle key needed, every output file near target
    * size. The swap is rename-based: new tree staged beside the live one,
    * live renamed aside, staged renamed in, old tree deleted — readers see
    * the old tree or the new tree, never a mix; a crash before the second
    * rename leaves the old tree recoverable under `.compact-old`.
    *
    * At 100 TB with a partitioned layout, run this per partition (day) —
    * each directory swap is then independent and bounded. */
  def compact(spark: SparkSession, dir: String,
      targetRowsPerFile: Long): Unit = {
    val src = spark.read.parquet(dir)
    val rows = src.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new org.apache.hadoop.fs.Path(dirPath.getParent,
      s".compact-staged-${dirPath.getName}")
    val old = new org.apache.hadoop.fs.Path(dirPath.getParent,
      s".compact-old-${dirPath.getName}")
    fs.delete(staged, true); fs.delete(old, true)
    src.repartition(nFiles).write.parquet(staged.toString)
    if (!fs.rename(dirPath, old))
      sys.error(s"compact: cannot move live $dirPath aside")
    if (!fs.rename(staged, dirPath)) {
      fs.rename(old, dirPath) // restore; staged tree is left for inspection
      sys.error(s"compact: cannot publish staged tree for $dirPath")
    }
    fs.delete(old, true): Unit
  }
}
