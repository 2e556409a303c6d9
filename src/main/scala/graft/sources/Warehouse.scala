package graft.sources

import org.apache.spark.sql.DataFrame

/** Catalog-managed warehouse leg — the governed-table view of the
  * reference's HDFS sink output (day-landed files under /topics/<topic>,
  * cluster/configuration.json:4-15, consumed ad hoc by the interactive
  * PySpark container): `CREATE TABLE ... USING parquet PARTITIONED BY`
  * via saveAsTable, dynamic-partition `INSERT OVERWRITE`, and catalog
  * reads that partition-prune (pinned in CatalogSpec).
  *
  * Scale notes: a partitioned catalog table IS the 100 TB layout — the
  * partition column becomes the directory tree, queries that filter on it
  * scan only matching partitions (PartitionFilters, not PushedFilters),
  * and dynamic overwrite rewrites exactly the partitions present in the
  * incoming batch (an idempotent day-reload touches one day's files, not
  * the table).
  */
object Warehouse {

  /** Publish as a managed partitioned parquet table (replaces the table
    * if it exists). Partition columns must be last in `df`'s column order
    * (Spark moves them last in the table schema; keeping the input in
    * that order makes position-based insertInto composable). */
  def publish(df: DataFrame, table: String, partCols: Seq[String]): Unit =
    df.write.format("parquet").partitionBy(partCols: _*)
      .mode("overwrite").saveAsTable(table)

  /** Dynamic-partition INSERT OVERWRITE: replaces ONLY the partitions
    * present in `df`, leaving every other partition's files untouched —
    * the day-reload primitive. `df` columns must match the table schema
    * positionally (partition columns last). */
  def overwritePartitions(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try df.write.mode("overwrite").insertInto(table)
    finally spark.conf.set(key, prior)
  }
}
