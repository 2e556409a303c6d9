package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * All queries read through here so scans stay uniform: vectorized Parquet
  * reads, UTC session timezone (oracle parity — the DuckDB oracle treats
  * timestamps as naive/UTC). Column pruning + predicate pushdown reach the
  * scan because every query projects/filters declaratively on the result.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Defensive: Bench/Verify set this too, but query results must not
    // depend on who built the session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects natively;
    // read nanos as long and truncate to micros (identical to DuckDB's
    // ns->us handling). Integer `div` — a double division would lose
    // precision at 1.7e18 ns epochs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df
    }
  }
}
