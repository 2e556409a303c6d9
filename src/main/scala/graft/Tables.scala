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
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Normalizes the `ts` column to session-timezone TIMESTAMP regardless
    * of how the parquet writer declared it: TIMESTAMP(NANOS) arrives as
    * a nanos LONG under `nanosAsLong` (truncate to micros — the same
    * ns->us handling DuckDB applies), TIMESTAMP(MICROS) without
    * isAdjustedToUTC arrives as TIMESTAMP_NTZ (reinterpret as UTC — the
    * session timezone, so the instant is unchanged and `unix_micros` /
    * watermarks / windows resolve). Streaming readers share this so the
    * batch and stream views of the same file agree. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(f) if f.dataType == TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
