package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql] Dataset.ofRows` — the standard technique Spark
  * extension libraries use to materialize a DataFrame from a custom logical
  * plan node (the public Dataset API has no entry point for injected plans).
  * Kept to this single call on purpose. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Eager materialization that TRUNCATES both RDD lineage and plan
    * statistics — the iterative-algorithm alternative to
    * `Dataset.localCheckpoint`. The Dataset version rewrites the origin
    * plan's Statistics into the new LogicalRDD; under an iterated
    * SELF-join (e.g. pointer jumping) the estimated sizeInBytes SQUARES
    * every round, so by round ~15 the stats BigInt has megabits and
    * every downstream stats visit burns CPU in BigInteger multiplies
    * (observed: per-round wall time tripling at a few hundred rows,
    * 100% of samples in SizeInBytesOnlyStatsPlanVisitor →
    * BigInteger.multiplyToomCook3). Rebuilding from the raw RDD gives
    * the LogicalRDD default statistics instead, which also means the
    * result is never auto-broadcast — correct for BSP loop state. */
  def materializeTruncated(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count()
    spark.internalCreateDataFrame(rdd, ds.schema, isStreaming = false)
  }

  /** Release the BlockManager blocks pinned by [[materializeTruncated]]
    * for `df` (no-op on any other DataFrame — `Dataset.unpersist` does
    * NOT reach these blocks, because the RDD persisted inside
    * `materializeTruncated` is never registered with the Dataset cache
    * manager). MUST only be called once every consumer of `df` —
    * including the NEXT round's `materializeTruncated`, whose `count()`
    * forces its own blocks — has executed: the localCheckpoint
    * truncated lineage, so a dropped block cannot be recomputed.
    * Without this, a many-round BSP loop (SCC: up to 25×~60 rounds)
    * pins every round's full edge relation for the session lifetime. */
  def unpersistMaterialized(df: DataFrame): Unit =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
