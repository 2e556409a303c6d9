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
    * result is never auto-broadcast — correct for BSP loop state.
    *
    * r13 OPT negative (measured, do not re-try): rebuilding with the
    * executed plan's outputPartitioning/outputOrdering preserved (what
    * `LogicalRDD.fromDataset` does) to skip the next round's Exchange.
    * A synthetic pointer-jump probe won −15%/round, but the real BSP
    * family A/B (12 queries, 2 cold legs/side, interleaved, sf0.1,
    * `BENCH_R13OPT_matpart_{before,after}_{a,b}.json`) measured total
    * wall +2.1% with the after legs in QUIETER windows, and two real
    * CPU regressions: q316 +41%, q88 +62%. Two causes: (a) the loops
    * re-key between rounds (stars CC: (src,dst)-distinct → groupBy(src)
    * → canon re-exprs), so the preserved placement almost never
    * satisfies the next requirement; (b) where it does fire it is
    * harmful — `withLoopShuffle` sizes loop state to 1-4 partitions, and
    * a preserved HashPartitioning carries that loop-sized numPartitions
    * OUT of the loop, so EnsureRequirements co-partitions the downstream
    * corpus-sized join side down to 1-4 tasks instead of re-exchanging
    * at session width (q316/q88's label join). Unknown partitioning on
    * materialized loop state is load-bearing, not an accident. */
  def materializeTruncated(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count()
    spark.internalCreateDataFrame(rdd, ds.schema, isStreaming = false)
  }

  /** [[materializeTruncated]] plus (row count, exact Σ of one LONG
    * column) computed IN the materializing job: the BSP loops here use
    * (count, sum) as their convergence checksum, and paying a separate
    * aggregate job per round doubles the per-round fixed cost (the q372
    * SCC runs ~70 rounds). `sumCol` is an ordinal into the schema; pass
    * -1 to skip the sum (count-only). The sum is exact — per-partition
    * long chunks spill into a BigInteger well before overflow. */
  def materializeTruncatedSummed(df: DataFrame, sumCol: Int):
      (DataFrame, Long, java.math.BigDecimal) = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val parts = rdd.mapPartitions { it =>
      var n = 0L
      var chunk = 0L
      var big = java.math.BigInteger.ZERO
      while (it.hasNext) {
        val row = it.next()
        n += 1
        if (sumCol >= 0 && !row.isNullAt(sumCol)) {
          val v = row.getLong(sumCol)
          val nc = chunk + v
          // two's-complement overflow test: same-sign operands, result
          // sign flipped. Values span the FULL long range (xxhash
          // checksums), so a threshold check is not enough — the add
          // itself can wrap mod 2^64 and silently corrupt the checksum
          // (observed: convergence never detected, loops ran to
          // maxIters). On overflow, bank the chunk and restart from v.
          if (((chunk ^ nc) & (v ^ nc)) < 0) {
            big = big.add(java.math.BigInteger.valueOf(chunk)); chunk = v
          } else chunk = nc
        }
      }
      Iterator.single((n, big.add(java.math.BigInteger.valueOf(chunk))))
    }.collect()
    val n = parts.map(_._1).sum
    val s = parts.foldLeft(java.math.BigInteger.ZERO)((a, p) => a.add(p._2))
    (spark.internalCreateDataFrame(rdd, ds.schema, isStreaming = false),
      n, new java.math.BigDecimal(s))
  }

  /** The `EXPLAIN <mode>` text of `df`'s plan as a string (the Dataset
    * API only prints it) — used by [[graft.PlanDump]] to commit the
    * plan-shape evidence the optimization rounds are judged against. */
  def explainString(df: DataFrame, mode: String): String =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(mode))

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

  /** The session's `autoBroadcastJoinThreshold` in bytes, via SQLConf's
    * own typed accessor — which, unlike re-parsing the string value,
    * accepts both size strings ("10MB") and the documented plain `-1`
    * that disables auto-broadcast. */
  def autoBroadcastThreshold(spark: SparkSession): Long =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.conf.autoBroadcastJoinThreshold
}
