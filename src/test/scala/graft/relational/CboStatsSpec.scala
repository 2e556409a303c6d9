package graft.relational

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** ANALYZE TABLE + cost-based optimizer statistics — the engine-side
  * complement of the layout queries (q151/q191): table and column
  * stats land in the catalog, flow into logical-plan estimates, and
  * drive the broadcast decision without any size hint from the user.
  */
class CboStatsSpec extends SparkSpec {

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("analyze computes row counts and column NDVs the optimizer sees") {
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    try {
      Tables(spark, sfDir, "nation").write.saveAsTable("cbo_dim")
      spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS FOR ALL COLUMNS")
      withConfs("spark.sql.cbo.enabled" -> "true") {
        val plan = spark.table("cbo_dim").queryExecution.optimizedPlan
        val stats = plan.stats
        assert(stats.rowCount.contains(BigInt(25)), stats.toString)
        // column stats surfaced: nationkey NDV == 25
        val ndv = stats.attributeStats.collectFirst {
          case (a, s) if a.name == "n_nationkey" => s.distinctCount
        }.flatten
        assert(ndv.contains(BigInt(25)), stats.attributeStats.toString)
      }
    } finally spark.sql("DROP TABLE IF EXISTS cbo_dim")
  }

  test("catalog stats alone drive the broadcast decision") {
    spark.sql("DROP TABLE IF EXISTS cbo_dim2")
    try {
      Tables(spark, sfDir, "nation").write.saveAsTable("cbo_dim2")
      spark.sql("ANALYZE TABLE cbo_dim2 COMPUTE STATISTICS")
      withConfs("spark.sql.cbo.enabled" -> "true") {
        val joined = Tables(spark, sfDir, "customer")
          .join(spark.table("cbo_dim2"),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name").agg(count(lit(1)).as("n"))
        val p = joined.queryExecution.executedPlan.toString
        assert(p.contains("BroadcastHashJoin"), p)
        assert(!p.contains("SortMergeJoin"), p)
      }
    } finally spark.sql("DROP TABLE IF EXISTS cbo_dim2")
  }
}
