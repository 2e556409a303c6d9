package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val dbLoc = System.getProperty("java.io.tmpdir") + "/graft_wh_test_db"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_wh_test LOCATION '$dbLoc'")
    // the managed location outlives the in-memory catalog across JVMs
    spark.sql("DROP TABLE IF EXISTS graft_wh_test.t1")
    val loc = new org.apache.hadoop.fs.Path(s"$dbLoc/t1")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    val df = Seq((1L, 10.0, "a"), (2L, 20.0, "a"),
      (3L, 30.0, "b"), (4L, 40.0, "b")).toDF("id", "v", "p")
    Warehouse.publish(df, "graft_wh_test.t1", Seq("p"))
    "graft_wh_test.t1"
  }

  test("dynamic partition overwrite replaces only the incoming partition") {
    val tbl = freshTable()
    Warehouse.overwritePartitions(Seq((9L, 99.0, "b")).toDF("id", "v", "p"), tbl)
    val out = spark.table(tbl).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    // partition a untouched; partition b fully replaced by the one new row
    assert(out == Seq((1L, 10.0, "a"), (2L, 20.0, "a"), (9L, 99.0, "b")))
  }

  test("catalog read-back partition-prunes on the partition column") {
    val tbl = freshTable()
    val df = spark.table(tbl).filter(col("p") === "a")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val plan = df.queryExecution.executedPlan.toString
    // pruning happens at the partition level (directory skip), not as a
    // row-level pushed filter
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("= a)"), plan)
  }
}
