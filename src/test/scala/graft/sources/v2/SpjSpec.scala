package graft.sources.v2

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Storage-partitioned join (q203): the KeyGroupedPartitioning contract —
  * correctness vs the plain shuffled join, the zero-exchange plan pin,
  * and the footer-only count path. */
class SpjSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base: String = {
    val dir = "/tmp/graft_spj_spec"
    Spj.writeKeyed(Tables(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal")),
      s"$dir/cust", "c_nationkey")
    Spj.writeKeyed(Tables(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal")),
      s"$dir/supp", "s_nationkey")
    dir
  }

  test("SPJ join matches the plain shuffled join bit for bit") {
    val got = Spj.spjJoin(spark, base).orderBy("nationkey").collect()
    val exp = Tables(spark, sfDir, "customer")
      .join(Tables(spark, sfDir, "supplier"),
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(graft.ops.Exact.dec(col("c_acctbal")) +
          graft.ops.Exact.dec(col("s_acctbal"))).cast("double").as("bal"))
      .orderBy("nationkey").collect()
    assert(got.toSeq == exp.toSeq)
  }

  test("join + same-key aggregate plan with ZERO exchanges") {
    val df = Spj.spjJoin(spark, base)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(p.contains("SortMergeJoin"), p)
  }

  test("keyed scan round-trips rows and injects the partition key") {
    val got = Spj.readKeyed(spark, s"$base/cust", Spj.custSchema, "c_nationkey")
    val exp = Tables(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    assert(got.count() == exp.count())
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }

  test("key-only projection is answered from parquet footers") {
    val got = Spj.readKeyed(spark, s"$base/cust", Spj.custSchema, "c_nationkey")
      .groupBy("c_nationkey").count()
    val exp = Tables(spark, sfDir, "customer").groupBy("c_nationkey").count()
    assert(got.collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq ==
      exp.collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq)
  }

  test("missing schema or bad key column fail with a clear message") {
    val e1 = intercept[IllegalArgumentException] {
      spark.read.format(classOf[KeyedPartitionSource].getName)
        .option("path", s"$base/cust").option("keyCol", "c_nationkey")
        .load()
    }
    assert(e1.getMessage.contains("schema"))
    val e2 = intercept[IllegalArgumentException] {
      Spj.readKeyed(spark, s"$base/cust", Spj.custSchema, "nope")
    }
    assert(e2.getMessage.contains("partition column"))
  }
}
