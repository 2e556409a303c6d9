package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class XxHashOracleSpec extends SparkSpec {

  test("familySeed replicates Spark's xxhash64 over an int, every family") {
    // The DuckDB oracle's family constants are computed by this Scala
    // formula; if it drifts from Spark's XxHash64 the MinHash oracle would
    // report a confusing signature mismatch — pin it here at the source.
    import spark.implicits._
    val sparkSide = (0 until 64).toDF("i")
      .select(col("i"), xxhash64(col("i")).as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (i <- 0 until 64) {
      val u = XxHashOracle.familySeed(i)
      val signed =
        if (u >= (BigInt(1) << 63)) (u - (BigInt(1) << 64)).toLong else u.toLong
      assert(signed == sparkSide(i), s"family $i")
    }
  }

  test("hashLongConst replicates Spark's xxhash64 over a long") {
    // q380's per-step XOR constants xxhash64(lit(t)) are folded to
    // literals by this formula; pin it against Spark at the source.
    import spark.implicits._
    val inputs = Seq(0L, 1L, 2L, 3L, 42L, -1L, Long.MaxValue, Long.MinValue,
      1234567890123L)
    val sparkSide = inputs.toDF("l")
      .select(col("l"), xxhash64(col("l")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (l <- inputs) {
      val u = XxHashOracle.hashLongConst(BigInt(l), BigInt(42))
      val signed =
        if (u >= (BigInt(1) << 63)) (u - (BigInt(1) << 64)).toLong else u.toLong
      assert(signed == sparkSide(l), s"long $l")
    }
  }

  test("generated oracle SQL embeds per-parameter structure") {
    val sql = XxHashOracle.minhashSql(n = 3, bands = 16, rowsPerBand = 4,
      tau = 0.5)
    assert(sql.contains("range(16)") && sql.contains(">= 0.5"), sql.take(200))
    val sql2 = XxHashOracle.minhashSql(n = 2, bands = 8, rowsPerBand = 2,
      tau = 0.25)
    assert(sql2.contains("range(8)") && sql2.contains(">= 0.25"))
    assert(sql2.contains("tk[i] || ' ' || tk[i+1]"))
  }
}
