package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation in plain Scala (BigInt arithmetic). */
  private def ref(s: String): Long = {
    val M = BigInt(RollingHash.M)
    s.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) =>
      (h * 257 + (b & 0xFF)) mod M).toLong
  }

  test("codegen and interpreted paths match the BigInt reference") {
    val samples = Seq("", "a", "abc", "the quick brown fox",
      "über-ünïcödé 中文", "x" * 10000)
    val got = samples.toDF("t")
      .select(RollingHash.rollingHash(col("t")).as("h")).as[Long].collect()
    assert(got.toSeq == samples.map(ref))
    // interpreted eval
    val e = RollingHash(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"),
      org.apache.spark.sql.types.StringType))
    assert(e.eval(null) == ref("abc"))
  }

  test("distinct documents get distinct fingerprints (collision smoke)") {
    val docs = Tables(spark, sfDir, "documents")
    val n = docs.count()
    val nd = docs.select(RollingHash.rollingHash(col("text")).as("h"))
      .distinct().count()
    assert(n == nd)
  }
}
