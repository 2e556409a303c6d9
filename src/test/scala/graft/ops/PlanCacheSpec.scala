package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class PlanCacheSpec extends SparkSpec {

  private def agg(flag: String) = Tables(spark, sfDir, "lineitem")
    .filter(col("l_returnflag") === flag)
    .groupBy("l_linestatus").agg(count(lit(1)).as("n"))

  test("same logical plan fingerprints identically across rebuilds " +
      "and aliases") {
    val a = PlanCache.fingerprint(agg("F"))
    val b = PlanCache.fingerprint(agg("F"))          // fresh exprIds
    val c = PlanCache.fingerprint(agg("F").as("x"))  // alias only
    assert(a == b && a == c)
    assert(PlanCache.fingerprint(agg("O")) != a) // literal differs
  }

  test("salt separates snapshots of the same plan") {
    val a = PlanCache.fingerprint(agg("F"), salt = "v1")
    val b = PlanCache.fingerprint(agg("F"), salt = "v2")
    assert(a != b)
  }

  test("second call serves the materialization without rewriting") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_plancache").toString
    val first = PlanCache.cached(agg("F"), dir).collect().toSet
    val entry = new java.io.File(dir).listFiles()(0)
    val stamp = new java.io.File(entry, "_SUCCESS").lastModified()
    Thread.sleep(20)
    val second = PlanCache.cached(agg("F"), dir).collect().toSet
    assert(second == first)
    assert(new java.io.File(entry, "_SUCCESS").lastModified() == stamp)
    assert(new java.io.File(dir).listFiles().length == 1)
    // direct computation agrees with the cached bytes
    assert(agg("F").collect().toSet == first)
  }
}
