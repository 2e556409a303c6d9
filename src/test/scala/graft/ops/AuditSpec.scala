package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class AuditSpec extends SparkSpec {

  test("trail counters match independent per-stage counts, one action") {
    val docs = Tables(spark, sfDir, "documents")
    val trail = new Audit.Trail
    val g1 = trail.gate(docs, "en", col("lang") === "en")
    val g2 = trail.gate(g1, "long", col("n_chars") >= 300)
    val finalCount = g2.count()
    val total = docs.count()
    val en = docs.filter(col("lang") === "en").count()
    val enLong = docs.filter(col("lang") === "en" && col("n_chars") >= 300).count()
    assert(trail.counters == Seq(("en", total, en), ("long", en, enLong)))
    assert(finalCount == enLong)
  }

  test("duplicate gate names are rejected") {
    val docs = Tables(spark, sfDir, "documents")
    val trail = new Audit.Trail
    trail.gate(docs, "g", col("lang") === "en")
    intercept[IllegalArgumentException] {
      trail.gate(docs, "g", col("lang") === "de")
    }
  }
}
