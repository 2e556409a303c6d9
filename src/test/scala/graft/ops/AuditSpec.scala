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

  test("streaming: observed gate metrics ride micro-batch progress") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("auditstream").toString
    val ck = java.nio.file.Files.createTempDirectory("auditck").toString
    Seq((1L, "en"), (2L, "de"), (3L, "en"), (4L, "fr"))
      .toDF("id", "lang").coalesce(1).write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema("id LONG, lang STRING").parquet(src)
      .observe("gate", count(lit(1)).as("in_rows"),
        count(when(col("lang") === "en", lit(1))).as("kept_rows"))
      .filter(col("lang") === "en")
    val sink = s"audit_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = stream.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ck).outputMode("append").start()
    q.processAllAvailable()
    val observed = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("gate"))).lastOption
    q.stop()
    assert(spark.table(sink).count() == 2)
    // The same no-extra-pass counters, delivered per micro-batch: the
    // production monitoring channel for streaming curation gates.
    assert(observed.isDefined, "no observed metrics in progress")
    assert(observed.get.getAs[Long]("in_rows") == 4L &&
      observed.get.getAs[Long]("kept_rows") == 2L, observed.toString)
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
