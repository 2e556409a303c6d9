package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The staged-intermediate cache ([[LlmQueries.staged]]) now feeds
  * fifteen-plus ORACLE-CHECKED queries, so its two contracts get their
  * own spec:
  *
  *   1. build-once: a second call with the same input serves the
  *      parquet copy without re-running the build;
  *   2. input-signed invalidation: a REGENERATED input (new bytes, new
  *      mtime — the driver rewrites /root/testdata between rounds while
  *      /tmp survives) must NOT be served the previous generation's
  *      relation. An unsigned path fails this silently and the failure
  *      surfaces only as a driver-gate hash mismatch.
  */
class StagedCacheSpec extends SparkSpec {

  private def writeInput(dir: java.io.File, rows: Seq[Long]): Unit = {
    import spark.implicits._
    val tmp = new java.io.File(dir, ".tmp_in")
    rows.toDF("v").coalesce(1).write.mode("overwrite")
      .parquet(tmp.toString)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(dir, "t.parquet")
    Files.deleteIfExists(dst.toPath)
    Files.move(part.toPath, dst.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp)
  }

  test("staged builds once, then serves the parquet copy") {
    val dir = Files.createTempDirectory("staged_spec").toFile
    writeInput(dir, Seq(1L, 2L, 3L))
    var builds = 0
    def get() = LlmQueries.staged(spark, dir.toString, "k", "t") {
      builds += 1
      spark.read.parquet(new java.io.File(dir, "t.parquet").toString)
        .select((col("v") * 10).as("w"))
    }
    assert(get().as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq == Seq(10L, 20L, 30L))
    assert(get().count() == 3)
    assert(builds == 1, "second call must serve the cache, not rebuild")
  }

  test("a regenerated input is never served the old generation's cache") {
    val dir = Files.createTempDirectory("staged_spec2").toFile
    writeInput(dir, Seq(1L, 2L, 3L))
    def get() = LlmQueries.staged(spark, dir.toString, "k", "t") {
      spark.read.parquet(new java.io.File(dir, "t.parquet").toString)
        .agg(sum("v").as("s"))
    }
    assert(get().collect()(0).getLong(0) == 6L)
    // Regenerate the input: different content AND ensure the mtime
    // moves even on coarse-grained filesystems.
    writeInput(dir, Seq(100L, 200L, 300L, 400L))
    val in = new java.io.File(dir, "t.parquet")
    in.setLastModified(in.lastModified() + 2000)
    assert(get().collect()(0).getLong(0) == 1000L,
      "signature must bust the cache when the input regenerates")
  }
}
