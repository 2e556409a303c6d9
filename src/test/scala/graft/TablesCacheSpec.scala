package graft

import java.nio.file.Files

/** [[Tables]] is the engine's catalog: repeated resolutions of the same
  * input file must serve the cached analyzed relation (a bare
  * `spark.read.parquet` re-lists the path and re-reads footers on every
  * call — a fixed per-invocation tax a metastore-backed catalog does not
  * charge), while a REGENERATED input must resolve fresh (new schema,
  * new listing) rather than serve the previous generation's plan. */
class TablesCacheSpec extends SparkSpec {

  test("repeated resolutions of an unchanged input serve the cached plan") {
    val a = Tables(spark, sfDir, "nation")
    val b = Tables(spark, sfDir, "nation")
    assert(a eq b, "same (session, path, signature) must be one relation")
    assert(b.count() == 25)
  }

  test("a regenerated input resolves fresh, not from the cache") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tables_cache").toFile
    def writeInput(rows: Seq[Long]): Unit = {
      val tmp = new java.io.File(dir, ".tmp_in")
      rows.toDF("v").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, "t.parquet")
      Files.deleteIfExists(dst.toPath)
      Files.move(part.toPath, dst.toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
    writeInput(Seq(1L, 2L, 3L))
    assert(Tables(spark, dir.toString, "t").count() == 3)
    writeInput(Seq(10L, 20L, 30L, 40L))
    val in = new java.io.File(dir, "t.parquet")
    in.setLastModified(in.lastModified() + 2000) // coarse-mtime-proof
    assert(Tables(spark, dir.toString, "t").count() == 4,
      "signature must bust the cache when the input regenerates")
  }
}
