package graft.llm

import java.nio.file.Files

import scala.jdk.CollectionConverters._

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

  test("content tag busts the cache even at identical length + mtime") {
    // Same-length, same-mtime regeneration is the one case the
    // (length, mtime) pair cannot see; the CRC content tag must differ.
    val dir = Files.createTempDirectory("staged_spec3").toFile
    val f = new java.io.File(dir, "t.parquet")
    Files.write(f.toPath, Array.fill[Byte](1024)(1))
    val mtime = f.lastModified()
    val tag1 = LlmQueries.contentTag(f)
    Files.write(f.toPath, Array.fill[Byte](1024)(2))
    f.setLastModified(mtime)
    assert(f.length() == 1024 && f.lastModified() == mtime)
    assert(LlmQueries.contentTag(f) != tag1,
      "same-length same-mtime regeneration must change the content tag")
  }

  test("a rebuild sweeps the previous generation's signed dir") {
    val dir = Files.createTempDirectory("staged_spec4").toFile
    def get() = LlmQueries.staged(spark, dir.toString, "k", "t") {
      spark.read.parquet(new java.io.File(dir, "t.parquet").toString)
        .agg(sum("v").as("s"))
    }
    writeInput(dir, Seq(1L, 2L))
    get().collect()
    val cacheParent = new java.io.File(s"/tmp/graft_edges/${dir.getName}")
    def gens() = cacheParent.listFiles().filter(_.getName.startsWith("k-"))
    assert(gens().length == 1)
    val gen1 = gens().head.getName
    writeInput(dir, Seq(10L, 20L, 30L))
    val in = new java.io.File(dir, "t.parquet")
    in.setLastModified(in.lastModified() + 2000)
    assert(get().collect()(0).getLong(0) == 60L)
    assert(gens().length == 1 && gens().head.getName != gen1,
      "the stale generation must be deleted, not linger in /tmp")
  }

  test("a directory-shaped input is content-signed per contained file") {
    // A multi-file parquet table is a DIRECTORY: its own length/mtime do
    // not change when a file inside is rewritten in place, so the
    // signature must fold every contained file's (name, length, mtime)
    // — otherwise a regenerated directory input silently serves the
    // previous generation (the round-11 hardening gap).
    import spark.implicits._
    val dir = Files.createTempDirectory("staged_spec6").toFile
    val in = new java.io.File(dir, "t.parquet")
    def writeDirInput(rows: Seq[Long]): Unit =
      rows.toDF("v").coalesce(1).write.mode("overwrite").parquet(in.toString)
    writeDirInput(Seq(1L, 2L, 3L))
    assert(in.isDirectory, "this contract is about directory inputs")
    var builds = 0
    def get() = LlmQueries.staged(spark, dir.toString, "k", "t") {
      builds += 1
      spark.read.parquet(in.toString).agg(sum("v").as("s"))
    }
    assert(get().collect()(0).getLong(0) == 6L)
    assert(get().collect()(0).getLong(0) == 6L && builds == 1)
    // Regenerate IN PLACE and pin the directory's own mtime back, so
    // only the per-file components can distinguish the generations.
    val dirMtime = in.lastModified()
    writeDirInput(Seq(10L, 20L, 30L, 40L))
    val inner = in.listFiles().find(_.getName.endsWith(".parquet")).get
    inner.setLastModified(inner.lastModified() + 2000)
    in.setLastModified(dirMtime)
    assert(in.lastModified() == dirMtime)
    assert(get().collect()(0).getLong(0) == 100L,
      "per-file signature must bust the cache on an in-place dir rewrite")
    assert(builds == 2)
  }

  test("an hour-old unheld publish lockfile is reaped; a held one is not") {
    // withPublishLock leaves its `.key.lock` behind by design (deleting
    // after release races a concurrent opener onto the unlinked inode);
    // sweepStale reaps them instead — age-gated and only when tryLock
    // proves nobody holds the lock at that instant.
    val dir = Files.createTempDirectory("staged_spec7").toFile
    writeInput(dir, Seq(1L, 2L))
    val cacheParent = new java.io.File(s"/tmp/graft_edges/${dir.getName}")
    cacheParent.mkdirs()
    val stale = new java.io.File(cacheParent, ".k.lock")
    Files.write(stale.toPath, Array[Byte]())
    stale.setLastModified(System.currentTimeMillis() - 2 * 3600000L)
    val held = new java.io.File(cacheParent, ".kheld.lock")
    Files.write(held.toPath, Array[Byte]())
    held.setLastModified(System.currentTimeMillis() - 2 * 3600000L)
    val ch = java.nio.channels.FileChannel.open(held.toPath,
      java.nio.file.StandardOpenOption.WRITE)
    val l = ch.lock()
    try {
      def get(key: String) = LlmQueries.staged(spark, dir.toString, key, "t") {
        spark.read.parquet(new java.io.File(dir, "t.parquet").toString)
          .agg(sum("v").as("s"))
      }
      get("k").collect()     // sweep for key k reaps the stale .k.lock
      get("kheld").collect() // sweep for kheld must SKIP the held lock
      assert(!stale.exists(), "hour-old unheld lockfile must be reaped")
      assert(held.exists(), "a held lockfile must never be reaped")
    } finally { l.release(); ch.close() }
  }

  test("concurrent same-key builders all serve the winner's publication") {
    // The documented race: racing builders resolve at the rename — the
    // loser discards its tmp copy and serves the winner's. Four threads
    // hit a fresh key at once; every one must return the right answer,
    // exactly one signed dir may exist afterwards, and no tmp litter.
    val dir = Files.createTempDirectory("staged_spec8").toFile
    writeInput(dir, Seq(7L, 8L))
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 4).map { _ =>
      new Thread(() =>
        try results.add(
          LlmQueries.staged(spark, dir.toString, "krace", "t") {
            spark.read.parquet(new java.io.File(dir, "t.parquet").toString)
              .agg(sum("v").as("s"))
          }.collect()(0).getLong(0))
        catch { case t: Throwable => errors.add(t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"no builder may fail: ${errors.peek()}")
    assert(results.size == 4 && results.asScala.forall(_ == 15L))
    val parent = new java.io.File(s"/tmp/graft_edges/${dir.getName}")
    val siblings = parent.listFiles().filter(_.getName.startsWith("krace"))
    assert(siblings.length == 1 && new java.io.File(siblings(0), "_SUCCESS").exists())
    assert(!parent.listFiles().exists(_.getName.startsWith(".krace-")),
      "losers must delete their tmp copies")
  }

  test("contended rescue of a half-written dir stays serialized and correct") {
    // Forces every builder through the withPublishLock rescue (a signed
    // dir WITHOUT _SUCCESS blocks all first renames): the per-key
    // ReentrantLock + OS file lock serialize the delete-and-republish,
    // the losers re-check _SUCCESS inside the lock and keep the
    // winner's copy. This is the path the round-13 lock rework touched.
    val dir = Files.createTempDirectory("staged_spec9").toFile
    writeInput(dir, Seq(9L, 10L))
    val in = new java.io.File(dir, "t.parquet")
    val sig = s"${in.length()}-${in.lastModified()}-${LlmQueries.contentTag(in)}"
    val signed = new java.io.File(s"/tmp/graft_edges/${dir.getName}/krsc-$sig")
    signed.mkdirs()
    Files.write(new java.io.File(signed, "part-garbage.parquet").toPath,
      Array[Byte](1, 2, 3))
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 4).map { _ =>
      new Thread(() =>
        try results.add(
          LlmQueries.staged(spark, dir.toString, "krsc", "t") {
            spark.read.parquet(in.toString).agg(sum("v").as("s"))
          }.collect()(0).getLong(0))
        catch { case t: Throwable => errors.add(t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"no rescuer may fail: ${errors.peek()}")
    assert(results.size == 4 && results.asScala.forall(_ == 19L))
    assert(new java.io.File(signed, "_SUCCESS").exists(),
      "the rescued dir must be a complete publish")
  }

  test("a half-written dir at the signed path is replaced, not served") {
    // Simulates a build killed mid-write under the pre-round-11 in-place
    // scheme (or any corruption): a signed dir WITHOUT _SUCCESS must be
    // rebuilt, and the rename-based publish must replace it.
    val dir = Files.createTempDirectory("staged_spec5").toFile
    writeInput(dir, Seq(5L, 6L))
    var builds = 0
    def get() = LlmQueries.staged(spark, dir.toString, "k", "t") {
      builds += 1
      spark.read.parquet(new java.io.File(dir, "t.parquet").toString)
        .agg(sum("v").as("s"))
    }
    val in = new java.io.File(dir, "t.parquet")
    val sig = s"${in.length()}-${in.lastModified()}-${LlmQueries.contentTag(in)}"
    val signed = new java.io.File(s"/tmp/graft_edges/${dir.getName}/k-$sig")
    signed.mkdirs()
    Files.write(new java.io.File(signed, "part-garbage.parquet").toPath,
      Array[Byte](1, 2, 3))
    assert(get().collect()(0).getLong(0) == 11L)
    assert(builds == 1)
    assert(new java.io.File(signed, "_SUCCESS").exists(),
      "the replaced dir must be a complete publish")
    assert(get().collect()(0).getLong(0) == 11L)
    assert(builds == 1, "the replacement must then serve as a cache hit")
  }
}
