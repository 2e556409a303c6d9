package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.AvroSerDe
import graft.schemas.Contracts

/** E2 pipeline parity (SURVEY §3): topic -> Avro decode -> typed rows ->
  * file sink, driven as a stream of (key, value-binary) frames through the
  * same AvroSerDe used in batch. */
class StreamsE2Spec extends SparkSpec {
  import spark.implicits._

  test("E2: streamed Avro frames decode to contract rows in a file sink") {
    val srcDir = Files.createTempDirectory("avro-src").toString
    val outDir = Files.createTempDirectory("avro-out").toString
    val ckDir = Files.createTempDirectory("avro-ck").toString
    val avro = AvroSerDe.avroSchemaFor("CI", Contracts.consumptionIndustry)

    // Producer leg (K1): contract rows -> keyed Avro frames, landed as files
    // (the Kafka topic stand-in).
    val rows = Seq(
      ("2024-12-01T10:00", "2024-12-01T11:00", "101", "Erhverv", 1234.5f),
      ("2024-12-01T11:00", "2024-12-01T12:00", "155", "Privat", 0.25f))
    AvroSerDe.encode(
        rows.toDF("HourUTC", "HourDK", "MunicipalityNo", "Branche", "ConsumptionkWh"),
        avro, keyCol = "HourUTC")
      .write.mode("append").parquet(srcDir)

    // Consumer leg (E2): readStream -> decode -> parquet sink.
    val frames = spark.readStream
      .schema("key STRING, value BINARY").parquet(srcDir)
    val q = AvroSerDe.decode(frames, avro, Contracts.consumptionIndustry)
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir).start()
    q.processAllAvailable()
    q.stop()

    val back = spark.read.parquet(outDir)
      .as[(String, String, String, String, Float)].collect().toSet
    assert(back == rows.toSet)
  }

  test("K5: foreachBatch keyed upsert is last-write-wins") {
    val srcDir = Files.createTempDirectory("up-src").toString
    val stateDir = Files.createTempDirectory("up-state").toString + "/state"
    val ckDir = Files.createTempDirectory("up-ck").toString

    def run(): Unit = {
      val stream = spark.readStream.schema("k STRING, v LONG").parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch(Streams.upsertBatch(stateDir, Seq("k")) _)
        .option("checkpointLocation", ckDir).start()
      q.processAllAvailable(); q.stop()
    }
    Seq(("a", 1L), ("b", 1L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    Seq(("b", 2L), ("c", 1L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    val stateDf = spark.read.parquet(stateDir)
    val state = stateDf.select("k", "v").as[(String, Long)].collect().toMap
    assert(state == Map("a" -> 1L, "b" -> 2L, "c" -> 1L))
    // P7: every state row carries its ingest timestamp.
    assert(stateDf.schema.fieldNames.contains("ingested_at"))
    assert(stateDf.filter(col("ingested_at").isNull).count() == 0)
  }

  test("K5: a batch rewrites only the state buckets its keys hash into") {
    val srcDir = Files.createTempDirectory("inc-src").toString
    val stateDir = Files.createTempDirectory("inc-state").toString + "/state"
    val ckDir = Files.createTempDirectory("inc-ck").toString

    def bucketOf(k: String): Int =
      spark.range(1)
        .select(pmod(xxhash64(lit(k)), lit(64)).cast("int")).head.getInt(0)
    // Precondition for the assertion below: "a" lives in its own bucket.
    assert(bucketOf("a") != bucketOf("b") && bucketOf("a") != bucketOf("c"))

    def run(): Unit = {
      val stream = spark.readStream.schema("k STRING, v LONG").parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch(Streams.upsertBatch(stateDir, Seq("k")) _)
        .option("checkpointLocation", ckDir).start()
      q.processAllAvailable(); q.stop()
    }
    Seq(("a", 1L), ("b", 1L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    val aBucketDir = new java.io.File(s"$stateDir/__bucket=${bucketOf("a")}")
    def snapshot() = aBucketDir.listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified)).toSet
    val before = snapshot()
    assert(before.nonEmpty)
    // Second batch touches only b and c: a's bucket files must be byte-for-
    // byte untouched (same names, same mtimes) — the whole-state rewrite of
    // a naive read-union-overwrite would replace them.
    Seq(("b", 2L), ("c", 1L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    assert(snapshot() == before, "untouched bucket was rewritten")
    val state = spark.read.parquet(stateDir)
      .select("k", "v").as[(String, Long)].collect().toMap
    assert(state == Map("a" -> 1L, "b" -> 2L, "c" -> 1L))
  }

  test("K5: a crash between the swap renames cannot drop carried-over state") {
    val srcDir = Files.createTempDirectory("cr-src").toString
    val stateDir = Files.createTempDirectory("cr-state").toString + "/state"
    val ckDir = Files.createTempDirectory("cr-ck").toString

    def bucketOf(k: String): Int =
      spark.range(1)
        .select(pmod(xxhash64(lit(k)), lit(64)).cast("int")).head.getInt(0)

    def run(): Unit = {
      val stream = spark.readStream.schema("k STRING, v LONG").parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch(Streams.upsertBatch(stateDir, Seq("k")) _)
        .option("checkpointLocation", ckDir).start()
      q.processAllAvailable(); q.stop()
    }
    Seq(("a", 1L), ("b", 1L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    // Simulate a crash caught between the two publish renames of b's
    // bucket: the live dir has been moved to the .swap-old marker and the
    // staged dir was never renamed in. A reader at this instant would not
    // see b — the next batch must restore it before merging.
    val live = new java.io.File(s"$stateDir/__bucket=${bucketOf("b")}")
    val marker = new java.io.File(s"$stateDir/.swap-old-__bucket=${bucketOf("b")}")
    assert(live.renameTo(marker))
    Seq(("c", 1L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    val state = spark.read.parquet(stateDir)
      .select("k", "v").as[(String, Long)].collect().toMap
    assert(state == Map("a" -> 1L, "b" -> 1L, "c" -> 1L),
      "carried-over key lost across simulated crash")
    assert(!marker.exists(), "swap marker not cleaned up")
  }

  test("deleteKeys rewrites only doomed buckets; emptied buckets vanish") {
    val stateDir = Files.createTempDirectory("del-state").toString + "/state"
    def bucketOf(k: String): Int =
      spark.range(1)
        .select(pmod(xxhash64(lit(k)), lit(64)).cast("int")).head.getInt(0)
    // keys in three distinct buckets: delete b entirely, keep a and c
    assert(bucketOf("a") != bucketOf("b") && bucketOf("b") != bucketOf("c")
      && bucketOf("a") != bucketOf("c"))
    Streams.upsertBatch(stateDir, Seq("k"))(
      Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v"), 0L)
    val aBucketDir = new java.io.File(s"$stateDir/__bucket=${bucketOf("a")}")
    val before = aBucketDir.listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified)).toSet
    assert(before.nonEmpty)
    Streams.deleteKeys(stateDir, Seq("k"), Seq("b").toDF("k"),
      batchId = 99L)
    // untouched bucket files byte-identical; doomed bucket dir removed
    val after = aBucketDir.listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified)).toSet
    assert(after == before, "untouched bucket was rewritten by delete")
    assert(!new java.io.File(s"$stateDir/__bucket=${bucketOf("b")}").exists(),
      "fully-doomed bucket directory should be gone")
    val state = spark.read.parquet(stateDir)
      .select("k", "v").as[(String, Long)].collect().toMap
    assert(state == Map("a" -> 1L, "c" -> 3L))
    // deleting a non-existent key is a no-op, not an error
    Streams.deleteKeys(stateDir, Seq("k"), Seq("zz").toDF("k"),
      batchId = 100L)
    assert(spark.read.parquet(stateDir).count() == 2)
  }

  test("deleteKeys: a stranded request manifest is re-applied on recovery") {
    val stateDir = Files.createTempDirectory("delrec-state").toString + "/state"
    Streams.upsertBatch(stateDir, Seq("k"))(
      Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v"), 0L)
    // Simulate a delete request that crashed after persisting its manifest
    // but before (fully) swapping buckets: only the manifest exists.
    Seq("b").toDF("k").write.mode("overwrite")
      .parquet(s"$stateDir/.delete-req-7")
    // The next state operation must detect and re-apply the request —
    // right-to-be-forgotten cannot be silently half-applied.
    Streams.upsertBatch(stateDir, Seq("k"))(
      Seq(("d", 4L)).toDF("k", "v"), 1L)
    val state = spark.read.parquet(stateDir)
      .select("k", "v").as[(String, Long)].collect().toMap
    assert(state == Map("a" -> 1L, "c" -> 3L, "d" -> 4L),
      s"stranded delete request not re-applied: $state")
    assert(!new java.io.File(s"$stateDir/.delete-req-7").exists(),
      "manifest not cleared after recovery")
  }

  test("upsertBatch persists nBuckets and refuses a mismatched modulus") {
    val stateDir = Files.createTempDirectory("nb-state").toString + "/state"
    Streams.upsertBatch(stateDir, Seq("k"), nBuckets = 8)(
      Seq(("a", 1L)).toDF("k", "v"), 0L)
    assert(new java.io.File(s"$stateDir/.nbuckets").exists())
    intercept[IllegalArgumentException] {
      Streams.upsertBatch(stateDir, Seq("k"), nBuckets = 16)(
        Seq(("b", 2L)).toDF("k", "v"), 1L)
    }
  }
}
