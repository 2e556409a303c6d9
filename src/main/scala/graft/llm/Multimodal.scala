package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque binary columns with typed
  * metadata, decoded/feature-extracted in partition-batched passes.
  *
  * The decode step is STUBBED (no image/audio libs in this container): it
  * derives deterministic pseudo-metadata from the payload bytes. The
  * Spark-side plumbing is real — binary columns, typed Dataset batch
  * shape, mapPartitions-per-batch decode (the Scala analogue of
  * mapInPandas: one decoder init per partition, streamed row batches).
  *
  * At 100 TB: binary payloads ride in their own column so Parquet column
  * pruning skips them unless the decode stage is in the plan; partitions
  * sized by spark.sql.files.maxPartitionBytes bound decoder memory.
  */
object Multimodal {
  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class DecodedRow(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, channels: Long, fingerprint: String)

  /** Attach a binary payload column (testdata stand-in: UTF-8 text bytes;
    * production: real image/audio bytes read from Parquet/files). */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.withColumn("media", col("text").cast("binary"))

  /** STUB decode — deterministic pseudo-dimensions from byte length. A real
    * build replaces the body with an image decoder; signature and batch
    * shape stay identical. */
  private def decodeStub(r: MediaRow): DecodedRow = {
    val nb = r.media.length.toLong
    DecodedRow(r.doc_id, nb, 64L + nb % 512L, 64L + (nb / 7L) % 512L, 3L,
      // fingerprint of the payload (hex md5), computed per-row
      java.security.MessageDigest.getInstance("MD5").digest(r.media)
        .map("%02x".format(_)).mkString)
  }

  /** Partition-batched decode: one decoder per partition, rows streamed. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[MediaRow]
      .mapPartitions { it =>
        // decoder/model init would happen once per partition here
        it.map(decodeStub)
      }
  }

  /** STUB resize: recompute target dimensions preserving aspect, payload
    * untouched (a real build transcodes; the plumbing — schema in/out,
    * per-partition batching — is what this exercises). */
  def resizeStub(spark: SparkSession, media: DataFrame,
      maxSide: Long): Dataset[DecodedRow] = {
    import spark.implicits._
    decode(spark, media).map { d =>
      val scale = maxSide.toDouble / math.max(d.width, d.height)
      if (scale >= 1.0) d
      else d.copy(width = (d.width * scale).toLong,
        height = (d.height * scale).toLong)
    }
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, frame_fingerprint: String)

  /** STUB frame sampling ("video" payloads): emit `n` evenly-spaced frame
    * fingerprints per payload — the one-row-to-many-frames batch shape of
    * a real frame sampler, with a deterministic fake extractor. */
  def frameSampleStub(spark: SparkSession, media: DataFrame,
      n: Int): Dataset[FrameRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[MediaRow]
      .flatMap { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
        (0 until n).map { i =>
          md.reset()
          md.update(r.media)
          md.update(i.toByte)
          FrameRow(r.doc_id, i.toLong,
            md.digest().map("%02x".format(_)).mkString)
        }
      }
  }

  /** Column-expression twin of the stub (oracle-checkable end-to-end): the
    * same arithmetic as decodeStub in pure codegen'd expressions. */
  def decodeStubColumns(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      octet_length(col("media")).cast("long").as("n_bytes"),
      (lit(64L) + octet_length(col("media")).cast("long") % 512L).as("width"),
      (lit(64L) + (octet_length(col("media")).cast("long") / 7L).cast("long") % 512L).as("height"),
      lit(3L).as("channels"),
      md5(col("media")).as("fingerprint"))

  /** Sliding byte windows over the binary payload — the audio/waveform
    * featurization batch shape (window length + hop/stride, short tail
    * window kept; a payload shorter than one window yields exactly one).
    * Pure codegen'd expressions (sequence + explode + byte substr):
    * windowing at 100 TB must ride the scan, not a lambda. The md5 per
    * window stands in for the frame transform — a real featurizer
    * replaces that one column.
    *
    * Output: (doc_id, win_idx, off, win_md5), off = byte offset 0-based.
    */
  def byteWindows(media: DataFrame, winLen: Int, stride: Int): DataFrame = {
    require(winLen > 0 && stride > 0)
    val nWins =
      expr(s"((greatest(octet_length(media), $winLen) - $winLen) div $stride) + 1")
    media.select(col("doc_id"), col("media"),
        explode(sequence(lit(0L), nWins - 1)).as("win_idx"))
      .select(col("doc_id"), col("win_idx"),
        (col("win_idx") * stride).as("off"),
        md5(col("media").substr((col("win_idx") * stride + 1).cast("int"),
          lit(winLen))).as("win_md5"))
  }

  /** Perceptual-hash near-duplicate detection over binary payloads —
    * the image-dedup shape (aHash/pHash family) on the stubbed decode:
    * 63 evenly-spaced sample bytes stand in for the 8x8 grayscale
    * grid (a real decoder replaces the sampling, nothing else), each
    * "pixel" contributes one hash bit (above the integer mean), and
    * candidate pairs come from SimHash-style band blocking (3 bands x
    * 21 bits — a pair survives iff some band matches exactly, the q37
    * discipline) with an exact popcount(xor) hamming verify. All
    * integer arithmetic — floor-div sampling positions, floor mean —
    * so the hash replays bit-for-bit. Payload bytes are sampled via
    * codegen'd substring, never a UDF; the banded join shuffles only
    * (band, value, id, hash) — ids and longs, no payloads.
    *
    * Guarantees: exact-duplicate payloads always pair (hamming 0 ⇒
    * all bands equal); near-dups within `maxHamming` are found iff
    * one band is untouched (recall < 1, the standard banding
    * trade-off — spec-pinned candidates ⊆ brute-force pairs). */
  def aHashNearDup(media: DataFrame, maxHamming: Int = 8): DataFrame = {
    val px = media.select(col("doc_id"), col("media"),
        octet_length(col("media")).as("nb"))
      .select(col("doc_id"), col("media"), col("nb"),
        explode(sequence(lit(0), lit(62))).as("i"))
      .select(col("doc_id"), col("i"),
        expr("""ascii(CAST(substring(media,
          CAST((i * nb) div 64 AS INT) + 1, 1) AS STRING))""").as("v"))
    val mean = px.groupBy("doc_id")
      .agg(expr("sum(v) div 63").as("mean"))
    val h = px.join(mean, "doc_id")
      .groupBy("doc_id")
      .agg(sum(expr(
        "CASE WHEN v > mean THEN shiftleft(CAST(1 AS BIGINT), i)" +
          " ELSE 0L END")).as("h"))
      .localCheckpoint(true) // id + 63-bit hash per payload
    val bands = h.select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(2))).as("b"))
      .select(col("doc_id"), col("h"), col("b"),
        expr("(h >> CAST(21 * b AS INT)) & 2097151").as("bval"))
    val a = bands.select(col("doc_id").as("d1"), col("h").as("h1"),
      col("b"), col("bval"))
    val c = bands.select(col("doc_id").as("d2"), col("h").as("h2"),
      col("b"), col("bval"))
    a.join(c, Seq("b", "bval")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        expr("CAST(bit_count(h1 ^ h2) AS BIGINT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
