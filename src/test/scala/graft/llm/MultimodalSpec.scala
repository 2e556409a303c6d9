package graft.llm

import org.apache.spark.sql.functions.col
import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  test("mapPartitions decode and column-expression twin agree row-for-row") {
    val docs = Tables(spark, sfDir, "documents").limit(50)
    val media = Multimodal.withBinaryPayload(docs)
    val viaDs = Multimodal.decode(spark, media).collect()
      .map(r => (r.doc_id, r.n_bytes, r.width, r.height, r.channels, r.fingerprint))
      .toSet
    val viaCols = Multimodal.decodeStubColumns(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
      .toSet
    assert(viaDs == viaCols)
  }

  test("resize stub caps the longer side, preserves smaller payloads") {
    val docs = Tables(spark, sfDir, "documents").limit(50)
    val media = Multimodal.withBinaryPayload(docs)
    val resized = Multimodal.resizeStub(spark, media, maxSide = 128).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(d => d.width <= 128 || d.height <= 128 ||
      (d.width <= 128 && d.height <= 128)))
    assert(resized.forall(d => math.max(d.width, d.height) <= 576))
  }

  test("frame sampling emits n deterministic frames per payload") {
    val docs = Tables(spark, sfDir, "documents").limit(10)
    val media = Multimodal.withBinaryPayload(docs)
    val frames = Multimodal.frameSampleStub(spark, media, n = 4).collect()
    assert(frames.length == 40)
    assert(frames.map(f => (f.doc_id, f.frame_idx)).distinct.length == 40)
    // deterministic: same input -> same fingerprints
    val again = Multimodal.frameSampleStub(spark, media, n = 4).collect()
    assert(frames.map(f => (f.doc_id, f.frame_idx, f.frame_fingerprint)).toSet ==
      again.map(f => (f.doc_id, f.frame_idx, f.frame_fingerprint)).toSet)
  }

  test("byte windows: count formula, offsets, tail and short payloads") {
    import spark.implicits._
    // 70 bytes, win 32, hop 16 -> ((70-32) div 16)+1 = 3 windows; 10-byte
    // payload -> exactly 1 window (shorter than winLen).
    val media = Seq((1L, "a" * 70), (2L, "b" * 10)).toDF("doc_id", "text")
      .withColumn("media", col("text").cast("binary"))
    val got = Multimodal.byteWindows(media, winLen = 32, stride = 16)
      .select("doc_id", "win_idx", "off", "win_md5")
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, 0L, 0L), (1L, 1L, 16L), (1L, 2L, 32L), (2L, 0L, 0L)))
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // The count formula keeps every window full (last offset <= n-winLen):
    // both doc-1 windows hash 32 a's; the sub-winLen payload yields one
    // whole-payload window.
    assert(got.head._4 == md5hex("a" * 32))
    assert(got(2)._4 == md5hex("a" * 32))
    assert(got.last._4 == md5hex("b" * 10))
  }

  test("aHash: identical payloads always pair at hamming 0; candidates " +
      "are a subset of brute-force pairs") {
    import spark.implicits._
    def scalaHash(text: String): Long = {
      val nb = text.length
      val px = (0 until 63).map(i => text.charAt(i * nb / 64).toInt)
      val mean = px.sum / 63
      px.zipWithIndex.map { case (v, i) =>
        if (v > mean) 1L << i else 0L }.sum
    }
    val base = "the quick brown fox jumps over the lazy dog " * 4
    val docs = Seq(
      (1L, base), (2L, base), // exact dup
      (3L, base.replace("quick", "quack")), // near dup
      (4L, "zz " + base.reverse), (5L, "completely different words here " * 6))
      .toDF("doc_id", "text")
    val media = Multimodal.withBinaryPayload(docs)
    val pairs = Multimodal.aHashNearDup(media, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(pairs.get((1L, 2L)).contains(0L))
    // every candidate's hamming agrees with the scala replay
    val texts = Map(1L -> base, 2L -> base,
      3L -> base.replace("quick", "quack"),
      4L -> ("zz " + base.reverse),
      5L -> ("completely different words here " * 6))
    pairs.foreach { case ((a, b), hd) =>
      val want = java.lang.Long.bitCount(scalaHash(texts(a)) ^ scalaHash(texts(b)))
      assert(hd == want && hd <= 8, s"pair ($a,$b)")
    }
  }

  test("aHash: corpus candidates replay exactly in scala") {
    val docs = graft.Tables(spark, sfDir, "documents").limit(80)
    val media = Multimodal.withBinaryPayload(docs)
    val got = Multimodal.aHashNearDup(media, maxHamming = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def h(t: String): Long = {
      val nb = t.length
      val px = (0 until 63).map(i => t.charAt(i * nb / 64).toInt)
      val mean = px.sum / 63
      px.zipWithIndex.map { case (v, i) => if (v > mean) 1L << i else 0L }.sum
    }
    val hs = texts.map { case (k, v) => k -> h(v) }
    def bands(x: Long) = (0 until 3).map(b => (b, (x >> (21 * b)) & 2097151L))
    val want = (for {
      a <- hs.keys; b <- hs.keys if a < b
      if bands(hs(a)).intersect(bands(hs(b))).nonEmpty
      hd = java.lang.Long.bitCount(hs(a) ^ hs(b)) if hd <= 8
    } yield (a, b) -> hd.toLong).toMap
    assert(got == want)
  }

  test("real PNG decode: lossless round-trip, dims/channels, and the " +
      "8x8 block-average aHash matches a direct pixel-formula replay") {
    // decodeImage on a generated PNG must recover real dimensions
    val png = Multimodal.pngPayload(7L)
    val dec = Multimodal.decodeImage(Multimodal.MediaRow(7L, png))
    assert(dec.isDefined)
    assert(dec.get.width == 16L && dec.get.height == 16L &&
      dec.get.channels == 3L)
    // text bytes are not an image: real path declines, stub handles it
    assert(Multimodal.decodeImage(
      Multimodal.MediaRow(1L, "not an image".getBytes)).isEmpty)
    // aHashRealPng == direct integer replay of the pixel formula
    val ids = Seq(0L, 1L, 7L, 42L, 99L)
    import spark.implicits._
    val media = Multimodal.withPngPayload(ids.toDF("doc_id"))
    val got = Multimodal.aHashRealPng(spark, media).collect()
      .map(r => r.doc_id -> r.ahash).toMap
    def ref(id: Long): Long = {
      def cch(mul: Long, xm: Long, ym: Long, x0: Int, y0: Int): Long =
        ((id * mul + x0 * xm + y0 * ym) % 256 +
          (id * mul + (x0 + 1) * xm + y0 * ym) % 256 +
          (id * mul + x0 * xm + (y0 + 1) * ym) % 256 +
          (id * mul + (x0 + 1) * xm + (y0 + 1) * ym) % 256) / 4
      val luma = (0 until 63).map { i =>
        val x0 = (i % 8) * 2; val y0 = (i / 8) * 2
        (299L * cch(31, 7, 13, x0, y0) + 587L * cch(17, 11, 3, x0, y0) +
          114L * cch(23, 5, 19, x0, y0)) / 1000L
      }
      val mean = luma.sum / 63L
      luma.zipWithIndex.map { case (v, i) =>
        if (v > mean) 1L << i else 0L }.sum
    }
    assert(got == ids.map(id => id -> ref(id)).toMap)
  }

  test("ImageIO disk-backed stream cache is off after any decode/encode " +
      "call site runs (the round-9 loaded-host serialization amplifier)") {
    Multimodal.pngPayload(7L) // any site referencing imageIoNoCache
    assert(!javax.imageio.ImageIO.getUseCache,
      "ImageIO.setUseCache(false) must have run before first use")
  }

  test("parsePngHeader: expression-level IHDR parse agrees with a real " +
      "ImageIO decode of the same payloads, and flags non-PNG bytes") {
    import spark.implicits._
    val ids = Seq(0L, 5L, 17L, 123L)
    val media = Multimodal.withPngPayloadSized(ids.toDF("doc_id"))
    val parsed = Multimodal.parsePngHeader(media)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    ids.foreach { id =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.pngPayloadSized(id)))
      assert(parsed(id) ==
        ((true, img.getWidth.toLong, img.getHeight.toLong, 8L, 2L, 0L)),
        s"doc $id header mismatch: ${parsed(id)}")
    }
    // A payload that is not PNG must fail the signature check, not parse
    // garbage silently.
    val junk = Multimodal.parsePngHeader(
      Seq((1L, "definitely not a png".getBytes("UTF-8")))
        .toDF("doc_id", "media"))
      .select("sig_ok").as[Boolean].head()
    assert(!junk)
  }

  test("pcmWindowEnergy: expression-level byte parse equals a driver-side " +
      "int16 decode of the same payloads") {
    import spark.implicits._
    val ids = Seq(0L, 3L, 41L)
    val got = Multimodal.pcmWindowEnergy(
        Multimodal.withPcmPayload(ids.toDF("doc_id")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val expected = ids.flatMap { id =>
      val b = Multimodal.pcmPayload(id)
      val samples = b.grouped(2).map { p =>
        ((p(0) & 0xFF) | (p(1).toInt << 8)).toLong }.toSeq
      samples.grouped(16).zipWithIndex.map { case (w, i) =>
        (id, i.toLong) -> (w.sum, w.map(s => s * s).sum) }
    }.toMap
    assert(got == expected)
    // sign correction is load-bearing: the synthetic wave has negative
    // samples in every payload
    assert(expected.values.exists(_._1 < 0))
  }
  test("pHashRealPng (q438): ids 256 apart share pixel content and the " +
      "exact hash; median splits the 63 AC coefficients") {
    import spark.implicits._
    val media = Multimodal.withPngPayload(
      Seq(7L, 263L, 9L).toDF("doc_id"))
    val got = Multimodal.pHashRealPng(spark, media).collect()
      .map(r => r.doc_id -> (r.phash, r.median_f)).toMap
    // the per-channel formulas are (id*odd + ...) % 256, so ids 256
    // apart render the identical image -> identical DCT hash
    assert(got(7L) == got(263L), s"got $got")
    assert(got(7L) != got(9L), "different content should differ")
    // the exact median threshold puts at most 31 coefficients strictly
    // above it (63 values, 32nd smallest is the pivot)
    got.values.foreach { case (h, _) =>
      assert(java.lang.Long.bitCount(h) <= 31, s"popcount ${java.lang.Long.bitCount(h)}")
    }
  }
}
