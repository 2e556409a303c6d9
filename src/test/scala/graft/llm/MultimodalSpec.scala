package graft.llm

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
}
