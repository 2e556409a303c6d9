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
}
