package graft

import graft.ext.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload column carries the real bytes; metadata batch-decodes per partition") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val withP = Multimodal.withPayload(docs)
    val row = withP.orderBy("doc_id").first()
    val payload = row.getAs[Array[Byte]]("payload")
    val text = docs.orderBy("doc_id").first().getAs[String]("text")
    assert(new String(payload, "UTF-8") === text, "binary payload round-trips")

    val meta = Multimodal.decodeMeta(spark, docs).collect()
    assert(meta.length === 50)
    val m0 = meta.find(_.doc_id == 0L).get
    assert(m0.media_type === "image" && m0.n_frames === 1L)
    assert(m0.payload_bytes === text.getBytes("UTF-8").length.toLong)
    val m1 = meta.find(_.doc_id == 1L).get
    assert(m1.media_type === "audio" && m1.n_frames >= 1L && m1.n_frames <= 30L)
  }
}
