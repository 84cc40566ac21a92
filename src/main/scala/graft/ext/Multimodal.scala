package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.11): media as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The Spark-side design is the real thing — schema, partitioning, and
  * batch shape are what a 100 TB image/audio pipeline needs:
  *
  *   - payloads travel as a BinaryType column next to their metadata
  *     (never driver-collected; `spark.sql.files.maxPartitionBytes`
  *     bounds batch memory);
  *   - decode/feature-extract runs per partition via a typed
  *     `mapPartitions` over a case-class Dataset — the Scala analog of
  *     Python's `mapInPandas` batch UDF: one iterator in, one iterator
  *     out, so a codec can amortize model/library init per partition;
  *   - the actual codec is STUBBED with a deterministic fake
  *     ([[fakeDecode]]) because no image/audio libraries ship in this
  *     container — the seam to replace is exactly that function.
  */
object Multimodal {

  /** A decoded-media record: metadata extracted from a binary payload. */
  final case class MediaMeta(
      doc_id: Long,
      media_type: String,
      payload_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long)

  /** Attach a synthetic binary payload to each document (UTF-8 bytes of
    * its text — a stand-in for real image/audio bytes; the fixture set
    * carries no binary column).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("n_chars"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"))

  /** The stubbed codec: deterministic fake dimensions derived from the
    * payload size and id. Replace with a real decoder (JavaCV, TwelveMonkeys,
    * etc.) — the signature (bytes in, metadata out) is the contract.
    */
  def fakeDecode(docId: Long, mediaType: String, payload: Array[Byte]): MediaMeta =
    MediaMeta(
      doc_id = docId,
      media_type = mediaType,
      payload_bytes = payload.length.toLong,
      width = (docId % 16) * 120 + 160,
      height = (docId % 9) * 120 + 90,
      n_frames = if (mediaType == "image") 1L else payload.length % 30 + 1L)

  /** Batch "decode": partition-at-a-time over the payload column. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would go here (codec handles, model load)
        it.map { case (id, mt, bytes) => fakeDecode(id, mt, bytes) }
      }
  }

  /** One sampled (and resized) frame of a media payload. */
  final case class FrameMeta(
      doc_id: Long,
      media_type: String,
      frame_idx: Long,
      out_w: Long,
      out_h: Long)

  /** Frame sampling + resize planning — the preprocessing fan-out of a
    * vision training pipeline: pick ≤ `maxFrames` evenly-strided frames
    * per payload and compute the aspect-preserving fit into
    * `target`×`target` (all integer math, so the plan is reproducible
    * and oracle-checkable; the actual pixel work would live in the same
    * typed batch seam as [[fakeDecode]]). A flatMap on the decoded
    * Dataset: one media row fans out to its sampled frames — rows
    * multiply by ≤ maxFrames BEFORE any shuffle, and downstream
    * per-frame work (embedding, hashing) parallelizes per frame.
    * Output: (doc_id, media_type, frame_idx, out_w, out_h).
    */
  def sampleFrames(
      spark: SparkSession,
      docs: DataFrame,
      maxFrames: Int = 4,
      target: Long = 224L): Dataset[FrameMeta] = {
    import spark.implicits._
    decodeMeta(spark, docs).flatMap { m =>
      // ceil-division stride: floor (n/maxFrames) would emit up to
      // 2·maxFrames−1 frames whenever n is not a multiple of maxFrames
      val step = math.max(1L, (m.n_frames + maxFrames - 1) / maxFrames)
      val longSide = math.max(m.width, m.height)
      val outW = m.width * target / longSide
      val outH = m.height * target / longSide
      (0L until m.n_frames by step)
        .map(i => FrameMeta(m.doc_id, m.media_type, i, outW, outH))
    }
  }

  /** Deterministic per-frame feature vector: dim `d` =
    * ((hash32("doc:frame:d") mod 2001) − 1000) / 1000 ∈ [−1, 1] — the
    * featurization STAND-IN in the same honest sense as [[fakeDecode]]
    * (a real pipeline embeds pixels in the typed batch seam; the
    * md5-derived fake is oracle-reproducible). Built as a flat `array()`
    * of codegen'd expressions — no per-element lambda.
    */
  def frameEmbedding(frames: DataFrame, dims: Int = 8): DataFrame = {
    import graft.functions.Portable.hash32
    frames.select(col("doc_id"), col("frame_idx"),
      array((0 until dims).map(d =>
        (hash32(concat_ws(":", col("doc_id"), col("frame_idx"), lit(d))) % 2001 - 1000)
          .cast("double") / 1000.0): _*).as("fv"))
  }

  /** The multimodal ANN capstone: decode → frame-sample → featurize →
    * top-k nearest frames of OTHER documents, per query frame — the
    * whole vision-curation preprocessing path (dedup-by-similarity over
    * frames) composed in one lazy plan. Query frames (doc_id <
    * `queryDocs`) broadcast; ranking is the sort-free heap operator.
    * Output: (q_doc, q_frame, rank, n_doc, n_frame, cos_sim).
    */
  def frameAnn(
      spark: SparkSession,
      docs: DataFrame,
      k: Int = 3,
      queryDocs: Long = 10L): DataFrame = {
    import graft.plans.TopKPerGroup
    // the decode → frame → featurize prefix feeds BOTH sides of the
    // query/target self-join; persist it (releasable, memoized) so the
    // non-codegen typed decode seam runs once, not twice
    val emb = graft.tools.InternalCaches.persist(
      frameEmbedding(sampleFrames(spark, docs).toDF()))
    val q = emb.filter(col("doc_id") < queryDocs)
      .select(col("doc_id").as("q_doc"), col("frame_idx").as("q_frame"),
        col("fv").as("qv"))
    val targets = emb.select(col("doc_id").as("n_doc"),
      col("frame_idx").as("n_frame"), col("fv").as("nv"))
    val scored = targets.join(broadcast(q), col("n_doc") =!= col("q_doc"))
      .select(col("q_doc"), col("q_frame"), col("n_doc"), col("n_frame"),
        round(graft.functions.CosineSim.cosine_sim(col("qv"), col("nv")), 6)
          .as("cos_sim"))
    TopKPerGroup.topK(scored, Seq("q_doc", "q_frame"),
        Seq("cos_sim" -> TopKPerGroup.Desc, "n_doc" -> TopKPerGroup.Asc,
          "n_frame" -> TopKPerGroup.Asc), k)
      .select(col("q_doc"), col("q_frame"), col("rank"),
        col("n_doc"), col("n_frame"), col("cos_sim"))
  }
}
