package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.11): media as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The Spark-side design is what a 100 TB image/audio pipeline needs:
  *
  *   - payloads travel as a BinaryType column next to their metadata
  *     (never driver-collected; `spark.sql.files.maxPartitionBytes`
  *     bounds batch memory);
  *   - decode/feature-extract runs per partition via a typed
  *     `mapPartitions` over a case-class Dataset — the Scala analog of
  *     Python's `mapInPandas` batch UDF: one iterator in, one iterator
  *     out, so a codec can amortize library init per partition;
  *   - the codec ([[decode]]) is a REAL byte-level parser for three
  *     genuine container formats — Netpbm P5 (PGM, 8-bit gray) and P6
  *     (PPM, 8-bit RGB) for images, back-to-back P5/P6 frames for
  *     video, and RIFF/WAVE PCM16 mono for audio. It reads magic
  *     numbers, ASCII/little-endian headers, and every pixel/sample
  *     byte (emitting a content checksum), and rejects truncated or
  *     malformed payloads.
  *
  * What remains synthetic is the FIXTURE: the corpus carries no binary
  * column, so [[withPayload]] manufactures each document's payload —
  * real P5/P6/WAV bytes whose dimensions and contents are deterministic
  * functions of `doc_id`. That determinism is what lets the DuckDB
  * oracle predict the decoder's output and catch a decoder that
  * misparses, skips bytes, or reads metadata from anywhere but the
  * payload. The decode path itself takes nothing from `doc_id` except
  * the row identity.
  */
object Multimodal {

  /** A decoded-media record: metadata extracted from a binary payload.
    * `content_sum` is the checksum over decoded content — pixel bytes
    * for image/video, signed 16-bit samples for audio — proving the
    * decoder consumed the payload body, not just the header. Audio has
    * no raster, so `width`/`height` are 0 and a "frame" is one 160-
    * sample window (20 ms at the fixture's 8 kHz).
    */
  final case class MediaMeta(
      doc_id: Long,
      media_type: String,
      payload_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      content_sum: Long)

  // ---------------------------------------------------------------------
  // Fixture generator: real-format bytes, deterministic in doc_id.
  // Mirrored by the x15/x24/x32 oracle SQL — change both together.
  // ---------------------------------------------------------------------

  def mediaTypeOf(docId: Long): String =
    (docId % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }

  /** [[mediaTypeOf]] as a codegen'd Column over `doc_id` — the
    * PRE-payload filter the single-modality stacks push below
    * [[withPayload]]'s opaque typed boundary. Catalyst cannot push a
    * `media_type` filter through the mapPartitions that manufactures
    * the payload, so filtering after it builds (and discards) payload
    * bytes for the other two thirds of the corpus; filtering on this
    * expression FIRST is semantically identical (media_type is a pure
    * function of doc_id — `%` is truncated remainder on both engines,
    * so negatives fall to the `video` arm exactly as the Scala match
    * does) and skips their payload generation outright. A NULL doc_id
    * classifies as NULL (both `when` arms are null ⇒ the isNotNull
    * conjunct gates the `otherwise`), so a nullable input can never
    * silently route null docs into the video stack — the typed path
    * would instead fail in [[withPayload]], and the two classifications
    * must not diverge (round-18 advisory).
    */
  private def mediaTypeCol(docId: Column): Column =
    when(docId % 3 === 0, "image")
      .when(docId % 3 === 1, "audio")
      .when(docId.isNotNull, "video")

  /** Raster dims/channels for image & video payloads (small on purpose:
    * ≤ 76×44×3 per frame keeps the synthetic corpus in tens of MB).
    */
  def rasterW(docId: Long): Int = ((docId % 16) * 4 + 16).toInt
  def rasterH(docId: Long): Int = ((docId % 9) * 4 + 12).toInt
  def rasterCh(docId: Long): Int = if (docId % 2 == 0) 3 else 1
  def videoFrames(docId: Long): Int = (docId % 5 + 2).toInt
  def audioSamples(docId: Long): Int = ((docId % 25 + 1) * 160).toInt

  /** `nFrames` concatenated Netpbm frames (P6 when 3-channel, P5 when
    * gray): each frame is `"P6\n{w} {h}\n255\n"` + w·h·ch raw bytes.
    * Pixel byte i (indexed across the WHOLE pixel stream, frames
    * included) is (docId + i) mod 251 — prime modulus so every byte
    * value varies and an off-by-one read shifts the checksum.
    */
  def makeNetpbmPayload(docId: Long, nFrames: Int): Array[Byte] = {
    val w = rasterW(docId); val h = rasterH(docId); val ch = rasterCh(docId)
    val magic = if (ch == 3) "P6" else "P5"
    val header = s"$magic\n$w $h\n255\n".getBytes("US-ASCII")
    val frameLen = header.length + w * h * ch
    val out = new Array[Byte](frameLen * nFrames)
    var pix = 0L
    var f = 0
    while (f < nFrames) {
      val base = f * frameLen
      System.arraycopy(header, 0, out, base, header.length)
      var j = base + header.length
      while (j < base + frameLen) {
        out(j) = ((docId + pix) % 251).toByte
        pix += 1; j += 1
      }
      f += 1
    }
    out
  }

  /** A minimal-but-genuine RIFF/WAVE: 44-byte canonical header (PCM,
    * mono, 8 kHz, 16-bit) + little-endian samples. Sample i is
    * ((docId·7 + i·13) mod 2003) − 1001 ∈ [−1001, 1001].
    */
  def makeWavPayload(docId: Long): Array[Byte] = {
    val n = audioSamples(docId)
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)          // PCM, mono
      .putInt(8000).putInt(8000 * 2)    // sample rate, byte rate
      .putShort(2).putShort(16)         // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      buf.putShort((((docId * 7 + i * 13L) % 2003) - 1001).toShort)
      i += 1
    }
    buf.array()
  }

  def makePayload(docId: Long): Array[Byte] = mediaTypeOf(docId) match {
    case "image" => makeNetpbmPayload(docId, 1)
    case "video" => makeNetpbmPayload(docId, videoFrames(docId))
    case _       => makeWavPayload(docId)
  }

  /** Attach the synthetic binary payload to each document (the fixture
    * set carries no binary column). Typed mapPartitions, not a driver
    * loop: payloads are built executor-side next to their rows.
    */
  def withPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, mediaTypeOf(id), makePayload(id))))
      .toDF("doc_id", "media_type", "payload")
  }

  // ---------------------------------------------------------------------
  // The real codec: bytes in, metadata out. Nothing here reads doc_id.
  // ---------------------------------------------------------------------

  private def fail(docId: Long, msg: String): Nothing =
    throw new IllegalArgumentException(s"doc $docId: malformed payload — $msg")

  /** Parse one ASCII unsigned int at `pos`, skipping leading Netpbm
    * whitespace. Returns (value, posAfter). Values are capped at 2^20:
    * unchecked `v * 10 + digit` Int math would wrap on a crafted header
    * (e.g. "P5\n4294967276 1\n255\n" parses w = −20, making dataLen
    * negative, the truncation check pass, and the frame loop spin
    * forever at posAfter = pos), so any dimension/maxval beyond the cap
    * is rejected as malformed rather than wrapped.
    */
  private def asciiInt(b: Array[Byte], pos0: Int, docId: Long): (Int, Int) = {
    var pos = pos0
    while (pos < b.length && (b(pos) == ' ' || b(pos) == '\n' || b(pos) == '\t' ||
        b(pos) == '\r')) pos += 1
    val start = pos
    var v = 0L
    while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
      v = v * 10L + (b(pos) - '0')
      if (v > (1L << 20)) fail(docId, s"ASCII integer at byte $start exceeds 2^20")
      pos += 1
    }
    if (pos == start) fail(docId, s"expected ASCII integer at byte $pos")
    (v.toInt, pos)
  }

  /** Decode one P5/P6 frame starting at `pos`; returns
    * (w, h, ch, pixelByteSum, posAfter).
    */
  private def netpbmFrame(b: Array[Byte], pos0: Int, docId: Long): (Int, Int, Int, Long, Int) = {
    if (pos0 + 2 > b.length || b(pos0) != 'P') fail(docId, s"no Netpbm magic at byte $pos0")
    val ch = b(pos0 + 1) match {
      case '5' => 1
      case '6' => 3
      case c   => fail(docId, s"unsupported Netpbm type P${c.toChar}")
    }
    val (w, p1) = asciiInt(b, pos0 + 2, docId)
    val (h, p2) = asciiInt(b, p1, docId)
    val (maxval, p3) = asciiInt(b, p2, docId)
    if (maxval != 255) fail(docId, s"unsupported maxval $maxval")
    if (w < 1 || h < 1) fail(docId, s"degenerate dimensions ${w}x$h")
    // exactly ONE whitespace byte separates the header from raster data
    if (p3 >= b.length || !(b(p3) == '\n' || b(p3) == ' ' || b(p3) == '\t' ||
        b(p3) == '\r')) fail(docId, "missing raster separator")
    val dataStart = p3 + 1
    // Long math: w·h·ch can reach 3·2^40 under the 2^20 dimension cap,
    // and an Int product could wrap past the truncation check
    val dataLen = w.toLong * h * ch
    if (dataStart + dataLen > b.length)
      fail(docId, s"truncated raster: need $dataLen bytes at $dataStart, have ${b.length}")
    val dataEnd = (dataStart + dataLen).toInt
    var sum = 0L
    var i = dataStart
    while (i < dataEnd) { sum += b(i) & 0xff; i += 1 }
    (w, h, ch, sum, dataEnd)
  }

  /** Decode a payload of back-to-back P5/P6 frames (1 frame = still
    * image). All frames must share dimensions; the payload must be
    * fully consumed.
    */
  private def decodeNetpbm(docId: Long, mediaType: String, b: Array[Byte]): MediaMeta = {
    var pos = 0
    var frames = 0L
    var sum = 0L
    var w = -1; var h = -1; var ch = -1
    while (pos < b.length) {
      val (fw, fh, fch, fsum, next) = netpbmFrame(b, pos, docId)
      if (w == -1) { w = fw; h = fh; ch = fch }
      else if (fw != w || fh != h)
        fail(docId, s"frame $frames dims ${fw}x$fh != first frame ${w}x$h")
      // channel flips (a P6 frame whose magic corrupted to P5) would
      // otherwise parse: same dims, w·h bytes consumed instead of 3·w·h,
      // and the checksum silently mixes gray and RGB accounting
      else if (fch != ch)
        fail(docId, s"frame $frames is P${if (fch == 1) 5 else 6} but first frame is P${if (ch == 1) 5 else 6}")
      frames += 1; sum += fsum; pos = next
    }
    if (frames == 0) fail(docId, "empty payload")
    if (mediaType == "image" && frames != 1)
      fail(docId, s"image payload carries $frames frames")
    MediaMeta(docId, mediaType, b.length.toLong, w.toLong, h.toLong, frames, sum)
  }

  /** Decode a canonical RIFF/WAVE PCM16 payload. One "frame" = one
    * 160-sample window (ceil; the generator always emits whole
    * windows). content_sum = Σ signed samples.
    */
  private def decodeWav(docId: Long, b: Array[Byte]): MediaMeta = {
    if (b.length < 44) fail(docId, s"WAV shorter than canonical header (${b.length} bytes)")
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII")
    }
    if (fourcc() != "RIFF") fail(docId, "no RIFF magic")
    val riffLen = buf.getInt()
    if (riffLen != b.length - 8) fail(docId, s"RIFF length $riffLen != ${b.length - 8}")
    if (fourcc() != "WAVE") fail(docId, "no WAVE form type")
    if (fourcc() != "fmt ") fail(docId, "missing fmt chunk")
    if (buf.getInt() != 16) fail(docId, "non-PCM fmt chunk size")
    val (fmt, channels) = (buf.getShort(), buf.getShort())
    if (fmt != 1 || channels != 1) fail(docId, s"unsupported fmt=$fmt channels=$channels")
    buf.getInt(); buf.getInt(); buf.getShort() // rate, byte rate, block align
    if (buf.getShort() != 16) fail(docId, "unsupported bits/sample")
    if (fourcc() != "data") fail(docId, "missing data chunk")
    val dataLen = buf.getInt()
    if (dataLen != b.length - 44) fail(docId, s"data length $dataLen != ${b.length - 44}")
    if (dataLen % 2 != 0) fail(docId, "odd PCM16 data length")
    val n = dataLen / 2
    var sum = 0L
    var i = 0
    while (i < n) { sum += buf.getShort(); i += 1 }
    MediaMeta(docId, "audio", b.length.toLong, 0L, 0L, (n + 159L) / 160L, sum)
  }

  /** The codec seam: sniff the container by magic bytes and parse.
    * `mediaType` distinguishes image (one frame expected) from video
    * (many); the byte format decides everything else.
    */
  def decode(docId: Long, mediaType: String, payload: Array[Byte]): MediaMeta =
    if (payload.length >= 4 && payload(0) == 'R' && payload(1) == 'I' &&
        payload(2) == 'F' && payload(3) == 'F') decodeWav(docId, payload)
    else decodeNetpbm(docId, mediaType, payload)

  /** Batch decode: partition-at-a-time over the payload column. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would go here (codec handles, model load)
        it.map { case (id, mt, bytes) => decode(id, mt, bytes) }
      }
  }

  /** x86 — 64-bit difference hash (dHash) of an image payload: the
    * perceptual fingerprint LAION-scale image dedup runs (two crops of
    * the same photo byte-differ everywhere yet dHash-match within a few
    * bits). REAL byte parsing — header via the same [[asciiInt]]
    * validation as [[netpbmFrame]], pixels read from the raster, no
    * doc_id shortcuts — then pure integer reduction so the oracle can
    * replay it arithmetically from the generator formula:
    *   gray = (r+g+b) div 3 for P6, the raw byte for P5;
    *   pixel (x,y) belongs to block (x·9 div w, y·8 div h) — the
    *   forward mapping keeps both engines' block membership trivially
    *   identical (no floor-boundary inversion);
    *   block mean = div of integer sums; bit(by,bx) = 1 iff
    *   mean(by,bx) < mean(by,bx+1); hash = Σ bit << (by·8+bx).
    * Requires w ≥ 9 and h ≥ 8 (every block nonempty) — smaller rasters
    * are rejected as malformed for this operator.
    */
  private def dhashOf(docId: Long, b: Array[Byte]): Long =
    dhashFrame(docId, b, 0)._1

  /** One frame's dHash starting at `pos0`; returns (hash, posAfter) so
    * [[videoFrameHashes]] can walk a multi-frame payload.
    */
  private def dhashFrame(docId: Long, b: Array[Byte], pos0: Int): (Long, Int) = {
    if (pos0 + 2 > b.length || b(pos0) != 'P')
      fail(docId, s"no Netpbm magic at byte $pos0")
    val ch = b(pos0 + 1) match {
      case '5' => 1
      case '6' => 3
      case c   => fail(docId, s"unsupported Netpbm type P${c.toChar}")
    }
    val (w, p1) = asciiInt(b, pos0 + 2, docId)
    val (h, p2) = asciiInt(b, p1, docId)
    val (maxval, p3) = asciiInt(b, p2, docId)
    if (maxval != 255) fail(docId, s"unsupported maxval $maxval")
    if (w < 9 || h < 8) fail(docId, s"raster ${w}x$h below the 9x8 dHash grid")
    if (p3 >= b.length || !(b(p3) == '\n' || b(p3) == ' ' || b(p3) == '\t' ||
        b(p3) == '\r')) fail(docId, "missing raster separator")
    val dataStart = p3 + 1
    if (dataStart + w.toLong * h * ch > b.length)
      fail(docId, "truncated raster")
    val sums = new Array[Long](72)
    val counts = new Array[Long](72)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 9 / w
        val base = dataStart + (y.toLong * w + x).toInt * ch
        val gray =
          if (ch == 3)
            ((b(base) & 0xff) + (b(base + 1) & 0xff) + (b(base + 2) & 0xff)) / 3
          else b(base) & 0xff
        sums(by * 9 + bx) += gray
        counts(by * 9 + bx) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var byi = 0
    while (byi < 8) {
      var bxi = 0
      while (bxi < 8) {
        val l = sums(byi * 9 + bxi) / counts(byi * 9 + bxi)
        val r = sums(byi * 9 + bxi + 1) / counts(byi * 9 + bxi + 1)
        if (l < r) hash |= 1L << (byi * 8 + bxi)
        bxi += 1
      }
      byi += 1
    }
    (hash, (dataStart + w.toLong * h * ch).toInt)
  }

  /** Per-frame dHash stream of a multi-frame Netpbm payload (video):
    * frames parsed back-to-back, the whole payload consumed.
    */
  private def videoFrameHashes(docId: Long, b: Array[Byte]): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = 0
    while (pos < b.length) {
      val (h, next) = dhashFrame(docId, b, pos)
      out += h
      pos = next
    }
    if (out.isEmpty) fail(docId, "empty payload")
    out.toSeq
  }

  /** x92 — video near-dup CLUSTER resolution by frame-fingerprint SET
    * overlap: two videos are near-dups when the Jaccard of their
    * per-frame dHash sets reaches `minJaccard` (shared-scene
    * detection — re-encodes and trims keep most frame fingerprints).
    * This is [[graft.ext.Dedup]]'s verified text machinery pointed at
    * frames: the (video, frame-hash) set is a hashed shingle set, the
    * document-frequency cap drops boilerplate frames (the
    * pre-registration probe measured the hottest frame hash shared by
    * 830 videos at 100× — 32.8M candidate pairs uncapped, the
    * black-frame analog of the boilerplate shingle), the
    * inverted-index Jaccard runs on the capped set, and
    * [[graft.ext.Dedup.resolveClusters]] emits the per-video
    * (doc_id, cluster_id, cluster_size, keep) contract. Registered in
    * cluster form only (the x86→x91 lesson).
    */
  def videoNearDupClusters(
      spark: SparkSession,
      docs: DataFrame,
      minJaccard: Double = 0.3,
      maxFrameDf: Int = 20): DataFrame =
    videoNearDupClustersFromPayload(spark,
      withPayload(docs.filter(mediaTypeCol(col("doc_id")) === "video"))
        .filter(col("media_type") === "video")
        .select(col("doc_id"), col("payload")),
      minJaccard, maxFrameDf)

  /** [[videoNearDupClusters]] over an explicit (doc_id, payload) frame
    * (the crafted-bytes seam).
    */
  def videoNearDupClustersFromPayload(
      spark: SparkSession,
      frame: DataFrame,
      minJaccard: Double = 0.3,
      maxFrameDf: Int = 20): DataFrame = {
    import spark.implicits._
    val sh = graft.tools.InternalCaches.persist(
      frame.select(col("doc_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, bytes) =>
          videoFrameHashes(id, bytes).map(h => (id, h))
        }
        .toDF("doc_id", "sh").distinct())
    val pairs = graft.ext.Dedup.ngramJaccardFromShingles(
        graft.ext.Dedup.capShingleDf(sh, maxFrameDf), minJaccard)
      .select("doc_a", "doc_b")
    // every parsed video has ≥1 frame row, so the persisted hash set is
    // also the video id universe — no second payload pass
    graft.ext.Dedup.resolveClusters(sh.select("doc_id").distinct(), pairs)
  }

  /** dHash over an explicit (doc_id, payload) frame — the seam real
    * image bytes (or crafted test rasters) enter through.
    */
  def dHashImagesFromPayload(spark: SparkSession, frame: DataFrame): DataFrame = {
    import spark.implicits._
    frame.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => (id, dhashOf(id, bytes)) })
      .toDF("doc_id", "dhash")
  }

  /** Per-image dHash frame: (doc_id, dhash) over the corpus's image
    * payloads — typed mapPartitions beside the rows, like [[decodeMeta]].
    */
  def dHashImages(spark: SparkSession, docs: DataFrame): DataFrame =
    dHashImagesFromPayload(spark,
      withPayload(docs.filter(mediaTypeCol(col("doc_id")) === "image"))
        .filter(col("media_type") === "image"))

  /** x86 pairs — near-duplicate images by dHash Hamming distance, found
    * via 5×13-bit chunk bucketing (the x05 SimHash shape). For
    * `maxHamming` ≤ 4 the bucketing is EXACT, not approximate: 4 bit
    * flips cannot touch all 5 chunks (pigeonhole), so every qualifying
    * pair shares at least one intact chunk and the bucket join is a
    * pure optimization over the all-pairs form (spec-gated). Chunks use
    * arithmetic shift + mask on both engines, so the top chunk's
    * sign-extension replica bit is identical by construction.
    * Output: (doc_a, doc_b, hamming).
    */
  def imageNearDupPairs(
      spark: SparkSession, docs: DataFrame, maxHamming: Int = 4): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 4,
      s"5x13-bit chunk bucketing is exact only for maxHamming <= 4 " +
        s"(pigeonhole over 5 chunks), got $maxHamming")
    val dh = dHashImages(spark, docs)
    val chunks = dh.select(col("doc_id"), col("dhash"),
        explode(sequence(lit(0), lit(4))).as("c"))
      .withColumn("chunk", expr("shiftright(dhash, c * 13) & 8191"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.dhash ^ b.dhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** x87 — image near-dup CLUSTER resolution, the scale path beside
    * x86's pair audit. The pair form's output is inherently quadratic
    * in duplicate-class sizes: the 100× decade probe measured it 30×
    * in decade 2, and the class-structure numbers explain why — 167k
    * images collapse to 8,339 distinct dHashes with identical-hash
    * classes up to 418 docs, so identical pairs ALONE are 2.5M rows.
    * This form works at the DISTINCT-HASH grain throughout: group docs
    * by dhash (one exchange, map-side combined), run the 5-chunk
    * bucket join over distinct hashes only (D², with D saturating as
    * the structured hash space fills — 8.3k at 100×, vs 167k docs),
    * connected-components over the hash-grain edges (tiny graph), and
    * map every document to its cluster through one dhash join. Output
    * is x19's contract — (doc_id, cluster_id, cluster_size, keep),
    * cluster_id = the cluster's lowest doc_id — O(docs) rows, never
    * O(pairs); downstream dedup is `filter(keep)`.
    */
  def imageNearDupClusters(
      spark: SparkSession, docs: DataFrame, maxHamming: Int = 4): DataFrame =
    hashGrainClusters(
      graft.tools.InternalCaches.persist(dHashImages(spark, docs)), maxHamming)

  /** The distinct-hash-grain cluster machinery shared by the image
    * (x87) and audio (x91) perceptual dedups: class aggregate, the
    * EXACT 5×13-bit chunk bucket join over distinct hashes only (D²
    * with D saturating as the structured hash space fills), connected
    * components over the hash-edge graph, one hash join back to
    * documents. `dh` = (doc_id, dhash), persisted by the caller (read
    * three times here). CC maxIter is raised over the 50-round default
    * (sized for sparse Jaccard cluster graphs): a structured
    * perceptual-hash space forms LONG Hamming chains — neighbors
    * differ by a few bits each, so components are paths thousands of
    * hashes long, and the 10× corpus graph genuinely needs more than
    * 50 label-propagation+halving rounds to drain.
    */
  private def hashGrainClusters(dh: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 4,
      s"5x13-bit chunk bucketing is exact only for maxHamming <= 4 " +
        s"(pigeonhole over 5 chunks), got $maxHamming")
    val classes = dh.groupBy("dhash").agg(min(col("doc_id")).as("class_rep"))
    val chunks = classes.select(col("dhash"),
        explode(sequence(lit(0), lit(4))).as("c"))
      .withColumn("chunk", expr("shiftright(dhash, c * 13) & 8191"))
    val edges = chunks.as("a")
      .join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.dhash") < col("b.dhash"))
      .select(col("a.dhash").as("doc_a"), col("b.dhash").as("doc_b"),
        expr("bit_count(a.dhash ^ b.dhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b")
    val hcc = graft.ext.Dedup.connectedComponents(edges, maxIter = 500)
      .select(col("doc_id").as("dhash"), col("cluster_id").as("hcluster"))
    val hashCluster = classes.join(hcc, Seq("dhash"), "left")
      .select(col("dhash"),
        coalesce(col("hcluster"), col("dhash")).as("hcluster"),
        col("class_rep"))
    val reps = hashCluster.groupBy("hcluster")
      .agg(min(col("class_rep")).as("cluster_id"))
    val docCluster = dh.join(hashCluster, Seq("dhash")).join(reps, Seq("hcluster"))
      .select(col("doc_id"), col("cluster_id"))
    val sizes = docCluster.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    docCluster.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("keep"))
  }

  /** x91 — 64-bit energy-envelope hash of a WAV payload: the audio
    * analog of [[dhashOf]] (a Shazam-style fingerprint reduced to its
    * deterministic core). REAL byte parsing — the same RIFF/fmt/data
    * validation as the metadata decoder, PCM16 samples read
    * little-endian — then pure integer reduction: energy = |sample|,
    * sample i belongs to block (i·65 div n) (65 blocks, forward
    * mapping), block mean = integer div of sums, bit b = 1 iff
    * mean(b) < mean(b+1), hash = Σ bit << b. Requires n ≥ 65 samples
    * (every block nonempty).
    */
  private def ahashOf(docId: Long, b: Array[Byte]): Long = {
    if (b.length < 44) fail(docId, s"WAV shorter than canonical header (${b.length} bytes)")
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII")
    }
    if (fourcc() != "RIFF") fail(docId, "no RIFF magic")
    val riffLen = buf.getInt()
    if (riffLen != b.length - 8) fail(docId, s"RIFF length $riffLen != ${b.length - 8}")
    if (fourcc() != "WAVE") fail(docId, "no WAVE form type")
    if (fourcc() != "fmt ") fail(docId, "missing fmt chunk")
    if (buf.getInt() != 16) fail(docId, "non-PCM fmt chunk size")
    val (fmt, channels) = (buf.getShort(), buf.getShort())
    if (fmt != 1 || channels != 1) fail(docId, s"unsupported fmt=$fmt channels=$channels")
    buf.getInt(); buf.getInt(); buf.getShort() // rate, byte rate, block align
    if (buf.getShort() != 16) fail(docId, "unsupported bits/sample")
    if (fourcc() != "data") fail(docId, "missing data chunk")
    val dataLen = buf.getInt()
    if (dataLen != b.length - 44) fail(docId, s"data length $dataLen != ${b.length - 44}")
    if (dataLen % 2 != 0) fail(docId, "odd PCM16 data length")
    val n = dataLen / 2
    if (n < 65) fail(docId, s"$n samples below the 65-block envelope grid")
    val sums = new Array[Long](65)
    val counts = new Array[Long](65)
    var i = 0
    while (i < n) {
      val blk = (i.toLong * 65 / n).toInt
      sums(blk) += math.abs(buf.getShort().toLong)
      counts(blk) += 1
      i += 1
    }
    var hash = 0L
    var bi = 0
    while (bi < 64) {
      if (sums(bi) / counts(bi) < sums(bi + 1) / counts(bi + 1))
        hash |= 1L << bi
      bi += 1
    }
    hash
  }

  /** aHash over an explicit (doc_id, payload) frame (the crafted-bytes
    * seam, like [[dHashImagesFromPayload]]).
    */
  def aHashAudioFromPayload(spark: SparkSession, frame: DataFrame): DataFrame = {
    import spark.implicits._
    frame.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => (id, ahashOf(id, bytes)) })
      .toDF("doc_id", "dhash")
  }

  def aHashAudio(spark: SparkSession, docs: DataFrame): DataFrame =
    aHashAudioFromPayload(spark,
      withPayload(docs.filter(mediaTypeCol(col("doc_id")) === "audio"))
        .filter(col("media_type") === "audio"))

  /** x91 — audio near-dup CLUSTER resolution over the energy-envelope
    * hash. REGISTERED ONLY in cluster form, by measurement made BEFORE
    * shipping (the x86 lesson applied proactively): the 100× corpus
    * probe shows 167k audio docs collapsing to 3,144 distinct hashes
    * with identical classes up to 429 docs — the pair form's output
    * would be 39.8M rows at Hamming ≤ 4, quadratic in class sizes.
    * Same shared machinery and contracts as [[imageNearDupClusters]].
    */
  def audioNearDupClusters(
      spark: SparkSession, docs: DataFrame, maxHamming: Int = 4): DataFrame =
    hashGrainClusters(
      graft.tools.InternalCaches.persist(aHashAudio(spark, docs)), maxHamming)

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
    * and oracle-checkable; the pixel resample would live in the same
    * typed batch seam as [[decode]]). A flatMap on the decoded Dataset:
    * one media row fans out to its sampled frames — rows multiply by
    * ≤ maxFrames BEFORE any shuffle, and downstream per-frame work
    * (embedding, hashing) parallelizes per frame. Rasterless media
    * (audio: width = height = 0) gets out_w = out_h = 0.
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
      val outW = if (longSide == 0) 0L else m.width * target / longSide
      val outH = if (longSide == 0) 0L else m.height * target / longSide
      (0L until m.n_frames by step)
        .map(i => FrameMeta(m.doc_id, m.media_type, i, outW, outH))
    }
  }

  /** Deterministic per-frame feature vector: dim `d` =
    * ((hash32("doc:frame:d") mod 2001) − 1000) / 1000 ∈ [−1, 1] — the
    * featurization STAND-IN (a real pipeline embeds pixels in the typed
    * batch seam; the md5-derived fake is oracle-reproducible). Built as
    * a flat `array()` of codegen'd expressions — no per-element lambda.
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
