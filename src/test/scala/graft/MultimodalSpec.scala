package graft

import graft.ext.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("decode parses a hand-crafted PGM (P5) — not the generator's output") {
    // "P5\n3 2\n255\n" + 6 gray bytes 10,20,30,40,50,60
    val bytes = "P5\n3 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    val m = Multimodal.decode(99L, "image", bytes)
    assert(m.width === 3L && m.height === 2L && m.n_frames === 1L)
    assert(m.payload_bytes === bytes.length.toLong)
    assert(m.content_sum === 210L)
  }

  test("decode parses a hand-crafted two-frame P6 video and high-bit pixels") {
    // two 1x1 RGB frames; pixel bytes > 127 must read unsigned
    val frame = "P6\n1 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](-1, 0, -128) // 255, 0, 128 unsigned
    val m = Multimodal.decode(7L, "video", frame ++ frame)
    assert(m.n_frames === 2L && m.width === 1L && m.height === 1L)
    assert(m.content_sum === 2L * (255 + 0 + 128))
  }

  test("decode parses a hand-crafted WAV with negative samples") {
    // canonical 44-byte header + 3 samples: -5, 7, -2
    val buf = java.nio.ByteBuffer.allocate(50)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(42).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes).putInt(6)
      .putShort(-5).putShort(7).putShort(-2)
    val m = Multimodal.decode(42L, "audio", buf.array())
    assert(m.media_type === "audio" && m.width === 0L && m.height === 0L)
    assert(m.n_frames === 1L) // 3 samples → one (partial) 160-sample window
    assert(m.content_sum === 0L)
  }

  test("malformed payloads are rejected, not silently misdecoded") {
    val pgm = "P5\n3 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4, 5, 6)
    // truncated raster
    intercept[IllegalArgumentException] {
      Multimodal.decode(1L, "image", pgm.dropRight(1))
    }
    // trailing garbage after the last frame (parsed as a bad next frame)
    intercept[IllegalArgumentException] {
      Multimodal.decode(1L, "image", pgm :+ 'X'.toByte)
    }
    // unsupported Netpbm flavor
    intercept[IllegalArgumentException] {
      Multimodal.decode(1L, "image", "P4\n3 2\n255\n".getBytes("US-ASCII"))
    }
    // WAV whose declared data chunk disagrees with the actual bytes
    val wav = Multimodal.makeWavPayload(1L)
    intercept[IllegalArgumentException] {
      Multimodal.decode(1L, "audio", wav.dropRight(2))
    }
    // Int-wrap headers: a width that wraps to a negative dataLen once
    // spun the frame loop forever (posAfter = 0); a 65536x65536 header
    // whose w*h*ch wraps to 0 was accepted with zero raster bytes —
    // both must reject via the 2^20 dimension cap / Long raster math
    intercept[IllegalArgumentException] {
      Multimodal.decode(1L, "image", "P5\n4294967276 1\n255\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decode(1L, "image", "P5\n65536 65536\n255\n".getBytes("US-ASCII"))
    }
    // degenerate zero-size dimensions are malformed, not empty frames
    intercept[IllegalArgumentException] {
      Multimodal.decode(1L, "image", "P5\n0 3\n255\n".getBytes("US-ASCII"))
    }
    // a video mixing channel counts (a P6 frame whose magic corrupted
    // to P5 keeps the dims but consumes w·h instead of 3·w·h bytes)
    val p6 = "P6\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4, 5, 6)
    val p5 = "P5\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2)
    intercept[IllegalArgumentException] {
      Multimodal.decode(1L, "video", p6 ++ p5)
    }
    // an image payload carrying more than one frame violates its type
    intercept[IllegalArgumentException] {
      Multimodal.decode(1L, "image", p6 ++ p6)
    }
    assert(Multimodal.decode(1L, "video", p6 ++ p6).n_frames === 2L)
  }

  test("generator round-trip: decoded metadata matches the encoding parameters") {
    for (id <- 0L to 20L) {
      val m = Multimodal.decode(id, Multimodal.mediaTypeOf(id), Multimodal.makePayload(id))
      Multimodal.mediaTypeOf(id) match {
        case "audio" =>
          assert(m.width === 0L && m.height === 0L)
          assert(m.n_frames === (id % 25 + 1))
          assert(m.payload_bytes === 44L + Multimodal.audioSamples(id) * 2L)
        case mt =>
          assert(m.width === Multimodal.rasterW(id).toLong)
          assert(m.height === Multimodal.rasterH(id).toLong)
          assert(m.n_frames === (if (mt == "image") 1L else Multimodal.videoFrames(id).toLong))
      }
      // independent checksum: recompute from the generator's formulas
      val expectSum =
        if (Multimodal.mediaTypeOf(id) == "audio")
          (0 until Multimodal.audioSamples(id)).map(i => (id * 7 + i * 13L) % 2003 - 1001).sum
        else {
          val n = m.n_frames * m.width * m.height * Multimodal.rasterCh(id)
          (0L until n).map(i => (id + i) % 251).sum
        }
      assert(m.content_sum === expectSum, s"content_sum for doc $id")
    }
  }

  test("payload column carries real container bytes; metadata batch-decodes per partition") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val withP = Multimodal.withPayload(docs)
    val row = withP.orderBy("doc_id").first()
    val payload = row.getAs[Array[Byte]]("payload")
    // doc 0 is an even image doc → P6 magic on the wire
    assert(payload(0) === 'P'.toByte && payload(1) === '6'.toByte)

    val meta = Multimodal.decodeMeta(spark, docs).collect()
    assert(meta.length === 50)
    val m0 = meta.find(_.doc_id == 0L).get
    assert(m0.media_type === "image" && m0.n_frames === 1L)
    assert(m0.width === 16L && m0.height === 12L)
    assert(m0.payload_bytes === payload.length.toLong)
    val m1 = meta.find(_.doc_id == 1L).get
    assert(m1.media_type === "audio" && m1.n_frames === 2L)
  }

  // ---- byte-mutation fuzzing ------------------------------------------
  // The codec's contract under corruption: a mutated payload either
  // raises the documented IllegalArgumentException or decodes to the
  // SAME STRUCTURE (media_type, dims, frames, byte count) — a mutation
  // may legitimately change content_sum (raster/sample bytes carry no
  // redundancy), but it must never silently change what the payload
  // structurally IS. The generator's pixel stream is consecutive mod
  // 251, so a mid-raster position can never fake a frame magic ('P'
  // would have to be followed by '5'/'6', but consecutive bytes are
  // v, v+1) — which makes the reject-or-same-structure dichotomy exact
  // for these corpora, not just overwhelmingly likely.

  private def structure(m: graft.ext.Multimodal.MediaMeta) =
    (m.media_type, m.width, m.height, m.n_frames, m.payload_bytes)

  private val genDoc: org.scalacheck.Gen[Long] =
    org.scalacheck.Gen.choose(0L, 5000L)

  private def checkProp(prop: org.scalacheck.Prop): Unit = {
    import org.scalacheck.{Test => SCTest}
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  test("fuzz: any single-byte substitution rejects or keeps the structure") {
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      id <- genDoc
      payload = Multimodal.makePayload(id)
      idx <- Gen.choose(0, payload.length - 1)
      b <- Gen.choose(0, 255).map(_.toByte) if b != payload(idx)
    } yield (id, payload, idx, b)
    checkProp(Prop.forAll(gen) { case (id, payload, idx, b) =>
      val mt = Multimodal.mediaTypeOf(id)
      val orig = Multimodal.decode(id, mt, payload)
      val mut = payload.clone(); mut(idx) = b
      try structure(Multimodal.decode(id, mt, mut)) ==
        (structure(orig)._1, orig.width, orig.height, orig.n_frames,
          orig.payload_bytes)
      catch { case _: IllegalArgumentException => true }
    })
  }

  test("fuzz: truncation rejects everywhere except video frame boundaries") {
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      id <- genDoc
      payload = Multimodal.makePayload(id)
      cut <- Gen.choose(0, payload.length - 1)
    } yield (id, payload, cut)
    checkProp(Prop.forAll(gen) { case (id, payload, cut) =>
      val mt = Multimodal.mediaTypeOf(id)
      val headerLen = s"P${if (Multimodal.rasterCh(id) == 3) 6 else 5}\n${
        Multimodal.rasterW(id)} ${Multimodal.rasterH(id)}\n255\n".length
      val frameLen = headerLen +
        Multimodal.rasterW(id) * Multimodal.rasterH(id) * Multimodal.rasterCh(id)
      val truncated = payload.take(cut)
      try {
        val m = Multimodal.decode(id, mt, truncated)
        // only a video cut at a whole-frame boundary may parse — and
        // then it must parse as exactly the surviving frames
        mt == "video" && cut > 0 && cut % frameLen == 0 &&
          m.n_frames == cut / frameLen && m.payload_bytes == cut.toLong
      } catch { case _: IllegalArgumentException => true }
    })
  }

  test("fuzz: length-field lies in the WAV header always reject") {
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      id <- genDoc
      field <- Gen.oneOf(4, 40) // riffLen, dataLen offsets
      delta <- Gen.choose(-1000, 1000) if delta != 0
    } yield (id, field, delta)
    checkProp(Prop.forAll(gen) { case (id, field, delta) =>
      val wav = Multimodal.makeWavPayload(id)
      val buf = java.nio.ByteBuffer.wrap(wav)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putInt(field, buf.getInt(field) + delta)
      Prop.throws(classOf[IllegalArgumentException]) {
        Multimodal.decode(id, "audio", wav)
      }
    })
  }

  test("fuzz: dimension lies in the Netpbm header always reject") {
    import org.scalacheck.{Gen, Prop}
    // rebuild the header with a lying height (inflated → truncated
    // raster; deflated → leftover bytes that cannot start a frame;
    // zero → degenerate), keeping the original raster bytes
    val gen = for {
      id <- genDoc.map(i => i - i % 3) // force an image doc (id % 3 == 0)
      lie <- Gen.oneOf("x10", "minus1", "zero")
    } yield (id, lie)
    checkProp(Prop.forAll(gen) { case (id, lie) =>
      val payload = Multimodal.makeNetpbmPayload(id, 1)
      val w = Multimodal.rasterW(id); val h = Multimodal.rasterH(id)
      val magic = if (Multimodal.rasterCh(id) == 3) "P6" else "P5"
      val headerLen = s"$magic\n$w $h\n255\n".length
      val badH = lie match {
        case "x10" => h * 10L
        case "minus1" => (h - 1).toLong
        case _ => 0L
      }
      val lied = s"$magic\n$w $badH\n255\n".getBytes("US-ASCII") ++
        payload.drop(headerLen)
      // rasterH is always >= 12, so every lie (including minus1) must
      // land in the reject path
      Prop.throws(classOf[IllegalArgumentException]) {
        Multimodal.decode(id, "image", lied)
      }
    })
  }

  test("dHash: hand-crafted 9x8 PGM gives the hand-derived bit pattern") {
    // 9x8 raster, one pixel per block: row y = [0,10,0,10,...] alternating
    // ascending steps so bit(by,bx) = (left < right): columns alternate
    // 0,10,0,10,0,10,0,10,0 → bits 1,0,1,0,1,0,1,0 per row, all rows.
    val row = Array[Byte](0, 10, 0, 10, 0, 10, 0, 10, 0)
    val bytes = "P5\n9 8\n255\n".getBytes("US-ASCII") ++
      Array.fill(8)(row).flatten
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((42L, "image", bytes)).toDF("doc_id", "media_type", "payload")
    // one pixel per block: bit(by,bx) = 1 iff col bx even (0 < 10);
    // odd bx compares 10 > 0 → 0
    val expected = (0 until 8).map { by =>
      (0 until 8).filter(bx => bx % 2 == 0).map(bx => 1L << (by * 8 + bx)).sum
    }.sum
    val got = graft.ext.Multimodal.dHashImagesFromPayload(spark, df)
      .select("dhash").as[Long].head()
    assert(got === expected,
      f"dhash 0x$got%016x != expected 0x$expected%016x")
  }

  test("dHash pairs: chunk bucketing is EXACT at maxHamming <= 4 (pigeonhole)") {
    val docs = Tables.load(spark, sf, "documents")
    val spark2 = spark
    import spark2.implicits._
    val dh = Multimodal.dHashImages(spark, docs)
      .as[(Long, Long)].collect()
    assert(dh.nonEmpty)
    // brute-force all pairs
    val brute = (for {
      (a, ha) <- dh; (b, hb) <- dh if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 4
    } yield (a, b, d.toLong)).toSet
    val bucketed = Multimodal.imageNearDupPairs(spark, docs, maxHamming = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(bucketed === brute,
      s"bucketed ${bucketed.size} pairs != brute ${brute.size}")
  }

  test("dHash clusters: pair endpoints co-cluster, identical hashes co-cluster, " +
    "the representative is the cluster's min id") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val clusters = Multimodal.imageNearDupClusters(spark, docs)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(clusters.nonEmpty)
    val cmap = clusters.map(r => r._1 -> r._2).toMap
    // every x86 near-dup pair must land in one cluster (clusters are the
    // transitive closure of the pair relation)
    val pairs = Multimodal.imageNearDupPairs(spark, docs)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, _) =>
      assert(cmap(a) === cmap(b), s"pair ($a,$b) split across clusters")
    }
    // identical hashes must co-cluster
    val byHash = Multimodal.dHashImages(spark, docs)
      .as[(Long, Long)].collect().groupBy(_._2)
    byHash.values.filter(_.length > 1).foreach { ms =>
      assert(ms.map(m => cmap(m._1)).distinct.length === 1)
    }
    // representative invariants: min id, exactly one keep, sizes consistent
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid)
      assert(members.count(_._4) === 1 && members.find(_._4).get._1 === cid)
      assert(members.forall(_._3 == members.length))
    }
  }

  test("aHash: hand-crafted WAV gives the hand-derived envelope bits; " +
    "negative samples count by magnitude") {
    // 130 samples = 65 blocks of 2; even blocks hold 0s, odd blocks
    // hold -10s (abs → 10), so bit b = (even b: 0 < 10 → 1, odd: 0)
    val n = 130
    val buf = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    (0 until n).foreach { i =>
      buf.putShort(if ((i / 2) % 2 == 0) 0 else -10)
    }
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((5L, "audio", buf.array())).toDF("doc_id", "media_type", "payload")
    val expected = (0 until 64).filter(_ % 2 == 0).map(1L << _).sum
    val got = Multimodal.aHashAudioFromPayload(spark, df)
      .select("dhash").as[Long].head()
    assert(got === expected, f"ahash 0x$got%016x != expected 0x$expected%016x")
  }

  test("aHash clusters: identical hashes co-cluster and reps are min ids") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val clusters = Multimodal.audioNearDupClusters(spark, docs)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(clusters.nonEmpty)
    val cmap = clusters.map(r => r._1 -> r._2).toMap
    val byHash = Multimodal.aHashAudio(spark, docs)
      .as[(Long, Long)].collect().groupBy(_._2)
    byHash.values.filter(_.length > 1).foreach { ms =>
      assert(ms.map(m => cmap(m._1)).distinct.length === 1)
    }
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid)
      assert(members.count(_._4) === 1)
    }
  }

  test("video clusters: a trimmed copy joins its source by frame-set Jaccard; " +
    "disjoint videos stay singletons") {
    val spark2 = spark
    import spark2.implicits._
    // craft 9x8 P5 frames with distinct patterns (multiplicative steps
    // give different block means, so different dHashes)
    def frame(step: Int): Array[Byte] =
      "P5\n9 8\n255\n".getBytes("US-ASCII") ++
        Array.tabulate(72)(i => ((i * step) % 200).toByte)
    val (a, b, c) = (frame(3), frame(7), frame(11))
    val docs = Seq(
      (2L, a ++ b ++ c), // full video: frame set {A,B,C}
      (5L, a ++ b), // trimmed copy: J({A,B,C},{A,B}) = 2/3 ≥ 0.3
      (8L, c ++ c), // one distinct frame: J with doc 2 = 1/3 ≥ 0.3
      (11L, frame(13) ++ frame(17)) // disjoint frame set
    ).toDF("doc_id", "payload")
    val out = Multimodal.videoNearDupClustersFromPayload(spark, docs,
        minJaccard = 0.3, maxFrameDf = 20)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // 2, 5 and 8 form one cluster (5 and 8 connect through 2), rep = 2
    assert(out(2L) === ((2L, 3L, true)))
    assert(out(5L) === ((2L, 3L, false)))
    assert(out(8L) === ((2L, 3L, false)))
    // 11 is its own singleton
    assert(out(11L) === ((11L, 1L, true)))
  }

  test("video clusters: fixture corpus — members share capped frame hashes, " +
    "reps are min ids, universe covers every video") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val out = Multimodal.videoNearDupClusters(spark, docs)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    // universe: every video doc (doc_id % 3 == 2 by the generator)
    val expectedVids = docs.select("doc_id").as[Long].collect()
      .filter(_ % 3 == 2).toSet
    assert(out.map(_._1).toSet === expectedVids)
    out.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid)
      assert(members.count(_._4) === 1)
      assert(members.forall(_._3 == members.length))
    }
  }

  test("dHash: rasters below the 9x8 grid are rejected as malformed") {
    val tiny = "P5\n4 3\n255\n".getBytes("US-ASCII") ++ Array.fill(12)(1.toByte)
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((13L, "image", tiny)).toDF("doc_id", "media_type", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      graft.ext.Multimodal.dHashImagesFromPayload(spark, df).collect()
    }
    assert(e.getMessage.contains("dHash grid") ||
      Option(e.getCause).exists(_.getMessage.contains("dHash grid")))
  }
}
