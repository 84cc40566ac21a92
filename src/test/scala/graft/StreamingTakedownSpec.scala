package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, LanguageModel, Similarity}

/** Takedown ↔ streaming-gate interaction (round 16 — the verdict's
  * insurance item): the ingest-gate replays (x114 near-dup, x115
  * semantic, x121 DSIR) read their stored indexes per micro-batch, so
  * a right-to-be-forgotten request landing BETWEEN batches must be
  * honored at the very next batch's read — the tombstone anti-join
  * (or negated-count retraction) composes with the streaming path's
  * per-batch screens, and the memoized-screen invalidation the delete
  * verbs perform ([[graft.tools.InternalCaches.releaseByPath]]) must
  * fire on that path too. No engine change expected; these specs pin
  * the subtlest cache/date path the engine has.
  */
class StreamingTakedownSpec extends SparkSpec {
  import spark.implicits._

  test("x114 path: a near-dup tombstone landing mid-stream un-gates the " +
      "next batch, and the batch after that re-gates off the live re-copy") {
    // doc_id % 4 is the batch id; every doc carries the same text, so
    // each batch's verdict depends exactly on which COPIES are live
    val docs = Seq(
      (0L, "a b c d e f g h"), // batch 0 — bootstrap (builds the index)
      (1L, "a b c d e f g h"), // batch 1 — exact-dups 0, then appends
      (2L, "a b c d e f g h"), // batch 2 — screens AFTER the takedown
      (3L, "a b c d e f g h")  // batch 3 — doc 2 is live again by now
    ).toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft_std_nd").toString
    val out = graft.streaming.DocStream.nearDupScreenReplay(spark, docs,
      s"$root/index", s"$root/out", nBatches = 4, n = 3, minJaccard = 0.5,
      betweenBatches = b =>
        // the request names BOTH live copies (1 was appended by its own
        // batch) — deleting only one must keep the gate (TakedownSpec's
        // shared-hash rule), so this is the full-retirement case
        if (b == 1)
          Dedup.deleteFromNearDupIndex(
            Seq(0L, 1L).toDF("doc_id"), s"$root/index"))
    val verdicts = out.collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(verdicts(1L) === "drop_exact",
      "pre-takedown, the batch-1 copy gates against the bootstrap copy")
    assert(verdicts(2L) === "keep",
      "the tombstones landed between batches 1 and 2 — batch 2's screen " +
        "must read them (the deleted content is forgotten)")
    assert(verdicts(3L) === "drop_exact",
      "batch 2's kept copy appended live again — batch 3 re-gates on it, " +
        "not on the tombstoned history")
  }

  test("x115 path: a semantic tombstone landing mid-stream stops the next " +
      "batch's contamination match; the batch after re-matches the live copy") {
    val dim = 64
    def unit(axis: Int): Seq[Float] =
      Seq.tabulate(dim)(d => if (d == axis) 1.0f else 0.0f)
    // vec_id % 4 is the batch id; vec 0 is also the (sole) centroid
    // seed (vec_id % 100 == 0), frozen at the batch-0 bootstrap
    val emb = Seq(
      0L -> unit(0), // batch 0 — bootstrap (index + frozen centroid)
      1L -> unit(0), // batch 1 — matches 0 (cos 1.0), then appends
      2L -> unit(0), // batch 2 — screens AFTER the takedown
      3L -> unit(0)  // batch 3 — vec 2 is live again by now
    ).toDF("vec_id", "embedding")
    val root = Files.createTempDirectory("graft_std_sem").toString
    val out = graft.streaming.DocStream.vecScreenReplay(spark, emb,
      s"$root/index", s"$root/out", nBatches = 4, minCos = 0.99,
      betweenBatches = b =>
        if (b == 1)
          Similarity.deleteFromSemanticIndex(
            Seq(0L, 1L).toDF("vec_id"), s"$root/index"))
    val contaminated = out.collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(contaminated(1L),
      "pre-takedown, batch 1 matches the bootstrap vector")
    assert(!contaminated(2L),
      "batch 2's screen must anti-join the tombstones written between " +
        "batches — the deleted vectors cannot contaminate")
    assert(contaminated(3L),
      "batch 2's vector appended live — batch 3 matches it, so the gate " +
        "keeps working after the takedown")
  }

  test("x103 path: a gram-index takedown (filtered rebuild) landing " +
      "mid-stream un-flags the removed corpus's spans at the next batch; " +
      "the batch after re-flags off the freshly appended live grams") {
    // doc_id % 4 is the batch id (k = 3 grams)
    val docs = Seq(
      (0L, "a1 a2 a3 a4"),                // batch 0 — bootstrap corpus
      (1L, "b1 b2 b3 b4"),                // batch 1 — clean, appends
      (2L, "a1 a2 a3 z1 b1 b2 b3"),       // batch 2 — screens POST-takedown
      (3L, "a1 a2 a3 q1 q2")              // batch 3 — doc 2's grams are live
    ).toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft_std_gram").toString
    val idx = s"$root/index"
    val out = graft.streaming.DocStream.spanScreenReplay(spark, docs,
      idx, s"$root/out", nBatches = 4, k = 3,
      betweenBatches = b =>
        // the takedown names doc 0; at this grain the verb IS the
        // filtered rebuild over the remaining ingested corpus (doc 1)
        if (b == 1)
          Dedup.takedownGramIndex(
            docs.filter(col("doc_id") === 1L), idx, k = 3))
    val spans = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch 1: doc 1 shares no gram with the bootstrap — no rows.
    // batch 2: doc 2's "a1 a2 a3" span must NOT flag (doc 0 forgotten);
    // its "b1 b2 b3" span (positions 4..7) flags off live doc 1.
    // batch 3: doc 3's "a1 a2 a3" DOES flag — batch 2 appended doc 2's
    // grams, so the content is live again via a surviving document.
    assert(spans === Set((2L, 4L, 7L), (3L, 0L, 3L)),
      s"mid-stream rebuild honored at the next batch: $spans")
  }

  test("x103 path + ledger: a takedown REQUEST landing mid-stream is NOT " +
      "yet effective (the at-drain contract, observed live); the drain a " +
      "batch later un-flags, and a surviving re-copy re-flags") {
    // doc_id % 4 is the batch id (k = 3 grams)
    val docs = Seq(
      (0L, "a1 a2 a3 a4"), // batch 0 — bootstrap corpus
      (1L, "a1 a2 a3 p1"), // batch 1 — screens while the REQUEST pends
      (2L, "a1 a2 a3 y1"), // batch 2 — screens POST-drain
      (3L, "a1 a2 a3 z1")  // batch 3 — doc 2's grams are live again
    ).toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft_std_ledger").toString
    val idx = s"$root/index"
    val out = graft.streaming.DocStream.spanScreenReplay(spark, docs,
      idx, s"$root/out", nBatches = 4, k = 3,
      betweenBatches = b => {
        // the request lands BEFORE batch 1 screens: removal is
        // effective at the DRAIN, so batch 1 must still flag
        if (b == 0)
          Dedup.requestGramTakedown(Seq(0L).toDF("doc_id"), idx)
        // the second request + the drain land before batch 2; the
        // hand-back is carelessly the FULL ingested corpus — the drain
        // applies its own ledger filter
        if (b == 1) {
          Dedup.requestGramTakedown(Seq(1L).toDF("doc_id"), idx)
          assert(Dedup.drainGramTakedowns(
            docs.filter(col("doc_id") <= 1L), idx, k = 3),
            "pending requests must drain")
        }
      })
    val spans = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch 1: doc 0's grams are STILL live (request ≠ drain) — flags.
    // batch 2: both requested docs drained — clean.
    // batch 3: doc 2's append made the content live again — flags.
    assert(spans === Set((1L, 0L, 3L), (3L, 0L, 3L)),
      s"the ledger's at-drain contract under streaming ingest: $spans")
  }

  test("x121 path: an LM retraction landing mid-stream re-scores the next " +
      "batches bit-identically to raw models that never saw the deleted docs") {
    // doc_id % 4 is the batch id; batch 1 carries distinctive vocabulary
    // whose retraction must change (and exactly reproduce) later scores
    val docs = Seq(
      (0L, "the cat sat on the mat the cat sat", "en"),
      (4L, "the dog sat on the mat the dog ran", "en"),
      (1L, "zebras graze quietly zebras graze calmly zebras doze", "en"),
      (5L, "the cat ran on the mat quietly today", "en"),
      (2L, "the cat sat on the mat zebras graze", "en"),
      (6L, "the dog ran on the mat the cat sat", "en"),
      (3L, "the dog sat quietly on the mat today", "en"),
      (7L, "the cat sat on the mat the dog ran", "en")
    ).toDF("doc_id", "text", "lang")
    val target = Seq(
      (100L, "the cat sat on the mat quietly", "en"),
      (101L, "the dog ran on the mat today", "en")
    ).toDF("doc_id", "text", "lang")
    def batch(b: Int) = docs.filter(pmod(col("doc_id"), lit(4L)) === b.toLong)
    val root = Files.createTempDirectory("graft_std_dsir").toString
    val out = graft.streaming.DocStream.dsirReplay(spark, docs, target,
      s"$root/index", s"$root/out", nBatches = 4, minCount = 1L,
      betweenBatches = b =>
        // the takedown hands back batch 1's documents; negated counts
        // append under one batch id (the x128 contract)
        if (b == 1)
          LanguageModel.deleteFromLmIndex(batch(1), s"$root/index/raw", "del1"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val got = out.collect().map(_.toSeq).toSet
    // reference raw models that NEVER contained batch 1: batch 2 scored
    // against batch 0 alone; batch 3 against batches 0 + 2
    val ref2 = Files.createTempDirectory("graft_std_dsir_r2").toString
    LanguageModel.writeLmIndex(batch(0), ref2)
    val ref3 = Files.createTempDirectory("graft_std_dsir_r3").toString
    LanguageModel.writeLmIndex(batch(0).unionByName(batch(2)), ref3)
    // batch 1 itself scored pre-takedown, against the batch-0 raw model
    val want =
      rows(LanguageModel.dsirAgainstLmIndexes(batch(1),
        s"$root/index/target", ref2, minCount = 1L)) ++
      rows(LanguageModel.dsirAgainstLmIndexes(batch(2),
        s"$root/index/target", ref2, minCount = 1L)) ++
      rows(LanguageModel.dsirAgainstLmIndexes(batch(3),
        s"$root/index/target", ref3, minCount = 1L))
    assert(got === want,
      "post-retraction batches must score bit-identically to raw models " +
        "trained without the deleted documents")
  }
}
