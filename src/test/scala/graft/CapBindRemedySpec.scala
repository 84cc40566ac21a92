package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ext.{IndexFs, Similarity}

/** Round-17: the cap-bind remedy as ONE guarded verb (x139/x140) —
  * `retrainSemanticIfCapBound` / `ivfPqRetrainIfCapBound`. The
  * registered entries hash-gate the bound → retrain → cleared loop
  * against DuckDB; this spec pins the identities the oracle cannot
  * express: dryRun inertness, the quiet-alarm no-op, per-cap
  * independence at the compressed grain, and verdict invariance
  * (the verb ≡ the hand-composed audit → rebuild → re-audit it
  * replaces, bit-identical through the screens/searches).
  */
class CapBindRemedySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private def unit(axis: Int): Seq[Float] =
    Seq.tabulate(dim)(d => if (d == axis) 1.0f else 0.0f)
  private def embDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")
  private def byPhase(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("phase") -> r).toMap

  // ---- semantic grain --------------------------------------------------

  test("retrainSemanticIfCapBound dryRun: reports the decision (bound, " +
      "would-be cap) without touching the index") {
    val idx = Files.createTempDirectory("graft_remedy_dry").toString + "/idx"
    // modulus 1: all 4 vectors are eligible seeds; cap 2 binds
    Similarity.writeSemanticIndex(
      embDf((0L to 3L).map(i => i -> unit(i.toInt))), idx,
      centroidModulus = 1, maxCentroids = 2)
    val out = byPhase(Similarity.retrainSemanticIfCapBound(
      spark, idx, widenFactor = 2, dryRun = true))
    assert(out("before").getAs[Boolean]("cap_bound"), "alarm fires")
    assert(!out("before").getAs[Boolean]("acted"), "dryRun never acts")
    assert(out("after").getAs[Boolean]("cap_bound"),
      "after == before under dryRun")
    // max(cap×2, eligible) = max(4, 4) = 4 — the cap a retrain would stamp
    assert(out("before").getAs[Long]("new_cap") === 4L)
    // the live index is untouched: the audit still fires off the old stamp
    assert(Similarity.storedSemanticOccupancy(spark, idx)
      .head().getAs[Boolean]("cap_bound"))
  }

  test("retrainSemanticIfCapBound: quiet alarm is a no-op that reports " +
      "the current cap") {
    val idx = Files.createTempDirectory("graft_remedy_noop").toString + "/idx"
    Similarity.writeSemanticIndex(
      embDf((0L to 3L).map(i => i -> unit(i.toInt))), idx,
      centroidModulus = 1, maxCentroids = 8) // 4 eligible <= 8: quiet
    val stamp0 = IndexFs.readSmall(spark, s"$idx/_quantizer")
    val out = byPhase(Similarity.retrainSemanticIfCapBound(spark, idx))
    assert(!out("before").getAs[Boolean]("cap_bound"))
    assert(!out("before").getAs[Boolean]("acted"))
    assert(out("before").getAs[Long]("new_cap") === 8L,
      "no action proposed: new_cap reports the CURRENT cap")
    assert(IndexFs.readSmall(spark, s"$idx/_quantizer") === stamp0,
      "a quiet alarm must not rewrite the index")
  }

  test("retrainSemanticIfCapBound acts: alarm clears, and the verb is " +
      "bit-identical to the hand-composed wider-cap rebuild it replaces") {
    val root = Files.createTempDirectory("graft_remedy_act").toString
    val corpus = embDf((0L to 7L).map(i => i -> unit(i.toInt)))
    val idx1 = s"$root/verb"
    val idx2 = s"$root/hand"
    Similarity.writeSemanticIndex(corpus, idx1,
      centroidModulus = 1, maxCentroids = 2)
    Similarity.writeSemanticIndex(corpus, idx2,
      centroidModulus = 1, maxCentroids = 2)
    val out = byPhase(Similarity.retrainSemanticIfCapBound(
      spark, idx1, widenFactor = 2))
    assert(out("before").getAs[Boolean]("cap_bound"))
    assert(out("before").getAs[Boolean]("acted"))
    assert(!out("after").getAs[Boolean]("cap_bound"),
      s"the retrain clears the alarm: ${out("after")}")
    assert(out("after").getAs[Long]("new_cap") === 8L) // max(4, 8 eligible)
    // hand-composed remedy at the same widened cap on the twin index
    Similarity.rebuildSemanticIndex(spark, idx2,
      centroidModulus = 1, maxCentroids = 8)
    // verdict invariance: screens over both indexes are bit-identical
    val bench = embDf(Seq(100L -> unit(3), 101L -> unit(9)))
    def screen(idx: String) =
      Similarity.semanticScreenIndex(bench, idx, minCos = 0.4)
        .collect().map(_.toSeq).sortBy(_.toString)
    assert(screen(idx1) === screen(idx2),
      "the verb's rebuilt index screens identically to the hand-composed one")
  }

  // ---- IVF-PQ grain ----------------------------------------------------

  test("ivfPqRetrainIfCapBound: dryRun inert; acting clears BOTH alarms " +
      "and searches ≡ the hand-composed rebuild at the same widened caps") {
    val root = Files.createTempDirectory("graft_pq_remedy").toString
    val corpus = embDf((0L to 7L).map(i => i -> unit(i.toInt)))
    val idx1 = s"$root/verb"
    val idx2 = s"$root/hand"
    // modulus 1 → 8 coarse-eligible > cap 2; codeModulus 2 → 4
    // codebook-eligible > cap 1: BOTH alarms fire
    Seq(idx1, idx2).foreach { p =>
      Similarity.ivfPqWriteIndex(corpus, p, centroidModulus = 1,
        maxCentroids = 2, m = 16, codeModulus = 2, maxCodes = 1)
    }
    val dry = byPhase(Similarity.ivfPqRetrainIfCapBound(
      corpus, idx1, widenFactor = 2, dryRun = true))
    assert(dry("before").getAs[Boolean]("cap_bound") &&
      dry("before").getAs[Boolean]("code_cap_bound"))
    assert(!dry("before").getAs[Boolean]("acted"))
    assert(Similarity.ivfPqOccupancy(spark, idx1)
      .head().getAs[Boolean]("cap_bound"), "dryRun left the index alone")
    val out = byPhase(Similarity.ivfPqRetrainIfCapBound(
      corpus, idx1, widenFactor = 2))
    assert(out("before").getAs[Boolean]("acted"))
    assert(!out("after").getAs[Boolean]("cap_bound") &&
      !out("after").getAs[Boolean]("code_cap_bound"),
      s"both alarms clear: ${out("after")}")
    assert(out("after").getAs[Long]("new_cap") === 8L) // max(4, 8)
    assert(out("after").getAs[Long]("new_code_cap") === 4L) // max(2, 4)
    // hand-composed remedy on the twin
    Similarity.ivfPqRebuildIndex(corpus, idx2, centroidModulus = 1,
      maxCentroids = 8, m = 16, codeModulus = 2, maxCodes = 4)
    def search(idx: String) =
      Similarity.ivfPqSearchIndex(corpus, idx, queryIds = Seq(1L, 3L), k = 3)
        .collect().map(_.toSeq).sortBy(_.toString)
    assert(search(idx1) === search(idx2),
      "the verb's index searches identically to the hand-composed rebuild")
  }

  test("ivfPqRetrainIfCapBound widens ONLY the bound cap: a quiet coarse " +
      "cap is left untouched while the codebook cap widens") {
    val idx = Files.createTempDirectory("graft_pq_partial").toString + "/idx"
    val corpus = embDf((0L to 7L).map(i => i -> unit(i.toInt)))
    // coarse quiet (8 eligible <= cap 8); codebook bound (4 > 1)
    Similarity.ivfPqWriteIndex(corpus, idx, centroidModulus = 1,
      maxCentroids = 8, m = 16, codeModulus = 2, maxCodes = 1)
    val out = byPhase(Similarity.ivfPqRetrainIfCapBound(
      corpus, idx, widenFactor = 2))
    assert(!out("before").getAs[Boolean]("cap_bound") &&
      out("before").getAs[Boolean]("code_cap_bound"))
    assert(out("before").getAs[Boolean]("acted"),
      "one bound cap is enough to act")
    assert(out("after").getAs[Long]("new_cap") === 8L,
      "the quiet coarse cap is not widened")
    assert(out("after").getAs[Long]("new_code_cap") === 4L)
    assert(!out("after").getAs[Boolean]("code_cap_bound"))
  }

  test("ivfPqRetrainIfCapBound composes with takedowns: tombstones shrink " +
      "the audited eligibility and stay out of the retrained index") {
    val idx = Files.createTempDirectory("graft_pq_td").toString + "/idx"
    val corpus = embDf((0L to 7L).map(i => i -> unit(i.toInt)))
    Similarity.ivfPqWriteIndex(corpus, idx, centroidModulus = 1,
      maxCentroids = 2, m = 16, codeModulus = 2, maxCodes = 1)
    Similarity.deleteFromIvfPqIndex(Seq(6L).toDF("vec_id"), idx)
    // careless full hand-back: the rebuild must filter id 6 itself
    val out = byPhase(Similarity.ivfPqRetrainIfCapBound(
      corpus, idx, widenFactor = 2))
    assert(out("before").getAs[Long]("eligible_seeds") === 7L,
      "eligibility audits LIVE vectors only")
    assert(out("after").getAs[Long]("eligible_seeds") === 7L)
    assert(!out("after").getAs[Boolean]("cap_bound"))
    val ids = spark.read.parquet(s"$idx/codes")
      .select("vec_id").distinct().as[Long].collect().toSet
    assert(!ids.contains(6L), "the tombstoned vector stayed out")
    assert(!IndexFs.exists(spark, s"$idx/deletes"),
      "the swapped-in index starts clean")
  }

  // ---- ingest-time cap-bind (the verdict's item 6) ---------------------

  test("semantic ingest-time cap-bind: appends maintain the stamped " +
      "eligibility total; the probe flips the moment it crosses; a " +
      "rebuild recomputes exactly") {
    val idx = Files.createTempDirectory("graft_ingest_bind").toString + "/idx"
    // seeds 0 and 100 exactly fill cap 2 — not yet bound
    Similarity.writeSemanticIndex(
      embDf(Seq(0L -> unit(0), 100L -> unit(1), 7L -> unit(2))), idx,
      centroidModulus = 100, maxCentroids = 2)
    assert(Similarity.semanticIngestCapBind(spark, idx) === Some(false))
    // a non-eligible append does not move the total
    Similarity.appendSemanticIndex(embDf(Seq(8L -> unit(3))), idx)
    assert(Similarity.semanticIngestCapBind(spark, idx) === Some(false))
    // the eligible append crosses the cap AT INGEST — no layout scan ran
    Similarity.appendSemanticIndex(embDf(Seq(200L -> unit(4))), idx)
    assert(Similarity.semanticIngestCapBind(spark, idx) === Some(true))
    // the scan audit agrees (the probe is the cheap mirror of it)
    val occ = Similarity.storedSemanticOccupancy(spark, idx).head()
    assert(occ.getAs[Long]("eligible_seeds") === 3L &&
      occ.getAs[Boolean]("cap_bound"))
    // the remedy recomputes the total exactly and clears the probe
    Similarity.rebuildSemanticIndex(spark, idx, maxCentroids = 16)
    assert(Similarity.semanticIngestCapBind(spark, idx) === Some(false))
  }

  test("IVF-PQ ingest-time cap-bind: both totals maintained per append; " +
      "the probe reports each cap independently") {
    val idx = Files.createTempDirectory("graft_pq_ingest").toString + "/idx"
    // coarse: seeds % 4 — ids 0,4 fill cap 2; code: % 2 — ids 0,2,4 of
    // 5 vectors, cap 8 comfortably quiet
    Similarity.ivfPqWriteIndex(
      embDf(Seq(0L -> unit(0), 4L -> unit(1), 1L -> unit(2),
        2L -> unit(3), 3L -> unit(4))), idx,
      centroidModulus = 4, maxCentroids = 2, m = 16,
      codeModulus = 2, maxCodes = 8)
    assert(Similarity.ivfPqIngestCapBind(spark, idx) === Some((false, false)))
    // id 8 is coarse-eligible (8 % 4 == 0) AND code-eligible (8 % 2 == 0):
    // the coarse cap crosses (3 > 2), the code cap stays quiet (4 <= 8)
    Similarity.ivfPqAppendIndex(embDf(Seq(8L -> unit(5))), idx)
    assert(Similarity.ivfPqIngestCapBind(spark, idx) === Some((true, false)))
    val occ = Similarity.ivfPqOccupancy(spark, idx).head()
    assert(occ.getAs[Boolean]("cap_bound") &&
      !occ.getAs[Boolean]("code_cap_bound"),
      s"the scan audit agrees with the ingest probe: $occ")
  }
}
