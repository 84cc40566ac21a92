package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Statistical language-model fluency scoring — the CCNet-style
  * perplexity filter (Wenzek et al. 2020, arXiv:1911.00359): train an
  * n-gram LM per language, score every document by its per-token
  * log-probability, and partition each language into head / middle /
  * tail fluency buckets. The reference has no LM stage; this is the
  * pretraining-pipeline extension (SURVEY.md §2.11 family) — the
  * standard quality gate between heuristic filters (x10/x76) and
  * model-based selection.
  *
  * Design for cross-engine parity (the house rule
  * [[TextAnalysis.collocationLift]] documents — no libm value may
  * cross a row boundary as a double):
  *   - each bigram's smoothed probability is ONE exact-integer
  *     division, bit-identical everywhere;
  *   - its log is immediately fixed-pointed — `floor(1e6·ln p)` as
  *     BIGINT — so the per-document aggregate is an INTEGER sum,
  *     immune to float summation order across partitions/engines
  *     (a double `sum` would hash-diverge on reduction order alone);
  *   - the only doubles in the output are per-row ratios of those
  *     integers, rounded to 6 dp.
  * The one libm call (`ln`) happens on bit-identical arguments in
  * both engines and only its 1e-6-floored image is kept — a flip
  * needs the engines' `ln` to disagree ACROSS a floor boundary
  * (width ~1 ulp against a 1e-6 grid), verified stable by the round
  * gate every round.
  *
  * Scale shape: two corpus passes, exactly like production CCNet
  * (a train pass and a score pass). The count tables are
  * vocabulary-sized, not corpus-sized, and `minCount` prunes the
  * hapax tail BEFORE the scoring join — Zipf: the tail IS the table,
  * so the pruned LM is small enough to broadcast at any corpus size
  * while unseen/pruned bigrams fall back to the add-one floor. The
  * per-doc aggregation has map-side partial combines; the bucket
  * rank rides [[Sampling.rankWithinStrata]] — no per-language
  * single-task window.
  */
object LanguageModel {

  /** Per-(lang, w1, w2) bigram counts, per-head totals and
    * per-language continuation vocabulary — the trained model.
    * Derived frames share ONE corpus scan: c1 and V aggregate the
    * (persisted) bigram count table, never the corpus.
    */
  private def counts(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val bg = docs
      .select(col("lang"),
        explode(shingleStructs(tokens(col("text")), 2)).as("bg"))
      .select(col("lang"),
        col("bg").getField("0").as("w1"), col("bg").getField("1").as("w2"))
    val c12 = graft.tools.InternalCaches.persist(
      bg.groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c12")))
    val c1 = c12.groupBy("lang", "w1").agg(sum("c12").as("c1"))
    val vocab = c12.groupBy("lang").agg(countDistinct("w2").as("v"))
    (c12, c1, vocab)
  }

  /** Score every document against the corpus's own per-language
    * bigram LM (add-one smoothing; bigrams seen fewer than `minCount`
    * times are pruned from the model and score at the unseen floor
    * 1/(c1+V), the CCNet pruned-model arrangement). Documents with
    * fewer than two tokens have no bigram and drop out (the x28
    * convention); null-lang / null-id documents are out of scope — a
    * per-language model has nothing to say about them.
    *
    * Output: (doc_id, lang, n_bigrams, lp_micro, avg_logprob) where
    * `lp_micro` = Σ floor(1e6·ln P(w2|w1)) (BIGINT, the hash-exact
    * anchor) and `avg_logprob` = lp_micro/(1e6·n_bigrams) rounded to
    * 6 dp — the negated log-perplexity (ppl = e^(−avg_logprob);
    * the exp is left to the consumer: monotone, and keeping it out
    * of the verified surface keeps the gate libm-free).
    */
  def lmScore(docs: DataFrame, minCount: Long = 1L): DataFrame = {
    val base = docs.filter(col("doc_id").isNotNull && col("lang").isNotNull)
    val (c12, c1, vocab) = counts(base)
    val kept = c12.filter(col("c12") >= minCount)
    val docBg = base
      .select(col("doc_id"), col("lang"),
        explode(shingleStructs(tokens(col("text")), 2)).as("bg"))
      .select(col("doc_id"), col("lang"),
        col("bg").getField("0").as("w1"), col("bg").getField("1").as("w2"))
    val p = (coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double") /
      (col("c1") + col("v")).cast("double")
    // the pruned model broadcasts (vocabulary-sized, Zipf-bounded by
    // minCount) so the score pass is ONE map-side stage over the
    // corpus — the exploded bigram stream never shuffles
    docBg
      .join(broadcast(kept), Seq("lang", "w1", "w2"), "left")
      .join(broadcast(c1), Seq("lang", "w1"))
      .join(broadcast(vocab), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        floor(log(p) * lit(1e6)).cast("long").as("__lp"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"), sum("__lp").as("lp_micro"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("lp_micro"),
        round(col("lp_micro").cast("double") /
          (col("n_bigrams").cast("double") * lit(1e6)), 6).as("avg_logprob"))
  }

  /** CCNet's head/middle/tail partition: within each language, rank
    * documents most-fluent-first (highest avg_logprob = lowest
    * perplexity; rounded-score ties broken by doc_id) and split the
    * ranking into thirds by integer arithmetic — no float quantile
    * thresholds to disagree over, and bucket populations per language
    * differ by at most one by construction.
    *
    * Output: (doc_id, lang, ppl_rank, n_lang, bucket).
    */
  def perplexityBuckets(docs: DataFrame, minCount: Long = 1L): DataFrame = {
    val scored = graft.tools.InternalCaches.persist(lmScore(docs, minCount))
    val nLang = scored.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val ranked = Sampling.rankWithinStrata(
      scored.select(col("doc_id"), col("lang"),
        (-col("avg_logprob")).as("__h")),
      "lang", "doc_id")
    ranked
      .join(broadcast(nLang), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("__r").as("ppl_rank"),
        col("n_lang"),
        expr("""CASE cast(((__r - 1) * 3) div n_lang as int)
               |  WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
               |  ELSE 'tail' END""".stripMargin).as("bucket"))
  }
}
