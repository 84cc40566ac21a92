package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable._

/** Text-analysis operators (SURVEY.md §2.11): language ID, quality
  * scoring, token counting, fingerprinting. All single-pass narrow
  * transforms — no shuffle at all; at 100 TB these run at scan speed
  * with whole-stage codegen (no UDFs).
  */
object TextAnalysis {

  /** Marker stopwords per language for the n-gram-free heuristic
    * language ID (token-equality counts are cheap and portable; real
    * systems would use char-n-gram profiles — same dataflow shape).
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "la", "los", "de", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "est", "une"))

  // marker counting runs on separator-doubled text with codegen'd
  // string primitives (tokenCountInSpaced) — the interpreted
  // ArrayFilter form was the hottest CodegenFallback path in the whole
  // text pipeline, and the doubling pass is hoisted into ONE projected
  // column per scan instead of being re-evaluated per marker
  private def score(spaced: Column, words: Seq[String]): Column =
    words.map(w => tokenCountInSpaced(spaced, w)).reduce(_ + _)

  /** Language ID: per-language marker-word counts + argmax with a fixed
    * priority order (en > es > de > fr > und on ties/zero).
    * Output: (doc_id, s_en, s_es, s_de, s_fr, lang_pred).
    */
  def languageId(docs: DataFrame): DataFrame = {
    val scored = docs
      .withColumn("__spaced", spacedText(col("text")))
      .select(
        col("doc_id") +: markers.map { case (l, ws) =>
          score(col("__spaced"), ws).as(s"s_$l") }: _*)
    val Seq(en, es, de, fr) = markers.map(m => col(s"s_${m._1}"))
    scored.withColumn("lang_pred",
      when(en >= es && en >= de && en >= fr && en > 0, "en")
        .when(es >= de && es >= fr && es > 0, "es")
        .when(de >= fr && de > 0, "de")
        .when(fr > 0, "fr")
        .otherwise("und"))
  }

  /** Quality scoring: length/punctuation/stopword ratios and a composite
    * score. Output columns are deterministically rounded doubles.
    */
  def quality(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t)
    val nCh = length(col("text"))
    val punct = size(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0)))
    val stop = score(col("__spaced"), Seq("the", "a", "and", "of", "is"))
    docs.withColumn("__spaced", spacedText(col("text"))).select(
      col("doc_id"),
      nCh.as("n_chars_obs"),
      nTok.as("n_tokens"),
      round((nCh - (nTok - lit(1))).cast("double") / nTok, 6).as("avg_token_len"),
      round(punct.cast("double") / nCh, 6).as("punct_ratio"),
      round(stop.cast("double") / nTok, 6).as("stopword_ratio"),
      round(
        least(nTok.cast("double") / 100.0, lit(1.0)) *
          (lit(1.0) - punct.cast("double") / nCh), 6).as("quality_score"))
  }

  /** Filter-cascade attrition audit: the report a curation pipeline
    * reads BEFORE shipping a filter recipe. Four declared stages run as
    * per-document flags in ONE scan; the output is one row per stage:
    *
    *   - `n_fail` — documents failing this stage's predicate alone
    *     (independent of the others): the stage's raw strictness;
    *   - `n_sole_fail` — failing this stage and NO other: what the
    *     filter uniquely removes. A stage whose sole-kill is ~0 is
    *     redundant — dropping it changes nothing, and this column is
    *     the evidence;
    *   - `n_pass_cum` — documents passing stages 1..i in declared
    *     order: the attrition funnel (the last row is the shipped
    *     corpus size).
    *
    * Stages (predicates are INTEGER arithmetic end to end, so both
    * engines agree bit for bit — the repo-wide oracle-portability
    * rule): `too_short` (< 20 tokens), `low_stopword` (English
    * stopword mass < 30‰ of tokens — gibberish/non-prose heuristic),
    * `lang_excluded` (declared lang outside the en/es/de/fr
    * whitelist — note the deliberate overlap with low_stopword: CJK
    * text fails both, and `n_sole_fail` is what quantifies the
    * redundancy), `repetitive` (distinct-token ratio < 500‰ — the
    * boilerplate/template signal, same family as x26's metrics).
    *
    * Scale shape: one corpus scan → one single-row aggregate
    * (map-side combined; every flag is a codegen'd projection — the
    * stopword counter is the separator-doubled form, not an
    * interpreted lambda) → a constant 4-row unpivot. Nothing after
    * the scan grows with the corpus.
    * Output: (ord, stage, n_fail, n_sole_fail, n_pass_cum).
    */
  def filterCascade(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t).cast("long")
    val nDis = size(array_distinct(t)).cast("long")
    val stop = score(col("__spaced"), Seq("the", "a", "and", "of", "is")).cast("long")
    val whitelist = Seq("en", "es", "de", "fr")
    val flags = docs
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .withColumn("__spaced", spacedText(col("text")))
      .select(
        (nTok < 20L).cast("long").as("f1"),
        (stop * 1000L < nTok * 30L).cast("long").as("f2"),
        (col("lang").isNull || !col("lang").isin(whitelist: _*))
          .cast("long").as("f3"),
        (nDis * 1000L < nTok * 500L).cast("long").as("f4"))
    val agged = flags.agg(
      sum("f1").as("n1"), sum("f2").as("n2"),
      sum("f3").as("n3"), sum("f4").as("n4"),
      sum(expr("f1 * (1-f2) * (1-f3) * (1-f4)")).as("s1"),
      sum(expr("f2 * (1-f1) * (1-f3) * (1-f4)")).as("s2"),
      sum(expr("f3 * (1-f1) * (1-f2) * (1-f4)")).as("s3"),
      sum(expr("f4 * (1-f1) * (1-f2) * (1-f3)")).as("s4"),
      sum(expr("(1-f1)")).as("c1"),
      sum(expr("(1-f1) * (1-f2)")).as("c2"),
      sum(expr("(1-f1) * (1-f2) * (1-f3)")).as("c3"),
      sum(expr("(1-f1) * (1-f2) * (1-f3) * (1-f4)")).as("c4"))
    agged.selectExpr(
      """stack(4,
        |  1, 'too_short',     n1, s1, c1,
        |  2, 'low_stopword',  n2, s2, c2,
        |  3, 'lang_excluded', n3, s3, c3,
        |  4, 'repetitive',    n4, s4, c4)
        |AS (ord, stage, n_fail, n_sole_fail, n_pass_cum)""".stripMargin)
  }

  /** Token counting: whitespace tokens and a BPE-ish regex token count
    * (letter runs / digit runs / single other chars).
    * Output: (doc_id, ws_tokens, re_tokens, chars_per_token).
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val ws = size(tokens(col("text")))
    val re = size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
    docs.select(col("doc_id"), ws.as("ws_tokens"), re.as("re_tokens"),
      round(length(col("text")).cast("double") / re, 6).as("chars_per_token"))
  }

  /** Per-document top-k terms by TF-IDF, with the IDF kept in the
    * engine-portable rational form `tf · N / df` (one IEEE division —
    * bit-identical everywhere; `log` is libm-dependent and would break
    * the oracle in the last ulp, and it is monotone so the ranking is
    * unchanged). Term DF is a vocabulary-sized table joined on `term`;
    * at corpus scale the ultra-hot terms ("the") skew that shuffle —
    * AQE skew-join splits them, and since per-term rows are independent
    * the split is safe. Ranking runs on the heap operator
    * ([[graft.plans.TopKPerGroup]]) — no per-document sort.
    * Output: (doc_id, rank, term, tfidf).
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import graft.plans.TopKPerGroup
    // corpus cardinality as a broadcast one-row frame, NOT an eager
    // .count() — the count action would run a full extra scan of the
    // corpus at plan-construction time; this stays lazy and single-job
    val nDocs = docs.agg(count(lit(1)).as("__n_docs"))
    // tf feeds BOTH the document-frequency aggregate and the score join;
    // persist it so the corpus is scanned + tokenized + term-shuffled
    // once, not twice (the DF aggregate materializes it, the join reads
    // the cache). (doc_id, term, tf) rows spill cleanly to disk.
    // InternalCaches memoizes per canonical plan and lets the session
    // release the entry (InternalCaches.release) — repeated calls no
    // longer accumulate unreleasable CacheManager entries.
    val tf = graft.tools.InternalCaches.persist(
      docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        round(col("tf") * col("__n_docs") / col("df"), 6).as("tfidf"))
    TopKPerGroup.topK(scored, Seq("doc_id"),
        Seq("tfidf" -> TopKPerGroup.Desc, "term" -> TopKPerGroup.Asc), k)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
  }

  /** Repetition-based quality metrics (the Gopher/C4-style repetition
    * filters adapted to a single-line corpus): per document, the
    * distinct-token fraction, the most-frequent-token fraction, and the
    * duplicate-bigram fraction. Heavily repetitive documents (boiler-
    * plate, keyword stuffing, degenerate generations) score low on
    * distinct fractions and high on duplicate fractions and are the
    * canonical pre-training drop set alongside near-dup removal.
    * Output: (doc_id, n_tokens, distinct_token_frac, top_token_frac,
    * dup_bigram_frac).
    *
    * Scale shape: two shuffles keyed by doc_id(+token/bigram), both
    * with map-side partial aggregation; no per-doc arrays are ever
    * materialized (the explode streams), so documents of any length
    * pass through in bounded memory.
    */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tokStats = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_c"))
    // bigram identity only (no string needed): aggregate directly on
    // the zipped (token, next-token) struct — zero per-element lambdas
    val bgStats = docs
      .select(col("doc_id"),
        explode(shingleStructs(tokens(col("text")), 2)).as("bg"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_bg"), countDistinct("bg").as("d_bg"))
    // inner join: a doc with <2 tokens has no bigram row and drops out,
    // mirrored exactly by the oracle's bigram join
    tokStats.join(bgStats, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 6)
          .as("distinct_token_frac"),
        round(col("top_c").cast("double") / col("n_tokens"), 6)
          .as("top_token_frac"),
        round(lit(1.0) - col("d_bg").cast("double") / col("n_bg"), 6)
          .as("dup_bigram_frac"))
  }

  /** Document fingerprinting: a content fingerprint (md5 of
    * whitespace-normalized lowercased text) plus a 31-polynomial rolling
    * hash over token hash32s mod 1e9+7 (order-sensitive — reordered
    * tokens change it, unlike the shingle-set ops).
    * Output: (doc_id, fp_md5, fp_roll).
    */
  /** Corpus collocation statistics: bigram LIFT — the exact-ratio
    * association measure lift(w₁,w₂) = P(w₁w₂) / (P(w₁)·P(w₂)) =
    * (c₁₂/N) · (M/c₁) · (M/c₂) with N total bigrams, M total tokens.
    * PMI is log(lift); the log is deliberately NOT taken — every input
    * is an exact integer count and one rounded double division keeps
    * the score bit-reproducible across engines, where `ln` would hinge
    * on libm agreement (the same argument as [[graft.ext.Sampling]]'s
    * integer priority keys). Ranking by lift ≡ ranking by PMI (log is
    * monotone).
    *
    * Scale shape: one explode→aggregate per grain with map-side
    * combines (bigram and unigram counts), then the bigram table joins
    * the unigram counts twice — vocabulary-sized frames, broadcast. The
    * `minCount` floor prunes the hapax tail BEFORE the joins, which is
    * what keeps the bigram table bounded on a 100 TB corpus (Zipf: the
    * tail IS the table).
    * Output: (w1, w2, c_pair, c_w1, c_w2, lift), c_pair >= minCount.
    */
  def collocationLift(docs: DataFrame, minCount: Long = 5L): DataFrame = {
    val toks = docs.select(explode(tokens(col("text"))).as("w"))
    // the vocabulary aggregate feeds the total AND both joins — three
    // reads; persist via the releasable registry or the corpus scan +
    // explode + count runs three times (same hazard tfidfTopTerms pins)
    val uni = graft.tools.InternalCaches.persist(
      toks.groupBy("w").agg(count(lit(1)).as("c_w")))
    val totalTokens = uni.agg(sum("c_w").as("m_tokens"))
    val bg = docs
      .select(explode(shingleStructs(tokens(col("text")), 2)).as("bg"))
      .select(col("bg").getField("0").as("w1"), col("bg").getField("1").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_pair"))
    val totalBg = bg.agg(sum("c_pair").as("n_bigrams"))
    bg.filter(col("c_pair") >= minCount)
      .join(broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("c_w", "c_w1")), Seq("w1"))
      .join(broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("c_w", "c_w2")), Seq("w2"))
      .crossJoin(broadcast(totalTokens))
      .crossJoin(broadcast(totalBg))
      .select(col("w1"), col("w2"), col("c_pair"), col("c_w1"), col("c_w2"),
        // the denominator multiplies THROUGH a double: three BIGINTs
        // (n_bigrams · c_w1 · c_w2) overflow Long at large-corpus counts
        // (~1e18 already at sf1's scale) — one IEEE product is
        // bit-identical across engines, so parity survives the cast
        round(
          col("c_pair").cast("double") * col("m_tokens") * col("m_tokens") /
            (col("n_bigrams").cast("double") * col("c_w1") * col("c_w2")), 6).as("lift"))
  }

  /** Per-stratum vocabulary heavy hitters: the k most frequent tokens
    * within each stratum (language, source, domain) — the input to
    * per-language tokenizer training and stopword derivation. Exact, so
    * the ranking is oracle-verifiable; at corpora where exact counts
    * are too hot, the KMV pattern ([[graft.ext.Sketches]]) is the
    * drop-in sketch seam.
    *
    * Scale shape: explode → one (stratum, token)-keyed count with
    * map-side combines, then the heap operator's partial top-k — ≤ k
    * rows per (stratum, partition) cross the second exchange, no sort.
    * Output: (stratum, rank, token, n) — ties broken by token asc.
    */
  def heavyHitters(docs: DataFrame, stratumCol: String, k: Int = 5): DataFrame = {
    import graft.plans.TopKPerGroup
    val counts = docs
      .filter(col(stratumCol).isNotNull)
      .select(col(stratumCol), explode(tokens(col("text"))).as("token"))
      .groupBy(col(stratumCol), col("token"))
      .agg(count(lit(1)).as("n"))
    TopKPerGroup.topK(counts, Seq(stratumCol),
        Seq("n" -> TopKPerGroup.Desc, "token" -> TopKPerGroup.Asc), k)
      .select(col(stratumCol), col("rank"), col("token"), col("n"))
  }

  def fingerprints(docs: DataFrame): DataFrame = {
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val hs = transform(tokens(col("text")), t => hash32(t))
    val roll = aggregate(hs, lit(0L), (acc, h) => (acc * 31 + h) % 1000000007L)
    docs.select(col("doc_id"), md5(norm).as("fp_md5"), roll.as("fp_roll"))
  }
}
