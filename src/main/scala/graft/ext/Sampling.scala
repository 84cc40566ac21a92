package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.NoInline
import graft.functions.Portable._

/** Sampling operators for training-data pipelines (SURVEY.md §2.11
  * scope): corpus mixing wants per-stratum quotas ("50 % of English,
  * 10 % of French…"), and at pipeline scale the sample must be
  * DETERMINISTIC — re-running the job, adding executors, or re-reading
  * a lost partition must select the same rows. Random `sample()` gives
  * none of that; hashing the row identity does.
  */
object Sampling {

  /** Deterministic stratified sampling: keep a row iff
    * `hash(stratum ":" id) mod 100 < pct(stratum)`. The hash is the
    * portable md5-derived [[graft.functions.Portable.hash32]] (swap for
    * xxhash64 in production — same shape), so membership is a pure
    * function of the row's identity: stable across runs, executors,
    * retries, and engines (the DuckDB oracle reproduces it exactly).
    * Narrow, shuffle-free, codegen'd — runs at scan speed.
    *
    * @param ratesPct (stratum value → percentage kept), e.g.
    *   `Seq("en" -> 50, "fr" -> 10)`
    * @param defaultPct percentage for strata not listed
    */
  def stratifiedByHash(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      ratesPct: Seq[(String, Int)],
      defaultPct: Int): DataFrame = {
    require(defaultPct >= 0 && defaultPct <= 100, s"defaultPct out of range: $defaultPct")
    ratesPct.foreach { case (s, p) =>
      require(p >= 0 && p <= 100, s"rate for $s out of range: $p") }
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(stratumCol) === s, lit(p)).otherwise(acc)
    }
    // a NULL stratum OR a NULL id is excluded outright (SQL
    // `s || ':' || id` is NULL and NULL < rate filters the row; concat_ws
    // would silently skip EITHER null argument and hash on the remainder
    // alone — engines would then disagree on exactly those rows).
    //
    // The keep decision is computed as a PROJECTED column wrapped in
    // [[NoInline]], then filtered on by attribute: the predicate
    // references the stratum ~5× (key concat + every rate arm), and
    // when the stratum is a DERIVED column (language ID over text),
    // Filter-through-Project pushdown would substitute the stratum's
    // full defining expression into every reference — measured 200×
    // slower at 10× scale (PushPredicateThroughNonJoin has no
    // expensive-duplication guard, and a Filter's condition determinism
    // is not even consulted for the Project case — only a
    // nondeterministic PROJECT field blocks the push, which is exactly
    // what the NoInline projection provides). The isNotNull conjuncts
    // stay below it, free to reach the scan.
    val keep = "__graft_keep"
    df.filter(col(stratumCol).isNotNull && col(idCol).isNotNull)
      .withColumn(keep, NoInline.noInline(
        pmod(hash32(concat_ws(":", col(stratumCol), col(idCol))), lit(100)) < rate))
      .filter(col(keep))
      .drop(keep)
  }

  /** Deterministic weighted priority sampling: per stratum, keep the
    * `k` rows with the smallest priority key `h60(id) div w` — the
    * priority-sampling shape (Duffield–Lund–Thorup: priority = u/w,
    * u uniform) with [[graft.functions.Portable.hash60]] playing the
    * uniform draw. Higher weight ⇒ smaller key ⇒ more likely kept, and
    * every kept row is a pure function of the input set. INTEGER
    * division is deliberate: the classical u^(1/w) float key would
    * hinge on libm `pow` rounding agreeing across engines; `h div w`
    * is exact everywhere, so the sample is oracle-verifiable
    * bit-for-bit. Rows with NULL/non-positive weight or NULL
    * stratum/id are excluded (same rule as [[stratifiedByHash]]).
    *
    * WEIGHTS ARE INTEGERS: the column is ROUNDED to long (not
    * truncated), so fractional weights below 0.5 round to 0 and are
    * excluded, and weights within ±0.5 of each other may collapse.
    * Callers with fractional weights (quality scores in (0,1), …)
    * must pre-scale to a meaningful integer range — e.g.
    * `round(score * 1000)` — because sub-integer resolution cannot
    * survive an integer key by construction.
    *
    * Scale shape: narrow projection, then the heap operator's
    * map-side partial caps the exchange at k rows per (stratum,
    * partition) — the selection never sorts and never shuffles the
    * corpus. Output: (stratumCol, idCol, weight, priority).
    */
  def weightedPriority(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      weight: Column,
      k: Int): DataFrame = {
    import graft.plans.TopKPerGroup
    val scored = df
      .select(col(stratumCol), col(idCol), round(weight).cast("long").as("weight"))
      .filter(col(stratumCol).isNotNull && col(idCol).isNotNull && col("weight") > 0)
      .withColumn("__h", hash60(col(idCol).cast("string")))
      // `div`, not `/`: Column./ is always floating-point division
      .withColumn("priority", expr("__h div weight"))
      .drop("__h")
    TopKPerGroup.topK(scored, Seq(stratumCol),
        Seq("priority" -> TopKPerGroup.Asc, idCol -> TopKPerGroup.Asc), k)
      .select(col(stratumCol), col(idCol), col("weight"), col("priority"))
  }

  /** Deterministic Gumbel-top-n: a without-replacement sample of `n`
    * rows with probability ∝ exp(logWeightMicro / 1e6) — the Gumbel-max
    * trick (Yellott 1977; Vieira 2014's top-k form): perturb each row's
    * log-weight with an independent Gumbel draw and keep the n largest.
    * This is the seeded draw DSIR's resampling step calls for
    * (Xie et al. 2023 §2.2) with the row's importance as the
    * log-weight, exposed generically because any log-space merit
    * resamples the same way.
    *
    * Determinism discipline (the stratifiedByHash/weightedPriority
    * rule, extended to a continuous draw): the uniform is the portable
    * md5-derived [[graft.functions.Portable.hash60]] of `seed:id` —
    * u = (2·h + 1) / 2^61, an EXACT double both engines compute
    * identically (the numerator is exact BIGINT arithmetic, the cast
    * rounds once under shared IEEE rules, the divisor is a power of
    * two) — and the Gumbel −ln(−ln u) lands in fixed point as
    * `floor(1e6·g)` per the repo-wide LM rule (the x107 precedent for
    * per-row libm → BIGINT). Everything that crosses rows — the key
    * comparison, the final ranking — is exact integer arithmetic.
    *
    * Scale shape: one narrow codegen'd projection, then a global top-n
    * (`TakeOrderedAndProject`: per-partition heaps, n rows to the
    * driver — never a corpus sort); the rank window runs over the n
    * selected rows only. Rows with NULL id or NULL weight are excluded
    * (the house NULL rule). Output: input columns + (gumbel_micro,
    * key_micro, rank), hardest-drawn first.
    */
  def gumbelTopN(scored: DataFrame, logWeightMicro: String, idCol: String,
      n: Int, seed: String): DataFrame = {
    require(n >= 0, s"negative sample size: $n")
    require(!seed.contains(":"), s"seed must be ':'-free (key separator): $seed")
    val h = hash60(concat_ws(":", lit(seed), col(idCol)))
    val u = (h * lit(2L) + lit(1L)).cast("double") / lit(math.pow(2.0, 61))
    val keyed = scored
      .filter(col(idCol).isNotNull && col(logWeightMicro).isNotNull)
      .withColumn("gumbel_micro",
        floor(-log(-log(u)) * lit(1e6)).cast("long"))
      .withColumn("key_micro", col(logWeightMicro) + col("gumbel_micro"))
    import org.apache.spark.sql.expressions.Window
    keyed.orderBy(col("key_micro").desc, col(idCol).asc).limit(n)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("key_micro").desc, col(idCol).asc)))
  }

  /** Corpus-mixing weights: per stratum (language, source, domain…),
    * document/token counts, the stratum's share of all tokens, and the
    * up/down-weighting factor that would equalize token mass across
    * strata (`mix_weight` = target-tokens-per-stratum / actual) — the
    * table a training pipeline derives sampling temperatures and epoch
    * multipliers from. NULL strata are excluded, like [[stratifiedByHash]].
    * Output: (stratum, n_docs, n_tokens, token_share, mix_weight).
    *
    * Scale shape: one aggregation shuffle with stratum cardinality keys
    * plus a broadcast one-row total — no second pass over the corpus.
    */
  def mixWeights(docs: DataFrame, stratumCol: String, textCol: String = "text"): DataFrame = {
    val per = docs.filter(col(stratumCol).isNotNull)
      .select(col(stratumCol).as("stratum"),
        size(tokens(col(textCol))).cast("long").as("__n_tok"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"), sum("__n_tok").as("n_tokens"))
    val totals = per.agg(sum("n_tokens").as("__tot"), count(lit(1)).as("__k"))
    per.crossJoin(broadcast(totals))
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("__tot"), 6).as("token_share"),
        round((col("__tot").cast("double") / col("__k")) / col("n_tokens"), 6)
          .as("mix_weight"))
  }

  /** Integer document merit + token cost — the shared scoring frame of
    * [[selectToBudget]] / [[selectToBudgetBinned]]. Merit is the
    * INTEGER analog of x10's `quality_score`
    * (`min(n_tokens/100, 1) · (1 − punct_ratio)`, reference scoring
    * shape): `least(n_tokens, 100)·1000 − (punct·100000 div n_chars)`
    * — both terms land in [0, 100000], and integer arithmetic end to
    * end means both engines order documents identically (a float score
    * would tie-break on libm rounding). The bounded range also bounds
    * [[selectToBudgetBinned]]'s bin-table state by CONSTRUCTION:
    * ≤ 200k distinct merits whatever the corpus size. NULL doc_id/text
    * rows are excluded (same rule as [[stratifiedByHash]]);
    * `greatest(n_chars, 1)` keeps the empty-string document defined in
    * both engines (DuckDB integer `//` by zero errors out).
    * Output: (doc_id, merit, n_tokens).
    */
  def meritTokens(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val nTok = size(tokens(col(textCol))).cast("long")
    val punct = size(regexp_extract_all(col(textCol), lit("[.,;:!?]"), lit(0)))
      .cast("long")
    val nCh = greatest(length(col(textCol)).cast("long"), lit(1L))
    docs.filter(col("doc_id").isNotNull && col(textCol).isNotNull)
      .select(col("doc_id"), least(nTok, lit(100L)).as("__cap"),
        punct.as("__punct"), nCh.as("__nch"), nTok.as("n_tokens"))
      // `div`, not `/`: Column./ is always floating-point division
      .select(col("doc_id"),
        (col("__cap") * 1000L - expr("(__punct * 100000) div __nch")).as("merit"),
        col("n_tokens"))
  }

  /** Token-budget corpus selection, EXACT BASELINE (labeled, like x62
    * beside x63): "fill a token budget with the best documents" — the
    * greedy prefix rule every curation pipeline runs before training.
    * Documents ordered by (merit DESC, doc_id ASC); a document is kept
    * iff its inclusive running token total stays ≤ `budgetTokens`.
    * The prefix rule is deliberate (NOT best-fit bin packing): the cut
    * is a quality threshold, so the selected set is "everything above
    * the bar", which is what a data recipe reproduces. This form
    * computes the running total with ONE GLOBAL unpartitioned window —
    * a single-task sort of the whole corpus, the classic
    * does-not-scale shape. It exists as the specification the binned
    * path is verified bit-identical against; production runs
    * [[selectToBudgetBinned]]. Output: (doc_id, merit, n_tokens).
    */
  def selectToBudget(docs: DataFrame, budgetTokens: Long,
      textCol: String = "text"): DataFrame =
    selectToBudgetFrom(meritTokens(docs, textCol), budgetTokens)

  /** [[selectToBudget]] over a pre-scored (doc_id, merit, n_tokens)
    * frame — callers that persist the scoring pass (it is the expensive
    * tokenizing scan, and a pipeline reuses it across budgets) select
    * without re-scoring.
    */
  def selectToBudgetFrom(scored: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"negative budget: $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("merit").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .filter(col("__cum") <= budgetTokens)
      .select(col("doc_id"), col("merit"), col("n_tokens"))
  }

  /** [[selectToBudget]]'s scale path — BIT-IDENTICAL output, no global
    * sort of the corpus. The prefix rule has exactly one cut point
    * (the running total is monotone), so whole merit BINS are decided
    * wholesale and only the single boundary bin needs per-document
    * work:
    *
    *   1. one map-side-combined `groupBy(merit)` — bin-table rows are
    *      bounded by [[meritTokens]]' ±100k merit range, NOT by corpus
    *      size;
    *   2. an exclusive running total over that tiny bin table (the one
    *      unpartitioned window here runs over ≤ 200k BIN rows, never
    *      the corpus) classifies each bin: fully in
    *      (`cum_above + bin_tokens ≤ budget`), boundary
    *      (`cum_above ≤ budget < cum_above + bin_tokens` — at most one
    *      bin qualifies), or out;
    *   3. the classification broadcasts back onto the corpus (narrow
    *      pass, no corpus shuffle);
    *   4. only the boundary bin's documents sort (by doc_id, keyed by
    *      merit so the exchange is that bin alone) against the leftover
    *      `budget − cum_above`.
    *
    * Fully-in bins reproduce the prefix rule because every inclusive
    * prefix inside them is ≤ `cum_above + bin_tokens ≤ budget`; out
    * bins because every prefix is > budget; the boundary bin re-runs
    * the rule verbatim on the leftover. BudgetSelectionSpec pins
    * equality against [[selectToBudget]] on the fixture and on crafted
    * edges (budget 0, budget on an exact bin edge, budget ≥ corpus).
    * Output: (doc_id, merit, n_tokens).
    */
  def selectToBudgetBinned(docs: DataFrame, budgetTokens: Long,
      textCol: String = "text"): DataFrame =
    selectToBudgetBinnedFrom(meritTokens(docs, textCol), budgetTokens)

  /** [[selectToBudgetBinned]] over a pre-scored frame (see
    * [[selectToBudgetFrom]]). The plan reads `scored` three times (the
    * bin aggregate and the two branch probes) — when `scored` is the
    * raw tokenizing scan those are three tokenization passes, so
    * production callers (and the registered x74 query) persist the
    * scoring pass first; the re-reads are then columnar cache hits on
    * a 3-column frame.
    */
  def selectToBudgetBinnedFrom(scored: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"negative budget: $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    val bins = scored.groupBy("merit")
      .agg(sum(col("n_tokens")).as("__bin_tokens"))
    val wb = Window.orderBy(col("merit").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val classified = bins
      .withColumn("__cum_above", coalesce(sum(col("__bin_tokens")).over(wb), lit(0L)))
      .select(col("merit"), col("__cum_above"),
        (col("__cum_above") + col("__bin_tokens") <= budgetTokens).as("__full"),
        (col("__cum_above") <= budgetTokens &&
          col("__cum_above") + col("__bin_tokens") > budgetTokens).as("__boundary"))
    val joined = scored.join(broadcast(classified), Seq("merit"))
    val fullyIn = joined.filter(col("__full"))
      .select(col("doc_id"), col("merit"), col("n_tokens"))
    val wd = Window.partitionBy(col("merit")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryIn = joined.filter(col("__boundary"))
      .withColumn("__cum_in", sum(col("n_tokens")).over(wd))
      .filter(col("__cum_above") + col("__cum_in") <= budgetTokens)
      .select(col("doc_id"), col("merit"), col("n_tokens"))
    fullyIn.union(boundaryIn)
  }

  /** Deterministic shuffle-shard: the training-order assignment every
    * pretraining dataloader needs — each document lands in one of
    * `nShards` shards with a reproducible pseudo-random within-shard
    * position, so the epoch's read order is (shard asc, pos asc) and
    * re-running the job, re-reading a lost partition, or changing
    * cluster size reproduces the identical order. The seed reshuffles:
    * one corpus, one assignment per epoch string.
    *
    * Scale shape — this is the operator where the naive form dies
    * first: a global `orderBy(hash)` is a RANGE exchange + total sort
    * whose skew/coordination cost grows with the corpus, and no
    * consumer actually needs a TOTAL order — dataloaders read shards
    * independently. So the shard id comes from a pure hash (narrow,
    * no data movement), and the only exchange is hash-partitioning by
    * shard with a per-shard sort (`row_number` PARTITIONED by shard —
    * never a global window). Shards are mutually independent: a
    * 1000-executor cluster writes all of them in parallel and a
    * straggling shard delays only itself.
    *
    * NULL ids are excluded (the [[stratifiedByHash]] rule). Position
    * ties on the 60-bit hash break by id, so the order is total and
    * engine-portable. Output: (doc_id, shard, pos) — pos is 1-based
    * within shard.
    */
  def shuffleShards(docs: DataFrame, idCol: String, nShards: Int,
      seed: String = "epoch0"): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    import org.apache.spark.sql.expressions.Window
    val h = hash60(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h").asc, col(idCol).asc)
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol), h.as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** x89 — deterministic weighted interleave: the mixture READ ORDER.
    * x29/x50 compute per-source sampling weights; x78 assigns shard
    * membership; this operator emits the key that serializes documents
    * so that ANY prefix of key order holds each source in proportion
    * to its token mass — stride scheduling (Waldspurger & Weihl, OSDI
    * '94), the deterministic form of weighted round-robin: source s's
    * r-th document (1-based, hash-shuffled within source) gets
    *   ikey = (2r − 1) · 10^12 div (2 · w_s)
    * — the midpoint of its r-th stride — so sources emit at evenly
    * spaced key intervals ∝ 1/w_s. All integer arithmetic (div, not
    * `/`), bit-portable to the oracle.
    *
    * Deliberately NO materialized global position (the x78 argument —
    * a global row_number is one task holding the corpus): the key IS
    * the order; a writer lays out the epoch with
    * `repartitionByRange + sortWithinPartitions` on (ikey, source,
    * id) — Spark's scalable total-order path — and a reader streams
    * shards in key order.
    *
    * The within-source rank is the TWO-PHASE form, not a per-source
    * window (round 11 shipped `Window.partitionBy(source)` — one task
    * holding each source's entire corpus, the exact giant-stratum
    * funnel x48/x78 ban): range-partition on (source, __h, id) —
    * source leading, so each partition holds contiguous runs of at
    * most a few sources and a giant source SPREADS across partitions
    * in key order — sort within partitions, take the per-partition
    * sequence from `monotonically_increasing_id` (consecutive within a
    * partition, so `__mid − min(__mid)` is the local rank within a
    * contiguous (partition, source) run), aggregate per-(partition,
    * source) counts (a #partitions × #sources frame), prefix-sum those
    * into start offsets with a window over the TINY stats frame, and
    * broadcast-join the offsets back. Bit-identical to
    * `row_number() OVER (PARTITION BY source ORDER BY __h, id)` —
    * partition boundaries cannot reorder unique keys — and gated by
    * ClusterSamplingSpec both ways (equality to the window form;
    * no corpus-scale Window / no SinglePartition in the plan).
    *
    * Arithmetic: the stride product is computed in DECIMAL(34,0) —
    * `(2r−1) · 10^12` overflows LONG once a source's rank exceeds
    * ~4.6M documents, and non-ANSI Spark would wrap silently to
    * negative keys while the oracle errors (round-11 advisory).
    * DECIMAL is exact, `div` returns LONG, and the quotient itself
    * fits LONG whenever per-document weights are ≥ 1 (then tw ≥ r, so
    * ikey < 10^12); zero-total-weight strata are dropped (mirrored in
    * the oracle) rather than dividing by zero. Output: (idCol, source,
    * ikey) with ikey LONG on both engines — the oracle casts its
    * HUGEINT quotient back to BIGINT so the driver's hasher sees the
    * same type either side.
    */
  def weightedInterleave(docs: DataFrame, strataCol: String, idCol: String,
      weightExpr: Column, seed: String = "epoch0"): DataFrame = {
    val base = docs.filter(col(idCol).isNotNull && col(strataCol).isNotNull)
    val weights = base.groupBy(col(strataCol))
      .agg(sum(weightExpr).as("__w"))
      .filter(col("__w") > 0)
    interleaveKeysFrom(base, strataCol, idCol, weights, seed)
  }

  /** Shared stride-key tail of the interleave family: rank within
    * strata (two-phase, no per-stratum window), broadcast-join the
    * catalog-sized `weights` frame (strataCol, __w), emit the stride
    * midpoint key. Factored so [[temperatureInterleave]] reuses the
    * exact arithmetic with a different weight rule.
    */
  private def interleaveKeysFrom(base: DataFrame, strataCol: String,
      idCol: String, weights: DataFrame, seed: String): DataFrame = {
    val h = hash60(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val ranked = rankWithinStrata(
      base.select(col(idCol), col(strataCol), h.as("__h")), strataCol, idCol)
    ranked
      .join(broadcast(weights), Seq(strataCol))
      .select(col(idCol), col(strataCol),
        expr("cast(2 * __r - 1 as decimal(20,0)) * 1000000000000 div (2 * __w)")
          .as("ikey"))
  }

  /** x101 — temperature-smoothed interleave: [[weightedInterleave]]'s
    * stride scheduler driven by α = 0.5 smoothed source masses
    * (w_s' = ⌊√w_s⌋) instead of raw token mass — the XLM rescaling
    * ([[temperatureMixWeights]], arXiv:1901.07291 §3.1) applied to the
    * mixture READ ORDER rather than to sampling rates. Raw-weight
    * interleaving lets one web-scale source own the stream; the
    * smoothed stride upsamples tail sources (prefix shares ∝ √w — the
    * standard multilingual compromise between proportional and
    * uniform). A tail source therefore EXHAUSTS before a giant one:
    * the smoothed schedule trades epoch-uniformity for early-prefix
    * diversity, which is exactly the α-temperature contract.
    *
    * Determinism across engines: √ is IEEE-754 correctly rounded and
    * w_s < 2^52, so ⌊√w_s⌋ is bit-identical in Spark and the oracle
    * (the [[temperatureMixWeights]] argument); everything downstream
    * is [[weightedInterleave]]'s integer arithmetic. Scale shape:
    * identical — one stratum agg, the shared two-phase rank, a
    * broadcast join.
    */
  def temperatureInterleave(docs: DataFrame, strataCol: String, idCol: String,
      weightExpr: Column, seed: String = "epoch0"): DataFrame = {
    val base = docs.filter(col(idCol).isNotNull && col(strataCol).isNotNull)
    val weights = base.groupBy(col(strataCol))
      .agg(sum(weightExpr).as("__raw"))
      .filter(col("__raw") > 0)
      .select(col(strataCol),
        floor(sqrt(col("__raw").cast("double"))).cast("long").as("__w"))
    interleaveKeysFrom(base, strataCol, idCol, weights, seed)
  }

  /** x100 — epoch-stream sharding: materialize the interleaved
    * mixture's GLOBAL position and its balanced shard assignment.
    * [[weightedInterleave]]'s Scaladoc deliberately refuses a global
    * row_number (one task holding the corpus); this operator is the
    * scale-correct answer for the consumers that genuinely need a
    * position — fixed-count shard manifests, resumable readers
    * ("continue from global step N"), and train-loader contracts that
    * address samples by (shard, offset). The global rank is
    * [[rankWithinStrata]] over a CONSTANT stratum: with one stratum
    * the range exchange on (const, ikey, id) is a plain global range
    * partition — the same machinery, zero new code, no funnel — and
    * the prefix-sum window still runs over the #partitions-row stats
    * frame only.
    *
    * Output: (id, stratum, ikey, rn, shard) with
    * `shard = (rn−1)·nShards div N` — contiguous key-order runs,
    * shard sizes differing by at most one, shard id monotone in rn
    * (so concatenating shards 0..S−1 replays the exact global order).
    * The alternative `pmod(hash)` sharding (x78) balances but
    * DESTROYS order — the two operators are the two halves of the
    * epoch-layout contract.
    */
  def interleaveShards(docs: DataFrame, strataCol: String, idCol: String,
      weightExpr: Column, nShards: Int, seed: String = "epoch0"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val keyed = weightedInterleave(docs, strataCol, idCol, weightExpr, seed)
    // read twice (total + output) — persist so the interleave pipeline
    // and the global rank exchange run once
    val ranked = graft.tools.InternalCaches.persist(rankWithinStrata(
      keyed.select(col(idCol), col(strataCol), col("ikey"),
        lit(0).as("__all"), col("ikey").as("__h")), "__all", idCol))
    val tot = ranked.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(tot))
      .select(col(idCol), col(strataCol), col("ikey"),
        col("__r").as("rn"),
        expr(s"cast(((__r - 1) * $nShards) div __n as int)").as("shard"))
  }

  /** x99 — deterministic EXACT-COUNT stratified sample: the first `n`
    * documents of each stratum in hash order — "give me exactly 10k
    * docs per source for the eval slice", the quota form
    * [[stratifiedByHash]]'s rate form cannot express (a percentage
    * keeps a BINOMIAL count; audits and eval sets want exact). Hash
    * order makes it a pure function of row identity (stable across
    * runs, executors, partition loss — the x21 argument), and the
    * two-phase [[rankWithinStrata]] makes the quota scale-safe: no
    * per-stratum window task, a giant stratum spreads across the
    * range partitions. Output (id, stratum, rn ≤ n); strata smaller
    * than `n` return whole.
    */
  def stratifiedExactN(docs: DataFrame, strataCol: String, idCol: String,
      n: Int, seed: String = "sample0"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val base = docs.filter(col(idCol).isNotNull && col(strataCol).isNotNull)
    val h = hash60(concat_ws(":", lit(seed), col(idCol).cast("string")))
    rankWithinStrata(base.select(col(idCol), col(strataCol), h.as("__h")),
        strataCol, idCol)
      .filter(col("__r") <= n)
      .select(col(idCol), col(strataCol), col("__r").as("rn"))
  }

  /** Two-phase within-stratum rank: `__r` = row_number over
    * (__h asc, id asc) within strataCol, with NO per-stratum
    * single-task window. Input must carry (idCol, strataCol, __h) with
    * idCol unique; output adds `__r` (long, 1-based). See
    * [[weightedInterleave]] for the derivation; factored out so other
    * stratified operators can rank at scale.
    */
  private[graft] def rankWithinStrata(
      base: DataFrame, strataCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = base.sparkSession.sessionState.conf.numShufflePartitions
    // one range exchange; the sort, partition-id and sequence stamps
    // are all narrow in the same stage. Persisted: read twice (stats +
    // output), and the second read must see the SAME partition layout
    // the stats were computed from.
    val ordered = graft.tools.InternalCaches.persist(
      base.repartitionByRange(parts, col(strataCol), col("__h"), col(idCol))
        .sortWithinPartitions(col(strataCol), col("__h"), col(idCol))
        .withColumn("__mid", monotonically_increasing_id())
        .withColumn("__pid", spark_partition_id().cast("long")))
    // #partitions × #strata rows — control-plane sized; the prefix-sum
    // window runs over THIS frame, never the corpus
    val stats = ordered.groupBy(col("__pid"), col(strataCol))
      .agg(count(lit(1)).as("__cnt"), min(col("__mid")).as("__base"))
    val byStratum = Window.partitionBy(col(strataCol)).orderBy(col("__pid"))
    val offsets = stats.withColumn("__off",
      coalesce(sum(col("__cnt"))
        .over(byStratum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    ordered
      .join(broadcast(offsets), Seq("__pid", strataCol))
      .withColumn("__r", col("__off") + (col("__mid") - col("__base")) + 1L)
      .drop("__mid", "__pid", "__cnt", "__base", "__off")
  }

  /** Temperature-flattened corpus mixture — the standard multilingual /
    * multi-source LM sampling rule (exponent-smoothed shares, as in
    * XLM's p_i^α rescaling, arXiv:1901.07291 §3.1): per stratum, the
    * raw token share
    * p_s = tokens_s / Σ tokens and the flattened sampling share
    * q_s ∝ p_s^α, with `boost` = q_s / p_s — the factor a sampler
    * multiplies into per-document rates (> 1 upsamples tail strata,
    * < 1 downsamples the head; α = 1 is proportional sampling, α = 0
    * is [[mixWeights]]' equalizing rule).
    *
    * α is FIXED at 0.5: IEEE-754 `sqrt` is correctly rounded, so both
    * engines compute bit-identical flattened weights from the same
    * integer token counts — a generic `pow(p, α)` hinges on libm
    * rounding and would break the oracle hash (the same reason x41
    * ranks by exact ratios instead of `ln`). q_s ∝ √p_s ∝ √tokens_s,
    * so the shares are computed directly from √tokens_s with the
    * cross-stratum normalizer Σ √tokens summed as DECIMAL over
    * 6-decimal-rounded terms — double summation order across strata is
    * nondeterministic, decimal addition is exact (the repo-wide
    * DECIMAL-sum pattern). α = 0.5 sits inside the α ∈ [0.3, 0.7] band
    * the literature uses.
    *
    * Scale shape: identical to [[mixWeights]] — one stratum-keyed
    * aggregation (map-side combined) plus a broadcast one-row total;
    * the normalizer rides the same totals frame, no second corpus pass.
    * Output: (stratum, n_docs, n_tokens, token_share, temp_share,
    * boost).
    */
  def temperatureMixWeights(docs: DataFrame, stratumCol: String,
      textCol: String = "text"): DataFrame = {
    val per = docs.filter(col(stratumCol).isNotNull)
      .select(col(stratumCol).as("stratum"),
        size(tokens(col(textCol))).cast("long").as("__n_tok"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"), sum("__n_tok").as("n_tokens"))
      .withColumn("__s",
        round(sqrt(col("n_tokens").cast("double")), 6).cast("decimal(28,6)"))
    val totals = per.agg(sum("n_tokens").as("__tot"), sum("__s").as("__ssum"))
    per.crossJoin(broadcast(totals))
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("__tot"), 6).as("token_share"),
        round(col("__s").cast("double") / col("__ssum").cast("double"), 6)
          .as("temp_share"),
        round((col("__s").cast("double") / col("__ssum").cast("double")) /
          (col("n_tokens").cast("double") / col("__tot")), 6).as("boost"))
  }
}
