package graft

import org.apache.spark.sql.functions._

import graft.ext.LanguageModel

/** Hand-computed fixture plus corpus-level invariants for the x107/
  * x108 CCNet-style bigram-LM fluency family. The DuckDB oracle
  * hash-verifies the full corpus every round; this pins the smoothing
  * arithmetic, the fixed-point flooring, the pruning fallback, and
  * the bucket construction on crafted edges.
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, "a b a b", "en"),  // bigrams (a,b),(b,a),(a,b)
    (2L, "a b c", "en"),    // bigrams (a,b),(b,c)
    (3L, "solo", "en"),     // <2 tokens → no bigram → dropped
    (4L, "a b a b", null)   // null lang → out of scope
  ).toDF("doc_id", "text", "lang")

  test("lmScore: hand-computed add-one smoothing with minCount pruning") {
    // corpus counts (en): (a,b)=3, (b,a)=1, (b,c)=1; c1: a=3, b=2; V=3.
    // minCount=2 keeps only (a,b); pruned bigrams score at the unseen
    // floor 1/(c1+V).
    //   (a,b): ln(4/6)·1e6 → floor(-405465.108) = -405466
    //   (b,a), (b,c): ln(1/5)·1e6 → floor(-1609437.912) = -1609438
    val out = LanguageModel.lmScore(fixture, minCount = 2L)
      .orderBy("doc_id")
      .select("doc_id", "lang", "n_bigrams", "lp_micro", "avg_logprob")
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, "en", 3L, -405466L - 1609438L - 405466L, -0.80679),
      (2L, "en", 2L, -405466L - 1609438L, -1.007452)))
  }

  test("lmScore: minCount=1 keeps every bigram — no floor fallback") {
    // (b,a) now kept: p=(1+1)/(2+3)=2/5, ln(0.4)·1e6 → floor = -916291
    val out = LanguageModel.lmScore(fixture, minCount = 1L)
      .filter(col("doc_id") === 1L)
      .select("lp_micro").as[Long].head()
    assert(out === -405466L - 916291L - 405466L)
  }

  test("perplexityBuckets: rank is most-fluent-first, thirds by integer arithmetic") {
    val out = LanguageModel.perplexityBuckets(fixture, minCount = 2L)
      .orderBy("doc_id")
      .select("doc_id", "lang", "ppl_rank", "n_lang", "bucket")
      .as[(Long, String, Long, Long, String)].collect().toSeq
    // d1 avg=-0.80679 (more fluent) ranks 1 → bucket (0*3)//2=0 head;
    // d2 ranks 2 → (1*3)//2=1 middle
    assert(out === Seq(
      (1L, "en", 1L, 2L, "head"),
      (2L, "en", 2L, 2L, "middle")))
  }

  test("corpus invariants: strictly negative scores, dense per-lang ranks, balanced thirds") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val scored = LanguageModel.lmScore(docs, minCount = 2L).cache()
    assert(scored.filter(col("lp_micro") >= 0L ||
      col("avg_logprob") >= 0.0).count() === 0L)
    val buckets = LanguageModel.perplexityBuckets(docs, minCount = 2L).cache()
    // ranks dense 1..n per lang
    val bad = buckets.groupBy("lang").agg(
        count(lit(1)).as("n"), max("ppl_rank").as("mx"),
        countDistinct("ppl_rank").as("d"))
      .filter(col("mx") =!= col("n") || col("d") =!= col("n"))
    assert(bad.count() === 0L)
    // bucket populations within each lang differ by at most one
    val spread = buckets.groupBy("lang", "bucket").agg(count(lit(1)).as("c"))
      .groupBy("lang").agg((max("c") - min("c")).as("sp"))
      .filter(col("sp") > 1L)
    assert(spread.count() === 0L)
    scored.unpersist(); buckets.unpersist()
  }

  test("plan: the score pass broadcasts the pruned model — no shuffle join, no per-lang window") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val p = LanguageModel.lmScore(docs, minCount = 2L)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    val pb = LanguageModel.perplexityBuckets(docs, minCount = 2L)
      .queryExecution.executedPlan.toString
    // rankWithinStrata's contract: no corpus-wide single-partition
    // exchange anywhere in the bucket plan
    assert(!pb.contains("SinglePartition"), pb)
  }

  // ---- stored lifecycle (x109) --------------------------------------

  private def tmpIdx(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_lm_$tag")
    d.toFile.deleteOnExit(); d.toString
  }

  private def scores(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "lang", "n_bigrams", "lp_micro")
      .as[(Long, String, Long, Long)].collect().toSet

  test("stored model ≡ in-memory: self-scoring through the index round-trips bit-for-bit") {
    val idx = tmpIdx("roundtrip")
    LanguageModel.writeLmIndex(fixture, idx)
    assert(scores(LanguageModel.scoreAgainstLmIndex(fixture, idx, minCount = 2L))
      === scores(LanguageModel.lmScore(fixture, minCount = 2L)))
  }

  test("replayed append collapses; a distinct batch_id counts again") {
    val even = fixture.filter(col("doc_id") % 2 === 0)
    val odd = fixture.filter(col("doc_id") % 2 =!= 0)
    val once = tmpIdx("once"); val replay = tmpIdx("replay")
    LanguageModel.writeLmIndex(even, once)
    LanguageModel.appendLmIndex(odd, once, "b1")
    LanguageModel.writeLmIndex(even, replay)
    LanguageModel.appendLmIndex(odd, replay, "b1")
    LanguageModel.appendLmIndex(odd, replay, "b1") // at-least-once redelivery
    val s1 = scores(LanguageModel.scoreAgainstLmIndex(fixture, once, 1L))
    assert(scores(LanguageModel.scoreAgainstLmIndex(fixture, replay, 1L)) === s1)
    // same docs under a NEW batch_id = a declared second increment:
    // counts double, scores move
    LanguageModel.appendLmIndex(odd, replay, "b2")
    assert(scores(LanguageModel.scoreAgainstLmIndex(fixture, replay, 1L)) !== s1)
  }

  test("compaction: scores invariant, replay collapsed durably, file count bounded") {
    val idx = tmpIdx("compact")
    LanguageModel.writeLmIndex(fixture.filter(col("doc_id") % 2 === 0), idx)
    LanguageModel.appendLmIndex(fixture.filter(col("doc_id") % 2 =!= 0), idx, "b1")
    LanguageModel.appendLmIndex(fixture.filter(col("doc_id") % 2 =!= 0), idx, "b1")
    val before = scores(LanguageModel.scoreAgainstLmIndex(fixture, idx, 1L))
    LanguageModel.compactLmIndex(spark, idx)
    assert(scores(LanguageModel.scoreAgainstLmIndex(fixture, idx, 1L)) === before)
    // the replayed rows are gone from STORAGE, not just merged at read
    val stored = spark.read.parquet(s"$idx/bigrams")
    assert(stored.count() === stored.distinct().count())
  }

  test("append-side trigger: maxFiles=1 keeps the live file count at one") {
    val idx = tmpIdx("trigger")
    LanguageModel.writeLmIndex(fixture.filter(col("doc_id") === 1L), idx)
    LanguageModel.appendLmIndex(fixture.filter(col("doc_id") === 2L), idx, "b1",
      maxFiles = 1)
    LanguageModel.appendLmIndex(fixture.filter(col("doc_id") === 4L), idx, "b2",
      maxFiles = 1)
    val files = new java.io.File(s"$idx/bigrams").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files === 1, s"expected 1 live data file after inline compaction, got $files")
  }

  test("LM-gated curation composition: only head/middle survive, budget respected") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val keep = LanguageModel.perplexityBuckets(docs, minCount = 2L)
      .filter(col("bucket") =!= "tail").select("doc_id", "lang", "bucket")
    val scored = graft.ext.Sampling.meritTokens(docs)
      .join(keep, Seq("doc_id")).select("doc_id", "merit", "n_tokens")
    val sel = graft.ext.Sampling
      .selectToBudgetBinnedFrom(scored, budgetTokens = 9000L).cache()
    // every selected doc is a non-tail survivor; the budget binds
    assert(sel.join(keep, Seq("doc_id"), "left_anti").count() === 0L)
    val total = sel.agg(sum("n_tokens")).as[Long].head()
    assert(total <= 9000L && total > 0L)
    // binned ≡ prefix rule on this composed input (the x74 contract,
    // re-pinned on the gated frame)
    val prefix = graft.ext.Sampling.selectToBudgetFrom(scored, 9000L)
    assert(sel.select("doc_id").as[Long].collect().toSet ===
      prefix.select("doc_id").as[Long].collect().toSet)
    sel.unpersist()
  }

  test("streaming LM replay: parity with the batch form, redelivery idempotent") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val root = tmpIdx("stream")
    val streamed = graft.streaming.DocStream.lmScoreReplay(spark, docs,
      s"$root/index", s"$root/out", nBatches = 4, minCount = 2L)
    // batch-form truth: for each batch b, a model built from batches
    // < b scores batch b — the sequential-ingest semantics
    val expected = (1 to 3).map { b =>
      val idx = tmpIdx(s"streamtruth$b")
      LanguageModel.writeLmIndex(
        docs.filter(pmod(col("doc_id"), lit(4L)) < b), idx)
      scores(LanguageModel.scoreAgainstLmIndex(
        docs.filter(pmod(col("doc_id"), lit(4L)) === b), idx, 2L))
    }.reduce(_ ++ _)
    assert(scores(streamed) === expected)
    // at-least-once redelivery: re-appending batch 3 under its own
    // stamp leaves the stored model unchanged for any later reader
    val before = scores(LanguageModel.scoreAgainstLmIndex(
      docs.filter(pmod(col("doc_id"), lit(4L)) === 0), s"$root/index", 2L))
    LanguageModel.appendLmIndex(
      docs.filter(pmod(col("doc_id"), lit(4L)) === 3), s"$root/index", "b3")
    assert(scores(LanguageModel.scoreAgainstLmIndex(
      docs.filter(pmod(col("doc_id"), lit(4L)) === 0), s"$root/index", 2L))
      === before)
  }

  test("held-out scoring: OOV-head bigrams drop, fully-OOV docs drop entirely") {
    val idx = tmpIdx("oov")
    // train: only "a b" bigrams exist; heads = {a}
    LanguageModel.writeLmIndex(
      Seq((10L, "a b", "en"), (11L, "a b", "en")).toDF("doc_id", "text", "lang"), idx)
    val held = Seq(
      (20L, "a b c", "en"),  // (a,b) scorable; (b,c) head 'b' OOV → drops
      (21L, "x y", "en")     // fully OOV → absent
    ).toDF("doc_id", "text", "lang")
    val out = LanguageModel.scoreAgainstLmIndex(held, idx, minCount = 1L)
      .select("doc_id", "n_bigrams").as[(Long, Long)].collect().toMap
    assert(out === Map(20L -> 1L))
  }

  test("dsirReplay: streamed ≡ fixed-target + strictly-earlier-raw batch truth") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val target = docs.filter(col("source") === "src1")
    val root = tmpIdx("dsirstream")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val streamed = graft.streaming.DocStream.dsirReplay(spark, docs, target,
      s"$root/index", s"$root/out", nBatches = 4, minCount = 2L)
    // batch-form truth: a FIXED target model + per-batch raw models of
    // strictly earlier batches, through the same stored lifecycle
    val tIdx = tmpIdx("dsirstreamT")
    LanguageModel.writeLmIndex(target, tIdx)
    val expected = (1 to 3).map { b =>
      val rIdx = tmpIdx(s"dsirstreamR$b")
      LanguageModel.writeLmIndex(
        docs.filter(pmod(col("doc_id"), lit(4L)) < b), rIdx)
      rows(LanguageModel.dsirAgainstLmIndexes(
        docs.filter(pmod(col("doc_id"), lit(4L)) === b), tIdx, rIdx, 2L))
    }.reduce(_ ++ _)
    assert(rows(streamed) === expected)
    // the target model never learned from the stream: its stored
    // bigrams still carry only the pre-stream 'build' stamp
    assert(spark.read.parquet(s"$root/index/target/bigrams")
      .select("batch_id").distinct().collect().map(_.getString(0)).toSeq
      === Seq("build"))
  }

  test("dsirImportance: target-like docs outrank off-target; target-OOV docs drop; integer-exact") {
    val docs = Seq(
      // the target slice: a tight phrase distribution
      (1L, "the cat sat on the mat", "en", "t"),
      (2L, "the dog sat on the mat", "en", "t"),
      // off-target but scorable: every head is in the target vocabulary,
      // the continuations are not
      (3L, "the mat dog on sat cat", "en", "o"),
      // off-target and target-unscorable: no bigram head in the target
      // vocabulary — no importance estimate exists, the doc must drop
      (4L, "zz1 zz2 zz3 zz4", "en", "o")
    ).toDF("doc_id", "text", "lang", "source")
    val out = LanguageModel.dsirImportance(docs, col("source") === "t",
      minCount = 1L)
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === Set(1L, 2L, 3L),
      "target-OOV docs carry no importance estimate and drop")
    val imp = rows.view.mapValues(_.getAs[Double]("importance")).toMap
    assert(imp(1L) > imp(3L) && imp(2L) > imp(3L),
      "the target model must prefer its own distribution")
    assert(imp(1L) > 0.0,
      "a verbatim target doc is better explained by the target model")
    // importance is the difference of the exact integer micro-averages
    // of the columns beside it — no float path anywhere
    rows.values.foreach { r =>
      def avgMicro(lp: Long, n: Long): Long =
        java.lang.Long.signum(lp) * ((math.abs(lp) * 2 + n) / (n * 2))
      val expectMicro = avgMicro(r.getLong(3), r.getLong(2)) -
        avgMicro(r.getLong(5), r.getLong(4))
      assert(r.getAs[Long]("importance_micro") === expectMicro)
      assert(r.getAs[Double]("importance") === expectMicro.toDouble / 1e6)
    }
  }

  test("gumbelTopN: deterministic per seed, weight-monotone, without replacement") {
    import graft.ext.Sampling
    val scored = (1L to 40L).map(i => (i, i * 1000L)).toDF("id", "lw")
    def draw(seed: String) = Sampling.gumbelTopN(scored, "lw", "id", 10, seed)
      .select("id", "rank", "key_micro")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val a = draw("s1")
    assert(a === draw("s1"), "same corpus + same seed must redraw identically")
    assert(a.map(_._1).distinct.size === 10, "without replacement: n distinct rows")
    assert(a.map(_._2) === (1 to 10), "ranks are dense 1..n")
    assert(draw("s2") !== a, "a different seed is a different draw")
    // an overwhelming log-weight always wins: the Gumbel noise spans a
    // few dozen nats at most, so +1000 nats of weight dominates any draw
    val loaded = scored.union(Seq((999L, 1000000000L)).toDF("id", "lw"))
    val top = Sampling.gumbelTopN(loaded, "lw", "id", 1, "s1").collect()(0)
    assert(top.getAs[Long]("id") === 999L,
      "selection probability must be monotone in the weight")
  }

  test("dsirResample: selection ∝ exp(importance), seed-stable, oracle-shaped output") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en", "t"),
      (2L, "the dog sat on the mat", "en", "t"),
      (3L, "the mat dog on sat cat", "en", "o"),
      (5L, "the cat sat on the mat", "en", "o")
    ).toDF("doc_id", "text", "lang", "source")
    val out = LanguageModel.dsirResample(docs, col("source") === "t",
      n = 2, seed = "g1", minCount = 1L)
    val rows = out.collect()
    assert(rows.map(_.getInt(5)).toSeq.sorted === Seq(1, 2), "ranks 1..n")
    assert(rows.map(_.getLong(0)).distinct.length === 2)
    // key = importance_micro + gumbel_micro exactly (integer arithmetic)
    rows.foreach { r =>
      assert(r.getAs[Long]("key_micro") ===
        math.round(r.getAs[Double]("importance") * 1e6) +
          r.getAs[Long]("gumbel_micro"))
    }
    // deterministic replay under the seed
    val again = LanguageModel.dsirResample(docs, col("source") === "t",
      n = 2, seed = "g1", minCount = 1L).collect().map(_.toSeq).toSeq
    assert(again === rows.map(_.toSeq).toSeq)
  }
}
