package graft

import org.apache.spark.sql.functions._

import graft.ext.{Sampling, TextAnalysis}

/** Hand-computed fixtures for the round-4 curation additions:
  * repetition metrics and corpus-mixing weights (the DuckDB oracle
  * covers the corpus; these pin the arithmetic on crafted edges).
  */
class TextMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("filter cascade: hand-computed attrition, sole-kill, and funnel order") {
    // 25 tokens of prose-ish english: passes everything
    val good = "the cat sat and the dog ran of a hill is near and " +
      "the bird flew of a tree is tall and more words here"        // 25 tok, stopword-rich, distinct-rich
    val docs = Seq(
      (1L, good, "en"),
      // f1 only: 5 tokens but stopword-rich ("the of a and is" = 100% stop), distinct
      (2L, "the of a and is", "en"),
      // f3 only: fine text, excluded lang
      (3L, good, "zh"),
      // f2 + f4: 20 identical non-stopword tokens — low stopword AND repetitive
      (4L, Seq.fill(20)("spam").mkString(" "), "en"),
      // all four: short, no stopwords, bad lang, repetitive
      (5L, "x x x", null)
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.filterCascade(docs).orderBy("ord")
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    // doc1: passes all. doc2: f1=1 (5<20) — stop=5*1000=5000 ≥ 5*30 so f2=0; sole f1.
    // doc3: f3 only. doc4: f2 (0 < 600) + f4 (1*1000 < 20*500). doc5: f1,f2,f3,f4.
    assert(out === Seq(
      (1, "too_short",     2L, 1L, 3L),  // fails: 2,5; sole: 2; pass f1: 1,3,4
      (2, "low_stopword",  2L, 0L, 2L),  // fails: 4,5; sole: none; pass f1,f2: 1,3
      (3, "lang_excluded", 2L, 1L, 1L),  // fails: 3,5; sole: 3; pass f1..f3: 1
      (4, "repetitive",    2L, 0L, 1L))) // fails: 4,5; sole: none; survivors: 1
  }

  test("filter cascade is one scan and a single-row aggregate (nothing corpus-sized after)") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val plan = TextAnalysis.filterCascade(docs).queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
    // exactly one Aggregate, grouping by nothing (global single row)
    val aggs = plan.collect { case a: Aggregate => a }
    assert(aggs.length === 1 && aggs.head.groupingExpressions.isEmpty)
    // exactly one scan relation
    def leaves(p: LogicalPlan): Seq[LogicalPlan] = p.collectLeaves()
    assert(leaves(plan).length === 1)
  }

  test("repetition metrics on a crafted degenerate document") {
    val docs = Seq(
      (1L, "a a a b"),          // 4 tokens, 2 distinct, top 3; bigrams [a a, a a, a b]: 3 total, 2 distinct
      (2L, "w x y z"),          // fully distinct
      (3L, "solo")              // <2 tokens → no bigrams → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionMetrics(docs).orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 4L, 0.5, 0.75, 0.333333), // 1 − 2/3 rounded to 6 places
      (2L, 4L, 1.0, 0.25, 0.0)))
  }

  test("repetition-metric invariants hold across a generated corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (0 until 200).map { i =>
      val n = 2 + rnd.nextInt(50)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(docs).collect()
    assert(m.length === 200, "every >=2-token doc must survive")
    m.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val df = r.getAs[Double]("distinct_token_frac")
      val tf = r.getAs[Double]("top_token_frac")
      val bg = r.getAs[Double]("dup_bigram_frac")
      assert(n >= 2)
      assert(df > 0.0 && df <= 1.0, s"distinct_frac out of range: $df")
      // the top token appears at least n/n_distinct times (pigeonhole)
      assert(tf >= 1.0 / n - 1e-9 && tf <= 1.0, s"top_frac out of range: $tf")
      assert(bg >= 0.0 && bg < 1.0, s"dup_bigram_frac out of range: $bg")
      // fractions decode back to integer counts
      assert(math.abs(df * n - math.round(df * n)) < 1e-3)
    }
  }

  test("mix-weight invariants: shares sum to 1, weights restore the uniform target") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 300).map { i =>
      val lang = Seq("en", "es", "de", "fr", "zh")(rnd.nextInt(5))
      (i.toLong, lang, Seq.fill(1 + rnd.nextInt(30))("w").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val rows = Sampling.mixWeights(docs, "lang").collect()
    val shareSum = rows.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"token shares must sum to 1: $shareSum")
    val k = rows.length
    val tot = rows.map(_.getAs[Long]("n_tokens")).sum
    rows.foreach { r =>
      val restored = r.getAs[Double]("mix_weight") * r.getAs[Long]("n_tokens")
      assert(math.abs(restored - tot.toDouble / k) < tot * 1e-5,
        s"weight x tokens must hit the uniform target: $restored vs ${tot.toDouble / k}")
    }
  }

  test("contamination screen: copied benchmark text flags, disjoint text does not") {
    import graft.ext.Dedup
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // contains benchmark 5-grams
      (2L, "one two three four five six seven"),             // disjoint
      (3L, "tiny doc")                                       // <5 tokens → no shingles
    ).toDF("doc_id", "text")
    val out = Dedup.contaminationScreen(docs, bench, n = 5, minShared = 1L)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    // doc 1 shares the benchmark's 5-grams ("alpha..epsilon" etc.):
    // benchmark has 3 distinct 5-grams, doc 1 contains all 3 of them
    assert(out === Seq((1L, 3L, true), (2L, 0L, false), (3L, 0L, false)))
  }

  test("bloom-pruned contamination screen equals the exact screen") {
    import graft.ext.Dedup
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    def sentence(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bench = (100L until 120L).map(i => (i, sentence(8 + rnd.nextInt(8))))
      .toDF("doc_id", "text")
    // half the docs embed a benchmark row verbatim (guaranteed overlap),
    // half are fresh draws (overlap only by chance collisions of 5-grams)
    val benchTexts = bench.collect().map(_.getString(1))
    val docs = (0L until 60L).map { i =>
      val txt =
        if (i % 2 == 0) sentence(3) + " " + benchTexts((i / 2 % 20).toInt) + " " + sentence(3)
        else sentence(12 + rnd.nextInt(10))
      (i, txt)
    }.toDF("doc_id", "text")
    val exact = Dedup.contaminationScreen(docs, bench, n = 5, minShared = 1L)
    // small expectedItems + high fpp force real Bloom false positives
    // through the pre-gate; the confirm join must still kill them all
    val bloom = Dedup.contaminationScreenBloom(docs, bench, n = 5,
      minShared = 1L, expectedItems = Some(64L), fpp = 0.4)
    assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty,
      "bloom-pruned screen must be bit-identical to the exact screen")
    assert(bloom.count() === 60L)

    // force the broadcast carrier (maxLiteralBytes = 0): same exact
    // output, and the plan must gate through might_contain_bc instead
    // of a plan-literal blob
    val bcast = Dedup.contaminationScreenBloom(docs, bench, n = 5,
      minShared = 1L, maxLiteralBytes = 0L)
    assert(bcast.exceptAll(exact).isEmpty && exact.exceptAll(bcast).isEmpty,
      "broadcast-carried gate must stay bit-identical to the exact screen")
    assert(org.apache.spark.sql.GraftSqlBridge.analyzedPlan(bcast)
      .toString.toLowerCase.contains("might_contain_bc"),
      "past maxLiteralBytes the gate must ride the broadcast expression")
  }

  test("bloom contamination screen: auto-sizing keeps the blob KB-scale") {
    import graft.ext.Dedup
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val docs = (0L until 10L).map(i => (i, s"alpha beta gamma delta epsilon tok$i"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    // default expectedItems = None sizes the filter from the measured
    // bench cardinality (~2 shingles here), so the literal carried by
    // might_contain must be bytes, not the ~5 MB a 4M-item guess built
    val auto = Dedup.contaminationScreenBloom(docs, bench, n = 5)
    val blobSizes = GraftSqlBridge.analyzedPlan(auto).collect { case node =>
      node.expressions.flatMap(_.collect {
        case Literal(bytes: Array[Byte], BinaryType) => bytes.length })
    }.flatten
    assert(blobSizes.nonEmpty, "expected a binary bloom literal in the plan")
    assert(blobSizes.max < 64 * 1024,
      s"auto-sized bloom blob should be KB-scale on this fixture, got $blobSizes")
  }

  test("bloom contamination screen: empty benchmark keeps every doc clean") {
    import graft.ext.Dedup
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Dedup.contaminationScreenBloom(docs, bench)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out === Seq((1L, 0L, false)))
  }

  test("zipped-slice shingles equal the specification (lambda) form") {
    import graft.functions.Portable._
    val df = Seq("a b c d e", "x y", "solo", "p q r", "", "a a a a")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (n <- Seq(2, 3)) {
      val spec = df.select(col("doc_id"),
        explode(shingles(tokens(col("text")), n)).as("s"))
      val fast = df.select(col("doc_id"),
          explode(shingleStructs(tokens(col("text")), n)).as("st"))
        .select(col("doc_id"), shingleText(col("st"), n).as("s"))
      assert(fast.exceptAll(spec).isEmpty && spec.exceptAll(fast).isEmpty,
        s"n=$n shingle forms diverge")
      assert(fast.count() === spec.count(), s"n=$n count mismatch")
    }
  }

  test("mix weights equalize token mass across strata") {
    val docs = Seq(
      (1L, "en", "one two three four five six"),   // 6 tokens
      (2L, "en", "one two"),                       // 2 tokens → en: 8
      (3L, "fr", "un deux"),                       // fr: 2
      (4L, null.asInstanceOf[String], "dropped row")
    ).toDF("doc_id", "lang", "text")
    val out = Sampling.mixWeights(docs, "lang").orderBy("stratum")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    // total 10 tokens over 2 strata → target 5 per stratum
    assert(out === Seq(
      ("en", 2L, 8L, 0.8, 0.625),   // 5/8
      ("fr", 1L, 2L, 0.2, 2.5)))    // 5/2
  }

  test("temperature mix flattens toward the tail: hand-computed sqrt shares") {
    // en 9 tokens, fr 1 token → p = (0.9, 0.1); √tokens = (3, 1) →
    // q = (0.75, 0.25): the tail stratum is boosted 2.5×, the head
    // damped to 5/6 — and q still orders the same way p does
    val docs = Seq(
      (1L, "en", "a b c d e f g h i"), // 9 tokens
      (2L, "fr", "x"),                 // 1 token
      (3L, null.asInstanceOf[String], "dropped row")
    ).toDF("doc_id", "lang", "text")
    val out = Sampling.temperatureMixWeights(docs, "lang").orderBy("stratum")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("en", 1L, 9L, 0.9, 0.75, 0.833333),
      ("fr", 1L, 1L, 0.1, 0.25, 2.5)))
    // flattening invariants on the real fixture: shares sum to 1, the
    // head stratum is damped (boost < 1) and the tail boosted (> 1),
    // with q strictly between uniform and proportional for both
    val fix = Sampling.temperatureMixWeights(
      sources.Tables.load(spark, sf, "documents"), "lang").collect()
    assert(math.abs(fix.map(_.getAs[Double]("temp_share")).sum - 1.0) < 1e-4)
    val k = fix.length.toDouble
    fix.foreach { r =>
      val p = r.getAs[Double]("token_share")
      val q = r.getAs[Double]("temp_share")
      if (p > 1 / k) assert(q < p && q > 1 / k, s"head not flattened: $r")
      else if (p < 1 / k) assert(q > p && q < 1 / k, s"tail not flattened: $r")
    }
  }

  test("heavy hitters: exact per-stratum top tokens, ties by token") {
    val docs = Seq(
      (1L, "en", "a a a b b c"),
      (2L, "en", "b c d"),
      (3L, "fr", "x y y"),
      (4L, null.asInstanceOf[String], "dropped dropped")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.heavyHitters(docs, "lang", k = 2)
      .orderBy("lang", "rank")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    // en: a=3, b=3 tie -> a first; fr: y=2, x=1
    assert(out.toSeq === Seq(
      ("en", 1, "a", 3L), ("en", 2, "b", 3L),
      ("fr", 1, "y", 2L), ("fr", 2, "x", 1L)))
  }

  test("collocation lift matches the hand-computed exact ratio") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // tokens: a=3, b=3, c=1, M=7; bigrams: (a,b)=3, (b,a)=1, (b,c)=1, N=5
    val out = TextAnalysis.collocationLift(docs, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size === 3)
    val ab = out(("a", "b"))
    assert((ab.getLong(2), ab.getLong(3), ab.getLong(4)) === ((3L, 3L, 3L)))
    // lift = (3/5) / ((3/7)(3/7)) = 147/45
    assert(ab.getDouble(5) === math.rint(147.0 / 45.0 * 1e6) / 1e6)
    val bc = out(("b", "c"))
    // lift = (1/5) / ((3/7)(1/7)) = 49/15
    assert(bc.getDouble(5) === math.rint(49.0 / 15.0 * 1e6) / 1e6)
    // a doc too short for bigrams contributes tokens only, no crash
    val out1 = TextAnalysis.collocationLift(
      Seq((1L, "solo")).toDF("doc_id", "text"), minCount = 1L)
    assert(out1.count() === 0)
  }
}
