package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Sampling, TextAnalysis}

class ClusterSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain, triangle, and singletons resolve to min id") {
    // components: {1,2,3,4} (a chain — worst case for label propagation),
    // {10,11,12} (a triangle), {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("resolveClusters: unpaired docs are their own singleton representatives") {
    val docs = (1L to 6L).toDF("doc_id")
    val pairs = Seq((2L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.resolveClusters(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(out === Seq(
      (1L, 1L, 1L, true), (2L, 2L, 2L, true), (3L, 3L, 1L, true),
      (4L, 4L, 1L, true), (5L, 2L, 2L, false), (6L, 6L, 1L, true)))
    // dedup = filter(keep): exactly one survivor per cluster
    assert(out.count(_._4) === 5)
  }

  test("leakage-safe split: no near-dup pair straddles train/eval, singletons split too") {
    // components {1,2,3,4}, {10,11,12}, {20,21}; 30..35 are singletons
    val docs = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L) ++ (30L to 35L))
      .toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val out = Dedup.leakageSafeSplit(docs, pairs, trainPct = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length === docs.count())
    // every cluster maps to exactly one split — leakage impossible
    val perCluster = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(perCluster.values.forall(_.size === 1))
    // explicitly: each edge's endpoints agree
    val bySide = out.map(r => r._1 -> r._3).toMap
    for ((a, b) <- Seq((1L, 2L), (3L, 4L), (10L, 12L), (20L, 21L)))
      assert(bySide(a) === bySide(b), s"pair ($a,$b) straddles the split")
    // at 50% both sides are populated on this frame (hash dispersion
    // sanity — 9 clusters land on both sides for this fixture)
    assert(out.map(_._3).toSet === Set("train", "eval"))
    // deterministic: identical assignment on a second run
    val again = Dedup.leakageSafeSplit(docs, pairs, trainPct = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(again.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  test("leakage-safe split honors the rate at the cluster grain, 0 and 100 degenerate") {
    val docs = (1L to 400L).toDF("doc_id")
    val pairs = spark.emptyDataFrame.select(lit(0L).as("doc_a"), lit(0L).as("doc_b"))
      .filter(lit(false)) // all singletons
    val all = Dedup.leakageSafeSplit(docs, pairs, trainPct = 100).collect()
    assert(all.forall(_.getString(2) == "train"))
    val none = Dedup.leakageSafeSplit(docs, pairs, trainPct = 0).collect()
    assert(none.forall(_.getString(2) == "eval"))
    val half = Dedup.leakageSafeSplit(docs, pairs, trainPct = 50).collect()
    val trainN = half.count(_.getString(2) == "train")
    // hash32 spreads ~uniformly: 400 singleton clusters at 50% should
    // land well inside [140, 260] (±5.5σ)
    assert(trainN > 140 && trainN < 260, s"suspicious split balance: $trainN/400")
  }

  test("shuffle-shard: total coverage, contiguous positions, reproducible, seed reshuffles") {
    val docs = (1L to 2000L).toDF("doc_id")
    val out = Sampling.shuffleShards(docs, "doc_id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 2000)
    assert(out.map(_._1).toSet === (1L to 2000L).toSet, "every doc exactly once")
    assert(out.forall(r => r._2 >= 0 && r._2 < 8))
    // positions are 1..n contiguous per shard
    for ((_, rows) <- out.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    // balance: 2000/8 = 250 expected, allow wide slack
    assert(out.groupBy(_._2).values.map(_.length).forall(n => n > 150 && n < 350))
    // reproducible under the same seed
    val again = Sampling.shuffleShards(docs, "doc_id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
    // a different epoch seed produces a different assignment
    val epoch1 = Sampling.shuffleShards(docs, "doc_id", nShards = 8, seed = "epoch1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(epoch1.sortBy(_._1).toSeq !== out.sortBy(_._1).toSeq)
  }

  test("shuffle-shard plan has no global sort or unpartitioned window") {
    val docs = (1L to 100L).toDF("doc_id")
    val plan = Sampling.shuffleShards(docs, "doc_id", nShards = 8)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Sort, Window => LWindow}
    assert(plan.collect { case s: Sort if s.global => s }.isEmpty, "global sort")
    assert(plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty,
      "unpartitioned window")
  }

  test("stratified sampling is deterministic and respects per-stratum rates") {
    val rows = (for (i <- 1L to 2000L) yield (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "lang")
    val sample = Sampling.stratifiedByHash(rows, "lang", "doc_id",
      Seq("en" -> 50, "fr" -> 10), defaultPct = 0)
    val again = Sampling.stratifiedByHash(rows, "lang", "doc_id",
      Seq("en" -> 50, "fr" -> 10), defaultPct = 0)
    // determinism: same rows both runs
    assert(sample.collect().toSet === again.collect().toSet)
    val byLang = sample.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 docs per stratum; md5-uniform membership ⇒ counts near rate
    assert(byLang("en") > 400 && byLang("en") < 600, byLang)
    assert(byLang("fr") > 50 && byLang("fr") < 160, byLang)
  }

  test("tfidf top terms: rare term outranks common term within a doc") {
    val docs = Seq(
      (1L, "alpha alpha zebra common common common"),
      (2L, "common beta beta"),
      (3L, "common gamma")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, k = 2)
      .filter(col("doc_id") === 1L).orderBy("rank")
      .select("term").as[String].collect().toSeq
    // doc 1: alpha tf=2 df=1 → 6.0; zebra tf=1 df=1 → 3.0; common tf=3 df=3 → 3.0
    // tie at 3.0 broken by term asc: common < zebra
    assert(top === Seq("alpha", "common"))
  }

  test("weighted interleave: every prefix of key order holds sources in " +
    "proportion to their weights") {
    // three sources with weights 1:2:4 via per-doc weight 1 and doc
    // counts 10/20/40
    val d = (1L to 70L).map { id =>
      val src = if (id <= 10) "a" else if (id <= 30) "b" else "c"
      (id, src)
    }.toDF("doc_id", "source")
    val keys = Sampling.weightedInterleave(d, "source", "doc_id", lit(1L))
      .orderBy(col("ikey"), col("source"), col("doc_id"))
      .select("source").as[String].collect()
    assert(keys.length === 70)
    // stride scheduling's defining property: in any prefix, each
    // source's count deviates from its proportional share by < 1 stride
    val weights = Map("a" -> 10.0, "b" -> 20.0, "c" -> 40.0)
    val total = weights.values.sum
    (1 to keys.length).foreach { n =>
      val counts = keys.take(n).groupBy(identity).view.mapValues(_.length)
      weights.foreach { case (s, w) =>
        val expected = n * w / total
        val got = counts.getOrElse(s, 0).toDouble
        assert(math.abs(got - expected) <= 1.0 + 1e-9,
          s"prefix $n: source $s has $got docs, expected ~$expected")
      }
    }
    // determinism: same seed → identical keys
    val again = Sampling.weightedInterleave(d, "source", "doc_id", lit(1L))
      .orderBy(col("ikey"), col("source"), col("doc_id"))
      .select("source").as[String].collect()
    assert(keys.toSeq === again.toSeq)
  }

  test("weighted interleave: rank is the range-partitioned two-phase " +
    "form — no per-source window, no single-partition exchange") {
    val d = (1L to 50L).map(id => (id, s"s${id % 3}")).toDF("doc_id", "source")
    val df = Sampling.weightedInterleave(d, "source", "doc_id", lit(1L))
    df.collect() // finalize AQE before reading the plan
    val plan = df.queryExecution.executedPlan.toString
    // the scalable within-source rank: ONE range exchange on
    // (source, __h, id) — a giant source spreads across partitions
    assert(plan.contains("rangepartitioning(source"),
      s"expected the two-phase rank's range exchange in:\n$plan")
    // the round-11 shape this replaces: row_number over a per-source
    // window (one task holding each source's whole corpus)
    assert(!plan.contains("row_number"), "no window row_number rank")
    // no one-task funnel anywhere
    assert(!plan.contains("SinglePartition"), "no single-partition exchange")
    // the only Window is the prefix-sum over the #partitions x #strata
    // stats frame — it sums __cnt, never corpus rows
    val windows = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.forall(_.contains("__cnt")),
      s"Window over a non-stats frame:\n${windows.mkString("\n")}")
  }

  test("two-phase within-source rank is bit-identical to the window form") {
    import org.apache.spark.sql.expressions.Window
    // skewed sources (one giant, several small), non-trivial weights
    val d = (1L to 500L).map { id =>
      val src = if (id <= 350) "giant" else s"s${id % 7}"
      (id, src, (id % 13) + 1)
    }.toDF("doc_id", "source", "wt")
    val got = Sampling.weightedInterleave(d, "source", "doc_id", col("wt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // reference: the round-11 per-source window rank, same arithmetic
    val h = graft.functions.Portable.hash60(
      concat_ws(":", lit("epoch0"), col("doc_id").cast("string")))
    val weights = d.groupBy("source").agg(sum(col("wt")).as("__w"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__h").asc, col("doc_id").asc)
    val ref = d.select(col("doc_id"), col("source"), h.as("__h"))
      .withColumn("__r", row_number().over(w).cast("long"))
      .join(weights, Seq("source"))
      .select(col("doc_id"), col("source"),
        expr("cast(2 * __r - 1 as decimal(20,0)) * 1000000000000 div (2 * __w)")
          .as("ikey"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === ref)
  }

  test("interleave pins the single-space tokenizer on adversarial " +
    "whitespace (the x89 driver-divergence localizer)") {
    // Java-side reimplementation of hash60 = first 15 hex chars of md5
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    // single-space split of TRIMMED text, EMPTY TOKENS COUNT — the
    // convention both engines share: "a  b" is 3 tokens, a tab is not
    // a separator, "" is 1 token
    val texts = Seq(
      1L -> "a  b", // consecutive spaces: 3
      2L -> "a\tb", // tab is not a separator: 1
      3L -> " a b ", // leading/trailing trimmed: 2
      4L -> "", // empty splits to one empty token: 1
      5L -> "x y z") // plain: 3
    val expTok = Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 3L)
    val d = texts.toDF("doc_id", "text").withColumn("source", lit("s"))
    val got = Sampling.weightedInterleave(d, "source", "doc_id",
      size(graft.functions.Portable.tokens(col("text"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // expected ikeys from first principles: tw = 10, ranks by
    // (h60("epoch0:"+id), id)
    val tw = expTok.values.sum
    val ranks = texts.map(_._1).sortBy(id => (h60(s"epoch0:$id"), id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val exp = ranks.map { case (id, r) =>
      id -> (BigInt(2 * r - 1) * BigInt("1000000000000") / BigInt(2 * tw)).toLong
    }
    assert(got === exp)
  }

  test("stride keys survive ranks past the old Long-overflow point " +
    "(r > 4.6M: (2r-1)*10^12 no longer wraps negative)") {
    val n = 4700000L
    val d = spark.range(1L, n + 1L).toDF("doc_id")
      .withColumn("source", lit("s"))
    val agg = Sampling.weightedInterleave(d, "source", "doc_id", lit(1L))
      .agg(min(col("ikey")).as("mn"), max(col("ikey")).as("mx"),
        count(lit(1)).as("n")).head()
    assert(agg.getLong(2) === n)
    assert(agg.getLong(0) >= 0L, s"negative ikey: wrapped overflow (${agg.getLong(0)})")
    // max ikey = (2n-1)*10^12 div (2n) — just under one full stride span
    val expMax = (BigInt(2 * n - 1) * BigInt("1000000000000") / BigInt(2 * n)).toLong
    assert(agg.getLong(1) === expMax)
  }

  test("cluster best-rep: highest merit wins over lowest id; ties break low; " +
    "singletons keep themselves") {
    val resolved = Seq(
      (1L, 1L, 3L), (5L, 1L, 3L), (9L, 1L, 3L), // cluster 1: merits 10/99/99
      (7L, 7L, 1L) // singleton
    ).toDF("doc_id", "cluster_id", "cluster_size")
    val scored = Seq((1L, 10L), (5L, 99L), (9L, 99L), (7L, 3L))
      .toDF("doc_id", "merit")
    val out = Dedup.resolveClustersByMerit(resolved, scored)
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    // doc 5 wins cluster 1: merit 99 beats doc 1's 10 despite the larger
    // id, and the 99-tie with doc 9 breaks to the LOWER id (5)
    assert(out === Map(1L -> false, 5L -> true, 9L -> false, 7L -> true))
  }

  test("cluster best-rep: unscored members keep a row (null merit) and " +
    "never win while any scored member exists; all-unscored clusters " +
    "fall back to lowest id") {
    val resolved = Seq(
      (1L, 1L, 3L), (5L, 1L, 3L), (9L, 1L, 3L), // doc 9 has no merit row
      (20L, 20L, 2L), (21L, 20L, 2L) // whole cluster unscored
    ).toDF("doc_id", "cluster_id", "cluster_size")
    val scored = Seq((1L, 10L), (5L, 99L)).toDF("doc_id", "merit")
    val rows = Dedup.resolveClustersByMerit(resolved, scored).collect()
    val out = rows.map(r => r.getLong(0) ->
      ((if (r.isNullAt(3)) None else Some(r.getLong(3))), r.getBoolean(4))).toMap
    assert(out === Map(
      1L -> ((Some(10L), false)), 5L -> ((Some(99L), true)),
      9L -> ((None, false)),
      20L -> ((None, true)), 21L -> ((None, false))))
  }

  test("stratifiedExactN: bit-identical to the window form; the quota " +
    "binds per stratum; small strata return whole") {
    import org.apache.spark.sql.expressions.Window
    // one giant stratum (60), two bindable (20, 10), one below quota (3)
    val d = (1L to 93L).map { id =>
      val src = if (id <= 60) "giant" else if (id <= 80) "m" else if (id <= 90) "s" else "tiny"
      (id, src)
    }.toDF("doc_id", "source")
    val got = Sampling.stratifiedExactN(d, "source", "doc_id", n = 7)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val h = graft.functions.Portable.hash60(
      concat_ws(":", lit("sample0"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__h").asc, col("doc_id").asc)
    val ref = d.select(col("doc_id"), col("source"), h.as("__h"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 7).drop("__h")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === ref)
    val bySrc = got.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc === Map("giant" -> 7, "m" -> 7, "s" -> 7, "tiny" -> 3))
  }

  test("interleaveShards: dense global rank in (ikey, id) order; shard " +
    "sizes within one; shard id monotone in rank; no single-partition " +
    "exchange, no corpus-scale window") {
    val d = (1L to 97L).map { id =>
      (id, s"s${id % 5}", s"tok ${"w " * (id % 7).toInt}".trim)
    }.toDF("doc_id", "source", "text")
    val df = Sampling.interleaveShards(d, "source", "doc_id",
      weightExpr = size(graft.functions.Portable.tokens(col("text"))).cast("long"),
      nShards = 8)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getInt(4)))
    // rank is dense 1..N and agrees with the (ikey, doc_id) sort order
    val byRank = rows.sortBy(_._2)
    assert(byRank.map(_._3).toSeq === (1L to rows.length).toSeq)
    val sorted = rows.sortBy(t => (t._2, t._1))
    assert(sorted.map(_._3).toSeq === (1L to rows.length).toSeq,
      "global rank must replay the (ikey, doc_id) order")
    // balanced: sizes differ by at most one; monotone: shard follows rank
    val sizes = rows.groupBy(_._4).view.mapValues(_.size).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"unbalanced shards: $sizes")
    assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.toSeq,
      "shard id must be monotone in global rank")
    // plan gates: the global rank must not funnel. The ONLY legitimate
    // single-partition exchange is the one-row broadcast total N (each
    // task contributes one partial count row — control-plane); every
    // SinglePartition line must therefore feed directly from the
    // partial_count aggregate, never from corpus rows.
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toIndexedSeq
    lines.zipWithIndex.filter(_._1.contains("SinglePartition")).foreach {
      case (_, i) =>
        val below = lines.slice(i + 1, i + 3).mkString("\n")
        assert(below.contains("partial_count(1)"),
          s"corpus-scale single-partition exchange (not the one-row total) in:\n$plan")
    }
    assert(plan.contains("rangepartitioning"),
      "global rank must ride a range exchange")
    assert(!plan.contains("row_number"), "no window row_number rank")
  }

  test("temperatureInterleave: prefixes follow the SMOOTHED (sqrt) " +
    "shares, not the raw ones") {
    // raw masses 100:25:4 (per-doc weight 1) → smoothed strides 10:5:2
    val d = (1L to 129L).map { id =>
      val src = if (id <= 100) "a" else if (id <= 125) "b" else "c"
      (id, src)
    }.toDF("doc_id", "source")
    val keys = Sampling.temperatureInterleave(d, "source", "doc_id", lit(1L))
      .orderBy(col("ikey"), col("source"), col("doc_id"))
      .select("source").as[String].collect()
    // stride property under smoothed weights, while a source still has
    // documents: within the first 17 emissions (tail source c exhausts
    // at ~2/17 share x 129 > its 4 docs soon after), shares track
    // 10:5:2 within one stride each
    val weights = Map("a" -> 10.0, "b" -> 5.0, "c" -> 2.0)
    val total = weights.values.sum
    (1 to 17).foreach { n =>
      val counts = keys.take(n).groupBy(identity).view.mapValues(_.length)
      weights.foreach { case (s, w) =>
        val expected = n * w / total
        assert(math.abs(counts.getOrElse(s, 0).toDouble - expected) <= 1.0 + 1e-9,
          s"prefix $n: source $s has ${counts.getOrElse(s, 0)}, expected ~$expected")
      }
    }
    // the raw schedule would hold c to ~3% of early prefixes; smoothed
    // gives c its 2/17 ≈ 12% — check the defining upsample actually shows
    val first17 = keys.take(17).count(_ == "c")
    assert(first17 >= 1, "tail source must surface in the first stride span")
  }
}
