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

  test("weighted interleave: no global Sort and no unpartitioned Window " +
    "anywhere in the plan") {
    val d = (1L to 50L).map(id => (id, s"s${id % 3}")).toDF("doc_id", "source")
    val plan = Sampling.weightedInterleave(d, "source", "doc_id", lit(1L))
      .queryExecution.executedPlan.toString
    // the within-source rank is a SOURCE-partitioned window; a global
    // ordering anywhere would be the one-task corpus funnel x78 bans
    assert(!plan.contains("Sort [ikey"), "no global sort on the key")
    assert(!plan.contains("Window [row_number#") ||
      plan.contains("partitionBy") || plan.contains("hashpartitioning(source"),
      "rank window must be source-partitioned")
    assert("rangepartitioning".r.findAllIn(plan).isEmpty,
      "no range partitioning (global total order) in the operator itself")
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
}
