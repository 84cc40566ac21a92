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
}
