package graft

import org.apache.spark.sql.functions._

import graft.ext.{Sampling, TextAnalysis}

/** Hand-computed fixtures for the round-4 curation additions:
  * repetition metrics and corpus-mixing weights (the DuckDB oracle
  * covers the corpus; these pin the arithmetic on crafted edges).
  */
class TextMetricsSpec extends SparkSpec {
  import spark.implicits._

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
}
