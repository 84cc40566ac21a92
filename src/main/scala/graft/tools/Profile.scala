package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Catalog
import graft.sources.Tables
import graft.workload.LogPipeline
import graft.queries.Fixtures

/** Scratch profiling main (not part of the query surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    // dir is the first path-looking arg; remaining args are mode flags
    val dir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    time("warmup count")(Tables.load(spark, dir, "region").count())
    // "q:<name>" args: time the named SparkEntry queries three times each
    val qnames = args.filter(_.startsWith("q:")).map(_.drop(2))
    if (qnames.nonEmpty) {
      qnames.foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        (1 to 3).foreach(i => time(s"$n run$i")(fn(spark, dir).count()))
      }
      spark.stop(); return
    }
    if (args.contains("q14probe")) {
      import org.apache.spark.sql.functions._
      val orders = Tables.load(spark, dir, "orders")
      val lineitem = Tables.load(spark, dir, "lineitem")
      val part = Tables.load(spark, dir, "part")
      val enriched = graft.operators.Embedding.joinOtherParent(
        lineitem, "l_orderkey", "l_partkey", part, "p_partkey")
      time("enrich join")(enriched.count())
      val attrs = enriched.columns.filterNot(_ == graft.operators.Embedding.ParentFkCol).toSeq
      val nested = graft.plans.NestCollect.nest(
        enriched, graft.operators.Embedding.ParentFkCol,
        Seq("l_linenumber") ++ attrs.filterNot(_ == "l_linenumber"),
        Seq("l_linenumber") ++ attrs.filterNot(_ == "l_linenumber"), "items")
      time("nest")(nested.count())
      val full = graft.SparkEntry.queries("q14_embed_twoway_flat")
      (1 to 3).foreach(i => time(s"q14 full run$i")(full(spark, dir).count()))
      spark.stop(); return
    }
    if (args.contains("x28probe")) {
      import org.apache.spark.sql.functions._
      import graft.functions.Portable._
      val docs = Tables.load(spark, dir, "documents")
      val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      time("tok stats")(tok.groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(sum("c"), count(lit(1)), max("c")).count())
      val bg = docs.select(col("doc_id"),
        explode(shingles(tokens(col("text")), 2)).as("bg"))
      time("bg explode only")(bg.count())
      time("bg stats")(bg.groupBy("doc_id")
        .agg(count(lit(1)).as("n_bg"), countDistinct("bg").as("d_bg")).count())
      val t = tokens(col("text"))
      val zipped = arrays_zip(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1))
      val bg2 = docs.select(col("doc_id"), explode(zipped).as("bg"))
      time("bg zip explode")(bg2.count())
      time("bg zip stats")(bg2.groupBy("doc_id")
        .agg(count(lit(1)).as("n_bg"), countDistinct("bg").as("d_bg")).count())
      time("full")(graft.ext.TextAnalysis.repetitionMetrics(docs).count())
      time("full again")(graft.ext.TextAnalysis.repetitionMetrics(docs).count())
      spark.stop(); return
    }
    if (args.contains("x21probe")) {
      import org.apache.spark.sql.functions._
      val docs = Tables.load(spark, dir, "documents")
      val lang = graft.ext.TextAnalysis.languageId(docs)
        .select(col("doc_id"), col("lang_pred"))
      time("langid only")(lang.count())
      val sampled = graft.ext.Sampling.stratifiedByHash(lang, "lang_pred", "doc_id",
        Seq("en" -> 50, "es" -> 30, "de" -> 20, "fr" -> 10), 5)
      time("stratified run1")(sampled.count())
      time("stratified run2")(sampled.count())
      println("=== executed plan ===")
      println(sampled.queryExecution.executedPlan.toString.take(6000))
      spark.stop(); return
    }
    if (args.contains("entry")) {
      // driver-style smoke: entry() on a fresh session must return rows
      time("entry rows")(println("entry rows: " + graft.SparkEntry.entry(spark).count()))
      spark.stop(); return
    }
    if (args.contains("lsh")) {
      val emb = Tables.load(spark, dir, "embeddings")
      val sigs = graft.ext.Similarity.lshSignatures(emb)
      time("sigs")(sigs.count())
      import org.apache.spark.sql.functions._
      val bands = sigs.select(col("vec_id"),
          explode(sequence(lit(0), lit(3))).as("band"), col("sig"))
        .withColumn("bucket", expr("shiftright(sig, band * 4) & 15"))
        .select(col("vec_id"), col("band"), col("bucket"))
      time("bucket histogram")(
        bands.groupBy("band", "bucket").count().orderBy(desc("count")).show(8))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b")).distinct()
      time("cand count")(println("cands: " + cand.count()))
      time("neardup")(println("pairs: " + graft.ext.Similarity.lshNearDup(emb).count()))
      time("neardup again")(graft.ext.Similarity.lshNearDup(emb).count())
      val cg = graft.ext.Similarity.lshNearDup(emb).queryExecution.explainString(
        org.apache.spark.sql.execution.CodegenMode)
      println("codegen fallbacks: " + cg.split('\n').count(_.contains("Found too long")))
      println(cg.split('\n').filter(l => l.contains("WholeStageCodegen") && l.contains("*")).mkString("\n").take(800))
      spark.stop(); return
    }
    val stmts = time("statements")(
      LogPipeline.statementsFromText(spark, Fixtures.mysqlLog, LogPipeline.MySqlLog))
    time("stmts.count")(stmts.count())
    val mentions = time("mentions plan")(LogPipeline.tableMentions(stmts))
    time("mentions.count")(mentions.count())
    val counts = time("tableCounts plan")(
      Catalog.tableCounts(spark, dir, Tables.migrationTables))
    time("counts.collect")(counts.collect())
    val stats = time("workload plan")(LogPipeline.workloadStats(mentions, counts))
    time("stats.collect")(stats.collect().foreach(println))
    time("stats.collect again")(stats.collect())
    time("write")(stats.repartition(1).write.mode("overwrite").parquet("/tmp/prof_out"))
    spark.stop()
  }
}
