package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Formatted-plan dumps for the stored-index VERBS (screen/score) —
  * the lifecycle entries' registered plans are post-hoc file-read
  * unions (the phases must materialize between mutations), so the
  * plan evidence for their inner verbs has to come from the verbs
  * directly. Stages a small index per family at the given SF, then
  * writes each verb's `explain("formatted")` under the given dir.
  *
  * Usage: runMain graft.tools.VerbPlans [sfDir] [outDir]
  */
object VerbPlans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/root/repo/plans/r19")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(name: String, df: DataFrame): Unit = {
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/$name"),
        p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[verbplans] wrote $out/$name")
    }
    val root = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_verbplans")
    graft.tools.LocalFs.deleteRecursively(root)
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)

    // gram family: Bloom-gated bucketed screen (x95/x103/x133 verb)
    locally {
      val idx = new java.io.File(root, "gram").getPath
      graft.ext.Dedup.writeGramIndexBucketed(
        docs.filter(pmod(col("doc_id"), lit(2L)) === 0L), idx, k = 8)
      dump("verb_gram_bloom_screen.txt",
        graft.ext.Dedup.duplicateSpansAgainstIndexBloom(
          docs.filter(pmod(col("doc_id"), lit(2L)) =!= 0L), idx, k = 8))
    }
    // near-dup family: stored screen (x104/x114/x127 verb)
    locally {
      val idx = new java.io.File(root, "nd").getPath
      graft.ext.Dedup.writeNearDupIndex(
        docs.filter(pmod(col("doc_id"), lit(2L)) === 0L), idx, n = 3,
        maxShingleDf = 5)
      dump("verb_nd_screen.txt",
        graft.ext.Dedup.screenAgainstNearDupIndex(
          docs.filter(pmod(col("doc_id"), lit(2L)) =!= 0L), idx, 3, 0.8))
    }
    // LM family: the one-pass stored-model importance (x121 verb)
    locally {
      val idx = new java.io.File(root, "lm").getPath
      val scoped = docs.filter(col("lang").isNotNull)
      graft.ext.LanguageModel.writeLmIndex(
        scoped.filter(col("source") === "src1"), s"$idx/target")
      graft.ext.LanguageModel.writeLmIndex(
        scoped.filter(pmod(col("doc_id"), lit(4L)) === 0L), s"$idx/raw")
      dump("verb_dsir_stored_score.txt",
        graft.ext.LanguageModel.dsirAgainstLmIndexes(
          scoped.filter(pmod(col("doc_id"), lit(4L)) === 1L),
          s"$idx/target", s"$idx/raw", 2L))
    }
    graft.tools.LocalFs.deleteRecursively(root)
    spark.stop()
  }
}
