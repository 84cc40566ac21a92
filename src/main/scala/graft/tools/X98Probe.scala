package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off phase-timing probe for the x98 capstone (optimization round
  * 18): times each stage of the multimodal-curation chain separately so
  * the bench entry's ~26 s can be attributed (media cluster stacks vs
  * curation chain vs connected-components rounds). Not registered on the
  * query surface; run via
  * `sbt "runMain graft.tools.X98Probe [sfDir] [reps]"`.
  */
object X98Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[x98probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    (1 to reps).foreach { rep =>
      System.err.println(s"[x98probe] ---- rep $rep ----")
      val img = time("imageNearDupClusters (eager CC + force)") {
        force(graft.ext.Multimodal.imageNearDupClusters(spark, docs, maxHamming = 4))
      }
      val aud = time("audioNearDupClusters") {
        force(graft.ext.Multimodal.audioNearDupClusters(spark, docs, maxHamming = 4))
      }
      val vid = time("videoNearDupClusters") {
        force(graft.ext.Multimodal.videoNearDupClusters(spark, docs,
          minJaccard = 0.3, maxFrameDf = 20))
      }
      val drops = graft.ext.Multimodal.imageNearDupClusters(spark, docs, maxHamming = 4)
        .unionByName(graft.ext.Multimodal.audioNearDupClusters(spark, docs, maxHamming = 4))
        .unionByName(graft.ext.Multimodal.videoNearDupClusters(spark, docs,
          minJaccard = 0.3, maxFrameDf = 20))
        .filter(!col("keep")).select("doc_id")
      val corpus = docs.join(drops, Seq("doc_id"), "left_anti")
      val cleaned = time("removeDuplicateSpans+persist force") {
        val c = graft.tools.InternalCaches.persist(
          graft.ext.Dedup.removeDuplicateSpans(corpus, k = 8)
            .filter(length(col("clean_text")) > 0)
            .select(col("doc_id"), col("clean_text").as("text")))
        force(c); c
      }
      time("hashedShingleSet(cleaned) persist force") {
        force(graft.tools.InternalCaches.persist(
          graft.ext.Dedup.hashedShingleSet(cleaned, maxShingleDf = 5)))
      }
      time("jaccard pairs over cleaned") {
        force(graft.ext.Dedup.ngramJaccardFromShingles(
          graft.tools.InternalCaches.persist(
            graft.ext.Dedup.hashedShingleSet(cleaned, maxShingleDf = 5)),
          minJaccard = 0.8).select(col("doc_a"), col("doc_b")))
      }
      time("resolveClusters (eager CC) + force") {
        force(graft.ext.Dedup.resolveClusters(cleaned,
          graft.ext.Dedup.ngramJaccardFromShingles(
            graft.tools.InternalCaches.persist(
              graft.ext.Dedup.hashedShingleSet(cleaned, maxShingleDf = 5)),
            minJaccard = 0.8).select(col("doc_a"), col("doc_b"))))
      }
      time("languageId+quality joins") {
        val lang = graft.ext.TextAnalysis.languageId(cleaned)
          .select(col("doc_id"), col("lang_pred"))
        val qual = graft.ext.TextAnalysis.quality(cleaned)
          .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
            col("quality_score"))
        force(lang.join(qual, Seq("doc_id")))
      }
      time("FULL x98 entry (as registered)") {
        force(graft.SparkEntry.queries("x98_curation_multimodal")(spark, dir))
      }
      System.err.println(s"[x98probe] img=$img aud=$aud vid=$vid")
    }
    spark.stop()
  }
}
