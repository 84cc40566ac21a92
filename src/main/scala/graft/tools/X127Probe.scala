package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase probe for x127 (near-dup index takedown) — attributes the
  * ~9 s bench median to build / append / screens / deletes / compact
  * with per-phase job counts. Not registered.
  */
object X127Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def time[T](label: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[x127probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"jobs=${jobs.get() - j0}")
      r
    }
    (1 to reps).foreach { rep =>
      System.err.println(s"[x127probe] ---- rep $rep ----")
      val root = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_x127probe_$rep")
      graft.tools.LocalFs.deleteRecursively(root)
      val idx = new java.io.File(root, "index").getPath
      val docs = graft.sources.Tables.load(spark, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      time("build third")(graft.ext.Dedup.writeNearDupIndex(
        docs.filter(pmod(col("doc_id"), lit(3L)) === 0L), idx, n = 3,
        maxShingleDf = 5))
      time("append two-thirds")(graft.ext.Dedup.appendNearDupIndexOnce(
        docs.filter(pmod(col("doc_id"), lit(3L)) =!= 0L), idx, 1L, n = 3))
      val probe = docs.filter(pmod(col("doc_id"), lit(50L)) === 7L)
      time("screen indexed")(
        graft.ext.Dedup.screenAgainstNearDupIndex(probe, idx, 3, 0.8)
          .repartition(1).write.mode("overwrite").parquet(s"$root/indexed"))
      if (sys.env.contains("X127_DUMP_PLAN")) {
        val p = graft.ext.Dedup.screenAgainstNearDupIndex(probe, idx, 3, 0.8)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(sys.env("X127_DUMP_PLAN")),
          p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      val takedown = docs.filter(pmod(col("doc_id"), lit(9L)) === 1L)
        .select(col("doc_id"))
      time("delete 1")(graft.ext.Dedup.deleteFromNearDupIndex(takedown, idx))
      time("delete 2")(graft.ext.Dedup.deleteFromNearDupIndex(takedown, idx))
      time("screen deleted")(
        graft.ext.Dedup.screenAgainstNearDupIndex(probe, idx, 3, 0.8)
          .repartition(1).write.mode("overwrite").parquet(s"$root/deleted"))
      time("compact")(graft.ext.Dedup.compactNearDupIndex(spark, idx))
      time("screen compacted")(
        graft.ext.Dedup.screenAgainstNearDupIndex(probe, idx, 3, 0.8)
          .repartition(1).write.mode("overwrite").parquet(s"$root/compacted"))
      time("final union force")(
        spark.read.parquet(s"$root/indexed").withColumn("phase", lit("indexed"))
          .unionByName(spark.read.parquet(s"$root/deleted")
            .withColumn("phase", lit("deleted")))
          .unionByName(spark.read.parquet(s"$root/compacted")
            .withColumn("phase", lit("compacted")))
          .queryExecution.toRdd.count())
      graft.tools.InternalCaches.release(spark)
      graft.tools.LocalFs.deleteRecursively(root)
    }
    spark.stop()
  }
}
