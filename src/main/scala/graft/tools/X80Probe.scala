package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for x80 (dedup-then-index capstone) and the
  * ivfPqWriteIndex lifecycle under x59/x60/x138 — attributes the ~8 s
  * bench median to semDedup / PQ build / search with per-phase job
  * counts. Not registered; `sbt "runMain graft.tools.X80Probe [sfDir] [reps]"`.
  */
object X80Probe {
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
      System.err.println(f"[x80probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"jobs=${jobs.get() - j0}")
      r
    }
    (1 to reps).foreach { rep =>
      System.err.println(s"[x80probe] ---- rep $rep ----")
      val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      val dd = time("semDedupHierarchical + reps join force") {
        val d = graft.ext.Similarity.semDedupHierarchical(emb, minCos = 0.45)
        val reps0 = emb.join(d.filter(!col("is_dup")).select("vec_id"), Seq("vec_id"))
        reps0.queryExecution.toRdd.count()
        reps0
      }
      val idx = System.getProperty("java.io.tmpdir") + s"/graft_x80probe_$rep"
      graft.tools.LocalFs.deleteRecursively(new java.io.File(idx))
      time("  pqEncode trained (codebook+encode force)") {
        graft.ext.Similarity.pqEncode(dd, trainIters = 2)
          .queryExecution.toRdd.count()
      }
      time("ivfPqWriteIndex (trainIters=2)") {
        graft.ext.Similarity.ivfPqWriteIndex(dd, idx, trainIters = 2)
      }
      time("ivfPqSearchIndexReranked force") {
        graft.ext.Similarity.ivfPqSearchIndexReranked(emb, idx,
          queryIds = Seq(7L, 177L, 357L)).queryExecution.toRdd.count()
      }
      graft.tools.InternalCaches.release(spark)
    }
    spark.stop()
  }
}
