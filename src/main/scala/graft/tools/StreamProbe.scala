package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the streaming replay entries (x114 near-dup,
  * x121 DSIR, x115 semantic, x103 span) — attributes each micro-batch's
  * body time to screen / output-write / append, with a per-phase Spark
  * JOB COUNT so driver round trips (the round-18 verdict's suspect)
  * are visible next to the seconds. Not registered; run via
  * `sbt "runMain graft.tools.StreamProbe [sfDir] [reps]"`.
  */
object StreamProbe {
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
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
    })
    def time[T](label: String)(f: => T): T = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[streamprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"jobs=${jobs.get() - j0}")
      r
    }

    (1 to reps).foreach { rep =>
      System.err.println(s"[streamprobe] ---- rep $rep ----")
      val docs = graft.sources.Tables.load(spark, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val emb = graft.sources.Tables.load(spark, dir, "embeddings")
        .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
      val root = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_streamprobe_$rep")
      graft.tools.LocalFs.deleteRecursively(root)

      // ---- x114 body pieces, replay unrolled -------------------------
      locally {
        val idx = new java.io.File(root, "nd_index").getPath
        val out = new java.io.File(root, "nd_out").getPath
        def b(i: Int) = docs.filter(pmod(col("doc_id"), lit(4L)) === i.toLong)
        time("nd bootstrap build")(
          graft.ext.Dedup.writeNearDupIndex(b(0), idx, n = 3,
            maxShingleDf = 5))
        (1 to 3).foreach { i =>
          time(s"nd screen b$i")(
            graft.ext.Dedup.screenAgainstNearDupIndex(b(i), idx, n = 3,
                minJaccard = 0.8)
              .repartition(1).write.mode("overwrite").parquet(s"$out/batch=$i"))
          time(s"nd append b$i")(
            graft.ext.Dedup.appendNearDupIndexOnce(b(i), idx, i.toLong, n = 3))
        }
      }

      // ---- x121 body pieces ------------------------------------------
      locally {
        val idxRoot = new java.io.File(root, "dsir_index").getPath
        val out = new java.io.File(root, "dsir_out").getPath
        val target = docs.filter(col("source") === "src1")
          .filter(col("lang").isNotNull)
        def b(i: Int) = docs.filter(col("lang").isNotNull)
          .filter(pmod(col("doc_id"), lit(4L)) === i.toLong)
        time("dsir target build")(
          graft.ext.LanguageModel.writeLmIndex(target, s"$idxRoot/target"))
        time("dsir raw bootstrap")(
          graft.ext.LanguageModel.writeLmIndex(b(0), s"$idxRoot/raw"))
        (1 to 3).foreach { i =>
          time(s"dsir score b$i")(
            graft.ext.LanguageModel.dsirAgainstLmIndexes(b(i),
                s"$idxRoot/target", s"$idxRoot/raw", 2L)
              .repartition(1).write.mode("overwrite").parquet(s"$out/batch=$i"))
          time(s"dsir append b$i")(
            graft.ext.LanguageModel.appendLmIndex(b(i), s"$idxRoot/raw", s"b$i"))
        }
      }

      // ---- x115 body pieces ------------------------------------------
      locally {
        val idx = new java.io.File(root, "sem_index").getPath
        val out = new java.io.File(root, "sem_out").getPath
        def b(i: Int) = emb.filter(pmod(col("vec_id"), lit(4L)) === i.toLong)
        time("sem bootstrap build")(
          graft.ext.Similarity.writeSemanticIndex(b(0), idx))
        (1 to 3).foreach { i =>
          time(s"sem screen b$i")(
            graft.ext.Similarity.semanticScreenIndex(b(i), idx, 0.4)
              .repartition(1).write.mode("overwrite").parquet(s"$out/batch=$i"))
          time(s"sem append b$i")(
            graft.ext.Similarity.appendSemanticIndexOnce(b(i), idx, i.toLong))
        }
      }

      // ---- x103 body pieces ------------------------------------------
      locally {
        val idx = new java.io.File(root, "gram_index").getPath
        val out = new java.io.File(root, "gram_out").getPath
        def b(i: Int) = docs.filter(pmod(col("doc_id"), lit(4L)) === i.toLong)
        time("gram bootstrap build")(
          graft.ext.Dedup.writeGramIndexBucketed(b(0), idx, k = 8))
        (1 to 3).foreach { i =>
          time(s"gram screen b$i")(
            graft.ext.Dedup.duplicateSpansAgainstIndexBloom(b(i), idx, k = 8)
              .repartition(1).write.mode("overwrite").parquet(s"$out/batch=$i"))
          time(s"gram append b$i")(
            graft.ext.Dedup.appendGramIndexBucketed(b(i), idx, k = 8))
        }
      }
      graft.tools.InternalCaches.release(spark)
      graft.tools.LocalFs.deleteRecursively(root)
    }
    spark.stop()
  }
}
