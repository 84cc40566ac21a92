package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for x129 (session erasure) and x71 (stored
  * sessionize) — attributes their ~10 s / ~6 s bench medians to the
  * fold/snapshot/erase/compact phases. Not registered; run via
  * `sbt "runMain graft.tools.X129Probe [sfDir] [reps]"`.
  */
object X129Probe {
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
    import org.apache.spark.sql.expressions.Window
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[x129probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    (1 to reps).foreach { rep =>
      System.err.println(s"[x129probe] ---- rep $rep ----")
      val ev = graft.sources.Tables.load(spark, dir, "events")
      val mm = time("min/max head") {
        ev.select(expr("ts div 1000").as("us"))
          .agg(min(col("us")), max(col("us"))).head()
      }
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val k = 4
      val bounds = (0 to k).map(i => lo + (hi - lo + 1) * i / k)
      val root = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_x129probe_$rep")
      graft.tools.LocalFs.deleteRecursively(root)
      val stateDir = new java.io.File(root, "state").getPath
      val closedDir = new java.io.File(root, "closed").getPath
      for (i <- 0 until k) {
        time(s"fold $i") {
          val b = ev.filter(expr("ts div 1000") >= bounds(i) &&
            expr("ts div 1000") < bounds(i + 1))
          graft.ext.Events.sessionizeIncrementalStored(b, stateDir, closedDir)
        }
      }
      val cols = Seq("user_id", "session_start_us", "session_end_us", "n_events")
      def snapshot(phase: String): Unit = {
        val all = graft.ext.Events.readClosedSessions(spark, closedDir)
          .select(cols.map(col): _*)
          .unionByName(spark.read.parquet(stateDir).select(cols.map(col): _*))
        val w = Window.partitionBy(col("user_id")).orderBy(col("session_start_us"))
        all.withColumn("session_id", row_number().over(w).cast("long"))
          .select(col("user_id"), col("session_id"), col("n_events"),
            col("session_start_us"), col("session_end_us"),
            (col("session_end_us") - col("session_start_us")).as("duration_us"))
          .repartition(1).write.mode("overwrite").parquet(s"$root/$phase")
      }
      time("snapshot stored")(snapshot("stored"))
      val users = ev.filter(pmod(col("user_id"), lit(7L)) === 3L)
        .select(col("user_id")).distinct()
      time("erase 1")(graft.ext.Events.eraseUserSessions(users, stateDir, closedDir))
      time("erase 2 (replay)")(graft.ext.Events.eraseUserSessions(users, stateDir, closedDir))
      time("snapshot erased")(snapshot("erased"))
      time("compactClosedSessions")(graft.ext.Events.compactClosedSessions(spark, closedDir))
      time("snapshot compacted")(snapshot("compacted"))
      time("final union force") {
        spark.read.parquet(s"$root/stored").withColumn("phase", lit("stored"))
          .unionByName(spark.read.parquet(s"$root/erased")
            .withColumn("phase", lit("erased")))
          .unionByName(spark.read.parquet(s"$root/compacted")
            .withColumn("phase", lit("compacted")))
          .queryExecution.toRdd.count()
      }
      graft.tools.LocalFs.deleteRecursively(root)
    }
    spark.stop()
  }
}
