package graft.tools

import org.apache.spark.sql.SparkSession

/** Harness-parameter sweep for the x14 crossover demonstrator
  * ([[graft.streaming.EventStream.sessionizeFileReplayCount]]): time
  * the file-transport streaming sessionizer over one events corpus at
  * several (nBatches, stateParts) points, with the batch operator's
  * time beside them. The replay's wall clock is floor-dominated
  * (staging write + per-batch state-store commits), so the right
  * configuration shifts with per-batch slice size — this is the
  * reproducibility artifact behind HEADROOM's crossover row.
  *
  * Usage: runMain graft.tools.CrossoverProbe [dir] [nBatches,... ] [parts,...]
  */
object CrossoverProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf10")
    val batchCounts = args.lift(1).getOrElse("4,8").split(",").map(_.trim.toInt)
    val partCounts = args.lift(2).getOrElse("8,32").split(",").map(_.trim.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional: derive an events-only corpus first (the third decade —
    // 1000× — is events-only; nothing else needs generating at that
    // scale). args: [srcDir] [replicas] [axis: users|time] — `users`
    // fans fresh user_ids per replica (population grows with data,
    // the standard scale-up); `time` fans the TIME axis (same users,
    // replicas-times-longer history — the shape where bounded state
    // pays, see ScaleHeadroom.generateTimeFan)
    for (src <- args.lift(3); reps <- args.lift(4).map(_.toInt)
        if !new java.io.File(s"$dir/events.parquet").exists()) {
      val axis = args.lift(5).getOrElse("users")
      System.err.println(s"[crossover] generating ${reps}x events ($axis axis) in $dir")
      if (axis == "time") ScaleHeadroom.generateTimeFan(spark, src, dir, reps)
      else ScaleHeadroom.generate(spark, src, dir, reps, Set("events"))
    }
    val events = graft.sources.Tables.load(spark, dir, "events")
    events.count() // warm the page cache so batch and stream compare fairly
    val batchTimes = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      graft.ext.Events.sessionize(events).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val nBatchSessions = graft.ext.Events.sessionize(events).count()
    println(f"""{"probe":"crossover","dir":"$dir","batch_sec":${batchTimes(1)}%.3f,"sessions":$nBatchSessions}""")
    for (nb <- batchCounts; sp <- partCounts) {
      val t1 = System.nanoTime()
      val n = graft.streaming.EventStream
        .sessionizeFileReplayCount(spark, events, nBatches = nb, stateParts = sp)
      val sec = (System.nanoTime() - t1) / 1e9
      println(f"""{"probe":"crossover","n_batches":$nb,"state_parts":$sp,"sec":$sec%.3f,"parity":${n == nBatchSessions}}""")
    }
    spark.stop()
  }
}
