package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val batchRuns = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = graft.ext.Events.sessionize(events).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val nBatchSessions = batchRuns.head._2
    val batchSec = batchRuns.map(_._1).sorted.apply(1)
    println(f"""{"probe":"crossover","dir":"$dir","batch_sec":$batchSec%.3f,"sessions":$nBatchSessions}""")
    for (nb <- batchCounts; sp <- partCounts) {
      val t1 = System.nanoTime()
      val n = graft.streaming.EventStream
        .sessionizeFileReplayCount(spark, events, nBatches = nb, stateParts = sp)
      val sec = (System.nanoTime() - t1) / 1e9
      println(f"""{"probe":"crossover","n_batches":$nb,"state_parts":$sp,"sec":$sec%.3f,"parity":${n == nBatchSessions}}""")
    }
    // ---- x68 marginal cost: open state distilled from the first 99%
    // of history (one amortized build, excluded from the timing — that
    // is the point), then ONE batch-incremental step over the last 1%.
    // The number to compare against batch_sec above: the nightly
    // re-sort pays the history again, the incremental step does not.
    locally {
      import org.apache.spark.sql.expressions.Window
      val ts = expr("ts div 1000")
      val mm = events.select(ts.as("us"))
        .agg(min(col("us")), max(col("us"))).head()
      val split = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0) + 1) * 99 / 100
      val prefix = events.filter(ts < split)
      val inc = events.filter(ts >= split)
      val pref = graft.ext.Events.sessionize(prefix)
        .withColumn("mx",
          max(col("session_id")).over(Window.partitionBy(col("user_id"))))
      val state = pref.filter(col("session_id") === col("mx"))
        .select("user_id", "session_start_us", "session_end_us", "n_events")
        .persist()
      val nClosedHist = pref.filter(col("session_id") =!= col("mx")).count()
      state.count() // materialize outside the timed step
      val incRows = inc.count()
      val t2 = System.nanoTime()
      val out = graft.ext.Events.sessionizeIncremental(inc, state)
      val emitted = out.count()
      val sec = (System.nanoTime() - t2) / 1e9
      // parity: history-closed + this step's output = the full build
      val total = nClosedHist + emitted
      println(f"""{"probe":"incremental","inc_rows":$incRows,"marginal_sec":$sec%.3f,"sessions_total":$total,"parity":${total == nBatchSessions}}""")
    }
    spark.stop()
  }
}
