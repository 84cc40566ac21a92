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
    val events = graft.sources.Tables.load(spark, dir, "events")
    val t0 = System.nanoTime()
    val nBatchSessions = graft.ext.Events.sessionize(events).count()
    val batchSec = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"crossover","dir":"$dir","batch_sec":$batchSec%.3f,"sessions":$nBatchSessions}""")
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
