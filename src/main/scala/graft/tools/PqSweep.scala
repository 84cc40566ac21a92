package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** One-off recall sweep for the PQ defaults (kept for reproducibility;
  * not part of the query surface).
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    val qs = Seq(0L, 100L, 200L, 300L, 400L)
    val brute = Similarity.bruteForceTopK(emb, k = 5, queryModulus = 100)
      .filter(col("query_id").isin(qs: _*))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    for (m <- Seq(4, 8, 16, 32); cm <- Seq(25, 10, 5)) {
      val adc = Similarity.pqTopK(emb, queryIds = qs, k = 5, m = m, codeModulus = cm)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (brute intersect adc).size.toDouble / brute.size
      println(f"m=$m%2d codeModulus=$cm%2d recall=$recall%.2f")
    }
    // x56: recall vs nprobe at the x54 defaults — separates the IVF
    // pruning loss (vanishes as nprobe grows) from the PQ distortion
    // floor (the pqTopK row above at m=16/cm=5)
    val nCents = math.min(
      emb.filter(col("vec_id") % 100 === 0).count(), 1024L)
    for (np <- Seq(1, 2, 4, nCents.toInt)) {
      val ivfpq = Similarity.ivfPqTopK(emb, queryIds = qs, k = 5, nprobe = np)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (brute intersect ivfpq).size.toDouble / brute.size
      println(f"ivfpq nprobe=$np%3d/$nCents recall=$recall%.2f")
    }
    // x58: trained codebooks — the recall delta Lloyd iterations buy at
    // EQUAL m (same bytes per vector); compare against the convention
    // rows above at the same m/codeModulus
    for (m <- Seq(8, 16); it <- Seq(1, 2, 3)) {
      val tr = Similarity.pqTopK(emb, queryIds = qs, k = 5, m = m,
          trainIters = it)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (brute intersect tr).size.toDouble / brute.size
      println(f"trained m=$m%2d iters=$it recall=$recall%.2f")
    }
    // x57: the verified re-rank — how much of the PQ distortion loss a
    // k'-deep exact re-rank recovers, by shortlist depth and nprobe.
    // What remains below 1.0 at full probe is pure shortlist miss
    // (a true neighbor ejected past rank k'); at small nprobe the IVF
    // pruning loss persists by design (re-rank can't resurrect an
    // unprobed bucket).
    for (np <- Seq(2, nCents.toInt); sl <- Seq(10, 50)) {
      val rr = Similarity.ivfPqRerankTopK(emb, queryIds = qs, k = 5,
          shortlist = sl, nprobe = np)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (brute intersect rr).size.toDouble / brute.size
      println(f"rerank nprobe=$np%3d shortlist=$sl%3d recall=$recall%.2f")
    }
    // x60: the full production composition — trained codebook feeding
    // the shortlist the exact pass re-ranks
    locally {
      val pr = Similarity.ivfPqRerankTopK(emb, queryIds = qs, k = 5,
          trainIters = 2)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (brute intersect pr).size.toDouble / brute.size
      println(f"production trained=2 shortlist=50 nprobe=2 recall=$recall%.2f")
    }
    // optional second arg: a scaled dir — time x54/x55 at both scales
    // (the same median-of-3 methodology as ScaleHeadroom)
    args.lift(1).foreach { scaled =>
      def timeQ(name: String, d: String): Double = {
        val fn = graft.SparkEntry.queries(name)
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, d).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        times(1)
      }
      Seq("x54_pq_encode", "x55_pq_adc_topk").foreach { name =>
        val b = timeQ(name, dir)
        val s = timeQ(name, scaled)
        println(f"""{"query":"$name","base_sec":$b%.3f,"scaled_sec":$s%.3f,"ratio":${s / b}%.2f}""")
      }
    }
    spark.stop()
  }
}
