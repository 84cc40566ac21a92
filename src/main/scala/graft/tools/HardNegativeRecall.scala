package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall of the IVF-shortlisted hard-negative miner against the exact
  * brute baseline — the x72 discipline applied to x122/x124: the
  * Scaladoc's "raise nprobe to trade cost for recall" is a claim, this
  * prints the curve. For each nprobe, recall@k = |IVF pairs ∩ brute
  * pairs| / |brute pairs| over the modulus anchor set (pairs =
  * (query_id, neighbor_id); rank disagreements don't count against
  * recall — a miner that returns the same negatives in another order
  * trains the same model).
  *
  * Usage: runMain graft.tools.HardNegativeRecall [dir] [nprobes csv]
  */
object HardNegativeRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf1")
    val nprobes = args.lift(1).getOrElse("1,2,4,8").split(",").map(_.toInt)
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
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(graft.ext.Similarity.hardNegatives(
      emb, k = 5, queryModulus = 100, dupCos = 0.9))
    nprobes.foreach { np =>
      val got = pairs(graft.ext.Similarity.hardNegativesIVF(
        emb, k = 5, queryModulus = 100, dupCos = 0.9, nprobe = np))
      val hit = (got intersect brute).size
      println(f"""{"probe":"hard_negative_recall","dir":"$dir","nprobe":$np,"recall":${hit.toDouble / brute.size}%.4f,"ivf_pairs":${got.size},"brute_pairs":${brute.size}}""")
    }
    // the compressed form's knob is the shortlist depth (its pruning
    // composes IVF's nprobe with ADC mis-ranking inside the shortlist)
    Seq(50, 100, 200).foreach { sl =>
      val got = pairs(graft.ext.Similarity.hardNegativesPQ(
        emb, k = 5, queryModulus = 100, dupCos = 0.9, shortlist = sl))
      val hit = (got intersect brute).size
      println(f"""{"probe":"hard_negative_recall_pq","dir":"$dir","shortlist":$sl,"recall":${hit.toDouble / brute.size}%.4f,"pq_pairs":${got.size},"brute_pairs":${brute.size}}""")
    }
    // the HEADROOM round-15 claim that the residual 100× misses are a
    // CAP-BIND loss, not an nprobe loss ("a retrain — or a bigger cap —
    // reclaims it"): re-run the miner with the 1024 rank cap lifted so
    // every eligible seed becomes a centroid. If the claim holds,
    // recall jumps where widening nprobe saturated.
    Seq(2048, 4096).foreach { cap =>
      val got = pairs(graft.ext.Similarity.hardNegativesIVF(
        emb, k = 5, queryModulus = 100, dupCos = 0.9, nprobe = 2,
        maxCentroids = cap))
      val hit = (got intersect brute).size
      println(f"""{"probe":"hard_negative_recall_cap","dir":"$dir","max_centroids":$cap,"recall":${hit.toDouble / brute.size}%.4f,"ivf_pairs":${got.size},"brute_pairs":${brute.size}}""")
    }
    spark.stop()
  }
}
