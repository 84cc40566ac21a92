package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** nprobe recall diagnostic for the hierarchical SemDeDup quantizer
  * (x37): on the real embeddings table, measures — per
  * nprobe ∈ {1, 2, 4} — how many of the FLAT x33 dup verdicts the
  * hierarchical assignment recovers, how many verdicts agree overall,
  * and the (vector, centroid) candidate-pair count the assignment
  * scores (its cost driver). The boundary fixture in CurationOpsSpec
  * proves the recovery MECHANISM; this quantifies the default on the
  * corpus the bench actually runs (same x33/x37 parameters:
  * minCos = 0.45, centroidModulus = 100, superFactor = 16).
  *
  * Usage: runMain graft.tools.NprobeRecall [sfDir] [nprobe...]
  * Prints one JSON line per nprobe value.
  */
object NprobeRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val probes = if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(1, 2, 4)
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
    val flat = Similarity.semDedup(emb, minCos = 0.45).cache()
    val n = flat.count()
    val flatDups = flat.filter(col("is_dup")).count()
    probes.foreach { np =>
      val hier = Similarity.semDedupHierarchical(emb, minCos = 0.45, nprobe = np)
        .select(col("vec_id"), col("is_dup").as("hier_dup"))
      val joined = flat.select(col("vec_id"), col("is_dup")).join(hier, Seq("vec_id"))
      // coalesce: SUM over an empty join (empty table, disjoint vec_id
      // sets) is SQL NULL and getLong would NPE without a diagnostic
      val agg = joined.agg(
        coalesce(sum(when(col("is_dup") && col("hier_dup"), 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("is_dup") === col("hier_dup"), 1L).otherwise(0L)), lit(0L))).head()
      val (recovered, agree) = (agg.getLong(0), agg.getLong(1))
      val cand = Similarity.hierCandidates(emb, nprobe = np).count()
      val agreement = if (n == 0) 1.0 else agree.toDouble / n
      println(f"""{"nprobe":$np,"n_vectors":$n,"flat_dups":$flatDups,"recovered_dups":$recovered,"recall":${if (flatDups == 0) 1.0 else recovered.toDouble / flatDups}%.4f,"verdict_agreement":$agreement%.4f,"candidate_pairs":$cand}""")
    }
    spark.stop()
  }
}
