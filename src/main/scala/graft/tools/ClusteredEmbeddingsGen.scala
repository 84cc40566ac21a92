package graft.tools

import org.apache.spark.sql.SparkSession

/** Generate the mixture-of-Gaussians embedding fixture
  * ([[ScaleHeadroom.generateClusteredEmbeddings]]) — tight semantic
  * cells so ChainCoherence, the occupancy/cap-bind audits, and
  * SemDeDup are exercised under realistic density peaks (the uniform
  * rotation fixture is near-orthogonal by construction; HEADROOM flags
  * its chain-coherence gains as lower bounds).
  *
  * Usage: runMain graft.tools.ClusteredEmbeddingsGen
  *          [srcDir] [outDir] [replicas] [nClusters] [noise]
  * Then:  runMain graft.tools.ChainCoherence <outDir>
  *        runMain graft.Verify <outDir> <verifyOut>
  *          x134_incontext_chain_pack,x141_chain_pack_stored
  *        python3 tools/check.py <outDir> <verifyOut>
  */
object ClusteredEmbeddingsGen {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1_mog")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val nClusters = args.lift(3).map(_.toInt).getOrElse(32)
    val noise = args.lift(4).map(_.toFloat).getOrElse(3.0f)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.err.println(s"[mog] generating ${replicas}x / $nClusters-cluster " +
      s"(noise $noise) variant in $out")
    ScaleHeadroom.generateClusteredEmbeddings(spark, src, out, replicas,
      nClusters, noise)
    spark.stop()
  }
}
