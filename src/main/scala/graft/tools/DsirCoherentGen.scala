package graft.tools

import org.apache.spark.sql.SparkSession

/** Generate the vocabulary-coherent DSIR decade fixture
  * ([[ScaleHeadroom.generateDsirCoherent]]) so the DSIR family's 10×
  * sweep can exercise SELECTION, not just scoring (the standard
  * replica-tagged scale-up dilutes every importance below 1 by
  * construction — its 10× keep-set is honestly empty).
  *
  * Usage: runMain graft.tools.DsirCoherentGen [srcDir] [outDir] [replicas]
  * Then: runMain graft.Verify <outDir> <verifyOut>
  *         x118_dsir_importance,x120_curation_dsir,x121_stream_dsir_gate,x123_dsir_resample
  *       python3 tools/check.py <outDir> <verifyOut>
  */
object DsirCoherentGen {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1_dsir")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.err.println(s"[dsir-coherent] generating ${replicas}x variant in $out")
    ScaleHeadroom.generateDsirCoherent(spark, src, out, replicas)
    spark.stop()
  }
}
