package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Cell-occupancy diagnostic for the SemDeDup quantizer on dup-heavy
  * corpora. Motivation (round 13): the x80 recall run on the skewed
  * 200k corpus never finished — every worker sat in the witness pass's
  * partial aggregate. Hypothesis: for a duplicate cloud `anchor + ε·p`,
  * cos(v, c) = 1 − ε²/2·|p_v⊥ − q_c⊥|², whose −|q_c⊥|²/2 term is
  * vector-INDEPENDENT — every cloud member prefers the centroid with
  * the smallest perturbation norm, so the cloud collapses into one
  * mega-cell and the within-cell witness join goes quadratic. This
  * prints the top cell occupancies of the hierarchical assignment so
  * the collapse is measured, not argued.
  *
  * Usage: runMain graft.tools.CellOccupancy [embDir] [cap]
  */
object CellOccupancy {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_skew100")
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
    val occ = Similarity.assignmentOccupancy(emb)
      .orderBy(col("n").desc).limit(20).collect()
    val n = emb.count()
    println(s"""{"corpus":"$dir","vectors":$n,"top_cells":[${
      occ.map(r => s"""{"centroid":${r.getLong(0)},"n":${r.getLong(1)}}""")
        .mkString(",")}]}""")
    val cap = args.lift(1).map(_.toInt).getOrElse(Similarity.DefaultCellCap)
    val row = Similarity.assignmentOccupancy(emb).select(
      sum((col("n") * (col("n") - 1) / 2).cast("long")).as("uncapped"),
      // per-cell sub-split estimate: s = ceil(n/cap), pairs ≈ s·(n/s)²/2
      sum((ceil(col("n") / lit(cap.toDouble)) *
        pow(col("n") / ceil(col("n") / lit(cap.toDouble)), 2) / 2)
        .cast("long")).as("capped")).collect()(0)
    println(s"""{"corpus":"$dir","cap":$cap,"witness_pairs_uncapped":${
      row.getLong(0)},"witness_pairs_capped":${row.getLong(1)}}""")
    spark.stop()
  }
}
