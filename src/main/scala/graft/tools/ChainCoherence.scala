package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ext.{Packing, Similarity}

/** Measures what x134's NN-chain ordering actually buys over x131's
  * id order — the In-Context Pretraining premise is that a document's
  * WINDOW NEIGHBORS should be its semantic neighbors (Shi et al. 2023
  * §2), so the honest metric is the mean cosine of ADJACENT document
  * pairs inside each packed window, compared across the two orderings
  * on the same corpus, same cells, same budget. "Measure, don't
  * guess": the chain costs a cap-bounded Σ|cell|² pair pass; this
  * prints the coherence it purchases.
  *
  * Usage: runMain graft.tools.ChainCoherence [sfDir]
  * Prints one JSON line per ordering: mean/min adjacent cosine and
  * the fraction of adjacent pairs above 0.5.
  */
object ChainCoherence {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
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
    import graft.functions.Portable

    val toks = size(Portable.tokens(col("text")))
    val packable = graft.sources.Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isNotNull && toks > 0)
      .select(col("doc_id"), toks.cast("long").as("n_tokens"))
    val embP = graft.sources.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
      .join(packable.select(col("doc_id").as("vec_id")),
        Seq("vec_id"), "left_semi")
    val vecs = embP.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val chain = InternalCaches.persist(Similarity.semanticChainOrder(embP))
    val staged = packable.join(chain, col("doc_id") === col("vec_id"))

    // both packers over the SAME cells and budget; only the visit
    // order differs (id vs chain position)
    def coherence(packed: DataFrame, orderCol: String, label: String): Unit = {
      val w = Window.partitionBy(col("centroid_id"), col("bin_id"))
        .orderBy(col(orderCol))
      val adj = packed
        .withColumn("prev_id", lag(col("doc_id"), 1).over(w))
        .filter(col("prev_id").isNotNull)
        .join(vecs.select(col("vec_id").as("doc_id"), col("v")), Seq("doc_id"))
        .join(vecs.select(col("vec_id").as("prev_id"), col("v").as("pv")),
          Seq("prev_id"))
        .select(graft.functions.CosineSim.cosine_sim(col("v"), col("pv"))
          .as("cs"))
      val r = adj.agg(count(lit(1)), avg("cs"), min("cs"),
        avg(when(col("cs") > 0.5, 1.0).otherwise(0.0))).head()
      // zero adjacent pairs (all-singleton cells, or one doc per bin)
      // leaves the avg/min aggregates NULL — print an honest zero-pairs
      // line instead of dereferencing them
      if (r.getLong(0) == 0L)
        println(s"""{"ordering":"$label","adjacent_pairs":0}""")
      else println(f"""{"ordering":"$label","adjacent_pairs":${r.getLong(0)},""" +
        f""""mean_adjacent_cos":${r.getDouble(1)}%.4f,""" +
        f""""min_adjacent_cos":${r.getDouble(2)}%.4f,""" +
        f""""frac_above_0.5":${r.getDouble(3)}%.4f}""")
    }

    coherence(
      Packing.packGreedyByOrder(staged, "centroid_id", "doc_id",
        col("doc_id"), col("n_tokens"), budget = 256),
      "ord", "id_order_x131")
    coherence(
      Packing.packGreedyByOrder(staged, "centroid_id", "doc_id",
        col("chain_pos"), col("n_tokens"), budget = 256),
      "ord", "nn_chain_x134")
    // the memory-bounded rung (x143): how much coherence do the
    // k-capped lists + restarts give up against the exact chain?
    val knn = InternalCaches.persist(
      Similarity.semanticChainOrderKnn(embP, maxNeighbors = 4))
    coherence(
      Packing.packGreedyByOrder(
        packable.join(knn, col("doc_id") === col("vec_id")),
        "centroid_id", "doc_id", col("chain_pos"), col("n_tokens"),
        budget = 256),
      "ord", "knn_chain_x143_k4")
    spark.stop()
  }
}
