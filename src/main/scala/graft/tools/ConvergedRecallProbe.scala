package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Post-hoc diagnostics over the CONVERGED (x112) rep indexes the
  * RecallAtScale x80 block writes — separates the two loss modes the
  * round-13 converged rows exposed. On a singleton-rep index a hot
  * query's loss can be (a) ε-ties — nprobe-FLAT, the residual-survivor
  * signature — or (b) IVF pruning misses — an isolated rep has no
  * density around it, its coarse-cell assignment is arbitrary relative
  * to the query's, and recall RECOVERS as probes widen. recall@1 of
  * the query's own cloud representative is the retrieval claim that
  * actually matters post-dedup; the id-recall@5 tail is 4 noise
  * neighbors at cos ≈ 0 where PQ quantization dominates.
  *
  * Reads /tmp/graft_x80_reps2_<label> + /tmp/graft_x80_reps2_idx_<label>
  * (must exist — run RecallAtScale with SPARK_GRAFT_RECALL_X80 first).
  *
  * Usage: runMain graft.tools.ConvergedRecallProbe [label ...]
  */
object ConvergedRecallProbe {
  def main(args: Array[String]): Unit = {
    val labels =
      if (args.nonEmpty) args.toSeq else Seq("100x-skew", "1000x-skew")
    val dirs = Map("100x-skew" -> "/tmp/graft_skew100",
      "1000x-skew" -> "/tmp/graft_skew1000")
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
    import spark.implicits._

    val qsHot = Seq(37L, 537L)
    def scoredRows(df: DataFrame): Seq[(Long, Long, Double)] =
      df.select(col("query_id"), col("neighbor_id"), col("cos_sim"))
        .as[(Long, Long, Double)].collect().toSeq

    for (label <- labels) {
      val emb = graft.sources.Tables.load(spark, dirs(label), "embeddings")
      val reps2 = spark.read.parquet(s"/tmp/graft_x80_reps2_$label")
      val idx2 = s"/tmp/graft_x80_reps2_idx_$label"
      val qFrame = emb.filter(col("vec_id").isin(qsHot.map(Long.box): _*))
      val gt = scoredRows(Similarity.bruteForceTopKAgainst(reps2, qFrame, k = 5))
      val gtPairs = gt.map(r => (r._1, r._2)).toSet
      val gtTop1 = gt.groupBy(_._1).map { case (q, rs) => q -> rs.maxBy(_._3)._2 }
      val curve = Seq(1, 2, 4, 8, 16, 32).map { np =>
        val rows = scoredRows(Similarity.ivfPqSearchIndexReranked(
          emb, idx2, queryIds = qsHot, k = 5, nprobe = np))
        val p = rows.map(r => (r._1, r._2)).toSet
        val r5 = (gtPairs intersect p).size.toDouble / gtPairs.size
        val top1 = rows.groupBy(_._1).map { case (q, rs) => q -> rs.maxBy(_._3)._2 }
        val r1 = gtTop1.count { case (q, id) => top1.get(q).contains(id) }
          .toDouble / gtTop1.size
        f""""np$np":{"rep_top1":$r1%.2f,"id5":$r5%.2f}"""
      }
      println(s"""{"scale":"$label-converged-probe","curve":{${curve.mkString(",")}}}""")
    }
    spark.stop()
  }
}
