package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dump formatted physical plans for selected query-surface entries —
  * the plan-review loop (pushdown, pruning, join strategy, shuffle
  * count).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q06_filter_eq", "q12_join_agg_3way",
      "q13_embed_oneway_flat", "x07_ann_brute_topk")
    names.foreach { n =>
      println(s"\n=================== $n ===================")
      println(SparkEntry.queries(n)(spark, dir)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
