object TreePrint {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (_, schema) = graft.queries.MigrationPipeline.converted(spark, "/root/testdata/sf0.001")
    def walk(n: graft.model.CollectionNode, d: Int): Unit = {
      println(("  " * d) + n.name + " [" + n.kind.label + "]")
      n.embedded.foreach(walk(_, d + 1))
    }
    schema.roots.foreach(walk(_, 0))
    spark.stop()
  }
}
