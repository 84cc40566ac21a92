package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** The parallelism-evidence probe the round-18 verdict asked for
  * (item 7): at sf0.1 the whole bench is driver-bound — 8 cores ties
  * 32 on nearly every entry — so the 8-vs-32 scaling block cannot
  * evidence "parallelises at scale". This tool times REGISTERED
  * entries at 1× and at the 10× derived corpus (ScaleHeadroom's
  * replica scale-up, reused if already generated) under whatever core
  * count `SPARK_GRAFT_CPUS` names; run it once at 32 and once at 8
  * and the 10× column is where real ratios appear (the 1× column
  * reproduces the known driver-bound tie).
  *
  * Usage: SPARK_GRAFT_CPUS=N runMain graft.tools.ScalePair
  *   [srcDir] [outDir] name,name,... [factor]
  * `factor` (default 10) also sizes the derived corpus when `outDir`
  * must be generated — pass 100 with a 100× dir for the decade where
  * per-task data finally amortizes the task overhead. Prints one JSON
  * line per entry: median-of-3, full-row forcing — Bench's methodology.
  */
object ScalePair {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out10 = args.lift(1).getOrElse("/tmp/graft_sf1")
    val names = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("x98_curation_multimodal"))
    val factor = args.lift(3).map(_.toInt).getOrElse(10)
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$out10/lineitem.parquet").exists()) {
      System.err.println(s"[scalepair] generating ${factor}x scale-up in $out10")
      ScaleHeadroom.generate(spark, src, out10, factor,
        Set("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "documents", "embeddings", "events"))
    }
    // session warmup (parquet listing, codegen)
    SparkEntry.queries("q02_table_counts")(spark, src).count()
    def timeFn(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val b = timeFn(fn, src)
      val s10 = timeFn(fn, out10)
      println(f"""{"query":"$n","cpus":$cpus,"base_sec":$b%.3f,"x10_sec":$s10%.3f,"decade1":${s10 / b}%.2f}""")
    }
    spark.stop()
  }
}
