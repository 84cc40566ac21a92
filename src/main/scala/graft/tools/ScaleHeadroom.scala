package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Scale-headroom probe: derives a `replicas`× fact-table scale-up from
  * an existing fixture dir (default sf0.1 → ~sf1) and times the most
  * expensive queries at both scales, printing one JSON line per query
  * with the observed scaling ratio.
  *
  * The scale-up preserves workload SHAPE instead of duplicating bytes:
  *   - dimensions (region/nation/customer/supplier/part) stay fixed —
  *     fact fan-out per dimension row grows, as it does in real growth;
  *   - orders/lineitem replicate with the order-key space strided per
  *     replica, so join selectivity and per-order group sizes are
  *     preserved while key cardinality grows 10×;
  *   - documents replicate with every token prefixed by a
  *     replica-unique tag, so cross-replica docs share ZERO shingles:
  *     near-dup structure stays per-replica and pair counts scale
  *     linearly (naive duplication would make every doc a 10-way exact
  *     dup — a different, quadratic workload);
  *   - embeddings replicate with the vector circularly rotated per
  *     replica — distinct vectors with identical norm/coordinate
  *     distribution, so LSH/IVF bucket occupancy scales instead of
  *     collapsing onto identical points;
  *   - events replicate with user_id offset (new users, same per-user
  *     session shape).
  *
  * Usage: runMain graft.tools.ScaleHeadroom [srcDir] [outDir] [replicas]
  * Writes nothing outside `outDir` (default /tmp/graft_sf1).
  */
object ScaleHeadroom {

  /** Key-space stride per replica — far above any sf0.1 key. */
  private val Stride = 100000000L

  def generate(spark: SparkSession, src: String, out: String, replicas: Int): Unit = {
    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def save(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    def fan(df: DataFrame) = df.withColumn("__r",
      explode(sequence(lit(0L), lit(replicas - 1L))))

    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => save(load(t), t))
    save(fan(load("orders"))
      .withColumn("o_orderkey", col("o_orderkey") + col("__r") * Stride)
      .drop("__r"), "orders")
    save(fan(load("lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("__r") * Stride)
      .drop("__r"), "lineitem")
    save(fan(load("events"))
      .withColumn("event_id", col("event_id") + col("__r") * Stride)
      .withColumn("user_id", col("user_id") + col("__r") * Stride)
      .drop("__r"), "events")
    save(fan(load("documents"))
      .withColumn("doc_id", col("doc_id") + col("__r") * Stride)
      .withColumn("text", when(col("__r") === 0, col("text")).otherwise(
        array_join(
          transform(split(trim(col("text")), " "),
            t => concat(lit("r"), col("__r"), lit("·"), t)), " ")))
      .withColumn("n_chars", length(col("text")))
      .drop("__r"), "documents")
    save(fan(load("embeddings"))
      .withColumn("vec_id", col("vec_id") + col("__r") * Stride)
      .withColumn("embedding", {
        val r = (col("__r") % size(col("embedding"))).cast("int")
        when(col("__r") === 0, col("embedding")).otherwise(concat(
          slice(col("embedding"), r + 1, size(col("embedding")) - r),
          slice(col("embedding"), lit(1), r)))
      })
      .drop("__r"), "embeddings")
  }

  /** The queries whose sf0.1 cost dominates the bench — the interesting
    * ones at 10×.
    */
  private val Targets = Seq(
    "q01_pricing_summary",    // full lineitem scan + agg (linear floor)
    "q13_embed_oneway_flat",  // one-way nesting
    "q14_embed_twoway_flat",  // junction + other-parent nested build
    "q15_embed_salted_flat",  // salted nesting + k-way merge
    "x02_dedup_jaccard",      // capped inverted-index self-join
    "x03_dedup_minhash_lsh",  // LSH banding + candidates-only verify
    "x07_ann_brute_topk",     // brute-force ANN — quadratic BY DESIGN:
                              // the query set (vec_id % 100 == 0) grows
                              // with the corpus, so cost is corpus×queries
    "x08_ann_ivf",            // the IVF scale path for the same problem
    "x27_curation_pipeline",  // the composed curation pass
    "x28_repetition_quality", // token/bigram repetition metrics
    "x30_contamination",      // benchmark 5-gram overlap screen
    "x33_semdedup",           // FLAT quantizer: assignment is n·k with
                              // k ∝ n (stride preserves vec_id % modulus)
                              // — measured 13–16× across probe runs;
                              // baseline the hierarchical form fixes
    "x37_semdedup_hier",      // two-level quantizer: n·(k₁+k/k₁) —
                              // the assignment scale path
    "x35_session_attribution", // user-keyed containment join
    "x36_kmv_distinct",       // bottom-k sketch: distinct shuffle + k-row
                              // partial merges — expect ~linear
    "x40_incremental_screen", // batch-vs-index probe: |batch| grows 10×
                              // but existing-side index build dominates
                              // here — expect ~linear in corpus
    "x41_collocation_lift")   // two explode→agg passes + vocab joins —
                              // expect ~linear

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
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
    if (!new java.io.File(s"$out/lineitem.parquet").exists()) {
      System.err.println(s"[headroom] generating ${replicas}x scale-up in $out")
      generate(spark, src, out, replicas)
    }
    def time(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      times(1) // median of 3
    }
    // one throwaway pass for session warmup
    SparkEntry.queries("q02_table_counts")(spark, src).count()
    val rows = Targets.map { name =>
      val base = time(name, src)
      val scaled = time(name, out)
      val ratio = scaled / base
      println(f"""{"query":"$name","base_sec":$base%.3f,"scaled_sec":$scaled%.3f,"ratio":$ratio%.2f,"replicas":$replicas}""")
      (name, base, scaled, ratio)
    }
    val tb = rows.map(_._2).sum; val ts = rows.map(_._3).sum
    println(f"""{"query":"TOTAL","base_sec":$tb%.3f,"scaled_sec":$ts%.3f,"ratio":${ts / tb}%.2f,"replicas":$replicas}""")
    spark.stop()
  }
}
