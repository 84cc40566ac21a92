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

  def generate(spark: SparkSession, src: String, out: String, replicas: Int,
      tables: Set[String] = Set(
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")): Unit = {
    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def save(df: DataFrame, t: String): Unit =
      if (tables(t)) df.write.mode("overwrite").parquet(s"$out/$t.parquet")
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
    // events.ts: the fixture's TIMESTAMP(NANOS) arrives as an ns-epoch
    // long (nanosAsLong) and is written back as raw int64 — Spark
    // cannot write nanos timestamps, and truncating to a µs TIMESTAMP
    // would lose the fixture's sub-µs precision. Spark-side reads are
    // unaffected (same long either way); tools/check.py rebuilds a
    // µs-truncated TIMESTAMP for its DuckDB views, and every event
    // oracle consumes only µs-truncated values (epoch_ns(ts)//1000),
    // so the truncation is invisible to the compare regardless of
    // whether the DuckDB version preserves TIMESTAMP_NS on read.
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
    // repartition(32): the scaled vector corpus is only a few MB on
    // disk, so a single output file would read back as ONE split and
    // serialize every compute-bound vector operator (the PQ encode at
    // 10× ran 320k argmin folds on one of 32 threads). Bytes
    // underestimate compute for embedding tables; a real corpus is
    // many files, so the probe's should be too.
    save(fan(load("embeddings"))
      .withColumn("vec_id", col("vec_id") + col("__r") * Stride)
      .withColumn("embedding", {
        val r = (col("__r") % size(col("embedding"))).cast("int")
        when(col("__r") === 0, col("embedding")).otherwise(concat(
          slice(col("embedding"), r + 1, size(col("embedding")) - r),
          slice(col("embedding"), lit(1), r)))
      })
      .drop("__r").repartition(32), "embeddings")
  }

  /** Inflated-shared-vocabulary variant (documents only): each replica
    * keeps the ORIGINAL text but is assigned a ROTATED source from the
    * EXISTING source list — source count stays fixed while every
    * source's vocabulary becomes the union of ~`replicas` sources'
    * originals, so shingles become shared across (nearly) all source
    * pairs. This isolates the dimension x46's Scaladoc claims
    * independence from: the exact audit's shingle self-join output
    * (Σ_sh C(sources(sh), 2)) inflates toward
    * #distinct-shingles · C(s, 2) while the sketch form's post-scan
    * cost stays at s·k rows. The standard scale-up deliberately CANNOT
    * test this (its replica-tagged tokens share zero cross-replica
    * shingles), and a replica-tagged SOURCE would instead multiply s —
    * a different axis, on which the sketch's own s²·k pair matrix
    * dominates (measured: see HEADROOM.md round 7).
    */
  def generateOverlap(spark: SparkSession, src: String, out: String, replicas: Int): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    // dense index over the distinct NON-NULL sources (tiny,
    // metadata-sized) so a replica can rotate source membership without
    // parsing source names; NULL-source docs can't join an equi-keyed
    // index (and must not occupy a rotation slot), so they replicate
    // below with their source untouched instead of silently vanishing
    val srcIdx = docs.select(col("source")).filter(col("source").isNotNull)
      .distinct()
      .withColumn("__si", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("source"))) - 1)
    val nSrc = srcIdx.count()
    val target = srcIdx.select(col("__si").as("__ti"), col("source").as("__tsource"))
    val rotated = docs.join(broadcast(srcIdx), Seq("source"))
      .withColumn("__r", explode(sequence(lit(0L), lit(replicas - 1L))))
      .withColumn("doc_id", col("doc_id") + col("__r") * Stride)
      .withColumn("__ti", (col("__si") + col("__r")) % nSrc)
      .join(broadcast(target), Seq("__ti"))
      .withColumn("source", col("__tsource"))
      .select(docs.columns.map(col): _*) // original column order
    val nullSrc = docs.filter(col("source").isNull)
      .withColumn("__r", explode(sequence(lit(0L), lit(replicas - 1L))))
      .withColumn("doc_id", col("doc_id") + col("__r") * Stride)
      .drop("__r")
      .select(docs.columns.map(col): _*)
    rotated.unionByName(nullSrc)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  /** Vocabulary-coherent DSIR variant (documents only): the TARGET
    * slice (source = src1) replicates with its ORIGINAL text — the
    * target distribution stays one coherent vocabulary at every scale —
    * while every other document takes the standard replica tag. The
    * standard scale-up deliberately CANNOT exercise DSIR selection:
    * replica-minted vocabulary dilutes the target model until no
    * document scores importance above 1 (x120's 10× keep-set is
    * honestly empty — both engines agree), so the family's 10× sweep
    * checked scoring but never selection. Here the target model's
    * per-bigram probabilities are scale-invariant (counts multiply
    * uniformly) while the raw model keeps diluting with replica
    * vocabulary — exactly the regime DSIR exists for — so
    * positive-importance documents EXIST at every decade and the
    * selection/curation/resampling compositions (x120, x123) verify
    * content-bearing output against their oracles at 10×, not just an
    * agreed-empty frame. Replicated src1 docs are exact text dups of
    * their base — correct for a DISTRIBUTION fixture (DSIR trains on
    * counts), wrong for dedup fixtures, which keep the standard
    * scale-up.
    */
  def generateDsirCoherent(spark: SparkSession, src: String, out: String,
      replicas: Int): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.withColumn("__r", explode(sequence(lit(0L), lit(replicas - 1L))))
      .withColumn("doc_id", col("doc_id") + col("__r") * Stride)
      .withColumn("text",
        when(col("__r") === 0 || col("source") === "src1", col("text"))
          .otherwise(array_join(
            transform(split(trim(col("text")), " "),
              t => concat(lit("r"), col("__r"), lit("·"), t)), " ")))
      .withColumn("n_chars", length(col("text")))
      .drop("__r")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  /** Clustered (hot-coarse-bucket) embeddings variant: replica 0 keeps
    * the base corpus; for r > 0, four of five vectors collapse into a
    * tight cloud around one of `nAnchors` anchor vectors
    * (v' = anchor + eps·rot_r(v) — distinct per row, cos(v', anchor) ≈ 1
    * for small eps) while the remaining fifth rotates exactly as the
    * uniform generator does. Coarse-bucket occupancy then concentrates
    * ~4/5 of the corpus into the few buckets nearest the anchors — the
    * non-uniform occupancy the round-10 recall headline ("pruning gets
    * safer with scale"; nprobe=1 → 1.00 at 200k) was NOT tested
    * against: a hot bucket is where IVF pruning fails in practice and
    * where ADC noise must rank thousands of candidates inside one
    * quantization-error band. Anchor ids (37 + 500·a) are deliberately
    * OFF the modulus-seeded centroid list (37 % 100 ≠ 0) and their base
    * rows are 'hot-eligible' (37 % 5 ≠ 0) — the anchors model organic
    * density peaks, not seeded centroids; centroid-seed rows
    * (vec_id % 100 == 0, hence % 5 == 0) always stay on the rotated
    * cold path so the coarse quantizer's seeding is unchanged.
    */
  def generateSkewedEmbeddings(spark: SparkSession, src: String, out: String,
      replicas: Int, nAnchors: Int = 4, eps: Float = 0.05f): Unit = {
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val anchors = emb.filter(col("vec_id") % 500 === 37 &&
        col("vec_id") / 500 < nAnchors)
      .select((col("vec_id") / 500).cast("long").as("__a"),
        col("embedding").as("__av"))
    val r = (col("__r") % size(col("embedding"))).cast("int")
    val rotated = when(col("__r") === 0, col("embedding")).otherwise(concat(
      slice(col("embedding"), r + 1, size(col("embedding")) - r),
      slice(col("embedding"), lit(1), r)))
    emb.withColumn("__r", explode(sequence(lit(0L), lit(replicas - 1L))))
      .withColumn("__a", col("vec_id") % nAnchors)
      .join(broadcast(anchors), Seq("__a"))
      .withColumn("embedding",
        when(col("__r") === 0, col("embedding"))
          .when(col("vec_id") % 5 =!= 0,
            zip_with(col("__av"), rotated, (a, b) => a + lit(eps) * b))
          .otherwise(rotated))
      .withColumn("vec_id", col("vec_id") + col("__r") * Stride)
      .select(emb.columns.map(col): _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** Mixture-of-Gaussians embeddings variant (round 17): EVERY vector —
    * replica 0 included — collapses onto one of `nClusters` deterministic
    * pseudo-random centers plus `noise`× its (rotated) original vector:
    * v' = center(xxhash64(vec_id) mod nClusters) + noise · rot_r(v).
    * Intra-cluster cosines land high (the centers dominate the norm)
    * while cross-cluster cosines stay near the random baseline — the
    * TIGHT-CELL geometry real embedding corpora have and the uniform
    * rotation fixture deliberately lacks (HEADROOM flags the chain-
    * coherence gains measured there as lower bounds: near-orthogonal
    * vectors leave nothing to cohere). This is the fixture for
    * re-measuring ChainCoherence, the occupancy/cap-bind audits, and
    * SemDeDup under realistic density peaks (the round-16 verdict's
    * item 4 — the DSIR-coherent precedent at the embedding grain).
    *
    * A VALUE transform, not a scale-up that preserves the base corpus
    * (unlike [[generateSkewedEmbeddings]]'s replica-0 contract):
    * measurement and the data-independent hash gates (x134/x141's
    * chain entries verify on ANY corpus) are its consumers. Cluster
    * assignment hashes the STRIDED vec_id, so replicas spread across
    * clusters instead of stacking; centroid seeding (vec_id % 100) is
    * untouched — seeds are ordinary cluster members, so cells refine
    * clusters and occupancy concentrates where a cluster holds few
    * seeds, exactly the hot-cell regime the chain fold's cap guard and
    * the occupancy alarms exist for.
    *
    * `noise` calibrates the within-cluster spread against the center
    * norm: centers are U(−1,1)^64 (|c| ≈ 4.62) and the base vectors
    * are unit-norm, so intra-cluster cosine ≈ |c|²/(|c|² + noise²) —
    * the default 3.0 lands ≈ 0.70 (a realistic embedding cluster,
    * with genuine nearest-neighbor structure for the chain to find),
    * while cross-cluster cosines stay at the random ±0.1 baseline.
    * A tiny noise (e.g. 0.15) degenerates to intra-cos ≈ 0.999, where
    * every within-cell order is equally coherent and the fixture
    * measures nothing (measured: id order 0.9990 vs chain 0.9993 at
    * noise 0.15 — see HEADROOM round 17).
    */
  def generateClusteredEmbeddings(spark: SparkSession, src: String,
      out: String, replicas: Int, nClusters: Int = 32,
      noise: Float = 3.0f): Unit = {
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    // deterministic centers: each dim a hash-derived float in [-1, 1]
    val centers = spark.range(nClusters.toLong).select(
      col("id").as("__c"),
      transform(sequence(lit(0), lit(63)),
        d => (pmod(xxhash64(col("id") * 64 + d), lit(2001L)).cast("double")
          / 1000.0 - 1.0).cast("float")).as("__cv"))
    val r = (col("__r") % size(col("embedding"))).cast("int")
    val rotated = when(col("__r") === 0, col("embedding")).otherwise(concat(
      slice(col("embedding"), r + 1, size(col("embedding")) - r),
      slice(col("embedding"), lit(1), r)))
    emb.withColumn("__r", explode(sequence(lit(0L), lit(replicas - 1L))))
      .withColumn("vec_id", col("vec_id") + col("__r") * Stride)
      .withColumn("__c", pmod(xxhash64(col("vec_id")), lit(nClusters.toLong)))
      .join(broadcast(centers), Seq("__c"))
      .withColumn("embedding",
        zip_with(col("__cv"), rotated, (c, v) => c + lit(noise) * v))
      .select(emb.columns.map(col): _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // documents fan to match the strided vec_ids (chain/packing
    // consumers semijoin doc_id = vec_id); text replica-tagged as the
    // standard scale-up does, so dedup semantics stay per-replica
    spark.read.parquet(s"$src/documents.parquet")
      .withColumn("__r", explode(sequence(lit(0L), lit(replicas - 1L))))
      .withColumn("doc_id", col("doc_id") + col("__r") * Stride)
      .withColumn("text", when(col("__r") === 0, col("text")).otherwise(
        array_join(
          transform(split(trim(col("text")), " "),
            t => concat(lit("r"), col("__r"), lit("·"), t)), " ")))
      .withColumn("n_chars", length(col("text")))
      .drop("__r")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  /** Hot-user variant (events only): replicas keep the SAME user_id —
    * every user now has 10× events in the same time range, so per-user
    * candidate sets (the funnel's click×purchase join, the session
    * containment join) grow ~100× per user where the standard scale-up
    * (fresh users per replica) grows them 0×. Event ids are strided so
    * dedup/identity semantics hold.
    */
  def generateHot(spark: SparkSession, src: String, out: String, replicas: Int): Unit = {
    val ev = spark.read.parquet(s"$src/events.parquet")
    ev.withColumn("__r", explode(sequence(lit(0L), lit(replicas - 1L))))
      .withColumn("event_id", col("event_id") + col("__r") * Stride)
      .drop("__r")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  /** Time-axis variant (events only): replicas keep the SAME users but
    * shift each replica one full corpus span (+2h) later — the history
    * gets `replicas`× LONGER while the user population stays fixed.
    * This is the growth axis where bounded-state streaming semantics
    * matter: sessionization state is O(users), so a time-fanned corpus
    * grows per-user sort work (the batch form's cost) without growing
    * state, whereas the standard scale-up (new users per replica) grows
    * both in lockstep and the state bound buys nothing. The +2h seam
    * exceeds the 30-minute session gap, so replica boundaries never
    * merge sessions and the session count scales exactly linearly.
    */
  def generateTimeFan(spark: SparkSession, src: String, out: String,
      replicas: Int): Unit = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val raw = spark.read.parquet(s"$src/events.parquet")
    // normalize ts to ns-long whichever way the producer framed it
    // (TIMESTAMP(NANOS) under nanosAsLong arrives as long already; a
    // µs TIMESTAMP — LTZ or NTZ — converts; same rule as Tables.load)
    val tsNs = raw.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        unix_micros(col("ts").cast("timestamp")) * lit(1000L)
      case _ => col("ts").cast("long")
    }
    val ev = raw.withColumn("ts", tsNs)
    val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
    val span = mm.getLong(1) - mm.getLong(0) + 2L * 3600 * 1000000000L
    ev.withColumn("__r", explode(sequence(lit(0L), lit(replicas - 1L))))
      .withColumn("event_id", col("event_id") + col("__r") * Stride)
      .withColumn("ts", col("ts") + col("__r") * span)
      .drop("__r")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
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
    "x37_semdedup_hier",      // two-level quantizer: n·(k₁+nprobe·k/k₁)
                              // — the assignment scale path (nprobe=2
                              // default; @nprobe1 variant below)
    "x35_session_attribution", // user-keyed containment join
    "x36_kmv_distinct",       // bottom-k sketch: distinct shuffle + k-row
                              // partial merges — expect ~linear
    "x40_incremental_screen", // batch-vs-index probe: |batch| grows 10×
                              // but existing-side index build dominates
                              // here — expect ~linear in corpus
    "x41_collocation_lift",   // two explode→agg passes + vocab joins —
                              // expect ~linear
    "x42_heavy_hitters",      // one counted shuffle + heap top-k —
                              // expect ~linear
    "x43_funnel",             // type-pruned scans + user-keyed candidate
                              // join (also probed under the hot-user
                              // variant below)
    "x44_retention",          // distinct (user, day) + cohort join —
                              // expect ~linear
    "x45_source_overlap",     // exact audit: shingle self-join grows
                              // with shared vocabulary (also probed
                              // under the inflated-overlap variant)
    "x46_source_overlap_kmv", // sketch form: corpus scanned once,
                              // downstream on #sources·k rows
    "x48_sequence_packing",   // one clustering shuffle + per-stratum
                              // streaming fold — expect ~linear
                              // (parallelism = #strata at subShards=1)
    "x49_token_chunking",     // pure flat map, zero shuffles —
                              // expect ~linear over the scan floor
    "x50_temperature_mix",    // one stratum agg + broadcast totals —
                              // expect ~flat over the scan
    "x51_table_profile",      // exact multi-distinct over orders:
                              // Expand multiplies scan rows by
                              // #columns — expect ~linear with a
                              // constant-factor penalty, the cost the
                              // sketch twin below exists to remove
    "x53_table_profile_kmv",  // sketch profile: one scan, bottom-k
                              // capped exchanges — expect ~linear
                              // WITHOUT x51's Expand constant factor
    "x54_pq_encode",          // PQ: n·m subvectors × broadcast FIXED
                              // codebook (maxCodes=256/subspace; the
                              // cap binds above 1,280 vectors, so the
                              // probe exercises it) — expect ~linear
    "x55_pq_adc_topk")        // ADC: fixed-size compressed-domain LUT
                              // join over the codes + the encode it
                              // includes — expect ~linear (query set
                              // is a fixed id list)

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    // optional 4th arg: comma-separated target names — probe only those
    // (variant probes run only when their base target is selected).
    // Unknown names fail loudly, same rationale as Verify's filter.
    val only: Option[Set[String]] = args.lift(3).map(_.split(",").toSet)
    only.foreach { names =>
      val unknown = names -- Targets.toSet
      require(unknown.isEmpty,
        s"unknown target(s) in filter: ${unknown.toSeq.sorted.mkString(",")}")
    }
    def selected(name: String): Boolean = only.forall(_.contains(name))
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
    val outOverlap = s"${out}_overlap"
    val outHot = s"${out}_hot"
    if (!new java.io.File(s"$out/lineitem.parquet").exists()) {
      System.err.println(s"[headroom] generating ${replicas}x scale-up in $out")
      generate(spark, src, out, replicas)
    }
    val wantOverlap =
      selected("x45_source_overlap") || selected("x46_source_overlap_kmv")
    if (wantOverlap &&
        !new java.io.File(s"$outOverlap/documents.parquet").exists()) {
      System.err.println(s"[headroom] generating inflated-overlap variant in $outOverlap")
      generateOverlap(spark, src, outOverlap, replicas)
    }
    if (selected("x43_funnel") &&
        !new java.io.File(s"$outHot/events.parquet").exists()) {
      System.err.println(s"[headroom] generating hot-user variant in $outHot")
      generateHot(spark, src, outHot, replicas)
    }
    def timeFn(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      times(1) // median of 3
    }
    def time(name: String, dir: String): Double = timeFn(SparkEntry.queries(name), dir)
    def report(name: String, base: Double, scaled: Double): Unit =
      println(f"""{"query":"$name","base_sec":$base%.3f,"scaled_sec":$scaled%.3f,"ratio":${scaled / base}%.2f,"replicas":$replicas}""")
    // one throwaway pass for session warmup
    SparkEntry.queries("q02_table_counts")(spark, src).count()
    val rows = Targets.filter(selected).map { name =>
      val base = time(name, src)
      val scaled = time(name, out)
      report(name, base, scaled)
      (name, base, scaled)
    }
    val tb = rows.map(_._2).sum; val ts = rows.map(_._3).sum
    println(f"""{"query":"TOTAL","base_sec":$tb%.3f,"scaled_sec":$ts%.3f,"ratio":${ts / tb}%.2f,"replicas":$replicas}""")
    // ---- variant probes: same JSON shape, suffixed names ----------------
    // x37 at nprobe=1: the default is 2 (recall-justified — NprobeRecall),
    // so probe the single-probe assignment to price the widened
    // candidate join the default pays for its recall.
    if (selected("x37_semdedup_hier")) {
      val nprobe1 = (s: SparkSession, d: String) =>
        graft.ext.Similarity.semDedupHierarchical(
          graft.sources.Tables.load(s, d, "embeddings"), minCos = 0.45, nprobe = 1)
      report("x37_semdedup_hier@nprobe1", timeFn(nprobe1, src), timeFn(nprobe1, out))
    }
    // variant probes reuse the base medians the Targets loop already
    // measured — re-timing x43/x45/x46 at src would re-run some of the
    // bench's most expensive queries for numbers already in hand
    val baseOf = rows.map(r => r._1 -> r._2).toMap
    // funnel under the hot-user shape: same users, 10× events each.
    if (selected("x43_funnel"))
      report("x43_funnel@hot_users", baseOf("x43_funnel"), time("x43_funnel", outHot))
    // exact vs sketch overlap when shared vocabulary ACTUALLY grows.
    if (selected("x45_source_overlap"))
      report("x45_source_overlap@inflated",
        baseOf("x45_source_overlap"), time("x45_source_overlap", outOverlap))
    if (selected("x46_source_overlap_kmv"))
      report("x46_source_overlap_kmv@inflated",
        baseOf("x46_source_overlap_kmv"), time("x46_source_overlap_kmv", outOverlap))
    // ---- growth-dimension evidence ----------------------------------
    // At these scales BOTH overlap forms are wall-clock-dominated by
    // the one-pass corpus scan+distinct, so seconds alone can't show
    // the asymptotic difference. Report the rows each form puts through
    // its post-scan stage: the exact audit's shingle self-join output
    // (Σ_pair n_shared — grows with shared vocabulary) vs the sketch's
    // merged-pair rows (≤ C(#sources,2)·k by construction — flat).
    if (wantOverlap)
    Seq("sf_base" -> src, "scaled" -> out, "inflated" -> outOverlap)
      .foreach { case (tag, dir) =>
        val docs = graft.sources.Tables.load(spark, dir, "documents")
        val exactRows = graft.ext.Dedup.sourceOverlap(docs)
          .agg(coalesce(sum(col("n_shared")), lit(0L))).head().getLong(0)
        val sk = graft.ext.Dedup.sourceOverlapSketch(docs)
          .agg(coalesce(sum(col("n_merged")), lit(0L)),
            count(lit(1))).head()
        println(s"""{"rows_probe":"$tag","exact_selfjoin_rows":$exactRows,"sketch_merged_rows":${sk.getLong(0)},"source_pairs":${sk.getLong(1)}}""")
      }
    spark.stop()
  }
}
