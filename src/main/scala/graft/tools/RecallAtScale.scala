package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** ANN recall measured AT SCALE — closes the evidence gap the round-9
  * verdict named first: every recall number in the PQ story (raw 0.52
  * → 1.00 re-ranked) came from the sf0.001 fixture, while the 10×/100×
  * runs verified hash-exactness against the *approximate* oracle, not
  * recall against ground truth.
  *
  * For each scale (sf0.1 base, 10×, 100× — the ScaleDecade corpora,
  * generated here if absent) this tool computes brute-force exact
  * top-k (x07's operator, restricted to the standard query set) as
  * ground truth, then recall@k for:
  *   - x56's compressed search (`ivfPqTopK`, registration defaults),
  *   - x57's verified re-rank (`ivfPqRerankTopK`, shortlist=50),
  *   - x60's production form (trained codebooks, trainIters=2), and
  *   - a shortlist sweep (10/50/100/200) at each scale — the
  *     shortlist-vs-scale curve the verdict asked for if 1.0 fails to
  *     hold.
  *
  * Recall convention matches PqSweep: set intersection over
  * (query_id, neighbor_id) pairs ÷ |ground truth|.
  *
  * Round 11 extends the grid one decade (1000× = 2M vectors) and adds
  * the axis the round-10 headline was not tested against: CLUSTERED
  * corpora ([[ScaleHeadroom.generateSkewedEmbeddings]] — ~4/5 of the
  * mass in a handful of hot coarse buckets) at 200k and 2M vectors,
  * measured on both the standard (cold) query set and on the anchor
  * queries sitting INSIDE a hot cloud. At the 2M scales the sweeps
  * keep only the decision points round 10 identified (sl ∈ {50, 200},
  * np ∈ {1, 2, 4}) — each sweep point re-encodes the full corpus.
  *
  * Usage: runMain graft.tools.RecallAtScale
  *          [srcDir] [out10] [out100] [out1000] [skew100] [skew1000]
  * Pass a scale-label filter via SPARK_GRAFT_RECALL_ONLY (comma list,
  * e.g. "100x-skew,1000x") to run a subset.
  */
object RecallAtScale {

  def main(args: Array[String]): Unit = {
    // fail fast on the do-nothing configuration BEFORE any Spark work:
    // SKIP_MAIN without the x80 opt-in disables every measurement
    // block, and the only effect of the run would be (possibly hours
    // of) corpus generation with nothing measured against it
    if (sys.env.contains("SPARK_GRAFT_RECALL_SKIP_MAIN") &&
        !sys.env.contains("SPARK_GRAFT_RECALL_X80")) {
      System.err.println("[recall] SPARK_GRAFT_RECALL_SKIP_MAIN is set " +
        "without SPARK_GRAFT_RECALL_X80 — every measurement block would " +
        "be disabled. Set SPARK_GRAFT_RECALL_X80, or unset SKIP_MAIN.")
      sys.exit(2)
    }
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out10 = args.lift(1).getOrElse("/tmp/graft_sf1")
    val out100 = args.lift(2).getOrElse("/tmp/graft_sf10")
    val out1000 = args.lift(3).getOrElse("/tmp/graft_sf100")
    val skew100 = args.lift(4).getOrElse("/tmp/graft_skew100")
    val skew1000 = args.lift(5).getOrElse("/tmp/graft_skew1000")
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

    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_RECALL_ONLY").map(_.split(",").toSet)
    def wanted(label: String) = only.forall(_.contains(label))

    // (dir, label, replicas, skewed); replicas=0 → the source corpus
    val corpora = Seq(
      (src, "1x", 0, false), (out10, "10x", 10, false),
      (out100, "100x", 100, false), (out1000, "1000x", 1000, false),
      (skew100, "100x-skew", 100, true), (skew1000, "1000x-skew", 1000, true))
    for ((dir, label, reps, skewed) <- corpora
        if reps > 0 && wanted(label) &&
          !new java.io.File(s"$dir/embeddings.parquet").exists()) {
      System.err.println(s"[recall] generating $label embeddings in $dir")
      if (skewed) ScaleHeadroom.generateSkewedEmbeddings(spark, src, dir, reps)
      else ScaleHeadroom.generate(spark, src, dir, reps, Set("embeddings"))
    }

    val qsCold = Seq(0L, 100L, 200L, 300L, 400L)
    // base rows of the first two skew anchors: queries inside a hot cloud
    val qsHot = Seq(37L, 537L)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().toSet
    def scoredRows(df: DataFrame): Seq[(Long, Long, Double)] =
      df.select(col("query_id"), col("neighbor_id"), col("cos_sim"))
        .as[(Long, Long, Double)].collect().toSeq

    // SPARK_GRAFT_RECALL_SKIP_MAIN skips the (already-recorded) round-11
    // sweep grid so an x80-only run doesn't re-pay the full-corpus
    // re-encodes; the x80 block below has its own opt-in (and main()
    // fails fast above when BOTH blocks would be disabled).
    val skipMain = sys.env.contains("SPARK_GRAFT_RECALL_SKIP_MAIN")
    for ((dir, label, _, skewed) <- corpora if wanted(label) && !skipMain) {
      val big = label.startsWith("1000x")
      val (slSweep, npSweep) =
        if (big) (Seq(50, 200), Seq(1, 2, 4))
        else (Seq(10, 50, 100, 200), Seq(1, 2, 4, 8))
      val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      val n = emb.count()
      for ((qs, qlabel) <- Seq(qsCold -> label) ++
          (if (skewed) Seq(qsHot -> s"$label-hotq") else Seq.empty)) {
        val gtRows = scoredRows(Similarity.bruteForceTopK(emb, k = 5, queryIds = qs))
        val gt = gtRows.map(r => (r._1, r._2)).toSet
        def recall(approx: Set[(Long, Long)]): Double =
          (gt intersect approx).size.toDouble / gt.size
        // ε-recall (score-tolerance recall, the ann-benchmarks sense):
        // a returned neighbor counts when its EXACT cosine is within τ
        // of the query's k-th ground-truth cosine. Inside a hot
        // near-dup cloud the exact top-5 is an arbitrary pick among
        // thousands of ε-ties, so ID-recall@5 collapses to 0 while
        // every returned neighbor is equivalent to the eye of any
        // consumer — ε-recall is the metric that distinguishes that
        // tie artifact from a real retrieval miss. Only computed for
        // the re-rank paths, whose cos_sim column IS the exact score.
        val kthByQuery = gtRows.groupBy(_._1).map { case (q, rs) =>
          q -> rs.map(_._3).min }
        def epsRecall(rows: Seq[(Long, Long, Double)], tau: Double): Double =
          if (rows.isEmpty) 0.0
          else rows.count { case (q, _, c) => c >= kthByQuery(q) - tau }
            .toDouble / rows.size
        val r56 = recall(pairs(Similarity.ivfPqTopK(emb, queryIds = qs, k = 5)))
        val rr57 = scoredRows(Similarity.ivfPqRerankTopK(emb, queryIds = qs, k = 5))
        val rr60 = scoredRows(Similarity.ivfPqRerankTopK(emb, queryIds = qs, k = 5,
          trainIters = 2))
        val r57 = recall(rr57.map(r => (r._1, r._2)).toSet)
        val r60 = recall(rr60.map(r => (r._1, r._2)).toSet)
        println(f"""{"scale":"$qlabel","vectors":$n,"recall5_x56_ivfpq":$r56%.2f,"recall5_x57_rerank":$r57%.2f,"recall5_x60_trained":$r60%.2f}""")
        println(f"""{"scale":"$qlabel","eps_recall5_tau001":{"x57":${epsRecall(rr57, 0.001)}%.2f,"x60":${epsRecall(rr60, 0.001)}%.2f},"eps_recall5_tau01":{"x57":${epsRecall(rr57, 0.01)}%.2f,"x60":${epsRecall(rr60, 0.01)}%.2f}}""")
        val curve = slSweep.map { sl =>
          val r = recall(pairs(Similarity.ivfPqRerankTopK(emb, queryIds = qs,
            k = 5, shortlist = sl)))
          f""""sl$sl":$r%.2f"""
        }
        println(s"""{"scale":"$qlabel","rerank_shortlist_curve":{${curve.mkString(",")}}}""")
        // the OTHER loss axis: IVF pruning. The shortlist can only
        // recover what a probed bucket surfaced — this curve shows what
        // nprobe buys at each scale (shortlist fixed at 50, trained
        // codebooks so quantization noise doesn't mask it)
        val npCurve = npSweep.map { np =>
          val r = recall(pairs(Similarity.ivfPqRerankTopK(emb, queryIds = qs,
            k = 5, nprobe = np, trainIters = 2)))
          f""""np$np":$r%.2f"""
        }
        println(s"""{"scale":"$qlabel","trained_rerank_nprobe_curve":{${npCurve.mkString(",")}}}""")
      }
    }

    // ---- x80: "an index of representatives has no hot clouds" —
    // measured, not argued (round-11 verdict item 3). On the skewed
    // corpora the raw index's HOT queries sit inside a replicated
    // near-dup cloud: the exact top-5 is an arbitrary pick among
    // thousands of ε-ties, so ID-recall collapses to 0 while ε-recall
    // holds 1.0. x80 deduplicates FIRST, indexes the representatives —
    // the cloud collapses, the rep-grain exact top-5 is stable, and
    // ID-recall should RECOVER against rep-grain ground truth while
    // ε-recall vs the RAW corpus's k-th score stays 1.0 (every
    // returned representative is ε-equivalent to the raw answer).
    // Opt-in via SPARK_GRAFT_RECALL_X80 (the dedup pass over a 20M
    // corpus is not free); runs on the skew corpora only — the claim
    // is specifically about hot clouds.
    if (sys.env.contains("SPARK_GRAFT_RECALL_X80")) {
      for ((dir, label, _, skewed) <- corpora if skewed && wanted(label)) {
        val emb = graft.sources.Tables.load(spark, dir, "embeddings")
        val dd = Similarity.semDedupHierarchical(emb, minCos = 0.45)
        // Materialize the rep corpus to parquet rather than stacking a
        // persist on semDedup's internal persist: the nested-cache plan
        // trips Spark 4.1's CacheManager rebuild (CachedRDDBuilder.copy
        // over a null-session physical plan → NPE on the first action),
        // and the parquet form is the honest one anyway — the rep corpus
        // is the index-input artifact, same discipline as the stored
        // index lifecycles.
        val repsDir = s"/tmp/graft_x80_reps_$label"
        emb.join(dd.filter(!col("is_dup")).select("vec_id"), Seq("vec_id"))
          .write.mode("overwrite").parquet(repsDir)
        val reps = spark.read.parquet(repsDir)
        val nRaw = emb.count(); val nRep = reps.count()
        val idx = s"/tmp/graft_x80_reps_idx_$label"
        Similarity.ivfPqWriteIndex(reps, idx, trainIters = 2)
        val qFrame = emb.filter(col("vec_id").isin(qsHot.map(Long.box): _*))
        val gtRep = scoredRows(Similarity.bruteForceTopKAgainst(reps, qFrame, k = 5))
        val gtRaw = scoredRows(Similarity.bruteForceTopKAgainst(emb, qFrame, k = 5))
        val got = scoredRows(
          Similarity.ivfPqSearchIndexReranked(emb, idx, queryIds = qsHot, k = 5))
        val gotPairs = got.map(r => (r._1, r._2)).toSet
        val gtRepPairs = gtRep.map(r => (r._1, r._2)).toSet
        val idRecallRep =
          (gtRepPairs intersect gotPairs).size.toDouble / gtRepPairs.size
        // residual misses: ties or IVF pruning? widen the probe to see
        val npCurveRep = Seq(2, 4, 8).map { np =>
          val p = pairs(Similarity.ivfPqSearchIndexReranked(
            emb, idx, queryIds = qsHot, k = 5, nprobe = np))
          f""""np$np":${(gtRepPairs intersect p).size.toDouble / gtRepPairs.size}%.2f"""
        }
        // two ε yardsticks: vs the REP-GRAIN kth score (the honest
        // post-dedup tolerance — distinguishes rep-grain ties from
        // real retrieval misses) and vs the RAW kth score (≈1.0 inside
        // a dup cloud; post-dedup at most ONE returned rep can sit
        // that close, so a low number here is the dedup working, not
        // the index failing — recorded to pre-empt the misreading)
        def eps(gt: Map[Long, Double], tau: Double): Double =
          if (got.isEmpty) 0.0
          else got.count { case (q, _, c) => c >= gt(q) - tau }.toDouble / got.size
        val kthRep = gtRep.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).min }
        val kthRaw = gtRaw.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).min }
        println(f"""{"scale":"$label-x80","vectors_raw":$nRaw,"vectors_rep":$nRep,"hotq_id_recall5_rep_gt":$idRecallRep%.2f,"hotq_eps_recall5_rep_gt":{"tau001":${eps(kthRep, 0.001)}%.2f,"tau01":${eps(kthRep, 0.01)}%.2f},"hotq_eps_recall5_vs_raw":{"tau01":${eps(kthRaw, 0.01)}%.2f},"hotq_id_recall5_rep_nprobe":{${npCurveRep.mkString(",")}}}""")
        // ---- the converged form (x112): the cellCap keeps ≤ ceil(n/cap)
        // ε-tied survivors per mega-cell, which re-introduces rep-grain
        // ties at large cloud sizes (the 2M ID-recall 0.40 row). Pass 2
        // re-clusters the survivors and collapses each cloud to one rep
        // — ID-recall against the converged rep grain should RECOVER.
        val dd2 = Similarity.semDedupPasses(emb, minCos = 0.45, passes = 2)
        val reps2Dir = s"/tmp/graft_x80_reps2_$label"
        emb.join(dd2.filter(!col("is_dup")).select("vec_id"), Seq("vec_id"))
          .write.mode("overwrite").parquet(reps2Dir)
        val reps2 = spark.read.parquet(reps2Dir)
        val nRep2 = reps2.count()
        val idx2 = s"/tmp/graft_x80_reps2_idx_$label"
        Similarity.ivfPqWriteIndex(reps2, idx2, trainIters = 2)
        val gtRep2 = scoredRows(Similarity.bruteForceTopKAgainst(reps2, qFrame, k = 5))
        val got2 = scoredRows(
          Similarity.ivfPqSearchIndexReranked(emb, idx2, queryIds = qsHot, k = 5))
        val gtRep2Pairs = gtRep2.map(r => (r._1, r._2)).toSet
        val idRecallRep2 = (gtRep2Pairs intersect
          got2.map(r => (r._1, r._2)).toSet).size.toDouble / gtRep2Pairs.size
        val kthRep2 = gtRep2.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).min }
        def eps2(gt: Map[Long, Double], tau: Double): Double =
          if (got2.isEmpty) 0.0
          else got2.count { case (q, _, c) => c >= gt(q) - tau }.toDouble / got2.size
        // recall@1 of the query's own cloud representative, and the
        // nprobe curve — the diagnostics that separate the two loss
        // modes on a converged (singleton-rep) index: ties are
        // nprobe-FLAT, pruning misses RECOVER as probes widen. A
        // singleton rep has no density around it, so its coarse-cell
        // assignment is arbitrary relative to the query's — the
        // round-13 converged measurement found exactly this.
        val top1 = got2.groupBy(_._1).map { case (q, rs) => q -> rs.maxBy(_._3)._2 }
        val gtTop1 = gtRep2.groupBy(_._1).map { case (q, rs) => q -> rs.maxBy(_._3)._2 }
        val r1 = gtTop1.count { case (q, id) => top1.get(q).contains(id) }
          .toDouble / gtTop1.size
        val npCurve2 = Seq(2, 4, 8, 16).map { np =>
          val p = pairs(Similarity.ivfPqSearchIndexReranked(
            emb, idx2, queryIds = qsHot, k = 5, nprobe = np))
          f""""np$np":${(gtRep2Pairs intersect p).size.toDouble / gtRep2Pairs.size}%.2f"""
        }
        println(f"""{"scale":"$label-x80-converged","vectors_rep2":$nRep2,"hotq_id_recall5_rep2_gt":$idRecallRep2%.2f,"hotq_rep_top1_recall":$r1%.2f,"hotq_eps_recall5_rep2_gt":{"tau001":${eps2(kthRep2, 0.001)}%.2f},"hotq_eps_recall5_vs_raw":{"tau01":${eps2(kthRaw, 0.01)}%.2f},"hotq_id_recall5_rep2_nprobe":{${npCurve2.mkString(",")}}}""")
        // drop this corpus's internal persists (semDedup's shingle/tf
        // frames) before the next, larger corpus claims the memory
        graft.tools.InternalCaches.release(spark)
      }
    }
    spark.stop()
  }
}
