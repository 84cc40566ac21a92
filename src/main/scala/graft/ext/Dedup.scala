package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.util.sketch.BloomFilter
import graft.functions.Portable._

/** Deduplication operators for large-scale training-data pipelines
  * (SURVEY.md §2.11 — additive scope beyond the reference surface).
  *
  * Scale design (the 100 TB story):
  *   - Exact dedup is one hash-shuffle on the content key.
  *   - MinHash/SimHash are linear scans producing tiny signatures; the
  *     candidate join shuffles on (band, signature) buckets, never on
  *     raw text, so the all-pairs O(n²) blowup is avoided. Bucket skew
  *     (a boilerplate shingle shared by millions of docs) is the hazard:
  *     [[capShingleDf]] drops shingles above a document-frequency cap
  *     upstream of every inverted-index join, exactly like stopword
  *     removal — the difference between O(n·df_cap) and a quadratic
  *     bucket on boilerplate text.
  *   - Verification (exact Jaccard) runs only on candidate pairs.
  *   - Hashes here are md5-derived for oracle portability
  *     ([[graft.functions.Portable]]); production would use xxhash64.
  */
object Dedup {

  /** Edge rows per partition the connected-components loop targets when
    * sizing its round partitioner from the measured edge count — small
    * enough that a partition's per-round work is a few MB of Long
    * pairs, large enough that a graph only fans out across partitions
    * when there is real data to spread (below this, per-round task
    * scheduling dominates the loop).
    */
  private val EdgesPerCcPartition = 100000L

  /** Exact dedup: group by content, keep the lowest doc_id, count copies.
    * One shuffle on the (hashed) content key.
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(md5(col(textCol)).as("text_hash"), col("keep_id"), col("n_copies"))

  /** Distinct (doc_id, shingle) pairs: word `n`-gram shingling
    * (zipped-slice form; the shingle string is built codegen'd after
    * the explode — see [[graft.functions.Portable.shingleStructs]]).
    */
  def shingleSet(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(shingleStructs(col("t"), n)).as("s"))
      .select(col("doc_id"), shingleText(col("s"), n).as("shingle"))
      .distinct()

  /** Distinct (doc_id, sh) pairs with the shingle hashed to a 32-bit int
    * — downstream joins shuffle 8-byte keys instead of strings, and the
    * MinHash permutations become integer arithmetic. The (mirrored)
    * oracle hashes identically, so the rare 32-bit collision changes
    * both sides the same way.
    *
    * @param maxShingleDf drop shingles shared by more than this many
    *   documents (see [[capShingleDf]]); `Int.MaxValue` disables the cap.
    */
  def hashedShingleSet(docs: DataFrame, n: Int = 3, maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val sh = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(shingleStructs(col("t"), n)).as("s"))
      .select(col("doc_id"), hash32(shingleText(col("s"), n)).as("sh"))
      .distinct()
    if (maxShingleDf == Int.MaxValue) sh
    else {
      // persist the pre-cap set: the cap reads it TWICE (the hot-shingle
      // aggregate feeding the broadcast, then the anti-join probe), and
      // without the persist each read re-runs the full corpus scan +
      // tokenize + explode + the distinct's shuffle — at 100 TB that
      // doubles the dominant cost (callers only persist the capped
      // result). Routed through InternalCaches: memoized per canonical
      // plan (repeat invocations reuse one entry) and releasable by the
      // session via InternalCaches.release — a bare persist here would
      // leak one unreleasable CacheManager entry per distinct corpus.
      capShingleDf(graft.tools.InternalCaches.persist(sh), maxShingleDf)
    }
  }

  /** Document-frequency cap: remove every shingle that appears in more
    * than `maxDf` documents. A shingle shared by m documents contributes
    * m·(m−1)/2 rows to the inverted-index self-join — one boilerplate
    * phrase across a web-scale corpus is a quadratic bucket and a
    * guaranteed straggler; ultra-common shingles also carry ~zero
    * near-dup signal (the same argument as stopword removal). The
    * hot-shingle list is tiny by construction (only keys with df >
    * maxDf), so it broadcasts and the cap costs one count aggregate plus
    * a map-side anti join — no extra shuffle of the big side.
    */
  def capShingleDf(sh: DataFrame, maxDf: Int): DataFrame =
    sh.join(broadcast(hotShingles(sh, maxDf)), Seq("sh"), "left_anti")

  /** The hot-shingle list behind [[capShingleDf]] — exposed separately
    * so [[incrementalScreen]] can learn the list from one side and
    * apply it to both.
    */
  def hotShingles(sh: DataFrame, maxDf: Int): DataFrame = {
    require(maxDf > 0, s"maxDf must be positive, got $maxDf")
    sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("sh")
  }

  /** Exact n-gram Jaccard near-dup pairs: inverted-index self-join on
    * shingles → per-pair intersection counts → |A∩B| / (|A|+|B|−|A∩B|).
    * `minJaccard` filters on the (deterministically) rounded score.
    */
  def ngramJaccard(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.8): DataFrame =
    ngramJaccardFromShingles(hashedShingleSet(docs, n), minJaccard)

  /** Core of [[ngramJaccard]] over a prebuilt (possibly cached)
    * hashed-shingle set — the set is read four times in the plan
    * (self-join sides + two size lookups), so callers running several
    * dedup operators should persist it once.
    */
  def ngramJaccardFromShingles(sh: DataFrame, minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** MinHash signatures via affine permutations over the 32-bit shingle
    * hash: minhash_p = min over shingles of ((2p+1)·sh + (12345p+1)) mod
    * 2147483647. One md5 per shingle (not per shingle×perm); the affine
    * family over already-md5-mixed inputs is the classic MinHash
    * construction. Output: (doc_id, p, minhash).
    */
  def minhash(docs: DataFrame, numPerm: Int = 16, n: Int = 3): DataFrame =
    minhashFromShingles(hashedShingleSet(docs, n), numPerm)

  /** [[minhash]] over a prebuilt hashed-shingle set.
    *
    * All `numPerm` permutation minima are computed in ONE aggregation
    * pass over the (doc_id, sh) rows — one `min` column per permutation,
    * unpivoted to (doc_id, p, minhash) after the aggregate — instead of
    * exploding every shingle row `numPerm`× before the shuffle. The
    * map-side partial collapses each partition to one row per doc
    * either way, but the exploded form shuffles and hashes numPerm×
    * the rows and pays the explode itself on the biggest frame in the
    * pipeline; at corpus scale the signature stage is the dominant
    * scan, so a 16× row reduction there is the difference between the
    * shuffle fitting in memory and spilling.
    */
  def minhashFromShingles(sh: DataFrame, numPerm: Int = 16): DataFrame = {
    val mins = (0 until numPerm).map(p =>
      min(((lit(2L * p + 1)) * col("sh") + lit(12345L * p + 1))
        % 2147483647L).as(s"__m$p"))
    val stack = (0 until numPerm).map(p => s"$p, __m$p").mkString(", ")
    sh.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .selectExpr("doc_id", s"stack($numPerm, $stack) AS (p, minhash)")
  }

  /** MinHash-LSH candidate pairs with verified exact Jaccard: band the
    * signature (`rowsPerBand` minhashes per band, joined to a string
    * signature), bucket-join on (band, signature), then verify each
    * candidate pair with the exact n-gram Jaccard.
    * Output: (doc_a, doc_b, n_shared_bands, jaccard).
    */
  def minhashLsh(
      docs: DataFrame,
      numPerm: Int = 16,
      rowsPerBand: Int = 4,
      n: Int = 3): DataFrame =
    minhashLshFromShingles(hashedShingleSet(docs, n), numPerm, rowsPerBand)

  /** [[minhashLsh]] over a prebuilt hashed-shingle set. */
  def minhashLshFromShingles(
      sh: DataFrame,
      numPerm: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val mh = minhashFromShingles(sh, numPerm)
    val bands = mh
      .withColumn("band", (col("p") / rowsPerBand).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("p"), col("minhash")))),
          x => x.getField("minhash").cast("string")),
        ",").as("sig"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
    // Verify ONLY the candidate pairs: fan each candidate out by doc_a's
    // shingles, equi-join doc_b's shingles on (doc_b, sh), and count the
    // matches — intersection size per candidate pair. Cost is
    // O(|candidates| · shingles/doc), proportional to what the LSH
    // selected, NOT the full co-shingle pair join (that all-pairs pass is
    // exactly the work LSH exists to avoid; routing verification through
    // it would make this a strict superset of the exact operator).
    val shA = sh.select(col("doc_id").as("doc_a"), col("sh"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("sh"))
    val inter = cand.select("doc_a", "doc_b")
      .join(shA, Seq("doc_a"))
      .join(shB, Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val verified = inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 6)
          .as("jaccard"))
    // zero-intersection candidates (possible only via hash collisions in
    // the band signature) verify to jaccard 0.0
    cand.join(verified, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"), col("n_shared_bands"),
        coalesce(col("jaccard"), lit(0.0)).as("jaccard"))
  }

  /** 60-bit SimHash over distinct 3-gram shingles (shingle features, not
    * unigrams: on a small shared vocabulary unigram sets are nearly
    * identical across documents and the fingerprint carries no signal —
    * measured precision 0.002 vs 3-gram Jaccard on the fixture corpus):
    * for each bit position, sum +1/−1 by whether the shingle hash has
    * that bit set; the simhash takes bit=1 where the sum is strictly
    * positive. Output: (doc_id, simhash).
    */
  def simhash(docs: DataFrame, bits: Int = 60): DataFrame = {
    val sh = shingleSet(docs, 3)
      .select(col("doc_id"), hash60(col("shingle")).as("h"))
    // one codegen'd conditional sum per bit (single aggregation, no
    // bits× row explosion; the per-bit int sums equal the exploded form)
    val bitSums = (0 until bits).map(b =>
      sum(when(expr(s"shiftright(h, $b) & 1") === 1, 1).otherwise(-1)).as(s"s$b"))
    val simhashExpr = (0 until bits)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    sh.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), simhashExpr.cast("long").as("simhash"))
  }

  /** SimHash near-dup pairs: block on 15-bit chunks of the signature
    * (equal chunk ⇒ candidate), then exact Hamming distance via
    * bit_count(xor). Output: (doc_a, doc_b, hamming) with
    * hamming <= maxHamming.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 12): DataFrame =
    simhashPairsFromSig(simhash(docs), maxHamming)

  /** Connected components over near-dup pairs: every document reachable
    * through pair edges gets the MINIMUM doc_id of its component as
    * `cluster_id` — the cluster-resolution step that turns pairwise
    * near-dup output into "keep one representative per group".
    *
    * Algorithm: distributed min-label propagation — each round joins the
    * current labels across the (bidirectional) edge list and takes the
    * per-node minimum of own and neighbor labels, until a fixpoint. Each
    * round is one join + one aggregate (both shuffling on doc ids);
    * rounds = component diameter. Near-dup clusters are dense and
    * shallow (diameter a few hops), so this converges in 2–4 rounds on
    * real corpora; for adversarial chain-shaped graphs the published
    * alternating large-star/small-star variant (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") bounds rounds at
    * O(log n) with the same per-round dataflow — the loop below is the
    * seam to swap it into. The driver only coordinates rounds and reads
    * a has-anything-changed flag; labels stay distributed.
    *
    * Input: (doc_a, doc_b) pairs. Output: (doc_id, cluster_id) for every
    * doc appearing in at least one pair.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame =
    connectedComponentsWithRounds(pairs, maxIter)._1

  /** [[connectedComponents]] plus the number of rounds it took — the
    * observable the path-halving O(log diameter) claim is tested against
    * (chain-graph stress in HotKeyStressSpec).
    */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    // The loop body is RDD, not DataFrame, deliberately — this is the
    // "genuine iterative algorithm" carve-out (the same reason GraphX is
    // RDD-based): a DataFrame join re-plans, re-optimizes (AQE stage by
    // stage) and re-generates code EVERY round because each round's plan
    // carries fresh attribute ids, and that fixed cost dwarfs the data
    // work at any scale where rounds are latency-bound. The RDD loop
    // keys everything once with one HashPartitioner, so the per-round
    // joins are narrow (no shuffle at all — both sides co-partitioned);
    // the only shuffle per round is the tiny reduceByKey of candidate
    // labels.
    //
    // Two shrink moves per round: neighbor-min (one-hop propagation) and
    // path halving (label(label(v)) — pointer doubling), giving
    // O(log diameter) rounds on chain-shaped components. Convergence is
    // one action per round: the changed-count job materializes the new
    // labels (filling their cache) and yields the flag in the same pass
    // (the old-vs-new join is narrow — co-partitioned).
    val spark = pairs.sparkSession
    val sc = spark.sparkContext
    import spark.implicits._
    val basePart = new org.apache.spark.HashPartitioner(
      math.max(1, math.min(sc.defaultParallelism, 64)))
    // In-partition dedup of an already KEY-partitioned pair RDD: every
    // copy of (k, v) hashes to the same partition under a key
    // partitioner, so a per-partition hash set is globally exact.
    // Transient ~2× of the partition it dedups — the same order as the
    // cache() that follows, which holds the deduped partition as Java
    // objects anyway.
    def dedupInPartition(rdd: org.apache.spark.rdd.RDD[(Long, Long)]) =
      rdd.mapPartitions({ it =>
        val seen = new java.util.HashSet[(Long, Long)]()
        it.filter(seen.add)
      }, preservesPartitioning = true)
    // (dst, src): keyed by the side whose label we read. ONE shuffle
    // builds the deduped keyed edge list (round 19 — was distinct()
    // THEN partitionBy, i.e. the full edge list crossing the network
    // twice; guide §2.4): a local pre-dedup bounds map-side duplicates
    // (the combiner distinct() had), the key shuffle co-locates every
    // copy of an edge, and the in-partition dedup finishes the job.
    val edgesBase = dedupInPartition(
      pairs.select(col("doc_a"), col("doc_b")).as[(Long, Long)].rdd
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }
        .mapPartitions { it =>
          val seen = new java.util.HashSet[(Long, Long)]()
          it.filter(seen.add)
        }
        .partitionBy(basePart)).cache()
    // Scale-adaptive round partitioning: every round schedules a task
    // per partition, so a small graph spread over defaultParallelism
    // partitions is pure per-round scheduling latency (measured: the
    // x98 text-grain CC at sf0.1 spent ~8 s driving ~40 rounds of
    // 32-task micro-stages over a few thousand edges). Derive the
    // partition count from the MEASURED edge count (the count also
    // materializes the cache the first round would otherwise fill) and
    // re-key the cached edge list down when oversized — the repartition
    // reads cached blocks, so it is cheap exactly when it fires. Big
    // graphs keep basePart untouched: at ≥ EdgesPerCcPartition×cores
    // edges nothing changes, so cluster-scale behavior is identical.
    val nEdges = edgesBase.count()
    val idealParts = math.min(basePart.numPartitions.toLong,
      math.max(1L, (nEdges + EdgesPerCcPartition - 1) / EdgesPerCcPartition)).toInt
    // When the re-key fires, the parent cache is NOT dropped eagerly
    // (round 19 — was an extra count() job to materialize the child
    // before unpersisting): round 1's own action materializes the
    // re-keyed child from the parent's cached blocks, and the parent
    // unpersists after that first action — the round-18 verdict's
    // "two extra jobs per small-graph CC call" reclaimed.
    val (edgesByDst, part, rekeyParent) =
      if (idealParts < basePart.numPartitions) {
        val p = new org.apache.spark.HashPartitioner(idealParts)
        (edgesBase.partitionBy(p).cache(), p, Some(edgesBase))
      } else (edgesBase, basePart, None)
    // the label seed is narrow: edges are keyed by dst, so every copy
    // of a vertex key is already co-located and the distinct() shuffle
    // the old form paid is a per-partition hash set
    var labels = edgesByDst.mapPartitions({ it =>
      val seen = new java.util.HashSet[Long]()
      it.collect { case (dst, _) if seen.add(dst) => (dst, dst) }
    }, preservesPartitioning = true).cache()
    var labelsCheckpointed = false // never unpersist a checkpointed generation
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = edgesByDst.join(labels) // narrow: same partitioner
        .map { case (_, (src, lab)) => (src, lab) }
      val parentMin = labels.map(_.swap)
        .partitionBy(part).join(labels) // label(label(v))
        .map { case (_, (node, lab2)) => (node, lab2) }
      var next = labels.union(neighborMin).union(parentMin)
        .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
      // truncate lineage periodically: each round chains on the previous
      // labels, and a straggler recompute late in a long run would
      // otherwise replay the whole chain. localCheckpoint() already
      // assigns its own storage level, so it REPLACES cache() on those
      // rounds — calling both throws ("cannot change storage level").
      val nextCheckpointed = iter % 10 == 9
      if (nextCheckpointed) next = next.localCheckpoint()
      else next = next.cache()
      val changedCount = labels.join(next)
        .filter { case (_, (o, n)) => o != n }.count() // materializes next
      // round 1's action just materialized the re-keyed edge cache (and
      // everything downstream of it) — the pre-re-key parent can go now
      if (iter == 0) rekeyParent.foreach(_.unpersist(blocking = false))
      // A localCheckpoint'd generation must KEEP its blocks: its lineage
      // is already truncated, so unpersisting it would leave the next
      // round's MEMORY_ONLY-cached child unable to recompute after an
      // eviction ("checkpoint block not found"). Those blocks are freed
      // by the ContextCleaner once the RDD is unreferenced.
      if (!labelsCheckpointed) labels.unpersist(blocking = false)
      labelsCheckpointed = nextCheckpointed
      labels = next
      converged = changedCount == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "partial labels would silently produce multiple representatives " +
          "per component; raise maxIter for this graph")
    edgesByDst.unpersist(blocking = false)
    (labels.toDF("doc_id", "cluster_id"), iter)
  }

  /** Benchmark decontamination screen: for every training document, the
    * number of distinct word `n`-grams it shares with a benchmark/eval
    * document set, and a `contaminated` flag at `minShared` — the
    * standard "did the eval set leak into the training corpus" check
    * run before any training data ships.
    *
    * Scale shape: the benchmark side reduces to a DISTINCT shingle-hash
    * set — benchmarks are small by nature, so it is broadcast and the
    * corpus-side scan never shuffles on the join; one (doc_id)-keyed
    * aggregate with map-side partials follows. Longer `n` (default 5)
    * keeps chance collisions near zero; `minShared` tunes strictness.
    * Output: (doc_id, n_shared, contaminated) for every `docs` row.
    */
  def contaminationScreen(
      docs: DataFrame,
      bench: DataFrame,
      n: Int = 5,
      minShared: Long = 1L): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val d = hashedShingleSet(docs, n)
    val b = hashedShingleSet(bench, n).select("sh").distinct()
    val ov = d.join(broadcast(b), Seq("sh"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    docs.select(col("doc_id")).join(ov, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) >= minShared).as("contaminated"))
  }

  /** [[contaminationScreen]] with a Bloom-filter pre-gate — the form
    * that survives a benchmark/blocklist side too large to broadcast
    * EXACTLY. x30 ships the whole distinct bench shingle set to every
    * executor; at a 10⁹-shingle blocklist that broadcast (8+ GB of
    * exact hashes) stops fitting, while the Bloom filter over the same
    * set is `optimalNumOfBits(n, fpp)/8` bytes (~1.2 MB per million
    * shingles at 1%). The blob is NOT literal-sized at every scale —
    * 10⁹ items at 1% is ~1.2 GB — so the carrier switches on size:
    * at or under `maxLiteralBytes` it rides the plan as a binary
    * literal (`BloomFilterMightContain`); past that it rides a
    * broadcast variable ([[graft.functions.BloomMightContainBc]]),
    * fetched once per executor instead of shipping in every task
    * binary.
    *
    * Plan shape, in order:
    *   1. index build — one `treeAggregate` pass over the bench
    *     shingle set folding into an `o.a.s.util.sketch.BloomFilter`
    *     (map-side partial filters, tree-merged). Deliberately NOT
    *     Catalyst's `BloomFilterAggregate`: that aggregate silently
    *     clamps its sizing to `spark.sql.optimizer.runtime.bloomFilter
    *     .{maxNumItems (4M), maxNumBits (64M bits ≈ 8 MB)}` — past the
    *     caps the filter is built smaller than requested, fpp drifts
    *     toward 1, and the pre-gate stops pruning with no error raised
    *     (output would stay exact; the performance claim dies
    *     silently). The sketch library has no such ceiling, and its
    *     serialized form is byte-compatible with
    *     `BloomFilterMightContain`'s `readFrom`. The driver-side fold
    *     result is control-plane — in production this is a stored
    *     index artifact built once at blocklist ingest, like x40's
    *     hash index.
    *   2. map-only pre-gate — the corpus shingle scan filters through
    *     `might_contain` (codegen'd, literal- or broadcast-carried)
    *     BEFORE any exchange; false-negative-free, so no true overlap
    *     is lost, and ~(overlap + fpp·|corpus shingles|) rows survive.
    *   3. exact confirm — the survivors join the bench set on `sh`.
    *     Only survivors reach the exchange, so the join cost tracks the
    *     true overlap, not the corpus; Bloom false positives die here,
    *     making the OUTPUT bit-identical to x30's exact screen (the
    *     oracle is literally x30's SQL).
    *
    * `expectedItems` sizes the filter; `None` (the default) sizes it
    * from the bench set's measured cardinality — the count is one
    * cached-read aggregate over the set the build pass materializes
    * anyway, and it keeps the blob proportionate to the blocklist at
    * every scale instead of hard-coding one decade's guess.
    * Overestimating only wastes bits; undersizing only raises fpp —
    * the confirm join keeps the output exact either way. `fpp` trades
    * blob size against survivor count.
    */
  /** Fold a LONG column into an `o.a.s.util.sketch.BloomFilter` with
    * one treeAggregate pass (map-side partial filters, tree-merged).
    * The zero value is NULL, not an allocated filter: treeAggregate
    * ships its zero inside every task closure, and at blocklist scales
    * (~1.2 GB of zeroed bits at 10⁹ items) a materialized zero would
    * serialize the empty bit array to every task before a single value
    * is hashed. Each partition allocates its own filter on first use;
    * null partials merge away, and an empty input yields one
    * driver-side empty filter (keeps nothing — the exact answer).
    */
  private[graft] def buildBloomOfLongs(
      vals: DataFrame, valCol: String, items: Long, numBits: Long): BloomFilter = {
    val merged = vals.select(col(valCol))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .rdd.treeAggregate(null: BloomFilter)(
        (f, v) => {
          val g = if (f == null) BloomFilter.create(items, numBits) else f
          g.putLong(v); g
        },
        (a, c) =>
          if (a == null) c
          else if (c == null) a
          else { a.mergeInPlace(c); a })
    Option(merged).getOrElse(BloomFilter.create(items, numBits))
  }

  /** The size-switched x65 carrier: `might_contain(bf, input)` as a
    * codegen'd Column — a binary literal riding the plan when the blob
    * is at most `maxLiteralBytes`, else a broadcast variable fetched
    * once per executor ([[graft.functions.BloomMightContainBc]]),
    * registered with [[graft.tools.InternalCaches]] for session-level
    * release (the lazy plan holds the only reference — without the
    * registry a long-lived session would pin one multi-GB blob per
    * call in block-manager memory forever).
    */
  private[graft] def bloomGateColumn(
      spark: SparkSession, bf: BloomFilter, numBits: Long,
      maxLiteralBytes: Long, input: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    if (numBits / 8 <= maxLiteralBytes) {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      GraftSqlBridge.column(new BloomFilterMightContain(
        Literal(bos.toByteArray, BinaryType),
        GraftSqlBridge.expression(input)))
    } else {
      GraftSqlBridge.column(graft.functions.BloomMightContainBc(
        graft.tools.InternalCaches.trackBroadcast(
          spark, spark.sparkContext.broadcast(bf)),
        GraftSqlBridge.expression(input)))
    }
  }

  def contaminationScreenBloom(
      docs: DataFrame,
      bench: DataFrame,
      n: Int = 5,
      minShared: Long = 1L,
      expectedItems: Option[Long] = None,
      fpp: Double = 0.01,
      maxLiteralBytes: Long = 4L << 20): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(expectedItems.forall(_ > 0) && fpp > 0 && fpp < 1,
      s"need expectedItems > 0 and fpp in (0,1), got $expectedItems / $fpp")
    // bench side is read twice (bloom build + exact confirm) — persist
    // the distinct set; in production both are precomputed index
    // artifacts and neither pass reruns at query time.
    val b = graft.tools.InternalCaches.persist(
      hashedShingleSet(bench, n).select("sh").distinct())
    val items = expectedItems.getOrElse(math.max(b.count(), 64L))
    val numBits = BloomFilter.optimalNumOfBits(items, fpp)
    val spark = docs.sparkSession
    val bf = buildBloomOfLongs(b, "sh", items, numBits)
    val mightContain = bloomGateColumn(spark, bf, numBits, maxLiteralBytes, col("sh"))
    val survivors = hashedShingleSet(docs, n).filter(mightContain)
    val ov = survivors.join(b, Seq("sh"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    docs.select(col("doc_id")).join(ov, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) >= minShared).as("contaminated"))
  }

  /** Incremental ingest screen — the daily-pipeline form of dedup:
    * screen an INCOMING batch against the EXISTING corpus without ever
    * comparing existing×existing (that work was done when those docs
    * were ingested). Two gates, exact first:
    *   1. exact — md5(incoming.text) present in the existing corpus's
    *      distinct hash set (in production: the stored exact-hash index,
    *      probed via broadcast/bloom when it fits);
    *   2. near — n-gram shingles on both sides, with the DF cap LEARNED
    *      FROM THE EXISTING SIDE applied to both (the hot-shingle list
    *      is part of the stored index — boilerplate is boilerplate
    *      whichever side it appears on), an inverted-index join strictly
    *      incoming→existing, Jaccard over the capped sets, and the best
    *      existing match per incoming doc (highest jaccard, ties to the
    *      lowest existing id) at >= `minJaccard`.
    *
    * Scale shape: the existing side reduces to two precomputable
    * index artifacts (hash set + capped shingle set); per-batch cost is
    * the incoming scan plus an index probe shuffled on shingle —
    * O(|incoming| · overlap), never O(corpus²). The best-match pick
    * rides the heap operator's map-side partial, sort-free.
    *
    * Output, one row per incoming doc: (doc_id, is_exact_dup,
    * near_dup_of, near_jaccard, verdict) with verdict ∈ 'drop_exact' |
    * 'drop_near' | 'keep' (exact wins when both fire).
    */
  def incrementalScreen(
      existing: DataFrame,
      incoming: DataFrame,
      n: Int = 3,
      minJaccard: Double = 0.8,
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    import graft.plans.TopKPerGroup
    val exHash = existing.select(md5(col("text")).as("h")).distinct()
      .withColumn("ex", lit(true))
    val exactFlag = incoming.select(col("doc_id"), md5(col("text")).as("h"))
      .join(exHash, Seq("h"), "left")
      .select(col("doc_id"), coalesce(col("ex"), lit(false)).as("is_exact_dup"))
    // Both shingle sets are read several times by this plan (the hot
    // aggregate, the cap anti-joins, the size aggregates, the probe
    // join); persist them via the releasable registry or every read
    // re-scans and re-shingles its corpus. In production the EXISTING
    // side's artifacts are the stored index, computed once at ingest —
    // this persist is the single-job stand-in for that reuse.
    val exShRaw = graft.tools.InternalCaches.persist(hashedShingleSet(existing, n))
    val inShRaw = graft.tools.InternalCaches.persist(hashedShingleSet(incoming, n))
    val (exSh, inSh) =
      if (maxShingleDf == Int.MaxValue) (exShRaw, inShRaw)
      else {
        // the hot list is learned from the EXISTING side ([[hotShingles]]
        // keeps capShingleDf's positive-maxDf guard) and applied to both;
        // both capped sets are read twice (size aggregate + probe join)
        val hot = hotShingles(exShRaw, maxShingleDf)
        (graft.tools.InternalCaches.persist(
            exShRaw.join(broadcast(hot), Seq("sh"), "left_anti")),
          graft.tools.InternalCaches.persist(
            inShRaw.join(broadcast(hot), Seq("sh"), "left_anti")))
      }
    val exSizes = exSh.groupBy("doc_id").agg(count(lit(1)).as("n_ex"))
      .withColumnRenamed("doc_id", "ex_doc")
    screenVerdict(exactFlag, inSh, exSh, exSizes, minJaccard)
  }

  /** The asymmetric probe + verdict shared by [[incrementalScreen]] and
    * [[screenAgainstNearDupIndex]]: incoming shingles join existing
    * shingles strictly incoming→existing, Jaccard over the (already
    * capped) sets, best existing match per incoming doc via the heap
    * operator (sort-free), exact gate wins over near. `exSizes` arrives
    * precomputed — the in-memory path derives it from `exSh`, the
    * stored path reads it from the index so the screen never aggregates
    * over the whole shingle index.
    */
  private def screenVerdict(exactFlag: DataFrame, inSh: DataFrame,
      exSh: DataFrame, exSizes: DataFrame, minJaccard: Double): DataFrame = {
    import graft.plans.TopKPerGroup
    val inSizes = inSh.groupBy("doc_id").agg(count(lit(1)).as("n_in"))
    val inter = inSh
      .join(exSh.withColumnRenamed("doc_id", "ex_doc"), Seq("sh"))
      .groupBy(col("doc_id"), col("ex_doc"))
      .agg(count(lit(1)).as("inter"))
    val scored = inter.join(inSizes, Seq("doc_id")).join(exSizes, Seq("ex_doc"))
      .select(col("doc_id"), col("ex_doc"),
        round(col("inter").cast("double") / (col("n_in") + col("n_ex") - col("inter")), 6)
          .as("jac"))
      .filter(col("jac") >= minJaccard)
    val best = TopKPerGroup.topK(scored, Seq("doc_id"),
        Seq("jac" -> TopKPerGroup.Desc, "ex_doc" -> TopKPerGroup.Asc), 1)
      .select(col("doc_id"), col("ex_doc").as("near_dup_of"),
        col("jac").as("near_jaccard"))
    exactFlag.join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_exact_dup"),
        col("near_dup_of"), col("near_jaccard"),
        when(col("is_exact_dup"), lit("drop_exact"))
          .when(col("near_dup_of").isNotNull, lit("drop_near"))
          .otherwise(lit("keep")).as("verdict"))
  }

  /** x104 index half — [[incrementalScreen]]'s existing-side artifacts
    * made literal parquet: the storage lifecycle the screen family
    * already has at the substring (x85/x95), semantic (x90), and ANN
    * (x59/x61) grains, applied to the document-grain near-dup screen.
    * x40's own Scaladoc calls its per-run persist "the single-job
    * stand-in" for exactly this index; this is the production form.
    *
    * Layout under `indexDir`:
    *   - `hashes/`   distinct md5(text) — the exact gate's probe set;
    *   - `hot/`      the hot-shingle list learned AT BUILD (df >
    *                 maxShingleDf over the build corpus) — stored so
    *                 appends and screens cap with the SAME list;
    *   - `shingles/` the capped (doc_id, sh) pairs;
    *   - `sizes/`    per-doc capped shingle counts — stored so the
    *                 screen never aggregates over the whole index.
    *
    * The hot list is FROZEN at build (the x90 stale-centroid analog:
    * boilerplate learned at ingest; [[compactNearDupIndex]] or a
    * rebuild refreshes it). Unlike the gram index's semi-join set
    * semantics, `shingles` duplicates are NOT harmless — the
    * intersection COUNTS them — so appends must be disjoint batches
    * (the natural ingest contract: append exactly the batch just
    * screened and kept); an accidental double-append is repaired by
    * [[compactNearDupIndex]].
    */
  def writeNearDupIndex(existing: DataFrame, indexDir: String, n: Int = 3,
      maxShingleDf: Int = Int.MaxValue): Unit = {
    val spark = existing.sparkSession
    // `hashes` shares nothing with the shingle chain, so the two commit
    // chains overlap from a driver pool (guide §2.6): tiny index writes
    // are dominated by per-job scheduling + commit latency, and the
    // hashes job's tasks back-fill the shingle chain's tails
    graft.tools.DriverPool.awaitAll(Seq(
      () => {
        val shRaw = graft.tools.InternalCaches.persist(hashedShingleSet(existing, n))
        val hot =
          if (maxShingleDf == Int.MaxValue) shRaw.select("sh").limit(0)
          else hotShingles(shRaw, maxShingleDf)
        hot.write.mode("overwrite").parquet(s"$indexDir/hot")
        val hotStored = spark.read.parquet(s"$indexDir/hot")
        shRaw.join(broadcast(hotStored), Seq("sh"), "left_anti")
          .write.mode("overwrite").parquet(s"$indexDir/shingles")
        // sizes from the WRITTEN files — self-consistent with the stored
        // capped set by construction, and the read-back is cheaper than
        // re-deriving the shingle pipeline
        spark.read.parquet(s"$indexDir/shingles")
          .groupBy("doc_id").agg(count(lit(1)).as("n_ex"))
          .write.mode("overwrite").parquet(s"$indexDir/sizes")
      },
      // hashes carry doc_id PROVENANCE (the exact gate itself probes the
      // distinct h projection): a takedown of one document must not
      // un-gate another live document with identical text, which a bare
      // distinct-hash set cannot express — see deleteFromNearDupIndex
      () => existing.select(col("doc_id"), md5(col("text")).as("h")).distinct()
        .write.mode("overwrite").parquet(s"$indexDir/hashes")))
    IndexFs.writeSmall(spark, s"$indexDir/_format", NearDupFormat)
  }

  /** On-disk format version of the near-dup index. "2" = the hashes
    * table carries (doc_id, h) provenance; the unstamped v1 layout
    * stored distinct `h` only. The two must never mix in one
    * directory: schema inference picks one file's footer, so a v1 file
    * winning surfaces v2 rows with `doc_id` NULL and
    * [[deleteFromNearDupIndex]]'s anti-join silently stops suppressing
    * the pre-upgrade hash rows of a taken-down document, while a v2
    * file winning fails the doc_id-dependent reads at analysis.
    * [[requireNearDupFormat]] gates every verb that touches the stored
    * tables; [[rebuildNearDupIndex]] is exempt — it is the remedy.
    */
  private val NearDupFormat = "2"

  private def requireNearDupFormat(spark: SparkSession, indexDir: String): Unit =
    if (IndexFs.exists(spark, s"$indexDir/hashes") &&
        !IndexFs.readSmall(spark, s"$indexDir/_format").contains(NearDupFormat))
      throw new IllegalStateException(
        s"near-dup index at $indexDir predates the (doc_id, h) hashes " +
          "format (no _format stamp): appending or deleting would mix " +
          "schemas in one table and silently break takedown suppression " +
          "— run rebuildNearDupIndex over the live corpus to migrate")

  /** Append a (disjoint) kept batch into the stored near-dup index:
    * batch shingles capped by the STORED hot list, batch sizes, batch
    * hashes — all as additional files. Cost = one batch scan +
    * batch-sized aggregates, independent of index size. Each table
    * gains exactly ONE file per append (`repartition(1)` before the
    * write — the payload is batch-sized, so a single writer is the
    * right parallelism, the compute upstream of the exchange stays
    * parallel, and the live file count equals the append count), and
    * `maxFilesPerTable`
    * (0 disables) bounds that count: when the `shingles` table — the
    * largest of the three, and they grow in lockstep — exceeds the
    * threshold, [[compactNearDupIndex]] runs inline. Screen output is
    * invariant across the trigger (compaction is the distinct-rewrite
    * repair; spec-gated).
    */
  def appendNearDupIndex(batch: DataFrame, indexDir: String, n: Int = 3,
      maxFilesPerTable: Int = 64): Unit = {
    val spark = batch.sparkSession
    // heal a crashed compaction swap BEFORE appending: mode("append")
    // into a missing live table would mint a batch-only table and fork
    // the index away from the orphaned .compact copy
    recoverNearDupSwap(spark, indexDir)
    requireNearDupFormat(spark, indexDir)
    val hot = spark.read.parquet(s"$indexDir/hot")
    val capped = graft.tools.InternalCaches.persist(
      hashedShingleSet(batch, n).join(broadcast(hot), Seq("sh"), "left_anti"))
    // the hashes append shares nothing with the shingle chain — overlap
    // the two commit chains (guide §2.6; per-append these are three
    // tiny jobs whose cost is scheduling + commit latency). sizes stays
    // AFTER shingles inside its chain: the shingles write materializes
    // the registry-persisted `capped`, which sizes then reads from cache.
    graft.tools.DriverPool.awaitAll(Seq(
      () => {
        capped.repartition(1).write.mode("append").parquet(s"$indexDir/shingles")
        capped.groupBy("doc_id").agg(count(lit(1)).as("n_ex"))
          .repartition(1).write.mode("append").parquet(s"$indexDir/sizes")
      },
      () => batch.select(col("doc_id"), md5(col("text")).as("h")).distinct()
        .repartition(1).write.mode("append").parquet(s"$indexDir/hashes")))
    if (maxFilesPerTable > 0 &&
        countDataFiles(spark, s"$indexDir/shingles") > maxFilesPerTable.toLong)
      compactNearDupIndex(spark, indexDir)
  }

  /** [[appendNearDupIndex]] under an at-least-once delivery contract
    * (the x114 streaming gate): near-dup appends are NOT replay-safe —
    * duplicated shingle rows inflate intersection counts (the x104
    * nuance) — so each append commits a per-batch marker
    * (`_batch_commits/b<id>`) and a redelivered batch whose marker
    * exists is skipped outright. The marker writes AFTER the data (a
    * crash between them makes the redelivery double-append — the
    * over-approximation [[compactNearDupIndex]]'s distinct-rewrite
    * repairs, spec-gated), never before (marker-first would LOSE the
    * batch). Marker I/O goes through [[IndexFs]] (the Hadoop API), so
    * the exactly-once contract holds on whatever filesystem `indexDir`
    * names — hdfs/s3a index dirs included, not just local disk.
    * Returns whether the append ran.
    */
  def appendNearDupIndexOnce(batch: DataFrame, indexDir: String,
      batchId: Long, n: Int = 3, maxFilesPerTable: Int = 64): Boolean = {
    val spark = batch.sparkSession
    // heal a crashed whole-index rebuild swap BEFORE the marker probe:
    // the markers live inside the swapped directory
    IndexFs.recoverSwap(spark, indexDir)
    val marker = s"$indexDir/_batch_commits/b$batchId"
    if (IndexFs.exists(spark, marker)) false
    else {
      appendNearDupIndex(batch, indexDir, n, maxFilesPerTable)
      IndexFs.touch(spark, marker)
      true
    }
  }

  /** A stored near-dup table with takedown tombstones applied — the
    * per-doc_id anti-join every index reader routes through
    * (merge-on-read, the [[graft.ext.Similarity]] `liveVectors`
    * discipline at the document grain). The tombstone table is
    * takedown-request-sized and broadcasts; physical removal is
    * deferred to [[compactNearDupIndex]] (applies and clears) or
    * [[rebuildNearDupIndex]] (whole-directory swap — the swapped-in
    * index starts with no tombstones).
    */
  private def ndLive(table: DataFrame, spark: SparkSession,
      indexDir: String): DataFrame = {
    val del = s"$indexDir/deletes"
    if (IndexFs.exists(spark, del))
      table.join(broadcast(spark.read.parquet(del).distinct()),
        Seq("doc_id"), "left_anti")
    else table
  }

  /** Takedown at the document grain — the right-to-be-forgotten verb
    * for the stored near-dup index: doc_ids land as TOMBSTONES
    * (`deletes/`, one tiny file per request) that every reader
    * anti-joins out of `hashes`/`shingles`/`sizes`, so the delete is
    * effective at the next screen for O(|request|) I/O — never an
    * index-sized rewrite on the takedown path. The exact gate stays
    * correct for OTHER copies of the same text because `hashes`
    * stores (doc_id, h) provenance: only the deleted document's hash
    * row is suppressed, and the distinct-h probe set still carries
    * the hash while any live document has it. Set semantics make the
    * write replay-safe without markers. The frozen hot list is NOT
    * revisited (it is a cap, not content — a takedown that shifts
    * boilerplate frequencies is [[rebuildNearDupIndex]]'s case).
    * Re-admission contract: tombstones win over appends until a
    * compaction clears the applied set (the semantic-index rule;
    * spec-pinned in TakedownSpec).
    */
  def deleteFromNearDupIndex(docIds: DataFrame, indexDir: String): Unit = {
    val spark = docIds.sparkSession
    recoverNearDupSwap(spark, indexDir)
    requireNearDupFormat(spark, indexDir)
    docIds.select(col("doc_id")).filter(col("doc_id").isNotNull).distinct()
      .repartition(1).write.mode("append").parquet(s"$indexDir/deletes")
    // a frame memoized over the OLD tombstone set would keep matching
    // against the deleted documents — the rebuild staleness class. The
    // release is scoped to the tombstone dir (round 19 — was the whole
    // indexDir): a takedown changes no stored artifact except
    // `deletes/` (hot/hashes/shingles/sizes files are immutable until
    // a compaction, which releases its swapped tables itself), and
    // the screen's memoized batch-side frame reads only the
    // frozen hot list — the whole-prefix release forced every
    // subsequent screen of the same probe to re-shingle it.
    graft.tools.InternalCaches.releaseByPath(spark, s"$indexDir/deletes")
  }

  /** Heal any crashed tmp → old → live swap on the near-dup index —
    * the whole-directory rebuild swap first ([[rebuildNearDupIndex]]),
    * then the three per-table compaction swaps
    * ([[IndexFs.recoverSwap]]); called at the top of every
    * read/append/compact entry so "crash anywhere, re-run to finish"
    * is true of the whole lifecycle, not just the compactor.
    */
  private def recoverNearDupSwap(spark: SparkSession, indexDir: String): Unit = {
    IndexFs.recoverSwap(spark, indexDir)
    Seq("shingles", "sizes", "hashes")
      .foreach(t => IndexFs.recoverSwap(spark, s"$indexDir/$t"))
  }

  /** Retrain-and-migrate for the near-dup index's FROZEN hot-shingle
    * list — the x116 discipline at the document grain: the hot list is
    * learned at build and never refreshed by appends (boilerplate that
    * emerges AFTER ingest keeps generating candidate pairs the cap
    * exists to kill), so the drifted-corpus remedy is a rebuild. Takes
    * the live CORPUS as input — unlike the semantic index, the stored
    * artifacts cannot seed the retrain (shingles were CAPPED at write;
    * the dropped-hot rows and the raw text are gone), so the caller
    * hands back the document set, re-learns the hot list over all of
    * it, re-caps every shingle set under the new list, and swaps the
    * WHOLE index directory as one unit (hot and shingles must change
    * together: a screen capping the incoming batch under one list
    * against stored shingles capped under another would systematically
    * under-count intersections). `_batch_commits` markers move into
    * the new directory before the swap so post-rebuild redeliveries
    * still skip; the memoized screens reading the old directory are
    * invalidated ([[graft.tools.InternalCaches.releaseByPath]] — the
    * x116 stale-geometry lesson). Cost = the build's (one corpus
    * shingle pass + the df aggregate), paid only when boilerplate
    * drift warrants a fresh cap.
    */
  def rebuildNearDupIndex(corpus: DataFrame, indexDir: String, n: Int = 3,
      maxShingleDf: Int = Int.MaxValue): Unit = {
    val spark = corpus.sparkSession
    recoverNearDupSwap(spark, indexDir)
    val tmp = s"$indexDir.compact"
    // a PRIOR rebuild may have crashed after moving the live markers
    // into tmp but before the swap — tmp then holds the ONLY copy, and
    // the wholesale delete below would degrade every committed batch
    // to at-least-once (double-appended intersection counts until the
    // next compaction). Rescue them back into the live directory first
    // (the round-14 advisory: the two rebuild lifecycles' recovery
    // guarantees must be symmetric).
    IndexFs.mergeMarkers(spark, s"$tmp/_batch_commits",
      s"$indexDir/_batch_commits")
    IndexFs.fs(spark, tmp).delete(new org.apache.hadoop.fs.Path(tmp), true)
    // takedowns stay durable across a rebuild even if the caller hands
    // back a corpus that still contains the tombstoned documents: the
    // live tombstone set filters the retrain input, and the swapped-in
    // directory starts clean (deletes/ stays behind in .old)
    writeNearDupIndex(ndLive(corpus, spark, indexDir), tmp, n, maxShingleDf)
    // per-file move with asserted renames, not a directory rename: see
    // [[IndexFs.mergeMarkers]] for the two silent-degrade shapes a bare
    // rename has here
    IndexFs.mergeMarkers(spark, s"$indexDir/_batch_commits",
      s"$tmp/_batch_commits")
    IndexFs.swapCompact(spark, indexDir)
    graft.tools.InternalCaches.releaseByPath(spark, indexDir)
  }

  /** Offline maintenance for the near-dup index: distinct-rewrite
    * `shingles` and `hashes` (repairing any accidental double-append —
    * the duplicates that would inflate intersection counts), recompute
    * `sizes` from the compacted set, then swap each table tmp → old →
    * live ([[IndexFs.swapCompact]]). Every step leaves a complete copy
    * of each table on disk; the one step with no LIVE directory (between
    * the two renames) is detected and completed by
    * [[IndexFs.recoverSwap]], which every lifecycle entry point runs
    * first — so a crash at any point is healed by the next read, append,
    * or compaction re-run. The hot list is left as built — refreshing it
    * is a REBUILD (it changes which shingles the whole index stores),
    * not a compaction.
    */
  def compactNearDupIndex(spark: SparkSession, indexDir: String): Unit = {
    recoverNearDupSwap(spark, indexDir)
    requireNearDupFormat(spark, indexDir)
    def swap(table: String): Unit =
      IndexFs.swapCompact(spark, s"$indexDir/$table")
    // local persist, not the memoized registry: the frame reads the very
    // directory the swap replaces (the compactGramIndex argument).
    // Takedown tombstones apply DURABLY here (ndLive anti-joins them
    // out of every rewrite) and clear only after the LAST table swap:
    // a crash between leaves tombstones anti-joining already-absent
    // doc_ids — a no-op, never a resurrected document.
    // the hashes rewrite shares nothing with the shingle chain — the
    // two rewrite chains overlap from a driver pool (guide §2.6);
    // every swap still happens strictly AFTER both chains complete
    val sh = ndLive(spark.read.parquet(s"$indexDir/shingles"), spark, indexDir)
      .distinct().persist()
    graft.tools.DriverPool.awaitAll(Seq(
      () => {
        sh.write.mode("overwrite").parquet(s"$indexDir/shingles.compact")
        sh.groupBy("doc_id").agg(count(lit(1)).as("n_ex"))
          .write.mode("overwrite").parquet(s"$indexDir/sizes.compact")
        sh.unpersist(blocking = false)
      },
      () => ndLive(spark.read.parquet(s"$indexDir/hashes"), spark, indexDir)
        .distinct()
        .write.mode("overwrite").parquet(s"$indexDir/hashes.compact")))
    swap("shingles"); swap("sizes"); swap("hashes")
    IndexFs.delete(spark, s"$indexDir/deletes")
    // the swaps replaced the three tables' files and cleared the
    // tombstones — drop any memoized frame reading them (scoped: the
    // frozen hot list is untouched, so batch-side shingle caps keyed
    // on it stay warm)
    Seq("shingles", "sizes", "hashes", "deletes").foreach(t =>
      graft.tools.InternalCaches.releaseByPath(spark, s"$indexDir/$t"))
  }

  /** x104 screen half — [[incrementalScreen]] semantics (same output
    * contract, same verdict rules) reading ONLY the stored artifacts:
    * no history re-scan, no history re-shingling, no whole-index size
    * aggregate (sizes are stored). Per-batch cost is the incoming scan
    * + the index probe; the probe join's batch side is batch-sized, so
    * AQE broadcasts it and the index scan never shuffles — the same
    * asymmetry as the x85 screen, with the x65 Bloom carrier the
    * documented pre-gate if even that scan needs trimming.
    */
  def screenAgainstNearDupIndex(incoming: DataFrame, indexDir: String,
      n: Int = 3, minJaccard: Double = 0.8): DataFrame = {
    val spark = incoming.sparkSession
    // a reader after a mid-swap compactor crash self-heals (one rename)
    // instead of failing on the missing live table
    recoverNearDupSwap(spark, indexDir)
    requireNearDupFormat(spark, indexDir)
    // tombstones out first, then project to the distinct-h probe set:
    // the projection both defends the exact gate against duplicate
    // hash rows from appends (a duplicate would duplicate incoming
    // rows through the left join) and keeps a hash alive while ANY
    // live document carries it — deleting one of two identical docs
    // must not un-gate the other
    val exHash = ndLive(spark.read.parquet(s"$indexDir/hashes"), spark, indexDir)
      .select(col("h")).distinct()
      .withColumn("ex", lit(true))
    val exactFlag = incoming.select(col("doc_id"), md5(col("text")).as("h"))
      .join(exHash, Seq("h"), "left")
      .select(col("doc_id"), coalesce(col("ex"), lit(false)).as("is_exact_dup"))
    val hot = spark.read.parquet(s"$indexDir/hot")
    val inSh = graft.tools.InternalCaches.persist(
      hashedShingleSet(incoming, n).join(broadcast(hot), Seq("sh"), "left_anti"))
    val exSh = ndLive(spark.read.parquet(s"$indexDir/shingles"), spark, indexDir)
    val exSizes = ndLive(spark.read.parquet(s"$indexDir/sizes"), spark, indexDir)
      .withColumnRenamed("doc_id", "ex_doc")
    screenVerdict(exactFlag, inSh, exSh, exSizes, minJaccard)
  }

  /** Cross-source overlap matrix — the provenance audit that tells a
    * curation pipeline which dataset pairs share content before mixing
    * them: per source pair, the Jaccard of their distinct shingle-hash
    * sets. Exact on purpose (the numbers drive de-weighting decisions);
    * at corpus scale each source's set is replaced by a bottom-k KMV
    * sketch — [[sourceOverlapSketch]] is that form, with cost
    * independent of shared vocabulary.
    *
    * Scale shape: one distinct (source, shingle) aggregate, then a
    * shingle-keyed self-join whose output is Σ_sh C(sources(sh), 2) —
    * bounded by (#sources choose 2) per shingle, NOT by corpus size;
    * with sources ≪ corpus this is the cheap direction of the join.
    * Output: (source_a, source_b, n_a, n_b, n_shared, jaccard) for
    * pairs sharing at least one shingle.
    */
  def sourceOverlap(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = docs.select(col("source"), tokens(col("text")).as("t"))
      .select(col("source"), explode(shingleStructs(col("t"), n)).as("s"))
      .select(col("source"), hash32(shingleText(col("s"), n)).as("sh"))
      .distinct()
    val cached = graft.tools.InternalCaches.persist(sh)
    val sizes = cached.groupBy("source").agg(count(lit(1)).as("n_sh"))
    val shared = cached.as("a")
      .join(cached.withColumnRenamed("source", "source_b").as("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("source_b"))
      .groupBy(col("a.source").as("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.withColumnRenamed("source", "source_a")
        .withColumnRenamed("n_sh", "n_a"), "source_a")
      .join(sizes.withColumnRenamed("source", "source_b")
        .withColumnRenamed("n_sh", "n_b"), "source_b")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 6).as("jaccard"))
  }

  /** Sketch-based cross-source overlap — the corpus-scale form of
    * [[sourceOverlap]], implementing the KMV seam its Scaladoc names.
    * Each source's distinct-shingle set is replaced by its bottom-k
    * sketch (the k smallest [[graft.functions.Portable.hash60]] values,
    * same estimator as [[graft.ext.Sketches]]); for a pair (A,B) the
    * merged bottom-k of S_A ∪ S_B is a uniform hash-order sample of
    * A ∪ B, so the fraction of merged-sketch members present in BOTH
    * per-source sketches estimates J(A,B) (Bar-Yossef et al. 2002; the
    * θ-sketch intersection rule). When |A ∪ B| ≤ k the sketch IS the
    * set and the estimate is exact — the crafted-fixture spec relies on
    * this degeneracy.
    *
    * Scale shape: the corpus is touched ONCE (the same distinct
    * (source, shingle-hash) aggregate as the exact audit, with the
    * bottom-k riding the heap partials so ≤ k rows per source per
    * partition cross the exchange); everything downstream runs on
    * #sources·k rows — the pair expansion is a broadcast of the tiny
    * distinct-source list and the output is (#sources choose 2) rows.
    * Unlike the exact audit there is NO shingle-keyed self-join, so
    * cost is INDEPENDENT of how much vocabulary the sources share —
    * the dimension along which exact x45 grows.
    * Output: (source_a, source_b, kmv_k, n_merged, n_both,
    * jaccard_est) for every source pair (shared or not).
    */
  def sourceOverlapSketch(docs: DataFrame, n: Int = 3, k: Int = 256): DataFrame = {
    import graft.plans.TopKPerGroup
    require(k >= 2, "KMV needs k >= 2")
    val sh = docs.select(col("source"), tokens(col("text")).as("t"))
      .select(col("source"), explode(shingleStructs(col("t"), n)).as("s"))
      .select(col("source"), hash60(shingleText(col("s"), n)).as("h"))
      .distinct()
    val sk = TopKPerGroup.topK(sh, Seq("source"), Seq("h" -> TopKPerGroup.Asc), k)
    // unordered pair expansion: each sketch row meets every OTHER
    // source once; (least, greatest) folds (a,b) and (b,a) into one
    // pair key, so each pair sees the union of both sketches
    val srcs = sk.select(col("source").as("other")).distinct()
    val merged = sk.join(broadcast(srcs), col("source") =!= col("other"))
      .select(
        least(col("source"), col("other")).as("source_a"),
        greatest(col("source"), col("other")).as("source_b"),
        col("h"), col("source"))
      // integer flags, not boolean max: both engines agree on int
      // aggregation semantics everywhere
      .groupBy(col("source_a"), col("source_b"), col("h"))
      .agg(max(when(col("source") === col("source_a"), 1).otherwise(0)).as("in_a"),
        max(when(col("source") === col("source_b"), 1).otherwise(0)).as("in_b"))
    val mk = TopKPerGroup.topK(merged, Seq("source_a", "source_b"),
      Seq("h" -> TopKPerGroup.Asc), k)
    mk.groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_merged"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L)).as("n_both"))
      .select(col("source_a"), col("source_b"), lit(k.toLong).as("kmv_k"),
        col("n_merged"), col("n_both"),
        round(col("n_both").cast("double") / col("n_merged"), 6).as("jaccard_est"))
  }

  /** Pre-mix overlap gate over [[sourceOverlapSketch]]: for every
    * source pair whose estimated Jaccard reaches `maxJaccard`, the
    * lexicographically GREATER member is dropped before mixing — the
    * audit consumed as an operator, not a report. The rule is
    * deterministic and order-free (the smaller name acts as the pair's
    * canonical representative, mirroring the min-id convention of
    * [[resolveClusters]]); a source flagged in any pair as the greater
    * member is dropped exactly once regardless of how many pairs flag
    * it. On overlap CHAINS (a~b, b~c, a̸~c) the pair rule is
    * deliberately conservative: c is dropped for overlapping b even
    * though b itself is dropped — every flagged pair loses a member
    * unconditionally, so no two retained sources can overlap, at the
    * cost of sometimes dropping more than a sequential
    * keep-the-smallest-per-component walk would (that walk is
    * order-dependent and needs the component structure; the pair rule
    * needs only the flagged list).
    *
    * Scale shape: the sketch audit touches the corpus once; the flagged
    * list is ≤ #sources rows, so the gate itself is a broadcast
    * anti-join — no second corpus pass, no shuffle.
    * Output: the input documents minus excluded sources.
    */
  def overlapGatedSources(docs: DataFrame, n: Int = 3, k: Int = 256,
      maxJaccard: Double = 0.06): DataFrame = {
    // persist the flagged list (≤ #sources rows): the gated frame feeds
    // several consumers downstream (language ID, quality, the sample),
    // and without it each consumer would re-run the whole sketch audit
    // behind the anti-join
    val flagged = graft.tools.InternalCaches.persist(
      sourceOverlapSketch(docs, n, k)
        .filter(col("jaccard_est") >= maxJaccard)
        .select(col("source_b").as("source")).distinct())
    docs.join(broadcast(flagged), Seq("source"), "left_anti")
  }

  /** Full-corpus cluster resolution: every document gets its component's
    * min doc_id as `cluster_id` (its own id when it has no near-dup),
    * the component size, and `keep` = is-the-representative. Downstream
    * dedup is then `filter(keep)` — the canonical "drop near-duplicate
    * training documents, keep one canonical copy" operation.
    * Output: (doc_id, cluster_id, cluster_size, keep).
    */
  def resolveClusters(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
    val full = docs.select(col("doc_id")).join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val sizes = full.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    full.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("keep"))
  }

  /** x82 — quality-aware cluster representative selection: instead of
    * [[resolveClusters]]' lowest-id convention, keep the HIGHEST-MERIT
    * member of each near-dup cluster (ties to the lowest doc_id) — the
    * SlimPajama-style refinement where the canonical copy should be
    * the best-written one, not the first-crawled one. `resolved` is
    * [[resolveClusters]]' output (or the memoized x19 frame);
    * `scored` carries (doc_id, merit) — x74's integer merit by
    * default, any deterministic integer score works.
    *
    * Scale shape: one doc_id join (scored onto the cluster frame), one
    * map-side-combinable `groupBy(cluster_id).agg(min(struct(-merit,
    * doc_id)))` — the argmax as an associative aggregate, NO per-cluster
    * window sort (a giant cluster pre-reduces per mapper) — and one
    * join back. Output: (doc_id, cluster_id, cluster_size, merit,
    * keep); downstream dedup is `filter(keep)`, exactly as with x19.
    *
    * `scored` is joined LEFT: a cluster member with no merit row (e.g.
    * a NULL-text document [[graft.ext.Sampling.meritTokens]] excludes)
    * keeps its row with `merit` null and can never be the
    * representative while any scored member exists — its sort key is
    * Long.MaxValue (NOT the negation of a sentinel merit: `-Long
    * .MinValue` wraps back to Long.MinValue under non-ANSI arithmetic
    * and would make unscored members WIN). A cluster with no scored
    * member at all falls back to the x19 convention: lowest doc_id.
    */
  def resolveClustersByMerit(resolved: DataFrame, scored: DataFrame): DataFrame = {
    val j = resolved.select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .join(scored.select(col("doc_id"), col("merit")), Seq("doc_id"), "left")
    val nm = when(col("merit").isNull, lit(Long.MaxValue)).otherwise(-col("merit"))
    val best = j.groupBy("cluster_id")
      .agg(min(struct(nm.as("nm"), col("doc_id").as("id"))).as("b"))
      .select(col("cluster_id"), col("b.id").as("keep_id"))
    j.join(best, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("merit"), (col("doc_id") === col("keep_id")).as("keep"))
  }

  /** Leakage-safe train/eval split: assign documents to splits at the
    * NEAR-DUP-CLUSTER grain, not the document grain. A document-grain
    * random split leaks — a near-duplicate of an eval document lands in
    * train with probability trainPct, and memorizing it inflates eval
    * scores (the train/test overlap failure Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499 §6.2
    * measures). Quotienting by the near-dup equivalence first makes
    * straddling impossible BY CONSTRUCTION: the split is a pure
    * function of `cluster_id` (deterministic [[Portable.hash32]], same
    * rule as [[Sampling.stratifiedByHash]]), so every member of a
    * cluster — including singletons, whose cluster is themselves —
    * lands on the same side, on every run, on every engine.
    *
    * Scale shape: [[resolveClusters]] (the component computation x19
    * already pays) plus one narrow projection — the split itself adds
    * ZERO shuffles; membership never consults other rows.
    * Output: (doc_id, cluster_id, split ∈ {train, eval}).
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
      trainPct: Int): DataFrame =
    splitByCluster(resolveClusters(docs, pairs), trainPct)

  /** The split projection of [[leakageSafeSplit]] over an already
    * materialized [[resolveClusters]] frame — callers that share the
    * component computation across queries (the x19/x75 memo) apply the
    * split without re-running the iterative loop.
    */
  def splitByCluster(resolved: DataFrame, trainPct: Int): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, s"trainPct out of range: $trainPct")
    resolved.select(col("doc_id"), col("cluster_id"),
      when(pmod(hash32(col("cluster_id").cast("string")), lit(100)) < trainPct,
        lit("train")).otherwise(lit("eval")).as("split"))
  }

  /** x79 — substring-level duplicate spans: the token ranges of each
    * document covered by a `k`-token gram that occurs at least
    * `minCount` times ANYWHERE in the corpus (other documents or a
    * repeat within the same one). Document-grain dedup (exact / MinHash
    * / SemDeDup) misses this failure mode entirely: a boilerplate
    * header, license block, or navigation chrome pasted into millions
    * of otherwise-distinct pages never makes the *documents* similar,
    * yet is exactly the repeated text a training corpus wants cut
    * (Lee et al. 2021, arXiv:2107.06499 §4.1 — their ExactSubstr
    * dedup at 50-token grain; `k` is that knob, defaulted small so the
    * fixture corpus exercises the merge logic).
    *
    * Method: positional k-gram stream → global occurrence count on the
    * 60-bit gram hash → keep positions whose gram count ≥ minCount →
    * merge overlapping/adjacent hits per document (classic
    * gaps-and-islands: a hit at `pos` extends the current span when
    * `pos − prev ≤ k`, else opens a new one). Output one row per
    * merged span: (doc_id, span_start, span_end, span_tokens,
    * n_grams), end exclusive, token-indexed.
    *
    * Scale shape (100 TB): four stages, all linear —
    *   1. gram stream is map-side (posexplode over the zipped-slice
    *      [[graft.functions.Portable.shingleStructs]] — no lambda
    *      interpretation, no exchange); the stream is persisted via
    *      [[graft.tools.InternalCaches]] because stage 3 re-reads it
    *      (without the persist the corpus re-tokenizes twice);
    *   2. the occurrence count is one hash exchange on the 8-byte gram
    *      hash with map-side partial combine — a super-common gram
    *      (the skew hazard) is pre-summed per mapper, so no reducer
    *      receives O(occurrences) rows;
    *   3. hit selection joins the stream back on the hash; the hot set
    *      is usually corpus-fraction-small, so AQE converts the join
    *      to broadcast at runtime when it fits;
    *   4. span merge is ONE exchange by doc_id with ONE sort serving
    *      both window functions (lag + running sum share the spec) and
    *      the final aggregate reuses the same partitioning (the x14
    *      plan discipline) — per-doc positions are bounded by document
    *      length, never by corpus size.
    */
  def duplicateSpans(docs: DataFrame, k: Int = 8, minCount: Long = 2): DataFrame = {
    val grams = graft.tools.InternalCaches.persist(gramStream(docs, k))
    val hot = grams.groupBy("g").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount).select("g")
    val hits = grams.join(hot, "g").select("doc_id", "pos")
    mergeSpans(hits, k)
  }

  /** The gaps-and-islands span merge shared by x79 and x85: hit
    * positions → merged (doc_id, span_start, span_end, span_tokens,
    * n_grams) rows. ONE doc_id exchange; the single sort serves both
    * window functions and the aggregate reuses the partitioning (the
    * x14 discipline, spec-gated).
    */
  private[graft] def mergeSpans(hits: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    hits
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= k, lit(0L)).otherwise(lit(1L)))
      .withColumn("island",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min("pos").as("span_start"), (max(col("pos")) + k).as("span_end"),
        (max(col("pos")) + k - min(col("pos"))).as("span_tokens"),
        count(lit(1)).as("n_grams"))
      .select("doc_id", "span_start", "span_end", "span_tokens", "n_grams")
  }

  /** The positional k-gram stream shared by the substring family:
    * (doc_id, pos, g) — map-side only (zipped-slice structs +
    * posexplode, 60-bit hash), no exchange.
    */
  private def gramStream(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), posexplode(shingleStructs(tokens(col("text")), k)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        hash60(shingleText(col("col"), k)).as("g"))

  /** x85 index half — persist the corpus's DISTINCT gram-hash set as a
    * parquet table: the substring-grain analog of x40's stored shingle
    * index, precomputed at ingest so the nightly screen never re-reads
    * history. [[appendGramIndex]] adds a batch's grams as additional
    * files (duplicates across files are harmless to correctness — the
    * screen's semi join is set-semantics — but grow the scan with
    * append count), cost = one batch scan + batch-sized distinct,
    * independent of index size. This flat form is the labeled baseline
    * beside the bucketed family below ([[writeGramIndexBucketed]] /
    * [[duplicateSpansAgainstIndexBloom]] / [[compactGramIndex]]),
    * which Bloom-gates the batch and partition-prunes the index scan.
    */
  def writeGramIndex(docs: DataFrame, indexDir: String, k: Int = 8): Unit =
    gramStream(docs, k).select("g").distinct()
      .write.mode("overwrite").parquet(indexDir)

  def appendGramIndex(newDocs: DataFrame, indexDir: String, k: Int = 8): Unit =
    gramStream(newDocs, k).select("g").distinct()
      .write.mode("append").parquet(indexDir)

  /** x85 screen half — duplicate spans of an INCOMING batch against the
    * stored corpus gram index: the token ranges of each batch document
    * covered by a k-gram the indexed corpus already contains
    * ([[duplicateSpans]] output contract; within-batch repeats are
    * x79's job on the batch itself). This is the daily-ingest shape:
    * the index is read, never rebuilt, so screen cost is
    * O(batch + index-scan) with no history re-shingling — and the
    * index scan is the dominant term a Bloom pre-gate (the x65
    * carrier) would remove when batches are small.
    *
    * Join strategy: the batch gram set joins the index as a LEFT SEMI
    * on the 8-byte hash — AQE broadcasts the smaller side at runtime;
    * at a 100 TB index with a small nightly batch the right call is
    * broadcasting the BATCH's distinct grams into one index scan,
    * which is what AQE picks when the batch fits.
    */
  def duplicateSpansAgainstIndex(
      batch: DataFrame, indexDir: String, k: Int = 8): DataFrame = {
    val idx = batch.sparkSession.read.parquet(indexDir)
    val hits = gramStream(batch, k)
      .join(idx, Seq("g"), "left_semi").select("doc_id", "pos")
    mergeSpans(hits, k)
  }

  // ---- x95: bucket-partitioned gram index + Bloom sidecar -----------
  //
  // The flat index above has two growth terms HEADROOM measured
  // (0.34 s → 8.2 s across two decades): the screen's semi join scans
  // the WHOLE index every night, and `appendGramIndex` accumulates
  // cross-batch duplicate gram files, so the scan grows with append
  // count on top of corpus size. This family removes both: the index
  // is partitioned by a gram-hash bucket (the x90 `partitionBy` +
  // literal-partition-filter pattern at the substring grain), a Bloom
  // filter over the full gram set rides beside it as a sidecar
  // artifact (built at ingest, MERGED on append — Bloom union is
  // bitwise OR), and the screen (a) pre-gates the batch's grams
  // through the carrier map-side, then (b) reads ONLY the buckets the
  // surviving candidates hash into. Screen cost is O(batch + touched
  // buckets), decoupled from index size for small nightly batches;
  // output stays EXACT — Bloom false positives die in the confirm
  // semi join against the pruned buckets (false negatives don't
  // exist), so the oracle is x85's SQL verbatim.

  /** The gram index's sidecar state: the bucket count (partitioning
    * scheme), the Bloom sizing (mergeInPlace requires identical
    * numBits/numHashFunctions, both derived from (items, numBits)),
    * the deserialized filter, and a per-write `stamp` — unique per
    * sidecar write (driver nanotime; uniqueness is all that matters,
    * nothing downstream reads it as a time) — that lets a cached copy
    * cheaply prove it still matches the stored file.
    */
  private[graft] final case class GramSidecar(
      buckets: Int, items: Long, numBits: Long, stamp: Long, bf: BloomFilter)

  /** Sidecar layout: `<indexDir>/_gram_bloom` — underscore-prefixed,
    * so parquet readers of the index ignore it. Fixed-width header
    * (buckets, items, numBits, stamp) then the serialized filter, so
    * [[readSidecarStamp]] can validate without deserializing the blob.
    */
  private def bloomSidecarPath(indexDir: String) =
    new org.apache.hadoop.fs.Path(indexDir, "_gram_bloom")

  private def writeBloomSidecar(spark: SparkSession, indexDir: String,
      sc: GramSidecar): Unit = {
    val p = bloomSidecarPath(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.DataOutputStream(fs.create(p, true))
    try {
      out.writeInt(sc.buckets); out.writeLong(sc.items)
      out.writeLong(sc.numBits); out.writeLong(sc.stamp)
      sc.bf.writeTo(out)
    } finally out.close()
  }

  private[graft] def readBloomSidecar(
      spark: SparkSession, indexDir: String): GramSidecar = {
    val p = bloomSidecarPath(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new java.io.DataInputStream(fs.open(p))
    try GramSidecar(in.readInt(), in.readLong(), in.readLong(), in.readLong(),
      BloomFilter.readFrom(in))
    finally in.close()
  }

  /** The stored sidecar's write stamp alone: one open + 28-byte header
    * read, never the (potentially multi-GB) filter blob. This is the
    * cached sidecar's per-call validity probe.
    */
  private def readSidecarStamp(spark: SparkSession, indexDir: String): Long = {
    val p = bloomSidecarPath(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new java.io.DataInputStream(fs.open(p))
    try { in.skipBytes(4 + 8 + 8); in.readLong() }
    finally in.close()
  }

  /** Driver-side cache of deserialized sidecar state, keyed
    * (applicationId, indexDir) — the round-12 streaming path re-read
    * and re-deserialized the full Bloom on EVERY screen and EVERY
    * append (an index-sized fixed cost per micro-batch). An append
    * through this session mutates the cached filter in place and
    * re-stamps the entry, so the cache IS the authoritative
    * post-append state.
    *
    * Validity is CHECKED per use, not assumed (round-14 advisory: the
    * re-bucketing compaction made a stale cached bucket count a
    * cross-process correctness hazard — appended grams routed to wrong
    * bucket directories, screens probing wrong buckets): every cached
    * read compares the entry's stamp against the stored header
    * ([[readSidecarStamp]] — 28 bytes, one RPC, amortized against the
    * Spark job every screen/append runs) and re-reads on mismatch, so
    * a foreign process's compact/re-bucket/append is picked up at the
    * next touch. What the stamp does NOT license is CONCURRENT
    * writers: two appends racing the same index can still interleave
    * their sidecar/data writes (the sidecar-first crash ordering
    * assumes one writer at a time) — the single-writer contract is per
    * WRITE, the stamp closes the staleness between writes.
    */
  private val sidecarCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), GramSidecar]

  private def cachedSidecar(spark: SparkSession, indexDir: String,
      cache: Boolean): GramSidecar =
    if (!cache) readBloomSidecar(spark, indexDir)
    else {
      val key = (spark.sparkContext.applicationId, indexDir)
      val stored = readSidecarStamp(spark, indexDir)
      sidecarCache.get(key) match {
        case Some(sc) if sc.stamp == stored => sc
        case _ =>
          val sc = readBloomSidecar(spark, indexDir)
          sidecarCache.put(key, sc)
          sc
      }
    }

  /** Drop the cached sidecar state for `indexDir` (all sessions of this
    * JVM). The per-use stamp check already detects foreign writes; this
    * remains as the explicit handle (and is called internally by every
    * operation that replaces the sidecar wholesale).
    */
  def invalidateSidecarCache(indexDir: String): Unit =
    sidecarCache.keys.filter(_._2 == indexDir).foreach(sidecarCache.remove)

  /** Count data files under `dir` (recursive, `_`/`.`-prefixed metadata
    * excluded) — the compaction trigger's observable. One FS listing,
    * the same order of work the parquet write just paid to commit.
    */
  private[graft] def countDataFiles(spark: SparkSession, dir: String): Long = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) n += 1
      }
      n
    }
  }

  /** Target distinct grams per bucket for [[autoBucketCount]],
    * calibrated by measurement, not convention (HEADROOM "x103
    * amortized"): at the sf0.1 gate corpus (224,694 distinct 8-grams)
    * the 256-bucket default cost 3.5× the right-sized 32 — each append
    * commits one file per non-empty bucket, so oversizing turns
    * directly into per-append file-commit overhead — and 224,694 / 32
    * ≈ 7k grams per bucket. 8192 reproduces that choice and scales it:
    * the bucket count decades with the corpus until the cap.
    */
  private[graft] val GramsPerBucketTarget = 8192L

  /** Derive the bucketed gram index's bucket count from its measured
    * cardinality: the next power of two of items / [[GramsPerBucketTarget]],
    * clamped to [8, 4096]. Power of two only for stable decade steps;
    * pmod needs no alignment. The 4096 cap is the production posture:
    * past it, buckets grow in SIZE (still a few file-scan tasks each —
    * at 10¹² grams ≈ 2 GB/bucket) rather than in count, because
    * per-append cost is one file commit per touched bucket and a
    * micro-batch's grams touch nearly every bucket once counts exceed
    * the batch's gram count.
    */
  private[graft] def autoBucketCount(items: Long): Int = {
    val raw = math.max(1L, (items + GramsPerBucketTarget - 1) / GramsPerBucketTarget)
    val pow2 = java.lang.Long.highestOneBit(raw) match {
      case h if h == raw => raw
      case h => h << 1
    }
    math.min(4096L, math.max(8L, pow2)).toInt
  }

  /** Build the bucket-partitioned gram index + Bloom sidecar at corpus
    * ingest. `expectedItems` sizes the Bloom (default: the measured
    * distinct-gram count — one aggregate over the frame the write
    * materializes anyway); appends past the sizing only raise fpp
    * (weaker pruning, still-exact output) until [[compactGramIndex]]
    * re-sizes. `buckets` fixes the partitioning scheme until the next
    * [[compactGramIndex]] re-derives it (recorded in the sidecar, which
    * every screen/append reads); the default 0 derives it from the
    * measured cardinality ([[autoBucketCount]] — the round-13 finding
    * that a mis-sized count is a 3.5× per-append foot-gun, now
    * impossible by default), and an explicit positive value overrides
    * for callers who know their append cadence.
    */
  def writeGramIndexBucketed(docs: DataFrame, indexDir: String, k: Int = 8,
      buckets: Int = 0, expectedItems: Option[Long] = None,
      fpp: Double = 0.01): Unit = {
    require(buckets >= 0, s"buckets must be positive (0 = auto), got $buckets")
    require(fpp > 0 && fpp < 1, s"fpp in (0,1), got $fpp")
    val spark = docs.sparkSession
    val g = graft.tools.InternalCaches.persist(
      gramStream(docs, k).select("g").distinct())
    val items = math.max(expectedItems.getOrElse(g.count()), 64L)
    val nBuckets = if (buckets > 0) buckets else autoBucketCount(items)
    val numBits = BloomFilter.optimalNumOfBits(items, fpp)
    // the Bloom build and the bucketed write both read the cached gram
    // set (materialized by the count above) and share nothing else —
    // overlap them (guide §2.6). The sidecar still writes strictly
    // AFTER the parquet write below: overwrite mode clears the
    // directory, so a sidecar written first would be deleted with it.
    @volatile var bfSlot: BloomFilter = null
    graft.tools.DriverPool.awaitAll(Seq(
      () => { bfSlot = buildBloomOfLongs(g, "g", items, numBits) },
      () => g.withColumn("bucket", pmod(col("g"), lit(nBuckets.toLong)).cast("int"))
        // ONE file per bucket per write: without the bucket repartition
        // every writer task opens every bucket directory (tasks x
        // buckets tiny files — measured 10x screen-cost overhead from
        // file listing alone at the probe scales)
        .transform(IndexFs.keyPartitioned(_, col("bucket"), nBuckets.toLong))
        .write.partitionBy("bucket").mode("overwrite").parquet(indexDir)))
    val bf = bfSlot
    val sc = GramSidecar(nBuckets, items, numBits, System.nanoTime(), bf)
    writeBloomSidecar(spark, indexDir, sc)
    // seed the driver cache with the state just written: the first
    // screen/append after a build pays no sidecar re-read
    sidecarCache.put((spark.sparkContext.applicationId, indexDir), sc)
  }

  /** Append a batch's grams into the bucketed index: new files inside
    * the bucket directories (duplicates across files are harmless to
    * the screen's set semantics, and [[compactGramIndex]] reaps them)
    * plus a Bloom update in the sidecar. Cost = one batch scan +
    * batch-sized distinct — independent of index size.
    *
    * Bloom update, size-switched (round 13 — the round-12 form built a
    * fresh INDEX-sized filter per append across EVERY shuffle
    * partition, a fixed cost that dominated micro-batch cadence):
    *   - ordinary filters (≤ 64 MB of bits): ONE single-partition
    *     executor aggregate builds one batch-populated filter and
    *     ships one array to merge — measured the cheap direction at
    *     fixture scale (a driver-side `toLocalIterator` stream was
    *     tried first and lost ~8 s/batch to its per-partition
    *     sequential jobs);
    *   - oversized filters (> 64 MB — the multi-GB production blobs
    *     the broadcast gate carrier exists for): shipping the array
    *     per append is the wrong direction, so the batch's distinct
    *     gram hashes stream to the driver (8 bytes each, batch-sized,
    *     never index-sized) and insert into the cached filter, which
    *     the driver already owns.
    *
    * After the write, `maxFilesPerBucket` (0 disables) bounds append
    * accumulation: when the index's data-file count exceeds
    * `maxFilesPerBucket × buckets` (each append adds one file per
    * touched bucket), [[compactGramIndex]] runs inline — the VACUUM
    * the round-12 verdict said nothing scheduled. Screen output is
    * invariant across the trigger (compaction is a distinct-rewrite;
    * spec-gated), so callers observe only bounded file counts.
    *
    * `corpusForDrain` (round 17) turns that same trigger into the
    * pending-takedown DRAIN slot: when requests pend
    * ([[requestGramTakedown]]) and the caller hands back the full live
    * corpus as of this batch, the trigger runs the filtered rebuild
    * ([[takedownGramIndex]] — which IS a compaction plus the removal)
    * instead of the plain compact, so a streaming deployment's removal
    * lag is bounded by the compaction cadence with zero extra
    * scheduling. `None` (the default) keeps today's behavior: the
    * compaction CARRIES the ledger and an explicit
    * [[drainGramTakedowns]] applies it.
    */
  def appendGramIndexBucketed(
      newDocs: DataFrame, indexDir: String, k: Int = 8,
      cacheSidecar: Boolean = true, maxFilesPerBucket: Int = 64,
      corpusForDrain: Option[DataFrame] = None): Unit = {
    val spark = newDocs.sparkSession
    // heal a crashed compaction swap BEFORE appending (an append into a
    // missing live dir would fork the index away from the .compact copy)
    IndexFs.recoverSwap(spark, indexDir)
    val sc0 = cachedSidecar(spark, indexDir, cacheSidecar)
    val (buckets, items, numBits, bf) = (sc0.buckets, sc0.items, sc0.numBits, sc0.bf)
    // tombstones-win until the drain: a doc_id with a pending takedown
    // request ([[requestGramTakedown]]) is suppressed from the batch —
    // its UNIQUE grams never enter the index, so the eventual drain has
    // nothing extra to remove (grams it shares with live docs still
    // arrive through them; set semantics). Re-admission is
    // append-after-drain, the same contract as every tombstoned grain.
    val pend0 = pendingDeletesPath(indexDir)
    val liveDocs =
      if (IndexFs.exists(spark, pend0))
        newDocs.join(broadcast(spark.read.parquet(pend0).distinct()),
          Seq("doc_id"), "left_anti")
      else newDocs
    val g = graft.tools.InternalCaches.persist(
      gramStream(liveDocs, k).select("g").distinct())
    if (cacheSidecar && numBits / 8 > (64L << 20)) {
      val it = g.select(col("g"))
        .as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .toLocalIterator()
      while (it.hasNext) bf.putLong(it.next())
    } else {
      // identical sizing → numHashFunctions match → mergeInPlace is
      // legal; coalesce(1) so exactly one index-sized array allocates
      val batchBf = buildBloomOfLongs(g.coalesce(1), "g", items, numBits)
      bf.mergeInPlace(batchBf)
    }
    // sidecar FIRST: a crash between the two writes must leave the
    // Bloom an OVER-approximation of the stored grams (extra bits die
    // in the exact confirm join). The reverse order would leave
    // appended grams missing from the Bloom — the gate would silently
    // drop their true matches, an exactness break, not a slowdown.
    val sc1 = sc0.copy(stamp = System.nanoTime())
    writeBloomSidecar(spark, indexDir, sc1)
    // re-stamp the cached entry to match the file just written (same
    // mutated filter object — only the validity probe moves)
    if (cacheSidecar)
      sidecarCache.put((spark.sparkContext.applicationId, indexDir), sc1)
    g.withColumn("bucket", pmod(col("g"), lit(buckets.toLong)).cast("int"))
      // ONE file per bucket per write: without the bucket repartition
      // every writer task opens every bucket directory (tasks x
      // buckets tiny files — measured 10x screen-cost overhead from
      // file listing alone at the probe scales)
      .transform(IndexFs.keyPartitioned(_, col("bucket"), buckets.toLong))
      .write.partitionBy("bucket").mode("append").parquet(indexDir)
    if (maxFilesPerBucket > 0 &&
        countDataFiles(spark, indexDir) > maxFilesPerBucket.toLong * buckets) {
      // the maintenance slot the file-count trigger already schedules:
      // when takedown requests pend AND the caller wired the corpus
      // hand-back (`corpusForDrain` — the FULL live corpus as of this
      // batch, this batch included; the drain filters the ledger out
      // itself), drain them here — one filtered rebuild serves as both
      // the compaction (it IS a distinct rewrite) and the amortized
      // takedown, so a streaming deployment's removal lag is bounded by
      // the compaction cadence with no extra scheduling. Without the
      // hand-back (or with an empty ledger) the plain compaction runs
      // and CARRIES the ledger, as before.
      // gate on pending ROWS, not ledger-directory existence: a
      // zero-row request (or an emptied post-drain ledger dir) must not
      // route the trigger to the corpus-sized takedown rebuild when the
      // cheap index-only compaction suffices — one tiny count
      val wantDrain = corpusForDrain.isDefined &&
        !pendingGramTakedowns(spark, indexDir).isEmpty
      if (wantDrain) takedownGramIndex(corpusForDrain.get, indexDir, k)
      else compactGramIndex(spark, indexDir)
    }
  }

  /** Offline maintenance: rewrite every bucket to its distinct gram
    * set (drop the cross-batch duplicate rows appends accumulate) and
    * re-size the Bloom to the measured cardinality. Both read actions
    * (the compacted write and the Bloom rebuild) complete BEFORE any
    * directory mutation; the swap then keeps a complete copy on disk
    * at every step (tmp → old → live). The one step with no LIVE
    * directory (between the two renames) is detected and completed by
    * [[IndexFs.recoverSwap]], run first here and by every screen/append
    * entry — a crash at any point is healed by the next touch.
    *
    * `buckets` = 0 (default, round 14) RE-DERIVES the bucket count from
    * the measured cardinality ([[autoBucketCount]]) — the compaction
    * rewrites every bucket directory anyway, so re-bucketing is free
    * here, and it lifts the old scheme-fixed-for-lifetime restriction:
    * an index built small (the streaming bootstrap sizes to its first
    * batch) grows its bucket count at the compaction the append
    * trigger already schedules, instead of carrying an undersized
    * scheme through the decades. Screens and appends read the count
    * from the sidecar on every call, so the re-bucket is invisible to
    * them (spec-gated output-invariant). Pass an explicit count to pin
    * the scheme.
    */
  def compactGramIndex(spark: SparkSession, indexDir: String,
      fpp: Double = 0.01, buckets: Int = 0): Unit = {
    IndexFs.recoverSwap(spark, indexDir)
    // NOT the memoized registry: this frame reads the very directory
    // the swap below replaces — a registry entry keyed on its plan
    // would hand a later caller a cached plan over deleted files. A
    // local persist scoped to this call, released before return.
    val g = gramTable(spark, indexDir).select("g").distinct().persist()
    val items = math.max(g.count(), 64L)
    val nBuckets = if (buckets > 0) buckets else autoBucketCount(items)
    val numBits = BloomFilter.optimalNumOfBits(items, fpp)
    val tmp = indexDir + ".compact"
    // Bloom rebuild and compacted write share only the cached gram set
    // (materialized by the count above) — overlap them (guide §2.6);
    // the sidecar writes after both, before any directory mutation
    @volatile var bfSlot: BloomFilter = null
    graft.tools.DriverPool.awaitAll(Seq(
      () => { bfSlot = buildBloomOfLongs(g, "g", items, numBits) },
      () => g.withColumn("bucket", pmod(col("g"), lit(nBuckets.toLong)).cast("int"))
        // ONE file per bucket per write: without the bucket repartition
        // every writer task opens every bucket directory (tasks x
        // buckets tiny files — measured 10x screen-cost overhead from
        // file listing alone at the probe scales)
        .transform(IndexFs.keyPartitioned(_, col("bucket"), nBuckets.toLong))
        .write.partitionBy("bucket").mode("overwrite").parquet(tmp)))
    val bf = bfSlot
    val sc = GramSidecar(nBuckets, items, numBits, System.nanoTime(), bf)
    writeBloomSidecar(spark, tmp, sc)
    // CARRY the pending-takedown ledger across the swap: a compaction
    // is a distinct-rewrite, NOT a drain (it has no corpus to rebuild
    // from) — sweeping the ledger with the old directory would silently
    // forget takedown requests. COPY, not move: a crash between a move
    // and the swap would strand the only ledger copy in a tmp dir the
    // retry rewrites wholesale ([[IndexFs.copyDir]] has the full
    // argument); the live original is demoted WITH the old dir only
    // when the promoted copy is already in place. The snapshot of
    // carried names feeds the swap's RESCUE pass below: a request
    // landing AFTER this copy (the round-17 advisory's race — the
    // request verb is the one a streaming deployment runs concurrently
    // with maintenance) is re-carried out of the demoted dir instead
    // of being deleted with it.
    val carried = IndexFs.listNames(spark, pendingDeletesPath(indexDir)).toSet
    IndexFs.copyDir(spark, pendingDeletesPath(indexDir),
      pendingDeletesPath(tmp))
    afterLedgerSnapshotHook()
    // swap + rescue: every step leaves a complete index on disk
    // somewhere, and late ledger arrivals survive the .old delete
    IndexFs.swapCompactRescue(spark, indexDir, "_pending_deletes", carried)
    // the compacted frame replaced the files its cached plan reads —
    // drop the cache so later actions re-read the live directory
    g.unpersist(blocking = false)
    // re-sizing replaced the sidecar wholesale: re-seed the driver
    // cache with the compacted state (stale items/numBits would make
    // the next append's merge sizing wrong; a re-bucket with a stale
    // count would route every appended gram to the wrong directory —
    // and the fresh stamp is what lets OTHER processes' caches catch
    // this re-bucket at their next touch)
    sidecarCache.put((spark.sparkContext.applicationId, indexDir), sc)
  }

  /** Takedown at the substring grain — the right-to-be-forgotten verb
    * for the gram index, which by design DEGENERATES to the filtered
    * rebuild: grams store no document provenance (O(1) bytes per gram
    * is the index's whole point), so neither "which grams were doc
    * X's" nor "is this gram still carried by a live document" is
    * answerable from the stored artifacts. The caller hands back the
    * REMAINING corpus (the x117 hand-back contract), the index
    * rebuilds over it into `.compact`, and swaps in as one unit
    * through the tmp → old → live discipline — a bare
    * [[writeGramIndexBucketed]] overwrite of the live path would
    * leave a torn index on a crash mid-write, which a takedown verb
    * must not. Unlike the provenance-carrying grains
    * ([[deleteFromNearDupIndex]], semantic/IVF-PQ tombstones) there
    * is no O(|request|) merge-on-read path here — the delete costs a
    * build, the documented trade for the gram index's byte budget.
    * The x133 gate's `deleted` and `compacted` phases share one
    * oracle block: the rebuild IS durable removal, and a later
    * [[compactGramIndex]] is a distinct-rewrite of already-filtered
    * grams.
    */
  def takedownGramIndex(remaining: DataFrame, indexDir: String, k: Int = 8,
      buckets: Int = 0): Unit = {
    val spark = remaining.sparkSession
    IndexFs.recoverSwap(spark, indexDir)
    // any PENDING ledger requests ([[requestGramTakedown]]) are applied
    // by this rebuild too — the handed-back corpus is filtered against
    // them, and the swap sweeps the ledger away with the old directory
    // (applied and cleared in the same atomic step; a crash before the
    // swap leaves the ledger in the live dir for the retry). The
    // applied set is pinned BY FILE NAME: the rebuild reads exactly the
    // files listed here, so a request landing during the build window
    // is definitionally un-applied and the swap's rescue pass re-carries
    // it into the fresh index's ledger instead of deleting it with
    // `.old` (the round-17 advisory's lost-request race).
    val pend = pendingDeletesPath(indexDir)
    val appliedNames = IndexFs.listNames(spark, pend).toSet
    val appliedData = appliedNames.toSeq.sorted
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .map(n => s"$pend/$n")
    afterLedgerSnapshotHook()
    val rem =
      if (appliedData.nonEmpty)
        remaining.join(broadcast(
          spark.read.parquet(appliedData: _*).distinct()),
          Seq("doc_id"), "left_anti")
      else remaining
    val tmp = indexDir + ".compact"
    IndexFs.delete(spark, tmp)
    writeGramIndexBucketed(rem, tmp, k, buckets)
    IndexFs.swapCompactRescue(spark, indexDir, "_pending_deletes",
      appliedNames)
    // the build seeded the sidecar cache under the TMP path — drop it —
    // and the live path's cached entry now describes the replaced
    // index (the per-call stamp probe would also catch that one, but
    // an explicit release is free); memoized screens reading the old
    // directory are the rebuild staleness class.
    invalidateSidecarCache(tmp)
    invalidateSidecarCache(indexDir)
    graft.tools.InternalCaches.releaseByPath(spark, indexDir)
  }

  private def pendingDeletesPath(indexDir: String) =
    s"$indexDir/_pending_deletes"

  /** TEST SEAM, production never sets it: invoked between a maintenance
    * verb's ledger snapshot and its swap, so GramLedgerSpec can land a
    * [[requestGramTakedown]] deterministically INSIDE the window the
    * swap's rescue pass exists to close — the race is staged, not
    * simulated with sleeps. A var (not a parameter) keeps the public
    * verb signatures honest.
    */
  private[graft] var afterLedgerSnapshotHook: () => Unit = () => ()

  /** Schema-pinned read of the bucketed gram table. A takedown/drain of
    * the ENTIRE remaining corpus is a legal request and leaves an index
    * directory with no data files — schema inference over it throws
    * UNABLE_TO_INFER_SCHEMA, so every later screen would CRASH instead
    * of reporting zero matches (found live by the round-17 streaming
    * ledger spec). The schema is fixed by the writer (`g` + the
    * `bucket` partition column), so pin it: an empty index reads as
    * zero rows and the screens above it stay total functions.
    */
  private def gramTable(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.schema("g LONG, bucket INT").parquet(indexDir)

  /** x142 — ENQUEUE a substring-grain takedown instead of paying the
    * index-sized rebuild per request. The gram index's takedown
    * degenerates to a filtered rebuild by design ([[takedownGramIndex]]
    * — no provenance at O(1) bytes/gram), so a STREAM of requests at
    * 100 TB would cost an index-sized build each; this ledger amortizes
    * them to the maintenance cadence the round-16 verdict prescribed.
    * Requested doc_ids land in `_pending_deletes` beside the sidecar
    * (underscore-prefixed: invisible to every parquet read of the
    * index; tiny — one file per request batch, set semantics make
    * replays harmless), and ONE filtered rebuild applies the whole
    * accumulated set ([[drainGramTakedowns]], or any
    * [[takedownGramIndex]] call, whose swap clears the ledger
    * atomically with applying it).
    *
    * DOCUMENTED CONTRACT — removal is effective at the DRAIN, not at
    * the request: the stored grams cannot be filtered at read time
    * (no provenance), so a span screen between request and drain still
    * matches the requested documents' grams (the x142 gate hash-pins
    * exactly that, phase `requested`). Deployments drain on the
    * compaction cadence; where the right-to-be-forgotten clock starts
    * at the request, schedule the drain inside the compliance window.
    * Between request and drain, appends suppress the requested doc_ids
    * from their batches (tombstones-win, as every other grain);
    * re-admission is append-after-drain. Single-writer maintenance,
    * like every rebuild-class verb.
    *
    * Crash safety: the ledger is parquet-append + set semantics
    * (replay-safe); [[compactGramIndex]] CARRIES it across its swap
    * (compaction is a distinct-rewrite, not a drain — it has no corpus
    * to rebuild from); the drain's swap clears it in the same rename
    * that publishes the filtered index, so a crash anywhere leaves
    * either [ledger intact + old index] or [ledger gone + filtered
    * index] — never a lost request, never a half-applied state.
    *
    * Concurrency: unlike the rebuild-class verbs, THIS verb is the
    * streaming request-side enqueue, so it is allowed to race
    * maintenance — a request file landing after a drain/compaction's
    * ledger snapshot is definitionally un-applied, and the swap's
    * rescue pass ([[IndexFs.swapCompactRescue]]) re-carries it into the
    * promoted directory instead of deleting it with `.old`
    * (spec-staged through the deterministic race seam). Maintenance
    * verbs themselves remain single-writer among each other.
    */
  def requestGramTakedown(docIds: DataFrame, indexDir: String): Unit = {
    val spark = docIds.sparkSession
    IndexFs.recoverSwap(spark, indexDir)
    docIds.select(col("doc_id")).filter(col("doc_id").isNotNull).distinct()
      .repartition(1).write.mode("append")
      .parquet(pendingDeletesPath(indexDir))
  }

  /** The accumulated [[requestGramTakedown]] set (distinct doc_ids;
    * empty frame when no requests are pending). */
  def pendingGramTakedowns(spark: SparkSession, indexDir: String): DataFrame = {
    IndexFs.recoverSwap(spark, indexDir)
    val p = pendingDeletesPath(indexDir)
    if (IndexFs.exists(spark, p)) spark.read.parquet(p).distinct()
    else spark.range(0).select(col("id").as("doc_id"))
  }

  /** Apply every pending takedown request in ONE filtered rebuild —
    * the amortized drain ([[requestGramTakedown]]'s other half). The
    * caller hands back the remaining corpus (the x117/x133 contract;
    * hand back the FULL corpus carelessly — the ledger filter is
    * applied here, so batched-drain ≡ the sequential per-request
    * rebuilds it replaces, spec-gated in GramLedgerSpec and hash-gated
    * by x142's `drained` phase). Returns whether a drain ran (false =
    * no pending requests; the index is untouched).
    */
  def drainGramTakedowns(corpus: DataFrame, indexDir: String, k: Int = 8,
      buckets: Int = 0): Boolean = {
    val spark = corpus.sparkSession
    IndexFs.recoverSwap(spark, indexDir)
    // pending ROWS, not directory existence: a zero-row ledger (an
    // empty request, or a dir left by a prior drain's rescue pass)
    // must not bill the index-sized rebuild for applying nothing
    if (pendingGramTakedowns(spark, indexDir).isEmpty) false
    else {
      takedownGramIndex(corpus, indexDir, k, buckets)
      true
    }
  }

  /** x95 screen — [[duplicateSpansAgainstIndex]] semantics (same
    * output contract, same oracle) with the scan term decoupled from
    * index size: batch grams pre-gate through the sidecar Bloom
    * map-side, candidate buckets are collected (≤ `buckets` ints by
    * construction — control-plane), and the exact confirm semi-joins
    * only those bucket directories via a literal partition filter
    * (plan-gated in DedupSimilaritySpec).
    */
  def duplicateSpansAgainstIndexBloom(batch: DataFrame, indexDir: String,
      k: Int = 8, maxLiteralBytes: Long = 4L << 20,
      cacheSidecar: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    // a reader after a mid-swap compactor crash self-heals (one rename)
    IndexFs.recoverSwap(spark, indexDir)
    val sc = cachedSidecar(spark, indexDir, cacheSidecar)
    val (buckets, numBits, bf) = (sc.buckets, sc.numBits, sc.bf)
    val grams = graft.tools.InternalCaches.persist(gramStream(batch, k))
    // cached path: ship the filter as a broadcast variable (once per
    // executor per call) instead of a plan literal (once per TASK —
    // the round-12 streaming replay re-broadcast multi-MB task
    // binaries on every micro-batch job). A later append mutates the
    // cached filter only by ADDING bits, so a still-lazy frame that
    // observes post-append state over-approximates and the extra
    // candidates die in the exact confirm join — never an exactness
    // break.
    val gate = bloomGateColumn(spark, bf, numBits,
      if (cacheSidecar) 0L else maxLiteralBytes, col("g"))
    val cand = graft.tools.InternalCaches.persist(
      grams.filter(gate).select("g").distinct())
    val hot = cand
      .select(pmod(col("g"), lit(buckets.toLong)).cast("int").as("bucket"))
      .distinct()
      .as[Int](org.apache.spark.sql.Encoders.scalaInt).collect()
    val idx = gramTable(spark, indexDir)
      .filter(col("bucket").isin(hot.map(Int.box).toSeq: _*))
      .select("g")
    val confirmed = cand.join(idx, Seq("g"), "left_semi")
    val hits = grams.join(confirmed, Seq("g"), "left_semi")
      .select("doc_id", "pos")
    mergeSpans(hits, k)
  }

  /** x81 — substring dedup APPLIED: the cleaned corpus after cutting
    * every repeated `k`-gram occurrence except the corpus-first one
    * (Lee et al. 2021 §4.1 leave-one-copy semantics; [[duplicateSpans]]
    * is the audit view of the same phenomenon, this is the transform).
    *
    * Redundancy rule, deterministic by construction: a gram occurrence
    * (doc, pos) is redundant iff the same gram occurs at a strictly
    * smaller (doc_id, pos) — i.e. all but the lexicographically first
    * occurrence corpus-wide. A token is cut when ANY redundant
    * occurrence covers it ([pos, pos+k)); the first copy survives
    * unless a different redundant gram's span overlaps it. Output one
    * row per document: (doc_id, clean_text, n_kept, n_removed) —
    * clean docs pass through with n_removed = 0.
    *
    * Scale shape: the gram stream and its persist are [[duplicateSpans]]'s
    * stages 1–2; the per-gram first occurrence is a map-side-combinable
    * `groupBy(g).agg(min(struct(doc_id, pos)))` (NO per-gram window
    * sort — a super-common gram pre-reduces per mapper); redundant
    * hits join back on the hash; covered positions explode ≤ k rows
    * per redundant hit (bounded fan-out); the rebuild is ONE doc_id
    * exchange — tokens anti-join covered positions on (doc_id, pos)
    * and collapse via sort_array(collect_list(struct(pos, tok))), so
    * the only sort is per-doc over its own token array.
    */
  def removeDuplicateSpans(docs: DataFrame, k: Int = 8): DataFrame = {
    val grams = graft.tools.InternalCaches.persist(gramStream(docs, k))
    // corpus-first occurrence per gram: min (doc_id, pos), one combined
    // exchange on the gram hash
    val first = grams.groupBy("g")
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("g"), col("f.doc_id").as("f_doc"), col("f.pos").as("f_pos"))
    val redundant = grams.join(first, "g")
      .filter(col("doc_id") =!= col("f_doc") || col("pos") =!= col("f_pos"))
      .select(col("doc_id"), col("pos"))
    rebuildWithoutSpans(docs, redundant, k)
  }

  /** x83 — surgical benchmark decontamination: cut every corpus span
    * covered by a `k`-gram that appears ANYWHERE in the benchmark
    * (eval-suite) text, keeping the rest of the document. x30 answers
    * "which documents overlap the benchmark?" at the document grain —
    * dropping a whole page because one quoted question leaked is the
    * blunt instrument; this is the scalpel (the PaLM/GPT-3-style
    * decontamination that excises the leaked span and keeps the
    * document). Output contract matches [[removeDuplicateSpans]]:
    * (doc_id, clean_text, n_kept, n_removed) over the CORPUS side.
    *
    * Scale shape: the benchmark gram-hash set is distinct and
    * benchmark-sized (broadcast — the x30 contract; when an eval suite
    * outgrows broadcast, the x65 Bloom-carrier pattern pre-gates the
    * same join), the corpus gram stream is map-side, matches explode
    * to ≤ k covered positions each, and the rebuild pays the one
    * doc_id exchange [[rebuildWithoutSpans]] documents.
    */
  def removeBenchmarkSpans(docs: DataFrame, bench: DataFrame, k: Int = 5): DataFrame = {
    val bg = bench
      .select(explode(shingleStructs(tokens(col("text")), k)).as("s"))
      .select(hash60(shingleText(col("s"), k)).as("g")).distinct()
    val grams = docs
      .select(col("doc_id"), posexplode(shingleStructs(tokens(col("text")), k)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        hash60(shingleText(col("col"), k)).as("g"))
    val hits = grams.join(broadcast(bg), "g").select("doc_id", "pos")
    rebuildWithoutSpans(docs, hits, k)
  }

  /** Shared rebuild tail of the span-cutting transforms (x81/x83):
    * expand each hit to its covered positions ([pos, pos+k) — ≤ k rows
    * per hit), anti-join the positional token stream, and rebuild each
    * document's text from the survivors. ONE doc_id exchange; the only
    * sort is per-doc over its own token array (sort_array on the
    * collected (pos, tok) structs — the post-aggregation per-row spot
    * where an interpreted transform is acceptable, as with
    * MergeSortedArrays). Docs with nothing cut pass through; fully
    * covered docs keep a row with empty text.
    */
  private def rebuildWithoutSpans(
      docs: DataFrame, hits: DataFrame, k: Int): DataFrame = {
    val covered = hits
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("pos"))
      .distinct()
    val toks = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("tok"))
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
    kept.groupBy("doc_id")
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
      .join(docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_total")), Seq("doc_id"), "right")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** [[simhashPairs]] over a prebuilt (doc_id, simhash) table. */
  def simhashPairsFromSig(sh: DataFrame, maxHamming: Int = 12): DataFrame = {
    val chunks = sh.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("chunk", expr("shiftright(simhash, c * 15) & 32767"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
