package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.operators.Embedding
import graft.plans.AsOfJoin

/** Skew and convergence stress tests — the adversarial shapes the scale
  * story claims to survive, run at sizes big enough to mean it:
  *
  *   1. a chain-shaped component (worst case for label propagation) —
  *      the path-halving O(log diameter) round bound of
  *      [[Dedup.connectedComponentsWithRounds]], including the round-10
  *      localCheckpoint lineage-truncation path nothing else reaches;
  *   2. one parent with 10⁶ children — the hot-key embedding
  *      ([[Embedding.oneWayEmbedSalted]]) must be byte-identical to the
  *      plain path it de-skews;
  *   3. one user with 10⁶ events — the as-of merge scan
  *      ([[AsOfJoin]]) is O(|L|+|R|) per key, so a single hot key is a
  *      long scan, not a blowup.
  */
class HotKeyStressSpec extends SparkSpec {

  test("chain graph (2 components × 10^4 nodes): exact labels within the " +
      "path-halving log2 round bound, crossing the checkpoint path") {
    val n = 10000L
    // two disjoint chains 0..n-1 and n..2n-1 (edge i—i+1, minus the one
    // that would bridge them); min-label = each chain's head
    val edges = spark.range(0, 2 * n - 1).filter(col("id") =!= n - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(edges)
    val byCluster = labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCluster === Map(0L -> n, n -> n))
    // label distance to the head doubles per round (neighbor-min +
    // label(label(v))), so ~log2(n) rounds + the final no-change round;
    // +4 covers propagation warm-up and the convergence check
    val bound = (math.log(2.0 * n) / math.log(2)).ceil.toInt + 4
    assert(rounds <= bound, s"took $rounds rounds, bound $bound")
    // the chain is deep enough that the loop crossed iteration 10 — the
    // localCheckpoint generation (and the skip-unpersist handling of it)
    // is genuinely exercised, not just written
    assert(rounds > 10,
      s"chain converged in $rounds rounds — never reached the checkpoint path")
  }

  test("hot parent with 10^6 children: salted embedding is identical to " +
      "the plain embedding it de-skews") {
    import spark.implicits._
    val parents = Seq((1L, "hot"), (2L, "childless")).toDF("p_id", "p_name")
    val children = spark.range(1000000L).select(
      col("id").as("c_id"),
      lit(1L).as("fk"),
      concat(lit("v"), col("id") % 997).as("payload"))
    val plain = Embedding.oneWayEmbed(
      parents, "p_id", children, "fk", "kids", Seq("c_id"))
    val salted = Embedding.oneWayEmbedSalted(
      parents, "p_id", children, "fk", "kids", Seq("c_id"), salts = 16)
    // byte-level equality of the full nested document (order included),
    // without collecting a 10^6-element array to the driver
    def sig(df: DataFrame): Seq[(Long, String, String)] =
      df.select(col("p_id"), col("p_name"),
          md5(coalesce(to_json(col("kids")), lit("<absent>"))).as("h"))
        .orderBy("p_id").as[(Long, String, String)].collect().toSeq
    val s = sig(salted); val p = sig(plain)
    assert(s === p)
    assert(s.map(_._1) === Seq(1L, 2L))
    // the childless parent embeds nothing in BOTH paths (null array, so
    // the JSON sink will omit the key)
    assert(salted.filter(col("p_id") === 2 && col("kids").isNull).count() === 1)

    // ---- auto-salting: the same hot shape must TRIGGER the salted
    // plan from the sampled fan-out pre-pass (unsalted, the 10^6-child
    // parent is one straggler reduce task — at cluster scale, the task
    // that OOMs), and the output must stay byte-identical
    val est = Embedding.estimateMaxFanout(children, "fk", 0.01)
    assert(est > 500000L && est < 2000000L,
      s"sampled fan-out estimate $est should land near the true 10^6")
    val auto = Embedding.oneWayEmbedAuto(
      parents, "p_id", children, "fk", "kids", Seq("c_id"),
      hotFanout = 100000L, sampleFraction = 0.01)
    assert(auto.queryExecution.analyzed.toString.toLowerCase
        .contains("merge_sorted_arrays"),
      "auto path must choose the salted merge plan for a hot key")
    assert(sig(auto) === p)
    // and a uniform shape must stay on the plain single-shuffle plan
    val uniform = spark.range(10000L).select(
      col("id").as("c_id"), (col("id") % 1000).as("fk"),
      lit("v").as("payload"))
    val autoUniform = Embedding.oneWayEmbedAuto(
      parents, "p_id", uniform, "fk", "kids", Seq("c_id"),
      hotFanout = 100000L, sampleFraction = 0.1)
    assert(!autoUniform.queryExecution.analyzed.toString.toLowerCase
        .contains("merge_sorted_arrays"),
      "auto path must not pay the two-phase merge for uniform fan-out")
  }

  test("hot parent through the FULL migration data plane: mapRoot picks " +
      "the salted plan and stays byte-identical") {
    // the production path (DataMapper.mapRoot → oneWayEmbedAuto), not
    // just the operator: a declared schema whose child table hides a
    // 10^6-child parent must come out of the flagship pipeline on the
    // salted merge plan, byte-identical to the plain-plan build
    import graft.model._
    import spark.implicits._
    val parents = Seq((1L, "hot"), (2L, "childless")).toDF("p_id", "p_name")
    val children = spark.range(1000000L).select(
      col("id").as("c_id"),
      when(col("id") < 999999L, lit(1L)).otherwise(lit(2L)).as("fk"),
      concat(lit("v"), col("id") % 997).as("payload"))
    val db = DatabaseMeta("stress", Seq(
      TableMeta("p", 2L, Seq("p_id", "p_name"), Seq("p_id"), Seq.empty,
        isReferenced = true, referencingTables = Seq("c")),
      TableMeta("c", 1000000L, Seq("c_id", "fk", "payload"), Seq("c_id"),
        Seq(ForeignKeyMeta("fk", "p", "p_id")),
        isReferenced = false, referencingTables = Seq.empty)))
    val root = CollectionNode("p", Seq("p_id", "p_name"), ConversionKind.Root,
      embedded = Seq(
        CollectionNode("c", Seq("c_id", "payload"), ConversionKind.OneWayEmbedded)))
    val loader = (_: org.apache.spark.sql.SparkSession, _: String, t: String) =>
      if (t == "p") parents else children
    def sig(df: DataFrame): Seq[(Long, String)] =
      df.select(col("p_id"),
          md5(coalesce(to_json(col("c")), lit("<absent>"))).as("h"))
        .orderBy("p_id").as[(Long, String)].collect().toSeq
    val auto = new graft.map.DataMapper(spark, "unused", db, loader,
      hotFanout = 100000L, sampleFraction = 0.01).mapRoot(root)
    assert(auto.queryExecution.analyzed.toString.toLowerCase
        .contains("merge_sorted_arrays"),
      "mapRoot must route the hot level through the salted merge plan")
    // reference output: the same mapper forced onto the plain plan
    val plain = new graft.map.DataMapper(spark, "unused", db, loader,
      hotFanout = Long.MaxValue).mapRoot(root)
    assert(!plain.queryExecution.analyzed.toString.toLowerCase
        .contains("merge_sorted_arrays"))
    assert(sig(auto) === sig(plain),
      "auto-salted mapRoot must be byte-identical to the plain build")
  }

  test("single user with 10^6 events through the as-of merge scan") {
    val purchases = spark.range(1000000L).select(
      lit(1L).as("p_user_id"),
      (col("id") * 2).as("p_ts"),
      col("id").as("p_val"))
    val probes = spark.range(100000L).select(
        lit(1L).as("user_id"), (col("id") * 20 + 1).as("ts"))
      .unionAll(spark.range(1).select(
        lit(2L).as("user_id"), lit(100L).as("ts")))
    val out = AsOfJoin.asOf(
      probes, purchases, Seq("user_id"), Seq("p_user_id"), "ts", "p_ts")
    // ts = 20i+1 matches p_ts = 20i exactly (the greatest even number
    // <= an odd probe), i.e. p_val = (ts-1)/2 — checkable row-by-row
    // without materializing anything on the driver
    val wrong = out.filter(col("user_id") === 1 &&
      (col("p_val").isNull || col("p_val") =!= (col("ts") - 1) / 2)).count()
    assert(wrong === 0)
    // the keyless user matches nothing and survives with nulls
    val orphan = out.filter(col("user_id") === 2).select("p_val").collect()
    assert(orphan.length === 1 && orphan.head.isNullAt(0))
    assert(out.count() === 100001)
  }

  test("one 10^3-vector cluster through semDedup: occupancy² pairwise, exact verdicts") {
    // every vector leans on axis 0, so the single centroid (vec 0) takes
    // the WHOLE corpus — the pathological hot cluster the Scaladoc says
    // is bounded by occupancy², not n². 1000 vectors → ~500k in-cluster
    // pairs through the witness join. Vectors split into two families:
    // ids ≡ 0 (mod 2) share axis 1 (mutual cos ≈ 1 → all dups of vec 0's
    // family head), odd ids get a per-id axis (cos to everything ≈ the
    // axis-0 lean alone, below threshold → all survive).
    import graft.ext.Similarity
    import spark.implicits._
    val dim = 64
    val n = 1000
    val rows = (0 until n).map { i =>
      val v = Array.fill(dim)(0.0f)
      v(0) = 1.0f
      if (i % 2 == 0) v(1) = 10.0f else v(2 + (i % 60)) = 10.0f
      (i.toLong, v.toSeq)
    }
    val out = Similarity.semDedup(rows.toDF("vec_id", "embedding"),
      minCos = 0.9, centroidModulus = n).cache()
    try {
      assert(out.count() === n, "one verdict per vector")
      assert(out.select(countDistinct("centroid_id")).first().getLong(0) === 1,
        "the whole corpus lands in one cluster")
      // even family: identical directions, every member but the head is a dup
      assert(out.filter(col("vec_id") % 2 === 0 && col("vec_id") > 0)
        .filter(!col("is_dup")).count() === 0)
      assert(!out.filter(col("vec_id") === 0).first().getBoolean(4),
        "the lowest id survives")
      // odd family: each direction shared by ~16 ids (i % 60 cycles), so
      // every odd id except the first per axis has a lower-id twin; the
      // axis-minimum odd ids (3 <= id < 123 stepping the 60 axes twice
      // per cycle...) — assert instead the exact closure rule: an odd id
      // is a dup iff a LOWER odd id shares its axis
      val odd = out.filter(col("vec_id") % 2 === 1)
        .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toMap
      odd.keys.foreach { id =>
        val axis = 2 + (id % 60)
        val expectDup = (1L until id by 2).exists(j => 2 + (j % 60) == axis)
        assert(odd(id) === expectDup, s"odd vec $id axis $axis")
      }
    } finally out.unpersist()
  }
}
