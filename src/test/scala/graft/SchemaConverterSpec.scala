package graft

import graft.convert.SchemaConverter
import graft.model._

/** Decision-procedure tests (SURVEY.md §2.8): rule order, workload
  * flips, self-reference, cyclic drop, first-match nesting.
  */
class SchemaConverterSpec extends SparkSpec {

  private def tm(
      name: String,
      rows: Long,
      cols: Seq[String],
      pks: Seq[String],
      fks: Seq[ForeignKeyMeta] = Seq.empty,
      refdBy: Seq[String] = Seq.empty,
      uaf: Long = 0L): TableMeta =
    TableMeta(name, rows, cols, pks, fks, refdBy.nonEmpty, refdBy, gaf = 0L, uaf = uaf)

  test("0-FK tables are roots regardless of workload") {
    val db = DatabaseMeta("t", Seq(
      tm("a", 10, Seq("id", "x"), Seq("id"), refdBy = Seq("b"), uaf = 1000000)),
      maf = 1.0)
    val out = SchemaConverter.convert(db)
    assert(out.roots.map(n => (n.name, n.kind)) === Seq(("a", ConversionKind.Root)))
  }

  test("self-referencing table becomes referencing with _REF attrs") {
    val db = DatabaseMeta("t", Seq(
      tm("emp", 10, Seq("id", "mgr", "nm"), Seq("id"),
        Seq(ForeignKeyMeta("mgr", "emp", "id")), refdBy = Seq("emp"))))
    val out = SchemaConverter.convert(db)
    assert(out.roots.head.kind === ConversionKind.Referencing)
    assert(out.roots.head.attributes === Seq("id", "mgr_REF", "nm"))
  }

  test(">2 FKs always referencing; 1 FK embeds; 2 FKs two-way embeds under both parents") {
    val db = DatabaseMeta("t", Seq(
      tm("p1", 5, Seq("id1", "a1"), Seq("id1"), refdBy = Seq("j2", "c1")),
      tm("p2", 5, Seq("id2", "a2"), Seq("id2"), refdBy = Seq("j2")),
      tm("p3", 5, Seq("id3", "a3"), Seq("id3"), refdBy = Seq("f3")),
      tm("c1", 5, Seq("cid", "fk1", "v"), Seq("cid"),
        Seq(ForeignKeyMeta("fk1", "p1", "id1"))),
      tm("j2", 5, Seq("jid", "fka", "fkb", "w"), Seq("jid"),
        Seq(ForeignKeyMeta("fka", "p1", "id1"), ForeignKeyMeta("fkb", "p2", "id2"))),
      tm("f3", 5, Seq("fid", "x1", "x2", "x3"), Seq("fid"),
        Seq(ForeignKeyMeta("x1", "p1", "id1"), ForeignKeyMeta("x2", "p2", "id2"),
          ForeignKeyMeta("x3", "p3", "id3")))))
    val out = SchemaConverter.convert(db)
    val rootKinds = out.roots.map(n => (n.name, n.kind)).toMap
    assert(rootKinds("f3") === ConversionKind.Referencing)
    val p1 = out.roots.find(_.name == "p1").get
    assert(p1.embedded.map(_.name).sorted === Seq("c1", "j2"))
    // two-way child under p1 inlines p2's attrs (minus its key)
    val j2UnderP1 = p1.embedded.find(_.name == "j2").get
    assert(j2UnderP1.attributes === Seq("jid", "w", "a2"))
    assert(j2UnderP1.embeddedAttributesFrom === Some("p2"))
    val p2 = out.roots.find(_.name == "p2").get
    assert(p2.embedded.map(_.name) === Seq("j2"))
    assert(p2.embedded.head.attributes === Seq("jid", "w", "a1"))
    // one-way child drops its FK
    val c1 = p1.embedded.find(_.name == "c1").get
    assert(c1.attributes === Seq("cid", "v"))
  }

  test("null-heavy-FK advisory forces referencing; the forced root still " +
    "receives embedded children; an advisory on another column is inert") {
    val mk = DatabaseMeta("t", Seq(
      tm("p", 5, Seq("id", "a"), Seq("id"), refdBy = Seq("c")),
      tm("c", 5, Seq("cid", "fk", "v"), Seq("cid"),
        Seq(ForeignKeyMeta("fk", "p", "id")), refdBy = Seq("g")),
      tm("g", 5, Seq("gid", "cfk", "w"), Seq("gid"),
        Seq(ForeignKeyMeta("cfk", "c", "cid")))))
    // without the advisory: p → c → g, one chain
    val plain = SchemaConverter.convert(mk)
    assert(plain.roots.map(_.name) === Seq("p"))
    assert(plain.roots.head.embedded.head.name === "c")
    // the advisory on c.fk flips ONLY c's decision...
    assert(SchemaConverter.decide(mk("c"), mk) === ConversionKind.OneWayEmbedded)
    assert(SchemaConverter.decide(mk("c"), mk, Set(("c", "fk"))) ===
      ConversionKind.Referencing)
    val advised = SchemaConverter.convert(mk, Set(("c", "fk")))
    val kinds = advised.roots.map(n => (n.name, n.kind)).toMap
    assert(kinds === Map("p" -> ConversionKind.Root,
      "c" -> ConversionKind.Referencing))
    // ...keeps c's FK as a _REF attribute, and c still receives g
    val c = advised.roots.find(_.name == "c").get
    assert(c.attributes === Seq("cid", "fk_REF", "v"))
    assert(c.embedded.map(_.name) === Seq("g"))
    // a flag for a different (table, column) changes nothing
    assert(SchemaConverter.convert(mk, Set(("c", "other"), ("x", "fk"))).roots
      .map(_.name) === Seq("p"))
  }

  test("workload rule: hot table (uaf > maf) stays referencing; parent of hot child too") {
    val mk = (cUaf: Long, pUaf: Long) => DatabaseMeta("t", Seq(
      tm("p", 10, Seq("id", "a"), Seq("id"), refdBy = Seq("c"), uaf = pUaf),
      tm("g", 10, Seq("gid"), Seq("gid"), refdBy = Seq("p")),
      tm("p2", 10, Seq("id", "fk", "a"), Seq("id"),
        Seq(ForeignKeyMeta("fk", "g", "gid")), refdBy = Seq("c2"), uaf = pUaf),
      tm("c", 10, Seq("cid", "fk", "v"), Seq("cid"),
        Seq(ForeignKeyMeta("fk", "p", "id")), uaf = cUaf)), maf = 100.0)
    // cold: c embeds into p
    val cold = SchemaConverter.convert(mk(50, 0))
    assert(cold.roots.find(_.name == "p").get.embedded.map(_.name) === Seq("c"))
    // hot child: c referencing
    val hot = SchemaConverter.convert(mk(500, 0))
    assert(hot.roots.exists(r => r.name == "c" && r.kind == ConversionKind.Referencing))
  }

  test("referenced-by-hot-table rule: table whose referencing table is hot stays referencing") {
    val db = DatabaseMeta("t", Seq(
      tm("g", 10, Seq("gid"), Seq("gid"), refdBy = Seq("p")),
      tm("p", 10, Seq("id", "fk"), Seq("id"),
        Seq(ForeignKeyMeta("fk", "g", "gid")), refdBy = Seq("c")),
      tm("c", 10, Seq("cid", "fk2"), Seq("cid"),
        Seq(ForeignKeyMeta("fk2", "p", "id")), uaf = 500)), maf = 100.0)
    val out = SchemaConverter.convert(db)
    // p is referenced by c whose uaf > maf → p referencing (not embedded in g)
    assert(out.roots.exists(r => r.name == "p" && r.kind == ConversionKind.Referencing))
  }

  test("FK-cyclic tables are dropped with a warning (reference parity)") {
    val db = DatabaseMeta("t", Seq(
      tm("root0", 1, Seq("id"), Seq("id")),
      tm("x", 1, Seq("id", "fy"), Seq("id"), Seq(ForeignKeyMeta("fy", "y", "id")), Seq("y")),
      tm("y", 1, Seq("id", "fx"), Seq("id"), Seq(ForeignKeyMeta("fx", "x", "id")), Seq("x"))))
    val topo = SchemaConverter.topoOrder(db)
    assert(topo.order === Seq("root0"))
    assert(topo.droppedCyclic.toSet === Set("x", "y"))
    val out = SchemaConverter.convert(db)
    assert(out.find("x").isEmpty && out.find("y").isEmpty)
  }

  test("junction with both FKs into the same parent embeds once, keyed on the second FK") {
    import spark.implicits._
    val db = DatabaseMeta("t", Seq(
      tm("user", 3, Seq("uid", "uname"), Seq("uid"), refdBy = Seq("follows")),
      tm("follows", 3, Seq("fid", "follower", "followee"), Seq("fid"),
        Seq(ForeignKeyMeta("follower", "user", "uid"),
          ForeignKeyMeta("followee", "user", "uid")))))
    val out = SchemaConverter.convert(db)
    val user = out.roots.find(_.name == "user").get
    assert(user.embedded.map(_.name) === Seq("follows"),
      "one surviving copy (reference document-key overwrite semantics)")
    val f = user.embedded.head
    assert(f.parentFkColumn === Some("followee"))
    assert(f.attributes === Seq("fid", "uname"))
    // and the data plane maps it without ambiguous-column crashes
    val dfs = Map(
      "user" -> Seq((1L, "ann"), (2L, "bo"), (3L, "cy")).toDF("uid", "uname"),
      "follows" -> Seq((10L, 1L, 2L), (11L, 3L, 2L)).toDF("fid", "follower", "followee"))
    val mapped = new graft.map.DataMapper(spark, "", db, (_, _, n) => dfs(n))
      .mapRoot(user).orderBy("uid").collect()
    val bo = mapped(1)
    val fl = bo.getSeq[org.apache.spark.sql.Row](bo.fieldIndex("follows"))
    assert(fl.map(_.getAs[Long]("fid")) === Seq(10L, 11L), "both followers of bo")
    assert(fl.map(_.getAs[String]("uname")) === Seq("ann", "cy"),
      "follower-side user attrs inlined")
    assert(mapped(0).isNullAt(mapped(0).fieldIndex("follows")), "ann has no followers")
  }

  test("seeding falls back to single-FK self-referencing tables when no 0-FK table exists") {
    val db = DatabaseMeta("t", Seq(
      tm("emp", 10, Seq("id", "mgr"), Seq("id"),
        Seq(ForeignKeyMeta("mgr", "emp", "id")), refdBy = Seq("emp", "dep")),
      tm("dep", 10, Seq("did", "eid"), Seq("did"),
        Seq(ForeignKeyMeta("eid", "emp", "id")))))
    val topo = SchemaConverter.topoOrder(db)
    assert(topo.order === Seq("emp", "dep"))
    val out = SchemaConverter.convert(db)
    // emp is a referencing ROOT that still receives dep embedded
    // (assets/output.png shape)
    val emp = out.roots.find(_.name == "emp").get
    assert(emp.kind === ConversionKind.Referencing)
    assert(emp.embedded.map(_.name) === Seq("dep"))
  }

  test("table profile: rows / nulls / exact distinct per column, one pass") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(10)),
      (2L, Some("a"), None),
      (3L, None, Some(10)),
      (4L, Some("b"), Some(20))
    ).toDF("id", "grp", "v")
    val prof = graft.operators.Catalog.profile(df, "t")
      .collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(prof === Map(
      "id" -> ((4L, 0L, 4L)),   // unique key candidate
      "grp" -> ((4L, 1L, 2L)),  // nullable low-cardinality
      "v" -> ((4L, 1L, 2L))))   // COUNT(DISTINCT) ignores the NULL
    // empty table: all-zero counts, never NULL (SUM-over-zero-rows
    // would be NULL; the operator counts instead) — and a dotted flat
    // column name must be profiled as itself, not parsed as a path
    val empty = graft.operators.Catalog.profile(
        df.filter(col("id") < 0).withColumnRenamed("v", "v.sub"), "e")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(empty.toSet === Set(
      ("id", 0L, 0L, 0L), ("grp", 0L, 0L, 0L), ("v.sub", 0L, 0L, 0L)))
  }

  test("sketch profile: exact below k, NULL sentinel, canonical doubles") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(1.25), None: Option[String]),
      (2L, Some("a"), Some(1.25 + 1e-9), None),
      (3L, None, Some(10.0), None),
      (4L, Some("b"), None, None)
    ).toDF("id", "grp", "d", "dead")
    val prof = graft.operators.Catalog.profileApprox(df, "t", k = 64)
      .collect()
      .map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // every column has < k distincts, so the KMV estimate is exact by
    // construction; the two doubles 1e-9 apart collapse to one
    // DECIMAL(38,6) rendering (documented profiling-grade trade); the
    // all-NULL column reports est 0, not a missing row
    assert(prof === Map(
      "id" -> ((4L, 0L, 64L, 4L)),
      "grp" -> ((4L, 1L, 64L, 2L)),
      "d" -> ((4L, 1L, 64L, 2L)),
      "dead" -> ((4L, 4L, 64L, 0L))))
  }

  test("sketch profile: non-finite and huge doubles are values, not NULLs") {
    import spark.implicits._
    // NaN / ±Infinity / |x| >= 1e32 don't fit DECIMAL(38,6) — without
    // the guard, non-ANSI CAST silently NULLs them (inflating n_nulls
    // and shrinking the sketch) while the DuckDB oracle errors. The
    // guard routes them to renderings both engines agree on.
    val df = Seq(
      (1L, Double.NaN), (2L, Double.PositiveInfinity),
      (3L, Double.NegativeInfinity), (4L, 1e32), (5L, 2.5e100),
      (6L, 1.25), (7L, 1e32) // duplicate huge value must collapse
    ).toDF("id", "d")
    val prof = graft.operators.Catalog.profileApprox(df, "t", k = 64)
      .filter(org.apache.spark.sql.functions.col("col_name") === "d").head()
    assert((prof.getLong(2), prof.getLong(3), prof.getLong(5)) ===
      ((7L, 0L, 6L)),
      "7 rows, ZERO nulls, 6 distinct canonical renderings")
    // pin the huge-magnitude rendering to the C-printf form the DuckDB
    // oracle produces (printf('%.6e', …)): Java's %.6e must agree
    // digit-for-digit, including the two-digit-minimum exponent
    val rendered = spark.sql(
      "SELECT format_string('%.6e', CAST(1e32 AS DOUBLE)), " +
        "format_string('%.6e', CAST(-3.5e45 AS DOUBLE)), " +
        "format_string('%.6e', CAST(2.5e100 AS DOUBLE))").head()
    assert((rendered.getString(0), rendered.getString(1), rendered.getString(2)) ===
      (("1.000000e+32", "-3.500000e+45", "2.500000e+100")))
  }

  test("quantile profile: nearest-rank picks, NULL/NaN excluded, p=0 is min") {
    import spark.implicits._
    // a: 1..10 → rk(p) = max(1, ceil(10p)): p0→1, p.25→3, p.5→5,
    // p.75→8, p1→10 (percentile_disc semantics, hand-checked);
    // b: constant; c: one real value among NULL/NaN noise
    val df = (1 to 10).map(i => (
        i.toDouble, 7.5,
        if (i == 3) Some(5.0) else if (i == 4) Some(Double.NaN) else None))
      .toDF("a", "b", "c")
    val out = graft.operators.Catalog
      .profileQuantiles(df, "t", Seq("a", "b", "c"))
      .collect()
      .map(r => (r.getString(1), r.getDouble(2)) -> r.getDouble(3)).toMap
    assert(Seq(0.0, 0.25, 0.5, 0.75, 1.0).map(p => out(("a", p))) ===
      Seq(1.0, 3.0, 5.0, 8.0, 10.0))
    assert(Seq(0.0, 0.5, 1.0).forall(p => out(("b", p)) === 7.5),
      "constant column: every quantile is the constant")
    assert(Seq(0.0, 0.5, 1.0).forall(p => out(("c", p)) === 5.0),
      "NULLs and NaNs must not count toward n or ranks")
  }

  test("histogram quantile profile: within a bin width of exact, constant exact") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // deterministic non-uniform values (quadratic spread) — the
    // histogram estimate must stay within one bin width of the exact
    // nearest-rank value, and a constant column collapses to bin 0
    val df = (0 until 1000).map(i => (i * i / 1000.0, 42.0)).toDF("a", "b")
    val bins = 64
    val width = (999.0 * 999.0 / 1000.0) / bins
    val exact = graft.operators.Catalog
      .profileQuantiles(df, "t", Seq("a", "b")).collect()
      .map(r => (r.getString(1), r.getDouble(2)) -> r.getDouble(3)).toMap
    val est = graft.operators.Catalog
      .profileQuantilesHist(df, "t", Seq("a", "b"), bins = bins).collect()
      .map(r => (r.getString(1), r.getDouble(2)) -> r.getDouble(4)).toMap
    assert(est.keySet === exact.keySet)
    for (((c, p), e) <- exact) {
      val h = est((c, p))
      if (c == "b") assert(h === 42.0, "constant column estimates exactly")
      else assert(h <= e + 1e-6 && e - h <= width + 1e-6,
        s"col $c p=$p: est $h must be a lower edge within $width of exact $e")
    }
    // n_bins rides in the output for audit
    val nb = graft.operators.Catalog
      .profileQuantilesHist(df, "t", Seq("a"), bins = bins)
      .select(col("n_bins")).distinct().head().getLong(0)
    assert(nb === bins.toLong)
  }

  test("heavy hitters: frequency desc, value-asc ties, k caps per column") {
    import spark.implicits._
    val df = Seq("b", "b", "b", "a", "a", "a", "c")
      .map(v => Tuple2(v, Option.empty[String])).toDF("v", "dead")
    val top = graft.operators.Catalog.heavyHitters(df, "t", Seq("v", "dead"))
      .collect().map(r =>
        (r.getString(1), r.getInt(2), r.getString(3), r.getLong(4)))
    // tie at cnt=3 breaks by value ascending: a before b
    assert(top.toSeq === Seq(
      ("v", 1, "a", 3L), ("v", 2, "b", 3L), ("v", 3, "c", 1L)),
      "all-NULL column contributes no rows; ties order by value")
    val capped = graft.operators.Catalog.heavyHitters(df, "t", Seq("v"), k = 2)
      .collect()
    assert(capped.length === 2 && capped.map(_.getString(3)).toSeq === Seq("a", "b"))
  }

  test("profile drift: zero for identical corpora, one for disjoint, shift trips the flag") {
    import spark.implicits._
    import graft.operators.Catalog
    def corpus(langs: Seq[String], chars: Seq[Long]) =
      langs.zip(chars).zipWithIndex.map { case ((l, c), i) => (i.toLong, l, c) }
        .toDF("doc_id", "lang", "n_chars")
    val a = corpus(Seq("en", "en", "fr", "de"), Seq(10L, 20L, 30L, 40L))
    // identical distributions → tv 0, nothing drifts
    val same = Catalog.profileDrift(a, a, Seq("n_chars"), Seq("lang"))
      .collect().map(r => (r.getString(0), r.getDouble(4), r.getBoolean(5))).toSet
    assert(same === Set(("n_chars", 0.0, false), ("lang", 0.0, false)), s"$same")
    // disjoint categorical support → all mass moved
    val b = corpus(Seq("ja", "ja", "ko", "zh"), Seq(10L, 20L, 30L, 40L))
    val disj = Catalog.profileDrift(a, b, Seq.empty, Seq("lang")).head()
    assert(disj.getDouble(4) === 1.0 && disj.getBoolean(5), s"$disj")
    // numeric shift: b's lengths live in bins a never occupies
    val c = corpus(Seq("en", "en", "fr", "de"), Seq(910L, 920L, 930L, 940L))
    val shift = Catalog.profileDrift(a, c, Seq("n_chars"), Seq.empty).head()
    assert(shift.getDouble(4) === 1.0 && shift.getBoolean(5), s"$shift")
    // an empty side is maximal drift, not an error
    val empty = Catalog.profileDrift(a, a.filter("doc_id < 0"),
      Seq("n_chars"), Seq("lang")).collect()
    assert(empty.forall(r => r.getDouble(4) === 1.0 && r.getBoolean(5)),
      empty.mkString(","))
  }

  test("corpus diff: added/removed/changed detected, unchanged suppressed") {
    import spark.implicits._
    val oldV = Seq(
      (1L, "alpha", "en"), (2L, "beta", "en"),
      (3L, "gamma", "de"), (4L, "delta", "fr")).toDF("doc_id", "text", "lang")
    val newV = Seq(
      (1L, "alpha", "en"),      // unchanged → suppressed
      (2L, "beta2", "en"),      // changed (text)
      (3L, "gamma", "en"),      // changed (lang)
      (5L, "epsilon", "en")     // added; 4 removed
    ).toDF("doc_id", "text", "lang")
    val out = graft.operators.Catalog.corpusDiff(oldV, newV, "doc_id", Seq("text", "lang"))
      .as[(Long, String)].collect().toSet
    assert(out === Set((2L, "changed"), (3L, "changed"),
      (4L, "removed"), (5L, "added")))
  }

  test("corpus diff: NULL vs string and column-boundary aliasing both read as changed") {
    import spark.implicits._
    // (ab, c) vs (a, bc): a naive separator-less concat fingerprints
    // these identically; the length prefix must not
    val oldV = Seq((1L, Some("ab"), Some("c")), (2L, Some("x"), None))
      .toDF("doc_id", "t1", "t2")
    val newV = Seq((1L, Some("a"), Some("bc")), (2L, Some("x"), Some("")))
      .toDF("doc_id", "t1", "t2")
    val out = graft.operators.Catalog.corpusDiff(oldV, newV, "doc_id", Seq("t1", "t2"))
      .as[(Long, String)].collect().toSet
    // doc 2: NULL → empty string is a change (NULL renders "n:", "" renders "0:")
    assert(out === Set((1L, "changed"), (2L, "changed")))
  }

  test("profile name guard rejects quote, backtick, and backslash names") {
    import spark.implicits._
    val base = Seq((1L, "x")).toDF("id", "v")
    for (bad <- Seq("a'b", "a`b", "a\\b"); op <- Seq(
        (d: org.apache.spark.sql.DataFrame) =>
          graft.operators.Catalog.profile(d, "t"),
        (d: org.apache.spark.sql.DataFrame) =>
          graft.operators.Catalog.profileApprox(d, "t"),
        (d: org.apache.spark.sql.DataFrame) =>
          graft.operators.Catalog.profileQuantiles(d, "t", Seq(bad)),
        (d: org.apache.spark.sql.DataFrame) =>
          graft.operators.Catalog.heavyHitters(d, "t", Seq(bad)))) {
      val ex = intercept[IllegalArgumentException] {
        op(base.withColumnRenamed("v", bad))
      }
      assert(ex.getMessage.contains("column names"))
    }
  }
}
