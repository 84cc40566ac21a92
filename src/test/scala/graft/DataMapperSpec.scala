package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.queries.MigrationPipeline

/** End-to-end migration pipeline shape on the fixture star schema. */
class DataMapperSpec extends SparkSpec {

  test("converted tree: region→nation→{customer→orders, supplier}; lineitem referencing; part root") {
    val (_, schema) = MigrationPipeline.converted(spark, sf)
    val region = schema.roots.find(_.name == "region").get
    assert(region.embedded.map(_.name) === Seq("nation"))
    val nation = region.embedded.head
    assert(nation.embedded.map(_.name).sorted === Seq("customer", "supplier"))
    assert(nation.find("orders").isDefined, "orders nested under customer")
    assert(schema.roots.map(_.name).toSet === Set("region", "part", "lineitem"))
  }

  test("nested region documents have 4 levels and conserve row counts") {
    val nested = MigrationPipeline.mapRoot(spark, sf, "region")
    assert(nested.count() === 5)
    // total customers across all nests == customer table size
    val nCust = nested.select(explode(col("nation")).as("n"))
      .select(explode(col("n.customer")).as("c")).count()
    assert(nCust === graft.sources.Tables.load(spark, sf, "customer").count())
    // total orders across all nests == orders table size
    val nOrders = nested.select(explode(col("nation")).as("n"))
      .select(explode(col("n.customer")).as("c"))
      .select(explode(col("c.orders")).as("o")).count()
    assert(nOrders === graft.sources.Tables.load(spark, sf, "orders").count())
    // FK elision: embedded nation docs carry no n_regionkey
    val nationFields = nested.schema("nation").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(!nationFields.contains("n_regionkey"))
    assert(nationFields.contains("customer") && nationFields.contains("supplier"))
  }

  test("profile advisories: thresholds, role gating, and kind attribution") {
    // controlled stats frame exercising every advisory arm and both
    // boundary sides of each integer-arithmetic threshold
    val sess = spark; import sess.implicits._
    val stats = Seq(
      // near-unique null-free non-key: 95/100 exactly AT threshold → flags
      ("t", "at_threshold", 100L, 0L, 95L),
      // one under threshold → silent
      ("t", "under_threshold", 100L, 0L, 94L),
      // near-unique but a single null → silent (key candidates are null-free)
      ("t", "unique_with_null", 100L, 1L, 99L),
      // near-unique but PK → silent (already a key)
      ("t", "pk_col", 100L, 0L, 100L),
      // near-unique but FK → silent
      ("t", "fk_unique", 100L, 0L, 100L),
      // one distinct value → constant_fold
      ("t", "const_col", 100L, 0L, 1L),
      // FK null in 51/100 rows → null_heavy_fk (50/100 must NOT flag)
      ("t", "fk_half_null", 100L, 51L, 7L),
      ("t", "fk_exactly_half", 100L, 50L, 7L),
      // all-null column: distinct_est 0 → constant_fold fires (0 <= 1)
      ("t2", "all_null", 10L, 10L, 0L))
      .toDF("table_name", "col_name", "n_rows", "n_nulls", "n_distinct_est")
    val roles = Seq(
      ("t", "at_threshold", false, false), ("t", "under_threshold", false, false),
      ("t", "unique_with_null", false, false), ("t", "pk_col", true, false),
      ("t", "fk_unique", false, true), ("t", "const_col", false, false),
      ("t", "fk_half_null", false, true), ("t", "fk_exactly_half", false, true),
      ("t2", "all_null", false, false))
      .toDF("table_name", "col_name", "is_pk", "is_fk")
    // t2 deliberately absent from kinds: the left join must yield NULL
    val kinds = Seq(("t", "referencing")).toDF("table_name", "kind")
    val out = MigrationPipeline.advisoriesFrom(stats, roles, kinds)
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(out === Set(
      ("at_threshold", "key_candidate"),
      ("const_col", "constant_fold"),
      ("fk_half_null", "null_heavy_fk"),
      ("all_null", "constant_fold")), s"unexpected advisory set: $out")
    val t2kind = MigrationPipeline.advisoriesFrom(stats, roles, kinds)
      .filter(col("table_name") === "t2").select("kind").first()
    assert(t2kind.isNullAt(0), "missing decision kind must surface as NULL")
  }

  test("profile advisories on the fixture: key candidates only, schema stable") {
    val out = MigrationPipeline.profileAdvisories(spark, sf)
    assert(out.columns.toSeq === Seq("table_name", "col_name", "advisory",
      "kind", "n_rows", "n_nulls", "n_distinct_est"))
    val rows = out.collect()
    assert(rows.nonEmpty, "fixture should surface at least one advisory")
    // the synthetic fixture has no null FKs and no constant columns
    assert(rows.forall(_.getString(2) == "key_candidate"),
      s"unexpected advisories: ${rows.mkString(";")}")
    // a key candidate is by definition not a declared PK or FK column
    val pkFk = Set("r_regionkey", "n_nationkey", "n_regionkey", "c_custkey",
      "c_nationkey", "s_suppkey", "s_nationkey", "p_partkey", "o_orderkey",
      "o_custkey", "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    assert(rows.forall(r => !pkFk.contains(r.getString(1))),
      "declared key columns must never surface as key candidates")
  }

  test("date-normalizing parity loader formats temporal columns as Bangkok dates") {
    val (db, schema) = MigrationPipeline.converted(spark, sf)
    val mapper = new graft.map.DataMapper(spark, sf, db,
      graft.sinks.JsonSink.normalizingLoader(graft.sources.Tables.load))
    val li = mapper.mapRoot(schema.roots.find(_.name == "lineitem").get)
    val v = li.select("l_shipdate").first().getString(0)
    assert(v.matches("\\d{4}-\\d{2}-\\d{2}"), s"expected yyyy-MM-dd, got $v")
  }
}
