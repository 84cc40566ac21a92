package graft

import org.apache.spark.sql.functions._

import graft.convert.SchemaConverter
import graft.map.{DataMapper, DocSizeAudit}
import graft.model.ConversionKind
import graft.queries.MigrationPipeline

/** x70 — the document-size pre-flight: the estimate must price the real
  * build closely, must never BUILD anything (that is its entire point),
  * and must drive both guards (DataMapper refusal, SchemaConverter
  * demotion).
  */
class DocSizeAuditSpec extends SparkSpec {

  private def audit(dir: String) = {
    val (db, schema) = MigrationPipeline.converted(spark, dir)
    (new DocSizeAudit(spark, dir, db), db, schema)
  }

  test("estimate tracks the built documents' serialized size") {
    val (a, _, schema) = audit(sf)
    val region = schema.roots.find(_.name == "region").get
    val est = a.estimateRoot(region)
    // the real built documents, serialized — the quantity the model
    // approximates (JSON here; the model prices BSON, so ratios near 1
    // are expected, not equality)
    val built = MigrationPipeline.mapRoot(spark, sf, "region")
    val actual = built.select(col("r_regionkey"),
      octet_length(to_json(struct(built.columns.map(col): _*))).as("json_bytes"))
    val joined = est.join(actual, "r_regionkey")
      .select(col("est_doc_bytes"), col("json_bytes")).collect()
    assert(joined.length === 5)
    joined.foreach { r =>
      val ratio = r.getLong(0).toDouble / r.getInt(1)
      assert(ratio > 0.5 && ratio < 2.0,
        s"estimate off by more than 2x: est=${r.getLong(0)} json=${r.getInt(1)}")
    }
  }

  test("the audit plan builds no documents: no nesting aggregate anywhere") {
    val (a, _, schema) = audit(sf)
    val region = schema.roots.find(_.name == "region").get
    val plan = a.estimateRoot(region).queryExecution.executedPlan.toString
    for (marker <- Seq("NestCollect", "collect_list", "merge_sorted_arrays"))
      assert(!plan.contains(marker),
        s"audit plan must not build documents but contains $marker")
  }

  test("the 100x region tree flags before building where the 1x tree passes") {
    // sf0.1 is 100x the spec corpus — the same two-decade step the
    // measured q24 wall sits on. One budget, both scales: the audit
    // must separate them BEFORE any build runs (the previous test
    // pins 'before building' structurally).
    val budget = 1L * 1024 * 1024
    val (a1, _, schema1) = audit(sf)
    assert(a1.maxDocBytes(schema1.roots.find(_.name == "region").get) <= budget,
      "1x region tree should fit the 1 MiB budget")
    val (a100, _, schema100) = audit("/root/testdata/sf0.1")
    val est = a100.estimateRoot(schema100.roots.find(_.name == "region").get)
    assert(est.filter(col("est_doc_bytes") > budget).count() === 5,
      "every 100x region document should flag the 1 MiB budget")
  }

  test("mapRootGuarded refuses over-budget roots and passes fitting ones") {
    val (db, schema) = MigrationPipeline.converted(spark, sf)
    val mapper = new DataMapper(spark, sf, db)
    val region = schema.roots.find(_.name == "region").get
    val e = intercept[IllegalStateException] {
      mapper.mapRootGuarded(region, budgetBytes = 10000L)
    }
    assert(e.getMessage.contains("region") && e.getMessage.contains("10000"),
      s"guard message should name root and budget: ${e.getMessage}")
    // within budget: same result as the unguarded build
    val ok = mapper.mapRootGuarded(region, budgetBytes = DocSizeAudit.MongoDocLimit)
    assert(ok.count() === 5)
  }

  test("enforceDocBudget demotes the over-budget root and keeps the rest") {
    val (a, db, schema) = audit(sf)
    // ~40 KB region docs at this scale: a 20 KB budget demotes region
    // once — nation hoists to a referencing root with its subtree
    // intact — and everything then fits
    val budget = 20000L
    val (adjusted, log) =
      SchemaConverter.enforceDocBudget(db, schema, a.maxDocBytes, budget)
    assert(log === Seq("region" -> Seq("nation")), s"unexpected demotions: $log")
    val region = adjusted.roots.find(_.name == "region").get
    assert(region.embedded.isEmpty, "demoted root keeps no embedded children")
    val nation = adjusted.roots.find(_.name == "nation").get
    assert(nation.kind === ConversionKind.Referencing)
    assert(nation.attributes.contains("n_regionkey_REF"),
      "hoisted root's FK must take the referencing _REF shape")
    assert(nation.embedded.map(_.name).toSet === Set("customer", "supplier"),
      "hoisted root keeps its own subtree")
    adjusted.roots.foreach(r =>
      assert(a.maxDocBytes(r) <= budget, s"root ${r.name} still over budget"))
    // a fitting schema is returned unchanged
    val (same, none) =
      SchemaConverter.enforceDocBudget(db, schema, a.maxDocBytes, DocSizeAudit.MongoDocLimit)
    assert(none.isEmpty && same === schema)
  }

  test("summary audits every root with document counts") {
    val (a, _, schema) = audit(sf)
    val rows = a.summary(schema, budgetBytes = 20000L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(rows.keySet === Set("region", "part", "lineitem"))
    assert(rows("region")._1 === 5)
    assert(rows("region")._2 === 5, "all five region docs over 20KB")
    assert(rows("part")._2 === 0, "flat part docs are tiny")
  }
}
