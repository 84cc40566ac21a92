package graft.queries

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model._
import graft.operators.Catalog
import graft.sources.Tables
import graft.workload.LogPipeline
import graft.convert.SchemaConverter
import graft.map.DataMapper

/** The full migration pipeline (SURVEY.md §3.1) wired over the fixture
  * tables: introspect → workload analysis → schema conversion → data
  * mapping. Metadata results are memoized per sfDir — the control plane
  * is driver-side and shared by several query-surface entries; the data
  * plane (the nested DataFrames) stays lazy.
  */
object MigrationPipeline {

  private val cache = TrieMap.empty[String, (DatabaseMeta, DocumentSchema)]

  // Mapped root collections, memoized per (application, sfDir, root) and
  // persisted: q24 (nested check), q26 (flattened check) and entry() all
  // consume the same region tree — without this each of them re-executes
  // the full multi-level nesting pipeline. At production scale the
  // migration output is materialized exactly once and every downstream
  // check reads the materialization; persist() is the in-session analog.
  // Keyed by applicationId so a frame never outlives its SparkContext.
  private val mapped = TrieMap.empty[(String, String, String), DataFrame]

  /** Introspect + workload + convert, memoized per scale-factor dir. */
  def converted(spark: SparkSession, sfDir: String): (DatabaseMeta, DocumentSchema) =
    cache.getOrElseUpdate(sfDir, {
      val db0 = Catalog.introspect(spark, sfDir, Tables.tpchSpec)
      // Row counts were just introspected — reuse them for the workload
      // join instead of re-counting.
      import spark.implicits._
      val rowCounts = db0.tables.map(t => (t.name, t.numOfRows))
        .toDF("table_name", "num_rows")
      val stmts = LogPipeline.statementsFromText(
        spark, Fixtures.mysqlLog, LogPipeline.MySqlLog)
      val stats = LogPipeline.workloadStats(
        LogPipeline.tableMentions(stmts), rowCounts)
      val db = LogPipeline.applyWorkload(db0, stats)
      (db, SchemaConverter.convert(db))
    })

  /** One root collection's nested DataFrame (memoized + persisted). */
  def mapRoot(spark: SparkSession, sfDir: String, rootName: String): DataFrame =
    mapped.getOrElseUpdate((spark.sparkContext.applicationId, sfDir, rootName), {
      val (db, schema) = converted(spark, sfDir)
      val root = schema.roots.find(_.name == rootName)
        .getOrElse(throw new IllegalArgumentException(s"no root $rootName"))
      new DataMapper(spark, sfDir, db).mapRoot(root).persist()
    })

  /** Flatten the converted tree to (collection, kind, parent, depth) rows
    * for the decision-procedure query surface.
    */
  def decisions(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, schema) = converted(spark, sfDir)
    def walk(n: CollectionNode, parent: Option[String], depth: Int): Seq[(String, String, Option[String], Int)] =
      (n.name, n.kind.label, parent, depth) +:
        n.embedded.flatMap(c => walk(c, Some(n.name), depth + 1))
    import spark.implicits._
    schema.roots.flatMap(r => walk(r, None, 0))
      .toDF("collection_name", "kind", "parent_name", "depth")
  }
}
