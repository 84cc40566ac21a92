package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, ExtQueries, MigrationPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (SURVEY.md §2 + §2.11
  * extensions); each entry with DuckDB-expressible semantics has matching
  * `oracleSql` (identical column names/types — the driver hash-compares).
  */
object SparkEntry {

  private def allDefs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    CoreQueries.defs ++ ExtQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full migration pipeline: introspection → workload analysis →
    * schema conversion → nested document mapping of the `region` root
    * (region → nation → {customer → orders, supplier}).
    */
  def entry(spark: SparkSession): DataFrame =
    MigrationPipeline.mapRoot(spark, "/root/testdata/sf0.001", "region")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (nested document schemas) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
