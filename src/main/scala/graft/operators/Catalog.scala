package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.sources.Tables

/** Catalog introspection as DataFrame jobs — the analogs of the catalog
  * SQL the reference issues against `INFORMATION_SCHEMA` / `pg_catalog`
  * (SURVEY.md §2.1 S6–S10; reference: server/MySQLDBManager.js:97-252,
  * server/PostgresDBManager.js:127-276). For file sources the "catalog"
  * is the declared [[SchemaSpec]] plus the Parquet footers; the *query
  * shapes* (left join, grouped count-distinct, exists-flag, ordered
  * string-agg) are reproduced natively so a JDBC catalog could be dropped
  * in unchanged.
  */
object Catalog {

  /** The declared FK edges as a DataFrame — the analog of
    * `key_column_usage` rows.
    */
  def fkEdges(spark: SparkSession, spec: SchemaSpec): DataFrame = {
    import spark.implicits._
    val rows = for {
      t <- spec.tables
      fk <- t.foreignKeys
    } yield (t.name, fk.columnName, fk.referencedTable, fk.referencedColumn)
    rows.toDF("table_name", "column_name", "referenced_table", "referenced_column")
  }

  /** The declared table list as a DataFrame — the analog of
    * `information_schema.tables`.
    */
  def tableList(spark: SparkSession, spec: SchemaSpec): DataFrame = {
    import spark.implicits._
    spec.tables.map(_.name).toDF("table_name")
  }

  /** S6 `getTableData` analog: per table, number of FK constraints and a
    * referenced-by-others flag. Reference shape: LEFT JOIN tables×keys +
    * COUNT(DISTINCT) + correlated EXISTS (server/MySQLDBManager.js:99-111,
    * server/PostgresDBManager.js:129-163). The EXISTS becomes a left-semi
    * join re-joined as a boolean flag.
    */
  def tableSummary(spark: SparkSession, spec: SchemaSpec): DataFrame = {
    val tables = tableList(spark, spec)
    val fks = fkEdges(spark, spec)
    val fkCounts = fks.groupBy("table_name")
      .agg(countDistinct("column_name").as("num_foreign_keys"))
    val referenced = fks.select(col("referenced_table").as("table_name")).distinct()
      .withColumn("is_referenced", lit(true))
    tables
      .join(fkCounts, Seq("table_name"), "left")
      .join(referenced, Seq("table_name"), "left")
      .select(
        col("table_name"),
        coalesce(col("num_foreign_keys"), lit(0L)).as("num_foreign_keys"),
        coalesce(col("is_referenced"), lit(false)).as("is_referenced"))
  }

  /** S7 `getTableRows` analog: COUNT(*) per table, as one unioned
    * DataFrame. Each leg is a metadata-only Parquet count (rowcount from
    * footers) — at cluster scale this stays O(#files), never O(rows).
    */
  def tableCounts(spark: SparkSession, sfDir: String, tables: Seq[String]): DataFrame =
    tables.map { t =>
      Tables.load(spark, sfDir, t)
        .agg(count(lit(1)).as("num_rows"))
        .select(lit(t).as("table_name"), col("num_rows"))
    }.reduce(_ unionAll _)

  /** S8 `getTableColumns` analog: ordinal-ordered comma-joined column list
    * per table (reference: GROUP_CONCAT / array_to_string(array_agg ...
    * ORDER BY ordinal_position) — server/MySQLDBManager.js:152-175,
    * server/PostgresDBManager.js:186-211). Column names come from the
    * Parquet schema; the ordered string-agg is computed as a DataFrame
    * aggregate (sorted collect over (ordinal, name) structs) to keep the
    * reference's query shape.
    */
  def tableColumns(spark: SparkSession, sfDir: String, tables: Seq[String]): DataFrame = {
    import spark.implicits._
    val rows = for {
      t <- tables
      (c, i) <- Tables.load(spark, sfDir, t).columns.zipWithIndex
    } yield (t, i + 1, c)
    rows.toDF("table_name", "ordinal", "column_name")
      .groupBy("table_name")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ordinal"), col("column_name")))),
          x => x.getField("column_name")),
        ", ").as("columns"))
  }

  /** S10 `getReferenceInfo` analog: per referenced table, the **ordered
    * distinct** comma-joined list of referencing tables
    * (GROUP_CONCAT(DISTINCT ... ORDER BY ...) —
    * server/MySQLDBManager.js:229-252, server/PostgresDBManager.js:250-276).
    */
  def referenceInfo(spark: SparkSession, spec: SchemaSpec): DataFrame =
    fkEdges(spark, spec)
      .groupBy(col("referenced_table"))
      .agg(array_join(array_sort(collect_set(col("table_name"))), ", ")
        .as("referencing_tables"))

  /** Per-column table profile — the data-shape assessment a migration
    * runs BEFORE deciding how to denormalize (nullable FK columns embed
    * differently, near-unique columns are key candidates, constant
    * columns fold into the parent): one row per column with the row
    * count, NULL count, and EXACT distinct count, computed in a single
    * pass over the table.
    *
    * Scale shape: one aggregation; the multiple exact DISTINCT
    * aggregates make Catalyst plan an Expand (input rows × #columns
    * through the partial aggregate) — the standard exact-multi-distinct
    * cost, kept here because the profile is the conversion oracle's
    * input and must be exact. At corpus scale the drop-in seam is one
    * [[graft.ext.Sketches.kmvDistinct]] pass per column (bounded
    * exchange, verifiable estimate) — the same trade the overlap audit
    * makes (x45 exact vs x46 sketch).
    * Output: (table_name, col_name, n_rows, n_nulls, n_distinct).
    */
  def profile(df: DataFrame, tableName: String): DataFrame = {
    val cols = df.columns.toSeq
    // the unpivot is assembled as a SQL string (stack has no typed
    // builder); names that could escape their quoting are rejected
    // rather than interpolated
    require(cols.nonEmpty, "profile: the table has no columns")
    require(cols.forall(c => !c.contains("'") && !c.contains("`")),
      "profile: column names must not contain quote characters")
    // backtick-quoted references: a bare col("a.b") would parse as a
    // struct path; backticks in names are rejected above, so quoting is
    // always safe. count(when(...)), not sum(...): SUM over zero rows
    // is NULL and an empty table must profile as n_nulls = 0, like the
    // oracle's count(*) - count(c).
    val aggs =
      count(lit(1)).as("__rows") +:
      cols.flatMap(c => Seq(
        count(when(col(s"`$c`").isNull, lit(1))).as(s"__nulls_$c"),
        countDistinct(col(s"`$c`")).as(s"__nd_$c")))
    val stackArgs = cols.map(c =>
      s"'$c', __rows, `__nulls_$c`, `__nd_$c`").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(lit(tableName).as("table_name"),
        expr(s"stack(${cols.size}, $stackArgs) " +
          "AS (col_name, n_rows, n_nulls, n_distinct)"))
      .select(col("table_name"), col("col_name"), col("n_rows"),
        col("n_nulls"), col("n_distinct"))
  }

  /** Full introspection: builds the driver-side [[DatabaseMeta]] the
    * conversion algorithm consumes (analog of
    * server/DBMigration.js:30-91). Row counts and column lists come from
    * the distributed layer; everything else from the declared spec.
    */
  def introspect(spark: SparkSession, sfDir: String, spec: SchemaSpec): DatabaseMeta = {
    val counts = tableCounts(spark, sfDir, spec.tableNames)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val referencedBy: Map[String, Seq[String]] = spec.tables
      .flatMap(t => t.foreignKeys.map(fk => fk.referencedTable -> t.name))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.sorted }
    val metas = spec.tables.map { t =>
      TableMeta(
        name = t.name,
        numOfRows = counts.getOrElse(t.name, 0L),
        columns = Tables.load(spark, sfDir, t.name).columns.toSeq,
        primaryKeys = t.primaryKeys,
        foreignKeys = t.foreignKeys,
        isReferenced = referencedBy.contains(t.name),
        referencingTables = referencedBy.getOrElse(t.name, Seq.empty))
    }
    DatabaseMeta(spec.name, metas)
  }
}
