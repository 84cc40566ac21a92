package graft.workload

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.DatabaseMeta

/** The query-log workload analysis (SURVEY.md §3.2) — the one genuinely
  * analytics-flavored pipeline in the reference
  * (server/LogManager.js:4-100): split the raw DBMS log into statements,
  * keep DML/DDL, extract per-statement table references, and aggregate
  * per-table access frequencies weighted by table row count.
  *
  * Spark shape: `read.text(wholetext)` → per-file record-split flatMap
  * (record boundaries are multi-line, so the file must NOT be naively
  * line-split; sharding a huge log means cutting at record-start
  * boundaries first) → native `regexp_*` classification/extraction
  * (codegen'd — no UDFs in the hot path) → `explode` → broadcast join
  * with the tiny table-metadata frame → one `groupBy(table)` shuffle.
  */
object LogPipeline {

  sealed trait Dialect
  case object MySqlLog extends Dialect
  case object PostgresLog extends Dialect

  // L1 — MySQL general-query-log records: an optional `yymmdd h:mm:ss`
  // timestamp, a thread id, a command word (Connect|Query|Quit|...), then
  // a body running to the next record header (possibly multi-line).
  // Analog of server/LogManager.js:13-31.
  private val mysqlCommands =
    "Connect|Query|Quit|Init DB|Field List|Prepare|Execute|Close stmt|Statistics|Change user|Refresh|Shutdown"
  private val mysqlRecord =
    s"""(?s)(?:\\d{6}\\s+\\d{1,2}:\\d{2}:\\d{2})?[ \\t]*(\\d+)[ \\t]+($mysqlCommands)[ \\t]*(.*?)(?=\\n(?:\\d{6}\\s+\\d{1,2}:\\d{2}:\\d{2})?[ \\t]*\\d+[ \\t]+(?:$mysqlCommands)\\b|\\z)""".r

  // L2 — Postgres log records: `yyyy-mm-dd hh:mm:ss.SSS +zz [pid] LOG:
  // statement: <body possibly spanning lines>`. Analog of
  // server/LogManager.js:33-47.
  private val pgRecord =
    """(?s)\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d+ \S+ \[\d+\] (?:LOG|STATEMENT):\s+(?:statement:\s+)?(.*?)(?=\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d+ \S+ \[\d+\]|\z)""".r

  /** Record-split one log file's whole text into raw statement bodies
    * (whitespace collapsed + trimmed, as the reference does —
    * server/LogManager.js:24). MySQL keeps only `Query` records.
    */
  def splitRecords(text: String, dialect: Dialect): Seq[String] = {
    val bodies = dialect match {
      case MySqlLog =>
        mysqlRecord.findAllMatchIn(text)
          .filter(_.group(2).trim.equalsIgnoreCase("Query"))
          .map(_.group(3)).toSeq
      case PostgresLog =>
        pgRecord.findAllMatchIn(text).map(_.group(1)).toSeq
    }
    bodies.map(_.replaceAll("\\s+", " ").trim).filter(_.nonEmpty)
  }

  /** Statements of one or more whole log files as a Dataset. Parallelism
    * is per file (wholetext read), record-splitting runs on executors.
    */
  def statements(spark: SparkSession, path: String, dialect: Dialect): Dataset[String] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .as[String].flatMap(splitRecords(_, dialect))
  }

  /** Statements from in-memory text (fixtures/tests). */
  def statementsFromText(spark: SparkSession, text: String, dialect: Dialect): Dataset[String] = {
    import spark.implicits._
    spark.createDataset(Seq(text)).flatMap(splitRecords(_, dialect))
  }

  /** P6 — keep statements starting select|insert|update|delete|create
    * (case-insensitive; server/LogManager.js:25,:42) and classify by
    * leading keyword (the reference takes the type from its SQL parser;
    * the leading keyword is equivalent for these five).
    * Output: (stmt_type, stmt).
    */
  def classify(stmts: Dataset[String]): DataFrame =
    stmts.toDF("stmt")
      .filter(col("stmt").rlike("(?i)^(select|insert|update|delete|create)\\b"))
      .select(
        lower(regexp_extract(col("stmt"), "(?i)^(\\w+)", 1)).as("stmt_type"),
        col("stmt"))

  // L3 — table references: identifiers following FROM / JOIN / INTO /
  // UPDATE (+ CREATE TABLE), optionally backtick/double-quote wrapped,
  // optionally db-qualified. Analog of the reference's
  // node-sql-parser.tableList (server/LogManager.js:53-75): one distinct
  // (statement, type, table) mention per statement; statements yielding
  // no tables are skipped (the reference swallows parse errors —
  // server/LogManager.js:69-71).
  private val tableRefPattern =
    "(?i)\\b(?:from|join|into|update|create\\s+table(?:\\s+if\\s+not\\s+exists)?)\\s+[`\"]?(?:\\w+[`\"]?\\.[`\"]?)?(\\w+)[`\"]?"

  /** Per-statement distinct table mentions: (stmt_type, table_name). */
  def tableMentions(stmts: Dataset[String]): DataFrame =
    classify(stmts)
      .select(
        col("stmt_type"),
        explode(array_distinct(
          regexp_extract_all(col("stmt"), lit(tableRefPattern), lit(1))))
          .as("table_name"))
      .select(col("stmt_type"), lower(col("table_name")).as("table_name"))

  /** A5 — per-table workload counters: every mention adds the table's row
    * count to gaf; insert/update/delete mentions also add it to uaf
    * (server/models/Table.js:30-36, server/LogManager.js:77-100).
    * `rowCounts` is (table_name, num_rows) — tiny, broadcast.
    */
  def workloadStats(mentions: DataFrame, rowCounts: DataFrame): DataFrame =
    mentions
      .join(broadcast(rowCounts), Seq("table_name"), "inner")
      .groupBy("table_name")
      .agg(
        sum(col("num_rows")).as("gaf"),
        sum(when(col("stmt_type").isin("insert", "update", "delete"),
          col("num_rows")).otherwise(0L)).as("uaf"))

  /** Fold the computed stats back into the driver-side metadata (the
    * reference mutates its Table objects in place —
    * server/LogManager.js:86-99), including the A6 global threshold
    * maf = 0.0125 × Σ gaf (server/models/RelationalDatabase.js:17-24).
    */
  def applyWorkload(db: DatabaseMeta, stats: DataFrame): DatabaseMeta = {
    val byTable = stats.collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val tables = db.tables.map { t =>
      val (g, u) = byTable.getOrElse(t.name, (0L, 0L))
      t.copy(gaf = g, uaf = u)
    }
    db.copy(tables = tables, maf = tables.map(_.gaf).sum * 0.0125)
  }
}
