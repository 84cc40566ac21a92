package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Catalog, Embedding}
import graft.sources.Tables
import graft.workload.LogPipeline

/** The reference-surface query inventory (SURVEY.md §2): one entry per
  * operator family, each paired with DuckDB oracle SQL over the same
  * Parquet tables. Column names are aliased identically on both sides
  * (the driver's compare sorts columns by name before hashing).
  *
  * Determinism notes (the oracle is hash-compared, so bit-equality
  * matters):
  *   - Sums of doubles are order-dependent under parallelism, so every
  *     floating aggregate is computed as an exact DECIMAL sum cast back
  *     to DOUBLE — identical in both engines regardless of partitioning.
  *   - Temporal outputs are formatted to strings (parquet timestamp
  *     nuances differ between readers).
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact decimal sum of a double expression, surfaced as DOUBLE. */
  private def dsum(e: Column): Column =
    sum(e.cast("decimal(28,10)")).cast("double")

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // ---- A1/A4-family: grouped aggregation over the fact table --------
    ("q01_pricing_summary",
      (s: SparkSession, dir: String) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sum_base_price,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS sum_disc_price,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- S7/A1: COUNT(*) per table (metadata-only parquet counts) -----
    ("q02_table_counts",
      (s: SparkSession, dir: String) => Catalog.tableCounts(s, dir, Tables.all),
      Some(Tables.all.map(n => s"SELECT '$n' AS table_name, count(*) AS num_rows FROM $n")
        .mkString("\nUNION ALL\n"))),

    // ---- S6: per-table FK count + referenced-by flag ------------------
    ("q03_catalog_fk_summary",
      (s: SparkSession, dir: String) => Catalog.tableSummary(s, Tables.tpchSpec),
      Some("""SELECT * FROM (VALUES
             |  ('region',   CAST(0 AS BIGINT), true),
             |  ('nation',   CAST(1 AS BIGINT), true),
             |  ('customer', CAST(1 AS BIGINT), true),
             |  ('supplier', CAST(1 AS BIGINT), true),
             |  ('part',     CAST(0 AS BIGINT), true),
             |  ('orders',   CAST(1 AS BIGINT), true),
             |  ('lineitem', CAST(3 AS BIGINT), false)
             |) AS t(table_name, num_foreign_keys, is_referenced)""".stripMargin)),

    // ---- S8: ordinal-ordered column list per table --------------------
    ("q04_catalog_columns",
      (s: SparkSession, dir: String) =>
        Catalog.tableColumns(s, dir, Tables.tpchSpec.tableNames),
      Some("""SELECT * FROM (VALUES
             |  ('region', 'r_regionkey, r_name'),
             |  ('nation', 'n_nationkey, n_name, n_regionkey'),
             |  ('customer', 'c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment'),
             |  ('supplier', 's_suppkey, s_name, s_nationkey, s_acctbal'),
             |  ('part', 'p_partkey, p_name, p_brand, p_type, p_size, p_retailprice'),
             |  ('orders', 'o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority'),
             |  ('lineitem', 'l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate')
             |) AS t(table_name, columns)""".stripMargin)),

    // ---- S10/A3: ordered distinct string-agg of referencing tables ----
    ("q05_catalog_refs",
      (s: SparkSession, dir: String) => Catalog.referenceInfo(s, Tables.tpchSpec),
      Some("""SELECT * FROM (VALUES
             |  ('region', 'nation'),
             |  ('nation', 'customer, supplier'),
             |  ('customer', 'orders'),
             |  ('supplier', 'lineitem'),
             |  ('part', 'lineitem'),
             |  ('orders', 'lineitem')
             |) AS t(referenced_table, referencing_tables)""".stripMargin)),

    // ---- P1: equi-filter scan (pushed to parquet) ---------------------
    ("q06_filter_eq",
      (s: SparkSession, dir: String) =>
        t(s, dir, "customer").filter(col("c_mktsegment") === lit("BUILDING")),
      Some("SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'")),

    // ---- P3: referencing-collection FK rename (values unchanged) ------
    ("q07_fk_ref_rename",
      (s: SparkSession, dir: String) =>
        Embedding.renameFkRefs(t(s, dir, "lineitem"),
          Tables.tpchSpec("lineitem").foreignKeys.map(_.columnName))
          .select("l_orderkey_REF", "l_partkey_REF", "l_suppkey_REF",
            "l_linenumber", "l_quantity", "l_returnflag"),
      Some("""SELECT l_orderkey AS "l_orderkey_REF", l_partkey AS "l_partkey_REF",
             |  l_suppkey AS "l_suppkey_REF", l_linenumber, l_quantity, l_returnflag
             |FROM lineitem""".stripMargin)),

    // ---- P2/P4: column drop / projection by attribute list ------------
    ("q08_project_prune",
      (s: SparkSession, dir: String) =>
        t(s, dir, "nation").drop("n_regionkey"),
      Some("SELECT n_nationkey, n_name FROM nation")),

    // ---- L5 inside the migration: normalizing-loader parity mode ------
    // The reference formats every date value to an Asia/Bangkok
    // "YYYY-MM-DD" string AT LOAD TIME, inside the migration data path
    // (server/MySQLDBManager.js:268-276) — not as a post-step. This runs
    // the lineitem referencing collection through the DataMapper with
    // the normalizing loader plugged into its scan seam, so the FK→_REF
    // rename and the date normalization compose exactly as the
    // reference's loader does. (x16 covers the operator standalone.)
    ("q09_migrate_normalized_dates",
      (s: SparkSession, dir: String) => {
        val (db, schema) = MigrationPipeline.converted(s, dir)
        new graft.map.DataMapper(s, dir, db,
          graft.sinks.JsonSink.normalizingLoader(Tables.load))
          .mapRoot(schema.roots.find(_.name == "lineitem").get)
      },
      Some("""SELECT l_orderkey AS "l_orderkey_REF", l_partkey AS "l_partkey_REF",
             |  l_suppkey AS "l_suppkey_REF", l_linenumber, l_quantity, l_extendedprice,
             |  l_discount, l_tax, l_returnflag, l_linestatus,
             |  strftime(l_shipdate + INTERVAL 7 HOUR, '%Y-%m-%d') AS l_shipdate
             |FROM lineitem""".stripMargin)),

    // ---- J4: left outer join ------------------------------------------
    ("q10_join_left",
      (s: SparkSession, dir: String) => {
        val n = t(s, dir, "nation"); val r = t(s, dir, "region")
        n.join(r, n("n_regionkey") === r("r_regionkey"), "left")
          .select(col("n_nationkey"), col("n_name"), col("r_name"))
      },
      Some("""SELECT n_nationkey, n_name, r_name
             |FROM nation LEFT JOIN region ON n_regionkey = r_regionkey""".stripMargin)),

    // ---- J5: EXISTS as left-semi join ---------------------------------
    ("q11_semi_join",
      (s: SparkSession, dir: String) => {
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)),

    // ---- J6/A2: multi-way equi join + grouped aggregation -------------
    ("q12_join_agg_3way",
      (s: SparkSession, dir: String) => {
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT n_name,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin)),

    // ---- J1: one-way embedding, verified flattened --------------------
    // Builds the real nested array-of-structs then explodes it back; the
    // oracle is the equivalent flat LEFT JOIN, so the collect_list
    // pipeline's content (not just its count) is hash-checked.
    ("q13_embed_oneway_flat",
      (s: SparkSession, dir: String) => {
        val nested = Embedding.oneWayEmbed(
          t(s, dir, "region"), "r_regionkey",
          t(s, dir, "nation"), "n_regionkey", "nations", Seq("n_nationkey"))
        nested.select(col("r_regionkey"), col("r_name"),
            explode_outer(col("nations")).as("n"))
          .select(col("r_regionkey"), col("r_name"),
            col("n.n_nationkey").as("n_nationkey"), col("n.n_name").as("n_name"))
      },
      Some("""SELECT r_regionkey, r_name, n_nationkey, n_name
             |FROM region LEFT JOIN nation ON n_regionkey = r_regionkey""".stripMargin)),

    // ---- J2: two-way embedding (junction + other-parent inlining),
    // verified flattened ------------------------------------------------
    ("q14_embed_twoway_flat",
      (s: SparkSession, dir: String) => {
        val nested = Embedding.twoWayEmbed(
          t(s, dir, "orders"), "o_orderkey",
          t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
          t(s, dir, "part"), "p_partkey", "items", Seq("l_linenumber"))
        nested.select(col("o_orderkey"), col("o_orderstatus"),
            explode_outer(col("items")).as("it"))
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("it.l_linenumber").as("l_linenumber"),
            col("it.l_quantity").as("l_quantity"),
            col("it.l_suppkey").as("l_suppkey"),
            col("it.p_name").as("p_name"),
            col("it.p_brand").as("p_brand"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, l_linenumber, l_quantity, l_suppkey, p_name, p_brand
             |FROM orders LEFT JOIN (
             |  SELECT * FROM lineitem JOIN part ON l_partkey = p_partkey
             |) x ON x.l_orderkey = o_orderkey""".stripMargin)),

    // ---- J1 skew path: salted two-phase nesting, same contract --------
    // Must hash-match the same oracle as q13: the salted merge is an
    // execution strategy, not a semantics change.
    ("q15_embed_salted_flat",
      (s: SparkSession, dir: String) => {
        val nested = Embedding.oneWayEmbedSalted(
          t(s, dir, "region"), "r_regionkey",
          t(s, dir, "nation"), "n_regionkey", "nations", Seq("n_nationkey"), salts = 4)
        nested.select(col("r_regionkey"), col("r_name"),
            explode_outer(col("nations")).as("n"))
          .select(col("r_regionkey"), col("r_name"),
            col("n.n_nationkey").as("n_nationkey"), col("n.n_name").as("n_name"))
      },
      Some("""SELECT r_regionkey, r_name, n_nationkey, n_name
             |FROM region LEFT JOIN nation ON n_regionkey = r_regionkey""".stripMargin)),

    // ---- A3: ordered string aggregation over data ---------------------
    ("q16_string_agg",
      (s: SparkSession, dir: String) => {
        val n = t(s, dir, "nation"); val r = t(s, dir, "region")
        n.join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(array_join(array_sort(collect_set(col("n_name"))), ", ").as("nations"))
      },
      Some("""SELECT r_name, string_agg(DISTINCT n_name, ', ' ORDER BY n_name) AS nations
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name""".stripMargin)),

    // ---- A2: COUNT(DISTINCT) grouped ----------------------------------
    ("q17_count_distinct",
      (s: SparkSession, dir: String) =>
        t(s, dir, "orders").groupBy(col("o_orderstatus"))
          .agg(countDistinct(col("o_custkey")).as("n_cust"),
            count(lit(1)).as("n_orders")),
      Some("""SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
             |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // ---- L1+L3+A5: the workload pipeline end-to-end -------------------
    // Statements parsed from the MySQL-dialect fixture log; mentions of
    // unknown tables (tmp_report) drop at the metadata join; gaf/uaf are
    // row-count-weighted. The oracle hardcodes the expected parse (it is
    // deterministic) but recomputes the weights from the live tables.
    ("q18_workload_stats",
      (s: SparkSession, dir: String) => {
        val stmts = LogPipeline.statementsFromText(
          s, Fixtures.mysqlLog, LogPipeline.MySqlLog)
        // Row counts come from the memoized introspection pass (q02
        // demonstrates the distributed count operator itself); keeping
        // this plan small matters because the workload join is
        // metadata-sized, not data-sized.
        import s.implicits._
        val (db, _) = MigrationPipeline.converted(s, dir)
        val counts = db.tables.map(t => (t.name, t.numOfRows))
          .toDF("table_name", "num_rows")
        LogPipeline.workloadStats(LogPipeline.tableMentions(stmts), counts)
      },
      Some("""WITH mentions(stmt_type, table_name) AS (VALUES
             |  ('select','lineitem'),('select','lineitem'),('select','orders'),
             |  ('select','orders'),('select','customer'),('select','customer'),
             |  ('select','nation'),('select','region'),('select','supplier'),
             |  ('select','part'),('update','customer'),('update','nation'),
             |  ('insert','part'),('delete','part'),('create','tmp_report'),
             |  ('create','lineitem')),
             |counts AS (
             |  SELECT 'region' AS table_name, count(*) AS num_rows FROM region
             |  UNION ALL SELECT 'nation', count(*) FROM nation
             |  UNION ALL SELECT 'customer', count(*) FROM customer
             |  UNION ALL SELECT 'supplier', count(*) FROM supplier
             |  UNION ALL SELECT 'part', count(*) FROM part
             |  UNION ALL SELECT 'orders', count(*) FROM orders
             |  UNION ALL SELECT 'lineitem', count(*) FROM lineitem)
             |SELECT m.table_name,
             |  CAST(sum(num_rows) AS BIGINT) AS gaf,
             |  CAST(sum(CASE WHEN stmt_type IN ('insert','update','delete')
             |    THEN num_rows ELSE 0 END) AS BIGINT) AS uaf
             |FROM mentions m JOIN counts c USING (table_name)
             |GROUP BY m.table_name""".stripMargin)),

    // ---- A6: the global MAF threshold scalar --------------------------
    ("q19_maf",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        val (db, _) = MigrationPipeline.converted(s, dir)
        Seq(db.maf).toDF("maf")
      },
      Some("""WITH mentions(stmt_type, table_name) AS (VALUES
             |  ('select','lineitem'),('select','lineitem'),('select','orders'),
             |  ('select','orders'),('select','customer'),('select','customer'),
             |  ('select','nation'),('select','region'),('select','supplier'),
             |  ('select','part'),('update','customer'),('update','nation'),
             |  ('insert','part'),('delete','part'),('create','tmp_report'),
             |  ('create','lineitem')),
             |counts AS (
             |  SELECT 'region' AS table_name, count(*) AS num_rows FROM region
             |  UNION ALL SELECT 'nation', count(*) FROM nation
             |  UNION ALL SELECT 'customer', count(*) FROM customer
             |  UNION ALL SELECT 'supplier', count(*) FROM supplier
             |  UNION ALL SELECT 'part', count(*) FROM part
             |  UNION ALL SELECT 'orders', count(*) FROM orders
             |  UNION ALL SELECT 'lineitem', count(*) FROM lineitem)
             |SELECT CAST(sum(num_rows) AS BIGINT) * CAST(0.0125 AS DOUBLE) AS maf
             |FROM mentions m JOIN counts c USING (table_name)""".stripMargin)),

    // ---- §2.8: the conversion decision procedure ----------------------
    ("q20_conversion_decisions",
      (s: SparkSession, dir: String) => MigrationPipeline.decisions(s, dir),
      Some("""SELECT * FROM (VALUES
             |  ('region',   'root',             CAST(NULL AS VARCHAR), 0),
             |  ('nation',   'one_way_embedded', 'region',   1),
             |  ('customer', 'one_way_embedded', 'nation',   2),
             |  ('orders',   'one_way_embedded', 'customer', 3),
             |  ('supplier', 'one_way_embedded', 'nation',   2),
             |  ('part',     'root',             CAST(NULL AS VARCHAR), 0),
             |  ('lineitem', 'referencing',      CAST(NULL AS VARCHAR), 0)
             |) AS t(collection_name, kind, parent_name, depth)""".stripMargin)),

    // ---- L1/P6: MySQL-dialect log record split + classification -------
    ("q21_log_parse_mysql",
      (s: SparkSession, dir: String) =>
        LogPipeline.classify(LogPipeline.statementsFromText(
          s, Fixtures.mysqlLog, LogPipeline.MySqlLog)),
      Some("""SELECT * FROM (VALUES
             |  ('select', 'SELECT * FROM lineitem WHERE l_quantity > 30'),
             |  ('select', 'SELECT l_orderkey, o_totalprice FROM lineitem JOIN orders ON l_orderkey = o_orderkey'),
             |  ('select', 'SELECT * FROM orders JOIN customer ON o_custkey = c_custkey'),
             |  ('select', 'SELECT c_name, n_name, r_name FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey'),
             |  ('select', 'SELECT * FROM supplier'),
             |  ('select', 'SELECT * FROM part'),
             |  ('update', 'UPDATE customer SET c_acctbal = 0 WHERE c_custkey = 7'),
             |  ('update', 'UPDATE nation SET n_name = ''X'' WHERE n_nationkey = 3'),
             |  ('insert', 'INSERT INTO part VALUES (99999, ''widget'', ''B#1'', ''TYPE'', 1, 9.99)'),
             |  ('delete', 'DELETE FROM part WHERE p_partkey = 99999'),
             |  ('create', 'CREATE TABLE tmp_report AS SELECT l_orderkey FROM lineitem')
             |) AS t(stmt_type, stmt)""".stripMargin)),

    // ---- L2: Postgres-dialect log record split ------------------------
    ("q22_log_parse_pg",
      (s: SparkSession, dir: String) =>
        LogPipeline.classify(LogPipeline.statementsFromText(
          s, Fixtures.postgresLog, LogPipeline.PostgresLog)),
      Some("""SELECT * FROM (VALUES
             |  ('select', 'SELECT o_orderkey, c_name FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey'),
             |  ('update', 'UPDATE part SET p_retailprice = 19 WHERE p_partkey = 2'),
             |  ('select', 'SELECT * FROM ghost'),
             |  ('delete', 'DELETE FROM lineitem WHERE l_orderkey = 1')
             |) AS t(stmt_type, stmt)""".stripMargin)),

    // ---- L3: per-statement table-reference extraction -----------------
    ("q23_log_mentions",
      (s: SparkSession, dir: String) =>
        LogPipeline.tableMentions(LogPipeline.statementsFromText(
          s, Fixtures.mysqlLog, LogPipeline.MySqlLog)),
      Some("""SELECT * FROM (VALUES
             |  ('select','lineitem'),('select','lineitem'),('select','orders'),
             |  ('select','orders'),('select','customer'),('select','customer'),
             |  ('select','nation'),('select','region'),('select','supplier'),
             |  ('select','part'),('update','customer'),('update','nation'),
             |  ('insert','part'),('delete','part'),('create','tmp_report'),
             |  ('create','lineitem')
             |) AS t(stmt_type, table_name)""".stripMargin)),

    // ---- §3.1 end-to-end: the region root collection, nested ----------
    // 4-level document tree: region → nation → {customer → orders,
    // supplier}, built by the real migration pipeline and then serialized
    // to ONE deterministic string per region so the nested content —
    // every level, every attribute, every array ordering — is
    // hash-checkable against a DuckDB oracle of correlated ordered
    // string_aggs. (The truly-nested frame stays on `entry()`; round 1
    // registered it here raw, and the harness' rows-only check choked on
    // sorting an array-of-structs column.) Serialization choices that
    // make bit-parity possible: money columns scaled to integer cents
    // (`round(x*100)` — fixture prices are exact 2-decimal values, so no
    // rounding ties exist and float→string formatting differences never
    // arise) and timestamps via date_format/strftime.
    ("q24_migrate_region_nested",
      (s: SparkSession, dir: String) => {
        val nested = MigrationPipeline.mapRoot(s, dir, "region")
        val cents = (c: Column) => round(c * 100).cast("long")
        val arr = (c: Column) => concat(lit("["), coalesce(c, lit("")), lit("]"))
        val orderSer = (o: Column) => concat_ws(",",
          o.getField("o_orderkey"), o.getField("o_orderstatus"),
          cents(o.getField("o_totalprice")),
          date_format(o.getField("o_orderdate"), "yyyy-MM-dd"),
          o.getField("o_orderpriority"))
        val custSer = (c: Column) => concat_ws(",",
          c.getField("c_custkey"), c.getField("c_name"),
          cents(c.getField("c_acctbal")), c.getField("c_mktsegment"),
          arr(array_join(transform(c.getField("orders"), orderSer), ";")))
        val supSer = (c: Column) => concat_ws(",",
          c.getField("s_suppkey"), c.getField("s_name"),
          cents(c.getField("s_acctbal")))
        val natSer = (n: Column) => concat_ws("|",
          n.getField("n_nationkey"), n.getField("n_name"),
          arr(array_join(transform(n.getField("customer"), custSer), ";")),
          arr(array_join(transform(n.getField("supplier"), supSer), ";")))
        nested.select(col("r_regionkey"), col("r_name"),
          arr(array_join(transform(col("nation"), natSer), "~")).as("doc"))
      },
      Some("""SELECT r_regionkey, r_name,
             |  '[' || coalesce((
             |    SELECT string_agg(
             |      n.n_nationkey || '|' || n.n_name || '|[' ||
             |        coalesce((
             |          SELECT string_agg(
             |            c.c_custkey || ',' || c.c_name || ',' ||
             |              CAST(round(c.c_acctbal * 100) AS BIGINT) || ',' || c.c_mktsegment || ',[' ||
             |              coalesce((
             |                SELECT string_agg(
             |                  o.o_orderkey || ',' || o.o_orderstatus || ',' ||
             |                    CAST(round(o.o_totalprice * 100) AS BIGINT) || ',' ||
             |                    strftime(o.o_orderdate, '%Y-%m-%d') || ',' || o.o_orderpriority,
             |                  ';' ORDER BY o.o_orderkey)
             |                FROM orders o WHERE o.o_custkey = c.c_custkey), '') || ']',
             |            ';' ORDER BY c.c_custkey)
             |          FROM customer c WHERE c.c_nationkey = n.n_nationkey), '') || ']|[' ||
             |        coalesce((
             |          SELECT string_agg(
             |            s.s_suppkey || ',' || s.s_name || ',' || CAST(round(s.s_acctbal * 100) AS BIGINT),
             |            ';' ORDER BY s.s_suppkey)
             |          FROM supplier s WHERE s.s_nationkey = n.n_nationkey), '') || ']',
             |      '~' ORDER BY n.n_nationkey)
             |    FROM nation n WHERE n.n_regionkey = r.r_regionkey), '') || ']' AS doc
             |FROM region r""".stripMargin)),

    // ---- the lineitem referencing collection (P3 applied by pipeline) -
    ("q25_migrate_lineitem_ref",
      (s: SparkSession, dir: String) => {
        MigrationPipeline.mapRoot(s, dir, "lineitem")
          .withColumn("l_shipdate_str",
            date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss"))
          .drop("l_shipdate")
      },
      Some("""SELECT l_orderkey AS "l_orderkey_REF", l_partkey AS "l_partkey_REF",
             |  l_suppkey AS "l_suppkey_REF", l_linenumber, l_quantity, l_extendedprice,
             |  l_discount, l_tax, l_returnflag, l_linestatus,
             |  strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS l_shipdate_str
             |FROM lineitem""".stripMargin)),

    // ---- OLAP breadth: filtered scan-aggregate (TPC-H Q6 shape) -------
    // Every predicate reaches the parquet scan (PushedFilters); the
    // whole query is one scan + one scalar aggregate.
    ("q27_filtered_agg",
      (s: SparkSession, dir: String) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
          .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
            count(lit(1)).as("n_rows")),
      Some("""SELECT
             |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
             |  count(*) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1994-01-01'
             |  AND l_shipdate < TIMESTAMP '1995-01-01'
             |  AND l_discount >= 0.05 AND l_discount <= 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // ---- OLAP breadth: window top-k per group -------------------------
    ("q28_window_topk",
      (s: SparkSession, dir: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("o_orderpriority"), col("rank"), col("o_orderkey"),
            col("o_totalprice"))
      },
      Some("""SELECT o_orderpriority, CAST(rnk AS INTEGER) AS "rank", o_orderkey, o_totalprice
             |FROM (SELECT *, row_number() OVER
             |        (PARTITION BY o_orderpriority
             |         ORDER BY o_totalprice DESC, o_orderkey) AS rnk
             |      FROM orders) x
             |WHERE rnk <= 3""".stripMargin)),

    // ---- custom operator: heap-based top-k per group ------------------
    // Same semantics and oracle as q28, executed by the custom
    // LogicalPlan + Strategy + SparkPlan (graft.plans.TopKPerGroup):
    // bounded per-group heaps after one clustering shuffle, no sort.
    ("q30_topk_custom_op",
      (s: SparkSession, dir: String) =>
        graft.plans.TopKPerGroup.topK(t(s, dir, "orders"),
          Seq("o_orderpriority"),
          Seq("o_totalprice" -> graft.plans.TopKPerGroup.Desc,
            "o_orderkey" -> graft.plans.TopKPerGroup.Asc), 3)
          .select(col("o_orderpriority"), col("rank"), col("o_orderkey"),
            col("o_totalprice")),
      Some("""SELECT o_orderpriority, CAST(rnk AS INTEGER) AS "rank", o_orderkey, o_totalprice
             |FROM (SELECT *, row_number() OVER
             |        (PARTITION BY o_orderpriority
             |         ORDER BY o_totalprice DESC, o_orderkey) AS rnk
             |      FROM orders) x
             |WHERE rnk <= 3""".stripMargin)),

    // ---- OLAP breadth: temporal rollup --------------------------------
    ("q29_orders_by_month",
      (s: SparkSession, dir: String) =>
        t(s, dir, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("total_price")),
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
             |  count(*) AS n_orders,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE) AS total_price
             |FROM orders GROUP BY 1""".stripMargin)),

    // ---- flattened hash-check of the nested migration output ----------
    ("q26_migrate_flat_check",
      (s: SparkSession, dir: String) => {
        val nested = MigrationPipeline.mapRoot(s, dir, "region")
        nested.select(col("r_regionkey"), col("r_name"),
            explode_outer(col("nation")).as("n"))
          .select(col("r_regionkey"), col("r_name"),
            col("n.n_nationkey").as("n_nationkey"), col("n.n_name").as("n_name"),
            explode_outer(col("n.customer")).as("c"))
          .select(col("r_regionkey"), col("r_name"), col("n_nationkey"), col("n_name"),
            col("c.c_custkey").as("c_custkey"), col("c.c_name").as("c_name"),
            col("c.c_acctbal").as("c_acctbal"),
            col("c.c_mktsegment").as("c_mktsegment"),
            when(col("c").isNull, lit(null))
              .otherwise(size(coalesce(col("c.orders"), array())))
              .cast("long").as("n_orders"))
      },
      Some("""SELECT r_regionkey, r_name, n_nationkey, n_name, c_custkey, c_name,
             |  c_acctbal, c_mktsegment,
             |  CASE WHEN c.c_custkey IS NULL THEN NULL
             |       ELSE (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) END AS n_orders
             |FROM region
             |LEFT JOIN nation ON n_regionkey = r_regionkey
             |LEFT JOIN customer c ON c_nationkey = n_nationkey""".stripMargin))
  )
}
