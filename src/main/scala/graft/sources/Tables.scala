package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model._

/** Source layer: reads fixture tables and declares their key metadata.
  *
  * The reference introspects `information_schema` on a live MySQL/Postgres
  * instance (server/DBMigration.js:30-91). For file-based sources there is
  * no catalog, so a [[graft.model.SchemaSpec]] declares PK/FK; catalog
  * *queries* (S6–S10 analogs) are then computed as DataFrame jobs in
  * [[graft.operators.Catalog]].
  */
object Tables {

  /** All driver-generated fixture tables (TESTDATA.md). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table. Parquet → full predicate pushdown + column
    * pruning from Catalyst; at cluster scale the same call reads a
    * partitioned directory.
    *
    * `events.parquet` carries TIMESTAMP(NANOS) which Spark only reads
    * with the nanosAsLong legacy flag (as an ns-epoch LongType column);
    * set it idempotently here so every session (driver harness, tests,
    * bench) gets it. Event queries convert ns → µs explicitly.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // lazy eviction: drop frames whose session's context is gone, so a
    // long-lived JVM cycling sessions (test suites, notebooks) does not
    // retain stopped sessions and their plans forever
    frames.keys.filter(_._1.sparkContext.isStopped).foreach(frames.remove)
    frames.getOrElseUpdate((spark, sfDir, name), {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      // Event-time contract: downstream operators do integer ns/µs math
      // on `ts` as an ns-epoch LongType. The driver fixture carries
      // TIMESTAMP(NANOS), which nanosAsLong already surfaces as that
      // long; corpora written by Spark itself (the 10× scale probe's
      // derived tables) or by ordinary µs-grain producers carry a µs
      // TIMESTAMP — LTZ or NTZ — instead. Normalize both to the same
      // ns-long here so every event operator sees one type regardless
      // of producer (NTZ wall time is interpreted in the session zone,
      // UTC everywhere in this engine, so the cast is identity).
      df.schema.find(_.name == "ts") match {
        case Some(f) if f.dataType ==
              org.apache.spark.sql.types.TimestampType ||
            f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
          // the NTZ leg converts through an LTZ cast that interprets
          // wall time in the session zone — identity only under UTC.
          // Every entrypoint in this engine pins UTC; a consumer
          // embedding the library with another zone must not get
          // silently shifted ts values, so fail loudly instead.
          if (f.dataType == org.apache.spark.sql.types.TimestampNTZType)
            require(
              spark.conf.get("spark.sql.session.timeZone") == "UTC",
              "Tables.load: TIMESTAMP_NTZ event-time normalization " +
                "requires spark.sql.session.timeZone=UTC (got " +
                s"${spark.conf.get("spark.sql.session.timeZone")})")
          df.withColumn("ts",
            org.apache.spark.sql.functions.unix_micros(
              org.apache.spark.sql.functions.col("ts")
                .cast(org.apache.spark.sql.types.TimestampType)) * 1000L)
        case _ => df
      }
    })
  }

  // Memoized source frames: every spark.read.parquet re-lists the path
  // and re-reads footers to infer the schema — pure overhead for the
  // catalog queries that touch all seven tables' schemas per run. A
  // DataFrame is an immutable plan, so sharing one per (session, dir,
  // table) is safe; keying by the session object keeps frames from
  // leaking across sessions/contexts.
  private val frames =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Declared FK graph of the TPC-H-ish fixture star schema
    * (FIXTURES.md §3): the stand-in for information_schema introspection.
    */
  val tpchSpec: SchemaSpec = SchemaSpec(
    "tpch",
    Seq(
      TableSpec("region", Seq("r_regionkey"), Seq.empty),
      TableSpec("nation", Seq("n_nationkey"),
        Seq(ForeignKeyMeta("n_regionkey", "region", "r_regionkey"))),
      TableSpec("customer", Seq("c_custkey"),
        Seq(ForeignKeyMeta("c_nationkey", "nation", "n_nationkey"))),
      TableSpec("supplier", Seq("s_suppkey"),
        Seq(ForeignKeyMeta("s_nationkey", "nation", "n_nationkey"))),
      TableSpec("part", Seq("p_partkey"), Seq.empty),
      TableSpec("orders", Seq("o_orderkey"),
        Seq(ForeignKeyMeta("o_custkey", "customer", "c_custkey"))),
      TableSpec("lineitem", Seq("l_orderkey", "l_linenumber"),
        Seq(
          ForeignKeyMeta("l_orderkey", "orders", "o_orderkey"),
          ForeignKeyMeta("l_partkey", "part", "p_partkey"),
          ForeignKeyMeta("l_suppkey", "supplier", "s_suppkey")))))

  /** Tables participating in the migration pipeline (the extension tables
    * `events`/`documents`/`embeddings` are not part of the FK graph).
    */
  def migrationTables: Seq[String] = tpchSpec.tableNames
}
