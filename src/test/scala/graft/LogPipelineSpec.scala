package graft

import graft.workload.LogPipeline
import graft.workload.LogPipeline.{MySqlLog, PostgresLog}
import graft.queries.Fixtures

class LogPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("MySQL record split keeps Query bodies only, collapses whitespace, spans lines") {
    val stmts = LogPipeline.splitRecords(Fixtures.mysqlLog, MySqlLog)
    assert(stmts.length === 12) // 11 DML/DDL + 1 SET (filtered later)
    assert(stmts(1) ===
      "SELECT l_orderkey, o_totalprice FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
    assert(!stmts.exists(_.startsWith("root@")), "Connect bodies dropped")
  }

  test("Postgres record split handles multi-line statements and skips ERROR records") {
    val stmts = LogPipeline.splitRecords(Fixtures.postgresLog, PostgresLog)
    assert(stmts.length === 4)
    assert(stmts.head ===
      "SELECT o_orderkey, c_name FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey")
    assert(!stmts.exists(_.contains("does not exist")), "ERROR record not a statement")
  }

  test("classify keeps only DML/DDL and types by leading keyword") {
    val out = LogPipeline.classify(
      LogPipeline.statementsFromText(spark, Fixtures.mysqlLog, MySqlLog))
      .as[(String, String)].collect()
    assert(out.length === 11, "SET statement filtered out")
    assert(out.map(_._1).toSet === Set("select", "insert", "update", "delete", "create"))
  }

  test("tableMentions extracts distinct per-statement refs incl. db-qualified and quoted") {
    val stmts = spark.createDataset(Seq(
      "SELECT * FROM db1.orders o JOIN `customer` c ON 1=1 JOIN orders ON 1=1",
      "gibberish that parses to nothing"))
    val out = LogPipeline.tableMentions(stmts).as[(String, String)].collect()
    assert(out.toSet === Set(("select", "orders"), ("select", "customer")),
      "dedup within statement; unparseable statement skipped")
  }

  test("workload stats weight mentions by row count; DML feeds uaf") {
    val mentions = Seq(("select", "t1"), ("select", "t1"), ("update", "t1"),
      ("insert", "t2"), ("select", "ghost")).toDF("stmt_type", "table_name")
    val counts = Seq(("t1", 100L), ("t2", 7L)).toDF("table_name", "num_rows")
    val rows = LogPipeline.workloadStats(mentions, counts)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("t1") === ((300L, 100L)))
    assert(rows("t2") === ((7L, 7L)))
    assert(!rows.contains("ghost"), "unknown tables dropped at the metadata join")
  }
}
