package graft.queries

/** In-memory workload-log fixtures (FIXTURES.md §2). The driver harness
  * ships no log files, so the workload pipeline's query-surface entries
  * parse these constants; file-based parsing takes the same code path
  * via [[graft.workload.LogPipeline.statements]].
  *
  * Designed (FIXTURES.md workload note) so the conversion decisions are
  * identical at every fixture scale factor: reads dominate gaf, the only
  * DML hits `customer` (below threshold), `nation` (tiny) and `part`
  * (0-FK root regardless) — so nation/customer/supplier/orders all embed
  * and only lineitem (3 FKs) stays referencing.
  */
object Fixtures {

  /** MySQL general-query-log dialect (reference regex
    * server/LogManager.js:15-16): optional `yymmdd h:mm:ss`, thread id,
    * command word, body to the next record header. Non-Query records and
    * non-DML/DDL bodies must be ignored; statement 11 (CREATE ... AS
    * SELECT) references a table that is not in the catalog — the mention
    * must be dropped at the metadata join, as the reference's parser-skip
    * does (server/LogManager.js:69-71).
    */
  val mysqlLog: String =
    """240611 10:15:01     12 Connect   root@localhost on testdb
      |240611 10:15:02     12 Query     SELECT * FROM lineitem WHERE l_quantity > 30
      |                    12 Query     SELECT l_orderkey, o_totalprice
      |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |240611 10:15:03     12 Query     SELECT * FROM orders JOIN customer ON o_custkey = c_custkey
      |240611 10:15:04     12 Query     SELECT c_name, n_name, r_name FROM customer
      |    JOIN nation ON c_nationkey = n_nationkey
      |    JOIN region ON n_regionkey = r_regionkey
      |240611 10:15:05     12 Query     SELECT * FROM supplier
      |240611 10:15:06     12 Query     SELECT * FROM part
      |240611 10:15:07     13 Query     UPDATE customer SET c_acctbal = 0 WHERE c_custkey = 7
      |240611 10:15:08     13 Query     UPDATE nation SET n_name = 'X' WHERE n_nationkey = 3
      |240611 10:15:09     13 Query     INSERT INTO part VALUES (99999, 'widget', 'B#1', 'TYPE', 1, 9.99)
      |240611 10:15:10     13 Query     DELETE FROM part WHERE p_partkey = 99999
      |240611 10:15:11     12 Query     CREATE TABLE tmp_report AS SELECT l_orderkey FROM lineitem
      |240611 10:15:12     12 Query     SET autocommit = 1
      |240611 10:15:13     12 Quit
      |""".stripMargin

  /** Postgres log dialect (reference regex server/LogManager.js:36-37):
    * `yyyy-mm-dd hh:mm:ss.SSS +zz [pid] LOG: statement:` (or
    * `STATEMENT:`), bodies may span lines; non-statement records (ERROR)
    * are ignored; `ghost` is not in the catalog → dropped at the join.
    */
  val postgresLog: String =
    """2024-06-11 10:15:02.123 +07 [4242] LOG:  statement: SELECT o_orderkey, c_name
      |	FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |2024-06-11 10:15:03.456 +07 [4242] LOG:  statement: UPDATE part SET p_retailprice = 19 WHERE p_partkey = 2
      |2024-06-11 10:15:04.000 +07 [4242] ERROR:  relation "ghost" does not exist
      |2024-06-11 10:15:05.000 +07 [4242] STATEMENT:  SELECT * FROM ghost
      |2024-06-11 10:15:06.789 +07 [4243] LOG:  statement: DELETE FROM lineitem WHERE l_orderkey = 1
      |""".stripMargin
}
