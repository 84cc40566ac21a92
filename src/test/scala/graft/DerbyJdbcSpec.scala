package graft

import java.sql.DriverManager
import graft.convert.SchemaConverter
import graft.model.ConversionKind
import graft.sources.JdbcSource

/** End-to-end smoke of the live-JDBC production path against embedded
  * Derby (the one DBMS available in-container, via the Spark jars dir):
  * partitioned `readTable`, `DatabaseMetaData` introspection, and the
  * conversion rule over the introspected metadata. The MySQL/Postgres
  * dialect SQL in [[JdbcSource]] stays text-verified only (no server to
  * run it against); this covers the surrounding machinery for real.
  */
class DerbyJdbcSpec extends SparkSpec {

  private val derbyAvailable =
    scala.util.Try(Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")).isSuccess ||
      scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver")).isSuccess

  test("embedded Derby: partitioned read, metadata introspection, conversion") {
    assume(derbyAvailable, "Derby driver not on classpath — skipping JDBC smoke")
    val url = "jdbc:derby:memory:graftdb;create=true"
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute("CREATE TABLE REGION (R_REGIONKEY BIGINT PRIMARY KEY, R_NAME VARCHAR(32))")
    st.execute("""CREATE TABLE NATION (N_NATIONKEY BIGINT PRIMARY KEY,
                  N_NAME VARCHAR(32),
                  N_REGIONKEY BIGINT REFERENCES REGION (R_REGIONKEY))""")
    st.execute("INSERT INTO REGION VALUES (0, 'AFRICA'), (1, 'AMERICA')")
    st.execute("INSERT INTO NATION VALUES (0, 'ALGERIA', 0), (1, 'ARGENTINA', 1), (2, 'BRAZIL', 1)")
    st.close()
    c.close()

    val conn = JdbcSource.Conn(url, "", "", "graftdb")

    // S1: partitioned range scan over the numeric PK
    val nation = JdbcSource.readTable(spark, conn, "NATION",
      partitionColumn = Some("N_NATIONKEY"), numPartitions = 2)
    assert(nation.count() === 3)
    assert(nation.rdd.getNumPartitions === 2)
    assert(nation.columns.toSeq === Seq("N_NATIONKEY", "N_NAME", "N_REGIONKEY"))

    // S5–S9 analog via DatabaseMetaData (+ COUNT(*) through Spark JDBC)
    val db = JdbcSource.introspectViaMetadata(spark, conn, schemaPattern = "APP")
    assert(db.tables.map(_.name).toSet === Set("REGION", "NATION"))
    val nat = db("NATION")
    assert(nat.numOfRows === 3)
    assert(nat.primaryKeys === Seq("N_NATIONKEY"))
    assert(nat.foreignKeys.map(fk => (fk.columnName, fk.referencedTable, fk.referencedColumn)) ===
      Seq(("N_REGIONKEY", "REGION", "R_REGIONKEY")))
    assert(db("REGION").isReferenced && db("REGION").referencingTables === Seq("NATION"))

    // §2.8: same decision the SchemaSpec path produces for this shape —
    // region a root, nation one-way embedded beneath it
    val schema = SchemaConverter.convert(db)
    assert(schema.roots.map(_.name) === Seq("REGION"))
    val embedded = schema.roots.head.embedded
    assert(embedded.map(_.name) === Seq("NATION"))
    assert(embedded.head.kind === ConversionKind.OneWayEmbedded)
    assert(embedded.head.attributes === Seq("N_NATIONKEY", "N_NAME"))
  }
}
