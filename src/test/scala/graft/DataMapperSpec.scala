package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.queries.MigrationPipeline

/** End-to-end migration pipeline shape on the fixture star schema. */
class DataMapperSpec extends SparkSpec {

  test("converted tree: region→nation→{customer→orders, supplier}; lineitem referencing; part root") {
    val (_, schema) = MigrationPipeline.converted(spark, sf)
    val region = schema.roots.find(_.name == "region").get
    assert(region.embedded.map(_.name) === Seq("nation"))
    val nation = region.embedded.head
    assert(nation.embedded.map(_.name).sorted === Seq("customer", "supplier"))
    assert(nation.find("orders").isDefined, "orders nested under customer")
    assert(schema.roots.map(_.name).toSet === Set("region", "part", "lineitem"))
  }

  test("nested region documents have 4 levels and conserve row counts") {
    val nested = MigrationPipeline.mapRoot(spark, sf, "region")
    assert(nested.count() === 5)
    // total customers across all nests == customer table size
    val nCust = nested.select(explode(col("nation")).as("n"))
      .select(explode(col("n.customer")).as("c")).count()
    assert(nCust === graft.sources.Tables.load(spark, sf, "customer").count())
    // total orders across all nests == orders table size
    val nOrders = nested.select(explode(col("nation")).as("n"))
      .select(explode(col("n.customer")).as("c"))
      .select(explode(col("c.orders")).as("o")).count()
    assert(nOrders === graft.sources.Tables.load(spark, sf, "orders").count())
    // FK elision: embedded nation docs carry no n_regionkey
    val nationFields = nested.schema("nation").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(!nationFields.contains("n_regionkey"))
    assert(nationFields.contains("customer") && nationFields.contains("supplier"))
  }

  test("date-normalizing parity loader formats temporal columns as Bangkok dates") {
    val (db, schema) = MigrationPipeline.converted(spark, sf)
    val mapper = new graft.map.DataMapper(spark, sf, db,
      graft.sinks.JsonSink.normalizingLoader(graft.sources.Tables.load))
    val li = mapper.mapRoot(schema.roots.find(_.name == "lineitem").get)
    val v = li.select("l_shipdate").first().getString(0)
    assert(v.matches("\\d{4}-\\d{2}-\\d{2}"), s"expected yyyy-MM-dd, got $v")
  }
}
