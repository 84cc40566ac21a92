package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopKPerGroup
import graft.sources.Tables

class TopKPerGroupSpec extends SparkSpec {

  test("custom TopKPerGroup operator matches the window row_number form exactly") {
    val orders = Tables.load(spark, sf, "orders")
    val custom = TopKPerGroup.topK(orders,
      Seq("o_orderpriority"),
      Seq("o_totalprice" -> TopKPerGroup.Desc, "o_orderkey" -> TopKPerGroup.Asc), 3)
      .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val window = orders.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
    val a = custom.orderBy("o_orderpriority", "rank").collect().toSeq
    val b = window.orderBy("o_orderpriority", "rank").collect().toSeq
    assert(a === b)
  }

  test("plan has no sort: one clustering exchange feeding the custom exec") {
    val orders = Tables.load(spark, sf, "orders")
    val plan = TopKPerGroup.topK(orders,
      Seq("o_orderpriority"),
      Seq("o_totalprice" -> TopKPerGroup.Desc, "o_orderkey" -> TopKPerGroup.Asc), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"))  // nodeName strips the Exec suffix
    assert(!plan.toLowerCase.contains("sort"), s"unexpected sort in:\n$plan")
  }

  test("groups smaller than k emit all rows ranked") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("g", "v")
    val out = TopKPerGroup.topK(df, Seq("g"), Seq("v" -> TopKPerGroup.Desc), 10)
      .orderBy("g", "rank")
      .collect().map(r => (r.getString(0), r.getInt(2), r.getInt(1)))
    assert(out.toSeq === Seq(("a", 1, 2), ("a", 2, 1), ("b", 1, 5)))
  }
}
