package graft

import org.apache.spark.sql.functions._
import graft.plans.NestCollect

class NestCollectSpec extends SparkSpec {

  test("arrays are key-grouped and sort-key ordered, regardless of input order") {
    import spark.implicits._
    // shuffled input: keys interleaved, values descending
    val rows = for (k <- 1 to 20; v <- 10 to 1 by -1) yield (k, v, s"p$k-$v")
    val df = scala.util.Random.shuffle(rows).toDF("k", "v", "payload").repartition(4)
    val nested = NestCollect.nest(df, "k", Seq("v", "payload"), Seq("v"), "docs")
    val out = nested.select(col("k"), transform(col("docs"), d => d.getField("v")).as("vs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    assert(out.keySet === (1 to 20).toSet)
    out.values.foreach(vs => assert(vs === (1 to 10)))
  }

  test("survives many groups per partition (the collect_list fallback trap)") {
    import spark.implicits._
    // ObjectHashAggregate's sort-based fallback kicks in at 128 distinct
    // keys per partition and merges spilled buffers non-stably — the bug
    // this operator exists to avoid. 1000 groups in ONE partition.
    val rows = for (k <- 1 to 1000; v <- 5 to 1 by -1) yield (k.toLong, v.toLong)
    val df = scala.util.Random.shuffle(rows).toDF("k", "v").coalesce(1)
    val nested = NestCollect.nest(df, "k", Seq("v"), Seq("v"), "docs")
    val bad = nested
      .select(col("k"), transform(col("docs"), d => d.getField("v")).as("vs"))
      .filter(not(col("vs") === array((1 to 5).map(i => lit(i.toLong)): _*)))
      .count()
    assert(bad === 0)
    assert(nested.count() === 1000)
  }

  test("matches array_sort(collect_list(struct)) on real data") {
    val orders = graft.sources.Tables.load(spark, sf, "orders")
    val viaOp = NestCollect.nest(orders, "o_custkey",
      Seq("o_orderkey", "o_totalprice"), Seq("o_orderkey"), "docs")
    val viaAgg = orders.groupBy(col("o_custkey"))
      .agg(array_sort(collect_list(struct(col("o_orderkey"), col("o_totalprice"))))
        .as("docs"))
    val a = viaOp.orderBy("o_custkey").collect().toSeq
    val b = viaAgg.orderBy("o_custkey").collect().toSeq
    assert(a === b)
  }

  test("plan shape: one exchange, one local sort below the custom exec") {
    val orders = graft.sources.Tables.load(spark, sf, "orders")
    val plan = NestCollect.nest(orders, "o_custkey",
      Seq("o_orderkey"), Seq("o_orderkey"), "docs")
      .queryExecution.executedPlan.toString
    assert(plan.contains("NestCollect"))
    assert("Exchange".r.findAllIn(plan).size <= 2, plan) // exchange + possible AQE read
  }
}
