package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of semantics: latest right at-or-before each left row") {
    val trades = Seq(
      (1L, 100L, "A"), (2L, 200L, "A"), (3L, 50L, "B"), (4L, 300L, "B"),
      (5L, 10L, "C") // C has no quote at all
    ).toDF("trade_id", "ts", "sym")
    val quotes = Seq(
      (100L, "A", 1.0), (150L, "A", 2.0), // ts=100 matches trade 1 exactly
      (40L, "B", 3.0), (60L, "B", 4.0)
    ).toDF("qts", "sym", "px")
    val out = AsOfJoin.asOf(trades, quotes,
        leftKeys = Seq("sym"), rightKeys = Seq("sym"),
        leftTsCol = "ts", rightTsCol = "qts")
      .toDF("trade_id", "ts", "sym", "qts", "sym2", "px").drop("sym2")
      .orderBy("trade_id")
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out === Array(
      (1L, Some(100L), Some(1.0)),  // equal ts included
      (2L, Some(150L), Some(2.0)),  // latest of the two
      (3L, Some(40L), Some(3.0)),
      (4L, Some(60L), Some(4.0)),
      (5L, None, None)))            // no quote for C
  }

  test("matches the union+last_value window encoding on the events table") {
    val ev = graft.sources.Tables.load(spark, sf, "events").selectExpr(
      "event_id", "ts div 1000 as ts_us", "user_id", "event_type", "value")
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user_id"), col("ts_us").as("p_ts_us"))
      .agg(max(col("value")).as("p_value"))
    val custom = AsOfJoin.asOf(ev, p, Seq("user_id"), Seq("p_user_id"), "ts_us", "p_ts_us")
      .select("event_id", "p_ts_us", "p_value")
    // reference: union both sides, carry the last purchase forward; right
    // rows sort before left rows at equal ts (tag 0 < 1) so equal-ts
    // matches are included, matching backward-as-of semantics
    val lTagged = ev.select(col("event_id"), col("user_id"), col("ts_us"),
      lit(1).as("tag"), lit(null).cast("long").as("r_ts"), lit(null).cast("double").as("r_v"))
    val rTagged = p.select(lit(null).cast("long").as("event_id"),
      col("p_user_id").as("user_id"),
      col("p_ts_us").as("ts_us"), lit(0).as("tag"),
      col("p_ts_us").as("r_ts"), col("p_value").as("r_v"))
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val reference = lTagged.unionByName(rTagged)
      .withColumn("p_ts_us", last(col("r_ts"), ignoreNulls = true).over(w))
      .withColumn("p_value", last(col("r_v"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select("event_id", "p_ts_us", "p_value")
    assert(custom.orderBy("event_id").collect().toSeq ===
      reference.orderBy("event_id").collect().toSeq)
  }
}
