package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSessionExtensions}
import graft.plans.{AsOfJoin, NestCollect, TopKPerGroup}

class GraftExtensionsSpec extends SparkSpec {

  test("builder-time extensions contribute every custom planner strategy") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val strategies = GraftSqlBridge.plannerStrategies(ext, spark)
    assert(strategies.contains(TopKPerGroup.Strategy))
    assert(strategies.contains(NestCollect.Strategy))
    assert(strategies.contains(AsOfJoin.Strategy))
  }
}
