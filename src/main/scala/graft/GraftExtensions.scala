package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Builder-time registration of every graft planner strategy:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // programmatic
  *   // or spark.sql.extensions=graft.GraftExtensions (config / spark-submit)
  * }}}
  *
  * The operator APIs ([[graft.plans.TopKPerGroup.topK]],
  * [[graft.plans.NestCollect.nest]], [[graft.plans.AsOfJoin.asOf]]) also
  * self-register through `spark.experimental.extraStrategies` on first
  * use, so this class is not required for the query surface — it exists
  * for deployments that configure extensions once at session build
  * (e.g. a shared cluster-wide default session where user code should
  * not mutate experimental hooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroup.Strategy)
    ext.injectPlannerStrategy(_ => graft.plans.NestCollect.Strategy)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoin.Strategy)
  }
}
