package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy

/** First-use strategy registration shared by the custom operators.
  *
  * `spark.experimental.extraStrategies` is a plain mutable var, so the
  * check-then-append each operator used to do is a race: two threads
  * building queries concurrently on one session could each read the old
  * list and one append would be lost, leaving a custom logical node
  * unplannable (planner assertion error). Serialize the read-modify-write
  * on the `experimental` holder itself — registration is rare (once per
  * strategy per session) so the lock is uncontended in steady state.
  * Deployments that prefer zero session mutation register everything at
  * build time via [[graft.GraftExtensions]] instead; this path keeps the
  * operator APIs usable on any stock session.
  */
object Strategies {
  def register(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(strategy))
        exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }
}
