package graft

import org.apache.spark.sql.{GraftStatsClampRule, SparkSessionExtensions}

/** Session extensions for the engine, registered through the standard
  * `spark.sql.extensions` config (see [[Tables.sessionConfigs]]).
  * Currently: the checkpoint-stats clamp that keeps iterative
  * (checkpoint-per-round) algorithms from compounding Catalyst's
  * size-in-bytes products into million-digit BigInts.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(session => new GraftStatsClampRule(session))
}
