package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.GraftFunctions
import graft.plans.RangeBinJoin

/** SparkSessionExtensions entry point: enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  * Injects the scalar/aggregate function surface and the
  * [[graft.plans.RangeBinJoin]] optimizer rule (pure range joins →
  * binned equi-joins; disable via `spark.graft.rangeBinJoin.enabled`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(ext)
    ext.injectOptimizerRule(_ => RangeBinJoin)
  }
}
