package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.GraftFunctions
import graft.plans.{RangeBinJoin, SinkSortLocal}

/** SparkSessionExtensions entry point: enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  * Injects the scalar/aggregate function surface and two optimizer rules:
  * [[graft.plans.RangeBinJoin]] (pure range joins → binned equi-joins;
  * disable via `spark.graft.rangeBinJoin.enabled`) and
  * [[graft.plans.SinkSortLocal]] (sink-adjacent presentation `orderBy` →
  * partition-local sort; disable via `spark.graft.sinkSortLocal.enabled`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(ext)
    ext.injectOptimizerRule(_ => RangeBinJoin)
    ext.injectOptimizerRule(_ => SinkSortLocal)
  }
}
