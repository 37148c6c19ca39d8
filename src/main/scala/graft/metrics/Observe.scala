package graft.metrics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Bridges Spark's `Dataset.observe` side-channel to the reference's
  * statsd surface: every named observation on a completed query emits its
  * long-valued columns as `hotdog.observe.<name>.<column>` counters.
  *
  * This is the batch twin of the streaming pipeline's per-micro-batch
  * statsd emission — `observe` computes the metrics INSIDE the running
  * plan (a zero-cost aggregate piggybacked on the pass the query already
  * makes), so a production job gets row counts / quality tallies without
  * a second scan, and the ops surface is the same statsd namespace the
  * reference daemon exposes (src/status.rs:42-71's counter model).
  */
object Observe {
  def attach(spark: SparkSession, emitter: StatsdEmitter,
      prefix: String = s"${Stats.Prefix}.observe"): QueryExecutionListener = {
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          row.schema.fields.zipWithIndex.foreach { case (f, i) =>
            if (!row.isNullAt(i)) f.dataType match {
              case org.apache.spark.sql.types.LongType =>
                emitter.counter(s"$prefix.$name.${f.name}", row.getLong(i))
              case org.apache.spark.sql.types.IntegerType =>
                emitter.counter(s"$prefix.$name.${f.name}", row.getInt(i).toLong)
              case _ => () // non-integral observations have no counter shape
            }
          }
        }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    l
  }

  def detach(spark: SparkSession, l: QueryExecutionListener): Unit =
    spark.listenerManager.unregister(l)
}
