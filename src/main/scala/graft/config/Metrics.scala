package graft.config

import org.apache.spark.sql.Observation

/** Bounded, loud retrieval of `observe` metrics in iterative loops.
  *
  * The loops deliver their CollectMetrics observation via the round's
  * eager checkpoint; `Observation.get` would block FOREVER if a refactor
  * ever made the cut lazy or dropped the observe node (r14 advice). The
  * listener that publishes the metric is asynchronous, so a bare
  * `getOrEmpty` (±100 ms internal wait) can also race a completed action
  * under load. This helper polls the non-blocking accessor with a hard
  * deadline: normal runs return on the first or second poll; a
  * structurally-broken loop fails within `timeoutMs` naming the caller
  * and round instead of hanging.
  */
object Metrics {

  def await(obs: Observation, key: String, where: String,
      timeoutMs: Long = 60000L): Any = {
    // the only PUBLIC accessor blocks indefinitely — bound it with a
    // worker future; the worker leaks only on the failure path, which
    // throws and aborts the loop anyway
    val m =
      try scala.concurrent.Await.result(
        scala.concurrent.Future(obs.get)(
          scala.concurrent.ExecutionContext.global),
        scala.concurrent.duration.Duration(timeoutMs, "ms"))
      catch {
        case _: java.util.concurrent.TimeoutException =>
          throw new IllegalStateException(
            s"$where: observe metrics not delivered within ${timeoutMs} ms " +
              "— the eager checkpoint no longer delivers the observe node " +
              "(lazy cut or dropped CollectMetrics?)")
      }
    m.getOrElse(key, throw new IllegalStateException(
      s"$where: observe metric '$key' missing from ${m.keySet}"))
  }

  def awaitLong(obs: Observation, key: String, where: String): Long =
    await(obs, key, where) match {
      case null    => 0L // empty-input aggregates (sum over zero rows)
      case l: Long => l
      case other   => other.asInstanceOf[Long]
    }

  def awaitBool(obs: Observation, key: String, where: String): Boolean =
    await(obs, key, where).asInstanceOf[Boolean]
}
