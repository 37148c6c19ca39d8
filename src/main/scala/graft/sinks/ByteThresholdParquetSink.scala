package graft.sinks

import scala.collection.mutable

import graft.config.GraftConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference parquet sink's EXACT flush-trigger semantics
  * (src/sink/parquet.rs:127-230), which the plain per-trigger
  * [[GraftPipeline.startParquetSink]] only approximates:
  *
  *   - payloads accumulate in a per-destination buffer ACROSS arrivals;
  *     the flush tally counts payload UTF-8 bytes ONLY (parquet.rs:152
  *     `bufsize += payload.len()` — the newline appended to the stored
  *     buffer at parquet.rs:158 is NOT counted against the threshold)
  *   - when ANY destination's buffered bytes reach `parquet.buffer`, ALL
  *     destinations flush (parquet.rs:160-168 sends one Message::flush,
  *     whose handler drains the whole buffer map)
  *   - a flush-interval timer fires the same drain (parquet.rs:89-110)
  *   - shutdown drains whatever remains (O21; call [[flush]] after the
  *     query terminates, as [[GraftPipeline.startBufferedParquetSink]]'s
  *     listener does)
  *
  * Spark twin: micro-batches accumulate as PERSISTED DataFrames (data stays
  * distributed on the executors — only the per-destination byte tally, one
  * tiny agg per batch, reaches the driver), and a flush writes their union
  * through [[RoutedSink.writeRouted]] — one dynamic-partition parquet write
  * for the whole buffer map, exactly the reference's drain. Buffered bytes
  * are bounded by `buffer` + one batch, the reference's own bound.
  *
  * Durability contract is ALSO the reference's: buffered-but-unflushed rows
  * live in memory only, so a crash loses at most one buffer's worth —
  * hotdog's documented in-memory loss window (unbuffered
  * `startParquetSink` keeps Spark's stronger per-trigger checkpoint
  * guarantee; choose per deployment). Persisted batches are additionally
  * subject to Spark's cache contract: an evicted/lost block recomputes
  * from the micro-batch source, so pair this sink with a REPLAYABLE
  * source (file, Kafka within retention) — over a fire-and-forget TCP
  * stream the recompute window is the same data the reference would have
  * lost from its own RAM buffer.
  *
  * The flush interval runs on a real timer (the reference's flush task,
  * parquet.rs:89-110) — Spark does not invoke foreachBatch for empty
  * micro-batches, so an idle stream must still drain on schedule.
  */
final class ByteThresholdParquetSink(cfg: GraftConfig, url: String)
    extends AutoCloseable {
  // newest-first (epoch, batch) buffer: keyed by epoch so a RETRIED
  // micro-batch (foreachBatch replays the same epoch id after a failed
  // attempt — Spark's recovery unit) REPLACES its buffered predecessor
  // instead of double-buffering; see the exactly-once note on [[addBatch]]
  private var batches: List[(Long, DataFrame)] = Nil
  private val epochBytes = mutable.Map.empty[Long, Map[String, Long]]
  private var lastFlushNs = System.nanoTime()

  private val timer =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-flush-timer"); t.setDaemon(true); t
    })
  locally {
    val cadence = math.max(1L, cfg.flushMs / 4)
    timer.scheduleWithFixedDelay(() => maybeTimerFlush(),
      cadence, cadence, java.util.concurrent.TimeUnit.MILLISECONDS)
  }

  private def maybeTimerFlush(): Unit = synchronized {
    if (batches.nonEmpty &&
      (System.nanoTime() - lastFlushNs) / 1000000L >= cfg.flushMs) flush()
  }

  /** Merged per-destination byte tally across all buffered epochs. */
  private def mergedSizes: Map[String, Long] =
    epochBytes.valuesIterator.flatten
      .foldLeft(Map.empty[String, Long]) { case (acc, (t, n)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + n)
      }

  /** foreachBatch entry point. Idempotent per EPOCH while the epoch is
    * still buffered: Spark's failure recovery replays a failed micro-batch
    * under the same epoch id, so a retried addBatch REPLACES the buffered
    * attempt (no double-count in rows or in the flush tally). An epoch
    * replayed AFTER its flush has left the process is the documented
    * at-most-one-buffer loss/duplication window of this sink — deployments
    * needing cross-flush exactly-once use
    * [[RoutedSink.writeRoutedExactlyOnce]] (epoch-marker committed). */
  def addBatch(batch: DataFrame, epoch: Long): Unit = synchronized {
    batches.find(_._1 == epoch).foreach { case (_, stale) =>
      stale.unpersist()
      batches = batches.filterNot(_._1 == epoch)
      epochBytes.remove(epoch)
    }
    val b = batch.persist()
    val tally = b.groupBy("topic")
      .agg(sum(octet_length(col("value"))).as("bytes"))
      .collect().flatMap { r =>
        if (r.isNullAt(1)) None else Some(r.getString(0) -> r.getLong(1))
      }.toMap
    epochBytes(epoch) = tally
    batches ::= (epoch, b)
    val thresholdHit = cfg.parquetBufferBytes.exists(max =>
      mergedSizes.valuesIterator.exists(_ >= max))
    val timerFired =
      (System.nanoTime() - lastFlushNs) / 1000000L >= cfg.flushMs
    if (thresholdHit || timerFired) flush()
  }

  /** Drain every destination's buffer into the routed parquet tree. */
  def flush(): Unit = synchronized {
    if (batches.nonEmpty) {
      val all = batches.reverse.map(_._2).reduce(_ unionAll _)
      RoutedSink.writeRouted(all, cfg, url)
      batches.foreach(_._2.unpersist())
    }
    batches = Nil
    epochBytes.clear()
    lastFlushNs = System.nanoTime()
  }

  /** Buffered byte tally per destination (test/metrics introspection). */
  def bufferedBytes: Map[String, Long] = synchronized { mergedSizes }

  /** Final drain + timer shutdown (the termination listener calls this). */
  override def close(): Unit = {
    timer.shutdown()
    flush()
  }
}
