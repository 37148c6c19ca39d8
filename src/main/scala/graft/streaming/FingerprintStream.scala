package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming dataset-fingerprint maintenance: the online twin of
  * `corpus_dataset_fingerprint`. Each content-hash shard keeps
  * (n, bytes, xor, sum, min, max) of the 52-bit content hashes — six
  * longs per shard, FOREVER, regardless of corpus size — and because
  * every component is a commutative monoid the streamed receipt is
  * EXACTLY the batch manifest under any arrival order or micro-batch
  * split (the strongest parity of the twin family: not just equal
  * estimates, equal provenance receipts). An ingest pipeline publishes
  * these per epoch; a consumer re-derives the batch manifest and
  * byte-compares.
  */
object FingerprintStream {
  final case class Doc(shard: Long, h: Long, nChars: Long)
  final case class FP(n: Long, chars: Long, xor: Long, sum: Long,
      min: Long, max: Long)
  final case class ShardFP(shard: Long, n: Long, chars: Long, xor: Long,
      sum: Long, min: Long, max: Long)

  def fingerprints(docs: Dataset[Doc]): Dataset[ShardFP] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[ShardFP]
    implicit val stateEnc = Encoders.product[FP]
    docs
      .groupByKey(_.shard)
      .flatMapGroupsWithState[FP, ShardFP](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Long, it: Iterator[Doc], state: GroupState[FP]) =>
          transition(shard, it, state)
      }
  }

  private[graft] def transition(shard: Long, it: Iterator[Doc],
      state: GroupState[FP]): Iterator[ShardFP] = {
    var fp = state.getOption.getOrElse(
      FP(0L, 0L, 0L, 0L, Long.MaxValue, Long.MinValue))
    var touched = false
    it.foreach { d =>
      touched = true
      fp = FP(fp.n + 1, fp.chars + d.nChars, fp.xor ^ d.h, fp.sum + d.h,
        math.min(fp.min, d.h), math.max(fp.max, d.h))
    }
    if (!touched) Iterator.empty
    else {
      state.update(fp)
      Iterator.single(ShardFP(shard, fp.n, fp.chars, fp.xor, fp.sum,
        fp.min, fp.max))
    }
  }
}
