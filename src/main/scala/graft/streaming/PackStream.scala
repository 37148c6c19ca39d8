package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — the ingest twin of the batch
  * `corpus_pack_bins` key: documents are assigned to token-budget context
  * bins AS THEY ARRIVE, per shard, so the dataloader handoff can start
  * before the corpus is complete. State per shard is ONE long (the
  * cumulative token count): bin = cum_before / budget, exactly the batch
  * rule, which makes stream == batch whenever per-shard arrival order
  * matches the batch's doc_id order (the contract a sharded ingest that
  * partitions by doc_id naturally satisfies; within a micro-batch the
  * group is sorted by doc_id, so only CROSS-batch inversions can differ).
  *
  * Scale: one stateful shuffle on shard; state O(shards) longs total.
  */
object PackStream {
  final case class PackedDoc(shard: Long, doc_id: Long, n_tokens: Long, bin: Long)

  /** rows(shard, doc_id, n_tokens) → packed assignments. */
  def pack(rows: DataFrame, budgetTokens: Long): Dataset[PackedDoc] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("shard"), col("doc_id"), col("n_tokens"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (shard: Long, it: Iterator[(Long, Long, Long)],
            state: GroupState[Long]) => {
          var cum = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(_._2).map { case (_, docId, n) =>
            val bin = cum / budgetTokens
            cum += n
            PackedDoc(shard, docId, n, bin)
          }
          state.update(cum)
          out.iterator
        })
  }
}
