package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming space-saving top-k (Metwally–Agrawal–El Abbadi): per-group
  * heavy hitters with HARD-BOUNDED state — the streaming twin of the batch
  * top-k cuts (`text_vocab_topk`, `text_bigram_topk`) and the
  * deterministic-guarantee sibling of [[CmsStream]] (CMS bounds error per
  * point query; space-saving bounds the COUNTER TABLE size and carries an
  * explicit per-item overestimate).
  *
  * State per group is ≤ `capacity` (item, count, err) entries however many
  * items stream through. Arrival of a tracked item increments its count;
  * an untracked item with spare capacity enters at (1, 0); at capacity it
  * REPLACES the minimum counter m, entering at (m+1, err=m) — the classic
  * guarantees follow: count ≥ true ≥ count − err, and every item with true
  * frequency > N/capacity is guaranteed present. When the distinct-item
  * count never exceeds capacity the table is simply exact.
  *
  * Eviction ties break deterministically (min count, then LARGEST item
  * string goes) so replays reproduce byte-identical state; cross-partition
  * arrival order inside one micro-batch is the only nondeterminism, and it
  * vanishes exactly when no eviction fires — the regime the parity spec
  * pins. Emission: Update mode, each batch re-emits the group's current
  * top-k ranked by (count DESC, item ASC).
  */
object TopKStream {
  final case class Item(group: String, item: String)
  final case class Counter(item: String, count: Long, err: Long)
  final case class SS(entries: List[Counter])
  final case class TopEntry(group: String, rank: Int, item: String,
      count: Long, err: Long)

  def topK(items: Dataset[Item], k: Int = 5, capacity: Int = 16): Dataset[TopEntry] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[TopEntry]
    implicit val stateEnc = Encoders.product[SS]
    items
      .groupByKey(_.group)
      .flatMapGroupsWithState[SS, TopEntry](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[Item], state: GroupState[SS]) =>
          transition(g, it, state, k, capacity)
      }
  }

  /** Per-group transition, exposed for deterministic TestGroupState specs. */
  private[graft] def transition(group: String, it: Iterator[Item],
      state: GroupState[SS], k: Int, capacity: Int): Iterator[TopEntry] = {
    var entries = state.getOption.map(_.entries.map(c => c.item -> c).toMap)
      .getOrElse(Map.empty[String, Counter])
    var touched = false
    it.foreach { row =>
      touched = true
      entries.get(row.item) match {
        case Some(c) =>
          entries = entries.updated(row.item, c.copy(count = c.count + 1))
        case None if entries.size < capacity =>
          entries = entries.updated(row.item, Counter(row.item, 1L, 0L))
        case None =>
          // evict the minimum counter; ties drop the LARGEST item string
          val victim = entries.values.minBy(c => (c.count, reverseKey(c.item)))
          entries = (entries - victim.item)
            .updated(row.item, Counter(row.item, victim.count + 1, victim.count))
      }
    }
    if (!touched) Iterator.empty
    else {
      state.update(SS(entries.values.toList.sortBy(c => (-c.count, c.item))))
      entries.values.toSeq
        .sortBy(c => (-c.count, c.item))
        .take(k).zipWithIndex
        .map { case (c, i) => TopEntry(group, i + 1, c.item, c.count, c.err) }
        .iterator
    }
  }

  /** Order-reversing wrapper so minBy's tie-break picks the LARGEST item. */
  private final case class reverseKey(s: String) extends Ordered[reverseKey] {
    def compare(that: reverseKey): Int = that.s.compareTo(s)
  }
}
