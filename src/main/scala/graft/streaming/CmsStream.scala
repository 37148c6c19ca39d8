package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Count-Min sketch — cross-batch token-frequency estimation
  * with BOUNDED state: the ingest twin of the batch
  * [[graft.ext.TextAnalysis.cmsHeavyHitters]] sketch, and the frequency
  * sibling of [[HllStream]]'s cardinality registers. Exact streaming
  * counts need state per distinct token; the CMS cell state is d·w longs
  * TOTAL however many tokens arrive, and cells merge by addition — the
  * property that unions sketches across epochs and shards.
  *
  * Layout: the (cell, weight) projection is row-local (same KM hash
  * family as the batch sketch — spec-pinned equal); the stateful shuffle
  * keys on the composite cell id (row·w + bucket), so state is one long
  * per cell, ≤ d·w entries; each micro-batch emits only the cells it
  * touched, Update mode. Point queries (min over a token's d cells) run
  * against the downstream cell table exactly as in batch.
  */
object CmsStream {
  final case class CellHit(cell: Long, inc: Long)
  final case class Cell(cell: Long, count: Long)

  private val P = 1000000007L

  /** Row-local cell hits for arriving documents: token → its d
    * Kirsch-Mitzenmacher cells, pre-summed per micro-batch row. Identical
    * hash math to the batch sketch (md5 halves, (h1 + r·h2) mod P mod w). */
  def cellHits(docs: DataFrame, d: Int = 4, w: Int = 64): Dataset[CellHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val toks = graft.ext.TextAnalysis.tokenRows(docs).select(col("tok"))
    val h1 = graft.functions.GraftFunctions.md5PrefixLong(col("tok"), 1, 15) % P
    val h2 = graft.functions.GraftFunctions.md5PrefixLong(col("tok"), 17, 15) % P
    toks.select(explode(transform(sequence(lit(0), lit(d - 1)), i =>
        (i.cast("long") * w) + ((h1 + i.cast("long") * h2) % P % w))).as("cell"))
      .select(col("cell"), lit(1L).as("inc"))
      .as[CellHit]
  }

  /** Cell maintenance: running sum per cell. Update-mode emission of the
    * new running count for every touched cell.
    *
    * The per-partition combine before the stateful shuffle is the
    * map-side partial aggregation `groupByKey` cannot do on its own
    * (guide §2.3 "aggregate before you shuffle" — streaming forbids an
    * agg operator upstream of flatMapGroupsWithState, so it is hand-rolled
    * here): each map partition collapses its hits onto ≤ d·w cells, so the
    * stateful exchange carries at most d·w rows per partition instead of
    * one row per (token, row-of-sketch) — ~4M rows per replay batch down
    * to ≤256·partitions. Addition is commutative, so the post-batch state
    * and the per-batch emissions are bit-identical. */
  def cells(hits: Dataset[CellHit]): Dataset[Cell] = {
    implicit val hitEnc = Encoders.product[CellHit]
    implicit val longEnc = Encoders.scalaLong // key AND state encoder
    implicit val outEnc = Encoders.product[Cell]
    hits
      .mapPartitions { it =>
        val m = new java.util.HashMap[Long, Long]()
        it.foreach(h => m.merge(h.cell, h.inc, (a, b) => a + b))
        import scala.jdk.CollectionConverters._
        m.entrySet().iterator().asScala.map(e => CellHit(e.getKey, e.getValue))
      }
      .groupByKey(_.cell)
      .flatMapGroupsWithState[Long, Cell](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (cell: Long, it: Iterator[CellHit], state: GroupState[Long]) =>
          transition(cell, it, state)
      }
  }

  /** Per-group transition, exposed for deterministic TestGroupState specs. */
  private[graft] def transition(cell: Long, it: Iterator[CellHit],
      state: GroupState[Long]): Iterator[Cell] = {
    var add = 0L
    it.foreach(add += _.inc)
    if (add == 0L) Iterator.empty
    else {
      val next = state.getOption.getOrElse(0L) + add
      state.update(next)
      Iterator.single(Cell(cell, next))
    }
  }

  /** Point estimate from a cell table: min over the token's d cells —
    * the same query the batch sketch answers. */
  def estimate(cellCounts: Map[Long, Long], tok: String, d: Int = 4,
      w: Int = 64): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16) % P
    val h2 = java.lang.Long.parseLong(hex.substring(16, 31), 16) % P
    (0 until d).map { r =>
      cellCounts.getOrElse(r.toLong * w + ((h1 + r * h2) % P % w), 0L)
    }.min
  }
}
