package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-dup detection — the incremental twin of
  * `graft.ext.Dedup.minhashLshPairs` for a corpus that GROWS (the ingest
  * shape of a training-data pipeline: does this new document collide with
  * anything already accepted?).
  *
  * Stage 1 is a row-local projection (no shuffle, streaming-safe): each
  * document computes its own signature — same shingle → md5 →
  * Kirsch-Mitzenmacher (h1 + i·h2) mod p family as the batch operator, so a
  * document's band buckets are IDENTICAL in both — and explodes into
  * (band, bucket) hits. Stage 2 is one stateful shuffle keyed by the
  * bucket: per-bucket GroupState holds the bucket's canonical (minimum)
  * doc_id, and every arriving document emits a candidate edge to that
  * canonical. Candidates form a star per bucket rather than the batch
  * operator's clique — exactly what incremental dedup needs (new doc vs
  * accepted corpus); the full clique/cluster view stays the offline CC
  * path. Downstream exact verification (Jaccard on the candidate pair)
  * is the caller's join, as in batch.
  *
  * State is ONE long per distinct (band, bucket) — bounded by corpus
  * vocabulary, not stream length; production would add a TTL/timeout
  * eviction policy per retention contract.
  */
object NearDupStream {
  final case class Hit(band: Int, bucket: String, doc_id: Long)
  final case class Cand(ida: Long, idb: Long, band: Int, bucket: String)

  /** Row-local (band, bucket, doc_id) hits. Docs under 3 tokens have no
    * shingles → no signature → no hits (matches the batch operator, which
    * only signs docs with ≥1 shingle).
    *
    * The signature runs through the codegen'd `minhash_sig` Expression
    * (bit-equal to the transform/zip_with HOF chain it replaces — HOFs are
    * CodegenFallback, and the interpreted per-lambda eval made this
    * projection the dominant cost of the streaming path: ~10 ms/doc
    * interpreted vs sub-ms compiled; ReplayProbe receipts, PLANS.md r13). */
  def bucketHits(docs: DataFrame, n: Int = 32, bands: Int = 4): Dataset[Hit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rows = n / bands
    val sigs = (0 until n).map(i => element_at(col("sig"), i + 1).as(s"h$i"))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",",
          (0 until rows).map(r => col(s"h${b * rows + r}").cast("string")): _*)).as("bucket"))
    }
    docs
      .withColumn("sig", call_function("minhash_sig", col("text"), lit(n)))
      .filter(col("sig").isNotNull)
      .select(col("doc_id") +: sigs: _*)
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"), col("doc_id"))
      .as[Hit]
  }

  /** Stateful stage: per-bucket canonical doc_id in GroupState; every other
    * document arriving at the bucket emits a candidate edge to it.
    *
    * `ttlMs > 0` enables processing-time state eviction — the retention
    * contract: a bucket idle longer than the TTL forgets its canonical, so
    * state stays bounded by the ACTIVE vocabulary instead of growing with
    * the all-time one (dedup then only spans the retention window, the
    * usual production trade). */
  def candidates(hits: Dataset[Hit], ttlMs: Long = 0L): Dataset[Cand] = {
    implicit val hitEnc = Encoders.product[Hit]
    implicit val outEnc = Encoders.product[Cand]
    implicit val stateEnc = Encoders.scalaLong
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    hits
      .groupByKey(h => (h.band, h.bucket))(
        Encoders.tuple(Encoders.scalaInt, Encoders.STRING))
      .flatMapGroupsWithState[Long, Cand](OutputMode.Append(), timeout) {
        (key: (Int, String), it: Iterator[Hit], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ids = it.map(_.doc_id).toSeq.sorted.distinct
            val prev = state.getOption
            val canonical = math.min(prev.getOrElse(Long.MaxValue), ids.head)
            state.update(canonical)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            // every arrival links to the canonical; if a smaller id just took
            // over, the previous canonical links to it too (the star may relax
            // to a path across takeovers — connectivity is what matters, the
            // offline CC pass recovers the cluster)
            (ids ++ prev).distinct.filterNot(_ == canonical)
              .map(d => Cand(canonical, d, key._1, key._2)).iterator
          }
      }
  }
}
