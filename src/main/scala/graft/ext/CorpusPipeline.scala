package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus preparation pipeline a training run actually
  * executes, composed from the individually-oracle-checked stages:
  *
  *   quality gate → exact dedup → near-dup dedup (MinHash-LSH + connected
  *   components) → content-hash train/val/test split
  *
  * Output is one DISPOSITION row per input document — `kept` with its
  * split, or the drop reason (`quality:<rule>`, `exact_dup`, `near_dup`) —
  * i.e. the ablation log plus the final corpus in one result.
  *
  * Plan shape (the 100-TB consideration): the dispositions are assembled by
  * ONE left-join chain on doc_id, not a union of per-status drop sets — a
  * union re-derives the quality/exact subtrees once per branch (the r3
  * formulation derived the corpus scan ~6×), while the join chain computes
  * each stage exactly once and the two final joins share the doc_id
  * partitioning. Stages still see only each predecessor's survivors, so
  * costs shrink monotonically: the quality gate is a narrow pass over
  * everything, content-hash dedup is one shuffle over what passed, the
  * LSH/CC machinery only runs on distinct surviving content, and the split
  * bucket reuses the exact-dedup md5 — zero extra passes.
  */
object CorpusPipeline {
  /** docs: (doc_id, text, lang) → (doc_id, status, split).
    * `reliableCheckpoint` hardens the CC iteration for long cluster runs
    * (see [[Dedup.connectedComponents]]). */
  def run(docs: DataFrame, reliableCheckpoint: Boolean = false): DataFrame = {
    val quality = TextAnalysis.qualityFilter(docs).select(col("doc_id"), col("reason"))
    val staged = docs.join(quality, "doc_id")

    // exact dedup over quality survivors; ck doubles as the split bucket key
    val withCk = staged.filter(col("reason").isNull)
      .select(col("doc_id"), col("text"), md5(col("text")).as("ck"))
    val canon = withCk.groupBy("ck").agg(min("doc_id").as("keep_id"))
    val exact = withCk.join(canon, "ck")

    val kept2 = exact.filter(col("doc_id") === col("keep_id")).select("doc_id", "text")
    val keptNear = Dedup.keepCanonicalLsh(kept2,
        reliableCheckpoint = reliableCheckpoint)
      .select(col("doc_id"), lit(true).as("near_keep"))

    // one disposition row per input doc: survivors-only maps attach via
    // LEFT joins; null keep_id = quality-dropped, null near_keep = dropped
    // before or at the near-dup stage
    val bucket = TextAnalysis.contentBucket(col("ck"))
    val dropped = col("reason").isNotNull ||
      col("doc_id") =!= col("keep_id") || col("near_keep").isNull
    staged.select("doc_id", "reason")
      .join(exact.select(col("doc_id"), col("ck"), col("keep_id")), Seq("doc_id"), "left")
      .join(keptNear, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("reason").isNotNull, concat(lit("quality:"), col("reason")))
          .when(col("doc_id") =!= col("keep_id"), lit("exact_dup"))
          .when(col("near_keep").isNull, lit("near_dup"))
          .otherwise(lit("kept")).as("status"),
        when(dropped, lit(null).cast("string"))
          .otherwise(TextAnalysis.splitFor(bucket)).as("split"))
  }
}
