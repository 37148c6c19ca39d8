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
  * i.e. the ablation log plus the final corpus in one result. Stages see
  * only each predecessor's survivors, so costs shrink monotonically: the
  * quality gate is a narrow pass over everything, content-hash dedup is
  * one shuffle over what passed, the LSH/CC machinery only runs on
  * distinct content, and the split is a narrow pass over the final corpus.
  */
object CorpusPipeline {
  /** docs: (doc_id, text, lang) → (doc_id, status, split).
    * `reliableCheckpoint` hardens the CC iteration for long cluster runs
    * (see [[Dedup.connectedComponents]]). */
  def run(docs: DataFrame, reliableCheckpoint: Boolean = false): DataFrame = {
    val quality = TextAnalysis.qualityFilter(docs).select(col("doc_id"), col("reason"))
    val staged = docs.join(quality, "doc_id")
    val qualityDrops = staged.filter(col("reason").isNotNull)
      .select(col("doc_id"), concat(lit("quality:"), col("reason")).as("status"))
    val kept1 = staged.filter(col("reason").isNull).select("doc_id", "text")

    val withCk = kept1.withColumn("ck", md5(col("text")))
    val canon = withCk.groupBy("ck").agg(min("doc_id").as("keep_id"))
    val joined = withCk.join(canon, "ck")
    val exactDrops = joined.filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), lit("exact_dup").as("status"))
    val kept2 = joined.filter(col("doc_id") === col("keep_id"))
      .select("doc_id", "text")

    val keptNear = Dedup.keepCanonicalLsh(kept2,
      reliableCheckpoint = reliableCheckpoint).select("doc_id")
    val nearDrops = kept2.join(keptNear, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("near_dup").as("status"))
    val kept = kept2.join(keptNear, "doc_id")

    val keptRows = TextAnalysis.hashSplit(kept)
      .select(col("doc_id"), lit("kept").as("status"), col("split"))
    val noSplit = lit(null).cast("string").as("split")
    qualityDrops.select(col("doc_id"), col("status"), noSplit)
      .unionAll(exactDrops.select(col("doc_id"), col("status"), noSplit))
      .unionAll(nearDrops.select(col("doc_id"), col("status"), noSplit))
      .unionAll(keptRows)
  }
}
