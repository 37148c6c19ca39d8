package graft.sinks

import graft.config.GraftConfig
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Batch/foreachBatch delivery of the cascade's `(topic, value)` rows.
  *
  * Kafka (reference: src/sink/kafka.rs:107-198): Spark's Kafka sink natively
  * routes on a `topic` column and passes `kafka.`-prefixed configs through, so
  * the whole reference sink is [[kafkaShape]] + `.format("kafka")` — no custom
  * code. No key is attached, matching src/sink/kafka.rs:138-139.
  *
  * Parquet (reference: src/sink/parquet.rs:127-290): the per-destination
  * buffer map is a group-by-destination; `partitionBy("topic")` expresses it
  * with one dynamic-partition write (the system's only shuffle, SURVEY.md §2.1
  * O18). Destinations with a declared schema are decoded to typed columns
  * (src/sink/parquet.rs:177-184); the rest default to inference semantics
  * handled by the caller (src/sink/parquet.rs:186-212).
  */
object RoutedSink {
  /** The Kafka producer contract: exactly (topic, value) string columns. */
  def kafkaShape(routed: DataFrame): DataFrame =
    routed.select(col("topic").cast("string"), col("value").cast("string"))

  /** Write one parquet tree partitioned by destination:
    * `<url>/topic=<destination>/part-*.parquet` — the Spark-native analog of
    * the reference's `{destination}/{uuid}.parquet` objects
    * (src/sink/parquet.rs:258).
    */
  def writeRouted(routed: DataFrame, cfg: GraftConfig, url: String): Unit = {
    val schemas = cfg.schemas
    val declaredTopics = schemas.keySet
    // Declared destinations: decode JSON payloads to the typed schema.
    schemas.values.foreach { ts =>
      val st = SchemaConv.forTopic(ts)
      routed.filter(col("topic") === ts.topic)
        .select(from_json(col("value"), st).as("v"))
        .select(col("v.*"))
        .write.mode(SaveMode.Append).parquet(s"$url/topic=${ts.topic}")
    }
    // Undeclared destinations: raw payload column, schema inference deferred
    // to readers (divergence from first-line inference is documented in
    // SURVEY.md §7.5).
    val rest =
      if (declaredTopics.isEmpty) routed
      else routed.filter(!col("topic").isInCollection(declaredTopics.toSeq))
    rest.write.mode(SaveMode.Append).partitionBy("topic").parquet(url)
  }
}
