package graft.ext

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads with typed metadata,
  * processed per-partition in batch (the Spark-side shape a real image/audio
  * decoder plugs into — schema, partitioning, batch iteration are real; the
  * DECODE itself is a deterministic stub because no media libraries ship in
  * this environment, as the build brief directs).
  */
object Multimodal {
  final case class Blob(doc_id: Long, data: Array[Byte])
  final case class Meta(
      doc_id: Long, bytes: Long, digest: String, width: Long, height: Long, format: String)

  /** STUB decoder: stands in for e.g. an image header parse. Deterministic
    * pure function of the payload bytes so results are oracle-checkable. */
  def decodeStub(b: Blob): Meta = {
    val md = MessageDigest.getInstance("MD5")
    val digest = md.digest(b.data).map("%02x".format(_)).mkString
    val first = if (b.data.nonEmpty) (b.data(0) & 0xff).toLong else 0L
    Meta(b.doc_id, b.data.length.toLong, digest,
      width = b.data.length.toLong % 640 + 1,
      height = first % 480 + 1,
      format = if (b.data.length % 2 == 0) "even" else "odd")
  }

  /** Batched per-partition decode — the mapPartitions seam where a vectorized
    * decoder (or Arrow batch hand-off) would sit. One narrow pass, no shuffle.
    */
  def decode(blobs: Dataset[Blob]): Dataset[Meta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map(decodeStub))
  }

  /** Text column → opaque binary payload corpus (utf-8 bytes), the shape a
    * real pipeline gets from raw object storage. */
  def asBlobs(docs: DataFrame): Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("data")).as[Blob]
  }
}
