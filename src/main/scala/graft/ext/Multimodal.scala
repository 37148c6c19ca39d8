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

  final case class Resized(
      doc_id: Long, src_bytes: Long, stride: Long, out_bytes: Long, digest: String)

  /** STUB resize: downsample the payload to ≤`target` bytes by taking every
    * k-th byte (k = ⌊len/target⌋) — the same strided-subsample shape a
    * nearest-neighbor image downscale has, deterministic and pure so the
    * oracle can replay it. A real decoder+resampler slots into the same
    * Blob→Resized contract. */
  def resizeStub(b: Blob, target: Int = 64): Resized = {
    val len = b.data.length
    val k = math.max(1, len / target)
    val n = math.min(target, len)
    val out = Array.tabulate(n)(i => b.data(i * k))
    val md = MessageDigest.getInstance("MD5")
    Resized(b.doc_id, len.toLong, k.toLong, n.toLong,
      md.digest(out).map("%02x".format(_)).mkString)
  }

  /** Batched per-partition resize — one narrow pass, no shuffle. */
  def resize(blobs: Dataset[Blob], target: Int = 64): Dataset[Resized] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map(resizeStub(_, target)))
  }

  final case class Frame(doc_id: Long, frame_idx: Long, frame_md5: String)

  /** STUB frame sampler: treat the payload as a container of fixed-size
    * frames (`frameBytes` each, trailing partial frame dropped) and keep
    * every `every`-th frame — the video keyframe-sampling shape. Emits
    * (doc_id, frame_idx, frame digest) rows; a real demuxer slots into the
    * same flatMap seam. One narrow pass; the fan-out is rows-per-doc =
    * ⌈frames/every⌉, bounded by payload size. */
  def frameSample(blobs: Dataset[Blob], frameBytes: Int = 64,
      every: Int = 4): Dataset[Frame] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.flatMap { b =>
      val md = MessageDigest.getInstance("MD5")
      val nFrames = b.data.length / frameBytes
      (0 until nFrames).filter(_ % every == 0).map { i =>
        val frame = b.data.slice(i * frameBytes, (i + 1) * frameBytes)
        Frame(b.doc_id, i.toLong, md.digest(frame).map("%02x".format(_)).mkString)
      }
    }
  }
}
