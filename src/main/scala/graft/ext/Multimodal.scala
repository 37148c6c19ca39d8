package graft.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads with typed metadata,
  * processed per-partition in batch. The metadata DECODE is a real
  * structural parse of the container header — PNG IHDR and JPEG SOF frame
  * dimensions, the same fields `identify`/`ffprobe` report — in pure JVM
  * byte reading (no media libraries ship in this environment; pixel-level
  * decode would slot into the same mapPartitions seam). Spec-verified
  * against files produced by the JDK's own ImageIO PNG/JPEG encoders.
  */
object Multimodal {
  // ImageIO defaults to a DISK-backed stream cache: every read/write
  // creates (and deletes) a temp file under a synchronized registry —
  // per-image file-system traffic that serializes a 32-thread executor
  // (measured: the decode keys sat at ~5 s for 5000 tiny PNGs; in-memory
  // cache returns them to sub-second). Behavior-identical switch: only
  // the stream cache's backing store changes.
  javax.imageio.ImageIO.setUseCache(false)

  final case class Blob(doc_id: Long, data: Array[Byte])
  final case class Meta(
      doc_id: Long, bytes: Long, payload_md5: String, width: Long, height: Long,
      format: String)

  private def md5hex(d: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(d).map("%02x".format(_)).mkString

  private def be32(d: Array[Byte], i: Int): Long =
    ((d(i) & 0xffL) << 24) | ((d(i + 1) & 0xffL) << 16) |
      ((d(i + 2) & 0xffL) << 8) | (d(i + 3) & 0xffL)

  private def be16(d: Array[Byte], i: Int): Int =
    ((d(i) & 0xff) << 8) | (d(i + 1) & 0xff)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def isPng(d: Array[Byte]): Boolean =
    d.length >= 24 && PngSig.indices.forall(i => d(i) == PngSig(i)) &&
      d(12) == 'I' && d(13) == 'H' && d(14) == 'D' && d(15) == 'R'

  /** (width, height, format): PNG via the IHDR chunk (always first, bytes
    * 16/20 big-endian — PNG spec §11.2.2), JPEG by walking marker segments
    * to the first SOF frame header (ITU T.81 §B.2.2: height then width,
    * both 16-bit BE, at offsets 3/5 of the segment payload). Anything
    * else → ("raw", 0×0). */
  def parseImageHeader(d: Array[Byte]): (Long, Long, String) = {
    if (isPng(d)) (be32(d, 16), be32(d, 20), "png")
    else if (d.length >= 10 && d(0) == 'G' && d(1) == 'I' && d(2) == 'F' &&
      d(3) == '8' && (d(4) == '7' || d(4) == '9') && d(5) == 'a')
      // GIF87a/89a: logical screen width/height, little-endian 16-bit at 6/8
      (le16(d, 6).toLong, le16(d, 8).toLong, "gif")
    else if (d.length >= 4 && (d(0) & 0xff) == 0xff && (d(1) & 0xff) == 0xd8) {
      // JPEG: SOI then marker segments; SOF0..SOF15 minus DHT/JPG/DAC
      var i = 2
      while (i + 3 < d.length && (d(i) & 0xff) == 0xff) {
        val m = d(i + 1) & 0xff
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (i + 8 < d.length)
            return (be16(d, i + 7).toLong, be16(d, i + 5).toLong, "jpeg")
          return (0L, 0L, "raw")
        }
        if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // bare
        else if (m == 0xda) return (0L, 0L, "raw") // SOS before any SOF
        else i += 2 + be16(d, i + 2)
      }
      (0L, 0L, "raw")
    } else (0L, 0L, "raw")
  }

  /** Header length for [[parseImageHeader]]-recognized containers — the
    * payload (media content) starts here in [[synthBlobs]] output. */
  def headerLength(d: Array[Byte]): Int =
    if (isPng(d)) 33
    else if (d.length >= 4 && (d(0) & 0xff) == 0xff && (d(1) & 0xff) == 0xd8)
      SoiApp0.length + Sof0Fixed.length + 4 + Sof0Comps.length
    else 0

  def decodeMeta(b: Blob): Meta = {
    val (w, h, fmt) = parseImageHeader(b.data)
    val payload = b.data.drop(headerLength(b.data))
    Meta(b.doc_id, b.data.length.toLong, md5hex(payload), w, h, fmt)
  }

  /** Batched per-partition decode — the mapPartitions seam where a vectorized
    * decoder (or Arrow batch hand-off) would sit. One narrow pass, no shuffle.
    */
  def decode(blobs: Dataset[Blob]): Dataset[Meta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map(decodeMeta))
  }

  /** Text column → opaque binary payload corpus (utf-8 bytes), the shape a
    * real pipeline gets from raw object storage. */
  def asBlobs(docs: DataFrame): Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("data")).as[Blob]
  }

  // --- deterministic container synthesis (the test corpus has no media
  // --- column, so headers are synthesized around the text payload; every
  // --- byte below follows the PNG / JFIF specs and round-trips through
  // --- parseImageHeader AND external decoders)

  /** JPEG SOI + a fixed JFIF APP0 segment (version 1.1, no thumbnail). */
  private val SoiApp0: Array[Byte] = Array(
    0xff, 0xd8, // SOI
    0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00, 0x01, 0x01,
    0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00 // units 0, density 1×1, no thumb
  ).map(_.toByte)

  /** SOF0 marker + length(17) + precision(8) — height/width follow. */
  private val Sof0Fixed: Array[Byte] =
    Array(0xff, 0xc0, 0x00, 0x11, 0x08).map(_.toByte)

  /** 3-component tail of SOF0 (YCbCr 4:2:0, quant tables 0/1/1). */
  private val Sof0Comps: Array[Byte] = Array(
    0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01).map(_.toByte)

  private def pngHeader(w: Long, h: Long): Array[Byte] = {
    val ihdr = new Array[Byte](17) // "IHDR" + 13 data bytes
    "IHDR".getBytes(StandardCharsets.US_ASCII).copyToArray(ihdr)
    def putBe32(a: Array[Byte], i: Int, v: Long): Unit = {
      a(i) = (v >>> 24).toByte; a(i + 1) = (v >>> 16).toByte
      a(i + 2) = (v >>> 8).toByte; a(i + 3) = v.toByte
    }
    putBe32(ihdr, 4, w); putBe32(ihdr, 8, h)
    ihdr(12) = 8; ihdr(13) = 2 // bit depth 8, truecolor; comp/filter/interlace 0
    val crc = new java.util.zip.CRC32
    crc.update(ihdr)
    val out = new java.io.ByteArrayOutputStream(33)
    out.write(PngSig); out.write(Array[Byte](0, 0, 0, 13))
    out.write(ihdr)
    val c = new Array[Byte](4); putBe32(c, 0, crc.getValue); out.write(c)
    out.toByteArray
  }

  private def jpegHeader(w: Long, h: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(39)
    out.write(SoiApp0); out.write(Sof0Fixed)
    out.write(Array[Byte]((h >>> 8).toByte, h.toByte, (w >>> 8).toByte, w.toByte))
    out.write(Sof0Comps)
    out.toByteArray
  }

  /** Deterministic multimodal corpus: every third doc a PNG, every third a
    * JPEG (dimensions a closed form of doc_id so the DuckDB oracle can
    * re-derive them), the rest raw — headers valid per spec, text as the
    * opaque payload. One narrow pass. */
  def synthBlobs(docs: DataFrame): Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val payload = text.getBytes(StandardCharsets.UTF_8)
        val w = id % 1920 + 1
        val h = (id * 7) % 1080 + 1
        val header = (id % 3) match {
          case 0 => pngHeader(w, h)
          case 1 => jpegHeader(w, h)
          case _ => Array.emptyByteArray
        }
        Blob(id, header ++ payload)
    }
  }

  // ------------------------------------------- real pixel path (ImageIO)

  final case class PixelMeta(
      doc_id: Long, width: Long, height: Long, out_w: Long, out_h: Long,
      pixel_md5: String, decodable: Boolean)

  /** Deterministic REAL image corpus: a doc_id-seeded RGB pattern encoded
    * through the JDK's actual PNG writer — genuinely decodable media (the
    * synthetic [[synthBlobs]] containers carry valid headers but text
    * payloads), produced executor-side in one narrow pass. The pattern is
    * pure integer arithmetic on (x, y, doc_id), so any engine/worker
    * produces identical pixels and the PNG round-trip is reproducible. */
  def synthRealImages(docs: DataFrame): Dataset[Blob] =
    synthRealImageVariant(docs, scale = 1, redOff = 0)

  /** [[synthRealImages]] generalized with the two mutations the
    * perceptual-hash exhibit plants: `scale`× nearest-neighbor upscale
    * (same content, different resolution) and a clamped `redOff`
    * brightness shift (same content, small photometric edit) — the two
    * most common ways the SAME image re-enters a web corpus. */
  def synthRealImageVariant(docs: DataFrame, scale: Int, redOff: Int)
      : Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = (id % 13 + 4).toInt * scale
      val h = (id % 11 + 4).toInt * scale
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (bx, by) = (x / scale, y / scale)
          val r = math.min(255L, (bx * 31 + id) % 256 + redOff)
          val g = (by * 17 + id * 3) % 256
          val b = (bx * by + id * 7) % 256
          img.setRGB(x, y, (r.toInt << 16) | (g.toInt << 8) | b.toInt)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      Blob(id, out.toByteArray)
    }
  }

  final case class ImageStats(
      doc_id: Long, n_px: Long, sum_r: Long, sum_g: Long, sum_b: Long,
      decodable: Boolean)

  /** Per-image integer channel statistics through the REAL decode path
    * (ImageIO reads the actual PNG bytes) — the image sibling of
    * [[audioFeatures]]: integer sums make the decode VALUE-checkable,
    * because the generating pattern is closed-form in (x, y, doc_id) and
    * the oracle re-derives the expected sums without ever seeing a PNG.
    * Narrow mapPartitions pass; undecodable payloads degrade flagged. */
  def imageStats(blobs: Dataset[Blob]): Dataset[ImageStats] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map { bl =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bl.data))
        catch { case _: Exception => null }
      if (img == null) ImageStats(bl.doc_id, 0L, 0L, 0L, 0L, decodable = false)
      else {
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        ImageStats(bl.doc_id, img.getWidth.toLong * img.getHeight, sr, sg, sb,
          decodable = true)
      }
    })
  }

  final case class PHash(doc_id: Long, phash: Long, decodable: Boolean)

  /** Perceptual AVERAGE HASH (aHash): decode, nearest-neighbor stretch to
    * `dim`×`dim` (the floor sampling of [[decodeResize]] — resolution
    * invariant by construction: a k× NN upscale samples back to the
    * identical grid because ⌊⌊k·t⌋/k⌋ = ⌊t⌋), integer luma
    * (299r+587g+114b)/1000, one bit per cell (luma > integer mean). 64
    * bits per image however large the payload — the fixed-size signature
    * image dedup buckets on. Pure narrow pass; undecodable payloads
    * degrade to a flagged row. */
  def averageHash(blobs: Dataset[Blob], dim: Int = 8): Dataset[PHash] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map { bl =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bl.data))
        catch { case _: Exception => null }
      if (img == null) PHash(bl.doc_id, 0L, decodable = false)
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val luma = new Array[Long](dim * dim)
        var sum = 0L
        var y = 0
        while (y < dim) {
          var x = 0
          while (x < dim) {
            val rgb = img.getRGB(x * w / dim, y * h / dim)
            val l = (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)) / 1000L
            luma(y * dim + x) = l
            sum += l
            x += 1
          }
          y += 1
        }
        val mean = sum / (dim * dim)
        var bits = 0L
        var i = 0
        while (i < dim * dim) {
          if (luma(i) > mean) bits |= (1L << i)
          i += 1
        }
        PHash(bl.doc_id, bits, decodable = true)
      }
    })
  }

  /** REAL pixel decode + resize through the same mapPartitions seam the
    * structural parsers use: ImageIO decodes the payload, a deterministic
    * nearest-neighbor resample caps the longer side at `maxDim` (floor
    * sampling — srcX = x·w/outW in integer arithmetic, no interpolation,
    * so the resized pixels are bit-identical on any JVM), and the output
    * row carries the resized raster's md5 — the feature-extraction shape
    * (decode → normalize size → fingerprint) of an image-curation
    * pipeline. Payloads ImageIO cannot decode (the structural synthetic
    * containers, raw text) degrade to a `decodable = false` row instead
    * of failing the partition — the hostile-input contract of every
    * parser here. One narrow pass, no shuffle; decode cost is per-row CPU
    * exactly where a cluster scales it. */
  def decodeResize(blobs: Dataset[Blob], maxDim: Int = 8): Dataset[PixelMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map { b =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.data))
        catch { case _: Exception => null }
      if (img == null) PixelMeta(b.doc_id, 0L, 0L, 0L, 0L, "", decodable = false)
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val scaleDown = math.max(w, h) > maxDim
        val (ow, oh) =
          if (!scaleDown) (w, h)
          else if (w >= h) (maxDim, math.max(1, h * maxDim / w))
          else (math.max(1, w * maxDim / h), maxDim)
        val md = java.security.MessageDigest.getInstance("MD5")
        val px = new Array[Byte](3)
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            val rgb = img.getRGB(x * w / ow, y * h / oh)
            px(0) = (rgb >> 16).toByte; px(1) = (rgb >> 8).toByte; px(2) = rgb.toByte
            md.update(px)
            x += 1
          }
          y += 1
        }
        PixelMeta(b.doc_id, w, h, ow, oh,
          md.digest().map("%02x".format(_)).mkString, decodable = true)
      }
    })
  }

  // ------------------------------------------------------------- audio

  final case class AudioMeta(
      doc_id: Long, bytes: Long, sample_rate: Long, channels: Long,
      bits_per_sample: Long, n_samples: Long, format: String)

  private def le16(d: Array[Byte], i: Int): Int =
    (d(i) & 0xff) | ((d(i + 1) & 0xff) << 8)

  private def le32(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) | ((d(i + 1) & 0xffL) << 8) |
      ((d(i + 2) & 0xffL) << 16) | ((d(i + 3) & 0xffL) << 24)

  /** WAV/RIFF structural parse (the audio sibling of [[parseImageHeader]]):
    * walk the RIFF chunk list to the PCM `fmt ` chunk (channels LE16@+2,
    * sample rate LE32@+4, bits LE16@+14 of the chunk payload — RIFF spec /
    * MS WAVEFORMAT) and the `data` chunk size. Returns (sampleRate,
    * channels, bitsPerSample, dataBytes); all-zero for non-WAV payloads. */
  def parseWavHeader(d: Array[Byte]): (Long, Long, Long, Long) = {
    val none = (0L, 0L, 0L, 0L)
    if (d.length < 44 || d(0) != 'R' || d(1) != 'I' || d(2) != 'F' ||
      d(3) != 'F' || d(8) != 'W' || d(9) != 'A' || d(10) != 'V' || d(11) != 'E')
      return none
    var i = 12
    var rate = 0L; var ch = 0L; var bits = 0L; var dataLen = -1L
    while (i + 8 <= d.length) {
      val id = new String(d, i, 4, StandardCharsets.US_ASCII)
      val sz = le32(d, i + 4)
      if (sz < 0 || sz > Int.MaxValue - 16) return none // hostile chunk size
      if (id == "fmt " && i + 8 + 16 <= d.length) {
        ch = le16(d, i + 8 + 2).toLong
        rate = le32(d, i + 8 + 4)
        bits = le16(d, i + 8 + 14).toLong
      } else if (id == "data") {
        // the data chunk payload may be truncated in a header-only blob;
        // the declared size is the authoritative sample count source
        dataLen = sz
        return if (rate > 0) (rate, ch, bits, dataLen) else none
      }
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    none
  }

  final case class AudioFeatures(
      doc_id: Long, n_samples: Long, energy: Long, peak: Long)

  /** REAL sample-level audio feature extraction (the step past structural
    * metadata): locate the `data` chunk, read its 16-bit LE PCM words, and
    * reduce to integer features — word count, energy Σw², peak. Integer
    * features make the decode VALUE-checkable by the oracle (which
    * re-derives the expected samples from the generating text — ASCII
    * payloads keep every word in [0, 32768) so there is no sign handling
    * to disagree on), unlike float MFCC-style features which would drift.
    * Same mapPartitions seam, one narrow pass, no shuffle. */
  def audioFeatures(b: Blob): AudioFeatures = {
    val d = b.data
    val (rate, _, _, declaredLen) = parseWavHeader(d)
    if (rate == 0) return AudioFeatures(b.doc_id, 0L, 0L, 0L)
    // find the data chunk payload offset (parseWavHeader validated shape)
    var i = 12
    var off = -1
    var len = 0
    while (off < 0 && i + 8 <= d.length) {
      val id = new String(d, i, 4, StandardCharsets.US_ASCII)
      val sz = le32(d, i + 4).toInt
      if (id == "data") { off = i + 8; len = math.min(sz, d.length - off) }
      else i += 8 + sz + (sz & 1)
    }
    var n = 0L; var energy = 0L; var peak = 0L
    var j = off
    val end = off + (len / 2) * 2
    while (j + 2 <= end) {
      val w = le16(d, j).toLong
      energy += w * w
      if (w > peak) peak = w
      n += 1; j += 2
    }
    AudioFeatures(b.doc_id, n, energy, peak)
  }

  def decodeAudioFeatures(blobs: Dataset[Blob]): Dataset[AudioFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map(audioFeatures))
  }

  /** Canonical 44-byte PCM WAV header for `dataLen` payload bytes. */
  private def wavHeader(sampleRate: Long, channels: Int, bits: Int,
      dataLen: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val blockAlign = channels * bits / 8
    out.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    out.putInt(36 + dataLen)
    out.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    out.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    out.putInt(16) // PCM fmt chunk size
    out.putShort(1) // audio format 1 = PCM
    out.putShort(channels.toShort)
    out.putInt(sampleRate.toInt)
    out.putInt((sampleRate * blockAlign).toInt) // byte rate
    out.putShort(blockAlign.toShort)
    out.putShort(bits.toShort)
    out.put("data".getBytes(StandardCharsets.US_ASCII))
    out.putInt(dataLen)
    out.array()
  }

  /** Deterministic audio corpus: every doc wrapped as 16-bit PCM WAV with
    * closed-form params (rate by doc_id mod 3, mono/stereo by parity) so
    * the DuckDB oracle re-derives them; text bytes as the sample payload. */
  def synthAudioBlobs(docs: DataFrame): Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val payload = text.getBytes(StandardCharsets.UTF_8)
        val rate = Seq(8000L, 16000L, 44100L)((id % 3).toInt)
        val channels = (id % 2).toInt + 1
        Blob(id, wavHeader(rate, channels, 16, payload.length) ++ payload)
    }
  }

  def decodeAudioMeta(b: Blob): AudioMeta = {
    val (rate, ch, bits, dataLen) = parseWavHeader(b.data)
    val fmt = if (rate > 0) "wav" else "raw"
    val block = ch * bits / 8
    val n = if (rate > 0 && block > 0) dataLen / block else 0L
    AudioMeta(b.doc_id, b.data.length.toLong, rate, ch, bits, n, fmt)
  }

  /** Batched per-partition audio decode — same mapPartitions seam as
    * [[decode]]; one narrow pass, no shuffle. */
  def decodeAudio(blobs: Dataset[Blob]): Dataset[AudioMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map(decodeAudioMeta))
  }

  // ------------------------------------------------------------- video

  final case class VideoMeta(
      doc_id: Long, bytes: Long, timescale: Long, duration: Long,
      duration_ms: Long, format: String)

  /** ISO BMFF (MP4) structural parse — the video sibling: walk the
    * top-level box list to `moov`, then its children to `mvhd` (version 0:
    * timescale BE32 at payload +12, duration BE32 at +16 — ISO/IEC
    * 14496-12 §8.2.2). Returns (timescale, duration); zeros for non-MP4. */
  def parseMp4Header(d: Array[Byte]): (Long, Long) = {
    val none = (0L, 0L)
    def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var i = lo
        def hasNext: Boolean = i + 8 <= hi
        def next(): (String, Int, Int) = {
          val sz = be32(d, i)
          val id = new String(d, i + 4, 4, StandardCharsets.US_ASCII)
          // size 0 = "to end of file"; hostile/truncated sizes end the walk
          val end =
            if (sz == 0) hi
            else if (sz < 8 || i + sz > hi) { i = hi; return (id, hi, hi) }
            else i + sz.toInt
          val start = i + 8
          i = end
          (id, start, end)
        }
      }
    if (d.length < 12) return none
    val (ftyp, _, _) = boxes(0, d.length).next()
    if (ftyp != "ftyp") return none
    boxes(0, d.length).collectFirst { case ("moov", s, e) =>
      boxes(s, e).collectFirst { case ("mvhd", ms, me)
          if me - ms >= 20 && d(ms) == 0 => // version-0 mvhd only
        (be32(d, ms + 12), be32(d, ms + 16))
      }.getOrElse(none)
    }.getOrElse(none)
  }

  private def be32bytes(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def box(id: String, payload: Array[Byte]): Array[Byte] =
    be32bytes(payload.length + 8L) ++
      id.getBytes(StandardCharsets.US_ASCII) ++ payload

  /** Minimal spec-valid MP4 skeleton: ftyp(isom) + moov(mvhd v0) with the
    * given timescale/duration; `tail` appended as an opaque mdat. */
  private def mp4Header(timescale: Long, duration: Long,
      tail: Array[Byte]): Array[Byte] = {
    val mvhd = new Array[Byte](100) // version 0 mvhd payload is 100 bytes
    be32bytes(timescale).copyToArray(mvhd, 12)
    be32bytes(duration).copyToArray(mvhd, 16)
    be32bytes(0x00010000L).copyToArray(mvhd, 20) // rate 1.0
    mvhd(24) = 0x01; mvhd(25) = 0x00 // volume 1.0
    box("ftyp", "isom".getBytes(StandardCharsets.US_ASCII) ++
        be32bytes(0) ++ "isom".getBytes(StandardCharsets.US_ASCII)) ++
      box("moov", box("mvhd", mvhd)) ++ box("mdat", tail)
  }

  /** Deterministic video corpus: every doc wrapped as an MP4 skeleton with
    * closed-form timescale/duration (the oracle re-derives them); text
    * bytes ride as the opaque mdat payload. */
  def synthVideoBlobs(docs: DataFrame): Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val ts = Seq(600L, 1000L, 90000L)((id % 3).toInt)
        val dur = (id % 120 + 1) * ts // 1..120 whole seconds
        Blob(id, mp4Header(ts, dur, text.getBytes(StandardCharsets.UTF_8)))
    }
  }

  def decodeVideoMeta(b: Blob): VideoMeta = {
    val (ts, dur) = parseMp4Header(b.data)
    val fmt = if (ts > 0) "mp4" else "raw"
    val ms = if (ts > 0) dur * 1000L / ts else 0L
    VideoMeta(b.doc_id, b.data.length.toLong, ts, dur, ms, fmt)
  }

  /** Batched per-partition video decode — same mapPartitions seam. */
  def decodeVideo(blobs: Dataset[Blob]): Dataset[VideoMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map(decodeVideoMeta))
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
