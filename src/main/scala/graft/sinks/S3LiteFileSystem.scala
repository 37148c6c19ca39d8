package graft.sinks

import java.io.{ByteArrayOutputStream, FileNotFoundException, InputStream, OutputStream}
import java.net.{HttpURLConnection, URI, URL, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A minimal S3-protocol Hadoop [[FileSystem]] — the Spark-side analog of
  * the reference's `object_store` AWS client (src/sink/parquet.rs:238-290
  * writes parquet buffers through `object_store` to S3-compatible
  * storage). The deployment story mirrors [[KafkaProduceClient]]: where a
  * cluster ships `hadoop-aws`, that connector takes the `s3a://` scheme
  * (see [[ObjectStoreConfig]], which only installs this class when
  * `S3AFileSystem` is absent); where it doesn't — this container, or a
  * slim deployment — graft speaks the public S3 REST protocol itself:
  *
  *   - SigV4 request signing ([[S3Sig]], the published AWS algorithm) —
  *     verified end-to-end by the loopback stub, which recomputes the
  *     signature with the shared secret and rejects mismatches, the same
  *     loopback discipline as the SCRAM-validating Kafka broker;
  *   - multipart upload for streams past `fs.s3a.multipart.size`
  *     (initiate → UploadPart per buffer-full → complete), simple PUT
  *     below it — exactly `object_store`'s put/multipart split;
  *   - ranged GETs with a read-ahead buffer for seekable parquet reads;
  *   - capped exponential backoff with jitter on 429/5xx (503 SlowDown is
  *     routine under multipart load) and transport failures — the retry
  *     the reference gets from `object_store` internally; terminal 4xx
  *     still fail-fast, and a failed multipart upload is best-effort
  *     ABORTED so real stores don't bill leaked parts;
  *   - directory emulation over the flat keyspace: ListObjectsV2 with
  *     delimiter, zero-byte `key/` markers for empty dirs, rename as
  *     server-side copy (`x-amz-copy-source`) + delete — the standard
  *     S3AFileSystem semantics, enough for the FileOutputCommitter's
  *     mkdirs/rename/list protocol.
  *
  * Conf keys honored (the exact keys [[ObjectStoreConfig]] populates from
  * the reference's environment contract): `fs.s3a.endpoint`,
  * `fs.s3a.access.key`, `fs.s3a.secret.key`, `fs.s3a.endpoint.region`,
  * `fs.s3a.connection.ssl.enabled`, `fs.s3a.multipart.size`, plus the
  * S3A retry knobs `fs.s3a.attempts.maximum` (default 5) and
  * `fs.s3a.retry.interval` (base ms, default 200).
  */
final class S3LiteFileSystem extends FileSystem {
  private var fsUri: URI = _
  private var bucket: String = _
  private var endpoint: String = _
  private var region: String = _
  private var access: String = _
  private var secret: String = _
  private var partSize: Int = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    bucket = name.getAuthority
    val ssl = conf.getBoolean("fs.s3a.connection.ssl.enabled", true)
    val ep = conf.getTrimmed("fs.s3a.endpoint", "")
    require(ep.nonEmpty, "S3LiteFileSystem needs fs.s3a.endpoint")
    endpoint =
      if (ep.contains("://")) ep.stripSuffix("/")
      else s"${if (ssl) "https" else "http"}://$ep"
    region = conf.getTrimmed("fs.s3a.endpoint.region", "us-east-1")
    access = conf.getTrimmed("fs.s3a.access.key", "")
    secret = conf.getTrimmed("fs.s3a.secret.key", "")
    partSize = math.max(1024,
      conf.getLong("fs.s3a.multipart.size", 8L * 1024 * 1024).toInt)
    maxAttempts = math.max(1, conf.getInt("fs.s3a.attempts.maximum", 5))
    retryBaseMs = math.max(1L, conf.getLong("fs.s3a.retry.interval", 200L))
    workDir = new Path(s"${name.getScheme}://$bucket/")
  }

  private var maxAttempts: Int = 5
  private var retryBaseMs: Long = 200L

  override def getUri: URI = fsUri
  override def getScheme: String = "s3a"
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  /** Bucket-relative object key ("" for the bucket root). */
  private def keyOf(p: Path): String = {
    val q = p.makeQualified(fsUri, workDir).toUri.getPath
    q.stripPrefix("/")
  }

  // -------------------------------------------------------- HTTP plumbing

  /** The response codes S3 tells clients to retry: 429 plus the 5xx band
    * (503 SlowDown is ROUTINE under multipart load — the reference rides
    * it out because `object_store` retries internally; parquet.rs writes
    * through that client without its own handling). Everything else is
    * terminal on the first response — fail-closed stays fail-closed. */
  private val RetriableCodes = Set(429, 500, 502, 503, 504)

  /** Capped exponential backoff with decorrelating jitter around one
    * idempotent HTTP exchange (every verb here is safe to replay: PUT
    * bodies are buffered byte arrays, GET/DELETE/list are idempotent,
    * multipart initiate/complete replays are resolved by the uploadId).
    * A connect/transport IOException retries on the same schedule; after
    * `fs.s3a.attempts.maximum` tries the last response (or exception)
    * surfaces unchanged so callers' fail() paths stay terminal. */
  private def withRetry(op: String)(
      once: => (Int, Array[Byte], Map[String, String]))
      : (Int, Array[Byte], Map[String, String]) = {
    var attempt = 0
    while (true) {
      val res =
        try Some(once)
        catch {
          case e: java.io.IOException =>
            if (attempt >= maxAttempts - 1) throw e
            None
        }
      res match {
        case Some(r) if !RetriableCodes(r._1) || attempt >= maxAttempts - 1 =>
          return r
        case _ =>
          val backoff = math.min(10000L, retryBaseMs << math.min(attempt, 6))
          val jitter = java.util.concurrent.ThreadLocalRandom.current()
            .nextLong(backoff / 2 + 1)
          Thread.sleep(backoff / 2 + jitter)
      }
      attempt += 1
    }
    throw new IllegalStateException(s"unreachable: $op")
  }

  private def request(method: String, key: String,
      query: Seq[(String, String)] = Nil, body: Array[Byte] = null,
      copySource: Option[String] = None): (Int, Array[Byte], Map[String, String]) =
    withRetry(s"$method $key")(requestOnce(method, key, query, body, copySource))

  private def requestOnce(method: String, key: String,
      query: Seq[(String, String)], body: Array[Byte],
      copySource: Option[String]): (Int, Array[Byte], Map[String, String]) = {
    val qs = query.map { case (k, v) =>
      if (v == null) S3Sig.enc(k) else s"${S3Sig.enc(k)}=${S3Sig.enc(v)}"
    }.mkString("&")
    val path = s"/$bucket/${S3Sig.encPath(key)}"
    val url = new URL(s"$endpoint$path${if (qs.isEmpty) "" else s"?$qs"}")
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setConnectTimeout(30000); c.setReadTimeout(60000)
    val payload = if (body == null) Array.emptyByteArray else body
    val extra = copySource.map("x-amz-copy-source" -> _).toSeq
    S3Sig.sign(c, method, path, query, payload, url.getAuthority,
      region, access, secret, extra)
    if (body != null || method == "PUT" || method == "POST") {
      c.setDoOutput(true)
      c.setFixedLengthStreamingMode(payload.length)
      val o = c.getOutputStream; o.write(payload); o.close()
    }
    val code = c.getResponseCode
    val in = if (code >= 400) c.getErrorStream else c.getInputStream
    val resp = if (in == null) Array.emptyByteArray else
      try in.readAllBytes() finally in.close()
    val headers = Seq("Content-Length", "ETag", "Last-Modified")
      .flatMap(h => Option(c.getHeaderField(h)).map(h.toLowerCase -> _)).toMap
    (code, resp, headers)
  }

  private def fail(op: String, code: Int, body: Array[Byte]): Nothing =
    throw new java.io.IOException(
      s"S3 $op failed: HTTP $code ${new String(body, StandardCharsets.UTF_8).take(300)}")

  // --------------------------------------------------------------- reads

  /** Seekable ranged-GET stream: each refill fetches a read-ahead window
    * (bounded), so parquet footer seeks don't download the object. */
  private final class RangedInput(key: String, len: Long)
      extends FSInputStream {
    private var pos = 0L
    private var buf: Array[Byte] = Array.emptyByteArray
    private var bufStart = 0L
    private val readAhead = 256 * 1024

    private def refill(at: Long, want: Int): Unit = {
      val end = math.min(len, at + math.max(want, readAhead)) - 1
      if (end < at) { buf = Array.emptyByteArray; bufStart = at; return }
      val (code, body, _) = rangedGet(key, at, end)
      if (code / 100 != 2) fail(s"GET $key range=$at-$end", code, body)
      buf = body; bufStart = at
    }

    override def seek(p: Long): Unit = { pos = p }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(): Int = {
      if (pos >= len) return -1
      if (pos < bufStart || pos >= bufStart + buf.length) refill(pos, 1)
      val b = buf((pos - bufStart).toInt) & 0xff
      pos += 1; b
    }

    override def read(b: Array[Byte], off: Int, l: Int): Int = {
      if (pos >= len) return -1
      if (pos < bufStart || pos >= bufStart + buf.length) refill(pos, l)
      val avail = (bufStart + buf.length - pos).toInt
      if (avail <= 0) return -1
      val n = math.min(l, avail)
      System.arraycopy(buf, (pos - bufStart).toInt, b, off, n)
      pos += n; n
    }
  }

  private def rangedGet(key: String, from: Long, to: Long): (Int, Array[Byte], Map[String, String]) =
    withRetry(s"GET $key range")(rangedGetOnce(key, from, to))

  private def rangedGetOnce(key: String, from: Long, to: Long): (Int, Array[Byte], Map[String, String]) = {
    val path = s"/$bucket/${S3Sig.encPath(key)}"
    val url = new URL(s"$endpoint$path")
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod("GET")
    c.setConnectTimeout(30000); c.setReadTimeout(60000)
    c.setRequestProperty("Range", s"bytes=$from-$to")
    S3Sig.sign(c, "GET", path, Nil, Array.emptyByteArray, url.getAuthority,
      region, access, secret, Seq("range" -> s"bytes=$from-$to"))
    val code = c.getResponseCode
    val in = if (code >= 400) c.getErrorStream else c.getInputStream
    val resp = if (in == null) Array.emptyByteArray else
      try in.readAllBytes() finally in.close()
    (code, resp, Map.empty)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val st = getFileStatus(f)
    if (st.isDirectory) throw new FileNotFoundException(s"$f is a directory")
    new FSDataInputStream(new RangedInput(keyOf(f), st.getLen))
  }

  // -------------------------------------------------------------- writes

  /** Buffering multipart output stream: plain PUT under one part,
    * initiate/UploadPart/complete past it — `object_store`'s split. */
  private final class MultipartOutput(key: String) extends OutputStream {
    private val buf = new ByteArrayOutputStream(math.min(partSize, 1 << 20))
    private var uploadId: Option[String] = None
    private var partNo = 0
    private val etags = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    private var closed = false

    override def write(b: Int): Unit = {
      buf.write(b)
      if (buf.size() >= partSize) shipPart()
    }
    // chunk at part boundaries so every shipped part is EXACTLY partSize
    // (a single huge write must not become one oversized part)
    override def write(b: Array[Byte], off: Int, l: Int): Unit = {
      var o = off; var rem = l
      while (rem > 0) {
        val n = math.min(partSize - buf.size(), rem)
        buf.write(b, o, n); o += n; rem -= n
        if (buf.size() >= partSize) shipPart()
      }
    }

    /** Best-effort AbortMultipartUpload before surfacing a terminal
      * failure — a real store bills pending parts until aborted, and every
      * failed/retried task attempt would otherwise leak its upload. */
    private def abortUpload(): Unit = uploadId.foreach { id =>
      uploadId = None
      try request("DELETE", key, Seq("uploadId" -> id))
      catch { case _: Exception => () } // abort must not mask the cause
    }

    private def shipPart(): Unit = {
      try {
        val id = uploadId.getOrElse {
          val (code, body, _) = request("POST", key, Seq("uploads" -> null))
          if (code / 100 != 2) fail(s"initiate multipart $key", code, body)
          val xml = new String(body, StandardCharsets.UTF_8)
          val id = "<UploadId>([^<]+)</UploadId>".r.findFirstMatchIn(xml)
            .map(_.group(1)).getOrElse(fail(s"initiate multipart $key", code, body))
          uploadId = Some(id); id
        }
        partNo += 1
        val (code, body, hdrs) = request("PUT", key,
          Seq("partNumber" -> partNo.toString, "uploadId" -> id),
          buf.toByteArray)
        if (code / 100 != 2) fail(s"UploadPart $partNo $key", code, body)
        etags += partNo -> hdrs.getOrElse("etag", "\"\"")
        buf.reset()
      } catch {
        case e: java.io.IOException => abortUpload(); closed = true; throw e
      }
    }

    override def close(): Unit = {
      if (closed) return
      closed = true
      uploadId match {
        case None => // small object: one plain PUT
          val (code, body, _) = request("PUT", key, Nil, buf.toByteArray)
          if (code / 100 != 2) fail(s"PUT $key", code, body)
        case Some(id) =>
          try {
            if (buf.size() > 0) {
              // inline tail-part ship (shipPart aborts on ITS failures)
              partNo += 1
              val (code, body, hdrs) = request("PUT", key,
                Seq("partNumber" -> partNo.toString, "uploadId" -> id),
                buf.toByteArray)
              if (code / 100 != 2) fail(s"UploadPart $partNo $key", code, body)
              etags += partNo -> hdrs.getOrElse("etag", "\"\"")
              buf.reset()
            }
            val parts = etags.map { case (n, e) =>
              s"<Part><PartNumber>$n</PartNumber><ETag>$e</ETag></Part>"
            }.mkString
            val xml = s"<CompleteMultipartUpload>$parts</CompleteMultipartUpload>"
            val (code, body, _) = request("POST", key, Seq("uploadId" -> id),
              xml.getBytes(StandardCharsets.UTF_8))
            if (code / 100 != 2) fail(s"complete multipart $key", code, body)
          } catch {
            case e: java.io.IOException => abortUpload(); throw e
          }
      }
    }
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    if (!overwrite && exists(f))
      throw new FileAlreadyExistsException(f.toString)
    new FSDataOutputStream(new MultipartOutput(key), statistics)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("S3 objects are immutable")

  // ------------------------------------------------- namespace emulation

  /** Exact-key stat via ListObjectsV2 (the exact key, if present, sorts
    * FIRST among keys sharing it as a prefix — ONE max-keys=1 page
    * replaces HEAD and keeps the whole client on two verbs; never
    * paginates, a stat must stay O(1) requests). */
  private def headObject(key: String): Option[Long] = {
    if (key.isEmpty) return None
    val q = Seq("list-type" -> "2", "prefix" -> key, "max-keys" -> "1")
    val (code, body, _) = request("GET", "", q)
    if (code / 100 != 2) fail(s"ListObjectsV2 $key", code, body)
    val xml = new String(body, StandardCharsets.UTF_8)
    ContentsRe.findFirstMatchIn(xml).flatMap { m =>
      val blk = m.group(1)
      for {
        k <- KeyRe.findFirstMatchIn(blk).map(x => xmlUnescape(x.group(1)))
        if k == key
        sz <- SizeRe.findFirstMatchIn(blk).map(_.group(1).toLong)
      } yield sz
    }
  }

  private val ContentsRe = "(?s)<Contents>(.*?)</Contents>".r
  private val KeyRe = "(?s)<Key>(.*?)</Key>".r
  private val SizeRe = "<Size>(\\d+)</Size>".r
  private val PrefixBlockRe = "(?s)<CommonPrefixes>(.*?)</CommonPrefixes>".r
  private val PrefixRe = "(?s)<Prefix>(.*?)</Prefix>".r
  private val TruncRe = "<IsTruncated>\\s*(true|false)\\s*</IsTruncated>".r
  private val TokenRe = "(?s)<NextContinuationToken>(.*?)</NextContinuationToken>".r

  /** Undo the XML escaping ListObjectsV2 applies to key/prefix text —
    * the five entities plus numeric character references. */
  private[sinks] def xmlUnescape(s: String): String = {
    if (!s.contains('&')) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val end = s.indexOf(';', i + 1)
        val ent = if (end < 0) "" else s.substring(i + 1, end)
        val rep: String = ent match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case e if e.startsWith("#x") || e.startsWith("#X") =>
            try new String(Character.toChars(Integer.parseInt(e.drop(2), 16)))
            catch { case _: Exception => null }
          case e if e.startsWith("#") =>
            try new String(Character.toChars(Integer.parseInt(e.drop(1))))
            catch { case _: Exception => null }
          case _ => null
        }
        if (rep != null) { out.append(rep); i = end + 1 }
        else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Full ListObjectsV2 (continuation-token pagination — real S3 clamps
    * each page at 1000 keys, so a single-page read of a >1000-object tree
    * would silently truncate and rename/delete would move a PARTIAL tree).
    * Parsing is block-tolerant: a `<Contents>` element is located first,
    * then `<Key>`/`<Size>` extracted WITHIN it — real S3/MinIO interleave
    * LastModified/ETag/Owner/StorageClass between them — and key text is
    * XML-unescaped. Truncation without a continuation token fails loudly
    * rather than returning a partial listing as complete. */
  private def list(prefix: String, delimiter: Option[String])
      : (Seq[(String, Long)], Seq[String]) = {
    val objects = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val prefixes = scala.collection.mutable.ArrayBuffer.empty[String]
    var token: Option[String] = None
    var more = true
    while (more) {
      val q = Seq("list-type" -> "2", "prefix" -> prefix,
        "max-keys" -> "1000") ++ delimiter.map("delimiter" -> _) ++
        token.map("continuation-token" -> _)
      val (code, body, _) = request("GET", "", q)
      if (code / 100 != 2) fail(s"ListObjectsV2 $prefix", code, body)
      val xml = new String(body, StandardCharsets.UTF_8)
      ContentsRe.findAllMatchIn(xml).foreach { m =>
        val blk = m.group(1)
        for {
          k <- KeyRe.findFirstMatchIn(blk).map(x => xmlUnescape(x.group(1)))
          sz <- SizeRe.findFirstMatchIn(blk).map(_.group(1).toLong)
        } objects += k -> sz
      }
      PrefixBlockRe.findAllMatchIn(xml).foreach { m =>
        PrefixRe.findFirstMatchIn(m.group(1))
          .foreach(x => prefixes += xmlUnescape(x.group(1)))
      }
      val truncated = TruncRe.findFirstMatchIn(xml).exists(_.group(1) == "true")
      token = TokenRe.findFirstMatchIn(xml).map(x => xmlUnescape(x.group(1)))
      if (truncated && token.isEmpty)
        throw new java.io.IOException(
          s"ListObjectsV2 $prefix: IsTruncated without NextContinuationToken")
      more = truncated
    }
    (objects.toSeq, prefixes.distinct.toSeq)
  }

  private def fileStatus(p: Path, len: Long, dir: Boolean): FileStatus =
    new FileStatus(len, dir, 1, 64L * 1024 * 1024, 0L,
      p.makeQualified(fsUri, workDir))

  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (key.isEmpty) return fileStatus(f, 0, dir = true) // bucket root
    headObject(key) match {
      case Some(len) => fileStatus(f, len, dir = false)
      case None =>
        // a "directory" exists iff any key lives under it (incl. marker);
        // a single max-keys=1 page answers that — never paginate for a stat
        val q = Seq("list-type" -> "2", "prefix" -> s"$key/", "max-keys" -> "1")
        val (code, body, _) = request("GET", "", q)
        if (code / 100 != 2) fail(s"ListObjectsV2 $key/", code, body)
        val xml = new String(body, StandardCharsets.UTF_8)
        if (ContentsRe.findFirstMatchIn(xml).nonEmpty)
          fileStatus(f, 0, dir = true)
        else throw new FileNotFoundException(f.toString)
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    val st = getFileStatus(f)
    if (!st.isDirectory) return Array(st)
    val prefix = if (key.isEmpty) "" else s"$key/"
    val (objs, prefixes) = list(prefix, Some("/"))
    val files = objs.filterNot(_._1 == prefix).map { case (k, len) =>
      fileStatus(new Path(s"${fsUri}/$k"), len, dir = false)
    }
    val dirs = prefixes.map(p =>
      fileStatus(new Path(s"${fsUri}/${p.stripSuffix("/")}"), 0, dir = true))
    (files ++ dirs).toArray
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val key = keyOf(f)
    if (key.isEmpty) return true
    if (headObject(key).nonEmpty)
      throw new FileAlreadyExistsException(s"$f exists as a file")
    // zero-byte dir marker, the S3A convention for EMPTY directories
    val (code, body, _) = request("PUT", s"$key/", Nil, Array.emptyByteArray)
    if (code / 100 != 2) fail(s"mkdirs $key/", code, body)
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val key = keyOf(f)
    val st = try getFileStatus(f) catch {
      case _: FileNotFoundException => return false
    }
    if (!st.isDirectory) {
      val (code, body, _) = request("DELETE", key)
      if (code / 100 != 2 && code != 404) fail(s"DELETE $key", code, body)
      return true
    }
    val (objs, _) = list(if (key.isEmpty) "" else s"$key/", None)
    if (!recursive && objs.exists(_._1 != s"$key/"))
      throw new java.io.IOException(s"$f is a non-empty directory")
    (objs.map(_._1) :+ s"$key/").distinct.foreach { k =>
      val (code, body, _) = request("DELETE", k)
      if (code / 100 != 2 && code != 404) fail(s"DELETE $k", code, body)
    }
    true
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val srcSt = try getFileStatus(src) catch {
      case _: FileNotFoundException => return false
    }
    val srcKey = keyOf(src)
    // committer semantics: rename INTO an existing directory nests src
    val dstKey0 = keyOf(dst)
    val dstKey = (try Some(getFileStatus(dst)) catch {
      case _: FileNotFoundException => None
    }) match {
      case Some(d) if d.isDirectory => s"$dstKey0/${src.getName}"
      case Some(_) => return false // file already at destination
      case None => dstKey0
    }
    def copyDelete(from: String, to: String): Unit = {
      val (code, body, _) = request("PUT", to,
        copySource = Some(s"/$bucket/${S3Sig.encPath(from)}"))
      if (code / 100 != 2) fail(s"COPY $from -> $to", code, body)
      val (dc, db, _) = request("DELETE", from)
      if (dc / 100 != 2 && dc != 404) fail(s"DELETE $from", dc, db)
    }
    if (!srcSt.isDirectory) copyDelete(srcKey, dstKey)
    else {
      val (objs, _) = list(s"$srcKey/", None)
      objs.foreach { case (k, _) =>
        copyDelete(k, s"$dstKey/${k.stripPrefix(s"$srcKey/")}")
      }
      request("DELETE", s"$srcKey/") // the marker, if any
    }
    true
  }
}

/** AWS Signature Version 4 (the published algorithm: canonical request →
  * string-to-sign → HMAC chain) for the lite S3 client. The loopback stub
  * VERIFIES these signatures with the shared secret — mutual proof the
  * wire format is right, the same discipline as the SCRAM loopback. */
object S3Sig {
  private def sha256Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map("%02x".format(_)).mkString

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** RFC 3986 encoding with the S3 variant (spaces %20, '/' kept only via
    * [[encPath]]). */
  def enc(s: String): String =
    URLEncoder.encode(s, "UTF-8").replace("+", "%20")
      .replace("*", "%2A").replace("%7E", "~")

  def encPath(key: String): String = key.split("/", -1).map(enc).mkString("/")

  /** Compute the Authorization header for one request and set it (plus
    * x-amz-date/x-amz-content-sha256) on the connection. `extraHeaders`
    * that are x-amz-* are signed; others (range) ride unsigned. */
  def sign(c: HttpURLConnection, method: String, path: String,
      query: Seq[(String, String)], payload: Array[Byte], host: String,
      region: String, access: String, secret: String,
      extraHeaders: Seq[(String, String)] = Nil): Unit = {
    val amzDate = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    val date = amzDate.take(8)
    val payloadHash = sha256Hex(payload)
    val signedExtra = extraHeaders.filter(_._1.startsWith("x-amz-"))
    extraHeaders.foreach { case (k, v) => c.setRequestProperty(k, v) }
    c.setRequestProperty("x-amz-date", amzDate)
    c.setRequestProperty("x-amz-content-sha256", payloadHash)
    if (access.isEmpty) return // anonymous: stub accepts unsigned too
    val headers = (Seq(
      "host" -> host,
      "x-amz-content-sha256" -> payloadHash,
      "x-amz-date" -> amzDate) ++ signedExtra).sortBy(_._1)
    val canonicalQuery = query
      .map { case (k, v) => enc(k) -> (if (v == null) "" else enc(v)) }
      .sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
    val canonical = Seq(method, path, canonicalQuery,
      headers.map { case (k, v) => s"$k:${v.trim}" }.mkString("", "\n", "\n"),
      headers.map(_._1).mkString(";"), payloadHash).mkString("\n")
    val scope = s"$date/$region/s3/aws4_request"
    val toSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonical.getBytes(StandardCharsets.UTF_8))).mkString("\n")
    val kSigning = hmac(hmac(hmac(hmac(
      s"AWS4$secret".getBytes(StandardCharsets.UTF_8), date),
      region), "s3"), "aws4_request")
    val sig = hmac(kSigning, toSign).map("%02x".format(_)).mkString
    c.setRequestProperty("Authorization",
      s"AWS4-HMAC-SHA256 Credential=$access/$scope, " +
        s"SignedHeaders=${headers.map(_._1).mkString(";")}, Signature=$sig")
  }
}
