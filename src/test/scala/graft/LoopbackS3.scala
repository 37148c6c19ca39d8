package graft

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process S3-API stub — the object-store sibling of
  * [[graft.tools.EmbeddedKafka.LoopbackBroker]]: an HTTP server implementing enough of
  * the public S3 REST protocol (PUT/GET/HEAD/DELETE object, ranged GET,
  * ListObjectsV2, server-side COPY, and the full multipart-upload
  * handshake) over an in-memory object map, VERIFYING every request's
  * SigV4 signature against the configured credentials — so the spec proves
  * graft's wire client signs correctly, not merely that bytes moved.
  *
  * Responses are REAL-AWS-SHAPED: ListObjectsV2 interleaves LastModified/
  * ETag/Owner/StorageClass between Key and Size, XML-escapes key text,
  * clamps pages at max-keys and paginates with IsTruncated +
  * NextContinuationToken — so a client that only parses the stub's
  * happy-path XML fails here exactly as it would against S3/MinIO.
  *
  * Exhibits for specs: [[multipartInitiated]]/[[partPuts]]/
  * [[multipartCompleted]]/[[abortedUploads]]/[[pendingUploads]] count the
  * multipart protocol steps; [[authFailures]] counts rejected signatures;
  * [[objects]] is the live keyspace; [[throttleRemaining]]/[[throttled]]
  * inject and count 503-SlowDown faults.
  */
final class LoopbackS3(access: String = "", secret: String = "")
    extends AutoCloseable {
  val objects = new ConcurrentHashMap[String, Array[Byte]]()
  private val uploads = new ConcurrentHashMap[String, (String, ConcurrentHashMap[Int, Array[Byte]])]()
  private val nextUpload = new AtomicInteger(1)
  val multipartInitiated = new AtomicInteger(0)
  val partPuts = new AtomicInteger(0)
  val multipartCompleted = new AtomicInteger(0)
  val plainPuts = new AtomicInteger(0)
  val authFailures = new AtomicInteger(0)

  /** Pending (initiated, never completed/aborted) multipart uploads —
    * what a real store would bill until aborted. */
  def pendingUploads: Int = uploads.size()
  val abortedUploads = new AtomicInteger(0)

  /** Fault injection: the next [[throttleRemaining]] requests answer
    * [[throttleCode]] (`503 SlowDown` by default — the routine real-S3
    * throttle) before the store behaves again; [[throttled]] counts the
    * injected failures so specs can prove the client actually retried. */
  val throttleRemaining = new AtomicInteger(0)
  @volatile var throttleCode: Int = 503
  val throttled = new AtomicInteger(0)

  /** Page-size clamp for ListObjectsV2 (real S3 clamps max-keys at 1000;
    * specs lower it to exercise continuation-token pagination cheaply). */
  @volatile var maxKeysClamp: Int = 1000

  private def xmlEsc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case '\'' => "&apos;"
      case c => c.toString
    }

  private val server = HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 64)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))

  def port: Int = server.getAddress.getPort
  def endpoint: String = s"http://127.0.0.1:$port"

  private def queryMap(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map(_.split('&').map { kv =>
      kv.split("=", 2) match {
        case Array(k) => dec(k) -> ""
        case Array(k, v) => dec(k) -> dec(v)
      }
    }.toMap).getOrElse(Map.empty)

  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  private def respond(ex: HttpExchange, code: Int,
      body: Array[Byte] = Array.emptyByteArray,
      headers: Seq[(String, String)] = Nil): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    if (ex.getRequestMethod == "HEAD") {
      // HttpServer: HEAD responses declare the length via header, send none
      ex.getResponseHeaders.set("Content-Length", body.length.toString)
      ex.sendResponseHeaders(code, -1)
    } else ex.sendResponseHeaders(code,
      if (body.isEmpty) -1 else body.length.toLong)
    if (ex.getRequestMethod != "HEAD" && body.nonEmpty)
      ex.getResponseBody.write(body)
    ex.close()
  }

  /** Recompute the SigV4 signature exactly as the published algorithm and
    * compare — the server half of the mutual proof. */
  private def verifySig(ex: HttpExchange, payload: Array[Byte]): Boolean = {
    if (access.isEmpty) return true
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
    val m = ("AWS4-HMAC-SHA256 Credential=([^/]+)/(\\d{8})/([^/]+)/s3/aws4_request, " +
      "SignedHeaders=([^,]+), Signature=([0-9a-f]{64})").r
    m.findFirstMatchIn(auth) match {
      case None => authFailures.incrementAndGet(); false
      case Some(g) =>
        if (g.group(1) != access) { authFailures.incrementAndGet(); return false }
        val (date, region, signedHeaders, theirSig) =
          (g.group(2), g.group(3), g.group(4), g.group(5))
        val headerVals = signedHeaders.split(';').map { h =>
          val v = if (h == "host") ex.getRequestHeaders.getFirst("Host")
            else ex.getRequestHeaders.getFirst(h)
          h -> Option(v).getOrElse("")
        }
        val canonicalQuery = queryMap(ex).toSeq
          .map { case (k, v) => graft.sinks.S3Sig.enc(k) ->
            graft.sinks.S3Sig.enc(v) }
          .sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
        def sha(b: Array[Byte]) = java.security.MessageDigest
          .getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString
        val canonical = Seq(ex.getRequestMethod,
          ex.getRequestURI.getRawPath, canonicalQuery,
          headerVals.map { case (k, v) => s"$k:${v.trim}" }
            .mkString("", "\n", "\n"),
          signedHeaders, sha(payload)).mkString("\n")
        val amzDate = ex.getRequestHeaders.getFirst("x-amz-date")
        val scope = s"$date/$region/s3/aws4_request"
        val toSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
          sha(canonical.getBytes(StandardCharsets.UTF_8))).mkString("\n")
        def hmac(key: Array[Byte], data: String): Array[Byte] = {
          val mac = javax.crypto.Mac.getInstance("HmacSHA256")
          mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
          mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
        }
        val kSigning = hmac(hmac(hmac(hmac(
          s"AWS4$secret".getBytes(StandardCharsets.UTF_8), date),
          region), "s3"), "aws4_request")
        val ourSig = hmac(kSigning, toSign).map("%02x".format(_)).mkString
        val ok = ourSig == theirSig
        if (!ok) authFailures.incrementAndGet()
        ok
    }
  }

  server.createContext("/", (ex: HttpExchange) => {
    try handle(ex)
    catch {
      case e: Exception =>
        respond(ex, 500, s"<Error>${e.getMessage}</Error>"
          .getBytes(StandardCharsets.UTF_8))
    }
  })

  private def handle(ex: HttpExchange): Unit = {
    val payload = ex.getRequestBody.readAllBytes()
    if (throttleRemaining.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      throttled.incrementAndGet()
      respond(ex, throttleCode,
        "<Error><Code>SlowDown</Code><Message>Please reduce your request rate.</Message></Error>"
          .getBytes(StandardCharsets.UTF_8))
      return
    }
    if (!verifySig(ex, payload)) { respond(ex, 403); return }
    val raw = ex.getRequestURI.getRawPath.stripPrefix("/")
    val (bucket, key) = raw.split("/", 2) match {
      case Array(b) => (b, "")
      case Array(b, k) => (b, dec(k))
    }
    val q = queryMap(ex)
    val full = s"$bucket/$key"
    ex.getRequestMethod match {
      case "PUT" if q.contains("partNumber") =>
        val id = q("uploadId")
        Option(uploads.get(id)) match {
          case None => respond(ex, 404)
          case Some((_, parts)) =>
            partPuts.incrementAndGet()
            parts.put(q("partNumber").toInt, payload)
            respond(ex, 200, headers = Seq("ETag" -> s""""p-${q("partNumber")}""""))
        }
      case "PUT" if ex.getRequestHeaders.containsKey("x-amz-copy-source") =>
        val src = dec(ex.getRequestHeaders.getFirst("x-amz-copy-source"))
          .stripPrefix("/")
        Option(objects.get(src)) match {
          case None => respond(ex, 404)
          case Some(b) =>
            objects.put(full, b)
            respond(ex, 200,
              "<CopyObjectResult><ETag>\"c\"</ETag></CopyObjectResult>"
                .getBytes(StandardCharsets.UTF_8))
        }
      case "PUT" =>
        plainPuts.incrementAndGet()
        objects.put(full, payload)
        respond(ex, 200, headers = Seq("ETag" -> "\"obj\""))
      case "POST" if q.contains("uploads") =>
        val id = s"up-${nextUpload.getAndIncrement()}"
        multipartInitiated.incrementAndGet()
        uploads.put(id, (full, new ConcurrentHashMap[Int, Array[Byte]]()))
        respond(ex, 200,
          (s"<InitiateMultipartUploadResult><Bucket>$bucket</Bucket>" +
            s"<Key>$key</Key><UploadId>$id</UploadId>" +
            "</InitiateMultipartUploadResult>").getBytes(StandardCharsets.UTF_8))
      case "POST" if q.contains("uploadId") =>
        val id = q("uploadId")
        Option(uploads.remove(id)) match {
          case None => respond(ex, 404)
          case Some((k, parts)) =>
            multipartCompleted.incrementAndGet()
            val whole = new java.io.ByteArrayOutputStream()
            parts.keySet().stream().sorted().forEach(n =>
              whole.write(parts.get(n)))
            objects.put(k, whole.toByteArray)
            respond(ex, 200,
              (s"<CompleteMultipartUploadResult><Key>$k</Key>" +
                "</CompleteMultipartUploadResult>")
                .getBytes(StandardCharsets.UTF_8))
        }
      case "GET" if key.isEmpty && q.get("list-type").contains("2") =>
        // Real-AWS response shape: Contents carry LastModified/ETag/Owner/
        // StorageClass INTERLEAVED with Key/Size (the fields the client
        // must tolerate), key text is XML-escaped, and pages clamp at
        // max-keys (≤ maxKeysClamp) with IsTruncated +
        // NextContinuationToken pagination over the merged
        // lexicographic (Contents ∪ CommonPrefixes) order.
        val prefix = q.getOrElse("prefix", "")
        val delim = q.get("delimiter")
        val keys = objects.keySet().stream().sorted().toArray
          .map(_.toString).filter(_.startsWith(s"$bucket/"))
          .map(_.stripPrefix(s"$bucket/")).filter(_.startsWith(prefix))
        val (direct, rolled) = delim match {
          case None => (keys.toSeq, Nil)
          case Some(d) =>
            val (nested, flat) = keys.partition(
              _.stripPrefix(prefix).contains(d))
            (flat.toSeq, nested.map(k => prefix +
              k.stripPrefix(prefix).takeWhile(_ != d.head) + d)
              .distinct.toSeq)
        }
        // merged lexicographic entries: Left = object key, Right = prefix
        val entries = (direct.map(Left(_)) ++ rolled.map(Right(_)))
          .sortBy(_.fold(identity, identity))
        val after = q.get("continuation-token").map(t => new String(
          java.util.Base64.getDecoder.decode(t), StandardCharsets.UTF_8))
        val fromStart = after match {
          case None => entries
          case Some(a) => entries.dropWhile(_.fold(identity, identity) <= a)
        }
        val pageSize = math.min(maxKeysClamp,
          q.get("max-keys").map(_.toInt).getOrElse(1000))
        val page = fromStart.take(pageSize)
        val truncated = fromStart.length > pageSize
        val contents = page.collect { case Left(k) =>
          s"<Contents><Key>${xmlEsc(k)}</Key>" +
            "<LastModified>2026-01-01T00:00:00.000Z</LastModified>" +
            "<ETag>&quot;d41d8cd98f00b204e9800998ecf8427e&quot;</ETag>" +
            s"<Size>${objects.get(s"$bucket/$k").length}</Size>" +
            "<Owner><ID>graft-loopback</ID><DisplayName>graft</DisplayName></Owner>" +
            "<StorageClass>STANDARD</StorageClass></Contents>"
        }.mkString
        val prefixes = page.collect { case Right(p) =>
          s"<CommonPrefixes><Prefix>${xmlEsc(p)}</Prefix></CommonPrefixes>"
        }.mkString
        val nextToken =
          if (!truncated) ""
          else "<NextContinuationToken>" + java.util.Base64.getEncoder
            .encodeToString(page.last.fold(identity, identity)
              .getBytes(StandardCharsets.UTF_8)) + "</NextContinuationToken>"
        respond(ex, 200,
          (s"<ListBucketResult><Name>${xmlEsc(bucket)}</Name>" +
            s"<Prefix>${xmlEsc(prefix)}</Prefix><KeyCount>${page.length}</KeyCount>" +
            s"<MaxKeys>$pageSize</MaxKeys><IsTruncated>$truncated</IsTruncated>" +
            s"$contents$prefixes$nextToken" +
            "</ListBucketResult>").getBytes(StandardCharsets.UTF_8))
      case "GET" =>
        Option(objects.get(full)) match {
          case None => respond(ex, 404)
          case Some(b) =>
            Option(ex.getRequestHeaders.getFirst("Range")) match {
              case Some(r) =>
                val m = "bytes=(\\d+)-(\\d+)".r.findFirstMatchIn(r).get
                val from = m.group(1).toLong.toInt
                val to = math.min(m.group(2).toLong, b.length - 1L).toInt
                respond(ex, 206, java.util.Arrays.copyOfRange(b, from, to + 1))
              case None => respond(ex, 200, b)
            }
        }
      case "HEAD" =>
        Option(objects.get(full)) match {
          case None => respond(ex, 404)
          case Some(b) => respond(ex, 200, b)
        }
      case "DELETE" if q.contains("uploadId") =>
        // AbortMultipartUpload: drop the pending parts, bill nothing
        Option(uploads.remove(q("uploadId"))) match {
          case None => respond(ex, 404)
          case Some(_) => abortedUploads.incrementAndGet(); respond(ex, 204)
        }
      case "DELETE" =>
        objects.remove(full)
        respond(ex, 204)
      case _ => respond(ex, 405)
    }
  }

  server.start()
  override def close(): Unit = server.stop(0)
}
