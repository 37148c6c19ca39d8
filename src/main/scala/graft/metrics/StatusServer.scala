package graft.metrics

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import scala.jdk.CollectionConverters._

/** The reference's HTTP status server (O25, src/status.rs:23-40):
  * `GET /` returns the banner, `GET /stats` returns a JSON map of stats.
  * Pure-JDK HttpServer, no dependencies.
  *
  * The reference's /stats actually serializes a default (EMPTY) HashMap —
  * src/status.rs:30-36 never wires the dipstick registry in. We reproduce
  * the exact empty-map response at startup and go strictly further: a
  * [[StatusServer.update]]d registry (fed by GraftPipeline.MetricsListener)
  * surfaces the latest per-batch metric values.
  */
final class StatusServer(port: Int) extends AutoCloseable {
  private val stats = new ConcurrentHashMap[String, Long]()
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  private def respond(ex: HttpExchange, status: Int, body: String,
      contentType: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/", (ex: HttpExchange) =>
    ex.getRequestURI.getPath match {
      case "/" => respond(ex, 200, "hotdog status server", "text/plain")
      case "/stats" =>
        val body = stats.asScala.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":$v""" }
          .mkString("{", ",", "}")
        respond(ex, 200, body, "application/json")
      case _ => respond(ex, 404, "not found", "text/plain")
    })
  server.setExecutor(null) // JDK default executor
  server.start()

  def boundPort: Int = server.getAddress.getPort
  def update(name: String, value: Long): Unit = stats.put(name, value)
  override def close(): Unit = server.stop(0)
}
