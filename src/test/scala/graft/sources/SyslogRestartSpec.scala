package graft.sources

import java.io.OutputStreamWriter
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

/** Restart-safety and admission control for the `graft-syslog` source: an
  * instance epoch in every offset (a checkpointed WAL entry from a dead
  * instance must fail loudly, never alias onto the fresh buffer), strict
  * slice bounds, and a blocking buffer cap (TCP-flow-control backpressure,
  * the reference's bounded-channel behavior, src/sink/kafka.rs:224-226).
  */
class SyslogRestartSpec extends AnyFunSuite {

  test("offsets carry the instance epoch; a foreign epoch fails loudly at replan") {
    val stream = new SyslogMicroBatchStream(
      new CaseInsensitiveStringMap(java.util.Map.of("port", "0")))
    try {
      val init = stream.initialOffset().asInstanceOf[SyslogOffset]
      assert(init.epoch != 0L && init.n == 0L)
      // round-trips through the checkpoint json form
      assert(stream.deserializeOffset(init.json()) == init)
      // legacy bare-counter checkpoints parse to epoch 0 — never a live epoch
      assert(SyslogOffset.parse("42") == SyslogOffset(0L, 42L))
      // a WAL entry from a previous instance must not replan against the
      // fresh buffer (offset aliasing) — it must raise the restart story
      val foreign = SyslogOffset(init.epoch + 1, 0L)
      val e = intercept[IllegalStateException] {
        stream.planInputPartitions(foreign, foreign)
      }
      assert(e.getMessage.contains("cannot replay"))
      // same guard on commit — a stale-epoch trim must not touch the buffer
      intercept[IllegalStateException] { stream.commit(foreign) }
    } finally stream.stop()
  }

  test("slice rejects an upper bound past the buffer instead of short-planning") {
    val srv = new LineServer("127.0.0.1", 0, None)
    try {
      val e = intercept[IllegalArgumentException] { srv.slice(0L, 5L) }
      assert(e.getMessage.contains("exceed the buffered range"))
    } finally srv.close()
  }

  test("buffer cap blocks the reader (TCP backpressure); trim releases it") {
    val srv = new LineServer("127.0.0.1", 0, None, maxBufferedLines = 2)
    try {
      val sock = new java.net.Socket("127.0.0.1", srv.boundPort)
      val w = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8)
      (1 to 5).foreach(i => w.write(s"line $i\n"))
      w.flush()
      val deadline = System.currentTimeMillis() + 10000
      while (srv.latest < 2 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      // reader parked at the cap: buffer holds exactly maxBufferedLines
      Thread.sleep(300)
      assert(srv.latest == 2L, s"buffer should cap at 2, got ${srv.latest}")
      // commit (trim) wakes the reader; the remaining lines flow in
      srv.trim(2L)
      while (srv.latest < 4 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      srv.trim(4L)
      while (srv.latest < 5 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(srv.latest == 5L)
      assert(srv.slice(4L, 5L).toSeq == Seq("line 5"))
      sock.close()
    } finally srv.close()
  }
}
