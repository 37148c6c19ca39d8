package graft

import graft.queries.Synth
import graft.sinks.{ByteThresholdParquetSink, ObjectStoreConfig, RoutedSink}
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Loopback-S3 end-to-end for the parquet sink (r12 verdict item 3): the
  * reference writes through `object_store` to S3-compatible storage
  * (src/sink/parquet.rs:238-290, path at :258); here graft's own
  * S3-protocol FileSystem ([[graft.sinks.S3LiteFileSystem]]) drives
  * [[RoutedSink.writeRouted]] and [[ByteThresholdParquetSink]] through
  * `s3a://` URLs against an in-process S3-API stub ([[LoopbackS3]]) that
  * VERIFIES every SigV4 signature — real multipart PUTs, real list/rename
  * commit protocol, read-back asserted, the loopback-Kafka discipline
  * applied to the object-store path.
  */
class S3SinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Access = "AKIDGRAFTTEST"
  private val Secret = "graft-s3-loopback-secret"

  /** Stub + hadoop-conf wiring; tiny part size so multipart really runs,
    * tiny retry base so the backoff specs stay fast. */
  private def withStub(secretOnClient: String = Secret, attempts: Int = 5)
      (f: LoopbackS3 => Unit): Unit = {
    val stub = new LoopbackS3(Access, Secret)
    val h = spark.sparkContext.hadoopConfiguration
    h.set("fs.s3a.impl", "graft.sinks.S3LiteFileSystem")
    h.set("fs.s3a.impl.disable.cache", "true")
    h.set("fs.s3a.endpoint", stub.endpoint)
    h.set("fs.s3a.connection.ssl.enabled", "false")
    h.set("fs.s3a.access.key", Access)
    h.set("fs.s3a.secret.key", secretOnClient)
    h.set("fs.s3a.multipart.size", "8192")
    h.set("fs.s3a.attempts.maximum", attempts.toString)
    h.set("fs.s3a.retry.interval", "10")
    try f(stub) finally stub.close()
  }

  test("FS contract: multipart create, ranged read-back, list, rename, " +
    "delete — signatures verified by the stub") {
    withStub() { stub =>
      val fs = new Path("s3a://bkt-fs/").getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val p = new Path("s3a://bkt-fs/dir/blob.bin")
      val data = Array.tabulate[Byte](20000)(i => (i * 31 % 251).toByte)
      val out = fs.create(p, true)
      out.write(data); out.close()
      // 20000 bytes over 8192-byte parts → initiate + 2 full + 1 tail
      assert(stub.multipartInitiated.get() == 1, "multipart must initiate")
      assert(stub.partPuts.get() == 3,
        s"2 full parts + tail, got ${stub.partPuts.get()}")
      assert(stub.multipartCompleted.get() == 1)
      assert(stub.authFailures.get() == 0, "every request must verify")
      // stat + sequential read
      assert(fs.getFileStatus(p).getLen == 20000L)
      val in = fs.open(p)
      val back = in.readAllBytes(); in.close()
      assert(back.toSeq == data.toSeq, "multipart reassembly must be exact")
      // ranged read (the parquet footer pattern): seek into the tail
      val in2 = fs.open(p)
      in2.seek(19990)
      val tail = new Array[Byte](10); in2.readFully(tail); in2.close()
      assert(tail.toSeq == data.slice(19990, 20000).toSeq)
      // namespace: list parent, rename, delete
      assert(fs.listStatus(new Path("s3a://bkt-fs/dir"))
        .map(_.getPath.getName).toSeq == Seq("blob.bin"))
      assert(fs.rename(p, new Path("s3a://bkt-fs/dir2/blob2.bin")))
      assert(!fs.exists(p))
      assert(fs.getFileStatus(new Path("s3a://bkt-fs/dir2/blob2.bin")).getLen == 20000L)
      assert(fs.delete(new Path("s3a://bkt-fs/dir2"), true))
      assert(!fs.exists(new Path("s3a://bkt-fs/dir2/blob2.bin")))
    }
  }

  test("writeRouted drives the full parquet commit protocol through " +
    "s3a:// — mkdirs/rename/list against the stub, read-back equal") {
    withStub() { stub =>
      import spark.implicits._
      val cfg = Synth.HotdogConfig.copy(schemas = Map.empty)
      val routed = Seq(
        "logs-a" -> """{"i":1}""", "logs-a" -> """{"i":2}""",
        "logs-b" -> """{"i":3}""").toDF("topic", "value")
      // the reference's scheme contract: s3:// resolves to the connector
      RoutedSink.writeRouted(routed, cfg, "s3://bkt-route/out")
      val keys = stub.objects.keySet().toArray.map(_.toString).toSeq
      assert(keys.exists(k => k.startsWith("bkt-route/out/topic=logs-a/") &&
        k.endsWith(".parquet")), s"parquet objects must land per topic: $keys")
      assert(stub.authFailures.get() == 0)
      val back = spark.read.parquet("s3a://bkt-route/out")
      assert(back.count() == 3L)
      assert(back.where($"topic" === "logs-a").count() == 2L)
    }
  }

  test("ByteThresholdParquetSink drains its buffer map to s3a:// — the " +
    "reference's object-store delivery end-to-end") {
    withStub() { stub =>
      import spark.implicits._
      val cfg = Synth.HotdogConfig.copy(schemas = Map.empty,
        parquetBufferBytes = Some(64L), flushMs = 3600000L)
      val sink = new ByteThresholdParquetSink(cfg, "s3a://bkt-buf/buffered")
      try {
        sink.addBatch(Seq("t1" -> "under-threshold").toDF("topic", "value"), 0L)
        assert(stub.objects.isEmpty, "below threshold nothing reaches the store")
        sink.addBatch(Seq("t1" -> ("x" * 100)).toDF("topic", "value"), 1L)
        // any-over-threshold drains ALL buffered epochs to the store
        val back = spark.read.parquet("s3a://bkt-buf/buffered")
        assert(back.count() == 2L,
          "both buffered epochs must land in one drain")
      } finally sink.close()
    }
  }

  test("a wrong secret is rejected by the stub's SigV4 verification — " +
    "fail-closed, nothing stored") {
    withStub(secretOnClient = "not-the-secret") { stub =>
      val fs = new Path("s3a://bkt-bad/").getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new Path("s3a://bkt-bad/x.bin"), true)
      out.write(Array[Byte](1, 2, 3))
      val e = intercept[java.io.IOException](out.close())
      assert(e.getMessage.contains("403"), s"must fail closed: ${e.getMessage}")
      assert(stub.authFailures.get() > 0, "the stub must count the rejection")
      assert(stub.objects.isEmpty, "nothing may be stored unauthenticated")
    }
  }

  test("ListObjectsV2 pagination + AWS-shaped XML: a >page-size tree " +
    "lists, renames and deletes COMPLETELY, escaped key names intact") {
    withStub() { stub =>
      stub.maxKeysClamp = 10 // force continuation-token pagination
      val fs = new Path("s3a://bkt-page/").getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // 25 plain keys + 1 key whose name needs XML escaping end-to-end
      val names = (0 until 25).map(i => f"part-$i%03d.bin") :+ "a&b<c>'d.bin"
      names.foreach { n =>
        val out = fs.create(new Path(s"s3a://bkt-page/dir/$n"), true)
        out.write(Array[Byte](1, 2, 3)); out.close()
      }
      val listed = fs.listStatus(new Path("s3a://bkt-page/dir"))
        .map(_.getPath.getName).toSet
      assert(listed == names.toSet,
        s"pagination must surface ALL keys: missing ${names.toSet -- listed}")
      // rename must move the FULL tree (the silent-partial-tree failure)
      assert(fs.rename(new Path("s3a://bkt-page/dir"),
        new Path("s3a://bkt-page/dir2")))
      val moved = fs.listStatus(new Path("s3a://bkt-page/dir2"))
        .map(_.getPath.getName).toSet
      assert(moved == names.toSet, "rename must move every object")
      assert(!fs.exists(new Path("s3a://bkt-page/dir")))
      assert(fs.delete(new Path("s3a://bkt-page/dir2"), true))
      assert(stub.objects.keySet().toArray.map(_.toString)
        .count(_.startsWith("bkt-page/")) == 0, "recursive delete must drain")
      assert(stub.authFailures.get() == 0)
    }
  }

  test("503 SlowDown throttling: the client retries with backoff and " +
    "converges — the object_store retry behavior on the lite path") {
    withStub() { stub =>
      val fs = new Path("s3a://bkt-throttle/").getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      stub.throttleRemaining.set(3) // first three requests bounce 503
      val out = fs.create(new Path("s3a://bkt-throttle/x.bin"), true)
      out.write(Array[Byte](9, 9, 9)); out.close()
      assert(stub.throttled.get() == 3, "the faults must have been served")
      assert(fs.getFileStatus(new Path("s3a://bkt-throttle/x.bin")).getLen == 3L,
        "the write must converge after riding out the throttle")
    }
  }

  test("a throttle outlasting fs.s3a.attempts.maximum stays terminal — " +
    "bounded retries, no infinite spin") {
    withStub(attempts = 2) { stub =>
      val fs = new Path("s3a://bkt-term/").getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      stub.throttleRemaining.set(1000)
      val out = fs.create(new Path("s3a://bkt-term/x.bin"), true)
      out.write(Array[Byte](1))
      val e = intercept[java.io.IOException](out.close())
      assert(e.getMessage.contains("503"), s"terminal 503: ${e.getMessage}")
      stub.throttleRemaining.set(0)
      assert(stub.objects.isEmpty, "nothing may land through a dead store")
    }
  }

  test("a failed UploadPart ABORTS the multipart upload — no leaked " +
    "billed parts on real stores") {
    withStub(attempts = 1) { stub =>
      val fs = new Path("s3a://bkt-abort/").getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new Path("s3a://bkt-abort/big.bin"), true)
      out.write(new Array[Byte](8192)) // part 1 ships fine
      assert(stub.multipartInitiated.get() == 1)
      stub.throttleRemaining.set(1) // exactly the next part bounces
      intercept[java.io.IOException](out.write(new Array[Byte](8192)))
      assert(stub.abortedUploads.get() == 1, "the upload must be aborted")
      assert(stub.pendingUploads == 0, "no pending upload may remain billed")
      out.close() // idempotent after the failure — must not throw
    }
  }

  test("ObjectStoreConfig installs the lite client only when hadoop-aws " +
    "is absent, alongside the reference's env contract") {
    val (url, conf) = ObjectStoreConfig.resolve("s3://bucket/prefix",
      Map("AWS_ACCESS_KEY_ID" -> "k", "AWS_SECRET_ACCESS_KEY" -> "s",
        "AWS_ENDPOINT" -> "http://127.0.0.1:9", "AWS_ALLOW_HTTP" -> "true"))
    assert(url == "s3a://bucket/prefix")
    val m = conf.toMap
    assert(m("fs.s3a.access.key") == "k")
    assert(m("fs.s3a.endpoint") == "http://127.0.0.1:9")
    assert(m("fs.s3a.connection.ssl.enabled") == "false")
    // this container has no hadoop-aws → the lite client is the connector
    assert(m("fs.s3a.impl") == "graft.sinks.S3LiteFileSystem")
  }
}
