package graft

import graft.sinks.{ObjectStoreConfig, RoutedSink}
import org.scalatest.funsuite.AnyFunSuite

/** URL-scheme + env store targeting for the parquet sink — the reference's
  * `object_store::parse_url_opts(url, lowercased_env)` contract
  * (src/sink/parquet.rs:58-61) mapped onto Hadoop FS configuration.
  */
class ObjectStoreConfigSpec extends AnyFunSuite {

  test("s3 URLs rewrite to the s3a connector; env supplies credentials") {
    val (url, conf) = ObjectStoreConfig.resolve("s3://bucket/prefix/out",
      env = Map(
        "AWS_ACCESS_KEY_ID" -> "AKIATEST",
        "AWS_SECRET_ACCESS_KEY" -> "secret",
        "AWS_SESSION_TOKEN" -> "tok",
        "AWS_ENDPOINT" -> "http://127.0.0.1:9000",
        "AWS_REGION" -> "us-west-2",
        "AWS_ALLOW_HTTP" -> "true"))
    assert(url == "s3a://bucket/prefix/out")
    assert(conf.toMap == Map(
      "fs.s3a.access.key" -> "AKIATEST",
      "fs.s3a.secret.key" -> "secret",
      "fs.s3a.session.token" -> "tok",
      "fs.s3a.endpoint" -> "http://127.0.0.1:9000",
      "fs.s3a.endpoint.region" -> "us-west-2",
      "fs.s3a.connection.ssl.enabled" -> "false",
      // no hadoop-aws on this classpath → graft's own S3-protocol client
      "fs.s3a.impl" -> "graft.sinks.S3LiteFileSystem"))
  }

  test("env lookup is case-insensitive (the reference lowercases the env)") {
    val (_, conf) = ObjectStoreConfig.resolve("s3a://b/k",
      env = Map("aws_access_key_id" -> "lower"))
    assert(conf.toMap[String, String].apply("fs.s3a.access.key") == "lower")
  }

  test("non-object-store URLs pass through untouched") {
    assert(ObjectStoreConfig.resolve("/tmp/out", Map("AWS_REGION" -> "x"))
      == (("/tmp/out", Nil)))
    assert(ObjectStoreConfig.resolve("file:/tmp/out", Map.empty)
      == (("file:/tmp/out", Nil)))
    assert(ObjectStoreConfig.resolve("hdfs://nn/out", Map.empty)
      == (("hdfs://nn/out", Nil)))
  }

  test("apply() lands the overrides on the session Hadoop conf") {
    val spark = TestSpark.spark
    val url = ObjectStoreConfig(spark, "s3://b/out",
      env = Map("AWS_ENDPOINT" -> "http://localhost:9000"))
    assert(url == "s3a://b/out")
    assert(spark.sparkContext.hadoopConfiguration.get("fs.s3a.endpoint")
      == "http://localhost:9000")
  }

  test("writeRouted resolves its URL through the store config (file scheme)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-store")
    val routed = Seq(("t1", """{"a": 1}"""), ("t2", """{"a": 2}"""))
      .toDF("topic", "value")
    RoutedSink.writeRouted(routed, graft.queries.Synth.HotdogConfig,
      s"file:$out")
    val back = spark.read.parquet(s"file:$out")
    assert(back.count() == 2)
  }
}
