package graft.sinks

/** Object-store targeting for the parquet sink — the Spark-native analog of
  * the reference's `object_store::parse_url_opts(url, lowercased_env)`
  * (src/sink/parquet.rs:58-61): the sink URL's SCHEME selects the store and
  * the process environment supplies credentials/options, no code changes.
  *
  * In Spark the store registry is the Hadoop filesystem layer, so this maps
  * the same environment contract onto the scheme's Hadoop configuration
  * keys and normalizes the URL to the connector Spark actually loads
  * (`s3://` → `s3a://`). Unknown schemes pass through untouched — Hadoop
  * resolves them from its own registry or fails loudly, exactly like
  * `parse_url_opts`.
  */
object ObjectStoreConfig {
  /** True when the full hadoop-aws S3AFileSystem is on the classpath. */
  private[sinks] lazy val hasS3AConnector: Boolean =
    try { Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem"); true }
    catch { case _: Throwable => false }

  /** (resolved URL, hadoop conf overrides to apply). Pure — callers apply
    * the pairs to their session's hadoopConfiguration ([[apply]] does both).
    * Env lookup is case-insensitive, mirroring the reference's lowercase
    * normalization of the whole environment. */
  def resolve(url: String,
      env: Map[String, String] = sys.env): (String, Seq[(String, String)]) = {
    val e = env.map { case (k, v) => k.toLowerCase -> v }
    def opt(hadoopKey: String, names: String*): Seq[(String, String)] =
      names.iterator.flatMap(n => e.get(n)).take(1).map(hadoopKey -> _).toSeq
    val scheme = url.takeWhile(_ != ':')
    scheme.toLowerCase match {
      case "s3" | "s3a" =>
        val rewritten = "s3a:" + url.dropWhile(_ != ':').drop(1)
        val conf =
          opt("fs.s3a.access.key", "aws_access_key_id") ++
            opt("fs.s3a.secret.key", "aws_secret_access_key") ++
            opt("fs.s3a.session.token", "aws_session_token") ++
            opt("fs.s3a.endpoint", "aws_endpoint", "aws_endpoint_url") ++
            opt("fs.s3a.endpoint.region", "aws_region", "aws_default_region") ++
            // object_store's AWS_ALLOW_HTTP=true → plain-HTTP endpoint
            e.get("aws_allow_http").filter(_.equalsIgnoreCase("true"))
              .map(_ => "fs.s3a.connection.ssl.enabled" -> "false").toSeq ++
            // clusters shipping hadoop-aws keep their full connector; a
            // slim classpath gets graft's own S3-protocol client (SigV4 +
            // multipart), the reference's object_store-in-process model
            (if (hasS3AConnector) Nil
             else Seq("fs.s3a.impl" -> "graft.sinks.S3LiteFileSystem"))
        (rewritten, conf)
      case _ => (url, Nil)
    }
  }

  /** Resolve + apply: sets the overrides on the session's Hadoop conf and
    * returns the URL to write to. */
  def apply(spark: org.apache.spark.sql.SparkSession, url: String,
      env: Map[String, String] = sys.env): String = {
    val (resolved, conf) = resolve(url, env)
    val hconf = spark.sparkContext.hadoopConfiguration
    conf.foreach { case (k, v) => hconf.set(k, v) }
    resolved
  }
}
