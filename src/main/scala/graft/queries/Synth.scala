package graft.queries

import graft.config._
import graft.rules.RuleCompiler
import graft.syslog.SyslogCols
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic syslog-line synthesis from the driver's `events` table
  * (FIXTURES.md §6): the testdata has no syslog text, so both Spark and the
  * DuckDB oracle build the SAME lines from the same columns, and every
  * engine query key runs on them. Coverage by event_type:
  *   - error              → `hello …` messages (regex rule + named capture;
  *                           every 5th has no capturable name)
  *   - purchase / signup  → JSON msg with meta.topic (jmespath rule, merge,
  *                           dynamic routing)
  *   - view / click       → plain JSON props (catch-all rule)
  */
object Synth {
  val Version: String = GraftConfig.Version
  /** Pinned `iso8601` built-in: per-connection in the reference
    * (src/connection.rs:83), so any fixed value is equally faithful for the
    * batch oracle (SURVEY.md §7.5). */
  val IsoPin = "2024-01-01T00:00:00+00:00"

  /** The driver's testdata ships one row group per file, so a scan is ONE
    * task and every narrow compute phase (regex parse, cascade, hashing)
    * would run on a single core. When the source is under-split relative to
    * the cluster, spread it once; on a real deployment with many splittable
    * files this is a no-op branch.
    *
    * The decision reads FILE METADATA, not `df.rdd.getNumPartitions`: the
    * RDD conversion forces a full physical planning of the scan per call,
    * and with every query key deriving 1–3 base tables that planning tax ran
    * hundreds of times per bench sitting (guide §1.2: remove work you throw
    * away). The split estimate mirrors FilePartition.maxSplitBytes, so the
    * repartition/no-op decision flips at the same place: single-row-group
    * test files always spread; a production table of many ≥split-sized
    * files never does. Decision-only — results are partitioning-invariant. */
  private def spreadPath(s: SparkSession, path: String): DataFrame =
    spread(s.read.parquet(path), s, path)

  private def spread(df: DataFrame, s: SparkSession, path: String): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (estScanSplits(s, path) < math.max(2, target / 2)) df.repartition(target)
    else df
  }

  /** Estimated scan partition count for `path` — the
    * `FilePartition.maxSplitBytes` arithmetic over the file listing (one
    * cheap FS metadata call; no query planning). Reads the three sizing
    * confs through the PUBLIC RuntimeConfig surface (the r14 verdict
    * flagged the internal `classic.SparkSession` cast — it breaks on a
    * Spark minor bump) and lists files RECURSIVELY so a partitioned or
    * nested layout is sized by its leaf files, not its 0-byte directory
    * entries (which collapsed the estimate to "always repartition"). */
  private def estScanSplits(s: SparkSession, path: String): Int = {
    def bytesConf(key: String, dflt: Long): Long =
      s.conf.getOption(key)
        .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
        .getOrElse(dflt)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val lens: Seq[Long] =
      if (st.isDirectory) {
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (it.hasNext) {
          val f = it.next()
          val name = f.getPath.getName
          if (!name.startsWith("_") && !name.startsWith(".")) buf += f.getLen
        }
        buf.toSeq
      } else Seq(st.getLen)
    val maxPart = bytesConf("spark.sql.files.maxPartitionBytes", 128L << 20)
    val openCost = bytesConf("spark.sql.files.openCostInBytes", 4L << 20)
    val minParts = s.conf.getOption("spark.sql.files.minPartitionNum")
      .map(_.toInt).getOrElse(s.sparkContext.defaultParallelism)
    val totalBytes = lens.map(_ + openCost).sum
    val bytesPerCore = totalBytes / math.max(1, minParts)
    val maxSplit = math.min(maxPart, math.max(openCost, bytesPerCore))
    lens.map(l => ((l + maxSplit - 1) / maxSplit).toInt).sum
  }

  /** events.parquet carries a TIMESTAMP(NANOS) column that Spark 4 rejects
    * at schema conversion; the engine queries don't need it, so read with an
    * explicit ts-free schema (works in any session, no legacy flag). */
  def events(s: SparkSession, dir: String): DataFrame =
    spread(s.read
      .schema("event_id long, user_id long, event_type string, value double, props string")
      .parquet(s"$dir/events.parquet"), s, s"$dir/events.parquet")

  /** events with a normalized `ts_us: long` (µs since epoch) — the ONE
    * audited time conversion every time-axis consumer goes through. The
    * driver's testdata has shipped `ts` both as TIMESTAMP(NANOS) (readable
    * only as a raw long under spark.sql.legacy.parquet.nanosAsLong) and as
    * timestamp[us] across regenerations, so the unit is NOT assumed: the
    * parquet footer's logical type is sniffed via schema inference and the
    * conversion branches on it. A future unit flip fails loudly here instead
    * of silently compressing the time axis (round-6 regression). */
  def eventsTs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val path = s"$dir/events.parquet"
    // the unit sniff is one footer-read schema inference; memoized per
    // (path, mtime, length) — not bare path, so a file regenerated
    // in-process (datagen + bench in one JVM) with a different timestamp
    // unit re-sniffs instead of silently mis-converting with the stale
    // type — so the dozens of eventsTs-derived keys don't each re-read
    // the footer
    val f = new java.io.File(path)
    val tsType = tsTypeCache.computeIfAbsent(
      (f.getAbsolutePath, f.lastModified(), f.length()),
      _ => s.read.parquet(path).schema("ts").dataType)
    val base = s.read
      .schema(StructType(Seq(
        StructField("event_id", LongType), StructField("ts", tsType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
      .parquet(path)
    val tsUs = tsType match {
      case TimestampType    => unix_micros(col("ts"))
      // NTZ wall-clock == instant under the session's pinned UTC zone
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      // legacy nanosAsLong surfaces TIMESTAMP(NANOS) as a raw nanos long
      case LongType         => expr("ts div 1000")
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other — audit the unit before use")
    }
    spread(base.withColumn("ts_us", tsUs).drop("ts"), s, path)
  }

  private val tsTypeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long),
      org.apache.spark.sql.types.DataType]()

  def documents(s: SparkSession, dir: String): DataFrame =
    spreadPath(s, s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame =
    spreadPath(s, s"$dir/embeddings.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame =
    spreadPath(s, s"$dir/lineitem.parquet")
  def orders(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
  def customer(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/customer.parquet")

  /** The message body carried in the synthesized line (also = expected parsed msg). */
  private def bodyCol: Column =
    when(col("event_type").isin("purchase", "signup"),
      concat(lit("{\"meta\":{\"topic\":\"t-"), col("event_type"),
        lit("\"},\"k\":"), (col("event_id") % 100).cast("string"), lit("}")))
    .when(col("event_type") === "error" && col("event_id") % 5 === 0, lit("hello  "))
    .when(col("event_type") === "error",
      concat(lit("hello world"), (col("event_id") % 7).cast("string"), lit(" extra")))
    .otherwise(col("props"))

  /** RFC 5424 lines: full facility×severity coverage via pri = event_id % 192. */
  def lines5424(ev: DataFrame): DataFrame =
    ev.select(col("event_id"),
      concat(
        lit("<"), (col("event_id") % 192).cast("string"),
        lit(">1 2024-01-01T00:00:00Z host-"), (col("user_id") % 10).cast("string"),
        lit(" app-"), col("event_type"), lit(" - - - "), bodyCol).as("line"))

  /** RFC 3164 variant of the same stream. */
  def lines3164(ev: DataFrame): DataFrame =
    ev.select(col("event_id"),
      concat(
        lit("<"), (col("event_id") % 192).cast("string"),
        lit(">May 13 21:45:18 host-"), (col("user_id") % 10).cast("string"),
        lit(" app-"), col("event_type"), lit(": "), bodyCol).as("line"))

  /** DuckDB twin of [[lines5424]] / [[lines3164]] (CTE named `lines`). */
  val Lines5424Cte: String =
    """WITH lines AS (
      |  SELECT event_id,
      |    '<' || CAST(event_id % 192 AS VARCHAR) || '>1 2024-01-01T00:00:00Z host-' ||
      |    CAST(user_id % 10 AS VARCHAR) || ' app-' || event_type || ' - - - ' ||
      |    CASE WHEN event_type IN ('purchase','signup')
      |         THEN '{"meta":{"topic":"t-' || event_type || '"},"k":' || CAST(event_id % 100 AS VARCHAR) || '}'
      |         WHEN event_type = 'error' AND event_id % 5 = 0 THEN 'hello  '
      |         WHEN event_type = 'error' THEN 'hello world' || CAST(event_id % 7 AS VARCHAR) || ' extra'
      |         ELSE props END AS line
      |  FROM events)""".stripMargin

  val Lines3164Cte: String =
    """WITH lines AS (
      |  SELECT event_id,
      |    '<' || CAST(event_id % 192 AS VARCHAR) || '>May 13 21:45:18 host-' ||
      |    CAST(user_id % 10 AS VARCHAR) || ' app-' || event_type || ': ' ||
      |    CASE WHEN event_type IN ('purchase','signup')
      |         THEN '{"meta":{"topic":"t-' || event_type || '"},"k":' || CAST(event_id % 100 AS VARCHAR) || '}'
      |         WHEN event_type = 'error' AND event_id % 5 = 0 THEN 'hello  '
      |         WHEN event_type = 'error' THEN 'hello world' || CAST(event_id % 7 AS VARCHAR) || ' extra'
      |         ELSE props END AS line
      |  FROM events)""".stripMargin

  /** DuckDB severity/facility keyword lists (graft.syslog.Syslog tables). */
  val SevListSql: String =
    "['emerg','alert','crit','err','warning','notice','info','debug']"
  val FacListSql: String =
    "['kern','user','mail','daemon','auth','syslog','lpr','news','uucp','cron'," +
    "'authpriv','ftp','ntp','audit','alert','clockd','local0','local1','local2'," +
    "'local3','local4','local5','local6','local7']"

  /** DuckDB twin of SyslogCols.P5424 / P3164 (identical RE2/Java-safe syntax). */
  val P5424Sql: String = SyslogCols.P5424
  val P3164Sql: String = SyslogCols.P3164

  /** `parsed` CTE on top of `lines`: the five SyslogMessage fields. */
  def parsedCte(lineP: String, msgGroup: Int, hostGroup: Int, appGroup: Int): String =
    s""", parsed AS (
       |  SELECT event_id,
       |    regexp_extract(line, '$lineP', $msgGroup) AS msg,
       |    $SevListSql[CAST(regexp_extract(line, '$lineP', 1) AS INT) % 8 + 1] AS severity,
       |    $FacListSql[CAST(regexp_extract(line, '$lineP', 1) AS INT) // 8 + 1] AS facility,
       |    nullif(regexp_extract(line, '$lineP', $hostGroup), '-') AS hostname,
       |    nullif(regexp_extract(line, '$lineP', $appGroup), '-') AS appname
       |  FROM lines
       |  WHERE regexp_matches(line, '$lineP')
       |    AND TRY_CAST(regexp_extract(line, '$lineP', 1) AS INT) <= 191)""".stripMargin

  // ---------------------------------------------------------------- cascade

  /** The shipped 3-rule cascade (hotdog.yml:26-68), constructed
    * programmatically: regex+capture → replace+forward+stop; jmespath
    * meta.topic → merge+dynamic-topic forward+stop; catch-all → logs-unknown.
    */
  val HotdogRules: List[Rule] = List(
    Rule(Field.Msg, Some("^hello\\s+(?P<name>\\w+)?"), None, List(
      Action.Replace("This is the total message: {{msg}}\n\nAnd the name is: {{name}}\n"),
      Action.Forward("test"),
      Action.Stop)),
    Rule(Field.Msg, None, Some("meta.topic"), List(
      Action.Merge("""{"meta":{"hotdog":{"timestamp":"{{iso8601}}","version":"{{version}}"}}}"""),
      Action.Forward("{{value}}"),
      Action.Stop)),
    Rule(Field.Msg, Some(".*"), None, List(
      Action.Forward("logs-unknown"),
      Action.Stop)))

  val HotdogConfig: GraftConfig = GraftConfig(
    rules = HotdogRules, schemas = Map.empty, defaultTopic = Some("test"),
    kafkaBuffer = 1024, kafkaTimeoutMs = 60000L, parquetUrl = None,
    parquetBufferBytes = None, flushMs = 60000L, kafkaConf = Map.empty)

  def fieldCols(p: Column): RuleCompiler.FieldCols = RuleCompiler.FieldCols(
    p.getField("msg"), p.getField("severity"), p.getField("facility"),
    p.getField("hostname"), p.getField("appname"))

  /** Parsed 5424 stream, flattened to plain columns:
    * (event_id, msg, severity, facility, hostname, appname).
    *
    * Parsing goes through the OPAQUE [[graft.syslog.ParseSyslog]] expression
    * on purpose: the column-expression parse ([[SyslogCols]]) is a
    * `when(cond, struct(…))` that SimplifyExtractValueOps distributes into
    * every field reference — with the rule cascade referencing `msg` a dozen
    * times, the full synthesis+regex would re-run per reference (~20× per
    * row, measured 100 µs/row). An opaque expression is evaluated once and
    * its fields are cheap GetStructField reads. */
  def parsed(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(s)
    lines5424(events(s, dir))
      .withColumn("p", call_function("parse_syslog", col("line")))
      .filter(col("p").isNotNull)
      .select(col("event_id"), col("p.msg").as("msg"),
        col("p.severity").as("severity"), col("p.facility").as("facility"),
        col("p.hostname").as("hostname"), col("p.appname").as("appname"))
  }

  def parsedFieldCols: RuleCompiler.FieldCols = RuleCompiler.FieldCols(
    col("msg"), col("severity"), col("facility"), col("hostname"), col("appname"))

  /** Predicate-pushdown fence: the OR-clause is always false (ids are
    * non-negative) but NONDETERMINISTIC, so PushDownPredicates cannot sink
    * the expensive derived predicate below the spread exchange into the
    * single-task scan stage (where the whole cascade would re-run serially).
    * `rand() > 2` doesn't work here — the optimizer folds rand comparisons
    * by range; monotonically_increasing_id has no such folding rule. */
  def noPushFilter(cond: Column): Column = cond || (monotonically_increasing_id() < 0)

  /** Full cascade output: (event_id, topic, value), dropped rows excluded.
    * The cascade runs over plain attribute columns so its many `msg`
    * references are cheap reads, not re-parses. */
  def routed(s: SparkSession, dir: String, cfg: GraftConfig = HotdogConfig): DataFrame =
    parsed(s, dir)
      .withColumn("r", RuleCompiler.cascade(cfg, parsedFieldCols, lit(Version), lit(IsoPin)))
      // topic IS NULL also drops the tagged claimed-and-dropped state
      // (merge failure, RuleCompiler.ErrMergeTargetNotJson)
      .filter(noPushFilter(col("r").isNotNull && col("r.topic").isNotNull))
      .select(col("event_id"), col("r.topic").as("topic"), col("r.value").as("value"))

  private val Rx1 = """^hello\s+(\w+)?"""

  /** DuckDB `routed` CTE (on top of `parsed`): the cascade's CASE WHEN twin.
    * The merged-JSON value is constructible by concat because every
    * rule-2-matching msg has the fixed shape {"meta":{"topic":…},"k":…} and
    * graft serializes compact with sorted keys. */
  val RoutedCte: String =
    s""", jroute AS (
       |  SELECT event_id, msg,
       |    regexp_matches(msg, '$Rx1') AS m1,
       |    (CASE WHEN json_valid(msg)
       |          THEN json_extract_string(msg, '$$.meta.topic') END) AS mtopic
       |  FROM parsed),
       |routed AS (
       |  SELECT event_id, msg,
       |    CASE WHEN m1 THEN 'test'
       |         WHEN mtopic IS NOT NULL THEN mtopic
       |         ELSE 'logs-unknown' END AS topic,
       |    CASE WHEN m1
       |           THEN 'This is the total message: ' || msg || chr(10) || chr(10) ||
       |                'And the name is: ' || regexp_extract(msg, '$Rx1', 1) || chr(10)
       |         WHEN mtopic IS NOT NULL
       |           THEN '{"k":' || json_extract_string(msg, '$$.k') ||
       |                ',"meta":{"hotdog":{"timestamp":"$IsoPin","version":"$Version"},"topic":"' ||
       |                mtopic || '"}}'
       |         ELSE msg END AS value
       |  FROM jroute)""".stripMargin

  /** Shared full prologue: lines → parsed → routed. */
  val RoutedSql: String = Lines5424Cte + parsedCte(P5424Sql, 8, 3, 4) + RoutedCte
}
