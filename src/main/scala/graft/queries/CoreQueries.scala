package graft.queries

import graft.config._
import graft.rules.{RuleCompiler, Template}
import graft.sinks.{ByteThresholdParquetSink, SchemaConv}
import graft.syslog.SyslogCols
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1 operator query keys (O1–O24) with DuckDB oracle twins.
  * Every query is deterministic and fully ordered so the driver's
  * hash-compare is order-insensitive-safe.
  */
object CoreQueries {
  import Synth._

  type Q = (SparkSession, String) => DataFrame

  // O1/O3 — source: the synthesized line stream itself (batch analog of the
  // TCP line source; parity gate for everything downstream).
  private val srcLines: Q = (s, dir) =>
    lines5424(events(s, dir)).orderBy("event_id")

  // O3 — rule test mode (`hotdog -t`): every matcher applied to the RAW line
  // (no syslog parse, src/rules.rs:27-46), collecting ALL matches.
  private val srcFileTestMode: Q = (s, dir) =>
    documents(s, dir)
      .select(col("doc_id"),
        graft.rules.TestMode.matchesStr(HotdogConfig, col("text")).as("matches"))
      .orderBy("doc_id")

  // Source-format surface: CSV round-trip — routed output written as CSV
  // (quote/escape handling exercised by the JSON payloads) and read back
  // with an explicit schema, proving a lossless text-format hop. Both the
  // write and the typed re-read are distributed; the oracle reads the SAME
  // files with DuckDB's CSV reader, so quoting semantics must agree
  // byte-for-byte. One stable slot per sf dir, overwrite-rewritten.
  private[queries] val CsvSlot: String = java.nio.file.Paths.get(
    sys.props("java.io.tmpdir"), "graft-csv-roundtrip", "current").toString

  private[graft] val OrcSlot: String = java.nio.file.Paths.get(
    sys.props("java.io.tmpdir"), "graft-orc-roundtrip", "current").toString

  private[queries] val JsonlSlot: String = java.nio.file.Paths.get(
    sys.props("java.io.tmpdir"), "graft-jsonl-roundtrip", "current").toString

  private[queries] val EvoSlot: String = java.nio.file.Paths.get(
    sys.props("java.io.tmpdir"), "graft-schema-evolution", "current").toString

  // ORC round-trip: the second columnar interchange format Spark ships
  // natively. The full typed events stream writes as ORC and reads back;
  // the oracle aggregates the ORIGINAL parquet — so the key proves the
  // ORC write+read preserves every value bit (longs, doubles, strings,
  // µs timestamps) end to end. Decimal sums keep the check
  // partition-order-free.
  private val srcOrcRoundtrip: Q = (s, dir) => {
    Synth.eventsTs(s, dir).write.mode("overwrite").orc(OrcSlot)
    val back = s.read.orc(OrcSlot)
    back.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
      min("event_id").as("min_id"), max("event_id").as("max_id"),
      min("ts_us").as("min_ts_us"), max("ts_us").as("max_ts_us"))
      .orderBy("event_type")
  }

  // JSON-lines round-trip: the third text interchange hop next to CSV and
  // ORC. The typed events stream writes as newline-delimited JSON and the
  // ORACLE reads the very files Spark wrote, so the escaping of the
  // embedded-JSON `props` string and the shortest-round-trip double
  // rendering of `value` must both survive a foreign parser (Jackson's
  // shortest repr re-parses to the identical bit pattern — the IEEE
  // round-trip guarantee this key exhibits). Both write and read are
  // distributed; JSONL splits by line, so unlike quoted CSV it keeps
  // intra-file parallelism — noted as why it beats CSV for text interchange.
  private val srcJsonlRoundtrip: Q = (s, dir) => {
    Synth.eventsTs(s, dir)
      .select(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").json(JsonlSlot)
    s.read
      .schema("event_id long, ts_us long, user_id long, event_type string," +
        " value double, props string")
      .json(JsonlSlot)
      .orderBy("event_id")
  }

  // Schema evolution across landed epochs — the lake reality a 100-TB
  // table lives with: an old epoch lacks a column newer epochs carry.
  // Spark's mergeSchema read unifies the footers (absent column → null),
  // and the aggregation must see exactly the union. The oracle re-derives
  // the same split from the source table, so the whole write→merge→read
  // path is value-checked. Epochs land as separate directories under one
  // root — the layout a daily append job produces.
  private val srcSchemaEvolution: Q = (s, dir) => {
    val ev = Synth.eventsTs(s, dir)
    ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("user_id"), col("value"))
      .write.mode("overwrite").parquet(s"$EvoSlot/epoch=0")
    ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .write.mode("overwrite").parquet(s"$EvoSlot/epoch=1")
    s.read.option("mergeSchema", "true").parquet(s"$EvoSlot")
      .groupBy(coalesce(col("event_type"), lit("__pre_evolution__")).as("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  private val srcCsvRoundtrip: Q = (s, dir) => {
    // escape = quote → RFC 4180 doubled quotes, the dialect DuckDB's CSV
    // reader speaks natively (Spark's default backslash-escape is not
    // portable); multiLine on the read side because template outputs carry
    // embedded newlines inside quoted fields (disables intra-file split
    // parallelism — the cost of newline-bearing CSV anywhere, which is why
    // parquet is the real interchange format and this key is an exhibit)
    routed(s, dir).write.mode("overwrite")
      .option("header", "true").option("escape", "\"").csv(CsvSlot)
    s.read.schema("event_id long, topic string, value string")
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true").csv(CsvSlot)
      .orderBy("event_id")
  }

  // JSON corrupt-record handling: the three parser dispositions a pipeline
  // needs (typed parse, explicit corrupt flag, drop) in one projection —
  // every 11th props string is corrupted; from_json yields null fields,
  // json_valid drives the flag, and the dropped set is the filter twin.
  private val jsonCorruptModes: Q = (s, dir) => {
    val planted = events(s, dir).select(col("event_id"),
      when(col("event_id") % 11 === 0, concat(lit("{broken "), col("props")))
        .otherwise(col("props")).as("j"))
    planted
      .withColumn("parsed", from_json(col("j"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))))
      .select(col("event_id"),
        col("parsed.k").as("k"),
        get_json_object(col("j"), "$").isNotNull.as("is_valid"))
      .orderBy("event_id")
  }

  // O4 — RFC 5424 parse → 5-field projection.
  private val parse5424Q: Q = (s, dir) =>
    parsed(s, dir).orderBy("event_id")

  // O5 — RFC 3164 fallback parse on the legacy-format stream.
  private val parse3164Q: Q = (s, dir) => {
    GraftFunctions.ensureRegistered(s)
    lines3164(events(s, dir))
      .withColumn("p", call_function("parse_syslog", col("line")))
      .filter(col("p").isNotNull)
      .select(col("event_id"), col("p.msg").as("msg"),
        col("p.severity").as("severity"), col("p.facility").as("facility"),
        col("p.hostname").as("hostname"), col("p.appname").as("appname"))
      .orderBy("event_id")
  }

  // O6 — malformed-line drop: every 10th line corrupted; unparseables drop.
  private val parseErrorFilter: Q = (s, dir) => {
    GraftFunctions.ensureRegistered(s)
    lines5424(events(s, dir))
      .withColumn("line",
        when(col("event_id") % 10 === 0, concat(lit("garbage "), col("line")))
          .otherwise(col("line")))
      .withColumn("p", call_function("parse_syslog", col("line")))
      .filter(col("p").isNotNull)
      .select(col("event_id"), col("p.msg").as("msg"))
      .orderBy("event_id")
  }

  // O7 — regex predicate + named-capture extraction over documents.text.
  private val matchRegexCapture: Q = (s, dir) => {
    val p = "^(?P<first>\\w+) (?P<second>\\w+)"
    val jp = Regexes.toJava(p)
    documents(s, dir).filter(col("text").rlike(jp))
      .select(col("doc_id"),
        regexp_extract(col("text"), jp, 1).as("first"),
        regexp_extract(col("text"), jp, 2).as("second"))
      .orderBy("doc_id")
  }

  // O8 — JMESPath(dotted-path) match + value extraction over events.props.
  private val matchJmespath: Q = (s, dir) =>
    events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), JmesPathSubset.toJsonPath("k")).as("value"))
      .filter(col("value").isNotNull)
      .orderBy("event_id")

  // O8-full — the complete JMESPath language (slices incl. negative step,
  // filter projections with && and comparators, functions, expression
  // references, pipes/or, multi-select hashes) over per-row synthesized
  // JSON — parity with the reference's jmespath crate (src/rules.rs:74-94)
  // beyond the dotted-path subset.
  private val matchJmespathFull: Q = (s, dir) => {
    GraftFunctions.ensureRegistered(s)
    def m(n: Int) = (col("event_id") % n).cast("string")
    val name = when(col("event_id") % 4 === 0, lit(""))
      .otherwise(concat(lit("x"), col("event_type")))
    val flag = when(col("event_id") % 2 === 0, lit("true")).otherwise(lit("false"))
    val j = concat(
      lit("{\"vals\":["), m(10), lit(","), m(7), lit(","), m(5), lit(","), m(3),
      lit("],\"items\":[{\"v\":"), m(7), lit(",\"t\":\"a\"},{\"v\":"), m(5),
      lit(",\"t\":\"b\"}],\"name\":\""), name, lit("\",\"flag\":"), flag, lit("}"))
    def jq(p: String) = call_function("jmespath_query", col("j"), lit(p))
    def jv(p: String) = call_function("jmespath_value", col("j"), lit(p))
    events(s, dir).withColumn("j", j)
      .select(col("event_id"),
        // pipe stops the slice's projection so the filter sees the ARRAY
        // (a bare [?...] after [1:] would filter inside the projection)
        jq("sum(vals[1:] | [?@ >= `2`])").as("s_sum"),
        jv("min_by(items, &v).t").as("s_minby"),
        // note: a bare [0] after the slice would index per-element (slices
        // are projections); the pipe stops the projection first
        jq("vals[::-1] | [0]").as("s_revhead"),
        jq("length(vals[?@ > `1` && @ < `5`])").as("s_filtlen"),
        jv("name || 'fallback'").as("s_or"),
        jq("{f: flag, n: !flag}").as("s_hash"))
      .orderBy("event_id")
  }

  // O9 — field selector: rules on a non-msg field (hostname), null-safe.
  private val fieldSelect: Q = (s, dir) => {
    val rules = List(
      Rule(Field.Hostname, Some("^host-[0-3]$"), None, List(
        Action.Replace("ws: {{msg}}"), Action.Forward("test"), Action.Stop)),
      Rule(Field.Hostname, Some(".*"), None, List(
        Action.Replace("other: {{msg}}"), Action.Forward("test"), Action.Stop)))
    routed(s, dir, HotdogConfig.copy(rules = rules))
      .orderBy("event_id")
  }

  // O10 — built-in variable enrichment (msg/version/iso8601).
  private val enrichBuiltinVars: Q = (s, dir) =>
    parsed(s, dir).select(col("event_id"), col("msg"),
      lit(Version).as("version"), lit(IsoPin).as("iso8601"))
      .orderBy("event_id")

  // O11 — replace action: plan-time-compiled Handlebars template.
  private val replaceTemplate: Q = (s, dir) => {
    val jp = Regexes.toJava("^hello\\s+(?P<name>\\w+)?")
    val p = parsed(s, dir).filter(col("msg").rlike(jp))
    val vars = Map(
      "msg" -> col("msg"),
      "name" -> regexp_extract(col("msg"), jp, 1))
    p.select(col("event_id"),
      Template.compile(
        "This is the total message: {{msg}}\n\nAnd the name is: {{name}}\n", vars).as("value"))
      .orderBy("event_id")
  }

  // O11 full Handlebars surface: default-escape interpolation ({{msg}} on
  // JSON bodies hits & < > " '), raw triple-stache, and nested #if/else —
  // the stock handlebars-rust behavior the reference gets from
  // Handlebars::new() (src/connection.rs:22-33).
  private val replaceTemplateFull: Q = (s, dir) => {
    val jp = Regexes.toJava("^hello\\s+(?P<name>\\w+)?")
    val vars = Map(
      "msg" -> col("msg"),
      "name" -> regexp_extract(col("msg"), jp, 1))
    parsed(s, dir).select(col("event_id"),
      Template.compile(
        "{{#if name}}hello-from {{name}}{{else}}[{{msg}}]{{/if}} raw: {{{msg}}}",
        vars).as("value"))
      .orderBy("event_id")
  }

  // O12 — deep JSON merge of the rendered fragment into events.props.
  private val mergeJson: Q = (s, dir) => {
    GraftFunctions.ensureRegistered(s)
    val fragment = Template.renderStatic(
      """{"meta":{"hotdog":{"timestamp":"{{iso8601}}","version":"{{version}}"}}}""",
      Map("iso8601" -> IsoPin, "version" -> Version))
    events(s, dir).select(col("event_id"),
      GraftFunctions.jsonDeepMerge(col("props"), lit(fragment)).as("value"))
      .orderBy("event_id")
  }

  /** merge_in, the reference merge trait's pointer-addressed variant
    * (src/merge.rs:88-133): three pointer shapes over the event props —
    * append-at-new-key, create-missing-path, and root merge. */
  private val mergeJsonPointer: Q = (s, dir) => {
    GraftFunctions.ensureRegistered(s)
    val ptr = when(col("event_id") % 3 === 0, "/tags")
      .when(col("event_id") % 3 === 1, "/meta/depth")
      .otherwise("/")
    val frag = when(col("event_id") % 3 === 0, """["a","b"]""")
      .when(col("event_id") % 3 === 1, "7")
      .otherwise("""{"z":1}""")
    events(s, dir).select(col("event_id"),
      call_function("json_merge_in", col("props"), ptr, frag).as("value"))
      .orderBy("event_id")
  }

  // O13 — dynamic topic routing: rows claimed by the jmespath rule.
  private val routeTopicDynamic: Q = (s, dir) =>
    routed(s, dir).filter(col("topic").startsWith("t-"))
      .select(col("event_id"), col("topic"))
      .orderBy("event_id")

  // O15/O16 — the full ordered cascade, first-terminal-wins.
  private val routeFirstMatch: Q = (s, dir) =>
    routed(s, dir).orderBy("event_id")

  // O14 — stop action: jmespath-matched rows are dropped, rest flow on.
  private val stopDrop: Q = (s, dir) => {
    val rules = List(
      Rule(Field.Msg, None, Some("meta.topic"), List(Action.Stop)),
      Rule(Field.Msg, Some(".*"), None, List(Action.Forward("rest"), Action.Stop)))
    routed(s, dir, HotdogConfig.copy(rules = rules))
      .select(col("event_id"), col("topic"))
      .orderBy("event_id")
  }

  // O17 — Kafka sink contract: bare (topic, value) rows.
  private val sinkKafkaShape: Q = (s, dir) =>
    routed(s, dir).select(col("topic"), col("value")).orderBy("topic", "value")

  // O17 consumed back — the full produce→consume wire round trip: the
  // cascade's routed frame ships through [[graft.sinks.RoutedSink
  // .produceKafka]] as gzip'd magic-2 record batches into an in-process
  // embedded broker ([[graft.tools.EmbeddedKafka]], the status-server
  // discipline applied to Kafka), then the `graft-kafka` DSv2 Fetch
  // source reads every partition back and the per-topic tallies must
  // reproduce the routed frame exactly — the consumer proves delivery
  // instead of trusting the producer's own counters. Multi-partition
  // (2) so the round-robin partitioner and per-partition snapshot reads
  // are both on the hook. Collected eagerly (a handful of topic rows)
  // because the broker's lifetime ends with this closure.
  private val srcKafkaRoundtrip: Q = (s, dir) => {
    val broker = new graft.tools.EmbeddedKafka.LoopbackBroker(partitions = 2)
    // the cascade output feeds the produce AND the topic census — compute
    // the parse+cascade once, not once per consumer
    val frame = routed(s, dir).select(col("topic"), col("value")).persist()
    try {
      graft.sinks.RoutedSink.produceKafka(frame, broker.broker,
        kafkaConf = Map("broker.version.fallback" -> "1.0",
          "compression.codec" -> "gzip", "batch.num.messages" -> "1000"))
      val topics = frame.select("topic").distinct()
        .collect().map(_.getString(0)).sorted // bounded by the rule config
      val back = s.read.format("graft-kafka")
        .option("broker", broker.broker)
        .option("topic", topics.mkString(","))
        .load()
      val rows = back.groupBy("topic")
        .agg(count(lit(1)).as("n"),
          sum(octet_length(col("value"))).as("bytes"),
          min(col("value")).as("min_v"), max(col("value")).as("max_v"))
        .orderBy("topic")
        .collect()
      val out = s.createDataFrame(
        s.sparkContext.parallelize(rows.toIndexedSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("topic",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("bytes",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("min_v",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("max_v",
            org.apache.spark.sql.types.StringType))))
      out
    } finally { broker.close(); frame.unpersist() }
  }

  // The exactly-once produce→consume REPLAY as a gate-checked key (the
  // wire sibling of the stream_*_replay twins): the routed frame ships in
  // THREE waves (event_id % 3) through [[graft.sinks.RoutedSink
  // .produceKafka]] into the embedded broker, and after each wave a
  // `graft-kafka` micro-batch query — restarted every time from the SAME
  // checkpoint — drains exactly what arrived since the previous run.
  // Lost offsets double-count a wave; replayed offsets leak records
  // across waves; either diverges from the oracle's per-(wave, topic)
  // tallies. foreachBatch aggregates before collecting (tiny rows), and
  // the result DataFrame is rebuilt locally so the broker's lifetime can
  // end with this closure.
  private val streamKafkaReplay: Q = (s, dir) => {
    val broker = new graft.tools.EmbeddedKafka.LoopbackBroker(partitions = 2)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-kafka-replay").toString
    // four consumers of the cascade output (topic census + three wave
    // filters): parse once, filter from cache
    val frame = routed(s, dir)
      .select(col("topic"), col("value"), col("event_id")).persist()
    try {
      val topics = frame.select("topic").distinct()
        .collect().map(_.getString(0)).sorted // bounded by the rule config
      val acc = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.Row]
      (0 until 3).foreach { wave =>
        graft.sinks.RoutedSink.produceKafka(
          frame.filter(col("event_id") % 3 === wave)
            .select(col("topic"), col("value")),
          broker.broker,
          kafkaConf = Map("broker.version.fallback" -> "1.0",
            "batch.num.messages" -> "1000"))
        val q = s.readStream.format("graft-kafka")
          .option("broker", broker.broker)
          .option("topic", topics.mkString(","))
          .load()
          .writeStream
          .foreachBatch { (df: DataFrame, _: Long) =>
            val rows = df.groupBy("topic")
              .agg(count(lit(1)).as("n"),
                sum(octet_length(col("value"))).as("bytes"))
              .collect()
            acc.synchronized {
              rows.foreach(r => acc += org.apache.spark.sql.Row(
                wave, r.getString(0), r.getLong(1), r.getLong(2)))
            }
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(120000)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("wave",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("topic",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bytes",
          org.apache.spark.sql.types.LongType)))
      s.createDataFrame(
        s.sparkContext.parallelize(acc.toSeq, 1), schema)
        .groupBy("wave", "topic")
        .agg(sum("n").as("n"), sum("bytes").as("bytes"))
        .orderBy("wave", "topic")
    } finally { broker.close(); frame.unpersist() }
  }

  // O18 — per-destination grouping (the system's one shuffle). Bytes =
  // stored buffer size: payload UTF-8 bytes + the appended newline
  // (parquet.rs:157-158 queue.extend(payload); queue.extend("\n")).
  private val sinkGroupByDestination: Q = (s, dir) =>
    routed(s, dir).groupBy("topic")
      .agg(count(lit(1)).as("n"), sum(octet_length(col("value")) + 1).as("bytes"))
      .orderBy("topic")

  // O19 — size-threshold flush accounting (4 KiB threshold). The tally
  // counts payload UTF-8 bytes ONLY (parquet.rs:152 bufsize += payload.len()
  // — the stored newline is not counted against the threshold).
  private val flushSizeThreshold: Q = (s, dir) => {
    val threshold = 4096L
    routed(s, dir).groupBy("topic")
      .agg(sum(octet_length(col("value"))).as("bytes"))
      .select(col("topic"), col("bytes"),
        (col("bytes") / threshold).cast("long").as("full_flushes"),
        when(col("bytes") % threshold > 0, lit(1L)).otherwise(lit(0L)).as("partial_flush"))
      .orderBy("topic")
  }

  // O20 — time-interval flush: tumbling 60 s processing-time windows
  // (batch analog over event timestamps).
  private val flushTimeInterval: Q = (s, dir) => {
    val ev = eventsTs(s, dir)
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"))
    val r = routed(s, dir)
    r.join(ev, "event_id")
      .groupBy(window(col("ts"), "60 seconds").as("w"), col("topic"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("bucket"), col("topic"), col("n"))
      .orderBy("bucket", "topic")
  }

  // O21 — shutdown flush as an ORACLE-CHECKED key (r8 verdict #7): the
  // byte-threshold sink buffers a routed subset with the size threshold and
  // flush timer both set unreachable, so ONLY the close() shutdown drain
  // (src/sink/parquet.rs — the drain the termination listener runs) can
  // land the rows; the read-back per-topic counts+bytes must equal the
  // cascade's. A lost shutdown flush = missing rows = hash mismatch.
  private[queries] val ShutdownSlot: String = java.nio.file.Paths.get(
    sys.props("java.io.tmpdir"), "graft-shutdown-flush", "current").toString

  private val flushShutdownDrain: Q = (s, dir) => {
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del)
      f.delete()
    }
    del(new java.io.File(ShutdownSlot)) // writeRouted appends — fresh slot
    val cfg = HotdogConfig.copy(schemas = Map.empty,
      parquetBufferBytes = Some(Long.MaxValue), flushMs = Long.MaxValue / 8)
    val sink = new ByteThresholdParquetSink(cfg, ShutdownSlot)
    try {
      sink.addBatch(routed(s, dir).filter(col("event_id") % 13 === 0)
        .select("topic", "value"), 0L)
      require(!new java.io.File(ShutdownSlot).exists(),
        "nothing may flush before close: threshold and timer are unreachable")
    } finally sink.close() // THE operator under test: the shutdown drain
    s.read.parquet(ShutdownSlot)
      .groupBy("topic")
      .agg(count(lit(1)).as("n"), sum(octet_length(col("value"))).as("bytes"))
      .orderBy("topic")
  }

  // Exactly-once sink as an ORACLE-CHECKED key: epoch 1 is written, then
  // REPLAYED (the recovery path — must be a no-op), then epoch 2 appends;
  // the read-back per-(epoch, topic) counts equal the cascade's subsets
  // only if the replay deduplicated and the append landed.
  private[queries] val ExactlyOnceSlot: String = java.nio.file.Paths.get(
    sys.props("java.io.tmpdir"), "graft-exactly-once", "current").toString

  private val sinkExactlyOnce: Q = (s, dir) => {
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del)
      f.delete()
    }
    del(new java.io.File(ExactlyOnceSlot))
    val cfg = HotdogConfig.copy(schemas = Map.empty)
    val r = routed(s, dir)
    val e1 = r.filter(col("event_id") % 11 === 0).select("topic", "value")
    val e2 = r.filter(col("event_id") % 11 === 1).select("topic", "value")
    require(graft.sinks.RoutedSink.writeRoutedExactlyOnce(e1, 1L, cfg, ExactlyOnceSlot))
    require(!graft.sinks.RoutedSink.writeRoutedExactlyOnce(e1, 1L, cfg, ExactlyOnceSlot),
      "the replayed epoch must be skipped")
    require(graft.sinks.RoutedSink.writeRoutedExactlyOnce(e2, 2L, cfg, ExactlyOnceSlot))
    s.read.parquet(ExactlyOnceSlot)
      .groupBy(col("epoch").cast("long").as("epoch"), col("topic"))
      .agg(count(lit(1)).as("n"))
      .orderBy("epoch", "topic")
  }

  // O2 — the TLS line source END TO END as an oracle-checked key (r8
  // verdict #7): deterministic syslog lines are pushed through a REAL TLS
  // handshake into the graft-syslog DSv2 server source (PEM cert+key, the
  // reference's src/serve/tls.rs front door), the full streaming cascade
  // routes them, and the per-topic counts must match the DuckDB twin of
  // the batch cascade. Bounded: the pushed subset is event_id % 17.
  private val srcTlsLines: Q = (s, dir) => {
    val lines = Synth.lines5424(events(s, dir))
      .filter(col("event_id") % 17 === 0)
      .orderBy("event_id").select("line")
      .collect().map(_.getString(0))
    val expected = routed(s, dir).filter(col("event_id") % 17 === 0).count()
    def res(n: String): String = { // Pem reads paths; resources may be jarred
      val p = java.nio.file.Files.createTempFile("graft-tls-", n)
      val in = getClass.getResourceAsStream(s"/tls/$n")
      try java.nio.file.Files.copy(in, p,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      p.toString
    }
    val name = "tlskey_" + java.util.UUID.randomUUID().toString.take(8)
    val stream = graft.streaming.GraftPipeline.tcpStream(s, HotdogConfig,
      "127.0.0.1", 0, Map("name" -> name,
        "tls.cert" -> res("cert.pem"), "tls.key" -> res("pkcs8-key.pem")))
    val q = stream.writeStream.format("memory").queryName(name).start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      var port = graft.sources.SyslogSocketSource.boundPort(name)
      while (port.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); port = graft.sources.SyslogSocketSource.boundPort(name)
      }
      require(port.nonEmpty, "TLS source never registered its bound port")
      val trustAll = new javax.net.ssl.X509TrustManager {
        override def checkClientTrusted(
            c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        override def checkServerTrusted(
            c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
          Array.empty
      }
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(null, Array(trustAll), null)
      val sock = ctx.getSocketFactory.createSocket("127.0.0.1", port.get)
      val w = new java.io.OutputStreamWriter(sock.getOutputStream,
        java.nio.charset.StandardCharsets.UTF_8)
      lines.foreach(l => w.write(l + "\n"))
      w.flush(); sock.close()
      def landed(): Long = s.table(name).count()
      while (landed() < expected && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); q.processAllAvailable()
      }
      require(landed() == expected,
        s"expected $expected routed rows through TLS, got ${landed()}")
    } finally q.stop()
    s.table(name).groupBy("topic").agg(count(lit(1)).as("n")).orderBy("topic")
  }

  /** Declared schema for the routed t-* destinations (FIXTURES.md §4 shape). */
  private val declaredSchema: TopicSchema = TopicSchema("t-purchase", List(
    "k" -> FieldType.Lng,
    "meta" -> FieldType.Struct(List(
      "hotdog" -> FieldType.Struct(List(
        "timestamp" -> FieldType.Str,
        "version" -> FieldType.Str)),
      "topic" -> FieldType.Str))))

  // O22a — declared-schema JSON→typed projection.
  private val schemaDeclaredProject: Q = (s, dir) => {
    val st = SchemaConv.toStructType(declaredSchema.fields)
    routed(s, dir).filter(col("topic").startsWith("t-"))
      .withColumn("j", from_json(col("value"), st))
      .select(col("event_id"), col("j.k").as("k"),
        col("j.meta.hotdog.version").as("version"),
        col("j.meta.topic").as("mtopic"))
      .orderBy("event_id")
  }

  // O22b — schema inference from the first buffered line
  // (src/sink/parquet.rs:186-212: first-line-only inference).
  private val schemaInferJson: Q = (s, dir) => {
    // The reference infers from the first BUFFERED line — arrival order,
    // which a distributed engine doesn't have; any deterministic cheap
    // representative is equally faithful (here: min by event_id via one
    // map-side-combinable aggregation, no global sort). persist() so the
    // inference action and the projection share one pipeline run.
    val vals = routed(s, dir).filter(col("topic").startsWith("t-")).persist()
    val first = Option(
      vals.agg(min_by(col("value"), col("event_id"))).head().getString(0))
      .getOrElse("{}")
    vals.withColumn("j", from_json(col("value"), schema_of_json(lit(first))))
      .select(col("event_id"), col("j.k").as("k"), col("j.meta.topic").as("mtopic"))
      .orderBy("event_id")
  }

  // O23 — the scalar-function surface in one projection.
  private val scalarSurface: Q = (s, dir) =>
    eventsTs(s, dir).select(col("event_id"),
      concat(lit("e"), col("event_id").cast("string")).as("tag"),
      regexp_extract(col("event_type"), "^(\\w)", 1).as("initial"),
      get_json_object(col("props"), "$.k").as("k"),
      date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd HH:mm:ss").as("tstr"),
      length(col("props")).cast("long").as("len"))
      .orderBy("event_id")

  // Spark-4 VariantType path for JSON payloads (SURVEY.md §1.4 option):
  // parse once to a variant, extract typed fields — the shredded-JSON
  // alternative to repeated get_json_object string walks.
  private val variantJson: Q = (s, dir) =>
    events(s, dir)
      .select(col("event_id"), parse_json(col("props")).as("v"))
      .select(col("event_id"),
        variant_get(col("v"), "$.k", "string").as("k_str"),
        variant_get(col("v"), "$.k", "long").as("k_long"))
      .orderBy("event_id")

  // O24 — operational counters (statsd metric names, src/status.rs:42-71).
  private val metricsCounts: Q = (s, dir) => {
    GraftFunctions.ensureRegistered(s)
    // persist: three union branches below each consume this pipeline; the
    // cache makes the parse run once instead of three times
    val withCorrupt = lines5424(events(s, dir))
      .withColumn("line",
        when(col("event_id") % 10 === 0, concat(lit("garbage "), col("line")))
          .otherwise(col("line")))
      .withColumn("p", call_function("parse_syslog", col("line")))
      .persist()
    val total = withCorrupt.agg(count(lit(1)).as("value"))
      .select(lit("lines").as("metric"), col("value"))
    val errors = withCorrupt.filter(col("p").isNull).agg(count(lit(1)).as("value"))
      .select(lit("error.log_parse").as("metric"), col("value"))
    val ok = withCorrupt.filter(col("p").isNotNull)
    val routedOk = ok
      .withColumn("r", RuleCompiler.cascade(HotdogConfig, fieldCols(col("p")),
        lit(Version), lit(IsoPin)))
      .filter(col("r").isNotNull && col("r.topic").isNotNull)
    val perTopic = routedOk.groupBy(col("r.topic").as("topic"))
      .agg(count(lit(1)).as("value"))
      .select(concat(lit("kafka.submitted."), col("topic")).as("metric"), col("value"))
    total.unionAll(errors).unionAll(perTopic).orderBy("metric")
  }

  // O24b — merge-error counter (hotdog.error.merge_target_not_json,
  // README.adoc:512-515): a regex-matched rule whose merge hits non-JSON
  // msgs is claimed-and-dropped with the tagged err state; the catch-all
  // takes the rest.
  private val metricsMergeErrors: Q = (s, dir) => {
    GraftFunctions.ensureRegistered(s)
    val rules = List(
      Rule(Field.Msg, Some("^hello"), None, List(
        Action.Merge("""{"tag":"m"}"""))), // non-terminal: only failures drop
      Rule(Field.Msg, Some(".*"), None, List(Action.Forward("rest"), Action.Stop)))
    val r = parsed(s, dir)
      .withColumn("r", RuleCompiler.cascade(HotdogConfig.copy(rules = rules),
        parsedFieldCols, lit(Version), lit(IsoPin)))
      .persist()
    val merr = r.filter(col("r.err") === RuleCompiler.ErrMergeTargetNotJson)
      .agg(count(lit(1)).as("value"))
      .select(lit("error.merge_target_not_json").as("metric"), col("value"))
    val sub = r.filter(col("r.topic").isNotNull)
      .groupBy(col("r.topic").as("topic")).agg(count(lit(1)).as("value"))
      .select(concat(lit("kafka.submitted."), col("topic")).as("metric"), col("value"))
    merr.unionAll(sub).orderBy("metric")
  }

  /** O25 — status server (status.rs:23-40) round-trip: the same counters
    * [[metricsCounts]] computes are pushed into a live [[StatusServer]] and
    * read back over HTTP `GET /stats`, and the DataFrame is built from the
    * HTTP RESPONSE BODY — so the oracle (identical to metrics_counts)
    * verifies the full counter → registry → JSON-serving path, closing the
    * one §2.1 row that was spec-asserted only (r9 verdict #5). The
    * `.collect()` is one row per counter (topics + 2) — bounded registry
    * size, not data volume. */
  private val metricsStatusSnapshot: Q = (s, dir) => {
    val counters = metricsCounts(s, dir).collect()
    val srv = new graft.metrics.StatusServer(0)
    val body =
      try {
        counters.foreach(r => srv.update(r.getString(0), r.getLong(1)))
        val url = new java.net.URI(
          s"http://127.0.0.1:${srv.boundPort}/stats").toURL
        val in = url.openStream()
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      } finally srv.close()
    import s.implicits._
    Seq(body).toDF("j")
      .select(explode(from_json(col("j"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))))
      .select(col("key").as("metric"), col("value"))
      .orderBy("metric")
  }

  val queries: Map[String, Q] = Map(
    "src_lines" -> srcLines,
    "src_file_test_mode" -> srcFileTestMode,
    "src_csv_roundtrip" -> srcCsvRoundtrip,
    "src_orc_roundtrip" -> srcOrcRoundtrip,
    "src_jsonl_roundtrip" -> srcJsonlRoundtrip,
    "src_schema_evolution" -> srcSchemaEvolution,
    "json_corrupt_modes" -> jsonCorruptModes,
    "parse_syslog_5424" -> parse5424Q,
    "parse_syslog_3164" -> parse3164Q,
    "parse_error_filter" -> parseErrorFilter,
    "match_regex_capture" -> matchRegexCapture,
    "match_jmespath" -> matchJmespath,
    "match_jmespath_full" -> matchJmespathFull,
    "field_select" -> fieldSelect,
    "enrich_builtin_vars" -> enrichBuiltinVars,
    "replace_template" -> replaceTemplate,
    "replace_template_full" -> replaceTemplateFull,
    "merge_json" -> mergeJson,
    "merge_json_pointer" -> mergeJsonPointer,
    "route_topic_dynamic" -> routeTopicDynamic,
    "route_first_match" -> routeFirstMatch,
    "stop_drop" -> stopDrop,
    "sink_kafka_shape" -> sinkKafkaShape,
    "src_kafka_roundtrip" -> srcKafkaRoundtrip,
    "stream_kafka_replay" -> streamKafkaReplay,
    "sink_group_by_destination" -> sinkGroupByDestination,
    "flush_size_threshold" -> flushSizeThreshold,
    "flush_time_interval" -> flushTimeInterval,
    "flush_shutdown_drain" -> flushShutdownDrain,
    "sink_exactly_once" -> sinkExactlyOnce,
    "src_tls_lines" -> srcTlsLines,
    "schema_declared_project" -> schemaDeclaredProject,
    "schema_infer_json" -> schemaInferJson,
    "scalar_surface" -> scalarSurface,
    "variant_json" -> variantJson,
    "metrics_counts" -> metricsCounts,
    "metrics_merge_errors" -> metricsMergeErrors,
    "metrics_status_snapshot" -> metricsStatusSnapshot)

  private val parsedSql = parsedCte(P5424Sql, 8, 3, 4)
  private val parsed3164Sql = parsedCte(P3164Sql, 4, 2, 3)

  /** Shared by `metrics_counts` and the O25 `metrics_status_snapshot`
    * round-trip — the HTTP hop serves the SAME counters, so one oracle
    * covers both (any divergence is a round-trip bug by construction). */
  private val MetricsCountsOracle: String =
    s"""$Lines5424Cte, corrupted AS (
       |  SELECT event_id,
       |    CASE WHEN event_id % 10 = 0 THEN 'garbage ' || line ELSE line END AS line
       |  FROM lines),
       |parsed AS (
       |  SELECT event_id, regexp_extract(line, '$P5424Sql', 8) AS msg
       |  FROM corrupted WHERE regexp_matches(line, '$P5424Sql')
       |    AND TRY_CAST(regexp_extract(line, '$P5424Sql', 1) AS INT) <= 191)
       |    -- TRY_CAST: DuckDB splits AND conjuncts into separate filters
       |    -- and orders them by stats, so the cast can run on rows the
       |    -- match predicate would reject (empty group → cast error at
       |    -- some scale factors; surfaced at sf0.1)
       |$RoutedCte
       |SELECT 'lines' AS metric, count(*) AS value FROM corrupted
       |UNION ALL
       |SELECT 'error.log_parse', (SELECT count(*) FROM corrupted) - (SELECT count(*) FROM parsed)
       |UNION ALL
       |SELECT 'kafka.submitted.' || topic, count(*) FROM routed GROUP BY topic
       |ORDER BY metric""".stripMargin

  val oracle: Map[String, String] = Map(
    "src_lines" ->
      s"$Lines5424Cte SELECT event_id, line FROM lines ORDER BY event_id",

    // reads the SAME files the Spark key just wrote (stable slot,
    // overwrite-rewritten per Verify run) — the CSV dialect must agree
    "src_csv_roundtrip" ->
      s"""SELECT event_id, topic, value
         |FROM read_csv('$CsvSlot/*.csv', header = true,
         |  columns = {'event_id': 'BIGINT', 'topic': 'VARCHAR',
         |             'value': 'VARCHAR'})
         |ORDER BY event_id""".stripMargin,

    // the oracle re-derives the epoch split directly from the source, so
    // Spark's mergeSchema write→read path must reproduce it exactly
    "src_schema_evolution" ->
      """SELECT CASE WHEN event_id % 2 = 0 THEN '__pre_evolution__'
        |            ELSE event_type END AS event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // reads the SAME jsonl files Spark wrote — string escaping and double
    // rendering must survive DuckDB's JSON parser byte-for-byte
    "src_jsonl_roundtrip" ->
      s"""SELECT event_id, ts_us, user_id, event_type, value, props
         |FROM read_json('$JsonlSlot/*.json', format = 'newline_delimited',
         |  columns = {'event_id': 'BIGINT', 'ts_us': 'BIGINT',
         |             'user_id': 'BIGINT', 'event_type': 'VARCHAR',
         |             'value': 'DOUBLE', 'props': 'VARCHAR'})
         |ORDER BY event_id""".stripMargin,

    // aggregates the ORIGINAL parquet — the Spark side must reproduce it
    // through the ORC write+read, proving bit-level round-trip fidelity
    "src_orc_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  min(event_id) AS min_id, max(event_id) AS max_id,
        |  min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "json_corrupt_modes" ->
      """WITH planted AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 11 = 0 THEN '{broken ' || props
        |         ELSE props END AS j
        |  FROM events)
        |SELECT event_id,
        |  CASE WHEN json_valid(j)
        |       THEN TRY_CAST(json_extract_string(j, '$.k') AS BIGINT) END AS k,
        |  json_valid(j) AS is_valid
        |FROM planted ORDER BY event_id""".stripMargin,

    "src_file_test_mode" ->
      """SELECT doc_id,
        |  (CASE WHEN regexp_matches(text, '^hello\s+(\w+)?') THEN '0,' ELSE '' END ||
        |   CASE WHEN json_valid(text) AND json_extract_string(text, '$.meta.topic') IS NOT NULL
        |        THEN '1,' ELSE '' END || '2') AS matches
        |FROM documents ORDER BY doc_id""".stripMargin,

    "parse_syslog_5424" ->
      s"""$Lines5424Cte $parsedSql
         |SELECT event_id, msg, severity, facility, hostname, appname
         |FROM parsed ORDER BY event_id""".stripMargin,

    "parse_syslog_3164" ->
      s"""$Lines3164Cte $parsed3164Sql
         |SELECT event_id, msg, severity, facility, hostname, appname
         |FROM parsed ORDER BY event_id""".stripMargin,

    "parse_error_filter" ->
      s"""$Lines5424Cte, corrupted AS (
         |  SELECT event_id,
         |    CASE WHEN event_id % 10 = 0 THEN 'garbage ' || line ELSE line END AS line
         |  FROM lines)
         |SELECT event_id, regexp_extract(line, '$P5424Sql', 8) AS msg
         |FROM corrupted WHERE regexp_matches(line, '$P5424Sql')
         |ORDER BY event_id""".stripMargin,

    "match_regex_capture" ->
      """SELECT doc_id,
        |  regexp_extract(text, '^(\w+) (\w+)', 1) AS first,
        |  regexp_extract(text, '^(\w+) (\w+)', 2) AS second
        |FROM documents WHERE regexp_matches(text, '^(\w+) (\w+)')
        |ORDER BY doc_id""".stripMargin,

    "match_jmespath" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS value
        |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    // the oracle replays the same arithmetic the synthesized JSON encodes
    "match_jmespath_full" ->
      """SELECT event_id,
        |  CAST((CASE WHEN event_id % 7 >= 2 THEN event_id % 7 ELSE 0 END
        |      + CASE WHEN event_id % 5 >= 2 THEN event_id % 5 ELSE 0 END
        |      + CASE WHEN event_id % 3 >= 2 THEN event_id % 3 ELSE 0 END) AS VARCHAR) AS s_sum,
        |  CASE WHEN event_id % 7 <= event_id % 5 THEN 'a' ELSE 'b' END AS s_minby,
        |  CAST(event_id % 3 AS VARCHAR) AS s_revhead,
        |  CAST((CASE WHEN event_id % 10 BETWEEN 2 AND 4 THEN 1 ELSE 0 END
        |      + CASE WHEN event_id % 7 BETWEEN 2 AND 4 THEN 1 ELSE 0 END
        |      + CASE WHEN event_id % 5 BETWEEN 2 AND 4 THEN 1 ELSE 0 END
        |      + CASE WHEN event_id % 3 BETWEEN 2 AND 4 THEN 1 ELSE 0 END) AS VARCHAR) AS s_filtlen,
        |  CASE WHEN event_id % 4 = 0 THEN 'fallback' ELSE 'x' || event_type END AS s_or,
        |  CASE WHEN event_id % 2 = 0 THEN '{"f":true,"n":false}'
        |       ELSE '{"f":false,"n":true}' END AS s_hash
        |FROM events ORDER BY event_id""".stripMargin,

    // {{msg}} renders through the default handlebars escape, so the oracle
    // escapes & < > " ' the same way
    "field_select" ->
      s"""$Lines5424Cte $parsedSql,
         |esc AS (
         |  SELECT event_id, hostname,
         |    replace(replace(replace(replace(replace(msg,
         |      '&','&amp;'), '<','&lt;'), '>','&gt;'), '"','&quot;'),
         |      chr(39),'&#x27;') AS emsg
         |  FROM parsed)
         |SELECT event_id, 'test' AS topic,
         |  CASE WHEN regexp_matches(hostname, '^host-[0-3]$$') THEN 'ws: ' || emsg
         |       ELSE 'other: ' || emsg END AS value
         |FROM esc ORDER BY event_id""".stripMargin,

    "enrich_builtin_vars" ->
      s"""$Lines5424Cte $parsedSql
         |SELECT event_id, msg, '$Version' AS version, '$IsoPin' AS iso8601
         |FROM parsed ORDER BY event_id""".stripMargin,

    "replace_template" ->
      s"""$Lines5424Cte $parsedSql
         |SELECT event_id,
         |  'This is the total message: ' || msg || chr(10) || chr(10) ||
         |  'And the name is: ' || regexp_extract(msg, '^hello\\s+(\\w+)?', 1) || chr(10) AS value
         |FROM parsed WHERE regexp_matches(msg, '^hello\\s+(\\w+)?')
         |ORDER BY event_id""".stripMargin,

    "replace_template_full" ->
      s"""$Lines5424Cte $parsedSql
         |SELECT event_id,
         |  CASE WHEN regexp_extract(msg, '^hello\\s+(\\w+)?', 1) != ''
         |       THEN 'hello-from ' || regexp_extract(msg, '^hello\\s+(\\w+)?', 1)
         |       ELSE '[' || replace(replace(replace(replace(replace(msg,
         |              '&','&amp;'), '<','&lt;'), '>','&gt;'), '"','&quot;'),
         |              chr(39),'&#x27;') || ']' END
         |  || ' raw: ' || msg AS value
         |FROM parsed ORDER BY event_id""".stripMargin,

    "merge_json" ->
      s"""SELECT event_id,
         |  '{"k":' || json_extract_string(props, '$$.k') ||
         |  ',"meta":{"hotdog":{"timestamp":"$IsoPin","version":"$Version"}}}' AS value
         |FROM events ORDER BY event_id""".stripMargin,

    // pointer-merge twin: props is always {"k": N}, so the three pointer
    // shapes produce literally constructable outputs (keys sorted, compact
    // — the same canonical serialization the merge expressions emit)
    "merge_json_pointer" ->
      """SELECT event_id,
        |  CASE CAST(event_id % 3 AS INT)
        |    WHEN 0 THEN '{"k":' || json_extract_string(props, '$.k') || ',"tags":["a","b"]}'
        |    WHEN 1 THEN '{"k":' || json_extract_string(props, '$.k') || ',"meta":{"depth":7}}'
        |    ELSE '{"k":' || json_extract_string(props, '$.k') || ',"z":1}'
        |  END AS value
        |FROM events ORDER BY event_id""".stripMargin,

    "route_topic_dynamic" ->
      s"""$RoutedSql
         |SELECT event_id, topic FROM routed WHERE topic LIKE 't-%'
         |ORDER BY event_id""".stripMargin,

    "route_first_match" ->
      s"""$RoutedSql
         |SELECT event_id, topic, value FROM routed ORDER BY event_id""".stripMargin,

    "stop_drop" ->
      s"""$Lines5424Cte $parsedSql
         |SELECT event_id, 'rest' AS topic FROM parsed
         |WHERE (CASE WHEN json_valid(msg)
         |            THEN json_extract_string(msg, '$$.meta.topic') END) IS NULL
         |ORDER BY event_id""".stripMargin,

    "sink_kafka_shape" ->
      s"""$RoutedSql
         |SELECT topic, value FROM routed ORDER BY topic, value""".stripMargin,

    // the produce→consume round trip must reproduce the routed frame's
    // per-topic tallies — the oracle computes them from the SOURCE, the
    // Spark side from what actually came back off the broker's log
    "src_kafka_roundtrip" ->
      s"""$RoutedSql
         |SELECT topic, count(*) AS n, CAST(sum(strlen(value)) AS BIGINT) AS bytes,
         |       min(value) AS min_v, max(value) AS max_v
         |FROM routed GROUP BY topic ORDER BY topic""".stripMargin,

    // three produce waves, three checkpoint-resumed stream drains: each
    // wave's consumed tallies must equal the oracle's event_id%3 split —
    // a lost or replayed offset breaks exactly one wave's row
    "stream_kafka_replay" ->
      s"""$RoutedSql
         |SELECT CAST(event_id % 3 AS INT) AS wave, topic, count(*) AS n,
         |       CAST(sum(strlen(value)) AS BIGINT) AS bytes
         |FROM routed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "sink_group_by_destination" ->
      s"""$RoutedSql
         |SELECT topic, count(*) AS n, CAST(sum(strlen(value) + 1) AS BIGINT) AS bytes
         |FROM routed GROUP BY topic ORDER BY topic""".stripMargin,

    // O21: rows land ONLY via the close() shutdown drain, so matching the
    // cascade's per-topic counts+bytes proves the drain lost nothing
    "flush_shutdown_drain" ->
      s"""$RoutedSql
         |SELECT topic, count(*) AS n, CAST(sum(strlen(value)) AS BIGINT) AS bytes
         |FROM routed WHERE event_id % 13 = 0
         |GROUP BY topic ORDER BY topic""".stripMargin,

    // replay-dedup + append proof: per-(epoch, topic) counts match the
    // cascade subsets only if the replayed epoch 1 was skipped
    "sink_exactly_once" ->
      s"""$RoutedSql
         |SELECT CAST(1 AS BIGINT) AS epoch, topic,
         |  count(*) AS n FROM routed WHERE event_id % 11 = 0 GROUP BY topic
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), topic, count(*)
         |FROM routed WHERE event_id % 11 = 1 GROUP BY topic
         |ORDER BY epoch, topic""".stripMargin,

    // O2: the TLS transport must deliver the subset losslessly — counts
    // only (the streaming cascade stamps a runtime iso8601 into merged
    // values, so value bytes are pinned by the batch keys instead)
    "src_tls_lines" ->
      s"""$RoutedSql
         |SELECT topic, count(*) AS n
         |FROM routed WHERE event_id % 17 = 0
         |GROUP BY topic ORDER BY topic""".stripMargin,

    "flush_size_threshold" ->
      s"""$RoutedSql
         |SELECT topic, CAST(sum(strlen(value)) AS BIGINT) AS bytes,
         |  CAST(sum(strlen(value)) // 4096 AS BIGINT) AS full_flushes,
         |  CAST(CASE WHEN sum(strlen(value)) % 4096 > 0 THEN 1 ELSE 0 END AS BIGINT) AS partial_flush
         |FROM routed GROUP BY topic ORDER BY topic""".stripMargin,

    "flush_time_interval" ->
      s"""$RoutedSql
         |SELECT CAST(floor(epoch(e.ts) / 60) * 60 AS BIGINT) AS bucket, r.topic, count(*) AS n
         |FROM routed r JOIN events e ON r.event_id = e.event_id
         |GROUP BY 1, 2 ORDER BY bucket, topic""".stripMargin,

    "schema_declared_project" ->
      s"""$RoutedSql
         |SELECT event_id, CAST(json_extract_string(value, '$$.k') AS BIGINT) AS k,
         |  json_extract_string(value, '$$.meta.hotdog.version') AS version,
         |  json_extract_string(value, '$$.meta.topic') AS mtopic
         |FROM routed WHERE topic LIKE 't-%' ORDER BY event_id""".stripMargin,

    "schema_infer_json" ->
      s"""$RoutedSql
         |SELECT event_id, CAST(json_extract_string(value, '$$.k') AS BIGINT) AS k,
         |  json_extract_string(value, '$$.meta.topic') AS mtopic
         |FROM routed WHERE topic LIKE 't-%' ORDER BY event_id""".stripMargin,

    "scalar_surface" ->
      """SELECT event_id, 'e' || CAST(event_id AS VARCHAR) AS tag,
        |  regexp_extract(event_type, '^(\w)', 1) AS initial,
        |  json_extract_string(props, '$.k') AS k,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS tstr,
        |  length(props) AS len
        |FROM events ORDER BY event_id""".stripMargin,

    "variant_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long
        |FROM events ORDER BY event_id""".stripMargin,

    "metrics_counts" -> MetricsCountsOracle,

    // O25 round-trip serves the SAME counters over HTTP — same oracle
    "metrics_status_snapshot" -> MetricsCountsOracle,

    "metrics_merge_errors" ->
      s"""$Lines5424Cte $parsedSql
         |SELECT 'error.merge_target_not_json' AS metric, count(*) AS value
         |FROM parsed WHERE regexp_matches(msg, '^hello')
         |UNION ALL
         |SELECT 'kafka.submitted.rest', count(*)
         |FROM parsed WHERE NOT regexp_matches(msg, '^hello')
         |ORDER BY metric""".stripMargin)
}
