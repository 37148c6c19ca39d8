package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming._

/** Kill-and-resume coverage for the TEN streaming twins
  * [[GroupStateRecoverySpec]] and [[CheckpointRecoverySpec]] left uncovered
  * (r12 verdict item 1): attribution interval join, drift moments, native
  * session window, near-dup canonical, NN-graph members, OHLC bars,
  * PQ-index epoch rotation, quantile histogram, SemDedup accepted set,
  * and custom sessionize. With this spec every one of the 26 streaming
  * operators has a stop/restart parity proof over a real checkpoint.
  *
  * Same discipline as the sibling spec: phase 1 feeds state, the query
  * STOPS, a brand-new query resumes from the checkpoint, and the phase-2
  * assertion is derivable ONLY from restored state (a fresh-state run
  * would observably differ). This exercises every state persistence
  * format the ten operators use — HDFSBackedStateStore rows for the
  * product-encoded GroupStates, kryo-encoded member lists (NN-graph,
  * SemDedup), the symmetric join state of the stream-stream interval
  * join, the session-window merge store, the windowed-agg store with
  * min_by/max_by partials, and the offset log alone for the stateless
  * PQ-index maintainer (exactly-once encode across a codebook rotation).
  */
class GroupStateRecovery2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  /** DataFrame-level two-phase harness: JSON file source → transform →
    * epoch-stamped JSON sink, run twice over one checkpoint (phase-1
    * lines, STOP, new query, phase-2 lines). */
  private def twoPhaseDf(name: String, schema: String,
      transform: DataFrame => DataFrame, outputMode: String,
      phase1: Seq[String], phase2: Seq[String]): DataFrame = {
    val in = tmp(s"$name-in"); val out = tmp(s"$name-out")
    val ck = tmp(s"$name-ck")
    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).json(in)
      val q = transform(src).writeStream
        .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], epoch: Long) =>
          df.toDF().withColumn("epoch", lit(epoch))
            .write.mode("append").json(out): Unit
        }
        .option("checkpointLocation", ck)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    Files.writeString(Paths.get(in, "p1.json"),
      phase1.mkString("", "\n", "\n"))
    runOnce()
    Files.writeString(Paths.get(in, "p2.json"),
      phase2.mkString("", "\n", "\n"))
    runOnce()
    spark.read.json(out)
  }

  /** Rows emitted AFTER the restart (phase-1 epochs are those present
    * before the second run; everything later is post-restart). */
  private def afterRestart(df: DataFrame, phase1MaxEpoch: Long): DataFrame =
    df.filter(col("epoch") > phase1MaxEpoch)

  /** Rows of the LAST micro-batch. */
  private def lastEpoch(df: DataFrame): DataFrame = {
    val maxEp = df.agg(max("epoch")).head().getLong(0)
    df.filter(col("epoch") === maxEp)
  }

  test("attribution join: a post-restart purchase matches the phase-1 " +
    "click buffered in join state") {
    val outDf = twoPhaseDf("attr",
      "kind string, user_id long, click_id long, purchase_id long, ts_us long",
      df => AttributionJoinStream.attribute(
        df.filter(col("kind") === "c").select("user_id", "click_id", "ts_us"),
        df.filter(col("kind") === "p").select("user_id", "purchase_id", "ts_us"),
        watermark = "1 hour", horizonUs = 3600L * 1000000L),
      "append",
      Seq("""{"kind":"c","user_id":1,"click_id":10,"ts_us":1000000}"""),
      Seq("""{"kind":"p","user_id":1,"purchase_id":20,"ts_us":2000000}"""))
    // the ONLY possible match pairs the phase-2 purchase with a click that
    // exists solely in the restored stream-stream join state
    assert(outDf.count() == 1L, "exactly one attribution must emit")
    val r = outDf.select("user_id", "click_id", "purchase_id", "lag_us").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 10L, 20L, 1000000L)),
      s"purchase must attribute to the RESTORED buffered click: $r")
  }

  test("drift: restored (n, Σq) moments absorb the post-restart vector") {
    val outDf = twoPhaseDf("drift", "cluster long, q array<bigint>",
      df => DriftStream.moments(df.as[DriftStream.Assigned]).toDF(),
      "update",
      Seq("""{"cluster":0,"q":[1,2]}""", """{"cluster":0,"q":[3,4]}"""),
      Seq("""{"cluster":0,"q":[10,20]}"""))
    val r = lastEpoch(outDf).select("n", "s").head()
    assert(r.getLong(0) == 3L &&
      r.getSeq[Long](1) == Seq(14L, 26L),
      s"restored sums must give n=3 s=[14,26] (fresh state: n=1): $r")
  }

  test("native session window: the phase-1 session closes when a " +
    "post-restart event advances the watermark") {
    val outDf = twoPhaseDf("nsess", "user_id long, ts_us long",
      df => NativeSessionStream.sessions(
        df.withColumn("et", timestamp_micros(col("ts_us"))),
        gap = "5 seconds", watermark = "0 seconds", gapUs = 5000000L),
      "append",
      Seq("""{"user_id":1,"ts_us":1000000}""",
        """{"user_id":1,"ts_us":2000000}"""),
      Seq("""{"user_id":1,"ts_us":100000000}"""))
    // phase 1 cannot emit (watermark 2s < close 7s); the post-restart event
    // pushes the watermark past the close, releasing the MERGED two-event
    // session — fresh session-window state would know neither event
    val sess = outDf.filter(col("start_us") === 1000000L)
    assert(sess.count() == 1L,
      "the phase-1 session must emit exactly once, after the restart")
    val r = sess.select("end_us", "n_events").head()
    assert(r.getLong(0) == 2000000L && r.getLong(1) == 2L,
      s"restored session-window state must carry both phase-1 events: $r")
  }

  test("near-dup: the phase-1 bucket canonical anchors the post-restart " +
    "candidate edge") {
    val outDf = twoPhaseDf("ndup", "band int, bucket string, doc_id long",
      df => NearDupStream.candidates(df.as[NearDupStream.Hit]).toDF(),
      "append",
      Seq("""{"band":0,"bucket":"x","doc_id":1}"""),
      Seq("""{"band":0,"bucket":"x","doc_id":2}"""))
    val last = lastEpoch(outDf)
    assert(last.count() == 1L)
    val r = last.select("ida", "idb").head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L,
      s"canonical doc 1 exists only in restored bucket state: $r")
  }

  test("nn-graph: post-restart admission ranks against the kryo-restored " +
    "member vectors") {
    val outDf = twoPhaseDf("nng", "bucket long, vec_id long, emb array<double>",
      df => NnGraphStream.decisions(df.as[NnGraphStream.Arrival], k = 2).toDF(),
      "append",
      Seq("""{"bucket":0,"vec_id":1,"emb":[1.0,0.0]}""",
        """{"bucket":0,"vec_id":2,"emb":[0.0,1.0]}"""),
      Seq("""{"bucket":0,"vec_id":3,"emb":[1.0,0.1]}"""))
    val last = lastEpoch(outDf).filter(col("vec_id") === 3)
    assert(last.count() == 1L)
    val nIds = last.select("n_ids").head().getSeq[Long](0)
    assert(nIds == Seq(1L, 2L),
      s"neighbors [1,2] (cosine order) exist only in restored kryo member " +
        s"state — fresh state would return []: $nIds")
  }

  test("ohlc: the phase-1 bar's open/high/low/close survive the restart " +
    "and emit when the watermark passes") {
    val outDf = twoPhaseDf("ohlc",
      "user_id long, event_id long, ts_us long, value double",
      df => OhlcStream.bars(df, window = "10 seconds", watermark = "0 seconds"),
      "append",
      Seq("""{"user_id":1,"event_id":1,"ts_us":1000000,"value":5.0}""",
        """{"user_id":1,"event_id":2,"ts_us":2000000,"value":9.0}"""),
      Seq("""{"user_id":1,"event_id":3,"ts_us":100000000,"value":7.0}"""))
    val bar = outDf.filter(col("bucket_us") === 0L)
    assert(bar.count() == 1L,
      "the [0,10s) bar must emit exactly once, post-restart")
    val r = bar.select("open", "high", "low", "close", "volume").head()
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
      r.getLong(4)) == ((5.0, 9.0, 5.0, 9.0, 2L)),
      s"min_by/max_by partials must restore from the window store: $r")
  }

  test("pq-index: offsets restore across a codebook rotation — no " +
    "re-encode, new rows take the new epoch") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val cbA: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val cbB: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 1.0), Array(1.0, 0.0)),
      Array(Array(0.0, 1.0), Array(1.0, 0.0)))
    val reps = Seq(0 -> Seq(1.0, 0.0, 0.0, 0.0), 1 -> Seq(0.0, 0.0, 0.0, 1.0))
    val in = tmp("pq-in"); val out = tmp("pq-out"); val ck = tmp("pq-ck")
    @volatile var epoch = PqIndexStream.CodebookEpoch(1L, reps, cbA)
    def runOnce(): Unit = {
      val vecs = spark.readStream
        .schema("vec_id long, embedding array<float>").json(in)
      val q = PqIndexStream.maintain(vecs, () => epoch, Some(ck)) { df =>
        df.write.mode("append").json(out): Unit
      }
      // AvailableNow is not plumbed through maintain (production runs
      // continuous); stop once the file source drains
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    Files.writeString(Paths.get(in, "p1.json"),
      """{"vec_id":10,"embedding":[1.0,0.0,0.0,0.0]}""" + "\n")
    runOnce()
    epoch = PqIndexStream.CodebookEpoch(2L, reps, cbB) // rotate while down
    Files.writeString(Paths.get(in, "p2.json"),
      """{"vec_id":11,"embedding":[1.0,0.0,0.0,0.0]}""" + "\n")
    runOnce()
    val rows = spark.read.json(out)
      .select("vec_id", "codebook_epoch", "codes")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
    assert(rows.count(_._1 == 10L) == 1L,
      s"restored offsets must NOT re-encode vec 10 (duplicate inverted-list " +
        s"row): ${rows.toSeq}")
    assert(rows.find(_._1 == 10L).get._2 == 1L, "vec 10 keeps epoch 1")
    val v11 = rows.find(_._1 == 11L).get
    assert(v11._2 == 2L && v11._3 == Seq(1L, 0L),
      s"post-rotation vec 11 must encode under epoch 2's codebook " +
        s"(swapped codewords flip subvec (1,0) to code 1): $v11")
  }

  test("quantile hist: restored bucket counts rank the post-restart " +
    "quantiles over the full history") {
    val p1 = (1 to 4).map(i => s"""{"group":"g","value":0.00000$i}""")
    val outDf = twoPhaseDf("qhist", "group string, value double",
      df => QuantileHistStream.quantiles(df.as[QuantileHistStream.Obs]).toDF(),
      "update",
      p1, Seq("""{"group":"g","value":0.000005}"""))
    val r = lastEpoch(outDf).select("n", "p50Us", "p95Us").head()
    // fresh state would say n=1, p50=5; restored counts give the 5-value walk
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 3L, 5L)),
      s"restored histogram must give n=5 p50=3µs p95=5µs: $r")
  }

  test("semdedup: the post-restart twin vector rejects against the " +
    "kryo-restored accepted set") {
    val outDf = twoPhaseDf("sdd", "cluster int, vec_id long, emb array<double>",
      df => SemDedupStream.decisions(
        df.as[SemDedupStream.Arrival], threshold = 0.99).toDF(),
      "append",
      Seq("""{"cluster":0,"vec_id":1,"emb":[1.0,0.0]}"""),
      Seq("""{"cluster":0,"vec_id":2,"emb":[1.0,0.0]}"""))
    val last = lastEpoch(outDf).filter(col("vec_id") === 2)
    assert(last.count() == 1L)
    val r = last.select("kept", "dup_of").head()
    assert(!r.getBoolean(0) && r.getLong(1) == 1L,
      s"vec 2 must reject as a dup of vec 1, known only to restored " +
        s"accepted-set state (fresh state would KEEP it): $r")
  }

  test("sessionize (custom state): a post-restart gap event closes the " +
    "phase-1 session from restored GroupState") {
    val outDf = twoPhaseDf("csess", "user_id long, ts_us long",
      df => Sessionize.sessions(
        df.withColumn("et", timestamp_micros(col("ts_us")))
          .withWatermark("et", "0 seconds")
          .as[Sessionize.Evt], gapUs = 5000000L).toDF(),
      "append",
      Seq("""{"user_id":1,"ts_us":1000000}""",
        """{"user_id":1,"ts_us":2000000}"""),
      Seq("""{"user_id":1,"ts_us":100000000}"""))
    val closed = outDf.filter(col("start_us") === 1000000L)
    assert(closed.count() == 1L,
      "the phase-1 session must close exactly once, after the restart")
    val r = closed.select("end_us", "n_events").head()
    assert(r.getLong(0) == 2000000L && r.getLong(1) == 2L,
      s"restored SessionState must carry both phase-1 events: $r")
  }
}
