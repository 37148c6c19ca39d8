package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming._

/** Kill-and-resume over ONE checkpoint for the wave-2..8 GroupState twins
  * (r11 verdict item 7) — the deploy-rollover / executor-loss contract:
  * the state store format each operator writes must restore into a brand
  * new query, and a phase-2 emission must be derivable ONLY from restored
  * phase-1 state (a fresh-state run would emit something observably
  * different).
  *
  * One parameterized harness ([[twoPhase]]): JSON file source →
  * operator → foreachBatch JSON sink stamped with the micro-batch epoch
  * (epoch ids CONTINUE across restarts through the checkpoint, so the
  * max-epoch rows are exactly the post-restart emission). Each twin's
  * test feeds phase 1, stops, starts a NEW query on the same checkpoint
  * with phase 2, and asserts the state-dependent output.
  *
  * The admission family (exact dedup, KMV, lev) is covered by the older
  * [[CheckpointRecoverySpec]]; this spec extends the pattern to the
  * newer twins the r11 verdict named (SCD2, funnel, transitions,
  * weighted reservoir) plus the counter/sketch families (space-saving
  * top-k, moments, fingerprint, winnowing owner state).
  */
class GroupStateRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  /** Run `transform` twice over the same checkpoint — phase-1 lines, stop,
    * NEW query, phase-2 lines — and return every output row stamped with
    * its micro-batch epoch. */
  private def twoPhase[I: Encoder, O: Encoder](name: String, schema: String,
      transform: Dataset[I] => Dataset[O], outputMode: String,
      phase1: Seq[String], phase2: Seq[String]): DataFrame = {
    val in = tmp(s"$name-in"); val out = tmp(s"$name-out")
    val ck = tmp(s"$name-ck")
    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).json(in).as[I]
      val q = transform(src).writeStream
        .foreachBatch { (df: Dataset[O], epoch: Long) =>
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

  /** Rows of the LAST micro-batch — the post-restart emission. */
  private def lastEpoch(df: DataFrame): DataFrame = {
    val maxEp = df.agg(max("epoch")).head().getLong(0)
    df.filter(col("epoch") === maxEp)
  }

  test("scd2: the open version closes against a post-restart change") {
    val outDf = twoPhase[Scd2Stream.CEvt, Scd2Stream.Scd2Row]("scd2",
      "user_id long, event_id long, event_type string, ts_us long",
      ds => Scd2Stream.versions(ds), "update",
      Seq("""{"user_id":1,"event_id":101,"event_type":"A","ts_us":1000}"""),
      Seq("""{"user_id":1,"event_id":102,"event_type":"B","ts_us":2000}"""))
    val closed = lastEpoch(outDf)
      .filter(col("event_id") === 101 && !col("is_current"))
    assert(closed.count() == 1L,
      "the phase-1 open version must close after the restart")
    assert(closed.select("valid_to").head().getLong(0) == 2000L,
      "valid_to must be the phase-2 change's ts — only restored " +
        "OpenVersion state knows version 101 was open")
    val open = lastEpoch(outDf)
      .filter(col("event_id") === 102 && col("is_current"))
    assert(open.count() == 1L, "the phase-2 change must be the new current")
  }

  test("funnel: a post-restart click advances the phase-1 view") {
    val outDf = twoPhase[FunnelStream.FEvt, FunnelStream.FunnelRow]("funnel",
      "user_id long, event_type string, ts_us long",
      ds => FunnelStream.funnel(ds), "update",
      Seq("""{"user_id":7,"event_type":"view","ts_us":100}"""),
      Seq("""{"user_id":7,"event_type":"click","ts_us":200}"""))
    val last = lastEpoch(outDf)
    assert(last.count() == 1L)
    val r = last.select("t_view", "t_click", "stage").head()
    // with FRESH state the click would be rejected (no prior view) and
    // nothing would emit; stage 2 proves the restored t_view
    assert(r.getLong(0) == 100L && r.getLong(1) == 200L && r.getLong(2) == 2L,
      s"restored view state must admit the click: $r")
  }

  test("transitions: the post-restart edge's src is the phase-1 event") {
    val outDf = twoPhase[TransitionStream.Ev, TransitionStream.Trans]("trans",
      "user_id long, ts_us long, event_id long, event_type string",
      ds => TransitionStream.transitions(ds), "append",
      Seq("""{"user_id":3,"ts_us":100,"event_id":1,"event_type":"x"}"""),
      Seq("""{"user_id":3,"ts_us":200,"event_id":2,"event_type":"y"}"""))
    val last = lastEpoch(outDf)
    assert(last.count() == 1L,
      "exactly one transition must emit after the restart")
    val r = last.select("src", "dst", "ts_us").head()
    assert(r.getString(0) == "x" && r.getString(1) == "y" &&
      r.getLong(2) == 200L,
      s"src 'x' exists only in restored Last state: $r")
  }

  test("weighted reservoir: the post-restart top-k ranks phase-1 entries") {
    val k = 2
    // deterministic priorities (weight 1 ⇒ priority = u): pick the
    // overall-best id as the phase-2 arrival so the post-restart reservoir
    // MUST contain one phase-1 survivor ranked against restored state
    val ids = (1L to 6L)
    val byPri = ids.sortBy(id => -WeightedReservoirStream.priority(id, 1L))
    val newcomer = byPri.head
    val phase1Ids = ids.filterNot(_ == newcomer)
    val expectTop = (phase1Ids ++ Seq(newcomer))
      .sortBy(id => (-WeightedReservoirStream.priority(id, 1L), id)).take(k)
    val outDf = twoPhase[WeightedReservoirStream.Doc,
      WeightedReservoirStream.ResRow]("wres",
      "group string, docId long, weight long",
      ds => WeightedReservoirStream.sample(ds, k), "update",
      phase1Ids.map(id => s"""{"group":"g","docId":$id,"weight":1}"""),
      Seq(s"""{"group":"g","docId":$newcomer,"weight":1}"""))
    val last = lastEpoch(outDf).orderBy("rank")
      .select("docId").as[Long].collect().toSeq
    assert(last == expectTop,
      s"post-restart reservoir must rank the newcomer against RESTORED " +
        s"phase-1 entries: got $last, want $expectTop")
  }

  test("space-saving top-k: counts accumulate across the restart") {
    val p1 = Seq.fill(3)("""{"group":"g","item":"a"}""") :+
      """{"group":"g","item":"b"}"""
    val outDf = twoPhase[TopKStream.Item, TopKStream.TopEntry]("topk",
      "group string, item string",
      ds => TopKStream.topK(ds, k = 2, capacity = 4), "update",
      p1, Seq.fill(2)("""{"group":"g","item":"a"}"""))
    val a = lastEpoch(outDf).filter(col("item") === "a")
      .select("count", "err", "rank").head()
    assert(a.getLong(0) == 5L && a.getLong(1) == 0L && a.getLong(2) == 1L,
      s"item a must carry its 3 phase-1 arrivals into the restart: $a")
  }

  test("moments: (n, Σv, Σv²) restore exactly") {
    val outDf = twoPhase[MomentsStream.MEvt, MomentsStream.MomentRow]("mom",
      "event_type string, value double",
      ds => MomentsStream.moments(ds), "update",
      Seq("""{"event_type":"t","value":1.0}""",
        """{"event_type":"t","value":2.0}"""),
      Seq("""{"event_type":"t","value":3.0}"""))
    val r = lastEpoch(outDf).select("n", "mean").head()
    assert(r.getLong(0) == 3L && r.getDouble(1) == 2.0,
      s"restored sums must give n=3 mean=2.0: $r")
  }

  test("fingerprint: all six monoid components restore") {
    val outDf = twoPhase[FingerprintStream.Doc, FingerprintStream.ShardFP](
      "fp", "shard long, h long, nChars long",
      ds => FingerprintStream.fingerprints(ds), "update",
      Seq("""{"shard":0,"h":5,"nChars":10}""",
        """{"shard":0,"h":6,"nChars":20}"""),
      Seq("""{"shard":0,"h":7,"nChars":30}"""))
    val r = lastEpoch(outDf)
      .select("n", "chars", "xor", "sum", "min", "max").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((3L, 60L, 5L ^ 6L ^ 7L, 18L, 5L, 7L)),
      s"fingerprint monoid must restore bit-exactly: $r")
  }

  test("regression: all six sufficient statistics restore exactly") {
    val outDf = twoPhase[RegressionStream.XY, RegressionStream.RegRow]("reg",
      "key string, x long, y long",
      ds => RegressionStream.regress(ds), "update",
      Seq("""{"key":"k","x":0,"y":0}""", """{"key":"k","x":1,"y":1}"""),
      Seq("""{"key":"k","x":2,"y":2}"""))
    val r = lastEpoch(outDf).select("n", "num", "denx", "deny").head()
    // n=3, num = 3*5-3*3 = 6 = denx = deny (slope 1 over all three points)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 6L, 6L, 6L)),
      s"restored (n,Σx,Σy,Σxx,Σyy,Σxy) must cover phase-1 points: $r")
  }

  test("zscore: the trailing ring buffer restores — the post-restart " +
    "outlier scores against phase-1 values") {
    // phase 1 fills MinWindow with 5x8.0 + 5x12.0 (mean 10, pop-var 4);
    // a FRESH buffer would emit nothing (below MinWindow)
    val p1 = (0 until 10).map(i =>
      s"""{"event_type":"t","event_id":$i,"ts_us":${100 + i},""" +
        s""""value":${if (i % 2 == 0) 8.0 else 12.0}}""")
    val outDf = twoPhase[(String, Long, Long, Double), ZscoreStream.Flagged](
      "zs", "event_type string, event_id long, ts_us long, value double",
      ds => ZscoreStream.flag(ds.toDF("event_type", "event_id", "ts_us",
        "value")), "append",
      p1, Seq("""{"event_type":"t","event_id":99,"ts_us":999,"value":100.0}"""))
    val last = lastEpoch(outDf)
    assert(last.count() == 1L, "exactly the outlier must flag post-restart")
    val r = last.select("event_id", "z").head()
    assert(r.getLong(0) == 99L && r.getDouble(1) == 45.0,
      s"z = (100-10)/2 = 45 exactly, from the RESTORED buffer: $r")
  }

  test("pack: the cumulative token counter restores — the post-restart " +
    "doc lands in the bin phase-1 filled up to") {
    val outDf = twoPhase[(Long, Long, Long), PackStream.PackedDoc]("pack",
      "shard long, doc_id long, n_tokens long",
      ds => PackStream.pack(ds.toDF("shard", "doc_id", "n_tokens"), 1000L),
      "append",
      Seq("""{"shard":0,"doc_id":1,"n_tokens":600}""",
        """{"shard":0,"doc_id":2,"n_tokens":600}"""),
      Seq("""{"shard":0,"doc_id":3,"n_tokens":600}"""))
    val r = lastEpoch(outDf).select("doc_id", "bin").head()
    // restored cum = 1200 → bin 1; a fresh counter would say bin 0
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L,
      s"doc 3 must land at cum=1200 → bin 1: $r")
  }

  test("hll: restored registers absorb a replayed corpus — no post-restart " +
    "emission for unchanged ranks") {
    val doc = """{"doc_id":1,"text":"alpha beta gamma delta epsilon"}"""
    val outDf = twoPhase[(Long, String), HllStream.Register]("hll",
      "doc_id long, text string",
      ds => HllStream.registers(
        HllStream.bucketRanks(ds.toDF("doc_id", "text"))), "update",
      Seq(doc), Seq(doc))
    // Update mode emits a register only when it CHANGES (or first touch);
    // identical phase-2 content against restored registers changes nothing
    assert(outDf.count() > 0, "phase 1 must emit first-touch registers")
    val eps = outDf.select("epoch").distinct().count()
    assert(eps == 1L,
      s"replayed content must emit NOTHING post-restart (fresh state " +
        s"would re-emit every bucket): $eps distinct emission epochs")
  }

  test("cms: restored cells double on a replayed corpus") {
    import spark.implicits._
    val doc = """{"doc_id":1,"text":"alpha beta gamma"}"""
    val outDf = twoPhase[(Long, String), CmsStream.Cell]("cms",
      "doc_id long, text string",
      ds => CmsStream.cells(
        CmsStream.cellHits(ds.toDF("doc_id", "text"))), "update",
      Seq(doc), Seq(doc))
    val maxEp = outDf.agg(max("epoch")).head().getLong(0)
    val first = outDf.filter(col("epoch") =!= maxEp)
      .select("cell", "count").as[(Long, Long)].collect().toMap
    val last = outDf.filter(col("epoch") === maxEp)
      .select("cell", "count").as[(Long, Long)].collect().toMap
    assert(last.nonEmpty && last.keySet == first.keySet)
    assert(last.forall { case (c, n) => n == 2 * first(c) },
      s"every cell must carry its phase-1 increments into the restart: " +
        s"$first vs $last")
  }

  test("winnowing: the phase-1 fingerprint owner anchors the post-restart " +
    "candidate edge") {
    val outDf = twoPhase[WinnowingStream.FpHit, WinnowingStream.Cand]("win",
      "h long, doc_id long",
      ds => WinnowingStream.candidates(ds), "append",
      Seq("""{"h":42,"doc_id":1}"""),
      Seq("""{"h":42,"doc_id":2}"""))
    val last = lastEpoch(outDf)
    assert(last.count() == 1L)
    val r = last.select("ida", "idb", "h").head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) == 42L,
      s"owner doc 1 exists only in restored per-hash state: $r")
  }
}
