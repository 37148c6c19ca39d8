package graft

import java.nio.file.{Files, Paths}

import graft.streaming.{ExactDedupStream, KmvStream}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Stateful-twin restart: GroupState must SURVIVE a full query shutdown
  * through the checkpointed state store — the executor-loss / deploy-
  * rollover contract every ingest pipeline depends on. Two runs over the
  * same checkpoint: a duplicate arriving AFTER the restart must still be
  * rejected against phase-one state, and a KMV sketch must keep its
  * min-set across the restart.
  */
class CheckpointRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toString
    d
  }

  test("exact-dedup state survives a stop/restart from the checkpoint") {
    val in = tmp("ckpt-in"); val out = tmp("ckpt-out"); val ck = tmp("ckpt-st")
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("ck string, doc_id long")
        .json(in)
        .as[ExactDedupStream.Keyed]
      val q = ExactDedupStream.decisions(src)
        .writeStream.format("json")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    // phase 1: content keys a, b — both admitted
    Files.writeString(Paths.get(in, "p1.json"),
      """{"ck":"a","doc_id":1}
        |{"ck":"b","doc_id":2}
        |""".stripMargin)
    runOnce()
    // phase 2 (NEW query, same checkpoint): a duplicate of "a" and a new "c"
    Files.writeString(Paths.get(in, "p2.json"),
      """{"ck":"a","doc_id":3}
        |{"ck":"c","doc_id":4}
        |""".stripMargin)
    runOnce()
    val got = spark.read.schema("doc_id long, canonical long, kept boolean")
      .json(out).as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 1L, true), (2L, 2L, true),
      (3L, 1L, false), (4L, 4L, true)),
      s"doc 3 must be rejected against PRE-RESTART state for 'a': $got")
  }

  test("KMV sketch min-set survives a stop/restart from the checkpoint") {
    val in = tmp("kmv-in"); val out = tmp("kmv-out"); val ck = tmp("kmv-st")
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("group string, item string")
        .json(in)
        .as[KmvStream.Item]
      val q = KmvStream.distinctEstimate(src, k = 4)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[KmvStream.KmvRow],
            _: Long) =>
          df.write.mode("append").json(out)
        }
        .option("checkpointLocation", ck)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    val items1 = Seq("w1", "w2", "w3", "w4", "w5")
    val items2 = Seq("w6", "w7")
    Files.writeString(Paths.get(in, "p1.json"),
      items1.map(i => s"""{"group":"g","item":"$i"}""").mkString("", "\n", "\n"))
    runOnce()
    Files.writeString(Paths.get(in, "p2.json"),
      items2.map(i => s"""{"group":"g","item":"$i"}""").mkString("", "\n", "\n"))
    runOnce()
    // the last emitted row must reflect the k smallest over BOTH phases
    val expect = (items1 ++ items2).map(KmvStream.hash52).distinct.sorted.take(4)
    val rows = spark.read
      .schema("group string, nTracked int, kthHash long, est double")
      .json(out)
      .select("nTracked", "kthHash").as[(Int, Long)].collect()
    assert(rows.exists { case (n, kth) => n == 4 && kth == expect.last },
      s"post-restart emission must rank phase-1 hashes too: $rows vs ${expect.last}")
  }

  test("lev-admission block members survive a stop/restart from the " +
    "checkpoint") {
    import graft.streaming.LevAdmissionStream
    val in = tmp("lev-in"); val out = tmp("lev-out"); val ck = tmp("lev-st")
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("bkey string, doc_id long, len long, sig string")
        .json(in)
        .as[LevAdmissionStream.BlockHit]
      val q = LevAdmissionStream.verdicts(src)
        .writeStream.format("json")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    val sig = "alpha beta gamma delta epsilon zeta"
    val sigEdit = sig.replace('z', 'x') // one occurrence → distance 1
    // phase 1: doc 1 admitted into block p:x
    Files.writeString(Paths.get(in, "p1.json"),
      s"""{"bkey":"p:x","doc_id":1,"len":${sig.length},"sig":"$sig"}
         |""".stripMargin)
    runOnce()
    // phase 2 (NEW query, same checkpoint): a single edit of doc 1's sig
    // must be rejected against the PRE-RESTART member list
    Files.writeString(Paths.get(in, "p2.json"),
      s"""{"bkey":"p:x","doc_id":2,"len":${sigEdit.length},"sig":"$sigEdit"}
         |""".stripMargin)
    runOnce()
    val got = spark.read
      .schema("doc_id long, bkey string, canonical long, dist long")
      .json(out).as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set((1L, "p:x", -1L, -1L), (2L, "p:x", 1L, 1L)),
      s"doc 2 must match pre-restart member 1: $got")
  }
}
