package graft

import graft.ext.Contamination
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Ingest-time decontamination: the row-local flag must agree with the
  * batch collision operator and run unchanged on a stream (pure projection
  * — no state, no shuffle).
  */
class ContaminationStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val benchQ =
    "what is the capital city of france and when was it founded exactly"

  test("flagContaminated agrees with the batch collision operator") {
    val probes = Seq((100L, benchQ)).toDF("doc_id", "text")
    val hashes = Contamination.probeGramHashes(probes)
    // 13 tokens → 6 8-grams
    assert(hashes.size == 6)
    val docs = Seq(
      (1L, "training text containing " + benchQ + " verbatim"),
      (2L, "a clean document with no benchmark overlap in any eight token " +
        "window of its text at all whatsoever truly"),
      (3L, "short doc")).toDF("doc_id", "text")
    val flags = Contamination.flagContaminated(docs, hashes)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(flags == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("flagContaminated preserves caller columns, including a 'toks' column") {
    val probes = Seq((100L, benchQ)).toDF("doc_id", "text")
    val hashes = Contamination.probeGramHashes(probes)
    val docs = Seq((1L, "some text", Seq("pre", "tokenized")))
      .toDF("doc_id", "text", "toks")
    val out = Contamination.flagContaminated(docs, hashes)
    assert(out.columns.toSeq == Seq("doc_id", "text", "toks", "contaminated"))
    assert(out.collect().head.getSeq[String](2) == Seq("pre", "tokenized"))
  }

  test("probe sets past the plan-literal bound are rejected loudly") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val big = (1 to 10).map(i => f"$i%032x")
    val e = intercept[IllegalArgumentException] {
      Contamination.flagContaminated(docs, big, maxProbeLiteral = 5)
    }
    assert(e.getMessage.contains("broadcast"),
      s"the error must point at the broadcast-join alternative: ${e.getMessage}")
    // at the bound it still plans
    Contamination.flagContaminated(docs, big, maxProbeLiteral = 10).collect()
  }

  test("the flag runs on a stream — admission-time decontamination") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val probes = Seq((100L, benchQ)).toDF("doc_id", "text")
    val hashes = Contamination.probeGramHashes(probes)
    val input = MemoryStream[(Long, String)]
    val flagged = Contamination.flagContaminated(
      input.toDF().toDF("doc_id", "text"), hashes)
    val q = flagged.writeStream.format("memory").queryName("decontam")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "prefix words then " + benchQ + " suffix"),
        (2L, "unrelated clean content that shares nothing with the probes " +
          "across any window of eight consecutive tokens anywhere"))
      q.processAllAvailable()
      val flags = spark.table("decontam")
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(flags == Map(1L -> true, 2L -> false))
    } finally q.stop()
  }
}
