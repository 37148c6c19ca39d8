package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The lev-family rung report (r12 verdict item 2's receipt-vs-recall
  * tie-out): at a heavy timing rung, print
  *
  *   - the measured planted-pair recall (`dedup_lev_recall`'s counters:
  *     planted / detected / pairs_total / pairs_planted), and
  *   - the cap receipt aggregate (`dedup_lev_cap_audit` rolled up:
  *     blocks, saturated blocks, docs admitted, docs dropped),
  *
  * so the cap's predicted recall cost (docs a saturated block silently
  * excludes from pairing) can be tied to the recall actually measured on
  * the same corpus. A planted typo pair (origin, origin+3e8) is missed
  * only if, in BOTH its shared blocks (prefix and suffix), at least one
  * member of the pair was dropped by the (len, id)-ordered cap — so
  * docs_dropped is an upper-bound predictor and the tie-out checks
  * measured misses ≤ planted docs dropped.
  *
  * Usage: runMain graft.tools.LevRungReport <sfDir>
  */
object LevRungReport {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata-sf30")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val recall = graft.SparkEntry.queries("dedup_lev_recall")(spark, dir)
      .collect().head
    println(s"[levrung] $dir recall: planted=${recall.getLong(0)} " +
      s"detected=${recall.getLong(1)} pairs_total=${recall.getLong(2)} " +
      s"pairs_planted=${recall.getLong(3)}")

    val audit = graft.SparkEntry.queries("dedup_lev_cap_audit")(spark, dir)
      .agg(count(lit(1)).as("blocks"),
        sum(when(col("truncated"), 1L).otherwise(0L)).as("saturated"),
        sum("admitted").as("admitted"),
        sum("docs_dropped").as("docs_dropped"),
        max("n_docs").as("max_block"))
      .collect().head
    println(s"[levrung] $dir audit: blocks=${audit.getLong(0)} " +
      s"saturated=${audit.getLong(1)} admitted=${audit.getLong(2)} " +
      s"docs_dropped=${audit.getLong(3)} max_block=${audit.getLong(4)}")
    spark.stop()
  }
}
