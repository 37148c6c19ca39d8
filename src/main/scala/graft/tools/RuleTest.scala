package graft.tools

import graft.config.GraftConfig
import graft.queries.Synth
import graft.rules.TestMode
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `hotdog -t` parity CLI (reference: src/rules.rs:16-57, sample output
  * README.adoc:85-98): apply every msg-field matcher to each raw line of a
  * log file, print `Line N matches on: …` per matching rule, no actions.
  *
  * Usage: runMain graft.tools.RuleTest <file.log> [config.yml]
  */
object RuleTest {
  def main(args: Array[String]): Unit = {
    val file = args(0)
    val cfg = if (args.length > 1) GraftConfig.load(args(1)) else Synth.HotdogConfig
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lines = spark.read.text(file)
      .select(monotonically_increasing_id().as("i"), col("value").as("line"))
    val matched = lines
      .select(col("i"), col("line"), TestMode.matchesStr(cfg, col("line")).as("m"))
      .orderBy("i").collect()
    matched.zipWithIndex.foreach { case (r, idx) =>
      val m = r.getAs[String]("m")
      if (m.nonEmpty) {
        // describe each matching rule like the reference does (by matcher)
        m.split(",").foreach { ri =>
          val rule = cfg.rules(ri.toInt)
          val desc = rule.regex.map(p => s"regex: $p")
            .orElse(rule.jmespath.map(j => s"jmespath: $j")).getOrElse("?")
          println(s"Line ${idx + 1} matches on: $desc")
        }
      }
    }
    spark.stop()
  }
}
