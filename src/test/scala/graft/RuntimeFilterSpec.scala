package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter join pruning (InjectRuntimeFilter): when a big
  * fact shuffle-joins a selectively-filtered dimension, Spark can build a
  * Bloom filter from the dim side at runtime and apply it to the fact
  * side BEFORE the shuffle — the row-level sibling of dynamic partition
  * pruning (R7bPlanSpec): DPP skips whole partitions, the Bloom filter
  * skips rows inside them. At 100 TB this cuts the dominant cost of a
  * selective dim join: shuffling fact rows that can never match.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim join injects a bloom might_contain on the fact side") {
    val base = java.nio.file.Files.createTempDirectory("graft-rtf").toString
    val s = spark
    import s.implicits._
    // fact large-ish relative to thresholds we set; dim filtered hard
    spark.range(200000).select(col("id").as("f_key"),
        (col("id") % 997).as("f_val"))
      .write.mode("overwrite").parquet(s"$base/fact")
    spark.range(5000).select(col("id").as("d_key"),
        (col("id") % 50).as("d_cat"))
      .write.mode("overwrite").parquet(s"$base/dim")
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      // force a shuffle join — a broadcast join needs no runtime filter
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val fact = spark.read.parquet(s"$base/fact")
      val dim = spark.read.parquet(s"$base/dim").filter(col("d_cat") === 7)
      val joined = fact.join(dim, col("f_key") === col("d_key"))
        .groupBy("d_cat").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"runtime bloom filter must be injected on the fact side:\n$optimized")
      // and the filtered result is still exact
      val n = joined.as[(Long, Long)].collect().toMap
      assert(n === Map(7L -> 100L), s"got $n") // ids ≡ 7 mod 50 in [0, 5000)
    }
  }
}
