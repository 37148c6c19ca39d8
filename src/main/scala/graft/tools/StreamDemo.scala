package graft.tools

import graft.queries.Synth
import graft.streaming.GraftPipeline
import org.apache.spark.sql.SparkSession

/** Minimal end-to-end streaming run: watches `args(0)` for text files of
  * syslog lines, routes them through the rule cascade (a hotdog-style YAML
  * config from `args(2)` if given, else the built-in hotdog.yml fixture),
  * writes routed parquet under `args(1)` (topic=… partitions). Stops when
  * the input is drained (availableNow) so it can be driven from scripts.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir) = args.take(2)
    val cfg = if (args.length > 2) graft.config.GraftConfig.load(args(2))
              else Synth.HotdogConfig
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new GraftPipeline.MetricsListener)
    val routed = GraftPipeline.transform(
      cfg,
      spark.readStream.text(inDir).withColumnRenamed("value", "line"))
    val q = routed.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.sinks.RoutedSink.writeRouted(batch, cfg, outDir)
      }
      .start()
    q.awaitTermination()
    spark.stop()
  }
}
