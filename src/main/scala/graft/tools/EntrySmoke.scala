package graft.tools

import org.apache.spark.sql.SparkSession

/** Simulates the driver's smoke check: a PLAIN session (no graft extensions,
  * no UTC/nanos configs, default 200 shuffle partitions) calling
  * SparkEntry.entry — must return rows > 0.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[entry-smoke] rows=${rows.length}")
    rows.foreach(r => println(s"[entry-smoke] $r"))
    assert(rows.nonEmpty)
    spark.stop()
  }
}
