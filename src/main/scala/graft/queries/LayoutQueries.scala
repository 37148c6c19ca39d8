package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators (SURVEY.md §2.3): at 100 TB the dominant cost
  * lever is not the plan but WHAT THE SCAN CAN SKIP, and skipping is a
  * property of file layout — min/max footer stats only prune when the
  * write clustered rows so each file covers a narrow range of the filter
  * columns. Z-order interleaving is the standard multi-dimension answer
  * (Delta/Iceberg OPTIMIZE ZORDER): map each row to a point on the
  * Z-space-filling curve of its filter dimensions, range-partition + sort
  * by that key, and every file becomes a small axis-aligned box — a
  * predicate on ANY clustered dimension prunes files, where a linear sort
  * only serves its leading column.
  *
  * `zvalue` builds the bit-interleave as a static fold of shift/mask
  * terms — plain integer arithmetic, fully codegen'd, and exactly
  * re-derivable by the oracle (no UDF, no opaque byte twiddling).
  * `ZorderSpec` measures the actual effect: with a day-band predicate the
  * Z-clustered layout's intersecting-file count must be a fraction of the
  * user-sorted layout's (which serves user predicates only).
  */
object LayoutQueries {
  import Synth._

  type Q = (SparkSession, String) => DataFrame

  /** 2-D Morton/Z-value of (x, y), `bits` bits per dimension: x's bit i
    * lands at position 2i, y's at 2i+1. Callers must pre-mask inputs to
    * `bits` (the fold ignores higher bits by construction). */
  def zvalue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        (shiftright(x, i) % 2) * lit(1L << (2 * i)) +
        (shiftright(y, i) % 2) * lit(1L << (2 * i + 1))
    }

  /** The same interleave for the DuckDB oracle: (x // 2^i % 2) · 2^(2i) +
    * (y // 2^i % 2) · 2^(2i+1), summed. */
  def zvalueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"($x // ${1L << i} % 2) * ${1L << (2 * i)}" +
        s" + ($y // ${1L << i} % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Events keyed by the Z-value of (user_id, day) — the clustering key a
    * 100-TB events table would OPTIMIZE ZORDER BY for user- and
    * time-sliced reads. 16 bits/dim here (65k users × 65k days); inputs
    * masked to the bit budget so the key is total on any id range. */
  private val qZorderKey: Q = (s, dir) =>
    eventsTs(s, dir)
      .select(col("event_id"), (col("user_id") % 65536).as("ux"),
        expr("ts_us div 86400000000 % 65536").as("dy"))
      .select(col("event_id"), col("ux").as("user_dim"), col("dy").as("day_dim"),
        zvalue(col("ux"), col("dy"), 16).as("z"))
      .orderBy("z", "event_id")

  val queries: Map[String, Q] = Map("q_zorder_key" -> qZorderKey)

  val oracle: Map[String, String] = Map(
    "q_zorder_key" -> {
      val z = zvalueSql("ux", "dy", 16)
      s"""WITH e AS (
         |  SELECT event_id, user_id % 65536 AS ux,
         |    epoch_us(ts) // 86400000000 % 65536 AS dy
         |  FROM events)
         |SELECT event_id, ux AS user_dim, dy AS day_dim,
         |  CAST($z AS BIGINT) AS z
         |FROM e ORDER BY z, event_id""".stripMargin
    })
}
