package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling z-score — the live twin of the batch
  * `q_rolling_zscore` key: per event type, a ring buffer of the trailing
  * [[ZscoreStream.WindowRows]] values is the ENTIRE state, and each
  * arriving event is scored against the buffer BEFORE being appended
  * (exactly the batch frame `ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING`).
  * Arithmetic mirrors the batch path bit for bit: values quantize through
  * the scale-6 half-up decimal cast (the MomentsStream discipline), sums
  * are exact decimals, and the mean/var/σ expression is evaluated in the
  * same IEEE order — so under in-order arrival the stream's flags equal
  * the batch key's rows exactly.
  *
  * State per key: ≤ 20 doubles + a count. One stateful shuffle on type.
  */
object ZscoreStream {
  val WindowRows = 20
  val MinWindow = 10
  val Threshold = 3.0

  final case class Flagged(event_type: String, event_id: Long, value: Double, z: Double)

  private def q6(v: Double): BigDecimal =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  /** rows(event_type, event_id, ts_us, value) → anomalies. */
  def flag(rows: DataFrame): Dataset[Flagged] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("event_type"), col("event_id"), col("ts_us"), col("value"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[(String, Long, Long, Double)],
            state: GroupState[List[Double]]) => {
          var buf = state.getOption.getOrElse(Nil) // oldest first
          val out = scala.collection.mutable.ListBuffer.empty[Flagged]
          it.toSeq.sortBy(e => (e._3, e._2)).foreach { case (_, id, _, v) =>
            if (buf.size >= MinWindow) {
              val n = buf.size.toLong
              val sv = buf.map(q6).sum.toDouble
              val sv2 = buf.map(x => q6(x * x)).sum.toDouble
              val varg = sv2 / n - (sv / n) * (sv / n)
              if (varg > 0) {
                val z = (v - sv / n) / math.sqrt(varg)
                if (math.abs(z) > Threshold) out += Flagged(key, id, v, z)
              }
            }
            buf = (buf :+ v).takeRight(WindowRows)
          }
          state.update(buf)
          out.iterator
        })
  }
}
