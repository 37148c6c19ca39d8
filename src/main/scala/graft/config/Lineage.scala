package graft.config

import org.apache.spark.sql.DataFrame

/** Repo-wide lineage-cut strategy for the iterative operators (CC loops,
  * nnDescent, beam search, HITS/PageRank, band sweep).
  *
  * `localCheckpoint` materializes to executor block managers only — the
  * fastest cut, but on a real cluster an executor loss makes the frame
  * unrecomputable and fails the job (documented Spark caveat; the r14
  * verdict's reliability item). Production runs set
  * `spark.graft.checkpoint.reliable=true` plus
  * `spark.sparkContext.setCheckpointDir(<fault-tolerant path>)` and every
  * cut goes through the reliable `checkpoint()` instead; local/bench runs
  * keep the default local cut, so the bench point is unchanged.
  *
  * Used via `df.transform(Lineage.cut)` (eager — the iterative-loop
  * discipline: the cut doubles as the round's one driver action) or
  * `df.transform(Lineage.cutLazy)`.
  */
object Lineage {

  private val ReliableKey = "spark.graft.checkpoint.reliable"

  private def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.get(ReliableKey, "false") == "true" && {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true needs spark.sparkContext.setCheckpointDir(" +
          "<fault-tolerant path>) first")
      true
    }

  /** Eager lineage cut (materializes now; one driver-synchronous job). */
  def cut(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Lazy lineage cut (materializes on first action). */
  def cutLazy(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)
}
