package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for iterative operators (connected
  * components, k-means) and operator-scoped result materialization.
  *
  * Two modes, selected per session:
  *
  *  - `localCheckpoint` (the default): blocks live only on executors —
  *    fast, no distributed-FS round-trip, but losing an executor that
  *    holds them fails the job instead of recomputing lineage. The
  *    right trade on a single node and for short-lived frames.
  *  - reliable `checkpoint()`: used automatically when the
  *    SparkContext has a checkpoint directory configured
  *    (`sc.setCheckpointDir`) — blocks go to the checkpoint FS and
  *    survive executor loss, the reliability story a 1000-executor
  *    cluster needs for a 40-round iterative job.
  *
  * `spark.graft.checkpoint` overrides: "local" forces localCheckpoint
  * even with a dir configured (e.g. a test session that set a dir for
  * one suite), "auto" (default) is the dir-based selection above.
  */
object Checkpoints {

  def stable(df: DataFrame): DataFrame = {
    val mode = df.sparkSession.conf.get("spark.graft.checkpoint", "auto")
    val reliable = mode != "local" &&
      df.sparkSession.sparkContext.getCheckpointDir.isDefined
    if (reliable) {
      // Dataset.checkpoint materializes with one job and writes
      // checkpoint files with a second — persist first so the second
      // pass reads the cache instead of re-running the lineage
      val cached = df.persist()
      val out = cached.checkpoint()
      cached.unpersist(blocking = false)
      out
    } else df.localCheckpoint()
  }
}
