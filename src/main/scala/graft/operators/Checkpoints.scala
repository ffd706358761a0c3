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
  *    right trade on a single node and for short-lived frames. Blocks
  *    are released by the ContextCleaner when the frame is dropped.
  *  - reliable checkpoint: used automatically when the SparkContext
  *    has a checkpoint directory configured (`sc.setCheckpointDir`) —
  *    the frame is written to a uniquely-named parquet directory under
  *    the checkpoint dir and read back, so the data survives executor
  *    loss — the reliability story a 1000-executor cluster needs for a
  *    40-round iterative job. A parquet round-trip (not
  *    `Dataset.checkpoint`) because it yields a KNOWN path: iterative
  *    loops [[stableTracked]] each round and [[drop]] the superseded
  *    one, where `Dataset.checkpoint` files are only ever removed by
  *    the context cleaner under
  *    `spark.cleaner.referenceTracking.cleanCheckpoints` and would
  *    otherwise accumulate for the session lifetime.
  *
  * `spark.graft.checkpoint` overrides: "local" forces localCheckpoint
  * even with a dir configured (e.g. a test session that set a dir for
  * one suite), "auto" (default) is the dir-based selection above.
  */
object Checkpoints {

  def stable(df: DataFrame): DataFrame = stableTracked(df)._1

  /** Like [[stable]], but returns the reliable checkpoint's directory
    * (None on the localCheckpoint path) so the caller can [[drop]] it
    * once a later round supersedes the frame. */
  def stableTracked(df: DataFrame): (DataFrame, Option[String]) = {
    val sess = df.sparkSession
    val mode = sess.conf.get("spark.graft.checkpoint", "auto")
    val base = sess.sparkContext.getCheckpointDir.filter(_ => mode != "local")
    base match {
      case Some(dir) =>
        val path = s"$dir/graft-${java.util.UUID.randomUUID()}"
        df.write.parquet(path)
        // explicit schema: the round-trip must not re-infer nullability
        (sess.read.schema(df.schema).parquet(path), Some(path))
      case None => (df.localCheckpoint(), None)
    }
  }

  /** Best-effort deletion of a superseded [[stableTracked]] directory.
    * Safe to call with None (the localCheckpoint path — its blocks are
    * cleaner-managed already). */
  def drop(df: DataFrame, path: Option[String]): Unit = path.foreach { p =>
    try {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        .delete(hp, true)
      ()
    } catch { case _: java.io.IOException => () } // best-effort
  }
}
