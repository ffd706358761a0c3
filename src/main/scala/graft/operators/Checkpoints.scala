package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Lineage-truncation policy for this library, split by lifetime:
  *
  *  - OPERATOR RESULTS ([[materialize]]): always `localCheckpoint` —
  *    eager, executor-resident, cleaner-managed once the frame drops.
  *    Results are consumed promptly; on executor loss the caller
  *    re-runs one operator. Using reliable checkpoints here would
  *    write an undeletable directory per call (the caller owns the
  *    frame, so nothing could ever safely remove it).
  *  - LOOP STATE ([[stableTracked]] + [[drop]]): per-round frames of
  *    iterative jobs (connected components, k-means). With a
  *    checkpoint directory configured (session-scoped
  *    `spark.graft.checkpoint.dir`, else the context-global
  *    `sc.setCheckpointDir`), rounds
  *    write a uniquely-named parquet dir and DELETE the superseded
  *    round's — executor loss mid-loop costs one round, not the whole
  *    40-round job, and nothing accumulates. Without a dir (or with
  *    `spark.graft.checkpoint=local`), falls back to localCheckpoint.
  *  - MID-OPERATOR CORPUS-SCALE PASSES ([[stableDeferred]]): a frame
  *    that (a) is corpus-scale, so losing an executor's partitions
  *    mid-job should not kill a cluster-scale run (ruling out bare
  *    localCheckpoint), and (b) escapes inside the returned result's
  *    plan, so the operator can never delete it itself (ruling out
  *    [[drop]]). The written directory is registered for deletion at
  *    JVM shutdown — storage is bounded by the session's lifetime
  *    instead of growing forever (PrefixSum's window pass is the
  *    canonical caller).
  *
  * The parquet round-trip (not `Dataset.checkpoint`) is what makes
  * deletion possible: it yields a KNOWN path, where
  * `Dataset.checkpoint` files are only removed by the context cleaner
  * under `spark.cleaner.referenceTracking.cleanCheckpoints`.
  */
object Checkpoints {

  /** Reliable-checkpoint dirs awaiting the shutdown hook: (path, the
    * Hadoop conf captured at write time — the SparkSession may already
    * be stopped when the hook runs, but FileSystem.delete needs only
    * the conf). */
  private val deferred = java.util.concurrent.ConcurrentHashMap
    .newKeySet[(String, org.apache.hadoop.conf.Configuration)]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      deferred.forEach { e =>
        deferred.remove(e)
        try {
          val hp = new org.apache.hadoop.fs.Path(e._1)
          hp.getFileSystem(e._2).delete(hp, true)
          ()
        } catch { case _: java.io.IOException => () } // best-effort
      }
    }, "graft-checkpoint-cleanup"))
  }

  /** Count of directories currently registered for shutdown-time
    * deletion — observability for tests and operators. */
  def deferredCount: Int = deferred.size

  // --------------------------------------------------------------------
  // Pre-materialization plan registry (width-risk detector support).
  //
  // A checkpoint TRUNCATES lineage: downstream plans see only a
  // LogicalRDD (localCheckpoint) or a parquet scan (reliable), so a
  // plan-walking detector ([[graft.Scratch.widthRiskReasons]]) cannot
  // see the width-sensitive reducers the checkpoint hides — the r9
  // verdict's documented blind spot. Every checkpoint here therefore
  // records the plan it materialized, keyed by what the DOWNSTREAM
  // plan will contain (the checkpointed RDD's id, or the written
  // path), so the walker can look through the truncation. Operators
  // whose width-sensitive machinery runs in a SEPARATE collected
  // action (PrefixSum's splitter sketch) attach that action's plan
  // via [[attachAux]].
  //
  // Cost: a map insert per checkpoint call (the plans are lazy vals
  // the execution already computed). Memory: bounded LRU of
  // [[planRegistryCap]] entries — dev/CI introspection, not a
  // correctness structure; eviction only re-opens the blind spot for
  // ancient frames.
  // --------------------------------------------------------------------

  private sealed trait PlanKey
  private final case class RddKey(id: Int) extends PlanKey
  private final case class PathKey(path: String) extends PlanKey

  private val planRegistryCap = 512
  private[this] val planRegistry =
    new java.util.LinkedHashMap[PlanKey, Vector[LogicalPlan]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[PlanKey, Vector[LogicalPlan]]): Boolean =
        size > planRegistryCap
    }

  private def normalizePath(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** The registry key a downstream plan will use to reach this
    * materialized frame: its LogicalRDD's rdd id (localCheckpoint) or
    * its scan path (reliable parquet round-trip). */
  private def keyOfMaterialized(out: DataFrame): Option[PlanKey] =
    try out.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        Some(RddKey(lr.rdd.id))
      case _ =>
        out.queryExecution.analyzed.collectLeaves().collectFirst {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation
              if l.relation.isInstanceOf[
                org.apache.spark.sql.execution.datasources.HadoopFsRelation] =>
            PathKey(normalizePath(l.relation
              .asInstanceOf[
                org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.rootPaths.head.toString))
        }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def registerPlan(key: PlanKey, plan: LogicalPlan): Unit =
    planRegistry.synchronized {
      planRegistry.put(key,
        Option(planRegistry.get(key)).getOrElse(Vector.empty) :+ plan)
      ()
    }

  /** Best-effort: record `pre`'s optimized plan as what `out` hides.
    * Never throws — detector support must not break an operator. */
  private def recordPre(out: DataFrame, pre: DataFrame): Unit =
    try keyOfMaterialized(out)
      .foreach(registerPlan(_, pre.queryExecution.optimizedPlan))
    catch { case scala.util.control.NonFatal(_) => () }

  /** Attach an AUXILIARY plan to an already-materialized frame — for
    * width-sensitive machinery that ran as a separate collected action
    * feeding the materialized pass (PrefixSum's `percentile_approx`
    * splitter sketch is the canonical caller: its sketch never appears
    * in the returned plan, but its width sensitivity is exactly what
    * the detector must see). */
  def attachAux(materialized: DataFrame, aux: DataFrame): Unit =
    try keyOfMaterialized(materialized)
      .foreach(registerPlan(_, aux.queryExecution.optimizedPlan))
    catch { case scala.util.control.NonFatal(_) => () }

  /** Every registered plan reachable from `plan`'s leaves — the
    * detector's view through this module's lineage truncations. */
  def registeredPlans(plan: LogicalPlan): Seq[LogicalPlan] = {
    val keys: Seq[PlanKey] = plan.collectLeaves().flatMap {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        Seq(RddKey(lr.rdd.id))
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(p => PathKey(p.toUri.getPath)).toSeq
          case _ => Nil
        }
      case _ => Nil
    }
    planRegistry.synchronized {
      keys.flatMap(k => Option(planRegistry.get(k)).getOrElse(Vector.empty))
    }
  }

  /** Eagerly materialize an operator result and release its
    * intermediate caches — released even when materialization fails,
    * so an error path never pins executor storage. */
  def materialize(result: DataFrame, intermediates: DataFrame*): DataFrame =
    try {
      val out = result.localCheckpoint()
      recordPre(out, result)
      out
    } finally intermediates.foreach(_.unpersist(blocking = false))

  /** Loop-state checkpoint: (frame, reliable-checkpoint path). The
    * path is None on the localCheckpoint fallback; pass it to [[drop]]
    * once a later round supersedes the frame. */
  def stableTracked(df: DataFrame): (DataFrame, Option[String]) = {
    val sess = df.sparkSession
    val mode = sess.conf.get("spark.graft.checkpoint", "auto")
    // session-scoped dir conf first (lets concurrent sessions of one
    // context use distinct checkpoint roots without mutating the
    // context-global sc.setCheckpointDir), context dir as fallback
    val base = Option(sess.conf.get("spark.graft.checkpoint.dir", null))
      .orElse(sess.sparkContext.getCheckpointDir)
      .filter(_ => mode != "local")
    base match {
      case Some(dir) =>
        val path = s"$dir/graft-${java.util.UUID.randomUUID()}"
        df.write.parquet(path)
        // explicit schema: the round-trip must not re-infer nullability
        val out = sess.read.schema(df.schema).parquet(path)
        registerPlan(PathKey(normalizePath(path)),
          df.queryExecution.optimizedPlan)
        (out, Some(path))
      case None =>
        val out = df.localCheckpoint()
        recordPre(out, df)
        (out, None)
    }
  }

  /** [[stableTracked]] without the handle — for loop state whose
    * lifetime ends with the loop (the caller drops nothing). Prefer
    * stableTracked inside loops. */
  def stable(df: DataFrame): DataFrame = stableTracked(df)._1

  /** [[stableTracked]] for a frame that escapes inside the caller's
    * returned plan: the written directory (reliable-checkpoint mode
    * only) is registered for deletion at JVM shutdown, so repeated
    * calls on a checkpoint-dir-configured cluster accumulate storage
    * bounded by the session, not forever. The frame must not be read
    * after the JVM exits — true by construction for operator results,
    * which are consumed (or re-materialized by the caller) within the
    * session that computed them. */
  def stableDeferred(df: DataFrame): DataFrame = {
    val (out, path) = stableTracked(df)
    path.foreach { p =>
      deferred.add((p,
        df.sparkSession.sparkContext.hadoopConfiguration))
    }
    out
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
