package org.apache.spark.sql.graft

import org.apache.spark.sql.{Observation, Row, SparkSession}

/** Cleanup shim for [[Observation]]s whose metric never fires (e.g. a
  * cache first materialized through an RDD-level path): the session's
  * `ObservationManager` keeps every registered observation in a map
  * until its query completes, so a long session running many
  * observe-and-maybe-fall-back pipelines would accumulate entries
  * forever. Spark exposes no public deregistration, hence this shim
  * (same idiom as [[ColumnBridge]]): complete the promise so any later
  * wait returns immediately, then best-effort remove the manager's map
  * entry by identity. Both steps are no-ops for observations that
  * fired normally (the manager already removed them on completion).
  */
object ObservationBridge {

  private def managerMap(sess: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[AnyRef, Observation] = {
    val mgr = sess.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .observationManager
    val f = mgr.getClass.getDeclaredField("observations")
    f.setAccessible(true)
    f.get(mgr).asInstanceOf[java.util.concurrent.ConcurrentHashMap[AnyRef, Observation]]
  }

  /** Complete a (possibly never-fired) observation and drop its
    * registration. Best-effort: any reflection failure on a future
    * Spark's internals degrades to the old leak, never to an error. */
  def discard(sess: SparkSession, obs: Observation): Unit = {
    scala.util.Try {
      obs.setMetricsAndNotify(Row.empty)
      val it = managerMap(sess).entrySet().iterator()
      while (it.hasNext) if (it.next().getValue eq obs) it.remove()
    }
    ()
  }

  /** Number of observations currently registered on the session —
    * spec support for the no-accumulation guarantee (-1 if the
    * internals moved). */
  def registeredCount(sess: SparkSession): Int =
    scala.util.Try(managerMap(sess).size()).getOrElse(-1)

  /** Non-blocking metric read (`Observation.getRowOrEmpty` is
    * `private[sql]`): None until the metric fires. */
  def rowOrEmpty(obs: Observation): Option[Row] = obs.getRowOrEmpty

  /** Block (bounded) until the listener bus has delivered every queued
    * event. After the bus is drained, an observation that has not
    * completed NEVER will (its query already finished), so callers can
    * read metrics non-blockingly instead of paying a per-observation
    * wait for metrics that are never coming. Returns false on timeout
    * or if the internals moved. */
  def drainListeners(sess: SparkSession, timeoutMs: Long): Boolean =
    scala.util.Try(
      sess.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)).isSuccess
}
