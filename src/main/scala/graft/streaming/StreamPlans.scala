package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Registry of streaming-query plans, for the width-risk detector.
  *
  * A streaming query's returned frame scans a memory sink — the
  * width-sensitive machinery (windowed FP averages, stateful
  * `flatMapGroupsWithState` reducers) lives in the STREAM's plan,
  * which the batch plan walker ([[graft.Scratch.widthRiskReasons]])
  * can never reach from the sink scan. This was the detector's
  * documented streaming blind spot (r9 verdict): the risky queries
  * were hand-floored in WidthDeterminismSpec.
  *
  * Every memory-sink stream in this library starts through
  * [[runAvailableNowMemory]], which records the stream frame's
  * ANALYZED plan (analysis works on streaming frames; optimization is
  * the incremental planner's job) keyed by sink name before running.
  * Callers that need to associate plans with the query they ran
  * bracket the run with [[mark]]/[[since]] — the enrollment gate's
  * pattern: mark, build the query (which runs its streams), then walk
  * every plan recorded since.
  *
  * Bounded ring (cap [[cap]]): dev/CI introspection, not a
  * correctness structure.
  */
object StreamPlans {

  private val cap = 512
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)
  private val entries =
    new java.util.concurrent.ConcurrentLinkedDeque[(Long, String, LogicalPlan)]()

  /** Record a streaming frame's analyzed plan under its sink name. */
  def record(sink: String, stream: DataFrame): Unit =
    try {
      entries.addLast((seq.incrementAndGet(), sink,
        stream.queryExecution.analyzed))
      while (entries.size > cap) entries.pollFirst()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Position marker: plans recorded after this are `since(mark)`. */
  def mark(): Long = seq.get()

  /** (sink, plan) for every stream recorded after marker `m`. */
  def since(m: Long): Seq[(String, LogicalPlan)] = {
    val out = Seq.newBuilder[(String, LogicalPlan)]
    entries.forEach { e => if (e._1 > m) out += ((e._2, e._3)) }
    out.result()
  }

  /** The one way this library runs a stream into a memory sink:
    * records the stream's plan for the detector, then runs it with
    * `Trigger.AvailableNow` under `queryName(sink)` and waits. */
  def runAvailableNowMemory(stream: DataFrame, sink: String,
      mode: OutputMode): Unit = {
    record(sink, stream)
    val q = stream.writeStream
      .format("memory")
      .queryName(sink)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
