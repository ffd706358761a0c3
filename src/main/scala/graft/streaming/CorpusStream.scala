package graft.streaming

import java.sql.Timestamp

import graft.functions.TextFunctions.{fingerprint, qualityScore, tokenCount}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

/** Structured Streaming operators over a DOCUMENT ingest stream — the
  * streaming face of the training-data pipeline (SURVEY §2.9 extended
  * from events to corpus ingest): a crawl lands continuously, and the
  * first pipeline stages — content dedup, per-source quality
  * monitoring, token-budget tracking — run online instead of waiting
  * for a batch boundary.
  *
  * Same contract as [[EventStream]]: every transform is written
  * against an unbounded DataFrame, so identical code runs in true
  * streaming, `Trigger.AvailableNow` catch-up, or plain batch — which
  * is how the spec proves streaming/batch equivalence.
  *
  * Scale notes: dedup state is keyed by content fingerprint and
  * bounded by the watermark horizon (an at-least-once crawl source
  * replays recent files, not all history — full-corpus dedup remains
  * the batch operators' job); window state is (window, source)-keyed;
  * budget state is one small struct per SOURCE (bounded cardinality,
  * so `NoTimeout` state cannot grow without bound).
  */
object CorpusStream {

  /** Document-ingest schema: the testdata documents table plus an
    * ingest timestamp (a real deployment reads arrival time from the
    * crawl frontier). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Unbounded source over a directory of parquet document files. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Streaming content dedup: drop documents whose normalized-text
    * fingerprint was already seen inside the watermark horizon — the
    * online face of [[graft.operators.Dedup.exactByKey]] (crawl
    * sources re-deliver; this keeps replays out of every downstream
    * stage). Appends `fp`. */
  def dedupByContent(docs: DataFrame): DataFrame = docs
    .withColumn("fp", fingerprint(col("text")))
    .withWatermark("ts", "10 minutes")
    .dropDuplicatesWithinWatermark("fp")

  /** Windowed per-source ingest quality monitor: 1-hour event-time
    * buckets of document count, mean composite quality, low-quality
    * count (score < 0.5) and token mass — the dashboard a corpus
    * ingest pipeline alarms on (a source whose quality collapses
    * mid-crawl shows up one window later, not one batch-job later). */
  def sourceQualityWindows(docs: DataFrame): DataFrame = {
    val q = qualityScore(col("text"))
    docs
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(q), 6).as("avg_quality"),
        sum(when(q < 0.5, 1L).otherwise(0L)).as("n_low_quality"),
        sum(tokenCount(col("text")).cast("long")).as("n_tokens"))
      .select(col("w.start").as("window_start"), col("source"),
        col("n_docs"), col("avg_quality"), col("n_low_quality"),
        col("n_tokens"))
  }

  final case class Doc(doc_id: Long, ts: Timestamp, text: String, source: String)
  final case class BudgetState(nDocs: Long, nTokens: Long, nAccepted: Long)
  final case class BudgetUpdate(source: String, n_docs: Long,
      total_tokens: Long, accepted_docs: Long, over_budget: Boolean)

  /** Running per-source token budget — the streaming face of
    * [[graft.operators.Sampling.tokenBudgetSample]]: each source
    * accumulates its token total across micro-batches; a document is
    * ACCEPTED while the running total stays within `budget`, and the
    * per-batch update row reports the source's totals and whether the
    * budget line has been crossed (the signal to stop crawling that
    * source). Within a batch, documents fold in (ts, doc_id) order, so
    * the accept set is deterministic under any partitioning; token
    * counting mirrors [[graft.functions.TextFunctions.tokenCount]]
    * (whitespace split, empty text = one empty token, null text = 0).
    *
    * `mapGroupsWithState` + `NoTimeout`: budget state must NEVER
    * expire (a source's budget is cumulative for the crawl's
    * lifetime), and one small struct per source is bounded by source
    * cardinality, not corpus size. Run in Update output mode. */
  /** State of one Misra-Gries bucket: token mass seen and the
    * bounded counter map. */
  final case class MgState(seen: Long, counts: Map[String, Long])

  /** One bucket's candidate summary after a micro-batch. */
  final case class MgUpdate(bucket: Long, seen: Long, tokens: Seq[String])

  /** Streaming Misra-Gries heavy-hitter candidates — the online face
    * of [[graft.operators.HeavyHitters.topKTokens]]'s candidate pass:
    * tokens are hash-bucketed (`bucket` is the groupByKey key), each
    * bucket keeps at most `capacity` MG counters as
    * `mapGroupsWithState` state, and every micro-batch folds its
    * tokens into the sketch. State per bucket is O(capacity) FOREVER
    * — the whole point: a crawl's running "what's trending" panel at
    * bounded memory, where a streaming groupBy(token).count() would
    * grow state with the vocabulary.
    *
    * The MG guarantee per bucket: any token of its bucket with
    * frequency > seen_b/capacity is in the counter map — across
    * batches too (the decrement argument is independent of arrival
    * order). The candidate SET can vary with arrival order (inherent
    * to MG); what is deterministic is the guarantee, so an EXACT
    * consumer (rescore + bound check, as in the batch operator)
    * returns order-independent answers. Run in Update mode; the
    * latest update per bucket (max `seen`) is the live summary. */
  def mgCandidates(toks: Dataset[(Long, String)],
      capacity: Int): Dataset[MgUpdate] = {
    import toks.sparkSession.implicits._
    require(capacity > 0, s"capacity must be positive, got $capacity")
    toks.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (bucket: Long, rows: Iterator[(Long, String)],
            state: GroupState[MgState]) => {
          var s = state.getOption.getOrElse(MgState(0L, Map.empty))
          var m = collection.mutable.Map.from(s.counts)
          var seen = s.seen
          rows.foreach { case (_, t) =>
            seen += 1L
            m.get(t) match {
              case Some(c) => m.update(t, c + 1L)
              case None if m.size < capacity => m.update(t, 1L)
              case None =>
                // decrement sweep: retires >= capacity count mass
                m = m.collect {
                  case (k, c) if c > 1L => k -> (c - 1L)
                }
            }
          }
          val next = MgState(seen, m.toMap)
          state.update(next)
          MgUpdate(bucket, seen, next.counts.keys.toSeq.sorted)
        })
  }

  def runningTokenBudget(docs: Dataset[Doc], budget: Long): Dataset[BudgetUpdate] = {
    import docs.sparkSession.implicits._
    require(budget > 0, s"budget must be positive, got $budget")
    docs.groupByKey(_.source)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (source: String, rows: Iterator[Doc], state: GroupState[BudgetState]) => {
          val sorted = rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
          var s = state.getOption.getOrElse(BudgetState(0L, 0L, 0L))
          sorted.foreach { d =>
            val toks = if (d.text == null) 0L else d.text.split(" ", -1).length.toLong
            val total = s.nTokens + toks
            s = BudgetState(s.nDocs + 1L, total,
              s.nAccepted + (if (total <= budget) 1L else 0L))
          }
          state.update(s)
          BudgetUpdate(source, s.nDocs, s.nTokens, s.nAccepted,
            s.nTokens > budget)
        })
  }
}
