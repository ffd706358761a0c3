package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The canonical training-corpus preparation flow, composed from this
  * library's operators — what a 100 TB corpus build actually runs,
  * end to end:
  *
  *   quality filter → exact dedup → near-dup cluster dedup →
  *   decontaminate vs eval → mixture sample → train/holdout split →
  *   token-budget packing
  *
  * Each stage is the already-tested operator; this type adds the
  * composition, the stage-count report (the run's audit artifact —
  * how much each gate removed), and the cache discipline: each stage
  * frame is persisted so the NEXT stage and the count read one
  * materialization, then everything is released once the final
  * frames are checkpointed. All determinism guarantees compose: the
  * same corpus in, the same packed training set out.
  */
object CorpusPipeline {

  /** Stage-count collector shared by [[prepare]] and the q68 driver
    * query: each stage's row count rides the cache's FIRST (full-scan)
    * materialization as an observed metric instead of a dedicated
    * count job. `counts` is called only AFTER the pipeline's terminal
    * actions complete, so correctness needs only that the listener bus
    * finish delivering: counts drains the bus ONCE (bounded by
    * `awaitMillis`, default 2 s — the drain returns in milliseconds
    * on an idle bus) and then reads every metric non-blockingly. A
    * loaded cluster no longer silently demotes observed counts to
    * fallback count() jobs the way the old 250 ms raced bound did, and
    * a metric that genuinely never fires (a cache first materialized
    * through an RDD-level path, e.g. inside a localCheckpoint job)
    * costs NO wait at all — after the drain it is known to be absent
    * and the cache-warm count() keeps the report correct. `release`
    * completes-and-deregisters every observation
    * ([[org.apache.spark.sql.graft.ObservationBridge]]) so a session
    * running many pipeline invocations accumulates no manager
    * entries. */
  // 2 s default drain bound: ample for an idle-ish bus, and the cost
  // of an incomplete drain is only a cache-warm fallback count — not
  // worth stalling a busy 32-core bus's event backlog for 10 s
  private[graft] final class StageCounter(awaitMillis: Long = 2000L) {
    private val staged = scala.collection.mutable.ListBuffer
      .empty[(String, org.apache.spark.sql.Observation, DataFrame)]
    def stage(name: String, df: DataFrame): DataFrame = {
      val obs = new org.apache.spark.sql.Observation()
      val p = df.observe(obs, count(lit(1)).as("n")).persist()
      staged += ((name, obs, p))
      p
    }
    def counts: List[(String, Long)] = {
      // one bounded drain of the listener bus (returns as soon as the
      // bus is empty — milliseconds in practice), then every metric is
      // read NON-blockingly: a metric absent after the drain is never
      // coming (its cache was first filled through an RDD-level path,
      // e.g. inside a localCheckpoint job), so it falls straight back
      // to a cache-warm count() instead of burning a per-stage wait.
      // The empty-row filter covers counts-after-release misuse:
      // release() completes never-fired observations with Row.empty,
      // which must degrade to the fallback, not throw.
      staged.headOption.foreach { case (_, _, p) =>
        org.apache.spark.sql.graft.ObservationBridge
          .drainListeners(p.sparkSession, awaitMillis)
      }
      val resolved = staged.map { case (name, obs, p) =>
        val observed = scala.util.Try(
            org.apache.spark.sql.graft.ObservationBridge.rowOrEmpty(obs))
          .toOption.flatten.filter(_.length > 0)
        (name, observed.map(_.getLong(0)), p)
      }
      if (sys.env.contains("GRAFT_PIPELINE_DEBUG"))
        println(s"[pipeline] observed=${resolved.count(_._2.isDefined)} " +
          s"fallback=${resolved.count(_._2.isEmpty)}")
      resolved.map { case (name, observed, p) =>
        name -> observed.getOrElse(p.count())
      }.toList
    }
    def release(): Unit = staged.foreach { case (_, obs, p) =>
      org.apache.spark.sql.graft.ObservationBridge.discard(p.sparkSession, obs)
      p.unpersist(blocking = false)
    }
  }

  final case class Config(
      minQuality: Double = 0.3,
      nearDupBits: Int = 48,
      nearDupMaxHamming: Int = 3,
      mixtureRates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0,
      // drop a training doc when MORE than this PERCENT (0–100, the
      // scale of Dedup.contamination's contamination_pct) of its
      // shingles appears in the eval corpus; 0.0 is maximally strict
      // and WILL over-delete on natural language (common trigrams
      // hit) — raise it for real corpora
      maxContaminationPct: Double = 0.0,
      holdoutFrac: Double = 0.05,
      packBudget: Long = 2048)

  /** `train` is packed (pack_id/pack_fill appended); `holdout` is the
    * leak-free eval slice, unpacked; `report` maps stage → rows out. */
  final case class Result(train: DataFrame, holdout: DataFrame,
      report: Seq[(String, Long)])

  /** @param sharedShingles caller-owned [[Dedup.ShingleCache]] built
    *   over the RAW input corpus (same id column, shingle width 3 —
    *   the contamination default). When provided, the decontamination
    *   stage reuses that one corpus-wide shingle materialization
    *   ([[Dedup.contaminationFromSuperset]] semi-joins it down to the
    *   surviving docs) instead of re-shingling the filtered corpus —
    *   at 100 TB, one shingle pass instead of one per consumer. The
    *   caller releases it. */
  def prepare(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sourceCol: String = "source",
      evalDocs: Option[DataFrame] = None,
      cfg: Config = Config(),
      sharedShingles: Option[Dedup.ShingleCache] = None): Result = {
    // validate the shared cache up front against THIS call's corpus
    // and the contamination default width (the one shared-cache
    // contract, enforced by the one shared validator) — a mismatched
    // cache would silently gate decontamination on different shingles
    sharedShingles.foreach(c => Dedup.validateShared(c, docs, idCol, 3))
    val counter = new StageCounter
    def stage(name: String, df: DataFrame): DataFrame = counter.stage(name, df)

    val input = stage("input", docs)
    val quality = stage("quality_filter",
      input.where(qualityScore(col(textCol)) >= cfg.minQuality))
    val exact = stage("exact_dedup",
      Dedup.exactByKey(quality, fingerprint(col(textCol)), idCol))
    val pairs = Dedup.simhashNearDupPairs(exact, idCol, textCol,
      bits = cfg.nearDupBits, maxHamming = cfg.nearDupMaxHamming)
    val nearDup = stage("near_dup_cluster_dedup",
      Dedup.dedupByClusters(exact, Dedup.connectedComponents(pairs), idCol))
    // decontaminate: drop training docs that overlap the eval corpus.
    // The checked (test) side is the FILTERED corpus, so a caller-held
    // cache over the raw corpus reuses through the superset path.
    val clean = evalDocs match {
      case Some(ev) =>
        val cont = sharedShingles match {
          case Some(c) => Dedup.contaminationFromSuperset(ev, nearDup, idCol, textCol, c)
          case None => Dedup.contamination(ev, nearDup, idCol, textCol)
        }
        val contaminated = cont
          .where(col("contamination_pct") > cfg.maxContaminationPct).select(idCol)
        stage("decontaminate", nearDup.join(contaminated, Seq(idCol), "left_anti"))
      case None => nearDup
    }
    val mixed = stage("mixture_sample",
      Sampling.mixtureSample(clean, col(sourceCol), col(idCol),
        cfg.mixtureRates, cfg.defaultRate))
    val (trainDocs, holdout) =
      Sampling.hashSplit(mixed, concat(col(idCol), lit("|holdout")), cfg.holdoutFrac)
    val packed = Packing.packSequences(
      stage("train", trainDocs.withColumn("n_tokens",
        tokenCount(col(textCol)).cast("long"))),
      idCol, "n_tokens", cfg.packBudget)

    val train = Checkpoints.materialize(packed)
    val hold = Checkpoints.materialize(holdout)
    val report = counter.counts :+ ("holdout" -> hold.count())
    counter.release()
    Result(train, hold, report)
  }
}
