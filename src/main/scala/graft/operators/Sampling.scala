package graft.operators

import graft.functions.TextFunctions.md5Long
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Every draw
  * derives from md5 of a stable key — not an RNG — so samples are
  * reproducible across runs, across engines (a SQL oracle replays
  * them value-for-value), and stable under incremental loads: a row's
  * membership never depends on what other rows are present, which is
  * what makes the train/holdout split leak-free when the corpus grows.
  * (`df.sample()` gives none of this: seed-dependent, partitioning-
  * dependent, and unverifiable externally.)
  */
object Sampling {

  private val Scale = 1L << 60

  /** Bernoulli-style hash sampling: keep a row iff the 60-bit md5 of
    * its key falls below `rate`·2^60. A pure filter — no shuffle, no
    * state, scan-pushdown-friendly — so it costs one codegen'd
    * predicate at any corpus size. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.where(md5Long(key.cast("string")) < (rate * Scale).toLong)
  }

  /** Deterministic train/holdout split on a stable key: the same key
    * lands on the same side forever. Salt the key (e.g.
    * `concat(key, lit("|v2"))`) to draw an independent split. */
  def hashSplit(df: DataFrame, key: Column, holdoutFrac: Double): (DataFrame, DataFrame) = {
    require(holdoutFrac >= 0.0 && holdoutFrac <= 1.0)
    val h = md5Long(key.cast("string"))
    val cut = (holdoutFrac * Scale).toLong
    (df.where(h >= cut), df.where(h < cut))
  }

  /** Mixture (domain-mix) sampling: each stratum keeps its own rate —
    * the corpus-mixing step of training-data builds ("50% of web, all
    * of books, none of the rest"). Thresholds are fixed driver-side as
    * long literals, so the per-row work is one md5 + one when-chain
    * compare (pure filter, no shuffle) and an external replay cannot
    * diverge on float rounding. Strata absent from `rates` use
    * `defaultRate`. */
  def mixtureSample(df: DataFrame, strata: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "all rates must be in [0,1]")
    val cut = rates.foldLeft(lit((defaultRate * Scale).toLong)) {
      case (acc, (s, r)) => when(strata === s, lit((r * Scale).toLong)).otherwise(acc)
    }
    df.where(md5Long(key.cast("string")) < cut)
  }

  /** Token-budget sampling: walk each stratum in md5-of-key order and
    * keep documents while the running TOKEN total stays within
    * `budget` — corpus mixing specified in token mass (how training
    * mixtures are actually defined) rather than document count. A
    * cumulative-sum window per stratum; deterministic and
    * engine-replayable like every sampler here. Kept = rows whose
    * running total ≤ budget; a NULL token count contributes 0 (so a
    * NULL-token doc's fate never depends on its hash position — the
    * window sum would otherwise be NULL until the first non-null). */
  def tokenBudgetSample(df: DataFrame, strata: Column, key: Column,
      tokenCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(strata)
      .orderBy(md5Long(key.cast("string")), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(coalesce(tokenCol, lit(0L))).over(w))
      .where(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Exact `n`-per-stratum sample, ranked by md5-of-key (with the key
    * itself as tiebreak, so the ordering is total given unique keys).
    * Plans as row_number ≤ n over a per-stratum window: Spark inserts
    * WindowGroupLimit, so every map partition keeps only its local
    * top-n per stratum before the shuffle — the shuffle moves
    * O(partitions·strata·n) rows, not the corpus. Skewed strata
    * therefore cost what balanced ones do. Appends `sample_rank`. */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    df.withColumn("sample_rank", row_number().over(
        Window.partitionBy(strata).orderBy(md5Long(key.cast("string")), key)))
      .where(col("sample_rank") <= n)
  }
}
