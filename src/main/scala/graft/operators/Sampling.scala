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

  /** Temperature-flattened mixture sampling — the domain-mixing rule
    * used when rates are DERIVED from stratum sizes instead of chosen
    * by hand: stratum `s` is kept with a rate making its expected
    * share of the sample proportional to `n_s^alpha` (`alpha = 1`
    * reproduces natural proportions — every rate is exactly `frac`;
    * `alpha → 0` flattens toward uniform shares, up-weighting small
    * strata), scaled so the expected total is `frac` of the corpus.
    * Rates clip at 1.0 (a small stratum whose flattened share exceeds
    * its size is kept whole; the total then lands slightly under
    * `frac`, it is NOT redistributed — redistribution would make a
    * stratum's rate depend on other strata's clipping, breaking the
    * one-pass determinism contract).
    *
    * Execution: ONE tiny aggregate (#strata rows — same driver-side
    * class as a k-means centroid collect) fixes the per-stratum
    * counts; the weights `n^alpha`, their source-ASC-ordered sum, and
    * the rates `min(1, frac·total·w_s / (sumW·n_s))` are computed on
    * the driver in that exact expression order (an external replay
    * must follow it operation-for-operation — IEEE doubles make it
    * then bit-reproducible), and the membership test is
    * [[mixtureSample]]'s pure md5 filter: no shuffle of the corpus at
    * any scale. NULL strata take rate 0 (dropped).
    * Returns (sampled frame, the derived stratum → rate map). */
  def temperatureMixture(df: DataFrame, strata: Column, key: Column,
      alpha: Double = 0.5, frac: Double = 0.5): (DataFrame, Map[String, Double]) = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    val counts = df.groupBy(strata.cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .where(col("__s").isNotNull)
      .orderBy("__s").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    // sqrt for the 0.5 default: IEEE-exact where pow is only ≤1-ulp,
    // so an external sqrt-based replay is bit-identical (a pow ulp
    // could flip a draw only on an exact threshold collision — ~n/2^60
    // — but exact beats negligible)
    val ws = counts.map { case (_, n) =>
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    }
    val sumW = ws.sum // left-to-right over source-ASC order — pinned
    val rates = counts.zip(ws).map { case ((s, n), w) =>
      s -> math.min(1.0, frac * total.toDouble * w / (sumW * n.toDouble))
    }.toMap
    (mixtureSample(df, strata, key, rates, defaultRate = 0.0), rates)
  }

  /** Epoch-repetition mixture: the generalization of
    * [[mixtureSample]] to rates ABOVE 1 — training mixtures commonly
    * repeat small high-quality sources for several epochs ("books ×3,
    * wiki ×2.5, web ×0.4") rather than only downsampling. A rate `r`
    * emits `floor(r)` full copies of every row plus one more copy iff
    * the row's md5 draw falls below `frac(r)`, so the expected row
    * multiplicity is exactly `r` and membership of the extra copy is
    * the SAME deterministic draw as every sampler here (a row's fate
    * never depends on other rows; rates at or below 1 degrade to
    * [[mixtureSample]] exactly — same draw, same cut).
    *
    * Execution: both the copy floor and the fractional cut compile to
    * per-stratum literal when-chains, and the repetition is one
    * codegen'd `explode(sequence)` — a pure map at any corpus size, no
    * shuffle, no state. Appends `epoch` (1-based copy index; salt
    * downstream shuffle keys with it so repeated copies don't
    * co-locate). Strata absent from `rates` use `defaultRate`; NULL
    * strata likewise (they fail every equality test in the chain). */
  def repeatByRate(df: DataFrame, strata: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(_ >= 0.0),
      "all rates must be >= 0")
    def floorOf(r: Double) = math.floor(r).toLong
    def cutOf(r: Double) = ((r - math.floor(r)) * Scale).toLong
    val base = rates.foldLeft(lit(floorOf(defaultRate))) {
      case (acc, (s, r)) => when(strata === s, lit(floorOf(r))).otherwise(acc)
    }
    val cut = rates.foldLeft(lit(cutOf(defaultRate))) {
      case (acc, (s, r)) => when(strata === s, lit(cutOf(r))).otherwise(acc)
    }
    val copies = base +
      when(md5Long(key.cast("string")) < cut, lit(1L)).otherwise(lit(0L))
    df.withColumn("epoch", explode(
      when(copies >= 1L, sequence(lit(1L), copies, lit(1L)))
        .otherwise(array().cast("array<bigint>"))))
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

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis
    * & Spirakis 2006, "Weighted random sampling with a reservoir"):
    * each row draws `u` md5-uniform in (0,1] from its key and scores
    * `u^(1/w)`; the top-`n` scores are distributed as a weighted
    * sample without replacement. The implementation orders by the
    * monotone-equivalent `ln(u)/w` (descending) — one log and one
    * divide instead of pow, the better cross-engine parity surface —
    * with the key as tiebreak.
    *
    * Determinism contract as every sampler here: a row's score
    * depends only on its own (key, weight), so the draw is replayable
    * externally and stable under corpus growth (new rows can push old
    * ones out of the top-n — that is the semantics of a fixed-size
    * sample — but never REORDER survivors). Rows with NULL,
    * non-positive, or NaN weight are excluded (no defensible score —
    * and Spark's NaN ordering sorts NaN ABOVE every real score, so an
    * un-excluded 0/0 weight would silently seize the top ranks).
    *
    * Execution: `orderBy(score).limit(n)` plans TakeOrdered — each
    * partition keeps its local top-n, the driver merges
    * O(partitions·n) — no corpus shuffle; the rank window then runs
    * over n rows only. Appends `sample_rank` (1-based). */
  def weightedSample(df: DataFrame, key: Column, weight: Column, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    Seq("sample_rank", "__es").foreach(c =>
      require(!df.columns.contains(c), s"input already has a column $c"))
    // +1 keeps u in (0,1]: a zero draw would hit ln(0), which Spark
    // nulls and other engines -inf — an avoidable parity cliff
    val u = (md5Long(key.cast("string")) + 1L).cast("double") / lit(Scale.toDouble)
    val es = log(u) / weight
    df.where(weight.isNotNull && !isnan(weight.cast("double")) && weight > 0)
      .withColumn("__es", es)
      .orderBy(col("__es").desc, key)
      .limit(n)
      .withColumn("sample_rank", row_number().over(
        Window.orderBy(col("__es").desc, key)).cast("long"))
      .drop("__es")
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
