package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Customer-analytics operators over the star schema's fact grain —
  * the question set a retail warehouse like the reference's exists to
  * answer (BUSINESS_REQUIREMENTS.md's "customer purchasing behavior"
  * family, `etl_target_loader.py`'s fact tables), expressed as
  * reusable frame transforms.
  */
object Analytics {

  /** Cohort retention matrix: customers grouped by their FIRST-order
    * month (the cohort), counted in every subsequent month they come
    * back — the standard retention triangle (cohort_month,
    * month_offset, n_customers).
    *
    * Scale shape: one customer-keyed aggregate for the cohort
    * assignment, one distinct over (customer, month) so a customer
    * counts once per month regardless of order volume, one
    * broadcast-able join back (customer-cardinality frame), and one
    * (cohort, offset)-keyed count-distinct (Spark's two-phase
    * partial distinct — no hot reducer on big cohorts). */
  def cohortRetention(orders: DataFrame, custCol: String, dateCol: String): DataFrame = {
    // ONE fact-table pass: the cohort month reduces the distinct
    // (customer, month) frame the triangle needs anyway
    // (min(trunc(date)) ≡ min over the distinct months)
    val activity = orders
      .select(col(custCol), trunc(col(dateCol), "month").as("__m")).distinct()
      .persist()
    val firstMonth = activity.groupBy(col(custCol)).agg(min("__m").as("__cohort"))
    graft.operators.Checkpoints.materialize(
      activity.join(firstMonth, custCol)
        .groupBy(
          (year(col("__cohort")) * 100 + month(col("__cohort")))
            .cast("long").as("cohort_month"),
          months_between(col("__m"), col("__cohort")).cast("int").as("month_offset"))
        .agg(countDistinct(col(custCol)).as("n_customers")),
      activity)
  }

  /** RFM segmentation (recency / frequency / monetary): per-customer
    * metrics banded 1..5 by exact quintile cuts, reported as segment
    * counts. Band 1 holds the LOWEST metric values (shortest recency
    * = most recently active lands in band 1; heaviest
    * spenders/most-frequent buyers land in band 5); a value equal to
    * a cut takes the lower band — the
    * [[graft.operators.LangModel.perplexityBuckets]] convention, and
    * like there the cuts come from ONE exact-percentile aggregate
    * (quantile_cont semantics, rounded 6dp so an external replay
    * lands on identical cuts) broadcast onto the per-customer frame,
    * never a global ntile sort. Returns
    * (r_band, f_band, m_band, n_customers, sum_monetary). */
  def rfmSegments(orders: DataFrame, custCol: String, dateCol: String,
      amtCol: String, asOf: String): DataFrame = {
    // monetary rounds to cents BEFORE any cut/band comparison: raw
    // double sums carry partial-aggregation-order ulps that could
    // straddle a quintile cut differently per engine/run
    val perCust = orders.groupBy(col(custCol))
      .agg(datediff(lit(asOf).cast("date"), max(col(dateCol))).as("recency"),
        count(lit(1)).as("frequency"),
        round(sum(col(amtCol)), 2).as("monetary"))
      .persist()
    val ps = Seq(0.2, 0.4, 0.6, 0.8)
    // ONE array-form percentile per metric (the exactQuantiles /
    // perplexityBuckets pattern) — four scalar percentile() calls
    // would buffer and sort each metric column four times
    val bounds = perCust.agg(
      percentile(col("recency"), typedLit(ps)).as("__rq"),
      percentile(col("frequency"), typedLit(ps)).as("__fq"),
      percentile(col("monetary"), typedLit(ps)).as("__mq"))
    def band(c: String, q: String): Column =
      when(col(c) <= round(element_at(col(q), 1), 6), 1)
        .when(col(c) <= round(element_at(col(q), 2), 6), 2)
        .when(col(c) <= round(element_at(col(q), 3), 6), 3)
        .when(col(c) <= round(element_at(col(q), 4), 6), 4)
        .otherwise(5)
    graft.operators.Checkpoints.materialize(
      perCust.crossJoin(broadcast(bounds))
        .select(col(custCol), band("recency", "__rq").as("r_band"),
          band("frequency", "__fq").as("f_band"),
          band("monetary", "__mq").as("m_band"),
          col("monetary"))
        .groupBy("r_band", "f_band", "m_band")
        .agg(count(lit(1)).as("n_customers"),
          round(sum("monetary"), 2).as("sum_monetary")),
      perCust)
  }

  /** Ordered funnel conversion over an event stream: how many users
    * performed step 1, then step 2 STRICTLY AFTER their first step-1
    * event, then step 3 after that — the sequential-audience question
    * a flat `count distinct per type` gets wrong (a user who
    * purchased before ever searching is not a converted searcher).
    *
    * Execution: events filter to the funnel's types FIRST (a
    * codegen'd pushdown-friendly filter — the only corpus-scale
    * pass), then one user-keyed conditional aggregate per step, each
    * joined back user-keyed (uniform, broadcastable once the
    * audience shrinks). Steps are first-reach times: step i's time
    * is the MIN event time of type i after the user's step-(i−1)
    * time. Returns one row per step: (step, event_type, n_users,
    * pct_of_step1 rounded 4dp). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    val spark = events.sparkSession
    val ev = events.select(col(userCol).as("__u"), col(typeCol).as("__t"),
        col(tsCol).as("__ts"))
      .where(col("__t").isin(steps: _*)).persist()
    try {
      // reach(i) = (user, time of first step-i event after reach(i-1));
      // each reach is persisted and its count() materializes it, so
      // step k+1 joins cached step-k output instead of re-running
      // steps 1..k's aggregates (an O(k²) re-execution otherwise)
      var reach = ev.where(col("__t") === steps.head)
        .groupBy("__u").agg(min("__ts").as("__r")).persist()
      val counts = scala.collection.mutable.ArrayBuffer[(Int, String, Long)](
        (1, steps.head, reach.count()))
      for ((st, i) <- steps.zipWithIndex.drop(1)) {
        val prev = reach
        reach = ev.where(col("__t") === st)
          .join(prev.select(col("__u"), col("__r").as("__prev")), Seq("__u"))
          .where(col("__ts") > col("__prev"))
          .groupBy("__u").agg(min("__ts").as("__r")).persist()
        counts += ((i + 1, st, reach.count()))
        prev.unpersist(blocking = false)
      }
      reach.unpersist(blocking = false)
      import spark.implicits._
      val base = counts.head._3
      // empty step-1 audience -> NULL percentages (both engines);
      // a 0.0 here would diverge from the oracle's divide-by-zero
      counts.toSeq.toDF("step", "event_type", "n_users")
        .withColumn("pct_of_step1",
          when(lit(base) === 0, lit(null).cast("double"))
            .otherwise(round(col("n_users") * lit(100.0) / lit(base), 4)))
    } finally ev.unpersist(blocking = false)
  }

  /** Daily activity with a trailing moving average and week-over-week
    * growth — the monitoring triple every event dashboard draws.
    * The window runs on the DAY-GRAIN frame (one row per calendar
    * day — thousands of rows for years of data), never the raw
    * events: the corpus-scale work is exactly one date-keyed
    * aggregate. The moving average is RANGE-framed over the day
    * ordinal, so calendar gaps count as absent days instead of
    * silently stretching the window. Returns (day, n_events,
    * avg_trailing rounded 4dp, wow_pct rounded 4dp — null when no
    * event landed exactly 7 days earlier). */
  def rollingDaily(events: DataFrame, tsCol: String, window: Int = 7): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("__ord", datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.orderBy(col("__ord")).rangeBetween(-(window - 1), 0)
    // the week-over-week lag is a FIXED calendar 7 days, independent
    // of the trailing-average window — a 14-day average must not
    // silently turn the growth column into 14-day-over-14-day
    val wPrev = Window.orderBy(col("__ord")).rangeBetween(-7, -7)
    daily
      .withColumn("avg_trailing", round(avg(col("n_events")).over(w), 4))
      .withColumn("wow_pct",
        round((col("n_events") - first(col("n_events")).over(wPrev)) * 100.0 /
          first(col("n_events")).over(wPrev), 4))
      .select(col("day"), col("n_events"), col("avg_trailing"), col("wow_pct"))
  }

  /** Exponentially-weighted moving average of the daily event count
    * per key — the standard trend smoother for operational series
    * (anomaly baselines, traffic dashboards):
    *
    *   ewma₀ = n₀,   ewmaᵢ = α·nᵢ + (1−α)·ewmaᵢ₋₁,   α = aNum/aDen
    *
    * over the key's day-ordered series. Determinism is STRONGER than
    * the pageRank round-at-9dp rule here: a recurrence that rounds a
    * double each step generates exact decimal half-way cases (α=0.3
    * over 6dp values yields ...5 at the 7th place constantly), and
    * engines then disagree on which side the nearest double falls. So
    * the state is exact FIXED-POINT: integer micro-units (1e-6), each
    * step `(2·(aNum·n·1e6 + (aDen−aNum)·em) + aDen) div (2·aDen)` —
    * half-up rounding in pure bigint arithmetic, bit-identical on any
    * engine. Alpha is therefore a RATIONAL parameter. Daily grain uses
    * COUNTS (exact integers) — a double-sum daily measure would make
    * the recurrence's input depend on partition-level FP summation
    * order. Overflow headroom: daily counts to ~1e11 fit the bigint
    * intermediate.
    *
    * Zero days COUNT: the key's calendar is densified between its
    * first and last active day, so a silent day enters the recurrence
    * as n = 0 and the EWMA decays through an outage — the exact
    * signal an anomaly baseline exists to capture. (Without this, the
    * fold would see consecutive OBSERVATIONS and resume at the
    * pre-outage level as if nothing happened.)
    *
    * Scale shape: one map-side-combined aggregate to the (key, day)
    * grain, then ONE aggregate to per-key day-sorted arrays folded by
    * a sequential `aggregate` lambda. The fold is inherently serial
    * per key (each step needs its predecessor), so the parallel unit
    * is the key, and the collected series is CALENDAR-bounded — ten
    * years of days is ~3.7k structs per key regardless of corpus
    * size. A window-function formulation would shuffle the same rows
    * and still serialize per key, with an extra sort. Returns
    * (keyCol, day, n_events, ewma). */
  /** Per-key daily event counts DENSIFIED over each key's [first,
    * last] calendar span (n = 0 on silent days) — the shared front of
    * [[ewmaDaily]] and [[dailyAnomalies]], where a missing day is
    * signal (an outage), not absence. Returns (dense frame with
    * (keyCol, day, n), persisted daily aggregate the caller must
    * release via Checkpoints.materialize). */
  private def densifiedDaily(events: DataFrame, keyCol: String,
      tsCol: String): (DataFrame, DataFrame) = {
    // daily feeds both the span aggregate and the densify join —
    // persisted so the event-scale aggregate runs once (the
    // eventTransitions discipline)
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
      .persist()
    // the explode is calendar-bounded: ten years of days is ~3.7k
    // rows per key regardless of corpus size
    val dense = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"), expr("interval 1 day")))
          .as("day"))
      .join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"), coalesce(col("n"), lit(0L)).as("n"))
    (dense, daily)
  }

  def ewmaDaily(events: DataFrame, keyCol: String, tsCol: String,
      alphaNum: Int = 3, alphaDen: Int = 10): DataFrame = {
    require(alphaNum > 0 && alphaDen >= alphaNum,
      s"alpha must be a rational in (0,1], got $alphaNum/$alphaDen")
    val beta = alphaDen - alphaNum
    val (dense, daily) = densifiedDaily(events, keyCol, tsCol)
    val ser = dense.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("__s"))
    val out = ser
      .withColumn("__e", expr(
        s"""aggregate(__s,
              cast(array() as array<struct<day: date, n: bigint, em: bigint>>),
              (acc, p) -> array_append(acc, named_struct(
                'day', p.day, 'n', p.n,
                'em', case when size(acc) = 0 then p.n * 1000000
                      else (2 * ($alphaNum * p.n * 1000000
                                 + $beta * element_at(acc, -1).em)
                            + $alphaDen) div (2 * $alphaDen)
                      end)))"""))
      .select(col(keyCol), explode(col("__e")).as("__x"))
      .select(col(keyCol), col("__x.day").as("day"),
        col("__x.n").as("n_events"),
        (col("__x.em").cast("double") / lit(1e6)).as("ewma"))
    graft.operators.Checkpoints.materialize(out, daily)
  }

  /** Holt linear-trend double exponential smoothing of the per-key
    * daily event count — [[ewmaDaily]]'s two-state sibling for series
    * with drift (an EWMA lags a trending series forever; Holt carries
    * an explicit trend term and its one-step forecast is unbiased on
    * a linear ramp):
    *
    *   l₀ = n₀, b₀ = 0
    *   lᵢ = α·nᵢ + (1−α)·(lᵢ₋₁ + bᵢ₋₁)
    *   bᵢ = β·(lᵢ − lᵢ₋₁) + (1−β)·bᵢ₋₁
    *
    * Determinism: the [[ewmaDaily]] fixed-point discipline, with one
    * twist the single-state EWMA never faces — the TREND state goes
    * NEGATIVE on any downturn, and integer `div` truncates toward
    * zero (both Spark's `div` and DuckDB's `//`), which breaks
    * half-up rounding below zero (trunc(−3.25 + ½) = −2, not −3). So
    * each step rounds via true FLOOR division,
    * `floor((2x + d) / (2d))` — here as the pure-integer
    * `(a − pmod(a, 2d)) div 2d` (pmod's non-negative remainder makes
    * the numerator exactly divisible). An external replay may use
    * exact-double floor division instead; the two agree while states
    * stay under 2^53 micro-units (daily counts to ~4·10⁸ — far past
    * any real series). Both alphas are RATIONAL parameters, as in
    * [[ewmaDaily]].
    *
    * Scale shape: identical to [[ewmaDaily]] — the [[densifiedDaily]]
    * front (zero days decay the level and pull the trend down, the
    * outage signal), then one per-key day-sorted array fold; the
    * serial unit is the key, the series is calendar-bounded. Returns
    * (keyCol, day, n_events, level, trend, forecast_next) — level and
    * trend as micro-unit-exact doubles, forecast_next = level + trend
    * (the one-step-ahead prediction an alerting threshold compares
    * tomorrow's count against). */
  def holtDaily(events: DataFrame, keyCol: String, tsCol: String,
      alphaNum: Int = 3, alphaDen: Int = 10,
      betaNum: Int = 2, betaDen: Int = 10): DataFrame = {
    require(alphaNum > 0 && alphaDen >= alphaNum,
      s"alpha must be a rational in (0,1], got $alphaNum/$alphaDen")
    require(betaNum > 0 && betaDen >= betaNum,
      s"beta must be a rational in (0,1], got $betaNum/$betaDen")
    val aGap = alphaDen - alphaNum
    val bGap = betaDen - betaNum
    val (dense, daily) = densifiedDaily(events, keyCol, tsCol)
    // floor((x) / d) in pure bigint arithmetic; x is duplicated in the
    // generated SQL, which stays exact (no CSE concerns — pure exprs)
    def fdiv(x: String, d: Long) = s"(($x) - pmod(($x), $d)) div $d"
    val prevL = "element_at(acc, -1).lm"
    val prevB = "element_at(acc, -1).bm"
    val lm2 = fdiv(
      s"2 * ($alphaNum * p.n * 1000000 + $aGap * ($prevL + $prevB)) + $alphaDen",
      2L * alphaDen)
    val bm2 = fdiv(
      s"2 * ($betaNum * (($lm2) - $prevL) + $bGap * $prevB) + $betaDen",
      2L * betaDen)
    val ser = dense.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("__s"))
    val out = ser
      .withColumn("__e", expr(
        s"""aggregate(__s,
              cast(array() as array<struct<day: date, n: bigint,
                                           lm: bigint, bm: bigint>>),
              (acc, p) -> array_append(acc, named_struct(
                'day', p.day, 'n', p.n,
                'lm', case when size(acc) = 0 then p.n * 1000000
                      else $lm2 end,
                'bm', case when size(acc) = 0 then cast(0 as bigint)
                      else $bm2 end)))"""))
      .select(col(keyCol), explode(col("__e")).as("__x"))
      .select(col(keyCol), col("__x.day").as("day"),
        col("__x.n").as("n_events"),
        (col("__x.lm").cast("double") / lit(1e6)).as("level"),
        (col("__x.bm").cast("double") / lit(1e6)).as("trend"),
        ((col("__x.lm") + col("__x.bm")).cast("double") / lit(1e6))
          .as("forecast_next"))
    graft.operators.Checkpoints.materialize(out, daily)
  }

  /** Holt-Winters additive triple smoothing of the per-key daily
    * count — [[holtDaily]] plus a `period`-lagged seasonal state (the
    * weekly rhythm an operational series actually has; Holt chases
    * the weekend dip as trend, Holt-Winters books it as seasonality):
    *
    *   lᵢ = α·(nᵢ − sᵢ₋ₚ) + (1−α)·(lᵢ₋₁ + bᵢ₋₁)
    *   bᵢ = β·(lᵢ − lᵢ₋₁) + (1−β)·bᵢ₋₁
    *   sᵢ = γ·(nᵢ − lᵢ) + (1−γ)·sᵢ₋ₚ
    *
    * with l₀ = n₀, b₀ = 0 and the first period's seasonal state 0
    * (the deterministic cold start — after one period the γ
    * recurrence owns the seasonal estimate).
    *
    * Determinism: the [[holtDaily]] fixed-point discipline verbatim —
    * integer micro-units, rational smoothing factors, every step a
    * true floor division via the pmod spelling (all three states go
    * negative on downturns/anti-seasonal days). The seasonal lag
    * reads `acc[−period]` from the fold's own history: the state IS
    * the day-sorted array the fold builds, so no second pass and no
    * extra shuffle vs Holt. An external replay carries the last
    * `period` seasonal values as a bounded list (the oracle does).
    *
    * Scale shape: identical to [[holtDaily]] — [[densifiedDaily]]
    * front, one per-key calendar-bounded array fold. Returns
    * (keyCol, day, n_events, level, trend, seasonal). */
  def holtWintersDaily(events: DataFrame, keyCol: String, tsCol: String,
      alphaNum: Int = 3, alphaDen: Int = 10,
      betaNum: Int = 2, betaDen: Int = 10,
      gammaNum: Int = 2, gammaDen: Int = 10,
      period: Int = 7): DataFrame = {
    require(alphaNum > 0 && alphaDen >= alphaNum,
      s"alpha must be a rational in (0,1], got $alphaNum/$alphaDen")
    require(betaNum > 0 && betaDen >= betaNum,
      s"beta must be a rational in (0,1], got $betaNum/$betaDen")
    require(gammaNum > 0 && gammaDen >= gammaNum,
      s"gamma must be a rational in (0,1], got $gammaNum/$gammaDen")
    require(period >= 2, s"period must be >= 2, got $period")
    val aGap = alphaDen - alphaNum
    val bGap = betaDen - betaNum
    val gGap = gammaDen - gammaNum
    val (dense, daily) = densifiedDaily(events, keyCol, tsCol)
    def fdiv(x: String, d: Long) = s"(($x) - pmod(($x), $d)) div $d"
    val prevL = "element_at(acc, -1).lm"
    val prevB = "element_at(acc, -1).bm"
    val sLag = s"(case when size(acc) >= $period " +
      s"then element_at(acc, -$period).sm else cast(0 as bigint) end)"
    val lm2 = fdiv(
      s"2 * ($alphaNum * (p.n * 1000000 - $sLag) + $aGap * ($prevL + $prevB))" +
        s" + $alphaDen", 2L * alphaDen)
    val bm2 = fdiv(
      s"2 * ($betaNum * (($lm2) - $prevL) + $bGap * $prevB) + $betaDen",
      2L * betaDen)
    val sm2 = fdiv(
      s"2 * ($gammaNum * (p.n * 1000000 - ($lm2)) + $gGap * $sLag)" +
        s" + $gammaDen", 2L * gammaDen)
    val ser = dense.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("__s"))
    val out = ser
      .withColumn("__e", expr(
        s"""aggregate(__s,
              cast(array() as array<struct<day: date, n: bigint,
                                           lm: bigint, bm: bigint,
                                           sm: bigint>>),
              (acc, p) -> array_append(acc, named_struct(
                'day', p.day, 'n', p.n,
                'lm', case when size(acc) = 0 then p.n * 1000000
                      else $lm2 end,
                'bm', case when size(acc) = 0 then cast(0 as bigint)
                      else $bm2 end,
                'sm', case when size(acc) = 0 then cast(0 as bigint)
                      else $sm2 end)))"""))
      .select(col(keyCol), explode(col("__e")).as("__x"))
      .select(col(keyCol), col("__x.day").as("day"),
        col("__x.n").as("n_events"),
        (col("__x.lm").cast("double") / lit(1e6)).as("level"),
        (col("__x.bm").cast("double") / lit(1e6)).as("trend"),
        (col("__x.sm").cast("double") / lit(1e6)).as("seasonal"))
    graft.operators.Checkpoints.materialize(out, daily)
  }

  /** Theil-Sen robust trend of the per-key daily event count: the
    * median over all day pairs (i < j) of the pairwise slope
    * (nⱼ − nᵢ)/(ordⱼ − ordᵢ), with the matching intercept
    * median(nᵢ − slope·ordᵢ) — the estimator a single outlier day
    * cannot drag (breakdown point 29%), where an OLS fit follows any
    * spike. The trend complement of [[dailyAnomalies]]: one flags
    * days, this summarizes the drift per key.
    *
    * Determinism: every slope divides exact integers (daily counts
    * over day ordinals) — identical doubles on any engine; the median
    * is [[graft.operators.Stats.exactQuantiles]]'s quantile_cont
    * interpolation (midpoint of two exact doubles), rounded 6dp; the
    * intercept residuals multiply an integer ordinal by the
    * 6dp-rounded slope — pinned inputs, pinned expression.
    *
    * Scale shape: the pair explosion is CALENDAR² — the
    * [[densifiedDaily]] frame is day-grain, so ten years of data
    * makes ~6.7M pairs per key (a per-key flatMap-shaped self-join on
    * the key, uniform), while the corpus-scale work stays the one
    * daily aggregate. Returns (keyCol, n_days, slope, intercept). */
  def theilSenDaily(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val (dense, daily) = densifiedDaily(events, keyCol, tsCol)
    val pts = dense.select(col(keyCol),
      datediff(col("day"), lit("1970-01-01").cast("date")).as("__o"),
      col("n")).persist()
    val slopes = pts.as("i")
      .join(pts.as("j"), col(s"i.$keyCol") === col(s"j.$keyCol") &&
        col("i.__o") < col("j.__o"))
      .select(col(s"i.$keyCol"),
        ((col("j.n") - col("i.n")).cast("double") /
          (col("j.__o") - col("i.__o"))).as("__s"))
    val slope = slopes.groupBy(col(keyCol))
      .agg(round(percentile(col("__s"), lit(0.5)), 6).as("slope"))
    // LEFT join: a key whose whole series is one day has no pairs and
    // no slope — it must still come back (n_days = 1, null trend),
    // not silently vanish from a frame callers join onto key lists
    val out = pts.join(slope, Seq(keyCol), "left")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"), first(col("slope")).as("slope"),
        round(percentile(col("n") - col("slope") * col("__o"), lit(0.5)), 6)
          .as("intercept"))
    graft.operators.Checkpoints.materialize(out, daily, pts)
  }

  /** Linear interpolation of gaps in a per-key daily MEASURE series —
    * the imputation step before any smoother/anomaly pass when the
    * metric is an observation (a mean price, a sensor reading), where
    * a silent day is MISSING, not zero. (For event COUNTS the
    * [[densifiedDaily]] zero-fill is the correct semantics — these
    * are deliberately different operators.) Interior gaps fill by the
    * straight line between the flanking observed days; leading and
    * trailing gaps stay NULL (extrapolation is a modeling choice, not
    * an imputation default).
    *
    * Determinism: the daily measure quantizes to exact micro-units
    * once (`round(mean·1e6)` — the mean itself is a pinned division
    * of exact cent sums by exact counts), and each interpolated value
    * is ONE pinned expression over four exact longs
    * (prev + (next−prev)·pos/len), rounded 6dp.
    *
    * Scale shape: one (key, day) aggregate, the calendar-bounded
    * densify, two ignoreNulls carry windows per key (forward and
    * backward) — the same per-key window budget as [[rollingDaily]].
    * Returns (keyCol, day, observed, value). */
  def interpolateDaily(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .where(valueCol.isNotNull && !isnan(valueCol.cast("double")))
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(round(valueCol * 100, 0).cast("long")).as("__cents"),
        count(lit(1)).as("__cnt"))
      .withColumn("__m",
        round(col("__cents") * 10000.0 / col("__cnt"), 0).cast("long"))
      .persist()
    val dense = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"), expr("interval 1 day")))
          .as("day"))
      .join(daily.select(col(keyCol), col("day"), col("__m")),
        Seq(keyCol, "day"), "left")
      .withColumn("__ord",
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col("__ord"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsOrd = when(col("__m").isNotNull, col("__ord"))
    val filled = dense
      .withColumn("__pm", last(col("__m"), ignoreNulls = true).over(wPrev))
      .withColumn("__po", last(obsOrd, ignoreNulls = true).over(wPrev))
      .withColumn("__nm", first(col("__m"), ignoreNulls = true).over(wNext))
      .withColumn("__no", first(obsOrd, ignoreNulls = true).over(wNext))
    val lerp = col("__pm") +
      (col("__nm") - col("__pm")).cast("double") *
        (col("__ord") - col("__po")).cast("double") /
        (col("__no") - col("__po")).cast("double")
    // the lerp re-quantizes to WHOLE micro-units before the one /1e6
    // (no round-at-6dp call anywhere): a half-micro tie (gap length a
    // power of two) is exactly representable in binary, so both
    // engines see the true tie and round it half-away identically —
    // where round(x/1e6, 6) would hand engines a near-tie double to
    // disagree on (the cohortLtv lesson)
    val out = filled.select(col(keyCol), col("day"),
      col("__m").isNotNull.as("observed"),
      (when(col("__m").isNotNull, col("__m"))
        .when(col("__pm").isNotNull && col("__nm").isNotNull,
          round(lerp, 0).cast("long"))
        .cast("double") / 1e6).as("value"))
    graft.operators.Checkpoints.materialize(out, daily)
  }

  /** Cohort LTV curve: customers grouped by first-purchase month,
    * cumulative revenue per customer tracked by months-since-joining
    * — [[cohortRetention]]'s revenue twin (retention says who came
    * back; LTV says what a cohort member is WORTH by age a, the
    * payback-period number acquisition spend is judged against).
    *
    * Determinism: cohort/age are exact integer month indexes
    * (y·12+m), revenue sums exact cents, the cumulative is an
    * integer window sum, and LTV-per-customer FLOORS to whole cents
    * (integer division) before one exact /100 — no rounding function
    * at all, so no decimal-tie for engines to disagree on. Scale
    * shape: one per-customer window min for the
    * cohort tag, one (cohort, age) aggregate, one cohort-sized
    * cumulative window. Returns (cohort_month, age_months,
    * n_customers, revenue, cum_ltv). */
  def cohortLtv(orders: DataFrame, custCol: String, dateCol: String,
      revenueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = orders.select(col(custCol).as("__cust"),
        col(dateCol).as("__d"),
        round(revenueCol * 100, 0).cast("long").as("__cents"))
      .where(col("__d").isNotNull && col("__cents").isNotNull)
      .withColumn("__m", year(col("__d")) * 12 + month(col("__d")))
      .withColumn("__cm",
        min(col("__m")).over(Window.partitionBy(col("__cust"))))
    val perAge = rows.groupBy(col("__cm"), (col("__m") - col("__cm"))
        .cast("long").as("age_months"))
      .agg(countDistinct(col("__cust")).as("__active"),
        sum(col("__cents")).as("__cents"))
    val sizes = rows.groupBy(col("__cm"))
      .agg(countDistinct(col("__cust")).as("n_customers"))
    val wCum = Window.partitionBy(col("__cm")).orderBy(col("age_months"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perAge.join(sizes, Seq("__cm"))
      .withColumn("__cum", sum(col("__cents")).over(wCum))
      .select(
        make_date(expr("(__cm - 1) div 12"),
          expr("__cm - ((__cm - 1) div 12) * 12"), lit(1))
          .as("cohort_month"),
        col("age_months"), col("n_customers"),
        col("__active").as("n_active"),
        round(col("__cents") / lit(100.0), 2).as("revenue"),
        // LTV floors to WHOLE CENTS per member before the one exact
        // /100 — a rounded rational here can land on a decimal tie
        // where engines' double-rounding disagrees. TRUE floor via the
        // pmod spelling (the holtDaily rule): a refund-heavy cohort's
        // cumulative goes negative, where truncating div rounds wrong
        (expr("(__cum - pmod(__cum, n_customers)) div n_customers")
          .cast("double") / 100.0).as("cum_ltv"))
  }

  /** Ordinary-least-squares daily trend per key — [[theilSenDaily]]'s
    * classical companion (with R², the fit-quality number Theil-Sen
    * doesn't give), in closed form over the densified daily counts:
    *
    *   slope = (T·Σxy − Σx·Σy) / (T·Σx² − (Σx)²)
    *   intercept = (Σy − slope·Σx) / T      (x = 0 at the key's
    *                                         first active day)
    *   R² = (T·Σxy − ΣxΣy)² / ((T·Σx²−(Σx)²)(T·Σy²−(Σy)²))
    *
    * — the [[graft.operators.Stats.zipfFit]] closed-form rule
    * (`regr_slope`'s streaming internals differ across engines; the
    * five sums don't). Determinism: x is the day offset and y the
    * daily COUNT — every product multiplies decimal(38,0) factors
    * and every sum accumulates as decimal(38,0) (exact and
    * order-independent at any scale; a long Σy² wraps at ~3·10⁹
    * daily events) — and slope/intercept/R² are single pinned
    * double expressions, rounded 6dp. slope/intercept are null for a
    * single-day series (zero x-variance), R² additionally null for a
    * constant series (zero y-variance).
    *
    * Scale shape: the [[densifiedDaily]] front, one window min for
    * the per-key day origin, one grouped aggregate. Returns
    * (keyCol, n_days, slope, intercept, r2). */
  def olsDaily(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (dense, daily) = densifiedDaily(events, keyCol, tsCol)
    val w = Window.partitionBy(col(keyCol))
    val pts = dense.withColumn("__x",
      datediff(col("day"), min(col("day")).over(w)).cast("long"))
    // decimal(38,0) factors+sums (the spearman rule): sum(n·n) in
    // long wraps once daily counts pass ~3e9 over a 10-day span —
    // far-fetched for days, not for the claim "exact at any scale"
    val dec = "decimal(38,0)"
    val agg = pts.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_days"),
      sum(col("__x").cast(dec)).as("__sx"),
      sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"),
      sum(col("n").cast(dec)).as("__sy"),
      sum(col("n").cast(dec) * col("n").cast(dec)).as("__syy"),
      sum(col("__x").cast(dec) * col("n").cast(dec)).as("__sxy"))
    val t = col("n_days").cast("double")
    def d(c: String) = col(c).cast("double")
    val cov = t * d("__sxy") - d("__sx") * d("__sy")
    val vx = t * d("__sxx") - d("__sx") * d("__sx")
    val vy = t * d("__syy") - d("__sy") * d("__sy")
    val out = agg.select(col(keyCol), col("n_days"),
      when(vx > 0.0, round(cov / vx, 6)).as("slope"),
      when(vx > 0.0,
        round((d("__sy") - (cov / vx) * d("__sx")) / t, 6)).as("intercept"),
      when(vx > 0.0 && vy > 0.0,
        round(cov * cov / (vx * vy), 6)).as("r2"))
    graft.operators.Checkpoints.materialize(out, daily)
  }

  /** Classical additive day-of-week seasonal decomposition of the
    * per-key daily event count — the "is Saturday really our slow
    * day" readout, and the de-seasonalizing front a weekly-periodic
    * series needs before [[cusumDaily]]/[[dailyAnomalies]] baselines
    * mean anything. Per the textbook recipe: trend = centered 7-day
    * moving average (interior days only — the ±3 window must be
    * complete), detrended = n − trend, seasonal index per weekday =
    * mean of detrended, then centered so the seven indices sum to
    * zero.
    *
    * Determinism: the detrended value is kept on the ×7 integer
    * scale (`7·n − Σ₇n` — exact longs; the /7 never happens until
    * the end), each weekday's mean is one pinned division, and the
    * cross-weekday centering mean — a sum of ≤ 7 doubles, where
    * aggregation order would leak — is folded SEQUENTIALLY over the
    * weekday-sorted array (the [[kaplanMeier]] rule: identical
    * doubles in identical order). The weekday key is arithmetic —
    * `(epochDay + 4) mod 7`, 0 = Sunday — not a locale-dependent
    * day name. Output rounds 6dp.
    *
    * Scale shape: the [[densifiedDaily]] front (the rows-window
    * trend is correct BECAUSE the series is dense — row distance is
    * day distance), one 7-row window pass, one (key, dow) aggregate,
    * one ≤7-element fold per key. Returns (keyCol, dow, n_weeks,
    * seasonal_raw, seasonal). */
  def seasonalDowDecompose(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (dense, daily) = densifiedDaily(events, keyCol, tsCol)
    val pts = dense.withColumn("__ord",
      datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__ord"))
      .rowsBetween(-3, 3)
    val det = pts
      .withColumn("__s7", sum(col("n")).over(w))
      .withColumn("__c7", count(lit(1)).over(w))
      .where(col("__c7") === 7)
      .select(col(keyCol),
        pmod(col("__ord") + 4, lit(7)).cast("long").as("dow"),
        (lit(7L) * col("n") - col("__s7")).as("__det7"))
    val byDow = det.groupBy(col(keyCol), col("dow"))
      .agg(sum(col("__det7")).as("s7"), count(lit(1)).as("n_weeks"))
    val ser = byDow.groupBy(col(keyCol))
      .agg(sort_array(collect_list(
        struct(col("dow"), col("s7"), col("n_weeks")))).as("__a"))
      .withColumn("__m", expr(
        """aggregate(__a, cast(0.0 as double),
             (acc, p) -> acc + p.s7 / (7.0D * p.n_weeks)) / size(__a)"""))
    val raw = col("__p.s7") / (lit(7.0) * col("__p.n_weeks"))
    val out = ser
      .select(col(keyCol), explode(col("__a")).as("__p"), col("__m"))
      .select(col(keyCol), col("__p.dow").as("dow"),
        col("__p.n_weeks").as("n_weeks"),
        round(raw, 6).as("seasonal_raw"),
        round(raw - col("__m"), 6).as("seasonal"))
    graft.operators.Checkpoints.materialize(out, daily)
  }

  /** Two-sided CUSUM changepoint/level-shift detection on the per-key
    * daily event count (Page 1954): against the key's own overall
    * mean μ with slack k, the one-sided sums
    *
    *   hi₀ = max(0, n₀ − μ − k)        lo₀ = max(0, μ − n₀ − k)
    *   hiᵢ = max(0, hiᵢ₋₁ + nᵢ − μ − k)
    *   loᵢ = max(0, loᵢ₋₁ + μ − nᵢ − k)
    *
    * alarm when either exceeds the decision interval h. Where
    * [[dailyAnomalies]] scores each day against a LOCAL trailing
    * window (sharp spikes), CUSUM accumulates small persistent drift
    * from a GLOBAL baseline — the slow regression no single-day
    * z-score ever trips.
    *
    * Determinism: the [[ewmaDaily]] fixed-point discipline end to
    * end — μ is the floor of the key's exact mean in integer
    * micro-units (one `div`, no FP), k and h derive from μ by integer
    * division (k = μ/`kDen`, h = `hMult`·k), and the recurrences are
    * pure bigint add/max. No rounding rule is even needed: max(0, ·)
    * keeps every state exact.
    *
    * Scale shape: identical to [[ewmaDaily]] — the [[densifiedDaily]]
    * front (a silent day drives the LOW side, exactly the outage
    * CUSUM exists to accumulate), one per-key day-sorted array fold.
    * Returns (keyCol, day, n_events, cusum_hi, cusum_lo, alarm) with
    * the sums as micro-unit-exact doubles. */
  def cusumDaily(events: DataFrame, keyCol: String, tsCol: String,
      kDen: Int = 4, hMult: Int = 5): DataFrame = {
    require(kDen >= 1, s"kDen must be >= 1, got $kDen")
    require(hMult >= 1, s"hMult must be >= 1, got $hMult")
    val (dense, daily) = densifiedDaily(events, keyCol, tsCol)
    // per-key baseline in exact micro-units: μ = floor(Σn·1e6 / days);
    // counts are non-negative, so floor div IS truncating div here
    // integer `div` keeps μ and k exact for ANY kDen (a double
    // division is only exact for power-of-two divisors)
    val base = dense.groupBy(col(keyCol))
      .agg(sum(col("n")).as("__sn"), count(lit(1)).as("__nd"))
      .withColumn("__mu", expr("(__sn * 1000000) div __nd"))
      .withColumn("__k", expr(s"__mu div $kDen"))
      .withColumn("__h", col("__k") * hMult)
      .drop("__sn", "__nd")
    val ser = dense.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("__s"))
      .join(base, Seq(keyCol))
    // empty-acc guards stay CASE-shaped: ANSI element_at(-1) on an
    // empty array throws (the ewmaDaily rule)
    val out = ser
      .withColumn("__e", expr(
        """aggregate(__s,
              cast(array() as array<struct<day: date, n: bigint,
                                           hi: bigint, lo: bigint>>),
              (acc, p) -> array_append(acc, named_struct(
                'day', p.day, 'n', p.n,
                'hi', greatest(cast(0 as bigint),
                        (case when size(acc) = 0 then cast(0 as bigint)
                              else element_at(acc, -1).hi end)
                        + p.n * 1000000 - __mu - __k),
                'lo', greatest(cast(0 as bigint),
                        (case when size(acc) = 0 then cast(0 as bigint)
                              else element_at(acc, -1).lo end)
                        + __mu - p.n * 1000000 - __k))))"""))
      .select(col(keyCol), col("__h"), explode(col("__e")).as("__x"))
      .select(col(keyCol), col("__x.day").as("day"),
        col("__x.n").as("n_events"),
        (col("__x.hi").cast("double") / lit(1e6)).as("cusum_hi"),
        (col("__x.lo").cast("double") / lit(1e6)).as("cusum_lo"),
        (col("__x.hi") > col("__h") || col("__x.lo") > col("__h"))
          .as("alarm"))
    graft.operators.Checkpoints.materialize(out, daily)
  }

  /** Rolling z-score anomaly flags on the per-key daily event series —
    * the alerting companion of [[ewmaDaily]]: each day scored against
    * the TRAILING `window` days (current day excluded — a spike must
    * not inflate its own baseline), flagged when |z| > `zThresh`.
    * Runs on the [[densifiedDaily]] series, so a silent day both
    * SCORES (an outage is the textbook anomaly) and drags the
    * baseline like the zero it is.
    *
    * Determinism: the window reduces to INTEGER sums (Σn, Σn², count
    * — exact at any aggregation order), and mean/variance derive from
    * them in one pinned double expression:
    * var = (cnt·Σn² − (Σn)²) / cnt², z = (n − mean)/√var. No
    * accumulation-order FP anywhere — the [[ewmaDaily]] principle,
    * without needing fixed-point because nothing recurses. z is null
    * (and the flag false) until `minPeriods` trailing days exist and
    * variance is positive — scoring against a 1-day or constant
    * baseline is division noise, not signal.
    *
    * Scale shape: one map-side-combined aggregate to the (key, day)
    * grain, the calendar-bounded densify, then ONE key-partitioned
    * RANGE window over the day ordinal (each partition is a key's
    * calendar — thousands of rows, never corpus-scale). Returns
    * (keyCol, day, n_events, mean_trail, z, is_anomaly). */
  def dailyAnomalies(events: DataFrame, keyCol: String, tsCol: String,
      window: Int = 7, zThresh: Double = 2.0, minPeriods: Int = 3): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minPeriods >= 2 && minPeriods <= window,
      s"minPeriods must be in [2, window], got $minPeriods")
    require(zThresh > 0.0, s"zThresh must be positive, got $zThresh")
    import org.apache.spark.sql.expressions.Window
    val (dense, daily) = densifiedDaily(events, keyCol, tsCol)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(datediff(col("day"), lit("1970-01-01").cast("date")))
      .rangeBetween(-window, -1)
    val cnt = count(lit(1)).over(w)
    val s1 = sum(col("n")).over(w)
    val s2 = sum(col("n") * col("n")).over(w)
    val scored = dense
      .withColumn("__cnt", cnt).withColumn("__s1", s1).withColumn("__s2", s2)
      .withColumn("__mean", col("__s1").cast("double") / col("__cnt"))
      .withColumn("__var",
        (col("__s2").cast("double") * col("__cnt") -
          col("__s1").cast("double") * col("__s1")) /
          (col("__cnt").cast("double") * col("__cnt")))
      .withColumn("z",
        when(col("__cnt") >= minPeriods && col("__var") > 0.0,
          round((col("n") - col("__mean")) / sqrt(col("__var")), 4)))
      .select(col(keyCol), col("day"), col("n").as("n_events"),
        when(col("__cnt") >= 1, round(col("__mean"), 4)).as("mean_trail"),
        col("z"),
        coalesce(abs(col("z")) > zThresh, lit(false)).as("is_anomaly"))
    graft.operators.Checkpoints.materialize(scored, daily)
  }

  /** Per-user event transition matrix (first-order Markov view of the
    * user journey): counts and row-normalized probabilities of each
    * consecutive (from → to) event pair, ordered per user by time
    * with an id tiebreak so simultaneous events order
    * deterministically. One user-keyed window pass (uniform keys)
    * plus one pair-keyed aggregate; probabilities derive from the
    * aggregated integer counts, so engines agree bit-for-bit.
    * Returns (from_type, to_type, n, p rounded 6dp). */
  def eventTransitions(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    // pairs feeds both the totals and the output join — persisted so
    // the event-scale lead window runs once (the basketAffinity /
    // cohortRetention discipline)
    val pairs = events
      .select(col(userCol), col(typeCol).as("from_type"), col(tsCol), col(idCol))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .persist()
    val fromTotals = pairs.groupBy("from_type").agg(sum("n").as("__tot"))
    graft.operators.Checkpoints.materialize(
      pairs.join(fromTotals, "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n") / col("__tot").cast("double"), 6).as("p")),
      pairs)
  }

  /** Daily concurrency profile of a set of time INTERVALS (sessions,
    * jobs, rentals — `[start, end)`, end exclusive): per covered day,
    * how many intervals touch it (`n_active`) and the PEAK number
    * open at one instant (`peak`) — capacity planning's two numbers.
    * The classic sweep line, partitioned scale-right: ±1 deltas at
    * interval endpoints, running-summed WITHIN each day on top of
    * that day's carry-in (intervals spanning midnight), so no global
    * single-partition ordering ever exists. Ties at one instant
    * process ends before starts (end-exclusive semantics: back-to-
    * back intervals never overlap); an end falling exactly ON
    * midnight belongs to no day's sweep (the interval doesn't cover
    * that day) and is dropped rather than pushing a covered day's
    * running sum spuriously negative.
    *
    * Exact integers throughout — no FP anywhere. Scale shape: one
    * day-coverage explode (bounded by interval length in days — the
    * theilSen calendar-bound argument), one day-partitioned window
    * over the day's own endpoints, two day-keyed aggregates. Returns
    * (day, n_active, peak). */
  def concurrencyDaily(intervals: DataFrame, startCol: Column,
      endCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = intervals.select(startCol.as("__s"), endCol.as("__e"))
      .where(col("__s").isNotNull && col("__e").isNotNull &&
        col("__e") > col("__s"))
      .persist()
    val cov = iv.select(
        explode(sequence(to_date(col("__s")),
          to_date(col("__e") - expr("interval 1 microsecond")),
          expr("interval 1 day"))).as("day"),
        col("__s"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum(when(to_date(col("__s")) < col("day"), 1L).otherwise(0L))
          .as("__carry"))
    val deltas = iv.select(col("__s").as("__ts"), lit(1L).as("__d"))
      .unionByName(iv.select(col("__e").as("__ts"), lit(-1L).as("__d")))
      .withColumn("day", to_date(col("__ts")))
      // a midnight-exact END closed the previous day; it covers
      // nothing of `day` and must not enter its sweep
      .where(!(col("__d") === -1L &&
        col("__ts") === col("day").cast("timestamp")))
    val w = Window.partitionBy(col("day")).orderBy(col("__ts"), col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peaks = deltas
      .withColumn("__run", sum(col("__d")).over(w))
      .groupBy("day").agg(max(col("__run")).as("__maxr"))
    val out = cov.join(peaks, Seq("day"), "left")
      .select(col("day"), col("n_active"),
        (col("__carry") +
          greatest(coalesce(col("__maxr"), lit(0L)), lit(0L))).as("peak"))
    graft.operators.Checkpoints.materialize(out, iv)
  }

  /** Stationary distribution of a first-order Markov transition
    * matrix ([[eventTransitions]]'s output shape: from, to, p) — the
    * long-run share of attention each state holds if users keep
    * walking the journey graph, the summary number the per-edge
    * matrix can't give ("where does traffic END UP"). `iters`
    * synchronous power iterations π' = πP from the uniform start.
    *
    * Mass accounting is EXPLICIT: a state with no out-edges (or one
    * whose rounded out-probabilities don't sum to exactly 1) leaks
    * its residual each step; the leaked mass is redistributed
    * uniformly (the pageRank dangling treatment), so Σπ stays ~1 and
    * the iteration can't silently decay to zero. Determinism: the
    * [[graft.operators.Graph.pageRank]] rule — π rounds 9dp per
    * iteration, output 6dp.
    *
    * Scale shape: per iteration one src-keyed join + one dst-keyed
    * map-side-combined aggregate + one 1-row broadcast for the leak
    * — the matrix is |states|²-bounded (tiny by contract), the
    * machinery is the same as a corpus-scale host graph's. Returns
    * (state, pi). */
  def stationaryDistribution(trans: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = trans.select(col("from_type").as("__src"),
        col("to_type").as("__dst"), col("p").as("__p"))
      .where(col("__src").isNotNull && col("__dst").isNotNull &&
        col("__p").isNotNull)
      .persist()
    val nodes = e.select(col("__src").as("state"))
      .unionByName(e.select(col("__dst").as("state"))).distinct().persist()
    try {
      val n = nodes.count()
      require(n > 0, "stationaryDistribution needs at least one transition")
      val outMass = e.groupBy(col("__src").as("state"))
        .agg(sum("__p").as("__out"))
      var pi = graft.operators.Checkpoints.stableTracked(
        nodes.withColumn("pi", round(lit(1.0) / n, 9)))
      for (_ <- 1 to iters) {
        val flowed = e.join(
            pi._1.select(col("state").as("__src"), col("pi").as("__pi")),
            Seq("__src"))
          .groupBy(col("__dst").as("state"))
          .agg(sum(col("__pi") * col("__p")).as("__in"))
        // leaked mass = 1-step total minus what flowed: states with
        // no out-edges contribute all their pi, under-summing rows
        // their residual
        val leak = pi._1.join(outMass, Seq("state"), "left")
          .agg((sum(col("pi")) -
            sum(col("pi") * coalesce(col("__out"), lit(0.0)))).as("__leak"))
        val prev = pi
        pi = graft.operators.Checkpoints.stableTracked(
          nodes.join(flowed, Seq("state"), "left")
            .crossJoin(broadcast(leak))
            .select(col("state"), round(
              coalesce(col("__in"), lit(0.0)) + col("__leak") / n,
              9).as("pi")))
        prev._1.unpersist(blocking = false)
        graft.operators.Checkpoints.drop(prev._1, prev._2)
      }
      val out = pi._1.select(col("state"), round(col("pi"), 6).as("pi"))
        .localCheckpoint()
      graft.operators.Checkpoints.drop(pi._1, pi._2)
      out
    } finally { e.unpersist(blocking = false); nodes.unpersist(blocking = false) }
  }

  /** Conversion-delay distribution: per converting user, the delay
    * from the first `fromType` event to the first `toType` event
    * STRICTLY AFTER it — exactly [[funnel]]'s two-step audience (a
    * global-first `toType` would silently drop users who converted
    * again after an earlier unrelated `toType`), so q122's final-step
    * count and this population agree. Delays are exact integer
    * microsecond differences (no float time math): one user-keyed
    * first-`fromType` aggregate, one join of the `toType` events
    * against it, then the percentile reduction DELEGATED to
    * [[graft.operators.Stats.exactQuantiles]] (the repo's one
    * quantile_cont implementation — no second copy of the
    * rounding/labeling convention). Returns one row:
    * (n_converted, p25_us, p50_us, p75_us, p90_us rounded 4dp). */
  def conversionDelay(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, fromType: String, toType: String): DataFrame = {
    val firstFrom = events.where(col(typeCol) === fromType)
      .groupBy(col(userCol)).agg(min(unix_micros(col(tsCol))).as("__from"))
    val delays = events.where(col(typeCol) === toType)
      .select(col(userCol), unix_micros(col(tsCol)).as("__t"))
      .join(firstFrom, Seq(userCol))
      .where(col("__t") > col("__from"))
      .groupBy(col(userCol), col("__from")).agg(min("__t").as("__to"))
      .select((col("__to") - col("__from")).as("__delay"))
    graft.operators.Stats
      .exactQuantiles(delays, Seq(), col("__delay"), Seq(0.25, 0.5, 0.75, 0.9))
      .select(col("n").as("n_converted"), col("p25").as("p25_us"),
        col("p50").as("p50_us"), col("p75").as("p75_us"),
        col("p90").as("p90_us"))
  }

  /** Multi-touch revenue attribution: each conversion event's value is
    * credited to the user's touch events inside a lookback window
    * strictly before the conversion, under the three standard models
    * side by side — first-touch (all credit to the earliest touch),
    * last-touch (all credit to the latest), and linear (value split
    * evenly across the window's touches). Conversions with NO touch in
    * the window land on the explicit `(none)` row, so every model's
    * revenue column sums to total conversion revenue — the
    * conservation law a marketing dashboard reconciles against
    * finance, and the property the spec pins.
    *
    * Determinism: first/last pick by min/max over
    * `struct(touch_ts, touch_id, ...)` — the (ts, id) pair is unique
    * per event, so simultaneous touches tie-break on id exactly like
    * [[eventTransitions]]'s window ordering. Linear shares are
    * value/n with n an exact integer; revenue sums round 2dp (the
    * q36 money convention).
    *
    * Scale shape: one corpus pass filters to the conversion and touch
    * types (codegen'd, pushdown-friendly); the only corpus-scale join
    * keys on the USER (uniform — no hot key unless one user owns the
    * corpus), with the window predicate applied as a post-join filter;
    * per-conversion reduction is one map-side-combined aggregate keyed
    * on the unique conversion id. The three per-type frames are
    * touch-type-cardinality tiny, merged broadcast. Returns
    * (touch_type, n_attributions, first_touch_rev, last_touch_rev,
    * linear_rev). */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, valueCol: String, convType: String,
      touchTypes: Seq[String], lookbackDays: Int = 7): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    require(!touchTypes.contains(convType),
      s"conversion type $convType cannot also be a touch type")
    require(lookbackDays >= 1, s"lookbackDays must be >= 1, got $lookbackDays")
    val lookbackUs = lookbackDays.toLong * 86400L * 1000000L
    // exact integer microsecond time math (the conversionDelay rule);
    // null conversion values count as zero revenue rather than
    // silently dropping the conversion from the audience
    val convs = events.where(col(typeCol) === convType)
      .select(col(userCol).as("__u"), col(idCol).as("__cid"),
        unix_micros(col(tsCol)).as("__cts"),
        coalesce(col(valueCol), lit(0.0)).as("__v"))
    val touches = events.where(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__u"), col(typeCol).as("__tt"),
        unix_micros(col(tsCol)).as("__tts"), col(idCol).as("__tid"))
    // joined feeds the per-conversion reduction AND the linear model —
    // persisted so the corpus-scale user join runs once
    val joined = convs.join(touches, Seq("__u"))
      .where(col("__tts") < col("__cts") &&
        col("__tts") >= col("__cts") - lit(lookbackUs))
      .persist()
    val perConv = joined.groupBy(col("__cid"), col("__v"))
      .agg(count(lit(1)).as("__n"),
        min(struct(col("__tts"), col("__tid"), col("__tt"))).as("__first"),
        max(struct(col("__tts"), col("__tid"), col("__tt"))).as("__last"))
      .persist()
    val firstRev = perConv.groupBy(col("__first.__tt").as("touch_type"))
      .agg(sum("__v").as("__fr"))
    val lastRev = perConv.groupBy(col("__last.__tt").as("touch_type"))
      .agg(sum("__v").as("__lr"))
    val linear = joined
      .join(perConv.select(col("__cid"), col("__n")), Seq("__cid"))
      .groupBy(col("__tt").as("touch_type"))
      .agg(count(lit(1)).as("n_attributions"),
        sum(col("__v") / col("__n")).as("__linr"))
    // the unattributed remainder: conversions whose window held no
    // touch keep full value under every model on the '(none)' row
    val none = convs.join(joined.select("__cid").distinct(),
        Seq("__cid"), "left_anti")
      .agg(count(lit(1)).as("n_attributions"), sum("__v").as("__rev"))
      .where(col("n_attributions") > 0)
      .select(lit("(none)").as("touch_type"), col("n_attributions"),
        col("__rev").as("__fr"), col("__rev").as("__lr"),
        col("__rev").as("__linr"))
    val out = linear
      .join(firstRev, Seq("touch_type"), "full")
      .join(lastRev, Seq("touch_type"), "full")
      .select(col("touch_type"), coalesce(col("n_attributions"), lit(0L))
          .as("n_attributions"), col("__fr"), col("__lr"), col("__linr"))
      .unionByName(none)
      .select(col("touch_type"), col("n_attributions"),
        round(coalesce(col("__fr"), lit(0.0)), 2).as("first_touch_rev"),
        round(coalesce(col("__lr"), lit(0.0)), 2).as("last_touch_rev"),
        round(coalesce(col("__linr"), lit(0.0)), 2).as("linear_rev"))
    graft.operators.Checkpoints.materialize(out, joined, perConv)
  }

  /** Gap-based batch sessionization: a user's time-ordered events
    * split into sessions wherever the gap from the previous event
    * exceeds `gapMinutes` — the canonical web-analytics session
    * definition, as a batch operator (the streaming twin is
    * [[graft.streaming.EventStream]]'s session windows). Returns the
    * per-session grain (user, session_seq, n_events, n_event_types,
    * started_at, duration_us) — the frame downstream session-length /
    * engagement analyses aggregate further.
    *
    * Determinism: ordering ties break on the event id (the
    * [[eventTransitions]] rule); duration is an exact integer
    * microsecond difference; session_seq is the running count of
    * session starts, so it is dense, 1-based, and reproducible.
    *
    * Scale shape: ONE user-keyed window pass over the events (two
    * functions, same window spec — one sort) and one
    * (user, session)-keyed map-side-combined aggregate. User keys are
    * uniform; no corpus-scale join anywhere. */
  def sessionize(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, gapMinutes: Int = 30): DataFrame = {
    require(gapMinutes >= 1, s"gapMinutes must be >= 1, got $gapMinutes")
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val w = Window.partitionBy(col(userCol)).orderBy(col("__ts"), col(idCol))
    events
      .select(col(userCol), col(typeCol).as("__et"),
        unix_micros(col(tsCol)).as("__ts"), col(idCol))
      .withColumn("__new",
        when(col("__ts") - lag(col("__ts"), 1).over(w) > gapUs, 1L)
          .when(lag(col("__ts"), 1).over(w).isNull, 1L).otherwise(0L))
      // (ts, id) is unique per user, so a ROWS running sum over the
      // same ordering is the cumulative session-start count
      .withColumn("session_seq", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("__et")).as("n_event_types"),
        timestamp_micros(min(col("__ts"))).as("started_at"),
        (max(col("__ts")) - min(col("__ts"))).as("duration_us"))
  }

  /** 2-D skyline (Pareto frontier): the distinct (x, y) points not
    * STRICTLY dominated by any other — q dominates p when q.x ≤ p.x,
    * q.y ≥ p.y, and they differ (minimize x, maximize y; the
    * cheapest-vs-biggest product tradeoff, the classic Börzsönyi
    * et al. ICDE 2001 operator). Equal points never dominate each
    * other; duplicates collapse to one output row carrying their
    * count.
    *
    * Execution — sort-based, never the quadratic NOT-EXISTS: on the
    * distinct grain ordered (x asc, y desc), a point is dominated IFF
    * the running max of y over PRECEDING rows reaches its own y
    * (a preceding row has smaller x — or equal x with strictly larger
    * y — so running-max ≥ y is exactly strict dominance; ties of both
    * coords can't precede themselves on the distinct grain).
    *
    * Scale shape: dominance within ANY subset implies global
    * dominance, so the filter runs two-level — a LOCAL pass
    * partitioned by a value-hash bucket (parallel, arbitrary subsets,
    * only ever removes certainly-dominated points), then the same
    * window GLOBAL over the local survivors. The global pass is a
    * single-partition sort, but its input is the union of ≤ nBuckets
    * local frontiers — frontier-sized in practice, and exact
    * regardless of bucketing (determinism does not depend on the
    * partition count). The corpus-scale work is one distinct
    * aggregate + one bucketed window. Returns (x, y, n) — n = rows
    * collapsed into the point. */
  def skyline2d(df: DataFrame, xCol: Column, yCol: Column,
      nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    def frontier(points: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec) =
      points
        .withColumn("__ymax", max(col("y")).over(
          w.orderBy(col("x").asc, col("y").desc)
            .rowsBetween(Window.unboundedPreceding, -1)))
        .where(col("__ymax").isNull || col("__ymax") < col("y"))
        .drop("__ymax")
    val distinctPts = df.select(xCol.as("x"), yCol.as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n"))
    val local = frontier(distinctPts,
      Window.partitionBy(pmod(hash(col("x"), col("y")), lit(nBuckets))))
    frontier(local, Window.partitionBy())
      .orderBy("x", "y")
  }

  /** Revenue concentration: the Lorenz decile view plus the Gini
    * coefficient of per-customer revenue — "what share of revenue do
    * the top customers carry", the concentration-risk question next
    * to [[rfmSegments]]'s behavioral one. Customers sort ascending by
    * revenue into `nBands` equal-count bands (ntile); the Gini is the
    * rank formulation G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over that
    * sorted order.
    *
    * Determinism: per-customer revenue rounds to cents BEFORE any
    * ranking (the [[rfmSegments]] rule), the sort key is
    * (revenue, customer) — total — and every downstream number is
    * pinned arithmetic on those rounded values; FP sums round 6dp
    * (2dp for money).
    *
    * Scale shape: one fact-scale aggregate to the customer grain,
    * then global ranks over the customer-cardinality frame ride
    * [[graft.operators.PrefixSum.withRowNumber]] (range-bucketed,
    * B-way-parallel — no single-partition sort even at a 100×
    * customer population); bands derive from (rank, n) by the exact
    * ntile formula, so no second sort either. Returns one row per
    * band: (band, n_customers, revenue, cum_share, gini — the
    * population statistic repeated per row, the
    * [[graft.operators.Stats.klDrift]] convention). */
  def revenueConcentration(orders: DataFrame, custCol: String,
      amtCol: String, nBands: Int = 10): DataFrame = {
    require(nBands >= 2, s"nBands must be >= 2, got $nBands")
    import org.apache.spark.sql.expressions.Window
    val perCust = orders.groupBy(col(custCol))
      .agg(round(sum(col(amtCol)), 2).as("__rev"))
      .persist()
    val numbered = graft.operators.PrefixSum.withRowNumber(
      perCust, "__rev", Seq(custCol), "__i").persist()
    val nRow = broadcast(numbered.agg(count(lit(1)).as("__n")))
    // ntile(b) replayed as exact integer arithmetic on (i, n): the
    // first n mod b bands hold ceil(n/b) rows, the rest floor(n/b) —
    // identical to Spark's NTile, no sort needed once ranks exist.
    // All-integer (DIV, never `/` — Spark's `/` is double division);
    // the ELSE's divisor q is 0 only when n < bands, where the WHEN
    // branch (split = n) always fires first.
    val b = nBands.toLong
    val band = expr(
      s"""CASE WHEN __i <= (__n % $b) * ((__n DIV $b) + 1)
         |     THEN (__i + (__n DIV $b)) DIV ((__n DIV $b) + 1)
         |     ELSE (__n % $b) +
         |          ((__i - (__n % $b) * ((__n DIV $b) + 1) + (__n DIV $b) - 1)
         |            DIV (__n DIV $b))
         |END""".stripMargin)
    val ranked = numbered.crossJoin(nRow)
      .withColumn("band", band.cast("int"))
      .drop("__n")
      .persist()
    val scalars = ranked.agg(count(lit(1)).as("__n"),
      sum("__rev").as("__tot"), sum(col("__rev") * col("__i")).as("__si"))
    val wCum = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = ranked.groupBy(col("band"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum("__rev"), 2).as("revenue"))
      .crossJoin(broadcast(scalars))
      .withColumn("cum_share",
        round(sum(col("revenue")).over(wCum) / col("__tot"), 6))
      .select(col("band"), col("n_customers"), col("revenue"),
        col("cum_share"),
        round(lit(2.0) * col("__si") / (col("__n") * col("__tot")) -
          (col("__n") + 1) / col("__n").cast("double"), 6).as("gini"))
    graft.operators.Checkpoints.materialize(out, perCust, numbered, ranked)
  }

  /** Default ceiling for the survival family's distinct-duration
    * grain ([[kaplanMeier]]/[[kaplanMeierBy]]/[[logRank]]): 100k ≈
    * 273 years of day-grain durations — generous for every calendar
    * granularity, and orders of magnitude below the corpus-sized
    * grains (second-granularity durations) that would silently
    * collapse the family's sequential fold to one task. */
  val SurvivalMaxGrain: Long = 100000L

  /** Loud bounded-grain contract check for the survival family — the
    * [[graft.operators.Graph.kCore]] `maxRounds` idiom: the
    * operators' sequential survival fold and bare duration-ordered
    * window are single-task over the grain BY DESIGN, so a grain
    * past the ceiling must fail here, not degrade silently. Callers
    * release their persisted grain in a surrounding try/finally (so
    * the error path pins no executor storage even when the guard's
    * own count job fails). */
  private def requireBoundedGrain(observed: Long, maxGrain: Long,
      op: String): Unit = {
    if (observed > maxGrain) {
      throw new IllegalArgumentException(
        s"$op: distinct-duration grain ($observed values) exceeds " +
          s"maxGrain=$maxGrain — this family folds survival terms " +
          "sequentially over the time-sorted grain, which is " +
          "calendar-bounded for day granularities but corpus-sized for " +
          "second-granularity durations. Re-bucket durations to a bounded " +
          "granularity (e.g. days) or raise maxGrain explicitly if the " +
          "single-task fold is acceptable.")
    }
  }

  /** Kaplan-Meier survival estimator (Kaplan & Meier, JASA 1958) over
    * right-censored durations — the time-to-event curve behind "how
    * long until customers reorder / users return / subscriptions
    * churn", where subjects still event-free at the observation
    * horizon are CENSORED, not events (dropping them — or counting
    * them as events — both bias the curve, which is the whole reason
    * this estimator exists):
    *
    *   S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)
    *
    * with dᵢ events at time tᵢ and nᵢ the at-risk count (subjects
    * with duration ≥ tᵢ, censored or not).
    *
    * Determinism: dᵢ, censoring counts, and risk sets are exact
    * integers; each factor 1 − d/n is ONE exact-input IEEE division;
    * the product folds SEQUENTIALLY over the time-sorted grain (the
    * [[ewmaDaily]] array-fold shape) so both an engine and an
    * external replay multiply identical doubles in identical order —
    * no exp(Σln) transcendental detour needed. Censored-only times
    * multiply by exactly 1.0 inside the fold and are then dropped
    * from the output (the standard event-time-step curve).
    *
    * Scale shape: one corpus-scale aggregate to the duration-grain
    * (distinct duration values — calendar-bounded for day
    * granularities), one window for the at-risk cumulative, one
    * single-group array fold over that bounded grain. That bound is
    * the operator's CONTRACT, enforced loud: the sequential survival
    * fold and the bare `__t`-ordered window both collapse to one
    * task if the grain is corpus-sized (second-granularity
    * durations), so `maxGrain` (default [[SurvivalMaxGrain]], ~270
    * years of days) throws rather than letting that happen silently.
    * The guard count doubles as the eager materialization of the
    * persisted grain (the Appendix-D sizing-count idiom), so the
    * downstream subplans read the cache instead of racing to fill
    * it. Returns (t, n_risk, n_events, n_censored, survival rounded
    * 6dp) at event times, ascending. */
  def kaplanMeier(df: DataFrame, durationCol: Column, eventCol: Column,
      maxGrain: Long = SurvivalMaxGrain): DataFrame = {
    require(maxGrain >= 1, s"maxGrain must be >= 1, got $maxGrain")
    import org.apache.spark.sql.expressions.Window
    val grain = df
      .select(durationCol.cast("long").as("__t"),
        eventCol.cast("boolean").as("__e"))
      .where(col("__t").isNotNull && col("__t") >= 0 && col("__e").isNotNull)
      .groupBy("__t")
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("__d"),
        count(lit(1)).as("__l"))
      .persist()
    // try/finally (not just the guard's release path): if the guard's
    // own count() job or any later analysis error fires before
    // Checkpoints.materialize, the cached grain must not stay pinned
    try {
      requireBoundedGrain(grain.count(), maxGrain, "kaplanMeier")
      val total = grain.agg(sum("__l").as("__N"))
      val wPrev = Window.orderBy(col("__t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val withRisk = grain.crossJoin(broadcast(total))
        .withColumn("__nr",
          col("__N") - coalesce(sum(col("__l")).over(wPrev), lit(0L)))
        .select("__t", "__d", "__l", "__nr")
      val ser = withRisk
        .agg(sort_array(collect_list(struct(col("__t"), col("__d"),
          col("__l"), col("__nr")))).as("__s"))
      val out = ser
        .withColumn("__r", expr(
          """aggregate(__s,
                cast(array() as array<struct<t: bigint, d: bigint,
                                             l: bigint, nr: bigint,
                                             s: double>>),
                (acc, p) -> array_append(acc, named_struct(
                  't', p.__t, 'd', p.__d, 'l', p.__l, 'nr', p.__nr,
                  's', (case when size(acc) = 0 then cast(1.0 as double)
                        else element_at(acc, -1).s end)
                       * (1.0d - cast(p.__d as double) / p.__nr))))"""))
        .select(explode(col("__r")).as("__x"))
        .where(col("__x.d") > 0)
        .select(col("__x.t").as("t"), col("__x.nr").as("n_risk"),
          col("__x.d").as("n_events"),
          (col("__x.l") - col("__x.d")).as("n_censored"),
          round(col("__x.s"), 6).as("survival"))
      graft.operators.Checkpoints.materialize(out, grain)
    } finally grain.unpersist(blocking = false)
  }

  /** Per-group Kaplan-Meier — [[kaplanMeier]] partitioned by a
    * cohort/segment column, the "whose retention curve decays
    * faster" comparison (the visual companion to a log-rank test).
    * Identical machinery with every stage group-partitioned: the
    * distinct-duration grain keys on (group, t), risk sets subtract
    * a group-partitioned cumulative, and the survival product folds
    * sequentially PER GROUP over its own duration-sorted array (the
    * group is the parallel unit — no global single-partition window
    * exists here, unlike the ungrouped operator's corpus-wide
    * grain). The bounded-grain contract is therefore PER GROUP:
    * `maxGrain` bounds the largest single group's distinct-duration
    * count (that group's array and fold), enforced loud like
    * [[kaplanMeier]]'s; the guard aggregate doubles as the eager
    * cache materialization. Returns (group, t, n_risk, n_events,
    * n_censored, survival 6dp). */
  def kaplanMeierBy(df: DataFrame, groupCol: Column, durationCol: Column,
      eventCol: Column, maxGrain: Long = SurvivalMaxGrain): DataFrame = {
    require(maxGrain >= 1, s"maxGrain must be >= 1, got $maxGrain")
    import org.apache.spark.sql.expressions.Window
    val grain = df
      .select(groupCol.as("grp"), durationCol.cast("long").as("__t"),
        eventCol.cast("boolean").as("__e"))
      .where(col("grp").isNotNull && col("__t").isNotNull &&
        col("__t") >= 0 && col("__e").isNotNull)
      .groupBy("grp", "__t")
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("__d"),
        count(lit(1)).as("__l"))
      .persist()
    // same error-path discipline as kaplanMeier/logRank: the cached
    // grain is released even when the guard aggregate itself fails
    try {
      val maxGroupGrain = grain.groupBy("grp").agg(count(lit(1)).as("__g"))
        .agg(coalesce(max("__g"), lit(0L))).head().getLong(0)
      requireBoundedGrain(maxGroupGrain, maxGrain, "kaplanMeierBy")
      val totals = grain.groupBy("grp").agg(sum("__l").as("__N"))
      val wPrev = Window.partitionBy(col("grp")).orderBy(col("__t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val withRisk = grain.join(totals, Seq("grp"))
        .withColumn("__nr",
          col("__N") - coalesce(sum(col("__l")).over(wPrev), lit(0L)))
        .select("grp", "__t", "__d", "__l", "__nr")
      val ser = withRisk
        .groupBy("grp")
        .agg(sort_array(collect_list(struct(col("__t"), col("__d"),
          col("__l"), col("__nr")))).as("__s"))
      val out = ser
        .withColumn("__r", expr(
          """aggregate(__s,
                cast(array() as array<struct<t: bigint, d: bigint,
                                             l: bigint, nr: bigint,
                                             s: double>>),
                (acc, p) -> array_append(acc, named_struct(
                  't', p.__t, 'd', p.__d, 'l', p.__l, 'nr', p.__nr,
                  's', (case when size(acc) = 0 then cast(1.0 as double)
                        else element_at(acc, -1).s end)
                       * (1.0d - cast(p.__d as double) / p.__nr))))"""))
        .select(col("grp"), explode(col("__r")).as("__x"))
        .where(col("__x.d") > 0)
        .select(col("grp"), col("__x.t").as("t"), col("__x.nr").as("n_risk"),
          col("__x.d").as("n_events"),
          (col("__x.l") - col("__x.d")).as("n_censored"),
          round(col("__x.s"), 6).as("survival"))
      graft.operators.Checkpoints.materialize(out, grain)
    } finally grain.unpersist(blocking = false)
  }

  /** Two-group log-rank test (Mantel 1966) — "are these two survival
    * curves actually different", the significance readout next to
    * [[kaplanMeierBy]]'s visual one. At each distinct event time:
    * observed events in group A vs the hypergeometric expectation
    * and variance given the risk sets,
    *
    *   E₁ = n₁·d/n,   V = d·(n₁/n)·(1−n₁/n)·(n−d)/(n−1)
    *
    * and χ² = (ΣO₁ − ΣE₁)²/ΣV (1 df; χ² ≥ 3.841 is the 5% decision —
    * the p-value needs the incomplete gamma, a libm the replayability
    * rules exclude, exactly like q144's missing erf).
    *
    * Determinism: risk sets and event counts are exact integers; ΣO₁
    * is an exact long; ΣE₁ and ΣV fold SEQUENTIALLY over the
    * time-sorted term array (the kaplanMeier rule — identical doubles
    * in identical order), each term one pinned expression; outputs
    * round 6dp/4dp. Times with d = 0 or n ≤ 1 contribute nothing (V
    * would divide by zero; a censoring-only time carries no
    * information). Same scale shape — and same enforced
    * bounded-grain contract (`maxGrain`, see [[kaplanMeier]]) — as
    * the estimator: the grain is the distinct event time. Returns
    * one row (n_a, n_b, o_a, e_a, var_a, chi2, z). */
  def logRank(df: DataFrame, inA: Column, durationCol: Column,
      eventCol: Column, maxGrain: Long = SurvivalMaxGrain): DataFrame = {
    require(maxGrain >= 1, s"maxGrain must be >= 1, got $maxGrain")
    import org.apache.spark.sql.expressions.Window
    val rows = df
      .select(inA.cast("boolean").as("__a"),
        durationCol.cast("long").as("__t"),
        eventCol.cast("boolean").as("__e"))
      .where(col("__a").isNotNull && col("__t").isNotNull &&
        col("__t") >= 0 && col("__e").isNotNull)
    val grain = rows.groupBy("__t")
      .agg(sum(when(col("__a") && col("__e"), 1L).otherwise(0L)).as("__d1"),
        sum(when(col("__e"), 1L).otherwise(0L)).as("__d"),
        sum(when(col("__a"), 1L).otherwise(0L)).as("__l1"),
        count(lit(1)).as("__l"))
      .persist()
    try {
      requireBoundedGrain(grain.count(), maxGrain, "logRank")
      val totals = grain.agg(
        coalesce(sum("__l1"), lit(0L)).as("n_a"),
        coalesce(sum(col("__l") - col("__l1")), lit(0L)).as("n_b"))
      val wPrev = Window.orderBy(col("__t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val withRisk = grain.crossJoin(broadcast(totals))
        .withColumn("__n1",
          col("n_a") - coalesce(sum(col("__l1")).over(wPrev), lit(0L)))
        .withColumn("__n",
          col("n_a") + col("n_b") -
            coalesce(sum(col("__l")).over(wPrev), lit(0L)))
        .where(col("__d") > 0 && col("__n") > 1)
      val ser = withRisk
        .groupBy("n_a", "n_b")
        .agg(sum("__d1").as("o_a"),
          sort_array(collect_list(struct(col("__t"), col("__d1"),
            col("__d"), col("__n1"), col("__n")))).as("__s"))
      val folded = ser.withColumn("__f", expr(
        """aggregate(__s,
             named_struct('e', cast(0.0 as double), 'v', cast(0.0 as double)),
             (acc, p) -> named_struct(
               'e', acc.e + cast(p.__n1 as double) * p.__d / p.__n,
               'v', acc.v + p.__d * (cast(p.__n1 as double) / p.__n)
                    * (1.0d - cast(p.__n1 as double) / p.__n)
                    * (case when p.__n > 1
                       then cast(p.__n - p.__d as double) / (p.__n - 1)
                       else cast(0.0 as double) end)))"""))
      val oA = col("o_a").cast("double")
      val out = folded.select(col("n_a"), col("n_b"), col("o_a"),
        round(col("__f.e"), 6).as("e_a"),
        round(col("__f.v"), 6).as("var_a"),
        when(col("__f.v") > 0.0, round(
          (oA - col("__f.e")) * (oA - col("__f.e")) / col("__f.v"), 4))
          .as("chi2"),
        when(col("__f.v") > 0.0, round(
          (oA - col("__f.e")) / sqrt(col("__f.v")), 4)).as("z"))
      graft.operators.Checkpoints.materialize(out, grain)
    } finally grain.unpersist(blocking = false)
  }

  /** Top-k consecutive event-type n-grams across user journeys —
    * [[eventTransitions]]'s higher-order sibling (the transition
    * matrix is exactly n = 2): which length-n PATHS dominate, the
    * question a first-order Markov view provably cannot answer when
    * behavior is non-Markovian (A→B→C frequent while A→B→D never
    * happens, yet both share the A→B edge).
    *
    * One user-keyed window pass builds the n−1 leads (one sort, n−1
    * frame-sharing functions), one path-keyed map-side-combined
    * count, then TakeOrdered for the top-k (count desc, path asc — a
    * total order). Paths render as `a > b > c` strings so the output
    * is n-agnostic. All counts exact integers. */
  def journeyNgrams(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, n: Int = 3, topK: Int = 20): DataFrame = {
    require(n >= 2, s"n must be >= 2 (n = 1 is a plain type count), got $n")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val steps = (0 until n).map {
      case 0 => col(typeCol).as("__s0")
      case i => lead(col(typeCol), i).over(w).as(s"__s$i")
    }
    events.select((Seq(col(userCol), col(tsCol), col(idCol)) ++
        Seq(col(typeCol))): _*)
      .select(steps: _*)
      .where(col(s"__s${n - 1}").isNotNull)
      .select(concat_ws(" > ", (0 until n).map(i => col(s"__s$i")): _*)
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_journeys"))
      .orderBy(col("n_journeys").desc, col("path"))
      .limit(topK)
  }

  /** Market-basket pair affinity: for item pairs co-occurring in at
    * least `minPairs` orders, support / confidence(a→b) / lift —
    * the association statistics behind cross-sell placement.
    *
    * Scale shape: pairs form per ORDER via a self-join of the
    * distinct (order, item) frame on the order key with `item_1 <
    * item_2` — the explosion is bounded by basket size squared,
    * never corpus², and the shuffle keys on the order key (uniform).
    * Item counts and the order total reduce the same distinct frame;
    * both join back broadcast-sized. Metrics derive from exact
    * integer counts with pinned double arithmetic, so engines agree
    * bit-for-bit. */
  def basketAffinity(lineitem: DataFrame, orderCol: String, itemCol: String,
      minPairs: Long = 2): DataFrame = {
    val oi = lineitem.select(col(orderCol).as("__o"), col(itemCol).as("__i"))
      .distinct().persist()
    val nOrders = oi.agg(countDistinct("__o").as("__n_orders"))
    val itemCounts = oi.groupBy(col("__i")).agg(count(lit(1)).as("__ci"))
    val pairs = oi.as("a")
      .join(oi.as("b"), col("a.__o") === col("b.__o") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item_1"), col("b.__i").as("item_2"))
      .agg(count(lit(1)).as("n_pairs"))
      .where(col("n_pairs") >= minPairs)
    graft.operators.Checkpoints.materialize(
      pairs
        .join(itemCounts.select(col("__i").as("item_1"), col("__ci").as("__c1")), "item_1")
        .join(itemCounts.select(col("__i").as("item_2"), col("__ci").as("__c2")), "item_2")
        .crossJoin(broadcast(nOrders))
        .select(col("item_1"), col("item_2"), col("n_pairs"),
          round(col("n_pairs") / col("__n_orders").cast("double"), 6).as("support"),
          round(col("n_pairs") / col("__c1").cast("double"), 6).as("confidence"),
          round(col("n_pairs").cast("double") * col("__n_orders") /
            (col("__c1") * col("__c2")), 6).as("lift")),
      oi)
  }
}
