package graft

/** Partition-width determinism gate — the q95 lesson, converted from
  * driver-discovered to build-time-caught: Spark's partial-aggregation
  * order varies with scan/shuffle width, so any `round(avg(double),
  * p)`-shaped reducer can flip an output digit between a narrow and a
  * wide run (r7's one red row: band (2, src8) avg_score read
  * −3.401753 at 32-wide vs −3.401754 at the 3/8-wide runs that
  * matched the oracle). Every query here runs under a narrow
  * (3 shuffle partitions, 1 scan split) and a wide (32/32) session
  * and must produce IDENTICAL collected rows — the assertion is
  * [[Scratch.widthDiff]], the same comparator the dev loop uses.
  *
  * The default set is the RISK set, one test per query so a failure
  * localizes: every query whose reduction runs over derived doubles
  * (money/ratio/LM-score averages), the rank-statistic family now on
  * [[graft.operators.PrefixSum]] (whose approx-quantile cuts ARE
  * width-sensitive — exactness must not depend on them), the
  * bootstrap/outlier statistics, and the streaming-windowed average.
  * `SPARK_GRAFT_WIDTH_ALL=1` widens the gate to every declared query
  * (the ~6-minute full sweep; dev/CI-nightly, not the default build).
  */
class WidthDeterminismSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  /** Money/ratio/score averages over doubles, the exact q95 class. */
  private val doubleReducers = Seq(
    "q01_pricing_summary",     // round(avg(l_discount), 6)
    "q14_price_tiers",         // round(avg(p_retailprice), 2)
    "q16_quality_ratios",      // round(avg(flag), 4) ratio trio
    "q35_rule_chains",         // round(avg(days_to_ship), 2)
    "q37_segment_priority",    // round(avg(o_totalprice), 2)
    "q39_kpis",                // KPI money averages
    "q123_rolling_daily")      // windowed avg over daily doubles

  /** LM scores: nano-unit longs end-to-end since r7 — must stay so. */
  private val lmScores = Seq(
    "q80_unigram_lm_score", "q83_bigram_lm", "q95_ppl_buckets",
    "q116_kneser_ney")

  /** Rank statistics on [[graft.operators.PrefixSum]]: the bucketing
    * sketch is width-sensitive by construction, the results must not
    * be; plus the sibling order statistics. */
  private val rankFamily = Seq(
    "q142_revenue_concentration", "q152_mann_whitney", "q154_spearman",
    "q155_ks_test", "q167_classifier_auc", "q169_gains_table",
    "q170_bootstrap_ci", "q174_mad_outliers")

  /** Other width-shaped reducers worth pinning. */
  private val others = Seq(
    "q113_embedding_drift",        // per-dimension double means
    "q189_interval_overlap_join",  // bucket-blocked join, no dedup shuffle
    "q91_stream_quality_windows",  // streaming windowed avg_quality
    "q148_containment_pairs")      // prefix-length ceil over doubles

  private val riskSet = doubleReducers ++ lmScores ++ rankFamily ++ others

  riskSet.foreach { name =>
    test(s"$name is identical at narrow (3/1) and wide (32/32) widths") {
      assert(SparkEntry.queries.contains(name),
        s"$name is not a declared query — update the risk set")
      assert(!Scratch.widthDiff(spark, name, sfDir, verbose = true),
        s"$name output depends on partition width — see diff above")
    }
  }

  if (sys.env.get("SPARK_GRAFT_WIDTH_ALL").contains("1")) {
    SparkEntry.queries.keys.toSeq.sorted.filterNot(riskSet.contains)
      .foreach { name =>
        test(s"[all] $name is width-stable") {
          assert(!Scratch.widthDiff(spark, name, sfDir, verbose = true),
            s"$name output depends on partition width — see diff above")
        }
      }
  }
}
