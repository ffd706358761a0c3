package graft.operators

import graft.functions.TextFunctions.{md5Long, posWordShingles, tokens}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch data-quality gates — the checks a pipeline runs on EVERY
  * ingest before letting a batch through (the generalized form of the
  * reference's post-load verification audits).
  */
object Quality {

  /** A declarative row-level expectation: `name` labels the output
    * row, `predicate` must evaluate TRUE for a passing row — NULL
    * (three-valued SQL surprise) counts as a FAILURE, because "the
    * check could not affirm the row" is exactly what a data gate must
    * flag, not silently wave through. */
  final case class Expectation(name: String, predicate: Column)

  /** Expectation-suite audit (the Great-Expectations/dbt-test shape,
    * as one operator): evaluate every row-level expectation in a
    * SINGLE corpus aggregate — one scan however many checks — plus
    * one `count(DISTINCT)` per declared uniqueness key (algebraically
    * not row-local, so it cannot ride the same conditional sum; it
    * still shares the one pass as sibling aggregate expressions).
    * Returns one row per check: (check, n_rows, n_fail, pass_rate
    * 6dp), ordered by check name. The gate decision is the caller's
    * (`n_fail == 0` or a tolerated rate — policy, not mechanism). */
  def expect(df: DataFrame, expectations: Seq[Expectation],
      uniqueKeys: Seq[(String, Seq[Column])] = Nil): DataFrame = {
    require(expectations.nonEmpty || uniqueKeys.nonEmpty,
      "need at least one expectation or uniqueness key")
    val names = expectations.map(_.name) ++ uniqueKeys.map(_._1)
    require(names.distinct.length == names.length,
      s"duplicate check names: ${names.diff(names.distinct).mkString(", ")}")
    // names are spliced into selectExpr as aliases and literals —
    // fail loudly rather than generate unparseable SQL
    require(names.forall(_.matches("[A-Za-z0-9_]+")),
      s"check names must be [A-Za-z0-9_]+: ${names.mkString(", ")}")
    val aggs =
      expectations.map(e =>
        sum(when(e.predicate, 0L).otherwise(1L)).as(s"__f_${e.name}")) ++
        uniqueKeys.map { case (n, cols) =>
          (count(lit(1)) - countDistinct(cols.head, cols.tail: _*))
            .as(s"__f_$n") }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // unpivot the 1-row wide aggregate into (check, counts) rows —
    // stack() keeps it a single codegen'd projection
    val stackArgs = names.map(n => s"'$n', __f_$n").mkString(", ")
    one.selectExpr("__n",
        s"stack(${names.length}, $stackArgs) AS (check, n_fail)")
      .select(col("check"), col("__n").as("n_rows"),
        coalesce(col("n_fail"), lit(0L)).as("n_fail"),
        when(col("__n") > 0, round(
          (col("__n") - coalesce(col("n_fail"), lit(0L))) /
            col("__n").cast("double"), 6)).as("pass_rate"))
      .orderBy("check")
  }

  /** Per-group z-score outlier flags: a value is anomalous when it
    * sits more than `sigma` sample standard deviations from its
    * group's mean. Two aggregates per group computed in ONE grouped
    * pass, joined back onto the rows. The stats side carries NO forced
    * broadcast hint: for the common low-cardinality shape (a handful
    * of groups, millions of rows each) AQE broadcasts it at runtime
    * from its actual size, while a high-cardinality groupCols (e.g.
    * per-user stats) plans a shuffle join instead of silently building
    * an over-limit driver-side broadcast. */
  def zScoreOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      sigma: Double = 3.0): DataFrame = {
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(avg(valueCol).as("__mu"), stddev_samp(valueCol).as("__sd"))
      .select(groupCols.map(c => col(c).as(s"__g_$c")) :+ col("__mu") :+ col("__sd"): _*)
    // null-SAFE group join (a NULL group key is a row, not a discard),
    // and the flag coalesces to false for 1-row groups (stddev NULL)
    // and NULL values — every input row comes back, flagged
    df.join(stats,
        groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _), "left")
      .withColumn("is_outlier", coalesce(
        col("__sd") > 0 && abs(col(valueCol) - col("__mu")) > col("__sd") * sigma,
        lit(false)))
      .drop(groupCols.map(c => s"__g_$c") :+ "__mu" :+ "__sd": _*)
  }

  /** Tukey-fence (IQR) outlier flags per group — the rank-based
    * complement of [[zScoreOutliers]], robust where heavy tails drag
    * the mean/stddev: a value is anomalous when outside
    * [q1 − k·iqr, q3 + k·iqr]. Exact per-group percentiles
    * (continuous interpolation, the q54-proven engine-portable kind)
    * in one grouped pass, joined back with no forced broadcast (AQE
    * decides — same contract as zScoreOutliers). Fences are rounded
    * to 4 decimals so an external replay lands on identical
    * boundaries. NULL values and 1-row groups flag false; NULL group
    * keys are rows, not discards. */
  def iqrOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Double = 1.5): DataFrame = {
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol), lit(0.25)).as("__q1"),
        percentile(col(valueCol), lit(0.75)).as("__q3"))
      .select(groupCols.map(c => col(c).as(s"__g_$c"))
        :+ round(col("__q1") - lit(k) * (col("__q3") - col("__q1")), 4).as("__lo")
        :+ round(col("__q3") + lit(k) * (col("__q3") - col("__q1")), 4).as("__hi"): _*)
    df.join(stats,
        groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _), "left")
      .withColumn("is_outlier", coalesce(
        col(valueCol) < col("__lo") || col(valueCol) > col("__hi"), lit(false)))
      .drop(groupCols.map(c => s"__g_$c") :+ "__lo" :+ "__hi": _*)
  }

  /** Per-group MODIFIED z-score outliers (Iglewicz & Hoaglin 1993):
    * robust z = 0.6745·(v − median)/MAD, flagged beyond `k` (3.5 is
    * the standard cut) — the member of the outlier-flag family
    * ([[zScoreOutliers]], [[iqrOutliers]]) that a few extreme values
    * cannot blind, because BOTH location (median) and scale (median
    * absolute deviation) have 50% breakdown where mean/stddev have
    * none. A group whose MAD is 0 (over half the values identical)
    * yields NULL robust z — the statistic is undefined there, and a
    * gate must decide that case explicitly.
    *
    * Determinism: both medians are exact quantile_cont percentiles;
    * z is one pinned expression rounded 4dp. Two grouped aggregates
    * (the second over |v − med|, which needs the first's result —
    * inherently two passes), each map-side combinable; stats join
    * back AQE-sized as in [[zScoreOutliers]]. */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Double = 3.5): DataFrame = {
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("__med"))
      .select(groupCols.map(c => col(c).as(s"__g_$c")) :+ col("__med"): _*)
    val joinOn = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    // withMed feeds both the MAD aggregate and the final join —
    // persisted so the base scan + median aggregate run once
    val withMed = df.join(med, joinOn, "left")
      .drop(groupCols.map(c => s"__g_$c"): _*)
      .persist()
    // try/finally from the persist on: a throw during plan
    // construction must not pin the cached frame (materialize
    // tolerates the resulting double-unpersist)
    try {
      val mad = withMed.groupBy(groupCols.map(col): _*)
        .agg(percentile(abs(col(valueCol) - col("__med")), lit(0.5)).as("__mad"))
        .select(groupCols.map(c => col(c).as(s"__g_$c")) :+ col("__mad"): _*)
      val out = withMed.join(mad, joinOn, "left")
        .withColumn("robust_z",
          when(col("__mad") > 0, round(
            lit(0.6745) * (col(valueCol) - col("__med")) / col("__mad"), 4)))
        .withColumn("is_outlier",
          coalesce(abs(col("robust_z")) > k, lit(false)))
        .drop(groupCols.map(c => s"__g_$c") :+ "__med" :+ "__mad": _*)
      Checkpoints.materialize(out)
    } finally withMed.unpersist(blocking = false)
  }

  /** Repetition signals per document, in the style of the Gopher
    * quality filters (Rae et al. 2021, "Scaling Language Models",
    * §A1.1 — repetitious text is the strongest cheap low-quality
    * signal in web corpora), at word and 2-gram granularity:
    *
    *  - `top_word_frac` / `top_bigram_frac`: mass fraction of the
    *    single most frequent word / 2-gram (ties don't matter — the
    *    max count is unique even when the argmax isn't);
    *  - `dup_word_frac` / `dup_bigram_frac`: fraction of tokens that
    *    are repeats of an already-seen word / 2-gram
    *    (1 − distinct/total).
    *
    * Execution: one explode per granularity, a (doc, term) count, a
    * per-doc rollup — all map-side-combinable uniform-key shuffles —
    * joined back onto the input's id set, so EVERY input document has
    * an output row. Documents with < 2 words have no 2-grams, and a
    * NULL text has no tokens at all: the missing granularity's
    * columns are NULL (not 0 — "no signal", distinct from "no
    * repetition"; a gate must decide NULL's fate explicitly instead
    * of the doc silently bypassing it). Returns (idCol, n_words,
    * top_word_frac, dup_word_frac, n_bigrams, top_bigram_frac,
    * dup_bigram_frac), fractions rounded to 6. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def gramStats(grams: DataFrame, n: String, top: String, dup: String): DataFrame =
      grams.groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col(idCol))
        .agg(sum("c").as(n), max("c").as("__top"), count(lit(1)).as("__distinct"))
        .select(col(idCol), col(n),
          round(col("__top") / col(n), 6).as(top),
          round(lit(1.0) - col("__distinct") / col(n), 6).as(dup))
    val words = gramStats(
      df.select(col(idCol), explode(tokens(col(textCol))).as("g")),
      "n_words", "top_word_frac", "dup_word_frac")
    val bigrams = gramStats(
      df.select(col(idCol), explode(posWordShingles(col(textCol), 2)).as("g")),
      "n_bigrams", "top_bigram_frac", "dup_bigram_frac")
    df.select(col(idCol)).distinct()
      .join(words, Seq(idCol), "left")
      .join(bigrams, Seq(idCol), "left")
  }

  /** DSIR data-selection weights (Xie et al., NeurIPS'23 —
    * "Data Selection for Language Models via Importance Resampling"):
    * score every document by how much more likely its hashed n-gram
    * features are under a TARGET distribution (e.g. a trusted
    * high-quality slice) than under the RAW pool — the importance
    * log-weight `Σ_f c_f · [ln p̂_target(f) − ln p̂_raw(f)]` that
    * importance-resampling then samples by. Features are word
    * unigrams + bigrams hashed into `buckets` buckets (the paper's
    * hashed n-gram model: a fixed-size multinomial regardless of
    * vocabulary), estimated with add-`alpha` smoothing so a bucket
    * unseen on one side stays finite.
    *
    * `isTarget` marks the target rows inside `docs`; raw = the rest.
    * Returns (idCol, is_target, n_feats, dsir_logw) for every doc —
    * the caller filters/samples (typically: top raw docs by weight).
    *
    * Execution, scale-first: one explode pass per doc builds
    * (id, bucket) counts (map-side combined); the two global bucket
    * distributions REUSE that frame (a `buckets`-row aggregate —
    * never a second corpus scan); totals are a 1-row aggregate
    * broadcast onto the `buckets`-row ratio table, which then
    * broadcast-joins back onto the per-doc counts. The only shuffles
    * are (id, bucket)-keyed — uniform by construction (md5 buckets).
    * Everything is md5-derived, so a SQL oracle replays every weight
    * value-for-value. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024, alpha: Double = 1.0): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    // explode_outer: a null-text doc yields one null-bucket marker
    // row — it contributes nothing to either distribution, but the
    // doc comes back (n_feats = 0, weight 0.0) instead of silently
    // vanishing from the contract's "every doc" output
    val perDoc = docs
      .select(col(idCol), isTarget.cast("boolean").as("is_target"),
        explode_outer(concat(posWordShingles(col(textCol), 1),
          posWordShingles(col(textCol), 2))).as("__g"))
      .select(col(idCol), col("is_target"),
        pmod(md5Long(col("__g")), lit(buckets.toLong)).as("__b"))
      .groupBy(col(idCol), col("is_target"), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val dist = perDoc.where(col("__b").isNotNull).groupBy(col("__b"))
      .agg(sum(when(col("is_target"), col("__c")).otherwise(0L)).as("__t"),
        sum(when(!col("is_target"), col("__c")).otherwise(0L)).as("__r"))
    val totals = dist.agg(sum("__t").as("__tn"), sum("__r").as("__rn"))
    val aB = alpha * buckets
    val ratios = dist.crossJoin(broadcast(totals))
      .select(col("__b"),
        (log((col("__t") + alpha) / (col("__tn") + aB))
          - log((col("__r") + alpha) / (col("__rn") + aB))).as("__lr"))
    perDoc.join(broadcast(ratios), Seq("__b"), "left")
      .groupBy(col(idCol), col("is_target"))
      .agg(sum(when(col("__b").isNotNull, col("__c")).otherwise(0L))
          .cast("long").as("n_feats"),
        coalesce(sum(col("__c") * col("__lr")), lit(0.0)).as("dsir_logw"))
  }

  /** One-pass completeness profile: row count + per-column null
    * counts, computed as a single aggregate over one scan (a
    * null-check per column per row — no shuffle beyond the 1-row
    * combine) and melted to (col_name, n_rows, n_nulls, null_pct) for
    * reporting. Column order follows the schema. */
  def nullProfile(df: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("__n") +:
      df.columns.toSeq.map(c =>
        sum(when(col(c).isNull, 1).otherwise(0)).as(s"__nn_$c"))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(df.columns.map(c =>
          struct(lit(c).as("col_name"), col("__n").as("n_rows"),
            col(s"__nn_$c").as("n_nulls"))): _*)))
      .select("col.*")
      .withColumn("null_pct", round(col("n_nulls") * 100.0 / col("n_rows"), 4))
  }

  /** Per-domain corpus profile — the curation table a crawl pipeline
    * keeps per registered host (crawl budgets, domain blocklists,
    * per-source quality triage): document count, token mass, distinct
    * content fingerprints, and the domain's exact-duplicate rate.
    * One codegen'd map pass (host extraction + token count + content
    * fingerprint) into one map-side-combined aggregate keyed on the
    * domain; `countDistinct` plans Spark's standard two-phase
    * partial-distinct, so a mega-domain (half the crawl from one
    * host) costs a wider partial, never a single hot reducer holding
    * the domain's full row set. The dup ratio derives from the two
    * counts AFTER aggregation — integer arithmetic plus one division,
    * so engines agree bit-for-bit. */
  def domainProfile(docs: DataFrame, url: Column, text: Column): DataFrame = {
    import graft.functions.TextFunctions.{fingerprint, tokenCount, urlHost}
    docs.select(urlHost(url).as("domain"),
        tokenCount(text).cast("long").as("__tok"),
        fingerprint(text).as("__fp"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum("__tok").as("sum_tokens"),
        countDistinct("__fp").as("n_distinct"))
      .withColumn("dup_pct",
        round((col("n_docs") - col("n_distinct")) * lit(100.0) / col("n_docs"), 4))
  }

  /** Suffix-aware domain blocklist resolution — the crawl-curation
    * gate that drops every document whose host IS a blocked domain or
    * sits UNDER one (`a.b.example.com` is blocked by `example.com`).
    * Returns the distinct blocked hosts; callers compose one
    * broadcast-able anti-join (or a flag join) against the corpus.
    *
    * Scale shape: the suffix explosion runs on the DISTINCT-host
    * frame, never the corpus — hosts are vocabulary-sized (a 100 TB
    * crawl has ~1e8 hosts, not 1e11), so the per-host HOF cost is
    * dictionary-priced; the blocklist side is broadcast. The
    * corpus-scale work is whatever join the caller runs against the
    * returned (tiny) blocked-host list. */
  def blockedHosts(hosts: DataFrame, hostCol: String,
      blocklist: DataFrame, domainCol: String): DataFrame = {
    val labels = split(col(hostCol), "\\.")
    // every label-aligned suffix of the host: [a.b.c, b.c, c]
    val sufs = transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels) - i + 1), "."))
    hosts.select(col(hostCol)).distinct()
      .select(col(hostCol), explode(sufs).as("__suf"))
      .join(broadcast(blocklist.select(col(domainCol).as("__suf")).distinct()),
        Seq("__suf"), "left_semi")
      .select(col(hostCol)).distinct()
  }

  /** Gopher-style composite quality-rule filter (Rae et al. 2021,
    * adapted to this corpus's single-space tokenization contract —
    * see [[graft.functions.TextFunctions.tokens]]): per-document
    * pass/fail flags for each rule plus the conjunction, so a
    * pipeline can both FILTER on `keep` and AUDIT which rule
    * rejected what. One codegen'd map pass, zero shuffles; every
    * rule is a built-in-expression arithmetic/regexp predicate the
    * SQL oracle replays verbatim.
    *
    * Rules: word count in [minWords, maxWords]; mean word length in
    * [minMeanWordLen, maxMeanWordLen] (chars excluding separators /
    * words); punctuation ratio ≤ maxPunctRatio; at least
    * minStopwords stopword hits (the Gopher "real prose" signal,
    * sharing [[graft.functions.TextFunctions.langPatterns]]' English
    * function-word list). */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxPunctRatio: Double = 0.2, minStopwords: Int = 2): DataFrame = {
    import graft.functions.TextFunctions.{langPatterns, langScore, punctRatio, tokenCount}
    val t = col(textCol)
    val n = tokenCount(t)
    val meanLen = (length(t) - (n - 1)).cast("double") / n
    // the ACTUAL shared 'en' function-word pattern, not a copy — if
    // langPatterns is ever extended this rule follows langId/langScore
    val stop = langScore(t, langPatterns.toMap.apply("en"))
    docs.select(col(idCol),
        n.as("n_words"),
        round(meanLen, 6).as("mean_word_len"),
        (n >= minWords && n <= maxWords).as("r_word_count"),
        (meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen).as("r_word_len"),
        (punctRatio(t) <= maxPunctRatio).as("r_punct"),
        (stop >= minStopwords).as("r_stopwords"))
      .withColumn("keep",
        col("r_word_count") && col("r_word_len") && col("r_punct") && col("r_stopwords"))
  }
}
