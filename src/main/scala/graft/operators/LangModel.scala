package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring — the CCNet-style filter
  * (Wenzek et al., "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data", LREC 2020): train token
  * probabilities on a corpus, score each document by its mean token
  * log-probability, and gate on the score (gibberish and boilerplate
  * sit far below prose). The reference pipeline has no LM stage; this
  * is part of the training-data extension family.
  *
  * Scale shape: the model is VOCABULARY-sized (orders of magnitude
  * below the corpus), so training is one explode + one token-keyed
  * aggregate; scoring compresses each document to (doc, token, tf)
  * BEFORE the model join — the join input is distinct pairs, not
  * token instances — then reduces per doc. Hot tokens (stopwords) skew
  * the token-keyed exchanges; AQE's skew handling splits them, and a
  * small model broadcasts outright. Nothing touches the driver.
  */
object LangModel {

  /** Nano-unit exact mean, the [[TextClassifier]] idiom: per-term
    * log-probabilities quantize to integer NANO-units
    * (`round(lp·1e9)` as long), tf-weighted terms sum as exact longs,
    * and ONE double division at the end. Long sums are associative-
    * exact, so the score is bit-identical at every partition width —
    * `sum(tf·lp)` over raw doubles is not (the q95 lesson: Spark's
    * partial-aggregation order varies with shuffle/scan width, and a
    * sum landing within an ulp of a 5·10⁻⁷ boundary flips the 6th
    * decimal). The 1e-9 quantization grain sits three orders below
    * the 6dp at which every consumer reads these scores. */
  private def nanoLp(lp: org.apache.spark.sql.Column) =
    round(lp * lit(1e9), 0).cast("long")

  private def nanoMean(tf: org.apache.spark.sql.Column,
      lpn: org.apache.spark.sql.Column) =
    sum(tf * lpn).cast("double") / sum(tf).cast("double") / lit(1e9)

  /** Train: (token, n, log_p) over the corpus, MLE `ln(n/total)`.
    * The count frame feeds two consumers (the total and the output),
    * so it is persisted for the call and released once the result is
    * materialized — the corpus would otherwise tokenize twice. */
  def unigramLm(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .persist()
    val total = counts.agg(sum("n").cast("double").as("__total"))
    val out = counts.crossJoin(broadcast(total))
      .select(col("token"), col("n"),
        log(col("n").cast("double") / col("__total")).as("log_p"))
      .localCheckpoint()
    counts.unpersist(blocking = false)
    out
  }

  /** Bigram formation — [[graft.functions.TextFunctions.posWordShingles]]
    * with n=2: the NATIVE codegen'd shingler, not a `transform` lambda.
    * A HOF here would not only run interpreted itself — being merged
    * by CollapseProject into adjacent aggregates, it would knock the
    * whole corpus-scale stage out of whole-stage codegen (the q88
    * lesson). Documents with fewer than two tokens yield an empty
    * array. */
  private def bigrams(textCol: org.apache.spark.sql.Column) =
    graft.functions.TextFunctions.posWordShingles(textCol, 2)

  /** Train an add-k-smoothed bigram model: for each observed bigram
    * `(w1 w2)`, `log_p = ln((c(w1,w2)+k) / (c(w1·)+k·V))` where
    * `c(w1·)` is the context count (bigrams starting with `w1`) and
    * `V` the unigram vocabulary size. Returns
    * (bigram model (bigram, log_p), context counts (w1, cn), V) —
    * the scorer needs all three to price UNSEEN bigrams: a seen
    * context prices an unseen continuation at `k/(c(w1·)+kV)`, an
    * unseen context degrades to the uniform `1/V`.
    *
    * Scale shape mirrors [[unigramLm]]: the model is bigram-types-
    * sized (≪ corpus); training is one HOF explode + two token-keyed
    * aggregates (the context counts reduce the bigram table, not the
    * corpus). V is a driver-side scalar — one countDistinct row, the
    * same class of tiny action as a centroid collect. */
  def bigramLm(docs: DataFrame, textCol: String, k: Double = 0.5)
      : (DataFrame, DataFrame, Long) = {
    require(k > 0.0, s"smoothing k must be positive, got $k")
    val bg = docs.select(explode(bigrams(col(textCol))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c2"))
      .persist()
    // try/finally, not materialize-with-intermediates: the vocabulary
    // collect between the two checkpoints must also release bg on its
    // error path
    try {
      val ctx = Checkpoints.materialize(
        bg.groupBy(split(col("bigram"), " ").getItem(0).as("w1"))
          .agg(sum("c2").as("cn")))
      val vocab = docs.select(explode(tokens(col(textCol))).as("token"))
        .agg(countDistinct("token")).head().getLong(0)
      val model = Checkpoints.materialize(
        bg.join(ctx, split(col("bigram"), " ").getItem(0) === col("w1"))
          .select(col("bigram"),
            log((col("c2") + k) / (col("cn") + k * vocab)).as("log_p")))
      (model, ctx, vocab)
    } finally bg.unpersist(blocking = false)
  }

  /** Score documents under a [[bigramLm]]: per-document bigram count
    * and mean bigram log-probability, with the two smoothing fallbacks
    * priced exactly as trained — unseen bigram in a seen context:
    * `ln(k/(c(w1·)+kV))`; unseen context: `ln(1/V)`. The document
    * compresses to (doc, bigram, tf) BEFORE the model joins, so join
    * input is distinct pairs, not positions; both joins are
    * model-sized (broadcastable for real vocabularies). */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, ctx: DataFrame, vocab: Long, k: Double = 0.5): DataFrame = {
    val tf = docs.select(col(idCol), explode(bigrams(col(textCol))).as("bigram"))
      .groupBy(col(idCol), col("bigram")).agg(count(lit(1)).as("tf"))
    val lpn = nanoLp(coalesce(col("log_p"),
      log(lit(k) / (coalesce(col("cn").cast("double"), lit(0.0)) + k * vocab))))
    tf.join(model.select("bigram", "log_p"), Seq("bigram"), "left")
      .join(ctx.select(col("w1"), col("cn")),
        split(col("bigram"), " ").getItem(0) === col("w1"), "left")
      .groupBy(col(idCol))
      .agg(sum("tf").as("n_bigrams"),
        nanoMean(col("tf"), lpn).as("avg_logp"))
  }

  /** Train an interpolated Kneser-Ney bigram model (Kneser & Ney,
    * ICASSP 1995; the Chen & Goodman 1998 interpolated form) — the
    * reference smoothing for n-gram LMs, distinguished from add-k by
    * its CONTINUATION probability: a word's backoff mass comes from
    * how many distinct contexts it follows (type counts), not how
    * often it occurs ("Francisco" is frequent but only ever follows
    * "San" — KN prices it low in new contexts, add-k doesn't):
    *
    *   P(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    *            + (D·N1+(w1·)/c(w1·)) · (N1+(·w2)/T)
    *
    * with N1+(w1·)/N1+(·w2) the distinct continuation/context type
    * counts and T the total distinct bigram types. Returns
    * (bigram stats (bigram, c2, w1, w2), context stats
    * (w1, cn, n1p_fwd), continuation stats (w2, n1p_bwd), T). All
    * three frames are bigram-types-sized (≪ corpus); T is the same
    * tiny driver scalar class as [[bigramLm]]'s V. The context and
    * continuation tables reduce the bigram-type frame, never the
    * corpus. */
  def kneserNeyLm(docs: DataFrame, textCol: String)
      : (DataFrame, DataFrame, DataFrame, Long) = {
    val bg = docs.select(explode(bigrams(col(textCol))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c2"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .persist()
    try {
      // bg has one row per bigram TYPE, so count(*) per side IS the
      // distinct-neighbor type count N1+
      val ctx = Checkpoints.materialize(
        bg.groupBy("w1").agg(sum("c2").as("cn"),
          count(lit(1)).as("n1p_fwd")))
      val cont = Checkpoints.materialize(
        bg.groupBy("w2").agg(count(lit(1)).as("n1p_bwd")))
      val t = bg.count()
      (Checkpoints.materialize(bg.select("bigram", "c2")), ctx, cont, t)
    } finally bg.unpersist(blocking = false)
  }

  /** Score documents under a [[kneserNeyLm]]: per-document bigram
    * count and mean bigram log-probability. Fallback ladder, every
    * rung engine-replayable: unseen bigram in a seen context keeps
    * only the backoff · continuation term; an unseen CONTEXT scores
    * the bare continuation probability; a continuation of zero (w2
    * never seen in training) takes the `pFloor` probability floor
    * (the [[lmScore]] OOV convention — a crawl always has new
    * words). Discount D = 0.75, binary-exact by construction so both
    * engines fold the identical constant. The document compresses to
    * (doc, bigram, tf) before any model join ([[bigramScore]]'s
    * shape); all three stat joins are model-sized. */
  def kneserNeyScore(docs: DataFrame, idCol: String, textCol: String,
      bg: DataFrame, ctx: DataFrame, cont: DataFrame, t: Long,
      discount: Double = 0.75, pFloor: Double = 1e-10): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0,1), got $discount")
    require(t > 0, "kneserNeyScore needs a non-empty model")
    val tf = docs.select(col(idCol), explode(bigrams(col(textCol))).as("bigram"))
      .groupBy(col(idCol), col("bigram")).agg(count(lit(1)).as("tf"))
      .withColumn("__w1", split(col("bigram"), " ").getItem(0))
      .withColumn("__w2", split(col("bigram"), " ").getItem(1))
    val main = when(col("c2").isNotNull, (col("c2") - lit(discount)) / col("cn"))
      .otherwise(lit(0.0))
    val backoff = when(col("cn").isNotNull,
        lit(discount) * col("n1p_fwd") / col("cn"))
      .otherwise(lit(1.0))
    val pcont = coalesce(col("n1p_bwd"), lit(0L)) / lit(t)
    val lpn = nanoLp(log(greatest(main + backoff * pcont, lit(pFloor))))
    tf.join(bg.select("bigram", "c2"), Seq("bigram"), "left")
      .join(ctx.select(col("w1"), col("cn"), col("n1p_fwd")),
        col("__w1") === col("w1"), "left")
      .join(cont.select(col("w2"), col("n1p_bwd")),
        col("__w2") === col("w2"), "left")
      .groupBy(col(idCol))
      .agg(sum("tf").as("n_bigrams"),
        nanoMean(col("tf"), lpn).as("avg_logp"))
  }

  /** Score: per-document token count and mean token log-probability
    * under `lm` (a [[unigramLm]] frame, or any (token, log_p) model —
    * scoring docs the model never saw is the point: train on a clean
    * corpus, score a crawl). Out-of-vocabulary tokens take
    * `oovLogProb` (a floor, not a crash — a new crawl always has new
    * tokens). The mean weights by term frequency, so it equals the
    * mean over token POSITIONS: `sum(tf·log_p) / sum(tf)`. */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      lm: DataFrame, oovLogProb: Double = math.log(1e-10)): DataFrame = {
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val lpn = nanoLp(coalesce(col("log_p"), lit(oovLogProb)))
    tf.join(lm.select("token", "log_p"), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(sum("tf").as("n_tokens"),
        nanoMean(col("tf"), lpn).as("avg_logp"))
  }

  /** CCNet's head/middle/tail split generalized: bucket scored
    * documents into `nBuckets` equal-mass perplexity bands. Bucket 1
    * holds the HIGHEST scores (head = lowest perplexity = cleanest
    * prose — CCNet trains only on it; tail is the gibberish band).
    *
    * Deliberately NOT an `ntile` window — a global ntile sorts the
    * whole corpus in one partition. Instead the band boundaries are
    * one exact-percentile aggregate (a 1-row frame, `quantile_cont`
    * semantics — the q54-proven engine-portable kind, rounded to 6 so
    * an external replay lands on identical cuts) broadcast onto the
    * corpus, and the bucket is a pure codegen'd comparison chain: no
    * corpus shuffle at any scale. A score equal to a cut takes the
    * lower-numbered (better) bucket. Appends `ppl_bucket`. */
  def perplexityBuckets(scored: DataFrame, scoreCol: String,
      nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val ps = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val cuts = scored.agg(percentile(col(scoreCol), typedLit(ps)).as("__qs"))
      .select((0 until ps.size).map(i =>
        round(element_at(col("__qs"), i + 1), 6).as(s"__c$i")): _*)
    // cuts ascend; bucket 1 = above the LAST cut. >= keeps a
    // boundary score in the better band on both engines.
    val bucket = (0 until ps.size).foldLeft(lit(nBuckets)) { (acc, i) =>
      when(col(scoreCol) >= col(s"__c$i"), lit(nBuckets - 1 - i)).otherwise(acc)
    }
    scored.crossJoin(broadcast(cuts))
      .withColumn("ppl_bucket", bucket)
      .drop((0 until ps.size).map(i => s"__c$i"): _*)
  }
}
