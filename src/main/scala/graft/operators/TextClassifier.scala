package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over the corpus token stream — the
  * fastText-shaped workhorse classifier of training-data curation
  * (language ID at scale, wiki-like quality scoring, domain routing:
  * label a seed slice, train in one pass, score the whole corpus).
  * A linear model over token counts is exactly what a 100 TB filter
  * can afford: training is two token-keyed aggregates, the model is
  * vocabulary-sized, and scoring joins each doc's (token, tf) pairs
  * — never token instances — against a model broadcast.
  *
  * Determinism — the [[Tfidf]] BM25 rule end to end: every log
  * probability is `round(ln(p)·1e9)` in integer NANO-units, so
  * per-doc scores are exact long sums (order-independent, no
  * accumulation FP), and the argmax is a total order on
  * (score, label). Add-α smoothing prices unseen (label, token)
  * pairs exactly as trained — `ln(α/(tot_l + α·V))` — so scoring a
  * token the label never saw is the same arithmetic the training
  * pass would have produced at count 0.
  *
  * Reference scope: the walmart reference has no ML surface; this is
  * part of the training-data-pipeline extension (SURVEY §2.8's
  * text-analysis family). Model layout follows the classic MNB
  * formulation (Manning/Raghavan/Schütze IR ch. 13).
  */
object TextClassifier {

  /** Trained model as two frames:
    * `tokenLp` (label, token, lpn) — nano-unit log P(token|label);
    * `classes` (label, n_docs, tot_tokens, prior_n, default_n) —
    * nano-unit log prior and the unseen-token floor per label. */
  final case class NbModel(tokenLp: DataFrame, classes: DataFrame)

  private def nanoLn(x: Column): Column =
    round(log(x) * lit(1e9), 0).cast("long")

  /** One-pass trainer. `alpha` is the add-α smoothing mass (1.0 =
    * Laplace). Rows with a null label or null text are not training
    * examples. V is the DISTINCT-TOKEN vocabulary across all labels
    * (the standard shared event space — without it, per-label
    * vocabularies would make the smoothed distributions
    * non-comparable). */
  def trainNb(docs: DataFrame, textCol: String, labelCol: String,
      alpha: Double = 1.0): NbModel = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    import graft.functions.TextFunctions.tokens
    val toks = docs
      .where(col(labelCol).isNotNull && col(textCol).isNotNull)
      .select(col(labelCol).as("label"),
        explode(tokens(col(textCol))).as("token"))
    val tokenCounts = toks.groupBy("label", "token")
      .agg(count(lit(1)).as("__c")).persist()
    try {
      // two tiny setup frames (|labels| and 1 row) carried as
      // broadcasts — no driver collect, the pageRank scalar rule
      val classTotals = tokenCounts.groupBy("label")
        .agg(sum("__c").as("tot_tokens"))
      val vocab = tokenCounts.select("token").distinct()
        .agg(count(lit(1)).as("__v"))
      val docCounts = docs
        .where(col(labelCol).isNotNull && col(textCol).isNotNull)
        .groupBy(col(labelCol).as("label"))
        .agg(count(lit(1)).as("n_docs"))
      val nTotal = docCounts.agg(sum("n_docs").as("__n"))
      val classes = docCounts
        .join(classTotals, Seq("label"))
        .crossJoin(broadcast(nTotal)).crossJoin(broadcast(vocab))
        .select(col("label"), col("n_docs"), col("tot_tokens"),
          nanoLn(col("n_docs").cast("double") / col("__n")).as("prior_n"),
          nanoLn(lit(alpha) / (col("tot_tokens") + lit(alpha) * col("__v")))
            .as("default_n"))
      val tokenLp = tokenCounts
        .join(broadcast(classes.select("label", "tot_tokens")), Seq("label"))
        .crossJoin(broadcast(vocab))
        .select(col("label"), col("token"),
          nanoLn((col("__c") + alpha) /
            (col("tot_tokens") + lit(alpha) * col("__v"))).as("lpn"))
      NbModel(Checkpoints.materialize(tokenLp),
        Checkpoints.materialize(classes))
    } finally tokenCounts.unpersist(blocking = false)
  }

  /** Score every doc against every label and keep the argmax (ties
    * broken by the smaller label — a total order, so the prediction
    * is unique). Returns (idCol, pred_label, score_n) with the score
    * in exact nano-units.
    *
    * Scale shape: one aggregate to the (doc, token, tf) grain, a
    * |labels|-way broadcast cross (small by contract — labels are
    * languages/quality tiers, not an open domain), one broadcast-able
    * join against the vocabulary-sized model, one (doc, label)
    * aggregate, one per-doc window. */
  def scoreNb(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel): DataFrame = {
    import graft.functions.TextFunctions.tokens
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("token"))
      .groupBy("__id", "token").agg(count(lit(1)).as("__tf"))
    val perLabel = tf
      .crossJoin(broadcast(model.classes
        .select(col("label"), col("prior_n"), col("default_n"))))
      .join(model.tokenLp, Seq("label", "token"), "left")
      .groupBy("__id", "label")
      .agg(first(col("prior_n")).as("__prior"),
        sum(col("__tf") * coalesce(col("lpn"), col("default_n"))).as("__toks"))
      .select(col("__id"), col("label"),
        (col("__prior") + col("__toks")).as("score_n"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("score_n").desc, col("label"))
    perLabel
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("__id").as(idCol), col("label").as("pred_label"),
        col("score_n"))
  }
}
