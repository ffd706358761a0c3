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
    val lp = coalesce(col("log_p"), lit(oovLogProb))
    tf.join(lm.select("token", "log_p"), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(sum("tf").as("n_tokens"),
        (sum(col("tf") * lp) / sum("tf")).as("avg_logp"))
  }
}
