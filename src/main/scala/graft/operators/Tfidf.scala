package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction over a document corpus — the standard
  * relevance weighting (smoothed idf: ln((N+1)/(df+1)) + 1, the
  * scikit-learn convention) computed entirely with aggregates:
  *
  *  - tf: one groupBy (doc, term) over the exploded tokens;
  *  - df: one groupBy (term) over the tf frame (already one row per
  *    (doc, term), so df is a plain count — no distinct needed);
  *  - N: a 1-row aggregate cross-joined (broadcast) onto every row;
  *  - top-k per doc via a rank window — WindowGroupLimit keeps the
  *    per-partition top-k, so the shuffle moves O(docs·k) rows.
  *
  * All shuffles key on terms or doc ids (uniform). Ties rank by term
  * ascending so results are deterministic and oracle-replayable.
  */
object Tfidf {

  /** Top-`k` terms per document by TF-IDF. Returns
    * (idCol, rank, term, tfidf rounded to 6dp). The tf frame feeds
    * three consumers (the score join, df, N), so it is persisted for
    * the call and dropped once the result is materialized — without
    * it the corpus tokenizes three times (the static plan shows three
    * independent scan+aggregate chains). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .persist()
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = tf.select(countDistinct(col(idCol)).as("n_docs"))
    val raw = col("tf") * (log((col("n_docs") + 1) / (col("df") + 1)) + 1)
    val out = tf.join(dfc, "term")
      .crossJoin(broadcast(n))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(raw.desc, col("term").asc)))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), round(raw, 6).as("tfidf"))
      .localCheckpoint()
    tf.unpersist(blocking = false)
    out
  }
}
