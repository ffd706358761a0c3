package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation for retrieval and recommendation runs —
  * the offline metrics a search/recsys pipeline tracks per release:
  * nDCG@k (graded, position-discounted), MRR (how high is the first
  * relevant hit), and AP@k (precision integrated over the hit
  * positions). [[Similarity.recallAtK]] answers "did the ANN index
  * find the true neighbors"; this answers the next question — "is the
  * ranking USEFUL against human/behavioral relevance labels", which
  * needs graded judgments and position discounting that recall can't
  * express. rboAtK (also in [[Similarity]]) compares two rankings to
  * each other; these three score one ranking against ground truth.
  */
object Ranking {

  /** DCG position discounts 1/log₂(r+1) for ranks 1..k, computed ONCE
    * driver-side. Both the Spark plan and any external replay join
    * against these literal doubles, so metric equality never hangs on
    * two libms agreeing about log() in the last ulp — the
    * [[Graph.linkPrediction]] RA-over-AA reasoning, solved here by
    * pinning constants instead of avoiding the transcendental
    * (`Double.toString` round-trips exactly, so a SQL literal built
    * from it parses back to the identical double). */
  def dcgDiscounts(k: Int): Seq[(Int, Double)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    (1 to k).map(r => r -> 1.0 / (math.log(r + 1.0) / math.log(2.0)))
  }

  /** Per-query ranking metrics at cutoff `k`.
    *
    * `run`: (query, doc, rank) — rank 1-based; rows past `k` are
    * ignored. `qrels`: (query, doc, grade) — integer grades, 0 = not
    * relevant; docs absent from qrels count as grade 0.
    *
    *  - rr    = 1/rank of the first hit (grade > 0), null if no hit
    *  - ap    = Σ_{hit ranks r ≤ k} (hits ≤ r)/r ÷ min(n_rel, k),
    *            null when n_rel = 0 (binary view: grade > 0 is a hit)
    *  - ndcg  = Σ grade_r·w_r ÷ Σ grade_ideal·w_r over [[dcgDiscounts]]
    *            weights, ideal = the query's qrels sorted grade desc
    *            (doc asc tiebreak); null when the query has no
    *            positive grade
    *
    * Determinism: grades, ranks, and hit counts are exact integers;
    * every per-term double multiplies an integer by a pinned literal;
    * sums of ≤ k terms round 6dp (the pageRank output rule); rr and
    * each P@r are single exact-input divisions.
    *
    * Scale shape: the run is filtered to rank ≤ k FIRST (the only
    * corpus-scale frames are run and qrels); relevance attaches via
    * one (query, doc)-keyed left join; AP's cumulative hit count is
    * one query-partitioned window over ≤ k rows per query; the ideal
    * DCG is one query-partitioned row_number window over qrels
    * truncated at k; discounts join broadcast from a k-row literal
    * frame. Everything reduces in one map-side-combined aggregate per
    * side, merged on the query key. Returns
    * (query, n_rel, rr, ap, ndcg) — one row per query IN THE RUN
    * (a query with qrels but no run rows is a missing-run bug the
    * caller should see as an absent row, not a silent zero). */
  def rankEval(run: DataFrame, qrels: DataFrame, k: Int,
      queryCol: String = "query", docCol: String = "doc",
      rankCol: String = "rank", gradeCol: String = "grade"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = run.sparkSession
    import spark.implicits._
    val disc = broadcast(dcgDiscounts(k).toDF("__r", "__w"))
    val q = col(queryCol)
    // per-query relevant-doc counts and ideal DCG from qrels alone
    val rel = qrels.select(q, col(docCol), col(gradeCol).cast("long").as("__g"))
      .where(col("__g") > 0).persist()
    val nRel = rel.groupBy(q).agg(count(lit(1)).as("n_rel"))
    val wIdeal = Window.partitionBy(q).orderBy(col("__g").desc, col(docCol))
    val idcg = rel.withColumn("__ir", row_number().over(wIdeal))
      .where(col("__ir") <= k)
      .join(disc, col("__ir") === col("__r"))
      .groupBy(q).agg(sum(col("__g") * col("__w")).as("__idcg"))
    // the run truncated at k, graded by the left-joined qrels. Ranks
    // are a 1-BASED contract and violations FAIL (raise_error in the
    // projection, so pruning can't drop the check): a 0-based run —
    // many retrieval libraries' default — would otherwise silently
    // lose its TOP document at the discount join and every metric
    // downstream would be plausible but wrong
    val graded = run.where(col(rankCol) <= k)
      .select(q, col(docCol),
        when(col(rankCol) >= 1, col(rankCol).cast("int"))
          .otherwise(raise_error(
            concat(lit("rankEval expects 1-based ranks, got "),
              col(rankCol).cast("string"))).cast("int"))
          .as("__rk"))
      .join(rel.select(q, col(docCol), col("__g")), Seq(queryCol, docCol),
        "left")
      .withColumn("__g", coalesce(col("__g"), lit(0L)))
    val wCum = Window.partitionBy(q).orderBy(col("__rk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perQuery = graded
      .join(disc, col("__rk") === col("__r"))
      .withColumn("__cumhits",
        sum(when(col("__g") > 0, 1L).otherwise(0L)).over(wCum))
      .groupBy(q)
      .agg(sum(col("__g") * col("__w")).as("__dcg"),
        min(when(col("__g") > 0, col("__rk"))).as("__firstHit"),
        sum(when(col("__g") > 0,
          col("__cumhits") / col("__rk").cast("double"))).as("__apNum"))
    val out = perQuery
      .join(nRel, Seq(queryCol), "left")
      .join(idcg, Seq(queryCol), "left")
      .select(q, coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        round(lit(1.0) / col("__firstHit"), 6).as("rr"),
        when(col("n_rel") > 0,
          round(coalesce(col("__apNum"), lit(0.0)) /
            least(col("n_rel"), lit(k.toLong)).cast("double"), 6)).as("ap"),
        when(col("__idcg") > 0.0, round(col("__dcg") / col("__idcg"), 6))
          .as("ndcg"))
    graft.operators.Checkpoints.materialize(out, rel)
  }
}
