package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** ROC AUC of a binary classifier's scores, by the rank-sum
    * identity AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) — the probability a
    * random positive outscores a random negative, with ties at half
    * credit (average ranks give the tie correction for free). This is
    * [[graft.operators.Stats.mannWhitneyU]]'s machinery reread as a
    * classifier metric — strengthened to the [[Stats.spearman]] tier:
    * the positive rank sum is carried on the DOUBLED integer scale
    * (2·avgRank = 2·start + c − 1, a long even under ties) with
    * decimal(38,0)-factor products and sums, so there is genuinely
    * no FP accumulation anywhere; the /2 happens once in the final
    * pinned expression. No sorting the corpus, no trapezoid sweep.
    *
    * The cumulative rank start rides [[PrefixSum.withCumulative]]
    * (range-bucketed, B-way-parallel), so the plan holds even when
    * the score is continuous and the distinct-score grain IS the
    * corpus — no single-partition window anywhere.
    *
    * Returns one row (n_pos, n_neg, auc 6dp); auc null when either
    * class is empty (the metric is undefined, not 0.5). */
  def auc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val grain = df
      .select(labelCol.cast("boolean").as("__y"),
        scoreCol.cast("double").as("__s"))
      .where(col("__y").isNotNull && col("__s").isNotNull &&
        !isnan(col("__s")))
      .groupBy("__s")
      .agg(count(lit(1)).as("__c"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__cp"))
    val dec = "decimal(38,0)"
    val ranked = PrefixSum.withCumulative(grain, "__s", Nil, Seq("__c"),
        inclusive = false)
      .withColumn("__start", lit(1L) + col("__cum___c"))
      .withColumn("__rank2",
        lit(2L) * col("__start") + col("__c") - lit(1L))
    val agg = ranked.agg(
      sum("__cp").as("n_pos"),
      sum(col("__c") - col("__cp")).as("n_neg"),
      sum(col("__cp").cast(dec) * col("__rank2").cast(dec)).as("__rp2"))
    val nP = col("n_pos").cast("double")
    val nN = col("n_neg").cast("double")
    agg.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round((col("__rp2").cast("double") / lit(2.0) -
          nP * (nP + 1) / lit(2.0)) / (nP * nN), 6))
        .as("auc"))
  }

  /** Decile gains table for a scored population — the campaign-
    * targeting readout ("mail the top 2 deciles"): rows bucketed into
    * 10 score bands by the EXACT score deciles, decile 1 = highest
    * scores, with per-decile response rate, lift over the base rate,
    * and cumulative capture of all positives.
    *
    * Determinism: the nine cuts come from ONE exact-percentile
    * aggregate (the [[graft.ops.Analytics.rfmSegments]] rule — never
    * a global ntile sort), each rounded 6dp so the band comparison
    * chain is engine-portable; counts are exact and every rate is a
    * pinned division rounded 6dp. Ties at a cut share a band by the
    * comparison chain (bands may be uneven under heavy ties — that is
    * the honest answer, not a silently split tie).
    *
    * Scale shape: one percentile aggregate, one broadcast of 9 cuts,
    * one codegen'd banding pass, one 10-group aggregate, one 10-row
    * window. */
  def gainsTable(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // rows feeds both the cuts aggregate and the banding pass —
    // persisted so the (possibly expensive) scoring plan runs once
    val rows = df
      .select(scoreCol.cast("double").as("__s"),
        labelCol.cast("boolean").as("__y"))
      .where(col("__s").isNotNull && !isnan(col("__s")) &&
        col("__y").isNotNull)
      .persist()
    // try/finally from the persist on: a throw during plan
    // construction must not pin the cached frame (materialize
    // tolerates the resulting double-unpersist)
    try {
      val cuts = rows.agg(
        percentile(col("__s"), typedLit((1 to 9).map(_ / 10.0))).as("__cuts"))
      val banded = rows.crossJoin(broadcast(cuts))
        .select(col("__y"),
          (lit(10L) - (1 to 9).map(i =>
            when(col("__s") > round(element_at(col("__cuts"), i), 6), 1L)
              .otherwise(0L)).reduce(_ + _)).as("decile"))
      val per = banded.groupBy("decile")
        .agg(count(lit(1)).as("n"),
          sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"))
      val tot = per.agg(sum("n").as("__tn"), sum("n_pos").as("__tp"))
      val wCum = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val out = per.crossJoin(broadcast(tot))
        .withColumn("__cumPos", sum(col("n_pos")).over(wCum))
        .select(col("decile"), col("n"), col("n_pos"),
          round(col("n_pos") / col("n").cast("double"), 6).as("rate"),
          when(col("__tp") > 0, round(
            (col("n_pos") / col("n").cast("double")) /
              (col("__tp") / col("__tn").cast("double")), 6)).as("lift"),
          when(col("__tp") > 0,
            round(col("__cumPos") / col("__tp").cast("double"), 6))
            .as("cum_capture"))
      Checkpoints.materialize(out)
    } finally rows.unpersist(blocking = false)
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
