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
