package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's business-question set (BUSINESS_REQUIREMENTS.md:10-46,
  * SURVEY Appendix A) and the scalar-function families its staging layer
  * derives (F3/F4/F8/F13/F14/F17/F18, P2/P7), re-expressed over the
  * driver testdata so the DuckDB oracle can hash-check them. The
  * walmart-pipeline itself exercises the same code paths over the
  * reference CSV in ScalaTest (the oracle only mounts testdata tables).
  */
object BusinessQueries {

  /** q34 — calendar scalars (F2 date_id, F3 M/d/yyyy parse roundtrip,
    * F4 day/month names) under a null-drop filter (P2) and an injected
    * "now" future-date cutoff (P7). n_roundtrip === n proves the
    * M/d/yyyy parse inverts the format exactly. */
  private val q34 = Q("q34_calendar_scalars",
    (s, d) => {
      val od = col("o_orderdate")
      Tables.orders(s, d)
        .filter(od.isNotNull && od <= lit("1997-06-30"))
        .groupBy(date_format(od, "EEEE").as("day_name"),
          date_format(od, "MMMM").as("month_name"))
        .agg(count(lit(1)).as("n"),
          sum(when(to_date(date_format(od, "M/d/yyyy"), "M/d/yyyy") === to_date(od), 1)
            .otherwise(0)).as("n_roundtrip"),
          min(year(od) * 10000 + month(od) * 100 + dayofmonth(od))
            .cast("long").as("min_date_id"))
        .orderBy("day_name", "month_name")
    },
    Some("""SELECT dayname(o_orderdate) AS day_name,
            monthname(o_orderdate) AS month_name,
            count(*) AS n,
            CAST(sum(CASE WHEN strptime(strftime(o_orderdate, '%-m/%-d/%Y'), '%-m/%-d/%Y')::DATE
                       = o_orderdate::DATE THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip,
            CAST(min(year(o_orderdate) * 10000 + month(o_orderdate) * 100
                 + dayofmonth(o_orderdate)) AS BIGINT) AS min_date_id
            FROM orders
            WHERE o_orderdate IS NOT NULL AND o_orderdate <= TIMESTAMP '1997-06-30'
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q35 — the reference's conditional-rule families over testdata:
    * an order-sensitive isin-chain with a deliberately unreachable
    * overlap (F13's `southwest` trap shape — 'small' is claimed by the
    * Core branch before Value can see it), a contains-chain with a
    * catch-all (F14 — TIN falls through to General), shipping-delay
    * derivation (F17 datediff + within-30-days), and the stock-status
    * ladder with its load-bearing branch order (F18 — `< 10` must be
    * tested before `< 25`). */
  private val q35 = Q("q35_rule_chains",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d).select("o_orderkey", "o_orderdate")
      val part = Tables.part(s, d).select("p_partkey", "p_type")
      val t = lower(col("p_type"))
      val firstWord = lower(split(col("p_type"), " ").getItem(0))
      val category = when(firstWord.isin("standard", "small"), "Core")
        .when(firstWord.isin("economy", "promo", "small"), "Value")
        .when(firstWord.isin("medium", "large"), "Bulk")
        .otherwise("Other")
      val metal = when(t.contains("brass"), "Brass")
        .when(t.contains("steel"), "Steel")
        .when(t.contains("copper"), "Copper")
        .when(t.contains("nickel"), "Nickel")
        .otherwise("General")
      val q = col("l_quantity")
      val status = when(q <= 0, "Out of Stock")
        .when(q < 10, "Low Stock")
        .when(q < 25, "Below Minimum")
        .when(q > 45, "Overstocked")
        .otherwise("In Stock")
      val days = datediff(col("l_shipdate"), col("o_orderdate"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(category.as("category"), metal.as("metal"), status.as("stock_status"))
        .agg(count(lit(1)).as("n"),
          sum(when(days <= 30, 1).otherwise(0)).as("n_within_30"),
          round(avg(days), 2).as("avg_days_to_ship"))
        .orderBy("category", "metal", "stock_status")
    },
    Some("""SELECT
              CASE WHEN lower(split_part(p_type, ' ', 1)) IN ('standard', 'small') THEN 'Core'
                   WHEN lower(split_part(p_type, ' ', 1)) IN ('economy', 'promo', 'small') THEN 'Value'
                   WHEN lower(split_part(p_type, ' ', 1)) IN ('medium', 'large') THEN 'Bulk'
                   ELSE 'Other' END AS category,
              CASE WHEN lower(p_type) LIKE '%brass%' THEN 'Brass'
                   WHEN lower(p_type) LIKE '%steel%' THEN 'Steel'
                   WHEN lower(p_type) LIKE '%copper%' THEN 'Copper'
                   WHEN lower(p_type) LIKE '%nickel%' THEN 'Nickel'
                   ELSE 'General' END AS metal,
              CASE WHEN l_quantity <= 0 THEN 'Out of Stock'
                   WHEN l_quantity < 10 THEN 'Low Stock'
                   WHEN l_quantity < 25 THEN 'Below Minimum'
                   WHEN l_quantity > 45 THEN 'Overstocked'
                   ELSE 'In Stock' END AS stock_status,
              count(*) AS n,
              CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_within_30,
              round(avg(datediff('day', o_orderdate, l_shipdate)), 2) AS avg_days_to_ship
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN part ON l_partkey = p_partkey
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** q36 — business Q1+Q2: sales & max price by product category and
    * year (fact ⋈ product-dim ⋈ date attrs; sum/max/count). */
  private val q36 = Q("q36_sales_by_category_year",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d).select("o_orderkey", "o_orderdate")
      val part = Tables.part(s, d).select("p_partkey", "p_type")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(split(col("p_type"), " ").getItem(0).as("category"),
          year(col("o_orderdate")).cast("long").as("yr"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
          round(max("l_extendedprice"), 2).as("max_price"),
          count(lit(1)).as("n"))
        .orderBy("category", "yr")
    },
    Some("""SELECT split_part(p_type, ' ', 1) AS category,
            CAST(year(o_orderdate) AS BIGINT) AS yr,
            round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
            round(max(l_extendedprice), 2) AS max_price,
            count(*) AS n
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN part ON l_partkey = p_partkey
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q37 — business Q3/Q4/Q6/Q7: spend and average order value by
    * customer segment (standardized via F8 initcap(trim)) and order
    * priority. DuckDB 1.0 has no initcap, so the oracle emulates
    * per-word capitalization. */
  private val q37 = Q("q37_segment_priority",
    (s, d) => {
      val seg = initcap(trim(lower(col("c_mktsegment"))))
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(seg.as("segment"), col("o_orderpriority"))
        .agg(round(sum("o_totalprice"), 2).as("total_spend"),
          round(avg("o_totalprice"), 2).as("avg_order_value"),
          count(lit(1)).as("n_orders"))
        .orderBy("segment", "o_orderpriority")
    },
    Some("""SELECT
              array_to_string(list_transform(str_split(trim(lower(c_mktsegment)), ' '),
                w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ') AS segment,
              o_orderpriority,
              round(sum(o_totalprice), 2) AS total_spend,
              round(avg(o_totalprice), 2) AS avg_order_value,
              count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q38 — business Q5+Q8: returned amount by product category and
    * order status (returns fact ⋈ product dim shape). */
  private val q38 = Q("q38_returns_by_category",
    (s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val ord = Tables.orders(s, d).select("o_orderkey", "o_orderstatus")
      val part = Tables.part(s, d).select("p_partkey", "p_type")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(split(col("p_type"), " ").getItem(0).as("category"),
          col("o_orderstatus"))
        .agg(round(sum("l_extendedprice"), 2).as("return_amount"),
          round(sum("l_quantity"), 2).as("qty_returned"),
          count(lit(1)).as("n_returns"))
        .orderBy("category", "o_orderstatus")
    },
    Some("""SELECT split_part(p_type, ' ', 1) AS category, o_orderstatus,
            round(sum(l_extendedprice), 2) AS return_amount,
            round(sum(l_quantity), 2) AS qty_returned,
            count(*) AS n_returns
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN part ON l_partkey = p_partkey
            WHERE l_returnflag = 'R'
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q39 — the four dashboard KPIs (BUSINESS_REQUIREMENTS.md:35-38):
    * one global aggregate row, map-side combined — the shuffle carries
    * exactly one row per partition at any scale. */
  private val q39 = Q("q39_kpis",
    (s, d) => {
      Tables.lineitem(s, d).agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("total_net_revenue"),
        round(sum("l_extendedprice"), 2).as("total_sales"),
        round(avg("l_extendedprice"), 2).as("avg_unit_price"),
        round(sum("l_quantity"), 2).as("total_quantity"))
    },
    Some("""SELECT
            round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_net_revenue,
            round(sum(l_extendedprice), 2) AS total_sales,
            round(avg(l_extendedprice), 2) AS avg_unit_price,
            round(sum(l_quantity), 2) AS total_quantity
            FROM lineitem"""))

  /** q44 — ROLLUP hierarchy totals (beyond-reference OLAP surface:
    * SURVEY §2.4 notes the reference has no grouping sets). Spark
    * plans rollup as one Expand + single aggregation — no extra scans
    * per grouping level. Null grouping levels are labelled so the
    * hash compare is unambiguous. */
  private val q44 = Q("q44_rollup_totals",
    (s, d) => {
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(round(sum("o_totalprice"), 2).as("total"), count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
          col("total"), col("n"))
        .orderBy("status", "priority")
    },
    Some("""SELECT coalesce(o_orderstatus, '<all>') AS status,
            coalesce(o_orderpriority, '<all>') AS priority,
            round(sum(o_totalprice), 2) AS total, count(*) AS n
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
            ORDER BY 1, 2"""))

  /** q45 — set operations (INTERSECT / EXCEPT — SURVEY §2.7 notes the
    * reference only ever unions): customers ordering in both 1995 and
    * 1996, and in 1995 only. Both plan as left-semi/anti joins after
    * de-dup — no sort-based set machinery needed. */
  private val q45 = Q("q45_set_ops",
    (s, d) => {
      val o = Tables.orders(s, d)
      def buyers(yr: Int) = o.where(year(col("o_orderdate")) === yr)
        .select("o_custkey").distinct()
      val both = buyers(1995).intersect(buyers(1996))
        .agg(count(lit(1)).as("n")).select(lit("both_years").as("set_name"), col("n"))
      val only95 = buyers(1995).except(buyers(1996))
        .agg(count(lit(1)).as("n")).select(lit("only_1995").as("set_name"), col("n"))
      both.unionByName(only95).orderBy("set_name")
    },
    Some("""WITH b95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
                 b96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
            SELECT 'both_years' AS set_name,
                   (SELECT count(*) FROM (SELECT * FROM b95 INTERSECT SELECT * FROM b96)) AS n
            UNION ALL
            SELECT 'only_1995',
                   (SELECT count(*) FROM (SELECT * FROM b95 EXCEPT SELECT * FROM b96))
            ORDER BY 1"""))

  /** q46 — analytic windows beyond row_number (SURVEY §2.5 notes the
    * reference never uses lag/lead or running frames): per-customer
    * order timeline with days since the previous order, a running
    * spend total, and the spend delta to the next order. One shuffle
    * on the customer key serves all three window functions (same
    * partition + order spec). */
  private val q46 = Q("q46_order_timeline",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .where(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
            .as("days_since_prev"),
          round(sum("o_totalprice").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_spend"),
          round(lead(col("o_totalprice"), 1).over(w) - col("o_totalprice"), 2)
            .as("next_delta"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
            datediff('day',
              lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
              o_orderdate) AS days_since_prev,
            round(sum(o_totalprice) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
            round(lead(o_totalprice) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
              - o_totalprice, 2) AS next_delta
            FROM orders WHERE o_custkey < 200
            ORDER BY o_custkey, o_orderkey"""))

  /** q57 — CUBE + GROUPING() ids (the full grouping-sets lattice —
    * q44 covers the ROLLUP subset): all four aggregation levels in one
    * Expand + single aggregate, with the grouping bitmask distinguishing
    * genuine NULL keys from subtotal rows — the unambiguous form the
    * coalesce labelling in q44 cannot give when keys can be null. */
  private val q57 = Q("q57_cube_grouping",
    (s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(round(sum("o_totalprice"), 2).as("total"), count(lit(1)).as("n"),
          grouping_id(col("o_orderstatus"), col("o_orderpriority")).as("gid"))
        .select(coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
          col("gid"), col("total"), col("n"))
        .orderBy("gid", "status", "priority")
    },
    Some("""SELECT coalesce(o_orderstatus, '<all>') AS status,
            coalesce(o_orderpriority, '<all>') AS priority,
            CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
            round(sum(o_totalprice), 2) AS total, count(*) AS n
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
            ORDER BY gid, status, priority"""))

  /** q58 — PIVOT (long→wide conditional aggregation): per-user event
    * counts by type as columns. The value list is pinned so the output
    * schema is static — the scale-correct form (an unpinned pivot runs
    * a distinct-scan first and breaks schema stability). */
  private val q58 = Q("q58_pivot_events",
    (s, d) => {
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },
    Some("""SELECT user_id,
            CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
            CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
            CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
            CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
            CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** q70 — the F16 money-measure family computed under DecimalType
    * (the [[graft.etl.RunContext.decimalMeasures]] DDL-fidelity mode,
    * reference Numeric(12,2)/(10,2), etl_ods_tables.py:162-165):
    * amounts and discounts cast to the DDL decimal types, derived
    * discount/net measures rounded in exact decimal arithmetic, then
    * aggregated exactly. Final sums cast to double on BOTH engines for
    * the compare; the values still pin decimal semantics — any float
    * drift in the internal arithmetic would shift the last cents. */
  private val q70 = Q("q70_decimal_measures",
    (s, d) => {
      val amt = col("l_extendedprice").cast("decimal(12,2)")
      val disc = col("l_discount").cast("decimal(10,2)")
      val da = round(amt * disc, 2)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), amt.as("amt"), da.as("da"),
          round(amt - da, 2).as("net"))
        .groupBy("l_returnflag")
        .agg(sum("amt").cast("double").as("gross_revenue"),
          sum("da").cast("double").as("discount_amount"),
          sum("net").cast("double").as("net_revenue"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
              CAST(sum(amt) AS DOUBLE) AS gross_revenue,
              CAST(sum(da) AS DOUBLE) AS discount_amount,
              CAST(sum(net) AS DOUBLE) AS net_revenue,
              count(*) AS n
            FROM (
              SELECT l_returnflag,
                     CAST(l_extendedprice AS DECIMAL(12,2)) AS amt,
                     round(CAST(l_extendedprice AS DECIMAL(12,2))
                           * CAST(l_discount AS DECIMAL(10,2)), 2) AS da,
                     round(CAST(l_extendedprice AS DECIMAL(12,2))
                           - round(CAST(l_extendedprice AS DECIMAL(12,2))
                                   * CAST(l_discount AS DECIMAL(10,2)), 2), 2) AS net
              FROM lineitem)
            GROUP BY 1 ORDER BY 1"""))

  /** q119 — cohort retention matrix
    * ([[graft.ops.Analytics.cohortRetention]]): customers by
    * first-order month, counted in each month they return — the
    * retention triangle. The oracle replays cohort assignment, the
    * per-month distinct, and every cell count. */
  private val q119 = Q("q119_cohort_retention",
    (s, d) => graft.ops.Analytics.cohortRetention(
        Tables.orders(s, d), "o_custkey", "o_orderdate")
      .orderBy("cohort_month", "month_offset"),
    Some("""WITH fm AS (SELECT o_custkey,
                               date_trunc('month', min(o_orderdate)) AS cohort
                        FROM orders GROUP BY 1),
            act AS (SELECT DISTINCT o_custkey,
                           date_trunc('month', o_orderdate) AS m FROM orders)
            SELECT CAST(year(cohort) * 100 + month(cohort) AS BIGINT)
                     AS cohort_month,
                   CAST(datediff('month', cohort, m) AS INT) AS month_offset,
                   count(DISTINCT act.o_custkey) AS n_customers
            FROM act JOIN fm USING (o_custkey)
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q120 — RFM segmentation ([[graft.ops.Analytics.rfmSegments]]):
    * per-customer recency/frequency/monetary banded 1..5 on exact
    * quintile cuts (quantile_cont semantics, 6dp-rounded; monetary
    * pre-rounded to cents so ulp-order noise can't straddle a cut),
    * reported as segment counts. The oracle recomputes the metrics,
    * all 12 cuts, and the comparison-chain banding. */
  private val q120 = Q("q120_rfm_segments",
    (s, d) => graft.ops.Analytics.rfmSegments(Tables.orders(s, d),
        "o_custkey", "o_orderdate", "o_totalprice", asOf = "1998-12-31")
      .orderBy("r_band", "f_band", "m_band"),
    Some("""WITH pc AS (SELECT o_custkey,
                               datediff('day', CAST(max(o_orderdate) AS DATE),
                                        DATE '1998-12-31') AS recency,
                               count(*) AS frequency,
                               round(sum(o_totalprice), 2) AS monetary
                        FROM orders GROUP BY 1),
            b AS (SELECT round(quantile_cont(recency, 0.2), 6) AS r0,
                         round(quantile_cont(recency, 0.4), 6) AS r1,
                         round(quantile_cont(recency, 0.6), 6) AS r2,
                         round(quantile_cont(recency, 0.8), 6) AS r3,
                         round(quantile_cont(frequency, 0.2), 6) AS f0,
                         round(quantile_cont(frequency, 0.4), 6) AS f1,
                         round(quantile_cont(frequency, 0.6), 6) AS f2,
                         round(quantile_cont(frequency, 0.8), 6) AS f3,
                         round(quantile_cont(monetary, 0.2), 6) AS m0,
                         round(quantile_cont(monetary, 0.4), 6) AS m1,
                         round(quantile_cont(monetary, 0.6), 6) AS m2,
                         round(quantile_cont(monetary, 0.8), 6) AS m3
                  FROM pc),
            seg AS (SELECT CASE WHEN recency <= r0 THEN 1
                                WHEN recency <= r1 THEN 2
                                WHEN recency <= r2 THEN 3
                                WHEN recency <= r3 THEN 4 ELSE 5 END AS r_band,
                           CASE WHEN frequency <= f0 THEN 1
                                WHEN frequency <= f1 THEN 2
                                WHEN frequency <= f2 THEN 3
                                WHEN frequency <= f3 THEN 4 ELSE 5 END AS f_band,
                           CASE WHEN monetary <= m0 THEN 1
                                WHEN monetary <= m1 THEN 2
                                WHEN monetary <= m2 THEN 3
                                WHEN monetary <= m3 THEN 4 ELSE 5 END AS m_band,
                           monetary
                    FROM pc, b)
            SELECT r_band, f_band, m_band, count(*) AS n_customers,
                   round(sum(monetary), 2) AS sum_monetary
            FROM seg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** q121 — market-basket pair affinity
    * ([[graft.ops.Analytics.basketAffinity]]): item pairs
    * co-occurring in ≥2 orders with support/confidence/lift, top-30
    * by lift. Pair formation is per-order (bounded by basket size),
    * metrics derive from exact integer counts; the oracle replays
    * the self-join, the thresholds, and every ratio. */
  private val q121 = Q("q121_basket_lift",
    (s, d) => graft.ops.Analytics.basketAffinity(Tables.lineitem(s, d),
        "l_orderkey", "l_partkey", minPairs = 2)
      .orderBy(col("lift").desc, col("item_1"), col("item_2")).limit(30),
    Some("""WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
                        FROM lineitem),
            no AS (SELECT count(DISTINCT o) AS n_orders FROM oi),
            ic AS (SELECT i, count(*) AS ci FROM oi GROUP BY 1),
            pr AS (SELECT a.i AS item_1, b.i AS item_2, count(*) AS n_pairs
                   FROM oi a JOIN oi b ON a.o = b.o AND a.i < b.i
                   GROUP BY 1, 2 HAVING count(*) >= 2)
            SELECT item_1, item_2, n_pairs,
                   round(n_pairs / CAST(n_orders AS DOUBLE), 6) AS support,
                   round(n_pairs / CAST(c1.ci AS DOUBLE), 6) AS confidence,
                   round(CAST(n_pairs AS DOUBLE) * n_orders / (c1.ci * c2.ci), 6)
                     AS lift
            FROM pr JOIN ic c1 ON pr.item_1 = c1.i
            JOIN ic c2 ON pr.item_2 = c2.i
            CROSS JOIN no
            ORDER BY lift DESC, item_1, item_2 LIMIT 30"""))

  /** q122 — ordered funnel conversion
    * ([[graft.ops.Analytics.funnel]]): view → click → purchase with
    * each step strictly after the user's previous first-reach time —
    * the sequential-audience semantics a per-type distinct count gets
    * wrong. The oracle replays the staged first-reach derivation. */
  private val q122 = Q("q122_funnel",
    (s, d) => graft.ops.Analytics.funnel(Tables.events(s, d),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .orderBy("step"),
    Some("""WITH r1 AS (SELECT user_id, min(ts) AS r FROM events
                        WHERE event_type = 'view' GROUP BY 1),
            r2 AS (SELECT e.user_id, min(e.ts) AS r
                   FROM events e JOIN r1 ON e.user_id = r1.user_id
                   WHERE e.event_type = 'click' AND e.ts > r1.r GROUP BY 1),
            r3 AS (SELECT e.user_id, min(e.ts) AS r
                   FROM events e JOIN r2 ON e.user_id = r2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > r2.r GROUP BY 1),
            c AS (SELECT 1 AS step, 'view' AS event_type,
                         (SELECT count(*) FROM r1) AS n_users
                  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM r2)
                  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM r3))
            SELECT step, event_type, n_users,
                   CASE WHEN (SELECT count(*) FROM r1) = 0 THEN NULL
                        ELSE round(n_users * CAST(100 AS DOUBLE)
                               / (SELECT count(*) FROM r1), 4) END AS pct_of_step1
            FROM c ORDER BY step"""))

  /** q123 — daily activity with trailing average and week-over-week
    * growth ([[graft.ops.Analytics.rollingDaily]]): the monitoring
    * triple, RANGE-framed on the day ordinal so calendar gaps count
    * as absent days. The oracle replays the day grain, both frames,
    * and the null-baseline first week. */
  private val q123 = Q("q123_rolling_daily",
    (s, d) => graft.ops.Analytics.rollingDaily(Tables.events(s, d), "ts")
      .orderBy("day"),
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
                           FROM events GROUP BY 1),
            d2 AS (SELECT day, n_events,
                          datediff('day', DATE '1970-01-01', day) AS ord
                   FROM daily)
            SELECT day, n_events,
                   round(avg(n_events) OVER (ORDER BY ord
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS avg_trailing,
                   round((n_events - first_value(n_events) OVER (ORDER BY ord
                       RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING))
                     * CAST(100 AS DOUBLE)
                     / first_value(n_events) OVER (ORDER BY ord
                       RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING), 4) AS wow_pct
            FROM d2 ORDER BY day"""))

  /** q124 — event transition matrix
    * ([[graft.ops.Analytics.eventTransitions]]): per-user consecutive
    * (from → to) event pairs with row-normalized probabilities, time
    * order tie-broken by event id. The oracle replays the lead
    * window, the pair counts, and every probability. */
  private val q124 = Q("q124_event_transitions",
    (s, d) => graft.ops.Analytics.eventTransitions(Tables.events(s, d),
        "user_id", "event_type", "ts", "event_id")
      .orderBy("from_type", "to_type"),
    Some("""WITH seq AS (SELECT user_id, event_type AS from_type,
                                lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type
                         FROM events),
            pc AS (SELECT from_type, to_type, count(*) AS n
                   FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
            t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
                  FROM pc GROUP BY 1)
            SELECT pc.from_type, pc.to_type, pc.n,
                   round(pc.n / CAST(t.tot AS DOUBLE), 6) AS p
            FROM pc JOIN t USING (from_type) ORDER BY 1, 2"""))

  /** q125 — conversion-delay percentiles
    * ([[graft.ops.Analytics.conversionDelay]]): time from first view
    * to the first purchase STRICTLY AFTER it per converting user
    * (the q122 funnel audience), as exact integer microsecond delays
    * reduced to quantile_cont percentiles. The oracle replays the
    * staged first-reach mins and all four cuts. */
  private val q125 = Q("q125_conversion_delay",
    (s, d) => graft.ops.Analytics.conversionDelay(Tables.events(s, d),
      "user_id", "event_type", "ts", "view", "purchase"),
    Some("""WITH ff AS (SELECT user_id, min(epoch_us(ts)) AS f
                        FROM events WHERE event_type = 'view' GROUP BY 1),
            d AS (SELECT min(epoch_us(e.ts)) - f AS delay
                  FROM events e JOIN ff USING (user_id)
                  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > f
                  GROUP BY e.user_id, f)
            SELECT count(*) AS n_converted,
                   round(quantile_cont(delay, 0.25), 4) AS p25_us,
                   round(quantile_cont(delay, 0.5), 4) AS p50_us,
                   round(quantile_cont(delay, 0.75), 4) AS p75_us,
                   round(quantile_cont(delay, 0.9), 4) AS p90_us
            FROM d"""))

  /** q128 — EWMA-smoothed daily event trend per event type
    * ([[graft.ops.Analytics.ewmaDaily]], α = 3/10). The oracle replays
    * the fixed-point recurrence as a recursive CTE over the
    * row-numbered daily series — every bigint micro-unit step must
    * agree bit-for-bit with Spark's per-key array fold (integer
    * arithmetic: no FP rounding ties by construction). */
  private val q128 = Q("q128_ewma_daily",
    (s, d) => graft.ops.Analytics.ewmaDaily(Tables.events(s, d),
        "event_type", "ts", alphaNum = 3, alphaDen = 10)
      .orderBy("event_type", "day"),
    Some("""WITH RECURSIVE daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
              FROM events GROUP BY 1, 2),
            dense AS (
              SELECT s.event_type, CAST(d AS DATE) AS day
              FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
                    FROM daily GROUP BY 1) s,
                   unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
                     CAST(s.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS t(d)),
            filled AS (
              SELECT dense.event_type, dense.day, coalesce(daily.n, 0) AS n
              FROM dense LEFT JOIN daily USING (event_type, day)),
            num AS (
              SELECT event_type, day, n,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY day) AS rn
              FROM filled),
            rec AS (
              SELECT event_type, day, n, rn, n * 1000000 AS em
              FROM num WHERE rn = 1
              UNION ALL
              SELECT num.event_type, num.day, num.n, num.rn,
                     (2 * (3 * num.n * 1000000 + 7 * rec.em) + 10) // 20 AS em
              FROM rec JOIN num ON num.event_type = rec.event_type
                               AND num.rn = rec.rn + 1)
            SELECT event_type, day, n AS n_events,
                   CAST(em AS DOUBLE) / CAST(1000000 AS DOUBLE) AS ewma
            FROM rec ORDER BY event_type, day"""))

  /** q129 — multi-touch revenue attribution
    * ([[graft.ops.Analytics.attribution]]): purchase value credited to
    * the user's view/click touches in a 7-day lookback under
    * first-touch / last-touch / linear, with the unattributed
    * remainder on the explicit `(none)` row. The oracle replays the
    * window join, both row_number picks (the min/max-struct
    * tie-break), the per-conversion linear split, and the anti-joined
    * remainder. */
  private val q129 = Q("q129_attribution",
    (s, d) => graft.ops.Analytics.attribution(Tables.events(s, d),
        "user_id", "event_type", "ts", "event_id", "value",
        convType = "purchase", touchTypes = Seq("view", "click"),
        lookbackDays = 7)
      .orderBy("touch_type"),
    Some("""WITH c AS (SELECT user_id AS u, event_id AS cid, epoch_us(ts) AS cts,
                              coalesce(value, 0) AS v
                       FROM events WHERE event_type = 'purchase'),
            t AS (SELECT user_id AS u, event_type AS tt, epoch_us(ts) AS tts,
                         event_id AS tid
                  FROM events WHERE event_type IN ('view', 'click')),
            j AS (SELECT cid, v, tt, tts, tid FROM c JOIN t USING (u)
                  WHERE tts < cts AND tts >= cts - 604800000000),
            r AS (SELECT *,
                         row_number() OVER (PARTITION BY cid
                           ORDER BY tts, tid) AS rf,
                         row_number() OVER (PARTITION BY cid
                           ORDER BY tts DESC, tid DESC) AS rl,
                         count(*) OVER (PARTITION BY cid) AS n
                  FROM j),
            fr AS (SELECT tt, sum(v) AS fr FROM r WHERE rf = 1 GROUP BY 1),
            lr AS (SELECT tt, sum(v) AS lr FROM r WHERE rl = 1 GROUP BY 1),
            lin AS (SELECT tt, count(*) AS na, sum(v / n) AS linr
                    FROM r GROUP BY 1),
            un AS (SELECT count(*) AS na, sum(v) AS rev FROM c
                   WHERE cid NOT IN (SELECT cid FROM j))
            SELECT tt AS touch_type, na AS n_attributions,
                   round(coalesce(fr, 0), 2) AS first_touch_rev,
                   round(coalesce(lr, 0), 2) AS last_touch_rev,
                   round(coalesce(linr, 0), 2) AS linear_rev
            FROM lin LEFT JOIN fr USING (tt) LEFT JOIN lr USING (tt)
            UNION ALL
            SELECT '(none)', na, round(rev, 2), round(rev, 2), round(rev, 2)
            FROM un WHERE na > 0
            ORDER BY touch_type"""))

  /** q130 — gap-based sessionization
    * ([[graft.ops.Analytics.sessionize]], 30-minute gap): the
    * per-session grain with exact integer start/duration
    * microseconds. The oracle replays the lag window, the running
    * session-start sum, and the per-session aggregate. */
  private val q130 = Q("q130_sessionize",
    (s, d) => graft.ops.Analytics.sessionize(Tables.events(s, d),
        "user_id", "event_type", "ts", "event_id", gapMinutes = 30)
      .withColumn("started_us", unix_micros(col("started_at")))
      .drop("started_at")
      .orderBy("user_id", "session_seq"),
    Some("""WITH f AS (SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
                              CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                        > 1800000000
                                   THEN 1 ELSE 0 END AS nw
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id)),
            s AS (SELECT *, sum(nw) OVER (PARTITION BY user_id
                    ORDER BY t, event_id ROWS UNBOUNDED PRECEDING)
                    AS session_seq
                  FROM f)
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   count(*) AS n_events,
                   count(DISTINCT event_type) AS n_event_types,
                   max(t) - min(t) AS duration_us,
                   min(t) AS started_us
            FROM s GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q131 — winsorized robust price statistics
    * ([[graft.operators.Stats.winsorizedStats]], cuts at p05/p95):
    * per return flag, exact 6dp-rounded percentile cuts, exact clip
    * counts, raw vs winsorized mean. The oracle replays the cuts, the
    * clip, and both means with the identical expression shape. */
  private val q131 = Q("q131_winsorized_stats",
    (s, d) => graft.operators.Stats.winsorizedStats(Tables.lineitem(s, d),
        col("l_returnflag"), col("l_extendedprice"))
      .withColumnRenamed("grp", "l_returnflag")
      .orderBy("l_returnflag"),
    Some("""WITH cuts AS (
              SELECT l_returnflag AS grp,
                     round(quantile_cont(l_extendedprice, 0.05), 6) AS lo_cut,
                     round(quantile_cont(l_extendedprice, 0.95), 6) AS hi_cut
              FROM lineitem
              WHERE l_extendedprice IS NOT NULL
                AND NOT isnan(l_extendedprice)
              GROUP BY 1)
            SELECT grp AS l_returnflag, count(*) AS n, lo_cut, hi_cut,
                   CAST(sum(CASE WHEN l_extendedprice < lo_cut
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
                   CAST(sum(CASE WHEN l_extendedprice > hi_cut
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
                   round(sum(l_extendedprice) / count(*), 4) AS mean_raw,
                   round(sum(greatest(least(l_extendedprice, hi_cut), lo_cut))
                     / count(*), 4) AS mean_wins
            FROM lineitem JOIN cuts ON l_returnflag = grp
            WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
            GROUP BY grp, lo_cut, hi_cut ORDER BY grp"""))

  /** q132 — rolling z-score anomaly flags
    * ([[graft.ops.Analytics.dailyAnomalies]], 7-day trailing window,
    * |z| > 2): per event type's densified daily series, integer-sum
    * windows reduced to a pinned double mean/var expression. The
    * oracle replays the densify, the RANGE window sums, and the exact
    * variance formula. */
  private val q132 = Q("q132_daily_anomalies",
    (s, d) => graft.ops.Analytics.dailyAnomalies(Tables.events(s, d),
        "event_type", "ts", window = 7, zThresh = 2.0)
      .orderBy("event_type", "day"),
    Some("""WITH daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
              FROM events GROUP BY 1, 2),
            dense AS (
              SELECT s.event_type, CAST(d AS DATE) AS day
              FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
                    FROM daily GROUP BY 1) s,
                   unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
                     CAST(s.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS t(d)),
            filled AS (
              SELECT dense.event_type, dense.day, coalesce(daily.n, 0) AS n,
                     datediff('day', DATE '1970-01-01', dense.day) AS ord
              FROM dense LEFT JOIN daily USING (event_type, day)),
            win AS (
              SELECT event_type, day, n,
                     count(*) OVER w AS cnt,
                     CAST(sum(n) OVER w AS BIGINT) AS s1,
                     CAST(sum(n * n) OVER w AS BIGINT) AS s2
              FROM filled
              WINDOW w AS (PARTITION BY event_type ORDER BY ord
                           RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)),
            sc AS (
              SELECT event_type, day, n, cnt,
                     CAST(s1 AS DOUBLE) / cnt AS mean,
                     (CAST(s2 AS DOUBLE) * cnt - CAST(s1 AS DOUBLE) * s1)
                       / (CAST(cnt AS DOUBLE) * cnt) AS var
              FROM win),
            z AS (
              SELECT event_type, day, n, cnt, mean,
                     CASE WHEN cnt >= 3 AND var > 0.0
                          THEN round((n - mean) / sqrt(var), 4) END AS z
              FROM sc)
            SELECT event_type, day, n AS n_events,
                   CASE WHEN cnt >= 1 THEN round(mean, 4) END AS mean_trail,
                   z, coalesce(abs(z) > 2.0, false) AS is_anomaly
            FROM z ORDER BY event_type, day"""))

  /** q133 — Holt linear-trend smoothing of the daily event series
    * ([[graft.ops.Analytics.holtDaily]], α = 3/10, β = 2/10): the
    * two-state fixed-point recurrence, replayed by the oracle as a
    * recursive CTE. The level step appears twice in the trend's
    * expression (recursive CTEs have no lateral alias) — both engines
    * evaluate the identical pure-integer formula, with the oracle's
    * floor-of-double division exact under 2^53 micro-units. */
  private val q133 = Q("q133_holt_daily",
    (s, d) => graft.ops.Analytics.holtDaily(Tables.events(s, d),
        "event_type", "ts", alphaNum = 3, alphaDen = 10,
        betaNum = 2, betaDen = 10)
      .orderBy("event_type", "day"),
    Some("""WITH RECURSIVE daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
              FROM events GROUP BY 1, 2),
            dense AS (
              SELECT s.event_type, CAST(d AS DATE) AS day
              FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
                    FROM daily GROUP BY 1) s,
                   unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
                     CAST(s.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS t(d)),
            filled AS (
              SELECT dense.event_type, dense.day, coalesce(daily.n, 0) AS n
              FROM dense LEFT JOIN daily USING (event_type, day)),
            num AS (
              SELECT event_type, day, n,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY day) AS rn
              FROM filled),
            rec AS (
              SELECT event_type, day, n, rn,
                     n * 1000000 AS lm, CAST(0 AS BIGINT) AS bm
              FROM num WHERE rn = 1
              UNION ALL
              SELECT num.event_type, num.day, num.n, num.rn,
                     CAST(floor((2 * (3 * num.n * 1000000
                         + 7 * (rec.lm + rec.bm)) + 10) / 20.0)
                       AS BIGINT) AS lm,
                     CAST(floor((2 * (2 * (CAST(floor((2 * (3 * num.n * 1000000
                           + 7 * (rec.lm + rec.bm)) + 10) / 20.0) AS BIGINT)
                           - rec.lm) + 8 * rec.bm) + 10) / 20.0)
                       AS BIGINT) AS bm
              FROM rec JOIN num ON num.event_type = rec.event_type
                               AND num.rn = rec.rn + 1)
            SELECT event_type, day, n AS n_events,
                   CAST(lm AS DOUBLE) / 1000000.0 AS level,
                   CAST(bm AS DOUBLE) / 1000000.0 AS trend,
                   CAST(lm + bm AS DOUBLE) / 1000000.0 AS forecast_next
            FROM rec ORDER BY event_type, day"""))

  /** q135 — ranking-quality evaluation
    * ([[graft.operators.Ranking.rankEval]], k = 10): a
    * temporal-split recommendation backtest — each customer's top-10
    * parts by pre-1999 quantity scored as a ranked run against their
    * post-1999 purchases as graded qrels (grade 1..4 by quantity
    * band). nDCG discounts are driver-computed literals interpolated
    * into BOTH plans, so no libm log() enters either engine. */
  private val q135 = {
    val discSql = graft.operators.Ranking.dcgDiscounts(10)
      .map { case (r, w) => s"($r, CAST($w AS DOUBLE))" }.mkString(", ")
    Q("q135_rank_eval",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .join(Tables.orders(s, d)
            .select("o_orderkey", "o_custkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("query"), col("l_partkey").as("doc"),
            col("l_quantity").as("__qty"), col("o_orderdate").as("__od"))
        val cutoff = lit("1999-01-01").cast("date")
        val run = li.where(col("__od") < cutoff)
          .groupBy("query", "doc").agg(sum("__qty").as("__s"))
          .withColumn("rank", row_number().over(Window.partitionBy("query")
            .orderBy(col("__s").desc, col("doc"))))
          .where(col("rank") <= 10)
        val qrels = li.where(col("__od") >= cutoff)
          .groupBy("query", "doc")
          .agg((least(floor(sum("__qty") / 25), lit(3L)) + 1).as("grade"))
        graft.operators.Ranking.rankEval(run, qrels, k = 10)
          .orderBy("query")
      },
      Some(s"""WITH li AS (
                SELECT o_custkey AS q, l_partkey AS doc, l_quantity AS qty,
                       o_orderdate AS od
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              disc(r, w) AS (VALUES $discSql),
              run AS (
                SELECT * FROM (
                  SELECT q, doc, row_number() OVER (PARTITION BY q
                    ORDER BY sum(qty) DESC, doc) AS rk
                  FROM li WHERE od < DATE '1999-01-01' GROUP BY q, doc)
                WHERE rk <= 10),
              rel AS (
                SELECT q, doc,
                       least(CAST(floor(sum(qty) / 25) AS BIGINT), 3) + 1 AS g
                FROM li WHERE od >= DATE '1999-01-01' GROUP BY q, doc),
              nrel AS (SELECT q, count(*) AS n_rel FROM rel GROUP BY 1),
              ideal AS (SELECT q, g, row_number() OVER (PARTITION BY q
                          ORDER BY g DESC, doc) AS ir
                        FROM rel),
              idcg AS (SELECT q, sum(g * w) AS idcg
                       FROM ideal JOIN disc ON ir = r
                       WHERE ir <= 10 GROUP BY q),
              graded AS (SELECT run.q, run.rk, coalesce(rel.g, 0) AS g
                         FROM run LEFT JOIN rel
                           ON run.q = rel.q AND run.doc = rel.doc),
              cum AS (SELECT q, rk, g, w,
                             sum(CASE WHEN g > 0 THEN 1 ELSE 0 END)
                               OVER (PARTITION BY q ORDER BY rk
                                     ROWS UNBOUNDED PRECEDING) AS ch
                      FROM graded JOIN disc ON rk = r),
              per AS (SELECT q, sum(g * w) AS dcg,
                             min(CASE WHEN g > 0 THEN rk END) AS fh,
                             sum(CASE WHEN g > 0
                                 THEN ch / CAST(rk AS DOUBLE) END) AS apn
                      FROM cum GROUP BY q)
              SELECT per.q AS query, coalesce(n_rel, 0) AS n_rel,
                     round(CAST(1 AS DOUBLE) / fh, 6) AS rr,
                     CASE WHEN n_rel > 0
                          THEN round(coalesce(apn, 0.0)
                            / CAST(least(n_rel, 10) AS DOUBLE), 6) END AS ap,
                     CASE WHEN idcg > 0.0
                          THEN round(dcg / idcg, 6) END AS ndcg
              FROM per LEFT JOIN nrel ON per.q = nrel.q
                       LEFT JOIN idcg ON per.q = idcg.q
              ORDER BY query"""))
  }

  /** q137 — 2-D skyline ([[graft.ops.Analytics.skyline2d]]): the
    * Pareto frontier of parts minimizing retail price while
    * maximizing size. The oracle is the O(n²) NOT-EXISTS dominance
    * definition — the sort-based two-level window must reproduce it
    * exactly. */
  private val q137 = Q("q137_skyline",
    (s, d) => graft.ops.Analytics.skyline2d(Tables.part(s, d),
      col("p_retailprice"), col("p_size")),
    Some("""WITH d AS (SELECT p_retailprice AS x, p_size AS y, count(*) AS n
                       FROM part GROUP BY 1, 2)
            SELECT x, y, n FROM d p
            WHERE NOT EXISTS (SELECT 1 FROM d q
                              WHERE q.x <= p.x AND q.y >= p.y
                                AND (q.x < p.x OR q.y > p.y))
            ORDER BY x, y"""))

  /** q138 — Theil-Sen robust daily trend
    * ([[graft.ops.Analytics.theilSenDaily]]): median pairwise slope
    * and intercept per event type over the densified daily series.
    * Every slope is an exact-integer division; the oracle replays the
    * day-pair join and both quantile_cont medians. */
  private val q138 = Q("q138_theil_sen_trend",
    (s, d) => graft.ops.Analytics.theilSenDaily(Tables.events(s, d),
        "event_type", "ts")
      .orderBy("event_type"),
    Some("""WITH daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
              FROM events GROUP BY 1, 2),
            dense AS (
              SELECT s.event_type, CAST(d AS DATE) AS day
              FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
                    FROM daily GROUP BY 1) s,
                   unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
                     CAST(s.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS t(d)),
            pts AS (
              SELECT dense.event_type, coalesce(daily.n, 0) AS n,
                     datediff('day', DATE '1970-01-01', dense.day) AS ord
              FROM dense LEFT JOIN daily USING (event_type, day)),
            sl AS (SELECT i.event_type,
                          CAST(j.n - i.n AS DOUBLE) / (j.ord - i.ord) AS s
                   FROM pts i JOIN pts j ON i.event_type = j.event_type
                                        AND i.ord < j.ord),
            m AS (SELECT event_type, round(quantile_cont(s, 0.5), 6) AS slope
                  FROM sl GROUP BY 1)
            SELECT p.event_type, count(*) AS n_days, slope,
                   round(quantile_cont(p.n - m.slope * p.ord, 0.5), 6)
                     AS intercept
            FROM pts p LEFT JOIN m ON p.event_type = m.event_type
            GROUP BY p.event_type, m.slope
            ORDER BY p.event_type"""))

  /** q139 — two-sided CUSUM level-shift detection
    * ([[graft.ops.Analytics.cusumDaily]], k = μ/4, h = 5k): pure
    * bigint micro-unit recurrences against each key's own mean
    * baseline, replayed by the oracle as a recursive CTE (`//` and
    * Spark's `div` agree — every operand is non-negative). */
  private val q139 = Q("q139_cusum_daily",
    (s, d) => graft.ops.Analytics.cusumDaily(Tables.events(s, d),
        "event_type", "ts", kDen = 4, hMult = 5)
      .orderBy("event_type", "day"),
    Some("""WITH RECURSIVE daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
              FROM events GROUP BY 1, 2),
            dense AS (
              SELECT s.event_type, CAST(d AS DATE) AS day
              FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
                    FROM daily GROUP BY 1) s,
                   unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
                     CAST(s.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS t(d)),
            filled AS (
              SELECT dense.event_type, dense.day, coalesce(daily.n, 0) AS n
              FROM dense LEFT JOIN daily USING (event_type, day)),
            num AS (
              SELECT event_type, day, n,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY day) AS rn
              FROM filled),
            kp AS (
              SELECT event_type,
                     (CAST(sum(n) AS BIGINT) * 1000000) // count(*) AS mu,
                     ((CAST(sum(n) AS BIGINT) * 1000000) // count(*)) // 4
                       AS kk
              FROM filled GROUP BY 1),
            rec AS (
              SELECT num.event_type, day, n, rn,
                     greatest(0, n * 1000000 - mu - kk) AS hi,
                     greatest(0, mu - n * 1000000 - kk) AS lo
              FROM num JOIN kp ON num.event_type = kp.event_type
              WHERE rn = 1
              UNION ALL
              SELECT num.event_type, num.day, num.n, num.rn,
                     greatest(0, rec.hi + num.n * 1000000 - kp.mu - kp.kk),
                     greatest(0, rec.lo + kp.mu - num.n * 1000000 - kp.kk)
              FROM rec JOIN num ON num.event_type = rec.event_type
                               AND num.rn = rec.rn + 1
                       JOIN kp ON num.event_type = kp.event_type)
            SELECT rec.event_type, day, n AS n_events,
                   CAST(hi AS DOUBLE) / 1000000.0 AS cusum_hi,
                   CAST(lo AS DOUBLE) / 1000000.0 AS cusum_lo,
                   (hi > kk * 5 OR lo > kk * 5) AS alarm
            FROM rec JOIN kp ON rec.event_type = kp.event_type
            ORDER BY rec.event_type, day"""))

  /** q140 — Benford first-digit audit
    * ([[graft.operators.Stats.benford]]) of order totals: structural
    * digit extraction (never log10), driver-pinned expectation
    * literals shared with the oracle, χ² via the expanded identity
    * both engines replay term-for-term. */
  private val q140 = {
    val expSql = (1 to 9)
      .map(dd => s"($dd, CAST(${math.log10(1.0 + 1.0 / dd)} AS DOUBLE))")
      .mkString(", ")
    Q("q140_benford_audit",
      (s, d) => graft.operators.Stats.benford(Tables.orders(s, d),
          col("o_totalprice"))
        .orderBy("digit"),
      Some(s"""WITH expd(digit, expected) AS (VALUES $expSql),
              c0 AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice)
                              AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER)
                            AS digit,
                            count(*) AS n
                     FROM orders
                     WHERE o_totalprice IS NOT NULL
                       AND NOT isnan(o_totalprice) AND o_totalprice >= 1
                       AND o_totalprice < 9.223372036854775e18
                     GROUP BY 1),
              c AS (SELECT expd.digit, coalesce(n, 0) AS n, expected
                    FROM expd LEFT JOIN c0 USING (digit)),
              t AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
                           sum(n * n / expected) AS se
                    FROM c)
              SELECT digit, n, round(n / CAST(tot AS DOUBLE), 6) AS share,
                     round(expected, 6) AS expected,
                     round(n / CAST(tot AS DOUBLE) - expected, 6) AS excess,
                     round(se / tot - tot, 4) AS chi2
              FROM c, t WHERE n > 0 ORDER BY digit"""))
  }

  /** q141 — categorical association
    * ([[graft.operators.Stats.categoricalAssociation]]) between event
    * type and hour of day: χ² over the full 5×24 table, Cramér's V,
    * and mutual information with 9dp-rounded ln terms (the klDrift
    * rule). */
  private val q141 = Q("q141_categorical_assoc",
    (s, d) => graft.operators.Stats.categoricalAssociation(
      Tables.events(s, d), col("event_type"), hour(col("ts"))),
    Some("""WITH cells AS (
              SELECT event_type AS a, hour(ts) AS b, count(*) AS o
              FROM events
              WHERE event_type IS NOT NULL AND ts IS NOT NULL
              GROUP BY 1, 2),
            ma AS (SELECT a, CAST(sum(o) AS BIGINT) AS na
                   FROM cells GROUP BY 1),
            mb AS (SELECT b, CAST(sum(o) AS BIGINT) AS nb
                   FROM cells GROUP BY 1),
            fl AS (SELECT ma.a, mb.b, na, nb, coalesce(o, 0) AS o
                   FROM ma CROSS JOIN mb
                   LEFT JOIN cells ON ma.a = cells.a AND mb.b = cells.b),
            sc AS (SELECT (SELECT CAST(sum(na) AS BIGINT) FROM ma) AS n,
                          (SELECT count(*) FROM ma) AS card_a,
                          (SELECT count(*) FROM mb) AS card_b),
            terms AS (
              SELECT n, card_a, card_b,
                     (o - CAST(na AS DOUBLE) * nb / n)
                       * (o - CAST(na AS DOUBLE) * nb / n)
                       / (CAST(na AS DOUBLE) * nb / n) AS x2,
                     CASE WHEN o > 0
                          THEN round((o / CAST(n AS DOUBLE))
                            * ln(CAST(o AS DOUBLE) * n
                                 / (CAST(na AS DOUBLE) * nb)), 9)
                          ELSE 0.0 END AS mi
              FROM fl, sc)
            SELECT n, card_a, card_b, round(sum(x2), 4) AS chi2,
                   CASE WHEN least(card_a, card_b) > 1
                        THEN round(sqrt(round(sum(x2), 4)
                          / (n * (least(card_a, card_b) - 1))), 6)
                        END AS cramers_v,
                   round(sum(mi), 6) AS mi
            FROM terms GROUP BY 1, 2, 3"""))

  /** q142 — revenue concentration
    * ([[graft.ops.Analytics.revenueConcentration]]): Lorenz deciles
    * of per-customer revenue with the rank-formulation Gini repeated
    * per row. Revenue rounds to cents before ranking so both engines
    * sort identical values. */
  private val q142 = Q("q142_revenue_concentration",
    (s, d) => graft.ops.Analytics.revenueConcentration(Tables.orders(s, d),
        "o_custkey", "o_totalprice", nBands = 10)
      .orderBy("band"),
    Some("""WITH pc AS (SELECT o_custkey AS c, round(sum(o_totalprice), 2) AS rev
                        FROM orders GROUP BY 1),
            r AS (SELECT c, rev, row_number() OVER (ORDER BY rev, c) AS i,
                         ntile(10) OVER (ORDER BY rev, c) AS band
                  FROM pc),
            sc AS (SELECT count(*) AS n, sum(rev) AS tot,
                          sum(rev * i) AS si
                   FROM r),
            b AS (SELECT band, count(*) AS n_customers,
                         round(sum(rev), 2) AS revenue
                  FROM r GROUP BY 1)
            SELECT band, n_customers, revenue,
                   round(sum(revenue) OVER (ORDER BY band
                     ROWS UNBOUNDED PRECEDING) / tot, 6) AS cum_share,
                   round(2.0 * si / (n * tot)
                     - (n + 1) / CAST(n AS DOUBLE), 6) AS gini
            FROM b, sc ORDER BY band"""))

  /** q143 — Kaplan-Meier time-to-reorder survival
    * ([[graft.ops.Analytics.kaplanMeier]]): per customer, days from
    * first to second order — customers with no second order are
    * right-CENSORED at the corpus's last order date. The oracle
    * replays the duration derivation, the at-risk cumulative, and
    * the sequential product as a recursive CTE (identical doubles in
    * identical order — no transcendental). */
  private val q143 = Q("q143_kaplan_meier",
    (s, d) => {
      val po = Tables.orders(s, d)
        .withColumn("rn", row_number().over(Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")))
      val first = po.where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderdate").as("d1"))
      val second = po.where(col("rn") === 2)
        .select(col("o_custkey"), col("o_orderdate").as("d2"))
      val mx = Tables.orders(s, d).agg(max("o_orderdate").as("m"))
      val dur = first.join(second, Seq("o_custkey"), "left")
        .crossJoin(broadcast(mx))
        .select(when(col("d2").isNull, datediff(col("m"), col("d1")))
            .otherwise(datediff(col("d2"), col("d1"))).as("t"),
          col("d2").isNotNull.as("e"))
      graft.ops.Analytics.kaplanMeier(dur, col("t"), col("e"))
        .orderBy("t")
    },
    Some("""WITH RECURSIVE po AS (
              SELECT o_custkey, o_orderdate,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS rn
              FROM orders),
            f AS (SELECT a.o_custkey, a.o_orderdate AS d1, b.o_orderdate AS d2
                  FROM po a LEFT JOIN po b
                    ON a.o_custkey = b.o_custkey AND b.rn = 2
                  WHERE a.rn = 1),
            mx AS (SELECT max(o_orderdate) AS m FROM orders),
            dur AS (SELECT CASE WHEN d2 IS NULL
                                THEN datediff('day', d1, m)
                                ELSE datediff('day', d1, d2) END AS t,
                           (d2 IS NOT NULL) AS e
                    FROM f, mx),
            g AS (SELECT t,
                         CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT)
                           AS d,
                         count(*) AS l
                  FROM dur GROUP BY 1),
            nr AS (SELECT t, d, l,
                          (SELECT count(*) FROM dur)
                            - coalesce(CAST(sum(l) OVER (ORDER BY t
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS BIGINT), 0) AS n_risk,
                          row_number() OVER (ORDER BY t) AS rn
                   FROM g),
            rec AS (
              SELECT t, d, l, n_risk, rn,
                     1.0 * (1.0 - CAST(d AS DOUBLE) / n_risk) AS s
              FROM nr WHERE rn = 1
              UNION ALL
              SELECT nr.t, nr.d, nr.l, nr.n_risk, nr.rn,
                     rec.s * (1.0 - CAST(nr.d AS DOUBLE) / nr.n_risk)
              FROM rec JOIN nr ON nr.rn = rec.rn + 1)
            SELECT t, n_risk, d AS n_events, l - d AS n_censored,
                   round(s, 6) AS survival
            FROM rec WHERE d > 0 ORDER BY t"""))

  /** q144 — two-proportion A/B z-test
    * ([[graft.operators.Stats.twoProportionZ]]): users
    * md5-split into two arms (the deterministic assignment a real
    * experiment service uses), converted = has ≥1 purchase event;
    * pooled z from exact integer counts, replayed term-for-term. */
  private val q144 = Q("q144_ab_test_z",
    (s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("__conv"))
      graft.operators.Stats.twoProportionZ(perUser,
        pmod(graft.functions.TextFunctions.md5Long(
          concat(col("user_id").cast("string"), lit("|ab"))), lit(2)) === 0,
        col("__conv") === 1)
    },
    Some("""WITH pu AS (
              SELECT user_id,
                     max(CASE WHEN event_type = 'purchase'
                         THEN 1 ELSE 0 END) AS conv,
                     (CAST(('0x' || substr(md5(concat(
                        CAST(user_id AS VARCHAR), '|ab')), 1, 15))
                        AS BIGINT) % 2 = 0) AS arm_a
              FROM events GROUP BY user_id),
            c AS (SELECT
                    CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_a,
                    CAST(sum(CASE WHEN arm_a AND conv = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
                    CAST(sum(CASE WHEN NOT arm_a THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_b,
                    CAST(sum(CASE WHEN NOT arm_a AND conv = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
                  FROM pu)
            SELECT n_a, conv_a,
                   round(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
                   n_b, conv_b,
                   round(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
                   CASE WHEN n_a > 0 AND n_b > 0 AND
                             (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)
                               * (CAST(1 AS DOUBLE)
                                  - (conv_a + conv_b)
                                    / CAST(n_a + n_b AS DOUBLE))
                               * (CAST(1 AS DOUBLE) / n_a
                                  + CAST(1 AS DOUBLE) / n_b) > 0.0
                        THEN round((conv_a / CAST(n_a AS DOUBLE)
                               - conv_b / CAST(n_b AS DOUBLE))
                             / sqrt((conv_a + conv_b)
                                 / CAST(n_a + n_b AS DOUBLE)
                               * (CAST(1 AS DOUBLE)
                                  - (conv_a + conv_b)
                                    / CAST(n_a + n_b AS DOUBLE))
                               * (CAST(1 AS DOUBLE) / n_a
                                  + CAST(1 AS DOUBLE) / n_b)), 4)
                        END AS z
            FROM c"""))

  /** q146 — top journey trigrams
    * ([[graft.ops.Analytics.journeyNgrams]], n = 3): the dominant
    * length-3 user paths, the non-Markovian view q124's transition
    * matrix cannot express. The oracle replays the lead windows, the
    * path render, and the top-20 cut. */
  private val q146 = Q("q146_journey_trigrams",
    (s, d) => graft.ops.Analytics.journeyNgrams(Tables.events(s, d),
      "user_id", "event_type", "ts", "event_id", n = 3, topK = 20),
    Some("""WITH seq AS (
              SELECT event_type AS s0,
                     lead(event_type, 1) OVER w AS s1,
                     lead(event_type, 2) OVER w AS s2
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT concat(s0, ' > ', s1, ' > ', s2) AS path,
                   count(*) AS n_journeys
            FROM seq WHERE s2 IS NOT NULL
            GROUP BY 1 ORDER BY n_journeys DESC, path LIMIT 20"""))

  /** q151 — join-key skew profile
    * ([[graft.operators.Stats.skewProfile]]): the hottest supplier
    * keys on the lineitem fact with share, multiple-of-average, and
    * the global max/avg skew ratio — the audit that decides between
    * a plain join and `Relational.saltedJoin`. */
  private val q151 = Q("q151_skew_profile",
    (s, d) => graft.operators.Stats.skewProfile(Tables.lineitem(s, d),
        col("l_suppkey"), topN = 10)
      .orderBy(col("n").desc, col("key")),
    Some("""WITH c AS (SELECT coalesce(CAST(l_suppkey AS VARCHAR), '(null)')
                              AS key,
                            count(*) AS n
                       FROM lineitem GROUP BY 1),
            g AS (SELECT CAST(sum(n) AS BIGINT) AS tot, count(*) AS k,
                         max(n) AS mx
                  FROM c)
            SELECT key, n, round(n / CAST(tot AS DOUBLE), 6) AS share,
                   round(n * k / CAST(tot AS DOUBLE), 4) AS x_avg,
                   round(mx * k / CAST(tot AS DOUBLE), 4) AS skew_ratio
            FROM (SELECT * FROM c ORDER BY n DESC, key LIMIT 10), g
            ORDER BY n DESC, key"""))

  /** q152 — Mann-Whitney U rank-sum test
    * ([[graft.operators.Stats.mannWhitneyU]]): order totals across
    * md5-assigned arms — the nonparametric companion of q144 for a
    * skewed metric. The oracle replays the distinct-value grain, the
    * average ranks, the rank sum, and the tie-corrected z
    * expression-for-expression (every intermediate an exact double). */
  private val q152 = Q("q152_mann_whitney",
    (s, d) => graft.operators.Stats.mannWhitneyU(Tables.orders(s, d),
      pmod(graft.functions.TextFunctions.md5Long(
        concat(col("o_custkey").cast("string"), lit("|mw"))), lit(2)) === 0,
      col("o_totalprice")),
    Some("""WITH v AS (SELECT o_totalprice AS v,
                              (CAST(('0x' || substr(md5(concat(
                                 CAST(o_custkey AS VARCHAR), '|mw')), 1, 15))
                                 AS BIGINT) % 2 = 0) AS a
                       FROM orders
                       WHERE o_totalprice IS NOT NULL
                         AND NOT isnan(o_totalprice)),
            g AS (SELECT v, count(*) AS c,
                         CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT)
                           AS ca
                  FROM v GROUP BY v),
            r AS (SELECT *,
                         1 + coalesce(CAST(sum(c) OVER (ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS BIGINT), 0)
                           + (c - 1) / 2.0 AS avg_rank
                  FROM g),
            s AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                         CAST(sum(c - ca) AS BIGINT) AS n_b,
                         sum(ca * avg_rank) AS ra,
                         CAST(sum(c * c * c - c) AS BIGINT) AS ties
                  FROM r),
            e AS (SELECT n_a, n_b, ra, ties,
                         CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
                         CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS n
                  FROM s)
            SELECT n_a, n_b,
                   round(ra - na * (na + 1) / 2.0, 4) AS u_a,
                   CASE WHEN n_a > 0 AND n_b > 0 AND
                             na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
                               > 0.0
                        THEN round((ra - na * (na + 1) / 2.0 - na * nb / 2.0)
                             / sqrt(na * nb / 12.0
                                 * ((n + 1) - ties / (n * (n - 1)))), 4)
                        END AS z
            FROM e"""))

  /** q153 — population stability index
    * ([[graft.operators.Stats.psi]], 20 bins over [0, 500000), add-½
    * smoothing): order-total distribution, pre-1998 vs later — the
    * numeric-feature drift monitor next to q85's token KL. Per-term
    * 9dp ln rounding, totals 6dp, replayed bin-for-bin. */
  private val q153 = Q("q153_psi_drift",
    (s, d) => graft.operators.Stats.psi(Tables.orders(s, d),
        col("o_orderdate") < lit("1998-01-01").cast("date"),
        col("o_totalprice"), lo = 0.0, hi = 500000.0, nBins = 20, k = 0.5)
      .orderBy("bin"),
    Some("""WITH b AS (SELECT CAST(greatest(0, least(19,
                              floor((o_totalprice - 0.0) / 25000.0)))
                              AS BIGINT) AS bin,
                            (o_orderdate < DATE '1998-01-01') AS p
                       FROM orders
                       WHERE o_orderdate IS NOT NULL
                         AND o_totalprice IS NOT NULL
                         AND NOT isnan(o_totalprice)),
            bins AS (SELECT unnest(generate_series(0, 19)) AS bin),
            c AS (SELECT bins.bin,
                         coalesce(np, 0) AS n_p, coalesce(nq, 0) AS n_q
                  FROM bins LEFT JOIN (
                    SELECT bin,
                           CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT)
                             AS np,
                           CAST(sum(CASE WHEN NOT p THEN 1 ELSE 0 END)
                             AS BIGINT) AS nq
                    FROM b GROUP BY 1) x USING (bin)),
            t AS (SELECT CAST(sum(n_p) AS BIGINT) AS tp,
                         CAST(sum(n_q) AS BIGINT) AS tq
                  FROM c),
            terms AS (SELECT bin, n_p, n_q,
                             round(((n_p + 0.5) / (tp + 10.0)
                                    - (n_q + 0.5) / (tq + 10.0))
                               * ln(((n_p + 0.5) / (tp + 10.0))
                                    / ((n_q + 0.5) / (tq + 10.0))), 9)
                               AS psi_term
                      FROM c, t),
            tot AS (SELECT round(sum(psi_term), 6) AS psi FROM terms)
            SELECT bin, round(0.0 + bin * 25000.0, 6) AS bin_lo,
                   n_p, n_q, psi_term, psi
            FROM terms, tot ORDER BY bin"""))

  /** q154 — Spearman rank correlation
    * ([[graft.operators.Stats.spearman]]): per-customer order count
    * vs lifetime revenue (cents — exact longs). The oracle replays
    * the doubled tie-averaged ranks, the decimal-exact sums, and the
    * one pinned closed-form expression. */
  private val q154 = Q("q154_spearman",
    (s, d) => {
      val perCust = Tables.orders(s, d)
        .where(col("o_totalprice").isNotNull && !isnan(col("o_totalprice")))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("x"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("y"))
      graft.operators.Stats.spearman(perCust, col("x"), col("y"))
    },
    Some("""WITH r AS (SELECT CAST(count(*) AS BIGINT) AS x,
                              CAST(sum(CAST(round(o_totalprice * 100, 0)
                                AS BIGINT)) AS BIGINT) AS y
                       FROM orders
                       WHERE o_totalprice IS NOT NULL
                         AND NOT isnan(o_totalprice)
                       GROUP BY o_custkey),
            gx AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY x),
            rx AS (SELECT x,
                          CAST(2 * (1 + coalesce(CAST(sum(c) OVER (ORDER BY x
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                              AS BIGINT), 0)) + c - 1 AS BIGINT) AS rxv
                   FROM gx),
            gy AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY y),
            ry AS (SELECT y,
                          CAST(2 * (1 + coalesce(CAST(sum(c) OVER (ORDER BY y
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                              AS BIGINT), 0)) + c - 1 AS BIGINT) AS ryv
                   FROM gy),
            j AS (SELECT rxv, ryv FROM r JOIN rx USING (x) JOIN ry USING (y)),
            s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(rxv) AS DOUBLE) AS sx,
                         CAST(sum(ryv) AS DOUBLE) AS sy,
                         CAST(sum(CAST(rxv AS HUGEINT) * rxv) AS DOUBLE)
                           AS sxx,
                         CAST(sum(CAST(ryv AS HUGEINT) * ryv) AS DOUBLE)
                           AS syy,
                         CAST(sum(CAST(rxv AS HUGEINT) * ryv) AS DOUBLE)
                           AS sxy
                  FROM j),
            e AS (SELECT n,
                         CAST(n AS DOUBLE) * sxy - sx * sy AS cov,
                         CAST(n AS DOUBLE) * sxx - sx * sx AS vx,
                         CAST(n AS DOUBLE) * syy - sy * sy AS vy
                  FROM s)
            SELECT n, CASE WHEN vx > 0.0 AND vy > 0.0
                           THEN round(cov / sqrt(vx * vy), 6) END AS rho
            FROM e"""))

  /** q155 — two-sample Kolmogorov-Smirnov
    * ([[graft.operators.Stats.ksTest]]): order-total distributions
    * across md5-assigned arms — the whole-CDF companion of q152's
    * rank-sum location test. D's sup is maximized as the exact
    * integer |cumA·n_B − cumB·n_A|; the oracle replays grain,
    * cumulative counts, and the single final division. */
  private val q155 = Q("q155_ks_test",
    (s, d) => graft.operators.Stats.ksTest(Tables.orders(s, d),
      pmod(graft.functions.TextFunctions.md5Long(
        concat(col("o_custkey").cast("string"), lit("|ks"))), lit(2)) === 0,
      col("o_totalprice")),
    Some("""WITH v AS (SELECT o_totalprice AS v,
                              (CAST(('0x' || substr(md5(concat(
                                 CAST(o_custkey AS VARCHAR), '|ks')), 1, 15))
                                 AS BIGINT) % 2 = 0) AS a
                       FROM orders
                       WHERE o_totalprice IS NOT NULL
                         AND NOT isnan(o_totalprice)),
            g AS (SELECT v,
                         CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT)
                           AS ca,
                         CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT)
                           AS cb
                  FROM v GROUP BY v),
            t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                         CAST(sum(cb) AS BIGINT) AS n_b FROM g),
            c AS (SELECT CAST(sum(ca) OVER (ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS cuma,
                         CAST(sum(cb) OVER (ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS cumb
                  FROM g),
            m AS (SELECT n_a, n_b,
                         max(abs(cuma * n_b - cumb * n_a)) AS dnum
                  FROM c, t GROUP BY n_a, n_b),
            e AS (SELECT n_a, n_b,
                         CAST(dnum AS DOUBLE)
                           / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d,
                         CAST(1.358 AS DOUBLE)
                           * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
                           AS crit
                  FROM m)
            SELECT n_a, n_b,
                   CASE WHEN n_a > 0 AND n_b > 0 THEN round(d, 6) END AS d,
                   CASE WHEN n_a > 0 AND n_b > 0 THEN round(crit, 6) END
                     AS crit_05,
                   CASE WHEN n_a > 0 AND n_b > 0 THEN d > crit END
                     AS reject_05
            FROM e"""))

  /** q156 — OLS daily trend with R²
    * ([[graft.ops.Analytics.olsDaily]]): closed-form slope /
    * intercept / R² per event type over the densified daily counts —
    * q138's classical companion. Every sum is an exact long; the
    * oracle replays the five sums and the three pinned expressions. */
  private val q156 = Q("q156_ols_trend",
    (s, d) => graft.ops.Analytics.olsDaily(Tables.events(s, d),
        "event_type", "ts")
      .orderBy("event_type"),
    Some("""WITH daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
              FROM events GROUP BY 1, 2),
            dense AS (
              SELECT s.event_type, CAST(d AS DATE) AS day
              FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
                    FROM daily GROUP BY 1) s,
                   unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
                     CAST(s.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS t(d)),
            filled AS (
              SELECT dense.event_type, dense.day, coalesce(daily.n, 0) AS n
              FROM dense LEFT JOIN daily USING (event_type, day)),
            pts AS (
              SELECT event_type,
                     CAST(datediff('day', min(day) OVER (PARTITION BY
                       event_type), day) AS BIGINT) AS x,
                     CAST(n AS BIGINT) AS y
              FROM filled),
            s AS (SELECT event_type,
                         CAST(count(*) AS BIGINT) AS n_days,
                         CAST(sum(x) AS DOUBLE) AS sx,
                         CAST(sum(x * x) AS DOUBLE) AS sxx,
                         CAST(sum(y) AS DOUBLE) AS sy,
                         CAST(sum(y * y) AS DOUBLE) AS syy,
                         CAST(sum(x * y) AS DOUBLE) AS sxy
                  FROM pts GROUP BY 1),
            e AS (SELECT event_type, n_days,
                         CAST(n_days AS DOUBLE) * sxy - sx * sy AS cov,
                         CAST(n_days AS DOUBLE) * sxx - sx * sx AS vx,
                         CAST(n_days AS DOUBLE) * syy - sy * sy AS vy,
                         sx, sy
                  FROM s)
            SELECT event_type, n_days,
                   CASE WHEN vx > 0.0 THEN round(cov / vx, 6) END AS slope,
                   CASE WHEN vx > 0.0 THEN round((sy - (cov / vx) * sx)
                     / CAST(n_days AS DOUBLE), 6) END AS intercept,
                   CASE WHEN vx > 0.0 AND vy > 0.0
                        THEN round(cov * cov / (vx * vy), 6) END AS r2
            FROM e ORDER BY event_type"""))

  /** q157 — day-of-week seasonal decomposition
    * ([[graft.ops.Analytics.seasonalDowDecompose]]): centered 7-day
    * MA trend on the ×7 integer scale, per-weekday detrended means,
    * centering mean folded sequentially (the q143 recursive-CTE
    * rule). The weekday key is arithmetic ((epochDay+4) mod 7, 0 =
    * Sunday) — no locale, no engine dayofweek convention. */
  private val q157 = Q("q157_seasonal_dow",
    (s, d) => graft.ops.Analytics.seasonalDowDecompose(Tables.events(s, d),
        "event_type", "ts")
      .orderBy("event_type", "dow"),
    Some("""WITH RECURSIVE daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
              FROM events GROUP BY 1, 2),
            dense AS (
              SELECT s.event_type, CAST(d AS DATE) AS day
              FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
                    FROM daily GROUP BY 1) s,
                   unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
                     CAST(s.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS t(d)),
            filled AS (
              SELECT dense.event_type, dense.day, coalesce(daily.n, 0) AS n
              FROM dense LEFT JOIN daily USING (event_type, day)),
            pts AS (
              SELECT event_type,
                     CAST(datediff('day', DATE '1970-01-01', day)
                       AS BIGINT) AS ord,
                     CAST(n AS BIGINT) AS n
              FROM filled),
            det AS (
              SELECT event_type, ord, n,
                     CAST(sum(n) OVER (PARTITION BY event_type ORDER BY ord
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                       AS BIGINT) AS s7,
                     count(*) OVER (PARTITION BY event_type ORDER BY ord
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
              FROM pts),
            dd AS (SELECT event_type, (ord + 4) % 7 AS dow,
                          7 * n - s7 AS det7
                   FROM det WHERE c7 = 7),
            bd AS (SELECT event_type, dow,
                          CAST(sum(det7) AS BIGINT) AS s7,
                          CAST(count(*) AS BIGINT) AS n_weeks
                   FROM dd GROUP BY 1, 2),
            nb AS (SELECT *,
                          row_number() OVER (PARTITION BY event_type
                            ORDER BY dow) AS rn,
                          count(*) OVER (PARTITION BY event_type) AS nd
                   FROM bd),
            rec AS (
              SELECT event_type, rn, nd,
                     0.0 + CAST(s7 AS DOUBLE) / (7.0 * n_weeks) AS acc
              FROM nb WHERE rn = 1
              UNION ALL
              SELECT nb.event_type, nb.rn, nb.nd,
                     rec.acc + CAST(nb.s7 AS DOUBLE) / (7.0 * nb.n_weeks)
              FROM rec JOIN nb ON nb.event_type = rec.event_type
                              AND nb.rn = rec.rn + 1),
            m AS (SELECT event_type, acc / nd AS m
                  FROM rec WHERE rn = nd)
            SELECT b.event_type, b.dow, b.n_weeks,
                   round(CAST(b.s7 AS DOUBLE) / (7.0 * b.n_weeks), 6)
                     AS seasonal_raw,
                   round(CAST(b.s7 AS DOUBLE) / (7.0 * b.n_weeks) - m.m, 6)
                     AS seasonal
            FROM bd b JOIN m USING (event_type)
            ORDER BY event_type, dow"""))

  /** q161 — Z-order data-layout audit ([[graft.ops.Layout]]): orders
    * quantized on (orderdate, totalprice) to 8 bits each, Morton-
    * interleaved, grouped by the top-8-bit key prefix. Each prefix
    * bucket covers a ≤16×16-cell rectangle — the min/max spans ARE
    * the file-stats pruning guarantee a Z-ordered write gives both
    * dimensions. Pure integer bit arithmetic, identical in SQL. */
  private val q161 = Q("q161_zorder_layout",
    (s, d) => {
      import graft.ops.Layout
      val qd = Layout.quantize(
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date")),
        0.0, 2560.0, 8)
      val qp = Layout.quantize(col("o_totalprice"), 0.0, 600000.0, 8)
      Tables.orders(s, d)
        .where(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
        .select(qd.as("qd"), qp.as("qp"))
        .withColumn("bucket",
          shiftright(Layout.zOrderKey(col("qd"), col("qp"), 8), 8))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("qd").as("min_qd"), max("qd").as("max_qd"),
          min("qp").as("min_qp"), max("qp").as("max_qp"))
        .orderBy("bucket")
    },
    Some(s"""WITH q AS (
              SELECT greatest(0, least(255, CAST(floor(
                       datediff('day', DATE '1992-01-01', o_orderdate)
                         / 10.0) AS BIGINT))) AS qd,
                     greatest(0, least(255, CAST(floor(
                       o_totalprice / 2343.75) AS BIGINT))) AS qp
              FROM orders
              WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
            z AS (SELECT qd, qp,
                         (${graft.ops.Layout.zOrderKeySql("qd", "qp", 8)})
                           >> 8 AS bucket
                  FROM q)
            SELECT bucket, count(*) AS n,
                   min(qd) AS min_qd, max(qd) AS max_qd,
                   min(qp) AS min_qp, max(qp) AS max_qp
            FROM z GROUP BY 1 ORDER BY 1"""))

  /** The q163 compared-field set: weights are driver-computed
    * nano-unit literals shared verbatim with the oracle SQL — no
    * transcendental in either engine's plan. */
  private val fsFields = Seq(
    graft.ops.Linkage.Field("name", "c_name", "r_name", 0.95, 0.001),
    graft.ops.Linkage.Field("acct", "c_acctbal", "r_acct", 0.9, 0.001),
    graft.ops.Linkage.Field("mkt", "c_mktsegment", "r_mkt", 0.9, 0.2))

  /** q163 — Fellegi-Sunter record linkage
    * ([[graft.ops.Linkage.linkBlocked]]): customers against a
    * perturbed copy (every 3rd name uppercased, every 5th balance
    * nudged), blocked on nation. Twins with ONE damaged field still
    * clear the threshold on the remaining evidence; twins with both
    * damaged are honest false negatives. Scores are exact long sums
    * of interpolated literal weights. */
  private val q163 = Q("q163_record_linkage",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val right = cust.select(
        (col("c_custkey") + 1000000).as("r_key"),
        when(col("c_custkey") % 3 === 0, upper(col("c_name")))
          .otherwise(col("c_name")).as("r_name"),
        when(col("c_custkey") % 5 === 0, col("c_acctbal") + 0.01)
          .otherwise(col("c_acctbal")).as("r_acct"),
        col("c_mktsegment").as("r_mkt"), col("c_nationkey").as("r_nat"))
      graft.ops.Linkage.linkBlocked(cust, right, "c_custkey", "r_key",
          col("c_nationkey"), col("r_nat"), fsFields,
          thresholdNano = 4000000000L)
        .groupBy("is_match")
        .agg(count(lit(1)).as("n_pairs"), sum("score_n").as("sum_score_n"),
          sum(when(col("agree_name"), 1L).otherwise(0L)).as("n_name_agree"))
        .orderBy("is_match")
    },
    Some(s"""WITH r AS (
              SELECT c_custkey + 1000000 AS r_key,
                     CASE WHEN c_custkey % 3 = 0 THEN upper(c_name)
                          ELSE c_name END AS r_name,
                     CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 0.01
                          ELSE c_acctbal END AS r_acct,
                     c_mktsegment AS r_mkt, c_nationkey AS r_nat
              FROM customer),
            p AS (SELECT CASE WHEN l.c_name IS NULL OR r.r_name IS NULL
                              THEN NULL ELSE l.c_name = r.r_name END AS a_name,
                         CASE WHEN l.c_acctbal IS NULL OR r.r_acct IS NULL
                              THEN NULL ELSE l.c_acctbal = r.r_acct END AS a_acct,
                         CASE WHEN l.c_mktsegment IS NULL OR r.r_mkt IS NULL
                              THEN NULL
                              ELSE l.c_mktsegment = r.r_mkt END AS a_mkt
                  FROM customer l JOIN r ON l.c_nationkey = r.r_nat),
            sc AS (SELECT a_name,
                          (CASE WHEN a_name IS NULL THEN 0
                                WHEN a_name THEN ${fsFields(0).agreeNano}
                                ELSE ${fsFields(0).disagreeNano} END)
                        + (CASE WHEN a_acct IS NULL THEN 0
                                WHEN a_acct THEN ${fsFields(1).agreeNano}
                                ELSE ${fsFields(1).disagreeNano} END)
                        + (CASE WHEN a_mkt IS NULL THEN 0
                                WHEN a_mkt THEN ${fsFields(2).agreeNano}
                                ELSE ${fsFields(2).disagreeNano} END) AS score_n
                   FROM p)
            SELECT (score_n >= 4000000000) AS is_match,
                   count(*) AS n_pairs,
                   CAST(sum(score_n) AS BIGINT) AS sum_score_n,
                   CAST(sum(CASE WHEN a_name THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_name_agree
            FROM sc GROUP BY 1 ORDER BY 1"""))

  /** q170 — Poisson-bootstrap CI for the mean order value
    * ([[graft.operators.Stats.bootstrapCiMean]], 100 replicates):
    * every (row, replicate) weight is an md5 draw against
    * FLOOR(CDF·2^40) integer thresholds interpolated into BOTH
    * engines — all replicate sums exact, one corpus pass. */
  private val q170 = Q("q170_bootstrap_ci",
    (s, d) => graft.operators.Stats.bootstrapCiMean(
      Tables.orders(s, d).where(col("o_totalprice").isNotNull),
      col("o_orderkey"), round(col("o_totalprice") * 100, 0).cast("long"),
      reps = 100),
    Some {
      val t = graft.operators.Stats.poissonThresholds40
      s"""WITH r AS (SELECT CAST(o_orderkey AS VARCHAR) AS id,
                            CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
                     FROM orders
                     WHERE o_totalprice IS NOT NULL
                       AND o_orderkey IS NOT NULL),
            t AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(v) AS sv FROM r),
            b AS (SELECT unnest(range(0, 100)) AS b),
            d AS (SELECT v, b,
                         CAST(('0x' || substr(md5(concat(id, '|bs|',
                           CAST(b AS VARCHAR))), 1, 15)) AS BIGINT)
                           % 1099511627776 AS u
                  FROM r, b),
            w AS (SELECT b, v,
                         CASE WHEN u < ${t(0)} THEN 0
                              WHEN u < ${t(1)} THEN 1
                              WHEN u < ${t(2)} THEN 2
                              WHEN u < ${t(3)} THEN 3
                              WHEN u < ${t(4)} THEN 4
                              WHEN u < ${t(5)} THEN 5
                              WHEN u < ${t(6)} THEN 6
                              ELSE 7 END AS w
                  FROM d),
            m AS (SELECT b, CAST(sum(w * v) AS DOUBLE)
                           / (CAST(sum(w) AS DOUBLE) * 100.0) AS m
                  FROM w GROUP BY b HAVING sum(w) > 0),
            ci AS (SELECT CAST(count(*) AS BIGINT) AS reps,
                          round(quantile_cont(m, 0.025), 6) AS lo95,
                          round(quantile_cont(m, 0.975), 6) AS hi95
                   FROM m)
            SELECT n, reps,
                   CASE WHEN n > 0 THEN round(CAST(sv AS DOUBLE)
                     / (CAST(n AS DOUBLE) * 100.0), 6) END AS mean,
                   lo95, hi95
            FROM t, ci"""
    })

  /** q171 — expectation-suite audit
    * ([[graft.operators.Quality.expect]]): five declarative checks
    * over orders in ONE aggregate pass (nulls COUNT AS FAILURES —
    * three-valued logic must not wave rows through), plus the
    * order-key uniqueness check as a sibling aggregate. */
  private val q171 = Q("q171_expectation_audit",
    (s, d) => {
      import graft.operators.Quality.{expect, Expectation}
      expect(Tables.orders(s, d), Seq(
        Expectation("custkey_not_null", col("o_custkey").isNotNull),
        Expectation("totalprice_positive", col("o_totalprice") > 0),
        Expectation("priority_shape", col("o_orderpriority").rlike("^[1-5]-")),
        Expectation("date_in_range",
          col("o_orderdate").between("1992-01-01", "1998-12-31"))),
        uniqueKeys = Seq(("orderkey_unique", Seq(col("o_orderkey")))))
    },
    Some("""WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN o_custkey IS NOT NULL
                     THEN 0 ELSE 1 END) AS BIGINT) AS f_cust,
                   CAST(sum(CASE WHEN o_totalprice > 0
                     THEN 0 ELSE 1 END) AS BIGINT) AS f_tp,
                   CAST(sum(CASE WHEN regexp_matches(o_orderpriority,
                     '^[1-5]-') THEN 0 ELSE 1 END) AS BIGINT) AS f_pr,
                   CAST(sum(CASE WHEN o_orderdate BETWEEN DATE '1992-01-01'
                     AND DATE '1998-12-31' THEN 0 ELSE 1 END)
                     AS BIGINT) AS f_dt,
                   CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                     AS f_uq
            FROM orders),
            u AS (
              SELECT 'custkey_not_null' AS "check", n, f_cust AS f FROM a
              UNION ALL
              SELECT 'totalprice_positive', n, f_tp FROM a
              UNION ALL
              SELECT 'priority_shape', n, f_pr FROM a
              UNION ALL
              SELECT 'date_in_range', n, f_dt FROM a
              UNION ALL
              SELECT 'orderkey_unique', n, f_uq FROM a)
            SELECT "check", n AS n_rows, f AS n_fail,
                   CASE WHEN n > 0
                        THEN round((n - f) / CAST(n AS DOUBLE), 6)
                        END AS pass_rate
            FROM u ORDER BY "check""""))

  /** q174 — modified z-score (MAD) outliers
    * ([[graft.operators.Quality.madOutliers]]): robust z per order
    * priority, the outlier flag extreme values cannot blind. Both
    * medians are quantile_cont; z is one pinned expression rounded
    * 4dp before the per-group rollup. */
  private val q174 = Q("q174_mad_outliers",
    (s, d) => {
      graft.operators.Quality.madOutliers(Tables.orders(s, d),
          Seq("o_orderpriority"), "o_totalprice")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
          max("robust_z").as("max_z"), min("robust_z").as("min_z"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH med AS (SELECT o_orderpriority AS g,
                                quantile_cont(o_totalprice, 0.5) AS med
                         FROM orders GROUP BY 1),
            wm AS (SELECT o_orderpriority AS g, o_totalprice AS v, med
                   FROM orders JOIN med ON o_orderpriority = med.g),
            mad AS (SELECT g, quantile_cont(abs(v - med), 0.5) AS mad
                    FROM wm GROUP BY 1),
            z AS (SELECT wm.g,
                         CASE WHEN mad > 0
                              THEN round(0.6745 * (v - med) / mad, 4)
                              END AS z
                  FROM wm JOIN mad ON wm.g = mad.g)
            SELECT g AS o_orderpriority, count(*) AS n,
                   CAST(sum(CASE WHEN abs(z) > 3.5 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_outliers,
                   max(z) AS max_z, min(z) AS min_z
            FROM z GROUP BY 1 ORDER BY 1"""))

  /** q175 — cohort LTV curve ([[graft.ops.Analytics.cohortLtv]]):
    * cumulative revenue per cohort member by months since first
    * purchase — q119's revenue twin. Integer month indexes, exact
    * cents, one pinned division. */
  private val q175 = Q("q175_cohort_ltv",
    (s, d) => graft.ops.Analytics.cohortLtv(Tables.orders(s, d),
        "o_custkey", "o_orderdate", col("o_totalprice"))
      .orderBy("cohort_month", "age_months"),
    Some("""WITH r AS (SELECT o_custkey AS cust,
                              year(o_orderdate) * 12 + month(o_orderdate) AS m,
                              CAST(round(o_totalprice * 100, 0) AS BIGINT)
                                AS cents
                       FROM orders
                       WHERE o_orderdate IS NOT NULL
                         AND o_totalprice IS NOT NULL),
            c AS (SELECT *, min(m) OVER (PARTITION BY cust) AS cm FROM r),
            pa AS (SELECT cm, m - cm AS age,
                          CAST(count(DISTINCT cust) AS BIGINT) AS active,
                          CAST(sum(cents) AS BIGINT) AS cents
                   FROM c GROUP BY 1, 2),
            sz AS (SELECT cm, CAST(count(DISTINCT cust) AS BIGINT)
                     AS n_customers
                   FROM c GROUP BY 1),
            cum AS (SELECT pa.cm, age, n_customers, active, cents,
                           CAST(sum(cents) OVER (PARTITION BY pa.cm
                             ORDER BY age ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cumc
                    FROM pa JOIN sz USING (cm))
            SELECT make_date(CAST((cm - 1) // 12 AS INTEGER),
                     CAST(cm - ((cm - 1) // 12) * 12 AS INTEGER), 1)
                     AS cohort_month,
                   CAST(age AS BIGINT) AS age_months, n_customers,
                   active AS n_active,
                   round(cents / 100.0, 2) AS revenue,
                   CAST((cumc - ((cumc % n_customers + n_customers)
                       % n_customers)) // n_customers AS DOUBLE)
                     / 100.0 AS cum_ltv
            FROM cum ORDER BY cohort_month, age_months"""))

  /** q176 — Holt-Winters triple smoothing
    * ([[graft.ops.Analytics.holtWintersDaily]], α=3/10 β=2/10 γ=2/10,
    * period 7): the weekly-seasonal smoother as pure bigint
    * floor-div recurrences; the oracle's recursive CTE carries the
    * last 7 seasonal states as a bounded list. */
  private val q176 = Q("q176_holt_winters",
    (s, d) => graft.ops.Analytics.holtWintersDaily(Tables.events(s, d),
        "event_type", "ts")
      .orderBy("event_type", "day"),
    Some("""WITH RECURSIVE daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
              FROM events GROUP BY 1, 2),
            dense AS (
              SELECT s.event_type, CAST(d AS DATE) AS day
              FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
                    FROM daily GROUP BY 1) s,
                   unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
                     CAST(s.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS t(d)),
            filled AS (
              SELECT dense.event_type, dense.day, coalesce(daily.n, 0) AS n
              FROM dense LEFT JOIN daily USING (event_type, day)),
            num AS (SELECT event_type, day, CAST(n AS BIGINT) AS n,
                           row_number() OVER (PARTITION BY event_type
                             ORDER BY day) AS rn
                    FROM filled),
            rec AS (
              SELECT event_type, day, n, rn,
                     n * 1000000 AS lm, CAST(0 AS BIGINT) AS bm,
                     CAST(0 AS BIGINT) AS sm,
                     [CAST(0 AS BIGINT)] AS slist
              FROM num WHERE rn = 1
              UNION ALL
              SELECT event_type, day, n, rn, lm1, bm1, sm1,
                     CASE WHEN len(slist) >= 7
                          THEN list_append(slist[2:], sm1)
                          ELSE list_append(slist, sm1) END
              FROM (
                SELECT event_type, day, n, rn, slist, lm1,
                       (x2 - ((x2 % 20 + 20) % 20)) // 20 AS bm1,
                       (x3 - ((x3 % 20 + 20) % 20)) // 20 AS sm1
                FROM (
                  SELECT *,
                         2 * (2 * (lm1 - lm0) + 8 * bm0) + 10 AS x2,
                         2 * (2 * (n * 1000000 - lm1) + 8 * s_lag) + 10 AS x3
                  FROM (
                    SELECT *,
                           (x1 - ((x1 % 20 + 20) % 20)) // 20 AS lm1
                    FROM (
                      SELECT *,
                             2 * (3 * (n * 1000000 - s_lag)
                               + 7 * (lm0 + bm0)) + 10 AS x1
                      FROM (
                        SELECT num.event_type, num.day, num.n, num.rn,
                               rec.lm AS lm0, rec.bm AS bm0, rec.slist,
                               CASE WHEN len(rec.slist) >= 7
                                    THEN rec.slist[1]
                                    ELSE CAST(0 AS BIGINT) END AS s_lag
                        FROM rec JOIN num
                          ON num.event_type = rec.event_type
                         AND num.rn = rec.rn + 1))))))
            SELECT event_type, day, n AS n_events,
                   CAST(lm AS DOUBLE) / CAST(1000000 AS DOUBLE) AS level,
                   CAST(bm AS DOUBLE) / CAST(1000000 AS DOUBLE) AS trend,
                   CAST(sm AS DOUBLE) / CAST(1000000 AS DOUBLE) AS seasonal
            FROM rec ORDER BY event_type, day"""))

  /** q179 — Markov stationary distribution
    * ([[graft.ops.Analytics.stationaryDistribution]], 3 power
    * iterations): where the q124 journey matrix's traffic ENDS UP,
    * with leaked mass (no-out-edge states, rounded under-sums)
    * redistributed uniformly — the pageRank dangling treatment. 9dp
    * per-iteration rounding; the oracle builds the same matrix and
    * unrolls all three steps. */
  private val q179 = Q("q179_stationary_distribution",
    (s, d) => {
      val trans = graft.ops.Analytics.eventTransitions(Tables.events(s, d),
        "user_id", "event_type", "ts", "event_id")
      graft.ops.Analytics.stationaryDistribution(trans, iters = 3)
        .orderBy("state")
    },
    Some("""WITH seq AS (SELECT user_id, event_type AS from_type,
                                lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type
                         FROM events),
            pc AS (SELECT from_type, to_type, count(*) AS n
                   FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
            t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
                  FROM pc GROUP BY 1),
            tr AS (SELECT pc.from_type AS src, pc.to_type AS dst,
                          round(pc.n / CAST(t.tot AS DOUBLE), 6) AS p
                   FROM pc JOIN t USING (from_type)),
            nodes AS (SELECT src AS state FROM tr UNION SELECT dst FROM tr),
            nn AS (SELECT count(*) AS n FROM nodes),
            om AS (SELECT src AS state, sum(p) AS outp FROM tr GROUP BY 1),
            p0 AS (SELECT state, round(CAST(1 AS DOUBLE) / n, 9) AS pi
                   FROM nodes, nn),
            f1 AS (SELECT tr.dst AS state, sum(p0.pi * tr.p) AS inp
                   FROM tr JOIN p0 ON tr.src = p0.state GROUP BY 1),
            l1 AS (SELECT sum(pi) - sum(pi * coalesce(outp, 0.0)) AS leak
                   FROM p0 LEFT JOIN om USING (state)),
            p1 AS (SELECT nodes.state,
                          round(coalesce(f1.inp, 0.0) + l1.leak / n, 9) AS pi
                   FROM nodes LEFT JOIN f1 USING (state), l1, nn),
            f2 AS (SELECT tr.dst AS state, sum(p1.pi * tr.p) AS inp
                   FROM tr JOIN p1 ON tr.src = p1.state GROUP BY 1),
            l2 AS (SELECT sum(pi) - sum(pi * coalesce(outp, 0.0)) AS leak
                   FROM p1 LEFT JOIN om USING (state)),
            p2 AS (SELECT nodes.state,
                          round(coalesce(f2.inp, 0.0) + l2.leak / n, 9) AS pi
                   FROM nodes LEFT JOIN f2 USING (state), l2, nn),
            f3 AS (SELECT tr.dst AS state, sum(p2.pi * tr.p) AS inp
                   FROM tr JOIN p2 ON tr.src = p2.state GROUP BY 1),
            l3 AS (SELECT sum(pi) - sum(pi * coalesce(outp, 0.0)) AS leak
                   FROM p2 LEFT JOIN om USING (state)),
            p3 AS (SELECT nodes.state,
                          round(coalesce(f3.inp, 0.0) + l3.leak / n, 9) AS pi
                   FROM nodes LEFT JOIN f3 USING (state), l3, nn)
            SELECT state, round(pi, 6) AS pi FROM p3 ORDER BY state"""))

  /** q180 — daily interval concurrency
    * ([[graft.ops.Analytics.concurrencyDaily]]): each user's active
    * window `[first event, last event + 1µs)` swept per day —
    * intervals touching the day plus the peak simultaneously open.
    * Exact integer sweep, day-partitioned (no global ordering); the
    * oracle replays coverage, carry-in, and the within-day running
    * max. */
  private val q180 = Q("q180_daily_concurrency",
    (s, d) => {
      val iv = Tables.events(s, d).groupBy("user_id")
        .agg(min("ts").as("s"),
          (max("ts") + expr("interval 1 microsecond")).as("e"))
      graft.ops.Analytics.concurrencyDaily(iv, col("s"), col("e"))
        .orderBy("day")
    },
    Some("""WITH iv AS (SELECT user_id, min(ts) AS s,
                               max(ts) + INTERVAL 1 MICROSECOND AS e
                        FROM events GROUP BY 1),
            cov AS (SELECT CAST(t.d AS DATE) AS day,
                           CASE WHEN CAST(s AS DATE) < CAST(t.d AS DATE)
                                THEN 1 ELSE 0 END AS before
                    FROM iv, unnest(generate_series(
                      CAST(CAST(s AS DATE) AS TIMESTAMP),
                      CAST(CAST(e - INTERVAL 1 MICROSECOND AS DATE)
                        AS TIMESTAMP),
                      INTERVAL 1 DAY)) AS t(d)),
            ca AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active,
                          CAST(sum(before) AS BIGINT) AS carry
                   FROM cov GROUP BY 1),
            del AS (SELECT CAST(ts_ AS DATE) AS day, ts_, dd
                    FROM (SELECT s AS ts_, 1 AS dd FROM iv
                          UNION ALL
                          SELECT e, -1 FROM iv)
                    WHERE NOT (dd = -1
                      AND ts_ = CAST(CAST(ts_ AS DATE) AS TIMESTAMP))),
            run AS (SELECT day, sum(dd) OVER (PARTITION BY day
                      ORDER BY ts_, dd ROWS UNBOUNDED PRECEDING) AS r
                    FROM del),
            pk AS (SELECT day, CAST(max(r) AS BIGINT) AS maxr
                   FROM run GROUP BY 1)
            SELECT ca.day, n_active,
                   carry + greatest(coalesce(maxr, 0), 0) AS peak
            FROM ca LEFT JOIN pk USING (day) ORDER BY day"""))

  /** q183 — difference-in-differences
    * ([[graft.operators.Stats.diffInDiff]]): md5-assigned groups,
    * pre/post 1995 — the observational contrast that cancels group
    * level and common trend. Four decimal-exact cells, one pinned
    * estimate. */
  private val q183 = Q("q183_diff_in_diff",
    (s, d) => graft.operators.Stats.diffInDiff(Tables.orders(s, d),
      pmod(graft.functions.TextFunctions.md5Long(
        concat(col("o_custkey").cast("string"), lit("|did"))), lit(2)) === 0,
      col("o_orderdate") >= lit("1995-01-01").cast("date"),
      round(col("o_totalprice") * 100, 0).cast("long")),
    Some("""WITH r AS (SELECT
                (CAST(('0x' || substr(md5(concat(CAST(o_custkey AS VARCHAR),
                   '|did')), 1, 15)) AS BIGINT) % 2 = 0) AS t,
                (o_orderdate >= DATE '1995-01-01') AS p,
                CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
              FROM orders
              WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
            a AS (SELECT
                CAST(sum(CASE WHEN t AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
                CAST(sum(CASE WHEN t AND p THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
                CAST(sum(CASE WHEN NOT t AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
                CAST(sum(CASE WHEN NOT t AND p THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post,
                sum(CASE WHEN t AND NOT p THEN v ELSE 0 END) AS s_t_pre,
                sum(CASE WHEN t AND p THEN v ELSE 0 END) AS s_t_post,
                sum(CASE WHEN NOT t AND NOT p THEN v ELSE 0 END) AS s_c_pre,
                sum(CASE WHEN NOT t AND p THEN v ELSE 0 END) AS s_c_post
              FROM r)
            SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
                   round(CAST(s_t_pre AS DOUBLE) / (CAST(n_t_pre AS DOUBLE) * 100.0), 6) AS mean_t_pre,
                   round(CAST(s_t_post AS DOUBLE) / (CAST(n_t_post AS DOUBLE) * 100.0), 6) AS mean_t_post,
                   round(CAST(s_c_pre AS DOUBLE) / (CAST(n_c_pre AS DOUBLE) * 100.0), 6) AS mean_c_pre,
                   round(CAST(s_c_post AS DOUBLE) / (CAST(n_c_post AS DOUBLE) * 100.0), 6) AS mean_c_post,
                   round((CAST(s_t_post AS DOUBLE) / (CAST(n_t_post AS DOUBLE) * 100.0)
                        - CAST(s_t_pre AS DOUBLE) / (CAST(n_t_pre AS DOUBLE) * 100.0))
                       - (CAST(s_c_post AS DOUBLE) / (CAST(n_c_post AS DOUBLE) * 100.0)
                        - CAST(s_c_pre AS DOUBLE) / (CAST(n_c_pre AS DOUBLE) * 100.0)), 6) AS did
            FROM a"""))

  /** q184 — CUPED variance reduction
    * ([[graft.operators.Stats.cuped]]): order value adjusted by the
    * customer's account balance; pooled θ from the closed form over
    * decimal-exact sums, per-arm adjusted means, the explained-
    * variance ratio. */
  private val q184 = Q("q184_cuped",
    (s, d) => {
      val joined = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
      graft.operators.Stats.cuped(joined,
          pmod(graft.functions.TextFunctions.md5Long(
            concat(col("o_custkey").cast("string"), lit("|cu"))), lit(2)),
          round(col("o_totalprice") * 100, 0).cast("long"),
          round(col("c_acctbal") * 100, 0).cast("long"))
        .orderBy("arm")
    },
    Some("""WITH r AS (SELECT
                CAST(('0x' || substr(md5(concat(CAST(o_custkey AS VARCHAR),
                  '|cu')), 1, 15)) AS BIGINT) % 2 AS arm,
                CAST(round(o_totalprice * 100, 0) AS BIGINT) AS y,
                CAST(round(c_acctbal * 100, 0) AS BIGINT) AS x
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE o_totalprice IS NOT NULL AND c_acctbal IS NOT NULL),
            p AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(x) AS DOUBLE) AS sx,
                         CAST(sum(y) AS DOUBLE) AS sy,
                         CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
                         CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
                         CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
                  FROM r),
            sc AS (SELECT n,
                          CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0.0
                               THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                                  / (CAST(n AS DOUBLE) * sxx - sx * sx) END
                            AS theta,
                          CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0.0
                                AND CAST(n AS DOUBLE) * syy - sy * sy > 0.0
                               THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                                  * (CAST(n AS DOUBLE) * sxy - sx * sy)
                                  / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                                   * (CAST(n AS DOUBLE) * syy - sy * sy)) END
                            AS rho2,
                          sx / CAST(n AS DOUBLE) AS xbar
                   FROM p),
            arms AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                            CAST(sum(y) AS DOUBLE) AS ay,
                            CAST(sum(x) AS DOUBLE) AS ax
                     FROM r GROUP BY 1)
            SELECT arm, arms.n,
                   round(ay / (CAST(arms.n AS DOUBLE) * 100.0), 6) AS mean_raw,
                   CASE WHEN theta IS NOT NULL THEN round(
                     (ay / CAST(arms.n AS DOUBLE)
                      - theta * (ax / CAST(arms.n AS DOUBLE) - xbar))
                     / 100.0, 6) END AS mean_adj,
                   round(theta, 6) AS theta,
                   round(rho2, 6) AS rho2
            FROM arms, sc ORDER BY arm"""))

  /** q185 — stratified treatment effect
    * ([[graft.operators.Stats.stratifiedEffect]]): a deliberately
    * CONFOUNDED assignment (treatment rate varies by market segment)
    * adjusted by exact subclassification; the ATT folds sequentially
    * over the stratum-sorted array, replayed by the oracle as a
    * recursive CTE. */
  private val q185 = Q("q185_stratified_effect",
    (s, d) => {
      val joined = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      graft.operators.Stats.stratifiedEffect(joined,
          pmod(graft.functions.TextFunctions.md5Long(
            concat(col("o_custkey").cast("string"), lit("|ps"))), lit(10)) <
            lit(3) + pmod(length(col("c_mktsegment")), lit(4)),
          round(col("o_totalprice") * 100, 0).cast("long"),
          col("c_mktsegment"))
        .orderBy("stratum")
    },
    Some("""WITH RECURSIVE r AS (SELECT
                (CAST(('0x' || substr(md5(concat(CAST(o_custkey AS VARCHAR),
                   '|ps')), 1, 15)) AS BIGINT) % 10
                 < 3 + length(c_mktsegment) % 4) AS t,
                CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
                c_mktsegment AS s
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE o_totalprice IS NOT NULL AND c_mktsegment IS NOT NULL),
            per AS (SELECT s AS stratum,
                           CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT)
                             AS n_t,
                           CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT)
                             AS n_c,
                           sum(CASE WHEN t THEN v ELSE 0 END) AS st,
                           sum(CASE WHEN t THEN 0 ELSE v END) AS sc
                    FROM r GROUP BY 1),
            sd AS (SELECT stratum, n_t, n_c,
                          CASE WHEN n_t > 0 AND n_c > 0 THEN
                            CAST(st AS DOUBLE) / (CAST(n_t AS DOUBLE) * 100.0)
                            - CAST(sc AS DOUBLE) / (CAST(n_c AS DOUBLE) * 100.0)
                          END AS diff,
                          st, sc
                   FROM per),
            nb AS (SELECT *, row_number() OVER (ORDER BY stratum) AS rn,
                          count(*) OVER () AS nd
                   FROM sd WHERE diff IS NOT NULL),
            rec AS (
              SELECT rn, nd, 0.0 + n_t * diff AS w,
                     CAST(n_t AS BIGINT) AS nt
              FROM nb WHERE rn = 1
              UNION ALL
              SELECT nb.rn, nb.nd, rec.w + nb.n_t * nb.diff,
                     rec.nt + nb.n_t
              FROM rec JOIN nb ON nb.rn = rec.rn + 1),
            att AS (SELECT CASE WHEN nt > 0 THEN w / nt END AS att
                    FROM rec WHERE rn = nd)
            SELECT stratum, n_t, n_c,
                   CASE WHEN n_t > 0 THEN round(CAST(st AS DOUBLE)
                     / (CAST(n_t AS DOUBLE) * 100.0), 6) END AS mean_t,
                   CASE WHEN n_c > 0 THEN round(CAST(sc AS DOUBLE)
                     / (CAST(n_c AS DOUBLE) * 100.0), 6) END AS mean_c,
                   CASE WHEN diff IS NOT NULL THEN round(diff, 6) END AS diff,
                   round(att, 6) AS att
            FROM sd, att ORDER BY stratum"""))

  /** q189 — interval-overlap join ([[graft.ops.IntervalJoin]]): which
    * user pairs were active simultaneously, and for how long. Per
    * (user, day) activity windows `[min ts, max ts + 1µs)` self-joined
    * on overlap via day-bucket blocking with first-shared-bucket
    * reporting (never a theta join, never a DISTINCT); the oracle runs
    * the direct inequality join — the hash match proves the blocked
    * plan computes exactly the theta-join semantics. Overlap mass is
    * exact integer microseconds. */
  private val q189 = Q("q189_interval_overlap_join",
    (s, d) => {
      val iv = Tables.events(s, d).filter(col("user_id") < 50)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(min("ts").as("s"),
          (max("ts") + expr("interval 1 microsecond")).as("e"))
      val a = iv.select(col("user_id").as("a_user"), col("s").as("a_s"),
        col("e").as("a_e"))
      val b = iv.select(col("user_id").as("b_user"), col("s").as("b_s"),
        col("e").as("b_e"))
      graft.ops.IntervalJoin.overlapJoin(a, col("a_s"), col("a_e"),
          b, col("b_s"), col("b_e"), widthUs = 86400000000L)
        .where(col("a_user") < col("b_user"))
        .groupBy("a_user", "b_user")
        .agg(count(lit(1)).as("n_overlaps"),
          sum(unix_micros(least(col("a_e"), col("b_e"))) -
            unix_micros(greatest(col("a_s"), col("b_s")))).as("overlap_us"))
        .orderBy("a_user", "b_user")
    },
    Some("""WITH iv AS (SELECT user_id, CAST(ts AS DATE) AS day,
                               min(ts) AS s,
                               max(ts) + INTERVAL 1 MICROSECOND AS e
                        FROM events WHERE user_id < 50 GROUP BY 1, 2)
            SELECT a.user_id AS a_user, b.user_id AS b_user,
                   CAST(count(*) AS BIGINT) AS n_overlaps,
                   CAST(sum(epoch_us(least(a.e, b.e))
                          - epoch_us(greatest(a.s, b.s))) AS BIGINT)
                     AS overlap_us
            FROM iv a JOIN iv b
              ON a.user_id < b.user_id AND a.s < b.e AND b.s < a.e
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  val all: Seq[Q] = Seq(q34, q35, q36, q37, q38, q39, q44, q45, q46, q57, q58,
    q70, q119, q120, q121, q122, q123, q124, q125, q128, q129, q130, q131,
    q132, q133, q135, q137, q138, q139, q140, q141, q142, q143, q144, q146,
    q151, q152, q153, q154, q155, q156, q157, q161, q163, q170, q171, q174,
    q175, q176, q179, q180, q183, q184, q185, q186, q187, q188, q189)

  /** q188 — two-group log-rank test
    * ([[graft.ops.Analytics.logRank]]): BUILDING vs MACHINERY
    * time-to-reorder — is q186's visual gap significant. Exact
    * integer risk sets; ΣE and ΣV fold sequentially over the
    * time-sorted terms (recursive-CTE replay); χ² ≥ 3.841 is the 5%
    * decision (no incomplete gamma by design). */
  private lazy val q188 = Q("q188_log_rank",
    (s, d) => {
      val po = Tables.orders(s, d)
        .withColumn("rn", row_number().over(Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")))
      val first = po.where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderdate").as("d1"))
      val second = po.where(col("rn") === 2)
        .select(col("o_custkey"), col("o_orderdate").as("d2"))
      val mx = Tables.orders(s, d).agg(max("o_orderdate").as("m"))
      val dur = first.join(second, Seq("o_custkey"), "left")
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .crossJoin(broadcast(mx))
        .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select((col("c_mktsegment") === "BUILDING").as("a"),
          when(col("d2").isNull, datediff(col("m"), col("d1")))
            .otherwise(datediff(col("d2"), col("d1"))).as("t"),
          col("d2").isNotNull.as("e"))
      graft.ops.Analytics.logRank(dur, col("a"), col("t"), col("e"))
    },
    Some("""WITH RECURSIVE po AS (
              SELECT o_custkey, o_orderdate,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS rn
              FROM orders),
            f AS (SELECT a.o_custkey, a.o_orderdate AS d1, b.o_orderdate AS d2
                  FROM po a LEFT JOIN po b
                    ON a.o_custkey = b.o_custkey AND b.rn = 2
                  WHERE a.rn = 1),
            mx AS (SELECT max(o_orderdate) AS m FROM orders),
            dur AS (SELECT (c_mktsegment = 'BUILDING') AS a,
                           CASE WHEN d2 IS NULL
                                THEN datediff('day', d1, m)
                                ELSE datediff('day', d1, d2) END AS t,
                           (d2 IS NOT NULL) AS e
                    FROM f JOIN customer ON f.o_custkey = c_custkey, mx
                    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
            g AS (SELECT t,
                         CAST(sum(CASE WHEN a AND e THEN 1 ELSE 0 END)
                           AS BIGINT) AS d1,
                         CAST(sum(CASE WHEN e THEN 1 ELSE 0 END)
                           AS BIGINT) AS d,
                         CAST(sum(CASE WHEN a THEN 1 ELSE 0 END)
                           AS BIGINT) AS l1,
                         count(*) AS l
                  FROM dur GROUP BY 1),
            tot AS (SELECT CAST(sum(l1) AS BIGINT) AS na,
                           CAST(sum(l - l1) AS BIGINT) AS nb
                    FROM g),
            wr AS (SELECT t, d1, d,
                          na - coalesce(CAST(sum(l1) OVER (ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS BIGINT), 0) AS n1,
                          na + nb - coalesce(CAST(sum(l) OVER (ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS BIGINT), 0) AS n
                   FROM g, tot),
            fl AS (SELECT * FROM wr WHERE d > 0 AND n > 1),
            nb2 AS (SELECT *, row_number() OVER (ORDER BY t) AS rn,
                           count(*) OVER () AS nd
                    FROM fl),
            rec AS (
              SELECT rn, nd,
                     0.0 + CAST(n1 AS DOUBLE) * d / n AS e,
                     0.0 + d * (CAST(n1 AS DOUBLE) / n)
                         * (1.0 - CAST(n1 AS DOUBLE) / n)
                         * (CAST(n - d AS DOUBLE) / (n - 1)) AS v
              FROM nb2 WHERE rn = 1
              UNION ALL
              SELECT nb2.rn, nb2.nd,
                     rec.e + CAST(nb2.n1 AS DOUBLE) * nb2.d / nb2.n,
                     rec.v + nb2.d * (CAST(nb2.n1 AS DOUBLE) / nb2.n)
                         * (1.0 - CAST(nb2.n1 AS DOUBLE) / nb2.n)
                         * (CAST(nb2.n - nb2.d AS DOUBLE) / (nb2.n - 1))
              FROM rec JOIN nb2 ON nb2.rn = rec.rn + 1),
            fin AS (SELECT e, v FROM rec WHERE rn = nd),
            oa AS (SELECT CAST(sum(d1) AS BIGINT) AS o_a FROM fl)
            SELECT na AS n_a, nb AS n_b, o_a,
                   round(e, 6) AS e_a, round(v, 6) AS var_a,
                   CASE WHEN v > 0.0 THEN round(
                     (CAST(o_a AS DOUBLE) - e) * (CAST(o_a AS DOUBLE) - e)
                       / v, 4) END AS chi2,
                   CASE WHEN v > 0.0 THEN round(
                     (CAST(o_a AS DOUBLE) - e) / sqrt(v), 4) END AS z
            FROM tot, oa, fin"""))

  /** q187 — the `spark.sql(...)` surface itself: temp views over the
    * warehouse tables and a TPC-H-Q5-shaped six-way join submitted
    * as RAW SQL TEXT — the API a SQL-first user of this library
    * writes, planned by Catalyst exactly like the DataFrame
    * graph (the one SQL dialect divergence, DATE literals, is
    * ANSI on both engines). Money sums follow the q01 rounding
    * convention. */
  private lazy val q187 = Q("q187_sql_surface",
    (s, d) => {
      Seq("region", "nation", "customer", "supplier", "orders", "lineitem")
        .foreach(t => Tables(s, d, t).createOrReplaceTempView(t))
      s.sql("""SELECT n_name,
                      round(sum(l_extendedprice * (1 - l_discount)), 2)
                        AS revenue,
                      count(*) AS n
               FROM customer
               JOIN orders ON c_custkey = o_custkey
               JOIN lineitem ON l_orderkey = o_orderkey
               JOIN supplier ON l_suppkey = s_suppkey
                            AND c_nationkey = s_nationkey
               JOIN nation ON s_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
               WHERE r_name = 'ASIA'
                 AND o_orderdate >= DATE '1994-01-01'
                 AND o_orderdate < DATE '1995-01-01'
               GROUP BY n_name
               ORDER BY revenue DESC, n_name""")
    },
    Some("""SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                     AS revenue,
                   count(*) AS n
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= DATE '1994-01-01'
              AND o_orderdate < DATE '1995-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name"""))

  /** q186 — Kaplan-Meier by segment
    * ([[graft.ops.Analytics.kaplanMeierBy]]): the q143 time-to-
    * reorder curves split by market segment — whose customers come
    * back faster. Same exact integer risk sets; the survival product
    * folds per group, replayed as a group-partitioned recursive
    * CTE. */
  private lazy val q186 = Q("q186_kaplan_meier_by",
    (s, d) => {
      val po = Tables.orders(s, d)
        .withColumn("rn", row_number().over(Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")))
      val first = po.where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderdate").as("d1"))
      val second = po.where(col("rn") === 2)
        .select(col("o_custkey"), col("o_orderdate").as("d2"))
      val mx = Tables.orders(s, d).agg(max("o_orderdate").as("m"))
      val dur = first.join(second, Seq("o_custkey"), "left")
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .crossJoin(broadcast(mx))
        .select(col("c_mktsegment").as("seg"),
          when(col("d2").isNull, datediff(col("m"), col("d1")))
            .otherwise(datediff(col("d2"), col("d1"))).as("t"),
          col("d2").isNotNull.as("e"))
      graft.ops.Analytics.kaplanMeierBy(dur, col("seg"), col("t"), col("e"))
        .orderBy("grp", "t")
    },
    Some("""WITH RECURSIVE po AS (
              SELECT o_custkey, o_orderdate,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS rn
              FROM orders),
            f AS (SELECT a.o_custkey, a.o_orderdate AS d1, b.o_orderdate AS d2
                  FROM po a LEFT JOIN po b
                    ON a.o_custkey = b.o_custkey AND b.rn = 2
                  WHERE a.rn = 1),
            mx AS (SELECT max(o_orderdate) AS m FROM orders),
            dur AS (SELECT c_mktsegment AS grp,
                           CASE WHEN d2 IS NULL
                                THEN datediff('day', d1, m)
                                ELSE datediff('day', d1, d2) END AS t,
                           (d2 IS NOT NULL) AS e
                    FROM f JOIN customer ON f.o_custkey = c_custkey, mx),
            g AS (SELECT grp, t,
                         CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT)
                           AS d,
                         count(*) AS l
                  FROM dur GROUP BY 1, 2),
            tot AS (SELECT grp, count(*) AS n FROM dur GROUP BY 1),
            nr AS (SELECT g.grp, t, d, l,
                          tot.n - coalesce(CAST(sum(l) OVER (
                              PARTITION BY g.grp ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS BIGINT), 0) AS n_risk,
                          row_number() OVER (PARTITION BY g.grp
                            ORDER BY t) AS rn
                   FROM g JOIN tot ON g.grp = tot.grp),
            rec AS (
              SELECT grp, t, d, l, n_risk, rn,
                     1.0 * (1.0 - CAST(d AS DOUBLE) / n_risk) AS s
              FROM nr WHERE rn = 1
              UNION ALL
              SELECT nr.grp, nr.t, nr.d, nr.l, nr.n_risk, nr.rn,
                     rec.s * (1.0 - CAST(nr.d AS DOUBLE) / nr.n_risk)
              FROM rec JOIN nr ON nr.grp = rec.grp AND nr.rn = rec.rn + 1)
            SELECT grp, t, n_risk, d AS n_events, l - d AS n_censored,
                   round(s, 6) AS survival
            FROM rec WHERE d > 0 ORDER BY grp, t"""))
}
