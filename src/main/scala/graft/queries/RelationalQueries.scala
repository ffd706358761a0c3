package graft.queries

import graft.{Q, Tables}
import graft.etl.Ids
import graft.ops.{Relational, Scd}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2) expressed over the driver
  * testdata, each with an equivalent DuckDB oracle.
  *
  * Determinism rules shared by query and oracle: explicit final ORDER
  * BY, doubles rounded, timestamps rendered "yyyy-MM-dd[ HH:mm:ss]",
  * derived integers widened to 64-bit on both engines.
  */
object RelationalQueries {

  /** q01 — grouped aggregation with derived measure (SURVEY A5/A6, F16;
    * shape of TPC-H Q1). Partial aggregation (map-side combine) keeps
    * the shuffle at |groups| rows regardless of input scale. */
  private val q01 = Q("q01_pricing_summary",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
            round(sum(l_quantity), 2) AS sum_qty,
            round(sum(l_extendedprice), 2) AS sum_base_price,
            round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
            round(avg(l_discount), 6) AS avg_disc,
            count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** q02 — filter + projection + top-K (SURVEY P1/P2, O1). The filter
    * and 4-column projection are pushed into the parquet scan; the sort
    * is a TakeOrderedAndProject (no full sort at scale). */
  private val q02 = Q("q02_filter_topk",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("l_extendedprice"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(100)
    },
    Some("""SELECT l_orderkey, l_linenumber,
            round(l_extendedprice, 2) AS l_extendedprice,
            strftime(l_shipdate, '%Y-%m-%d') AS ship_date
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_discount > 0.05
            ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
            LIMIT 100"""))

  /** q03 — dimension-enrichment left join chain (SURVEY J1): supplier →
    * nation → region. Both dims are tiny → broadcast-hash joins, zero
    * shuffle of the probe side. */
  private val q03 = Q("q03_dim_enrich",
    (s, d) => {
      Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"), "left")
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"), "left")
        .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation"),
          col("r_name").as("region"), round(col("s_acctbal"), 2).as("s_acctbal"))
        .orderBy("s_suppkey")
    },
    Some("""SELECT s_suppkey, s_name, n_name AS nation, r_name AS region,
            round(s_acctbal, 2) AS s_acctbal
            FROM supplier
            LEFT JOIN nation ON s_nationkey = n_nationkey
            LEFT JOIN region ON n_regionkey = r_regionkey
            ORDER BY s_suppkey"""))

  /** q04 — multi-way star join + aggregation (SURVEY J4): fact ⋈ 4 dims.
    * customer/nation/region broadcast; the lineitem⋈orders join shuffles
    * on orderkey once. */
  private val q04 = Q("q04_star_revenue",
    (s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("region", "nation")
    },
    Some("""SELECT r_name AS region, n_name AS nation,
            round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
            count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q05 — anti join (SURVEY J3): customers with no large order
    * (>250k), per segment. */
  private val q05 = Q("q05_anti_join",
    (s, d) => {
      val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 250000.0)
      Tables.customer(s, d)
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers_no_big_orders"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n_customers_no_big_orders
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 250000.0)
            GROUP BY 1 ORDER BY 1"""))

  /** q06 — semi join (SURVEY P4): orders having at least one returned
    * line, counted per status. */
  private val q06 = Q("q06_semi_join",
    (s, d) => {
      val returned = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      Tables.orders(s, d)
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders_with_returns"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, count(*) AS n_orders_with_returns
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
            GROUP BY 1 ORDER BY 1"""))

  /** q07 — ROW_NUMBER latest-per-key dedup (SURVEY W1): each customer's
    * most recent order. Single shuffle on the partition key. */
  private val q07 = Q("q07_latest_per_key",
    (s, d) => {
      Relational.latestPerKey(Tables.orders(s, d), Seq("o_custkey"),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_date"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
            strftime(o_orderdate, '%Y-%m-%d') AS latest_date,
            round(o_totalprice, 2) AS o_totalprice
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                  FROM orders)
            WHERE rn = 1 ORDER BY o_custkey"""))

  /** q08 — mode (most frequent) per group (SURVEY A1): dominant order
    * priority per market segment, tie-break value-asc (pinned; the
    * reference's pandas tie order is nondeterministic). */
  private val q08 = Q("q08_mode_per_group",
    (s, d) => {
      val joined = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      Relational.modePerGroup(joined, Seq("c_mktsegment"), "o_orderpriority", "mode_priority")
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, o_orderpriority AS mode_priority, cnt
            FROM (SELECT c_mktsegment, o_orderpriority, count(*) AS cnt,
                         row_number() OVER (PARTITION BY c_mktsegment
                           ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
                  FROM orders JOIN customer ON o_custkey = c_custkey
                  GROUP BY c_mktsegment, o_orderpriority)
            WHERE rn = 1 ORDER BY c_mktsegment"""))

  /** q09 — distinct dedup + first-match lookup (SURVEY A3, J10, A4):
    * distinct (brand, type) pairs, then per brand the type count and
    * lexicographically-first type. */
  private val q09 = Q("q09_distinct_dedup",
    (s, d) => {
      Tables.part(s, d)
        .select("p_brand", "p_type").dropDuplicates()
        .groupBy("p_brand")
        .agg(countDistinct("p_type").as("n_types"), min("p_type").as("first_type"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand, count(DISTINCT p_type) AS n_types, min(p_type) AS first_type
            FROM (SELECT DISTINCT p_brand, p_type FROM part)
            GROUP BY 1 ORDER BY 1"""))

  /** q10 — top-K aggregate (SURVEY O1/A5): 10 biggest customers by
    * order value. */
  private val q10 = Q("q10_top_customers",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(round(sum("o_totalprice"), 2).as("total_spend"), count(lit(1)).as("n_orders"))
        .orderBy(col("total_spend").desc, col("o_custkey").asc)
        .limit(10)
    },
    Some("""SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend,
            count(*) AS n_orders
            FROM orders GROUP BY 1
            ORDER BY total_spend DESC, o_custkey ASC LIMIT 10"""))

  /** q11 — set union + distinct (SURVEY A9): all distinct activity
    * dates across two tables. */
  private val q11 = Q("q11_union_dates",
    (s, d) => {
      Tables.orders(s, d).select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
        .union(Tables.lineitem(s, d).select(date_format(col("l_shipdate"), "yyyy-MM-dd").as("d")))
        .distinct()
        .orderBy("d")
    },
    Some("""SELECT DISTINCT strftime(t, '%Y-%m-%d') AS d
            FROM (SELECT o_orderdate AS t FROM orders
                  UNION ALL SELECT l_shipdate FROM lineitem)
            ORDER BY d"""))

  /** q12 — calendar attribute derivation (SURVEY F2/F4/F5): date_id,
    * year/quarter/month, weekend flag; aggregated per year × quarter.
    * Spark dayofweek: 1=Sun..7=Sat; DuckDB dayofweek: 0=Sun..6=Sat. */
  private val q12 = Q("q12_calendar_attrs",
    (s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderdate").as("t"))
        .withColumn("yr", year(col("t")).cast("long"))
        .withColumn("qtr", quarter(col("t")).cast("long"))
        .withColumn("date_id",
          (year(col("t")) * 10000 + month(col("t")) * 100 + dayofmonth(col("t"))).cast("long"))
        .withColumn("is_weekend", dayofweek(col("t")).isin(1, 7))
        .groupBy("yr", "qtr")
        .agg(count(lit(1)).as("n"),
          count(when(col("is_weekend"), 1)).as("n_weekend"),
          min("date_id").as("min_date_id"), max("date_id").as("max_date_id"))
        .orderBy("yr", "qtr")
    },
    Some("""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
            CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
            count(*) AS n,
            count(CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN 1 END) AS n_weekend,
            min(CAST(EXTRACT(YEAR FROM o_orderdate) * 10000
                + EXTRACT(MONTH FROM o_orderdate) * 100
                + EXTRACT(DAY FROM o_orderdate) AS BIGINT)) AS min_date_id,
            max(CAST(EXTRACT(YEAR FROM o_orderdate) * 10000
                + EXTRACT(MONTH FROM o_orderdate) * 100
                + EXTRACT(DAY FROM o_orderdate) AS BIGINT)) AS max_date_id
            FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q13 — deterministic MD5 business keys (SURVEY F1): the reference's
    * `PREFIX_ + md5(natural key)[:14]` scheme (etl_ods_loader.py:91-170),
    * pure codegen'd expressions. */
  private val q13 = Q("q13_md5_keys",
    (s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          concat(lit("CUST_"), substring(md5(col("c_name")), 1, 14)).as("business_key"),
          concat(lit("SEG_"), substring(md5(concat_ws("_", col("c_mktsegment"), col("c_nationkey"))), 1, 14)).as("segment_key"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey,
            'CUST_' || substr(md5(c_name), 1, 14) AS business_key,
            'SEG_' || substr(md5(c_mktsegment || '_' || c_nationkey), 1, 14) AS segment_key
            FROM customer ORDER BY c_custkey"""))

  /** q14 — CASE/WHEN bucketization (SURVEY F7/F12): the reference's
    * price-tier ladder applied to part retail prices. */
  private val q14 = Q("q14_price_tiers",
    (s, d) => {
      Tables.part(s, d)
        .withColumn("price_tier",
          when(col("p_retailprice") < 925, "Low")
            .when(col("p_retailprice") < 950, "Medium")
            .when(col("p_retailprice") < 975, "High")
            .otherwise("Premium"))
        .groupBy("price_tier")
        .agg(count(lit(1)).as("n"), round(avg("p_retailprice"), 2).as("avg_price"))
        .orderBy("price_tier")
    },
    Some("""SELECT CASE WHEN p_retailprice < 925 THEN 'Low'
                        WHEN p_retailprice < 950 THEN 'Medium'
                        WHEN p_retailprice < 975 THEN 'High'
                        ELSE 'Premium' END AS price_tier,
            count(*) AS n, round(avg(p_retailprice), 2) AS avg_price
            FROM part GROUP BY 1 ORDER BY 1"""))

  /** q15 — null-default coalescing + conditional aggregation (SURVEY
    * F9, A5/P6) over the events table. */
  private val q15 = Q("q15_event_rollup",
    (s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          round(sum(coalesce(col("value"), lit(0.0))), 2).as("total_value"),
          count(when(col("value") > 50, 1)).as("n_high"),
          countDistinct("user_id").as("n_users"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
            round(sum(coalesce(value, 0)), 2) AS total_value,
            count(CASE WHEN value > 50 THEN 1 END) AS n_high,
            count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** q16 — data-quality ratio checks (SURVEY P6/A5): the reference's
    * verification percentages as a single-row audit. */
  private val q16 = Q("q16_quality_ratios",
    (s, d) => {
      Tables.lineitem(s, d)
        .agg(
          count(lit(1)).as("n_rows"),
          round(avg(when(col("l_returnflag") === "R", 1.0).otherwise(0.0)) * 100, 4).as("pct_returned"),
          round(avg(when(col("l_discount") > 0, 1.0).otherwise(0.0)) * 100, 4).as("pct_discounted"),
          round(avg(when(col("l_tax") === 0, 1.0).otherwise(0.0)) * 100, 4).as("pct_tax_free"))
    },
    Some("""SELECT count(*) AS n_rows,
            round(avg(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) * 100, 4) AS pct_returned,
            round(avg(CASE WHEN l_discount > 0 THEN 1.0 ELSE 0.0 END) * 100, 4) AS pct_discounted,
            round(avg(CASE WHEN l_tax = 0 THEN 1.0 ELSE 0.0 END) * 100, 4) AS pct_tax_free
            FROM lineitem"""))

  /** q17 — min/max + month-span (SURVEY A8), computed as
    * year*12+month arithmetic to keep both engines' semantics identical. */
  private val q17 = Q("q17_date_span",
    (s, d) => {
      Tables.orders(s, d).agg(
        date_format(min("o_orderdate"), "yyyy-MM-dd").as("min_date"),
        date_format(max("o_orderdate"), "yyyy-MM-dd").as("max_date"),
        ((year(max(col("o_orderdate"))) * 12 + month(max(col("o_orderdate")))) -
          (year(min(col("o_orderdate"))) * 12 + month(min(col("o_orderdate"))))).cast("long").as("month_span"))
    },
    Some("""SELECT strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
            strftime(max(o_orderdate), '%Y-%m-%d') AS max_date,
            CAST((EXTRACT(YEAR FROM max(o_orderdate)) * 12 + EXTRACT(MONTH FROM max(o_orderdate)))
               - (EXTRACT(YEAR FROM min(o_orderdate)) * 12 + EXTRACT(MONTH FROM min(o_orderdate))) AS BIGINT) AS month_span
            FROM orders"""))

  /** q18 — equi + range (interval) join (SURVEY J5): lines shipped
    * within 90 days of their order date. The equi key carries the join;
    * the range is a residual filter, so no cross product. */
  private val q18 = Q("q18_range_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey") &&
          li("l_shipdate") >= o("o_orderdate") &&
          li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAY"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_shipped_90d"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_shipped_90d
            FROM lineitem JOIN orders
              ON l_orderkey = o_orderkey
             AND l_shipdate >= o_orderdate
             AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
            GROUP BY 1 ORDER BY 1"""))

  /** q19 — join on a derived expression (SURVEY J7): the reference's
    * `year*10000+month*100+day = date_id` join rebuilt from testdata. */
  private val q19 = Q("q19_derived_key_join",
    (s, d) => {
      val dateDim = Tables.orders(s, d)
        .select(to_date(col("o_orderdate")).as("dt")).distinct()
        .select((year(col("dt")) * 10000 + month(col("dt")) * 100 + dayofmonth(col("dt"))).cast("long").as("date_id"))
      val li = Tables.lineitem(s, d)
        .withColumn("ship_date_id",
          (year(col("l_shipdate")) * 10000 + month(col("l_shipdate")) * 100 + dayofmonth(col("l_shipdate"))).cast("long"))
      li.join(dateDim, li("ship_date_id") === dateDim("date_id"))
        .groupBy(floor(col("date_id") / 10000).as("yr"))
        .agg(count(lit(1)).as("n_lines_on_order_dates"))
        .orderBy("yr")
    },
    Some("""WITH date_dim AS (
              SELECT DISTINCT CAST(EXTRACT(YEAR FROM o_orderdate) * 10000
                   + EXTRACT(MONTH FROM o_orderdate) * 100
                   + EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS date_id
              FROM orders)
            SELECT CAST(floor(date_id / 10000) AS BIGINT) AS yr,
                   count(*) AS n_lines_on_order_dates
            FROM lineitem JOIN date_dim
              ON CAST(EXTRACT(YEAR FROM l_shipdate) * 10000
                   + EXTRACT(MONTH FROM l_shipdate) * 100
                   + EXTRACT(DAY FROM l_shipdate) AS BIGINT) = date_id
            GROUP BY 1 ORDER BY 1"""))

  /** q20 — self-join on a per-group aggregate (SURVEY J6): each
    * customer's maximum-value order. */
  private val q20 = Q("q20_self_join_max",
    (s, d) => {
      val o = Tables.orders(s, d)
      val mx = o.groupBy(col("o_custkey").as("ck")).agg(max("o_totalprice").as("max_price"))
      o.join(mx, o("o_custkey") === mx("ck") && o("o_totalprice") === mx("max_price"))
        .groupBy("o_custkey")
        .agg(round(max("o_totalprice"), 2).as("max_price"), min("o_orderkey").as("best_orderkey"))
        .orderBy("o_custkey")
    },
    Some("""SELECT o.o_custkey, round(max(o.o_totalprice), 2) AS max_price,
                   min(o.o_orderkey) AS best_orderkey
            FROM orders o
            JOIN (SELECT o_custkey AS ck, max(o_totalprice) AS mp
                  FROM orders GROUP BY 1) m
              ON o.o_custkey = m.ck AND o.o_totalprice = m.mp
            GROUP BY 1 ORDER BY 1"""))

  /** q21 — SCD Type-1 MERGE rewrite (SURVEY J8): upsert a source batch
    * into a target dimension (anti-join survivors ∪ source), summarised
    * per segment. */
  private val q21 = Q("q21_merge_type1",
    (s, d) => {
      val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment", "c_acctbal")
      val target = c.filter(col("c_custkey") % 3 =!= 0)
      val source = c.filter(col("c_custkey") % 2 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      Relational.mergeType1(target, source, Seq("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("total_bal"))
        .orderBy("c_mktsegment")
    },
    Some("""WITH tgt AS (SELECT c_custkey, c_mktsegment, c_acctbal
                         FROM customer WHERE c_custkey % 3 <> 0),
                 src AS (SELECT c_custkey, c_mktsegment, c_acctbal + 100.0 AS c_acctbal
                         FROM customer WHERE c_custkey % 2 = 0),
                 merged AS (SELECT * FROM src
                            UNION ALL
                            SELECT t.* FROM tgt t
                            WHERE NOT EXISTS (SELECT 1 FROM src s
                                              WHERE s.c_custkey = t.c_custkey))
            SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
            FROM merged GROUP BY 1 ORDER BY 1"""))

  /** q22 — SCD Type-2 apply (SURVEY J9/F19/F20): expire changed rows at
    * runDate−1, insert version+1 effective runDate; summarised by
    * (version, is_current). */
  private val q22 = Q("q22_scd2_apply",
    (s, d) => {
      val c = Tables.customer(s, d).select("c_custkey", "c_acctbal")
      val dim = Scd.initial(c)
      val updates = c.filter(col("c_custkey") % 5 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 50.0)
      Scd.applyChanges(dim, updates, Seq("c_custkey"), Seq("c_acctbal"), "2024-06-01")
        .groupBy("version", "is_current")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("total_bal"),
          date_format(min("effective_date"), "yyyy-MM-dd").as("min_effective"),
          date_format(max("expiry_date"), "yyyy-MM-dd").as("max_expiry"))
        .orderBy("version", "is_current")
    },
    Some("""WITH dim AS (SELECT c_custkey, c_acctbal, CAST(1 AS BIGINT) AS version,
                                DATE '2000-01-01' AS effective_date,
                                DATE '9999-12-31' AS expiry_date, TRUE AS is_current
                         FROM customer),
                 upd AS (SELECT c_custkey, c_acctbal + 50.0 AS c_acctbal
                         FROM customer WHERE c_custkey % 5 = 0),
                 chg AS (SELECT d.c_custkey AS k, u.c_acctbal AS new_bal, d.version AS v
                         FROM dim d JOIN upd u ON d.c_custkey = u.c_custkey
                         WHERE d.is_current AND d.c_acctbal <> u.c_acctbal),
                 unchanged AS (SELECT * FROM dim d
                               WHERE NOT EXISTS (SELECT 1 FROM chg c WHERE c.k = d.c_custkey)),
                 expired AS (SELECT d.c_custkey, d.c_acctbal, d.version, d.effective_date,
                                    DATE '2024-05-31' AS expiry_date, FALSE AS is_current
                             FROM dim d JOIN chg c ON d.c_custkey = c.k),
                 newver AS (SELECT k AS c_custkey, new_bal AS c_acctbal, v + 1 AS version,
                                   DATE '2024-06-01' AS effective_date,
                                   DATE '9999-12-31' AS expiry_date, TRUE AS is_current
                            FROM chg),
                 result AS (SELECT * FROM unchanged UNION ALL
                            SELECT * FROM expired UNION ALL
                            SELECT * FROM newver)
            SELECT version, is_current, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal,
                   strftime(min(effective_date), '%Y-%m-%d') AS min_effective,
                   strftime(max(expiry_date), '%Y-%m-%d') AS max_expiry
            FROM result GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q23 — referential-integrity audit suite (SURVEY J3): orphan counts
    * for every fact→dim edge, as one small report. The three lineitem
    * edges share ONE scan: left joins mark key presence (dim key sets
    * broadcast; the orders side shuffles once — it is not a dim), and a
    * single aggregate folds the three orphan counts, unpivoted back to
    * report rows. At 100 TB this is the difference between one pass
    * over the fact table and three. */
  private val q23 = Q("q23_integrity_audit",
    (s, d) => {
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey", "l_suppkey")
      val ordK = Tables.orders(s, d).select("o_orderkey").distinct()
        .withColumn("__has_o", lit(1))
      val partK = broadcast(Tables.part(s, d).select("p_partkey").distinct()
        .withColumn("__has_p", lit(1)))
      val suppK = broadcast(Tables.supplier(s, d).select("s_suppkey").distinct()
        .withColumn("__has_s", lit(1)))
      val liCounts = li
        .join(ordK, col("l_orderkey") === col("o_orderkey"), "left")
        .join(partK, col("l_partkey") === col("p_partkey"), "left")
        .join(suppK, col("l_suppkey") === col("s_suppkey"), "left")
        .agg(
          sum(when(col("__has_o").isNull, 1).otherwise(0)).as("lineitem_orders"),
          sum(when(col("__has_p").isNull, 1).otherwise(0)).as("lineitem_part"),
          sum(when(col("__has_s").isNull, 1).otherwise(0)).as("lineitem_supplier"))
        .select(explode(array(
          struct(lit("lineitem_orders").as("check_name"), col("lineitem_orders").as("orphans")),
          struct(lit("lineitem_part").as("check_name"), col("lineitem_part").as("orphans")),
          struct(lit("lineitem_supplier").as("check_name"), col("lineitem_supplier").as("orphans")))))
        .select("col.*")
      def check(name: String, fact: org.apache.spark.sql.DataFrame,
          dim: org.apache.spark.sql.DataFrame, fk: String, dk: String) =
        Relational.orphanCount(fact, dim, fk, dk)
          .select(lit(name).as("check_name"), col("orphans"))
      liCounts
        .unionByName(check("orders_customer", Tables.orders(s, d), Tables.customer(s, d), "o_custkey", "c_custkey"))
        .unionByName(check("customer_nation", Tables.customer(s, d), Tables.nation(s, d), "c_nationkey", "n_nationkey"))
        .orderBy("check_name")
    },
    Some("""SELECT * FROM (
              SELECT 'lineitem_orders' AS check_name,
                     (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                       (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS orphans
              UNION ALL SELECT 'lineitem_part',
                     (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                       (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
              UNION ALL SELECT 'lineitem_supplier',
                     (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                       (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
              UNION ALL SELECT 'orders_customer',
                     (SELECT count(*) FROM orders o WHERE NOT EXISTS
                       (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
              UNION ALL SELECT 'customer_nation',
                     (SELECT count(*) FROM customer c WHERE NOT EXISTS
                       (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
            ) ORDER BY check_name"""))

  /** q24 — point-in-time SCD2 range-join (SURVEY J5 proper): facts
    * resolved against the dimension version valid on the fact date.
    * Dimension versions built deterministically: customers with even
    * key get a second version effective 1996-01-01. */
  private val q24 = Q("q24_point_in_time",
    (s, d) => {
      val c = Tables.customer(s, d).select("c_custkey", "c_acctbal")
      val v1 = c.withColumn("version", lit(1L))
        .withColumn("effective_date", to_date(lit("1990-01-01")))
        .withColumn("expiry_date",
          when(col("c_custkey") % 2 === 0, to_date(lit("1995-12-31"))).otherwise(to_date(lit("9999-12-31"))))
      val v2 = c.filter(col("c_custkey") % 2 === 0)
        .withColumn("c_acctbal", col("c_acctbal") * 2)
        .withColumn("version", lit(2L))
        .withColumn("effective_date", to_date(lit("1996-01-01")))
        .withColumn("expiry_date", to_date(lit("9999-12-31")))
      val dim = v1.unionByName(v2)
      val o = Tables.orders(s, d)
      o.join(dim, o("o_custkey") === dim("c_custkey") &&
          to_date(o("o_orderdate")) >= dim("effective_date") &&
          to_date(o("o_orderdate")) <= dim("expiry_date"))
        .groupBy("version")
        .agg(count(lit(1)).as("n_orders"), round(sum("c_acctbal"), 2).as("sum_bal"))
        .orderBy("version")
    },
    Some("""WITH dim AS (
              SELECT c_custkey, c_acctbal, CAST(1 AS BIGINT) AS version,
                     DATE '1990-01-01' AS effective_date,
                     CASE WHEN c_custkey % 2 = 0 THEN DATE '1995-12-31'
                          ELSE DATE '9999-12-31' END AS expiry_date
              FROM customer
              UNION ALL
              SELECT c_custkey, c_acctbal * 2, CAST(2 AS BIGINT),
                     DATE '1996-01-01', DATE '9999-12-31'
              FROM customer WHERE c_custkey % 2 = 0)
            SELECT version, count(*) AS n_orders, round(sum(c_acctbal), 2) AS sum_bal
            FROM orders JOIN dim
              ON o_custkey = c_custkey
             AND CAST(o_orderdate AS DATE) >= effective_date
             AND CAST(o_orderdate AS DATE) <= expiry_date
            GROUP BY 1 ORDER BY 1"""))

  /** q48 — the F21/F22 md5-mod family under the oracle gate: exact
    * `int(md5(x), 16) % n` over the FULL 128-bit digest
    * ([[graft.functions.Md5ModExpr]], the reference's deterministic
    * pseudo-random primitive), with both a literal modulus and the
    * per-row-modulus form (the supplier-pick site's shape). The oracle
    * Horner-folds four 32-bit digest chunks mod n in BIGINT — every
    * intermediate < n·2^32 — so a 64-bit-truncating implementation
    * (2^64 mod n ≠ 1) would hash-mismatch immediately. */
  private val q48 = Q("q48_md5_mod_residues",
    (s, d) => {
      val c = Tables.customer(s, d)
      c.select(Ids.md5Mod(col("c_name"), 97).as("residue"),
          Ids.md5ModBy(col("c_name"), pmod(col("c_custkey"), lit(11)) + 2).as("r2"))
        .groupBy("residue")
        .agg(count(lit(1)).as("n"), sum("r2").as("sum_r2"))
        .orderBy("residue")
    },
    Some("""WITH h AS (
              SELECT CAST('0x' || substr(md5(c_name), 1, 8) AS BIGINT) AS h1,
                     CAST('0x' || substr(md5(c_name), 9, 8) AS BIGINT) AS h2,
                     CAST('0x' || substr(md5(c_name), 17, 8) AS BIGINT) AS h3,
                     CAST('0x' || substr(md5(c_name), 25, 8) AS BIGINT) AS h4,
                     2 + c_custkey % 11 AS m
              FROM customer),
            r AS (
              SELECT ((((h1 % 97) * 4294967296 + h2) % 97 * 4294967296 + h3) % 97
                      * 4294967296 + h4) % 97 AS residue,
                     ((((h1 % m) * 4294967296 + h2) % m * 4294967296 + h3) % m
                      * 4294967296 + h4) % m AS r2
              FROM h)
            SELECT residue, count(*) AS n, CAST(sum(r2) AS BIGINT) AS sum_r2
            FROM r GROUP BY 1 ORDER BY 1"""))

  /** q64 — per-group z-score outlier flags
    * ([[graft.operators.Quality.zScoreOutliers]]): group stats in one
    * pass, broadcast back, flags rolled up — the anomaly gate a batch
    * pipeline runs alongside its null profile. */
  private val q64 = Q("q64_zscore_outliers",
    (s, d) => {
      graft.operators.Quality.zScoreOutliers(Tables.lineitem(s, d),
          Seq("l_returnflag"), "l_extendedprice", sigma = 2.0)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_outlier"), 1).otherwise(0)).as("n_outliers"))
        .orderBy("l_returnflag")
    },
    Some("""WITH stats AS (
              SELECT l_returnflag, avg(l_extendedprice) AS mu,
                     stddev_samp(l_extendedprice) AS sd
              FROM lineitem GROUP BY 1)
            SELECT l.l_returnflag, count(*) AS n,
                   CAST(sum(CASE WHEN sd > 0 AND abs(l_extendedprice - mu) > sd * 2.0
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM lineitem l JOIN stats USING (l_returnflag)
            GROUP BY 1 ORDER BY 1"""))

  /** q65 — snapshot diff ([[graft.ops.Relational.snapshotDiff]]): the
    * CDC primitive between two table states — inserts/deletes planted
    * by re-keying, updates by value mutation; null-safe column compare
    * so NULL↔value transitions count as changes. */
  private val q65 = Q("q65_snapshot_diff",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val newC = cust.where(col("c_custkey") % 10 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100)
            .otherwise(col("c_acctbal")))
        .unionByName(cust.where(col("c_custkey") <= 50)
          .withColumn("c_custkey", col("c_custkey") + 900000))
      Relational.snapshotDiff(cust, newC, Seq("c_custkey"),
          Seq("c_acctbal", "c_mktsegment"))
        .groupBy("op")
        .agg(count(lit(1)).as("n"), sum("c_custkey").as("sum_keys"))
        .orderBy("op")
    },
    Some("""WITH old AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
            new AS (
              SELECT c_custkey,
                     CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100
                          ELSE c_acctbal END AS c_acctbal,
                     c_mktsegment
              FROM customer WHERE c_custkey % 10 <> 0
              UNION ALL
              SELECT c_custkey + 900000, c_acctbal, c_mktsegment
              FROM customer WHERE c_custkey <= 50),
            d AS (SELECT coalesce(n.c_custkey, o.c_custkey) AS k,
                         CASE WHEN o.c_custkey IS NULL THEN 'I'
                              WHEN n.c_custkey IS NULL THEN 'D'
                              WHEN NOT (o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal)
                                OR NOT (o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment)
                              THEN 'U' END AS op
                  FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey)
            SELECT op, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_keys
            FROM d WHERE op IS NOT NULL GROUP BY 1 ORDER BY 1"""))

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24,
    q48, q64, q65)
}
