package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's post-load verification, promoted from print-audits
  * to computed values a test can assert on.
  *
  *  - ODS checks (etl_ods_loader.py:891-1018): per-table counts, the 8
  *    referential-integrity anti-join orphan counts, volume floors
  *    (≥5000 sales, ≥1000 products, ≥100 stores), distinct inventory
  *    snapshot days, returns month span.
  *  - Staging checks (etl_staging_loader.py:1315-1383): counts plus the
  *    business-ratio spot checks (% high margin, % profitable, %
  *    returns within 30 days, % out of stock).
  */
object EtlChecks {

  /** The 8 orphan counts — all must be 0 on a healthy load. Folded
    * into one pass per fact table (the q23 presence-marker pattern):
    * each fact left-joins its deduped dim key sets (dims broadcast;
    * the one fact→fact edge, returns→sales, shuffles) and a single
    * aggregate per fact yields all its orphan counts; the four
    * per-fact reports union into one frame collected in ONE action.
    * At 100 TB this is one scan of each fact instead of one per edge
    * (ods_sales: 1 vs 4; 8 separate anti-join jobs before). */
  def odsOrphans(t: OdsLayer.Tables): Map[String, Long] = {
    def keys(dim: DataFrame, key: String, as: String, flag: String): DataFrame =
      broadcast(dim.select(col(key).as(as)).distinct().withColumn(flag, lit(1)))
    def orphans(flag: String): Column =
      // coalesce: sum over an EMPTY fact is NULL, and the collect
      // would NPE where the old anti-join count reported 0
      coalesce(sum(when(col(flag).isNull, 1).otherwise(0)), lit(0L))
    def melt(agg: DataFrame, names: Seq[String]): DataFrame =
      agg.select(explode(array(names.map(n =>
          struct(lit(n).as("check_name"), col(n).as("orphans"))): _*)))
        .select("col.*")

    val salesChecks = melt(
      t.sales
        .join(keys(t.product, "product_id", "__pid", "__has_p"),
          col("product_id") === col("__pid"), "left")
        .join(keys(t.store, "store_id", "__sid", "__has_st"),
          col("store_id") === col("__sid"), "left")
        .join(keys(t.customer, "customer_id", "__cid", "__has_c"),
          col("customer_id") === col("__cid"), "left")
        .join(keys(t.date, "full_date", "__fd", "__has_d"),
          col("transaction_date") === col("__fd"), "left")
        .agg(orphans("__has_p").as("sales_without_product"),
          orphans("__has_st").as("sales_without_store"),
          orphans("__has_c").as("sales_without_customer"),
          orphans("__has_d").as("sales_without_date")),
      Seq("sales_without_product", "sales_without_store",
        "sales_without_customer", "sales_without_date"))

    val returnsChecks = melt(
      t.returns
        .join(t.sales.select(col("sale_id").as("__said")).distinct()
            .withColumn("__has_s", lit(1)),
          col("original_sale_id") === col("__said"), "left")
        .join(keys(t.returnReason, "reason_code", "__rc", "__has_r"),
          col("reason_code") === col("__rc"), "left")
        .agg(orphans("__has_s").as("returns_without_sale"),
          orphans("__has_r").as("returns_without_reason")),
      Seq("returns_without_sale", "returns_without_reason"))

    val productChecks = melt(
      t.product
        .join(keys(t.supplier, "supplier_id", "__supid", "__has_sup"),
          col("supplier_id") === col("__supid"), "left")
        .agg(orphans("__has_sup").as("products_without_supplier")),
      Seq("products_without_supplier"))

    val inventoryChecks = melt(
      t.inventory
        .join(keys(t.product, "product_id", "__ipid", "__has_ip"),
          col("product_id") === col("__ipid"), "left")
        .agg(orphans("__has_ip").as("inventory_without_product")),
      Seq("inventory_without_product"))

    salesChecks.unionByName(returnsChecks).unionByName(productChecks)
      .unionByName(inventoryChecks)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Volume floors + span checks (etl_ods_loader.py:984-1018).
    * Aggregates coalesce to 0 so an empty table reports zero instead
    * of NPE-ing the audit (months_between over no rows is NULL). */
  def odsVolumes(t: OdsLayer.Tables): Map[String, Long] = Map(
    "sales_rows" -> t.sales.count(),
    "product_rows" -> t.product.count(),
    "store_rows" -> t.store.count(),
    "inventory_snapshot_days" -> t.inventory.select(countDistinct("inventory_date"))
      .first().getLong(0),
    "returns_month_span" -> t.returns
      .agg(coalesce(months_between(max("return_date"), min("return_date"))
        .cast("long"), lit(0L)))
      .first().getLong(0))

  /** Staging business ratios, in percent (etl_staging_loader.py:1352-1381).
    * An empty table reports 0.0 (the division is NULL over no rows). */
  def stagingRatios(t: StagingLayer.Tables): Map[String, Double] = {
    def pct(df: org.apache.spark.sql.DataFrame, flag: org.apache.spark.sql.Column) =
      df.agg(coalesce(sum(when(flag, 1).otherwise(0)) * 100.0 / count(lit(1)),
        lit(0.0)).as("pct"))
        .first().getDouble(0)
    Map(
      "pct_high_margin_products" -> pct(t.product, col("is_high_margin")),
      "pct_profitable_sales" -> pct(t.sales, col("is_profitable")),
      "pct_returns_within_30_days" -> pct(t.returns, col("is_within_30_days")),
      "pct_out_of_stock" -> pct(t.inventory, col("stock_status") === "Out of Stock"))
  }
}
