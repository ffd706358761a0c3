package graft.etl

import graft.ops.Relational
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

  /** The 8 orphan counts — all must be 0 on a healthy load. */
  def odsOrphans(t: OdsLayer.Tables): Map[String, Long] = {
    def c(df: org.apache.spark.sql.DataFrame) = df.first().getLong(0)
    Map(
      "sales_without_product" -> c(Relational.orphanCount(t.sales, t.product, "product_id", "product_id")),
      "sales_without_store" -> c(Relational.orphanCount(t.sales, t.store, "store_id", "store_id")),
      "sales_without_customer" -> c(Relational.orphanCount(t.sales, t.customer, "customer_id", "customer_id")),
      "sales_without_date" -> c(t.sales.join(t.date,
        t.sales("transaction_date") === t.date("full_date"), "left_anti")
        .agg(count(lit(1))).withColumnRenamed("count(1)", "orphans")),
      "products_without_supplier" -> c(Relational.orphanCount(t.product, t.supplier, "supplier_id", "supplier_id")),
      "returns_without_sale" -> c(Relational.orphanCount(t.returns, t.sales, "original_sale_id", "sale_id")),
      "returns_without_reason" -> c(Relational.orphanCount(t.returns, t.returnReason, "reason_code", "reason_code")),
      "inventory_without_product" -> c(Relational.orphanCount(t.inventory, t.product, "product_id", "product_id")))
  }

  /** Volume floors + span checks (etl_ods_loader.py:984-1018). */
  def odsVolumes(t: OdsLayer.Tables): Map[String, Long] = Map(
    "sales_rows" -> t.sales.count(),
    "product_rows" -> t.product.count(),
    "store_rows" -> t.store.count(),
    "inventory_snapshot_days" -> t.inventory.select(countDistinct("inventory_date"))
      .first().getLong(0),
    "returns_month_span" -> t.returns
      .agg(months_between(max("return_date"), min("return_date")).cast("long"))
      .first().getLong(0))

  /** Staging business ratios, in percent (etl_staging_loader.py:1352-1381). */
  def stagingRatios(t: StagingLayer.Tables): Map[String, Double] = {
    def pct(df: org.apache.spark.sql.DataFrame, flag: org.apache.spark.sql.Column) =
      df.agg((sum(when(flag, 1).otherwise(0)) * 100.0 / count(lit(1))).as("pct"))
        .first().getDouble(0)
    Map(
      "pct_high_margin_products" -> pct(t.product, col("is_high_margin")),
      "pct_profitable_sales" -> pct(t.sales, col("is_profitable")),
      "pct_returns_within_30_days" -> pct(t.returns, col("is_within_30_days")),
      "pct_out_of_stock" -> pct(t.inventory, col("stock_status") === "Out of Stock"))
  }
}
