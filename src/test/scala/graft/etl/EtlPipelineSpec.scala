package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden end-to-end test over the reference's own source CSV
  * (SURVEY §5): layer row counts, the reference's integrity checks as
  * real assertions, dashboard KPI totals, and idempotent re-run.
  */
class EtlPipelineSpec extends SparkSpec {

  private val csv = "/root/reference/data/walmart_data.csv"
  private lazy val whDir = Files.createTempDirectory("graft_wh_").toString
  private lazy val ctx = RunContext("2026-08-12")
  private lazy val counts = Pipeline.run(spark, csv, whDir, ctx)
  private lazy val wh = new Warehouse(spark, whDir)

  test("layer row counts match the reference's golden shape") {
    assert(counts("ods_sales") === 8399)      // every csv row has both dates
    assert(counts("ods_customer") === 795)    // distinct customer names
    assert(counts("ods_supplier") === 20)     // 3 categories + 17 sub-categories
    assert(counts("ods_return_reason") === 10)
    assert(counts("ods_inventory") === 150000) // 30 dates x 100 products x 50 stores
    assert(counts("tgt_dim_product") === 1263) // distinct product names
    assert(counts("tgt_fact_sales") === 8399)  // star joins must not fan out
    assert(counts("stg_sales") === counts("ods_sales"))
    assert(counts("tgt_fact_returns") === counts("ods_returns"))
    assert(counts("tgt_fact_inventory") === counts("ods_inventory"))
  }

  test("volume floors from the reference verification hold") {
    // etl_ods_loader.py:984-999
    assert(counts("ods_sales") >= 5000)
    assert(counts("ods_product") >= 1000)
    assert(counts("ods_store") >= 100)
  }

  test("referential integrity: zero orphans on all 8 audits") {
    val ods = OdsLayer.Tables(
      date = wh.read("ods_date"), customer = wh.read("ods_customer"),
      supplier = wh.read("ods_supplier"), product = wh.read("ods_product"),
      store = wh.read("ods_store"), returnReason = wh.read("ods_return_reason"),
      sales = wh.read("ods_sales"), returns = wh.read("ods_returns"),
      inventory = wh.read("ods_inventory"))
    EtlChecks.odsOrphans(ods).foreach { case (name, orphans) =>
      assert(orphans === 0, s"orphan audit $name")
    }
  }

  test("decimalMeasures stores DDL decimal types over float-faithful values") {
    import org.apache.spark.sql.types.DecimalType
    counts // force the (shared, double-typed) pipeline run first
    val dCtx = RunContext(ctx.runDate, ctx.batchId, decimalMeasures = true)
    val sales = StagingLayer.sales(wh.read("ods_sales"), wh.read("stg_date"),
      wh.read("stg_customer"), wh.read("stg_product"), wh.read("stg_store"), dCtx)
    val rets = StagingLayer.returns(wh.read("ods_returns"), wh.read("stg_date"),
      wh.read("stg_product"), wh.read("stg_store"),
      wh.read("stg_return_reason"), dCtx)
    // the reference DDL's types (etl_ods_tables.py:162-165, 201)
    assert(sales.schema("sales_amount").dataType === DecimalType(12, 2))
    assert(sales.schema("net_revenue").dataType === DecimalType(12, 2))
    assert(sales.schema("profit").dataType === DecimalType(12, 2))
    assert(sales.schema("shipping_cost").dataType === DecimalType(10, 2))
    assert(rets.schema("return_amount").dataType === DecimalType(12, 2))
    assert(rets.schema("avg_return_price").dataType === DecimalType(10, 2))
    // same values as the double path to the cent: the cast is storage
    // fidelity, not a different computation
    val dec = sales.agg(sum(col("net_revenue").cast("double"))).first().getDouble(0)
    val dbl = wh.read("stg_sales")
      .agg(sum("net_revenue")).first().getDouble(0)
    assert(math.abs(dec - dbl) < 0.01)
    // off by default: the flagless pipeline kept doubles
    assert(wh.read("stg_sales").schema("net_revenue").dataType ===
      org.apache.spark.sql.types.DoubleType)
  }

  test("dashboard KPIs reproduce the csv truth") {
    // Ground truth computed from the raw csv (duckdb):
    // sum(profit)=1521767.96, sum(sales)=14915600.82, sum(qty)=214777
    val kpis = wh.read("tgt_fact_sales").agg(
      round(sum("profit"), 2).as("total_profit"),
      round(sum("sales_amount"), 2).as("total_sales"),
      sum("order_quantity").as("total_qty")).first()
    assert(math.abs(kpis.getDouble(0) - 1521767.96) < 0.01)
    assert(math.abs(kpis.getDouble(1) - 14915600.82) < 0.01)
    assert(kpis.getLong(2) === 214777L)
  }

  test("staging business ratios are sane percentages") {
    val stg = StagingLayer.Tables(
      date = wh.read("stg_date"), customer = wh.read("stg_customer"),
      product = wh.read("stg_product"), store = wh.read("stg_store"),
      supplier = wh.read("stg_supplier"),
      returnReason = wh.read("stg_return_reason"),
      sales = wh.read("stg_sales"), returns = wh.read("stg_returns"),
      inventory = wh.read("stg_inventory"))
    val r = EtlChecks.stagingRatios(stg)
    r.foreach { case (name, pct) =>
      assert(pct >= 0.0 && pct <= 100.0, s"$name out of range: $pct")
    }
    // every synthetic return date is +1..+14 days after the sale
    assert(r("pct_returns_within_30_days") === 100.0)
  }

  test("pipeline fact writes are date-partitioned and prune at planning time") {
    counts // force the pipeline run
    val anyKey = wh.read("tgt_fact_sales")
      .agg(min("transaction_date_key")).first().get(0)
    val filtered = wh.read("tgt_fact_sales")
      .where(col("transaction_date_key") === lit(anyKey))
    assert(filtered.count() > 0)
    // the date predicate must prune directories at planning time, not
    // filter rows post-scan
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("transaction_date_key"),
      plan.take(500))
  }

  test("re-running the same batch is idempotent for dims and facts") {
    counts // force first run
    val counts2 = Pipeline.run(spark, csv, whDir, RunContext("2026-08-13"))
    // no attribute changed, so no SCD2 versions and no SCD1 growth
    assert(counts2("tgt_dim_product") === counts("tgt_dim_product"))
    assert(counts2("tgt_dim_store") === counts("tgt_dim_store"))
    assert(counts2("tgt_dim_customer") === counts("tgt_dim_customer"))
    assert(counts2("tgt_fact_sales") === counts("tgt_fact_sales"))
    assert(wh.read("tgt_dim_product").where(col("version") > 1).count() === 0)
  }
}
