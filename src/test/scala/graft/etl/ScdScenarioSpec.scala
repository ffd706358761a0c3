package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 change-scenario test using the reference's own fixtures
  * (data/scd_test_corrected.csv → data/scd_test_2.csv; SURVEY §5.3):
  * the same three products/stores reappear with changed State,
  * Unit Price, Region, Ship Date — run A then run B must expire the
  * old versions and insert version 2, and a re-run of B must change
  * nothing (idempotence).
  */
class ScdScenarioSpec extends SparkSpec {

  private val csvA = "/root/reference/data/scd_test_corrected.csv"
  private val csvB = "/root/reference/data/scd_test_2.csv"
  private lazy val whDir = Files.createTempDirectory("graft_scd_").toString
  private lazy val wh = new Warehouse(spark, whDir)

  private val safcoId = "PROD_" + graft.functions.Md5ModExpr
    .md5Hex("Safco Industrial Wire Shelving").take(14)

  private lazy val runs: Unit = {
    Pipeline.run(spark, csvA, whDir, RunContext("2026-08-10"))
    Pipeline.run(spark, csvB, whDir, RunContext("2026-08-12"))
  }

  test("run A initial load: all version 1, effective 2000-01-01") {
    Pipeline.run(spark, csvA, whDir, RunContext("2026-08-10"))
    val p = wh.read("tgt_dim_product")
    assert(p.count() === 3)
    assert(p.where(col("version") === 1 && col("is_current") &&
      col("effective_date") === to_date(lit("2000-01-01"))).count() === 3)
  }

  test("run B: changed products get expired v1 + current v2") {
    runs
    val p = wh.read("tgt_dim_product")
    // all three products changed unit_price → 3 keys x 2 versions
    assert(p.count() === 6)
    assert(p.where(col("is_current")).count() === 3)

    val safco = p.where(col("product_id") === safcoId)
      .orderBy("version").collect()
    assert(safco.length === 2)
    val v1 = safco(0); val v2 = safco(1)
    assert(v1.getAs[Boolean]("is_current") === false)
    // expired at runDateB - 1 (etl_target_loader.py:46-48)
    assert(v1.getAs[java.sql.Date]("expiry_date").toString === "2026-08-11")
    assert(v1.getAs[Double]("unit_price") === 51.99)
    assert(v2.getAs[Boolean]("is_current") === true)
    assert(v2.getAs[java.sql.Date]("effective_date").toString === "2026-08-12")
    assert(v2.getAs[Double]("unit_price") === 5.99)
    assert(v2.getAs[Long]("version") === 2L)
  }

  test("run B: stores version too (state changes)") {
    runs
    val s = wh.read("tgt_dim_store")
    assert(s.where(col("is_current")).count() === 3)
    // Napa: Texas → California, Leander: Utah → Texas, Claremont: KTM → California
    assert(s.where(!col("is_current")).count() === 3)
    val claremont = s.where(col("city") === "Claremont" && col("is_current")).first()
    assert(claremont.getAs[String]("state") === "California")
  }

  test("facts land on the point-in-time version, not the newest") {
    runs
    // 2012 transaction dates fall inside v1's [2000-01-01, 2026-08-11]
    // window, so the range join must resolve the EXPIRED version
    val prodKeyed = wh.read("tgt_dim_product")
      .withColumn("product_key2", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("product_id").asc, col("version").asc)))
    val joined = wh.read("tgt_fact_sales").join(prodKeyed,
      col("product_key") === col("product_key2"))
    assert(joined.count() === 3)
    assert(joined.where(col("version") === 1).count() === 3)
  }

  test("re-running run B changes nothing (SCD2 idempotence)") {
    runs
    val before = wh.read("tgt_dim_product").count()
    Pipeline.run(spark, csvB, whDir, RunContext("2026-08-14"))
    assert(wh.read("tgt_dim_product").count() === before)
    assert(wh.read("tgt_dim_product").where(col("version") > 2).count() === 0)
  }

  test("SCD1 customer updated in place (no history rows)") {
    runs
    val c = wh.read("tgt_dim_customer")
    assert(c.count() === 3)
    val matt = c.where(col("customer_name") === "Matt Collister").first()
    assert(matt.getAs[String]("state") === "California")
  }
}
