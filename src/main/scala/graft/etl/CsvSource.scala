package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Retail CSV ingest (SURVEY S1-S2, F3).
  *
  * Explicit schema — never inferSchema — mirroring the reference's
  * declared DDL types (etl_ods_tables.py:51-220) rather than pandas'
  * per-run inference. Dates stay raw strings here and are parsed with
  * the `M/d/yyyy` pattern (etl_ods_loader.py:209-224); `Customer Age`
  * stays a string because the reference parses it leniently
  * (`int(float(x))`, else null) in staging (etl_staging_loader.py:270-278).
  *
  * Empty strings become nulls via the csv reader's nullValue option —
  * the scan-level equivalent of `df.replace('', np.nan)`
  * (etl_ods_loader.py:187-195); no post-pass needed.
  *
  * A `_row_idx` file-order index is attached for the reference's
  * arrival-order semantics (pandas `first()`, first-match scans). For a
  * single csv file Spark preserves file order per split and splits in
  * offset order, so monotonically_increasing_id reproduces row order.
  */
object CsvSource {

  val schema: StructType = StructType(Seq(
    StructField("City", StringType),
    StructField("Customer Age", StringType),
    StructField("Customer Name", StringType),
    StructField("Customer Segment", StringType),
    StructField("Discount", DoubleType),
    StructField("Number of Records", IntegerType),
    StructField("Order Date", StringType),
    StructField("Order ID", LongType),
    StructField("Order Priority", StringType),
    StructField("Order Quantity", IntegerType),
    StructField("Product Base Margin", DoubleType),
    StructField("Product Category", StringType),
    StructField("Product Container", StringType),
    StructField("Product Name", StringType),
    StructField("Product Sub-Category", StringType),
    StructField("Profit", DoubleType),
    StructField("Region", StringType),
    StructField("Row ID", LongType),
    StructField("Sales", DoubleType),
    StructField("Ship Date", StringType),
    StructField("Ship Mode", StringType),
    StructField("Shipping Cost", DoubleType),
    StructField("State", StringType),
    StructField("Unit Price", DoubleType),
    StructField("Zip Code", StringType)))

  /** Read the retail CSV with snake_case names, parsed dates, and the
    * file-order row index. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "")
      // RFC4180 quote doubling ("" inside quoted fields) — the file's
      // convention; univocity's default backslash escape would shear
      // such rows into the wrong columns
      .option("escape", "\"")
      .schema(schema)
      .csv(path)
      .select(
        col("City").as("city"),
        col("Customer Age").as("customer_age"),
        col("Customer Name").as("customer_name"),
        col("Customer Segment").as("customer_segment"),
        col("Discount").as("discount"),
        col("Number of Records").as("num_records"),
        to_date(col("Order Date"), "M/d/yyyy").as("order_date"),
        col("Order ID").as("order_id"),
        col("Order Priority").as("order_priority"),
        col("Order Quantity").as("order_quantity"),
        col("Product Base Margin").as("product_base_margin"),
        col("Product Category").as("product_category"),
        col("Product Container").as("product_container"),
        col("Product Name").as("product_name"),
        col("Product Sub-Category").as("product_sub_category"),
        col("Profit").as("profit"),
        col("Region").as("region"),
        col("Row ID").as("row_id"),
        col("Sales").as("sales"),
        to_date(col("Ship Date"), "M/d/yyyy").as("ship_date"),
        col("Ship Mode").as("ship_mode"),
        col("Shipping Cost").as("shipping_cost"),
        col("State").as("state"),
        col("Unit Price").as("unit_price"),
        col("Zip Code").as("zip_code"),
        monotonically_increasing_id().as("_row_idx"))
}
