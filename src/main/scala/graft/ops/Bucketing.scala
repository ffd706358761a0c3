package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers (SURVEY §4 scale plan: co-locate recurring
  * large⋈large joins by bucketing both sides on the join key).
  *
  * A table written `bucketBy(n, key)` is hash-partitioned into `n`
  * files per partition dir and registered in the session catalog with
  * that layout; a join between two tables bucketed on the same key
  * with the same count needs NO shuffle on either side — the single
  * biggest recurring cost of a fact⋈fact join at 100 TB (e.g. sales ⋈
  * returns on the sale id, re-joined every load). `sortBy` within
  * buckets additionally removes the sort of a sort-merge join.
  *
  * Bucketing requires the catalog (file layout alone can't prove the
  * invariant to the planner), which is why this lives beside — not
  * inside — the path-based [[graft.etl.Warehouse]].
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table (parquet). Drops
    * any prior table AND its managed location first: a non-persistent
    * catalog (the default in-memory one) forgets tables at JVM exit
    * while their warehouse directories survive, and a later
    * saveAsTable then fails with LOCATION_ALREADY_EXISTS. */
  def saveBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Join two same-bucketing tables on their bucket key — plans with
    * zero Exchange operators on the bucketed sides. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      left: String, right: String, key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
