package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every declared query, in catalog order. */
  def allQueries: Seq[Q] =
    _root_.graft.queries.RelationalQueries.all ++
      _root_.graft.queries.LlmQueries.all ++
      _root_.graft.queries.BusinessQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The multi-way star join + aggregation (SURVEY J4/A5). */
  def entry(spark: SparkSession): DataFrame = {
    val byName = allQueries.map(q => q.name -> q).toMap
    byName("q04_star_revenue").run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for ops DuckDB cannot express
    * (driver falls back to a rows-only check). */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin)).toMap
}
