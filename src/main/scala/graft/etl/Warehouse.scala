package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table lifecycle over a parquet warehouse directory (SURVEY S4/S7/S9
  * — the reference's CREATE/TRUNCATE/DROP DDL and temp-table insert
  * dance, dags/walmart_etl_pipeline_dag.py:153-178,
  * drop_all_tables.py:7-53).
  *
  * Writes go through an overwrite-swap: new data lands in
  * `<table>.__tmp`, then swaps in atomically (rename) after the write
  * succeeds. This is what makes read-modify-write legal — an SCD merge
  * reads tgt_dim_product while computing its replacement, and a plain
  * in-place overwrite would truncate the input mid-scan. It also means
  * a failed write never corrupts the prior state.
  *
  * At scale each table is a directory of partition files — writes are
  * partition-parallel, no single-writer bottleneck; the reference's
  * 10k/50k-row INSERT batching (S6) has no analog because nothing
  * funnels through a SQL endpoint.
  */
final class Warehouse(spark: SparkSession, baseDir: String) {

  private val fs = new Path(baseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def path(table: String) = new Path(baseDir, table)

  def exists(table: String): Boolean = fs.exists(path(table))

  def read(table: String): DataFrame = {
    // a prior batch may have swapped this path; drop any stale file
    // listing Spark has memoized for it
    spark.catalog.refreshByPath(path(table).toString)
    spark.read.parquet(path(table).toString)
  }

  def readIfExists(table: String): Option[DataFrame] =
    if (exists(table)) Some(read(table)) else None

  /** Overwrite-swap write: materialize to a tmp dir, then rename over
    * the old state. The df may read from the table being replaced. */
  def write(table: String, df: DataFrame): Unit = writeAll(Seq(table -> df))

  /** Hive-style partitioned overwrite-swap: at scale, fact tables are
    * written `partitionBy(dateCol)` so date-ranged queries prune whole
    * directories at planning time (SURVEY §7.4: partition facts by the
    * date key). Same two-phase swap discipline as [[write]]. */
  def writePartitioned(table: String, df: DataFrame, partitionCols: Seq[String]): Unit = {
    val tmp = new Path(baseDir, table + ".__tmp")
    fs.delete(tmp, true)
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(tmp.toString)
    fs.delete(path(table), true)
    if (!fs.rename(tmp, path(table)))
      throw new IllegalStateException(s"warehouse swap failed for $table")
    spark.catalog.refreshByPath(path(table).toString)
  }

  /** Two-phase group commit: materialize EVERY frame to its tmp dir
    * while all prior table states are still on disk, then swap them
    * in. Required whenever later frames in the group lazily read
    * tables earlier frames replace — e.g. target facts join the target
    * dimensions whose prior files an eager per-table swap would have
    * already deleted (the SCD frames read their own prior state). */
  def writeAll(tables: Seq[(String, DataFrame)]): Unit = {
    val staged = tables.map { case (table, df) =>
      val tmp = new Path(baseDir, table + ".__tmp")
      fs.delete(tmp, true)
      df.write.mode("overwrite").parquet(tmp.toString)
      table -> tmp
    }
    staged.foreach { case (table, tmp) =>
      fs.delete(path(table), true)
      if (!fs.rename(tmp, path(table)))
        throw new IllegalStateException(s"warehouse swap failed for $table")
      spark.catalog.refreshByPath(path(table).toString)
    }
  }

  def drop(table: String): Unit = fs.delete(path(table), true)

  /** TRUNCATE analog: replace with an empty frame of the same schema. */
  def truncate(table: String): Unit = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], read(table).schema)
    write(table, empty)
  }

  def tables(): Seq[String] =
    if (!fs.exists(new Path(baseDir))) Seq.empty
    else fs.listStatus(new Path(baseDir)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName).filterNot(_.endsWith(".__tmp")).sorted
}
