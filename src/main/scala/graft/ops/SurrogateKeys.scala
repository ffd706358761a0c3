package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{col, xxhash64}
import org.apache.spark.sql.types.{LongType, StructField}
import org.apache.spark.storage.StorageLevel

/** Dense surrogate-key assignment that survives 100-TB fact tables.
  *
  * The naive spelling — `row_number().over(Window.orderBy(...))` with
  * no partition clause — plans as a single-partition sort: one task
  * receives the entire table, which is invisible at fixture scale and
  * fatal at 100×. Here instead: `repartitionByRange` on the pinned
  * natural ordering (a distributed global sort — every partition holds
  * a contiguous key range, partitions are mutually ordered), then
  * contiguous ids by partition-offset arithmetic via RDD
  * `zipWithIndex` — the one genuinely per-partition imperative step
  * (per-partition counts → cumulative offsets → local index + offset)
  * that Spark's SQL surface has no operator for. `zipWithIndex` makes
  * the call eager (it runs a count job at construction time); the
  * sorted rows are persisted (memory-then-disk) first, so that count
  * and every downstream action read one materialization instead of
  * re-executing the shuffle-read + sort per action. The block cleanup
  * rides the ContextCleaner: when the keyed frame is no longer
  * referenced, its RDD blocks are evicted with it.
  *
  * Keys are dense 1..N, `LongType` (no 2^31 ceiling), and ACTION-
  * deterministic even when the caller's ordering ties: a hash of the
  * full row is appended as the final sort key, so any two actions (the
  * dim write and the fact join that consumed the same keyed frame)
  * agree on every row's key regardless of shuffle-fetch order. Exact
  * full-row duplicates still tie, and interchangeably so — matching
  * the reference's autoincrement contract (etl_staging_tables.py:54
  * et al.) without its single-writer bottleneck.
  */
object SurrogateKeys {

  /** Append a dense 1..N `LongType` key column named `name`, numbered
    * by `order` made total with a full-row-hash tiebreak, without ever
    * funnelling the frame through one partition. */
  def dense(name: String, order: Seq[Column])(df: DataFrame): DataFrame = {
    val totalOrder = order :+ xxhash64(df.columns.map(col): _*).asc
    val sorted = df.repartitionByRange(totalOrder: _*)
      .sortWithinPartitions(totalOrder: _*)
    val sortedRows = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val indexed = sortedRows.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(indexed,
      sorted.schema.add(StructField(name, LongType, nullable = false)))
  }
}
