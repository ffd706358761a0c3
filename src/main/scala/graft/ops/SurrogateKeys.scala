package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

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
  * that Spark's SQL surface has no operator for. `zipWithIndex` runs
  * one extra count job, but both jobs share the sort's shuffle files
  * (the count's stage output is reused, not recomputed).
  *
  * Keys are dense 1..N, `LongType` (no 2^31 ceiling), and re-run
  * deterministic given a total ordering — matching the reference's
  * autoincrement contract (etl_staging_tables.py:54 et al.) without
  * its single-writer bottleneck. Rows that tie on the full ordering
  * get arbitrary-but-dense keys, exactly like the global window did.
  */
object SurrogateKeys {

  /** Append a dense 1..N `LongType` key column named `name`, numbered
    * by the total ordering `order`, without ever funnelling the frame
    * through one partition. */
  def dense(name: String, order: Seq[Column])(df: DataFrame): DataFrame = {
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(indexed,
      sorted.schema.add(StructField(name, LongType, nullable = false)))
  }
}
