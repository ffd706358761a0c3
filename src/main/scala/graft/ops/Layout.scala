package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout keys. A 100 TB table is pruned or it
  * is scanned: range-partitioning on ONE column leaves every other
  * predicate a full scan, while sorting by a Z-ORDER (Morton) key
  * interleaves the bits of several columns so that rows close in the
  * key are close in EVERY dimension — each file then covers a small
  * rectangle of (say) (date × price), and a min/max-pruning scan
  * (parquet row-group stats, Delta/Iceberg file stats) skips most
  * files for predicates on either column. This is the layout trick
  * behind Delta Lake's OPTIMIZE ZORDER BY; here it is a pure column
  * expression, so `df.repartitionByRange(col)` + sort-within writes
  * the clustered layout with the one shuffle the write needs anyway.
  *
  * Everything is integer bit arithmetic — exactly replayable in any
  * engine with `>>`, `&` and `*`.
  */
object Layout {

  /** Quantize `v` in [lo, hi) onto the `bits`-bit integer grid,
    * clamping out-of-range values into the edge cells (the histogram
    * clamp — an outlier lands in the boundary cell, never outside the
    * key space). One pinned double division, floored. */
  def quantize(v: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val cells = 1L << bits
    greatest(lit(0L), least(lit(cells - 1),
      floor((v - lo) / ((hi - lo) / cells)).cast("long")))
  }

  /** Morton interleave of two `bits`-bit quantized coordinates: bit i
    * of `qx` lands at key bit 2i, bit i of `qy` at 2i+1. Built as an
    * unrolled sum of shift/mask terms — codegen folds it into one
    * branch-free expression, and the identical spelling replays in
    * SQL. `bits` ≤ 31 keeps the key in a long. */
  def zOrderKey(qx: Column, qy: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      (shiftright(qx, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(qy, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** The same interleave as SQL text (for oracles / external engines)
    * over pre-quantized integer columns `qx`, `qy`. */
  def zOrderKeySql(qx: String, qy: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($qx >> $i) & 1) << ${2 * i}) + ((($qy >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
}
