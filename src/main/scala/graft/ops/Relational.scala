package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators the reference implements imperatively.
  *
  * Each is a pure DataFrame → DataFrame function so Catalyst sees the
  * whole plan (column pruning / predicate pushdown reach the scan, and
  * small sides are broadcast automatically under AQE).
  */
object Relational {

  /** Most-frequent value per group (reference: pandas
    * `value_counts().index[0]`, etl_ods_loader.py:263-270). Tie-break is
    * pinned: higher count wins, then lexicographically smaller value —
    * the reference's pandas tie order is insertion-dependent and
    * non-deterministic, so we declare this ordering.
    *
    * Two-phase: a partial-aggregated groupBy count (map-side combine)
    * then a per-group row_number — both shuffle on the group key only,
    * so this scales linearly with distinct groups, not rows.
    */
  def modePerGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      outName: String, countName: String = "cnt"): DataFrame = {
    val counts = df
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as(countName))
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(countName).desc, col(valueCol).asc)
    counts
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .withColumnRenamed(valueCol, outName)
  }

  /** Keep the single latest row per key (reference: the ROW_NUMBER()=1
    * dedup before every MERGE, etl_target_loader.py:118-124 et al.).
    * `order` must be a total order within each key for determinism.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** SCD Type-1 MERGE rewrite (reference: MERGE INTO ... WHEN MATCHED
    * UPDATE / WHEN NOT MATCHED INSERT, etl_target_loader.py:86-151).
    * No Delta/Iceberg offline, so: rows of `target` whose key has a
    * match in `source` are replaced by the source row; unmatched target
    * rows survive; new source keys are inserted. Caller overwrites the
    * table with the result. Anti-join + union = one shuffle on the key;
    * the join side carrying only keys is small and broadcastable.
    */
  def mergeType1(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val srcKeys = source.select(keys.map(col): _*)
    target.join(srcKeys, keys, "left_anti").unionByName(source)
  }

  /** Skew-mitigating equi join. A hot key concentrates all its rows in
    * one shuffle partition and serializes the join; salting scatters
    * the large side's rows across `salts` buckets (deterministic
    * per-row hash of the full row, so re-runs are stable) and
    * replicates the small side once per bucket — the hot key's work
    * then spreads over `salts` tasks at the cost of a `salts`× blowup
    * of the SMALL side only. Use when a broadcast join doesn't fit and
    * AQE's skew splitting isn't available (e.g. non-shuffle-join
    * strategies or pre-AQE pipelines); semantics identical to
    * `large.join(small, keys, joinType)` for the supported types.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(joinType == "inner" || joinType == "left",
      "salted join supports inner and left (right/outer would duplicate unmatched small-side rows)")
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Referential-integrity orphan count: rows of `fact` with no match in
    * `dim` (reference: the 8 LEFT JOIN ... IS NULL audits,
    * etl_ods_loader.py:905-982). Anti-join keeps only the probe-side
    * columns, so Catalyst prunes the dim scan to the key column.
    */
  def orphanCount(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String): DataFrame =
    fact.join(dim, fact(factKey) === dim(dimKey), "left_anti")
      .agg(count(lit(1)).as("orphans"))

  /** Snapshot diff — the change-data-capture primitive an incremental
    * pipeline runs between two states of a table: classify every key
    * as I (inserted), D (deleted), or U (changed in any compared
    * column); unchanged rows drop out. One full-outer join on the key
    * plus a column-wise null-safe comparison (`<=>` so NULL→value and
    * value→NULL count as changes) — one shuffle on the key, no
    * row-by-row diffing. Returns (keys..., op). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ compareCols).map(col): _*).as("o")
    val n = newDf.select((keys ++ compareCols).map(col): _*).as("n")
    val changed = compareCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    // presence markers, NOT key-null tests: a row whose key column is
    // genuinely NULL must still classify by which side it came from
    val ow = o.withColumn("__o", lit(1))
    val nw = n.withColumn("__n", lit(1))
    ow.join(nw, keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _), "full_outer")
      .withColumn("op",
        when(col("__o").isNull, "I").when(col("__n").isNull, "D").when(changed, "U"))
      .where(col("op").isNotNull)
      .select(keys.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) :+ col("op"): _*)
  }
}
