package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time nearest-prior) join: for every left row, the
  * single right row with the greatest `rightTime` ≤ `leftTime` within
  * the same key — the market-data / attribution primitive (match each
  * trade to the prevailing quote, each click to the latest prior
  * impression).
  *
  * Spark has no ASOF operator; the naive spelling — inequality range
  * join + per-left-row max — explodes to |L|·|R| candidate rows per
  * key before pruning. This is the scalable spelling: tag both sides,
  * union, and carry the latest right payload forward with a
  * last(ignoreNulls) running window — ONE shuffle on the key, work
  * linear in |L|+|R|, no candidate blowup at any skew. Right rows
  * order before left rows at equal timestamps, so a boundary-equal
  * right row matches (the ≤ contract).
  *
  * Returns all left columns plus `rightCols` (null when no prior
  * right row exists — left-join semantics; filter for inner).
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: Column, rightTime: Column, rightCols: Seq[String]): DataFrame = {
    val collisions = rightCols.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"rightCols collide with left columns: ${collisions.mkString(", ")} — alias them first")
    val keyed = keyCols.map(col)
    val lType = left.schema
    val rType = right.select(rightCols.map(col): _*).schema
    val l = left.select(
      keyed :+ leftTime.as("__t") :+ lit(1).as("__side")
        :+ struct(left.columns.map(col): _*).as("__l")
        :+ lit(null).cast(rType).as("__r"): _*)
    val r = right.select(
      keyed :+ rightTime.as("__t") :+ lit(0).as("__side")
        :+ lit(null).cast(lType).as("__l")
        :+ struct(rightCols.map(col): _*).as("__r"): _*)
    // the trailing __r sort key pins ties: multiple right rows at the
    // same (key, time) would otherwise resolve by shuffle-fetch order —
    // the deterministic pick is the greatest right payload. Skipped
    // when the payload struct is not orderable (e.g. carries a map):
    // such callers must pre-dedup per (key, time) themselves.
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => orderable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
      case _ => true
    }
    val tieKeys =
      if (orderable(rType)) Seq(col("__r").asc_nulls_first) else Seq.empty
    val w = Window.partitionBy(keyed: _*)
      .orderBy(col("__t").asc +: col("__side").asc +: tieKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.map(c => col(s"__l.$c").as(c))
        ++ rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
