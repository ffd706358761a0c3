package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Dense-vector primitives over ArrayType(Float/Double) columns.
  *
  * The hot-path [[cosine]] is a native Catalyst expression
  * ([[CosineSimExpr]], fused single loop, whole-stage codegen); the
  * rarely-hot [[dot]]/[[norm]]/[[l2sq]] stay as higher-order-function
  * compositions (note: HOFs evaluate interpreted — fine off the hot
  * path, promote to native expressions like cosine if a consumer ever
  * scores them per-pair at scale).
  *
  * Numeric contract: all folds accumulate left-to-right in double,
  * which is bit-identical to DuckDB's list_dot_product /
  * list_cosine_similarity (validated empirically) — so similarity
  * queries can be hash-compared against a DuckDB oracle without any
  * tolerance.
  */
object VectorFunctions {

  /** Cast a float vector to double once, at the scan edge. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Euclidean distance, native fused loop ([[L2DistExpr]]). */
  def l2(a: Column, b: Column): Column =
    ColumnBridge.column(L2DistExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 distance (squared), same fold discipline. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
}
