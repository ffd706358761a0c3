package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over ArrayType(Float/Double) columns, built
  * from higher-order functions (zip_with / aggregate) so they run inside
  * codegen with no UDF boundary.
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
    dot(a, b) / (norm(a) * norm(b))

  /** L2 distance (squared), same fold discipline. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
}
