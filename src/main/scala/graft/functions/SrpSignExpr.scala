package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native signed-random-projection (SRP / hyperplane LSH) signature
  * over an array<double> vector (Charikar, "Similarity estimation
  * techniques from rounding algorithms", STOC 2002): bit `i` is set
  * iff `v · planes(i) > 0`. Hamming distance between signatures
  * estimates the angle (`P[bit differs] = θ/π`), making this the
  * cosine-space analog of the text simhash.
  *
  * The HOF formulation (`aggregate(zip_with(...))` per bit) evaluates
  * interpreted — bits × dims lambda dispatches per VECTOR, on the
  * signature pass every ANN consumer runs corpus-wide — and, merged
  * upward by CollapseProject, it would knock the whole stage out of
  * whole-stage codegen. This expression computes all bits in one
  * allocation-free nested loop with the plane matrix attached as a
  * codegen reference object.
  *
  * Numeric contract: each dot product folds left-to-right in double
  * over the common prefix of (vector, plane) — the same order as
  * DuckDB's `list_dot_product`, so a SQL oracle deriving the SAME
  * md5-based planes reproduces every signature bit-for-bit. The
  * strict `> 0` sign test is part of the contract (an exactly-zero
  * dot yields bit 0 on both engines).
  */
case class SrpSignExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length <= 64,
    s"need 1..64 planes for a long signature, got ${planes.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "srp_sign"

  override protected def withNewChildInternal(newChild: Expression): SrpSignExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nv = v.numElements()
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      val n = math.min(nv, p.length)
      var dot = 0.0
      var d = 0
      while (d < n) { dot += v.getDouble(d) * p(d); d += 1 }
      if (dot > 0.0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", planes, "double[][]")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val nv = ctx.freshName("nv")
      val dot = ctx.freshName("dot")
      val p = ctx.freshName("p")
      val sig = ctx.freshName("sig")
      s"""
         |int $nv = $a.numElements();
         |long $sig = 0L;
         |for (int $i = 0; $i < $pl.length; $i++) {
         |  double[] $p = $pl[$i];
         |  int $n = java.lang.Math.min($nv, $p.length);
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $dot += $a.getDouble($d) * $p[$d];
         |  }
         |  if ($dot > 0.0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
}
