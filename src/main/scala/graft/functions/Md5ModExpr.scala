package graft.functions

import java.math.BigInteger
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `int(md5(x), 16) % n` over the FULL 128-bit md5 value — the
  * reference's deterministic pseudo-random primitive
  * (etl_ods_loader.py:425, 814-817). A 60/64-bit truncation of the
  * digest would give different residues (2^64 mod n ≠ 1 in general),
  * so this goes through BigInteger for exactness. The modulus is a
  * full expression because one reference site mods by a per-row value
  * (the category's supplier-list size, etl_ods_loader.py:425). Codegen
  * emits a static call to [[Md5ModExpr.compute]] — the expression stays
  * inside whole-stage codegen; the md5 dominates the cost either way.
  */
case class Md5ModExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_mod"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, bigint) arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5ModExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(s: Any, n: Any): Any =
    Md5ModExpr.compute(s.asInstanceOf[UTF8String], n.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) => s"graft.functions.Md5ModExpr.compute($s, $n)")
}

object Md5ModExpr {
  def compute(s: UTF8String, n: Long): Long = {
    require(n > 0, s"md5_mod modulus must be positive, got $n")
    new BigInteger(1, MessageDigest.getInstance("MD5").digest(s.getBytes))
      .mod(BigInteger.valueOf(n)).longValueExact()
  }

  /** Driver-side twin of [[graft.etl.Ids.businessKey]] for literal
    * seeds (e.g. the static reason codes). */
  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}
