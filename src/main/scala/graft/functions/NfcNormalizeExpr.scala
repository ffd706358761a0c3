package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native
  * codegen'd expression — Spark ships no normalization function, yet a
  * multilingual corpus cannot be deduplicated or fingerprinted without
  * one: the same visible text arrives from different crawls as
  * composed (U+00E9) and decomposed (U+0065 U+0301) code-point
  * sequences, which hash differently and defeat every content-key
  * operator downstream. Normalizing FIRST makes the md5 family see one
  * spelling.
  *
  * The fast path costs one decode + scan: `Normalizer.isNormalized`
  * is a cheap check that succeeds for effectively all real text (ASCII
  * and already-composed sequences), returning the INPUT UTF8String
  * without re-encoding; only strings that genuinely contain decomposed
  * sequences pay the recomposition + encode. Codegen emits
  * a static call, so the expression stays inside whole-stage codegen
  * like the rest of the [[graft.functions]] family.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)

  override def nullSafeEval(s: Any): Any =
    NfcNormalizeExpr.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NfcNormalizeExpr.compute($s)")
}

object NfcNormalizeExpr {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
