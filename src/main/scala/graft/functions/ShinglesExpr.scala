package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native positional word n-gram shingling over a token array: element
  * i is `tokens[i..i+n-1]` joined with single spaces, duplicates kept,
  * document order preserved.
  *
  * The higher-order-function formulation (`transform(sequence(0,
  * size-n), i => array_join(slice(ws, i+1, n), " "))`) evaluates
  * interpreted — one lambda dispatch, a `slice` allocation and an
  * `array_join` per shingle — and it sits on the single hottest map
  * pass of the dedup family: every shingle consumer (minhash LSH,
  * n-gram Jaccard, winnowing, contamination, TF-IDF, the corpus
  * pipeline) runs it over the full corpus text. This expression builds
  * all shingles in one tight generated loop ([[doGenCode]]), staying
  * inside whole-stage codegen; `UTF8String.concatWs` copies token
  * bytes directly, no intermediate arrays.
  *
  * Semantics pinned to the HOF form it replaces (and to the DuckDB
  * oracle's `list_transform` replay): fewer than `n` tokens — or a
  * null input, which the old `when(size(ws) >= n, ...)` guard also
  * sent to the empty branch because `size(null)` is null — yields an
  * EMPTY array, never null, so `nullable` is false and downstream
  * `explode`/`array_distinct` see the exact same values as before.
  */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "word_shingles"

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)

  private val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(new Array[Any](0))
    val ws = v.asInstanceOf[ArrayData]
    val m = ws.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](m)
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { buf(j) = ws.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, buf: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val utf8 = classOf[UTF8String].getName
    val gad = classOf[GenericArrayData].getName
    val sepRef = ctx.addReferenceObj("shingleSep", sep, utf8)
    val m = ctx.freshName("m")
    val out = ctx.freshName("out")
    val buf = ctx.freshName("buf")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val resultCode =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value};
         |if (${c.isNull}) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  int $m = ${c.value}.numElements() - $n + 1;
         |  if ($m <= 0) {
         |    ${ev.value} = new $gad(new Object[0]);
         |  } else {
         |    $utf8[] $out = new $utf8[$m];
         |    $utf8[] $buf = new $utf8[$n];
         |    for (int $i = 0; $i < $m; $i++) {
         |      for (int $j = 0; $j < $n; $j++) {
         |        $buf[$j] = ${c.value}.getUTF8String($i + $j);
         |      }
         |      $out[$i] = $utf8.concatWs($sepRef, $buf);
         |    }
         |    ${ev.value} = new $gad($out);
         |  }
         |}
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }
}
