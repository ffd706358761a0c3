package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.catalyst.expressions.LambdaFunction
import org.apache.spark.sql.functions._

/** The native [[graft.functions.ShinglesExpr]] must be value-identical
  * to the higher-order `transform(sequence(...), i =>
  * array_join(slice(ws, i+1, n), " "))` formulation it replaced (the
  * DuckDB oracle replays that form), across the edge cases the old
  * `when(size(ws) >= n, ...)` guard handled — and it must keep the
  * whole shingle path free of interpreted lambdas. */
class ShinglesExprSpec extends SparkSpec {
  import spark.implicits._

  /** The old interpreted formulation, kept as the semantic oracle. */
  private def hofShingles(text: org.apache.spark.sql.Column, n: Int) = {
    val ws = split(text, " ")
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => array_join(slice(ws, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon"), // 5 tokens, plain case
    (2L, "a b a b a"),                      // duplicates must be kept, in order
    (3L, "one two three"),                  // exactly n tokens -> 1 shingle
    (4L, "just two"),                       // fewer than n -> empty
    (5L, ""),                               // split("") = [""] -> empty
    (6L, null.asInstanceOf[String]))        // null -> empty (not null)

  test("codegen shingles match the HOF formulation on every edge case") {
    val df = docs.toDF("id", "text")
    val out = df.select($"id",
      TextFunctions.posWordShingles($"text", 3).as("nw"),
      hofShingles($"text", 3).as("old")).orderBy("id").collect()
    out.foreach { r =>
      assert(!r.isNullAt(1), s"id=${r.getLong(0)}: native returned null")
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"id=${r.getLong(0)}: native ${r.getSeq[String](1)} != HOF ${r.getSeq[String](2)}")
    }
    // hand-checked values, order and duplicates pinned
    val byId = out.map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byId(1L) === Seq("alpha beta gamma", "beta gamma delta", "gamma delta epsilon"))
    assert(byId(2L) === Seq("a b a", "b a b", "a b a"))
    assert(byId(3L) === Seq("one two three"))
    assert(byId(4L) === Seq.empty)
    assert(byId(5L) === Seq.empty)
    assert(byId(6L) === Seq.empty)
  }

  test("interpreted eval path (constant folding) agrees with codegen") {
    // a literal input constant-folds through Expression.eval — the
    // interpreted path — while the column form runs generated code
    val folded = spark.range(1)
      .select(TextFunctions.posWordShingles(lit("p q r s"), 2).as("sh"))
      .as[Seq[String]].head()
    assert(folded === Seq("p q", "q r", "r s"))
  }

  test("property: native == HOF on random corpora, several shingle widths") {
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "bb", "ccc", "dddd", "e", "ff", "longword", "x9")
    val docs = (1 to 60).map { i =>
      val n = rnd.nextInt(12) // 0..11 tokens, hitting the short-doc edge
      (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val df = docs.toDF("id", "text")
    Seq(1, 2, 3, 5).foreach { n =>
      val bad = df.select($"id",
          TextFunctions.posWordShingles($"text", n).as("nw"),
          hofShingles($"text", n).as("old"))
        .where(not($"nw" <=> $"old"))
      assert(bad.isEmpty, s"n=$n: native diverged from HOF")
    }
  }

  test("non-string-array input is rejected at analysis") {
    import org.apache.spark.sql.graft.ColumnBridge
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(3)
        .select(ColumnBridge.column(graft.functions.ShinglesExpr(
          ColumnBridge.expression(array(lit(1), lit(2))), 2)))
        .collect()
    }
    assert(e.getMessage.contains("array<string>") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("no LambdaFunction anywhere in the hashed-shingle path") {
    val df = Seq((1L, "w1 w2 w3 w4 w5 w6")).toDF("doc_id", "text")
    val shingled = df.select($"doc_id",
      explode(TextFunctions.wordShingles($"text", 3)).as("s"))
      .select($"doc_id", TextFunctions.md5Long($"s").as("h"))
    val lambdas = shingled.queryExecution.optimizedPlan.flatMap(_.expressions)
      .flatMap(_.collect { case l: LambdaFunction => l })
    assert(lambdas.isEmpty)
  }
}
