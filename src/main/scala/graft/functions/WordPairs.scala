package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native window-`w` skip-gram pair generation:
  * `word_pairs(text, window)` → `array<string>` of canonicalized
  * (binary-lexicographic least first) space-joined token pairs within
  * `window` positions — the hot kernel of [[graft.ext.TextStats.skipgramPmi]].
  *
  * Same rationale as [[WordShingles]]: the composable nested
  * `transform(sequence(...), ...)` formulation is CodegenFallback
  * (interpreted, megamorphic eval) and profiled ~2.5× the whole query's
  * budget at sf0.1; this kernel is one monomorphic static call that stays
  * inside whole-stage codegen. Tokenization matches `split(text, " ")`
  * exactly, and the canonical ordering matches `least`/`greatest` on
  * strings (both are UTF8 binary compares), so the DuckDB oracle
  * formulation is unchanged.
  */
case class WordPairs(child: Expression, window: Int) extends UnaryExpression {
  require(window >= 1, s"window must be >= 1, got $window")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_pairs"

  override def nullSafeEval(input: Any): Any =
    WordPairs.compute(input.asInstanceOf[UTF8String], window)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordPairs.compute($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): WordPairs =
    copy(child = newChild)
}

object WordPairs {
  private val SPACE = UTF8String.fromString(" ")

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, window: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length
    var count = 0
    var i = 0
    while (i < n) { count += math.min(window, n - 1 - i); i += 1 }
    val out = new Array[AnyRef](count)
    var k = 0
    i = 0
    while (i < n) {
      val jEnd = math.min(i + window, n - 1)
      var j = i + 1
      while (j <= jEnd) {
        val a = toks(i); val b = toks(j)
        out(k) =
          if (a.compareTo(b) <= 0) UTF8String.concatWs(SPACE, a, b)
          else UTF8String.concatWs(SPACE, b, a)
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def pairs(text: Column, window: Int): Column =
    ColumnBridge.column(WordPairs(ColumnBridge.expression(text), window))
}
