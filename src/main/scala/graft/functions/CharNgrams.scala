package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native character n-gram generation: `char_ngrams(text, n)` →
  * `array<string>` of every length-`n` character window (one partial gram
  * for texts shorter than `n` — matching
  * `transform(sequence(1, greatest(length(text) − n + 1, 1)), i ->
  * substr(text, i, n))` exactly, code-point semantics included).
  *
  * Same rationale as [[WordShingles]]/[[WordPairs]]: the HOF formulation is
  * CodegenFallback (interpreted per element) and dominates the char-trigram
  * entropy scan; this is one monomorphic static call inside whole-stage
  * codegen.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val len = text.numChars()
    val count = math.max(len - n + 1, 1)
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      out(i) = text.substring(i, math.min(i + n, len))
      i += 1
    }
    new GenericArrayData(out)
  }

  def ngrams(text: Column, n: Int): Column =
    ColumnBridge.column(CharNgrams(ColumnBridge.expression(text), n))
}
