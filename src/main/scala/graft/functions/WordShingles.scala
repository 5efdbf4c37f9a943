package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word k-gram shingling: `word_shingles(text, k)` → `array<string>` of the
  * space-joined k-grams (a doc shorter than k tokens yields one partial shingle).
  *
  * Why an expression and not `transform(sequence(...), i -> concat_ws(slice(...)))`:
  * Spark's higher-order functions are `CodegenFallback` — always interpreted — and the
  * megamorphic `Expression.eval` call sites degrade badly in a long-lived JVM (stack
  * sampling showed the composable formulation burning 130s CPU in one task on 5k
  * docs). This expression does the same work in one monomorphic static method; its
  * codegen is a single static call that stays inside whole-stage codegen.
  *
  * Tokenization matches `split(text, " ")` exactly (regex split, limit -1 — trailing
  * empty strings kept) so the DuckDB oracle formulation is unchanged.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val SPACE = UTF8String.fromString(" ")

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length
    val count = math.max(n - k + 1, 1)
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      val end = math.min(i + k, n)
      out(i) = UTF8String.concatWs(SPACE, java.util.Arrays.copyOfRange(toks, i, end): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def shingles(text: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), k))
}
