package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native non-overlapping word chunking: `word_chunks(text, k)` →
  * `array<string>` of consecutive k-token chunks (last chunk may be shorter)
  * — the [[WordShingles]] kernel with stride = k instead of 1, and the same
  * rationale: the composable `transform(sequence(...), i ->
  * array_join(slice(...)))` formulation runs interpreted (higher-order
  * functions are `CodegenFallback`), while this is one monomorphic static
  * call inside whole-stage codegen. Used by the boilerplate operators
  * ([[graft.ext.Boilerplate]]); tokenization matches `split(text, " ")`
  * exactly so the DuckDB oracle formulation is unchanged.
  */
case class WordChunks(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"chunk size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_chunks"

  override def nullSafeEval(input: Any): Any =
    WordChunks.compute(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordChunks.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordChunks =
    copy(child = newChild)
}

object WordChunks {
  private val SPACE = UTF8String.fromString(" ")

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length
    val count = (n + k - 1) / k
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      val start = i * k
      val end = math.min(start + k, n)
      out(i) = UTF8String.concatWs(SPACE,
        java.util.Arrays.copyOfRange(toks, start, end): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def chunks(text: Column, k: Int): Column =
    ColumnBridge.column(WordChunks(ColumnBridge.expression(text), k))
}
