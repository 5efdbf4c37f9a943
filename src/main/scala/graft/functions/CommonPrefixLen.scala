package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native `common_prefix_len(a, b)` → length (in Unicode code points) of the
  * longest common prefix of two strings — the storage-layout primitive behind
  * delta/prefix-encoding estimates: sorted adjacent rows share long prefixes,
  * unsorted ones don't, and the gap IS the compression a sort layout buys.
  * No Spark builtin expresses this without a CodegenFallback higher-order
  * function; this is one monomorphic static call inside whole-stage codegen.
  */
case class CommonPrefixLen(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "common_prefix_len"

  override def nullSafeEval(a: Any, b: Any): Any =
    CommonPrefixLen.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CommonPrefixLen.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixLen =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixLen {
  /** Static kernel shared by interpreted eval and generated code. Compares
    * byte-wise then converts the matched byte span to a code-point count
    * (UTF-8 prefix property: a common byte prefix cut at a code-point
    * boundary IS the common code-point prefix).
    */
  def compute(a: UTF8String, b: UTF8String): Int = {
    val na = a.numBytes(); val nb = b.numBytes()
    val n = math.min(na, nb)
    var i = 0
    while (i < n && a.getByte(i) == b.getByte(i)) i += 1
    // back off a partially-matched multi-byte code point (continuation
    // bytes are 0b10xxxxxx)
    while (i > 0 && i < na && i < nb && (a.getByte(i) & 0xc0) == 0x80) i -= 1
    // byte span → code-point count (substring() is code-point indexed)
    var cp = 0
    var j = 0
    while (j < i) {
      j += UTF8String.numBytesForFirstByte(a.getByte(j))
      cp += 1
    }
    cp
  }

  def commonPrefixLen(a: Column, b: Column): Column =
    ColumnBridge.column(CommonPrefixLen(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
