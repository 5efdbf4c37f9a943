package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the float-vector dot product — the hot primitive of
  * similarity search over `array<float>` embedding columns.
  *
  * Rationale (SURVEY.md §7.4 / builder "functions, not UDFs"): the composable
  * formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)` allocates an intermediate
  * array and runs the lambda through HigherOrderFunction plumbing per element; this
  * expression generates a tight primitive loop inside WholeStageCodegen (and a
  * matching interpreted eval), with identical index-ordered summation semantics so
  * results are bit-equal to the composable path.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Locals must be fresh per expression instance: a cosine projection emits
      // three FloatVecDots into one codegen scope, and fixed names collide.
      val n = ctx.freshName("vecLen")
      val acc = ctx.freshName("vecAcc")
      val i = ctx.freshName("vecIdx")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Column-level wrappers for the native vector expressions. */
object VectorFunctions {
  /** Codegen'd dot product over two `array<float>` columns (double accumulator). */
  def floatDot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd L2 norm of an `array<float>` column. */
  def floatNorm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(floatDot(a, a))
  }
}
