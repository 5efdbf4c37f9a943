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

/** Native squared-L2 distance over two `array<float|double>` columns — the
  * hot primitive of PQ encoding (n·m·|codes| evaluations per corpus scan).
  * Bit-equal to the composable `aggregate(zip_with(a, b, (x, y) => {val d =
  * x − y; d*d}), 0.0, _+_)`: the accumulator folds (xᵢ − yᵢ)² in index
  * order in doubles, so swapping it in changes no hashes — ProductQuantSpec
  * holds the equality on random vectors. The r15 sf1.0 sweep measured the
  * HOF form dominating q_pq_adc_bigbook (1,024 lambda-plumbed evals per
  * vector); this is the same loop inside WholeStageCodegen.
  */
case class VecSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> on both sides, " +
          s"got (${left.dataType}, ${right.dataType})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_sq_dist"

  private lazy val leftIsFloat = elemType(left.dataType).contains(FloatType)
  private lazy val rightIsFloat = elemType(right.dataType).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xd = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yd = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xd - yd
      s += d * d
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getL = if (leftIsFloat) "getFloat" else "getDouble"
      val getR = if (rightIsFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("sqLen")
      val acc = ctx.freshName("sqAcc")
      val d = ctx.freshName("sqDelta")
      val i = ctx.freshName("sqIdx")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.$getL($i) - (double) $b.$getR($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSqDist =
    copy(left = newLeft, right = newRight)
}

/** Native dot product over `array<float|double>` columns — the
  * element-type-generic sibling of [[FloatVecDot]] (which predates it and
  * stays for the float-only call sites). Bit-equal to
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, _+_)` — the index-ordered double fold — so swapping it into
  * SimSearch.dotGeneric changes no hashes. This is the Lloyd-assignment /
  * power-iteration / pair-cosine hot loop (n·k dot products per pass).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> on both sides, " +
          s"got (${left.dataType}, ${right.dataType})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private lazy val leftIsFloat = elemType(left.dataType).contains(FloatType)
  private lazy val rightIsFloat = elemType(right.dataType).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xd = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yd = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      s += xd * yd
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getL = if (leftIsFloat) "getFloat" else "getDouble"
      val getR = if (rightIsFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("dotLen")
      val acc = ctx.freshName("dotAcc")
      val i = ctx.freshName("dotIdx")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.$getL($i) * (double) $b.$getR($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Column-level wrappers for the native vector expressions. */
object VectorFunctions {
  /** Codegen'd dot product over two `array<float>` columns (double accumulator). */
  def floatDot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd dot product over two `array<float|double>` columns (double
    * accumulator, index-ordered fold — bit-equal to the zip_with/aggregate
    * form).
    */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd squared-L2 distance over two `array<float|double>` columns
    * (double accumulator, index-ordered fold — bit-equal to the
    * zip_with/aggregate form).
    */
  def vecSqDist(a: Column, b: Column): Column =
    ColumnBridge.column(VecSqDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd L2 norm of an `array<float>` column. */
  def floatNorm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(floatDot(a, a))
  }
}
