package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Shared skeleton for the native binary vector folds (dot product, squared
  * L2) — the hot primitives of similarity search, PQ encoding, Lloyd
  * assignment and power iteration over `array<float|double>` columns.
  *
  * Rationale (SURVEY.md §7.4 / "functions, not UDFs"): the composable
  * formulation `aggregate(zip_with(a, b, f), 0.0, _+_)` allocates an
  * intermediate array and runs the lambda through HigherOrderFunction
  * plumbing per element; these expressions generate a tight primitive loop
  * inside WholeStageCodegen (measured 2× at sf0.1 and 4× at sf1.0 on
  * q_pq_adc_bigbook, SCALE.md r15) with EXACTLY the composable form's
  * semantics, null behavior included: zip_with pads a length mismatch with
  * nulls and the double fold propagates them, so a mismatch or a null
  * element yields NULL here too (never a silent partial result), and in the
  * null-free equal-length case the index-ordered double accumulation is
  * bit-equal — swapping one for the other changes no hashes
  * (VectorExpressionsSpec holds all of this differentially).
  */
abstract class BinaryVecFold extends BinaryExpression {

  /** One fold step for the interpreted path; must match [[genStep]]. */
  protected def foldStep(acc: Double, x: Double, y: Double): Double

  /** Java statement(s) updating `acc` from element values `x`, `y`; must
    * match [[foldStep]] operation-for-operation (IEEE order matters).
    */
  protected def genStep(ctx: CodegenContext, acc: String, x: String,
                        y: String): String

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
  // null even on non-null inputs (length mismatch / null element), exactly
  // like the zip_with fold this replaces — without this override codegen
  // would assume non-null output and read garbage
  override def nullable: Boolean = true

  private lazy val leftIsFloat = elemType(left.dataType).contains(FloatType)
  private lazy val rightIsFloat = elemType(right.dataType).contains(FloatType)

  // When BOTH sides are ArrayType(_, containsNull = false), null elements
  // are impossible by type and the per-element isNullAt branch is dropped
  // from the hot loop (interpreted and generated alike) — semantics are
  // unchanged; the expression can still return null on a length mismatch.
  private lazy val elemsNullFree: Boolean =
    (left.dataType, right.dataType) match {
      case (ArrayType(_, ln), ArrayType(_, rn)) => !ln && !rn
      case _ => false
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!elemsNullFree && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xd = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yd = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      s = foldStep(s, xd, yd)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getL = if (leftIsFloat) "getFloat" else "getDouble"
      val getR = if (rightIsFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("vfLen")
      val acc = ctx.freshName("vfAcc")
      val i = ctx.freshName("vfIdx")
      val xd = ctx.freshName("vfX")
      val yd = ctx.freshName("vfY")
      val body =
        if (elemsNullFree)
          s"""
             |    double $xd = (double) $a.$getL($i);
             |    double $yd = (double) $b.$getR($i);
             |    ${genStep(ctx, acc, xd, yd)}
           """.stripMargin
        else
          s"""
             |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
             |      ${ev.isNull} = true;
             |    } else {
             |      double $xd = (double) $a.$getL($i);
             |      double $yd = (double) $b.$getR($i);
             |      ${genStep(ctx, acc, xd, yd)}
             |    }
           """.stripMargin
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |$body
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Native dot product over `array<float|double>` columns — bit-equal to
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, _+_)`. The Lloyd-assignment / power-iteration / pair-cosine /
  * brute-force-ANN hot loop.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryVecFold {
  override def prettyName: String = "vec_dot"
  override protected def foldStep(acc: Double, x: Double, y: Double): Double =
    acc + x * y
  override protected def genStep(ctx: CodegenContext, acc: String, x: String,
                                 y: String): String =
    s"$acc += $x * $y;"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Native squared-L2 distance over `array<float|double>` columns — bit-equal
  * to `aggregate(zip_with(a, b, (x, y) => {val d = x − y; d*d}), 0.0, _+_)`.
  * The PQ-encode hot loop (n·m·|codes| evaluations per corpus scan).
  */
case class VecSqDist(left: Expression, right: Expression)
    extends BinaryVecFold {
  override def prettyName: String = "vec_sq_dist"
  override protected def foldStep(acc: Double, x: Double, y: Double): Double = {
    val d = x - y
    acc + d * d
  }
  override protected def genStep(ctx: CodegenContext, acc: String, x: String,
                                 y: String): String = {
    val d = ctx.freshName("vfDelta")
    s"double $d = $x - $y; $acc += $d * $d;"
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSqDist =
    copy(left = newLeft, right = newRight)
}

/** Column-level wrappers for the native vector expressions. */
object VectorFunctions {
  /** Codegen'd dot product over two `array<float|double>` columns (double
    * accumulator, index-ordered fold — bit-equal to the zip_with/aggregate
    * form, NULL on length mismatch or null element like it).
    */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd squared-L2 distance — same contract as [[vecDot]]. */
  def vecSqDist(a: Column, b: Column): Column =
    ColumnBridge.column(VecSqDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd dot product; kept as the float-path name its call sites use
    * ([[VecDot]] handles `array<float>` identically).
    */
  def floatDot(a: Column, b: Column): Column = vecDot(a, b)

  /** Codegen'd L2 norm of an `array<float|double>` column. */
  def floatNorm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(floatDot(a, a))
  }
}
