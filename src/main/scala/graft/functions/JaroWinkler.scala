package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native `jaro_winkler(a, b)` — the standard record-linkage string
  * similarity (Jaro 1989; Winkler 1990): match-window character agreement
  * with a transposition penalty, boosted by up to 4 chars of common prefix
  * when the base similarity clears 0.7. Spark ships levenshtein but no
  * Jaro family, yet JW is THE comparator classical entity-resolution
  * stacks (Fellegi-Sunter era through Splink) default to for person/
  * product names — edit distance over-penalizes transpositions, which
  * human-typed names are full of.
  *
  * Semantics match DuckDB's `jaro_winkler_similarity` (the oracle):
  * matches within window ⌊max(|a|,|b|)/2⌋−1, transpositions = half the
  * out-of-order matches, jaro = (m/|a| + m/|b| + (m−t)/m)/3, prefix boost
  * `jaro + ℓ·0.1·(1−jaro)` with ℓ ≤ 4 applied only when jaro > 0.7,
  * empty input → 0. Comparison is per UTF-16 char (ASCII-safe; the
  * corpus contract of `q_multimodal_hist` applies).
  *
  * Why an expression: a blocked linkage pass evaluates this once per
  * candidate pair; codegen keeps the double loop allocation-free (two
  * reused boolean flag arrays per thread) inside the whole-stage pipeline
  * instead of a Scala UDF's boxing + serialization wall.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions
                           .codegen.CodegenContext,
                         ev: org.apache.spark.sql.catalyst.expressions
                           .codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression)
      : JaroWinkler = copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  private val flagsLocal = new ThreadLocal[(Array[Boolean], Array[Boolean])] {
    override def initialValue(): (Array[Boolean], Array[Boolean]) =
      (new Array[Boolean](256), new Array[Boolean](256))
  }

  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val s = ua.toString
    val t = ub.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    if (s == t) return 1.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val (sf0, tf0) = flagsLocal.get()
    val sFlags = if (n <= sf0.length) sf0 else new Array[Boolean](n)
    val tFlags = if (m <= tf0.length) tf0 else new Array[Boolean](m)
    java.util.Arrays.fill(sFlags, 0, n, false)
    java.util.Arrays.fill(tFlags, 0, m, false)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tFlags(j) && s.charAt(i) == t.charAt(j)) {
          sFlags(i) = true; tFlags(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk matched chars in order on both sides
    var trans = 0
    var j = 0
    i = 0
    while (i < n) {
      if (sFlags(i)) {
        while (!tFlags(j)) j += 1
        if (s.charAt(i) != t.charAt(j)) trans += 1
        j += 1
      }
      i += 1
    }
    val md = matches.toDouble
    val jaro = (md / n + md / m + (md - trans / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(n, m))
    while (l < maxL && s.charAt(l) == t.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
