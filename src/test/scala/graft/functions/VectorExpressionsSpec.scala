package graft.functions

import graft.SparkTestBase
import graft.ext.SimSearch
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs = Seq(
    (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
    (Seq(0.1f, -0.2f, 0.3f), Seq(-0.4f, 0.5f, -0.6f)),
    (Seq.tabulate(64)(i => math.sin(i).toFloat), Seq.tabulate(64)(i => math.cos(i).toFloat))
  ).toDF("a", "b")

  test("native dot (floatDot -> VecDot) equals the composable aggregate/zip_with formulation") {
    val out = vecs.select(
      VectorFunctions.floatDot(col("a"), col("b")).as("native"),
      SimSearch.dotGeneric(col("a"), col("b")).as("generic")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native ${r.getDouble(0)} != generic ${r.getDouble(1)}"))
  }

  test("native VecSqDist equals the composable zip_with fold bit-for-bit " +
      "on float and double arrays, and handles mixed element types") {
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }), lit(0.0), (acc, x) => acc + x)
    val out = vecs.select(
      VectorFunctions.vecSqDist(col("a"), col("b")).as("native"),
      hof(col("a"), col("b")).as("generic")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native ${r.getDouble(0)} != generic ${r.getDouble(1)}"))
    val dbl = vecs.select(col("a").cast("array<double>").as("a"),
      col("b").cast("array<double>").as("b"))
    dbl.select(VectorFunctions.vecSqDist(col("a"), col("b")).as("native"),
        hof(col("a"), col("b")).as("generic")).collect()
      .foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // mixed float/double sides: float is widened exactly, same result
    val mixed = vecs.select(col("a"),
      col("b").cast("array<double>").as("b"))
    mixed.select(VectorFunctions.vecSqDist(col("a"), col("b")).as("native"),
        hof(col("a"), col("b")).as("generic")).collect()
      .foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // known value: (1-4)^2 + (2-5)^2 + (3-6)^2 = 27
    val k = vecs.limit(1)
      .select(VectorFunctions.vecSqDist(col("a"), col("b"))).head()
    assert(k.getDouble(0) == 27.0)
  }

  test("native VecDot equals the composable fold bit-for-bit on float, " +
      "double, and mixed arrays") {
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b,
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    for (df <- Seq(vecs,
        vecs.select(col("a").cast("array<double>").as("a"),
          col("b").cast("array<double>").as("b")),
        vecs.select(col("a"), col("b").cast("array<double>").as("b")))) {
      df.select(VectorFunctions.vecDot(col("a"), col("b")).as("n"),
          hof(col("a"), col("b")).as("g")).collect()
        .foreach(r => assert(r.getDouble(0) == r.getDouble(1),
          s"native ${r.getDouble(0)} != generic ${r.getDouble(1)}"))
    }
  }

  test("HOF null semantics preserved: a length mismatch or a null element " +
      "yields NULL, exactly like the zip_with fold (never a partial sum)") {
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b,
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val mismatch = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("a", "b")
    val r = mismatch.select(
      VectorFunctions.vecDot(col("a"), col("b")).as("n"),
      hofDot(col("a"), col("b")).as("g"),
      VectorFunctions.vecSqDist(col("a"), col("b")).as("ns")).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2),
      s"length mismatch must be NULL on every path: $r")
    val nullElem = Seq((Seq(Option(1f), Option.empty[Float]),
      Seq(Option(1f), Option(2f)))).toDF("a", "b")
    val r2 = nullElem.select(
      VectorFunctions.vecDot(col("a"), col("b")).as("n"),
      hofDot(col("a"), col("b")).as("g")).head()
    assert(r2.isNullAt(0) && r2.isNullAt(1),
      s"null element must be NULL on both paths: $r2")
  }

  test("known value and norm") {
    val r = vecs.limit(1).select(
      VectorFunctions.floatDot(col("a"), col("b")),
      VectorFunctions.floatNorm(col("a"))).head()
    assert(approx(r.getDouble(0), 32.0))
    assert(approx(r.getDouble(1), math.sqrt(14)))
  }

  test("null inputs propagate null") {
    val df = Seq((Some(Seq(1f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val r = df.select(VectorFunctions.floatDot(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("codegen compiles with several instances in one projection (cosine shape)") {
    // Regression: hardcoded codegen locals collided when a cosine projection
    // emitted dot(a,b), dot(a,a), dot(b,b) into one scope — Janino threw a
    // CompileException and every cosine fell back to interpreted eval. This
    // compiles the projection directly so a recurrence fails loudly instead
    // of silently de-optimizing.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val at = ArrayType(FloatType)
    val a = BoundReference(0, at, nullable = true)
    val b = BoundReference(1, at, nullable = true)
    val proj = GenerateUnsafeProjection.generate(
      Seq(VecDot(a, b), VecDot(a, a), VecDot(b, b)))
    val row = InternalRow(
      ArrayData.toArrayData(Array(1f, 2f)), ArrayData.toArrayData(Array(3f, 4f)))
    val out = proj(row)
    assert(out.getDouble(0) == 11.0)
    assert(out.getDouble(1) == 5.0)
    assert(out.getDouble(2) == 25.0)
  }

  test("interpreted eval path (outside codegen) agrees") {
    // force interpreted projection by evaluating the expression directly
    val e = VecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1f, 2f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3f, 4f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null) == 11.0)
  }
}
