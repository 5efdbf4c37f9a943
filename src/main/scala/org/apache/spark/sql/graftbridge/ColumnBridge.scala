package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column⇄Expression converters (Spark 4 moved Column to
  * a ColumnNode representation; `classic.ExpressionUtils` is the supported internal
  * shim). Living under `org.apache.spark.sql` grants the access — the standard pattern
  * for Catalyst-level extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `might_contain(bloomBytes, longValue)` over Spark's Bloom-filter probe
    * expression (`BloomFilterMightContain` — codegen'd, lazily deserializes the
    * filter once per task). Not exposed through `functions._` or the SQL
    * registry, so the Column is built here from the Catalyst node directly.
    * `bloom` must be a foldable BinaryType expression (e.g. a literal of the
    * bytes `DataFrameStatFunctions.bloomFilter` produced); `value` a LongType
    * (xxhash64 of the probed column, matching the build side's hashing).
    */
  def bloomMightContain(bloom: Column, value: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ExpressionUtils.expression(bloom), ExpressionUtils.expression(value)))

  /** Throw a proper `AnalysisException` (its plain-message constructor is
    * `protected[sql]`, so extension libraries route through this bridge) —
    * used by [[graft.GraftExtensions]] to reject malformed function
    * arguments at analysis time instead of leaking a ClassCastException.
    */
  def analysisError(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INTERNAL_ERROR", messageParameters = Map("message" -> msg)) {
      override def getMessage: String = msg
    }

  /** Register a SQL function builder on an already-running session (the
    * `functionRegistry` is `private[sql]`; production deployments should prefer the
    * `spark.sql.extensions` path — [[graft.GraftExtensions]]).
    */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                           builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
