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

  /** Register a SQL function builder on an already-running session (the
    * `functionRegistry` is `private[sql]`; production deployments should prefer the
    * `spark.sql.extensions` path — [[graft.GraftExtensions]]).
    */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                           builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
