package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst Expressions.
  *
  * Spark 4 wraps Columns in ColumnNodes; the converters live in
  * `private[sql]` scope, so this one-file shim sits under
  * `org.apache.spark.sql` to lift them for graft's custom expressions
  * (the standard pattern for third-party Catalyst extensions that do not
  * go through SparkSessionExtensions). */
object ColumnShim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (the `Dataset.ofRows` bridge,
    * `private[sql]` upstream) — used by graft's custom logical operators. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a builder as a temp SQL function on a live session (the
    * session-local twin of SparkSessionExtensions.injectFunction, for
    * sessions created without `spark.sql.extensions`). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** `AbstractDataType` is `private[sql]`, which makes
    * `ExpectsInputTypes.inputTypes` unimplementable from outside the
    * sql package BY NAME — this transparent alias (legal here, usable
    * anywhere) is the standard bridge. */
  type ADT = org.apache.spark.sql.types.AbstractDataType
}
