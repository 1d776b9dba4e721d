package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression
  * converters (Spark 4 moved them behind the Column-node API). Lives in
  * a child package of `org.apache.spark.sql` solely to satisfy the
  * access modifier — the standard pattern for Catalyst extensions that
  * expose custom expressions as user-facing Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to the session's `private[sql]` function registry, so the
  * engine's native expressions can be registered as SQL functions in an
  * ALREADY-BUILT session (tests, notebooks). New sessions should prefer
  * the public path: `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object RegistryBridge {
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       id: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
}
