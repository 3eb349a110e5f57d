package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` API: converts between the public
  * `Column` and catalyst `Expression` so graft's native expressions (e.g.
  * graft.functions.RollingHash) can be exposed as Columns. Lives in the
  * org.apache.spark.sql package solely for access; no Spark internals are
  * modified. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function builder on a LIVE session (the config-time path is
    * `spark.sql.extensions=graft.GraftExtensions`). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
