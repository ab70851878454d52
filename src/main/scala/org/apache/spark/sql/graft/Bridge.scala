package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.{Column, SparkSession}

/**
 * Minimal bridge into Spark's `private[sql]` Column/registry plumbing.
 *
 * `Column <-> Expression` conversion and the session `FunctionRegistry` are
 * `private[sql]` in Spark 4.x; a sub-package of `org.apache.spark.sql` is the
 * sanctioned-visibility way to reach them without forking Spark. This file is
 * the ONLY place in the project allowed to touch Spark internals — everything
 * in `graft.*` goes through these three methods.
 */
object Bridge {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Register a temp SQL function backed by a Catalyst expression builder, so
    * `expr("name(...)")` and `spark.sql` resolve it (SURVEY §2 O22).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
