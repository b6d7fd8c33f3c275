package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native expressions.
  *
  * Spark 4 made the public Column API implementation-agnostic; the
  * Expression-backed constructors live behind private[sql]
  * (classic.ExpressionUtils). This one-file shim in the sql package is the
  * conventional way third-party Catalyst expressions obtain Column
  * wrappers without reflection.
  */
object graftbridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Unwrap a sort-ordered Column (`col.desc`/`.asc`) to its bare key
    * column; identity for anything else. Needed wherever an ordering
    * Seq doubles as a grouping key set (GlobalOrder's distinct-keys
    * assert): grouping by a SortOrder is not evaluable. */
  def stripSortOrder(c: Column): Column = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder => Column(so.child)
    case _ => c
  }

  /** Analyzed logical plan of a DataFrame (for building custom logical
    * nodes over already-resolved child plans). */
  def analyzed(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a (resolved) logical plan back into a DataFrame. */
  def ofRows(
      s: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
