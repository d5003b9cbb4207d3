package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal classic-backend bridge for graft's custom Catalyst
  * expressions. Spark 4 hides Column ⇄ Expression conversion behind
  * `private[sql]` ([[org.apache.spark.sql.classic.ExpressionUtils]]);
  * extension libraries that ship native codegen expressions need this
  * two-method shim in the sql package namespace. No Spark internals are
  * reimplemented here — calls delegate to Spark's own utilities.
  */
package object graftbridge {

  /** Wrap a catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its catalyst Expression (classic backend). */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
