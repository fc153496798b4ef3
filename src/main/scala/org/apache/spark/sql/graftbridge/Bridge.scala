package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils), so
  * libraries that ship native Catalyst expressions expose them through a
  * shim in an `org.apache.spark.sql` subpackage — the established pattern
  * in public Spark extension libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True iff no DataFrame/table cache entries remain in the session —
    * lets tests assert operators release their internal `persist()`s
    * (`SharedState.cacheManager` is `private[sql]`).
    */
  def cacheIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
