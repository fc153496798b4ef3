package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** N-step ordered conversion funnel (the reference notebook's 3-step
  * view→click→purchase funnel, generalized to any step list).
  *
  * Semantics: a user completes step i when an event of type `steps(i)`
  * occurs STRICTLY after the user's earliest completion time of step
  * i−1. The strict-< makes same-instant steps non-qualifying, so tie
  * order within one timestamp can never change the result — the
  * property that keeps the answer engine-portable.
  *
  * Shape (the 100 TB concern): the N−1 running conditional minima and
  * the per-user step flags all share ONE window/grouping key, so Spark
  * plans a single Exchange(user) + one sort chain — the cost is one
  * shuffle of the event stream regardless of N, never N passes.
  *
  * Output: one row — `n_users` plus one `n_<alias>` column per step
  * (count of users whose funnel reached that step).
  */
object Funnel {

  /** @param orderCols  total order within a user (timestamp first, then
    *                   a unique tiebreak column); the first column is the
    *                   step-completion "time" compared with strict-<.
    * @param stepAliases output-column names (defaults to the step values)
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             orderCols: Seq[String], steps: Seq[String],
             stepAliases: Seq[String] = Nil): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val aliases = if (stepAliases.nonEmpty) stepAliases else steps
    require(aliases.length == steps.length,
      "stepAliases must match steps 1:1")
    require(aliases.distinct.length == aliases.length,
      s"duplicate step aliases: $aliases — repeated step types need distinct aliases")
    val tsCol = orderCols.head
    val w = Window.partitionBy(col(userCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def stepCond(i: Int) =
      if (i == 0) col(typeCol) === steps(i)
      else col(typeCol) === steps(i) && col(s"_f${i - 1}") < col(tsCol)
    // running earliest completion time of each funnel prefix; the last
    // step needs no minimum of its own (nothing comes after it).
    val withMins = steps.indices.dropRight(1).foldLeft(events) { (df, i) =>
      df.withColumn(s"_f$i", min(when(stepCond(i), col(tsCol))).over(w))
    }
    val flags = steps.indices.map(i =>
      max(when(stepCond(i), 1).otherwise(0)).as(s"_s$i"))
    val perUser = withMins.groupBy(col(userCol))
      .agg(flags.head, flags.tail: _*)
    perUser.agg(count(lit(1)).as("n_users"),
      steps.indices.map(i =>
        sum(col(s"_s$i")).cast("long").as(s"n_${aliases(i)}")): _*)
  }
}
