package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the feature-store primitive a training
  * pipeline needs for leakage-free joins: each left row picks up the
  * LATEST right row with `right.ts <= left.ts` for the same key.
  *
  * Implemented by composition (preference (a) of the custom-operator
  * ladder): tag both sides, union, and carry right-side values forward
  * with `last(..., ignoreNulls)` over a (key, time)-ordered running
  * window. ONE shuffle on the key — same cost as a plain equi-join —
  * versus the naive inequality-join formulation, which is a per-key
  * cross product. Scales to arbitrarily many right rows per key because
  * state is the running window, not a buffered list.
  *
  * Tie policy: a right row AT the left row's timestamp matches (`<=`);
  * among right rows sharing a timestamp the one with the largest
  * `rightId` wins (deterministic).
  */
object AsofJoin {

  /** @param left      probe side
    * @param right     value side (columns `valueCols` are carried over)
    * @param keys      equality keys present on both sides
    * @param tsCol     event-time column name present on both sides
    * @param rightId   deterministic tie-break column on the right side
    * @param valueCols right-side columns to attach (renamed asof_<name>)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightId: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val tagged =
      left.select(
        (keys.map(col) :+ col(tsCol) :+ lit(0).as("_is_right") :+
          lit(null).cast("long").as("_rid")) ++
          leftCols.filterNot(c => keys.contains(c) || c == tsCol).map(col) ++
          valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_rv_$c")): _*)
      .unionByName(
        right.select(
          (keys.map(col) :+ col(tsCol) :+ lit(1).as("_is_right") :+
            col(rightId).cast("long").as("_rid")) ++
            valueCols.map(c => col(c).as(s"_rv_$c")): _*),
        allowMissingColumns = true)
    // right rows sort BEFORE left rows at an equal timestamp (<= policy),
    // and by rightId among themselves (largest-last wins the carry).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_is_right").desc, col("_rid").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"_rv_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_is_right") === 0)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }
}
