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
    // Tie-break in the right id's NATIVE type: casting to long would turn a
    // string UUID id into null and make the equal-timestamp winner
    // nondeterministic. Any orderable type works as-is.
    val ridType = right.schema(rightId).dataType
    // ALL right-side values travel in ONE struct so the carry is
    // row-consistent: a right row whose valueCol happens to be null must
    // still be "the latest row" — per-column ignoreNulls carries would
    // stitch together a chimera of different right rows.
    val rvType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c).copy(name = c)))
    val tagged =
      left.select(
        (keys.map(col) :+ col(tsCol) :+ lit(0).as("_is_right") :+
          lit(null).cast(ridType).as("_rid")) ++
          leftCols.filterNot(c => keys.contains(c) || c == tsCol).map(col) :+
          lit(null).cast(rvType).as("_rv"): _*)
      .unionByName(
        right.select(
          (keys.map(col) :+ col(tsCol) :+ lit(1).as("_is_right") :+
            col(rightId).as("_rid")) :+
            struct(valueCols.map(col): _*).as("_rv"): _*),
        allowMissingColumns = true)
    // right rows sort BEFORE left rows at an equal timestamp (<= policy),
    // and by rightId among themselves (largest-last wins the carry).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_is_right").desc, col("_rid").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.withColumn("_carried", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_is_right") === 0)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"_carried.$c").as(s"asof_$c")): _*)
  }
}
