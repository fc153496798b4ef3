package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample sparse observations onto a
  * fixed-step (key × tick) spine, zero-fill the counts, and carry the
  * last observed value forward (LOCF) — the gap-fill pass that turns an
  * irregular event feed into the dense series downstream models expect.
  *
  * Scale design: the naive form is spine LEFT JOIN aggregated-series,
  * which costs an aggregation shuffle, a join shuffle, and a window
  * shuffle. This implementation instead UNIONS the raw observations with
  * null-valued spine rows and aggregates once: `count(value)` counts only
  * non-null (real) observations, so the spine contributes zeros for free
  * and the whole fill is ONE groupBy shuffle plus the per-key window
  * sort. The spine itself is generated, never materialized as input
  * (ticks × keys rows, trivially small next to the observations).
  */
object TimeSeries {

  /** Fill `raw` (rows of keyCol, tickCol, valueCol — pre-aggregation
    * observations) onto the keys × [lo, hi] step-spaced spine.
    *
    * @param keys   distinct key values (one column named `keyCol`);
    *               bounded (it is broadcast into the spine generator)
    * @param bounds one row (lo, hi) of tick bounds, inclusive
    * @return (keyCol, tickCol, n_obs, value_sum, locf_value): `n_obs`
    *         zero-filled observation count, `value_sum` the per-tick sum
    *         (null on gap ticks), `locf_value` the last non-null
    *         `value_sum` at-or-before the tick (null before the first
    *         observation — LOCF invents nothing).
    */
  def gapFillLocf(raw: DataFrame, keys: DataFrame, bounds: DataFrame,
                  keyCol: String, tickCol: String, valueCol: String,
                  step: Long): DataFrame = {
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"), lit(step))).as(tickCol))
      .crossJoin(broadcast(keys))
      .withColumn(valueCol, lit(null).cast(raw.schema(valueCol).dataType))
    val perTick = raw.select(col(keyCol), col(tickCol), col(valueCol))
      .unionByName(spine.select(col(keyCol), col(tickCol), col(valueCol)))
      .groupBy(col(keyCol), col(tickCol))
      .agg(count(col(valueCol)).as("n_obs"),
        sum(col(valueCol)).as("value_sum"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tickCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perTick.withColumn("locf_value",
      last(col("value_sum"), ignoreNulls = true).over(w))
  }
}
