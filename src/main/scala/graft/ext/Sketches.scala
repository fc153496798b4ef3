package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch aggregations — the sublinear-state summaries a 100 TB profile
  * pass runs where exact answers would shuffle the world:
  *
  *  - `approx_count_distinct` is HyperLogLog++: fixed kilobytes of state
  *    per group vs a full distinct shuffle; mergeable across partitions,
  *    so the aggregation stays one pass with map-side partials.
  *  - `percentile_approx` is a mergeable quantile sketch (KLL-family):
  *    rank queries without a global sort.
  *
  * Sketch outputs are engine-specific (no DuckDB oracle can bit-match
  * them); correctness is bounded-error agreement with the exact answers,
  * asserted in SketchesSpec, and the driver's rows-only check covers the
  * query shape.
  */
object Sketches {

  /** Per-event-type profile: approximate distinct users (2% target rsd)
    * and approximate value quantiles, next to the exact row count.
    */
  def eventTypeProfile(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(2000)).as("p50_value"),
        percentile_approx(col("value"), lit(0.95), lit(2000)).as("p95_value"))
}
