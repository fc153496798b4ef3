package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation gate — the admission control a training-data
  * pipeline runs before a batch is allowed into the corpus (schema-level
  * cousin of the reference's NOT NULL / ON CONFLICT constraints, which
  * Postgres enforced per-row; an immutable-files warehouse validates per
  * BATCH instead and quarantines on failure).
  *
  * All checks evaluate in ONE distributed pass: each check is an
  * aggregate column (conditional counts, count-minus-distinct, …), so the
  * whole gate is a single partial+final aggregation over the input — no
  * per-check scans, no driver-side row handling. The wide 1-row aggregate
  * is then unpivoted to one row per check on the driver side of the agg
  * (an O(#checks) projection).
  */
object Quality {

  /** Run `checks` (name → aggregate expression counting violations) in
    * one pass. Returns (check_name, n_violations, pass) per check.
    */
  def expectations(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val aggs = checks.zipWithIndex.map { case ((_, c), i) =>
      // an EMPTY batch must read as zero violations (pass), not NULL:
      // sum() over no rows is NULL, and a NULL pass flag would neither
      // pass nor fail the gate.
      coalesce(c.cast("long"), lit(0L)).as(s"_v$i")
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check_name"), col(s"_v$i").as("n_violations"))
    }
    agged.select(explode(array(rows: _*)).as("c"))
      .select(col("c.check_name"), col("c.n_violations"),
        (col("c.n_violations") === 0L).as("pass"))
  }

  /** Conditional violation count for row-level predicates. */
  def countWhere(pred: Column): Column = count_if(pred)

  /** The standard gate for the events feed: key uniqueness, required
    * fields, domain membership, and value sanity.
    */
  def eventsGate(events: DataFrame): DataFrame =
    expectations(events, Seq(
      "event_id_unique" -> (count(lit(1)) - countDistinct(col("event_id"))),
      "event_type_in_domain" -> countWhere(col("event_type").isNull ||
        !col("event_type").isin("click", "error", "purchase", "signup", "view")),
      "ts_not_null" -> countWhere(col("ts").isNull),
      "user_id_not_null" -> countWhere(col("user_id").isNull),
      "value_non_negative" -> countWhere(col("value") < 0)))
}
