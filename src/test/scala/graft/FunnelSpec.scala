package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  // (user, type, ts, id) — hand-built funnel edge cases
  private def events(rows: (Long, String, Long, Long)*) =
    rows.toDF("user_id", "event_type", "ts_ms", "event_id")

  private def run(df: org.apache.spark.sql.DataFrame, steps: String*) =
    Funnel.funnel(df, "user_id", "event_type", Seq("ts_ms", "event_id"),
      steps.toSeq).head()

  test("3-step funnel: order matters, same-instant steps do not qualify") {
    val df = events(
      (1L, "view", 1L, 1L), (1L, "click", 2L, 2L), (1L, "purchase", 3L, 3L),
      // click BEFORE the first view: step 2 never completes
      (2L, "click", 1L, 4L), (2L, "view", 2L, 5L), (2L, "purchase", 3L, 6L),
      // click at the SAME instant as the view: strict-< rejects it
      (3L, "view", 5L, 7L), (3L, "click", 5L, 8L),
      // purchase only: no step completes
      (4L, "purchase", 9L, 9L))
    val r = run(df, "view", "click", "purchase")
    assert(r.getLong(0) === 4)  // n_users
    assert(r.getLong(1) === 3)  // users 1,2,3 viewed
    assert(r.getLong(2) === 1)  // only user 1's click came after a view
    assert(r.getLong(3) === 1)  // only user 1 completed the funnel
  }

  test("a later re-occurrence completes a step the first occurrence missed") {
    // the user's FIRST click precedes the view, but a second click after
    // the view must still complete step 2 (running minima, not first-only)
    val df = events(
      (1L, "click", 1L, 1L), (1L, "view", 2L, 2L), (1L, "click", 3L, 3L))
    val r = run(df, "view", "click")
    assert(r.getLong(1) === 1 && r.getLong(2) === 1)
  }

  test("N=4 funnel counts are monotonically non-increasing down the steps") {
    val df = events(
      (1L, "view", 1L, 1L), (1L, "click", 2L, 2L),
      (1L, "purchase", 3L, 3L), (1L, "signup", 4L, 4L),
      (2L, "view", 1L, 5L), (2L, "click", 2L, 6L), (2L, "purchase", 3L, 7L),
      (3L, "view", 1L, 8L), (3L, "signup", 2L, 9L))
    val r = run(df, "view", "click", "purchase", "signup")
    val counts = (1 to 4).map(r.getLong)
    assert(counts === Seq(3L, 2L, 2L, 1L))
    assert(counts === counts.sorted.reverse, "funnel must narrow monotonically")
  }

  test("the 3-step instantiation matches the hand-rolled gold_funnel shape") {
    // one window-key shuffle regardless of N: the plan carries exactly one
    // exchange on user_id before the final single-row aggregation.
    val df = Tables.events(spark, sfDir).select(col("user_id"),
      col("event_type"), unix_millis(col("ts")).as("ts_ms"), col("event_id"))
    val out = Funnel.funnel(df, "user_id", "event_type",
      Seq("ts_ms", "event_id"), Seq("view", "click", "purchase"))
    out.collect()
    // AQE's toString prints final AND initial plans — count only the final
    // section or every exchange is double-counted.
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val userExchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).length
    assert(userExchanges === 1,
      s"expected ONE user_id exchange for the whole funnel, got $userExchanges:\n$plan")
  }

  test("duplicate step aliases are rejected") {
    intercept[IllegalArgumentException] {
      Funnel.funnel(events((1L, "view", 1L, 1L)), "user_id", "event_type",
        Seq("ts_ms", "event_id"), Seq("view", "view"))
    }
  }
}
