package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.gold.Gold

/** S9: all four rename views are pure projections — same row count, only
  * aliases change, no nulls introduced.
  */
class GoldViewsSpec extends AnyFunSuite {
  import SparkTestBase._

  private def li = Tables.lineitem(spark, sfDir)
  private def o = Tables.orders(spark, sfDir)
  private def c = Tables.customer(spark, sfDir)
  private def su = Tables.supplier(spark, sfDir)
  private def n = Tables.nation(spark, sfDir)

  test("every rename view preserves cardinality and renames every column") {
    val cases = Seq(
      (Gold.stationPopularity(li, o, c, su, n),
        Gold.stationPopularityView(Gold.stationPopularity(li, o, c, su, n)),
        Set("station_code", "station", "departures", "arrivals", "flow", "traffic")),
      (Gold.dailyTripSummary(li, o, graft.silver.Silver.dimDate(o, li)),
        Gold.dailySummaryView(Gold.dailyTripSummary(li, o, graft.silver.Silver.dimDate(o, li))),
        Set("trip_date", "trip_year", "month", "weekday", "weekend", "trips",
          "quantity", "avg_quantity", "distinct_bikes", "avg_trip_price")),
      (Gold.popularRoutes(li, o, c, su, n),
        Gold.popularRoutesView(Gold.popularRoutes(li, o, c, su, n)),
        Set("route", "origin", "destination", "trips", "avg_days")),
      (Gold.userBehavior(o, c),
        Gold.userBehaviorView(Gold.userBehavior(o, c)),
        Set("segment", "status", "age_years", "orders", "revenue", "avg_order_value")))
    cases.foreach { case (mart, view, expectedCols) =>
      assert(view.columns.toSet === expectedCols)
      assert(view.count() === mart.count())
    }
  }

  test("top-n per group plans a WindowGroupLimit, not a full per-partition rank") {
    val q = SparkEntry.queries("gold_topn_per_group")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    // the rank<=5 filter must push into the window sort as a group limit:
    // each partition keeps a bounded heap instead of ranking every row —
    // at 100 TB the difference between a top-k and a full sort per key.
    assert(plan.contains("WindowGroupLimit"),
      s"expected the rank filter pushed down as WindowGroupLimit:\n$plan")
    // exactly 5 rows per priority class, ranks 1..5
    val perGroup = q.groupBy("o_orderpriority").count().collect()
    assert(perGroup.nonEmpty)
    assert(perGroup.forall(_.getLong(1) === 5L))
  }
}
