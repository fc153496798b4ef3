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
}
