package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.silver.Silver

class SilverSpec extends AnyFunSuite {
  import SparkTestBase._

  private def orders = Tables.orders(spark, sfDir)
  private def lineitem = Tables.lineitem(spark, sfDir)
  private def customer = Tables.customer(spark, sfDir)
  private def supplier = Tables.supplier(spark, sfDir)
  private def nation = Tables.nation(spark, sfDir)
  private def region = Tables.region(spark, sfDir)

  test("dim_date covers every day of the span exactly once") {
    val dd = Silver.dimDate(orders, lineitem).cache()
    val n = dd.count()
    val b = dd.agg(min("cal_date").as("lo"), max("cal_date").as("hi"),
      countDistinct("date_id").as("d")).head()
    val span = b.getDate(1).toLocalDate.toEpochDay - b.getDate(0).toLocalDate.toEpochDay + 1
    assert(n === span)
    assert(b.getLong(2) === n)
    dd.unpersist()
  }

  test("day_of_week follows the Postgres convention (0=Sunday) and matches java.time") {
    Silver.dimDate(orders, lineitem)
      .select("cal_date", "day_of_week", "is_weekend").limit(400)
      .collect().foreach { r =>
        val expected = r.getDate(0).toLocalDate.getDayOfWeek.getValue % 7 // ISO Mon=1..Sun=7 → Sun=0
        assert(r.getInt(1) === expected, s"on ${r.getDate(0)}")
        assert(r.getBoolean(2) === (expected == 0 || expected == 6))
      }
  }

  test("dim_user is the full domain cross-product plus the null row") {
    val du = Silver.dimUser(customer, orders).cache()
    val segs = customer.select("c_mktsegment").distinct().count()
    val stats = orders.select("o_orderstatus").distinct().count()
    val pr = orders.select(substring(col("o_orderpriority"), 1, 1).cast("int").as("p"))
      .agg(min("p"), max("p")).head()
    val ranks = pr.getInt(1) - pr.getInt(0) + 1 + 1 // series + null row
    assert(du.count() === segs * stats * ranks)
    assert(du.filter(col("priority_rank").isNull).count() === segs * stats)
    du.unpersist()
  }

  test("fact FK integrity: every station/user key resolves in its dim") {
    val fact = Silver.factTrips(lineitem, orders, customer, supplier)
    val dimS = Silver.dimStation(nation, region, customer, supplier)
    val dimU = Silver.dimUser(customer, orders)
    assert(fact.join(dimS, fact("start_station_key") === dimS("station_key"), "left_anti").count() === 0)
    assert(fact.join(dimS, fact("end_station_key") === dimS("station_key"), "left_anti").count() === 0)
    assert(fact.join(dimU, fact("user_type_key") === dimU("user_type_key"), "left_anti").count() === 0)
  }

  test("surrogate keys are deterministic across recomputation") {
    val a = Silver.dimStation(nation, region, customer, supplier)
      .select("station_key").collect().map(_.getString(0)).sorted
    val b = Silver.dimStation(nation, region, customer, supplier)
      .select("station_key").collect().map(_.getString(0)).sorted
    assert(a.sameElements(b))
  }
}
