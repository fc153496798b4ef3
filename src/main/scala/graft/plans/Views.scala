package graft.plans

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.gold.Gold
import graft.silver.Silver

/** SQL surface: registers the source tables, the silver star, and the
  * gold marts as session views, so a SQL-only user of the reference
  * (whose queries all ran in Postgres) can switch and keep writing SQL —
  * `spark.sql("SELECT * FROM dm_station_popularity")` — against lazily
  * computed, Catalyst-optimized definitions. Combined with
  * [[graft.functions.GraftExtensions]] the custom functions are SQL-
  * visible too.
  */
object Views {

  /** Register everything under the given source dir; returns view names. */
  def register(spark: SparkSession, srcDir: String): Seq[String] = {
    val nation = Tables.nation(spark, srcDir)
    val region = Tables.region(spark, srcDir)
    val customer = Tables.customer(spark, srcDir)
    val supplier = Tables.supplier(spark, srcDir)
    val orders = Tables.orders(spark, srcDir)
    val lineitem = Tables.lineitem(spark, srcDir)

    val base = Seq(
      "nation" -> nation, "region" -> region, "customer" -> customer,
      "supplier" -> supplier, "orders" -> orders, "lineitem" -> lineitem,
      "events" -> Tables.events(spark, srcDir),
      "documents" -> Tables.documents(spark, srcDir),
      "embeddings" -> Tables.embeddings(spark, srcDir))
    val dimDate = Silver.dimDate(orders, lineitem)
    val silver = Seq(
      "dim_station" -> Silver.dimStation(nation, region, customer, supplier),
      "dim_user" -> Silver.dimUser(customer, orders),
      "dim_date" -> dimDate,
      "fact_trips" -> Silver.factTrips(lineitem, orders, customer, supplier))
    val stationPop = Gold.stationPopularity(lineitem, orders, customer, supplier, nation)
    val gold = Seq(
      "dm_daily_trip_summary" -> Gold.dailyTripSummary(lineitem, orders, dimDate),
      "dm_station_popularity" -> stationPop,
      "dm_popular_routes" ->
        Gold.popularRoutes(lineitem, orders, customer, supplier, nation),
      "dm_user_behavior" -> Gold.userBehavior(orders, customer),
      "v_station_popularity" -> Gold.stationPopularityView(stationPop))

    val all = base ++ silver ++ gold
    all.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    all.map(_._1)
  }
}
