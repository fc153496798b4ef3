package graft.plans

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.gold.Gold
import graft.silver.Silver

/** End-to-end orchestration — the reference's transactional ETL procedure
  * and mart-refresh DAG (/root/reference
  * include/sql/silver/silver_load.sql:285-308, dags/gold_dag.py:33-70)
  * restated for an immutable-files warehouse:
  *
  *  - Postgres gave the reference one transaction around the five silver
  *    steps; Spark+parquet has no cross-table transactions, so atomicity
  *    becomes STAGE-THEN-PROMOTE: every table is written to a staging
  *    directory and moved into place only after the whole batch succeeds.
  *    A failed run leaves the live warehouse untouched: a write failure
  *    never reaches promotion, and a promotion failure rolls back every
  *    table already swapped (asides are retained until the whole batch
  *    lands). The remaining window is a hard process crash mid-promote,
  *    which leaves `.old-*` aside directories for manual recovery —
  *    closing that too takes a catalog pointer swap (below).
  *  - The four gold marts are independent, exactly like the reference's
  *    parallel refresh fan-out — they're submitted as concurrent jobs on
  *    the shared SparkSession (Spark's scheduler interleaves stages).
  *
  * The directory-move promotion here targets a filesystem warehouse
  * (local/HDFS renames are atomic). On an object store, the same
  * stage-then-promote protocol is expressed as a catalog pointer swap —
  * write staging prefixes, then update each table's location in the
  * metastore — or delegated to a table format's transactional commit.
  */
object Pipeline {

  /** Build all silver + gold tables from the source dir and atomically
    * promote them under `warehouseDir`. Returns table names written.
    */
  def runFullEtl(spark: SparkSession, srcDir: String, warehouseDir: String): Seq[String] = {
    val nation = Tables.nation(spark, srcDir)
    val region = Tables.region(spark, srcDir)
    val customer = Tables.customer(spark, srcDir)
    val supplier = Tables.supplier(spark, srcDir)
    val orders = Tables.orders(spark, srcDir)
    val lineitem = Tables.lineitem(spark, srcDir)

    val dimDate = Silver.dimDate(orders, lineitem)
    val tables: Seq[(String, DataFrame)] = Seq(
      "dim_station" -> Silver.dimStation(nation, region, customer, supplier),
      "dim_user" -> Silver.dimUser(customer, orders),
      "dim_date" -> dimDate,
      "fact_trips" -> Silver.factTrips(lineitem, orders, customer, supplier),
      "dm_daily_trip_summary" -> Gold.dailyTripSummary(lineitem, orders, dimDate),
      "dm_station_popularity" ->
        Gold.stationPopularity(lineitem, orders, customer, supplier, nation),
      "dm_popular_routes" ->
        Gold.popularRoutes(lineitem, orders, customer, supplier, nation),
      "dm_user_behavior" -> Gold.userBehavior(orders, customer))

    val staging = Paths.get(warehouseDir, s".staging-${java.util.UUID.randomUUID}")
    Files.createDirectories(staging)
    try {
      // independent writes run as concurrent jobs (the gold_dag fan-out);
      // Spark's scheduler interleaves their stages on the shared session.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val writes = tables.map { case (name, df) =>
        Future(df.write.mode("overwrite").parquet(staging.resolve(name).toString))
      }
      Await.result(Future.sequence(writes), Duration.Inf)
      // promote: swap each staged table in. The live copy is moved ASIDE
      // first (not deleted) and every aside is retained until the WHOLE
      // batch has promoted — if any swap fails, all earlier promotions
      // roll back from their asides, so observers never see a mixed
      // warehouse (the reference's transaction-rollback behavior). Only
      // after the last table is in place are the asides removed.
      case class Promoted(live: Path, aside: Path, hadLive: Boolean)
      val done = scala.collection.mutable.ListBuffer.empty[Promoted]
      try {
        tables.map(_._1).foreach { name =>
          val live = Paths.get(warehouseDir, name)
          val aside = Paths.get(warehouseDir, s".old-$name-${java.util.UUID.randomUUID}")
          val hadLive = Files.exists(live)
          if (hadLive) Files.move(live, aside, StandardCopyOption.ATOMIC_MOVE)
          try Files.move(staging.resolve(name), live, StandardCopyOption.ATOMIC_MOVE)
          catch {
            case e: Throwable =>
              if (hadLive) Files.move(aside, live, StandardCopyOption.ATOMIC_MOVE)
              throw e
          }
          done += Promoted(live, aside, hadLive)
        }
      } catch {
        case e: Throwable =>
          // restore every table promoted before the failure. The fresh
          // copy is MOVED aside (atomic) — never deleted first — so no
          // instant exists where a table has neither old nor new data;
          // restores are best-effort across all tables (one failed move
          // must not strand the rest mid-rollback).
          done.toList.reverse.foreach { p =>
            try {
              val failed = Paths.get(warehouseDir,
                s".failed-${p.live.getFileName}-${java.util.UUID.randomUUID}")
              Files.move(p.live, failed, StandardCopyOption.ATOMIC_MOVE)
              if (p.hadLive)
                Files.move(p.aside, p.live, StandardCopyOption.ATOMIC_MOVE)
              deleteRecursively(failed)
            } catch {
              case re: Throwable => e.addSuppressed(re)
            }
          }
          throw e
      }
      done.foreach(p => if (p.hadLive) deleteRecursively(p.aside))
      tables.map(_._1)
    } finally deleteRecursively(staging)
  }

  /** S8: recompute-and-overwrite mart refresh (`REFRESH MATERIALIZED
    * VIEW` semantics) for one mart by name.
    */
  def refreshMart(spark: SparkSession, srcDir: String, warehouseDir: String,
                  mart: String): Unit = {
    val df = mart match {
      case "dm_daily_trip_summary" =>
        Gold.dailyTripSummary(Tables.lineitem(spark, srcDir), Tables.orders(spark, srcDir),
          Silver.dimDate(Tables.orders(spark, srcDir), Tables.lineitem(spark, srcDir)))
      case "dm_station_popularity" =>
        Gold.stationPopularity(Tables.lineitem(spark, srcDir), Tables.orders(spark, srcDir),
          Tables.customer(spark, srcDir), Tables.supplier(spark, srcDir),
          Tables.nation(spark, srcDir))
      case "dm_popular_routes" =>
        Gold.popularRoutes(Tables.lineitem(spark, srcDir), Tables.orders(spark, srcDir),
          Tables.customer(spark, srcDir), Tables.supplier(spark, srcDir),
          Tables.nation(spark, srcDir))
      case "dm_user_behavior" =>
        Gold.userBehavior(Tables.orders(spark, srcDir), Tables.customer(spark, srcDir))
      case other => throw new IllegalArgumentException(s"unknown mart: $other")
    }
    df.write.mode("overwrite").parquet(s"$warehouseDir/$mart")
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
}
