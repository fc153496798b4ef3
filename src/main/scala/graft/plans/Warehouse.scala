package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.operators.ScaleOps
import graft.silver.Silver

/** Persisted warehouse layout for the fact sources + calendar — the
  * ingest-time investment that every downstream mart amortizes:
  *
  *  - `lineitem` and `orders` are stored BUCKETED (and sorted) on their
  *    order keys, so the one big-big join in the engine (the fact build,
  *    reference silver_load.sql:83-101) runs with ZERO shuffle exchange
  *    on every later mart refresh — at 100 TB that shuffle is the
  *    dominant cost, and it is paid once at ingest, not per query.
  *  - `dim_date` is computed once and persisted; without this every mart
  *    re-derives the calendar from two full-bounds scans of the fact
  *    sources per refresh (the reference materializes it the same way,
  *    silver_load.sql:137-183).
  *
  * Table names carry a suffix derived from the source dir so different
  * scale factors coexist in one session catalog; `ensure` is idempotent
  * and build-once per (JVM, source dir).
  */
object Warehouse {

  final case class Star(lineitem: DataFrame, orders: DataFrame, dimDate: DataFrame)

  private def suffix(key: String): String =
    (scala.util.hashing.MurmurHash3.stringHash(key) & Int.MaxValue).toString

  /** Build (once per catalog, source dir and bucket count) and return the
    * persisted star. Existence is checked against the session CATALOG,
    * not a JVM flag — a fresh SparkSession (fresh in-memory catalog) in
    * the same JVM rebuilds; a different `numBuckets` is a different
    * layout and gets its own tables. Serialized on this object so
    * concurrent callers cannot race the DROP/delete/saveAsTable sequence.
    */
  def ensure(spark: SparkSession, srcDir: String,
             numBuckets: Int = 32): Star = synchronized {
    val sfx = suffix(s"$srcDir|$numBuckets")
    val liName = s"wh_lineitem_$sfx"
    val oName = s"wh_orders_$sfx"
    val ddName = s"wh_dim_date_$sfx"
    val missing = Seq(liName, oName, ddName).exists(!spark.catalog.tableExists(_))
    if (missing) {
      ScaleOps.writeBucketed(Tables.lineitem(spark, srcDir), liName,
        Seq("l_orderkey"), numBuckets)
      ScaleOps.writeBucketed(Tables.orders(spark, srcDir), oName,
        Seq("o_orderkey"), numBuckets)
      // single-bucket: the calendar is tiny and always broadcast; routing
      // through writeBucketed reuses its orphan-location cleanup.
      ScaleOps.writeBucketed(
        Silver.dimDate(Tables.orders(spark, srcDir), Tables.lineitem(spark, srcDir)),
        ddName, Seq("date_id"), numBuckets = 1)
    }
    Star(spark.table(liName), spark.table(oName), spark.table(ddName))
  }
}
