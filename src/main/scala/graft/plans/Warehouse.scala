package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.Tables
import graft.operators.ScaleOps
import graft.silver.Silver

/** Persisted warehouse layout — the FULL silver star (reference
  * silver_ddl.sql:8-75 persists every dim + the fact), as the ingest-time
  * investment every downstream mart amortizes:
  *
  *  - `lineitem` and `orders` are stored BUCKETED (and sorted) on their
  *    order keys, so the one big-big join in the engine (the fact build,
  *    reference silver_load.sql:83-101) runs with ZERO shuffle exchange
  *    on every later mart refresh — at 100 TB that shuffle is the
  *    dominant cost, and it is paid once at ingest, not per query.
  *  - `fact_trips` is persisted bucketed on `start_station_key`: any
  *    aggregation whose grouping keys INCLUDE the bucket column (routes =
  *    (start, end), station departures = (start)) runs with zero
  *    exchange before the aggregate — the shuffle that would move the
  *    whole fact moves nothing.
  *  - `dim_date` / `dim_station` / `dim_user` are computed once and
  *    persisted; without this every mart re-derives the calendar from two
  *    full-bounds scans of the fact sources per refresh (the reference
  *    materializes them the same way, silver_load.sql:4-183).
  *
  * Table names carry a suffix derived from the source dir so different
  * scale factors coexist in one session catalog; `ensure` is idempotent
  * per (catalog, source dir, layout) and STALENESS-GUARDED: a fingerprint
  * of the source files (name, length, mtime — a listing, no data IO) is
  * recorded as a table property at build time and re-checked on every
  * call, so a changed source dir behind the same path triggers a rebuild
  * instead of silently serving stale buckets. Content-level change
  * detection beyond what a listing shows (e.g. an in-place byte rewrite
  * preserving length+mtime) is a transactional-table-format concern.
  */
object Warehouse {

  final case class Star(lineitem: DataFrame, orders: DataFrame,
                        dimDate: DataFrame, factTrips: DataFrame,
                        dimStation: DataFrame, dimUser: DataFrame)

  private def suffix(key: String): String =
    (scala.util.hashing.MurmurHash3.stringHash(key) & Int.MaxValue).toString

  /** Catalog name of a star table for (srcDir, numBuckets) — the single
    * definition of the naming scheme (tests resolve names through this,
    * never by re-deriving the hash).
    */
  private[graft] def tableName(name: String, srcDir: String,
                               numBuckets: Int): String =
    s"wh_${name}_${suffix(s"$srcDir|$numBuckets")}"

  /** Fingerprint of the source tables the star derives from: a recursive
    * listing (path, length, modification time) folded into one hash.
    * Listing metadata is cheap at any scale (no file contents are read)
    * and catches appends, truncations, replacements and late-arriving
    * files — the failure mode of trusting catalog existence alone.
    */
  private def sourceFingerprint(spark: SparkSession, srcDir: String): String = {
    val names = Seq("lineitem", "orders", "customer", "supplier", "nation",
      "region")
    val conf = spark.sparkContext.hadoopConfiguration
    val entries = names.flatMap { n =>
      val p = new org.apache.hadoop.fs.Path(s"$srcDir/$n.parquet")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq(s"$n:absent")
      else {
        val it = fs.listFiles(p, true)
        val b = Seq.newBuilder[String]
        while (it.hasNext) {
          val f = it.next()
          b += s"${f.getPath}:${f.getLen}:${f.getModificationTime}"
        }
        b.result().sorted
      }
    }
    // layoutVersion folds the STAR'S OWN schema into the fingerprint:
    // a code change to the persisted tables (new fact column, different
    // derivation) must rebuild even when the sources are byte-identical.
    java.security.MessageDigest.getInstance("MD5")
      .digest((entries.mkString("\n") + s"\nlayout:$layoutVersion")
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Bump on any change to the persisted star's schema or derivation. */
  private val layoutVersion = 2

  private def storedFingerprint(spark: SparkSession, table: String): Option[String] =
    spark.sql(s"SHOW TBLPROPERTIES `$table`")
      .where(col("key") === "graft.fingerprint")
      .collect().headOption.map(_.getString(1))

  /** Build (once per catalog, source dir, bucket count and source
    * fingerprint) and return the persisted star. Existence is checked
    * against the session CATALOG, not a JVM flag — a fresh SparkSession
    * (fresh in-memory catalog) in the same JVM rebuilds; a different
    * `numBuckets` is a different layout and gets its own tables.
    * Serialized on this object so concurrent callers cannot race the
    * DROP/delete/saveAsTable sequence.
    */
  def ensure(spark: SparkSession, srcDir: String,
             numBuckets: Int = 32): Star = synchronized {
    val liName = tableName("lineitem", srcDir, numBuckets)
    val oName = tableName("orders", srcDir, numBuckets)
    val ddName = tableName("dim_date", srcDir, numBuckets)
    val ftName = tableName("fact_trips", srcDir, numBuckets)
    val dsName = tableName("dim_station", srcDir, numBuckets)
    val duName = tableName("dim_user", srcDir, numBuckets)
    val all = Seq(liName, oName, ddName, ftName, dsName, duName)
    val fp = sourceFingerprint(spark, srcDir)
    val missing = all.exists(!spark.catalog.tableExists(_))
    val stale = !missing && !storedFingerprint(spark, liName).contains(fp)
    if (missing || stale) {
      val lineitem = Tables.lineitem(spark, srcDir)
      val orders = Tables.orders(spark, srcDir)
      val customer = Tables.customer(spark, srcDir)
      val supplier = Tables.supplier(spark, srcDir)
      ScaleOps.writeBucketed(lineitem, liName, Seq("l_orderkey"), numBuckets)
      ScaleOps.writeBucketed(orders, oName, Seq("o_orderkey"), numBuckets)
      // the fact is built off the just-persisted bucketed sources, so its
      // own l⋈o join is already shuffle-free at INGEST time too.
      ScaleOps.writeBucketed(
        Silver.factTrips(spark.table(liName), spark.table(oName),
          customer, supplier),
        ftName, Seq("start_station_key"), numBuckets)
      // single-bucket dims: tiny and always broadcast; routing through
      // writeBucketed reuses its orphan-location cleanup.
      ScaleOps.writeBucketed(
        Silver.dimDate(orders, lineitem), ddName, Seq("date_id"), numBuckets = 1)
      ScaleOps.writeBucketed(
        Silver.dimStation(Tables.nation(spark, srcDir),
          Tables.region(spark, srcDir), customer, supplier),
        dsName, Seq("nationkey"), numBuckets = 1)
      ScaleOps.writeBucketed(
        Silver.dimUser(customer, orders), duName, Seq("user_type_key"),
        numBuckets = 1)
      // fingerprint lands LAST: a build that dies mid-way leaves no (or a
      // stale) fingerprint, so the next ensure rebuilds rather than
      // trusting a half-written star.
      spark.sql(
        s"ALTER TABLE `$liName` SET TBLPROPERTIES ('graft.fingerprint'='$fp')")
    }
    Star(spark.table(liName), spark.table(oName), spark.table(ddName),
      spark.table(ftName), spark.table(dsName), spark.table(duName))
  }
}
