package graft.enrich

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Enrichment — the reference's reverse-geocode side channel
  * (/root/reference include/modules/get_locations.py) re-expressed:
  *
  *  - S7 insert-if-absent upsert (`ON CONFLICT DO NOTHING`,
  *    get_locations.py:101-107) → left-anti join then append. This IS the
  *    Spark idiom: the anti join is a shuffle on the natural key once,
  *    instead of a per-row index probe — at 100 TB the only sane shape.
  *  - S6 per-row REST lookup (get_locations.py:44-91) → `mapPartitions`
  *    with ONE client + rate limiter per partition, never a per-row UDF
  *    that would open a connection per row. Here the remote call is a
  *    deterministic synthetic geocode (zero egress, SURVEY §7), but the
  *    partition-lifecycle plumbing is the real pattern.
  *  - raw geocode JSON → `from_json` with an explicit StructType
  *    (get_locations.py:71-87 parses the same shape in Python).
  */
object Enrich {

  /** S7/J11: keys in `incoming` that are absent from `existing` — the
    * conflict-free insert set. Both sides deduped on the key first, so
    * the join is key-unique on either side.
    */
  def insertIfAbsent(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*).dropDuplicates(keys), keys, "left_anti")

  /** Synthetic deterministic "geocode": a pure function of the key that
    * stands in for the REST response (tests need no egress). Knuth
    * multiplicative step mod a small prime — stable across JVMs.
    */
  def syntheticGeoCode(key: Long): Long = (key * 2654435761L) % 97L

  /** Column form of [[syntheticGeoCode]] — the single definition queries
    * compose instead of re-inlining the constants.
    */
  def syntheticGeoCodeCol(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (key * lit(2654435761L)) % 97

  /** S6: partition-wise enrichment. One "client" (here: the pure stub)
    * and one rate-limit token bucket per partition — the structure the
    * reference implements per-process with `time.sleep` spacing
    * (get_locations.py:46-51).
    */
  def geocodeUsers(spark: SparkSession, userIds: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("user_id", LongType, nullable = false),
      StructField("geo_code", LongType, nullable = false),
      StructField("geo_name", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    userIds.select(col("user_id").cast("long")).mapPartitions { it =>
      // per-partition client setup happens HERE (once), not per row.
      val client = new SyntheticGeocodeClient
      it.map { r =>
        val id = r.getLong(0)
        val code = client.lookup(id)
        Row(id, code, s"geo_$code")
      }
    }(enc)
  }

  /** Stand-in for the rate-limited HTTP client the reference builds once
    * per process (get_locations.py:44-51). Deterministic, no egress.
    */
  final class SyntheticGeocodeClient {
    def lookup(key: Long): Long = syntheticGeoCode(key)
  }

  /** Geocode-response shape (get_locations.py:71-87) for `from_json`. */
  val geocodeJsonSchema: StructType = StructType(Seq(
    StructField("place_id", LongType),
    StructField("display_name", StringType),
    StructField("address", StructType(Seq(
      StructField("highway", StringType), StructField("road", StringType),
      StructField("neighbourhood", StringType), StructField("suburb", StringType),
      StructField("city", StringType), StructField("state", StringType),
      StructField("postcode", StringType), StructField("country", StringType))))))

  /** The geocode round trip (get_locations.py:71-107): a raw JSON
    * response string per key → typed struct via `from_json` → flat dim
    * columns ready for the insert-if-absent upsert and the silver join
    * (silver_load.sql:42-44). Parsing is a codegen'd column expression —
    * the scan stage does it in place, nothing driver-side.
    */
  def parseGeocode(raw: DataFrame, payloadCol: String = "payload"): DataFrame =
    raw
      .withColumn("_g", from_json(col(payloadCol), geocodeJsonSchema))
      .select(
        raw.columns.toIndexedSeq.filterNot(_ == payloadCol).map(col) :+
          col("_g.place_id").as("place_id") :+
          col("_g.display_name").as("geo_name") :+
          col("_g.address.city").as("city") :+
          col("_g.address.country").as("country"): _*)

  /** from_json over the events `props` payload: parse, extract, aggregate.
    * Showcases typed JSON parsing as a codegen-friendly column expression
    * instead of driver-side parsing.
    */
  def propsStats(events: DataFrame): DataFrame =
    events
      .withColumn("k",
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).cast("long").as("sum_k"),
        max(col("k")).as("max_k"),
        min(col("k")).as("min_k"))
}
