package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata star (TESTDATA.md / FIXTURES.md §B).
  *
  * Role mapping (SURVEY.md §7): `lineitem`+`orders` play the trips fact
  * source (reference `bronze.bike_trips`, /root/reference
  * include/sql/bronze/init_db.py:67-88), `nation`/`region`/`customer`/
  * `supplier` play the dimension sources (dim_locations analog,
  * silver_ddl.sql:8-24), `events` plays the incremental feed
  * (loaded_to_silver protocol, silver_load.sql:219), `documents`/
  * `embeddings` back the LLM-pipeline extension operators.
  *
  * All loads are plain parquet scans: Catalyst handles column pruning and
  * predicate pushdown into the scan, so callers should NOT pre-select or
  * cache here — declare the full plan and let the optimizer prune.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy long mode) and rebuild a
    * proper TimestampType at microsecond precision — the testdata nanos
    * are all micro-aligned, so the conversion is lossless and matches what
    * DuckDB reads natively.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
