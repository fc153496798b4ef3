package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.bronze.Bronze
import graft.enrich.Enrich

/** The P2 protocol invariants: incremental ≡ full, and upsert idempotency
  * (reference silver_load.sql:219,273-275 and ON CONFLICT DO NOTHING).
  */
class IncrementalUpsertSpec extends AnyFunSuite {
  import SparkTestBase._

  private def events = Tables.events(spark, sfDir)

  test("incremental-equals-full: newSince(w) ∪ upTo(w) ≡ full, for several watermarks") {
    val full = events
    for (w <- Seq("2024-01-05 00:00:00", "2024-01-15 12:34:56", "2024-01-29 23:59:59")) {
      val newer = Bronze.newSince(full, "ts", w)
      val older = full.filter(col("ts") <= to_timestamp(lit(w)))
      assert(newer.count() + older.count() === full.count(), s"partition at $w")
      // re-assembled content is exactly the full set
      assert(newer.union(older).exceptAll(full).count() === 0)
      assert(full.exceptAll(newer.union(older)).count() === 0)
    }
  }

  test("insert-if-absent is idempotent and conflict-free") {
    val existing = events.filter(col("event_type") === "signup")
      .select(col("user_id"))
    val incoming = events.select(col("user_id"))
    val first = Enrich.insertIfAbsent(incoming, existing, Seq("user_id"))
    val merged = existing.select("user_id").distinct().union(first)
    // applying the upsert again against the merged state inserts nothing
    assert(Enrich.insertIfAbsent(incoming, merged, Seq("user_id")).count() === 0)
    // merged state is unique on the key
    assert(merged.count() === merged.distinct().count())
  }

  test("cleanEvents null semantics: sentinels nulled, defaults filled, range-violations nulled") {
    val cleaned = Bronze.cleanEvents(events).cache()
    assert(cleaned.filter(col("event_type_clean") === "error").count() === 0)
    assert(cleaned.filter(col("event_type_filled").isNull).count() === 0)
    assert(cleaned.filter(col("value_valid") > 400 || col("value_valid") < 0).count() === 0)
    cleaned.unpersist()
  }

  test("append sink accumulates batches with an ingest audit column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/bronze"
    val batch = events.limit(100)
    Bronze.appendSink(batch, dir)
    Bronze.appendSink(batch, dir)
    val out = spark.read.parquet(dir)
    assert(out.count() === 200)
    assert(out.columns.contains("created_at"))
  }

  test("csv scan derives the period column from the file name") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "201801-trips.csv")
    val pw = new java.io.PrintWriter(f)
    pw.println("id,name"); pw.println("1,a"); pw.println("2,b"); pw.close()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType)))
    val df = Bronze.scanCsvWithPeriod(spark, schema, dir.getAbsolutePath)
    val rows = df.collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[String]("period") === "201801-trips"))
  }
}
