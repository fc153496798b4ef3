package graft.bronze

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Bronze layer — the reference's ingest path (/root/reference
  * include/sql/bronze/load_bronze.py, include/modules/get_data.py)
  * re-expressed Spark-first:
  *
  *  - S3 file discovery → Spark's own `InMemoryFileIndex` via path globs;
  *    no hand-rolled listing. At 100 TB the file index is driver-side
  *    metadata only; data never moves until the scan.
  *  - CSV with header (S3) → explicit schema + header validation. Schema
  *    inference is a full extra pass over the data — never at scale.
  *  - filename-derived `period` column (S4, load_bronze.py:48-63) →
  *    `input_file_name()` + `regexp_extract`, evaluated inside the scan
  *    stage (no shuffle, codegen'd).
  *  - `COPY` bulk append (S5) → parquet append sink.
  *  - audit columns (init_db.py:86-88) → `current_timestamp()` + a batch
  *    high-water mark instead of a mutable per-row boolean (SURVEY §7:
  *    Parquet is immutable; an ingest watermark gives the same
  *    incremental semantics without rewriting bronze).
  */
object Bronze {

  /** S3+S4: scan files with an explicit schema and derive the period
    * column from the file name — the Spark-native form of the reference's
    * stream-rewrite that appends `period` to every CSV row.
    */
  def scanCsvWithPeriod(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)
      .withColumn("period",
        regexp_extract(input_file_name(), "([^/]+)\\.csv", 1))

  /** S4 over parquet: same derived-column pattern on any file source. */
  def withSourceFile(df: DataFrame): DataFrame =
    df.withColumn("source_file",
      regexp_extract(input_file_name(), "([^/]+)\\.parquet", 1))

  /** S5: bulk append sink with ingest audit column (created_at,
    * init_db.py:86). Append-only, partitioned by the caller's columns.
    */
  def appendSink(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val out = df.withColumn("created_at", current_timestamp())
    val w = out.write.mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Cleanup projection — the bronze→silver scrubbing rules
    * (silver_load.sql:60,199-217 + notebook (0,0) exclusion):
    * P3 sentinel→null, P4 null-default, P5 range-validity CASE,
    * P8 zero-coordinate exclusion. All codegen'd scalar expressions that
    * ride inside the scan's WholeStageCodegen span.
    */
  def cleanEvents(events: DataFrame): DataFrame =
    events
      // P8: exclude degenerate rows (reference: (0,0) test stations).
      .filter(!(col("user_id") === 0 && col("value") === 0))
      .select(
        col("event_id"),
        col("ts"),
        col("user_id"),
        // P3: sentinel cleanup (NULLIF analog).
        when(col("event_type") === "error", lit(null).cast("string"))
          .otherwise(col("event_type")).as("event_type_clean"),
        // P4: null default on the cleaned column.
        coalesce(
          when(col("event_type") === "error", lit(null).cast("string"))
            .otherwise(col("event_type")),
          lit("unknown")).as("event_type_filled"),
        // P5: range-validity CASE (reference: age <18 or >100 → NULL).
        when(col("value") < 0 || col("value") > 400, lit(null).cast("double"))
          .otherwise(col("value")).as("value_valid"))

  /** P2: the incremental-load predicate. The reference flips a per-row
    * `loaded_to_silver` boolean (silver_load.sql:219,273-275); with
    * immutable parquet the same protocol is a high-water-mark filter —
    * and with parquet row-group min/max statistics the filter prunes
    * whole row groups at the scan, the columnar analog of the reference's
    * partial index (init_db.py:88).
    */
  def newSince(bronze: DataFrame, tsCol: String, watermark: String): DataFrame =
    // to_timestamp parses in the session time zone (pinned UTC) — never
    // java.sql.Timestamp.valueOf, which parses in the JVM default zone.
    bronze.filter(col(tsCol) > to_timestamp(lit(watermark)))

  private val evolvedDirs =
    scala.collection.concurrent.TrieMap[String, (String, String)]()

  /** Stage two event batches with EVOLVED schemas (once per JVM and
    * source dir): batch 1 in the original 3-column layout, batch 2 with
    * the later-added `user_id`. This is the bronze reality of a
    * long-lived feed — producers add columns mid-stream, and the lake
    * holds both generations side by side forever.
    */
  def ensureEvolvedBatches(spark: SparkSession, srcDir: String): (String, String) =
    evolvedDirs.getOrElseUpdate(srcDir, {
      // registered for shutdown-hook deletion: staged once per JVM,
      // must not accumulate under /tmp across bench/verify runs.
      val base = graft.TempDirs.create("graft_evolve_").toString
      val ev = graft.Tables.events(spark, srcDir)
      ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("event_type"), col("value"))
        .write.parquet(s"$base/batch1")
      ev.filter(col("event_id") % 2 === 1)
        .select(col("event_id"), col("event_type"), col("value"), col("user_id"))
        .write.parquet(s"$base/batch2")
      (s"$base/batch1", s"$base/batch2")
    })

  /** Schema-evolution scan: union the generations BY NAME, null-filling
    * the columns a batch predates. `mergeSchema` pays a per-file footer
    * read at planning; production pins the merged schema in a catalog and
    * passes it explicitly — the scan shape is identical.
    */
  def readEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
