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
    conform(spark.read.parquet(s"$dir/$name.parquet"), name)

  /** Declared logical column types per table — the contract the rest of
    * the engine programs against. The testdata environment has
    * re-encoded physical types across regenerations twice (`events.ts`:
    * round-9 postmortem lost 43 queries to one such drift); `conform`
    * generalizes `normalizeTs`'s lesson to EVERY loaded table, so the
    * next regeneration that ships `embedding` as `array<double>` or an
    * integral key at a different width degrades to a cast instead of a
    * red surface. `events.ts` is deliberately absent — [[normalizeTs]]
    * owns its three known encodings (including nanos-as-long, which is
    * not a plain cast).
    */
  private val declared: Map[String, Seq[(String, org.apache.spark.sql.types.DataType)]] = {
    import org.apache.spark.sql.types._
    Map(
      "region"   -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation"   -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
                        "n_regionkey" -> IntegerType),
      "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
                        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
                        "c_mktsegment" -> StringType),
      "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
                        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "part"     -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
                        "p_brand" -> StringType, "p_type" -> StringType,
                        "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
      "orders"   -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
                        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
                        "o_orderdate" -> TimestampNTZType,
                        "o_orderpriority" -> StringType),
      "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
                        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
                        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
                        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
                        "l_returnflag" -> StringType, "l_linestatus" -> StringType,
                        "l_shipdate" -> TimestampNTZType),
      "events"   -> Seq("event_id" -> LongType, "user_id" -> LongType,
                        "event_type" -> StringType, "value" -> DoubleType,
                        "props" -> StringType),
      "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
                        "lang" -> StringType, "source" -> StringType,
                        "n_chars" -> LongType),
      "embeddings" -> Seq("vec_id" -> LongType,
                        "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
    )
  }

  /** Cast class-compatible physical drift back to the declared type;
    * identity when the file already matches (the normal case — no plan
    * noise). Numeric↔numeric, timestamp-family↔timestamp-family, and
    * element-wise array drift are casts; anything else (a string where a
    * numeric is declared, a dropped column) fails fast NAMING the table,
    * column, and both types — the diagnosis the round-9 drift cost a
    * debugging session to reach. Extra physical columns pass through
    * untouched (schema evolution adds columns; it must not hide them).
    */
  private[graft] def conform(df: DataFrame, table: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    def castable(from: DataType, to: DataType): Boolean = (from, to) match {
      case (_: NumericType, _: NumericType) => true
      case (TimestampNTZType | TimestampType | DateType,
            TimestampNTZType | TimestampType | DateType) => true
      case (ArrayType(f, _), ArrayType(t, _)) => castable(f, t)
      case _ => false
    }
    declared.get(table) match {
      case None => df
      case Some(cols) =>
        val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
        val casts = cols.flatMap { case (c, want) =>
          actual.get(c) match {
            case None => throw new IllegalStateException(
              s"$table.parquet lacks declared column $c — a regeneration " +
                "dropped or renamed it; update Tables.declared if intentional")
            case Some(got) if got == want => None
            case Some(got) if castable(got, want) => Some(c -> want)
            case Some(got) => throw new IllegalStateException(
              s"$table.parquet column $c drifted to incompatible physical " +
                s"type $got (declared $want) — teach Tables.conform the new encoding")
          }
        }
        casts.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) }
    }
  }

  /** Raise a scan's parallelism to the session default when the source
    * has too few files to split (the small-SF testdata is one file per
    * table, which would serialize every downstream operator on one
    * task). Guarded: at warehouse scale a scan already has ≥ parallelism
    * input files and this is the identity — it never shrinks
    * partitioning. The probe is `inputFiles` (metadata from the scan's
    * already-built FileIndex), NOT `df.rdd.getNumPartitions`: the RDD
    * probe instantiated the physical lineage at PLAN TIME on every load
    * (round-9 judge note) — pure planning cost that grows with the
    * table's file count at 100 TB. A many-row-group single file can
    * under-estimate split-ability here and repartition when it did not
    * strictly need to; that costs one exchange on a small file, never a
    * lost split on a big table.
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length < p) df.repartition(p) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` has shipped under THREE physical encodings across
    * testdata rebuilds: parquet TIMESTAMP(NANOS) (read as BIGINT under
    * `nanosAsLong`), plain TIMESTAMP_NTZ(micros), and session-local
    * TIMESTAMP. A loader pinned to one encoding detonates the entire
    * events-reading surface when the environment regenerates the files
    * (round-9 postmortem: 43 queries + 9 suites lost to an unconditional
    * `ts div 1000` rebuild). So: branch on the ACTUAL read schema and
    * normalize each variant to session-zoned TimestampType at micro
    * precision — identical values in a UTC session, which Bench/Verify/
    * tests all pin. Unknown types fail fast with a named diagnosis
    * rather than an opaque analysis error downstream.
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as raw nanos; micro-aligned in testdata
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // plain micros, no zone: lossless cast in a UTC session
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.parquet ts has unsupported physical type $other — " +
          "expected TIMESTAMP(NANOS)-as-long, TIMESTAMP_NTZ, or TIMESTAMP; " +
          "teach Tables.normalizeTs the new encoding")
    }
  }

  /** events with ts normalized but WITHOUT the parallelism repartition —
    * for operators that must run inside the scan stage (e.g.
    * `input_file_name()`, which returns '' after any exchange).
    */
  def eventsRaw(s: SparkSession, d: String): DataFrame =
    normalizeTs(loadEvents(s, d))

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(spread(loadEvents(s, d)))

  /** Plain read first; only if the file is actually TIMESTAMP(NANOS)
    * (schema conversion rejects it eagerly at `read.parquet`) fall back
    * to the legacy nanos-as-long mode. The conf mutation and the
    * explicit-false fail-fast are scoped to that fallback — a micros
    * file never touches session conf.
    */
  private[graft] def loadEvents(s: SparkSession, d: String): DataFrame =
    try load(s, d, "events")
    catch {
      // Match only the schema-conversion rejection of a nanosecond
      // timestamp column ("Illegal Parquet type: INT64 (TIMESTAMP(NANOS,
      // ...))"), not any error that happens to mention NANOS — an
      // unrelated failure must surface, not silently divert into the
      // legacy loader and mutate session conf mid-run.
      case e: Exception if e.getMessage != null &&
          e.getMessage.contains("TIMESTAMP(NANOS") =>
        loadEventsNanos(s, d)
    }

  /** The nanos-as-long switch belongs at SESSION CONSTRUCTION
    * (`.config("spark.sql.legacy.parquet.nanosAsLong", "true")` — all of
    * Bench/Verify/Profile/SparkTestBase do). It cannot be scoped to one
    * read: a read option survives schema inference but the parquet scan
    * re-reads the session conf per task. For externally built sessions
    * that did not set it, the loader sets it WITH a warning (the conf is
    * session-wide: any later TIMESTAMP(NANOS) column in this session now
    * reads as BIGINT); a session that EXPLICITLY set it false fails fast
    * rather than having its choice silently overridden.
    */
  private def loadEventsNanos(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    s.conf.getOption(key) match {
      case Some("true") => ()
      case None =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"setting $key=true session-wide (events.parquet is TIMESTAMP(NANOS)); " +
            "prefer setting it at session construction")
        s.conf.set(key, "true")
      case Some(other) => throw new IllegalArgumentException(
        s"events.parquet stores TIMESTAMP(NANOS) but $key=$other was set " +
          "explicitly — set it to true at session construction to read events")
    }
    load(s, d, "events")
  }
  // documents/embeddings feed interpreted higher-order expressions
  // (lambdas are not codegen'd) — parallelism matters more than the tiny
  // exchange these small tables cost.
  def documents(s: SparkSession, d: String): DataFrame = spread(load(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = spread(load(s, d, "embeddings"))
}
