package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Testdata-schema smoke guard (round-10 hardening, VERDICT r9 item 2):
  * the driver regenerates /root/testdata between rounds and has already
  * shipped `events.ts` under multiple physical encodings — a loader
  * pinned to one encoding silently amputated 43 queries in round 9.
  * This spec loads every table through the SAME loaders the query
  * surface uses and fails with a NAMED diagnosis (table + column +
  * type) rather than letting an analysis error surface 40 queries
  * downstream.
  */
class TablesSpec extends AnyFunSuite {
  import SparkTestBase.{sfDir, spark}

  /** What the query surface actually RELIES on, not exact widths: join
    * keys must stay integral (int vs bigint both join/arithmetic fine),
    * date columns must stay date-castable time types, measures numeric.
    * Pinning exact widths would turn harmless drift into red tests; the
    * point is to name the table+column+type the moment a load-bearing
    * class changes.
    */
  private sealed trait Shape { def ok(dt: DataType): Boolean; def name: String }
  private case object Integral extends Shape {
    def ok(dt: DataType): Boolean =
      dt == LongType || dt == IntegerType || dt == ShortType
    val name = "integral"
  }
  private case object DateLike extends Shape {
    def ok(dt: DataType): Boolean =
      dt == DateType || dt == TimestampType || dt == TimestampNTZType
    val name = "date-like"
  }
  private case object Numeric extends Shape {
    def ok(dt: DataType): Boolean = dt.isInstanceOf[NumericType]
    val name = "numeric"
  }
  private case object Text extends Shape {
    def ok(dt: DataType): Boolean = dt == StringType
    val name = "string"
  }

  private val expected: Map[String, Map[String, Shape]] = Map(
    "region"   -> Map("r_regionkey" -> Integral, "r_name" -> Text),
    "nation"   -> Map("n_nationkey" -> Integral, "n_regionkey" -> Integral),
    "customer" -> Map("c_custkey" -> Integral, "c_nationkey" -> Integral),
    "supplier" -> Map("s_suppkey" -> Integral, "s_nationkey" -> Integral),
    "part"     -> Map("p_partkey" -> Integral),
    "orders"   -> Map("o_orderkey" -> Integral, "o_custkey" -> Integral,
                      "o_orderdate" -> DateLike),
    "lineitem" -> Map("l_orderkey" -> Integral, "l_partkey" -> Integral,
                      "l_quantity" -> Numeric, "l_shipdate" -> DateLike)
  )

  private def describe(name: String, schema: StructType): String =
    s"$name schema: " + schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")

  for ((table, cols) <- expected) {
    test(s"$table loads with stable key-column types") {
      val df = Tables.load(spark, sfDir, table)
      for ((c, shape) <- cols) {
        assert(df.schema.fieldNames.contains(c),
          s"testdata drift: $table lost column $c — ${describe(table, df.schema)}")
        assert(shape.ok(df.schema(c).dataType),
          s"testdata drift: $table.$c is ${df.schema(c).dataType.simpleString}, " +
            s"loader surface expects a ${shape.name} type — ${describe(table, df.schema)}")
      }
    }
  }

  test("events normalizes ts to TimestampType under EVERY known physical encoding") {
    // the adaptive loader's contract: whatever the file ships, the query
    // surface sees session-zoned TimestampType at micro precision.
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"testdata drift: events.ts normalized to ${ev.schema("ts").dataType.simpleString}, " +
        "not TimestampType — teach Tables.normalizeTs the new encoding")
    val raw = Tables.eventsRaw(spark, sfDir)
    assert(raw.schema("ts").dataType == TimestampType)
    // values are real instants, not epoch garbage: the feed is ~2024-era
    val bounds = ev.agg(
      org.apache.spark.sql.functions.min("ts"),
      org.apache.spark.sql.functions.max("ts")).head()
    val lo = bounds.getTimestamp(0).toInstant
    val hi = bounds.getTimestamp(1).toInstant
    assert(lo.isAfter(java.time.Instant.parse("2000-01-01T00:00:00Z")) &&
      hi.isBefore(java.time.Instant.parse("2100-01-01T00:00:00Z")),
      s"testdata drift: events.ts range [$lo, $hi] is not a plausible instant range — " +
        "the ts normalization branch chosen for this encoding is wrong")
  }

  test("events ts normalization agrees between batch loader and nanos-feed helper") {
    // eventsFeedNanos (stream harnesses) and Tables.events (batch) must
    // describe the SAME instants or the stream oracles drift silently.
    import org.apache.spark.sql.functions._
    val batchMax = Tables.events(spark, sfDir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val raw = Tables.loadEvents(spark, sfDir)
    val nanosMax = raw.schema("ts").dataType match {
      case LongType => raw.agg(max(col("ts"))).head().getLong(0)
      case TimestampNTZType =>
        raw.agg(max(unix_micros(col("ts").cast(TimestampType)) * 1000L)).head().getLong(0)
      case TimestampType =>
        raw.agg(max(unix_micros(col("ts")) * 1000L)).head().getLong(0)
      case other => fail(s"unsupported events.ts type $other")
    }
    assert(nanosMax / 1000L == batchMax,
      s"nanos-feed max ($nanosMax ns) and batch max ($batchMax us) disagree")
  }

  test("documents and embeddings load with the extension-surface columns") {
    val docs = Tables.documents(spark, sfDir)
    for (c <- Seq("doc_id", "source", "text"))
      assert(docs.schema.fieldNames.contains(c),
        s"testdata drift: documents lost $c — ${describe("documents", docs.schema)}")
    val emb = Tables.embeddings(spark, sfDir)
    assert(emb.schema.fieldNames.contains("vec_id") &&
      emb.schema.fieldNames.contains("embedding"),
      s"testdata drift — ${describe("embeddings", emb.schema)}")
    assert(emb.schema("embedding").dataType.isInstanceOf[ArrayType],
      s"testdata drift: embeddings.embedding is " +
        s"${emb.schema("embedding").dataType.simpleString}, expected array")
  }
}
