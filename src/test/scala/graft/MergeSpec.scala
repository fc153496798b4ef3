package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Merge

class MergeSpec extends AnyFunSuite {
  import SparkTestBase._

  test("upsert: updates replace, inserts append, dup-key targets keep multiplicity") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (2L, "b2", 21.0),
      (3L, "c", 30.0)).toDF("k", "name", "v")
    val updates = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    val out = Merge.upsert(target, updates, Seq("k"))
      .orderBy("k", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out === Seq(
      (1L, "a", 10.0),          // untouched
      (2L, "B", 99.0),          // BOTH key-2 target rows updated (ANSI)
      (2L, "B", 99.0),
      (3L, "c", 30.0),
      (4L, "d", 40.0)))         // insert
  }

  test("upsert: a duplicate-key UPDATE batch raises (ANSI MERGE multi-match)") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0)).toDF("k", "name", "v")
    val dupUpdates = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k", "name", "v")
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(target, dupUpdates, Seq("k")).collect()
    }
    assert(e.getMessage.contains("duplicate key"))
    // the documented escape hatch keeps the old (multiplying) behavior
    val out = Merge.upsert(target, dupUpdates, Seq("k"),
      requireUniqueUpdates = false).collect()
    assert(out.length === 2, "unvalidated multi-match multiplies matched rows")
  }

  test("upsert: an update carrying an intentional NULL wins over the target value") {
    import spark.implicits._
    val target = Seq((1L, Some("keep"))).toDF("k", "name")
    val updates = Seq((1L, None: Option[String])).toDF("k", "name")
    val out = Merge.upsert(target, updates, Seq("k")).collect()
    assert(out.length === 1 && out.head.isNullAt(1),
      "match marker, not COALESCE, must decide replacement")
  }

  test("scd2: consecutive same-value changes collapse; versions tile the timeline") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val h = Seq(
      (1L, d("2024-01-01"), "O", 100L),
      (1L, d("2024-01-05"), "O", 101L),  // unchanged → no new version
      (1L, d("2024-02-01"), "F", 102L),
      (2L, d("2024-01-03"), "P", 200L))
      .toDF("k", "ts", "st", "id")
    val out = Merge.scd2(h, "k", "ts", "st", "id")
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(3).toString,
        Option(r.getDate(4)).map(_.toString), r.getBoolean(5)))
    assert(out === Seq(
      (1L, "O", "2024-01-01", Some("2024-02-01"), false),
      (1L, "F", "2024-02-01", None, true),
      (2L, "P", "2024-01-03", None, true)))
  }

  test("scd2: a run of NULL attributes is ONE version, not one per change row") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val h = Seq(
      (1L, d("2024-01-01"), Some("O"), 1L),
      (1L, d("2024-01-02"), None: Option[String], 2L),  // O → NULL: new version
      (1L, d("2024-01-03"), None: Option[String], 3L),  // NULL run: no new version
      (1L, d("2024-01-04"), Some("O"), 4L))             // NULL → O: new version
      .toDF("k", "ts", "st", "id")
    val out = Merge.scd2(h, "k", "ts", "st", "id")
      .orderBy("valid_from").collect()
      .map(r => (Option(r.getString(1)), r.getDate(3).toString))
    assert(out === Seq(
      (Some("O"), "2024-01-01"),
      (None, "2024-01-02"),
      (Some("O"), "2024-01-04")))
  }

  test("quality gate: an empty batch passes with zero violations, never NULL") {
    val out = graft.ext.Quality
      .eventsGate(Tables.events(spark, sfDir).limit(0))
      .collect()
    assert(out.length === 5)
    assert(out.forall(r => r.getLong(1) === 0L && r.getBoolean(2)),
      "empty input must read as zero violations / pass=true")
  }
}
