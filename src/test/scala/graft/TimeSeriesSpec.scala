package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  import SparkTestBase._

  test("gap fill: dense spine, zero-filled counts, LOCF carries the last value only") {
    import spark.implicits._
    // key A observes at ticks 0 and 30; key B only at 20. Spine 0..40/10.
    val raw = Seq(("A", 0L, 5L), ("A", 0L, 7L), ("A", 30L, 1L), ("B", 20L, 9L))
      .toDF("k", "t", "v")
    val keys = Seq("A", "B").toDF("k")
    val bounds = Seq((0L, 40L)).toDF("lo", "hi")
    val out = TimeSeries.gapFillLocf(raw, keys, bounds, "k", "t", "v", step = 10L)
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(out.length === 10, "5 ticks x 2 keys")
    val a = out.filter(_._1 == "A").map(t => (t._2, t._3, t._4, t._5))
    assert(a === Seq(
      (0L, 2L, Some(12L), Some(12L)),   // two obs summed
      (10L, 0L, None, Some(12L)),       // gap: zero count, LOCF holds
      (20L, 0L, None, Some(12L)),
      (30L, 1L, Some(1L), Some(1L)),    // new obs replaces carried value
      (40L, 0L, None, Some(1L))))
    val b = out.filter(_._1 == "B").map(t => (t._2, t._3, t._4, t._5))
    assert(b === Seq(
      (0L, 0L, None, None),             // before first obs: LOCF invents nothing
      (10L, 0L, None, None),
      (20L, 1L, Some(9L), Some(9L)),
      (30L, 0L, None, Some(9L)),
      (40L, 0L, None, Some(9L))))
  }
}
