package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Sketches

class SketchesSpec extends AnyFunSuite {
  import SparkTestBase._

  test("HLL distinct users within 5% of exact; quantile sketch brackets the exact rank") {
    val ev = Tables.events(spark, sfDir)
    val approx = Sketches.eventTypeProfile(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"),
        expr("percentile(value, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (et, (users, p50)) =>
      val (aUsers, aP50) = approx(et)
      assert(math.abs(aUsers - users).toDouble / users <= 0.05,
        s"$et: HLL $aUsers vs exact $users")
      // percentile_approx returns a genuine data value near the true
      // median: accept a 10% rank-value tolerance on this distribution.
      assert(math.abs(aP50 - p50) <= math.abs(p50) * 0.1 + 1.0,
        s"$et: p50 sketch $aP50 vs exact $p50")
    }
  }
}
