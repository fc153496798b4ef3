package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.KeyFunctions

/** ScalaCheck-generator-driven properties for the algebraic invariants
  * (SURVEY §5.3): key determinism/parity, upsert idempotency,
  * incremental-equals-full. Samples are drawn from seeded generators so
  * runs are reproducible.
  */
class PropertiesSpec extends AnyFunSuite {
  import SparkTestBase._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private def reference(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseUnsignedLong(hex.substring(0, 16), 16)
  }

  test("property: signed md5 key matches the Postgres bit(64) semantics for arbitrary strings") {
    val strs = samples(Gen.asciiPrintableStr, 200)
    assert(strs.nonEmpty)
    strs.foreach { s =>
      assert(KeyFunctions.signedMd5Long(UTF8String.fromString(s)) === reference(s))
    }
    // the sample set must exercise the signed-overflow path
    assert(strs.exists(reference(_) < 0))
  }

  test("property: synthetic geocode is deterministic and in range for arbitrary keys") {
    samples(Gen.choose(0L, Long.MaxValue / 2654435761L), 200).foreach { k =>
      val g = graft.enrich.Enrich.syntheticGeoCode(k)
      assert(g === graft.enrich.Enrich.syntheticGeoCode(k))
      assert(g >= 0 && g < 97)
    }
  }

  test("property: incremental split at arbitrary day boundaries equals the full set") {
    val full = Tables.events(spark, sfDir).cache()
    val n = full.count()
    samples(Gen.choose(1, 29), 5).foreach { day =>
      val w = f"2024-01-$day%02d 00:00:00"
      val newer = graft.bronze.Bronze.newSince(full, "ts", w)
      val older = full.filter(col("ts") <= to_timestamp(lit(w)))
      assert(newer.count() + older.count() === n, s"split at $w")
    }
    full.unpersist()
  }

  test("property: upsert after upsert inserts nothing, for arbitrary key subsets") {
    val users = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().cache()
    samples(Gen.choose(0L, 15L), 5).foreach { cut =>
      val existing = users.filter(col("user_id") < cut)
      val inserted = graft.enrich.Enrich.insertIfAbsent(users, existing, Seq("user_id"))
      val merged = existing.union(inserted)
      assert(graft.enrich.Enrich.insertIfAbsent(users, merged, Seq("user_id")).count() === 0,
        s"cut at $cut")
    }
    users.unpersist()
  }
}
