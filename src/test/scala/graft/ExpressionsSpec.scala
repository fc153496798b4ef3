package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{KeyColumns, KeyFunctions}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions: reference-parity and codegen behavior. */
class ExpressionsSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  /** Reference semantics recomputed independently:
    * ('x' || substr(md5(s),1,16))::bit(64)::bigint — i.e. first 16 md5
    * hex chars parsed as UNSIGNED 64-bit then reinterpreted signed.
    */
  private def reference(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseUnsignedLong(hex.substring(0, 16), 16)
  }

  test("signed_md5_long matches the reference bit(64)::bigint semantics") {
    val samples = Seq("", "a", "station|3", "Customer|F|5",
      "37.7749,-122.4194", "the quick brown fox")
    samples.foreach { s =>
      assert(KeyFunctions.signedMd5Long(UTF8String.fromString(s)) === reference(s))
    }
    // at least one sample must exercise the signed-overflow path
    assert(samples.exists(reference(_) < 0),
      "need a sample with the high bit set to prove signed reinterpretation")
  }

  test("signed_md5_long via the Column API (codegen path)") {
    val df = Seq("station|3", "x", "").toDF("s")
      .select(KeyColumns.signed_md5_long(col("s")).as("k"), col("s"))
    df.collect().foreach(r => assert(r.getLong(0) === reference(r.getString(1))))
  }

  test("signed_md5_long is SQL-callable after registration") {
    KeyColumns.register(spark)
    val out = spark.sql("SELECT signed_md5_long('station|3') AS k").head().getLong(0)
    assert(out === reference("station|3"))
  }

  test("cosine_native equals the higher-order-function cosine bit-for-bit") {
    val emb = Tables.embeddings(spark, sfDir).limit(50)
    val pairs = emb.select(col("vec_id").as("i"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("j"), col("embedding").as("b")))
      .filter(col("i") < col("j")).limit(200)
    val both = pairs.select(
      KeyColumns.cosine_native(col("a"), col("b")).as("native"),
      graft.ext.Similarity.cosineHof(col("a"), col("b")).as("hof"))
    both.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("dot_native equals the interpreted zip_with/aggregate dot bit-for-bit") {
    val emb = Tables.embeddings(spark, sfDir).limit(50)
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val pairs = emb.select(col("vec_id").as("i"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("j"), col("embedding").as("b")))
      .filter(col("i") < col("j")).limit(200)
    pairs.select(
        KeyColumns.dot_native(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
      .collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
  }

  test("cosine of a vector with itself is 1.0") {
    val emb = Tables.embeddings(spark, sfDir).limit(10)
    emb.select(KeyColumns.cosine_native(col("embedding"), col("embedding")).as("c"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }
}
