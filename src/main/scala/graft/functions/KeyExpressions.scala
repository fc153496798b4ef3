package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by interpreted eval and generated code. */
object KeyFunctions {

  /** Exact reference surrogate-key semantics (F1, /root/reference
    * include/sql/silver/silver_load.sql:48):
    * `('x' || substr(md5(s), 1, 16))::bit(64)::bigint` — the first 16 hex
    * chars of the md5 are the first 8 digest bytes, reinterpreted as a
    * SIGNED big-endian 64-bit value. Spark's `conv(...,16,10)` cannot
    * express this (it saturates unsigned); this one-liner can.
    */
  // MessageDigest instances are reusable (digest() implies reset()) but not
  // thread-safe; provider lookup per row is measurable on a key column, so
  // each executor thread keeps one.
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def signedMd5Long(s: UTF8String): Long = {
    val dig = md5.get().digest(s.getBytes)
    java.nio.ByteBuffer.wrap(dig, 0, 8).getLong
  }

  /** Double-precision dot product over two float/double arrays (the
    * `aD`/`bD` flags select each side's element width — constants folded
    * by the JIT), index-ordered — bit-compatible with DuckDB's
    * list_sum(list_transform(...)) and the zip_with/aggregate
    * formulation. The hyperplane-signature kernel; the double side
    * appears when scoring against k-means-refined centroids, whose
    * exact fixed-point means are doubles.
    */
  def dotData(a: ArrayData, b: ArrayData, aD: Boolean, bD: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      dot += (if (aD) a.getDouble(i) else a.getFloat(i).toDouble) *
        (if (bD) b.getDouble(i) else b.getFloat(i).toDouble)
      i += 1
    }
    dot
  }

  def dotFloat(a: ArrayData, b: ArrayData): Double =
    dotData(a, b, aD = false, bD = false)

  /** Double-precision cosine over two float/double arrays, index-ordered
    * accumulation (bit-compatible with the zip_with/aggregate formulation
    * in [[graft.ext.Similarity.cosine]]).
    */
  def cosineData(a: ArrayData, b: ArrayData, aD: Boolean, bD: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = if (aD) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bD) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineFloat(a: ArrayData, b: ArrayData): Double =
    cosineData(a, b, aD = false, bD = false)
}

/** Native Catalyst expression for the reference's signed md5 key (F1).
  * Codegen'd (no UDF serialization, no row boxing) — stays inside
  * WholeStageCodegen spans.
  */
case class SignedMd5Long(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    KeyFunctions.signedMd5Long(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.KeyFunctions$$.MODULE$$.signedMd5Long($c)")
  override protected def withNewChildInternal(newChild: Expression): SignedMd5Long =
    copy(child = newChild)
}

/** Shared element-width dispatch for the vector kernels: each side may
  * be array<float> (raw embeddings) or array<double> (refined
  * centroids, exact fixed-point means). Resolved once at planning time
  * and baked into the generated code as literal booleans.
  */
trait VectorKernelExpression { self: BinaryExpression =>
  protected def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _) => false
    case t => throw new IllegalArgumentException(
      s"${self.prettyName} expects array<float>/array<double>, got $t")
  }
  protected def aD: Boolean = elemIsDouble(self.left)
  protected def bD: Boolean = elemIsDouble(self.right)
}

/** Native cosine similarity over array<float>/array<double> columns: a
  * single fused loop over primitive arrays — no intermediate product
  * array, unlike the zip_with+aggregate formulation. Identical IEEE
  * result (each accumulator sums in index order).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with VectorKernelExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    KeyFunctions.cosineData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aD, bD)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.KeyFunctions$$.MODULE$$.cosineData($a, $b, $aD, $bD)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Native dot product over array<float>/array<double> columns — one
  * fused primitive loop, codegen'd. The LSH hyperplane-signature kernel:
  * 16 of these per row as interpreted array lambdas dominated the
  * banded-dedup profile.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorKernelExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    KeyFunctions.dotData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aD, bD)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.KeyFunctions$$.MODULE$$.dotData($a, $b, $aD, $bD)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Column-level entry points (Spark 4: Column↔Expression bridging lives
  * in org.apache.spark.sql.classic.ExpressionUtils).
  */
object KeyColumns {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def signed_md5_long(c: Column): Column = column(SignedMd5Long(expression(c)))
  def cosine_native(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
  def dot_native(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Register all three for SQL callers (`SELECT signed_md5_long(x) ...`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "signed_md5_long", exprs => SignedMd5Long(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_native", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_native", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
  }
}

/** SparkSessionExtensions entry point so the expressions are available in
  * every session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), including pure-SQL users.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("signed_md5_long"),
      new ExpressionInfo(classOf[SignedMd5Long].getName, "signed_md5_long"),
      (exprs: Seq[Expression]) => SignedMd5Long(exprs.head)))
    ext.injectFunction((FunctionIdentifier("cosine_native"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_native"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("dot_native"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_native"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
  }
}
