package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-management operators for a training-data pipeline: the steps
  * between "deduplicated documents" and "training shards" —
  * deterministic splits, scrubbing, stratified downsampling and
  * weighted source mixing.
  *
  * Scale design (100 TB):
  *  - Everything here is a PER-ROW projection or filter on a portable
  *    hash of the document id — no shuffle, no state, no sampling seed
  *    that changes between runs or executors. Assignment is a pure
  *    function of (salt, id), so re-running on a grown corpus keeps every
  *    previously-assigned document in its split (the property that makes
  *    incremental training-set refreshes possible at all).
  *  - The md5-derived hash family matches the dedup/minhash operators
  *    (and the DuckDB oracle computes the identical expressions), so one
  *    hash discipline covers the whole pipeline.
  */
object Corpus {

  /** Uniform bucket in [0, buckets) from a salted portable hash of the id
    * column — `Dedup.hash32`'s md5 family, so DuckDB reproduces it
    * bit-for-bit.
    */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    pmod(Dedup.hash32(concat(lit(salt + "|"), id.cast("string"))), lit(buckets))
      .cast("int")

  /** Deterministic train/validation/test assignment by hash bucketing:
    * bucket < trainPct → train, < trainPct+valPct → val, else test.
    * Document-stable across runs and cluster sizes (never `rand()`, whose
    * per-task seeding is neither reproducible under retries nor portable).
    */
  def splitAssign(docs: DataFrame, idCol: String = "doc_id",
                  trainPct: Int = 80, valPct: Int = 10,
                  salt: String = "split"): DataFrame = {
    require(trainPct + valPct < 100, "test share must be positive")
    val bucket = hashBucket(col(idCol), salt, 100)
    docs.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  /** Normalization + PII-style scrubbing: lowercase, mask email-shaped
    * tokens and digit runs, collapse whitespace. Pure codegen'd scalar
    * expressions that ride inside the scan's WholeStageCodegen span —
    * the redaction pass costs one map over the corpus, nothing more.
    */
  def redact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val lowered = lower(col(textCol))
    val noEmail = regexp_replace(lowered,
      "[a-z0-9._%+-]+@[a-z0-9.-]+", "<email>")
    val noDigits = regexp_replace(noEmail, "[0-9]+", "#")
    // explicit whitespace class, not \s: Java's \s includes \x0B
    // (vertical tab) while RE2's (DuckDB) does not — an explicit class
    // means both engines, and the oracle, see the identical set.
    val collapsed = trim(regexp_replace(noDigits, "[ \\t\\n\\f\\r\\x0B]+", " "))
    docs.withColumn("clean_text", collapsed)
      .withColumn("was_redacted", (collapsed =!= col(textCol)).cast("int"))
  }

  /** Deterministic stratified sample: keep `keepPerMille`/1000 of each
    * stratum by hash threshold. Unlike `df.sampleBy`, membership is a
    * pure function of the id — stable under retries, re-runs and corpus
    * growth — and the filter pushes into the scan (no shuffle).
    */
  def stratifiedSample(docs: DataFrame, idCol: String,
                       keepPerMille: Int, salt: String = "sample"): DataFrame =
    docs.filter(hashBucket(col(idCol), salt, 1000) < keepPerMille)

  /** Weighted source mixing: per-source keep rates (per mille), the
    * hash-threshold form of the "sample each corpus at its mixing weight
    * then union" recipe used to balance training mixtures. Sources not in
    * `ratesPerMille` are dropped (explicit mixture only).
    */
  def mixSources(docs: DataFrame, sourceCol: String, idCol: String,
                 ratesPerMille: Map[String, Int],
                 salt: String = "mix"): DataFrame = {
    val rate = ratesPerMille.foldLeft(lit(0)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    docs.filter(hashBucket(col(idCol), salt, 1000) < rate)
  }
}
