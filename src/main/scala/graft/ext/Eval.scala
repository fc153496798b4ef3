package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

/** Threshold-free EVALUATION of the model-based selection tier:
  * exact ROC AUC and score-calibration (reliability) tables for any
  * scored binary discrimination — the numbers a curation team reads
  * before trusting a classifier margin or an LM score as a GATE.
  * The admission ensemble's calibration family (gateOverlap, the LM
  * threshold sweep, the score profile) answers "what does this cut
  * admit"; this family answers the prior question, "is the score
  * worth cutting on at all" (AUC: does it rank positives above
  * negatives) and "does its magnitude mean what it claims"
  * (reliability: per score bin, predicted-vs-empirical rate).
  *
  * Everything is exact integer arithmetic until one final division,
  * so the DuckDB oracle reproduces each number bit-for-bit — the
  * same fixed-point discipline as the NB/LM scores themselves.
  *
  * Scale design (100 TB): AUC needs, per distinct score, the count
  * of negatives strictly below it — a cumulative sum in score order.
  * The textbook `Window.orderBy(score)` serializes the relation
  * through one task; the rank-sum formula needs global ranks, same
  * problem. Instead: collapse to one row per (key, score) — a
  * partial-agg groupBy, corpus-sized shuffle but bounded rows out —
  * then [[graft.operators.ScaleOps.withPrefixSumByKey]]'s two-pass
  * keyed prefix sum (range-partition by (key, score); driver sees
  * one tiny row per partition segment), then one aggregate. No
  * single-task stage anywhere, and every class of a bounded label
  * enum is evaluated in the SAME two passes.
  */
object Eval {

  /** Exact ROC AUC per key (Mann-Whitney with the standard half-credit
    * for ties — the trapezoidal ROC area): for each key,
    * `AUC = [Σ_s n_pos(s)·(cneg_below(s) + n_neg(s)/2)] / (N⁺·N⁻)`.
    * Emitted as the INTEGER numerator `u2 = Σ n_pos·(2·cneg_below +
    * n_neg)` (twice the U statistic — exact, engine-portable) plus
    * `auc = u2 / (2·n_pos·n_neg)` as the one final IEEE division both
    * engines perform identically. A key with no positives or no
    * negatives has no ranking to measure: `auc` is NULL there (u2
    * still emitted), never a silent 0 or NaN.
    *
    * @param scored one row per (key, item): `keyCol` the bounded task
    *        enum (a class in one-vs-rest, a gate), `scoreCol` the
    *        EXACT discrete score (fixed-point long — float scores
    *        with engine-specific rounding would make tie-groups
    *        diverge), `labelCol` boolean ground truth. Rows with a
    *        NULL score are EXCLUDED up front (explicitly, round 16):
    *        a null has no rank — and the engines disagree on where
    *        one sorts (Spark ranges NULLS FIRST, SQL windows default
    *        NULLS LAST), so admitting them would silently diverge
    *        from any SQL oracle; n_pos/n_neg therefore count SCORED
    *        rows only.
    */
  def aucByKey(scored: DataFrame, keyCol: String, scoreCol: String,
               labelCol: String): DataFrame = {
    val grouped = scored
      .filter(col(scoreCol).isNotNull)
      .groupBy(col(keyCol), col(scoreCol).as("_s"))
      .agg(count(when(col(labelCol), 1)).as("_np"),
        count(when(!col(labelCol), 1)).as("_nn"))
    val pref = ScaleOps.withPrefixSumByKey(grouped, keyCol, "_s", "_nn",
      "_cneg_below")
    pref.groupBy(col(keyCol))
      .agg(sum(col("_np")).as("n_pos"), sum(col("_nn")).as("n_neg"),
        sum(col("_np") * (lit(2L) * col("_cneg_below") + col("_nn")))
          .as("u2"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg"))))
  }

  /** Exact type-1 quantile PROFILE per key — the generic form of
    * [[Admission.gateScoreProfile]] (which delegates here), exposed
    * for HIGH-CARDINALITY key axes: per-source quality profiles (20
    * sources in the test corpus, thousands of domains in production),
    * per-shard score audits. For every key and fraction q, the member
    * of the key's score multiset at 1-based rank `max(1, ceil(q·n))`
    * in ascending `(score, id)` order, plus the scored count n —
    * engine-portable because the selected value always IS a member,
    * never an interpolated float.
    *
    * ONE [[graft.operators.ScaleOps.exactRanksByKey]] selection: two
    * jobs regardless of key count (this is exactly the regime the
    * multi-key machinery exists for — a per-key loop at domain
    * cardinality would schedule thousands of driver jobs). Rows with
    * a NULL score must be filtered by the caller (they are not part
    * of any distribution; the admission wrapper does so).
    */
  def scoreProfileByKey(scored: DataFrame, keyCol: String, scoreCol: String,
                        idCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "scoreProfileByKey: quantile fractions must be in [0, 1]")
    val spark = scored.sparkSession
    val sel = ScaleOps.exactRanksByKey(scored, keyCol, scoreCol, idCol,
      n => qs.map(q => math.max(1L, math.ceil(q * n).toLong)).distinct)
    // bounded: |keys| × |qs| rows — map each (key, q) back to its
    // selected rank's value driver-side
    val keyField = sel.schema.fields(0)
    val collected = sel.collect()
      .map(r => (r.get(0), r.getLong(2)) -> ((r.getLong(1), r.getDouble(3))))
      .toMap
    val nOfKey = collected.map { case ((k, _), (n, _)) => k -> n }
    // null-safe key order (round 16): the generic high-cardinality key
    // axis (per-domain, per-source) makes NULL keys plausible, and the
    // output order is presentational only — NULL sorts first.
    implicit val ord: Ordering[Any] =
      Ordering.by(k => if (k == null) "" else k.toString)
    val rows = nOfKey.keys.toSeq.sorted.flatMap { k =>
      val n = nOfKey(k)
      qs.map { q =>
        val rank = math.max(1L, math.ceil(q * n).toLong)
        org.apache.spark.sql.Row(k, q, n, collected((k, rank))._2)
      }
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(keyField.copy(nullable = true),
        StructField("q", DoubleType, nullable = false),
        StructField("n_scored", LongType, nullable = false),
        StructField("score", DoubleType, nullable = false))))
  }

  /** Score-calibration (reliability) table per key: fixed-width bins
    * of the exact score, each with its population, positive count and
    * empirical positive rate — the reliability diagram as a query.
    * Bin id is the exact FLOOR division `(s − pmod(s, w)) div w`:
    * the pmod subtraction makes the numerator an exact non-positive-
    * remainder multiple of w (portable for negative scores, where
    * engines disagree on `%` sign), and `div` keeps the division in
    * LONG arithmetic — exact over the full long range, where an IEEE
    * double division would silently lose bin-id precision beyond
    * 2^53 (round 16; the DuckDB mirror uses `//` for the same
    * reason). `bin_lo = bin·w` rides along so the table reads as
    * score intervals.
    * One partial-agg groupBy — output is bounded by the score RANGE
    * over the bin width, never by corpus size.
    */
  def calibrationBins(scored: DataFrame, keyCol: String, scoreCol: String,
                      labelCol: String, binWidth: Long): DataFrame = {
    require(binWidth >= 1, "calibrationBins: bin width must be positive")
    val bin = expr(
      s"CAST(`$scoreCol` - pmod(`$scoreCol`, ${binWidth}L) AS BIGINT) " +
        s"div ${binWidth}L")
    scored
      .groupBy(col(keyCol), bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        count(when(col(labelCol), 1)).as("n_pos"))
      .select(col(keyCol), col("bin"),
        (col("bin") * lit(binWidth)).as("bin_lo"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("pos_rate"))
  }
}
