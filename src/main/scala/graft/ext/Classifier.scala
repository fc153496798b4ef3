package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hashed-feature multinomial Naive Bayes — the model-based selection
  * tier's SUPERVISED member (the fastText-style quality/domain
  * classifier a curation pipeline runs next to the generative LM
  * scorer and the DSIR importance weigher). Training is closed-form
  * counting, so the whole family is deterministic end to end and the
  * DuckDB oracle reproduces every fixed-point log-probability
  * bit-for-bit — no SGD, no seed, no iteration order.
  *
  * Model: `P(label | doc) ∝ P(label) · Π_f P(f | label)` over hashed
  * uni+bigram feature OCCURRENCES (multinomial event model) with
  * add-one smoothing over the `buckets` hashed vocabulary. Per-pair
  * `ln` values snap to 1e-3 fixed point BEFORE any per-document
  * summation (the pipeline's embedding-centroid convention), so doc
  * scores are long-integer sums — associative across partitions and
  * engines.
  *
  * Scale design (100 TB):
  *  - TRAIN is one corpus pass: the feature stream collapses to
  *    `(label, bucket)` counts via partial+final aggregation (map-side
  *    combine absorbs the token stream before the exchange); the count
  *    state is ≤ `labels × (buckets+1)` rows — bounded, never
  *    corpus-sized.
  *  - The counts are ADDITIVE under [[nbCountsMerge]]
  *    (`build(A) ⊕ build(B) == build(A ∪ B)`), so a stream maintains
  *    the classifier live ([[graft.streaming.Streams.nbMaintainPipeline]])
  *    without re-reading the corpus — same discipline as the DSIR and
  *    histogram states.
  *  - CLASSIFY is scan → per-doc bucket collapse → broadcast join with
  *    the dense model (≤ labels×buckets rows by construction) → one
  *    `(doc_id, label)` partial+final agg → per-doc argmax over the
  *    bounded label set. No corpus-sized shuffle carries text.
  */
object Classifier {

  /** Hashed uni+bigram feature occurrences: `(doc_id, bucket, n)` with
    * occurrence multiplicity pre-collapsed per document (the multinomial
    * event model counts occurrences; collapsing before the model join
    * bounds the join fan-out by DISTINCT buckets per doc, not token
    * count). Salt `nb|` keeps this hash family independent of the
    * `dsir|` importance buckets. Features form inside the scan stage
    * (array transform — no positional self-join).
    */
  def hashedFeatureCounts(docs: DataFrame, buckets: Int,
                          carry: Seq[String] = Nil): DataFrame = {
    // Typed flatMap (round 17): ONE pass emits every unigram and bigram
    // occurrence's bucket directly — the round-13 form built the bigram
    // strings through an interpreted array-transform lambda, unioned two
    // corpus scans, and md5-hex'd each feature through
    // conv(substring(...)); this is the Dedup.shingles finding applied
    // to the feature kernel. Bit-identical buckets: the JVM hash is the
    // same first-4-md5-bytes value ([[graft.functions.KeyFunctions
    // .md5First32]]) of the same "nb|"-salted feature string, and split
    // keeps trailing empty tokens (limit -1) like split()/string_split.
    val spark = docs.sparkSession
    import spark.implicits._
    require(carry.size <= 1 && carry.forall(c =>
      docs.schema(c).dataType == org.apache.spark.sql.types.StringType),
      s"hashedFeatureCounts: carry must be at most one STRING column, " +
        s"got ${carry.mkString(", ")}")
    val biFn = bucketIter // local copy: the closure must not capture the object
    def bucketsOf(text: String): Iterator[Int] = biFn(text, buckets)
    val bucketed = carry match {
      case Seq() =>
        docs.select(col("doc_id").cast("long"), col("text"))
          .as[(Long, String)]
          .flatMap { case (id, text) => bucketsOf(text).map(bk => (id, bk)) }
          .toDF("doc_id", "bucket")
      case Seq(k) =>
        docs.select(col("doc_id").cast("long"), col(k), col("text"))
          .as[(Long, String, String)]
          .flatMap { case (id, kv, text) =>
            bucketsOf(text).map(bk => (id, kv, bk))
          }
          .toDF("doc_id", k, "bucket")
    }
    bucketed
      .groupBy(col("doc_id") +: carry.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** The hashed uni+bigram feature-bucket stream of one document — the
    * ONE definition of the NB feature space, shared by the per-doc
    * collapse ([[hashedFeatureCounts]]) and the direct label-grain
    * training aggregation ([[nbCountsBuild]]). Salt `nb|`; split keeps
    * trailing empty tokens (limit -1) like split()/string_split.
    * A FUNCTION VALUE (bound to a local before each flatMap captures
    * it): a method reference would drag the whole non-serializable
    * Classifier object into the task closure.
    */
  private val bucketIter: (String, Int) => Iterator[Int] = (text, buckets) =>
    if (text == null) Iterator.empty
    else {
      import org.apache.spark.unsafe.types.UTF8String
      val t = text.split(" ", -1)
      def b(f: String): Int =
        (graft.functions.KeyFunctions.md5First32(
          UTF8String.fromString("nb|" + f)) % buckets).toInt
      val uni = t.iterator.map(b)
      val bi =
        if (t.length < 2) Iterator.empty
        else (0 until t.length - 1).iterator
          .map(i => b(t(i) + " " + t(i + 1)))
      uni ++ bi
    }

  /** Sentinel bucket carrying the per-label DOCUMENT count (the prior's
    * numerator) inside the same additive count frame as the feature
    * counts — one state table, one merge law, one fold discipline.
    */
  val DocCountBucket: Int = -1

  /** Class-conditional count state from labeled documents: one row per
    * `(label, bucket)` with the occurrence count `c`, plus one
    * [[DocCountBucket]] row per label holding its document count.
    * Unlabeled rows (NULL label) are excluded — they are what the
    * trained classifier will label. ADDITIVE under [[nbCountsMerge]].
    * The hash geometry rides as a constant `buckets` stamp column
    * ([[Stamp]]'s discipline) so persisted state can never be derived
    * from or combined under a different geometry silently.
    */
  def nbCountsBuild(docs: DataFrame, labelCol: String = "lang",
                    buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, "nbCountsBuild: need at least two buckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val labeled = docs.filter(col(labelCol).isNotNull)
      .withColumn("_label", col(labelCol).cast("string"))
    // direct label-grain aggregation (round 18, guide §2.3 — aggregate
    // before you shuffle): training needs only Σ occurrences per
    // (label, bucket), so routing the feature stream through
    // hashedFeatureCounts' per-DOC collapse paid a corpus-grain
    // exchange on (doc_id, label, bucket) before the label rollup.
    // One aggregation instead of two: map-side combine collapses the
    // occurrence stream to ≤ labels×buckets rows per partition before
    // the only exchange. Counts are bit-identical (Σ over docs of
    // per-doc occurrence counts == plain occurrence counts), and the
    // per-doc form stays what classification joins on.
    val biFn = bucketIter // local copy: the closure must not capture the object
    val feat = labeled.select(col("_label"), col("text"))
      .as[(String, String)]
      .flatMap { case (label, text) =>
        biFn(text, buckets).map(bk => (label, bk))
      }
      .toDF("label", "bucket")
      .groupBy(col("label"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val docCounts = labeled.groupBy(col("_label").as("label"))
      .agg(count(lit(1)).as("c"))
      .select(col("label"), lit(DocCountBucket).as("bucket"), col("c"))
    feat.select(col("label"), col("bucket"), col("c"))
      .unionByName(docCounts)
      .withColumn("buckets", lit(buckets))
  }

  /** Additive merge of two [[nbCountsBuild]] frames. NOT idempotent —
    * stream maintenance pairs it with the batch-id insert-if-absent
    * fold discipline. Stamped inputs must agree on geometry; the
    * common stamp rides through to the output.
    */
  def nbCountsMerge(a: DataFrame, b: DataFrame): DataFrame = {
    val stamp = Stamp.agreeing(Seq(a, b), "nbCountsMerge", "buckets")
    val cols = Seq("label", "bucket", "c").map(col)
    Stamp.restamp(
      a.select(cols: _*).unionByName(b.select(cols: _*))
        .groupBy(col("label"), col("bucket"))
        .agg(sum(col("c")).as("c")),
      "buckets", stamp)
  }

  /** Right-to-be-forgotten for the classifier: subtract a removed
    * cohort's [[nbCountsBuild]] from the accumulated state —
    * bit-identical to rebuilding on the survivors (counts are
    * invertible; zeroed keys drop, so a fully-removed label vanishes
    * from the model exactly as a rebuild would omit it). Refuses a
    * cohort the state never folded in (negative-count validation).
    */
  def nbCountsSubtract(state: DataFrame, removed: DataFrame): DataFrame = {
    val stamp = Stamp.agreeing(Seq(state, removed), "nbCountsSubtract",
      "buckets")
    Stamp.restamp(
      graft.operators.ScaleOps.subtractCounts(state, removed,
        keys = Seq("label", "bucket"), counts = Seq("c"),
        what = "nbCountsSubtract"),
      "buckets", stamp)
  }

  /** DENSE fixed-point model from accumulated counts: one row per
    * `(label, bucket)` for every bucket in [0, buckets) —
    * `lp_fp = round(ln((c+1)/(tot_label+buckets)) · 1000)` — plus one
    * [[DocCountBucket]] row per label carrying the prior
    * `round(ln(n_docs_label / n_docs) · 1000)`. Dense emission is what
    * lets classification join WITHOUT a missing-key default path, and
    * the table is ≤ `labels × (buckets+1)` rows — broadcast material
    * by construction. Bit-identical to training once on the
    * concatenated corpus when counts were folded additively (the
    * streaming oracle pins it).
    */
  def nbModelFromCounts(counts: DataFrame, buckets: Int = 1024): DataFrame = {
    require(Seq("label", "bucket", "c").forall(counts.columns.contains),
      "nbModelFromCounts: not an NB count state — need (label, bucket, c) " +
        "as built by nbCountsBuild")
    Stamp.requireMatch(counts, "nbModelFromCounts", "buckets", buckets)
    val spark = counts.sparkSession
    // bounded by labels×(buckets+1): materialize ONCE so the totals,
    // the dense grid and the priors all read the same blocks
    val c = counts.select(col("label"), col("bucket"), col("c"))
      .localCheckpoint(eager = true)
    val feat = c.filter(col("bucket") =!= DocCountBucket)
    val docs = c.filter(col("bucket") === DocCountBucket)
      .select(col("label"), col("c").as("n_docs"))
    val totals = feat.groupBy(col("label")).agg(sum(col("c")).as("tot"))
    val nTotal = docs.agg(sum(col("n_docs"))).head().getLong(0)
    val grid = docs.select(col("label")).distinct()
      .crossJoin(spark.range(buckets).select(col("id").cast("int").as("bucket")))
    val lp = grid
      .join(totals, Seq("label"))
      .join(feat, Seq("label", "bucket"), "left")
      .select(col("label"), col("bucket"),
        round(log((coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) /
          (col("tot").cast("double") + lit(buckets.toDouble))) * lit(1000), 0)
          .cast("long").as("lp_fp"))
    val prior = docs.select(col("label"), lit(DocCountBucket).as("bucket"),
      round(log(col("n_docs").cast("double") / lit(nTotal.toDouble)) *
        lit(1000), 0).cast("long").as("lp_fp"))
    // the model carries the geometry stamp forward: nbClassify hashes
    // features with ITS buckets parameter, and a model applied under a
    // different geometry scores silently wrong
    lp.unionByName(prior).withColumn("buckets", lit(buckets))
  }

  /** One-call batch train: counts → dense fixed-point model. */
  def nbTrain(docs: DataFrame, labelCol: String = "lang",
              buckets: Int = 1024): DataFrame =
    nbModelFromCounts(nbCountsBuild(docs, labelCol, buckets), buckets)

  /** Classify every document against a trained model: per-doc feature
    * buckets join the BROADCAST dense model, scores sum in fixed point
    * (`score_fp = prior_fp + Σ n·lp_fp`), and the argmax label wins
    * with a deterministic `(score desc, label asc)` tie-break. Returns
    * `(doc_id, pred_label, n_feats, score_fp)` for every input row —
    * the per-doc argmax window runs over the bounded label set, never
    * data-sized partitions.
    */
  def nbClassify(docs: DataFrame, model: DataFrame,
                 buckets: Int = 1024): DataFrame = {
    val perLabel = nbScores(docs, model, buckets)
    // argmax as a partial aggregation (round 18, guide §2.4): the
    // row_number window paid its own doc_id exchange plus a sort of the
    // per-(doc, label) score table; min(struct(-score_fp, label, ...))
    // picks the identical row (highest score, ties to the ascending
    // label — struct ordering == the window's (score desc, label asc))
    // with map-side combine and no sort. n_feats rides in the struct
    // (it is the same value on every label row of a doc — the dense
    // model joins every doc bucket to every label).
    perLabel
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("score_fp")).as("neg_score"),
        col("label"), col("n_feats"))).as("b"))
      .select(col("doc_id"), col("b.label").as("pred_label"),
        col("b.n_feats").as("n_feats"),
        (-col("b.neg_score")).as("score_fp"))
  }

  /** The FULL per-(doc, label) score table [[nbClassify]] argmaxes
    * over: `(doc_id, label, n_feats, score_fp)` for every label of the
    * model's bounded class enum (the dense model joins every per-doc
    * bucket to every label, so each doc with ≥1 feature scores under
    * ALL labels; feature-less docs — empty text — emit nothing, as in
    * classification). This is the evaluation tier's raw material:
    * one-vs-rest margins, ranking metrics (AUC), and calibration bins
    * all need the scores the argmax discards.
    */
  def nbScores(docs: DataFrame, model: DataFrame,
               buckets: Int = 1024): DataFrame = {
    require(Seq("label", "bucket", "lp_fp").forall(model.columns.contains),
      "nbScores: not an NB model — need (label, bucket, lp_fp) as " +
        "built by nbModelFromCounts")
    Stamp.requireMatch(model, "nbScores", "buckets", buckets)
    val feat = model.filter(col("bucket") =!= DocCountBucket)
      .select(col("label"), col("bucket"), col("lp_fp"))
    val prior = model.filter(col("bucket") === DocCountBucket)
      .select(col("label"), col("lp_fp").as("prior_fp"))
    hashedFeatureCounts(docs, buckets)
      .join(broadcast(feat), Seq("bucket"))
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("n")).as("n_feats"),
        sum(col("n") * col("lp_fp")).as("sum_lp_fp"))
      .join(broadcast(prior), Seq("label"))
      .select(col("doc_id"), col("label"), col("n_feats"),
        (col("sum_lp_fp") + col("prior_fp")).as("score_fp"))
  }

  /** One-vs-rest MARGINS from a [[nbScores]] table: per (doc, label),
    * `margin_fp = score_fp(label) − max over OTHER labels` — positive
    * iff the label would win the argmax (ties at the top → margin 0
    * for both). The margin is the classifier's native confidence
    * ordering for "is this document class c?" — a length-robust
    * discriminant (the document-length term in each class score
    * cancels in the difference), and exact long arithmetic end to end
    * (no softmax float). Windows run over the per-doc label set — a
    * BOUNDED enum partition (≤ |labels| rows per doc), never a
    * data-sized window. A dense model guarantees ≥2 labels per scored
    * doc; a degenerate single-label table has no "rest" and margins
    * NULL (the max-of-nothing), which downstream consumers must treat
    * as unusable rather than zero.
    */
  def nbMargins(scores: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id"))
    val top = scores.withColumn("_top", max(col("score_fp")).over(byDoc))
    top
      .withColumn("_n_top",
        sum(when(col("score_fp") === col("_top"), 1L).otherwise(0L))
          .over(byDoc))
      .withColumn("_second",
        max(when(col("score_fp") < col("_top"), col("score_fp")))
          .over(byDoc))
      .withColumn("_others_max",
        when(col("score_fp") < col("_top") || col("_n_top") > 1, col("_top"))
          .otherwise(col("_second")))
      .select(col("doc_id"), col("label"),
        (col("score_fp") - col("_others_max")).as("margin_fp"))
  }
}
