package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact,
  * n-gram-Jaccard near-dup, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB):
  *  - Exact dedup is a hash-groupBy on a 128-bit content hash — one
  *    shuffle on a uniformly distributed key, no skew.
  *  - Naive pairwise Jaccard is O(n²); it exists here as the
  *    verification step only. The scale path is MinHash+LSH: shingle →
  *    k min-hashes → band keys → self-join on band buckets, which
  *    shuffles only (doc, band-key) pairs and compares only same-bucket
  *    candidates. Band width trades recall for bucket size; skewed
  *    buckets (boilerplate shingles) are bounded because signatures, not
  *    raw shingles, are joined.
  *  - All hash functions are md5-derived and engine-portable (the DuckDB
  *    oracle computes the identical pipeline), which also makes
  *    signatures stable across re-runs and clusters — a requirement for
  *    incremental dedup against an existing corpus.
  */
object Dedup {

  /** Tokens of the document text (single-space-delimited corpora). */
  private val toks = split(col("text"), " ")

  /** Word w-shingles as a distinct array, 1-based to mirror SQL array
    * semantics. Documents shorter than w tokens produce no shingles (the
    * `sequence` guard: Spark's sequence(1,0) is descending, NOT empty).
    */
  private def shingleArr(w: Int): Column =
    when(size(toks) >= w,
      array_distinct(transform(sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws(" ", (0 until w).map(o => element_at(toks, i + o)): _*))))
      .otherwise(array().cast("array<string>"))

  /** (doc_id, shingle) pairs, distinct per document. */
  def shingles(docs: DataFrame, w: Int = 3): DataFrame =
    docs.select(col("doc_id"), explode(shingleArr(w)).as("sh"))

  /** Exact dedup: group by content hash; keeper = min doc_id. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))

  /** Portable 32-bit hash: first 8 hex chars of md5, as a long.
    * Engine-portable (DuckDB: CAST('0x' || substr(md5(s),1,8) AS BIGINT)).
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Exact pairwise n-gram Jaccard over candidate pairs that share at
    * least one shingle (inverted-index join). O(n²) worst case — the
    * verification kernel, not the scale path.
    */
  def ngramJaccard(docs: DataFrame, w: Int = 3, threshold: Double = 0.8): DataFrame = {
    val tri = shingles(docs, w)
    val sizes = tri.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = tri.as("a")
      .join(tri.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("n1") + col("n2") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** MinHash+LSH near-dup detection — the scale path.
    *
    * @param numHashes signature length (k independent 32-bit min-hashes)
    * @param bandWidth rows per band; numHashes/bandWidth bands
    * @param threshold final exact-Jaccard verification threshold
    */
  def minhashLsh(docs: DataFrame, w: Int = 3, numHashes: Int = 8,
                 bandWidth: Int = 2, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bandWidth == 0, "bands must tile the signature")
    val tri = shingles(docs, w)
    // k min-hashes in ONE aggregation pass (partial min per partition).
    val minhashes = tri.groupBy(col("doc_id"))
      .agg(min(hash32(concat(lit("0|"), col("sh")))).as("mh0"),
        (1 until numHashes).map(s =>
          min(hash32(concat(lit(s"$s|"), col("sh")))).as(s"mh$s")): _*)
    // band keys: concatenate bandWidth consecutive signature rows.
    val nBands = numHashes / bandWidth
    val bandStructs = (0 until nBands).map { b =>
      val cols = (0 until bandWidth).map(r => col(s"mh${b * bandWidth + r}"))
      struct(lit(b).as("band"), concat_ws(",", cols: _*).as("bkey"))
    }
    val bands = minhashes.select(col("doc_id"),
      explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    // candidates: same band value in any band → LSH bucket join.
    val cands = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    // verification: exact Jaccard on candidates only.
    val sizes = tri.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = tri.select(col("doc_id").as("d1"), col("sh"))
      .join(cands, "d1")
      .join(tri.select(col("doc_id").as("d2"), col("sh")), Seq("d2", "sh"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("n1") + col("n2") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** 16-bit SimHash per document from token 32-bit hashes (with
    * multiplicity): bit b of the signature is the sign of
    * Σ_tokens (±1 by token-hash bit b). One explode + one aggregation.
    */
  def simhash16(docs: DataFrame): DataFrame = {
    val th = docs.select(col("doc_id"), explode(toks).as("token"))
      .withColumn("h", hash32(col("token")))
    val bitSums = th.groupBy(col("doc_id"))
      .agg(sum(shiftright(col("h"), 0).bitwiseAND(1) * 2 - 1).as("s0"),
        (1 until 16).map(b =>
          sum(shiftright(col("h"), b).bitwiseAND(1) * 2 - 1).as(s"s$b")): _*)
    val sig = (0 until 16).map(b =>
      when(col(s"s$b") >= 0, lit(1 << b)).otherwise(lit(0)))
      .reduce(_ + _)
    bitSums.select(col("doc_id"), sig.cast("int").as("simhash"))
  }
}
