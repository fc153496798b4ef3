package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("BPE learns the textbook merge sequence on the low/lower/lowest corpus") {
    // the classic BPE example: 5×"low" + 2×"lower" + 1×"lowest".
    // Expected merges: (l,o) and (o,w) tie at 8 → lexicographic tie-break
    // picks (l,o); then (lo,w)=8; (low,e)=3; (lowe,r)=2.
    val docs = Seq((1L, "low low low low low lower lower lowest"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, rounds = 4)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1, "l", "o", 8L),
      (2, "lo", "w", 8L),
      (3, "low", "e", 3L),
      (4, "lowe", "r", 2L)))
  }

  test("BPE merge application is leftmost-nonoverlapping (the 'a a a' case)") {
    // "aaa" has adjacent pairs (a,a)×2 but the merge must consume
    // left-to-right without overlap: ' a a a ' → ' aa a ', so round 2
    // merges (aa, a) — an overlap bug would instead produce (a, aa) or
    // double-count round 1.
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((1, "a", "a", 4L), (2, "aa", "a", 2L)))
  }

  test("BPE stops early when every word is a single symbol") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // round 1 merges (a,b)=2; round 2 merges (c,d)=1; nothing remains —
    // asking for more rounds returns just the learnable merges.
    val got = TextAnalysis.bpeMerges(docs, rounds = 10)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((1, "a", "b", 2L), (2, "c", "d", 1L)))
  }

  test("BPE is deterministic across runs on real documents") {
    val docs = Tables.documents(spark, sfDir)
    val a = TextAnalysis.bpeMerges(docs, rounds = 3).collect().toSeq
    val b = TextAnalysis.bpeMerges(docs, rounds = 3).collect().toSeq
    assert(a === b)
    assert(a.size === 3)
  }

  test("BPE encode: zero merges = one token per char; trained merges shrink counts") {
    // textbook corpus again: with no merges every character is a symbol,
    // so n_bpe_tokens == non-space char count; after the 4 learned
    // merges, "low"→1 symbol, "lower"→2 ("lowe","r" — wait: rounds
    // (l,o)(lo,w)(low,e)(lowe,r) make "lower" 1), "lowest"→3.
    val docs = Seq((1L, "low low lower lowest"), (2L, ""))
      .toDF("doc_id", "text")
    val none = TextAnalysis.bpeEncodeWith(docs, Nil).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(none.toSeq === Seq((1L, 4L, 17L), (2L, 0L, 0L)))
    val enc = TextAnalysis.bpeEncode(docs, rounds = 4).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // merges learned on THIS corpus: (l,o),(lo,w),(low,e),(lowe,r) →
    // low=1 sym ×2, lower=1 sym ("lower"), lowest: ' lowe s t ' → 3.
    assert(enc.toSeq === Seq((1L, 4L, 2L + 1L + 3L), (2L, 0L, 0L)))
  }

  test("BPE encode on real documents: counts bounded by chars below and words above") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    val base = TextAnalysis.bpeEncodeWith(docs, Nil)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).head().getLong(0)
    val enc = TextAnalysis.bpeEncode(docs, rounds = 4)
    import org.apache.spark.sql.functions.{col, sum}
    val row = enc.agg(sum("n_bpe_tokens"), sum("n_words")).head()
    val (tokens, words) = (row.getLong(0), row.getLong(1))
    assert(tokens < base, s"4 merges should shrink $base")
    assert(tokens >= words, "a word is at least one token")
    // every doc individually respects the word lower bound
    assert(enc.filter(col("n_bpe_tokens") < col("n_words")).count() === 0L)
  }

  test("BPE tokenize: stable vocab ids, sequences consistent with encode, stamp validated, UNK = -1") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).limit(100)
    val merges = TextAnalysis.bpeMergeList(docs, rounds = 4)
    val vocab = TextAnalysis.bpeVocab(docs, merges)
    // ids are a dense 0..n-1 ranking in lexicographic token order —
    // stable across runs by construction
    val vs = vocab.orderBy("id").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(vs.map(_._2).toSeq === vs.indices.toSeq)
    assert(vs.map(_._1).toSeq === vs.map(_._1).sorted.toSeq)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_vocab").toString
    TextAnalysis.bpeVocabWrite(vocab, s"$tmp/vocab", merges.length)
    val loaded = spark.read.parquet(s"$tmp/vocab")
    // per-doc sequence length == bpeEncode's per-doc token count (two
    // independent paths over the same merge chain)
    val seqLens = TextAnalysis.bpeTokenizeWith(docs, merges, loaded)
      .select(col("doc_id"), size(col("token_ids")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val encCounts = TextAnalysis.bpeEncodeWith(docs, merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2).toInt).toMap
    assert(seqLens === encCounts)
    // no UNK on the training corpus; every id within vocab range
    val ids = TextAnalysis.bpeTokenizeWith(docs, merges, loaded)
      .select(explode(col("token_ids")).as("id")).distinct()
      .collect().map(_.getInt(0))
    assert(ids.forall(i => i >= 0 && i < vs.length))
    // a FOREIGN corpus (symbols the vocab never saw) surfaces as -1,
    // not silently dropped
    import spark.implicits._
    val foreign = Seq((1L, "zzzz qqqq")).toDF("doc_id", "text")
    val fIds = TextAnalysis.bpeTokenizeWith(foreign, merges, loaded)
      .select(explode(col("token_ids")).as("id"))
      .collect().map(_.getInt(0))
    assert(fIds.nonEmpty && fIds.contains(-1))
    // tokenizing with a merge list the vocab wasn't stamped for refuses
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeTokenizeWith(docs, merges.take(2), loaded)
    }
    assert(e.getMessage.contains("would not correspond"))
    graft.plans.Pipeline.deleteRecursively(java.nio.file.Paths.get(tmp))
  }
}
