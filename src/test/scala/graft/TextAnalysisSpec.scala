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
}
