package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))

  test("frameDedup pairs same-modality docs on shared frames; buckets and cap bind") {
    val A = "aaaaaaaaaaaaaaaa"; val B = "bbbbbbbbbbbbbbbb"
    val C = "cccccccccccccccc"; val D = "dddddddddddddddd"
    val E = "eeeeeeeeeeeeeeee"
    // modality = doc_id % 3 → 0,3,6 image; 1,4 audio; 2 video
    val df = docs(
      0L -> (A + B),     // image: frames {A,B}
      3L -> (A + B + C), // image: shares {A,B} with doc 0 → pair
      6L -> (D + B),     // image: shares only {B} → below minShared
      1L -> (A + B),     // audio: SAME bytes as doc 0 — other bucket, no pair
      4L -> (E + C),     // audio: nothing shared within its bucket
      2L -> (A + B))     // video: alone in its bucket
    val got = Multimodal.frameDedup(df, frameBytes = 16, minShared = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(got === Seq(("image", 0L, 3L, 2L)),
      s"expected exactly the in-bucket 2-frame pair, got $got")
    // boilerplate cap: frame B appears in 3 image docs; capping at 2
    // removes it from candidate generation, leaving 0-3 sharing only A
    assert(Multimodal.frameDedup(df, frameBytes = 16, minShared = 2,
      maxFrameFreq = 2).count() === 0L)
    // unaligned tail: a doc whose last frame is short still fingerprints
    // deterministically (substring past the end truncates identically)
    val tail = docs(0L -> (A + "zz"), 3L -> (A + "zz"))
    val t = Multimodal.frameDedup(tail, frameBytes = 16, minShared = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(t === Seq((0L, 3L, 2L)))
  }

  test("modalityAnn buckets retrieval by modality and broadcasts the query side") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val queries = docs.filter(col("doc_id") < 6).select(col("doc_id"))
    val res = Multimodal.modalityAnn(docs, emb, queries, k = 10)
    val rows = res.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // six queries (two per modality), each with a full contiguous top-10
    assert(rows.map(_._2).distinct.sorted.toSeq === (0L until 6L).toSeq)
    rows.groupBy(_._2).foreach { case (qid, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1 to 10).toSeq, s"ranks for $qid")
    }
    // the bucketing invariant: every neighbor shares the query's modality
    rows.foreach { case (m, qid, _, cid) =>
      assert(qid % 3 === cid % 3, s"cross-modality pair $qid -> $cid")
      assert(m === Seq("image", "audio", "video")((qid % 3).toInt))
    }
    // queries are never their own neighbor
    assert(rows.forall { case (_, qid, _, cid) => qid != cid })
    // physical shape: the query side broadcasts — no shuffle on candidates
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "modality join should broadcast the query side")
  }
}
