package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Admission, Classifier, Corpus, Dedup, Sketches, TextAnalysis}
import graft.streaming.Streams

class AdmissionSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def cfg(docs: DataFrame) = {
    val bench = docs.filter(col("source").isin("src0", "src1"))
    val bloom = Sketches.bloomBuild(
      Dedup.shingles(bench, w = 5).select(col("sh")), "sh",
      numBits = 1 << 18, numHashes = 4)
    val gate = (sh: Column) =>
      Sketches.bloomGateColumn(bloom, sh, numBits = 1 << 18, numHashes = 4)
    val emb = Tables.embeddings(spark, sfDir)
    val sig = Corpus.benchSignatureTable(docs, emb, Seq("src0", "src1"))
      .localCheckpoint(eager = true)
    (gate, Some(Admission.SemanticCfg(emb, sig, threshold = 0.42)),
      TextAnalysis.bigramLmTrain(docs).localCheckpoint(eager = true),
      Classifier.nbTrain(docs).localCheckpoint(eager = true))
  }

  private def rows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)))).sortBy(t => (t._1, t._2)).toSeq

  test("report: every doc carries all 7 gate rows; decision == AND of the six gates") {
    val docs = Tables.documents(spark, sfDir)
    val (gate, sem, lm, nb) = cfg(docs)
    val rep = Admission.report(docs, Seq("src0", "src1"), gate, 0.3, sem,
      lm, -3.40, nb, Seq("en"))
    val n = docs.count()
    val perGate = rep.groupBy("gate").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGate.keySet === Admission.GateOrder.toSet)
    assert(perGate.values.toSet === Set(n), "one row per doc per gate")
    // decision row is exactly the conjunction of the six gate rows
    val byDoc = rep.groupBy("doc_id").agg(
      min(when(col("gate") =!= "7_decision", col("pass"))).as("all_pass"),
      max(when(col("gate") === "7_decision", col("pass"))).as("decision"))
    assert(byDoc.filter(col("all_pass") =!= col("decision")).count() === 0L)
    // the ensemble discriminates on this corpus: some kept, some dropped
    val kept = rep.filter(col("gate") === "7_decision" && col("pass")).count()
    assert(kept > 0 && kept < n)
  }

  test("gate semantics: bench sources fail 1_source, unscorable docs fail 5_lm, unknown label space rejects") {
    val docs = Seq(
      (1L, "the a of and in one two three four five", "en", "src5", 40),
      (2L, "x", "en", "src5", 1),                 // 1 token: no LM pairs
      (3L, "the a of and in uno dos tres", "es", "src0", 28) // bench source
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val (gate, _, lm, nb) = cfg(Tables.documents(spark, sfDir))
    val rep = Admission.report(docs, Seq("src0", "src1"), gate, 0.3, None,
        lm, -99.0, nb, Seq("en"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(rep((3L, "1_source")) === false, "bench source must fail the source gate")
    assert(rep((1L, "1_source")) === true)
    assert(rep((2L, "5_lm")) === false,
      "a doc the LM cannot score must REJECT — a gate that cannot certify never admits")
    assert(rep((2L, "2_quality")) === false, "1 token fails the quality gate")
    assert(rep((1L, "5_lm")) === true, "threshold -99 admits every scorable doc")
    // empty allowed-label set refuses outright
    val e = intercept[IllegalArgumentException] {
      Admission.report(docs, Nil, gate, 0.3, None, lm, -99.0, nb, Nil)
    }
    assert(e.getMessage.contains("allowed-label"))
  }

  test("gateOverlap: n_fail and n_fail_alone match a hand-computed verdict matrix") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // synthetic decision table: 4 docs × (6 gates + decision)
    //   doc 1: all pass; doc 2: fails ONLY lm; doc 3: fails lm AND nb;
    //   doc 4: fails ONLY source
    val verdicts = Map(
      1L -> Set.empty[String],
      2L -> Set("5_lm"),
      3L -> Set("5_lm", "6_nb"),
      4L -> Set("1_source"))
    val rows = for {
      (id, fails) <- verdicts.toSeq
      g <- Admission.GateOrder
    } yield Row(id, g,
      if (g == "7_decision") fails.isEmpty else !fails(g),
      null.asInstanceOf[java.lang.Double])
    val rep = spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("gate", StringType), StructField("pass", BooleanType),
        StructField("score", DoubleType))))
    val got = Admission.gateOverlap(rep).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      "1_source" -> ((1L, 1L)),        // doc 4, alone
      "2_quality" -> ((0L, 0L)),
      "3_contamination" -> ((0L, 0L)),
      "4_semantic" -> ((0L, 0L)),
      "5_lm" -> ((2L, 1L)),            // docs 2+3 fail; only doc 2 alone
      "6_nb" -> ((1L, 0L))))           // doc 3 also fails lm — never alone
  }

  test("batch == stream: per-micro-batch reports union to the one-shot batch report bit-for-bit") {
    val docs = Tables.documents(spark, sfDir)
    val (gate, sem, lm, nb) = cfg(docs)
    val base = java.nio.file.Files.createTempDirectory("graft_adm").toString
    val src = s"$base/src"
    // three files → three micro-batches under maxFilesPerTrigger = 1
    (0 until 3).foreach(i =>
      docs.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("append").parquet(src))
    val sch = spark.read.parquet(src).schema
    Streams.admissionPipeline(spark, sch, src, s"$base/out", s"$base/ck",
        Seq("src0", "src1"), gate, 0.3, sem, lm, -3.40, nb, Seq("en"))
      .awaitTermination()
    val streamed = spark.read.parquet(s"$base/out")
      .select("doc_id", "gate", "pass", "score")
    val batch = Admission.report(docs, Seq("src0", "src1"), gate, 0.3, sem,
      lm, -3.40, nb, Seq("en"))
    assert(rows(streamed) === rows(batch),
      "admission is ONE definition: how the corpus arrived must not " +
        "change a single verdict")
  }
}
