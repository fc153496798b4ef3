package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Classifier, Corpus, TextAnalysis}

/** The right-to-be-forgotten laws for the three additive count states:
  * subtracting a folded cohort is BIT-IDENTICAL to rebuilding from the
  * survivors, zeroed keys drop (derived stats like the LM vocabulary
  * must shrink), and a never-folded cohort is refused loudly.
  */
class ForgetSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)
  private def removed = docs.filter(col("doc_id") % 10 === 3)
  private def survivors = docs.filter(col("doc_id") % 10 =!= 3)

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("NB subtract == rebuild on survivors, bit for bit") {
    val sub = Classifier.nbCountsSubtract(
      Classifier.nbCountsBuild(docs, buckets = 64),
      Classifier.nbCountsBuild(removed, buckets = 64))
    assert(rows(sub) === rows(Classifier.nbCountsBuild(survivors, buckets = 64)))
  }

  test("LM subtract == rebuild on survivors; a cohort-only token leaves V") {
    val sub = TextAnalysis.lmCountsSubtract(
      TextAnalysis.lmCountsBuild(docs), TextAnalysis.lmCountsBuild(removed))
    assert(rows(sub) === rows(TextAnalysis.lmCountsBuild(survivors)))
    // V is the unigram ROW count — zero-row dropping is what shrinks it
    val a = Seq((1L, "aa bb"), (2L, "aa zz")).toDF("doc_id", "text")
    val gone = TextAnalysis.lmCountsSubtract(
      TextAnalysis.lmCountsBuild(a),
      TextAnalysis.lmCountsBuild(a.filter(col("doc_id") === 2)))
    val vocab = gone.filter(col("kind") === "uni")
      .select("w1").as[String].collect().toSet
    assert(vocab === Set("aa", "bb"), "zz lived only in the removed cohort")
  }

  test("DSIR subtract == rebuild on survivors, both tallies") {
    val pred = col("lang") === "en"
    val sub = Corpus.importanceCountsSubtract(
      Corpus.importanceCountsBuild(docs, pred),
      Corpus.importanceCountsBuild(removed, pred))
    assert(rows(sub) === rows(Corpus.importanceCountsBuild(survivors, pred)))
  }

  test("subtracting a never-folded cohort is refused") {
    val a = Seq((1L, "aa bb")).toDF("doc_id", "text")
    val foreign = Seq((9L, "qq qq qq")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.lmCountsSubtract(
        TextAnalysis.lmCountsBuild(a),
        TextAnalysis.lmCountsBuild(foreign)).collect()
    }
    assert(e.getMessage.contains("never (fully) folded"))
  }
}
