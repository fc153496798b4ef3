package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Classifier, Eval}

/** The evaluation tier's laws: exact AUC against the brute-force
  * pairwise definition (ties included), calibration bins against
  * floor-division arithmetic on negative scores, and the margin
  * table's consistency with the classifier's argmax.
  */
class EvalSpec extends AnyFunSuite {
  import SparkTestBase._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(171L + i)))

  test("property: aucByKey == brute-force pairwise AUC for arbitrary tied multisets") {
    import SparkTestBase.spark.implicits._
    // small score pools force heavy ties — the half-credit path must
    // agree with the prefix-sum form on every draw
    val keyGen = for {
      n <- Gen.choose(2, 30)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf(-3L, -1L, 0L, 2L, 7L),
        Gen.oneOf(true, false)))
    } yield rows
    val tableGen = Gen.sequence[Seq[(String, List[(Long, Boolean)])], (String, List[(Long, Boolean)])](
      Seq("a", "b", "c").map(k => keyGen.map(k -> _)))
    samples(tableGen, 10).foreach { table =>
      val df = table.flatMap { case (k, rows) =>
        rows.map { case (s, y) => (k, s, y) }
      }.toDF("k", "s", "y")
      val got = Eval.aucByKey(df, "k", "s", "y").collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
      table.foreach { case (k, rows) =>
        val pos = rows.filter(_._2).map(_._1)
        val neg = rows.filterNot(_._2).map(_._1)
        // brute force: every (pos, neg) pair scores 2 (win), 1 (tie), 0
        val u2 = (for (p <- pos; q <- neg)
          yield if (p > q) 2L else if (p == q) 1L else 0L).sum
        val auc =
          if (pos.nonEmpty && neg.nonEmpty)
            Some(u2.toDouble / (2.0 * pos.size * neg.size))
          else None
        assert(got(k) === ((pos.size.toLong, neg.size.toLong, u2, auc)),
          s"key $k: pos=$pos neg=$neg")
      }
    }
  }

  test("aucByKey: a key with no negatives (or positives) emits NULL auc, never NaN or 0") {
    import SparkTestBase.spark.implicits._
    val df = Seq(("only_pos", 1L, true), ("only_pos", 2L, true),
      ("mixed", 1L, true), ("mixed", 0L, false)).toDF("k", "s", "y")
    val rows = Eval.aucByKey(df, "k", "s", "y").collect()
      .map(r => r.getString(0) -> r.isNullAt(4)).toMap
    assert(rows("only_pos") === true)
    assert(rows("mixed") === false)
  }

  test("aucByKey: NULL scores are excluded — counts and u2 see scored rows only") {
    import SparkTestBase.spark.implicits._
    // engines disagree on where a NULL sorts (Spark ranges NULLS FIRST,
    // SQL windows default NULLS LAST), so the operator's contract is to
    // drop them up front; the result must equal the pre-filtered input's
    val df = Seq(("k", Some(2L), true), ("k", None, true),
      ("k", Some(1L), false), ("k", None, false), ("k", Some(2L), false))
      .toDF("k", "s", "y")
    val got = Eval.aucByKey(df, "k", "s", "y").collect().head
    assert((got.getLong(1), got.getLong(2)) === ((1L, 2L)),
      "null-scored rows must not count as positives/negatives")
    val filtered = Eval.aucByKey(df.filter(col("s").isNotNull),
      "k", "s", "y").collect().head
    assert(got.toSeq === filtered.toSeq)
  }

  test("scoreProfileByKey: a NULL key is a key — profiled, not a crash") {
    import SparkTestBase.spark.implicits._
    // the generic high-cardinality axis (per-domain) makes null keys
    // plausible; the output ordering is null-safe (round 16)
    val df = Seq((Some("a"), 3.0, 1L), (Some("a"), 1.0, 2L),
      (None, 5.0, 3L), (None, 7.0, 4L)).toDF("k", "s", "id")
    val got = Eval.scoreProfileByKey(df, "k", "s", "id", Seq(0.0, 1.0))
      .collect()
      .map(r => (Option(r.getString(0)), r.getDouble(1)) -> r.getDouble(3))
      .toMap
    assert(got((Some("a"), 0.0)) === 1.0 && got((Some("a"), 1.0)) === 3.0)
    assert(got((None, 0.0)) === 5.0 && got((None, 1.0)) === 7.0)
  }

  test("calibrationBins: bin ids stay exact beyond 2^53 (long div, not IEEE)") {
    import SparkTestBase.spark.implicits._
    // an IEEE double division would silently round these bin ids; the
    // long `div` path must agree with Math.floorDiv at any magnitude
    val w = 4000L
    val scores = Seq((1L << 60) + 1234L, (1L << 60) + 1235L,
      -(1L << 60) - 77L, (1L << 61) + 3L)
    val df = scores.map(s => ("k", s, true)).toDF("k", "s", "y")
    val got = Eval.calibrationBins(df, "k", "s", "y", w).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    val expect = scores.groupBy(Math.floorDiv(_, w))
      .map { case (b, rs) => b -> rs.size.toLong }
    assert(got === expect)
  }

  test("property: calibrationBins == floor-division brute force, negative scores included") {
    import SparkTestBase.spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(-9000L, 9000L),
        Gen.oneOf(true, false)))
      w <- Gen.oneOf(1L, 7L, 4000L)
    } yield (rows, w)
    samples(gen, 10).foreach { case (rows, w) =>
      val df = rows.map { case (s, y) => ("k", s, y) }.toDF("k", "s", "y")
      val got = Eval.calibrationBins(df, "k", "s", "y", w).collect()
        .map(r => r.getLong(1) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
        .toMap
      val expect = rows.groupBy { case (s, _) => Math.floorDiv(s, w) }
        .map { case (bin, rs) =>
          val n = rs.size.toLong
          val np = rs.count(_._2).toLong
          bin -> ((Math.multiplyExact(bin, w), n, np, np.toDouble / n))
        }
      assert(got === expect, s"width $w rows $rows")
    }
  }

  test("scoreProfileByKey at source cardinality == brute-force type-1 quantiles per key") {
    // the high-cardinality regime the multi-key selection exists for:
    // every source's profile from ONE two-pass selection, equal to the
    // per-key sorted-sequence definition
    val docs = Tables.documents(spark, sfDir)
    val scored = docs.select(col("source"),
      col("n_chars").cast("double").as("sc"), col("doc_id"))
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    val got = Eval.scoreProfileByKey(scored, "source", "sc", "doc_id", qs)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val byKey = docs.select(col("source"), col("n_chars"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(byKey.size >= 10, "need real key cardinality beyond the gate enum")
    assert(got.size === byKey.size * qs.size)
    byKey.foreach { case (src, rows) =>
      val sorted = rows.map(t => (t._2.toDouble, t._3)).sorted.map(_._1)
      qs.foreach { q =>
        val rank = math.max(1L, math.ceil(q * sorted.length).toLong).toInt
        assert(got((src, q)) === ((sorted.length.toLong, sorted(rank - 1))),
          s"source $src q=$q")
      }
    }
  }

  test("nbMargins: margin == score − best other; positive margin ⟺ unique argmax; top-tie margins 0") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val model = Classifier.nbTrain(docs)
    val scores = Classifier.nbScores(docs, model)
    val margins = Classifier.nbMargins(scores).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val byDoc = scores.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
      .groupBy(_._1)
    assert(byDoc.nonEmpty && margins.size === byDoc.valuesIterator.map(_.length).sum)
    byDoc.foreach { case (doc, rows) =>
      rows.foreach { case (_, label, s) =>
        val others = rows.filter(_._2 != label).map(_._3)
        assert(margins((doc, label)) === s - others.max, s"doc $doc $label")
      }
      // exactly the argmax winner (unique top) has margin > 0
      val top = rows.map(_._3).max
      val winners = rows.filter(_._3 == top)
      if (winners.length == 1)
        assert(margins((doc, winners.head._2)) > 0)
      else winners.foreach { case (_, l, _) =>
        assert(margins((doc, l)) === 0L, s"top tie at doc $doc")
      }
    }
    // and the classifier's predicted label never has a negative margin
    val preds = Classifier.nbClassify(docs, model).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    preds.foreach { case (doc, pred) =>
      assert(margins((doc, pred)) >= 0L)
    }
  }
}
