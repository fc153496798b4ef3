package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.KeyFunctions

/** ScalaCheck-generator-driven properties for the algebraic invariants
  * (SURVEY §5.3): key determinism/parity, upsert idempotency,
  * incremental-equals-full. Samples are drawn from seeded generators so
  * runs are reproducible.
  */
class PropertiesSpec extends AnyFunSuite {
  import SparkTestBase._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private def reference(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseUnsignedLong(hex.substring(0, 16), 16)
  }

  test("property: signed md5 key matches the Postgres bit(64) semantics for arbitrary strings") {
    val strs = samples(Gen.asciiPrintableStr, 200)
    assert(strs.nonEmpty)
    strs.foreach { s =>
      assert(KeyFunctions.signedMd5Long(UTF8String.fromString(s)) === reference(s))
    }
    // the sample set must exercise the signed-overflow path
    assert(strs.exists(reference(_) < 0))
  }

  test("property: synthetic geocode is deterministic and in range for arbitrary keys") {
    samples(Gen.choose(0L, Long.MaxValue / 2654435761L), 200).foreach { k =>
      val g = graft.enrich.Enrich.syntheticGeoCode(k)
      assert(g === graft.enrich.Enrich.syntheticGeoCode(k))
      assert(g >= 0 && g < 97)
    }
  }

  test("property: incremental split at arbitrary day boundaries equals the full set") {
    val full = Tables.events(spark, sfDir).cache()
    val n = full.count()
    samples(Gen.choose(1, 29), 5).foreach { day =>
      val w = f"2024-01-$day%02d 00:00:00"
      val newer = graft.bronze.Bronze.newSince(full, "ts", w)
      val older = full.filter(col("ts") <= to_timestamp(lit(w)))
      assert(newer.count() + older.count() === n, s"split at $w")
    }
    full.unpersist()
  }

  test("property: upsert after upsert inserts nothing, for arbitrary key subsets") {
    val users = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().cache()
    samples(Gen.choose(0L, 15L), 5).foreach { cut =>
      val existing = users.filter(col("user_id") < cut)
      val inserted = graft.enrich.Enrich.insertIfAbsent(users, existing, Seq("user_id"))
      val merged = existing.union(inserted)
      assert(graft.enrich.Enrich.insertIfAbsent(users, merged, Seq("user_id")).count() === 0,
        s"cut at $cut")
    }
    users.unpersist()
  }

  test("property: MERGE is idempotent — re-applying the same batch changes nothing") {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal")).cache()
    samples(Gen.choose(2L, 9L), 3).foreach { m =>
      val updates = cust.filter(col("c_custkey") % m === 0)
        .withColumn("c_acctbal", col("c_acctbal") * 2)
      val once = graft.operators.Merge.upsert(cust, updates, Seq("c_custkey"))
      val twice = graft.operators.Merge.upsert(once, updates, Seq("c_custkey"))
      assert(twice.exceptAll(once).count() === 0, s"mod $m")
      assert(once.exceptAll(twice).count() === 0, s"mod $m")
    }
    cust.unpersist()
  }

  test("property: gap-filled series tiles keys x ticks exactly and conserves observations") {
    import spark.implicits._
    samples(Gen.choose(2L, 9L), 3).foreach { step =>
      val raw = Seq((1L, 0L, 5L), (1L, step, 6L), (2L, step * 3, 7L))
        .toDF("k", "t", "v")
      val keys = Seq(1L, 2L).toDF("k")
      val bounds = Seq((0L, step * 4)).toDF("lo", "hi")
      val out = graft.operators.TimeSeries
        .gapFillLocf(raw, keys, bounds, "k", "t", "v", step).cache()
      assert(out.count() === 2 * 5, s"step $step: 2 keys x 5 ticks")
      assert(out.agg(sum("n_obs")).head().getLong(0) === 3L,
        s"step $step: every observation lands on exactly one tick")
      out.unpersist()
    }
  }

  test("property: two-phase prefix sum equals the sequential scan for arbitrary data") {
    import spark.implicits._
    val cases = samples(for {
      n <- Gen.choose(1, 400)
      parts <- Gen.choose(1, 40)
      vals <- Gen.listOfN(n, Gen.choose(-1000, 1000))
    } yield (parts, vals), 12)
    assert(cases.nonEmpty)
    cases.foreach { case (parts, vals) =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val expected = vals.scanLeft(0L)(_ + _).dropRight(1)
      val got = graft.operators.ScaleOps
        .withPrefixSum(df, "id", "v", "ps", numPartitions = parts)
        .orderBy("id").select("ps").collect().map(_.getLong(0)).toSeq
      assert(got === expected, s"n=${vals.size} parts=$parts")
    }
  }

  test("property: chunks reassemble to the original document for arbitrary widths") {
    val docs = Tables.documents(spark, sfDir).limit(20).cache()
    samples(Gen.chooseNum(2, 60).flatMap(w =>
      Gen.chooseNum(0, w - 1).map(o => (w, o))), 4).foreach { case (w, o) =>
      val stride = w - o
      val rebuilt = graft.ext.Corpus.chunk(docs, w, o)
        .orderBy("doc_id", "chunk_id")
        .collect()
        .groupBy(_.getLong(0))
        .map { case (id, rows) =>
          // drop each chunk's overlap tail except the final chunk's
          val toks = rows.map(_.getString(3).split(" ", -1))
          id -> (toks.dropRight(1).map(_.take(stride)) :+ toks.last)
            .flatten.mkString(" ")
        }
      val original = docs.select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rebuilt === original, s"width $w overlap $o")
    }
    docs.unpersist()
  }

  test("property: sketch merges equal single-pass builds for arbitrary stream splits") {
    // the accumulable-state law all three deterministic sketches claim:
    // build(A) ⊕ build(B) == build(A∪B), for ARBITRARY (even empty or
    // heavily skewed) splits of the stream — not just the doc-parity
    // split the oracle queries use.
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).limit(120).cache()
    val tokens = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("t")).cache()
    val single = graft.ext.Sketches
      .countMinBuild(tokens.select(col("t")), "t", depth = 2, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val kmvSingle = graft.ext.Sketches.kmvBuild(tokens.select(col("t")), "t", k = 32)
      .collect().map(_.getLong(1)).toSeq
    val bloomSingle = graft.ext.Sketches
      .bloomBuild(tokens.select(col("t")), "t", numBits = 512, numHashes = 2)
      .collect().map(_.getLong(0)).toSet
    samples(Gen.choose(2, 7), 4).foreach { m =>
      val parts = (0 until m).map(i => tokens.filter(col("doc_id") % m === i)
        .select(col("t")))
      val cms = graft.ext.Sketches.countMinMerge(
          parts.map(p => graft.ext.Sketches.countMinBuild(p, "t",
            depth = 2, width = 64)): _*)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(cms === single, s"CMS merge diverged at split m=$m")
      val kmv = graft.ext.Sketches.kmvMerge(32,
          parts.map(p => graft.ext.Sketches.kmvBuild(p, "t", k = 32)): _*)
        .collect().map(_.getLong(1)).toSeq
      assert(kmv === kmvSingle, s"KMV merge diverged at split m=$m")
      val bloom = graft.ext.Sketches.bloomMerge(
          parts.map(p => graft.ext.Sketches.bloomBuild(p, "t",
            numBits = 512, numHashes = 2)): _*)
        .collect().map(_.getLong(0)).toSet
      assert(bloom === bloomSingle, s"Bloom merge diverged at split m=$m")
    }
    tokens.unpersist(); docs.unpersist()
  }

  test("property: Bloom has no false negatives for arbitrary item sets and sizes") {
    import spark.implicits._
    val gens = for {
      nBits <- Gen.oneOf(64, 512, 4096)
      nHash <- Gen.choose(1, 5)
    } yield (nBits, nHash)
    val strs = samples(Gen.nonEmptyListOf(Gen.asciiPrintableStr), 3)
    samples(gens, 3).zip(strs).foreach { case ((nBits, nHash), items) =>
      val df = items.toDF("t")
      val bloom = graft.ext.Sketches.bloomBuild(df, "t", nBits, nHash)
      val verdicts = graft.ext.Sketches
        .bloomMightContain(bloom, df.distinct(), "t", nBits, nHash)
      assert(verdicts.filter(!col("might_contain")).count() === 0L,
        s"false negative at numBits=$nBits numHashes=$nHash")
      // and the packed-bitmap gate agrees exactly
      val gated = df.distinct().filter(
        graft.ext.Sketches.bloomGateColumn(bloom, col("t"), nBits, nHash))
      assert(gated.count() === df.distinct().count())
    }
  }

  test("property: subtractCounts == rebuild-on-survivors for arbitrary corpora and cohorts") {
    import spark.implicits._
    import graft.ext.Classifier
    val docGen = for {
      n <- Gen.choose(3, 20)
      rows <- Gen.listOfN(n, for {
        toks <- Gen.nonEmptyListOf(Gen.oneOf("a", "b", "cc", "dd", "e"))
        lang <- Gen.oneOf("en", "es", "zh")
      } yield (toks.mkString(" "), lang))
    } yield rows.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) }
    samples(docGen, 12).foreach { rows =>
      val docs = rows.toDF("doc_id", "text", "lang")
      val removed = docs.filter(col("doc_id") % 3 === 0)
      val survivors = docs.filter(col("doc_id") % 3 =!= 0)
      def m(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      val sub = Classifier.nbCountsSubtract(
        Classifier.nbCountsBuild(docs, buckets = 16),
        Classifier.nbCountsBuild(removed, buckets = 16))
      assert(m(sub) === m(Classifier.nbCountsBuild(survivors, buckets = 16)),
        s"subtract != rebuild for corpus $rows")
    }
  }

  test("property: per-key KMV merge == grouped build over the union, and is idempotent") {
    import spark.implicits._
    import graft.ext.Sketches
    val gen = for {
      n <- Gen.choose(4, 30)
      rows <- Gen.listOfN(n, for {
        key <- Gen.oneOf("s0", "s1", "s2")
        item <- Gen.choose(0, 40).map("item" + _)
      } yield (key, item))
    } yield rows
    samples(gen, 12).foreach { rows =>
      val df = rows.toDF("key", "item")
      val a = df.filter(col("item") < "item2")
      val b = df.filter(col("item") >= "item2")
      def m(s: org.apache.spark.sql.DataFrame) =
        s.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      val whole = Sketches.kmvBuildBy(df, "key", "item", k = 8)
      val merged = Sketches.kmvMergeBy(8,
        Sketches.kmvBuildBy(a, "key", "item", k = 8),
        Sketches.kmvBuildBy(b, "key", "item", k = 8))
      assert(m(merged.select(col("key"), col("rank"), col("h")))
        === m(whole.select(col("key"), col("rank"), col("h"))),
        s"merge != build-on-union for $rows")
      val again = Sketches.kmvMergeBy(8, merged, whole)
      assert(m(again.select(col("key"), col("rank"), col("h")))
        === m(whole.select(col("key"), col("rank"), col("h"))),
        "KMV merge must be idempotent")
    }
  }

  test("property: maximal spans == brute-force cover-run reference; removal drops exactly the qualifying positions") {
    import spark.implicits._
    import graft.ext.Dedup
    val w = 3; val minLen = 5
    // small vocabulary so cross-doc duplicated windows actually occur
    val docGen = Gen.chooseNum(0, 24).flatMap(len =>
      Gen.listOfN(len, Gen.chooseNum(0, 9).map(i => s"t$i")))
    val corpusGen = Gen.chooseNum(5, 8).flatMap(n =>
      Gen.listOfN(n, docGen)).map(_.zipWithIndex.map {
        case (toks, i) => (i.toLong, toks.mkString(" ")) })

    def windows(docs: Seq[(Long, String)]) = docs.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      if (t.length < w) Nil
      else t.sliding(w).zipWithIndex
        .map { case (win, i) => (id, i + 1, win.mkString(" ")) }.toSeq
    }
    def runsOf(cover: Set[Int]): Seq[(Int, Int)] =
      cover.toSeq.sorted.foldLeft(List.empty[(Int, Int)]) {
        case ((s0, e0) :: rest, q) if q == e0 + 1 => (s0, q) :: rest
        case (acc, q) => (q, q) :: acc
      }.reverse.filter { case (a, b) => b - a + 1 >= minLen }

    samples(corpusGen, 8).foreach { docs =>
      val win = windows(docs)
      val dup = win.groupBy(_._3)
        .filter(_._2.map(_._1).distinct.size >= 2).keySet
      // detection reference: ANY duplicated occurrence covers
      val expectSpans = docs.flatMap { case (id, _) =>
        val cover = win.filter(x => x._1 == id && dup(x._3))
          .flatMap(x => x._2 until (x._2 + w)).toSet
        runsOf(cover).map { case (a, b) =>
          (id, a.toLong, b.toLong, (b - a + 1).toLong) }
      }.toSet
      val gotSpans = Dedup.maximalRepeatedSpans(
          docs.toDF("doc_id", "text"), w, minDocs = 2, minLen)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(gotSpans === expectSpans, s"spans mismatch for $docs")
      // removal reference: only NON-CANONICAL (min doc_id per window
      // text keeps it) covered runs >= minLen are cut
      val canon = win.groupBy(_._3).view.mapValues(_.map(_._1).min).toMap
      val expectClean = docs.map { case (id, text) =>
        val t = text.split(" ", -1)
        val cover = win.filter(x =>
            x._1 == id && dup(x._3) && canon(x._3) != id)
          .flatMap(x => x._2 until (x._2 + w)).toSet
        val cut = runsOf(cover)
          .flatMap { case (a, b) => a to b }.toSet
        (id, t.length.toLong, cut.size.toLong,
          t.zipWithIndex.collect {
            case (tok, i) if !cut(i + 1) => tok }.mkString(" "))
      }.toSet
      val gotClean = Dedup.removeMaximalSpans(
          docs.toDF("doc_id", "text"), w, minDocs = 2, minLen)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(gotClean === expectClean, s"removal mismatch for $docs")
    }
  }

  test("property: overlap matrix == brute-force joint counts; diagonal == rollup n_fail; n_both <= min marginal") {
    import spark.implicits._
    import org.scalacheck.Gen
    val gates = graft.ext.Admission.GateOrder
      .filterNot(_ == graft.ext.Admission.DecisionGate)
    // arbitrary verdict tables: each doc fails an arbitrary gate subset
    val verdictGen = for {
      nDocs <- Gen.choose(3, 12)
      fails <- Gen.listOfN(nDocs, Gen.someOf(gates))
    } yield fails.zipWithIndex.map { case (f, i) => (i.toLong, f.toSet) }
    samples(verdictGen, 8).foreach { verdicts =>
      val rep = verdicts.flatMap { case (id, fails) =>
        graft.ext.Admission.GateOrder.map(g => (id, g,
          if (g == graft.ext.Admission.DecisionGate) fails.isEmpty
          else !fails(g),
          Option.empty[Double]))
      }.toDF("doc_id", "gate", "pass", "score")
      val matrix = graft.ext.Admission.gateOverlapMatrix(rep).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val rollup = graft.ext.Admission.gateOverlap(rep).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      for (a <- gates; b <- gates if a <= b) {
        val brute = verdicts.count { case (_, f) => f(a) && f(b) }.toLong
        assert(matrix((a, b)) === brute,
          s"joint count ($a,$b) mismatch for $verdicts")
        assert(matrix((a, b)) <= math.min(rollup(a), rollup(b)),
          "a joint failure count cannot exceed either marginal")
      }
      gates.foreach(g => assert(matrix((g, g)) === rollup(g),
        "the diagonal must subsume the rollup's n_fail"))
    }
  }

  test("property: gateScoreProfile == brute-force type-1 quantiles for arbitrary score multisets") {
    import SparkTestBase.spark.implicits._
    // arbitrary decision-table score columns: small value pools force
    // heavy ties, sizes range down to a single score, and eighths keep
    // ceil(q·n) exact in both engines (the operator's contract)
    val qPool = (0 to 8).map(_ / 8.0)
    val tableGen = for {
      gateScores <- Gen.sequence[Seq[(String, List[Double])], (String, List[Double])](
        Seq("2_quality", "5_lm", "6_nb").map(g =>
          Gen.choose(1, 20).flatMap(n =>
            Gen.listOfN(n, Gen.oneOf(-3.5, -3.4, 0.0, 0.25, 1.0, 7.0))
              .map(g -> _))))
      qs <- Gen.someOf(qPool).map(_.toList).suchThat(_.nonEmpty)
    } yield (gateScores, qs)
    samples(tableGen, 10).foreach { case (gateScores, qs) =>
      val rep = gateScores.flatMap { case (g, vs) =>
        vs.zipWithIndex.map { case (v, i) =>
          (i.toLong, g, true, Option(v))
        }
      }.toDF("doc_id", "gate", "pass", "score")
      val got = graft.ext.Admission.gateScoreProfile(rep, qs).collect()
        .map(r => (r.getString(0), r.getDouble(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      gateScores.foreach { case (g, vs) =>
        val sorted = vs.sorted.toIndexedSeq
        qs.foreach { q =>
          val rank = math.max(1L, math.ceil(q * sorted.length).toLong).toInt
          assert(got((g, q)) === ((sorted.length.toLong, sorted(rank - 1))),
            s"profile mismatch at ($g, $q) for $vs")
        }
      }
      // output is exactly gates × qs — nothing extra, nothing missing
      assert(got.size === gateScores.size * qs.size)
    }
  }
}
