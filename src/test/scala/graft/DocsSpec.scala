package graft

import org.scalatest.funsuite.AnyFunSuite

/** Documentation cross-reference gate (VERDICT r11 item 6): the living
  * coverage doc names oracle queries per operator; a renamed or retired
  * query must not leave a dangling reference behind. Symbol/file anchors
  * in COVERAGE.md are names, not line numbers, precisely so they survive
  * edits — this spec closes the remaining drift channel (query names).
  */
class DocsSpec extends AnyFunSuite {

  // prose tokens that look like query names but deliberately are not:
  // staged table names, name-prefix wildcards, the ladder tool, and the
  // one retired rows-only entry (kept in the doc as history).
  private val allowed = Set(
    "corpus_flags", "corpus_release", // corpus-release OUTPUT tables
    "dedup_state_", "silver_dim_",    // prefix wildcards in prose
    "scale_ladder",                   // tools/scale_ladder.py
    "stats_sketches",                 // retired in round 10 (documented)
    // retired in round 16 — folded into corpus_admission_retrain_lifecycle
    // (kept in the doc as history)
    "corpus_admission_score_drift", "corpus_admission_retrain_calibration"
  )

  test("every query name cited in COVERAGE.md resolves to a registered query") {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")),
      "UTF-8")
    val pat = ("\\b(?:bronze|silver|gold|stream|dedup|sim|corpus|stats|" +
      "scale|text|multimodal|enrich)_[a-z0-9_]+\\b").r
    val cited = pat.findAllIn(text).toSet -- allowed
    val known = SparkEntry.queries.keySet
    val dangling = cited -- known
    assert(dangling.isEmpty,
      s"COVERAGE.md cites queries that are not registered: " +
        s"${dangling.toSeq.sorted.mkString(", ")} — rename the doc " +
        "reference or add it to the allowlist with a reason")
  }

  test("every registered query has an oracle (the 100%-checkable surface)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without oracles: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
