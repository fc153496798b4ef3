package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query returns a deterministically ORDER BY-ed result whose
  * fractional columns are derived from exact integer partials (SURVEY §7
  * oracle-parity discipline), so the DuckDB comparison is bit-exact.
  *
  * The registry itself lives in per-family objects under
  * [[graft.registry]] (split in round 11 for maintainability); this
  * object merges them and guards against a silent key collision — `++`
  * would otherwise let one family's entry shadow another's.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("gold_daily_summary")(spark, "/root/testdata/sf0.001")

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val merged = registry.WarehouseRegistry.queries ++
      registry.DedupRegistry.queries ++
      registry.SimilarityRegistry.queries ++
      registry.TextRegistry.queries ++
      registry.CorpusRegistry.queries ++
      registry.StreamRegistry.queries ++
      registry.ScaleStatsRegistry.queries
    require(merged.size == registry.WarehouseRegistry.queries.size + registry.DedupRegistry.queries.size + registry.SimilarityRegistry.queries.size + registry.TextRegistry.queries.size + registry.CorpusRegistry.queries.size + registry.StreamRegistry.queries.size + registry.ScaleStatsRegistry.queries.size,
      "duplicate query key across family registries — one entry is shadowing another")
    merged
  }

  lazy val oracleSql: Map[String, String] = {
    val merged = registry.WarehouseRegistry.oracleSql ++
      registry.DedupRegistry.oracleSql ++
      registry.SimilarityRegistry.oracleSql ++
      registry.TextRegistry.oracleSql ++
      registry.CorpusRegistry.oracleSql ++
      registry.StreamRegistry.oracleSql ++
      registry.ScaleStatsRegistry.oracleSql
    require(merged.size == registry.WarehouseRegistry.oracleSql.size + registry.DedupRegistry.oracleSql.size + registry.SimilarityRegistry.oracleSql.size + registry.TextRegistry.oracleSql.size + registry.CorpusRegistry.oracleSql.size + registry.StreamRegistry.oracleSql.size + registry.ScaleStatsRegistry.oracleSql.size,
      "duplicate oracle key across family registries — one entry is shadowing another")
    merged
  }
}
