package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse merge semantics over immutable files — the two standard
  * dimension-maintenance operators a Postgres reference gets from
  * `INSERT … ON CONFLICT UPDATE` and trigger-maintained history tables,
  * restated as pure DataFrame programs:
  *
  *  - [[upsert]]: SCD-1 MERGE (update-or-insert) — one full-outer
  *    key join; ANSI multiplicity semantics (every matched target row
  *    is updated, so duplicate-key targets keep their row count).
  *  - [[scd2]]: SCD-2 version history (valid_from/valid_to/is_current)
  *    built from a change feed — two passes over the SAME per-key window
  *    partitioning (one Exchange: the collapse filter and the validity
  *    lead reuse the key shuffle).
  *
  * Scale: both shuffle once on the dimension key. The rewritten dim is
  * then persisted by stage-then-promote ([[graft.plans.Pipeline]]); at
  * 100 TB the update batch is typically ≪ the dim, and the union form
  * still reads each side once — there is no cheaper shape without a
  * transactional table format maintaining per-file row versions.
  */
object Merge {

  /** SCD-1 MERGE: update-values replace same-key target rows (EVERY
    * matched row — a duplicate-key target keeps its multiplicity, as in
    * ANSI MERGE); unmatched update rows are inserts; unmatched target
    * rows survive. `updates` must be key-unique (the ANSI precondition —
    * a multi-match MERGE is an error in SQL too); `target` and `updates`
    * must share the schema. A `_m` match marker (not COALESCE) decides
    * replacement, so an update carrying an intentional NULL still wins.
    *
    * The precondition is ENFORCED by default (ANSI MERGE raises on a
    * multi-match; silently multiplying matched target rows is data
    * corruption, not a merge): one partial-aggregated pass over the
    * update batch — the small side of any sane merge — before the join.
    * Callers whose batch is already uniqueness-proven (e.g. the output
    * of a keyed aggregation) pass `requireUniqueUpdates = false` to skip
    * the pass.
    *
    * NOTE: with the default guard on, this method is EAGER — the probe
    * runs a Spark action at call time, and the `updates` lineage is
    * evaluated twice (probe, then join). A heavy uncached update batch
    * should be persisted (or checkpointed) by the caller before the
    * call, or pass `requireUniqueUpdates = false`; persisting inside
    * this method would leak the cache past the (lazy) returned plan's
    * lifetime, so the trade is left to the caller.
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String],
             requireUniqueUpdates: Boolean = true): DataFrame = {
    if (requireUniqueUpdates) {
      // limit(1): existence probe, not a full duplicate census.
      val dup = updates.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("_n")).filter(col("_n") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"Merge.upsert: duplicate key in the update batch (ANSI MERGE " +
          s"multi-match): ${keys.zipWithIndex.map { case (k, i) => s"$k=${dup.head.get(i)}" }.mkString(", ")}")
    }
    val nonKeys = target.columns.filterNot(keys.contains).toSeq
    val u = updates.select(
      keys.map(col) ++ nonKeys.map(c => col(c).as(s"_u_$c")) :+
        lit(true).as("_m"): _*)
    target.join(u, keys, "full_outer")
      .select(keys.map(col) ++ nonKeys.map(c =>
        when(col("_m").isNotNull, col(s"_u_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** SCD-2 from a change feed (key, ts, attribute, tie-break id):
    * consecutive rows with an UNCHANGED attribute open no new version;
    * each surviving row becomes a version valid from its own ts until the
    * next version's ts (null = current). `tieCol` makes same-timestamp
    * changes deterministic — required for reproducible history.
    */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
           attrCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .withColumn("_rn", row_number().over(w))
      // null-safe change detection: a run of NULL attributes is ONE
      // version (NULL <=> NULL holds), and only the key's first row is
      // unconditionally a version — `_prev IS NULL` would misread both.
      .filter(col("_rn") === 1 || !(col("_prev") <=> col(attrCol)))
      .drop("_rn")
      .select(col(keyCol), col(attrCol), col(tieCol),
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(
          Window.partitionBy(col(keyCol))
            .orderBy(col(tsCol), col(tieCol))).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
