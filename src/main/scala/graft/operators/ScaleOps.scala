package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-robustness operators: skew salting and bucketed co-location.
  * These address the two shuffle pathologies a 100 TB run hits that the
  * small-SF correctness gate cannot show:
  *
  *  - **Skew**: one hot key (a boilerplate document shingle, a null-ish
  *    default station) concentrates a shuffle partition. AQE's skew-join
  *    splitting handles moderate skew at runtime; `saltedJoin` is the
  *    explicit fix for extreme single-key skew, replicating the build
  *    side `salt` times so the hot key spreads over `salt` reducers.
  *  - **Repeated fact joins**: lineitem⋈orders on the order key is the
  *    one big-big join in the engine. `writeBucketed`/`readTable` persist
  *    both sides bucketed on the join key so EVERY subsequent join or
  *    aggregation on that key runs shuffle-free (verified by plan
  *    inspection in ScaleOpsSpec).
  */
object ScaleOps {

  /** Salted inner/left equi-join: the probe side gets a deterministic
    * salt from a hash of the whole row; the build side is replicated
    * `salt` times. Semantically identical to `big.join(small, keys, how)`
    * for any salt ≥ 1.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int, how: String = "inner"): DataFrame = {
    require(salt >= 1)
    // right/full outer would surface each unmatched REPLICATED small row
    // `salt` times — only probe-side-preserving joins are salt-safe.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(how.toLowerCase),
      s"saltedJoin supports probe-side-preserving joins only, got: $how")
    val salted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salt)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, keys :+ "_salt", how).drop("_salt")
  }

  /** Persist a DataFrame bucketed (and sorted) by the join key into the
    * session catalog — the warehouse layout that removes the shuffle from
    * every later equi-join/aggregation on `keys`.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int): Unit = {
    // a simple identifier only: anything with '/', '..', etc. could
    // resolve outside the warehouse root below.
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"table must be a simple identifier: $table")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // an orphaned location (e.g. from a previous JVM whose in-memory
    // catalog is gone) blocks CREATE TABLE — clear it. Resolved through
    // the Hadoop FileSystem API so hdfs:// and object-store warehouse
    // URIs work identically to file://.
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(warehouse, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
