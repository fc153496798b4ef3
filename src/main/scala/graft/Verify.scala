package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional dev filter: comma-separated exact names — iterate on new
    // queries without paying the full 84-query dump. The driver passes
    // two args, so its runs always dump everything.
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    // default to the machine's cores (round 16): the correctness dump is
    // plain throughput work, and a harness run that doesn't set
    // SPARK_GRAFT_CPUS should not crawl at local[4] on a 32-core box —
    // the r15 driver gate came back empty, most plausibly a timeout.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Per-query wall-time on stderr (round 16): the r15 driver
    // correctness file came back empty despite a passing tree — most
    // plausibly a harness timeout — and the dump itself carried no
    // timing evidence to diagnose which queries ate the budget. Every
    // query now logs its own wall seconds as it lands, and the run
    // closes with a total plus the slowest-10 table, so the NEXT empty
    // driver file is diagnosable from the verify log alone.
    val t0all = System.nanoTime()
    val timings = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    // Per-query state release (round 16, the Bench.release discipline):
    // 215 queries in one JVM accumulate cached RDDs and localCheckpoint
    // blocks (detachAndClean checkpoints every bounded result; the
    // async ContextCleaner drains them on ITS schedule, not ours) —
    // without an explicit drop the tail queries run under mounting
    // allocation pressure. Blocking unpersist so the drop lands before
    // the next query starts, exactly as in Bench.
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          val dt = (System.nanoTime() - t0) / 1e9
          timings += name -> dt
          System.err.println(f"[verify] $name ok in $dt%.1f s")
        } catch { case e: Throwable =>
          System.err.println(f"[verify] $name failed after ${(System.nanoTime() - t0) / 1e9}%.1f s: ${e.getMessage}")
        } finally release()
      }
    System.err.println(f"[verify] dump total ${(System.nanoTime() - t0all) / 1e9}%.1f s over ${timings.size} queries; slowest:")
    timings.sortBy(-_._2).take(10).foreach { case (n, dt) =>
      System.err.println(f"[verify]   $n%-42s $dt%7.1f s")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
