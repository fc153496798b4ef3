package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: dump `SparkEntry.oracleSql` as oracle_sql.json WITHOUT
  * re-running the 215-query Spark dump — the oracle map is pure data,
  * and iterating on oracle SQL (e.g. the round-16 `AS MATERIALIZED`
  * evaluation hints) only needs the JSON re-emitted so an existing
  * parquet dump can be re-compared.
  *
  * Usage: runMain graft.tools.OracleDump <outDir>
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    new java.io.File(outDir).mkdirs()
    // same escaping rules as graft.Verify: backslash, quote, and ALL
    // control chars — a tab/CR in builder SQL must not break json.load
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[oracle-dump] ${graft.SparkEntry.oracleSql.size} oracles -> $outDir/oracle_sql.json")
  }
}
