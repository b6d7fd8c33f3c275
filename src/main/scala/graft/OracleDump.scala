package graft

import java.nio.file.{Files, Paths}

/** Dump `SparkEntry.oracleSql` as JSON WITHOUT running any query — feeds
  * `tools/cte_audit.py`, the static screen that flags multiply-referenced
  * non-MATERIALIZED CTEs in oracle twins (the q274 class: DuckDB 1.0.0
  * inlines every CTE reference, so a peel chain referencing its
  * predecessor twice doubles the plan per step and one such twin can hang
  * the driver's whole-round compare — r7 verdict item #1). */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/oracle_sql.json"
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
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${SparkEntry.oracleSql.size} oracle twins to $out")
  }
}
