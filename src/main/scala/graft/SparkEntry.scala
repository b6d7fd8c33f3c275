package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Oracles, Q, Registry}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 is a named entry in [[queries]]; each
  * SQL-expressible one carries a DuckDB oracle twin in [[oracleSql]] with
  * identical column names and deterministic row order (the reference's
  * cross-engine differential-testing methodology, README.md:373-397).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_by_type")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * [[graft.queries.Oracles.materialize]] hardens every twin against
    * DuckDB's inline-per-reference CTE planning (the q274 exponential
    * class that zeroed CORRECTNESS_r07 — r7 verdict item #1). */
  def oracleSql: Map[String, String] =
    Registry.all.collect {
      case Q(n, _, Some(sql)) => n -> Oracles.materialize(sql.trim)
    }.toMap
}
