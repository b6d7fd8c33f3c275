package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-pass pipeline observability — the EXPLAIN-ANALYZE-for-ETL surface
  * the reference gets from engine introspection (reference README.md:415
  * "EXPLAIN / EXPLAIN ANALYZE diffs"; ClickHouse exposes the same
  * counters via system.query_log): audit counters piggybacked on the
  * job's OWN pass via Catalyst's CollectMetrics node
  * (`df.observe`). At 100 TB an audit that re-scans the input doubles the
  * job; observed metrics ride the existing scan for free — executors
  * accumulate per-task, the driver merges, nothing is re-read.
  */
object Audit {
  /** Attach the standard ingest audit (row count, null-key count, exact
    * integer-cents value total) to `df`. Metrics become available on the
    * returned [[Observation]] after the FIRST action on the returned
    * frame completes; they are computed by the same tasks that execute
    * the action, never by a second pass. */
  def observed(df: DataFrame, keyCol: String, valueCol: String)
      : (DataFrame, Observation) = {
    val obs = Observation()
    val audited = df.observe(
      obs,
      count(lit(1)).as("n_rows"),
      sum(when(col(keyCol).isNull, lit(1L)).otherwise(lit(0L)))
        .as("n_null_keys"),
      sum(graft.queries.Det.cents(col(valueCol))).as("sum_cents"))
    (audited, obs)
  }
}
