package graft

import org.apache.spark.sql.functions._

/** Zero-pass observability ([[graft.operators.Audit]]): the observed
  * metrics must equal an independent recompute, arrive from the SAME
  * action (no second scan), and survive a real sink write. */
class AuditSpec extends SparkSpec {

  test("observed ingest audit matches independent aggregates") {
    val ev = Tables.load(spark, sf001, "events")
    val (audited, obs) =
      graft.operators.Audit.observed(ev, "user_id", "value")
    // plan carries the CollectMetrics node — the piggyback, not a re-scan
    assert(audited.queryExecution.analyzed.toString
      .contains("CollectMetrics"))
    val out = java.nio.file.Files
      .createTempDirectory("graft_audit").toString
    audited.write.mode("overwrite").parquet(out)
    val m = obs.get
    val want = ev.agg(
      count(lit(1)).as("n"),
      sum(when(col("user_id").isNull, lit(1L)).otherwise(lit(0L)))
        .as("nulls"),
      sum(graft.queries.Det.cents(col("value"))).as("cents"))
      .collect()(0)
    assert(m("n_rows") == want.getAs[Long]("n"))
    assert(m("n_null_keys") == want.getAs[Long]("nulls"))
    assert(m("sum_cents") == want.getAs[Long]("cents"))
    // and the sink actually received every audited row
    assert(spark.read.parquet(out).count() == want.getAs[Long]("n"))
  }
}
