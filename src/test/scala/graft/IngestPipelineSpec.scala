package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.IngestPipeline

/** End-to-end ingestion dataflow: every hop preserves the row count and
  * the partitioned table round-trips values exactly.
  */
class IngestPipelineSpec extends SparkSpec {

  test("all hops preserve the row count (reference validation invariant)") {
    val dir = Files.createTempDirectory("graft_pipeline").toString
    val hops = IngestPipeline.run(spark, sf001, dir)
    assert(hops.allEqual && hops.source > 0)

    // day-partition pruning: a one-day filter reads a strict file subset
    val table = spark.read.parquet(s"$dir/events_by_day")
    val oneDay = table.select("day").distinct().orderBy("day")
      .limit(1).collect().head.get(0)
    val pruned = table.filter(col("day") === oneDay)
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters"), planStr)
    assert(pruned.count() > 0 && pruned.count() < hops.source)

    // value-level round-trip: per-event values survive CSV + parquet hops
    val original = Tables.load(spark, sf001, "events")
      .select("event_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    table.select("event_id", "value").collect().foreach { r =>
      assert(original(r.getLong(0)) == r.getDouble(1))
    }
  }
}
