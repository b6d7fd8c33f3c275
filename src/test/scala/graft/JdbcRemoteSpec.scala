package graft

import org.apache.spark.sql.functions._
import graft.sources.{IngestJob, JdbcRemote}

/** S6 fidelity: the JDBC hop to a live second engine must PUSH the
  * aggregation into that engine (the reference FDW's headline behavior),
  * and the partition-stats profile must agree with a direct aggregate.
  */
class JdbcRemoteSpec extends SparkSpec {

  test("q64 pushes the aggregate into Derby and matches a local groupBy") {
    val df = JdbcRemote.q64.run(spark, sf001)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedAggregates"),
      s"aggregate should be pushed to the remote engine:\n$plan")
    assert(plan.contains("COUNT") && plan.contains("SUM"),
      s"pushed aggregate list should carry COUNT/SUM:\n$plan")

    val expected = Tables.load(spark, sf001, "nation")
      .groupBy(col("n_regionkey"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_nationkey")).as("sum_key"),
        min(col("n_name")).as("first_name"))
      .orderBy(col("n_regionkey"))
      .collect().map(_.toSeq).toSeq
    assert(df.collect().map(_.toSeq).toSeq == expected)
  }

  test("q63 partition stats agree with a direct month rollup") {
    val stats = IngestJob.q63.run(spark, sf001).collect()
    val expected = Tables.load(spark, sf001, "lineitem")
      .groupBy(date_format(col("l_shipdate"), "yyyyMM").as("m"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val (m, rows, files, bytes) =
        (r.getString(0), r.getLong(1),
          r.getBoolean(2), r.getBoolean(3))
      assert(expected(m) == rows, s"row count mismatch for partition $m")
      assert(files && bytes, s"partition $m reports no files/bytes")
    }
    assert(stats.length == expected.size)
  }
}
