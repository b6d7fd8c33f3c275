package graft

import org.apache.spark.sql.functions._
import graft.plans.ApproxPercentileRewrite

/** The injected optimizer rule: off by default (exact percentiles, the
  * oracle-comparable path); flag on → every Percentile becomes an
  * ApproximatePercentile sketch with no query changes.
  */
class RewriteRuleSpec extends SparkSpec {

  private def medianQuery =
    Tables.load(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5D)").as("p50"))

  test("default off: plan keeps the exact percentile") {
    val plan = medianQuery.queryExecution.optimizedPlan.toString
    assert(plan.contains("percentile(") &&
      !plan.contains("percentile_approx"), plan)
  }

  test("flag on: percentile rewritten to approx sketch, values close") {
    val exact = medianQuery.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    spark.conf.set(ApproxPercentileRewrite.FLAG, "true")
    try {
      val plan = medianQuery.queryExecution.optimizedPlan.toString
      assert(plan.contains("percentile_approx"), plan)
      val approx = medianQuery.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      approx.foreach { case (k, v) =>
        val e = exact(k)
        assert(math.abs(v - e) / math.max(math.abs(e), 1.0) < 0.05,
          s"$k: approx $v too far from exact $e")
      }
    } finally spark.conf.unset(ApproxPercentileRewrite.FLAG)
  }
}
