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

  private def distinctQuery =
    Tables.load(spark, sf001, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))

  test("approx-distinct default off: plan keeps exact count(distinct)") {
    val plan = distinctQuery.queryExecution.optimizedPlan.toString
    assert(plan.contains("count(distinct") &&
      !plan.contains("approx_count_distinct"), plan)
  }

  test("approx-distinct flag on: HLL++ plan, values close, types kept") {
    val exact = distinctQuery.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.conf.set(graft.plans.ApproxDistinctRewrite.FLAG, "true")
    try {
      val q = distinctQuery
      assert(q.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"),
        q.queryExecution.optimizedPlan.toString)
      // result type stays LongType — no cast-back needed for this rule
      assert(q.schema("n_users").dataType ==
        org.apache.spark.sql.types.LongType)
      q.collect().foreach { r =>
        val e = exact(r.getString(0)).toDouble
        assert(math.abs(r.getLong(1) - e) / e < 0.15,
          s"${r.getString(0)}: approx ${r.getLong(1)} vs exact $e")
      }
      // multi-column distinct keeps the exact form (NULL semantics)
      val multi = Tables.load(spark, sf001, "events")
        .agg(countDistinct(col("user_id"), col("event_type")).as("n"))
      assert(!multi.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      // plain (non-distinct) count is untouched
      val plain = Tables.load(spark, sf001, "events")
        .groupBy(col("event_type")).agg(count(col("user_id")).as("n"))
      assert(!plain.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
    } finally spark.conf.unset(graft.plans.ApproxDistinctRewrite.FLAG)
  }

  private def rollupQuery =
    Tables.load(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).as("total_qty"))

  test("summary rewrite: flag routes matching aggregates to the summary") {
    import graft.plans.SummaryRewrite
    val dir = java.nio.file.Files
      .createTempDirectory("graft_summary").toString + "/sum.parquet"
    // the summary: one row per (returnflag, linestatus, shipmonth) —
    // FINER than the query's grouping, so the rewrite must genuinely
    // re-aggregate, not just rename columns
    Tables.load(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity")).as("sum_l_quantity"))
      .write.mode("overwrite").parquet(dir)
    val direct = rollupQuery.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    spark.conf.set(SummaryRewrite.FLAG, "true")
    spark.conf.set(SummaryRewrite.PATH, dir)
    // provenance: the FULL path of the fact table this summary was
    // built from — a same-named scan of any other dataset must not match
    spark.conf.set(SummaryRewrite.FACT, s"$sf001/lineitem.parquet")
    try {
      // the leaf relation must be the SUMMARY (its partial columns),
      // not the fact table (treeStrings do not render file paths)
      def leafCols(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.queryExecution.optimizedPlan.collectLeaves()
          .flatMap(_.output.map(_.name)).toSet
      val q = rollupQuery
      assert(leafCols(q).contains("sum_l_quantity") &&
        !leafCols(q).contains("l_orderkey"),
        s"aggregate was not routed to the summary:\n" +
          q.queryExecution.optimizedPlan.treeString)
      val got = q.collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      // COUNT re-aggregates exactly; SUM(l_quantity) re-aggregates
      // BIT-exactly because every partial sum is an integer < 2^53
      assert(got == direct, "summary answer differs from the fact scan")
      // a FILTERED aggregate answers a different question — untouched
      val filtered = Tables.load(spark, sf001, "lineitem")
        .filter(col("l_returnflag") === "R")
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
      assert(!leafCols(filtered).contains("cnt"),
        "filtered aggregate must not rewrite")
      // grouping on a column the summary lacks — untouched
      val offDim = Tables.load(spark, sf001, "lineitem")
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      assert(!leafCols(offDim).contains("cnt"),
        "off-dimension aggregate must not rewrite")
      // an aggregate the summary cannot answer (MIN) — untouched
      val minQ = Tables.load(spark, sf001, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(min(col("l_quantity")).as("mn"))
      assert(!leafCols(minQ).contains("cnt"),
        "MIN aggregate must not rewrite")
      // the STALE-SUMMARY hazard: a different dataset whose root has
      // the same basename (another SF's lineitem.parquet) must NOT be
      // answered from this summary
      val otherSf = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
      assert(!leafCols(otherSf).contains("cnt"),
        "same-basename scan of a different dataset must not rewrite")
      // a FILTER clause is not answerable from the summary
      val filterClause = Tables.load(spark, sf001, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(expr(
          "count(*) FILTER (WHERE l_quantity > 25)").as("n_heavy"))
      assert(!leafCols(filterClause).contains("cnt"),
        "FILTER-clause aggregate must not rewrite")
      assert(filterClause.collect().map(_.getLong(2)).sum > 0)
      // a GLOBAL aggregate (0→NULL on empty input) stays untouched
      val global = Tables.load(spark, sf001, "lineitem")
        .agg(count(lit(1)).as("n"))
      assert(!leafCols(global).contains("cnt"),
        "global aggregate must not rewrite")
      // rewritten COUNT keeps its non-nullable LONG schema
      assert(!q.schema("n").nullable && q.schema("n").dataType ==
        org.apache.spark.sql.types.LongType)
    } finally {
      spark.conf.unset(SummaryRewrite.FLAG)
      spark.conf.unset(SummaryRewrite.PATH)
      spark.conf.unset(SummaryRewrite.FACT)
    }
  }

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

  test("flag on: long-typed child keeps DOUBLE result type (q04/q05 shape)") {
    // Percentile returns DOUBLE regardless of child type, but
    // ApproximatePercentile returns the child's type — the rewrite must
    // cast back or integer-cents percentile queries change result type.
    def centsQuery =
      Tables.load(spark, sf001, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr(
          "percentile(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5D)")
          .as("p50_cents"))
    val exactField = centsQuery.schema("p50_cents")
    spark.conf.set(ApproxPercentileRewrite.FLAG, "true")
    try {
      val rewritten = centsQuery
      assert(rewritten.queryExecution.optimizedPlan.toString
        .contains("percentile_approx"))
      assert(rewritten.schema("p50_cents").dataType == exactField.dataType,
        s"rewrite changed result type: ${rewritten.schema("p50_cents")}")
      // values must still be readable as doubles and close to exact
      val exact = centsQuery.collect() // flag still on; compare to approx twin
      exact.foreach(r => assert(!r.isNullAt(1) && r.getDouble(1) > 0))
    } finally spark.conf.unset(ApproxPercentileRewrite.FLAG)
  }

  test("flag on: frequency-weighted percentile is NOT rewritten") {
    // ApproximatePercentile has no frequency argument — rewriting the
    // 3-arg form would silently weight every row 1. It must stay exact.
    def weighted =
      Tables.load(spark, sf001, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr(
          "percentile(l_extendedprice, 0.5D, CAST(l_quantity AS INT))")
          .as("p50w"))
    val exact = weighted.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    spark.conf.set(ApproxPercentileRewrite.FLAG, "true")
    try {
      val plan = weighted.queryExecution.optimizedPlan.toString
      assert(!plan.contains("percentile_approx"),
        s"weighted percentile must not rewrite:\n$plan")
      val flagOn = weighted.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(flagOn == exact, "weighted percentile changed under the flag")
    } finally spark.conf.unset(ApproxPercentileRewrite.FLAG)
  }

  test("flag on: array-of-percentages percentile keeps ARRAY<DOUBLE>") {
    def multiQuery =
      Tables.load(spark, sf001, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr(
          "percentile(CAST(round(l_extendedprice * 100) AS BIGINT)," +
            " array(0.25D, 0.75D))").as("qs"))
    val exactType = multiQuery.schema("qs").dataType
    spark.conf.set(ApproxPercentileRewrite.FLAG, "true")
    try {
      assert(multiQuery.schema("qs").dataType == exactType,
        s"rewrite changed result type: ${multiQuery.schema("qs")}")
      multiQuery.collect().foreach { r =>
        val arr = r.getSeq[Double](1)
        assert(arr.length == 2 && arr(0) <= arr(1))
      }
    } finally spark.conf.unset(ApproxPercentileRewrite.FLAG)
  }
}
