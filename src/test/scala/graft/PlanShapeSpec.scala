package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-SHAPE regression gates. Correctness is the oracle's job; these
  * tests pin the physical properties that make the plans survive 100 TB —
  * filter pushdown reaching the parquet scan, column pruning, broadcast
  * joins on small sides, and above all: NO query may silently degenerate
  * to an unbounded cartesian product. The static `plans/` artifacts show
  * these properties; this spec makes losing them a test failure instead
  * of a diff someone has to notice.
  */
class PlanShapeSpec extends SparkSpec {

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf001)
    try df.queryExecution.explainString(FormattedMode)
    finally Caches.release()
  }

  test("no registered query plans a CartesianProduct") {
    // CartesianProductExec is the unbounded all-pairs shuffle; the
    // crossJoin calls in Sim/Kmeans broadcast a tiny side and plan as
    // BroadcastNestedLoopJoin, which is the intended shape
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val plan = formatted(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name degenerated to a cartesian product")
    }
  }

  test("q01 date predicate reaches the parquet scan") {
    val plan = formatted("q01_agg_by_type")
    assert(plan.contains("PushedFilters:") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*l_shipdate[^\\]]*\\].*"),
      "l_shipdate predicate not pushed to the scan")
  }

  test("q14 narrow projection prunes the scan schema") {
    val plan = formatted("q14_scan_project")
    val readSchemas =
      "ReadSchema: [^\n]*".r.findAllIn(plan).toList
    assert(readSchemas.nonEmpty)
    // the wide lineitem table must not be scanned in full: columns not
    // referenced by the projection or predicates (q14 reads orderkey,
    // linenumber, quantity, extendedprice, tax, returnflag, shipdate)
    // must not appear in the read schema
    readSchemas.foreach { rs =>
      Seq("l_partkey", "l_suppkey", "l_discount", "l_linestatus")
        .foreach(c => assert(!rs.contains(c),
          s"unprojected column $c reaches the scan: $rs"))
    }
  }

  test("q04 dimension side is broadcast, not shuffled") {
    val plan = formatted("q04_topn_percentiles")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      "top-N side of the join lost its broadcast")
  }

  test("q24 LSH candidate join is an equi-join on band buckets") {
    val plan = formatted("q24_minhash_lsh")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      "band-bucket candidate join is not an equi-join")
  }
}
