package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Standard OLAP surface beyond the reference's declared operators
  * (SURVEY §2.5 marks ranking/frames "available when needed", §2.4 marks
  * grouping sets out of parity scope): ranking and frame-based window
  * functions, CUBE grouping sets, pivot, and correlated subqueries — the
  * constructs a user switching from a general OLAP engine reaches for
  * next. All oracle-checked against DuckDB.
  */
object Olap {

  /** Ranking + frame windows over a yearly rollup: rank / dense_rank /
    * ntile quartiles / first_value on one ordering, a 3-year moving
    * average via ROWS BETWEEN on another — two window specs over one
    * aggregate, the shape Catalyst plans as a single shuffle on the
    * partition key with two sorts. Determinism: every ORDER BY carries a
    * full tiebreak (yr), and the moving average divides an exact BIGINT
    * frame sum by the frame count (identical IEEE division both engines —
    * native window AVG would accumulate doubles in engine-specific
    * order). DuckDB's rank/ntile return BIGINT so the twin casts them to
    * Spark's INTEGER. */
  val q49 = Q(
    "q49_window_suite",
    (s, d) => {
      val yearly = Tables.load(s, d, "orders")
        .groupBy(
          col("o_orderpriority").as("pri"),
          year(col("o_orderdate")).as("yr"))
        .agg(
          count(lit(1)).as("n"),
          Det.dsum(col("o_totalprice")).as("total"))
      val wr = Window.partitionBy(col("pri")).orderBy(col("n").desc, col("yr"))
      val wy = Window.partitionBy(col("pri")).orderBy(col("yr"))
      val wf = wy.rowsBetween(-2, Window.currentRow)
      yearly.select(
        col("pri"), col("yr"), col("n"), col("total"),
        rank().over(wr).as("rnk"),
        dense_rank().over(wr).as("drnk"),
        ntile(4).over(wy).as("quartile"),
        first(col("yr")).over(wr).as("best_year"),
        (sum(col("n")).over(wf).cast(DoubleType) /
          count(lit(1)).over(wf)).as("moving_avg_n"))
        .orderBy(col("pri"), col("yr"))
    },
    Some(s"""
      WITH yearly AS (
        SELECT o_orderpriority AS pri,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               count(*) AS n,
               ${Det.dsumSql("o_totalprice")} AS total
        FROM orders GROUP BY pri, yr
      )
      SELECT pri, yr, n, total,
        CAST(rank() OVER wr AS INTEGER) AS rnk,
        CAST(dense_rank() OVER wr AS INTEGER) AS drnk,
        CAST(ntile(4) OVER wy AS INTEGER) AS quartile,
        first_value(yr) OVER wr AS best_year,
        CAST(sum(n) OVER wf AS DOUBLE) / count(*) OVER wf AS moving_avg_n
      FROM yearly
      WINDOW wr AS (PARTITION BY pri ORDER BY n DESC, yr),
             wy AS (PARTITION BY pri ORDER BY yr),
             wf AS (PARTITION BY pri ORDER BY yr
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY pri, yr"""))

  /** CUBE grouping sets (q46's ROLLUP sibling): all four combinations of
    * (year, status) subtotals in one pass — Spark expands to a single
    * Expand + hash aggregate, one shuffle regardless of the number of
    * grouping sets. gid + coalesced keys order the output because the
    * engines disagree on NULL sort order. */
  val q50 = Q(
    "q50_cube",
    (s, d) =>
      Tables.load(s, d, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .cube(col("yr"), col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          Det.dsum(col("o_totalprice")).as("total"),
          grouping_id(col("yr"), col("o_orderstatus")).as("gid"))
        .orderBy(
          col("gid"),
          coalesce(col("yr"), lit(-1)),
          coalesce(col("o_orderstatus"), lit(""))),
    Some(s"""
      SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderstatus,
             count(*) AS n,
             ${Det.dsumSql("o_totalprice")} AS total,
             CAST(grouping(yr) * 2 + grouping(o_orderstatus) AS BIGINT)
               AS gid
      FROM orders
      GROUP BY CUBE (yr, o_orderstatus)
      ORDER BY gid, coalesce(yr, -1), coalesce(o_orderstatus, '')"""))

  /** Pivot: order-status categories rotated into columns (Spark's
    * relational pivot ≈ SQL conditional aggregation). Explicit pivot
    * values keep the plan a single aggregate — no extra values-discovery
    * job, and the fixed column set is what the SQL twin can mirror.
    * Missing combinations surface as 0, not NULL (count semantics in
    * both engines). */
  val q51 = Q(
    "q51_pivot",
    (s, d) =>
      Tables.load(s, d, "orders")
        .groupBy(col("o_orderpriority").as("pri"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(
          col("pri"),
          coalesce(col("F"), lit(0L)).as("status_f"),
          coalesce(col("O"), lit(0L)).as("status_o"),
          coalesce(col("P"), lit(0L)).as("status_p"))
        .orderBy(col("pri")),
    Some("""
      SELECT o_orderpriority AS pri,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
             count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
      FROM orders GROUP BY pri ORDER BY pri"""))

  /** Correlated subqueries through the same-SQL-text entry (q37's
    * methodology): a correlated EXISTS filter plus a correlated scalar
    * COUNT subquery, one string in the Spark∩DuckDB dialect intersection
    * run by BOTH engines. Catalyst decorrelates each into joins
    * (left-semi for EXISTS, aggregated left-outer for the scalar) — the
    * rewrite that makes correlated SQL runnable at scale instead of
    * per-row re-execution. */
  private val q52Sql = """
      SELECT n_name,
        (SELECT count(*) FROM customer c
          WHERE c.c_nationkey = n.n_nationkey) AS n_customers
      FROM nation n
      WHERE EXISTS (SELECT 1 FROM customer c2
                    WHERE c2.c_nationkey = n.n_nationkey
                      AND c2.c_acctbal > 9900)
      ORDER BY n_name"""

  val q52 = Q(
    "q52_subqueries",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql(q52Sql)
    },
    Some(q52Sql))

  /** Equi-width histogram (profiling surface, the reference's volume/
    * cardinality checks' missing sibling): order totals binned into 10
    * fixed-width buckets with the overflow clamped into the last. Bucket
    * assignment runs on exact integer cents with integer division —
    * no float boundary ambiguity between engines — and the whole thing
    * is one map-side-combinable aggregate: a single shuffle of ≤10 rows
    * regardless of table size. */
  val q55 = Q(
    "q55_histogram",
    (s, d) =>
      Tables.load(s, d, "orders")
        .select(
          expr("least(CAST(round(o_totalprice * 100) AS BIGINT) div 5000000," +
            " 9L)").as("bucket"),
          col("o_totalprice"))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n"),
          Det.dsum(col("o_totalprice")).as("total"))
        .orderBy(col("bucket")),
    Some(s"""
      WITH b AS (
        SELECT least(${Det.centsSql("o_totalprice")} // 5000000, 9)
                 AS bucket,
               o_totalprice
        FROM orders
      )
      SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n,
             ${Det.dsumSql("o_totalprice")} AS total
      FROM b GROUP BY bucket ORDER BY bucket"""))

  val all: Seq[Q] = Seq(q49, q50, q51, q52, q55)
}
