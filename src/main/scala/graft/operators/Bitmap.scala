package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.queries.Q

/** Exact distinct-counting over PACKED BITMAPS — the ClickHouse
  * `groupBitmap`/roaring-bitmap capability (its engines expose bitmap
  * aggregates the reference's queries never use), done Spark-first.
  *
  * Structure: id → (block = id div 64, bit = id mod 64); per group and
  * block, `bit_or(1L << bit)` packs up to 64 members into ONE BIGINT.
  * The mask is an idempotent, associative, commutative merge — duplicate
  * ids OR into the same bit, so no pre-`distinct` shuffle is ever needed,
  * partial aggregation combines map-side, and STORED masks for one
  * period merge into coarser periods by another `bit_or` WITHOUT
  * re-scanning the facts: the sketch-merge law of q118/q121/q122, except
  * EXACT. Distinct count = `sum(bit_count(mask))`. State per group is
  * O(id-range/64) longs, sharded across the cluster by (group, block) —
  * no collect_set, no count(DISTINCT) exchange of raw ids.
  */
object Bitmap {

  /** q166: weekly-from-daily exact distinct users per event type — the
    * incremental-rollup question every metrics store answers ("we have
    * daily uniques; what are weekly uniques?") where approximate engines
    * reach for HLL and naive ones re-scan the raw events. Here the DAILY
    * per-block bitmap masks are the ONLY input to the weekly number:
    * weekly mask = bit_or of the seven daily masks, weekly uniques =
    * sum(bit_count) — exact, by construction, at O(users/64) longs per
    * (type, week). The report pairs it with the (wrong but cheap)
    * sum-of-daily-uniques and their ratio — the classic "revisit factor"
    * a dashboard shows. The ORACLE computes both numbers DIRECTLY with
    * count(DISTINCT) over the raw rows, so oracle agreement proves the
    * packed-bitmap rollup exact, not just self-consistent (same
    * differential pattern as q137/q140/q141: naive oracle vs scaled
    * rewrite). Week = floor(epoch-day / 7): engine-neutral integer
    * arithmetic on non-negative days, immune to WEEK() locale rules. */
  val q166 = Q(
    "q166_bitmap_rollup",
    (s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"),
          col("user_id"))
        .withColumn("wk",
          expr("datediff(day, DATE'1970-01-01') div 7").cast(LongType))
        .withColumn("blk", expr("user_id div 64"))
        .withColumn("m",
          expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 64) AS INT))"))
      // both report legs read the daily masks; persist the COMPACT
      // aggregate (types × days × blocks rows) so events scans once
      import graft.Caches.Tracked
      val daily = ev.groupBy(col("event_type"), col("wk"), col("day"),
          col("blk"))
        .agg(expr("bit_or(m)").as("mask"))
        .persistTracked()
      val weekly = daily
        .groupBy(col("event_type"), col("wk"), col("blk"))
        .agg(expr("bit_or(mask)").as("wmask"))
        .groupBy(col("event_type"), col("wk"))
        .agg(sum(expr("bit_count(wmask)")).as("n_week_exact"))
      val dailySum = daily
        .groupBy(col("event_type"), col("wk"))
        .agg(sum(expr("bit_count(mask)")).as("n_daily_sum"))
      dailySum.join(weekly, Seq("event_type", "wk"))
        .withColumn("revisit_ratio",
          col("n_daily_sum").cast(DoubleType)
            / col("n_week_exact").cast(DoubleType))
        .select(col("event_type"), col("wk"), col("n_daily_sum"),
          col("n_week_exact"), col("revisit_ratio"))
        .orderBy(col("event_type"), col("wk"))
    },
    Some("""
      WITH e AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               user_id
        FROM events
      ), wkd AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', day) // 7 AS wk,
               day, user_id
        FROM e
      ), daily AS (
        SELECT event_type, wk, day,
               count(DISTINCT user_id) AS nd
        FROM wkd GROUP BY 1, 2, 3
      ), ds AS (
        SELECT event_type, wk, CAST(sum(nd) AS BIGINT) AS n_daily_sum
        FROM daily GROUP BY 1, 2
      ), wx AS (
        SELECT event_type, wk, count(DISTINCT user_id) AS n_week_exact
        FROM wkd GROUP BY 1, 2
      )
      SELECT ds.event_type, CAST(ds.wk AS BIGINT) AS wk,
             ds.n_daily_sum, wx.n_week_exact,
             CAST(ds.n_daily_sum AS DOUBLE)
               / CAST(wx.n_week_exact AS DOUBLE) AS revisit_ratio
      FROM ds JOIN wx USING (event_type, wk)
      ORDER BY event_type, wk"""))

  val all: Seq[Q] = Seq(q166)
}
