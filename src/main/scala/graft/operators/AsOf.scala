package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q

/** As-of and range joins — operators Spark lacks as primitives, built by
  * COMPOSITION of existing operators (the custom-operator preference
  * ladder's first rung: compose before writing a custom SparkPlan).
  *
  * The q39 oracle is DuckDB's NATIVE `ASOF JOIN` — a genuinely
  * independent implementation of the same semantics, so the differential
  * test validates our composition against another engine's built-in
  * operator, not against a translation of itself.
  */
object AsOf {

  /** First name with `base` as a prefix not already taken — keeps internal
    * helper columns collision-free whatever the caller's schema is. */
  private def freshName(base: String, taken: Set[String]): String =
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
      .find(n => !taken.contains(n)).get

  /** As-of join: for each left row, the single most recent right row with
    * `rightTime <= leftTime` within the same `key` (equal times match).
    *
    * Composition: tag both sides, union, then carry the last non-null
    * right-values STRUCT over a (key, time) window ordered with right rows
    * before left rows at equal timestamps. ONE shuffle on (key) + a sort —
    * the same cost profile as a sort-merge join, and the standard
    * distributed as-of plan (a per-key ordered merge). Never materializes
    * the O(left × right) inequality pair space a naive join+filter would.
    *
    * The right values ride in one struct so a match always carries a
    * CONSISTENT right row (never fields mixed across rows), and the struct
    * participates in the window ordering as the final tiebreak: multiple
    * right rows at the same timestamp resolve deterministically to the
    * greatest (by field order) rather than whichever the shuffle produced
    * last. Internal helper columns are generated collision-free;
    * `rightValues` names that clash with left columns are rejected
    * up front (they would otherwise silently overwrite). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String]): DataFrame = {
    val lCols = left.columns
    val clash = rightValues.filter(lCols.contains)
    require(clash.isEmpty,
      s"rightValues ${clash.mkString(", ")} already exist on the left side; " +
        "rename them before the as-of join")
    val taken = (lCols ++ rightValues).toSet
    val tCol = freshName("_graft_asof_t", taken)
    val sideCol = freshName("_graft_asof_side", taken)
    val rvCol = freshName("_graft_asof_rv", taken)
    val rvType = org.apache.spark.sql.types.StructType(
      rightValues.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    val tagged = left
      .withColumn(tCol, col(leftTime))
      .withColumn(sideCol, lit(1))
      .withColumn(rvCol, lit(null).cast(rvType))
      .unionByName(
        right
          .withColumn(tCol, col(rightTime))
          .withColumn(sideCol, lit(0))
          .withColumn(rvCol, struct(rightValues.map(col): _*))
          .select(
            (lCols.map(c =>
              if (c == key) col(c)
              else lit(null).cast(left.schema(c).dataType).as(c)) :+
              col(tCol) :+ col(sideCol) :+ col(rvCol)): _*))
    // right (0) sorts before left (1) at equal time → "at or before"
    // matches; the struct is the deterministic same-timestamp tiebreak
    val w = Window.partitionBy(col(key))
      .orderBy(col(tCol), col(sideCol), col(rvCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged
      .withColumn(rvCol, last(col(rvCol), ignoreNulls = true).over(w))
      .filter(col(sideCol) === 1)
    rightValues
      .foldLeft(carried)((df, c) => df.withColumn(c, col(rvCol).getField(c)))
      .drop(tCol, sideCol, rvCol)
  }

  /** q39: each event joined as-of to its user's most recent "profile
    * snapshot" (a deterministic subset of events playing the dimension-
    * history role). Oracle: DuckDB's native ASOF LEFT JOIN. */
  val q39 = Q(
    "q39_asof_join",
    (s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val snaps = Tables.load(s, d, "events")
        .filter(col("event_id") % 17 === 0)
        .groupBy(col("user_id"), col("ts").as("sts"))
        .agg(max(col("value")).as("snap_value"))
        .select(col("user_id"), col("sts"), col("snap_value"))
      asofJoin(ev, snaps, "user_id", "ts", "sts", Seq("snap_value"))
        .select(col("event_id"), col("user_id"), col("snap_value"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      ), snaps AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS sts,
               max(value) AS snap_value
        FROM events WHERE event_id % 17 = 0
        GROUP BY user_id, sts
      )
      SELECT ev.event_id, ev.user_id, snaps.snap_value
      FROM ev ASOF LEFT JOIN snaps
        ON ev.user_id = snaps.user_id AND snaps.sts <= ev.ts
      ORDER BY ev.event_id"""))

  /** q40: range (band) join — events banded into value tiers by an
    * interval condition. The tier side is 4 rows → Spark broadcasts and
    * the "join" is a per-row interval lookup, the right plan at any
    * scale when the band table is small. */
  val q40 = Q(
    "q40_range_join",
    (s, d) => {
      val tiers = s.createDataFrame(Seq(
        ("bronze", 0.0, 25.0),
        ("silver", 25.0, 75.0),
        ("gold", 75.0, 150.0),
        ("platinum", 150.0, 1e18)
      )).toDF("tier", "lo", "hi")
      Tables.load(s, d, "events")
        .join(
          broadcast(tiers),
          col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("tier"))
        .agg(
          count(lit(1)).as("n"),
          graft.queries.Det.dsum(col("value")).as("sum_value"))
        .orderBy(col("tier"))
    },
    Some(s"""
      SELECT t.tier, count(*) AS n,
             ${graft.queries.Det.dsumSql("e.value")} AS sum_value
      FROM events e
      JOIN (VALUES ('bronze', 0.0, 25.0),
                   ('silver', 25.0, 75.0),
                   ('gold', 75.0, 150.0),
                   ('platinum', 150.0, 1e18)) t(tier, lo, hi)
        ON e.value >= t.lo AND e.value < t.hi
      GROUP BY t.tier
      ORDER BY t.tier"""))

  /** q87: the SAME as-of query as q39, executed through the NATIVE
    * [[graft.plans.AsOfJoinExec]] physical operator (custom logical node
    * + planner strategy + streaming per-partition merge) instead of the
    * window composition — both checked against DuckDB's native ASOF
    * JOIN, so the two implementations are differentially validated
    * against a third, independent one. The right side is a groupBy
    * result, so (key, time) is unique and the merge's tie handling is
    * moot (see AsOfJoinExec's scaladoc). */
  val q87 = Q(
    "q87_asof_native",
    (s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val snaps = Tables.load(s, d, "events")
        .filter(col("event_id") % 17 === 0)
        .groupBy(col("user_id"), col("ts").as("sts"))
        .agg(max(col("value")).as("snap_value"))
        .select(col("user_id"), col("sts"), col("snap_value"))
      graft.plans.AsOfJoinNative
        .asofJoin(ev, snaps, "user_id", "ts", "sts", Seq("snap_value"))
        .select(col("event_id"), col("user_id"), col("snap_value"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      ), snaps AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS sts,
               max(value) AS snap_value
        FROM events WHERE event_id % 17 = 0
        GROUP BY user_id, sts
      )
      SELECT ev.event_id, ev.user_id, snaps.snap_value
      FROM ev ASOF LEFT JOIN snaps
        ON ev.user_id = snaps.user_id AND snaps.sts <= ev.ts
      ORDER BY ev.event_id"""))

  /** q88: BIG-BIG range join via interval binning — the scale path q40's
    * broadcast band join lacks when BOTH sides are large. Time is cut
    * into fixed 10-minute bins; each point carries its one bin, each
    * interval is REPLICATED to every bin it overlaps (bounded ≤ 2 here
    * since intervals are ≤ 7 minutes), and the join becomes an EQUI-join
    * on bin followed by the exact containment filter. A point matches an
    * interval in exactly one bin — its own — so no pair dedup is needed.
    * Shuffle volume is each side × small replication factor, joined on a
    * key both sides hash on: linear at 100 TB where the naive inequality
    * join is quadratic and un-shuffleable. All bin/bound arithmetic is
    * integer micros, so the oracle (DuckDB's native inequality IEJoin —
    * an independent algorithm) matches bit-exactly. */
  val q88 = Q(
    "q88_interval_bin_join",
    (s, d) => {
      val binUs = 600L * 1000 * 1000 // 10 minutes of microseconds
      val ev = Tables.load(s, d, "events")
        .select(
          col("event_id"), col("value"),
          unix_micros(col("ts")).as("t_us"))
        .withColumn("bin", expr(s"t_us div $binUs"))
      val iv = Tables.load(s, d, "events")
        .filter(col("event_id") % 11 === 0)
        .select(
          col("event_id").as("interval_id"),
          unix_micros(col("ts")).as("lo_us"))
        .withColumn(
          "hi_us",
          col("lo_us") + (col("interval_id") % 7 + 1) * lit(60L * 1000 * 1000))
        .withColumn(
          "bin", explode(expr(s"sequence(lo_us div $binUs, (hi_us - 1) div $binUs)")))
      ev.join(iv, Seq("bin"))
        .filter(col("t_us") >= col("lo_us") && col("t_us") < col("hi_us"))
        .groupBy(col("interval_id"))
        .agg(
          count(lit(1)).as("n_events"),
          graft.queries.Det.dsum(col("value")).as("sum_value"))
        .orderBy(col("interval_id"))
    },
    Some(s"""
      WITH ev AS (
        SELECT event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
        FROM events
      ), iv AS (
        SELECT event_id AS interval_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS lo_us,
               epoch_us(CAST(ts AS TIMESTAMP))
                 + (event_id % 7 + 1) * 60000000 AS hi_us
        FROM events WHERE event_id % 11 = 0
      )
      SELECT i.interval_id, count(*) AS n_events,
             ${graft.queries.Det.dsumSql("e.value")} AS sum_value
      FROM ev e JOIN iv i
        ON e.t_us >= i.lo_us AND e.t_us < i.hi_us
      GROUP BY i.interval_id
      ORDER BY i.interval_id"""))

  /** q314: NEAREST-DIRECTION AS-OF JOIN — pandas `merge_asof(direction=
    * 'nearest')`: each event pairs with its user's CLOSEST snapshot in
    * TIME, looking both ways, ties to the earlier (backward) one. The
    * Spark plan is the scale-safe union-window shape: tag snapshots 0 /
    * events 1, sort (user, t, tag) — so an equal-timestamp snapshot
    * sorts BEFORE its event and lands in the at-or-before frame — then
    * one running MAX gives the backward candidate and one reversed
    * running MIN the strictly-after forward candidate; a CASE picks the
    * nearer. One shuffle on user, no self-join. The ORACLE is a genuine
    * differential: DuckDB's NATIVE `ASOF JOIN` executed in BOTH
    * directions (`>=` backward, `<=` forward — its forward leg admits
    * equality where our window is strict, but an equal-ts snapshot also
    * wins the backward leg with Δ=0 in both engines, so the published
    * nearest/direction never differ; reasoned in-line, spec-replayed).
    * Output: per event type, match census, exact Σ|Δ| micros, and the
    * backward/forward split. */
  val q314 = Q(
    "q314_asof_nearest",
    (s, d) => {
      import graft.Caches.Tracked
      val ev = graft.Tables.load(s, d, "events")
        .select(
          col("user_id"), unix_micros(col("ts")).as("t"),
          col("event_type"), col("event_id"))
        .persistTracked()
      val tagged = ev
        .select(col("user_id"), col("t"), col("event_type"),
          lit(1).as("is_ev"))
        .unionAll(
          ev.filter(col("event_id") % 17 === 0)
            .select(col("user_id"), col("t"),
              lit(null).cast("string").as("event_type"),
              lit(0).as("is_ev")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("is_ev"))
      val cand = tagged
        .withColumn("bt",
          max(when(col("is_ev") === 0, col("t")))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("ft",
          min(when(col("is_ev") === 0, col("t")))
            .over(w.rowsBetween(0, Window.unboundedFollowing)))
        .filter(col("is_ev") === 1)
        .withColumn("nd",
          when(col("bt").isNull && col("ft").isNull, lit(null))
            .when(col("bt").isNull, col("ft") - col("t"))
            .when(col("ft").isNull, col("t") - col("bt"))
            .when(col("ft") - col("t") < col("t") - col("bt"),
              col("ft") - col("t"))
            .otherwise(col("t") - col("bt")))
        .withColumn("dir",
          when(col("bt").isNull && col("ft").isNull, lit(null))
            .when(col("bt").isNull, lit("F"))
            .when(col("ft").isNull, lit("B"))
            .when(col("ft") - col("t") < col("t") - col("bt"), lit("F"))
            .otherwise(lit("B")))
      cand
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          count(col("nd")).as("n_matched"),
          sum(col("nd")).as("sum_absdelta_us"),
          sum(when(col("dir") === "B", 1L).otherwise(0L)).as("n_backward"),
          sum(when(col("dir") === "F", 1L).otherwise(0L)).as("n_forward"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id, user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS t
        FROM events
      ), snap AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS st
        FROM events WHERE event_id % 17 = 0
      ), b AS (
        SELECT e.event_id, e.event_type, e.t, s.st AS bt
        FROM ev e ASOF LEFT JOIN snap s
          ON e.user_id = s.user_id AND e.t >= s.st
      ), f AS (
        SELECT e.event_id, s.st AS ft
        FROM ev e ASOF LEFT JOIN snap s
          ON e.user_id = s.user_id AND e.t <= s.st
      ), scored AS (
        SELECT b.event_type,
               CASE WHEN bt IS NULL AND ft IS NULL THEN NULL
                    WHEN bt IS NULL THEN ft - t
                    WHEN ft IS NULL THEN t - bt
                    WHEN ft - t < t - bt THEN ft - t
                    ELSE t - bt END AS nd,
               CASE WHEN bt IS NULL AND ft IS NULL THEN NULL
                    WHEN bt IS NULL THEN 'F'
                    WHEN ft IS NULL THEN 'B'
                    WHEN ft - t < t - bt THEN 'F'
                    ELSE 'B' END AS dir
        FROM b JOIN f ON b.event_id = f.event_id
      )
      SELECT event_type, count(*) AS n_events, count(nd) AS n_matched,
             CAST(sum(nd) AS BIGINT) AS sum_absdelta_us,
             CAST(sum(CASE WHEN dir = 'B' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_backward,
             CAST(sum(CASE WHEN dir = 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_forward
      FROM scored
      GROUP BY event_type
      ORDER BY event_type"""))

  val all: Seq[Q] = Seq(q39, q40, q87, q88, q314)
}
