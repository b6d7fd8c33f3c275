package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Ingestion-transform operators (reference: README.md:143-199 — the
  * url()-CSV → typed-table transform block): regex field extraction, enum
  * decode via conditional chains (reference F8 `transform(...)`), boolean
  * derivation (F9 `b = 'Y'`), casts (F10), lenient multi-format date parsing
  * (F6 `parseDateTimeBestEffortUS`), and 1-based string splitting (F7
  * `splitByChar(' ', postcode)[1]`). Expressed over the events/documents
  * fixtures per FIXTURES.md §C.
  */
object IngestQ {

  /** Transform-on-read over events: JSON-ish field extract + enum decode +
    * boolean + lenient two-format date parse (even ids carry yyyy/MM/dd,
    * odd ids MM-dd-yyyy — the parse must try both, like
    * parseDateTimeBestEffortUS). */
  val q15 = Q(
    "q15_ingest_events",
    (s, d) => {
      val raw = Tables.load(s, d, "events")
        .withColumn(
          "date_str",
          when(
            col("event_id") % 2 === 0,
            date_format(col("ts"), "yyyy/MM/dd"))
            .otherwise(date_format(col("ts"), "MM-dd-yyyy")))
      raw.select(
        col("event_id"),
        when(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1) === "", null)
          .otherwise(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1))
          .cast(IntegerType).as("k"),
        when(col("event_type").isin("click", "view"), "interaction")
          .when(col("event_type").isin("purchase", "signup"), "conversion")
          .otherwise("other").as("category"),
        (col("value") >= 100.0).as("is_big"),
        floor(col("value")).cast(LongType).as("value_int"),
        coalesce(
          expr("try_to_timestamp(date_str, 'yyyy/MM/dd')"),
          expr("try_to_timestamp(date_str, 'MM-dd-yyyy')"))
          .cast(DateType).as("best_effort_date"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH raw AS (
        SELECT *,
               CASE WHEN event_id % 2 = 0 THEN strftime(ts, '%Y/%m/%d')
                    ELSE strftime(ts, '%m-%d-%Y') END AS date_str
        FROM events
      )
      SELECT event_id,
             CAST(nullif(regexp_extract(props, '"k":\s*(\d+)', 1), '')
                  AS INTEGER) AS k,
             CASE WHEN event_type IN ('click','view') THEN 'interaction'
                  WHEN event_type IN ('purchase','signup') THEN 'conversion'
                  ELSE 'other' END AS category,
             value >= 100.0 AS is_big,
             CAST(floor(value) AS BIGINT) AS value_int,
             CAST(coalesce(try_strptime(date_str, '%Y/%m/%d'),
                           try_strptime(date_str, '%m-%d-%Y'))
                  AS DATE) AS best_effort_date
      FROM raw
      ORDER BY event_id"""))

  /** Split / element_at / string ops over documents (reference F7/F11:
    * splitByChar + 1-based indexing, length profiling). element_at is
    * 1-based in Spark, matching both ClickHouse arrays and DuckDB lists. */
  val q16 = Q(
    "q16_ingest_documents",
    (s, d) =>
      Tables.load(s, d, "documents")
        .select(
          col("doc_id"),
          element_at(split(col("text"), " "), 1).as("first_word"),
          element_at(split(col("text"), " "), 2).as("second_word"),
          upper(col("lang")).as("lang_uc"),
          concat(col("lang"), lit(":"), col("source")).as("lang_source"),
          length(col("text")).as("text_len"),
          substring(col("text"), 1, 12).as("prefix12"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             string_split(text, ' ')[1] AS first_word,
             string_split(text, ' ')[2] AS second_word,
             upper(lang) AS lang_uc,
             lang || ':' || source AS lang_source,
             length(text) AS text_len,
             substr(text, 1, 12) AS prefix12
      FROM documents
      ORDER BY doc_id"""))

  /** q155: CDC apply — reconstruct the current state of a table from a
    * snapshot plus a change-data-capture log (inserts/updates/delete
    * tombstones) by last-writer-wins on a monotone sequence number: the
    * standard lakehouse pattern for landing Debezium-style feeds, and
    * the ordered sibling of q107's MERGE (which upserts ONE batch; CDC
    * replays MANY, so per-key ordering decides). The log is synthesized
    * deterministically from orders (update waves at seq 1 and 2 on key
    * classes, tombstones at seq 3), so update-then-delete and
    * double-update collisions all occur. Apply = one groupBy(key) with
    * max_by per column (seq is unique per key, so every max_by picks
    * the same winning row) — bounded per-key state, NO per-key sort
    * window; deletes drop after the reduce. Output is the per-status
    * reconciliation (row counts by winning seq + exact-cents total) a
    * CDC pipeline publishes after each apply. */
  /** Deterministic CDC log synthesized from orders (shared by q155 apply
    * and q165 SCD2 history): snapshot inserts at seq 0, update waves at
    * seq 1 (k%7) and 2 (k%21), delete tombstones at seq 3 (k%13) — so
    * double-update and update-then-delete collisions all occur. */
  private def cdcLog(s: org.apache.spark.sql.SparkSession, d: String) = {
    val base = Tables.load(s, d, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        Det.cents(col("o_totalprice")).as("c"))
    val snap = base.select(col("k"), col("st"), col("c"),
      lit(0L).as("seq"), lit("I").as("op"))
    val u1 = base.filter(col("k") % 7 === 0)
      .select(col("k"), col("st"), (col("c") + 1000L).as("c"),
        lit(1L).as("seq"), lit("U").as("op"))
    val u2 = base.filter(col("k") % 21 === 0)
      .select(col("k"), col("st"), (col("c") + 2000L).as("c"),
        lit(2L).as("seq"), lit("U").as("op"))
    val del = base.filter(col("k") % 13 === 0)
      .select(col("k"), col("st"), col("c"),
        lit(3L).as("seq"), lit("D").as("op"))
    snap.unionAll(u1).unionAll(u2).unionAll(del)
  }

  /** The CDC log's WHERE classes as oracle-SQL text (q155/q165 share it). */
  private val cdcLogSql = """
        SELECT k, st, c, CAST(0 AS BIGINT) AS seq, 'I' AS op FROM base
        UNION ALL
        SELECT k, st, c + 1000, 1, 'U' FROM base WHERE k % 7 = 0
        UNION ALL
        SELECT k, st, c + 2000, 2, 'U' FROM base WHERE k % 21 = 0
        UNION ALL
        SELECT k, st, c, 3, 'D' FROM base WHERE k % 13 = 0"""

  val q155 = Q(
    "q155_cdc_apply",
    (s, d) => {
      val applied = cdcLog(s, d)
        .groupBy(col("k"))
        .agg(
          max_by(col("st"), col("seq")).as("st"),
          max_by(col("c"), col("seq")).as("c"),
          max_by(col("op"), col("seq")).as("op"),
          max(col("seq")).as("seq"))
        .filter(col("op") =!= "D")
      applied.groupBy(col("st"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("seq") === 0L, 1L).otherwise(0L)).as("n_snapshot"),
          sum(when(col("seq") === 1L, 1L).otherwise(0L)).as("n_upd1"),
          sum(when(col("seq") === 2L, 1L).otherwise(0L)).as("n_upd2"),
          (sum(col("c")).cast(DoubleType) / lit(100.0)).as("sum_value"))
        .orderBy(col("st"))
    },
    Some(s"""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS st,
               CAST(round(o_totalprice * 100) AS BIGINT) AS c
        FROM orders
      ), log AS ($cdcLogSql
      ), applied AS (
        SELECT k, arg_max(st, seq) AS st, arg_max(c, seq) AS c,
               arg_max(op, seq) AS op, max(seq) AS seq
        FROM log GROUP BY k
      )
      SELECT st, count(*) AS n_rows,
             CAST(count(*) FILTER (seq = 0) AS BIGINT) AS n_snapshot,
             CAST(count(*) FILTER (seq = 1) AS BIGINT) AS n_upd1,
             CAST(count(*) FILTER (seq = 2) AS BIGINT) AS n_upd2,
             CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / 100 AS sum_value
      FROM applied
      WHERE op <> 'D'
      GROUP BY st
      ORDER BY st"""))

  /** q165: SCD2 dimension build — turn the q155 CDC log into a
    * slowly-changing-dimension TYPE-2 history table (Kimball SCD2: one
    * row per VERSION with a [valid_from, valid_to) interval, open
    * valid_to = current), the other half of the lakehouse CDC story:
    * q155 keeps only the latest state, q165 keeps every state with its
    * validity interval so point-in-time joins can ask "what did key k
    * look like at seq t". Build = one `lead(seq) OVER (PARTITION BY k
    * ORDER BY seq)` to close each version with its successor's start
    * (a DELETE closes the prior version but emits no version itself).
    * Per-key window partitions are bounded by the ops-per-key (≤4
    * here; update frequency generally), so no skewed window exists.
    * Output is the version census a dimension publisher reports:
    * per (version_seq, closed_by) counts + exact-cents totals, where
    * closed_by ∈ OPEN (current) / UPDATE / DELETE. The spec asserts
    * the SCD2 invariants (exactly one OPEN version per live key;
    * OPEN census == q155's applied state). */
  val q165 = Q(
    "q165_scd2_history",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("k")).orderBy(col("seq"))
      val versions = cdcLog(s, d)
        .withColumn("next_seq", lead(col("seq"), 1).over(w))
        .withColumn("next_op", lead(col("op"), 1).over(w))
        .filter(col("op") =!= "D")
        .withColumn("closed_by",
          when(col("next_seq").isNull, lit("OPEN"))
            .when(col("next_op") === "D", lit("DELETE"))
            .otherwise(lit("UPDATE")))
      versions.groupBy(col("seq").as("version_seq"), col("closed_by"))
        .agg(
          count(lit(1)).as("n_versions"),
          (sum(col("c")).cast(DoubleType) / lit(100.0)).as("sum_value"))
        .orderBy(col("version_seq"), col("closed_by"))
    },
    Some(s"""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS st,
               CAST(round(o_totalprice * 100) AS BIGINT) AS c
        FROM orders
      ), log AS ($cdcLogSql
      ), hist AS (
        SELECT k, c, seq, op,
               lead(seq) OVER (PARTITION BY k ORDER BY seq) AS next_seq,
               lead(op)  OVER (PARTITION BY k ORDER BY seq) AS next_op
        FROM log
      ), versions AS (
        SELECT k, c, seq,
               CASE WHEN next_seq IS NULL THEN 'OPEN'
                    WHEN next_op = 'D' THEN 'DELETE'
                    ELSE 'UPDATE' END AS closed_by
        FROM hist WHERE op <> 'D'
      )
      SELECT seq AS version_seq, closed_by, count(*) AS n_versions,
             CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / 100 AS sum_value
      FROM versions
      GROUP BY 1, 2
      ORDER BY version_seq, closed_by"""))

  /** q162: declarative data-contract validation — the dbt-style test
    * suite (not_null / unique / accepted_values / relationships /
    * range) run as ONE report: each contract is a counting aggregate
    * or anti-join over the table it guards, and the output is the
    * per-check violation ledger a pipeline gate reads before
    * publishing. Complements `operators/Audit` (zero-pass observe
    * metrics on a job's OWN scan) with cross-table checks a single
    * scan cannot see — FK orphans need the anti-join. Scale: each
    * check is one aggregate or one broadcast/shuffle anti-join;
    * checks are independent, so the union evaluates them in parallel
    * stages. The fixture's lineitem→orders FK is intentionally
    * reported as-found — contracts REPORT, they don't assume. */
  val q162 = Q(
    "q162_data_contracts",
    (s, d) => {
      def check(name: String, checked: org.apache.spark.sql.DataFrame,
          violations: org.apache.spark.sql.Column)
          : org.apache.spark.sql.DataFrame =
        checked.agg(
          count(lit(1)).as("n_checked"),
          sum(when(violations, 1L).otherwise(0L)).as("n_violations"))
          .select(lit(name).as("contract"), col("n_checked"),
            col("n_violations"))
      val orders = Tables.load(s, d, "orders")
      val li = Tables.load(s, d, "lineitem")
      def fkCheck(name: String, child: org.apache.spark.sql.DataFrame,
          childKey: String, parent: org.apache.spark.sql.DataFrame,
          parentKey: String): org.apache.spark.sql.DataFrame =
        child.select(col(childKey))
          .join(parent.select(col(parentKey)),
            col(childKey) === col(parentKey), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .crossJoin(broadcast(
            child.agg(count(lit(1)).as("n_checked"))))
          .select(lit(name).as("contract"), col("n_checked"),
            col("n_violations"))
      val fkLine = fkCheck(
        "lineitem.l_orderkey relationships orders",
        li, "l_orderkey", orders, "o_orderkey")
      val fkCust = fkCheck(
        "orders.o_custkey relationships customer",
        orders, "o_custkey", Tables.load(s, d, "customer"), "c_custkey")
      val uniq = orders
        .agg((count(lit(1)) - countDistinct(col("o_orderkey")))
          .as("n_violations"), count(lit(1)).as("n_checked"))
        .select(lit("orders.o_orderkey unique").as("contract"),
          col("n_checked"), col("n_violations"))
      val accepted = check(
        "events.event_type accepted_values",
        Tables.load(s, d, "events"),
        !col("event_type").isin("view", "click", "purchase", "signup",
          "error"))
      val range = check(
        "orders.o_totalprice positive",
        orders, col("o_totalprice") <= 0.0)
      val notNull = check(
        "documents.text not_null_nonempty",
        Tables.load(s, d, "documents"),
        col("text").isNull || length(col("text")) === 0)
      fkLine.unionAll(fkCust).unionAll(uniq).unionAll(accepted)
        .unionAll(range).unionAll(notNull)
        .orderBy(col("contract"))
    },
    Some("""
      SELECT 'lineitem.l_orderkey relationships orders' AS contract,
             (SELECT count(*) FROM lineitem) AS n_checked,
             (SELECT count(*) FROM lineitem
              WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
               AS n_violations
      UNION ALL
      SELECT 'orders.o_custkey relationships customer',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders
              WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
      UNION ALL
      SELECT 'orders.o_orderkey unique',
             (SELECT count(*) FROM orders),
             (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
      UNION ALL
      SELECT 'events.event_type accepted_values',
             (SELECT count(*) FROM events),
             (SELECT count(*) FROM events
              WHERE event_type NOT IN
                ('view', 'click', 'purchase', 'signup', 'error'))
      UNION ALL
      SELECT 'orders.o_totalprice positive',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
      UNION ALL
      SELECT 'documents.text not_null_nonempty',
             (SELECT count(*) FROM documents),
             (SELECT count(*) FROM documents
              WHERE text IS NULL OR length(text) = 0)
      ORDER BY contract"""))

  /** q246: POINT-IN-TIME join of a fact stream against the q165 SCD2
    * dimension — the query an SCD2 history exists to answer: "which
    * version of key k was current when THIS fact happened". q165 builds
    * and censuses the versions; this query actually joins facts to them.
    * Facts = lineitem rows stamped with a deterministic as-of time in
    * version-seq space, t = (l_orderkey + l_linenumber) % 5, covering
    * before-first-update, between-updates, and after-delete times.
    * The join is LEFT on the equi key with the validity interval in the
    * ON clause (valid_from <= t < valid_to, open valid_to = infinity):
    * Catalyst extracts the k = k conjunct, so this stays a hash/SMJ
    * equi-join with a residual interval filter — NOT a range join —
    * and the per-key version count is bounded by the update frequency
    * (<= 3 here), so the residual is O(versions-per-key) per probe.
    * Disjoint validity intervals per key guarantee at most one match,
    * so the left join is row-preserving: n_facts sums to count(lineitem)
    * across the report. A fact with no valid version (time past a
    * DELETE, or an FK-orphan key reported as-found, q162) lands in the
    * matched_seq = -1 bucket — point-in-time joins must surface those,
    * not drop them. At 100 TB: the dimension is the small side
    * (broadcastable); the fact side never shuffles more than its
    * equi-join requires. */
  val q246 = Q(
    "q246_scd2_pit_join",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("k")).orderBy(col("seq"))
      val versions = cdcLog(s, d)
        .withColumn("next_seq", lead(col("seq"), 1).over(w))
        .filter(col("op") =!= "D")
        .select(col("k"), col("seq"), col("next_seq"))
      val facts = Tables.load(s, d, "lineitem")
        .select(
          col("l_orderkey").as("fk"),
          ((col("l_orderkey") + col("l_linenumber")) % 5).as("t"),
          Det.cents(col("l_extendedprice")).as("fc"))
      facts
        .join(versions,
          col("fk") === col("k") && col("t") >= col("seq") &&
            (col("next_seq").isNull || col("t") < col("next_seq")),
          "left")
        .groupBy(col("t"), coalesce(col("seq"), lit(-1L)).as("matched_seq"))
        .agg(
          count(lit(1)).as("n_facts"),
          (sum(col("fc")).cast(DoubleType) / lit(100.0)).as("sum_value"))
        .orderBy(col("t"), col("matched_seq"))
    },
    Some(s"""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS st,
               ${Det.centsSql("o_totalprice")} AS c
        FROM orders
      ), log AS ($cdcLogSql
      ), hist AS (
        SELECT k, seq, op,
               lead(seq) OVER (PARTITION BY k ORDER BY seq) AS next_seq
        FROM log
      ), versions AS (
        SELECT k, seq, next_seq FROM hist WHERE op <> 'D'
      ), facts AS (
        SELECT l_orderkey AS fk,
               (l_orderkey + l_linenumber) % 5 AS t,
               ${Det.centsSql("l_extendedprice")} AS fc
        FROM lineitem
      )
      SELECT t, coalesce(v.seq, -1) AS matched_seq,
             count(*) AS n_facts,
             CAST(CAST(sum(fc) AS BIGINT) AS DOUBLE) / 100 AS sum_value
      FROM facts f LEFT JOIN versions v
        ON f.fk = v.k AND f.t >= v.seq
           AND (v.next_seq IS NULL OR f.t < v.next_seq)
      GROUP BY 1, 2
      ORDER BY t, matched_seq"""))

  /** q289: BITEMPORAL POINT-IN-TIME — the two-clock query (Snodgrass /
    * SQL:2011 system-versioned + application-time tables) that completes
    * the temporal family: q165's SCD2 tracks VALID time, q248's
    * snapshots track TRANSACTION time; real warehouses need both at
    * once, because data about the past keeps ARRIVING ("as of June 15
    * last year, as we knew it at commit T"). The ledger is synthesized
    * deterministically from orders: every order is effective for one
    * year from its order date (tx 1); a correction wave restates k%5
    * amounts (+5.00) for the SAME validity interval at tx 2 (closing
    * the original's transaction interval — corrections never destroy
    * what was previously believed); a late BACKFILL wave at tx 3
    * inserts half-value records for the year BEFORE each k%11 order
    * date (retroactive valid time — the bitemporal signature: the past
    * changes as knowledge arrives, and only the transaction axis shows
    * it). The query evaluates the full (as-known-at × as-of) grid; the
    * answers for the SAME valid date differ across transaction times
    * exactly where corrections/backfills landed. Dates are pure
    * yyyymmdd integers (no calendar arithmetic to diverge), pivots are
    * fixture-derived (de-calibration rule), money is exact cents.
    * Scale: one scan builds the ledger; the grid is a 6-row broadcast;
    * at 100 TB a bitemporal ask is ONE predicate pair per axis —
    * intervals make it a scan problem, never a replay problem. */
  val q289 = Q(
    "q289_bitemporal",
    (s, d) => {
      val base = Tables.load(s, d, "orders")
        .select(col("o_orderkey").as("k"),
          (year(col("o_orderdate")) * 10000
            + month(col("o_orderdate")) * 100
            + dayofmonth(col("o_orderdate"))).cast(LongType).as("vf"),
          Det.cents(col("o_totalprice")).as("c"))
      val original = base.select(col("k"), col("c"),
        col("vf"), (col("vf") + 10000L).as("vt"),
        lit(1L).as("txf"),
        when(col("k") % 5 === 0, 2L).otherwise(lit(null).cast(LongType))
          .as("txt"))
      val correction = base.filter(col("k") % 5 === 0)
        .select(col("k"), (col("c") + 500L).as("c"),
          col("vf"), (col("vf") + 10000L).as("vt"),
          lit(2L).as("txf"), lit(null).cast(LongType).as("txt"))
      val backfill = base.filter(col("k") % 11 === 0)
        .select(col("k"), expr("c div 2").as("c"),
          (col("vf") - 10000L).as("vf"), col("vf").as("vt"),
          lit(3L).as("txf"), lit(null).cast(LongType).as("txt"))
      val py = base.agg((max(expr("vf div 10000")) - 1L).as("py"))
      original.unionAll(correction).unionAll(backfill)
        .crossJoin(broadcast(py))
        .withColumn("t_asof", explode(array(lit(1L), lit(2L), lit(3L))))
        .withColumn("v_label", explode(array(lit("mid"), lit("old"))))
        .withColumn("v_date",
          when(col("v_label") === "mid", col("py") * 10000L + 615L)
            .otherwise((col("py") - 2L) * 10000L + 615L))
        .filter(col("txf") <= col("t_asof") &&
          (col("txt").isNull || col("txt") > col("t_asof")) &&
          col("vf") <= col("v_date") && col("v_date") < col("vt"))
        .groupBy(col("t_asof"), col("v_label"), col("v_date"))
        .agg(count(lit(1)).as("n_rows"),
          (sum(col("c")).cast(DoubleType) / lit(100.0)).as("sum_value"))
        .orderBy(col("t_asof"), col("v_label"))
    },
    Some(s"""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(EXTRACT(year FROM o_orderdate) * 10000
                    + EXTRACT(month FROM o_orderdate) * 100
                    + EXTRACT(day FROM o_orderdate) AS BIGINT) AS vf,
               ${Det.centsSql("o_totalprice")} AS c
        FROM orders
      ), ledger AS (
        SELECT k, c, vf, vf + 10000 AS vt, CAST(1 AS BIGINT) AS txf,
               CASE WHEN k % 5 = 0 THEN CAST(2 AS BIGINT) END AS txt
        FROM base
        UNION ALL
        SELECT k, c + 500, vf, vf + 10000, 2, NULL FROM base WHERE k % 5 = 0
        UNION ALL
        SELECT k, c // 2, vf - 10000, vf, 3, NULL FROM base WHERE k % 11 = 0
      ), py AS (
        SELECT max(vf // 10000) - 1 AS py FROM base
      ), grid AS (
        SELECT t_asof, v_label,
               CASE WHEN v_label = 'mid' THEN py * 10000 + 615
                    ELSE (py - 2) * 10000 + 615 END AS v_date
        FROM (VALUES (CAST(1 AS BIGINT)), (2), (3)) t(t_asof),
             (VALUES ('mid'), ('old')) v(v_label), py
      )
      SELECT t_asof, v_label, v_date, count(*) AS n_rows,
             CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / 100 AS sum_value
      FROM ledger, grid
      WHERE txf <= t_asof AND (txt IS NULL OR txt > t_asof)
        AND vf <= v_date AND v_date < vt
      GROUP BY t_asof, v_label, v_date
      ORDER BY t_asof, v_label"""))

  /** q297: FULL TRI-CLAUSE MERGE — SQL:2023 MERGE with all three match
    * directions, including the WHEN NOT MATCHED BY SOURCE clause q107's
    * upsert lacks (the clause that lets one statement also retire
    * target rows the source no longer mentions — the shape a
    * full-snapshot feed needs, where absence IS the delete signal).
    * Spark has no MERGE executor for plain parquet, so this is the
    * Spark-FIRST expression every lakehouse engine compiles MERGE down
    * to anyway: ONE full outer join on the key, then a CASE deciding
    * update / delete / insert / retire / keep per row. The source is a
    * deterministic change feed (updates for k%3=0, deletes for k%9=0
    * among them, 100 brand-new keys past the key span; retention
    * retires unmentioned k%5=4 rows). Output is the per-action census
    * (rows + exact cents entering or leaving the table) a MERGE commits
    * to its audit log. Scale: MERGE cost IS this join — key-partitioned
    * shuffle, map-side-combined census, broadcast when the feed is
    * small; the census makes the statement self-verifying (the spec
    * reconciles final state = target + inserts − deletes − retires). */
  val q297 = Q(
    "q297_merge_full",
    (s, d) => {
      val target = Tables.load(s, d, "orders")
        .select(col("o_orderkey").as("k"),
          Det.cents(col("o_totalprice")).as("c"))
      val mxF = target.agg(max(col("k")).as("mx"))
      val updates = target.filter(col("k") % 3 === 0)
        .select(col("k"), (col("c") + 1000L).as("sc"))
      val inserts = s.range(1, 101).toDF("i")
        .crossJoin(broadcast(mxF))
        .select((col("mx") + col("i")).as("k"),
          ((col("mx") + col("i")) * 10L).as("sc"))
      val source = updates.unionAll(inserts)
      val merged = target.as("t")
        .join(source.as("src"), col("t.k") === col("src.k"), "full_outer")
        .select(
          coalesce(col("t.k"), col("src.k")).as("k"),
          col("t.c").as("tc"), col("src.sc").as("sc"),
          when(col("t.k").isNotNull && col("src.k").isNotNull &&
            col("t.k") % 9 === 0, "DELETE")
            .when(col("t.k").isNotNull && col("src.k").isNotNull, "UPDATE")
            .when(col("t.k").isNull, "INSERT")
            .when(col("t.k") % 5 === 4, "RETIRE")
            .otherwise("KEEP").as("action"))
        .withColumn("out_c",
          when(col("action") === "UPDATE", col("sc"))
            .when(col("action") === "INSERT", col("sc"))
            .when(col("action") === "KEEP", col("tc"))
            .otherwise(col("tc"))) // DELETE/RETIRE report removed cents
      merged.groupBy(col("action"))
        .agg(count(lit(1)).as("n_rows"),
          (sum(col("out_c")).cast(DoubleType) / lit(100.0)).as("sum_value"))
        .orderBy(col("action"))
    },
    Some(s"""
      WITH target AS (
        SELECT o_orderkey AS k, ${Det.centsSql("o_totalprice")} AS c
        FROM orders
      ), mx AS (
        SELECT max(k) AS mx FROM target
      ), source AS (
        SELECT k, c + 1000 AS sc FROM target WHERE k % 3 = 0
        UNION ALL
        SELECT mx + i, (mx + i) * 10
        FROM range(1, 101) t(i), mx
      ), merged AS (
        SELECT coalesce(t.k, src.k) AS k, t.c AS tc, src.sc,
               CASE
                 WHEN t.k IS NOT NULL AND src.k IS NOT NULL
                      AND t.k % 9 = 0 THEN 'DELETE'
                 WHEN t.k IS NOT NULL AND src.k IS NOT NULL THEN 'UPDATE'
                 WHEN t.k IS NULL THEN 'INSERT'
                 WHEN t.k % 5 = 4 THEN 'RETIRE'
                 ELSE 'KEEP' END AS action
        FROM target t FULL OUTER JOIN source src ON t.k = src.k
      )
      SELECT action, count(*) AS n_rows,
             CAST(CAST(sum(CASE WHEN action IN ('UPDATE', 'INSERT')
                  THEN sc ELSE tc END) AS BIGINT) AS DOUBLE) / 100
               AS sum_value
      FROM merged
      GROUP BY action
      ORDER BY action"""))

  /** q300: POINT-IN-TIME FEATURE MATERIALIZATION — the feature-store
    * read path that decides whether a trained model is honest: every
    * training row (one per order) may see only what existed STRICTLY
    * BEFORE its own event time, or the model trains on the future
    * (label leakage — the classic silent ML failure; Feast/Tecton call
    * this the point-in-time-correct join). Features per order: the
    * customer's prior order count, prior spend, and days since their
    * previous order — all from ONE exclusive window frame
    * (rowsBetween(unboundedPreceding, -1) over (date, key) — the -1 IS
    * the leak guard; the key tiebreak makes same-day orders see a
    * deterministic strict order). Output is the per-prior-count
    * learning-curve census (support + exact-decimal mean label) a
    * feature-quality report publishes. Scale: one shuffle by customer,
    * bounded per-key frames — the same bill as any running total; no
    * self-join, no per-row subquery. */
  val q300 = Q(
    "q300_feature_pit",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("cust"))
        .orderBy(col("od"), col("k"))
      val wx = w.rowsBetween(Window.unboundedPreceding, -1)
      val feats = Tables.load(s, d, "orders")
        .select(col("o_orderkey").as("k"), col("o_custkey").as("cust"),
          (year(col("o_orderdate")) * 10000
            + month(col("o_orderdate")) * 100
            + dayofmonth(col("o_orderdate"))).cast(LongType).as("od"),
          unix_date(to_date(col("o_orderdate"))).cast(LongType).as("odays"),
          Det.cents(col("o_totalprice")).as("label_c"))
        .withColumn("prior_cnt", count(lit(1)).over(wx))
        .withColumn("prior_spend", coalesce(sum(col("label_c")).over(wx),
          lit(0L)))
        .withColumn("days_since",
          coalesce(col("odays") - lag(col("odays"), 1).over(w), lit(-1L)))
      feats
        .groupBy(least(col("prior_cnt"), lit(8L)).as("prior_bucket"))
        .agg(count(lit(1)).as("n_rows"),
          (sum(col("label_c")).cast(DoubleType) / count(lit(1))
            / lit(100.0)).as("mean_label"),
          (sum(col("prior_spend")).cast(DoubleType) / count(lit(1))
            / lit(100.0)).as("mean_prior_spend"),
          sum(when(col("days_since") >= 0, 1L).otherwise(0L))
            .as("n_with_history"))
        .orderBy(col("prior_bucket"))
    },
    Some(s"""
      WITH feats AS (
        SELECT o_orderkey AS k, o_custkey AS cust,
               ${Det.centsSql("o_totalprice")} AS label_c,
               count(*) OVER wx AS prior_cnt,
               coalesce(sum(${Det.centsSql("o_totalprice")}) OVER wx, 0)
                 AS prior_spend,
               coalesce(
                 CAST(date_diff('day',
                   lag(CAST(o_orderdate AS DATE)) OVER w,
                   CAST(o_orderdate AS DATE)) AS BIGINT), -1)
                 AS days_since
        FROM orders
        WINDOW
          w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
          wx AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      )
      SELECT least(prior_cnt, 8) AS prior_bucket, count(*) AS n_rows,
             CAST(CAST(sum(label_c) AS BIGINT) AS DOUBLE) / count(*) / 100
               AS mean_label,
             CAST(CAST(sum(prior_spend) AS BIGINT) AS DOUBLE) / count(*)
               / 100 AS mean_prior_spend,
             CAST(sum(CASE WHEN days_since >= 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_with_history
      FROM feats
      GROUP BY 1
      ORDER BY prior_bucket"""))

  /** q313: INFERRED DIMENSION MEMBERS (early-arriving facts — the
    * Kimball pattern SCD q165 and PIT q246 don't cover): facts land
    * BEFORE their dimension row exists, so the load phase manufactures
    * an inferred stub (surrogate intact, attributes unknown) rather than
    * dropping or quarantining revenue; when the real member arrives in a
    * later dim delivery, the stub resolves IN PLACE and history restates.
    * Dosed: dim-v1 = customers with custkey % 3 ≠ 0 (v2 = everyone), so
    * a third of order revenue books against stubs first. The census per
    * RESOLVED nation shows what the restatement moved: order/revenue
    * totals split by whether the fact originally joined a stub — and
    * nation −1 (the stub bucket) must be GONE after v2, which the
    * all-nations-≥0 output proves in data. Exact cents throughout.
    * Scale: two broadcast-dim left joins; the fact table is scanned
    * once per phase and never self-joined. */
  val q313 = Q(
    "q313_inferred_member",
    (s, d) => {
      val cust = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey").cast(LongType)
          .as("nation"))
      val dimV1 = cust.filter(col("c_custkey") % 3 =!= 0)
      val facts = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          Det.cents(col("o_totalprice")).as("rev_c"))
      val phase1 = facts
        .join(broadcast(dimV1), col("o_custkey") === col("c_custkey"),
          "left")
        .select(col("o_orderkey"), col("o_custkey"), col("rev_c"),
          coalesce(col("nation"), lit(-1L)).as("nation_v1"),
          col("nation").isNull.as("was_inferred"))
      phase1
        .join(broadcast(cust.withColumnRenamed("c_custkey", "k2")),
          col("o_custkey") === col("k2"))
        .groupBy(col("nation"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("was_inferred"), 1L).otherwise(0L))
            .as("n_was_inferred"),
          sum(col("rev_c")).as("rev_c"),
          sum(when(col("was_inferred"), col("rev_c")).otherwise(0L))
            .as("rev_was_inferred_c"))
        .orderBy(col("nation"))
    },
    Some(s"""
      WITH dim_v1 AS (
        SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation
        FROM customer WHERE c_custkey % 3 <> 0
      ), facts AS (
        SELECT o_orderkey, o_custkey,
               ${Det.centsSql("o_totalprice")} AS rev_c
        FROM orders
      ), phase1 AS (
        SELECT f.o_orderkey, f.o_custkey, f.rev_c,
               coalesce(d.nation, -1) AS nation_v1,
               d.nation IS NULL AS was_inferred
        FROM facts f LEFT JOIN dim_v1 d ON f.o_custkey = d.c_custkey
      )
      SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
             count(*) AS n_orders,
             CAST(sum(CASE WHEN p.was_inferred THEN 1 ELSE 0 END)
               AS BIGINT) AS n_was_inferred,
             CAST(sum(p.rev_c) AS BIGINT) AS rev_c,
             CAST(sum(CASE WHEN p.was_inferred THEN p.rev_c ELSE 0 END)
               AS BIGINT) AS rev_was_inferred_c
      FROM phase1 p JOIN customer c ON p.o_custkey = c.c_custkey
      GROUP BY 1
      ORDER BY nation"""))

  /** q325: QUARANTINE-AND-REPROCESS ROUTING — the dead-letter half of
    * data contracts (q162 detects; this one DISPOSES): every row is
    * routed exactly once by a FIRST-MATCH reason chain — missing value
    * → quarantine, unknown event type → quarantine, out-of-range →
    * quarantine, negative-but-fixable → REPAIRED (sign flip) and
    * re-admitted with its repair labeled, clean → accepted. The reason
    * order is part of the contract (a row can violate several rules;
    * both engines evaluate the same CASE chain so the census is
    * deterministic). Dosed violations on disjoint-enough id residues
    * (11/13/17/19) so every route carries traffic. Money totals of the
    * ADMITTED payload (accepted + repaired) use exact decimal sums.
    * Scale: a single scan with a column program — routing never joins;
    * the quarantine table is the small side by construction. */
  val q325 = Q(
    "q325_quarantine_reprocess",
    (s, d) => {
      val routed = Tables.load(s, d, "events")
        .withColumn("raw_value",
          when(col("event_id") % 17 === 0, lit(null).cast(DoubleType))
            .when(col("event_id") % 11 === 0, -col("value"))
            .when(col("event_id") % 13 === 0, col("value") + 20000)
            .otherwise(col("value")))
        .withColumn("etype",
          when(col("event_id") % 19 === 0, lit("zzz_unknown"))
            .otherwise(col("event_type")))
        .withColumn("disposition",
          when(col("raw_value").isNull, "quarantine:missing")
            .when(col("etype") === "zzz_unknown", "quarantine:unknown_type")
            .when(col("raw_value") > 10000, "quarantine:out_of_range")
            .when(col("raw_value") < 0, "repaired:sign_flip")
            .otherwise("accepted"))
        .withColumn("final_value",
          when(col("disposition") === "accepted", col("raw_value"))
            .when(col("disposition") === "repaired:sign_flip",
              -col("raw_value")))
      routed
        .groupBy(col("disposition"))
        .agg(
          count(lit(1)).as("n"),
          Det.dsum(col("final_value")).as("sum_admitted"))
        .orderBy(col("disposition"))
    },
    Some(s"""
      WITH routed AS (
        SELECT *,
          CASE WHEN raw_value IS NULL THEN 'quarantine:missing'
               WHEN etype = 'zzz_unknown' THEN 'quarantine:unknown_type'
               WHEN raw_value > 10000 THEN 'quarantine:out_of_range'
               WHEN raw_value < 0 THEN 'repaired:sign_flip'
               ELSE 'accepted' END AS disposition
        FROM (
          SELECT event_id,
                 CASE WHEN event_id % 17 = 0 THEN NULL
                      WHEN event_id % 11 = 0 THEN -value
                      WHEN event_id % 13 = 0 THEN value + 20000
                      ELSE value END AS raw_value,
                 CASE WHEN event_id % 19 = 0 THEN 'zzz_unknown'
                      ELSE event_type END AS etype
          FROM events) dosed
      )
      SELECT disposition, count(*) AS n,
             ${Det.dsumSql("""CASE
               WHEN disposition = 'accepted' THEN raw_value
               WHEN disposition = 'repaired:sign_flip' THEN -raw_value
               END""")} AS sum_admitted
      FROM routed
      GROUP BY disposition
      ORDER BY disposition"""))

  val all: Seq[Q] =
    Seq(q15, q16, q155, q162, q165, q246, q289, q297, q300, q313, q325)
}
