package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.{Det, Q}

/** Skew-handling join operators for the 100 TB path.
  *
  * A shuffled equi-join collapses each hot key onto one reducer; at
  * cluster scale one pathological key (the null user, the default town)
  * stalls the stage. Two standard remedies, both here:
  *  - AQE skew-join splitting (runtime, on by default in our sessions) —
  *    handles skew Spark can SEE after shuffles materialize;
  *  - explicit salting (this operator) — static, deterministic, and the
  *    only option when the join is keyed so hot that even AQE's split
  *    granularity (shuffle blocks) is too coarse.
  */
object Skew {

  /** Salted equi-join: the probe (fact) side derives a deterministic salt
    * in [0, nSalts) from `saltSource` (any well-distributed column — NOT
    * the join key); the build (dim) side is replicated nSalts×. Hot join
    * keys thus spread over nSalts reducers. Result set is identical to
    * `fact.join(dim, Seq(key))` — only the partitioning changes. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltSource: Column,
      nSalts: Int): DataFrame = {
    require(nSalts > 0)
    val salted = fact.withColumn("_salt", pmod(hash(saltSource), lit(nSalts)))
    val dimExploded = dim.withColumn(
      "_salt", explode(array((0 until nSalts).map(lit): _*)))
    salted.join(dimExploded, Seq(key, "_salt")).drop("_salt")
  }

  /** q36: salted join of the events fact against its own hot-user dim
    * (top-5 users by volume — the canonical skewed-key shape: the hottest
    * keys are BY CONSTRUCTION the most frequent). The oracle runs the
    * plain join — proving salting changes the shuffle layout, never the
    * result. */
  val q36 = Q(
    "q36_salted_join",
    (s, d) => {
      val ev = Tables.load(s, d, "events")
      val hotUsers = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("user_events"))
        .orderBy(desc("user_events"), col("user_id"))
        .limit(5)
      saltedJoin(ev, hotUsers, "user_id", col("event_id"), nSalts = 8)
        .groupBy(col("user_id"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          Det.dsum(col("value")).as("sum_value"),
          max(col("user_events")).as("user_events"))
        .orderBy(col("user_id"), col("event_type"))
    },
    Some(s"""
      WITH hot AS (
        SELECT user_id, count(*) AS user_events
        FROM events GROUP BY user_id
        ORDER BY user_events DESC, user_id LIMIT 5
      )
      SELECT e.user_id, e.event_type, count(*) AS n,
             ${Det.dsumSql("e.value")} AS sum_value,
             max(h.user_events) AS user_events
      FROM events e JOIN hot h ON e.user_id = h.user_id
      GROUP BY e.user_id, e.event_type
      ORDER BY e.user_id, e.event_type"""))

  /** Key-skew profile of one prospective join key: the operational
    * numbers that decide between a plain shuffle join, AQE skew
    * handling, and [[saltedJoin]] — key cardinality, hottest-key share,
    * p99-to-median frequency ratio, and the Gini coefficient of the
    * frequency distribution. Exactness: frequencies rank through
    * [[GlobalOrder.withOrderedCumsum]] (value = 1) in (freq, key) total
    * order — never a single-partition sort — and the Gini numerator
    * Σ(2i−K−1)·f_i stays in exact BIGINT until ONE final division;
    * p99/median are q115-style ceil-rank integer percentiles. */
  def keySkewProfile(
      df: org.apache.spark.sql.DataFrame,
      keyCol: String,
      label: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val freqs = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("f"))
    val ranked = GlobalOrder.withOrderedCumsum(
      freqs, Seq(col("f"), col("k")), lit(1L), "i")
    val stats = ranked.agg(
      max(col("i")).cast(LongType).as("n_keys"),
      sum(col("f")).as("n_rows"),
      max(col("f")).as("max_f"),
      // decimal accumulation: (2i−1)·f and its sum exceed 2^63 long
      // before any fixture does — exact at any K·N, cast back bounded
      sum((lit(2L) * col("i") - lit(1L))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))
        * col("f").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .cast(LongType).as("gini_raw"))
    val pct = ranked.crossJoin(broadcast(stats))
      .withColumn("is_med", col("i") === expr("(n_keys * 50 + 99) div 100"))
      .withColumn("is_p99", col("i") === expr("(n_keys * 99 + 99) div 100"))
      .filter(col("is_med") || col("is_p99"))
      .agg(
        max(when(col("is_med"), col("f"))).as("median_f"),
        max(when(col("is_p99"), col("f"))).as("p99_f"))
    stats.crossJoin(broadcast(pct))
      .select(
        lit(label).as("key"),
        col("n_keys"), col("n_rows"),
        (col("max_f").cast(DoubleType) / col("n_rows").cast(DoubleType))
          .as("top1_share"),
        (col("p99_f").cast(DoubleType) / col("median_f").cast(DoubleType))
          .as("p99_to_median"),
        ((col("gini_raw") - col("n_keys") * col("n_rows")).cast(DoubleType)
          / (col("n_keys") * col("n_rows")).cast(DoubleType)).as("gini"))
  }

  /** q37b-style SQL twin fragment for [[keySkewProfile]] over a table
    * with key column `k`: shared by the q159 oracle legs. */
  private def skewProfileSql(table: String, key: String, label: String) =
    s"""
      SELECT '$label' AS key, n_keys, n_rows,
             CAST(max_f AS DOUBLE) / CAST(n_rows AS DOUBLE) AS top1_share,
             CAST(p99_f AS DOUBLE) / CAST(median_f AS DOUBLE)
               AS p99_to_median,
             CAST(gini_raw - n_keys * n_rows AS DOUBLE)
               / CAST(n_keys * n_rows AS DOUBLE) AS gini
      FROM (
        SELECT CAST(max(i) AS BIGINT) AS n_keys,
               CAST(sum(f) AS BIGINT) AS n_rows,
               CAST(max(f) AS BIGINT) AS max_f,
               CAST(sum((2 * i - 1) * f) AS BIGINT) AS gini_raw
        FROM (SELECT f, row_number() OVER (ORDER BY f, k) AS i
              FROM (SELECT $key AS k, count(*) AS f FROM $table
                    GROUP BY 1))
      ) st, (
        SELECT max(CASE WHEN i = (n_keys * 50 + 99) // 100
                        THEN f END) AS median_f,
               max(CASE WHEN i = (n_keys * 99 + 99) // 100
                        THEN f END) AS p99_f
        FROM (SELECT f, row_number() OVER (ORDER BY f, k) AS i,
                     count(*) OVER () AS n_keys
              FROM (SELECT $key AS k, count(*) AS f FROM $table
                    GROUP BY 1))
      ) pc"""

  /** q159: join-key skew report over the two fact keys a planner would
    * actually probe — events.user_id and lineitem.l_partkey. The oracle
    * recomputes both profiles with window row_numbers; agreement proves
    * the distributed ordered-rank path (GlobalOrder) equals the naive
    * global-sort rank. */
  val q159 = Q(
    "q159_key_skew_profile",
    (s, d) => {
      val ev = keySkewProfile(
        Tables.load(s, d, "events"), "user_id", "events.user_id")
      val li = keySkewProfile(
        Tables.load(s, d, "lineitem"), "l_partkey", "lineitem.l_partkey")
      ev.unionAll(li).orderBy(col("key"))
    },
    Some(
      skewProfileSql("events", "user_id", "events.user_id") +
        "\n      UNION ALL\n" +
        skewProfileSql("lineitem", "l_partkey", "lineitem.l_partkey") +
        "\n      ORDER BY key"))

  /** q164: sketch-based join-cardinality estimation — the planner
    * statistic that prices a join WITHOUT running it: |A ⋈_k B| =
    * Σ_k f_A(k)·f_B(k), estimated by the inner product of the two
    * sides' count-min rows (AMS/CMS inner-product estimator, Cormode &
    * Muthukrishnan J.Alg'05 §4.2) — est_d = Σ_b cmsA[d][b]·cmsB[d][b],
    * upper-bounded min over the 4 rows. Pairs with [[keySkewProfile]]
    * (q159) as the pre-flight join toolkit: cardinality from KB-sized
    * mergeable state, skew from the rank profile. The q69/q122 md5
    * bucket convention makes every cell — and therefore the estimate —
    * bit-exact cross-engine; the true cardinality ships alongside so
    * the report carries its own error. Scale: each side folds to a
    * 4×256 matrix (per-key counts first, then bucket sums); the inner
    * product joins two 1024-row frames; only the ground-truth column
    * touches the actual join. */
  val q164 = Q(
    "q164_join_cardinality",
    (s, d) => {
      import org.apache.spark.sql.types.{DoubleType, LongType}
      import graft.queries.Q
      val dArr = "array(0, 1, 2, 3)"
      val bucketExpr =
        "(instr('0123456789abcdef', " +
          "substring(md5(concat(d, ':', k)), 1, 1)) - 1) * 16 + " +
          "(instr('0123456789abcdef', " +
          "substring(md5(concat(d, ':', k)), 2, 1)) - 1)"
      def cms(df: org.apache.spark.sql.DataFrame, keyCol: String) =
        df.select(col(keyCol).cast(LongType).as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("f"))
          .select(col("k"), col("f"), explode(expr(dArr)).as("d"))
          .withColumn("b", expr(bucketExpr))
          .groupBy(col("d"), col("b"))
          .agg(sum(col("f")).as("cnt"))
      val ev = Tables.load(s, d, "events")
      val ord = Tables.load(s, d, "orders")
      val est = cms(ev, "user_id").withColumnRenamed("cnt", "ca")
        .join(cms(ord, "o_custkey").withColumnRenamed("cnt", "cb"),
          Seq("d", "b"))
        .groupBy(col("d"))
        .agg(sum(col("ca") * col("cb")).as("est_d"))
        .agg(min(col("est_d")).as("cms_est"))
      val exact = ev.select(col("user_id"))
        .join(ord.select(col("o_custkey")),
          col("user_id") === col("o_custkey"))
        .agg(count(lit(1)).as("n_exact"))
      exact.crossJoin(broadcast(est))
        .select(col("n_exact"), col("cms_est"),
          ((col("cms_est") - col("n_exact")).cast(DoubleType)
            / col("n_exact").cast(DoubleType)).as("rel_overestimate"))
    },
    Some("""
      WITH ds AS (SELECT unnest(range(0, 4)) AS d),
      fa AS (
        SELECT user_id AS k, count(*) AS f FROM events GROUP BY 1
      ), fb AS (
        SELECT o_custkey AS k, count(*) AS f FROM orders GROUP BY 1
      ), ca AS (
        SELECT d,
               (strpos('0123456789abcdef',
                       substr(md5(CAST(d AS VARCHAR) || ':'
                         || CAST(k AS VARCHAR)), 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef',
                       substr(md5(CAST(d AS VARCHAR) || ':'
                         || CAST(k AS VARCHAR)), 2, 1)) - 1) AS b,
               CAST(sum(f) AS BIGINT) AS cnt
        FROM fa CROSS JOIN ds GROUP BY 1, 2
      ), cb AS (
        SELECT d,
               (strpos('0123456789abcdef',
                       substr(md5(CAST(d AS VARCHAR) || ':'
                         || CAST(k AS VARCHAR)), 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef',
                       substr(md5(CAST(d AS VARCHAR) || ':'
                         || CAST(k AS VARCHAR)), 2, 1)) - 1) AS b,
               CAST(sum(f) AS BIGINT) AS cnt
        FROM fb CROSS JOIN ds GROUP BY 1, 2
      ), est AS (
        SELECT CAST(min(est_d) AS BIGINT) AS cms_est FROM (
          SELECT ca.d, CAST(sum(ca.cnt * cb.cnt) AS BIGINT) AS est_d
          FROM ca JOIN cb ON ca.d = cb.d AND ca.b = cb.b
          GROUP BY 1)
      ), exact AS (
        SELECT count(*) AS n_exact
        FROM events JOIN orders ON user_id = o_custkey
      )
      SELECT n_exact, cms_est,
             CAST(cms_est - n_exact AS DOUBLE) / CAST(n_exact AS DOUBLE)
               AS rel_overestimate
      FROM exact, est"""))

  val all: Seq[Q] = Seq(q36, q159, q164)
}
