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

  val all: Seq[Q] = Seq(q36)
}
