package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.queries.Q

/** Exact frequent-items (heavy hitters above a frequency threshold) with
  * Misra-Gries candidate pruning — the bounded-state alternative to a
  * full `groupBy(key).count` when the key domain is huge.
  *
  * At 100 TB a key column like a URL or token has billions of distinct
  * values; `groupBy.count` shuffles one row per distinct key per
  * partition even with map-side combine. But a threshold query — "every
  * key occurring in more than 1/T of all rows" — needs none of that
  * tail. The Misra-Gries summary (Misra & Gries 1982, "Finding repeated
  * elements"; the SpaceSaving/MG family surveyed in Cormode &
  * Hadjieleftheriou VLDB'08) guarantees with T counters an undercount of
  * at most n/(T+1), so any key with partition-local frequency >
  * n_p/(T+1) still holds a positive counter at partition end. By
  * pigeonhole, a key with GLOBAL frequency > N/(T+1) exceeds that local
  * bound in at least one partition, so the union of per-partition
  * summaries is a SUPERSET of the qualifying set. An exact recount of
  * just those ≤ T·numPartitions candidates (broadcast semi-join — the
  * long tail never shuffles) then filters to exactly the keys above
  * threshold: the pruning is lossless for the threshold query, and the
  * output is independent of partition layout (spec-pinned).
  *
  * This is the genuine per-partition imperative case the DataFrame API
  * can't express: bounded mutable state folded over a partition
  * iterator, emitting ≤ T rows per partition.
  */
object FrequentItems {

  /** Per-partition Misra-Gries summary keys of `ds`, ≤ counters rows per
    * input partition. Textbook MG: hit → increment; miss with free slot
    * → insert at 1; miss with full table → decrement all, drop zeros. */
  def mgCandidates(
      ds: Dataset[Long], counters: Int): Dataset[Long] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val counts = scala.collection.mutable.LongMap.empty[Long]
      it.foreach { k =>
        if (counts.contains(k)) counts(k) += 1L
        else if (counts.size < counters) counts(k) = 1L
        else {
          counts.mapValuesInPlace((_, v) => v - 1L)
          counts.filterInPlace((_, v) => v > 0L)
        }
      }
      counts.keysIterator
    }
  }

  /** All keys of `keyCol` with frequency strictly greater than
    * N/(counters+1), with their EXACT counts — MG candidate generation,
    * then an exact recount of candidates only. */
  def frequentItems(
      df: DataFrame, keyCol: String, counters: Int): DataFrame = {
    import df.sparkSession.implicits._
    val keys = df.select(col(keyCol).cast(LongType)).as[Long]
    val cands = mgCandidates(keys, counters)
      .toDF(keyCol).distinct()
    val total = df.agg(count(lit(1)).as("n_total"))
    df.join(broadcast(cands), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(counters + 1L) > col("n_total"))
  }

  /** q152: exact power users — every user generating more than 1/128 of
    * all events, with exact counts and share-of-total, via
    * [[frequentItems]] with T=127 counters (threshold N/128 — 15 of the
    * fixture's 150 users qualify at the sf0.01 gate; at sf0.1 the user
    * population scales with the data and the qualifying set is honestly
    * EMPTY, which both engines agree on). The ORACLE is the naive
    * global `GROUP BY user_id HAVING`, so a pass proves the MG pruning
    * is lossless — the differential-check-of-the-rewrite pattern (as
    * q137/q144 do for self-join rewrites). */
  val q152 = Q(
    "q152_frequent_items",
    (s, d) => {
      import org.apache.spark.sql.types.DoubleType
      val ev = Tables.load(s, d, "events").select(col("user_id"))
      frequentItems(ev, "user_id", counters = 127)
        .select(col("user_id"), col("cnt"),
          (col("cnt").cast(DoubleType) / col("n_total").cast(DoubleType))
            .as("share"))
        .orderBy(col("cnt").desc, col("user_id"))
    },
    Some("""
      WITH tot AS (SELECT count(*) AS n_total FROM events)
      SELECT user_id, count(*) AS cnt,
             CAST(count(*) AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
      FROM events, tot
      GROUP BY user_id, n_total
      HAVING count(*) * 128 > n_total
      ORDER BY cnt DESC, user_id"""))

  val all: Seq[Q] = Seq(q152)
}
