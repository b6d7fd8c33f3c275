package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale-safe global ordering primitives: a deterministic md5-shuffled
  * total order plus a running sum over it, WITHOUT ever collapsing the
  * data into a single-partition window. The shape: range-partition by
  * the shuffle key (so partition i holds a contiguous key range), one
  * cumulative-sum window per partition, and a partition-count-sized
  * offsets table (bounded, broadcast) bridging partitions. Shared by
  * q79 (global shuffle positions, value = 1) and q90 (global token
  * cumsum for sequence packing).
  */
object GlobalOrder {

  /** Adds `outCol` = inclusive global running sum of `value` in the
    * total order given by `order` (which MUST be a full tiebreak — a
    * non-total order makes the cumsum partition-placement-dependent).
    * Mechanics: range-repartition on the order, per-partition ROWS
    * cumsum, partition-count-sized broadcast offsets bridging
    * partitions — never a single-partition window. */
  def withOrderedCumsum(
      df: DataFrame,
      order: Seq[Column],
      value: Column,
      outCol: String,
      pidCol: String = "_graft_oc_pid"): DataFrame = {
    import graft.Caches.Tracked
    val vCol = s"${pidCol}_v"
    val sorted = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(pidCol, spark_partition_id())
      .withColumn(vCol, value.cast(LongType))
      .persistTracked()
    val offsets = sorted.groupBy(col(pidCol))
      .agg(sum(col(vCol)).as("ptot"))
      .withColumn(
        "offset",
        coalesce(
          sum(col("ptot")).over(
            Window.orderBy(col(pidCol))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(pidCol), col("offset"))
    sorted
      .withColumn(
        "_graft_cumin",
        sum(col(vCol)).over(
          Window.partitionBy(col(pidCol))
            .orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(offsets), Seq(pidCol))
      .withColumn(outCol, (col("offset") + col("_graft_cumin")).cast(LongType))
      .drop(pidCol, vCol, "_graft_cumin", "offset")
  }

  /** Adds `outCol` = EXCLUSIVE global running MAX of `value` in the
    * total order given by `order` (max over all strictly-earlier rows;
    * the first row gets Long.MinValue). Same range-partition shape as
    * [[withOrderedCumsum]] with max in place of sum: per-partition
    * exclusive-prefix-max window + a partition-count-sized broadcast
    * offsets table carrying each partition's predecessor max — never a
    * single-partition window. The primitive behind skyline/frontier
    * pruning (q194): "is any earlier-in-order row at least this high?"
    *
    * REQUIRES DISTINCT `order` KEYS (asserted at runtime; set
    * `spark.graft.cummax.assertDistinctOrder=false` to skip the check
    * when distinctness is proven upstream). With duplicate keys the result is
    * partition-placement-dependent: a tied row that range-partitions
    * into a LATER partition is counted by the broadcast offset as
    * strictly earlier, while a tied row in the SAME partition is
    * excluded by the rows-based exclusive frame — so ties see each
    * other or not depending on where the range splitter cuts. Callers
    * must collapse to one row per order key first (q194 does, via its
    * per-quantity-class groupBy); a rangeBetween frame would instead
    * have to exclude ALL equal-key rows, changing the semantics. */
  def withOrderedCummax(
      df: DataFrame,
      order: Seq[Column],
      value: Column,
      outCol: String,
      pidCol: String = "_graft_cm_pid",
      // a caller whose IMMEDIATE upstream proves distinctness (q194's
      // groupBy on the order key) passes false and skips the O(input)
      // check; new callers get the guard by default
      assertDistinct: Boolean = true): DataFrame = {
    import graft.Caches.Tracked
    val vCol = s"${pidCol}_v"
    val sorted = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(pidCol, spark_partition_id())
      .withColumn(vCol, value.cast(LongType))
      .persistTracked()
    // API-trap guard (r5 advice): enforce the distinct-keys contract at
    // runtime, not just in the docstring. Probes the already-PERSISTED
    // frame (r6 advice: the first guard grouped the raw input, re-running
    // an un-cached upstream lineage once per call), and does it WITHOUT a
    // groupBy — grouping the cached desc-range-partitioned frame trips
    // Spark 4.1's EnsureRequirements (SortOrder ClassCastException).
    // Instead it exploits the frame's own invariant: `sorted` is
    // range-partitioned AND sorted within partitions on the order keys
    // (equal keys land in one partition — RangePartitioning assigns by
    // key value), so any duplicate is ADJACENT; one shuffle-free
    // adjacent-equality scan over the cache finds it. Cost model: one
    // extra cache scan per call, zero shuffles, zero upstream recompute;
    // the flag lets a caller that proved distinctness upstream (q194's
    // groupBy) skip even that.
    if (assertDistinct && df.sparkSession.conf
        .get("spark.graft.cummax.assertDistinctOrder", "true").toBoolean) {
      // strip SortOrder wrappers (col.desc) — projected keys must be bare
      val keys = order.map(org.apache.spark.sql.graftbridge.stripSortOrder)
      val hasDup = !sorted.select(keys: _*).rdd
        .mapPartitions { it =>
          var prev: org.apache.spark.sql.Row = null
          var found = false
          while (it.hasNext && !found) {
            val r = it.next()
            if (prev != null && r == prev) found = true
            prev = r
          }
          if (found) Iterator.single(true) else Iterator.empty
        }
        .isEmpty()
      require(!hasDup,
        "withOrderedCummax requires DISTINCT order keys: ties make the " +
          "exclusive prefix max partition-placement-dependent — collapse " +
          "to one row per order key first (q194 does)")
    }
    val offsets = sorted.groupBy(col(pidCol))
      .agg(max(col(vCol)).as("pmax"))
      .withColumn(
        "offset",
        coalesce(
          max(col("pmax")).over(
            Window.orderBy(col(pidCol))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(Long.MinValue)))
      .select(col(pidCol), col("offset"))
    sorted
      .withColumn(
        "_graft_maxin",
        coalesce(
          max(col(vCol)).over(
            Window.partitionBy(col(pidCol))
              .orderBy(order: _*)
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(Long.MinValue)))
      .join(broadcast(offsets), Seq(pidCol))
      .withColumn(outCol, greatest(col("offset"), col("_graft_maxin")))
      .drop(pidCol, vCol, "_graft_maxin", "offset")
  }

  /** Adds `outCol` = the PREVIOUS row's `value` in the total order given
    * by `order` (a global LAG(1); null for the global first row). Same
    * range-partitioned shape as [[withOrderedCumsum]]: per-partition lag
    * plus a partition-count-sized broadcast table carrying each
    * partition's LAST value, which fills the first row of the next
    * non-empty partition — never a single-partition window. `order` must
    * be a full tiebreak, and `value` must be NON-NULL (an interior null
    * would be indistinguishable from "first row of partition" to the
    * coalesce that bridges partitions). The primitive behind
    * value-spacing readouts (q340's Wasserstein integral: gap to the
    * previous distinct value). */
  def withOrderedLag(
      df: DataFrame,
      order: Seq[Column],
      value: Column,
      outCol: String,
      pidCol: String = "_graft_lg_pid"): DataFrame = {
    import graft.Caches.Tracked
    val vCol = s"${pidCol}_v"
    val sorted = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(pidCol, spark_partition_id())
      .withColumn(vCol, value.cast(LongType))
      .persistTracked()
    // pid → that partition's last value (max_by over the order tuple —
    // an Aggregate, so the pid-ordered bare lag window below stays on an
    // aggregate-bounded frame, the PlanShapeSpec structural contract);
    // lag over the PRESENT pids gives each partition the nearest
    // NON-EMPTY predecessor's last value. `order` must be bare ascending
    // columns (struct ordering is lexicographic by field).
    val offsets = sorted
      .groupBy(col(pidCol))
      .agg(max_by(col(vCol), struct(order: _*)).as("plast"))
      .withColumn("prev_last",
        lag(col("plast"), 1).over(Window.orderBy(col(pidCol))))
      .select(col(pidCol), col("prev_last"))
    sorted
      .withColumn(
        "_graft_lagin",
        lag(col(vCol), 1).over(
          Window.partitionBy(col(pidCol)).orderBy(order: _*)))
      .join(broadcast(offsets), Seq(pidCol))
      .withColumn(outCol, coalesce(col("_graft_lagin"), col("prev_last")))
      .drop(pidCol, vCol, "_graft_lagin", "prev_last")
  }

  /** The exact ANSI NTILE(k) bucket for a 1-based global rank `rk` out
    * of `n` rows (both Long columns): the first n mod k buckets hold
    * ⌈n/k⌉ rows, the rest ⌊n/k⌋ — pure integer arithmetic, identical to
    * every ANSI engine's native ntile. Pairs with [[withOrderedCumsum]]
    * (value = 1) to express a corpus-wide NTILE without the
    * single-partition sort the window form requires. */
  def ntileFromRank(rk: Column, n: Column, k: Int): Column = {
    // exact integer division: (a - a mod b) is exactly divisible, so the
    // double division is exact for any quotient < 2^53 (Column./ has no
    // integral form; `a div b` exists only as a SQL operator)
    def idiv(a: Column, b: Column): Column =
      ((a - a.mod(b)) / b).cast(LongType)
    val q = idiv(n, lit(k.toLong))
    val r = n.mod(lit(k.toLong))
    when(rk <= (q + 1) * r, idiv(rk - 1, q + 1) + 1)
      .otherwise(r + idiv(rk - 1 - (q + 1) * r, q) + 1)
  }

  /** Adds `outCol` = inclusive global running sum of `value` in the total
    * order md5(prefix:idCol) then idCol, plus the shuffle key as
    * `keyCol` for callers that sort by it downstream. The input is
    * range-repartitioned on that order. */
  def withGlobalCumsum(
      df: DataFrame,
      idCol: String,
      prefix: String,
      value: Column,
      outCol: String,
      keyCol: String = "_graft_k"): DataFrame =
    withOrderedCumsum(
      df.withColumn(
        keyCol, md5(concat(lit(s"$prefix:"), col(idCol).cast("string")))),
      Seq(col(keyCol), col(idCol)),
      value, outCol, pidCol = s"${keyCol}_pid")
}
