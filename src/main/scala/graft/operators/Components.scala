package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation with pointer
  * halving — the clustering step that turns near-dup PAIR lists into
  * dedup groups (q68), usable for any undirected graph expressed as
  * DataFrames. Per round: one join + one aggregate shuffle over the edge
  * set plus a label-map self-join; pointer halving (follow your label to
  * ITS label) gives O(log n)-round convergence on chains — the
  * MapReduce-CC recipe of Kiveris et al. (MR'14 "Connected Components in
  * MapReduce and Beyond"). Driver state is one convergence counter per
  * round, never the graph.
  *
  * Every round localCheckpoints its labels: iterative plans must TRUNCATE
  * lineage, not just cache it — each round's plan embeds the previous
  * round's twice (the halving self-join), so with persist alone catalyst
  * re-analyzes a plan that doubles per round (this cost q68 190 s at
  * sf0.1 before the fix; 8 s after). On a cluster, reliable checkpoints
  * would replace localCheckpoint for fault tolerance; same algorithm.
  */
object Components {

  /** Labels every node with the MINIMUM node id of its connected
    * component — the unique fixpoint, independent of round count or
    * partitioning.
    *
    * @param nodes one column: node id (numeric or orderable)
    * @param pairs two columns: one row per undirected edge, either
    *              orientation; endpoints must appear in `nodes`
    * @return columns (id, lbl): node id → component min id
    */
  def connectedComponents(
      nodes: DataFrame,
      pairs: DataFrame,
      maxRounds: Int = 32,
      tag: String = "cc"): DataFrame = {
    val debug = sys.env.contains("SPARK_GRAFT_DEBUG")
    val p0 = pairs.toDF("src", "dst")
    // dst-partitioned ONCE (r9, guide §2.4 "establish the partitioning
    // once"): the edge set is static across rounds, and with the
    // node-sized label side broadcast (below) each round's
    // neighbor-min groupBy(dst) then reuses this layout with NO
    // per-round exchange — localCheckpoint preserves the partitioning
    // through LogicalRDD
    val edges = p0
      .union(p0.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("dst"))
      .localCheckpoint()
    var labels = nodes.toDF("id")
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint()
    // convergence via the label-sum potential: labels only ever decrease,
    // so Σ lbl (exact DECIMAL(38,0) — no Long overflow, no FP) strictly
    // decreases iff any label changed; comparing sums replaces the
    // previous per-round join-with-last-round + count job with a single
    // aggregate over the freshly checkpointed labels
    def lblSum(df: DataFrame): java.math.BigDecimal = {
      val v = df.agg(
        sum(col("lbl").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head.getDecimal(0)
      if (v == null) java.math.BigDecimal.ZERO else v
    }
    var prevSum = lblSum(labels)
    // label frames are node-sized: broadcast them into the static edge
    // scan when they actually fit (r9, guide §3.1) — a round then runs
    // broadcast-join → in-place groupBy(dst) with ZERO exchanges over
    // the edge set. The decision uses the MATERIALIZED node count (the
    // labels frame is already checkpointed; optimizer size estimates
    // are opaque for LogicalRDD plans), sized against the session
    // broadcast threshold at ~16 B per (id, lbl) row — at corpus scale
    // the count exceeds it and every round falls back to the shuffled
    // shape unchanged.
    val bcastRows = {
      val raw = nodes.sparkSession.conf
        .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
      val thr =
        try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
        catch { case _: NumberFormatException => 10L << 20 }
      thr / 16
    }
    val nNodes = labels.count()
    def maybeBcast(df: DataFrame): DataFrame =
      if (nNodes <= bcastRows) broadcast(df) else df
    var changed = true
    var rounds = 0
    while (changed && rounds < maxRounds) {
      val tRound = System.nanoTime()
      val nbrMin = edges
        .join(
          maybeBcast(
            labels.select(col("id").as("src"), col("lbl").as("nlbl"))),
          Seq("src"))
        .groupBy(col("dst")).agg(min(col("nlbl")).as("nmin"))
      // stepped is CHECKPOINTED before the halving self-join (r9): its
      // two join sides shuffle on DIFFERENT keys (lbl vs mid), so no
      // exchange reuse applies and a lazy plan would run the whole
      // edge-sized nbrMin pipeline twice per round
      val stepped = labels
        .join(maybeBcast(nbrMin.withColumnRenamed("dst", "id")),
          Seq("id"), "left")
        .select(
          col("id"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      // pointer halving: follow my label to ITS label (labels only ever
      // decrease, so label(label(id)) <= label(id))
      val lblMap =
        stepped.select(col("id").as("mid"), col("lbl").as("mlbl"))
      // jumped is checkpointed too: lazy, its halving broadcast would
      // be rebuilt by every consumer (the sum probe + both of next
      // round's joins) — A/B'd slower than the one materialization
      val jumped = stepped
        .join(maybeBcast(lblMap), col("lbl") === col("mid"), "left")
        .select(
          col("id"),
          least(col("lbl"), coalesce(col("mlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      val newSum = lblSum(jumped)
      changed = newSum.compareTo(prevSum) != 0
      prevSum = newSum
      labels = jumped
      rounds += 1
      if (debug)
        System.err.println(s"[$tag] round $rounds: changed=$changed " +
          f"(lblSum=$newSum) in ${(System.nanoTime() - tRound) / 1e9}%.2f s")
    }
    require(!changed,
      s"$tag: label propagation did not converge in $rounds rounds")
    labels
  }
}
