package graft

/** Round-12 operator family: the runtime bloom-filter pruning query
  * (q434 — the registered-query half of the r8 verdict's item #5; the
  * PlanShapeSpec mechanism pin predates it) and the pivot-sampled
  * Brandes betweenness capstone (q435 — r8 verdict item #6). Replays
  * follow the house rule: an independent single-machine recomputation
  * with IDENTICAL fold orders, compared exactly.
  */
class Round12OperatorsSpec extends SparkSpec {

  test("q434 bloom join: filter injected, results equal unpruned twin") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q434_bloom_prune_join")(spark, sf001)
    try {
      // the isolated session's optimized plan must carry the runtime
      // bloom filter (creation side: bloom_filter_agg; probe side:
      // might_contain) — this is what the committed plan artifact shows
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") ||
        plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$plan")
      val got = df.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // pruning must never change results: the same join/agg on the
      // plain session (bloom off by threshold, broadcast allowed)
      val li = Tables.load(spark, sf001, "lineitem")
      val ord = Tables.load(spark, sf001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val want = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(count(lit(1)).as("n_lines"),
          sum(graft.queries.Det.cents(col("l_extendedprice")))
            .as("revenue_cents"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy(col("o_year")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq == want.toSeq,
        "bloom-pruned join drifted from the unpruned twin")
      assert(got.nonEmpty && got.map(_._2).sum > 1000L,
        "join matched too little — fixture dose dead")
    } finally graft.Caches.release()
  }

  test("q435 betweenness: exact Brandes replay on the fixed pivot set") {
    import org.apache.spark.sql.functions.col
    // --- independent replay: co-purchase graph (n_ab >= 2) ---
    val op = Tables.load(spark, sf001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect()
    val pairCounts = scala.collection.mutable.HashMap
      .empty[(Long, Long), Int].withDefaultValue(0)
    op.groupBy(_._1).values.foreach { xs =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) += 1
    }
    // .toSeq BEFORE collect: collecting key pairs straight off a Map
    // rebuilds a Map and silently dedups edges by left endpoint
    val und = pairCounts.toSeq.collect { case (e, n) if n >= 2 => e }
    val adj = scala.collection.mutable.HashMap
      .empty[Long, List[Long]].withDefaultValue(Nil)
    und.foreach { case (a, b) =>
      adj(a) = b :: adj(a); adj(b) = a :: adj(b)
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val pivots = adj.keys.toSeq
      .sortBy(v => (md5hex(v.toString), v)).take(8)
    // forward: per-pivot BFS to depth 3 with exact path counts
    case class Lvls(lv: Map[Long, Int], sigma: Map[Long, Long])
    val state = pivots.map { p =>
      var lv = Map(p -> 0)
      var sigma = Map(p -> 1L)
      var frontier = Seq(p)
      for (l <- 1 to 3) {
        val arrivals = scala.collection.mutable.HashMap
          .empty[Long, Long].withDefaultValue(0L)
        frontier.foreach(v =>
          adj(v).foreach(w => arrivals(w) += sigma(v)))
        val fresh = arrivals.keys.filterNot(lv.contains).toSeq.sorted
        fresh.foreach { w => lv += w -> l; sigma += w -> arrivals(w) }
        frontier = fresh
      }
      p -> Lvls(lv, sigma)
    }.toMap
    // backward: Brandes dependency, successors one level deeper,
    // folded in sorted-w order from 0.0 (the engine's agreed fold)
    val delta = pivots.map { p =>
      val Lvls(lv, sigma) = state(p)
      val d = scala.collection.mutable.HashMap.empty[Long, Double]
      for (l <- 2 to 1 by -1) {
        lv.collect { case (v, `l`) => v }.foreach { v =>
          val succ = adj(v).filter(w => lv.get(w).contains(l + 1)).sorted
          if (succ.nonEmpty)
            d(v) = succ.foldLeft(0.0) { (acc, w) =>
              acc + sigma(v).toDouble / sigma(w).toDouble *
                (1.0 + d.getOrElse(w, 0.0))
            }
        }
      }
      p -> d.toMap
    }.toMap
    val reachedBy = (for {
      p <- pivots
      (v, l) <- state(p).lv if l >= 1
    } yield (v, p)).groupBy(_._1)
    val expect = reachedBy.toSeq.map { case (v, ps) =>
      val sortedP = ps.map(_._2).sorted
      val bc = sortedP.foldLeft(0.0) { (acc, p) =>
        acc + delta(p).getOrElse(v, 0.0)
      }
      (v, sortedP.size.toLong, bc)
    }.sortBy(_._1)
    val got = graft.queries.Olap.q435.run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    try {
      assert(got.length == expect.length,
        s"row count ${got.length} != replay ${expect.length}")
      got.zip(expect).foreach { case (g, e) =>
        assert(g == e, s"betweenness drifted at part ${e._1}: $g vs $e")
      }
      // the estimator earns its keep only if brokers are visible
      assert(expect.count(_._3 > 0.0) > 10,
        "no vertex carries positive betweenness — graph degenerate")
      assert(expect.exists(_._2 >= 2L),
        "no vertex reached by 2+ pivots — pivot set disconnected")
    } finally graft.Caches.release()
  }
}
