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

  test("q436 Kneser-Ney: exact component replay; continuation separates") {
    import org.apache.spark.sql.functions.col
    val texts = Tables.load(spark, sf001, "documents")
      .select(col("text"))
      .as[String](org.apache.spark.sql.Encoders.STRING).collect()
    val bg = scala.collection.mutable.HashMap
      .empty[(String, String), Long].withDefaultValue(0L)
    texts.foreach { t =>
      val ws = t.split(" ", -1)
      for (i <- 0 until ws.length - 1) bg((ws(i), ws(i + 1))) += 1L
    }
    val c1 = bg.toSeq.groupBy(_._1._1)
      .map { case (w, xs) => w -> xs.map(_._2).sum }
    val n1f = bg.toSeq.groupBy(_._1._1)
      .map { case (w, xs) => w -> xs.size.toLong }
    val n1b = bg.toSeq.groupBy(_._1._2)
      .map { case (w, xs) => w -> xs.size.toLong }
    val tTypes = bg.size.toLong
    val expect = bg.toSeq
      .sortBy { case ((w1, w2), c) => (-c, w1, w2) }.take(20)
      .map { case ((w1, w2), c12) =>
        val (cc1, nf, nb) = (c1(w1), n1f(w1), n1b(w2))
        // the SAME expression tree as both engines
        val pCont = nb.toDouble / tTypes.toDouble
        val pKn = (c12.toDouble - 0.75) / cc1.toDouble +
          (0.75 * nf.toDouble / cc1.toDouble) *
            (nb.toDouble / tTypes.toDouble)
        (w1, w2, c12, cc1, nf, nb, tTypes, pCont, pKn)
      }
    val got = graft.queries.Text.q436.run(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7), r.getDouble(8)))
    try {
      assert(got.toSeq == expect, "KN components drifted from replay")
      // the Kneser-Ney point: continuation mass is DISTINCT-CONTEXT
      // based — it must not be proportional to raw frequency
      val freqRank = got.sortBy(-_._6).map(_._2).distinct
      assert(freqRank.size > 1, "continuation distribution degenerate")
      assert(got.forall(r => r._9 > 0.0 && r._9 <= 1.0),
        "smoothed probability outside (0, 1]")
    } finally graft.Caches.release()
  }

  test("q437 PII scrub: injection replay; recall 1, false positives 0") {
    import org.apache.spark.sql.functions.col
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)](
        org.apache.spark.sql.Encoders.product[(Long, String, String)])
      .collect()
    val emailPat = "[a-z0-9_]+@[a-z]+\\.[a-z]+".r
    val phonePat = "[0-9]{3}-[0-9]{4}".r
    val injected = docs.count { case (id, _, _) =>
      "0123456789abcdef".indexOf(md5hex(id.toString).charAt(0)) <= 3
    }
    val rep = docs.map { case (id, src, text0) =>
      val dosed =
        "0123456789abcdef".indexOf(md5hex(id.toString).charAt(0)) <= 3
      val text =
        if (dosed)
          text0 + " contact user_" + id + "@example.com or call 555-" +
            (10000 + id % 10000).toString.substring(1)
        else text0
      val ne = emailPat.findAllIn(text).size.toLong
      val np = phonePat.findAllIn(text).size.toLong
      val after = phonePat.replaceAllIn(
        emailPat.replaceAllIn(text, "<EMAIL>"), "<PHONE>")
      (src, ne, np, text.length.toLong, after.length.toLong)
    }
    val expect = rep.groupBy(_._1).toSeq.map { case (src, xs) =>
      val (ne, np) = (xs.map(_._2).sum, xs.map(_._3).sum)
      val (cb, ca) = (xs.map(_._4).sum, xs.map(_._5).sum)
      (src, xs.length.toLong, xs.count(x => x._2 + x._3 > 0).toLong,
        ne, np, cb, ca, (cb - ca).toDouble / cb.toDouble)
    }.sortBy(_._1)
    val got = graft.queries.Curation.q437.run(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7)))
    try {
      assert(got.toSeq == expect, "PII audit drifted from replay")
      // word-salad corpus has no '@' and no digits: every flag IS an
      // injected doc (FP = 0) and every injected doc flags (recall 1)
      assert(got.map(_._3).sum == injected.toLong,
        s"flagged ${got.map(_._3).sum} != injected $injected")
      assert(got.map(_._4).sum == injected.toLong &&
        got.map(_._5).sum == injected.toLong,
        "each injected doc must yield exactly one email and one phone")
      assert(injected > 50, "dose too thin to exercise the detector")
    } finally graft.Caches.release()
  }
}
