package graft

import org.apache.spark.sql.functions._

import graft.queries.{Curation, Dedup, Evals, Olap, Sim, Text}

/** Round-8 operator family: independent driver replays (third
  * implementations — plain Scala collections, no Spark, no SQL) of each
  * new operator at sf0.001, plus the structural invariants the oracle
  * compare cannot see (budget conservation, chunk coverage, dose
  * non-degeneracy). Exact equality everywhere the engine claims
  * exactness — doubles compare with ==, not tolerance, because both
  * sides compute from identical integer operands in an identical order. */
class Round8OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def orders: Array[(String, Long)] =
    Tables.load(spark, sf001, "orders")
      .select(col("o_orderstatus"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .as[(String, Long)].collect()

  test("q326 KS statistic equals a from-scratch replay; bounds sane") {
    val rows = orders.filter(r => r._1 == "F" || r._1 == "O")
    val a = rows.filter(_._1 == "F").map(_._2).sorted
    val b = rows.filter(_._1 == "O").map(_._2).sorted
    val values = (a ++ b).distinct.sorted
    def cdfCounts(xs: Array[Long]): Map[Long, Long] = {
      // cumulative count at each probe value (≤ v)
      var i = 0
      values.map { v =>
        while (i < xs.length && xs(i) <= v) i += 1
        v -> i.toLong
      }.toMap
    }
    val (ca, cb) = (cdfCounts(a), cdfCounts(b))
    val expD = values.map(v =>
      math.abs(ca(v).toDouble / a.length.toDouble -
        cb(v).toDouble / b.length.toDouble)).max
    val got = Evals.q326.run(spark, sf001)
      .as[(Long, Long, Double, Double, Boolean)].collect()
    assert(got.length == 1)
    val (na, nb, d, crit, rej) = got.head
    assert(na == a.length.toLong && nb == b.length.toLong)
    assert(d == expD, s"KS D mismatch: $d vs replay $expD")
    assert(d >= 0.0 && d <= 1.0)
    val expCrit = 1.358 * math.sqrt(
      (na + nb).toDouble / (na.toDouble * nb.toDouble))
    assert(crit == expCrit && rej == (d > crit))
  }

  test("q327 conformal threshold is the exact order statistic; coverage holds") {
    val scored = Tables.load(spark, sf001, "documents")
      .select(col("doc_id")).as[Long].collect()
      .map(id => (id, (id * 2654435761L) % 100000L))
    val cal = scored.filter(_._1 % 2 == 0).map(_._2).sorted
    val tst = scored.filter(_._1 % 2 != 0).map(_._2)
    val k = (9 * (cal.length + 1) + 9) / 10
    val thr = cal(k - 1) // k-th smallest, 1-indexed
    val covered = tst.count(_ <= thr).toLong
    val got = Evals.q327.run(spark, sf001)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.length == 1)
    val (nCal, nTest, gk, gthr, gcov, cov) = got.head
    assert(nCal == cal.length.toLong && nTest == tst.length.toLong)
    assert(gk == k.toLong, s"quantile index: $gk vs $k")
    assert(gthr == thr, s"threshold: $gthr vs $thr")
    assert(gcov == covered && cov == covered.toDouble / tst.length.toDouble)
    // the split-conformal guarantee: coverage ≥ 1 − α on exchangeable
    // data; the dosed scores are iid-uniform enough that this must hold
    assert(cov >= 0.88, s"coverage $cov violates the conformal bound")
  }

  test("q328 hard negatives equal a brute-force replay") {
    val pts = Tables.load(spark, sf001, "embeddings")
      .select(col("vec_id"), col("label").cast("long"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(round(x * 16384) AS BIGINT))"))
      .as[(Long, Long, Seq[Long])].collect()
    val queries = pts.filter(_._1 < 10)
    val expected = queries.flatMap { case (qid, qLabel, qq) =>
      pts.filter(_._2 != qLabel)
        .map { case (cid, cLabel, cq) =>
          val d2 = qq.zip(cq).map { case (x, y) => (x - y) * (x - y) }.sum
          (qid, cid, cLabel, d2)
        }
        .sortBy(t => (t._4, t._2)).take(3).zipWithIndex
        .map { case ((q, c, cl, d2), i) =>
          (q, i + 1L, c, qLabel, cl, d2)
        }
    }.sortBy(t => (t._1, t._2))
    val got = Sim.q328.run(spark, sf001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == expected.toSeq)
    // dose sanity: hard negatives must be NEAR — nearer than the median
    // same-query candidate would be, or the miner found nothing "hard"
    assert(got.nonEmpty && got.forall(_._6 > 0L))
  }

  test("q329 allocations sum to the budget and match a replay") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("source"), col("n_chars")).as[(String, Long)].collect()
    val strata = docs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, rows) =>
        val n = rows.length.toLong
        val sx = rows.map(_._2).sum
        val sxx = rows.map(r => r._2 * r._2).sum
        val sd = math.sqrt(
          (n * sxx - sx * sx).toDouble / (n * (n - 1)).toDouble)
        (src, n, sd, n.toDouble * sd)
    }
    val wTot = strata.map(_._4).foldLeft(0.0)(_ + _) // sorted-source fold
    val shares = strata.map { case (src, n, sd, w) =>
      val share = 100.0 * w / wTot
      (src, n, sd, share, math.floor(share).toLong,
        share - math.floor(share))
    }
    val extra = 100L - shares.map(_._5).sum
    val order = shares.sortBy(t => (-t._6, t._1)).map(_._1)
      .zipWithIndex.toMap
    val expected = shares.map { case (src, n, sd, share, flo, _) =>
      (src, n, sd, share, flo + (if (order(src) < extra) 1L else 0L))
    }
    val got = Curation.q329.run(spark, sf001)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(got.toSeq == expected)
    assert(got.map(_._5).sum == 100L, "largest-remainder must conserve B")
    assert(got.forall(_._5 >= 0L))
  }

  test("q330 fertility equals a driver regex replay") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("lang"), col("text")).as[(String, String)].collect()
    val re = "[a-z0-9]+|[^a-z0-9 ]".r
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (lang, rows) =>
        val words = rows.map(_._2.split(" ", -1).count(_.nonEmpty)
          .toLong).sum
        val toks = rows.map(r =>
          re.findAllIn(r._2.toLowerCase).length.toLong).sum
        val chars = rows.map(_._2.length.toLong).sum
        (lang, rows.length.toLong, words, toks, chars,
          toks.toDouble / words.toDouble, chars.toDouble / toks.toDouble)
    }
    val got = Curation.q330.run(spark, sf001)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(got.toSeq == expected)
    // fertility must be ≥ 1: every alnum word is at least one token
    assert(got.forall(_._6 >= 1.0))
  }

  test("q331 chunks cover every token with stride-40 overlap and exact md5") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .toMap
    val got = Curation.q331.run(spark, sf001)
      .as[(Long, Long, Long, Long, String)].collect()
    val byDoc = got.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet, "every document must chunk")
    byDoc.foreach { case (id, chunks) =>
      val toks = docs(id).split(" ", -1)
      val sorted = chunks.sortBy(_._2)
      // chunk grid: idx k starts at 40k; last start < n_tokens; sizes
      // are min(50, n - start); md5 over the space-joined slice
      sorted.zipWithIndex.foreach { case ((_, idx, start, nTok, sum), k) =>
        assert(idx == k.toLong && start == 40L * k)
        assert(nTok == math.min(50, toks.length - start).toLong)
        val text = toks.slice(start.toInt, start.toInt + 50).mkString(" ")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(sum == md, s"doc $id chunk $k fingerprint drift")
      }
      // coverage: union of [start, start+n) is [0, n_tokens)
      assert(sorted.head._3 == 0L)
      assert(sorted.last._3 + sorted.last._4 == toks.length.toLong)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 - a._3 == 40L, "stride must be 40")
          assert(a._3 + a._4 >= b._3, "no token gap between chunks")
        case _ =>
      }
    }
  }

  test("q332 containment equals an exact replay with the df≤32 cap") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val shingles = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val sh =
        if (toks.length >= 3)
          toks.sliding(3).map(_.mkString(" ")).toSet
        else Set(text)
      id -> sh
    }.toMap
    val df = shingles.values.flatten.groupBy(identity)
      .map { case (sh, xs) => sh -> xs.size }
    val kept = shingles.map { case (id, sh) =>
      id -> sh.filter(df(_) <= 32)
    }
    val expected = (for {
      (a, sa) <- kept.toSeq
      (b, sb) <- kept.toSeq
      if a != b && sa.size >= 5
      inter = (sa & sb).size
      if inter.toDouble / sa.size.toDouble >= 0.8
    } yield (a, b, sa.size.toLong, inter.toLong,
      inter.toDouble / sa.size.toDouble))
      .sortBy(t => (t._1, t._2))
    val got = Dedup.q332.run(spark, sf001)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.toSeq == expected)
    // dose sanity: the fixture's near-dup structure must produce real
    // containment pairs, or the operator was never exercised
    assert(got.nonEmpty, "containment dose produced zero pairs")
  }

  test("q333 gini equals the classic sorted formula, identity and all") {
    val rev = Tables.load(spark, sf001, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("r"))
      .select(col("r")).as[Long].collect().sorted
    val n = rev.length.toLong
    val t = rev.sum
    // classic: G = Σ(2i − n − 1)·x_i / (n·T), ascending, i = 1..n
    val num = rev.zipWithIndex.map { case (x, i) =>
      BigInt(2L * (i + 1) - n - 1) * BigInt(x)
    }.sum
    // mirror the engine's exact path: integer numerator and denominator
    // each converted to double (both < 2^53 here, so exactly), ONE
    // division — the classic form's numerator is ALGEBRAICALLY equal to
    // the engine's (n+1)T − 2ΣC, so the doubles must be bit-identical
    val expG = num.toDouble / (BigInt(n) * BigInt(t)).toDouble
    val got = Olap.q333.run(spark, sf001)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.length == 1)
    val (gn, gt, gini, bottom50, top10) = got.head
    assert(gn == n && gt == t)
    assert(gini == expG, s"gini $gini vs replay $expG")
    assert(gini > 0.0 && gini < 1.0)
    val expBottom = rev.take((n / 2).toInt).sum
    assert(bottom50 == expBottom.toDouble / t.toDouble)
    // ascending sort ⇒ the top decile's PER-CAPITA share beats the
    // bottom half's, and each group's share brackets its headcount share
    assert(top10 / 0.1 > bottom50 / 0.5,
      "top decile per-capita must exceed bottom-half per-capita")
    assert(top10 >= 0.1 && bottom50 <= 0.5)
  }

  test("q334 l-diversity suppresses exactly the single-status groups") {
    val got = Curation.q334.run(spark, sf001)
      .as[(String, Long, Long, Long, Boolean)].collect()
    val byGroup = Tables.load(spark, sf001, "orders")
      .select(col("o_orderpriority"),
        expr("CAST(year(o_orderdate) * 100 + month(o_orderdate) AS LONG)"),
        col("o_orderstatus"))
      .as[(String, Long, String)].collect()
      .groupBy(t => (t._1, t._2))
    assert(got.length == byGroup.size)
    got.foreach { case (pri, ym, n, l, pub) =>
      val rows = byGroup((pri, ym))
      assert(n == rows.length.toLong)
      assert(l == rows.map(_._3).distinct.length.toLong)
      assert(pub == (l >= 2))
    }
    // the dose must exercise BOTH verdicts or the gate proves nothing:
    // TPC-H order years at the range edges carry single-status groups
    assert(got.exists(!_._5) && got.exists(_._5),
      "fixture must produce both published and suppressed groups")
  }

  test("q335 vocab growth equals a replay; curves monotone and conserved") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val nDocs = docs.length.toLong
    val toks = docs.flatMap { case (id, text) =>
      text.split(" ", -1).filter(_.nonEmpty)
        .map(t => ((10 * id) / nDocs, t))
    }
    val volume = toks.groupBy(_._1).map { case (d, xs) =>
      d -> xs.length.toLong
    }
    val firstSeen = toks.groupBy(_._2).toSeq
      .map { case (_, xs) => xs.map(_._1).min }
      .groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val got = Text.q335.run(spark, sf001)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == volume.keys.toSeq.sorted)
    var (cumT, cumY) = (0L, 0L)
    got.foreach { case (d, nTok, newTypes, cumTok, cumTypes) =>
      assert(nTok == volume(d) && newTypes == firstSeen.getOrElse(d, 0L))
      cumT += nTok; cumY += newTypes
      assert(cumTok == cumT && cumTypes == cumY)
    }
    // conservation: final cumulatives are the corpus totals
    assert(cumT == toks.length.toLong)
    assert(cumY == toks.map(_._2).distinct.length.toLong)
  }

  test("q336 bootstrap equals an md5-exact replay; CI brackets the mean") {
    val rows = Tables.load(spark, sf001, "orders")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .as[(Long, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def u24(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      java.lang.Long.parseLong(hex, 16)
    }
    val t = Evals.poissonThresholds
    def w(u: Long): Long =
      if (u < t(0)) 0L else if (u < t(1)) 1L else if (u < t(2)) 2L
      else if (u < t(3)) 3L else if (u < t(4)) 4L else 5L
    val means = (0 until 80).map { b =>
      var sw = 0L; var swx = 0L
      rows.foreach { case (k, x) =>
        val wi = w(u24(s"$k:$b")); sw += wi; swx += wi * x
      }
      (swx.toDouble / sw.toDouble, b)
    }.sorted
    val (expLo, expHi) = (means(1)._1, means(77)._1) // ranks 2 and 78
    val got = Evals.q336.run(spark, sf001)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.length == 1)
    val (n, b, point, lo, hi) = got.head
    assert(n == rows.length.toLong && b == 80L)
    assert(point == rows.map(_._2).sum.toDouble / rows.length.toDouble)
    assert(lo == expLo && hi == expHi,
      s"CI ($lo, $hi) vs replay ($expLo, $expHi)")
    assert(lo < point && point < hi, "95% CI must bracket the point mean")
  }

  test("q337 Theil-Sen equals a replay and shrugs off an outlier month") {
    val monthly = Tables.load(spark, sf001, "lineitem")
      .groupBy(expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) AS LONG)")
        .as("mx"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("r"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val slopes = (for {
      (xi, yi) <- monthly; (xj, yj) <- monthly if xi < xj
    } yield (xi, xj, (yj - yi).toDouble / (xj - xi).toDouble))
      .sortBy(t => (t._3, t._1, t._2))
    val slope = slopes((slopes.length + 1) / 2 - 1)._3
    val res = monthly.map { case (x, y) => (x, y.toDouble - slope * x) }
      .sortBy(t => (t._2, t._1))
    val intercept = res((monthly.length + 1) / 2 - 1)._2
    val got = Olap.q337.run(spark, sf001)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length == 1)
    val (nPts, nPairs, gs, gi) = got.head
    assert(nPts == monthly.length.toLong &&
      nPairs == slopes.length.toLong)
    assert(gs == slope && gi == intercept)
    // robustness: corrupting ONE month by 100× moves the replayed
    // median slope by less than the corruption moves the OLS slope —
    // the estimator's reason to exist
    val corrupted = monthly.updated(0, (monthly(0)._1, monthly(0)._2 * 100))
    val cSlopes = (for {
      (xi, yi) <- corrupted; (xj, yj) <- corrupted if xi < xj
    } yield (yj - yi).toDouble / (xj - xi).toDouble).sorted
    val cSlope = cSlopes((cSlopes.length + 1) / 2 - 1)
    def ols(pts: Array[(Long, Long)]): Double = {
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
      val sxy = pts.map(p => p._1.toDouble * p._2.toDouble).sum
      val sxx = pts.map(p => p._1.toDouble * p._1.toDouble).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    assert(math.abs(cSlope - slope) <
      math.abs(ols(corrupted) - ols(monthly)),
      "median slope must move less than OLS under contamination")
  }

  test("q338 reliability curve hugs the diagonal; brier is exact") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id")).as[Long].collect()
    val scored = docs.map { id =>
      val p = (id * 2654435761L) % 1000
      val y = if ((id * 40503L) % 1000 < p) 1L else 0L
      (p / 100, p, y)
    }
    val expected = scored.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (b, xs) =>
        val n = xs.length.toLong
        val sp = xs.map(_._2).sum
        val sy = xs.map(_._3).sum
        val sq = xs.map(t => (t._2 - 1000 * t._3) * (t._2 - 1000 * t._3)).sum
        (b, n, sp.toDouble / (n * 1000L).toDouble,
          sy.toDouble / n.toDouble, sq.toDouble / (n * 1000000L).toDouble)
    }
    val got = Evals.q338.run(spark, sf001)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.toSeq == expected)
    // the dose is calibrated by construction: every bucket's empirical
    // rate must sit near its mean prediction (hash noise only)
    got.foreach { case (b, n, pred, emp, brier) =>
      assert(math.abs(pred - emp) < 0.15,
        s"bucket $b: calibrated dose drifted ($pred vs $emp)")
      assert(brier >= 0.0 && brier <= 0.25 + 1e-9)
    }
  }

  test("GlobalOrder.withOrderedLag equals a driver-side global lag") {
    import graft.operators.GlobalOrder
    val df = Tables.load(spark, sf001, "orders")
      .groupBy(expr("o_orderkey % 97").as("k"))
      .agg(count(lit(1)).as("c"))
    val got = GlobalOrder.withOrderedLag(df, Seq(col("k")), col("c"), "pc")
      .select(col("k"), col("c"), col("pc"))
      .as[(Long, Long, Option[Long])].collect().sortBy(_._1)
    val base = got.map(t => (t._1, t._2)).sortBy(_._1)
    val expected = base.zipWithIndex.map { case ((k, c), i) =>
      (k, c, if (i == 0) None else Some(base(i - 1)._2))
    }
    assert(got.toSeq == expected.toSeq)
    assert(got.head._3.isEmpty, "global first row must lag to null")
  }

  test("q339 Shapley credits equal a replay and conserve conversions") {
    val ev = Tables.load(spark, sf001, "events")
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val firstConv = ev.filter(_._4 == "purchase").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(t => (t._2, t._3)).min }
    val journeys = ev
      .filter(e => firstConv.contains(e._1) && e._4 != "purchase")
      .filter { e =>
        val (cts, ceid) = firstConv(e._1)
        e._2 < cts || (e._2 == cts && e._3 < ceid)
      }
      .map(e => (e._1, e._4)).distinct
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).toSet }
    val credit12 = journeys.toSeq.flatMap { case (_, chans) =>
      chans.toSeq.map(ch => ch -> 12L / chans.size)
    }.groupBy(_._1).map { case (ch, xs) =>
      ch -> (xs.length.toLong, xs.map(_._2).sum)
    }
    val tot12 = credit12.values.map(_._2).sum
    val got = graft.streaming.EventStream.q339.run(spark, sf001)
      .as[(String, Long, Double, Double)].collect()
    assert(got.length == credit12.size)
    got.foreach { case (ch, n, credit, share) =>
      val (en, e12) = credit12(ch)
      assert(n == en && credit == e12.toDouble / 12.0 &&
        share == e12.toDouble / tot12.toDouble, s"channel $ch drifted")
    }
    // conservation in EXACT twelfths (a double sum of 1/12ths is not
    // associativity-safe): Σ credit12 = 12 × attributable conversions
    assert(credit12.values.map(_._2).sum == 12L * journeys.size,
      "Shapley credits must conserve attributable conversions")
  }

  test("q340 Wasserstein equals a replay and dominates mean-shift") {
    val rows = orders.filter(r => r._1 == "F" || r._1 == "O")
    val a = rows.filter(_._1 == "F").map(_._2)
    val b = rows.filter(_._1 == "O").map(_._2)
    val values = (a ++ b).distinct.sorted
    def cum(xs: Array[Long]): Map[Long, Long] = {
      val s = xs.sorted; var i = 0
      values.map { v =>
        while (i < s.length && s(i) <= v) i += 1
        v -> i.toLong
      }.toMap
    }
    val (ca, cb) = (cum(a), cum(b))
    val mass = values.sliding(2).map {
      case Array(v0, v1) =>
        BigInt((ca(v0) * b.length - cb(v0) * a.length).abs) * BigInt(v1 - v0)
      case _ => BigInt(0)
    }.sum
    val expW1 = mass.toDouble / (a.length.toDouble * b.length.toDouble)
    val got = Evals.q340.run(spark, sf001)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 1)
    val (na, nb, w1) = got.head
    assert(na == a.length.toLong && nb == b.length.toLong)
    assert(w1 == expW1, s"W1 $w1 vs replay $expW1")
    // W1 >= |mean(A) - mean(B)| always (Jensen); strict here
    val meanGap = math.abs(a.sum.toDouble / a.length -
      b.sum.toDouble / b.length)
    assert(w1 >= meanGap - 1e-9, "W1 must dominate the mean shift")
  }

  test("q341 sampling table equals a replay; slots conserve exactly") {
    val counts = Tables.load(spark, sf001, "documents")
      .select(col("text")).as[String].collect()
      .flatMap(_.split(" ", -1).filter(_.nonEmpty))
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
      .toSeq.sortBy(t => (-t._2, t._1)).take(100)
    val weighted = counts.map { case (t, c) =>
      (t, c, math.sqrt(math.sqrt(c.toDouble * c.toDouble * c.toDouble)))
    }
    val wTot = weighted.sortBy(_._1).map(_._3).foldLeft(0.0)(_ + _)
    val shares = weighted.map { case (t, c, w) =>
      val share = 1000000.0 * w / wTot
      (t, c, w, math.floor(share).toLong, share - math.floor(share))
    }
    val extra = 1000000L - shares.map(_._4).sum
    val pri = shares.sortBy(s => (-s._5, s._1)).map(_._1)
      .zipWithIndex.toMap
    val expected = shares.map { case (t, c, w, flo, _) =>
      (t, c, w, flo + (if (pri(t) < extra) 1L else 0L))
    }.sortBy(_._1)
    val got = Text.q341.run(spark, sf001)
      .as[(String, Long, Double, Long)].collect()
    assert(got.toSeq == expected)
    assert(got.map(_._4).sum == 1000000L, "slot table must hold 10^6")
    // the 3/4 damping: rare words get MORE than proportional share
    val byCnt = got.sortBy(_._2)
    val (rare, common) = (byCnt.head, byCnt.last)
    assert(rare._4.toDouble / rare._2.toDouble >
      common._4.toDouble / common._2.toDouble,
      "unigram^(3/4) must up-weight rare tokens per occurrence")
  }

  test("q342 stratified estimate beats naive under dosed confounding") {
    val langIdx = Map("de" -> 0L, "en" -> 1L, "es" -> 2L, "fr" -> 3L)
      .withDefaultValue(4L)
    val dosed = Tables.load(spark, sf001, "documents")
      .select(col("lang"), col("doc_id")).as[(String, Long)].collect()
      .map { case (lang, id) =>
        val sidx = langIdx(lang)
        val t = (id * 7919) % 100 < 20 + 15 * sidx
        val y = (id * 31) % 50 + 10 * sidx + (if (t) 7L else 0L)
        (lang, t, y)
      }
    val strata = dosed.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (lang, xs) =>
        val n = xs.length.toLong
        val nt = xs.count(_._2).toLong
        val (syt, syc) = (xs.filter(_._2).map(_._3).sum,
          xs.filterNot(_._2).map(_._3).sum)
        val (mt, mc) = (syt.toDouble / nt.toDouble,
          syc.toDouble / (n - nt).toDouble)
        (lang, n, nt, nt.toDouble / n.toDouble, mt, mc, mt - mc)
    }
    val nAll = strata.map(_._2).sum
    val ate = strata.map(s => s._2.toDouble * s._7)
      .foldLeft(0.0)(_ + _) / nAll.toDouble
    val got = Evals.q342.run(spark, sf001)
      .as[(String, Long, Long, Double, Double, Double, Double)].collect()
    assert(got.length == strata.length + 1)
    strata.foreach { exp =>
      val row = got.find(_._1 == exp._1).get
      assert(row == exp, s"stratum ${exp._1} drifted")
    }
    val all = got.find(_._1 == "ALL").get
    val naive = all._5 - all._6
    assert(all._7 == ate, "stratified ATE must equal the ordered replay")
    // the dose confounds upward: propensity and baseline rise together,
    // so naive must overshoot the true effect 7 and stratification must
    // land strictly closer
    assert(naive > 7.0, s"dose failed to confound (naive $naive)")
    assert(math.abs(all._7 - 7.0) < math.abs(naive - 7.0),
      s"stratified ${all._7} must beat naive $naive against truth 7")
  }

  test("q343 knapsack spends exactly the budget in density order") {
    val got = Curation.q343.run(spark, sf001)
      .as[(Long, String, Long, Long, Double, Long, Long, Double)]
      .collect().sortBy(_._1)
    val budget = got.map(_._3).sum / 2
    assert(got.map(_._7).sum == budget,
      "taken tokens must spend exactly the budget")
    // ranking is by density desc then source; cumsum consistent
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._5 > b._5 || (a._5 == b._5 && a._2 < b._2),
          "pick order must be density desc, source asc")
        assert(b._6 == a._6 + b._3, "cum_tokens must chain")
      case _ =>
    }
    // prefix-greedy shape: full takes, at most one fractional, then zeros
    val fracs = got.map(_._8)
    val firstPartial = fracs.indexWhere(f => f < 1.0)
    if (firstPartial >= 0)
      assert(fracs.drop(firstPartial + 1).forall(_ == 0.0),
        "after the boundary source every take must be zero")
  }

  test("q344 calibration sweep equals an exact sampled replay") {
    val mdInst = java.security.MessageDigest.getInstance("MD5")
    def inSample(id: Long): Boolean = {
      val hex = mdInst.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      "0123456789abcdef".indexOf(hex(31)) < 8
    }
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .filter(t => inSample(t._1))
    val sh = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      id -> (if (toks.length >= 3)
        toks.sliding(3).map(_.mkString(" ")).toSet else Set(text))
    }.toMap
    val truth = (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a < b
      inter = (sa & sb).size if inter > 0
    } yield ((a, b), (inter.toLong, (sa.size + sb.size - inter).toLong)))
      .toMap
    // banded pairs: replay the 4x2 minhash banding
    def lanes(shs: Set[String]): Seq[String] = {
      def hex(j: Int, x: String) = mdInst
        .digest(s"$j:$x".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (1 to 8).map { m =>
        val j = (m + 3) / 4
        val off = ((m - 1) % 4) * 8
        shs.map(x => hex(j, x).substring(off, off + 8)).min
      }
    }
    val sigs = sh.map { case (id, s) => id -> lanes(s) }
    val banded = (for {
      (a, la) <- sigs.toSeq; (b, lb) <- sigs.toSeq if a < b
      if (0 until 4).exists(band =>
        la(2 * band) + la(2 * band + 1) == lb(2 * band) + lb(2 * band + 1))
    } yield (a, b)).toSet
    val expected = Seq(50L, 60L, 70L, 80L, 90L).flatMap { thr =>
      val qual = truth.filter { case (_, (i, u)) => i * 100 >= thr * u }
      if (qual.isEmpty) None
      else {
        val found = qual.keys.count(banded.contains).toLong
        Some((thr, qual.size.toLong, found, banded.size.toLong,
          found.toDouble / qual.size.toDouble,
          found.toDouble / banded.size.toDouble))
      }
    }
    val got = Dedup.q344.run(spark, sf001)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == expected, s"sweep drifted:\n$got\nvs\n$expected")
    // sanity: the sweep is non-degenerate and grading is coherent
    assert(got.nonEmpty && got.forall(r => r._3 <= r._2))
    assert(got.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
  }

  test("q345 S-curve table equals the closed form; monotone; thresholds") {
    def powInt(x: Double, e: Int): Double =
      Seq.fill(e)(x).foldLeft(1.0)(_ * _)
    val expected = for {
      (b, r) <- Seq((4, 2), (8, 4), (16, 8))
      jp <- (1 to 19).map(_ * 5)
    } yield {
      val j = jp.toDouble / 100.0
      val p = 1.0 - powInt(1.0 - powInt(j, r), b)
      (b.toLong, r.toLong, jp.toLong, j, p, p >= 0.5)
    }
    val got = Dedup.q345.run(spark, sf001)
      .as[(Long, Long, Long, Double, Double, Boolean)].collect().toSeq
    assert(got.sortBy(t => (t._1, t._3)) ==
      expected.sortBy(t => (t._1, t._3)))
    // candidate probability is monotone in J within each config, and
    // the 50% crossing sits near the textbook threshold (1/b)^(1/r)
    got.groupBy(t => (t._1, t._2)).foreach { case ((b, r), rows) =>
      val ps = rows.sortBy(_._3).map(_._5)
      assert(ps.zip(ps.tail).forall { case (x, y) => x <= y })
      val cross = rows.sortBy(_._3).find(_._6).map(_._4).getOrElse(1.0)
      // exact 50% point: 1-(1-J^r)^b = 1/2  ⇔  J = (1-2^(-1/b))^(1/r)
      val jstar = math.pow(1.0 - math.pow(0.5, 1.0 / b.toDouble),
        1.0 / r.toDouble)
      assert(math.abs(cross - jstar) <= 0.05, // one grid step
        s"($b,$r): 50% crossing $cross far from exact J* $jstar")
    }
  }

  test("q346 Welch t equals an exact-moment replay") {
    val rows = orders.filter(r => r._1 == "F" || r._1 == "O")
    def moments(st: String) = {
      val xs = rows.filter(_._1 == st).map(_._2)
      val n = xs.length.toLong
      val sx = xs.sum
      val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
      val mean = sx.toDouble / n.toDouble
      val vOverN = (BigInt(n) * sxx - BigInt(sx) * BigInt(sx)).toDouble /
        ((n * (n - 1)).toDouble * n.toDouble)
      (n, mean, vOverN)
    }
    val (na, ma, va) = moments("F")
    val (nb, mb, vb) = moments("O")
    val t = (ma - mb) / math.sqrt(va + vb)
    val dfW = (va + vb) * (va + vb) /
      (va * va / (na - 1).toDouble + vb * vb / (nb - 1).toDouble)
    val got = Evals.q346.run(spark, sf001)
      .as[(Long, Long, Double, Double, Double, Double, Boolean)].collect()
    assert(got.length == 1)
    val (gna, gnb, gma, gmb, gt, gdf, rej) = got.head
    assert(gna == na && gnb == nb && gma == ma && gmb == mb)
    assert(gt == t && gdf == dfW && rej == (math.abs(t) > 1.96))
    assert(!gt.isNaN && gdf > 0.0 && gdf < (na + nb).toDouble)
  }

  test("q347 novelty equals an inverted-index replay; docs all accounted") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    val grams = docs.map { case (id, src, text) =>
      val t = text.split(" ", -1).filter(_.nonEmpty)
      (id, src,
        if (t.length >= 8) t.sliding(8).map(_.mkString(" ")).toSet
        else Set.empty[String])
    }
    val df8 = grams.flatMap(_._3).groupBy(identity)
      .map { case (g, xs) => g -> xs.length }
    val perDoc = grams.filter(_._3.nonEmpty).map { case (id, src, gs) =>
      (src, gs.size.toLong, gs.count(df8(_) == 1).toLong)
    }
    val expected = perDoc.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, xs) =>
        val shortN = grams.count(g => g._2 == src && g._3.isEmpty).toLong
        val (tg, ug) = (xs.map(_._2).sum, xs.map(_._3).sum)
        (src, xs.length.toLong, shortN, tg, ug,
          ug.toDouble / tg.toDouble,
          xs.count(x => x._3 * 2 < x._2).toLong)
    }
    val got = Text.q347.run(spark, sf001)
      .as[(String, Long, Long, Long, Long, Double, Long)].collect()
    assert(got.toSeq == expected)
    // every document is either graded or counted short, per source
    val bySrc = docs.groupBy(_._2).map { case (s, xs) => s -> xs.length }
    got.foreach { case (src, n, nShort, _, _, nov, _) =>
      assert(n + nShort == bySrc(src).toLong, s"$src lost documents")
      assert(nov >= 0.0 && nov <= 1.0)
    }
  }

  test("q348 pinball losses equal a replay; tau=50 halves are symmetric") {
    val rev = Tables.load(spark, sf001, "orders")
      .groupBy(
        expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS LONG)")
          .as("mi"),
        expr("CAST(o_custkey % 8 AS LONG)").as("grp"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("r"))
      .as[(Long, Long, Long)].collect()
    val (lo, hi) = (rev.map(_._1).min, rev.map(_._1).max)
    val byKey = rev.map(t => (t._2, t._1) -> t._3).toMap
    val holdout = for {
      grp <- rev.map(_._2).distinct
      mi <- (hi - 11) to hi
      if mi - 12 >= lo // s_fc defined; n_fc defined whenever mi-1 >= lo
    } yield {
      val y = byKey.getOrElse((grp, mi), 0L)
      (y, byKey.getOrElse((grp, mi - 12), 0L),
        byKey.getOrElse((grp, mi - 1), 0L))
    }
    def pin(tau: Long, pairs: Seq[(Long, Long)]): Double = {
      val s = pairs.map { case (y, fc) =>
        if (y >= fc) tau * (y - fc) else (100 - tau) * (fc - y)
      }.sum
      s.toDouble / (pairs.length * 100L).toDouble
    }
    val got = Olap.q348.run(spark, sf001)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(10L, 50L, 90L))
    got.foreach { case (tau, n, ps, pn) =>
      assert(n == holdout.length.toLong)
      assert(ps == pin(tau, holdout.map(h => (h._1, h._2))),
        s"tau=$tau seasonal drifted")
      assert(pn == pin(tau, holdout.map(h => (h._1, h._3))),
        s"tau=$tau naive drifted")
    }
    // tau = 50 is half the absolute error — the median-forecast identity
    val mid = got.find(_._1 == 50L).get
    val mae = holdout.map(h => (h._1 - h._2).abs).sum.toDouble /
      holdout.length.toDouble
    assert(mid._3 == mae / 2.0 ||
      math.abs(mid._3 - mae / 2.0) < 1e-9 * mae.max(1.0))
  }

  test("q349 CUPED theta and variance reduction equal a BigInt replay") {
    val o = Tables.load(spark, sf001, "orders")
      .select(expr("CAST(year(o_orderdate) AS LONG)"), col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .as[(Long, Long, Long)].collect()
    val yrMax = o.map(_._1).max
    val byCust = o.filter(_._1 >= yrMax - 1).groupBy(_._2)
    val customers = Tables.load(spark, sf001, "customer")
      .select(col("c_custkey")).as[Long].collect()
    val units = customers.map { c =>
      val rows = byCust.getOrElse(c, Array.empty[(Long, Long, Long)])
      (rows.filter(_._1 == yrMax).map(_._3).sum,
        rows.filter(_._1 == yrMax - 1).map(_._3).sum)
    }
    val n = BigInt(units.length)
    val sx = units.map(u => BigInt(u._2)).sum
    val sy = units.map(u => BigInt(u._1)).sum
    val sxx = units.map(u => BigInt(u._2) * BigInt(u._2)).sum
    val syy = units.map(u => BigInt(u._1) * BigInt(u._1)).sum
    val sxy = units.map(u => BigInt(u._2) * BigInt(u._1)).sum
    val covN = (n * sxy - sx * sy).toDouble
    val vxN = (n * sxx - sx * sx).toDouble
    val vyN = (n * syy - sy * sy).toDouble
    val got = Evals.q349.run(spark, sf001)
      .as[(Long, Double, Double)].collect()
    assert(got.length == 1)
    val (gn, theta, rho2) = got.head
    assert(gn == units.length.toLong)
    assert(theta == covN / vxN, s"theta $theta vs ${covN / vxN}")
    assert(rho2 == covN * covN / (vxN * vyN))
    // rho^2 is a squared correlation — and on year-over-year customer
    // revenue it must find REAL signal, or the covariate is useless
    assert(rho2 >= 0.0 && rho2 <= 1.0)
  }

  test("q350 BH step-up equals a replay; sits between naive and Bonferroni") {
    val mdI = java.security.MessageDigest.getInstance("MD5")
    def u24(s: String): Long = java.lang.Long.parseLong(
      mdI.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(6), 16)
    val tests = Tables.load(spark, sf001, "documents")
      .select(col("source"), col("lang")).distinct()
      .as[(String, String)].collect()
      .map { case (src, lang) =>
        val u = u24(s"$src:$lang")
        (src, lang, if (u % 7 == 0) u % 5 else u % 1000)
      }
    val m = tests.length.toLong
    val ranked = tests.sortBy(t => (t._3, t._1, t._2)).zipWithIndex
      .map { case ((src, lang, p), i) =>
        val k = i + 1L
        (src, lang, p, k, m * p <= 50L * k)
      }
    val kMax = ranked.filter(_._5).map(_._4)
      .foldLeft(0L)(math.max)
    val expected = ranked.map { case (src, lang, p, k, ok) =>
      (src, lang, p, k, m, ok, k <= kMax, p < 50)
    }
    val got = Evals.q350.run(spark, sf001)
      .as[(String, String, Long, Long, Long, Boolean, Boolean, Boolean)]
      .collect()
    assert(got.toSeq == expected.toSeq)
    // sandwich: BH rejects at least Bonferroni (p <= 50/m) and at most
    // naive per-test alpha (p < 50), and the dose produces discoveries
    val nBH = got.count(_._7)
    val nBonf = got.count(t => m * t._3 <= 50L)
    val nNaive = got.count(_._8)
    assert(nBonf <= nBH && nBH <= nNaive,
      s"BH $nBH outside [Bonferroni $nBonf, naive $nNaive]")
    assert(nBH > 0, "the enriched dose must yield BH discoveries")
  }

  test("q351 decomposition equals a replay; parts reassemble exactly") {
    val rev = Tables.load(spark, sf001, "lineitem")
      .groupBy(expr(
        "CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS LONG)")
        .as("mi"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .as("y"))
      .as[(Long, Long)].collect().toMap
    val (lo, hi) = (rev.keys.min, rev.keys.max)
    val y = (lo to hi).map(mi => rev.getOrElse(mi, 0L)).toArray
    val n = y.length
    val t24 = (0 until n).map { i =>
      if (i < 6 || i >= n - 6) None
      else Some(y(i - 6) + y(i + 6) + 2L * (i - 5 to i + 5).map(y).sum)
    }
    val trended = (0 until n).flatMap(i => t24(i).map(t =>
      (lo + i, y(i), t, 24L * y(i) - t, (lo + i) % 12)))
    val sRaw = trended.groupBy(_._5).map { case (moy, xs) =>
      moy -> xs.map(_._4).sum.toDouble / (24L * xs.length).toDouble
    }
    val sMean = sRaw.toSeq.sortBy(_._1).map(_._2)
      .foldLeft(0.0)(_ + _) / 12.0
    val expected = trended.map { case (mi, yi, t, _, moy) =>
      val trend = t.toDouble / 24.0
      val seasonal = sRaw(moy) - sMean
      (mi, yi, trend, seasonal, yi.toDouble - trend - seasonal)
    }.sortBy(_._1)
    val got = Olap.q351.run(spark, sf001)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == expected)
    // decomposition identity: trend + seasonal + remainder == y, in the
    // same fixed op order both sides computed it
    got.foreach { case (mi, yi, tr, se, re) =>
      assert(yi.toDouble - tr - se == re, s"month $mi does not reassemble")
    }
    // the seasonal terms of the 12 calendar months re-center to ~zero
    val seasByMoy = got.groupBy(_._1 % 12).map(_._2.head._4)
    assert(math.abs(seasByMoy.sum) < 1e-6 * got.map(_._2).max.toDouble)
  }
}
