package graft

import org.apache.spark.sql.functions._

import graft.queries.Evals

/** Round-10 operator family: independent driver replays (third
  * implementations — plain Scala collections, no Spark, no SQL) of each
  * new operator at sf0.001, plus the structural invariants the oracle
  * compare cannot see. Doubles compare with ==, not tolerance, because
  * both sides compute from identical integer operands in an identical
  * order (the Round8/Round9 discipline).
  */
class Round10OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def docToks: Array[(Long, String, Array[String])] =
    Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
      .map { case (id, src, t) =>
        (id, src, t.split(" ", -1).filter(_.nonEmpty))
      }

  /** The q380/q381 dose, replayed: substitution lattice (+ drops or
    * appends by mode) — must mirror Evals.candToks exactly. */
  private def cand(id: Long, ref: Array[String], mode: String)
      : Array[String] = {
    val subbed = ref.indices.map { i0 =>
      val i = i0 + 1L
      if ((id + i * 13) % 5 == 0 && mode == "drop") null
      else if ((id + i * 17) % 7 == 0) ref(0)
      else ref(i0)
    }
    if (mode == "drop") subbed.filter(_ != null).toArray
    else (subbed ++ Array.fill((id % 3 + 1).toInt)(ref(0))).toArray
  }

  private def ngramCounts(t: Array[String], n: Int): Map[String, Long] =
    t.sliding(n).filter(_.length == n).map(_.mkString(" "))
      .toSeq.groupBy(identity).map { case (g, c) => g -> c.length.toLong }

  test("q380 BLEU equals a from-scratch replay; clipping load-bearing") {
    val docs = docToks
    var cLen = 0L; var rLen = 0L
    val num = Array.fill(5)(0L); val den = Array.fill(5)(0L)
    var unclipped = 0L
    docs.foreach { case (id, _, ref) =>
      val c = cand(id, ref, "insert")
      assert(c.length >= ref.length, s"doc $id candidate shorter than ref")
      cLen += c.length; rLen += ref.length
      (1 to 4).foreach { n =>
        val cg = ngramCounts(c, n); val rg = ngramCounts(ref, n)
        num(n) += cg.map { case (g, cc) =>
          math.min(cc, rg.getOrElse(g, 0L))
        }.sum
        unclipped += cg.collect {
          case (g, cc) if rg.contains(g) => cc
        }.sum
        den(n) += math.max(c.length - n + 1, 0).toLong
      }
    }
    val p = (1 to 4).map(n => num(n).toDouble / den(n).toDouble)
    val bleu = math.sqrt(math.sqrt(((p(0) * p(1)) * p(2)) * p(3)))
    val row = Evals.q380.run(spark, sf001)
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)]
      .collect().head
    assert(row._1 == cLen && row._2 == rLen)
    assert(row._3 == cLen.toDouble / rLen.toDouble)
    assert(row._4 == p(0) && row._5 == p(1) &&
      row._6 == p(2) && row._7 == p(3))
    assert(row._8 == bleu)
    // structural gates: BP=1 regime genuinely holds; clipping fired
    // (some candidate gram count exceeded its reference count)
    assert(cLen > rLen)
    assert(unclipped > num.sum, "clipping never fired — dose broken")
    p.foreach(x => assert(x > 0.0 && x < 1.0, s"degenerate precision $x"))
  }

  test("q381 ROUGE-1/2 equals a from-scratch replay; P and R decouple") {
    val docs = docToks
    val got = Evals.q381.run(spark, sf001)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got.size == docs.map(_._2).distinct.length * 2)
    docs.groupBy(_._2).foreach { case (src, g) =>
      (1 to 2).foreach { n =>
        var m = 0L; var cg_t = 0L; var rg_t = 0L
        g.foreach { case (id, _, ref) =>
          val c = cand(id, ref, "drop")
          val cg = ngramCounts(c, n); val rg = ngramCounts(ref, n)
          m += cg.map { case (gr, cc) =>
            math.min(cc, rg.getOrElse(gr, 0L))
          }.sum
          cg_t += math.max(c.length - n + 1, 0).toLong
          rg_t += math.max(ref.length - n + 1, 0).toLong
        }
        val p = m.toDouble / cg_t.toDouble
        val r = m.toDouble / rg_t.toDouble
        val f = if (p + r == 0.0) 0.0 else (2.0 * p) * r / (p + r)
        val (_, _, gm, gc, gr2, gp, grr, gf) = got((src, n.toLong))
        assert(gm == m && gc == cg_t && gr2 == rg_t,
          s"$src n=$n counts: ($gm,$gc,$gr2) vs ($m,$cg_t,$rg_t)")
        assert(gp == p && grr == r && gf == f)
        // drops make the candidate shorter -> precision > recall
        assert(gp > grr, s"$src n=$n P=$gp !> R=$grr — drop dose broken")
      }
    }
  }

  test("q382 ROUGE-L equals a classic 2D LCS replay") {
    def lcs(a: Array[String], b: Array[String]): Long = {
      val dp = Array.ofDim[Long](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) =
          if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    val panel = docToks.filter(_._1 < 60)
      .map { case (id, _, ref0) =>
        val r = ref0.take(40)
        (id, r, cand(id, r, "drop"))
      }
    val got = Evals.q382.run(spark, sf001)
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.size == panel.length && panel.nonEmpty)
    var nontrivial = 0
    panel.foreach { case (id, r, c) =>
      val l = lcs(c, r)
      val (_, lenR, lenC, gl, gp, grr, gf) = got(id)
      assert(lenR == r.length && lenC == c.length)
      assert(gl == l, s"doc $id lcs: $gl vs $l")
      val p = l.toDouble / c.length.toDouble
      val rr = l.toDouble / r.length.toDouble
      val f = if (p + rr == 0.0) 0.0 else (2.0 * p) * rr / (p + rr)
      assert(gp == p && grr == rr && gf == f)
      assert(l > 0L, s"doc $id degenerate zero LCS")
      if (l < math.min(c.length, r.length)) nontrivial += 1
    }
    // the substitution lattice must make LCS a real subsequence search
    // (not just a length min) for most of the panel
    assert(nontrivial > panel.length / 2,
      s"only $nontrivial/${panel.length} panel docs have non-trivial LCS")
  }

  test("q383 Elo equals a sequential replay; rating total conserved") {
    // regenerate the expected-score table exactly as registration does
    val pos = (0 to 16).map(i =>
      math.round(100.0 / (1 + math.pow(10, -(i * 25) / 400.0))))
    val etab = (-16 to 16).map(t => if (t < 0) 100L - pos(-t) else pos(t))
    // table antisymmetry — the zero-sum invariant's foundation
    (-16 to 16).foreach(t =>
      assert(etab(t + 16) + etab(-t + 16) == 100L, s"asym at $t"))
    val matches = Tables.load(spark, sf001, "documents")
      .select(col("doc_id")).as[Long].collect().sorted
      .filter(_ < 500)
      .map { id => (id, id % 5, (id / 7) % 5, (id * 2654435761L) % 20) }
      .collect { case (id, a, b, u) if a != b =>
        val s =
          if (u == 3) 50L
          else if ((a > b && u >= 4) || (a < b && u < 3)) 100L
          else 0L
        (id, a.toInt, b.toInt, s)
      }
    val r = Array.fill(5)(100000L)
    matches.foreach { case (_, a, b, s) =>
      val diff = math.max(math.min(r(a) - r(b), 40000L), -40000L)
      val e = etab(((diff + 41250L) / 2500L).toInt)
      val delta = 16L * (s - e)
      r(a) += delta; r(b) -= delta
    }
    val got = Evals.q383.run(spark, sf001)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(got.size == 5)
    (0 to 4).foreach { m =>
      val (_, games, wins, draws, cp, rating) = got(m.toLong)
      assert(cp == r(m), s"model $m: $cp vs ${r(m)}")
      assert(rating == cp.toDouble / 100.0)
      val g = matches.filter(x => x._2 == m || x._3 == m)
      assert(games == g.length.toLong)
      assert(wins == g.count(x =>
        (x._2 == m && x._4 == 100L) || (x._3 == m && x._4 == 0L)).toLong)
      assert(draws == g.count(_._4 == 50L).toLong)
    }
    assert(got.values.map(_._5).sum == 500000L, "rating total drifted")
    // dose sanity: ratings must order by latent strength overall
    // (higher-index models favored), with real updates having happened
    assert(got(4L)._5 > got(0L)._5, "strength order lost")
    assert(got.values.exists(_._5 != 100000L), "no match moved a rating")
    assert(matches.exists(_._4 == 50L), "no draws dosed")
  }

  test("q384 CUSUM equals the max(0,·) recurrence replay; alarm at dose") {
    val pivot = java.time.LocalDateTime.parse("1999-01-01T00:00")
    val monthly = Tables.load(spark, sf001, "orders")
      .select(date_trunc("month", col("o_orderdate")).as("m"),
        col("o_totalprice"))
      .as[(java.time.LocalDateTime, Double)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1.toString)
      .map { case (m, g) =>
        val x = g.map(r => math.round(r._2 * 100)).sum
        (m, if (!m.isBefore(pivot)) x + x / 2 else x)
      }
    val preM = monthly.filter(_._1.isBefore(pivot))
    val nPre = preM.length.toLong
    val tPre = preM.map(_._2).sum
    val k = tPre / 4; val h = tPre
    var sPos = 0L; var sNeg = 0L
    val expect = monthly.map { case (m, v) =>
      val dev = v * nPre - tPre
      sPos = math.max(0L, sPos + dev - k)
      sNeg = math.max(0L, sNeg - (dev + k))
      (m, v, sPos, sNeg, sPos > h, sNeg > h)
    }
    val got = queries.Olap.q384.run(spark, sf001)
      .as[(java.time.LocalDateTime, Long, Long, Long, Boolean, Boolean)]
      .collect()
    assert(got.length == expect.length && got.nonEmpty)
    got.zip(expect).foreach { case (g, e) =>
      assert(g == e, s"month ${e._1}: $g vs $e")
    }
    // the dosed +50% shift must raise the up-alarm AFTER the pivot and
    // never before; the down-side must stay quiet
    val firstAlarm = expect.find(_._5).map(_._1)
    assert(firstAlarm.nonEmpty, "up-alarm never fired")
    assert(!firstAlarm.get.isBefore(pivot), s"alarm before dose: $firstAlarm")
    assert(expect.filter(e => e._1.isBefore(pivot)).forall(!_._5))
    assert(expect.forall(!_._6), "down-alarm fired on an up-shift dose")
  }

  test("q385 Good-Turing equals a from-scratch spectrum replay") {
    val grams = docToks.flatMap { case (_, _, t) =>
      t.sliding(3).filter(_.length == 3).map(_.mkString(" "))
    }
    val cnt = grams.groupBy(identity).map(_._2.length.toLong).toSeq
    val nTotal = cnt.sum
    val n1 = cnt.count(_ == 1L).toLong
    val spectrum = cnt.groupBy(identity)
      .map { case (c, g) => c -> g.length.toLong }
    val got = queries.Text.q385.run(spark, sf001)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toSeq == (1L to 5L),
      s"spectrum rows: ${got.map(_._1).mkString(",")}")
    got.foreach { case (c, nTypes, nNext, cStar, mass, p0) =>
      assert(nTypes == spectrum(c))
      assert(nNext == spectrum.getOrElse(c + 1, 0L))
      assert(cStar == ((c + 1) * nNext).toDouble / nTypes.toDouble)
      assert(mass == (c * nTypes).toDouble / nTotal.toDouble)
      assert(p0 == n1.toDouble / nTotal.toDouble)
      // Turing discount: adjusted count below raw count on a
      // long-tailed spectrum (N_{c+1} < N_c·(c+1)/c ⇒ c* < c... gated
      // empirically: the corpus spectrum is strictly decreasing)
      assert(cStar < c.toDouble, s"c=$c no discount: c*=$cStar")
    }
    assert(got.head._6 > 0.0 && got.head._6 < 0.5, "degenerate P0")
  }

  test("q386 t-closeness equals an EMD replay; dose separates at 0.18") {
    val rows = Tables.load(spark, sf001, "orders")
      .select(col("o_orderpriority"), col("o_orderdate"),
        col("o_totalprice"))
      .as[(String, java.time.LocalDateTime, Double)].collect()
      .map { case (pri, dt, tp) =>
        val yr = dt.getYear.toLong
        val cents = math.round(tp * 100) +
          (if (pri.startsWith("1") && yr % 2 == 1) 20000000L else 0L)
        (pri, yr, math.min(cents / 5000000L, 9L).toInt)
      }
    val tot = Array.fill(10)(0L)
    rows.foreach { case (_, _, b) => tot(b) += 1 }
    val nTotal = rows.length.toLong
    val got = queries.Curation.q386.run(spark, sf001)
      .as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    var anyViolates = false; var anyClean = false
    rows.groupBy(r => (r._1, r._2)).foreach { case ((pri, yr), g) =>
      val dist = Array.fill(10)(0L)
      g.foreach { case (_, _, b) => dist(b) += 1 }
      val nG = g.length.toLong
      if (nG >= 20) {
        var cp = 0L; var cq = 0L; var num = BigInt(0)
        (0 until 9).foreach { b =>
          cp += dist(b); cq += tot(b)
          num += (BigInt(cp) * nTotal - BigInt(cq) * nG).abs
        }
        val t = (num.toDouble) / (BigInt(nG) * nTotal * 9).toDouble
        val (_, _, gn, gt, gv) = got((pri, yr))
        assert(gn == nG && gt == t, s"($pri,$yr): ($gn,$gt) vs ($nG,$t)")
        assert(gv == (t > 0.18))
        val dosed = pri.startsWith("1") && yr % 2 == 1
        if (dosed) assert(gv, s"dosed group ($pri,$yr) t=$t under bar")
        else assert(!gv, s"clean group ($pri,$yr) t=$t over bar")
        if (gv) anyViolates = true else anyClean = true
      } else assert(!got.contains((pri, yr)), s"small group ($pri,$yr)")
    }
    assert(anyViolates && anyClean, "dose produced a one-sided audit")
  }

  test("q387 CvM equals a pooled-walk replay; dosed rejects, control not") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].collect()
      .filter(_._1 < 2000)
    val got = queries.Evals.q387.run(spark, sf001)
      .as[(String, Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    Seq(("dosed", 100L), ("control", 0L)).foreach { case (variant, shift) =>
      val vals = docs.map { case (id, nc) =>
        val arm = (id * 2654435761L) % 2
        (nc + (if (arm == 1) shift else 0L), arm)
      }.sortBy(_._1)
      val n = vals.count(_._2 == 0L).toLong
      val m = vals.length - n
      var a = 0L; var b = 0L; var sNum = 0L
      vals.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, g) =>
        a += g.count(_._2 == 0L); b += g.count(_._2 == 1L)
        val diff = a * m - b * n
        sNum += g.length * diff * diff
      }
      val t = sNum.toDouble / (n * m * (n + m) * (n + m)).toDouble
      val (_, gn, gm, gs, gt, gr) = got(variant)
      assert(gn == n && gm == m && gs == sNum,
        s"$variant: ($gn,$gm,$gs) vs ($n,$m,$sNum)")
      assert(gt == t && gr == (t > 0.461))
      if (variant == "dosed") assert(gr, s"dosed T=$t under 0.461")
      else assert(!gr, s"control T=$t over 0.461")
    }
  }

  test("q388 Fellegi-Sunter equals an in-block all-pairs replay") {
    case class R(key: Long, name: String, nation: Long, seg: String,
        bal: Long)
    val base = Tables.load(spark, sf001, "customer")
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast("long"), col("c_mktsegment"),
        col("c_acctbal"))
      .as[(Long, String, Long, String, Double)].collect()
      .map { case (k, nm, nat, seg, ab) =>
        R(k, nm, nat, seg, math.round(ab * 100))
      }
    val dirty = base.filter(_.key % 3 == 0).map { r =>
      R(r.key + 1000000000L,
        if (r.key % 5 == 0)
          r.name.dropRight(1) + ((r.key + 1) % 10).toString
        else r.name,
        if (r.key % 7 == 0) (r.nation + 1) % 25 else r.nation,
        r.seg,
        if (r.key % 11 == 0) r.bal + 1 else r.bal)
    }
    val recs = base ++ dirty
    val nRecs = recs.length.toLong
    def uNum[T](f: R => T): Long =
      recs.groupBy(f).values.map(g => g.length.toLong * g.length).sum
    val (uName, uNation, uBal) = (uNum(_.name), uNum(_.nation), uNum(_.bal))
    def factor(eq: Boolean, mn: Long, md: Long, u: Long): Double =
      if (eq) (mn * nRecs * nRecs).toDouble / (md * u).toDouble
      else ((md - mn) * nRecs * nRecs).toDouble /
        (md * (nRecs * nRecs - u)).toDouble
    val expect = recs.groupBy(r => (r.seg, (r.bal + 100000L) / 10000L))
      .values.flatMap { blk0 =>
        val blk = blk0.toSeq
        for {
          a <- blk; b <- blk if a.key < b.key
          nameEq = a.name == b.name
          natEq = a.nation == b.nation
          balEq = a.bal == b.bal
          nAgr = Seq(nameEq, natEq, balEq).count(identity)
          if nAgr >= 2
        } yield (a.key, b.key) -> (nameEq, natEq, balEq, nAgr.toLong,
          (factor(nameEq, 4, 5, uName) * factor(natEq, 6, 7, uNation)) *
            factor(balEq, 10, 11, uBal),
          if (nAgr == 3) "match" else "possible")
      }.toMap
    val got = queries.Dedup.q388.run(spark, sf001)
      .as[(Long, Long, Boolean, Boolean, Boolean, Long, Double, String)]
      .collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { case (ka, kb, ne, te, be, na, sc, v) =>
      assert(expect((ka, kb)) == ((ne, te, be, na, sc, v)),
        s"pair ($ka,$kb)")
    }
    // dose sanity: both verdicts occur; every exact-duplicate pair
    // scores above every single-disagreement pair
    val matches = got.filter(_._8 == "match").map(_._7)
    val possibles = got.filter(_._8 == "possible").map(_._7)
    assert(matches.nonEmpty && possibles.nonEmpty)
    assert(matches.min > possibles.max,
      "F-S score did not separate verdict levels")
    // all three disagreement kinds exercised
    assert(got.exists(!_._3) && got.exists(!_._4) && got.exists(!_._5))
  }

  test("q389 KNN-Shapley equals the Jia et al. closed-form replay") {
    val vecs = Tables.load(spark, sf001, "embeddings")
      .select(col("vec_id"), col("label").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Long, Array[Double])].collect()
      .map { case (id, l, v) =>
        // both engines round half AWAY FROM ZERO; Scala math.round is
        // half-toward-+inf (the q305 gotcha) — mirror the engines
        (id, l, v.map { x =>
          val y = x * 16384
          if (y < 0) -math.round(-y) else math.round(y)
        })
      }
    val train = vecs.filter(_._1 < 200).sortBy(_._1)
    val test = vecs.filter(v => v._1 >= 200 && v._1 < 220)
    val K = 5
    val acc = collection.mutable.Map[Long, List[(Long, Double)]]()
    test.foreach { case (teId, teL, teQ) =>
      val ranked = train.map { case (trId, trL, trQ) =>
        val d2 = trQ.zip(teQ).map { case (x, y) => (x - y) * (x - y) }.sum
        (d2, trId, if (trL == teL) 1L else 0L)
      }.sortBy(r => (r._1, r._2))
      val n = ranked.length
      val s = new Array[Double](n + 1)
      s(n) = ranked(n - 1)._3.toDouble / n.toDouble
      (n - 1 to 1 by -1).foreach { i =>
        s(i) = s(i + 1) +
          ((ranked(i - 1)._3 - ranked(i)._3).toDouble / K.toDouble) *
            math.min(K, i).toDouble / i.toDouble
      }
      (1 to n).foreach { i =>
        val trId = ranked(i - 1)._2
        acc(trId) = (teId, s(i)) :: acc.getOrElse(trId, Nil)
      }
    }
    val got = queries.Sim.q389.run(spark, sf001)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == train.length)
    got.foreach { case (vid, label, nTests, shap) =>
      assert(nTests == test.length.toLong)
      val sSum = acc(vid).sortBy(_._1)
        .foldLeft(0.0) { case (a, (_, s)) => a + s }
      assert(shap == sSum / test.length.toDouble, s"vec $vid")
      assert(label == train.find(_._1 == vid).get._2)
    }
    // efficiency axiom (Shapley): per test point the values sum to the
    // utility of the full set, so the grand total over train points is
    // (1/T)·Σ_test Σ_i s_i with each inner sum = P(knn label = y) ∈
    // [0,1]; and the dose must produce both helpful and harmful points
    assert(got.exists(_._4 > 0) && got.exists(_._4 < 0),
      "valuation degenerate: no positive or no negative points")
  }

  test("q390 Yuen trimmed t equals an exact rank-trim replay") {
    val rows = Tables.load(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Double)].collect()
      .map { case (k, tp) =>
        ((k * 2654435761L) % 2, math.round(tp * 100))
      }
    val got = queries.Evals.q390.run(spark, sf001)
      .as[(String, Long, Long, Long, Long, Double, Double, Double,
        Double, Boolean)].collect().map(r => r._1 -> r).toMap
    Seq(("dosed", true), ("control", false)).foreach { case (variant, dose) =>
      val stats = (0L to 1L).map { arm =>
        val vs = rows.filter(_._1 == arm)
          .map { case (a, c) => if (dose && a == 1) c + c / 7 else c }
          .sorted
        val n = vs.length; val g = n / 5; val h = n - 2 * g
        val trimmed = vs.slice(g, n - g)
        val tmean = trimmed.map(BigInt(_)).sum.toDouble / h.toDouble
        val lo = vs(g); val hi = vs(n - g - 1)
        val w = vs.map(v => math.min(math.max(v, lo), hi))
        val s1 = w.map(BigInt(_)).sum
        val s2 = w.map(x => BigInt(x) * x).sum
        val num = s2 * n - s1 * s1
        val dvar = num.toDouble / (BigInt(n) * h * (h - 1)).toDouble
        (n.toLong, h.toLong, tmean, dvar)
      }
      val t = (stats(0)._3 - stats(1)._3) /
        math.sqrt(stats(0)._4 + stats(1)._4)
      val df = ((stats(0)._4 + stats(1)._4) * (stats(0)._4 + stats(1)._4)) /
        ((stats(0)._4 * stats(0)._4) / (stats(0)._2 - 1).toDouble +
          (stats(1)._4 * stats(1)._4) / (stats(1)._2 - 1).toDouble)
      val (_, nA, nB, hA, hB, tmA, tmB, gt, gdf, rej) = got(variant)
      assert(nA == stats(0)._1 && nB == stats(1)._1)
      assert(hA == stats(0)._2 && hB == stats(1)._2)
      assert(tmA == stats(0)._3 && tmB == stats(1)._3)
      assert(gt == t && gdf == df, s"$variant t: $gt vs $t")
      assert(rej == (math.abs(t) > 1.96))
      if (dose) assert(rej, s"dosed |t|=${math.abs(t)} under 1.96")
      else assert(!rej, s"control |t|=${math.abs(t)} over 1.96")
    }
  }

  test("q391 sorted-neighborhood equals a rank-window replay; " +
    "complements q388's blocking") {
    case class R(key: Long, name: String, nation: Long, bal: Long)
    val base = Tables.load(spark, sf001, "customer")
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast("long"), col("c_acctbal"))
      .as[(Long, String, Long, Double)].collect()
      .map { case (k, nm, nat, ab) => R(k, nm, nat, math.round(ab * 100)) }
    val dirty = base.filter(_.key % 3 == 0).map { r =>
      R(r.key + 1000000000L,
        if (r.key % 5 == 0)
          r.name.dropRight(1) + ((r.key + 1) % 10).toString
        else r.name,
        if (r.key % 7 == 0) (r.nation + 1) % 25 else r.nation,
        if (r.key % 11 == 0) r.bal + 1 else r.bal)
    }
    val sorted = (base ++ dirty).sortBy(r => (r.name, r.key))
    val expect = (for {
      i <- sorted.indices; jd <- 1 to 3
      j = i + jd if j < sorted.length
      a = sorted(i); b = sorted(j)
      nameEq = a.name == b.name
      natEq = a.nation == b.nation
      balEq = a.bal == b.bal
      nAgr = Seq(nameEq, natEq, balEq).count(identity) if nAgr >= 2
    } yield (math.min(a.key, b.key), math.max(a.key, b.key)) ->
      (jd.toLong, nameEq, natEq, balEq, nAgr.toLong)).toMap
    val got = queries.Dedup.q391.run(spark, sf001)
      .as[(Long, Long, Long, Boolean, Boolean, Boolean, Long, Boolean)]
      .collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { case (lo, hi, dist, ne, te, be, na, isDup) =>
      assert(expect((lo, hi)) == ((dist, ne, te, be, na)),
        s"pair ($lo,$hi)")
      assert(isDup == (hi - lo == 1000000000L))
    }
    // complementarity: every name-unperturbed dupe is found (identical
    // sort keys are adjacent up to interlopers), INCLUDING the
    // +1-cent balance dupes that can cross q388's block boundary
    val unperturbedName = base.filter(r => r.key % 3 == 0 && r.key % 5 != 0)
    val found = got.filter(_._8).map(r => r._1).toSet
    unperturbedName.foreach { r =>
      assert(found.contains(r.key), s"missed name-stable dupe ${r.key}")
    }
    // and the window genuinely loses some digit-wrap name dupes while
    // q388 keeps them — the documented multi-pass motivation
    val wrapDupes = base.filter(r =>
      r.key % 15 == 0 && r.key % 10 == 9)
    if (wrapDupes.nonEmpty)
      assert(wrapDupes.exists(r => !found.contains(r.key)),
        "expected at least one digit-wrap dupe outside the window")
  }

  test("q392 rejection match equals an exact-accept replay; L1 shrinks") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)].collect()
      .map { case (id, src, nc) =>
        (id, src, math.min(nc / 64 / 2, 3L), (id * 2654435761L) % 1000000)
      }
    val raw = docs.filter(_._2 != "src1")
    val tgt = docs.filter(_._2 == "src1")
    val rawN = raw.groupBy(_._3).map { case (b, g) => b -> g.length.toLong }
    val tgtN = tgt.groupBy(_._3).map { case (b, g) => b -> g.length.toLong }
    val rT = raw.length.toLong; val tT = tgt.length.toLong
    val accN = raw.filter { case (_, _, b, u) =>
      BigInt(u) * rawN(b) * tT < BigInt(tgtN.getOrElse(b, 0L)) * rT *
        1000000L
    }.groupBy(_._3).map { case (b, g) => b -> g.length.toLong }
    val aT = accN.values.sum
    val bs = (0L to 3L).filter(b => rawN.contains(b) && tgtN.contains(b))
    val l1Pre = bs.map(b => math.abs(rawN(b).toDouble / rT.toDouble -
      tgtN(b).toDouble / tT.toDouble)).foldLeft(0.0)(_ + _)
    val l1Post = bs.map(b =>
      math.abs(accN.getOrElse(b, 0L).toDouble / aT.toDouble -
        tgtN(b).toDouble / tT.toDouble)).foldLeft(0.0)(_ + _)
    val got = queries.Curation.q392.run(spark, sf001)
      .as[(Long, Long, Long, Long, Double, Double, Double, Double,
        Double)].collect()
    assert(got.map(_._1).toSeq == bs)
    got.foreach { case (b, rn, tn, an, rs, ts, as_, pre, post) =>
      assert(rn == rawN(b) && tn == tgtN(b) && an == accN.getOrElse(b, 0L))
      assert(rs == rawN(b).toDouble / rT.toDouble)
      assert(ts == tgtN(b).toDouble / tT.toDouble)
      assert(as_ == accN.getOrElse(b, 0L).toDouble / aT.toDouble)
      assert(pre == l1Pre && post == l1Post)
    }
    assert(l1Post < l1Pre,
      s"resampling did not move toward the target: $l1Pre -> $l1Post")
    assert(aT < rT, "nothing was rejected — dose degenerate")
  }

  test("q393 chi2 features equals a contingency replay") {
    val chars = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .collect().toMap
    val docs = docToks.map { case (id, _, t) =>
      (t.distinct, if (chars(id) >= 400) 1L else 0L)
    }
    val nDocs = docs.length.toLong
    val nPos = docs.count(_._2 == 1L).toLong
    val got = queries.Text.q393.run(spark, sf001)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    val tokens = docs.flatMap(_._1).distinct
    assert(got.length == tokens.length)
    val gm = got.map(r => r._1 -> r).toMap
    tokens.foreach { tok =>
      val a = docs.count(d => d._1.contains(tok) && d._2 == 1L).toLong
      val b = docs.count(d => d._1.contains(tok) && d._2 == 0L).toLong
      val c = nPos - a; val dd = nDocs - nPos - b
      val det = BigInt(a) * dd - BigInt(b) * c
      val denom = BigInt(a + b) * (c + dd) * (a + c) * (b + dd)
      val chi2 =
        if (denom == 0) 0.0
        else (BigInt(nDocs) * det * det).toDouble / denom.toDouble
      val (_, ga, gb, gc, gd, gchi) = gm(tok)
      assert(ga == a && gb == b && gc == c && gd == dd, s"token $tok")
      assert(gchi == chi2, s"token $tok chi2: $gchi vs $chi2")
    }
    // ranking sanity: output is chi2-descending and non-degenerate
    assert(got.sliding(2).forall(p => p.head._6 >= p.last._6))
    assert(got.head._6 > got.last._6, "flat chi2 — label carries no signal")
  }

  test("q394 MTLD equals a sequential factor-walk replay") {
    def walk(toks: Seq[String]): (Long, Long, Long) = {
      var types = List.empty[String]; var tok = 0L; var factors = 0L
      toks.foreach { t =>
        val nt = if (types.contains(t)) types else types :+ t
        if (100L * nt.length < 72L * (tok + 1)) {
          factors += 1; types = Nil; tok = 0L
        } else { types = nt; tok += 1 }
      }
      (types.length.toLong, tok, factors)
    }
    def mtld(len: Int, w: (Long, Long, Long)): Double = {
      val (ty, tok, f) = w
      val denom = f.toDouble +
        (if (tok == 0L) 0.0
         else (1.0 - ty.toDouble / tok.toDouble) / 0.28)
      if (denom == 0.0) len.toDouble else len.toDouble / denom
    }
    val got = queries.Text.q394.run(spark, sf001)
      .as[(Long, String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val docs = docToks
    assert(got.size == docs.length)
    docs.foreach { case (id, src, t0) =>
      val t = t0.take(64).toSeq
      val wf = walk(t); val wb = walk(t.reverse)
      val mf = mtld(t.length, wf); val mb = mtld(t.length, wb)
      val (_, gsrc, gn, gff, gmf, gmb, gm2) = got(id)
      assert(gsrc == src && gn == t.length.toLong && gff == wf._3,
        s"doc $id")
      assert(gmf == mf && gmb == mb && gm2 == (mf + mb) / 2.0,
        s"doc $id mtld: ($gmf,$gmb) vs ($mf,$mb)")
    }
    // diversity must vary and factor breaks must genuinely occur
    val vals = got.values.map(_._7).toSeq
    assert(vals.distinct.size > 10)
    assert(got.values.exists(_._4 > 0L), "no factor break anywhere")
  }

  test("q395 conformal risk control equals a grid replay; bound holds") {
    val ids = Tables.load(spark, sf001, "documents")
      .select(col("doc_id")).as[Long].collect()
    case class D(id: Long, score: Long, cal: Boolean, bad: Boolean)
    val ds = ids.map { i =>
      val s = (i * 2654435761L) % 1000
      D(i, s, i % 2 == 0, (i * 40503L) % 1000 < s)
    }
    val nCal = ds.count(_.cal).toLong
    val grid = (0L to 40L).map(_ * 25)
    val calMiss = grid.map(l =>
      l -> ds.count(d => d.cal && d.bad && d.score < l).toLong).toMap
    val lamHat = grid.filter(l => (calMiss(l) + 1) * 10 <= nCal + 1).max
    val got = queries.Evals.q395.run(spark, sf001)
      .as[(Long, Long, Long, Boolean, Boolean, Double, Double, Double)]
      .collect()
    assert(got.length == grid.length)
    val nTest = ds.count(!_.cal).toLong
    val nTestBad = ds.count(d => !d.cal && d.bad).toLong
    got.foreach { case (l, cm, nc, ok, sel, tmr, tfnr, tflag) =>
      assert(cm == calMiss(l) && nc == nCal)
      assert(ok == ((cm + 1) * 10 <= nCal + 1))
      assert(sel == (l == lamHat))
      val tm = ds.count(d => !d.cal && d.bad && d.score < l).toLong
      assert(tmr == tm.toDouble / nTest.toDouble)
      assert(tfnr == tm.toDouble / nTestBad.toDouble)
      assert(tflag == ds.count(d => !d.cal && d.score >= l).toLong
        .toDouble / nTest.toDouble)
    }
    // the guarantee's realized read: held-out miss rate at the chosen
    // threshold stays near alpha (loss is the unconditional miss rate)
    val atSel = got.find(_._5).get
    assert(atSel._6 <= 0.12, s"test miss rate ${atSel._6} far above alpha")
    // selection is genuinely interior — neither flag-all nor flag-none
    assert(lamHat > 0 && lamHat < 1000)
  }

  test("q396 Tukey HSD equals an exact-moment replay; dose separates") {
    val rows = Tables.load(spark, sf001, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"))
      .as[(String, Double)].collect()
      .map { case (pri, tp) =>
        (pri.substring(0, 1).toLong, math.round(tp * 100)) }
    val got = queries.Evals.q396.run(spark, sf001)
      .as[(String, Long, Long, Long, Long, Double, Double, Double,
        Boolean)].collect()
    assert(got.length == 20)
    Seq(("dosed", 2000000L), ("control", 0L)).foreach { case (variant, dose) =>
      val groups = rows.groupBy(_._1).map { case (idx, g) =>
        val vs = g.map { case (_, c) => c + idx * dose }
        val s1 = vs.map(BigInt(_)).sum
        val s2 = vs.map(v => BigInt(v) * v).sum
        idx -> (vs.length.toLong, s1, s2)
      }
      val nTot = groups.values.map(_._1).sum
      val k = groups.size.toLong
      val ssw = groups.toSeq.sortBy(_._1).foldLeft(0.0) {
        case (acc, (_, (n, s1, s2))) =>
          acc + (s2.toDouble - (s1 * s1).toDouble / n.toDouble)
      }
      val msw = ssw / (nTot - k).toDouble
      val mine = got.filter(_._1 == variant)
      assert(mine.length == 10)
      mine.foreach { case (_, i, j, ni, nj, mi, mj, q, rej) =>
        val (gn, gs1, _) = groups(i); val (hn, hs1, _) = groups(j)
        assert(ni == gn && nj == hn)
        assert(mi == gs1.toDouble / gn.toDouble)
        assert(mj == hs1.toDouble / hn.toDouble)
        val expQ = math.abs(mi - mj) / math.sqrt(
          (msw / 2.0) * (1.0 / gn.toDouble + 1.0 / hn.toDouble))
        assert(q == expQ, s"$variant ($i,$j): $q vs $expQ")
        assert(rej == (q > 3.858))
      }
      if (dose > 0) {
        assert(mine.count(_._9) >= 5, "dosed separation lost")
        assert(mine.exists(r => !r._9),
          "every dosed pair rejected — familywise bar not exercised")
      } else assert(mine.forall(!_._9), "control rejected a pair")
    }
  }

  test("q397 ROC/PR equals a sweep replay; exact AUC matches rank form") {
    val ids = Tables.load(spark, sf001, "documents")
      .select(col("doc_id")).as[Long].collect()
    val sc = ids.map { i =>
      val s = (i * 2654435761L) % 1000
      (s, if ((i * 40503L) % 1000 < s) 1L else 0L)
    }
    val pT = sc.count(_._2 == 1L).toLong
    val nT = sc.length - pT
    // exact AUC two independent ways: midrank formula and pair count
    val byScore = sc.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, g) => (s, g.length.toLong, g.count(_._2 == 1L).toLong) }
    var cum = 0L; var r2 = BigInt(0)
    byScore.foreach { case (_, cnt, pos) =>
      r2 += BigInt(pos) * (2 * cum + cnt + 1); cum += cnt
    }
    val aucExact = (r2 - BigInt(pT) * (pT + 1)).toDouble /
      (BigInt(2) * pT * nT).toDouble
    val pairWins = (for {
      (sp, yp) <- sc if yp == 1L; (sn, yn) <- sc if yn == 0L
    } yield if (sp > sn) 2L else if (sp == sn) 1L else 0L).sum
    assert(math.abs(aucExact - pairWins.toDouble / (2.0 * pT * nT))
      < 1e-12, "midrank and pair-count AUC disagree")
    val got = queries.Evals.q397.run(spark, sf001)
      .as[(Long, Long, Long, Double, Double, Double, Double, Double)]
      .collect()
    assert(got.length == 21)
    var pf = -1.0; var pt = -1.0; var trap = 0.0
    got.sortBy(_._1).foreach { case (thr, tp, fp, tpr, fpr, prec, _, _) =>
      val etp = sc.count(x => x._1 >= thr && x._2 == 1L).toLong
      val efp = sc.count(x => x._1 >= thr && x._2 == 0L).toLong
      assert(tp == etp && fp == efp, s"thr $thr")
      assert(tpr == etp.toDouble / pT.toDouble)
      assert(fpr == efp.toDouble / nT.toDouble)
      val ep = if (etp + efp == 0) 1.0
        else etp.toDouble / (etp + efp).toDouble
      assert(prec == ep)
      if (pf != -1.0) trap += (pf - fpr) * (pt + tpr) / 2.0
      pf = fpr; pt = tpr
    }
    got.foreach { r =>
      assert(r._8 == aucExact, s"auc_exact ${r._8} vs $aucExact")
      assert(r._7 == trap, s"auc_trapezoid ${r._7} vs $trap")
    }
    // the dose makes a genuinely informative classifier, and the grid
    // trapezoid must approximate the exact value from below-ish
    assert(aucExact > 0.8 && aucExact < 1.0)
    assert(math.abs(trap - aucExact) < 0.02)
  }

  test("q398 isotonic fit equals minimax replay AND classic stack PAV") {
    val ids = Tables.load(spark, sf001, "documents")
      .select(col("doc_id")).as[Long].collect()
    val byB = ids.map { i =>
      val s = (i * 2654435761L) % 1000
      (s / 20, if ((i * 40503L) % 1000 < s) 1L else 0L)
    }.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, g) => (b, g.length.toLong, g.map(_._2).sum) }
    val m = byB.length
    val ss = (0 to m).map(t => byB.take(t).map(_._3).sum)
    val cc = (0 to m).map(t => byB.take(t).map(_._2).sum)
    val minimax = (1 to m).map { i =>
      (1 to i).map { j =>
        (i to m).map { k =>
          (ss(k) - ss(j - 1)).toDouble / (cc(k) - cc(j - 1)).toDouble
        }.min
      }.max
    }
    // independent classic PAV with exact rational merges
    val stack = collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    byB.foreach { case (_, n, pos) =>
      var blk = (pos, n, 1)
      while (stack.nonEmpty &&
        stack.last._1 * blk._2 >= blk._1 * stack.last._2) {
        val top = stack.remove(stack.length - 1)
        blk = (blk._1 + top._1, blk._2 + top._2, blk._3 + top._3)
      }
      stack += blk
    }
    val pav = stack.flatMap { case (p, n, w) =>
      Seq.fill(w)(p.toDouble / n.toDouble) }
    val got = queries.Evals.q398.run(spark, sf001)
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.length == m)
    got.zipWithIndex.foreach { case ((b, n, pos, raw, fit), i) =>
      assert(b == byB(i)._1 && n == byB(i)._2 && pos == byB(i)._3)
      assert(raw == pos.toDouble / n.toDouble)
      assert(fit == minimax(i), s"bucket $b: $fit vs ${minimax(i)}")
      assert(fit == pav(i), s"bucket $b minimax != PAV: $fit vs ${pav(i)}")
    }
    // monotone, and pooling genuinely happened
    assert(got.sliding(2).forall(p => p.head._5 <= p.last._5))
    assert((1 until m).exists(i => byB(i - 1)._3.toDouble /
      byB(i - 1)._2 > byB(i)._3.toDouble / byB(i)._2),
      "no raw violation — PAV had nothing to pool")
  }

  test("q399 Kaplan-Meier equals a product-limit replay") {
    val keys = Tables.load(spark, sf001, "customer")
      .select(col("c_custkey")).as[Long].collect()
    val subj = keys.map { k =>
      ((k * 40503L) % 400 + 1, (k * 7919L) % 5 == 0)
    }
    val total = subj.length.toLong
    val byT = subj.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
      (t, g.count(!_._2).toLong, g.count(_._2).toLong)
    }
    var leftBefore = 0L; var s = 1.0
    val expect = byT.map { case (t, ev, cen) =>
      val nRisk = total - leftBefore
      s = s * ((nRisk - ev).toDouble / nRisk.toDouble)
      leftBefore += ev + cen
      (t, nRisk, ev, cen, s)
    }
    val got = queries.Olap.q399.run(spark, sf001)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) => assert(g == e, s"t=${e._1}") }
    // censoring is load-bearing and the curve genuinely decays (the
    // final step may legitimately reach exactly 0 when the last
    // at-risk cohort all event)
    assert(byT.exists(_._3 > 0L))
    assert(got.last._5 >= 0.0 && got.last._5 < 0.1)
    assert(got.exists(r => r._5 > 0.0 && r._5 < 1.0))
    assert(got.sliding(2).forall(p => p.head._5 >= p.last._5))
  }

  test("q400 log-rank equals a per-time replay; dosed rejects only") {
    val keys = Tables.load(spark, sf001, "customer")
      .select(col("c_custkey")).as[Long].collect()
    val got = queries.Olap.q400.run(spark, sf001)
      .as[(String, Long, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    Seq(("dosed", true), ("control", false)).foreach { case (variant, dose) =>
      val subj = keys.map { k =>
        val g = (k * 2654435761L) % 2
        val t0 = (k * 40503L) % 400 + 1
        val t = if (dose && g == 1) t0 + t0 / 3 else t0
        (t, g, (k * 7919L) % 5 == 0)
      }
      val times = subj.filter(!_._3).map(_._1).distinct.sorted
      var o1 = 0L; var e1 = 0.0; var v = 0.0
      times.foreach { t =>
        val n = subj.count(_._1 >= t).toLong
        val n1 = subj.count(x => x._1 >= t && x._2 == 1L).toLong
        val d = subj.count(x => x._1 == t && !x._3).toLong
        o1 += subj.count(x => x._1 == t && !x._3 && x._2 == 1L).toLong
        e1 += d.toDouble * n1.toDouble / n.toDouble
        if (n > 1) v += d.toDouble * (n1.toDouble / n.toDouble) *
          ((n - n1).toDouble / n.toDouble) *
          ((n - d).toDouble / (n - 1).toDouble)
      }
      val chi2 = ((o1.toDouble - e1) * (o1.toDouble - e1)) / v
      val (_, gO, gE, gV, gChi, rej) = got(variant)
      assert(gO == o1 && gE == e1 && gV == v, s"$variant components")
      assert(gChi == chi2 && rej == (chi2 > 3.841459))
      if (dose) assert(rej, s"dosed chi2=$chi2 under bar")
      else assert(!rej, s"control chi2=$chi2 over bar")
    }
  }
}
