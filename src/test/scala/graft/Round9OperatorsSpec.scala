package graft

import org.apache.spark.sql.functions._

import graft.queries.Evals

/** Round-9 operator family: independent driver replays (third
  * implementations — plain Scala collections, no Spark, no SQL) of each
  * new operator at sf0.001, plus the structural invariants the oracle
  * compare cannot see. Doubles compare with ==, not tolerance, because
  * both sides compute from identical integer operands in an identical
  * order (the Round8OperatorsSpec discipline).
  */
class Round9OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def docIds: Array[(Long, String, String)] =
    Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("source"), col("lang"))
      .as[(Long, String, String)].collect()

  test("q352 McNemar cells and statistic equal a from-scratch replay") {
    val rows = docIds.map { case (id, src, _) =>
      val u = (id * 2654435761L) % 100
      (src, u < 70 || id % 11 == 0, u < 60 || id % 9 == 0)
    }
    val got = Evals.q352.run(spark, sf001)
      .as[(String, Long, Long, Long, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, g) =>
      val n = g.length.toLong
      val n01 = g.count(r => r._2 && !r._3).toLong
      val n10 = g.count(r => !r._2 && r._3).toLong
      val (_, gn, g01, g10, accA, accB, chi2, rej) = got(src)
      assert(gn == n && g01 == n01 && g10 == n10,
        s"$src cells: ($gn,$g01,$g10) vs ($n,$n01,$n10)")
      assert(accA == g.count(_._2).toLong.toDouble / n.toDouble)
      assert(accB == g.count(_._3).toLong.toDouble / n.toDouble)
      val d = math.max(math.abs(n01 - n10) - 1, 0L)
      val expChi2 =
        if (n01 + n10 == 0) 0.0
        else (d * d).toDouble / (n01 + n10).toDouble
      assert(chi2 == expChi2, s"$src chi2: $chi2 vs $expChi2")
      assert(rej == (expChi2 > 3.841459))
    }
    // dose sanity: both discordant cells must fire somewhere
    assert(rows.exists(r => r._2 && !r._3) && rows.exists(r => !r._2 && r._3))
  }

  test("q353 Fleiss kappa equals a from-scratch replay; bounds hold") {
    val ratings = docIds.flatMap { case (id, _, lang) =>
      (0L to 4L).map { a =>
        val t = (id * 7) % 3
        val label =
          if ((id + a * 31) % (4 + a) == 0) (t + 1 + a % 2) % 3 else t
        (lang, id, label)
      }
    }
    val got = Evals.q353.run(spark, sf001)
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    ratings.groupBy(_._1).foreach { case (lang, g) =>
      val n = g.map(_._2).distinct.length.toLong
      val cells = g.groupBy(r => (r._2, r._3)).map(_._2.length.toLong)
      val sSq = cells.map(c => c * c).sum
      val cSq = g.groupBy(_._3).map(_._2.length.toLong)
        .map(c => c * c).sum
      val pBar = (sSq - n * 5).toDouble / (n * 20).toDouble
      val pE = cSq.toDouble / (n * n * 25).toDouble
      val kappa = (pBar - pE) / (1.0 - pE)
      val (_, gn, gs, gc, gpb, gpe, gk) = got(lang)
      assert(gn == n && gs == sSq && gc == cSq,
        s"$lang counts: ($gn,$gs,$gc) vs ($n,$sSq,$cSq)")
      assert(gpb == pBar && gpe == pE && gk == kappa)
      // Fleiss bounds: perfect agreement would be 1; the dose deviates
      // on a sparse lattice so agreement stays high but imperfect
      assert(gk > 0.0 && gk < 1.0, s"$lang kappa $gk degenerate")
    }
  }

  test("q354 ANOVA F equals a from-scratch replay with ordered folds") {
    val xs = Tables.load(spark, sf001, "orders")
      .select(col("o_orderstatus"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .as[(String, Long)].collect()
    val groups = xs.groupBy(_._1).toSeq.sortBy(_._1)
    val k = groups.length.toLong
    val nTotal = xs.length.toLong
    val tSum = xs.map(_._2).sum
    val grandMean = tSum.toDouble / nTotal.toDouble
    // fold in group-key order with explicit 0.0 init — both engines do
    val ssb = groups.foldLeft(0.0) { case (acc, (_, g)) =>
      val n = g.length.toLong
      val m = g.map(_._2).sum.toDouble / n.toDouble
      acc + n.toDouble * (m - grandMean) * (m - grandMean)
    }
    val ssw = groups.foldLeft(0.0) { case (acc, (_, g)) =>
      val n = g.length.toLong
      val sx = BigInt(g.map(_._2).sum)
      val sxx = g.map(e => BigInt(e._2) * BigInt(e._2)).sum
      acc + (BigInt(n) * sxx - sx * sx).toDouble / n.toDouble
    }
    val f = (ssb / (k - 1).toDouble) / (ssw / (nTotal - k).toDouble)
    val got = Evals.q354.run(spark, sf001)
      .as[(Long, Long, Double, Double, Double, Double, Boolean)]
      .collect()
    assert(got.length == 1)
    val (gk, gn, gssb, gssw, gf, geta, grej) = got.head
    assert(gk == k && gn == nTotal)
    assert(gssb == ssb, s"ss_between: $gssb vs $ssb")
    assert(gssw == ssw, s"ss_within: $gssw vs $ssw")
    assert(gf == f && geta == ssb / (ssb + ssw))
    assert(grej == (f > 2.9957))
    // decomposition sanity: SSB + SSW == total SS up to the fold's
    // float error; both parts strictly positive on this fixture
    assert(ssb > 0.0 && ssw > 0.0)
  }
}
