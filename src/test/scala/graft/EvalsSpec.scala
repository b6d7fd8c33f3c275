package graft

import org.apache.spark.sql.functions._
import graft.queries.Evals

/** Eval-statistics family: binomial identity pins, a full third-
  * implementation driver replay of the pass@k estimator and of all three
  * Bradley–Terry MM iterations (exact double equality — the fold-order
  * discipline is the thing under test), and the statistical sanity the
  * dose must produce (non-degenerate, skill-ordered). */
class EvalsSpec extends SparkSpec {
  import spark.implicits._

  test("binomSql matches the driver twin over the whole m domain") {
    val rows = spark.range(0, 11).select(col("id").as("m"))
      .withColumn("b1", expr(Evals.binomSql("m", 1, "div")))
      .withColumn("b5", expr(Evals.binomSql("m", 5, "div")))
      .withColumn("b10", expr(Evals.binomSql("m", 10, "div")))
      .as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (m, b1, b5, b10) =>
      assert(b1 == Evals.binom(m, 1) && b1 == m)
      assert(b5 == Evals.binom(m, 5))
      assert(b10 == Evals.binom(m, 10) && b10 == (if (m == 10) 1L else 0L))
    }
    // Pascal cross-check at the used n: C(10,5) = 252
    assert(Evals.binom(10, 5) == 252L)
  }

  test("q303 pass@k equals a from-scratch driver replay; pass@1 = mean c/n") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("source"))
      .as[(Long, String)].collect()
    val bySource = docs.groupBy(_._2)
    val expected = (for {
      (src, rows) <- bySource
      k <- Seq(1, 5, 10)
    } yield {
      val cs = rows.map { case (id, _) => (id * 13) % 11 }
      val n = cs.length.toLong
      val cnk = Evals.binom(10, k)
      val sumFail = cs.map(c => Evals.binom(10 - c, k)).sum
      ((src, k.toLong),
        (n, cs.sum.toDouble / n,
          (n * cnk - sumFail).toDouble / (n * cnk).toDouble))
    }).toMap
    val got = Evals.q303.run(spark, sf001)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.length == expected.size)
    got.foreach { case (src, k, n, meanC, passK) =>
      val (en, emc, epk) = expected((src, k))
      assert(n == en && meanC == emc && passK == epk,
        s"replay mismatch at ($src, $k)")
      if (k == 1) // estimator collapses to the plain pass rate at k=1
        assert(math.abs(passK - meanC / 10.0) < 1e-12)
    }
    // monotone in k for every source (more samples can only help)
    got.groupBy(_._1).values.foreach { rows =>
      val byK = rows.sortBy(_._2).map(_._5)
      assert(byK.zip(byK.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q304 ratings equal a from-scratch MM replay, bit for bit") {
    val ids = Tables.load(spark, sf001, "documents")
      .select(col("doc_id")).as[Long].collect()
    val votes = ids.flatMap { id =>
      val (a, b) = (id % 5, (id / 5) % 5)
      if (a == b) None
      else {
        val u = (id * 2654435761L) % 97
        Some((a, b, if (u < 48 + (a - b) * 8) a else b))
      }
    }
    // ordered-pair stats
    val edges = votes.flatMap { case (a, b, w) =>
      Seq(((a, b), if (w == a) 1L else 0L), ((b, a), if (w == b) 1L else 0L))
    }.groupBy(_._1).map { case ((i, j), vs) =>
      (i, j, vs.size.toLong, vs.map(_._2).sum)
    }.toSeq
    val wins = edges.groupBy(_._1).map { case (i, es) =>
      i -> es.map(_._4).sum
    }
    val games = edges.groupBy(_._1).map { case (i, es) =>
      i -> es.map(_._3).sum
    }
    var p = (0L to 4L).map(i => i -> 1.0).toMap
    (1 to 3).foreach { _ =>
      p = (0L to 4L).map { i =>
        val den = edges.filter(_._1 == i).sortBy(_._2)
          .foldLeft(0.0) { case (acc, (_, j, n, _)) =>
            acc + n.toDouble / (p(i) + p(j))
          }
        i -> wins(i).toDouble / den
      }.toMap
    }
    val z = (0L to 4L).foldLeft(0.0)((acc, i) => acc + p(i))
    val got = Evals.q304.run(spark, sf001)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L to 4L).toSeq)
    got.foreach { case (m, g, w, rating) =>
      assert(g == games(m) && w == wins(m), s"stats mismatch at model $m")
      assert(rating == p(m) / z, s"rating not bit-equal at model $m")
    }
    // dose sanity: matchup-shifted threshold makes 4 strictly outrate 0,
    // and shares form a distribution
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-12)
    assert(got.last._4 > got.head._4, "dose failed to order the extremes")
  }

  test("q307 soundex: driver replay matches Spark's builtin on the dose + classics") {
    import graft.queries.Text
    // published census values for the edge-case classics
    val classics = Map(
      "ASHCRAFT" -> "A261", "PFISTER" -> "P236", "TYMCZAK" -> "T522",
      "JOHNSON" -> "J525", "SCOTT" -> "S300", "ANDERSON" -> "A536",
      "WALKER" -> "W426", "LLOYD" -> "L300", "JACKSON" -> "J250",
      "ROBERT" -> "R163", "RUPERT" -> "R163")
    classics.foreach { case (n, code) =>
      assert(Text.soundexRef(n) == code, s"replay wrong on classic $n")
    }
    val sparkCodes = Text.SoundexNames
      .toDF("name").withColumn("code", soundex(col("name")))
      .as[(String, String)].collect().toMap
    Text.SoundexNames.foreach { n =>
      assert(sparkCodes(n) == Text.soundexRef(n),
        s"Spark builtin and census replay diverge on $n")
    }
    // the dose must exercise a collision (blocking groups > 1 name)
    val byCode = Text.SoundexNames.groupBy(Text.soundexRef)
    assert(byCode.values.exists(_.size > 1), "no blocking collision dosed")
    assert(byCode.size == 23)
  }

  test("q311 kappa equals a from-scratch replay and sits in (0, 1)") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("lang"))
      .as[(Long, String)].collect()
    val expected = docs.groupBy(_._2).map { case (lang, rows) =>
      val labs = rows.map { case (id, _) =>
        val t = (id * 7) % 3
        (if (id % 5 == 0) (t + 1) % 3 else t,
          if (id % 4 == 0) (t + 2) % 3 else t)
      }
      val n = labs.length.toLong
      val agree = labs.count(p => p._1 == p._2).toLong
      val s = (0L to 2L).map(c =>
        labs.count(_._1 == c).toLong * labs.count(_._2 == c)).sum
      lang -> (n, agree, s,
        agree.toDouble / n.toDouble,
        s.toDouble / (n * n).toDouble,
        (agree * n - s).toDouble / (n * n - s).toDouble)
    }
    val got = graft.queries.Evals.q311.run(spark, sf001)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length == expected.size)
    got.foreach { case (lang, n, agree, s, po, pe, kappa) =>
      val (en, ea, es, epo, epe, ek) = expected(lang)
      assert((n, agree, s) == ((en, ea, es)), s"counts mismatch at $lang")
      assert(po == epo && pe == epe && kappa == ek, s"stats at $lang")
      // dosed annotators are better than chance but imperfect
      assert(kappa > 0.0 && kappa < 1.0, s"degenerate kappa at $lang")
      assert(po > pe, "observed agreement must beat chance by dose design")
    }
  }

  test("q316 F1 equals a replay; micro-F1 is accuracy in single-label multiclass") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect()
    def pred(id: Long): (Long, Long) = {
      val t = (id * 7) % 3
      (t, if (id % 7 == 0) (t + 2) % 3
      else if (id % 4 == 0) (t + 1) % 3 else t)
    }
    val expected = docs.groupBy(_._2).map { case (lang, rows) =>
      val tp = rows.map(r => pred(r._1))
      val n = tp.length.toLong
      val correct = tp.count(x => x._1 == x._2).toLong
      def f1(c: Long): Double = {
        val tpc = tp.count(x => x._1 == c && x._2 == c).toLong
        val fpc = tp.count(x => x._2 == c && x._1 != c).toLong
        val fnc = tp.count(x => x._1 == c && x._2 != c).toLong
        if (2 * tpc + fpc + fnc == 0) 0.0
        else (2 * tpc).toDouble / (2 * tpc + fpc + fnc).toDouble
      }
      val micro = (2 * correct).toDouble /
        (2 * correct + (n - correct) + (n - correct)).toDouble
      lang -> (n, correct, micro, ((f1(0) + f1(1)) + f1(2)) / 3.0)
    }
    val got = graft.queries.Evals.q316.run(spark, sf001)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.length == expected.size)
    got.foreach { case (lang, n, nc, micro, macroF) =>
      val (en, ec, emi, ema) = expected(lang)
      assert((n, nc) == ((en, ec)) && micro == emi && macroF == ema,
        s"F1 mismatch at $lang")
      // single-label multiclass: micro-F1 == accuracy, exactly
      assert(micro == nc.toDouble / n.toDouble, s"micro != accuracy, $lang")
      assert(macroF > 0.0 && macroF < 1.0, s"degenerate macro at $lang")
    }
  }
}
