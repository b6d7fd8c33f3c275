package graft

import org.apache.spark.sql.functions._
import graft.queries.Geo

/** Geo family: the grid join's covering guarantee (the claim the oracle
  * compare deliberately does NOT check — both engines generate candidates
  * the same way, so losslessness vs all-pairs needs its own proof), the
  * exact-boundary inclusivity, and the Morton bijection + pyramid
  * conservation the quadtree rollup rests on. */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("q301 grid join equals brute-force all-pairs (no false negatives)") {
    // the grid join's aggregate output, recomputed from first principles:
    // every unordered customer pair within the radius, found by cross join
    val pts = Tables.load(spark, sf001, "customer")
      .select(
        col("c_custkey").as("id"), col("c_mktsegment").as("seg"),
        expr(Geo.xExpr("c_custkey")).as("x"),
        expr(Geo.yExpr("c_custkey")).as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val r2 = 4096L * 4096L
    val brute = (for {
      a <- pts; b <- pts
      if a._1 < b._1
      d2 = (a._3 - b._3) * (a._3 - b._3) + (a._4 - b._4) * (a._4 - b._4)
      if d2 <= r2
    } yield {
      val (s1, s2) =
        if (a._2 <= b._2) (a._2, b._2) else (b._2, a._2)
      ((s1, s2), d2)
    }).groupBy(_._1).map { case (k, vs) =>
      (k._1, k._2, vs.size.toLong, vs.map(_._2).sum, vs.map(_._2).min)
    }.toSeq.sortBy(t => (t._1, t._2))
    assert(brute.nonEmpty, "fixture dose yields zero near pairs — degenerate")
    val got = Geo.q301.run(spark, sf001)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == brute, "grid join diverged from all-pairs ground truth")
  }

  test("grid covering: pitch == radius puts any in-radius pair in adjacent cells") {
    // exact-boundary adversaries: distance exactly R along an axis with the
    // two points in DIFFERENT cells (4095 vs 8191: cells 0 and 1), the
    // diagonal corner pair just inside, and a pair 1 past the radius
    val cell = 4096L
    val cases = Seq(
      (0L, 4095L, 0L, 8191L, 0L, true), // |dx|=R exactly, cells differ by 1
      (4096L, 4096L, 6992L, 6992L, 0L, true), // diag 2896²·2 = R²−2048 in
      (0L, 0L, 0L, 4097L, 0L, false)) // 1 past the radius
    cases.foreach { case (xa, ya, xb, yb, _, expectPair) =>
      val d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      val within = d2 <= cell * cell
      assert(within == expectPair, s"case ($xa,$ya)-($xb,$yb)")
      if (within) {
        // the covering lemma the 3×3 probe relies on
        assert(math.abs(xa / cell - xb / cell) <= 1 &&
          math.abs(ya / cell - yb / cell) <= 1,
          "in-radius pair not in adjacent cells — probe would miss it")
      }
    }
    // and the lemma in general, by exhaustive 1-D check at the pitch scale:
    // |xa-xb| <= cell ⇒ |cxa-cxb| <= 1 for every boundary alignment
    (0L until cell).foreach { off =>
      val (a, b) = (off, off + cell)
      assert(math.abs(a / cell - b / cell) <= 1)
    }
  }

  test("morton code is a bijection and the SQL form matches the driver twin") {
    val df = spark.range(0, 65536)
      .select((col("id") % 256).as("px"), (col("id") / 256).cast("long")
        .as("py"))
      .withColumn("code", expr(Geo.mortonExpr("px", "py", 8, "div")))
    val rows = df.select("px", "py", "code")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 65536)
    assert(rows.map(_._3).distinct.length == 65536, "morton not injective")
    rows.foreach { case (px, py, code) =>
      assert(code == Geo.morton(px, py, 8), s"SQL/driver diverge at $px,$py")
      assert(code >= 0 && code < 65536)
    }
  }

  test("q302 pyramid conservation: totals invariant across depths") {
    val out = Geo.q302.run(spark, sf001)
      .select("depth", "total_pts", "n_tiles")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val n = Tables.load(spark, sf001, "customer").count()
    assert(out.map(_._1).toSeq == Seq(2L, 4L, 6L, 8L))
    out.foreach { case (d, total, tiles) =>
      assert(total == n, s"depth $d lost points: $total != $n")
      assert(tiles <= (1L << (2 * d.toInt)), s"depth $d overflows its grid")
    }
    // coarser depths never have more non-empty tiles than finer ones
    assert(out.map(_._3).toSeq == out.map(_._3).toSeq.sorted,
      "non-empty tile count must be monotone in depth")
  }
}
