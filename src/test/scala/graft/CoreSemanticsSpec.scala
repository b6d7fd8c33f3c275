package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.queries.{Core, Det}

/** Hand-checked semantics for the reference-parity core (SURVEY §2): the
  * determinism helpers, aggregation/window/join invariants.
  */
class CoreSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("avgCents rounds half away from zero on exact ties") {
    // 0.015 avg → 1.5 cents → 2 (away from zero); -0.015 → -2.
    val df = Seq(0.01, 0.02).toDF("v")
    val up = df.agg(Det.avgCents(col("v"))).as[Long].head()
    assert(up == 2L, s"expected 2, got $up")
    val dn = Seq(-0.01, -0.02).toDF("v")
      .agg(Det.avgCents(col("v"))).as[Long].head()
    assert(dn == -2L, s"expected -2, got $dn")
  }

  test("dsum is exact on 2-decimal doubles") {
    // 0.1+0.2 != 0.3 in naive double addition; decimal path is exact.
    val s = Seq(0.1, 0.2).toDF("v").agg(Det.dsum(col("v"))).as[Double].head()
    assert(s == 0.3)
  }

  test("q01 groups by return flag: one row per flag, counts sum to filtered") {
    val li = Tables.load(spark, sf001, "lineitem")
    val expected = li.filter($"l_shipdate" >= "1999-01-01").count()
    val out = Core.q01.run(spark, sf001).collect()
    assert(out.map(_.getString(0)).toSet.subsetOf(Set("A", "N", "R")))
    assert(out.map(_.getLong(1)).sum == expected)
  }

  test("q03 first year of each partition has NULL yoy fields") {
    val rows = Core.q03.run(spark, sf001).collect()
    val byFlag = rows.groupBy(_.getString(0))
    byFlag.values.foreach { part =>
      val first = part.minBy(_.getInt(1))
      assert(first.isNullAt(3) && first.isNullAt(4),
        s"first row of partition must carry NULL yoy: $first")
      assert(part.count(_.isNullAt(3)) == 1)
    }
  }

  test("q04 returns at most 10 customers, all in the filtered top-10") {
    val rows = Core.q04.run(spark, sf001).collect()
    assert(rows.map(_.getLong(0)).distinct.length <= 10)
    // percentiles are monotone per group
    rows.foreach { r =>
      val Seq(p25, p50, p75, p95) = Seq(4, 5, 6, 7).map(r.getDouble)
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95, s"non-monotone: $r")
    }
  }

  test("q04c t-digest certificate: same groups as exact q04, all ranks ok") {
    // q04's top-10-customer groups are tiny at every test SF, where any
    // sketch legitimately diverges from percentile_cont interpolation in
    // VALUE — which is exactly why q04b/q04c emit the rank CERTIFICATE
    // instead: the rank-interval bound holds at every group size. Value
    // accuracy is pinned on large groups in the next test.
    val exactKeys = Core.q04.run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    for (q <- Seq(Core.q04b, Core.q04c)) {
      val cert = q.run(spark, sf001).collect()
      assert(cert.map(r => (r.getLong(0), r.getString(1))).toSet == exactKeys,
        s"${q.name}: group keys drifted from exact q04")
      cert.foreach { r =>
        assert(r.getAs[Boolean]("p50_rank_ok") &&
          r.getAs[Boolean]("p95_rank_ok"),
          s"${q.name}: rank certificate failed on $r")
      }
    }
  }

  test("t-digest percentiles track exact values on real grouped data") {
    import graft.functions.TDigestQuantile
    // (year, returnflag) lineitem groups: hundreds of rows each — the
    // regime where the sketch must track percentile_cont closely
    val li = Tables.load(spark, sf001, "lineitem")
      .groupBy(year(col("l_shipdate")).as("yr"), col("l_returnflag"))
    val exact = li
      .agg(expr("percentile(l_extendedprice, 0.5D)").as("e50"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    val sketch = li
      .agg(TDigestQuantile.of(col("l_extendedprice"), 0.5).as("s50"))
      .collect()
    var checked = 0
    sketch.foreach { r =>
      val key = (r.getInt(0), r.getString(1))
      val (e50, n) = exact(key)
      if (n >= 100) {
        checked += 1
        assert(math.abs(r.getDouble(2) - e50) / e50 < 0.03,
          s"$key: sketch ${r.getDouble(2)} vs exact $e50 (n=$n)")
      }
    }
    assert(checked >= 5, s"only $checked groups big enough — fixture change?")
  }

  test("tdigest quantile: accuracy and mergeability on a known distribution") {
    import graft.functions.TDigestQuantile
    import spark.implicits._
    // 1..100000 shuffled deterministically across partitions: true
    // quantile q is q*100001
    val n = 100000
    val df = (1 to n).map(_.toDouble).toDF("v").repartition(17)
    val got = df.agg(
      TDigestQuantile.of(col("v"), 0.5).as("p50"),
      TDigestQuantile.of(col("v"), 0.99).as("p99"),
      TDigestQuantile.of(col("v"), 0.001).as("p001")).head()
    assert(math.abs(got.getDouble(0) - n * 0.5) / (n * 0.5) < 0.01)
    assert(math.abs(got.getDouble(1) - n * 0.99) / (n * 0.99) < 0.01)
    // tail accuracy is t-digest's selling point: tight even at q=0.001
    assert(math.abs(got.getDouble(2) - n * 0.001) / (n * 0.001) < 0.10)
  }

  test("tdigest edge cases: SQL literal, NaN ordering, empty group") {
    import spark.implicits._
    // plain 0.5 literal (DECIMAL in Spark SQL) must work via the SQL face
    Seq(1.0, 2.0, 3.0).toDF("v").createOrReplaceTempView("tdq_v")
    val viaSql = spark.sql(
      "SELECT tdigest_quantile(v, 0.5) FROM tdq_v").head().getDouble(0)
    assert(viaSql == 2.0, s"SQL-literal percentage broken: $viaSql")
    // NaN sorts greatest (builtin percentile ordering): p50 of
    // [1, 2, NaN, NaN] lands in real values, p95 in the NaN mass
    val nan = Seq(1.0, 2.0, Double.NaN, Double.NaN).toDF("v")
    val r = nan.agg(
      graft.functions.TDigestQuantile.of(col("v"), 0.25).as("lo"),
      graft.functions.TDigestQuantile.of(col("v"), 0.95).as("hi")).head()
    assert(!r.getDouble(0).isNaN && r.getDouble(0) <= 2.0, s"lo: $r")
    assert(r.getDouble(1).isNaN, s"hi must fall in the NaN mass: $r")
    // empty group → SQL NULL (not NaN)
    val empty = Seq(1.0).toDF("v").filter(col("v") > 5)
      .agg(graft.functions.TDigestQuantile.of(col("v"), 0.5)).head()
    assert(empty.isNullAt(0), s"empty group must be NULL: $empty")
  }

  test("q06 is sorted by (o_orderdate desc, o_totalprice desc) with 100 rows") {
    val rows = Core.q06.run(spark, sf001).collect()
    assert(rows.length == 100)
    val keys = rows.map { r =>
      (r.getAs[java.time.LocalDateTime](3), r.getDouble(2))
    }
    keys.sliding(2).foreach {
      case Array((d1, p1), (d2, p2)) =>
        val c = d1.compareTo(d2)
        assert(c > 0 || (c == 0 && p1 >= p2))
      case _ => ()
    }
  }

  test("q11 join does not drop customers (inner join on complete dims)") {
    val total = Tables.load(spark, sf001, "customer").count()
    val out = Core.q11.run(spark, sf001)
      .agg(sum("n_customers")).as[Long].head()
    assert(out == total)
  }

  test("q12 revenue matches independent computation") {
    val li = Tables.load(spark, sf001, "lineitem")
    val expected = li
      .select(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double")).as[Double].head()
    val got = Core.q12.run(spark, sf001)
      .agg(sum("revenue")).as[Double].head()
    assert(math.abs(got - expected) < 1e-6)
  }

  test("q13 counts match actual table counts") {
    val out = Core.q13.run(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("lineitem", "orders", "customer").foreach { t =>
      assert(out(t) == Tables.load(spark, sf001, t).count())
    }
  }

  test("every oracle query name exists in the queries map") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("q119 sketch quantiles honor the 3-digit relative-error bound") {
    // DDSketch-style guarantee: the reported midpoint and the true
    // quantile share a bucket spanning scale = lo/100..lo/999 of the
    // value, so relative error ≤ (scale/2)/lo ≤ 0.5%; allow 1% to cover
    // the discrete-rank vs interpolated-quantile convention gap.
    Core.q119.run(spark, sf001).collect().foreach { r =>
      Seq(("sk_p25", "ex_p25"), ("sk_p50", "ex_p50"),
        ("sk_p75", "ex_p75"), ("sk_p95", "ex_p95")).foreach {
        case (sk, ex) =>
          val s = r.getAs[Long](sk).toDouble
          val e = r.getAs[Double](ex)
          assert(math.abs(s - e) / e <= 0.01,
            s"$sk=$s vs $ex=$e exceeds the sketch error bound")
      }
    }
  }
}
