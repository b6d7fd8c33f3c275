package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks for the determinism kernel — the helpers every
  * oracle-checked aggregate rides on. Each property runs the Spark
  * expression over ScalaCheck-generated inputs (fixed seed → reproducible)
  * and compares against an exact BigDecimal reference model computed
  * driver-side.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g(Gen.Parameters.default, Seed(42L + i)))

  // 2-decimal money values (the fixture's l_extendedprice/o_totalprice
  // shape), both signs, up to 10^7
  private val moneyGen: Gen[List[Double]] =
    Gen.nonEmptyListOf(
      Gen.chooseNum(-999999999L, 999999999L).map(_ / 100.0))

  test("dsum equals exact BigDecimal sum for any 2-decimal inputs") {
    // batched: one Spark job for all cases, keyed by case id
    val cases = samples(moneyGen, 25)
    val df = cases.zipWithIndex
      .flatMap { case (xs, i) => xs.map(x => (i, x)) }
      .toDF("case_id", "v")
    val got = df.groupBy("case_id").agg(Det2.dsum).as[(Int, Double)]
      .collect().toMap
    cases.zipWithIndex.foreach { case (xs, i) =>
      val expected = xs.map(BigDecimal(_).setScale(2)).sum.toDouble
      assert(got(i) == expected, s"case $i")
    }
  }

  test("avgCents equals half-away-from-zero BigDecimal average") {
    val cases = samples(moneyGen, 25)
    val df = cases.zipWithIndex
      .flatMap { case (xs, i) => xs.map(x => (i, x)) }
      .toDF("case_id", "v")
    val got = df.groupBy("case_id").agg(Det2.avgCents).as[(Int, Long)]
      .collect().toMap
    cases.zipWithIndex.foreach { case (xs, i) =>
      val cents = xs.map(x => BigDecimal(x).setScale(2) * 100)
      // BigDecimal HALF_UP rounds half away from zero for negatives too,
      // matching the avgCents contract
      val expected = (cents.sum / cents.size)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(got(i) == expected, s"case $i: xs=${xs.take(5)}…")
    }
  }

  test("vec_dot equals driver-side sequential dot product") {
    val vecGen = for {
      n <- Gen.chooseNum(1, 64)
      a <- Gen.listOfN(n, Gen.chooseNum(-1000, 1000).map(_ / 8.0))
      b <- Gen.listOfN(n, Gen.chooseNum(-1000, 1000).map(_ / 8.0))
    } yield (a, b)
    val cases = samples(vecGen, 25)
    val got = cases.toDF("a", "b")
      .select(graft.functions.VecDot.dot(col("a"), col("b")))
      .as[Double].collect()
    cases.zip(got).foreach { case ((a, b), g) =>
      // eighths are exactly representable → the fold is exact
      var expected = 0.0
      a.zip(b).foreach { case (x, y) => expected += x * y }
      assert(g == expected)
    }
  }

  test("hll_md5: partition-order invariant, dup-insensitive, sane error") {
    import graft.functions.HllMd5
    // event_id: cardinality well above m=64, where the raw estimate is
    // the operating regime (small-range bias correction is deliberately
    // omitted — see HllMd5's scaladoc)
    val vals = Tables.load(spark, sf001, "events")
      .select(col("event_id").cast("string").as("sv"))
    def est(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(HllMd5.sketch(col("sv"))).as[Double].head()
    val base = est(vals)
    // merge correctness: any partitioning, any duplication → same registers
    assert(est(vals.repartition(13)) == base, "repartition changed estimate")
    assert(est(vals.unionByName(vals)) == base, "duplicates changed estimate")
    val exact = vals.distinct().count().toDouble
    assert(exact > 2.5 * 64, "fixture too small for the raw-estimate regime")
    assert(math.abs(base - exact) / exact < 0.30,
      s"estimate $base too far from exact $exact for m=64")
    // empty input: all-zero registers report 0.0, not the raw-estimate
    // floor of ~45 (the function is SQL-registered and user-facing)
    assert(est(vals.filter(col("sv").isNull)) == 0.0,
      "empty sketch should report 0.0")
  }

  test("kmv_md5: k smallest hashes exactly, partition/dup invariant") {
    import graft.functions.KmvMd5
    val vals = Tables.load(spark, sf001, "events")
      .select(col("event_id").cast("string").as("sv"))
    def sk(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(KmvMd5.sketch(col("sv"))).as[Seq[Long]].head()
    val base = sk(vals)
    assert(base.length == KmvMd5.K)
    assert(base == base.sorted && base.distinct.length == base.length,
      "sketch must be sorted distinct values")
    // any partitioning, any duplication → the same value set
    assert(sk(vals.repartition(13)) == base)
    assert(sk(vals.unionByName(vals)) == base)
    // the sketch is EXACTLY the k smallest distinct 60-bit md5 values
    val expect = vals.distinct().collect().map { r =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(0).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(KmvMd5.HexChars)
      java.lang.Long.parseLong(hex, 16)
    }.distinct.sorted.take(KmvMd5.K).toSeq
    assert(base == expect, "sketch is not the true bottom-k")
    // under-k input: sketch IS the distinct hash set (exact regime)
    val tiny = vals.limit(10)
    val tinyDistinct = tiny.distinct().count()
    assert(sk(tiny).length.toLong == tinyDistinct)
    // empty input: empty sketch
    assert(sk(vals.filter(col("sv").isNull)).isEmpty)
  }

  test("cms_md5: partition invariant, conserves mass, never underestimates") {
    import graft.functions.CountMinMd5
    val toks = Tables.load(spark, sf001, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    def matrix(df: org.apache.spark.sql.DataFrame): Seq[Seq[Long]] =
      df.agg(CountMinMd5.sketch(col("tok")).as("m"))
        .as[Seq[Seq[Long]]].head()
    val base = matrix(toks)
    assert(base.length == CountMinMd5.D)
    assert(base.forall(_.length == CountMinMd5.W))
    // merge correctness: any partitioning folds to the same cell sums
    assert(matrix(toks.repartition(13)) == base,
      "repartition changed the sketch")
    // mass conservation: every row counts every occurrence exactly once
    val n = toks.count()
    base.foreach(row => assert(row.sum == n, "row mass != stream length"))
    // CMS one-sided error: estimate >= exact count for EVERY key
    toks.groupBy(col("tok")).count().collect().foreach { r =>
      val (tok, cnt) = (r.getString(0), r.getLong(1))
      val est = (0 until CountMinMd5.D)
        .map(d => base(d)(CountMinMd5.bucket(d, tok))).min
      assert(est >= cnt, s"cms underestimated '$tok': $est < $cnt")
    }
    // SQL surface: registered via GraftExtensions
    toks.createOrReplaceTempView("cms_toks")
    val viaSql = spark.sql(
      "SELECT cms_md5(tok) AS m FROM cms_toks").as[Seq[Seq[Long]]].head()
    assert(viaSql == base, "SQL-registered form diverged from Column API")
  }

  test("bloom_md5: partition invariant, no false negatives, bounded fp") {
    import graft.functions.BloomMd5
    val keys = Tables.load(spark, sf001, "orders")
      .select(col("o_custkey").cast("string").as("k"))
    def words(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(BloomMd5.sketch(col("k")).as("b")).as[Seq[Long]].head()
    val base = words(keys)
    assert(base.length == BloomMd5.WORDS)
    // merge is bitwise OR: any partitioning / duplication → same words
    assert(words(keys.repartition(13)) == base,
      "repartition changed the sketch")
    assert(words(keys.unionByName(keys)) == base,
      "duplicates changed the sketch")
    def member(ws: Seq[Long], key: String): Boolean =
      (0 until BloomMd5.K).forall { h =>
        val p = BloomMd5.bitPos(h, key)
        (ws(p >>> 6) & (1L << (p & 63))) != 0
      }
    // the bloom guarantee: EVERY inserted key tests present
    val present = keys.distinct().as[String].collect()
    present.foreach(k =>
      assert(member(base, k), s"false negative for inserted key $k"))
    // false-positive rate on keys never inserted stays near theory:
    // (1 - e^(-K·n/M))^K, ~3e-7 at n=150 — a generous 100× margin
    val absent = (1000000 until 1010000).map(_.toString)
      .filterNot(present.toSet)
    val fp = absent.count(member(base, _))
    val n = present.length.toDouble
    val theory = math.pow(
      1 - math.exp(-BloomMd5.K * n / BloomMd5.M), BloomMd5.K)
    assert(fp <= math.max(1.0, 100 * theory * absent.size),
      s"fp rate ${fp.toDouble / absent.size} far above theory $theory")
    // empty input: no bits set, nothing is a member
    val empty = words(keys.filter(lit(false)))
    assert(empty.forall(_ == 0L), "empty sketch has set bits")
    assert(!member(empty, "42"), "empty sketch claimed membership")
    // SQL surface: registered via GraftExtensions
    keys.createOrReplaceTempView("bloom_keys")
    val viaSql = spark.sql(
      "SELECT bloom_md5(k) AS b FROM bloom_keys").as[Seq[Long]].head()
    assert(viaSql == base, "SQL-registered form diverged from Column API")
  }

  test("connected components match a union-find reference on random graphs") {
    import scala.collection.mutable
    val gen = for {
      n <- Gen.choose(1, 40)
      m <- Gen.choose(0, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L)
        b <- Gen.choose(0L, n - 1L)
      } yield (a, b))
    } yield (n, edges)
    samples(gen, 6).foreach { case (n, es) =>
      // driver-side union-find with union-by-min: root of each set is
      // always its minimum member, so find(i) IS the expected label
      val parent = mutable.ArrayBuffer.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect =
        (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val got = graft.operators.Components
        .connectedComponents(
          spark.range(n.toLong).toDF("id"), es.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"n=$n edges=$es")
    }
  }

  test("GlobalOrder cumsum equals the single-partition window on random data") {
    // the central scale primitive behind every corpus-wide rank/ntile/
    // cumsum in the repo, checked against the naive definition on
    // random inputs under several partition layouts (keys DISTINCT —
    // with duplicate order keys an inclusive running sum is inherently
    // order-dependent, the documented caveat)
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    (1 to 3).foreach { trial =>
      val n = 200 + rnd.nextInt(300)
      val keys = rnd.shuffle((0 until 5 * n).toList).take(n).map(_.toLong)
      val rows = keys.map(k => (k, (rnd.nextInt(1000) - 200).toLong))
      val expect = rows.sortBy(_._1)
        .scanLeft((Long.MinValue, 0L)) { case ((_, acc), (k, v)) =>
          (k, acc + v)
        }.drop(1).toMap
      Seq(1, 7, 32).foreach { parts =>
        val df = rows.toDF("k", "v").repartition(parts)
        val got = graft.operators.GlobalOrder
          .withOrderedCumsum(df, Seq(col("k")), col("v"), "cum")
          .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cum"))
          .toMap
        graft.Caches.release()
        assert(got == expect, s"trial $trial parts $parts diverged")
      }
    }
  }

  test("GlobalOrder cummax rejects duplicate order keys at runtime") {
    // the r5-flagged API trap: with ties the exclusive prefix max is
    // partition-placement-dependent — the operator must fail loudly,
    // not return a placement-lottery result (docstring contract, now
    // enforced; q194 collapses to distinct keys before calling)
    import spark.implicits._
    val dup = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.GlobalOrder
        .withOrderedCummax(dup, Seq(col("k").desc), col("v"), "m").count()
    }
    graft.Caches.release()
    assert(e.getMessage.contains("DISTINCT order keys"))
    // distinct keys (desc order, the q194 shape) still work
    val ok = Seq((3L, 10L), (2L, 20L), (1L, 5L)).toDF("k", "v")
    val got = graft.operators.GlobalOrder
      .withOrderedCummax(ok, Seq(col("k").desc), col("v"), "m")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("m")).toMap
    graft.Caches.release()
    assert(got == Map(3L -> Long.MinValue, 2L -> 10L, 1L -> 20L))
  }

  test("salted join cardinality is invariant in the salt count") {
    val ev = Tables.load(spark, sf001, "events").limit(200)
    val dim = ev.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val plain = ev.join(dim, Seq("user_id")).count()
    Seq(1, 3, 16).foreach { n =>
      val salted = graft.operators.Skew
        .saltedJoin(ev, dim, "user_id", col("event_id"), n).count()
      assert(salted == plain, s"nSalts=$n")
    }
  }

  test("whole-query results are invariant under shuffle-partition count") {
    // the repo-wide determinism claim — md5 coordinates, total ORDER BY,
    // order-independent aggregates — tested end to end: identical rows
    // (same order, same doubles) under different parallelism for the
    // partitioning-sensitive representatives: LSH pairs, stratified
    // sample, global shuffle export, sequence packing, two-level domain
    // cap, bucket-sketch quantiles
    val names = Seq(
      "q24_minhash_lsh", "q73_stratified_sample",
      "q79_jsonl_shuffle_export", "q90_sequence_packing",
      "q93_url_dedup", "q119_quantile_sketch",
      // r5: the KMV overlap matrix — sketch state must be a value SET
      // (partition-order-free) end to end, estimates included
      "q215_kmv_overlap",
      // r6: incremental clustering (state ∪ cross ∪ new-new label
      // merge must converge to the same min-id labels under any
      // layout) and MaxSim (integer max/sum must not depend on
      // aggregation order)
      "q236_incremental_clusters", "q234_maxsim_rerank")
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    def runAll(): Map[String, Seq[String]] = names.map { n =>
      val rows =
        try SparkEntry.queries(n)(spark, sf001).collect()
          .map(_.toString).toSeq
        finally graft.Caches.release()
      n -> rows
    }.toMap
    try {
      conf.set("spark.sql.shuffle.partitions", "4")
      val a = runAll()
      conf.set("spark.sql.shuffle.partitions", "7")
      val b = runAll()
      names.foreach { n =>
        assert(a(n).nonEmpty, s"$n returned no rows")
        assert(a(n) == b(n), s"$n changed under repartitioning")
      }
    } finally conf.set("spark.sql.shuffle.partitions", orig)
  }

  test("whole-query results are invariant under join strategy and AQE") {
    // physical-plan independence: disabling broadcast joins (everything
    // becomes shuffle/sort-merge) and adaptive execution must not change
    // a single row or byte — the join-heavy representatives: broadcast
    // top-N join, fact join, salted skew join, outer/semi/anti variants,
    // range join, native as-of physical operator, conditional-broadcast
    // decontamination
    val names = Seq(
      "q04_topn_percentiles", "q12_fact_join", "q36_salted_join",
      "q38_join_variants", "q40_range_join", "q87_asof_native",
      "q71_decontamination",
      // r5: correlated-MIN decorrelation joins, asymmetric containment
      // (prefix/index joins), positional phrase-index self-joins
      "q206_min_cost_supplier", "q219_containment_dedup",
      "q230_phrase_search")
    val conf = spark.conf
    val origBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val origAqe = conf.get("spark.sql.adaptive.enabled")
    def runAll(): Map[String, Seq[String]] = names.map { n =>
      val rows =
        try SparkEntry.queries(n)(spark, sf001).collect()
          .map(_.toString).toSeq
        finally graft.Caches.release()
      n -> rows
    }.toMap
    try {
      val a = runAll()
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      val b = runAll()
      names.foreach { n =>
        assert(a(n).nonEmpty, s"$n returned no rows")
        assert(a(n) == b(n), s"$n changed under forced sort-merge/no-AQE")
      }
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", origBc)
      conf.set("spark.sql.adaptive.enabled", origAqe)
    }
  }

  private object Det2 {
    val dsum = graft.queries.Det.dsum(col("v")).as("s")
    val avgCents = graft.queries.Det.avgCents(col("v")).as("s")
  }
}
