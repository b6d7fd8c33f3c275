package graft

import graft.queries.Registry

/** Structural contract every registered query must satisfy (the driver's
  * smoke + compare preconditions): runs, returns rows, has well-formed
  * column names, and SQL-oracle queries keep name parity with the Spark
  * result (the driver sorts columns BY NAME before hashing).
  */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and non-empty") {
    val names = Registry.all.map(_.name)
    assert(names.nonEmpty)
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("[a-z0-9_]+")))
  }

  test("entry point returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query ships its plan artifacts") {
    // the reference treats EXPLAIN as a first-class committed artifact
    // (plans/*.plan.txt per query); this pins that contract so a new
    // query cannot land without its PlanDump run (q201-q205 briefly
    // drifted in r5 before this guard)
    val missing = Registry.all.map(_.name).filterNot { n =>
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"plans/$n.plan.txt"))
    }
    assert(missing.isEmpty,
      s"queries without committed plan artifacts (run PlanDump): " +
        missing.mkString(", "))
  }

  test("fixture geometry the calibrated queries assume (fail loudly on regeneration)") {
    import org.apache.spark.sql.functions._
    // q218/q220 batch deciles define batches as doc-order slices over a
    // DENSE doc_id ∈ [0, n): a sparse regeneration would keep them
    // correct but silently skew batch sizes — surface it here instead
    val docs = Tables.load(spark, sf001, "documents")
    val r = docs.agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
      countDistinct(col("doc_id")).as("nd"), count(lit(1)).as("n")).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == r.getLong(3) - 1 &&
      r.getLong(2) == r.getLong(3),
      s"documents.doc_id is no longer dense over [0, n): $r — revisit " +
        "q218/q220 batch definitions")
    // many reference-parity queries carry literal date-range predicates
    // calibrated to the fixture's 1995-2001 span (SURVEY §6); q208/q222/
    // q223/q225/q226 now derive their pivot year from max(l_shipdate),
    // and this gate makes the remaining literals safe: a regenerated
    // fixture outside the span fails HERE by name, not by silently
    // thinning those queries
    val span = Tables.load(spark, sf001, "lineitem")
      .agg(min(col("l_shipdate")).as("mn"), max(col("l_shipdate")).as("mx"))
      .head()
    assert(String.valueOf(span.get(0)) <= "1996-01-01" &&
      String.valueOf(span.get(1)) >= "2001-01-01",
      s"lineitem date span $span no longer covers [1996, 2001] — the " +
        "literal date predicates in Core/Olap need recalibration")
    // q212's τ=0.3 was calibrated so the decontamination flags SOME but
    // not ALL of the training side; a regenerated embedding geometry
    // that breaks either bound must fail here, not thin silently
    val flagged = Registry.all.find(_.name == "q212_semantic_decontam")
      .get.run(spark, sf001).count()
    val nTrain = Tables.load(spark, sf001, "embeddings")
      .filter(col("vec_id") >= 16).count()
    assert(flagged > 0 && flagged < nTrain,
      s"q212 τ=0.3 yield degenerate: $flagged of $nTrain flagged — " +
        "recalibrate τ for the regenerated embedding geometry")
    // q229's τ=0.9 was calibrated above the fixture's random-pair
    // cosine ceiling (~0.85): near-dup pairs must stay RARE (fewer than
    // one per document) or the hashed-vector geometry has changed
    val pairs = Registry.all.find(_.name == "q229_feature_hashing")
      .get.run(spark, sf001).count()
    val nDocs = r.getLong(3)
    assert(pairs > 0 && pairs < nDocs,
      s"q229 τ=0.9 yield degenerate: $pairs pairs over $nDocs docs — " +
        "recalibrate τ for the regenerated text geometry")
  }

  Registry.all.foreach { q =>
    test(s"${q.name} runs on sf0.001 with rows and sane schema") {
      val df = q.run(spark, sf001)
      val cols = df.columns.toSeq
      assert(cols.nonEmpty && cols.distinct.size == cols.size,
        s"duplicate/empty columns: $cols")
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }
}
