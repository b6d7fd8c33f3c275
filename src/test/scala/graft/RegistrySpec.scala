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
