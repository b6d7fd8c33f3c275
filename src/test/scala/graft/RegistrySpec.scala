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
