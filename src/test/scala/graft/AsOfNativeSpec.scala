package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf
import graft.plans.{AsOfJoinExec, AsOfJoinNative}

/** The native AsOfJoinExec against the composition-based asofJoin — two
  * independent implementations of the same contract — plus physical-plan
  * shape and edge-case semantics the fixture can't produce.
  */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native and composed as-of join agree row-for-row on the fixture") {
    val a = AsOf.q39.run(spark, sf001).collect().toSeq
    val b = AsOf.q87.run(spark, sf001).collect().toSeq
    assert(a == b)
  }

  test("physical plan uses AsOfJoinExec with co-partitioned sorted inputs") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "payload")
    val right = Seq((1L, 5L, 2.0)).toDF("k", "rt", "v")
    val df = AsOfJoinNative.asofJoin(left, right, "k", "t", "rt", Seq("v"))
    df.collect() // force planning through AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
    val exec = df.queryExecution.executedPlan.collectFirst {
      case e: AsOfJoinExec => e
    }
    // AQE may hide the node pre-execution; the string check above plus
    // result checks elsewhere cover it if collectFirst misses
    exec.foreach { e =>
      assert(e.requiredChildOrdering.forall(_.size == 2))
    }
  }

  test("pre-snapshot and no-snapshot left rows carry NULL") {
    val left = Seq((1L, 10L), (1L, 30L), (2L, 10L))
      .toDF("k", "t")
    val right = Seq((1L, 20L, 100.0), (3L, 1L, 9.0))
      .toDF("k", "rt", "v")
    val out = AsOfJoinNative.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("k", "t").collect()
    assert(out.map(r =>
      if (r.isNullAt(2)) null else r.getDouble(2)).toSeq ==
      Seq(null, 100.0, null))
  }

  test("equal timestamps match; latest at-or-before wins") {
    val left = Seq((1L, 10L), (1L, 25L)).toDF("k", "t")
    val right = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0))
      .toDF("k", "rt", "v")
    val out = AsOfJoinNative.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("t").collect()
    assert(out.map(_.getDouble(2)).toSeq == Seq(1.0, 2.0))
  }

  test("null keys and null times never match") {
    val left = Seq(
      (Option(1L), Option(10L)),
      (Option.empty[Long], Option(10L)),
      (Option(1L), Option.empty[Long]))
      .toDF("k", "t")
    val right = Seq((Option(1L), Option(5L), 7.0)).toDF("k", "rt", "v")
    val out = AsOfJoinNative.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .collect()
    val matchedRows = out.filter(!_.isNullAt(2))
    assert(matchedRows.length == 1)
    assert(matchedRows.head.getLong(0) == 1L && matchedRows.head.getLong(1) == 10L)
  }

  test("rightValues clashing with left columns are rejected") {
    val left = Seq((1L, 10L, 5.0)).toDF("k", "t", "v")
    val right = Seq((1L, 5L, 7.0)).toDF("k", "rt", "v")
    intercept[IllegalArgumentException] {
      AsOfJoinNative.asofJoin(left, right, "k", "t", "rt", Seq("v"))
    }
  }

  test("mismatched key or time types are rejected") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val rightBadKey = Seq(("1", 5L, 7.0)).toDF("k", "rt", "v")
    intercept[IllegalArgumentException] {
      AsOfJoinNative.asofJoin(left, rightBadKey, "k", "t", "rt", Seq("v"))
    }
  }
}
