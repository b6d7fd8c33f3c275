package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.IngestJob

/** DSv2 pushdown contract: predicates, projection, and limit reach the
  * source; results equal the same query over the original table.
  */
class TsvSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_tsv").toString
    Tables.load(spark, sf001, "events")
      .select("event_id", "user_id", "event_type", "value")
      .write.mode("overwrite").option("header", true).option("sep", "\t")
      .csv(d)
    d
  }

  private def tsv =
    spark.read.format("graft.sources.tsv")
      .schema(IngestJob.eventsTsvSchema).load(dir)

  test("pushed filters and pruned columns appear in the physical plan") {
    val df = tsv.filter(col("event_type") === "click" && col("value") > 50.0)
      .select("event_id", "value")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters=[") && plan.contains("EqualTo"),
      s"no pushed filters in:\n$plan")
    assert(plan.contains("ReadSchema=[event_id,value]"),
      s"projection not pruned in:\n$plan")
  }

  test("filtered scan equals the parquet-side query") {
    val viaTsv = tsv
      .filter(col("event_type") === "click" && col("value") > 50.0)
      .agg(count(lit(1)), sum(col("event_id"))).collect().head
    val viaParquet = Tables.load(spark, sf001, "events")
      .filter(col("event_type") === "click" && col("value") > 50.0)
      .agg(count(lit(1)), sum(col("event_id"))).collect().head
    assert(viaTsv == viaParquet)
  }

  test("unsupported predicates stay in Spark as residuals, results correct") {
    // endsWith is not pushable in our source → Spark must evaluate it
    val got = tsv.filter(col("event_type").endsWith("ck")).count()
    val expected = Tables.load(spark, sf001, "events")
      .filter(col("event_type").endsWith("ck")).count()
    assert(got == expected && got > 0)
  }

  test("limit pushdown short-circuits the scan") {
    val df = tsv.limit(7)
    assert(df.queryExecution.executedPlan.toString.contains("PushedLimit=7"))
    assert(df.count() == 7)
  }

  test("row count matches source table") {
    assert(tsv.count() == Tables.load(spark, sf001, "events").count())
  }

  test("aggregate pushdown: per-partition group aggregates computed at source") {
    val df = tsv
      .filter(col("value") >= 10.0)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sv"),
        min(col("value")).as("mn"),
        max(col("user_id")).as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation=true"),
      s"aggregation not pushed:\n$plan")
    val got = df.orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    val expected = Tables.load(spark, sf001, "events")
      .filter(col("value") >= 10.0)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sv"),
        min(col("value")).as("mn"),
        max(col("user_id")).as("mx"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got == expected, s"pushed aggregate differs:\n$got\n$expected")
  }

  test("global aggregate (no group-by) pushes down too") {
    val got = tsv.agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
    assert(got.queryExecution.executedPlan.toString
      .contains("PushedAggregation=true"))
    val Array(r) = got.collect()
    val Array(e) = Tables.load(spark, sf001, "events")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s")).collect()
    assert(r.getLong(0) == e.getLong(0) &&
      math.abs(r.getDouble(1) - e.getDouble(1)) < 1e-6)
  }

  test("global aggregate over zero matching rows yields count 0, not NULL") {
    val df = tsv.filter(col("value") > 1e18) // matches nothing
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"),
        min(col("value")).as("mn"))
    assert(df.queryExecution.executedPlan.toString
      .contains("PushedAggregation=true"))
    val r = df.collect().head
    assert(!r.isNullAt(0) && r.getLong(0) == 0L, s"count must be 0: $r")
    assert(r.isNullAt(1) && r.isNullAt(2), s"sum/min over empty are NULL: $r")
  }

  test("unsupported aggregate (avg distinct) stays in Spark, results correct") {
    val df = tsv.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
    assert(!df.queryExecution.executedPlan.toString
      .contains("PushedAggregation=true"))
    val got = df.orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = Tables.load(spark, sf001, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("quoted fields round-trip: tabs and quotes inside string values") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val d = Files.createTempDirectory("graft_tsv_quoted").toString
    val rows = Seq(
      (1L, "plain"),
      (2L, "has\ttab"),
      (3L, "has\"quote"),
      (4L, "\"wrapped\"\tand\ttabs"))
    rows.toDF("id", "s").write.mode("overwrite")
      .option("header", true).option("sep", "\t").option("escape", "\"")
      .csv(d)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val back = spark.read.format("graft.sources.tsv").schema(schema).load(d)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back == rows, s"mis-parsed quoted fields: $back")
  }

  test("malformed rows fail loudly with a descriptive error") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    def readAll(lines: String*): Unit = {
      val d = Files.createTempDirectory("graft_tsv_bad")
      Files.writeString(d.resolve("part-00000.csv"),
        ("id\ts" +: lines).mkString("\n"))
      spark.read.format("graft.sources.tsv").schema(schema)
        .load(d.toString).collect()
    }
    // text after a closing quote: previously silently truncated
    val e1 = intercept[org.apache.spark.SparkException] {
      readAll("1\t\"ab\"c")
    }
    assert(e1.getMessage.contains("malformed TSV row") ||
      Option(e1.getCause).exists(_.getMessage.contains("malformed TSV row")))
    // short row: previously an opaque ArrayIndexOutOfBounds
    val e2 = intercept[org.apache.spark.SparkException] {
      readAll("1\tok", "2")
    }
    assert(e2.getMessage.contains("expected 2 fields") ||
      Option(e2.getCause).exists(_.getMessage.contains("expected 2 fields")))
  }

  test("V2 writer: committed round-trip incl. quoting, nulls, overwrite") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val d = Files.createTempDirectory("graft_tsv_write").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("v", DoubleType)))
    val rows = Seq(
      (1L, "plain", 1.5),
      (2L, "has\ttab", -3.25),
      (3L, "has\"quote", 0.0),
      (4L, null.asInstanceOf[String], 7.0))
    rows.toDF("id", "s", "v").repartition(3)
      .write.format("graft.sources.tsv").mode("overwrite").save(d)
    // job commit leaves only final files + _SUCCESS — no staging litter
    val names = new java.io.File(d).listFiles().map(_.getName).toSet
    assert(names.contains("_SUCCESS"), s"no _SUCCESS marker in $names")
    assert(!names.exists(_.startsWith(".staging")),
      s"staging litter after commit: $names")
    def readBack = spark.read.format("graft.sources.tsv")
      .schema(schema).load(d).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(readBack.toSeq == rows.map { case (i, s2, v) =>
      (i, s2, v: Any) }, s"round-trip mismatch: ${readBack.toSeq}")
    // TRUNCATE semantics: a second overwrite fully replaces the first
    Seq((9L, "only", 9.0)).toDF("id", "s", "v")
      .write.format("graft.sources.tsv").mode("overwrite").save(d)
    assert(readBack.toSeq == Seq((9L, "only", 9.0)),
      "overwrite left stale files behind")
    // APPEND adds without touching existing files
    Seq((10L, "more", 10.0)).toDF("id", "s", "v")
      .write.format("graft.sources.tsv").mode("append").save(d)
    assert(readBack.map(_._1).toSeq == Seq(9L, 10L))
    // embedded newlines are rejected loudly, not silently corrupted
    val e = intercept[Exception] {
      Seq((11L, "bad\nline", 0.0)).toDF("id", "s", "v")
        .write.format("graft.sources.tsv").mode("append").save(d)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("line-oriented")),
      s"wrong failure: ${messages(e)}")
    // and the failed job left no staging litter nor new visible file
    assert(readBack.map(_._1).toSeq == Seq(9L, 10L),
      "aborted write changed visible data")
  }
}
