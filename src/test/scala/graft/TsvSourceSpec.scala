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
}
