package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.IngestPipeline

/** End-to-end ingestion dataflow: every hop preserves the row count and
  * the partitioned table round-trips values exactly.
  */
class IngestPipelineSpec extends SparkSpec {

  test("error tolerance: malformed CSV rows dropped or captured, never lost") {
    // the reference ingests with input_format_allow_errors_num=1000 —
    // up to N bad rows skipped, the rest loaded (README.md:176-199).
    // Spark's faces of the same contract: DROPMALFORMED (skip) and
    // PERMISSIVE + corrupt-record column (quarantine for inspection).
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_badcsv").toString
    val lines = Seq(
      "event_id\tuser_id\tvalue",
      "1\t10\t1.5",
      "2\tnot_a_number\toops", // malformed
      "3\t30\t3.5")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.csv"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("value", DoubleType)))

    // NOTE: malformedness is judged against the PARSED columns only —
    // count() prunes every column and sees 3 rows. Any real pipeline
    // (like IngestPipeline's typed hop) projects the full schema, which
    // is what arms the check; the cache() pins that full-width parse.
    val dropped = spark.read.schema(schema)
      .option("header", true).option("sep", "\t")
      .option("mode", "DROPMALFORMED")
      .csv(dir)
      .select("event_id", "user_id", "value").cache()
    assert(dropped.count() == 2, "exactly the malformed row is skipped")
    assert(dropped.agg(sum("event_id")).head().getLong(0) == 4L)

    val quarantine = spark.read
      .schema(schema.add(StructField("_corrupt_record", StringType)))
      .option("header", true).option("sep", "\t")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache() // corrupt-record column requires a materialized referenced plan
    assert(quarantine.count() == 3, "PERMISSIVE keeps every input row")
    val bad = quarantine.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record")
      .contains("not_a_number"))
  }

  test("all hops preserve the row count (reference validation invariant)") {
    val dir = Files.createTempDirectory("graft_pipeline").toString
    val hops = IngestPipeline.run(spark, sf001, dir)
    assert(hops.allEqual && hops.source > 0)

    // day-partition pruning: a one-day filter reads a strict file subset
    val table = spark.read.parquet(s"$dir/events_by_day")
    val oneDay = table.select("day").distinct().orderBy("day")
      .limit(1).collect().head.get(0)
    val pruned = table.filter(col("day") === oneDay)
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters"), planStr)
    assert(pruned.count() > 0 && pruned.count() < hops.source)

    // value-level round-trip: per-event values survive CSV + parquet hops
    val original = Tables.load(spark, sf001, "events")
      .select("event_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    table.select("event_id", "value").collect().foreach { r =>
      assert(original(r.getLong(0)) == r.getDouble(1))
    }
  }

  test("gatedParquetWrite: gates ride the write pass and violated gates throw") {
    import graft.sources.IngestJob
    val base = java.nio.file.Files
      .createTempDirectory("graft_gate").toString
    val ev = Tables.load(spark, sf001, "events")
    val m = IngestJob.gatedParquetWrite(
      ev, s"$base/ok.parquet",
      Seq(
        "n_rows" -> count(lit(1)),
        "null_users" -> count(when(col("user_id").isNull, lit(1))),
        "max_value" -> max(col("value"))),
      Map(
        "n_rows" -> (v => v.asInstanceOf[Long] > 0L),
        "null_users" -> (v => v.asInstanceOf[Long] == 0L)))
    // observed metrics equal an independent recomputation (the spec
    // pays the second scan the production path exists to avoid)
    val expect = ev.agg(
      count(lit(1)), count(when(col("user_id").isNull, lit(1))),
      max(col("value"))).head()
    assert(m("n_rows") == expect.getLong(0))
    assert(m("null_users") == expect.getLong(1))
    assert(m("max_value") == expect.getDouble(2))
    // and the write itself really committed
    assert(spark.read.parquet(s"$base/ok.parquet").count()
      == expect.getLong(0))
    // a violated gate throws AFTER the write, naming the metric
    val e = intercept[IllegalArgumentException] {
      IngestJob.gatedParquetWrite(
        ev, s"$base/bad.parquet",
        Seq("n_rows" -> count(lit(1))),
        Map("n_rows" -> (_ => false)))
    }
    assert(e.getMessage.contains("n_rows"))
  }

  test("xml roundtrip survives markup-significant characters") {
    import spark.implicits._
    // every character class XML must escape (or CDATA) to stay lossless:
    // element syntax, entities, quotes, and a leading/trailing space
    val rows = Seq(
      (1L, "<order> & </order>"),
      (2L, "a \"quoted\" 'string'"),
      (3L, " leading & trailing "),
      (4L, "]]> cdata terminator"),
      (5L, "plain"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_xml_spec").toString
    rows.toDF("k", "s").write.mode("overwrite")
      .option("rowTag", "row").xml(dir)
    // ignoreSurroundingSpaces defaults TRUE and silently trims values —
    // found by this test; lossless reads must disable it
    val back = spark.read
      .schema("k LONG, s STRING")
      .option("rowTag", "row")
      .option("ignoreSurroundingSpaces", false).xml(dir)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(back == rows, "XML escaping mangled a value")
    val trimmed = spark.read
      .schema("k LONG, s STRING")
      .option("rowTag", "row").xml(dir)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(trimmed(2)._2 == "leading & trailing",
      "default-read trim behavior changed — revisit q306's option")
  }
}
