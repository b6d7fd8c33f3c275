package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The composed ingestion dataflow — the reference's E0 entry point
  * (SURVEY §3): `url() CSV → transform-on-read → INSERT partitioned
  * table`, then cross-engine fan-out with row-count validation after
  * EVERY hop (reference: README.md:140-199 ingest, :253-274 pipe fan-out,
  * :373-397 "Final Validation (must match)" — the same count produced by
  * all four engines).
  *
  * One Spark job per hop; [[run]] returns the per-hop counts and throws
  * if any hop loses or invents rows — the reference's invariant #1 as
  * executable code rather than a runbook.
  */
object IngestPipeline {

  final case class HopCounts(
      source: Long, rawCsv: Long, typed: Long, partitioned: Long) {
    def allEqual: Boolean =
      rawCsv == source && typed == source && partitioned == source
  }

  /** Stage 1 — export: events → headered gzip CSV (the url() stand-in).
    * Stage 2 — typed read-back: explicit schema, DROPMALFORMED.
    * Stage 3 — transform: derive event day + category (enum-decode
    * analog) and materialize into a day-partitioned parquet table
    * (reference: user_events PARTITION BY toYYYYMMDD(event_time),
    * clickhouse-init/01-create-table.sql:41).
    * Validation — count after every hop, all must equal the source. */
  def run(spark: SparkSession, sfDir: String, workDir: String): HopCounts = {
    Files.createDirectories(Paths.get(workDir))
    val csvDir = s"$workDir/events_csv"
    val tableDir = s"$workDir/events_by_day"

    val source = Tables.load(spark, sfDir, "events")
    val sourceCount = source.count()

    source.select(
        col("event_id"), col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
        col("value"), col("props"))
      .write.mode("overwrite")
      .option("header", true).option("compression", "gzip")
      .csv(csvDir)

    val raw = spark.read
      .schema(IngestJob.eventsCsvSchema)
      .option("header", true)
      .option("mode", "DROPMALFORMED")
      .csv(csvDir)
    val rawCount = raw.count()

    val typed = raw.select(
      col("event_id"), col("user_id"), col("event_type"),
      to_timestamp(col("ts_str"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
      col("value"), col("props"))
      .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
      .withColumn(
        "category",
        when(col("event_type").isin("click", "view"), "interaction")
          .when(col("event_type").isin("purchase", "signup"), "conversion")
          .otherwise("other"))
    val typedCount = typed.count()

    typed
      .repartition(col("day"))
      .sortWithinPartitions(col("user_id"), col("ts"))
      .write.mode("overwrite")
      .partitionBy("day")
      .parquet(tableDir)

    val partitionedCount = spark.read.parquet(tableDir).count()

    val hops = HopCounts(sourceCount, rawCount, typedCount, partitionedCount)
    require(hops.allEqual,
      s"ingestion hop lost rows (reference invariant README.md:373-397): $hops")
    hops
  }

  /** Standalone entry: runMain graft.sources.IngestPipeline [sfDir]. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.local(cpus = "4")
    val hops = run(
      spark, sfDir,
      sys.props("java.io.tmpdir") + "/graft_ingest_pipeline")
    println(s"[ingest-pipeline] validated: $hops")
    spark.stop()
  }
}
