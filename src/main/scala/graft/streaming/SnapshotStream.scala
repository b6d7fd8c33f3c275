package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.Tables
import graft.queries.{Det, Q}
import graft.sources.IngestJob

/** STREAMING INGESTION into the manifest-committed snapshot table — the
  * composition that turns q248's commit protocol into a continuously-fed
  * lakehouse table: a Structured Streaming source drives `foreachBatch`,
  * and each micro-batch becomes one SNAPSHOT VERSION via the same
  * write-files-then-atomically-publish-manifest discipline. Exactly-once
  * lands on two independent legs:
  *   - the streaming checkpoint guarantees each batch id is DELIVERED at
  *     least once across restarts;
  *   - the commit is IDEMPOTENT per batch id (a version manifest that
  *     already exists means this batch committed in a previous life —
  *     the replay skips; a batch that died after writing data files but
  *     before its manifest left only invisible orphans, and the replay
  *     rewrites and commits them).
  * At-least-once delivery × idempotent commit = exactly-once table
  * contents, the standard transactional-sink argument — here made
  * auditable, because every claim is a file you can list.
  */
object SnapshotStream {

  /** Commit one micro-batch as snapshot version `batchId + 1`. Versions
    * are sequential because a file-source stream delivers batch ids
    * sequentially; version N's manifest extends version N-1's. */
  def commitBatch(root: java.nio.file.Path, df: DataFrame,
      batchId: Long): Unit = {
    val v = (batchId + 1).toInt
    if (!Files.exists(root.resolve(s"v$v.manifest.tsv"))) {
      val dataDir = root.resolve("data")
      val sub = s"b$batchId"
      df.repartition(1).write.mode("overwrite")
        .parquet(dataDir.resolve(sub).toString)
      val prev =
        if (v == 1) Seq.empty else IngestJob.readManifest(root, v - 1)
      IngestJob.commitManifest(root, v,
        prev ++ IngestJob.listParquet(dataDir, sub))
    }
  }

  /** q254: the pipeline end to end on the events fixture — a 4-file
    * source copy streamed with maxFilesPerTrigger=1 under an
    * AvailableNow trigger (4 micro-batches, checkpointed in the store
    * itself so a torn run RESUMES instead of restarting), each batch
    * committing one version. The report reads the LATEST version and
    * audits the whole store: version count, final row/value totals, and
    * the orphan count (files referenced by no manifest — 0 here, since
    * every batch committed; crash mid-batch and the next run's replay
    * re-lands them). The oracle recomputes the totals from the original
    * events table: equality proves no batch was lost OR double-applied
    * across however many process lives the stream took — the
    * exactly-once contract stated as one differential check. Money
    * stays in exact integer cents from the copy onward. At 100 TB this
    * is the standing-ingest shape: per-trigger commit cost is one
    * manifest write; readers get snapshot isolation for free; the
    * accumulating small files are q244's compaction bill, by design. */
  val q254 = Q(
    "q254_stream_snapshot_commits",
    (s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("event_type"),
          Det.cents(col("value")).as("c"))
      val fp = ev.agg(
        count(lit(1)).as("n"), sum(col("event_id")).as("se"),
        sum(col("c")).as("sc")).head()
      val root = Paths.get(
        sys.props("java.io.tmpdir"), "graft_ingest",
        s"events_streamsnap_${d.replaceAll("[^0-9.]", "")}_" +
          s"${fp.getLong(0)}_${fp.getLong(1)}_${fp.getLong(2)}")
      Files.createDirectories(root)
      val srcDir = root.resolve("source")
      if (!Files.exists(srcDir.resolve("_SUCCESS")))
        ev.repartitionByRange(4, col("event_id"))
          .write.mode("overwrite").parquet(srcDir.toString)
      if (!Files.exists(root.resolve("v4.manifest.tsv"))) {
        val src = s.readStream
          .schema(StructType(Seq(
            StructField("event_id", LongType),
            StructField("event_type", StringType),
            StructField("c", LongType))))
          .option("maxFilesPerTrigger", 1)
          .parquet(srcDir.toString)
        src.writeStream
          .foreachBatch((df: DataFrame, id: Long) =>
            commitBatch(root, df, id))
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
      }
      val nVersions = Iterator.from(1)
        .takeWhile(n => Files.exists(root.resolve(s"v$n.manifest.tsv")))
        .size
      val latest = IngestJob.readManifest(root, nVersions)
      val referenced =
        (1 to nVersions).flatMap(IngestJob.readManifest(root, _)).toSet
      val orphans = IngestJob.listParquet(root.resolve("data"), "")
        .filterNot(referenced)
      IngestJob.readFiles(s, root.resolve("data"), latest).get
        .agg(count(lit(1)).as("n_rows"), sum(col("c")).as("sc"))
        .select(
          lit(nVersions.toLong).as("n_versions"),
          col("n_rows"),
          (col("sc").cast(DoubleType) / lit(100.0)).as("sum_value"),
          lit(orphans.size.toLong).as("n_orphans"))
    },
    Some(s"""
      SELECT CAST(4 AS BIGINT) AS n_versions,
             count(*) AS n_rows,
             CAST(CAST(sum(${Det.centsSql("value")}) AS BIGINT)
               AS DOUBLE) / 100 AS sum_value,
             CAST(0 AS BIGINT) AS n_orphans
      FROM events"""))

  val all: Seq[Q] = Seq(q254)
}
