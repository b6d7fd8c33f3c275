package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q

/** A media item: opaque binary payload + typed metadata — the multimodal
  * column convention (image/audio/video ride through the engine as
  * `binary` columns; only metadata and derived features are relational).
  */
final case class MediaItem(
    doc_id: Long,
    media_type: String,
    payload: Array[Byte])

/** Decode output: metadata + a small feature vector per item. */
final case class DecodedMedia(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    feature: Array[Double])

/** Multimodal-column operators for the training-data-pipeline extension.
  *
  * The real decode libraries (image/audio codecs) are NOT in this
  * container, so [[MediaDecoder.decodeStub]] is a clearly-marked
  * deterministic fake; everything AROUND it — the binary column, the typed
  * Dataset plumbing, the per-partition batch shape (the Scala analog of
  * Python's mapInPandas batches), partitioning, and the metadata schema —
  * is real and tested. Swapping the stub for a JNI/codec call changes no
  * plan shape.
  */
object MediaDecoder {

  /** STUB decode — deterministic fake standing in for an image/audio
    * decoder. Derives metadata from payload size and a 4-bin byte-value
    * histogram "feature" from the payload content. Pure function of the
    * bytes: the differential tests can recompute it any way they like. */
  def decodeStub(item: MediaItem): DecodedMedia = {
    val n = item.payload.length.toLong
    val frameSize = 64
    val feature = new Array[Double](4)
    var i = 0
    while (i < item.payload.length) {
      feature((item.payload(i) & 0xff) % 4) += 1.0
      i += 1
    }
    DecodedMedia(
      doc_id = item.doc_id,
      media_type = item.media_type,
      n_bytes = n,
      width = (1 + n % 32).toInt,
      height = (1 + n % 17).toInt,
      n_frames = ((n + frameSize - 1) / frameSize).toInt,
      feature = feature)
  }

  /** The fixture has no binary media, so manufacture the media table from
    * documents: payload = UTF-8 bytes of the text (an opaque blob as far
    * as the engine is concerned), media_type derived from source. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        concat(lit("fake/"), col("source")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaItem]
  }

  /** Per-partition batched decode — the Scala analog of mapInPandas: one
    * iterator per partition, items processed in a tight loop, no
    * per-row driver round-trips, executes wherever the partition lives. */
  def decodeAll(media: Dataset[MediaItem]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling for "video" payloads: split the byte stream into
    * fixed 64-byte frames, keep every k-th — pure relational ops on the
    * binary column (substring works on binary), no decode needed. */
  def sampleFrames(media: DataFrame, k: Int): DataFrame =
    media
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn(
        "frame_idx",
        // empty payload → zero frames: sequence(0, -1) would generate a
        // DESCENDING [0, -1] (Spark sequences run both ways), inventing a
        // frame the oracle's range(0, 0) correctly omits
        explode(expr(
          s"CASE WHEN n_bytes = 0 THEN CAST(array() AS ARRAY<INT>) ELSE " +
            s"filter(sequence(0, CAST((n_bytes + 63) / 64 AS INT) - 1), " +
            s"i -> i % $k = 0) END")))
      .withColumn(
        "frame",
        expr("substring(payload, frame_idx * 64 + 1, 64)"))
      .select(col("doc_id"), col("frame_idx"), col("frame"))

  /** STUB resize — the "image resize" stage of a multimodal pipeline as a
    * pure function on decoded items: halve each dimension (floor, min 1)
    * and average-pool the feature histogram into 2 bins. Like
    * [[decodeStub]], a deterministic fake with the real pipeline shape:
    * runs per-partition in the same tight batch loop, so swapping in a
    * real scaler is a body change, not a plan change. */
  def resizeStub(item: DecodedMedia): DecodedMedia =
    item.copy(
      width = math.max(1, item.width / 2),
      height = math.max(1, item.height / 2),
      feature = Array(
        (item.feature(0) + item.feature(1)) / 2.0,
        (item.feature(2) + item.feature(3)) / 2.0))

  /** Decode → resize chained per-partition: ONE pass over each partition's
    * items with both stages fused in the same batch loop (the mapInPandas
    * chain analog — no shuffle, no materialization between stages). */
  def decodeAndResize(media: Dataset[MediaItem]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => resizeStub(decodeStub(m))))
  }

  /** q32: the decode pipeline's relational face — metadata derived from
    * the binary payload via the per-partition decode. The oracle
    * recomputes n_bytes/width/height/n_frames from octet_length in
    * DuckDB, proving the binary round-trip + stub arithmetic; the feature
    * vector is differential-tested in MediaSpec instead (blob byte
    * histograms aren't SQL-portable). */
  val q32 = Q(
    "q32_media_decode",
    (s, d) => {
      import s.implicits._
      decodeAll(mediaTable(s, d))
        .select(
          col("doc_id"), col("media_type"), col("n_bytes"),
          col("width"), col("height"), col("n_frames"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             'fake/' || source AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST(1 + octet_length(encode(text)) % 32 AS INTEGER) AS width,
             CAST(1 + octet_length(encode(text)) % 17 AS INTEGER) AS height,
             CAST((octet_length(encode(text)) + 63) // 64 AS INTEGER)
               AS n_frames
      FROM documents
      ORDER BY doc_id"""))

  /** q58: frame sampling oracle-checked END TO END including the frame
    * BYTES — every 3rd 64-byte frame of each payload. The fixture text is
    * pure ASCII (asserted by MediaSpec), so the binary frames decode
    * losslessly to strings and DuckDB reproduces them with VARCHAR
    * substr; at scale this is a per-row generator (explode) with no
    * shuffle at all. */
  val q58 = Q(
    "q58_frame_sample",
    (s, d) =>
      sampleFrames(
        mediaTable(s, d).toDF().filter(col("doc_id") < 100), 3)
        .select(
          col("doc_id"),
          col("frame_idx"),
          col("frame").cast("string").as("frame_str"),
          length(col("frame")).as("frame_len"))
        .orderBy(col("doc_id"), col("frame_idx")),
    Some("""
      WITH frames AS (
        SELECT doc_id,
               unnest(list_filter(
                 range(0, CAST((length(text) + 63) // 64 AS INT)),
                 i -> i % 3 = 0)) AS frame_idx,
               text
        FROM documents WHERE doc_id < 100
      )
      SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
             substr(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64)
               AS frame_str,
             CAST(length(substr(text, CAST(frame_idx * 64 + 1 AS BIGINT),
                                64)) AS INTEGER) AS frame_len
      FROM frames
      ORDER BY doc_id, frame_idx"""))

  val all: Seq[Q] = Seq(q32, q58)
}
