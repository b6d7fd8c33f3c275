package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{MediaDecoder, MediaItem}

/** Multimodal plumbing: binary payload round-trip, per-partition decode
  * batch shape, deterministic stub features, frame sampling.
  */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  test("decode features: independent recomputation from UTF-8 bytes") {
    val decoded = MediaDecoder.decodeAll(MediaDecoder.mediaTable(spark, sf001))
      .collect().map(d => d.doc_id -> d).toMap
    val docs = Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(docs.nonEmpty && decoded.size == docs.length)
    docs.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val expected = new Array[Double](4)
      bytes.foreach(b => expected((b & 0xff) % 4) += 1.0)
      val d = decoded(id)
      assert(d.n_bytes == bytes.length.toLong)
      assert(d.feature.toSeq == expected.toSeq, s"feature mismatch doc $id")
      assert(d.feature.sum == bytes.length.toDouble)
      assert(d.width == 1 + (bytes.length % 32))
      assert(d.height == 1 + (bytes.length % 17))
      assert(d.n_frames == (bytes.length + 63) / 64)
    }
  }

  test("decode is deterministic across runs and partitionings") {
    val a = MediaDecoder.decodeAll(MediaDecoder.mediaTable(spark, sf001))
      .collect().map(d => (d.doc_id, d.feature.toSeq)).sortBy(_._1).toSeq
    val b = MediaDecoder.decodeAll(
        MediaDecoder.mediaTable(spark, sf001).repartition(7))
      .collect().map(d => (d.doc_id, d.feature.toSeq)).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("sampleFrames k=1 reassembles the payload exactly") {
    val media = MediaDecoder.mediaTable(spark, sf001).toDF().limit(50)
    val frames = MediaDecoder.sampleFrames(media, 1)
      .orderBy("doc_id", "frame_idx")
      .select("doc_id", "frame").as[(Long, Array[Byte])]
      .collect().groupBy(_._1)
    val payloads = media.select("doc_id", "payload")
      .as[(Long, Array[Byte])].collect().toMap
    assert(frames.nonEmpty)
    frames.foreach { case (id, fs) =>
      val reassembled = fs.flatMap(_._2)
      assert(reassembled.toSeq == payloads(id).toSeq, s"doc $id mismatch")
    }
  }

  test("sampleFrames k=4 keeps every 4th frame, 64-byte aligned") {
    val media = MediaDecoder.mediaTable(spark, sf001).toDF().limit(50)
    val frames = MediaDecoder.sampleFrames(media, 4).collect()
    frames.foreach { r =>
      assert(r.getAs[Int]("frame_idx") % 4 == 0)
      assert(r.getAs[Array[Byte]]("frame").length <= 64)
    }
  }

  test("resize halves dimensions and pools the feature mass exactly") {
    val resized = MediaDecoder.decodeAndResize(
      MediaDecoder.mediaTable(spark, sf001))
      .collect().map(d => d.doc_id -> d).toMap
    val decoded = MediaDecoder.decodeAll(MediaDecoder.mediaTable(spark, sf001))
      .collect()
    assert(decoded.nonEmpty && resized.size == decoded.length)
    decoded.foreach { d =>
      val r = resized(d.doc_id)
      assert(r.width == math.max(1, d.width / 2) &&
        r.height == math.max(1, d.height / 2))
      // pooled histogram preserves total mass / 2 and bin structure
      assert(r.feature.length == 2)
      assert(r.feature(0) == (d.feature(0) + d.feature(1)) / 2.0)
      assert(r.feature(1) == (d.feature(2) + d.feature(3)) / 2.0)
    }
  }

  test("fixture text is pure ASCII (q58's byte==char slicing precondition)") {
    val nonAscii = Tables.load(spark, sf001, "documents")
      .filter(length(col("text")) =!= octet_length(col("text").cast("binary")))
      .count()
    assert(nonAscii == 0,
      "documents.text contains multi-byte chars; q58's VARCHAR oracle breaks")
  }
}
