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

  test("ImageCodec: PNG round-trip reproduces the raster for edge dims") {
    import graft.multimodal.ImageCodec
    // ids covering 1×1, 1-wide, 1-tall, odd and even dims
    Seq(0L, 7L, 8L, 4L, 19L, 123L).foreach { id =>
      val (w0, h0) = ImageCodec.dims(id)
      val (w, h, pix) = ImageCodec.decode(ImageCodec.encode(id))
      assert((w, h) == (w0, h0), s"id=$id dims")
      val expected = for {
        y <- 0 until h; x <- 0 until w
        c <- { val (r, g, b) = ImageCodec.px(id, x, y); Seq(r, g, b) }
      } yield c
      assert(pix.toSeq == expected, s"id=$id pixels")
      val (ow, oh, half) = ImageCodec.avgPool2(w, h, pix)
      assert(ow == math.max(1, w / 2) && oh == math.max(1, h / 2))
      assert(half.forall(v => v >= 0 && v <= 255))
    }
  }

  test("AudioCodec: decoder reports the real container format, not assumptions") {
    import graft.multimodal.AudioCodec
    val wav = AudioCodec.encode(42L)
    // the format fields must come from AudioSystem's parse of the RIFF
    // header — assert them via the javax API directly
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    assert(fmt.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
    assert(fmt.getSampleRate == AudioCodec.SampleRate.toFloat)
    assert(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
    assert(!fmt.isBigEndian)
    val (_, _, samples) = AudioCodec.decode(wav)
    assert(samples.length == AudioCodec.nSamples(42L))
    assert(samples.zipWithIndex.forall {
      case (s, i) => s == AudioCodec.sample(42L, i)
    })
  }

  test("q189 phash: banded neighbour counts == naive all-pairs replay") {
    import graft.multimodal.{ImageCodec, MediaFingerprint}
    val got = MediaFingerprint.q189.run(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    // independent phash replay from the raster ARITHMETIC (px/dims),
    // bypassing the codec path the query uses
    def replay(id: Long): Long = {
      val (w, h) = ImageCodec.dims(id)
      val ls = for (gy <- 0 until 4; gx <- 0 until 4) yield {
        val (r, g, b) = ImageCodec.px(id, gx * w / 4, gy * h / 4)
        (77L * r + 151L * g + 28L * b) / 256
      }
      val total = ls.sum
      ls.zipWithIndex.map {
        case (l, i) => if (16L * l > total) 1L << i else 0L
      }.sum
    }
    val fps = got.map { case (id, _, _) => id -> replay(id) }
    got.foreach { case (id, ph, _) =>
      assert(ph == replay(id), s"doc $id phash != arithmetic replay")
    }
    // naive O(n²) neighbour counts — the banding must lose no pair
    val naive = fps.map { case (id, ph) =>
      id -> fps.count { case (oid, oph) =>
        oid != id &&
          java.lang.Long.bitCount(ph ^ oph) <= MediaFingerprint.Threshold
      }.toLong
    }.toMap
    got.foreach { case (id, _, n) =>
      assert(n == naive(id), s"doc $id n_near $n != naive ${naive(id)}")
    }
  }

  test("q190 audio fp: arithmetic replay + group-size conservation") {
    import graft.multimodal.{AudioCodec, MediaFingerprint}
    val got = MediaFingerprint.q190.run(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    def replay(id: Long): (Long, Int, Long) = {
      val n = AudioCodec.nSamples(id)
      val energies = (0 until 8).map { f =>
        (f * n / 8 until (f + 1) * n / 8)
          .map { i => val v = AudioCodec.sample(id, i).toLong; v * v }.sum
      }
      val total = energies.sum
      val fp = energies.zipWithIndex.map {
        case (e, f) => if (8L * e > total) 1L << f else 0L
      }.sum
      (fp, n, total)
    }
    got.foreach { case (id, fp, n, te, _) =>
      assert((fp, n, te) == replay(id), s"doc $id fingerprint replay")
    }
    // group sizes: conserve the population and match the actual groups
    val byFp = got.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    got.foreach { case (id, fp, _, _, gn) =>
      assert(gn == byFp(fp), s"doc $id group_n")
    }
    assert(byFp.values.sum == got.length.toLong)
  }

  test("VideoCodec: MJPEG marker walk recovers every frame; luma error tight") {
    import graft.multimodal.{ImageCodec, VideoCodec}
    // the q233 certificate (luma_ok ≤ LumaTol=64) has decoder-version
    // headroom; THIS pins the actual measured regime much tighter so a
    // decoder regression (desynced split, channel swap, quality change)
    // fails here before it could loosen the certificate
    var worst = 0
    (0L until 600L).foreach { id =>
      val frames = VideoCodec.decodeFrames(VideoCodec.encode(id))
      assert(frames.length == VideoCodec.nFrames(id),
        s"doc $id: marker walk found ${frames.length} frames")
      val (w, h) = ImageCodec.dims(id)
      frames.foreach { case (idx, fw, fh, pix) =>
        assert((fw, fh) == (w, h), s"doc $id frame $idx dims")
        val e = VideoCodec.maxLumaErr(id, idx, fw, fh, pix)
        worst = math.max(worst, e)
      }
    }
    assert(worst <= 30, s"decoded luma error regime shifted: max $worst")
    // a beheaded stream (first SOI dropped) is MALFORMED: the marker
    // walk must fail loudly, never resync-and-guess (the old byte scan
    // silently recovered n-1 frames — a real decoder must not guess
    // where a frame starts)
    val id = 7L
    val bytes = VideoCodec.encode(id)
    val truncated = java.util.Arrays.copyOfRange(bytes, 2, bytes.length)
    val e = intercept[IllegalArgumentException] {
      VideoCodec.decodeFrames(truncated)
    }
    assert(e.getMessage.contains("SOI"))
  }

  test("VideoCodec: nested SOI inside an APP1 thumbnail does not tear a frame") {
    import graft.multimodal.VideoCodec
    // the r6 over-split latent: a camera JPEG whose EXIF/APP1 payload
    // embeds a thumbnail (its own complete SOI..EOI stream) fooled the
    // raw FFD8-FF byte scan into splitting mid-frame. The marker walk
    // skips length-delimited segments wholesale, so the nested stream
    // is invisible. Build such a frame synthetically: a real ImageIO
    // JPEG with an APP1 segment whose payload IS another full JPEG.
    def jpeg(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 5).foreach(y => (0 until 8).foreach(x =>
        img.setRGB(x, y, (seed * 2654435761L).toInt & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val host = jpeg(1)
    val thumb = jpeg(2)
    val app1Len = thumb.length + 2
    assert(app1Len < 0x10000, "thumbnail too large for one APP1")
    val app1 = Array(0xff.toByte, 0xe1.toByte,
      ((app1Len >> 8) & 0xff).toByte, (app1Len & 0xff).toByte) ++ thumb
    val withThumb = host.take(2) ++ app1 ++ host.drop(2)
    val stream = withThumb ++ jpeg(3)
    val frames = VideoCodec.decodeFrames(stream)
    assert(frames.length == 2,
      s"nested SOI tore the stream into ${frames.length} frames")
    assert(frames.forall { case (_, w, h, _) => (w, h) == (8, 5) })
  }

  test("q262 chunk walk: spec-shaped stream, CRC catches corruption") {
    import graft.multimodal.ImageCodec
    val tagged = ImageCodec.withTextChunks(ImageCodec.encode(7L),
      Seq("docid" -> "7", "klass" -> "1"))
    val chunks = ImageCodec.chunkWalk(tagged)
    // spec shape: IHDR first, IEND last, our two tEXt right after IHDR
    assert(chunks.head._1 == "IHDR" && chunks.last._1 == "IEND")
    assert(chunks.slice(1, 3).map(_._1) == Seq("tEXt", "tEXt"))
    assert(chunks.forall(_._3), "CRC failed on an untouched stream")
    // ImageIO still decodes the tagged bytes to the SAME raster
    val (w0, h0, p0) = ImageCodec.decode(ImageCodec.encode(7L))
    val (w1, h1, p1) = ImageCodec.decode(tagged)
    assert((w0, h0) == (w1, h1) && p0.sameElements(p1),
      "metadata splice perturbed the image stream")
    // flip one byte inside the first tEXt payload: ONLY that chunk's
    // CRC verdict must flip
    val corrupt = tagged.clone()
    val off = 8 + 12 + (((tagged(8) & 0xff) << 24) |
      ((tagged(9) & 0xff) << 16) | ((tagged(10) & 0xff) << 8) |
      (tagged(11) & 0xff)) + 8
    corrupt(off) = (corrupt(off) ^ 0x01).toByte
    val verdicts = ImageCodec.chunkWalk(corrupt).map(c => c._1 -> c._3)
    assert(!verdicts(1)._2, "CRC verification missed the corruption")
    assert(verdicts.patch(1, Nil, 1).forall(_._2),
      "corruption verdict leaked to other chunks")
  }
}
