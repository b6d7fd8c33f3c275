package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, count, lit, sum}
import graft.streaming.EventStream

/** Batch/stream parity: the SAME windowedCounts transform over the same
  * rows must produce identical results via Structured Streaming (file
  * source, one file per trigger, memory sink) and as a batch program.
  */
class StreamingSpec extends SparkSpec {

  private def key(r: Row): (String, String, Long, Double) =
    (String.valueOf(r.get(0)), r.getString(1), r.getLong(2), r.getDouble(3))

  test("windowedCounts streaming == batch") {
    val events = Tables.load(spark, sf001, "events")
    val dir = Files.createTempDirectory("graft_stream").toString
    // repartition so the stream sees several files => several micro-batches
    events.repartition(4).write.mode("overwrite").parquet(dir)

    val batch = EventStream.windowedCounts(events).collect().map(key).toSet

    val streamIn = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventStream.windowedCounts(streamIn)
      .writeStream
      .format("memory")
      .queryName("stream_out")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("stream_out").collect().map(key).toSet
      assert(got == batch, "streaming result differs from batch")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stream-static broadcast enrichment == batch, keeps no join state") {
    import spark.implicits._
    val events = Tables.load(spark, sf001, "events")
    val dim = Seq(
      ("view", "browse", 1L), ("click", "browse", 2L),
      ("purchase", "transact", 10L), ("refund", "transact", 10L),
      ("search", "browse", 1L)).toDF("event_type", "category", "weight")
    val dir = Files.createTempDirectory("graft_stream_enrich").toString
    events.repartition(4).write.mode("overwrite").parquet(dir)

    def k(r: Row) = (String.valueOf(r.get(0)), r.getString(1),
      r.getLong(2), r.getLong(3))
    val batch =
      EventStream.enrichedRevenue(events, dim).collect().map(k).toSet

    val streamIn = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventStream.enrichedRevenue(streamIn, dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("enrich_out").collect().map(k).toSet
      assert(got == batch, "stream-static enrichment differs from batch")
      assert(got.nonEmpty)
      // stateless join: the only stateful operator is the aggregate
      val prog = q.lastProgress
      assert(prog.stateOperators.length == 1,
        s"expected 1 stateful operator (the window agg), " +
          s"saw ${prog.stateOperators.length}")
    } finally q.stop()
  }

  test("sketchedUniques streaming == batch EXACTLY (order-independent registers)") {
    val events = Tables.load(spark, sf001, "events")
    val dir = Files.createTempDirectory("graft_stream_hll").toString
    events.repartition(4).write.mode("overwrite").parquet(dir)

    val batch = EventStream.sketchedUniques(events).collect()
      .map(r => (String.valueOf(r.get(0)), r.getString(1)) -> r.getDouble(2))
      .toMap

    val streamIn = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventStream.sketchedUniques(streamIn)
      .writeStream
      .format("memory")
      .queryName("hll_out")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("hll_out").collect()
        .map(r =>
          (String.valueOf(r.get(0)), r.getString(1)) -> r.getDouble(2))
        .toMap
      // STRICT double equality, not tolerance: HLL register state is an
      // order-independent MAX, so micro-batch splits cannot change the
      // estimate — the property t-digest/GK sketches do not have
      assert(got == batch, "streaming HLL estimates differ from batch")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("kmvUniques streaming == batch EXACTLY (order-independent bottom-k)") {
    val events = Tables.load(spark, sf001, "events")
    val dir = Files.createTempDirectory("graft_stream_kmv").toString
    events.repartition(4).write.mode("overwrite").parquet(dir)

    def k(r: org.apache.spark.sql.Row) =
      (String.valueOf(r.get(0)), r.getString(1)) ->
        ((r.getInt(2), r.getLong(3), r.getDouble(4)))
    val batch = EventStream.kmvUniques(events).collect().map(k).toMap

    val streamIn = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventStream.kmvUniques(streamIn)
      .writeStream
      .format("memory")
      .queryName("kmv_out")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("kmv_out").collect().map(k).toMap
      // STRICT equality incl. the estimate double: the bottom-k value
      // SET cannot depend on micro-batch splits (the q120 argument)
      assert(got == batch, "streaming KMV read-off differs from batch")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("kmvUniques NULL discipline: null users sketch nothing, windows survive") {
    // mirrors KmvMd5.update (nulls skipped) AND the q216 oracle's
    // wins/vals split (r6 review: the old oracle counted NULL rows as
    // sketch members — divergent the moment a fixture carries one)
    import spark.implicits._
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2020-01-01 10:05:00"),
        Some(7L), "view", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2020-01-01 10:15:00"),
        None: Option[Long], "view", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2020-01-01 10:25:00"),
        Some(9L), "view", 1.0, "{}"),
      (4L, java.sql.Timestamp.valueOf("2020-01-01 11:05:00"),
        None: Option[Long], "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventStream.kmvUniques(ev).collect()
      .map(r => r.getString(1) ->
        ((r.getInt(2), Option(r.get(3)), r.getDouble(4)))).toMap
    assert(got("view") == ((2, got("view")._2, 2.0)) &&
      got("view")._2.nonEmpty, s"mixed window: ${got("view")}")
    assert(got("click") == ((0, None, 0.0)),
      s"all-NULL window must emit an EMPTY sketch row: ${got("click")}")
  }

  test("restart from checkpoint resumes exactly-once (state + file log)") {
    // The operational property a long-lived pipeline needs and no
    // single-run parity test shows: a streaming aggregation STOPPED and
    // RESTARTED from its checkpoint must (a) not reprocess files the
    // source log already committed, (b) restore its state store — so
    // the post-restart result equals the batch answer over everything.
    // If restart re-read the first half, counts would double; if state
    // were lost, the first half would vanish: equality proves both.
    val events = Tables.load(spark, sf001, "events")
    val half1 = events.filter(col("event_id") % 2 === 0)
    val half2 = events.filter(col("event_id") % 2 === 1)
    val dir = Files.createTempDirectory("graft_stream_rec").toString
    val cp = Files.createTempDirectory("graft_stream_rec_cp").toString
    half1.repartition(2).write.mode("append").parquet(dir)

    def agg(in: org.apache.spark.sql.DataFrame) =
      in.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(graft.queries.Det.cents(col("value"))).as("cents"))
    def start(name: String) =
      agg(spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", cp)
        .outputMode("complete").start()
    def snap(name: String): Map[String, (Long, Long)] =
      spark.table(name).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val q1 = start("rec_run1")
    try { q1.processAllAvailable() } finally q1.stop()
    val afterHalf = snap("rec_run1")
    assert(afterHalf == agg(half1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap,
      "first run must equal batch over the first half")

    // more data lands while the query is DOWN; restart from checkpoint
    half2.repartition(2).write.mode("append").parquet(dir)
    val q2 = start("rec_run2")
    try { q2.processAllAvailable() } finally q2.stop()
    val afterAll = snap("rec_run2")
    val want = agg(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(afterAll == want,
      s"restart lost state or reprocessed files: $afterAll vs $want")
  }

  test("streaming dedup collapses duplicated input to distinct events") {
    val events = Tables.load(spark, sf001, "events")
    val dir = Files.createTempDirectory("graft_stream_dup").toString
    // two copies of every event across several files
    events.unionByName(events).repartition(4)
      .write.mode("overwrite").parquet(dir)

    val expected = events.select("event_id").distinct().count()
    val streamIn = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(dir)
    val q = EventStream.dedupeEvents(streamIn)
      .writeStream
      .format("memory")
      .queryName("dedup_out")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_out").count()
      assert(got == expected, s"expected $expected distinct, got $got")
    } finally q.stop()
  }

  test("valueBuckets streaming == batch (quantile sketch state parity)") {
    val events = Tables.load(spark, sf001, "events")
    val dir = Files.createTempDirectory("graft_stream_qs").toString
    events.repartition(4).write.mode("overwrite").parquet(dir)

    def key(r: Row) = (String.valueOf(r.get(0)), r.getLong(1),
      r.getLong(2), r.getLong(3))
    val batch = EventStream.valueBuckets(events).collect().map(key).toSet

    val streamIn = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventStream.valueBuckets(streamIn)
      .writeStream.format("memory").queryName("qs_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("qs_out").collect().map(key).toSet
      // strict equality of the SKETCH STATE itself: bucket counts are
      // order-independent sums, so any micro-batch split yields the
      // same buckets — and therefore identical downstream quantiles
      assert(got == batch, "streaming bucket state differs from batch")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("hourlyUserCounts streaming == batch (top-k state parity)") {
    val events = Tables.load(spark, sf001, "events")
    val dir = Files.createTempDirectory("graft_stream_topk").toString
    events.repartition(4).write.mode("overwrite").parquet(dir)

    def key(r: Row) = (String.valueOf(r.get(0)), r.getLong(1),
      r.getLong(2), r.getLong(3))
    val batch = EventStream.hourlyUserCounts(events).collect()
      .map(key).toSet

    val streamIn = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventStream.hourlyUserCounts(streamIn)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("topk_out").collect().map(key).toSet
      // STRICT equality: the state is keyed sums (count + exact cents),
      // order-independent under any micro-batch split — so the
      // downstream top-k read-off is identical too
      assert(got == batch, "streaming per-user counts differ from batch")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("watermark drops late rows from closed windows (append mode)") {
    import spark.implicits._
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType, TimestampType}
    val dir = Files.createTempDirectory("graft_stream_late").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def write(mode: String,
        rows: Seq[(java.sql.Timestamp, String, Double)]): Unit =
      rows.toDF("ts", "event_type", "value").coalesce(1)
        .write.mode(mode).parquet(s"$dir/in")
    // batch 1: two rows in the [10,11) window, one at 11:30 — after this
    // batch the 10-minute watermark stands at 11:20, past [10,11)'s end
    write("overwrite", Seq(
      (ts("2024-01-01 10:00:00"), "a", 1.0),
      (ts("2024-01-01 10:30:00"), "a", 1.0),
      (ts("2024-01-01 11:30:00"), "a", 1.0)))
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val streamIn = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = EventStream.windowedCounts(streamIn)
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: a LATE row (10:05 — behind the watermark, its window
      // already closed) that must be DROPPED, plus a fresh row advancing
      // the watermark further; batch 3 flushes the remaining windows
      write("append", Seq(
        (ts("2024-01-01 10:05:00"), "a", 100.0),
        (ts("2024-01-01 12:30:00"), "a", 1.0)))
      q.processAllAvailable()
      write("append", Seq((ts("2024-01-01 13:30:00"), "a", 1.0)))
      q.processAllAvailable()
      val got = spark.table("late_out").collect()
        .map(r =>
          String.valueOf(r.get(0)) -> ((r.getLong(2), r.getDouble(3))))
        .toMap
      // count 2 / sum 2.0, NOT 3 / 102.0: the late row never lands
      assert(got("2024-01-01 10:00:00.0") == ((2L, 2.0)),
        s"late row leaked into a closed window: $got")
      assert(got.contains("2024-01-01 11:00:00.0"),
        "watermark advance must flush the next window")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization matches batch q33") {
    val events = Tables.load(spark, sf001, "events")
    // two event-time-ordered micro-batches: early half, then late half
    val cut = events.selectExpr("percentile(unix_micros(ts), 0.5D)")
      .collect().head.getDouble(0).toLong
    val dir = Files.createTempDirectory("graft_stream_sess").toString
    events.filter(org.apache.spark.sql.functions.unix_micros(
      org.apache.spark.sql.functions.col("ts")) <= cut)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/in")

    val streamIn = spark.readStream.schema(events.schema)
      .parquet(s"$dir/in")
    val q = EventStream.sessionizeStream(streamIn)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // second, strictly later batch lands after the first is processed
      events.filter(org.apache.spark.sql.functions.unix_micros(
        org.apache.spark.sql.functions.col("ts")) > cut)
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()

      val got = spark.table("sess_out")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("session_id").as("n_sessions"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = graft.streaming.EventStream.q33.run(spark, sf001)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, "streaming session counts differ from batch")
    } finally q.stop()
  }

  test("flatMapGroupsWithState attribution matches batch q126 derivation") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val events = Tables.load(spark, sf001, "events")
    val batch = EventStream.attributedPurchases(events)
      .select("user_id", "us", "event_id", "attributed").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet

    val cut = events.selectExpr("percentile(unix_micros(ts), 0.5D)")
      .collect().head.getDouble(0).toLong
    val dir = Files.createTempDirectory("graft_stream_attr").toString
    events.filter(unix_micros(col("ts")) <= cut)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(events.schema)
      .parquet(s"$dir/in")
    val q = EventStream.attributeStream(streamIn)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      events.filter(unix_micros(col("ts")) > cut)
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val got = spark.table("attr_out").collect()
        .map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toSet
      assert(got == batch,
        "streaming attribution differs from the batch window derivation")
      assert(got.exists(_._4) , "some purchase must be attributed")
    } finally q.stop()
  }

  test("transformWithState running totals match batch q130 exactly") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val events = Tables.load(spark, sf001, "events")
    val batch = EventStream.q130.run(spark, sf001)
      .select("user_id", "event_id", "run_n", "run_cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val cut = events.selectExpr("percentile(unix_micros(ts), 0.5D)")
      .collect().head.getDouble(0).toLong
    val dir = Files.createTempDirectory("graft_stream_tws").toString
    events.filter(unix_micros(col("ts")) <= cut)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    // transformWithState requires the RocksDB state store provider
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val origProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val streamIn = spark.readStream.schema(events.schema)
      .parquet(s"$dir/in")
    val q = EventStream.runningTotalsStream(streamIn)
      .writeStream.format("memory").queryName("tws_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      events.filter(unix_micros(col("ts")) > cut)
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val got = spark.table("tws_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == batch,
        "transformWithState totals differ from the batch window cumsum")
      assert(got.nonEmpty)
    } finally {
      q.stop()
      origProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("stream-stream interval join streaming == batch") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val events = Tables.load(spark, sf001, "events")
    val dir = Files.createTempDirectory("graft_stream_join").toString

    val batch = EventStream.clickThrough(
      events.filter(col("event_type") === "view"),
      events.filter(col("event_type") === "click"))
      .select("view_id", "cts").collect()
      .map(r => (r.getLong(0), r.get(1).toString)).toSet

    // two event-time-ordered micro-batches (watermark semantics drop
    // events older than the high-water mark, so arrival order must
    // respect event time — the contract any streaming deployment feeds
    // the join under)
    val cut = events.selectExpr("percentile(unix_micros(ts), 0.5D)")
      .collect().head.getDouble(0).toLong
    events.filter(unix_micros(col("ts")) <= cut)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    def streamIn = spark.readStream
      .schema(events.schema)
      .parquet(s"$dir/in")
    val q = EventStream.clickThrough(
      streamIn.filter(col("event_type") === "view"),
      streamIn.filter(col("event_type") === "click"))
      .select("view_id", "cts")
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      events.filter(unix_micros(col("ts")) > cut)
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val got = spark.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.get(1).toString)).toSet
      assert(got == batch, "stream-stream join differs from batch join")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("watermark drops late rows and ACCOUNTS for them in state metrics") {
    // The lateness-observability pin: when a micro-batch arrives with
    // event times older than the committed watermark, the windowed agg
    // must (a) exclude them from results and (b) surface the count in
    // numRowsDroppedByWatermark — the metric a 100 TB deployment alarms
    // on before anyone notices missing revenue. Without (b), silent
    // data loss looks identical to low traffic.
    import org.apache.spark.sql.functions.{col, unix_micros}
    val events = Tables.load(spark, sf001, "events")
    val dir = Files.createTempDirectory("graft_wm_drop").toString
    val cut = events.selectExpr("percentile(unix_micros(ts), 0.8D)")
      .collect().head.getDouble(0).toLong
    // batch 1: the NEWEST 20% — commits a high watermark
    events.filter(unix_micros(col("ts")) > cut)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    val q = EventStream.windowedCounts(
      spark.readStream.schema(events.schema).parquet(s"$dir/in"))
      .writeStream.format("memory").queryName("wm_drop_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: everything OLDER — far behind the watermark
      events.filter(unix_micros(col("ts")) <= cut)
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      val late = events.filter(unix_micros(col("ts")) <= cut).count()
      assert(dropped > 0, "late rows were not accounted as dropped")
      assert(dropped <= late, s"dropped $dropped exceeds late input $late")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: null rows flush on watermark, == batch") {
    import org.apache.spark.sql.functions.{col, expr, lit, unix_micros}
    // Outer semantics on streams: an unmatched view is emitted with a
    // NULL click side only once the global watermark passes vts+10min —
    // on a FINITE feed the last horizon's orphans would be withheld
    // forever, so the test appends a sentinel view+click pair far in
    // the future (advancing BOTH sides' watermarks, which min-combine)
    // and excludes the sentinel user from the comparison. Production
    // streams get this advance for free from ongoing traffic.
    val events = Tables.load(spark, sf001, "events")
    val dir = Files.createTempDirectory("graft_stream_loj").toString
    val maxTs = events.selectExpr("max(unix_micros(ts))")
      .collect().head.getLong(0)
    val sentinel = events.limit(2).select(
      lit(-1L).as("user_id"),
      expr(s"timestamp_micros(${maxTs + 7200L * 1000000L})").as("ts"),
      (col("event_id") % 2).as("pick"), col("event_id"), col("value"),
      col("props"))
      .withColumn("event_type",
        expr("CASE WHEN pick = 0 THEN 'view' ELSE 'click' END"))
      .select(events.columns.map(col): _*)

    val batch = EventStream.clickThrough(
      events.filter(col("event_type") === "view"),
      events.filter(col("event_type") === "click"), "left_outer")
      .select("view_id", "cts").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).toSet
    assert(batch.exists(_._2.isEmpty), "fixture must yield orphan views")

    val cut = events.selectExpr("percentile(unix_micros(ts), 0.5D)")
      .collect().head.getDouble(0).toLong
    events.filter(unix_micros(col("ts")) <= cut)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    def streamIn = spark.readStream
      .schema(events.schema)
      .parquet(s"$dir/in")
    val q = EventStream.clickThrough(
      streamIn.filter(col("event_type") === "view"),
      streamIn.filter(col("event_type") === "click"), "left_outer")
      .select("user_id", "view_id", "cts")
      .writeStream.format("memory").queryName("sloj_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      events.filter(unix_micros(col("ts")) > cut).unionByName(sentinel)
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val got = spark.table("sloj_out").collect()
        .filter(_.getLong(0) != -1L)
        .map(r => (r.getLong(1), Option(r.get(2)).map(_.toString))).toSet
      assert(got == batch,
        s"stream left-outer differs from batch: missing=" +
          s"${(batch -- got).take(5)} extra=${(got -- batch).take(5)}")
    } finally q.stop()
  }

  test("foreachBatch parquet sink: streamed aggregate fans out == batch") {
    // the streaming face of the reference's engine-to-engine fan-out
    // (CSV pipe into a second store): each micro-batch's refreshed
    // aggregate is materialized to parquet via foreachBatch — the
    // custom-sink hook — and the final store equals the batch result.
    val events = Tables.load(spark, sf001, "events")
    val inDir = Files.createTempDirectory("graft_febatch_in").toString
    val outDir = Files.createTempDirectory("graft_febatch_out").toString
    events.repartition(3).write.mode("overwrite").parquet(inDir)

    val batch = EventStream.windowedCounts(events).collect().map(key).toSet

    val streamIn = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = EventStream.windowedCounts(streamIn)
      .writeStream
      .outputMode("complete")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("overwrite").parquet(outDir)
      }
      .start()
    try {
      q.processAllAvailable()
      val got = spark.read.parquet(outDir).collect().map(key).toSet
      assert(got == batch, "foreachBatch sink differs from batch result")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("session_window ledger streaming == batch (append, watermark flush)") {
    import spark.implicits._
    val events = Tables.load(spark, sf001, "events")
    val batch = EventStream.sessionLedger(events).collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(1))) ->
        ((String.valueOf(r.get(2)), r.getLong(3), r.getDouble(4)))).toMap
    val dir = Files.createTempDirectory("graft_stream_sw").toString
    events.coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(events.schema)
      .parquet(s"$dir/in")
    val q = EventStream.sessionLedger(streamIn)
      .writeStream.format("memory").queryName("sw_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // two far-future sentinel batches: the first pushes the watermark
      // past every real session's end, the second triggers the batch
      // that actually evicts+emits the finalized real sessions (state
      // flush happens in the batch AFTER the watermark advance)
      def sentinel(user: Long, t: String) =
        Seq((9000000000L + user, java.sql.Timestamp.valueOf(t), -user,
          "view", 0.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .select(events.schema.fieldNames.map(
            org.apache.spark.sql.functions.col): _*)
      sentinel(1L, "2031-01-01 00:00:00")
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      sentinel(2L, "2032-01-01 00:00:00")
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      // the sentinel drop below assumes negative user_ids cannot occur
      // in the fixture — assert it, so a regenerated events fixture with
      // negative ids fails loudly instead of silently shrinking the
      // parity comparison (round-4 advice)
      val minUid = events.agg(org.apache.spark.sql.functions
        .min(org.apache.spark.sql.functions.col("user_id"))).head.getLong(0)
      assert(minUid >= 0,
        s"fixture has user_id $minUid < 0 — sentinel scheme needs rework")
      val got = spark.table("sw_out").collect()
        .filter(_.getLong(0) >= 0) // drop sentinel users (-1, -2)
        .map(r => (r.getLong(0), String.valueOf(r.get(1))) ->
          ((String.valueOf(r.get(2)), r.getLong(3), r.getDouble(4))))
      assert(got.nonEmpty)
      assert(got.map(_._1).distinct.length == got.length,
        "append mode must emit each finalized session exactly once")
      // full parity: every real session flushed and value-identical
      assert(got.toMap == batch,
        s"streamed ledger ${got.length} rows != batch ${batch.size}")
    } finally q.stop()
  }

  test("eventGaps marks first event per user as session start") {
    val gaps = EventStream.eventGaps(Tables.load(spark, sf001, "events"))
    val users = gaps.select("user_id").distinct().count()
    val firsts = gaps.filter("prev_ts IS NULL").count()
    assert(firsts == users)
    assert(gaps.filter("prev_ts IS NULL AND NOT new_session").count() == 0)
  }

  test("q201 near-dup first-wins: streamed verdicts == batch, both modes") {
    import spark.implicits._
    import graft.streaming.NearDupStream
    import graft.streaming.NearDupStream.{BandRow, BandVerdict}
    val bandsDf = graft.queries.Dedup.bandFrame(spark, sf001)
    val bands = bandsDf.as[BandRow].collect()
    val schema = bandsDf.schema
    // ground truth: the registered batch query (its own groupBy+join
    // formulation, independently oracle-checked against DuckDB)
    val expected = graft.queries.Dedup.q201.run(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    Caches.release()
    def rollup(vs: Seq[BandVerdict]): Map[Long, (Boolean, Long)] =
      vs.groupBy(_.doc_id).map { case (id, g) =>
        id -> ((g.exists(_.dup), g.count(_.dup).toLong))
      }
    // batch mode: same stateful definition, single implicit micro-batch
    assert(rollup(NearDupStream.verdicts(bands.toSeq.toDS()).collect()
      .toSeq) == expected, "batch-mode verdicts diverge from q201")
    // streaming mode: two prefix-respecting micro-batches (all earlier
    // doc_ids land before later ones — the arrival order whose verdicts
    // the first-seen rule pins; within a batch the operator self-sorts)
    val sortedIds = bands.map(_.doc_id).distinct.sorted
    val mid = sortedIds(sortedIds.length / 2)
    val (first, second) = bands.partition(_.doc_id <= mid)
    val dir = Files.createTempDirectory("graft_q201_stream").toString
    // coalesce(1): each intended micro-batch must publish as ONE data
    // file — a multi-file append commits via per-file renames, and the
    // file source can list the first file before the second lands,
    // splitting the batch across triggers in a NON-prefix-respecting
    // order (doc 411 before its smaller-id partner 404 — the full-suite
    // flake this exact test hit in r8 under load). Single file = single
    // atomic rename = the premise the parity assertion states.
    first.toSeq.toDS().coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(schema)
      .parquet(s"$dir/in").as[BandRow]
    val q = NearDupStream.verdicts(streamIn)
      .writeStream.format("memory").queryName("q201_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      second.toSeq.toDS().coalesce(1)
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val got = rollup(
        spark.table("q201_out").as[BandVerdict].collect().toSeq)
      assert(got.size == expected.size,
        s"streamed ${got.size} docs != batch ${expected.size}")
      assert(got == expected,
        "streamed first-wins verdicts diverge from batch q201")
    } finally q.stop()
  }

  test("q240 carried-state dedup: streamed-from-store == batch face") {
    import spark.implicits._
    import graft.streaming.NearDupStream
    import graft.streaming.NearDupStream.{BandRow, BandVerdict}
    def rollup(vs: Seq[BandVerdict]): Map[Long, (Boolean, Long)] =
      vs.groupBy(_.doc_id).map { case (id, g) =>
        id -> ((g.exists(_.dup), g.count(_.dup).toLong))
      }
    // ground truth: the registered batch face (oracle-checked against
    // the q201-over-full-corpus SQL); also commits the store
    val expected = graft.queries.Dedup.q240.run(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    Caches.release()
    val (cut, init, bandsAll) =
      graft.queries.Dedup.bandStateStore(spark, sf001)
    val fresh = bandsAll.filter(col("doc_id") > cut)
      .select(col("doc_id"), col("band_id"), col("band_sig"))
    val freshRows = fresh.as[BandRow].collect()
    val schema = fresh.schema
    // the carried state must be LOAD-BEARING on this fixture: without
    // it, some fresh doc that only collides with an OLD doc must lose
    // its duplicate verdict — otherwise this whole test is vacuous
    val noInit = rollup(
      NearDupStream.verdicts(freshRows.toSeq.toDS()).collect().toSeq)
    assert(noInit != expected,
      "fixture has no fresh→old collisions; carried state untested")
    // streaming mode: prefix-respecting micro-batches over the fresh
    // docs, initial state read from the committed TSV store
    val sortedIds = freshRows.map(_.doc_id).distinct.sorted
    val mid = sortedIds(sortedIds.length / 2)
    val (first, second) = freshRows.partition(_.doc_id <= mid)
    val dir = Files.createTempDirectory("graft_q240_stream").toString
    // coalesce(1): atomic one-file publish per intended micro-batch —
    // the q201 test's prefix-respecting-order fix, same reasoning
    first.toSeq.toDS().coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(schema)
      .parquet(s"$dir/in").as[BandRow]
    val q = NearDupStream.verdictsWithInit(streamIn, init)
      .writeStream.format("memory").queryName("q240_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      second.toSeq.toDS().coalesce(1)
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val got = rollup(
        spark.table("q240_out").as[BandVerdict].collect().toSeq)
      assert(got == expected,
        "streamed-from-store verdicts diverge from the batch face")
    } finally {
      q.stop()
      Caches.release()
    }
  }

  test("q254 commitBatch: idempotent replay, invisible partial writes") {
    import spark.implicits._
    import graft.streaming.SnapshotStream
    import graft.sources.IngestJob
    val root = Files.createTempDirectory("graft_q254")
    val dataDir = root.resolve("data")
    def table(vals: (Long, String, Long)*) =
      vals.toSeq.toDF("event_id", "event_type", "c")
    // batch 0 commits v1
    SnapshotStream.commitBatch(root, table((1L, "view", 100L)), 0L)
    assert(Files.exists(root.resolve("v1.manifest.tsv")))
    val m1 = Files.getLastModifiedTime(root.resolve("v1.manifest.tsv"))
    def readV(n: Int) =
      IngestJob.readFiles(spark, dataDir, IngestJob.readManifest(root, n))
        .get.collect().map(_.getLong(0)).toSet
    assert(readV(1) == Set(1L))
    // REPLAY of batch 0 (restart after the streaming log lost the epoch)
    // must be a no-op even with different replayed content
    SnapshotStream.commitBatch(root, table((99L, "view", 1L)), 0L)
    assert(Files.getLastModifiedTime(root.resolve("v1.manifest.tsv")) == m1,
      "replayed batch recommitted")
    assert(readV(1) == Set(1L), "replayed batch changed committed data")
    // batch 1 extends the manifest chain
    SnapshotStream.commitBatch(root, table((2L, "click", 200L)), 1L)
    assert(readV(2) == Set(1L, 2L))
    // crash DURING batch 2: data files land, no manifest — invisible to
    // every committed version, then the replay re-lands and commits
    table((3L, "view", 300L)).write.parquet(dataDir.resolve("b2").toString)
    assert(readV(2) == Set(1L, 2L))
    SnapshotStream.commitBatch(root, table((3L, "view", 300L)), 2L)
    assert(readV(3) == Set(1L, 2L, 3L))
    // no orphans once every batch committed
    val refd = (1 to 3).flatMap(IngestJob.readManifest(root, _)).toSet
    assert(IngestJob.listParquet(dataDir, "").forall(refd))
  }

  test("q376 SRM monitor: streamed daily verdicts == batch; alarm fires") {
    val events = Tables.load(spark, sf001, "events")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_srm").toString
    events.repartition(4).write.mode("overwrite").parquet(dir)
    def key(r: Row) = (r.getTimestamp(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getBoolean(4))
    val batch = EventStream.srmDaily(events).collect().map(key).toSet

    val streamIn = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventStream.srmDaily(streamIn)
      .writeStream
      .format("memory")
      .queryName("srm_out")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("srm_out").collect().map(key).toSet
      assert(got == batch, "streaming SRM differs from batch")
      // the dosed day-15 outage must be the ONLY alarm
      val alarms = got.filter(_._5)
      assert(alarms.size == 1 && {
        val c = java.util.Calendar.getInstance(
          java.util.TimeZone.getTimeZone("UTC"))
        c.setTime(alarms.head._1)
        c.get(java.util.Calendar.DAY_OF_MONTH) == 15
      }, s"alarms: $alarms")
    } finally q.stop()
  }
}
