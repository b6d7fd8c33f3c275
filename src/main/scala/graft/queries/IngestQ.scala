package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Ingestion-transform operators (reference: README.md:143-199 — the
  * url()-CSV → typed-table transform block): regex field extraction, enum
  * decode via conditional chains (reference F8 `transform(...)`), boolean
  * derivation (F9 `b = 'Y'`), casts (F10), lenient multi-format date parsing
  * (F6 `parseDateTimeBestEffortUS`), and 1-based string splitting (F7
  * `splitByChar(' ', postcode)[1]`). Expressed over the events/documents
  * fixtures per FIXTURES.md §C.
  */
object IngestQ {

  /** Transform-on-read over events: JSON-ish field extract + enum decode +
    * boolean + lenient two-format date parse (even ids carry yyyy/MM/dd,
    * odd ids MM-dd-yyyy — the parse must try both, like
    * parseDateTimeBestEffortUS). */
  val q15 = Q(
    "q15_ingest_events",
    (s, d) => {
      val raw = Tables.load(s, d, "events")
        .withColumn(
          "date_str",
          when(
            col("event_id") % 2 === 0,
            date_format(col("ts"), "yyyy/MM/dd"))
            .otherwise(date_format(col("ts"), "MM-dd-yyyy")))
      raw.select(
        col("event_id"),
        when(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1) === "", null)
          .otherwise(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1))
          .cast(IntegerType).as("k"),
        when(col("event_type").isin("click", "view"), "interaction")
          .when(col("event_type").isin("purchase", "signup"), "conversion")
          .otherwise("other").as("category"),
        (col("value") >= 100.0).as("is_big"),
        floor(col("value")).cast(LongType).as("value_int"),
        coalesce(
          expr("try_to_timestamp(date_str, 'yyyy/MM/dd')"),
          expr("try_to_timestamp(date_str, 'MM-dd-yyyy')"))
          .cast(DateType).as("best_effort_date"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH raw AS (
        SELECT *,
               CASE WHEN event_id % 2 = 0 THEN strftime(ts, '%Y/%m/%d')
                    ELSE strftime(ts, '%m-%d-%Y') END AS date_str
        FROM events
      )
      SELECT event_id,
             CAST(nullif(regexp_extract(props, '"k":\s*(\d+)', 1), '')
                  AS INTEGER) AS k,
             CASE WHEN event_type IN ('click','view') THEN 'interaction'
                  WHEN event_type IN ('purchase','signup') THEN 'conversion'
                  ELSE 'other' END AS category,
             value >= 100.0 AS is_big,
             CAST(floor(value) AS BIGINT) AS value_int,
             CAST(coalesce(try_strptime(date_str, '%Y/%m/%d'),
                           try_strptime(date_str, '%m-%d-%Y'))
                  AS DATE) AS best_effort_date
      FROM raw
      ORDER BY event_id"""))

  /** Split / element_at / string ops over documents (reference F7/F11:
    * splitByChar + 1-based indexing, length profiling). element_at is
    * 1-based in Spark, matching both ClickHouse arrays and DuckDB lists. */
  val q16 = Q(
    "q16_ingest_documents",
    (s, d) =>
      Tables.load(s, d, "documents")
        .select(
          col("doc_id"),
          element_at(split(col("text"), " "), 1).as("first_word"),
          element_at(split(col("text"), " "), 2).as("second_word"),
          upper(col("lang")).as("lang_uc"),
          concat(col("lang"), lit(":"), col("source")).as("lang_source"),
          length(col("text")).as("text_len"),
          substring(col("text"), 1, 12).as("prefix12"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             string_split(text, ' ')[1] AS first_word,
             string_split(text, ' ')[2] AS second_word,
             upper(lang) AS lang_uc,
             lang || ':' || source AS lang_source,
             length(text) AS text_len,
             substr(text, 1, 12) AS prefix12
      FROM documents
      ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(q15, q16)
}
