package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) storage — the MergeTree sort-key / clustered-
  * storage analog at join time (reference: clickhouse-init/
  * 01-create-table.sql:71-73 `ORDER BY (postcode1, ...)`; SURVEY §1.3
  * maps it to `bucketBy(...).sortBy(...)`).
  *
  * Writing both fact tables bucketed on the join key pre-partitions them
  * identically ON DISK, so the join plans with ZERO Exchange on either
  * side — at 100 TB that is the difference between "join = read" and
  * "join = re-shuffle 100 TB". BucketedSpec asserts the exchange-free
  * plan and result parity with the shuffled join.
  */
object Buckets {

  /** Write `df` as a bucketed, sorted managed table (overwriting). The
    * in-memory catalog forgets tables between JVMs while the warehouse
    * directory persists, so a stale location must be cleared explicitly
    * or CTAS fails with LOCATION_ALREADY_EXISTS. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two identically-bucketed tables on their bucket key. */
  def bucketedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
