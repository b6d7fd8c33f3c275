package graft

import org.apache.spark.sql.functions._
import graft.operators.Buckets

/** Bucketed co-located join: identically-bucketed fact tables join with
  * no Exchange on either side, and results match the shuffled join.
  */
class BucketedSpec extends SparkSpec {

  test("bucketed join plans without exchanges and matches shuffled join") {
    val li = Tables.load(spark, sf001, "lineitem")
      .select(
        col("l_orderkey").as("orderkey"),
        col("l_quantity"), col("l_extendedprice"))
    val ord = Tables.load(spark, sf001, "orders")
      .select(
        col("o_orderkey").as("orderkey"),
        col("o_orderstatus"), col("o_totalprice"))

    Buckets.writeBucketed(li, "li_bucketed", "orderkey", 8)
    Buckets.writeBucketed(ord, "ord_bucketed", "orderkey", 8)

    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined =
        Buckets.bucketedJoin(spark, "li_bucketed", "ord_bucketed", "orderkey")
      val agg = joined.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))

      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(!joinPlan.contains("Exchange"),
        s"bucketed join should be exchange-free:\n$joinPlan")

      val expected = li.join(ord, Seq("orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
        .collect().map(_.toSeq).toSet
      assert(agg.collect().map(_.toSeq).toSet == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("salted join equals plain join row-for-row") {
    import graft.operators.Skew
    val ev = Tables.load(spark, sf001, "events")
    val dim = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val plain = ev.join(dim, Seq("user_id"))
      .select("event_id", "user_id", "cnt")
      .collect().map(_.toSeq).toSet
    val salted = Skew
      .saltedJoin(ev, dim, "user_id", col("event_id"), nSalts = 8)
      .select("event_id", "user_id", "cnt")
      .collect().map(_.toSeq).toSet
    assert(salted == plain && plain.nonEmpty)
  }
}
