package graft.sources

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.queries.Q

/** S6 full fidelity: a LIVE engine-to-engine hop over JDBC with aggregate
  * pushdown — the reference's pg_clickhouse FDW architecture (reference:
  * init.sql:7-13,27-70; "entire aggregation pushed down … PostgreSQL
  * executor bypassed", queries/q1-aggregation-by-type/README.md:139-143).
  *
  * The second engine is Apache Derby embedded (ships with Spark's JDBC
  * test surface; in-process, zero network setup): the `nation` fixture is
  * INSERTed into Derby over JDBC, then read back through Spark's JDBC
  * DSv2 catalog with `pushDownAggregate=true`, so the GROUP BY
  * count/sum/min runs INSIDE Derby and only the 5 result rows cross the
  * boundary — the same split the FDW demonstrates, with Spark in
  * PostgreSQL's coordinator seat. JdbcRemoteSpec asserts the plan carries
  * `PushedAggregates`; the q64 plan artifact records it.
  *
  * Scale note: the lesson the reference's Q4-over-FDW teaches (a 20.7 s
  * disaster when large intermediates cross the hop, queries/q4:184-195)
  * is exactly what aggregate pushdown avoids — ship the aggregation to
  * the data, move only the grouped result.
  */
object JdbcRemote {

  private val url = "jdbc:derby:memory:graftremote;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  val catalogName = "graft_remote"

  private def ensureCatalog(s: SparkSession): Unit = {
    // keep derby.log out of the repo tree
    if (!sys.props.contains("derby.system.home"))
      sys.props("derby.system.home") = sys.props("java.io.tmpdir")
    s.conf.set(
      s"spark.sql.catalog.$catalogName",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    s.conf.set(s"spark.sql.catalog.$catalogName.url", url)
    s.conf.set(s"spark.sql.catalog.$catalogName.driver", driver)
    s.conf.set(s"spark.sql.catalog.$catalogName.pushDownAggregate", "true")
    s.conf.set(s"spark.sql.catalog.$catalogName.pushDownLimit", "true")
  }

  /** INSERT…SELECT the nation fixture into the remote engine (the
    * reference's FDW-backed `INSERT INTO … SELECT` hop, README.md:314-333).
    * Derby maps unbounded strings to CLOB, which it refuses to GROUP BY
    * or MIN — declare VARCHAR widths like the reference's explicit remote
    * DDL (init.sql:27-70). Synchronized: Verify submits queries from
    * several threads and embedded Derby DDL is a shared resource. */
  private def loadNation(s: SparkSession, d: String): Unit = synchronized {
    Tables.load(s, d, "nation").write
      .format("jdbc")
      .option("url", url)
      .option("driver", driver)
      .option("dbtable", "nation")
      .option("createTableColumnTypes", "n_name VARCHAR(64)")
      .mode("overwrite")
      .save()
  }

  /** The remote table as Spark sees it through the DSv2 catalog. Derby
    * normalizes the unquoted CREATE TABLE name to upper case and stores
    * it under the default APP schema; the backticked identifier must
    * match that exactly (the catalog quotes each part). */
  val remoteTableSql: String = s"$catalogName.`APP`.`NATION`"

  val q64 = Q(
    "q64_jdbc_remote",
    (s, d) => {
      ensureCatalog(s)
      loadNation(s, d)
      s.sql(s"""
        SELECT n_regionkey, count(*) AS n,
               sum(n_nationkey) AS sum_key,
               min(n_name) AS first_name
        FROM $remoteTableSql
        GROUP BY n_regionkey
        ORDER BY n_regionkey""")
    },
    Some("""
      SELECT n_regionkey, count(*) AS n,
             CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
             min(n_name) AS first_name
      FROM nation
      GROUP BY n_regionkey
      ORDER BY n_regionkey"""))

  /** Load the customer fixture into Derby (the federated dimension for
    * q267). Synchronized like [[loadNation]] — embedded Derby DDL is a
    * shared resource under Verify's concurrent driver threads. */
  private def loadCustomer(s: SparkSession, d: String): Unit = synchronized {
    Tables.load(s, d, "customer").write
      .format("jdbc")
      .option("url", url)
      .option("driver", driver)
      .option("dbtable", "customer")
      .option("createTableColumnTypes",
        "c_name VARCHAR(64), c_mktsegment VARCHAR(32)")
      .mode("overwrite")
      .save()
  }

  val remoteCustomerSql: String = s"$catalogName.`APP`.`CUSTOMER`"

  /** q267: FEDERATED three-source join — one query plan spanning three
    * physically different engines/stores: the orders FACT stays in
    * parquet, the customer DIMENSION lives in the remote JDBC engine
    * (Derby — the reference's FDW analog), and the nation dimension
    * round-trips through the custom DSv2 TSV source. The predicate on
    * the remote dimension (c_acctbal > 0) is PUSHED into Derby (DSv2
    * JDBC pushdown — only surviving rows cross the wire) and the scan
    * is column-pruned to the two columns the join needs; the TSV leg
    * exercises the custom source's pushdown machinery the same way.
    * The oracle recomputes everything from the original parquet, so a
    * pass proves no value was mangled crossing EITHER federation
    * boundary. At 100 TB this is the standard topology: the fact never
    * moves; small dimensions federate in and broadcast; pushdown keeps
    * the remote engines' egress proportional to their answers, not
    * their tables (the reference measures exactly this FDW trade,
    * README.md:314-333). Demo-scale caveat, stated honestly: the
    * remote load itself is part of this harness run; a real federation
    * starts with the data already resident. */
  val q267 = Q(
    "q267_federated_join",
    (s, d) => {
      import org.apache.spark.sql.functions._
      ensureCatalog(s)
      loadCustomer(s, d)
      val tsvDir = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_ingest",
        s"nation_tsv_${d.replaceAll("[^0-9.]", "")}").toString
      Tables.load(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"))
        .write.format("graft.sources.tsv").mode("overwrite").save(tsvDir)
      val nation = s.read.format("graft.sources.tsv")
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n_nationkey",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("n_name",
            org.apache.spark.sql.types.StringType, nullable = false))))
        .load(tsvDir)
      val customer = s.sql(
        s"SELECT c_custkey, c_nationkey FROM $remoteCustomerSql " +
          "WHERE c_acctbal > 0")
      val orders = Tables.load(s, d, "orders")
        .select(col("o_custkey"),
          graft.queries.Det.cents(col("o_totalprice")).as("cents"))
      orders
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(col("cents")).cast(org.apache.spark.sql.types.DoubleType)
            / lit(100.0)).as("revenue"))
        .orderBy(col("n_name"))
    },
    Some(s"""
      SELECT n_name, count(*) AS n_orders,
             CAST(CAST(sum(${graft.queries.Det.centsSql("o_totalprice")})
               AS BIGINT) AS DOUBLE) / 100 AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey AND c_acctbal > 0
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name"""))

  val all: Seq[Q] = Seq(q64, q267)
}
