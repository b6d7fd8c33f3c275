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

  val all: Seq[Q] = Seq(q64)
}
