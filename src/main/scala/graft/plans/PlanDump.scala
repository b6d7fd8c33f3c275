package graft.plans

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Physical-plan artifacts, one file per query — the analog of the
  * reference's per-query `*.plan.txt` fixtures (reference:
  * queries/q1-aggregation-by-type/postgres.plan.txt etc.; EXPLAIN treated
  * as a first-class artifact, queries/q1/README.md:51,88,125,161).
  *
  * Usage: runMain graft.plans.PlanDump [sfDir] [outDir]
  * Defaults: sf0.001 → plans/.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "plans"
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"$name.plan.txt"), plan)
      } catch {
        case e: Throwable =>
          System.err.println(s"[plans] $name failed: ${e.getMessage}")
      } finally graft.Caches.release()
    }
    spark.stop()
  }
}
