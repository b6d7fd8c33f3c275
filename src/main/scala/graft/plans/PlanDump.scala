package graft.plans

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
import graft.{SparkEntry, Tables}

/** Physical-plan artifacts, one file per query — the analog of the
  * reference's per-query `*.plan.txt` fixtures (reference:
  * queries/q1-aggregation-by-type/postgres.plan.txt etc.; EXPLAIN treated
  * as a first-class artifact, queries/q1/README.md:51,88,125,161).
  *
  * Each query also gets a `*.metrics.txt`: the EXECUTED plan with its
  * runtime SQL metrics (rows, time, spill, …) per operator — the
  * reference's `EXPLAIN (ANALYZE, BUFFERS)` analog (reference:
  * queries/q4-top-countries-percentiles/README.md:50; measured plans are
  * first-class artifacts there too).
  *
  * Usage: runMain graft.plans.PlanDump [sfDir] [outDir]
  * Defaults: sf0.001 → plans/.
  */
object PlanDump {

  /** Executed-plan tree with accumulated runtime metrics per node; walks
    * through AQE wrappers and query stages to the final physical plan. */
  def metricsReport(plan: SparkPlan): String = {
    val sb = new StringBuilder
    def walk(p: SparkPlan, depth: Int): Unit = {
      val ms = p.metrics.toSeq
        .filter(_._2.value != 0L)
        .sortBy(_._1)
        .map { case (k, m) => s"$k=${m.value}" }
        .mkString(", ")
      sb.append("  " * depth).append(p.nodeName)
        .append(if (ms.isEmpty) "" else s" [$ms]").append('\n')
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: QueryStageExec => walk(q.plan, depth + 1)
        case r: ReusedExchangeExec => walk(r.child, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
    }
    walk(plan, 0)
    sb.toString
  }
  /** EXPLAIN PIPELINE analog (the reference's ClickHouse leg treats the
    * processor-pipeline view as a first-class artifact, reference:
    * queries/q1-aggregation-by-type/README.md:161): the executed plan
    * rendered as fused execution pipelines. Each WholeStageCodegen span
    * is one `pipeline#N` line — the operators that run as a single
    * generated loop over each partition (the Tungsten analog of a
    * ClickHouse processor chain), with its partition fan-out — and each
    * Exchange is an explicit `== stage boundary ==` line carrying the
    * partitioning that the shuffle/broadcast imposes. Wide codegen spans
    * and few boundaries is exactly what "pipelined" means on Spark. */
  def pipelineReport(plan: SparkPlan): String = {
    val sb = new StringBuilder
    // operators fused into one codegen span (stop at InputAdapter, which
    // marks where the generated loop reads from a materialized input),
    // plus the subtrees feeding the span
    def fused(p: SparkPlan): (Seq[String], Seq[SparkPlan]) = p match {
      case i: InputAdapter => (Nil, Seq(i.child))
      case _ =>
        val parts = p.children.map(fused)
        (p.nodeName +: parts.flatMap(_._1), parts.flatMap(_._2))
    }
    def walk(p: SparkPlan, depth: Int): Unit = {
      def line(s: String): Unit =
        sb.append("  " * depth).append(s).append('\n')
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth)
        case q: QueryStageExec => walk(q.plan, depth)
        case r: ReusedExchangeExec =>
          line(s"== reused stage (${r.child.nodeName} shared, no recompute) ==")
        case w: WholeStageCodegenExec =>
          val (ops, inputs) = fused(w.child)
          val ways =
            try s", ${w.outputPartitioning.numPartitions}-way"
            catch { case _: Throwable => "" }
          line(s"pipeline#${w.codegenStageId} [codegen$ways]: " +
            ops.mkString(" <- "))
          inputs.foreach(walk(_, depth + 1))
        case e: Exchange =>
          line(s"== stage boundary: ${e.nodeName} → ${e.outputPartitioning} ==")
          e.children.foreach(walk(_, depth + 1))
        case _ =>
          line(p.nodeName)
          p.children.foreach(walk(_, depth + 1))
      }
    }
    walk(plan, 0)
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "plans"
    val only = args.drop(2).toSet // optional: restrict to named queries
    val spark = graft.Sessions.local(cpus = "4", logLevel = "ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"$name.plan.txt"), plan)
        // EXPLAIN ANALYZE analog: run the query's own plan, then dump it
        // with the accumulated runtime metrics
        df.collect()
        Files.writeString(
          Paths.get(outDir, s"$name.metrics.txt"),
          metricsReport(df.queryExecution.executedPlan))
        // EXPLAIN PIPELINE analog over the same executed (post-AQE) plan
        Files.writeString(
          Paths.get(outDir, s"$name.pipeline.txt"),
          pipelineReport(df.queryExecution.executedPlan))
      } catch {
        case e: Throwable =>
          System.err.println(s"[plans] $name failed: ${e.getMessage}")
      } finally graft.Caches.release()
    }
    spark.stop()
  }
}
