package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: run ONE registered query by name against a fixture dir and
  * print its row count and wall time — the per-query iteration loop that
  * Verify (all queries, oracle dump) and Bench (all queries, timed sweep)
  * are too coarse for. Usage: runMain graft.RunOne <name> [sfDir] [runs]. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val runs = if (args.length > 2) args(2).toInt else 1
    val spark = Sessions.local()
    val fn = SparkEntry.queries.getOrElse(
      name, sys.error(s"unknown query: $name"))
    (1 to runs).foreach { i =>
      // per-run CPU probe (Bench.calibrate): a stalled box shows a
      // proportionally inflated probe beside the run it distorted, so
      // RunOne triage verdicts (stall vs regression) are arithmetic
      val cal = Bench.calibrate()
      val t0 = System.nanoTime()
      // SPARK_GRAFT_KEEP_CACHE=1 preserves persisted frames across runs —
      // ONLY for reproducing cross-run cache-accretion effects (the
      // pre-round-3 bench regime); never how Bench measures
      val n =
        try fn(spark, sfDir).count()
        finally if (sys.env.getOrElse("SPARK_GRAFT_KEEP_CACHE", "0") == "0")
          Caches.release()
      println(f"[runone] $name run $i: $n rows, " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s (cal $cal%.3f s)")
      // free localCheckpoint blocks between runs, like Bench (r7 item #4)
      if (sys.env.getOrElse("SPARK_GRAFT_KEEP_CACHE", "0") == "0")
        Caches.sweepOrphans(spark)
    }
    spark.stop()
  }
}
