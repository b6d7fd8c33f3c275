package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (executor threads, codegen, parquet reader, shuffle
    // machinery) so the first measured query isn't charged ~5s of JVM init
    Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count().count()
    // N runs per query (default 2): run 1 pays codegen/JIT/page-cache,
    // run 2 is the engine's warm steady-state speed — the regime the
    // baseline's published numbers measure on a long-lived server. The
    // HEADLINE per-query time is the LAST run, not the minimum: minima of
    // independent runs compose into a total no single end-to-end sweep
    // achieved (round-2 advice). All per-run times are emitted under
    // "queries_runs" so the driver can pick any statistic. Each run
    // releases the caches its query persisted (Caches.release) so every
    // measured run is a complete, self-contained execution and cached
    // blocks never accrete across the 60+-query sweep.
    // A failing query records -1 (NOT its elapsed time) and lands in
    // "failed" — a crash must never masquerade as a fast success.
    val runs = math.max(1,
      scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
        .getOrElse(2))
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).count(); true }
            catch {
              case t: Throwable =>
                System.err.println(s"bench: $name FAILED: $t"); false
            }
            finally Caches.release()
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        val ok = !times.contains(-1.0)
        (name, if (ok) times.last else -1.0, ok, times)
    }
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qruns = results
      .map { case (k, _, _, ts) =>
        s"\"" + k + "\":" + ts.mkString("[", ",", "]")
      }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false, _) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true, _) => v }.sum
    val sf = "[0-9.]+".r.findFirstIn(
      new java.io.File(sfDir).getName).getOrElse("0")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_runs":$qruns,"failed":$failed,"runs":$runs,"sf":$sf}""")
    spark.stop()
  }
}
