package graft

import org.apache.spark.sql.SparkSession

/** One place for the local SparkSession every entry point builds — the
  * master/shuffle-partitions/UI/log-level block plus
  * [[Tables.sessionConfigs]] (extensions, nanos timestamps, AQE). Five
  * mains used to hand-copy it; a new session config now lands everywhere
  * at once. */
object Sessions {

  /** `local[cpus]` session with shuffle partitions = cpus (SURVEY §6: 32
    * for the driver's local[32] box, overridable via SPARK_GRAFT_CPUS). */
  def local(
      cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      logLevel: String = "WARN"): SparkSession = {
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
