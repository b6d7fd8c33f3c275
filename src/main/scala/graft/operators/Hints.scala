package graft.operators

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-conditional join hints.
  *
  * An unconditional `broadcast()` of a vocabulary-sized table (token
  * document frequencies, distinct-token vocab) is correct at test scale and
  * an OOM at 100 TB, where a corpus vocabulary runs to billions of tokens.
  * The honest hint is conditional: broadcast only when Catalyst's own size
  * estimate fits under the session broadcast threshold, and otherwise leave
  * the join unhinted — planner stats decide at plan time, and AQE still
  * converts the join to broadcast at runtime if the built side turns out
  * small. This mirrors what the reference relies on from its engines: no
  * manual rewrites, the optimizer picks the strategy from observed sizes
  * (reference: README.md:14-16).
  */
object Hints {

  /** `broadcast(df)` iff the optimizer's size estimate for `df` is within
    * `spark.sql.autoBroadcastJoinThreshold`; `df` unchanged otherwise. */
  def autoBroadcast(df: DataFrame): DataFrame = {
    val raw = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val threshold =
      try JavaUtils.byteStringAsBytes(raw)
      catch { case _: NumberFormatException => 10L << 20 }
    if (threshold > 0 &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(threshold))
      broadcast(df)
    else df
  }
}
