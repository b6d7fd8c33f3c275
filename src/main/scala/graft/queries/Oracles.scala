package graft.queries

import scala.collection.mutable.ArrayBuffer

/** Oracle-dialect hardening pass, applied to every DuckDB twin at
  * registration ([[graft.SparkEntry.oracleSql]]).
  *
  * DuckDB 1.0.0 INLINES a CTE at every reference site. A CTE referenced
  * twice therefore plans its subtree twice — and a CHAIN of such CTEs
  * (q274's 8 k-core peels, each referencing its predecessor in two `IN`
  * subqueries) doubles the plan per link: 2^8 copies of the basket
  * self-join, >70 CPU-minutes at sf0.01. One such twin hung the driver's
  * whole-round compare mid-iteration and zeroed `CORRECTNESS_r07.json`
  * (r7 verdict item #1). `AS MATERIALIZED` is DuckDB's evaluate-once
  * hint — the oracle-side analog of the Spark twins' localCheckpoint —
  * and is semantically neutral (same rows, same order).
  *
  * The pass walks every WITH chain (top-level and nested-in-subquery
  * alike), quote-aware (single-quoted literals with '' escapes never
  * affect paren depth), and rewrites `name AS (` to `name AS MATERIALIZED
  * (` for every CTE that is (a) not already materialized, (b) not a
  * recursive member (self-referencing inside a WITH RECURSIVE chain —
  * executed iteratively, its working table is materialized by
  * construction), and (c) referenced at least twice outside its own body.
  * Single-reference CTEs keep default inlining so DuckDB can still push
  * filters into them. Reference counting is word-boundary,
  * case-insensitive, and deliberately global: a column or alias sharing a
  * CTE's name can only OVERcount, so the failure mode is a harmless extra
  * materialization, never a missed one. Optional CTE column lists
  * (`name(a, b) AS (`) are handled; `WINDOW w AS (...)` clauses never
  * match because they are neither WITH-initial nor chain-comma-preceded.
  *
  * `tools/cte_audit.py` is the matching static screen over the dumped
  * `oracle_sql.json`; the per-query-timeboxed `tools/oracle_check.py` run
  * is the runtime proof that every rewritten twin still matches its Spark
  * dump.
  */
object Oracles {

  private final case class Cte(name: String, defStart: Int,
      insertAt: Int, bodyStart: Int, bodyEnd: Int,
      materialized: Boolean, recursiveChain: Boolean)

  /** inside-single-quoted-string flag per character ('' escape aware). */
  private def stringMask(sql: String): Array[Boolean] = {
    val inStr = new Array[Boolean](sql.length)
    var str = false
    var i = 0
    while (i < sql.length) {
      inStr(i) = str
      if (str) {
        if (sql.charAt(i) == '\'') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
            inStr(i + 1) = true; i += 1
          } else str = false
        }
      } else if (sql.charAt(i) == '\'') { str = true; inStr(i) = true }
      i += 1
    }
    inStr
  }

  private val WithKw =
    java.util.regex.Pattern.compile("""(?i)\bWITH\s+(RECURSIVE\s+)?""")
  private val CteHead = java.util.regex.Pattern.compile(
    """(?i)([A-Za-z_][A-Za-z_0-9]*)\s*(\([^()]*\))?\s+AS\s+""" +
      """(MATERIALIZED\s+)?\(""")

  def materialize(sql: String): String = {
    val up = sql.toUpperCase
    if (!up.contains("WITH")) return sql
    val inStr = stringMask(sql)

    // walk every WITH chain: WITH [RECURSIVE] name [(cols)] AS
    // [MATERIALIZED] ( body ) [, name AS ( body )]*
    val ctes = ArrayBuffer.empty[Cte]
    val wm = WithKw.matcher(sql)
    while (wm.find()) {
      if (!inStr(wm.start())) {
        val recursive = wm.group(1) != null
        var pos = wm.end()
        var more = true
        while (more) {
          more = false
          val hm = CteHead.matcher(sql)
          hm.region(pos, sql.length)
          if (hm.lookingAt()) {
            val bodyStart = hm.end() // char AFTER the opening `(`
            var d = 1
            var i = bodyStart
            while (i < sql.length && d > 0) {
              if (!inStr(i)) {
                if (sql.charAt(i) == '(') d += 1
                else if (sql.charAt(i) == ')') d -= 1
              }
              i += 1
            }
            ctes += Cte(hm.group(1), hm.start(), hm.end() - 1, bodyStart,
              i - 1, hm.group(3) != null, recursive)
            // chain continues iff the next non-space char is a comma
            var j = i
            while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
            if (j < sql.length && sql.charAt(j) == ',') {
              pos = j + 1
              while (pos < sql.length && sql.charAt(pos).isWhitespace)
                pos += 1
              more = true
            }
          }
        }
      }
    }

    val inserts = ctes.filterNot(_.materialized).filter { cte =>
      val nameRe = java.util.regex.Pattern.compile(
        """(?i)\b""" + java.util.regex.Pattern.quote(cte.name) + """\b""")
      val nm = nameRe.matcher(sql)
      var external = 0
      var selfRef = false
      while (nm.find()) {
        val s = nm.start()
        if (!inStr(s)) {
          if (s >= cte.bodyStart && s < cte.bodyEnd) selfRef = true
          else if (s < cte.defStart || s >= cte.bodyEnd) external += 1
        }
      }
      // a self-reference only means "recursive member" under WITH
      // RECURSIVE; elsewhere it is a shadowing table alias or column
      !(selfRef && cte.recursiveChain) && external >= 2
    }.map(_.insertAt).distinct.sorted

    if (inserts.isEmpty) sql
    else {
      val sb = new StringBuilder
      var prev = 0
      for (at <- inserts) {
        sb.append(sql.substring(prev, at)).append("MATERIALIZED ")
        prev = at
      }
      sb.append(sql.substring(prev))
      sb.toString
    }
  }
}
