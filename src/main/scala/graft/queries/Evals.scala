package graft.queries

import org.apache.spark.sql.{Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** MODEL-EVALUATION statistics — the two readouts every LLM training
  * pipeline publishes alongside its data: pass@k over per-problem attempt
  * outcomes (the unbiased estimator of Chen et al. 2021, "Evaluating
  * Large Language Models Trained on Code", eq. 1) and Bradley–Terry
  * strength ratings from pairwise preference votes (Zermelo 1929; the
  * MM iteration of Hunter 2004, "MM algorithms for generalized
  * Bradley-Terry models" — the Chatbot-Arena rating shape).
  *
  * Both are EXACT here: pass@k's estimator 1 − C(n−c,k)/C(n,k) is a
  * ratio of small integers (binomials of n ≤ 10 via the falling-factorial
  * product, which integer-divides k! exactly), summed as integers and
  * divided ONCE; the BT iteration's only non-integer step is a division
  * of identical operands folded in a FIXED order on both engines (the
  * q61 harmonic-sum discipline), so even the iterated doubles bit-agree.
  *
  * The fixtures carry no eval outcomes, so both engines apply the same
  * deterministic dose (the q239/q287 discipline): per-problem correct
  * counts and pairwise winners derived from doc_id by integer hashing —
  * skill-dependent (the win threshold shifts with the matchup) so the
  * statistics are non-degenerate.
  */
object Evals {

  /** C(m, k) as shared SQL over integer column text `m`, 0 ≤ m ≤ 12:
    * falling-factorial product / k! — the product of k consecutive
    * integers is divisible by k!, and for m < k a zero factor appears,
    * so the formula self-zeroes exactly where the binomial does.
    * `idiv`: Spark `div`, DuckDB `//`. */
  def binomSql(m: String, k: Int, idiv: String): String = {
    require(k >= 1 && k <= 12)
    val fact = (1 to k).map(_.toLong).product
    val prod = (0 until k).map(t => s"(($m) - $t)").mkString(" * ")
    s"(($prod) $idiv $fact)"
  }

  /** Driver-side twin for spec pins. */
  def binom(m: Long, k: Int): Long =
    if (m < k) 0L
    else (0 until k).map(m - _).product / (1 to k).map(_.toLong).product

  private val N = 10 // attempts per problem
  private val Ks = Seq(1, 5, 10)

  /** q303: PASS@K EVAL SCORING — each document is a "problem" with
    * n = 10 sampled attempts of which c passed (dosed:
    * c = (doc_id·13) % 11 spans 0..10); the per-source report carries
    * the unbiased pass@k estimator for k = 1/5/10, aggregated EXACTLY:
    * mean over problems of 1 − C(n−c,k)/C(n,k)
    *   = (N_probs·C(n,k) − Σ C(n−c,k)) / (N_probs·C(n,k)),
    * all-integer numerator and denominator, one IEEE division at the
    * end — no per-row float, no order-sensitive double sum. Scale: a
    * single scan with partial aggregation; the report is
    * |sources| × |ks| rows whatever the corpus size. */
  val q303 = Q(
    "q303_pass_at_k",
    (s, d) => {
      val base = Tables.load(s, d, "documents")
        .withColumn("c", expr("(doc_id * 13) % 11"))
        .withColumn("m", lit(N.toLong) - col("c"))
      val legs = Ks.map { k =>
        val cnk = binom(N.toLong, k)
        base
          .withColumn("fail_num", expr(binomSql("m", k, "div")))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_problems"),
            sum(col("c")).as("sum_correct"),
            sum(col("fail_num")).as("sum_fail"))
          .select(
            col("source"), lit(k.toLong).as("k"), col("n_problems"),
            (col("sum_correct").cast(DoubleType) / col("n_problems"))
              .as("mean_correct"),
            ((col("n_problems") * lit(cnk) - col("sum_fail"))
              .cast(DoubleType) /
              (col("n_problems") * lit(cnk)).cast(DoubleType))
              .as("pass_at_k"))
      }
      legs.reduce(_.unionAll(_)).orderBy(col("source"), col("k"))
    },
    Some {
      val legs = Ks.map { k =>
        val cnk = binom(N.toLong, k)
        s"""
        SELECT source, CAST($k AS BIGINT) AS k,
               count(*) AS n_problems,
               CAST(sum(c) AS DOUBLE) / count(*) AS mean_correct,
               CAST(count(*) * $cnk - sum(fail_num) AS DOUBLE)
                 / CAST(count(*) * $cnk AS DOUBLE) AS pass_at_k
        FROM (SELECT source, c,
                     ${binomSql(s"$N - c", k, "//")} AS fail_num
              FROM dosed) t$k
        GROUP BY source"""
      }
      s"""
      WITH dosed AS (
        SELECT source, (doc_id * 13) % 11 AS c FROM documents
      )
      ${legs.mkString(" UNION ALL ")}
      ORDER BY source, k"""
    })

  private val Models = 5
  private val Iters = 3

  /** q304: BRADLEY–TERRY PREFERENCE RATINGS — pairwise votes between 5
    * "models" (dosed: contestants a = doc_id%5, b = (doc_id div 5)%5,
    * a ≠ b; winner decided by an integer hash against a matchup-shifted
    * threshold, so stronger ids really win more) fitted with 3 rounds of
    * Hunter's MM update  p_i ← W_i / Σ_{j≠i} n_ij/(p_i + p_j)  and
    * normalized to shares. Every double is reproduced bit-exactly by
    * the oracle: each opponent sum folds a j-ORDERED list (Spark
    * `aggregate(array_sort(collect_list(struct(j, t))))` ↔ DuckDB
    * `list_reduce(list_transform(list(... ORDER BY j)))` — the fixed
    * fold-order discipline of q61), and every division sees identical
    * operands. Scale: the vote scan aggregates to ≤ models² rows in one
    * shuffle; the MM iterations run on that metadata-sized table
    * (broadcast joins), exactly how an arena leaderboard recomputes at
    * any corpus size. */
  val q304 = Q(
    "q304_bradley_terry",
    (s, d) => {
      import graft.Caches.Tracked
      val votes = Tables.load(s, d, "documents")
        .select(
          expr("doc_id % 5").as("a"),
          expr("(doc_id div 5) % 5").as("b"),
          expr("(doc_id * 2654435761L) % 97").as("u"))
        .filter(col("a") =!= col("b"))
        .withColumn("winner",
          when(col("u") < lit(48) + (col("a") - col("b")) * 8, col("a"))
            .otherwise(col("b")))
      // ordered-pair stats: one row per (i, j), i ≠ j, both directions
      val edges = votes
        .select(col("a").as("i"), col("b").as("j"),
          when(col("winner") === col("a"), 1L).otherwise(0L).as("win"))
        .unionAll(votes.select(col("b").as("i"), col("a").as("j"),
          when(col("winner") === col("b"), 1L).otherwise(0L).as("win")))
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n_ij"), sum(col("win")).as("w_ij"))
        .persistTracked()
      val totals = edges.groupBy(col("i"))
        .agg(sum(col("n_ij")).as("games"), sum(col("w_ij")).as("wins"))
        .persistTracked()
      var p = totals.select(col("i"), lit(1.0).as("p"))
      (1 to Iters).foreach { _ =>
        val denom = edges
          .join(p.select(col("i"), col("p").as("p_i")), Seq("i"))
          .join(p.select(col("i").as("j"), col("p").as("p_j")), Seq("j"))
          .withColumn("t",
            col("n_ij").cast(DoubleType) / (col("p_i") + col("p_j")))
          .groupBy(col("i"))
          .agg(expr("aggregate(array_sort(collect_list(struct(j, t))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x.t)").as("den"))
        val next = totals.join(denom, Seq("i"))
          .select(col("i"),
            (col("wins").cast(DoubleType) / col("den")).as("p"))
        // flatten the lineage per round: p is a bounded (≤ Models-row)
        // table, and re-planning 3 nested join-agg rounds in one tree
        // costs more than the data (the q59 per-round centroid-collect
        // discipline); the collected doubles re-enter as literals, so
        // the arithmetic — and the oracle equality — is unchanged
        val rows = next.collect().map(r => (r.getLong(0), r.getDouble(1)))
        import s.implicits._
        p = rows.toSeq.toDF("i", "p")
      }
      // normalize to shares with the same fixed-order fold
      val norm = p.agg(
        expr("aggregate(array_sort(collect_list(struct(i, p))), " +
          "CAST(0 AS DOUBLE), (acc, x) -> acc + x.p)").as("z"))
      p.crossJoin(broadcast(norm))
        .join(totals, Seq("i"))
        .select(col("i").as("model"), col("games"), col("wins"),
          (col("p") / col("z")).as("rating"))
        .orderBy(col("model"))
    },
    Some {
      val it = (1 to Iters).map { t =>
        s"""
        p$t AS (
          SELECT e.i,
                 w.wins / list_reduce(list_transform(
                   list(struct_pack(j := e.j,
                     t := CAST(e.n_ij AS DOUBLE) / (pi.p + pj.p))
                     ORDER BY e.j), x -> x.t), (acc, x) -> acc + x) AS p
          FROM edges e
          JOIN p${t - 1} pi ON pi.i = e.i
          JOIN p${t - 1} pj ON pj.i = e.j
          JOIN wtot w ON w.i = e.i
          GROUP BY e.i, w.wins
        )"""
      }
      s"""
      WITH votes AS (
        SELECT a, b,
               CASE WHEN u < 48 + (a - b) * 8 THEN a ELSE b END AS winner
        FROM (SELECT doc_id % 5 AS a, (doc_id // 5) % 5 AS b,
                     (doc_id * 2654435761) % 97 AS u
              FROM documents) raw
        WHERE a <> b
      ), edges AS (
        SELECT i, j, count(*) AS n_ij, CAST(sum(win) AS BIGINT) AS w_ij
        FROM (
          SELECT a AS i, b AS j,
                 CASE WHEN winner = a THEN 1 ELSE 0 END AS win FROM votes
          UNION ALL
          SELECT b AS i, a AS j,
                 CASE WHEN winner = b THEN 1 ELSE 0 END AS win FROM votes
        ) dirs
        GROUP BY i, j
      ), wtot AS (
        SELECT i, CAST(sum(n_ij) AS BIGINT) AS games,
               CAST(CAST(sum(w_ij) AS BIGINT) AS DOUBLE) AS wins,
               CAST(sum(w_ij) AS BIGINT) AS wins_i
        FROM edges GROUP BY i
      ), p0 AS (
        SELECT i, CAST(1 AS DOUBLE) AS p FROM wtot
      ), ${it.mkString(", ")}, z AS (
        SELECT list_reduce(list_transform(list(struct_pack(i := i, p := p)
                 ORDER BY i), x -> x.p), (acc, x) -> acc + x) AS z
        FROM p$Iters
      )
      SELECT w.i AS model, w.games, w.wins_i AS wins, p.p / z.z AS rating
      FROM p$Iters p
      JOIN wtot w ON w.i = p.i
      CROSS JOIN z
      ORDER BY model"""
    })

  /** q311: COHEN'S KAPPA INTER-ANNOTATOR AGREEMENT (Cohen 1960) — the
    * label-quality readout every human-annotation pipeline publishes
    * before training on the labels: observed agreement corrected for
    * the agreement two annotators would reach by chance from their own
    * marginal label distributions. Dosed: a latent class t = (doc_id·7)%3
    * and two annotators who each deviate on their own id residue
    * (A: +1 on doc_id%5=0, B: +2 on doc_id%4=0) — so agreement, both
    * marginals, and kappa are non-trivial functions of the ids. The
    * whole statistic is EXACT: with N rows, A agreements and
    * S = Σ_c a_c·b_c the marginal cross-product,
    *   κ = (p_o − p_e)/(1 − p_e) = (A·N − S)/(N² − S)
    * — integer numerator and denominator, one IEEE division (p_o and
    * p_e are emitted the same way). Computed per language, so the
    * report has grain. Scale: one scan to per-(lang,class) marginal
    * counts, then metadata-sized joins — the annotator table never
    * pairs with itself. */
  val q311 = Q(
    "q311_cohens_kappa",
    (s, d) => {
      import graft.Caches.Tracked
      val labeled = Tables.load(s, d, "documents")
        .select(
          col("lang"),
          expr("(doc_id * 7) % 3").as("t"),
          expr("CASE WHEN doc_id % 5 = 0 THEN ((doc_id * 7) % 3 + 1) % 3 " +
            "ELSE (doc_id * 7) % 3 END").as("a"),
          expr("CASE WHEN doc_id % 4 = 0 THEN ((doc_id * 7) % 3 + 2) % 3 " +
            "ELSE (doc_id * 7) % 3 END").as("b"))
        .persistTracked()
      val base = labeled.groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"))
      base.join(
        labeled.groupBy(col("lang"), col("a")).agg(count(lit(1)).as("na"))
          .join(
            labeled.groupBy(col("lang").as("lang2"), col("b"))
              .agg(count(lit(1)).as("nb")),
            col("lang") === col("lang2") && col("a") === col("b"))
          .groupBy(col("lang"))
          .agg(sum(col("na") * col("nb")).as("s_marg")),
        Seq("lang"))
        .select(
          col("lang"), col("n"), col("n_agree"), col("s_marg"),
          (col("n_agree").cast(DoubleType) / col("n").cast(DoubleType))
            .as("p_o"),
          (col("s_marg").cast(DoubleType) /
            (col("n") * col("n")).cast(DoubleType)).as("p_e"),
          ((col("n_agree") * col("n") - col("s_marg")).cast(DoubleType) /
            (col("n") * col("n") - col("s_marg")).cast(DoubleType))
            .as("kappa"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH labeled AS (
        SELECT lang, (doc_id * 7) % 3 AS t,
               CASE WHEN doc_id % 5 = 0 THEN ((doc_id * 7) % 3 + 1) % 3
                    ELSE (doc_id * 7) % 3 END AS a,
               CASE WHEN doc_id % 4 = 0 THEN ((doc_id * 7) % 3 + 2) % 3
                    ELSE (doc_id * 7) % 3 END AS b
        FROM documents
      ), base AS (
        SELECT lang, count(*) AS n,
               CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_agree
        FROM labeled GROUP BY lang
      ), ma AS (
        SELECT lang, a AS c, count(*) AS na FROM labeled GROUP BY 1, 2
      ), mb AS (
        SELECT lang, b AS c, count(*) AS nb FROM labeled GROUP BY 1, 2
      ), marg AS (
        SELECT ma.lang, CAST(sum(ma.na * mb.nb) AS BIGINT) AS s_marg
        FROM ma JOIN mb ON ma.lang = mb.lang AND ma.c = mb.c
        GROUP BY ma.lang
      )
      SELECT b.lang, b.n, b.n_agree, m.s_marg,
             CAST(b.n_agree AS DOUBLE) / CAST(b.n AS DOUBLE) AS p_o,
             CAST(m.s_marg AS DOUBLE) / CAST(b.n * b.n AS DOUBLE) AS p_e,
             CAST(b.n_agree * b.n - m.s_marg AS DOUBLE)
               / CAST(b.n * b.n - m.s_marg AS DOUBLE) AS kappa
      FROM base b JOIN marg m ON b.lang = m.lang
      ORDER BY b.lang"""))

  /** Per-class F1 as shared SQL: 2·tp/(2·tp + fp + fn), zero when the
    * class never occurs on either side (sklearn's zero_division=0).
    * The tp/fp/fn counts are CASE-sums over (truth `t`, prediction `p`)
    * generated from one Scala loop so Spark and DuckDB stay in sync. */
  def f1Sql(c: Int): String = {
    val tp = s"sum(CASE WHEN t = $c AND p = $c THEN 1 ELSE 0 END)"
    val fp = s"sum(CASE WHEN p = $c AND t <> $c THEN 1 ELSE 0 END)"
    val fn = s"sum(CASE WHEN t = $c AND p <> $c THEN 1 ELSE 0 END)"
    s"(CASE WHEN 2 * $tp + $fp + $fn = 0 THEN CAST(0 AS DOUBLE) " +
      s"ELSE CAST(2 * $tp AS DOUBLE) " +
      s"/ CAST(2 * $tp + $fp + $fn AS DOUBLE) END)"
  }

  /** q316: MULTI-CLASS F1 REPORT (micro + macro) — the classifier
    * scorecard every labeling/filtering model ships with. Dosed truth
    * t = (doc_id·7)%3 and a predictor that confuses class t for t+2 on
    * id%7=0 and t+1 on id%4=0 (so the confusion matrix is asymmetric
    * and every off-diagonal is exercised). All exact: per-class F1 is
    * one division of integer counts; micro-F1 = 2ΣTP/(2ΣTP+ΣFP+ΣFN)
    * likewise; macro-F1 averages the three per-class F1 doubles in
    * FIXED textual order ((f1₀+f1₁)+f1₂)/3 — left-associated the same
    * way in both engines, so even the averaged doubles bit-agree. In a
    * multiclass single-label setting ΣFP = ΣFN = N − ΣTP, so micro-F1
    * equals accuracy — the spec pins that identity as a cross-check.
    * Scale: one scan to per-language CASE-sums; the report is
    * |langs| rows. */
  val q316 = Q(
    "q316_f1_report",
    (s, d) => {
      val labeled = Tables.load(s, d, "documents")
        .select(
          col("lang"),
          expr("(doc_id * 7) % 3").as("t"),
          expr("CASE WHEN doc_id % 7 = 0 THEN ((doc_id * 7) % 3 + 2) % 3 " +
            "WHEN doc_id % 4 = 0 THEN ((doc_id * 7) % 3 + 1) % 3 " +
            "ELSE (doc_id * 7) % 3 END").as("p"))
      val tpAll = "sum(CASE WHEN t = p THEN 1 ELSE 0 END)"
      labeled
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n"),
          expr(s"CAST($tpAll AS BIGINT)").as("n_correct"),
          expr(s"CAST(2 * $tpAll AS DOUBLE) / " +
            s"CAST(2 * $tpAll + (count(*) - $tpAll) + (count(*) - $tpAll)" +
            s" AS DOUBLE)").as("micro_f1"),
          expr(s"((${f1Sql(0)} + ${f1Sql(1)}) + ${f1Sql(2)}) " +
            "/ CAST(3 AS DOUBLE)").as("macro_f1"))
        .orderBy(col("lang"))
    },
    Some(s"""
      WITH labeled AS (
        SELECT lang, (doc_id * 7) % 3 AS t,
               CASE WHEN doc_id % 7 = 0 THEN ((doc_id * 7) % 3 + 2) % 3
                    WHEN doc_id % 4 = 0 THEN ((doc_id * 7) % 3 + 1) % 3
                    ELSE (doc_id * 7) % 3 END AS p
        FROM documents
      )
      SELECT lang, count(*) AS n,
             CAST(sum(CASE WHEN t = p THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
             CAST(2 * sum(CASE WHEN t = p THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(2 * sum(CASE WHEN t = p THEN 1 ELSE 0 END)
                      + (count(*) - sum(CASE WHEN t = p THEN 1 ELSE 0 END))
                      + (count(*) - sum(CASE WHEN t = p THEN 1 ELSE 0 END))
                      AS DOUBLE) AS micro_f1,
             ((${f1Sql(0)} + ${f1Sql(1)}) + ${f1Sql(2)})
               / CAST(3 AS DOUBLE) AS macro_f1
      FROM labeled
      GROUP BY lang
      ORDER BY lang"""))

  /** q319: CHAT-FORMAT LINT — the structural validation SFT/RLHF data
    * runs before a single token is trained on: conversations must start
    * with a user turn, alternate user/assistant strictly, end on an
    * assistant turn, and carry no empty contents. Dosed: 4-TURN
    * conversations (conv = doc_id div 4 — the turn count must be EVEN,
    * or "starts user + alternates + ends assistant" is unsatisfiable
    * and the clean count is structurally zero; found by the spec's
    * every-rule-fires gate), correct alternation except
    * where (doc_id·3)%11 = 0 flips the role, and empty content where
    * doc_id%13 = 0 — every check fires on a known, disjoint-enough
    * subset. Alternation is a LAG over (conv ORDER BY turn); everything
    * else is per-turn CASE — one shuffle by conversation, the lint
    * output is a one-row scorecard (violating-conversation counts per
    * rule + the clean count, which must partition). */
  val q319 = Q(
    "q319_chat_lint",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val turns = Tables.load(s, d, "documents")
        .select(
          expr("doc_id div 4").as("conv"),
          expr("doc_id % 4").as("turn"),
          expr("CASE WHEN (doc_id * 3) % 11 = 0 " +
            "THEN CASE WHEN doc_id % 2 = 0 THEN 'assistant' " +
            "ELSE 'user' END " +
            "ELSE CASE WHEN doc_id % 2 = 0 THEN 'user' " +
            "ELSE 'assistant' END END").as("role"),
          expr("CASE WHEN doc_id % 13 = 0 THEN '' ELSE text END")
            .as("content"))
      val w = Window.partitionBy(col("conv")).orderBy(col("turn"))
      val perConv = turns
        .withColumn("prev_role", lag(col("role"), 1).over(w))
        .groupBy(col("conv"))
        .agg(
          // min_by/max_by on turn: the FIRST and LAST rows actually
          // present are checked, so a conversation with gapped or
          // non-contiguous turn numbers is still linted instead of
          // silently passing (r7 advice item #3 — hardcoded turn=0/3
          // never fired on a conv missing those rows)
          when(expr("min_by(role, turn)") =!= "user", 1L)
            .otherwise(0L).as("bad_start"),
          when(expr("max_by(role, turn)") =!= "assistant", 1L)
            .otherwise(0L).as("bad_end"),
          sum(when(col("prev_role") === col("role"), 1L).otherwise(0L))
            .as("n_nonalt"),
          sum(when(col("content") === "", 1L).otherwise(0L))
            .as("n_empty"))
      perConv.agg(
        count(lit(1)).as("n_convs"),
        sum(col("bad_start")).as("n_bad_start"),
        sum(col("bad_end")).as("n_bad_end"),
        sum(when(col("n_nonalt") > 0, 1L).otherwise(0L))
          .as("n_nonalternating"),
        sum(when(col("n_empty") > 0, 1L).otherwise(0L))
          .as("n_with_empty"),
        sum(when(col("bad_start") === 0 && col("bad_end") === 0 &&
          col("n_nonalt") === 0 && col("n_empty") === 0, 1L)
          .otherwise(0L)).as("n_clean"))
    },
    Some("""
      WITH turns AS (
        SELECT doc_id // 4 AS conv, doc_id % 4 AS turn,
               CASE WHEN (doc_id * 3) % 11 = 0
                    THEN CASE WHEN doc_id % 2 = 0 THEN 'assistant'
                         ELSE 'user' END
                    ELSE CASE WHEN doc_id % 2 = 0 THEN 'user'
                         ELSE 'assistant' END END AS role,
               CASE WHEN doc_id % 13 = 0 THEN '' ELSE text END AS content
        FROM documents
      ), flagged AS (
        SELECT conv, turn, role, content,
               lag(role) OVER (PARTITION BY conv ORDER BY turn)
                 AS prev_role
        FROM turns
      ), per_conv AS (
        SELECT conv,
               CASE WHEN min_by(role, turn) <> 'user' THEN 1 ELSE 0 END
                 AS bad_start,
               CASE WHEN max_by(role, turn) <> 'assistant'
                    THEN 1 ELSE 0 END AS bad_end,
               sum(CASE WHEN prev_role = role THEN 1 ELSE 0 END)
                 AS n_nonalt,
               sum(CASE WHEN content = '' THEN 1 ELSE 0 END) AS n_empty
        FROM flagged
        GROUP BY conv
      )
      SELECT count(*) AS n_convs,
             CAST(sum(bad_start) AS BIGINT) AS n_bad_start,
             CAST(sum(bad_end) AS BIGINT) AS n_bad_end,
             CAST(sum(CASE WHEN n_nonalt > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nonalternating,
             CAST(sum(CASE WHEN n_empty > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_with_empty,
             CAST(sum(CASE WHEN bad_start = 0 AND bad_end = 0
                            AND n_nonalt = 0 AND n_empty = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
      FROM per_conv"""))

  /** q320: PREFERENCE LENGTH-BIAS AUDIT — the reward-hacking check run
    * on every RLHF/preference dataset: does the LONGER response win
    * more often than chance? Dosed pairwise votes where the winner
    * depends on both a skill gap AND an injected length term
    * ((len_a − len_b) div 50 shifts the win threshold), so the audit
    * MUST find bias — and its exact size is deterministic. Readout per
    * length-gap bucket (|Δlen| div 100): vote count, longer-side wins,
    * and the win rate in ONE division — a monotone-increasing win rate
    * across buckets is the smoking gun a clean dataset wouldn't show.
    * Scale: single scan, integer arithmetic, |buckets| output rows. */
  val q320 = Q(
    "q320_length_bias",
    (s, d) => {
      Tables.load(s, d, "documents")
        .select(
          expr("doc_id % 5").as("a"),
          expr("(doc_id div 5) % 5").as("b"),
          expr("(doc_id * 2654435761L) % 97").as("u"),
          expr("100 + (doc_id * 31) % 400").as("len_a"),
          expr("100 + (doc_id * 53) % 400").as("len_b"))
        .filter(col("a") =!= col("b") && col("len_a") =!= col("len_b"))
        // +20000 (a multiple of 50) keeps the dividend positive: Spark
        // `div` truncates toward zero, DuckDB `//` floors — they only
        // agree on non-negative operands (the q263 invariant)
        .withColumn("a_wins",
          col("u") < lit(48) + (col("a") - col("b")) * 8 +
            expr("(len_a - len_b + 20000) div 50 - 400"))
        .withColumn("longer_wins",
          (col("a_wins") && col("len_a") > col("len_b")) ||
            (!col("a_wins") && col("len_b") > col("len_a")))
        .groupBy(expr("abs(len_a - len_b) div 100").as("gap_bucket"))
        .agg(
          count(lit(1)).as("n_votes"),
          sum(when(col("longer_wins"), 1L).otherwise(0L))
            .as("n_longer_wins"))
        .withColumn("longer_win_rate",
          col("n_longer_wins").cast(DoubleType) /
            col("n_votes").cast(DoubleType))
        .orderBy(col("gap_bucket"))
    },
    Some("""
      WITH votes AS (
        SELECT doc_id % 5 AS a, (doc_id // 5) % 5 AS b,
               (doc_id * 2654435761) % 97 AS u,
               100 + (doc_id * 31) % 400 AS len_a,
               100 + (doc_id * 53) % 400 AS len_b
        FROM documents
      ), judged AS (
        SELECT *,
               u < 48 + (a - b) * 8 + (len_a - len_b + 20000) // 50 - 400
                 AS a_wins
        FROM votes
        WHERE a <> b AND len_a <> len_b
      )
      SELECT abs(len_a - len_b) // 100 AS gap_bucket,
             count(*) AS n_votes,
             CAST(sum(CASE WHEN (a_wins AND len_a > len_b)
                             OR (NOT a_wins AND len_b > len_a)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_longer_wins,
             CAST(sum(CASE WHEN (a_wins AND len_a > len_b)
                             OR (NOT a_wins AND len_b > len_a)
                       THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS longer_win_rate
      FROM judged
      GROUP BY 1
      ORDER BY gap_bucket"""))

  /** q326: TWO-SAMPLE KOLMOGOROV–SMIRNOV TEST — the distribution-drift
    * detector every data pipeline runs between corpus versions, feature
    * snapshots, or A/B arms (Kolmogorov 1933 / Smirnov 1939; the
    * `scipy.stats.ks_2samp` readout): D = sup|F_A − F_B| between the
    * order-value distributions of finished ('F') and open ('O') orders,
    * with the large-sample 5% rejection bound c(0.05)=1.358 ·
    * √((n_a+n_b)/(n_a·n_b)). EXACT discipline: values are integer cents,
    * per-value counts aggregate first, and the two cumulative counts ride
    * ONE GlobalOrder range-partitioned cumsum pass each (never a
    * corpus-sized single-task window); every per-row double (cum/n) is
    * computed from identical integer operands with an identical op order
    * in both engines, so the sup — a pure selection — is bit-identical.
    * Scale: two scans (per-value rollup + totals), two range shuffles of
    * the VALUE-level rollup (≤ |distinct prices| rows), one max. */
  val q326 = Q(
    "q326_ks_test",
    (s, d) => {
      val o = Tables.load(s, d, "orders")
        .filter(col("o_orderstatus").isin("F", "O"))
        .select(col("o_orderstatus").as("st"),
          Det.cents(col("o_totalprice")).as("v"))
      val counts = o.groupBy(col("v")).agg(
        sum(when(col("st") === "F", 1L).otherwise(0L)).as("ca"),
        sum(when(col("st") === "O", 1L).otherwise(0L)).as("cb"))
      val cum = graft.operators.GlobalOrder.withOrderedCumsums(
        counts, Seq(col("v")),
        Seq(col("ca") -> "cuma", col("cb") -> "cumb"))
      val tot = o.agg(
        sum(when(col("st") === "F", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("st") === "O", 1L).otherwise(0L)).as("n_b"))
      cum.crossJoin(broadcast(tot))
        .select(col("n_a"), col("n_b"),
          abs(col("cuma").cast(DoubleType) / col("n_a").cast(DoubleType)
            - col("cumb").cast(DoubleType) / col("n_b").cast(DoubleType))
            .as("diff"))
        .groupBy(col("n_a"), col("n_b"))
        .agg(max(col("diff")).as("d_stat"))
        .withColumn("d_crit",
          lit(1.358) * sqrt(
            (col("n_a") + col("n_b")).cast(DoubleType) /
              (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType))))
        .select(col("n_a"), col("n_b"), col("d_stat"), col("d_crit"),
          (col("d_stat") > col("d_crit")).as("reject_05"))
    },
    Some(s"""
      WITH o AS (
        SELECT o_orderstatus AS st, ${Det.centsSql("o_totalprice")} AS v
        FROM orders WHERE o_orderstatus IN ('F', 'O')
      ), counts AS (
        SELECT v,
               CAST(sum(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT)
                 AS ca,
               CAST(sum(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS BIGINT)
                 AS cb
        FROM o GROUP BY v
      ), cum AS (
        SELECT v,
               CAST(sum(ca) OVER w AS BIGINT) AS cuma,
               CAST(sum(cb) OVER w AS BIGINT) AS cumb
        FROM counts
        WINDOW w AS (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ), tot AS (
        SELECT CAST(sum(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_a,
               CAST(sum(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_b
        FROM o
      ), stat AS (
        SELECT n_a, n_b,
               max(abs(CAST(cuma AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - CAST(cumb AS DOUBLE) / CAST(n_b AS DOUBLE))) AS d_stat
        FROM cum, tot GROUP BY n_a, n_b
      )
      SELECT n_a, n_b, d_stat,
             1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS d_crit,
             d_stat > 1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS reject_05
      FROM stat"""))

  /** q327: SPLIT-CONFORMAL CALIBRATION — the distribution-free
    * prediction-interval recipe (Vovk et al. 2005; Angelopoulos &
    * Bates 2021 tutorial form): on a held-out calibration split, take
    * the ⌈(n+1)(1−α)⌉-th smallest nonconformity score as the threshold;
    * the marginal coverage guarantee P(s ≤ q̂) ≥ 1−α then holds on
    * exchangeable test points. Dosed deterministic scores (Knuth-hash
    * of doc_id mod 100000 — exact integers, both engines), even doc_ids
    * calibrate, odd doc_ids test, α = 0.1. The order statistic is read
    * off a VALUE-bucketed cumulative count (q119 discipline, GlobalOrder
    * range-partitioned — never a corpus-sized sort): threshold = min
    * score value whose cumulative calibration count ≥ k. Output: split
    * sizes, k, the exact integer threshold, and realized test coverage
    * (one division) — which the guarantee says must be ≥ 0.9 up to
    * discreteness. Scale: score domain is bounded (10⁵), so the cumsum
    * frame is domain-sized regardless of corpus size. */
  val q327 = Q(
    "q327_conformal_calibration",
    (s, d) => {
      val scored = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          expr("(doc_id * 2654435761L) % 100000").as("score"),
          (col("doc_id") % 2 === 0).as("is_cal"))
      val calCounts = scored.filter(col("is_cal"))
        .groupBy(col("score")).agg(count(lit(1)).as("c"))
      val cum = graft.operators.GlobalOrder.withOrderedCumsum(
        calCounts, Seq(col("score")), col("c"), "cumc")
      val nCal = scored.filter(col("is_cal"))
        .agg(count(lit(1)).as("n_cal"))
      // k = ceil((n_cal + 1) * (1 - alpha)) with alpha = 0.1, in exact
      // integers: ceil(9x/10) = (9x + 9) div 10 for non-negative x
      val thr = cum.crossJoin(broadcast(nCal))
        .withColumn("k", expr("(9 * (n_cal + 1) + 9) div 10"))
        .filter(col("cumc") >= col("k"))
        .groupBy(col("n_cal"), col("k"))
        .agg(min(col("score")).as("threshold"))
      Tables.load(s, d, "documents")
        .filter(col("doc_id") % 2 =!= 0)
        .select(expr("(doc_id * 2654435761L) % 100000").as("score"))
        .crossJoin(broadcast(thr))
        .groupBy(col("n_cal"), col("k"), col("threshold"))
        .agg(
          count(lit(1)).as("n_test"),
          sum(when(col("score") <= col("threshold"), 1L).otherwise(0L))
            .as("n_covered"))
        .withColumn("coverage",
          col("n_covered").cast(DoubleType) /
            col("n_test").cast(DoubleType))
        .select(col("n_cal"), col("n_test"), col("k"), col("threshold"),
          col("n_covered"), col("coverage"))
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, (doc_id * 2654435761) % 100000 AS score,
               doc_id % 2 = 0 AS is_cal
        FROM documents
      ), cum AS (
        SELECT score,
               CAST(sum(count(*)) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cumc
        FROM scored WHERE is_cal GROUP BY score
      ), nc AS (
        SELECT count(*) AS n_cal,
               (9 * (count(*) + 1) + 9) // 10 AS k
        FROM scored WHERE is_cal
      ), thr AS (
        SELECT n_cal, k, min(score) AS threshold
        FROM cum, nc WHERE cumc >= k GROUP BY n_cal, k
      )
      SELECT n_cal, count(*) AS n_test, k, threshold,
             CAST(sum(CASE WHEN score <= threshold THEN 1 ELSE 0 END)
               AS BIGINT) AS n_covered,
             CAST(sum(CASE WHEN score <= threshold THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE) AS coverage
      FROM scored, thr WHERE NOT is_cal
      GROUP BY n_cal, k, threshold"""))

  /** 24-bit uniform from the first 6 md5 hex nibbles — ONE generator
    * whose text runs VERBATIM in Spark SQL and DuckDB (instr/substr/md5
    * agree; the r6 shared-fragment rule). Used by the q336 Poisson
    * bootstrap; non-negative by construction. */
  def hex24Sql(e: String): String =
    (1 to 6).map { i =>
      val scale = 1L << (4 * (6 - i))
      s"(CAST(instr('0123456789abcdef', substr(md5($e), $i, 1))" +
        s" AS BIGINT) - 1) * $scale"
    }.mkString("(", " + ", ")")

  /** Truncated-Poisson(1) inverse-CDF thresholds on the 24-bit hash
    * domain (floor(cum·2²⁴) for k = 0..4; weight 5 for the 0.06% tail
    * beyond — the truncation every bounded-weight bootstrap documents).
    * INTEGER literals, so both engines draw identical weights. */
  val poissonThresholds: Seq[Long] =
    Seq(6171992L, 12343985L, 15429982L, 16458647L, 16715813L)

  /** The weight draw as shared SQL text (Spark and DuckDB run it
    * verbatim): truncated-Poisson(1) CDF inversion of the 24-bit `u`. */
  val poissonWSql: String = {
    val t = poissonThresholds
    s"CASE WHEN u < ${t(0)} THEN 0 WHEN u < ${t(1)} THEN 1 " +
      s"WHEN u < ${t(2)} THEN 2 WHEN u < ${t(3)} THEN 3 " +
      s"WHEN u < ${t(4)} THEN 4 ELSE 5 END"
  }

  /** q336: POISSON HASH BOOTSTRAP — the distributed bootstrap
    * (Chamandy et al. 2012, "Estimating uncertainty for massive data
    * streams"; the resampling scheme that works in ONE pass because
    * each row draws its per-resample multiplicity independently —
    * Poisson(1) approximates multinomial resampling without
    * coordinating a fixed total): B = 80 deterministic resamples of the
    * order-value mean, weights drawn by inverting the Poisson CDF on a
    * 24-bit md5(orderkey:b) hash with INTEGER thresholds, so both
    * engines produce bit-identical resamples with no RNG anywhere.
    * Each resample mean is Σw·x / Σw — two exact BIGINT sums, one
    * division; the 95% percentile interval reads order statistics
    * 2 and 78 off the 80 sorted means (⌈B·0.025⌉ / ⌈B·0.975⌉).
    * Scale: one corpus scan fanned ×B (B bounded), a B-row rollup, a
    * B-row sort — the bootstrap cost is B scans' worth of hashing,
    * never a shuffle of resampled DATA. */
  val q336 = Q(
    "q336_hash_bootstrap",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val fanned = Tables.load(s, d, "orders")
        .select(col("o_orderkey"),
          Det.cents(col("o_totalprice")).as("cents"))
        .withColumn("b", explode(expr("sequence(0, 79)")))
        .withColumn("u",
          expr(hex24Sql("concat(o_orderkey, ':', b)")))
        .withColumn("w", expr(poissonWSql).cast(LongType))
      val means = fanned.groupBy(col("b"))
        .agg((sum(col("w") * col("cents")).cast(DoubleType) /
          sum(col("w")).cast(DoubleType)).as("mean_c"))
        .withColumn("r", row_number().over(
          Window.orderBy(col("mean_c"), col("b"))))
      val tot = Tables.load(s, d, "orders")
        .agg(count(lit(1)).as("n"),
          (sum(Det.cents(col("o_totalprice"))).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("point_mean_c"))
      means
        .groupBy(lit(80L).as("n_resamples"))
        .agg(
          min(when(col("r") === 2, col("mean_c"))).as("ci_lo_c"),
          min(when(col("r") === 78, col("mean_c"))).as("ci_hi_c"))
        .crossJoin(broadcast(tot))
        .select(col("n"), col("n_resamples"), col("point_mean_c"),
          col("ci_lo_c"), col("ci_hi_c"))
    },
    Some {
      s"""
      WITH fanned AS (
        SELECT o_orderkey, ${Det.centsSql("o_totalprice")} AS cents,
               unnest(range(0, 80)) AS b
        FROM orders
      ), weighted AS (
        SELECT b, cents, $poissonWSql AS w
        FROM (SELECT *,
                ${hex24Sql("concat(o_orderkey, ':', b)")} AS u
              FROM fanned)
      ), means AS (
        SELECT b,
               CAST(sum(w * cents) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
                 AS mean_c,
               row_number() OVER (ORDER BY CAST(sum(w * cents) AS DOUBLE)
                 / CAST(sum(w) AS DOUBLE), b) AS r
        FROM weighted GROUP BY b
      ), tot AS (
        SELECT count(*) AS n,
               CAST(sum(${Det.centsSql("o_totalprice")}) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS point_mean_c
        FROM orders
      )
      SELECT n, CAST(80 AS BIGINT) AS n_resamples, point_mean_c,
             min(CASE WHEN r = 2 THEN mean_c END) AS ci_lo_c,
             min(CASE WHEN r = 78 THEN mean_c END) AS ci_hi_c
      FROM means, tot
      GROUP BY n, point_mean_c"""
    })

  /** q338: RELIABILITY DIAGRAM + BRIER DECOMPOSITION — the calibration
    * audit every model-scored dataset ships (DeGroot & Fienberg 1983;
    * the modern "calibration curve"): bucket predictions by decile,
    * compare mean predicted probability to the empirical rate, and
    * carry each bucket's Brier contribution. Dosed
    * calibrated-by-construction outcomes (y = [hash₂ < p] — so the
    * curve must hug the diagonal up to hash noise, a self-checking
    * dose). Probabilities are integer PERMILLE: mean_pred =
    * Σp/(1000·n), emp_rate = Σy/n, brier = Σ(p − 1000y)²/(10⁶·n) —
    * exact integer numerators, ONE division each. Scale: stateless
    * map + a 10-row rollup. */
  val q338 = Q(
    "q338_reliability_diagram",
    (s, d) => {
      Tables.load(s, d, "documents")
        .select(
          expr("(doc_id * 2654435761L) % 1000").as("p"),
          expr("CASE WHEN (doc_id * 40503L) % 1000 " +
            "< (doc_id * 2654435761L) % 1000 THEN 1L ELSE 0L END")
            .as("y"))
        .groupBy(expr("p div 100").as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          (sum(col("p")).cast(DoubleType) /
            (count(lit(1)) * lit(1000L)).cast(DoubleType))
            .as("mean_pred"),
          (sum(col("y")).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("emp_rate"),
          (sum((col("p") - lit(1000L) * col("y")) *
            (col("p") - lit(1000L) * col("y"))).cast(DoubleType) /
            (count(lit(1)) * lit(1000000L)).cast(DoubleType))
            .as("brier"))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH scored AS (
        SELECT (doc_id * 2654435761) % 1000 AS p,
               CASE WHEN (doc_id * 40503) % 1000
                 < (doc_id * 2654435761) % 1000 THEN 1 ELSE 0 END AS y
        FROM documents
      )
      SELECT p // 100 AS bucket, count(*) AS n,
             CAST(sum(p) AS DOUBLE) / CAST(count(*) * 1000 AS DOUBLE)
               AS mean_pred,
             CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS emp_rate,
             CAST(sum((p - 1000 * y) * (p - 1000 * y)) AS DOUBLE)
               / CAST(count(*) * 1000000 AS DOUBLE) AS brier
      FROM scored
      GROUP BY 1
      ORDER BY bucket"""))

  /** q340: 1-D WASSERSTEIN (EARTH MOVER'S) DISTANCE — the drift metric
    * that, unlike q326's KS sup, weighs HOW FAR the mass moved
    * (Vaserstein 1969; `scipy.stats.wasserstein_distance`): in one
    * dimension W₁ = ∫|F_A − F_B| dx, which over integer-cents values is
    * the EXACT sum Σᵢ |cumAᵢ₋₁·n_b − cumBᵢ₋₁·n_a| · (vᵢ − vᵢ₋₁)
    * divided ONCE by n_a·n_b. The cumulative counts ride GlobalOrder's
    * range-partitioned cumsum; the previous value and previous cums come
    * from [[graft.operators.GlobalOrder.withOrderedLag]] (global LAG(1)
    * in the same range-partitioned shape — never a single-task window);
    * per-term products and the total accumulate in
    * DECIMAL(38,0)/HUGEINT. Scale: the frame everything runs on is the
    * distinct-value rollup, and every pass over it is range-partitioned. */
  val q340 = Q(
    "q340_wasserstein_1d",
    (s, d) => {
      import graft.operators.GlobalOrder
      val o = Tables.load(s, d, "orders")
        .filter(col("o_orderstatus").isin("F", "O"))
        .select(col("o_orderstatus").as("st"),
          Det.cents(col("o_totalprice")).as("v"))
      val counts = o.groupBy(col("v")).agg(
        sum(when(col("st") === "F", 1L).otherwise(0L)).as("ca"),
        sum(when(col("st") === "O", 1L).otherwise(0L)).as("cb"))
      val ord = Seq(col("v"))
      val cum = GlobalOrder.withOrderedLags(
        GlobalOrder.withOrderedCumsums(counts, ord,
          Seq(col("ca") -> "cuma", col("cb") -> "cumb")),
        ord,
        Seq(col("v") -> "prev_v", col("cuma") -> "prev_a",
          col("cumb") -> "prev_b"))
      val tot = o.agg(
        sum(when(col("st") === "F", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("st") === "O", 1L).otherwise(0L)).as("n_b"))
      cum.crossJoin(broadcast(tot))
        .filter(col("prev_v").isNotNull)
        .select(col("n_a"), col("n_b"),
          (abs(col("prev_a") * col("n_b") - col("prev_b") * col("n_a"))
            .cast(DecimalType(38, 0)) *
            (col("v") - col("prev_v")).cast(DecimalType(38, 0)))
            .as("term"))
        .groupBy(col("n_a"), col("n_b"))
        .agg(sum(col("term")).as("mass"))
        .select(col("n_a"), col("n_b"),
          (col("mass").cast(DoubleType) /
            (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)))
            .as("w1_cents"))
    },
    Some(s"""
      WITH o AS (
        SELECT o_orderstatus AS st, ${Det.centsSql("o_totalprice")} AS v
        FROM orders WHERE o_orderstatus IN ('F', 'O')
      ), counts AS (
        SELECT v,
               CAST(sum(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT)
                 AS ca,
               CAST(sum(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS BIGINT)
                 AS cb
        FROM o GROUP BY v
      ), cumbase AS (
        SELECT v,
               CAST(sum(ca) OVER w AS BIGINT) AS cuma,
               CAST(sum(cb) OVER w AS BIGINT) AS cumb
        FROM counts
        WINDOW w AS (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ), cum AS (
        SELECT v, cuma, cumb,
               lag(v) OVER (ORDER BY v) AS prev_v,
               lag(cuma) OVER (ORDER BY v) AS prev_a,
               lag(cumb) OVER (ORDER BY v) AS prev_b
        FROM cumbase
      ), tot AS (
        SELECT CAST(sum(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_a,
               CAST(sum(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_b
        FROM o
      )
      SELECT n_a, n_b,
             ${Det.hugeDoubleSql(
               """sum(CAST(abs(prev_a * n_b - prev_b * n_a) AS HUGEINT)
                      * (v - prev_v))""")}
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS w1_cents
      FROM cum, tot
      WHERE prev_v IS NOT NULL
      GROUP BY n_a, n_b"""))

  /** q342: POST-STRATIFIED / IPW TREATMENT-EFFECT ESTIMATION (Horvitz &
    * Thompson 1952; the Neyman-Rubin workhorse for observational A/B
    * reads): when treatment assignment CORRELATES with a stratum-level
    * baseline, the naive treated-minus-control difference is
    * confounded; weighting each stratum's arm means by the stratum's
    * share (equivalently IPW with propensities estimated per stratum)
    * removes the bias. Dosed with confounding BY CONSTRUCTION: stratum
    * index s ∈ 0..4 from lang (verbatim CASE in both engines),
    * propensity threshold 20+15s AND outcome baseline 10s rise
    * together, true effect 7 — so the naive estimate must land above 7
    * and the stratified one near it (the spec's gate). Exact: arm sums
    * and counts are integers; each arm mean is ONE division; the
    * stratified total folds the 5 per-stratum terms in sorted-lang
    * order. Output: one row per stratum plus an ALL row whose
    * mean_t/mean_c are the NAIVE pooled means and whose `diff` column
    * carries the STRATIFIED estimate. Scale: one scan, |strata|-row
    * arithmetic. */
  val q342 = Q(
    "q342_ipw_ate",
    (s, d) => {
      val caseIdx = "CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 " +
        "WHEN 'es' THEN 2 WHEN 'fr' THEN 3 ELSE 4 END"
      val dosed = Tables.load(s, d, "documents")
        .select(col("lang"), expr(s"$caseIdx").as("sidx"),
          col("doc_id"))
        .withColumn("t",
          expr("(doc_id * 7919) % 100") < lit(20) + lit(15) * col("sidx"))
        .withColumn("y",
          expr("(doc_id * 31) % 50") + lit(10) * col("sidx") +
            when(col("t"), 7L).otherwise(0L))
      val strata = dosed.groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("t"), 1L).otherwise(0L)).as("n_t"),
          sum(when(col("t"), col("y")).otherwise(0L)).as("sy_t"),
          sum(when(!col("t"), col("y")).otherwise(0L)).as("sy_c"))
        .withColumn("e_hat",
          col("n_t").cast(DoubleType) / col("n").cast(DoubleType))
        .withColumn("mean_t",
          col("sy_t").cast(DoubleType) / col("n_t").cast(DoubleType))
        .withColumn("mean_c", col("sy_c").cast(DoubleType) /
          (col("n") - col("n_t")).cast(DoubleType))
        .withColumn("diff", col("mean_t") - col("mean_c"))
      val overall = strata
        .agg(
          sum(col("n")).as("n"),
          sum(col("n_t")).as("n_t"),
          sum(col("sy_t")).as("sy_t"),
          sum(col("sy_c")).as("sy_c"),
          // stratified ATE: Σ (n_s/N)·diff_s folded in sorted-lang order
          expr("aggregate(transform(array_sort(" +
            "collect_list(struct(lang, n, diff))), " +
            "p -> CAST(p.n AS DOUBLE) * p.diff), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x)").as("wsum"))
        .select(lit("ALL").as("lang"), col("n"), col("n_t"),
          (col("n_t").cast(DoubleType) / col("n").cast(DoubleType))
            .as("e_hat"),
          (col("sy_t").cast(DoubleType) / col("n_t").cast(DoubleType))
            .as("mean_t"),
          (col("sy_c").cast(DoubleType) /
            (col("n") - col("n_t")).cast(DoubleType)).as("mean_c"),
          (col("wsum") / col("n").cast(DoubleType)).as("diff"))
      strata
        .select(col("lang"), col("n"), col("n_t"), col("e_hat"),
          col("mean_t"), col("mean_c"), col("diff"))
        .unionAll(overall)
        .orderBy(col("lang"))
    },
    Some("""
      WITH dosed AS (
        SELECT lang,
               CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1
                 WHEN 'es' THEN 2 WHEN 'fr' THEN 3 ELSE 4 END AS sidx,
               (doc_id * 7919) % 100
                 < 20 + 15 * (CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1
                   WHEN 'es' THEN 2 WHEN 'fr' THEN 3 ELSE 4 END) AS t,
               (doc_id * 31) % 50
                 + 10 * (CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1
                   WHEN 'es' THEN 2 WHEN 'fr' THEN 3 ELSE 4 END)
                 + CASE WHEN (doc_id * 7919) % 100
                     < 20 + 15 * (CASE lang WHEN 'de' THEN 0
                       WHEN 'en' THEN 1 WHEN 'es' THEN 2
                       WHEN 'fr' THEN 3 ELSE 4 END)
                   THEN 7 ELSE 0 END AS y
        FROM documents
      ), strata AS (
        SELECT lang, count(*) AS n,
               CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
               CAST(sum(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) AS sy_t,
               CAST(sum(CASE WHEN NOT t THEN y ELSE 0 END) AS BIGINT)
                 AS sy_c
        FROM dosed GROUP BY lang
      ), per AS (
        SELECT lang, n, n_t, sy_t, sy_c,
               CAST(n_t AS DOUBLE) / CAST(n AS DOUBLE) AS e_hat,
               CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS mean_t,
               CAST(sy_c AS DOUBLE) / CAST(n - n_t AS DOUBLE) AS mean_c,
               CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                 - CAST(sy_c AS DOUBLE) / CAST(n - n_t AS DOUBLE) AS diff
        FROM strata
      ), overall AS (
        SELECT 'ALL' AS lang,
               CAST(sum(n) AS BIGINT) AS n,
               CAST(sum(n_t) AS BIGINT) AS n_t,
               CAST(sum(n_t) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS e_hat,
               CAST(sum(sy_t) AS DOUBLE) / CAST(sum(n_t) AS DOUBLE)
                 AS mean_t,
               CAST(sum(sy_c) AS DOUBLE) / CAST(sum(n) - sum(n_t)
                 AS DOUBLE) AS mean_c,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(CAST(n AS DOUBLE) * diff ORDER BY lang)),
                 (acc, x) -> acc + x) / CAST(sum(n) AS DOUBLE) AS diff
        FROM per
      )
      SELECT lang, n, n_t, e_hat, mean_t, mean_c, diff FROM per
      UNION ALL
      SELECT lang, n, n_t, e_hat, mean_t, mean_c, diff FROM overall
      ORDER BY lang"""))

  /** q346: WELCH'S UNEQUAL-VARIANCE t — the two-sample mean test run
    * beside the distribution tests (q326 KS shape, q340 W₁ mass, q321
    * Mann-Whitney ranks; this one asks only about MEANS and tolerates
    * unequal variances — Welch 1947, the modern default over Student):
    * t = (m̄₁−m̄₂)/√(s₁²/n₁+s₂²/n₂) with the Welch–Satterthwaite df.
    * Exact discipline: both samples' moments are integer sums (cents);
    * variances are exact-integer numerators over n(n−1) cast once; t
    * and df are fixed-op-order doubles, identical cross-engine. The
    * 5% verdict uses the z critical value 1.96 (df here is in the
    * thousands, where t ≈ z to 3 decimals — stated, not hidden).
    * Scale: two partial+final moment aggregates, O(1) arithmetic. */
  val q346 = Q(
    "q346_welch_ttest",
    (s, d) => {
      val o = Tables.load(s, d, "orders")
        .filter(col("o_orderstatus").isin("F", "O"))
        .select(col("o_orderstatus").as("st"),
          Det.cents(col("o_totalprice")).as("v"))
      val m = o.groupBy(col("st"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("v")).as("sx"),
          sum((col("v").cast(DecimalType(38, 0)) *
            col("v").cast(DecimalType(38, 0)))).as("sxx"))
        .withColumn("mean", col("sx").cast(DoubleType) /
          col("n").cast(DoubleType))
        .withColumn("var_over_n",
          (col("n").cast(DecimalType(38, 0)) * col("sxx") -
            col("sx").cast(DecimalType(38, 0)) *
              col("sx").cast(DecimalType(38, 0))).cast(DoubleType) /
            ((col("n") * (col("n") - 1)).cast(DoubleType) *
              col("n").cast(DoubleType)))
      val a = m.filter(col("st") === "F")
        .select(col("n").as("n_a"), col("mean").as("mean_a"),
          col("var_over_n").as("va"))
      val b = m.filter(col("st") === "O")
        .select(col("n").as("n_b"), col("mean").as("mean_b"),
          col("var_over_n").as("vb"))
      a.crossJoin(broadcast(b))
        .withColumn("t_stat",
          (col("mean_a") - col("mean_b")) / sqrt(col("va") + col("vb")))
        .withColumn("df_welch",
          (col("va") + col("vb")) * (col("va") + col("vb")) /
            (col("va") * col("va") / (col("n_a") - 1).cast(DoubleType) +
              col("vb") * col("vb") / (col("n_b") - 1).cast(DoubleType)))
        .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
          col("t_stat"), col("df_welch"),
          (abs(col("t_stat")) > 1.96).as("reject_05"))
    },
    Some(s"""
      WITH o AS (
        SELECT o_orderstatus AS st, ${Det.centsSql("o_totalprice")} AS v
        FROM orders WHERE o_orderstatus IN ('F', 'O')
      ), m AS (
        SELECT st, count(*) AS n,
               CAST(sum(v) AS BIGINT) AS sx,
               sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS sxx,
               CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean,
               ${Det.hugeDoubleSql(
                 """count(*) * sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT))
                    - CAST(sum(v) AS HUGEINT) * CAST(sum(v) AS HUGEINT)""")}
                 / (CAST(count(*) * (count(*) - 1) AS DOUBLE)
                    * CAST(count(*) AS DOUBLE)) AS var_over_n
        FROM o GROUP BY st
      ), a AS (
        SELECT n AS n_a, mean AS mean_a, var_over_n AS va
        FROM m WHERE st = 'F'
      ), b AS (
        SELECT n AS n_b, mean AS mean_b, var_over_n AS vb
        FROM m WHERE st = 'O'
      )
      SELECT n_a, n_b, mean_a, mean_b,
             (mean_a - mean_b) / sqrt(va + vb) AS t_stat,
             (va + vb) * (va + vb)
               / (va * va / CAST(n_a - 1 AS DOUBLE)
                  + vb * vb / CAST(n_b - 1 AS DOUBLE)) AS df_welch,
             abs((mean_a - mean_b) / sqrt(va + vb)) > 1.96 AS reject_05
      FROM a, b"""))

  /** q349: CUPED VARIANCE REDUCTION (Deng, Xu, Kohavi & Walker WSDM'13
    * — "Improving the Sensitivity of Online Controlled Experiments by
    * Utilizing Pre-Experiment Data"): the experimentation-platform
    * workhorse that shrinks a metric's variance using a pre-period
    * covariate before any A/B read. Per customer: y = final-year
    * revenue, x = prior-year revenue (zero-filled over the full
    * customer universe — missing-as-zero IS the covariate's value for
    * an inactive customer). θ = cov(x,y)/var(x) and the achieved
    * variance reduction ρ² = cov²/(var(x)·var(y)) come ENTIRELY from
    * exact wide-integer moments (n·Σxy − Σx·Σy etc. in
    * DECIMAL(38,0)/HUGEINT — no float subtraction of near-equal sums),
    * each readout ONE division of identical operands. Scale: one
    * orders rollup + one customer-universe join; the moment aggregate
    * is a single partial+final pass. */
  val q349 = Q(
    "q349_cuped",
    (s, d) => {
      val o = Tables.load(s, d, "orders")
      val yrMax = o.agg(max(year(col("o_orderdate"))).as("yr_max"))
      val rev = o.crossJoin(broadcast(yrMax))
        .filter(year(col("o_orderdate")) >= col("yr_max") - 1)
        .groupBy(col("o_custkey"))
        .agg(
          sum(when(year(col("o_orderdate")) === col("yr_max"),
            Det.cents(col("o_totalprice"))).otherwise(0L)).as("y"),
          sum(when(year(col("o_orderdate")) === col("yr_max") - 1,
            Det.cents(col("o_totalprice"))).otherwise(0L)).as("x"))
      val units = Tables.load(s, d, "customer")
        .select(col("c_custkey").as("o_custkey"))
        .join(rev, Seq("o_custkey"), "left_outer")
        .select(
          coalesce(col("y"), lit(0L)).as("y"),
          coalesce(col("x"), lit(0L)).as("x"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
      units.agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(dec(col("x")) * dec(col("x"))).as("sxx"),
          sum(dec(col("y")) * dec(col("y"))).as("syy"),
          sum(dec(col("x")) * dec(col("y"))).as("sxy"))
        .select(col("n"),
          (dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
            .cast(DoubleType)
            ./((dec(col("n")) * col("sxx") -
              dec(col("sx")) * dec(col("sx"))).cast(DoubleType))
            .as("theta"),
          ((dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
            .cast(DoubleType) *
            (dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
              .cast(DoubleType) /
            ((dec(col("n")) * col("sxx") -
              dec(col("sx")) * dec(col("sx"))).cast(DoubleType) *
              (dec(col("n")) * col("syy") -
                dec(col("sy")) * dec(col("sy"))).cast(DoubleType)))
            .as("var_reduction"))
    },
    Some(s"""
      WITH yrm AS (
        SELECT max(year(o_orderdate)) AS yr_max FROM orders
      ), rev AS (
        SELECT o_custkey,
               CAST(sum(CASE WHEN year(o_orderdate) = yr_max
                 THEN ${Det.centsSql("o_totalprice")} ELSE 0 END)
                 AS BIGINT) AS y,
               CAST(sum(CASE WHEN year(o_orderdate) = yr_max - 1
                 THEN ${Det.centsSql("o_totalprice")} ELSE 0 END)
                 AS BIGINT) AS x
        FROM orders, yrm
        WHERE year(o_orderdate) >= yr_max - 1
        GROUP BY o_custkey
      ), units AS (
        SELECT coalesce(r.y, 0) AS y, coalesce(r.x, 0) AS x
        FROM customer c LEFT JOIN rev r ON r.o_custkey = c.c_custkey
      ), m AS (
        SELECT count(*) AS n,
               CAST(sum(x) AS HUGEINT) AS sx,
               CAST(sum(y) AS HUGEINT) AS sy,
               sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
               sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
               sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
        FROM units
      )
      SELECT n,
             ${Det.hugeDoubleSql("n * sxy - sx * sy")}
               / ${Det.hugeDoubleSql("n * sxx - sx * sx")} AS theta,
             ${Det.hugeDoubleSql("n * sxy - sx * sy")}
               * ${Det.hugeDoubleSql("n * sxy - sx * sy")}
               / (${Det.hugeDoubleSql("n * sxx - sx * sx")}
                  * ${Det.hugeDoubleSql("n * syy - sy * sy")})
               AS var_reduction
      FROM m"""))

  /** q350: BENJAMINI–HOCHBERG FDR CONTROL (Benjamini & Hochberg 1995)
    * — the multiple-testing correction every experimentation platform
    * applies when one launch reads a hundred metrics: naive per-test
    * α = 5% would false-positive ~5 metrics by chance alone; BH's
    * step-up keeps the FALSE DISCOVERY RATE at α. Tests are the
    * (source × lang) metric grid with deterministically dosed permille
    * p-values (md5-derived, with every 7th test enriched to p < 5 permille
    * so the step-up provably fires). The step-up is EXACT INTEGERS
    * throughout: rank k by (p, key), reject the prefix up to the
    * largest k with m·p_k ≤ 50·k (α = 5% in permille, cross-multiplied
    * — no double compare anywhere). Output per test: p, rank, the BH
    * flag at its own rank, and the final step-up verdict; naive-α and
    * BH discovery counts ride every row for the scorecard. Scale: one
    * grid rollup, |tests|-row arithmetic. */
  val q350 = Q(
    "q350_bh_fdr",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val u = hex24Sql("concat(source, ':', lang)")
      val tests = Tables.load(s, d, "documents")
        .select(col("source"), col("lang")).distinct()
        .withColumn("p_permille",
          expr(s"CASE WHEN $u % 7 = 0 THEN $u % 5 ELSE $u % 1000 END"))
      val m = tests.agg(count(lit(1)).as("m"))
      val ranked = tests.crossJoin(broadcast(m))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("p_permille"), col("source"), col("lang")))
          .cast(LongType))
        .withColumn("bh_ok",
          col("m") * col("p_permille") <= lit(50L) * col("rnk"))
      val kMax = ranked
        .agg(coalesce(max(when(col("bh_ok"), col("rnk"))), lit(0L))
          .as("k_max"))
      ranked.crossJoin(broadcast(kMax))
        .withColumn("rejected", col("rnk") <= col("k_max"))
        .select(col("source"), col("lang"),
          col("p_permille").cast(LongType).as("p_permille"),
          col("rnk"), col("m"), col("bh_ok"), col("rejected"),
          (col("p_permille") < 50).as("naive_reject"))
        .orderBy(col("rnk"))
    },
    Some {
      val u = hex24Sql("concat(source, ':', lang)")
      s"""
      WITH tests AS (
        SELECT source, lang,
               CASE WHEN $u % 7 = 0 THEN $u % 5 ELSE $u % 1000 END
                 AS p_permille
        FROM (SELECT DISTINCT source, lang FROM documents)
      ), m AS (
        SELECT count(*) AS m FROM tests
      ), ranked AS (
        SELECT source, lang, CAST(p_permille AS BIGINT) AS p_permille,
               CAST(row_number() OVER (ORDER BY p_permille, source, lang)
                 AS BIGINT) AS rnk,
               m,
               m * p_permille <= 50 * row_number()
                 OVER (ORDER BY p_permille, source, lang) AS bh_ok
        FROM tests, m
      ), km AS (
        SELECT coalesce(max(CASE WHEN bh_ok THEN rnk END), 0) AS k_max
        FROM ranked
      )
      SELECT source, lang, p_permille, rnk, m, bh_ok,
             rnk <= k_max AS rejected,
             p_permille < 50 AS naive_reject
      FROM ranked, km
      ORDER BY rnk"""
    })

  /** q352: McNEMAR'S TEST FOR PAIRED MODEL COMPARISON (McNemar 1947;
    * Dietterich 1998, "Approximate Statistical Tests for Comparing
    * Supervised Classification Learning Algorithms" — the recommended
    * test when two models are scored on the SAME problems): only the
    * DISCORDANT pairs carry information, so the statistic is
    * χ² = (|n01 − n10| − 1)² / (n01 + n10) with continuity correction
    * (clamped at 0 when the discordants tie — the standard convention).
    * Dosed: a latent difficulty u = (doc_id·2654435761) % 100 drives
    * both models (A solves u < 70, B solves u < 60) plus disjoint
    * id-residue rescues (A on %11, B on %9), so the discordant cells
    * are asymmetric and correlated — exactly the regime where McNemar
    * beats a naive two-proportion test. All EXACT: the statistic is a
    * ratio of integers (the squared clamped difference over the
    * discordant count), one IEEE division; accuracies likewise. Scale:
    * one scan to per-source CASE-sums — the report is |sources| rows
    * whatever the corpus size. */
  val q352 = Q(
    "q352_mcnemar",
    (s, d) => {
      val scored = Tables.load(s, d, "documents")
        .withColumn("u", expr("(doc_id * 2654435761L) % 100"))
        .withColumn("a_ok",
          (col("u") < 70) || (expr("doc_id % 11") === 0))
        .withColumn("b_ok",
          (col("u") < 60) || (expr("doc_id % 9") === 0))
      scored.groupBy(col("source"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("a_ok"), 1L).otherwise(0L)).as("n_a_ok"),
          sum(when(col("b_ok"), 1L).otherwise(0L)).as("n_b_ok"),
          sum(when(col("a_ok") && !col("b_ok"), 1L).otherwise(0L))
            .as("n01"),
          sum(when(!col("a_ok") && col("b_ok"), 1L).otherwise(0L))
            .as("n10"))
        .select(
          col("source"), col("n"), col("n01"), col("n10"),
          (col("n_a_ok").cast(DoubleType) / col("n").cast(DoubleType))
            .as("acc_a"),
          (col("n_b_ok").cast(DoubleType) / col("n").cast(DoubleType))
            .as("acc_b"),
          when(col("n01") + col("n10") === 0, lit(0.0))
            .otherwise(
              (greatest(abs(col("n01") - col("n10")) - 1, lit(0L)) *
                greatest(abs(col("n01") - col("n10")) - 1, lit(0L)))
                .cast(DoubleType) /
                (col("n01") + col("n10")).cast(DoubleType))
            .as("chi2_cc"))
        .withColumn("reject_05", col("chi2_cc") > 3.841459)
        .orderBy(col("source"))
    },
    Some("""
      WITH scored AS (
        SELECT source,
               ((doc_id * 2654435761) % 100 < 70 OR doc_id % 11 = 0)
                 AS a_ok,
               ((doc_id * 2654435761) % 100 < 60 OR doc_id % 9 = 0)
                 AS b_ok
        FROM documents
      ), cells AS (
        SELECT source, count(*) AS n,
               CAST(sum(CASE WHEN a_ok THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_a_ok,
               CAST(sum(CASE WHEN b_ok THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_b_ok,
               CAST(sum(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END)
                 AS BIGINT) AS n01,
               CAST(sum(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END)
                 AS BIGINT) AS n10
        FROM scored GROUP BY source
      )
      SELECT source, n, n01, n10,
             CAST(n_a_ok AS DOUBLE) / CAST(n AS DOUBLE) AS acc_a,
             CAST(n_b_ok AS DOUBLE) / CAST(n AS DOUBLE) AS acc_b,
             CASE WHEN n01 + n10 = 0 THEN CAST(0 AS DOUBLE)
                  ELSE CAST(greatest(abs(n01 - n10) - 1, 0)
                              * greatest(abs(n01 - n10) - 1, 0) AS DOUBLE)
                       / CAST(n01 + n10 AS DOUBLE) END AS chi2_cc,
             CASE WHEN n01 + n10 = 0 THEN CAST(0 AS DOUBLE)
                  ELSE CAST(greatest(abs(n01 - n10) - 1, 0)
                              * greatest(abs(n01 - n10) - 1, 0) AS DOUBLE)
                       / CAST(n01 + n10 AS DOUBLE) END > 3.841459
               AS reject_05
      FROM cells
      ORDER BY source"""))

  private val Raters = 5

  /** q353: FLEISS' KAPPA MULTI-ANNOTATOR AGREEMENT (Fleiss 1971,
    * "Measuring nominal scale agreement among many raters") — the
    * generalization of q311's Cohen kappa a labeling pipeline needs the
    * moment it runs more than two annotators per item. Dosed: 5 raters
    * per document, each deviating from the latent class t = (doc_id·7)%3
    * on its OWN residue lattice ((doc_id + a·31) % (4+a) = 0 → class
    * (t+1+a%2)%3), so per-item category counts, the pooled marginals,
    * and kappa are all non-degenerate. EXACT: with N items, r raters,
    * S = Σ_items Σ_cats n_ij², and C = Σ_cats (Σ_items n_ij)²,
    *   P̄  = (S − N·r) / (N·r·(r−1))        — integers, one division,
    *   P̄e = C / (N·r)²                      — integers, one division,
    *   κ  = (P̄ − P̄e) / (1 − P̄e)           — identical doubles, same ops.
    * Computed per language. Scale: one (lang, doc, label) count shuffle
    * (the rater fan-out is a generator, not a join), then per-lang sums
    * — never an item×item or rater×rater pairing. */
  val q353 = Q(
    "q353_fleiss_kappa",
    (s, d) => {
      import graft.Caches.Tracked
      val ratings = Tables.load(s, d, "documents")
        .select(col("lang"), col("doc_id"),
          explode(expr("sequence(0L, 4L)")).as("a"))
        .withColumn("t", expr("(doc_id * 7) % 3"))
        .withColumn("label",
          expr("CASE WHEN (doc_id + a * 31) % (4 + a) = 0 " +
            "THEN ((doc_id * 7) % 3 + 1 + a % 2) % 3 " +
            "ELSE (doc_id * 7) % 3 END"))
      val cells = ratings
        .groupBy(col("lang"), col("doc_id"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .persistTracked()
      val perLang = cells.groupBy(col("lang"))
        .agg(
          sum(col("cnt") * col("cnt")).as("s_sq"),
          expr(s"sum(cnt) div $Raters").as("n_items"))
      val margins = cells.groupBy(col("lang"), col("label"))
        .agg(sum(col("cnt")).as("c_j"))
        .groupBy(col("lang"))
        .agg(sum(col("c_j") * col("c_j")).as("c_sq"))
      perLang.join(margins, Seq("lang"))
        .select(
          col("lang"), col("n_items"), col("s_sq"), col("c_sq"),
          ((col("s_sq") - col("n_items") * Raters).cast(DoubleType) /
            (col("n_items") * (Raters * (Raters - 1))).cast(DoubleType))
            .as("p_bar"),
          (col("c_sq").cast(DoubleType) /
            (col("n_items") * col("n_items") * (Raters * Raters))
              .cast(DoubleType)).as("p_e_bar"))
        .withColumn("kappa",
          (col("p_bar") - col("p_e_bar")) / (lit(1.0) - col("p_e_bar")))
        .orderBy(col("lang"))
    },
    Some(s"""
      WITH ratings AS (
        SELECT d.lang, d.doc_id, r.a,
               CASE WHEN (d.doc_id + r.a * 31) % (4 + r.a) = 0
                    THEN ((d.doc_id * 7) % 3 + 1 + r.a % 2) % 3
                    ELSE (d.doc_id * 7) % 3 END AS label
        FROM documents d CROSS JOIN range(5) r(a)
      ), cells AS (
        SELECT lang, doc_id, label, count(*) AS cnt
        FROM ratings GROUP BY lang, doc_id, label
      ), per_lang AS (
        SELECT lang,
               CAST(sum(cnt * cnt) AS BIGINT) AS s_sq,
               CAST(sum(cnt) // $Raters AS BIGINT) AS n_items
        FROM cells GROUP BY lang
      ), margins AS (
        SELECT lang, CAST(sum(c_j * c_j) AS BIGINT) AS c_sq
        FROM (SELECT lang, label, CAST(sum(cnt) AS BIGINT) AS c_j
              FROM cells GROUP BY lang, label) m
        GROUP BY lang
      ), stats AS (
        SELECT p.lang, p.n_items, p.s_sq, m.c_sq,
               CAST(p.s_sq - p.n_items * $Raters AS DOUBLE)
                 / CAST(p.n_items * ${Raters * (Raters - 1)} AS DOUBLE)
                 AS p_bar,
               CAST(m.c_sq AS DOUBLE)
                 / CAST(p.n_items * p.n_items * ${Raters * Raters}
                        AS DOUBLE) AS p_e_bar
        FROM per_lang p JOIN margins m ON p.lang = m.lang
      )
      SELECT lang, n_items, s_sq, c_sq, p_bar, p_e_bar,
             (p_bar - p_e_bar) / (1 - p_e_bar) AS kappa
      FROM stats
      ORDER BY lang"""))

  /** q354: ONE-WAY ANOVA F-TEST (Fisher 1925) across order-status
    * groups on exact integer cents — the k-group generalization of
    * q346's Welch two-sample test, the first readout when a metric is
    * compared across MORE than two variants. Decomposition from exact
    * wide-integer moments per group (n, Σx as BIGINT, Σx² as
    * DECIMAL(38)/HUGEINT): within-group SS per group is
    * (n·Σx² − (Σx)²)/n with an exact integer numerator (the q346
    * discipline), between-group SS is n·(mean_g − mean)² on identical
    * doubles; both fold across the ≤|groups| rows in FIXED group-key
    * order (Spark aggregate(array_sort(collect_list)) ↔ DuckDB
    * list_reduce(list_prepend(0.0, list(... ORDER BY st))) — the q304
    * ordered-fold discipline), so F and η² bit-agree cross-engine.
    * Scale: one partial+final moment pass; the fold runs on a
    * |groups|-row table. F crit for df1=2 at α=.05 as df2→∞ is
    * χ²₂/2 = 2.9957. */
  val q354 = Q(
    "q354_anova_f",
    (s, d) => {
      val m = Tables.load(s, d, "orders")
        .select(col("o_orderstatus").as("st"),
          Det.cents(col("o_totalprice")).as("v"))
        .groupBy(col("st"))
        .agg(
          count(lit(1)).as("n_g"),
          sum(col("v")).as("sx"),
          sum(col("v").cast(DecimalType(38, 0)) *
            col("v").cast(DecimalType(38, 0))).as("sxx"))
      val grand = m.agg(
        sum(col("n_g")).as("n_total"),
        sum(col("sx")).as("t_sum"),
        count(lit(1)).as("k"))
      val per = m.crossJoin(broadcast(grand))
        .withColumn("mean_g",
          col("sx").cast(DoubleType) / col("n_g").cast(DoubleType))
        .withColumn("grand_mean",
          col("t_sum").cast(DoubleType) / col("n_total").cast(DoubleType))
        .withColumn("ssw_g",
          (col("n_g").cast(DecimalType(38, 0)) * col("sxx") -
            col("sx").cast(DecimalType(38, 0)) *
              col("sx").cast(DecimalType(38, 0))).cast(DoubleType) /
            col("n_g").cast(DoubleType))
        .withColumn("ssb_g",
          col("n_g").cast(DoubleType) *
            (col("mean_g") - col("grand_mean")) *
            (col("mean_g") - col("grand_mean")))
      per.groupBy(col("n_total"), col("k"))
        .agg(
          expr("aggregate(array_sort(collect_list(struct(st, ssb_g))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x.ssb_g)").as("ss_between"),
          expr("aggregate(array_sort(collect_list(struct(st, ssw_g))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x.ssw_g)").as("ss_within"))
        .select(
          col("k").as("n_groups"), col("n_total"),
          col("ss_between"), col("ss_within"),
          ((col("ss_between") / (col("k") - 1).cast(DoubleType)) /
            (col("ss_within") /
              (col("n_total") - col("k")).cast(DoubleType))).as("f_stat"),
          (col("ss_between") / (col("ss_between") + col("ss_within")))
            .as("eta_sq"))
        .withColumn("reject_05", col("f_stat") > 2.9957)
    },
    Some(s"""
      WITH m AS (
        SELECT o_orderstatus AS st, count(*) AS n_g,
               CAST(sum(v) AS BIGINT) AS sx,
               sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS sxx
        FROM (SELECT o_orderstatus, ${Det.centsSql("o_totalprice")} AS v
              FROM orders) o
        GROUP BY o_orderstatus
      ), grand AS (
        SELECT CAST(sum(n_g) AS BIGINT) AS n_total,
               CAST(sum(sx) AS BIGINT) AS t_sum,
               count(*) AS k
        FROM m
      ), per AS (
        SELECT m.st, g.n_total, g.k,
               CAST(m.sx AS DOUBLE) / CAST(m.n_g AS DOUBLE) AS mean_g,
               CAST(g.t_sum AS DOUBLE) / CAST(g.n_total AS DOUBLE)
                 AS grand_mean,
               ${Det.hugeDoubleSql(
                 """CAST(m.n_g AS HUGEINT) * m.sxx
                      - CAST(m.sx AS HUGEINT) * CAST(m.sx AS HUGEINT)""")}
                 / CAST(m.n_g AS DOUBLE) AS ssw_g,
               CAST(m.n_g AS DOUBLE)
                 * (CAST(m.sx AS DOUBLE) / CAST(m.n_g AS DOUBLE)
                    - CAST(g.t_sum AS DOUBLE) / CAST(g.n_total AS DOUBLE))
                 * (CAST(m.sx AS DOUBLE) / CAST(m.n_g AS DOUBLE)
                    - CAST(g.t_sum AS DOUBLE) / CAST(g.n_total AS DOUBLE))
                 AS ssb_g
        FROM m CROSS JOIN grand g
      ), folded AS (
        SELECT n_total, k,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(ssb_g ORDER BY st)), (acc, x) -> acc + x)
                 AS ss_between,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(ssw_g ORDER BY st)), (acc, x) -> acc + x)
                 AS ss_within
        FROM per GROUP BY n_total, k
      )
      SELECT k AS n_groups, n_total, ss_between, ss_within,
             (ss_between / CAST(k - 1 AS DOUBLE))
               / (ss_within / CAST(n_total - k AS DOUBLE)) AS f_stat,
             ss_between / (ss_between + ss_within) AS eta_sq,
             (ss_between / CAST(k - 1 AS DOUBLE))
               / (ss_within / CAST(n_total - k AS DOUBLE)) > 2.9957
               AS reject_05
      FROM folded"""))

  /** q355: KENDALL'S τ-b RANK CORRELATION (Kendall 1938; the τ-b tie
    * correction of Kendall 1945) — the pair-concordance complement of
    * q322's Spearman ρ, and the standard agreement readout between two
    * RANKERS (two retrieval systems, two judge models ordering the same
    * eval panel). Dosed: two correlated integer scores with deliberate
    * ties (coarse integer buckets), so concordant, discordant and BOTH
    * tie columns are all non-trivial. EXACT: C, D, T_x, T_y and
    * n0 = n(n−1)/2 are integers off one bounded pair join;
    * τ_b = (C − D)/√((n0 − T_x)(n0 − T_y)) is one integer product, one
    * IEEE sqrt (correctly rounded), one division. Scale: the panel is
    * BOUNDED BY DESIGN (doc_id < 200 — rankings are compared on eval
    * panels, not corpora; the broadcast self-join is 200², metadata-
    * sized). The full-corpus rank path is q322's Spearman, which needs
    * no pair join. */
  val q355 = Q(
    "q355_kendall_tau",
    (s, d) => {
      import graft.Caches.Tracked
      val panel = Tables.load(s, d, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          expr("((doc_id * 2654435761L) % 1000) div 25").as("x"))
        // all-positive operands: Spark `div` truncates toward zero while
        // DuckDB `//` floors, so a negative intermediate would desync
        .withColumn("y",
          expr("(x * 5 + (doc_id * 7919) % 60) div 10"))
        .persistTracked()
      val a = panel.select(col("doc_id").as("ida"), col("x").as("xa"),
        col("y").as("ya"))
      val b = panel.select(col("doc_id").as("idb"), col("x").as("xb"),
        col("y").as("yb"))
      val pairs = a.join(broadcast(b), col("ida") < col("idb"))
      val n = panel.count() // bounded panel; a count, not a data collect
      pairs.agg(
        count(lit(1)).as("n0"),
        sum(when((col("xa") - col("xb")) * (col("ya") - col("yb")) > 0,
          1L).otherwise(0L)).as("concordant"),
        sum(when((col("xa") - col("xb")) * (col("ya") - col("yb")) < 0,
          1L).otherwise(0L)).as("discordant"),
        sum(when(col("xa") === col("xb"), 1L).otherwise(0L)).as("ties_x"),
        sum(when(col("ya") === col("yb"), 1L).otherwise(0L)).as("ties_y"))
        .select(
          lit(n).as("n"), col("n0"), col("concordant"), col("discordant"),
          col("ties_x"), col("ties_y"),
          ((col("concordant") - col("discordant")).cast(DoubleType) /
            sqrt(((col("n0") - col("ties_x")) *
              (col("n0") - col("ties_y"))).cast(DoubleType))).as("tau_b"))
    },
    Some("""
      WITH panel AS (
        SELECT doc_id, x, (x * 5 + (doc_id * 7919) % 60) // 10 AS y
        FROM (SELECT doc_id, ((doc_id * 2654435761) % 1000) // 25 AS x
              FROM documents WHERE doc_id < 200) raw
      ), pairs AS (
        SELECT count(*) AS n0,
               CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
               CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
               CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT)
                 AS ties_x,
               CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT)
                 AS ties_y
        FROM panel a JOIN panel b ON a.doc_id < b.doc_id
      )
      SELECT (SELECT count(*) FROM panel) AS n,
             n0, concordant, discordant, ties_x, ties_y,
             CAST(concordant - discordant AS DOUBLE)
               / sqrt(CAST((n0 - ties_x) * (n0 - ties_y) AS DOUBLE))
               AS tau_b
      FROM pairs"""))

  /** z_{0.975} + z_{0.80} — the 5%-two-sided / 80%-power constant of
    * every sample-size formula, as ONE literal (a sum of two literals
    * would also fold identically, but one literal leaves nothing to
    * trust). Its square is interpolated from Scala (Double.toString is
    * shortest-roundtrip, so both engines parse the identical bits). */
  private val ZSum = 2.801585
  private val ZSum2 = ZSum * ZSum

  /** q356: A/B POWER / MINIMUM-DETECTABLE-EFFECT CALCULATOR (the
    * pre-registration readout of every experimentation platform; van
    * Belle's "Statistical Rules of Thumb" §2.2 form n = 2σ²(z_α+z_β)²/δ²
    * — the design-time twin of q346's Welch read and q349's CUPED
    * variance): per order-priority segment, the metric variance from
    * exact wide-integer moments gives (a) the MDE a 50/50 split of the
    * segment's current traffic can resolve at 5%/80%, and (b) the
    * per-arm sample size needed to detect a 2% relative lift. EXACT:
    * s² has an integer numerator (q346 discipline); MDE and n_req are
    * fixed-order double expressions on identical operands; ceil() then
    * lands on the same integer. Scale: one partial+final moment pass;
    * the report is |segments| rows. */
  val q356 = Q(
    "q356_power_mde",
    (s, d) => {
      Tables.load(s, d, "orders")
        .select(col("o_orderpriority").as("pri"),
          Det.cents(col("o_totalprice")).as("v"))
        .groupBy(col("pri"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("v")).as("sx"),
          sum(col("v").cast(DecimalType(38, 0)) *
            col("v").cast(DecimalType(38, 0))).as("sxx"))
        .withColumn("n_arm", expr("n div 2"))
        .withColumn("mean_cents",
          col("sx").cast(DoubleType) / col("n").cast(DoubleType))
        .withColumn("s2",
          (col("n").cast(DecimalType(38, 0)) * col("sxx") -
            col("sx").cast(DecimalType(38, 0)) *
              col("sx").cast(DecimalType(38, 0))).cast(DoubleType) /
            (col("n") * (col("n") - 1)).cast(DoubleType))
        .withColumn("mde_abs_cents",
          lit(ZSum) * sqrt(lit(2.0) * col("s2") /
            col("n_arm").cast(DoubleType)))
        .withColumn("mde_rel", col("mde_abs_cents") / col("mean_cents"))
        .withColumn("delta", lit(0.02) * col("mean_cents"))
        .withColumn("n_req_2pct",
          ceil(lit(2.0) * col("s2") * lit(ZSum2) /
            (col("delta") * col("delta"))))
        .select(col("pri"), col("n"), col("n_arm"), col("mean_cents"),
          col("s2"), col("mde_abs_cents"), col("mde_rel"),
          col("n_req_2pct"))
        .orderBy(col("pri"))
    },
    Some(s"""
      WITH m AS (
        SELECT pri, count(*) AS n,
               CAST(sum(v) AS BIGINT) AS sx,
               sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS sxx
        FROM (SELECT o_orderpriority AS pri,
                     ${Det.centsSql("o_totalprice")} AS v
              FROM orders) o
        GROUP BY pri
      ), stats AS (
        SELECT pri, n, n // 2 AS n_arm,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
               ${Det.hugeDoubleSql(
                 """CAST(n AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)""")}
                 / CAST(n * (n - 1) AS DOUBLE) AS s2
        FROM m
      ), calc AS (
        SELECT pri, n, n_arm, mean_cents, s2,
               $ZSum * sqrt(2.0 * s2 / CAST(n_arm AS DOUBLE))
                 AS mde_abs_cents,
               0.02 * mean_cents AS delta
        FROM stats
      )
      SELECT pri, n, n_arm, mean_cents, s2, mde_abs_cents,
             mde_abs_cents / mean_cents AS mde_rel,
             CAST(ceil(2.0 * s2 * $ZSum2 / (delta * delta)) AS BIGINT)
               AS n_req_2pct
      FROM calc
      ORDER BY pri"""))

  /** q358: KRIPPENDORFF'S α WITH MISSING RATINGS (Krippendorff 1970,
    * 2004 §11) — the agreement coefficient an annotation pipeline needs
    * when rater coverage is INCOMPLETE (q311 requires exactly two
    * raters, q353 requires all r present; real labeling queues assign
    * 2–5 of a pool per item). Dosed: rater a skips items with
    * (doc_id + a·17) % 3 = 0, so m_u varies over 2..5 (singletons are
    * excluded per the definition — no pairable value); labels deviate
    * from the latent class on per-rater lattices as in q353. EXACT via
    * the q339 twelfths trick: each item's off-diagonal coincidence mass
    * is (m_u² − Σ_c n_uc²)/(m_u − 1) and 12/(m_u − 1) is an integer for
    * every m_u ∈ 2..5, so SO12 = Σ_u (m_u² − Σ n_uc²)·(12 div (m_u−1))
    * is an integer and, with n pairable values and category totals n_c,
    *   α = 1 − (n−1)·SO12 / (12·(n² − Σ n_c²))
    * — one division of exact integers. Per-language grain. Scale: one
    * (lang, doc, label) count shuffle, then per-lang sums — the
    * coincidence matrix is never materialized item by item. */
  val q358 = Q(
    "q358_krippendorff",
    (s, d) => {
      import graft.Caches.Tracked
      val ratings = Tables.load(s, d, "documents")
        .select(col("lang"), col("doc_id"),
          explode(expr("sequence(0L, 4L)")).as("a"))
        .filter(expr("(doc_id + a * 17) % 3 != 0"))
        .withColumn("label",
          expr("CASE WHEN (doc_id + a * 31) % (4 + a) = 0 " +
            "THEN ((doc_id * 7) % 3 + 1 + a % 2) % 3 " +
            "ELSE (doc_id * 7) % 3 END"))
      val cells = ratings
        .groupBy(col("lang"), col("doc_id"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val items = cells.groupBy(col("lang"), col("doc_id"))
        .agg(sum(col("cnt")).as("m"),
          sum(col("cnt") * col("cnt")).as("ssq"))
        .filter(col("m") >= 2) // singletons carry no pairable value
        .persistTracked()
      val perLang = items.groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("m")).as("n_values"),
          sum((col("m") * col("m") - col("ssq")) *
            expr("12 div (m - 1)")).as("so12"))
      // category totals over PAIRABLE items only
      val csq = cells
        .join(items.select(col("lang"), col("doc_id")),
          Seq("lang", "doc_id"))
        .groupBy(col("lang"), col("label"))
        .agg(sum(col("cnt")).as("n_c"))
        .groupBy(col("lang"))
        .agg(sum(col("n_c") * col("n_c")).as("csq"))
      perLang.join(csq, Seq("lang"))
        .select(
          col("lang"), col("n_items"), col("n_values"), col("so12"),
          col("csq"),
          (lit(1.0) -
            ((col("n_values") - 1) * col("so12")).cast(DoubleType) /
              (lit(12L) * (col("n_values") * col("n_values") -
                col("csq"))).cast(DoubleType)).as("alpha"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH ratings AS (
        SELECT d.lang, d.doc_id, r.a,
               CASE WHEN (d.doc_id + r.a * 31) % (4 + r.a) = 0
                    THEN ((d.doc_id * 7) % 3 + 1 + r.a % 2) % 3
                    ELSE (d.doc_id * 7) % 3 END AS label
        FROM documents d CROSS JOIN range(5) r(a)
        WHERE (d.doc_id + r.a * 17) % 3 != 0
      ), cells AS (
        SELECT lang, doc_id, label, count(*) AS cnt
        FROM ratings GROUP BY lang, doc_id, label
      ), items AS (
        SELECT lang, doc_id,
               CAST(sum(cnt) AS BIGINT) AS m,
               CAST(sum(cnt * cnt) AS BIGINT) AS ssq
        FROM cells GROUP BY lang, doc_id
        HAVING CAST(sum(cnt) AS BIGINT) >= 2
      ), per_lang AS (
        SELECT lang, count(*) AS n_items,
               CAST(sum(m) AS BIGINT) AS n_values,
               CAST(sum((m * m - ssq) * (12 // (m - 1))) AS BIGINT)
                 AS so12
        FROM items GROUP BY lang
      ), csq AS (
        SELECT lang, CAST(sum(n_c * n_c) AS BIGINT) AS csq
        FROM (SELECT c.lang, c.label, CAST(sum(c.cnt) AS BIGINT) AS n_c
              FROM cells c JOIN items i
                ON c.lang = i.lang AND c.doc_id = i.doc_id
              GROUP BY c.lang, c.label) m
        GROUP BY lang
      )
      SELECT p.lang, p.n_items, p.n_values, p.so12, q.csq,
             1.0 - CAST((p.n_values - 1) * p.so12 AS DOUBLE)
                   / CAST(12 * (p.n_values * p.n_values - q.csq)
                          AS DOUBLE) AS alpha
      FROM per_lang p JOIN csq q ON p.lang = q.lang
      ORDER BY p.lang"""))

  /** Pocock's two-sided group-sequential boundary for K = 5 looks at
    * α = 0.05 (Pocock 1977, table 2) — a published constant, like
    * q346's 1.96 and q356's z-sum. */
  private val Pocock5 = 2.413

  /** q362: GROUP-SEQUENTIAL A/B MONITORING WITH POCOCK BOUNDARIES
    * (Pocock 1977; the interim-analysis discipline every
    * experimentation platform applies so peeking K times doesn't
    * inflate α — the sequential companion of q346's fixed-horizon test
    * and q356's design calculator): the experiment window is cut into
    * 5 equal calendar looks; at each look the CUMULATIVE arms are
    * compared with the Welch z and stopped iff |z| > 2.413 (vs the
    * naive 1.96 a non-sequential read would use). Dosed: deterministic
    * 50/50 hash assignment and a 10% treatment lift (cents div 10) —
    * sized so the boundary is NOT crossed at the first look at sf0.001
    * but genuinely crosses mid-experiment as evidence accumulates. EXACT: cumulative
    * moments are window sums of exact integers (DECIMAL(38)/HUGEINT
    * squares), each z from the q346 var-over-n form; the stop verdict
    * compares identical doubles; the first-stop look is a bounded
    * aggregate, not a window. Scale: one partial+final moment pass to
    * (look, arm) rows; everything after is 10-row metadata. */
  val q362 = Q(
    "q362_sequential_ab",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val assigned = Tables.load(s, d, "orders")
        .withColumn("mi",
          year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .withColumn("arm", expr("(o_orderkey * 2654435761L) % 2"))
        .withColumn("v",
          Det.cents(col("o_totalprice")) +
            when(col("arm") === 1,
              expr(s"${Det.centsSql("o_totalprice")} div 10"))
              .otherwise(0L))
      val bounds = assigned.agg(
        min(col("mi")).as("mn"), max(col("mi")).as("mx"))
      val looked = assigned.crossJoin(broadcast(bounds))
        .withColumn("look",
          expr("1 + ((mi - mn) * 5) div (mx - mn + 1)"))
      val m = looked.groupBy(col("look"), col("arm"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("v")).as("sx"),
          sum(col("v").cast(DecimalType(38, 0)) *
            col("v").cast(DecimalType(38, 0))).as("sxx"))
      val w = Window.partitionBy(col("arm")).orderBy(col("look"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = m
        .withColumn("cn", sum(col("n")).over(w))
        .withColumn("csx", sum(col("sx")).over(w))
        .withColumn("csxx", sum(col("sxx")).over(w))
        .withColumn("mean",
          col("csx").cast(DoubleType) / col("cn").cast(DoubleType))
        .withColumn("von",
          (col("cn").cast(DecimalType(38, 0)) * col("csxx") -
            col("csx").cast(DecimalType(38, 0)) *
              col("csx").cast(DecimalType(38, 0))).cast(DoubleType) /
            ((col("cn") * (col("cn") - 1)).cast(DoubleType) *
              col("cn").cast(DoubleType)))
      val looks = cum.filter(col("arm") === 0)
        .select(col("look"), col("cn").as("n_c"),
          col("mean").as("mean_c"), col("von").as("von_c"))
        .join(cum.filter(col("arm") === 1)
          .select(col("look"), col("cn").as("n_t"),
            col("mean").as("mean_t"), col("von").as("von_t")),
          Seq("look"))
        .withColumn("z",
          (col("mean_t") - col("mean_c")) /
            sqrt(col("von_t") + col("von_c")))
        .withColumn("stop", abs(col("z")) > Pocock5)
      val first = looks.agg(
        min(when(col("stop"), col("look"))).as("first_stop_look"))
      looks.crossJoin(broadcast(first))
        .select(col("look"), col("n_c"), col("n_t"), col("mean_c"),
          col("mean_t"), col("z"), col("stop"), col("first_stop_look"))
        .orderBy(col("look"))
    },
    Some(s"""
      WITH assigned AS (
        SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mi,
               (o_orderkey * 2654435761) % 2 AS arm,
               ${Det.centsSql("o_totalprice")}
                 + CASE WHEN (o_orderkey * 2654435761) % 2 = 1
                        THEN ${Det.centsSql("o_totalprice")} // 10
                        ELSE 0 END AS v
        FROM orders
      ), bounds AS (
        SELECT min(mi) AS mn, max(mi) AS mx FROM assigned
      ), m AS (
        SELECT 1 + ((mi - mn) * 5) // (mx - mn + 1) AS look, arm,
               count(*) AS n, CAST(sum(v) AS BIGINT) AS sx,
               sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS sxx
        FROM assigned CROSS JOIN bounds
        GROUP BY 1, 2
      ), cum AS (
        SELECT look, arm,
               CAST(sum(n) OVER pw AS BIGINT) AS cn,
               CAST(sum(sx) OVER pw AS BIGINT) AS csx,
               sum(sxx) OVER pw AS csxx
        FROM m
        WINDOW pw AS (PARTITION BY arm ORDER BY look
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ), stats AS (
        SELECT look, arm, cn,
               CAST(csx AS DOUBLE) / CAST(cn AS DOUBLE) AS mean,
               ${Det.hugeDoubleSql(
                 """CAST(cn AS HUGEINT) * csxx
                      - CAST(csx AS HUGEINT) * CAST(csx AS HUGEINT)""")}
                 / (CAST(cn * (cn - 1) AS DOUBLE) * CAST(cn AS DOUBLE))
                 AS von
        FROM cum
      ), looks AS (
        SELECT c.look, c.cn AS n_c, t.cn AS n_t,
               c.mean AS mean_c, t.mean AS mean_t,
               (t.mean - c.mean) / sqrt(t.von + c.von) AS z,
               abs((t.mean - c.mean) / sqrt(t.von + c.von)) > $Pocock5
                 AS stop
        FROM stats c JOIN stats t ON c.look = t.look
        WHERE c.arm = 0 AND t.arm = 1
      ), first AS (
        SELECT min(CASE WHEN stop THEN look END) AS first_stop_look
        FROM looks
      )
      SELECT look, n_c, n_t, mean_c, mean_t, z, stop, first_stop_look
      FROM looks CROSS JOIN first
      ORDER BY look"""))

  /** q364: MATTHEWS CORRELATION + BINARY SCORECARD (Matthews 1975;
    * Chicco & Jurman 2020 argue MCC over F1/accuracy for imbalanced
    * screens — exactly the regime of a quality-filter model that
    * rejects most documents): per-source confusion matrix from a dosed
    * binary truth (latent u < 30: a ~30% positive class) and a
    * predictor with asymmetric dosed error lattices (misses on %7,
    * false-fires on %13), then
    *   MCC = (tp·tn − fp·fn)/√((tp+fp)(tp+fn)(tn+fp)(tn+fn)),
    * balanced accuracy (TPR+TNR)/2 and Youden's J = TPR − FPR.
    * EXACT: the numerator is BIGINT; the four marginals multiply
    * in DECIMAL(38)/HUGEINT before ONE cast (each factor ≤ N, so the
    * product needs ~4·log₁₀N digits — wide integers, never a float
    * product of floats); TPR/FPR/BA are single divisions. Scale: one
    * scan to per-source CASE-sums. */
  val q364 = Q(
    "q364_mcc_scorecard",
    (s, d) => {
      val scored = Tables.load(s, d, "documents")
        .withColumn("u", expr("(doc_id * 2654435761L) % 100"))
        .withColumn("t", (col("u") < 30).cast("int").cast("long"))
        .withColumn("p",
          when(col("t") === 1 && expr("doc_id % 7") === 0, 0L)
            .when(col("t") === 0 && expr("doc_id % 13") === 0, 1L)
            .otherwise(col("t")))
      val cells = scored.groupBy(col("source"))
        .agg(
          sum(when(col("t") === 1 && col("p") === 1, 1L).otherwise(0L))
            .as("tp"),
          sum(when(col("t") === 0 && col("p") === 1, 1L).otherwise(0L))
            .as("fp"),
          sum(when(col("t") === 1 && col("p") === 0, 1L).otherwise(0L))
            .as("fn"),
          sum(when(col("t") === 0 && col("p") === 0, 1L).otherwise(0L))
            .as("tn"))
      cells.select(
          col("source"), col("tp"), col("fp"), col("fn"), col("tn"),
          (col("tp").cast(DoubleType) /
            (col("tp") + col("fn")).cast(DoubleType)).as("tpr"),
          (col("fp").cast(DoubleType) /
            (col("fp") + col("tn")).cast(DoubleType)).as("fpr"),
          ((col("tp") * col("tn") - col("fp") * col("fn"))
            .cast(DoubleType) /
            sqrt(((col("tp") + col("fp")).cast(DecimalType(38, 0)) *
              (col("tp") + col("fn")).cast(DecimalType(38, 0)) *
              (col("tn") + col("fp")).cast(DecimalType(38, 0)) *
              (col("tn") + col("fn")).cast(DecimalType(38, 0)))
              .cast(DoubleType))).as("mcc"))
        .withColumn("balanced_acc",
          (col("tpr") + (lit(1.0) - col("fpr"))) / 2)
        .withColumn("youden_j", col("tpr") - col("fpr"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH scored AS (
        SELECT source,
               CASE WHEN (doc_id * 2654435761) % 100 < 30
                    THEN 1 ELSE 0 END AS t,
               CASE WHEN (doc_id * 2654435761) % 100 < 30
                         AND doc_id % 7 = 0 THEN 0
                    WHEN (doc_id * 2654435761) % 100 >= 30
                         AND doc_id % 13 = 0 THEN 1
                    ELSE CASE WHEN (doc_id * 2654435761) % 100 < 30
                              THEN 1 ELSE 0 END END AS p
        FROM documents
      ), cells AS (
        SELECT source,
               CAST(sum(CASE WHEN t = 1 AND p = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS tp,
               CAST(sum(CASE WHEN t = 0 AND p = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS fp,
               CAST(sum(CASE WHEN t = 1 AND p = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS fn,
               CAST(sum(CASE WHEN t = 0 AND p = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS tn
        FROM scored GROUP BY source
      ), stats AS (
        SELECT source, tp, fp, fn, tn,
               CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS tpr,
               CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE) AS fpr,
               CAST(tp * tn - fp * fn AS DOUBLE)
                 / sqrt(${Det.hugeDoubleSql(
                     """CAST(tp + fp AS HUGEINT)
                             * CAST(tp + fn AS HUGEINT)
                             * CAST(tn + fp AS HUGEINT)
                             * CAST(tn + fn AS HUGEINT)""")})
                 AS mcc
        FROM cells
      )
      SELECT source, tp, fp, fn, tn, tpr, fpr, mcc,
             (tpr + (1.0 - fpr)) / 2 AS balanced_acc,
             tpr - fpr AS youden_j
      FROM stats
      ORDER BY source"""))

  private val Caliper = 10000L // 100 dollars, in cents

  /** q367: NEAREST-NEIGHBOR CALIPER MATCHING (Rubin 1973; Abadie &
    * Imbens 2006; Rosenbaum & Rubin 1985 recommend the caliper) — the
    * matching estimator beside q342's weighting: every TREATED unit is
    * matched (with replacement) to the CONTROL with the nearest
    * pre-treatment covariate within a fixed caliper, and the ATT is the
    * mean matched difference. Dosed confounding by construction: the
    * treatment probability RISES with order size x (permille threshold
    * 200 + min(600, x div 50000)) and the outcome is y = x plus a 3%
    * treated lift (x div 33) — so the naive difference is wildly biased
    * upward and matching must recover ≈ the true lift. The match is the
    * q301 grid-probe shape: controls bucket by x div caliper, each
    * treated probes its 3 neighboring buckets, candidates outside the
    * caliper are cut, and the 1-NN is row_number() = 1 over
    * (|Δx|, x_c, control key) — a FULL tiebreak, so both engines pick
    * the identical control. EXACT: ATT and the naive read are single
    * divisions of integer sums; the true-lift reference (mean x div 33
    * over matched treated) is reported beside them. Scale: the probe
    * join is bucket-bounded (never treated × all controls); a dense
    * bucket is a q36-style salting candidate, flagged in the plan. */
  val q367 = Q(
    "q367_caliper_matching",
    (s, d) => {
      import graft.Caches.Tracked
      val base = Tables.load(s, d, "orders")
        .select(col("o_orderkey").as("k"),
          Det.cents(col("o_totalprice")).as("x"))
        .withColumn("t",
          expr("(k * 2654435761L) % 1000") <
            lit(200L) + least(lit(600L), expr("x div 50000")))
        .withColumn("y",
          col("x") + when(col("t"), expr("x div 33")).otherwise(0L))
        .persistTracked()
      val treated = base.filter(col("t"))
        .select(col("k").as("kt"), col("x").as("xt"), col("y").as("yt"))
      val controls = base.filter(!col("t"))
        .select(col("k").as("kc"), col("x").as("xc"), col("y").as("yc"))
        .withColumn("b", expr(s"xc div $Caliper"))
      val probes = treated
        .select(col("kt"), col("xt"), col("yt"),
          explode(expr(s"array(xt div $Caliper - 1, xt div $Caliper, " +
            s"xt div $Caliper + 1)")).as("b"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("kt"))
        .orderBy(abs(col("xt") - col("xc")), col("xc"), col("kc"))
      val matched = probes.join(controls, Seq("b"))
        .filter(abs(col("xt") - col("xc")) <= Caliper)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .persistTracked()
      val nT = treated.agg(count(lit(1)).as("n_treated"))
      val agg = matched.agg(
        count(lit(1)).as("n_matched"),
        sum(col("yt")).as("syt"), sum(col("yc")).as("syc"),
        sum(expr("xt div 33")).as("strue"))
      val naive = base.agg(
        (sum(when(col("t"), col("y"))).cast(DoubleType) /
          sum(when(col("t"), 1L)).cast(DoubleType) -
          sum(when(!col("t"), col("y"))).cast(DoubleType) /
            sum(when(!col("t"), 1L)).cast(DoubleType)).as("naive_diff"))
      agg.crossJoin(broadcast(nT)).crossJoin(broadcast(naive))
        .select(col("n_treated"), col("n_matched"),
          ((col("syt") - col("syc")).cast(DoubleType) /
            col("n_matched").cast(DoubleType)).as("att_matched"),
          (col("strue").cast(DoubleType) /
            col("n_matched").cast(DoubleType)).as("true_att_matched"),
          col("naive_diff"))
    },
    Some(s"""
      WITH base AS (
        SELECT o_orderkey AS k, x,
               (o_orderkey * 2654435761) % 1000
                 < 200 + least(600, x // 50000) AS t,
               x + CASE WHEN (o_orderkey * 2654435761) % 1000
                             < 200 + least(600, x // 50000)
                        THEN x // 33 ELSE 0 END AS y
        FROM (SELECT o_orderkey,
                     ${Det.centsSql("o_totalprice")} AS x
              FROM orders) o
      ), treated AS (
        SELECT k AS kt, x AS xt, y AS yt FROM base WHERE t
      ), controls AS (
        SELECT k AS kc, x AS xc, y AS yc, x // $Caliper AS b
        FROM base WHERE NOT t
      ), probes AS (
        SELECT kt, xt, yt, xt // $Caliper + off.o AS b
        FROM treated CROSS JOIN (VALUES (-1), (0), (1)) off(o)
      ), matched AS (
        SELECT * FROM (
          SELECT p.kt, p.xt, p.yt, c.yc,
                 row_number() OVER (PARTITION BY p.kt
                   ORDER BY abs(p.xt - c.xc), c.xc, c.kc) AS rn
          FROM probes p JOIN controls c ON p.b = c.b
          WHERE abs(p.xt - c.xc) <= $Caliper) r
        WHERE rn = 1
      ), agg AS (
        SELECT count(*) AS n_matched,
               CAST(sum(yt) AS BIGINT) AS syt,
               CAST(sum(yc) AS BIGINT) AS syc,
               CAST(sum(xt // 33) AS BIGINT) AS strue
        FROM matched
      ), nt AS (
        SELECT count(*) AS n_treated FROM treated
      ), naive AS (
        SELECT CAST(sum(CASE WHEN t THEN y END) AS DOUBLE)
                 / CAST(sum(CASE WHEN t THEN 1 END) AS DOUBLE)
               - CAST(sum(CASE WHEN NOT t THEN y END) AS DOUBLE)
                 / CAST(sum(CASE WHEN NOT t THEN 1 END) AS DOUBLE)
                 AS naive_diff
        FROM base
      )
      SELECT n_treated, n_matched,
             CAST(syt - syc AS DOUBLE) / CAST(n_matched AS DOUBLE)
               AS att_matched,
             CAST(strue AS DOUBLE) / CAST(n_matched AS DOUBLE)
               AS true_att_matched,
             naive_diff
      FROM agg CROSS JOIN nt CROSS JOIN naive"""))

  /** q368: SIMPSON'S-PARADOX DETECTOR (Simpson 1951; Bickel, Hammel &
    * O'Connell 1975's Berkeley admissions is the canonical instance) —
    * the segmentation audit an experimentation platform runs before
    * trusting any pooled read: does the pooled treatment difference
    * point the OPPOSITE way from every segment? Dosed to paradox by
    * construction: treatment take-up rises steeply with the priority
    * segment (20% + 15·pi permille-scaled), the segment itself lifts
    * the outcome strongly (pi·(cents div 3)), and treatment has a 33%
    * NEGATIVE within-segment effect (−cents div 3) — so treated units
    * concentrate where the outcome is structurally high and the pooled
    * difference flips positive. EXACT: per-segment and pooled means are
    * single divisions of exact integer sums; the verdict compares
    * identical doubles; the all-segments extremes come from a bounded
    * aggregate broadcast back onto the report. Scale: one scan to
    * per-(segment, arm) sums; |segments| rows after. */
  val q368 = Q(
    "q368_simpsons_detector",
    (s, d) => {
      import graft.Caches.Tracked
      val base = Tables.load(s, d, "orders")
        .withColumn("pi",
          expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT) - 1"))
        .withColumn("t",
          expr("(o_orderkey * 2654435761L) % 100") <
            lit(20L) + lit(15L) * col("pi"))
        .withColumn("c", Det.cents(col("o_totalprice")))
        .withColumn("y",
          col("c") + col("pi") * expr("c div 3") -
            when(col("t"), expr("c div 3")).otherwise(0L))
      val seg = base.groupBy(col("o_orderpriority").as("segment"))
        .agg(
          sum(when(!col("t"), 1L).otherwise(0L)).as("n_c"),
          sum(when(col("t"), 1L).otherwise(0L)).as("n_t"),
          sum(when(!col("t"), col("y")).otherwise(0L)).as("sy_c"),
          sum(when(col("t"), col("y")).otherwise(0L)).as("sy_t"))
        .withColumn("mean_c",
          col("sy_c").cast(DoubleType) / col("n_c").cast(DoubleType))
        .withColumn("mean_t",
          col("sy_t").cast(DoubleType) / col("n_t").cast(DoubleType))
        .withColumn("diff", col("mean_t") - col("mean_c"))
        .persistTracked()
      val pooled = seg.agg(
          sum(col("n_c")).as("pn_c"), sum(col("n_t")).as("pn_t"),
          sum(col("sy_c")).as("psy_c"), sum(col("sy_t")).as("psy_t"),
          max(col("diff")).as("max_seg_diff"),
          min(col("diff")).as("min_seg_diff"))
        .withColumn("pooled_diff",
          col("psy_t").cast(DoubleType) / col("pn_t").cast(DoubleType) -
            col("psy_c").cast(DoubleType) / col("pn_c").cast(DoubleType))
        .withColumn("simpson_flag",
          (col("pooled_diff") > 0 && col("max_seg_diff") < 0) ||
            (col("pooled_diff") < 0 && col("min_seg_diff") > 0))
      seg.crossJoin(broadcast(
          pooled.select(col("pooled_diff"), col("simpson_flag"))))
        .select(col("segment"), col("n_c"), col("n_t"), col("mean_c"),
          col("mean_t"), col("diff"), col("pooled_diff"),
          col("simpson_flag"))
        .orderBy(col("segment"))
    },
    Some(s"""
      WITH base AS (
        SELECT o_orderpriority AS segment,
               CAST(substring(o_orderpriority, 1, 1) AS BIGINT) - 1
                 AS pi,
               (o_orderkey * 2654435761) % 100
                 < 20 + 15 * (CAST(substring(o_orderpriority, 1, 1)
                              AS BIGINT) - 1) AS t,
               c + (CAST(substring(o_orderpriority, 1, 1) AS BIGINT) - 1)
                     * (c // 3)
                 - CASE WHEN (o_orderkey * 2654435761) % 100
                             < 20 + 15 * (CAST(substring(o_orderpriority,
                                          1, 1) AS BIGINT) - 1)
                        THEN c // 3 ELSE 0 END AS y
        FROM (SELECT o_orderkey, o_orderpriority,
                     ${Det.centsSql("o_totalprice")} AS c
              FROM orders) o
      ), seg AS (
        SELECT segment,
               CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_c,
               CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_t,
               CAST(sum(CASE WHEN NOT t THEN y ELSE 0 END) AS BIGINT)
                 AS sy_c,
               CAST(sum(CASE WHEN t THEN y ELSE 0 END) AS BIGINT)
                 AS sy_t
        FROM base GROUP BY segment
      ), rates AS (
        SELECT segment, n_c, n_t,
               CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS mean_c,
               CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS mean_t,
               CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                 - CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS diff
        FROM seg
      ), pooled AS (
        SELECT CAST(sum(sy_t) AS DOUBLE) / CAST(sum(n_t) AS DOUBLE)
                 - CAST(sum(sy_c) AS DOUBLE) / CAST(sum(n_c) AS DOUBLE)
                 AS pooled_diff,
               (SELECT max(diff) FROM rates) AS max_seg_diff,
               (SELECT min(diff) FROM rates) AS min_seg_diff
        FROM seg
      )
      SELECT segment, n_c, n_t, mean_c, mean_t, diff, pooled_diff,
             (pooled_diff > 0 AND max_seg_diff < 0)
               OR (pooled_diff < 0 AND min_seg_diff > 0) AS simpson_flag
      FROM rates CROSS JOIN pooled
      ORDER BY segment"""))

  private val QteTaus = Seq(100, 250, 500, 750, 900) // permille

  /** q373: QUANTILE TREATMENT EFFECTS (Doksum 1974; Koenker &
    * Bassett 1978's quantile lens on a two-arm comparison — the
    * distributional A/B read that q346's mean test cannot see): the
    * per-τ difference between the arms' outcome quantiles. Dosed
    * heterogeneity by construction: treatment lifts ONLY orders above
    * the ≈median ($250k) (x div 10), so the QTE is ≈0 at low τ and ≈10% at high τ —
    * the exact pattern a mean read averages away. EXACT: quantiles are
    * percentile_cont over integer cents (binary-exact interpolation,
    * the A7/q04 discipline: Spark percentile() ↔ DuckDB
    * quantile_cont()); differences and ratios are identical-operand
    * doubles. Scale: two percentile aggregates over one scan; the τ
    * grid is metadata. */
  val q373 = Q(
    "q373_qte",
    (s, d) => {
      val base = Tables.load(s, d, "orders")
        .select(col("o_orderkey").as("k"),
          Det.cents(col("o_totalprice")).as("x"))
        .withColumn("t", expr("(k * 2654435761L) % 2 = 1"))
        .withColumn("y",
          col("x") + when(col("t") && col("x") > 25000000L,
            expr("x div 10")).otherwise(0L))
      val qCols = QteTaus.map(p =>
        expr(s"percentile(y, ${p / 1000.0}D)").as(s"q$p"))
      val perArm = base.groupBy(col("t")).agg(qCols.head, qCols.tail: _*)
      val c = perArm.filter(!col("t"))
        .select(QteTaus.map(p => col(s"q$p").as(s"qc$p")): _*)
      val tr = perArm.filter(col("t"))
        .select(QteTaus.map(p => col(s"q$p").as(s"qt$p")): _*)
      val structs = QteTaus.map(p =>
        s"struct(${p}L AS tau_permille, qc$p AS q_c, qt$p AS q_t)")
        .mkString(", ")
      c.crossJoin(broadcast(tr))
        .select(explode(expr(s"array($structs)")).as("r"))
        .select(col("r.tau_permille"), col("r.q_c"), col("r.q_t"))
        .withColumn("qte", col("q_t") - col("q_c"))
        .withColumn("qte_rel", (col("q_t") - col("q_c")) / col("q_c"))
        .orderBy(col("tau_permille"))
    },
    Some {
      val qs = QteTaus.map(p =>
        s"quantile_cont(y, ${p / 1000.0}) AS q$p").mkString(",\n               ")
      val rows = QteTaus.map(p => s"""
        SELECT CAST($p AS BIGINT) AS tau_permille,
               c.q$p AS q_c, t.q$p AS q_t
        FROM arms c, arms t WHERE c.t = false AND t.t = true""")
        .mkString(" UNION ALL ")
      s"""
      WITH base AS (
        SELECT (o_orderkey * 2654435761) % 2 = 1 AS t,
               x + CASE WHEN (o_orderkey * 2654435761) % 2 = 1
                             AND x > 25000000
                        THEN x // 10 ELSE 0 END AS y
        FROM (SELECT o_orderkey,
                     ${Det.centsSql("o_totalprice")} AS x
              FROM orders) o
      ), arms AS (
        SELECT t, $qs
        FROM base GROUP BY t
      )
      SELECT tau_permille, q_c, q_t,
             q_t - q_c AS qte,
             (q_t - q_c) / q_c AS qte_rel
      FROM ($rows) u
      ORDER BY tau_permille"""
    })

  /** q374: DELETE-ONE-GROUP (CLUSTER) JACKKNIFE for a ratio metric
    * (Tukey 1958; the grouped form is the standard error every
    * experimentation platform puts on revenue-per-order — a RATIO of
    * two sums, whose naive per-row variance is wrong because rows
    * within a market are correlated): leave out one customer nation at
    * a time, recompute θ₍ᵢ₎ = (T − tᵢ)/(N − nᵢ), and take
    * v = (g−1)/g · Σ(θ₍ᵢ₎ − θ̄)². EXACT: every θ₍ᵢ₎ is one division of
    * integer sums; the mean and the squared-deviation sum fold the ≤25
    * nation rows in FIXED name order (the q304 discipline), and the SE
    * is one sqrt. Scale: one rollup to |nations| rows; the jackknife
    * runs on that bounded table — never a per-row resample. */
  val q374 = Q(
    "q374_cluster_jackknife",
    (s, d) => {
      import graft.Caches.Tracked
      val per = Tables.load(s, d, "orders")
        .join(Tables.load(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.load(s, d, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_i"),
          sum(Det.cents(col("o_totalprice"))).as("t_i"))
        .persistTracked()
      val tot = per.agg(sum(col("n_i")).as("n_all"),
        sum(col("t_i")).as("t_all"), count(lit(1)).as("g"))
      val loo = per.crossJoin(broadcast(tot))
        .withColumn("theta_loo",
          (col("t_all") - col("t_i")).cast(DoubleType) /
            (col("n_all") - col("n_i")).cast(DoubleType))
        .persistTracked()
      val jack = loo.groupBy(col("g"), col("n_all"), col("t_all"))
        .agg(expr("aggregate(array_sort(collect_list(struct(n_name, " +
          "theta_loo))), CAST(0 AS DOUBLE), (acc, x) -> acc + " +
          "x.theta_loo)").as("sum_loo"))
        .withColumn("theta_bar", col("sum_loo") / col("g").cast(DoubleType))
      val v = loo.crossJoin(broadcast(
          jack.select(col("theta_bar"), col("g").as("g2"))))
        .withColumn("dev2",
          (col("theta_loo") - col("theta_bar")) *
            (col("theta_loo") - col("theta_bar")))
        .groupBy(col("g2"), col("theta_bar"))
        .agg(expr("aggregate(array_sort(collect_list(struct(n_name, " +
          "dev2))), CAST(0 AS DOUBLE), (acc, x) -> acc + x.dev2)")
          .as("ss"))
        .select(col("g2").as("g"), col("theta_bar"),
          sqrt((col("g2") - 1).cast(DoubleType) /
            col("g2").cast(DoubleType) * col("ss")).as("se_jack"))
      loo.select(col("n_name"), col("n_i"), col("t_i"), col("theta_loo"),
          (col("t_all").cast(DoubleType) / col("n_all").cast(DoubleType))
            .as("theta"))
        .crossJoin(broadcast(v.select(col("theta_bar"), col("se_jack"))))
        .orderBy(col("n_name"))
    },
    Some(s"""
      WITH per AS (
        SELECT n_name, count(*) AS n_i,
               CAST(sum(${Det.centsSql("o_totalprice")}) AS BIGINT)
                 AS t_i
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
      ), tot AS (
        SELECT CAST(sum(n_i) AS BIGINT) AS n_all,
               CAST(sum(t_i) AS BIGINT) AS t_all,
               count(*) AS g
        FROM per
      ), loo AS (
        SELECT n_name, n_i, t_i,
               CAST(t_all - t_i AS DOUBLE)
                 / CAST(n_all - n_i AS DOUBLE) AS theta_loo,
               n_all, t_all, g
        FROM per CROSS JOIN tot
      ), jack AS (
        SELECT g,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(theta_loo ORDER BY n_name)),
                 (acc, x) -> acc + x) / CAST(g AS DOUBLE) AS theta_bar
        FROM loo GROUP BY g
      ), v AS (
        SELECT j.theta_bar,
               sqrt(CAST(l.g - 1 AS DOUBLE) / CAST(l.g AS DOUBLE)
                 * list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list((l.theta_loo - j.theta_bar)
                          * (l.theta_loo - j.theta_bar)
                          ORDER BY l.n_name)),
                   (acc, x) -> acc + x)) AS se_jack
        FROM loo l CROSS JOIN jack j
        GROUP BY j.theta_bar, l.g
      )
      SELECT l.n_name, l.n_i, l.t_i, l.theta_loo,
             CAST(l.t_all AS DOUBLE) / CAST(l.n_all AS DOUBLE) AS theta,
             v.theta_bar, v.se_jack
      FROM loo l CROSS JOIN v
      ORDER BY l.n_name"""))

  /** q375: HOLM STEP-DOWN FWER CONTROL (Holm 1979) — the
    * FAMILY-WISE-error sibling of q350's BH step-up, run on the SAME
    * dosed (source × lang) p-value grid so the two corrections are
    * directly comparable: reject the sorted prefix while
    * p₍ₖ₎ ≤ α/(m−k+1), stop at the FIRST failure (step-down — unlike
    * BH, nothing after the first surviving null is rejected). ALL
    * INTEGERS: the test is p_k·(m−k+1) ≤ 50 cross-multiplied in
    * permille, the stop rank is a bounded aggregate. The spec pins the
    * textbook sandwich Bonferroni ⊆ Holm ⊆ BH. Scale: a |tests|-row
    * grid, one rank window (q350's shape). */
  val q375 = Q(
    "q375_holm_fwer",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val u = hex24Sql("concat(source, ':', lang)")
      val tests = Tables.load(s, d, "documents")
        .select(col("source"), col("lang")).distinct()
        .withColumn("p_permille",
          expr(s"CASE WHEN $u % 7 = 0 THEN $u % 5 ELSE $u % 1000 END"))
      val m = tests.agg(count(lit(1)).as("m"))
      val ranked = tests.crossJoin(broadcast(m))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("p_permille"), col("source"), col("lang")))
          .cast(LongType))
        .withColumn("holm_ok",
          col("p_permille") * (col("m") - col("rnk") + 1) <= lit(50L))
      val firstFail = ranked.agg(
        coalesce(min(when(!col("holm_ok"), col("rnk"))),
          max(col("rnk")) + 1).as("first_fail"))
      ranked.crossJoin(broadcast(firstFail))
        .select(col("source"), col("lang"), col("p_permille"),
          col("rnk"), col("m"), col("holm_ok"),
          (col("rnk") < col("first_fail")).as("rejected"),
          (col("p_permille") * col("m") <= lit(50L))
            .as("bonferroni_reject"))
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH tests AS (
        SELECT source, lang,
               CASE WHEN ${hex24Sql("concat(source, ':', lang)")} % 7 = 0
                    THEN ${hex24Sql("concat(source, ':', lang)")} % 5
                    ELSE ${hex24Sql("concat(source, ':', lang)")} % 1000
               END AS p_permille
        FROM (SELECT DISTINCT source, lang FROM documents) g
      ), m AS (
        SELECT count(*) AS m FROM tests
      ), ranked AS (
        SELECT source, lang, p_permille, m,
               CAST(row_number() OVER (ORDER BY p_permille, source, lang)
                 AS BIGINT) AS rnk,
               p_permille * (m - CAST(row_number()
                 OVER (ORDER BY p_permille, source, lang) AS BIGINT) + 1)
                 <= 50 AS holm_ok
        FROM tests, m
      ), ff AS (
        SELECT coalesce(min(CASE WHEN NOT holm_ok THEN rnk END),
                        max(rnk) + 1) AS first_fail
        FROM ranked
      )
      SELECT source, lang, p_permille, rnk, m, holm_ok,
             rnk < first_fail AS rejected,
             p_permille * m <= 50 AS bonferroni_reject
      FROM ranked, ff
      ORDER BY rnk"""))

  // ---------------------------------------------------------------- NLG
  // Shared reference/candidate construction for the BLEU/ROUGE family
  // (q380/q381/q382): ONE definition per fragment, rendered for both
  // engines (the segWindowsExpr discipline — hand-synced copies
  // desynchronize). The fixtures carry no model outputs, so the
  // candidate is DOSED deterministically from the reference tokens:
  //  - "insert" mode (BLEU): substitutions on the (doc_id + 17i) % 7
  //    lattice (each replaced by the doc's FIRST token, creating the
  //    repeated-word excess that makes CLIPPED counts load-bearing)
  //    plus doc_id % 3 + 1 appended copies of the first token — the
  //    candidate is NEVER shorter than the reference, so the corpus
  //    brevity penalty is exactly 1 (exp() is libm-divergent across
  //    engines and is deliberately kept out of the oracle surface; the
  //    brevity RATIO is still reported).
  //  - "drop" mode (ROUGE): the same substitution lattice plus token
  //    DROPS on the (doc_id + 13i) % 5 lattice — recall genuinely
  //    differs from precision and LCS from unigram overlap.

  /** Reference tokens: whitespace split, empties dropped. */
  private def refToks(dialect: String): String =
    if (dialect == "spark") "filter(split(text, ' '), w -> length(w) > 0)"
    else "list_filter(string_split(text, ' '), w -> len(w) > 0)"

  /** Dosed candidate over a bound token-array column `ref`. Both
    * dialects are guarded against an EMPTY reference: Spark's
    * `sequence(1, 0)` is the DESCENDING [1, 0] (not the empty range
    * DuckDB's `range(1, 1)` gives), and DuckDB's insert-mode
    * `list_concat([], [NULL, …])` would emit NULL tokens — a
    * zero-token document must yield an empty candidate in BOTH
    * engines. The fixtures guarantee ≥10 tokens per doc today; this
    * keeps the fragment correct if an empty text ever enters. */
  private def candToks(dialect: String, mode: String, ref: String = "ref")
      : String =
    if (dialect == "spark") {
      val subbed =
        s"""transform(sequence(1, size($ref)), i ->
           |  CASE WHEN (doc_id + i * 13) % 5 = 0 AND '$mode' = 'drop'
           |         THEN CAST(NULL AS STRING)
           |       WHEN (doc_id + i * 17) % 7 = 0 THEN element_at($ref, 1)
           |       ELSE element_at($ref, i) END)""".stripMargin
      val body =
        if (mode == "drop") s"filter($subbed, x -> x IS NOT NULL)"
        else
          s"""concat($subbed,
             |  transform(sequence(1, CAST(doc_id % 3 + 1 AS INT)),
             |    i -> element_at($ref, 1)))""".stripMargin
      s"""CASE WHEN size($ref) > 0 THEN $body
         |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin
    } else {
      val subbed =
        s"""list_transform(range(1, len($ref) + 1), i ->
           |  CASE WHEN (doc_id + i * 13) % 5 = 0 AND '$mode' = 'drop'
           |         THEN CAST(NULL AS VARCHAR)
           |       WHEN (doc_id + i * 17) % 7 = 0 THEN $ref[1]
           |       ELSE $ref[i] END)""".stripMargin
      val body =
        if (mode == "drop") s"list_filter($subbed, x -> x IS NOT NULL)"
        else
          s"""list_concat($subbed,
             |  list_transform(range(1, doc_id % 3 + 2), i -> $ref[1]))"""
            .stripMargin
      s"""CASE WHEN len($ref) > 0 THEN $body
         |ELSE CAST([] AS VARCHAR[]) END""".stripMargin
    }

  /** n-grams of a bound token-array column as space-joined strings, one
    * SQL fragment per engine; empty when the array is shorter than n. */
  private def ngrams(dialect: String, t: String, n: Int): String =
    if (dialect == "spark")
      s"""CASE WHEN size($t) >= $n
         |THEN transform(sequence(1, size($t) - $n + 1), i ->
         |       array_join(slice($t, i, $n), ' '))
         |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin
    else
      s"""CASE WHEN len($t) >= $n
         |THEN list_transform(range(1, len($t) - $n + 2), i ->
         |       array_to_string($t[i:i+$n-1], ' '))
         |ELSE CAST([] AS VARCHAR[]) END""".stripMargin

  /** q380: CORPUS BLEU (Papineni et al. 2002, "BLEU: a Method for
    * Automatic Evaluation of Machine Translation") — the canonical NLG
    * eval the data pipeline publishes beside pass@k/BT: modified n-gram
    * precisions p₁..p₄ with per-gram counts CLIPPED at the reference
    * count (the clipping is exercised: the dose repeats the first
    * token, so candidate counts exceed reference counts exactly where
    * the lattice fires), corpus-summed numerators/denominators (never
    * per-sentence averages — the Papineni corpus form), and the
    * geometric mean computed WITHOUT pow(): (p₁p₂p₃p₄)^¼ =
    * sqrt(sqrt(·)) and IEEE-754 sqrt is correctly rounded in both
    * engines (the q341 c^(3/4) trick), so the iterated doubles
    * bit-agree. The brevity penalty is exactly 1 by dose construction
    * (candidate ≥ reference per doc — see candToks); exp() never enters
    * the oracle surface and the brevity ratio column keeps the check
    * honest. EXACT: every numerator/denominator is an integer sum; each
    * pₙ is ONE IEEE division of identical operands. Scale: n-gram
    * expansion is linear in corpus tokens (4 passes), the clip join is
    * keyed by (doc, n, gram) — partition-local after one shuffle; the
    * report is ONE row however large the corpus. */
  val q380 = Q(
    "q380_bleu",
    (s, d) => {
      import graft.Caches.Tracked
      val toks = Tables.load(s, d, "documents")
        .select(col("doc_id"), expr(refToks("spark")).as("ref"))
        .withColumn("cand", expr(candToks("spark", "insert")))
        .persistTracked()
      def grams(side: String) =
        (1 to 4).map { n =>
          toks.select(col("doc_id"), lit(n).as("n"),
            explode(expr(ngrams("spark", side, n))).as("gram"))
        }.reduce(_ unionAll _)
          .groupBy(col("doc_id"), col("n"), col("gram"))
          .agg(count(lit(1)).as(s"cnt_$side"))
      val clip = grams("cand")
        .join(grams("ref"), Seq("doc_id", "n", "gram"))
        .groupBy(col("n"))
        .agg(sum(least(col("cnt_cand"), col("cnt_ref"))).as("num"))
      val dens = toks
        .select(col("doc_id"), col("ref"), col("cand"),
          explode(expr("array(1, 2, 3, 4)")).as("n"))
        .groupBy(col("n"))
        .agg(
          sum(greatest(size(col("cand")) - col("n") + 1, lit(0))
            .cast(LongType)).as("den"),
          sum(size(col("cand")).cast(LongType)).as("c_len"),
          sum(size(col("ref")).cast(LongType)).as("r_len"))
      dens.join(clip, Seq("n"))
        .withColumn("p", col("num").cast(DoubleType) /
          col("den").cast(DoubleType))
        .agg(
          max(when(col("n") === 1, col("c_len"))).as("c_len"),
          max(when(col("n") === 1, col("r_len"))).as("r_len"),
          max(when(col("n") === 1, col("p"))).as("p1"),
          max(when(col("n") === 2, col("p"))).as("p2"),
          max(when(col("n") === 3, col("p"))).as("p3"),
          max(when(col("n") === 4, col("p"))).as("p4"))
        .select(
          col("c_len"), col("r_len"),
          (col("c_len").cast(DoubleType) / col("r_len").cast(DoubleType))
            .as("brevity_ratio"),
          col("p1"), col("p2"), col("p3"), col("p4"),
          sqrt(sqrt(col("p1") * col("p2") * col("p3") * col("p4")))
            .as("bleu"))
    },
    Some {
      val gramBranches = (side: String) => (1 to 4).map { n =>
        s"""SELECT doc_id, $n AS n,
           |       unnest(${ngrams("duck", side, n)}) AS gram
           |FROM toks""".stripMargin
      }.mkString(" UNION ALL ")
      s"""
      WITH toks0 AS (
        SELECT doc_id, ${refToks("duck")} AS ref
        FROM documents
      ), toks AS (
        SELECT doc_id, ref, ${candToks("duck", "insert")} AS cand
        FROM toks0
      ), cand_g AS (
        SELECT doc_id, n, gram, count(*) AS cnt_cand
        FROM (${gramBranches("cand")}) g GROUP BY doc_id, n, gram
      ), ref_g AS (
        SELECT doc_id, n, gram, count(*) AS cnt_ref
        FROM (${gramBranches("ref")}) g GROUP BY doc_id, n, gram
      ), clip AS (
        SELECT c.n, CAST(sum(least(c.cnt_cand, r.cnt_ref)) AS BIGINT)
                 AS num
        FROM cand_g c
        JOIN ref_g r ON r.doc_id = c.doc_id AND r.n = c.n
                    AND r.gram = c.gram
        GROUP BY c.n
      ), dens AS (
        SELECT n.n,
               CAST(sum(greatest(len(cand) - n.n + 1, 0)) AS BIGINT)
                 AS den,
               CAST(sum(len(cand)) AS BIGINT) AS c_len,
               CAST(sum(len(ref)) AS BIGINT) AS r_len
        FROM toks CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS n) n
        GROUP BY n.n
      ), per_n AS (
        SELECT d.n, d.c_len, d.r_len,
               CAST(c.num AS DOUBLE) / CAST(d.den AS DOUBLE) AS p
        FROM dens d JOIN clip c ON c.n = d.n
      ), wide AS (
        SELECT max(CASE WHEN n = 1 THEN c_len END) AS c_len,
               max(CASE WHEN n = 1 THEN r_len END) AS r_len,
               max(CASE WHEN n = 1 THEN p END) AS p1,
               max(CASE WHEN n = 2 THEN p END) AS p2,
               max(CASE WHEN n = 3 THEN p END) AS p3,
               max(CASE WHEN n = 4 THEN p END) AS p4
        FROM per_n
      )
      SELECT c_len, r_len,
             CAST(c_len AS DOUBLE) / CAST(r_len AS DOUBLE)
               AS brevity_ratio,
             p1, p2, p3, p4,
             sqrt(sqrt(p1 * p2 * p3 * p4)) AS bleu
      FROM wide"""
    })

  /** q381: ROUGE-1/ROUGE-2 (Lin 2004, "ROUGE: A Package for Automatic
    * Evaluation of Summaries") — the recall-oriented complement of
    * q380's BLEU, per source × n ∈ {1,2}: clipped n-gram matches over
    * the REFERENCE gram total (recall, the headline ROUGE number),
    * over the CANDIDATE total (precision), and their harmonic F
    * ((2·P)·R/(P+R), identical association both engines). The
    * candidate uses the DROP dose (candToks "drop"): substitutions
    * depress precision, token drops depress recall — the two columns
    * genuinely decouple. EXACT: integer match/total sums per
    * (source, n); P and R are single IEEE divisions, F is the same
    * three flops on identical doubles. Scale: the same linear n-gram
    * expansion and (doc, n, gram)-keyed clip join as q380; the report
    * is |sources|·2 rows. */
  val q381 = Q(
    "q381_rouge_n",
    (s, d) => {
      import graft.Caches.Tracked
      val toks = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"),
          expr(refToks("spark")).as("ref"))
        .withColumn("cand", expr(candToks("spark", "drop")))
        .persistTracked()
      def grams(side: String) =
        (1 to 2).map { n =>
          toks.select(col("source"), col("doc_id"), lit(n).as("n"),
            explode(expr(ngrams("spark", side, n))).as("gram"))
        }.reduce(_ unionAll _)
          .groupBy(col("source"), col("doc_id"), col("n"), col("gram"))
          .agg(count(lit(1)).as(s"cnt_$side"))
      val clip = grams("cand")
        .join(grams("ref").drop("source"), Seq("doc_id", "n", "gram"))
        .groupBy(col("source"), col("n"))
        .agg(sum(least(col("cnt_cand"), col("cnt_ref")))
          .as("match_grams"))
      val totals = toks
        .select(col("source"), col("ref"), col("cand"),
          explode(expr("array(1, 2)")).as("n"))
        .groupBy(col("source"), col("n"))
        .agg(
          sum(greatest(size(col("cand")) - col("n") + 1, lit(0))
            .cast(LongType)).as("cand_grams"),
          sum(greatest(size(col("ref")) - col("n") + 1, lit(0))
            .cast(LongType)).as("ref_grams"))
      totals.join(clip, Seq("source", "n"))
        .withColumn("rouge_p", col("match_grams").cast(DoubleType) /
          col("cand_grams").cast(DoubleType))
        .withColumn("rouge_r", col("match_grams").cast(DoubleType) /
          col("ref_grams").cast(DoubleType))
        .withColumn("rouge_f",
          when(col("rouge_p") + col("rouge_r") === 0.0, lit(0.0))
            .otherwise((lit(2.0) * col("rouge_p")) * col("rouge_r") /
              (col("rouge_p") + col("rouge_r"))))
        .select(col("source"), col("n").cast(LongType).as("n"),
          col("match_grams"), col("cand_grams"), col("ref_grams"),
          col("rouge_p"), col("rouge_r"), col("rouge_f"))
        .orderBy(col("source"), col("n"))
    },
    Some {
      val gramBranches = (side: String) => (1 to 2).map { n =>
        s"""SELECT source, doc_id, $n AS n,
           |       unnest(${ngrams("duck", side, n)}) AS gram
           |FROM toks""".stripMargin
      }.mkString(" UNION ALL ")
      s"""
      WITH toks0 AS (
        SELECT doc_id, source, ${refToks("duck")} AS ref
        FROM documents
      ), toks AS (
        SELECT doc_id, source, ref,
               ${candToks("duck", "drop")} AS cand
        FROM toks0
      ), cand_g AS (
        SELECT source, doc_id, n, gram, count(*) AS cnt_cand
        FROM (${gramBranches("cand")}) g GROUP BY source, doc_id, n, gram
      ), ref_g AS (
        SELECT doc_id, n, gram, count(*) AS cnt_ref
        FROM (${gramBranches("ref")}) g GROUP BY doc_id, n, gram
      ), clip AS (
        SELECT c.source, c.n,
               CAST(sum(least(c.cnt_cand, r.cnt_ref)) AS BIGINT)
                 AS match_grams
        FROM cand_g c
        JOIN ref_g r ON r.doc_id = c.doc_id AND r.n = c.n
                    AND r.gram = c.gram
        GROUP BY c.source, c.n
      ), totals AS (
        SELECT source, n.n,
               CAST(sum(greatest(len(cand) - n.n + 1, 0)) AS BIGINT)
                 AS cand_grams,
               CAST(sum(greatest(len(ref) - n.n + 1, 0)) AS BIGINT)
                 AS ref_grams
        FROM toks CROSS JOIN (SELECT unnest([1, 2]) AS n) n
        GROUP BY source, n.n
      )
      SELECT t.source, CAST(t.n AS BIGINT) AS n, c.match_grams,
             t.cand_grams, t.ref_grams,
             CAST(c.match_grams AS DOUBLE) / CAST(t.cand_grams AS DOUBLE)
               AS rouge_p,
             CAST(c.match_grams AS DOUBLE) / CAST(t.ref_grams AS DOUBLE)
               AS rouge_r,
             CASE WHEN CAST(c.match_grams AS DOUBLE)
                         / CAST(t.cand_grams AS DOUBLE)
                       + CAST(c.match_grams AS DOUBLE)
                         / CAST(t.ref_grams AS DOUBLE) = 0
                  THEN CAST(0 AS DOUBLE)
                  ELSE (CAST(2 AS DOUBLE)
                          * (CAST(c.match_grams AS DOUBLE)
                             / CAST(t.cand_grams AS DOUBLE)))
                       * (CAST(c.match_grams AS DOUBLE)
                          / CAST(t.ref_grams AS DOUBLE))
                       / (CAST(c.match_grams AS DOUBLE)
                            / CAST(t.cand_grams AS DOUBLE)
                          + CAST(c.match_grams AS DOUBLE)
                            / CAST(t.ref_grams AS DOUBLE)) END
               AS rouge_f
      FROM totals t JOIN clip c ON c.source = t.source AND c.n = t.n
      ORDER BY t.source, t.n"""
    })

  /** q382: ROUGE-L VIA LONGEST COMMON SUBSEQUENCE (Lin 2004 §3.1) over
    * a bounded eval panel (doc_id < 60, tokens capped at 40 — the
    * q304/q355 panel discipline: LCS is inherently O(n·m) PER PAIR and
    * belongs on a panel, not the corpus; corpus-scale overlap uses
    * q381's linear n-gram form). The DP row recurrence
    * new[j] = max(new[j−1], A[j], A[j−1]+eq_j) carries an intra-row
    * sequential dependency that neither engine's lambda surface can
    * fold directly — but LCS DP rows are MONOTONE NONDECREASING in j
    * (induction on j), so max_{k<j} A[k] = A[j−1] ≤ A[j] and the
    * recurrence unrolls to the carry-free form
    *   new[j] = max(A[j], max_{k≤j}(A[k−1] + eq_k))
    * — a prefix max computable by a nested transform (O(m²) per
    * candidate token, bounded by the panel cap). Spark folds candidate
    * tokens with aggregate(); the DuckDB twin advances the SAME row
    * one candidate token per WITH RECURSIVE step (list_reduce cannot
    * carry a LIST accumulator over VARCHAR elements — its accumulator
    * type must equal the element type). EXACT: the DP is all-integer;
    * P/R/F are the q381 divisions on identical operands. */
  val q382 = Q(
    "q382_rouge_l",
    (s, d) => {
      val panel = Tables.load(s, d, "documents")
        .filter(col("doc_id") < 60)
        .select(col("doc_id"),
          expr(s"slice(${refToks("spark")}, 1, 40)").as("r"))
        .withColumn("c", expr(candToks("spark", "drop", "r")))
      panel
        .withColumn("lcs", expr(
          """element_at(
            |  aggregate(c,
            |    transform(sequence(0, size(r)), j -> CAST(0 AS BIGINT)),
            |    (row, ct) -> concat(array(CAST(0 AS BIGINT)),
            |      transform(sequence(1, size(r)), j ->
            |        greatest(element_at(row, j + 1),
            |          array_max(transform(sequence(1, j), k ->
            |            element_at(row, k) +
            |            IF(ct = element_at(r, k),
            |               CAST(1 AS BIGINT), CAST(0 AS BIGINT)))))))),
            |  size(r) + 1)""".stripMargin))
        .select(col("doc_id"),
          size(col("r")).cast(LongType).as("len_r"),
          size(col("c")).cast(LongType).as("len_c"),
          col("lcs"))
        .withColumn("rouge_l_p", col("lcs").cast(DoubleType) /
          col("len_c").cast(DoubleType))
        .withColumn("rouge_l_r", col("lcs").cast(DoubleType) /
          col("len_r").cast(DoubleType))
        .withColumn("rouge_l_f",
          when(col("rouge_l_p") + col("rouge_l_r") === 0.0, lit(0.0))
            .otherwise((lit(2.0) * col("rouge_l_p")) * col("rouge_l_r") /
              (col("rouge_l_p") + col("rouge_l_r"))))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE toks0 AS (
        SELECT doc_id, ${refToks("duck")} AS ref
        FROM documents WHERE doc_id < 60
      ), panel AS (
        SELECT doc_id, r, ${candToks("duck", "drop", "r")} AS c
        FROM (SELECT doc_id, ref[1:40] AS r FROM toks0) capped
      ), lcs AS (
        SELECT doc_id, 0 AS i,
               list_transform(range(0, len(r) + 1),
                 x -> CAST(0 AS BIGINT)) AS row
        FROM panel
        UNION ALL
        SELECT l.doc_id, l.i + 1,
               list_concat([CAST(0 AS BIGINT)],
                 list_transform(range(1, CAST(len(p.r) AS BIGINT) + 1),
                   j -> greatest(l.row[j + 1],
                     list_aggregate(list_transform(range(1, j + 1), k ->
                       l.row[k] + CASE WHEN p.c[l.i + 1] = p.r[k]
                                       THEN CAST(1 AS BIGINT)
                                       ELSE CAST(0 AS BIGINT) END),
                       'max'))))
        FROM lcs l JOIN panel p USING (doc_id)
        WHERE l.i < len(p.c)
      ), final AS (
        SELECT l.doc_id,
               CAST(len(p.r) AS BIGINT) AS len_r,
               CAST(len(p.c) AS BIGINT) AS len_c,
               l.row[len(p.r) + 1] AS lcs
        FROM lcs l JOIN panel p USING (doc_id)
        WHERE l.i = len(p.c)
      )
      SELECT doc_id, len_r, len_c, lcs,
             CAST(lcs AS DOUBLE) / CAST(len_c AS DOUBLE) AS rouge_l_p,
             CAST(lcs AS DOUBLE) / CAST(len_r AS DOUBLE) AS rouge_l_r,
             CASE WHEN CAST(lcs AS DOUBLE) / CAST(len_c AS DOUBLE)
                       + CAST(lcs AS DOUBLE) / CAST(len_r AS DOUBLE) = 0
                  THEN CAST(0 AS DOUBLE)
                  ELSE (CAST(2 AS DOUBLE)
                          * (CAST(lcs AS DOUBLE) / CAST(len_c AS DOUBLE)))
                       * (CAST(lcs AS DOUBLE) / CAST(len_r AS DOUBLE))
                       / (CAST(lcs AS DOUBLE) / CAST(len_c AS DOUBLE)
                          + CAST(lcs AS DOUBLE) / CAST(len_r AS DOUBLE))
                  END AS rouge_l_f
      FROM final
      ORDER BY doc_id"""))

  /** Expected-score lookup for q383: E_pct(d) for rating differences
    * d = −400..400 points in 25-point buckets (33 entries). Generated
    * ONCE at registration from the logistic 100/(1+10^(−d/400)) and
    * emitted as the SAME integer literals into both engines (the
    * q356 z-sum-literal discipline — pow() never runs inside either
    * engine). Antisymmetry is BY CONSTRUCTION (E(−d) := 100 − E(d)),
    * so the two sides of every update cancel exactly and total rating
    * is conserved. */
  private val eloTab: Seq[Long] = {
    val pos = (0 to 16).map(i =>
      math.round(100.0 / (1 + math.pow(10, -(i * 25) / 400.0))))
    (-16 to 16).map(t => if (t < 0) 100L - pos(-t) else pos(t))
  }

  /** q383: TABLE-DRIVEN ELO RATINGS OVER AN ORDERED MATCH LOG (Elo
    * 1978; the FIDE rating regulations compute expected scores from a
    * published conversion TABLE, not a live logistic — exactly the
    * spelling that makes sequential Elo oracle-stable here). The
    * arena-style ONLINE complement of q304's order-free Bradley–Terry
    * MM: ratings update match by match (K=16), so the fold order IS
    * the semantics. ALL-INTEGER: ratings in centipoints, expected
    * scores in percent from [[eloTab]] (bucketed at 25 points,
    * clamped at ±400), outcomes in {0,50,100}, so every update is
    * delta = 16·(s − E) centipoints with zero libm anywhere; the
    * zero-sum invariant Σratings = 5·100000 holds exactly (table
    * antisymmetry). Dosed: matchups a = id%5 vs b = (id÷7)%5, the
    * higher-index model favored, upsets on (id·2654435761)%20 < 3 and
    * draws at = 3 — so ratings order by strength but with real
    * variance. Sequential by definition → BOUNDED PANEL (doc_id < 500,
    * the q304/q355 discipline); corpus-scale preference aggregation is
    * q304. Spark folds a sorted collect_list; the DuckDB twin replays
    * the SAME update one match per WITH RECURSIVE step. */
  val q383 = Q(
    "q383_elo_ratings",
    (s, d) => {
      import graft.Caches.Tracked
      val matches = Tables.load(s, d, "documents")
        .filter(col("doc_id") < 500)
        .select(col("doc_id"),
          expr("doc_id % 5").as("a"),
          expr("(doc_id div 7) % 5").as("b"),
          expr("(doc_id * 2654435761L) % 20").as("u"))
        .filter(col("a") =!= col("b"))
        .withColumn("s_pct", expr(
          """CASE WHEN u = 3 THEN CAST(50 AS BIGINT)
            |     WHEN (a > b AND u >= 4) OR (a < b AND u < 3)
            |       THEN CAST(100 AS BIGINT)
            |     ELSE CAST(0 AS BIGINT) END""".stripMargin))
        .persistTracked()
      val tabSpark =
        "array(" + eloTab.map(v => s"CAST($v AS BIGINT)").mkString(", ") +
          ")"
      val delta =
        s"""(16 * (m.s_pct - element_at($tabSpark,
           |  CAST((greatest(least(
           |    element_at(st, CAST(m.a + 1 AS INT)) -
           |    element_at(st, CAST(m.b + 1 AS INT)), 40000), -40000)
           |    + 41250) div 2500 AS INT) + 1)))""".stripMargin
      val folded = matches
        .agg(expr(
          s"""aggregate(
             |  array_sort(collect_list(struct(doc_id, a, b, s_pct))),
             |  transform(sequence(1, 5), p -> CAST(100000 AS BIGINT)),
             |  (st, m) -> transform(sequence(1, 5), p ->
             |    CASE WHEN p = m.a + 1 THEN element_at(st, p) + $delta
             |         WHEN p = m.b + 1 THEN element_at(st, p) - $delta
             |         ELSE element_at(st, p) END))""".stripMargin)
          .as("ratings"))
        .select(posexplode(col("ratings")).as(Seq("p", "rating_cp")))
        .select(col("p").cast(LongType).as("model"), col("rating_cp"))
      val sides = matches.select(col("a").as("model"),
        when(col("s_pct") === 100, 1L).otherwise(0L).as("win"),
        when(col("s_pct") === 50, 1L).otherwise(0L).as("draw"))
        .unionAll(matches.select(col("b").as("model"),
          when(col("s_pct") === 0, 1L).otherwise(0L).as("win"),
          when(col("s_pct") === 50, 1L).otherwise(0L).as("draw")))
        .groupBy(col("model"))
        .agg(count(lit(1)).as("games"), sum(col("win")).as("wins"),
          sum(col("draw")).as("draws"))
      folded.join(sides, Seq("model"))
        .select(col("model"), col("games"), col("wins"), col("draws"),
          col("rating_cp"),
          (col("rating_cp").cast(DoubleType) / lit(100.0)).as("rating"))
        .orderBy(col("model"))
    },
    Some {
      val tabDuck = "[" + eloTab.map(v => s"CAST($v AS BIGINT)")
        .mkString(", ") + "]"
      val delta =
        s"""(16 * (m.s_pct - $tabDuck[
           |  CAST((greatest(least(e.r[CAST(m.a + 1 AS INT)]
           |    - e.r[CAST(m.b + 1 AS INT)], 40000), -40000)
           |    + 41250) // 2500 AS INT) + 1]))""".stripMargin
      s"""
      WITH RECURSIVE raw AS (
        SELECT doc_id, doc_id % 5 AS a, (doc_id // 7) % 5 AS b,
               (doc_id * 2654435761) % 20 AS u
        FROM documents WHERE doc_id < 500
      ), matches AS (
        SELECT row_number() OVER (ORDER BY doc_id) AS i, a, b,
               CASE WHEN u = 3 THEN CAST(50 AS BIGINT)
                    WHEN (a > b AND u >= 4) OR (a < b AND u < 3)
                      THEN CAST(100 AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS s_pct
        FROM raw WHERE a <> b
      ), n AS (
        SELECT count(*) AS n FROM matches
      ), elo AS (
        SELECT 0 AS i,
               list_transform(range(1, 6),
                 p -> CAST(100000 AS BIGINT)) AS r
        UNION ALL
        SELECT e.i + 1,
               list_transform(range(1, 6), p ->
                 CASE WHEN p = m.a + 1 THEN e.r[p] + $delta
                      WHEN p = m.b + 1 THEN e.r[p] - $delta
                      ELSE e.r[p] END)
        FROM elo e JOIN matches m ON m.i = e.i + 1
      ), finalr AS (
        SELECT unnest(r) AS rating_cp,
               generate_subscripts(r, 1) AS p
        FROM elo, n WHERE elo.i = n.n
      ), sides AS (
        SELECT model, count(*) AS games,
               CAST(sum(win) AS BIGINT) AS wins,
               CAST(sum(draw) AS BIGINT) AS draws
        FROM (
          SELECT a AS model,
                 CASE WHEN s_pct = 100 THEN 1 ELSE 0 END AS win,
                 CASE WHEN s_pct = 50 THEN 1 ELSE 0 END AS draw
          FROM matches
          UNION ALL
          SELECT b AS model,
                 CASE WHEN s_pct = 0 THEN 1 ELSE 0 END AS win,
                 CASE WHEN s_pct = 50 THEN 1 ELSE 0 END AS draw
          FROM matches
        ) two GROUP BY model
      )
      SELECT CAST(f.p - 1 AS BIGINT) AS model, s.games, s.wins, s.draws,
             f.rating_cp,
             CAST(f.rating_cp AS DOUBLE) / CAST(100 AS DOUBLE) AS rating
      FROM finalr f JOIN sides s ON s.model = f.p - 1
      ORDER BY model"""
    })

  /** q387: CRAMÉR–VON MISES TWO-SAMPLE TEST (Anderson 1962, "On the
    * Distribution of the Two-Sample Cramer-von Mises Criterion") — the
    * INTEGRATED-ECDF complement of q326's KS: KS reads only the single
    * largest ECDF gap, CvM sums the squared gap over the whole pooled
    * sample, so it sees many small, spread-out differences KS misses.
    * With pooled values grouped (ties exact in both engines) and
    * cumulative arm counts a_i (n total), b_i (m total):
    *   T = Σ_i cnt_i·(a_i·m − b_i·n)² / (n·m·(n+m)²)
    * — an ALL-INTEGER numerator and denominator (bounded by the panel:
    * cnt·(a·m−b·n)² ≤ (n+m)·(n·m)² ≈ 2·10¹⁵ at the 2000-doc cap) and
    * ONE division; reject at the α=.05 critical value 0.461. Run as a
    * dosed/control differential on one panel (the q239 discipline):
    * the dosed variant shifts arm-1 n_chars by +100 (T ≥ 3.0 at every
    * SF), the A/A control leaves the split untouched (T ≤ 0.33) — the
    * gate separates deterministically (parameter-swept). Panel-bounded
    * because the exact statistic needs the pooled cumulative walk;
    * corpus-scale screening is q326's GlobalOrder KS. */
  val q387 = Q(
    "q387_cvm_test",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.load(s, d, "documents")
        .filter(col("doc_id") < 2000)
        .select(col("doc_id"), col("n_chars"),
          expr("(doc_id * 2654435761L) % 2").as("arm"))
      val panel = base.select(lit("dosed").as("variant"),
        (col("n_chars") + when(col("arm") === 1, 100L).otherwise(0L))
          .as("v"), col("arm"))
        .unionAll(base.select(lit("control").as("variant"),
          col("n_chars").as("v"), col("arm")))
      val byValue = panel
        .groupBy(col("variant"), col("v"))
        .agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("c0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("c1"))
      val w = Window.partitionBy(col("variant")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("variant"))
      byValue
        .withColumn("a", sum(col("c0")).over(w))
        .withColumn("b", sum(col("c1")).over(w))
        .withColumn("n", sum(col("c0")).over(wAll))
        .withColumn("m", sum(col("c1")).over(wAll))
        .groupBy(col("variant"))
        .agg(
          max(col("n")).as("n"), max(col("m")).as("m"),
          sum((col("c0") + col("c1")) *
            (col("a") * col("m") - col("b") * col("n")) *
            (col("a") * col("m") - col("b") * col("n"))).as("s_num"))
        .select(col("variant"), col("n"), col("m"), col("s_num"),
          (col("s_num").cast(DoubleType) /
            (col("n") * col("m") * (col("n") + col("m")) *
              (col("n") + col("m"))).cast(DoubleType)).as("t_stat"))
        .withColumn("reject_05", col("t_stat") > 0.461)
        .orderBy(col("variant"))
    },
    Some("""
      WITH base AS (
        SELECT doc_id, n_chars, (doc_id * 2654435761) % 2 AS arm
        FROM documents WHERE doc_id < 2000
      ), panel AS (
        SELECT 'dosed' AS variant,
               n_chars + CASE WHEN arm = 1 THEN 100 ELSE 0 END AS v, arm
        FROM base
        UNION ALL
        SELECT 'control' AS variant, n_chars AS v, arm FROM base
      ), by_value AS (
        SELECT variant, v,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS c0,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS c1
        FROM panel GROUP BY variant, v
      ), walk AS (
        SELECT variant, v, c0, c1,
               sum(c0) OVER (PARTITION BY variant ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS a,
               sum(c1) OVER (PARTITION BY variant ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS b,
               sum(c0) OVER (PARTITION BY variant) AS n,
               sum(c1) OVER (PARTITION BY variant) AS m
        FROM by_value
      ), stat AS (
        SELECT variant, CAST(max(n) AS BIGINT) AS n,
               CAST(max(m) AS BIGINT) AS m,
               CAST(sum((c0 + c1) * (a * m - b * n) * (a * m - b * n))
                 AS BIGINT) AS s_num
        FROM walk GROUP BY variant
      )
      SELECT variant, n, m, s_num,
             CAST(s_num AS DOUBLE)
               / CAST(n * m * (n + m) * (n + m) AS DOUBLE) AS t_stat,
             CAST(s_num AS DOUBLE)
               / CAST(n * m * (n + m) * (n + m) AS DOUBLE) > 0.461
               AS reject_05
      FROM stat
      ORDER BY variant"""))

  /** q390: YUEN'S TRIMMED-MEAN ROBUST A/B TEST (Yuen Biometrika 1974,
    * "The two-sample trimmed t for unequal population variances";
    * Wilcox's default robust location test) — the heavy-tail-immune
    * complement of q346's Welch: 20% of each tail is TRIMMED from the
    * location estimate and the variance comes from the WINSORIZED
    * sample, so a handful of extreme orders cannot swamp the verdict.
    * EXACT RANK TRIMMING WITH TIES: per (variant, arm) the value
    * rollup's cumulative counts give each value's rank interval
    * [cum−cnt+1, cum]; its trimmed multiplicity is the overlap with
    * [g+1, n−g] (g = n÷5) — pure integer arithmetic, no row-level
    * sort. Winsorized moments clamp v to the exact order statistics
    * lo = v₍g+1₎, hi = v₍n−g₎ and accumulate in DECIMAL(38,0)/HUGEINT
    * (Σcnt·w² overflows int64 at scale — the q346/q322 discipline),
    * converting once through the correctly-rounded path
    * (Det.hugeDoubleSql). Then Yuen's statistic on identical doubles:
    * d_j = (n·S2w − S1w²)/(n·h·(h−1)), t = (x̄t₀−x̄t₁)/√(d₀+d₁),
    * Welch–Satterthwaite df on the d's, z-approx verdict at 1.96 (the
    * q346 convention). Dosed/control differential (q387 shape): arm 1
    * gains cents÷7 (+14.3%) in the dosed variant — |t| ≥ 3.2 at every
    * SF, control |t| ≤ 0.7 (parameter-swept). Scale: the rollup is
    * value-keyed; its per-arm cumulative window is bounded by the
    * PRICE DOMAIN (≤ 5·10⁷ distinct cents whatever the corpus), not
    * the row count. */
  val q390 = Q(
    "q390_yuen_trimmed_t",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.Caches.Tracked
      val base = Tables.load(s, d, "orders")
        .select(col("o_orderkey"),
          Det.cents(col("o_totalprice")).as("c"),
          expr("(o_orderkey * 2654435761L) % 2").as("arm"))
      val panel = base.select(lit("dosed").as("variant"), col("arm"),
        (col("c") + when(col("arm") === 1, expr("c div 7"))
          .otherwise(0L)).as("v"))
        .unionAll(base.select(lit("control").as("variant"), col("arm"),
          col("c").as("v")))
      val byv = panel.groupBy(col("variant"), col("arm"), col("v"))
        .agg(count(lit(1)).as("cnt"))
        .persistTracked()
      val w = Window.partitionBy(col("variant"), col("arm"))
        .orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = byv
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n",
          sum(col("cnt")).over(
            Window.partitionBy(col("variant"), col("arm"))))
        .withColumn("g", expr("n div 5"))
        .withColumn("h", col("n") - lit(2L) * col("g"))
        .persistTracked()
      val thr = cum.groupBy(col("variant"), col("arm"))
        .agg(
          max(col("n")).as("n"), max(col("g")).as("g"),
          max(col("h")).as("h"),
          min(when(col("cum") >= col("g") + 1, col("v"))).as("lo"),
          min(when(col("cum") >= col("n") - col("g"), col("v"))).as("hi"))
      val stats = cum.join(thr.select(col("variant"), col("arm"),
          col("lo"), col("hi")), Seq("variant", "arm"))
        .withColumn("trim_cnt", greatest(lit(0L),
          least(col("cum"), col("n") - col("g")) -
            greatest(col("cum") - col("cnt") + 1, col("g") + 1) + 1))
        .withColumn("wv", least(greatest(col("v"), col("lo")), col("hi")))
        .groupBy(col("variant"), col("arm"))
        .agg(
          sum((col("trim_cnt") * col("v")).cast(DecimalType(38, 0)))
            .as("trim_sum"),
          sum(col("cnt").cast(DecimalType(38, 0)) * col("wv"))
            .as("s1w"),
          sum(col("cnt").cast(DecimalType(38, 0)) * col("wv") *
            col("wv")).as("s2w"))
      val perArm = thr.join(stats, Seq("variant", "arm"))
        .select(col("variant"), col("arm"), col("n"), col("h"),
          (col("trim_sum").cast(DoubleType) /
            col("h").cast(DoubleType)).as("tmean"),
          ((col("n") * col("s2w") - col("s1w") * col("s1w"))
            .cast(DoubleType) /
            (col("n").cast(DecimalType(38, 0)) * col("h") *
              (col("h") - 1)).cast(DoubleType)).as("dvar"))
      val a0 = perArm.filter(col("arm") === 0)
        .select(col("variant"), col("n").as("n_a"), col("h").as("h_a"),
          col("tmean").as("tmean_a"), col("dvar").as("d_a"))
      val a1 = perArm.filter(col("arm") === 1)
        .select(col("variant"), col("n").as("n_b"), col("h").as("h_b"),
          col("tmean").as("tmean_b"), col("dvar").as("d_b"))
      a0.join(a1, Seq("variant"))
        .withColumn("t_stat",
          (col("tmean_a") - col("tmean_b")) / sqrt(col("d_a") + col("d_b")))
        .withColumn("df_approx",
          ((col("d_a") + col("d_b")) * (col("d_a") + col("d_b"))) /
            ((col("d_a") * col("d_a")) /
              (col("h_a") - 1).cast(DoubleType) +
              (col("d_b") * col("d_b")) /
                (col("h_b") - 1).cast(DoubleType)))
        .withColumn("reject_05", abs(col("t_stat")) > 1.96)
        .select(col("variant"), col("n_a"), col("n_b"), col("h_a"),
          col("h_b"), col("tmean_a"), col("tmean_b"), col("t_stat"),
          col("df_approx"), col("reject_05"))
        .orderBy(col("variant"))
    },
    Some(s"""
      WITH base AS (
        SELECT ${Det.centsSql("o_totalprice")} AS c,
               (o_orderkey * 2654435761) % 2 AS arm
        FROM orders
      ), panel AS (
        SELECT 'dosed' AS variant, arm,
               c + CASE WHEN arm = 1 THEN c // 7 ELSE 0 END AS v
        FROM base
        UNION ALL
        SELECT 'control' AS variant, arm, c AS v FROM base
      ), byv AS (
        SELECT variant, arm, v, count(*) AS cnt
        FROM panel GROUP BY variant, arm, v
      ), cum AS (
        SELECT variant, arm, v, cnt,
               sum(cnt) OVER (PARTITION BY variant, arm ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cnt) OVER (PARTITION BY variant, arm) AS n
        FROM byv
      ), cum2 AS (
        SELECT variant, arm, v, cnt, cum, n, n // 5 AS g,
               n - 2 * (n // 5) AS h
        FROM cum
      ), thr AS (
        SELECT variant, arm, CAST(max(n) AS BIGINT) AS n,
               CAST(max(g) AS BIGINT) AS g, CAST(max(h) AS BIGINT) AS h,
               min(CASE WHEN cum >= g + 1 THEN v END) AS lo,
               min(CASE WHEN cum >= n - g THEN v END) AS hi
        FROM cum2 GROUP BY variant, arm
      ), stats AS (
        SELECT c.variant, c.arm,
               sum(CAST(greatest(0, least(c.cum, c.n - c.g)
                 - greatest(c.cum - c.cnt + 1, c.g + 1) + 1) * c.v
                 AS HUGEINT)) AS trim_sum,
               sum(CAST(c.cnt AS HUGEINT)
                 * least(greatest(c.v, t.lo), t.hi)) AS s1w,
               sum(CAST(c.cnt AS HUGEINT)
                 * least(greatest(c.v, t.lo), t.hi)
                 * least(greatest(c.v, t.lo), t.hi)) AS s2w
        FROM cum2 c
        JOIN thr t ON t.variant = c.variant AND t.arm = c.arm
        GROUP BY c.variant, c.arm
      ), per_arm AS (
        SELECT t.variant, t.arm, t.n, t.h,
               ${Det.hugeDoubleSql("s.trim_sum")}
                 / CAST(t.h AS DOUBLE) AS tmean,
               ${Det.hugeDoubleSql("t.n * s.s2w - s.s1w * s.s1w")}
                 / ${Det.hugeDoubleSql(
      "CAST(t.n AS HUGEINT) * t.h * (t.h - 1)")} AS dvar
        FROM thr t JOIN stats s
          ON s.variant = t.variant AND s.arm = t.arm
      )
      SELECT a0.variant, a0.n AS n_a, a1.n AS n_b,
             a0.h AS h_a, a1.h AS h_b,
             a0.tmean AS tmean_a, a1.tmean AS tmean_b,
             (a0.tmean - a1.tmean) / sqrt(a0.dvar + a1.dvar) AS t_stat,
             ((a0.dvar + a1.dvar) * (a0.dvar + a1.dvar))
               / ((a0.dvar * a0.dvar) / CAST(a0.h - 1 AS DOUBLE)
                  + (a1.dvar * a1.dvar) / CAST(a1.h - 1 AS DOUBLE))
               AS df_approx,
             abs((a0.tmean - a1.tmean) / sqrt(a0.dvar + a1.dvar)) > 1.96
               AS reject_05
      FROM per_arm a0 JOIN per_arm a1
        ON a1.variant = a0.variant AND a0.arm = 0 AND a1.arm = 1
      ORDER BY a0.variant"""))

  /** q395: CONFORMAL RISK CONTROL (Angelopoulos, Bates et al. 2022,
    * "Conformal Risk Control" — the generalization of q327's split
    * conformal from coverage to ANY monotone loss): choose the flagging
    * threshold λ for a quality classifier so the MISS RATE (bad doc
    * left unflagged — loss over all docs, the monotone-in-λ quantity
    * the theorem controls) is ≤ α = 0.1 in expectation, via the
    * finite-sample corrected bound (n·R̂(λ) + B)/(n + 1) ≤ α with
    * B = 1. ALL-INTEGER selection: on the 41-point λ grid the bound is
    * the cross-multiplied test (c(λ) + 1)·10 ≤ n + 1 over the exact
    * calibration miss COUNT c(λ), and λ̂ is the largest grid λ passing
    * — flag as few docs as the guarantee allows. The report carries
    * the full grid audit plus the held-out realized miss rate (and the
    * conditional FNR, labeled — NOT the controlled quantity). Dose:
    * bad = (id·40503)‰ < score makes P(bad|score) rise linearly (the
    * q338 correlation), so the trade-off is real. Scale: one scan to
    * a (grid × split) rollup via a 41-row generator join. */
  val q395 = Q(
    "q395_conformal_risk",
    (s, d) => {
      import graft.Caches.Tracked
      val scored = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          expr("(doc_id * 2654435761L) % 1000").as("score"),
          (col("doc_id") % 2 === 0).as("is_cal"))
        .withColumn("bad", expr("(doc_id * 40503L) % 1000") < col("score"))
        .persistTracked()
      val grid = scored.crossJoin(
        s.range(0, 41).select((col("id") * 25).as("lam")))
      val cells = grid.groupBy(col("lam"))
        .agg(
          sum(when(col("is_cal") && col("bad") && col("score") < col("lam"),
            1L).otherwise(0L)).as("cal_miss"),
          sum(when(col("is_cal"), 1L).otherwise(0L)).as("n_cal"),
          sum(when(!col("is_cal") && col("bad") &&
            col("score") < col("lam"), 1L).otherwise(0L)).as("test_miss"),
          sum(when(!col("is_cal"), 1L).otherwise(0L)).as("n_test"),
          sum(when(!col("is_cal") && col("bad"), 1L).otherwise(0L))
            .as("n_test_bad"),
          sum(when(!col("is_cal") && col("score") >= col("lam"), 1L)
            .otherwise(0L)).as("test_flagged"))
        .withColumn("bound_ok", (col("cal_miss") + 1) * 10 <=
          col("n_cal") + 1)
        .persistTracked()
      val sel = cells.filter(col("bound_ok"))
        .agg(max(col("lam")).as("lam_hat"))
      cells.crossJoin(broadcast(sel))
        .withColumn("selected", col("lam") === col("lam_hat"))
        .select(col("lam"), col("cal_miss"), col("n_cal"),
          col("bound_ok"), col("selected"),
          (col("test_miss").cast(DoubleType) /
            col("n_test").cast(DoubleType)).as("test_miss_rate"),
          (col("test_miss").cast(DoubleType) /
            col("n_test_bad").cast(DoubleType)).as("test_fnr"),
          (col("test_flagged").cast(DoubleType) /
            col("n_test").cast(DoubleType)).as("test_flag_rate"))
        .orderBy(col("lam"))
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, (doc_id * 2654435761) % 1000 AS score,
               doc_id % 2 = 0 AS is_cal,
               (doc_id * 40503) % 1000 < (doc_id * 2654435761) % 1000
                 AS bad
        FROM documents
      ), cells AS (
        SELECT g.lam,
               CAST(sum(CASE WHEN s.is_cal AND s.bad AND s.score < g.lam
                 THEN 1 ELSE 0 END) AS BIGINT) AS cal_miss,
               CAST(sum(CASE WHEN s.is_cal THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_cal,
               CAST(sum(CASE WHEN NOT s.is_cal AND s.bad
                 AND s.score < g.lam THEN 1 ELSE 0 END) AS BIGINT)
                 AS test_miss,
               CAST(sum(CASE WHEN NOT s.is_cal THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_test,
               CAST(sum(CASE WHEN NOT s.is_cal AND s.bad THEN 1 ELSE 0
                 END) AS BIGINT) AS n_test_bad,
               CAST(sum(CASE WHEN NOT s.is_cal AND s.score >= g.lam
                 THEN 1 ELSE 0 END) AS BIGINT) AS test_flagged
        FROM scored s
        CROSS JOIN (SELECT unnest(range(0, 41)) * 25 AS lam) g
        GROUP BY g.lam
      ), flags AS (
        SELECT *, (cal_miss + 1) * 10 <= n_cal + 1 AS bound_ok
        FROM cells
      ), sel AS (
        SELECT max(lam) AS lam_hat FROM flags WHERE bound_ok
      )
      SELECT f.lam, f.cal_miss, f.n_cal, f.bound_ok,
             f.lam = s.lam_hat AS selected,
             CAST(f.test_miss AS DOUBLE) / CAST(f.n_test AS DOUBLE)
               AS test_miss_rate,
             CAST(f.test_miss AS DOUBLE) / CAST(f.n_test_bad AS DOUBLE)
               AS test_fnr,
             CAST(f.test_flagged AS DOUBLE) / CAST(f.n_test AS DOUBLE)
               AS test_flag_rate
      FROM flags f CROSS JOIN sel s
      ORDER BY f.lam"""))

  /** q396: TUKEY–KRAMER HSD POST-HOC PAIRWISE COMPARISONS (Tukey 1949;
    * Kramer 1956 for unequal group sizes) — the step a k-group read
    * takes AFTER q354's ANOVA says "some group differs": which PAIRS
    * differ, with the familywise error of all 10 comparisons
    * controlled by the studentized-range critical value (k=5, df→∞:
    * q.05 = 3.858, a literal — the q356 z-sum discipline). EXACT
    * inputs: per-priority sums and squared sums of dosed integer cents
    * accumulate in DECIMAL(38,0)/HUGEINT (Σv² passes 2⁶³ at scale) and
    * convert once via the correctly-rounded path; means, the pooled
    * within-group MSW = SSW/(N−k), and each Tukey–Kramer statistic
    * |x̄ᵢ−x̄ⱼ| / √(MSW/2·(1/nᵢ+1/nⱼ)) are then identical-operand
    * doubles. Dosed/control differential: +$20k per priority index
    * separates extremes but leaves the adjacent (1,2) pair inside the
    * band at sf0.001 (prototyped: dosed 7/10 reject there, control
    * 0/10 at every SF) — a verdict that genuinely uses the familywise
    * bar. Scale: one scan to a 5-row rollup; the pair join is 5×5. */
  val q396 = Q(
    "q396_tukey_hsd",
    (s, d) => {
      import graft.Caches.Tracked
      val base = Tables.load(s, d, "orders")
        .select(
          expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
            .as("idx"),
          Det.cents(col("o_totalprice")).as("c"))
      val panel = base.select(lit("dosed").as("variant"), col("idx"),
        (col("c") + col("idx") * 2000000L).as("v"))
        .unionAll(base.select(lit("control").as("variant"), col("idx"),
          col("c").as("v")))
      val groups = panel.groupBy(col("variant"), col("idx"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("v").cast(DecimalType(38, 0))).as("s1"),
          sum(col("v").cast(DecimalType(38, 0)) * col("v")).as("s2"))
        .persistTracked()
      val msw = groups.groupBy(col("variant"))
        .agg(
          sum(col("n")).as("n_total"), count(lit(1)).as("k"),
          // SSW = Σ_groups (S2 − S1²/n) exactly:
          // Σ S2 − Σ S1²/n folded per group in idx order as doubles
          expr("aggregate(array_sort(collect_list(struct(idx, " +
            "(CAST(s2 AS DOUBLE) - CAST(s1 * s1 AS DOUBLE) " +
            "/ CAST(n AS DOUBLE)) AS w))), CAST(0 AS DOUBLE), " +
            "(acc, x) -> acc + x.w)").as("ssw"))
        .withColumn("msw",
          col("ssw") / (col("n_total") - col("k")).cast(DoubleType))
      val g1 = groups.select(col("variant"), col("idx").as("i"),
        col("n").as("n_i"),
        (col("s1").cast(DoubleType) / col("n").cast(DoubleType))
          .as("mean_i"))
      val g2 = groups.select(col("variant"), col("idx").as("j"),
        col("n").as("n_j"),
        (col("s1").cast(DoubleType) / col("n").cast(DoubleType))
          .as("mean_j"))
      g1.join(g2, Seq("variant")).filter(col("i") < col("j"))
        .join(msw.select(col("variant"), col("msw")), Seq("variant"))
        .withColumn("q_stat",
          abs(col("mean_i") - col("mean_j")) /
            sqrt((col("msw") / lit(2.0)) *
              (lit(1.0) / col("n_i").cast(DoubleType) +
                lit(1.0) / col("n_j").cast(DoubleType))))
        .withColumn("reject_05", col("q_stat") > 3.858)
        .select(col("variant"), col("i"), col("j"), col("n_i"),
          col("n_j"), col("mean_i"), col("mean_j"), col("q_stat"),
          col("reject_05"))
        .orderBy(col("variant"), col("i"), col("j"))
    },
    Some(s"""
      WITH base AS (
        SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS idx,
               ${Det.centsSql("o_totalprice")} AS c
        FROM orders
      ), panel AS (
        SELECT 'dosed' AS variant, idx, c + idx * 2000000 AS v FROM base
        UNION ALL
        SELECT 'control' AS variant, idx, c AS v FROM base
      ), groups AS (
        SELECT variant, idx, count(*) AS n,
               sum(CAST(v AS HUGEINT)) AS s1,
               sum(CAST(v AS HUGEINT) * v) AS s2
        FROM panel GROUP BY variant, idx
      ), msw AS (
        SELECT variant, CAST(sum(n) AS BIGINT) AS n_total,
               count(*) AS k,
               list_reduce(list_transform(list(struct_pack(idx := idx,
                 w := ${Det.hugeDoubleSql("s2")}
                      - ${Det.hugeDoubleSql("s1 * s1")}
                        / CAST(n AS DOUBLE)) ORDER BY idx),
                 x -> x.w), (a, b) -> a + b) AS ssw
        FROM groups GROUP BY variant
      )
      SELECT g1.variant, g1.idx AS i, g2.idx AS j,
             g1.n AS n_i, g2.n AS n_j,
             ${Det.hugeDoubleSql("g1.s1")} / CAST(g1.n AS DOUBLE)
               AS mean_i,
             ${Det.hugeDoubleSql("g2.s1")} / CAST(g2.n AS DOUBLE)
               AS mean_j,
             abs(${Det.hugeDoubleSql("g1.s1")} / CAST(g1.n AS DOUBLE)
                 - ${Det.hugeDoubleSql("g2.s1")} / CAST(g2.n AS DOUBLE))
               / sqrt((m.ssw / CAST(m.n_total - m.k AS DOUBLE)
                       / CAST(2 AS DOUBLE))
                      * (CAST(1 AS DOUBLE) / CAST(g1.n AS DOUBLE)
                         + CAST(1 AS DOUBLE) / CAST(g2.n AS DOUBLE)))
               AS q_stat,
             abs(${Det.hugeDoubleSql("g1.s1")} / CAST(g1.n AS DOUBLE)
                 - ${Det.hugeDoubleSql("g2.s1")} / CAST(g2.n AS DOUBLE))
               / sqrt((m.ssw / CAST(m.n_total - m.k AS DOUBLE)
                       / CAST(2 AS DOUBLE))
                      * (CAST(1 AS DOUBLE) / CAST(g1.n AS DOUBLE)
                         + CAST(1 AS DOUBLE) / CAST(g2.n AS DOUBLE)))
               > 3.858 AS reject_05
      FROM groups g1
      JOIN groups g2 ON g2.variant = g1.variant AND g1.idx < g2.idx
      JOIN msw m ON m.variant = g1.variant
      ORDER BY g1.variant, i, j"""))

  /** q397: ROC / PR CURVES + EXACT AUC (Fawcett 2006, "An introduction
    * to ROC analysis"; Davis & Goadrich 2006 for the PR relationship)
    * — the threshold-sweep readout behind every corpus-filter
    * operating-point choice (q338 gives calibration, q364 one point;
    * this is the whole curve). Two AUC spellings, both deterministic:
    * (a) EXACT rank AUC = (Σ_pos midrank − P(P+1)/2)/(P·N) via
    * 2×-scaled midranks over the score-value rollup (the q321/q322
    * trick — all integer, ONE division; ties handled exactly), and
    * (b) the 21-point grid trapezoid (ordered fold of identical
    * doubles — the familiar plotted approximation, reported beside the
    * exact value it approximates). Grid cells from ONE scan via a
    * generator cross join; confusion counts are integers, TPR/FPR/
    * precision single divisions. Scale: the value rollup is bounded by
    * the score DOMAIN (≤1000 permille values), the grid by 21. */
  val q397 = Q(
    "q397_roc_pr_curve",
    (s, d) => {
      import graft.Caches.Tracked
      import org.apache.spark.sql.expressions.Window
      val scored = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          expr("(doc_id * 2654435761L) % 1000").as("score"))
        .withColumn("y",
          when(expr("(doc_id * 40503L) % 1000") < col("score"), 1L)
            .otherwise(0L))
        .persistTracked()
      val totals = scored.agg(
        sum(col("y")).as("p_total"),
        sum(lit(1L) - col("y")).as("n_total"))
      // exact rank AUC from 2x-midranks over the value rollup
      val byScore = scored.groupBy(col("score"))
        .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
      val wcum = Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val rankAuc = byScore
        .withColumn("cum_before", coalesce(sum(col("cnt")).over(wcum),
          lit(0L)))
        .select(sum(col("pos") *
          (lit(2L) * col("cum_before") + col("cnt") + 1)).as("r2sum"))
        .crossJoin(broadcast(totals))
        .select(((col("r2sum") - col("p_total") * (col("p_total") + 1))
          .cast(DoubleType) /
          (lit(2L) * col("p_total") * col("n_total")).cast(DoubleType))
          .as("auc_exact"))
      val grid = scored.crossJoin(
        s.range(0, 21).select((col("id") * 50).as("thr")))
        .groupBy(col("thr"))
        .agg(
          sum(when(col("score") >= col("thr"), col("y")).otherwise(0L))
            .as("tp"),
          sum(when(col("score") >= col("thr"), lit(1L) - col("y"))
            .otherwise(0L)).as("fp"))
        .crossJoin(broadcast(totals))
        .withColumn("tpr", col("tp").cast(DoubleType) /
          col("p_total").cast(DoubleType))
        .withColumn("fpr", col("fp").cast(DoubleType) /
          col("n_total").cast(DoubleType))
        .withColumn("precision",
          when(col("tp") + col("fp") === 0, lit(1.0))
            .otherwise(col("tp").cast(DoubleType) /
              (col("tp") + col("fp")).cast(DoubleType)))
        .persistTracked()
      // trapezoid over thr-ascending grid (FPR descends): ordered fold
      val trap = grid.agg(expr(
        "aggregate(array_sort(collect_list(struct(thr, fpr, tpr))), " +
          "named_struct('pf', CAST(-1 AS DOUBLE), 'pt', " +
          "CAST(-1 AS DOUBLE), 'a', CAST(0 AS DOUBLE)), " +
          "(st, x) -> named_struct('pf', x.fpr, 'pt', x.tpr, 'a', " +
          "CASE WHEN st.pf = CAST(-1 AS DOUBLE) THEN st.a " +
          "ELSE st.a + (st.pf - x.fpr) * (st.pt + x.tpr) " +
          "/ CAST(2 AS DOUBLE) END)).a").as("auc_trapezoid"))
      grid.crossJoin(broadcast(trap)).crossJoin(broadcast(rankAuc))
        .select(col("thr"), col("tp"), col("fp"), col("tpr"),
          col("fpr"), col("precision"), col("auc_trapezoid"),
          col("auc_exact"))
        .orderBy(col("thr"))
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, (doc_id * 2654435761) % 1000 AS score,
               CASE WHEN (doc_id * 40503) % 1000
                      < (doc_id * 2654435761) % 1000
                    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
                 AS y
        FROM documents
      ), totals AS (
        SELECT CAST(sum(y) AS BIGINT) AS p_total,
               CAST(sum(1 - y) AS BIGINT) AS n_total
        FROM scored
      ), by_score AS (
        SELECT score, count(*) AS cnt, CAST(sum(y) AS BIGINT) AS pos
        FROM scored GROUP BY score
      ), ranked AS (
        SELECT pos, cnt,
               coalesce(sum(cnt) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_before
        FROM by_score
      ), rank_auc AS (
        SELECT CAST(CAST(sum(pos * (2 * cum_before + cnt + 1))
                      AS BIGINT)
                    - t.p_total * (t.p_total + 1) AS DOUBLE)
               / CAST(2 * t.p_total * t.n_total AS DOUBLE) AS auc_exact
        FROM ranked, totals t
        GROUP BY t.p_total, t.n_total
      ), grid AS (
        SELECT g.thr,
               CAST(sum(CASE WHEN s.score >= g.thr THEN s.y ELSE 0 END)
                 AS BIGINT) AS tp,
               CAST(sum(CASE WHEN s.score >= g.thr THEN 1 - s.y
                 ELSE 0 END) AS BIGINT) AS fp
        FROM scored s
        CROSS JOIN (SELECT unnest(range(0, 21)) * 50 AS thr) g
        GROUP BY g.thr
      ), curve AS (
        SELECT g.thr, g.tp, g.fp,
               CAST(g.tp AS DOUBLE) / CAST(t.p_total AS DOUBLE) AS tpr,
               CAST(g.fp AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS fpr,
               CASE WHEN g.tp + g.fp = 0 THEN CAST(1 AS DOUBLE)
                    ELSE CAST(g.tp AS DOUBLE)
                         / CAST(g.tp + g.fp AS DOUBLE) END AS precision
        FROM grid g CROSS JOIN totals t
      ), trap AS (
        SELECT list_reduce(list_transform(
                 list(struct_pack(thr := thr, fpr := fpr, tpr := tpr)
                      ORDER BY thr),
                 x -> struct_pack(pf := x.fpr, pt := x.tpr,
                                  a := CAST(0 AS DOUBLE))),
               (st, x) -> struct_pack(pf := x.pf, pt := x.pt,
                 a := st.a + (st.pf - x.pf) * (st.pt + x.pt)
                      / CAST(2 AS DOUBLE))).a AS auc_trapezoid
        FROM curve
      )
      SELECT c.thr, c.tp, c.fp, c.tpr, c.fpr, c.precision,
             tr.auc_trapezoid, r.auc_exact
      FROM curve c CROSS JOIN trap tr CROSS JOIN rank_auc r
      ORDER BY c.thr"""))

  /** q398: ISOTONIC SCORE CALIBRATION (Barlow et al. 1972; Zadrozny &
    * Elkan KDD 2002 — the nonparametric recalibration that fixes what
    * q338's reliability diagram diagnoses, guaranteed monotone unlike
    * Platt scaling): fit the least-squares NONDECREASING map from
    * score bucket to bad-rate. The classic pool-adjacent-violators
    * stack carries an unbounded merge cascade per element — not a
    * lambda shape — so both engines compute the equivalent CLOSED
    * MINIMAX FORM (Robertson-Wright-Dykstra §1.2):
    *   fitted_i = max_{j≤i} min_{k≥i} avg(y[j..k])
    * — O(m³) nested transforms over the FIXED 50-bucket grid (~60k
    * lambda evals), with every avg ONE division of exact prefix-sum
    * integers, so the max/min chains compare identical doubles
    * cross-engine (verified ≡ stack-PAV to the bit at sf0.001 — 23
    * raw violations pooled). Scale: one scan to the 50-bucket rollup;
    * everything after is grid-sized. */
  val q398 = Q(
    "q398_isotonic_calibration",
    (s, d) => {
      val byB = Tables.load(s, d, "documents")
        .select(expr("(doc_id * 2654435761L) % 1000").as("score"),
          when(expr("(doc_id * 40503L) % 1000") <
            expr("(doc_id * 2654435761L) % 1000"), 1L)
            .otherwise(0L).as("y"))
        .withColumn("b", expr("score div 20"))
        .groupBy(col("b"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val one = byB
        .agg(expr("array_sort(collect_list(struct(b, n, pos)))")
          .as("arr"))
        .withColumn("m", size(col("arr")))
        // prefix sums via slice+sum (order-free integer adds):
        // ss[t] = Σ pos of the first t−1 buckets (ss[1] = 0)
        .withColumn("ss", expr(
          """transform(sequence(1, m + 1), t ->
            |  CAST(coalesce(aggregate(slice(arr, 1, t - 1),
            |    CAST(0 AS BIGINT), (a, x) -> a + x.pos), 0)
            |    AS BIGINT))""".stripMargin))
        .withColumn("cc", expr(
          """transform(sequence(1, m + 1), t ->
            |  CAST(coalesce(aggregate(slice(arr, 1, t - 1),
            |    CAST(0 AS BIGINT), (a, x) -> a + x.n), 0)
            |    AS BIGINT))""".stripMargin))
        .withColumn("fit", expr(
          """transform(sequence(1, m), i ->
            |  array_max(transform(sequence(1, i), j ->
            |    array_min(transform(sequence(i, m), k ->
            |      CAST(element_at(ss, k + 1) - element_at(ss, j)
            |        AS DOUBLE) /
            |      CAST(element_at(cc, k + 1) - element_at(cc, j)
            |        AS DOUBLE))))))""".stripMargin))
      one
        .select(explode(expr(
          """transform(sequence(1, m), i -> named_struct(
            |  'b', element_at(arr, i).b,
            |  'n', element_at(arr, i).n,
            |  'pos', element_at(arr, i).pos,
            |  'fitted', element_at(fit, i)))""".stripMargin)).as("r"))
        .select(col("r.b").as("b"), col("r.n").as("n"),
          col("r.pos").as("pos"),
          (col("r.pos").cast(DoubleType) / col("r.n").cast(DoubleType))
            .as("raw_rate"),
          col("r.fitted").as("fitted"))
        .orderBy(col("b"))
    },
    Some("""
      WITH byb AS (
        SELECT score // 20 AS b, count(*) AS n,
               CAST(sum(y) AS BIGINT) AS pos
        FROM (SELECT (doc_id * 2654435761) % 1000 AS score,
                     CASE WHEN (doc_id * 40503) % 1000
                            < (doc_id * 2654435761) % 1000
                          THEN 1 ELSE 0 END AS y
              FROM documents) sc
        GROUP BY 1
      ), one AS (
        SELECT list(struct_pack(b := b, n := n, pos := pos) ORDER BY b)
                 AS arr,
               count(*) AS m
        FROM byb
      ), pre AS (
        SELECT arr, m,
               list_transform(range(1, m + 2), t ->
                 CAST(coalesce(list_sum(list_transform(arr[1:t-1],
                   x -> x.pos)), 0) AS BIGINT)) AS ss,
               list_transform(range(1, m + 2), t ->
                 CAST(coalesce(list_sum(list_transform(arr[1:t-1],
                   x -> x.n)), 0) AS BIGINT)) AS cc
        FROM one
      ), fitted AS (
        SELECT arr, m,
               list_transform(range(1, m + 1), i ->
                 list_max(list_transform(range(1, i + 1), j ->
                   list_min(list_transform(range(i, m + 1), k ->
                     CAST(ss[k + 1] - ss[j] AS DOUBLE)
                     / CAST(cc[k + 1] - cc[j] AS DOUBLE)))))) AS fit
        FROM pre
      ), rows_out AS (
        SELECT unnest(list_transform(range(1, m + 1), i -> struct_pack(
          b := arr[i].b, n := arr[i].n, pos := arr[i].pos,
          fitted := fit[i]))) AS r
        FROM fitted
      )
      SELECT r.b AS b, r.n AS n, r.pos AS pos,
             CAST(r.pos AS DOUBLE) / CAST(r.n AS DOUBLE) AS raw_rate,
             r.fitted AS fitted
      FROM rows_out
      ORDER BY b"""))

  /** q408: CONDORCET CYCLE AUDIT of pairwise preferences (Kendall &
    * Babington Smith 1940, "On the Method of Paired Comparisons"; the
    * consistency check preference-data pipelines owe their BT/Elo
    * models, which silently ASSUME transitivity that majority-vote
    * aggregation provably violates — Condorcet 1785): sources are
    * compared pairwise PER LANGUAGE (mean doc length, exact
    * cross-multiplied integer comparisons — never a double mean), the
    * majority of language verdicts decides each pair (ties AND pairs
    * sharing no language go to the lexicographically smaller source —
    * pairs enumerate the full source cross product, so the round-robin
    * tournament the closed form assumes is complete BY CONSTRUCTION),
    * and the number of CYCLIC triads comes from the closed form
    *   c = C(n,3) − Σᵢ C(dᵢ,2)
    * over the out-degree (win-count) sequence — counting A>B>C>A
    * cycles WITHOUT enumerating the n³ triads (the formula is why the
    * audit scales: degrees are one groupBy). Realized at every SF
    * (DuckDB sweep: 50/136/75 cyclic of 1140 at sf0.001/0.01/0.1) —
    * the per-language Condorcet aggregation genuinely produces
    * intransitivity on this corpus, which is the warning the audit
    * exists to raise before anyone fits a total order. ALL-INTEGER.
    * Scale: |sources|²·|langs| comparison rows (bounded by the
    * dimension, not the corpus) after one corpus scan to per-(source,
    * lang) sums. */
  val q408 = Q(
    "q408_preference_cycles",
    (s, d) => {
      import graft.Caches.Tracked
      val per = Tables.load(s, d, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(sum(col("n_chars")).as("sv"), count(lit(1)).as("c"))
        .persistTracked()
      val srcs = Tables.load(s, d, "documents")
        .select(col("source")).distinct()
        .persistTracked()
      val perLangNet = per.as("a")
        .join(per.as("b"),
          col("a.lang") === col("b.lang") &&
            col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
        .agg(sum(
          when(col("a.sv") * col("b.c") > col("b.sv") * col("a.c"), 1L)
            .when(col("a.sv") * col("b.c") < col("b.sv") * col("a.c"),
              -1L)
            .otherwise(0L)).as("net"))
      // COMPLETE tournament (r8 advice #2): the closed form
      // c = C(n,3) − ΣC(dᵢ,2) needs a win recorded for EVERY source
      // pair; a pair sharing no language never enters the per-language
      // join, so pairs come from the full cross product of sources
      // (bounded by the dimension) with no-shared-language defaulting
      // to net = 0 — the same "tie to the lexicographically smaller
      // source" rule already applied to exact score ties.
      val pair = srcs.as("x")
        .join(srcs.as("y"), col("x.source") < col("y.source"))
        .select(col("x.source").as("sa"), col("y.source").as("sb"))
        .join(perLangNet, Seq("sa", "sb"), "left")
        .select(col("sa"), col("sb"),
          coalesce(col("net"), lit(0L)).as("net"))
      val deg = pair
        .select(when(col("net") >= 0L, col("sa")).otherwise(col("sb"))
          .as("source"))
        .groupBy(col("source")).agg(count(lit(1)).as("wins"))
      val degAll = srcs.join(deg, Seq("source"), "left")
        .select(col("source"), coalesce(col("wins"), lit(0L)).as("wins"))
        .persistTracked()
      val glob = degAll.agg(
        count(lit(1)).as("n_sources"),
        sum(expr("wins * (wins - 1) div 2")).as("transitive_triads"))
        .withColumn("total_triads", expr(
          "n_sources * (n_sources - 1) * (n_sources - 2) div 6"))
        .withColumn("cyclic_triads",
          col("total_triads") - col("transitive_triads"))
      degAll.crossJoin(broadcast(glob))
        .select(col("source"), col("wins"),
          expr("wins * (wins - 1) div 2").as("transitive_at"),
          col("n_sources"), col("total_triads"), col("cyclic_triads"),
          (col("cyclic_triads") > 0L).as("intransitive"))
        .orderBy(col("source"))
    },
    Some("""
      WITH per AS (
        SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS sv,
               count(*) AS c
        FROM documents GROUP BY source, lang
      ), pair_net AS (
        SELECT a.source AS sa, b.source AS sb,
               CAST(sum(CASE WHEN a.sv * b.c > b.sv * a.c THEN 1
                             WHEN a.sv * b.c < b.sv * a.c THEN -1
                             ELSE 0 END) AS BIGINT) AS net
        FROM per a
        JOIN per b ON a.lang = b.lang AND a.source < b.source
        GROUP BY a.source, b.source
      ), srcs AS (
        SELECT DISTINCT source FROM documents
      ), pair AS (
        SELECT x.source AS sa, y.source AS sb,
               coalesce(n.net, 0) AS net
        FROM srcs x
        JOIN srcs y ON x.source < y.source
        LEFT JOIN pair_net n ON n.sa = x.source AND n.sb = y.source
      ), deg AS (
        SELECT CASE WHEN net >= 0 THEN sa ELSE sb END AS source,
               count(*) AS wins
        FROM pair GROUP BY 1
      ), deg_all AS (
        SELECT s.source, coalesce(d.wins, 0) AS wins
        FROM srcs s LEFT JOIN deg d ON d.source = s.source
      ), gstat AS (
        SELECT count(*) AS n_sources,
               CAST(sum(wins * (wins - 1) // 2) AS BIGINT)
                 AS transitive_triads
        FROM deg_all
      ), gstat2 AS (
        SELECT n_sources, transitive_triads,
               n_sources * (n_sources - 1) * (n_sources - 2) // 6
                 AS total_triads,
               n_sources * (n_sources - 1) * (n_sources - 2) // 6
                 - transitive_triads AS cyclic_triads
        FROM gstat
      )
      SELECT d.source, CAST(d.wins AS BIGINT) AS wins,
             CAST(d.wins * (d.wins - 1) // 2 AS BIGINT) AS transitive_at,
             n_sources, total_triads, cyclic_triads,
             cyclic_triads > 0 AS intransitive
      FROM deg_all d, gstat2
      ORDER BY d.source"""))

  /** q412: WEIGHTED KAPPA FOR ORDINAL LABELS (Cohen 1968, "Weighted
    * kappa: nominal scale agreement with provision for scaled
    * disagreement") — q311's Cohen kappa treats a 1-point miss on a
    * 5-point quality scale exactly like a 4-point miss; for ORDINAL
    * annotation scales (quality 0..4, toxicity severity, relevance
    * grades) the standard readout is quadratic-weighted kappa, where a
    * disagreement costs (i−j)². With joint counts o_ij and marginals
    * a_i, b_j, using DISAGREEMENT weights v_ij = (i−j)²:
    *   κ_w = 1 − N·Σ v_ij·o_ij / Σ v_ij·a_i·b_j
    * — integer numerator and denominator (labels ≤ 4, so v ≤ 16 and
    * every sum is a count-weighted integer), ONE IEEE division, same
    * operands in both engines. The UNWEIGHTED kappa (v_ij = [i≠j]) is
    * emitted from the same joint/marginal tables as `kappa` — it is
    * exactly q311's (A·N − S)/(N² − S) in 1−N·D/Σ form — so the report
    * SHOWS the ordinal correction: the dose makes annotator misses
    * mostly adjacent (+1 / −1 on disjoint id residues, a rare +2 on
    * doc_id%11), so κ_w ≫ κ at every SF (prototyped: 0.81–0.87 vs
    * 0.33–0.53 at sf0.001/0.01/0.1); a chance-level pair would drive
    * both to ≈0. Labels clamp to [0,4] (greatest/least) — an ordinal
    * scale has edges, and the clamp keeps the marginals honest. Scale:
    * one scan to per-(lang,a,b) joint counts (≤25 cells per lang),
    * marginal cross product is 5×5 metadata per lang — nothing grows
    * with the corpus. */
  val q412 = Q(
    "q412_weighted_kappa",
    (s, d) => {
      import graft.Caches.Tracked
      val labeled = Tables.load(s, d, "documents")
        .select(
          col("lang"),
          expr("greatest(0L, least(4L, (doc_id * 7) % 5 " +
            "+ CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END))").as("a"),
          expr("greatest(0L, least(4L, (doc_id * 7) % 5 " +
            "+ CASE WHEN doc_id % 4 = 0 THEN -1 ELSE 0 END " +
            "+ CASE WHEN doc_id % 11 = 0 THEN 2 ELSE 0 END))").as("b"))
        .persistTracked()
      val base = labeled.groupBy(col("lang"), col("a"), col("b"))
        .agg(count(lit(1)).as("o"))
        .groupBy(col("lang"))
        .agg(
          sum(col("o")).as("n"),
          sum((col("a") - col("b")) * (col("a") - col("b")) * col("o"))
            .as("w_obs"),
          sum(when(col("a") =!= col("b"), col("o")).otherwise(0L))
            .as("d_obs"))
      val ma = labeled.groupBy(col("lang"), col("a").as("ca"))
        .agg(count(lit(1)).as("na"))
      val mb = labeled.groupBy(col("lang"), col("b").as("cb"))
        .agg(count(lit(1)).as("nb"))
      val marg = ma.join(mb, Seq("lang"))
        .groupBy(col("lang"))
        .agg(
          sum((col("ca") - col("cb")) * (col("ca") - col("cb")) *
            col("na") * col("nb")).as("w_exp"),
          sum(when(col("ca") =!= col("cb"), col("na") * col("nb"))
            .otherwise(0L)).as("d_exp"))
      base.join(marg, Seq("lang"))
        .select(
          col("lang"), col("n"), col("w_obs"), col("w_exp"),
          (lit(1.0) - (col("n") * col("w_obs")).cast(DoubleType) /
            col("w_exp").cast(DoubleType)).as("kappa_w"),
          (lit(1.0) - (col("n") * col("d_obs")).cast(DoubleType) /
            col("d_exp").cast(DoubleType)).as("kappa"))
        .withColumn("ordinal_gain", col("kappa_w") - col("kappa"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH labeled AS (
        SELECT lang,
          greatest(0, least(4, (doc_id * 7) % 5
            + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)) AS a,
          greatest(0, least(4, (doc_id * 7) % 5
            + CASE WHEN doc_id % 4 = 0 THEN -1 ELSE 0 END
            + CASE WHEN doc_id % 11 = 0 THEN 2 ELSE 0 END)) AS b
        FROM documents
      ), joint AS (
        SELECT lang, a, b, count(*) AS o FROM labeled GROUP BY 1, 2, 3
      ), base AS (
        SELECT lang, CAST(sum(o) AS BIGINT) AS n,
               CAST(sum((a - b) * (a - b) * o) AS BIGINT) AS w_obs,
               CAST(sum(CASE WHEN a <> b THEN o ELSE 0 END) AS BIGINT)
                 AS d_obs
        FROM joint GROUP BY lang
      ), ma AS (
        SELECT lang, a AS ca, count(*) AS na FROM labeled GROUP BY 1, 2
      ), mb AS (
        SELECT lang, b AS cb, count(*) AS nb FROM labeled GROUP BY 1, 2
      ), marg AS (
        SELECT ma.lang,
               CAST(sum((ca - cb) * (ca - cb) * na * nb) AS BIGINT)
                 AS w_exp,
               CAST(sum(CASE WHEN ca <> cb THEN na * nb ELSE 0 END)
                 AS BIGINT) AS d_exp
        FROM ma JOIN mb ON ma.lang = mb.lang
        GROUP BY ma.lang
      )
      SELECT b.lang, b.n, b.w_obs, m.w_exp,
             1.0 - CAST(b.n * b.w_obs AS DOUBLE)
                     / CAST(m.w_exp AS DOUBLE) AS kappa_w,
             1.0 - CAST(b.n * b.d_obs AS DOUBLE)
                     / CAST(m.d_exp AS DOUBLE) AS kappa,
             (1.0 - CAST(b.n * b.w_obs AS DOUBLE)
                      / CAST(m.w_exp AS DOUBLE))
               - (1.0 - CAST(b.n * b.d_obs AS DOUBLE)
                          / CAST(m.d_exp AS DOUBLE)) AS ordinal_gain
      FROM base b JOIN marg m ON b.lang = m.lang
      ORDER BY b.lang"""))

  /** q413: KRUSKAL–WALLIS H TEST (Kruskal & Wallis 1952) — the
    * rank-based k-group location test: q321's Mann–Whitney generalized
    * past two groups, and the distribution-free sibling of q354's
    * ANOVA F (use it when the metric is heavy-tailed and means lie).
    * EXACT RANKS WITHOUT A ROW SORT: ranks depend only on the VALUE
    * SPECTRUM, so mid-ranks come from per-value counts t_v and the
    * running count of smaller values — doubled to stay integer
    * (2·midrank = 2·#less + t_v + 1, the q390 trimmed-t discipline).
    * The cumulative #less rides [[graft.operators.GlobalOrder]]'s
    * range-partitioned cumsum over (panel, v) — never a single-
    * partition window — with the dosed panel's offset removed via one
    * broadcast scalar (both panels hold exactly N rows). Per-group
    * rank sums T_g are exact BIGINTs; H folds over the ≤5 groups in
    * fixed group order (q354's ordered-fold discipline):
    *   H = [12·Σ_g (T_g/2)²/n_g / (N(N+1)) − 3(N+1)] / C,
    * tie correction C = 1 − Σ(t³−t)/(N³−N) from the same value
    * spectrum. N³ is formed on DOUBLES in both engines (exact below
    * N ≈ 2×10⁵ and identically rounded past it; BIGINT N³ would
    * overflow near N ≈ 2×10⁶). Dosed/control: +25% on '1-URGENT'
    * (x + x÷4, swept: control H ≤ 8.7 < 9.488 at every SF, dosed
    * H ≥ 18.7 at sf0.001 growing to 6×10³ at sf0.1). χ²₄ bar at
    * α=.05 is 9.487729. Scale: two hash aggregations over the value
    * spectrum + one range shuffle; group stats are 5 rows/panel. */
  val q413 = Q(
    "q413_kruskal_wallis",
    (s, d) => {
      import graft.Caches.Tracked
      val base = Tables.load(s, d, "orders")
        .select(col("o_orderpriority").as("g"),
          Det.cents(col("o_totalprice")).as("x"))
      val panels = base
        .select(lit("control").as("panel"), col("g"), col("x").as("v"))
        .unionByName(base.select(lit("dosed").as("panel"), col("g"),
          when(col("g") === "1-URGENT", col("x") + expr("x DIV 4"))
            .otherwise(col("x")).as("v")))
        .persistTracked()
      val vals = panels.groupBy(col("panel"), col("v"))
        .agg(count(lit(1)).as("t"))
      val nCtl = vals.filter(col("panel") === "control")
        .groupBy().agg(sum(col("t")).as("n_ctl"))
      val ranked = graft.operators.GlobalOrder
        .withOrderedCumsum(vals, Seq(col("panel"), col("v")), col("t"),
          "cum")
        .crossJoin(broadcast(nCtl))
        .withColumn("tr",
          (col("cum") - col("t") -
            when(col("panel") === "dosed", col("n_ctl")).otherwise(0L))
            * 2L + col("t") + 1L)
        .select(col("panel"), col("v"), col("tr"))
      val gv = panels.groupBy(col("panel"), col("g"), col("v"))
        .agg(count(lit(1)).as("n_gv"))
      val grp = gv.join(ranked, Seq("panel", "v"))
        .groupBy(col("panel"), col("g"))
        .agg(sum(col("n_gv")).as("n_g"),
          sum(col("n_gv") * col("tr")).as("tsum"))
        .withColumn("term",
          col("tsum").cast(DoubleType) * col("tsum").cast(DoubleType) /
            (lit(4.0) * col("n_g").cast(DoubleType)))
      val ties = vals.groupBy(col("panel"))
        .agg(sum(col("t")).as("n"),
          sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
      grp.groupBy(col("panel"))
        .agg(count(lit(1)).as("n_groups"),
          expr("aggregate(array_sort(collect_list(struct(g, term))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x.term)").as("rsum"))
        .join(ties, Seq("panel"))
        .withColumn("h_stat",
          (lit(12.0) * col("rsum") /
            (col("n").cast(DoubleType) *
              (col("n").cast(DoubleType) + 1.0)) -
            lit(3.0) * (col("n").cast(DoubleType) + 1.0)) /
            (lit(1.0) - col("tie3").cast(DoubleType) /
              (col("n").cast(DoubleType) * col("n").cast(DoubleType) *
                col("n").cast(DoubleType) - col("n").cast(DoubleType))))
        .select(col("panel"), col("n"), col("n_groups"), col("tie3"),
          col("h_stat"), (col("h_stat") > 9.487729).as("reject_05"))
        .orderBy(col("panel"))
    },
    Some(s"""
      WITH base AS (
        SELECT o_orderpriority AS g,
               ${Det.centsSql("o_totalprice")} AS x
        FROM orders
      ), panels AS (
        SELECT 'control' AS panel, g, x AS v FROM base
        UNION ALL
        SELECT 'dosed', g,
               CASE WHEN g = '1-URGENT' THEN x + x // 4 ELSE x END
        FROM base
      ), vals AS (
        SELECT panel, v, count(*) AS t FROM panels GROUP BY 1, 2
      ), ranked AS (
        SELECT panel, v,
               coalesce(sum(t) OVER (PARTITION BY panel ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 * 2 + t + 1 AS tr
        FROM vals
      ), gv AS (
        SELECT panel, g, v, count(*) AS n_gv FROM panels GROUP BY 1, 2, 3
      ), grp AS (
        SELECT gv.panel, g,
               CAST(sum(n_gv) AS BIGINT) AS n_g,
               CAST(sum(n_gv * tr) AS BIGINT) AS tsum
        FROM gv JOIN ranked ON gv.panel = ranked.panel AND gv.v = ranked.v
        GROUP BY 1, 2
      ), terms AS (
        SELECT panel, g, n_g, tsum,
               CAST(tsum AS DOUBLE) * CAST(tsum AS DOUBLE)
                 / (4.0 * CAST(n_g AS DOUBLE)) AS term
        FROM grp
      ), folded AS (
        SELECT panel, count(*) AS n_groups,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(term ORDER BY g)), (acc, x) -> acc + x) AS rsum
        FROM terms GROUP BY panel
      ), ties AS (
        SELECT panel, CAST(sum(t) AS BIGINT) AS n,
               CAST(sum(t * t * t - t) AS BIGINT) AS tie3
        FROM vals GROUP BY panel
      ), hs AS (
        SELECT f.panel, t2.n, f.n_groups, t2.tie3,
               (12.0 * f.rsum
                  / (CAST(t2.n AS DOUBLE) * (CAST(t2.n AS DOUBLE) + 1.0))
                - 3.0 * (CAST(t2.n AS DOUBLE) + 1.0))
               / (1.0 - CAST(t2.tie3 AS DOUBLE)
                  / (CAST(t2.n AS DOUBLE) * CAST(t2.n AS DOUBLE)
                     * CAST(t2.n AS DOUBLE) - CAST(t2.n AS DOUBLE)))
                 AS h_stat
        FROM folded f JOIN ties t2 ON f.panel = t2.panel
      )
      SELECT panel, n, n_groups, tie3, h_stat,
             h_stat > 9.487729 AS reject_05
      FROM hs
      ORDER BY panel"""))

  /** q414: BROWN–FORSYTHE ROBUST VARIANCE-HOMOGENEITY TEST (Levene
    * 1960; the median-centered variant of Brown & Forsythe 1974) —
    * "are the groups equally SPREAD?", the pre-flight check q354's
    * ANOVA assumes away, in the median-centered form that keeps its
    * level under heavy tails. Mechanics: z_ij = |x_ij − med_g|, then
    * the one-way F on z. EXACT MOMENTS: med_g over integer cents is a
    * half-integer (exact 0.5-interpolation), so w = 2·z = |2x − 2·med|
    * is an EXACT INTEGER (half-cent units) — cast to BIGINT and run
    * q354's exact wide-integer moment discipline (Σw BIGINT, Σw²
    * DECIMAL(38)/HUGEINT, SSW numerator n·Σw² − (Σw)² exact); the ×4
    * unit factor cancels in F. SSB/SSW fold across the ≤5 groups in
    * fixed group order (ordered-fold discipline), so F bit-agrees
    * cross-engine. Dosed/control: '1-URGENT' spread DOUBLED (v = 2x —
    * location is irrelevant, the test recenters per group; swept:
    * control F ≤ 2.43 at every SF, dosed F ≥ 94.7). Flag at the
    * α=.01 asymptotic bar F(4,∞) = χ²₄/4 = 3.3192 — the sf0.01
    * control sits at 2.43, above the .05 bar but with natural
    * heteroscedasticity only; the 1% bar separates cleanly. Scale:
    * one scan to per-group medians (bounded rollup), one scan to
    * moments; the fold runs on 5 rows/panel. */
  val q414 = Q(
    "q414_brown_forsythe",
    (s, d) => {
      import graft.Caches.Tracked
      val base = Tables.load(s, d, "orders")
        .select(col("o_orderpriority").as("g"),
          Det.cents(col("o_totalprice")).as("x"))
      val panels = base
        .select(lit("control").as("panel"), col("g"), col("x").as("v"))
        .unionByName(base.select(lit("dosed").as("panel"), col("g"),
          when(col("g") === "1-URGENT", col("x") * 2L)
            .otherwise(col("x")).as("v")))
        .persistTracked()
      val med = panels.groupBy(col("panel"), col("g"))
        .agg(expr("percentile(v, 0.5D)").as("m"))
      val moments = panels.join(broadcast(med), Seq("panel", "g"))
        .withColumn("w",
          abs(col("v").cast(DoubleType) * 2.0 - col("m") * 2.0)
            .cast(LongType))
        .groupBy(col("panel"), col("g"))
        .agg(count(lit(1)).as("n_g"),
          sum(col("w")).as("sw"),
          sum(col("w").cast(DecimalType(38, 0)) *
            col("w").cast(DecimalType(38, 0))).as("sww"))
      val grand = moments.groupBy(col("panel"))
        .agg(sum(col("n_g")).as("n_total"),
          sum(col("sw")).as("t_sum"),
          count(lit(1)).as("k"))
      val per = moments.join(broadcast(grand), Seq("panel"))
        .withColumn("mean_g",
          col("sw").cast(DoubleType) / col("n_g").cast(DoubleType))
        .withColumn("grand_mean",
          col("t_sum").cast(DoubleType) / col("n_total").cast(DoubleType))
        .withColumn("ssw_g",
          (col("n_g").cast(DecimalType(38, 0)) * col("sww") -
            col("sw").cast(DecimalType(38, 0)) *
              col("sw").cast(DecimalType(38, 0))).cast(DoubleType) /
            col("n_g").cast(DoubleType))
        .withColumn("ssb_g",
          col("n_g").cast(DoubleType) *
            (col("mean_g") - col("grand_mean")) *
            (col("mean_g") - col("grand_mean")))
      per.groupBy(col("panel"), col("n_total"), col("k"))
        .agg(
          expr("aggregate(array_sort(collect_list(struct(g, ssb_g))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x.ssb_g)")
            .as("ss_between"),
          expr("aggregate(array_sort(collect_list(struct(g, ssw_g))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x.ssw_g)")
            .as("ss_within"))
        .select(
          col("panel"), col("k").as("n_groups"), col("n_total"),
          col("ss_between"), col("ss_within"),
          ((col("ss_between") / (col("k") - 1).cast(DoubleType)) /
            (col("ss_within") /
              (col("n_total") - col("k")).cast(DoubleType)))
            .as("f_stat"))
        .withColumn("reject_01", col("f_stat") > 3.3192)
        .orderBy(col("panel"))
    },
    Some(s"""
      WITH base AS (
        SELECT o_orderpriority AS g,
               ${Det.centsSql("o_totalprice")} AS x
        FROM orders
      ), panels AS (
        SELECT 'control' AS panel, g, x AS v FROM base
        UNION ALL
        SELECT 'dosed', g,
               CASE WHEN g = '1-URGENT' THEN 2 * x ELSE x END
        FROM base
      ), med AS (
        SELECT panel, g, quantile_cont(v, 0.5) AS m
        FROM panels GROUP BY 1, 2
      ), moments AS (
        SELECT p.panel, p.g, count(*) AS n_g,
               CAST(sum(CAST(abs(CAST(v AS DOUBLE) * 2.0 - m * 2.0)
                 AS BIGINT)) AS BIGINT) AS sw,
               sum(CAST(CAST(abs(CAST(v AS DOUBLE) * 2.0 - m * 2.0)
                 AS BIGINT) AS HUGEINT)
                 * CAST(CAST(abs(CAST(v AS DOUBLE) * 2.0 - m * 2.0)
                 AS BIGINT) AS HUGEINT)) AS sww
        FROM panels p JOIN med USING (panel, g)
        GROUP BY 1, 2
      ), grand AS (
        SELECT panel, CAST(sum(n_g) AS BIGINT) AS n_total,
               CAST(sum(sw) AS BIGINT) AS t_sum, count(*) AS k
        FROM moments GROUP BY panel
      ), per AS (
        SELECT m2.panel, m2.g, g2.n_total, g2.k,
               ${Det.hugeDoubleSql(
                 """CAST(m2.n_g AS HUGEINT) * m2.sww
                      - CAST(m2.sw AS HUGEINT) * CAST(m2.sw AS HUGEINT)""")}
                 / CAST(m2.n_g AS DOUBLE) AS ssw_g,
               CAST(m2.n_g AS DOUBLE)
                 * (CAST(m2.sw AS DOUBLE) / CAST(m2.n_g AS DOUBLE)
                    - CAST(g2.t_sum AS DOUBLE) / CAST(g2.n_total AS DOUBLE))
                 * (CAST(m2.sw AS DOUBLE) / CAST(m2.n_g AS DOUBLE)
                    - CAST(g2.t_sum AS DOUBLE) / CAST(g2.n_total AS DOUBLE))
                 AS ssb_g
        FROM moments m2 JOIN grand g2 ON m2.panel = g2.panel
      ), folded AS (
        SELECT panel, n_total, k,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(ssb_g ORDER BY g)), (acc, x) -> acc + x)
                 AS ss_between,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(ssw_g ORDER BY g)), (acc, x) -> acc + x)
                 AS ss_within
        FROM per GROUP BY panel, n_total, k
      )
      SELECT panel, k AS n_groups, n_total, ss_between, ss_within,
             (ss_between / CAST(k - 1 AS DOUBLE))
               / (ss_within / CAST(n_total - k AS DOUBLE)) AS f_stat,
             (ss_between / CAST(k - 1 AS DOUBLE))
               / (ss_within / CAST(n_total - k AS DOUBLE)) > 3.3192
               AS reject_01
      FROM folded
      ORDER BY panel"""))

  /** q416: WILCOXON SIGNED-RANK TEST (Wilcoxon 1945) — the PAIRED
    * complement of q321's Mann–Whitney: per-customer A/B revenue
    * deltas, ranked by |Δ|, asking whether the B arm systematically
    * shifts spend. The pairing is a HASH SPLIT of each customer's
    * orders (md5-nibble parity of o_orderkey via [[Det.hashParityExpr]]
    * — exchangeable by construction; calendar pairings were measured
    * biased: even/odd months carry month-length asymmetry to z = −6.4
    * at sf0.1). EXACT RANKS, q413's spectrum discipline: zero deltas
    * dropped (Wilcoxon's rule), |Δ| ranked via per-value counts +
    * GlobalOrder's range-partitioned cumsum, doubled mid-ranks
    * (tr = 2·#less + t + 1) so W2 = 2·W₊ = Σ_pos tr is an exact
    * BIGINT. z = (W2 − n(n+1)/2)/√((2n(n+1)(2n+1) − Σ(t³−t))/12) with
    * the variance polynomial formed on DOUBLES (exact below n ≈ 10⁵,
    * BIGINT would overflow near n ≈ 1.6×10⁶ pairs, identically rounded
    * past either). Dosed/control: +40% on the B arm (swept: control
    * |z| ≤ 1.73 < 1.96 at every SF, dosed z ≥ 4.06 at sf0.001 growing
    * to 49 at sf0.1). Scale: one scan to per-customer arm sums, then
    * the delta-spectrum shuffle — linear, no pair joins. */
  val q416 = Q(
    "q416_wilcoxon_signed_rank",
    (s, d) => {
      import graft.Caches.Tracked
      val halves = Tables.load(s, d, "orders")
        .select(col("o_custkey").as("ck"),
          expr(Det.hashParityExpr("o_orderkey")).as("arm_a"),
          Det.cents(col("o_totalprice")).as("x"))
        .groupBy(col("ck"))
        .agg(
          sum(when(col("arm_a"), col("x")).otherwise(0L)).as("r1"),
          sum(when(!col("arm_a"), col("x")).otherwise(0L)).as("r2"),
          max(when(col("arm_a"), 1L).otherwise(0L)).as("h1"),
          max(when(!col("arm_a"), 1L).otherwise(0L)).as("h2"))
        .filter(col("h1") === 1L && col("h2") === 1L)
      val panels = halves
        .select(lit("control").as("panel"),
          (col("r2") - col("r1")).as("dd"))
        .unionByName(halves.select(lit("dosed").as("panel"),
          (col("r2") + expr("r2 * 2 DIV 5") - col("r1")).as("dd")))
        .filter(col("dd") =!= 0L)
        .select(col("panel"), abs(col("dd")).as("ad"),
          (col("dd") > 0L).as("pos"))
        .persistTracked()
      val vals = panels.groupBy(col("panel"), col("ad"))
        .agg(count(lit(1)).as("t"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("npos"))
      val nCtl = vals.filter(col("panel") === "control")
        .groupBy().agg(sum(col("t")).as("n_ctl"))
      val ranked = graft.operators.GlobalOrder
        .withOrderedCumsum(vals, Seq(col("panel"), col("ad")), col("t"),
          "cum")
        .crossJoin(broadcast(nCtl))
        .withColumn("tr",
          (col("cum") - col("t") -
            when(col("panel") === "dosed", col("n_ctl")).otherwise(0L))
            * 2L + col("t") + 1L)
      ranked.groupBy(col("panel"))
        .agg(
          sum(col("t")).as("n_pairs"),
          sum(col("npos") * col("tr")).as("w2"),
          sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
        .withColumn("n_d", col("n_pairs").cast(DoubleType))
        .withColumn("z_stat",
          (col("w2").cast(DoubleType) -
            col("n_d") * (col("n_d") + 1.0) / 2.0) /
            sqrt((lit(2.0) * col("n_d") * (col("n_d") + 1.0) *
              (lit(2.0) * col("n_d") + 1.0) -
              col("tie3").cast(DoubleType)) / lit(12.0)))
        .select(col("panel"), col("n_pairs"), col("w2"), col("tie3"),
          col("z_stat"), (abs(col("z_stat")) > 1.959964).as("reject_05"))
        .orderBy(col("panel"))
    },
    Some(s"""
      WITH halves AS (
        SELECT o_custkey AS ck,
               CAST(sum(CASE WHEN ${Det.hashParitySql("o_orderkey")}
                 THEN ${Det.centsSql("o_totalprice")} ELSE 0 END)
                 AS BIGINT) AS r1,
               CAST(sum(CASE WHEN NOT (${Det.hashParitySql("o_orderkey")})
                 THEN ${Det.centsSql("o_totalprice")} ELSE 0 END)
                 AS BIGINT) AS r2,
               max(CASE WHEN ${Det.hashParitySql("o_orderkey")}
                 THEN 1 ELSE 0 END) AS h1,
               max(CASE WHEN NOT (${Det.hashParitySql("o_orderkey")})
                 THEN 1 ELSE 0 END) AS h2
        FROM orders GROUP BY o_custkey
      ), deltas AS (
        SELECT panel, abs(dd) AS ad, dd > 0 AS pos
        FROM (
          SELECT 'control' AS panel, r2 - r1 AS dd
          FROM halves WHERE h1 = 1 AND h2 = 1
          UNION ALL
          SELECT 'dosed', r2 + r2 * 2 // 5 - r1
          FROM halves WHERE h1 = 1 AND h2 = 1
        ) WHERE dd <> 0
      ), vals AS (
        SELECT panel, ad, count(*) AS t,
               CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                 AS npos
        FROM deltas GROUP BY 1, 2
      ), ranked AS (
        SELECT panel, t, npos,
               coalesce(sum(t) OVER (PARTITION BY panel ORDER BY ad
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 * 2 + t + 1 AS tr
        FROM vals
      ), stats AS (
        SELECT panel,
               CAST(sum(t) AS BIGINT) AS n_pairs,
               CAST(sum(npos * tr) AS BIGINT) AS w2,
               CAST(sum(t * t * t - t) AS BIGINT) AS tie3
        FROM ranked GROUP BY panel
      ), zs AS (
        SELECT panel, n_pairs, w2, tie3,
               (CAST(w2 AS DOUBLE) - CAST(n_pairs AS DOUBLE)
                  * (CAST(n_pairs AS DOUBLE) + 1.0) / 2.0)
               / sqrt((2.0 * CAST(n_pairs AS DOUBLE)
                  * (CAST(n_pairs AS DOUBLE) + 1.0)
                  * (2.0 * CAST(n_pairs AS DOUBLE) + 1.0)
                  - CAST(tie3 AS DOUBLE)) / 12.0) AS z_stat
        FROM stats
      )
      SELECT panel, n_pairs, w2, tie3, z_stat,
             abs(z_stat) > 1.959964 AS reject_05
      FROM zs
      ORDER BY panel"""))

  /** q420: EFFECT-SIZE REPORT — Cohen's d, Hedges' g, Cliff's δ, and
    * the common-language effect size (Cohen 1988; Hedges 1981; Cliff
    * 1993; McGraw & Wong 1992) for an A/B revenue comparison: the
    * MAGNITUDE readout that belongs next to every p-value this family
    * emits (q346/q321 say "is there an effect", this says "how big,
    * in units a decision can use"). Arms = [[Det.hashParityExpr]]'s
    * md5 order split (q416's exchangeable-by-construction pairing,
    * here unpaired). EXACT: d = (m_b − m_a)/s_pooled from the q346/
    * q354 wide-integer moments (n, Σx BIGINT, Σx² DECIMAL(38)/
    * HUGEINT; SS numerators n·Σx² − (Σx)² exact); Hedges'
    * J = 1 − 3/(4·df − 1) is one division; Cliff's δ WITHOUT the pair
    * join — with combined doubled mid-ranks (q413's spectrum
    * discipline), 2U = W2_b − n_b(n_b+1) is an exact BIGINT and
    * δ = 2U/(n_a·n_b) − 1, CL = 2U/(2·n_a·n_b). Dosed/control: +10%
    * on the B arm (swept: control |d| ≤ 0.028, |δ| ≤ 0.016 at every
    * SF; dosed d ≥ 0.136, δ ≥ 0.074 — a textbook "small effect" the
    * report must resolve from zero). Scale: one scan to arm moments +
    * one value-spectrum shuffle; no O(n²) anywhere. */
  val q420 = Q(
    "q420_effect_sizes",
    (s, d) => {
      import graft.Caches.Tracked
      val base = Tables.load(s, d, "orders")
        .select(
          when(expr(Det.hashParityExpr("o_orderkey")), lit("b"))
            .otherwise(lit("a")).as("arm"),
          Det.cents(col("o_totalprice")).as("x"))
      val panels = base
        .select(lit("control").as("panel"), col("arm"), col("x").as("v"))
        .unionByName(base.select(lit("dosed").as("panel"), col("arm"),
          when(col("arm") === "b", col("x") + expr("x DIV 10"))
            .otherwise(col("x")).as("v")))
        .persistTracked()
      val m = panels.groupBy(col("panel"), col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sx"),
          sum(col("v").cast(DecimalType(38, 0)) *
            col("v").cast(DecimalType(38, 0))).as("sxx"))
        .withColumn("ss",
          (col("n").cast(DecimalType(38, 0)) * col("sxx") -
            col("sx").cast(DecimalType(38, 0)) *
              col("sx").cast(DecimalType(38, 0))).cast(DoubleType) /
            col("n").cast(DoubleType))
      val wide = m.groupBy(col("panel"))
        .agg(
          max(when(col("arm") === "a", col("n"))).as("n_a"),
          max(when(col("arm") === "b", col("n"))).as("n_b"),
          max(when(col("arm") === "a", col("sx"))).as("sx_a"),
          max(when(col("arm") === "b", col("sx"))).as("sx_b"),
          max(when(col("arm") === "a", col("ss"))).as("ss_a"),
          max(when(col("arm") === "b", col("ss"))).as("ss_b"))
      // Cliff via combined doubled mid-ranks over the value spectrum
      val vals = panels.groupBy(col("panel"), col("v"))
        .agg(count(lit(1)).as("t"),
          sum(when(col("arm") === "b", 1L).otherwise(0L)).as("tb"))
      val nCtl = vals.filter(col("panel") === "control")
        .groupBy().agg(sum(col("t")).as("n_ctl"))
      val w2b = graft.operators.GlobalOrder
        .withOrderedCumsum(vals, Seq(col("panel"), col("v")), col("t"),
          "cum")
        .crossJoin(broadcast(nCtl))
        .withColumn("tr",
          (col("cum") - col("t") -
            when(col("panel") === "dosed", col("n_ctl")).otherwise(0L))
            * 2L + col("t") + 1L)
        .groupBy(col("panel"))
        .agg(sum(col("tb") * col("tr")).as("w2_b"))
      wide.join(w2b, Seq("panel"))
        .withColumn("df", (col("n_a") + col("n_b") - 2L).cast(DoubleType))
        .withColumn("mean_a",
          col("sx_a").cast(DoubleType) / col("n_a").cast(DoubleType))
        .withColumn("mean_b",
          col("sx_b").cast(DoubleType) / col("n_b").cast(DoubleType))
        .withColumn("cohen_d",
          (col("mean_b") - col("mean_a")) /
            sqrt((col("ss_a") + col("ss_b")) / col("df")))
        .withColumn("hedges_g",
          col("cohen_d") * (lit(1.0) - lit(3.0) /
            (lit(4.0) * col("df") - 1.0)))
        .withColumn("u2",
          col("w2_b") - col("n_b") * (col("n_b") + 1L))
        .withColumn("cliffs_delta",
          col("u2").cast(DoubleType) /
            (col("n_a") * col("n_b")).cast(DoubleType) - 1.0)
        .withColumn("cl_effect",
          col("u2").cast(DoubleType) /
            (lit(2.0) * (col("n_a") * col("n_b")).cast(DoubleType)))
        .select(col("panel"), col("n_a"), col("n_b"), col("cohen_d"),
          col("hedges_g"), col("cliffs_delta"), col("cl_effect"))
        .orderBy(col("panel"))
    },
    Some(s"""
      WITH base AS (
        SELECT CASE WHEN ${Det.hashParitySql("o_orderkey")}
                    THEN 'b' ELSE 'a' END AS arm,
               ${Det.centsSql("o_totalprice")} AS x
        FROM orders
      ), panels AS (
        SELECT 'control' AS panel, arm, x AS v FROM base
        UNION ALL
        SELECT 'dosed', arm,
               CASE WHEN arm = 'b' THEN x + x // 10 ELSE x END
        FROM base
      ), m AS (
        SELECT panel, arm, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS sx,
               sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS sxx
        FROM panels GROUP BY 1, 2
      ), ss AS (
        SELECT panel, arm, n, sx,
               ${Det.hugeDoubleSql(
                 """CAST(n AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)""")}
                 / CAST(n AS DOUBLE) AS ss
        FROM m
      ), wide AS (
        SELECT panel,
               max(CASE WHEN arm = 'a' THEN n END) AS n_a,
               max(CASE WHEN arm = 'b' THEN n END) AS n_b,
               max(CASE WHEN arm = 'a' THEN sx END) AS sx_a,
               max(CASE WHEN arm = 'b' THEN sx END) AS sx_b,
               max(CASE WHEN arm = 'a' THEN ss END) AS ss_a,
               max(CASE WHEN arm = 'b' THEN ss END) AS ss_b
        FROM ss GROUP BY panel
      ), vals AS (
        SELECT panel, v, count(*) AS t,
               CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END)
                 AS BIGINT) AS tb
        FROM panels GROUP BY 1, 2
      ), ranked AS (
        SELECT panel, t, tb,
               coalesce(sum(t) OVER (PARTITION BY panel ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 * 2 + t + 1 AS tr
        FROM vals
      ), w2 AS (
        SELECT panel, CAST(sum(tb * tr) AS BIGINT) AS w2_b
        FROM ranked GROUP BY panel
      ), calc AS (
        SELECT w.panel, n_a, n_b,
               CAST(n_a + n_b - 2 AS DOUBLE) AS df,
               CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                 - CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS md,
               ss_a + ss_b AS sstot,
               w2_b - n_b * (n_b + 1) AS u2
        FROM wide w JOIN w2 ON w.panel = w2.panel
      )
      SELECT panel, n_a, n_b,
             md / sqrt(sstot / df) AS cohen_d,
             md / sqrt(sstot / df) * (1.0 - 3.0 / (4.0 * df - 1.0))
               AS hedges_g,
             CAST(u2 AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) - 1.0
               AS cliffs_delta,
             CAST(u2 AS DOUBLE) / (2.0 * CAST(n_a * n_b AS DOUBLE))
               AS cl_effect
      FROM calc
      ORDER BY panel"""))

  /** q422: ADJUSTED RAND INDEX (Hubert & Arabie 1985) — the
    * chance-corrected agreement between two PARTITIONS of the corpus:
    * the clustering-evaluation readout for q283's LPA communities,
    * q68's dedup clusters, or any unsupervised labeling against a
    * reference, in the log-free form (NMI needs ln; ARI is pure pair
    * combinatorics). With joint counts n_ij, marginals a_i/b_j, pair
    * sums P = ΣC(n_ij,2), A = ΣC(a_i,2), B = ΣC(b_j,2), C₂ = C(n,2):
    *   ARI = (2·C₂·P − 2·A·B) / (C₂·(A+B) − 2·A·B)
    * — the expected-index denominators cleared to EXACT INTEGER
    * numerator and denominator (products on DECIMAL(38)/HUGEINT:
    * C₂·P ≈ 10²² at 100× fixture scale, headroom to 10³⁸), one IEEE
    * division. Dosed/control: reference partition = lang; control
    * candidate = an md5 5-bucket of doc_id (independent by
    * construction → ARI ≈ 0, the chance correction visibly working —
    * the UNadjusted Rand of these partitions is ≈ 0.68); dosed
    * candidate = lang with doc_id%5=0 rows scattered to the hash
    * bucket (a 4/5-recovered clustering → ARI ≈ 0.72 at every SF).
    * Scale: one scan to (panel, x, y) joint counts — contingency is
    * |langs|×5 per panel, metadata-sized. */
  val q422 = Q(
    "q422_adjusted_rand",
    (s, d) => {
      import graft.Caches.Tracked
      val base = Tables.load(s, d, "documents")
        .select(col("lang").as("xl"),
          expr("CAST(instr('0123456789abcdef', " +
            "substring(md5(CAST(doc_id AS STRING)), 32, 1)) % 5 " +
            "AS STRING)").as("hb"),
          (col("doc_id") % 5 === 0).as("noisy"))
      val panels = base
        .select(lit("control").as("panel"), col("xl"), col("hb").as("yl"))
        .unionByName(base.select(lit("dosed").as("panel"), col("xl"),
          when(col("noisy"), col("hb")).otherwise(col("xl")).as("yl")))
        .persistTracked()
      val pairs = expr("c * (c - 1) DIV 2")
      val p = panels.groupBy(col("panel"), col("xl"), col("yl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("panel"))
        .agg(sum(pairs).as("p_pairs"), sum(col("c")).as("n"))
      val a = panels.groupBy(col("panel"), col("xl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("panel")).agg(sum(pairs).as("a_pairs"))
      val b = panels.groupBy(col("panel"), col("yl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("panel")).agg(sum(pairs).as("b_pairs"))
      p.join(a, Seq("panel")).join(b, Seq("panel"))
        .withColumn("c2", expr("n * (n - 1) DIV 2"))
        .select(col("panel"), col("n"), col("p_pairs"), col("a_pairs"),
          col("b_pairs"),
          ((lit(2L).cast(DecimalType(38, 0)) *
            col("c2").cast(DecimalType(38, 0)) *
            col("p_pairs").cast(DecimalType(38, 0)) -
            lit(2L).cast(DecimalType(38, 0)) *
              col("a_pairs").cast(DecimalType(38, 0)) *
              col("b_pairs").cast(DecimalType(38, 0))).cast(DoubleType) /
            (col("c2").cast(DecimalType(38, 0)) *
              (col("a_pairs") + col("b_pairs")).cast(DecimalType(38, 0)) -
              lit(2L).cast(DecimalType(38, 0)) *
                col("a_pairs").cast(DecimalType(38, 0)) *
                col("b_pairs").cast(DecimalType(38, 0))).cast(DoubleType))
            .as("ari"))
        .orderBy(col("panel"))
    },
    Some(s"""
      WITH base AS (
        SELECT lang AS xl,
               CAST(strpos('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) % 5
                 AS VARCHAR) AS hb,
               doc_id % 5 = 0 AS noisy
        FROM documents
      ), panels AS (
        SELECT 'control' AS panel, xl, hb AS yl FROM base
        UNION ALL
        SELECT 'dosed', xl, CASE WHEN noisy THEN hb ELSE xl END
        FROM base
      ), p AS (
        SELECT panel,
               CAST(sum(c * (c - 1) // 2) AS BIGINT) AS p_pairs,
               CAST(sum(c) AS BIGINT) AS n
        FROM (SELECT panel, xl, yl, count(*) AS c
              FROM panels GROUP BY 1, 2, 3)
        GROUP BY panel
      ), a AS (
        SELECT panel, CAST(sum(c * (c - 1) // 2) AS BIGINT) AS a_pairs
        FROM (SELECT panel, xl, count(*) AS c FROM panels GROUP BY 1, 2)
        GROUP BY panel
      ), b AS (
        SELECT panel, CAST(sum(c * (c - 1) // 2) AS BIGINT) AS b_pairs
        FROM (SELECT panel, yl, count(*) AS c FROM panels GROUP BY 1, 2)
        GROUP BY panel
      )
      SELECT p.panel, n, p_pairs, a_pairs, b_pairs,
             ${Det.hugeDoubleSql(
               """2 * CAST(n * (n - 1) // 2 AS HUGEINT)
                    * CAST(p_pairs AS HUGEINT)
                  - 2 * CAST(a_pairs AS HUGEINT)
                    * CAST(b_pairs AS HUGEINT)""")}
             / ${Det.hugeDoubleSql(
               """CAST(n * (n - 1) // 2 AS HUGEINT)
                    * CAST(a_pairs + b_pairs AS HUGEINT)
                  - 2 * CAST(a_pairs AS HUGEINT)
                    * CAST(b_pairs AS HUGEINT)""")} AS ari
      FROM p JOIN a ON p.panel = a.panel JOIN b ON p.panel = b.panel
      ORDER BY p.panel"""))

  /** q423: CRONBACH'S ALPHA (Cronbach 1951) — internal consistency of
    * a k-item score battery: do the per-document subscores measure ONE
    * underlying construct (α → 1) or k unrelated things (α → 0)? The
    * reliability gate before averaging rubric items into a single
    * quality score (q84's composite assumes it; this op tests it).
    * EXACT: α = k/(k−1) · (1 − ΣV_i / V_t) where every variance enters
    * as its SS NUMERATOR n·Σx² − (Σx)² (the q354 discipline) — the
    * 1/n² scale cancels in the ratio, the item-numerator SUM is an
    * exact integer sum (order-free), and α is one division of exact
    * operands. Items are DECIMAL(38)-squared for 100× headroom. Dosed
    * panel: 4 subscores all driven by n_chars (+ small id-lattice
    * jitter) → α ≈ 0.98; control panel: 4 independent id-lattice
    * pseudo-scores → α ≈ 0 (slightly negative is legitimate — the
    * estimator is unbiased around zero for independent items). Scale:
    * one scan, k·|panel| moment rows — the unpivot is 4 rows per doc. */
  val q423 = Q(
    "q423_cronbach_alpha",
    (s, d) => {
      import graft.Caches.Tracked
      val base = Tables.load(s, d, "documents")
        .withColumn("n_spaces",
          (length(col("text")) -
            length(regexp_replace(col("text"), " ", "")))
            .cast(LongType))
        .select(col("doc_id"), col("n_chars"), col("n_spaces"))
      val scored = base.select(
        lit("dosed").as("panel"),
        col("n_chars").as("i1"),
        (col("n_chars") + (col("doc_id") * 7) % 50).as("i2"),
        (col("n_spaces") * 5L).as("i3"),
        (expr("n_chars DIV 2") + (col("doc_id") * 13) % 40).as("i4"))
        .unionByName(base.select(
          lit("control").as("panel"),
          ((col("doc_id") * 7) % 97).as("i1"),
          ((col("doc_id") * 13) % 89).as("i2"),
          ((col("doc_id") * 29) % 83).as("i3"),
          ((col("doc_id") * 37) % 79).as("i4")))
        .persistTracked()
      def ssNum(n: Column, sx: Column, sxx: Column): Column =
        (n.cast(DecimalType(38, 0)) * sxx -
          sx.cast(DecimalType(38, 0)) * sx.cast(DecimalType(38, 0)))
      val items = scored.select(col("panel"), explode(array(
          struct(lit(1L).as("item"), col("i1").as("x")),
          struct(lit(2L).as("item"), col("i2").as("x")),
          struct(lit(3L).as("item"), col("i3").as("x")),
          struct(lit(4L).as("item"), col("i4").as("x")))).as("e"))
        .select(col("panel"), col("e.item"), col("e.x"))
        .groupBy(col("panel"), col("item"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x").cast(DecimalType(38, 0)) *
            col("x").cast(DecimalType(38, 0))).as("sxx"))
        .groupBy(col("panel"))
        .agg(max(col("n")).as("n"),
          sum(ssNum(col("n"), col("sx"), col("sxx")))
            .as("vi_sum"))
      val tot = scored
        .select(col("panel"),
          (col("i1") + col("i2") + col("i3") + col("i4")).as("t"))
        .groupBy(col("panel"))
        .agg(count(lit(1)).as("n2"), sum(col("t")).as("st"),
          sum(col("t").cast(DecimalType(38, 0)) *
            col("t").cast(DecimalType(38, 0))).as("stt"))
        .select(col("panel"),
          ssNum(col("n2"), col("st"), col("stt")).as("vt"))
      items.join(tot, Seq("panel"))
        .select(col("panel"), col("n"),
          col("vi_sum").cast(DoubleType).as("vi_sum"),
          col("vt").cast(DoubleType).as("vt"),
          (lit(4.0) / 3.0 * (lit(1.0) -
            col("vi_sum").cast(DoubleType) / col("vt").cast(DoubleType)))
            .as("alpha"))
        .orderBy(col("panel"))
    },
    Some("""
      WITH base AS (
        SELECT doc_id, n_chars,
               CAST(length(text) - length(replace(text, ' ', ''))
                 AS BIGINT) AS n_spaces
        FROM documents
      ), scored AS (
        SELECT 'dosed' AS panel, n_chars AS i1,
               n_chars + (doc_id * 7) % 50 AS i2,
               n_spaces * 5 AS i3,
               n_chars // 2 + (doc_id * 13) % 40 AS i4
        FROM base
        UNION ALL
        SELECT 'control', (doc_id * 7) % 97, (doc_id * 13) % 89,
               (doc_id * 29) % 83, (doc_id * 37) % 79
        FROM base
      ), items AS (
        SELECT panel, item, count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
        FROM (
          SELECT panel, u.item, u.x
          FROM scored, unnest([
            {item: 1, x: i1}, {item: 2, x: i2},
            {item: 3, x: i3}, {item: 4, x: i4}]) AS t(u)
        ) GROUP BY 1, 2
      ), vi AS (
        SELECT panel, CAST(max(n) AS BIGINT) AS n,
               sum(CAST(n AS HUGEINT) * sxx
                   - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)) AS vi_sum
        FROM items GROUP BY panel
      ), vt AS (
        SELECT panel,
               CAST(count(*) AS HUGEINT)
                 * sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT))
                 - CAST(sum(t) AS HUGEINT) * CAST(sum(t) AS HUGEINT)
                 AS vt
        FROM (SELECT panel, i1 + i2 + i3 + i4 AS t FROM scored)
        GROUP BY panel
      )
      SELECT vi.panel, n,
             CAST(vi_sum AS DOUBLE) AS vi_sum,
             CAST(vt AS DOUBLE) AS vt,
             4.0 / 3.0 * (1.0 - CAST(vi_sum AS DOUBLE)
                                / CAST(vt AS DOUBLE)) AS alpha
      FROM vi JOIN vt ON vi.panel = vt.panel
      ORDER BY vi.panel"""))

  /** q424: COCHRAN–MANTEL–HAENSZEL TEST (Cochran 1954; Mantel &
    * Haenszel 1959) — the stratified 2×2 association test: does the B
    * arm raise the high-value-order rate WITHIN strata? The formal
    * companion to q368's Simpson's-paradox detector (q368 exhibits
    * confounding; CMH tests association with the confounder CONTROLLED
    * by conditioning on o_orderpriority strata). Continuity-
    * uncorrected form (documented): CMH = (Σ_s a_s − E_s)² / Σ_s V_s,
    * E_s = n1·m1/n, V_s = n1·n2·m1·m2/(n²(n−1)) — all counts exact
    * BIGINTs, E/V formed on DOUBLES (the count product reaches 10²⁴ at
    * 100× scale — past BIGINT, identical-rounding doubles by design),
    * both Σ folded over the 5 strata in fixed stratum order (q354's
    * ordered-fold discipline). Outcome = totalprice cents > 25000000
    * (the corpus median — maximal count sensitivity; the first dose at
    * the $150k first-quartile threshold was power-starved at sf0.001).
    * Arms = [[Det.hashParityExpr]]. Dosed/control: +25% on B (swept:
    * control CMH ≤ 0.58 ≪ 3.841 = χ²₁ at α=.05, dosed ≥ 10.2).
    * Scale: one scan to per-(panel, stratum) counts — 10 rows. */
  val q424 = Q(
    "q424_cmh_test",
    (s, d) => {
      import graft.Caches.Tracked
      val base = Tables.load(s, d, "orders")
        .select(col("o_orderpriority").as("g"),
          expr(Det.hashParityExpr("o_orderkey")).as("armb"),
          Det.cents(col("o_totalprice")).as("x"))
      val panels = base
        .select(lit("control").as("panel"), col("g"), col("armb"),
          col("x").as("v"))
        .unionByName(base.select(lit("dosed").as("panel"), col("g"),
          col("armb"),
          when(col("armb"), col("x") + expr("x DIV 4")).otherwise(col("x"))
            .as("v")))
      val strata = panels.groupBy(col("panel"), col("g"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("armb"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("v") > 25000000L, 1L).otherwise(0L)).as("m1"),
          sum(when(col("armb") && col("v") > 25000000L, 1L).otherwise(0L))
            .as("a11"))
        .withColumn("num_s",
          col("a11").cast(DoubleType) -
            col("n1").cast(DoubleType) * col("m1").cast(DoubleType) /
              col("n").cast(DoubleType))
        .withColumn("var_s",
          col("n1").cast(DoubleType) *
            (col("n") - col("n1")).cast(DoubleType) *
            col("m1").cast(DoubleType) *
            (col("n") - col("m1")).cast(DoubleType) /
            (col("n").cast(DoubleType) * col("n").cast(DoubleType) *
              (col("n").cast(DoubleType) - 1.0)))
      strata.groupBy(col("panel"))
        .agg(count(lit(1)).as("n_strata"),
          expr("aggregate(array_sort(collect_list(struct(g, num_s))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x.num_s)").as("num"),
          expr("aggregate(array_sort(collect_list(struct(g, var_s))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x.var_s)").as("var"))
        .select(col("panel"), col("n_strata"),
          (col("num") * col("num") / col("var")).as("cmh"),
          (col("num") * col("num") / col("var") > 3.841459)
            .as("reject_05"))
        .orderBy(col("panel"))
    },
    Some(s"""
      WITH base AS (
        SELECT o_orderpriority AS g,
               ${Det.hashParitySql("o_orderkey")} AS armb,
               ${Det.centsSql("o_totalprice")} AS x
        FROM orders
      ), panels AS (
        SELECT 'control' AS panel, g, armb, x AS v FROM base
        UNION ALL
        SELECT 'dosed', g, armb,
               CASE WHEN armb THEN x + x // 4 ELSE x END
        FROM base
      ), strata AS (
        SELECT panel, g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN armb THEN 1 ELSE 0 END) AS BIGINT)
                 AS n1,
               CAST(sum(CASE WHEN v > 25000000 THEN 1 ELSE 0 END)
                 AS BIGINT) AS m1,
               CAST(sum(CASE WHEN armb AND v > 25000000 THEN 1 ELSE 0
                 END) AS BIGINT) AS a11
        FROM panels GROUP BY 1, 2
      ), terms AS (
        SELECT panel, g,
               CAST(a11 AS DOUBLE)
                 - CAST(n1 AS DOUBLE) * CAST(m1 AS DOUBLE)
                   / CAST(n AS DOUBLE) AS num_s,
               CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)
                 * CAST(m1 AS DOUBLE) * CAST(n - m1 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) - 1.0)) AS var_s
        FROM strata
      ), folded AS (
        SELECT panel, count(*) AS n_strata,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(num_s ORDER BY g)), (acc, x) -> acc + x) AS num,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(var_s ORDER BY g)), (acc, x) -> acc + x) AS var
        FROM terms GROUP BY panel
      )
      SELECT panel, n_strata, num * num / var AS cmh,
             num * num / var > 3.841459 AS reject_05
      FROM folded
      ORDER BY panel"""))

  /** q425: JONCKHEERE–TERPSTRA ORDERED-ALTERNATIVE TEST (Terpstra
    * 1952; Jonckheere 1954) — "does the metric INCREASE along the
    * ordered groups?": q413's Kruskal–Wallis spends power on every
    * permutation of the k groups; when the alternative is ordered
    * (priority 1→5, dose rungs, model-size ladder) JT pools the
    * C(k,2) pairwise Mann–Whitney statistics J = Σ_{i<j} U_ij in the
    * group order. ONE-PASS, NO PAIR JOIN: widen the value spectrum to
    * per-group counts n₁..n₅(v), take all five EXCLUSIVE cumulatives
    * in one GlobalOrder multi-cumsum (one range shuffle), and fold
    * J2 = 2J = Σ_v Σ_{i<j} n_j(v)·(2·cumexcl_i(v) + n_i(v)) — an
    * exact BIGINT (doubled to absorb half-tie credits). Null moments
    * in the untied form (values are integer cents — realized tie mass
    * is negligible and IDENTICAL in both engines): 2E = (N²−Σn_i²)/2
    * exact, Var = [N²(2N+3) − Σn_i²(2n_i+3)]/72 on doubles (BIGINT
    * would overflow near N ≈ 10⁷). Group rank = the priority's own
    * leading digit. Dosed/control: +5%·rank (swept: control z ≤ 2.17
    * at sf0.001 — the one-sided α=.01 bar 2.326348 is the flag line
    * precisely because the natural panel realizes |z| past 1.96 at
    * the smallest SF; dosed z ≥ 5.96 everywhere). Scale: spectrum
    * shuffle + 5-column cumsum; nothing quadratic. */
  val q425 = Q(
    "q425_jonckheere",
    (s, d) => {
      import graft.Caches.Tracked
      val base = Tables.load(s, d, "orders")
        .select(col("o_orderpriority").as("g"),
          expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
            .as("rk"),
          Det.cents(col("o_totalprice")).as("x"))
      val panels = base
        .select(lit("control").as("panel"), col("rk"), col("x").as("v"))
        .unionByName(base.select(lit("dosed").as("panel"), col("rk"),
          (col("x") + expr("x * 5 * rk DIV 100")).as("v")))
        .persistTracked()
      val wideCols = (1 to 5).map(i =>
        sum(when(col("rk") === i.toLong, 1L).otherwise(0L)).as(s"n$i"))
      val wide = panels.groupBy(col("panel"), col("v"))
        .agg(wideCols.head, wideCols.tail: _*)
      val cums = graft.operators.GlobalOrder.withOrderedCumsums(
        wide, Seq(col("panel"), col("v")),
        (1 to 5).map(i => col(s"n$i") -> s"cum$i"))
      val ctlCols = (1 to 5).map(i => sum(col(s"n$i")).as(s"t$i"))
      val nCtl = wide.filter(col("panel") === "control")
        .groupBy().agg(ctlCols.head, ctlCols.tail: _*)
      val exed = cums.crossJoin(broadcast(nCtl))
        .select(Seq(col("panel")) ++ (1 to 5).map(i => col(s"n$i")) ++
          (1 to 5).map(i =>
            (col(s"cum$i") - col(s"n$i") -
              when(col("panel") === "dosed", col(s"t$i")).otherwise(0L))
              .as(s"ex$i")): _*)
      val j2term = (for { i <- 1 to 5; j <- (i + 1) to 5 } yield
        col(s"n$j") * (lit(2L) * col(s"ex$i") + col(s"n$i")))
        .reduce(_ + _)
      val agg = exed.groupBy(col("panel"))
        .agg(sum(j2term).as("j2"),
          (1 to 5).map(i => sum(col(s"n$i")).as(s"g$i")): _*)
      agg
        .withColumn("n",
          (1 to 5).map(i => col(s"g$i")).reduce(_ + _))
        .withColumn("ssq",
          (1 to 5).map(i => col(s"g$i") * col(s"g$i")).reduce(_ + _))
        .withColumn("e2x2", expr("(n * n - ssq) DIV 2"))
        .withColumn("var_j",
          (col("n").cast(DoubleType) * col("n").cast(DoubleType) *
            (lit(2.0) * col("n").cast(DoubleType) + 3.0) -
            (1 to 5).map(i =>
              col(s"g$i").cast(DoubleType) * col(s"g$i").cast(DoubleType) *
                (lit(2.0) * col(s"g$i").cast(DoubleType) + 3.0))
              .reduce(_ + _)) / lit(72.0))
        .select(col("panel"), col("n"), col("j2"), col("e2x2"),
          ((col("j2") - col("e2x2")).cast(DoubleType) /
            (lit(2.0) * sqrt(col("var_j")))).as("z_stat"))
        .withColumn("trend_detected", col("z_stat") > 2.326348)
        .orderBy(col("panel"))
    },
    Some(s"""
      WITH base AS (
        SELECT o_orderpriority AS g,
               CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS rk,
               ${Det.centsSql("o_totalprice")} AS x
        FROM orders
      ), panels AS (
        SELECT 'control' AS panel, rk, x AS v FROM base
        UNION ALL
        SELECT 'dosed', rk, x + x * 5 * rk // 100 FROM base
      ), wide AS (
        SELECT panel, v,
               ${(1 to 5).map(i =>
                  s"CAST(sum(CASE WHEN rk = $i THEN 1 ELSE 0 END) " +
                  s"AS BIGINT) AS n$i").mkString(",\n               ")}
        FROM panels GROUP BY 1, 2
      ), cums AS (
        SELECT panel, v,
               ${(1 to 5).map(i => s"n$i").mkString(", ")},
               ${(1 to 5).map(i =>
                  s"coalesce(sum(n$i) OVER (PARTITION BY panel ORDER BY v " +
                  s"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
                  s"AS ex$i").mkString(",\n               ")}
        FROM wide
      ), agg AS (
        SELECT panel,
               CAST(sum(${(for { i <- 1 to 5; j <- (i + 1) to 5 } yield
                  s"n$j * (2 * ex$i + n$i)").mkString(" + ")})
                 AS BIGINT) AS j2,
               ${(1 to 5).map(i =>
                  s"CAST(sum(n$i) AS BIGINT) AS g$i").mkString(",\n               ")}
        FROM cums GROUP BY panel
      ), stats AS (
        SELECT panel, j2,
               ${(1 to 5).map(i => s"g$i").mkString(", ")},
               ${(1 to 5).map(i => s"g$i").mkString(" + ")} AS n,
               ${(1 to 5).map(i => s"g$i * g$i").mkString(" + ")} AS ssq
        FROM agg
      ), zs AS (
        SELECT panel, n, j2, (n * n - ssq) // 2 AS e2x2,
               (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                  * (2.0 * CAST(n AS DOUBLE) + 3.0)
                - (${(1 to 5).map(i =>
                    s"CAST(g$i AS DOUBLE) * CAST(g$i AS DOUBLE) " +
                    s"* (2.0 * CAST(g$i AS DOUBLE) + 3.0)")
                    .mkString(" + ")})) / 72.0 AS var_j
        FROM stats
      )
      SELECT panel, n, j2, e2x2,
             CAST(j2 - e2x2 AS DOUBLE) / (2.0 * sqrt(var_j)) AS z_stat,
             CAST(j2 - e2x2 AS DOUBLE) / (2.0 * sqrt(var_j)) > 2.326348
               AS trend_detected
      FROM zs
      ORDER BY panel"""))

  /** q426: FRIEDMAN TEST (Friedman 1937) — the rank-based
    * repeated-measures k-group test: rank the k priority revenues
    * WITHIN each month block, so month-level effects (seasonality,
    * calendar length, macro drift) cancel by construction — the
    * blocked complement of q413 (which pools all rows and would spend
    * its power on month noise). ALL-INTEGER in doubled-rank units:
    * within-block doubled mid-ranks r2 = 2·#less + t + 1 come from the
    * bounded 5×5 in-block value comparison (k² per block, 80 blocks),
    * and the ×4 unit factor cancels in the tie-general form
    *   χ²_F = (k−1)·Σ_j (R2_j − n(k+1))² / Σ_cells (r2 − (k+1))²
    * — exact integer numerator AND denominator, one IEEE division.
    * Incomplete blocks are excluded (the definition needs all k
    * treatments). Dosed/control: +5%·rank (swept: control χ² ≤ 4.58 <
    * 9.488 = χ²₄ at every SF, dosed ≥ 12.2). Scale: the block×group
    * rollup is calendar-bounded (~400 cells); everything after the
    * first scan is metadata-sized. */
  val q426 = Q(
    "q426_friedman",
    (s, d) => {
      import graft.Caches.Tracked
      val cells0 = Tables.load(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"),
          col("o_orderpriority").as("g"))
        .agg(sum(Det.cents(col("o_totalprice"))).as("x"))
        .withColumn("rk",
          expr("CAST(substring(g, 1, 1) AS BIGINT)"))
      val complete = cells0.groupBy(col("m"))
        .agg(count(lit(1)).as("kk")).filter(col("kk") === 5L)
        .select(col("m"))
      val cells = cells0.join(complete, Seq("m"))
        .select(lit("control").as("panel"), col("m"), col("g"),
          col("x").as("v"))
        .unionByName(cells0.join(complete, Seq("m"))
          .select(lit("dosed").as("panel"), col("m"), col("g"),
            (col("x") + expr("x * 5 * rk DIV 100")).as("v")))
        .persistTracked()
      val other = cells.select(col("panel").as("p2"), col("m").as("m2"),
        col("v").as("v2"))
      val r2 = cells.join(other,
          col("p2") === col("panel") && col("m2") === col("m"))
        .groupBy(col("panel"), col("m"), col("g"), col("v"))
        .agg((lit(2L) * sum(when(col("v2") < col("v"), 1L).otherwise(0L))
          + sum(when(col("v2") === col("v"), 1L).otherwise(0L)) + 1L)
          .as("r2"))
      val nBlocks = r2.groupBy(col("panel"))
        .agg((count(lit(1)) / lit(5L)).cast(LongType).as("n"))
      val num = r2.groupBy(col("panel"), col("g"))
        .agg(sum(col("r2")).as("rj2"))
        .join(broadcast(nBlocks), Seq("panel"))
        .groupBy(col("panel"))
        .agg(max(col("n")).as("n"),
          sum((col("rj2") - col("n") * 6L) *
            (col("rj2") - col("n") * 6L)).as("num"))
      val den = r2.groupBy(col("panel"))
        .agg(sum((col("r2") - 6L) * (col("r2") - 6L)).as("den"))
      num.join(den, Seq("panel"))
        .select(col("panel"), col("n").as("n_blocks"),
          (lit(4.0) * col("num").cast(DoubleType) /
            col("den").cast(DoubleType)).as("chi2_f"))
        .withColumn("reject_05", col("chi2_f") > 9.487729)
        .orderBy(col("panel"))
    },
    Some(s"""
      WITH cells0 AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               o_orderpriority AS g,
               CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS rk,
               CAST(sum(${Det.centsSql("o_totalprice")}) AS BIGINT) AS x
        FROM orders GROUP BY 1, 2, 3
      ), complete AS (
        SELECT m FROM cells0 GROUP BY m HAVING count(*) = 5
      ), cells AS (
        SELECT 'control' AS panel, c.m, g, x AS v
        FROM cells0 c JOIN complete USING (m)
        UNION ALL
        SELECT 'dosed', c.m, g, x + x * 5 * rk // 100
        FROM cells0 c JOIN complete USING (m)
      ), r2 AS (
        SELECT a.panel, a.m, a.g,
               2 * sum(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
                 + sum(CASE WHEN b.v = a.v THEN 1 ELSE 0 END) + 1 AS r2
        FROM cells a JOIN cells b
          ON b.panel = a.panel AND b.m = a.m
        GROUP BY 1, 2, 3, a.v
      ), nb AS (
        SELECT panel, CAST(count(*) // 5 AS BIGINT) AS n
        FROM r2 GROUP BY panel
      ), num AS (
        SELECT r.panel, max(nb.n) AS n,
               CAST(sum((rj2 - nb.n * 6) * (rj2 - nb.n * 6)) AS BIGINT)
                 AS num
        FROM (SELECT panel, g, CAST(sum(r2) AS BIGINT) AS rj2
              FROM r2 GROUP BY 1, 2) r
        JOIN nb ON nb.panel = r.panel
        GROUP BY r.panel
      ), den AS (
        SELECT panel, CAST(sum((r2 - 6) * (r2 - 6)) AS BIGINT) AS den
        FROM r2 GROUP BY panel
      )
      SELECT num.panel, n AS n_blocks,
             4.0 * CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE)
               AS chi2_f,
             4.0 * CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE)
               > 9.487729 AS reject_05
      FROM num JOIN den ON num.panel = den.panel
      ORDER BY num.panel"""))

  /** q428: PAGE'S TREND TEST (Page 1963, "Ordered hypotheses for
    * multiple treatments") — the ordered-alternative test INSIDE the
    * q426 Friedman design: where Friedman asks "do the priority
    * classes differ at all, month effects removed?", Page asks "do
    * they increase IN THE PRIORITY ORDER?" — the blocked counterpart
    * of q425's Jonckheere (JT pools raw rows; Page ranks within month
    * blocks first, so calendar drift can't masquerade as trend).
    * Doubled in-block mid-ranks (q426's r2 cells verbatim — shared
    * machinery, one more linear functional): L2 = Σ_j rk_j·R2_j is an
    * exact BIGINT; untied null moments E2 = n·k(k+1)²/2 (exact
    * integer), Var(L) = n·k²(k+1)(k²−1)/144 on doubles;
    * z = (L2 − E2)/(2·√Var). Same +5%·rank dose and the same
    * one-sided α=.01 bar as q425 (swept: control |z| ≤ 0.77, dosed
    * z ≥ 2.70 at sf0.001 rising to 12.8). Scale: identical to q426 —
    * calendar-bounded cells. */
  val q428 = Q(
    "q428_page_trend",
    (s, d) => {
      import graft.Caches.Tracked
      val cells0 = Tables.load(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"),
          col("o_orderpriority").as("g"))
        .agg(sum(Det.cents(col("o_totalprice"))).as("x"))
        .withColumn("rk", expr("CAST(substring(g, 1, 1) AS BIGINT)"))
      val complete = cells0.groupBy(col("m"))
        .agg(count(lit(1)).as("kk")).filter(col("kk") === 5L)
        .select(col("m"))
      val cells = cells0.join(complete, Seq("m"))
        .select(lit("control").as("panel"), col("m"), col("rk"),
          col("x").as("v"))
        .unionByName(cells0.join(complete, Seq("m"))
          .select(lit("dosed").as("panel"), col("m"), col("rk"),
            (col("x") + expr("x * 5 * rk DIV 100")).as("v")))
        .persistTracked()
      val other = cells.select(col("panel").as("p2"), col("m").as("m2"),
        col("v").as("v2"))
      val r2 = cells.join(other,
          col("p2") === col("panel") && col("m2") === col("m"))
        .groupBy(col("panel"), col("m"), col("rk"), col("v"))
        .agg((lit(2L) * sum(when(col("v2") < col("v"), 1L).otherwise(0L))
          + sum(when(col("v2") === col("v"), 1L).otherwise(0L)) + 1L)
          .as("r2"))
      r2.groupBy(col("panel"))
        .agg((count(lit(1)) / lit(5L)).cast(LongType).as("n_blocks"),
          sum(col("rk") * col("r2")).as("l2"))
        .withColumn("e2", col("n_blocks") * 90L) // n·k(k+1)²/2, k=5
        .withColumn("var_l",
          col("n_blocks").cast(DoubleType) * lit(25.0) * lit(6.0) *
            lit(24.0) / lit(144.0)) // n·k²(k+1)(k²−1)/144
        .select(col("panel"), col("n_blocks"), col("l2"), col("e2"),
          ((col("l2") - col("e2")).cast(DoubleType) /
            (lit(2.0) * sqrt(col("var_l")))).as("z_stat"))
        .withColumn("trend_detected", col("z_stat") > 2.326348)
        .orderBy(col("panel"))
    },
    Some(s"""
      WITH cells0 AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS rk,
               CAST(sum(${Det.centsSql("o_totalprice")}) AS BIGINT) AS x
        FROM orders GROUP BY 1, 2
      ), complete AS (
        SELECT m FROM cells0 GROUP BY m HAVING count(*) = 5
      ), cells AS (
        SELECT 'control' AS panel, c.m, rk, x AS v
        FROM cells0 c JOIN complete USING (m)
        UNION ALL
        SELECT 'dosed', c.m, rk, x + x * 5 * rk // 100
        FROM cells0 c JOIN complete USING (m)
      ), r2 AS (
        SELECT a.panel, a.m, a.rk,
               2 * sum(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
                 + sum(CASE WHEN b.v = a.v THEN 1 ELSE 0 END) + 1 AS r2
        FROM cells a JOIN cells b
          ON b.panel = a.panel AND b.m = a.m
        GROUP BY 1, 2, 3, a.v
      ), agg AS (
        SELECT panel, CAST(count(*) // 5 AS BIGINT) AS n_blocks,
               CAST(sum(rk * r2) AS BIGINT) AS l2
        FROM r2 GROUP BY panel
      )
      SELECT panel, n_blocks, l2, n_blocks * 90 AS e2,
             CAST(l2 - n_blocks * 90 AS DOUBLE)
               / (2.0 * sqrt(CAST(n_blocks AS DOUBLE)
                             * 25.0 * 6.0 * 24.0 / 144.0)) AS z_stat,
             CAST(l2 - n_blocks * 90 AS DOUBLE)
               / (2.0 * sqrt(CAST(n_blocks AS DOUBLE)
                             * 25.0 * 6.0 * 24.0 / 144.0)) > 2.326348
               AS trend_detected
      FROM agg
      ORDER BY panel"""))

  /** q429: MANTEL–HAENSZEL POOLED ODDS RATIO (Mantel & Haenszel 1959
    * §4) — the EFFECT-SIZE companion to q424's CMH significance test:
    * the common odds ratio across the priority strata,
    * OR_MH = Σ_s(a_s·d_s/n_s) / Σ_s(b_s·c_s/n_s) — the weighting that
    * stays valid with sparse strata (the log-linear pooled estimate
    * needs logs; MH is ratio-of-sums, log-free). Per-stratum ORs ride
    * along so confounding is VISIBLE (q368's lesson: the pooled and
    * marginal readouts can disagree). Same arms/outcome/dose as q424
    * (hash split, > $250k median, +25% B); all counts exact BIGINTs,
    * the two fold sums stratum-ordered, one division. Swept: control
    * OR_MH ∈ [0.94, 1.03], dosed ≥ 1.395. Scale: 10 count rows. */
  val q429 = Q(
    "q429_mh_odds_ratio",
    (s, d) => {
      import graft.Caches.Tracked
      val base = Tables.load(s, d, "orders")
        .select(col("o_orderpriority").as("g"),
          expr(Det.hashParityExpr("o_orderkey")).as("armb"),
          Det.cents(col("o_totalprice")).as("x"))
      val panels = base
        .select(lit("control").as("panel"), col("g"), col("armb"),
          col("x").as("v"))
        .unionByName(base.select(lit("dosed").as("panel"), col("g"),
          col("armb"),
          when(col("armb"), col("x") + expr("x DIV 4")).otherwise(col("x"))
            .as("v")))
      val strata = panels.groupBy(col("panel"), col("g"))
        .agg(
          sum(when(col("armb") && col("v") > 25000000L, 1L).otherwise(0L))
            .as("a"),
          sum(when(col("armb") && col("v") <= 25000000L, 1L).otherwise(0L))
            .as("b"),
          sum(when(!col("armb") && col("v") > 25000000L, 1L).otherwise(0L))
            .as("c"),
          sum(when(!col("armb") && col("v") <= 25000000L, 1L).otherwise(0L))
            .as("dd"))
        .withColumn("n",
          col("a") + col("b") + col("c") + col("dd"))
        .withColumn("or_num",
          col("a").cast(DoubleType) * col("dd").cast(DoubleType) /
            col("n").cast(DoubleType))
        .withColumn("or_den",
          col("b").cast(DoubleType) * col("c").cast(DoubleType) /
            col("n").cast(DoubleType))
      strata.groupBy(col("panel"))
        .agg(count(lit(1)).as("n_strata"),
          expr("aggregate(array_sort(collect_list(struct(g, or_num))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x.or_num)").as("num"),
          expr("aggregate(array_sort(collect_list(struct(g, or_den))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x.or_den)").as("den"),
          min(col("or_num") / col("or_den")).as("min_stratum_or"),
          max(col("or_num") / col("or_den")).as("max_stratum_or"))
        .select(col("panel"), col("n_strata"),
          (col("num") / col("den")).as("or_mh"),
          col("min_stratum_or"), col("max_stratum_or"))
        .orderBy(col("panel"))
    },
    Some(s"""
      WITH base AS (
        SELECT o_orderpriority AS g,
               ${Det.hashParitySql("o_orderkey")} AS armb,
               ${Det.centsSql("o_totalprice")} AS x
        FROM orders
      ), panels AS (
        SELECT 'control' AS panel, g, armb, x AS v FROM base
        UNION ALL
        SELECT 'dosed', g, armb,
               CASE WHEN armb THEN x + x // 4 ELSE x END
        FROM base
      ), strata AS (
        SELECT panel, g,
               CAST(sum(CASE WHEN armb AND v > 25000000 THEN 1 ELSE 0
                 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN armb AND v <= 25000000 THEN 1 ELSE 0
                 END) AS BIGINT) AS b,
               CAST(sum(CASE WHEN NOT armb AND v > 25000000 THEN 1
                 ELSE 0 END) AS BIGINT) AS c,
               CAST(sum(CASE WHEN NOT armb AND v <= 25000000 THEN 1
                 ELSE 0 END) AS BIGINT) AS dd
        FROM panels GROUP BY 1, 2
      ), terms AS (
        SELECT panel, g,
               CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
                 / CAST(a + b + c + dd AS DOUBLE) AS or_num,
               CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                 / CAST(a + b + c + dd AS DOUBLE) AS or_den
        FROM strata
      ), folded AS (
        SELECT panel, count(*) AS n_strata,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(or_num ORDER BY g)), (acc, x) -> acc + x) AS num,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(or_den ORDER BY g)), (acc, x) -> acc + x) AS den,
               min(or_num / or_den) AS min_stratum_or,
               max(or_num / or_den) AS max_stratum_or
        FROM terms GROUP BY panel
      )
      SELECT panel, n_strata, num / den AS or_mh,
             min_stratum_or, max_stratum_or
      FROM folded
      ORDER BY panel"""))

  /** q431: CONOVER SQUARED-RANKS TEST FOR SCALE (Conover & Iman 1981;
    * Conover, Practical Nonparametric Statistics §5.3) — the RANK-based
    * scale test beside q414's moment-based Brown–Forsythe: rank the
    * absolute deviations from the pooled median, square the ranks
    * (weighting the far tail), and ask whether arm B holds more than
    * its share of the squared-rank mass. Outlier-resistant where BF's
    * F inherits the deviations' fourth moment. EXACT: deviations
    * w = |2v − 2·med| are exact half-cent integers (q414), doubled
    * mid-ranks r2 off the deviation spectrum (q413), scores s = r2²
    * exact BIGINTs; with T = Σ_B s, S1 = Σs, S2 = Σs² (DECIMAL(38)/
    * HUGEINT), the standardization clears ALL interior divisions:
    *   z = (N·T − m·S1) / √(m(N−m)·(N·S2 − S1²)/(N−1))
    * — exact integer operands into one division and one sqrt (S1
    * exceeds 2⁵³ at sf0.1, so S1² MUST form on wide integers; a
    * double-first spelling diverges). Same arms as q416/q420/q424,
    * dose = arm-B spread ×2 (swept: control |z| ≤ 1.41, dosed
    * z ≥ 18.1). Scale: one scan + one spectrum shuffle. */
  val q431 = Q(
    "q431_conover_scale",
    (s, d) => {
      import graft.Caches.Tracked
      val base = Tables.load(s, d, "orders")
        .select(expr(Det.hashParityExpr("o_orderkey")).as("armb"),
          Det.cents(col("o_totalprice")).as("x"))
      val panels = base
        .select(lit("control").as("panel"), col("armb"),
          col("x").as("v"))
        .unionByName(base.select(lit("dosed").as("panel"), col("armb"),
          when(col("armb"), col("x") * 2L).otherwise(col("x")).as("v")))
        .persistTracked()
      val med = panels.groupBy(col("panel"))
        .agg(expr("percentile(v, 0.5D)").as("m"))
      val devs = panels.join(broadcast(med), Seq("panel"))
        .select(col("panel"), col("armb"),
          abs(col("v").cast(DoubleType) * 2.0 - col("m") * 2.0)
            .cast(LongType).as("w"))
      val vals = devs.groupBy(col("panel"), col("w"))
        .agg(count(lit(1)).as("t"),
          sum(when(col("armb"), 1L).otherwise(0L)).as("tb"))
      val nCtl = vals.filter(col("panel") === "control")
        .groupBy().agg(sum(col("t")).as("n_ctl"))
      val scored = graft.operators.GlobalOrder
        .withOrderedCumsum(vals, Seq(col("panel"), col("w")), col("t"),
          "cum")
        .crossJoin(broadcast(nCtl))
        .withColumn("r2",
          (col("cum") - col("t") -
            when(col("panel") === "dosed", col("n_ctl")).otherwise(0L))
            * 2L + col("t") + 1L)
        .withColumn("s", col("r2") * col("r2"))
      scored.groupBy(col("panel"))
        .agg(
          sum(col("t")).as("n"),
          sum(col("tb")).as("m_b"),
          sum(col("tb") * col("s")).as("t_stat"),
          sum(col("t").cast(DecimalType(38, 0)) *
            col("s").cast(DecimalType(38, 0))).as("s1"),
          sum(col("t").cast(DecimalType(38, 0)) *
            col("s").cast(DecimalType(38, 0)) *
            col("s").cast(DecimalType(38, 0))).as("s2"))
        .withColumn("z_stat",
          (col("n").cast(DecimalType(38, 0)) *
            col("t_stat").cast(DecimalType(38, 0)) -
            col("m_b").cast(DecimalType(38, 0)) * col("s1"))
            .cast(DoubleType) /
            sqrt((col("m_b") * (col("n") - col("m_b"))).cast(DoubleType) *
              (col("n").cast(DecimalType(38, 0)) * col("s2") -
                col("s1") * col("s1")).cast(DoubleType) /
              (col("n") - 1L).cast(DoubleType)))
        .select(col("panel"), col("n"), col("m_b"), col("t_stat"),
          col("z_stat"), (abs(col("z_stat")) > 1.959964).as("reject_05"))
        .orderBy(col("panel"))
    },
    Some(s"""
      WITH base AS (
        SELECT ${Det.hashParitySql("o_orderkey")} AS armb,
               ${Det.centsSql("o_totalprice")} AS x
        FROM orders
      ), panels AS (
        SELECT 'control' AS panel, armb, x AS v FROM base
        UNION ALL
        SELECT 'dosed', armb,
               CASE WHEN armb THEN 2 * x ELSE x END
        FROM base
      ), med AS (
        SELECT panel, quantile_cont(v, 0.5) AS m FROM panels GROUP BY 1
      ), devs AS (
        SELECT p.panel, armb,
               CAST(abs(CAST(v AS DOUBLE) * 2.0 - m * 2.0) AS BIGINT)
                 AS w
        FROM panels p JOIN med USING (panel)
      ), vals AS (
        SELECT panel, w, count(*) AS t,
               CAST(sum(CASE WHEN armb THEN 1 ELSE 0 END) AS BIGINT)
                 AS tb
        FROM devs GROUP BY 1, 2
      ), scored AS (
        SELECT panel, t, tb,
               (coalesce(sum(t) OVER (PARTITION BY panel ORDER BY w
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 * 2 + t + 1)
               * (coalesce(sum(t) OVER (PARTITION BY panel ORDER BY w
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 * 2 + t + 1) AS s
        FROM vals
      ), agg AS (
        SELECT panel,
               CAST(sum(t) AS BIGINT) AS n,
               CAST(sum(tb) AS BIGINT) AS m_b,
               CAST(sum(tb * s) AS BIGINT) AS t_stat,
               sum(CAST(t AS HUGEINT) * CAST(s AS HUGEINT)) AS s1,
               sum(CAST(t AS HUGEINT) * CAST(s AS HUGEINT)
                   * CAST(s AS HUGEINT)) AS s2
        FROM scored GROUP BY panel
      )
      SELECT panel, n, m_b, t_stat,
             ${Det.hugeDoubleSql(
               """CAST(n AS HUGEINT) * CAST(t_stat AS HUGEINT)
                  - CAST(m_b AS HUGEINT) * s1""")}
               / sqrt(CAST(m_b * (n - m_b) AS DOUBLE)
                      * ${Det.hugeDoubleSql("CAST(n AS HUGEINT) * s2 - s1 * s1")}
                      / CAST(n - 1 AS DOUBLE)) AS z_stat,
             abs(${Det.hugeDoubleSql(
               """CAST(n AS HUGEINT) * CAST(t_stat AS HUGEINT)
                  - CAST(m_b AS HUGEINT) * s1""")}
               / sqrt(CAST(m_b * (n - m_b) AS DOUBLE)
                      * ${Det.hugeDoubleSql("CAST(n AS HUGEINT) * s2 - s1 * s1")}
                      / CAST(n - 1 AS DOUBLE))) > 1.959964 AS reject_05
      FROM agg
      ORDER BY panel"""))

  /** q432: MOOD'S MEDIAN TEST (Mood 1950; Brown & Mood 1951) — the
    * fast k-group location screen: dichotomize every order against the
    * POOLED median and χ²-test the (group × above/below) contingency.
    * Coarser than q413's Kruskal–Wallis (it reads only the side of the
    * median, not the rank) but maximally outlier-proof and the cheapest
    * possible k-group screen — one spectrum-free scan. Rows AT the
    * median drop (exact half-integer median, q410's rule). All counts
    * exact BIGINTs; expected cells e = rowtot·coltot/N on identical
    * doubles; χ² folds over the 10 (group, side) cells in fixed order.
    * Same +5%·rank dose family as q413/q425 (swept: control χ² ≤ 7.27
    * < 9.488 = χ²₄, dosed ≥ 25.6). Scale: one scan to 10 cells. */
  val q432 = Q(
    "q432_mood_median",
    (s, d) => {
      import graft.Caches.Tracked
      val base = Tables.load(s, d, "orders")
        .select(col("o_orderpriority").as("g"),
          expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
            .as("rk"),
          Det.cents(col("o_totalprice")).as("x"))
      val panels = base
        .select(lit("control").as("panel"), col("g"), col("x").as("v"))
        .unionByName(base.select(lit("dosed").as("panel"), col("g"),
          (col("x") + expr("x * rk DIV 20")).as("v")))
        .persistTracked()
      val med = panels.groupBy(col("panel"))
        .agg(expr("percentile(v, 0.5D)").as("m"))
      val cells = panels.join(broadcast(med), Seq("panel"))
        .filter(col("v").cast(DoubleType) =!= col("m"))
        .groupBy(col("panel"), col("g"))
        .agg(
          sum(when(col("v").cast(DoubleType) > col("m"), 1L)
            .otherwise(0L)).as("above"),
          sum(when(col("v").cast(DoubleType) < col("m"), 1L)
            .otherwise(0L)).as("below"))
      val tots = cells.groupBy(col("panel"))
        .agg(sum(col("above")).as("ta"), sum(col("below")).as("tb"),
          (sum(col("above")) + sum(col("below"))).as("nn"))
      cells.join(broadcast(tots), Seq("panel"))
        .withColumn("ea",
          (col("above") + col("below")).cast(DoubleType) *
            col("ta").cast(DoubleType) / col("nn").cast(DoubleType))
        .withColumn("eb",
          (col("above") + col("below")).cast(DoubleType) *
            col("tb").cast(DoubleType) / col("nn").cast(DoubleType))
        .withColumn("contrib",
          (col("above").cast(DoubleType) - col("ea")) *
            (col("above").cast(DoubleType) - col("ea")) / col("ea") +
            (col("below").cast(DoubleType) - col("eb")) *
              (col("below").cast(DoubleType) - col("eb")) / col("eb"))
        .groupBy(col("panel"), col("nn"))
        .agg(expr("aggregate(array_sort(collect_list(struct(g, contrib))), " +
          "CAST(0 AS DOUBLE), (acc, x) -> acc + x.contrib)").as("chi2"))
        .select(col("panel"), col("nn").as("n_used"), col("chi2"),
          (col("chi2") > 9.487729).as("reject_05"))
        .orderBy(col("panel"))
    },
    Some(s"""
      WITH base AS (
        SELECT o_orderpriority AS g,
               CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS rk,
               ${Det.centsSql("o_totalprice")} AS x
        FROM orders
      ), panels AS (
        SELECT 'control' AS panel, g, x AS v FROM base
        UNION ALL
        SELECT 'dosed', g, x + x * rk // 20 FROM base
      ), med AS (
        SELECT panel, quantile_cont(v, 0.5) AS m FROM panels GROUP BY 1
      ), cells AS (
        SELECT p.panel, g,
               CAST(sum(CASE WHEN CAST(v AS DOUBLE) > m THEN 1 ELSE 0
                 END) AS BIGINT) AS above,
               CAST(sum(CASE WHEN CAST(v AS DOUBLE) < m THEN 1 ELSE 0
                 END) AS BIGINT) AS below
        FROM panels p JOIN med USING (panel)
        WHERE CAST(v AS DOUBLE) <> m
        GROUP BY 1, 2
      ), tots AS (
        SELECT panel, CAST(sum(above) AS BIGINT) AS ta,
               CAST(sum(below) AS BIGINT) AS tb,
               CAST(sum(above) + sum(below) AS BIGINT) AS nn
        FROM cells GROUP BY panel
      ), contribs AS (
        SELECT c.panel, g, nn,
               (CAST(above AS DOUBLE)
                  - CAST(above + below AS DOUBLE) * CAST(ta AS DOUBLE)
                    / CAST(nn AS DOUBLE))
               * (CAST(above AS DOUBLE)
                  - CAST(above + below AS DOUBLE) * CAST(ta AS DOUBLE)
                    / CAST(nn AS DOUBLE))
               / (CAST(above + below AS DOUBLE) * CAST(ta AS DOUBLE)
                  / CAST(nn AS DOUBLE))
               + (CAST(below AS DOUBLE)
                  - CAST(above + below AS DOUBLE) * CAST(tb AS DOUBLE)
                    / CAST(nn AS DOUBLE))
               * (CAST(below AS DOUBLE)
                  - CAST(above + below AS DOUBLE) * CAST(tb AS DOUBLE)
                    / CAST(nn AS DOUBLE))
               / (CAST(above + below AS DOUBLE) * CAST(tb AS DOUBLE)
                  / CAST(nn AS DOUBLE)) AS contrib
        FROM cells c JOIN tots USING (panel)
      ), folded AS (
        SELECT panel, nn,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(contrib ORDER BY g)), (acc, x) -> acc + x)
                 AS chi2
        FROM contribs GROUP BY panel, nn
      )
      SELECT panel, nn AS n_used, chi2, chi2 > 9.487729 AS reject_05
      FROM folded
      ORDER BY panel"""))

  val all: Seq[Q] =
    Seq(q303, q304, q311, q316, q319, q320, q326, q327, q336, q338,
      q340, q342, q346, q349, q350, q352, q353, q354, q355, q356,
      q358, q362, q364, q367, q368, q373, q374, q375, q380, q381, q382,
      q383, q387, q390, q395, q396, q397, q398, q408, q412, q413, q414,
      q416, q420, q422, q423, q424, q425, q426, q428, q429, q431,
      q432)
}
