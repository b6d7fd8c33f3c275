package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.Caches.Tracked
import graft.queries.Q

/** Distributed k-means (Lloyd's algorithm) over the embedding corpus —
  * the TRAINING loop that produces an IVF coarse quantizer (q41 uses a
  * fixed one; this is how it gets built at 100 TB).
  *
  * The iteration is the canonical Spark ML shape: centroids are tiny
  * (k × dim), so each round BROADCASTS them, assigns every vector to its
  * nearest centroid map-side (no shuffle for the assignment), and
  * recomputes centroids with one partial-aggregated shuffle of
  * (cluster, dim) cells. Between rounds the k×64 centroid table is
  * collected and re-broadcast — lineage stays flat, which is what keeps
  * iteration N from recomputing iterations 1..N-1.
  *
  * Cross-engine determinism (the DuckDB oracle runs the SAME algorithm):
  * vector components are fixed-point scaled to exact BIGINTs, so centroid
  * updates are order-independent integer sums followed by the identical
  * two IEEE divisions in both engines; distances left-fold the same
  * (x-y)² sequence; and the argmin tiebreak is total (distance, cid).
  */
object Kmeans {

  /** 2^24 — scaling float-precision components to exact integers. At a
    * trillion-row corpus the BIGINT sum still fits with 2^15 headroom;
    * past that, widen to DECIMAL(38,0) in [[update]]. */
  private val Scale = 16777216L

  private[graft] def vecs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
      .select(
        col("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("v"))
      .withColumn(
        "vi",
        expr(s"transform(v, x -> CAST(round(x * $Scale) AS BIGINT))"))

  /** Left-fold squared-L2 distance between two array columns — the ONE
    * distance expression every consumer (assign below, q86's ADC table)
    * must share so a future arithmetic change lands everywhere. */
  private[graft] def d2Fold(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), " +
      "CAST(0 AS DOUBLE), (acc, e) -> acc + e)"

  /** Map-side nearest-centroid assignment: broadcast cent (cid, cv),
    * exact-fold squared L2, deterministic argmin. */
  def assign(vectors: DataFrame, cent: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(cent))
      .withColumn("d2", expr(d2Fold("v", "cv")))
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))))
      .filter(col("rn") === 1)
      .select(
        col("vec_id"), col("v"), col("vi"), col("cid").as("cluster"),
        col("d2"))

  /** Centroid update: one shuffle of (cluster, dim) cells with map-side
    * partial sums; exact integer accumulation, then the same two IEEE
    * divisions DuckDB performs. */
  def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("vi")).as(Seq("pos", "comp")))
      .groupBy(col("cluster"), col("pos"))
      .agg((sum(col("comp").cast(DecimalType(38, 0))).cast(DoubleType) /
        count(lit(1)) / lit(16777216.0)).as("cc"))
      .groupBy(col("cluster"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, cc))), " +
        "s -> s.cc)").as("cv"))
      .select(col("cluster").as("cid"), col("cv"))

  /** `iters` Lloyd rounds from the deterministic seed (members with
    * vec_id < k), returning the final assignment. */
  def train(s: SparkSession, d: String, k: Int, iters: Int): DataFrame = {
    import s.implicits._
    val vs = vecs(s, d).persistTracked()
    var cent = vs.filter(col("vec_id") < k)
      .select(col("vec_id").cast(IntegerType).as("cid"), col("v").as("cv"))
    (1 to iters).foreach { _ =>
      val updated = update(assign(vs, cent))
        .select(col("cid").cast(IntegerType), col("cv"))
        .as[(Int, Seq[Double])].collect().sortBy(_._1)
      cent = updated.toSeq.toDF("cid", "cv")
    }
    assign(vs, cent)
  }

  /** One unrolled Lloyd round as DuckDB CTEs — shared by the q59 and q76
    * oracle twins. */
  private def iterCtes(i: Int, prevCent: String) = s"""
      dists$i AS (
        SELECT v.vec_id, v.vi, c.cid,
          list_reduce(list_transform(list_zip(v.v, c.cv),
            p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b) AS d2
        FROM vecs v CROSS JOIN $prevCent c
      ), assigned$i AS (
        SELECT vec_id, vi, cid AS cluster FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cid) AS rn
          FROM dists$i) WHERE rn = 1
      ), upd$i AS (
        SELECT cluster AS cid, i.pos,
               CAST(sum(vi[i.pos]) AS DOUBLE) / count(*) / 16777216.0 AS cc
        FROM assigned$i, (SELECT unnest(range(1, 65)) AS pos) i
        GROUP BY cluster, i.pos
      ), cent$i AS (
        SELECT cid, list(cc ORDER BY pos) AS cv FROM upd$i GROUP BY cid
      )"""

  /** Shared oracle prelude: vecs → 2 unrolled Lloyd rounds →
    * final_assigned(vec_id, cluster). */
  private def assignedSql = s"""
      WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               list_transform(CAST(embedding AS DOUBLE[]),
                 x -> CAST(round(x * 16777216) AS BIGINT)) AS vi
        FROM embeddings
      ), cent0 AS (
        SELECT CAST(vec_id AS INTEGER) AS cid, v AS cv
        FROM vecs WHERE vec_id < 8
      ),${iterCtes(1, "cent0")},${iterCtes(2, "cent1")},
      final_dists AS (
        SELECT v.vec_id, c.cid,
          list_reduce(list_transform(list_zip(v.v, c.cv),
            p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b) AS d2
        FROM vecs v CROSS JOIN cent2 c
      ), final_assigned AS (
        SELECT vec_id, cid AS cluster FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cid) AS rn
          FROM final_dists) WHERE rn = 1
      )"""

  /** q59: 2 Lloyd rounds, k=8 — cluster cardinalities and member id
    * ranges, bit-identically reproduced by the DuckDB twin running the
    * same unrolled iterations. */
  val q59 = Q(
    "q59_kmeans",
    (s, d) =>
      train(s, d, k = 8, iters = 2)
        .groupBy(col("cluster"))
        .agg(
          count(lit(1)).as("n"),
          min(col("vec_id")).as("min_vec"),
          max(col("vec_id")).as("max_vec"))
        .orderBy(col("cluster")),
    Some {
      s"""$assignedSql
      SELECT cluster, count(*) AS n, min(vec_id) AS min_vec,
             max(vec_id) AS max_vec
      FROM final_assigned GROUP BY cluster ORDER BY cluster"""
    })

  /** q76: SemDeDup-style SEMANTIC dedup (Abbas et al. 2023) — embeddings
    * are k-means clustered (the trained quantizer, not fixed label
    * blocks), near-dup pairs are found by exact cosine ONLY within each
    * cluster, and the larger id of every pair is dropped. The clusters
    * do for embeddings what (lang, source) blocking does for text: the
    * pair stage is O(Σ cluster²), never corpus², and the cluster count
    * is a tunable knob. Composes the bit-exact trainer above with the
    * q27 cosine kernel, so the oracle reproduces every keep/drop
    * decision exactly. */
  val q76 = Q(
    "q76_semantic_dedup",
    (s, d) => {
      val assigned = train(s, d, k = 8, iters = 2)
      val withNorm = assigned
        .withColumn(
          "nrm",
          expr("sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), " +
            "CAST(0 AS DOUBLE), (a, e) -> a + e))"))
        // both sides of the in-cluster pair join read this (no CSE
        // across self-joins)
        .persistTracked()
      val drops = withNorm.as("a")
        .join(
          withNorm.as("b"),
          col("a.cluster") === col("b.cluster") &&
            col("a.vec_id") < col("b.vec_id"))
        .withColumn(
          "cos_sim",
          graft.functions.VecDot.dot(col("a.v"), col("b.v")) /
            (col("a.nrm") * col("b.nrm")))
        .filter(col("cos_sim") >= 0.35)
        .select(col("b.vec_id").as("vec_id"))
        .distinct()
      withNorm
        .join(drops.withColumn("dropped", lit(true)), Seq("vec_id"), "left")
        .select(
          col("vec_id"), col("cluster"),
          col("dropped").isNull.as("keep"))
        .orderBy(col("vec_id"))
    },
    Some {
      s"""$assignedSql, fa AS (
        SELECT f.vec_id, f.cluster, v.v,
               sqrt(list_reduce(list_transform(list_zip(v.v, v.v),
                 p -> p[1] * p[2]), (x, y) -> x + y)) AS nrm
        FROM final_assigned f JOIN vecs v USING (vec_id)
      ), pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM fa a JOIN fa b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE (list_reduce(list_transform(list_zip(a.v, b.v),
                 p -> p[1] * p[2]), (x, y) -> x + y) / (a.nrm * b.nrm))
              >= 0.35
      )
      SELECT f.vec_id, f.cluster, (d.vec_id IS NULL) AS keep
      FROM fa f LEFT JOIN (SELECT DISTINCT vb AS vec_id FROM pairs) d
        USING (vec_id)
      ORDER BY f.vec_id"""
    })

  val all: Seq[Q] = Seq(q59, q76)
}
