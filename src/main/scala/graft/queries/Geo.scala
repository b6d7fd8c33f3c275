package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** GEOSPATIAL family: grid-bucketed distance joins and quadtree tile
  * rollups — the two primitives every spatial workload (geo dedup of
  * scraped POI data, store-catchment analysis, map-tile serving) reduces
  * to, and a family the reference's engines would express with PostGIS /
  * H3 extensions (reference: README.md:373-397 runs the same SQL across
  * engines; the spatial analog is the same discipline over cell keys).
  *
  * The fixtures carry no coordinates, so both engines apply the SAME
  * deterministic dose first (the q239/q287 discipline): planar integer
  * coordinates derived from the customer key by multiplicative hashing —
  * exact int64 arithmetic, identical in Spark and DuckDB, no floats, no
  * trigonometry (haversine needs libm trig, which is cross-engine
  * divergent; planar integer geometry keeps every comparison exact).
  *
  * Scale design: the grid join shuffles on cell keys — O(points × 9)
  * candidate rows instead of O(points²); density skew concentrates in
  * cells, which AQE's skew-join splitting (pinned in PlanShapeSpec for
  * the engine) handles at runtime, and a finer grid trades candidate
  * fan-in for more cells. The tile rollup is a plain re-keyed
  * aggregation per depth — partial aggregates make it one shuffle per
  * level over already-tiny cell tables.
  */
object Geo {

  /** Deterministic planar coordinates for a key column: two independent
    * multiplicative hashes into a 65536×65536 integer plane. Shared SQL
    * text — pure `*`/`%` int64 arithmetic parses identically in both
    * engines. */
  def xExpr(key: String): String = s"($key * 7919) % 65536"
  def yExpr(key: String): String = s"($key * 104729) % 65536"

  /** Interleave the low `bits` bits of px/py into a Morton code — the
    * quadkey both queries cluster on. `idiv` is the integer-division
    * spelling (Spark `div`, DuckDB `//`); everything else is shared. */
  def mortonExpr(px: String, py: String, bits: Int, idiv: String): String =
    (0 until bits).map { i =>
      val p = 1L << i
      s"(($px $idiv $p) % 2) * ${1L << (2 * i)} + " +
        s"(($py $idiv $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Driver-side twin of [[mortonExpr]] for spec bijection pins. */
  def morton(px: Long, py: Long, bits: Int): Long =
    (0 until bits).map { i =>
      ((px >> i) & 1L) << (2 * i) | ((py >> i) & 1L) << (2 * i + 1)
    }.sum

  private val Cell = 4096L // grid pitch == radius: 9 cells always cover

  /** Customers as dosed points with home-cell coordinates. */
  private def points(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "customer")
      .select(
        col("c_custkey").as("id"),
        col("c_mktsegment").as("seg"),
        expr(xExpr("c_custkey")).as("x"),
        expr(yExpr("c_custkey")).as("y"))
      .withColumn("cx", expr(s"x div $Cell"))
      .withColumn("cy", expr(s"y div $Cell"))

  /** q301: GRID-BUCKETED SPATIAL DISTANCE JOIN — all customer pairs
    * within Euclidean radius R, found WITHOUT the all-pairs cross join:
    * each point expands to its 3×3 cell neighborhood (cell pitch = R,
    * so any pair within R differs by at most one cell per axis —
    * |Δx| ≤ R ⇒ |Δcx| ≤ 1, the covering guarantee GeoSpec proves by
    * brute force and at the exact boundary) and probes the other
    * points' HOME cells. Each qualifying pair (a < b) is found exactly
    * once: b's home cell is unique, and it lands in exactly one of a's
    * nine probe cells. Distances compare SQUARED in int64 — no sqrt,
    * no float, both engines bit-agree. The output is the
    * segment-pair census (count / sum of squared distances / closest
    * pair) a geo-dedup or catchment-overlap report publishes.
    *
    * The oracle replicates the same candidate generation (the q62
    * discipline: no recall assumption hides in the compare — the
    * EQUALITY of aggregates over independently generated candidate
    * sets is the checked claim; losslessness vs all-pairs is the
    * spec's claim). Scale: one shuffle on cell keys, 9× candidate
    * fan-out, never O(n²); at 100 TB pick the pitch so cells hold
    * O(100) points and let AQE split the downtown cell. */
  val q301 = Q(
    "q301_spatial_grid_join",
    (s, d) => {
      import graft.Caches.Tracked
      // self-join sides do not CSE the shared dose subtree (BUILDLOG r1
      // invariant): persist the point table once, probe and home read it
      val pts = points(s, d).persistTracked()
      val probe = pts
        .withColumn("dx", explode(expr("sequence(-1, 1)")))
        .withColumn("dy", explode(expr("sequence(-1, 1)")))
        .select(
          col("id"), col("seg"), col("x"), col("y"),
          (col("cx") + col("dx")).as("pcx"),
          (col("cy") + col("dy")).as("pcy"))
      val home = pts.select(
        col("id").as("id_b"), col("seg").as("seg_b"),
        col("x").as("xb"), col("y").as("yb"),
        col("cx"), col("cy"))
      probe
        .join(
          home,
          col("pcx") === col("cx") && col("pcy") === col("cy") &&
            col("id") < col("id_b"))
        .withColumn(
          "d2",
          (col("x") - col("xb")) * (col("x") - col("xb")) +
            (col("y") - col("yb")) * (col("y") - col("yb")))
        .filter(col("d2") <= lit(Cell * Cell))
        .groupBy(
          least(col("seg"), col("seg_b")).as("seg1"),
          greatest(col("seg"), col("seg_b")).as("seg2"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(col("d2")).as("sum_d2"),
          min(col("d2")).as("min_d2"))
        .orderBy(col("seg1"), col("seg2"))
    },
    Some(s"""
      WITH pts AS (
        SELECT c_custkey AS id, c_mktsegment AS seg,
               ${xExpr("c_custkey")} AS x, ${yExpr("c_custkey")} AS y
        FROM customer
      ), cells AS (
        SELECT *, x // $Cell AS cx, y // $Cell AS cy FROM pts
      ), probe AS (
        SELECT c.id, c.seg, c.x, c.y,
               c.cx + dx.d AS pcx, c.cy + dy.d AS pcy
        FROM cells c,
             (VALUES (-1), (0), (1)) dx(d),
             (VALUES (-1), (0), (1)) dy(d)
      ), pairs AS (
        SELECT a.seg AS seg_a, b.seg AS seg_b,
               (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
        FROM probe a
        JOIN cells b ON a.pcx = b.cx AND a.pcy = b.cy AND a.id < b.id
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= ${Cell * Cell}
      )
      SELECT least(seg_a, seg_b) AS seg1, greatest(seg_a, seg_b) AS seg2,
             count(*) AS n_pairs,
             CAST(sum(d2) AS BIGINT) AS sum_d2,
             min(d2) AS min_d2
      FROM pairs
      GROUP BY 1, 2
      ORDER BY seg1, seg2"""))

  /** q302: QUADTREE TILE ROLLUP — the map-tile aggregation: points
    * encoded to a depth-8 Morton quadkey (16 bits, 256×256 tiles), then
    * the per-tile census rolled up the quadtree by INTEGER DIVISION of
    * the code (parent at depth d = code div 4^(8-d) — the property that
    * makes Morton the storage order for tile pyramids: a parent tile is
    * a contiguous code range, so rollups re-key without touching
    * coordinates). Per depth 2/4/6/8: non-empty tiles, heaviest tile
    * (code + count, ties to the smallest code), and the total — which
    * must be invariant across depths (the pyramid conservation law the
    * spec also pins). Scale: the depth-8 tile table is ≤ 65536 rows
    * whatever the input size — every rollup after the first aggregation
    * is metadata-sized; partial aggregates make the first pass one
    * shuffle. */
  val q302 = Q(
    "q302_quadtree_rollup",
    (s, d) => {
      import graft.Caches.Tracked
      // the depth-8 tile table is ≤65536 rows whatever the input — persist
      // it so the four depth legs re-key the tiles, not re-scan the input
      val coded = points(s, d)
        .withColumn("px", expr("x div 256"))
        .withColumn("py", expr("y div 256"))
        .withColumn("code", expr(mortonExpr("px", "py", 8, "div")))
        .groupBy(col("code")).agg(count(lit(1)).as("n"))
        .persistTracked()
      val depths = Seq(2, 4, 6, 8).map { depth =>
        val div = math.pow(4, 8 - depth).toLong
        coded
          .groupBy(expr(s"code div $div").as("tile"))
          .agg(sum(col("n")).as("n"))
          .agg(
            count(lit(1)).as("n_tiles"),
            max(col("n")).as("max_tile_pts"),
            min(struct(negate(col("n")).as("neg"), col("tile"))).as("hv"),
            sum(col("n")).as("total_pts"))
          .select(
            lit(depth.toLong).as("depth"), col("n_tiles"),
            col("max_tile_pts"), col("hv.tile").as("heaviest_tile"),
            col("total_pts"))
      }
      depths.reduce(_.unionAll(_)).orderBy(col("depth"))
    },
    Some {
      val legs = Seq(2, 4, 6, 8).map { depth =>
        val div = math.pow(4, 8 - depth).toLong
        s"""
        SELECT CAST($depth AS BIGINT) AS depth,
               count(*) AS n_tiles,
               CAST(max(n) AS BIGINT) AS max_tile_pts,
               (SELECT t2.tile FROM
                  (SELECT code // $div AS tile, sum(n) AS n
                   FROM coded GROUP BY 1) t2
                ORDER BY t2.n DESC, t2.tile LIMIT 1) AS heaviest_tile,
               CAST(sum(n) AS BIGINT) AS total_pts
        FROM (SELECT code // $div AS tile, sum(n) AS n
              FROM coded GROUP BY 1) t"""
      }
      s"""
      WITH pts AS (
        SELECT ${xExpr("c_custkey")} AS x, ${yExpr("c_custkey")} AS y
        FROM customer
      ), coded AS (
        SELECT ${mortonExpr("(x // 256)", "(y // 256)", 8, "//")} AS code,
               count(*) AS n
        FROM pts
        GROUP BY 1
      )
      ${legs.mkString(" UNION ALL ")}
      ORDER BY depth"""
    })

  val all: Seq[Q] = Seq(q301, q302)
}
