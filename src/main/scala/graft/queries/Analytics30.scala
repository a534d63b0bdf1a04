package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.SpatialStats

/** Batch 61 — spatial autocorrelation: the "is it clustered / where"
  * pair every grid rollup eventually gets asked (global Moran's I,
  * local Getis-Ord Gi* hotspots), on the synthetic sensor field the
  * spatial suite already uses (supplier-derived 100×100 lattice,
  * account-balance cents as the value field).
  */
object Analytics30 {

  // sensor field in integer cents (exact): the Spatial.sensors layout
  // with v quantized so every rollup moment is integer.
  private def sensorCents(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.supplier(s, dir).select(
      expr("CAST((s_suppkey * 37) % 100 AS DOUBLE)").as("x"),
      expr("CAST((s_suppkey * 73) % 100 AS DOUBLE)").as("y"),
      expr("CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))

  private val sensorsCentsSql =
    """sens AS (
      |  SELECT CAST((s_suppkey * 37) % 100 AS DOUBLE) AS x,
      |    CAST((s_suppkey * 73) % 100 AS DOUBLE) AS y,
      |    CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM supplier)""".stripMargin

  private val cellsSql =
    """cells AS (
      |  SELECT CAST(floor(x / 10) AS BIGINT) AS cx,
      |    CAST(floor(y / 10) AS BIGINT) AS cy,
      |    CAST(sum(v) AS BIGINT) AS xsum
      |  FROM sens GROUP BY 1, 2)""".stripMargin

  /** q373 — A3/J2+: global Moran's I of the sensor-cents field on a
    * 10×10 cell grid under queen contiguity — integer N-scaled
    * deviations, decimal cross-moments, ONE double division. */
  val q373 = Declared(
    "q373_morans_i", "A3,J2+",
    (s, dir) => SpatialStats.moransI(sensorCents(s, dir),
      col("x"), col("y"), col("v"), cellSize = 10.0),
    Some(s"""WITH $sensorsCentsSql,
           |$cellsSql,
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
           |               CAST(sum(xsum) AS BIGINT) AS s_tot FROM cells),
           |dev AS (
           |  SELECT cx, cy, n_cells,
           |    CAST(n_cells * xsum - s_tot AS BIGINT) AS d
           |  FROM cells, tot),
           |den AS (SELECT max(n_cells) AS n_cells,
           |          sum(CAST(d AS HUGEINT) * d) AS den FROM dev),
           |o AS (SELECT unnest([-1,-1,-1,0,0,1,1,1]) AS dx,
           |             unnest([-1,0,1,-1,1,-1,0,1]) AS dy),
           |pr AS (
           |  SELECT a.d AS da, b.d AS db
           |  FROM dev a, o JOIN dev b
           |    ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy),
           |num AS (SELECT CAST(count(*) AS BIGINT) AS w_pairs,
           |          sum(CAST(da AS HUGEINT) * db) AS num FROM pr)
           |SELECT CAST(n_cells AS BIGINT) AS n_cells, w_pairs,
           |  CASE WHEN den <> 0 AND w_pairs <> 0 THEN
           |    CAST(n_cells AS DOUBLE) * CAST(num AS DOUBLE) /
           |      (CAST(w_pairs AS DOUBLE) * CAST(den AS DOUBLE))
           |  END AS morans_i
           |FROM num, den""".stripMargin),
    "One fact pass (cells rollup, map-side combine); adjacency is an 8-key " +
      "EQUI-join on the ≤100-cell rollup — no inequality join, no cross " +
      "join; moments broadcast. At 100 TB only the first groupBy touches " +
      "the fact table; the statistic itself is rollup-sized.")

  /** q374 — A3/J2+: local Getis-Ord Gi* hotspot z-scores per occupied
    * cell (3×3 incl self, occupied-only weights) — Ord & Getis 1995
    * with the N-cleared integer numerator. */
  val q374 = Declared(
    "q374_getis_ord", "A3,J2+",
    (s, dir) => SpatialStats.getisOrdGiStar(sensorCents(s, dir),
        col("x"), col("y"), col("v"), cellSize = 10.0)
      .orderBy(col("cx"), col("cy")),
    Some(s"""WITH $sensorsCentsSql,
           |$cellsSql,
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
           |          CAST(sum(xsum) AS BIGINT) AS s_tot,
           |          sum(CAST(xsum AS HUGEINT) * xsum) AS sq_tot
           |        FROM cells),
           |o AS (SELECT unnest([-1,-1,-1,0,0,1,1,1]) AS dx,
           |             unnest([-1,0,1,-1,1,-1,0,1]) AS dy),
           |nb AS (
           |  SELECT a.cx, a.cy,
           |    CAST(sum(b.xsum) AS BIGINT) AS nsum,
           |    CAST(count(*) AS BIGINT) AS ncnt
           |  FROM cells a, o JOIN cells b
           |    ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
           |  GROUP BY 1, 2),
           |g AS (
           |  SELECT c.cx, c.cy, c.xsum,
           |    coalesce(nb.nsum, 0) + c.xsum AS gi,
           |    coalesce(nb.ncnt, 0) + 1 AS wi
           |  FROM cells c LEFT JOIN nb ON nb.cx = c.cx AND nb.cy = c.cy)
           |SELECT g.cx, g.cy, g.xsum AS x_sum, CAST(wi AS BIGINT) AS w_i,
           |  CASE WHEN CAST(n_cells AS HUGEINT) * sq_tot -
           |         CAST(s_tot AS HUGEINT) * s_tot <> 0
           |       AND n_cells * wi - wi * wi <> 0 THEN
           |    CAST(n_cells * gi - s_tot * wi AS DOUBLE) /
           |      sqrt(CAST(CAST(n_cells AS HUGEINT) * sq_tot -
           |             CAST(s_tot AS HUGEINT) * s_tot AS DOUBLE) *
           |        (CAST(n_cells * wi - wi * wi AS DOUBLE) /
           |         CAST(n_cells - 1 AS DOUBLE)))
           |  END AS gi_z
           |FROM g, tot ORDER BY g.cx, g.cy""".stripMargin),
    "Same cells-first shape as q373: fact pass = ONE map-side-combined " +
      "rollup; the 3×3 neighborhood is an equi-join on the bounded cell " +
      "set; global moments broadcast onto ≤100 rows. The z algebra is " +
      "integer until one sqrt+division per cell.")

  val all: Seq[Declared] = Seq(q373, q374)
}
