package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Batch 70 — density + symbolization: the gridded KDE hotspot
  * surface (the "where is the heat" map behind every spatial
  * dashboard) and SAX symbolic time-series words (the motif/anomaly
  * alphabet behind pattern mining), both in exact integer arithmetic.
  */
object Analytics31 {

  // sensor field in integer cents (exact) — the Analytics30 lattice.
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

  /** q391 — A3+/F9: discrete-Epanechnikov KDE hotspot surface on the
    * sensor lattice (cell = 4 units, bandwidth = 3 cells), top-15
    * density cells — all-integer masses, so the ranking is exact. */
  val q391 = Declared(
    "q391_kde_grid", "A3,F9",
    (s, dir) => graft.ops.SpatialStats.kdeGrid(
      sensorCents(s, dir), col("x"), col("y"), col("v"),
      cellSize = 4.0, radius = 3)
      .orderBy(col("kde_mass").desc, col("cx"), col("cy")).limit(15),
    Some(s"""WITH $sensorsCentsSql,
           |cells AS (
           |  SELECT CAST(floor(x / 4.0) AS BIGINT) AS cx,
           |    CAST(floor(y / 4.0) AS BIGINT) AS cy,
           |    CAST(sum(v) AS BIGINT) AS xsum
           |  FROM sens GROUP BY 1, 2),
           |offs AS (
           |  SELECT dx.range AS dx, dy.range AS dy,
           |    9 - dx.range * dx.range - dy.range * dy.range AS w
           |  FROM range(-3, 4) dx, range(-3, 4) dy
           |  WHERE dx.range * dx.range + dy.range * dy.range < 9),
           |scat AS (
           |  SELECT cx + dx AS cx, cy + dy AS cy, xsum * w AS m
           |  FROM cells, offs)
           |SELECT cx, cy, CAST(sum(m) AS BIGINT) AS kde_mass,
           |  CAST(count(*) AS BIGINT) AS n_src
           |FROM scat GROUP BY 1, 2
           |ORDER BY kde_mass DESC, cx, cy LIMIT 15""".stripMargin),
    "ONE fact pass to the cell rollup; the kernel scatter explodes the " +
      "ROLLUP by the 29 in-disc offsets into a map-side-combinable groupBy " +
      "on target cells — never a distance join on facts, no inequality " +
      "predicates. Top-15 is TakeOrdered. Integer masses: the hotspot " +
      "ranking can never flip across engines or partitionings.")

  /** q392 — A8/F1: SAX words (quartile-breakpoint variant) of the
    * daily order-count series per priority class, 16-day segments —
    * the symbolic compression behind motif/novelty mining. */
  val q392 = Declared(
    "q392_sax_words", "A8,F1",
    (s, dir) => {
      val ser = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("k"), col("o_orderdate").as("t"))
        .agg(count(lit(1)).as("v"))
      graft.ops.TimeSeriesOps.saxSymbolize(ser, col("k"), col("t"),
        col("v"), segLen = 16)
    },
    Some("""WITH ser AS (
           |  SELECT o_orderpriority AS k, o_orderdate AS t,
           |    CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1, 2),
           |rn AS (
           |  SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY t)
           |    AS rn
           |  FROM ser),
           |seg AS (
           |  SELECT k, (rn - 1) // 16 AS seg, CAST(sum(v) AS BIGINT) AS s
           |  FROM rn GROUP BY 1, 2 HAVING count(*) = 16),
           |rk AS (
           |  SELECT *, row_number() OVER (ORDER BY s, k, seg) AS r,
           |    count(*) OVER () AS nn
           |  FROM seg),
           |bk AS (
           |  SELECT max(CASE WHEN r = (nn + 3) // 4 THEN s END) AS b1,
           |    max(CASE WHEN r = (nn * 2 + 3) // 4 THEN s END) AS b2,
           |    max(CASE WHEN r = (nn * 3 + 3) // 4 THEN s END) AS b3
           |  FROM rk),
           |sym AS (
           |  SELECT k, seg, CASE WHEN s <= b1 THEN 'a'
           |    WHEN s <= b2 THEN 'b' WHEN s <= b3 THEN 'c'
           |    ELSE 'd' END AS c
           |  FROM seg, bk)
           |SELECT k AS key, string_agg(c, '' ORDER BY seg) AS sax_word,
           |  CAST(count(*) AS BIGINT) AS n_segments
           |FROM sym GROUP BY 1 ORDER BY key""".stripMargin),
    "Per-key rank windows are key-partitioned; the only global step is " +
      "quartile rank selection on the SEGMENT rollup (|points|/16 rows, " +
      "documented bounded window). Symbols are pure integer compares and " +
      "words assemble in one collect_list+sort agg per key — the 100 TB " +
      "cost is the day rollup, everything after is rollup-sized.")

  val all: Seq[Declared] = Seq(q391, q392)
}
