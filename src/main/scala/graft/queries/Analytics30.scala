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

  /** q375 — A8/A-stat: Hurst exponent of the daily order-count series
    * by rescaled-range analysis (Hurst 1951; Mandelbrot & Wallis
    * 1969) over block sizes 16/32/64/128 — integer scaled cumulative
    * deviations, micro-quantized per-block R/S, micro-log OLS
    * finish. */
  val q375 = Declared(
    "q375_hurst_rs", "A8,A-stat",
    (s, dir) => graft.ops.TimeSeriesOps.hurstRS(
      Tables.orders(s, dir)
        .groupBy(expr("datediff(o_orderdate, DATE'1970-01-01')")
          .cast("long").as("day"))
        .agg(count(lit(1)).as("cnt")),
      col("day"), col("cnt"), blockSizes = Seq(16, 32, 64, 128)),
    Some("""WITH daily AS (
           |  SELECT CAST(datediff('day', DATE '1970-01-01', o_orderdate)
           |    AS BIGINT) AS day, CAST(count(*) AS BIGINT) AS y
           |  FROM orders GROUP BY 1),
           |rk AS (
           |  SELECT y, row_number() OVER (ORDER BY day) AS r FROM daily),
           |bl AS (
           |  SELECT n, (r - 1) // n AS b, r, y
           |  FROM rk, (SELECT unnest([16, 32, 64, 128]) AS n) ns),
           |dv AS (
           |  SELECT n, b, y,
           |    row_number() OVER w AS k,
           |    CAST(sum(y) OVER w AS BIGINT) AS c,
           |    CAST(sum(y) OVER (PARTITION BY n, b) AS BIGINT) AS s1
           |  FROM bl
           |  WINDOW w AS (PARTITION BY n, b ORDER BY r
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |pb AS (
           |  SELECT n, b, count(*) AS cnt, max(s1) AS s1,
           |    sum(CAST(y AS HUGEINT) * y) AS s2,
           |    max(n * c - k * s1) AS dmax, min(n * c - k * s1) AS dmin
           |  FROM dv GROUP BY 1, 2),
           |rs AS (
           |  SELECT n, CAST(floor(
           |      CAST(dmax - dmin AS DOUBLE) /
           |      sqrt(CAST(CAST(n AS HUGEINT) * s2 -
           |        CAST(s1 AS HUGEINT) * s1 AS DOUBLE)) * 1e6 + 0.5)
           |    AS BIGINT) AS rs_u
           |  FROM pb
           |  WHERE cnt = n AND
           |    CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 > 0),
           |pn AS (
           |  SELECT CAST(n AS BIGINT) AS n,
           |    CAST(count(*) AS BIGINT) AS n_blocks,
           |    CAST(sum(rs_u) AS BIGINT) AS sum_rs_micro
           |  FROM rs GROUP BY 1),
           |pts AS (
           |  SELECT n, n_blocks, sum_rs_micro,
           |    CAST(sum_rs_micro AS DOUBLE) / 1e6 / n_blocks AS avg_rs,
           |    CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
           |    CAST(floor(ln(CAST(sum_rs_micro AS DOUBLE) / 1e6 / n_blocks)
           |      * 1e6 + 0.5) AS BIGINT) AS y
           |  FROM pn),
           |fit AS (
           |  SELECT CAST(count(*) AS HUGEINT) AS np,
           |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
           |    sum(CAST(x AS HUGEINT) * y) AS sxy,
           |    sum(CAST(x AS HUGEINT) * x) AS sxx
           |  FROM pts)
           |SELECT n, n_blocks, sum_rs_micro, avg_rs,
           |  CASE WHEN CAST(np * sxx - sx * sx AS DOUBLE) <> 0 THEN
           |    CAST(np * sxy - sx * sy AS DOUBLE) /
           |    CAST(np * sxx - sx * sx AS DOUBLE)
           |  END AS hurst
           |FROM pts, fit ORDER BY n""".stripMargin),
    "ONE fact pass (the day rollup); the rank walk is over the bounded " +
      "series rollup (documented expect); block windows are keyed (n, " +
      "block) and the explode multiplies the ROLLUP by 4, never the fact " +
      "table. The long-memory diagnostic run before trusting any i.i.d. " +
      "model of a traffic series.")

  /** q376 — E4+: one DoReMi domain-reweighting step over the document
    * corpus (Xie et al. NeurIPS 2023) — token-share baseline, corpus-
    * unigram proxy loss, exponentiated-gradient tilt toward
    * high-excess domains. η = 1. */
  val q376 = Declared(
    "q376_doremi_step", "E4+",
    (s, dir) => graft.ext.Curation.doremiStep(
      Tables.documents(s, dir), "text", "source"),
    Some("""WITH tok AS (
           |  SELECT source AS domain,
           |    unnest(regexp_split_to_array(lower(text), '\s+')) AS term
           |  FROM documents),
           |freq AS (SELECT term, count(*) AS n_t FROM tok GROUP BY term),
           |total AS (SELECT count(*) AS n_total FROM tok),
           |pd AS (
           |  SELECT domain, CAST(count(*) AS BIGINT) AS n_tokens,
           |    CAST(sum(-round(ln(CAST(n_t AS DOUBLE) / n_total) * 1e6, 0))
           |      AS BIGINT) AS nll_sum
           |  FROM tok JOIN freq USING (term) CROSS JOIN total
           |  GROUP BY domain),
           |pd2 AS (SELECT *, nll_sum // n_tokens AS loss_micro FROM pd),
           |base AS (
           |  SELECT CAST(sum(n_tokens) AS BIGINT) AS t_tot,
           |    CAST(sum(nll_sum) AS BIGINT) // CAST(sum(n_tokens) AS BIGINT)
           |      AS base_micro
           |  FROM pd2),
           |tl AS (
           |  SELECT domain, n_tokens, loss_micro, t_tot,
           |    greatest(0, loss_micro - base_micro) AS excess_micro,
           |    CAST(floor(exp(CAST(greatest(0, loss_micro - base_micro)
           |      AS DOUBLE) / 1e6) * 1e6 + 0.5) AS BIGINT) AS tilt_u
           |  FROM pd2, base),
           |tz AS (
           |  SELECT *, CAST(n_tokens AS HUGEINT) * tilt_u AS mass FROM tl),
           |z AS (SELECT sum(mass) AS z FROM tz)
           |SELECT domain, n_tokens,
           |  CAST(n_tokens AS DOUBLE) / CAST(t_tot AS DOUBLE) AS base_share,
           |  loss_micro, excess_micro,
           |  CAST(mass AS DOUBLE) / CAST(z AS DOUBLE) AS new_share
           |FROM tz, z ORDER BY domain""".stripMargin),
    "The unigramLogProb shape: one token explode -> content-keyed " +
      "frequency agg + 1-row broadcast total; every domain quantity is a " +
      "|domains|-row rollup; the tilt is integer micro-arithmetic. The " +
      "mixture-update step a pretraining pipeline runs between proxy " +
      "epochs at 100 TB.")

  /** q377 — A-stat: Huber M-estimator of quantity per return flag
    * (Huber 1964), 3 IRLS iterations at c = 5 units — the smooth
    * robust-location counterpart to q324's trimmed mean, replayed
    * iteration by iteration in the oracle on the same integer micro
    * grid. */
  val q377 = Declared(
    "q377_huber_location", "A-stat",
    (s, dir) => graft.ops.Aggregates.huberLocation(
      Tables.lineitem(s, dir), col("l_quantity"), col("l_returnflag"),
      cMicro = 5000000L, iterations = 3),
    Some {
      // one IRLS iteration as SQL: mu table m(g, mu) -> next mu table
      def it(prev: String, next: String): String =
        s"""$next AS (
           |  SELECT pv.g,
           |    CAST(sum(CAST(pv.c AS HUGEINT) * w.w * pv.v) * 1000000 //
           |      sum(CAST(pv.c AS HUGEINT) * w.w) AS BIGINT) AS mu
           |  FROM pv JOIN (
           |    SELECT pv.g, pv.v,
           |      CASE WHEN abs(pv.v * 1000000 - $prev.mu) = 0
           |        THEN 1000000
           |        ELSE least(1000000, 5000000000000 //
           |          abs(pv.v * 1000000 - $prev.mu)) END AS w
           |    FROM pv JOIN $prev ON $prev.g = pv.g) w
           |    ON w.g = pv.g AND w.v = pv.v
           |  GROUP BY pv.g)""".stripMargin
      s"""WITH pv AS MATERIALIZED (
         |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM lineitem GROUP BY 1, 2),
         |m0 AS (
         |  SELECT g, CAST(sum(CAST(c AS HUGEINT) * v) * 1000000 //
         |    sum(CAST(c AS HUGEINT)) AS BIGINT) AS mu
         |  FROM pv GROUP BY g),
         |${it("m0", "m1")},
         |${it("m1", "m2")},
         |${it("m2", "m3")},
         |nn AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM pv GROUP BY g)
         |SELECT nn.g, nn.n, m0.mu AS mean_micro, m3.mu AS huber_mu_micro,
         |  CAST(m3.mu AS DOUBLE) / 1e6 AS huber_mu
         |FROM nn JOIN m0 ON m0.g = nn.g JOIN m3 ON m3.g = nn.g
         |ORDER BY nn.g""".stripMargin
    },
    "ONE fact pass (the group x value rollup, map-side combine); the 3 " +
      "IRLS updates run on that |g|x50 rollup with exact integer-micro " +
      "weights and decimal floor divisions — bit-portable across engines " +
      "and partitionings, robust to the heavy tail q324 trims.")

  /** q378 — C11+/E6: functional-dependency audit over declared
    * candidates on orders — key FDs hold, attribute FDs fail with the
    * g3 repair count (Kivinen & Mannila 1995). */
  val q378 = Declared(
    "q378_fd_audit", "C11+,E6",
    (s, dir) => graft.ops.Expectations.fdAudit(
      Tables.orders(s, dir), Seq(
        (Seq("o_orderkey"), "o_custkey"),
        (Seq("o_custkey"), "o_orderpriority"),
        (Seq("o_orderdate", "o_custkey"), "o_orderkey"),
        (Seq("o_orderstatus"), "o_orderpriority")))
      .orderBy(col("fd")),
    Some {
      def cand(lhs: Seq[String], rhs: String): String = {
        val l = lhs.mkString(", ")
        s"""SELECT '${lhs.mkString(",")} -> $rhs' AS fd,
           |  CAST(count(*) AS BIGINT) AS n_groups,
           |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating,
           |  CAST(sum(CASE WHEN nd > 1 THEN sz - mx ELSE 0 END) AS BIGINT)
           |    AS violation_rows,
           |  CAST(CASE WHEN sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
           |    THEN 1 ELSE 0 END AS INTEGER) AS holds
           |FROM (
           |  SELECT $l, count(*) AS nd, CAST(sum(c) AS BIGINT) AS sz,
           |    CAST(max(c) AS BIGINT) AS mx
           |  FROM (SELECT $l, $rhs, CAST(count(*) AS BIGINT) AS c
           |        FROM orders GROUP BY ALL) p
           |  GROUP BY ALL) gg""".stripMargin
      }
      Seq(cand(Seq("o_orderkey"), "o_custkey"),
        cand(Seq("o_custkey"), "o_orderpriority"),
        cand(Seq("o_orderdate", "o_custkey"), "o_orderkey"),
        cand(Seq("o_orderstatus"), "o_orderpriority"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
    },
    "Each candidate is one lhs-keyed partial agg over a (lhs, rhs) rollup " +
      "— no countDistinct expansion, map-side combined, candidates " +
      "independent. The schema-contract profiler run before trusting any " +
      "join key at 100 TB.")

  /** q379 — J3+: mutual nearest-neighbor pairs on the synthetic
    * feature lattice — the record-linkage matching primitive; the
    * oracle brute-forces all pairs at the gate SF, proving the
    * grid-pruned form lossless. */
  val q379 = Declared(
    "q379_mutual_nn", "J3+",
    (s, dir) => SpatialStats.mutualNearestNeighbors(
      Tables.part(s, dir).select(col("p_partkey").as("fid"),
        expr("CAST((p_partkey * 29) % 100 AS BIGINT)").as("x"),
        expr("CAST((p_partkey * 53) % 100 AS BIGINT)").as("y")),
      col("fid"), col("x"), col("y"), pruneRadius = 10.0)
      .orderBy(col("id_a")),
    Some("""WITH f AS (
           |  SELECT p_partkey AS id, (p_partkey * 29) % 100 AS px,
           |    (p_partkey * 53) % 100 AS py
           |  FROM part),
           |nn AS (
           |  SELECT id, nid, d2 FROM (
           |    SELECT a.id, b.id AS nid,
           |      (a.px - b.px) * (a.px - b.px) +
           |      (a.py - b.py) * (a.py - b.py) AS d2,
           |      row_number() OVER (PARTITION BY a.id ORDER BY
           |        (a.px - b.px) * (a.px - b.px) +
           |        (a.py - b.py) * (a.py - b.py), b.id) AS rn
           |    FROM f a JOIN f b ON b.id <> a.id) WHERE rn = 1)
           |SELECT CAST(x.id AS BIGINT) AS id_a,
           |  CAST(x.nid AS BIGINT) AS id_b, CAST(x.d2 AS BIGINT) AS d2
           |FROM nn x JOIN nn y ON y.id = x.nid AND y.nid = x.id
           |WHERE x.id < x.nid
           |ORDER BY id_a""".stripMargin),
    "Candidates from a 3x3 grid-bucket EQUI-join at the prune radius; the " +
      "brute fallback only sees points whose nearest candidate is farther — " +
      "near zero at a sane radius. The oracle's all-pairs form exists only " +
      "at the gate SF to prove the pruned form finds every mutual pair.")

  /** q380 — A3+: Ripley's K/L point-pattern profile of the feature
    * lattice at radii 5/10/15/20 (no edge correction, stated) —
    * exact integer pair counts from one grid-bucket join at r_max. */
  val q380 = Declared(
    "q380_ripleys_k", "A3+",
    (s, dir) => SpatialStats.ripleysK(
      Tables.part(s, dir).select(
        expr("CAST((p_partkey * 29) % 100 AS BIGINT)").as("x"),
        expr("CAST((p_partkey * 53) % 100 AS BIGINT)").as("y")),
      col("x"), col("y"), radii = Seq(5, 10, 15, 20), area = 10000.0),
    Some("""WITH f AS (
           |  SELECT p_partkey AS id, (p_partkey * 29) % 100 AS px,
           |    (p_partkey * 53) % 100 AS py
           |  FROM part),
           |pr AS (
           |  SELECT (a.px - b.px) * (a.px - b.px) +
           |    (a.py - b.py) * (a.py - b.py) AS d2
           |  FROM f a JOIN f b ON b.id <> a.id),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n_points FROM f),
           |c AS (
           |  SELECT r, CAST((SELECT sum(CASE WHEN d2 <= r * r THEN 1
           |      ELSE 0 END) FROM pr) AS BIGINT) AS n_pairs
           |  FROM (SELECT unnest([5, 10, 15, 20]) AS r))
           |SELECT CAST(r AS BIGINT) AS r, n_points, n_pairs,
           |  10000.0 * CAST(n_pairs AS DOUBLE) /
           |    (CAST(n_points AS DOUBLE) * CAST(n_points - 1 AS DOUBLE))
           |    AS k_hat,
           |  sqrt(10000.0 * CAST(n_pairs AS DOUBLE) /
           |    (CAST(n_points AS DOUBLE) * CAST(n_points - 1 AS DOUBLE)) /
           |    pi()) AS l_hat,
           |  sqrt(10000.0 * CAST(n_pairs AS DOUBLE) /
           |    (CAST(n_points AS DOUBLE) * CAST(n_points - 1 AS DOUBLE)) /
           |    pi()) - r AS l_minus_r
           |FROM c, n ORDER BY r""".stripMargin),
    "ONE grid-bucket candidate join at r_max = 20 (cell equi-join, pair " +
      "volume = true local-density count, never n^2); all four radii are " +
      "conditional sums over that single pass. The clustered-vs-dispersed " +
      "diagnostic run alongside q373's Moran I.")

  /** q381 — A-stat: Mantel-Haenszel pooled odds ratio of high
    * priority vs even custkey, stratified by order year (Mantel &
    * Haenszel 1959) — per-stratum terms floor-div-quantized to
    * micro so the pooled sums are exact; crude OR alongside for the
    * Simpson comparison. */
  val q381 = Declared(
    "q381_mantel_haenszel", "A-stat",
    (s, dir) => graft.ops.Experimentation.mantelHaenszelOr(
      Tables.orders(s, dir), year(col("o_orderdate")),
      col("o_custkey") % 2 === 0,
      col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
    Some("""WITH cells AS (
           |  SELECT year(o_orderdate) AS s,
           |    CAST(sum(CASE WHEN o_custkey % 2 = 0 AND o_orderpriority IN
           |      ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS a,
           |    CAST(sum(CASE WHEN o_custkey % 2 = 0 AND o_orderpriority NOT
           |      IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS b,
           |    CAST(sum(CASE WHEN o_custkey % 2 <> 0 AND o_orderpriority IN
           |      ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS c,
           |    CAST(sum(CASE WHEN o_custkey % 2 <> 0 AND o_orderpriority NOT
           |      IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS d
           |  FROM orders GROUP BY 1),
           |n AS (SELECT *, a + b + c + d AS n FROM cells)
           |SELECT CAST(count(*) AS BIGINT) AS n_strata,
           |  CAST(sum(CAST(a AS HUGEINT) * d * 1000000 // n) AS BIGINT)
           |    AS sum_ad_micro,
           |  CAST(sum(CAST(b AS HUGEINT) * c * 1000000 // n) AS BIGINT)
           |    AS sum_bc_micro,
           |  CASE WHEN sum(CAST(b AS HUGEINT) * c * 1000000 // n) <> 0 THEN
           |    CAST(sum(CAST(a AS HUGEINT) * d * 1000000 // n) AS DOUBLE) /
           |    CAST(sum(CAST(b AS HUGEINT) * c * 1000000 // n) AS DOUBLE)
           |  END AS or_mh,
           |  CASE WHEN CAST(CAST(sum(b) AS HUGEINT) * sum(c) AS DOUBLE)
           |      <> 0 THEN
           |    CAST(CAST(sum(a) AS HUGEINT) * sum(d) AS DOUBLE) /
           |    CAST(CAST(sum(b) AS HUGEINT) * sum(c) AS DOUBLE)
           |  END AS crude_or
           |FROM n""".stripMargin),
    "One conditional-sum agg keyed by stratum (map-side combine), then a " +
      "|strata|-row rollup — per-stratum terms are integer floor-division " +
      "quantized so the pooled sums commute exactly. The confounding-robust " +
      "pooled OR run wherever q209's single-table OR would Simpson-flip.")

  /** q382 — A-stat: Wald IV estimate of cents-per-lineitem with the
    * custkey-parity instrument (Wald 1940; Angrist-Imbens-Rubin 1996)
    * — exact integer clearing, one double division per output. */
  val q382 = Declared(
    "q382_wald_iv", "A-stat",
    (s, dir) => {
      val items = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
      val joined = Tables.orders(s, dir)
        .join(items, col("o_orderkey") === col("l_orderkey"))
      graft.ops.Experimentation.waldIv(joined,
        col("o_custkey") % 2 === 0, col("n_items"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
    },
    Some("""WITH items AS (
           |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS x
           |  FROM lineitem GROUP BY 1),
           |j AS (
           |  SELECT o_custkey % 2 = 0 AS z, x,
           |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
           |  FROM orders JOIN items ON l_orderkey = o_orderkey),
           |m AS (
           |  SELECT CAST(sum(CASE WHEN z THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           |    CAST(sum(CASE WHEN NOT z THEN 1 ELSE 0 END) AS BIGINT) AS n0,
           |    sum(CASE WHEN z THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx1,
           |    sum(CASE WHEN NOT z THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx0,
           |    sum(CASE WHEN z THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy1,
           |    sum(CASE WHEN NOT z THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy0
           |  FROM j)
           |SELECT n1, n0,
           |  CASE WHEN CAST(sx1 * n0 - sx0 * n1 AS DOUBLE) <> 0 THEN
           |    CAST(sy1 * n0 - sy0 * n1 AS DOUBLE) /
           |    CAST(sx1 * n0 - sx0 * n1 AS DOUBLE)
           |  END AS beta_iv,
           |  CAST(sx1 * n0 - sx0 * n1 AS DOUBLE) /
           |    CAST(CAST(n1 AS HUGEINT) * n0 AS DOUBLE) AS first_stage,
           |  CAST(sy1 * n0 - sy0 * n1 AS DOUBLE) /
           |    CAST(CAST(n1 AS HUGEINT) * n0 AS DOUBLE) AS itt
           |FROM m""".stripMargin),
    "One lineitem rollup (map-side combine) -> one orderkey equi-join -> " +
      "ONE conditional-sum agg; the clearing keeps everything integer " +
      "until three final divisions. The 2SLS-at-scale primitive for " +
      "binary instruments — encouragement designs, randomized rollouts.")

  /** q383 — A-stat: Holm step-down FWER control over the q220
    * supplier return-rate hypotheses (Holm 1979) — same z/p
    * machinery, step-DOWN cutoff; run beside q220 the discovery sets
    * show exactly what FWER control costs vs FDR. */
  val q383 = Declared(
    "q383_holm_stepdown", "A-stat,W2",
    (s, dir) => graft.ops.Experimentation.holmDiscoveries(
      Tables.lineitem(s, dir).select(col("l_suppkey").as("supplier"),
        col("l_returnflag")),
      "supplier", col("l_returnflag") === "R"),
    Some("""WITH g AS (
           |  SELECT supplier, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS successes
           |  FROM (SELECT l_suppkey AS supplier, l_returnflag FROM lineitem)
           |  GROUP BY supplier),
           |gl AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
           |              CAST(sum(successes) AS BIGINT) AS ts,
           |              CAST(count(*) AS BIGINT) AS m FROM g),
           |z AS (
           |  SELECT supplier, n, successes, m,
           |    (CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) -
           |       CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE)) /
           |    sqrt(CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE) *
           |         (1.0 - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE)) /
           |         CAST(n AS DOUBLE)) AS zv
           |  FROM g CROSS JOIN gl),
           |e AS (SELECT *, 1.0 / (1.0 + 0.3275911 * (abs(zv) / sqrt(2.0))) AS t,
           |             abs(zv) / sqrt(2.0) AS xa FROM z),
           |p AS (SELECT *,
           |    (((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
           |       - 0.284496736) * t + 0.254829592) * t) * exp(-(xa * xa)) AS pv
           |  FROM e),
           |r AS (SELECT *, CAST(row_number() OVER (ORDER BY pv, supplier)
           |                     AS BIGINT) AS p_rank FROM p),
           |k AS (SELECT coalesce(min(CASE WHEN pv > 5.0 / 100 /
           |        CAST(m - p_rank + 1 AS DOUBLE) THEN p_rank END),
           |        9223372036854775807) AS f FROM r)
           |SELECT supplier, n, successes,
           |  successes * 1000000 // n AS rate_ppm,
           |  CAST(round(zv * 1000, 0) AS BIGINT) AS z_milli,
           |  CAST(round(pv * 1e9, 0) AS BIGINT) AS p_nano,
           |  p_rank, p_rank < f AS discovery
           |FROM r CROSS JOIN k
           |ORDER BY p_rank""".stripMargin),
    "Identical scale shape to q220 (one keyed agg, |groups|-row scoring, " +
      "range-shuffle rank, one broadcast scalar) — the cutoff is the FIRST " +
      "failing rank instead of the last passing one. FWER when a false " +
      "positive is expensive; FDR when discovery volume matters.")

  /** q384 — E2+: double-sweep diameter lower bound of the
    * supplier-part co-purchase graph (Magnien-Latapy-Habib 2009),
    * 4 min-plus rounds per sweep — the oracle unrolls BOTH sweeps
    * with the argmax hop in between. */
  val q384 = Declared(
    "q384_diameter_sweep", "E2+,E6",
    (s, dir) => graft.ext.Graph.diameterTwoSweep(
      Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("src"),
          (col("l_partkey") + lit(1099511627776L)).as("dst")),
      "src", "dst", rounds = 4),
    Some {
      def sweep(pfx: String, seedSql: String) = {
        val rounds = (1 to 4).map { k =>
          s"""${pfx}i$k AS (
             |  SELECT s.dst AS node, min(d.dist) + 1 AS dist
             |  FROM sym s JOIN ${pfx}d${k - 1} d ON s.src = d.node
             |  GROUP BY s.dst),
             |${pfx}d$k AS (
             |  SELECT node, CAST(min(dist) AS BIGINT) AS dist
             |  FROM (SELECT * FROM ${pfx}d${k - 1}
             |        UNION ALL SELECT * FROM ${pfx}i$k)
             |  GROUP BY node)""".stripMargin
        }.mkString(",\n")
        s"""${pfx}d0 AS ($seedSql),
           |$rounds""".stripMargin
      }
      s"""WITH e0 AS (
         |  SELECT DISTINCT l_suppkey AS src, l_partkey + 1099511627776 AS dst
         |  FROM lineitem),
         |sym AS MATERIALIZED (
         |  SELECT src, dst FROM e0
         |  UNION
         |  SELECT dst AS src, src AS dst FROM e0),
         |${sweep("a",
          "SELECT min(l_suppkey) AS node, CAST(0 AS BIGINT) AS dist FROM lineitem")},
         |f1 AS (SELECT node AS far_node_1, dist AS ecc_1 FROM ad4
         |       ORDER BY dist DESC, node LIMIT 1),
         |${sweep("b",
          "SELECT far_node_1 AS node, CAST(0 AS BIGINT) AS dist FROM f1")},
         |f2 AS (SELECT node AS far_node_2, dist AS diameter_lb FROM bd4
         |       ORDER BY dist DESC, node LIMIT 1)
         |SELECT (SELECT min(l_suppkey) FROM lineitem) AS seed_node,
         |  far_node_1, ecc_1, far_node_2, diameter_lb
         |FROM f1, f2""".stripMargin
    },
    "Two q155-shaped LAYERED BFS pipelines (round 8: per-round joins touch " +
      "only the newest layer; empty-layer early exit; one shared " +
      "symmetrize+checkpoint feeds both sweeps) with a TakeOrdered(1) " +
      "argmax between them — the graph-width diagnostic before choosing " +
      "iteration counts for any propagation op at 100 TB.")

  /** q385 — A-stat: Brunner-Munzel generalized Wilcoxon (Brunner &
    * Munzel 2000) of quantity, A vs R — the nonparametric
    * Behrens-Fisher test beside q152's Mann-Whitney and q324's Yuen
    * t on the same data; doubled midranks from cumulative counts,
    * n-cleared integer placements, pinned double finish. */
  val q385 = Declared(
    "q385_brunner_munzel", "A-stat",
    (s, dir) => graft.ops.Aggregates.brunnerMunzel(
      Tables.lineitem(s, dir), col("l_quantity"), col("l_returnflag"),
      "A", "R"),
    Some("""WITH d AS (
           |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
           |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
           |pv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
           |       FROM d GROUP BY g, v),
           |tot AS (
           |  SELECT v,
           |    2 * coalesce(sum(cv) OVER (ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      + cv + 1 AS rho
           |  FROM (SELECT v, CAST(sum(c) AS BIGINT) AS cv
           |        FROM pv GROUP BY v)),
           |cum AS (
           |  SELECT pv.g, pv.v, pv.c, tot.rho,
           |    2 * coalesce(sum(pv.c) OVER (PARTITION BY pv.g ORDER BY pv.v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      + pv.c + 1 AS rhos,
           |    CAST(sum(pv.c) OVER (PARTITION BY pv.g) AS BIGINT) AS n,
           |    CAST(sum(pv.c * tot.rho) OVER (PARTITION BY pv.g) AS HUGEINT)
           |      AS srho
           |  FROM pv JOIN tot USING (v)),
           |dd AS (
           |  SELECT g, c, n, srho,
           |    CAST(n AS HUGEINT) * (rho - rhos + n + 1) - srho AS dv
           |  FROM cum),
           |gg AS (
           |  SELECT g, max(n) AS n, max(srho) AS srho,
           |    sum(CAST(c AS HUGEINT) * dv * dv) AS sd2
           |  FROM dd GROUP BY g),
           |j AS (
           |  SELECT a.n AS n_a, b.n AS n_b,
           |    CAST(a.sd2 AS DOUBLE) /
           |      CAST(CAST(4 AS HUGEINT) * a.n * (CAST(a.n AS HUGEINT) - 1)
           |        AS DOUBLE) AS t1,
           |    CAST(b.sd2 AS DOUBLE) /
           |      CAST(CAST(4 AS HUGEINT) * b.n * (CAST(b.n AS HUGEINT) - 1)
           |        AS DOUBLE) AS t2,
           |    CAST(CAST(a.n AS HUGEINT) * b.srho -
           |         CAST(b.n AS HUGEINT) * a.srho AS DOUBLE) AS num,
           |    CAST(b.srho - CAST(b.n AS HUGEINT) * (b.n + 1) AS DOUBLE) /
           |      CAST(CAST(2 AS HUGEINT) * a.n * b.n AS DOUBLE) AS p_hat
           |  FROM (SELECT * FROM gg WHERE g = 'A') a,
           |       (SELECT * FROM gg WHERE g = 'R') b)
           |SELECT n_a, n_b, p_hat,
           |  CASE WHEN t1 + t2 <> 0 THEN
           |    num / 2.0 / CAST(n_a + n_b AS DOUBLE) / sqrt(t1 + t2)
           |  END AS bm_stat,
           |  CASE WHEN t1 <> 0 OR t2 <> 0 THEN
           |    (t1 + t2) * (t1 + t2) /
           |    (t1 * t1 / CAST(n_a - 1 AS DOUBLE) +
           |     t2 * t2 / CAST(n_b - 1 AS DOUBLE))
           |  END AS df
           |FROM j""".stripMargin),
    "The q152/q324 rollup envelope: ONE fact pass to the (group x value) " +
      "rollup; the combined-rank cumulative runs on the bounded distinct-" +
      "value frame (documented window); placements are n-cleared integers. " +
      "The rank test that keeps its level when the two arms have different " +
      "spreads — where Mann-Whitney's null is subtly wrong.")

  /** q386 — A3+/J2: areal interpolation of the sensor-cents field
    * onto three overlapping report zones (Goodchild & Lam 1980) —
    * exact integer rectangle-overlap weights on the 10-unit cell
    * grid, mass + area-weighted-mean readouts. */
  val q386 = Declared(
    "q386_areal_interp", "A3+,J2",
    (s, dir) => SpatialStats.arealInterpolate(
      sensorCents(s, dir), col("x"), col("y"), col("v"), cellSize = 10L,
      zones = Seq(
        SpatialStats.Zone("west", 0L, 0L, 45L, 100L),
        SpatialStats.Zone("east", 45L, 0L, 100L, 100L),
        SpatialStats.Zone("core", 25L, 25L, 75L, 75L))),
    Some(s"""WITH $sensorsCentsSql,
           |$cellsSql,
           |z AS (SELECT * FROM (VALUES
           |  ('west', 0, 0, 45, 100), ('east', 45, 0, 100, 100),
           |  ('core', 25, 25, 75, 75)) AS t(zone, zx0, zy0, zx1, zy1)),
           |ov AS (
           |  SELECT z.zone, c.xsum,
           |    greatest(0, least(zx1, (cx + 1) * 10) -
           |      greatest(zx0, cx * 10)) *
           |    greatest(0, least(zy1, (cy + 1) * 10) -
           |      greatest(zy0, cy * 10)) AS ovl
           |  FROM cells c, z),
           |ag AS (
           |  SELECT zone, CAST(sum(ovl) AS BIGINT) AS ca,
           |    CAST(sum(CAST(xsum AS HUGEINT) * ovl) AS HUGEINT) AS wsum
           |  FROM ov WHERE ovl > 0 GROUP BY zone)
           |SELECT z.zone AS zone,
           |  coalesce(ag.ca, 0) AS covered_area,
           |  CASE WHEN ag.ca IS NOT NULL THEN
           |    CAST(ag.wsum AS DOUBLE) / 100.0 END AS mass,
           |  CASE WHEN ag.ca IS NOT NULL THEN
           |    CAST(ag.wsum AS DOUBLE) / CAST(ag.ca AS DOUBLE)
           |  END AS mean_value
           |FROM (SELECT DISTINCT zone FROM z) z LEFT JOIN ag USING (zone)
           |ORDER BY zone""".stripMargin),
    "ONE fact pass (the cell rollup); zones are a literal broadcast " +
      "explode, overlap areas exact integers, one division per zone per " +
      "readout. The zonal-system reconciliation (census tract <-> grid <-> " +
      "catchment) every geo reporting pipeline needs.")

  /** q387 — A-stat/E7: shifted-beta-geometric churn fit of the 1995
    * first-order cohort's year-over-year renewal (Fader & Hardie
    * 2007) — deaths = first missed year 1996-1999, survivors
    * censored; 100×100 (a,b) lattice MLE with micro-nat quantized
    * terms. */
  val q387 = Declared(
    "q387_sbg_churn_fit", "A-stat,E7",
    (s, dir) => {
      val acts = Tables.orders(s, dir)
        .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
        .distinct()
      val per = acts.groupBy(col("o_custkey")).agg(
        min(col("y")).as("fy"),
        max(when(col("y") === 1996, 1L).otherwise(0L)).as("a1"),
        max(when(col("y") === 1997, 1L).otherwise(0L)).as("a2"),
        max(when(col("y") === 1998, 1L).otherwise(0L)).as("a3"),
        max(when(col("y") === 1999, 1L).otherwise(0L)).as("a4"))
      val cohort = per.filter(col("fy") === 1995)
        .withColumn("t",
          when(col("a1") === 0, 1L).when(col("a2") === 0, 2L)
            .when(col("a3") === 0, 3L).when(col("a4") === 0, 4L)
            .otherwise(0L))
        .withColumn("censored", col("t") === 0L)
      graft.ops.Experimentation.sbgFit(cohort, col("t"), col("censored"),
        horizon = 4, gridDen = 20, gridMax = 100)
    },
    Some("""WITH acts AS (
           |  SELECT DISTINCT o_custkey, year(o_orderdate) AS y FROM orders),
           |per AS (
           |  SELECT o_custkey, min(y) AS fy,
           |    max(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS a1,
           |    max(CASE WHEN y = 1997 THEN 1 ELSE 0 END) AS a2,
           |    max(CASE WHEN y = 1998 THEN 1 ELSE 0 END) AS a3,
           |    max(CASE WHEN y = 1999 THEN 1 ELSE 0 END) AS a4
           |  FROM acts GROUP BY 1),
           |coh AS (
           |  SELECT CASE WHEN a1 = 0 THEN 1 WHEN a2 = 0 THEN 2
           |    WHEN a3 = 0 THEN 3 WHEN a4 = 0 THEN 4 ELSE 0 END AS t
           |  FROM per WHERE fy = 1995),
           |cnt AS (
           |  SELECT t, t = 0 AS c, CAST(count(*) AS BIGINT) AS n
           |  FROM coh GROUP BY 1, 2),
           |grid AS (
           |  SELECT ia.range AS ia, ib.range AS ib,
           |    ia.range / 20.0 AS a, ib.range / 20.0 AS b
           |  FROM range(1, 101) ia, range(1, 101) ib),
           |pr AS (
           |  SELECT *, a / (a + b) AS p1,
           |    a / (a + b) * b / (a + b + 1) AS p2,
           |    a / (a + b) * b / (a + b + 1) * (b + 1) / (a + b + 2) AS p3,
           |    a / (a + b) * b / (a + b + 1) * (b + 1) / (a + b + 2)
           |      * (b + 2) / (a + b + 3) AS p4
           |  FROM grid),
           |pr2 AS (SELECT *, 1.0 - p1 - p2 - p3 - p4 AS s4 FROM pr),
           |sc AS (
           |  SELECT ia, ib, a, b, p1,
           |    sum(n * CAST(floor((CASE WHEN c THEN ln(s4)
           |      WHEN t = 1 THEN ln(p1) WHEN t = 2 THEN ln(p2)
           |      WHEN t = 3 THEN ln(p3) ELSE ln(p4) END) * 1e6 + 0.5)
           |      AS BIGINT)) AS ll_micro
           |  FROM cnt, pr2 GROUP BY 1, 2, 3, 4, 5)
           |SELECT a, b, CAST(ll_micro AS BIGINT) AS ll_micro, p1
           |FROM sc ORDER BY ll_micro DESC, ia, ib LIMIT 1""".stripMargin),
    "The fact pass is ONE distinct + ONE customer rollup; the MLE runs on " +
      "a (K+1) x 10000 literal lattice with integer micro-nat terms, so the " +
      "argmax is exact and engine-independent. A boundary fit (b at the " +
      "lattice edge, as this synthetic cohort produces) is itself the " +
      "diagnostic: heterogeneity ~ 0, plain geometric churn suffices.")

  /** q388 — A-stat: Cochran-Mantel-Haenszel chi-square on the q381
    * strata — the pooled TEST beside the pooled estimate; continuity-
    * corrected, micro-quantized E and V sums. */
  val q388 = Declared(
    "q388_cmh_chi2", "A-stat",
    (s, dir) => graft.ops.Experimentation.cmhChiSquare(
      Tables.orders(s, dir), year(col("o_orderdate")),
      col("o_custkey") % 2 === 0,
      col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
    Some("""WITH cells AS (
           |  SELECT year(o_orderdate) AS s,
           |    CAST(sum(CASE WHEN o_custkey % 2 = 0 AND o_orderpriority IN
           |      ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS a,
           |    CAST(sum(CASE WHEN o_custkey % 2 = 0 AND o_orderpriority NOT
           |      IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS b,
           |    CAST(sum(CASE WHEN o_custkey % 2 <> 0 AND o_orderpriority IN
           |      ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS c,
           |    CAST(sum(CASE WHEN o_custkey % 2 <> 0 AND o_orderpriority NOT
           |      IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS d
           |  FROM orders GROUP BY 1),
           |m AS (
           |  SELECT *, a + b + c + d AS n FROM cells),
           |q AS (
           |  SELECT
           |    CAST(CAST(a + b AS HUGEINT) * (a + c) * 1000000 // n
           |      AS BIGINT) AS e_u,
           |    CAST(CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d)
           |      * 1000000 // (CAST(n AS HUGEINT) * n * (n - 1))
           |      AS BIGINT) AS v_u,
           |    a
           |  FROM m)
           |SELECT CAST(count(*) AS BIGINT) AS n_strata,
           |  CAST(sum(a) AS BIGINT) AS sum_a,
           |  CAST(sum(e_u) AS BIGINT) AS sum_e_micro,
           |  CAST(sum(v_u) AS BIGINT) AS sum_v_micro,
           |  CASE WHEN sum(v_u) > 0 THEN
           |    greatest(0.0, abs(CAST(sum(a) AS DOUBLE) -
           |      CAST(sum(e_u) AS DOUBLE) / 1e6) - 0.5) *
           |    greatest(0.0, abs(CAST(sum(a) AS DOUBLE) -
           |      CAST(sum(e_u) AS DOUBLE) / 1e6) - 0.5) /
           |    (CAST(sum(v_u) AS DOUBLE) / 1e6)
           |  END AS cmh_chi2
           |FROM q""".stripMargin),
    "Same scale shape as q381 (one stratum-keyed conditional agg + a " +
      "|strata|-row finish); E and V quantize by integer floor division so " +
      "the pooled sums commute exactly. Estimate (q381) and test (q388) " +
      "together are the full stratified-2x2 toolkit.")

  /** q389 — A8: SES smoothing-constant fit over the daily order-count
    * series — one-step-ahead integer SSE on the α = k/20 lattice
    * (Hyndman-Athanasopoulos FPP procedure), the exact-integer q156
    * recursion replayed per α by a recursive-CTE oracle. */
  val q389 = Declared(
    "q389_ses_grid_fit", "A8",
    (s, dir) => graft.ops.TimeSeriesOps.sesGridFit(
      Tables.orders(s, dir)
        .groupBy(expr("datediff(o_orderdate, DATE'1970-01-01')")
          .cast("long").as("day"))
        .agg(count(lit(1)).as("cnt")),
      col("day"), col("cnt"), den = 20L),
    Some("""WITH RECURSIVE daily AS (
           |  SELECT CAST(datediff('day', DATE '1970-01-01', o_orderdate)
           |    AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1),
           |rk AS MATERIALIZED (
           |  SELECT t, v, row_number() OVER (ORDER BY t) AS r
           |  FROM daily),
           |al AS (SELECT range AS num FROM range(1, 20)),
           |fit(num, r, s, sse, n) AS (
           |  SELECT al.num, 1, rk.v, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
           |  FROM al, rk WHERE rk.r = 1
           |  UNION ALL
           |  SELECT f.num, f.r + 1,
           |    (f.num * rk.v + (20 - f.num) * f.s) // 20,
           |    f.sse + (rk.v - f.s) * (rk.v - f.s),
           |    f.n + 1
           |  FROM fit f JOIN rk ON rk.r = f.r + 1),
           |fin AS (
           |  SELECT num, max_by(sse, r) AS sse, max_by(n, r) AS n
           |  FROM fit GROUP BY num),
           |best AS (SELECT min(sse) AS bsse FROM fin),
           |bnum AS (SELECT min(num) AS bn FROM fin, best WHERE sse = bsse)
           |SELECT CAST(num AS BIGINT) AS num, CAST(20 AS BIGINT) AS den,
           |  num / 20.0 AS alpha, n AS n_scored, sse,
           |  num = bn AS best
           |FROM fin, bnum ORDER BY num""".stripMargin),
    "The q156 envelope: the fact pass is the day rollup; all 19 alpha " +
      "recursions fold over ONE collected rollup array (exact integer " +
      "state, argmin can never flip). The smoothing-constant selection " +
      "every operational forecast needs before q156/q173 run for real.")

  /** q390 — A-stat: negative-binomial method-of-moments fit of
    * per-customer yearly order counts by nation — the overdispersed-
    * count model readout beside q288's dispersion test. */
  val q390 = Declared(
    "q390_negbin_mom", "A-stat",
    (s, dir) => {
      val perCust = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === 1995)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("k"))
      val joined = Tables.customer(s, dir)
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_nationkey").as("nation"),
          coalesce(col("k"), lit(0L)).as("k"))
      graft.ops.Aggregates.negBinomialMom(joined, col("k"), col("nation"))
    },
    Some("""WITH pc AS (
           |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS k
           |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
           |j AS (
           |  SELECT c_nationkey AS g, coalesce(pc.k, 0) AS v
           |  FROM customer LEFT JOIN pc ON o_custkey = c_custkey),
           |m AS (
           |  SELECT g, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(v) AS HUGEINT) AS s1,
           |    sum(CAST(v AS HUGEINT) * v) AS s2
           |  FROM j GROUP BY g HAVING count(*) >= 2),
           |f AS (
           |  SELECT g, n,
           |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           |    CAST(CAST(n AS HUGEINT) * s2 - s1 * s1 AS DOUBLE) /
           |    CAST(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) - 1)
           |      AS DOUBLE) AS variance
           |  FROM m)
           |SELECT g, n, mean, variance,
           |  CASE WHEN mean <> 0 THEN variance / mean END AS dispersion,
           |  CASE WHEN variance > mean THEN
           |    mean * mean / (variance - mean) END AS r,
           |  CASE WHEN variance > mean THEN mean / variance END AS p
           |FROM f ORDER BY g""".stripMargin),
    "ONE moment agg keyed by group (map-side combine, decimal-exact), a " +
      "|groups|-row pinned double finish. q288 rejects Poisson; this hands " +
      "the pipeline the (r, p) it should model demand with instead.")

  val all: Seq[Declared] =
    Seq(q373, q374, q375, q376, q377, q378, q379, q380, q381, q382,
      q383, q384, q385, q386, q387, q388, q389, q390)
}
