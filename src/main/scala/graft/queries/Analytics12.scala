package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, EventAnalytics, SpatialOps, TimeSeriesOps}

/** Round-4 batch 30: behavioral segmentation and traffic-shape
  * analytics (RFM, burstiness), SPC monitoring (XmR chart), variance
  * decomposition (η²), relational grid-density clustering
  * (DBSCAN-shaped) and the pooled retention-decay fit. Exactness
  * discipline unchanged. */
object Analytics12 {

  private def monthly(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.orders(s, dir)
      .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("t"))
      .agg(count(lit(1)).as("v"))

  private val monthlySql =
    """s AS (
      |  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
      |    AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
      |  FROM orders GROUP BY 1)""".stripMargin

  /** q261 — A1/ML: RFM segmentation of customers — recency /
    * frequency / monetary quintiles (ntile over a TOTAL order, so tie
    * placement can never float between engines) composed into a
    * 3-digit segment code, rolled up to segment counts. */
  val q261 = Declared(
    "q261_rfm", "A1,ML",
    (s, dir) => EventAnalytics.rfmSegments(Tables.orders(s, dir),
      col("o_custkey"), col("o_orderdate"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .orderBy(col("rfm_code")),
    Some("""WITH a AS (
           |  SELECT o_custkey AS c, max(CAST(o_orderdate AS DATE)) AS lastd,
           |    count(*) AS f,
           |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS m
           |  FROM orders GROUP BY 1),
           |mx AS (SELECT max(lastd) AS maxd FROM a),
           |sc AS (
           |  SELECT c,
           |    CAST(ntile(5) OVER (ORDER BY date_diff('day', lastd, maxd), c)
           |      AS BIGINT) AS rs,
           |    CAST(ntile(5) OVER (ORDER BY f, c) AS BIGINT) AS fs,
           |    CAST(ntile(5) OVER (ORDER BY m, c) AS BIGINT) AS ms
           |  FROM a CROSS JOIN mx)
           |SELECT rs * 100 + fs * 10 + ms AS rfm_code,
           |  CAST(count(*) AS BIGINT) AS n_actors
           |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin),
    "The three quintile ranks run over the ACTOR rollup (one row per " +
      "customer), never the fact table — each an exact distributed rank " +
      "(range repartition + per-partition windows + a partition-count-row " +
      "offset rollup, no single-partition window); round 8 fuses them: one " +
      "checkpointed base feeds three narrow independent passes built on " +
      "parallel threads, joined back on actor. Output is segment-sized " +
      "(≤125 rows). The segmentation every lifecycle-marketing pipeline " +
      "starts from.")

  /** q262 — A-stat: burstiness B = (σ−μ)/(σ+μ) of inter-event gaps
    * per user — periodic → −1, Poisson → 0, bursty → +1; the
    * human-vs-bot traffic fingerprint. Exact micro-gap sums; σ, μ
    * pinned IEEE finishes. */
  val q262 = Declared(
    "q262_burstiness", "A-stat",
    (s, dir) => EventAnalytics.burstiness(
      Tables.events(s, dir).filter(col("user_id") < 200),
      col("user_id"), col("ts"), minGaps = 10L)
      .orderBy(col("actor")),
    Some("""WITH e AS (SELECT user_id AS a, epoch_us(ts) AS t
           |           FROM events WHERE user_id < 200),
           |g AS (SELECT a, t - lag(t) OVER (PARTITION BY a ORDER BY t) AS g
           |      FROM e),
           |gg AS (SELECT a, g FROM g WHERE g IS NOT NULL),
           |m AS (
           |  SELECT a, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(g) AS HUGEINT) AS s,
           |    CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS q
           |  FROM gg GROUP BY a HAVING count(*) >= 10)
           |SELECT a AS actor, n AS n_gaps, CAST(s // n AS BIGINT)
           |    AS mean_gap_us,
           |  round((sqrt(CAST(n * q - s * s AS DOUBLE)) / CAST(n AS DOUBLE) -
           |         CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) /
           |        (sqrt(CAST(n * q - s * s AS DOUBLE)) / CAST(n AS DOUBLE) +
           |         CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS b
           |FROM m ORDER BY actor""".stripMargin),
    "Gaps come from the actor-keyed lag window (q25's sessionize shuffle); " +
      "the moment agg is actor-grain with map-side combine. Equal-timestamp " +
      "events are safe: any stable order of ties yields the same sorted " +
      "sequence, hence the same gap multiset.")

  /** q263 — A1: XmR individuals control chart over monthly order
    * counts — UCL/LCL = x̄ ± 2.66·M̄R, each month flagged when outside.
    * The 'noisy or broken' verdict per ingest-volume series. */
  val q263 = Declared(
    "q263_xmr_chart", "A1",
    (s, dir) => TimeSeriesOps.xmrChart(monthly(s, dir), col("t"), col("v"))
      .orderBy(col("t")),
    Some(s"""WITH $monthlySql,
            |wm AS (SELECT t, v, abs(v - lag(v) OVER (ORDER BY t)) AS mr
            |       FROM s),
            |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
            |  CAST(sum(v) AS BIGINT) AS sv,
            |  CAST(sum(mr) AS BIGINT) AS smr,
            |  CAST(count(mr) AS BIGINT) AS nmr FROM wm)
            |SELECT t, v, mr,
            |  round(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) +
            |    2.66 * (CAST(smr AS DOUBLE) / CAST(nmr AS DOUBLE)), 6)
            |    AS ucl,
            |  round(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) -
            |    2.66 * (CAST(smr AS DOUBLE) / CAST(nmr AS DOUBLE)), 6)
            |    AS lcl,
            |  CAST(v AS DOUBLE) >
            |    round(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) +
            |      2.66 * (CAST(smr AS DOUBLE) / CAST(nmr AS DOUBLE)), 6) OR
            |  CAST(v AS DOUBLE) <
            |    round(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) -
            |      2.66 * (CAST(smr AS DOUBLE) / CAST(nmr AS DOUBLE)), 6)
            |    AS out_of_control
            |FROM wm CROSS JOIN st ORDER BY t""".stripMargin),
    "The lag window and both means run over the month rollup — the fact " +
      "table is read once to build it. The SPC chart a pipeline-health " +
      "dashboard renders per series.")

  /** q264 — A-stat: η² variance decomposition — how much of line
    * quantity's variance the return flag explains (the effect-size
    * companion to q187's F). Micro-quantized group terms over exact
    * decimal sums. */
  val q264 = Declared(
    "q264_eta_squared", "A-stat",
    (s, dir) => Aggregates.etaSquared(Tables.lineitem(s, dir),
      col("l_quantity"), col("l_returnflag")),
    Some("""WITH g AS (
           |  SELECT l_returnflag AS gr, CAST(count(*) AS BIGINT) AS ng,
           |    CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sg,
           |    CAST(sum(CAST(l_quantity AS HUGEINT) *
           |      CAST(l_quantity AS BIGINT)) AS HUGEINT) AS qg
           |  FROM lineitem GROUP BY 1),
           |t AS (
           |  SELECT ng, sg, qg,
           |    CAST(round(CAST(sg * sg AS DOUBLE) / CAST(ng AS DOUBLE)
           |      * 1e6, 0) AS BIGINT) AS tu
           |  FROM g),
           |a AS (
           |  SELECT CAST(sum(ng) AS HUGEINT) AS n, count(*) AS k,
           |    CAST(sum(sg) AS HUGEINT) AS s, CAST(sum(qg) AS HUGEINT) AS q,
           |    CAST(sum(tu) AS BIGINT) AS tb
           |  FROM t)
           |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups,
           |  round((CAST(tb AS DOUBLE) / 1e6 -
           |         CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)) /
           |        (CAST(q AS DOUBLE) -
           |         CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS eta_sq
           |FROM a""".stripMargin),
    "One group-grain agg with map-side combine — identical plan shape to " +
      "q187's ANOVA F; together they answer 'significant?' and 'material?'.")

  /** q265 — J2/E2+: grid-density clustering of the synthetic feature
    * field (DBSCAN-shaped, fully relational): 5×5 cells, dense at
    * ≥ 2 points, 4-adjacent dense cells merge via distributed
    * connected components; the oracle closes the same graph with a
    * recursive CTE. */
  val q265 = Declared(
    "q265_grid_density", "J2,E2+",
    (s, dir) => SpatialOps.gridDensityClusters(
      Tables.part(s, dir).select(
        expr("CAST((p_partkey * 29) % 100 AS DOUBLE)").as("x"),
        expr("CAST((p_partkey * 53) % 100 AS DOUBLE)").as("y")),
      col("x"), col("y"), cellSize = 5.0, minPts = 2L)
      .orderBy(col("cluster_id")),
    Some("""WITH RECURSIVE f AS (
           |  SELECT CAST((p_partkey * 29) % 100 AS DOUBLE) AS x,
           |         CAST((p_partkey * 53) % 100 AS DOUBLE) AS y FROM part),
           |cells AS (
           |  SELECT CAST(floor(x / 5) AS BIGINT) AS cx,
           |    CAST(floor(y / 5) AS BIGINT) AS cy, count(*) AS np
           |  FROM f GROUP BY 1, 2 HAVING count(*) >= 2),
           |c AS (SELECT cx, cy, cx * 100000 + cy AS cell, np FROM cells),
           |e AS (
           |  SELECT a.cell AS src, b.cell AS dst FROM c a JOIN c b
           |  ON (b.cx = a.cx + 1 AND b.cy = a.cy) OR
           |     (b.cx = a.cx AND b.cy = a.cy + 1)),
           |sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
           |reach(a, b) AS (
           |  SELECT cell, cell FROM c
           |  UNION
           |  SELECT r.a, s.dst FROM reach r JOIN sym s ON s.src = r.b),
           |lab AS (SELECT a AS cell, min(b) AS comp FROM reach GROUP BY a)
           |SELECT comp AS cluster_id, CAST(count(*) AS BIGINT) AS n_cells,
           |  CAST(sum(np) AS BIGINT) AS n_points
           |FROM c JOIN lab USING (cell) GROUP BY 1
           |ORDER BY 1""".stripMargin),
    "Cells, not points, flow past the density agg (map-side combine); " +
      "adjacency is a dense-cell self equi-join; components run the q70 " +
      "pointer-doubling kernel in O(log n) rounds. The large-scale DBSCAN " +
      "reduction every geo pipeline actually ships.")

  /** q266 — A1: pooled retention-decay fit — day-k retention rates
    * from the q94 cohort kernel, ln(rate) ~ a + b·k by exact-moment
    * OLS over micro-quantized logs, reported with the −ln2/b
    * half-life. */
  val q266 = Declared(
    "q266_retention_fit", "A1",
    (s, dir) => EventAnalytics.retentionDecayFit(
      Tables.events(s, dir), "user_id", "ts", maxDays = 14),
    Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cd
           |           FROM events GROUP BY 1),
           |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
           |        FROM events),
           |kk AS (
           |  SELECT date_diff('day', cd, d) AS k
           |  FROM act JOIN f USING (user_id)
           |  WHERE date_diff('day', cd, d) BETWEEN 0 AND 14),
           |pooled AS (SELECT k, CAST(count(*) AS BIGINT) AS u
           |           FROM kk GROUP BY k),
           |n0 AS (SELECT u AS n0 FROM pooled WHERE k = 0),
           |pts AS (
           |  SELECT CAST(k AS BIGINT) AS x,
           |    CAST(round(ln(CAST(u AS DOUBLE) / CAST(n0 AS DOUBLE)) * 1e6,
           |      0) AS BIGINT) AS y
           |  FROM pooled CROSS JOIN n0 WHERE k >= 1),
           |a AS (
           |  SELECT CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
           |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
           |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
           |  FROM pts)
           |SELECT CAST(n AS BIGINT) AS n_days,
           |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
           |        CAST(n * sxx - sx * sx AS DOUBLE) / 1e6, 6) AS slope,
           |  round((CAST(sy AS DOUBLE) -
           |         CAST(n * sxy - sx * sy AS DOUBLE) /
           |         CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
           |        CAST(n AS DOUBLE) / 1e6, 6) AS intercept,
           |  round(-ln(2.0) / (CAST(n * sxy - sx * sy AS DOUBLE) /
           |        CAST(n * sxx - sx * sx AS DOUBLE) / 1e6), 6)
           |    AS half_life_days
           |FROM a""".stripMargin),
    "Cohort pooling is a k-grain rollup of the q94 retention agg; the OLS " +
      "runs over ≤ maxDays rows. The one-number retention summary tracked " +
      "release over release.")

  val all: Seq[Declared] = Seq(q261, q262, q263, q264, q265, q266)
}
