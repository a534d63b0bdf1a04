package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Batch 93 — local spatial association: LISA (local Moran) and
  * join-count statistics — the WHERE/which-quadrant and the
  * binary-map autocorrelation companions to q373/q374.
  */
object Analytics33 {

  private def sensorCents(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.supplier(s, dir).select(
      expr("CAST((s_suppkey * 37) % 100 AS DOUBLE)").as("x"),
      expr("CAST((s_suppkey * 73) % 100 AS DOUBLE)").as("y"),
      expr("CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"),
      col("s_acctbal"))

  private val sensorsCentsSql =
    """sens AS (
      |  SELECT CAST((s_suppkey * 37) % 100 AS DOUBLE) AS x,
      |    CAST((s_suppkey * 73) % 100 AS DOUBLE) AS y,
      |    CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
      |    s_acctbal
      |  FROM supplier)""".stripMargin

  private val offsSql =
    """offs AS (
      |  SELECT dx.range AS dx, dy.range AS dy
      |  FROM range(-1, 2) dx, range(-1, 2) dy
      |  WHERE dx.range <> 0 OR dy.range <> 0)""".stripMargin

  /** q429 — A3+: LISA local Moran's I with cluster-quadrant labels on
    * the sensor-cents lattice — WHERE the field clusters (HH/LL) and
    * where it breaks (HL/LH); exact N-scaled integer deviations. */
  val q429 = Declared(
    "q429_local_moran", "A3,A-stat",
    (s, dir) => graft.ops.SpatialStats.localMoran(
      sensorCents(s, dir), col("x"), col("y"), col("v"), cellSize = 4.0),
    Some(s"""WITH $sensorsCentsSql,
           |cells AS (
           |  SELECT CAST(floor(x / 4.0) AS BIGINT) AS cx,
           |    CAST(floor(y / 4.0) AS BIGINT) AS cy,
           |    CAST(sum(v) AS BIGINT) AS xsum
           |  FROM sens GROUP BY 1, 2),
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
           |               CAST(sum(xsum) AS BIGINT) AS s_tot FROM cells),
           |dev AS (
           |  SELECT cx, cy, n_cells,
           |    n_cells * xsum - s_tot AS d
           |  FROM cells, tot),
           |den AS (SELECT sum(CAST(d AS HUGEINT) * d) AS den FROM dev),
           |$offsSql,
           |lag AS (
           |  SELECT a.cx, a.cy,
           |    CAST(sum(b.d) AS BIGINT) AS lag_scaled
           |  FROM dev a JOIN offs o ON true
           |  JOIN dev b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
           |  GROUP BY 1, 2)
           |SELECT dev.cx, dev.cy, d AS d_scaled, lag_scaled,
           |  CASE WHEN den <> 0 THEN
           |    CAST(CAST(n_cells AS HUGEINT) * d * lag_scaled AS DOUBLE)
           |      / CAST(den AS DOUBLE) END AS local_i,
           |  CASE WHEN d >= 0 AND lag_scaled >= 0 THEN 'HH'
           |    WHEN d < 0 AND lag_scaled < 0 THEN 'LL'
           |    WHEN d >= 0 THEN 'HL' ELSE 'LH' END AS quadrant
           |FROM dev JOIN lag ON dev.cx = lag.cx AND dev.cy = lag.cy,
           |  den
           |ORDER BY dev.cx, dev.cy""".stripMargin),
    "The q373 envelope per cell: one rollup, one queen equi-join on " +
      "generated neighbor keys, broadcast moments — the cluster MAP " +
      "(which cells, which quadrant) that the global I only summarizes. " +
      "Integer numerators: quadrant labels can never flip.")

  /** q430 — A3+: join-count statistics of the positive-balance
    * presence map — do black (positive) cells clump beyond the
    * free-sampling expectation? Exact integer BB/WW/BW counts. */
  val q430 = Declared(
    "q430_join_counts", "A3,A-stat",
    (s, dir) => graft.ops.SpatialStats.joinCounts(
      sensorCents(s, dir), col("x"), col("y"),
      col("s_acctbal") > 0, cellSize = 4.0),
    Some(s"""WITH $sensorsCentsSql,
           |cells AS (
           |  SELECT CAST(floor(x / 4.0) AS BIGINT) AS cx,
           |    CAST(floor(y / 4.0) AS BIGINT) AS cy,
           |    CASE WHEN sum(CASE WHEN s_acctbal > 0 THEN 1 ELSE 0 END) > 0
           |      THEN 1 ELSE 0 END AS b
           |  FROM sens GROUP BY 1, 2),
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
           |               CAST(sum(b) AS BIGINT) AS n_black FROM cells),
           |$offsSql,
           |pr AS (
           |  SELECT CAST(count(*) AS BIGINT) AS w_pairs,
           |    CAST(sum(a.b * c.b) AS BIGINT) AS bb,
           |    CAST(sum((1 - a.b) * (1 - c.b)) AS BIGINT) AS ww
           |  FROM cells a JOIN offs o ON true
           |  JOIN cells c ON c.cx = a.cx + o.dx AND c.cy = a.cy + o.dy)
           |SELECT n_cells, n_black, w_pairs, bb, ww,
           |  w_pairs - bb - ww AS bw,
           |  CAST(CAST(w_pairs AS HUGEINT) * n_black * (n_black - 1)
           |    AS BIGINT) AS bb_expected_num,
           |  CAST(CAST(n_cells AS HUGEINT) * (n_cells - 1) * bb
           |    - CAST(w_pairs AS HUGEINT) * n_black * (n_black - 1)
           |    AS BIGINT) AS bb_excess_num
           |FROM pr, tot""".stripMargin),
    "Binary field, same shuffle shape as Moran: rollup + queen equi-join " +
      "+ one global agg. The presence/absence autocorrelation test " +
      "(outage maps, coverage holes) with an exact integer excess — no " +
      "permutation machinery needed to see the sign.")

  /** q431 — A-stat/A8: Kaplan–Meier retention curve with Greenwood
    * 95% bands on the q272 churn cohort — the error bars every
    * published survival curve carries; exact pico-unit Greenwood
    * accumulation. */
  val q431 = Declared(
    "q431_km_greenwood", "A-stat,A8",
    (s, dir) => {
      val per = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("fd"), max(to_date(col("ts"))).as("ld"))
      val subj = per
        .crossJoin(broadcast(per.agg(max(col("ld")).as("obs_end"))))
        .select(datediff(col("ld"), col("fd")).as("dur"),
          (col("ld") < date_sub(col("obs_end"), 5)).cast("int").as("churned"))
      graft.ops.EventAnalytics.kaplanMeierGreenwood(subj, col("dur"),
        col("churned")).orderBy(col("t"))
    },
    Some("""WITH RECURSIVE per AS (
           |  SELECT user_id, min(CAST(ts AS DATE)) AS fd,
           |    max(CAST(ts AS DATE)) AS ld
           |  FROM events GROUP BY 1),
           |oe AS (SELECT max(ld) AS obs_end FROM per),
           |subj AS (
           |  SELECT ld - fd AS dur,
           |    CASE WHEN ld < obs_end - 5 THEN 1 ELSE 0 END AS ev
           |  FROM per CROSS JOIN oe),
           |r0 AS (SELECT dur AS t, CAST(sum(ev) AS BIGINT) AS d,
           |         count(*) AS alln
           |       FROM subj GROUP BY 1),
           |w AS MATERIALIZED (
           |  SELECT t, d,
           |    CAST(sum(alln) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk,
           |    row_number() OVER (ORDER BY t) AS rn
           |  FROM r0),
           |km(rn, t, n_risk, d, s) AS (
           |  SELECT rn, t, n_risk, d,
           |    (1000000 * (n_risk - d)) // n_risk
           |  FROM w WHERE rn = 1
           |  UNION ALL
           |  SELECT w.rn, w.t, w.n_risk, w.d,
           |    (km.s * (w.n_risk - w.d)) // w.n_risk
           |  FROM w JOIN km ON w.rn = km.rn + 1),
           |g AS (
           |  SELECT *, CASE WHEN n_risk - d > 0 THEN
           |      CAST((CAST(d AS HUGEINT) * 1000000000000)
           |        // (CAST(n_risk AS HUGEINT) * (n_risk - d)) AS BIGINT)
           |    ELSE 0 END AS term
           |  FROM km),
           |g2 AS (SELECT *, CAST(sum(term) OVER (ORDER BY t) AS BIGINT)
           |         AS greenwood_pico FROM g),
           |g3 AS (SELECT *, CAST(floor(CAST(s AS DOUBLE)
           |    * sqrt(CAST(greenwood_pico AS DOUBLE) / 1e12) + 0.5)
           |    AS BIGINT) AS se FROM g2)
           |SELECT t, n_risk, d AS d_events, s AS surv_ppm,
           |  greenwood_pico, se AS se_ppm,
           |  greatest(0, s - (196 * se) // 100) AS lo_ppm,
           |  least(1000000, s + (196 * se) // 100) AS hi_ppm
           |FROM g3 ORDER BY t""".stripMargin),
    "The q163 envelope plus one rollup-sized prefix sum — error bars at " +
      "zero extra fact-table cost. Exact pico accumulation and a single " +
      "correctly-rounded sqrt per step keep the bands bit-portable; the " +
      "curve without them invites overreading every wiggle.")

  /** q432 — E2+: targeted-attack tolerance of the part-succession
    * graph (partkeys ≤ 400 — the audit slice): largest-component
    * share after removing the top 0/5/20 hubs; the oracle replays
    * hub ranking AND all three transitive closures recursively. */
  val q432 = Declared(
    "q432_attack_tolerance", "E2+",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"))
      val edges = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey").as("src"),
          lead(col("l_partkey"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull && col("dst") =!= col("src") &&
          col("src") <= 400 && col("dst") <= 400)
      graft.ext.Graph.attackTolerance(edges, "src", "dst", Seq(0, 5, 20))
    },
    Some("""WITH RECURSIVE nx AS (
           |  SELECT l_partkey AS src,
           |    lead(l_partkey) OVER (PARTITION BY l_orderkey
           |      ORDER BY l_linenumber, l_partkey) AS dst
           |  FROM lineitem),
           |e0 AS (
           |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           |  FROM nx WHERE dst IS NOT NULL AND dst <> src
           |    AND src <= 400 AND dst <= 400),
           |deg AS (
           |  SELECT node, count(*) AS deg
           |  FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
           |  GROUP BY 1),
           |hubs AS (
           |  SELECT node, row_number() OVER (ORDER BY deg DESC, node)
           |    AS hr
           |  FROM deg),
           |ks(k) AS (VALUES (0), (5), (20)),
           |surv AS MATERIALIZED (
           |  SELECT k, a, b FROM ks, e0
           |  WHERE a NOT IN (SELECT node FROM hubs WHERE hr <= k)
           |    AND b NOT IN (SELECT node FROM hubs WHERE hr <= k)),
           |eb AS MATERIALIZED (
           |  SELECT k, a, b FROM surv
           |  UNION ALL SELECT k, b, a FROM surv),
           |reach AS (
           |  SELECT k, a AS node, a AS comp FROM eb
           |  UNION
           |  SELECT eb.k, eb.a, reach.comp
           |  FROM eb JOIN reach ON reach.node = eb.b AND reach.k = eb.k),
           |comp AS (SELECT k, node, min(comp) AS c FROM reach
           |         GROUP BY 1, 2),
           |sizes AS (SELECT k, c, CAST(count(*) AS BIGINT) AS sz
           |          FROM comp GROUP BY 1, 2),
           |agg AS (
           |  SELECT k, CAST(sum(sz) AS BIGINT) AS n_nodes,
           |    CAST(max(sz) AS BIGINT) AS largest
           |  FROM sizes GROUP BY k),
           |ec AS (SELECT k, CAST(count(*) AS BIGINT) AS n_edges
           |       FROM surv GROUP BY k)
           |SELECT CAST(ks.k AS BIGINT) AS k_removed,
           |  coalesce(n_nodes, 0) AS n_nodes_left,
           |  coalesce(n_edges, 0) AS n_edges_left,
           |  coalesce(largest, 0) AS largest_cc,
           |  CASE WHEN coalesce(n_nodes, 0) > 0
           |    THEN (largest * 1000000) // n_nodes ELSE 0 END AS share_ppm
           |FROM ks LEFT JOIN agg ON agg.k = ks.k
           |LEFT JOIN ec ON ec.k = ks.k
           |ORDER BY k_removed""".stripMargin),
    "Each scenario is a filtered min-label CC run — O(log diameter) " +
      "node-keyed rounds, one change-count scalar per round. The " +
      "fragility readout that tells a sourcing/crawl planner whether the " +
      "network survives its hubs failing TOGETHER — the question q419's " +
      "rich-club coefficient raises and this answers.")

  /** q433 — A-stat: Deming regression of header total on line-item
    * sum per priority — the errors-in-both-variables line that
    * completes the method-comparison panel (CCC q412, Bland–Altman
    * q307): OLS would bias the slope toward zero here. */
  val q433 = Declared(
    "q433_deming_regression", "A-stat",
    (s, dir) => {
      val lineSum = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(expr(
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("line_cents"))
      val paired = Tables.orders(s, dir)
        .join(lineSum, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority").as("pri"), col("line_cents"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("hdr_cents"))
      graft.ops.Aggregates.demingRegression(paired, col("line_cents"),
        col("hdr_cents"), col("pri"))
    },
    Some("""WITH ls AS (
           |  SELECT l_orderkey,
           |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS x
           |  FROM lineitem GROUP BY 1),
           |p AS (
           |  SELECT o_orderpriority AS g, x,
           |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS y
           |  FROM orders JOIN ls ON o_orderkey = l_orderkey),
           |m AS (
           |  SELECT g, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
           |    sum(CAST(x AS HUGEINT) * x) AS sxx,
           |    sum(CAST(y AS HUGEINT) * y) AS syy,
           |    sum(CAST(x AS HUGEINT) * y) AS sxy
           |  FROM p GROUP BY g HAVING count(*) >= 2),
           |f AS (
           |  SELECT g, n, sx, sy,
           |    CAST(n * sxx - sx * sx AS DOUBLE) AS vx,
           |    CAST(n * syy - sy * sy AS DOUBLE) AS vy,
           |    CAST(n * sxy - sx * sy AS DOUBLE) AS cxy
           |  FROM m)
           |SELECT g, n,
           |  CASE WHEN cxy <> 0 THEN round(
           |    (vy - vx + sqrt((vy - vx) * (vy - vx) + cxy * cxy * 4.0))
           |      / (cxy * 2.0), 6) END AS slope,
           |  CASE WHEN cxy <> 0 THEN round(
           |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) -
           |    ((vy - vx + sqrt((vy - vx) * (vy - vx) + cxy * cxy * 4.0))
           |      / (cxy * 2.0))
           |      * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) END
           |    AS intercept
           |FROM f ORDER BY g""".stripMargin),
    "One order-grain rollup + one priority-keyed moment agg; the closed " +
      "form needs no iteration at all. Slope ≈ 1, intercept ≈ 0 is the " +
      "reconciliation PASS; OLS on the same pairs would report a " +
      "noise-attenuated slope and start a false alarm.")

  /** q434 — A3+: Clark–Evans nearest-neighbor index of the supplier
    * sensor lattice — clustered (R<1), random (≈1) or dispersed
    * (→2.15)? Grid-probe NN with exact micro distances. */
  val q434 = Declared(
    "q434_clark_evans", "A3,A-stat",
    (s, dir) => graft.ops.SpatialStats.clarkEvans(
      Tables.supplier(s, dir).select(
        expr("CAST((s_suppkey * 37) % 100 AS BIGINT)").as("x"),
        expr("CAST((s_suppkey * 73) % 100 AS BIGINT)").as("y")),
      col("x"), col("y"), pruneRadius = 10.0, area = 10000.0),
    Some("""WITH sites AS (
           |  SELECT px, py, CAST(count(*) AS BIGINT) AS m
           |  FROM (SELECT CAST((s_suppkey * 37) % 100 AS BIGINT) AS px,
           |          CAST((s_suppkey * 73) % 100 AS BIGINT) AS py
           |        FROM supplier)
           |  GROUP BY 1, 2),
           |singles AS (SELECT px, py FROM sites WHERE m = 1),
           |nn AS (
           |  SELECT s.px, s.py,
           |    min((s.px - t.px) * (s.px - t.px)
           |      + (s.py - t.py) * (s.py - t.py)) AS d2
           |  FROM singles s JOIN sites t
           |    ON NOT (s.px = t.px AND s.py = t.py)
           |  GROUP BY 1, 2),
           |sm AS (
           |  SELECT CAST(sum(CAST(floor(sqrt(CAST(d2 AS DOUBLE)) * 1e6
           |    + 0.5) AS BIGINT)) AS BIGINT) AS smic
           |  FROM nn),
           |tot AS (SELECT CAST(sum(m) AS BIGINT) AS n_points FROM sites)
           |SELECT n_points, coalesce(smic, 0) AS sum_nn_micro,
           |  round(CAST(coalesce(smic, 0) AS DOUBLE) / 1e6
           |    / CAST(n_points AS DOUBLE), 6) AS mean_nn,
           |  round((CAST(coalesce(smic, 0) AS DOUBLE) / 1e6
           |      / CAST(n_points AS DOUBLE))
           |    / (0.5 * sqrt(10000.0 / CAST(n_points AS DOUBLE))), 6)
           |    AS r_ce,
           |  round(((CAST(coalesce(smic, 0) AS DOUBLE) / 1e6
           |      / CAST(n_points AS DOUBLE))
           |    - 0.5 * sqrt(10000.0 / CAST(n_points AS DOUBLE)))
           |    / (0.26136 * sqrt(10000.0)
           |      / CAST(n_points AS DOUBLE)), 6) AS z_ce
           |FROM sm, tot""".stripMargin),
    "Site rollup + 3×3 grid-cell candidate equi-join; only radius misses " +
      "hit the site-bounded brute fallback. The one-number dispersion " +
      "verdict (with its CSR z) that decides whether q380's Ripley " +
      "machinery is even needed.")

  /** q435 — A5/A8: realized-volatility panel (Parkinson + Garman-
    * Klass range estimators) and Amihud illiquidity over daily OHLC
    * bars of purchase values — the risk/liquidity readout for any
    * metric stream, micro-nat exact. */
  val q435 = Declared(
    "q435_volatility_panel", "A5,A8",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("ts"), col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("value"))
      val bars = graft.ops.TimeSeriesOps.ohlcBars(ev, "ts", "event_id",
        "value", 86400000000L)
      val vol = ev.groupBy(expr("unix_micros(ts) div 86400000000L")
          .as("bin"))
        .agg(sum(col("value")).as("vol_cents"))
      graft.ops.TimeSeriesOps.volatilityMetrics(
        bars.join(vol, "bin"), col("bin"), col("open"), col("high"),
        col("low"), col("close"), col("vol_cents"))
    },
    Some("""WITH ev AS (
           |  SELECT ts, event_id,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
           |  FROM events WHERE event_type = 'purchase'),
           |b AS (
           |  SELECT epoch_us(ts) // 86400000000 AS bin, v,
           |    row_number() OVER (PARTITION BY epoch_us(ts) // 86400000000
           |      ORDER BY ts, event_id) AS ra,
           |    row_number() OVER (PARTITION BY epoch_us(ts) // 86400000000
           |      ORDER BY ts DESC, event_id DESC) AS rd
           |  FROM ev),
           |bars AS (
           |  SELECT bin, max(CASE WHEN ra = 1 THEN v END) AS o,
           |    max(v) AS h, min(v) AS lo,
           |    max(CASE WHEN rd = 1 THEN v END) AS c,
           |    CAST(sum(v) AS BIGINT) AS vol
           |  FROM b GROUP BY bin),
           |st AS (
           |  SELECT *,
           |    CAST(floor(ln(CAST(h AS DOUBLE) / CAST(lo AS DOUBLE))
           |      * 1e6 + 0.5) AS BIGINT) AS lhl,
           |    CAST(floor(ln(CAST(c AS DOUBLE) / CAST(o AS DOUBLE))
           |      * 1e6 + 0.5) AS BIGINT) AS lco,
           |    lag(c) OVER (ORDER BY bin) AS pc
           |  FROM bars
           |  WHERE o > 0 AND h > 0 AND lo > 0 AND c > 0 AND vol > 0),
           |s2 AS (
           |  SELECT *, CASE WHEN pc IS NOT NULL THEN
           |      abs(CAST(floor(ln(CAST(c AS DOUBLE) / CAST(pc AS DOUBLE))
           |        * 1e6 + 0.5) AS BIGINT)) END AS lret
           |  FROM st),
           |a AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_bars,
           |    sum(CAST(lhl AS HUGEINT) * lhl) AS sp,
           |    sum(CAST(lhl AS HUGEINT) * lhl * 500000
           |      - CAST(lco AS HUGEINT) * lco * 386294) AS sgk,
           |    CAST(sum((lret * 1000) // vol) AS BIGINT) AS sa,
           |    CAST(sum(CASE WHEN lret IS NOT NULL THEN 1 ELSE 0 END)
           |      AS BIGINT) AS na
           |  FROM s2)
           |SELECT n_bars,
           |  round(sqrt(CAST(sp AS DOUBLE) / 1e12
           |    / (2.772588722239781 * CAST(n_bars AS DOUBLE))), 6)
           |    AS parkinson_vol,
           |  round(sqrt(CAST(greatest(sgk, 0) AS DOUBLE) / 1e18
           |    / CAST(n_bars AS DOUBLE)), 6) AS gk_vol,
           |  CASE WHEN na > 0 THEN sa // na END AS amihud_npc
           |FROM a""".stripMargin),
    "One shuffle keyed on the day bin builds the bars; the estimator " +
      "panel is a lag window + one agg over the CALENDAR-sized bar " +
      "rollup. Range estimators wring ~5-7x more efficiency from the " +
      "same bars than close-to-close variance — the monitoring readout " +
      "that notices a metric getting wilder before the mean moves.")

  /** q436 — eval/recsys: list-health metrics of a top-3 repurchase
    * list per customer — catalog coverage, novelty and exposure Gini,
    * the popularity-bias dashboard beside MAP/NDCG/ERR accuracy. */
  val q436 = Declared(
    "q436_rec_list_metrics", "eval",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hist = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("u"), col("l_partkey").as("item"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      val recs = hist.withColumn("__r", row_number().over(
          Window.partitionBy(col("u"))
            .orderBy(col("q").desc, col("item"))))
        .filter(col("__r") <= 3).select(col("u"), col("item"))
      val catalog = Tables.part(s, dir).count()
      graft.ops.Evaluation.recListMetrics(recs, col("u"), col("item"),
        Tables.lineitem(s, dir), col("l_partkey"), catalog)
    },
    Some("""WITH hist AS (
           |  SELECT o_custkey AS u, l_partkey AS item,
           |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  GROUP BY 1, 2),
           |recs AS (
           |  SELECT u, item FROM (
           |    SELECT *, row_number() OVER (PARTITION BY u
           |      ORDER BY q DESC, item) AS r
           |    FROM hist)
           |  WHERE r <= 3),
           |pop AS (SELECT l_partkey AS item, CAST(count(*) AS BIGINT)
           |          AS pop
           |        FROM lineitem GROUP BY 1),
           |pt AS (SELECT CAST(sum(pop) AS BIGINT) AS pt FROM pop),
           |expo AS (SELECT item, CAST(count(*) AS BIGINT) AS rc
           |         FROM recs GROUP BY 1),
           |cat0 AS (SELECT CAST(count(*) AS BIGINT) AS cn FROM part),
           |nov AS (
           |  SELECT CAST(sum(CAST(rc AS HUGEINT)
           |      * CAST(floor(ln((CAST(pt AS DOUBLE) + cn)
           |        / (CAST(coalesce(pop, 0) AS DOUBLE) + 1))
           |        * 1e6 + 0.5) AS BIGINT)) AS HUGEINT) AS nsum,
           |    CAST(sum(rc) AS BIGINT) AS nr
           |  FROM expo LEFT JOIN pop USING (item), pt, cat0),
           |rk AS (
           |  SELECT *, row_number() OVER (ORDER BY rc, item) AS i
           |  FROM expo),
           |gini AS (
           |  SELECT CAST(count(*) AS BIGINT) AS ni,
           |    CAST(sum(rc) AS BIGINT) AS sc,
           |    CAST(sum((CAST(i AS HUGEINT) * 2 - 1) * rc) AS HUGEINT)
           |      AS gnum
           |  FROM rk),
           |cat AS (SELECT CAST(count(*) AS BIGINT) AS cn FROM part),
           |us AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_users,
           |         CAST(count(*) AS BIGINT) AS n_recs
           |       FROM recs)
           |SELECT n_users, n_recs, ni AS distinct_items,
           |  (ni * 1000000) // cn AS coverage_ppm,
           |  CAST(nsum // nr AS BIGINT) AS avg_novelty_micro,
           |  round(CAST(gnum - CAST(ni AS HUGEINT) * sc AS DOUBLE)
           |    / CAST(CAST(ni AS HUGEINT) * sc AS DOUBLE), 6)
           |    AS exposure_gini
           |FROM us, nov, gini, cat""".stripMargin),
    "Rec lists are k-per-user; all three metrics run on the ITEM rollup " +
      "of the list — one agg + one bounded rank window, popularity " +
      "broadcast. High exposure Gini means the list engine always shows " +
      "the same few items — the feedback-loop failure accuracy metrics " +
      "are blind to.")

  /** q437 — ops/SRE: multi-window multi-burn-rate SLO alerting
    * (Google SRE Workbook ch. 5) — page only when the 1-hour AND the
    * trailing-6-hour error-budget burn both exceed 1× on a 21% error
    * budget; single-window alerting either pages on blips or sleeps
    * through slow burns. */
  val q437 = Declared(
    "q437_burn_rate_alerts", "A5,ops",
    (s, dir) => graft.ops.EventAnalytics.burnRateAlerts(
      Tables.events(s, dir), col("ts"), col("event_type") === "error",
      slowHours = 6, sloBudgetPpm = 210000L,
      fastFactorPpm = 1000000L, slowFactorPpm = 1000000L),
    Some("""WITH h AS (
           |  SELECT epoch_us(ts) // 3600000000 AS hour,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS errors
           |  FROM events GROUP BY 1),
           |w AS (
           |  SELECT *, CAST(sum(n) OVER (ORDER BY hour RANGE BETWEEN 5
           |      PRECEDING AND CURRENT ROW) AS BIGINT) AS ns,
           |    CAST(sum(errors) OVER (ORDER BY hour RANGE BETWEEN 5
           |      PRECEDING AND CURRENT ROW) AS BIGINT) AS es
           |  FROM h)
           |SELECT hour, n, errors,
           |  (errors * 1000000) // n AS rate_ppm,
           |  (((errors * 1000000) // n) * 1000000) // 210000
           |    AS burn_fast_ppm,
           |  (es * 1000000) // ns AS rate_slow_ppm,
           |  (((es * 1000000) // ns) * 1000000) // 210000
           |    AS burn_slow_ppm,
           |  ((((errors * 1000000) // n) * 1000000) // 210000 >= 1000000
           |   AND (((es * 1000000) // ns) * 1000000) // 210000 >= 1000000)
           |    AS alert
           |FROM w ORDER BY hour""".stripMargin),
    "ONE hour-grain rollup with map-side combine; the slow window is a " +
      "range frame over the calendar-bounded rollup. The two-window AND " +
      "is what makes the page precise AND fast — the alerting-policy " +
      "arithmetic, bit-exact, straight off the event stream.")

  /** q438 — ops/queueing: Erlang-C staffing table per hour-of-day —
    * the minimum agents keeping the M/M/c delay probability under 20%
    * at 20 jobs/agent/hour; both engines walk the identical Erlang
    * term fold, so the staffing numbers are bit-stable. */
  val q438 = Declared(
    "q438_erlang_staffing", "A5,ops",
    (s, dir) => graft.ops.EventAnalytics.erlangStaffing(
      Tables.events(s, dir), col("ts"), jobsPerAgentHour = 20L,
      maxAgents = 40, targetWaitPpm = 200000L),
    Some("""WITH slot AS (
           |  SELECT (epoch_us(ts) // 3600000000) % 24 AS hod,
           |    epoch_us(ts) // 86400000000 AS d
           |  FROM events),
           |days AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n_days
           |         FROM slot),
           |agg AS (
           |  SELECT hod AS hour_of_day,
           |    CAST(count(*) AS BIGINT) AS arrivals, n_days,
           |    CAST(count(*) AS DOUBLE) / (20.0 * CAST(n_days AS DOUBLE))
           |      AS a
           |  FROM slot, days GROUP BY 1, 3),
           |f AS (
           |  SELECT *, list_reduce(
           |    list_prepend([1.0, 0.0, 0.0, -1.0],
           |      list_transform(range(1, 41),
           |        k -> [CAST(k AS DOUBLE), 0.0, 0.0, 0.0])),
           |    (acc, x) -> [
           |      acc[1] * a / x[1],
           |      acc[2] + acc[1],
           |      CASE WHEN acc[3] = 0.0 AND x[1] > a
           |        AND (acc[1] * a / x[1]) / ((acc[1] * a / x[1])
           |          + (1.0 - a / x[1]) * (acc[2] + acc[1])) <= 0.2
           |        THEN x[1] ELSE acc[3] END,
           |      CASE WHEN acc[3] = 0.0 AND x[1] > a
           |        AND (acc[1] * a / x[1]) / ((acc[1] * a / x[1])
           |          + (1.0 - a / x[1]) * (acc[2] + acc[1])) <= 0.2
           |        THEN (acc[1] * a / x[1]) / ((acc[1] * a / x[1])
           |          + (1.0 - a / x[1]) * (acc[2] + acc[1]))
           |        ELSE acc[4] END]) AS st
           |  FROM agg)
           |SELECT hour_of_day, arrivals, n_days, round(a, 6) AS intensity,
           |  CAST(st[3] AS BIGINT) AS agents,
           |  CASE WHEN st[3] > 0 THEN round(st[4], 6) END AS wait_prob
           |FROM f ORDER BY hour_of_day""".stripMargin),
    "ONE hour-of-day rollup off the stream; the Erlang fold walks a " +
      "40-step literal lattice per slot — 24 rows of work at any event " +
      "volume. The capacity-planning arithmetic (how many agents/replicas " +
      "per hour) computed where the arrival data lives.")

  /** q439 — A1/E4: Benford MAD conformity verdict over extended
    * prices (Nigrini 2012 bands) — the audit ACCEPTANCE readout q158's
    * raw profile needs; χ² over-rejects at scale, MAD does not. */
  val q439 = Declared(
    "q439_benford_conformity", "A1,E4",
    (s, dir) => graft.ops.Aggregates.benfordConformity(
      Tables.lineitem(s, dir),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")),
    Some {
      val values = graft.ops.Aggregates.BenfordPpm
        .map { case (d, p) => s"($d, $p)" }.mkString(", ")
      s"""WITH v AS (
         |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT) AS v
         |  FROM lineitem
         |  WHERE CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT) > 0),
         |o AS (
         |  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM v GROUP BY 1),
         |e(digit, exp_ppm) AS (VALUES $values),
         |j AS (
         |  SELECT e.digit, coalesce(o.n, 0) AS n, e.exp_ppm
         |  FROM e LEFT JOIN o ON e.digit = o.digit),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM j),
         |d AS (
         |  SELECT n, abs((n * 1000000) // tot - exp_ppm) AS dev
         |  FROM j, t)
         |SELECT CAST(sum(n) AS BIGINT) AS n,
         |  CAST(sum(dev) // 9 AS BIGINT) AS mad_ppm,
         |  CASE WHEN sum(dev) // 9 < 6000 THEN 'close'
         |    WHEN sum(dev) // 9 < 12000 THEN 'acceptable'
         |    WHEN sum(dev) // 9 < 15000 THEN 'marginal'
         |    ELSE 'nonconforming' END AS verdict
         |FROM d""".stripMargin
    },
    "The q158 digit rollup (one scan to 9 rows) plus a 9-row agg — the " +
      "verdict auditors act on, with thresholds that do not sharpen as n " +
      "grows. Exact integer ppm: the same ledger gets the same verdict on " +
      "any engine, any partitioning, any day.")

  val all: Seq[Declared] =
    Seq(q429, q430, q431, q432, q433, q434, q435, q436, q437, q438, q439)
}
