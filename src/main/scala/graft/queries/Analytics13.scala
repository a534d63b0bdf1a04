package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, EventAnalytics, Evaluation, Experimentation}

/** Round-4 batch 31: distribution-drift monitoring (PSI), multi-rater
  * agreement (Fleiss' κ), forecast-quality decomposition (Brier /
  * Murphy), recency-weighted attribution (time-decay), robust location
  * (Hodges–Lehmann) and the additive survival view (Nelson–Aalen).
  * Exactness discipline unchanged: corpus-sized sums are integers,
  * doubles appear only in rollup-sized finishes mirrored token-for-
  * token in the oracle SQL. */
object Analytics13 {

  /** q267 — A-stat/E6: PSI drift audit of the order-value distribution,
    * pre-1998 cohort vs 1998+ — the "did the input mix move" alarm a
    * model-serving pipeline runs before every retrain. Laplace-smoothed
    * densified bins; per-bin nano-nat terms (the q218 discipline). */
  val q267 = Declared(
    "q267_psi_drift", "A-stat,E6",
    (s, dir) => Experimentation.psi(
      Tables.orders(s, dir)
        .withColumn("__cents",
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .withColumn("__bin", expr("least(9L, __cents div 6000000L)"))
        .withColumn("__slice",
          when(year(col("o_orderdate")) < 1998, "ref").otherwise("cur")),
      col("__bin"), col("__slice"), "ref", "cur", nBins = 10)
      .orderBy(col("bin")),
    Some("""WITH o AS (
           |  SELECT least(9, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT) // 6000000) AS bin,
           |    CASE WHEN year(o_orderdate) < 1998 THEN 'ref' ELSE 'cur' END
           |      AS s
           |  FROM orders),
           |obs AS (
           |  SELECT bin,
           |    CAST(sum(CASE WHEN s = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS ref_n,
           |    CAST(sum(CASE WHEN s = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS cur_n
           |  FROM o GROUP BY 1),
           |frame AS (SELECT CAST(range AS BIGINT) AS bin FROM range(10)),
           |cells AS (
           |  SELECT f.bin, coalesce(ref_n, 0) AS ref_n,
           |    coalesce(cur_n, 0) AS cur_n
           |  FROM frame f LEFT JOIN obs USING (bin)),
           |tot AS (SELECT CAST(sum(ref_n) AS BIGINT) AS nr,
           |  CAST(sum(cur_n) AS BIGINT) AS nc FROM cells),
           |t AS (
           |  SELECT bin, ref_n, cur_n,
           |    CAST(round((CAST(ref_n + 1 AS DOUBLE) / CAST(nr + 10 AS DOUBLE) -
           |                CAST(cur_n + 1 AS DOUBLE) / CAST(nc + 10 AS DOUBLE)) *
           |               (ln(CAST(ref_n + 1 AS DOUBLE) / CAST(nr + 10 AS DOUBLE)) -
           |                ln(CAST(cur_n + 1 AS DOUBLE) / CAST(nc + 10 AS DOUBLE)))
           |               * 1e9, 0) AS BIGINT) AS term_nano
           |  FROM cells CROSS JOIN tot),
           |s2 AS (SELECT CAST(sum(term_nano) AS BIGINT) AS s_nano FROM t)
           |SELECT bin, ref_n, cur_n, term_nano,
           |  round(CAST(s_nano AS DOUBLE) / 1e9, 6) AS psi
           |FROM t CROSS JOIN s2 ORDER BY bin""".stripMargin),
    "One conditional-count agg over the fact table (map-side combine); " +
      "everything downstream is a 10-row frame. The drift gate that decides " +
      "whether a 100 TB retrain runs at all.")

  /** q268 — A-stat: Fleiss' κ over orders-as-items: the 3 lineitems of
    * every 3-line order are 3 anonymous 'raters' labeling the order
    * with their return flags — do lines of one order agree beyond
    * chance? Fraction-cleared DECIMAL(38,0) arithmetic; three pinned
    * readout divisions. */
  val q268 = Declared(
    "q268_fleiss_kappa", "A-stat",
    (s, dir) => Evaluation.fleissKappa(
      Tables.lineitem(s, dir).select(col("l_orderkey").as("item"),
        col("l_returnflag").as("cat")),
      col("item"), col("cat"), nRaters = 3),
    Some("""WITH r AS (SELECT l_orderkey AS item, l_returnflag AS cat
           |           FROM lineitem),
           |ok AS (SELECT item FROM r GROUP BY 1 HAVING count(*) = 3),
           |kept AS (SELECT r.item, r.cat FROM r JOIN ok USING (item)),
           |cells AS (SELECT item, cat, CAST(count(*) AS HUGEINT) AS nij
           |          FROM kept GROUP BY 1, 2),
           |s2 AS (SELECT CAST(sum(nij * nij) AS HUGEINT) AS s2,
           |         CAST(count(DISTINCT item) AS HUGEINT) AS ni FROM cells),
           |cj AS (SELECT cat, CAST(count(*) AS HUGEINT) AS c
           |       FROM kept GROUP BY 1),
           |sc AS (SELECT CAST(sum(c * c) AS HUGEINT) AS sc2 FROM cj)
           |SELECT CAST(ni AS BIGINT) AS n_items, CAST(3 AS BIGINT) AS n_raters,
           |  round(CAST(s2 - ni * 3 AS DOUBLE) /
           |        CAST(ni * 3 * 2 AS DOUBLE), 6) AS p_bar,
           |  round(CAST(sc2 AS DOUBLE) /
           |        CAST((ni * 3) * (ni * 3) AS DOUBLE), 6) AS p_e,
           |  CASE WHEN (ni * 3) * (ni * 3) - sc2 <> 0 THEN
           |    round(CAST((s2 - ni * 3) * ((ni * 3) * (ni * 3)) -
           |               (ni * 3 * 2) * sc2 AS DOUBLE) /
           |          CAST((ni * 3 * 2) * ((ni * 3) * (ni * 3) - sc2)
           |            AS DOUBLE), 6)
           |  END AS kappa
           |FROM s2 CROSS JOIN sc""".stripMargin),
    "An item-grain size filter, one (item, category) cell agg and two " +
      "bounded rollups — map-side combine end to end. The agreement gate " +
      "run before trusting any multi-judge labeling fleet.")

  /** q269 — A-stat/E4: Murphy decomposition of the Brier score for the
    * q227 pseudo-confidence — splits judge-score badness into
    * MISCALIBRATION (remappable) vs NO-DISCRIMINATION (not). Exact
    * integer Brier sum; ppm-quantized bin means; DECIMAL(38,0) terms. */
  val q269 = Declared(
    "q269_brier_decomp", "A-stat,E4",
    (s, dir) => Evaluation.brierDecomposition(
      Tables.lineitem(s, dir),
      expr("CAST(l_quantity AS BIGINT) * 20000"),
      (col("l_returnflag") === "R").cast("int"), bins = 10),
    Some("""WITH b AS (
           |  SELECT least(9, (CAST(l_quantity AS BIGINT) * 20000 * 10)
           |      // 1000000) AS bin,
           |    CAST(l_quantity AS BIGINT) * 20000 AS conf,
           |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
           |  FROM lineitem),
           |a AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
           |        CAST(sum(conf) AS BIGINT) AS sc,
           |        CAST(sum(y) AS BIGINT) AS sy,
           |        CAST(sum(CAST(conf - y * 1000000 AS HUGEINT) *
           |                 (conf - y * 1000000)) AS HUGEINT) AS sq
           |      FROM b GROUP BY 1),
           |c AS (SELECT bin, n, sy, sq, sc // n AS mc,
           |        (sy * 1000000) // n AS r FROM a),
           |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
           |        CAST(sum(sy) AS BIGINT) AS sy2,
           |        CAST(sum(sq) AS HUGEINT) AS sq2 FROM c),
           |t2 AS (SELECT nn, sq2, (sy2 * 1000000) // nn AS ybar FROM t),
           |g AS (SELECT max(nn) AS n2, max(ybar) AS yb, max(sq2) AS sq3,
           |        CAST(sum(CAST(n AS HUGEINT) * (mc - r) * (mc - r))
           |          AS HUGEINT) AS rel,
           |        CAST(sum(CAST(n AS HUGEINT) * (r - ybar) * (r - ybar))
           |          AS HUGEINT) AS res
           |      FROM c CROSS JOIN t2)
           |SELECT CAST(n2 AS BIGINT) AS n, CAST(yb AS BIGINT) AS y_bar_ppm,
           |  CAST(sq3 // n2 AS BIGINT) AS brier_ppm2,
           |  CAST(rel // n2 AS BIGINT) AS reliability_ppm2,
           |  CAST(res // n2 AS BIGINT) AS resolution_ppm2,
           |  CAST(yb * (1000000 - yb) AS BIGINT) AS uncertainty_ppm2
           |FROM g""".stripMargin),
    "One 10-group agg over the fact table with map-side combine, then two " +
      "passes over the 10-row rollup. Pairs with q227: ECE says HOW " +
      "miscalibrated, this says whether remapping can fix it.")

  /** q270 — W-frame/A1: time-decay attribution with a 1-hour dyadic
    * half-life — recency-weighted credit as the counterpart to q161's
    * U-shape, on the same segment machinery. Σ credit ≡ 10000 bps per
    * conversion via the largest-remainder top-up to the most recent
    * touches. */
  val q270 = Declared(
    "q270_time_decay_attrib", "W-frame,A1",
    (s, dir) =>
      EventAnalytics.timeDecayAttribution(Tables.events(s, dir),
          "user_id", "ts", "event_id", "event_type", "purchase",
          halfLifeSeconds = 3600L)
        .orderBy(col("attributed_type")),
    Some("""WITH seg AS (
           |  SELECT user_id, ts, event_id, event_type,
           |    coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
           |      END) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS seg
           |  FROM events),
           |touches AS (
           |  SELECT user_id, seg, ts, event_id, event_type AS touch
           |  FROM seg WHERE event_type <> 'purchase'),
           |convs AS (
           |  SELECT user_id, seg, ts AS conv_ts
           |  FROM seg WHERE event_type = 'purchase'),
           |w AS (
           |  SELECT t.touch, t.user_id, t.seg, t.ts, t.event_id,
           |    1000000 // (1 << least(19,
           |      (epoch_us(c.conv_ts) - epoch_us(t.ts)) // 3600000000)) AS w
           |  FROM touches t JOIN convs c
           |    ON c.user_id = t.user_id AND c.seg = t.seg),
           |wd AS (
           |  SELECT touch, user_id, seg, w,
           |    sum(w) OVER (PARTITION BY user_id, seg) AS tw,
           |    row_number() OVER (PARTITION BY user_id, seg
           |      ORDER BY ts DESC, event_id DESC) AS rr
           |  FROM w),
           |bs AS (SELECT touch, user_id, seg, rr, (10000 * w) // tw AS base
           |       FROM wd),
           |sf AS (
           |  SELECT touch, rr, base,
           |    10000 - sum(base) OVER (PARTITION BY user_id, seg)
           |      AS shortfall
           |  FROM bs),
           |credit AS (
           |  SELECT touch,
           |    base + CASE WHEN rr <= shortfall THEN 1 ELSE 0 END
           |      AS credit_bps
           |  FROM sf),
           |orphan AS (
           |  SELECT '(none)' AS touch, 10000 AS credit_bps FROM convs c
           |  WHERE NOT EXISTS (SELECT 1 FROM touches t
           |    WHERE t.user_id = c.user_id AND t.seg = c.seg)),
           |u AS (SELECT * FROM credit UNION ALL SELECT * FROM orphan)
           |SELECT touch AS attributed_type, count(*) AS touches,
           |  CAST(sum(credit_bps) AS BIGINT) AS credit_bps
           |FROM u GROUP BY 1 ORDER BY 1""".stripMargin),
    "Segment ids, conversion stamps and recency ranks ride ONE actor-keyed " +
      "window sort (the q161 envelope); decay weights are scan-side integer " +
      "shifts — no exp(), so bps splits reconcile exactly at any scale.")

  /** q271 — A-stat/A-quantile: Hodges–Lehmann pseudo-median of
    * lineitem quantity per return flag — the Wilcoxon-consistent
    * robust location estimate, from the distinct-value rollup's Walsh
    * pair multiset with the all-integer lower-median crossing. */
  val q271 = Declared(
    "q271_hodges_lehmann", "A-stat,A-quantile",
    (s, dir) => Aggregates.hodgesLehmann(
        Tables.lineitem(s, dir).select(col("l_returnflag"),
          col("l_quantity").cast("long").as("__q")),
        Seq("l_returnflag"), col("__q"))
      .orderBy(col("l_returnflag")),
    Some("""WITH v AS (SELECT l_returnflag AS k, CAST(l_quantity AS BIGINT)
           |             AS v FROM lineitem),
           |r AS (SELECT k, v, CAST(count(*) AS BIGINT) AS c
           |      FROM v GROUP BY 1, 2),
           |nn AS (SELECT k, CAST(sum(c) AS BIGINT) AS n FROM r GROUP BY 1),
           |p AS (
           |  SELECT a.k AS k, a.v + b.v AS d,
           |    CAST(sum(CASE WHEN a.v = b.v THEN (a.c * (a.c + 1)) // 2
           |             ELSE a.c * b.c END) AS BIGINT) AS w
           |  FROM r a JOIN r b ON a.k = b.k AND a.v <= b.v
           |  GROUP BY 1, 2),
           |c AS (SELECT k, d, w,
           |    sum(w) OVER (PARTITION BY k ORDER BY d) AS cumw,
           |    sum(w) OVER (PARTITION BY k) AS tw
           |  FROM p),
           |m AS (SELECT k, CAST(min(d) AS BIGINT) AS hl_doubled,
           |        CAST(min(tw) AS BIGINT) AS n_pairs
           |      FROM c WHERE cumw * 2 >= tw GROUP BY 1)
           |SELECT m.k AS l_returnflag, nn.n, m.n_pairs, m.hl_doubled,
           |  round(CAST(m.hl_doubled AS DOUBLE) / 2, 6) AS hl
           |FROM m JOIN nn USING (k) ORDER BY 1""".stripMargin),
    "The Walsh pair space is |distinct quantities|² per key — rollup grain " +
      "(the q183 altitude), never the fact table; the crossing windows run " +
      "over the distinct-SUM rollup. Location estimates that shrug off the " +
      "price-error outliers a mean would swallow.")

  /** q272 — A-stat/A8: Nelson–Aalen cumulative hazard on the q163
    * survival fixture — the additive twin of the KM curve whose slope
    * localizes WHEN churn happens. Ppm integral terms, prefix-summed;
    * no recursion, so the oracle needs no recursive CTE. */
  val q272 = Declared(
    "q272_nelson_aalen", "A-stat,A8",
    (s, dir) => {
      val per = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("fd"), max(to_date(col("ts"))).as("ld"))
      val subj = per
        .crossJoin(broadcast(per.agg(max(col("ld")).as("obs_end"))))
        .select(datediff(col("ld"), col("fd")).as("dur"),
          (col("ld") < date_sub(col("obs_end"), 5)).cast("int").as("churned"))
      EventAnalytics.nelsonAalen(subj, col("dur"), col("churned"))
        .orderBy(col("t"))
    },
    Some("""WITH per AS (
           |  SELECT user_id, min(CAST(ts AS DATE)) AS fd,
           |    max(CAST(ts AS DATE)) AS ld
           |  FROM events GROUP BY 1),
           |oe AS (SELECT max(ld) AS obs_end FROM per),
           |subj AS (
           |  SELECT ld - fd AS dur,
           |    CASE WHEN ld < obs_end - 5 THEN 1 ELSE 0 END AS ev
           |  FROM per CROSS JOIN oe),
           |r AS (SELECT dur AS t, CAST(sum(ev) AS BIGINT) AS d,
           |        count(*) AS alln
           |      FROM subj GROUP BY 1),
           |w AS (SELECT t, d,
           |        CAST(sum(alln) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
           |      FROM r),
           |h AS (SELECT t, n_risk, d, (d * 1000000) // n_risk AS term FROM w)
           |SELECT t, n_risk, d AS d_events,
           |  CAST(sum(term) OVER (ORDER BY t) AS BIGINT) AS cumhaz_ppm
           |FROM h ORDER BY t""".stripMargin),
    "The q163 envelope exactly: a duration-keyed agg with map-side combine " +
      "+ suffix/prefix windows over the calendar-bounded rollup, never the " +
      "subject table. Hazard localization with correct censoring at any " +
      "subject count.")

  val all: Seq[Declared] = Seq(q267, q268, q269, q270, q271, q272)
}
