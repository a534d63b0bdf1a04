package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, Experimentation}

/** Round-4 batch 37: scale reliability (Cronbach's α), confounder
  * control (partial correlation), regression influence (Cook's D),
  * robust dispersion (Qn), method agreement (Bland–Altman) and
  * two-way post-stratification (raking / IPF). Exactness discipline
  * unchanged. */
object Analytics18 {

  /** q303 — A-stat: Cronbach's α over 3-line orders — do the three
    * line quantities of an order behave like one scale? Exact
    * moments; per-item variances nano-quantized before the k-term
    * sum. */
  val q303 = Declared(
    "q303_cronbach_alpha", "A-stat",
    (s, dir) => Aggregates.cronbachAlpha(
      Tables.lineitem(s, dir).filter(col("l_linenumber") <= 3),
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("long"), nItems = 3),
    Some("""WITH cell AS (
           |  SELECT l_orderkey AS s, l_linenumber AS it,
           |    max(CAST(l_quantity AS BIGINT)) AS v
           |  FROM lineitem WHERE l_linenumber <= 3 GROUP BY 1, 2),
           |ok AS (SELECT s FROM cell GROUP BY 1 HAVING count(*) = 3),
           |kept AS (SELECT cell.s, it, v FROM cell JOIN ok USING (s)),
           |it AS (SELECT it, CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(v) AS HUGEINT) AS sv,
           |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS qv
           |  FROM kept GROUP BY 1),
           |iv AS (SELECT CAST(count(*) AS BIGINT) AS ki,
           |    CAST(sum(CAST(round(CAST(n * qv - sv * sv AS DOUBLE) /
           |      CAST(n * (n - 1) AS DOUBLE) * 1e9, 0) AS BIGINT))
           |      AS BIGINT) AS siv
           |  FROM it),
           |tt AS (SELECT s, CAST(sum(v) AS BIGINT) AS t
           |       FROM kept GROUP BY 1),
           |tm AS (SELECT CAST(count(*) AS HUGEINT) AS ns,
           |    CAST(sum(t) AS HUGEINT) AS st,
           |    CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS qt FROM tt),
           |f AS (SELECT ns, ki, siv,
           |    CAST(ns * qt - st * st AS DOUBLE) /
           |      CAST(ns * (ns - 1) AS DOUBLE) AS vt
           |  FROM iv CROSS JOIN tm)
           |SELECT CAST(ns AS BIGINT) AS n_subjects, ki AS k_items,
           |  round(CAST(siv AS DOUBLE) / 1e9, 6) AS item_var_sum,
           |  round(vt, 6) AS total_var,
           |  CASE WHEN vt > 0 THEN
           |    round(3.0 / 2 * (1.0 - (CAST(siv AS DOUBLE) / 1e9) / vt), 6)
           |  END AS alpha
           |FROM f""".stripMargin),
    "A (subject, item) cell agg, a size semi-join and two moment aggs — " +
      "all map-side combinable. The gate before collapsing k judge scores " +
      "into one composite: low α means the composite averages unrelated " +
      "things.")

  /** q304 — A-stat: partial correlation of quantity ↔ line revenue
    * controlling for discount — the confounder check before reading
    * q82's raw correlation causally. Ten exact co-moment sums; pinned
    * 1-row finish. */
  val q304 = Declared(
    "q304_partial_correlation", "A-stat",
    (s, dir) => Aggregates.partialCorrelation(Tables.lineitem(s, dir),
      col("l_quantity").cast("long"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
      (col("l_discount").cast("decimal(18,2)") * 100).cast("long")),
    Some("""WITH b AS (
           |  SELECT CAST(l_quantity AS BIGINT) AS x,
           |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS y,
           |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS z
           |  FROM lineitem),
           |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
           |    CAST(sum(z) AS HUGEINT) AS sz,
           |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
           |    CAST(sum(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz,
           |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
           |    CAST(sum(CAST(x AS HUGEINT) * z) AS HUGEINT) AS sxz,
           |    CAST(sum(CAST(y AS HUGEINT) * z) AS HUGEINT) AS syz
           |  FROM b),
           |r AS (SELECT CAST(n AS BIGINT) AS n,
           |    CAST(n * sxy - sx * sy AS DOUBLE) /
           |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
           |       sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS rxy,
           |    CAST(n * sxz - sx * sz AS DOUBLE) /
           |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
           |       sqrt(CAST(n * szz - sz * sz AS DOUBLE))) AS rxz,
           |    CAST(n * syz - sy * sz AS DOUBLE) /
           |      (sqrt(CAST(n * syy - sy * sy AS DOUBLE)) *
           |       sqrt(CAST(n * szz - sz * sz AS DOUBLE))) AS ryz
           |  FROM m)
           |SELECT n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
           |  round(ryz, 6) AS r_yz,
           |  CASE WHEN (1.0 - rxz * rxz) > 0 AND (1.0 - ryz * ryz) > 0 THEN
           |    round((rxy - rxz * ryz) /
           |      sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
           |  END AS r_partial
           |FROM r""".stripMargin),
    "One agg computes all ten exact co-moments in a single fact-table " +
      "pass with map-side combine; the finish is one row. The difference " +
      "between 'correlates' and 'correlates once the discount policy is " +
      "held fixed'.")

  /** q305 — A-stat/ML: regression influence audit of the monthly
    * order-count trend — which months own the fitted slope (Cook's
    * D, top 10). Exact centered moments; per-point pinned doubles;
    * nano-quantized ranking. */
  val q305 = Declared(
    "q305_regression_influence", "A-stat,ML",
    (s, dir) => Aggregates.regressionInfluence(
      Tables.orders(s, dir)
        .groupBy(((year(col("o_orderdate")) - 1995) * 12 +
          month(col("o_orderdate"))).cast("long").as("mx"))
        .agg(count(lit(1)).as("my")),
      col("mx"), col("mx"), col("my"), topK = 10),
    Some("""WITH s0 AS (
           |  SELECT CAST((year(o_orderdate) - 1995) * 12 +
           |    month(o_orderdate) AS BIGINT) AS mx,
           |    CAST(count(*) AS BIGINT) AS my
           |  FROM orders GROUP BY 1),
           |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(mx) AS HUGEINT) AS sx, CAST(sum(my) AS HUGEINT) AS sy,
           |    CAST(sum(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS sxx,
           |    CAST(sum(CAST(mx AS HUGEINT) * my) AS HUGEINT) AS sxy,
           |    CAST(sum(CAST(my AS HUGEINT) * my) AS HUGEINT) AS syy
           |  FROM s0),
           |m2 AS (SELECT n, sx, sy, n * sxx - sx * sx AS cxx,
           |    n * sxy - sx * sy AS cxy, n * syy - sy * sy AS cyy
           |  FROM m),
           |sc AS (SELECT mx, my, n, sx, sy, cxx, cxy, cyy,
           |    CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE) AS slope
           |  FROM s0 CROSS JOIN m2),
           |sc2 AS (SELECT *,
           |    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) /
           |      CAST(n AS DOUBLE) AS icept FROM sc),
           |sc3 AS (SELECT *,
           |    CAST(my AS DOUBLE) - (slope * CAST(mx AS DOUBLE) + icept)
           |      AS e,
           |    1.0 / CAST(n AS DOUBLE) +
           |      CAST((n * mx - sx) * (n * mx - sx) AS DOUBLE) /
           |      CAST(n * cxx AS DOUBLE) AS h,
           |    CAST(cyy * cxx - cxy * cxy AS DOUBLE) /
           |      CAST(n * cxx AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0) AS s2
           |  FROM sc2),
           |sc4 AS (SELECT mx, my, e, h,
           |    (e * e) * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)) AS d
           |  FROM sc3),
           |sc5 AS (SELECT mx, my, e, h, d,
           |    CAST(round(d * 1e9, 0) AS BIGINT) AS dn FROM sc4)
           |SELECT mx AS id, mx AS x, my AS y, round(e, 6) AS residual,
           |  round(h, 6) AS leverage, round(d, 6) AS cooks_d
           |FROM sc5 ORDER BY dn DESC, id LIMIT 10""".stripMargin),
    "Moments are one rollup agg; per-point diagnostics are pinned " +
      "doubles of broadcast exact pieces — no cross-row double sums. One " +
      "bad ingest month can own a trend; this names it before the trend " +
      "ships.")

  /** q306 — A-stat/A-quantile: Qn-style robust scale of quantity per
    * return flag — the exact lower quartile of pairwise |differences|
    * with the 2.2219 consistency constant; the dispersion twin of
    * q271. */
  val q306 = Declared(
    "q306_qn_scale", "A-stat,A-quantile",
    (s, dir) => Aggregates.qnScale(
        Tables.lineitem(s, dir).select(col("l_returnflag"),
          col("l_quantity").cast("long").as("__q")),
        Seq("l_returnflag"), col("__q"))
      .orderBy(col("l_returnflag")),
    Some("""WITH v AS (SELECT l_returnflag AS k, CAST(l_quantity AS BIGINT)
           |             AS v FROM lineitem),
           |r AS (SELECT k, v, CAST(count(*) AS BIGINT) AS c
           |      FROM v GROUP BY 1, 2),
           |nn AS (SELECT k, CAST(sum(c) AS BIGINT) AS n FROM r GROUP BY 1
           |       HAVING sum(c) >= 2),
           |p AS (
           |  SELECT a.k AS k, b.v - a.v AS d,
           |    CAST(sum(CASE WHEN a.v = b.v THEN (a.c * (a.c - 1)) // 2
           |             ELSE a.c * b.c END) AS BIGINT) AS w
           |  FROM r a JOIN r b ON a.k = b.k AND a.v <= b.v
           |  GROUP BY 1, 2 HAVING sum(CASE WHEN a.v = b.v
           |    THEN (a.c * (a.c - 1)) // 2 ELSE a.c * b.c END) > 0),
           |c AS (SELECT k, d, w,
           |    sum(w) OVER (PARTITION BY k ORDER BY d) AS cumw,
           |    sum(w) OVER (PARTITION BY k) AS tw
           |  FROM p),
           |m AS (SELECT k, CAST(min(d) AS BIGINT) AS q25_absdiff,
           |        CAST(min(tw) AS BIGINT) AS n_pairs
           |      FROM c WHERE cumw * 4 >= tw GROUP BY 1)
           |SELECT m.k AS l_returnflag, nn.n, m.n_pairs, m.q25_absdiff,
           |  round(CAST(m.q25_absdiff AS DOUBLE) * 2.2219, 6) AS qn
           |FROM m JOIN nn USING (k) ORDER BY 1""".stripMargin),
    "The q271 pair machinery with |difference| in place of the Walsh sum " +
      "— rollup-grain pair space, all-integer quartile crossing. Spread " +
      "that two 'fat-finger' rows cannot inflate, unlike the SD feeding " +
      "q115's gates.")

  /** q307 — A-stat: Bland–Altman agreement between an order's stated
    * total and the sum of its line extended prices — bias, 95% limits
    * of agreement and the share outside them. The method-comparison
    * readout a correlation fakes. */
  val q307 = Declared(
    "q307_bland_altman", "A-stat",
    (s, dir) => {
      val lineSum = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(expr(
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("__b"))
      val joined = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("__a"))
        .join(lineSum, col("o_orderkey") === col("l_orderkey"))
      Aggregates.blandAltman(joined, col("__a"), col("__b"))
    },
    Some("""WITH ls AS (
           |  SELECT l_orderkey,
           |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS b
           |  FROM lineitem GROUP BY 1),
           |d AS (
           |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |    AS BIGINT) - b AS d
           |  FROM orders JOIN ls ON ls.l_orderkey = o_orderkey),
           |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(d) AS HUGEINT) AS s,
           |    CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS q FROM d),
           |lim AS (SELECT CAST(n AS BIGINT) AS n,
           |    round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS bias,
           |    round(sqrt(CAST(n * q - s * s AS DOUBLE) /
           |      CAST(n * (n - 1) AS DOUBLE)), 6) AS sd_diff,
           |    round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) - 1.96 *
           |      sqrt(CAST(n * q - s * s AS DOUBLE) /
           |        CAST(n * (n - 1) AS DOUBLE)), 6) AS loa_low,
           |    round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 1.96 *
           |      sqrt(CAST(n * q - s * s AS DOUBLE) /
           |        CAST(n * (n - 1) AS DOUBLE)), 6) AS loa_high
           |  FROM m),
           |o AS (SELECT CAST(sum(CASE WHEN CAST(d.d AS DOUBLE) < loa_low OR
           |    CAST(d.d AS DOUBLE) > loa_high THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_outside
           |  FROM d CROSS JOIN lim)
           |SELECT n, bias, sd_diff, loa_low, loa_high, n_outside,
           |  (n_outside * 1000000) // n AS outside_ppm
           |FROM lim CROSS JOIN o""".stripMargin),
    "Two exact-moment passes (limits, then the outside gate against the " +
      "ROUNDED limits) — both map-side combinable. 'Totals track line sums " +
      "within ±X with Y ppm exceptions' is the reconciliation contract a " +
      "correlation cannot state.")

  /** q308 — A-stat: raking / IPF — reweight the 1998+ (priority ×
    * status) table to the pre-1998 marginals, two full rounds, all
    * integer micro-weights. The two-factor post-stratification fix
    * q230's single-factor strata can't express. */
  val q308 = Declared(
    "q308_raking", "A-stat",
    (s, dir) => Experimentation.rakeToMarginals(
        Tables.orders(s, dir),
        col("o_orderpriority"), col("o_orderstatus"),
        when(year(col("o_orderdate")) < 1998, "ref").otherwise("cur"),
        "ref", "cur", rounds = 2)
      .orderBy(col("row_key"), col("col_key")),
    Some {
      def rowStep(win: String, wout: String, rs: String) =
        s"""$rs AS (SELECT r, CAST(sum(w) AS HUGEINT) AS m
           |        FROM $win GROUP BY 1),
           |$wout AS (SELECT $win.r, $win.c, n, rt, ct,
           |    CASE WHEN m > 0 THEN
           |      CAST((CAST(w AS HUGEINT) * rt * 1000000) // m AS BIGINT)
           |    ELSE 0 END AS w
           |  FROM $win JOIN $rs USING (r))""".stripMargin
      def colStep(win: String, wout: String, cs: String) =
        s"""$cs AS (SELECT c, CAST(sum(w) AS HUGEINT) AS m
           |        FROM $win GROUP BY 1),
           |$wout AS (SELECT $win.r, $win.c, n, rt, ct,
           |    CASE WHEN m > 0 THEN
           |      CAST((CAST(w AS HUGEINT) * ct * 1000000) // m AS BIGINT)
           |    ELSE 0 END AS w
           |  FROM $win JOIN $cs USING (c))""".stripMargin
      s"""WITH o AS (
         |  SELECT o_orderpriority AS r, o_orderstatus AS c,
         |    CASE WHEN year(o_orderdate) < 1998 THEN 'ref' ELSE 'cur' END
         |      AS s
         |  FROM orders),
         |cur AS (SELECT r, c, CAST(count(*) AS BIGINT) AS n FROM o
         |        WHERE s = 'cur' GROUP BY 1, 2),
         |rtm AS (SELECT r, CAST(count(*) AS BIGINT) AS rt FROM o
         |        WHERE s = 'ref' GROUP BY 1),
         |ctm AS (SELECT c, CAST(count(*) AS BIGINT) AS ct FROM o
         |        WHERE s = 'ref' GROUP BY 1),
         |w0 AS (SELECT cur.r, cur.c, n, coalesce(rt, 0) AS rt,
         |    coalesce(ct, 0) AS ct, n * 1000000 AS w
         |  FROM cur LEFT JOIN rtm USING (r) LEFT JOIN ctm USING (c)),
         |${rowStep("w0", "w1", "r1s")},
         |${colStep("w1", "w2", "c1s")},
         |${rowStep("w2", "w3", "r2s")},
         |${colStep("w3", "w4", "c2s")}
         |SELECT r AS row_key, c AS col_key, n, w AS weight_micro
         |FROM w4 ORDER BY 1, 2""".stripMargin
    },
    "The table is (priorities × statuses) grain; each IPF step is one " +
      "margin-keyed agg + broadcast-back over that rollup, fact table " +
      "scanned once per slice. Integer micro-weights make the fixed-round " +
      "trajectory exactly replayable — no convergence test, no float " +
      "drift.")

  val all: Seq[Declared] = Seq(q303, q304, q305, q306, q307, q308)
}
