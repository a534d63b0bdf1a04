package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Aggregates

/** Round-6 batch 52: classical regression/variance diagnostics —
  * Brown-Forsythe/Levene homogeneity, the Chow structural-break F,
  * and Durbin-Watson residual autocorrelation. */
object Analytics29 {

  private def centsSql(c: String) =
    s"CAST(CAST($c AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** q354 — A-stat: Brown-Forsythe (median-based Levene) test of
    * quantity-variance homogeneity across return flags — the
    * assumption q187's ANOVA rests on. Deviations in exact
    * half-units (|2y − med2|), F via the micro-quantized ANOVA. */
  val q354 = Declared(
    "q354_levene", "A-stat",
    (s, dir) => Aggregates.leveneBrownForsythe(Tables.lineitem(s, dir),
      col("l_quantity"), col("l_returnflag")),
    Some("""WITH pv AS (
           |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM lineitem GROUP BY 1, 2),
           |cu AS (
           |  SELECT g, v, c,
           |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS ct,
           |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
           |  FROM pv),
           |md AS (
           |  SELECT g,
           |    min(CASE WHEN ct * 2 >= n + 1 THEN v END) +
           |    min(CASE WHEN ct * 2 >= n + 2 THEN v END) AS med2
           |  FROM cu GROUP BY g),
           |z AS (
           |  SELECT li.l_returnflag AS g,
           |    abs(2 * CAST(li.l_quantity AS BIGINT) - md.med2) AS z2
           |  FROM lineitem li JOIN md ON li.l_returnflag = md.g),
           |gg AS (
           |  SELECT g, CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(z2) AS HUGEINT) AS s,
           |    CAST(sum(z2 * z2) AS HUGEINT) AS q
           |  FROM z GROUP BY 1),
           |t AS (
           |  SELECT g, n, s, q,
           |    CAST(round(CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0,
           |      0) AS BIGINT) AS term
           |  FROM gg),
           |a AS (
           |  SELECT CAST(count(*) AS BIGINT) AS k,
           |    CAST(sum(n) AS BIGINT) AS n,
           |    CAST(sum(s) AS HUGEINT) AS ss,
           |    CAST(sum(q) AS BIGINT) AS qq,
           |    CAST(sum(term) AS BIGINT) AS sumt
           |  FROM t)
           |SELECT k, n,
           |  CAST(sumt - CAST(round(CAST(ss * ss AS DOUBLE) /
           |    CAST(n AS DOUBLE) * 1000000.0, 0) AS BIGINT) AS BIGINT) AS ssb_u,
           |  CAST(qq * 1000000 - sumt AS BIGINT) AS ssw_u,
           |  CASE WHEN k > 1 AND n > k AND qq * 1000000 - sumt > 0 THEN
           |    (CAST(sumt - CAST(round(CAST(ss * ss AS DOUBLE) /
           |       CAST(n AS DOUBLE) * 1000000.0, 0) AS BIGINT) AS DOUBLE) /
           |       CAST(k - 1 AS DOUBLE)) /
           |    (CAST(qq * 1000000 - sumt AS DOUBLE) / CAST(n - k AS DOUBLE))
           |  END AS f_stat
           |FROM a""".stripMargin),
    "A (group, value) rollup + a group-partitioned cumulative window over it " +
      "(rollup-sized), a broadcast |groups|-row median join back onto the " +
      "scan, then q187's one-agg ANOVA — two passes over the data total. The " +
      "homogeneity pre-check that says whether the ANOVA's F is even valid.")

  /** q355 — A-stat: Chow structural-break F of revenue ~ quantity
    * across the 1998-01-01 shipdate split — did the price/quantity
    * relationship change between eras? One agg, exact moments,
    * mirrored double finish. */
  val q355 = Declared(
    "q355_chow_break", "A-stat",
    (s, dir) => Aggregates.chowTest(Tables.lineitem(s, dir),
      xCol = col("l_quantity"),
      yCol = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
      inSecond = col("l_shipdate") >= lit("1998-01-01").cast("date")),
    Some(s"""WITH d AS (
           |  SELECT CAST(l_quantity AS BIGINT) AS x,
           |    ${centsSql("l_extendedprice")} AS y,
           |    (l_shipdate >= DATE '1998-01-01') AS s
           |  FROM lineitem),
           |a AS (
           |  SELECT
           |    CAST(sum(CASE WHEN NOT s THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
           |    CAST(sum(CASE WHEN NOT s THEN x ELSE 0 END) AS HUGEINT) AS sx1,
           |    CAST(sum(CASE WHEN NOT s THEN y ELSE 0 END) AS HUGEINT) AS sy1,
           |    CAST(sum(CASE WHEN NOT s THEN x * x ELSE 0 END) AS HUGEINT) AS sxx1,
           |    CAST(sum(CASE WHEN NOT s THEN CAST(x AS HUGEINT) * y ELSE 0 END)
           |      AS HUGEINT) AS sxy1,
           |    CAST(sum(CASE WHEN NOT s THEN CAST(y AS HUGEINT) * y ELSE 0 END)
           |      AS HUGEINT) AS syy1,
           |    CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS HUGEINT) AS n2,
           |    CAST(sum(CASE WHEN s THEN x ELSE 0 END) AS HUGEINT) AS sx2,
           |    CAST(sum(CASE WHEN s THEN y ELSE 0 END) AS HUGEINT) AS sy2,
           |    CAST(sum(CASE WHEN s THEN x * x ELSE 0 END) AS HUGEINT) AS sxx2,
           |    CAST(sum(CASE WHEN s THEN CAST(x AS HUGEINT) * y ELSE 0 END)
           |      AS HUGEINT) AS sxy2,
           |    CAST(sum(CASE WHEN s THEN CAST(y AS HUGEINT) * y ELSE 0 END)
           |      AS HUGEINT) AS syy2
           |  FROM d),
           |r AS (
           |  SELECT n1, n2,
           |    CASE WHEN n1 >= 3 AND
           |      CAST(n1 * sxx1 - sx1 * sx1 AS DOUBLE) > 0 THEN
           |      (CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE) -
           |       CAST(n1 * sxy1 - sx1 * sy1 AS DOUBLE) *
           |       CAST(n1 * sxy1 - sx1 * sy1 AS DOUBLE) /
           |       CAST(n1 * sxx1 - sx1 * sx1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
           |    END AS rss1,
           |    CASE WHEN n2 >= 3 AND
           |      CAST(n2 * sxx2 - sx2 * sx2 AS DOUBLE) > 0 THEN
           |      (CAST(n2 * syy2 - sy2 * sy2 AS DOUBLE) -
           |       CAST(n2 * sxy2 - sx2 * sy2 AS DOUBLE) *
           |       CAST(n2 * sxy2 - sx2 * sy2 AS DOUBLE) /
           |       CAST(n2 * sxx2 - sx2 * sx2 AS DOUBLE)) / CAST(n2 AS DOUBLE)
           |    END AS rss2,
           |    CASE WHEN n1 + n2 >= 3 AND
           |      CAST((n1 + n2) * (sxx1 + sxx2) -
           |        (sx1 + sx2) * (sx1 + sx2) AS DOUBLE) > 0 THEN
           |      (CAST((n1 + n2) * (syy1 + syy2) -
           |         (sy1 + sy2) * (sy1 + sy2) AS DOUBLE) -
           |       CAST((n1 + n2) * (sxy1 + sxy2) -
           |         (sx1 + sx2) * (sy1 + sy2) AS DOUBLE) *
           |       CAST((n1 + n2) * (sxy1 + sxy2) -
           |         (sx1 + sx2) * (sy1 + sy2) AS DOUBLE) /
           |       CAST((n1 + n2) * (sxx1 + sxx2) -
           |         (sx1 + sx2) * (sx1 + sx2) AS DOUBLE)) /
           |      CAST(n1 + n2 AS DOUBLE)
           |    END AS rss_pooled
           |  FROM a)
           |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           |  rss1, rss2, rss_pooled,
           |  CASE WHEN rss1 IS NOT NULL AND rss2 IS NOT NULL
           |    AND rss1 + rss2 > 0 THEN
           |    ((rss_pooled - rss1 - rss2) / 2) /
           |    ((rss1 + rss2) / CAST(n1 + n2 - 4 AS DOUBLE))
           |  END AS f_stat
           |FROM r""".stripMargin),
    "ONE map-side-combined agg with conditional per-segment sums (pooled " +
      "moments are their sums) + a 1-row finish — the regression-stability " +
      "check at any scan size. Run it on either side of every deploy, " +
      "repricing, or pipeline change that could bend a fitted relationship.")

  /** q356 — A-stat/A8: Durbin-Watson autocorrelation of daily-revenue
    * trend residuals per return flag — serially-correlated errors
    * invalidate every OLS standard error upstream (q82/q188). Exact
    * moments, milli-quantized residuals, rollup-sized lag window. */
  val q356 = Declared(
    "q356_durbin_watson", "A-stat,A8",
    (s, dir) => {
      val daily = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"),
          expr("datediff(l_shipdate, DATE'1970-01-01')").cast("long").as("day"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("cents"))
      Aggregates.durbinWatson(daily, col("l_returnflag"),
          col("day"), col("cents"))
        .withColumnRenamed("__k", "l_returnflag")
        .orderBy(col("l_returnflag"))
    },
    Some(s"""WITH daily AS (
           |  SELECT l_returnflag AS k,
           |    CAST(datediff('day', DATE '1970-01-01', l_shipdate) AS BIGINT)
           |      AS x,
           |    CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS y
           |  FROM lineitem GROUP BY 1, 2),
           |mo AS (
           |  SELECT k, CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
           |    CAST(sum(x * x) AS HUGEINT) AS sxx,
           |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
           |  FROM daily GROUP BY 1),
           |fit AS (
           |  SELECT k, n,
           |    CAST(n * sxy - sx * sy AS DOUBLE) /
           |      CAST(n * sxx - sx * sx AS DOUBLE) AS b,
           |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
           |  FROM mo),
           |fa AS (
           |  SELECT k, (syd - b * sxd) / CAST(n AS DOUBLE) AS a, b FROM fit),
           |eu AS (
           |  SELECT d.k, d.x,
           |    CAST(round((CAST(d.y AS DOUBLE) - fa.a -
           |      fa.b * CAST(d.x AS DOUBLE)) * 1000, 0) AS BIGINT) AS e
           |  FROM daily d JOIN fa ON d.k = fa.k),
           |lg AS (
           |  SELECT k, e,
           |    lag(e) OVER (PARTITION BY k ORDER BY x) AS pe
           |  FROM eu)
           |SELECT k AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
           |  CAST(CAST(sum(CASE WHEN pe IS NOT NULL
           |    THEN CAST(e - pe AS HUGEINT) * (e - pe) END) AS HUGEINT)
           |    AS DOUBLE) AS num_mu2,
           |  CAST(CAST(sum(CAST(e AS HUGEINT) * e) AS HUGEINT) AS DOUBLE)
           |    AS den_mu2,
           |  CASE WHEN sum(CAST(e AS HUGEINT) * e) > 0 THEN
           |    CAST(CAST(sum(CASE WHEN pe IS NOT NULL
           |      THEN CAST(e - pe AS HUGEINT) * (e - pe) END) AS HUGEINT)
           |      AS DOUBLE) /
           |    CAST(CAST(sum(CAST(e AS HUGEINT) * e) AS HUGEINT) AS DOUBLE)
           |  END AS dw
           |FROM lg GROUP BY k ORDER BY l_returnflag""".stripMargin),
    "One key-rollup agg for the moments, a broadcast join back onto the DAILY " +
      "series (rollup-sized, never raw rows), and a key-partitioned lag " +
      "window. DW ~ 2 means the trend residuals are independent; near 0 the " +
      "series needs differencing before any OLS readout is trusted.")

  val all: Seq[Declared] = Seq(q354, q355, q356)
}
