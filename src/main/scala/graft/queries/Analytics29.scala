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
           |    min(CASE WHEN ct * 2 >= n THEN v END) +
           |    min(CASE WHEN ct * 2 >= n + 1 THEN v END) AS med2
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

  /** q358 — A-causal: score-band uplift (Qini-style) curve — urgent
    * orders as "treated", order completion as response, total price
    * as the targeting score in 50k-dollar bands. Exact cumulative
    * counts walked from the highest band down; the micro-unit Qini
    * value prices how many extra completions targeting down to each
    * band buys over the control baseline. */
  val q358 = Declared(
    "q358_uplift_bands", "A-causal",
    (s, dir) => graft.ops.Experimentation.upliftBands(Tables.orders(s, dir),
      treated = col("o_orderpriority") === "1-URGENT",
      responded = col("o_orderstatus") === "F",
      score = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
      bandWidth = 5000000L),
    Some("""WITH b AS (
           |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      // 5000000 AS band,
           |    (o_orderpriority = '1-URGENT') AS t,
           |    (o_orderstatus = 'F') AS r
           |  FROM orders),
           |g AS (
           |  SELECT band,
           |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
           |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
           |    CAST(sum(CASE WHEN t AND r THEN 1 ELSE 0 END) AS BIGINT) AS r_t,
           |    CAST(sum(CASE WHEN NOT t AND r THEN 1 ELSE 0 END) AS BIGINT) AS r_c
           |  FROM b GROUP BY band),
           |c AS (
           |  SELECT *,
           |    CAST(sum(n_t) OVER w AS BIGINT) AS cum_n_t,
           |    CAST(sum(n_c) OVER w AS BIGINT) AS cum_n_c,
           |    CAST(sum(r_t) OVER w AS BIGINT) AS cum_r_t,
           |    CAST(sum(r_c) OVER w AS BIGINT) AS cum_r_c
           |  FROM g WINDOW w AS (ORDER BY band DESC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           |SELECT band, n_t, n_c, r_t, r_c,
           |  cum_n_t, cum_n_c, cum_r_t, cum_r_c,
           |  CASE WHEN cum_n_c > 0 THEN
           |    CAST((1000000 * (CAST(cum_r_t AS HUGEINT) * cum_n_c -
           |      CAST(cum_r_c AS HUGEINT) * cum_n_t)) // cum_n_c AS BIGINT)
           |  END AS qini_micro
           |FROM c ORDER BY band DESC""".stripMargin),
    "One band-keyed agg with map-side combine + a cumulative window over the " +
      "<=|bands| rollup (bounded, call-site-documented). Value-width bands " +
      "keep banding scan-side and engine-deterministic where rank deciles " +
      "would need a global sort with irreproducible tie-breaks.")

  /** q359 — T-state/A1: the sequential funnel as a STREAMING state
    * machine — per user, view → click → purchase in event-time order,
    * each stage strictly after the last and within 7 days of the
    * first view, emitted as a changelog and compacted by max
    * furthest. The batch oracle replays the reach times as chained
    * conditional mins (the first qualifying event in time order IS
    * the min), so streaming and warehouse agree row for row. */
  val q359 = Declared(
    "q359_stream_funnel", "T-state,A1",
    (s, dir) => {
      import graft.streaming.StreamOps
      TimeSeries.streamEventsToTable(s, dir, "q359", mode = "append")(ev => {
        import ev.sparkSession.implicits._
        StreamOps.statefulFunnel(
          ev.select(col("user_id").cast("string").as("key"),
            unix_micros(col("ts")).as("us"), col("event_type").as("etype"))
            .as[StreamOps.TypedStamp],
          Seq("view", "click", "purchase"), horizonUs = 604800000000L).toDF()
      })
        .groupBy(col("user_id"))
        .agg(max(col("furthest")).as("furthest"),
          expr("max_by(t1_us, furthest)").as("t1_us"),
          expr("max_by(t2_us, furthest)").as("t2_us"),
          expr("max_by(t3_us, furthest)").as("t3_us"))
        .orderBy(col("user_id"))
    },
    Some("""WITH t1 AS (
           |  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
           |  WHERE event_type = 'view' GROUP BY 1),
           |t2 AS (
           |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
           |  FROM events e JOIN t1 ON e.user_id = t1.user_id
           |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
           |    AND epoch_us(e.ts) <= t1.t1 + 604800000000
           |  GROUP BY 1),
           |t3 AS (
           |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
           |  FROM events e
           |  JOIN t2 ON e.user_id = t2.user_id
           |  JOIN t1 ON e.user_id = t1.user_id
           |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
           |    AND epoch_us(e.ts) <= t1.t1 + 604800000000
           |  GROUP BY 1)
           |SELECT CAST(t1.user_id AS VARCHAR) AS user_id,
           |  CAST(1 + CASE WHEN t2.t2 IS NOT NULL THEN 1 ELSE 0 END +
           |    CASE WHEN t3.t3 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           |    AS furthest,
           |  t1.t1 AS t1_us,
           |  coalesce(t2.t2, -1) AS t2_us,
           |  coalesce(t3.t3, -1) AS t3_us
           |FROM t1
           |LEFT JOIN t2 ON t1.user_id = t2.user_id
           |LEFT JOIN t3 ON t1.user_id = t3.user_id
           |ORDER BY user_id""".stripMargin),
    "State is <= 3 longs per user keyed on the funnel actor — the natural " +
      "shuffle key; emission only on stage growth keeps the changelog " +
      "monotone so compaction is one max_by. The funnel horizon (not a " +
      "watermark) bounds state lifetime; the monitoring loop and the " +
      "warehouse compute the SAME funnel, which is the point of the gate.")

  /** q363 — A9: Fisher-Jenks natural breaks of extended price — the
    * OPTIMAL 4-class 1-D clustering over a 32-bin rollup, exact DP
    * with micro-quantized class costs and lowest-index tie-breaks.
    * The oracle rebuilds the full DP table and backtracks the same
    * splits, so any divergence in any cell trips the hash. */
  val q363 = Declared(
    "q363_jenks_breaks", "A9",
    (s, dir) => graft.ops.Binning.jenksBreaks(Tables.lineitem(s, dir),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
        nBins = 32, k = 4)
      .orderBy(col("class_id")),
    Some {
      def dk(k: Int) =
        s"""d$k AS (
           |  SELECT j, val, besti FROM (
           |    SELECT c.j, d.val + c.c AS val, c.i AS besti,
           |      row_number() OVER (PARTITION BY c.j
           |        ORDER BY d.val + c.c, c.i) AS rn
           |    FROM cost c JOIN d${k - 1} d ON d.j = c.i - 1
           |    WHERE c.i >= $k) WHERE rn = 1)""".stripMargin
      s"""WITH vals AS (
         |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    AS v FROM lineitem),
         |mm AS (SELECT min(v) AS lo, max(v) AS hi FROM vals),
         |ro AS (
         |  SELECT ((v - lo) * 32) // (hi - lo + 1) AS bin,
         |    CAST(count(*) AS HUGEINT) AS n,
         |    CAST(sum(v) AS HUGEINT) AS s,
         |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
         |  FROM vals, mm GROUP BY 1),
         |grid AS (
         |  SELECT gb.b AS bin, coalesce(n, 0) AS n, coalesce(s, 0) AS s,
         |    coalesce(q, 0) AS q
         |  FROM (SELECT unnest(range(0, 32)) AS b) gb
         |  LEFT JOIN ro ON ro.bin = gb.b),
         |pre AS (
         |  SELECT bin + 1 AS j,
         |    CAST(sum(n) OVER w AS HUGEINT) AS cn,
         |    CAST(sum(s) OVER w AS HUGEINT) AS cs,
         |    CAST(sum(q) OVER w AS HUGEINT) AS cq
         |  FROM grid WINDOW w AS (ORDER BY bin
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |pre0 AS (
         |  SELECT CAST(0 AS BIGINT) AS j, CAST(0 AS HUGEINT) AS cn,
         |    CAST(0 AS HUGEINT) AS cs, CAST(0 AS HUGEINT) AS cq
         |  UNION ALL SELECT j, cn, cs, cq FROM pre),
         |cost AS (
         |  SELECT l.j + 1 AS i, h.j AS j,
         |    CASE WHEN h.cn - l.cn > 0 THEN
         |      CAST(round((CAST(h.cq - l.cq AS DOUBLE) -
         |        CAST(h.cs - l.cs AS DOUBLE) * CAST(h.cs - l.cs AS DOUBLE) /
         |          CAST(h.cn - l.cn AS DOUBLE)) / 1000000.0, 0) AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS c
         |  FROM pre0 l JOIN pre0 h ON h.j >= l.j + 1
         |  WHERE l.j <= 31),
         |d1 AS (SELECT j, c AS val, CAST(1 AS BIGINT) AS besti
         |       FROM cost WHERE i = 1),
         |${(2 to 4).map(dk).mkString(",\n")},
         |s4 AS (SELECT besti FROM d4 WHERE j = 32),
         |s3 AS (SELECT d3.besti FROM d3, s4 WHERE d3.j = s4.besti - 1),
         |s2 AS (SELECT d2.besti FROM d2, s3 WHERE d2.j = s3.besti - 1),
         |cls AS (
         |  SELECT CAST(1 AS BIGINT) AS class_id, CAST(1 AS BIGINT) AS i,
         |    s2.besti - 1 AS j FROM s2
         |  UNION ALL SELECT 2, s2.besti, s3.besti - 1 FROM s2, s3
         |  UNION ALL SELECT 3, s3.besti, s4.besti - 1 FROM s3, s4
         |  UNION ALL SELECT 4, s4.besti, 32 FROM s4)
         |SELECT cls.class_id, CAST(cls.i - 1 AS BIGINT) AS bin_lo,
         |  CAST(cls.j - 1 AS BIGINT) AS bin_hi,
         |  CAST(h.cn - l.cn AS BIGINT) AS n, cost.c AS cost_u
         |FROM cls
         |JOIN pre0 l ON l.j = cls.i - 1
         |JOIN pre0 h ON h.j = cls.j
         |JOIN cost ON cost.i = cls.i AND cost.j = cls.j
         |ORDER BY cls.class_id""".stripMargin
    },
    "ONE bin-keyed agg over the data; the <=32-row rollup is a bounded " +
      "driver solve (the kriging/bin-labels license) and the O(bins^2 k) DP " +
      "is microseconds. Pre-binning is the standard two-level Jenks at scale " +
      "— bins set the resolution knob, the data pass stays a single scan. " +
      "The principled alternative to eyeballed thresholds in q16's styling.")

  /** q364 — A-stat/A8: binary-segmentation changepoints of the daily
    * order-count series — the root split maximizing between-segment
    * variance gain, then one recursive split per side. Gains are
    * exact-integer squares over a double division; argmax ties break
    * on the earlier day; the oracle replays all three argmax layers. */
  val q364 = Declared(
    "q364_binary_segmentation", "A-stat,A8",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(expr("datediff(o_orderdate, DATE'1970-01-01')").cast("long")
          .as("day"))
        .agg(count(lit(1)).as("cnt"))
      Aggregates.binarySegmentation(daily, col("day"), col("cnt"))
        .orderBy(col("level"))
    },
    Some("""WITH daily AS (
           |  SELECT CAST(datediff('day', DATE '1970-01-01', o_orderdate)
           |    AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS y
           |  FROM orders GROUP BY 1),
           |pre AS (
           |  SELECT t,
           |    CAST(sum(1) OVER w AS BIGINT) AS cn,
           |    CAST(sum(y) OVER w AS BIGINT) AS cs
           |  FROM daily WINDOW w AS (ORDER BY t
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |b AS (SELECT min(t) AS lo, max(t) AS hi, max(cn) AS n,
           |      max(cs) AS s FROM pre),
           |g1 AS (
           |  SELECT p.t, p.cn, p.cs,
           |    CAST((CAST(p.cs AS HUGEINT) * (b.n - p.cn) -
           |      CAST(b.s - p.cs AS HUGEINT) * p.cn) *
           |      (CAST(p.cs AS HUGEINT) * (b.n - p.cn) -
           |      CAST(b.s - p.cs AS HUGEINT) * p.cn) AS DOUBLE) /
           |      CAST(p.cn * (b.n - p.cn) AS DOUBLE) AS gain
           |  FROM pre p, b
           |  WHERE p.t < b.hi AND p.cn > 0 AND b.n - p.cn > 0),
           |r1 AS (SELECT t, cn, cs, gain FROM (
           |  SELECT *, row_number() OVER (ORDER BY gain DESC, t) AS rn
           |  FROM g1) WHERE rn = 1),
           |g2 AS (
           |  SELECT p.t,
           |    CAST((CAST(p.cs AS HUGEINT) * (r1.cn - p.cn) -
           |      CAST(r1.cs - p.cs AS HUGEINT) * p.cn) *
           |      (CAST(p.cs AS HUGEINT) * (r1.cn - p.cn) -
           |      CAST(r1.cs - p.cs AS HUGEINT) * p.cn) AS DOUBLE) /
           |      CAST(p.cn * (r1.cn - p.cn) AS DOUBLE) AS gain
           |  FROM pre p, r1
           |  WHERE p.t < r1.t AND p.cn > 0 AND r1.cn - p.cn > 0),
           |r2 AS (SELECT t, gain FROM (
           |  SELECT *, row_number() OVER (ORDER BY gain DESC, t) AS rn
           |  FROM g2) WHERE rn = 1),
           |g3 AS (
           |  SELECT p.t,
           |    CAST((CAST(p.cs - r1.cs AS HUGEINT) * (b.n - p.cn) -
           |      CAST(b.s - p.cs AS HUGEINT) * (p.cn - r1.cn)) *
           |      (CAST(p.cs - r1.cs AS HUGEINT) * (b.n - p.cn) -
           |      CAST(b.s - p.cs AS HUGEINT) * (p.cn - r1.cn)) AS DOUBLE) /
           |      CAST((p.cn - r1.cn) * (b.n - p.cn) AS DOUBLE) AS gain
           |  FROM pre p, r1, b
           |  WHERE p.t > r1.t AND p.t < b.hi
           |    AND p.cn - r1.cn > 0 AND b.n - p.cn > 0),
           |r3 AS (SELECT t, gain FROM (
           |  SELECT *, row_number() OVER (ORDER BY gain DESC, t) AS rn
           |  FROM g3) WHERE rn = 1)
           |SELECT CAST(1 AS BIGINT) AS level, b.lo AS seg_start,
           |  b.hi AS seg_end, r1.t AS split_at, r1.gain FROM b, r1
           |UNION ALL SELECT 2, b.lo, r1.t, r2.t, r2.gain FROM b, r1, r2
           |UNION ALL SELECT 3, r1.t + 1, b.hi, r3.t, r3.gain FROM b, r1, r3
           |ORDER BY level""".stripMargin),
    "One prefix window over the DAILY rollup (bounded, documented hazard) + " +
      "three TakeOrdered(1) argmax passes over it; the fact-table cost is the " +
      "day rollup itself. The multi-changepoint extension of q244's single " +
      "Pettitt point — run on ingest-volume series to segment regime shifts " +
      "before fitting anything per-regime.")

  /** q371 — A-stat: mean-excess (mean-residual-life) table — the
    * peaks-over-threshold diagnostic of extreme-value theory (Davison
    * & Smith 1990): for a ladder of thresholds u, the mean exceedance
    * E[X − u | X > u] of order totals. A linearly increasing tail is
    * the GPD signature that licenses a POT fit; exact integer counts
    * and cent sums with one double division per threshold row. */
  val q371 = Declared(
    "q371_mean_excess", "A-stat",
    (s, dir) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
      val base = Tables.orders(s, dir).select(cents.as("__v"))
      // threshold ladder: 8 fixed quantile-free cents levels (literals
      // — scan-side predicates, one conditional agg per level, one pass)
      val levels = Seq(10000000L, 15000000L, 20000000L, 25000000L,
        30000000L, 35000000L, 40000000L, 45000000L)
      val aggs = levels.zipWithIndex.flatMap { case (u, ix) =>
        Seq(sum(when(col("__v") > u, 1L).otherwise(0L)).as(s"__n$ix"),
          sum(when(col("__v") > u, col("__v") - u).otherwise(0L)).as(s"__e$ix"))
      }
      val one = base.agg(aggs.head, aggs.tail: _*)
      val rows = levels.zipWithIndex.map { case (u, ix) =>
        one.select(lit(u).as("threshold_cents"),
          col(s"__n$ix").as("n_exceed"),
          col(s"__e$ix").as("sum_excess_cents"),
          when(col(s"__n$ix") > 0,
            col(s"__e$ix").cast("double") / col(s"__n$ix").cast("double"))
            .as("mean_excess_cents"))
      }
      rows.reduce(_ unionByName _).orderBy(col("threshold_cents"))
    },
    Some("""WITH v AS (
           |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |    AS v FROM orders),
           |u AS (SELECT unnest([10000000, 15000000, 20000000, 25000000,
           |  30000000, 35000000, 40000000, 45000000]) AS u)
           |SELECT CAST(u AS BIGINT) AS threshold_cents,
           |  CAST(sum(CASE WHEN v > u THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_exceed,
           |  CAST(sum(CASE WHEN v > u THEN v - u ELSE 0 END) AS BIGINT)
           |    AS sum_excess_cents,
           |  CASE WHEN sum(CASE WHEN v > u THEN 1 ELSE 0 END) > 0 THEN
           |    CAST(sum(CASE WHEN v > u THEN v - u ELSE 0 END) AS DOUBLE) /
           |    CAST(sum(CASE WHEN v > u THEN 1 ELSE 0 END) AS DOUBLE)
           |  END AS mean_excess_cents
           |FROM v, u GROUP BY u ORDER BY threshold_cents""".stripMargin),
    "ONE map-side-combined agg computes every threshold's conditional sums " +
      "in a single scan (levels are literals); the finish is 8 rows. The " +
      "tail-behavior diagnostic run before any POT/GPD fit — if the mean " +
      "excess doesn't trend linearly, the extreme-value model is wrong.")

  /** q372 — A8/E6: LTTB downsampling of the daily order-count series
    * to 12 buckets (+ endpoints) — the dashboard decimation that
    * keeps visual extremes where averaging flattens them. The oracle
    * replays the left-to-right greedy walk bucket by bucket, so every
    * picked point must agree exactly. */
  val q372 = Declared(
    "q372_lttb_downsample", "A8,E6",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(expr("datediff(o_orderdate, DATE'1970-01-01')").cast("long")
          .as("day"))
        .agg(count(lit(1)).as("cnt"))
      graft.ops.TimeSeriesOps.lttbDownsample(daily, col("day"), col("cnt"),
          nBuckets = 12)
        .orderBy(col("sel_order"))
    },
    Some {
      def step(b: Int): String = {
        val anchor =
          if (b == 11) "SELECT CAST(t AS DOUBLE) AS ax, CAST(y AS DOUBLE) AS ay FROM lst"
          else s"SELECT ax, ay FROM av WHERE b = ${b + 1}"
        s"""p${b + 1} AS (
           |  SELECT t, y FROM (
           |    SELECT i.t, i.y, row_number() OVER (ORDER BY abs(
           |      (CAST(p.t AS DOUBLE) - a.ax) *
           |        (CAST(i.y AS DOUBLE) - CAST(p.y AS DOUBLE)) -
           |      (CAST(p.t AS DOUBLE) - CAST(i.t AS DOUBLE)) *
           |        (a.ay - CAST(p.y AS DOUBLE))) DESC, i.t) AS rn
           |    FROM itr i, p$b p, ($anchor) a
           |    WHERE i.b = $b) WHERE rn = 1)""".stripMargin
      }
      s"""WITH daily AS (
         |  SELECT CAST(datediff('day', DATE '1970-01-01', o_orderdate)
         |    AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS y
         |  FROM orders GROUP BY 1),
         |rk AS (
         |  SELECT t, y, row_number() OVER (ORDER BY t) AS r,
         |    count(*) OVER () AS n
         |  FROM daily),
         |fst AS (SELECT t, y FROM rk WHERE r = 1),
         |lst AS (SELECT t, y FROM rk WHERE r = n),
         |itr AS (
         |  SELECT t, y, ((r - 2) * 12) // (n - 2) AS b
         |  FROM rk WHERE r > 1 AND r < n),
         |av AS (
         |  SELECT b, CAST(sum(t) AS DOUBLE) / count(*) AS ax,
         |    CAST(sum(y) AS DOUBLE) / count(*) AS ay
         |  FROM itr GROUP BY b),
         |p0 AS (SELECT t, y FROM fst),
         |${(0 until 12).map(step).mkString(",\n")}
         |SELECT CAST(1 AS BIGINT) AS sel_order, t, y FROM fst
         |${(0 until 12).map(b =>
        s"UNION ALL SELECT ${b + 2}, t, y FROM p${b + 1}").mkString("\n")}
         |UNION ALL SELECT 14, t, y FROM lst
         |ORDER BY sel_order""".stripMargin
    },
    "One rank window over the DAILY rollup (bounded, documented) + a bucket " +
      "rollup + 12 argmax passes over the same checkpointed frame. LTTB is a " +
      "RESULT-scale presentation op by contract — its input is a series " +
      "rollup, so the bounded per-bucket picks are the whole cost; the " +
      "fact-table pass is the day rollup itself.")

  val all: Seq[Declared] = Seq(q354, q355, q356, q358, q359, q363, q364, q371, q372)
}
