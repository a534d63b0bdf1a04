package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, TimeSeriesOps}
import graft.ext.{Clustering, TextAnalysis}

/** Round-4 batch 35: autocorrelation profiling (ACF/PACF table),
  * slice-characterizing keyword extraction (χ²), rank-based
  * distribution alignment (quantile normalization), seasonality
  * strength, the label-partition silhouette and the Hellinger drift
  * metric. Exactness discipline unchanged. */
object Analytics17 {

  private def monthly(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.orders(s, dir)
      .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("t"))
      .agg(count(lit(1)).as("v"))

  /** q291 — A-stat/A8: ACF/PACF profile of the monthly order-count
    * series (lags 1-6) — WHICH lags carry structure, the order-picking
    * view q251's portmanteau can't give. Exact mean-cleared products;
    * one division per lag. */
  val q291 = Declared(
    "q291_acf_profile", "A-stat,A8",
    (s, dir) => TimeSeriesOps.acfProfile(monthly(s, dir), col("t"),
        col("v"), kLags = 6)
      .orderBy(col("lag")),
    Some("""WITH s0 AS (
           |  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
           |    AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1),
           |rn AS (SELECT t, v, row_number() OVER (ORDER BY t) AS i FROM s0),
           |tot AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |  CAST(sum(v) AS HUGEINT) AS s FROM rn),
           |c AS (SELECT i, CAST(n * v - s AS HUGEINT) AS c
           |      FROM rn CROSS JOIN tot),
           |den AS (SELECT CAST(sum(c * c) AS HUGEINT) AS d FROM c),
           |lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(1, 7)),
           |nums AS (
           |  SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
           |    CAST(coalesce(sum(a.c * b.c), 0) AS HUGEINT) AS num
           |  FROM lags l JOIN c a ON true JOIN c b ON b.i = a.i + l.lag
           |  GROUP BY 1),
           |rho AS (SELECT lag, n_pairs,
           |    CAST(num AS DOUBLE) / CAST(d AS DOUBLE) AS rho
           |  FROM nums CROSS JOIN den),
           |r1 AS (SELECT rho AS r1 FROM rho WHERE lag = 1),
           |r2 AS (SELECT rho AS r2 FROM rho WHERE lag = 2)
           |SELECT lag, n_pairs, round(rho, 6) AS acf,
           |  CASE WHEN lag = 1 THEN round(r1, 6)
           |       WHEN lag = 2 THEN
           |         round((r2 - r1 * r1) / (1.0 - r1 * r1), 6) END AS pacf
           |FROM rho CROSS JOIN r1 CROSS JOIN r2 ORDER BY lag""".stripMargin),
    "The K lag joins offset a dense row number over the month rollup " +
      "(calendar-bounded) — the q251 envelope with the per-lag readout " +
      "kept instead of summed away.")

  /** q292 — E4: χ²-ranked keywords per language slice (top 5) — what
    * characterizes each lang's vocabulary against the rest of the
    * corpus. Exact integer cells and χ² numerator; ranking on the
    * nano-quantized χ² long so the top-K cut is engine-identical. */
  val q292 = Declared(
    "q292_keywords_chi2", "E4",
    (s, dir) => TextAnalysis.keywordsByChi2(Tables.documents(s, dir),
        col("text"), col("lang"), topK = 5)
      .orderBy(col("slice"), col("token")),
    Some("""WITH tk AS (
           |  SELECT lang AS s,
           |    unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |  FROM documents),
           |tk2 AS (SELECT s, w FROM tk WHERE w <> ''),
           |cells AS (SELECT s, w, CAST(count(*) AS BIGINT) AS a
           |          FROM tk2 GROUP BY 1, 2),
           |pw AS (SELECT w, CAST(sum(a) AS BIGINT) AS wtot
           |       FROM cells GROUP BY 1),
           |ps AS (SELECT s, CAST(sum(a) AS BIGINT) AS stot
           |       FROM cells GROUP BY 1),
           |tot AS (SELECT CAST(sum(a) AS BIGINT) AS nn FROM cells),
           |sc AS (
           |  SELECT c.s, c.w, c.a, wtot - a AS b, stot - a AS cc,
           |    nn - a - (wtot - a) - (stot - a) AS dd, nn
           |  FROM cells c JOIN pw USING (w) JOIN ps USING (s)
           |  CROSS JOIN tot),
           |sc2 AS (SELECT s, w, a,
           |    CASE WHEN CAST(a + b AS HUGEINT) * (cc + dd) * (a + cc) *
           |        (b + dd) <> 0 THEN
           |      CAST(round(CAST(CAST(nn AS HUGEINT) *
           |          ((CAST(a AS HUGEINT) * dd - CAST(b AS HUGEINT) * cc) *
           |           (CAST(a AS HUGEINT) * dd - CAST(b AS HUGEINT) * cc))
           |          AS DOUBLE) /
           |        CAST(CAST(a + b AS HUGEINT) * (cc + dd) * (a + cc) *
           |          (b + dd) AS DOUBLE) * 1e9, 0) AS BIGINT)
           |    ELSE 0 END AS chi2_nano
           |  FROM sc),
           |rk AS (SELECT s, w, a, chi2_nano,
           |    row_number() OVER (PARTITION BY s
           |      ORDER BY chi2_nano DESC, w) AS rk
           |  FROM sc2)
           |SELECT s AS slice, w AS token, a AS n_in_slice,
           |  round(CAST(chi2_nano AS DOUBLE) / 1e9, 6) AS chi2
           |FROM rk WHERE rk <= 5 ORDER BY slice, token""".stripMargin),
    "One (slice, token) agg with map-side combine → vocabulary grain; " +
      "the rank window partitions by slice. Beyond ~1e9 tokens lift the " +
      "χ² numerator to ratio form (d38 headroom) — noted, not silent. " +
      "The corpus-card generator.")

  /** q293 — ML/A-quantile: quantile-normalize 1998+ order values onto
    * the pre-1998 distribution ($1000 units) — the all-integer CDF
    * crossing, no float quantile anywhere. Makes scores comparable
    * across an upstream change. */
  val q293 = Declared(
    "q293_quantile_normalize", "ML,A-quantile",
    (s, dir) => Aggregates.quantileNormalize(
      Tables.orders(s, dir)
        .withColumn("__v",
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
            " div 100000"))
        .withColumn("__s",
          when(year(col("o_orderdate")) < 1998, "ref").otherwise("cur")),
      col("__v"), col("__s"), "ref", "cur")
      .orderBy(col("value")),
    Some("""WITH o AS (
           |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT) // 100000 AS v,
           |    CASE WHEN year(o_orderdate) < 1998 THEN 'ref' ELSE 'cur' END
           |      AS s
           |  FROM orders),
           |rt AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM o
           |       WHERE s = 'cur' GROUP BY 1),
           |rt2 AS (SELECT v AS value, c AS n,
           |    CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cumt,
           |    CAST(sum(c) OVER () AS BIGINT) AS nt FROM rt),
           |rr AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM o
           |       WHERE s = 'ref' GROUP BY 1),
           |rr2 AS (SELECT v AS rv,
           |    CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cumr,
           |    CAST(sum(c) OVER () AS BIGINT) AS nr FROM rr),
           |j AS (SELECT value, n, cumt, nt, min(rv) AS mapped
           |  FROM rt2 JOIN rr2 ON cumr * nt >= cumt * nr
           |  GROUP BY 1, 2, 3, 4)
           |SELECT value, n, (cumt * 1000000) // nt AS cum_frac_ppm, mapped
           |FROM j ORDER BY value""".stripMargin),
    "Two distinct-value rollups + one rollup×rollup crossing join " +
      "(min-aggregated) — quadratic only at ROLLUP grain, values " +
      "pre-quantized (the rank-op house rule). The domain-adaptation " +
      "transform behind cross-week score comparability.")

  /** q294 — A5/A8: weekday seasonality strength of daily order counts
    * per priority — 1 − Var(resid)/Var(value) against the integer
    * weekday-means seasonal. Decides whether q115/q126 thresholds
    * must be season-adjusted. */
  val q294 = Declared(
    "q294_seasonality_strength", "A5,A8",
    (s, dir) => TimeSeriesOps.seasonalityStrength(
        Tables.orders(s, dir)
          .groupBy(col("o_orderpriority").as("pri"),
            col("o_orderdate").as("d"))
          .agg(count(lit(1)).as("v"))
          .withColumn("__wd", dayofweek(col("d"))),
        Seq(col("pri")), col("__wd"), col("v"))
      .orderBy(col("pri")),
    Some("""WITH daily AS (
           |  SELECT o_orderpriority AS pri, o_orderdate AS d,
           |    CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1, 2),
           |wd AS (SELECT pri, dayofweek(d) AS season, v FROM daily),
           |sm AS (SELECT pri, season,
           |    CAST(sum(v) AS BIGINT) // count(*) AS smean
           |  FROM wd GROUP BY 1, 2),
           |r AS (SELECT wd.pri, wd.v, wd.v - sm.smean AS resid
           |  FROM wd JOIN sm ON sm.pri = wd.pri AND sm.season = wd.season),
           |g AS (SELECT pri, CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(v) AS HUGEINT) AS sv,
           |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS qv,
           |    CAST(sum(resid) AS HUGEINT) AS sr,
           |    CAST(sum(CAST(resid AS HUGEINT) * resid) AS HUGEINT) AS qr
           |  FROM r GROUP BY 1),
           |ns AS (SELECT pri, CAST(count(DISTINCT season) AS BIGINT)
           |    AS n_seasons FROM wd GROUP BY 1),
           |f AS (SELECT g.pri, n, n_seasons,
           |    CAST(n * qv - sv * sv AS DOUBLE) /
           |      CAST(n * (n - 1) AS DOUBLE) AS vt,
           |    CAST(n * qr - sr * sr AS DOUBLE) /
           |      CAST(n * (n - 1) AS DOUBLE) AS vr
           |  FROM g JOIN ns ON ns.pri = g.pri WHERE n > 1)
           |SELECT pri, CAST(n AS BIGINT) AS n, n_seasons,
           |  round(vt, 6) AS var_total, round(vr, 6) AS var_resid,
           |  CASE WHEN vt > 0 THEN
           |    greatest(0.0, round(1.0 - vr / vt, 6)) END AS strength
           |FROM f ORDER BY pri""".stripMargin),
    "One (key, season) mean agg, a broadcast-back and one key-grain " +
      "moment agg — all map-side combinable. The season labels only " +
      "partition (values never cross engines), so Spark's 1-based and the " +
      "oracle's 0-based weekday agree by construction.")

  /** q295 — E3/ML: simplified silhouette of the embedding LABEL
    * partition — per-label cohesion verdict pairing with q284's
    * centroid cosines. Integer centroids, exact d², micro-quantized
    * per-vector scores, integral per-label mean. */
  val q295 = Declared(
    "q295_label_silhouette", "E3,ML",
    (s, dir) => Clustering.labelSilhouette(Tables.embeddings(s, dir),
        col("vec_id"), col("embedding"), col("label"))
      .orderBy(col("label")),
    Some("""WITH comps AS (
           |  SELECT vec_id AS id, label AS l, i - 1 AS d,
           |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6, 0) AS BIGINT)
           |      AS q
           |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
           |cent AS (SELECT l AS cl, d,
           |    CAST(CAST(sum(q) AS BIGINT) // count(*) AS BIGINT) AS c
           |  FROM comps GROUP BY 1, 2),
           |dist AS (SELECT comps.id, comps.l, cent.cl,
           |    CAST(sum(CAST(q - c AS HUGEINT) * (q - c)) AS HUGEINT) AS dd
           |  FROM comps JOIN cent USING (d) GROUP BY 1, 2, 3),
           |own AS (SELECT id, l, dd AS a2 FROM dist WHERE l = cl),
           |oth AS (SELECT id, min(dd) AS b2 FROM dist WHERE l <> cl
           |        GROUP BY 1),
           |sv AS (SELECT own.l, sqrt(CAST(a2 AS DOUBLE)) AS a,
           |    sqrt(CAST(b2 AS DOUBLE)) AS b
           |  FROM own JOIN oth USING (id)),
           |sm AS (SELECT l, CASE WHEN greatest(a, b) > 0 THEN
           |    CAST(round((b - a) / greatest(a, b) * 1e6, 0) AS BIGINT)
           |  ELSE 0 END AS smicro FROM sv)
           |SELECT l AS label, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(smicro) // count(*) AS BIGINT) AS mean_sil_micro
           |FROM sm GROUP BY 1 ORDER BY label""".stripMargin),
    "Centroids are a |labels|·dims broadcast; per-vector distances to all " +
      "k centroids are one broadcast join + dim-grain agg — linear in " +
      "vectors·dims·k, never the quadratic full silhouette. Near-zero or " +
      "negative means the label is MIXED, not merely close (q284).")

  /** q296 — A-stat/E6: Hellinger + Bhattacharyya drift on the q267
    * price bins — the bounded-[0,1] true-metric member of the drift
    * family; no smoothing needed. */
  val q296 = Declared(
    "q296_hellinger", "A-stat,E6",
    (s, dir) => Aggregates.hellingerBinned(
      Tables.orders(s, dir)
        .withColumn("__cents",
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .withColumn("__bin", expr("least(9L, __cents div 6000000L)"))
        .withColumn("__slice",
          when(year(col("o_orderdate")) < 1998, "ref").otherwise("cur")),
      col("__bin"), col("__slice"), "ref", "cur"),
    Some("""WITH o AS (
           |  SELECT least(9, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT) // 6000000) AS bin,
           |    CASE WHEN year(o_orderdate) < 1998 THEN 'ref' ELSE 'cur' END
           |      AS s
           |  FROM orders),
           |obs AS (SELECT bin,
           |    CAST(sum(CASE WHEN s = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS ca,
           |    CAST(sum(CASE WHEN s = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS cb
           |  FROM o GROUP BY 1),
           |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
           |  CAST(sum(cb) AS BIGINT) AS nb FROM obs),
           |t AS (SELECT ca, cb, na, nb,
           |    CAST(round(sqrt((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)) *
           |      (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))) * 1e9, 0)
           |      AS BIGINT) AS term
           |  FROM obs CROSS JOIN tot),
           |g AS (SELECT max(na) AS na2, max(nb) AS nb2,
           |    CAST(count(*) AS BIGINT) AS n_bins,
           |    CAST(sum(term) AS BIGINT) AS bc_nano FROM t)
           |SELECT na2 AS n_a, nb2 AS n_b, n_bins,
           |  round(CAST(bc_nano AS DOUBLE) / 1e9, 6) AS bc,
           |  round(sqrt(greatest(0.0,
           |    1.0 - CAST(bc_nano AS DOUBLE) / 1e9)), 6) AS hellinger,
           |  CASE WHEN bc_nano > 0 THEN
           |    round(-ln(CAST(bc_nano AS DOUBLE) / 1e9), 6)
           |  END AS bhattacharyya
           |FROM g""".stripMargin),
    "One conditional-count agg with map-side combine; the term pass runs " +
      "over the 10-row bin rollup. The metric to ALARM on: bounded, " +
      "symmetric, triangle inequality — thresholds transfer across " +
      "metrics and datasets.")

  val all: Seq[Declared] = Seq(q291, q292, q293, q294, q295, q296)
}
