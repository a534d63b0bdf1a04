package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.TextAnalysis
import graft.ops.Aggregates

/** Round-4 batch 28: related-samples and trend tests (Cochran's Q,
  * Cochran–Armitage), the Ljung–Box whiteness portmanteau, and
  * concentration/spectrum fingerprints (Simpson diversity, Theil
  * index, Zipf slope). Exactness discipline unchanged: exact
  * integer/decimal sums, micro/nano-quantized libm terms, IEEE
  * finishes mirrored token-for-token in the oracle SQL. */
object Analytics10 {

  /** q249 — A-stat: Cochran's Q over customer×year order presence
    * (1995-1997) — did conversion differ across the three years,
    * netting out per-customer baselines? All-integer sums; one pinned
    * finish. The related-samples extension of q215's SRM world. */
  val q249 = Declared(
    "q249_cochran_q", "A-stat",
    (s, dir) => Aggregates.cochranQ(
      Tables.orders(s, dir)
        .filter(year(col("o_orderdate")).between(1995, 1997)),
      col("o_custkey"), year(col("o_orderdate")).cast("long"), lit(true)),
    Some("""WITH cell AS (
           |  SELECT o_custkey AS b, CAST(year(o_orderdate) AS BIGINT) AS t
           |  FROM orders WHERE year(o_orderdate) BETWEEN 1995 AND 1997
           |  GROUP BY 1, 2),
           |k AS (SELECT count(DISTINCT t) AS k FROM cell),
           |cj AS (
           |  SELECT CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sc2,
           |    CAST(sum(c) AS HUGEINT) AS n
           |  FROM (SELECT t, count(*) AS c FROM cell GROUP BY t)),
           |ri AS (
           |  SELECT CAST(count(*) AS BIGINT) AS nb,
           |    CAST(sum(CAST(r AS HUGEINT) * r) AS HUGEINT) AS sr2
           |  FROM (SELECT b, count(*) AS r FROM cell GROUP BY b))
           |SELECT nb AS n_blocks, CAST(k AS BIGINT) AS k,
           |  round(CAST((k - 1) * (k * sc2 - n * n) AS DOUBLE) /
           |        CAST(k * n - sr2 AS DOUBLE), 6) AS q
           |FROM cj CROSS JOIN ri CROSS JOIN k""".stripMargin),
    "One block-grain agg + one treatment-grain agg, both with map-side " +
      "combine — no window, no pair space, one fact pass. The 'did any of k " +
      "related gates move' readout for cohort-presence questions.")

  /** q250 — E4: Zipf slope of the document corpus — OLS of ln(freq)
    * on ln(rank) over the top-200 tokens. Organic text ≈ −1;
    * template farms flatten, spam steepens. Exact ranks, micro-log
    * terms, exact OLS moments. */
  val q250 = Declared(
    "q250_zipf_slope", "E4",
    (s, dir) => TextAnalysis.zipfSlope(Tables.documents(s, dir),
      "text", topN = 200),
    Some("""WITH tk AS (
           |  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |  FROM documents),
           |f AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM tk
           |  WHERE w <> '' GROUP BY w ORDER BY f DESC, w LIMIT 200),
           |rk AS (SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r
           |       FROM f),
           |m AS (
           |  SELECT f,
           |    CAST(round(ln(CAST(r AS DOUBLE)) * 1e6, 0) AS BIGINT) AS x,
           |    CAST(round(ln(CAST(f AS DOUBLE)) * 1e6, 0) AS BIGINT) AS y
           |  FROM rk),
           |a AS (
           |  SELECT CAST(count(*) AS HUGEINT) AS n,
           |    CAST(max(f) AS BIGINT) AS top_freq,
           |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
           |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
           |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
           |  FROM m)
           |SELECT CAST(n AS BIGINT) AS n_terms, top_freq,
           |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
           |        CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           |  round((CAST(sy AS DOUBLE) -
           |         CAST(n * sxy - sx * sy AS DOUBLE) /
           |         CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
           |        CAST(n AS DOUBLE) / 1e6, 6) AS intercept
           |FROM a""".stripMargin),
    "One token agg with map-side combine; TakeOrdered serves the top-200 " +
      "rollup and the OLS is a 200-row agg. The corpus-health fingerprint " +
      "tracked per crawl snapshot beside q141's entropy and q205's vocab " +
      "growth.")

  /** q251 — A-stat: Ljung–Box Q over the monthly order-count series,
    * lags 1-6 — is the series white noise, the gate run on residuals
    * before trusting q173's Holt or q183's trend. Mean-centering is
    * cleared of fractions (c = n·x − S), each lag's ρ² term is
    * nano-quantized, the finish is pinned. */
  val q251 = Declared(
    "q251_ljung_box", "A-stat",
    (s, dir) => Aggregates.ljungBox(
      Tables.orders(s, dir)
        .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("t"))
        .agg(count(lit(1)).as("v")),
      col("t"), col("v"), kLags = 6),
    Some("""WITH s AS (
           |  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
           |    AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1),
           |si AS (SELECT v, row_number() OVER (ORDER BY t) AS i FROM s),
           |tot AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |               CAST(sum(v) AS HUGEINT) AS sm FROM si),
           |c AS (SELECT i, CAST(n * v - sm AS HUGEINT) AS c
           |      FROM si CROSS JOIN tot),
           |den AS (SELECT CAST(sum(c * c) AS HUGEINT) AS d FROM c),
           |lagnum AS (
           |  SELECT b.i - a.i AS lag,
           |    CAST(sum(a.c * b.c) AS HUGEINT) AS num
           |  FROM c a JOIN c b ON b.i - a.i BETWEEN 1 AND 6
           |  GROUP BY 1),
           |t AS (
           |  SELECT CAST(round(CAST(num AS DOUBLE) / CAST(d AS DOUBLE) *
           |      (CAST(num AS DOUBLE) / CAST(d AS DOUBLE)) /
           |      CAST(n - lag AS DOUBLE) * 1e9, 0) AS BIGINT) AS tn
           |  FROM lagnum CROSS JOIN den CROSS JOIN tot)
           |SELECT CAST(n AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k_lags,
           |  round(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) *
           |        (CAST(sum(tn) AS DOUBLE) / 1e9), 6) AS q
           |FROM t CROSS JOIN tot GROUP BY n""".stripMargin),
    "Rollup-first like q243: the centering and every lag join run over the " +
      "84-row month rollup (dense row_number), never the fact table. The " +
      "whiteness gate that stops a seasonal series being fed to a " +
      "stationarity-assuming model.")

  /** q252 — E4/E7: Simpson diversity of languages per source — the
    * probability two documents drawn from a source differ in language.
    * The concentration gauge behind mixing decisions (a 'web' source
    * collapsing to one language is a crawl regression). */
  val q252 = Declared(
    "q252_simpson_diversity", "E4,E7",
    (s, dir) => Aggregates.simpsonDiversity(Tables.documents(s, dir),
      Seq(col("source")), col("lang")).orderBy(col("source")),
    Some("""WITH cell AS (
           |  SELECT source, lang, count(*) AS c FROM documents
           |  GROUP BY 1, 2)
           |SELECT source, CAST(sum(c) AS BIGINT) AS n,
           |  CAST(count(*) AS BIGINT) AS n_categories,
           |  CASE WHEN sum(c) > 1 THEN
           |    round(1.0 - CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS DOUBLE) /
           |      CAST(CAST(sum(c) AS HUGEINT) * (sum(c) - 1) AS DOUBLE), 6)
           |  END AS d
           |FROM cell GROUP BY source ORDER BY source""".stripMargin),
    "One (source, lang) agg with map-side combine + a source-sized rollup — " +
      "category-domain-bounded, one fact pass at any corpus size.")

  /** q253 — A-stat: Theil T inequality of customer spend — the
    * decomposable concentration index beside q142's Gini. The mean
    * fraction clears as (x·N)/S; one micro-quantized ln per DISTINCT
    * spend value, weighted by exact counts. */
  val q253 = Declared(
    "q253_theil_index", "A-stat",
    (s, dir) => Aggregates.theilIndex(
      Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("spend")),
      col("spend")),
    Some("""WITH sp AS (
           |  SELECT o_custkey,
           |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS x
           |  FROM orders GROUP BY 1),
           |pv AS (SELECT x, count(*) AS c FROM sp WHERE x > 0 GROUP BY x),
           |tot AS (SELECT CAST(sum(c) AS HUGEINT) AS n,
           |  CAST(sum(CAST(x AS HUGEINT) * c) AS HUGEINT) AS s FROM pv),
           |t AS (
           |  SELECT c,
           |    CAST(round(CAST(CAST(x AS HUGEINT) * n AS DOUBLE) /
           |        CAST(s AS DOUBLE) *
           |        ln(CAST(CAST(x AS HUGEINT) * n AS DOUBLE) /
           |           CAST(s AS DOUBLE)) * 1e6, 0) AS BIGINT) AS tu
           |  FROM pv CROSS JOIN tot)
           |SELECT CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS sum_x,
           |  round(CAST(sum(CAST(c AS HUGEINT) * tu) AS DOUBLE) / 1e6 /
           |        CAST(n AS DOUBLE), 6) AS theil
           |FROM t CROSS JOIN tot GROUP BY n, s""".stripMargin),
    "One distinct-value rollup with map-side combine — the libm ln runs per " +
      "distinct value, never per row; the weighted term sum is an exact long " +
      "aggregation. The inequality number that decomposes across slices, " +
      "which Gini cannot.")

  /** q254 — A-stat: Cochran–Armitage trend — does the return rate rise
    * MONOTONICALLY across quantity quintiles? Integer scores 1-5,
    * exact sums, one pinned finish. The dose-response readout the
    * omnibus χ² (q153) dilutes. */
  val q254 = Declared(
    "q254_cochran_armitage", "A-stat",
    (s, dir) => Aggregates.cochranArmitage(Tables.lineitem(s, dir),
      expr("1 + (cast(l_quantity as bigint) - 1) div 10"),
      col("l_returnflag") === "R"),
    Some("""WITH g AS (
           |  SELECT 1 + (CAST(l_quantity AS BIGINT) - 1) // 10 AS w,
           |    CAST(count(*) AS BIGINT) AS ni,
           |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS ri
           |  FROM lineitem GROUP BY 1),
           |a AS (
           |  SELECT CAST(sum(ni) AS HUGEINT) AS n, count(*) AS k,
           |    CAST(sum(ri) AS HUGEINT) AS r,
           |    CAST(sum(CAST(w AS HUGEINT) * ri) AS HUGEINT) AS swr,
           |    CAST(sum(CAST(w AS HUGEINT) * ni) AS HUGEINT) AS swn,
           |    CAST(sum(CAST(w AS HUGEINT) * w * ni) AS HUGEINT) AS swwn
           |  FROM g)
           |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups,
           |  round(CAST(n * (n * swr - r * swn) * (n * swr - r * swn)
           |          AS DOUBLE) /
           |        CAST(r * (n - r) * (n * swwn - swn * swn) AS DOUBLE), 6)
           |    AS chi2_trend
           |FROM a""".stripMargin),
    "One group-grain agg with map-side combine over the domain-bounded " +
      "quintiles; everything else is a scalar finish. One fact pass.")

  val all: Seq[Declared] = Seq(q249, q250, q251, q252, q253, q254)
}
