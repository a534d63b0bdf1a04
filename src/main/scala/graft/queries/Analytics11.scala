package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Curation, Sketches, TextAnalysis}
import graft.ops.{Aggregates, Privacy}

/** Round-4 batch 29: release-gate privacy audits (k-anonymity,
  * l-diversity), heavy-tail and unseen-mass estimators (Hill,
  * Good–Turing), the mergeable-histogram quantile audit, and the
  * greedy quality-first mixture allocator. Exactness discipline
  * unchanged. */
object Analytics11 {

  /** q255 — E7/privacy: k-anonymity audit of (nation, market segment)
    * as quasi-identifiers over customers — the release gate run
    * before any user-derived table ships. All integers / exact-ppm. */
  val q255 = Declared(
    "q255_k_anonymity", "E7,privacy",
    (s, dir) => Privacy.kAnonymityAudit(Tables.customer(s, dir),
      Seq(col("c_nationkey"), col("c_mktsegment")), k = 10L),
    Some("""WITH g AS (
           |  SELECT c_nationkey, c_mktsegment, count(*) AS n
           |  FROM customer GROUP BY 1, 2)
           |SELECT CAST(sum(n) AS BIGINT) AS n_rows,
           |  CAST(count(*) AS BIGINT) AS n_groups,
           |  CAST(min(n) AS BIGINT) AS k_min,
           |  CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS groups_below_k,
           |  1000000 * CAST(coalesce(sum(CASE WHEN n < 10 THEN n END), 0)
           |    AS BIGINT) // CAST(sum(n) AS BIGINT) AS rows_below_ppm
           |FROM g""".stripMargin),
    "One QI-grain agg with map-side combine + a groups-sized rollup — the " +
      "same shuffle a GROUP BY on those columns costs. The reproducible " +
      "release decision: k_min >= k or the dataset does not ship.")

  /** q256 — E7/privacy: l-diversity of market segment within each
    * nation class — the k-anonymity blind spot (a uniform class leaks
    * its sensitive value even at k = 1000). */
  val q256 = Declared(
    "q256_l_diversity", "E7,privacy",
    (s, dir) => Privacy.lDiversityAudit(Tables.customer(s, dir),
      Seq(col("c_nationkey")), col("c_mktsegment"), l = 5L),
    Some("""WITH g AS (
           |  SELECT c_nationkey, count(DISTINCT c_mktsegment) AS l
           |  FROM customer GROUP BY 1)
           |SELECT CAST(count(*) AS BIGINT) AS n_groups,
           |  CAST(min(l) AS BIGINT) AS l_min,
           |  CAST(sum(CASE WHEN l < 5 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS groups_below_l,
           |  1000000 * CAST(sum(CASE WHEN l < 5 THEN 1 ELSE 0 END)
           |    AS BIGINT) // CAST(count(*) AS BIGINT) AS below_ppm
           |FROM g""".stripMargin),
    "One (QI, sensitive) distinct agg + a QI rollup, both map-side " +
      "combinable. Read together with q255 before any release.")

  /** q257 — A-stat: Hill tail index of document lengths over the
    * top-100 order statistics — α < 2 means length is tail-dominated
    * and the q52/q64 skew guards are mandatory, α > 2 means means are
    * safe. Only the top-(k+1) value multiset matters; ties need no
    * ordering contract. */
  val q257 = Declared(
    "q257_hill_tail", "A-stat",
    (s, dir) => Aggregates.hillTailIndex(Tables.documents(s, dir),
      col("n_chars"), k = 100),
    Some("""WITH top AS (
           |  SELECT CAST(n_chars AS BIGINT) AS x FROM documents
           |  WHERE n_chars > 0 ORDER BY x DESC LIMIT 101),
           |rk AS (SELECT x, row_number() OVER (ORDER BY x DESC) AS rn
           |       FROM top),
           |xk AS (SELECT x AS xk1 FROM rk WHERE rn = 101),
           |t AS (
           |  SELECT CAST(round(ln(CAST(x AS DOUBLE) / CAST(xk1 AS DOUBLE))
           |    * 1e6, 0) AS BIGINT) AS tu, xk1
           |  FROM rk CROSS JOIN xk WHERE rn <= 100)
           |SELECT CAST(count(*) AS BIGINT) AS k,
           |  CAST(max(xk1) AS BIGINT) AS x_tail,
           |  round(CAST(count(*) AS DOUBLE) /
           |        (CAST(sum(tu) AS DOUBLE) / 1e6), 6) AS alpha
           |FROM t""".stripMargin),
    "TakeOrdered pulls 101 values with per-partition heaps; everything " +
      "after is a 101-row plan. The exponent that decides whether mean-based " +
      "stats are even meaningful for this column at 100 TB.")

  /** q258 — E4: Good–Turing unseen-mass estimate of the document
    * corpus — singleton share N₁/N ≈ probability the next token is a
    * new type, and r₁* = 2N₂/N₁ the adjusted singleton count. The
    * corpus-coverage number beside q205's vocab-growth curve. */
  val q258 = Declared(
    "q258_good_turing", "E4",
    (s, dir) => TextAnalysis.goodTuring(Tables.documents(s, dir), "text"),
    Some("""WITH f AS (
           |  SELECT w, count(*) AS f FROM (
           |    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |    FROM documents)
           |  WHERE w <> '' GROUP BY w)
           |SELECT CAST(sum(f) AS BIGINT) AS n_tokens,
           |  CAST(count(*) AS BIGINT) AS n_types,
           |  CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           |  CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           |  1000000 * CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    // CAST(sum(f) AS BIGINT) AS p0_ppm,
           |  CASE WHEN sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) > 0 THEN
           |    2000000 * CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END)
           |      AS BIGINT) //
           |    CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |  END AS r1_star_ppm
           |FROM f""".stripMargin),
    "One token agg → one frequency-spectrum rollup, both with map-side " +
      "combine. When p0 stops falling as the crawl grows, more of the same " +
      "source buys no new language — the scaling-decision input.")

  /** q259 — E6/sketch: mergeable-histogram quantiles ($10k bins over
    * order value in cents) audited per level against the exact order
    * statistic — the op that SIZES the bin width before the sketch
    * replaces exact quantiles at scale. p50/p90/p99; all integers. */
  val q259 = Declared(
    "q259_binned_quantiles", "E6",
    (s, dir) => Sketches.binnedQuantileAudit(
      Tables.orders(s, dir).select(
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents")),
      col("cents"), binWidth = 1000000L,
      levelsPpm = Seq(500000L, 900000L, 990000L))
      .orderBy(col("level_ppm")),
    Some("""WITH d AS (
           |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |    AS BIGINT) AS x FROM orders),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
           |lv AS (SELECT unnest([500000, 900000, 990000]) AS l),
           |tgt AS (
           |  SELECT CAST(l AS BIGINT) AS level_ppm,
           |    (CAST(l AS BIGINT) * n + 999999) // 1000000 AS target_rank
           |  FROM lv CROSS JOIN n),
           |hist AS (SELECT x // 1000000 AS bin, count(*) AS c
           |         FROM d GROUP BY 1),
           |hc AS (SELECT bin, sum(c) OVER (ORDER BY bin
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM hist),
           |bq AS (
           |  SELECT level_ppm, target_rank,
           |    (min(bin) + 1) * 1000000 - 1 AS binned_q
           |  FROM tgt JOIN hc ON cum >= target_rank GROUP BY 1, 2),
           |vc AS (SELECT x, sum(c) OVER (ORDER BY x
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM (SELECT x, count(*) AS c FROM d GROUP BY x)),
           |eq AS (SELECT level_ppm, min(x) AS exact_q
           |       FROM tgt JOIN vc ON cum >= target_rank GROUP BY 1)
           |SELECT bq.level_ppm, CAST(target_rank AS BIGINT) AS target_rank,
           |  CAST(exact_q AS BIGINT) AS exact_q,
           |  CAST(binned_q AS BIGINT) AS binned_q,
           |  1000000 * (CAST(binned_q AS BIGINT) - exact_q) // exact_q
           |    AS err_ppm
           |FROM bq JOIN eq ON bq.level_ppm = eq.level_ppm
           |ORDER BY 1""".stripMargin),
    "The histogram side is the 100 TB path — per-partition bin counts " +
      "combine map-side and the sketch is bin-domain-sized; the exact side " +
      "is the bounded verification kernel (q34's bucket≡naive pattern). A " +
      "green row certifies the sketch's error at every audited level.")

  /** q260 — E7: greedy quality-first mixture under a 50% token budget
    * — sources ranked by mean document length (the quality slot any
    * scorer can fill), taken whole until the budget line, boundary
    * source split pro-rata. The baseline every learned mixture is
    * judged against; alloc_ppm feeds q63's hash-split sampler. */
  val q260 = Declared(
    "q260_greedy_mixture", "E7",
    (s, dir) => Curation.greedyMixture(
      Tables.documents(s, dir).groupBy(col("source"))
        .agg(sum(col("n_chars")).as("tokens"),
          expr("sum(n_chars) div count(1)").as("quality")),
      col("source"), col("tokens"), col("quality"),
      budgetNum = 1L, budgetDen = 2L)
      .orderBy(col("source")),
    Some("""WITH s AS (
           |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS tokens,
           |    CAST(sum(n_chars) AS BIGINT) // CAST(count(*) AS BIGINT)
           |      AS quality_u
           |  FROM documents GROUP BY source),
           |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM s),
           |w AS (
           |  SELECT source, tokens, quality_u,
           |    total * 1 // 2 AS budget,
           |    CAST(coalesce(sum(tokens) OVER (
           |      ORDER BY quality_u DESC, source
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS bfr
           |  FROM s CROSS JOIN tot)
           |SELECT source, tokens, quality_u,
           |  greatest(0, least(tokens, budget - bfr)) AS alloc_tokens,
           |  1000000 * greatest(0, least(tokens, budget - bfr)) // tokens
           |    AS alloc_ppm
           |FROM w ORDER BY source""".stripMargin),
    "The walk is a window over the source-grain rollup — tens of rows at " +
      "any corpus size; the emitted alloc_ppm becomes a scan-side " +
      "content-hash keep rule. One fact pass to build the rollup.")

  val all: Seq[Declared] = Seq(q255, q256, q257, q258, q259, q260)
}
