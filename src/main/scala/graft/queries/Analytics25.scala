package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, Experimentation}
import graft.ext.TextAnalysis

/** Round-5 batch 44: regression discontinuity, Horvitz–Thompson
  * unequal-probability estimation, code-quality curation signals. */
object Analytics25 {

  /** q333 — A-causal: sharp RDD of order value on a customer-key
    * cutoff (750 ± 300) — an A/A-shaped placebo on TPC-H data: the
    * effect should hover near zero, and the two local fits prove the
    * machinery. Unrounded pinned-IEEE finish over exact moments. */
  val q333 = Declared(
    "q333_regression_discontinuity", "A-causal",
    (s, dir) => Experimentation.regressionDiscontinuity(
      Tables.orders(s, dir), col("o_custkey"),
      expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"),
      cutoff = 750L, bandwidth = 300L),
    Some("""WITH u AS (
           |  SELECT CAST(o_custkey AS BIGINT) - 750 AS x,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
           |  FROM orders
           |  WHERE CAST(o_custkey AS BIGINT) - 750 BETWEEN -300 AND 300),
           |g AS (
           |  SELECT CASE WHEN x < 0 THEN 'l' ELSE 'r' END AS side,
           |    CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
           |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
           |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
           |  FROM u GROUP BY 1),
           |f AS (
           |  SELECT side, n,
           |    CAST(n * sxy - sx * sy AS DOUBLE) /
           |      CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
           |    sx, sy
           |  FROM g),
           |f2 AS (
           |  SELECT side, n, slope,
           |    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) /
           |      CAST(n AS DOUBLE) AS icept
           |  FROM f)
           |SELECT
           |  CAST(l.n AS BIGINT) AS n_left, CAST(r.n AS BIGINT) AS n_right,
           |  l.slope AS slope_left, r.slope AS slope_right,
           |  l.icept AS y_at_cut_left, r.icept AS y_at_cut_right,
           |  r.icept - l.icept AS effect
           |FROM (SELECT * FROM f2 WHERE side = 'l') l,
           |     (SELECT * FROM f2 WHERE side = 'r') r""".stripMargin),
    "One filtered scan, two 6-sum aggregates with map-side combine, a 1-row " +
      "finish. The causal readout for every threshold rule a product ships — " +
      "no randomization required, bandwidth controls the locality bias.")

  /** q334 — A-stat: Horvitz–Thompson revenue totals per priority from
    * a stratified unequal-probability sample (big orders certain,
    * small at 10%) — the expansion estimator that makes the sample
    * answer match the population. Integer expansions, exact sums. */
  val q334 = Declared(
    "q334_horvitz_thompson", "A-stat",
    (s, dir) => Aggregates.horvitzThompson(
      Tables.orders(s, dir)
        .withColumn("pi_ppm", when(col("o_totalprice") > 200000.0, 1000000L)
          .otherwise(100000L))
        .filter(col("pi_ppm") === 1000000L || col("o_custkey") % 10 === 0)
        .withColumn("cents", expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")),
      col("o_orderpriority"), col("cents"), col("pi_ppm"))
      .orderBy(col("slice")),
    Some("""WITH s AS (
           |  SELECT o_orderpriority AS slice,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y,
           |    CASE WHEN o_totalprice > 200000.0 THEN 1000000
           |         ELSE 100000 END AS p
           |  FROM orders
           |  WHERE o_totalprice > 200000.0 OR o_custkey % 10 = 0),
           |q AS (
           |  SELECT slice, p, (y * 1000000) // p AS q
           |  FROM s)
           |SELECT slice, CAST(count(*) AS BIGINT) AS n_sampled,
           |  CAST(sum(q) AS BIGINT) AS ht_total,
           |  CAST(sum(CAST(1000000 - p AS HUGEINT) *
           |    (CAST(q AS HUGEINT) * q)) AS DOUBLE) / 1e6 AS var_hat
           |FROM q GROUP BY slice ORDER BY slice""".stripMargin),
    "One slice-keyed agg with map-side combine over the sample. The reason " +
      "a stratified 1%/0.01% sampling scheme still yields unbiased totals — " +
      "and the variance that says how far to trust them.")

  /** q335 — E1: code-quality curation signals per document — line
    * stats, comment density, brace balance, alpha ratio — the
    * structural screens a code-corpus gate runs before training. */
  val q335 = Declared(
    "q335_code_quality", "E1",
    (s, dir) => TextAnalysis.codeQualitySignals(
        Tables.documents(s, dir).filter(col("doc_id") < 200),
        col("doc_id"), col("text"))
      .orderBy(col("id")),
    Some("""WITH d AS (
           |  SELECT doc_id AS id, text,
           |    string_split(text, chr(10)) AS lines
           |  FROM documents WHERE doc_id < 200)
           |SELECT id,
           |  CAST(len(lines) AS BIGINT) AS n_lines,
           |  CAST(greatest(0, list_aggregate(
           |    list_transform(lines, l -> length(l)), 'max')) AS BIGINT)
           |    AS max_line_len,
           |  CAST(list_aggregate(list_transform(lines, l ->
           |    CASE WHEN starts_with(regexp_replace(l, '^\s+', ''), '//')
           |      OR starts_with(regexp_replace(l, '^\s+', ''), '#')
           |      OR starts_with(regexp_replace(l, '^\s+', ''), '--')
           |      THEN 1 ELSE 0 END), 'sum') AS BIGINT) AS comment_lines,
           |  CAST((length(text) - length(replace(text, '{', ''))) -
           |    (length(text) - length(replace(text, '}', ''))) AS BIGINT)
           |    AS brace_delta,
           |  CASE WHEN len(lines) > 0 THEN
           |    (1000000 * CAST(list_aggregate(list_transform(lines, l ->
           |      CASE WHEN starts_with(regexp_replace(l, '^\s+', ''), '//')
           |        OR starts_with(regexp_replace(l, '^\s+', ''), '#')
           |        OR starts_with(regexp_replace(l, '^\s+', ''), '--')
           |        THEN 1 ELSE 0 END), 'sum') AS BIGINT)) // len(lines)
           |    ELSE 0 END AS comment_ppm,
           |  CASE WHEN length(regexp_replace(text, '\s', '', 'g')) > 0 THEN
           |    (1000000 * CAST(length(regexp_replace(text, '[^A-Za-z]', '',
           |      'g')) AS BIGINT)) //
           |      length(regexp_replace(text, '\s', '', 'g'))
           |    ELSE 0 END AS alpha_ppm
           |FROM d ORDER BY id""".stripMargin),
    "Pure scan-side column arithmetic — length/replace chains, no regex " +
      "backtracking, no UDF. Composes with the prose quality gate (q87) for " +
      "mixed code/text corpora; brace_delta flags truncated files before " +
      "they poison fill-in-the-middle training.")

  val all: Seq[Declared] = Seq(q333, q334, q335)
}
