package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, Evaluation, Experimentation}
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

  /** q336 — A-eval: Dawid–Skene annotator reliability over synthetic
    * judge panels (4 event-type "raters" label 200 user-bucket
    * "items"; label = odd event count). Two exact-integer EM rounds;
    * the oracle replays init → M → E → M → E → final M with HUGEINT
    * likelihood folds. */
  val q336 = Declared(
    "q336_dawid_skene", "A-eval",
    (s, dir) => Evaluation.dawidSkene(
        Tables.events(s, dir).filter(col("event_type") =!= "error")
          .groupBy((col("user_id") % 200).as("item"),
            col("event_type").as("rater"))
          .agg((count(lit(1)) % 2).as("lab")),
        col("item"), col("rater"), col("lab") === 1, rounds = 2)
      .orderBy(col("rater")),
    Some("""WITH ann AS (
           |  SELECT user_id % 200 AS i, event_type AS r,
           |    CAST(count(*) % 2 AS BIGINT) AS l
           |  FROM events WHERE event_type <> 'error'
           |  GROUP BY 1, 2),
           |p0 AS (
           |  SELECT i, (1000000 * sum(l)) // count(*) AS p
           |  FROM ann GROUP BY i),
           |r1 AS (
           |  SELECT r,
           |    (1000000 * (sum(CASE WHEN l = 1 THEN p ELSE 0 END) + 1)) //
           |      (sum(p) + 2) AS al,
           |    (1000000 * (sum(CASE WHEN l = 1 THEN 1000000 - p ELSE 0 END)
           |      + 1)) // (sum(1000000 - p) + 2) AS be
           |  FROM ann JOIN p0 USING (i) GROUP BY r),
           |pi0 AS (SELECT sum(p) // count(*) AS pi FROM p0),
           |e1 AS (
           |  SELECT i,
           |    list(CAST(CASE WHEN l = 1 THEN al ELSE 1000000 - al END
           |      AS HUGEINT) ORDER BY r) AS f1,
           |    list(CAST(CASE WHEN l = 1 THEN be ELSE 1000000 - be END
           |      AS HUGEINT) ORDER BY r) AS f0
           |  FROM ann JOIN r1 USING (r) GROUP BY i),
           |p1 AS (
           |  SELECT i,
           |    CAST((1000000 * n1) // (n1 + n0) AS BIGINT) AS p
           |  FROM (
           |    SELECT i,
           |      list_reduce(list_prepend(CAST(pi AS HUGEINT), f1),
           |        (a, b) -> a * b) AS n1,
           |      list_reduce(list_prepend(CAST(1000000 - pi AS HUGEINT), f0),
           |        (a, b) -> a * b) AS n0
           |    FROM e1 CROSS JOIN pi0)),
           |r2 AS (
           |  SELECT r,
           |    (1000000 * (sum(CASE WHEN l = 1 THEN p ELSE 0 END) + 1)) //
           |      (sum(p) + 2) AS al,
           |    (1000000 * (sum(CASE WHEN l = 1 THEN 1000000 - p ELSE 0 END)
           |      + 1)) // (sum(1000000 - p) + 2) AS be
           |  FROM ann JOIN p1 USING (i) GROUP BY r),
           |pi1 AS (SELECT sum(p) // count(*) AS pi FROM p1),
           |e2 AS (
           |  SELECT i,
           |    list(CAST(CASE WHEN l = 1 THEN al ELSE 1000000 - al END
           |      AS HUGEINT) ORDER BY r) AS f1,
           |    list(CAST(CASE WHEN l = 1 THEN be ELSE 1000000 - be END
           |      AS HUGEINT) ORDER BY r) AS f0
           |  FROM ann JOIN r2 USING (r) GROUP BY i),
           |p2 AS (
           |  SELECT i,
           |    CAST((1000000 * n1) // (n1 + n0) AS BIGINT) AS p
           |  FROM (
           |    SELECT i,
           |      list_reduce(list_prepend(CAST(pi AS HUGEINT), f1),
           |        (a, b) -> a * b) AS n1,
           |      list_reduce(list_prepend(CAST(1000000 - pi AS HUGEINT), f0),
           |        (a, b) -> a * b) AS n0
           |    FROM e2 CROSS JOIN pi1))
           |SELECT r AS rater, CAST(count(*) AS BIGINT) AS n_annotations,
           |  CAST((1000000 * (sum(CASE WHEN l = 1 THEN p ELSE 0 END) + 1)) //
           |    (sum(p) + 2) AS BIGINT) AS alpha_ppm,
           |  CAST((1000000 * (sum(CASE WHEN l = 1 THEN 1000000 - p ELSE 0 END)
           |    + 1)) // (sum(1000000 - p) + 2) AS BIGINT) AS beta_ppm
           |FROM ann JOIN p2 USING (i)
           |GROUP BY r ORDER BY rater""".stripMargin),
    "Each EM round is one item-keyed join + two rater-keyed aggs with " +
      "map-side combine; likelihood products fold exact DECIMAL(38,0) over " +
      "<= 4 annotations per item. The judge-reliability layer every " +
      "LLM-as-judge eval panel needs before trusting majority vote.")

  /** q337 — T-state/A5: STREAMING stateful daily EWMA per event type
    * (flatMapGroupsWithState custom state) — the live twin of q156's
    * batch smoother, verified against the identical recursive batch
    * oracle: the stream and the warehouse agree bit for bit. */
  val q337 = Declared(
    "q337_stream_ewma", "T-state,A5",
    (s, dir) => {
      import s.implicits._
      TimeSeries.streamEventsToTable(s, dir, "q337", mode = "append")(ev =>
        graft.streaming.StreamOps.statefulDailyEwma(
          ev.select(col("event_type").as("key"), col("ts"))
            .as[graft.streaming.StreamOps.KeyedStamp],
          aNum = 1, aDen = 4).toDF())
        // changelog compaction: a day straddling a micro-batch boundary
        // re-emits with a larger n — keep the final (largest-n) row
        .groupBy(col("event_type"), col("day"))
        .agg(max(col("n")).as("n"),
          expr("max_by(ewma, n)").as("ewma"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""WITH RECURSIVE d AS (
           |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           |  FROM events GROUP BY 1, 2),
           |r AS (
           |  SELECT event_type, day, CAST(n AS BIGINT) AS n,
           |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
           |  FROM d),
           |s AS (
           |  SELECT event_type, rn, day, n, n AS ewma FROM r WHERE rn = 1
           |  UNION ALL
           |  SELECT r.event_type, r.rn, r.day, r.n,
           |    (1 * r.n + 3 * s.ewma) // 4
           |  FROM r JOIN s ON r.event_type = s.event_type AND r.rn = s.rn + 1)
           |SELECT event_type, day, n, ewma FROM s
           |ORDER BY event_type, day""".stripMargin),
    "State is 12 bytes per key, shuffle keyed on the type; the fold runs " +
      "over each batch's day rollup, never raw events. The monitoring loop " +
      "and the warehouse compute the SAME baseline — no 'stream said X, " +
      "batch said Y' drift, which is the entire point of the oracle gate.")

  val all: Seq[Declared] = Seq(q333, q334, q335, q336, q337)
}
