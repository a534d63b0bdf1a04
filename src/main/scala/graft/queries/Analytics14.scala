package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, EntityResolution, TimeSeriesOps}
import graft.ext.TextAnalysis

/** Round-4 batch 32: repeated-measures rank testing (Friedman),
  * phonetic ER blocking (portable Soundex), corpus-growth
  * extrapolation (Heaps' law), value-concentration curves (Lorenz),
  * intermittent-demand forecasting (Croston) and equivalence testing
  * (TOST). Exactness discipline unchanged. */
object Analytics14 {

  /** q273 — A-stat: Friedman test across line positions 1-3 within
    * each order (matched blocks) — do earlier lines carry
    * systematically different quantities? Doubled midranks per block;
    * the tie-corrected statistic is a ratio of exact integers. */
  val q273 = Declared(
    "q273_friedman", "A-stat",
    (s, dir) => Aggregates.friedman(
      Tables.lineitem(s, dir).filter(col("l_linenumber") <= 3),
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("long")),
    Some("""WITH cell AS (
           |  SELECT l_orderkey AS b, l_linenumber AS t,
           |    max(CAST(l_quantity AS BIGINT)) AS v
           |  FROM lineitem WHERE l_linenumber <= 3 GROUP BY 1, 2),
           |k1 AS (SELECT count(DISTINCT t) AS k FROM cell),
           |sz AS (SELECT b, count(*) AS nt FROM cell GROUP BY 1),
           |comp AS (
           |  SELECT c.b, c.t, c.v FROM cell c JOIN sz USING (b)
           |  CROSS JOIN k1 WHERE nt = k),
           |rk AS (
           |  SELECT b, t,
           |    2 * count(*) OVER (PARTITION BY b ORDER BY v
           |        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      - count(*) OVER (PARTITION BY b, v) + 1 AS r2
           |  FROM comp),
           |pt AS (SELECT t, CAST(sum(r2) AS HUGEINT) AS rsum
           |       FROM rk GROUP BY 1),
           |tt AS (SELECT CAST(sum(CAST(r2 AS HUGEINT) * r2) AS HUGEINT)
           |         AS sr2,
           |         CAST(count(DISTINCT b) AS HUGEINT) AS nb,
           |         CAST(count(DISTINCT t) AS HUGEINT) AS kk
           |       FROM rk),
           |dv AS (SELECT rsum - nb * (kk + 1) AS dev, nb, kk, sr2
           |       FROM pt CROSS JOIN tt),
           |g AS (SELECT max(nb) AS b2, max(kk) AS k2, max(sr2) AS q2,
           |        CAST(sum(dev * dev) AS HUGEINT) AS sd2 FROM dv)
           |SELECT CAST(b2 AS BIGINT) AS n_blocks, CAST(k2 AS BIGINT) AS k,
           |  round(CAST((k2 - 1) * sd2 AS DOUBLE) /
           |        CAST(q2 - b2 * k2 * (k2 + 1) * (k2 + 1) AS DOUBLE), 6)
           |    AS fr
           |FROM g""".stripMargin),
    "One (block, treatment) cell agg off the fact table; the rank windows " +
      "partition by BLOCK (k-row partitions — embarrassingly parallel); " +
      "everything after is treatment grain. The within-subject test " +
      "kruskalWallis would silently get wrong.")

  /** q274 — J-fuzzy/E4: Soundex phonetic candidate pairs over the
    * distinct part names — variants that SOUND alike land in one code
    * bucket ("cold gear" ≡ "cold gizmo" ≡ C432, "small ring" ≡ "small
    * rod"). The whole code chain is the portable regex subset,
    * transliterated token-for-token into the oracle. */
  val q274 = Declared(
    "q274_soundex_pairs", "J-fuzzy,E4",
    (s, dir) => EntityResolution.soundexPairs(
        Tables.part(s, dir).select(col("p_name").as("w")), "w")
      .orderBy(col("code"), col("name_a"), col("name_b")),
    Some("""WITH w AS (SELECT DISTINCT p_name AS name FROM part),
           |a AS (SELECT name,
           |        regexp_replace(upper(name), '[^A-Z]', '', 'g') AS a
           |      FROM w),
           |b AS (SELECT name, a, translate(a,
           |        'BFPVCGJKQSXZDTLMNRAEIOUY',
           |        '111122222222334556AAAAAA') AS b FROM a),
           |c AS (SELECT name, a, b,
           |        regexp_replace(b, '[HW]', '', 'g') AS c FROM b),
           |d AS (SELECT name, a, b,
           |        regexp_replace(regexp_replace(regexp_replace(
           |          regexp_replace(regexp_replace(regexp_replace(
           |            c, '11+', '1', 'g'), '22+', '2', 'g'),
           |          '33+', '3', 'g'), '44+', '4', 'g'),
           |        '55+', '5', 'g'), '66+', '6', 'g') AS d
           |      FROM c),
           |e AS (SELECT name, a, b,
           |        regexp_replace(d, 'A', '', 'g') AS e FROM d),
           |f AS (SELECT name,
           |        CASE WHEN length(a) > 0 THEN
           |          substr(a, 1, 1) || rpad(substr(
           |            CASE WHEN substr(b, 1, 1) BETWEEN '1' AND '6'
           |                 THEN substr(e, 2) ELSE e END, 1, 3), 3, '0')
           |        END AS code
           |      FROM e),
           |dict AS (SELECT name, code FROM f WHERE code IS NOT NULL)
           |SELECT x.code, x.name AS name_a, y.name AS name_b
           |FROM dict x JOIN dict y ON x.code = y.code AND x.name < y.name
           |ORDER BY 1, 2, 3""".stripMargin),
    "The pair space is Σ per-code |bucket|² over the DISTINCT-name " +
      "dictionary — dictionary grain, never the fact table (the q108 " +
      "altitude); the code itself is scan-side string arithmetic. The " +
      "blocking key edit-distance ER can't derive.")

  /** q275 — E4: Heaps' law fit over the q205 vocabulary-growth curve —
    * V ≈ K·nᵝ by exact-moment OLS on micro-quantized logs; β
    * quantifies the flattening and K·Nᵝ sizes the tokenizer for the
    * full crawl. */
  val q275 = Declared(
    "q275_heaps_fit", "E4",
    (s, dir) => TextAnalysis.heapsFit(Tables.documents(s, dir),
      graft.ext.Dedup.wordShingles(col("text"), 2), col("doc_id"),
      every = 25L),
    Some("""WITH t AS (
           |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
           |  FROM documents),
           |st AS (
           |  SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
           |  FROM t WHERE len(toks) >= 2),
           |g AS (
           |  SELECT doc_id,
           |    array_to_string(list_slice(toks, i, i + 1), ' ') AS tok
           |  FROM st),
           |f AS (
           |  SELECT tok, min(doc_id) AS fd FROM g WHERE tok <> ''
           |  GROUP BY 1),
           |cp AS (
           |  SELECT (fd // 25 + 1) * 25 AS cp,
           |    CAST(count(*) AS BIGINT) AS new_tokens
           |  FROM f GROUP BY 1),
           |n AS (SELECT count(DISTINCT doc_id) AS nd FROM t),
           |curve AS (
           |  SELECT least(cp, nd) AS ds,
           |    CAST(sum(new_tokens) OVER (ORDER BY cp) AS BIGINT) AS vocab
           |  FROM cp, n),
           |pts AS (
           |  SELECT CAST(round(ln(CAST(ds AS DOUBLE)) * 1e6, 0) AS BIGINT)
           |      AS x,
           |    CAST(round(ln(CAST(vocab AS DOUBLE)) * 1e6, 0) AS BIGINT)
           |      AS y
           |  FROM curve),
           |a AS (SELECT CAST(count(*) AS HUGEINT) AS n2,
           |        CAST(sum(x) AS HUGEINT) AS sx,
           |        CAST(sum(y) AS HUGEINT) AS sy,
           |        CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
           |        CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
           |      FROM pts)
           |SELECT CAST(n2 AS BIGINT) AS n_points,
           |  round(CAST(n2 * sxy - sx * sy AS DOUBLE) /
           |        CAST(n2 * sxx - sx * sx AS DOUBLE), 6) AS beta,
           |  round((CAST(sy AS DOUBLE) -
           |         (CAST(n2 * sxy - sx * sy AS DOUBLE) /
           |          CAST(n2 * sxx - sx * sx AS DOUBLE)) *
           |         CAST(sx AS DOUBLE)) / CAST(n2 AS DOUBLE) / 1e6, 6)
           |    AS ln_k,
           |  round(exp((CAST(sy AS DOUBLE) -
           |         (CAST(n2 * sxy - sx * sy AS DOUBLE) /
           |          CAST(n2 * sxx - sx * sx AS DOUBLE)) *
           |         CAST(sx AS DOUBLE)) / CAST(n2 AS DOUBLE) / 1e6), 6)
           |    AS k
           |FROM a""".stripMargin),
    "The fit runs over the checkpoint rollup (corpus/25 rows) — q205's " +
      "cost envelope. β tells a 100 TB crawl whether more data still buys " +
      "vocabulary BEFORE the tokenizer is frozen.")

  /** q276 — A-quantile/E6: Lorenz concentration curve of order value
    * (quantized to $1000 so the rollup stays domain-bounded) — the
    * exact share of revenue held by each bottom decile of orders,
    * tie-splitting handled in integers. */
  val q276 = Declared(
    "q276_lorenz_curve", "A-quantile,E6",
    (s, dir) => Aggregates.lorenzCurve(
        Tables.orders(s, dir).select(
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
            " div 100000").as("v")),
        col("v"), nBins = 10)
      .orderBy(col("quantile")),
    Some("""WITH v AS (
           |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |    AS BIGINT) // 100000 AS v
           |  FROM orders),
           |r AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1),
           |cum AS (
           |  SELECT v, c,
           |    coalesce(CAST(sum(c) OVER (ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |      AS BIGINT), 0) AS cb,
           |    coalesce(sum(CAST(v AS HUGEINT) * c) OVER (ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |      0) AS sb,
           |    CAST(sum(c) OVER () AS BIGINT) AS nn,
           |    sum(CAST(v AS HUGEINT) * c) OVER () AS tt
           |  FROM r),
           |q AS (SELECT CAST(range AS BIGINT) AS quantile
           |      FROM range(1, 11)),
           |x AS (
           |  SELECT quantile, (nn * quantile) // 10 AS m, v, c, cb, sb, tt
           |  FROM cum JOIN q ON cb < (nn * quantile) // 10
           |    AND (nn * quantile) // 10 <= cb + c)
           |SELECT quantile, m AS pop_rows,
           |  CAST(sb + CAST(m - cb AS HUGEINT) * v AS BIGINT) AS cum_value,
           |  CAST((sb + CAST(m - cb AS HUGEINT) * v) * 1000000 // tt
           |    AS BIGINT) AS share_ppm
           |FROM x ORDER BY quantile""".stripMargin),
    "One distinct-value rollup agg (map-side combine), a rollup-sized " +
      "prefix window and a 10-row broadcast range join. Quantize wide " +
      "domains first (the rank-op house rule) so the rollup stays bounded. " +
      "The curve behind q142's Gini number.")

  /** q277 — A5/A8: Croston intermittent-demand forecast of rare
    * high-value urgent orders per priority class — demand size and
    * inter-demand gap each smoothed by the integer α = 1/5 recursion
    * at demand points only; the oracle unrolls the exact trajectory as
    * a recursive CTE. */
  val q277 = Declared(
    "q277_croston", "A5,A8",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 350000)
        .groupBy(col("o_orderpriority").as("pri"),
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
            .as("day"))
        .agg(count(lit(1)).as("demand"))
      TimeSeriesOps.crostonInt(daily, Seq(col("pri")), col("day"),
          col("demand"), aNum = 1, aDen = 5, scale = 1000L)
        .orderBy(col("pri"), col("order"))
    },
    Some("""WITH RECURSIVE d AS (
           |  SELECT o_orderpriority AS pri,
           |    date_diff('day', DATE '1992-01-01', o_orderdate) AS day,
           |    CAST(count(*) AS BIGINT) AS z
           |  FROM orders WHERE o_totalprice > 350000
           |  GROUP BY 1, 2),
           |rn AS (SELECT pri, day, z,
           |    row_number() OVER (PARTITION BY pri ORDER BY day) AS i
           |  FROM d),
           |rec AS (
           |  SELECT pri, day, z, i, CAST(1 AS BIGINT) AS g,
           |    z * 1000 AS zs, CAST(1000 AS BIGINT) AS qs
           |  FROM rn WHERE i = 1
           |  UNION ALL
           |  SELECT r.pri, r.day, r.z, r.i, r.day - p.day AS g,
           |    (1 * r.z * 1000 + 4 * p.zs) // 5 AS zs,
           |    (1 * (r.day - p.day) * 1000 + 4 * p.qs) // 5 AS qs
           |  FROM rn r JOIN rec p ON r.pri = p.pri AND r.i = p.i + 1)
           |SELECT pri, day AS "order", z AS demand, g AS gap, zs AS z_s,
           |  qs AS q_s, CAST((zs * 1000) // qs AS BIGINT) AS forecast_s
           |FROM rec ORDER BY pri, "order"""".stripMargin),
    "One priority-keyed agg collects each key's demand-point series " +
      "(calendar-bounded); the fold is per-key scan-side work. Plain EWMA " +
      "whipsaws on the zeros this series is mostly made of — Croston is " +
      "the estimator long-tail SKU planning actually uses.")

  /** q278 — A-stat: TOST equivalence of mean quantity between open and
    * fulfilled lines within ±0.5 units — the 'provably NO regression'
    * readout q186's difference test cannot give. Exact Welch sums;
    * literal z criterion. */
  val q278 = Declared(
    "q278_tost_equivalence", "A-stat",
    (s, dir) => Aggregates.tostEquivalence(Tables.lineitem(s, dir),
      (col("l_quantity").cast("decimal(18,2)") * 100).cast("long"),
      col("l_linestatus"), "O", "F", margin = 50L),
    Some("""WITH av AS (
           |  SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
           |    AS v FROM lineitem WHERE l_linestatus = 'O'),
           |bv AS (
           |  SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
           |    AS v FROM lineitem WHERE l_linestatus = 'F'),
           |a AS (SELECT CAST(count(*) AS HUGEINT) AS na,
           |        CAST(sum(v) AS HUGEINT) AS sa,
           |        CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS qa
           |      FROM av),
           |b AS (SELECT CAST(count(*) AS HUGEINT) AS nb,
           |        CAST(sum(v) AS HUGEINT) AS sb,
           |        CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS qb
           |      FROM bv),
           |f AS (SELECT na, nb,
           |    CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) -
           |      CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS delta,
           |    sqrt((CAST(na * qa - sa * sa AS DOUBLE) /
           |          CAST(na * (na - 1) AS DOUBLE)) / CAST(na AS DOUBLE) +
           |         (CAST(nb * qb - sb * sb AS DOUBLE) /
           |          CAST(nb * (nb - 1) AS DOUBLE)) / CAST(nb AS DOUBLE))
           |      AS se
           |  FROM a CROSS JOIN b)
           |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           |  round(delta, 6) AS mean_diff, round(se, 6) AS se,
           |  round((delta + 50) / se, 6) AS t_lower,
           |  round((delta - 50) / se, 6) AS t_upper,
           |  round((delta + 50) / se, 6) >= 1.644854 AND
           |    round((delta - 50) / se, 6) <= -1.644854 AS equivalent
           |FROM f""".stripMargin),
    "Two filtered 3-sum aggs (map-side combine) and a 1-row finish — the " +
      "q186 envelope. The launch-review question is 'within margin', not " +
      "'different'; TOST answers the right one.")

  val all: Seq[Declared] = Seq(q273, q274, q275, q276, q277, q278)
}
