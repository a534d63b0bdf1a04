package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Graph
import graft.ops.{Aggregates, Evaluation, Experimentation}

/** Round-4 batch 25: the k-sample and paired nonparametric tests
  * (Kruskal–Wallis, Wilcoxon signed-rank), inter-rater agreement
  * (Cohen's κ), Adamic–Adar link prediction, UCB1 bandit scoring and
  * group-sequential (O'Brien–Fleming-shaped) experiment monitoring.
  * Same exactness discipline as the other Analytics modules: every
  * corpus-sized accumulation is an exact integer/decimal sum (doubled
  * midranks for the rank tests), doubles appear only in O(groups)
  * finishes written token-for-token identically in the oracle SQL. */
object Analytics8 {

  /** q231 — A-stat: Kruskal–Wallis H across the three return-flag
    * populations of line quantities — the k-sample extension of q152's
    * Mann–Whitney (one-way ANOVA on ranks, no normality assumption).
    * Doubled midranks off the 50-row distinct-quantity rollup; each
    * group's H term micro-quantized; textbook tie correction. */
  val q231 = Declared(
    "q231_kruskal_wallis", "A-stat",
    (s, dir) => Aggregates.kruskalWallis(Tables.lineitem(s, dir),
      col("l_quantity"), col("l_returnflag")),
    Some("""WITH d AS (SELECT l_returnflag AS g, l_quantity AS v FROM lineitem),
           |pgv AS (SELECT g, v, count(*) AS c FROM d GROUP BY g, v),
           |pv AS (SELECT v, sum(c) AS cv FROM pgv GROUP BY v),
           |rk AS (
           |  SELECT v, 2 * coalesce(sum(cv) OVER (ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |    + cv + 1 AS rank2
           |  FROM pv),
           |grp AS (
           |  SELECT g, CAST(sum(c) AS HUGEINT) AS ni,
           |    CAST(sum(CAST(c AS HUGEINT) * rank2) AS HUGEINT) AS r2
           |  FROM pgv JOIN rk USING (v) GROUP BY g),
           |tot AS (SELECT CAST(sum(ni) AS HUGEINT) AS n,
           |               count(*) AS k FROM grp),
           |tie AS (SELECT CAST(sum(CAST(cv AS HUGEINT) * cv * cv - cv)
           |          AS HUGEINT) AS t FROM pv),
           |term AS (
           |  SELECT CAST(round(3.0 * CAST(r2 * r2 AS DOUBLE) /
           |      (CAST(n * (n + 1) AS DOUBLE) * CAST(ni AS DOUBLE)) * 1e6, 0)
           |    AS BIGINT) AS tu
           |  FROM grp CROSS JOIN tot)
           |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           |  CAST(t AS BIGINT) AS tie_sum,
           |  round((CAST(sum(tu) AS DOUBLE) / 1e6 -
           |         3.0 * CAST(n + 1 AS DOUBLE)) /
           |        (1.0 - CAST(t AS DOUBLE) /
           |         CAST(n * n * n - n AS DOUBLE)), 6) AS h
           |FROM term CROSS JOIN tot CROSS JOIN tie
           |GROUP BY k, n, t""".stripMargin),
    "Ranks come from the distinct-value rollup (50 quantity values) — the " +
      "ordered window never touches the fact table; the (group, value) rollup " +
      "joins the value ranks broadcast and the H finish is a k-row agg. One " +
      "fact pass at any volume, exactly q152's shape generalized to k groups.")

  /** q232 — A-stat: Wilcoxon signed-rank over within-order pairs —
    * does the even-line half of an order carry more quantity than the
    * odd-line half? Pairs are per-order integer sums (exact), zero
    * diffs drop per the textbook convention, |d| midranks are doubled
    * ints off the distinct-|d| rollup, and the normal-approximation z
    * (tie-corrected) is one pinned IEEE finish. */
  val q232 = Declared(
    "q232_wilcoxon_signed_rank", "A-stat",
    (s, dir) => Aggregates.wilcoxonSignedRank(
      Tables.lineitem(s, dir).groupBy(col("l_orderkey")).agg(
        sum(when(col("l_linenumber") % 2 === 1,
          col("l_quantity").cast("long")).otherwise(0L)).as("x"),
        sum(when(col("l_linenumber") % 2 === 0,
          col("l_quantity").cast("long")).otherwise(0L)).as("y")),
      col("x"), col("y")),
    Some("""WITH p AS (
           |  SELECT l_orderkey,
           |    CAST(sum(CASE WHEN l_linenumber % 2 = 1
           |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
           |    CAST(sum(CASE WHEN l_linenumber % 2 = 0
           |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS y
           |  FROM lineitem GROUP BY l_orderkey),
           |dd AS (SELECT y - x AS d FROM p WHERE y - x <> 0),
           |ad AS (SELECT abs(d) AS ad,
           |              CASE WHEN d > 0 THEN 1 ELSE 0 END AS pos FROM dd),
           |pa AS (SELECT ad, count(*) AS c, sum(pos) AS cp
           |       FROM ad GROUP BY ad),
           |rk AS (
           |  SELECT ad, c, cp, 2 * coalesce(sum(c) OVER (ORDER BY ad
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |    + c + 1 AS rank2
           |  FROM pa),
           |a AS (
           |  SELECT CAST(sum(c) AS BIGINT) AS n,
           |    CAST(sum(cp) AS BIGINT) AS n_pos,
           |    CAST(sum(CAST(cp AS HUGEINT) * rank2) AS HUGEINT) AS w2,
           |    CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT) AS t
           |  FROM rk)
           |SELECT n, n_pos, CAST(w2 AS BIGINT) AS w2_plus,
           |  round((CAST(w2 AS DOUBLE) -
           |         CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE) / 2.0) /
           |        (2.0 * sqrt(CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE) *
           |           CAST(2 * n + 1 AS DOUBLE) / 24.0 -
           |           CAST(t AS DOUBLE) / 48.0)), 6) AS z
           |FROM a""".stripMargin),
    "The pairing agg is one order-keyed pass with map-side combine; the |d| " +
      "rollup is value-domain-bounded, so the ordered rank window never sees " +
      "the pair table. The paired readout for before/after comparisons where " +
      "the t-test's normality assumption fails.")

  /** q233 — A-stat/E4: Cohen's κ between two document-quality raters —
    * a char-length gate vs a whitespace-count (word-count proxy) gate.
    * The chance-corrected agreement check run before trusting any
    * single labeling pass; both raters are plain column predicates the
    * oracle states verbatim. */
  val q233 = Declared(
    "q233_cohens_kappa", "A-stat,E4",
    (s, dir) => Evaluation.cohensKappa(Tables.documents(s, dir),
      when(col("n_chars") >= 300, "keep").otherwise("drop"),
      when(length(col("text")) - length(replace(col("text"), lit(" "), lit(""))) >= 49,
        "keep").otherwise("drop")),
    Some("""WITH r AS (
           |  SELECT CASE WHEN n_chars >= 300 THEN 'keep' ELSE 'drop' END AS a,
           |    CASE WHEN length(text) - length(replace(text, ' ', '')) >= 49
           |         THEN 'keep' ELSE 'drop' END AS b
           |  FROM documents),
           |obs AS (SELECT a, b, count(*) AS o FROM r GROUP BY a, b),
           |rm AS (SELECT a, sum(o) AS ra FROM obs GROUP BY a),
           |cm AS (SELECT b, sum(o) AS cb FROM obs GROUP BY b),
           |pe AS (SELECT CAST(coalesce(sum(CAST(ra AS HUGEINT) * cb), 0)
           |         AS HUGEINT) AS rc
           |       FROM rm JOIN cm ON rm.a = cm.b),
           |ag AS (SELECT CAST(sum(o) AS HUGEINT) AS n,
           |  CAST(coalesce(sum(CASE WHEN a = b THEN o END), 0) AS HUGEINT) AS d
           |  FROM obs)
           |SELECT CAST(n AS BIGINT) AS n, CAST(d AS BIGINT) AS n_agree,
           |  round(CAST(d AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_o,
           |  round(CAST(rc AS DOUBLE) / CAST(n * n AS DOUBLE), 6) AS p_e,
           |  round(CAST(n * d - rc AS DOUBLE) /
           |        CAST(n * n - rc AS DOUBLE), 6) AS kappa
           |FROM ag CROSS JOIN pe""".stripMargin),
    "One contingency agg with map-side combine plus two label-sized rollups " +
      "of it — the fact table is read once at any volume. The agreement gate " +
      "every multi-annotator labeling pipeline runs before averaging raters.")

  /** q234 — E2+/ML: Adamic–Adar link prediction on the order–part
    * incidence — which part pairs share unusually SELECTIVE baskets?
    * Each co-ordering basket contributes 1/ln(degree), nano-quantized
    * per basket (one ln per basket, not per pair), so the pair score
    * is a plain long sum. Top-30 scored pairs, fully tie-broken. */
  val q234 = Declared(
    "q234_adamic_adar", "E2+,ML",
    (s, dir) => Graph.adamicAdar(Tables.lineitem(s, dir),
      col("l_orderkey"), col("l_partkey"), topK = 30),
    Some("""WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
           |           FROM lineitem),
           |deg AS (SELECT bk, count(*) AS dg FROM b GROUP BY bk
           |        HAVING count(*) BETWEEN 2 AND 1000),
           |w AS (SELECT bk, CAST(round(1e9 / ln(CAST(dg AS DOUBLE)), 0)
           |        AS BIGINT) AS wt FROM deg),
           |p AS (
           |  SELECT a.it AS item_a, b2.it AS item_b,
           |    CAST(count(*) AS BIGINT) AS n_common,
           |    CAST(sum(wt) AS BIGINT) AS aa_nano
           |  FROM b a JOIN b b2 ON a.bk = b2.bk AND a.it < b2.it
           |  JOIN w ON w.bk = a.bk
           |  GROUP BY 1, 2)
           |SELECT item_a, item_b, n_common, aa_nano FROM p
           |ORDER BY aa_nano DESC, item_a, item_b LIMIT 30""".stripMargin),
    "deg is basket-grain, so the weight joins as a plain shuffle equi-join " +
      "(never broadcast) and semi-filters the pair explode to gated baskets; " +
      "the pair space is Σ deg² with deg capped — linear in baskets, never " +
      "|items|². TakeOrdered serves the top-k with per-partition heaps.")

  /** q235 — A-stat/ML: UCB1 scoring of order priorities as bandit
    * arms with fulfillment (status 'F') as reward — the deterministic
    * re-ranking step a batch allocator runs over yesterday's logs.
    * Exact pull/win counts; mean + optimism bonus ppm-rounded. */
  val q235 = Declared(
    "q235_ucb1", "A-stat,ML",
    (s, dir) => Experimentation.ucb1(Tables.orders(s, dir),
      col("o_orderpriority"), col("o_orderstatus") === "F")
      .orderBy(col("ucb_rank")),
    Some("""WITH arms AS (
           |  SELECT o_orderpriority AS arm, CAST(count(*) AS BIGINT) AS pulls,
           |    CAST(sum(CASE WHEN o_orderstatus = 'F'
           |      THEN 1 ELSE 0 END) AS BIGINT) AS wins
           |  FROM orders GROUP BY 1),
           |tot AS (SELECT CAST(sum(pulls) AS BIGINT) AS t FROM arms),
           |sc AS (
           |  SELECT arm, pulls, wins,
           |    CAST(round(CAST(wins AS DOUBLE) / CAST(pulls AS DOUBLE)
           |      * 1e6, 0) AS BIGINT) AS mean_ppm,
           |    CAST(round((CAST(wins AS DOUBLE) / CAST(pulls AS DOUBLE) +
           |      sqrt(2.0 * ln(CAST(t AS DOUBLE)) / CAST(pulls AS DOUBLE)))
           |      * 1e6, 0) AS BIGINT) AS ucb_ppm
           |  FROM arms CROSS JOIN tot)
           |SELECT arm, pulls, wins, mean_ppm, ucb_ppm,
           |  CAST(row_number() OVER (ORDER BY ucb_ppm DESC, arm) AS BIGINT)
           |    AS ucb_rank
           |FROM sc ORDER BY ucb_rank""".stripMargin),
    "One arm-grain agg with map-side combine, a 1-row total broadcast, an " +
      "|arms|-row ranking window. The allocation scorer stays one fact pass " +
      "no matter how many exposures the log holds.")

  /** q236 — A-stat: group-sequential monitoring over seven yearly
    * looks — even- vs odd-customer order cohorts, high-priority share
    * as the metric, an O'Brien–Fleming-shaped boundary
    * z_final·√(K/k). Cumulative counts ride a K-row rollup window;
    * each look's pooled two-proportion z is a pinned IEEE finish over
    * exact cumulative counts. The A/A shape: no look should cross. */
  val q236 = Declared(
    "q236_sequential_bound", "A-stat",
    (s, dir) => Experimentation.sequentialBoundary(Tables.orders(s, dir),
      year(col("o_orderdate")), col("o_custkey") % 2 === 0,
      col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .orderBy(col("look")),
    Some("""WITH lk AS (
           |  SELECT CAST(year(o_orderdate) AS BIGINT) AS look,
           |    CAST(sum(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS na,
           |    CAST(sum(CASE WHEN o_custkey % 2 <> 0 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS nb,
           |    CAST(sum(CASE WHEN o_custkey % 2 = 0 AND o_orderpriority IN
           |      ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           |    CAST(sum(CASE WHEN o_custkey % 2 <> 0 AND o_orderpriority IN
           |      ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS cb
           |  FROM orders GROUP BY 1),
           |c AS (
           |  SELECT look,
           |    CAST(sum(na) OVER w AS BIGINT) AS n_a,
           |    CAST(sum(nb) OVER w AS BIGINT) AS n_b,
           |    CAST(sum(ca) OVER w AS BIGINT) AS conv_a,
           |    CAST(sum(cb) OVER w AS BIGINT) AS conv_b,
           |    row_number() OVER (ORDER BY look) AS k,
           |    count(*) OVER () AS kmax
           |  FROM lk
           |  WINDOW w AS (ORDER BY look
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           |SELECT look, n_a, n_b, conv_a, conv_b,
           |  (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
           |         CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
           |    sqrt(CAST(conv_a + conv_b AS DOUBLE) /
           |           (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) *
           |         (1.0 - CAST(conv_a + conv_b AS DOUBLE) /
           |           (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) *
           |         (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
           |    AS z,
           |  1.96 * sqrt(CAST(kmax AS DOUBLE) / CAST(k AS DOUBLE)) AS boundary,
           |  abs((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
           |         CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
           |    sqrt(CAST(conv_a + conv_b AS DOUBLE) /
           |           (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) *
           |         (1.0 - CAST(conv_a + conv_b AS DOUBLE) /
           |           (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) *
           |         (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))) >=
           |  1.96 * sqrt(CAST(kmax AS DOUBLE) / CAST(k AS DOUBLE))
           |    AS crossed
           |FROM c ORDER BY look""".stripMargin),
    "One (look, arm) agg over the exposures; the cumulative window runs over " +
      "the K-row look rollup, never the fact table. The peeking-safe readout " +
      "that lets an experiment platform look every day without inflating " +
      "false positives.")

  val all: Seq[Declared] = Seq(q231, q232, q233, q234, q235, q236)
}
