package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Experimentation

/** Round-5 batch 48: doubly-robust off-policy value and anytime-valid
  * confidence sequences. */
object Analytics28 {

  /** q342 — A-causal: doubly-robust value of the "high-priority"
    * target policy from logged orders — uniform 1/5 logging
    * propensities, a deliberately crude value model (half the spend),
    * DM/IPS/DR side by side. Exact integer micro accounting. */
  val q342 = Declared(
    "q342_doubly_robust", "A-causal",
    (s, dir) => Experimentation.doublyRobustValue(
      Tables.orders(s, dir)
        .withColumn("cents", expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .withColumn("match", col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .withColumn("p_ppm", lit(400000L)) // P(logged in target set) = 2/5
        .withColumn("qhat", expr("cents div 2")),
      col("match"), col("p_ppm"), col("cents"), col("qhat"), col("qhat")),
    Some("""WITH u AS (
           |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS m
           |  FROM orders),
           |t AS (
           |  SELECT cents // 2 AS qt,
           |    CASE WHEN m THEN ((cents - cents // 2) * 1000000) // 400000
           |      ELSE 0 END AS corr,
           |    CASE WHEN m THEN (cents * 1000000) // 400000 ELSE 0 END AS ips
           |  FROM u)
           |SELECT CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(qt) AS BIGINT) // count(*) AS dm_micro,
           |  CAST(sum(ips) AS BIGINT) // count(*) AS ips_micro,
           |  (CAST(sum(qt) AS BIGINT) + CAST(sum(corr) AS BIGINT)) // count(*)
           |    AS dr_micro
           |FROM t""".stripMargin),
    "One unit-grain agg with map-side combine. The counterfactual readout " +
      "that stays unbiased if EITHER the value model or the propensities are " +
      "right — and prints DM and IPS beside it so disagreement is visible.")

  /** q343 — A-stat: anytime-valid confidence sequence for mean order
    * value (cents) over yearly looks — Robbins' normal-mixture
    * boundary, valid at every look simultaneously. Unrounded pinned
    * chain over exact cumulative sums. */
  val q343 = Declared(
    "q343_confidence_seq", "A-stat",
    (s, dir) => Experimentation.confidenceSequence(
        Tables.orders(s, dir), year(col("o_orderdate")),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"),
        alpha = 0.05, rho = 1.0)
      .orderBy(col("look")),
    Some("""WITH lk AS (
           |  SELECT CAST(year(o_orderdate) AS BIGINT) AS look,
           |    CAST(count(*) AS BIGINT) AS cn,
           |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |      AS HUGEINT) AS cs,
           |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) *
           |      CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS HUGEINT)
           |      AS cq
           |  FROM orders GROUP BY 1),
           |c AS (
           |  SELECT look,
           |    sum(cn) OVER w AS n, sum(cs) OVER w AS s, sum(cq) OVER w AS q
           |  FROM lk WINDOW w AS (ORDER BY look
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |f AS (
           |  SELECT look, CAST(n AS BIGINT) AS n,
           |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           |    sqrt(CAST(CAST(n AS HUGEINT) * q - s * s AS DOUBLE) /
           |      CAST(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) - 1)
           |        AS DOUBLE)) *
           |    sqrt(((CAST(n AS DOUBLE) + 1.0) /
           |        (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) *
           |      -- the divisor is the IEEE PRODUCT rho*alpha*alpha, not the
           |      -- decimal literal 0.0025 (they differ in the last ulp)
           |      ln((CAST(n AS DOUBLE) + 1.0) / (1.0 * 0.05 * 0.05))) AS radius
           |  FROM c)
           |SELECT look, n, mean, radius,
           |  mean - radius AS ci_lo, mean + radius AS ci_hi
           |FROM f ORDER BY look""".stripMargin),
    "One look-keyed agg; cumulation over the K-row rollup. The CI a " +
      "dashboard may refresh on every page load with total error still " +
      "bounded — no peeking penalty, no fixed look schedule.")

  /** q344 — A-eval: rank-biased overlap (p = 0.9, depth 10) between
    * two document rankings — by character count vs by token count.
    * Exact prefix intersections via the max-rank rollup; per-depth
    * literal weights shared bit-for-bit with the oracle. */
  val q344 = Declared(
    "q344_rank_biased_overlap", "A-eval",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.plans.Guardrails.expect("single_partition_window",
        "doc_id, n_chars", "q344: 500-doc corpus ranking (bounded)",
    "k-literal")
      graft.plans.Guardrails.expect("single_partition_window",
        "doc_id, n_toks", "q344: 500-doc corpus ranking (bounded)",
    "k-literal")
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          size(expr("filter(split(lower(text), '\\\\s+'), x -> x <> '')"))
            .cast("long").as("n_toks"))
      val runA = d.select(col("doc_id"), row_number().over(
        Window.orderBy(col("n_chars").desc, col("doc_id").asc))
        .cast("long").as("rank_chars"))
      val runB = d.select(col("doc_id"), row_number().over(
        Window.orderBy(col("n_toks").desc, col("doc_id").asc))
        .cast("long").as("rank_toks"))
      graft.ops.Evaluation.rankBiasedOverlap(
        runA.withColumnRenamed("rank_chars", "rank"),
        runB.withColumnRenamed("rank_toks", "rank"), "doc_id", "rank",
        0.9, 10)
    },
    Some(s"""WITH a AS (
            |  SELECT doc_id,
            |    row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS ra
            |  FROM documents),
            |b AS (
            |  SELECT doc_id,
            |    row_number() OVER (ORDER BY len(list_filter(
            |      regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))
            |      DESC, doc_id ASC) AS rb
            |  FROM documents),
            |mm AS (
            |  SELECT greatest(ra, rb) AS m
            |  FROM a JOIN b USING (doc_id)
            |  WHERE ra <= 10 AND rb <= 10),
            |mc AS (SELECT m, CAST(count(*) AS BIGINT) AS c FROM mm GROUP BY m),
            |xd AS (
            |  SELECT d, coalesce(c, 0) AS c,
            |    sum(coalesce(c, 0)) OVER (ORDER BY d
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x
            |  FROM (SELECT unnest(range(1, 11)) AS d)
            |  LEFT JOIN mc ON mc.m = d)
            |SELECT CAST(10 AS BIGINT) AS depth,
            |  CAST(max(x) AS BIGINT) AS n_common,
            |  CAST(sum(CAST(round((${graft.ops.Evaluation.rboWeightCase(0.9, 10, "d")})
            |    * CAST(x AS DOUBLE) / CAST(d AS DOUBLE) * 1e9, 0) AS BIGINT))
            |    AS BIGINT) AS rbo_nano
            |FROM xd""".stripMargin),
    "One equi-join on the item id + a D-row rollup; D is a constant. The " +
      "'did the ranker change page one' number — top-weighted where " +
      "Kendall/Spearman are not, truncated where production lists truncate.")

  val all: Seq[Declared] = Seq(q342, q343, q344)
}
