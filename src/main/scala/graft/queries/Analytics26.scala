package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, Experimentation}
import LlmExt2.duckMd5Hash60

/** Round-5 batch 46: quantile treatment effects and the deterministic
  * Poisson bootstrap. */
object Analytics26 {

  /** q338 — A-causal: quantile treatment effects of line-item quantity
    * between returned (R) and accepted (A) items at the quartiles —
    * where in the distribution does the shift live. Exact order
    * statistics; integer differences. */
  val q338 = Declared(
    "q338_qte", "A-causal",
    (s, dir) => Experimentation.quantileTreatmentEffects(
        Tables.lineitem(s, dir), col("l_quantity"), col("l_returnflag"),
        "A", "R", Seq(250000L, 500000L, 750000L))
      .orderBy(col("q_ppm")),
    Some("""WITH d AS (
           |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
           |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
           |pv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
           |       FROM d GROUP BY g, v),
           |c AS (
           |  SELECT g, v, c,
           |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS ct,
           |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
           |  FROM pv),
           |q AS (
           |  SELECT g, max(n) AS n,
           |    min(CASE WHEN ct >= (n * 250000 + 999999) // 1000000
           |      THEN v END) AS q25,
           |    min(CASE WHEN ct >= (n * 500000 + 999999) // 1000000
           |      THEN v END) AS q50,
           |    min(CASE WHEN ct >= (n * 750000 + 999999) // 1000000
           |      THEN v END) AS q75
           |  FROM c GROUP BY g),
           |j AS (
           |  SELECT a.n AS n_a, b.n AS n_b,
           |    a.q25 AS a25, a.q50 AS a50, a.q75 AS a75,
           |    b.q25 AS b25, b.q50 AS b50, b.q75 AS b75
           |  FROM (SELECT * FROM q WHERE g = 'A') a,
           |       (SELECT * FROM q WHERE g = 'R') b)
           |SELECT 250000 AS q_ppm, n_a, n_b, a25 AS v_a, b25 AS v_b,
           |  a25 - b25 AS qte FROM j
           |UNION ALL
           |SELECT 500000, n_a, n_b, a50, b50, a50 - b50 FROM j
           |UNION ALL
           |SELECT 750000, n_a, n_b, a75, b75, a75 - b75 FROM j
           |ORDER BY q_ppm""".stripMargin),
    "One (arm, value) agg + arm-partitioned cumulative windows — the q152 " +
      "envelope. A zero mean-difference can hide a +tail/-head swap; the " +
      "quartile readout sees it.")

  /** q339 — A-stat: deterministic Poisson-bootstrap SE of mean order
    * value — md5-hash resample weights at the literal Poisson(1) CDF,
    * 50 replicates; both engines draw the identical resamples. */
  val q339 = Declared(
    "q339_poisson_bootstrap", "A-stat",
    (s, dir) => Aggregates.poissonBootstrapSE(
      Tables.orders(s, dir)
        .withColumn("cents", expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")),
      col("o_orderkey"), col("cents"), nReps = 50),
    Some(s"""WITH base AS (
            |  SELECT CAST(o_orderkey AS VARCHAR) AS id,
            |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
            |  FROM orders),
            |pe AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n_units,
            |    (1000000 * CAST(sum(y) AS BIGINT)) // count(*) AS mean_micro
            |  FROM base),
            |reps AS (
            |  SELECT b, y,
            |    ${duckMd5Hash60("id || ':' || CAST(b AS VARCHAR)")} % 1000000
            |      AS u
            |  FROM base, (SELECT unnest(range(1, 51)) AS b)),
            |w AS (
            |  SELECT b, y,
            |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
            |         WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
            |         WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
            |         WHEN u < 999917 THEN 6 ELSE 7 END AS w
            |  FROM reps),
            |pr AS (
            |  SELECT b, CAST(sum(w * y) AS BIGINT) AS wy,
            |    CAST(sum(w) AS BIGINT) AS ws
            |  FROM w GROUP BY b),
            |m AS (
            |  SELECT b, CASE WHEN ws > 0 THEN (1000000 * wy) // ws
            |    ELSE 0 END AS m
            |  FROM pr),
            |se AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n_reps,
            |    sqrt(CAST(CAST(count(*) AS HUGEINT) *
            |        sum(CAST(m AS HUGEINT) * m) -
            |        CAST(sum(CAST(m AS HUGEINT)) AS HUGEINT) *
            |        sum(CAST(m AS HUGEINT)) AS DOUBLE) /
            |      CAST(CAST(count(*) AS HUGEINT) *
            |        (CAST(count(*) AS HUGEINT) - 1) AS DOUBLE)) / 1e6 AS se
            |  FROM m)
            |SELECT pe.n_units, se.n_reps, pe.mean_micro, se.se
            |FROM pe CROSS JOIN se""".stripMargin),
    "The explode is |units| x B scan-side rows collapsing to B replicate " +
      "means via one map-side-combined agg — the coordination-free bootstrap " +
      "that actually runs at 100 TB. The SE for statistics with no closed " +
      "form, reproducible to the bit across engines and reruns.")

  val all: Seq[Declared] = Seq(q338, q339)
}
