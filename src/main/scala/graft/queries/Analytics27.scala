package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{EventAnalytics, Experimentation}

/** Round-5 batch 47: covariate balance diagnostics and restricted
  * mean survival time. */
object Analytics27 {

  /** q340 — A-causal: covariate balance (SMD) between customer-parity
    * arms over order count, spend and span — the comparability check
    * read before q314's ratio metric or q186's test. Unrounded
    * pinned-IEEE SMDs, 0.1 imbalance flag. */
  val q340 = Declared(
    "q340_covariate_balance", "A-causal",
    (s, dir) => Experimentation.covariateBalance(
        Tables.orders(s, dir).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))")
              .as("spend_cents"),
            datediff(max(col("o_orderdate")), min(col("o_orderdate")))
              .as("span_days"))
          .withColumn("arm",
            when(col("o_custkey") % 2 === 0, "even").otherwise("odd")),
        col("arm"), "even", "odd", Seq(
          "n_orders" -> col("n_orders"),
          "spend_cents" -> col("spend_cents"),
          "span_days" -> col("span_days")))
      .orderBy(col("covariate")),
    Some("""WITH u AS (
           |  SELECT o_custkey,
           |    CAST(count(*) AS BIGINT) AS x_n,
           |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS x_sp,
           |    CAST(max(o_orderdate)::DATE - min(o_orderdate)::DATE
           |      AS BIGINT) AS x_dd,
           |    CASE WHEN o_custkey % 2 = 0 THEN 'even' ELSE 'odd' END AS g
           |  FROM orders GROUP BY o_custkey),
           |m AS (
           |  SELECT g, CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(CAST(x_n AS HUGEINT)) AS HUGEINT) AS s1,
           |    CAST(sum(CAST(x_n AS HUGEINT) * x_n) AS HUGEINT) AS q1,
           |    CAST(sum(CAST(x_sp AS HUGEINT)) AS HUGEINT) AS s2,
           |    CAST(sum(CAST(x_sp AS HUGEINT) * x_sp) AS HUGEINT) AS q2,
           |    CAST(sum(CAST(x_dd AS HUGEINT)) AS HUGEINT) AS s3,
           |    CAST(sum(CAST(x_dd AS HUGEINT) * x_dd) AS HUGEINT) AS q3
           |  FROM u GROUP BY g),
           |j AS (
           |  SELECT a.n AS na, b.n AS nb,
           |    a.s1 AS sa1, a.q1 AS qa1, b.s1 AS sb1, b.q1 AS qb1,
           |    a.s2 AS sa2, a.q2 AS qa2, b.s2 AS sb2, b.q2 AS qb2,
           |    a.s3 AS sa3, a.q3 AS qa3, b.s3 AS sb3, b.q3 AS qb3
           |  FROM (SELECT * FROM m WHERE g = 'even') a,
           |       (SELECT * FROM m WHERE g = 'odd') b),
           |o AS (
           |  SELECT 'n_orders' AS covariate, na, nb,
           |    sa1 AS sa, qa1 AS qa, sb1 AS sb, qb1 AS qb FROM j
           |  UNION ALL
           |  SELECT 'span_days', na, nb, sa3, qa3, sb3, qb3 FROM j
           |  UNION ALL
           |  SELECT 'spend_cents', na, nb, sa2, qa2, sb2, qb2 FROM j)
           |SELECT covariate,
           |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           |  CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS mean_a,
           |  CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mean_b,
           |  (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) -
           |   CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) /
           |    sqrt((CAST(na * qa - sa * sa AS DOUBLE) /
           |            CAST(na * (na - 1) AS DOUBLE) +
           |          CAST(nb * qb - sb * sb AS DOUBLE) /
           |            CAST(nb * (nb - 1) AS DOUBLE)) / 2) AS smd,
           |  abs((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) -
           |   CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) /
           |    sqrt((CAST(na * qa - sa * sa AS DOUBLE) /
           |            CAST(na * (na - 1) AS DOUBLE) +
           |          CAST(nb * qb - sb * sb AS DOUBLE) /
           |            CAST(nb * (nb - 1) AS DOUBLE)) / 2)) > 0.1
           |    AS imbalanced
           |FROM o ORDER BY covariate""".stripMargin),
    "One unit-grain agg computes every covariate's sums in a single pass; " +
      "the finish is |covariates|-row arithmetic. The table every experiment " +
      "review opens with — if this is red, no downstream readout matters.")

  /** q341 — A-stat/A8: restricted mean survival time at a 30-day
    * horizon over the q163 churn cohort — the one-number LTV-horizon
    * summary of the KM curve, as an exact ppm-day step integral. */
  val q341 = Declared(
    "q341_rmst", "A-stat,A8",
    (s, dir) => {
      val per = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("fd"), max(to_date(col("ts"))).as("ld"))
      val subj = per
        .crossJoin(broadcast(per.agg(max(col("ld")).as("obs_end"))))
        .select(datediff(col("ld"), col("fd")).as("dur"),
          (col("ld") < date_sub(col("obs_end"), 5)).cast("int").as("churned"))
      EventAnalytics.rmst(subj, col("dur"), col("churned"), tau = 30L)
    },
    Some("""WITH RECURSIVE per AS (
           |  SELECT user_id, min(CAST(ts AS DATE)) AS fd,
           |    max(CAST(ts AS DATE)) AS ld
           |  FROM events GROUP BY 1),
           |oe AS (SELECT max(ld) AS obs_end FROM per),
           |subj AS (
           |  SELECT ld - fd AS dur,
           |    CASE WHEN ld < obs_end - 5 THEN 1 ELSE 0 END AS ev
           |  FROM per CROSS JOIN oe),
           |r AS (
           |  SELECT dur AS t, CAST(sum(ev) AS BIGINT) AS d,
           |    count(*) AS alln
           |  FROM subj GROUP BY 1),
           |w AS (
           |  SELECT t, d,
           |    CAST(sum(alln) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk,
           |    row_number() OVER (ORDER BY t) AS rn
           |  FROM r),
           |s AS (
           |  SELECT t, n_risk, d, rn,
           |    (1000000 * (n_risk - d)) // n_risk AS surv
           |  FROM w WHERE rn = 1
           |  UNION ALL
           |  SELECT w.t, w.n_risk, w.d, w.rn,
           |    (s.surv * (w.n_risk - w.d)) // w.n_risk
           |  FROM w JOIN s ON w.rn = s.rn + 1),
           |st AS (
           |  SELECT t, surv,
           |    least(coalesce(lead(t) OVER (ORDER BY t), 30), 30) AS nxt
           |  FROM s),
           |f AS (
           |  SELECT
           |    least(coalesce(min(t), 30), 30) AS first_t,
           |    coalesce(CAST(sum(surv * greatest(nxt - t, 0)) AS BIGINT), 0)
           |      AS tail
           |  FROM st WHERE t < 30)
           |SELECT CAST(30 AS BIGINT) AS tau,
           |  CAST(first_t * 1000000 + tail AS BIGINT) AS rmst_micro,
           |  CAST(first_t * 1000000 + tail AS DOUBLE) / 1e6 AS rmst
           |FROM f""".stripMargin),
    "The step integral runs over the KM rollup (calendar-bounded) — lead + " +
      "one sum. The number a retention team budgets with: expected active " +
      "days within the horizon, censoring handled correctly.")

  val all: Seq[Declared] = Seq(q340, q341)
}
