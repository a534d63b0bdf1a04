package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, EventAnalytics, Features}

/** Round-4 batch 34: unit-true distribution drift (Wasserstein-1),
  * inventory/corpus value classification (ABC), tail-aware normality
  * (Anderson–Darling), Poisson-model auditing (overdispersion),
  * small-sample rate repair (empirical-Bayes shrinkage) and funnel
  * leak significance. Exactness discipline unchanged. */
object Analytics16 {

  /** q285 — A-stat/E6: 1-Wasserstein drift of order value ($1000
    * units), pre-1998 vs 1998+ — drift in DOLLARS of moved mass, the
    * unit-legible member of the drift family (KS q154 = worst gap,
    * PSI q267 = nats). All-integer until one final division. */
  val q285 = Declared(
    "q285_wasserstein", "A-stat,E6",
    (s, dir) => Aggregates.wasserstein1(
      Tables.orders(s, dir)
        .withColumn("__v",
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
            " div 100000"))
        .withColumn("__s",
          when(year(col("o_orderdate")) < 1998, "ref").otherwise("cur")),
      col("__v"), col("__s"), "ref", "cur"),
    Some("""WITH o AS (
           |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT) // 100000 AS v,
           |    CASE WHEN year(o_orderdate) < 1998 THEN 'ref' ELSE 'cur' END
           |      AS s
           |  FROM orders),
           |r AS (SELECT v,
           |    CAST(sum(CASE WHEN s = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS ca,
           |    CAST(sum(CASE WHEN s = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS cb
           |  FROM o GROUP BY 1),
           |c AS (SELECT v, ca, cb,
           |    CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
           |    CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb,
           |    lead(v) OVER (ORDER BY v) - v AS gap,
           |    CAST(sum(ca) OVER () AS BIGINT) AS na,
           |    CAST(sum(cb) OVER () AS BIGINT) AS nb
           |  FROM r),
           |t AS (SELECT na, nb,
           |    CASE WHEN gap IS NOT NULL THEN
           |      abs(CAST(cuma AS HUGEINT) * nb -
           |          CAST(cumb AS HUGEINT) * na) * gap
           |    ELSE 0 END AS term
           |  FROM c),
           |g AS (SELECT max(na) AS na2, max(nb) AS nb2,
           |    CAST(count(*) AS BIGINT) AS n_values,
           |    CAST(sum(term) AS HUGEINT) AS num FROM t)
           |SELECT na2 AS n_a, nb2 AS n_b, n_values,
           |  round(CAST(num AS DOUBLE) /
           |    CAST(CAST(na2 AS HUGEINT) * nb2 AS DOUBLE), 6) AS w1
           |FROM g""".stripMargin),
    "One distinct-value rollup agg with map-side combine + rollup-sized " +
      "prefix/lead windows (the q154 envelope); values pre-quantized to " +
      "keep the rollup domain-bounded. Drift with units a human can act " +
      "on.")

  /** q286 — A1/E6: ABC classification of parts by revenue — integer
    * crossing thresholds at 80/95% of cumulative cent share under the
    * (value desc, key asc) total order. The inventory-policy cut, and
    * the per-source curation-effort cut for a corpus. */
  val q286 = Declared(
    "q286_abc_classes", "A1,E6",
    (s, dir) => Aggregates.abcClassification(Tables.lineitem(s, dir),
        col("l_partkey"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .orderBy(col("abc_class")),
    Some("""WITH i AS (
           |  SELECT l_partkey AS k,
           |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS val
           |  FROM lineitem GROUP BY 1),
           |c AS (SELECT k, val,
           |    CAST(coalesce(sum(val) OVER (ORDER BY val DESC, k
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS HUGEINT) AS cb,
           |    CAST(sum(val) OVER () AS HUGEINT) AS tot
           |  FROM i),
           |cl AS (SELECT CASE WHEN cb * 5 < tot * 4 THEN 'A'
           |    WHEN cb * 20 < tot * 19 THEN 'B' ELSE 'C' END AS abc_class,
           |    val FROM c),
           |g AS (SELECT abc_class, CAST(count(*) AS BIGINT) AS n_items,
           |    CAST(sum(val) AS BIGINT) AS class_value FROM cl GROUP BY 1)
           |SELECT abc_class, n_items, class_value,
           |  CAST((CAST(class_value AS HUGEINT) * 1000000) //
           |    (sum(class_value) OVER ()) AS BIGINT) AS share_ppm
           |FROM g ORDER BY abc_class""".stripMargin),
    "One part-grain agg with map-side combine, then an |items|-row ranked " +
      "prefix window (the q162 altitude). Tight control for the A tail, " +
      "bulk rules for C — the classifier view of q276's Lorenz curve.")

  /** q287 — A-stat: Anderson–Darling normality of monthly order
    * counts — tail-weighted, so heavy months fail it where KS shrugs.
    * Φ via the A&S 7.1.26 polynomial (the q220 device), per-rank
    * nano-quantized terms, Stephens' A*² vs the 0.752 literal. */
  val q287 = Declared(
    "q287_anderson_darling", "A-stat",
    (s, dir) => Aggregates.andersonDarling(
      Tables.orders(s, dir)
        .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("t"))
        .agg(count(lit(1)).as("v")), col("v")),
    Some("""WITH s0 AS (
           |  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
           |    AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1),
           |vals AS (SELECT v FROM s0),
           |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(v) AS HUGEINT) AS s,
           |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
           |  FROM vals),
           |mm AS (SELECT n,
           |    round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 12) AS mean,
           |    round(sqrt(CAST(n * q - s * s AS DOUBLE) /
           |      CAST(n * (n - 1) AS DOUBLE)), 12) AS sd
           |  FROM m),
           |r AS (SELECT v, row_number() OVER (ORDER BY v) AS i FROM vals),
           |z AS (SELECT i, CAST(n AS BIGINT) AS n, mean, sd,
           |    (CAST(v AS DOUBLE) - mean) / sd AS z
           |  FROM r CROSS JOIN mm),
           |p1 AS (SELECT i, n, mean, sd, z, abs(z) / sqrt(2.0) AS xa FROM z),
           |p2 AS (SELECT i, n, mean, sd, z, xa,
           |    1.0 / (1.0 + 0.3275911 * xa) AS tt FROM p1),
           |p3 AS (SELECT i, n, mean, sd, z,
           |    (((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
           |      - 0.284496736) * tt + 0.254829592) * tt) * exp(-(xa * xa))
           |      AS pc
           |  FROM p2),
           |ph AS (SELECT i, n, mean, sd,
           |    CASE WHEN z >= 0 THEN 1.0 - pc / 2 ELSE pc / 2 END AS phi
           |  FROM p3),
           |tn AS (SELECT n, mean, sd,
           |    CAST(round((CAST(i * 2 - 1 AS DOUBLE) *
           |        ln(greatest(phi, 1e-300)) +
           |      CAST((n - i) * 2 + 1 AS DOUBLE) *
           |        ln(greatest(1.0 - phi, 1e-300))) * 1e9, 0)
           |      AS BIGINT) AS term
           |  FROM ph),
           |g AS (SELECT max(n) AS n2, max(mean) AS m2, max(sd) AS sd2,
           |    CAST(sum(term) AS BIGINT) AS sn FROM tn),
           |f AS (SELECT n2, m2, sd2,
           |    -CAST(n2 AS DOUBLE) - (CAST(sn AS DOUBLE) / 1e9) /
           |      CAST(n2 AS DOUBLE) AS a2
           |  FROM g),
           |f2 AS (SELECT n2, m2, sd2, a2,
           |    a2 * (1.0 + 0.75 / CAST(n2 AS DOUBLE) +
           |      2.25 / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE))) AS a2s
           |  FROM f)
           |SELECT n2 AS n, round(m2, 6) AS mean, round(sd2, 6) AS sd,
           |  round(a2, 6) AS a2, round(a2s, 6) AS a2_star,
           |  round(a2s, 6) > 0.752 AS non_normal
           |FROM f2""".stripMargin),
    "Moments and ranks run over the month rollup (calendar-bounded); " +
      "ranks come from the distributed global row number, ties rank-set-" +
      "invariant. The gate before any ±kσ rule: q115's flags and q263's " +
      "limits silently assume what this test checks.")

  /** q288 — A-stat: Poisson overdispersion audit of daily order
    * counts per priority class — D = s²/x̄ with the √(2χ²) normal
    * approximation. Decides whether Poisson alert thresholds are
    * valid per series. */
  val q288 = Declared(
    "q288_overdispersion", "A-stat",
    (s, dir) => Aggregates.overdispersionAudit(
        Tables.orders(s, dir)
          .groupBy(col("o_orderpriority").as("pri"), col("o_orderdate"))
          .agg(count(lit(1)).as("c")),
        Seq(col("pri")), col("c"))
      .orderBy(col("pri")),
    Some("""WITH d AS (
           |  SELECT o_orderpriority AS pri, o_orderdate,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM orders GROUP BY 1, 2),
           |g AS (SELECT pri, CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(c) AS HUGEINT) AS s,
           |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q
           |  FROM d GROUP BY 1),
           |f AS (SELECT pri, n,
           |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           |    (CAST(n * q - s * s AS DOUBLE) /
           |     CAST(n * (n - 1) AS DOUBLE)) /
           |      (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS disp
           |  FROM g WHERE n > 1 AND s > 0),
           |f2 AS (SELECT pri, n, mean, disp,
           |    (CAST(n AS DOUBLE) - 1.0) * disp AS chi2 FROM f),
           |f3 AS (SELECT pri, n, mean, disp, chi2,
           |    sqrt(2.0 * chi2) - sqrt(2.0 * (CAST(n AS DOUBLE) - 1.0) - 1.0)
           |      AS z
           |  FROM f2)
           |SELECT pri, CAST(n AS BIGINT) AS n, round(mean, 6) AS mean,
           |  round(disp, 6) AS dispersion, round(chi2, 6) AS chi2,
           |  round(z, 6) AS z, round(z, 6) > 1.644854 AS overdispersed
           |FROM f3 ORDER BY pri""".stripMargin),
    "One day-grain rollup then a priority-grain moment agg — both " +
      "map-side combinable. Overdispersed series need negative-binomial " +
      "thresholds; Poisson alerts on them page people at 3am for noise.")

  /** q289 — ML/A-stat: empirical-Bayes shrinkage of per-supplier
    * return rates — moment-matched Beta prior over suppliers with
    * ≥ 20 lines, posterior-mean rates for ALL suppliers. Fixes the
    * '1-of-2 lines returned = 50% defect supplier' ranking artifact. */
  val q289 = Declared(
    "q289_eb_shrinkage", "ML,A-stat",
    (s, dir) => Features.ebShrinkage(Tables.lineitem(s, dir),
        Seq(col("l_suppkey")), col("l_returnflag") === "R", minN = 20L)
      .orderBy(col("l_suppkey")),
    Some("""WITH g AS (
           |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS successes
           |  FROM lineitem GROUP BY 1),
           |g2 AS (SELECT *, (successes * 1000000) // n AS raw_ppm FROM g),
           |fit0 AS (SELECT CAST(count(*) AS HUGEINT) AS k,
           |    CAST(sum(raw_ppm) AS HUGEINT) AS sr,
           |    CAST(sum(CAST(raw_ppm AS HUGEINT) * raw_ppm) AS HUGEINT)
           |      AS qr
           |  FROM g2 WHERE n >= 20),
           |fit1 AS (SELECT
           |    CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) / 1e6 AS m,
           |    CAST(k * qr - sr * sr AS DOUBLE) /
           |      CAST(k * (k - 1) AS DOUBLE) / 1e12 AS var
           |  FROM fit0),
           |fit2 AS (SELECT m, var,
           |    CASE WHEN var > 0 THEN m * (1.0 - m) / var - 1.0 END AS c
           |  FROM fit1),
           |fit AS (SELECT
           |    CASE WHEN c > 0 THEN m * c END AS alpha,
           |    CASE WHEN c > 0 THEN (1.0 - m) * c END AS beta
           |  FROM fit2)
           |SELECT l_suppkey, n, successes, raw_ppm,
           |  CASE WHEN alpha IS NOT NULL THEN
           |    CAST(round((CAST(successes AS DOUBLE) + alpha) /
           |      (CAST(n AS DOUBLE) + alpha + beta) * 1e6, 0) AS BIGINT)
           |  ELSE raw_ppm END AS shrunk_ppm,
           |  round(alpha, 6) AS alpha, round(beta, 6) AS beta
           |FROM g2 CROSS JOIN fit ORDER BY l_suppkey""".stripMargin),
    "One supplier-grain agg (map-side combine), a rollup-sized prior fit " +
      "and a broadcast-back scoring pass. The difference between ranking " +
      "suppliers by evidence and ranking them by sample-size noise.")

  /** q290 — A1/A-stat: view → click → purchase funnel with leak
    * significance — each transition's conversion plus a pooled
    * two-proportion z against the previous transition: 'step leaks
    * worse than the funnel's own baseline' is the actionable form. */
  val q290 = Declared(
    "q290_funnel_significance", "A1,A-stat",
    (s, dir) => EventAnalytics.funnelWithSignificance(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy(col("stage_from")),
    Some("""WITH f1 AS (
           |  SELECT user_id,
           |    min(CASE WHEN event_type = 'view' THEN ts END) AS t1
           |  FROM events GROUP BY 1),
           |f2 AS (
           |  SELECT e.user_id, f1.t1,
           |    min(CASE WHEN e.event_type = 'click' AND e.ts > f1.t1
           |      THEN e.ts END) AS t2
           |  FROM events e JOIN f1 ON f1.user_id = e.user_id GROUP BY 1, 2),
           |f3 AS (
           |  SELECT e.user_id, f2.t1, f2.t2,
           |    min(CASE WHEN e.event_type = 'purchase' AND e.ts > f2.t2
           |      THEN e.ts END) AS t3
           |  FROM events e JOIN f2 ON f2.user_id = e.user_id
           |  GROUP BY 1, 2, 3),
           |c AS (SELECT CAST(count(t1) AS BIGINT) AS c1,
           |    CAST(count(t2) AS BIGINT) AS c2,
           |    CAST(count(t3) AS BIGINT) AS c3 FROM f3),
           |t AS (SELECT 0 AS i, 'view' AS stage_from, 'click' AS stage_to,
           |    c1 AS entered, c2 AS converted FROM c
           |  UNION ALL SELECT 1, 'click', 'purchase', c2, c3 FROM c),
           |r AS (SELECT *,
           |    CASE WHEN entered > 0 THEN (converted * 1000000) // entered
           |      END AS rate_ppm,
           |    lag(entered) OVER (ORDER BY i) AS pe,
           |    lag(converted) OVER (ORDER BY i) AS pc FROM t)
           |SELECT stage_from, stage_to, entered, converted, rate_ppm,
           |  CASE WHEN pe IS NOT NULL AND entered > 0 AND pe > 0
           |      AND (converted + pc) > 0
           |      AND (converted + pc) < (entered + pe) THEN
           |    round((CAST(converted AS DOUBLE) / CAST(entered AS DOUBLE) -
           |           CAST(pc AS DOUBLE) / CAST(pe AS DOUBLE)) /
           |      sqrt((CAST(converted + pc AS DOUBLE) /
           |            (CAST(entered AS DOUBLE) + CAST(pe AS DOUBLE))) *
           |        (1.0 - CAST(converted + pc AS DOUBLE) /
           |            (CAST(entered AS DOUBLE) + CAST(pe AS DOUBLE))) *
           |        (1.0 / CAST(entered AS DOUBLE) +
           |         1.0 / CAST(pe AS DOUBLE))), 6)
           |  END AS z_vs_prev
           |FROM r ORDER BY stage_from""".stripMargin),
    "The q150 conditional-min kernel (one actor-keyed agg per stage) plus " +
      "a |stages|-row finish. Funnel counts without significance invite " +
      "fixing the wrong step; the z column points at the real leak.")

  val all: Seq[Declared] = Seq(q285, q286, q287, q288, q289, q290)
}
