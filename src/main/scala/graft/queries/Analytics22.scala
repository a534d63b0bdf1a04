package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, EntityResolution, Experimentation}

/** Round-5 batch 41: robust / sequential / weighted-inference
  * additions — Cliff's delta effect size, Yuen trimmed-means t, Wald
  * SPRT, Fellegi–Sunter linkage weights, Kish effective sample size. */
object Analytics22 {

  /** q323 — A-stat: Cliff's delta of quantity between returned (R)
    * and accepted (A) line items — the ordinal effect size next to
    * q152's U test and q186's t. Exact pair counts from the
    * distinct-value rollup. */
  val q323 = Declared(
    "q323_cliffs_delta", "A-stat",
    (s, dir) => Aggregates.cliffsDelta(Tables.lineitem(s, dir),
      col("l_quantity"), col("l_returnflag"), "A", "R"),
    Some("""WITH d AS (
           |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
           |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
           |pv AS (
           |  SELECT v,
           |    CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           |    CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cb
           |  FROM d GROUP BY v),
           |c AS (
           |  SELECT v, ca, cb,
           |    coalesce(sum(cb) OVER (ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS cb_before
           |  FROM pv),
           |a AS (
           |  SELECT CAST(sum(ca) AS HUGEINT) AS n_a,
           |    CAST(sum(cb) AS HUGEINT) AS n_b,
           |    CAST(sum(CAST(ca AS HUGEINT) * cb_before) AS HUGEINT) AS gt,
           |    CAST(sum(CAST(ca AS HUGEINT) * cb) AS HUGEINT) AS tie
           |  FROM c)
           |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           |  CAST(gt AS BIGINT) AS gt_pairs,
           |  CAST(n_a * n_b - gt - tie AS BIGINT) AS lt_pairs,
           |  CAST(tie AS BIGINT) AS tie_pairs,
           |  CAST(CAST(gt AS BIGINT) - CAST(n_a * n_b - gt - tie AS BIGINT)
           |    AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS delta,
           |  CASE WHEN abs(CAST(CAST(gt AS BIGINT) -
           |        CAST(n_a * n_b - gt - tie AS BIGINT) AS DOUBLE) /
           |      CAST(n_a * n_b AS DOUBLE)) < 0.147 THEN 'negligible'
           |    WHEN abs(CAST(CAST(gt AS BIGINT) -
           |        CAST(n_a * n_b - gt - tie AS BIGINT) AS DOUBLE) /
           |      CAST(n_a * n_b AS DOUBLE)) < 0.33 THEN 'small'
           |    WHEN abs(CAST(CAST(gt AS BIGINT) -
           |        CAST(n_a * n_b - gt - tie AS BIGINT) AS DOUBLE) /
           |      CAST(n_a * n_b AS DOUBLE)) < 0.474 THEN 'medium'
           |    ELSE 'large' END AS magnitude
           |FROM a""".stripMargin),
    "One value-grain agg + a distinct-value cumulative window — pair counts " +
      "without the n_a x n_b join. The '100 TB makes everything significant' " +
      "antidote: report HOW BIG, not just whether.")

  /** q324 — A-stat: Yuen's 20%-trimmed-means t of quantity, A vs R —
    * the robust counterpart to q186's Welch t on the same data. All
    * integers up to the one pinned t finish. */
  val q324 = Declared(
    "q324_yuen_trimmed_t", "A-stat",
    (s, dir) => Aggregates.yuenTrimmedT(Tables.lineitem(s, dir),
      col("l_quantity"), col("l_returnflag"), "A", "R",
      gNum = 1, gDen = 5),
    Some("""WITH d AS (
           |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
           |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
           |pv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
           |       FROM d GROUP BY g, v),
           |c AS (
           |  SELECT g, v, c,
           |    CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS cb,
           |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS ct,
           |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
           |  FROM pv),
           |t AS (
           |  SELECT *, (n * 1) // 5 AS trim,
           |    min(CASE WHEN ct >= (n * 1) // 5 + 1 THEN v END)
           |      OVER (PARTITION BY g) AS lo,
           |    min(CASE WHEN ct >= n - (n * 1) // 5 THEN v END)
           |      OVER (PARTITION BY g) AS hi
           |  FROM c),
           |t2 AS (
           |  SELECT *,
           |    greatest(0, least(ct, n - trim) - greatest(cb, trim)) AS inc,
           |    greatest(lo, least(hi, v)) AS w
           |  FROM t),
           |gg AS (
           |  SELECT g, max(n) AS n, max(trim) AS gtrim,
           |    CAST(sum(CAST(inc AS HUGEINT) * v) AS HUGEINT) AS ts,
           |    CAST(sum(CAST(c AS HUGEINT) * w) AS HUGEINT) AS ws,
           |    CAST(sum(CAST(c AS HUGEINT) * (w * w)) AS HUGEINT) AS wq
           |  FROM t2 GROUP BY g),
           |j AS (
           |  SELECT a.n AS n_a, b.n AS n_b,
           |    a.n - a.gtrim * 2 AS h_a, b.n - b.gtrim * 2 AS h_b,
           |    CAST(a.ts AS DOUBLE) / CAST(a.n - a.gtrim * 2 AS DOUBLE)
           |      AS mean_trim_a,
           |    CAST(b.ts AS DOUBLE) / CAST(b.n - b.gtrim * 2 AS DOUBLE)
           |      AS mean_trim_b,
           |    (CAST(CAST(a.n AS HUGEINT) * a.wq - a.ws * a.ws AS DOUBLE) /
           |      CAST(CAST(a.n AS HUGEINT) * (CAST(a.n AS HUGEINT) - 1)
           |        AS DOUBLE)) * CAST(a.n - 1 AS DOUBLE) /
           |      CAST(CAST(a.n - a.gtrim * 2 AS HUGEINT) *
           |        (CAST(a.n - a.gtrim * 2 AS HUGEINT) - 1) AS DOUBLE) AS da,
           |    (CAST(CAST(b.n AS HUGEINT) * b.wq - b.ws * b.ws AS DOUBLE) /
           |      CAST(CAST(b.n AS HUGEINT) * (CAST(b.n AS HUGEINT) - 1)
           |        AS DOUBLE)) * CAST(b.n - 1 AS DOUBLE) /
           |      CAST(CAST(b.n - b.gtrim * 2 AS HUGEINT) *
           |        (CAST(b.n - b.gtrim * 2 AS HUGEINT) - 1) AS DOUBLE) AS db
           |  FROM (SELECT * FROM gg WHERE g = 'A') a,
           |       (SELECT * FROM gg WHERE g = 'R') b)
           |SELECT n_a, n_b, h_a, h_b, mean_trim_a, mean_trim_b,
           |  (mean_trim_a - mean_trim_b) / sqrt(da + db) AS t_stat
           |FROM j""".stripMargin),
    "Same value x group rollup envelope as q152/q154 — order statistics from " +
      "cumulative counts, no per-row sort. The test that keeps its level when " +
      "the tails are heavy; run beside q186 and diverging verdicts mean " +
      "the outliers are driving the decision.")

  /** q325 — A-stat: Wald SPRT monitoring of the high-priority order
    * rate by year (H0 p=.30 vs H1 p=.35, α=β=.05). Micro-nat literal
    * increments keep cumulation exact-integer. */
  val q325 = Declared(
    "q325_sprt", "A-stat",
    (s, dir) => Experimentation.sprt(Tables.orders(s, dir),
        year(col("o_orderdate")),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        llrSuccessMicro = 154151L, llrFailureMicro = -74108L,
        upperMicro = 2944439L, lowerMicro = -2944439L)
      .orderBy(col("look")),
    Some("""WITH lk AS (
           |  SELECT CAST(year(o_orderdate) AS BIGINT) AS look,
           |    CAST(count(*) AS BIGINT) AS cn,
           |    CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           |      THEN 1 ELSE 0 END) AS BIGINT) AS cs
           |  FROM orders GROUP BY 1),
           |c AS (
           |  SELECT look,
           |    CAST(sum(cn) OVER w AS BIGINT) AS n,
           |    CAST(sum(cs) OVER w AS BIGINT) AS s
           |  FROM lk WINDOW w AS (ORDER BY look
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |d AS (
           |  SELECT look, n, s,
           |    s * 154151 + (n - s) * -74108 AS llr_micro
           |  FROM c),
           |e AS (
           |  SELECT look, n, s, llr_micro,
           |    CASE WHEN llr_micro >= 2944439 THEN 'reject_h0'
           |         WHEN llr_micro <= -2944439 THEN 'accept_h0'
           |         ELSE 'continue' END AS decision
           |  FROM d)
           |SELECT look, n, s, llr_micro, decision,
           |  max(CASE WHEN decision <> 'continue' THEN 1 ELSE 0 END)
           |    OVER (ORDER BY look
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
           |    AS decided
           |FROM e ORDER BY look""".stripMargin),
    "One look-keyed agg; LLR cumulation is exact integer micro-nats over the " +
      "K-row rollup. The fully-sequential design: expected sample size beats " +
      "any fixed-n test at the same error rates (Wald's optimality).")

  /** q326 — J-ER: Fellegi–Sunter linkage weights from labeled customer
    * pairs (same-block candidates; 'match' = same market segment) over
    * three comparison fields. Exact ppm probabilities; nano-quantized
    * log-odds weights. */
  val q326 = Declared(
    "q326_fellegi_sunter", "J-ER",
    (s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_mktsegment"),
        col("c_acctbal"))
      val pairs = c.select(col("c_custkey").as("k1"), col("c_name").as("n1"),
          col("c_nationkey").as("na1"), col("c_mktsegment").as("m1"),
          col("c_acctbal").as("b1"),
          (col("c_custkey") % 100).as("__blk"))
        .join(c.select(col("c_custkey").as("k2"), col("c_name").as("n2"),
          col("c_nationkey").as("na2"), col("c_mktsegment").as("m2"),
          col("c_acctbal").as("b2"),
          (col("c_custkey") % 100).as("__blk")), Seq("__blk"))
        .filter(col("k1") < col("k2"))
      EntityResolution.fellegiSunter(pairs, col("m1") === col("m2"), Seq(
        "nation" -> (col("na1") === col("na2")),
        "name_tail" -> (substring(col("n1"), -3, 3) ===
          substring(col("n2"), -3, 3)),
        "balance_sign" -> (signum(col("b1")) === signum(col("b2")))))
        .orderBy(col("field"))
    },
    Some("""WITH c AS (
           |  SELECT c_custkey AS k, c_name AS n, c_nationkey AS na,
           |    c_mktsegment AS m, c_acctbal AS b, c_custkey % 100 AS blk
           |  FROM customer),
           |p AS (
           |  SELECT a.m = b.m AS is_match,
           |    a.na = b.na AS f_nation,
           |    substring(a.n, -3, 3) = substring(b.n, -3, 3) AS f_name,
           |    sign(a.b) = sign(b.b) AS f_bal
           |  FROM c a JOIN c b ON a.blk = b.blk AND a.k < b.k),
           |g AS (
           |  SELECT
           |    CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS nm,
           |    CAST(sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS BIGINT)
           |      AS nu,
           |    CAST(sum(CASE WHEN is_match AND f_nation THEN 1 ELSE 0 END)
           |      AS BIGINT) AS am_nation,
           |    CAST(sum(CASE WHEN NOT is_match AND f_nation THEN 1 ELSE 0 END)
           |      AS BIGINT) AS au_nation,
           |    CAST(sum(CASE WHEN is_match AND f_name THEN 1 ELSE 0 END)
           |      AS BIGINT) AS am_name,
           |    CAST(sum(CASE WHEN NOT is_match AND f_name THEN 1 ELSE 0 END)
           |      AS BIGINT) AS au_name,
           |    CAST(sum(CASE WHEN is_match AND f_bal THEN 1 ELSE 0 END)
           |      AS BIGINT) AS am_bal,
           |    CAST(sum(CASE WHEN NOT is_match AND f_bal THEN 1 ELSE 0 END)
           |      AS BIGINT) AS au_bal
           |  FROM p),
           |rows_out AS (
           |  SELECT 'nation' AS field, nm AS n_match, nu AS n_unmatch,
           |    am_nation AS agree_m, au_nation AS agree_u,
           |    (1000000 * (am_nation + 1)) // (nm + 2) AS m_ppm,
           |    (1000000 * (au_nation + 1)) // (nu + 2) AS u_ppm
           |  FROM g
           |  UNION ALL
           |  SELECT 'name_tail', nm, nu, am_name, au_name,
           |    (1000000 * (am_name + 1)) // (nm + 2),
           |    (1000000 * (au_name + 1)) // (nu + 2)
           |  FROM g
           |  UNION ALL
           |  SELECT 'balance_sign', nm, nu, am_bal, au_bal,
           |    (1000000 * (am_bal + 1)) // (nm + 2),
           |    (1000000 * (au_bal + 1)) // (nu + 2)
           |  FROM g)
           |SELECT field, n_match, n_unmatch, agree_m, agree_u, m_ppm, u_ppm,
           |  CAST(round((ln(CAST(m_ppm AS DOUBLE)) - ln(CAST(u_ppm AS DOUBLE)))
           |    * 1e9, 0) AS BIGINT) AS w_agree_nano,
           |  CAST(round((ln(1000000.0 - CAST(m_ppm AS DOUBLE)) -
           |    ln(1000000.0 - CAST(u_ppm AS DOUBLE))) * 1e9, 0) AS BIGINT)
           |    AS w_disagree_nano
           |FROM rows_out ORDER BY field""".stripMargin),
    "One agg over the blocked pair set computes every field's m/u counts in " +
      "a single pass. The principled replacement for 'k of n fields agree' " +
      "rules: sum the log-odds weights, threshold once, and the FS theory " +
      "gives the error rates.")

  /** q327 — A-stat: Kish effective sample size per order priority,
    * weighting orders by their value in cents — how much of each
    * slice's nominal n survives the weighting. */
  val q327 = Declared(
    "q327_kish_neff", "A-stat",
    (s, dir) => Aggregates.kishNeff(Tables.orders(s, dir),
        col("o_orderpriority"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
      .orderBy(col("slice")),
    Some("""WITH w AS (
           |  SELECT o_orderpriority AS slice,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS wt
           |  FROM orders),
           |g AS (
           |  SELECT slice, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CAST(wt AS HUGEINT)) AS HUGEINT) AS sw,
           |    CAST(sum(CAST(wt AS HUGEINT) * wt) AS HUGEINT) AS swq
           |  FROM w GROUP BY slice)
           |SELECT slice, n, CAST(sw AS BIGINT) AS w_sum,
           |  CAST(sw * sw AS DOUBLE) / CAST(swq AS DOUBLE) AS n_eff,
           |  CAST(CAST(n AS HUGEINT) AS DOUBLE) * CAST(swq AS DOUBLE) /
           |    CAST(sw * sw AS DOUBLE) AS deff
           |FROM g ORDER BY slice""".stripMargin),
    "One slice-keyed agg with map-side combine. The number to quote next to " +
      "every weighted estimate: variance scales with 1/n_eff, and a heavy-" +
      "tailed weight column can quietly throw away 90% of the sample.")

  val all: Seq[Declared] = Seq(q323, q324, q325, q326, q327)
}
