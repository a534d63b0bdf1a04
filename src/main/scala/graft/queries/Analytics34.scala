package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Aggregates

/** Round-7 batch: robust location estimators — the Hodges-Lehmann
  * Walsh-average median and the median-of-means heavy-tail-safe mean,
  * both exact integers end to end. */
object Analytics34 {

  /** q454 — A-stat: Hodges-Lehmann location of WEEKLY shipped quantity
    * per return flag — median of Walsh averages over the calendar-grain
    * rollup (the |weeks|² pair join runs on the rollup, never raw
    * facts; the week grain keeps the Walsh frame ≤ ~10⁵ pairs per
    * flag at any sf), reported as 2·HL so the selection stays
    * integer. */
  val q454 = Declared(
    "q454_hodges_lehmann", "A-stat",
    (s, dir) => {
      val weekly = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag").as("flag"),
          expr("CAST(datediff(to_date(l_shipdate), DATE '1990-01-01') AS LONG)" +
            " div 7L").as("__day"))
        .agg(sum(col("l_quantity").cast("long")).as("__q"))
      Aggregates.hodgesLehmann(weekly, Seq(col("flag")), col("__q"),
          col("__day"))
        .orderBy(col("flag"))
    },
    Some("""WITH daily AS (
           |  SELECT l_returnflag AS flag,
           |    date_diff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE))
           |      // 7 AS d,
           |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
           |  FROM lineitem GROUP BY 1, 2),
           |p AS (
           |  SELECT a.flag, a.q + b.q AS w2, a.d AS t1, b.d AS t2
           |  FROM daily a JOIN daily b ON a.flag = b.flag AND a.d <= b.d),
           |r AS (
           |  SELECT flag, w2,
           |    row_number() OVER (PARTITION BY flag ORDER BY w2, t1, t2)
           |      AS rn,
           |    count(*) OVER (PARTITION BY flag) AS np
           |  FROM p),
           |m AS (SELECT flag, CAST(min(w2) AS BIGINT) AS hl2,
           |        CAST(min(np) AS BIGINT) AS n_pairs
           |      FROM r WHERE rn * 2 >= np GROUP BY flag),
           |c AS (SELECT flag, CAST(count(*) AS BIGINT) AS n
           |      FROM daily GROUP BY flag)
           |SELECT c.flag, c.n, m.n_pairs, m.hl2
           |FROM c JOIN m ON c.flag = m.flag ORDER BY c.flag""".stripMargin),
    "The Walsh pair join is |days|² per flag — calendar-bounded squared, " +
      "a documented rollup regime; the median selection reuses the " +
      "key-partitioned weightedQuantile envelope (no single-partition " +
      "window). The robust center that shrugs off a corrupted day.")

  /** q455 — A-stat: median-of-means of line price cents, 9 buckets
    * keyed by (orderkey·8 + linenumber) mod 9 — the heavy-tail-safe
    * mean; one bucket agg + a 9-row TakeOrdered finish. */
  val q455 = Declared(
    "q455_median_of_means", "A-stat",
    (s, dir) => Aggregates.medianOfMeans(
        Tables.lineitem(s, dir),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        expr("l_orderkey * 8 + l_linenumber"), k = 9),
    Some("""WITH b AS (
           |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT) AS v,
           |    (l_orderkey * 8 + l_linenumber) % 9 AS bk
           |  FROM lineitem),
           |g AS (
           |  SELECT bk, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(v) AS HUGEINT) AS s,
           |    CAST((CAST(sum(v) AS HUGEINT) * 1000000) // count(*)
           |      AS BIGINT) AS mean_u
           |  FROM b GROUP BY bk),
           |r AS (SELECT mean_u,
           |        row_number() OVER (ORDER BY mean_u, bk) AS rn FROM g)
           |SELECT CAST(sum(g.n) AS BIGINT) AS n,
           |  CAST(count(*) AS BIGINT) AS k_buckets,
           |  (SELECT CAST(max(mean_u) AS BIGINT) FROM r WHERE rn <= 5)
           |    AS mom_micro
           |FROM g""".stripMargin),
    "One bucket-keyed agg with map-side combine + a 9-row TakeOrdered " +
      "finish — no windows, no joins; the robust mean at any scan size. " +
      "Bucket key is replayable modular arithmetic so a second engine " +
      "agrees exactly (pre-hash clustered ids upstream at scale).")

  /** q456 — privacy: discrete-Laplace noisy DAILY order counts
    * (two-sided geometric mechanism, ε = 2·ln 2) — deterministic
    * splitmix64-mixed noise in pure 64-bit integer arithmetic, so the
    * DuckDB replay (mod-2⁶⁴ HUGEINT arithmetic, split 32×64 wrapping
    * multiplies, + the lowest-set-bit ctz identity) agrees bit-for-bit
    * with Spark's wrapping longs. The mixer is NON-AFFINE (two
    * xor-shift/multiply rounds) — an LCG here would make the two
    * geometric draws differ by a key-independent constant, destroying
    * the discrete-Laplace shape (see Privacy.dpCounts scaladoc). */
  val q456 = Declared(
    "q456_dp_counts", "privacy",
    (s, dir) => graft.ops.Privacy.dpCounts(
        Tables.orders(s, dir),
        datediff(to_date(col("o_orderdate")), lit("1990-01-01")),
        k = 2)
      .orderBy(col("key")),
    Some("""WITH c AS (
           |  SELECT date_diff('day', DATE '1990-01-01',
           |      CAST(o_orderdate AS DATE)) AS key,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM orders GROUP BY 1),
           |x1 AS (
           |  SELECT key, n,
           |    ((CAST(key AS HUGEINT) + 11400714819323198485)
           |      % 18446744073709551616 + 18446744073709551616)
           |      % 18446744073709551616 AS z1,
           |    ((CAST(key AS HUGEINT) + 7640891576956012809)
           |      % 18446744073709551616 + 18446744073709551616)
           |      % 18446744073709551616 AS z2
           |  FROM c),
           |x2 AS (SELECT key, n,
           |    xor(z1, z1 >> 30) AS z1, xor(z2, z2 >> 30) AS z2 FROM x1),
           |x3 AS (SELECT key, n,
           |    (((z1 >> 32) * 13787848793156543929 % 4294967296) * 4294967296
           |      + (z1 % 4294967296) * 13787848793156543929)
           |      % 18446744073709551616 AS z1,
           |    (((z2 >> 32) * 13787848793156543929 % 4294967296) * 4294967296
           |      + (z2 % 4294967296) * 13787848793156543929)
           |      % 18446744073709551616 AS z2
           |  FROM x2),
           |x4 AS (SELECT key, n,
           |    xor(z1, z1 >> 27) AS z1, xor(z2, z2 >> 27) AS z2 FROM x3),
           |x5 AS (SELECT key, n,
           |    (((z1 >> 32) * 10723151780598845931 % 4294967296) * 4294967296
           |      + (z1 % 4294967296) * 10723151780598845931)
           |      % 18446744073709551616 AS z1,
           |    (((z2 >> 32) * 10723151780598845931 % 4294967296) * 4294967296
           |      + (z2 % 4294967296) * 10723151780598845931)
           |      % 18446744073709551616 AS z2
           |  FROM x4),
           |u AS (SELECT key, n,
           |    xor(z1, z1 >> 31) AS u1, xor(z2, z2 >> 31) AS u2 FROM x5),
           |g AS (
           |  SELECT key, n,
           |    least(bit_count(CAST((u1 & -u1) - 1 AS BIGINT)), 64) // 2 AS g1,
           |    least(bit_count(CAST((u2 & -u2) - 1 AS BIGINT)), 64) // 2 AS g2
           |  FROM u)
           |SELECT key, n, CAST(g1 - g2 AS BIGINT) AS noise,
           |  CAST(n + g1 - g2 AS BIGINT) AS noisy_n
           |FROM g ORDER BY key""".stripMargin),
    "One key-grain agg + scan-side bit arithmetic — no libm, no RNG " +
      "state, no shuffle beyond the count. Deterministic noise makes " +
      "the release replayable for pipeline audits — NOT a DP release " +
      "as-is (public salts let anyone subtract the noise); a real " +
      "release draws the geometrics from secret entropy, under which " +
      "the epsilon = k*ln2 analysis holds.")

  /** q460 — ML: univariate logistic regression by fixed-round
    * Newton/IRLS — P(extendedprice > 30000 | quantity), a genuinely
    * sloped relationship (price = qty × unit price). Integer-quantized
    * state on the (quantity, label) rollup; the oracle replays all 6
    * Newton rounds as a recursive CTE with window-aggregated
    * gradient/Hessian sums and the exact 2×2 adjugate solve (the q401
    * GMM device). */
  val q460 = Declared(
    "q460_logreg_irls", "ML",
    (s, dir) => graft.ops.Experimentation.logisticIrls(
      Tables.lineitem(s, dir),
      col("l_quantity"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
        " > 3000000L"),
      iters = 6),
    Some("""WITH RECURSIVE rk AS MATERIALIZED (
           |  SELECT CAST(l_quantity AS BIGINT) AS x,
           |    CASE WHEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
           |        AS BIGINT) > 3000000 THEN 1 ELSE 0 END AS y,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM lineitem GROUP BY 1, 2),
           |nn AS MATERIALIZED (
           |  SELECT CAST(sum(c) AS BIGINT) AS n,
           |    CAST(count(*) AS BIGINT) AS nd FROM rk),
           |st(it, b0, b1) AS (
           |  SELECT 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
           |  UNION ALL
           |  SELECT it + 1,
           |    CASE WHEN det > 0 THEN greatest(-50000000, least(50000000,
           |        b0 + CAST((1000000 * (h11 * g0 - h01 * g1)) // det
           |          AS BIGINT)))
           |      ELSE b0 END,
           |    CASE WHEN det > 0 THEN greatest(-50000000, least(50000000,
           |        b1 + CAST((1000000 * (h00 * g1 - h01 * g0)) // det
           |          AS BIGINT)))
           |      ELSE b1 END
           |  FROM (
           |    SELECT y2.*, h00 * h11 - h01 * h01 AS det
           |    FROM (
           |      SELECT t.it, t.b0, t.b1,
           |        sum(CAST(c AS HUGEINT) * (y * 1000000 - p)) OVER ()
           |          AS g0,
           |        sum(CAST(c AS HUGEINT) * (y * 1000000 - p) * x) OVER ()
           |          AS g1,
           |        sum(CAST(c AS HUGEINT)
           |          * ((p * (1000000 - p)) // 1000000)) OVER () AS h00,
           |        sum(CAST(c AS HUGEINT)
           |          * ((p * (1000000 - p)) // 1000000) * x) OVER ()
           |          AS h01,
           |        sum(CAST(c AS HUGEINT)
           |          * ((p * (1000000 - p)) // 1000000) * x * x) OVER ()
           |          AS h11,
           |        row_number() OVER (ORDER BY x, y) AS rn
           |      FROM (
           |        SELECT st.it, st.b0, st.b1, rk.x, rk.y, rk.c,
           |          CAST(floor(1e6 / (1.0 + exp(
           |            -CAST(st.b0 + st.b1 * rk.x AS DOUBLE) / 1e6)) + 0.5)
           |            AS BIGINT) AS p
           |        FROM st, rk WHERE st.it < 6) t) y2
           |    WHERE rn = 1) z)
           |SELECT n, nd AS n_distinct, CAST(6 AS BIGINT) AS iters,
           |  b0 AS b0_micro, b1 AS b1_micro
           |FROM st, nn WHERE it = 6""".stripMargin),
    "ONE fact pass builds the (x, y) rollup with map-side combine; " +
      "each Newton round is a broadcast-state scan + agg of the rollup " +
      "and the driver holds a single 2-integer state row (the k-means-" +
      "centroid license). Quantize continuous features upstream — the " +
      "rollup IS the contract, exactly like gmm2Em's.")

  val all: Seq[Declared] = Seq(q454, q455, q456, q460)
}
