package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, TimeSeriesOps}
import graft.ext.Graph

/** Round-4 (batch 8): distribution testing (Kolmogorov–Smirnov),
  * multi-source BFS reachability, recursive integer smoothing (EWMA),
  * exact apportionment and Benford data-quality auditing. Same
  * hash-exactness discipline as Analytics: integer/decimal decision
  * arithmetic, IEEE float ops only on identical operands. */
object Analytics2 {

  private val PartOffset = 1L << 40 // = 1099511627776, literal in the SQL

  /** q154 — A-stat: two-sample KS statistic between returned ('R') and
    * accepted ('A') extended prices. Complements q152's Mann–Whitney:
    * MW sees location shifts, KS any distributional difference. The
    * crossing quantity max|cumA·n_b − cumB·n_a| stays integral; the
    * only float op is the final division of identical exact ints. */
  val q154 = Declared(
    "q154_ks_test", "A-stat",
    (s, dir) =>
      Aggregates.ksTest(Tables.lineitem(s, dir), col("l_extendedprice"),
        col("l_returnflag"), "A", "R"),
    Some("""WITH d AS (
           |  SELECT l_returnflag AS g, l_extendedprice AS v FROM lineitem
           |  WHERE l_returnflag IN ('A', 'R')),
           |pv AS (
           |  SELECT v,
           |    sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS ca,
           |    sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS cb
           |  FROM d GROUP BY v),
           |c AS (
           |  SELECT v,
           |    sum(ca) OVER (ORDER BY v) AS cuma,
           |    sum(cb) OVER (ORDER BY v) AS cumb,
           |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
           |  FROM pv)
           |SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
           |  CAST(max(abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na))
           |    AS BIGINT) AS d_num,
           |  CAST(max(abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na))
           |    AS DOUBLE) / CAST(CAST(max(na) AS HUGEINT) * max(nb) AS DOUBLE)
           |    AS ks_stat
           |FROM c""".stripMargin),
    "The ordered window runs over the DISTINCT-VALUE rollup (the q152 trick), never " +
      "the fact table — the test costs one value-keyed agg at any volume; products " +
      "widen to DECIMAL(38,0)/HUGEINT so 10^12-row groups cannot overflow.")

  /** q155 — E2+/E6: multi-source BFS hop distance over the bipartite
    * supplier–part purchase graph (q100's edge set), seeded at nation-0
    * suppliers, 4 fixed rounds. Supplier-side distances are even
    * (0 = seed, 2 = shares a part with a seed, 4 = two part-hops);
    * suppliers beyond 4 hops are absent. The oracle unrolls the same
    * min-plus rounds as chained CTEs — exact integer state means both
    * engines agree bit-for-bit even where BFS hasn't converged. */
  val q155 = Declared(
    "q155_bfs_hops", "E2+,E6",
    (s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("src"),
          (col("l_partkey") + PartOffset).as("dst"))
      val seeds = Tables.supplier(s, dir)
        .filter(col("s_nationkey") === 0).select(col("s_suppkey"))
      Graph.bfsHops(edges, "src", "dst", seeds, "s_suppkey", rounds = 4)
        .filter(col("node") < PartOffset)
        .select(col("node").as("supplier"), col("dist"))
        .orderBy(col("supplier"))
    },
    Some {
      val rounds = (1 to 4).map { k =>
        s"""i$k AS (
           |  SELECT s.dst AS node, min(d.dist) + 1 AS dist
           |  FROM sym s JOIN d${k - 1} d ON s.src = d.node GROUP BY s.dst),
           |d$k AS (
           |  SELECT node, CAST(min(dist) AS BIGINT) AS dist
           |  FROM (SELECT * FROM d${k - 1} UNION ALL SELECT * FROM i$k)
           |  GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (
         |  SELECT DISTINCT l_suppkey AS src, l_partkey + 1099511627776 AS dst
         |  FROM lineitem),
         |sym AS (
         |  SELECT src, dst FROM e0
         |  UNION
         |  SELECT dst AS src, src AS dst FROM e0),
         |d0 AS (
         |  SELECT s_suppkey AS node, CAST(0 AS BIGINT) AS dist
         |  FROM supplier WHERE s_nationkey = 0),
         |$rounds
         |SELECT node AS supplier, dist FROM d4
         |WHERE node < 1099511627776 ORDER BY supplier""".stripMargin
    },
    "The frontier side of each round's join carries only FINITE labels (never |V|); a " +
      "round is one node-keyed equi-join + one dst-keyed min agg + one label merge — " +
      "uniform keys, zero per-round driver traffic, plan depth bounded by periodic " +
      "checkpoints. Blast-radius / contamination-trace reachability at 100 TB.")

  /** q156 — A5/A8: integer EWMA (α = 1/4) over each event type's daily
    * count series. Recursion — each output depending on ALL priors with
    * decaying weights — is the shape Spark windows can't express;
    * [[TimeSeriesOps.ewmaInt]] closes it with an ordered aggregate()
    * fold per key, and the oracle runs the SAME recurrence as a
    * recursive CTE. Floor division on non-negative longs is identical
    * on both engines, so the smoothed series hash-matches exactly. */
  val q156 = Declared(
    "q156_ewma", "A5,A8",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      TimeSeriesOps.ewmaInt(daily, Seq(col("event_type")), col("day"),
          col("n"), num = 1, den = 4)
        .select(col("event_type"), col("order").as("day"),
          col("value").as("n"), col("ewma"))
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
    "One key-partitioned shuffle; the fold state is the key's OWN series, so the op " +
      "is for rollup-grain series (calendar-bounded, not event-volume-bounded) — " +
      "aggregate to the grain first, then smoothing costs O(points per key) with no " +
      "window machinery. The anomaly-baseline smoother of every ops dashboard.")

  /** q157 — A1: largest-remainder (Hamilton) apportionment of 10 000
    * budget basis points across nations, proportional to order revenue
    * cents. Floor shares + one-each to the largest remainders
    * (nation-name tie-break) makes Σ alloc ≡ 10 000 exactly — the
    * invariant naive per-key rounding silently breaks. */
  val q157 = Declared(
    "q157_apportion", "A1",
    (s, dir) => {
      val rev = Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, dir),
          col("c_nationkey") === col("n_nationkey"))
      Aggregates.largestRemainder(rev, Seq(col("n_name")),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
          total = 10000L)
        .orderBy(col("n_name"))
    },
    Some("""WITH w AS (
           |  SELECT n_name,
           |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           |      AS BIGINT) AS weight
           |  FROM orders
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation ON c_nationkey = n_nationkey
           |  GROUP BY n_name),
           |t AS (
           |  SELECT n_name, weight,
           |    CAST(sum(weight) OVER () AS HUGEINT) AS tw,
           |    CAST(10000 AS HUGEINT) * weight AS num
           |  FROM w),
           |f AS (
           |  SELECT n_name, weight, num // tw AS fl, num % tw AS rem,
           |    sum(num // tw) OVER () AS sfl
           |  FROM t),
           |r AS (
           |  SELECT *, row_number() OVER (ORDER BY rem DESC, n_name) AS rn
           |  FROM f)
           |SELECT n_name, weight,
           |  CAST(fl + CASE WHEN rn <= 10000 - sfl THEN 1 ELSE 0 END AS BIGINT)
           |    AS alloc
           |FROM r ORDER BY n_name""".stripMargin),
    "The window runs over the |keys|-row weight rollup, never the fact table; " +
      "products widen to DECIMAL(38,0)/HUGEINT. This is the rounding step every " +
      "budget / quota / shard-count allocation needs — per-key round() drifts off " +
      "the total, the remainder rank never does.")

  /** q158 — A1/E4: Benford first-digit audit of extended-price cents.
    * Expected ppm are LITERAL constants (log10(1+1/d) pre-quantized,
    * summing to exactly 10⁶) — no libm call on either engine; observed
    * ppm is an integer floor quotient. The classic organic-vs-
    * fabricated numerics screen, run as a data-quality gate. */
  val q158 = Declared(
    "q158_benford", "A1,E4",
    (s, dir) =>
      Aggregates.benfordProfile(Tables.lineitem(s, dir),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")),
    Some {
      val values = Aggregates.BenfordPpm
        .map { case (d, p) => s"($d, ${p})" }.mkString(", ")
      s"""WITH v AS (
         |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         |  FROM lineitem
         |  WHERE CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) > 0),
         |o AS (
         |  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
         |    count(*) AS n
         |  FROM v GROUP BY 1),
         |e AS (SELECT * FROM (VALUES $values) AS t(digit, exp_ppm)),
         |j AS (
         |  SELECT e.digit, CAST(coalesce(o.n, 0) AS BIGINT) AS n,
         |    CAST(e.exp_ppm AS BIGINT) AS exp_ppm
         |  FROM e LEFT JOIN o ON e.digit = o.digit),
         |t2 AS (
         |  SELECT digit, n,
         |    CAST((n * 1000000) // CAST(sum(n) OVER () AS BIGINT) AS BIGINT)
         |      AS obs_ppm,
         |    exp_ppm
         |  FROM j)
         |SELECT digit, n, obs_ppm, exp_ppm,
         |  CAST(abs(obs_ppm - exp_ppm) AS BIGINT) AS dev_ppm
         |FROM t2 ORDER BY digit""".stripMargin
    },
    "A 9-row rollup off one scan-side projection (first char of the decimal " +
      "rendering — no float log10); everything downstream is constant-sized. The " +
      "fraud / synthetic-data screen that runs as cheaply at 100 TB as at 1 GB.")

  val all: Seq[Declared] = Seq(q154, q155, q156, q157, q158)
}
