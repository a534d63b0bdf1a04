package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, Binning, Dominance, EventAnalytics}
import graft.ext.Graph

/** Round-4 (continued) order-statistics + graph analytics coverage:
  * skyline dominance, CUSUM change detection, equal-frequency
  * binning over exact distributed ranks, triangle counting, lagged
  * cross-correlation and last-touch attribution. Same hash-exactness
  * discipline as Events: integer/decimal decision arithmetic, IEEE
  * ops only on identical operands. */
object Analytics {

  /** q125 — W-frame/O1: 2-D skyline of orders — the Pareto frontier
    * minimizing order day and maximizing total price ("no earlier
    * order was worth as much"). The engine's two-phase plan (per-day
    * rollup → prefix max over the |days|-row rollup → broadcast-join
    * filter) must equal the oracle's direct window formulation. No
    * arithmetic on the double column — only comparisons — so the hash
    * matches unrounded. */
  val q125 = Declared(
    "q125_skyline", "W-frame,O1",
    (s, dir) => {
      // o_orderdate is TIMESTAMP_NTZ (no unix_micros); epoch-day via
      // date difference — exact integer on both engines
      val d = Tables.orders(s, dir).select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("day"),
        col("o_totalprice"))
      Dominance.skyline2D(d, "day", "o_totalprice")
        .select(col("o_orderkey"), col("day"), col("o_totalprice"))
        .orderBy(col("day"), col("o_orderkey"))
    },
    Some("""WITH d AS (
           |  SELECT o_orderkey,
           |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
           |         o_totalprice
           |  FROM orders),
           |m AS (SELECT day, max(o_totalprice) AS ymax FROM d GROUP BY day),
           |p AS (
           |  SELECT day, ymax,
           |    max(ymax) OVER (ORDER BY day
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before
           |  FROM m)
           |SELECT o_orderkey, day, o_totalprice
           |FROM d JOIN p USING (day)
           |WHERE o_totalprice = ymax AND (before IS NULL OR o_totalprice > before)
           |ORDER BY day, o_orderkey""".stripMargin),
    "The O(n²) dominance join reduces to one agg keyed on x + a prefix max over the " +
      "|distinct x|-row rollup + a broadcast filter — no window ever touches the fact " +
      "table globally, so the plan is one uniform shuffle at any scale.")

  /** q126 — W-frame/A5: CUSUM drift flags per event type — positions
    * where the running deviation from the series mean escapes the
    * 2σ·√k random-walk envelope. The decision is a SQUARED all-integer
    * inequality in DECIMAL(38,0)/HUGEINT ((n·P_k − k·S)² > 4·k·(n·Q −
    * S²) over cent-quantized values), so no float accumulation, mean
    * division or sqrt exists to diverge between engines. */
  val q126 = Declared(
    "q126_cusum", "W-frame,A5",
    (s, dir) =>
      EventAnalytics.cusumFlags(Tables.events(s, dir),
          "event_type", "ts", "event_id", "value", cNum = 2, cDen = 1)
        .orderBy(col("event_type"), col("k")),
    Some("""WITH v AS (
           |  SELECT event_type, ts, event_id,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
           |  FROM events),
           |t AS (
           |  SELECT event_type, count(*) AS n,
           |    CAST(sum(vc) AS HUGEINT) AS s,
           |    CAST(sum(CAST(vc AS HUGEINT) * vc) AS HUGEINT) AS q
           |  FROM v GROUP BY event_type),
           |r AS (
           |  SELECT event_type, event_id,
           |    CAST(sum(vc) OVER w AS HUGEINT) AS pk,
           |    CAST(row_number() OVER w AS HUGEINT) AS k
           |  FROM v WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           |SELECT r.event_type, CAST(r.k AS BIGINT) AS k, r.event_id
           |FROM r JOIN t USING (event_type)
           |WHERE (n*pk - k*s) * (n*pk - k*s) > 4 * k * (n*q - s*s)
           |ORDER BY event_type, k""".stripMargin),
    "One groupBy(key) for the totals (broadcast back) + one key-partitioned window " +
      "sort — the q105 cost envelope. CUSUM is inherently sequential per key; a " +
      "year-long hot key splits by per-day subtotal carry (the q92 two-phase trick).")

  /** q127 — A9/W-frame: equal-frequency deciles of order value (pandas
    * qcut's rank flavor) — bin = (rank−1)·10 div N + 1 over the exact
    * GLOBAL rank, which the engine computes distributed (range
    * repartition + per-partition row_number + bounded offset rollup)
    * and the oracle computes with its single-node row_number. Bucket
    * populations differ by at most one; boundary values land by
    * (value, key) tie order identically on both sides. */
  val q127 = Declared(
    "q127_qcut", "A9,W-frame",
    (s, dir) => {
      val d = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
      Binning.qcut(d, "o_totalprice", "o_orderkey", 10)
        .groupBy(col("bin")).agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
        .orderBy(col("bin"))
    },
    Some("""WITH r AS (
           |  SELECT o_orderkey, o_totalprice,
           |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
           |    count(*) OVER () AS n_total
           |  FROM orders)
           |SELECT CAST((rn - 1) * 10 // n_total + 1 AS INT) AS bin,
           |  count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
           |FROM r GROUP BY 1 ORDER BY bin""".stripMargin),
    "Exact global rank without the single-partition window: range repartition keeps " +
      "cross-partition order, ranks are per-partition row_numbers plus a " +
      "|partitions|-row prefix-summed offset rollup — rank and bin are " +
      "boundary-independent because the (value, key) order is total.")

  /** q128 — E2/X4: per-node triangle counts of the co-purchase part
    * graph (parts sharing an order are adjacent). The engine orients
    * edges by (degree, id) — capping wedge fan-out at O(√m) under any
    * skew — while the oracle orients by id alone; each triangle is
    * counted exactly once either way, so the per-node counts must
    * agree bit-for-bit. */
  val q128 = Declared(
    "q128_triangles", "E2,X4",
    (s, dir) => {
      val pr = Tables.lineitem(s, dir).filter(col("l_orderkey") % 10 === 0)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = pr.select(col("l_orderkey"), col("l_partkey").as("p1"))
        .join(pr.select(col("l_orderkey"), col("l_partkey").as("p2")), "l_orderkey")
        .filter(col("p1") < col("p2"))
        .select(col("p1"), col("p2")).distinct()
      Graph.triangleCounts(edges, "p1", "p2").orderBy(col("node"))
    },
    Some("""WITH pr AS (
           |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
           |  WHERE l_orderkey % 10 = 0),
           |e AS (
           |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           |  FROM pr a JOIN pr b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
           |tri AS (
           |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
           |  FROM e e1 JOIN e e2 ON e2.u = e1.v
           |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
           |SELECT node, count(*) AS n_triangles
           |FROM (SELECT unnest([a, b, c]) AS node FROM tri)
           |GROUP BY node ORDER BY node""".stripMargin),
    "Degree-ordered orientation bounds the wedge join at O(m^1.5) rows total and — " +
      "the skew story — makes every hub a wedge TARGET, never a fan-out source. All " +
      "joins are node-keyed equi-joins; the pair space of the naive formulation " +
      "never materializes.")

  /** q129 — A1/E4: lagged cross-correlation between the hourly 'view'
    * and 'purchase' value series at lags 0..6h — the lead-indicator
    * readout. Hourly sums quantize to cents; Pearson r per lag comes
    * from the q82 closed form over exact integer sums, so the only
    * float ops (final division, sqrt) run on identical operands in
    * both engines. */
  val q129 = Declared(
    "q129_lag_corr", "A1,E4",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      def hourly(t: String, alias: String) = ev
        .filter(col("event_type") === t)
        .groupBy(expr("unix_micros(ts) div 3600000000").as("bin"))
        .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as(alias))
      val paired = hourly("view", "xc")
        .withColumn("lag", explode(sequence(lit(0L), lit(6L))))
        .join(hourly("purchase", "yc").withColumnRenamed("bin", "ybin"),
          col("ybin") === col("bin") + col("lag"))
      Aggregates.linearFitExact(paired, Seq(col("lag")), col("xc"), col("yc"))
        .select(col("lag"), col("n"), col("corr"))
        .orderBy(col("lag"))
    },
    Some("""WITH x AS (
           |  SELECT epoch_us(ts) // 3600000000 AS bin,
           |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS xc
           |  FROM events WHERE event_type = 'view' GROUP BY 1),
           |y AS (
           |  SELECT epoch_us(ts) // 3600000000 AS bin,
           |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS yc
           |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
           |p AS (
           |  SELECT l.lag, x.xc, y.yc
           |  FROM x CROSS JOIN (SELECT unnest(range(0, 7)) AS lag) l
           |  JOIN y ON y.bin = x.bin + l.lag),
           |a AS (
           |  SELECT lag, count(*) AS n,
           |    CAST(sum(xc) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy,
           |    CAST(sum(xc*yc) AS BIGINT) AS sxy,
           |    CAST(sum(xc*xc) AS BIGINT) AS sxx,
           |    CAST(sum(yc*yc) AS BIGINT) AS syy
           |  FROM p GROUP BY lag),
           |f AS (
           |  SELECT lag, n,
           |    CAST(n*sxy - sx*sy AS DOUBLE) AS covn,
           |    CAST(n*sxx - sx*sx AS DOUBLE) AS varxn,
           |    CAST(n*syy - sy*sy AS DOUBLE) AS varyn
           |  FROM a)
           |SELECT lag, n,
           |  CASE WHEN varxn <> 0 AND varyn <> 0
           |       THEN covn / (sqrt(varxn) * sqrt(varyn)) END AS corr
           |FROM f ORDER BY lag""".stripMargin),
    "Two hourly rollups (map-side partials, uniform bin keys) + a 7-way lag explode " +
      "joined on the bin id — |bins|·7 rows, not |events|·7 — then one exact-sum agg " +
      "per lag. The event table is scanned twice with pushed type filters, never " +
      "shuffled whole.")

  /** q130 — W2/F5: last-touch attribution — each purchase credits the
    * user's most recent preceding non-purchase event under the
    * (ts, event_id) total order; first-session purchases credit
    * '(none)'. IGNORE-NULLS last over the strict ROWS..−1 frame on
    * both engines; counts are integers, so the hash matches
    * unrounded. */
  val q130 = Declared(
    "q130_attribution", "W2,F5",
    (s, dir) =>
      EventAnalytics.lastTouchAttribution(Tables.events(s, dir),
          "user_id", "ts", "event_id", "event_type", "purchase")
        .orderBy(col("attributed_type")),
    Some("""WITH a AS (
           |  SELECT event_type, user_id,
           |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
           |               IGNORE NULLS)
           |      OVER (PARTITION BY user_id ORDER BY ts, event_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
           |  FROM events)
           |SELECT coalesce(touch, '(none)') AS attributed_type,
           |  count(*) AS conversions, count(DISTINCT user_id) AS users
           |FROM a WHERE event_type = 'purchase'
           |GROUP BY 1 ORDER BY attributed_type""".stripMargin),
    "One actor-partitioned window (uniform shuffle key) + a |event types|-row agg — " +
      "attribution as a single pass, not a per-conversion lookup. The classic " +
      "marketing-credit primitive at any event volume.")

  val all: Seq[Declared] = Seq(q125, q126, q127, q128, q129, q130)
}
