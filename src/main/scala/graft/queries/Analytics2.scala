package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, EventAnalytics, TimeSeriesOps}
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
    "LAYERED frontier BFS (round 8): each round joins edges against only the " +
      "newest LAYER, never the full label set — candidates dedupe then " +
      "anti-join the reached set, so AQE broadcast-joins the late tiny " +
      "frontiers; an empty layer proves the fixed point and exits early " +
      "with the identical result. Uniform keys, plan depth bounded by " +
      "3-round checkpoints. Blast-radius / contamination-trace " +
      "reachability at 100 TB.")

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

  /** q159 — E6: count-min sketch heavy-hitter estimates. The md5-keyed
    * hash family makes the d×w grid bit-identical on both engines, so
    * the oracle verifies the sketch EXACTLY — including the one-sided
    * error (est ≥ true for every probe), not just statistically. The
    * probe set is the top-20 true-frequency parts. */
  val q159 = Declared(
    "q159_count_min", "E6",
    (s, dir) => {
      import graft.ext.Sketches
      val li = Tables.lineitem(s, dir)
      val truth = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("true_cnt"))
      // two consumers (estimate probes + the final join-back): pin the
      // 20-row frame so the full-table truth agg runs once, not twice
      val probes = truth.orderBy(col("true_cnt").desc, col("l_partkey"))
        .limit(20).localCheckpoint()
      val sketch = Sketches.countMinBuild(li, col("l_partkey"),
        width = 512, depth = 4)
      Sketches.countMinEstimate(sketch, probes, col("l_partkey"),
          width = 512, depth = 4)
        // 20-row side: the checkpoint erased the limit's stats, so
        // without the hint this is a two-exchange sort-merge join
        .join(broadcast(probes.withColumnRenamed("l_partkey", "key")), "key")
        .select(col("key").as("l_partkey"), col("true_cnt"),
          col("est").as("est_cnt"))
        .orderBy(col("l_partkey"))
    },
    Some {
      // row j's bucket = j-th 8-hex-char chunk of md5(key), nibble-
      // reassembled to a 32-bit int (the q46 trick), mod width
      def bucket(j: Int, key: String) =
        s"""(SELECT CAST(sum(CAST(strpos('0123456789abcdef',
           |    substr(md5(CAST($key AS VARCHAR)), ${j * 8} + i, 1)) - 1
           |    AS BIGINT) << ((8 - i) * 4)) AS BIGINT)
           |  FROM (SELECT unnest(range(1, 9)) AS i)) % 512""".stripMargin
      val buildArms = (0 until 4).map(j =>
        s"SELECT $j AS row_j, ${bucket(j, "l_partkey")} AS bucket FROM lineitem")
        .mkString("\n    UNION ALL\n    ")
      val probeArms = (0 until 4).map(j =>
        s"SELECT l_partkey, true_cnt, $j AS row_j, " +
          s"${bucket(j, "l_partkey")} AS bucket FROM probes")
        .mkString("\n    UNION ALL\n    ")
      s"""WITH cells AS (
         |  SELECT row_j, bucket, count(*) AS cnt FROM (
         |    $buildArms)
         |  GROUP BY row_j, bucket),
         |truth AS (
         |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS true_cnt
         |  FROM lineitem GROUP BY 1),
         |probes AS (
         |  SELECT l_partkey, true_cnt FROM truth
         |  ORDER BY true_cnt DESC, l_partkey LIMIT 20),
         |pb AS (
         |    $probeArms)
         |SELECT pb.l_partkey, pb.true_cnt,
         |  CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est_cnt
         |FROM pb LEFT JOIN cells c
         |  ON pb.row_j = c.row_j AND pb.bucket = c.bucket
         |GROUP BY pb.l_partkey, pb.true_cnt
         |ORDER BY pb.l_partkey""".stripMargin
    },
    "The build's map-side combine collapses each partition to <= d*w cells before the " +
      "shuffle, so shuffle volume is d*w*partitions REGARDLESS of input size — the " +
      "frequency summary that fits in one executor's L2 at 100 TB; the sketch side " +
      "of the probe join broadcasts.")

  /** q160 — A5/W-frame: running balance clamped at zero (Lindley's
    * recursion) over per-user daily purchase−click cent deltas. The
    * engine runs the CLOSED FORM — P_t − min(0, min_{j≤t} P_j), one
    * window — while the oracle runs the naive recurrence
    * s_t = max(0, s_{t−1} + Δ_t) as a recursive CTE: the hash match
    * PROVES the reflection identity on real data. */
  val q160 = Declared(
    "q160_clamped_balance", "A5,W-frame",
    (s, dir) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val deltas = Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "click"))
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "purchase", cents)
          .otherwise(-cents)).as("delta"))
      TimeSeriesOps.clampedRunningBalance(deltas, Seq(col("user_id")),
          Seq(col("day")), col("delta"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""WITH RECURSIVE d AS (
           |  SELECT user_id, CAST(ts AS DATE) AS day,
           |    CAST(sum(CASE WHEN event_type = 'purchase'
           |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      ELSE -CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END)
           |      AS BIGINT) AS delta
           |  FROM events WHERE event_type IN ('purchase', 'click')
           |  GROUP BY 1, 2),
           |r AS (
           |  SELECT user_id, day, delta,
           |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
           |  FROM d),
           |s AS (
           |  SELECT user_id, day, delta, rn,
           |    greatest(CAST(0 AS BIGINT), delta) AS balance
           |  FROM r WHERE rn = 1
           |  UNION ALL
           |  SELECT r.user_id, r.day, r.delta, r.rn,
           |    greatest(CAST(0 AS BIGINT), s.balance + r.delta)
           |  FROM r JOIN s ON r.user_id = s.user_id AND r.rn = s.rn + 1)
           |SELECT user_id, day, delta, balance FROM s
           |ORDER BY user_id, day""".stripMargin),
    "The closed form runs as ONE key-partitioned window (two functions, one " +
      "shuffle+sort — the q07 envelope) on series of ANY length; the naive recurrence " +
      "the oracle uses would need a sequential fold per key. Inventory / credit-balance " +
      "semantics (stock can't go negative) at event volume, not rollup grain.")

  /** q161 — W-frame/A1: position-based (U-shaped, 40/20/40) multi-touch
    * attribution in exact basis points. First and last touch of each
    * conversion's segment get 4 000 bps, middles share 2 000 by floor
    * division with the leftover to the earliest middles — Σ ≡ 10 000
    * per conversion ALWAYS, the invariant float credit splitting
    * silently breaks. */
  val q161 = Declared(
    "q161_position_attrib", "W-frame,A1",
    (s, dir) =>
      EventAnalytics.positionAttribution(Tables.events(s, dir),
          "user_id", "ts", "event_id", "event_type", "purchase")
        .orderBy(col("attributed_type")),
    Some("""WITH seg AS (
           |  SELECT user_id, ts, event_id, event_type,
           |    coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY user_id ORDER BY ts, event_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
           |  FROM events),
           |touches AS (
           |  SELECT user_id, seg, ts, event_id, event_type AS touch
           |  FROM seg WHERE event_type <> 'purchase'),
           |convs AS (
           |  SELECT user_id, seg FROM seg WHERE event_type = 'purchase'),
           |att AS (
           |  SELECT t.* FROM touches t
           |  WHERE EXISTS (SELECT 1 FROM convs c
           |    WHERE c.user_id = t.user_id AND c.seg = t.seg)),
           |pos AS (
           |  SELECT touch,
           |    row_number() OVER (PARTITION BY user_id, seg
           |      ORDER BY ts, event_id) AS p,
           |    count(*) OVER (PARTITION BY user_id, seg) AS n
           |  FROM att),
           |credit AS (
           |  SELECT touch,
           |    CASE WHEN n = 1 THEN 10000
           |         WHEN n = 2 THEN 5000
           |         WHEN p = 1 OR p = n THEN 4000
           |         ELSE 2000 // (n - 2) +
           |           CASE WHEN p - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END
           |    END AS credit_bps
           |  FROM pos),
           |orphan AS (
           |  SELECT '(none)' AS touch, 10000 AS credit_bps FROM convs c
           |  WHERE NOT EXISTS (SELECT 1 FROM touches t
           |    WHERE t.user_id = c.user_id AND t.seg = c.seg)),
           |u AS (SELECT * FROM credit UNION ALL SELECT * FROM orphan)
           |SELECT touch AS attributed_type, count(*) AS touches,
           |  CAST(sum(credit_bps) AS BIGINT) AS credit_bps
           |FROM u GROUP BY 1 ORDER BY 1""".stripMargin),
    "Segment ids and positions are two functions over ONE actor-keyed window sort; " +
      "the credit formula is scan-side integer arithmetic — the q07 cost envelope. " +
      "Exact bps mean per-channel revenue splits reconcile to the cent at 100 TB.")

  /** q162 — E6/A1: join-key skew audit of orders.o_custkey — the
    * pre-flight check that decides salting / AQE-skew / nothing for a
    * key BEFORE the big join runs. Exact lower p50/p99 via the integer
    * crossing test over the |keys|-row count rollup. */
  val q162 = Declared(
    "q162_skew_audit", "E6,A1",
    (s, dir) =>
      Aggregates.skewAudit(Tables.orders(s, dir), col("o_custkey")),
    Some("""WITH r AS (
           |  SELECT o_custkey AS k, count(*) AS cnt FROM orders GROUP BY 1),
           |w AS (
           |  SELECT k, cnt, row_number() OVER (ORDER BY cnt, k) AS rn,
           |    count(*) OVER () AS kk, sum(cnt) OVER () AS nn
           |  FROM r)
           |SELECT CAST(max(nn) AS BIGINT) AS n_rows,
           |  CAST(max(kk) AS BIGINT) AS n_keys,
           |  CAST(max(cnt) AS BIGINT) AS max_cnt,
           |  CAST((max(cnt) * 1000000) // CAST(max(nn) AS BIGINT) AS BIGINT)
           |    AS top_share_ppm,
           |  CAST(min(CASE WHEN rn * 100 >= kk * 50 THEN cnt END) AS BIGINT)
           |    AS p50_cnt,
           |  CAST(min(CASE WHEN rn * 100 >= kk * 99 THEN cnt END) AS BIGINT)
           |    AS p99_cnt,
           |  CAST(max(cnt) AS DOUBLE) /
           |    CAST(min(CASE WHEN rn * 100 >= kk * 50 THEN cnt END) AS DOUBLE)
           |    AS hot_ratio
           |FROM w""".stripMargin),
    "One key-keyed count agg (map-side combine) + a |keys|-row window: the audit " +
      "costs one pass at any volume. This is E6 made operational — the number that " +
      "tells you whether the NEXT job needs `Salting.saltedJoin` before it straggles.")

  /** q163 — A-stat/A8: Kaplan–Meier user-survival curve. Duration =
    * days between a user's first and last event; users still active in
    * the last 5 observed days are CENSORED (they leave the risk set
    * without counting as churn) — the distinction naive retention
    * curves miss. Survival state is integer ppm, so the oracle's
    * recursive CTE unrolling S_k = (S_{k−1}·(n_k−d_k)) div n_k must
    * match bit-for-bit. */
  val q163 = Declared(
    "q163_kaplan_meier", "A-stat,A8",
    (s, dir) => {
      val per = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("fd"), max(to_date(col("ts"))).as("ld"))
      val subj = per
        .crossJoin(broadcast(per.agg(max(col("ld")).as("obs_end"))))
        .select(datediff(col("ld"), col("fd")).as("dur"),
          (col("ld") < date_sub(col("obs_end"), 5)).cast("int").as("churned"))
      EventAnalytics.kaplanMeier(subj, col("dur"), col("churned"))
        .orderBy(col("t"))
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
           |  FROM w JOIN s ON w.rn = s.rn + 1)
           |SELECT t, n_risk, d AS d_events, CAST(surv AS BIGINT) AS surv_ppm
           |FROM s ORDER BY t""".stripMargin),
    "The curve folds over the DISTINCT-DURATION rollup (calendar-bounded, ~30 rows), " +
      "never the subject table — one duration-keyed agg + a rollup-sized suffix window. " +
      "Churn/retention with correct censoring at any subject count.")

  /** q164 — W2/A-stat: NDCG@10 per user — does arrival order agree
    * with value order? The offline ranking-eval metric, exact: the
    * position discounts are LITERAL ppm constants (like q158's Benford
    * table — no runtime log2), DCG/IDCG are integer sums, and the one
    * float op divides identical exact operands. */
  val q164 = Declared(
    "q164_ndcg", "W2,A-stat",
    (s, dir) => {
      val rel = coalesce(
        (col("value").cast("decimal(18,2)") * 100).cast("long"), lit(0L))
      graft.ops.Ranking.ndcgAtK(
          Tables.events(s, dir).withColumn("__rel", rel),
          col("user_id"), Seq(col("ts"), col("event_id")), col("__rel"), 10)
        .select(col("key").as("user_id"), col("n_items"), col("dcg_u"),
          col("idcg_u"), round(col("ndcg"), 6).as("ndcg"))
        .orderBy(col("user_id"))
    },
    Some {
      val list = graft.ops.Ranking.NdcgDiscountPpm.mkString("[", ", ", "]")
      s"""WITH d AS (
         |  SELECT user_id, ts, event_id,
         |    coalesce(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), 0)
         |      AS rel
         |  FROM events),
         |p AS (
         |  SELECT user_id, rel,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS p,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY rel DESC, ts, event_id) AS ip
         |  FROM d),
         |a AS (
         |  SELECT user_id,
         |    CAST(sum(CASE WHEN p <= 10 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_items,
         |    CAST(sum(CASE WHEN p <= 10 THEN rel * ($list)[p]
         |      ELSE 0 END) AS BIGINT) AS dcg_u,
         |    CAST(sum(CASE WHEN ip <= 10 THEN rel * ($list)[ip]
         |      ELSE 0 END) AS BIGINT) AS idcg_u
         |  FROM p GROUP BY user_id)
         |SELECT user_id, n_items, dcg_u, idcg_u,
         |  CASE WHEN idcg_u > 0
         |    THEN round(CAST(dcg_u AS DOUBLE) / CAST(idcg_u AS DOUBLE), 6)
         |  END AS ndcg
         |FROM a ORDER BY user_id""".stripMargin
    },
    "Two row_number windows over the SAME user partitioning — one shuffle, two " +
      "in-partition sorts; the discount lookup is a scan-side array index. The " +
      "serving-log replay metric at 100 TB: exact integer DCG sums reconcile across " +
      "reruns, cluster layouts and engines.")

  /** q165 — W2/E6: systematic 1-in-100 sample by EXACT global rank —
    * the auditable sampling design (every 100th row of a total order)
    * that hash sampling can't give you. Runs on
    * [[graft.ops.Ranking.globalRowNumber]], so no single-partition
    * window touches the fact table; the oracle's plain row_number
    * proves the distributed rank exact. */
  val q165 = Declared(
    "q165_systematic_sample", "W2,E6",
    (s, dir) => {
      // (orderkey, linenumber) is NOT unique in this generator's data —
      // the order must be total or the two engines sample different
      // rows; six columns pin it at every SF
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_returnflag"), col("l_extendedprice"))
      graft.ops.Ranking.globalRowNumber(li,
          Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_extendedprice"), col("l_quantity")))
        .filter(pmod(col("row_num"), lit(100L)) === 1)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_sampled"),
          sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")).as("sum_cents"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH r AS (
           |  SELECT l_returnflag, l_extendedprice,
           |    row_number() OVER (ORDER BY l_orderkey, l_linenumber,
           |      l_partkey, l_suppkey, l_extendedprice, l_quantity) AS rn
           |  FROM lineitem)
           |SELECT l_returnflag, count(*) AS n_sampled,
           |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
           |    AS BIGINT)) AS BIGINT) AS sum_cents
           |FROM r WHERE rn % 100 = 1
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    "The rank comes from range repartition + per-partition windows + a bounded offset " +
      "rollup (q127's machinery) — no global sort bottleneck; the 1-in-k predicate is " +
      "scan-side. Systematic designs beat Bernoulli sampling for audits because the " +
      "inclusion set is a pure function of the total order — rerunnable bit-for-bit.")

  /** q166 — E3+: fixed-iteration integer k-means over the embeddings
    * (k = 4, 3 Lloyd rounds, micro-unit quantization). Float k-means
    * cannot reproduce itself across two runs (reduce-order centroid
    * sums); the integer form is a pure function of the input, so the
    * oracle unrolling the SAME rounds as chained CTEs must agree on
    * every assignment AND every exact squared distance. */
  val q166 = Declared(
    "q166_kmeans", "E3+,E6",
    (s, dir) =>
      graft.ext.Clustering.kMeansInt(Tables.embeddings(s, dir),
          "vec_id", "embedding", k = 4, iters = 3)
        .select(col("id").as("vec_id"), col("cluster"), col("dist2"))
        .orderBy(col("vec_id")),
    Some {
      def dist(tag: String, cs: String) =
        s"""d$tag AS (
           |  SELECT p.id, c.ck, sum((p.q - c.c) * (p.q - c.c)) AS dist2
           |  FROM pts p JOIN $cs c ON p.d = c.d GROUP BY p.id, c.ck),
           |a$tag AS (
           |  SELECT id, ck, dist2 FROM (
           |    SELECT id, ck, dist2,
           |      row_number() OVER (PARTITION BY id ORDER BY dist2, ck) AS rn
           |    FROM d$tag) WHERE rn = 1)""".stripMargin
      val rounds = (1 to 3).map { i =>
        s"""${dist(i.toString, s"c${i - 1}")},
           |u$i AS (
           |  SELECT a.ck, p.d, CAST(sum(p.q) // count(*) AS BIGINT) AS c
           |  FROM pts p JOIN a$i a USING (id) GROUP BY a.ck, p.d),
           |c$i AS (
           |  SELECT c.ck, c.d, coalesce(u.c, c.c) AS c
           |  FROM c${i - 1} c LEFT JOIN u$i u ON c.ck = u.ck AND c.d = u.d)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH pts AS (
         |  SELECT vec_id AS id, i - 1 AS d,
         |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT)
         |      AS q
         |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx),
         |init AS (
         |  SELECT id, row_number() OVER (ORDER BY id) - 1 AS ck
         |  FROM (SELECT DISTINCT id FROM pts) ORDER BY id LIMIT 4),
         |c0 AS (
         |  SELECT init.ck, pts.d, pts.q AS c FROM pts JOIN init USING (id)),
         |$rounds,
         |${dist("f", "c3")}
         |SELECT id AS vec_id, CAST(ck AS BIGINT) AS cluster,
         |  CAST(dist2 AS BIGINT) AS dist2
         |FROM af ORDER BY vec_id""".stripMargin
    },
    "Points live in checkpointed LONG form re-read per round; a round is one " +
      "broadcast-joined distance agg keyed on (id, cluster) + one (cluster, dim) " +
      "mean agg — centroids are k*d rows and ALWAYS broadcast, so the per-round " +
      "shuffle is one pass over the points. Fixed rounds, zero driver traffic: the " +
      "semantic-clustering step between dedup and mixture balancing at corpus scale.")

  /** q167 — E3+/A1: exact dimension correlation matrix over the first
    * 16 embedding components — q82's closed form lifted to a matrix.
    * Co-moments are DECIMAL(38,0)/HUGEINT integers; ÷ and √ are
    * correctly-rounded IEEE over identical operands, so the matrix
    * hash-compares UNROUNDED. */
  val q167 = Declared(
    "q167_corr_matrix", "E3+,A1",
    (s, dir) =>
      graft.ext.Clustering.correlationMatrix(
          Tables.embeddings(s, dir), "embedding", dims = 16)
        .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          col("n"), col("spp"), col("corr"))
        .orderBy(col("i"), col("j")),
    Some("""WITH q AS (
           |  SELECT list_transform(embedding,
           |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS qv
           |  FROM embeddings),
           |p AS (
           |  SELECT ii.i, jj.j, qv[ii.i + 1] AS x, qv[jj.j + 1] AS y
           |  FROM q,
           |    (SELECT unnest(range(0, 16)) AS i) ii,
           |    (SELECT unnest(range(0, 16)) AS j) jj
           |  WHERE jj.j >= ii.i),
           |s AS (
           |  SELECT i, j, count(*) AS n,
           |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
           |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
           |  FROM p GROUP BY 1, 2),
           |m AS (
           |  SELECT i, j, n, CAST(n AS HUGEINT) * sxy - sx * sy AS spp
           |  FROM s),
           |v AS (SELECT i AS k, CAST(spp AS DOUBLE) AS sppk FROM m WHERE i = j)
           |SELECT m.i, m.j, n, CAST(m.spp AS DOUBLE) AS spp,
           |  CASE WHEN vi.sppk > 0 AND vj.sppk > 0
           |    THEN CAST(m.spp AS DOUBLE) / (sqrt(vi.sppk) * sqrt(vj.sppk))
           |  END AS corr
           |FROM m JOIN v vi ON m.i = vi.k JOIN v vj ON m.j = vj.k
           |ORDER BY m.i, m.j""".stripMargin),
    "The pair explode is dims^2-bounded PER ROW (never |rows|^2); one (i, j)-keyed " +
      "agg with map-side partials does the rest, and the diagonal joins back from a " +
      "broadcast |dims|-row frame. The feature-redundancy screen before any " +
      "distance-based pipeline stage, exact at any corpus size.")

  /** q168 — E7: hybrid retrieval via reciprocal-rank fusion — the
    * lexical BM25 list (q74's scorer) and the vector cosine list
    * (q44's scorer) merged WITHOUT score calibration: each list
    * contributes 10⁶ div (60 + rank). RRF is how production hybrid
    * search actually combines incomparable retrievers; integer
    * quotients make the fusion exact cross-engine. */
  val q168 = Declared(
    "q168_rrf_fusion", "E7,E3",
    (s, dir) => {
      import graft.ext.{Curation, Similarity}
      import org.apache.spark.sql.expressions.Window
      // by-design: both rank windows run over term-filtered / top-k
      // score lists (<= corpus-vocab rows, cut to 50) — never the corpus
      graft.plans.Guardrails.expect("single_partition_window",
        "rank, vec_id, cosine", "q168: top-k cosine list rank (k=50)",
    "k-literal")
      graft.plans.Guardrails.expect("single_partition_window",
        "rank, doc_id, score", "q168: term-filtered BM25 list rank",
    "rollup")
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      val bm = Curation.bm25Scores(docs, "text", "doc_id",
          Seq("table", "fast", "join"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rank") <= 50)
        .select(col("doc_id").as("id"), col("rank"))
      val probe = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val cos = Similarity.topKCosine(
          Tables.embeddings(s, dir)
            .filter(col("vec_id") =!= 0 && col("vec_id") < 300),
          "embedding", "vec_id", probe, k = 50)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cosine").desc, col("vec_id"))))
        .select(col("vec_id").as("id"), col("rank"))
      Curation.reciprocalRankFusion(Seq(bm, cos), "id", "rank")
        .orderBy(col("rrf_u").desc, col("id")).limit(20)
    },
    Some("""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
           |tk AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM corpus),
           |dl AS (SELECT doc_id, len(toks) AS dl FROM tk),
           |tok AS (SELECT doc_id, unnest(toks) AS term FROM tk),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
           |       WHERE term IN ('table', 'fast', 'join') GROUP BY doc_id, term),
           |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
           |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
           |          FROM dl),
           |contrib AS (
           |  SELECT tf.doc_id,
           |    CAST(round(ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
           |      * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
           |      * 1e6, 0) AS BIGINT) AS cu
           |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
           |bm AS (SELECT doc_id, round(CAST(sum(cu) AS DOUBLE) / 1e6, 6) AS score
           |       FROM contrib GROUP BY doc_id),
           |bmrank AS (
           |  SELECT doc_id AS id,
           |    row_number() OVER (ORDER BY score DESC, doc_id) AS r
           |  FROM bm),
           |qv AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           |       FROM embeddings WHERE vec_id = 0),
           |scored AS (
           |  SELECT vec_id,
           |    list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qv)
           |      / (sqrt(list_dot_product(qv, qv))
           |         * sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
           |                                 list_transform(embedding, x -> CAST(x AS DOUBLE))))) AS c
           |  FROM embeddings, qv WHERE vec_id <> 0 AND vec_id < 300),
           |cosrank AS (
           |  SELECT vec_id AS id, row_number() OVER (ORDER BY c DESC, vec_id) AS r
           |  FROM (SELECT * FROM scored ORDER BY c DESC, vec_id LIMIT 50)),
           |u AS (
           |  SELECT id, 1000000 // (60 + r) AS s FROM bmrank WHERE r <= 50
           |  UNION ALL
           |  SELECT id, 1000000 // (60 + r) AS s FROM cosrank)
           |SELECT id, count(*) AS n_lists, CAST(sum(s) AS BIGINT) AS rrf_u
           |FROM u GROUP BY id
           |ORDER BY rrf_u DESC, id LIMIT 20""".stripMargin),
    "Each retriever is already rank-bounded (top-50), so the fusion is one union + " +
      "one id-keyed agg over |lists|*k rows — the cheap last stage of hybrid search. " +
      "The ranking windows run over retriever outputs (bounded), never corpus rows. " +
      "This is the RAG-era read path: lexical recall + semantic recall, exact merge.")

  /** q169 — E6: order-invariant dataset fingerprints per return flag —
    * count + SUM + XOR of a portable per-row md5. Addition and XOR
    * commute, so any row order / partitioning / file layout / engine
    * yields the identical signature: replica verification without
    * sorting the table. Money renders through DECIMAL(18,2) (double
    * formatting is NOT engine-portable; decimal is). */
  val q169 = Declared(
    "q169_fingerprint", "E6",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity").cast("long").as("l_qty"),
        col("l_extendedprice").cast("decimal(18,2)").as("l_price"))
      Aggregates.datasetFingerprint(li, Seq(col("l_returnflag")),
          Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_qty", "l_price"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""WITH r AS (
            |  SELECT l_returnflag,
            |    ${LlmExt2.duckMd5Hash60(
      "concat_ws(chr(1), CAST(l_orderkey AS VARCHAR), " +
        "CAST(l_linenumber AS VARCHAR), CAST(l_partkey AS VARCHAR), " +
        "CAST(l_suppkey AS VARCHAR), CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), " +
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR))")} AS h
            |  FROM lineitem)
            |SELECT l_returnflag, count(*) AS n_rows,
            |  CAST(CAST(sum(h) AS HUGEINT) % 2305843009213693951 AS BIGINT)
            |    AS sum_sig, bit_xor(h) AS xor_sig
            |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    "One scan + one group agg with map-side partials; compare |groups|-row " +
      "fingerprints instead of sorting and diffing 100 TB. The migration/replication " +
      "audit primitive — and because + and XOR commute, two 1000-executor runs with " +
      "completely different layouts still produce bit-equal signatures.")

  /** q170 — E6/J1: join-cardinality audit of orders ⋈ customer —
    * |A ⋈ B| and key overlap computed from the two key ROLLUPS,
    * without materializing the join. The pre-flight that catches
    * fan-out joins before they multiply 100 TB. */
  val q170 = Declared(
    "q170_join_cardinality", "E6,J1",
    (s, dir) =>
      Aggregates.joinCardinality(
        Tables.orders(s, dir), col("o_custkey"),
        Tables.customer(s, dir), col("c_custkey")),
    Some("""WITH ra AS (SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY 1),
           |rb AS (SELECT c_custkey AS k, count(*) AS cb FROM customer GROUP BY 1),
           |j AS (SELECT ra.ca, rb.cb FROM ra FULL OUTER JOIN rb USING (k))
           |SELECT CAST(sum(ca) AS BIGINT) AS rows_a,
           |  CAST(sum(cb) AS BIGINT) AS rows_b,
           |  count(ca) AS keys_a, count(cb) AS keys_b,
           |  CAST(sum(CASE WHEN ca IS NOT NULL AND cb IS NOT NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS keys_matched,
           |  CAST(sum(CAST(ca AS HUGEINT) * cb) AS BIGINT) AS inner_rows,
           |  CAST(max(CAST(ca AS HUGEINT) * cb) AS BIGINT) AS max_fanout
           |FROM j""".stripMargin),
    "Two key-keyed count aggs + one |keys|-sized join; the fact rows are scanned " +
      "once each and never joined. Paired with q162's skew audit, this is the " +
      "planning pass a 100 TB join pipeline runs before committing executor-hours.")

  val all: Seq[Declared] = Seq(q154, q155, q156, q157, q158, q159, q160,
    q161, q162, q163, q164, q165, q166, q167, q168, q169, q170)
}
