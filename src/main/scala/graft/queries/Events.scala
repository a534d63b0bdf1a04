package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.EventAnalytics

/** Round-4 (late) event-analytics coverage: concurrency profiles,
  * conversion funnels and retention cohorts — the ops-analytics
  * surface over the events stream. All-integer arithmetic: every
  * query hash-matches unrounded. */
object Events {

  /** q92 — W1/A5: sweep-line concurrency of 10-minute click sessions.
    * The engine's two-phase plan (per-day carry + day-partitioned
    * RANGE window) must equal the oracle's single global cumulative —
    * midnight-crossing intervals exercise the carry seam. */
  val q92 = Declared(
    "q92_concurrency", "W1,A5",
    (s, dir) => {
      val iv = Tables.events(s, dir).filter(col("event_type") === "click")
        .select(col("ts").as("s"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("e"))
      EventAnalytics.concurrencyProfile(iv, "s", "e")
        .orderBy(col("t"))
    },
    Some("""WITH iv AS (
           |  SELECT ts AS s, ts + INTERVAL 10 MINUTE AS e
           |  FROM events WHERE event_type = 'click'),
           |d AS (
           |  SELECT s AS t, 1 AS d FROM iv
           |  UNION ALL
           |  SELECT e AS t, -1 AS d FROM iv)
           |SELECT DISTINCT t,
           |  CAST(sum(d) OVER (
           |    ORDER BY t RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |    AS BIGINT) AS concurrency
           |FROM d
           |ORDER BY t""".stripMargin),
    "No global window: the per-day net rollup (|days| rows, broadcast) prefix-sums the " +
      "carry-in and the sweep cumulates inside day partitions — a year of 100TB events " +
      "is 365 independent sorts, with RANGE frames making equal instants tie-free.")

  /** The view→click→purchase reach-time CTEs shared by q93 and q122 —
    * ONE definition of the strictly-ordered funnel on the oracle side,
    * mirroring the single funnelReachTimes on the Spark side. */
  private val funnelCtes =
    """s1 AS (
      |  SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS t_view
      |  FROM events GROUP BY user_id),
      |s2 AS (
      |  SELECT s1.user_id, s1.t_view,
      |    min(e.ts) FILTER (WHERE e.event_type = 'click' AND e.ts > s1.t_view) AS t_click
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  GROUP BY s1.user_id, s1.t_view),
      |s3 AS (
      |  SELECT s2.user_id, s2.t_view, s2.t_click,
      |    min(e.ts) FILTER (WHERE e.event_type = 'purchase' AND e.ts > s2.t_click)
      |      AS t_purchase
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  GROUP BY s2.user_id, s2.t_view, s2.t_click)""".stripMargin

  /** q93 — A1/F5: strictly-ordered conversion funnel view → click →
    * purchase. Stage i is the first matching event strictly after
    * stage i−1 — conditional-min aggs, no per-event path walk. */
  val q93 = Declared(
    "q93_funnel", "A1,F5",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      EventAnalytics.funnelReachTimes(ev, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .agg(count(col("t_view")).as("reached_view"),
          count(col("t_click")).as("reached_click"),
          count(col("t_purchase")).as("reached_purchase"))
    },
    Some(s"""WITH $funnelCtes
            |SELECT count(t_view) AS reached_view,
            |       count(t_click) AS reached_click,
            |       count(t_purchase) AS reached_purchase
            |FROM s3""".stripMargin),
    "One actor-keyed conditional-min agg per stage (map-side partials; k stages = k " +
      "uniform shuffles on the actor id) — funnel semantics without materializing any " +
      "per-event path state; the final count is a 1-row reduce.")

  /** q94 — A1/F6: retention cohorts — actors cohort by first-seen day,
    * cell (cohort_day, k) counts distinct actors active exactly k days
    * later. Pure integer date arithmetic. */
  val q94 = Declared(
    "q94_retention", "A1,F6",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      EventAnalytics.retentionCohorts(ev, "user_id", "ts", maxDays = 7)
        .select(col("cohort_day"), col("k").cast("long").as("k"), col("users"))
        .orderBy(col("cohort_day"), col("k"))
    },
    Some("""WITH fs AS (
           |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
           |  FROM events GROUP BY user_id),
           |act AS (
           |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
           |SELECT cohort_day, CAST(d - cohort_day AS BIGINT) AS k, count(*) AS users
           |FROM act JOIN fs USING (user_id)
           |WHERE d - cohort_day BETWEEN 0 AND 7
           |GROUP BY cohort_day, k
           |ORDER BY cohort_day, k""".stripMargin),
    "Two actor-keyed aggs (first-seen, distinct active days) + one actor equi-join; " +
      "output is |days| × (maxDays+1) cells — bounded and broadcast-friendly however " +
      "large the event volume grows.")

  /** q98 — W-frame/A5: merge overlapping 10-minute click intervals per
    * user (gaps-and-islands). Island starts depend only on VALUES
    * (start vs running max end), so Spark's and DuckDB's tie orders
    * cannot diverge the grouping. */
  val q98 = Declared(
    "q98_interval_merge", "W-frame,A5",
    (s, dir) => {
      val iv = Tables.events(s, dir).filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("s"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("e"))
      EventAnalytics.mergeIntervals(iv, "user_id", "s", "e")
        .orderBy(col("user_id"), col("island_start"))
    },
    Some("""WITH iv AS (
           |  SELECT user_id, ts AS s, ts + INTERVAL 10 MINUTE AS e
           |  FROM events WHERE event_type = 'click'),
           |w AS (
           |  SELECT user_id, s, e,
           |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
           |  FROM iv),
           |f AS (
           |  SELECT user_id, s, e,
           |    CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS ni
           |  FROM w),
           |i AS (
           |  SELECT user_id, s, e,
           |    sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           |  FROM f)
           |SELECT user_id, min(s) AS island_start, max(e) AS island_end,
           |       count(*) AS n_intervals
           |FROM i GROUP BY user_id, island
           |ORDER BY user_id, island_start""".stripMargin),
    "One key-partitioned window sort (flags + island ids share it) and one map-side-" +
      "partial (key, island) agg; a hot key costs one partition sort. The merged spans " +
      "are what downstream joins should key on instead of raw bursty intervals.")

  /** q102 — W-frame/A1: first-order event-type transition matrix (the
    * Markov view of user journeys): per-user lead() pairs, counted,
    * with the row-conditional probability. The per-user order is made
    * TOTAL (ts, then event_id) so equal-timestamp neighbors can't pair
    * differently between engines; p is the same int/int division of
    * identical counts on both sides. */
  val q102 = Declared(
    "q102_transitions", "W-frame,A1",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
      pairs.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
        .withColumn("p", round(col("n") /
          sum(col("n")).over(Window.partitionBy(col("src"))), 6))
        .orderBy(col("src"), col("dst"))
    },
    Some("""WITH t AS (
           |  SELECT event_type AS src,
           |         lead(event_type) OVER (
           |           PARTITION BY user_id ORDER BY ts, event_id) AS dst
           |  FROM events),
           |c AS (SELECT src, dst, count(*) AS n
           |      FROM t WHERE dst IS NOT NULL GROUP BY src, dst)
           |SELECT src, dst, n,
           |       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src), 6) AS p
           |FROM c ORDER BY src, dst""".stripMargin),
    "One user-keyed window sort feeds a map-side-partial (src,dst) agg; the matrix is " +
      "|types|² rows, so the probability window runs on a broadcast-sized frame. Event " +
      "volume dies at the pair agg — the 100TB cost is the same sessionize sort q25 pays.")

  /** q106 — A1/E6: incremental aggregation — yesterday's partial agg
    * STATE merged with today's delta partials must equal a full
    * recompute, which is exactly what the oracle performs (single-pass
    * over all events). Sums ride in DECIMAL so the state+delta addition
    * is exact regardless of how history was partitioned into batches;
    * the mean is derived only after the merge. */
  val q106 = Declared(
    "q106_incremental_agg", "A1,E6",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("user_id")).agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      graft.ops.Aggregates.mergeAggStates(
          partial(ev.filter(col("ts") < cutoff)),
          partial(ev.filter(col("ts") >= cutoff)),
          "user_id", Seq("n", "sum_value"))
        .select(col("user_id"), col("n").cast("long").as("n"),
          col("sum_value").cast("double").as("sum_value"),
          (col("sum_value").cast("double") / col("n")).as("mean_value"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, count(*) AS n,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_value
           |FROM events
           |GROUP BY user_id
           |ORDER BY user_id""".stripMargin),
    "State and delta co-partition on the key; the merge join is the only shuffle and the " +
      "output is |keys|-sized. This swaps a 100TB history rescan for a |keys|+|delta| job — " +
      "the incremental-materialization kernel every nightly rollup reduces to.")

  /** q111 — W2/A1: deterministic MODE per key — the most frequent
    * event type per user with an explicit (count desc, type asc)
    * tie-break, because the built-in `mode()` aggregate picks an
    * arbitrary winner on ties and is therefore unusable under a
    * cross-engine hash gate (or any reproducibility contract). */
  val q111 = Declared(
    "q111_mode_per_key", "W2,A1",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n").desc, col("event_type"))
      counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"), col("n"))
        .orderBy(col("user_id"))
    },
    Some("""WITH c AS (
           |  SELECT user_id, event_type, count(*) AS n
           |  FROM events GROUP BY user_id, event_type),
           |r AS (
           |  SELECT user_id, event_type, n,
           |    row_number() OVER (PARTITION BY user_id
           |      ORDER BY n DESC, event_type) AS rn
           |  FROM c)
           |SELECT user_id, event_type AS mode_type, n
           |FROM r WHERE rn = 1
           |ORDER BY user_id""".stripMargin),
    "Volume collapses at the (user, type) partial agg; the ranking window runs on " +
      "|users|·|types| rows. The explicit tie-break is the point: reproducible winners " +
      "under any partitioning, which the built-in mode() does not promise.")

  /** q115 — A1/E6: per-user 3σ outlier flags with EXACT integer
    * arithmetic end to end (q82's discipline): values quantize to
    * centi-units, and the predicate |v−μ| > 3σ is compared SQUARED and
    * scaled by n² — (u·n − Σ)² > 9(nΣq − Σ²) — so no sqrt, no division
    * and no float enters the keep/drop decision on either engine. The
    * scaled comparison runs in DECIMAL(38,0)/HUGEINT: the n² factor
    * would overflow 64 bits for a key with ~3·10⁵ events — silently in
    * Spark, as an error in DuckDB — while 128-bit headroom holds to
    * ~10¹² events per key. Means/stds are derived for reporting only,
    * with identical operation order in both engines. */
  val q115 = Declared(
    "q115_outlier_flags", "A1,E6",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), round(col("value") * 100).cast("long").as("u"))
      val stats = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"),
        sum(col("u")).as("su"), sum(col("u") * col("u")).as("squ"))
      def big(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val dev = big(col("u")) * big(col("n")) - big(col("su"))
      ev.join(stats, "user_id")
        .select(col("user_id"), col("n"), col("su"), col("squ"),
          (dev * dev > big(lit(9L)) *
            (big(col("n")) * big(col("squ")) - big(col("su")) * big(col("su"))))
            .as("is_out"))
        .groupBy(col("user_id"), col("n"), col("su"), col("squ"))
        .agg(sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"))
        .select(col("user_id"), col("n"), col("n_outliers"),
          round(col("su").cast("double") / col("n") / 100, 6).as("mean_value"),
          round(sqrt((col("n") * col("squ") - col("su") * col("su")).cast("double"))
            / col("n") / 100, 6).as("std_value"))
        .orderBy(col("user_id"))
    },
    Some("""WITH ev AS (
           |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS u FROM events),
           |a AS (
           |  SELECT user_id, count(*) AS n, CAST(sum(u) AS BIGINT) AS su,
           |         CAST(sum(u * u) AS BIGINT) AS squ
           |  FROM ev GROUP BY user_id),
           |f AS (
           |  SELECT e.user_id, a.n, a.su, a.squ,
           |    CASE WHEN (CAST(e.u AS HUGEINT) * a.n - a.su)
           |               * (CAST(e.u AS HUGEINT) * a.n - a.su)
           |              > 9 * (CAST(a.n AS HUGEINT) * a.squ
           |                     - CAST(a.su AS HUGEINT) * a.su) THEN 1 ELSE 0 END AS o
           |  FROM ev e JOIN a ON e.user_id = a.user_id)
           |SELECT user_id, n, CAST(sum(o) AS BIGINT) AS n_outliers,
           |  round(CAST(su AS DOUBLE) / n / 100, 6) AS mean_value,
           |  round(sqrt(CAST(n * squ - su * su AS DOUBLE)) / n / 100, 6) AS std_value
           |FROM f GROUP BY user_id, n, su, squ
           |ORDER BY user_id""".stripMargin),
    "Two passes sharing one user_id partitioning: a partial-agg stats pass (3 longs per " +
      "user) and a flag pass against the joined stats — the stats side is |users|-sized, " +
      "so at 100TB it broadcasts and the flag decision is scan-side integer math. The " +
      "squared-inequality trick is what keeps an anomaly gate reproducible forever.")

  /** q122 — A5/A-quantile: TIME-to-convert distribution — for users
    * who completed the strictly-ordered view→click→purchase funnel
    * (q93's reach times), the view→purchase lag in seconds, summarized
    * as interpolated quartiles (q116's cross-engine definition). Lags
    * derive from integer microsecond differences, so the sort keys are
    * exact. */
  val q122 = Declared(
    "q122_conversion_lag", "A5,A-quantile",
    (s, dir) => {
      val reach = EventAnalytics.funnelReachTimes(Tables.events(s, dir),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      reach.filter(col("t_purchase").isNotNull)
        .select(((unix_micros(col("t_purchase")) - unix_micros(col("t_view")))
          .cast("double") / 1000000L).as("lag_s"))
        .agg(count(lit(1)).as("n_converted"),
          round(expr("percentile(lag_s, 0.25)"), 6).as("p25_s"),
          round(expr("percentile(lag_s, 0.5)"), 6).as("p50_s"),
          round(expr("percentile(lag_s, 0.75)"), 6).as("p75_s"))
    },
    Some(s"""WITH $funnelCtes,
            |l AS (
            |  SELECT CAST(epoch_us(t_purchase) - epoch_us(t_view) AS DOUBLE)
            |           / 1000000 AS lag_s
            |  FROM s3 WHERE t_purchase IS NOT NULL)
            |SELECT count(*) AS n_converted,
            |  round(quantile_cont(lag_s, 0.25), 6) AS p25_s,
            |  round(quantile_cont(lag_s, 0.5), 6) AS p50_s,
            |  round(quantile_cont(lag_s, 0.75), 6) AS p75_s
            |FROM l""".stripMargin),
    "The funnel's k actor-keyed aggs shrink everything to one row per converted user " +
      "before the quantile; the final sort is |converted|-sized, not event-sized. The " +
      "latency-distribution readout every growth dashboard runs.")

  val all: Seq[Declared] = Seq(q92, q93, q94, q98, q102, q106, q111, q115, q122)
}
