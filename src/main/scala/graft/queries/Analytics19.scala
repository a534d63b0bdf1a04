package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, EventAnalytics, Features, Layout}

/** Round-4 batch 38: Hilbert-curve layout keys, capped sessionization,
  * transition trigrams, paired-classifier comparison (McNemar), serial
  * randomness (runs test) and scorecard encoding (WoE/IV). Exactness
  * discipline unchanged. */
object Analytics19 {

  /** q309 — E6/F7: Hilbert curve key over the q38 feature lattice
    * (bits = 7) — the locality-superior alternative to q38's Morton
    * key: every unit key step moves one cell, so 2-D range scans touch
    * fewer row groups at identical key-computation cost. The unrolled
    * per-level fold replays in the oracle CTE chain. */
  val q309 = Declared(
    "q309_hilbert_key", "E6,F7",
    (s, dir) => Spatial.features(s, dir).select(col("feature_id"),
        Layout.hilbertKey(col("x"), col("y"), 0.0, 100.0, 0.0, 100.0,
          bits = 7).as("hkey"))
      .orderBy(col("feature_id")),
    Some {
      s"""WITH feats AS (
         |  SELECT p_partkey AS feature_id,
         |    CAST((p_partkey * 29) % 100 AS DOUBLE) AS x,
         |    CAST((p_partkey * 53) % 100 AS DOUBLE) AS y
         |  FROM part),
         |hl0 AS (
         |  SELECT feature_id,
         |    greatest(0, least(127,
         |      CAST(floor((x - 0.0) / 100.0 * 128.0) AS BIGINT))) AS x,
         |    greatest(0, least(127,
         |      CAST(floor((y - 0.0) / 100.0 * 128.0) AS BIGINT))) AS y,
         |    CAST(0 AS BIGINT) AS d
         |  FROM feats),
         |${Layout.hilbertOracleSteps(7, "feature_id")}
         |SELECT feature_id, d AS hkey FROM hl7
         |ORDER BY feature_id""".stripMargin
    },
    "Pure scan-side integer arithmetic (7 unrolled levels, no UDF, " +
      "codegen-friendly) — the same cost envelope as q38's Morton key " +
      "with strictly better neighbor locality for the writeZordered-style " +
      "layout rewrite.")

  /** q310 — A5/W1: capped sessionization of the event stream — 30-min
    * inactivity gap OR 2-hour total-span cap starts a new session; the
    * cap is the genuine session_window gap (always-on bots never
    * rotate without it). Integer-µs fold, recursive-CTE oracle. */
  val q310 = Declared(
    "q310_capped_sessions", "A5,W1",
    (s, dir) => EventAnalytics.cappedSessionize(Tables.events(s, dir),
        "user_id", "ts", "event_id", gapSeconds = 1800L, capSeconds = 7200L)
      .orderBy(col("user_id"), col("ts"), col("event_id")),
    Some("""WITH RECURSIVE e AS (
           |  SELECT user_id, epoch_us(ts) AS t, event_id AS ev
           |  FROM events),
           |rn AS (SELECT user_id, t, ev,
           |    row_number() OVER (PARTITION BY user_id ORDER BY t, ev) AS i
           |  FROM e),
           |rec AS (
           |  SELECT user_id, t, ev, i, CAST(0 AS BIGINT) AS si, t AS st
           |  FROM rn WHERE i = 1
           |  UNION ALL
           |  SELECT r.user_id, r.t, r.ev, r.i,
           |    CASE WHEN r.t - p.t > 1800000000
           |           OR r.t - p.st > 7200000000
           |      THEN p.si + 1 ELSE p.si END,
           |    CASE WHEN r.t - p.t > 1800000000
           |           OR r.t - p.st > 7200000000
           |      THEN r.t ELSE p.st END
           |  FROM rn r JOIN rec p ON r.user_id = p.user_id
           |    AND r.i = p.i + 1)
           |SELECT user_id, make_timestamp(t) AS ts, ev AS event_id,
           |  si AS session_idx, st AS session_start_us
           |FROM rec ORDER BY user_id, ts, event_id""".stripMargin),
    "One actor-keyed agg collects each actor's events (the q25 " +
      "envelope); the split fold is scan-side integer-µs comparisons. The " +
      "session definition q103's session_window cannot express.")

  /** q311 — A-stat/W-frame: top-15 event-type transition TRIPLES —
    * the loop-exposing view one order deeper than q102's matrix.
    * Exact counts; lexicographic tie-break pins the top-K cut. */
  val q311 = Declared(
    "q311_transition_triples", "A-stat,W-frame",
    (s, dir) => EventAnalytics.topTransitionTriples(Tables.events(s, dir),
      col("user_id"), col("ts"), col("event_id"), col("event_type"),
      topK = 15),
    Some("""WITH w AS (SELECT event_type AS t1,
           |    lead(event_type, 1) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS t2,
           |    lead(event_type, 2) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS t3
           |  FROM events),
           |g AS (SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n FROM w
           |      WHERE t2 IS NOT NULL AND t3 IS NOT NULL GROUP BY 1, 2, 3)
           |SELECT t1, t2, t3, n FROM g
           |ORDER BY n DESC, t1, t2, t3 LIMIT 15""".stripMargin),
    "ONE actor-keyed window sort yields both leads; the count agg is " +
      "|types|³-bounded with map-side combine. view→click→view loops are " +
      "invisible in the bigram matrix and obvious here.")

  /** q312 — A-stat/ML: McNemar's paired comparison of the q280
    * ship-date rule against a quantity rule on the SAME lines — only
    * the discordant cells decide. Continuity-corrected χ², exact
    * integer cells. */
  val q312 = Declared(
    "q312_mcnemar", "A-stat,ML",
    (s, dir) => Aggregates.mcNemar(Tables.lineitem(s, dir),
      col("l_shipdate") < lit("1998-05-24").cast("date"),
      col("l_quantity") >= 25,
      col("l_returnflag") === "R"),
    Some("""WITH c AS (
           |  SELECT (l_shipdate < DATE '1998-05-24') =
           |      (l_returnflag = 'R') AS aok,
           |    (l_quantity >= 25) = (l_returnflag = 'R') AS bok
           |  FROM lineitem),
           |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN aok AND bok THEN 1 ELSE 0 END) AS BIGINT)
           |      AS both_right,
           |    CAST(sum(CASE WHEN aok AND NOT bok THEN 1 ELSE 0 END)
           |      AS BIGINT) AS only_a,
           |    CAST(sum(CASE WHEN NOT aok AND bok THEN 1 ELSE 0 END)
           |      AS BIGINT) AS only_b,
           |    CAST(sum(CASE WHEN NOT aok AND NOT bok THEN 1 ELSE 0 END)
           |      AS BIGINT) AS both_wrong
           |  FROM c),
           |f AS (SELECT *,
           |    CASE WHEN only_a + only_b > 0 THEN
           |      round(CAST(CAST(abs(only_a - only_b) - 1 AS HUGEINT) *
           |        (abs(only_a - only_b) - 1) AS DOUBLE) /
           |        CAST(only_a + only_b AS DOUBLE), 6)
           |    END AS chi2
           |  FROM g)
           |SELECT n, both_right, only_a, only_b, both_wrong, chi2,
           |  coalesce(chi2 > 3.841459, false) AS significant
           |FROM f""".stripMargin),
    "One conditional-sum agg over the fact table (map-side combine) and a " +
      "1-row finish. The PAIRED readout — an unpaired q186 comparison on " +
      "the same rows wastes the pairing and loses its power.")

  /** q313 — A-stat/A8: runs test on the daily up/down sequence of
    * order counts — too few runs = streaky (serial dependence), too
    * many = alternation; either way i.i.d.-based intervals on the
    * series are wrong. Exact run count; pinned z. */
  val q313 = Declared(
    "q313_runs_test", "A-stat,A8",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("d"))
        .agg(count(lit(1)).as("v"))
      val ups = daily
        .withColumn("__pv", lag(col("v"), 1).over(Window.orderBy(col("d"))))
        .filter(col("__pv").isNotNull)
      Aggregates.runsTest(ups, col("d"), col("v") > col("__pv"))
    },
    Some("""WITH daily AS (
           |  SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1),
           |ups AS (SELECT d, v, lag(v) OVER (ORDER BY d) AS pv FROM daily),
           |f AS (SELECT d, CASE WHEN v > pv THEN 1 ELSE 0 END AS fl
           |      FROM ups WHERE pv IS NOT NULL),
           |r AS (SELECT d, fl, lag(fl) OVER (ORDER BY d) AS pfl FROM f),
           |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(fl) AS BIGINT) AS n_ones,
           |    CAST(sum(CASE WHEN pfl IS NULL OR fl <> pfl THEN 1 ELSE 0
           |      END) AS BIGINT) AS n_runs
           |  FROM r)
           |SELECT n, n_ones, n_runs,
           |  CASE WHEN n_ones > 0 AND n_ones < n THEN
           |    round((CAST(n_runs AS DOUBLE) -
           |      (2.0 * CAST(n_ones AS DOUBLE) *
           |       CAST(n - n_ones AS DOUBLE) / CAST(n AS DOUBLE) + 1.0)) /
           |      sqrt(((2.0 * CAST(n_ones AS DOUBLE) *
           |         CAST(n - n_ones AS DOUBLE) / CAST(n AS DOUBLE) + 1.0)
           |         - 1.0) *
           |        ((2.0 * CAST(n_ones AS DOUBLE) *
           |         CAST(n - n_ones AS DOUBLE) / CAST(n AS DOUBLE) + 1.0)
           |         - 2.0) / (CAST(n AS DOUBLE) - 1.0)), 6)
           |  END AS z
           |FROM g""".stripMargin),
    "The sequence is the day rollup (calendar-bounded — the q251 " +
      "altitude); the run count is one lag window + one 1-row finish. The " +
      "i.i.d. sanity check under every daily-series CI in this suite.")

  /** q39 — ML/A-stat: WoE encoding + Information Value of order
    * priority against order fulfillment — the scorecard encoding and
    * the 'is this feature worth keeping' readout. Laplace-smoothed
    * shares, nano-quantized terms. */
  val q39 = Declared(
    "q39_woe_iv", "ML,A-stat",
    (s, dir) => Features.woeEncoding(Tables.orders(s, dir),
        col("o_orderpriority"), col("o_orderstatus") === "F")
      .orderBy(col("category")),
    Some("""WITH cells AS (
           |  SELECT o_orderpriority AS category,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_event
           |  FROM orders GROUP BY 1),
           |tot AS (SELECT CAST(sum(n_event) AS BIGINT) AS te,
           |    CAST(sum(n - n_event) AS BIGINT) AS tn,
           |    CAST(count(*) AS BIGINT) AS k FROM cells),
           |t AS (SELECT category, n, n_event,
           |    CAST(n_event + 1 AS DOUBLE) / CAST(te + k AS DOUBLE) AS pe,
           |    CAST(n - n_event + 1 AS DOUBLE) / CAST(tn + k AS DOUBLE)
           |      AS pn
           |  FROM cells CROSS JOIN tot),
           |t2 AS (SELECT category, n, n_event,
           |    CAST(round(ln(pe / pn) * 1e9, 0) AS BIGINT) AS woe_nano,
           |    CAST(round((pe - pn) * ln(pe / pn) * 1e9, 0) AS BIGINT)
           |      AS ivn
           |  FROM t),
           |s AS (SELECT CAST(sum(ivn) AS BIGINT) AS si FROM t2)
           |SELECT category, n, n_event, woe_nano,
           |  round(CAST(si AS DOUBLE) / 1e9, 6) AS iv
           |FROM t2 CROSS JOIN s ORDER BY category""".stripMargin),
    "One category-grain conditional agg with map-side combine; " +
      "everything after is |categories| rows. Log-odds-linear encoding " +
      "for scorecards plus the IV keep/drop bands — what target encoding " +
      "(q203) can't report.")

  val all: Seq[Declared] = Seq(q309, q310, q311, q312, q313, q39)
}
