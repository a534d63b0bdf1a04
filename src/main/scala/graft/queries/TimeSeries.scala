package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.ops.TimeSeriesOps

/** Time-series operator coverage (SURVEY.md A5, A8, P8, P9, U2, F11)
  * over the `events` table, driven through the graft.ops library. */
object TimeSeries {

  /** q20 — A5+P8+P9: per-user hour-interval stats over a date range,
    * BOTH intervals emitted (intended multi-interval semantics; the
    * reference bug keeps only the last — SURVEY A5), second interval
    * exercises the overnight wrap. ONE shuffle for all intervals via
    * conditional aggregation. */
  val q20 = Declared(
    "q20_interval_stats", "A5,P8,P9,F1",
    (s, dir) => {
      val stats = TimeSeriesOps.intervalStats(
        Tables.events(s, dir),
        idCol = "user_id", tsCol = "ts",
        valueCols = Seq("value"), funcs = Seq("sum", "max", "count"),
        intervals = Seq(("09:00:00", "17:00:00"), ("22:00:00", "05:00:00")),
        dateRange = Some(("2024-01-05", "2024-01-25")))
      // mean derived as round(sum,2)/count: the inner round collapses
      // accumulation-order ulp noise to a bit-identical double in both
      // engines BEFORE the division, so the quotient is exact-compare-safe
      // (value has 2 decimal digits → round(sum,2) is the true sum).
      def mean(tag: String) =
        (round(col(s"sum_value_$tag"), 2) / col(s"count_value_$tag")).as(s"mean_value_$tag")
      stats.select(col("user_id"),
        mean("090000_170000"),
        col("max_value_090000_170000"),
        col("count_value_090000_170000"),
        mean("220000_050000"),
        col("max_value_220000_050000"),
        col("count_value_220000_050000"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id,
           |  round(sum(value) FILTER (WHERE t BETWEEN 32400 AND 61200), 2)
           |    / count(value) FILTER (WHERE t BETWEEN 32400 AND 61200) AS mean_value_090000_170000,
           |  max(value) FILTER (WHERE t BETWEEN 32400 AND 61200) AS max_value_090000_170000,
           |  count(value) FILTER (WHERE t BETWEEN 32400 AND 61200) AS count_value_090000_170000,
           |  round(sum(value) FILTER (WHERE t >= 79200 OR t <= 18000), 2)
           |    / count(value) FILTER (WHERE t >= 79200 OR t <= 18000) AS mean_value_220000_050000,
           |  max(value) FILTER (WHERE t >= 79200 OR t <= 18000) AS max_value_220000_050000,
           |  count(value) FILTER (WHERE t >= 79200 OR t <= 18000) AS count_value_220000_050000
           |FROM (
           |  SELECT user_id, value, hour(ts)*3600 + minute(ts)*60 + second(ts) AS t
           |  FROM events
           |  WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-26')
           |GROUP BY user_id
           |ORDER BY user_id""".stripMargin),
    "All intervals fold into one conditional-agg pass: 1 scan + 1 shuffle on user_id regardless of interval count.")

  /** q21 — P9 standalone: overnight-wrap filter then agg by type. */
  val q21 = Declared(
    "q21_overnight_wrap", "P9",
    (s, dir) => {
      Tables.events(s, dir)
        .filter(TimeSeriesOps.hourIntervalPredicate(col("ts"), "22:00:00", "05:00:00"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
           |FROM events
           |WHERE (hour(ts)*3600 + minute(ts)*60 + second(ts)) >= 79200
           |   OR (hour(ts)*3600 + minute(ts)*60 + second(ts)) <= 18000
           |GROUP BY event_type
           |ORDER BY event_type""".stripMargin),
    "Pure scan-side predicate — no join, partial agg shrinks before the 1-key shuffle.")

  /** q22 — A8: per-id min/max time profile. */
  val q22 = Declared(
    "q22_time_profile", "A8",
    (s, dir) => {
      val (perId, _) = TimeSeriesOps.timeProfile(Tables.events(s, dir), "user_id", "ts")
      perId.orderBy(col("user_id"))
    },
    Some("""SELECT user_id, min(ts) AS min_ts, max(ts) AS max_ts, count(*) AS n_obs
           |FROM events
           |GROUP BY user_id
           |ORDER BY user_id""".stripMargin),
    "min/max/count are all mergeable — map-side partials, single small shuffle.")

  /** q23 — U2 deterministic dedup: first event per (user, type) by
    * (ts, event_id) total order. Spark dropDuplicates is
    * pick-any-under-parallelism; the engine's canonical dedup is
    * rank-based so results are stable on any cluster. */
  val q23 = Declared(
    "q23_dedup_first", "U2,W2",
    (s, dir) => {
      TimeSeriesOps.dedupFirst(Tables.events(s, dir),
        keys = Seq("user_id", "event_type"),
        orderCols = Seq(col("ts").asc, col("event_id").asc))
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
        .orderBy(col("user_id"), col("event_type"))
    },
    Some("""SELECT user_id, event_type, event_id, ts
           |FROM events
           |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
           |                           ORDER BY ts ASC, event_id ASC) = 1
           |ORDER BY user_id, event_type""".stripMargin),
    "Rank-based dedup = one shuffle on the dedup key; deterministic under any partitioning (unlike dropDuplicates).")

  /** q24 — F11: JSON-in-string column extraction (events.props). */
  val q24 = Declared(
    "q24_json_extract", "F11",
    (s, dir) => {
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"),
          round(avg(col("k")), 4).as("avg_k"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type,
           |  CAST(sum(k) AS BIGINT) AS sum_k, count(k) AS n_k, round(avg(k), 4) AS avg_k
           |FROM (SELECT event_type,
           |        CAST(json_extract_string(props, '$.k') AS INT) AS k
           |      FROM events)
           |GROUP BY event_type
           |ORDER BY event_type""".stripMargin),
    "get_json_object is codegen'd; at 100TB prefer from_json into a struct once, not N extractions.")

  /** q25 — sessionization (gap > 30 min) via lag + running sum:
    * the batch shadow of streaming session windows (T3). */
  val q25 = Declared(
    "q25_sessionize", "W-frame,T3",
    (s, dir) => {
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
        .withColumn("session_no",
          sum(col("new_sess")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_no"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
        .orderBy(col("user_id"), col("session_no"))
    },
    Some("""WITH marked AS (
           |  SELECT user_id, event_id, ts,
           |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
           |         THEN 1 ELSE 0 END AS new_sess
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
           |), numbered AS (
           |  SELECT user_id, ts,
           |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
           |  FROM marked)
           |SELECT user_id, session_no, count(*) AS n_events,
           |  min(ts) AS session_start, max(ts) AS session_end
           |FROM numbered
           |GROUP BY user_id, session_no
           |ORDER BY user_id, session_no""".stripMargin),
    "lag + running sum + agg all share one shuffle on user_id; AQE coalesces the tiny output.")

  /** q53 — as-of join: for each click, the user's most recent prior (or
    * simultaneous) purchase value. Spark side = union+window carry-
    * forward (one shuffle); oracle = DuckDB's native ASOF LEFT JOIN. */
  val q53 = Declared(
    "q53_asof_join", "J-asof,W-frame",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("pval")) // unique per (key, ts)
      TimeSeriesOps.asofJoin(clicks, purchases, "user_id", "ts", Seq("pval"))
        .select(col("user_id"), col("event_id"), col("asof_pval"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""WITH clicks AS (
           |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
           |purch AS (
           |  SELECT user_id, ts, max(value) AS pval FROM events
           |  WHERE event_type = 'purchase' GROUP BY 1, 2)
           |SELECT clicks.user_id, event_id, pval AS asof_pval
           |FROM clicks ASOF LEFT JOIN purch
           |  ON clicks.user_id = purch.user_id AND clicks.ts >= purch.ts
           |ORDER BY clicks.user_id, event_id""".stripMargin),
    "Union + single window carry-forward: one shuffle+sort on the key, no range-condition " +
      "cartesian — the same cost envelope as a sort-merge join at 100TB.")

  /** q54 — range/interval join: events falling inside deterministic
    * maintenance windows (derived from supplier keys so both engines
    * build identical intervals). Spark side = time-bucket equi-join;
    * oracle = plain inequality join. */
  val q54 = Declared(
    "q54_range_join", "J-range",
    (s, dir) => {
      val windows = Tables.supplier(s, dir)
        .filter(col("s_suppkey") <= 40)
        .select(col("s_suppkey").as("window_id"),
          expr("timestampadd(HOUR, CAST((s_suppkey * 13) % 600 AS INT), TIMESTAMP '2024-01-01 00:00:00')").as("beg"),
          expr("timestampadd(HOUR, CAST((s_suppkey * 13) % 600 + (s_suppkey % 5) + 1 AS INT), TIMESTAMP '2024-01-01 00:00:00')").as("end"))
      TimeSeriesOps.rangeJoin(
        Tables.events(s, dir).select(col("event_id"), col("ts"), col("value")),
        "ts", windows, "beg", "end", bucketSeconds = 6 * 3600)
        .groupBy(col("window_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("window_id"))
    },
    Some("""WITH windows AS (
           |  SELECT s_suppkey AS window_id,
           |    TIMESTAMP '2024-01-01 00:00:00'
           |      + to_hours((s_suppkey * 13) % 600) AS beg,
           |    TIMESTAMP '2024-01-01 00:00:00'
           |      + to_hours((s_suppkey * 13) % 600 + (s_suppkey % 5) + 1) AS "end"
           |  FROM supplier WHERE s_suppkey <= 40)
           |SELECT window_id, count(*) AS n_events, round(sum(value), 4) AS sum_value
           |FROM events JOIN windows
           |  ON beg <= ts AND ts <= "end"
           |GROUP BY window_id
           |ORDER BY window_id""".stripMargin),
    "Intervals explode to covering 6h buckets, points map to one bucket, equi-join on bucket id " +
      "+ exact filter — the 1-D gridBucketJoin; a raw inequality join would be a nested loop.")

  /** Shared harness for the streaming oracle rows (q57/q60): stream the
    * events fixture (staged as a symlink directory — the file source's
    * real production shape; absolute target so a relative sfDir can't
    * dangle), apply `transform`, run to completion into a complete-mode
    * memory table, and return it. Nanos-ts handling mirrors
    * Tables.events. */
  private[queries] def streamEventsToTable(s: SparkSession, dir: String, tag: String,
      mode: String = "complete")(
      transform: DataFrame => DataFrame): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // REPLAY-HARNESS state sizing: a stateful stream instantiates one
    // state store per shuffle partition PER MICRO-BATCH — at the
    // default 32 that is pure fixed cost for a one-file replay whose
    // state fits one task. 8 partitions keep the replay parallel
    // enough while cutting store init/commit 4x. Production streams
    // call StreamOps directly and size state partitions to key
    // cardinality; this knob scopes ONLY the driver-contract replay.
    // The conf is stream-plan-scoped: restored right after start() so
    // concurrent batch work in the same session is untouched.
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    val path = s"$dir/events.parquet"
    val rawSchema = s.read.parquet(path).schema
    val stage = java.nio.file.Files.createTempDirectory(s"graft_${tag}_stream")
    try { // staging dir cleanup covers EVERY exit, incl. plan-build failures
      java.nio.file.Files.createSymbolicLink(
        stage.resolve("events.parquet"),
        java.nio.file.Paths.get(path).toAbsolutePath)
      val raw = s.readStream.schema(rawSchema).parquet(stage.toString)
      val ev =
        if (rawSchema("ts").dataType == org.apache.spark.sql.types.LongType)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else if (rawSchema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
          // micros-without-UTC-flag parquet: NTZ → LTZ is wall-clock
          // identity under the pinned UTC session (see Tables.events);
          // watermarks/windows require the instant type
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        else raw
      val qname = s"${tag}_mem_" + java.util.UUID.randomUUID().toString.replace("-", "")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val q =
        try transform(ev).writeStream.format("memory").queryName(qname)
          .outputMode(mode).start()
        finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      try graft.streaming.StreamOps.runOnce(q)
      catch { case e: Throwable =>
        // a failed drain must not leave an active stream polling a
        // directory the finally below is about to delete
        try q.stop() catch { case _: Exception => () }
        throw e
      }
      s.table(qname)
    } finally {
      java.nio.file.Files.deleteIfExists(stage.resolve("events.parquet"))
      java.nio.file.Files.deleteIfExists(stage)
    }
  }

  /** q57 — T1+T2/A5 end-to-end STREAMING row: the events table flows
    * through the Structured Streaming path (file stream source →
    * StreamOps.intervalStats running conditional agg → memory sink,
    * complete mode) and the result must hash-match a batch DuckDB
    * oracle — the stream≡batch replay law promoted from StreamingSpec
    * into the driver's correctness gate. */
  val q57 = Declared(
    "q57_stream_interval", "T1,T2,A5",
    (s, dir) => {
      streamEventsToTable(s, dir, "q57")(ev =>
        graft.streaming.StreamOps.intervalStats(
          ev, "ts", "user_id", "value", Seq(("09:00:00", "17:00:00"))))
        .select(col("user_id"),
        (round(col("sum_value_090000_170000"), 2) / col("count_value_090000_170000"))
          .as("mean_value_090000_170000"),
        col("count_value_090000_170000"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id,
           |  round(sum(value) FILTER (WHERE t BETWEEN 32400 AND 61200), 2)
           |    / count(value) FILTER (WHERE t BETWEEN 32400 AND 61200) AS mean_value_090000_170000,
           |  count(value) FILTER (WHERE t BETWEEN 32400 AND 61200) AS count_value_090000_170000
           |FROM (
           |  SELECT user_id, value, hour(ts)*3600 + minute(ts)*60 + second(ts) AS t
           |  FROM events)
           |GROUP BY user_id
           |ORDER BY user_id""".stripMargin),
    "Streaming state = one agg row per user (complete-mode running totals, no watermark " +
      "needed); the shuffle is keyed on user_id exactly like the batch twin. Production " +
      "sinks are the parquet/foreachBatch writers in StreamOps; memory sink is the gate.")

  /** q60 — T2/T4 under the oracle gate: event-time tumbling windows
    * with a watermark through the streaming path; complete output mode
    * emits every window, so the batch hour-truncation SQL is the exact
    * oracle (the watermark's late-DROP divergence is pinned separately
    * in StreamingSpec — this query has no late data by construction). */
  val q60 = Declared(
    "q60_stream_windows", "T2,T4",
    (s, dir) => {
      streamEventsToTable(s, dir, "q60")(ev =>
        graft.streaming.StreamOps.windowedStats(
          ev, "ts", "event_type", "value", window = "1 hour",
          watermark = Some("1 hour")))
        .select(col("window_start"), col("event_type"), col("n"),
        round(col("sum_value"), 2).as("sum_value"),
        (round(col("sum_value"), 2) / col("n")).as("mean_value"),
        col("max_value"))
        .orderBy(col("window_start"), col("event_type"))
    },
    Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
           |  count(*) AS n, round(sum(value), 2) AS sum_value,
           |  round(sum(value), 2) / count(*) AS mean_value,
           |  max(value) AS max_value
           |FROM events
           |GROUP BY 1, 2
           |ORDER BY window_start, event_type""".stripMargin),
    "Streaming state = one row per (window, type) inside the watermark horizon in the " +
      "production (append/update) configuration; the shuffle key matches the batch twin.")

  /** q66 — T5 under the oracle gate: stateful streaming dedup
    * (`dropDuplicatesWithinWatermark`) over (user_id, event_type),
    * projecting the KEYS — every kept representative is identical in
    * the projected columns, so the output is order- and
    * batching-independent and the batch DISTINCT is the exact oracle.
    * The watermark spans the fixture's full horizon, making the dedup
    * state global (the production trade: state size vs dedup window —
    * a bounded window evicts state but re-admits far-apart
    * duplicates). */
  val q66 = Declared(
    "q66_stream_dedup", "T5,U2",
    (s, dir) => {
      streamEventsToTable(s, dir, "q66", mode = "append")(ev =>
        graft.streaming.StreamOps.streamingDedup(
          ev, "ts", "3650 days", Seq("user_id", "event_type"))
          .select(col("user_id"), col("event_type")))
        .orderBy(col("user_id"), col("event_type"))
    },
    Some("""SELECT DISTINCT user_id, event_type FROM events
           |ORDER BY user_id, event_type""".stripMargin),
    "Dedup state = one row per distinct key inside the watermark horizon, shuffle keyed on " +
      "the dedup key (uniform). At 100TB the horizon IS the knob: watermark bounds state " +
      "size; global exactness composes this with the batch exact-dedup operator downstream.")

  /** q76 — T6/J1 under the oracle gate: stream-STATIC enrichment join
    * (the production lookup-dimension shape): the events stream joins a
    * broadcast static customer dimension mid-stream, then aggregates
    * per (segment, event type) in complete mode. The batch join SQL is
    * the exact oracle. Sums follow the round(sum(·), 2) convention of
    * q57/q60. */
  val q76 = Declared(
    "q76_stream_enrich", "T6,J1",
    (s, dir) => {
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
      streamEventsToTable(s, dir, "q76")(ev =>
        ev.join(broadcast(dim), col("user_id") === col("c_custkey"))
          .groupBy(col("c_mktsegment"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), sum(col("value")).as("__sum")))
        .select(col("c_mktsegment"), col("event_type"), col("n_events"),
          round(col("__sum"), 2).as("sum_value"),
          (round(col("__sum"), 2) / col("n_events")).as("mean_value"))
        .orderBy(col("c_mktsegment"), col("event_type"))
    },
    Some("""SELECT c_mktsegment, event_type, count(*) AS n_events,
           |  round(sum(value), 2) AS sum_value,
           |  round(sum(value), 2) / count(*) AS mean_value
           |FROM events JOIN customer ON user_id = c_custkey
           |GROUP BY 1, 2
           |ORDER BY c_mktsegment, event_type""".stripMargin),
    "The dimension broadcasts to every task — no stream-side shuffle for the join (static " +
      "side is loaded once per micro-batch plan); agg state is one row per (segment, type). " +
      "At 100TB this is the canonical enrich-then-aggregate stream topology.")

  /** q78 — T7 under the oracle gate: stream-STREAM inner join with an
    * event-time range bound (click → purchase attribution within 30
    * minutes, per user). Both sides derive from the events file
    * stream; the output projects only join keys and ids, so it is
    * batching-independent and the batch self-join SQL is the exact
    * oracle. Append mode — the only mode stream-stream joins support. */
  val q78 = Declared(
    "q78_stream_join", "T7,J4",
    (s, dir) => {
      // a stream-stream join materializes FOUR state stores per shuffle
      // partition; at this fixture scale 32 partitions is pure fixed
      // overhead (128 stores for 23 result rows) — scope the join to 8
      // and restore. At 100TB the knob goes the other way: partitions
      // track state volume, not cores.
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      // An INNER stream-stream join emits matches the moment both sides
      // are present — batch 0 of the replay. The no-data micro-batch
      // that follows exists only to advance the watermark (needed by
      // OUTER joins and append-mode aggs to flush held results; q468
      // keeps it) and here costs a full planning + 4-stores×partitions
      // state-commit cycle for zero output rows (measured ~0.7-1.2 s of
      // the ~2.6 s row — StreamProfile, opt round 12). Skipping it is
      // result-identical by construction and oracle-proven.
      val prevNoData = s.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled")
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      try streamEventsToTable(s, dir, "q78", mode = "append") { ev =>{
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("l_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("r_ts"))
        graft.streaming.StreamOps.streamStreamJoin(
          clicks, purchases, "user_id", "l_ts", "r_ts",
          watermark = "3650 days", within = "30 minutes")
          .select(col("user_id"), col("click_id"), col("purchase_id"))
      }}.orderBy(col("user_id"), col("click_id"), col("purchase_id"))
      finally {
        s.conf.set("spark.sql.shuffle.partitions", prev)
        s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
          prevNoData)
      }
    },
    Some("""SELECT l.user_id, l.event_id AS click_id, r.event_id AS purchase_id
           |FROM events l JOIN events r
           |  ON l.user_id = r.user_id
           | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE
           |WHERE l.event_type = 'click' AND r.event_type = 'purchase'
           |ORDER BY 1, 2, 3""".stripMargin),
    "Join state is bounded by the watermark horizon on BOTH sides (the production knob); " +
      "the shuffle keys on user_id for both streams — same co-partitioning a batch join " +
      "would use. Attribution joins are the canonical stream-stream workload.")

  /** q88 — A5/P10: resample to an hourly grid + forward fill (pandas
    * `resample().ffill()` as a distributed plan). The bin index is
    * integer epoch division (Spark `div` ≡ DuckDB `//`); the filled
    * value is a max — an exact selection, so no float accumulation
    * crosses engines; gap rows carry `is_gap = true`, n_events = 0. */
  val q88 = Declared(
    "q88_resample_ffill", "A5,P10",
    (s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") < 6)
      graft.ops.TimeSeriesOps.resampleFill(ev, "user_id", "ts", "value", 3600)
        .select(col("user_id"), col("bin"), col("bin_ts"),
          col("n_events"), col("is_gap"), col("v_fill"))
        .orderBy(col("user_id"), col("bin"))
    },
    Some("""WITH e AS (
           |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS bin, value
           |  FROM events WHERE user_id < 6),
           |b AS (SELECT user_id, bin, count(*) AS n_events, max(value) AS v_max
           |      FROM e GROUP BY 1, 2),
           |g AS (SELECT user_id, unnest(range(min(bin), max(bin) + 1)) AS bin
           |      FROM b GROUP BY user_id),
           |j AS (SELECT g.user_id, g.bin, b.n_events, b.v_max
           |      FROM g LEFT JOIN b ON g.user_id = b.user_id AND g.bin = b.bin)
           |SELECT user_id, bin, epoch_ms(bin * 3600 * 1000) AS bin_ts,
           |  coalesce(n_events, 0) AS n_events,
           |  (n_events IS NULL) AS is_gap,
           |  last_value(v_max IGNORE NULLS) OVER (
           |    PARTITION BY user_id ORDER BY bin
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
           |FROM j
           |ORDER BY user_id, bin""".stripMargin),
    "Event volume collapses at the first map-side-partial (key,bin) agg; everything after " +
      "is grid-sized (span/bin rows per key, independent of volume): the (key,bin) join " +
      "and one key-ordered fill window. All shuffle keys are content-derived and uniform.")

  /** q91 — A8/F7: lagged autocorrelation per sensor (hourly bins,
    * lags 0-3). Values quantize to integer hundredths, so every sum in
    * the Pearson closed form is exact long arithmetic (q82's
    * machinery) and the corr divisions/sqrts are bit-portable
    * UNROUNDED. Lag 0 must come out exactly 1.0 wherever variance is
    * nonzero — a built-in sanity row per sensor. */
  val q91 = Declared(
    "q91_autocorrelation", "A8,F7",
    (s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") < 8)
      graft.ops.TimeSeriesOps.laggedAutocorrelation(
        ev, "user_id", "ts", "value", binSeconds = 3600, maxLag = 3)
        .select(col("user_id"), col("lag"), col("n"), col("corr"))
        .orderBy(col("user_id"), col("lag"))
    },
    Some("""WITH e AS (
           |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS bin,
           |         CAST(round(value * 100, 0) AS BIGINT) AS vq
           |  FROM events WHERE user_id < 8),
           |s AS (SELECT user_id, bin, CAST(sum(vq) AS BIGINT) AS sv
           |      FROM e GROUP BY 1, 2),
           |p AS (SELECT a.user_id, l.lag, a.sv AS x, b.sv AS y
           |      FROM s a
           |      CROSS JOIN (SELECT unnest(range(0, 4)) AS lag) l
           |      JOIN s b ON b.user_id = a.user_id AND b.bin = a.bin + l.lag),
           |agg AS (
           |  SELECT user_id, lag, count(*) AS n,
           |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           |    CAST(sum(x * y) AS BIGINT) AS sxy,
           |    CAST(sum(x * x) AS BIGINT) AS sxx,
           |    CAST(sum(y * y) AS BIGINT) AS syy
           |  FROM p GROUP BY 1, 2),
           |f AS (
           |  SELECT user_id, lag, n,
           |    CAST(n * sxy - sx * sy AS DOUBLE) AS covn,
           |    CAST(n * sxx - sx * sx AS DOUBLE) AS varxn,
           |    CAST(n * syy - sy * sy AS DOUBLE) AS varyn
           |  FROM agg)
           |SELECT user_id, lag, n,
           |  CASE WHEN varxn <> 0 AND varyn <> 0
           |       THEN covn / (sqrt(varxn) * sqrt(varyn)) END AS corr
           |FROM f
           |ORDER BY user_id, lag""".stripMargin),
    "Event volume dies at the (key,bin) agg; the lag explode multiplies the BINNED series " +
      "only (maxLag+1 per bin); the self-join is a uniform (key, bin+lag) equi-join and " +
      "the stats agg output is |keys|·(maxLag+1) rows — exact longs, no float accumulation.")

  /** q103 — T3 under the oracle gate: gap-based SESSION windows through
    * the streaming path (`session_window`, append mode, 1 h watermark)
    * hash-matched against q25's batch gaps-and-islands SQL extended
    * with the window-end convention (last event + gap). Append mode
    * only emits sessions the watermark has sealed, so BOTH sides keep
    * sessions ending before Jan 30 — a full day before max event time,
    * far from the eviction boundary (all sf dirs end Jan 30 ≥ 23:00).
    * The oracle's new-session condition is `diff >= gap`, matching
    * session_window's half-open [start, start+gap) range where an event
    * AT the boundary starts a new session — so an exact-gap pair can
    * never diverge the two engines (none exists in the data, checked,
    * but the convention is aligned, not assumed). */
  val q103 = Declared(
    "q103_stream_sessions", "T3,W-frame",
    (s, dir) => {
      streamEventsToTable(s, dir, "q103", mode = "append")(ev =>
        graft.streaming.StreamOps.sessionStats(
          ev, "ts", "user_id", gap = "30 minutes", watermark = "1 hour"))
        .filter(col("session_end") < lit("2024-01-30 00:00:00").cast("timestamp"))
        .orderBy(col("user_id"), col("session_start"))
    },
    Some("""WITH marked AS (
           |  SELECT user_id, event_id, ts,
           |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
           |         THEN 1 ELSE 0 END AS new_sess
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
           |), numbered AS (
           |  SELECT user_id, ts,
           |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
           |  FROM marked)
           |SELECT min(ts) AS session_start,
           |       max(ts) + INTERVAL 30 MINUTE AS session_end,
           |       user_id, count(*) AS n_events
           |FROM numbered
           |GROUP BY user_id, session_no
           |HAVING max(ts) + INTERVAL 30 MINUTE < TIMESTAMP '2024-01-30 00:00:00'
           |ORDER BY user_id, session_start""".stripMargin),
    "Session state lives only inside the watermark horizon (append mode evicts sealed " +
      "sessions); the shuffle keys on user_id exactly like batch sessionize — " +
      "session_window is the state-merging operator Spark has that the batch islands " +
      "window emulates. The horizon is the state-size knob at 100TB.")

  /** q105 — W-frame/A5: trailing 1-hour RANGE moving average per user —
    * the time-valued frame (RANGE BETWEEN INTERVAL PRECEDING) that
    * rows-frames can't express: the frame width follows the CLOCK, not
    * a row count, and equal-timestamp peers are in or out together, so
    * no tie-break is even needed. Summands go through DECIMAL(18,2) —
    * exact decimal addition in any order — and only the final sum is
    * cast to double, so both engines divide identical operands. */
  val q105 = Declared(
    "q105_moving_avg", "W-frame,A5",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"), col("ts"),
          count(lit(1)).over(w).as("mov_n"),
          (sum(col("value").cast("decimal(18,2)")).over(w).cast("double") /
            count(lit(1)).over(w)).as("mov_avg"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id, ts,
           |  count(*) OVER w AS mov_n,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
           |    / count(*) OVER w AS mov_avg
           |FROM events
           |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
           |ORDER BY event_id""".stripMargin),
    "One shuffle+sort on user_id; the RANGE frame is evaluated with a sliding two-pointer " +
      "over the sorted partition (O(1) amortized per row). At 100TB this is the dashboard " +
      "smoothing pass — same cost envelope as the q07 running frame, and decimal summands " +
      "make the result independent of intra-frame order.")

  /** q113 — A5/P10: LINEAR interpolation of missing hourly bins (the
    * rung above q88's forward-fill): each user's hourly mean series is
    * densified to the full [min,max] bin grid and interior gaps fill
    * with pv + (nv−pv)·(bin−pb)/(nb−pb) from the nearest non-null
    * neighbors (IGNORE NULLS window carry on both engines). Leading and
    * trailing gaps stay null — interpolation, not extrapolation. Every
    * arithmetic step is the same IEEE op on identical operands (decimal
    * bin means, long bin indexes), so the result hash-matches
    * UNROUNDED. */
  val q113 = Declared(
    "q113_linear_interp", "A5,P10",
    (s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") < 50)
        .select(col("user_id"),
          expr("unix_micros(ts) div 3600000000").as("bin"), col("value"))
      val binned = ev.groupBy(col("user_id"), col("bin"))
        .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("bv"))
      val grid = binned.groupBy(col("user_id"))
        .agg(min(col("bin")).as("mn"), max(col("bin")).as("mx"))
        .select(col("user_id"),
          explode(sequence(col("mn"), col("mx"))).as("bin"))
      val wp = Window.partitionBy(col("user_id")).orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wn = Window.partitionBy(col("user_id")).orderBy(col("bin"))
        .rowsBetween(1, Window.unboundedFollowing)
      grid.join(binned, Seq("user_id", "bin"), "left")
        .select(col("user_id"), col("bin"), col("bv"),
          last(col("bv"), ignoreNulls = true).over(wp).as("pv"),
          last(when(col("bv").isNotNull, col("bin")), ignoreNulls = true)
            .over(wp).as("pb"),
          first(col("bv"), ignoreNulls = true).over(wn).as("nv"),
          first(when(col("bv").isNotNull, col("bin")), ignoreNulls = true)
            .over(wn).as("nb"))
        .select(col("user_id"), col("bin"), col("bv"),
          when(col("bv").isNotNull, col("bv"))
            .when(col("pv").isNotNull && col("nv").isNotNull,
              col("pv") + (col("nv") - col("pv")) *
                ((col("bin") - col("pb")).cast("double") / (col("nb") - col("pb"))))
            .as("v_interp"))
        .orderBy(col("user_id"), col("bin"))
    },
    Some("""WITH ev AS (
           |  SELECT user_id, epoch_us(ts) // 3600000000 AS bin, value
           |  FROM events WHERE user_id < 50),
           |b AS (
           |  SELECT user_id, bin,
           |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS bv
           |  FROM ev GROUP BY user_id, bin),
           |s AS (SELECT user_id, min(bin) AS mn, max(bin) AS mx FROM b GROUP BY user_id),
           |g AS (SELECT user_id, unnest(generate_series(mn, mx)) AS bin FROM s),
           |j AS (SELECT g.user_id, g.bin, b.bv
           |      FROM g LEFT JOIN b ON g.user_id = b.user_id AND g.bin = b.bin),
           |w AS (
           |  SELECT user_id, bin, bv,
           |    last_value(bv IGNORE NULLS) OVER wp AS pv,
           |    last_value(CASE WHEN bv IS NOT NULL THEN bin END IGNORE NULLS) OVER wp AS pb,
           |    first_value(bv IGNORE NULLS) OVER wn AS nv,
           |    first_value(CASE WHEN bv IS NOT NULL THEN bin END IGNORE NULLS) OVER wn AS nb
           |  FROM j
           |  WINDOW wp AS (PARTITION BY user_id ORDER BY bin
           |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |         wn AS (PARTITION BY user_id ORDER BY bin
           |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
           |SELECT user_id, bin, bv,
           |  CASE WHEN bv IS NOT NULL THEN bv
           |       WHEN pv IS NOT NULL AND nv IS NOT NULL
           |       THEN pv + (nv - pv) * (CAST(bin - pb AS DOUBLE) / (nb - pb))
           |  END AS v_interp
           |FROM w ORDER BY user_id, bin""".stripMargin),
    "Event volume dies at the (user, bin) agg; the grid explode is span-sized (bins per " +
      "user, independent of volume) and both carry windows share ONE user-keyed " +
      "shuffle+sort. Same cost envelope as q88's ffill — gap repair stays grid-priced " +
      "at 100TB.")

  /** q148 — T2/A5 under the oracle gate: STREAMING OHLC candles —
    * hourly open/high/low/close of purchase values computed as a
    * windowed streaming aggregation (complete mode). Open/close are
    * `min_by`/`max_by` keyed on the unique (ts, event_id) struct, so
    * the result is deterministic under any micro-batch split; the
    * batch q132 formulation is the exact oracle restated on
    * date_trunc windows. */
  val q148 = Declared(
    "q148_stream_ohlc", "T2,A5",
    (s, dir) => {
      streamEventsToTable(s, dir, "q148")(ev =>
        ev.filter(col("event_type") === "purchase")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
            count(lit(1)).as("n")))
        .select(col("window.start").as("window_start"), col("open"),
          col("high"), col("low"), col("close"), col("n"))
        .orderBy(col("window_start"))
    },
    Some("""WITH b AS (
           |  SELECT date_trunc('hour', ts) AS window_start, value,
           |    row_number() OVER (PARTITION BY date_trunc('hour', ts)
           |      ORDER BY ts, event_id) AS ra,
           |    count(*) OVER (PARTITION BY date_trunc('hour', ts)) AS cnt
           |  FROM events WHERE event_type = 'purchase')
           |SELECT window_start,
           |  max(CASE WHEN ra = 1 THEN value END) AS open,
           |  max(value) AS high, min(value) AS low,
           |  max(CASE WHEN ra = cnt THEN value END) AS close,
           |  count(*) AS n
           |FROM b GROUP BY window_start
           |ORDER BY window_start""".stripMargin),
    "Streaming state = one OHLC row per open hour window; min_by/max_by fold " +
      "incrementally per micro-batch, so the candle dashboard never replays history. " +
      "The shuffle key (window) matches the batch twin q132.")

  val all: Seq[Declared] =
    Seq(q20, q21, q22, q23, q24, q25, q53, q54, q57, q60, q66, q76, q78, q88,
      q91, q103, q105, q113, q148)
}
