package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming variants (SURVEY.md §2.9, T1-T6) of the batch
  * time-series operators. The reference is batch-only; its
  * directory-of-JSONs ingestion (src/data_preprocessing.py:429-442) and
  * clock-time interval aggregation (:563-585) are the batch shadows of
  * T1/T2.
  *
  * Documented batch/streaming divergence (T4): a watermark DROPS late
  * rows that batch would keep — callers choose the delay; tests pin
  * both the on-time path and the late-drop.
  */
object StreamOps {

  /** T1 — file-arrival ingestion: stream a directory of JSON or parquet
    * files with an explicit schema (streaming requires one). */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
      format: String = "json"): DataFrame =
    spark.readStream.schema(schema).format(format).load(dir)

  /** T2 — tumbling (slide = None) or sliding windowed stats per key,
    * with optional watermark (T4). One shuffle on (window, key); state
    * store size is bounded by watermark horizon × key cardinality. */
  def windowedStats(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, window: String, slide: Option[String] = None,
      watermark: Option[String] = None): DataFrame = {
    val wm = watermark.map(events.withWatermark(tsCol, _)).getOrElse(events)
    val win = slide match {
      case Some(s) => org.apache.spark.sql.functions.window(col(tsCol), window, s)
      case None => org.apache.spark.sql.functions.window(col(tsCol), window)
    }
    wm.groupBy(win.as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as(s"sum_$valueCol"),
        avg(col(valueCol)).as(s"mean_$valueCol"),
        max(col(valueCol)).as(s"max_$valueCol"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("n"), col(s"sum_$valueCol"), col(s"mean_$valueCol"),
        col(s"max_$valueCol"))
  }

  /** T3 — session windows (gap-based), the streaming twin of the batch
    * sessionize query (q25). */
  def sessionStats(events: DataFrame, tsCol: String, keyCol: String,
      gap: String, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col(keyCol), col("n_events"))

  /** T3+ — DYNAMIC-GAP session windows: the gap is a per-row COLUMN
    * (Spark 3.2 session_window overload), so different event classes
    * session under different inactivity thresholds in ONE stateful
    * operator. Sessions are keyed on `keyCols` (include the class
    * column when the gap varies by class — a gap that changes WITHIN a
    * key makes merge semantics caller-defined, not engine-defined). */
  def sessionStatsDynamicGap(events: DataFrame, tsCol: String,
      keyCols: Seq[String], gapCol: org.apache.spark.sql.Column,
      watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy((session_window(col(tsCol), gapCol).as("w") +:
        keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n_events"))
      .select((col("w.start").as("session_start") +:
        col("w.end").as("session_end") +:
        keyCols.map(col)) :+ col("n_events"): _*)

  /** Streaming twin of A5 (batch `TimeSeriesOps.intervalStats`):
    * per-key, per-hour-of-day-interval conditional aggregation. Hour
    * intervals aren't event-time windows — they recur daily — so this
    * is a running aggregate per key (complete/update output), exactly
    * the reference's semantics applied to an unbounded stream. */
  def intervalStats(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, intervals: Seq[(String, String)]): DataFrame = {
    val aggs = intervals.flatMap { case (b, e) =>
      val tag = s"${b.replace(":", "")}_${e.replace(":", "")}"
      val pred = graft.ops.TimeSeriesOps.hourIntervalPredicate(col(tsCol), b, e)
      Seq(
        sum(when(pred, col(valueCol))).as(s"sum_${valueCol}_$tag"),
        count(when(pred, col(valueCol))).as(s"count_${valueCol}_$tag"))
    }
    events.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** T5 — stateful dedup by key within the watermark horizon. */
  def streamingDedup(events: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** T7 — stream-stream inner join with an event-time range bound: a
    * left row at time t matches right rows with the same key whose
    * timestamp lies in [t, t + within] (the ad-impression/click,
    * order/payment correlation pattern). Both sides carry watermarks,
    * which is what lets Spark EXPIRE join state: a buffered left row
    * can stop waiting once the right watermark passes t + within.
    * State size ≈ (input rate × (watermark + within)) per side, shuffle
    * keyed on the join key — the only viable shape at unbounded input.
    * Column names must be disjoint apart from `key`. `joinType` also
    * supports "left_outer"/"right_outer"/"full_outer": null-padded
    * rows emit only when the WATERMARK passes a buffered row's match
    * horizon, so outer consumers must read a watermark-sealed region
    * (see q468's sealing note — and never seal the join INPUT, which
    * drags the watermark itself down). */
  def streamStreamJoin(left: DataFrame, right: DataFrame, key: String,
      ltsCol: String, rtsCol: String, watermark: String,
      within: String, joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(ltsCol, watermark)
    // both sides often derive from the SAME source plan (self-join on a
    // stream), where attribute-reference disambiguation can resolve
    // drop(r(key)) to the LEFT column — on an outer join that nulls the
    // key of every unmatched row. Renaming the right key mints a fresh
    // attribute, making the join condition and the drop unambiguous.
    val r = right.withWatermark(rtsCol, watermark)
      .withColumnRenamed(key, "__rkey")
    val joined = l.join(r, l(key) === r("__rkey") &&
        r(rtsCol) >= l(ltsCol) &&
        r(rtsCol) <= l(ltsCol) + expr(s"INTERVAL $within"),
      joinType)
    // right/full outer emit unmatched RIGHT rows with a null left side —
    // dropping only __rkey would null the join key of exactly those rows
    // (silent corruption of the outer tail). Coalesce the two key columns
    // back into one before dropping the rename. For inner/left_outer this
    // is an identity projection: a null left key never matches (null ===
    // null is false under SQL semantics), so coalesce(null, null) = null
    // reproduces the un-coalesced column.
    joined.withColumn(key, coalesce(joined(key), joined("__rkey")))
      .drop("__rkey")
  }

  /** Input/output records for the custom-state sessionizer. */
  final case class SessionEvent(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, value: Double)
  final case class SessionState(startUs: Long, lastUs: Long, n: Long, sum: Double)
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** T3 with CUSTOM state — `flatMapGroupsWithState` sessionization:
    * per-user open-session state (start, last, count, sum) carried
    * across micro-batches; a session closes (and emits) when a new
    * event arrives more than `gap` after the last, or when the
    * processing-time timeout fires with no new events. Unlike
    * `session_window` this exposes the state machine — arbitrary
    * session payloads (here a running sum) come for free.
    *
    * State store size = one fixed-size row per active user; shuffle is
    * keyed on user_id. */
  def statefulSessionize(events: org.apache.spark.sql.Dataset[SessionEvent],
      gap: java.time.Duration,
      timeout: org.apache.spark.sql.streaming.GroupStateTimeout =
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout)
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    // EventTimeTimeout would need a watermark + setTimeoutTimestamp
    // wiring this helper doesn't do — reject rather than silently never
    // closing idle sessions (unbounded state)
    require(timeout != org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      "statefulSessionize supports ProcessingTimeTimeout or NoTimeout")
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, OutputMode}
    val gapUs = gap.toNanos / 1000

    def handle(uid: Long, batch: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[ClosedSession] = {
      def tsUs(t: java.sql.Timestamp) = t.getTime * 1000
      def close(s: SessionState) = ClosedSession(uid,
        new java.sql.Timestamp(s.startUs / 1000), new java.sql.Timestamp(s.lastUs / 1000),
        s.n, s.sum)
      if (batch.isEmpty && state.hasTimedOut) {
        val out = state.getOption.map(close).iterator
        state.remove()
        return out
      }
      val events = batch.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
      var closed = List.empty[ClosedSession]
      var cur = state.getOption
      events.foreach { e =>
        val t = tsUs(e.ts)
        cur match {
          case Some(s) if t - s.lastUs <= gapUs =>
            cur = Some(s.copy(lastUs = math.max(s.lastUs, t), n = s.n + 1, sum = s.sum + e.value))
          case Some(s) =>
            closed ::= close(s)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach(state.update)
      if (state.getOption.isDefined &&
          timeout == org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout)
        state.setTimeoutDuration(gap.toMillis)
      closed.reverseIterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(handle)
  }

  /** T-state — EVENT-TIME-TIMER sessionization through the Spark 4
    * `transformWithState` StatefulProcessor: [[statefulSessionize]]'s
    * state machine (gap-close inside the batch, open tail carried in a
    * ValueState) but the idle-session FLUSH is a registered EVENT-TIME
    * timer at lastEvent + gap — the timer fires when the WATERMARK
    * passes it (deterministic, replayable), not when a wall clock does
    * (the ProcessingTimeTimeout flake the older API forces). One live
    * timer per key: each batch deletes the stale horizon and re-arms
    * at the new tail; [[StatefulProcessor.handleExpiredTimer]] emits
    * the closed session and clears state. Completes the
    * transformWithState surface: ValueState (q452), MapState (q471),
    * ListState (q476), TIMERS (q483).
    *
    * Scale: state = one 4-field record + one timer per OPEN session;
    * expiry work is driven by the timer index, not a state scan. */
  def statefulTimerSessions(events: org.apache.spark.sql.Dataset[SessionEvent],
      gap: java.time.Duration, watermark: String)
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
      StatefulProcessor, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoder, Encoders}
    val gapUs = gap.toNanos / 1000
    // micros-exact Timestamp (the ms constructor alone truncates the
    // sub-millisecond digits the event source carries)
    def usToTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    val proc = new StatefulProcessor[Long, SessionEvent, ClosedSession] {
      @transient private var st:
        org.apache.spark.sql.streaming.ValueState[SessionState] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[SessionState]("sess",
          Encoders.product[SessionState], TTLConfig.NONE)
      private def close(uid: Long, s: SessionState) = ClosedSession(uid,
        usToTs(s.startUs), usToTs(s.lastUs), s.n, s.sum)
      override def handleInputRows(uid: Long, rows: Iterator[SessionEvent],
          timers: TimerValues): Iterator[ClosedSession] = {
        // micros-exact read: getTime alone is ms-truncated; the
        // sub-millisecond digits live in the nanos field
        def tsUs(t: java.sql.Timestamp) =
          Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
        val evs = rows.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
        var closed = List.empty[ClosedSession]
        var cur = if (st.exists()) Some(st.get()) else None
        evs.foreach { e =>
          val t = tsUs(e.ts)
          cur match {
            case Some(s) if t - s.lastUs <= gapUs =>
              cur = Some(s.copy(lastUs = math.max(s.lastUs, t),
                n = s.n + 1, sum = s.sum + e.value))
            case Some(s) =>
              closed ::= close(uid, s)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          st.update(s)
          // one-live-timer discipline: clear stale horizons, re-arm at
          // the open tail's idle deadline (event-time ms). Skip the
          // re-register when the horizon is unchanged (a batch that
          // didn't extend the session) — registering an existing
          // timestamp is a warn-and-ignore in the store, not an error,
          // but the quiet path is the honest one.
          val want = s.lastUs / 1000 + gap.toMillis
          val existing = getHandle.listTimers()
            .map(_.asInstanceOf[Long]).toSet
          existing.foreach(ts =>
            if (ts != want) getHandle.deleteTimer(ts))
          if (!existing.contains(want)) getHandle.registerTimer(want)
        }
        closed.reverse.iterator
      }
      override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
          expired: ExpiredTimerInfo): Iterator[ClosedSession] = {
        // the one-live-timer discipline means a firing timer IS the
        // open session's deadline; a stale race (state already rolled
        // forward) is guarded by re-checking the horizon
        if (st.exists()) {
          val s = st.get()
          if (s.lastUs / 1000 + gap.toMillis <= expired.getExpiryTimeInMs) {
            st.clear()
            return Iterator.single(close(uid, s))
          }
        }
        Iterator.empty
      }
    }
    implicit val outEnc: Encoder[ClosedSession] = Encoders.product[ClosedSession]
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(proc, TimeMode.EventTime(), OutputMode.Append())
  }

  /** One confirmed near-duplicate pair from the streaming screen. */
  final case class NearDupHit(id_corpus: Long, id_new: Long, jaccard: Double)

  /** T-state/E2 — STREAMING crawl-vs-corpus near-dup screen: the q84
    * incremental MinHash dedup as a LIVE operator. The CORPUS side is
    * indexed ONCE (band table from [[graft.ext.Dedup.minhashSignature]]
    * + distinct shingle sets, both pinned by localCheckpoint) and rides
    * the stream-static joins as BROADCAST sides; each arriving document
    * computes its signature SCAN-SIDE (array_min over per-shingle
    * xxhash64 — bit-identical to the batch aggregation's min, no
    * groupBy, no shuffle), band-joins the corpus index, exact-verifies
    * candidates per row (array_intersect — the batch verifyJaccard
    * arithmetic on the same distinct shingle arrays), and a
    * `transformWithState` ValueState emits each confirmed pair ONCE —
    * multi-band matches within a batch and re-crawled documents across
    * batches both dedupe.
    *
    * This completes the dedup family in BOTH modes: every batch rung
    * (exact/MinHash/SimHash/PPJoin) now has an incremental or streaming
    * twin, and q514 proves this one against the batch q84 oracle.
    *
    * Scale: per-document cost = numHashes·|shingles| hash ops inside
    * one codegen span; the broadcast index is the corpus BAND table
    * (production refreshes it as the corpus grows — it is the stored
    * artifact the q84 note promised); emit-once state is one boolean
    * per CONFIRMED pair, bounded by the true near-dup cardinality,
    * orders below the candidate or fact space. */
  def streamingNearDupScreen(newDocs: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String,
      shingleSize: Int = 3, numHashes: Int = 16, bands: Int = 16,
      threshold: Double = 0.8)
      : org.apache.spark.sql.Dataset[NearDupHit] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(newDocs.isStreaming, "newDocs must be a streaming DataFrame")
    val spark = corpus.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.Column
    val nRows = numHashes / bands
    // the EXACT band expression of Dedup.minhashNearDuplicates*: any
    // drift here silently zeroes recall, so both sides use this one
    def bandArr(sig: Column): Column =
      transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(concat_ws("_", b,
          concat_ws(",", slice(sig, b * nRows + 1, lit(nRows))))))
    val corpusBands = graft.ext.Dedup
      .minhashSignature(corpus, textCol, idCol, shingleSize, numHashes)
      .select(col(idCol).cast("long").as("id_corpus"),
        posexplode(bandArr(col("signature"))).as(Seq("band", "band_hash")))
      .localCheckpoint()
    val corpusSh = corpus
      .select(col(idCol).cast("long").as("id_corpus"),
        graft.ext.Dedup.wordShingles(col(textCol), shingleSize).as("__csh"))
      .filter(size(col("__csh")) >= 1)
      .withColumn("__n_c", size(col("__csh")).cast("long"))
      .localCheckpoint()
    val streamBands = newDocs
      .withColumn("id_new", col(idCol).cast("long"))
      .withColumn("__sh",
        graft.ext.Dedup.wordShingles(col(textCol), shingleSize))
      .filter(size(col("__sh")) >= 1)
      .withColumn("__sig", transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(col("__sh"), sh0 => xxhash64(i, sh0)))))
      .select(col("id_new"), col("__sh"),
        posexplode(bandArr(col("__sig"))).as(Seq("band", "band_hash")))
    val verified = streamBands
      .join(broadcast(corpusBands), Seq("band", "band_hash"))
      .join(broadcast(corpusSh), Seq("id_corpus"))
      .withColumn("__inter",
        size(array_intersect(col("__sh"), col("__csh"))).cast("long"))
      .withColumn("__n_new", size(col("__sh")).cast("long"))
      .withColumn("jaccard",
        col("__inter") / (col("__n_c") + col("__n_new") - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_corpus"), col("id_new"), col("jaccard"))
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
      TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val outEnc: Encoder[NearDupHit] = Encoders.product[NearDupHit]
    val hits = verified.as[NearDupHit]
    val proc = new StatefulProcessor[(Long, Long), NearDupHit, NearDupHit] {
      @transient private var seen:
        org.apache.spark.sql.streaming.ValueState[Boolean] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        seen = getHandle.getValueState[Boolean]("seen",
          Encoders.scalaBoolean, TTLConfig.NONE)
      override def handleInputRows(key: (Long, Long),
          rows: Iterator[NearDupHit], timers: TimerValues)
          : Iterator[NearDupHit] = {
        if (seen.exists() || !rows.hasNext) Iterator.empty
        else { val h = rows.next(); seen.update(true); Iterator.single(h) }
      }
    }
    hits.groupByKey(h => (h.id_corpus, h.id_new))
      .transformWithState(proc, TimeMode.None(), OutputMode.Append())
  }

  /** Input/output records for the stateful streaming EWMA. State keeps
    * the OPEN (latest) day separate from the fold: `smPrev` is the
    * smoothed value after all CLOSED days; `nOpen` the open day's
    * running count (`first` marks the open day as the series head,
    * whose EWMA seeds at its own count). */
  final case class KeyedStamp(key: String, ts: java.sql.Timestamp)
  final case class EwmaDayState(lastDay: Int, smPrev: Long, nOpen: Long,
    first: Boolean)
  final case class EwmaDayOut(event_type: String, day: java.time.LocalDate,
    n: Long, ewma: Long)

  /** T-state — STREAMING twin of [[graft.ops.TimeSeriesOps.ewmaInt]]:
    * per-key daily event counts smoothed by the same truncating
    * integer recursion s ← (num·n + (den−num)·s) div den, carried as
    * `flatMapGroupsWithState` custom state across micro-batches — the
    * live anomaly-baseline smoother whose batch twin (q156) is the
    * oracle.
    *
    * Ordering contract: within a batch, days fold in ascending order
    * (the handler rolls the batch up and sorts — bounded by the
    * calendar, like the batch op). ACROSS batches: a day STRICTLY
    * before the state's open day is DROPPED (a replay — file sources
    * under availableNow deliver in-order, so the drop makes replays
    * visible as missing rows instead of silently wrong smoothing);
    * events for the OPEN day itself — a day straddling two
    * micro-batch boundaries — are MERGED into its running count and
    * the day's row is RE-EMITTED with the corrected (n, ewma). Output
    * is therefore a changelog: consumers take the row with the
    * largest n per (key, day) (n only grows on merge). When batch
    * boundaries align with days, exactly one row per day is emitted —
    * the batch twin bit for bit. State = 24 bytes per key.
    */
  def statefulDailyEwma(events: org.apache.spark.sql.Dataset[KeyedStamp],
      aNum: Long, aDen: Long)
      : org.apache.spark.sql.Dataset[EwmaDayOut] = {
    require(aNum > 0 && aDen > 0 && aNum <= aDen, "alpha num/den in (0, 1]")
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    // EWMA of the fold INCLUDING the open day
    def smOf(s: EwmaDayState): Long =
      if (s.first) s.nOpen
      else (aNum * s.nOpen + (aDen - aNum) * s.smPrev) / aDen

    def handle(key: String, batch: Iterator[KeyedStamp],
        state: GroupState[EwmaDayState]): Iterator[EwmaDayOut] = {
      val byDay = batch.toSeq
        .groupBy(e => math.floorDiv(e.ts.getTime, 86400000L).toInt)
        .map { case (d, es) => (d, es.size.toLong) }
        .toSeq.sortBy(_._1)
      var cur = state.getOption
      val out = byDay.flatMap { case (d, n) =>
        cur match {
          case Some(s) if d < s.lastDay => None // replay of a closed day
          case Some(s) if d == s.lastDay =>
            // open day straddles a batch boundary: merge + re-emit
            val merged = s.copy(nOpen = s.nOpen + n)
            cur = Some(merged)
            Some(EwmaDayOut(key, java.time.LocalDate.ofEpochDay(d.toLong),
              merged.nOpen, smOf(merged)))
          case Some(s) => // d > lastDay: close the open day, start d
            val next = EwmaDayState(d, smOf(s), n, first = false)
            cur = Some(next)
            Some(EwmaDayOut(key, java.time.LocalDate.ofEpochDay(d.toLong),
              n, smOf(next)))
          case None =>
            val head = EwmaDayState(d, 0L, n, first = true)
            cur = Some(head)
            Some(EwmaDayOut(key, java.time.LocalDate.ofEpochDay(d.toLong),
              n, smOf(head)))
        }
      }
      cur.foreach(state.update)
      out.iterator
    }

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(handle)
  }

  final case class CusumDayState(lastDay: Int, sPosPrev: Long,
    sNegPrev: Long, nOpen: Long, first: Boolean)
  final case class CusumDayOut(event_type: String, day: java.time.LocalDate,
    n: Long, s_pos: Long, s_neg: Long, alarm: Boolean)

  /** T-state — STREAMING tabular CUSUM drift alarm (Page 1954; the
    * live twin of q126's batch CUSUM): per-key DAILY event counts run
    * the two one-sided cumulative sums
    *   S⁺ ← max(0, S⁺ + (n − μ₀ − k)),  S⁻ ← max(0, S⁻ + (μ₀ − n − k))
    * as `flatMapGroupsWithState` custom state — the volume-drift
    * monitor that fires while the day is still open. All integer; the
    * alarm is S⁺ ≥ h or S⁻ ≥ h.
    *
    * Changelog semantics exactly as [[statefulDailyEwma]]: replays of
    * CLOSED days drop; an OPEN day straddling a micro-batch boundary
    * merges its counts and RE-EMITS with the corrected row (n only
    * grows — consumers keep the max-n row per (key, day)), so
    * micro-batch alignment can never change the final table. State =
    * 28 bytes per key.
    *
    * Scale: shuffle keyed on the event key; each batch folds its own
    * (key, day) rollup, never raw rows. */
  def statefulDailyCusum(events: org.apache.spark.sql.Dataset[KeyedStamp],
      mu0: Long, slack: Long, h: Long)
      : org.apache.spark.sql.Dataset[CusumDayOut] = {
    require(slack >= 0 && h > 0, "slack >= 0, h > 0")
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    // CUSUM pair including the OPEN day's current count
    def sOf(s: CusumDayState): (Long, Long) = {
      val pPrev = if (s.first) 0L else s.sPosPrev
      val nPrev = if (s.first) 0L else s.sNegPrev
      (math.max(0L, pPrev + (s.nOpen - mu0 - slack)),
        math.max(0L, nPrev + (mu0 - s.nOpen - slack)))
    }

    def emit(key: String, d: Int, s: CusumDayState): CusumDayOut = {
      val (sp, sn) = sOf(s)
      CusumDayOut(key, java.time.LocalDate.ofEpochDay(d.toLong),
        s.nOpen, sp, sn, sp >= h || sn >= h)
    }

    def handle(key: String, batch: Iterator[KeyedStamp],
        state: GroupState[CusumDayState]): Iterator[CusumDayOut] = {
      val byDay = batch.toSeq
        .groupBy(e => math.floorDiv(e.ts.getTime, 86400000L).toInt)
        .map { case (d, es) => (d, es.size.toLong) }
        .toSeq.sortBy(_._1)
      var cur = state.getOption
      val out = byDay.flatMap { case (d, n) =>
        cur match {
          case Some(s) if d < s.lastDay => None // replay of a closed day
          case Some(s) if d == s.lastDay =>
            val merged = s.copy(nOpen = s.nOpen + n)
            cur = Some(merged)
            Some(emit(key, d, merged))
          case Some(s) => // close the open day into the prefix sums
            val (sp, sn) = sOf(s)
            val next = CusumDayState(d, sp, sn, n, first = false)
            cur = Some(next)
            Some(emit(key, d, next))
          case None =>
            val head = CusumDayState(d, 0L, 0L, n, first = true)
            cur = Some(head)
            Some(emit(key, d, head))
        }
      }
      cur.foreach(state.update)
      out.iterator
    }

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(handle)
  }

  /** Input/output records for [[statefulDrawdown]]. */
  final case class DrawdownIn(key: Long, us: Long, tie: Long, vMicro: Long)
  final case class DrawdownOut(user_id: Long, n_events: Long,
    peak_micro: Long, max_drawdown_micro: Long)

  /** T-state — per-key RUNNING MAXIMUM DRAWDOWN as a Spark 4
    * `transformWithState` StatefulProcessor (the arbitrary-state API
    * that supersedes flatMapGroupsWithState): per key, walk events in
    * EVENT-TIME order (ties on `tie`) maintaining the running peak and
    * the largest peak-to-trough drop seen — the risk/monitoring
    * readout ("how far below its best has this metric fallen").
    * State = (n, peak, maxDD) in a ValueState; each batch emits the
    * key's updated row (Update mode changelog — consumers keep the
    * last row per key). Event-time order inside a batch comes from an
    * explicit sort of the buffered group, so a single-batch replay is
    * bit-deterministic and a batch oracle replays it with one
    * cumulative-max window.
    *
    * Scale: state is 3 longs per key in the RocksDB store; each
    * micro-batch shuffles only that batch keyed by user. */
  def statefulDrawdown(events: org.apache.spark.sql.Dataset[DrawdownIn])
      : org.apache.spark.sql.Dataset[DrawdownOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
      TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoder, Encoders}
    val proc = new StatefulProcessor[Long, DrawdownIn, DrawdownOut] {
      @transient private var st:
        org.apache.spark.sql.streaming.ValueState[(Long, Long, Long)] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[(Long, Long, Long)]("dd",
          Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
            Encoders.scalaLong), TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[DrawdownIn],
          timers: TimerValues): Iterator[DrawdownOut] = {
        val sorted = rows.toSeq.sortBy(r => (r.us, r.tie))
        var (n, peak, dd) =
          if (st.exists()) st.get() else (0L, Long.MinValue, 0L)
        sorted.foreach { r =>
          n += 1
          if (r.vMicro > peak) peak = r.vMicro
          if (peak - r.vMicro > dd) dd = peak - r.vMicro
        }
        st.update((n, peak, dd))
        Iterator.single(DrawdownOut(key, n, peak, dd))
      }
    }
    implicit val outEnc: Encoder[DrawdownOut] = Encoders.product[DrawdownOut]
    events.groupByKey(_.key)(Encoders.scalaLong)
      .transformWithState(proc, TimeMode.None(), OutputMode.Update())
  }

  /** Input/output records for [[statefulTopContributors]]. */
  final case class ContribIn(key: String, user: Long, cents: Long)
  final case class TopContribOut(event_type: String, rank: Int,
    user_id: Long, total_cents: Long)

  /** T-state — per-key RUNNING TOP-K CONTRIBUTORS through a Spark 4
    * `transformWithState` StatefulProcessor with MAP state: per event
    * type, a MapState[user → running cent total] accumulates across
    * micro-batches; each batch that touches the key re-emits the
    * current top-k leaderboard (Update-mode changelog, ties broken
    * (total desc, user asc)). ValueState (q452) holds one record per
    * key — MapState is the API for per-key COLLECTIONS, the leaderboard
    * /top-talkers/heavy-hitters shape.
    *
    * Scale: state is one map entry per (key, contributor) in RocksDB —
    * the same cardinality a batch groupBy would shuffle; each batch
    * shuffles only its own rows keyed by event type. The k-row
    * emission iterates the key's map: bounded by that key's
    * contributor count (actor-bounded; pair with an upstream cap for
    * adversarial cardinalities). */
  def statefulTopContributors(events: org.apache.spark.sql.Dataset[ContribIn],
      k: Int): org.apache.spark.sql.Dataset[TopContribOut] = {
    require(k >= 1, "k >= 1")
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
      TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoder, Encoders}
    val proc = new StatefulProcessor[String, ContribIn, TopContribOut] {
      @transient private var st:
        org.apache.spark.sql.streaming.MapState[Long, Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getMapState[Long, Long]("totals",
          Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      override def handleInputRows(key: String, rows: Iterator[ContribIn],
          timers: TimerValues): Iterator[TopContribOut] = {
        rows.foreach { r =>
          val cur = if (st.containsKey(r.user)) st.getValue(r.user) else 0L
          st.updateValue(r.user, cur + r.cents)
        }
        val top = st.iterator().toSeq
          .sortBy { case (user, total) => (-total, user) }
          .take(k)
        top.iterator.zipWithIndex.map { case ((user, total), i) =>
          TopContribOut(key, i + 1, user, total)
        }
      }
    }
    implicit val outEnc: Encoder[TopContribOut] =
      Encoders.product[TopContribOut]
    events.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(proc, TimeMode.None(), OutputMode.Update())
  }

  /** Input/output records for [[statefulPatternMatch]]. */
  final case class PatternIn(key: Long, us: Long, tie: Long, etype: String)
  final case class PatternHit(user_id: Long, hit_event: Long)

  /** T-state — cross-batch ADJACENT-SEQUENCE PATTERN MATCH through a
    * Spark 4 `transformWithState` StatefulProcessor with LIST state:
    * per key, a ListState buffer holds the last (pattern.length − 1)
    * event types; each batch walks its rows in event-time order and
    * emits a hit whenever the buffer + current event equals the target
    * pattern — the CEP/funnel-trigger shape ("view then click then
    * purchase, adjacently"), firing even when the pattern straddles
    * micro-batches. Completes the arbitrary-state API trio beside
    * q452's ValueState record and q471's MapState collection.
    *
    * State is (pattern.length − 1) strings per key; the in-batch
    * event-time sort makes a single-batch replay equal the batch
    * lag-window oracle exactly. */
  def statefulPatternMatch(events: org.apache.spark.sql.Dataset[PatternIn],
      pattern: Seq[String]): org.apache.spark.sql.Dataset[PatternHit] = {
    require(pattern.length >= 2, "pattern of at least 2 types")
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
      TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoder, Encoders}
    val want = pattern.toList
    val keep = pattern.length - 1
    val proc = new StatefulProcessor[Long, PatternIn, PatternHit] {
      @transient private var st:
        org.apache.spark.sql.streaming.ListState[String] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getListState[String]("buf", Encoders.STRING,
          TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[PatternIn],
          timers: TimerValues): Iterator[PatternHit] = {
        var buf = st.get().toList
        val hits = Seq.newBuilder[PatternHit]
        rows.toSeq.sortBy(r => (r.us, r.tie)).foreach { r =>
          buf = (buf :+ r.etype).takeRight(keep + 1)
          if (buf == want) hits += PatternHit(key, r.tie)
          buf = buf.takeRight(keep)
        }
        st.put(buf.toArray)
        hits.result().iterator
      }
    }
    implicit val outEnc: Encoder[PatternHit] = Encoders.product[PatternHit]
    events.groupByKey(_.key)(Encoders.scalaLong)
      .transformWithState(proc, TimeMode.None(), OutputMode.Append())
  }

  /** T6 — parquet sink with checkpoint (exactly-once file sink). */
  def parquetSink(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)

  /** T6 — stream-static enrichment: join each micro-batch back to a
    * static dimension (the reference's J1 join-stats-to-sensors step);
    * foreachBatch gives the batch DataFrame API inside the stream. */
  def enrichedSink(stats: DataFrame, static: DataFrame, joinKey: String,
      path: String, checkpoint: String): DataStreamWriter[Row] =
    stats.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.join(broadcast(static), Seq(joinKey), "left")
          .write.mode("append").parquet(path)
      }

  /** Drive a query over all currently-available input then stop —
    * the synchronous test/replay harness. */
  def runOnce(q: StreamingQuery): Unit = {
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(10000)
  }

  /** Input/output records for the stateful streaming funnel. */
  final case class TypedStamp(key: String, us: Long, etype: String)
  final case class FunnelState(reach: List[Long])
  final case class FunnelOut(user_id: String, furthest: Long,
    t1_us: Long, t2_us: Long, t3_us: Long)

  /** T-state/A1 — sequential funnel as an explicit streaming state
    * machine (`flatMapGroupsWithState`): per key, advance through
    * `stages` in EVENT-TIME order — stage i+1 must be strictly after
    * stage i's reach time and within `horizonUs` of stage 1 — and
    * emit the key's row whenever its furthest stage GROWS (a
    * changelog: consumers keep the max-furthest row per key, which is
    * also the latest). The reach times are exactly the batch
    * sequential-funnel mins (first qualifying event in time order IS
    * the min), so the batch oracle replays them with chained
    * conditional-min aggregations.
    *
    * Ordering contract (statefulDailyEwma's): within a batch events
    * fold in (us, etype) order; ACROSS batches delivery must be
    * event-time ordered (file-replay sources under availableNow are)
    * — an out-of-order earlier event cannot retroactively lower an
    * already-taken reach time and is simply considered late. State =
    * at most |stages| longs per key, watermark-free by design (the
    * funnel horizon, not the watermark, bounds its lifetime).
    * Currently emits the 3-stage shape (t1..t3; absent = -1). */
  def statefulFunnel(events: org.apache.spark.sql.Dataset[TypedStamp],
      stages: Seq[String], horizonUs: Long)
      : org.apache.spark.sql.Dataset[FunnelOut] = {
    require(stages.size == 3, "statefulFunnel emits the 3-stage shape")
    require(horizonUs > 0, "horizonUs must be positive")
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def handle(key: String, batch: Iterator[TypedStamp],
        state: GroupState[FunnelState]): Iterator[FunnelOut] = {
      var reach = state.getOption.map(_.reach).getOrElse(Nil)
      val before = reach.size
      val sorted = batch.toSeq.sortBy(e => (e.us, e.etype))
      sorted.foreach { e =>
        if (reach.size < stages.size && e.etype == stages(reach.size) &&
          (reach.isEmpty ||
            (e.us > reach.last && e.us <= reach.head + horizonUs)))
          reach = reach :+ e.us
      }
      if (reach.size > before) {
        state.update(FunnelState(reach))
        val t = reach.padTo(3, -1L)
        Iterator.single(FunnelOut(key, reach.size.toLong, t(0), t(1), t(2)))
      } else Iterator.empty
    }
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(handle)
  }
}
