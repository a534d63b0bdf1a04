package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.ColumnException

/** Time-series operators (SURVEY.md A5, A8, P8, P9).
  *
  * The reference loads long-format observations, slices a date range on
  * a (ts, id_sensor) MultiIndex, filters per hour-interval with pandas
  * `between_time`, and aggregates per sensor
  * (reference: src/data_preprocessing.py:276-351, :563-585).
  *
  * Divergences implemented as INTENDED semantics (unit-test-pinned):
  *  - the reference's interval loop overwrites `stats` each iteration
  *    (:571-584) so only the last interval survives; we emit ALL
  *    intervals (the docstring :301-302 and the naming machinery show
  *    multi-interval output is the intent);
  *  - overnight wrap (`('22:00:00','05:00:00')`) is the documented
  *    default interval (:301) — pandas `between_time` wraps, so the
  *    predicate must be `t >= beg OR t <= end` when beg > end.
  */
object TimeSeriesOps {

  // ---- by-design plan-hazard documentation (Guardrails.expect) ------
  // Each entry registers a deliberately-BOUNDED single-partition window
  // or unconditioned join this object builds, with its boundedness
  // argument, so the optimizer audit (PlanAudit / the Guardrails rule)
  // flags only NEW hazards instead of letting them hide among known
  // ones. Markers are operator-owned columns of the hazard plan node.
  graft.plans.Guardrails.expect("single_partition_window",
    "__t, __v", "acfProfile: calendar-bounded series rollup",
    "calendar")
  graft.plans.Guardrails.expect("single_partition_window",
    "_we0, t, v", "xmrChart: calendar-bounded series lag",
    "calendar")
  graft.plans.Guardrails.expect("cartesian_join",
    "lag, n_pairs", "acfProfile: k-row lag frame x 1-row moments broadcast",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__t, __x, __y", "grangerLag1: calendar-bounded series lag",
    "calendar")



  /** Seconds-of-day of a timestamp column (wrap-aware interval basis). */
  def secondsOfDay(ts: Column): Column =
    hour(ts) * 3600 + minute(ts) * 60 + second(ts)

  private def parseTod(s: String): Int = {
    val p = s.split(":").map(_.toInt)
    p(0) * 3600 + (if (p.length > 1) p(1) * 60 else 0) + (if (p.length > 2) p(2) else 0)
  }

  /** P9 — hour-of-day predicate, inclusive bounds, overnight-wrap-aware
    * (pandas between_time semantics, reference :574, :581). */
  def hourIntervalPredicate(ts: Column, beg: String, end: String): Column = {
    val (b, e) = (parseTod(beg), parseTod(end))
    val t = secondsOfDay(ts)
    if (b <= e) t.between(b, e) else (t >= b) || (t <= e)
  }

  /** P8 — date-range filter, inclusive of the full end day (pandas
    * label-slice semantics on date-level strings, reference :329-331).
    * `requireNonEmpty` reproduces the reference's empty-slice error
    * (:332-333); it costs one cheap `isEmpty` action. */
  def dateRangeFilter(df: DataFrame, tsCol: String, beg: String, end: String,
      requireNonEmpty: Boolean = false): DataFrame = {
    val out = df.filter(col(tsCol) >= to_timestamp(lit(beg)) &&
      col(tsCol) < date_add(to_timestamp(lit(end)).cast("date"), 1).cast("timestamp"))
    if (requireNonEmpty && out.isEmpty)
      throw graft.core.DataIOError(s"$tsCol in [$beg, $end]", "empty date-range slice")
    out
  }

  /** A5 (intended semantics) — per-id, per-hour-interval, per-column
    * aggregation over a date range; ALL interval blocks are computed and
    * joined, with the reference's `func_col_interval` naming flatten
    * (:341-343 `'_'.join`).
    *
    * Plan shape: one scan; each interval block is a conditional
    * aggregation over the SAME groupBy — so there is exactly ONE
    * shuffle (on `idCol`) regardless of the interval count, not one
    * pass per interval as in the reference.
    */
  def intervalStats(
      obs: DataFrame,
      idCol: String,
      tsCol: String,
      valueCols: Seq[String],
      funcs: Seq[String],
      intervals: Seq[(String, String)],
      dateRange: Option[(String, String)] = None): DataFrame = {

    require(valueCols.nonEmpty && funcs.nonEmpty && intervals.nonEmpty,
      "intervalStats needs at least one value column, function, and interval")
    val missing = (valueCols :+ idCol :+ tsCol).filterNot(obs.columns.contains)
    if (missing.nonEmpty) throw ColumnException(missing, obs.columns.toSeq)

    val sliced = dateRange match {
      case Some((b, e)) => dateRangeFilter(obs, tsCol, b, e)
      case None => obs
    }

    def tag(s: String) = s.replace(":", "")
    val aggs = for {
      (iv @ (b, e)) <- intervals
      c <- valueCols
      f <- funcs
    } yield {
      val pred = hourIntervalPredicate(col(tsCol), b, e)
      // conditional agg: rows outside the interval contribute null
      Aggregates(f)(when(pred, col(c)))
        .as(Aggregates.statName(f, c, s"${tag(b)}_${tag(e)}"))
    }
    sliced.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** A8 — per-id min/max time profile + global bounds.
    * Returns (perId, global): perId has (id, min_ts, max_ts, n_obs);
    * global is the 1-row min/max of those (reference :619-637 prints;
    * we return DataFrames). */
  def timeProfile(obs: DataFrame, idCol: String, tsCol: String): (DataFrame, DataFrame) = {
    val perId = obs.groupBy(col(idCol)).agg(
      min(col(tsCol)).as("min_ts"), max(col(tsCol)).as("max_ts"),
      count(lit(1)).as("n_obs"))
    val global = perId.agg(min(col("min_ts")).as("global_min"),
      max(col("max_ts")).as("global_max"))
    (perId, global)
  }

  /** DIRECTIONAL as-of join with tolerance — the full pandas
    * merge_asof surface over the same union+window plan as
    * [[asofJoin]]:
    *  - `backward`: latest right row with rts <= lts (equal-ts: right
    *    wins — the [[asofJoin]] semantics);
    *  - `forward`: earliest right row with rts >= lts;
    *  - `nearest`: whichever of the two is closer in time; exact ties
    *    go BACKWARD (the pandas convention).
    * `toleranceMicros >= 0` voids any match farther than the tolerance
    * (per direction, before the nearest pick). Output columns carry
    * `prefix`; unmatched rows carry nulls.
    *
    * Scale: ONE shuffle + sort per key timeline (two running windows
    * over the same sort — Spark collapses them into one exchange);
    * never a range-condition join. */
  def asofJoinDirected(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, rightCols: Seq[String], direction: String,
      toleranceMicros: Long = -1L, prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward/forward/nearest, got '$direction'")
    val lCols = left.columns.toSeq
    // payload travels with ITS OWN timestamp so tolerance and the
    // nearest pick see the matched row's time, not just its values
    val rPayload = struct((col(tsCol).as("__rts") +:
      rightCols.map(col)): _*)
    val rPayloadType = right.select(rPayload).schema.head.dataType
    val tagged = left
      .withColumn("__side", lit(1))
      .withColumn("__rpay", lit(null).cast(rPayloadType))
      .select(lCols.map(col) :+ col("__side") :+ col("__rpay"): _*)
      .unionByName(
        right.select(col(key), col(tsCol), lit(0).as("__side"),
          rPayload.as("__rpay")),
        allowMissingColumns = true)
    // backward: right rows sort BEFORE left at equal ts (<=); forward:
    // right rows sort AFTER left at equal ts, first() looks ahead (>=)
    val wb = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def gate(c: Column): Column =
      if (toleranceMicros < 0) c
      else when(c.isNotNull &&
        abs(unix_micros(col(tsCol)) - unix_micros(c.getField("__rts"))) <=
          toleranceMicros, c)
    val withBoth = tagged
      .withColumn("__b", gate(last(col("__rpay"), ignoreNulls = true).over(wb)))
      .withColumn("__f", gate(first(col("__rpay"), ignoreNulls = true).over(wf)))
    val picked = direction match {
      case "backward" => col("__b")
      case "forward" => col("__f")
      case "nearest" =>
        val db = unix_micros(col(tsCol)) - unix_micros(col("__b").getField("__rts"))
        val df = unix_micros(col("__f").getField("__rts")) - unix_micros(col(tsCol))
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(db <= df, col("__b")) // exact tie -> backward
          .otherwise(col("__f"))
    }
    withBoth
      .filter(col("__side") === 1)
      .withColumn("__pick", picked)
      .select(lCols.map(col) ++
        (col("__pick").getField("__rts").as(s"${prefix}ts") +:
          rightCols.map(c => col("__pick").getField(c).as(s"$prefix$c"))): _*)
  }

  /** As-of join — for every left row, attach the latest right row with
    * `rightTs <= leftTs` for the same key (tie at equal ts: the right
    * row wins, i.e. <=-semantics, matching DuckDB/kdb ASOF JOIN).
    *
    * Spark has no native as-of join; the scalable shape is the
    * union+window trick: tag both sides, sort each key's timeline once,
    * carry the last-seen right payload forward with a running `last(
    * ignoreNulls)`, keep left rows. ONE shuffle + sort on the key —
    * same cost as a sort-merge join, no range-condition cartesian.
    * `rightCols` must be unique per (key, ts); pre-dedup the right side
    * otherwise (the helper enforces nothing — determinism is the
    * caller's contract, as with any as-of).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      rightCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lCols = left.columns.toSeq
    // the right payload travels as ONE struct that is non-null exactly
    // for right rows — so a right row whose payload VALUES are null
    // still supersedes older rows (last(ignoreNulls) skips only the
    // left-row placeholders, never a real right row)
    val rPayload = struct(rightCols.map(col): _*)
    val rPayloadType = right.select(rPayload).schema.head.dataType
    val tagged = left
      .withColumn("__side", lit(1))
      .withColumn("__rpay", lit(null).cast(rPayloadType))
      .select(lCols.map(col) :+ col("__side") :+ col("__rpay"): _*)
      .unionByName(
        right.select(col(key), col(tsCol), lit(0).as("__side"), rPayload.as("__rpay")),
        allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal ts → <= semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__carried", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(col) ++
        rightCols.map(c => col("__carried").getField(c).as(s"$prefix$c")): _*)
  }

  /** Range (interval) join — pair each point row with every interval
    * containing its timestamp. Spark plans a raw `beg <= ts AND ts <=
    * end` join as a nested loop; bucketing time into `bucketSeconds`
    * slices turns it into an equi-join: intervals explode to the
    * buckets they span, points map to one bucket, join on bucket id,
    * exact-filter. The 1-D sibling of SpatialOps.gridBucketJoin —
    * shuffle keyed on time buckets (uniform for bounded interval
    * lengths), no cartesian.
    *
    * Choose bucketSeconds ≈ typical interval length: shorter buckets
    * multiply the interval side's explosion factor, longer buckets
    * inflate candidate pairs.
    */
  def rangeJoin(points: DataFrame, tsCol: String,
      intervals: DataFrame, begCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0)
    val us = bucketSeconds * 1000000L
    val iv = intervals
      .withColumn("__b", explode(sequence(
        expr(s"unix_micros($begCol) div $us"),
        expr(s"unix_micros($endCol) div $us"))))
    val pt = points.withColumn("__b", expr(s"unix_micros($tsCol) div $us"))
    pt.join(iv, Seq("__b"))
      .filter(col(begCol) <= col(tsCol) && col(tsCol) <= col(endCol))
      .drop("__b")
  }

  /** U2 (deterministic form) — keep the first row per key by a total
    * order. The reference's drop-by-index (:643-647) is order-dependent;
    * Spark's dropDuplicates is nondeterministic under parallelism, so
    * the engine's canonical dedup is rank-based: min over
    * (orderCols, tieBreak). */
  def dedupFirst(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** A8/F7 — lagged autocorrelation of a binned series: how strongly a
    * sensor's signal at bin t predicts bin t+lag (periodicity /
    * drift detection — the diagnostic a sensor fleet runs before
    * choosing resampling windows). Values quantize to integer units
    * (`round(value · quantScale)`) so the per-bin sums and the Pearson
    * correlation ride [[Aggregates.linearFitExact]]'s exact long
    * arithmetic — bit-portable on any partitioning. Only bins observed
    * on BOTH sides of a lag pair contribute (no imputation here;
    * compose [[resampleFill]] upstream to correlate a gapless grid).
    *
    * Shape: one (key, bin) agg collapses event volume; the lag
    * explode multiplies the BINNED series (maxLag+1 rows per bin, not
    * per event); the self-join keys on (key, bin+lag) — equi, uniform;
    * the final stats agg keys on (key, lag) with bounded output. */
  def laggedAutocorrelation(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, binSeconds: Int, maxLag: Int,
      quantScale: Int = 100): DataFrame = {
    require(maxLag >= 0, "maxLag must be non-negative")
    val series = df
      .withColumn("__sec", unix_timestamp(col(tsCol)))
      .withColumn("bin", expr(s"__sec div $binSeconds"))
      .withColumn("__vq", round(col(valueCol) * quantScale, 0).cast("long"))
      .groupBy(col(keyCol), col("bin"))
      .agg(sum(col("__vq")).as("sv"))
    val a = series
      .select(col(keyCol), col("bin"), col("sv").as("x"))
      .withColumn("lag", explode(sequence(lit(0), lit(maxLag))))
    val b = series.select(col(keyCol).as("__k"), col("bin").as("__tbin"),
      col("sv").as("y"))
    val joined = a.join(b,
      col(keyCol) === col("__k") && col("__tbin") === col("bin") + col("lag"))
    Aggregates.linearFitExact(joined, Seq(col(keyCol), col("lag")), col("x"), col("y"))
  }

  /** A5/P10 — resample to a regular grid + forward fill (the sensor
    * pipeline's gap repair: pandas `resample(...).ffill()` re-expressed
    * as a plan). Three stages, all keyed on the series id:
    *   1. bin the observations (`epoch div binSeconds` — integer, exact)
    *      and aggregate per (key, bin): event count + max value (an
    *      exact selection, no float accumulation);
    *   2. explode each key's full [min_bin, max_bin] range into the
    *      regular grid and left-join the aggregates back;
    *   3. forward-fill empty bins with `last(_, ignoreNulls)` over the
    *      bin order — one window pass; the first bin of every key is
    *      observed by construction, so no leading nulls survive.
    *
    * Scale: event volume collapses at the first (key, bin) aggregation
    * (map-side partials); every later stage is grid-sized — span/
    * binSeconds rows per key regardless of volume. The join shuffles on
    * (key, bin) and the fill window re-keys on the series id alone (one
    * additional grid-sized shuffle). Gap rows are `is_gap = true` with
    * n_events = 0 — auditable fill, not silent interpolation. */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      binSeconds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binSeconds > 0, "binSeconds must be positive")
    val binned = df
      .withColumn("__sec", unix_timestamp(col(tsCol)))
      .withColumn("bin", expr(s"__sec div $binSeconds"))
      .groupBy(col(keyCol), col("bin"))
      .agg(count(lit(1)).as("n_events"), max(col(valueCol)).as("v_max"))
    val grid = binned.groupBy(col(keyCol))
      .agg(min(col("bin")).as("__b0"), max(col("bin")).as("__b1"))
      .select(col(keyCol), explode(sequence(col("__b0"), col("__b1"))).as("bin"))
    val fillFrame = Window.partitionBy(col(keyCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(binned, Seq(keyCol, "bin"), "left")
      .withColumn("bin_ts", timestamp_seconds(col("bin") * binSeconds))
      .withColumn("is_gap", col("n_events").isNull)
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("v_fill", last(col("v_max"), ignoreNulls = true).over(fillFrame))
      .drop("v_max")
  }

  /** Time-weighted average per series key: each observation's value
    * holds from its timestamp until the key's NEXT observation (the
    * final observation holds nothing — no extrapolation), so
    * TWAP = Σ(vᵢ·Δtᵢ) / ΣΔtᵢ over the hold intervals. The metric a
    * tick stream needs where a plain mean over-weights bursts.
    *
    * Exactness: values quantize to cents, durations are integer µs;
    * both sums are exact DECIMAL(38,0), and the single float op — the
    * final division — runs on identical operands in any engine.
    * Returns (key, n_intervals, span_us, twap); keys with fewer than
    * two observations drop (no interval to weight).
    *
    * Scale: one key-partitioned window sort for the lead (uniform
    * actor keys), then a map-side-partial agg to |keys| rows. */
  def twap(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    // µs are strictly monotone in ts, so (__us, tie) is the same total
    // order as (ts, tie) and the projected frame needs no ts column
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__us"), col(tieCol))
    df.select(col(keyCol), col(tieCol),
        unix_micros(col(tsCol)).as("__us"),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("__vc"))
      .withColumn("__dt", lead(col("__us"), 1).over(w) - col("__us"))
      .filter(col("__dt").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__dt")).as("span_us"),
        sum(col("__vc").cast(d38) * col("__dt").cast(d38)).cast(d38).as("__num"))
      .withColumn("twap",
        col("__num").cast("double") / (col("span_us").cast("double") * 100))
      .drop("__num")
  }

  /** OHLC bars: per fixed time bin, the opening/high/low/closing
    * values and the observation count — the candle aggregation.
    * Open/close are the values at the (ts, tie)-first/-last rows of
    * the bin, made deterministic with ascending/descending
    * `row_number` flags folded into ONE hash aggregate (no arg-min
    * tie ambiguity). No arithmetic touches the value column, so
    * results hash-match unrounded.
    *
    * Scale: one shuffle+sort keyed on the time bin (naturally
    * balanced); the agg is map-side-partial on the same key. */
  def ohlcBars(df: DataFrame, tsCol: String, tieCol: String,
      valueCol: String, binMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binMicros > 0, "binMicros must be positive")
    val binned = df.select(
      expr(s"unix_micros($tsCol) div ${binMicros}L").as("bin"),
      col(tsCol), col(tieCol), col(valueCol))
    val asc = Window.partitionBy(col("bin")).orderBy(col(tsCol), col(tieCol))
    // the close flag derives from the SAME ascending sort: last row ⇔
    // __ra == count over the bin — an unordered window the existing
    // sort satisfies. A second descending window would re-sort every
    // bin partition for one flag.
    binned
      .withColumn("__ra", row_number().over(asc))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col("bin"))))
      .groupBy(col("bin"))
      .agg(max(when(col("__ra") === 1, col(valueCol))).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max(when(col("__ra") === col("__cnt"), col(valueCol))).as("close"),
        count(lit(1)).as("n"))
  }

  /** INTERVAL × INTERVAL overlap join per series key — the two-sided
    * upgrade of [[rangeJoin]] (point-in-interval): emit (key, id_a,
    * id_b) for every pair of half-open intervals with
    * a.s < b.e AND b.s < a.e. The Spark-gap operator: expressed
    * directly, Catalyst plans the inequality pair as a key-only join
    * with a quadratic per-key residual.
    *
    * Plan: tile time into `cellMicros` cells, explode each interval to
    * the cells it covers, equi-join on (key, cell). Deduplication is
    * arithmetic, not distinct(): a pair is KEPT only in the cell
    * containing max(a.s, b.s) — the first cell both intervals occupy —
    * so every overlapping pair survives exactly once and no
    * |pairs|-sized shuffle-dedup exists. Empty intervals (s ≥ e)
    * cannot overlap and are dropped.
    *
    * Scale: shuffle keys on (series key, time cell) — bounded skew by
    * construction; cost is Σ cells-per-interval, the classic
    * resolution/selectivity knob (cell ≈ median interval length). */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, keyCol: String,
      idCol: String, sCol: String, eCol: String, cellMicros: Long): DataFrame = {
    require(cellMicros > 0, "cellMicros must be positive")
    def cells(df: DataFrame, side: String) = df
      .select(col(keyCol), col(idCol).as(s"id_$side"),
        unix_micros(col(sCol)).as(s"__s_$side"),
        unix_micros(col(eCol)).as(s"__e_$side"))
      .filter(col(s"__s_$side") < col(s"__e_$side"))
      .withColumn("__cell", explode(sequence(
        expr(s"__s_$side div ${cellMicros}L"),
        expr(s"(__e_$side - 1) div ${cellMicros}L"))))
    cells(a, "a").join(cells(b, "b"), Seq(keyCol, "__cell"))
      .filter(col("__s_a") < col("__e_b") && col("__s_b") < col("__e_a") &&
        col("__cell") === expr(s"greatest(__s_a, __s_b) div ${cellMicros}L"))
      .select(col(keyCol), col("id_a"), col("id_b"))
  }

  /** A5/W-frame — running balance CLAMPED at zero over each key's
    * ordered integer deltas:
    *   s_t = max(0, s_{t−1} + x_t)
    * — the inventory/credit-balance recurrence (stock can't go
    * negative; a refund can't overdraw past zero). Superficially
    * recursive like [[ewmaInt]], but this one has a CLOSED FORM
    * (the reflection identity from queueing theory / Lindley's
    * recursion, public literature):
    *   s_t = P_t − min(0, min_{j≤t} P_j),   P = prefix sum
    * so it runs as ONE key-partitioned window (two functions sharing
    * the same frame+sort — one shuffle, one sort) on the fact table,
    * with no per-key sequential fold at all. All-integer, so exact
    * under any partitioning and engine; an oracle running the naive
    * recurrence must agree bit-for-bit — which is precisely what the
    * q160 recursive-CTE oracle checks. Returns the input grain with
    * `balance` appended.
    *
    * Scale: the q07 running-frame cost envelope — one shuffle+sort on
    * the key; no rollup-grain restriction (unlike ewmaInt, there is
    * no fold, so event-volume series are fine). */
  def clampedRunningBalance(df: DataFrame, keys: Seq[Column],
      orderCols: Seq[Column], deltaCol: Column): DataFrame = {
    require(keys.nonEmpty, "clampedRunningBalance requires key column(s)")
    require(orderCols.nonEmpty, "clampedRunningBalance requires order column(s)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys: _*).orderBy(orderCols.map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__p", sum(deltaCol.cast("long")).over(w))
      .withColumn("balance",
        col("__p") - least(lit(0L), min(col("__p")).over(w)))
      .drop("__p")
  }

  /** A5/A8 — integer EWMA over each key's ordered series: s₁ = v₁,
    *   s_t = (num·v_t + (den−num)·s_{t−1}) div den
    * — the recursive smoother pandas `ewm(alpha=num/den).mean()`
    * approximates, as exact integer state, so the result is
    * bit-identical under any partitioning AND any engine that unrolls
    * the same recurrence (truncating division, both engines).
    * Recursion is the one shape neither a window frame nor an agg can
    * express (each output depends on ALL priors with decaying weights);
    * Spark's gap is closed with an ordered `aggregate` fold over the
    * collected per-key series — the per-key sequential scan the
    * recurrence inherently is. Values must be non-negative longs
    * (Spark `div` and DuckDB `//` both truncate toward zero, but a
    * smoother over signed data invites floor-vs-trunc convention bugs
    * on OTHER engines — guarded with a typed error). Returns one
    * row per input point: (key…, order, value, ewma).
    *
    * Scale: ONE key-partitioned shuffle; state is the key's own series,
    * so this is for ROLLUP-sized series (daily/hourly aggregates —
    * bounded by the calendar, not event volume). Aggregate raw events
    * to the grain FIRST; the fold then costs O(points-per-key) with no
    * window machinery at all. */
  def ewmaInt(df: DataFrame, keys: Seq[Column], orderCol: Column,
      valueCol: Column, num: Long, den: Long): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "alpha num/den must be in (0, 1]")
    require(keys.nonEmpty, "ewmaInt requires key column(s) " +
      "(use a constant literal key for one global series)")
    val guarded = when(valueCol.cast("long") < 0,
      raise_error(lit("ewmaInt requires non-negative values — floor and " +
        "truncating division diverge below zero"))).otherwise(valueCol.cast("long"))
    val keyed = df.groupBy(keys: _*)
      .agg(array_sort(collect_list(struct(orderCol.as("o"), guarded.as("v"))))
        .as("__arr"))
    val keyNames = keyed.columns.dropRight(1).toSeq
    // the fold: acc = the running EWMA sequence; each step appends
    // f(last(acc), v). element_at(acc, -1) reads the previous state.
    val folded = keyed.withColumn("__sm", expr(
      s"""aggregate(__arr, cast(array() as array<bigint>),
         |  (acc, x) -> array_append(acc,
         |    CASE WHEN size(acc) = 0 THEN x.v
         |         ELSE (${num}L * x.v + ${den - num}L * element_at(acc, -1))
         |              div ${den}L END))""".stripMargin))
    folded.select(keyNames.map(col) :+
        posexplode(arrays_zip(col("__arr"), col("__sm"))).as(Seq("__i", "__z")): _*)
      .select(keyNames.map(col) :+ col("__z.__arr.o").as("order") :+
        col("__z.__arr.v").as("value") :+ col("__z.__sm").as("ewma"): _*)
  }

  /** A5/A8 — integer Holt double-exponential smoothing (level +
    * trend) over each key's ordered series, the one-step forecaster
    * EWMA can't be (EWMA lags any trending series by design):
    *   l₁ = v₁·S,  t₁ = 0, and for t > 1
    *   l_t = (aNum·v_t·S + (aDen−aNum)·(l_{t−1} + b_{t−1})) div aDen
    *   b_t = (bNum·(l_t − l_{t−1}) + (bDen−bNum)·b_{t−1}) div bDen
    * with all state scaled by `scale` = S so the truncating divisions
    * keep 1/S precision. Trend is SIGNED — safe because Spark `div`
    * and DuckDB `//` both truncate toward zero (verified, q166).
    * Returns (key…, order, value, level_s, trend_s, forecast_s) with
    * forecast_s = l_t + b_t = the scaled one-step-ahead prediction.
    *
    * Same fold-over-rollup shape (and the same scale contract) as
    * [[ewmaInt]]: ONE key-partitioned shuffle, state bounded by the
    * key's own rollup-grain series, oracle = the identical recurrence
    * as a recursive CTE. */
  def holtInt(df: DataFrame, keys: Seq[Column], orderCol: Column,
      valueCol: Column, aNum: Long, aDen: Long, bNum: Long, bDen: Long,
      scale: Long): DataFrame = {
    require(aNum > 0 && aDen > 0 && aNum <= aDen, "alpha num/den must be in (0, 1]")
    require(bNum > 0 && bDen > 0 && bNum <= bDen, "beta num/den must be in (0, 1]")
    require(scale >= 1, "scale must be >= 1")
    require(keys.nonEmpty, "holtInt requires key column(s) " +
      "(use a constant literal key for one global series)")
    val keyed = df.groupBy(keys: _*)
      .agg(array_sort(collect_list(struct(orderCol.as("o"),
        valueCol.cast("long").as("v")))).as("__arr"))
    val keyNames = keyed.columns.dropRight(1).toSeq
    // acc = running array<struct<l, b>>; element_at(acc, -1) is the
    // previous (level, trend) state
    val folded = keyed.withColumn("__st", expr(
      s"""aggregate(__arr, cast(array() as array<struct<l: bigint, b: bigint>>),
         |  (acc, x) -> array_append(acc,
         |    CASE WHEN size(acc) = 0
         |         THEN named_struct('l', x.v * ${scale}L, 'b', 0L)
         |         ELSE named_struct(
         |           'l', (${aNum}L * x.v * ${scale}L +
         |                 ${aDen - aNum}L * (element_at(acc, -1).l +
         |                                    element_at(acc, -1).b))
         |                div ${aDen}L,
         |           'b', (${bNum}L * ((${aNum}L * x.v * ${scale}L +
         |                  ${aDen - aNum}L * (element_at(acc, -1).l +
         |                                     element_at(acc, -1).b))
         |                 div ${aDen}L - element_at(acc, -1).l) +
         |                 ${bDen - bNum}L * element_at(acc, -1).b)
         |                div ${bDen}L) END))""".stripMargin))
    folded.select(keyNames.map(col) :+
        posexplode(arrays_zip(col("__arr"), col("__st"))).as(Seq("__i", "__z")): _*)
      .select(keyNames.map(col) :+ col("__z.__arr.o").as("order") :+
        col("__z.__arr.v").as("value") :+ col("__z.__st.l").as("level_s") :+
        col("__z.__st.b").as("trend_s") :+
        (col("__z.__st.l") + col("__z.__st.b")).as("forecast_s"): _*)
  }

  /** A5/A8 — additive seasonal decomposition with an INTEGER seasonal
    * component: value = seasonal + residual, where seasonal is the
    * per-(keys, season) truncating integer mean (sum div count) of the
    * value. The classical "seasonal means" decomposition (the first
    * step of STL-style analysis, kept libm-free): deseasonalized
    * residuals feed anomaly detection (q115's 3-sigma gate) without the
    * weekday/hour cycle drowning the signal. Adds
    * (seasonal_c, resid_c) to every input row.
    *
    * Scale: one (keys, season)-keyed agg with map-side combine — the
    * profile is |keys|·|seasons| rows — broadcast-joined back onto the
    * facts; no window over the fact table at all. */
  def seasonalDecompose(df: DataFrame, keys: Seq[Column], seasonCol: Column,
      valueCol: Column): DataFrame = {
    val base = df.withColumn("__season", seasonCol)
      .withColumn("__v", valueCol.cast("long"))
    val keyed = keys :+ col("__season")
    val profile = base.groupBy(keyed: _*)
      .agg(sum(col("__v")).as("__sum"), count(lit(1)).as("__n"))
      .withColumn("seasonal_c", expr("__sum div __n"))
      .drop("__sum", "__n")
    base.join(broadcast(profile),
        profile.columns.dropRight(1).toSeq)
      .withColumn("resid_c", col("__v") - col("seasonal_c"))
      .drop("__season", "__v")
  }

  /** A5/A8 — Holt–Winters-style seasonal forecast by classical
    * decomposition (Hyndman & Athanasopoulos FPP §3.6 / Persons 1919
    * seasonal means; the additive "decomposition forecast"): the
    * seasonal component is the per-season truncating integer mean
    * ([[seasonalDecompose]]), the deseasonalized residual runs through
    * the integer Holt recursion ([[holtInt]]), and each horizon step
    * re-adds the target step's seasonal mean:
    *   ŷ(n+h) = l_n + h·b_n + scale·s((t_n+h) mod m).
    * All state is exact integer (negative residuals included — both
    * engines truncate division identically), so every forecast is
    * bit-portable.
    *
    * Input contract: `tCol` is an integer TIME INDEX (e.g. epoch day)
    * on a REGULAR grid — season = t mod m; the series is a rollup.
    * Returns one row per h = 1..horizon:
    * (h, t, season, seasonal_c, level_s, trend_s, forecast_s,
    * forecast).
    *
    * Scale: a season-keyed agg (map-side combine) + the rollup-array
    * Holt fold + an horizon-sized finish — fact cost is the rollup. */
  def holtWintersForecast(series: DataFrame, tCol: Column, vCol: Column,
      m: Int, aNum: Long, aDen: Long, bNum: Long, bDen: Long,
      scale: Long, horizon: Int): DataFrame = {
    require(m >= 2 && m <= 1000, "2 <= m <= 1000")
    require(horizon >= 1 && horizon <= 100000, "1 <= horizon <= 1e5")
    val base = series.select(tCol.cast("long").as("__t"),
      vCol.cast("long").as("__v"), lit(1L).as("__k"))
    val dec = seasonalDecompose(base, Seq(col("__k")),
      col("__t") % m, col("__v"))
    val holt = holtInt(dec, Seq(col("__k")), col("__t"), col("resid_c"),
      aNum, aDen, bNum, bDen, scale)
    val last = holt.agg(
      max(struct(col("order"), col("level_s"), col("trend_s"))).as("__f"))
      .select(col("__f.order").as("__tn"), col("__f.level_s").as("__l"),
        col("__f.trend_s").as("__b"))
    val profile = dec.groupBy((col("__t") % m).as("season"))
      .agg(max(col("seasonal_c")).as("seasonal_c"))
    last.select(col("__tn"), col("__l"), col("__b"),
        explode(expr(s"sequence(1L, ${horizon}L)")).as("h"))
      .withColumn("t", col("__tn") + col("h"))
      .withColumn("season", col("t") % m)
      .join(broadcast(profile), Seq("season"))
      .select(col("h"), col("t"), col("season"), col("seasonal_c"),
        col("__l").as("level_s"), col("__b").as("trend_s"),
        (col("__l") + col("h") * col("__b") +
          col("seasonal_c") * scale).as("forecast_s"))
      .withColumn("forecast", col("forecast_s").cast("double") / scale)
      .orderBy(col("h"))
  }

  /** A5/A8 — OUT-OF-SAMPLE forecast backtest (the Tashman 2000
    * fixed-origin holdout): fit [[thetaForecast]] on the series up to
    * `splitT` only, forecast the holdout horizon, and score against
    * the ACTUALS the model never saw — per step the absolute error,
    * the naive (last-train-value) error, and the summary
    *   wape_ppm  = 10⁶·Σ|e| div Σ|actual|        (scale-free)
    *   mase_ppm  = 10⁶·Σ|e| div Σ|e_naive|       (< 10⁶ ⇔ beats naive)
    * — all exact integers on the micro grid. The honest-evaluation
    * loop every forecast family needs before anyone trusts q400/q404:
    * in-sample fit quality is not evidence.
    *
    * Returns one row per holdout step with an actual:
    * (h, t, actual, forecast_micro, ae_micro, naive_ae_micro,
    * wape_ppm, mase_ppm) — the two summaries constant per row.
    *
    * Scale: the rollup-array theta fit + an h-row join against the
    * holdout slice of the same rollup. */
  def forecastBacktest(series: DataFrame, tCol: Column, vCol: Column,
      splitT: Long, horizon: Int): DataFrame =
    backtestCore(series, tCol, vCol, splitT, horizon).orderBy(col("h"))

  /** [[forecastBacktest]] without the final sort — the fold unit
    * [[forecastCvRolling]] unions (a per-fold orderBy would sit
    * mid-plan under the union as a useless global sort). */
  private def backtestCore(series: DataFrame, tCol: Column, vCol: Column,
      splitT: Long, horizon: Int): DataFrame = {
    val base = series.select(tCol.cast("long").as("__t"),
      vCol.cast("long").as("__v")).localCheckpoint()
    val train = base.filter(col("__t") <= splitT)
    val lastTrain = train.orderBy(col("__t").desc).limit(1)
      .select(col("__v").as("__last"), col("__t").as("__tmax"))
    val fc = thetaForecast(train, col("__t"), col("__v"), horizon)
      .crossJoin(broadcast(lastTrain))
      .withColumn("t", col("__tmax") + col("h"))
    val scored = fc.join(base.select(col("__t").as("t"),
        col("__v").as("actual")), Seq("t"))
      .withColumn("ae_micro",
        abs(col("actual") * 1000000L - col("forecast_micro")))
      .withColumn("naive_ae_micro",
        abs(col("actual") - col("__last")) * 1000000L)
      .localCheckpoint()
    val tot = scored.agg(sum(col("ae_micro")).as("__sae"),
      sum(col("naive_ae_micro")).as("__snae"),
      sum(abs(col("actual"))).as("__sa"))
    scored.crossJoin(broadcast(tot))
      .select(col("h"), col("t"), col("actual"), col("forecast_micro"),
        col("ae_micro"), col("naive_ae_micro"),
        // err and actual share the micro grid: WAPE_ppm = Σae_micro/Σ|a|
        expr("__sae div greatest(__sa, 1L)").as("wape_ppm"),
        expr("(__sae * 1000000L) div greatest(__snae, 1L)").as("mase_ppm"))
  }

  /** A5/A8 — ROLLING-ORIGIN FORECAST CROSS-VALIDATION (Tashman 2000's
    * multiple-origin extension of [[forecastBacktest]]; Hyndman &
    * Athanasopoulos FPP "time series cross-validation" — public
    * literature): refit the theta model at each origin in `splits`,
    * score each fit on its own unseen horizon, and pool the folds into
    * one CV verdict — the honest model-selection loop (a single origin
    * can flatter or damn a model on one lucky window).
    *
    * Exactness: each fold is exactly one [[forecastBacktest]] (integer
    * theta fold, micro-unit errors); the pooled verdict
    * cv_mase_ppm = 10⁶·Σ_folds ae div Σ_folds naive_ae is one more
    * integer division. Returns per (fold, h):
    * (fold, h, t, actual, forecast_micro, ae_micro, naive_ae_micro,
    * wape_ppm, mase_ppm, cv_mase_ppm) — per-fold WAPE/MASE plus the
    * pooled column repeated.
    *
    * Scale: folds × the backtest cost — each fold's fit folds over its
    * train slice of the ROLLUP-grain series; holdout joins touch
    * horizon rows; folds are independent (orchestrate in parallel at
    * 100 TB). */
  def forecastCvRolling(series: DataFrame, tCol: Column, vCol: Column,
      splits: Seq[Long], horizon: Int): DataFrame = {
    require(splits.nonEmpty && splits.size <= 8, "1-8 origins")
    require(splits == splits.sorted && splits.distinct.size == splits.size,
      "splits must be strictly increasing")
    val d38 = "decimal(38,0)"
    val perFold = splits.zipWithIndex.map { case (sp, i) =>
        backtestCore(series, tCol, vCol, sp, horizon)
          .withColumn("fold", lit(i + 1))
      }.reduce(_ unionByName _)
      .localCheckpoint() // read by the pooled agg + the output
    val pooled = perFold.agg(
      sum(col("ae_micro").cast(d38)).cast(d38).as("__cae"),
      sum(col("naive_ae_micro").cast(d38)).cast(d38).as("__cnae"))
    perFold.crossJoin(broadcast(pooled))
      .withColumn("cv_mase_ppm", expr("CAST((__cae * 1000000) div " +
        "greatest(__cnae, CAST(1 AS decimal(38,0))) AS BIGINT)"))
      .select(col("fold"), col("h"), col("t"), col("actual"),
        col("forecast_micro"), col("ae_micro"), col("naive_ae_micro"),
        col("wape_ppm"), col("mase_ppm"), col("cv_mase_ppm"))
  }

  /** A5/A8 — one-step-ahead forecast evaluation: Holt ([[holtInt]])
    * against the naive last-value forecast, per key. For every row
    * after a key's first, the Holt error is
    * value_t·scale − forecast_s_{t−1} and the naive error is
    * (value_t − value_{t−1})·scale; the verdict is
    *   mase_ppm = 10⁶ · Σ|err_holt| div Σ|err_naive|
    * — the scale-free MASE quotient (Hyndman & Koehler 2006, public
    * literature), < 10⁶ iff the smoother actually beats naive. All
    * integer: sums of absolute scaled longs, one integer div. Input is
    * [[holtInt]]'s output; returns per key
    * (…keys, n_eval, sae_holt, sae_naive, mase_ppm).
    *
    * Scale: one key-partitioned lag window over the rollup-grain
    * series (the same grain holtInt already reduced to), then a
    * key-sized agg. */
  def forecastEval(holtOut: DataFrame, keyNames: Seq[String],
      scale: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyNames.map(col): _*).orderBy(col("order"))
    val lagged = holtOut
      .withColumn("__pf", lag(col("forecast_s"), 1).over(w))
      .withColumn("__pv", lag(col("value"), 1).over(w))
      .filter(col("__pf").isNotNull)
      .withColumn("__eh", abs(col("value") * scale - col("__pf")))
      .withColumn("__en", abs((col("value") - col("__pv")) * scale))
    lagged.groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as("n_eval"),
        sum(col("__eh")).as("sae_holt"),
        sum(col("__en")).as("sae_naive"))
      .withColumn("mase_ppm",
        when(col("sae_naive") > 0,
          expr("1000000 * sae_holt div sae_naive")))
  }

  /** A1 — XmR (individuals / moving-range) control chart over an
    * ordered integer series (Shewhart SPC; the 2.66 = 3/d₂ constant
    * is standard public SPC practice): limits
    *   UCL/LCL = x̄ ± 2.66·M̄R,  M̄R = mean |xᵢ − xᵢ₋₁|,
    * and each point is flagged when it falls outside. The
    * "is this metric merely noisy or actually broken" verdict a
    * pipeline-health dashboard renders per ingest series. x̄ and M̄R
    * are IEEE finishes over exact integer sums; the flag compares
    * doubles computed identically on both engines. Returns per point:
    * (t…, v, mr, ucl, lcl, out_of_control).
    *
    * Scale: the lag window and both means run over the SERIES rollup
    * (pass the time-grain rollup, never raw facts). */
  def xmrChart(series: DataFrame, orderCol: Column,
      valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = series.select(orderCol.as("t"), valueCol.cast("long").as("v"))
    val w = Window.orderBy(col("t"))
    val withMr = s.withColumn("mr",
      abs(col("v") - lag(col("v"), 1).over(w)))
    val stats = withMr.agg(count(lit(1)).as("__n"),
      sum(col("v")).as("__sv"),
      sum(col("mr")).as("__smr"),
      count(col("mr")).as("__nmr"))
    withMr.crossJoin(broadcast(stats))
      .withColumn("__xbar", col("__sv").cast("double") / col("__n").cast("double"))
      .withColumn("__mrbar", col("__smr").cast("double") / col("__nmr").cast("double"))
      .withColumn("ucl", round(col("__xbar") + lit(2.66) * col("__mrbar"), 6))
      .withColumn("lcl", round(col("__xbar") - lit(2.66) * col("__mrbar"), 6))
      .withColumn("out_of_control",
        col("v").cast("double") > col("ucl") ||
          col("v").cast("double") < col("lcl"))
      .select(col("t"), col("v"), col("mr"), col("ucl"), col("lcl"),
        col("out_of_control"))
  }

  /** A5/A8 — Croston's method for INTERMITTENT demand (Croston, Oper.
    * Res. Quarterly 1972 — public literature): series that are mostly
    * zeros (spare parts, long-tail SKUs, rare event types) wreck plain
    * EWMA — the zeros drag the level toward 0 and the forecast
    * whipsaws. Croston smooths two series at the DEMAND POINTS only:
    * demand size ẑ and inter-demand interval q̂ (both [[ewmaInt]]-style
    * integer recursions, state scaled by `scale`), and forecasts
    * demand-per-period as ẑ/q̂.
    *
    * Determinism contract: rows with demand ≤ 0 are dropped (zeros
    * carry no update by construction); the first demand point
    * initializes (ẑ = z·S, q̂ = 1·S — the "first gap is 1" convention,
    * documented); later points use gap = order − prev order. Both
    * recursions are truncating integer folds, so an unrolled recursive
    * CTE replays the trajectory bit-for-bit. forecast_s =
    * (z_s · scale) div q_s, still in scale units.
    * Returns per demand point: (keys…, order, demand, gap, z_s, q_s,
    * forecast_s).
    *
    * Scale: one key-keyed agg collects each key's DEMAND-POINT series
    * (bounded by the calendar, the [[ewmaInt]] envelope); the fold is
    * per-key scan-side work. */
  def crostonInt(df: DataFrame, keys: Seq[Column], orderCol: Column,
      demandCol: Column, aNum: Long, aDen: Long, scale: Long): DataFrame = {
    require(aNum > 0 && aDen > 0 && aNum <= aDen, "alpha num/den in (0, 1]")
    require(scale > 0, "scale must be positive")
    require(keys.nonEmpty, "crostonInt requires key column(s) " +
      "(use a constant literal key for one global series)")
    val keyed = df.filter(demandCol.cast("long") > 0)
      .groupBy(keys: _*)
      .agg(array_sort(collect_list(struct(orderCol.cast("long").as("o"),
        demandCol.cast("long").as("z")))).as("__arr"))
    val keyNames = keyed.columns.dropRight(1).toSeq
    // acc = running array<struct<o, z, g, zs, qs>>: previous state is
    // element_at(acc, -1); gap derives from the previous ORDER
    val folded = keyed.withColumn("__st", expr(
      s"""aggregate(__arr,
         |  cast(array() as array<struct<o: bigint, g: bigint,
         |                               zs: bigint, qs: bigint>>),
         |  (acc, x) -> array_append(acc,
         |    CASE WHEN size(acc) = 0
         |         THEN named_struct('o', x.o, 'g', 1L,
         |           'zs', x.z * ${scale}L, 'qs', ${scale}L)
         |         ELSE named_struct('o', x.o,
         |           'g', x.o - element_at(acc, -1).o,
         |           'zs', (${aNum}L * x.z * ${scale}L +
         |                  ${aDen - aNum}L * element_at(acc, -1).zs)
         |                 div ${aDen}L,
         |           'qs', (${aNum}L * (x.o - element_at(acc, -1).o) * ${scale}L +
         |                  ${aDen - aNum}L * element_at(acc, -1).qs)
         |                 div ${aDen}L) END))""".stripMargin))
    folded.select(keyNames.map(col) :+
        posexplode(arrays_zip(col("__arr"), col("__st"))).as(Seq("__i", "__z")): _*)
      .select(keyNames.map(col) :+ col("__z.__arr.o").as("order") :+
        col("__z.__arr.z").as("demand") :+ col("__z.__st.g").as("gap") :+
        col("__z.__st.zs").as("z_s") :+ col("__z.__st.qs").as("q_s") :+
        expr(s"(__z.__st.zs * ${scale}L) div __z.__st.qs").as("forecast_s"): _*)
  }

  /** A-stat/A8 — Page–Hinkley mean-shift detector (Page, Biometrika
    * 1954; Hinkley 1971 — public literature) over each key's ordered
    * series: the sequential change alarm that fires when the metric's
    * mean DRIFTS UP past tolerance δ — the online counterpart to the
    * retrospective Pettitt test (q244), and the standard concept-drift
    * monitor of streaming-ML systems.
    *   m_t = Σ_{i≤t} (x_i − x̄_i − δ),   PH_t = m_t − min_{0≤i≤t} m_i,
    * alarm when PH_t ≥ λ (x̄_i = running mean through i; the m_0 = 0
    * baseline is included in the min, the standard "increase" form —
    * an upward shift makes the increments positive and m climbs away
    * from its historical minimum).
    *
    * Determinism contract: the running-mean term is micro-quantized
    * per step with an integral div — term_u = (1e6·(t·x_t − S_t))
    * div t − 1e6·δ over exact longs — inside a struct fold (the
    * [[holtInt]] device), so the whole trajectory is integers and an
    * unrolled recursive CTE replays it bit-for-bit. Values must be
    * non-negative (floor vs truncating division diverge below zero —
    * the [[ewmaInt]] rule; pre-shift signed series).
    * Returns per point: (keys…, order, value, m_u, min_m_u, ph_u,
    * alarm).
    *
    * Scale: one key-keyed agg collects each series (the [[ewmaInt]]
    * envelope); the fold is per-key scan-side work. */
  def pageHinkleyInt(df: DataFrame, keys: Seq[Column], orderCol: Column,
      valueCol: Column, deltaMicro: Long, lambdaMicro: Long): DataFrame = {
    require(deltaMicro >= 0 && lambdaMicro > 0,
      "delta must be >= 0 and lambda > 0 (micro-units)")
    require(keys.nonEmpty, "pageHinkleyInt requires key column(s) " +
      "(use a constant literal key for one global series)")
    val guarded = when(valueCol.cast("long") < 0,
      raise_error(lit("pageHinkleyInt requires non-negative values"))
      ).otherwise(valueCol.cast("long"))
    val keyed = df.groupBy(keys: _*)
      .agg(array_sort(collect_list(struct(orderCol.cast("long").as("o"),
        guarded.as("v")))).as("__arr"))
    val keyNames = keyed.columns.dropRight(1).toSeq
    // acc struct: t (count), s (value sum), m (PH cumulative, micro),
    // mn (running min of m, micro)
    val folded = keyed.withColumn("__st", expr(
      s"""aggregate(__arr,
         |  cast(array() as array<struct<t: bigint, s: bigint,
         |                               m: bigint, mn: bigint>>),
         |  (acc, x) -> array_append(acc,
         |    CASE WHEN size(acc) = 0
         |      THEN named_struct('t', 1L, 's', x.v,
         |        'm', 0L - ${deltaMicro}L,
         |        'mn', least(0L, 0L - ${deltaMicro}L))
         |      ELSE named_struct(
         |        't', element_at(acc, -1).t + 1L,
         |        's', element_at(acc, -1).s + x.v,
         |        'm', element_at(acc, -1).m +
         |          (1000000L * ((element_at(acc, -1).t + 1L) * x.v -
         |                       (element_at(acc, -1).s + x.v)))
         |            div (element_at(acc, -1).t + 1L) - ${deltaMicro}L,
         |        'mn', least(element_at(acc, -1).mn,
         |          element_at(acc, -1).m +
         |          (1000000L * ((element_at(acc, -1).t + 1L) * x.v -
         |                       (element_at(acc, -1).s + x.v)))
         |            div (element_at(acc, -1).t + 1L) - ${deltaMicro}L))
         |      END))""".stripMargin))
    folded.select(keyNames.map(col) :+
        posexplode(arrays_zip(col("__arr"), col("__st"))).as(Seq("__i", "__z")): _*)
      .select(keyNames.map(col) :+ col("__z.__arr.o").as("order") :+
        col("__z.__arr.v").as("value") :+ col("__z.__st.m").as("m_u") :+
        col("__z.__st.mn").as("min_m_u") :+
        (col("__z.__st.m") - col("__z.__st.mn")).as("ph_u") :+
        ((col("__z.__st.m") - col("__z.__st.mn")) >= lambdaMicro)
          .as("alarm"): _*)
  }

  /** A-stat/A8 — ACF profile: the first K autocorrelations of an
    * ordered series as a TABLE (Box & Jenkins — public literature),
    * plus the first two partial autocorrelations in closed form
    * (φ₁₁ = ρ₁, φ₂₂ = (ρ₂ − ρ₁²)/(1 − ρ₁²), the Durbin–Levinson
    * seeds). [[graft.ops.Aggregates.ljungBox]] answers "is ANY lag
    * nonzero"; this profile answers WHICH — the AR/MA order-picking
    * view a forecaster reads before choosing q173's Holt or an AR
    * model.
    *
    * Exactness: the [[graft.ops.Aggregates.ljungBox]] device — values
    * cleared of the mean fraction as c_i = n·x_i − S (exact decimals),
    * every ρ_k a ratio of exact decimal sums with ONE double division,
    * rounded at 6. Returns one row per lag: (lag, n_pairs, acf, pacf)
    * with pacf null beyond lag 2.
    *
    * Scale: series-grain — the K lag joins offset a dense row_number
    * over the rollup, never the fact table. */
  def acfProfile(series: DataFrame, orderCol: Column, valueCol: Column,
      kLags: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(kLags >= 2, "kLags >= 2 (pacf needs two lags)")
    val d38 = "decimal(38,0)"
    val s = series.select(orderCol.as("__t"), valueCol.cast("long").as("__v"))
      .withColumn("__i",
        row_number().over(Window.orderBy(col("__t"))).cast("long"))
    val tot = s.agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    val c = s.crossJoin(broadcast(tot))
      .select(col("__i"),
        (col("__n").cast(d38) * col("__v").cast(d38) -
          col("__s").cast(d38)).cast(d38).as("__c"))
      .localCheckpoint() // rollup-sized; base + K lag joins read it
    val den = c.agg(sum(col("__c") * col("__c")).cast(d38).as("__d"))
    val lagged = c.select(col("__i").as("__i2"), col("__c").as("__c2"))
    val nums = (1 to kLags).map { lag =>
      c.join(lagged, col("__i2") === col("__i") + lag)
        .agg(coalesce(sum(col("__c") * col("__c2")),
          lit(0).cast(d38)).cast(d38).as("__num"),
          count(lit(1)).as("n_pairs"))
        .select(lit(lag.toLong).as("lag"), col("n_pairs"), col("__num"))
    }.reduce(_ unionAll _)
    val rho = nums.crossJoin(broadcast(den))
      .withColumn("__rho",
        col("__num").cast("double") / col("__d").cast("double"))
      .localCheckpoint() // K rows; output + the two pacf reads
    val r1 = rho.filter(col("lag") === 1)
      .select(col("__rho").as("__r1"))
    val r2 = rho.filter(col("lag") === 2)
      .select(col("__rho").as("__r2"))
    rho.crossJoin(broadcast(r1)).crossJoin(broadcast(r2))
      .select(col("lag"), col("n_pairs"), round(col("__rho"), 6).as("acf"),
        when(col("lag") === 1, round(col("__r1"), 6))
          .when(col("lag") === 2, round(
            (col("__r2") - col("__r1") * col("__r1")) /
              (lit(1.0) - col("__r1") * col("__r1")), 6))
          .as("pacf"))
  }

  /** A5/A8 — AR(2) YULE-WALKER FIT + one-step forecast per key
    * (Yule 1927 / Walker 1931; Box & Jenkins 1970 ch. 3 — public
    * literature): solve the order-2 Yule-Walker system from the
    * lag-1/lag-2 autocorrelations,
    *   φ₁ = r₁(1−r₂)/(1−r₁²),  φ₂ = (r₂−r₁²)/(1−r₁²),
    * innovation share = 1 − φ₁r₁ − φ₂r₂, and forecast
    * x̂_{n+1} = μ + φ₁(x_n−μ) + φ₂(x_{n−1}−μ). Where q291's acfProfile
    * reads the correlogram, this fits the MODEL — the two-knob
    * autoregressor behind capacity forecasts and anomaly baselines.
    *
    * Exactness: the mean is cleared as c_i = n·x_i − S (exact
    * DECIMAL(38,0)), so r₁/r₂ are single IEEE divisions of exact
    * integers and every later op is pinned ×/−/÷ in fixed order —
    * both engines replay it bit-for-bit (q186 discipline). n < 3 or a
    * constant series yields nulls, not NaNs. Returns per key:
    * (keys…, n, r1, r2, phi1, phi2, innov_share, forecast).
    *
    * Scale: one key-grain moment agg joined back (both sides hash on
    * the keys), one keyed window for the two lags — no single-partition
    * window, no cross join; rollup-sized output. */
  def ar2YuleWalker(series: DataFrame, keys: Seq[Column], orderCol: Column,
      valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val base = series.select(keys ++ Seq(orderCol.as("__t"),
      valueCol.cast("long").as("__v")): _*)
    val kNames = base.columns.dropRight(2).toSeq
    val tot = base.groupBy(kNames.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    val w = Window.partitionBy(kNames.map(col): _*).orderBy(col("__t"))
    val wDesc = Window.partitionBy(kNames.map(col): _*)
      .orderBy(col("__t").desc)
    val c = base.join(tot, kNames)
      .withColumn("__c", (col("__n").cast(d38) * col("__v").cast(d38) -
        col("__s").cast(d38)).cast(d38))
      .withColumn("__c1", lag(col("__c"), 1).over(w))
      .withColumn("__c2", lag(col("__c"), 2).over(w))
      .withColumn("__rd", row_number().over(wDesc))
    val m = c.groupBy(kNames.map(col): _*)
      .agg(max(col("__n")).cast("long").as("n"),
        max(col("__s")).cast(d38).as("__sum"),
        sum(col("__c") * col("__c")).cast(d38).as("__den"),
        coalesce(sum(col("__c") * col("__c1")), lit(0).cast(d38))
          .cast(d38).as("__num1"),
        coalesce(sum(col("__c") * col("__c2")), lit(0).cast(d38))
          .cast(d38).as("__num2"),
        max(when(col("__rd") === 1, col("__v"))).as("__vn"),
        max(when(col("__rd") === 2, col("__v"))).as("__vn1"))
    val r1 = col("__num1").cast("double") / col("__den").cast("double")
    val r2 = col("__num2").cast("double") / col("__den").cast("double")
    // |r1| = 1 (perfectly linear/alternating series) degenerates the
    // YW system; both engines compute the same IEEE r1, so the same gate
    val ok = col("n") >= 3 && col("__den") =!= lit(0).cast(d38) &&
      abs(r1) < lit(1.0)
    m.withColumn("r1", when(ok, r1))
      .withColumn("r2", when(ok, r2))
      .withColumn("phi1", when(ok,
        col("r1") * (lit(1.0) - col("r2")) /
          (lit(1.0) - col("r1") * col("r1"))))
      .withColumn("phi2", when(ok,
        (col("r2") - col("r1") * col("r1")) /
          (lit(1.0) - col("r1") * col("r1"))))
      .withColumn("innov_share", when(ok,
        lit(1.0) - col("phi1") * col("r1") - col("phi2") * col("r2")))
      .withColumn("__mu",
        col("__sum").cast("double") / col("n").cast("double"))
      .withColumn("forecast", when(ok,
        col("__mu") +
          col("phi1") * (col("__vn").cast("double") - col("__mu")) +
          col("phi2") * (col("__vn1").cast("double") - col("__mu"))))
      .select(kNames.map(col) ++ Seq(col("n"), col("r1"), col("r2"),
        col("phi1"), col("phi2"), col("innov_share"), col("forecast")): _*)
  }

  /** A5/A8 — seasonality STRENGTH per key (the STL-style readout,
    * Cleveland et al. 1990; Wang, Smith & Hyndman 2006 for the
    * strength form — public literature):
    *   strength = max(0, 1 − Var(residual) / Var(value))
    * with the seasonal component the per-(key, season) truncating
    * integer mean ([[seasonalDecompose]]'s convention). ≈0 means the
    * weekday/hour cycle explains nothing (don't deseasonalize); →1
    * means the cycle dominates (alert thresholds MUST be
    * season-adjusted or q115/q126 fire every Monday).
    *
    * Exactness: seasonal means are integral divs; residuals are exact
    * longs; both variances come from exact decimal moment sums with
    * pinned double finishes. Returns per key:
    * (keys…, n, n_seasons, var_total, var_resid, strength).
    *
    * Scale: one (key, season) mean agg (map-side combine), a
    * broadcast-back, then one key-grain moment agg. */
  def seasonalityStrength(df: DataFrame, keys: Seq[Column],
      seasonCol: Column, valueCol: Column): DataFrame = {
    require(keys.nonEmpty, "seasonalityStrength requires key column(s)")
    val d38 = "decimal(38,0)"
    val v = valueCol.cast("long")
    val base = df.select((keys :+ seasonCol.as("__season") :+ v.as("__v")): _*)
    val keyNames = base.columns.dropRight(2).toSeq
    val sm = base.groupBy((keyNames.map(col) :+ col("__season")): _*)
      .agg(sum(col("__v")).as("__ss"), count(lit(1)).as("__sc"))
      .withColumn("__smean", expr("__ss div __sc"))
      .select((keyNames.map(col) :+ col("__season") :+ col("__smean")): _*)
    val joined = base.join(sm, keyNames :+ "__season")
      .withColumn("__r", col("__v") - col("__smean"))
    val g = joined.groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).cast(d38).as("__n"),
        count_distinct(col("__season")).as("n_seasons"),
        sum(col("__v")).cast(d38).as("__sv"),
        sum(col("__v").cast(d38) * col("__v").cast(d38)).cast(d38).as("__qv"),
        sum(col("__r")).cast(d38).as("__sr"),
        sum(col("__r").cast(d38) * col("__r").cast(d38)).cast(d38).as("__qr"))
    def variance(sc: Column, qc: Column) =
      (col("__n") * qc - sc * sc).cast("double") /
        (col("__n") * (col("__n") - 1)).cast("double")
    val vt = variance(col("__sv"), col("__qv"))
    val vr = variance(col("__sr"), col("__qr"))
    g.filter(col("__n") > 1)
      .select(keyNames.map(col) :+ col("__n").cast("long").as("n") :+
        col("n_seasons") :+ round(vt, 6).as("var_total") :+
        round(vr, 6).as("var_resid") :+
        when(vt > 0, greatest(lit(0.0), round(lit(1.0) - vr / vt, 6)))
          .as("strength"): _*)
  }

  graft.plans.Guardrails.expect("single_partition_window",
    "__r, __t, __y",
    "lttbDownsample: rank walk over the bounded series rollup",
    "calendar")

  /** A8/E6 — Largest-Triangle-Three-Buckets downsampling (Steinarsson,
    * "Downsampling Time Series for Visual Representation", 2013 — the
    * standard dashboard decimation): keep the first and last points;
    * split the interior into `nBuckets` rank-even buckets; walking
    * left to right, keep from each bucket the point forming the
    * LARGEST triangle with the previously kept point and the NEXT
    * bucket's average. Areas are one double chain over exact integer
    * (t, y) and exact next-bucket sums, argmax ties break on the
    * earlier t — fully engine-replayable bucket by bucket. Callers
    * pass a SERIES frame (already rolled up). Returns
    * (sel_order 1..nBuckets+2, t, y).
    *
    * Scale: one rank window over the rollup-sized series (bounded,
    * documented) + a bucket rollup + nBuckets TakeOrdered(1) argmax
    * passes over the SAME checkpointed frame — the fact-table cost is
    * whatever built the series; nBuckets is the only sequential axis. */
  def lttbDownsample(series: DataFrame, orderCol: Column, valueCol: Column,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "nBuckets >= 1")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__t"))
    val ranked = series
      .select(orderCol.cast("long").as("__t"), valueCol.cast("long").as("__y"))
      .withColumn("__r", row_number().over(w))
      .localCheckpoint()
    val n = ranked.count()
    require(n >= nBuckets + 2, s"need >= ${nBuckets + 2} points, got $n")
    val first = ranked.filter(col("__r") === 1)
      .select(col("__t"), col("__y")).head()
    val last = ranked.filter(col("__r") === n)
      .select(col("__t"), col("__y")).head()
    // interior ranks 2..n-1 -> bucket 0..nBuckets-1 (rank-even)
    val interior = ranked.filter(col("__r") > 1 && col("__r") < n)
      .withColumn("__b", expr(s"((__r - 2) * $nBuckets) div ${n - 2}"))
      .localCheckpoint()
    val avgs = interior.groupBy(col("__b"))
      .agg(count(lit(1)).as("__c"), sum(col("__t")).as("__st"),
        sum(col("__y")).as("__sy"))
      .collect().map(r => r.getLong(0).toInt ->
        (r.getLong(2).toDouble / r.getLong(1),
          r.getLong(3).toDouble / r.getLong(1))).toMap
    // fold: prev anchor starts at the FIRST point; each bucket's pick
    // maximizes the triangle with prev and the next bucket's average
    // (the last bucket anchors on the LAST point) — bucket count is
    // bounded so the per-bucket argmax jobs are the whole cost
    var prev = (first.getLong(0).toDouble, first.getLong(1).toDouble)
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for (b <- 0 until nBuckets) {
      val (ax, ay) =
        if (b == nBuckets - 1) (last.getLong(0).toDouble, last.getLong(1).toDouble)
        else avgs(b + 1)
      val (px, py) = prev
      val picked = interior.filter(col("__b") === b)
        .withColumn("__area", abs(
          (lit(px) - lit(ax)) * (col("__y").cast("double") - lit(py)) -
            (lit(px) - col("__t").cast("double")) * (lit(ay) - lit(py))))
        .orderBy(col("__area").desc, col("__t"))
        .limit(1).select(col("__t"), col("__y")).head()
      picks += ((picked.getLong(0), picked.getLong(1)))
      prev = (picked.getLong(0).toDouble, picked.getLong(1).toDouble)
    }
    val spark = series.sparkSession
    import spark.implicits._
    val rows = ((first.getLong(0), first.getLong(1)) +: picks.toSeq :+
      (last.getLong(0), last.getLong(1)))
      .zipWithIndex.map { case ((t, y), ix) => (ix + 1L, t, y) }
    rows.toDF("sel_order", "t", "y")
  }

  graft.plans.Guardrails.expect("single_partition_window",
    "__hr, __ht, __hy",
    "hurstRS: rank walk over the bounded series rollup",
    "calendar")

  graft.plans.Guardrails.expect("single_partition_window",
    "__s, __k, __seg",
    "saxSymbolize: breakpoint rank selection over the segment rollup",
    "k-literal")

  graft.plans.Guardrails.expect("single_partition_window",
    "__o, __h, __lo", "volatilityMetrics: close-to-close lag over the bar rollup",
    "calendar")

  /** A5/A8 — range-based realized-volatility panel over OHLC bars
    * (Parkinson 1980; Garman & Klass 1980) plus the Amihud (2002)
    * illiquidity ratio — the risk/liquidity readout a price/metric
    * stream owes its dashboard:
    *   σ²_P  = Σ ln²(H/L) / (4·ln2·n)
    *   σ²_GK = Σ [½·ln²(H/L) − (2ln2−1)·ln²(C/O)] / n
    *   ILLIQ = avg( |ln(C_t/C_{t−1})| / volume_t )
    * Range estimators use intra-bar extremes, so they are ~5-7× more
    * efficient than close-to-close variance at the same bar count.
    * Each log is micro-quantized once per bar; squares and the GK
    * combination are exact integers (constants 500000 and 386294 =
    * ⌊(2ln2−1)·10⁶⌉ on both engines); ILLIQ is an exact integer
    * nano-per-cent average. Returns ONE row: (n_bars, parkinson_vol,
    * gk_vol, amihud_npc).
    *
    * Scale: input is the BAR rollup (calendar-bounded); one lag
    * window over it + one global agg. */
  def volatilityMetrics(bars: DataFrame, binCol: Column, oCol: Column,
      hCol: Column, lCol: Column, cCol: Column,
      volCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    def mnat(num: Column, den: Column) = floor(
      log(num.cast("double") / den.cast("double")) * 1e6 + 0.5).cast("long")
    val staged = bars.select(binCol.as("__b"), oCol.cast("long").as("__o"),
        hCol.cast("long").as("__h"), lCol.cast("long").as("__lo"),
        cCol.cast("long").as("__c"), volCol.cast("long").as("__v"))
      .filter(col("__o") > 0 && col("__h") > 0 && col("__lo") > 0 &&
        col("__c") > 0 && col("__v") > 0)
      .withColumn("__lhl", mnat(col("__h"), col("__lo")))
      .withColumn("__lco", mnat(col("__c"), col("__o")))
      .withColumn("__pc", lag(col("__c"), 1).over(
        Window.orderBy(col("__b"))))
      .withColumn("__lret", when(col("__pc").isNotNull,
        abs(mnat(col("__c"), col("__pc")))))
    staged.agg(count(lit(1)).as("n_bars"),
        sum(col("__lhl").cast(d38) * col("__lhl").cast(d38)).cast(d38)
          .as("__sp"),
        sum(col("__lhl").cast(d38) * col("__lhl").cast(d38) * 500000 -
          col("__lco").cast(d38) * col("__lco").cast(d38) * 386294)
          .cast(d38).as("__sgk"),
        sum(expr("(__lret * 1000L) div __v")).as("__sa"),
        sum(when(col("__lret").isNotNull, 1L).otherwise(0L)).as("__na"))
      .select(col("n_bars"),
        round(sqrt(col("__sp").cast("double") / 1e12 /
          (lit(2.772588722239781) * col("n_bars").cast("double"))), 6)
          .as("parkinson_vol"),
        round(sqrt(greatest(col("__sgk"), lit(0).cast(d38)).cast("double")
          / 1e18 / col("n_bars").cast("double")), 6).as("gk_vol"),
        expr("CASE WHEN __na > 0 THEN __sa div __na END").as("amihud_npc"))
  }

  /** A8 — Theta-method forecast (Assimakopoulos & Nikolopoulos 2000,
    * the M3-winning decomposition; fixed-α variant): split the series
    * into the θ=0 line (the OLS linear trend) and the θ=2 line
    * (2·y − trend, double the curvature), extrapolate the trend
    * exactly and the θ=2 line by SES (α = 1/2, the q156 integer
    * recursion), and forecast their average.
    *
    * Determinism contract: the trend is quantized to the integer
    * MICRO grid with the engine-agreed truncating division (Spark
    * `div` ≡ DuckDB `//` on negatives too — both truncate toward
    * zero), the θ=2 residuals are exact micro longs, the SES fold is
    * integer state, and each horizon forecast is one integer
    * average — bit-identical at any partitioning and against a
    * recursive-CTE replay.
    *
    * Returns one row per horizon step h = 1..horizon:
    * (h, trend_micro, ses_level_micro, forecast_micro, forecast).
    *
    * Scale: callers pass a SERIES ROLLUP (the q156/q389 envelope);
    * everything here folds over ONE collected rollup array — the
    * 100 TB cost is whatever built the rollup. */
  def thetaForecast(series: DataFrame, tCol: Column, vCol: Column,
      horizon: Int): DataFrame = {
    require(horizon >= 1 && horizon <= 10000, "1 <= horizon <= 1e4")
    val d38 = "decimal(38,0)"
    val arr = series
      .agg(array_sort(collect_list(struct(tCol.cast("long").as("o"),
        vCol.cast("long").as("v")))).as("__a"))
      .withColumn("__n", size(col("__a")).cast("long"))
    val sums = arr
      .withColumn("__sy", expr("aggregate(__a, 0L, (acc, x) -> acc + x.v)"))
      .withColumn("__siy", expr(
        """aggregate(__a, named_struct('i', 0L, 's', 0L),
          |  (acc, x) -> named_struct('i', acc.i + 1L,
          |    's', acc.s + (acc.i + 1L) * x.v)).s""".stripMargin))
      .withColumn("__si", expr("__n * (__n + 1L) div 2"))
      .withColumn("__si2", expr("__n * (__n + 1L) * (2L * __n + 1L) div 6"))
      // OLS slope/intercept on the integer micro grid: d38 clears any
      // overflow risk, div truncation matches the oracle exactly
      .withColumn("__bm", expr(
        s"""cast((cast(__n as $d38) * __siy - cast(__si as $d38) * __sy)
           | * 1000000 div
           | (cast(__n as $d38) * __si2 - cast(__si as $d38) * __si)
           | as long)""".stripMargin))
      .withColumn("__am", expr(
        s"""cast((cast(__sy as $d38) * 1000000
           | - cast(__bm as $d38) * __si) div __n as long)""".stripMargin))
      .withColumn("__lvl", expr(
        """aggregate(__a, named_struct('i', 0L, 's', 0L),
          |  (acc, x) -> named_struct('i', acc.i + 1L,
          |    's', CASE WHEN acc.i = 0L
          |      THEN 2000000L * x.v - (__am + __bm)
          |      ELSE ((2000000L * x.v - (__am + __bm * (acc.i + 1L)))
          |        + acc.s) div 2 END)).s""".stripMargin))
    sums.filter(col("__n") >= 2)
      .select(col("__n"), col("__am"), col("__bm"), col("__lvl"),
        explode(expr(s"sequence(1L, ${horizon}L)")).as("h"))
      .withColumn("trend_micro", expr("__am + __bm * (__n + h)"))
      .withColumn("ses_level_micro", col("__lvl"))
      .withColumn("forecast_micro", expr("(trend_micro + __lvl) div 2"))
      .withColumn("forecast", col("forecast_micro").cast("double") / 1e6)
      .select(col("h"), col("trend_micro"), col("ses_level_micro"),
        col("forecast_micro"), col("forecast"))
    // no terminal sort here: callers joining the forecast (the q424
    // backtest) must not inherit a mid-plan global sort — terminal
    // consumers order by h themselves
  }

  /** A8/F1 — SAX symbolization (Lin, Keogh, Lonardi & Chiu 2003,
    * quartile-breakpoint variant): each series is PAA-compressed into
    * fixed-length segments (segment value = Σ v over `segLen`
    * consecutive points — an exact integer; a trailing partial segment
    * is dropped), then every segment is mapped to one of four symbols
    * a..d by comparing its integer sum to the EXACT empirical
    * quartiles of all segment sums (value at rank ⌈k·n/4⌉ — selected
    * by rank, so the breakpoint VALUE is deterministic under ties, and
    * the symbol assignment is a pure integer comparison: no
    * normalization doubles, no Gaussian table, engine-portable).
    * Classic SAX normalizes to N(0,1) breakpoints; the quartile form
    * is the distribution-free variant that keeps every decision in
    * exact arithmetic. Returns one row per series key:
    * (key, sax_word, n_segments).
    *
    * Scale: the per-key rank window is key-partitioned; the ONLY
    * global step is breakpoint rank selection over the SEGMENT rollup
    * (|series|·|points|/segLen rows — rollup-sized, documented above);
    * words build via collect_list of (seg, symbol) structs + sort, so
    * word assembly is one map-side-combinable agg per key. */
  def saxSymbolize(series: DataFrame, keyCol: Column, tCol: Column,
      vCol: Column, segLen: Int): DataFrame = {
    require(segLen >= 1 && segLen <= 100000, "1 <= segLen <= 1e5")
    import org.apache.spark.sql.expressions.Window
    val seg = series
      .select(keyCol.cast("string").as("__k"), tCol.as("__t"),
        vCol.cast("long").as("__v"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__k")).orderBy(col("__t"))))
      .withColumn("__seg", expr(s"(__rn - 1) div $segLen"))
      .groupBy(col("__k"), col("__seg"))
      .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
      .filter(col("__n") === segLen.toLong)
    // exact quartile breakpoints by rank selection on the rollup:
    // value at rank ⌈k·n/4⌉ in (__s, __k, __seg) total order
    val ranked = seg.withColumn("__r", row_number().over(
      Window.orderBy(col("__s"), col("__k"), col("__seg"))))
    val tot = ranked.agg(count(lit(1)).as("__nn"))
    val bks = ranked.crossJoin(broadcast(tot)).agg(
      max(when(col("__r") === expr("(__nn + 3) div 4"), col("__s"))).as("__b1"),
      max(when(col("__r") === expr("(__nn * 2 + 3) div 4"), col("__s"))).as("__b2"),
      max(when(col("__r") === expr("(__nn * 3 + 3) div 4"), col("__s"))).as("__b3"))
    seg.crossJoin(broadcast(bks))
      .withColumn("__c",
        when(col("__s") <= col("__b1"), lit("a"))
          .when(col("__s") <= col("__b2"), lit("b"))
          .when(col("__s") <= col("__b3"), lit("c"))
          .otherwise(lit("d")))
      .groupBy(col("__k").as("key"))
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(__seg, __c))), t -> t.__c)"),
        "").as("sax_word"),
        count(lit(1)).as("n_segments"))
      .orderBy(col("key"))
  }

  /** A8 — simple-exponential-smoothing smoothing-constant fit by
    * one-step-ahead SSE over an alpha lattice (the Hyndman &
    * Athanasopoulos FPP procedure, lattice form): for every
    * α = num/den (num = 1..den−1) run the [[ewmaInt]] integer
    * recursion s_t = (num·x_t + (den−num)·s_{t−1}) div den and score
    * Σ_{t≥2} (x_t − s_{t−1})² — the forecast error of "predict the
    * previous smooth". All state is exact integer, so each α's SSE is
    * bit-identical on any engine/partitioning and the argmin never
    * flips. Returns one row per α: (num, den, alpha, n_scored, sse,
    * best).
    *
    * Scale: input is a SERIES ROLLUP by contract (the q156/q372
    * envelope); the rollup is collected into ONE per-α array fold —
    * |den−1| × |series| work, still rollup-sized. Values must be
    * non-negative (floor vs truncation, as [[ewmaInt]]). */
  def sesGridFit(series: DataFrame, tCol: Column, vCol: Column,
      den: Long = 20L): DataFrame = {
    require(den >= 2 && den <= 1000, "2 <= den <= 1000")
    val guarded = when(vCol.cast("long") < 0,
      raise_error(lit("sesGridFit requires non-negative values")))
      .otherwise(vCol.cast("long"))
    val arr = series
      .agg(array_sort(collect_list(struct(tCol.cast("long").as("o"),
        guarded.as("v")))).as("__arr"))
    val alphas = explode(array((1L until den).map(lit): _*)).as("__num")
    val perAlpha = arr.select(col("__arr"), alphas)
      // fold carries (prev_smooth, sse, n): integer triple
      .withColumn("__fit", expr(
        s"""aggregate(__arr,
           |  named_struct('s', CAST(-1 AS BIGINT), 'sse', 0L, 'n', 0L),
           |  (acc, x) -> CASE WHEN acc.s < 0
           |    THEN named_struct('s', x.v, 'sse', 0L, 'n', 0L)
           |    ELSE named_struct(
           |      's', (__num * x.v + ($den - __num) * acc.s) div ${den}L,
           |      'sse', acc.sse + (x.v - acc.s) * (x.v - acc.s),
           |      'n', acc.n + 1L) END)""".stripMargin))
    val scored = perAlpha.select(col("__num").as("num"),
      lit(den).as("den"),
      (col("__num").cast("double") / den).as("alpha"),
      col("__fit.n").as("n_scored"), col("__fit.sse").as("sse"))
    val bestRow = scored.agg(min(struct(col("sse"), col("num"))).as("__b"))
    scored.crossJoin(broadcast(bestRow))
      .withColumn("best", col("num") === col("__b.num"))
      .drop("__b")
      .orderBy(col("num"))
  }

  /** A8/A-stat — Hurst exponent by rescaled-range (R/S) analysis
    * (Hurst 1951; Mandelbrot & Wallis 1969): for each block size n,
    * split the rank-ordered series into full blocks of n, compute per
    * block R/S = range(cumulative deviations) / population std, and
    * estimate H as the log-log OLS slope of mean R/S against n.
    * H ≈ 0.5 = memoryless, > 0.5 persistent (long-range dependence),
    * < 0.5 anti-persistent — the standard long-memory diagnostic run
    * on traffic/latency/demand series before trusting any i.i.d.
    * model.
    *
    * Exactness: within a block, the scaled cumulative deviation
    * D_k = n·C_k − k·S₁ is integer (C_k running sum, S₁ block sum),
    * so R·n = max D − min D exactly, and
    * R/S = (max D − min D) / sqrt(n·S₂ − S₁²) — one correctly-rounded
    * sqrt + division per block, micro-quantized (floor(x·1e6 + 0.5))
    * before the cross-block mean so the per-n aggregation is exact
    * integer. The final slope runs on micro-quantized logs through
    * exact decimal moments (the q266 OLS envelope). Zero-variance
    * blocks are excluded (R/S undefined).
    *
    * Returns one row per block size: (n, n_blocks, sum_rs_micro,
    * avg_rs, hurst) — hurst repeated per row from the shared fit.
    *
    * Scale: the input is a SERIES ROLLUP by contract (e.g. daily
    * counts) — the one global rank window is calendar-bounded
    * (documented above); block windows are keyed by (n, block), and
    * the explode multiplies the bounded rollup by |blockSizes|, never
    * the fact table. */
  def hurstRS(series: DataFrame, tCol: Column, yCol: Column,
      blockSizes: Seq[Int]): DataFrame = {
    require(blockSizes.nonEmpty && blockSizes.forall(_ >= 2),
      "blockSizes must be >= 2")
    require(blockSizes.distinct.size == blockSizes.size,
      "blockSizes must be distinct")
    val d38 = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__ht"))
    val ranked = series
      .select(tCol.cast("long").as("__ht"), yCol.cast("long").as("__hy"))
      .withColumn("__hr", row_number().over(w))
    val ns = array(blockSizes.map(n => lit(n.toLong)): _*)
    val blocks = ranked
      .select(col("__hr"), col("__hy"), explode(ns).as("__n"))
      .withColumn("__b", expr("(CAST(__hr AS BIGINT) - 1) div __n"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__n"), col("__b")).orderBy(col("__hr"))
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__n"), col("__b"))
    val dev = blocks
      .withColumn("__k", row_number().over(wb).cast("long"))
      .withColumn("__c", sum(col("__hy")).over(wb))
      .withColumn("__s1", sum(col("__hy")).over(wt))
      .withColumn("__d", col("__n") * col("__c") - col("__k") * col("__s1"))
    val perBlock = dev.groupBy(col("__n"), col("__b"))
      .agg(count(lit(1)).as("__cnt"), max(col("__s1")).as("__s1"),
        sum(col("__hy").cast(d38) * col("__hy").cast(d38)).as("__s2"),
        max(col("__d")).as("__dmax"), min(col("__d")).as("__dmin"))
      .withColumn("__var",
        (col("__n").cast(d38) * col("__s2") -
          col("__s1").cast(d38) * col("__s1").cast(d38)).cast("double"))
      // full blocks with positive variance only
      .filter(col("__cnt") === col("__n") && col("__var") > 0.0)
      .withColumn("__rs_u",
        floor((col("__dmax") - col("__dmin")).cast("double") /
          sqrt(col("__var")) * 1e6 + 0.5).cast("long"))
    val perN = perBlock.groupBy(col("__n"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("__rs_u")).as("sum_rs_micro"))
      .withColumn("avg_rs",
        col("sum_rs_micro").cast("double") / 1e6 / col("n_blocks"))
    // log-log OLS over the |blockSizes| per-n points, micro-quantized
    // logs + exact decimal moments (libm ln differs across engines in
    // the low bits — quantization pins both sides to the same grid)
    def s38(c: Column) = sum(c.cast(d38)).cast(d38)
    val pts = perN
      .withColumn("__x", floor(log(col("__n").cast("double")) * 1e6 + 0.5)
        .cast("long"))
      .withColumn("__y", floor(log(col("avg_rs")) * 1e6 + 0.5).cast("long"))
    val fit = pts.agg(count(lit(1)).cast(d38).as("__np"),
        s38(col("__x")).as("__sx"), s38(col("__y")).as("__sy"),
        s38(col("__x").cast(d38) * col("__y").cast(d38)).as("__sxy"),
        s38(col("__x").cast(d38) * col("__x").cast(d38)).as("__sxx"))
      .select(
        when((col("__np") * col("__sxx") - col("__sx") * col("__sx"))
            .cast("double") =!= 0.0,
          (col("__np") * col("__sxy") - col("__sx") * col("__sy"))
            .cast("double") /
          (col("__np") * col("__sxx") - col("__sx") * col("__sx"))
            .cast("double")).as("hurst"))
    perN.crossJoin(broadcast(fit))
      .select(col("__n").as("n"), col("n_blocks"), col("sum_rs_micro"),
        col("avg_rs"), col("hurst"))
      .orderBy(col("n"))
  }

  /** A5/A-stat — GRANGER-STYLE LAG-1 PREDICTIVITY test between two
    * aligned integer series (Granger 1969, Econometrica — public
    * literature): does x's yesterday improve the AR(1) prediction of
    * y's today (and vice versa)? Per direction, the restricted model
    * a_t ~ 1 + a_{t−1} is F-tested against the unrestricted
    * a_t ~ 1 + a_{t−1} + b_{t−1}:
    *   F = (RSS_r − RSS_u) · (n − 3) / RSS_u.
    *
    * Exactness: all 13 raw moment sums over the t ≥ 2 sample are exact
    * DECIMAL(38,0); centered moments clear the intercept via the
    * n·Σab − Σa·Σb form (uniform n-scaling — F is scale-invariant);
    * the finish is pinned-order IEEE ×/−/÷ emitted UNROUNDED (q186
    * discipline: both engines replay the identical double trajectory).
    * Degenerate inputs (constant lag, singular normal matrix, zero
    * unrestricted residual) yield null F, not NaN. Returns two rows:
    * (direction, n, rss_r, rss_u, f_stat).
    *
    * Scale: ONE moment agg over the aligned series; the lag window is
    * single-partition by design — the series is a calendar rollup
    * (days), never the fact table. */
  def grangerLag1(series: DataFrame, orderCol: Column, xCol: Column,
      yCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val spark = series.sparkSession
    val w = Window.orderBy(col("__t"))
    val lagged = series.select(orderCol.as("__t"),
        xCol.cast("long").as("__x"), yCol.cast("long").as("__y"))
      .withColumn("__x1", lag(col("__x"), 1).over(w))
      .withColumn("__y1", lag(col("__y"), 1).over(w))
      .filter(col("__x1").isNotNull && col("__y1").isNotNull)
    def s(c: Column) = sum(c.cast(d38)).cast(d38)
    val m = lagged.agg(
      count(lit(1)).cast(d38).as("np"),
      s(col("__x")).as("sx"), s(col("__y")).as("sy"),
      s(col("__x1")).as("sx1"), s(col("__y1")).as("sy1"),
      s(col("__x").cast(d38) * col("__x")).as("sxx"),
      s(col("__y").cast(d38) * col("__y")).as("syy"),
      s(col("__x1").cast(d38) * col("__x1")).as("sx1x1"),
      s(col("__y1").cast(d38) * col("__y1")).as("sy1y1"),
      s(col("__x").cast(d38) * col("__x1")).as("sxx1"),
      s(col("__x").cast(d38) * col("__y1")).as("sxy1"),
      s(col("__y").cast(d38) * col("__y1")).as("syy1"),
      s(col("__y").cast(d38) * col("__x1")).as("syx1"),
      s(col("__x1").cast(d38) * col("__y1")).as("sx1y1")).head()
    // a series shorter than 2 rows has NO lagged sample: the moment
    // sums come back null — emit the two degenerate-null rows rather
    // than NPE inside the BigDecimal reads
    if (m.isNullAt(1))
      return spark.createDataFrame(Seq(
          ("x->y", 0L, Option.empty[Double], Option.empty[Double],
            Option.empty[Double]),
          ("y->x", 0L, Option.empty[Double], Option.empty[Double],
            Option.empty[Double])))
        .toDF("direction", "n", "rss_r", "rss_u", "f_stat")
    def v(i: Int): BigDecimal = BigDecimal(m.getDecimal(i))
    val np = v(0); val sx = v(1); val sy = v(2); val sx1 = v(3)
    val sy1 = v(4); val sxx = v(5); val syy = v(6); val sx1x1 = v(7)
    val sy1y1 = v(8); val sxx1 = v(9); val sxy1 = v(10); val syy1 = v(11)
    val syx1 = v(12); val sx1y1 = v(13)
    // centered, n-scaled moments: C(a,b) = n·Σab − Σa·Σb (exact)
    def cen(sab: BigDecimal, sa: BigDecimal, sb: BigDecimal): BigDecimal =
      np * sab - sa * sb
    // direction target a, own lag b, OTHER series' lag c
    def direction(label: String,
        saa: BigDecimal, sab: BigDecimal, sac: BigDecimal,
        sbb: BigDecimal, sbc: BigDecimal, scc: BigDecimal)
        : (String, Long, Option[Double], Option[Double], Option[Double]) = {
      val n = np.toLong
      if (n < 4 || sbb == 0) return (label, n, None, None, None)
      val det = sbb * scc - sbc * sbc
      if (det == 0) return (label, n, None, None, None)
      // pinned IEEE finish: every operand below is an exact decimal
      // cast once to double, then fixed-order × − ÷
      val dAA = saa.toDouble; val dAB = sab.toDouble; val dAC = sac.toDouble
      val dBB = sbb.toDouble; val dBC = sbc.toDouble; val dCC = scc.toDouble
      val dD = det.toDouble
      val rssR = dAA - dAB * dAB / dBB
      val b1 = (dAB * dCC - dAC * dBC) / dD
      val b2 = (dAC * dBB - dAB * dBC) / dD
      val rssU = dAA - (b1 * dAB + b2 * dAC)
      if (rssU <= 0.0) return (label, n, Some(rssR), Some(rssU), None)
      val f = (rssR - rssU) * (n - 3).toDouble / rssU
      (label, n, Some(rssR), Some(rssU), Some(f))
    }
    val rows = Seq(
      direction("x->y",
        cen(syy, sy, sy), cen(syy1, sy, sy1), cen(syx1, sy, sx1),
        cen(sy1y1, sy1, sy1), cen(sx1y1, sx1, sy1), cen(sx1x1, sx1, sx1)),
      direction("y->x",
        cen(sxx, sx, sx), cen(sxx1, sx, sx1), cen(sxy1, sx, sy1),
        cen(sx1x1, sx1, sx1), cen(sx1y1, sx1, sy1), cen(sy1y1, sy1, sy1)))
    spark.createDataFrame(rows)
      .toDF("direction", "n", "rss_r", "rss_u", "f_stat")
  }

  /** A-sim — BANDED-DTW SIMILARITY SELF-JOIN over per-key integer
    * profiles (Sakoe-Chiba corridor; see [[graft.ext.DtwBanded]] for
    * the kernel contract): pairs form WITHIN a caller-supplied blocking
    * key — never all-pairs — each pair's elastic-alignment cost
    * evaluates as one native codegen call inside the join stage, and
    * the global top-k lowest-distance pairs return with a full
    * deterministic tie-break (dist, key_a, key_b).
    *
    * Profiles are ARRAY<BIGINT> (quantize upstream — the engine-wide
    * cent/micro discipline) so every distance is an exact long and the
    * ranking is total. Pairs whose lengths differ by more than `band`
    * have no admissible corridor path and drop out (kernel null).
    *
    * Scale: the shuffle key is the BLOCK; fan-out is Σ_b |b|² — the
    * blocking key is the precision/cost dial exactly as in the PPJoin/
    * LSH dedup family. The finish is TakeOrdered (no global sort). */
  def dtwSimilarPairs(profiles: DataFrame, keyCol: String,
      blockCol: String, seqCol: String, band: Int, topK: Int): DataFrame = {
    require(band >= 0, "band >= 0")
    require(topK >= 1 && topK <= 10000, "topK in [1, 10000] (k-literal)")
    val a = profiles.select(col(blockCol).as("__blk"),
      col(keyCol).as("key_a"), col(seqCol).as("__sa"))
    val b = profiles.select(col(blockCol).as("__blk"),
      col(keyCol).as("key_b"), col(seqCol).as("__sb"))
    a.join(b, Seq("__blk"))
      .filter(col("key_a") < col("key_b"))
      .withColumn("dtw",
        graft.ext.DtwBanded.dtwBanded(col("__sa"), col("__sb"), band))
      .filter(col("dtw").isNotNull)
      .select(col("key_a"), col("key_b"), col("dtw"))
      .orderBy(col("dtw"), col("key_a"), col("key_b"))
      .limit(topK)
  }
}
