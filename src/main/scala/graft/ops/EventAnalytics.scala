package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` shape (ts, actor, type):
  * concurrency profiles, conversion funnels, retention cohorts. All
  * integer/timestamp arithmetic — exact on any engine and
  * partitioning.
  */
object EventAnalytics {

  // ---- by-design plan-hazard documentation (Guardrails.expect) ------
  // Each entry registers a deliberately-BOUNDED single-partition window
  // or unconditioned join this object builds, with its boundedness
  // argument, so the optimizer audit (PlanAudit / the Guardrails rule)
  // flags only NEW hazards instead of letting them hide among known
  // ones. Markers are operator-owned columns of the hazard plan node.
  graft.plans.Guardrails.expect("single_partition_window",
    "n_risk, d1", "aalenJohansen: suffix risk-set window over the duration rollup",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "greenwood_pico, surv_ppm",
    "kaplanMeierGreenwood: prefix Greenwood sum over the duration rollup",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "n_risk, t, d", "kaplanMeier/nelsonAalen: distinct-event-time risk table",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "_we0, t, surv_ppm", "rmst: lead over the KM rollup (calendar-bounded)",
    "calendar")
  graft.plans.Guardrails.expect("single_partition_window",
    "cumhaz_ppm", "nelsonAalen: distinct-event-time hazard rollup",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "__a2, __dd, __ex", "coxPh: suffix risk-set sums over the " +
      "distinct-duration rollup (one per Newton round)",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "__a0, __a1", "coxPh: the same rollup suffix window, split plan node",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "__n, __n1, __t", "logRank: distinct-event-time two-group table",
    "rollup")
  graft.plans.Guardrails.expect("cartesian_join",
    "__u, __n0", "retentionDecayFit: 1-row cohort-size broadcast",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__prev, __ptot", "categoryMixDrift: period-rollup lag",
    "calendar")
  graft.plans.Guardrails.expect("single_partition_window",
    "__pe, __pc", "funnelWithSignificance: |stages|-row funnel lag",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "day, net", "concurrencyProfile: |days|-row carry rollup",
    "calendar")



  /** Concurrency profile of half-open intervals `[start, end)`: for
    * every boundary instant, how many intervals are active. The
    * classic sweep line — +1 at each start, −1 at each end, cumulative
    * over time order — but as a TWO-PHASE plan that never needs a
    * global single-partition window:
    *   1. per-day net delta (a bounded rollup: one row per day) is
    *      prefix-summed over a tiny day-keyed window → each day's
    *      carry-in;
    *   2. the full delta set cumulates INSIDE each day (window
    *      partitioned by day, RANGE frame so equal instants tie
    *      deterministically) and adds the carry.
    * Intervals crossing midnight are exact: their −1 lives on the day
    * it falls in, and the carry moves the balance across the seam.
    * Returns one row per distinct boundary instant: (t, concurrency).
    *
    * Scale: phase 1's rollup is |days| rows (broadcastable); phase 2
    * partitions by day — hot days split further by AQE; nothing global.
    */
  def concurrencyProfile(df: DataFrame, startCol: String, endCol: String): DataFrame = {
    val deltas = df.select(explode(array(
        struct(col(startCol).as("t"), lit(1).as("d")),
        struct(col(endCol).as("t"), lit(-1).as("d")))).as("ev"))
      .select(col("ev.t").as("t"), col("ev.d").as("d"), to_date(col("ev.t")).as("day"))
    val dayNet = deltas.groupBy(col("day")).agg(sum(col("d")).as("net"))
    val carry = dayNet
      .withColumn("carry",
        coalesce(sum(col("net")).over(
          Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("day"), col("carry"))
    val inDay = Window.partitionBy(col("day")).orderBy(col("t"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("__cum", sum(col("d")).over(inDay))
      .join(broadcast(carry), Seq("day"))
      .select(col("t"), (col("__cum") + col("carry")).as("concurrency"))
      .distinct()
  }

  /** Strictly-ordered conversion funnel: for each actor, stage i is
    * reached at the FIRST event of `stages(i)` strictly after stage
    * i−1. One conditional-min aggregation per stage (each keyed on the
    * actor — uniform, map-side partials), not a per-event path walk.
    * Returns one row per actor with a nullable reach time per stage
    * (`t_<stage>`); count the non-nulls for the funnel counts. */
  def funnelReachTimes(df: DataFrame, actorCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = df.groupBy(col(actorCol))
      .agg(min(when(col(typeCol) === stages.head, col(tsCol))).as(s"t_${stages.head}"))
    stages.tail.zipWithIndex.foldLeft(first) { case (acc, (stage, i)) =>
      val prev = s"t_${stages(i)}"
      val accCols = acc.columns.map(col).toIndexedSeq
      df.join(acc, Seq(actorCol))
        .groupBy(accCols: _*)
        .agg(min(when(col(typeCol) === stage && col(tsCol) > col(prev), col(tsCol)))
          .as(s"t_$stage"))
    }
  }

  /** Time-BOUNDED funnel: stage i must occur strictly after stage
    * i−1 AND within `withinSeconds` of it — the form product
    * analytics actually ships ("purchased within 30 minutes of the
    * click"), where [[funnelReachTimes]]'s unbounded variant
    * over-counts lazy conversions. Same conditional-min plan shape:
    * one actor-keyed agg per stage, no per-event path walk. */
  def windowedFunnelReachTimes(df: DataFrame, actorCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], withinSeconds: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(withinSeconds > 0, "withinSeconds must be positive")
    val first = df.groupBy(col(actorCol))
      .agg(min(when(col(typeCol) === stages.head, col(tsCol))).as(s"t_${stages.head}"))
    stages.tail.zipWithIndex.foldLeft(first) { case (acc, (stage, i)) =>
      val prev = s"t_${stages(i)}"
      val accCols = acc.columns.map(col).toIndexedSeq
      df.join(acc, Seq(actorCol))
        .groupBy(accCols: _*)
        .agg(min(when(col(typeCol) === stage && col(tsCol) > col(prev) &&
          col(tsCol) <= col(prev) + expr(s"INTERVAL $withinSeconds SECONDS"),
          col(tsCol))).as(s"t_$stage"))
    }
  }

  /** Merge overlapping-or-touching half-open intervals `[s, e)` per
    * key (gaps-and-islands): an interval starts a new island exactly
    * when its start exceeds the running max end of everything before
    * it. One key-partitioned window sort computes the island flags and
    * ids; a (key, island) agg emits each island's span and size. Both
    * decisions depend only on VALUES (ties share start/end), so the
    * output is deterministic under any tie order.
    *
    * Scale: one shuffle keyed on the series key for the window, one
    * map-side-partial agg on (key, island) — a hot key costs one
    * partition sort, the same regime as every window op here. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__new_island",
        when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1).otherwise(0))
      .withColumn("__island",
        sum(col("__new_island")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }

  /** Retention cohorts: actors cohort by their first-seen day; the
    * (cohort_day, k) cell counts distinct actors active exactly k days
    * after their cohort day. Two actor-keyed aggs + one join; output
    * is |days| × (maxDays+1) — bounded, broadcast-friendly. */
  def retentionCohorts(df: DataFrame, actorCol: String, tsCol: String,
      maxDays: Int): DataFrame = {
    val firstSeen = df.groupBy(col(actorCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val active = df.select(col(actorCol), to_date(col(tsCol)).as("d")).distinct()
    active.join(firstSeen, actorCol)
      .withColumn("k", datediff(col("d"), col("cohort_day")))
      .filter(col("k").between(0, maxDays))
      .groupBy(col("cohort_day"), col("k"))
      .agg(count(lit(1)).as("users"))
  }

  /** CUSUM drift detection per series key: flag the positions where
    * the running cumulative deviation from the series mean exceeds
    * `cNum/cDen` standard deviations of the random-walk envelope —
    * |Σ_{i≤k}(vᵢ − μ)| > (cNum/cDen)·σ·√k, the classic change-point
    * excursion test (Page 1954, public literature).
    *
    * Exactness: values quantize to cents (DECIMAL(18,2)·100 → integer),
    * and the test is evaluated SQUARED with every term exact:
    *   (n·P_k − k·S)² · cDen²  >  cNum² · k · (n·Q − S²)
    * where P_k is the running cents sum, S/Q/n the series totals —
    * both sides are integer-valued DECIMAL(38,0) products, so no
    * float accumulation, division or sqrt can move the decision on any
    * engine or partitioning. Returns the flagged positions only:
    * (key, position k, tie id).
    *
    * Envelope bound: dev² needs ~(n·P_k)² digits — within
    * DECIMAL(38,0) up to ~1e8 cent-scale rows per key. Beyond that a
    * product would overflow to NULL and SILENTLY unflag the deepest
    * excursions, so both sides are null-guarded with raise_error —
    * the engine fails as loudly as the oracle's HUGEINT does. The
    * 100 TB path splits hot keys by per-day subtotal carry (the
    * concurrencyProfile two-phase trick) before the envelope matters.
    *
    * Scale: one groupBy(key) for the totals (broadcast back), one
    * key-partitioned window sort for the running sum — the q07/q105
    * cost envelope. */
  def cusumFlags(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, cNum: Long = 2, cDen: Long = 1): DataFrame = {
    require(cNum > 0 && cDen > 0, "threshold cNum/cDen must be positive")
    val d38 = "decimal(38,0)"
    val cents = (col(valueCol).cast("decimal(18,2)") * 100).cast("long")
    val vals = df.select(col(keyCol), col(tsCol), col(tieCol), cents.as("__vc"))
    val totals = vals.groupBy(col(keyCol)).agg(
      count(lit(1)).as("__n"),
      // sum DECIMAL inputs: a long sum would wrap at 9.2e18 total cents
      sum(col("__vc").cast(d38)).cast(d38).as("__s"),
      sum(col("__vc").cast(d38) * col("__vc").cast(d38)).cast(d38).as("__q"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    def guarded(c: Column, name: String): Column =
      when(c.isNull, raise_error(lit(
        s"cusumFlags: DECIMAL(38,0) overflow in $name — split the key " +
          "(per-day carry) before flagging"))).otherwise(c)
    vals
      .withColumn("__pk", sum(col("__vc").cast(d38)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__k", row_number().over(w).cast("long"))
      .join(broadcast(totals), Seq(keyCol))
      .withColumn("__dev",
        col("__n").cast(d38) * col("__pk") - col("__k").cast(d38) * col("__s"))
      .withColumn("__env",
        col("__k").cast(d38) *
          (col("__n").cast(d38) * col("__q") - col("__s") * col("__s")))
      .withColumn("__lhs",
        guarded(col("__dev") * col("__dev") * lit(cDen * cDen).cast(d38), "dev²"))
      .withColumn("__rhs",
        guarded(lit(cNum * cNum).cast(d38) * col("__env"), "envelope"))
      .filter(col("__lhs") > col("__rhs"))
      .select(col(keyCol), col("__k").as("k"), col(tieCol))
  }

  /** Rolling distinct actives: for every time bin `w` whose trailing
    * `windowBins` bins (w − windowBins + 1 .. w] saw at least one
    * actor, the count of distinct actors in that window — SPARSE
    * output: a window with zero activity emits no row (densify from a
    * bin spine if a chart needs explicit zeros). The rolling-DAU/WAU
    * readout — and a window Spark cannot express directly
    * (`count(DISTINCT) OVER RANGE` is unsupported), made exact with a
    * BOUNDED explode: each (actor, bin) first collapses by distinct,
    * then fans out to the ≤ windowBins window-ends it serves.
    *
    * Scale: the explode factor is windowBins — a fixed resolution
    * knob, not data-dependent — and it runs on the deduped
    * (actor, bin) set, already shrunk by the first agg. Both shuffles
    * key uniformly (actor/bin). */
  def rollingActives(df: DataFrame, actorCol: String, tsCol: String,
      windowBins: Int, binMicros: Long): DataFrame = {
    require(binMicros > 0, "binMicros > 0")
    rollingActivesFromBins(
      df.select(col(actorCol),
        expr(s"unix_micros($tsCol) div ${binMicros}L").as("__h")).distinct(),
      actorCol, "__h", windowBins)
  }

  /** [[rollingActives]] over an ALREADY-binned distinct (actor, bin)
    * frame — the shared-scan form: a caller computing several window
    * widths (DAU + MAU, q143) dedups the event table once, caches the
    * |actors|·|bins|-sized result, and fans out per width. */
  def rollingActivesFromBins(bins: DataFrame, actorCol: String,
      binCol: String, windowBins: Int): DataFrame = {
    require(windowBins >= 1, "windowBins >= 1")
    val bounds = bins.agg(max(col(binCol)).as("__mx"))
    bins.withColumn("w",
        explode(sequence(col(binCol), col(binCol) + (windowBins - 1))))
      .crossJoin(broadcast(bounds)).filter(col("w") <= col("__mx"))
      .groupBy(col("w"))
      .agg(count_distinct(col(actorCol)).as("active"))
  }

  /** Cohort value curve (LTV): actors cohort by first-seen day; cell
    * (cohort_day, k) accumulates the cohort's total `valueCol` from
    * conversion events within k days of the cohort day, divided by
    * cohort size → cumulative value per user. Values quantize to
    * cents, the running sum is an exact long cumulated over the
    * bounded (cohort, k) grid, and the per-user division is the one
    * float op (identical operands).
    *
    * Scale: two actor-keyed aggs (first-seen, per-(actor-day) value)
    * + one actor join; the cumulative window runs on the
    * |days|·(maxDays+1) grid, never on events. */
  def cohortValueCurve(df: DataFrame, actorCol: String, tsCol: String,
      valueCol: String, typeCol: String, convType: String,
      maxDays: Int): DataFrame = {
    val firstSeen = df.groupBy(col(actorCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val cohortSize = firstSeen.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_users"))
    val cents = (col(valueCol).cast("decimal(18,2)") * 100).cast("long")
    val purchases = df.filter(col(typeCol) === convType)
      .select(col(actorCol), to_date(col(tsCol)).as("__d"), cents.as("__vc"))
      .join(firstSeen, actorCol)
      .withColumn("k", datediff(col("__d"), col("cohort_day")))
      .filter(col("k").between(0, maxDays))
      .groupBy(col("cohort_day"), col("k"))
      .agg(sum(col("__vc")).as("__cell"))
    // densify ks so the running sum has a row even for quiet days
    val grid = cohortSize.select(col("cohort_day"),
      explode(sequence(lit(0), lit(maxDays))).as("k"))
    val wCum = Window.partitionBy(col("cohort_day")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(purchases, Seq("cohort_day", "k"), "left")
      .withColumn("__cum", sum(coalesce(col("__cell"), lit(0L))).over(wCum))
      .join(cohortSize, "cohort_day")
      .select(col("cohort_day"), col("k").cast("long").as("k"),
        col("cohort_users"),
        (col("__cum").cast("double") / (col("cohort_users") * 100))
          .as("ltv_per_user"))
  }

  /** Gini concentration of actor activity per key: how unequally the
    * key's events distribute over its actors (0 = uniform, →1 = one
    * actor dominates) — the abuse/bot-skew signal. Exact integer form
    * over ascending per-actor counts c₁..c_n:
    *   G = (2·Σ i·cᵢ − (n+1)·Σc) / (n·Σc)
    * Σ i·cᵢ is tie-order-invariant (equal counts commute), so the
    * row_number tie-break never moves the value; the one float op is
    * the final division of identical exact operands. */
  def giniConcentration(df: DataFrame, keyCol: String, actorCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol), col(actorCol))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__c"), col(actorCol))
    counts.withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_actors"),
        sum(col("__c")).as("n_events"),
        sum(col("__i") * col("__c")).as("__s"))
      .withColumn("gini",
        (lit(2) * col("__s") - (col("n_actors") + 1) * col("n_events"))
          .cast("double") / (col("n_actors") * col("n_events")).cast("double"))
      .drop("__s")
  }

  /** Top-k most frequent length-3 event-type paths across actors —
    * the n-gram view of user journeys (one rung above the q102 pair
    * transitions). Consecutive triples come from two leads over the
    * (ts, tie) total order inside each actor; the count ranks with a
    * full lexicographic tie-break, so top-k is deterministic.
    *
    * Scale: one actor-keyed window shuffle; the triple space is
    * |event types|³-bounded, so the agg output is tiny and top-k is a
    * TakeOrdered. */
  def topPaths(df: DataFrame, actorCol: String, tsCol: String, tieCol: String,
      typeCol: String, topK: Int): DataFrame = {
    val w = Window.partitionBy(col(actorCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__t2", lead(col(typeCol), 1).over(w))
      .withColumn("__t3", lead(col(typeCol), 2).over(w))
      .filter(col("__t2").isNotNull && col("__t3").isNotNull)
      .groupBy(col(typeCol).as("s1"), col("__t2").as("s2"), col("__t3").as("s3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
      .limit(topK)
  }

  /** Last-touch attribution: each conversion event (`convType`) is
    * credited to the actor's most recent PRECEDING non-conversion
    * event under the (ts, tie) total order; conversions with no prior
    * touch credit `(none)`. Returns per attributed type: conversions
    * and distinct converting actors.
    *
    * One actor-partitioned window (IGNORE NULLS last over the strict
    * ROWS .. -1 frame) + one tiny agg — the marketing-attribution
    * primitive, as a single pass instead of a per-conversion point
    * lookup. Scale: shuffle keys on the actor id (uniform); output is
    * |event types|-sized. */
  def lastTouchAttribution(df: DataFrame, actorCol: String, tsCol: String,
      tieCol: String, typeCol: String, convType: String): DataFrame = {
    val w = Window.partitionBy(col(actorCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__touch",
        last(when(col(typeCol) =!= convType, col(typeCol)), ignoreNulls = true)
          .over(w))
      .filter(col(typeCol) === convType)
      .groupBy(coalesce(col("__touch"), lit("(none)")).as("attributed_type"))
      .agg(count(lit(1)).as("conversions"),
        count_distinct(col(actorCol)).as("users"))
  }

  /** W-frame/A1 — POSITION-BASED (U-shaped) multi-touch attribution:
    * each conversion's 10 000 basis points split across the touch
    * events since the actor's previous conversion — 40/20/40: first
    * and last touch get 4 000 bps each, the middle touches share the
    * remaining 2 000 via floor division with the leftover going one
    * each to the EARLIEST middles (the largest-remainder rule with
    * equal remainders — deterministic, Σ ≡ 10 000 per conversion
    * always). One touch → 10 000; two → 5 000 each; zero → the
    * conversion credits '(none)'. All-integer credit arithmetic — the
    * exactness [[lastTouchAttribution]] doesn't need but a
    * revenue-split model does. Returns per attributed type:
    * (attributed_type, touches, credit_bps).
    *
    * Scale: segment assignment and positions are two functions over
    * ONE actor-keyed window sort; the credit formula is scan-side
    * integer arithmetic. Same cost envelope as the q07 running frame
    * at any volume. */
  def positionAttribution(df: DataFrame, actorCol: String, tsCol: String,
      tieCol: String, typeCol: String, convType: String): DataFrame = {
    val order = Seq(col(tsCol), col(tieCol))
    val wAll = Window.partitionBy(col(actorCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // seg = conversions strictly before this event: touches of segment
    // k attribute to the actor's (k+1)-th conversion
    val seg = df.withColumn("__seg",
      coalesce(sum(when(col(typeCol) === convType, 1L).otherwise(0L))
        .over(wAll), lit(0L)))
    val touches = seg.filter(col(typeCol) =!= convType)
      .select(col(actorCol), col("__seg"), col(tsCol), col(tieCol),
        col(typeCol).as("__touch"))
    val convs = seg.filter(col(typeCol) === convType)
      .select(col(actorCol).as("__conv_actor"), col("__seg").as("__conv_seg"))
    // keep only touch segments whose conversion actually happened
    val attributed = touches.join(convs,
      col(actorCol) === col("__conv_actor") &&
        col("__seg") === col("__conv_seg"), "left_semi")
    val wSeg = Window.partitionBy(col(actorCol), col("__seg"))
      .orderBy(order: _*)
    val wSegAll = Window.partitionBy(col(actorCol), col("__seg"))
    val credit = attributed
      .withColumn("__p", row_number().over(wSeg))
      .withColumn("__n", count(lit(1)).over(wSegAll))
      .withColumn("credit_bps",
        when(col("__n") === 1, 10000L)
          .when(col("__n") === 2, 5000L)
          .when(col("__p") === 1 || col("__p") === col("__n"), 4000L)
          .otherwise(expr("2000L div (__n - 2)") +
            when(col("__p") - 1 <= expr("2000L % (__n - 2)"), 1L)
              .otherwise(0L)))
    // conversions with an empty segment credit '(none)' in full;
    // for '(none)' the `touches` output column counts conversions
    val orphan = convs.join(
        touches.select(col(actorCol).as("__conv_actor"),
          col("__seg").as("__conv_seg")),
        Seq("__conv_actor", "__conv_seg"), "left_anti")
      .select(lit("(none)").as("__touch"), lit(10000L).as("credit_bps"))
    credit.select(col("__touch"), col("credit_bps"))
      .unionByName(orphan)
      .groupBy(col("__touch").as("attributed_type"))
      .agg(count(lit(1)).as("touches"), sum(col("credit_bps")).as("credit_bps"))
  }

  /** A-stat/A8 — Kaplan–Meier survival curve over per-subject
    * (duration, event) rows: at each distinct duration t,
    *   S(t) = Π_{t'≤t} (n_{t'} − d_{t'}) / n_{t'}
    * with n = subjects still at risk (duration ≥ t) and d = events at
    * exactly t; censored subjects leave the risk set without an event
    * — the estimator churn/retention analysis needs when observation
    * windows cut subjects off mid-life (treating censored users as
    * churned biases survival DOWN). State is integer ppm:
    *   S_k = (S_{k−1} · (n_k − d_k)) div n_k,  S_0 = 10⁶
    * so the curve is bit-identical on any engine unrolling the same
    * recurrence (floor division, non-negative operands; S·n stays
    * < 10⁶·|subjects| — inside long range up to 10¹² subjects).
    * Returns one row per distinct duration:
    * (t, n_risk, d_events, surv_ppm), ordered by t.
    *
    * Scale: the curve folds over the DISTINCT-DURATION rollup
    * (calendar-bounded), never the subject table — one duration-keyed
    * agg + one rollup-sized suffix window + one rollup-sized fold.
    * `eventCol` must be 0/1. */
  def kaplanMeier(subjects: DataFrame, durationCol: Column,
      eventCol: Column): DataFrame = {
    val rollup = subjects.groupBy(durationCol.as("t"))
      .agg(sum(eventCol.cast("long")).as("d"), count(lit(1)).as("__all"))
    // risk set at t = subjects with duration >= t: suffix sum over the
    // rollup (rollup-sized window — the q125/q152 altitude)
    val suffix = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withN = rollup.withColumn("n_risk", sum(col("__all")).over(suffix))
    val folded = withN
      .agg(array_sort(collect_list(struct(col("t"), col("n_risk"), col("d"))))
        .as("__a"))
      .withColumn("__s", expr(
        """aggregate(__a, cast(array() as array<bigint>),
          |  (acc, x) -> array_append(acc,
          |    ((CASE WHEN size(acc) = 0 THEN 1000000L
          |           ELSE element_at(acc, -1) END)
          |     * (x.n_risk - x.d)) div x.n_risk))""".stripMargin))
    folded
      .select(posexplode(arrays_zip(col("__a"), col("__s")))
        .as(Seq("__i", "__z")))
      .select(col("__z.__a.t").as("t"), col("__z.__a.n_risk").as("n_risk"),
        col("__z.__a.d").as("d_events"), col("__z.__s").as("surv_ppm"))
  }

  graft.plans.Guardrails.expect("single_partition_window",
    "hour, n, errors", "burnRateAlerts: trailing-window sum over the hour rollup",
    "calendar")

  /** ops/queueing — Erlang-C staffing table per hour-of-day (Erlang
    * 1917; the M/M/c wait-probability formula every call-center /
    * ticket-queue / inference-fleet sizing exercise runs): for each
    * hour slot, traffic intensity a = arrivals/(μ·days), and the
    * minimum agent count c > a whose delay probability
    *   E_C(c, a) = (a^c/c!) / (a^c/c! + (1 − a/c)·Σ_{k<c} a^k/k!)
    * falls below `targetWaitPpm`. The Erlang terms are evaluated by
    * ONE sequential fold (term ← term·a/k) — the identical
    * floating-point operation sequence on both engines, so the chosen
    * c can never differ. Returns one row per slot:
    * (hour_of_day, arrivals, n_days, intensity, agents, wait_prob)
    * — agents = 0 when no c ≤ maxAgents suffices.
    *
    * Scale: ONE hour-of-day rollup off the event stream; the fold
    * runs over a ≤maxAgents literal lattice per slot — 24 rows of
    * work regardless of event volume. */
  def erlangStaffing(events: DataFrame, tsCol: Column, jobsPerAgentHour: Long,
      maxAgents: Int, targetWaitPpm: Long): DataFrame = {
    require(jobsPerAgentHour >= 1, "jobsPerAgentHour >= 1")
    require(maxAgents >= 1 && maxAgents <= 200, "1 <= maxAgents <= 200")
    require(targetWaitPpm >= 1 && targetWaitPpm < 1000000, "target in (0,1)")
    val target = targetWaitPpm.toDouble / 1e6
    val slot = events.select(
        expr(s"(unix_micros(${tsCol.toString}) div 3600000000) % 24")
          .as("hour_of_day"),
        expr(s"unix_micros(${tsCol.toString}) div 86400000000").as("__d"))
    val days = slot.agg(countDistinct(col("__d")).as("n_days"))
    val agg = slot.groupBy(col("hour_of_day"))
      .agg(count(lit(1)).as("arrivals"))
      .crossJoin(broadcast(days))
      .withColumn("__a",
        col("arrivals").cast("double") /
          (lit(jobsPerAgentHour.toDouble) * col("n_days").cast("double")))
    agg.withColumn("__fit", expr(
        s"""aggregate(sequence(1, $maxAgents),
           |  named_struct('term', cast(1.0 as double),
           |    'cum', cast(0.0 as double), 'bc', 0L,
           |    'bp', cast(-1.0 as double)),
           |  (acc, k) -> named_struct(
           |    'term', acc.term * __a / cast(k as double),
           |    'cum', acc.cum + acc.term,
           |    'bc', CASE WHEN acc.bc = 0L AND cast(k as double) > __a
           |        AND (acc.term * __a / cast(k as double)) /
           |            ((acc.term * __a / cast(k as double)) +
           |             (1.0 - __a / cast(k as double)) *
           |             (acc.cum + acc.term)) <= $target
           |      THEN cast(k as bigint) ELSE acc.bc END,
           |    'bp', CASE WHEN acc.bc = 0L AND cast(k as double) > __a
           |        AND (acc.term * __a / cast(k as double)) /
           |            ((acc.term * __a / cast(k as double)) +
           |             (1.0 - __a / cast(k as double)) *
           |             (acc.cum + acc.term)) <= $target
           |      THEN (acc.term * __a / cast(k as double)) /
           |           ((acc.term * __a / cast(k as double)) +
           |            (1.0 - __a / cast(k as double)) *
           |            (acc.cum + acc.term))
           |      ELSE acc.bp END))""".stripMargin))
      .select(col("hour_of_day"), col("arrivals"), col("n_days"),
        round(col("__a"), 6).as("intensity"),
        col("__fit.bc").as("agents"),
        when(col("__fit.bc") > 0, round(col("__fit.bp"), 6))
          .as("wait_prob"))
      .orderBy(col("hour_of_day"))
  }

  /** ops/SRE — multi-window, multi-burn-rate SLO alerting (the Google
    * SRE Workbook ch. 5 policy): an alert fires only when BOTH a fast
    * window (catches sudden breakage) and a slow window (proves it is
    * sustained) burn error budget faster than their thresholds —
    *   burn(w) = error_rate(w) / slo_budget
    * — the page-worthiness calculation behind every mature SLO
    * rollout; single-window alerting either pages on blips or sleeps
    * through slow burns. All integer ppm arithmetic. Returns one row
    * per fast-window period: (hour, n, errors, rate_ppm, burn_fast_ppm,
    * rate_slow_ppm, burn_slow_ppm, alert).
    *
    * Scale: ONE hour-grain rollup off the event stream (map-side
    * combine); the trailing slow window is a range frame over that
    * calendar-bounded rollup. */
  def burnRateAlerts(events: DataFrame, tsCol: Column, errCond: Column,
      slowHours: Int, sloBudgetPpm: Long, fastFactorPpm: Long,
      slowFactorPpm: Long): DataFrame = {
    require(slowHours >= 2 && slowHours <= 168, "2 <= slowHours <= 168")
    require(sloBudgetPpm >= 1 && sloBudgetPpm < 1000000, "budget in (0,1)")
    val hourly = events.select(
        expr(s"unix_micros(${tsCol.toString}) div 3600000000").as("hour"),
        errCond.cast("long").as("__e"))
      .groupBy(col("hour"))
      .agg(count(lit(1)).as("n"), sum(col("__e")).as("errors"))
    val slow = Window.orderBy(col("hour"))
      .rangeBetween(-(slowHours - 1).toLong, 0L)
    hourly
      .withColumn("__ns", sum(col("n")).over(slow))
      .withColumn("__es", sum(col("errors")).over(slow))
      .withColumn("rate_ppm", expr("(errors * 1000000L) div n"))
      .withColumn("rate_slow_ppm", expr("(__es * 1000000L) div __ns"))
      .withColumn("burn_fast_ppm",
        expr(s"(rate_ppm * 1000000L) div ${sloBudgetPpm}L"))
      .withColumn("burn_slow_ppm",
        expr(s"(rate_slow_ppm * 1000000L) div ${sloBudgetPpm}L"))
      .withColumn("alert",
        col("burn_fast_ppm") >= fastFactorPpm &&
          col("burn_slow_ppm") >= slowFactorPpm)
      .select(col("hour"), col("n"), col("errors"), col("rate_ppm"),
        col("burn_fast_ppm"), col("rate_slow_ppm"), col("burn_slow_ppm"),
        col("alert"))
      .orderBy(col("hour"))
  }

  /** A-stat/A8 — Kaplan–Meier with GREENWOOD confidence bands
    * (Greenwood 1926; the standard error every published survival
    * curve is drawn with):
    *   Var(S(t)) = S(t)² · Σ_{t'≤t} d/(n(n−d)),
    * se in ppm, plain ±1.96·se bands clamped to [0, 10⁶]. The
    * Greenwood sum accumulates in exact pico units
    * (term = d·10¹² div (n·(n−d))); the lone sqrt is one
    * correctly-rounded op per step. Returns per distinct duration:
    * (t, n_risk, d_events, surv_ppm, greenwood_pico, se_ppm, lo_ppm,
    * hi_ppm).
    *
    * Scale: the [[kaplanMeier]] envelope — duration rollup + one more
    * rollup-sized prefix sum. */
  def kaplanMeierGreenwood(subjects: DataFrame, durationCol: Column,
      eventCol: Column): DataFrame = {
    val km = kaplanMeier(subjects, durationCol, eventCol)
      .withColumn("__term", expr(
        """CASE WHEN n_risk - d_events > 0
          |  THEN cast((cast(d_events as decimal(38,0)) * 1000000000000)
          |       div (cast(n_risk as decimal(38,0))
          |            * (n_risk - d_events)) as long)
          |  ELSE 0L END""".stripMargin))
    val prefix = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    km.withColumn("greenwood_pico", sum(col("__term")).over(prefix))
      .withColumn("se_ppm", floor(
        col("surv_ppm").cast("double") *
          sqrt(col("greenwood_pico").cast("double") / 1e12) + 0.5)
        .cast("long"))
      .select(col("t"), col("n_risk"), col("d_events"), col("surv_ppm"),
        col("greenwood_pico"), col("se_ppm"),
        greatest(lit(0L),
          col("surv_ppm") - expr("(196 * se_ppm) div 100")).as("lo_ppm"),
        least(lit(1000000L),
          col("surv_ppm") + expr("(196 * se_ppm) div 100")).as("hi_ppm"))
  }

  /** A-stat/A8 — Aalen–Johansen cumulative incidence under COMPETING
    * RISKS (Aalen & Johansen 1978; the estimator Kaplan–Meier gets
    * WRONG when a subject can exit for more than one reason — 1−KM
    * per cause overstates every cause's incidence): with two causes
    * and right-censoring,
    *   CIF_k(t) = Σ_{t'≤t} S(t'⁻)·d_k(t')/n(t'),
    *   S(t) = Π_{t'≤t} (n − d₁ − d₂)/n
    * — censored subjects leave the risk set without hazard. The churn
    * attribution question ("did we lose them to cancellation or to
    * completion?") in its correct form.
    *
    * Integer ppm state exactly as [[kaplanMeier]]: per rollup step,
    *   cif_k += (S_prev·d_k) div n,   S = (S_prev·(n−d₁−d₂)) div n
    * — bit-portable, recursion-replayable. Returns one row per
    * distinct duration: (t, n_risk, d1, d2, censored, surv_ppm,
    * cif1_ppm, cif2_ppm).
    *
    * Scale: the [[kaplanMeier]] envelope — duration-keyed agg with
    * map-side combine, suffix window + fold over the calendar-bounded
    * rollup, never the subject table. `cause1Cond`/`cause2Cond` must
    * be disjoint; rows matching neither are censored. */
  def aalenJohansen(subjects: DataFrame, durationCol: Column,
      cause1Cond: Column, cause2Cond: Column): DataFrame = {
    val rollup = subjects.groupBy(durationCol.as("t"))
      .agg(sum(cause1Cond.cast("long")).as("d1"),
        sum(cause2Cond.cast("long")).as("d2"),
        count(lit(1)).as("__all"))
    val suffix = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withN = rollup.withColumn("n_risk", sum(col("__all")).over(suffix))
    val folded = withN
      .agg(array_sort(collect_list(struct(col("t"), col("n_risk"),
        col("d1"), col("d2"), col("__all")))).as("__a"))
      // state per step: (s, c1, c2) in ppm
      .withColumn("__s", expr(
        """aggregate(__a,
          |  cast(array() as array<struct<s: bigint, c1: bigint, c2: bigint>>),
          |  (acc, x) -> array_append(acc, named_struct(
          |    's', ((CASE WHEN size(acc) = 0 THEN 1000000L
          |            ELSE element_at(acc, -1).s END)
          |          * (x.n_risk - x.d1 - x.d2)) div x.n_risk,
          |    'c1', (CASE WHEN size(acc) = 0 THEN 0L
          |            ELSE element_at(acc, -1).c1 END)
          |          + ((CASE WHEN size(acc) = 0 THEN 1000000L
          |              ELSE element_at(acc, -1).s END) * x.d1)
          |            div x.n_risk,
          |    'c2', (CASE WHEN size(acc) = 0 THEN 0L
          |            ELSE element_at(acc, -1).c2 END)
          |          + ((CASE WHEN size(acc) = 0 THEN 1000000L
          |              ELSE element_at(acc, -1).s END) * x.d2)
          |            div x.n_risk)))""".stripMargin))
    folded
      .select(posexplode(arrays_zip(col("__a"), col("__s")))
        .as(Seq("__i", "__z")))
      .select(col("__z.__a.t").as("t"), col("__z.__a.n_risk").as("n_risk"),
        col("__z.__a.d1").as("d1"), col("__z.__a.d2").as("d2"),
        (col("__z.__a.__all") - col("__z.__a.d1") - col("__z.__a.d2"))
          .as("censored"),
        col("__z.__s.s").as("surv_ppm"),
        col("__z.__s.c1").as("cif1_ppm"), col("__z.__s.c2").as("cif2_ppm"))
  }

  /** A-stat/A8 — RESTRICTED MEAN SURVIVAL TIME (Royston & Parmar 2013
    * popularized the readout; the step-integral of the Kaplan–Meier
    * curve to a horizon τ — public literature): "expected time alive
    * within the next τ units" — the one-number summary of
    * [[kaplanMeier]]'s whole curve, and the survival-based LTV
    * horizon every retention team actually budgets with.
    *
    * Determinism contract: the KM curve's surv_ppm values are already
    * exact integers; RMST is the exact step integral
    *   τ₁·10⁶ + Σ surv_ppm(tᵢ)·(min(tᵢ₊₁, τ) − tᵢ)
    * over the duration rollup (first step S=1 before the first event
    * time, clamped at τ) — an integer in ppm·time units, divided once
    * for the readout. Returns one row:
    * (tau, rmst_micro, rmst) with rmst = rmst_micro/10⁶ (one IEEE
    * division).
    *
    * Scale: the lead/sum run over the KM rollup (calendar-bounded). */
  def rmst(subjects: DataFrame, durationCol: Column, eventCol: Column,
      tau: Long): DataFrame = {
    require(tau > 0, "tau > 0")
    val km = kaplanMeier(subjects, durationCol, eventCol)
    val w = Window.orderBy(col("t"))
    val steps = km
      .withColumn("__next",
        least(coalesce(lead(col("t"), 1).over(w), lit(tau)), lit(tau)))
      .filter(col("t") < tau)
    steps.agg(
        least(coalesce(min(col("t")), lit(tau)), lit(tau)).as("__first"),
        coalesce(sum(col("surv_ppm") *
          greatest(col("__next") - col("t"), lit(0L))), lit(0L)).as("__tail"))
      .withColumn("rmst_micro", col("__first") * 1000000L + col("__tail"))
      .select(lit(tau).as("tau"), col("rmst_micro"),
        (col("rmst_micro").cast("double") / 1e6).as("rmst"))
  }

  /** A-stat — next-event prediction accuracy of the first-order Markov
    * model (q102's transition matrix used as a predictor): for each
    * source event type, predict the modal next type (count desc, type
    * asc — deterministic), then score every observed transition
    * against that prediction. The sequence-model readout of the
    * journey view: acc_ppm far above the modal-class base rate means
    * real sequential structure worth a session feature; at the base
    * rate the "model" is noise. Resubstitution scoring (train = eval)
    * — the standard first look. Returns per source type:
    * (src, predicted, n_trans, n_correct, acc_ppm).
    *
    * Scale: one actor-keyed window sort (the q25/q102 envelope) feeds
    * a |types|²-row matrix; prediction and scoring are joins on that
    * broadcast-sized matrix, never on the event stream. */
  def markovAccuracy(df: DataFrame, actorCol: Column, tsCol: Column,
      typeCol: Column, tieCol: Column): DataFrame = {
    val w = Window.partitionBy(actorCol).orderBy(tsCol, tieCol)
    val pairs = df
      .select(actorCol.as("__actor"), typeCol.as("src"),
        lead(typeCol, 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
    val matrix = pairs.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    val pred = matrix
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("n").desc, col("dst").asc)))
      .filter(col("__rn") === 1)
      .select(col("src"), col("dst").as("predicted"))
    matrix.join(broadcast(pred), Seq("src"))
      .groupBy(col("src"), col("predicted"))
      .agg(sum(col("n")).as("n_trans"),
        sum(when(col("dst") === col("predicted"), col("n"))
          .otherwise(0L)).as("n_correct"))
      .withColumn("acc_ppm", expr("1000000 * n_correct div n_trans"))
  }

  /** A-stat — two-group log-rank test over censored durations: does
    * cohort A churn on a different schedule than cohort B? The
    * hypothesis test PAIRED with [[kaplanMeier]]'s curve (Mantel 1966,
    * public literature). At each distinct event time, observed-vs-
    * expected group-A deaths under the null; per-time terms are
    * micro-quantized before summing (order-independent), and
    *   chi2 = (10⁶·O1 − E1_u)² / (10⁶·V_u)
    * divides exact longs. Returns one row:
    * (n_a, n_b, o1, e1_u, v_u, chi2).
    *
    * Scale: at-risk counts come from suffix sums over the
    * DISTINCT-DURATION rollup (the kaplanMeier envelope), never the
    * subject table. */
  def logRank(subjects: DataFrame, durationCol: Column, eventCol: Column,
      groupCol: Column, groupA: String): DataFrame = {
    val base = subjects.select(durationCol.cast("long").as("__t"),
      eventCol.cast("long").as("__e"),
      when(groupCol === groupA, 1L).otherwise(0L).as("__a"))
    val roll = base.groupBy(col("__t")).agg(
      count(lit(1)).as("__c"), sum(col("__a")).as("__ca"),
      sum(col("__e")).as("__d"), sum(col("__e") * col("__a")).as("__da"))
    val suffix = Window.orderBy(col("__t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val terms = roll
      .withColumn("__n", sum(col("__c")).over(suffix))
      .withColumn("__n1", sum(col("__ca")).over(suffix))
      .filter(col("__d") > 0)
      .withColumn("__e1u", round(col("__d").cast("double") *
        col("__n1").cast("double") / col("__n").cast("double") * 1e6, 0)
        .cast("long"))
      .withColumn("__vu", when(col("__n") > 1, round(
        (col("__d").cast("decimal(38,0)") * col("__n1") *
          (col("__n") - col("__n1")) * (col("__n") - col("__d")))
          .cast("double") /
        (col("__n").cast("decimal(38,0)") * col("__n") *
          (col("__n") - 1)).cast("double") * 1e6, 0).cast("long"))
        .otherwise(lit(0L)))
    val counts = base.agg(sum(col("__a")).as("n_a"),
      (count(lit(1)) - sum(col("__a"))).as("n_b"))
    terms.agg(sum(col("__da")).as("o1"), sum(col("__e1u")).as("e1_u"),
        sum(col("__vu")).as("v_u"))
      .crossJoin(broadcast(counts))
      .withColumn("chi2",
        when(col("v_u") > 0,
          (col("o1").cast("double") * 1e6 - col("e1_u").cast("double")) *
            (col("o1").cast("double") * 1e6 - col("e1_u").cast("double")) /
            (lit(1e6) * col("v_u").cast("double"))))
      .select(col("n_a"), col("n_b"), col("o1"), col("e1_u"), col("v_u"),
        col("chi2"))
  }

  /** A1/ML — RFM segmentation (recency / frequency / monetary — the
    * classic behavioral segmentation; public marketing-analytics
    * literature): per actor, days since last activity (vs the corpus
    * max date), activity count and integer-cent spend, each scored
    * 1-5 by ntile over a TOTAL order (metric, actor id — ties can
    * never float between engines), composed into a 3-digit code.
    * Recency ntiles ascending (recent = low days = score 1 … keep the
    * raw convention stated, not inverted). Returns the segment-grain
    * rollup: (rfm_code, n_actors) — 125 rows max.
    *
    * Scale: one actor-grain agg; each quintile score is an exact
    * distributed rank ([[Ranking.globalRowNumber]]: range repartition
    * + per-partition windows + a |partitions|-row offset rollup —
    * NEVER a single-partition window over the unbounded actor rollup)
    * finished by the standard ntile identity — with n rows and rem =
    * n mod 5, the first rem buckets hold ⌈n/5⌉ rows — in pure integer
    * arithmetic, bit-identical to NTILE(5) on any engine; the final
    * rollup is segment-sized. */
  def rfmSegments(df: DataFrame, actorCol: Column, tsCol: Column,
      amountCents: Column): DataFrame = {
    val actors = df.groupBy(actorCol.as("__a")).agg(
      max(to_date(tsCol)).as("__last"),
      count(lit(1)).as("__f"),
      sum(amountCents.cast("long")).as("__m"))
    val maxD = actors.agg(max(col("__last")).as("__maxd"),
      count(lit(1)).as("__n"))
    // ONE materialization feeds all three rank passes (round-8 fusion:
    // the former sequential form range-shuffled the full frame three
    // times, each pass re-deriving the actor rollup)
    val base = actors.crossJoin(broadcast(maxD))
      .withColumn("__rdays",
        datediff(col("__maxd"), col("__last")).cast("long"))
      .localCheckpoint()
    def score(c: Column, out: String): DataFrame =
      graft.ops.Ranking.globalRowNumber(
          base.select(col("__a"), col("__n"), c.as("__k")),
          Seq(col("__k"), col("__a")))
        .withColumn(out, expr(
          """CASE WHEN row_num <= (__n div 5 + 1) * (__n % 5)
            | THEN (row_num - 1) div (__n div 5 + 1) + 1
            | ELSE __n % 5 +
            |   (row_num - (__n div 5 + 1) * (__n % 5) - 1)
            |     div greatest(__n div 5, 1) + 1
            |END""".stripMargin).cast("long"))
        .select(col("__a"), col(out))
    // the three quintile ranks are INDEPENDENT narrow (actor, key)
    // frames; globalRowNumber checkpoints internally at construction,
    // so building them on parallel threads overlaps their range
    // shuffles (same model as Verify's cross-query concurrency; each
    // thread only builds + materializes a plan)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val Seq(rs, fs, ms) = Await.result(
      Future.sequence(Seq(
        Future(score(col("__rdays"), "__rs")),
        Future(score(col("__f"), "__fs")),
        Future(score(col("__m"), "__ms")))), Duration.Inf)
    rs.join(fs, "__a").join(ms, "__a")
      .withColumn("rfm_code",
        col("__rs") * 100 + col("__fs") * 10 + col("__ms"))
      .groupBy(col("rfm_code")).agg(count(lit(1)).as("n_actors"))
  }

  /** A-stat — burstiness of inter-event gaps per actor (Goh &
    * Barabási, EPL 2008 — public literature):
    *   B = (σ − μ) / (σ + μ)
    * over the actor's inter-arrival times — B → −1 periodic, 0
    * Poisson, → 1 bursty. The traffic-shape fingerprint that decides
    * whether an actor is a human, a cron job, or a scraper. σ, μ are
    * IEEE finishes over exact integer micro-gap sums (population sd
    * cleared as √(n·Q − S²)/n). Actors with < `minGaps` gaps drop.
    * Returns (actor, n_gaps, mean_gap_us, b).
    *
    * Scale: gaps come from a lag window keyed by actor (the q25
    * sessionize shuffle); the moment agg is actor-grain. */
  def burstiness(df: DataFrame, actorCol: Column, tsCol: Column,
      minGaps: Long): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = Window.partitionBy(col("__a")).orderBy(col("__ts"))
    val gaps = df.select(actorCol.as("__a"), unix_micros(tsCol).as("__ts"))
      .withColumn("__prev", lag(col("__ts"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("__a"), (col("__ts") - col("__prev")).as("__g"))
    val m = gaps.groupBy(col("__a")).agg(count(lit(1)).as("n_gaps"),
      sum(col("__g")).cast(d38).as("__s"),
      sum(col("__g").cast(d38) * col("__g").cast(d38)).cast(d38).as("__q"))
      .filter(col("n_gaps") >= minGaps)
    val mu = col("__s").cast("double") / col("n_gaps").cast("double")
    val sd = sqrt((col("n_gaps").cast(d38) * col("__q") -
      col("__s") * col("__s")).cast("double")) / col("n_gaps").cast("double")
    m.select(col("__a").as("actor"), col("n_gaps"),
      expr("__s div n_gaps").cast("long").as("mean_gap_us"),
      round((sd - mu) / (sd + mu), 6).as("b"))
  }

  /** A1 — log-linear retention-decay fit: pool retention cohorts to
    * day-k rates, fit ln(rate_k) ~ a + b·k by OLS over micro-quantized
    * log rates (exact integer moments — the q250 device), and report
    * the decay half-life −ln2/b. The one-number retention summary a
    * growth dashboard tracks release over release. Day 0 anchors the
    * rate denominator and is excluded from the fit (its rate is 1 by
    * construction). Returns one row:
    * (n_days, slope, intercept, half_life_days).
    *
    * Scale: cohort pooling is a k-grain rollup of the retention agg;
    * the OLS is a maxDays-row plan. */
  def retentionDecayFit(df: DataFrame, actorCol: String, tsCol: String,
      maxDays: Int): DataFrame = {
    val d38 = "decimal(38,0)"
    val pooled = retentionCohorts(df, actorCol, tsCol, maxDays)
      .groupBy(col("k")).agg(sum(col("users")).as("__u"))
    val base = pooled.filter(col("k") === 0)
      .select(col("__u").as("__n0"))
    val pts = pooled.filter(col("k") >= 1).crossJoin(broadcast(base))
      .withColumn("__y", round(log(col("__u").cast("double") /
        col("__n0").cast("double")) * 1e6, 0).cast("long"))
      .withColumn("__x", col("k").cast("long"))
    def s38(c: Column) = sum(c.cast(d38)).cast(d38)
    pts.agg(count(lit(1)).cast(d38).as("__n"),
        s38(col("__x")).as("__sx"), s38(col("__y")).as("__sy"),
        s38(col("__x").cast(d38) * col("__y").cast(d38)).as("__sxy"),
        s38(col("__x").cast(d38) * col("__x").cast(d38)).as("__sxx"))
      // one-point fits (n·Σx² = (Σx)²) have no slope: null, not a
      // divide-by-zero (ANSI decimal./ raises before the double cast
      // when the whole quotient folds to a decimal division)
      .withColumn("__den",
        (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double"))
      .withColumn("__slope_u", when(col("__den") =!= 0.0,
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
          col("__den")))
      .select(col("__n").cast("long").as("n_days"),
        round(col("__slope_u") / 1e6, 6).as("slope"),
        round((col("__sy").cast("double") -
          col("__slope_u") * col("__sx").cast("double")) /
          col("__n").cast("double") / 1e6, 6).as("intercept"),
        round(-log(lit(2.0)) / (col("__slope_u") / 1e6), 6)
          .as("half_life_days"))
  }

  /** W-frame/A1 — TIME-DECAY multi-touch attribution: each conversion
    * splits its 10000 bps across the touches in its segment with
    * weight halving every `halfLifeSeconds` of age — the recency
    * counterpart to [[positionAttribution]]'s U-shape (same segment
    * machinery, same conservation law).
    *
    * Determinism contract: the decay is the DYADIC staircase
    * w = 1e6 div 2^min(19, Δt div halfLife) — exact integer ppm on any
    * engine, no exp/pow; the 19 cap keeps every weight ≥ 1 so the
    * per-segment total can never be zero. Credit is the largest-
    * remainder split of [[graft.ops.Aggregates.largestRemainder]]:
    * base = (10000·w) div W, the shortfall goes +1 to the most RECENT
    * touches — so Σ credit ≡ 10000 per conversion, exactly.
    * Conversions with no preceding touch credit '(none)' in full.
    * Returns per touch type: (attributed_type, touches, credit_bps).
    * NOTE on the '(none)' row: its `touches` column counts ORPHAN
    * CONVERSIONS (conversions with no touch in their segment), not
    * touch events — every other row's `touches` counts credited touch
    * events. Callers aggregating `touches` over attributed_type should
    * exclude '(none)' (or read it as an untouched-conversion count).
    *
    * Scale: segment ids, conversion stamps and recency ranks are
    * functions over ONE actor-keyed window sort (the q161 envelope);
    * the weight/credit math is scan-side integer arithmetic. */
  def timeDecayAttribution(df: DataFrame, actorCol: String, tsCol: String,
      tieCol: String, typeCol: String, convType: String,
      halfLifeSeconds: Long): DataFrame = {
    require(halfLifeSeconds > 0, "halfLifeSeconds must be positive")
    val order = Seq(col(tsCol), col(tieCol))
    val wAll = Window.partitionBy(col(actorCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val seg = df.withColumn("__seg",
      coalesce(sum(when(col(typeCol) === convType, 1L).otherwise(0L))
        .over(wAll), lit(0L)))
    val touches = seg.filter(col(typeCol) =!= convType)
      .select(col(actorCol), col("__seg"), col(tsCol), col(tieCol),
        col(typeCol).as("__touch"))
    // exactly one conversion per (actor, seg): __seg strictly increases
    // across an actor's conversions under the total (ts, tie) order
    val convs = seg.filter(col(typeCol) === convType)
      .select(col(actorCol), col("__seg"), col(tsCol).as("__conv_ts"))
    val wSeg = Window.partitionBy(col(actorCol), col("__seg"))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val wSegAll = Window.partitionBy(col(actorCol), col("__seg"))
    val credit = touches.join(convs, Seq(actorCol, "__seg"))
      .withColumn("__e", least(lit(19L),
        expr(s"(unix_micros(__conv_ts) - unix_micros(${tsCol})) div " +
          s"${halfLifeSeconds * 1000000L}L")))
      .withColumn("__w", expr("1000000L div shiftleft(1L, cast(__e as int))"))
      .withColumn("__rr", row_number().over(wSeg)) // 1 = most recent
      // NOT "__W": Spark resolves column names case-insensitively, so a
      // name differing only in case would silently REPLACE __w
      .withColumn("__wsum", sum(col("__w")).over(wSegAll))
      .withColumn("__base", expr("(10000L * __w) div __wsum"))
      .withColumn("__shortfall",
        lit(10000L) - sum(col("__base")).over(wSegAll))
      .withColumn("credit_bps",
        col("__base") + when(col("__rr") <= col("__shortfall"), 1L)
          .otherwise(0L))
    val orphan = convs.join(
        touches.select(col(actorCol), col("__seg")),
        Seq(actorCol, "__seg"), "left_anti")
      .select(lit("(none)").as("__touch"), lit(10000L).as("credit_bps"))
    credit.select(col("__touch"), col("credit_bps"))
      .unionByName(orphan)
      .groupBy(col("__touch").as("attributed_type"))
      .agg(count(lit(1)).as("touches"),
        sum(col("credit_bps")).as("credit_bps"))
  }

  /** A-stat/A8 — Nelson–Aalen cumulative-hazard estimator (Nelson
    * 1972, Aalen 1978 — public literature) over the same per-subject
    * (duration, event) rows as [[kaplanMeier]]:
    *   H(t) = Σ_{t'≤t} d_{t'} / n_{t'}
    * — the additive view of the survival data: its slope IS the hazard
    * rate, so plateaus/spikes localize when churn actually happens,
    * which the multiplicative KM curve smooths over.
    *
    * Determinism contract: each term is the ppm integral quotient
    * (1e6·d) div n_risk; the curve is a prefix sum of those integers —
    * no fold recursion needed (sums commute where products don't).
    * Returns one row per distinct duration:
    * (t, n_risk, d_events, cumhaz_ppm).
    *
    * Scale: the [[kaplanMeier]] envelope exactly — a duration-keyed agg
    * with map-side combine, then suffix/prefix windows over the
    * calendar-bounded rollup, never the subject table. */
  /** A-stat/A8 — Weibull probability-plot fit per group (the
    * engineering-standard "Weibull plot" — Abernethy, The New Weibull
    * Handbook; median ranks per Benard 1953): for positive integer
    * durations, regress
    *   y = ln(−ln(1 − F̂(t)))  on  x = ln t
    * where F̂ uses Benard's median-rank approximation on the grouped
    * (distinct-duration) rollup, F̂(t) = (cum(t) − 0.3)/(n + 0.4). On
    * Weibull data the plot is a line with slope = shape k and
    * intercept −k·ln λ, so
    *   k̂ = S_xy/S_xx,   λ̂ = exp(x̄ − ȳ/k̂).
    * Determinism: x/y are micro-nat-quantized longs computed from
    * bit-identical rational inputs (libm once per DISTINCT duration);
    * all regression moments are exact decimal(38,0); the readouts are
    * one pinned IEEE chain each, rounded to 6 (the q253 discipline).
    *
    * Returns per group: (g, n, m_points, shape, scale, r2) — null
    * fit when fewer than 2 distinct durations.
    *
    * Scale: ONE (group, duration) rollup with map-side combine; the
    * cumulative window is group-partitioned and rollup-sized; the
    * regression is a |groups|-row finish. The lifetime/transit-time
    * model behind every reliability and SLA question. */
  def weibullPlotFit(subjects: DataFrame, durationCol: Column,
      groupCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val rollup = subjects
      .select(groupCol.as("g"), durationCol.cast("long").as("__t"))
      .filter(col("__t") > 0)
      .groupBy(col("g"), col("__t")).agg(count(lit(1)).as("__c"))
    val cumW = Window.partitionBy(col("g")).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nW = Window.partitionBy(col("g"))
    val pts = rollup
      .withColumn("__cum", sum(col("__c")).over(cumW))
      .withColumn("__n", sum(col("__c")).over(nW))
      // Benard median rank from exact integers: both engines divide
      // the same two doubles
      .withColumn("__f",
        (col("__cum").cast("double") * 10.0 - 3.0) /
          (col("__n").cast("double") * 10.0 + 4.0))
      .withColumn("__x", round(log(col("__t")) * 1e6, 0).cast("long"))
      .withColumn("__y",
        round(log(-log(lit(1.0) - col("__f"))) * 1e6, 0).cast("long"))
    def s(c: Column) = sum(c.cast(d38)).cast(d38)
    val m = pts.groupBy(col("g")).agg(
      max(col("__n")).as("n"), count(lit(1)).as("m_points"),
      s(col("__x")).as("__sx"), s(col("__y")).as("__sy"),
      s(col("__x").cast(d38) * col("__x").cast(d38)).as("__sxx"),
      s(col("__x").cast(d38) * col("__y").cast(d38)).as("__sxy"),
      s(col("__y").cast(d38) * col("__y").cast(d38)).as("__syy"))
    val sxxN = (col("m_points").cast(d38) * col("__sxx") -
      col("__sx") * col("__sx")).cast("double")
    val sxyN = (col("m_points").cast(d38) * col("__sxy") -
      col("__sx") * col("__sy")).cast("double")
    val syyN = (col("m_points").cast(d38) * col("__syy") -
      col("__sy") * col("__sy")).cast("double")
    val shape = sxyN / sxxN
    val lnLam = (col("__sx").cast("double") /
      col("m_points").cast("double") -
      col("__sy").cast("double") / col("m_points").cast("double") /
        shape) / 1e6
    m.select(col("g"), col("n"), col("m_points"),
        when(col("m_points") >= 2 && sxxN =!= 0.0, round(shape, 6))
          .as("shape"),
        when(col("m_points") >= 2 && sxxN =!= 0.0 && sxyN =!= 0.0,
          round(exp(lnLam), 6)).as("scale"),
        when(col("m_points") >= 2 && sxxN =!= 0.0 && syyN =!= 0.0,
          round(sxyN * sxyN / (sxxN * syyN), 6)).as("r2"))
      .orderBy(col("g"))
  }

  def nelsonAalen(subjects: DataFrame, durationCol: Column,
      eventCol: Column): DataFrame = {
    val rollup = subjects.groupBy(durationCol.as("t"))
      .agg(sum(eventCol.cast("long")).as("d"), count(lit(1)).as("__all"))
    val suffix = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prefix = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rollup
      .withColumn("n_risk", sum(col("__all")).over(suffix))
      .withColumn("__term", expr("(d * 1000000L) div n_risk"))
      .withColumn("cumhaz_ppm", sum(col("__term")).over(prefix))
      .select(col("t"), col("n_risk"), col("d").as("d_events"),
        col("cumhaz_ppm"))
  }

  /** A-stat/ML — COX PROPORTIONAL HAZARDS, one covariate, fixed-round
    * Newton on the Breslow partial likelihood (Cox 1972 JRSS-B;
    * Breslow 1974 ties — public literature; THE regression of survival
    * analysis: churn vs plan, failure vs vendor, time-to-convert vs
    * cohort — with censoring handled where q188's OLS cannot).
    *
    *   U(β) = Σ_events [x_i − S₁(t_i)/S₀(t_i)]
    *   I(β) = Σ_events [S₂/S₀ − (S₁/S₀)²],  S_k(t) = Σ_{t_j ≥ t} x_j^k e^{βx_j}
    *
    * INTEGER-QUANTIZED trajectory (the q460 logistic device): weights
    * e^{βx} floor to ppm from a ±20-clamped exponent, S_k are exact
    * DECIMAL(38,0) suffix sums over the distinct-duration rollup, the
    * risk-set ratios are truncating integral divisions, and the Newton
    * step ⌊10⁶·U/I⌋ is BigInt arithmetic clamped to |β| ≤ 20 — the
    * whole trajectory replays bit-for-bit in a second engine (the ppm
    * rounding of exp is the one libm touch, the q141 discipline).
    * Returns ONE row: (n, n_events, n_times, iters, beta_micro,
    * hr_micro) — hr = e^β, the hazard ratio per unit of x.
    *
    * Scale: ONE (duration, x) cell agg off the fact table (map-side
    * combine); every Newton round is rollup-sized — a duration-grain
    * suffix window (documented single-partition rollup hazard) + a
    * 1-row collect. Covariates should be small integers (quantize
    * upstream); |x| ≤ ~10³ keeps S₂·10⁶ inside DECIMAL(38,0). */
  def coxPh(df: DataFrame, durationCol: Column, eventCol: Column,
      xCol: Column, iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 64, "1 <= iters <= 64")
    val d38 = "decimal(38,0)"
    val spark = df.sparkSession
    val cells = df.select(durationCol.cast("long").as("__t"),
        eventCol.cast("int").cast("long").as("__e"),
        xCol.cast("long").as("__x"))
      .groupBy(col("__t"), col("__x"))
      .agg(count(lit(1)).as("__c"), sum(col("__e")).as("__d"))
      .localCheckpoint() // read every Newton round
    val tot = cells.agg(sum(col("__c")).as("n"), sum(col("__d")).as("ev"),
      countDistinct(col("__t")).as("nt")).collect()(0)
    val (n, nEvents, nTimes) =
      (tot.getAs[Long]("n"), tot.getAs[Long]("ev"), tot.getAs[Long]("nt"))
    require(nEvents >= 1, "coxPh needs at least one event")
    val clamp = 20000000L
    var b = 0L
    var it = 0
    while (it < iters) {
      val suffix = Window.orderBy(col("__t").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val s = cells
        .withColumn("__w", floor(exp(greatest(lit(-20.0), least(lit(20.0),
          (lit(b).cast("double") / 1e6) * col("__x")))) * 1e6 + 0.5)
          .cast("long"))
        .groupBy(col("__t"))
        .agg(sum(col("__c").cast(d38) * col("__w").cast(d38)).cast(d38)
            .as("__a0"),
          sum(col("__c").cast(d38) * col("__x").cast(d38) *
            col("__w").cast(d38)).cast(d38).as("__a1"),
          sum(col("__c").cast(d38) * col("__x").cast(d38) *
            col("__x").cast(d38) * col("__w").cast(d38)).cast(d38)
            .as("__a2"),
          sum(col("__d")).as("__dd"),
          sum(col("__d") * col("__x")).as("__ex"))
        .withColumn("__s0", sum(col("__a0")).over(suffix).cast(d38))
        .withColumn("__s1", sum(col("__a1")).over(suffix).cast(d38))
        .withColumn("__s2", sum(col("__a2")).over(suffix).cast(d38))
        .filter(col("__dd") > 0L)
        .withColumn("__s1u", expr("(__s1 * 1000000) div __s0"))
        .withColumn("__s2u", expr("(__s2 * 1000000) div __s0"))
        .withColumn("__uc", expr("CAST(1000000 AS decimal(38,0)) " +
          "* __ex - CAST(__dd AS decimal(38,0)) * __s1u"))
        .withColumn("__ic", expr("CAST(__dd AS decimal(38,0)) * " +
          "(__s2u - (__s1u * __s1u) div 1000000L)"))
        .agg(sum(col("__uc").cast(d38)).cast(d38).as("__uu"),
          sum(col("__ic").cast(d38)).cast(d38).as("__ii"))
        .collect()(0)
      def big(i: Int) = BigInt(s.getAs[java.math.BigDecimal](i).toBigInteger)
      val (uu, ii) = (big(0), big(1))
      if (ii > 0)
        b = math.max(-clamp, math.min(clamp,
          b + ((BigInt(1000000) * uu) / ii).toLong))
      it += 1
    }
    val hr = math.floor(math.exp(b.toDouble / 1e6) * 1e6 + 0.5).toLong
    spark.range(1).select(lit(n).as("n"), lit(nEvents).as("n_events"),
      lit(nTimes).as("n_times"), lit(iters.toLong).as("iters"),
      lit(b).as("beta_micro"), lit(hr).as("hr_micro"))
  }

  /** A-stat/E6 — period-over-period CATEGORY-MIX drift series: for
    * each period, the Jensen–Shannon divergence between its category
    * distribution and the PREVIOUS period's — q218's one-number corpus
    * drift turned into the time series an ops dashboard actually
    * watches ("did today's event mix move against yesterday's"), with
    * JSD's bounded (≤ ln 2) symmetric behavior and tolerance for
    * categories present on only one side.
    *
    * Determinism contract: per-(period, category) counts are exact
    * longs; p, q, m and both logs are evaluated in pinned token order
    * and each category's contribution is nano-quantized before the
    * per-period integer sum (the [[graft.ext.TextAnalysis.jsDivergence]]
    * discipline). Periods pair by POSITION in period order (lag over
    * the period rollup), so calendar gaps compare adjacent OBSERVED
    * periods. Returns one row per period with a predecessor:
    * (period, prev_period, n_cur, n_prev, jsd).
    *
    * Scale: one (period, category) agg with map-side combine; the
    * pairing lag and the term sum run over the period×category rollup
    * (calendar × domain bounded), never the event stream. */
  def categoryMixDrift(df: DataFrame, periodCol: Column,
      categoryCol: Column): DataFrame = {
    val cells = df.groupBy(periodCol.as("__p"), categoryCol.as("__c"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint() // rollup grain; totals + both pair sides read it
    val w = Window.orderBy(col("__p"))
    val pairs = cells.groupBy(col("__p")).agg(sum(col("__n")).as("__tot"))
      .withColumn("__prev", lag(col("__p"), 1).over(w))
      .withColumn("__ptot", lag(col("__tot"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .localCheckpoint() // period rollup; three consumers
    // per pair, the category union: current counts ⟗ previous counts,
    // both keyed to the CURRENT period of the pair
    val curSide = pairs.select(col("__p")).join(cells, Seq("__p"))
      .select(col("__p"), col("__c"), col("__n").as("__a"))
    val prvSide = pairs.select(col("__p"), col("__prev"))
      .join(cells.withColumnRenamed("__p", "__prev"), Seq("__prev"))
      .select(col("__p"), col("__c"), col("__n").as("__b"))
    val merged = curSide.join(prvSide, Seq("__p", "__c"), "full_outer")
      .select(col("__p"), coalesce(col("__a"), lit(0L)).as("__a"),
        coalesce(col("__b"), lit(0L)).as("__b"))
    // p, q, m and both logs in pinned token order; per-category
    // nano-rounding makes the per-period sum engine-portable
    val terms = merged.join(broadcast(pairs), Seq("__p"))
      .withColumn("__pa",
        col("__a").cast("double") / col("__tot").cast("double"))
      .withColumn("__pb",
        col("__b").cast("double") / col("__ptot").cast("double"))
      .withColumn("__m", (col("__pa") + col("__pb")) / 2)
      .withColumn("__term_nano", round(
        (when(col("__a") > 0, col("__pa") * log(col("__pa") / col("__m")))
          .otherwise(lit(0.0)) +
         when(col("__b") > 0, col("__pb") * log(col("__pb") / col("__m")))
          .otherwise(lit(0.0))) * 1e9, 0).cast("long"))
    terms.groupBy(col("__p").as("period"))
      .agg(max(col("__prev")).as("prev_period"), max(col("__tot")).as("n_cur"),
        max(col("__ptot")).as("n_prev"),
        sum(col("__term_nano")).as("__s_nano"))
      .select(col("period"), col("prev_period"), col("n_cur"), col("n_prev"),
        round(col("__s_nano").cast("double") / 2 / 1e9, 6).as("jsd"))
  }

  /** A1/A-stat — funnel transition table WITH leak significance: for
    * each consecutive stage pair, the conversion rate plus a pooled
    * two-proportion z comparing this transition's rate against the
    * PREVIOUS transition's — "step 3 leaks worse than the funnel's own
    * baseline" is an actionable readout; raw drop-off counts are not
    * (later stages always have fewer users). Built on the
    * [[funnelReachTimes]] conditional-min kernel.
    *
    * Exactness: stage reach counts are exact; rates are ppm integral
    * quotients; z is the pooled-proportion finish of
    * [[graft.ops.Experimentation.sequentialBoundary]] written
    * token-for-token in the oracle (null for the first transition and
    * whenever a denominator vanishes). Returns one row per transition:
    * (stage_from, stage_to, entered, converted, rate_ppm, z_vs_prev).
    *
    * Scale: the funnel kernel's actor-keyed aggs (one per stage), then
    * a |stages|-row finish. */
  def funnelWithSignificance(df: DataFrame, actorCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "need >= 2 stages")
    val reach = funnelReachTimes(df, actorCol, tsCol, typeCol, stages)
    val stageCounts =
      stages.map(st => sum(col(s"t_$st").isNotNull.cast("long")).as(s"c_$st"))
    val counts = reach.agg(stageCounts.head, stageCounts.tail: _*)
    // |stages|−1 transition rows from the 1-row counts frame
    val rows = stages.sliding(2).zipWithIndex.map { case (pair, i) =>
      val (a, b) = (pair.head, pair(1))
      struct(lit(i).as("i"), lit(a).as("stage_from"), lit(b).as("stage_to"),
        col(s"c_$a").as("entered"), col(s"c_$b").as("converted"))
    }.toSeq
    val t = counts.select(explode(array(rows: _*)).as("t")).select(col("t.*"))
      .withColumn("rate_ppm", when(col("entered") > 0,
        expr("(converted * 1000000L) div entered")))
    val w = Window.orderBy(col("i"))
    val prev = t
      .withColumn("__pe", lag(col("entered"), 1).over(w))
      .withColumn("__pc", lag(col("converted"), 1).over(w))
    val pa = col("entered").cast("double")
    val pb = col("__pe").cast("double")
    val pooled = (col("converted") + col("__pc")).cast("double") / (pa + pb)
    prev.select(col("stage_from"), col("stage_to"), col("entered"),
      col("converted"), col("rate_ppm"),
      when(col("__pe").isNotNull && col("entered") > 0 && col("__pe") > 0 &&
        (col("converted") + col("__pc")) > 0 &&
        (col("converted") + col("__pc")) < (col("entered") + col("__pe")),
        round((col("converted").cast("double") / pa -
          col("__pc").cast("double") / pb) /
          sqrt(pooled * (lit(1.0) - pooled) *
            (lit(1.0) / pa + lit(1.0) / pb)), 6)).as("z_vs_prev"))
  }

  /** A5/W1 — CAPPED sessionization: a new session starts when the gap
    * since the previous event exceeds `gapSeconds` OR the session's
    * total span would exceed `capSeconds` — the second rule is the
    * genuine Spark gap (`session_window` knows inactivity only; an
    * always-on bot never rotates sessions without the cap, and
    * downstream per-session stats silently blow up).
    *
    * Determinism contract: the split decision is a per-actor fold
    * (the [[graft.ops.TimeSeriesOps.ewmaInt]] device) over the
    * (ts, tie)-sorted event array — state = (session index, session
    * start) — all integer µs comparisons, so a recursive CTE replays
    * it exactly. Returns per event:
    * (actor, ts, tie, session_idx, session_start_us).
    *
    * Scale: one actor-keyed agg collects each actor's events (the
    * q25 envelope); the fold is scan-side. */
  def cappedSessionize(df: DataFrame, actorCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long, capSeconds: Long): DataFrame = {
    require(gapSeconds > 0 && capSeconds > 0, "gap and cap must be positive")
    val gapUs = gapSeconds * 1000000L
    val capUs = capSeconds * 1000000L
    val keyed = df.groupBy(col(actorCol))
      .agg(array_sort(collect_list(struct(
        unix_micros(col(tsCol)).as("t"),
        col(tieCol).cast("long").as("e")))).as("__arr"))
    val folded = keyed.withColumn("__st", expr(
      s"""aggregate(__arr,
         |  cast(array() as array<struct<i: bigint, st: bigint,
         |                               pt: bigint>>),
         |  (acc, x) -> array_append(acc,
         |    CASE WHEN size(acc) = 0
         |      THEN named_struct('i', 0L, 'st', x.t, 'pt', x.t)
         |      ELSE CASE WHEN x.t - element_at(acc, -1).pt > ${gapUs}L
         |                  OR x.t - element_at(acc, -1).st > ${capUs}L
         |        THEN named_struct('i', element_at(acc, -1).i + 1L,
         |          'st', x.t, 'pt', x.t)
         |        ELSE named_struct('i', element_at(acc, -1).i,
         |          'st', element_at(acc, -1).st, 'pt', x.t) END
         |      END))""".stripMargin))
    folded.select(col(actorCol),
        posexplode(arrays_zip(col("__arr"), col("__st"))).as(Seq("__i", "__z")))
      .select(col(actorCol), timestamp_micros(col("__z.__arr.t")).as(tsCol),
        col("__z.__arr.e").as(tieCol),
        col("__z.__st.i").as("session_idx"),
        col("__z.__st.st").as("session_start_us"))
  }

  /** A-stat/W-frame — top-K event-type TRANSITION TRIPLES per corpus:
    * the (t₁ → t₂ → t₃) trigrams of each actor's ordered stream,
    * counted and ranked — the sequence view one order deeper than
    * q102's transition matrix; where bigrams say "click follows view",
    * trigrams expose the actual loops (view→click→view) worth a
    * product fix. Ranking on exact counts with the lexicographic
    * triple as tie-break → engine-identical top-K. Returns
    * (t1, t2, t3, n) × topK.
    *
    * Scale: ONE actor-keyed window sort (the q25/q102 envelope)
    * yields both leads; the count agg is |types|³-bounded. */
  def topTransitionTriples(df: DataFrame, actorCol: Column, tsCol: Column,
      tieCol: Column, typeCol: Column, topK: Int): DataFrame = {
    require(topK >= 1, "topK >= 1")
    val w = Window.partitionBy(actorCol).orderBy(tsCol, tieCol)
    df.select(typeCol.as("t1"), lead(typeCol, 1).over(w).as("t2"),
        lead(typeCol, 2).over(w).as("t3"))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(topK)
  }

  /** W2/E-pattern — FREQUENT SEQUENTIAL PATTERNS up to length 3 by
    * GSP-style level-wise mining (Agrawal & Srikant, ICDE'95 "Mining
    * sequential patterns" and the GSP refinement EDBT'96 — public
    * literature). A pattern ⟨a, b, c⟩ is supported by a sequence when
    * the types occur in that ORDER, not necessarily adjacently — the
    * non-contiguous complement of q311's transition triples (lead()
    * windows see only adjacency) and q139's whole-journey paths.
    *
    * Existential subsequence tests reduce to rollup arithmetic:
    *   ⟨a,b⟩  ⊑ s  ⟺  minpos_s(a) < maxpos_s(b)
    *   ⟨a,b,c⟩⊑ s  ⟺  minfollow_s(a,b) < maxpos_s(c)
    * where minfollow(a,b) = the earliest b strictly after the first a.
    * Each level prunes by the Apriori property (every sub-pattern of a
    * frequent pattern is frequent) BEFORE any join fans out, so
    * candidate space never exceeds the frequent-pair closure. Support
    * is counted once per sequence; the threshold is a ppm fraction of
    * the sequence count tested as the exact-integer crossing
    * support·10⁶ ≥ minSupportPpm·n_seq. Repeated types are legal
    * (⟨a,a⟩ needs two occurrences — min < max handles it). Returns
    * (len, e1, e2, e3, support, support_ppm) with e2/e3 null below
    * the pattern length.
    *
    * Scale: positions are ONE keyed window; occ is a (sequence ×
    * alphabet)-bounded rollup; the pair join fans out ≤ |alphabet|²
    * per sequence and the minfollow join ≤ |frequent pairs| per event
    * row — alphabet-bounded, never event². All joins hash on the
    * sequence key; the L1/L2 prune tables broadcast. */
  def sequentialPatterns(events: DataFrame, seqKeys: Seq[Column],
      typeCol: Column, orderCols: Seq[Column],
      minSupportPpm: Long): DataFrame = {
    require(minSupportPpm >= 1 && minSupportPpm <= 1000000L,
      "minSupportPpm in [1, 1e6]")
    val base = events.select(seqKeys ++ Seq(typeCol.as("__e")) ++
      orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }: _*)
    val kNames = base.columns.dropRight(1 + orderCols.length).toSeq
    val w = Window.partitionBy(kNames.map(col): _*)
      .orderBy(orderCols.indices.map(i => col(s"__o$i")): _*)
    val pos = base.withColumn("__p", row_number().over(w).cast("long"))
      .select(kNames.map(col) ++ Seq(col("__e"), col("__p")): _*)
      .localCheckpoint() // read by occ, minfollow and all levels
    val occ = pos.groupBy(kNames.map(col) :+ col("__e"): _*)
      .agg(min(col("__p")).as("__minp"), max(col("__p")).as("__maxp"))
      .localCheckpoint()
    val nSeq = occ.select(kNames.map(col): _*).distinct()
      .agg(count(lit(1)).as("__nseq"))
    def frequent(df: DataFrame, grain: Seq[String]): DataFrame =
      df.groupBy(grain.map(col): _*)
        .agg(countDistinct(struct(kNames.map(col): _*)).as("support"))
        .crossJoin(broadcast(nSeq))
        .filter(col("support") * 1000000L >= lit(minSupportPpm) * col("__nseq"))
    // L1: frequent single types
    val l1 = frequent(occ.select(kNames.map(col) :+ col("__e"): _*),
      Seq("__e")).localCheckpoint()
    val l1Types = l1.select(col("__e").as("__f1"))
    // L2: frequent ordered pairs — occ self-join per sequence
    val occA = occ.toDF(occ.columns.map(c =>
      if (c.startsWith("__")) c + "a" else c): _*)
    val occB = occ.toDF(occ.columns.map(c =>
      if (c.startsWith("__")) c + "b" else c): _*)
    val pairs = occA
      .join(broadcast(l1Types), col("__ea") === col("__f1")).drop("__f1")
      .join(occB.join(broadcast(l1Types), col("__eb") === col("__f1"))
        .drop("__f1"), kNames)
      .filter(col("__minpa") < col("__maxpb"))
    val l2 = frequent(pairs.select(kNames.map(col) ++
        Seq(col("__ea"), col("__eb")): _*), Seq("__ea", "__eb"))
      .localCheckpoint()
    val l2Keys = l2.select(col("__ea").as("__fa"), col("__eb").as("__fb"))
    // minfollow(a, b): earliest b strictly after the first a, only for
    // (a, b) already frequent — the Apriori gate before the fan-out
    val mf = pos.withColumnRenamed("__e", "__eb")
      .join(occA.select(kNames.map(col) ++
        Seq(col("__ea"), col("__minpa")): _*), kNames)
      .join(broadcast(l2Keys),
        col("__ea") === col("__fa") && col("__eb") === col("__fb"))
      .filter(col("__p") > col("__minpa"))
      .groupBy(kNames.map(col) ++ Seq(col("__ea"), col("__eb")): _*)
      .agg(min(col("__p")).as("__mf"))
    // L3: triples — minfollow(a,b) before the last c; (b,c) and (a,c)
    // must both be frequent pairs (full Apriori prune)
    val l2bc = l2.select(col("__ea").as("__ga"), col("__eb").as("__gb"))
    val triples = mf
      .join(occ.toDF(occ.columns.map(c =>
        if (c.startsWith("__")) c + "c" else c): _*), kNames)
      .filter(col("__mf") < col("__maxpc"))
      .join(broadcast(l2bc),
        col("__eb") === col("__ga") && col("__ec") === col("__gb"))
      .drop("__ga", "__gb")
      .join(broadcast(l2bc.toDF("__ha", "__hb")),
        col("__ea") === col("__ha") && col("__ec") === col("__hb"))
    val l3 = frequent(triples.select(kNames.map(col) ++
      Seq(col("__ea"), col("__eb"), col("__ec")): _*),
      Seq("__ea", "__eb", "__ec"))
    val nullS = lit(null).cast("string")
    val out1 = l1.select(lit(1).as("len"), col("__e").as("e1"),
      nullS.as("e2"), nullS.as("e3"), col("support"), col("__nseq"))
    val out2 = l2.select(lit(2).as("len"), col("__ea").as("e1"),
      col("__eb").as("e2"), nullS.as("e3"), col("support"), col("__nseq"))
    val out3 = l3.select(lit(3).as("len"), col("__ea").as("e1"),
      col("__eb").as("e2"), col("__ec").as("e3"), col("support"),
      col("__nseq"))
    out1.unionAll(out2).unionAll(out3)
      .withColumn("support_ppm",
        expr("(support * 1000000L) div __nseq"))
      .select(col("len"), col("e1"), col("e2"), col("e3"),
        col("support").cast("long").as("support"), col("support_ppm"))
  }

  /** W-frame/A1 — EXACT SHAPLEY-VALUE attribution (Shapley 1953;
    * the coalition-reach game standard in marketing attribution, e.g.
    * Zhao, Mahboobi & Bagheri 2018 — public literature): how much
    * conversion credit does each touch TYPE deserve, counting every
    * ordering of channels fairly — the principled answer where
    * first/last/time-decay heuristics disagree.
    *
    *   - A JOURNEY is a conversion segment ([[timeDecayAttribution]]'s
    *     __seg machinery); its COALITION is the set of distinct touch
    *     types present, as a bitmask over the k global types (sorted,
    *     bit i = i-th type; k ≤ 20 enforced).
    *   - The characteristic function is the monotone REACH game:
    *     v(S) = number of CONVERTING journeys whose coalition ⊆ S.
    *   - φ_i · k! = Σ_{S ∌ i} |S|!·(k−|S|−1)!·(v(S∪{i}) − v(S)) —
    *     kept as the EXACT integer permutation count (20! < 2⁶³), so
    *     the efficiency law Σφ_i·k! = v(full)·k! holds exactly and the
    *     whole op is reduce-order-independent.
    *
    * Returns per type: (touch_type, phi_perm, phi_micro, v_solo,
    * v_full) with phi_micro = (10⁶·phi_perm) div k!.
    *
    * Scale: the fact pass is ONE (actor, seg) window + rollup to ≤ 2^k
    * distinct coalition masks; the 2^k × masks subset-sum join and the
    * k·2^k Shapley sum run on k-bounded frames (k = channel count —
    * single digits in practice), never the fact table. */
  def shapleyAttribution(df: DataFrame, actorCol: String, tsCol: String,
      tieCol: String, typeCol: String, convType: String): DataFrame = {
    graft.plans.Guardrails.expect("cartesian_join", "__mask, __nconv",
      "shapleyAttribution: 2^k-row subset lattice x coalition rollup " +
        "(k = touch-type count, <= 20)",
    "k-literal")
    val order = Seq(col(tsCol), col(tieCol))
    val wAll = Window.partitionBy(col(actorCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val seg = df.withColumn("__seg",
      coalesce(sum(when(col(typeCol) === convType, 1L).otherwise(0L))
        .over(wAll), lit(0L)))
    // the k global touch types, sorted — bit index assignment
    val types = seg.filter(col(typeCol) =!= convType)
      .select(col(typeCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    val k = types.length
    require(k >= 1 && k <= 20, s"shapley needs 1..20 touch types, got $k")
    val bitOf = types.zipWithIndex.toMap
    // converting journeys -> coalition mask rollup (<= 2^k rows)
    val touches = seg.filter(col(typeCol) =!= convType)
      .select(col(actorCol).as("__a"), col("__seg"),
        col(typeCol).cast("string").as("__t"))
    val convs = seg.filter(col(typeCol) === convType)
      .select(col(actorCol).as("__a"), col("__seg")).distinct()
    val bitExpr = types.foldLeft(lit(0L)) { (acc, t) =>
      acc.bitwiseOR(when(col("__t") === t, lit(1L << bitOf(t))).otherwise(lit(0L)))
    }
    val maskCounts = touches.join(convs, Seq("__a", "__seg")) // converting only
      .select(col("__a"), col("__seg"), bitExpr.as("__b"))
      .groupBy(col("__a"), col("__seg"))
      .agg(expr("bit_or(__b)").as("__jm"))
      .groupBy(col("__jm")).agg(count(lit(1)).as("__nconv"))
      .localCheckpoint()
    def factorial(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    // Overflow guard: the reach game is MONOTONE (v(S∪i) ≥ v(S)), so
    // every |S|!·(k−|S|−1)!·Δv term is ≥ 0 and every partial sum is
    // bounded by the total Σφ = v_full·k!. Requiring v_full·k! to fit
    // a Long therefore makes the whole LongType accumulation exact —
    // without it, k near 20 (20! ≈ 2.4e18) wraps silently at v_full≥4.
    // (1-row driver aggregate over the ≤2^k-row checkpointed rollup.)
    val vFullCheck = maskCounts.agg(coalesce(sum(col("__nconv")), lit(0L)))
      .head().getLong(0)
    require(vFullCheck <= Long.MaxValue / factorial(k),
      s"shapleyAttribution: v_full=$vFullCheck with k=$k overflows " +
        s"Long in phi accumulation (v_full*k! > 2^63); reduce the " +
        s"touch-type count or pre-aggregate conversions")
    // v(S) over the full lattice: subset-sum join (mask subset of S)
    val spark = df.sparkSession
    val lattice = spark.range(1L << k).select(col("id").as("__mask"))
    val v = lattice.join(broadcast(maskCounts),
        col("__jm").bitwiseAND(bitwise_not(col("__mask"))) === 0, "left")
      .groupBy(col("__mask"))
      .agg(coalesce(sum(col("__nconv")), lit(0L)).as("__v"))
      .localCheckpoint()
    val factArr = array((0 to k).map(i => lit(factorial(i))): _*)
    def popcnt(c: Column): Column = expr(s"bit_count(${c.toString})")
    // Shapley sum: for each type bit i, over subsets S without i
    val phis = (0 until k).map { i =>
      val bit = 1L << i
      val sNoI = v.filter(col("__mask").bitwiseAND(lit(bit)) === 0)
        .select(col("__mask"), col("__v").as("__vs"))
      val sWithI = v.filter(col("__mask").bitwiseAND(lit(bit)) =!= 0)
        .select(col("__mask").bitwiseAND(lit(~bit)).as("__m2"),
          col("__v").as("__vsi"))
      sNoI.join(sWithI, col("__mask") === col("__m2"))
        .select((element_at(factArr, popcnt(col("__mask")).cast("int") + 1) *
          element_at(factArr, lit(k) - popcnt(col("__mask")).cast("int")) *
          (col("__vsi") - col("__vs"))).as("__term"))
        .agg(coalesce(sum(col("__term")), lit(0L)).as("phi_perm"))
        .select(lit(types(i)).as("touch_type"), col("phi_perm"))
    }
    val vSolo = v.filter(popcnt(col("__mask")) === 1)
      .select(col("__mask"), col("__v").as("v_solo"))
    val vFull = v.orderBy(col("__mask").desc).limit(1)
      .select(col("__v").as("v_full"))
    val phiAll = phis.reduce(_ unionByName _)
    val withBits = phiAll.withColumn("__bit",
      types.zipWithIndex.foldLeft(lit(0L)) { case (acc, (t, i)) =>
        when(col("touch_type") === t, lit(1L << i)).otherwise(acc) })
    withBits.join(broadcast(vSolo), col("__bit") === col("__mask"), "left")
      .crossJoin(broadcast(vFull))
      .select(col("touch_type"), col("phi_perm"),
        expr(s"(1000000L * phi_perm) div ${factorial(k)}L").as("phi_micro"),
        coalesce(col("v_solo"), lit(0L)).as("v_solo"), col("v_full"))
  }
  /** A-stat/E2+ — entropy rate of the first-order event-type Markov
    * chain (Shannon 1948 §2; Cover & Thomas ch. 4): how many nats of
    * genuine novelty each successive user action carries,
    *   H = −Σ_i π_i Σ_j p_ij ln p_ij
    * with π the stationary distribution — the journey-predictability
    * number behind "are sessions becoming more templated?". π comes
    * from `iters` fixed integer ppm power-iteration rounds of
    * π' = πP from uniform (per-edge contribution (π_i·c_ij) div r_i —
    * truncation dust documented, sub-ppm per round); each conditional
    * entropy is micro-nat quantized once per transition CELL
    * (floor(ln(r_i/c_ij)·10⁶ + 0.5), the suite's libm discipline).
    *
    * Returns one row per state: (state, pi_ppm, h_state_micro,
    * h_rate_micro) — h_rate_micro = Σ (π_i·H_i) div 10⁶ constant on
    * every row.
    *
    * Scale: the fact pass is q102's user-keyed lead window + (src,
    * dst) agg; everything after runs on the |types|² transition cell
    * frame. When that frame is audit-slice sized (≤4096 states,
    * ≤200k cells — the q497 count-gate discipline) the power
    * iteration runs on the DRIVER with the IDENTICAL ppm integers:
    * six rounds of joins over a dozen-row frame is pure job latency,
    * and the iterative-join lineage was the suite's one bench drift
    * row (r10 verdict item 1). The distributed fallback checkpoints
    * π each round so lineage stays one round deep at any |types|. */
  def markovEntropyRate(events: DataFrame, actorCol: Column, tsCol: Column,
      tieCol: Column, typeCol: Column, iters: Int = 6,
      driverFastPath: Boolean = true): DataFrame = {
    require(iters >= 1 && iters <= 32, "1 <= iters <= 32")
    val w = Window.partitionBy(actorCol).orderBy(tsCol, tieCol)
    val pairs = events
      .select(typeCol.cast("string").as("__s"),
        lead(typeCol.cast("string"), 1).over(w).as("__d"))
      .filter(col("__d").isNotNull)
    val c = pairs.groupBy(col("__s"), col("__d")).agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val r = c.groupBy(col("__s")).agg(sum(col("__c")).as("__r"))
      .localCheckpoint()
    val m = r.count()
    // the cell count is the LAST short-circuited conjunct: the
    // distributed path must not pay a job for a gate it already failed
    if (driverFastPath && m <= 4096L && c.count() <= 200000L) {
      // BOUNDED fast path: the transition matrix is |types|² ROWS,
      // not facts — collect it once and replay the exact integer
      // recurrence (pi·c div r, truncation dust and all) in memory.
      val cRows = c.collect().map(x =>
        (x.getString(0), x.getString(1), x.getLong(2)))
      val rMap = cRows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      var piM: Map[String, Long] =
        rMap.keysIterator.map(_ -> 1000000L / math.max(1L, m)).toMap
      var it = 0
      while (it < iters) {
        val next = scala.collection.mutable.Map.empty[String, Long]
        cRows.foreach { case (s0, d0, cc) =>
          // mass landing on a dst that never occurs as src leaves the
          // chain (absorbing tail) — same inner-join-back semantics
          if (rMap.contains(d0)) piM.get(s0).foreach { p =>
            next(d0) = next.getOrElse(d0, 0L) + (p * cc) / rMap(s0)
          }
        }
        piM = next.toMap
        it += 1
      }
      val out = cRows.groupBy(_._1).toSeq.map { case (s0, es) =>
        val rr = rMap(s0)
        val hs = es.iterator.map { case (_, _, cc) =>
          (cc * math.floor(
            math.log(rr.toDouble / cc.toDouble) * 1e6 + 0.5).toLong) / rr
        }.sum
        (s0, piM.getOrElse(s0, 0L), hs)
      }
      val rate = out.iterator.map { case (_, p, hs) => (p * hs) / 1000000L }.sum
      val spark = events.sparkSession
      import spark.implicits._
      // ordering via Spark (UTF8String binary), not Java String sort —
      // the two differ on supplementary-plane labels, and both paths
      // must return the same row ORDER, not just the same row set
      return out.map { case (s0, p, hs) => (s0, p, hs, rate) }
        .toDF("state", "pi_ppm", "h_state_micro", "h_rate_micro")
        .orderBy(col("state"))
    }
    var pi = r.select(col("__s").as("state"))
      .withColumn("pi_ppm", lit(1000000L / math.max(1L, m)))
    var it = 0
    while (it < iters) {
      pi = c.join(r, "__s")
        .join(pi.select(col("state").as("__s"), col("pi_ppm")), "__s")
        .select(col("__d").as("state"),
          expr("(pi_ppm * __c) div __r").as("__contrib"))
        // mass landing on a dst that never occurs as src leaves the
        // chain (absorbing tail) — inner-join back to the src states
        .join(r.select(col("__s").as("state")), "state")
        .groupBy(col("state")).agg(sum(col("__contrib")).as("pi_ppm"))
        // pin each round: without this the 6-round loop chains six
        // un-checkpointed join generations and Catalyst re-analyzes a
        // lineage that deepens every round (r10 bench drift, q411)
        .localCheckpoint()
      it += 1
    }
    val h = c.join(r, "__s")
      .withColumn("__mnat", floor(
        log(col("__r").cast("double") / col("__c").cast("double")) * 1e6
          + 0.5).cast("long"))
      .withColumn("__inner", expr("(__c * __mnat) div __r"))
      .groupBy(col("__s").as("state"))
      .agg(sum(col("__inner")).as("h_state_micro"))
    val joined = h.join(pi, Seq("state"), "left")
      .withColumn("pi_ppm", coalesce(col("pi_ppm"), lit(0L)))
      .localCheckpoint()
    val rate = joined.agg(
      sum(expr("(pi_ppm * h_state_micro) div 1000000")).as("h_rate_micro"))
    joined.crossJoin(broadcast(rate))
      .select(col("state"), col("pi_ppm"), col("h_state_micro"),
        col("h_rate_micro"))
      .orderBy(col("state"))
  }
  /** A-stat/attribution — Markov-chain removal-effect attribution
    * (Anderl, Becker, von Wangenheim & Schumann 2016, the standard
    * "Markov attribution" of marketing science): model journeys as a
    * first-order chain over touch types with START/CONV/NULL states;
    * each channel's credit is its REMOVAL EFFECT — how much the
    * START→CONV absorption probability drops when the channel is
    * deleted (redirected to NULL) — normalized to shares. Unlike
    * last-touch/position rules this prices a channel by what the
    * journey GRAPH loses without it.
    *
    * Determinism: the transition matrix is a bounded |types|² rollup
    * (collected — the kriging/k-means driver license); absorption
    * probabilities come from `iters` FIXED rounds of integer ppm
    * value iteration p ← (c_CONV·10⁶ + Σ_d c_d·p_d) div r — no linear
    * solve, engine-replayable, converging geometrically (spectral
    * radius < 1 for any chain with reachable absorption).
    *
    * Returns one row per channel: (channel, base_conv_ppm,
    * removed_conv_ppm, removal_effect_ppm, share_ppm).
    *
    * Scale: ONE actor-keyed window pass builds transitions (the q102
    * shape); everything after runs on the ≤ (|types|+3)² matrix. */
  def markovRemovalAttribution(events: DataFrame, actorCol: Column,
      tsCol: Column, tieCol: Column, typeCol: Column, convType: String,
      iters: Int = 40): DataFrame = {
    require(iters >= 1 && iters <= 1000, "1 <= iters <= 1000")
    val w = Window.partitionBy(col("__actor")).orderBy(col("__ts"), col("__tie"))
    // touches strictly BEFORE the actor's first conversion; journeys
    // with no conversion end in NULL
    val base = events.select(actorCol.as("__actor"), tsCol.as("__ts"),
      tieCol.as("__tie"), typeCol.cast("string").as("__t"))
    val firstConv = base.filter(col("__t") === convType)
      .groupBy(col("__actor"))
      .agg(min(struct(col("__ts"), col("__tie"))).as("__fc"))
    val touches = base.filter(col("__t") =!= convType)
      .join(firstConv, Seq("__actor"), "left")
      .filter(col("__fc").isNull ||
        struct(col("__ts"), col("__tie")) < col("__fc"))
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__converted", col("__fc").isNotNull)
    // edges: START→first, t→next, last→CONV/NULL — built in one pass
    val edges = touches.select(col("__t").as("__src"),
        coalesce(col("__next"),
          when(col("__converted"), lit("CONV")).otherwise(lit("NULL")))
          .as("__dst"))
      .unionByName(touches.filter(col("__rn") === 1)
        .select(lit("START").as("__src"), col("__t").as("__dst")))
    val mat = edges.groupBy(col("__src"), col("__dst"))
      .agg(count(lit(1)).as("__c")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(mat.nonEmpty, "no journeys")
    val rowSum = mat.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val channels = mat.iterator.flatMap(e => Seq(e._1, e._2))
      .filter(s => s != "START" && s != "CONV" && s != "NULL")
      .toSeq.distinct.sorted
    // integer ppm value iteration; `removed` forces a channel to 0
    def absorb(removed: Option[String]): Map[String, Long] = {
      val states = "START" +: channels
      var p = states.map(_ -> 0L).toMap
      var i = 0
      while (i < iters) {
        p = states.map { s =>
          if (removed.contains(s)) s -> 0L
          else {
            val r = rowSum.getOrElse(s, 0L)
            if (r == 0) s -> 0L
            else {
              val inflow = mat.iterator.filter(_._1 == s).map { case (_, d, c) =>
                if (d == "CONV") c * 1000000L
                else if (removed.contains(d)) 0L
                else c * p.getOrElse(d, 0L)
              }.sum
              s -> inflow / r
            }
          }
        }.toMap
        i += 1
      }
      p
    }
    val baseP = absorb(None)("START")
    val rows = channels.map { ch =>
      val removedP = absorb(Some(ch))("START")
      (ch, baseP, removedP, baseP - removedP)
    }
    val totalRe = math.max(1L, rows.map(_._4).sum)
    val spark = events.sparkSession
    import spark.implicits._
    rows.map { case (ch, b, rp, re) =>
      (ch, b, rp, re, re * 1000000L / totalRe)
    }.toDF("channel", "base_conv_ppm", "removed_conv_ppm",
      "removal_effect_ppm", "share_ppm")
      .orderBy(col("channel"))
  }
}
