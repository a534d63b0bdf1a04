package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("W1: concurrencyProfile — half-open semantics across a midnight seam") {
    // two intervals cross midnight; one lives inside the next day
    val df = Seq(
      (ts("2024-01-01 23:50:00"), ts("2024-01-02 00:05:00")),
      (ts("2024-01-01 23:55:00"), ts("2024-01-02 00:10:00")),
      (ts("2024-01-02 00:00:00"), ts("2024-01-02 00:02:00")))
      .toDF("s", "e")
    val out = EventAnalytics.concurrencyProfile(df, "s", "e")
      .orderBy("t").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1)))
    assert(out.toSeq == Seq(
      ("2024-01-01 23:50:00.0", 1L),
      ("2024-01-01 23:55:00.0", 2L),
      ("2024-01-02 00:00:00.0", 3L), // carry-in 2 from day 1 + new start
      ("2024-01-02 00:02:00.0", 2L),
      ("2024-01-02 00:05:00.0", 1L),
      ("2024-01-02 00:10:00.0", 0L)))
  }

  test("W1: concurrencyProfile — a start and an end at the same instant cancel") {
    val df = Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("s", "e")
    val out = EventAnalytics.concurrencyProfile(df, "s", "e")
      .orderBy("t").collect().map(r => (r.getTimestamp(0).toString, r.getLong(1)))
    // [10,11) and [11,12): at 11:00 exactly one is active (half-open)
    assert(out.toSeq == Seq(
      ("2024-01-01 10:00:00.0", 1L),
      ("2024-01-01 11:00:00.0", 1L),
      ("2024-01-01 12:00:00.0", 0L)))
  }

  test("A1: funnelReachTimes — strict order; wrong-order actors stall") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"), // completes
      (2L, ts("2024-01-01 10:00:00"), "purchase"), // purchase BEFORE view/click
      (2L, ts("2024-01-01 10:05:00"), "view"),
      (2L, ts("2024-01-01 10:06:00"), "click"),    // reaches click only
      (3L, ts("2024-01-01 09:00:00"), "click"))    // never views
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnelReachTimes(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), !r.isNullAt(1), !r.isNullAt(2), !r.isNullAt(3)))
    assert(out.toSeq == Seq(
      (1L, true, true, true),
      (2L, true, true, false),
      (3L, false, false, false)))
  }

  test("U2: scd2Apply — all four fates in one merge, then idempotence") {
    import graft.ops.Dimensions
    val dim = Seq(
      (1L, "gold"), (2L, "silver"), (3L, "bronze"))
      .toDF("k", "seg")
      .select(col("k"), col("seg"),
        to_date(lit("2020-01-01")).as("vf"), lit(null).cast("date").as("vt"))
    val upd = Seq(
      (1L, "platinum"), // changed → close + reopen
      (2L, "silver"),   // no-op update
      (9L, "new"))      // brand-new key; 3L is dim-only
      .toDF("k", "seg")
    val out = Dimensions.scd2Apply(dim, upd, "k", Seq("seg"), "vf", "vt", "2024-06-01")
      .orderBy("k", "vf")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString).orNull))
    assert(out.toSeq == Seq(
      (1L, "gold", "2020-01-01", "2024-06-01"),
      (1L, "platinum", "2024-06-01", null),
      (2L, "silver", "2020-01-01", null),
      (3L, "bronze", "2020-01-01", null),
      (9L, "new", "2024-06-01", null)))
    // idempotence: re-applying the SAME batch to the new open slice
    // changes nothing (every key hits the no-op branch)
    val open = Dimensions.scd2Apply(dim, upd, "k", Seq("seg"), "vf", "vt", "2024-06-01")
      .filter(col("vt").isNull)
    val again = Dimensions.scd2Apply(open, upd, "k", Seq("seg"), "vf", "vt", "2024-07-01")
      .orderBy("k", "vf")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString).orNull))
    assert(again.toSeq == Seq(
      (1L, "platinum", "2024-06-01", null),
      (2L, "silver", "2020-01-01", null),
      (3L, "bronze", "2020-01-01", null),
      (9L, "new", "2024-06-01", null)))
  }

  test("A1: retentionCohorts counts distinct actors per (cohort, k) cell") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 18:00:00")), // same day — distinct-day dedup
      (1L, ts("2024-01-03 09:00:00")), // k = 2
      (2L, ts("2024-01-01 11:00:00")), // k = 0 only
      (3L, ts("2024-01-02 08:00:00")), // own cohort, k = 0
      (3L, ts("2024-01-12 08:00:00"))) // k = 10 > maxDays → dropped
      .toDF("user_id", "ts")
    val out = EventAnalytics.retentionCohorts(df, "user_id", "ts", maxDays = 7)
      .orderBy("cohort_day", "k").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 2L),
      ("2024-01-01", 2, 1L),
      ("2024-01-02", 0, 1L)))
  }

  test("A-stat: markovAccuracy — modal prediction, deterministic ties, exact ppm") {
    import graft.ops.EventAnalytics
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user journeys: A->B, A->B, A->C, B->A  (per-user consecutive pairs)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A", 1L),
      (1L, ts("2024-01-01 10:01:00"), "B", 2L),
      (1L, ts("2024-01-01 10:02:00"), "A", 3L),
      (1L, ts("2024-01-01 10:03:00"), "B", 4L),
      (2L, ts("2024-01-01 10:00:00"), "A", 5L),
      (2L, ts("2024-01-01 10:01:00"), "C", 6L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = EventAnalytics.markovAccuracy(ev, col("user_id"), col("ts"),
      col("event_type"), col("event_id")).orderBy("src").collect()
    val a = out.find(_.getString(0) == "A").get
    assert(a.getAs[String]("predicted") == "B")
    assert(a.getAs[Long]("n_trans") == 3L && a.getAs[Long]("n_correct") == 2L)
    assert(a.getAs[Long]("acc_ppm") == 666666L)
    val b = out.find(_.getString(0) == "B").get
    assert(b.getAs[String]("predicted") == "A" && b.getAs[Long]("acc_ppm") == 1000000L)
  }

  test("A-stat: logRank — hand two-subject case gives chi2 = 1 exactly") {
    import graft.ops.EventAnalytics
    // A dies at t=1 (n=2 at risk), B dies at t=2 (n=1 at risk)
    val subj = Seq(("A", 1L, 1), ("B", 2L, 1)).toDF("g", "dur", "ev")
    val r = EventAnalytics.logRank(subj, col("dur"), col("ev"), col("g"), "A")
      .head()
    assert(r.getAs[Long]("o1") == 1L)
    assert(r.getAs[Long]("e1_u") == 500000L)
    assert(r.getAs[Long]("v_u") == 250000L)
    assert(r.getAs[Double]("chi2") == 1.0)
    // exchangeable groups: mirrored death schedule -> O1 == E1, chi2 0
    val sym = Seq(("A", 1L, 1), ("B", 1L, 1)).toDF("g", "dur", "ev")
    val rs = EventAnalytics.logRank(sym, col("dur"), col("ev"), col("g"), "A")
      .head()
    assert(rs.getAs[Long]("o1") * 1000000L == rs.getAs[Long]("e1_u"))
  }

  test("rfmSegments: two-actor quintiles — recency inverts, F/M ascend") {
    // c1: old single small order; c2: recent, two, big
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (2L, ts("2024-01-05 10:00:00"), 300L),
      (2L, ts("2024-01-06 10:00:00"), 300L)).toDF("c", "t", "cents")
    val out = EventAnalytics.rfmSegments(df, col("c"), col("t"), col("cents"))
      .orderBy("rfm_code").collect()
      .map(r => (r.getAs[Long]("rfm_code"), r.getAs[Long]("n_actors")))
    // c2: rdays 0 → rs 1, f 2 → fs 2, m 600 → ms 2 → 122
    // c1: rdays 5 → rs 2, f 1 → fs 1, m 100 → ms 1 → 211
    assert(out.toSeq == Seq((122L, 1L), (211L, 1L)))
  }

  test("burstiness: a perfectly periodic actor scores exactly −1") {
    val events = (0 until 12).map(i =>
      (7L, ts(f"2024-01-01 10:${i}%02d:00"))).toDF("u", "t")
    val r = EventAnalytics.burstiness(events, col("u"), col("t"),
      minGaps = 10L).head()
    assert(r.getAs[Long]("n_gaps") == 11L)
    assert(r.getAs[Long]("mean_gap_us") == 60000000L)
    assert(r.getAs[Double]("b") == -1.0)
  }

  test("burstiness: actors under the minimum gap count drop") {
    val events = Seq((1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:01:00"))).toDF("u", "t")
    assert(EventAnalytics.burstiness(events, col("u"), col("t"),
      minGaps = 10L).count() == 0)
  }

  test("retentionDecayFit: perfect halving gives a one-day half-life") {
    // 4 users on day 0, 2 on day 1, 1 on day 2 → slope = ln(1/2)/day
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 11:00:00")), (2L, ts("2024-01-02 11:00:00")),
      (3L, ts("2024-01-01 12:00:00")), (4L, ts("2024-01-01 13:00:00")))
      .toDF("user_id", "ts")
    val r = EventAnalytics.retentionDecayFit(df, "user_id", "ts", 14).head()
    assert(r.getAs[Long]("n_days") == 2L)
    assert(r.getAs[Double]("slope") == -0.693147)
    assert(r.getAs[Double]("half_life_days") == 1.0)
  }

  test("timeDecayAttribution: dyadic halving + largest-remainder to the " +
      "most recent touch") {
    // touch a at −2 half-lives (w 250 000), touch b at −1 (w 500 000):
    // base a = 3333, b = 6666; shortfall 1 goes to b (most recent)
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 02:00:00"), 3L, "conv"))
      .toDF("u", "t", "id", "k")
    val out = EventAnalytics.timeDecayAttribution(df, "u", "t", "id", "k",
      "conv", halfLifeSeconds = 3600L)
      .collect().map(r => r.getAs[String]("attributed_type") ->
        r.getAs[Long]("credit_bps")).toMap
    assert(out == Map("a" -> 3333L, "b" -> 6667L))
  }

  test("timeDecayAttribution: credit conserves per conversion; " +
      "touchless conversions credit (none)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:00:30"), 2L, "b"),
      (1L, ts("2024-01-01 00:01:00"), 3L, "conv"),
      (2L, ts("2024-01-01 09:00:00"), 4L, "conv"))
      .toDF("u", "t", "id", "k")
    val out = EventAnalytics.timeDecayAttribution(df, "u", "t", "id", "k",
      "conv", halfLifeSeconds = 3600L)
      .collect().map(r => r.getAs[String]("attributed_type") ->
        r.getAs[Long]("credit_bps")).toMap
    // both touches inside one half-life → equal weights → 5000/5000
    assert(out("a") == 5000L && out("b") == 5000L)
    assert(out("(none)") == 10000L)
    assert(out.values.sum == 20000L) // 10000 per conversion, exactly
  }

  test("cappedSessionize: gap splits AND span-cap splits, hand-traced") {
    // gap 30 min, cap 2 h. 20-min steps never trip the gap; the event
    // at minute 140 trips the SPAN cap (140 > 120 from the session
    // start); the final event trips the gap.
    val minutes = Seq(0, 20, 40, 60, 80, 100, 120, 140, 540)
    val df = minutes.zipWithIndex.map { case (m, i) =>
      (1L, new java.sql.Timestamp(
        ts("2024-01-01 00:00:00").getTime + m * 60000L), i.toLong)
    }.toDF("u", "ts", "eid")
    val out = EventAnalytics.cappedSessionize(df, "u", "ts", "eid",
        gapSeconds = 1800L, capSeconds = 7200L)
      .orderBy(col("ts")).collect()
    assert(out.map(_.getAs[Long]("session_idx")).toSeq ==
      Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L, 2L))
    // the cap-split session restarts its span clock at minute 140
    assert(out(7).getAs[Long]("session_start_us") ==
      out(7).getAs[java.sql.Timestamp]("ts").getTime * 1000L)
  }

  test("topTransitionTriples: hand journeys rank the repeated loop first") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "a"),
      (3L, 1L, "x"), (3L, 2L, "y"), (3L, 3L, "z"))
      .toDF("u", "t", "k")
    val out = EventAnalytics.topTransitionTriples(df.withColumn("eid",
        col("t")), col("u"), col("t"), col("eid"), col("k"), topK = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n")))
    assert(out.head == (("a", "b", "a", 2L)))
    assert(out.toSet.contains(("x", "y", "z", 1L)))
  }

  test("funnelWithSignificance: hand pooled-z against the previous " +
      "transition") {
    // 10 view → 5 click → 1 purchase: second transition z =
    // (.2 − .5)/√(.4·.6·(1/5 + 1/10)) = −1.118034
    val rows =
      (1L to 10L).map(u => (u, ts("2024-01-01 10:00:00"), "view")) ++
      (1L to 5L).map(u => (u, ts("2024-01-01 11:00:00"), "click")) ++
      Seq((1L, ts("2024-01-01 12:00:00"), "purchase"))
    val out = EventAnalytics.funnelWithSignificance(
      rows.toDF("u", "t", "k"), "u", "t", "k",
      Seq("view", "click", "purchase"))
      .orderBy(col("stage_from")).collect()
      .map(r => r.getAs[String]("stage_from") -> r).toMap
    val first = out("view")
    assert(first.getAs[Long]("entered") == 10L &&
      first.getAs[Long]("converted") == 5L)
    assert(first.getAs[Long]("rate_ppm") == 500000L)
    assert(first.isNullAt(first.fieldIndex("z_vs_prev")))
    val second = out("click")
    assert(second.getAs[Long]("entered") == 5L &&
      second.getAs[Long]("converted") == 1L)
    assert(second.getAs[Double]("z_vs_prev") == -1.118034)
  }

  test("categoryMixDrift: identical mixes score 0, disjoint mixes ln 2") {
    // day1 {a}, day2 {b} (disjoint → ln 2), day3 {b} (same → 0)
    val df = Seq(("d1", "a"), ("d2", "b"), ("d3", "b")).toDF("p", "c")
    val out = EventAnalytics.categoryMixDrift(df, col("p"), col("c"))
      .orderBy(col("period")).collect()
    assert(out.map(_.getAs[String]("period")).toSeq == Seq("d2", "d3"))
    assert(out(0).getAs[Double]("jsd") == 0.693147)
    assert(out(1).getAs[Double]("jsd") == 0.0)
  }

  test("categoryMixDrift: partial overlap — hand term check") {
    // day1: a×2; day2: a×1, b×1 → p_a=(1, 0), p_b=(.5, .5)
    // jsd = ½[1·ln(1/.75) + .5·ln(.5/.75) + .5·ln(.5/.25)]
    val df = Seq(("d1", "a"), ("d1", "a"), ("d2", "a"), ("d2", "b"))
      .toDF("p", "c")
    val r = EventAnalytics.categoryMixDrift(df, col("p"), col("c")).head()
    assert(r.getAs[Long]("n_cur") == 2L && r.getAs[Long]("n_prev") == 2L)
    val t1 = math.round((0.5 * math.log(0.5 / 0.75) +
      1.0 * math.log(1.0 / 0.75)) * 1e9)    // category a (cur .5, prev 1)
    val t2 = math.round(0.5 * math.log(0.5 / 0.25) * 1e9) // category b
    val want = BigDecimal((t1 + t2).toDouble / 2 / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("jsd") == want)
  }

  test("nelsonAalen: hand-computed hazard with censoring") {
    // (dur, event): (1,1),(1,0),(2,1),(3,0) → at t=1: n=4,d=1 (term
    // 250000); t=2: n=2,d=1 (term 500000); t=3: n=1,d=0
    val df = Seq((1L, 1), (1L, 0), (2L, 1), (3L, 0)).toDF("dur", "ev")
    val out = EventAnalytics.nelsonAalen(df, col("dur"), col("ev"))
      .orderBy(col("t")).collect()
    assert(out.map(_.getAs[Long]("n_risk")).toSeq == Seq(4L, 2L, 1L))
    assert(out.map(_.getAs[Long]("cumhaz_ppm")).toSeq ==
      Seq(250000L, 750000L, 750000L))
  }

  test("A1: shapleyAttribution — efficiency, symmetry and a hand case") {
    // journeys (conversion segments): {A} converts, {A,B} converts,
    // {B} converts twice -> reach game over k=2:
    // v({}) = 0, v({A}) = 1, v({B}) = 2, v({A,B}) = 4
    // phi_A*2! = 0!1!(v(A)-v({})) + 1!0!(v(AB)-v(B)) = 1 + 2 = 3
    // phi_B*2! = (v(B)-v({})) + (v(AB)-v(A)) = 2 + 3 = 5; sum = 8 = v_full*2!
    def journey(u: Long, evs: (String, Int)*): Seq[(Long, java.sql.Timestamp, Long, String)] =
      evs.zipWithIndex.map { case ((t, sec), i) =>
        (u, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d"), i.toLong, t) }
    val rows =
      journey(1, ("A", 1), ("conv", 2)) ++
      journey(2, ("A", 1), ("B", 2), ("conv", 3)) ++
      journey(3, ("B", 1), ("conv", 2)) ++
      journey(4, ("B", 1), ("conv", 2)) ++
      journey(5, ("A", 1)) // no conversion: contributes nothing
    val df = rows.toDF("u", "ts", "eid", "et")
    val out = EventAnalytics.shapleyAttribution(df, "u", "ts", "eid", "et", "conv")
      .orderBy("touch_type").collect()
    assert(out.map(r => (r.getAs[String]("touch_type"),
      r.getAs[Long]("phi_perm"), r.getAs[Long]("v_solo"),
      r.getAs[Long]("v_full"))).toSeq ==
      Seq(("A", 3L, 1L, 4L), ("B", 5L, 2L, 4L)))
    // efficiency: sum(phi_perm) == v_full * k!
    assert(out.map(_.getAs[Long]("phi_perm")).sum == 4L * 2L)
    // symmetry: two interchangeable channels split credit equally
    val sym = (journey(1, ("A", 1), ("conv", 2)) ++
      journey(2, ("B", 1), ("conv", 2)) ++
      journey(3, ("A", 1), ("B", 2), ("conv", 3))).toDF("u", "ts", "eid", "et")
    val so = EventAnalytics.shapleyAttribution(sym, "u", "ts", "eid", "et", "conv")
      .collect()
    assert(so.map(_.getAs[Long]("phi_perm")).distinct.length == 1)
  }

  test("A8: rmst — hand step integral, tau clamp, no-events-before-tau") {
    // subjects: durations 1 (event), 3 (censored): KM: S(1) = 1/2
    // (n_risk 2, d 1); S(3) = 1/2 (censored, d 0).
    // RMST(5) = 1*1e6 (before first event) + S(1)*(3-1) + S(3)*(5-3)
    //         = 1e6 + 500000*2 + 500000*2 = 3e6 -> 3.0
    val df = Seq((1L, 1), (3L, 0)).toDF("dur", "ev")
    val r = graft.ops.EventAnalytics.rmst(df, col("dur"), col("ev"), 5L)
      .head()
    assert(r.getAs[Long]("rmst_micro") == 3000000L)
    assert(r.getAs[Double]("rmst") == 3.0)
    // tau inside the first step: RMST(1) = full survival to tau
    val r1 = graft.ops.EventAnalytics.rmst(df, col("dur"), col("ev"), 1L)
      .head()
    assert(r1.getAs[Long]("rmst_micro") == 1000000L)
  }

  test("coxPh: null effect is exactly zero; hazardous group gets beta > 0") {
    // perfectly balanced groups failing at the same times: every risk
    // set has mean covariate exactly 1/2 and events split evenly, so
    // U(0) = 0 EXACTLY and beta never moves off zero
    val balanced = (1 to 6).flatMap { t =>
      Seq((t.toLong, true, 0L), (t.toLong, true, 1L)) }
      .toDF("dur", "evt", "x")
    val b0 = graft.ops.EventAnalytics.coxPh(balanced, col("dur"),
      col("evt"), col("x"), iters = 4).head()
    assert(b0.getAs[Long]("beta_micro") == 0L)
    assert(b0.getAs[Long]("hr_micro") == 1000000L)
    // x = 1 fails early, x = 0 late (plus censoring): positive hazard
    val risky = (Seq.tabulate(8)(i => ((i % 3 + 1).toLong, true, 1L)) ++
      Seq.tabulate(8)(i => ((i % 3 + 6).toLong, true, 0L)) ++
      Seq((9L, false, 0L), (9L, false, 1L))).toDF("dur", "evt", "x")
    val b1 = graft.ops.EventAnalytics.coxPh(risky, col("dur"),
      col("evt"), col("x"), iters = 5).head()
    assert(b1.getAs[Long]("beta_micro") > 500000L, b1.toString) // beta >> 0
    assert(b1.getAs[Long]("hr_micro") > 1000000L)
    assert(b1.getAs[Long]("n") == 18L && b1.getAs[Long]("n_events") == 16L)
    // integer trajectory: repartitioning cannot move a single micro
    val b2 = graft.ops.EventAnalytics.coxPh(risky.repartition(7),
      col("dur"), col("evt"), col("x"), iters = 5).head()
    assert(b2.getAs[Long]("beta_micro") == b1.getAs[Long]("beta_micro"))
    // no events at all is a loud error, not a silent null fit
    val cens = Seq((1L, false, 0L)).toDF("dur", "evt", "x")
    intercept[IllegalArgumentException] {
      graft.ops.EventAnalytics.coxPh(cens, col("dur"), col("evt"),
        col("x"), iters = 2).head()
    }
  }

  private def gspRun(seqs: Seq[(Long, Seq[String])], minPpm: Long) = {
    val rows = seqs.flatMap { case (sid, es) =>
      es.zipWithIndex.map { case (e, i) => (sid, e, i.toLong) } }
    val df = spark.createDataFrame(rows).toDF("sid", "e", "t")
    graft.ops.EventAnalytics.sequentialPatterns(df, Seq(col("sid")),
        col("e"), Seq(col("t")), minPpm)
      .collect()
      .map(r => (Option(r.getAs[String]("e1")) ++
        Option(r.getAs[String]("e2")) ++ Option(r.getAs[String]("e3")))
        .toList -> r.getAs[Long]("support")).toMap
  }

  test("sequentialPatterns: hand case — order matters, adjacency does not") {
    val out = gspRun(Seq(
      1L -> Seq("a", "b", "c"),
      2L -> Seq("a", "c", "b"),
      3L -> Seq("b", "a", "c"),
      4L -> Seq("a", "b", "c")), minPpm = 500000L) // support >= 2 of 4
    assert(out(List("a")) == 4L)
    assert(out(List("a", "b")) == 3L) // s3 has b BEFORE a — not supported
    assert(out(List("a", "c")) == 4L) // non-adjacent in s1/s4 still counts
    assert(out(List("b", "c")) == 3L)
    assert(!out.contains(List("b", "a"))) // only s3 — below threshold
    assert(out(List("a", "b", "c")) == 2L) // s1 and s4 (s2: c before b)
    assert(!out.contains(List("a", "c", "b"))) // needs (c,b) frequent
  }

  test("sequentialPatterns: repeated type needs two occurrences") {
    val out = gspRun(Seq(
      1L -> Seq("a", "a", "b"),
      2L -> Seq("a", "b"),
      3L -> Seq("a", "b", "a")), minPpm = 600000L) // support >= 2 of 3
    assert(out(List("a", "a")) == 2L) // s1 and s3; s2 has only one a
    assert(out(List("a", "b")) == 3L)
  }

  test("sequentialPatterns: agrees with brute-force subsequence counting") {
    // deterministic pseudo-random sessions over a 3-letter alphabet
    val alpha = Vector("a", "b", "c")
    var x = 123456789L
    def nxt(n: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      (((x >>> 33) % n) + n).toInt % n
    }
    val seqs = (1L to 40L).map { sid =>
      sid -> Seq.fill(1 + nxt(6))(alpha(nxt(3)))
    }
    def supports(p: List[String]): Int = seqs.count { case (_, es) =>
      // greedy subsequence scan
      var i = 0
      es.foreach { e => if (i < p.length && e == p(i)) i += 1 }
      i == p.length
    }
    val minPpm = 150000L // 15% of 40 = 6
    val out = gspRun(seqs, minPpm)
    // every pattern over the alphabet, lengths 1-3, repetition allowed
    val allPats = (for (a <- alpha) yield List(a)) ++
      (for (a <- alpha; b <- alpha) yield List(a, b)) ++
      (for (a <- alpha; b <- alpha; c <- alpha) yield List(a, b, c))
    allPats.foreach { p =>
      val s = supports(p)
      val frequent = s.toLong * 1000000L >= minPpm * seqs.length
      if (frequent)
        assert(out.get(p).contains(s.toLong), s"pattern $p support $s vs ${out.get(p)}")
      else assert(!out.contains(p), s"pattern $p should be infrequent")
    }
  }
}
