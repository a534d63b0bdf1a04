package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Aggregates, TimeSeriesOps}

object SparkTestSession {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4", "graft-test")
}

class TimeSeriesOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("P9: hour-interval predicate wraps overnight (pandas between_time semantics)") {
    val df = Seq(
      (1L, ts("2024-01-01 23:30:00")), // in 22-05
      (2L, ts("2024-01-01 04:59:59")), // in 22-05
      (3L, ts("2024-01-01 12:00:00")), // out
      (4L, ts("2024-01-01 22:00:00")), // boundary inclusive
      (5L, ts("2024-01-01 05:00:00")), // boundary inclusive
      (6L, ts("2024-01-01 05:00:01"))  // just out
    ).toDF("id", "t")
    val in = df.filter(TimeSeriesOps.hourIntervalPredicate(col("t"), "22:00:00", "05:00:00"))
      .select("id").as[Long].collect().sorted
    assert(in.toSeq == Seq(1L, 2L, 4L, 5L))
  }

  test("P9: non-wrapping interval is a plain inclusive between") {
    val df = Seq((1L, ts("2024-01-01 09:00:00")), (2L, ts("2024-01-01 17:00:00")),
      (3L, ts("2024-01-01 08:59:59")), (4L, ts("2024-01-01 17:00:01"))).toDF("id", "t")
    val in = df.filter(TimeSeriesOps.hourIntervalPredicate(col("t"), "09:00:00", "17:00:00"))
      .select("id").as[Long].collect().sorted
    assert(in.toSeq == Seq(1L, 2L))
  }

  test("P8: date range keeps the whole end day and errors on empty slice") {
    val df = Seq((1L, ts("2024-01-05 00:00:00")), (2L, ts("2024-01-10 23:59:59")),
      (3L, ts("2024-01-11 00:00:00"))).toDF("id", "t")
    val in = TimeSeriesOps.dateRangeFilter(df, "t", "2024-01-05", "2024-01-10")
      .select("id").as[Long].collect().sorted
    assert(in.toSeq == Seq(1L, 2L))
    intercept[graft.core.DataIOError] {
      TimeSeriesOps.dateRangeFilter(df, "t", "2030-01-01", "2030-01-02", requireNonEmpty = true)
    }
  }

  test("A5: ALL intervals survive (reference bug overwrites all but the last)") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 23:00:00"), 20.0),
      (2L, ts("2024-01-01 11:00:00"), 30.0)
    ).toDF("id", "t", "v")
    val out = TimeSeriesOps.intervalStats(df, "id", "t", Seq("v"), Seq("mean", "count"),
      Seq(("09:00:00", "17:00:00"), ("22:00:00", "05:00:00")))
    // both interval column blocks present — the intended multi-interval output
    assert(out.columns.toSet == Set("id",
      "mean_v_090000_170000", "count_v_090000_170000",
      "mean_v_220000_050000", "count_v_220000_050000"))
    val r = out.orderBy("id").collect()
    assert(r(0).getAs[Double]("mean_v_090000_170000") == 10.0)
    assert(r(0).getAs[Double]("mean_v_220000_050000") == 20.0)
    assert(r(1).getAs[Long]("count_v_220000_050000") == 0L)
  }

  test("A5: unknown column raises ColumnException listing available columns") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"), 1.0)).toDF("id", "t", "v")
    val e = intercept[graft.core.ColumnException] {
      TimeSeriesOps.intervalStats(df, "id", "t", Seq("nope"), Seq("mean"),
        Seq(("09:00:00", "17:00:00")))
    }
    assert(e.available.contains("v"))
  }

  test("X2: std maps to POPULATION std (numpy ddof=0), not sample std") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val got = df.agg(Aggregates("std")(col("x"))).head.getDouble(0)
    assert(math.abs(got - math.sqrt(1.25)) < 1e-12) // pop var of 1..4 = 1.25
  }

  test("U2: dedupFirst keeps the first row by total order, deterministically") {
    val df = Seq(
      (1L, "a", ts("2024-01-01 00:00:02"), 102L),
      (1L, "a", ts("2024-01-01 00:00:01"), 101L),
      (1L, "a", ts("2024-01-01 00:00:01"), 100L), // ts tie → id tiebreak
      (2L, "b", ts("2024-01-01 00:00:05"), 200L)
    ).toDF("k", "g", "t", "id")
    val out = TimeSeriesOps.dedupFirst(df, Seq("k", "g"), Seq(col("t").asc, col("id").asc))
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(100L, 200L))
  }

  test("A8: time profile per id + global bounds") {
    val df = Seq((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-02 00:00:00")),
      (2L, ts("2024-01-03 00:00:00"))).toDF("id", "t")
    val (per, global) = TimeSeriesOps.timeProfile(df, "id", "t")
    assert(per.count() == 2)
    val g = global.head
    assert(g.getTimestamp(0) == ts("2024-01-01 00:00:00"))
    assert(g.getTimestamp(1) == ts("2024-01-03 00:00:00"))
  }

  test("J-asof: asofJoin — latest prior right row, <= tie semantics, null before first") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"),
      (1L, ts("2024-01-01 09:00:00"), "early"), // before any right row
      (2L, ts("2024-01-01 10:00:00"), "other")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 1.0),
      (1L, ts("2024-01-01 12:00:00"), 2.0), // equal ts as left "b" → must win
      (2L, ts("2024-01-01 08:00:00"), 9.0)
    ).toDF("k", "t", "v")
    val out = TimeSeriesOps.asofJoin(left, right, "k", "t", Seq("v"))
      .select("tag", "asof_v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("early").isEmpty)           // no prior right row → null
    assert(out("a").contains(1.0))         // latest at 09:30
    assert(out("b").contains(2.0))         // equal ts: right row included (<=)
    assert(out("other").contains(9.0))     // keys independent
  }

  test("J-range: rangeJoin matches naive inequality join incl. bucket-straddling intervals") {
    val points = (0 until 200).map(i =>
      (i.toLong, ts(f"2024-01-01 ${i % 24}%02d:${(i * 7) % 60}%02d:00"))).toDF("pid", "t")
    val intervals = Seq(
      (1L, ts("2024-01-01 02:30:00"), ts("2024-01-01 03:30:00")), // inside one bucket
      (2L, ts("2024-01-01 05:59:00"), ts("2024-01-01 12:01:00")), // straddles buckets
      (3L, ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00")), // crosses midnight
      (4L, ts("2024-03-01 00:00:00"), ts("2024-03-01 01:00:00"))  // matches nothing
    ).toDF("wid", "beg", "end")
    val bucketed = TimeSeriesOps.rangeJoin(points, "t", intervals, "beg", "end", 3600)
      .select("pid", "wid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
      col("beg") <= col("t") && col("t") <= col("end"))
      .select("pid", "wid").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(!naive.exists(_._2 == 4L))
    assert(naive.exists(_._2 == 2L))
  }

  test("X2: user Aggregator (geomean) registered via functions.udaf works in the block") {
    val df = Seq(2.0, 8.0).toDF("x") // geometric mean = 4
    val got = df.agg(Aggregates("geomean")(col("x"))).head.getDouble(0)
    assert(math.abs(got - 4.0) < 1e-12)
    // and through the func×col block with naming
    val blocked = df.agg(Aggregates.block(Seq("geomean"), "src", Seq("x")).head)
    assert(blocked.columns.head == "geomean_src_x")
  }

  test("A-distinct: approx_count_distinct within 5% of exact on real data (the 100TB path)") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("F1: statName reproduces the reference's '_'.join naming product") {
    assert(Aggregates.statName("mean", "buildings", "height") == "mean_buildings_height")
    assert(Aggregates.statName("max", "", "band1") == "max_band1")
  }

  test("A8: laggedAutocorrelation — alternating series gives corr ±1 by lag parity") {
    val df = (0 until 6).map { h =>
      (1L, ts(f"2024-01-01 $h%02d:30:00"), if (h % 2 == 0) 1.0 else 3.0)
    }.toDF("user_id", "ts", "value")
    val out = TimeSeriesOps.laggedAutocorrelation(df, "user_id", "ts", "value", 3600, 3)
      .orderBy("lag")
      .select("lag", "n", "corr")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // exact long sums make these fully deterministic, so they pin
    // bit-exactly; the odd lags land one ulp off ±1 because
    // sqrt(varXN)·sqrt(varYN) is not exactly |covN| there — that last
    // ulp is the IEEE-portable value BOTH engines produce (q91's oracle
    // hash-matches it unrounded)
    assert(out.toSeq == Seq(
      (0, 6L, 1.0),
      (1, 5L, -0.9999999999999999), // perfectly anti-phase, one ulp shy
      (2, 4L, 1.0),
      (3, 3L, -1.0)))
  }

  test("A5: resampleFill fills interior gaps forward, per key, with gap audit") {
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 5.0),
      (1L, ts("2024-01-01 00:40:00"), 7.0), // same bin as above → max 7.0
      (1L, ts("2024-01-01 03:10:00"), 2.0), // bins 1,2 are gaps
      (2L, ts("2024-01-01 10:05:00"), 9.0)  // single-bin key: no gaps
    ).toDF("user_id", "ts", "value")
    val out = TimeSeriesOps.resampleFill(df, "user_id", "ts", "value", 3600)
      .orderBy("user_id", "bin")
      .select("user_id", "n_events", "is_gap", "v_fill")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, false, 7.0), // bin 0: two events, max
      (1L, 0L, true, 7.0),  // gap, filled from bin 0
      (1L, 0L, true, 7.0),  // gap
      (1L, 1L, false, 2.0), // observed again
      (2L, 1L, false, 9.0)))
  }

  test("A5: seasonalDecompose — integer seasonal means and exact residuals") {
    import spark.implicits._
    import graft.ops.TimeSeriesOps
    // season 0 values {10, 20} -> mean 15; season 1 values {7} -> 7
    val df = Seq((0L, 0L, 10L), (1L, 1L, 7L), (2L, 0L, 20L))
      .toDF("t", "season", "v")
    val out = TimeSeriesOps.seasonalDecompose(df, Nil, col("season"), col("v"))
      .orderBy("t").collect()
    assert(out.map(_.getAs[Long]("seasonal_c")).toSeq == Seq(15L, 7L, 15L))
    assert(out.map(_.getAs[Long]("resid_c")).toSeq == Seq(-5L, 0L, 5L))
    // truncating div: {1, 2} -> 1 (not 1.5)
    val t = TimeSeriesOps.seasonalDecompose(
      Seq((0L, 0L, 1L), (1L, 0L, 2L)).toDF("t", "season", "v"),
      Nil, col("season"), col("v")).orderBy("t").collect()
    assert(t.forall(_.getAs[Long]("seasonal_c") == 1L))
  }

  test("A5: forecastEval — hand MASE on a constructed holt-output frame") {
    import spark.implicits._
    import graft.ops.TimeSeriesOps
    // scale 10: values 10,20,30; forecasts (prev-step) chosen so holt
    // errors are |200-f1|=50, |300-f2|=10; naive errors 100, 100
    val holtOut = Seq(
      ("g", 1L, 10L, 150L), ("g", 2L, 20L, 290L), ("g", 3L, 30L, 999L))
      .toDF("g", "order", "value", "forecast_s")
    val out = TimeSeriesOps.forecastEval(holtOut, Seq("g"), scale = 10L)
      .head()
    assert(out.getAs[Long]("n_eval") == 2L)
    assert(out.getAs[Long]("sae_holt") == 60L)   // |200-150| + |300-290|
    assert(out.getAs[Long]("sae_naive") == 200L) // 100 + 100
    assert(out.getAs[Long]("mase_ppm") == 300000L)
  }

  test("crostonInt: hand recurrence — size and interval smooth " +
      "independently; zeros drop") {
    // demand at days 1 (z=10), 3 (z=20), 7 (z=5); α = 1/5, S = 1000:
    //   i1: zs 10000, qs 1000, f 10000
    //   i2: g 2 → zs (20000+40000)/5 = 12000, qs (2000+4000)/5 = 1200,
    //       f 12000000 div 1200 = 10000
    //   i3: g 4 → zs (5000+48000)/5 = 10600, qs (4000+4800)/5 = 1760,
    //       f 10600000 div 1760 = 6022
    val df = Seq(("k", 1L, 10L), ("k", 2L, 0L), ("k", 3L, 20L),
      ("k", 7L, 5L)).toDF("key", "day", "z")
    val out = TimeSeriesOps.crostonInt(df, Seq(col("key")), col("day"),
      col("z"), aNum = 1, aDen = 5, scale = 1000L)
      .orderBy(col("order")).collect()
    assert(out.length == 3) // the zero-demand day never enters
    assert(out.map(_.getAs[Long]("gap")).toSeq == Seq(1L, 2L, 4L))
    assert(out.map(_.getAs[Long]("z_s")).toSeq == Seq(10000L, 12000L, 10600L))
    assert(out.map(_.getAs[Long]("q_s")).toSeq == Seq(1000L, 1200L, 1760L))
    assert(out.map(_.getAs[Long]("forecast_s")).toSeq ==
      Seq(10000L, 10000L, 6022L))
  }

  test("pageHinkleyInt: level shift raises the alarm; stationary series " +
      "does not") {
    // flat at 10 for 5 points, then a jump to 100: the running mean
    // lags the jump, the increments go hugely positive, PH crosses λ
    val flat = (1L to 10L).map(i => ("k", i, 10L))
    val shifted = (1L to 5L).map(i => ("k", i, 10L)) ++
      (6L to 10L).map(i => ("k", i, 100L))
    def alarms(rows: Seq[(String, Long, Long)]) =
      TimeSeriesOps.pageHinkleyInt(rows.toDF("k", "t", "v"), Seq(col("k")),
        col("t"), col("v"), deltaMicro = 100000L, lambdaMicro = 10000000L)
        .orderBy(col("order")).collect().map(_.getAs[Boolean]("alarm")).toSeq
    assert(alarms(flat).forall(!_))
    assert(alarms(shifted).last)
  }

  test("acfProfile: perfect alternation — acf(1) = -(n-1)/n, hand pacf(2)") {
    // 8-point alternating series: ρ1 = −7/8, ρ2 = 6/8
    val df = (1L to 8L).map(i => (i, if (i % 2 == 0) 0L else 10L))
      .toDF("t", "v")
    val out = TimeSeriesOps.acfProfile(df, col("t"), col("v"), kLags = 2)
      .orderBy(col("lag")).collect()
    assert(out(0).getAs[Double]("acf") == -0.875)
    assert(out(1).getAs[Double]("acf") == 0.75)
    assert(out(0).getAs[Double]("pacf") == -0.875)
    // φ22 = (ρ2 − ρ1²)/(1 − ρ1²) = (−1/64)/(15/64)
    assert(out(1).getAs[Double]("pacf") ==
      BigDecimal((0.75 - 0.765625) / (1.0 - 0.765625))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("seasonalityStrength: perfect cycle scores 1; constant series " +
      "has no variance to explain") {
    val cycle = (0L until 8L).map(i => ("p", i % 2, if (i % 2 == 0) 10L else 20L))
    val flat = (0L until 8L).map(i => ("f", i % 2, 5L))
    val out = TimeSeriesOps.seasonalityStrength(
      (cycle ++ flat).toDF("k", "season", "v"), Seq(col("k")),
      col("season"), col("v"))
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("p").getAs[Double]("var_resid") == 0.0)
    assert(out("p").getAs[Double]("strength") == 1.0)
    assert(out("f").isNullAt(out("f").fieldIndex("strength")))
  }

  test("pageHinkleyInt: hand-traced first steps") {
    // values 4, 8 with δ = 0: step1 m = 0; step2 running mean = 6,
    // term = (1e6·(2·8 − 12)) div 2 = 2e6 → m = 2e6, min stays 0
    val df = Seq(("k", 1L, 4L), ("k", 2L, 8L)).toDF("k", "t", "v")
    val out = TimeSeriesOps.pageHinkleyInt(df, Seq(col("k")), col("t"),
      col("v"), deltaMicro = 0L, lambdaMicro = 1000000L)
      .orderBy(col("order")).collect()
    assert(out.map(_.getAs[Long]("m_u")).toSeq == Seq(0L, 2000000L))
    assert(out.map(_.getAs[Long]("min_m_u")).toSeq == Seq(0L, 0L))
    assert(out.map(_.getAs[Long]("ph_u")).toSeq == Seq(0L, 2000000L))
    assert(out.map(_.getAs[Boolean]("alarm")).toSeq == Seq(false, true))
  }

  test("A8: lttbDownsample — endpoints kept, spikes survive decimation") {
    import org.apache.spark.sql.functions._
    // flat series with one spike at t=10: any averaging downsampler
    // flattens it; LTTB must keep it (largest triangle in its bucket)
    val series = (1L to 20L).map(t => (t, if (t == 10L) 1000L else 0L))
      .toDF("t", "y")
    val out = graft.ops.TimeSeriesOps.lttbDownsample(
        series, col("t"), col("y"), nBuckets = 3)
      .orderBy(col("sel_order"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.length == 5)
    assert(out.head == (1L, 0L) && out.last == (20L, 0L))
    assert(out.contains((10L, 1000L)), s"spike lost: ${out.toSeq}")
  }

  test("A8: hurstRS — linear trend is persistent (H near 1), alternation anti-persistent") {
    import org.apache.spark.sql.functions._
    // pure trend: within every block the rescaled range grows ~n,
    // so the log-log slope approaches 1
    val trend = (1L to 256L).map(t => (t, 10L * t)).toDF("t", "y")
    val ht = graft.ops.TimeSeriesOps.hurstRS(
        trend, col("t"), col("y"), Seq(8, 16, 32, 64))
      .collect()
    assert(ht.length == 4)
    val h = ht.head.getAs[Double]("hurst")
    assert(ht.forall(_.getAs[Double]("hurst") == h), "hurst repeated per row")
    assert(h > 0.9, s"trend hurst was $h")
    // strict alternation: the cumulative deviation is bounded by one
    // step, so R/S barely grows with n — H near 0
    val alt = (1L to 256L).map(t => (t, if (t % 2 == 0) 10L else 0L))
      .toDF("t", "y")
    val ha = graft.ops.TimeSeriesOps.hurstRS(
        alt, col("t"), col("y"), Seq(8, 16, 32, 64))
      .collect().head.getAs[Double]("hurst")
    assert(ha < 0.2, s"alternation hurst was $ha")
  }

  test("A8: hurstRS — partial blocks dropped, single-n fit is null, constant series empty") {
    import org.apache.spark.sql.functions._
    // 20 points, blocks of 8: ranks 1..16 form 2 full blocks, the
    // 4-point tail is dropped; a single block size cannot be fit
    val s20 = (1L to 20L).map(t => (t, t % 5)).toDF("t", "y")
    val out = graft.ops.TimeSeriesOps.hurstRS(
      s20, col("t"), col("y"), Seq(8)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_blocks") == 2L)
    assert(out.head.isNullAt(out.head.fieldIndex("hurst")))
    // constant series: every block has zero variance -> nothing to fit
    val const = (1L to 64L).map(t => (t, 7L)).toDF("t", "y")
    assert(graft.ops.TimeSeriesOps.hurstRS(
      const, col("t"), col("y"), Seq(8, 16)).count() == 0L)
  }

  test("A8: sesGridFit — hand SSE per alpha, tie-min best, constant series all-zero") {
    import org.apache.spark.sql.functions._
    // series 4, 8, 4 at den=4: one-step errors from the q156 integer
    // recursion — num=1: s=(4,5) → sse 16+1; num=2: s=(4,6) → 16+4;
    // num=3: s=(4,7) → 16+9
    val s3 = Seq((1L, 4L), (2L, 8L), (3L, 4L)).toDF("t", "v")
    val out = graft.ops.TimeSeriesOps.sesGridFit(
        s3, col("t"), col("v"), den = 4L)
      .orderBy("num").collect()
    assert(out.map(_.getAs[Long]("sse")).toSeq == Seq(17L, 20L, 25L))
    assert(out.map(_.getAs[Long]("n_scored")).toSeq == Seq(2L, 2L, 2L))
    assert(out.map(_.getAs[Boolean]("best")).toSeq ==
      Seq(true, false, false))
    // constant series: zero error everywhere; the tie breaks to the
    // smallest alpha
    val const = (1L to 10L).map(t => (t, 5L)).toDF("t", "v")
    val oc = graft.ops.TimeSeriesOps.sesGridFit(
        const, col("t"), col("v"), den = 20L)
      .collect()
    assert(oc.length == 19)
    assert(oc.forall(_.getAs[Long]("sse") == 0L))
    assert(oc.filter(_.getAs[Boolean]("best"))
      .map(_.getAs[Long]("num")).toSeq == Seq(1L))
  }

  test("A8: saxSymbolize — hand quartile word, partial-segment drop, tie degeneracy") {
    import org.apache.spark.sql.functions._
    // one series, segLen 2: values 1,1,2,2,3,3,4,4 → segment sums
    // 2,4,6,8; quartile breakpoints at ranks 1,2,3 → 2,4,6 → "abcd".
    // A 9th point leaves a partial segment that must be dropped.
    val s = ((1L to 8L).zip(Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L)) :+
      ((9L, 99L))).map { case (t, v) => ("s", t, v) }.toDF("k", "t", "v")
    val out = graft.ops.TimeSeriesOps.saxSymbolize(
      s, col("k"), col("t"), col("v"), segLen = 2).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("sax_word") == "abcd")
    assert(out(0).getAs[Long]("n_segments") == 4L)
    // all-equal series: every sum equals every breakpoint → all 'a'
    val const = (1L to 8L).map(t => ("c", t, 5L)).toDF("k", "t", "v")
    val oc = graft.ops.TimeSeriesOps.saxSymbolize(
      const, col("k"), col("t"), col("v"), segLen = 2).collect()
    assert(oc(0).getAs[String]("sax_word") == "aaaa")
  }
  test("A8: thetaForecast — exact-linear series, constant series fixed point") {
    import org.apache.spark.sql.functions._
    // y = 2i: bm = 2e6, am = 0; SES of theta2 walks 2e6 -> 8.125e6;
    // h=1 forecast = (12e6 + 8125000) div 2 = 10062500
    val lin = (1L to 5L).map(i => (i, 2L * i)).toDF("t", "v")
    val out = graft.ops.TimeSeriesOps.thetaForecast(
      lin, col("t"), col("v"), horizon = 2).collect()
    assert(out(0).getAs[Long]("trend_micro") == 12000000L)
    assert(out(0).getAs[Long]("ses_level_micro") == 8125000L)
    assert(out(0).getAs[Long]("forecast_micro") == 10062500L)
    assert(out(0).getAs[Double]("forecast") == 10.0625)
    assert(out(1).getAs[Long]("trend_micro") == 14000000L)
    // constant series: trend flat at c, theta2 level c -> forecast c
    val const = (1L to 6L).map(i => (i, 7L)).toDF("t", "v")
    val oc = graft.ops.TimeSeriesOps.thetaForecast(
      const, col("t"), col("v"), horizon = 3).collect()
    assert(oc.forall(_.getAs[Long]("forecast_micro") == 7000000L))
    assert(oc.forall(_.getAs[Double]("forecast") == 7.0))
  }
  test("A5/A8: holtWintersForecast — pure season reproduced exactly, constant fixed point") {
    import org.apache.spark.sql.functions._
    // alternating 10/20 with m=2: residuals are identically zero, so
    // the forecast IS the seasonal profile
    val seas = (0L to 13L).map(t => (t, 10L + (t % 2) * 10L)).toDF("t", "v")
    val out = graft.ops.TimeSeriesOps.holtWintersForecast(
      seas, col("t"), col("v"), m = 2, aNum = 1, aDen = 5,
      bNum = 1, bDen = 10, scale = 1000, horizon = 4).collect()
    assert(out.forall(_.getAs[Long]("level_s") == 0L))
    assert(out.forall(_.getAs[Long]("trend_s") == 0L))
    // tn = 13: h=1 -> t=14 (even -> 10), h=2 -> t=15 (odd -> 20)
    assert(out.map(_.getAs[Double]("forecast")).toSeq ==
      Seq(10.0, 20.0, 10.0, 20.0))
    val const = (0L to 9L).map(t => (t, 5L)).toDF("t", "v")
    val oc = graft.ops.TimeSeriesOps.holtWintersForecast(
      const, col("t"), col("v"), m = 2, aNum = 1, aDen = 5,
      bNum = 1, bDen = 10, scale = 1000, horizon = 3).collect()
    assert(oc.forall(_.getAs[Double]("forecast") == 5.0))
  }
  test("A5/A8: forecastBacktest — constant series scores zero, naive ratio sane") {
    import org.apache.spark.sql.functions._
    // constant series: theta forecasts exactly 7 -> zero errors
    val const = (1L to 20L).map(t => (t, 7L)).toDF("t", "v")
    val out = graft.ops.TimeSeriesOps.forecastBacktest(
      const, col("t"), col("v"), splitT = 15L, horizon = 5).collect()
    assert(out.length == 5)
    assert(out.forall(_.getAs[Long]("ae_micro") == 0L))
    assert(out.forall(_.getAs[Long]("wape_ppm") == 0L))
    assert(out.forall(_.getAs[Long]("mase_ppm") == 0L))
    // a linear series: theta extrapolates the trend, naive stays at the
    // last train value -> theta must beat naive (mase < 1e6)
    val lin = (1L to 20L).map(t => (t, 10L * t)).toDF("t", "v")
    val o2 = graft.ops.TimeSeriesOps.forecastBacktest(
      lin, col("t"), col("v"), splitT = 15L, horizon = 5).collect()
    assert(o2.forall(_.getAs[Long]("mase_ppm") < 1000000L))
    assert(o2.map(_.getAs[Long]("t")).toSeq == (16L to 20L))
  }
  test("A5/A8: volatilityMetrics — flat bars are zero, hand single-bar Parkinson") {
    import org.apache.spark.sql.functions._
    // constant price: H=L, C=O -> both vols 0; returns 0 -> amihud 0
    val flat = (1L to 5L).map(b => (b, 100L, 100L, 100L, 100L, 1000L))
      .toDF("bin", "o", "h", "l", "c", "v")
    val r0 = graft.ops.TimeSeriesOps.volatilityMetrics(flat, col("bin"),
      col("o"), col("h"), col("l"), col("c"), col("v")).collect()(0)
    assert(r0.getAs[Double]("parkinson_vol") == 0.0)
    assert(r0.getAs[Double]("gk_vol") == 0.0)
    assert(r0.getAs[Long]("amihud_npc") == 0L)
    // one bar, H/L = e (lhl = 1e6), C = O: parkinson = sqrt(1/(4ln2)),
    // gk = sqrt(0.5)
    val e6 = math.round(math.E * 1e6)
    val one = Seq((1L, 1000000L, e6, 1000000L, 1000000L, 500L))
      .toDF("bin", "o", "h", "l", "c", "v")
    val r1 = graft.ops.TimeSeriesOps.volatilityMetrics(one, col("bin"),
      col("o"), col("h"), col("l"), col("c"), col("v")).collect()(0)
    val lhl = math.floor(math.log(e6.toDouble / 1e6) * 1e6 + 0.5)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getAs[Double]("parkinson_vol") ==
      r6(math.sqrt(lhl * lhl / 1e12 / 2.772588722239781)))
    assert(r1.getAs[Double]("gk_vol") ==
      r6(math.sqrt(lhl * lhl * 500000 / 1e18)))
  }

  test("forecastCvRolling: one fold equals the backtest; pooling is exact") {
    val series = (0L until 40L).map(t => ("s", t, 100L + t * 3 + (t % 5)))
      .toDF("g", "t", "v").drop("g")
    val bt = graft.ops.TimeSeriesOps.forecastBacktest(series, col("t"),
      col("v"), splitT = 30L, horizon = 5).collect()
    val cv1 = graft.ops.TimeSeriesOps.forecastCvRolling(series, col("t"),
      col("v"), splits = Seq(30L), horizon = 5).collect()
    assert(cv1.map(r => (r.getLong(1), r.getLong(4), r.getLong(8))).toSeq ==
      bt.map(r => (r.getLong(0), r.getLong(3), r.getLong(7))).toSeq)
    // with one fold the pooled CV MASE is the fold MASE
    assert(cv1.forall(r => r.getLong(9) == r.getLong(8)))
    // two folds: pooled MASE = sum(ae) over both // sum(naive) over both
    val cv2 = graft.ops.TimeSeriesOps.forecastCvRolling(series, col("t"),
      col("v"), splits = Seq(25L, 30L), horizon = 5).collect()
    val cae = cv2.map(_.getLong(5)).sum
    val cnae = cv2.map(_.getLong(6)).sum
    assert(cv2.forall(_.getLong(9) == cae * 1000000L / math.max(cnae, 1L)))
    assert(cv2.map(_.getInt(0)).toSet == Set(1, 2))
  }

  test("ar2YuleWalker: matches an exact-arithmetic replay; degenerates to null") {
    // an AR(2)-flavored integer series with a clear lag-1 structure
    val vals = Seq(10L, 14L, 18L, 15L, 11L, 9L, 12L, 16L, 17L, 13L,
      10L, 12L, 15L, 18L, 14L)
    val df = vals.zipWithIndex.map { case (v, t) => ("k", t.toLong, v) }
      .toDF("g", "t", "v")
    val out = graft.ops.TimeSeriesOps.ar2YuleWalker(df, Seq(col("g")),
      col("t"), col("v")).head()
    // exact replay: c_i = n·v_i − S in BigInt, then the same pinned
    // IEEE finish (BigInt.toDouble is correctly rounded, like the
    // engine's DECIMAL(38,0) → DOUBLE cast)
    val n = vals.length
    val s = vals.sum
    val c = vals.map(v => BigInt(n) * v - s)
    val den = c.map(x => x * x).sum
    val num1 = c.zip(c.tail).map { case (a, b) => a * b }.sum
    val num2 = c.zip(c.drop(2)).map { case (a, b) => a * b }.sum
    val r1 = num1.toDouble / den.toDouble
    val r2 = num2.toDouble / den.toDouble
    val phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
    val phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val mu = s.toDouble / n.toDouble
    assert(out.getAs[Long]("n") == n.toLong)
    assert(out.getAs[Double]("r1") == r1)
    assert(out.getAs[Double]("r2") == r2)
    assert(out.getAs[Double]("phi1") == phi1)
    assert(out.getAs[Double]("phi2") == phi2)
    assert(out.getAs[Double]("innov_share") == 1.0 - phi1 * r1 - phi2 * r2)
    assert(out.getAs[Double]("forecast") ==
      mu + phi1 * (vals(n - 1) - mu) + phi2 * (vals(n - 2) - mu))
    // constant series and too-short series yield nulls, never NaNs
    val const = Seq(("c", 0L, 5L), ("c", 1L, 5L), ("c", 2L, 5L),
      ("s", 0L, 1L), ("s", 1L, 2L)).toDF("g", "t", "v")
    graft.ops.TimeSeriesOps.ar2YuleWalker(const, Seq(col("g")),
      col("t"), col("v")).collect().foreach { r =>
      assert(r.isNullAt(r.fieldIndex("phi1")), r.getAs[String]("g"))
      assert(r.isNullAt(r.fieldIndex("forecast")))
    }
  }
}
