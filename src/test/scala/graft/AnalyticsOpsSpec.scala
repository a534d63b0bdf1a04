package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Aggregates, Binning, Dominance, EventAnalytics, Ranking, TimeSeriesOps}
import graft.ext.Graph

/** Specs for the order-statistics / graph analytics ops behind
  * q125-q130: skyline dominance, CUSUM flags, exact distributed
  * ranking + qcut, triangle counts, last-touch attribution. */
class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("skyline2D: textbook frontier — duplicates survive, dominated rows drop") {
    // minimize x, maximize y
    val df = Seq(
      (1L, 1L, 10.0), // frontier (cheapest)
      (2L, 2L, 10.0), // dominated by id 1 (worse x, same y)
      (3L, 2L, 12.0), // frontier (better y than anything cheaper)
      (4L, 3L, 12.0), // dominated by id 3
      (5L, 3L, 15.0), // frontier
      (6L, 3L, 15.0), // duplicate point of id 5 — neither dominates
      (7L, 4L, 14.0)) // dominated by 5/6
      .toDF("id", "x", "y")
    val out = Dominance.skyline2D(df, "x", "y")
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L, 5L, 6L))
  }

  test("law: skyline2D equals the brute-force dominance filter") {
    val pts = Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 12L), Gen.chooseNum(0, 20)))
      .apply(Gen.Parameters.default, Seed(7L)).get
      .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y.toDouble) }
    val df = pts.toDF("id", "x", "y")
    val expected = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y) }
    }.map(_._1).sorted
    val got = Dominance.skyline2D(df, "x", "y")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == expected)
  }

  test("cusumFlags: constant series never flags; a level shift does") {
    val flat = (1 to 40).map(i => ("a", ts(f"2024-01-01 10:${i % 60}%02d:00"), i.toLong, 5.0))
    val shifted = (1 to 20).map(i => ("b", ts(f"2024-01-01 10:$i%02d:00"), i.toLong, 1.0)) ++
      (21 to 40).map(i => ("b", ts(f"2024-01-01 10:$i%02d:00"), i.toLong, 9.0))
    val df = (flat ++ shifted).toDF("g", "t", "id", "v")
    val flags = EventAnalytics.cusumFlags(df, "g", "t", "id", "v")
    assert(flags.columns.toSeq == Seq("g", "k", "id"))
    val byKey = flags.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(!byKey.contains("a"), s"constant series flagged: $byKey")
    assert(byKey.getOrElse("b", 0L) > 0, "level shift not flagged")
    // the deepest excursion of the shift series is around the midpoint
    val ks = flags.filter(col("g") === "b").select("k").as[Long].collect()
    assert(ks.contains(20L) || ks.contains(21L))
  }

  test("globalRowNumber matches the single-partition row_number") {
    val data = Gen.listOfN(500, Gen.zip(Gen.chooseNum(0, 99), Gen.chooseNum(0L, 10000L)))
      .apply(Gen.Parameters.default, Seed(11L)).get
      .zipWithIndex.map { case ((v, _), i) => (i.toLong, v) }
    val df = data.toDF("id", "v").repartition(16)
    val got = Ranking.globalRowNumber(df, Seq(col("v"), col("id")))
      .select("id", "row_num").as[(Long, Long)].collect().toMap
    val expected = data.sortBy { case (id, v) => (v, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got == expected)
  }

  test("qcut: bucket sizes differ by at most one and bins are value-ordered") {
    val df = (1 to 103).map(i => (i.toLong, (i * 37 % 101).toDouble)).toDF("id", "v")
    val out = Binning.qcut(df, "v", "id", 10)
      .groupBy("bin").agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("bin").collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 10))
    val sizes = out.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"sizes: ${sizes.toSeq}")
    assert(sizes.sum == 103)
    // non-overlapping value ranges in bin order
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2)) // hi(bin) <= lo(bin+1)
    }
  }

  test("triangleCounts: K4 has four triangles, three per node") {
    val k4 = for { u <- 1 to 4; v <- 1 to 4 if u < v } yield (u.toLong, v.toLong)
    val out = Graph.triangleCounts(k4.toDF("u", "v"), "u", "v")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: stars are triangle-free; mirrors/self-loops collapse") {
    val star = (2 to 6).map(v => (1L, v.toLong))
    assert(Graph.triangleCounts(star.toDF("u", "v"), "u", "v").count() == 0)
    // one triangle given redundantly: both directions + a self loop
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L))
    val out = Graph.triangleCounts(messy.toDF("u", "v"), "u", "v")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("lastTouchAttribution: strict precedence, ignore-nulls carry, (none) fallback") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:05:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:10:00"), 3L, "purchase"),  // credits click
      (1L, ts("2024-01-01 10:15:00"), 4L, "purchase"),  // still click (purchases don't touch)
      (2L, ts("2024-01-01 09:00:00"), 5L, "purchase"),  // nothing before -> (none)
      (2L, ts("2024-01-01 09:30:00"), 6L, "view"),
      (2L, ts("2024-01-01 09:30:00"), 7L, "purchase"))  // tie ts: event_id 6 precedes -> view
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.lastTouchAttribution(
        df, "user_id", "ts", "event_id", "event_type", "purchase")
      .as[(String, Long, Long)].collect().toMap2
    assert(out == Map("click" -> (2L, 1L), "(none)" -> (1L, 1L), "view" -> (1L, 1L)))
  }

  private implicit class Tuple3Ops(rows: Array[(String, Long, Long)]) {
    def toMap2: Map[String, (Long, Long)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("twap: hold-until-next weighting, no extrapolation past the last value") {
    // 10.0 held 10s, 20.0 held 5s, 99.0 held nothing -> (100+100)/15
    val df = Seq(
      (7L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      (7L, ts("2024-01-01 10:00:10"), 2L, 20.0),
      (7L, ts("2024-01-01 10:00:15"), 3L, 99.0),
      (8L, ts("2024-01-01 10:00:00"), 4L, 50.0)) // single obs: no interval
      .toDF("user_id", "ts", "event_id", "value")
    val out = graft.ops.TimeSeriesOps.twap(df, "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 1)
    val (uid, n, span, v) = out.head
    assert(uid == 7L && n == 2L && span == 15000000L)
    assert(math.abs(v - 40.0 / 3) < 1e-12)
  }

  test("ohlcBars: deterministic open/close under same-timestamp ties") {
    val df = Seq(
      (ts("2024-01-01 10:00:00"), 1L, 5.0),  // bin A open (tie broken by id)
      (ts("2024-01-01 10:00:00"), 2L, 9.0),
      (ts("2024-01-01 10:30:00"), 3L, 1.0),
      (ts("2024-01-01 10:59:00"), 4L, 7.0),  // bin A close
      (ts("2024-01-01 11:00:00"), 5L, 3.0))  // bin B: single row
      .toDF("ts", "event_id", "value")
    val out = graft.ops.TimeSeriesOps.ohlcBars(df, "ts", "event_id", "value",
        3600000000L)
      .orderBy("bin").collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(out.toSeq == Seq((5.0, 9.0, 1.0, 7.0, 4L), (3.0, 3.0, 3.0, 3.0, 1L)))
  }

  test("pmiCollocations: planted collocation wins; hapax pairs die at min count") {
    // every adjacency except "zig zag" (10×) and "the the" (diffuse,
    // low PMI) is unique, so min_count = 5 leaves exactly two pairs
    // and the perfectly-associated rare one must rank first
    val docs = (1 to 10).map(i =>
      (i.toLong, s"a$i zig zag b$i the the c$i"))
    val out = graft.ext.TextAnalysis.pmiCollocations(
        docs.toDF("doc_id", "text"), "text", minCount = 5, topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.map(t => (t._1, t._2)).toSeq == Seq(("zig", "zag"), ("the", "the")))
    assert(out.head._3 == 10L)
  }

  test("kCore: K4 survives 3-core peeling; pendant chain peels away") {
    val k4 = for { u <- 1 to 4; v <- 1 to 4 if u < v } yield (u.toLong, v.toLong)
    val chain = Seq((4L, 5L), (5L, 6L)) // degree-1/2 tail
    val out = Graph.kCore((k4 ++ chain).toDF("u", "v"), "u", "v", k = 3, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kTruss: K4 is a 4-truss; K4 minus an edge cascades to empty") {
    val k4 = for { u <- 1 to 4; v <- 1 to 4 if u < v } yield (u.toLong, v.toLong)
    val full = Graph.kTruss(k4.toDF("u", "v"), "u", "v", k = 4, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(full.size == 6 && full.values.forall(_ == 2L))
    // drop (3,4): only (1,2) keeps support 2 in round 1, then its last
    // triangles are gone and round 2 peels it too
    val broken = k4.filterNot(_ == ((3L, 4L)))
    val out = Graph.kTruss(broken.toDF("u", "v"), "u", "v", k = 4, rounds = 2)
    assert(out.count() == 0L)
  }

  test("kTruss: k=3 keeps exactly the triangle-supported edges") {
    // a triangle plus a pendant edge: the pendant has no triangle
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val out = Graph.kTruss(edges.toDF("u", "v"), "u", "v", k = 3, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 2L) -> 1L, (2L, 3L) -> 1L, (1L, 3L) -> 1L))
  }

  test("gumbelFit: hand moments over block maxima {10, 20, 30}") {
    val df = Seq((1L, 5L), (1L, 10L), (2L, 20L), (3L, 30L), (3L, 7L))
      .toDF("b", "v")
    val r = Aggregates.gumbelFit(df, col("b"), col("v"), threshold = 25L)
      .head()
    assert(r.getAs[Long]("n_blocks") == 3L)
    assert(r.getAs[Double]("mean") == 20.0)
    assert(r.getAs[Double]("sd") == 10.0)
    val beta = 10.0 * 0.7796968012336293
    val mu = 20.0 - 0.5772156649015329 * beta
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("beta") == r6(beta))
    assert(r.getAs[Double]("mu") == r6(mu))
    assert(r.getAs[Double]("p_exceed") ==
      r6(1.0 - math.exp(-math.exp((mu - 25.0) / beta))))
  }

  test("containmentPairs: directional — the excerpt is contained, the source is not") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta"), // full prefix excerpt of 1
      (3L, "iota kappa lambda mu nu xi"))
      .toDF("doc_id", "text")
    val out = graft.ext.Dedup.containmentPairs(docs, "text", "doc_id",
        shingleSize = 2, tNum = 9, tDen = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 1L))) // 2 ⊆ 1; 1 ⊄ 2; 3 unrelated
  }

  test("law: containmentPairs equals brute-force directional containment") {
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = Gen.listOfN(20, Gen.listOfN(8, Gen.chooseNum(0, 7)))
      .apply(Gen.Parameters.default, Seed(23L)).get
      .zipWithIndex.map { case (ws, i) => (i.toLong, ws.map(vocab).mkString(" ")) }
    def shingles(t: String) = t.split(" ").sliding(2).map(_.mkString(" ")).toSet
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia != ib
      sa = shingles(ta); inter = (sa & shingles(tb)).size
      if inter * 2 >= sa.size // t = 1/2
    } yield (ia, ib)).toSet
    val got = graft.ext.Dedup.containmentPairs(docs.toDF("doc_id", "text"),
        "text", "doc_id", shingleSize = 2, tNum = 1, tDen = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("stupidBackoffScore: seen bigram scores c(ab)/c(a.); unseen backs off") {
    val model = Seq((10L, "a b c")).toDF("doc_id", "text")
    val probe = Seq((1L, "a b x")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.stupidBackoffScore(model, probe, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // "a b": ln(1/1)=0; "b x": x is OOV -> ln(0.4*(0+1)/(3+3)) = ln(1/15)
    val expected = (0.0 + math.round(math.log(1.0 / 15) * 1e6)) / 2 / 1e6
    assert(out.toSeq == Seq((1L, 2L, BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("intervalOverlapJoin: half-open semantics, cross-cell dedup-by-arithmetic") {
    val a = Seq((1L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:30:00")))
      .toDF("k", "id", "s", "e")
    val b = Seq(
      (1L, 20L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")), // overlaps, shares 2 cells
      (1L, 21L, ts("2024-01-01 11:30:00"), ts("2024-01-01 12:30:00")), // touches only: no
      (2L, 22L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:00:00"))) // other key: no
      .toDF("k", "id", "s", "e")
    val out = graft.ops.TimeSeriesOps.intervalOverlapJoin(
        a, b, "k", "id", "s", "e", 1800000000L) // 30-min cells
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 10L, 20L))) // exactly once despite 2 shared cells
  }

  test("topPaths: consecutive triples only, deterministic ranking") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "v"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "c"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "p"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "v"),
      (2L, ts("2024-01-01 10:00:00"), 5L, "v"),
      (2L, ts("2024-01-01 10:01:00"), 6L, "c"),
      (2L, ts("2024-01-01 10:02:00"), 7L, "p"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.topPaths(df, "user_id", "ts", "event_id",
        "event_type", topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(("v", "c", "p", 2L), ("c", "p", "v", 1L)))
  }

  test("rollingActives: trailing window counts distinct, not events; span is capped") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:30:00")), // same (user, hour)
      (2L, ts("2024-01-01 11:15:00")),
      (1L, ts("2024-01-01 13:05:00")))
      .toDF("user_id", "ts")
    val out = EventAnalytics.rollingActives(df, "user_id", "ts", 3, 3600000000L)
      .orderBy("w").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val h0 = ts("2024-01-01 10:00:00").getTime * 1000L / 3600000000L
    // w=h0: {1}; h0+1: {1,2}; h0+2: {1,2}; h0+3: {2,1}; beyond max hour: absent
    assert(out == Map(h0 -> 1L, (h0 + 1) -> 2L, (h0 + 2) -> 2L, (h0 + 3) -> 2L))
  }

  test("giniConcentration: uniform counts score 0; domination approaches 1") {
    val uniform = (1 to 10).flatMap(u => Seq.fill(5)(("u", u.toLong)))
    val skewed = Seq.fill(96)(("s", 1L)) ++ (2 to 5).map(u => ("s", u.toLong))
    val df = (uniform ++ skewed).toDF("k", "actor")
    val out = EventAnalytics.giniConcentration(df, "k", "actor")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("u") == 0.0)
    // exact: n=5, counts asc (1,1,1,1,96), sum=100, s=1+2+3+4+480=490
    // gini = (980 - 600) / 500 = 0.76
    assert(out("s") == 0.76)
  }

  test("tokenEntropy: uniform distribution hits ln(k); repetition scores lower") {
    val docs = Seq(
      ("flat", "a b c d"),          // 4 distinct -> H = ln 4
      ("rep", "a a a b"))           // skewed -> H < ln 2... exact below
      .toDF("key", "text")
    val out = graft.ext.TextAnalysis.tokenEntropy(docs, "text", "key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .map(t => t._1 -> t).toMap
    assert(out("flat")._2 == 4 && out("flat")._3 == 4)
    assert(math.abs(out("flat")._4 - math.log(4)) < 1e-5)
    // H = -(3/4 ln 3/4 + 1/4 ln 1/4)
    val expected = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(out("rep")._4 - expected) < 1e-5)
  }

  test("cohortValueCurve: cents accumulate along k; quiet days carry forward") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view", 0.0),
      (1L, ts("2024-01-01 11:00:00"), "purchase", 10.50),
      (1L, ts("2024-01-03 11:00:00"), "purchase", 4.50), // k=2; k=1 quiet
      (2L, ts("2024-01-01 09:00:00"), "view", 0.0))      // same cohort, never buys
      .toDF("user_id", "ts", "event_type", "value")
    val out = EventAnalytics.cohortValueCurve(df, "user_id", "ts", "value",
        "event_type", "purchase", maxDays = 3)
      .orderBy("k").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // cohort of 2 users; cumulative 10.50, 10.50, 15.00, 15.00 over k=0..3
    assert(out.toSeq == Seq((0L, 2L, 5.25), (1L, 2L, 5.25), (2L, 2L, 7.5), (3L, 2L, 7.5)))
  }

  test("pairRules: confidence is directional, lift symmetric, support gates") {
    // baskets: {a,b} x3, {a} x1, {b,c} x1 -> pair (a,b) support 3
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"),
      (4L, "a"), (5L, "b"), (5L, "c"))
    val out = graft.ops.Associations.pairRules(rows.toDF("b", "i"), "b", "i", 2)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // n_a = 4, n_b = 4, n_ab = 3, N = 5
    assert(out(("a", "b")) == ((3L, 4L, 0.75, 3.0 * 5 / 16)))
    assert(out(("b", "a")) == ((3L, 4L, 0.75, 3.0 * 5 / 16)))
    assert(!out.contains(("b", "c"))) // support 1 < 2
  }

  test("weightedMedian: crossing at half the total weight, lower convention") {
    // values 1(w=1), 2(w=1), 3(w=10): W=12, crossing at cumw>=6 -> 3
    val df = Seq((1L, 1.0, 1L), (2L, 2.0, 1L), (3L, 3.0, 10L)).toDF("id", "v", "wt")
    val out = Aggregates.weightedMedian(df, Seq(lit(1).as("g")), col("v"),
        col("wt"), Seq(col("id")))
      .collect().map(r => (r.getDouble(1), r.getLong(2)))
    assert(out.toSeq == Seq((3.0, 12L)))
    // uniform weights reduce to the plain lower median
    val df2 = Seq((1L, 1.0, 1L), (2L, 2.0, 1L), (3L, 3.0, 1L), (4L, 4.0, 1L))
      .toDF("id", "v", "wt")
    val out2 = Aggregates.weightedMedian(df2, Seq(lit(1).as("g")), col("v"),
        col("wt"), Seq(col("id")))
      .collect().map(_.getDouble(1))
    assert(out2.toSeq == Seq(2.0))
  }

  test("applyCdc: latest op wins, deletes drop, untouched and inserts pass") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "bal")
    val delta = Seq(
      (1L, 1L, "U", 11.0), (1L, 2L, "D", 0.0),   // delete is latest -> key 1 drops
      (2L, 1L, "D", 0.0), (2L, 2L, "U", 22.0),   // upsert is latest -> key 2 updates
      (9L, 1L, "U", 99.0))                        // pure insert
      .toDF("k", "seq", "op", "new_bal")
    val out = graft.ops.Dimensions.applyCdc(base, delta, "k", Seq(col("seq")), "op")
      .select("k", "bal", "new_bal").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out == Map(
      2L -> ((Some(20.0), Some(22.0))),  // updated
      3L -> ((Some(30.0), None)),        // untouched
      9L -> ((None, Some(99.0)))))       // inserted
  }

  test("windowedFunnelReachTimes: in-window advances, out-of-window stalls") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),    // within 30 min
      (1L, ts("2024-01-01 10:20:00"), "purchase"), // within 30 min of click
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 11:00:00"), "click"),    // 60 min: too late
      (2L, ts("2024-01-01 11:05:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.windowedFunnelReachTimes(df, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"), withinSeconds = 1800)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), !r.isNullAt(1), !r.isNullAt(2), !r.isNullAt(3)))
    assert(out.toSeq == Seq((1L, true, true, true), (2L, true, false, false)))
  }

  test("mannWhitneyU: hand case with a tie run — doubled ranks stay exact") {
    // A = {1, 2}, B = {2, 3}: ranks 1, 2.5, 2.5, 4 -> R_A = 3.5, U_A = 0.5
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 3.0)).toDF("g", "v")
    val out = Aggregates.mannWhitneyU(df, col("v"), col("g"), "A", "B")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((2L, 2L, 1L, 1.0 / 4 - 1))) // u2_a = 2*U_A = 1
  }

  test("chiSquare: exact independence scores zero; dependence is positive") {
    val indep = Seq.fill(10)(("a", 0)) ++ Seq.fill(10)(("a", 1)) ++
      Seq.fill(10)(("b", 0)) ++ Seq.fill(10)(("b", 1))
    val o1 = Aggregates.chiSquare(indep.toDF("r", "c"), col("r"), col("c"))
      .collect().head
    assert(o1.getDouble(0) == 0.0 && o1.getLong(1) == 1L && o1.getLong(2) == 40L)
    val dep = Seq.fill(10)(("a", 0)) ++ Seq.fill(10)(("b", 1))
    val o2 = Aggregates.chiSquare(dep.toDF("r", "c"), col("r"), col("c"))
      .collect().head
    assert(o2.getDouble(0) == 20.0) // 2x2 perfect association: chi2 = n
  }

  test("weightedQuantile: p10/p90 crossings under unit weights") {
    val df = (1 to 10).map(i => (i.toLong, i.toDouble, 1L)).toDF("id", "v", "wt")
    def q(num: Long) = Aggregates.weightedQuantile(df, Seq(lit(1).as("g")),
      col("v"), col("wt"), Seq(col("id")), num, 10).collect().head.getDouble(1)
    assert(q(1) == 1.0 && q(5) == 5.0 && q(9) == 9.0 && q(10) == 10.0)
  }

  test("ksTest: hand case — D from the integer crossing quantity") {
    // A = {1, 2}, B = {2, 3}: F_A = 1/2, 1, 1; F_B = 0, 1/2, 1
    // → max|F_A − F_B| = 1/2 at v = 1 (and v = 2); d_num = 2, nA·nB = 4
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 3.0)).toDF("g", "v")
    val out = Aggregates.ksTest(df, col("v"), col("g"), "A", "B")
      .collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getDouble(3)) ==
      ((2L, 2L, 2L, 0.5)))
  }

  test("ksTest: identical samples give D = 0") {
    val df = Seq(("A", 1.0), ("A", 5.0), ("B", 1.0), ("B", 5.0)).toDF("g", "v")
    assert(Aggregates.ksTest(df, col("v"), col("g"), "A", "B")
      .collect().head.getLong(2) == 0L)
  }

  test("bfsHops: exact hops within the round budget, absent beyond") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val out = Graph.bfsHops(edges, "a", "b", seeds, "node", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // 4 is 3 hops away (beyond 2 rounds); 5/6 are disconnected
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("bfsHops: multi-source takes the nearer seed; seed set wins at 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 3L)).toDF("a", "b")
    val seeds = Seq(Tuple1(1L), Tuple1(4L)).toDF("node")
    val out = Graph.bfsHops(edges, "a", "b", seeds, "node", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("diameterTwoSweep: exact on a path (seed mid-path still finds the true ends)") {
    // path 3-1-2-4-5 relabeled so the min-id seed (1) sits mid-path:
    // ecc(1) = 3 (to 5); far1 = 5; ecc(5) = 4 = the true diameter
    val edges = Seq((3L, 1L), (1L, 2L), (2L, 4L), (4L, 5L)).toDF("a", "b")
    val r = Graph.diameterTwoSweep(edges, "a", "b", rounds = 6)
      .collect()(0)
    assert(r.getAs[Long]("seed_node") == 1L)
    assert(r.getAs[Long]("far_node_1") == 5L)
    assert(r.getAs[Long]("ecc_1") == 3L)
    assert(r.getAs[Long]("far_node_2") == 3L)
    assert(r.getAs[Long]("diameter_lb") == 4L)
    // the law the heuristic rests on: sweep 2 never shrinks the bound
    assert(r.getAs[Long]("diameter_lb") >= r.getAs[Long]("ecc_1"))
  }

  test("ewmaInt: hand recurrence with floor division; negatives raise") {
    val df = Seq(("k", 1L, 4L), ("k", 2L, 8L), ("k", 3L, 4L))
      .toDF("g", "t", "v")
    val out = TimeSeriesOps.ewmaInt(df, Seq(col("g")), col("t"),
        col("v"), 1, 4)
      .orderBy("order").select("ewma").as[Long].collect().toSeq
    // s1 = 4; s2 = (8 + 3·4) div 4 = 5; s3 = (4 + 3·5) div 4 = 4
    assert(out == Seq(4L, 5L, 4L))
    val neg = Seq(("k", 1L, -1L)).toDF("g", "t", "v")
    val e = intercept[Exception] {
      TimeSeriesOps.ewmaInt(neg, Seq(col("g")), col("t"),
        col("v"), 1, 4).collect()
    }
    assert(e.getMessage.contains("non-negative"))
  }

  test("holtInt: hand recurrence; constant series has zero trend forever") {
    // ramp 10, 20, 30 with α=1/5, β=1/10, S=1000:
    //   l1=10000 b1=0
    //   l2=(20000+4·10000) div 5=12000  b2=(2000+0) div 10=200
    //   l3=(30000+4·12200) div 5=15760  b3=(3760+9·200) div 10=556
    val df = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 30L))
      .toDF("g", "t", "v")
    val out = TimeSeriesOps.holtInt(df, Seq(col("g")), col("t"), col("v"),
        aNum = 1, aDen = 5, bNum = 1, bDen = 10, scale = 1000)
      .orderBy("order").select("level_s", "trend_s", "forecast_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((10000L, 0L, 10000L), (12000L, 200L, 12200L),
      (15760L, 556L, 16316L)))
    // constant series: level locked at v·S, trend identically zero —
    // and the one-step forecast is exact
    val const = (1 to 20).map(i => ("c", i.toLong, 7L)).toDF("g", "t", "v")
    val c = TimeSeriesOps.holtInt(const, Seq(col("g")), col("t"), col("v"),
        1, 5, 1, 10, 1000)
      .select("level_s", "trend_s").collect()
    c.foreach(r => assert((r.getLong(0), r.getLong(1)) == ((7000L, 0L))))
  }

  test("largestRemainder: allocations sum to the total; remainders rank") {
    val df = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("k", "w")
    val out = Aggregates.largestRemainder(df, Seq(col("k")), col("w"), 7L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    // floors 3/2/1 (sum 6); remainders 5/1/4 → the leftover unit goes to a
    assert(out == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    // equal weights: tie-break by key, total always preserved
    val eq = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("k", "w")
    val out2 = Aggregates.largestRemainder(eq, Seq(col("k")), col("w"), 10L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(out2 == Map("a" -> 4L, "b" -> 3L, "c" -> 3L) &&
      out2.values.sum == 10L)
  }

  test("benfordProfile: densified 9-row output with exact ppm arithmetic") {
    val df = Seq(1L, 1L, 2L, 0L, -5L).toDF("v") // non-positives drop
    val out = Aggregates.benfordProfile(df, col("v")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.size == 9)
    val byDigit = out.map(t => (t._1, (t._2, t._3))).toMap
    assert(byDigit(1) == ((2L, 666666L))) // 2·10⁶ div 3
    assert(byDigit(2) == ((1L, 333333L)))
    assert(byDigit(9) == ((0L, 0L)))
    // expected column is the exact literal table, summing to 10⁶
    assert(Aggregates.BenfordPpm.map(_._2).sum == 1000000L)
  }

  test("clampedRunningBalance: closed form equals the sequential recurrence") {
    val df = Seq(("k", 1L, 5L), ("k", 2L, -10L), ("k", 3L, 3L),
      ("j", 1L, -4L), ("j", 2L, 7L)).toDF("g", "t", "d")
    val out = TimeSeriesOps.clampedRunningBalance(df, Seq(col("g")),
        Seq(col("t")), col("d"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // k: 5, max(0,5-10)=0, 3;  j: max(0,-4)=0, 7
    assert(out == Map(("k", 1L) -> 5L, ("k", 2L) -> 0L, ("k", 3L) -> 3L,
      ("j", 1L) -> 0L, ("j", 2L) -> 7L))
  }

  test("law: clampedRunningBalance equals a driver-side fold on random series") {
    val deltas = Gen.listOfN(200, Gen.chooseNum(-50L, 50L))
      .apply(Gen.Parameters.default, Seed(23L)).get
    val df = deltas.zipWithIndex.map { case (d, i) => ("k", i.toLong, d) }
      .toDF("g", "t", "d")
    val got = TimeSeriesOps.clampedRunningBalance(df, Seq(col("g")),
        Seq(col("t")), col("d"))
      .orderBy("t").select("balance").as[Long].collect().toSeq
    val expected = deltas.scanLeft(0L)((s, x) => math.max(0L, s + x)).tail
    assert(got == expected)
  }

  test("positionAttribution: U-shape credits, orphan fallback, bps conserve") {
    val df = Seq(
      // u1: 3 touches -> first/last 4000, middle 2000
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "view"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "purchase"),
      // u2: conversion with no touches -> (none) 10000
      (2L, ts("2024-01-01 09:00:00"), 5L, "purchase"),
      // u2 second segment: single touch -> 10000
      (2L, ts("2024-01-01 09:10:00"), 6L, "click"),
      (2L, ts("2024-01-01 09:20:00"), 7L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.positionAttribution(df, "user_id", "ts",
        "event_id", "event_type", "purchase")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("view" -> ((2L, 8000L)), "click" -> ((2L, 12000L)),
      "(none)" -> ((1L, 10000L))))
    assert(out.values.map(_._2).sum == 30000L) // 3 conversions x 10000
  }

  test("positionAttribution: middle remainder goes to the earliest middles") {
    // 5 touches: middles get 2000 div 3 = 666 each, remainder 2 to the
    // first two middles -> 667, 667, 666
    val df = (1 to 5).map(i =>
      (1L, ts(f"2024-01-01 10:0$i%d:00"), i.toLong, s"ch$i")) :+
      ((1L, ts("2024-01-01 10:09:00"), 9L, "purchase"))
    val out = EventAnalytics.positionAttribution(df.toDF("user_id", "ts",
        "event_id", "event_type"), "user_id", "ts", "event_id",
        "event_type", "purchase")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("ch1" -> 4000L, "ch2" -> 667L, "ch3" -> 667L,
      "ch4" -> 666L, "ch5" -> 4000L))
    assert(out.values.sum == 10000L)
  }

  test("skewAudit: exact rollup stats and crossing quantiles") {
    val df = (Seq.fill(4)("a") ++ Seq("b", "c")).toDF("k")
    val r = Aggregates.skewAudit(df, col("k")).collect().head
    // rows 6, keys 3, max 4, share 4e6 div 6, p50 = 1, p99 = 4
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getDouble(6)) ==
      ((6L, 3L, 4L, 666666L, 1L, 4L, 4.0)))
  }

  test("kaplanMeier: censoring shrinks the risk set without dropping survival") {
    // durations: t=1 x2 (1 event, 1 censored), t=2 x1 (event), t=3 x1 (censored)
    val subj = Seq((1, 1), (1, 0), (2, 1), (3, 0)).toDF("dur", "ev")
    val out = EventAnalytics.kaplanMeier(subj, col("dur"), col("ev"))
      .orderBy("t").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // n_risk 4/2/1; S = 1e6*3/4 = 750000, *1/2 = 375000, *1/1 = 375000
    assert(out.toSeq == Seq((1, 4L, 1L, 750000L), (2, 2L, 1L, 375000L),
      (3, 1L, 0L, 375000L)))
  }

  test("kaplanMeier: no censoring reaches zero; all-censored stays at 1e6") {
    val dead = Seq((1, 1), (2, 1)).toDF("dur", "ev")
    val s1 = EventAnalytics.kaplanMeier(dead, col("dur"), col("ev"))
      .orderBy("t").select("surv_ppm").as[Long].collect().toSeq
    assert(s1 == Seq(500000L, 0L))
    val alive = Seq((1, 0), (2, 0)).toDF("dur", "ev")
    val s2 = EventAnalytics.kaplanMeier(alive, col("dur"), col("ev"))
      .orderBy("t").select("surv_ppm").as[Long].collect().toSeq
    assert(s2 == Seq(1000000L, 1000000L))
  }

  test("ndcgAtK: hand DCG/IDCG, perfect order hits 1.0, zero relevance nulls") {
    val df = Seq(
      ("u1", 1L, 3L), ("u1", 2L, 1L), ("u1", 3L, 2L), // actual 3,1,2
      ("u2", 1L, 9L), ("u2", 2L, 5L),                 // already ideal
      ("u3", 1L, 0L), ("u3", 2L, 0L))                 // all-zero -> null
      .toDF("u", "pos", "rel")
    val out = Ranking.ndcgAtK(df, col("u"), Seq(col("pos")), col("rel"), 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    // u1: dcg = 3e6 + 630930 + 2*500000; idcg = 3e6 + 2*630930 + 500000
    assert(out("u1")._1 == 4630930L && out("u1")._2 == 4761860L)
    assert(math.abs(out("u1")._3.get - 4630930.0 / 4761860.0) < 1e-12)
    assert(out("u2")._3.contains(1.0))
    assert(out("u3")._3.isEmpty)
  }

  test("ndcgAtK: items beyond k are ignored in both orders") {
    // 3 items, k=2: actual keeps pos 1-2; ideal keeps the TOP-2 rels
    val df = Seq(("u", 1L, 1L), ("u", 2L, 5L), ("u", 3L, 9L))
      .toDF("u", "pos", "rel")
    val r = Ranking.ndcgAtK(df, col("u"), Seq(col("pos")), col("rel"), 2)
      .collect().head
    // dcg = 1*1e6 + 5*630930; idcg = 9*1e6 + 5*630930
    assert(r.getLong(1) == 2L && r.getLong(2) == 4154650L &&
      r.getLong(3) == 12154650L)
  }

  test("reciprocalRankFusion: integer quotients, membership-weighted") {
    val a = Seq(("a", 1), ("b", 2)).toDF("id", "rank")
    val b = Seq(("b", 1), ("c", 2)).toDF("id", "rank")
    val out = graft.ext.Curation.reciprocalRankFusion(Seq(a, b), "id", "rank")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 1e6 div 61 = 16393, div 62 = 16129
    assert(out == Map("a" -> ((1L, 16393L)), "b" -> ((2L, 32522L)),
      "c" -> ((1L, 16129L))))
  }

  test("datasetFingerprint: order/partitioning-invariant, value-sensitive") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "s")
    def fp(d: org.apache.spark.sql.DataFrame) =
      Aggregates.datasetFingerprint(d, Nil, Seq("id", "s"))
        .collect().head match { case r => (r.getLong(0), r.getLong(1), r.getLong(2)) }
    val base = fp(df)
    assert(fp(df.orderBy(col("s").desc)) == base)
    assert(fp(df.repartition(7)) == base)
    val changed = fp(Seq((1L, "x"), (2L, "y"), (3L, "Z")).toDF("id", "s"))
    assert(changed != base)
    // null sentinel: (null, "a") must not collide with ("a", null)
    val n1 = fp(Seq((Option.empty[String], Some("a"))).toDF("id", "s"))
    val n2 = fp(Seq((Some("a"), Option.empty[String])).toDF("id", "s"))
    assert(n1 != n2)
  }

  test("joinCardinality: exact fan-out arithmetic from the rollups") {
    val a = Seq(1L, 1L, 2L).toDF("k")
    val b = Seq(1L, 3L).toDF("k2")
    val r = Aggregates.joinCardinality(a, col("k"), b, col("k2"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((3L, 2L, 2L, 2L, 1L, 2L, 2L)))
  }

  test("sortedNeighborhoodPairs: adjacent-in-sort-order typos pair; far rows don't") {
    val df = Seq((1L, "aquamarine"), (2L, "aquamarinX"), (3L, "zzzebra"))
      .toDF("rec_id", "name")
    val out = graft.ops.EntityResolution.sortedNeighborhoodPairs(
        df, "name", "rec_id", window = 2, maxDist = 2)
      .select("id_a", "id_b", "distance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // sort order: aquamarinX < aquamarine < zzzebra; only the typo pair verifies
    assert(out.toSeq == Seq((2L, 1L, 1)))
  }

  test("A-stat: theilSen — exact slope on a line, immune to one outlier") {
    import graft.ops.Aggregates
    // y = 2x with one wild outlier; OLS would move, the median slope not
    val pts = Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 6L), (4L, 1000L))
      .map { case (x, y) => ("k", x, y) }.toDF("g", "x", "y")
    val r = Aggregates.theilSen(pts, Seq(col("g")), col("x"), col("y")).head()
    assert(r.getAs[Long]("n_pairs") == 10L)
    assert(r.getAs[Long]("slope_num") == 2L * r.getAs[Long]("slope_den"))
    assert(r.getAs[Double]("slope") == 2.0)
  }

  test("A-stat: theilSen lower median is deterministic on an even pair count") {
    import graft.ops.Aggregates
    // 3 points -> 3 pairs? no: use 2 points -> 1 pair; 4 points -> 6 pairs
    val pts = Seq(("k", 0L, 0L), ("k", 1L, 1L), ("k", 2L, 4L), ("k", 3L, 9L))
      .toDF("g", "x", "y")
    val r = Aggregates.theilSen(pts, Seq(col("g")), col("x"), col("y")).head()
    // slopes sorted: 1, 3/2=1.5? pairs: (0,1)=1,(0,2)=2,(0,3)=3,(1,2)=3,(1,3)=4,(2,3)=5
    // sorted: 1,2,3,3,4,5 -> lower median rank (6+1) div 2 = 3 -> slope 3
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Double]("slope") == 3.0)
  }

  test("F9: geohash matches the published test vector and the prefix law") {
    import graft.ops.SpatialOps
    val df = Seq((1L, 57.64911, 10.40744), (2L, 57.64911, 10.40744))
      .toDF("id", "lat", "lon")
    val out = SpatialOps.withGeohash(df, col("lat"), col("lon"), 11)
      .select("geohash").head().getString(0)
    // canonical example cell (geohash.org): u4pruydqqvj
    assert(out == "u4pruydqqvj", s"got $out")
    // prefix law: precision-5 hash is the prefix of the precision-11 one
    val p5 = SpatialOps.withGeohash(df, col("lat"), col("lon"), 5)
      .select("geohash").head().getString(0)
    assert(out.startsWith(p5))
    // domain edges survive and stay in the alphabet
    val edge = Seq((1L, 90.0, 180.0), (2L, -90.0, -180.0))
      .toDF("id", "lat", "lon")
    val es = SpatialOps.withGeohash(edge, col("lat"), col("lon"), 6)
      .select("geohash").collect().map(_.getString(0))
    assert(es.forall(g => g.length == 6 &&
      g.forall(SpatialOps.GeohashAlphabet.contains(_))))
    assert(es(0) == "zzzzzz" && es(1) == "000000")
  }

  test("A-stat: welchTTest — hand case, zero under exchangeability") {
    import graft.ops.Aggregates
    val df = Seq(("a", 10L), ("a", 12L), ("a", 14L), ("b", 1L), ("b", 2L), ("b", 3L))
      .toDF("g", "v")
    val r = Aggregates.welchTTest(df, col("v"), col("g"), "a", "b").head()
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Double]("mean_a") == 12.0 && r.getAs[Double]("mean_b") == 2.0)
    // t = 10/sqrt(4/3 + 1/3), df = (5/3)^2 / ((16/9)/2 + (1/9)/2)
    assert(math.abs(r.getAs[Double]("t_stat") - 7.745966692414834) < 1e-12)
    assert(math.abs(r.getAs[Double]("df") - 50.0 / 17.0) < 1e-12)
    val same = Aggregates.welchTTest(
      Seq(("a", 5L), ("a", 6L), ("a", 7L), ("b", 5L), ("b", 6L), ("b", 7L))
        .toDF("g", "v"),
      col("v"), col("g"), "a", "b").head()
    assert(same.getAs[Double]("t_stat") == 0.0)
  }

  test("A-stat: anovaF — textbook three-group case gives F = 3 exactly") {
    import graft.ops.Aggregates
    val df = (Seq(1L, 2L, 3L).map(("a", _)) ++ Seq(2L, 3L, 4L).map(("b", _)) ++
      Seq(3L, 4L, 5L).map(("c", _))).toDF("g", "v")
    val r = Aggregates.anovaF(df, col("v"), col("g")).head()
    assert(r.getAs[Long]("k") == 3 && r.getAs[Long]("n") == 9)
    assert(r.getAs[Long]("ssb_u") == 6000000L && r.getAs[Long]("ssw_u") == 6000000L)
    assert(r.getAs[Double]("f_stat") == 3.0)
  }

  test("A1: linearFit2Exact recovers an exact planted plane; collinear -> nulls") {
    import graft.ops.Aggregates
    // y = 3 + 2*x1 - x2, exactly
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (2L, 1L), (1L, 2L))
      .map { case (x1, x2) => ("k", x1, x2, 3 + 2 * x1 - x2) }
      .toDF("g", "x1", "x2", "y")
    val r = Aggregates.linearFit2Exact(pts, Seq(col("g")), col("x1"),
      col("x2"), col("y")).head()
    assert(r.getAs[Double]("b1") == 2.0 && r.getAs[Double]("b2") == -1.0)
    assert(r.getAs[Double]("intercept") == 3.0)
    val bad = Seq(("k", 1L, 2L, 5L), ("k", 2L, 4L, 7L), ("k", 3L, 6L, 9L))
      .toDF("g", "x1", "x2", "y")
    val rb = Aggregates.linearFit2Exact(bad, Seq(col("g")), col("x1"),
      col("x2"), col("y")).head()
    assert(rb.isNullAt(rb.fieldIndex("b1")) && rb.isNullAt(rb.fieldIndex("intercept")))
  }

  test("A-stat: jackknifeMeanByGroup — hand pseudo-values, exact micro variance") {
    import graft.ops.Aggregates
    val df = Seq(("a", 1L), ("a", 3L), ("b", 5L), ("b", 7L), ("c", 9L), ("c", 11L))
      .toDF("g", "v")
    val r = Aggregates.jackknifeMeanByGroup(df, col("g"), col("v")).head()
    assert(r.getAs[Long]("g") == 3L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("mean") == 6.0)
    // loo means 8, 6, 4 -> theta_u {8e6, 6e6, 4e6}:
    // var = (G-1)*(G*Sum2 - Sum^2)/G^2 = 2 * 2.4e13 / 9
    assert(r.getAs[Double]("jk_var_u2") == 2.0 * 2.4e13 / 9.0)
    assert(r.getAs[Double]("jk_se_u") == math.sqrt(2.0 * 2.4e13 / 9.0))
    // constant data -> zero variance exactly
    val const = Seq(("a", 5L), ("b", 5L), ("c", 5L)).toDF("g", "v")
    assert(Aggregates.jackknifeMeanByGroup(const, col("g"), col("v"))
      .head().getAs[Double]("jk_var_u2") == 0.0)
  }

  test("A-stat: adfTest — white noise rejects the unit root, a trendless walk does not") {
    import graft.ops.Aggregates
    // mean-reverting: deterministic noise around a constant
    val noise = (1 to 300).map(i => ("n", i.toLong, 50L + (i * 37) % 11))
    // random walk: cumulative sum of iid +-1 steps (splitmix64 parity)
    def mix(i: Long): Long = {
      var x = i * 0x9E3779B97F4A7C15L
      x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
      x ^= x >>> 27; x *= 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    var acc = 0L
    val walk = (1 to 500).map { i =>
      acc += (if ((mix(i) & 1L) == 0L) 1L else -1L)
      ("w", i.toLong, acc)
    }
    val df = (noise ++ walk).toDF("g", "t", "y")
    val out = Aggregates.adfTest(df, Seq(col("g")), col("t"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val n = out("n")
    assert(n.getAs[Double]("gamma") < -0.5 && n.getAs[Int]("stationary") == 1,
      s"noise: ${n}")
    val w = out("w")
    assert(w.getAs[Double]("gamma") > -0.5 && w.getAs[Int]("stationary") == 0,
      s"walk: ${w}")
  }

  test("ML: targetEncodeLoo excludes the row itself; singletons get null") {
    import graft.ops.Features
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "b", 7L))
      .toDF("id", "cat", "y")
    val out = Features.targetEncodeLoo(df, col("cat"), col("y"))
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("loo_mean") == 25.0) // (20+30)/2
    assert(out(1).getAs[Double]("loo_mean") == 20.0) // (10+30)/2
    assert(out(2).getAs[Double]("loo_mean") == 15.0)
    assert(out(3).isNullAt(out(3).fieldIndex("loo_mean")))
  }

  test("ML: classBalanceCap keeps the FIRST rows per class, audit agrees") {
    import graft.ops.Features
    val df = (1 to 10).map(i => (i.toLong, "big")) ++ Seq((11L, "small"), (12L, "small"))
    val d = df.toDF("id", "cls")
    val kept = Features.classBalanceCap(d, col("cls"), ratio = 2,
      Seq(col("id").asc)).select("id").as[Long].collect().sorted.toSeq
    // small has 2 -> cap = 4: big keeps ids 1..4, small keeps both
    assert(kept == Seq(1L, 2L, 3L, 4L, 11L, 12L))
    val audit = Features.classBalanceAudit(d, col("cls"), ratio = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit == Map("big" -> (10L, 4L), "small" -> (2L, 2L)))
  }

  test("E2+: coOccurrence — bounded pair projection with deterministic top-k") {
    import graft.ops.Associations
    val baskets = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 11L), (3L, 10L)) // dup (3,10) must not double-count
      .toDF("b", "i")
    val out = Associations.coOccurrence(baskets, col("b"), col("i"), topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((10L, 11L, 3L), (10L, 12L, 1L)))
  }

  test("A-stat: spearmanExact — monotone-transform invariance and tie handling") {
    import graft.ops.Aggregates
    // y = x^3 (monotone, nonlinear): Spearman 1, where Pearson < 1
    val mono = Seq(1L, 2L, 3L, 4L, 5L).map(x => ("k", x, x * x * x))
      .toDF("g", "x", "y")
    val r = Aggregates.spearmanExact(mono, Seq(col("g")), col("x"), col("y"))
      .head()
    assert(math.abs(r.getAs[Double]("rho") - 1.0) < 1e-12)
    val anti = Seq(("k", 1L, 9L), ("k", 2L, 5L), ("k", 3L, 1L)).toDF("g", "x", "y")
    val ra = Aggregates.spearmanExact(anti, Seq(col("g")), col("x"), col("y"))
      .head()
    assert(math.abs(ra.getAs[Double]("rho") + 1.0) < 1e-12)
    // aligned ties stay perfectly correlated under midranks
    val tied = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 2L, 20L), ("k", 3L, 40L))
      .toDF("g", "x", "y")
    val rt = Aggregates.spearmanExact(tied, Seq(col("g")), col("x"), col("y"))
      .head()
    assert(math.abs(rt.getAs[Double]("rho") - 1.0) < 1e-12)
  }

  test("A-stat: kendallTau — hand counts, tie-aware tau_b") {
    import graft.ops.Aggregates
    val clean = Seq(("k", 1L, 1L), ("k", 2L, 2L), ("k", 3L, 3L)).toDF("g", "x", "y")
    val rc = Aggregates.kendallTau(clean, Seq(col("g")), col("x"), col("y")).head()
    assert(rc.getAs[Long]("nc") == 3L && rc.getAs[Long]("nd") == 0L)
    assert(math.abs(rc.getAs[Double]("tau_b") - 1.0) < 1e-12)
    // one x-tie: tau_b = 2/sqrt(6)
    val tied = Seq(("k", 1L, 1L), ("k", 1L, 2L), ("k", 2L, 3L)).toDF("g", "x", "y")
    val rt = Aggregates.kendallTau(tied, Seq(col("g")), col("x"), col("y")).head()
    assert(rt.getAs[Long]("nc") == 2L && rt.getAs[Long]("nd") == 0L)
    assert(math.abs(rt.getAs[Double]("tau_b") - 2.0 / math.sqrt(6.0)) < 1e-12)
  }

  test("A-stat: cramersV is 1 on perfect association, ~0 on independence") {
    import graft.ops.Aggregates
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("r", "c")
    val v = Aggregates.cramersV(perfect, col("r"), col("c")).head()
    assert(math.abs(v.getAs[Double]("cramers_v") - 1.0) < 1e-6)
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("r", "c")
    val vi = Aggregates.cramersV(indep, col("r"), col("c")).head()
    assert(vi.getAs[Double]("cramers_v") < 1e-6)
  }

  test("A-stat: oddsRatio — hand 2x2 in exact ppm and IEEE double") {
    import graft.ops.Aggregates
    val rows = Seq.fill(10)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(8)((false, false))
    val df = rows.toDF("e", "o")
    val r = Aggregates.oddsRatio(df, col("e"), col("o")).head()
    assert(r.getAs[Long]("or_ppm") == 8000000L)
    assert(r.getAs[Double]("odds_ratio") == 8.0)
    assert(r.getAs[Long]("rr_ppm") == 3333333L) // (10/15)/(2/10)
  }

  test("ML: conformalInterval — exact rank radius and measured coverage") {
    import graft.ops.Features
    val cal = (0 to 9).map(i => ("k", i * 10L, true))
    val test = Seq(("k", 45L, false), ("k", 200L, false))
    val df = (cal ++ test).toDF("g", "y", "cal")
    val r = Features.conformalInterval(df, col("g"), col("y"), col("cal"))
      .head()
    // cal mean floor = 45; sorted |resid| = 5,5,15,15,25,25,35,35,45,45
    // k = min(10, ceil(11 * 0.9)) = 10 -> qhat = 45
    assert(r.getAs[Long]("pred_c") == 45L && r.getAs[Long]("qhat") == 45L)
    assert(r.getAs[Long]("n_cal") == 10L && r.getAs[Long]("n_test") == 2L)
    assert(r.getAs[Long]("cover_ppm") == 500000L) // 45 in, 200 out
  }

  test("C11+: Expectations.validate — one-pass report, null is a violation") {
    import graft.ops.Expectations
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(-1.0)))
      .toDF("id", "v")
    val out = Expectations.validate(df, Seq(
      Expectations.Rule("id_positive", "id > 0"),
      Expectations.Rule("v_nonneg", "v >= 0")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(out("id_positive") == (3L, 0L, 1))
    // null v AND negative v both violate
    assert(out("v_nonneg") == (3L, 2L, 0))
    intercept[IllegalArgumentException] {
      Expectations.validate(df, Seq(
        Expectations.Rule("dup", "id > 0"), Expectations.Rule("dup", "v >= 0")))
    }
  }

  test("C11+: fdAudit — holding and violated FDs, g3 repair count, composite lhs") {
    import graft.ops.Expectations
    val df = Seq(
      // dept -> site: "a" maps to x,x,y (violating, repair = 1),
      //               "b" maps to z   (clean)
      ("a", "x", 1), ("a", "x", 1), ("a", "y", 2), ("b", "z", 3))
      .toDF("dept", "site", "grp")
    val out = Expectations.fdAudit(df, Seq(
      (Seq("dept"), "site"),
      (Seq("dept", "site"), "grp"),   // holds: (a,x)->1, (a,y)->2, (b,z)->3
      (Seq("grp"), "dept")))          // holds: 1->a, 2->a, 3->b
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(out("dept -> site") == (2L, 1L, 1L, 0))
    assert(out("dept,site -> grp") == (3L, 0L, 0L, 1))
    assert(out("grp -> dept") == (3L, 0L, 0L, 1))
  }

  test("A-stat: negBinomialMom — hand moments; underdispersed group nulls r/p") {
    import graft.ops.Aggregates
    // (0,1,2,3,10): mean 3.2, var 15.7, r = 10.24/12.5, p = 3.2/15.7
    val over = Seq(0L, 1L, 2L, 3L, 10L).map(("a", _))
    // (3,3,3,4): var 0.25 < mean 3.25 — NB undefined, Poisson fine
    val under = Seq(3L, 3L, 3L, 4L).map(("b", _))
    val out = Aggregates.negBinomialMom(
        (over ++ under).toDF("g", "v"), col("v"), col("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n") == 5L)
    assert(math.abs(a.getAs[Double]("mean") - 3.2) < 1e-12)
    assert(math.abs(a.getAs[Double]("variance") - 15.7) < 1e-12)
    assert(math.abs(a.getAs[Double]("r") - 10.24 / 12.5) < 1e-12)
    assert(math.abs(a.getAs[Double]("p") - 3.2 / 15.7) < 1e-12)
    val b = out("b")
    assert(b.getAs[Double]("variance") < b.getAs[Double]("mean"))
    assert(b.isNullAt(b.fieldIndex("r")) && b.isNullAt(b.fieldIndex("p")))
  }

  test("A-stat: brunnerMunzel — published example reproduced; identical groups null out") {
    import graft.ops.Aggregates
    // the Brunner-Munzel running example (Neubert & Brunner 2007;
    // lawstat::brunner.munzel.test docs): W = 3.1375, df = 17.683,
    // p̂ = 0.788961
    val g1 = Seq(1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 4, 1, 1).map(("x", _))
    val g2 = Seq(3, 3, 4, 3, 1, 2, 3, 1, 1, 5, 4).map(("y", _))
    val df = (g1 ++ g2).toDF("g", "v")
    val r = Aggregates.brunnerMunzel(df, col("v"), col("g"), "x", "y")
      .collect()(0)
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) == (14L, 11L))
    assert(math.abs(r.getAs[Double]("p_hat") - 0.788961) < 1e-6)
    assert(math.abs(r.getAs[Double]("bm_stat") - 3.1375) < 1e-4)
    assert(math.abs(r.getAs[Double]("df") - 17.683) < 1e-3)
    // two identical constant groups: p̂ = 1/2 exactly, stat undefined
    val const = (Seq.fill(5)(("x", 7)) ++ Seq.fill(3)(("y", 7)))
      .toDF("g", "v")
    val rc = Aggregates.brunnerMunzel(const, col("v"), col("g"), "x", "y")
      .collect()(0)
    assert(rc.getAs[Double]("p_hat") == 0.5)
    assert(rc.isNullAt(rc.fieldIndex("bm_stat")))
  }

  test("A-stat: huberLocation — clean data keeps the mean; outliers are resisted") {
    import graft.ops.Aggregates
    // symmetric clean group: mean = huber mu = 10
    // contaminated group: nine 10s and one 1000 — the mean is dragged
    // to 109, the huber estimate must stay near 10
    val df = (Seq.fill(5)(("clean", 8L)) ++ Seq.fill(5)(("clean", 12L)) ++
      Seq.fill(9)(("dirty", 10L)) :+ (("dirty", 1000L)))
      .toDF("g", "v")
    val out = Aggregates.huberLocation(df, col("v"), col("g"),
        cMicro = 5000000L, iterations = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("clean").getAs[Long]("huber_mu_micro") == 10000000L)
    assert(out("clean").getAs[Long]("mean_micro") == 10000000L)
    assert(out("dirty").getAs[Long]("mean_micro") == 109000000L)
    val dirtyMu = out("dirty").getAs[Double]("huber_mu")
    assert(dirtyMu < 20.0, s"huber mu dragged to $dirtyMu")
    assert(dirtyMu >= 10.0)
  }

  test("E3+: powerIterationInt — symmetric fixed point and exact decay") {
    import graft.ext.Clustering
    val sym = Seq((0, 0, 1.0), (0, 1, 0.8), (1, 1, 1.0)).toDF("i", "j", "corr")
    val r = Clustering.powerIterationInt(sym, dims = 2, rounds = 4)
      .orderBy("j").collect()
    assert(r.map(_.getAs[Long]("v_u")).toSeq == Seq(1000000L, 1000000L))
    assert(r.head.getAs[Long]("lambda_u") == 1800000L)
    // decoupled dims: the weak one decays by exactly 1/2 per round
    val dec = Seq((0, 0, 1.0), (0, 1, 0.0), (1, 1, 0.5)).toDF("i", "j", "corr")
    val rd = Clustering.powerIterationInt(dec, dims = 2, rounds = 4)
      .orderBy("j").collect()
    assert(rd.map(_.getAs[Long]("v_u")).toSeq == Seq(1000000L, 62500L))
    assert(rd.head.getAs[Long]("lambda_u") == 1000000L)
  }

  test("ML: giniSplit finds the perfect threshold; SRM and Cohen's d hand cases") {
    import graft.ops.{Aggregates, Features}
    // y = 1 iff x >= 3: the split at v = 2 is pure on both sides
    val pts = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("x", "y")
    val g = Features.giniSplit(pts, col("x"), col("y")).head()
    assert(g.getAs[Long]("split_value") == 2L)
    assert(g.getAs[Long]("wg_u") == 0L)
    assert(g.getAs[Long]("baseline_u") == 500000L &&
      g.getAs[Long]("gain_u") == 500000L)

    // SRM: buckets 6 vs 4 of 10 -> chi2 = 0.4 exactly, worst dev 20%
    val asg = (Seq.fill(6)(0L) ++ Seq.fill(4)(1L)).toDF("b")
    val srm = Aggregates.srmCheck(asg, col("b"), k = 2).head()
    assert(srm.getAs[Double]("chi2") == 0.4)
    assert(srm.getAs[Long]("max_dev_ppm") == 200000L)
    // a missing bucket is a catastrophic SRM, not a crash
    val missing = Aggregates.srmCheck(Seq.fill(4)(0L).toDF("b"),
      col("b"), k = 2).head()
    assert(missing.getAs[Long]("max_dev_ppm") == 1000000L)

    // Cohen's d: means 12 vs 2, pooled sd sqrt(2.5)
    val df2 = Seq(("a", 10L), ("a", 12L), ("a", 14L),
      ("b", 1L), ("b", 2L), ("b", 3L)).toDF("g", "v")
    val d = Aggregates.cohensD(df2, col("v"), col("g"), "a", "b").head()
    assert(math.abs(d.getAs[Double]("cohens_d") - 10.0 / math.sqrt(2.5)) < 1e-12)
  }

  test("kruskalWallis: textbook three-group case, no ties") {
    // A: 1,2  B: 3,4  C: 5,6 — ranks 1..6, R = 3/7/11,
    // H = 12/42·(9/2+49/2+121/2) − 21 = 4.571428… (micro-quantized
    // per-group terms give 4.571428 exactly)
    val df = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L),
      ("C", 5L), ("C", 6L)).toDF("g", "v")
    val r = Aggregates.kruskalWallis(df, col("v"), col("g")).head()
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("tie_sum") == 0L)
    assert(r.getAs[Double]("h") == 4.571428)
  }

  test("kruskalWallis: tie correction — hand-solved H = 1.5 exactly") {
    // A: 1,2  B: 2,3 — midranks 1, 2.5, 2.5, 4; H0 = 1.35,
    // C = 1 − 6/60 = 0.9, H = 1.5
    val df = Seq(("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L)).toDF("g", "v")
    val r = Aggregates.kruskalWallis(df, col("v"), col("g")).head()
    assert(r.getAs[Long]("tie_sum") == 6L)
    assert(r.getAs[Double]("h") == 1.5)
  }

  test("wilcoxonSignedRank: zero diffs drop, ties midrank, z pinned") {
    // diffs 0, +2, +2, −3 → n=3, |d| ranks (doubled) 3,3,6,
    // W2⁺ = 6 = n(n+1)/2 → z = 0 exactly
    val df = Seq((5L, 5L), (1L, 3L), (10L, 12L), (7L, 4L)).toDF("x", "y")
    val r = Aggregates.wilcoxonSignedRank(df, col("x"), col("y")).head()
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("n_pos") == 2L)
    assert(r.getAs[Long]("w2_plus") == 6L)
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("wilcoxonSignedRank: textbook no-tie case") {
    // diffs +1, −2, +3, +4 → W⁺ = 8, W2⁺ = 16,
    // z = 6 / (2·√7.5) = 1.095445
    val df = Seq((0L, 1L), (2L, 0L), (0L, 3L), (0L, 4L)).toDF("x", "y")
    val r = Aggregates.wilcoxonSignedRank(df, col("x"), col("y")).head()
    assert(r.getAs[Long]("w2_plus") == 16L)
    assert(r.getAs[Double]("z") ==
      math.rint(6.0 / (2.0 * math.sqrt(7.5)) * 1e6) / 1e6)
  }

  test("xmrChart: level shift breaches the 2.66·MR limit") {
    val s = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 30L))
      .toDF("tt", "v")
    val out = TimeSeriesOps.xmrChart(s, col("tt"), col("v"))
      .orderBy("t").collect()
    // x̄ = 14, M̄R = 5 → UCL = 27.3: only the 30 breaches
    assert(out.map(_.getAs[Boolean]("out_of_control")).toSeq ==
      Seq(false, false, false, false, true))
    assert(out.last.getAs[Double]("ucl") == 27.3)
    assert(out.head.isNullAt(out.head.fieldIndex("mr")))
  }

  test("etaSquared: separated groups → 1; identical groups → 0") {
    val sep = Seq(("a", 1L), ("a", 1L), ("b", 3L), ("b", 3L)).toDF("g", "v")
    assert(Aggregates.etaSquared(sep, col("v"), col("g"))
      .head().getAs[Double]("eta_sq") == 1.0)
    val same = Seq(("a", 1L), ("a", 3L), ("b", 1L), ("b", 3L)).toDF("g", "v")
    assert(Aggregates.etaSquared(same, col("v"), col("g"))
      .head().getAs[Double]("eta_sq") == 0.0)
  }

  test("gridDensityClusters: adjacent dense cells merge; sparse drop") {
    import graft.ops.SpatialOps
    val pts = Seq(
      (0.5, 0.5), (0.6, 0.6),   // dense cell (0,0)
      (1.5, 0.5), (1.6, 0.6),   // dense cell (1,0) — adjacent → merges
      (5.5, 5.5), (5.6, 5.6),   // dense cell (5,5) — isolated cluster
      (9.5, 9.5)                // single point → not dense → dropped
    ).toDF("x", "y")
    val out = SpatialOps.gridDensityClusters(pts, col("x"), col("y"),
      cellSize = 1.0, minPts = 2L).orderBy("cluster_id").collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_cells"),
        r.getAs[Long]("n_points")))
    assert(out.toSeq == Seq((0L, 2L, 4L), (500005L, 1L, 2L)))
  }

  test("kAnonymityAudit: smallest class and at-risk row share") {
    val df = Seq(("n1", "A"), ("n1", "A"), ("n1", "A"), ("n2", "B"))
      .toDF("nat", "seg")
    val r = graft.ops.Privacy.kAnonymityAudit(df,
      Seq(col("nat"), col("seg")), k = 2L).head()
    assert(r.getAs[Long]("n_rows") == 4L && r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("k_min") == 1L)
    assert(r.getAs[Long]("groups_below_k") == 1L)
    assert(r.getAs[Long]("rows_below_ppm") == 250000L)
  }

  test("lDiversityAudit: a uniform class is flagged regardless of size") {
    val df = Seq(("g1", "x"), ("g1", "y"), ("g2", "x"), ("g2", "x"),
      ("g2", "x")).toDF("qi", "s")
    val r = graft.ops.Privacy.lDiversityAudit(df, Seq(col("qi")),
      col("s"), l = 2L).head()
    assert(r.getAs[Long]("n_groups") == 2L && r.getAs[Long]("l_min") == 1L)
    assert(r.getAs[Long]("groups_below_l") == 1L)
    assert(r.getAs[Long]("below_ppm") == 500000L)
  }

  test("hillTailIndex: geometric top-4 — replicated micro-ln arithmetic") {
    val df = Seq(16L, 8L, 4L, 2L, 1L).toDF("x")
    val r = Aggregates.hillTailIndex(df, col("x"), k = 3).head()
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("x_tail") == 2L)
    val sum = Seq(8.0, 4.0, 2.0).map(v =>
      math.rint(math.log(v) * 1e6).toLong).sum
    val expected = BigDecimal(3.0 / (sum.toDouble / 1e6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("alpha") == expected)
  }

  test("goodTuring: spectrum 'a a b c' — p0 = 1/2, r1* = 1") {
    val r = graft.ext.TextAnalysis.goodTuring(
      Seq("a a b c").toDF("text"), "text").head()
    assert(r.getAs[Long]("n_tokens") == 4L && r.getAs[Long]("n_types") == 3L)
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 1L)
    assert(r.getAs[Long]("p0_ppm") == 500000L)
    assert(r.getAs[Long]("r1_star_ppm") == 1000000L)
  }

  test("binnedQuantileAudit: hand-traced bins on 1..10, width 5") {
    val df = (1L to 10L).toDF("x")
    val out = graft.ext.Sketches.binnedQuantileAudit(df, col("x"), 5L,
      Seq(500000L, 990000L)).orderBy("level_ppm").collect()
    val p50 = out(0)
    assert(p50.getAs[Long]("target_rank") == 5L)
    assert(p50.getAs[Long]("exact_q") == 5L)
    assert(p50.getAs[Long]("binned_q") == 9L) // bin [5,9] upper edge
    assert(p50.getAs[Long]("err_ppm") == 800000L)
    val p99 = out(1)
    assert(p99.getAs[Long]("exact_q") == 10L &&
      p99.getAs[Long]("binned_q") == 14L)
  }

  test("greedyMixture: quality-ranked fill, boundary source pro-rata") {
    val s = Seq(("A", 60L, 9L), ("B", 40L, 5L)).toDF("src", "tok", "q")
    val out = graft.ext.Curation.greedyMixture(s, col("src"), col("tok"),
      col("q"), 1L, 2L).orderBy("source").collect()
    // budget 50: A (better) takes 50 of 60, B gets 0
    assert(out(0).getAs[Long]("alloc_tokens") == 50L)
    assert(out(0).getAs[Long]("alloc_ppm") == 833333L)
    assert(out(1).getAs[Long]("alloc_tokens") == 0L)
    // conservation: allocations sum to the budget
    assert(out.map(_.getAs[Long]("alloc_tokens")).sum == 50L)
  }

  test("cochranQ: hand-solved 3×3 presence table — Q = 3 exactly") {
    // C = (3,2,1), R = (2,1,3): Q = 2·(3·14 − 36)/(3·6 − 14) = 3
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 1L), (3L, 2L),
      (3L, 3L)).toDF("b", "t")
    val r = Aggregates.cochranQ(rows, col("b"), col("t"), lit(true)).head()
    assert(r.getAs[Long]("n_blocks") == 3L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Double]("q") == 3.0)
  }

  test("ljungBox: alternating series — hand-solved Q = 7.5") {
    // v = 1,2,1,2: c = (−2,2,−2,2), den 16; ρ1 = −0.75, ρ2 = 0.5;
    // Q = 4·6·(0.5625/3 + 0.25/2) = 7.5
    val s = Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 2L)).toDF("t", "v")
    val r = Aggregates.ljungBox(s, col("t"), col("v"), kLags = 2).head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("k_lags") == 2L)
    assert(r.getAs[Double]("q") == 7.5)
  }

  test("simpsonDiversity: two even categories → 2/3; singleton → null") {
    val df = Seq(("s1", "a"), ("s1", "a"), ("s1", "b"), ("s1", "b"),
      ("s2", "a")).toDF("k", "c")
    val out = Aggregates.simpsonDiversity(df, Seq(col("k")), col("c"))
      .orderBy("k").collect()
    assert(out(0).getAs[Long]("n") == 4L &&
      out(0).getAs[Double]("d") == 0.666667)
    assert(out(1).isNullAt(out(1).fieldIndex("d")))
  }

  test("theilIndex: replicated micro-quantized arithmetic on 1,1,2") {
    val df = Seq(1L, 1L, 2L).toDF("x")
    val r = Aggregates.theilIndex(df, col("x")).head()
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("sum_x") == 4L)
    def tu(ratio: Double) = math.rint(ratio * math.log(ratio) * 1e6).toLong
    val expected = BigDecimal((2 * tu(3.0 / 4.0) + 1 * tu(6.0 / 4.0))
      .toDouble / 1e6 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("theil") == expected)
  }

  test("cochranArmitage: two-dose trend — chi2 = 7.2 exactly") {
    // w=1: 2/10 success; w=2: 8/10 → 20·60²/(10·10·100) = 7.2
    val rows = (Seq.fill(2)((1L, 1)) ++ Seq.fill(8)((1L, 0)) ++
      Seq.fill(8)((2L, 1)) ++ Seq.fill(2)((2L, 0))).toDF("w", "y")
    val r = Aggregates.cochranArmitage(rows, col("w"), col("y") === 1).head()
    assert(r.getAs[Long]("n") == 20L && r.getAs[Long]("k_groups") == 2L)
    assert(r.getAs[Double]("chi2_trend") == 7.2)
  }

  test("zipfSlope: replicated micro-log OLS on a tiny spectrum") {
    val docs = Seq("a a a a b b c").toDF("text")
    val r = graft.ext.TextAnalysis.zipfSlope(docs, "text", topN = 3).head()
    assert(r.getAs[Long]("n_terms") == 3L && r.getAs[Long]("top_freq") == 4L)
    val pts = Seq((1L, 4L), (2L, 2L), (3L, 1L)).map { case (rk, f) =>
      (math.rint(math.log(rk.toDouble) * 1e6).toLong,
        math.rint(math.log(f.toDouble) * 1e6).toLong)
    }
    val n = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(r.getAs[Double]("slope") == BigDecimal(slope)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("slope") < -0.5) // decaying spectrum
  }

  test("mannKendall: monotone series, no ties — S = n(n−1)/2, pinned z") {
    val s = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("t", "v")
    val r = Aggregates.mannKendall(s, col("t"), col("v")).head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("s") == 6L)
    assert(r.getAs[Long]("var18") == 156L) // 4·3·13, no tie correction
    val z = 5.0 / math.sqrt(156.0 / 18.0)
    assert(r.getAs[Double]("z") == BigDecimal(z)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("mannKendall: ties shrink the variance; decreasing series flips sign") {
    val s = Seq((1L, 3L), (2L, 2L), (3L, 2L), (4L, 1L)).toDF("t", "v")
    val r = Aggregates.mannKendall(s, col("t"), col("v")).head()
    assert(r.getAs[Long]("s") == -5L)
    assert(r.getAs[Long]("var18") == 156L - 18L) // one pair tie: 2·1·9
    val z = -4.0 / math.sqrt(138.0 / 18.0)
    assert(r.getAs[Double]("z") == BigDecimal(z)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("pettitt: level shift located at the split maximizing |U|") {
    val s = Seq((1L, 1L), (2L, 1L), (3L, 5L), (4L, 5L)).toDF("t", "v")
    val r = Aggregates.pettitt(s, col("t"), col("v")).head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("t_star") == 2L) // shift between t=2 and t=3
    assert(r.getAs[Long]("u_t") == 4L && r.getAs[Long]("k_abs") == 4L)
  }

  test("gTest: independent table scores 0; diagonal scores 8·ln2") {
    val indep = (Seq.fill(2)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq(("b", "x"), ("b", "y"))).toDF("r", "c")
    val r0 = Aggregates.gTest(indep, col("r"), col("c")).head()
    assert(r0.getAs[Double]("g") == 0.0 && r0.getAs[Long]("dof") == 1L)
    val diag = (Seq.fill(2)(("a", "x")) ++ Seq.fill(2)(("b", "y"))).toDF("r", "c")
    val r1 = Aggregates.gTest(diag, col("r"), col("c")).head()
    // per-cell term 2·ln2 micro-quantized: 1386294 → g = 2·2·1386294/1e6
    assert(r1.getAs[Double]("g") == 5.545176)
  }

  test("assortativity: a path graph is perfectly disassortative (r = −1)") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r = Graph.assortativity(e, "a", "b").head()
    assert(r.getAs[Long]("m") == 2L)
    assert(r.getAs[Double]("r") == -1.0)
  }

  test("clusteringCoefficients: triangle nodes are cliques; pendant drops") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Graph.clusteringCoefficients(e, "a", "b")
      .orderBy("node").collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("degree"),
        r.getAs[Long]("n_triangles"), r.getAs[Long]("local_cc_ppm")))
    assert(out.toSeq == Seq((1L, 2L, 1L, 1000000L), (2L, 2L, 1L, 1000000L),
      (3L, 3L, 1L, 333333L))) // node 4 has degree 1 → excluded
  }

  test("rouge2: clipped multiset overlap — hand-counted P/R/F1 ppm") {
    // cand "a b c a b": bigrams {a b:2, b c:1, c a:1} (4); ref
    // "a b c d": {a b:1, b c:1, c d:1} (3); clipped overlap = 2
    val pairs = Seq((1L, "a b c a b", "a b c d")).toDF("pid", "cand", "ref")
    val r = graft.ext.TextAnalysis.rouge2(pairs, "pid", "cand", "ref").head()
    assert(r.getAs[Long]("n_bi_cand") == 4L && r.getAs[Long]("n_bi_ref") == 3L)
    assert(r.getAs[Long]("overlap") == 2L)
    assert(r.getAs[Long]("p_ppm") == 500000L)
    assert(r.getAs[Long]("r_ppm") == 666666L)
    assert(r.getAs[Long]("f1_ppm") == 4000000L / 7L)
  }

  test("rouge2: disjoint pair scores zero, not null") {
    val pairs = Seq((1L, "a b", "x y")).toDF("pid", "cand", "ref")
    val r = graft.ext.TextAnalysis.rouge2(pairs, "pid", "cand", "ref").head()
    assert(r.getAs[Long]("overlap") == 0L && r.getAs[Long]("f1_ppm") == 0L)
  }

  test("kneserNeyScore: discounted seen mass + continuation backoff") {
    val model = Seq((10L, "a b c")).toDF("doc_id", "text")
    val probe = Seq((1L, "a b x")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.kneserNeyScore(model, probe,
      "text", "doc_id").head()
    // T=2 types, V=3 vocab. "a b": (1−0.75)/1 + 0.75·(1/1)·Pc(b),
    // Pc(b) = (1+1)/5; "b x": 0 + 0.75·(1/1)·Pc(x), Pc(x) = (0+1)/5
    val p1 = math.max(1.0 - 0.75, 0.0) / 1.0 +
      0.75 * 1.0 / 1.0 * ((1.0 + 1.0) / 5.0)
    val p2 = math.max(0.0 - 0.75, 0.0) / 1.0 +
      0.75 * 1.0 / 1.0 * ((0.0 + 1.0) / 5.0)
    val mean = (math.rint(math.log(p1) * 1e6) +
      math.rint(math.log(p2) * 1e6)) / 2 / 1e6
    assert(out.getAs[Long]("n_bigrams") == 2L)
    assert(out.getAs[Double]("mean_logkn") == BigDecimal(mean)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("kneserNeyScore: unseen head falls back to continuation prob") {
    val model = Seq((10L, "a b")).toDF("doc_id", "text")
    val probe = Seq((1L, "z b")).toDF("doc_id", "text") // head z unseen
    val out = graft.ext.TextAnalysis.kneserNeyScore(model, probe,
      "text", "doc_id").head()
    // T=1, V=2; Pc(b) = (1+1)/(1+2) = 2/3
    val expected = math.rint(math.log(2.0 / 3.0) * 1e6) / 1e6
    assert(out.getAs[Double]("mean_logkn") == BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("ngramNovelty: per-occurrence novelty against the model type set") {
    val model = Seq((10L, "a b c d")).toDF("doc_id", "text")
    val probe = Seq((1L, "a b c x y"), (2L, "a b")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.ngramNovelty(model, probe,
      "text", "doc_id", n = 3).collect()
    // doc 2 has < 3 tokens → no row; doc 1: "a b c" seen,
    // "b c x"/"c x y" unseen → 2/3
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_grams") == 3L && r.getAs[Long]("n_unseen") == 2L)
    assert(r.getAs[Long]("novelty_ppm") == 666666L)
  }

  test("itemCosine: binary cosine from shared-basket counts, support gate") {
    val inc = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L))
      .toDF("b", "i")
    val out = graft.ops.Associations.itemCosine(inc, col("b"), col("i"),
      minCommon = 2L, topK = 10).collect()
    // only (1,2) survives support >= 2: cos = 2/(√3·√2)
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_common") == 2L &&
      r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("cos_ppm") ==
      math.rint(2.0 / (math.sqrt(3.0) * math.sqrt(2.0)) * 1e6).toLong)
  }

  test("adamicAdar: shared selective baskets outscore broad ones") {
    // b1 = {1,2,3}, b2 = {1,2}, b3 = {1} (deg 1 drops).
    // (1,2) shares b1+b2: 1e9/ln3 + 1e9/ln2 rounded per basket;
    // (1,3), (2,3) share b1 only.
    val inc = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (30L, 1L)).toDF("b", "i")
    val r = Graph.adamicAdar(inc, col("b"), col("i"), topK = 10).collect()
    val w3 = math.rint(1e9 / math.log(3.0)).toLong // 910239227
    val w2 = math.rint(1e9 / math.log(2.0)).toLong // 1442695041
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
      x.getLong(3))).toSeq == Seq(
      (1L, 2L, 2L, w3 + w2), (1L, 3L, 1L, w3), (2L, 3L, 1L, w3)))
  }

  test("friedman: consistent treatment order across blocks — textbook Fr = 4") {
    // two complete blocks, ranks (1,2,3) in both; a third block missing
    // treatments drops entirely
    val df = Seq((1L, "t1", 10L), (1L, "t2", 20L), (1L, "t3", 30L),
      (2L, "t1", 1L), (2L, "t2", 2L), (2L, "t3", 3L),
      (3L, "t1", 99L)).toDF("b", "t", "v")
    val r = graft.ops.Aggregates.friedman(df, col("b"), col("t"), col("v"))
      .head()
    assert(r.getAs[Long]("n_blocks") == 2L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Double]("fr") == 4.0)
  }

  test("friedman: within-block ties use midranks; all-tied blocks cancel") {
    // blocks 1-2: values (5,5,9) → midranks (1.5,1.5,3); block 3 fully
    // tied contributes nothing to either side of the ratio
    val base = Seq((1L, "t1", 5L), (1L, "t2", 5L), (1L, "t3", 9L),
      (2L, "t1", 5L), (2L, "t2", 5L), (2L, "t3", 9L))
    val tied = Seq((3L, "t1", 7L), (3L, "t2", 7L), (3L, "t3", 7L))
    val f1 = graft.ops.Aggregates.friedman(base.toDF("b", "t", "v"),
      col("b"), col("t"), col("v")).head().getAs[Double]("fr")
    val f2 = graft.ops.Aggregates.friedman((base ++ tied).toDF("b", "t", "v"),
      col("b"), col("t"), col("v")).head().getAs[Double]("fr")
    assert(f1 == 4.0 && f2 == 4.0)
  }

  test("soundexCode: the classic NARA reference codes") {
    import graft.ops.EntityResolution
    val cases = Seq("Robert" -> "R163", "Rupert" -> "R163",
      "Ashcraft" -> "A261", "Ashcroft" -> "A261", "Tymczak" -> "T522",
      "Pfister" -> "P236", "Honeyman" -> "H555", "Jackson" -> "J250")
    val out = cases.map(_._1).toDF("name")
      .select(col("name"), EntityResolution.soundexCode(col("name")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (n, want) => assert(out(n) == want, s"$n") }
  }

  test("soundexPairs: phonetic twins pair, non-twins don't; " +
      "non-alphabetic drops") {
    import graft.ops.EntityResolution
    val df = Seq("Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
      "12345").toDF("name")
    val pairs = EntityResolution.soundexPairs(df, "name")
      .collect().map(r => (r.getAs[String]("code"),
        r.getAs[String]("name_a"), r.getAs[String]("name_b"))).toSet
    assert(pairs == Set(("R163", "Robert", "Rupert"),
      ("A261", "Ashcraft", "Ashcroft")))
  }

  test("quantileNormalize: rank-preserving map onto the reference scale") {
    val rows = Seq(10L, 20L, 30L, 40L).map(("ref", _)) ++
      Seq(1L, 2L, 3L, 4L).map(("cur", _))
    val out = Aggregates.quantileNormalize(rows.toDF("s", "v"), col("v"),
      col("s"), "ref", "cur")
      .collect().map(r => r.getAs[Long]("value") -> r.getAs[Long]("mapped"))
      .toMap
    assert(out == Map(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L))
  }

  test("quantileNormalize: duplicate-heavy target splits by CDF crossing") {
    // target {1,1,1,3}: value 1 has cum 3/4 → maps to ref's 75th
    val rows = Seq(10L, 20L, 30L, 40L).map(("ref", _)) ++
      Seq(1L, 1L, 1L, 3L).map(("cur", _))
    val out = Aggregates.quantileNormalize(rows.toDF("s", "v"), col("v"),
      col("s"), "ref", "cur")
      .collect().map(r => r.getAs[Long]("value") ->
        (r.getAs[Long]("n"), r.getAs[Long]("cum_frac_ppm"),
          r.getAs[Long]("mapped"))).toMap
    assert(out(1L) == ((3L, 750000L, 30L)))
    assert(out(3L) == ((1L, 1000000L, 40L)))
  }

  test("hellingerBinned: identical mixes 0, disjoint mixes 1") {
    val same = Seq((0L, "a"), (1L, "a"), (0L, "b"), (1L, "b"))
    val r1 = Aggregates.hellingerBinned(same.toDF("bin", "s"), col("bin"),
      col("s"), "a", "b").head()
    assert(r1.getAs[Double]("bc") == 1.0)
    assert(r1.getAs[Double]("hellinger") == 0.0)
    assert(r1.getAs[Double]("bhattacharyya") == 0.0)
    val disjoint = Seq((0L, "a"), (0L, "a"), (1L, "b"), (1L, "b"))
    val r2 = Aggregates.hellingerBinned(disjoint.toDF("bin", "s"), col("bin"),
      col("s"), "a", "b").head()
    assert(r2.getAs[Double]("bc") == 0.0)
    assert(r2.getAs[Double]("hellinger") == 1.0)
    assert(r2.isNullAt(r2.fieldIndex("bhattacharyya"))) // ln(0) -> declared null
  }

  test("ebShrinkage: small-n keys shrink to the prior, big-n keys hold") {
    import graft.ops.Features
    // four 10-trial keys at rates .2/.4/.6/.8 fit Beta(1.375, 1.375);
    // the 1-of-1 key shrinks to .633, the 2-of-10 key barely moves
    val rows =
      (1 to 10).map(i => ("k20", i <= 2)) ++
      (1 to 10).map(i => ("k40", i <= 4)) ++
      (1 to 10).map(i => ("k60", i <= 6)) ++
      (1 to 10).map(i => ("k80", i <= 8)) ++
      Seq(("tiny", true))
    val out = Features.ebShrinkage(rows.toDF("k", "s"), Seq(col("k")),
      col("s"), minN = 10L)
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("k20").getAs[Double]("alpha") == 1.375)
    assert(out("k20").getAs[Double]("beta") == 1.375)
    assert(out("tiny").getAs[Long]("raw_ppm") == 1000000L)
    assert(out("tiny").getAs[Long]("shrunk_ppm") == 633333L)
    assert(out("k20").getAs[Long]("shrunk_ppm") == 264706L)
  }

  test("lorenzCurve: tie-splitting decile walk on {1,1,1,1,6}") {
    val df = Seq(1L, 1L, 1L, 1L, 6L).toDF("v")
    val out = Aggregates.lorenzCurve(df, col("v"), nBins = 10)
      .orderBy(col("quantile")).collect()
      .map(r => r.getAs[Long]("quantile") ->
        (r.getAs[Long]("cum_value"), r.getAs[Long]("share_ppm"))).toMap
    assert(out(2L) == ((1L, 100000L)))  // bottom 20% = 1 row of value 1
    assert(out(8L) == ((4L, 400000L)))  // bottom 80% = all four 1s
    assert(out(10L) == ((10L, 1000000L)))
  }

  test("tostEquivalence: equivalent within a wide margin, not a tight one") {
    val df = (Seq(100L, 102L).map(("a", _)) ++ Seq(99L, 101L).map(("b", _)))
      .toDF("g", "v")
    val wide = Aggregates.tostEquivalence(df, col("v"), col("g"), "a", "b",
      margin = 10L).head()
    assert(wide.getAs[Double]("mean_diff") == 1.0)
    assert(wide.getAs[Double]("se") == 1.414214)
    assert(wide.getAs[Double]("t_lower") == 7.778175)
    assert(wide.getAs[Double]("t_upper") == -6.363961)
    assert(wide.getAs[Boolean]("equivalent"))
    val tight = Aggregates.tostEquivalence(df, col("v"), col("g"), "a", "b",
      margin = 1L).head()
    assert(tight.getAs[Double]("t_lower") == 1.414214)
    assert(!tight.getAs[Boolean]("equivalent"))
  }

  test("mcNemar: only the discordant cells decide") {
    // pred A right on 6 rows B misses; B right on 2 A misses; the
    // concordant cells are noise: χ² = (|6−2|−1)²/8 = 1.125
    val rows =
      Seq.fill(6)((true, false, true)) ++  // A right, B wrong
      Seq.fill(2)((false, true, true)) ++  // B right, A wrong
      Seq.fill(5)((true, true, true)) ++   // both right
      Seq.fill(3)((false, false, true))    // both wrong
    val r = Aggregates.mcNemar(rows.toDF("pa", "pb", "y"),
      col("pa"), col("pb"), col("y")).head()
    assert((r.getAs[Long]("only_a"), r.getAs[Long]("only_b")) == ((6L, 2L)))
    assert(r.getAs[Double]("chi2") == 1.125)
    assert(!r.getAs[Boolean]("significant"))
    val strong = rows ++ Seq.fill(14)((true, false, true)) // only_a = 20
    val r2 = Aggregates.mcNemar(strong.toDF("pa", "pb", "y"),
      col("pa"), col("pb"), col("y")).head()
    assert(r2.getAs[Double]("chi2") ==
      BigDecimal(17.0 * 17 / 22).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r2.getAs[Boolean]("significant"))
  }

  test("runsTest: perfect alternation and a pure streak mirror in z") {
    val alt = (1L to 10L).map(i => (i, i % 2 == 1))
    val streak = (1L to 10L).map(i => (i, i > 5))
    val za = Aggregates.runsTest(alt.toDF("t", "f"), col("t"), col("f"))
      .head()
    assert(za.getAs[Long]("n_runs") == 10L)
    // μ = 6, σ = √(5·4/9): z = 4/σ = 2.683282
    assert(za.getAs[Double]("z") == 2.683282)
    val zs = Aggregates.runsTest(streak.toDF("t", "f"), col("t"), col("f"))
      .head()
    assert(zs.getAs[Long]("n_runs") == 2L)
    assert(zs.getAs[Double]("z") == -2.683282)
  }

  test("woeEncoding: symmetric 3:1 split scores ±ln 2 and hand IV") {
    import graft.ops.Features
    val rows = Seq.fill(3)(("a", true)) ++ Seq.fill(1)(("a", false)) ++
      Seq.fill(1)(("b", true)) ++ Seq.fill(3)(("b", false))
    val out = Features.woeEncoding(rows.toDF("c", "e"), col("c"), col("e"))
      .collect().map(r => r.getAs[String]("category") -> r).toMap
    val ln2nano = math.round(math.log(2.0) * 1e9)
    assert(out("a").getAs[Long]("woe_nano") == ln2nano)
    assert(out("b").getAs[Long]("woe_nano") == -ln2nano)
    val term = math.round((1.0 / 3) * math.log(2.0) * 1e9)
    val wantIv = BigDecimal((2 * term).toDouble / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("a").getAs[Double]("iv") == wantIv)
  }

  test("cronbachAlpha: duplicated item scores alpha 1; constant totals " +
      "have no scale variance") {
    // item 2 == item 1 for every subject → perfectly consistent scale
    val dup = (1L to 4L).flatMap(s => Seq((s, 1, s), (s, 2, s)))
    val r1 = Aggregates.cronbachAlpha(dup.toDF("s", "it", "v"),
      col("s"), col("it"), col("v"), nItems = 2).head()
    assert(r1.getAs[Long]("n_subjects") == 4L)
    assert(r1.getAs[Double]("alpha") == 1.0)
    // item 2 == 5 − item 1 → every total is 5 → zero total variance
    val anti = (1L to 4L).flatMap(s => Seq((s, 1, s), (s, 2, 5 - s)))
    val r2 = Aggregates.cronbachAlpha(anti.toDF("s", "it", "v"),
      col("s"), col("it"), col("v"), nItems = 2).head()
    assert(r2.isNullAt(r2.fieldIndex("alpha")))
    // an incomplete subject drops
    val withPartial = dup :+ ((9L, 1, 9L))
    assert(Aggregates.cronbachAlpha(withPartial.toDF("s", "it", "v"),
      col("s"), col("it"), col("v"), nItems = 2)
      .head().getAs[Long]("n_subjects") == 4L)
  }

  test("partialCorrelation: controlling the dominant confounder reveals " +
      "the exact relation") {
    // y = x + z with x ⊥ z: raw r_xy ≈ 0.1, partial r_xy·z = 1
    val rows = Seq((0L, 0L), (0L, 10L), (1L, 0L), (1L, 10L))
      .map { case (x, z) => (x, x + z, z) }
    val r = Aggregates.partialCorrelation(rows.toDF("x", "y", "z"),
      col("x"), col("y"), col("z")).head()
    assert(r.getAs[Double]("r_xz") == 0.0)
    assert(r.getAs[Double]("r_xy") < 0.11)
    assert(r.getAs[Double]("r_partial") == 1.0)
  }

  test("regressionInfluence: the off-line point tops Cook's ranking") {
    val pts = Seq((1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L), (4L, 4L, 10L))
    val out = Aggregates.regressionInfluence(pts.toDF("id", "x", "y"),
      col("id"), col("x"), col("y"), topK = 4).collect()
    assert(out.head.getAs[Long]("id") == 4L)
    val ds = out.map(_.getAs[Double]("cooks_d"))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
  }

  test("qnScale: pairwise-difference quartile on {1,2,3,4}; all-equal " +
      "keys score 0") {
    val df = (Seq(1L, 2L, 3L, 4L).map(("k", _)) ++
      Seq(5L, 5L, 5L).map(("z", _))).toDF("g", "v")
    val out = Aggregates.qnScale(df, Seq("g"), col("v"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("k").getAs[Long]("n_pairs") == 6L)
    assert(out("k").getAs[Long]("q25_absdiff") == 1L)
    assert(out("k").getAs[Double]("qn") == 2.2219)
    assert(out("z").getAs[Long]("q25_absdiff") == 0L)
  }

  test("blandAltman: tight cluster plus one escapee — limits and the " +
      "outside count") {
    // 20 zero differences + one of 10: sd ≈ 2.18, loa_high ≈ 4.75
    val rows = Seq.fill(20)((5L, 5L)) :+ ((15L, 5L))
    val r = Aggregates.blandAltman(rows.toDF("a", "b"), col("a"), col("b"))
      .head()
    assert(r.getAs[Long]("n") == 21L)
    assert(r.getAs[Long]("n_outside") == 1L)
    assert(r.getAs[Long]("outside_ppm") == 47619L)
    assert(r.getAs[Double]("loa_high") < 10.0)
  }

  test("wasserstein1: all mass moving distance d scores exactly d") {
    val df = (Seq(0L, 0L).map(("a", _)) ++ Seq(10L, 10L).map(("b", _)))
      .toDF("s", "v")
    val r = Aggregates.wasserstein1(df, col("v"), col("s"), "a", "b").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("w1") == 10.0)
    val same = (Seq(1L, 5L).map(("a", _)) ++ Seq(1L, 5L).map(("b", _)))
      .toDF("s", "v")
    assert(Aggregates.wasserstein1(same, col("v"), col("s"), "a", "b")
      .head().getAs[Double]("w1") == 0.0)
  }

  test("wasserstein1: partial overlap — hand CDF integral") {
    // A = {0, 1}, B = {1, 2}: |F_A − F_B| is 1/2 on [0,1) and [1,2) → 1
    val df = (Seq(0L, 1L).map(("a", _)) ++ Seq(1L, 2L).map(("b", _)))
      .toDF("s", "v")
    val r = Aggregates.wasserstein1(df, col("v"), col("s"), "a", "b").head()
    assert(r.getAs[Long]("n_values") == 3L)
    assert(r.getAs[Double]("w1") == 1.0)
  }

  test("abcClassification: 80/15/5 split lands one item per class") {
    val df = Seq((1L, 80L), (2L, 15L), (3L, 5L)).toDF("k", "v")
    val out = Aggregates.abcClassification(df, col("k"), col("v"))
      .collect().map(r => r.getAs[String]("abc_class") ->
        (r.getAs[Long]("n_items"), r.getAs[Long]("class_value"),
          r.getAs[Long]("share_ppm"))).toMap
    assert(out("A") == ((1L, 80L, 800000L)))
    assert(out("B") == ((1L, 15L, 150000L)))
    assert(out("C") == ((1L, 5L, 50000L)))
  }

  test("andersonDarling: an extreme outlier flags non-normal; " +
      "near-uniform mid-sample does not") {
    val outlier = ((1L to 19L) :+ 1000L).toDF("v")
    val r1 = Aggregates.andersonDarling(outlier, col("v")).head()
    assert(r1.getAs[Boolean]("non_normal"))
    val mild = (1L to 20L).toDF("v")
    val r2 = Aggregates.andersonDarling(mild, col("v")).head()
    assert(!r2.getAs[Boolean]("non_normal"))
    assert(r2.getAs[Long]("n") == 20L)
  }

  test("overdispersionAudit: burst key flags, constant key cannot") {
    val df = (Seq(2L, 2L, 2L, 2L).map(("flat", _)) ++
      Seq(0L, 0L, 0L, 12L).map(("burst", _))).toDF("k", "c")
    val out = Aggregates.overdispersionAudit(df, Seq(col("k")), col("c"))
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("flat").getAs[Double]("dispersion") == 0.0)
    assert(!out("flat").getAs[Boolean]("overdispersed"))
    assert(out("burst").getAs[Double]("dispersion") == 12.0)
    assert(out("burst").getAs[Double]("chi2") == 36.0)
    assert(out("burst").getAs[Boolean]("overdispersed"))
  }

  test("hodgesLehmann: textbook {1,2,6} — lower median of Walsh averages") {
    // Walsh averages {1, 1.5, 2, 3.5, 4, 6}; even count → LOWER median 2
    val df = Seq(("x", 1L), ("x", 2L), ("x", 6L)).toDF("k", "v")
    val r = Aggregates.hodgesLehmann(df, Seq("k"), col("v")).head()
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Long]("hl_doubled") == 4L)
    assert(r.getAs[Double]("hl") == 2.0)
  }

  test("hodgesLehmann: duplicate values weight the diagonal c(c+1)/2") {
    // {1,1,3}: sums 2(w3), 4(w2), 6(w1); crossing at d=2 → HL = 1
    val df = Seq(("x", 1L), ("x", 1L), ("x", 3L)).toDF("k", "v")
    val r = Aggregates.hodgesLehmann(df, Seq("k"), col("v")).head()
    assert(r.getAs[Long]("n_pairs") == 6L && r.getAs[Long]("hl_doubled") == 2L)
    assert(r.getAs[Double]("hl") == 1.0)
  }

  test("hodgesLehmann: outlier-immune per key where the mean is not") {
    // key a: {10,11,12} HL=11; key b adds an outlier 1000 to the same
    // base — HL moves only to the next Walsh average (11.5), mean to 258
    val df = (Seq(("a", 10L), ("a", 11L), ("a", 12L)) ++
      Seq(("b", 10L), ("b", 11L), ("b", 12L), ("b", 1000L))).toDF("k", "v")
    val out = Aggregates.hodgesLehmann(df, Seq("k"), col("v"))
      .orderBy(col("k")).collect()
    assert(out(0).getAs[Double]("hl") == 11.0)
    assert(out(1).getAs[Double]("hl") == 11.5)
  }

  test("A-stat: cliffsDelta — hand pair counts, identity and magnitude bands") {
    import graft.ops.Aggregates
    // A = {1, 2, 2}, B = {2, 3}: gt = #{a>b} = 0, ties = 2 (a=2 vs b=2
    // twice), lt = 6 - 0 - 2 = 4; delta = (0-4)/6
    val df = (Seq(1L, 2L, 2L).map(("A", _)) ++ Seq(2L, 3L).map(("B", _)))
      .toDF("g", "v")
    val r = Aggregates.cliffsDelta(df, col("v"), col("g"), "A", "B").head()
    assert(r.getAs[Long]("gt_pairs") == 0L)
    assert(r.getAs[Long]("tie_pairs") == 2L)
    assert(r.getAs[Long]("lt_pairs") == 4L)
    assert(r.getAs[Double]("delta") == -4.0 / 6.0)
    assert(r.getAs[String]("magnitude") == "large")
    // identical samples: delta exactly 0, everything ties or balances
    val same = (Seq(1L, 2L).map(("A", _)) ++ Seq(1L, 2L).map(("B", _)))
      .toDF("g", "v")
    val s = Aggregates.cliffsDelta(same, col("v"), col("g"), "A", "B").head()
    assert(s.getAs[Double]("delta") == 0.0)
    assert(s.getAs[String]("magnitude") == "negligible")
  }

  test("A-stat: yuenTrimmedT — trim boundaries, winsorized sums, hand t") {
    import graft.ops.Aggregates
    // A = {0, 10, 11, 12, 100} with 20% trim: g = 1, keep ranks 2..4 =
    // {10, 11, 12} (mean 11); winsorize to [10, 12]: {10,10,11,12,12}
    // B = {0, 20, 21, 22, 100}: trimmed {20,21,22} (mean 21)
    val df = (Seq(0L, 10L, 11L, 12L, 100L).map(("A", _)) ++
      Seq(0L, 20L, 21L, 22L, 100L).map(("B", _))).toDF("g", "v")
    val r = Aggregates.yuenTrimmedT(df, col("v"), col("g"), "A", "B",
      gNum = 1, gDen = 5).head()
    assert(r.getAs[Long]("n_a") == 5L && r.getAs[Long]("h_a") == 3L)
    assert(r.getAs[Double]("mean_trim_a") == 11.0)
    assert(r.getAs[Double]("mean_trim_b") == 21.0)
    // winsorized var identical for both groups (same shape): t from the
    // pinned chain; just assert direction and symmetry
    assert(r.getAs[Double]("t_stat") < 0)
    val rev = Aggregates.yuenTrimmedT(df, col("v"), col("g"), "B", "A",
      gNum = 1, gDen = 5).head()
    assert(rev.getAs[Double]("t_stat") == -r.getAs[Double]("t_stat"))
    // duplicates straddling the trim boundary: partial inclusion
    // A = {5, 5, 5, 5, 9}: g = 1 -> keep ranks 2..4 = {5, 5, 5}
    val dup = (Seq(5L, 5L, 5L, 5L, 9L).map(("A", _)) ++
      Seq(1L, 2L, 3L, 4L, 5L).map(("B", _))).toDF("g", "v")
    val d = Aggregates.yuenTrimmedT(dup, col("v"), col("g"), "A", "B",
      gNum = 1, gDen = 5).head()
    assert(d.getAs[Double]("mean_trim_a") == 5.0)
  }

  test("A-stat: sprt — crossing, sticky decision, exact integer LLR") {
    import graft.ops.Experimentation
    // toy: llr success +3, failure -1, bounds +5 / -5
    // look 1: 2 successes, 0 failures -> LLR 6 >= 5: reject_h0
    // look 2 adds 2 failures: LLR 4 -> 'continue' but decided stays true
    val df = Seq((1L, 1), (1L, 1), (2L, 0), (2L, 0)).toDF("lk", "s")
    val out = Experimentation.sprt(df, col("lk"), col("s") === 1,
      llrSuccessMicro = 3L, llrFailureMicro = -1L,
      upperMicro = 5L, lowerMicro = -5L).orderBy("look").collect()
    assert(out(0).getAs[Long]("llr_micro") == 6L)
    assert(out(0).getAs[String]("decision") == "reject_h0")
    assert(out(0).getAs[Boolean]("decided"))
    assert(out(1).getAs[Long]("llr_micro") == 4L)
    assert(out(1).getAs[String]("decision") == "continue")
    assert(out(1).getAs[Boolean]("decided")) // sticky: crossed at look 1
  }

  test("J-ER: fellegiSunter — hand m/u, smoothing, weight signs") {
    import graft.ops.EntityResolution
    // 2 matches (field agrees on both), 2 non-matches (agrees on one)
    val pairs = Seq(
      (true, true), (true, true), (false, true), (false, false))
      .toDF("is_match", "f")
    val r = EntityResolution.fellegiSunter(pairs, col("is_match"),
      Seq("f" -> col("f"))).head()
    assert(r.getAs[Long]("n_match") == 2L && r.getAs[Long]("n_unmatch") == 2L)
    // m = (2+1)/(2+2) = 750000 ppm, u = (1+1)/(2+2) = 500000 ppm
    assert(r.getAs[Long]("m_ppm") == 750000L)
    assert(r.getAs[Long]("u_ppm") == 500000L)
    // agreement on a discriminative field carries positive weight,
    // disagreement negative
    assert(r.getAs[Long]("w_agree_nano") > 0)
    assert(r.getAs[Long]("w_disagree_nano") < 0)
    assert(r.getAs[Long]("w_agree_nano") ==
      math.round((math.log(750000.0) - math.log(500000.0)) * 1e9))
  }

  test("A-stat: kishNeff — equal weights keep n, concentration shrinks it") {
    import graft.ops.Aggregates
    val eq = Seq(("s", 10L), ("s", 10L), ("s", 10L), ("s", 10L))
      .toDF("sl", "w")
    val r = Aggregates.kishNeff(eq, col("sl"), col("w")).head()
    assert(r.getAs[Double]("n_eff") == 4.0 && r.getAs[Double]("deff") == 1.0)
    // one dominant weight: n_eff -> ~1
    val sk = Seq(("s", 1000L), ("s", 1L), ("s", 1L), ("s", 1L))
      .toDF("sl", "w")
    val k = Aggregates.kishNeff(sk, col("sl"), col("w")).head()
    assert(k.getAs[Double]("n_eff") < 1.01 && k.getAs[Double]("deff") > 3.9)
  }

  test("A-privacy: tClosenessPerClass — uniform class scores 0, skewed flags") {
    import graft.ops.Privacy
    // both classes mirror the global {0,1} split exactly -> t = 0
    val mirror = Seq(("A", 0L), ("A", 1L), ("A", 0L), ("A", 1L),
      ("B", 0L), ("B", 1L))
    val mo = Privacy.tClosenessPerClass(mirror.toDF("q", "v"),
      Seq(col("q")), col("v")).orderBy("q").collect()
    assert(mo.forall(_.getAs[Long]("t_ppm") == 0L))
    // opposite-tail classes: A = {0,0}, B = {1,1}; global {0:2, 1:2},
    // N = 4, m = 2. A at v=0: |2*4 - 2*2| = 4; v=1: 0 -> emd 4,
    // t = 1e6*4/(2*4*1) = 500000 (and B symmetric)
    val skew = Seq(("A", 0L), ("A", 0L), ("B", 1L), ("B", 1L))
    val so = Privacy.tClosenessPerClass(skew.toDF("q", "v"),
      Seq(col("q")), col("v")).orderBy("q").collect()
    assert(so.map(_.getAs[Long]("emd_num")).toSeq == Seq(4L, 4L))
    assert(so.map(_.getAs[Long]("t_ppm")).toSeq == Seq(500000L, 500000L))
    // audit gate counts both violators
    val gate = Privacy.tClosenessAudit(skew.toDF("q", "v"),
      Seq(col("q")), col("v"), tPpm = 100000L).head()
    assert(gate.getAs[Long]("n_classes") == 2L)
    assert(gate.getAs[Long]("classes_above_t") == 2L)
  }

  test("A-stat: horvitzThompson — certainty units exact, expansion unbiased form") {
    import graft.ops.Aggregates
    // two certainty units (pi = 1) and one 50% unit: q = y/pi
    val df = Seq(("s", 10L, 1000000L), ("s", 20L, 1000000L),
      ("s", 7L, 500000L)).toDF("sl", "y", "p")
    val r = Aggregates.horvitzThompson(df, col("sl"), col("y"), col("p"))
      .head()
    assert(r.getAs[Long]("n_sampled") == 3L)
    assert(r.getAs[Long]("ht_total") == 10L + 20L + 14L)
    // variance: certainty units contribute 0; the 50% unit
    // (1e6-5e5) * 14^2 / 1e6 = 98
    assert(r.getAs[Double]("var_hat") == 98.0)
  }

  test("A-stat: poissonBootstrapSE — deterministic, sane SE on a constant") {
    import graft.ops.Aggregates
    // constant metric: every resample mean equals it -> SE exactly 0
    val const = (1 to 40).map(i => (i.toLong, 7L)).toDF("id", "y")
    val c = Aggregates.poissonBootstrapSE(const, col("id"), col("y"), 20)
      .head()
    assert(c.getAs[Long]("mean_micro") == 7000000L)
    assert(c.getAs[Double]("se") == 0.0)
    // determinism: identical inputs give identical SE across runs
    val varied = (1 to 40).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "y")
    val s1 = Aggregates.poissonBootstrapSE(varied, col("id"), col("y"), 30)
      .head().getAs[Double]("se")
    val s2 = Aggregates.poissonBootstrapSE(varied, col("id"), col("y"), 30)
      .head().getAs[Double]("se")
    assert(s1 == s2 && s1 > 0.0)
    // ballpark: SE of the mean of 40 iid values ~ sd/sqrt(40)
    val sd = {
      val ys = (1 to 40).map(i => (i % 7).toDouble)
      val m = ys.sum / 40
      math.sqrt(ys.map(v => (v - m) * (v - m)).sum / 39)
    }
    assert(s1 > sd / math.sqrt(40) / 3 && s1 < sd / math.sqrt(40) * 3)
  }

  test("A-causal: quantileTreatmentEffects — exact order stats per arm") {
    import graft.ops.Experimentation
    // A = 1..8 (q25 = 2, q50 = 4, q75 = 6), B = 11..18 shifted by 10
    val rows = (1 to 8).map(v => ("A", v.toLong)) ++
      (11 to 18).map(v => ("B", v.toLong))
    val out = Experimentation.quantileTreatmentEffects(rows.toDF("g", "v"),
      col("v"), col("g"), "A", "B", Seq(250000L, 500000L, 750000L))
      .orderBy("q_ppm").collect()
    assert(out.map(_.getAs[Long]("v_a")).toSeq == Seq(2L, 4L, 6L))
    assert(out.map(_.getAs[Long]("v_b")).toSeq == Seq(12L, 14L, 16L))
    assert(out.forall(_.getAs[Long]("qte") == -10L))
  }

  test("A-stat: leveneBrownForsythe — equal spreads score 0, unequal positive") {
    // A and B have IDENTICAL |2y - med2| deviation sets -> ssb_u = 0
    val same = Seq(("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 11L), ("B", 12L), ("B", 13L)).toDF("g", "y")
    val r0 = Aggregates.leveneBrownForsythe(same, col("y"), col("g")).head()
    assert(r0.getAs[Long]("k") == 2L && r0.getAs[Long]("n") == 6L)
    // ssb is zero up to the micro-unit rounding of the S^2/n terms
    // (round(1e6*16/3)*2 vs round(1e6*64/6) differ by 1 micro-unit)
    assert(math.abs(r0.getAs[Long]("ssb_u")) <= 2L)
    assert(math.abs(r0.getAs[Double]("f_stat")) < 1e-3)
    // B spread 10x wider -> strictly positive F
    val wide = Seq(("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 10L), ("B", 20L), ("B", 30L)).toDF("g", "y")
    val r1 = Aggregates.leveneBrownForsythe(wide, col("y"), col("g")).head()
    assert(r1.getAs[Double]("f_stat") > 0.0)
  }

  test("A-stat: leveneBrownForsythe — med2 is the true lower+upper median") {
    // odd n, skewed {0,1,10}: median 1 -> med2 = 2 -> z2 = {2,0,18}
    // (an off-by-one med2 of 11 would give z2 = {11,9,9})
    // ssw_u = 1e6*Σz2² − round(1e6*(Σz2)²/n) = 328e6 − 133333333
    val odd = Seq(("A", 0L), ("A", 1L), ("A", 10L)).toDF("g", "y")
    val ro = Aggregates.leveneBrownForsythe(odd, col("y"), col("g")).head()
    assert(ro.getAs[Long]("n") == 3L)
    assert(ro.getAs[Long]("ssw_u") == 328000000L - 133333333L)
    // even n {1,2,3,10}: lower median 2, upper 3 -> med2 = 5 ->
    // z2 = {3,1,1,15} (doubling the upper median, med2 = 6, would
    // give {4,2,0,14}); ssw_u = 236e6 − 100000000
    val even = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 10L))
      .toDF("g", "y")
    val re = Aggregates.leveneBrownForsythe(even, col("y"), col("g")).head()
    assert(re.getAs[Long]("n") == 4L)
    assert(re.getAs[Long]("ssw_u") == 236000000L - 100000000L)
  }

  test("privacy: dpCounts — noise replays the splitmix/ctz arithmetic exactly") {
    // hand-replicate the mechanism for keys 0..9 (the JVM is the
    // reference implementation: wrapping long = mod 2^64)
    def mix(s: Long): Long = {
      var z = s
      z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
      z ^= (z >>> 27); z *= 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def ctz(u: Long) =
      math.min(java.lang.Long.bitCount((u & -u) - 1L), 64)
    def expected(key: Long, k: Int): Long =
      ctz(mix(key + 0x9E3779B97F4A7C15L)) / k -
        ctz(mix(key + 0x6A09E667F3BCC909L)) / k
    val df = (0L until 10L).flatMap(k => Seq.fill(3)(k)).toDF("key")
    val out = graft.ops.Privacy.dpCounts(df, col("key"), k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0L until 10L).foreach { key =>
      assert(out(key)._1 == 3L)
      assert(out(key)._2 == expected(key, 2), s"key $key")
    }
    // the Mix64 expression agrees between codegen and the hand fold
    val n64 = (0 until 80).map(_.toLong).toDF("s")
      .select(graft.ext.Mix64(col("s")).as("u")).collect()
      .map(_.getLong(0))
    assert(n64.zipWithIndex.forall { case (u, i) => u == mix(i.toLong) })
  }

  test("privacy: dpCounts draws are not affinely coupled (advisor r7)") {
    // the LCG pathology: u2 - u1 was a key-independent constant, so
    // for k >= 3 the two geometrics could NEVER both be nonzero.
    // With the splitmix mixer both-nonzero must occur at roughly the
    // independent rate: P(G1>0, G2>0) = (2^-k)^2 = 1/64 at k = 3 —
    // over 4096 keys expect ~64 hits; assert a generous > 10.
    val df = (0L until 4096L).toDF("key")
    val out = graft.ops.Privacy.dpCounts(df, col("key"), k = 3)
    def mix(s: Long): Long = {
      var z = s
      z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
      z ^= (z >>> 27); z *= 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def g(u: Long, k: Int) =
      math.min(java.lang.Long.bitCount((u & -u) - 1L), 64) / k
    val bothNonzero = (0L until 4096L).count { key =>
      g(mix(key + 0x9E3779B97F4A7C15L), 3) > 0 &&
        g(mix(key + 0x6A09E667F3BCC909L), 3) > 0
    }
    assert(bothNonzero > 10,
      s"both-geometrics-nonzero count $bothNonzero — affine coupling?")
    // and the engine agrees with the replay on the same 4096 keys
    val noise = out.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0L until 4096L).foreach { key =>
      val exp = g(mix(key + 0x9E3779B97F4A7C15L), 3) -
        g(mix(key + 0x6A09E667F3BCC909L), 3)
      assert(noise(key) == exp, s"key $key")
    }
  }

  test("A-stat: hodgesLehmann — hand Walsh medians, robust to one outlier") {
    // values 1,2,3 (ties 1,2,3): Walsh sums (i<=j): 2,3,4,4,5,6 ->
    // lower median = 4 -> HL = 2 (= the median here)
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L))
      .toDF("g", "v", "t")
    val r = Aggregates.hodgesLehmann(df, Seq(col("g")), col("v"), col("t"))
      .head()
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Long]("hl2") == 4L)
    // one wild outlier moves the mean to 251.5 but HL only to 3
    //   values 1,2,3,1000: walsh sums sorted:
    //   2,3,4,4,5,6,1001,1002,1003,2000 -> lower median = 5 -> HL 2.5
    val out = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L),
      ("g", 1000L, 4L)).toDF("g", "v", "t")
    val r2 = Aggregates.hodgesLehmann(out, Seq(col("g")), col("v"), col("t"))
      .head()
    assert(r2.getAs[Long]("n_pairs") == 10L)
    assert(r2.getAs[Long]("hl2") == 5L)
  }

  test("A-stat: medianOfMeans — one poisoned bucket cannot move the estimate") {
    // 9 buckets keyed by id%9; clean values all 100 -> every bucket
    // mean 100e6 except bucket 0, poisoned with 1e9
    val rows = (0L until 90L).map(i => (i, if (i % 9 == 0) 1000000000L else 100L))
    val df = rows.toDF("id", "v")
    val r = Aggregates.medianOfMeans(df, col("v"), col("id"), 9).head()
    assert(r.getAs[Long]("n") == 90L && r.getAs[Long]("k_buckets") == 9L)
    assert(r.getAs[Long]("mom_micro") == 100L * 1000000L)
    // the plain mean would be poisoned: (80*100 + 10*1e9)/90 >> 100
  }

  test("A-stat: chowTest — a planted slope break dwarfs a stable relation") {
    // x = 1..20; first half y = 2x +/- 1, second half y = 10x +/- 1
    def seg(xs: Range, slope: Long) = xs.map(x =>
      (x.toLong, slope * x + (if (x % 2 == 0) 1L else -1L), x > 10))
    val break_ = (seg(1 to 10, 2L) ++ seg(11 to 20, 10L)).toDF("x", "y", "s")
    val rb = Aggregates.chowTest(break_, col("x"), col("y"), col("s")).head()
    assert(rb.getAs[Long]("n1") == 10L && rb.getAs[Long]("n2") == 10L)
    val stable = (seg(1 to 10, 2L) ++ seg(11 to 20, 2L)).toDF("x", "y", "s")
    val rs = Aggregates.chowTest(stable, col("x"), col("y"), col("s")).head()
    assert(rb.getAs[Double]("f_stat") > 100 * rs.getAs[Double]("f_stat"),
      s"break F ${rb.getAs[Double]("f_stat")} vs stable ${rs.getAs[Double]("f_stat")}")
  }

  test("A-stat: durbinWatson — alternating residuals near 4, exact fit null") {
    // y = 5x + alternating +/-100 over even x-run: residuals alternate
    // sign, so DW -> 4(n-1)/n (strong negative autocorrelation)
    val alt = (1 to 20).map(x =>
      ("k", x.toLong, 5L * x + (if (x % 2 == 0) 100L else -100L)))
      .toDF("k", "x", "y")
    val r = Aggregates.durbinWatson(alt, col("k"), col("x"), col("y")).head()
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Double]("dw") > 3.0, s"alternating must push DW toward 4, got $r")
    // an exact fit has zero residuals -> dw undefined (null), not NaN
    val exact = (1 to 10).map(x => ("k", x.toLong, 7L * x)).toDF("k", "x", "y")
    val re = Aggregates.durbinWatson(exact, col("k"), col("x"), col("y")).head()
    assert(re.isNullAt(re.fieldIndex("dw")))
  }

  test("A-stat: binarySegmentation — staircase splits at the jumps, tie to earlier") {
    // 10,10,... (t 1-10), 50,... (11-20), 90,... (21-30): root gain ties
    // between t=10 and t=20 -> earlier wins; right segment then splits
    // at 20; the constant left segment has zero gain
    val series = (1 to 30).map(t =>
      (t.toLong, if (t <= 10) 10L else if (t <= 20) 50L else 90L))
      .toDF("t", "y")
    val out = Aggregates.binarySegmentation(series, col("t"), col("y"))
      .orderBy(col("level"))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(out(0)._1 == 1L && out(0)._2 == 10L, s"root: ${out.toSeq}")
    assert(out(1)._1 == 2L && out(1)._3 == 0.0, s"left: ${out.toSeq}")
    assert(out(2)._1 == 3L && out(2)._2 == 20L, s"right: ${out.toSeq}")
  }
  test("A-stat: chao1Richness — hand abundance spectrum, saturated group") {
    // group 1: A,B singletons, C doubleton, D tripleton:
    // n=7, s=4, f1=2, f2=1, chao1 = 4 + 2*1/(2*2) = 4.5, cov = 5/7
    val df = (Seq("A", "B", "C", "C", "D", "D", "D").map((1, _)) ++
      Seq("X", "X", "X", "Y", "Y").map((2, _))).toDF("g", "sp")
    val out = graft.ops.Aggregates.chao1Richness(df, col("sp"), col("g"))
      .collect().map(r => r.getInt(0) -> r).toMap
    val g1 = out(1)
    assert(g1.getAs[Long]("n_obs") == 7L && g1.getAs[Long]("s_obs") == 4L)
    assert(g1.getAs[Long]("f1") == 2L && g1.getAs[Long]("f2") == 1L)
    assert(math.abs(g1.getAs[Double]("chao1") - 4.5) < 1e-12)
    assert(math.abs(g1.getAs[Double]("coverage") - 5.0 / 7.0) < 1e-12)
    // group 2: no singletons -> chao1 = s_obs, full coverage
    val g2 = out(2)
    assert(g2.getAs[Long]("f1") == 0L)
    assert(math.abs(g2.getAs[Double]("chao1") - 2.0) < 1e-12)
    assert(g2.getAs[Double]("coverage") == 1.0)
  }
  test("A-stat: marketConcentration — hand HHI/CRk, equal-share tie determinism") {
    // market m: shares 50/30/20 -> HHI 2500+900+400 = 3800 points
    val df = Seq(("m", "a", 50L), ("m", "b", 30L), ("m", "c", 20L),
      ("t", "p", 10L), ("t", "q", 10L)).toDF("mk", "f", "v")
    val out = graft.ops.Aggregates.marketConcentration(
      df, col("mk"), col("f"), col("v")).collect()
      .map(r => r.getString(0) -> r).toMap
    val m = out("m")
    assert(m.getAs[Long]("n_firms") == 3L && m.getAs[Long]("total") == 100L)
    assert(math.abs(m.getAs[Double]("hhi") - 3800.0) < 1e-9)
    assert(math.abs(m.getAs[Double]("cr1") - 0.5) < 1e-12)
    assert(m.getAs[Double]("cr4") == 1.0 && m.getAs[Double]("cr8") == 1.0)
    // duopoly with equal shares: HHI 5000, CR1 deterministic at 0.5
    val t = out("t")
    assert(math.abs(t.getAs[Double]("hhi") - 5000.0) < 1e-9)
    assert(math.abs(t.getAs[Double]("cr1") - 0.5) < 1e-12)
  }

  test("A-stat: atkinsonIndex — equality is zero, hand micro-nat case, nonpositive drop") {
    val eq = Seq(("e", 5L), ("e", 5L), ("e", 5L)).toDF("g", "x")
    val r0 = graft.ops.Aggregates.atkinsonIndex(eq, col("x"), col("g"))
      .collect()(0)
    assert(r0.getAs[Double]("atkinson") == 0.0)
    // values 1 and 7 (plus a dropped 0): replay the integer pipeline
    val df = Seq(("g", 1L), ("g", 7L), ("g", 0L)).toDF("g", "x")
    val r = graft.ops.Aggregates.atkinsonIndex(df, col("x"), col("g"))
      .collect()(0)
    assert(r.getAs[Long]("n") == 2L && r.getAs[Long]("sum_x") == 8L)
    val lnu7 = math.round(math.log(7.0) * 1e6)
    val meanLn = lnu7 / 2 // ln(1) term is 0
    assert(r.getAs[Long]("mean_ln_micro") == meanLn)
    val expect = BigDecimal(
      1.0 - math.exp(meanLn.toDouble / 1e6) / (8.0 / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("atkinson") == expect)
  }
  test("A-stat: weibullPlotFit — pipeline replay on hand points, degenerate group null") {
    // group g: durations 1, 2, 2, 4 -> distinct points (1,1) (2,3) (4,4)
    val df = Seq(("g", 1L), ("g", 2L), ("g", 2L), ("g", 4L),
      ("d", 3L), ("d", 3L)).toDF("g", "t")
    val out = graft.ops.EventAnalytics.weibullPlotFit(df, col("t"), col("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    // replay the op's exact integer pipeline in scala
    val pts = Seq((1L, 1L), (2L, 3L), (4L, 4L)).map { case (t, cum) =>
      val f = (cum.toDouble * 10.0 - 3.0) / (4.0 * 10.0 + 4.0)
      (math.round(math.log(t.toDouble) * 1e6),
        math.round(math.log(-math.log(1.0 - f)) * 1e6))
    }
    val m = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxxN = (m * sxx - sx * sx).toDouble
    val sxyN = (m * sxy - sx * sy).toDouble
    val syyN = (m * syy - sy * sy).toDouble
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val g = out("g")
    assert(g.getAs[Long]("n") == 4L && g.getAs[Long]("m_points") == 3L)
    assert(g.getAs[Double]("shape") == r6(sxyN / sxxN))
    assert(g.getAs[Double]("scale") == r6(math.exp(
      (sx.toDouble / 3.0 - sy.toDouble / 3.0 / (sxyN / sxxN)) / 1e6)))
    assert(g.getAs[Double]("r2") == r6(sxyN * sxyN / (sxxN * syyN)))
    // single distinct duration: no line to fit
    val d = out("d")
    assert(d.isNullAt(d.fieldIndex("shape")))
  }
  test("A-stat: aalenJohansen — hand 3-subject fold, CIF identity up to floor dust") {
    // t=1 cause1, t=2 cause2, t=3 censored
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("dur", "ev")
    val out = graft.ops.EventAnalytics.aalenJohansen(df, col("dur"),
      col("ev") === "a", col("ev") === "b")
      .orderBy("t").collect()
    assert(out.map(_.getAs[Long]("n_risk")).toSeq == Seq(3L, 2L, 1L))
    assert(out(0).getAs[Long]("surv_ppm") == 666666L)
    assert(out(0).getAs[Long]("cif1_ppm") == 333333L)
    assert(out(0).getAs[Long]("cif2_ppm") == 0L)
    assert(out(1).getAs[Long]("surv_ppm") == 333333L)
    assert(out(1).getAs[Long]("cif2_ppm") == 333333L)
    // censoring leaves the risk set without hazard
    assert(out(2).getAs[Long]("censored") == 1L)
    assert(out(2).getAs[Long]("surv_ppm") == 333333L)
    // S + CIF1 + CIF2 = 1 up to floor dust at every step
    out.foreach { r =>
      val tot = r.getAs[Long]("surv_ppm") + r.getAs[Long]("cif1_ppm") +
        r.getAs[Long]("cif2_ppm")
      assert(tot <= 1000000L && tot >= 999997L, s"identity: $tot")
    }
  }
  test("privacy: mondrianKAnonymity — hand split tree, k floor holds") {
    // 8 points on a line, k=2: median splits give 4 partitions of 2
    val df = (1L to 8L).map(i => (i, i, 0L)).toDF("id", "v1", "v2")
    val out = graft.ops.Privacy.mondrianKAnonymity(
      df, col("id"), col("v1"), col("v2"), k = 2, rounds = 3)
      .orderBy("qi1_min").collect()
    assert(out.length == 4)
    assert(out.map(r => (r.getAs[Long]("qi1_min"), r.getAs[Long]("qi1_max")))
      .toSeq == Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)))
    assert(out.forall(_.getAs[Long]("n") == 2L))
    // a skewed 2-D set: every final class still carries n >= k
    val sk = (1L to 100L).map(i => (i, (i * i) % 97, i % 5)).toDF("id", "v1", "v2")
    val o2 = graft.ops.Privacy.mondrianKAnonymity(
      sk, col("id"), col("v1"), col("v2"), k = 10, rounds = 6).collect()
    assert(o2.map(_.getAs[Long]("n")).sum == 100L)
    assert(o2.forall(_.getAs[Long]("n") >= 10L))
    assert(o2.length >= 2, "at least one split must have happened")
  }
  test("A-stat: cramerVonMises2 — hand no-tie case, identical samples score zero") {
    val df = Seq(("A", 1L), ("A", 3L), ("B", 2L), ("B", 4L))
      .toDF("g", "v")
    val r = graft.ops.Aggregates.cramerVonMises2(df, col("v"), col("g"),
      "A", "B").collect()(0)
    // SA = 0+1, SB = 1+4 -> U = 12 (U4 = 48); T = 12/16 - 15/24 = 0.125
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("t_cvm") == 0.125)
    // identical samples (all ties): T = 0 exactly
    val eq = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L)).toDF("g", "v")
    val r0 = graft.ops.Aggregates.cramerVonMises2(eq, col("v"), col("g"),
      "A", "B").collect()(0)
    assert(r0.getAs[Double]("t_cvm") == 0.0)
  }

  test("A-stat: markovEntropyRate — deterministic cycle is zero, hand fair coin state") {
    def ts(x: Long) = new java.sql.Timestamp(x * 1000L)
    // user 1: a a b a a b -> c(a,a)=2, c(a,b)=2, c(b,a)=1
    val ev = Seq("a", "a", "b", "a", "a", "b").zipWithIndex.map {
      case (t, i) => (1L, ts(i.toLong), i.toLong, t) }
      .toDF("user_id", "t", "eid", "etype")
    val out = graft.ops.EventAnalytics.markovEntropyRate(
      ev, col("user_id"), col("t"), col("eid"), col("etype"))
      .collect().map(r => r.getString(0) -> r).toMap
    // state a: two equiprobable cells -> H = ln 2 in micro-nats (dust -1)
    assert(out("a").getAs[Long]("h_state_micro") == 693146L)
    assert(out("b").getAs[Long]("h_state_micro") == 0L)
    // a deterministic cycle carries zero entropy rate
    val cyc = Seq("a", "b", "a", "b", "a").zipWithIndex.map {
      case (t, i) => (1L, ts(i.toLong), i.toLong, t) }
      .toDF("user_id", "t", "eid", "etype")
    val oc = graft.ops.EventAnalytics.markovEntropyRate(
      cyc, col("user_id"), col("t"), col("eid"), col("etype")).collect()
    assert(oc.forall(_.getAs[Long]("h_rate_micro") == 0L))
    assert(oc.forall(_.getAs[Long]("h_state_micro") == 0L))
  }
  test("A-stat: linConcordance — identity is 1, pure shift keeps r=1 but drops CCC") {
    val ident = Seq(("g", 5L, 5L), ("g", 7L, 7L), ("g", 9L, 9L))
      .toDF("g", "x", "y")
    val r1 = graft.ops.Aggregates.linConcordance(ident, col("x"), col("y"),
      col("g")).collect()(0)
    assert(r1.getAs[Double]("pearson_r") == 1.0)
    assert(r1.getAs[Double]("ccc") == 1.0)
    // y = x + 1: vx = vy = 6, cxy = 6, bias = 9 -> ccc = 12/21
    val shift = Seq(("g", 1L, 2L), ("g", 2L, 3L), ("g", 3L, 4L))
      .toDF("g", "x", "y")
    val r2 = graft.ops.Aggregates.linConcordance(shift, col("x"), col("y"),
      col("g")).collect()(0)
    assert(r2.getAs[Double]("pearson_r") == 1.0)
    assert(r2.getAs[Double]("ccc") == 0.571429)
  }

  test("A-stat: processCapability — centered vs off-center hand values") {
    val df = Seq(("c", 8L), ("c", 12L), ("o", 2L), ("o", 4L)).toDF("g", "v")
    val out = graft.ops.Aggregates.processCapability(df, col("v"), col("g"),
      lsl = 0L, usl = 20L).collect().map(r => r.getString(0) -> r).toMap
    val c = out("c") // mean 10, pop std 2: centered -> cp = cpk = 20/12
    assert(c.getAs[Double]("mean") == 10.0 && c.getAs[Double]("std") == 2.0)
    assert(c.getAs[Double]("cp") == 20.0 / 12.0)
    assert(c.getAs[Double]("cpk") == c.getAs[Double]("cp"))
    val o = out("o") // mean 3, std 1: cpk = min(17, 3)/3 = 1 < cp
    assert(o.getAs[Double]("cpk") == 1.0)
    assert(o.getAs[Double]("cp") == 20.0 / 6.0)
  }
  test("A-stat: seasonalMannKendall — trend season counted, pure cycle scores zero") {
    // season 1 rises 1,2,3; season 2 constant 5,5,5
    val ser = Seq((1L, 2020L, 1L), (1L, 2021L, 2L), (1L, 2022L, 3L),
      (2L, 2020L, 5L), (2L, 2021L, 5L), (2L, 2022L, 5L))
      .toDF("sea", "yr", "v")
    val out = graft.ops.Aggregates.seasonalMannKendall(ser, col("sea"),
      col("yr"), col("v")).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("s") == 3L && out(1L).getAs[Long]("var18") == 66L)
    assert(out(2L).getAs[Long]("s") == 0L && out(2L).getAs[Long]("var18") == 0L)
    assert(out(1L).getAs[Long]("s_total") == 3L)
    val expectZ = BigDecimal(2.0 / math.sqrt(66.0 / 18.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L).getAs[Double]("z") == expectZ)
    // a pure seasonal cycle (constant within each season) has zero trend
    val cyc = Seq((1L, 2020L, 9L), (1L, 2021L, 9L),
      (2L, 2020L, 1L), (2L, 2021L, 1L)).toDF("sea", "yr", "v")
    val oc = graft.ops.Aggregates.seasonalMannKendall(cyc, col("sea"),
      col("yr"), col("v")).collect()
    assert(oc.forall(_.getAs[Long]("s_total") == 0L))
    assert(oc.forall(_.getAs[Double]("z") == 0.0))
  }
  test("W2: errAtK — exact cascade fold, perfect item shadows the tail") {
    val df = Seq((1L, 1L, 4L), (1L, 2L, 0L), (1L, 3L, 4L), (2L, 1L, 4L))
      .toDF("u", "pos", "g")
    val out = graft.ops.Ranking.errAtK(df, col("u"), Seq(col("pos")),
      col("g"), k = 10, gmax = 4).collect()
      .map(r => r.getAs[Long]("key") -> r).toMap
    // u1: 15/16 + 0 + (1/16)(15/16)/3 = 0.9375 + 5/256 exactly
    assert(out(1L).getAs[Double]("err") == 0.95703125)
    assert(out(1L).getAs[Long]("n_items") == 3L)
    // a single perfect item: ERR = 15/16
    assert(out(2L).getAs[Double]("err") == 0.9375)
  }
  test("A-stat: markovRemovalAttribution — hand 3-journey chain, exact removal effects") {
    def ts(x: Long) = new java.sql.Timestamp(x * 1000L)
    // u1: a -> purchase; u2: b (no conv); u3: a -> b -> purchase
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "purchase"),
      (2L, 1L, "b"),
      (3L, 1L, "a"), (3L, 2L, "b"), (3L, 3L, "purchase"))
      .map { case (u, i, t) => (u, ts(u * 100 + i), i, t) }
      .toDF("user_id", "t", "eid", "etype")
    val out = graft.ops.EventAnalytics.markovRemovalAttribution(
      ev, col("user_id"), col("t"), col("eid"), col("etype"), "purchase")
      .collect().map(r => r.getString(0) -> r).toMap
    // exact absorption: p(b)=.5, p(a)=.75, p(START)=666666 ppm
    assert(out("a").getAs[Long]("base_conv_ppm") == 666666L)
    // remove a: START -> (2*0 + 500000)/3 = 166666; RE = 500000
    assert(out("a").getAs[Long]("removed_conv_ppm") == 166666L)
    assert(out("a").getAs[Long]("removal_effect_ppm") == 500000L)
    // remove b: a = 500000, START = 333333; RE = 333333
    assert(out("b").getAs[Long]("removal_effect_ppm") == 333333L)
    // shares normalize over 833333
    assert(out("a").getAs[Long]("share_ppm") == 600000L)
    assert(out("b").getAs[Long]("share_ppm") == 399999L)
  }
  test("A-stat: hbosOutliers — the lone far bin scores highest, common rows lowest") {
    // feature: 19 values at 0..9 (two per bin of width 1) and ONE at 99
    val df = ((1L to 19L).map(i => (i, (i % 10))) :+ ((20L, 99L)))
      .toDF("id", "v")
    val out = graft.ops.Aggregates.hbosOutliers(df, col("id"),
      Seq(col("v")), bins = 10, k = 3).collect()
    // id 20 sits alone in the top bin: maxc/1 is the largest ratio
    assert(out(0).getAs[Long]("id") == 20L)
    assert(out(0).getAs[Long]("score_micro") > out(1).getAs[Long]("score_micro"))
  }

  test("A-stat: uncertaintyCoefficient — determinism is 1e6 ppm, independence ~0") {
    // y fully determines x
    val det = Seq(("a", "p"), ("a", "p"), ("b", "q"), ("b", "q"))
      .toDF("x", "y")
    val r1 = graft.ops.Aggregates.uncertaintyCoefficient(det, col("x"),
      col("y")).collect()(0)
    assert(r1.getAs[Long]("u_x_given_y_ppm") == 1000000L)
    assert(r1.getAs[Long]("u_y_given_x_ppm") == 1000000L)
    // independent 2x2 with equal mass: U ~ 0 (micro-nat dust only)
    val ind = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q"))
      .toDF("x", "y")
    val r2 = graft.ops.Aggregates.uncertaintyCoefficient(ind, col("x"),
      col("y")).collect()(0)
    assert(math.abs(r2.getAs[Long]("u_x_given_y_ppm")) < 10L)
    assert(math.abs(r2.getAs[Long]("u_y_given_x_ppm")) < 10L)
  }
  test("A-stat: kaplanMeierGreenwood — hand bands, zero-width at no-event steps") {
    // 4 subjects: events at t=1 (1) and t=2 (1); censored at 2 and 3
    val df = Seq((1L, 1), (2L, 1), (2L, 0), (3L, 0)).toDF("dur", "ev")
    val out = graft.ops.EventAnalytics.kaplanMeierGreenwood(df, col("dur"),
      col("ev")).orderBy("t").collect()
    // t=1: n=4, d=1 -> S = 750000, G = 1e12/(4*3)
    val g1 = 1000000000000L / 12L
    assert(out(0).getAs[Long]("surv_ppm") == 750000L)
    assert(out(0).getAs[Long]("greenwood_pico") == g1)
    val se1 = math.floor(750000.0 * math.sqrt(g1.toDouble / 1e12) + 0.5).toLong
    assert(out(0).getAs[Long]("se_ppm") == se1)
    assert(out(0).getAs[Long]("lo_ppm") == 750000L - 196L * se1 / 100L)
    // t=2: n=3, d=1 -> S = 500000, G += 1e12/(3*2)
    assert(out(1).getAs[Long]("surv_ppm") == 500000L)
    assert(out(1).getAs[Long]("greenwood_pico") == g1 + 1000000000000L / 6L)
    // t=3: censoring only -> survival and Greenwood sum unchanged
    assert(out(2).getAs[Long]("surv_ppm") == 500000L)
    assert(out(2).getAs[Long]("greenwood_pico") ==
      out(1).getAs[Long]("greenwood_pico"))
  }
  test("A-stat: demingRegression — symmetric noise recovers slope 1, OLS-attenuating case") {
    // y = x exactly: slope 1, intercept 0
    val exact = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L))
      .toDF("g", "x", "y")
    val r1 = graft.ops.Aggregates.demingRegression(exact, col("x"),
      col("y"), col("g")).collect()(0)
    assert(r1.getAs[Double]("slope") == 1.0)
    assert(r1.getAs[Double]("intercept") == 0.0)
    // symmetric cross-noise around y = x: (0,1),(1,0),(3,4),(4,3) —
    // Deming keeps slope 1 where OLS would report 7/10
    val sym = Seq(("g", 0L, 1L), ("g", 1L, 0L), ("g", 3L, 4L),
      ("g", 4L, 3L)).toDF("g", "x", "y")
    val r2 = graft.ops.Aggregates.demingRegression(sym, col("x"),
      col("y"), col("g")).collect()(0)
    assert(r2.getAs[Double]("slope") == 1.0)
    assert(r2.getAs[Double]("intercept") == 0.0)
  }
  test("eval: recListMetrics — hand coverage/novelty/Gini on a biased list") {
    import spark.implicits._
    // 3 users, everyone recommended item 1; one rec each of 2 and 3
    val recs = Seq((1L, 1L), (2L, 1L), (3L, 1L), (1L, 2L), (2L, 3L))
      .toDF("u", "item")
    // popularity: item1 8 of 10 interactions, items 2,3 one each
    val inter = (Seq.fill(8)(1L) ++ Seq(2L, 3L)).toDF("pitem")
    val r = graft.ops.Evaluation.recListMetrics(recs, col("u"),
      col("item"), inter, col("pitem"), catalogSize = 10L).collect()(0)
    assert(r.getAs[Long]("n_users") == 3L && r.getAs[Long]("n_recs") == 5L)
    assert(r.getAs[Long]("distinct_items") == 3L)
    assert(r.getAs[Long]("coverage_ppm") == 300000L)
    // Laplace-smoothed novelty: total' = 10 + catalog(10) = 20,
    // pop' = pop + 1 → (3*ln(20/9) + 2*ln(20/2)) micro / 5 recs
    def mn(x: Double) = math.floor(math.log(x) * 1e6 + 0.5).toLong
    assert(r.getAs[Long]("avg_novelty_micro") ==
      (3 * mn(20.0 / 9) + 2 * mn(20.0 / 2)) / 5)
    // exposure counts sorted asc: (1,1,3): G = (Σ(2i-1)c − 3·5)/(3·5)
    // = (1 + 3 + 15 − 15)/15 = 4/15
    assert(r.getAs[Double]("exposure_gini") ==
      BigDecimal(4.0 / 15).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // a NEVER-interacted item gets finite MAXIMAL self-information
    // ln(total'/1), not 0 — one rec of cold item 7 vs one of hot 1
    val cold = Seq((1L, 7L), (2L, 1L)).toDF("u", "item")
    val rc = graft.ops.Evaluation.recListMetrics(cold, col("u"),
      col("item"), inter, col("pitem"), catalogSize = 10L).collect()(0)
    assert(rc.getAs[Long]("avg_novelty_micro") ==
      (mn(20.0 / 1) + mn(20.0 / 9)) / 2)
  }
  test("ops: burnRateAlerts — fires only when BOTH windows burn") {
    def ts(h: Long, i: Long) = new java.sql.Timestamp(h * 3600000L + i)
    // hours 0-5 healthy (1 error of 10); hour 6 a blip (5/10) with a
    // healthy trailing window; hours 7-9 sustained (5/10 each)
    val rows = (0L to 9L).flatMap { h =>
      val errs = if (h >= 6) 5 else 1
      (1L to 10L).map(i => (ts(h, i), i <= errs))
    }
    val df = rows.toDF("t", "isErr")
    val out = graft.ops.EventAnalytics.burnRateAlerts(df, col("t"),
      col("isErr"), slowHours = 6, sloBudgetPpm = 300000L,
      fastFactorPpm = 1000000L, slowFactorPpm = 1000000L)
      .collect().map(r => r.getAs[Long]("hour") -> r).toMap
    // hour 6: fast burns (50% > 30%) but the 6h window is still
    // diluted (1+1+1+1+1+5)/60 = 16.7% -> NO alert
    assert(out(6L).getAs[Long]("burn_fast_ppm") >= 1000000L)
    assert(!out(6L).getAs[Boolean]("alert"))
    // hour 9: trailing 6h = (1+1+5+5+5+5)/60 = 36.7% > 30% -> alert
    assert(out(9L).getAs[Boolean]("alert"))
    // healthy hours never alert
    assert(!out(3L).getAs[Boolean]("alert"))
  }
  test("ops: erlangStaffing — hand M/M/c checks at a=1 and tiny load") {
    def ts(h: Long, i: Long) = new java.sql.Timestamp(h * 3600000L + i)
    // hour 0: 20 arrivals in 1 day at 20 jobs/agent/hour -> a = 1.0:
    //   c=2: EC = (1/2)/((1/2) + (1/2)(1+1)) = 1/3 > 0.2
    //   c=3: term3=1/6, cum=1+1+1/2: EC = (1/6)/(1/6 + (2/3)(5/2)) = 1/11
    // hour 1: 1 arrival -> a = 0.05: c=1 suffices (EC = a = 0.05)
    val rows = (1L to 20L).map(i => ts(0L, i)) :+ ts(1L, 1L)
    val df = rows.map(Tuple1(_)).toDF("t")
    val out = graft.ops.EventAnalytics.erlangStaffing(df, col("t"),
      jobsPerAgentHour = 20L, maxAgents = 40, targetWaitPpm = 200000L)
      .collect().map(r => r.getAs[Long]("hour_of_day") -> r).toMap
    val h0 = out(0L)
    assert(h0.getAs[Double]("intensity") == 1.0)
    assert(h0.getAs[Long]("agents") == 3L)
    assert(h0.getAs[Double]("wait_prob") ==
      BigDecimal(1.0 / 11).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    val h1 = out(1L)
    assert(h1.getAs[Long]("agents") == 1L)
    assert(h1.getAs[Double]("wait_prob") == 0.05)
  }
  test("A1: benfordConformity — Benford-exact sample is close, uniform digits nonconforming") {
    import spark.implicits._
    // frequencies proportional to the Benford ppm table itself
    val benford = graft.ops.Aggregates.BenfordPpm.flatMap { case (d, p) =>
      Seq.fill((p / 1000).toInt)(d.toLong * 100) }
    val r1 = graft.ops.Aggregates.benfordConformity(
      benford.toDF("v"), col("v")).collect()(0)
    assert(r1.getAs[String]("verdict") == "close")
    assert(r1.getAs[Long]("mad_ppm") < 6000L)
    // uniform first digits: each 11.1% vs Benford -> way off
    val uniform = (1 to 9).flatMap(d => Seq.fill(100)(d.toLong * 10))
    val r2 = graft.ops.Aggregates.benfordConformity(
      uniform.toDF("v"), col("v")).collect()(0)
    assert(r2.getAs[String]("verdict") == "nonconforming")
    assert(r2.getAs[Long]("mad_ppm") > 15000L)
  }

  test("privacy: randomizedResponse — reported bits replay the mixer; estimator unbiases") {
    def mix(s: Long): Long = {
      var z = s
      z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
      z ^= (z >>> 27); z *= 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val salt = 0x9E3779B97F4A7C15L
    // 400 units, truth = id % 5 == 0 (pi = 0.2), k = 2 (p = 3/4)
    val units = (0L until 400L).map(i => (i, i % 5 == 0))
    val df = units.toDF("id", "y")
    val out = graft.ops.Privacy.randomizedResponse(df.withColumn("g", lit("a")),
      Seq(col("g")), col("id"), col("y"), k = 2).head()
    val expectedRep = units.count { case (i, y) =>
      y != ((mix(i + salt) & 3L) == 0L) }
    assert(out.getAs[Long]("n") == 400L)
    assert(out.getAs[Long]("yes_true") == 80L)
    assert(out.getAs[Long]("yes_reported") == expectedRep.toLong)
    assert(out.getAs[Long]("pi_true_ppm") == 200000L)
    // pi_hat = (4*rep - n) / (2n), floor at ppm — replay exactly
    val expHat = (BigInt(4) * expectedRep - 400) * 1000000 / (BigInt(2) * 400)
    assert(out.getAs[Long]("pi_hat_ppm") == expHat.toLong)
    // and the unbiasing moves the raw reported rate TOWARD the truth:
    // raw lambda is pulled to 1/2 by the lies, pi_hat corrects it
    val lambdaPpm = expectedRep.toLong * 1000000L / 400L
    assert(math.abs(out.getAs[Long]("pi_hat_ppm") - 200000L) <
      math.abs(lambdaPpm - 200000L))
  }

  test("mrmrSelect: redundant copy of the top feature is demoted below noise") {
    // y is a function of f1; f2 duplicates f1 (max redundancy); f3 is
    // a coarse independent column. Pure relevance ranks f2 second —
    // mRMR must NOT.
    val rows = (0L until 240L).map { i =>
      val f1 = i % 4
      // f3 = (i div 4) % 2 cycles independently of i % 4 over 240 rows
      (f1, f1, (i / 4) % 2, f1 >= 2)
    }
    val df = rows.toDF("f1", "f2", "f3", "y")
    val out = graft.ops.Features.mrmrSelect(df,
      Seq("f1" -> col("f1"), "f2" -> col("f2"), "f3" -> col("f3")),
      col("y"), select = 3).collect()
    assert(out.map(_.getAs[String]("feature")).toSeq == Seq("f1", "f3", "f2"),
      out.mkString(";"))
    // round 1 carries no redundancy; f2's final round shows the full
    // I(f1; f2) penalty (f2 duplicates f1 exactly: redundancy = ln 4)
    assert(out(0).getAs[Long]("redundancy_avg_nano") == 0L)
    assert(out(2).getAs[Long]("score_nano") <
      out(2).getAs[Long]("relevance_nano"))
    // tie-break: identical features rank by name
    val tie = (0L until 60L).map(i => (i % 3, i % 3, i % 2 == 0))
      .toDF("b", "a", "y")
    val t = graft.ops.Features.mrmrSelect(tie,
      Seq("b" -> col("b"), "a" -> col("a")), col("y"), select = 1).head()
    assert(t.getAs[String]("feature") == "a")
  }

  test("ransacLine: consensus ignores gross outliers; ties break lexicographically") {
    // planted y = 3x + 7 on 12 points + 3 far outliers + one duplicate
    // inlier (multiplicity must count)
    val pts = (0L until 12L).map(x => (x, 3 * x + 7)) ++
      Seq((2L, 500L), (5L, -400L), (9L, 900L), (3L, 16L))
    val out = graft.ops.Aggregates.ransacLine(pts.toDF("x", "y"),
      col("x"), col("y"), epsNum = 0L, epsDen = 1L).head()
    assert(out.getAs[Long]("n_points") == 16L)
    assert(out.getAs[Long]("consensus") == 13L) // 12 line pts + dup (3,16)
    assert(out.getAs[Long]("slope_micro") == 3000000L)
    assert(out.getAs[Long]("intercept_micro") == 7000000L)
    // two parallel full-consensus lines: lexicographically smallest
    // candidate pair wins deterministically
    val tie = Seq((0L, 0L), (1L, 0L), (0L, 10L), (1L, 10L)).toDF("x", "y")
    val t = graft.ops.Aggregates.ransacLine(tie, col("x"), col("y"),
      epsNum = 0L, epsDen = 1L).head()
    assert(t.getAs[Long]("consensus") == 2L)
    assert(t.getAs[Long]("x1") == 0L && t.getAs[Long]("y1") == 0L &&
      t.getAs[Long]("x2") == 1L && t.getAs[Long]("y2") == 0L)
    // eps widens consensus: at eps = 10 the two parallel lines see all 4
    val t2 = graft.ops.Aggregates.ransacLine(tie, col("x"), col("y"),
      epsNum = 10L, epsDen = 1L).head()
    assert(t2.getAs[Long]("consensus") == 4L)
  }

  test("privacy: randomizedResponse — negative estimator truncates like the oracle") {
    def mix(s: Long): Long = {
      var z = s
      z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
      z ^= (z >>> 27); z *= 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val salt = 0x9E3779B97F4A7C15L
    // all-false truth: every reported yes is a lie, so the numerator
    // 2^k·rep − n sits near (and typically below) zero — the signed
    // division path. Engines truncate toward zero; a floor would be
    // off by one on every negative group.
    val units = (0L until 300L).map(i => (i, false))
    val out = graft.ops.Privacy.randomizedResponse(
      units.toDF("id", "y").withColumn("g", lit("a")),
      Seq(col("g")), col("id"), col("y"), k = 2).head()
    val rep = units.count { case (i, _) => (mix(i + salt) & 3L) == 0L }
    val expHat = (BigInt(4) * rep - 300) * 1000000 / (BigInt(2) * 300)
    assert(out.getAs[Long]("yes_reported") == rep.toLong)
    assert(out.getAs[Long]("pi_hat_ppm") == expHat.toLong, s"rep=$rep")
  }

  test("privacy: randomizedResponse at k = 62 — flips vanish, estimator is exact") {
    val df = (0L until 50L).map(i => (i, i < 10)).toDF("id", "y")
      .withColumn("g", lit(1L))
    val out = graft.ops.Privacy.randomizedResponse(df, Seq(col("g")),
      col("id"), col("y"), k = 62).head()
    assert(out.getAs[Long]("yes_reported") == out.getAs[Long]("yes_true"))
    // (2^62·y − n)·1e6 // ((2^62−2)·n) = y/n·1e6 within 1 ppm at this k
    assert(math.abs(out.getAs[Long]("pi_hat_ppm") -
      out.getAs[Long]("pi_true_ppm")) <= 1L)
  }
}
