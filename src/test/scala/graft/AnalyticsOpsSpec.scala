package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Binning, Dominance, EventAnalytics, Ranking}
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
}
