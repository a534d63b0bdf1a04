package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SpatialStats

/** Specs for q373/q374 — global Moran's I and local Getis-Ord Gi*
  * on gridded point fields. Hand-checkable lattices small enough to
  * recompute the statistics on paper.
  */
class SpatialStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** A 2×2 checkerboard of single-point cells (cellSize 1): values
    * 10, 0 / 0, 10. Queen contiguity on a 2×2 block makes every cell
    * adjacent to every other (W = 12 ordered pairs). Deviations are
    * ±5 (scaled ×4: ±20); Σ_ij w d_i d_j = 4·(2·(+400)·(-400 cross
    * terms)) — worked out: each cell has 3 neighbors, one equal-value
    * (d·d = +400·... ) — compute: cells (0,0)=10,(1,0)=0,(0,1)=0,
    * (1,1)=10, scaled devs d = 4x−20: +20,−20,−20,+20.
    * Ordered pairs: like-signed diagonal pairs (2 per direction → 4
    * pairs: (0,0)-(1,1), (1,1)-(0,0), (1,0)-(0,1), (0,1)-(1,0)) give
    * +400 each; the 8 side-adjacent pairs give −400 each.
    * Σ = 4·400 − 8·400 = −1600. Σd² = 4·400 = 1600.
    * I = (N/W)·(−1600/1600) = (4/12)·(−1) = −1/3. */
  test("moransI: 2x2 checkerboard is negatively autocorrelated, I = -1/3") {
    val pts = Seq(
      (0.5, 0.5, 10L), (1.5, 0.5, 0L), (0.5, 1.5, 0L), (1.5, 1.5, 10L))
      .toDF("x", "y", "v")
    val r = SpatialStats.moransI(pts, col("x"), col("y"), col("v"), 1.0)
      .collect()(0)
    assert(r.getAs[Long]("n_cells") == 4L)
    assert(r.getAs[Long]("w_pairs") == 12L)
    assert(math.abs(r.getAs[Double]("morans_i") - (-1.0 / 3.0)) < 1e-8)
  }

  /** A 1×4 strip all equal values: every deviation is zero → I is
    * NULL (0/0), which both engines render as null — guard the edge
    * rather than emitting NaN. */
  test("moransI: constant field yields null (zero variance)") {
    val pts = Seq((0.0, 0.0, 5L), (1.0, 0.0, 5L), (2.0, 0.0, 5L))
      .toDF("x", "y", "v")
    val r = SpatialStats.moransI(pts, col("x"), col("y"), col("v"), 1.0)
      .collect()(0)
    assert(r.isNullAt(r.fieldIndex("morans_i")))
  }

  /** Multiple points per cell sum before the statistic: two points of
    * 3 and 7 in one cell behave exactly like a single 10. */
  test("moransI: cell aggregation sums values first") {
    val split = Seq(
      (0.2, 0.5, 3L), (0.7, 0.5, 7L), (1.5, 0.5, 0L),
      (0.5, 1.5, 0L), (1.5, 1.5, 10L)).toDF("x", "y", "v")
    val whole = Seq(
      (0.5, 0.5, 10L), (1.5, 0.5, 0L), (0.5, 1.5, 0L), (1.5, 1.5, 10L))
      .toDF("x", "y", "v")
    val a = SpatialStats.moransI(split, col("x"), col("y"), col("v"), 1.0)
      .collect()(0).getAs[Double]("morans_i")
    val b = SpatialStats.moransI(whole, col("x"), col("y"), col("v"), 1.0)
      .collect()(0).getAs[Double]("morans_i")
    assert(a == b)
  }

  /** Gi* on a 3-cell strip with a spike in the middle: the middle
    * cell's neighborhood covers everything (W_i = N), where the Gi*
    * denominator N·W_i − W_i² vanishes — the statistic is undefined
    * and must come out NULL (not NaN). The end cells see 2 of 3
    * cells; both share the spike so both are hot and, by symmetry,
    * equal. Also checks W_i counts only OCCUPIED neighbors + self. */
  test("getisOrdGiStar: full-coverage neighborhood z is null; ends symmetric") {
    val pts = Seq((0.5, 0.5, 1L), (1.5, 0.5, 8L), (2.5, 0.5, 1L))
      .toDF("x", "y", "v")
    val out = SpatialStats.getisOrdGiStar(
      pts, col("x"), col("y"), col("v"), 1.0)
      .orderBy("cx").collect()
    assert(out.length == 3)
    val mid = out(1)
    assert(mid.getAs[Long]("w_i") == 3L)
    assert(mid.isNullAt(mid.fieldIndex("gi_z")))
    // both end cells: W_i = 2, G_i = 9, same z by symmetry
    assert(out(0).getAs[Long]("w_i") == 2L)
    assert(out(0).getAs[Double]("gi_z") == out(2).getAs[Double]("gi_z"))
    // and the shared-with-spike neighborhoods are hot (z > 0)
    assert(out(0).getAs[Double]("gi_z") > 0.0)
  }

  /** Isolated cell far from the cluster: W_i = 1 (self only), its
    * G_i = own value — a low value far away must come out cold
    * (negative z) while the clustered high cells are hot. */
  test("getisOrdGiStar: isolated low cell is cold, clustered high cells hot") {
    val pts = Seq(
      (0.5, 0.5, 9L), (1.5, 0.5, 9L), (0.5, 1.5, 9L), (1.5, 1.5, 9L),
      (90.5, 90.5, 1L)).toDF("x", "y", "v")
    val out = SpatialStats.getisOrdGiStar(
      pts, col("x"), col("y"), col("v"), 1.0)
    val far = out.filter(col("cx") === 90).collect()(0)
    assert(far.getAs[Long]("w_i") == 1L)
    assert(far.getAs[Double]("gi_z") < 0.0)
    val near = out.filter(col("cx") === 0 && col("cy") === 0).collect()(0)
    assert(near.getAs[Double]("gi_z") > 0.0)
  }

  /** Two tight couples and one isolated point: the couples are mutual
    * (distance 1 each way), the isolated point's nearest neighbor is
    * not reciprocated — no pair. A radius too small for the isolated
    * point exercises the brute fallback and must not change the
    * result. */
  test("mutualNearestNeighbors: couples match, loner does not; fallback path equal") {
    val pts = Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 10L, 10L),
      (4L, 11L, 10L), (5L, 50L, 50L)).toDF("id", "x", "y")
    def run(r: Double) = SpatialStats.mutualNearestNeighbors(
        pts, col("id"), col("x"), col("y"), r)
      .orderBy("id_a").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSeq
    val wide = run(20.0)  // everything solved in the grid pass
    assert(wide == Seq((1L, 2L, 1L), (3L, 4L, 1L)))
    assert(run(3.0) == wide)  // loner (and nothing else) goes brute
  }

  /** Three coincident points: zero-distance ties break by id, so the
    * two smallest ids pair and the third is left unreciprocated. */
  test("mutualNearestNeighbors: coincident cluster pairs the two smallest ids") {
    val pts = Seq((1L, 5L, 5L), (7L, 5L, 5L), (9L, 5L, 5L))
      .toDF("id", "x", "y")
    val out = SpatialStats.mutualNearestNeighbors(
        pts, col("id"), col("x"), col("y"), 4.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 7L, 0L)))
  }

  /** 3-4-5 triangle: exact ordered pair counts at each radius, and a
    * far-away fourth point that only moves the denominators. */
  test("ripleysK: exact pair counts and monotone L on a 3-4-5 triangle") {
    val pts = Seq((0L, 0L), (3L, 0L), (0L, 4L), (80L, 80L)).toDF("x", "y")
    val out = SpatialStats.ripleysK(pts, col("x"), col("y"),
      radii = Seq(3, 4, 5), area = 10000.0).orderBy("r").collect()
    assert(out.map(_.getAs[Long]("n_pairs")).toSeq == Seq(2L, 4L, 6L))
    assert(out.forall(_.getAs[Long]("n_points") == 4L))
    // K̂ = A·pairs/(n(n−1)): 10000·2/12 etc.
    assert(math.abs(out(0).getAs[Double]("k_hat") - 10000.0 * 2 / 12) < 1e-9)
    // tight cluster relative to the area: L̂ − r strongly positive
    assert(out.forall(_.getAs[Double]("l_minus_r") > 0.0))
  }

  /** One cell of mass 100 on [0,10)². A zone covering its left half
    * gets half the mass; a zone covering everything gets it all; a
    * far-away zone reports zero area and null readouts. Mass is
    * conserved across a partition of the plane. */
  test("arealInterpolate: exact half-cell split, full recovery, empty zone row") {
    import graft.ops.SpatialStats.Zone
    val pts = Seq((2L, 3L, 60L), (7L, 8L, 40L)).toDF("x", "y", "v")
    val out = SpatialStats.arealInterpolate(pts, col("x"), col("y"),
        col("v"), cellSize = 10L,
        zones = Seq(Zone("left", 0, 0, 5, 10), Zone("right", 5, 0, 10, 10),
          Zone("all", 0, 0, 10, 10), Zone("far", 900, 900, 910, 910)))
      .collect().map(r => r.getString(0) -> r).toMap
    // both points share the single cell [0,10)²: xsum = 100
    assert(out("all").getAs[Long]("covered_area") == 100L)
    assert(out("all").getAs[Double]("mass") == 100.0)
    assert(out("all").getAs[Double]("mean_value") == 100.0)
    assert(out("left").getAs[Double]("mass") == 50.0)
    assert(out("right").getAs[Double]("mass") == 50.0)
    // mean is intensive: the half-zones report the same density
    assert(out("left").getAs[Double]("mean_value") == 100.0)
    val far = out("far")
    assert(far.getAs[Long]("covered_area") == 0L)
    assert(far.isNullAt(far.fieldIndex("mass")))
  }

  /** One unit point at the origin, radius 2 (support d² < 4): the
    * discrete Epanechnikov disc is exactly 9 cells — self w=4, the 4
    * sides w=3, the 4 diagonals w=2 (Σw = 24). A second point in an
    * adjacent cell superposes: its side weight lands on the origin. */
  test("kdeGrid: single-point kernel footprint and two-cell superposition") {
    val one = Seq((0.5, 0.5, 1L)).toDF("x", "y", "v")
    val k1 = SpatialStats.kdeGrid(one, col("x"), col("y"), col("v"),
      cellSize = 1.0, radius = 2).collect()
      .map(r => (r.getAs[Long]("cx"), r.getAs[Long]("cy")) ->
        r.getAs[Long]("kde_mass")).toMap
    assert(k1.size == 9) // in-disc offsets only: corners d²=4 excluded
    assert(k1((0L, 0L)) == 4L)
    assert(k1((1L, 0L)) == 3L && k1((-1L, 0L)) == 3L &&
      k1((0L, 1L)) == 3L && k1((0L, -1L)) == 3L)
    assert(k1((1L, 1L)) == 2L && k1((-1L, -1L)) == 2L)
    assert(k1.values.sum == 24L)
    val two = Seq((0.5, 0.5, 1L), (1.5, 0.5, 1L)).toDF("x", "y", "v")
    val k2 = SpatialStats.kdeGrid(two, col("x"), col("y"), col("v"),
      cellSize = 1.0, radius = 2).collect()
      .map(r => (r.getAs[Long]("cx"), r.getAs[Long]("cy")) ->
        (r.getAs[Long]("kde_mass"), r.getAs[Long]("n_src"))).toMap
    assert(k2((0L, 0L)) == (7L, 2L)) // 4 self + 3 from the neighbor
    assert(k2((1L, 0L)) == (7L, 2L))
    // mass is conserved: total = Σv · Σw = 2 · 24
    assert(k2.values.map(_._1).sum == 48L)
  }
  /** The moransI 2x2 checkerboard, localized: every cell's lag is the
    * sum of its 3 neighbors' deviations = opposite-sign pairs minus
    * one like pair -> lag = -d for each cell; local I = N·d·(-d)/Σd²
    * = 4·(-400)/1600 = -1 per cell, quadrant HL/LH. */
  test("localMoran: checkerboard cells are all outliers with I = -1") {
    val pts = Seq(
      (0.5, 0.5, 10L), (1.5, 0.5, 0L), (0.5, 1.5, 0L), (1.5, 1.5, 10L))
      .toDF("x", "y", "v")
    val out = SpatialStats.localMoran(pts, col("x"), col("y"), col("v"), 1.0)
      .collect()
    assert(out.length == 4)
    assert(out.forall(r => math.abs(r.getAs[Double]("local_i") - (-1.0)) < 1e-9))
    assert(out.map(_.getAs[String]("quadrant")).toSet == Set("HL", "LH"))
  }

  test("joinCounts: segregated strip vs checkerboard BB counts") {
    // 1x4 strip BB|WW: blacks adjacent once (2 ordered pairs)
    val strip = Seq((0.5, 0.5, 1L), (1.5, 0.5, 1L), (2.5, 0.5, 0L),
      (3.5, 0.5, 0L)).toDF("x", "y", "v")
    val r = SpatialStats.joinCounts(strip, col("x"), col("y"),
      col("v") > 0, 1.0).collect()(0)
    assert(r.getAs[Long]("n_black") == 2L)
    assert(r.getAs[Long]("w_pairs") == 6L) // 3 adjacencies, ordered
    assert(r.getAs[Long]("bb") == 2L && r.getAs[Long]("ww") == 2L)
    assert(r.getAs[Long]("bw") == 2L)
    // excess = N(N-1)·BB − W·nB(nB−1) = 12·2 − 6·2 = 12 > 0 (clumped)
    assert(r.getAs[Long]("bb_excess_num") == 12L)
    // checkerboard B W B W: blacks never adjacent -> BB = 0, excess < 0
    val alt = Seq((0.5, 0.5, 1L), (1.5, 0.5, 0L), (2.5, 0.5, 1L),
      (3.5, 0.5, 0L)).toDF("x", "y", "v")
    val r2 = SpatialStats.joinCounts(alt, col("x"), col("y"),
      col("v") > 0, 1.0).collect()(0)
    assert(r2.getAs[Long]("bb") == 0L)
    assert(r2.getAs[Long]("bb_excess_num") < 0L)
  }
  test("clarkEvans — regular grid is dispersed, tight cluster is clustered") {
    // 4 points on a perfect 10-spaced grid in a 20x20 area: NN = 10,
    // expected CSR = 0.5*sqrt(400/4) = 5 -> R = 2
    val grid = Seq((0L, 0L), (10L, 0L), (0L, 10L), (10L, 10L))
      .toDF("x", "y")
    val r = SpatialStats.clarkEvans(grid, col("x"), col("y"),
      pruneRadius = 12.0, area = 400.0).collect()(0)
    assert(r.getAs[Long]("n_points") == 4L)
    assert(r.getAs[Double]("mean_nn") == 10.0)
    assert(r.getAs[Double]("r_ce") == 2.0)
    assert(r.getAs[Double]("z_ce") > 0.0)
    // coincident pairs: NN distance 0 for all points -> R = 0
    val clus = Seq((5L, 5L), (5L, 5L), (50L, 50L), (50L, 50L))
      .toDF("x", "y")
    val r2 = SpatialStats.clarkEvans(clus, col("x"), col("y"),
      pruneRadius = 10.0, area = 400.0).collect()(0)
    assert(r2.getAs[Long]("sum_nn_micro") == 0L)
    assert(r2.getAs[Double]("r_ce") == 0.0)
    assert(r2.getAs[Double]("z_ce") < 0.0)
  }

  test("A3+: viewshed — wall shadow, tall-peak re-emergence, grazing blocks") {
    import graft.ops.SpatialOps
    // flat DEM, observer 1 above: nothing blocks anything
    val flat = (for { x <- 0L to 4L; y <- 0L to 2L } yield (x, y, 0L))
      .toDF("x", "y", "z")
    val rf = SpatialOps.viewshed(flat, col("x"), col("y"), col("z"),
        obsX = 0L, obsY = 1L, height = 1L, maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2))
      .toMap
    assert(rf.values.forall(identity), s"flat DEM all visible: $rf")
    assert(rf.size == 15)
    // a wall at x=2 shadows the cells behind it, but a taller far peak
    // re-emerges above the wall's angle
    val wall = Seq((0L, 0L, 0L), (1L, 0L, 0L), (2L, 0L, 5L),
      (3L, 0L, 0L), (4L, 0L, 0L), (5L, 0L, 20L)).toDF("x", "y", "z")
    val rw = SpatialOps.viewshed(wall, col("x"), col("y"), col("z"),
        obsX = 0L, obsY = 0L, height = 0L, maxDist = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(rw == Map(0L -> true, 1L -> true, 2L -> true,
      3L -> false, 4L -> false, 5L -> true), s"got $rw")
    // grazing line of sight (equal angles) BLOCKS — the >= convention
    val ramp = (0L to 3L).map(x => (x, 0L, x)).toDF("x", "y", "z")
    val rr = SpatialOps.viewshed(ramp, col("x"), col("y"), col("z"),
        obsX = 0L, obsY = 0L, height = 0L, maxDist = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(rr(1L) && !rr(2L) && !rr(3L),
      s"colinear ramp: only the adjacent cell survives grazing: $rr")
    // missing observer is a typed boundary
    val e = intercept[graft.core.DataIOError] {
      SpatialOps.viewshed(flat, col("x"), col("y"), col("z"),
        obsX = 99L, obsY = 99L, height = 0L, maxDist = 8) }
    assert(e.getMessage.contains("observer cell"))
  }

  test("A3+: costDistance — chain metric, diagonal factor, unreached null, typed cost") {
    import graft.ops.SpatialOps
    // 1-D chain, costs 1,2,3,4; source at x=0. Metric: (ca+cb)·2.
    // d(1) = (1+2)·2 = 6; d(2) = 6 + (2+3)·2 = 16; d(3) = 16 + (3+4)·2 = 30
    val chain = Seq((0L, 0L, 1L), (1L, 0L, 2L), (2L, 0L, 3L), (3L, 0L, 4L))
      .toDF("x", "y", "c")
    val r = SpatialOps.costDistance(chain, col("x"), col("y"), col("c"),
        col("x") === 0L, rounds = 4)
      .collect().map(row => row.getLong(0) -> row.getLong(2)).toMap
    assert(r == Map(0L -> 0L, 1L -> 6L, 2L -> 16L, 3L -> 30L))
    // diagonal: 2x2 uniform cost 1 — diagonal step (1+1)·3 = 6 beats
    // the two-cardinal detour (1+1)·2 + (1+1)·2 = 8
    val sq = Seq((0L, 0L, 1L), (1L, 0L, 1L), (0L, 1L, 1L), (1L, 1L, 1L))
      .toDF("x", "y", "c")
    val rs = SpatialOps.costDistance(sq, col("x"), col("y"), col("c"),
        col("x") === 0L && col("y") === 0L, rounds = 3)
      .collect().map(row => (row.getLong(0), row.getLong(1)) ->
        row.getLong(2)).toMap
    assert(rs((1L, 1L)) == 6L && rs((1L, 0L)) == 4L)
    // an unreachable island reports null
    val island = chain.unionByName(Seq((9L, 9L, 1L)).toDF("x", "y", "c"))
    val ri = SpatialOps.costDistance(island, col("x"), col("y"), col("c"),
        col("x") === 0L && col("y") === 0L, rounds = 4)
      .collect().map(row => (row.getLong(0), row.getLong(1)) ->
        (if (row.isNullAt(2)) None else Some(row.getLong(2)))).toMap
    assert(ri((9L, 9L)) == None)
    // zero cost is a loud typed boundary, not a silent degenerate metric
    val bad = Seq((0L, 0L, 0L), (1L, 0L, 1L)).toDF("x", "y", "c")
    val e = intercept[graft.core.DataIOError] {
      SpatialOps.costDistance(bad, col("x"), col("y"), col("c"),
        col("x") === 0L, rounds = 2) }
    assert(e.getMessage.contains("costs must be >= 1"))
  }

  test("A3+: rasterizePolygons — center rule, min-id overlap, off-grid empty") {
    import graft.geo.Geo
    import graft.ops.SpatialOps
    def mk(id: Long, vs: Seq[(Double, Double)]) =
      spark.range(1).select(lit(id).as("pid"),
        Geo.stPolygon(array(vs.map { case (vx, vy) =>
          struct(lit(vx).as("x"), lit(vy).as("y")) }: _*)).as("geom"))
    // axis-aligned square [1.2, 3.8]² covers centers (1.5, 2.5, 3.5)²
    // on the unit grid (origin (0, 10), row 0 on top)
    val sq = mk(1L, Seq((1.2, 1.2), (3.8, 1.2), (3.8, 3.8), (1.2, 3.8)))
    val r1 = SpatialOps.rasterizePolygons(sq, col("pid"), col("geom"),
        0.0, 10.0, 1.0, 1.0, width = 10, height = 10)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    // y centers 1.5/2.5/3.5 → rows 10 − y − 0.5 = 8.0/7.0/6.0
    assert(r1 == (for { c <- 1 to 3; r <- 6 to 8 } yield
      (c.toLong, r.toLong)).toSet, s"got $r1")
    // overlap: a second square with a LARGER id loses the shared cells
    val both = sq.unionByName(
      mk(2L, Seq((2.2, 2.2), (5.8, 2.2), (5.8, 5.8), (2.2, 5.8))))
    val burned = SpatialOps.rasterizePolygons(both, col("pid"), col("geom"),
        0.0, 10.0, 1.0, 1.0, width = 10, height = 10)
      .collect().map(r => (r.getLong(2), r.getLong(3)) -> r.getLong(4)).toMap
    assert(burned((3L, 6L)) == 1L, "shared cell burns the smaller id")
    assert(burned((5L, 5L)) == 2L)
    // off-grid polygon contributes nothing (sequence-descend guard)
    val off = mk(3L, Seq((-9.0, -9.0), (-5.0, -9.0), (-5.0, -5.0)))
    assert(SpatialOps.rasterizePolygons(off, col("pid"), col("geom"),
      0.0, 10.0, 1.0, 1.0, 10, 10).isEmpty)
  }

  test("A3+: d8FlowAccumulation — bowl drains to the pit, chain accumulates") {
    import graft.ops.SpatialOps
    // 3x3 bowl: center z=0, edge-adjacent z=2, corners z=3 — every cell
    // flows (directly or via an edge cell) into the pit
    val bowl = (for { x <- 0 to 2; y <- 0 to 2 } yield {
      val z = if (x == 1 && y == 1) 0L
        else if ((x == 1) || (y == 1)) 2L else 3L
      (x.toLong, y.toLong, z)
    }).toDF("x", "y", "z")
    val r = SpatialOps.d8FlowAccumulation(bowl,
        col("x"), col("y"), col("z"), rounds = 4)
      .collect().map(row => (row.getLong(0), row.getLong(1)) ->
        (if (row.isNullAt(2)) None else Some(row.getLong(2)),
          row.getLong(3))).toMap
    // the pit has no downslope neighbor and collects all 9 cells
    assert(r((1L, 1L)) == ((None, 9L)))
    // corners: steepest drop is the diagonal to the pit (drop 3, w=1 →
    // s2=9) vs edge neighbors (drop 1, w=2 → s2=2); all flow diagonal
    assert(r((0L, 0L))._1 == Some(1L) && r((0L, 0L))._2 == 1L) // SE
    assert(r((2L, 2L))._1 == Some(5L)) // NW
    // edge cells flow straight into the pit and carry only themselves
    assert(r((1L, 0L)) == ((Some(2L), 1L)))
    assert(r((0L, 1L)) == ((Some(0L), 1L)))
    // 1-D descending chain: acc = position along the chain
    val chain = (0 to 5).map(x => (x.toLong, 0L, (10 - x).toLong))
      .toDF("x", "y", "z")
    val rc = SpatialOps.d8FlowAccumulation(chain,
        col("x"), col("y"), col("z"), rounds = 6)
      .collect().map(row => row.getLong(0) -> row.getLong(3)).toMap
    assert(rc == Map(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L,
      5L -> 6L))
    // horizon contract: too few rounds truncates DETERMINISTICALLY
    val rc2 = SpatialOps.d8FlowAccumulation(chain,
        col("x"), col("y"), col("z"), rounds = 2)
      .collect().map(row => row.getLong(0) -> row.getLong(3)).toMap
    assert(rc2(5L) == 3L, "acc_2 counts upstream cells within 2 hops")
    // watersheds: every bowl cell labels to the pit; the chain labels
    // to its end — doubling with 3 rounds covers the depth-5 chain
    val wb = SpatialOps.d8Watersheds(bowl,
        col("x"), col("y"), col("z"), rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(wb.values.forall(_ == ((1L, 1L))), s"one basin: $wb")
    val wc = SpatialOps.d8Watersheds(chain,
        col("x"), col("y"), col("z"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(wc.values.forall(_ == 5L), s"chain drains to x=5: $wc")
  }

  test("A3+: zonalStats — rectangle zone collects exactly its interior cells") {
    import graft.geo.Geo
    import graft.ops.SpatialOps
    // 5x5 single-band grid at integer coords, value = x + 10*y + 1
    val cells = spark.range(25).select(lit(1).cast("int").as("band"),
      (col("id") % 5).cast("double").as("x"),
      expr("CAST(id div 5 AS DOUBLE)").as("y"),
      ((col("id") % 5) + expr("id div 5") * 10 + 1).cast("double").as("value"))
    // zone = open rectangle (0.5,0.5)-(2.5,2.5): interior centers are
    // (1,1),(2,1),(1,2),(2,2) -> values 12,13,22,23
    val zone = spark.range(1).select(lit(7L).as("zid"),
      Geo.stPolygon(expr("array(struct(0.5d as x, 0.5d as y), " +
        "struct(0.5d as x, 2.5d as y), struct(2.5d as x, 2.5d as y), " +
        "struct(2.5d as x, 0.5d as y))")).as("g"))
    val r = SpatialOps.zonalStats(cells, zone, "zid", "g",
      funcs = Seq("mean", "max", "count"), cell = 4.0).collect()(0)
    assert(r.getAs[Long]("zid") == 7L && r.getAs[Int]("band") == 1)
    assert(r.getAs[Long]("count_value") == 4L)
    assert(r.getAs[Double]("max_value") == 23.0)
    assert(r.getAs[Double]("mean_value") == (12.0 + 13 + 22 + 23) / 4)
    // nodata cells are excluded scan-side
    val r2 = SpatialOps.zonalStats(cells, zone, "zid", "g",
      funcs = Seq("count"), cell = 4.0, nodata = 12.0).collect()(0)
    assert(r2.getAs[Long]("count_value") == 3L)
  }

  test("A3+: rasterResample — 4x4 -> 2x2 mean with exact centroid centers") {
    import graft.ops.SpatialOps
    // 4x4 raster, origin (0,4), scale 1: centers x=c+0.5, y=4-r-0.5,
    // value = r*4 + c (row-major)
    val cells = spark.range(16).select(lit(1).cast("int").as("band"),
      ((col("id") % 4).cast("double") + 0.5).as("x"),
      (lit(4.0) - expr("CAST(id div 4 AS DOUBLE)") - 0.5).as("y"),
      col("id").cast("double").as("value"))
    val out = SpatialOps.rasterResample(cells, 0.0, 4.0, 1.0, 1.0,
      factor = 2, agg = "mean").orderBy(col("x"), col("y")).collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("n_cells") == 4L))
    val byXY = out.map(r => ((r.getAs[Double]("x"), r.getAs[Double]("y")),
      r.getAs[Double]("value"))).toMap
    // top-left block rows 0-1, cols 0-1: values {0,1,4,5} mean 2.5,
    // center = (mean(0.5,1.5), mean(3.5,2.5)) = (1.0, 3.0)
    assert(byXY((1.0, 3.0)) == 2.5)
    // bottom-right block rows 2-3, cols 2-3: {10,11,14,15} mean 12.5
    assert(byXY((3.0, 1.0)) == 12.5)
    // sum / min / max / count variants
    val s = SpatialOps.rasterResample(cells, 0.0, 4.0, 1.0, 1.0, 2, "sum")
      .orderBy(col("x"), col("y")).collect()
    assert(s.map(_.getAs[Double]("value")).sum == (0 until 16).sum.toDouble)
    intercept[IllegalArgumentException] {
      SpatialOps.rasterResample(cells, 0.0, 4.0, 1.0, 1.0, 2, "median")
    }
  }

  test("A3+: terrainGradients — Horn kernel is exact on a tilted plane") {
    import graft.ops.SpatialOps
    // 5x4 raster, origin (0,4), scale 1: centers x=c+0.5, y=4-r-0.5;
    // plane z = 2x + 3y -> dzdx = 2, dzdy = 3, tan2 = 13 everywhere
    val cells = spark.range(20).select(lit(1).cast("int").as("band"),
      ((col("id") % 5).cast("double") + 0.5).as("x"),
      (lit(4.0) - expr("CAST(id div 5 AS DOUBLE)") - 0.5).as("y"),
      (((col("id") % 5).cast("double") + 0.5) * 2 +
        (lit(4.0) - expr("CAST(id div 5 AS DOUBLE)") - 0.5) * 3).as("value"))
    val g = SpatialOps.terrainGradients(cells, 0.0, 4.0, 1.0, 1.0).collect()
    // interior = 3x2 cells
    assert(g.length == 6)
    assert(g.forall(_.getAs[Double]("dzdx") == 2.0))
    assert(g.forall(_.getAs[Double]("dzdy") == 3.0))
    assert(g.forall(_.getAs[Double]("slope_tan2") == 13.0))
    // a flat raster has zero gradient
    val flat = cells.withColumn("value", lit(5.0))
    val gf = SpatialOps.terrainGradients(flat, 0.0, 4.0, 1.0, 1.0).collect()
    assert(gf.forall(_.getAs[Double]("slope_tan2") == 0.0))
  }
}
