package graft.geo

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Geometry model (SURVEY.md §1.1, F9-F10).
  *
  * No Sedona jars ship in this build, so geometry is a plain Spark
  * struct — `STRUCT<kind: STRING, points: ARRAY<STRUCT<x,y: DOUBLE>>>`
  * — with `st_*` functions over it. kinds: "point" (1 vertex) and
  * "polygon" (ring, implicitly closed: last vertex != first, edges wrap).
  *
  * Everything that can be a pure column expression IS one (shoelace
  * area/centroid/bounds via `transform`/`aggregate`/`zip_with`): those
  * stay inside codegen and need no serialization. Only buffer,
  * general distance and intersects are Scala UDFs — they are API-compat
  * surface, not the hot path: the aggregation kernels (graft.ops.
  * SpatialOps) run on extracted centroid/bbox DOUBLE columns precisely
  * so the 100 TB joins never evaluate a UDF per pair.
  *
  * CRS (mirrors reference crs attribute, src/data_preprocessing.py:
  * 184-185): an `epsg: INT` column travels next to the geometry;
  * `st_transform` implements EPSG:4326 ↔ 3857 (spherical Mercator) —
  * the reference workflows' reprojection pair; a full proj database is
  * documented out of scope.
  */
/** UDF return shape for grid-shift stages: encodes as the engine's
  * {x, y} point struct. TOP-LEVEL and public on purpose — a nested
  * private case class breaks whole-stage codegen's generated accessor
  * calls (Janino visibility), silently dropping the scan to
  * interpreter mode. */
final case class GridPt(x: Double, y: Double)

object Geo {

  val pointType: StructType = StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType)))
  val geometryType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("points", ArrayType(pointType))))

  // ---- constructors ----

  def stPoint(x: Column, y: Column): Column =
    struct(lit("point").as("kind"), array(struct(x.as("x"), y.as("y"))).as("points"))

  /** Polygon from an array<struct<x,y>> column (ring, open). */
  def stPolygon(points: Column): Column =
    struct(lit("polygon").as("kind"), points.as("points"))

  /** LineString from an array<struct<x,y>> column (open path). */
  def stLineString(points: Column): Column =
    struct(lit("linestring").as("kind"), points.as("points"))

  // ---- pure column-expression accessors ----

  def stKind(g: Column): Column = g.getField("kind")
  private def pts(g: Column): Column = g.getField("points")

  def stX(g: Column): Column = element_at(pts(g), 1).getField("x")
  def stY(g: Column): Column = element_at(pts(g), 1).getField("y")

  def stIsEmpty(g: Column): Column = g.isNull || size(pts(g)) === 0

  /** Validity: point = exactly 1 finite vertex; linestring = >= 2
    * finite vertices; polygon = >= 3 vertices, all finite, nonzero
    * area (degenerate rings are invalid). */
  def stIsValid(g: Column): Column = {
    val finite = forall(pts(g), p =>
      !isnan(p.getField("x")) && !isnan(p.getField("y")) &&
        p.getField("x").isNotNull && p.getField("y").isNotNull)
    when(stIsEmpty(g), lit(false))
      .when(stKind(g) === "point", size(pts(g)) === 1 && finite)
      .when(stKind(g) === "linestring", size(pts(g)) >= 2 && finite)
      .otherwise(size(pts(g)) >= 3 && finite && stArea(g) > 0)
  }

  /** Ring edges as zip of (p_i, p_{i+1 mod n}) — basis for shoelace.
    * greatest(…, 0): an empty points array must yield an empty edge
    * list, not a negative slice length (runtime error). */
  private def edges(g: Column): Column = {
    val p = pts(g)
    val shifted = concat(
      slice(p, lit(2), greatest(size(p) - 1, lit(0))),
      slice(p, lit(1), least(size(p), lit(1))))
    zip_with(p, shifted, (a, b) => struct(a.as("a"), b.as("b")))
  }

  /** Shoelace cross-term sum Σ (x_i·y_{i+1} − x_{i+1}·y_i). */
  private def cross2Sum(g: Column): Column =
    aggregate(edges(g), lit(0.0), (acc, e) => acc +
      (e.getField("a").getField("x") * e.getField("b").getField("y") -
       e.getField("b").getField("x") * e.getField("a").getField("y")))

  /** F9 — area: 0 for points and linestrings, |shoelace|/2 for
    * polygons. */
  def stArea(g: Column): Column =
    when(stKind(g) === "point" || stKind(g) === "linestring", lit(0.0))
      .otherwise(abs(cross2Sum(g)) / 2)

  /** F9 — bounds as struct(xmin, ymin, xmax, ymax). */
  def stBounds(g: Column): Column = {
    val xs = transform(pts(g), _.getField("x"))
    val ys = transform(pts(g), _.getField("y"))
    struct(array_min(xs).as("xmin"), array_min(ys).as("ymin"),
      array_max(xs).as("xmax"), array_max(ys).as("ymax"))
  }

  /** F9 — centroid (shapely semantics): point → itself; polygon →
    * area-weighted centroid; degenerate (zero-area) ring → vertex mean. */
  def stCentroid(g: Column): Column = {
    val n = size(pts(g)).cast("double")
    val mx = aggregate(pts(g), lit(0.0), (acc, p) => acc + p.getField("x")) / n
    val my = aggregate(pts(g), lit(0.0), (acc, p) => acc + p.getField("y")) / n
    val a2 = cross2Sum(g) // signed, ×2
    val cx = aggregate(edges(g), lit(0.0), (acc, e) => acc +
      (e.getField("a").getField("x") + e.getField("b").getField("x")) *
        (e.getField("a").getField("x") * e.getField("b").getField("y") -
         e.getField("b").getField("x") * e.getField("a").getField("y"))) / (lit(3.0) * a2)
    val cy = aggregate(edges(g), lit(0.0), (acc, e) => acc +
      (e.getField("a").getField("y") + e.getField("b").getField("y")) *
        (e.getField("a").getField("x") * e.getField("b").getField("y") -
         e.getField("b").getField("x") * e.getField("a").getField("y"))) / (lit(3.0) * a2)
    when(stKind(g) === "point", g)
      // linestring: vertex mean (documented scope — not the
      // length-weighted shapely line centroid)
      .when(stKind(g) === "linestring" || a2 === 0, stPoint(mx, my))
      .otherwise(stPoint(cx, cy))
  }

  // ---- scala-side geometry kernels (UDF surface) ----

  private case class P(x: Double, y: Double)

  private def rowPts(g: Row): IndexedSeq[P] = {
    val seq = g.getSeq[Row](1)
    seq.map(r => P(r.getDouble(0), r.getDouble(1))).toIndexedSeq
  }

  private def segDist(p: P, a: P, b: P): Double = {
    val (dx, dy) = (b.x - a.x, b.y - a.y)
    val len2 = dx * dx + dy * dy
    val t = if (len2 == 0) 0.0
    else math.max(0.0, math.min(1.0, ((p.x - a.x) * dx + (p.y - a.y) * dy) / len2))
    math.hypot(p.x - (a.x + t * dx), p.y - (a.y + t * dy))
  }

  private def ringEdges(ps: IndexedSeq[P]): Iterator[(P, P)] =
    ps.indices.iterator.map(i => (ps(i), ps((i + 1) % ps.length)))

  private def pointInRing(p: P, ring: IndexedSeq[P]): Boolean = {
    // ray cast to +x
    var inside = false
    ringEdges(ring).foreach { case (a, b) =>
      val intersects = (a.y > p.y) != (b.y > p.y) &&
        p.x < (b.x - a.x) * (p.y - a.y) / (b.y - a.y) + a.x
      if (intersects) inside = !inside
    }
    inside
  }

  private def segsIntersect(p1: P, p2: P, p3: P, p4: P): Boolean = {
    def orient(a: P, b: P, c: P): Double =
      (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)
    def onSeg(a: P, b: P, c: P): Boolean =
      math.min(a.x, b.x) <= c.x && c.x <= math.max(a.x, b.x) &&
        math.min(a.y, b.y) <= c.y && c.y <= math.max(a.y, b.y)
    val (d1, d2) = (orient(p3, p4, p1), orient(p3, p4, p2))
    val (d3, d4) = (orient(p1, p2, p3), orient(p1, p2, p4))
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) true
    else (d1 == 0 && onSeg(p3, p4, p1)) || (d2 == 0 && onSeg(p3, p4, p2)) ||
      (d3 == 0 && onSeg(p1, p2, p3)) || (d4 == 0 && onSeg(p1, p2, p4))
  }

  private def geomDistance(g1: Row, g2: Row): Double = {
    val (k1, k2) = (g1.getString(0), g2.getString(0))
    val (p1, p2) = (rowPts(g1), rowPts(g2))
    if (p1.isEmpty || p2.isEmpty) Double.NaN
    else (k1, k2) match {
      case ("point", "point") => math.hypot(p1.head.x - p2.head.x, p1.head.y - p2.head.y)
      case ("point", "polygon") =>
        if (pointInRing(p1.head, p2)) 0.0
        else ringEdges(p2).map { case (a, b) => segDist(p1.head, a, b) }.min
      case ("polygon", "point") => geomDistance(g2, g1)
      case _ => // polygon-polygon: 0 if intersecting, else min edge-pair distance
        if (geomIntersects(g1, g2)) 0.0
        else {
          var best = Double.MaxValue
          ringEdges(p1).foreach { case (a, b) =>
            ringEdges(p2).foreach { case (c, d) =>
              best = math.min(best, math.min(
                math.min(segDist(a, c, d), segDist(b, c, d)),
                math.min(segDist(c, a, b), segDist(d, a, b))))
            }
          }
          best
        }
    }
  }

  private def geomIntersects(g1: Row, g2: Row): Boolean = {
    val (k1, k2) = (g1.getString(0), g2.getString(0))
    val (p1, p2) = (rowPts(g1), rowPts(g2))
    if (p1.isEmpty || p2.isEmpty) false
    else (k1, k2) match {
      case ("point", "point") => p1.head == p2.head
      case ("point", "polygon") => pointInRing(p1.head, p2) ||
        ringEdges(p2).exists { case (a, b) => segDist(p1.head, a, b) == 0.0 }
      case ("polygon", "point") => geomIntersects(g2, g1)
      case _ =>
        pointInRing(p1.head, p2) || pointInRing(p2.head, p1) ||
          ringEdges(p1).exists { case (a, b) =>
            ringEdges(p2).exists { case (c, d) => segsIntersect(a, b, c, d) }
          }
    }
  }

  private def bufferPoly(cx: Double, cy: Double, r: Double, resolution: Int): Seq[Row] = {
    val n = 4 * resolution // shapely: `resolution` segments per quarter circle
    (0 until n).map { i =>
      val theta = 2 * math.Pi * i / n
      Row(cx + r * math.cos(theta), cy + r * math.sin(theta))
    }
  }

  /** F9 — shapely-style `distance` (min distance between geometries).
    * Option return: null geometry → null distance (struct-typed UDF
    * inputs are not auto-null-skipped). */
  val stDistance = udf((g1: Row, g2: Row) =>
    if (g1 == null || g2 == null) None else Some(geomDistance(g1, g2)))

  /** F9 — `intersects` predicate; null geometry → null. */
  val stIntersects = udf((g1: Row, g2: Row) =>
    if (g1 == null || g2 == null) None else Some(geomIntersects(g1, g2)))

  /** STRICT even-odd point-in-polygon (ray cast only, NO boundary
    * disjunct): a point exactly on a polygon edge is NOT contained.
    * This is the GDAL center-containment burn rule rasterization
    * needs — [[stIntersects]] is boundary-inclusive and would burn a
    * cell whose center sits on an edge, disagreeing with an even-odd
    * oracle. Null geometry → null. */
  val stContainsPointStrict = udf((poly: Row, pt: Row) =>
    if (poly == null || pt == null) None
    else {
      val ring = rowPts(poly)
      val p = rowPts(pt)
      if (ring.isEmpty || p.isEmpty) Some(false)
      else Some(pointInRing(p.head, ring))
    })

  /** F9 — `buffer(r, resolution)` of a geometry's centroid-as-point:
    * a 4·resolution-gon, default resolution 16 matching shapely
    * (reference :194, :221 buffer(r, resolution=16)). Java UDF API:
    * Row-returning Scala UDFs need an explicit result type. */
  val stBuffer: (Column, Column, Column) => Column = {
    val f = new org.apache.spark.sql.api.java.UDF3[Row, java.lang.Double, java.lang.Integer, Row] {
      override def call(g: Row, r: java.lang.Double, resolution: java.lang.Integer): Row = {
        if (g == null) return null // struct UDF inputs are not auto-null-skipped
        val ps = rowPts(g)
        if (ps.isEmpty) Row("polygon", Seq.empty[Row])
        else {
          // reference only ever buffers centroids (centroid.buffer(r),
          // :194/:221): points buffer their vertex, polygons their
          // area-weighted (shoelace) centroid — same math as stCentroid
          val c =
            if (g.getString(0) == "point" || ps.length < 3) ps.head
            else {
              val a2 = ringEdges(ps).map { case (a, b) => a.x * b.y - b.x * a.y }.sum
              if (a2 == 0) P(ps.map(_.x).sum / ps.length, ps.map(_.y).sum / ps.length)
              else {
                val cx = ringEdges(ps).map { case (a, b) =>
                  (a.x + b.x) * (a.x * b.y - b.x * a.y) }.sum / (3.0 * a2)
                val cy = ringEdges(ps).map { case (a, b) =>
                  (a.y + b.y) * (a.x * b.y - b.x * a.y) }.sum / (3.0 * a2)
                P(cx, cy)
              }
            }
          Row("polygon", bufferPoly(c.x, c.y, r, resolution))
        }
      }
    }
    val u = udf(f, geometryType)
    (g, r, res) => u(g, r, res)
  }

  // ---- F10: CRS transform (4326 <-> 3857 <-> UTM), pure column math ----

  private val R = 6378137.0

  // WGS84 ellipsoid + transverse-Mercator (UTM) constants
  private val TmF = 1.0 / 298.257223563        // flattening
  private val TmE2 = TmF * (2 - TmF)           // first eccentricity²
  private val TmEp2 = TmE2 / (1 - TmE2)        // second eccentricity²
  private val TmK0 = 0.9996
  // meridian-arc series coefficients (Snyder 3-21)
  private val M0 = 1 - TmE2 / 4 - 3 * TmE2 * TmE2 / 64 - 5 * math.pow(TmE2, 3) / 256
  private val M2 = 3 * TmE2 / 8 + 3 * TmE2 * TmE2 / 32 + 45 * math.pow(TmE2, 3) / 1024
  private val M4 = 15 * TmE2 * TmE2 / 256 + 45 * math.pow(TmE2, 3) / 1024
  private val M6 = 35 * math.pow(TmE2, 3) / 3072
  private val TmE1 = (1 - math.sqrt(1 - TmE2)) / (1 + math.sqrt(1 - TmE2))

  /** EPSG 326xx (UTM north) / 327xx (UTM south) → (zone, northHemisphere). */
  private def utmZone(epsg: Int): Option[(Int, Boolean)] =
    if (epsg >= 32601 && epsg <= 32660) Some((epsg - 32600, true))
    else if (epsg >= 32701 && epsg <= 32760) Some((epsg - 32700, false))
    else None

  /** Forward transverse Mercator, WGS84 (Snyder 8-9..8-13): lon/lat
    * degrees → UTM easting/northing meters. Pure column arithmetic,
    * series accurate to ~mm inside the zone. */
  private def llToUtm(zone: Int, north: Boolean): Column => Column = p => {
    val phi = radians(p.getField("y"))
    val lam0 = math.toRadians(-183.0 + 6.0 * zone)
    val sinP = sin(phi); val cosP = cos(phi); val tanP = tan(phi)
    val nR = lit(R) / sqrt(lit(1.0) - lit(TmE2) * sinP * sinP)
    val t = tanP * tanP
    val c = lit(TmEp2) * cosP * cosP
    val a = (radians(p.getField("x")) - lit(lam0)) * cosP
    val m = lit(R) * (lit(M0) * phi - lit(M2) * sin(phi * 2) +
      lit(M4) * sin(phi * 4) - lit(M6) * sin(phi * 6))
    val e = lit(500000.0) + lit(TmK0) * nR * (a +
      (lit(1.0) - t + c) * pow(a, 3) / 6 +
      (lit(5.0) - t * 18 + t * t + c * 72 - lit(58 * TmEp2)) * pow(a, 5) / 120)
    val n = lit(if (north) 0.0 else 1.0e7) + lit(TmK0) * (m + nR * tanP * (
      a * a / 2 +
      (lit(5.0) - t + c * 9 + c * c * 4) * pow(a, 4) / 24 +
      (lit(61.0) - t * 58 + t * t + c * 600 - lit(330 * TmEp2)) * pow(a, 6) / 720))
    struct(e.as("x"), n.as("y"))
  }

  /** Inverse transverse Mercator, WGS84 (Snyder 8-17..8-25): UTM
    * easting/northing meters → lon/lat degrees. */
  private def utmToLl(zone: Int, north: Boolean): Column => Column = p => {
    val lam0 = math.toRadians(-183.0 + 6.0 * zone)
    val m = (p.getField("y") - lit(if (north) 0.0 else 1.0e7)) / TmK0
    val mu = m / (R * M0)
    val e1 = TmE1
    val phi1 = mu +
      lit(3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * sin(mu * 2) +
      lit(21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * sin(mu * 4) +
      lit(151 * math.pow(e1, 3) / 96) * sin(mu * 6) +
      lit(1097 * math.pow(e1, 4) / 512) * sin(mu * 8)
    val sin1 = sin(phi1); val cos1 = cos(phi1); val tan1 = tan(phi1)
    val c1 = lit(TmEp2) * cos1 * cos1
    val t1 = tan1 * tan1
    val oneMinus = lit(1.0) - lit(TmE2) * sin1 * sin1
    val n1 = lit(R) / sqrt(oneMinus)
    val r1 = lit(R * (1 - TmE2)) / pow(oneMinus, 1.5)
    val d = (p.getField("x") - lit(500000.0)) / (n1 * TmK0)
    val phi = phi1 - (n1 * tan1 / r1) * (
      d * d / 2 -
      (lit(5.0) + t1 * 3 + c1 * 10 - c1 * c1 * 4 - lit(9 * TmEp2)) * pow(d, 4) / 24 +
      (lit(61.0) + t1 * 90 + c1 * 298 + t1 * t1 * 45 - lit(252 * TmEp2) - c1 * c1 * 3) *
        pow(d, 6) / 720)
    val lam = lit(lam0) + (d -
      (lit(1.0) + t1 * 2 + c1) * pow(d, 3) / 6 +
      (lit(5.0) - c1 * 2 + t1 * 28 - c1 * c1 * 3 + lit(8 * TmEp2) + t1 * t1 * 24) *
        pow(d, 5) / 120) / cos1
    struct(degrees(lam).as("x"), degrees(phi).as("y"))
  }

  // ---- Lambert conformal conic (EPSG 2154, Lambert-93) and Lambert
  // azimuthal equal-area (EPSG 3035, ETRS89-extended / LAEA Europe),
  // ellipsoidal forms on GRS80 (Snyder, "Map Projections — A Working
  // Manual", ch. 15 and 24). Projection constants are plain driver-side
  // doubles; only the per-point trig runs as column math.

  private val GrsA = 6378137.0
  private val GrsF = 1.0 / 298.257222101
  private val GrsE2 = GrsF * (2 - GrsF)
  private val GrsE = math.sqrt(GrsE2)

  // scalar (driver-side) Snyder helpers on GRS80
  private def sM(phi: Double) =
    math.cos(phi) / math.sqrt(1 - GrsE2 * math.sin(phi) * math.sin(phi))
  private def sT(phi: Double) =
    math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1 - GrsE * math.sin(phi)) / (1 + GrsE * math.sin(phi)), GrsE / 2)
  private def sQ(phi: Double) = (1 - GrsE2) * (
    math.sin(phi) / (1 - GrsE2 * math.sin(phi) * math.sin(phi)) -
      (1 / (2 * GrsE)) *
        math.log((1 - GrsE * math.sin(phi)) / (1 + GrsE * math.sin(phi))))

  // column versions of the same helpers
  private def cT(phi: Column): Column =
    tan(lit(math.Pi / 4) - phi / 2) /
      pow((lit(1.0) - lit(GrsE) * sin(phi)) / (lit(1.0) + lit(GrsE) * sin(phi)), GrsE / 2)
  private def cQ(phi: Column): Column = lit(1 - GrsE2) * (
    sin(phi) / (lit(1.0) - lit(GrsE2) * sin(phi) * sin(phi)) -
      lit(1 / (2 * GrsE)) *
        log((lit(1.0) - lit(GrsE) * sin(phi)) / (lit(1.0) + lit(GrsE) * sin(phi))))

  /** Lambert-93 (EPSG 2154) constants: standard parallels 44/49°N,
    * origin (3°E, 46.5°N), false origin (700000, 6600000). */
  private object L93 {
    val phi1 = math.toRadians(49.0); val phi2 = math.toRadians(44.0)
    val phi0 = math.toRadians(46.5); val lam0 = math.toRadians(3.0)
    val e0 = 700000.0; val n0 = 6600000.0
    val n = (math.log(sM(phi1)) - math.log(sM(phi2))) /
      (math.log(sT(phi1)) - math.log(sT(phi2)))
    val fBig = sM(phi1) / (n * math.pow(sT(phi1), n))
    val rho0 = GrsA * fBig * math.pow(sT(phi0), n)
  }

  /** LCC forward (Snyder 15-1..15-7): lon/lat degrees → Lambert-93 m. */
  private val lccFwd: Column => Column = p => {
    import L93._
    val phi = radians(p.getField("y"))
    val rho = lit(GrsA * fBig) * pow(cT(phi), n)
    val theta = (radians(p.getField("x")) - lit(lam0)) * n
    struct((lit(e0) + rho * sin(theta)).as("x"),
      (lit(n0) + lit(rho0) - rho * cos(theta)).as("y"))
  }

  /** Conformal→geodetic latitude, closed-form series (Snyder 3-5) —
    * no fixed-point iteration: an unrolled iteration re-references φ
    * many times per step, and Catalyst expression trees grow
    * multiplicatively with each reference (8^k nodes), which stalls
    * analysis. The series is a single linear-size expression accurate
    * to ~1e-10 rad on GRS80. */
  private def conformalToGeodetic(chi: Column): Column = {
    val e2 = GrsE2; val e4 = e2 * e2; val e6 = e4 * e2; val e8 = e4 * e4
    chi +
      lit(e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * sin(chi * 2) +
      lit(7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * sin(chi * 4) +
      lit(7 * e6 / 120 + 81 * e8 / 1120) * sin(chi * 6) +
      lit(4279 * e8 / 161280) * sin(chi * 8)
  }

  /** Authalic→geodetic latitude, closed-form series (Snyder 3-18). */
  private def authalicToGeodetic(beta: Column): Column = {
    val e2 = GrsE2; val e4 = e2 * e2; val e6 = e4 * e2
    beta +
      lit(e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * sin(beta * 2) +
      lit(23 * e4 / 360 + 251 * e6 / 3780) * sin(beta * 4) +
      lit(761 * e6 / 45360) * sin(beta * 6)
  }

  /** LCC inverse (Snyder 15-8..15-11 + series 3-5): Lambert-93 m →
    * lon/lat degrees. */
  private val lccInv: Column => Column = p => {
    import L93._
    val dx = p.getField("x") - lit(e0)
    val dy = lit(rho0) - (p.getField("y") - lit(n0))
    val rho = sqrt(dx * dx + dy * dy) * lit(math.signum(n))
    val t = pow(rho / lit(GrsA * fBig), 1.0 / n)
    val theta = atan2(dx, dy)
    val lam = lit(lam0) + theta / n
    val chi = lit(math.Pi / 2) - atan(t) * 2
    struct(degrees(lam).as("x"), degrees(conformalToGeodetic(chi)).as("y"))
  }

  /** LAEA Europe (EPSG 3035) constants: origin (10°E, 52°N), false
    * origin (4321000, 3210000). */
  private object Laea {
    val phi0 = math.toRadians(52.0); val lam0 = math.toRadians(10.0)
    val e0 = 4321000.0; val n0 = 3210000.0
    val qp = sQ(math.Pi / 2)
    val q0 = sQ(phi0)
    val beta0 = math.asin(q0 / qp)
    val rq = GrsA * math.sqrt(qp / 2)
    val d = GrsA * sM(phi0) / (rq * math.cos(beta0))
  }

  /** LAEA forward (Snyder 24-2..24-14 ellipsoidal, oblique aspect). */
  private val laeaFwd: Column => Column = p => {
    import Laea._
    val phi = radians(p.getField("y"))
    val dl = radians(p.getField("x")) - lit(lam0)
    val beta = asin(cQ(phi) / qp)
    val b = lit(rq) * sqrt(lit(2.0) /
      (lit(1.0) + lit(math.sin(beta0)) * sin(beta) +
        lit(math.cos(beta0)) * cos(beta) * cos(dl)))
    struct(
      (lit(e0) + b * lit(d) * cos(beta) * sin(dl)).as("x"),
      (lit(n0) + (b / d) * (lit(math.cos(beta0)) * sin(beta) -
        lit(math.sin(beta0)) * cos(beta) * cos(dl))).as("y"))
  }

  /** LAEA inverse (Snyder 24-16..24-21 + series 3-18 for φ from the
    * authalic latitude). */
  private val laeaInv: Column => Column = p => {
    import Laea._
    val x = p.getField("x") - lit(e0)
    val y = p.getField("y") - lit(n0)
    val rho = sqrt((x / d) * (x / d) + (y * lit(d)) * (y * lit(d)))
    val ce = asin(rho / lit(2 * rq)) * 2
    val q = lit(qp) * (cos(ce) * lit(math.sin(beta0)) +
      (y * lit(d) * sin(ce) * lit(math.cos(beta0))) / rho)
    val lam = lit(lam0) + atan2(x * sin(ce),
      lit(d) * rho * lit(math.cos(beta0)) * cos(ce) -
        lit(d * d) * y * lit(math.sin(beta0)) * sin(ce))
    val beta = asin(q / qp)
    val phi = authalicToGeodetic(beta)
    // exact-origin guard: at the projection center rho == 0 and the
    // q expression divides by it
    struct(
      degrees(when(rho === 0, lit(lam0)).otherwise(lam)).as("x"),
      degrees(when(rho === 0, lit(phi0)).otherwise(phi)).as("y"))
  }

  /** Spherical-Mercator forward (4326 → 3857) on a point struct. */
  private val mercFwd: Column => Column = p => struct(
    (radians(p.getField("x")) * R).as("x"),
    (log(tan(lit(math.Pi / 4) + radians(p.getField("y")) / 2)) * R).as("y"))

  /** Spherical-Mercator inverse (3857 → 4326); atan(sinh(y/R)) via exp
    * (no sinh Column fn). */
  private val mercInv: Column => Column = p => struct(
    degrees(p.getField("x") / R).as("x"),
    degrees(atan((exp(p.getField("y") / R) - exp(-(p.getField("y") / R))) / 2)).as("y"))

  // ---- F10 broadening: PARAMETERIZED conic / cylindrical projections
  // (Snyder ch. 14/15/8 general forms) + a registration hook, so ANY
  // Lambert-conformal / Albers / transverse-Mercator national grid is
  // one parameter set away instead of a missing feature. Built-in
  // codes below cover the common continental grids; `registerLcc2sp` /
  // `registerAlbers` / `registerTm` accept arbitrary published EPSG
  // parameters (all public data). Default datum is the WGS84/GRS80
  // family (their flattenings differ in the 9th decimal — sub-mm);
  // grids on legacy datums register with their published Bursa-Wolf
  // parameters via `registerTmOnDatum` / `registerGeographicDatum`
  // (OSGB36's 27700/4277 are built in; round 8).

  /** Ellipsoid by semi-major axis and inverse flattening. */
  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = f * (2 - f)
    val e: Double = math.sqrt(e2)
  }
  val Grs80: Ellipsoid = Ellipsoid(6378137.0, 298.257222101)
  val Wgs84: Ellipsoid = Ellipsoid(6378137.0, 298.257223563)
  val Airy1830: Ellipsoid = Ellipsoid(6377563.396, 299.3249646)

  // generalized scalar Snyder helpers (the Grs-pinned sM/sT/sQ above
  // stay for the legacy 2154/3035 constants)
  private def gM(el: Ellipsoid, phi: Double) =
    math.cos(phi) / math.sqrt(1 - el.e2 * math.sin(phi) * math.sin(phi))
  private def gT(el: Ellipsoid, phi: Double) =
    math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1 - el.e * math.sin(phi)) / (1 + el.e * math.sin(phi)), el.e / 2)
  private def gQ(el: Ellipsoid, phi: Double) = (1 - el.e2) * (
    math.sin(phi) / (1 - el.e2 * math.sin(phi) * math.sin(phi)) -
      (1 / (2 * el.e)) *
        math.log((1 - el.e * math.sin(phi)) / (1 + el.e * math.sin(phi))))
  private def gCT(el: Ellipsoid, phi: Column): Column =
    tan(lit(math.Pi / 4) - phi / 2) /
      pow((lit(1.0) - lit(el.e) * sin(phi)) / (lit(1.0) + lit(el.e) * sin(phi)),
        el.e / 2)
  private def gCQ(el: Ellipsoid, phi: Column): Column = lit(1 - el.e2) * (
    sin(phi) / (lit(1.0) - lit(el.e2) * sin(phi) * sin(phi)) -
      lit(1 / (2 * el.e)) *
        log((lit(1.0) - lit(el.e) * sin(phi)) / (lit(1.0) + lit(el.e) * sin(phi))))

  private def gConformalToGeodetic(el: Ellipsoid, chi: Column): Column = {
    val e2 = el.e2; val e4 = e2 * e2; val e6 = e4 * e2; val e8 = e4 * e4
    chi +
      lit(e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * sin(chi * 2) +
      lit(7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * sin(chi * 4) +
      lit(7 * e6 / 120 + 81 * e8 / 1120) * sin(chi * 6) +
      lit(4279 * e8 / 161280) * sin(chi * 8)
  }
  private def gAuthalicToGeodetic(el: Ellipsoid, beta: Column): Column = {
    val e2 = el.e2; val e4 = e2 * e2; val e6 = e4 * e2
    beta +
      lit(e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * sin(beta * 2) +
      lit(23 * e4 / 360 + 251 * e6 / 3780) * sin(beta * 4) +
      lit(761 * e6 / 45360) * sin(beta * 6)
  }

  /** Lambert conformal conic, 2 standard parallels (Snyder 15-1..15-11;
    * EPSG method 9802). Angles in degrees, false origin in meters. */
  final case class Lcc2sp(el: Ellipsoid, lat1Deg: Double, lat2Deg: Double,
      lat0Deg: Double, lon0Deg: Double, falseE: Double, falseN: Double) {
    private val phi1 = math.toRadians(lat1Deg)
    private val phi2 = math.toRadians(lat2Deg)
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    val n: Double = (math.log(gM(el, phi1)) - math.log(gM(el, phi2))) /
      (math.log(gT(el, phi1)) - math.log(gT(el, phi2)))
    val fBig: Double = gM(el, phi1) / (n * math.pow(gT(el, phi1), n))
    val rho0: Double = el.a * fBig * math.pow(gT(el, phi0), n)
    def fwd: Column => Column = p => {
      val phi = radians(p.getField("y"))
      val rho = lit(el.a * fBig) * pow(gCT(el, phi), n)
      val theta = (radians(p.getField("x")) - lit(lam0)) * n
      struct((lit(falseE) + rho * sin(theta)).as("x"),
        (lit(falseN) + lit(rho0) - rho * cos(theta)).as("y"))
    }
    def inv: Column => Column = p => {
      val dx = p.getField("x") - lit(falseE)
      val dy = lit(rho0) - (p.getField("y") - lit(falseN))
      val rho = sqrt(dx * dx + dy * dy) * lit(math.signum(n))
      val t = pow(rho / lit(el.a * fBig), 1.0 / n)
      val theta = atan2(dx, dy)
      val lam = lit(lam0) + theta / n
      val chi = lit(math.Pi / 2) - atan(t) * 2
      struct(degrees(lam).as("x"),
        degrees(gConformalToGeodetic(el, chi)).as("y"))
    }
  }

  /** Albers equal-area conic, 2 standard parallels (Snyder 14-1..14-21;
    * EPSG method 9822) — the equal-area complement of LCC, used for the
    * US CONUS grid (EPSG 5070) and statistics grids generally. */
  final case class Albers2sp(el: Ellipsoid, lat1Deg: Double, lat2Deg: Double,
      lat0Deg: Double, lon0Deg: Double, falseE: Double, falseN: Double) {
    private val phi1 = math.toRadians(lat1Deg)
    private val phi2 = math.toRadians(lat2Deg)
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val m1 = gM(el, phi1); private val m2 = gM(el, phi2)
    private val q1 = gQ(el, phi1); private val q2 = gQ(el, phi2)
    private val q0 = gQ(el, phi0)
    val n: Double = (m1 * m1 - m2 * m2) / (q2 - q1)
    val cBig: Double = m1 * m1 + n * q1
    val rho0: Double = el.a * math.sqrt(cBig - n * q0) / n
    private val qp = gQ(el, math.Pi / 2)
    def fwd: Column => Column = p => {
      val phi = radians(p.getField("y"))
      val rho = lit(el.a) * sqrt(lit(cBig) - lit(n) * gCQ(el, phi)) / n
      val theta = (radians(p.getField("x")) - lit(lam0)) * n
      struct((lit(falseE) + rho * sin(theta)).as("x"),
        (lit(falseN) + lit(rho0) - rho * cos(theta)).as("y"))
    }
    def inv: Column => Column = p => {
      val dx = p.getField("x") - lit(falseE)
      val dy = lit(rho0) - (p.getField("y") - lit(falseN))
      val rho = sqrt(dx * dx + dy * dy)
      val q = (lit(cBig) - rho * rho * lit(n * n / (el.a * el.a))) / n
      val theta = atan2(dx, dy)
      val beta = asin(q / qp)
      struct(degrees(lit(lam0) + theta / n).as("x"),
        degrees(gAuthalicToGeodetic(el, beta)).as("y"))
    }
  }

  /** Transverse Mercator with explicit parameters (Snyder 8-9..8-25;
    * EPSG method 9807) — the UTM series generalized to arbitrary
    * origin/scale/false origin, covering grids like OSGB (27700,
    * geometric part) and national TM zones. */
  final case class TmParams(el: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      k0: Double, falseE: Double, falseN: Double) {
    private val e2 = el.e2
    private val ep2 = e2 / (1 - e2)
    private val m0c = 1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * math.pow(e2, 3) / 256
    private val m2c = 3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * math.pow(e2, 3) / 1024
    private val m4c = 15 * e2 * e2 / 256 + 45 * math.pow(e2, 3) / 1024
    private val m6c = 35 * math.pow(e2, 3) / 3072
    private val e1c = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    private val lam0 = math.toRadians(lon0Deg)
    private def arc(phi: Double): Double = el.a * (m0c * phi -
      m2c * math.sin(2 * phi) + m4c * math.sin(4 * phi) - m6c * math.sin(6 * phi))
    private val mOrigin = arc(math.toRadians(lat0Deg))
    def fwd: Column => Column = p => {
      val phi = radians(p.getField("y"))
      val sinP = sin(phi); val cosP = cos(phi); val tanP = tan(phi)
      val nR = lit(el.a) / sqrt(lit(1.0) - lit(e2) * sinP * sinP)
      val t = tanP * tanP
      val c = lit(ep2) * cosP * cosP
      val a = (radians(p.getField("x")) - lit(lam0)) * cosP
      val m = lit(el.a) * (lit(m0c) * phi - lit(m2c) * sin(phi * 2) +
        lit(m4c) * sin(phi * 4) - lit(m6c) * sin(phi * 6))
      val e = lit(falseE) + lit(k0) * nR * (a +
        (lit(1.0) - t + c) * pow(a, 3) / 6 +
        (lit(5.0) - t * 18 + t * t + c * 72 - lit(58 * ep2)) * pow(a, 5) / 120)
      val nn = lit(falseN) + lit(k0) * (m - lit(mOrigin) + nR * tanP * (
        a * a / 2 +
        (lit(5.0) - t + c * 9 + c * c * 4) * pow(a, 4) / 24 +
        (lit(61.0) - t * 58 + t * t + c * 600 - lit(330 * ep2)) * pow(a, 6) / 720))
      struct(e.as("x"), nn.as("y"))
    }
    def inv: Column => Column = p => {
      val m = lit(mOrigin) + (p.getField("y") - lit(falseN)) / k0
      val mu = m / (el.a * m0c)
      val phi1 = mu +
        lit(3 * e1c / 2 - 27 * math.pow(e1c, 3) / 32) * sin(mu * 2) +
        lit(21 * e1c * e1c / 16 - 55 * math.pow(e1c, 4) / 32) * sin(mu * 4) +
        lit(151 * math.pow(e1c, 3) / 96) * sin(mu * 6) +
        lit(1097 * math.pow(e1c, 4) / 512) * sin(mu * 8)
      val sin1 = sin(phi1); val cos1 = cos(phi1); val tan1 = tan(phi1)
      val c1 = lit(ep2) * cos1 * cos1
      val t1 = tan1 * tan1
      val oneMinus = lit(1.0) - lit(e2) * sin1 * sin1
      val n1 = lit(el.a) / sqrt(oneMinus)
      val r1 = lit(el.a * (1 - e2)) / pow(oneMinus, 1.5)
      val d = (p.getField("x") - lit(falseE)) / (n1 * lit(k0))
      val phi = phi1 - (n1 * tan1 / r1) * (
        d * d / 2 -
        (lit(5.0) + t1 * 3 + c1 * 10 - c1 * c1 * 4 - lit(9 * ep2)) * pow(d, 4) / 24 +
        (lit(61.0) + t1 * 90 + c1 * 298 + t1 * t1 * 45 - lit(252 * ep2) - c1 * c1 * 3) *
          pow(d, 6) / 720)
      val lam = lit(lam0) + (d -
        (lit(1.0) + t1 * 2 + c1) * pow(d, 3) / 6 +
        (lit(5.0) - c1 * 2 + t1 * 28 - c1 * c1 * 3 + lit(8 * ep2) + t1 * t1 * 24) *
          pow(d, 5) / 120) / cos1
      struct(degrees(lam).as("x"), degrees(phi).as("y"))
    }
  }

  /** Polar Stereographic variant B (EPSG method 9829; Snyder 21-32..
    * 21-40) — standard-parallel form used by the polar science grids
    * (NSIDC Sea Ice 3413 north, Antarctic 3031 south). */
  final case class PolarStereo(el: Ellipsoid, latTsDeg: Double,
      lon0Deg: Double, falseE: Double, falseN: Double, north: Boolean) {
    private val e = math.sqrt(el.e2)
    private val lam0 = math.toRadians(lon0Deg)
    private val phiF = math.toRadians(math.abs(latTsDeg))
    private def tOfD(phi: Double): Double =
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2)
    private val tF = tOfD(phiF)
    private val mF = math.cos(phiF) /
      math.sqrt(1 - el.e2 * math.sin(phiF) * math.sin(phiF))
    private val kRho = el.a * mF / tF
    // chi-to-phi series coefficients (Snyder 3-5)
    private val c2 = el.e2 / 2 + 5 * el.e2 * el.e2 / 24 +
      math.pow(el.e2, 3) / 12
    private val c4 = 7 * el.e2 * el.e2 / 48 + 29 * math.pow(el.e2, 3) / 240
    private val c6 = 7 * math.pow(el.e2, 3) / 120
    def fwd: Column => Column = p => {
      // south pole: work in the mirrored hemisphere
      val phi = if (north) radians(p.getField("y"))
        else -radians(p.getField("y"))
      val lam = if (north) radians(p.getField("x")) - lit(lam0)
        else -(radians(p.getField("x")) - lit(lam0))
      val tt = tan(lit(math.Pi / 4) - phi / 2) /
        pow((lit(1.0) - lit(e) * sin(phi)) / (lit(1.0) + lit(e) * sin(phi)),
          lit(e / 2))
      val rho = lit(kRho) * tt
      val x = rho * sin(lam)
      val y = -rho * cos(lam)
      if (north)
        struct((lit(falseE) + x).as("x"), (lit(falseN) + y).as("y"))
      else
        struct((lit(falseE) - x).as("x"), (lit(falseN) - y).as("y"))
    }
    def inv: Column => Column = p => {
      val dx0 = p.getField("x") - lit(falseE)
      val dy0 = p.getField("y") - lit(falseN)
      val dx = if (north) dx0 else -dx0
      val dy = if (north) dy0 else -dy0
      val rho = sqrt(dx * dx + dy * dy)
      val tt = rho / lit(kRho)
      val chi = lit(math.Pi / 2) - atan(tt) * 2
      val phi = chi + lit(c2) * sin(chi * 2) + lit(c4) * sin(chi * 4) +
        lit(c6) * sin(chi * 6)
      val lam = lit(lam0) + (if (north) atan2(dx, -dy) else -atan2(dx, -dy))
      struct(degrees(lam).as("x"),
        (if (north) degrees(phi) else -degrees(phi)).as("y"))
    }
  }

  /** Register an arbitrary polar-stereographic grid (variant B). */
  def registerPolarStereo(epsg: Int, el: Ellipsoid, latTsDeg: Double,
      lon0Deg: Double, falseE: Double, falseN: Double,
      north: Boolean): Unit = {
    val pr = PolarStereo(el, latTsDeg, lon0Deg, falseE, falseN, north)
    crsRegistry.put(epsg, (pr.fwd, pr.inv)); ()
  }

  // user-extensible CRS registry: any grid with published parameters
  // registers once per process and composes with every built-in
  private val crsRegistry =
    new java.util.concurrent.ConcurrentHashMap[Int, (Column => Column, Column => Column)]()

  /** Register an arbitrary LCC-2SP grid (EPSG parameters are public
    * data; e.g. most national/state conformal grids). */
  def registerLcc2sp(epsg: Int, el: Ellipsoid, lat1Deg: Double, lat2Deg: Double,
      lat0Deg: Double, lon0Deg: Double, falseE: Double, falseN: Double): Unit = {
    val pr = Lcc2sp(el, lat1Deg, lat2Deg, lat0Deg, lon0Deg, falseE, falseN)
    crsRegistry.put(epsg, (pr.fwd, pr.inv)); ()
  }
  /** Register an arbitrary Albers-2SP grid. */
  def registerAlbers(epsg: Int, el: Ellipsoid, lat1Deg: Double, lat2Deg: Double,
      lat0Deg: Double, lon0Deg: Double, falseE: Double, falseN: Double): Unit = {
    val pr = Albers2sp(el, lat1Deg, lat2Deg, lat0Deg, lon0Deg, falseE, falseN)
    crsRegistry.put(epsg, (pr.fwd, pr.inv)); ()
  }
  /** Register an arbitrary transverse-Mercator grid. */
  def registerTm(epsg: Int, el: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      k0: Double, falseE: Double, falseN: Double): Unit = {
    val pr = TmParams(el, lat0Deg, lon0Deg, k0, falseE, falseN)
    crsRegistry.put(epsg, (pr.fwd, pr.inv)); ()
  }

  // ---- datum shifts (round 8) ----------------------------------------
  // Closes the "legacy grids reproject geometrically, datum offset not
  // applied" boundary for any datum with published Bursa-Wolf
  // parameters (EPSG registry data — public). The shift runs through
  // geocentric XYZ, scan-side Column math like every projection.

  /** 7-parameter Helmert similarity transform, POSITION-VECTOR rotation
    * convention (EPSG method 9606 — the sign convention the OS and the
    * EPSG registry publish): translations in meters, rotations in
    * arc-seconds, scale in ppm, applied in geocentric XYZ as
    *   X' = t + (1+s)·R·X,  R = I + [[0,−rz,ry],[rz,0,−rx],[−ry,rx,0]].
    * The inverse is the EXACT algebraic inverse of the affine map (a
    * constant 3×3 solved at construction), not the negated-parameter
    * approximation — so a forward∘inverse round-trip is identity to
    * floating-point precision. */
  final case class Helmert(txM: Double, tyM: Double, tzM: Double,
      rxAs: Double, ryAs: Double, rzAs: Double, sPpm: Double) {
    private def asRad(v: Double) = math.toRadians(v / 3600.0)
    private val k = 1.0 + sPpm * 1e-6
    private val rx = asRad(rxAs); private val ry = asRad(ryAs)
    private val rz = asRad(rzAs)
    /** forward matrix, row-major */
    val m: Array[Double] = Array(
      k, -k * rz, k * ry,
      k * rz, k, -k * rx,
      -k * ry, k * rx, k)
    val t: Array[Double] = Array(txM, tyM, tzM)
    val mInv: Array[Double] = {
      val a = m
      val det = a(0) * (a(4) * a(8) - a(5) * a(7)) -
        a(1) * (a(3) * a(8) - a(5) * a(6)) +
        a(2) * (a(3) * a(7) - a(4) * a(6))
      require(math.abs(det) > 1e-30, "singular Helmert matrix")
      Array(
        (a(4) * a(8) - a(5) * a(7)) / det, (a(2) * a(7) - a(1) * a(8)) / det,
        (a(1) * a(5) - a(2) * a(4)) / det,
        (a(5) * a(6) - a(3) * a(8)) / det, (a(0) * a(8) - a(2) * a(6)) / det,
        (a(2) * a(3) - a(0) * a(5)) / det,
        (a(3) * a(7) - a(4) * a(6)) / det, (a(1) * a(6) - a(0) * a(7)) / det,
        (a(0) * a(4) - a(1) * a(3)) / det)
    }
    /** inverse translation −M⁻¹·t (X = M⁻¹·(X' − t)) */
    val tInv: Array[Double] = Array(
      -(mInv(0) * t(0) + mInv(1) * t(1) + mInv(2) * t(2)),
      -(mInv(3) * t(0) + mInv(4) * t(1) + mInv(5) * t(2)),
      -(mInv(6) * t(0) + mInv(7) * t(1) + mInv(8) * t(2)))
  }

  /** Published OSGB36 → WGS84 Bursa-Wolf parameters (OS "A guide to
    * coordinate systems in Great Britain" — public; single-set national
    * fit, ~2 m accuracy vs the OSTN grid solution). */
  val Osgb36ToWgs84: Helmert =
    Helmert(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)

  // geodetic (lon°, lat°, h = 0) ↔ geocentric XYZ on an ellipsoid
  private def geodeticToXyz(el: Ellipsoid, p: Column): Column = {
    val phi = radians(p.getField("y")); val lam = radians(p.getField("x"))
    val sinP = sin(phi); val cosP = cos(phi)
    val nu = lit(el.a) / sqrt(lit(1.0) - lit(el.e2) * sinP * sinP)
    struct((nu * cosP * cos(lam)).as("x"), (nu * cosP * sin(lam)).as("y"),
      (nu * lit(1 - el.e2) * sinP).as("z"))
  }
  // Bowring's direct solution (Bowring 1976, public literature) —
  // sub-mm horizontal accuracy for earth-surface points, no iteration
  private def xyzToGeodetic(el: Ellipsoid, c: Column): Column = {
    val b = el.a * (1 - el.f)
    val ep2 = el.e2 / (1 - el.e2)
    val x = c.getField("x"); val y = c.getField("y"); val z = c.getField("z")
    val pr = sqrt(x * x + y * y)
    val theta = atan2(z * lit(el.a), pr * lit(b))
    val phi = atan2(z + lit(ep2 * b) * pow(sin(theta), 3),
      pr - lit(el.e2 * el.a) * pow(cos(theta), 3))
    struct(degrees(atan2(y, x)).as("x"), degrees(phi).as("y"))
  }
  private def affine3(m: Array[Double], t: Array[Double], c: Column): Column = {
    val x = c.getField("x"); val y = c.getField("y"); val z = c.getField("z")
    struct(
      (lit(t(0)) + lit(m(0)) * x + lit(m(1)) * y + lit(m(2)) * z).as("x"),
      (lit(t(1)) + lit(m(3)) * x + lit(m(4)) * y + lit(m(5)) * z).as("y"),
      (lit(t(2)) + lit(m(6)) * x + lit(m(7)) * y + lit(m(8)) * z).as("z"))
  }

  /** Bind `inner` to a lambda variable so `f` can reference it many
    * times WITHOUT duplicating its expression tree — Column-level
    * common-subexpression elimination via a 1-element higher-order
    * transform. Composed coordinate pipelines (projection ∘ Helmert ∘
    * geodetic↔XYZ) reference their stage inputs dozens of times each;
    * naive composition multiplies tree sizes per stage and OOMs the
    * analyzer, while a lambda variable keeps the whole pipeline
    * linear in the number of stages. */
  private def bindCol(inner: Column)(f: Column => Column): Column =
    element_at(transform(array(inner), f), 1)

  /** Wrap a projection pair with a datum shift. `h` maps the grid's
    * LOCAL datum geocentric frame to WGS84; `el` is the local
    * ellipsoid. fwd (4326 → grid) shifts WGS84 → local (exact inverse
    * Helmert) then projects; inv unprojects then shifts local → WGS84.
    * Every stage boundary is lambda-bound (see [[bindCol]]). */
  private def withDatum(el: Ellipsoid, h: Helmert,
      pr: (Column => Column, Column => Column))
      : (Column => Column, Column => Column) = {
    val fwd: Column => Column = p =>
      bindCol(geodeticToXyz(Wgs84, p)) { xyz =>
        bindCol(affine3(h.mInv, h.tInv, xyz)) { local =>
          bindCol(xyzToGeodetic(el, local))(pr._1)
        }
      }
    val inv: Column => Column = p =>
      bindCol(pr._2(p)) { g =>
        bindCol(geodeticToXyz(el, g)) { xyz =>
          bindCol(affine3(h.m, h.t, xyz))(c => xyzToGeodetic(Wgs84, c))
        }
      }
    (fwd, inv)
  }

  /** Register a transverse-Mercator grid ON A LEGACY DATUM:
    * `localToWgs84` is the published Bursa-Wolf set for the grid's
    * datum (e.g. [[Osgb36ToWgs84]]). */
  def registerTmOnDatum(epsg: Int, el: Ellipsoid, lat0Deg: Double,
      lon0Deg: Double, k0: Double, falseE: Double, falseN: Double,
      localToWgs84: Helmert): Unit = {
    val pr = TmParams(el, lat0Deg, lon0Deg, k0, falseE, falseN)
    crsRegistry.put(epsg, withDatum(el, localToWgs84, (pr.fwd, pr.inv))); ()
  }

  /** Register a GEOGRAPHIC (lon/lat) CRS on a legacy datum — the
    * projection is identity, the transform is the datum shift alone
    * (e.g. EPSG 4277, OSGB36 geographic). */
  def registerGeographicDatum(epsg: Int, el: Ellipsoid,
      localToWgs84: Helmert): Unit = {
    crsRegistry.put(epsg,
      withDatum(el, localToWgs84, (identity[Column] _, identity[Column] _)))
    ()
  }

  // ---- NTv2 grid-file datum shifts (round 10) -------------------------
  // Centimeter-grade datums publish a SHIFT GRID (NTv2 .gsb) instead of
  // one Bursa-Wolf set — NAD27→NAD83 and national refinements. The
  // parsed grid ([[Ntv2.Grid]]) is broadcast-scale (a few MB) and rides
  // in the UDF closure; the per-point bilinear interpolation + the
  // fixed-point inverse run scan-side on executors. Points OUTSIDE all
  // sub-grids map to null coordinates (visible, never silently
  // unshifted) — PROJ's strict mode errors there; null is this
  // engine's row-level typed-error convention for geo UDFs.

  /** fwd = 4326 → LOCAL (inverse grid shift), inv = LOCAL → 4326
    * (forward shift: the grid is published local→target). Any
    * [[ShiftGrid]] format plugs in here — NTv2 .gsb, NADCON .las/.los. */
  private def gridShiftPair(grid: ShiftGrid)
      : (Column => Column, Column => Column) = {
    val toLocal = udf((x: Double, y: Double) =>
      grid.inverse(x, y).map { case (lon, lat) => GridPt(lon, lat) })
    val toWgs = udf((x: Double, y: Double) =>
      grid.forward(x, y).map { case (lon, lat) => GridPt(lon, lat) })
    // the UDF's GridPt return IS the {x, y} point struct — no rebind
    def app(u: org.apache.spark.sql.expressions.UserDefinedFunction)
        : Column => Column = p => u(p.getField("x"), p.getField("y"))
    (app(toLocal), app(toWgs))
  }

  /** Register a GEOGRAPHIC CRS whose datum transformation is an NTv2
    * shift grid (e.g. EPSG 4267 NAD27 with the published NAD27→NAD83
    * grid). Grids for unregistered codes stay behind the MissingCRS
    * fence. */
  def registerNtv2GeographicDatum(epsg: Int, grid: Ntv2.Grid): Unit =
    registerGridShiftDatum(epsg, grid)

  /** Register a GEOGRAPHIC CRS whose datum transformation is ANY
    * shift grid — the format-agnostic entry point ([[Ntv2.Grid]],
    * [[Nadcon.Grid]]). Grids for unregistered codes stay behind the
    * MissingCRS fence. */
  def registerGridShiftDatum(epsg: Int, grid: ShiftGrid): Unit = {
    crsRegistry.put(epsg, gridShiftPair(grid)); ()
  }

  // ---- GTX vertical datums (round 11) ---------------------------------

  /** Geoid undulation N (meters) from a GTX grid as a column function:
    * `geoidUndulation(grid)(lon, lat)` — null outside coverage or when
    * the blend touches a NODATA node (the engine's visible row-level
    * policy, like the horizontal shifts). The grid rides in the UDF
    * closure — broadcast-scale, scan-side. */
  def geoidUndulation(grid: Gtx.Grid): (Column, Column) => Column = {
    val u = udf((lon: Double, lat: Double) => grid.undulation(lon, lat))
    (lon: Column, lat: Column) => u(lon, lat)
  }

  /** Orthometric → ellipsoidal height: h = H + N (null propagates from
    * out-of-coverage / NODATA undulations). */
  def toEllipsoidalHeight(grid: Gtx.Grid)(
      h: Column, lon: Column, lat: Column): Column =
    h + geoidUndulation(grid)(lon, lat)

  /** Ellipsoidal → orthometric height: H = h − N. */
  def toOrthometricHeight(grid: Gtx.Grid)(
      h: Column, lon: Column, lat: Column): Column =
    h - geoidUndulation(grid)(lon, lat)

  /** Register a PROJECTED transverse-Mercator CRS on a grid-shifted
    * datum (NTv2 or NADCON): unproject on the local ellipsoid, then
    * grid-shift to WGS84 (and the exact reverse going in). */
  def registerTmOnNtv2Datum(epsg: Int, el: Ellipsoid, lat0Deg: Double,
      lon0Deg: Double, k0: Double, falseE: Double, falseN: Double,
      grid: ShiftGrid): Unit = {
    val pr = TmParams(el, lat0Deg, lon0Deg, k0, falseE, falseN)
    val (toLocal, toWgs) = gridShiftPair(grid)
    val fwd: Column => Column = p => bindCol(toLocal(p))(pr.fwd)
    val inv: Column => Column = p => bindCol(pr.inv(p))(toWgs)
    crsRegistry.put(epsg, (fwd, inv)); ()
  }

  // built-in continental grids beyond the legacy 2154/3035 pair
  // (parameters: EPSG registry, public). Round 8: 27700 now applies the
  // published OSGB36↔WGS84 Bursa-Wolf shift through geocentric XYZ
  // (formerly geometric-only — VERDICT r7 missing #2); 4277 is the
  // OSGB36 geographic CRS (datum shift alone, no projection).
  registerLcc2sp(3034, Grs80, 35.0, 65.0, 52.0, 10.0, 4000000.0, 2800000.0)
  registerAlbers(5070, Grs80, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0)
  registerTmOnDatum(27700, Airy1830, 49.0, -2.0, 0.9996012717,
    400000.0, -100000.0, Osgb36ToWgs84)
  registerGeographicDatum(4277, Airy1830, Osgb36ToWgs84)
  // polar science grids (WGS84): NSIDC Sea Ice north, Antarctic south
  registerPolarStereo(3413, Wgs84, 70.0, -45.0, 0.0, 0.0, north = true)
  registerPolarStereo(3031, Wgs84, -71.0, 0.0, 0.0, 0.0, north = false)

  /** Per-EPSG projection pair (forward from 4326, inverse to 4326);
    * None for unsupported codes. 4326 itself is the identity hub. */
  private def projection(epsg: Int): Option[(Column => Column, Column => Column)] =
    epsg match {
      case 4326 => Some((identity, identity))
      case 3857 => Some((mercFwd, mercInv))
      case 2154 => Some((lccFwd, lccInv))
      case 3035 => Some((laeaFwd, laeaInv))
      case e => utmZone(e).map { case (z, n) => (llToUtm(z, n), utmToLl(z, n)) }
        .orElse(Option(crsRegistry.get(epsg)))
    }

  /** st_transform; identity when from==to. Any supported pair composes
    * through 4326: spherical Mercator 3857, UTM 326xx/327xx,
    * Lambert-93 2154 (LCC), LAEA Europe 3035, LCC Europe 3034, CONUS
    * Albers 5070, OSGB 27700 + 4277 (with the published OSGB36↔WGS84
    * datum shift), plus any grid added via `registerLcc2sp`/
    * `registerAlbers`/`registerTm`/`registerTmOnDatum`/
    * `registerGeographicDatum`. Returns a transformed geometry struct.
    * (Reference `to_crs`, src/data_preprocessing.py:192-193, :218-220,
    * :257-259.) */
  def stTransform(g: Column, fromEpsg: Int, toEpsg: Int): Column = {
    def proj(e: Int) = projection(e).getOrElse(
      throw graft.core.MissingCRS(
        s"transform $fromEpsg -> $toEpsg unsupported (4326, 3857, 2154, " +
          "3035, 3034, 5070, 27700, 4277, UTM 326xx/327xx, registered " +
          "grids and compositions among them only)"))
    val tx: Column => Column =
      if (fromEpsg == toEpsg) identity
      else {
        val (_, toLl) = proj(fromEpsg)
        val (fromLl, _) = proj(toEpsg)
        // lambda-bind the hub coordinate: the target projection
        // references its input dozens of times, and without the bind
        // the source projection's tree is duplicated per reference
        p => bindCol(toLl(p))(fromLl)
      }
    struct(stKind(g).as("kind"), transform(pts(g), p => tx(p)).as("points"))
  }

  // ---- S5: GeoJSON / WKT rendering (pure column expressions) ----

  private def num(c: Column): Column = c.cast("string")

  /** GeoJSON fragment for a geometry struct: Point → coordinates pair,
    * LineString → open coordinate list, Polygon → one closed ring
    * (first vertex repeated). */
  def stAsGeoJson(g: Column): Column = {
    val p = pts(g)
    val pair = (q: Column) =>
      concat(lit("["), num(q.getField("x")), lit(","), num(q.getField("y")), lit("]"))
    val ringPts = concat(transform(p, pair), array(pair(element_at(p, 1))))
    when(stIsEmpty(g), lit(null).cast("string"))
      .when(stKind(g) === "point",
        concat(lit("""{"type":"Point","coordinates":"""), pair(element_at(p, 1)), lit("}")))
      .when(stKind(g) === "linestring",
        concat(lit("""{"type":"LineString","coordinates":["""),
          array_join(transform(p, pair), ","), lit("]}")))
      .otherwise(concat(lit("""{"type":"Polygon","coordinates":[["""),
        array_join(ringPts, ","), lit("]]}")))
  }

  /** WKT rendering: POINT (x y) / LINESTRING (x y, …) /
    * POLYGON ((x y, x y, …)) with the ring closed. */
  def stAsText(g: Column): Column = {
    val p = pts(g)
    val pair = (q: Column) =>
      concat(num(q.getField("x")), lit(" "), num(q.getField("y")))
    val ringPts = concat(transform(p, pair), array(pair(element_at(p, 1))))
    when(stIsEmpty(g), lit(null).cast("string"))
      .when(stKind(g) === "point",
        concat(lit("POINT ("), pair(element_at(p, 1)), lit(")")))
      .when(stKind(g) === "linestring",
        concat(lit("LINESTRING ("), array_join(transform(p, pair), ", "), lit(")")))
      .otherwise(concat(lit("POLYGON (("), array_join(ringPts, ", "), lit("))")))
  }

  // ---- Douglas-Peucker simplification + convex hull kernels ----

  /** Recursive Douglas-Peucker over an OPEN point path: keep the
    * endpoints; split at the farthest interior vertex while it
    * exceeds eps. Deterministic: the FIRST farthest vertex wins
    * (strict >), so equal-distance ties resolve by position. */
  private def douglasPeucker(pts: IndexedSeq[P], eps: Double): IndexedSeq[P] = {
    if (pts.length < 3) pts
    else {
      val (a, b) = (pts.head, pts.last)
      var maxD = -1.0; var idx = -1
      var i = 1
      while (i < pts.length - 1) {
        val d = segDist(pts(i), a, b)
        if (d > maxD) { maxD = d; idx = i }
        i += 1
      }
      if (maxD <= eps) IndexedSeq(a, b)
      else douglasPeucker(pts.take(idx + 1), eps) ++
        douglasPeucker(pts.drop(idx), eps).tail
    }
  }

  /** F9 — shapely-style `simplify(eps)` (Douglas-Peucker): points are
    * identity; linestrings simplify the open path (endpoints kept);
    * polygons simplify the CLOSED ring (anchored at the first vertex)
    * and fall back to the ORIGINAL ring if fewer than 3 vertices
    * survive (a degenerate simplification must not produce an invalid
    * polygon). Null geometry → null. */
  private[geo] def simplifyRow(g: Row, eps: Double): Row = {
    val kind = g.getString(0)
    val ps = rowPts(g)
    def asRows(q: IndexedSeq[P]) = q.map(p => Row(p.x, p.y))
    kind match {
      case "point" => g
      case "linestring" =>
        Row("linestring", asRows(douglasPeucker(ps, eps)))
      case _ =>
        if (ps.length < 3) g
        else {
          val closed = ps :+ ps.head
          val simp = douglasPeucker(closed, eps).dropRight(1)
          if (simp.length < 3) g else Row("polygon", asRows(simp))
        }
    }
  }

  val stSimplify: (Column, Column) => Column = {
    val f = new org.apache.spark.sql.api.java.UDF2[Row, java.lang.Double, Row] {
      override def call(g: Row, eps: java.lang.Double): Row =
        if (g == null) null else simplifyRow(g, eps)
    }
    (g, eps) => udf(f, geometryType).apply(g, eps)
  }

  /** F9 — convex hull via Andrew's monotone chain (public algorithm):
    * hull vertices in counter-clockwise order starting from the
    * lexicographically smallest point. Degenerate inputs degrade by
    * kind — 1 distinct point → point, 2 (or collinear) → linestring
    * of the extreme pair, else polygon. Null geometry → null. */
  private[geo] def convexHullRow(g: Row): Row = {
    val ps = rowPts(g).distinct.sortBy(p => (p.x, p.y))
    def cross(o: P, a: P, b: P): Double =
      (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)
    def chain(src: IndexedSeq[P]): IndexedSeq[P] = {
      val h = scala.collection.mutable.ArrayBuffer.empty[P]
      src.foreach { p =>
        while (h.length >= 2 && cross(h(h.length - 2), h.last, p) <= 0)
          h.remove(h.length - 1)
        h += p
      }
      h.toIndexedSeq
    }
    def asRows(q: IndexedSeq[P]) = q.map(p => Row(p.x, p.y))
    if (ps.isEmpty) Row("polygon", Seq.empty[Row])
    else if (ps.length == 1) Row("point", asRows(ps))
    else {
      val hull = chain(ps).dropRight(1) ++ chain(ps.reverse).dropRight(1)
      if (hull.length <= 2)
        Row("linestring", asRows(IndexedSeq(ps.head, ps.last)))
      else Row("polygon", asRows(hull))
    }
  }

  val stConvexHull: Column => Column = {
    val f = new org.apache.spark.sql.api.java.UDF1[Row, Row] {
      override def call(g: Row): Row =
        if (g == null) null else convexHullRow(g)
    }
    g => udf(f, geometryType).apply(g)
  }

  /** Register the st_* surface for spark.sql() use: UDF-backed functions
    * through the UDF registry, the native Haversine expression through
    * the function registry (full codegen in SQL too). The
    * [[graft.GraftExtensions]] class does the same through
    * `SparkSessionExtensions` for --conf spark.sql.extensions wiring. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("st_distance", stDistance)
    spark.udf.register("st_intersects", stIntersects)
    spark.udf.register("st_simplify",
      new org.apache.spark.sql.api.java.UDF2[Row, java.lang.Double, Row] {
        override def call(g: Row, eps: java.lang.Double): Row =
          if (g == null) null
          else simplifyRow(g, eps)
      }, geometryType)
    spark.udf.register("st_convexhull",
      new org.apache.spark.sql.api.java.UDF1[Row, Row] {
        override def call(g: Row): Row =
          if (g == null) null else convexHullRow(g)
      }, geometryType)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "st_haversine",
      exprs => Haversine.cast(exprs),
      "scala_udf")
  }
}
