package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.geo.Geo
import graft.ops.{SpatialOps, VectorOps}

class GeoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def poly(pts: (Double, Double)*): Row =
    Row("polygon", pts.map { case (x, y) => Row(x, y) })
  private def point(x: Double, y: Double): Row = Row("point", Seq(Row(x, y)))

  private def geomDf(gs: Row*) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("geometry", Geo.geometryType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(gs.map(Row(_))), schema)
  }

  test("F9: area — unit square = 1, point = 0") {
    val df = geomDf(poly((0, 0), (1, 0), (1, 1), (0, 1)), point(3, 4))
    val areas = df.select(Geo.stArea(col("geometry"))).as[Double].collect()
    assert(areas.toSeq == Seq(1.0, 0.0))
  }

  test("F9: centroid — square centroid, L-shape area-weighted (shapely semantics)") {
    val df = geomDf(poly((0, 0), (2, 0), (2, 2), (0, 2)))
    val c = df.select(Geo.stX(Geo.stCentroid(col("geometry"))),
      Geo.stY(Geo.stCentroid(col("geometry")))).head
    assert(c.getDouble(0) == 1.0 && c.getDouble(1) == 1.0)
    // L-shape: 3 unit squares; area centroid != vertex mean
    val l = geomDf(poly((0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)))
    val lc = l.select(Geo.stX(Geo.stCentroid(col("geometry"))),
      Geo.stY(Geo.stCentroid(col("geometry")))).head
    // decomposition: [0,2]×[0,1] (area 2, c=(1,.5)) + [0,1]×[1,2] (area 1,
    // c=(.5,1.5)) → centroid (2·1+1·.5)/3 = (2·.5+1·1.5)/3 = 5/6
    assert(math.abs(lc.getDouble(0) - 5.0 / 6) < 1e-12)
    assert(math.abs(lc.getDouble(1) - 5.0 / 6) < 1e-12)
  }

  test("F9: bounds") {
    val df = geomDf(poly((1, 2), (5, 2), (5, 7), (1, 7)))
    val b = df.select(Geo.stBounds(col("geometry"))).head.getStruct(0)
    assert((b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3)) == (1.0, 2.0, 5.0, 7.0))
  }

  test("P7: isEmpty / isValid") {
    val df = geomDf(
      Row("polygon", Seq.empty[Row]),                      // empty
      poly((0, 0), (1, 0)),                                // < 3 pts: invalid
      poly((0, 0), (1, 1), (2, 2)),                        // zero area: invalid
      poly((0, 0), (1, 0), (0, 1)),                        // valid
      point(1, 1))                                         // valid
    val flags = df.select(Geo.stIsEmpty(col("geometry")), Geo.stIsValid(col("geometry"))).collect()
    assert(flags.map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq ==
      Seq((true, false), (false, false), (false, false), (false, true), (false, true)))
  }

  test("F9: distance point-point, point-polygon (outside edge / inside)") {
    val df = geomDf(point(0, 0))
    val d1 = df.select(Geo.stDistance(col("geometry"),
      typedLit(null).cast(Geo.geometryType))).head // null geom → null
    assert(d1.isNullAt(0))
    val pairs = Seq(
      (point(0, 0), point(3, 4), 5.0),
      (point(2, 0.5), poly((0, 0), (1, 0), (1, 1), (0, 1)), 1.0), // right of unit square
      (point(0.5, 0.5), poly((0, 0), (1, 0), (1, 1), (0, 1)), 0.0)) // inside
    pairs.foreach { case (a, b, want) =>
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", Geo.geometryType),
        org.apache.spark.sql.types.StructField("b", Geo.geometryType)))
      val df2 = spark.createDataFrame(spark.sparkContext.parallelize(Seq(Row(a, b))), schema)
      val got = df2.select(Geo.stDistance(col("a"), col("b"))).head.getDouble(0)
      assert(math.abs(got - want) < 1e-12, s"distance $a $b: got $got want $want")
    }
  }

  test("P6: intersects — overlapping, disjoint, point-in-polygon, edge-touching") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", Geo.geometryType),
      org.apache.spark.sql.types.StructField("b", Geo.geometryType)))
    val cases = Seq(
      (poly((0, 0), (2, 0), (2, 2), (0, 2)), poly((1, 1), (3, 1), (3, 3), (1, 3)), true),
      (poly((0, 0), (1, 0), (1, 1), (0, 1)), poly((5, 5), (6, 5), (6, 6), (5, 6)), false),
      (point(1, 1), poly((0, 0), (2, 0), (2, 2), (0, 2)), true),
      (point(5, 5), poly((0, 0), (2, 0), (2, 2), (0, 2)), false),
      // containment without edge crossing (small inside big)
      (poly((0.4, 0.4), (0.6, 0.4), (0.6, 0.6), (0.4, 0.6)),
        poly((0, 0), (1, 0), (1, 1), (0, 1)), true))
    cases.foreach { case (a, b, want) =>
      val df2 = spark.createDataFrame(spark.sparkContext.parallelize(Seq(Row(a, b))), schema)
      assert(df2.select(Geo.stIntersects(col("a"), col("b"))).head.getBoolean(0) == want,
        s"intersects($a, $b) should be $want")
    }
  }

  test("F9: buffer — 64-gon at resolution 16, area converges to circle") {
    val df = geomDf(point(10, 20))
    val buf = df.select(Geo.stBuffer(col("geometry"), lit(2.0), lit(16)).as("b"))
    val n = buf.select(size(col("b").getField("points"))).head.getInt(0)
    assert(n == 64)
    val area = buf.select(Geo.stArea(col("b"))).head.getDouble(0)
    assert(math.abs(area - math.Pi * 4) / (math.Pi * 4) < 0.01) // 64-gon ≈ circle within 1%
  }

  test("F10: transform 4326 <-> 3857 round-trips and hits known pairs") {
    val df = geomDf(point(2.3522, 48.8566)) // Paris lon/lat
    val merc = df.select(Geo.stTransform(col("geometry"), 4326, 3857).as("g"))
    val m = merc.select(Geo.stX(col("g")), Geo.stY(col("g"))).head
    assert(math.abs(m.getDouble(0) - 261845.706) < 0.01) // known Web-Mercator x
    assert(math.abs(m.getDouble(1) - 6250564.350) < 0.01)
    val back = merc.select(Geo.stTransform(col("g"), 3857, 4326).as("g2"))
      .select(Geo.stX(col("g2")), Geo.stY(col("g2"))).head
    assert(math.abs(back.getDouble(0) - 2.3522) < 1e-9)
    assert(math.abs(back.getDouble(1) - 48.8566) < 1e-9)
  }

  test("F10: transform 4326 <-> UTM hits surveyed pairs in 3 zones, both hemispheres") {
    // surveyed anchors (WGS84): CN Tower (17N), Eiffel Tower (31N),
    // Sydney Opera House area (56S) — easting/northing to the meter
    val cases = Seq(
      (-79.387139, 43.642567, 32617, 630084.30, 4833438.59),
      (2.2945, 48.858222, 32631, 448251.82, 5411935.12),
      (151.215297, -33.856159, 32756, 334899.06, 6252359.83))
    cases.foreach { case (lon, lat, epsg, e, n) =>
      val utm = geomDf(point(lon, lat))
        .select(Geo.stTransform(col("geometry"), 4326, epsg).as("g"))
      val r = utm.select(Geo.stX(col("g")), Geo.stY(col("g"))).head
      assert(math.abs(r.getDouble(0) - e) < 1.0, s"easting zone $epsg")
      assert(math.abs(r.getDouble(1) - n) < 1.0, s"northing zone $epsg")
      val back = utm.select(Geo.stTransform(col("g"), epsg, 4326).as("g2"))
        .select(Geo.stX(col("g2")), Geo.stY(col("g2"))).head
      assert(math.abs(back.getDouble(0) - lon) < 1e-8, s"round-trip lon zone $epsg")
      assert(math.abs(back.getDouble(1) - lat) < 1e-8, s"round-trip lat zone $epsg")
    }
  }

  test("F10: Lambert-93 (2154) — exact false origin, round-trip, conformal distance") {
    // the projection ORIGIN maps to the false origin exactly, by
    // definition of the parameters — no surveyed anchor needed
    val origin = geomDf(point(3.0, 46.5))
      .select(Geo.stTransform(col("geometry"), 4326, 2154).as("g"))
      .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
    assert(math.abs(origin.getDouble(0) - 700000.0) < 1e-4)
    assert(math.abs(origin.getDouble(1) - 6600000.0) < 1e-4)
    // round-trip across France
    Seq((2.3522, 48.8566), (4.8357, 45.7640), (-1.5536, 47.2184), (7.75, 48.58))
      .foreach { case (lon, lat) =>
        val back = geomDf(point(lon, lat))
          .select(Geo.stTransform(
            Geo.stTransform(col("geometry"), 4326, 2154), 2154, 4326).as("g"))
          .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
        assert(math.abs(back.getDouble(0) - lon) < 1e-8, s"lon $lon")
        assert(math.abs(back.getDouble(1) - lat) < 1e-8, s"lat $lat")
      }
    // conformal, low distortion inside the parallels: projected
    // Paris–Lyon Euclidean distance matches haversine within 0.2%
    val two = geomDf(point(2.3522, 48.8566), point(4.8357, 45.7640))
      .select(Geo.stTransform(col("geometry"), 4326, 2154).as("g"))
      .select(Geo.stX(col("g")).as("x"), Geo.stY(col("g")).as("y")).collect()
    val dx = two(0).getDouble(0) - two(1).getDouble(0)
    val dy = two(0).getDouble(1) - two(1).getDouble(1)
    val planar = math.sqrt(dx * dx + dy * dy)
    val gc = { // haversine, sphere R=6371km (good to ~0.2%)
      val (l1, p1, l2, p2) = (math.toRadians(2.3522), math.toRadians(48.8566),
        math.toRadians(4.8357), math.toRadians(45.7640))
      val h = math.pow(math.sin((p2 - p1) / 2), 2) +
        math.cos(p1) * math.cos(p2) * math.pow(math.sin((l2 - l1) / 2), 2)
      2 * 6371000.0 * math.asin(math.sqrt(h))
    }
    assert(math.abs(planar - gc) / gc < 0.002, s"planar $planar vs gc $gc")
  }

  test("F10: LAEA Europe (3035) — exact false origin, round-trip, equal-area") {
    val origin = geomDf(point(10.0, 52.0))
      .select(Geo.stTransform(col("geometry"), 4326, 3035).as("g"))
      .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
    assert(math.abs(origin.getDouble(0) - 4321000.0) < 1e-4)
    assert(math.abs(origin.getDouble(1) - 3210000.0) < 1e-4)
    // round-trip across Europe (Lisbon, Helsinki, Athens, Reykjavik)
    Seq((-9.14, 38.72), (24.94, 60.17), (23.73, 37.98), (-21.94, 64.15))
      .foreach { case (lon, lat) =>
        val back = geomDf(point(lon, lat))
          .select(Geo.stTransform(
            Geo.stTransform(col("geometry"), 4326, 3035), 3035, 4326).as("g"))
          .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
        assert(math.abs(back.getDouble(0) - lon) < 1e-7, s"lon $lon")
        assert(math.abs(back.getDouble(1) - lat) < 1e-7, s"lat $lat")
      }
    // equal-area: a 1°x1° quad far from the center keeps the same area
    // as at the center (authalic property), within numerical tolerance.
    def quadArea(lon: Double, lat: Double): Double = {
      val corners = geomDf(point(lon, lat), point(lon + 1, lat),
        point(lon + 1, lat + 1), point(lon, lat + 1))
        .select(Geo.stTransform(col("geometry"), 4326, 3035).as("g"))
        .select(Geo.stX(col("g")).as("x"), Geo.stY(col("g")).as("y")).collect()
        .map(r => (r.getDouble(0), r.getDouble(1)))
      // shoelace over the projected quad
      math.abs((0 until 4).map { i =>
        val (x1, y1) = corners(i); val (x2, y2) = corners((i + 1) % 4)
        x1 * y2 - x2 * y1
      }.sum / 2)
    }
    // same latitude band, different longitudes: areas equal to ~1e-6
    val a1 = quadArea(10.0, 50.0); val a2 = quadArea(-8.0, 50.0)
    assert(math.abs(a1 - a2) / a1 < 1e-6, s"$a1 vs $a2")
  }

  test("F10: LCC Europe (3034) — exact false origin, round-trip, conformal distance") {
    val origin = geomDf(point(10.0, 52.0))
      .select(Geo.stTransform(col("geometry"), 4326, 3034).as("g"))
      .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
    assert(math.abs(origin.getDouble(0) - 4000000.0) < 1e-4)
    assert(math.abs(origin.getDouble(1) - 2800000.0) < 1e-4)
    Seq((-9.14, 38.72), (24.94, 60.17), (2.3522, 48.8566), (18.07, 59.33))
      .foreach { case (lon, lat) =>
        val back = geomDf(point(lon, lat))
          .select(Geo.stTransform(
            Geo.stTransform(col("geometry"), 4326, 3034), 3034, 4326).as("g"))
          .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
        assert(math.abs(back.getDouble(0) - lon) < 1e-8, s"lon $lon")
        assert(math.abs(back.getDouble(1) - lat) < 1e-8, s"lat $lat")
      }
    // conic scale law: EXACTLY 1 on a standard parallel, < 1 between
    // them (parallels 35/65 are 30 deg apart, so the mid-grid dip is a
    // few percent — that is the projection, not an error). A 0.1 deg
    // east-west step at lat 65 must match the ellipsoidal parallel arc
    // a*cos(phi)/sqrt(1-e2 sin^2 phi)*dLam to ~1e-6 relative.
    def ewPlanar(lat: Double): Double = {
      val two = geomDf(point(10.0, lat), point(10.1, lat))
        .select(Geo.stTransform(col("geometry"), 4326, 3034).as("g"))
        .select(Geo.stX(col("g")).as("x"), Geo.stY(col("g")).as("y")).collect()
      val dx = two(0).getDouble(0) - two(1).getDouble(0)
      val dy = two(0).getDouble(1) - two(1).getDouble(1)
      math.sqrt(dx * dx + dy * dy)
    }
    def parallelArc(lat: Double): Double = {
      val el = Geo.Grs80; val phi = math.toRadians(lat)
      el.a * math.cos(phi) / math.sqrt(1 - el.e2 * math.sin(phi) * math.sin(phi)) *
        math.toRadians(0.1)
    }
    assert(math.abs(ewPlanar(65.0) - parallelArc(65.0)) / parallelArc(65.0) < 1e-6)
    assert(math.abs(ewPlanar(35.0) - parallelArc(35.0)) / parallelArc(35.0) < 1e-6)
    assert(ewPlanar(50.0) < parallelArc(50.0)) // k < 1 between parallels
  }

  test("F10: CONUS Albers (5070) — exact origin, round-trip, equal-area") {
    val origin = geomDf(point(-96.0, 23.0))
      .select(Geo.stTransform(col("geometry"), 4326, 5070).as("g"))
      .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
    assert(math.abs(origin.getDouble(0)) < 1e-4)
    assert(math.abs(origin.getDouble(1)) < 1e-4)
    // round-trip across CONUS (Seattle, Miami, Boston, San Diego)
    Seq((-122.33, 47.61), (-80.19, 25.76), (-71.06, 42.36), (-117.16, 32.72))
      .foreach { case (lon, lat) =>
        val back = geomDf(point(lon, lat))
          .select(Geo.stTransform(
            Geo.stTransform(col("geometry"), 4326, 5070), 5070, 4326).as("g"))
          .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
        assert(math.abs(back.getDouble(0) - lon) < 1e-7, s"lon $lon")
        assert(math.abs(back.getDouble(1) - lat) < 1e-7, s"lat $lat")
      }
    // equal-area: same-latitude 1°x1° quads at different longitudes
    // project to equal areas (authalic property)
    def quadArea(lon: Double, lat: Double): Double = {
      val corners = geomDf(point(lon, lat), point(lon + 1, lat),
        point(lon + 1, lat + 1), point(lon, lat + 1))
        .select(Geo.stTransform(col("geometry"), 4326, 5070).as("g"))
        .select(Geo.stX(col("g")).as("x"), Geo.stY(col("g")).as("y")).collect()
        .map(r => (r.getDouble(0), r.getDouble(1)))
      math.abs((0 until 4).map { i =>
        val (x1, y1) = corners(i); val (x2, y2) = corners((i + 1) % 4)
        x1 * y2 - x2 * y1
      }.sum / 2)
    }
    val a1 = quadArea(-100.0, 40.0); val a2 = quadArea(-80.0, 40.0)
    assert(math.abs(a1 - a2) / a1 < 1e-6, s"$a1 vs $a2")
  }

  test("F10: OSGB (27700, datum-shifted) — false origin, round-trip, k0 scale") {
    // the OSGB36 true origin (2°W, 49°N IN OSGB36 COORDS, i.e. EPSG
    // 4277) maps to the false origin (400000, -100000): going 4277 →
    // 4326 → 27700, the Helmert forward and exact inverse cancel and
    // the pure Airy TM remains
    val origin = geomDf(point(-2.0, 49.0))
      .select(Geo.stTransform(col("geometry"), 4277, 27700).as("g"))
      .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
    assert(math.abs(origin.getDouble(0) - 400000.0) < 1e-3)
    assert(math.abs(origin.getDouble(1) - (-100000.0)) < 1e-3)
    // WGS84 round-trip across Britain THROUGH the datum shift. The
    // Helmert inverse is algebraically exact; the residual is the 2D
    // engine re-flattening h to 0 between the two legs (the shifted
    // point sits ~50 m off the other ellipsoid, and scale+rotation
    // couple that height into ~1.5 mm horizontal). 5e-8 deg ≈ 6 mm.
    Seq((-0.1276, 51.5072), (-3.1883, 55.9533), (-4.2518, 55.8642))
      .foreach { case (lon, lat) =>
        val back = geomDf(point(lon, lat))
          .select(Geo.stTransform(
            Geo.stTransform(col("geometry"), 4326, 27700), 27700, 4326).as("g"))
          .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
        assert(math.abs(back.getDouble(0) - lon) < 5e-8, s"lon $lon")
        assert(math.abs(back.getDouble(1) - lat) < 5e-8, s"lat $lat")
      }
    // central-meridian scale: northing difference over 1° of OSGB36
    // latitude at lon 2°W equals k0 x the meridian arc (±0.01%) —
    // driven from 4277 so the check stays pure Airy TM
    val pts = geomDf(point(-2.0, 52.0), point(-2.0, 53.0))
      .select(Geo.stTransform(col("geometry"), 4277, 27700).as("g"))
      .select(Geo.stY(col("g")).as("n")).collect().map(_.getDouble(0))
    val dN = math.abs(pts(1) - pts(0))
    // meridian arc on Airy 1830 between 52 and 53 deg, same series
    val el = Geo.Airy1830
    def arc(phiDeg: Double): Double = {
      val e2 = el.e2; val phi = math.toRadians(phiDeg)
      val c0 = 1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * math.pow(e2, 3) / 256
      val c2 = 3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * math.pow(e2, 3) / 1024
      val c4 = 15 * e2 * e2 / 256 + 45 * math.pow(e2, 3) / 1024
      val c6 = 35 * math.pow(e2, 3) / 3072
      el.a * (c0 * phi - c2 * math.sin(2 * phi) + c4 * math.sin(4 * phi) -
        c6 * math.sin(6 * phi))
    }
    val expected = 0.9996012717 * (arc(53.0) - arc(52.0))
    assert(math.abs(dN - expected) / expected < 1e-4, s"$dN vs $expected")
  }

  test("F10: OSGB36 datum shift (4277) — direction, magnitude, exact inverse") {
    // Greenwich: the OSGB36 zero meridian lies ~5.3 arcsec EAST of the
    // WGS84 zero meridian at the observatory's latitude, so OSGB36
    // (0°, 51.4773°) must land at WGS84 longitude ≈ −0.0015°
    // (~102 m west). Loose bounds — the single-set Bursa-Wolf fit is
    // itself only ~2 m — but direction and magnitude pin the shift.
    val gw = geomDf(point(0.0, 51.4773))
      .select(Geo.stTransform(col("geometry"), 4277, 4326).as("g"))
      .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
    assert(gw.getDouble(0) > -0.0020 && gw.getDouble(0) < -0.0010,
      s"lon ${gw.getDouble(0)}")
    assert(math.abs(gw.getDouble(1) - 51.4773) < 0.002,
      s"lat ${gw.getDouble(1)}")
    // total horizontal shift magnitude across Britain: 50–180 m
    Seq((0.0, 51.4773), (-3.0, 55.9), (-5.0, 50.2)).foreach { case (lon, lat) =>
      val r = geomDf(point(lon, lat))
        .select(Geo.stTransform(col("geometry"), 4277, 4326).as("g"))
        .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
      val dLonM = (r.getDouble(0) - lon) * 111320.0 * math.cos(math.toRadians(lat))
      val dLatM = (r.getDouble(1) - lat) * 110574.0
      val shift = math.hypot(dLonM, dLatM)
      assert(shift > 50 && shift < 180, s"shift ${shift}m at ($lon,$lat)")
    }
    // exact-inverse Helmert: 4326 -> 4277 -> 4326 residual is only the
    // h=0 re-flattening between legs (~1.5 mm; see the 27700 test)
    val back = geomDf(point(-1.5, 53.0))
      .select(Geo.stTransform(
        Geo.stTransform(col("geometry"), 4326, 4277), 4277, 4326).as("g"))
      .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
    assert(math.abs(back.getDouble(0) - (-1.5)) < 5e-8)
    assert(math.abs(back.getDouble(1) - 53.0) < 5e-8)
    // zero-parameter Helmert = identity (ellipsoid conversion only):
    // registering a WGS84-"datum" geographic CRS must be a no-op
    Geo.registerGeographicDatum(904326, Geo.Wgs84,
      Geo.Helmert(0, 0, 0, 0, 0, 0, 0))
    val id = geomDf(point(12.5, 41.9))
      .select(Geo.stTransform(col("geometry"), 904326, 4326).as("g"))
      .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
    assert(math.abs(id.getDouble(0) - 12.5) < 1e-9)
    assert(math.abs(id.getDouble(1) - 41.9) < 1e-9)
  }

  test("F10: user-registered LCC grid (Belgian Lambert 2008) round-trips") {
    // EPSG 3812 parameters (public registry data): any national
    // conformal grid is one registration away — the F10 scope answer
    Geo.registerLcc2sp(3812, Geo.Grs80, 49.833333333333336, 51.166666666666664,
      50.797815, 4.359215833333333, 649328.0, 665262.0)
    val origin = geomDf(point(4.359215833333333, 50.797815))
      .select(Geo.stTransform(col("geometry"), 4326, 3812).as("g"))
      .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
    assert(math.abs(origin.getDouble(0) - 649328.0) < 1e-4)
    assert(math.abs(origin.getDouble(1) - 665262.0) < 1e-4)
    Seq((4.3517, 50.8466), (3.7174, 51.0543), (5.5797, 50.6326))
      .foreach { case (lon, lat) =>
        val back = geomDf(point(lon, lat))
          .select(Geo.stTransform(
            Geo.stTransform(col("geometry"), 4326, 3812), 3812, 4326).as("g"))
          .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
        assert(math.abs(back.getDouble(0) - lon) < 1e-8, s"lon $lon")
        assert(math.abs(back.getDouble(1) - lat) < 1e-8, s"lat $lat")
      }
    // composes with every other CRS through the 4326 hub
    val viaUtm = geomDf(point(4.3517, 50.8466))
      .select(Geo.stTransform(
        Geo.stTransform(col("geometry"), 4326, 3812), 3812, 32631).as("g"))
      .select(Geo.stX(col("g"))).head.getDouble(0)
    val direct = geomDf(point(4.3517, 50.8466))
      .select(Geo.stTransform(col("geometry"), 4326, 32631).as("g"))
      .select(Geo.stX(col("g"))).head.getDouble(0)
    assert(math.abs(viaUtm - direct) < 1e-4)
  }

  test("F10: UTM invariants — central meridian at 500km false easting, equator at N=0") {
    val df = geomDf(point(-81.0, 43.0), point(-81.0, 0.0)) // zone 17 central meridian
    val out = df.select(Geo.stTransform(col("geometry"), 4326, 32617).as("g"))
      .select(Geo.stX(col("g")).as("e"), Geo.stY(col("g")).as("n")).collect()
    out.foreach(r => assert(math.abs(r.getDouble(0) - 500000.0) < 1e-6))
    assert(math.abs(out.map(_.getDouble(1)).min - 0.0) < 1e-6)
    // south hemisphere: just below the equator sits just under the 10,000km false northing
    val s = geomDf(point(-81.0, -0.001))
      .select(Geo.stTransform(col("geometry"), 4326, 32717).as("g"))
      .select(Geo.stY(col("g"))).head.getDouble(0)
    assert(s < 1.0e7 && s > 1.0e7 - 200)
  }

  test("F10: 3857 <-> UTM composes through 4326 consistently") {
    val df = geomDf(point(2.2945, 48.858222))
    val direct = df.select(Geo.stTransform(col("geometry"), 4326, 32631).as("g"))
      .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
    val viaMerc = df.select(Geo.stTransform(
        Geo.stTransform(col("geometry"), 4326, 3857), 3857, 32631).as("g"))
      .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
    assert(math.abs(direct.getDouble(0) - viaMerc.getDouble(0)) < 1e-6)
    assert(math.abs(direct.getDouble(1) - viaMerc.getDouble(1)) < 1e-6)
    val backToMerc = df.select(Geo.stTransform(
        Geo.stTransform(col("geometry"), 4326, 32631), 32631, 3857).as("g"))
      .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
    val merc = df.select(Geo.stTransform(col("geometry"), 4326, 3857).as("g"))
      .select(Geo.stX(col("g")), Geo.stY(col("g"))).head
    // sub-cm: inverse-TM series truncation dominates
    assert(math.abs(backToMerc.getDouble(0) - merc.getDouble(0)) < 1e-2)
    assert(math.abs(backToMerc.getDouble(1) - merc.getDouble(1)) < 1e-2)
  }

  test("F10: UTM re-zoning (17N -> 18N) round-trips through the zone boundary") {
    val (lon, lat) = (-78.2, 41.0) // near the 17/18 boundary at 78W
    val rezoned = geomDf(point(lon, lat))
      .select(Geo.stTransform(
        Geo.stTransform(col("geometry"), 4326, 32617), 32617, 32618).as("g"))
    val back = rezoned.select(Geo.stTransform(col("g"), 32618, 4326).as("b"))
      .select(Geo.stX(col("b")), Geo.stY(col("b"))).head
    assert(math.abs(back.getDouble(0) - lon) < 1e-7)
    assert(math.abs(back.getDouble(1) - lat) < 1e-7)
  }

  test("S1: cleanGeometries drops empty+invalid with counts") {
    val df = geomDf(
      Row("polygon", Seq.empty[Row]),
      poly((0, 0), (1, 1), (2, 2)),
      poly((0, 0), (1, 0), (0, 1)))
    val (clean, nEmpty, nInvalid) = VectorOps.cleanGeometries(df)
    assert(clean.count() == 1 && nEmpty == 1 && nInvalid == 1)
  }

  test("A2 geometry flagship: circle-buffer agg equals x/y kernel on point features") {
    // sensors and features as points: geometry path must equal SpatialOps path
    val sensors = (1 to 20).map(i =>
      (i.toLong, point((i * 7 % 50).toDouble, (i * 13 % 50).toDouble)))
    val features = (1 to 200).map(j =>
      (j.toLong, point((j * 3 % 50).toDouble, (j * 11 % 50).toDouble), (j % 10) / 2.0))
    val sschema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id_sensor", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("geometry", Geo.geometryType)))
    val fschema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("feature_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("geometry", Geo.geometryType),
      org.apache.spark.sql.types.StructField("height", org.apache.spark.sql.types.DoubleType)))
    val sdf = spark.createDataFrame(
      spark.sparkContext.parallelize(sensors.map { case (i, g) => Row(i, g) }), sschema)
    val fdf = spark.createDataFrame(
      spark.sparkContext.parallelize(features.map { case (j, g, h) => Row(j, g, h) }), fschema)

    val viaGeo = VectorOps.addBufferAggregatedData(
      sdf, fdf, radius = 8.0, funcs = Seq("mean", "count"),
      statCols = Seq("height"), sourceName = "b")
      .select(col("id_sensor"), col("mean_b_height"), col("count_b_height"))
      .orderBy("id_sensor").collect()

    val sXy = sdf.select(col("id_sensor"),
      Geo.stX(col("geometry")).as("x"), Geo.stY(col("geometry")).as("y"))
    val fXy = fdf.select(Geo.stX(col("geometry")).as("x"),
      Geo.stY(col("geometry")).as("y"), col("height"))
    val viaKernel = SpatialOps.bufferAggregate(sXy, fXy, 8.0,
      Seq("mean", "count"), Seq("height"), "b")
      .select(col("id_sensor"), col("mean_b_height"), col("count_b_height"))
      .orderBy("id_sensor").collect()

    assert(viaGeo.toSeq == viaKernel.toSeq)
  }

  test("A4 geometry kNN: k = |features| equals full aggregation (property)") {
    val sensors = (1 to 5).map(i => (i.toLong, point(i.toDouble, 0.0)))
    val features = (1 to 30).map(j => (j.toLong, point((j % 10).toDouble, 1.0), j.toDouble))
    val sschema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id_sensor", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("geometry", Geo.geometryType)))
    val fschema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("feature_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("geometry", Geo.geometryType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val sdf = spark.createDataFrame(
      spark.sparkContext.parallelize(sensors.map { case (i, g) => Row(i, g) }), sschema)
    val fdf = spark.createDataFrame(
      spark.sparkContext.parallelize(features.map { case (j, g, v) => Row(j, g, v) }), fschema)
    val knn = VectorOps.addKnnAggregatedData(sdf, fdf, k = 30,
      funcs = Seq("sum"), statCols = Seq("v"), featureId = "feature_id", sourceName = "f")
    val sums = knn.select("sum_f_v").as[Double].collect()
    assert(sums.forall(_ == (1 to 30).map(_.toDouble).sum))
  }

  test("F9: stSimplify — Douglas-Peucker keeps shape, collapses noise") {
    import graft.geo.Geo
    // zigzag with one big kink and tiny jitter: small eps keeps the
    // kink, removes jitter; huge eps collapses to the endpoints
    val line = Seq(Seq((0.0, 0.0), (1.0, 0.02), (2.0, 0.0), (3.0, 3.0),
      (4.0, 0.0), (5.0, 0.01), (6.0, 0.0)))
      .toDF("path")
      .select(Geo.stLineString(
        expr("transform(path, p -> struct(p._1 as x, p._2 as y))")).as("g"))
    def ptsOf(c: org.apache.spark.sql.Column) = line.select(c.as("s"))
      .selectExpr("transform(s.points, p -> array(p.x, p.y)) AS q", "s.kind AS k")
      .head()
    val fine = ptsOf(Geo.stSimplify(col("g"), lit(0.1)))
    val fineQ = fine.getSeq[scala.collection.Seq[Double]](0)
    assert(fine.getString(1) == "linestring")
    assert(fineQ.map(_(0)) == Seq(0.0, 2.0, 3.0, 4.0, 6.0),
      s"kink kept, jitter dropped: $fineQ")
    val coarse = ptsOf(Geo.stSimplify(col("g"), lit(10.0)))
    assert(coarse.getSeq[scala.collection.Seq[Double]](0).map(_(0)) ==
      Seq(0.0, 6.0))
    // polygon: a square with a tiny notch vertex loses the notch but
    // keeps ring validity; a point is identity
    val poly = Seq(Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (1.0, 2.01),
      (0.0, 2.0)))
      .toDF("ring")
      .select(Geo.stPolygon(
        expr("transform(ring, p -> struct(p._1 as x, p._2 as y))")).as("g"))
    val sp = poly.select(Geo.stSimplify(col("g"), lit(0.1)).as("s"))
      .selectExpr("size(s.points) AS n", "s.kind AS k").head()
    assert(sp.getString(1) == "polygon" && sp.getInt(0) == 4, s"notch gone: $sp")
  }

  test("F9: stConvexHull — monotone chain, degenerate kinds degrade") {
    import graft.geo.Geo
    // square corners + interior point -> 4-vertex CCW hull of area 4
    val df = Seq(Seq((0.0, 0.0), (2.0, 0.0), (1.0, 1.0), (2.0, 2.0), (0.0, 2.0)))
      .toDF("p")
      .select(Geo.stPolygon(
        expr("transform(p, q -> struct(q._1 as x, q._2 as y))")).as("g"))
    val hull = df.select(Geo.stConvexHull(col("g")).as("h"))
      .select(col("h.kind"), expr("size(h.points)").as("n"),
        graft.geo.Geo.stArea(col("h")).as("area")).head()
    assert(hull.getString(0) == "polygon" && hull.getInt(1) == 4
      && hull.getDouble(2) == 4.0, s"got $hull")
    // collinear points -> linestring of the extreme pair
    val co = Seq(Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0))).toDF("p")
      .select(Geo.stPolygon(
        expr("transform(p, q -> struct(q._1 as x, q._2 as y))")).as("g"))
    val ch = co.select(Geo.stConvexHull(col("g")).as("h"))
      .select(col("h.kind"), expr("transform(h.points, p -> array(p.x, p.y))"))
      .head()
    assert(ch.getString(0) == "linestring")
    assert(ch.getSeq[scala.collection.Seq[Double]](1).map(_(0)) == Seq(0.0, 2.0))
  }

  test("F10: polar stereographic grids (3413 north / 3031 south) — invariants") {
    import graft.geo.Geo
    def tx(lon: Double, lat: Double, from: Int, to: Int): (Double, Double) = {
      val r = Seq((lon, lat)).toDF("lon", "lat")
        .select(Geo.stTransform(Geo.stPoint(col("lon"), col("lat")), from, to).as("g"))
        .select(Geo.stX(col("g")), Geo.stY(col("g"))).head()
      (r.getDouble(0), r.getDouble(1))
    }
    // the pole maps to the false origin
    val (px, py) = tx(123.0, 90.0, 4326, 3413)
    assert(math.abs(px) < 1e-6 && math.abs(py) < 1e-6, s"pole -> ($px, $py)")
    // the center meridian maps onto x = 0 with y < 0 (grid south)
    val (cx, cy) = tx(-45.0, 70.0, 4326, 3413)
    assert(math.abs(cx) < 1e-6 && cy < 0, s"center meridian -> ($cx, $cy)")
    // at the standard parallel the radius is a*m_F (~2187.96 km)
    assert(cy > -2188500 && cy < -2187500, s"rho at lat_ts: $cy")
    // round trips (north and south) are identity to ~1e-6 degrees
    val (fx, fy) = tx(-30.0, 75.0, 4326, 3413)
    val (bx, by) = tx(fx, fy, 3413, 4326)
    assert(math.abs(bx - -30.0) < 1e-6 && math.abs(by - 75.0) < 1e-6,
      s"north round trip: ($bx, $by)")
    val (sx, sy) = tx(120.0, -75.0, 4326, 3031)
    val (rx, ry) = tx(sx, sy, 3031, 4326)
    assert(math.abs(rx - 120.0) < 1e-6 && math.abs(ry - -75.0) < 1e-6,
      s"south round trip: ($rx, $ry)")
    val (spx, spy) = tx(7.0, -90.0, 4326, 3031)
    assert(math.abs(spx) < 1e-6 && math.abs(spy) < 1e-6, s"south pole: ($spx, $spy)")
  }
}
