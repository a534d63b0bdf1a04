package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.geo.{Geo, Ntv2}

/** NTv2 grid-shift datum transforms: writer↔reader round trip, exact
  * bilinear anchors (all grid values and probe points are dyadic
  * rationals, so every interpolation is EXACT in float32/double — the
  * same bit-exactness device as the TIFF codec specs), sub-grid
  * nesting, the fixed-point inverse, out-of-coverage nulls, and the
  * stTransform integration. */
class Ntv2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** 5×5 synthetic grid over lat [30°,32°], lon [80°W,78°W] (positive
    * west: E_LONG=280800s, W_LONG=288000s, inc 1800s = 0.5°); node
    * shifts by formula on the (row S→N, col E→W) index: dyadic-exact.
    * latShift = (r·5+c)/8 + 1/2, lonShift = (r·5+c)/16 + 1/4 sec. */
  private def synthGrid: Ntv2.Grid = {
    val lat = Array.tabulate(25)(i => (i * 0.125f + 0.5f))
    val lon = Array.tabulate(25)(i => (i * 0.0625f + 0.25f))
    Ntv2.Grid(Seq(Ntv2.SubGrid("SYNTH", "NONE",
      sLatSec = 108000.0, nLatSec = 115200.0,
      eLonSec = 280800.0, wLonSec = 288000.0,
      latIncSec = 1800.0, lonIncSec = 1800.0, lat, lon)))
  }

  test("write → read round trip is bit-exact") {
    val p = java.nio.file.Files.createTempFile("graft_ntv2", ".gsb").toString
    Ntv2.write(p, synthGrid)
    val back = Ntv2.read(p)
    assert(back.subGrids.size == 1)
    val g = back.subGrids.head
    assert(g.name == "SYNTH" && g.nRows == 5 && g.nCols == 5)
    assert(g.latShift.toSeq == synthGrid.subGrids.head.latShift.toSeq)
    assert(g.lonShift.toSeq == synthGrid.subGrids.head.lonShift.toSeq)
    assert(g.sLatSec == 108000.0 && g.wLonSec == 288000.0)
  }

  test("bilinear anchors: node-exact, cell-center, edge clamp") {
    val g = synthGrid.subGrids.head
    // exactly ON node (r=1,c=2): value = (1*5+2)/8+0.5 = 1.375
    assert(g.interpolate(280800.0 + 2 * 1800.0, 108000.0 + 1800.0) ==
      ((7 * 0.125 + 0.5, 7 * 0.0625 + 0.25)))
    // cell center between nodes (0,0),(0,1),(1,0),(1,1):
    // lat values 0.5, 0.625, 1.125, 1.25 → mean 0.875 (dx=dy=0.5)
    val (dl, dw) = g.interpolate(280800.0 + 900.0, 108000.0 + 900.0)
    assert(dl == 0.875)
    assert(dw == (0.25 + 0.3125 + 0.5625 + 0.625) / 4)
    // NE corner node (clamped cell indices, dx=dy=1): last node value
    val (cl, _) = g.interpolate(288000.0, 115200.0)
    assert(cl == 24 * 0.125 + 0.5)
  }

  test("forward applies shift; inverse round-trips to float precision") {
    val grid = synthGrid
    val lon = -79.0; val lat = 31.0 // node (r=2,c=2) → idx 12
    val Some((lonW, latW)) = grid.forward(lon, lat)
    assert(latW == lat + (12 * 0.125 + 0.5) / 3600.0)
    assert(lonW == lon - (12 * 0.0625 + 0.25) / 3600.0)
    val Some((lonB, latB)) = grid.inverse(lonW, latW)
    assert(math.abs(lonB - lon) < 1e-12 && math.abs(latB - lat) < 1e-12)
  }

  test("outside coverage → None (both directions)") {
    assert(synthGrid.forward(-70.0, 31.0).isEmpty)
    assert(synthGrid.inverse(-79.0, 50.0).isEmpty)
  }

  test("sub-grid nesting: the finest containing grid wins") {
    val coarse = synthGrid.subGrids.head
    // dense child over the middle cell block: lat [30.5°,31°],
    // lon [79°W,78.5°W], inc 900s — CONSTANT shift 2.0/1.0 to make the
    // winner observable
    val fine = Ntv2.SubGrid("FINE", "SYNTH",
      sLatSec = 109800.0, nLatSec = 111600.0,
      eLonSec = 282600.0, wLonSec = 284400.0,
      latIncSec = 900.0, lonIncSec = 900.0,
      Array.fill(9)(2.0f), Array.fill(9)(1.0f))
    val g = Ntv2.Grid(Seq(coarse, fine))
    val Some((_, latW)) = g.forward(-78.875, 30.625) // inside child
    assert(latW == 30.625 + 2.0 / 3600.0)
    val Some((_, latW2)) = g.forward(-79.875, 30.125) // coarse only
    assert(latW2 != 30.125 + 2.0 / 3600.0)
  }

  test("stTransform through a registered NTv2 geographic datum") {
    val p = java.nio.file.Files.createTempFile("graft_ntv2b", ".gsb").toString
    Ntv2.write(p, synthGrid)
    Geo.registerNtv2GeographicDatum(904267, Ntv2.read(p))
    val df = spark.range(1).select(
      Geo.stPoint(lit(-79.0), lit(31.0)).as("g"),
      Geo.stPoint(lit(-70.0), lit(31.0)).as("out")) // outside coverage
    val r = df.select(
      Geo.stX(Geo.stTransform(col("g"), 904267, 4326)).as("x"),
      Geo.stY(Geo.stTransform(col("g"), 904267, 4326)).as("y"),
      Geo.stX(Geo.stTransform(col("out"), 904267, 4326)).as("ox")).head
    assert(r.getDouble(0) == -79.0 - (12 * 0.0625 + 0.25) / 3600.0)
    assert(r.getDouble(1) == 31.0 + (12 * 0.125 + 0.5) / 3600.0)
    assert(r.isNullAt(2))
  }

  test("typed errors: not-NTv2 file, truncated file, non-SECONDS units") {
    val tmp = java.nio.file.Files.createTempFile("graft_bad", ".gsb").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(tmp),
      Array.fill[Byte](200)(7))
    val e = intercept[graft.core.DataIOError](Ntv2.read(tmp))
    assert(e.getMessage.contains("NUM_OREC"))
    val short = java.nio.file.Files.createTempFile("graft_short", ".gsb").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(short), Array[Byte](1, 2))
    val e2 = intercept[graft.core.DataIOError](Ntv2.read(short))
    assert(e2.getMessage.contains("too short"))
  }
}
