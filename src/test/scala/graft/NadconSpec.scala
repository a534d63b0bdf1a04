package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.geo.{Geo, Nadcon}

/** NADCON .las/.los datum grids: writer↔reader round trip, exact
  * bilinear anchors (all node values and probe points are dyadic
  * rationals — the Ntv2Spec bit-exactness device), both byte orders,
  * the fixed-point inverse, pair-mismatch and malformed-file typed
  * errors, and stTransform through the format-agnostic registration. */
class NadconSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** 5×25 synthetic grid over lat [30°,32°] (dy 0.5), lon [−80°,−68°]
    * (dx 0.5, east-positive — the NOAA header convention); node shifts
    * by formula on the (row S→N, col W→E) index i = r·25+c:
    * latShift = i/8 + 1/2, lonShift = i/16 + 1/4 arc-seconds
    * (positive west). NC=25 ≥ 23 so the 96-byte header fits record 1. */
  private def synthGrid: Nadcon.Grid = Nadcon.Grid(
    "GRAFT SYNTHETIC NAD27-NAD83", nCols = 25, nRows = 5,
    xMinDeg = -80.0, dxDeg = 0.5, yMinDeg = 30.0, dyDeg = 0.5,
    Array.tabulate(125)(i => i * 0.125f + 0.5f),
    Array.tabulate(125)(i => i * 0.0625f + 0.25f))

  private def writePair(g: Nadcon.Grid): (String, String) = {
    val d = java.nio.file.Files.createTempDirectory("graft_nadcon").toString
    Nadcon.write(s"$d/g.las", s"$d/g.los", g)
    (s"$d/g.las", s"$d/g.los")
  }

  test("write → read round trip is bit-exact") {
    val g = synthGrid
    val (las, los) = writePair(g)
    val back = Nadcon.read(las, los)
    assert(back.nCols == 25 && back.nRows == 5)
    assert(back.ident == "GRAFT SYNTHETIC NAD27-NAD83")
    assert(back.xMinDeg == -80.0 && back.dxDeg == 0.5)
    assert(back.yMinDeg == 30.0 && back.dyDeg == 0.5)
    assert(back.latShift.toSeq == g.latShift.toSeq)
    assert(back.lonShift.toSeq == g.lonShift.toSeq)
  }

  test("big-endian files parse identically (order detected from NC/NR)") {
    val g = synthGrid
    val (las, los) = writePair(g)
    def swapped(p: String): String = {
      // byte-swap every 4-byte word — ident/pgm bytes get scrambled but
      // NC/NR plausibility drives detection and values are all words
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
      val b = new Array[Byte](a.length)
      // keep the 64 ASCII header bytes as-is; swap all words after
      System.arraycopy(a, 0, b, 0, 64)
      var i = 64
      while (i + 4 <= a.length) {
        b(i) = a(i + 3); b(i + 1) = a(i + 2)
        b(i + 2) = a(i + 1); b(i + 3) = a(i)
        i += 4
      }
      val out = java.nio.file.Files.createTempFile("graft_be", p.takeRight(4))
      java.nio.file.Files.write(out, b)
      out.toString
    }
    val back = Nadcon.read(swapped(las), swapped(los))
    assert(back.latShift.toSeq == g.latShift.toSeq)
    assert(back.lonShift.toSeq == g.lonShift.toSeq)
    assert(back.xMinDeg == -80.0 && back.dyDeg == 0.5)
  }

  test("bilinear anchors: node-exact, cell-center, NE edge clamp") {
    val g = synthGrid
    // exactly ON node (r=1, c=2): i = 27
    assert(g.interpolate(-79.0, 30.5) ==
      ((27 * 0.125 + 0.5, 27 * 0.0625 + 0.25)))
    // center of cell (0,0): nodes 0, 1, 25, 26 → dx=dy=1/2
    val (dl, dw) = g.interpolate(-79.75, 30.25)
    assert(dl == (0.5 + 0.625 + (25 * 0.125 + 0.5) + (26 * 0.125 + 0.5)) / 4)
    assert(dw == (0.25 + 0.3125 + (25 * 0.0625 + 0.25) + (26 * 0.0625 + 0.25)) / 4)
    // NE corner (clamped cell, dx=dy=1): last node i = 124
    val (cl, _) = g.interpolate(-68.0, 32.0)
    assert(cl == 124 * 0.125 + 0.5)
  }

  test("forward applies ±shift/3600; inverse round-trips") {
    val g = synthGrid
    val lon = -79.0; val lat = 31.0 // node (r=2, c=2) → i = 52
    val Some((lonW, latW)) = g.forward(lon, lat)
    assert(latW == lat + (52 * 0.125 + 0.5) / 3600.0)
    assert(lonW == lon - (52 * 0.0625 + 0.25) / 3600.0) // lon shift positive west
    val Some((lonB, latB)) = g.inverse(lonW, latW)
    assert(math.abs(lonB - lon) < 1e-12 && math.abs(latB - lat) < 1e-12)
  }

  test("outside coverage → None (both directions)") {
    assert(synthGrid.forward(-60.0, 31.0).isEmpty)
    assert(synthGrid.inverse(-79.0, 50.0).isEmpty)
  }

  test("stTransform through registerGridShiftDatum") {
    val (las, los) = writePair(synthGrid)
    Geo.registerGridShiftDatum(904268, Nadcon.read(las, los))
    val df = spark.range(1).select(
      Geo.stPoint(lit(-79.0), lit(31.0)).as("g"),
      Geo.stPoint(lit(-60.0), lit(31.0)).as("out"))
    val r = df.select(
      Geo.stX(Geo.stTransform(col("g"), 904268, 4326)).as("x"),
      Geo.stY(Geo.stTransform(col("g"), 904268, 4326)).as("y"),
      Geo.stX(Geo.stTransform(col("out"), 904268, 4326)).as("ox")).head
    assert(r.getDouble(0) == -79.0 - (52 * 0.0625 + 0.25) / 3600.0)
    assert(r.getDouble(1) == 31.0 + (52 * 0.125 + 0.5) / 3600.0)
    assert(r.isNullAt(2))
  }

  test("typed errors: pair geometry mismatch, junk file, truncation") {
    val g = synthGrid
    val (las, _) = writePair(g)
    val (_, losOther) = writePair(g.copy(xMinDeg = -81.0))
    val e = intercept[graft.core.DataIOError](Nadcon.read(las, losOther))
    assert(e.getMessage.contains("pair mismatch on XMIN"))

    val junk = java.nio.file.Files.createTempFile("graft_junk", ".las").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(junk),
      Array.fill[Byte](200)(7))
    val e2 = intercept[graft.core.DataIOError](Nadcon.read(junk, junk))
    assert(e2.getMessage.contains("implausible NC/NR"))

    val (lasT, losT) = writePair(g)
    val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(lasT))
    val cut = java.nio.file.Files.createTempFile("graft_cut", ".las")
    java.nio.file.Files.write(cut, a.take(200))
    val e3 = intercept[graft.core.DataIOError](
      Nadcon.read(cut.toString, losT))
    assert(e3.getMessage.contains("truncated"))
  }
}
