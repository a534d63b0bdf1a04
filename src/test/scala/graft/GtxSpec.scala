package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.geo.{Geo, Gtx}

/** GTX vertical-datum grids: writer↔reader round trip (big-endian
  * canonical + little-endian variant), exact bilinear anchors (dyadic
  * node values — the Ntv2/Nadcon bit-exactness device), NODATA
  * propagation, coverage nulls, the height-conversion columns, and
  * malformed-file typed errors. */
class GtxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** 5×5 grid over lat [30°,32°], lon [−80°,−78°], 0.5° increments;
    * node i = r·5+c carries i/8 + 1/4 m, node 12 is NODATA. */
  private def synthGrid: Gtx.Grid = Gtx.Grid(30.0, -80.0, 0.5, 0.5, 5, 5,
    Array.tabulate(25)(i => if (i == 12) Gtx.NoData else i * 0.125f + 0.25f))

  private def writeRead(g: Gtx.Grid): Gtx.Grid = {
    val p = java.nio.file.Files.createTempFile("graft_gtx", ".gtx").toString
    Gtx.write(p, g)
    Gtx.read(p)
  }

  test("write → read round trip is bit-exact (incl. the NODATA node)") {
    val back = writeRead(synthGrid)
    assert(back.nRows == 5 && back.nCols == 5)
    assert(back.latMinDeg == 30.0 && back.lonMinDeg == -80.0)
    assert(back.values.toSeq == synthGrid.values.toSeq)
    assert(back.values(12) == Gtx.NoData)
  }

  test("little-endian variant parses identically") {
    val p = java.nio.file.Files.createTempFile("graft_gtxbe", ".gtx").toString
    Gtx.write(p, synthGrid)
    val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val b = new Array[Byte](a.length)
    // swap the four float64 header words, the two int32s, and the
    // float32 payload words
    def swap(off: Int, w: Int): Unit =
      for (k <- 0 until w) b(off + k) = a(off + w - 1 - k)
    for (i <- 0 until 4) swap(i * 8, 8)
    swap(32, 4); swap(36, 4)
    var o = 40
    while (o + 4 <= a.length) { swap(o, 4); o += 4 }
    val q = java.nio.file.Files.createTempFile("graft_gtxle", ".gtx")
    java.nio.file.Files.write(q, b)
    val back = Gtx.read(q.toString)
    assert(back.values.toSeq == synthGrid.values.toSeq)
    assert(back.dLatDeg == 0.5 && back.nCols == 5)
  }

  test("bilinear anchors: node-exact, cell-center, NE clamp") {
    val g = synthGrid
    // on node (r=0, c=2) → i=2: 2/8 + 1/4 = 0.5 — cell (0,2) stays
    // clear of the NODATA node (any cell touching node 12 is None by
    // the conservative policy, even at zero blend weight)
    assert(g.undulation(-79.0, 30.0).contains(2 * 0.125 + 0.25))
    // center of cell (0,0): nodes 0,1,5,6 → mean of dyadic values
    assert(g.undulation(-79.75, 30.25).contains(
      (0.25 + 0.375 + (5 * 0.125 + 0.25) + (6 * 0.125 + 0.25)) / 4))
    // NE corner (clamped cell, dx=dy=1): node 24
    assert(g.undulation(-78.0, 32.0).contains(24 * 0.125 + 0.25))
  }

  test("NODATA node poisons its four cells; outside coverage → None") {
    val g = synthGrid
    // node 12 = (r=2,c=2): any blend over cells (1,1),(1,2),(2,1),(2,2)
    assert(g.undulation(-79.25, 31.25).isEmpty) // cell (2,2) interior
    assert(g.undulation(-79.3, 30.8).isEmpty)   // cell (1,1) interior
    // a cell NOT touching node 12 still interpolates
    assert(g.undulation(-79.75, 30.25).isDefined)
    assert(g.undulation(-60.0, 31.0).isEmpty)
    assert(g.undulation(-79.0, 50.0).isEmpty)
  }

  test("height conversion columns: h = H + N, round trip, null rows") {
    val g = writeRead(synthGrid)
    val df = spark.range(1).select(
      lit(-79.0).as("lon"), lit(30.0).as("lat"), lit(100.0).as("H"),
      lit(-60.0).as("lon_out"))
    val r = df.select(
      Geo.toEllipsoidalHeight(g)(col("H"), col("lon"), col("lat")).as("h"),
      Geo.toEllipsoidalHeight(g)(col("H"), col("lon_out"), col("lat")).as("h_out")).head
    assert(r.getDouble(0) == 100.0 + 0.5)
    assert(r.isNullAt(1))
    val back = df.select(Geo.toOrthometricHeight(g)(
      Geo.toEllipsoidalHeight(g)(col("H"), col("lon"), col("lat")),
      col("lon"), col("lat")).as("H2")).head
    assert(back.getDouble(0) == 100.0)
  }

  test("typed errors: junk file, truncation") {
    val junk = java.nio.file.Files.createTempFile("graft_gtxjunk", ".gtx").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(junk),
      Array.fill[Byte](200)(7))
    val e = intercept[graft.core.DataIOError](Gtx.read(junk))
    assert(e.getMessage.contains("implausible NROWS/NCOLS"))
    val p = java.nio.file.Files.createTempFile("graft_gtxcut", ".gtx").toString
    Gtx.write(p, synthGrid)
    val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val cut = java.nio.file.Files.createTempFile("graft_gtxcut2", ".gtx")
    java.nio.file.Files.write(cut, a.take(80))
    val e2 = intercept[graft.core.DataIOError](Gtx.read(cut.toString))
    assert(e2.getMessage.contains("truncated"))
  }
}
