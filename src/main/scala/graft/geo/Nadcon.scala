package graft.geo

import java.io.{DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}

import graft.core.DataIOError

/** NADCON grid-shift support — the NOAA ".las"/".los" binary pair that
  * publishes the United States NAD27→NAD83 datum transformation (and
  * the HPGN/HARN state refinements). Format is public: NOAA's NADCON
  * FORTRAN distribution (NGS, Dewhurst 1990) and GDAL's `loslas`
  * driver both document it. This closes the last datum-GRID format
  * gap after round 10's NTv2 (`geo/Ntv2.scala`) — the reference
  * accepts any EPSG via GDAL/proj
  * (`/root/reference/src/data_preprocessing.py:192-193`).
  *
  * Layout (identical for both files; .las carries latitude shifts,
  * .los longitude shifts):
  *  - record length = (NC + 1) × 4 bytes, where NC = column count;
  *  - record 1 (header, zero-padded to record length):
  *    56-byte ASCII ident, 8-byte ASCII program id, int32 NC/NR/NZ,
  *    float32 XMIN, DX, YMIN, DY, ANGLE;
  *  - records 2..NR+1: int32 row index (1-based, S→N) followed by NC
  *    float32 shift values, west to east.
  *
  * Conventions honored (NOAA): XMIN/DX are EAST-positive degrees
  * (CONUS XMIN ≈ −131), YMIN/DY north-positive degrees, row 1 is the
  * SOUTH edge; shift values are arc-seconds with the .los longitude
  * shift POSITIVE WEST — so for an east-positive longitude,
  * lat83 = lat27 + las/3600 and lon83 = lon27 − los/3600. Both byte
  * orders exist in the wild (the grids circulated across big- and
  * little-endian workstations); detected from NC/NR plausibility.
  *
  * The parsed grid is an immutable, serializable value small enough
  * to ship in a UDF closure (CONUS is ~1.4 MB per file — broadcast-
  * scale, never fact-scale), so the shift runs scan-side on executors
  * like every other projection stage. */
object Nadcon {

  /** A parsed .las/.los pair: one rectangular grid, row-major S→N,
    * W→E (east-positive). Shifts in arc-seconds; `lonShift` positive
    * west (the NOAA convention). */
  final case class Grid(ident: String, nCols: Int, nRows: Int,
      xMinDeg: Double, dxDeg: Double, yMinDeg: Double, dyDeg: Double,
      latShift: Array[Float], lonShift: Array[Float])
      extends ShiftGrid {
    require(nCols >= 2 && nRows >= 2,
      s"NADCON grid needs >= 2x2 nodes, got ${nRows}x$nCols")
    require(dxDeg > 0 && dyDeg > 0, "NADCON increments must be positive")
    require(latShift.length == nRows * nCols &&
      lonShift.length == nRows * nCols,
      s"NADCON node count ${latShift.length}/${lonShift.length} != " +
        s"${nRows}x$nCols")

    def xMaxDeg: Double = xMinDeg + dxDeg * (nCols - 1)
    def yMaxDeg: Double = yMinDeg + dyDeg * (nRows - 1)

    def contains(lonDeg: Double, latDeg: Double): Boolean =
      lonDeg >= xMinDeg && lonDeg <= xMaxDeg &&
        latDeg >= yMinDeg && latDeg <= yMaxDeg

    /** Bilinear shift at a point: (dLatSec, dLonSecPositiveWest). The
      * cell index clamps to the last cell so the N/E boundary
      * interpolates from the final cell (the NTv2 discipline). */
    def interpolate(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val fx = (lonDeg - xMinDeg) / dxDeg
      val fy = (latDeg - yMinDeg) / dyDeg
      val c0 = math.min(fx.toInt, nCols - 2)
      val r0 = math.min(fy.toInt, nRows - 2)
      val dx = fx - c0
      val dy = fy - r0
      def bil(a: Array[Float]): Double = {
        val i00 = r0 * nCols + c0
        val i10 = i00 + 1            // one step east
        val i01 = i00 + nCols        // one step north
        val i11 = i01 + 1
        a(i00) * (1 - dx) * (1 - dy) + a(i10) * dx * (1 - dy) +
          a(i01) * (1 - dx) * dy + a(i11) * dx * dy
      }
      (bil(latShift), bil(lonShift))
    }

    /** NAD27-style local → target datum: degrees in (lon east-
      * positive, lat), degrees out; None outside coverage (PROJ
      * raises there — null coordinates are this engine's visible
      * row-level policy, decided by the caller). */
    def forward(lonDeg: Double, latDeg: Double): Option[(Double, Double)] =
      if (!contains(lonDeg, latDeg)) None
      else {
        val (dLat, dLonW) = interpolate(lonDeg, latDeg)
        Some((lonDeg - dLonW / 3600.0, latDeg + dLat / 3600.0))
      }

    /** Inverse shift (target → local) by fixed-point iteration — the
      * NADCON FORTRAN inverse (shifts are smooth and tiny relative to
      * cell size; 4 rounds land far below float32 node precision). */
    def inverse(lonDeg: Double, latDeg: Double): Option[(Double, Double)] = {
      var lon = lonDeg; var lat = latDeg
      var it = 0
      while (it < 4) {
        if (!contains(lon, lat)) return None
        val (dLat, dLonW) = interpolate(lon, lat)
        lon = lonDeg + dLonW / 3600.0
        lat = latDeg - dLat / 3600.0
        it += 1
      }
      Some((lon, lat))
    }
  }

  // ---- binary reader ---------------------------------------------------

  private final case class OneFile(ident: String, nc: Int, nr: Int,
      xMin: Double, dx: Double, yMin: Double, dy: Double,
      values: Array[Float])

  private def plausible(nc: Int, nr: Int): Boolean =
    nc >= 2 && nc <= 100000 && nr >= 2 && nr <= 100000

  private def readOne(path: String): OneFile = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val len = raf.length()
      if (len < 96) throw DataIOError(path,
        s"NADCON file too short for a header ($len bytes)")
      val all = new Array[Byte](len.toInt)
      raf.readFully(all)
      // byte order: NC/NR live at offsets 64/68; take the order under
      // which both are plausible grid dimensions (the NUM_OREC device)
      def dims(o: ByteOrder): (Int, Int) = {
        val b = ByteBuffer.wrap(all, 64, 8).order(o)
        (b.getInt, b.getInt)
      }
      val (ncLe, nrLe) = dims(ByteOrder.LITTLE_ENDIAN)
      val order =
        if (plausible(ncLe, nrLe)) ByteOrder.LITTLE_ENDIAN
        else {
          val (ncBe, nrBe) = dims(ByteOrder.BIG_ENDIAN)
          if (plausible(ncBe, nrBe)) ByteOrder.BIG_ENDIAN
          else throw DataIOError(path,
            "implausible NC/NR in either byte order — not a NADCON grid")
        }
      val b = ByteBuffer.wrap(all).order(order)
      val identB = new Array[Byte](56); b.get(identB)
      val pgmB = new Array[Byte](8); b.get(pgmB)
      val ident = new String(identB, "US-ASCII").trim
      val nc = b.getInt; val nr = b.getInt; val nz = b.getInt
      if (nz != 1) throw DataIOError(path, s"NADCON NZ must be 1, got $nz")
      // the header occupies RECORD 1, so the record length (NC+1)·4
      // must cover the 96 fixed header bytes — true of every published
      // grid (CONUS NC=273); smaller NC means the offsets are lies
      if ((nc + 1) * 4 < 96) throw DataIOError(path,
        s"NADCON NC=$nc too small — the 96-byte header cannot fit one " +
          "record; not a NADCON grid")
      val xMin = b.getFloat.toDouble; val dx = b.getFloat.toDouble
      val yMin = b.getFloat.toDouble; val dy = b.getFloat.toDouble
      b.getFloat // ANGLE — always 0 in published grids; unused
      val recLen = (nc + 1) * 4
      val need = recLen.toLong * (nr + 1)
      if (len < need) throw DataIOError(path,
        s"NADCON file truncated: $len bytes < $need for ${nr}x$nc")
      val values = new Array[Float](nr * nc)
      var r = 0
      while (r < nr) {
        val base = recLen * (r + 1)
        val row = ByteBuffer.wrap(all, base, recLen).order(order)
        row.getInt // leading row index — informational
        var c = 0
        while (c < nc) { values(r * nc + c) = row.getFloat; c += 1 }
        r += 1
      }
      OneFile(ident, nc, nr, xMin, dx, yMin, dy, values)
    } catch {
      case e: DataIOError => throw e
      case e: Exception => throw DataIOError(path,
        s"NADCON parse failed: ${e.getMessage}")
    } finally raf.close()
  }

  /** Parse a NADCON .las/.los pair into one [[Grid]]. The two files
    * must agree on the full grid geometry; mismatches raise
    * [[DataIOError]] naming the field. */
  def read(lasPath: String, losPath: String): Grid = {
    val las = readOne(lasPath)
    val los = readOne(losPath)
    def agree(field: String, a: Any, b: Any): Unit =
      if (a != b) throw DataIOError(losPath,
        s"NADCON pair mismatch on $field: .las has $a, .los has $b")
    agree("NC", las.nc, los.nc); agree("NR", las.nr, los.nr)
    agree("XMIN", las.xMin, los.xMin); agree("DX", las.dx, los.dx)
    agree("YMIN", las.yMin, los.yMin); agree("DY", las.dy, los.dy)
    Grid(las.ident, las.nc, las.nr, las.xMin, las.dx, las.yMin, las.dy,
      las.values, los.values)
  }

  // ---- binary writer (fixtures / interchange) --------------------------

  private def writeOne(path: String, g: Grid, values: Array[Float],
      program: String): Unit = {
    require((g.nCols + 1) * 4 >= 96,
      s"NADCON needs NC >= 23 (header record is 96 bytes), got ${g.nCols}")
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      val recLen = (g.nCols + 1) * 4
      val hdr = ByteBuffer.allocate(recLen).order(ByteOrder.LITTLE_ENDIAN)
      hdr.put((g.ident + " " * 56).take(56).getBytes("US-ASCII"))
      hdr.put((program + " " * 8).take(8).getBytes("US-ASCII"))
      hdr.putInt(g.nCols); hdr.putInt(g.nRows); hdr.putInt(1)
      hdr.putFloat(g.xMinDeg.toFloat); hdr.putFloat(g.dxDeg.toFloat)
      hdr.putFloat(g.yMinDeg.toFloat); hdr.putFloat(g.dyDeg.toFloat)
      hdr.putFloat(0f) // ANGLE
      out.write(hdr.array())
      var r = 0
      while (r < g.nRows) {
        val row = ByteBuffer.allocate(recLen).order(ByteOrder.LITTLE_ENDIAN)
        row.putInt(r + 1)
        var c = 0
        while (c < g.nCols) { row.putFloat(values(r * g.nCols + c)); c += 1 }
        out.write(row.array())
        r += 1
      }
    } finally out.close()
  }

  /** Write a [[Grid]] as a little-endian NADCON .las/.los pair (the
    * closed-loop fixture device: the writer exists so specs can pin
    * the READER against a bit-exact file). */
  def write(lasPath: String, losPath: String, grid: Grid): Unit = {
    writeOne(lasPath, grid, grid.latShift, "NADCON")
    writeOne(losPath, grid, grid.lonShift, "NADCON")
  }
}
