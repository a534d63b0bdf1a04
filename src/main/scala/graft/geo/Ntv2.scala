package graft.geo

import java.io.{DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}

import graft.core.DataIOError

/** NTv2 grid-shift support (the ".gsb" binary format published with
  * the Canadian National Transformation v2 and adopted by PROJ/GDAL
  * and national agencies for NAD27→NAD83, OSTN-style and similar
  * centimeter-grade datum transformations — format spec is public:
  * "NTv2 Developer's Guide", Geodetic Survey of Canada).
  *
  * Closes the top remaining `to_crs` gap (reference accepts any EPSG,
  * `/root/reference/src/data_preprocessing.py:192-193`): datums whose
  * published transformation is a SHIFT GRID rather than a 7-parameter
  * Bursa-Wolf set. The grid maps geographic coordinates on the LOCAL
  * datum to coordinate SHIFTS (arc-seconds) toward the target datum;
  * between nodes the shift interpolates bilinearly.
  *
  * Format notes honored here (all from the public spec):
  *  - 11 overview records + 11 records per sub-grid, 16 bytes each
  *    (8-char ASCII name + 8-byte value: int32+pad, double, or 8-char
  *    string); both byte orders exist in the wild — detected from
  *    NUM_OREC (= 11).
  *  - longitudes are POSITIVE WEST; rows run S→N; within a row nodes
  *    run from E_LONG toward W_LONG (increasing positive-west value).
  *  - each node: 4 float32 = (latShiftSec, lonShiftSecPositiveWest,
  *    latAccuracy, lonAccuracy).
  *  - sub-grids nest: the FINEST (densest) containing sub-grid wins.
  *
  * The parsed grid is an immutable, serializable value small enough to
  * ship in a UDF closure (national grids are a few MB — broadcast-
  * scale, never fact-scale), so the shift runs scan-side on executors
  * like every other projection stage. */
object Ntv2 {

  /** One sub-grid: bounds and increments in ARC-SECONDS, positive-west
    * longitudes; `latShift`/`lonShift` row-major S→N, E→W (spec node
    * order), arc-seconds. */
  final case class SubGrid(name: String, parent: String,
      sLatSec: Double, nLatSec: Double, eLonSec: Double, wLonSec: Double,
      latIncSec: Double, lonIncSec: Double,
      latShift: Array[Float], lonShift: Array[Float]) {
    val nRows: Int = math.round((nLatSec - sLatSec) / latIncSec).toInt + 1
    val nCols: Int = math.round((wLonSec - eLonSec) / lonIncSec).toInt + 1
    require(nRows >= 2 && nCols >= 2,
      s"sub-grid $name needs >= 2x2 nodes, got ${nRows}x$nCols")
    require(latShift.length == nRows * nCols,
      s"sub-grid $name: ${latShift.length} nodes != ${nRows}x$nCols")

    /** Point inside this sub-grid? (`lonSecW` positive west.) */
    def contains(lonSecW: Double, latSec: Double): Boolean =
      latSec >= sLatSec && latSec <= nLatSec &&
        lonSecW >= eLonSec && lonSecW <= wLonSec

    /** Bilinear shift at a point, arc-seconds:
      * (dLatSec, dLonSecPositiveWest). The cell index clamps to the
      * last cell so the N/W boundary interpolates from the final cell
      * instead of reading past the grid. */
    def interpolate(lonSecW: Double, latSec: Double): (Double, Double) = {
      val fy = (latSec - sLatSec) / latIncSec
      val fx = (lonSecW - eLonSec) / lonIncSec
      val r0 = math.min(fy.toInt, nRows - 2)
      val c0 = math.min(fx.toInt, nCols - 2)
      val dy = fy - r0
      val dx = fx - c0
      def bil(a: Array[Float]): Double = {
        val i00 = r0 * nCols + c0
        val i10 = i00 + 1            // one step toward W_LONG
        val i01 = i00 + nCols        // one step toward N_LAT
        val i11 = i01 + 1
        a(i00) * (1 - dx) * (1 - dy) + a(i10) * dx * (1 - dy) +
          a(i01) * (1 - dx) * dy + a(i11) * dx * dy
      }
      (bil(latShift), bil(lonShift))
    }
  }

  /** A parsed NTv2 file: sub-grids in file order. Serializable (UDF
    * closure / broadcast). */
  final case class Grid(subGrids: Seq[SubGrid]) extends ShiftGrid {

    /** The FINEST sub-grid containing the point (spec rule: a child
      * grid refines its parent wherever both cover), or None outside
      * all coverage. Finest = smallest lat increment, ties to the
      * later (child) entry. */
    def finest(lonSecW: Double, latSec: Double): Option[SubGrid] = {
      var best: SubGrid = null
      subGrids.foreach { g =>
        if (g.contains(lonSecW, latSec) &&
          (best == null || g.latIncSec <= best.latIncSec)) best = g
      }
      Option(best)
    }

    /** Shift a LOCAL-datum geographic point toward the target datum:
      * degrees in (lon east-positive, lat), degrees out. None when the
      * point is outside all sub-grids (PROJ raises there unless told
      * otherwise; the caller decides the policy). */
    def forward(lonDeg: Double, latDeg: Double): Option[(Double, Double)] = {
      val lonW = -lonDeg * 3600.0
      val lat = latDeg * 3600.0
      finest(lonW, lat).map { g =>
        val (dLat, dLonW) = g.interpolate(lonW, lat)
        // shifts are local→target; positive-west lon shift SUBTRACTS
        // from an east-positive longitude
        (lonDeg - dLonW / 3600.0, latDeg + dLat / 3600.0)
      }
    }

    /** Inverse shift (target datum → local) by fixed-point iteration —
      * the standard NTv2 inverse (shift fields are smooth and tiny
      * relative to cell size, so 4 iterations land far below float32
      * node precision). None outside coverage. */
    def inverse(lonDeg: Double, latDeg: Double): Option[(Double, Double)] = {
      var lon = lonDeg; var lat = latDeg
      var it = 0
      while (it < 4) {
        val s = finest(-lon * 3600.0, lat * 3600.0) match {
          case Some(g) => g.interpolate(-lon * 3600.0, lat * 3600.0)
          case None => return None
        }
        lon = lonDeg + s._2 / 3600.0 // target − (−dLonW/3600) applied as +
        lat = latDeg - s._1 / 3600.0
        it += 1
      }
      Some((lon, lat))
    }
  }

  // ---- binary reader ---------------------------------------------------

  private def str8(b: ByteBuffer): String = {
    val a = new Array[Byte](8); b.get(a); new String(a, "US-ASCII").trim
  }

  /** Parse an NTv2 .gsb file. Byte order is detected from NUM_OREC
    * (must read 11); malformed files raise [[DataIOError]] with the
    * failing field. */
  def read(path: String): Grid = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val len = raf.length()
      if (len < 11 * 16) throw DataIOError(path,
        s"NTv2 file too short for an overview header ($len bytes)")
      val all = new Array[Byte](len.toInt)
      raf.readFully(all)
      val probe = ByteBuffer.wrap(all, 8, 4).order(ByteOrder.LITTLE_ENDIAN)
      val order =
        if (probe.getInt == 11) ByteOrder.LITTLE_ENDIAN
        else {
          val be = ByteBuffer.wrap(all, 8, 4).order(ByteOrder.BIG_ENDIAN)
          if (be.getInt == 11) ByteOrder.BIG_ENDIAN
          else throw DataIOError(path,
            "NUM_OREC != 11 in either byte order — not an NTv2 file")
        }
      val b = ByteBuffer.wrap(all).order(order)

      def record(): (String, ByteBuffer) = {
        val name = str8(b)
        val value = b.slice().order(order)
        b.position(b.position() + 8)
        (name, value)
      }
      def intRec(want: String): Int = {
        val (n, v) = record()
        if (n != want) throw DataIOError(path, s"expected $want, found $n")
        v.getInt
      }
      def dblRec(want: String): Double = {
        val (n, v) = record()
        if (n != want) throw DataIOError(path, s"expected $want, found $n")
        v.getDouble
      }
      def strRec(want: String): String = {
        val (n, v) = record()
        if (n != want) throw DataIOError(path, s"expected $want, found $n")
        val a = new Array[Byte](8); v.get(a); new String(a, "US-ASCII").trim
      }

      intRec("NUM_OREC")
      intRec("NUM_SREC")
      val numFile = intRec("NUM_FILE")
      val gsType = strRec("GS_TYPE")
      if (gsType != "SECONDS") throw DataIOError(path,
        s"GS_TYPE $gsType unsupported — the published grids use SECONDS")
      strRec("VERSION"); strRec("SYSTEM_F"); strRec("SYSTEM_T")
      dblRec("MAJOR_F"); dblRec("MINOR_F"); dblRec("MAJOR_T"); dblRec("MINOR_T")

      val subs = (0 until numFile).map { _ =>
        val name = strRec("SUB_NAME")
        val parent = strRec("PARENT")
        strRec("CREATED"); strRec("UPDATED")
        val sLat = dblRec("S_LAT"); val nLat = dblRec("N_LAT")
        val eLon = dblRec("E_LONG"); val wLon = dblRec("W_LONG")
        val latInc = dblRec("LAT_INC"); val lonInc = dblRec("LONG_INC")
        val count = intRec("GS_COUNT")
        if (count <= 0 || count > 50000000) throw DataIOError(path,
          s"sub-grid $name: implausible GS_COUNT $count")
        val latShift = new Array[Float](count)
        val lonShift = new Array[Float](count)
        var i = 0
        while (i < count) {
          latShift(i) = b.getFloat
          lonShift(i) = b.getFloat
          b.getFloat; b.getFloat // accuracy fields — not used
          i += 1
        }
        SubGrid(name, parent, sLat, nLat, eLon, wLon, latInc, lonInc,
          latShift, lonShift)
      }
      Grid(subs)
    } catch {
      case e: DataIOError => throw e
      case e: Exception => throw DataIOError(path,
        s"NTv2 parse failed: ${e.getMessage}")
    } finally raf.close()
  }

  // ---- binary writer (fixtures / interchange) --------------------------

  /** Write a [[Grid]] as a little-endian NTv2 .gsb (fixture generator
    * and sink — the same closed loop the TIFF codecs use: the writer
    * exists so specs can pin the READER against a bit-exact file). */
  def write(path: String, grid: Grid, systemF: String = "LOCAL",
      systemT: String = "WGS84"): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    def leInt(v: Int): Array[Byte] =
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def leDbl(v: Double): Array[Byte] =
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
    def name8(s: String): Array[Byte] =
      (s + " " * 8).take(8).getBytes("US-ASCII")
    def rec(n: String, v: Array[Byte]): Unit = { out.write(name8(n)); out.write(v) }
    try {
      rec("NUM_OREC", leInt(11)); rec("NUM_SREC", leInt(11))
      rec("NUM_FILE", leInt(grid.subGrids.size))
      rec("GS_TYPE", name8("SECONDS")); rec("VERSION", name8("NTV2.0"))
      rec("SYSTEM_F", name8(systemF)); rec("SYSTEM_T", name8(systemT))
      rec("MAJOR_F", leDbl(6378137.0)); rec("MINOR_F", leDbl(6356752.314))
      rec("MAJOR_T", leDbl(6378137.0)); rec("MINOR_T", leDbl(6356752.314))
      grid.subGrids.foreach { g =>
        rec("SUB_NAME", name8(g.name)); rec("PARENT", name8(g.parent))
        rec("CREATED", name8("GRAFT")); rec("UPDATED", name8("GRAFT"))
        rec("S_LAT", leDbl(g.sLatSec)); rec("N_LAT", leDbl(g.nLatSec))
        rec("E_LONG", leDbl(g.eLonSec)); rec("W_LONG", leDbl(g.wLonSec))
        rec("LAT_INC", leDbl(g.latIncSec)); rec("LONG_INC", leDbl(g.lonIncSec))
        rec("GS_COUNT", leInt(g.latShift.length))
        val nb = ByteBuffer.allocate(16 * g.latShift.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < g.latShift.length) {
          nb.putFloat(g.latShift(i)); nb.putFloat(g.lonShift(i))
          nb.putFloat(0f); nb.putFloat(0f)
          i += 1
        }
        out.write(nb.array())
      }
      rec("END", new Array[Byte](8)) // spec end record (ignored by readers)
    } finally out.close()
  }
}
