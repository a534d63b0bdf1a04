package graft.geo

import java.io.{DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}

import graft.core.DataIOError

/** GTX vertical-datum (geoid) grid support — the ".gtx" binary format
  * NOAA's VDatum publishes and PROJ consumes for geoid undulation and
  * vertical datum shift grids (format is public: PROJ's gtx driver
  * and the VDatum documentation). Completes the grid family: NTv2 and
  * NADCON shift HORIZONTAL datums (round 10/11), GTX shifts HEIGHTS —
  * orthometric H ↔ ellipsoidal h via h = H + N with N the grid's
  * bilinear undulation.
  *
  * Layout (canonically BIG-endian — the format predates LE grids, but
  * LE variants circulate; order detected from NROWS/NCOLS
  * plausibility):
  *  - header: float64 latMin, lonMin (degrees, SW corner), dLat, dLon
  *    (degree increments), int32 nRows, nCols — 40 bytes;
  *  - data: nRows × nCols float32 values (meters), row-major from the
  *    SW corner, rows S→N, columns W→E;
  *  - the sentinel −88.8888 marks a NODATA node (the VDatum
  *    convention); any interpolation touching one yields None.
  *
  * The parsed grid is an immutable serializable value (geoid grids
  * are a few MB — broadcast-scale); the undulation runs scan-side in
  * a UDF closure like the horizontal shifts. */
object Gtx {

  val NoData: Float = -88.8888f

  final case class Grid(latMinDeg: Double, lonMinDeg: Double,
      dLatDeg: Double, dLonDeg: Double, nRows: Int, nCols: Int,
      values: Array[Float]) extends Serializable {
    require(nRows >= 2 && nCols >= 2,
      s"GTX grid needs >= 2x2 nodes, got ${nRows}x$nCols")
    require(dLatDeg > 0 && dLonDeg > 0, "GTX increments must be positive")
    require(values.length == nRows * nCols,
      s"GTX node count ${values.length} != ${nRows}x$nCols")

    def latMaxDeg: Double = latMinDeg + dLatDeg * (nRows - 1)
    def lonMaxDeg: Double = lonMinDeg + dLonDeg * (nCols - 1)

    def contains(lonDeg: Double, latDeg: Double): Boolean =
      lonDeg >= lonMinDeg && lonDeg <= lonMaxDeg &&
        latDeg >= latMinDeg && latDeg <= latMaxDeg

    /** Bilinear undulation N (meters) at a point; None outside
      * coverage or when any of the 4 blend nodes is the NODATA
      * sentinel (never extrapolate through a hole). Cell indices
      * clamp at the N/E edges (the NTv2/NADCON discipline). */
    def undulation(lonDeg: Double, latDeg: Double): Option[Double] = {
      if (!contains(lonDeg, latDeg)) return None
      val fx = (lonDeg - lonMinDeg) / dLonDeg
      val fy = (latDeg - latMinDeg) / dLatDeg
      val c0 = math.min(fx.toInt, nCols - 2)
      val r0 = math.min(fy.toInt, nRows - 2)
      val dx = fx - c0
      val dy = fy - r0
      val i00 = r0 * nCols + c0
      val v00 = values(i00); val v10 = values(i00 + 1)
      val v01 = values(i00 + nCols); val v11 = values(i00 + nCols + 1)
      if (v00 == NoData || v10 == NoData || v01 == NoData || v11 == NoData)
        return None
      Some(v00 * (1 - dx) * (1 - dy) + v10 * dx * (1 - dy) +
        v01 * (1 - dx) * dy + v11 * dx * dy)
    }
  }

  // ---- binary reader ---------------------------------------------------

  private def plausible(nr: Int, nc: Int): Boolean =
    nr >= 2 && nr <= 100000 && nc >= 2 && nc <= 100000

  /** Parse a .gtx file. Byte order detected from NROWS/NCOLS
    * plausibility (canonical grids are big-endian). */
  def read(path: String): Grid = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val len = raf.length()
      if (len < 40) throw DataIOError(path,
        s"GTX file too short for a header ($len bytes)")
      val all = new Array[Byte](len.toInt)
      raf.readFully(all)
      def dims(o: ByteOrder): (Int, Int) = {
        val b = ByteBuffer.wrap(all, 32, 8).order(o)
        (b.getInt, b.getInt)
      }
      val (nrBe, ncBe) = dims(ByteOrder.BIG_ENDIAN)
      val order =
        if (plausible(nrBe, ncBe)) ByteOrder.BIG_ENDIAN
        else {
          val (nrLe, ncLe) = dims(ByteOrder.LITTLE_ENDIAN)
          if (plausible(nrLe, ncLe)) ByteOrder.LITTLE_ENDIAN
          else throw DataIOError(path,
            "implausible NROWS/NCOLS in either byte order — not a GTX grid")
        }
      val b = ByteBuffer.wrap(all).order(order)
      val latMin = b.getDouble; val lonMin = b.getDouble
      val dLat = b.getDouble; val dLon = b.getDouble
      val nr = b.getInt; val nc = b.getInt
      val need = 40L + 4L * nr * nc
      if (len < need) throw DataIOError(path,
        s"GTX file truncated: $len bytes < $need for ${nr}x$nc")
      val values = new Array[Float](nr * nc)
      var i = 0
      while (i < values.length) { values(i) = b.getFloat; i += 1 }
      Grid(latMin, lonMin, dLat, dLon, nr, nc, values)
    } catch {
      case e: DataIOError => throw e
      case e: Exception => throw DataIOError(path,
        s"GTX parse failed: ${e.getMessage}")
    } finally raf.close()
  }

  // ---- binary writer (fixtures / interchange) --------------------------

  /** Write a [[Grid]] as a canonical big-endian .gtx (the closed-loop
    * fixture device: specs pin the READER against a bit-exact file). */
  def write(path: String, g: Grid): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      val b = ByteBuffer.allocate(40 + 4 * g.values.length)
        .order(ByteOrder.BIG_ENDIAN)
      b.putDouble(g.latMinDeg); b.putDouble(g.lonMinDeg)
      b.putDouble(g.dLatDeg); b.putDouble(g.dLonDeg)
      b.putInt(g.nRows); b.putInt(g.nCols)
      g.values.foreach(b.putFloat)
      out.write(b.array())
    } finally out.close()
  }
}
