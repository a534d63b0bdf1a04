package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.core.DataIOError

/** S1 — minimal UNCOMPRESSED GeoTIFF reader → the engine's raster
  * cell-table model `(band:int, x:double, y:double, value:double)` —
  * the same model `SpatialOps.rasterBufferStats` (A3) consumes. Closes
  * the reference's `open_spatial_data` raster-input leg
  * (src/data_preprocessing.py:462-492, rasterio at :470-472) for the
  * codecs a pure-JVM reader can honestly support: classic TIFF,
  * compression=1 (none), strip-organized, chunky planar layout, 8/16/
  * 32-bit integer or 32/64-bit float samples. Compressed codecs
  * (LZW/Deflate/JPEG), BigTIFF and tiled layouts raise a typed error
  * naming the limit — the documented offline boundary (no GDAL in the
  * image), same class as the video-codec stub.
  *
  * Scale: the DRIVER parses only the IFD (KB-sized); pixel decode is
  * DISTRIBUTED — each task seeks to its own strips and emits cells,
  * so a raster parallelizes across strips and a raster CATALOG across
  * files. World coordinates are pixel centers from the
  * ModelTiepoint/ModelPixelScale geotransform (x = X₀ + (col+½)·sx,
  * y = Y₀ − (row+½)·sy); a bare TIFF without geo tags falls back to
  * pixel indices.
  */
object GeoTiff extends Serializable {

  /** Parsed IFD essentials; primitives only so the decode closure
    * ships to executors. */
  private final case class Meta(
      littleEndian: Boolean, width: Int, height: Int,
      bitsPerSample: Int, sampleFormat: Int, samplesPerPixel: Int,
      rowsPerStrip: Int, stripOffsets: Array[Long],
      stripByteCounts: Array[Long],
      originX: Double, originY: Double, scaleX: Double, scaleY: Double,
      hasGeo: Boolean)

  val cellSchema: StructType = StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Read `path` into the cell table. One row per (band, pixel);
    * nodata filtering stays downstream (rasterBufferStats' `nodata`
    * param), matching the reference where masking is an explicit op. */
  def readCells(spark: SparkSession, path: String): DataFrame = {
    val m = parseIfd(path)
    val nStrips = m.stripOffsets.length
    val strips = (0 until nStrips).map { s =>
      val rowStart = s * m.rowsPerStrip
      val nRows = math.min(m.rowsPerStrip, m.height - rowStart)
      (rowStart, nRows, m.stripOffsets(s), m.stripByteCounts(s))
    }.filter(_._2 > 0)
    val parts = math.max(1, math.min(strips.length,
      spark.sparkContext.defaultParallelism))
    val meta = m // stable closure capture
    val rows = spark.sparkContext.parallelize(strips, parts)
      .flatMap { case (rowStart, nRows, offset, byteCount) =>
        decodeStrip(path, meta, rowStart, nRows, offset, byteCount)
      }
    spark.createDataFrame(rows, cellSchema)
  }

  /** Per-task strip decode: seek, read, emit cells. Runs on the
    * executor — `path` must be visible cluster-wide (the standard
    * file-source contract). */
  private def decodeStrip(path: String, m: Meta, rowStart: Int,
      nRows: Int, offset: Long, byteCount: Long): Iterator[Row] = {
    val raf = new java.io.RandomAccessFile(path, "r")
    val buf =
      try { raf.seek(offset); val a = new Array[Byte](byteCount.toInt)
        raf.readFully(a); a }
      finally raf.close()
    val bb = ByteBuffer.wrap(buf).order(
      if (m.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val bytesPer = m.bitsPerSample / 8
    val spp = m.samplesPerPixel
    def sample(idx: Int): Double = (m.bitsPerSample, m.sampleFormat) match {
      case (8, 2)  => bb.get(idx * bytesPer).toDouble
      case (8, _)  => (bb.get(idx * bytesPer) & 0xFF).toDouble
      case (16, 2) => bb.getShort(idx * bytesPer).toDouble
      case (16, _) => (bb.getShort(idx * bytesPer) & 0xFFFF).toDouble
      case (32, 3) => bb.getFloat(idx * bytesPer).toDouble
      case (32, 2) => bb.getInt(idx * bytesPer).toDouble
      case (32, _) => (bb.getInt(idx * bytesPer) & 0xFFFFFFFFL).toDouble
      case (64, 3) => bb.getDouble(idx * bytesPer)
      case (b, f) => throw DataIOError(path,
        s"unsupported sample layout: $b-bit format $f")
    }
    for {
      r <- Iterator.range(0, nRows)
      c <- Iterator.range(0, m.width)
      b <- Iterator.range(0, spp)
    } yield {
      val row = rowStart + r
      val v = sample((r * m.width + c) * spp + b)
      val (x, y) =
        if (m.hasGeo)
          (m.originX + (c + 0.5) * m.scaleX,
            m.originY - (row + 0.5) * m.scaleY)
        else (c.toDouble, row.toDouble)
      Row(b + 1, x, y, v)
    }
  }

  // ---- IFD parsing (driver-side, header + IFD only) -----------------

  private def parseIfd(path: String): Meta = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      val head = new Array[Byte](8); raf.readFully(head)
      val little = head(0) == 'I' && head(1) == 'I'
      val big = head(0) == 'M' && head(1) == 'M'
      if (!little && !big)
        throw DataIOError(path, "not a TIFF (no II/MM byte-order mark)")
      val ord = if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
      val hb = ByteBuffer.wrap(head).order(ord)
      val magic = hb.getShort(2) & 0xFFFF
      if (magic == 43) throw DataIOError(path,
        "BigTIFF (magic 43) unsupported — classic TIFF only")
      if (magic != 42) throw DataIOError(path, s"bad TIFF magic $magic")
      val ifdOff = hb.getInt(4) & 0xFFFFFFFFL

      raf.seek(ifdOff)
      val cntB = new Array[Byte](2); raf.readFully(cntB)
      val nEntries = ByteBuffer.wrap(cntB).order(ord).getShort(0) & 0xFFFF
      val entB = new Array[Byte](12 * nEntries); raf.readFully(entB)
      val eb = ByteBuffer.wrap(entB).order(ord)

      // tag -> (type, count, raw 4 value/offset bytes position)
      final case class Entry(typ: Int, count: Long, at: Int)
      val entries: Map[Int, Entry] = (0 until nEntries).map { i =>
        val off = 12 * i
        (eb.getShort(off) & 0xFFFF) -> Entry(eb.getShort(off + 2) & 0xFFFF,
          eb.getInt(off + 4) & 0xFFFFFFFFL, off + 8)
      }.toMap

      def typeSize(t: Int): Int = t match {
        case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4
        case 5 | 10 | 12 => 8
        case other => throw DataIOError(path, s"unknown TIFF field type $other")
      }
      // materialize a numeric-array tag value (inline or at offset)
      def longs(tag: Int): Option[Array[Long]] = entries.get(tag).map { e =>
        val total = typeSize(e.typ) * e.count.toInt
        val vb =
          if (total <= 4) {
            val a = new Array[Byte](4)
            eb.position(e.at); eb.get(a); eb.rewind(); ByteBuffer.wrap(a).order(ord)
          } else {
            val off = eb.getInt(e.at) & 0xFFFFFFFFL
            raf.seek(off); val a = new Array[Byte](total)
            raf.readFully(a); ByteBuffer.wrap(a).order(ord)
          }
        (0 until e.count.toInt).map { i =>
          e.typ match {
            case 3 => (vb.getShort(i * 2) & 0xFFFF).toLong
            case 4 => vb.getInt(i * 4) & 0xFFFFFFFFL
            case 1 => (vb.get(i) & 0xFF).toLong
            case other => throw DataIOError(path,
              s"tag $tag: expected integer type, got TIFF type $other")
          }
        }.toArray
      }
      def doubles(tag: Int): Option[Array[Double]] = entries.get(tag).map { e =>
        if (e.typ != 12) throw DataIOError(path,
          s"tag $tag: expected DOUBLE (12), got type ${e.typ}")
        val off = eb.getInt(e.at) & 0xFFFFFFFFL
        raf.seek(off)
        val a = new Array[Byte](8 * e.count.toInt); raf.readFully(a)
        val vb = ByteBuffer.wrap(a).order(ord)
        (0 until e.count.toInt).map(i => vb.getDouble(i * 8)).toArray
      }
      def long1(tag: Int, dflt: => Long): Long =
        longs(tag).map(_.head).getOrElse(dflt)

      if (entries.contains(322) || entries.contains(324))
        throw DataIOError(path, "tiled TIFF unsupported — strip-organized only")
      val compression = long1(259, 1L)
      if (compression != 1L) throw DataIOError(path,
        s"compressed TIFF (compression=$compression) unsupported offline — " +
          "re-export uncompressed or ingest via the cell-table parquet path")
      val planar = long1(284, 1L)
      if (planar != 1L) throw DataIOError(path,
        "planar (separated) sample layout unsupported — chunky only")

      val width = long1(256, throw DataIOError(path, "missing ImageWidth")).toInt
      val height = long1(257, throw DataIOError(path, "missing ImageLength")).toInt
      val spp = long1(277, 1L).toInt
      val bps = longs(258).map(_.toSeq).getOrElse(Seq(1L))
      if (bps.distinct.length != 1) throw DataIOError(path,
        s"heterogeneous BitsPerSample ${bps.mkString(",")} unsupported")
      val sampleFormat = long1(339, 1L).toInt
      val rps = long1(278, height.toLong).toInt
      val offs = longs(273).getOrElse(
        throw DataIOError(path, "missing StripOffsets"))
      val cnts = longs(279).getOrElse(
        throw DataIOError(path, "missing StripByteCounts"))
      if (offs.length != cnts.length) throw DataIOError(path,
        s"StripOffsets(${offs.length}) / StripByteCounts(${cnts.length}) mismatch")

      val scale = doubles(33550)
      val tie = doubles(33922)
      val (ox, oy, sx, sy, hasGeo) = (scale, tie) match {
        case (Some(sc), Some(tp)) if sc.length >= 2 && tp.length >= 6 =>
          // tiepoint maps raster (i,j) -> world (X,Y); normalize to the
          // (0,0) corner so pixel-center math below stays uniform
          (tp(3) - tp(0) * sc(0), tp(4) + tp(1) * sc(1), sc(0), sc(1), true)
        case _ => (0.0, 0.0, 1.0, 1.0, false)
      }
      Meta(little, width, height, bps.head.toInt, sampleFormat, spp, rps,
        offs, cnts, ox, oy, sx, sy, hasGeo)
    } finally raf.close()
  }

  // ---- minimal writer (fixtures + raster sink) -----------------------

  /** Write a single-band float32 GeoTIFF (uncompressed, one strip per
    * row) from a row-major value array — the symmetric fixture/sink
    * half of [[readCells]]. `origin` is the world coordinate of the
    * raster's top-left CORNER; `scale` the pixel size (sx, sy). */
  def writeFloat(path: String, width: Int, height: Int,
      values: Array[Float], origin: (Double, Double),
      scale: (Double, Double)): Unit = {
    require(values.length == width * height,
      s"values.length ${values.length} != $width*$height")
    val ord = ByteOrder.LITTLE_ENDIAN
    val dataBytes = width * height * 4
    // layout: 8 header | pixel data | geo doubles | IFD
    val dataOff = 8
    val scaleOff = dataOff + dataBytes
    val tieOff = scaleOff + 24
    val ifdOff = tieOff + 48
    val tags = 12 // entry count below
    val buf = ByteBuffer.allocate(ifdOff + 2 + 12 * tags + 4).order(ord)
    buf.put('I'.toByte).put('I'.toByte).putShort(42.toShort)
      .putInt(ifdOff)
    values.foreach(buf.putFloat)
    // ModelPixelScale: (sx, sy, 0)
    buf.putDouble(scale._1).putDouble(scale._2).putDouble(0.0)
    // ModelTiepoint: raster (0,0,0) -> world (ox, oy, 0)
    buf.putDouble(0.0).putDouble(0.0).putDouble(0.0)
    buf.putDouble(origin._1).putDouble(origin._2).putDouble(0.0)
    buf.putShort(tags.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Long): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3 && count == 1) buf.putShort(value.toShort).putShort(0.toShort)
      else buf.putInt(value.toInt)
    }
    entry(256, 4, 1, width.toLong)        // ImageWidth
    entry(257, 4, 1, height.toLong)       // ImageLength
    entry(258, 3, 1, 32L)                 // BitsPerSample
    entry(259, 3, 1, 1L)                  // Compression: none
    entry(262, 3, 1, 1L)                  // Photometric: BlackIsZero
    entry(273, 4, 1, dataOff.toLong)      // StripOffsets (one strip)
    entry(277, 3, 1, 1L)                  // SamplesPerPixel
    entry(278, 4, 1, height.toLong)       // RowsPerStrip = all
    entry(279, 4, 1, dataBytes.toLong)    // StripByteCounts
    entry(339, 3, 1, 3L)                  // SampleFormat: IEEE float
    entry(33550, 12, 3, scaleOff.toLong)  // ModelPixelScale
    entry(33922, 12, 6, tieOff.toLong)    // ModelTiepoint
    buf.putInt(0)                          // next IFD: none
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
  }
}
