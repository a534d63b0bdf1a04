package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.core.DataIOError

/** S1 — pure-JVM GeoTIFF reader → the engine's raster cell-table model
  * `(band:int, x:double, y:double, value:double)` — the same model
  * `SpatialOps.rasterBufferStats` (A3) consumes. Closes the
  * reference's `open_spatial_data` raster-input leg
  * (src/data_preprocessing.py:462-492, rasterio at :470-472) for
  * everything a no-GDAL reader can honestly support:
  *
  *   - classic TIFF and BigTIFF (magic 43: 8-byte offsets, 20-byte
  *     IFD entries, LONG8 — the layout any raster past 4 GB ships
  *     in), 8/16/32-bit integer or 32/64-bit float samples, multi-band
  *     in CHUNKY (interleaved) or PLANAR (separated, band-major chunk
  *     order per TIFF6 §14) configuration;
  *   - STRIP- and TILE-organized layouts (tiles are padded to full
  *     tile size in the data — edge tiles decode whole and clip);
  *   - compression none (1), LZW (5, TIFF variant: MSB-first codes,
  *     9→12-bit early change), Deflate (8 and legacy 32946, zlib
  *     streams via java.util.zip.Inflater), PackBits (32773), and
  *     new-style JPEG (7, TechNote2) via the JDK's ImageIO codec —
  *     full-JIF chunks or abbreviated streams sharing a JPEGTables
  *     (347) segment;
  *   - horizontal-differencing predictor (2) for integer samples and
  *     the floating-point predictor (3, TechNote 3: per-row byte-plane
  *     split + byte differencing) for float samples.
  *
  * Typed errors name the one remaining boundary: old-style JPEG (6 —
  * the deprecated pre-TechNote2 flavor has no coherent spec). Same
  * documented-boundary class as the video-codec stub.
  *
  * Scale: the DRIVER parses only the IFD (KB-sized); pixel decode is
  * DISTRIBUTED — each task seeks to its own strips/tiles, inflates,
  * un-predicts and emits cells, so a raster parallelizes across chunks
  * and a raster CATALOG across files. World coordinates are pixel
  * centers from the ModelTiepoint/ModelPixelScale geotransform
  * (x = X₀ + (col+½)·sx, y = Y₀ − (row+½)·sy); a bare TIFF without geo
  * tags falls back to pixel indices.
  */
object GeoTiff extends Serializable {

  /** Parsed IFD essentials; primitives only so the decode closure
    * ships to executors. For strips `chunkW = width`, `across = 1`. */
  /** Fragmented pre-TechNote2 JPEG-6 table set (TIFF 6.0 §22 tags
    * JPEGQTables=519 / JPEGDCTables=520 / JPEGACTables=521): strips
    * hold RAW entropy-coded scan data and the tables live at file
    * offsets, so the decoder must reassemble a JIF per strip. `quant`
    * entries are the 64 zigzag quantization values; `dc`/`ac` are the
    * DHT payloads (16 count bytes + symbol values, WITHOUT the Tc/Th
    * byte). */
  private[graft] final case class OldJpeg6Tables(
      quant: Seq[Array[Byte]], dc: Seq[Array[Byte]], ac: Seq[Array[Byte]],
      restartInterval: Long)

  private final case class Meta(
      littleEndian: Boolean, width: Int, height: Int,
      bitsPerSample: Int, sampleFormat: Int, samplesPerPixel: Int,
      compression: Long, predictor: Int, planar: Boolean,
      jpegTables: Array[Byte],
      tiled: Boolean, chunkW: Int, chunkH: Int, across: Int,
      offsets: Array[Long], byteCounts: Array[Long],
      originX: Double, originY: Double, scaleX: Double, scaleY: Double,
      hasGeo: Boolean, oldJpeg6: Option[OldJpeg6Tables] = None)

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
    // chunk i covers rows [rowStart, rowStart+chunkH) × cols
    // [colStart, colStart+chunkW); strip data stops at the image edge,
    // tile data is padded to the full tile and clipped at emit.
    // Planar (separated) layout: chunks come band-major — all of band
    // 0's chunks, then band 1's, … (TIFF6 §14); each carries ONE
    // band's samples (band = -1 marks the chunky interleaved layout).
    val chunksPerBand =
      if (m.planar) m.offsets.length / m.samplesPerPixel else m.offsets.length
    val chunks = m.offsets.indices.map { i =>
      val (band, j) =
        if (m.planar) (i / chunksPerBand, i % chunksPerBand) else (-1, i)
      val colStart = (j % m.across) * m.chunkW
      val rowStart = (j / m.across) * m.chunkH
      (band, colStart, rowStart, m.offsets(i), m.byteCounts(i))
    }.filter { case (_, c, r, _, _) => c < m.width && r < m.height }
    val parts = math.max(1, math.min(chunks.length,
      spark.sparkContext.defaultParallelism))
    val meta = m // stable closure capture
    val rows = spark.sparkContext.parallelize(chunks, parts)
      .flatMap { case (band, colStart, rowStart, offset, byteCount) =>
        decodeChunk(path, meta, band, colStart, rowStart, offset, byteCount)
      }
    spark.createDataFrame(rows, cellSchema)
  }

  /** Per-task chunk decode: seek, read, decompress, un-predict, emit
    * cells. Runs on the executor — `path` must be visible cluster-wide
    * (the standard file-source contract). */
  private def decodeChunk(path: String, m: Meta, band: Int, colStart: Int,
      rowStart: Int, offset: Long, byteCount: Long): Iterator[Row] = {
    val comp =
      try {
        val raf = new java.io.RandomAccessFile(path, "r")
        try { raf.seek(offset); val a = new Array[Byte](byteCount.toInt)
          raf.readFully(a); a }
        finally raf.close()
      } catch { case e: java.io.IOException =>
        throw DataIOError(path, s"chunk read at byte $offset: ${e.getMessage}")
      }
    val bytesPer = m.bitsPerSample / 8
    // a planar chunk carries ONE band's samples; band >= 0 names it
    val spp = if (band >= 0) 1 else m.samplesPerPixel
    // strip data ends at the image edge; tile data is padded square
    val dataRows =
      if (m.tiled) m.chunkH else math.min(m.chunkH, m.height - rowStart)
    val rawSize = m.chunkW * dataRows * spp * bytesPer
    val buf =
      if (m.compression == 6L &&
          !(comp.length >= 2 && (comp(0) & 0xFF) == 0xFF &&
            (comp(1) & 0xFF) == 0xD8))
        m.oldJpeg6 match {
          // the FRAGMENTED pre-TechNote2 flavor (round 10): raw entropy
          // strips + JPEGQ/DC/ACTables (519/520/521) — reassemble one
          // JIF per strip and feed the same ImageIO path as 6/7
          case Some(t) =>
            Codecs.jpegDecode(
              Codecs.assembleOldJpeg6(t, comp, m.chunkW, dataRows),
              Array.emptyByteArray, m.chunkW, dataRows, spp, path)
          case None => throw DataIOError(path,
            "old-style JPEG-in-TIFF (compression=6): chunk at byte " +
              s"$offset is not a standalone JIF stream (no SOI marker) " +
              "and carries neither a JPEGInterchangeFormat tag nor " +
              "JPEGQ/DC/ACTables — corrupt or unsupported; re-export " +
              "as compression=7 or deflate")
        }
      else if (m.compression == 7L || m.compression == 6L)
        Codecs.jpegDecode(comp, m.jpegTables, m.chunkW, dataRows, spp, path)
      else {
        val b = Codecs.decompress(comp, m.compression, rawSize, path)
        if (b.length < rawSize)
          throw DataIOError(path, s"chunk at byte $offset decompressed to " +
            s"${b.length} bytes, need $rawSize")
        m.predictor match {
          case 2 =>
            Codecs.undoHorizontalDiff(b, m.chunkW, dataRows, spp, bytesPer,
              m.littleEndian)
            b
          case 3 =>
            Codecs.undoFloatPredictor(b, m.chunkW, dataRows, spp, bytesPer,
              m.littleEndian)
          case _ => b
        }
      }
    val bb = ByteBuffer.wrap(buf).order(
      if (m.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
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
    val emitRows = math.min(dataRows, m.height - rowStart)
    val emitCols = math.min(m.chunkW, m.width - colStart)
    for {
      r <- Iterator.range(0, emitRows)
      c <- Iterator.range(0, emitCols)
      b <- Iterator.range(0, spp)
    } yield {
      val row = rowStart + r
      val col = colStart + c
      val v = sample((r * m.chunkW + c) * spp + b)
      val (x, y) =
        if (m.hasGeo)
          (m.originX + (col + 0.5) * m.scaleX,
            m.originY - (row + 0.5) * m.scaleY)
        else (col.toDouble, row.toDouble)
      Row((if (band >= 0) band else b) + 1, x, y, v)
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
      // BigTIFF (magic 43; Adobe BigTIFF spec, public): 8-byte offsets,
      // 20-byte IFD entries, LONG8 types — the layout any raster past
      // 4 GB ships in, i.e. the actually-relevant one at 100 TB
      val bigTiff = magic == 43
      if (!bigTiff && magic != 42)
        throw DataIOError(path, s"bad TIFF magic $magic")
      val ifdOff =
        if (bigTiff) {
          val more = new Array[Byte](8); raf.readFully(more)
          val hb2 = ByteBuffer.wrap(head ++ more).order(ord)
          val offSize = hb2.getShort(4) & 0xFFFF
          if (offSize != 8) throw DataIOError(path,
            s"BigTIFF offset size $offSize unsupported (spec fixes it at 8)")
          hb2.getLong(8)
        } else hb.getInt(4) & 0xFFFFFFFFL

      val entrySize = if (bigTiff) 20 else 12
      val valueSize = if (bigTiff) 8 else 4
      raf.seek(ifdOff)
      val nEntries =
        if (bigTiff) {
          val c = new Array[Byte](8); raf.readFully(c)
          val n = ByteBuffer.wrap(c).order(ord).getLong(0)
          if (n < 0 || n > 65535) throw DataIOError(path,
            s"implausible BigTIFF IFD entry count $n")
          n.toInt
        } else {
          val c = new Array[Byte](2); raf.readFully(c)
          ByteBuffer.wrap(c).order(ord).getShort(0) & 0xFFFF
        }
      val entB = new Array[Byte](entrySize * nEntries); raf.readFully(entB)
      val eb = ByteBuffer.wrap(entB).order(ord)

      // tag -> (type, count, position of the raw value/offset bytes)
      final case class Entry(typ: Int, count: Long, at: Int)
      val entries: Map[Int, Entry] = (0 until nEntries).map { i =>
        val off = entrySize * i
        val count =
          if (bigTiff) eb.getLong(off + 4)
          else eb.getInt(off + 4) & 0xFFFFFFFFL
        (eb.getShort(off) & 0xFFFF) -> Entry(eb.getShort(off + 2) & 0xFFFF,
          count, off + (if (bigTiff) 12 else 8))
      }.toMap

      def typeSize(t: Int): Int = t match {
        case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4
        case 5 | 10 | 12 | 16 | 17 | 18 => 8 // 16/17/18 = (S)LONG8/IFD8
        case other => throw DataIOError(path, s"unknown TIFF field type $other")
      }
      def valueOffset(e: Entry): Long =
        if (bigTiff) eb.getLong(e.at) else eb.getInt(e.at) & 0xFFFFFFFFL
      // materialize a numeric-array tag value (inline or at offset)
      def longs(tag: Int): Option[Array[Long]] = entries.get(tag).map { e =>
        val total = typeSize(e.typ) * e.count.toInt
        val vb =
          if (total <= valueSize) {
            val a = new Array[Byte](valueSize)
            eb.position(e.at); eb.get(a); eb.rewind(); ByteBuffer.wrap(a).order(ord)
          } else {
            raf.seek(valueOffset(e)); val a = new Array[Byte](total)
            raf.readFully(a); ByteBuffer.wrap(a).order(ord)
          }
        (0 until e.count.toInt).map { i =>
          e.typ match {
            case 3 => (vb.getShort(i * 2) & 0xFFFF).toLong
            case 4 => vb.getInt(i * 4) & 0xFFFFFFFFL
            case 16 => vb.getLong(i * 8)
            case 1 => (vb.get(i) & 0xFF).toLong
            case other => throw DataIOError(path,
              s"tag $tag: expected integer type, got TIFF type $other")
          }
        }.toArray
      }
      def doubles(tag: Int): Option[Array[Double]] = entries.get(tag).map { e =>
        if (e.typ != 12) throw DataIOError(path,
          s"tag $tag: expected DOUBLE (12), got type ${e.typ}")
        val total = 8 * e.count.toInt
        val vb =
          if (total <= valueSize) { // BigTIFF fits ONE double inline
            val a = new Array[Byte](valueSize)
            eb.position(e.at); eb.get(a); eb.rewind(); ByteBuffer.wrap(a).order(ord)
          } else {
            raf.seek(valueOffset(e))
            val a = new Array[Byte](total); raf.readFully(a)
            ByteBuffer.wrap(a).order(ord)
          }
        (0 until e.count.toInt).map(i => vb.getDouble(i * 8)).toArray
      }
      def long1(tag: Int, dflt: => Long): Long =
        longs(tag).map(_.head).getOrElse(dflt)

      val compression = long1(259, 1L)
      compression match {
        // none/LZW/old-JPEG/JPEG/deflate/packbits — old-style JPEG (6)
        // is accepted HERE and resolved below: the common well-formed
        // flavor (one whole-image JIF stream behind
        // JPEGInterchangeFormat, or standalone-JIF strips) decodes
        // through the same ImageIO path as compression 7; the
        // fragmented pre-TechNote2 flavor (raw entropy segments needing
        // JPEGQ/DC/ACTables reassembly) stays a typed error raised at
        // chunk decode (no SOI marker).
        case 1L | 5L | 6L | 7L | 8L | 32946L | 32773L =>
        case other => throw DataIOError(path,
          s"compression=$other unsupported (none=1, LZW=5, old JPEG=6, " +
            "JPEG=7, Deflate=8/32946, PackBits=32773)")
      }
      // raw byte-array tag value (inline or at offset) — JPEGTables (347)
      def rawBytes(tag: Int): Array[Byte] = entries.get(tag).map { e =>
        val total = typeSize(e.typ) * e.count.toInt
        val a = new Array[Byte](total)
        if (total <= valueSize) { eb.position(e.at); eb.get(a); eb.rewind() }
        else { raf.seek(valueOffset(e)); raf.readFully(a) }
        a
      }.getOrElse(Array.emptyByteArray)
      val jpegTables =
        if (compression == 7L || compression == 6L) rawBytes(347)
        else Array.emptyByteArray
      val planarCfg = long1(284, 1L)
      if (planarCfg != 1L && planarCfg != 2L) throw DataIOError(path,
        s"unknown PlanarConfiguration $planarCfg (chunky=1, separated=2)")
      val planar = planarCfg == 2L

      val width = long1(256, throw DataIOError(path, "missing ImageWidth")).toInt
      val height = long1(257, throw DataIOError(path, "missing ImageLength")).toInt
      val spp = long1(277, 1L).toInt
      val bps = longs(258).map(_.toSeq).getOrElse(Seq(1L))
      if (bps.distinct.length != 1) throw DataIOError(path,
        s"heterogeneous BitsPerSample ${bps.mkString(",")} unsupported")
      val sampleFormat = long1(339, 1L).toInt
      if ((compression == 7L || compression == 6L) && bps.head != 8L)
        throw DataIOError(path,
          s"JPEG-in-TIFF requires 8-bit samples, got ${bps.head}")
      val predictor = long1(317, 1L).toInt
      if ((compression == 7L || compression == 6L) && predictor != 1)
        throw DataIOError(path,
          "predictor with JPEG compression is not meaningful — corrupt file")
      predictor match {
        case 1 => // none
        case 2 =>
          if (sampleFormat == 3) throw DataIOError(path,
            "predictor=2 (horizontal differencing) is integer-only but " +
              "SampleFormat says float — corrupt or unsupported file")
        case 3 =>
          if (sampleFormat != 3) throw DataIOError(path,
            "predictor=3 (floating-point) requires SampleFormat float — " +
              "corrupt or unsupported file")
          if (bps.head != 32L && bps.head != 64L) throw DataIOError(path,
            s"predictor=3 on ${bps.head}-bit samples unsupported " +
              "(float32/float64 only)")
        case other => throw DataIOError(path, s"unknown predictor $other")
      }

      // Old-style JPEG's well-formed flavor: ONE complete JIF stream for
      // the whole image behind JPEGInterchangeFormat (513) / -Length
      // (514) — exactly what most JPEG-6 files in legacy archives are
      // (TIFF 6.0 §22 layout; TechNote2 deprecated it in favor of 7).
      // Model it as a single whole-image chunk; the normal JPEG decode
      // path then handles it with no tables merge. Length defaults to
      // file-end when 514 is absent (a common writer omission —
      // trailing garbage past EOI is ignored by the codec).
      val oldJpegJif = compression == 6L && entries.contains(513)
      val tiled =
        (entries.contains(322) || entries.contains(324)) && !oldJpegJif
      val (chunkW, chunkH, across, offs, cnts) =
        if (oldJpegJif) {
          val off = long1(513, 0L)
          val len = longs(514).map(_.head)
            .getOrElse(raf.length() - off)
          if (off <= 0L || off >= raf.length()) throw DataIOError(path,
            s"JPEGInterchangeFormat offset $off outside file")
          (width, height, 1, Array(off), Array(len))
        } else if (tiled) {
          val tw = long1(322, throw DataIOError(path, "missing TileWidth")).toInt
          val th = long1(323, throw DataIOError(path, "missing TileLength")).toInt
          if (tw <= 0 || th <= 0 || tw % 16 != 0 || th % 16 != 0)
            throw DataIOError(path, s"bad tile size ${tw}x$th (spec: positive multiples of 16)")
          val o = longs(324).getOrElse(
            throw DataIOError(path, "missing TileOffsets"))
          val c = longs(325).getOrElse(
            throw DataIOError(path, "missing TileByteCounts"))
          val across = (width + tw - 1) / tw
          val down = (height + th - 1) / th
          val want = across * down * (if (planar) spp else 1)
          if (o.length != want) throw DataIOError(path,
            s"TileOffsets(${o.length}) != expected tile count ($want)")
          (tw, th, across, o, c)
        } else {
          val rps = long1(278, height.toLong).toInt
          val o = longs(273).getOrElse(
            throw DataIOError(path, "missing StripOffsets"))
          val c = longs(279).getOrElse(
            throw DataIOError(path, "missing StripByteCounts"))
          (width, rps, 1, o, c)
        }
      if (offs.length != cnts.length) throw DataIOError(path,
        s"chunk offsets(${offs.length}) / byte counts(${cnts.length}) mismatch")
      if (planar && offs.length % spp != 0) throw DataIOError(path,
        s"planar layout: chunk count ${offs.length} not divisible by " +
          s"SamplesPerPixel $spp")

      val scale = doubles(33550)
      val tie = doubles(33922)
      val (ox, oy, sx, sy, hasGeo) = (scale, tie) match {
        case (Some(sc), Some(tp)) if sc.length >= 2 && tp.length >= 6 =>
          // tiepoint maps raster (i,j) -> world (X,Y); normalize to the
          // (0,0) corner so pixel-center math below stays uniform
          (tp(3) - tp(0) * sc(0), tp(4) + tp(1) * sc(1), sc(0), sc(1), true)
        case _ => (0.0, 0.0, 1.0, 1.0, false)
      }
      // Fragmented pre-TechNote2 JPEG-6 (round 10 closes the last
      // JPEG-in-TIFF flavor): no JPEGInterchangeFormat stream, strips
      // are raw entropy segments, tables at the JPEGQ/DC/ACTables
      // offsets. Baseline process only (JPEGProc=1); the lossless
      // pre-TechNote2 process (14) has no JDK codec and stays a typed
      // error. Color (spp>1) would also need YCbCrSubSampling-driven
      // SOF reassembly — typed error until a real fixture exists.
      val oldJpeg6 =
        if (compression == 6L && !oldJpegJif && entries.contains(519)) {
          val proc = long1(512, 1L)
          if (proc != 1L) throw DataIOError(path,
            s"old-style JPEG-6 JPEGProc=$proc unsupported (baseline=1 " +
              "only; the lossless pre-TechNote2 process has no JDK codec)")
          if (spp != 1) throw DataIOError(path,
            s"fragmented JPEG-6 with SamplesPerPixel=$spp unsupported " +
              "(grayscale only — color needs YCbCr SOF reassembly)")
          def tableAt(off: Long, quantTable: Boolean): Array[Byte] = {
            if (off <= 0 || off >= raf.length()) throw DataIOError(path,
              s"JPEG-6 table offset $off outside file")
            raf.seek(off)
            if (quantTable) {
              val a = new Array[Byte](64); raf.readFully(a); a
            } else {
              val bits = new Array[Byte](16); raf.readFully(bits)
              val n = bits.map(_ & 0xFF).sum
              if (n > 256) throw DataIOError(path,
                s"JPEG-6 Huffman table at $off declares $n symbols (>256)")
              val vals = new Array[Byte](n); raf.readFully(vals)
              bits ++ vals
            }
          }
          val qOffs = longs(519).getOrElse(Array.empty[Long])
          val dcOffs = longs(520).getOrElse(throw DataIOError(path,
            "fragmented JPEG-6: JPEGQTables present but JPEGDCTables missing"))
          val acOffs = longs(521).getOrElse(throw DataIOError(path,
            "fragmented JPEG-6: JPEGQTables present but JPEGACTables missing"))
          Some(OldJpeg6Tables(
            qOffs.toSeq.map(tableAt(_, quantTable = true)),
            dcOffs.toSeq.map(tableAt(_, quantTable = false)),
            acOffs.toSeq.map(tableAt(_, quantTable = false)),
            long1(515, 0L)))
        } else None
      Meta(little, width, height, bps.head.toInt, sampleFormat, spp,
        compression, predictor, planar, jpegTables,
        tiled, chunkW, chunkH, across,
        offs, cnts, ox, oy, sx, sy, hasGeo, oldJpeg6)
    } finally raf.close()
  }

  // ---- codecs (shared by reader and writer; executor-side) -----------

  private[graft] object Codecs {
    /** Decompress one chunk's bytes. `rawSize` is the exact decoded
      * size the layout implies — LZW/PackBits streams carry no length,
      * so the caller-side expectation IS the output bound. */
    def decompress(in: Array[Byte], compression: Long, rawSize: Int,
        path: String): Array[Byte] = compression match {
      case 1L => in
      case 5L => lzwDecode(in, rawSize, path)
      case 8L | 32946L => inflate(in, rawSize, path)
      case 32773L => packBitsDecode(in, rawSize, path)
      case other => throw DataIOError(path, s"compression=$other unsupported")
    }

    def inflate(in: Array[Byte], rawSize: Int, path: String): Array[Byte] = {
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(in)
        val out = new Array[Byte](rawSize)
        var pos = 0
        while (pos < rawSize && !inf.finished()) {
          val n = inf.inflate(out, pos, rawSize - pos)
          if (n == 0 && inf.needsInput())
            throw DataIOError(path, "truncated deflate stream")
          pos += n
        }
        if (pos < rawSize)
          throw DataIOError(path, s"deflate stream ended at $pos of $rawSize bytes")
        out
      } catch { case e: java.util.zip.DataFormatException =>
        throw DataIOError(path, s"corrupt deflate stream: ${e.getMessage}")
      } finally inf.end()
    }

    def packBitsDecode(in: Array[Byte], rawSize: Int,
        path: String): Array[Byte] = {
      val out = new Array[Byte](rawSize)
      var ip = 0; var op = 0
      while (op < rawSize && ip < in.length) {
        val n = in(ip); ip += 1
        if (n >= 0) { // copy n+1 literals
          val cnt = n + 1
          if (ip + cnt > in.length || op + cnt > rawSize)
            throw DataIOError(path, "corrupt PackBits stream (literal overrun)")
          System.arraycopy(in, ip, out, op, cnt); ip += cnt; op += cnt
        } else if (n != -128) { // repeat next byte 1-n times
          val cnt = 1 - n
          if (ip >= in.length || op + cnt > rawSize)
            throw DataIOError(path, "corrupt PackBits stream (run overrun)")
          java.util.Arrays.fill(out, op, op + cnt, in(ip)); ip += 1; op += cnt
        } // -128 = noop
      }
      if (op < rawSize)
        throw DataIOError(path, s"PackBits stream ended at $op of $rawSize bytes")
      out
    }

    /** TIFF-variant LZW decode: MSB-first bit packing, ClearCode 256,
      * EOI 257, code width 9→12 with EARLY CHANGE (the width grows when
      * the next table slot reaches 2^w − 1, one code earlier than the
      * GIF rule — TIFF6 §13 / the libtiff convention). */
    def lzwDecode(in: Array[Byte], rawSize: Int, path: String): Array[Byte] = {
      val Clear = 256; val Eoi = 257
      val out = new Array[Byte](rawSize)
      var op = 0
      val prefix = new Array[Int](4096)
      val suffix = new Array[Byte](4096)
      val stack = new Array[Byte](4096)
      var nextCode = 258; var codeBits = 9
      var bitBuf = 0L; var bitCnt = 0; var ip = 0
      def readCode(): Int = {
        while (bitCnt < codeBits) {
          if (ip >= in.length) return Eoi // tolerate missing EOI at end
          bitBuf = (bitBuf << 8) | (in(ip) & 0xFF); ip += 1; bitCnt += 8
        }
        bitCnt -= codeBits
        ((bitBuf >>> bitCnt) & ((1 << codeBits) - 1)).toInt
      }
      /** write the string for `code`; returns its FIRST byte */
      def emit(code: Int): Byte = {
        var sp = 0; var c = code
        while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        val first = c.toByte
        if (op >= rawSize) throw DataIOError(path, "LZW output overrun")
        out(op) = first; op += 1
        while (sp > 0) {
          sp -= 1
          if (op >= rawSize) throw DataIOError(path, "LZW output overrun")
          out(op) = stack(sp); op += 1
        }
        first
      }
      var old = -1
      var done = false
      while (!done && op < rawSize) {
        val code = readCode()
        if (code == Eoi) done = true
        else if (code == Clear) { nextCode = 258; codeBits = 9; old = -1 }
        else {
          if (old < 0) {
            // first code after (implicit) clear must be a literal
            if (code > 255) throw DataIOError(path,
              s"corrupt LZW stream: non-literal first code $code")
            emit(code)
          } else {
            if (code < nextCode) {
              val first = emit(code)
              if (nextCode < 4096) {
                prefix(nextCode) = old; suffix(nextCode) = first; nextCode += 1
              }
            } else if (code == nextCode && nextCode < 4096) {
              // KwKwK case: string(old) + firstChar(old)
              prefix(nextCode) = old
              var c = old
              while (c >= 258) c = prefix(c)
              suffix(nextCode) = c.toByte
              nextCode += 1
              emit(code)
            } else throw DataIOError(path,
              s"corrupt LZW stream: code $code beyond table ($nextCode)")
          }
          old = code
          // EARLY CHANGE, decoder side: the encoder's table runs ONE
          // entry ahead of ours (it adds the entry for a code before
          // emitting it; we can only build it after reading the NEXT
          // code), so where the encoder widens at 2^w − 1 we must
          // widen at 2^w − 2 to read the next code at its width (the
          // libtiff MAXCODE(n)−1 convention).
          if (nextCode == (1 << codeBits) - 2 && codeBits < 12) codeBits += 1
        }
      }
      if (op < rawSize)
        throw DataIOError(path, s"LZW stream ended at $op of $rawSize bytes")
      out
    }

    /** TIFF-variant LZW encode (writer/fixture side; symmetric early
      * change, leading ClearCode, table reset at 4094 per libtiff). */
    def lzwEncode(in: Array[Byte]): Array[Byte] = {
      val outBuf = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
      var bitBuf = 0L; var bitCnt = 0; var codeBits = 9
      def put(code: Int): Unit = {
        bitBuf = (bitBuf << codeBits) | code.toLong; bitCnt += codeBits
        while (bitCnt >= 8) {
          bitCnt -= 8; outBuf.write(((bitBuf >>> bitCnt) & 0xFF).toInt)
        }
      }
      val table = new java.util.HashMap[Int, Int](8192)
      var nextCode = 258
      def reset(): Unit = { table.clear(); nextCode = 258; codeBits = 9 }
      put(256) // leading Clear
      var w = -1
      in.foreach { byte =>
        val c = byte & 0xFF
        if (w < 0) w = c
        else {
          val key = (w << 8) | c
          val hit = table.getOrDefault(key, -1)
          if (hit >= 0) w = hit
          else {
            put(w)
            table.put(key, nextCode); nextCode += 1
            // EARLY CHANGE: width for the NEXT code grows as soon as
            // the next free slot reaches 2^w - 1 (mirrors the decoder)
            if (nextCode == (1 << codeBits) - 1 && codeBits < 12) codeBits += 1
            if (nextCode == 4094) { put(256); reset() }
            w = c
          }
        }
      }
      if (w >= 0) put(w)
      put(257) // EOI
      if (bitCnt > 0) outBuf.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
      outBuf.toByteArray
    }

    def deflate(in: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      try {
        d.setInput(in); d.finish()
        val buf = new Array[Byte](math.max(64, in.length + 64))
        val out = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        out.toByteArray
      } finally d.end()
    }

    /** PackBits encode, one row at a time per the TIFF6 recommendation
      * (packets never cross row boundaries). `rowBytes` divides
      * `in.length`. */
    def packBitsEncode(in: Array[Byte], rowBytes: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(in.length + in.length / 64 + 16)
      var rowStart = 0
      while (rowStart < in.length) {
        val end = rowStart + rowBytes
        var i = rowStart
        while (i < end) {
          // find run length at i
          var run = 1
          while (i + run < end && run < 128 && in(i + run) == in(i)) run += 1
          if (run >= 3) {
            out.write(1 - run); out.write(in(i)); i += run
          } else {
            // literal stretch: until a >=3 run starts or 128 bytes
            var j = i
            var lit = 0
            var stop = false
            while (!stop && j < end && lit < 128) {
              var r = 1
              while (j + r < end && r < 3 && in(j + r) == in(j)) r += 1
              if (r >= 3) stop = true
              else { j += 1; lit += 1 }
            }
            out.write(lit - 1)
            out.write(in, i, lit)
            i += lit
          }
        }
        rowStart = end
      }
      out.toByteArray
    }

    /** Decode one JPEG-compressed chunk (compression 7, TechNote2
      * "new-style") via the JDK's ImageIO JPEG codec. `tables` is the
      * JPEGTables tag (347) content — an abbreviated tables-only
      * stream (SOI, DQT/DHT…, EOI) shared by every chunk; empty when
      * each chunk carries a complete JIF. Emits chunky 8-bit samples.
      * JPEG pads to MCU multiples internally, so the decoded image may
      * exceed the expected dims — extra rows/cols are clipped. */
    def jpegDecode(chunk: Array[Byte], tables: Array[Byte], w: Int,
        h: Int, spp: Int, path: String): Array[Byte] = {
      val stream =
        if (tables.length >= 4) mergeAbbreviated(tables, chunk) else chunk
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(stream))
      if (img == null)
        throw DataIOError(path, "JPEG chunk failed to decode")
      if (img.getWidth < w || img.getHeight < h)
        throw DataIOError(path, s"JPEG chunk ${img.getWidth}x" +
          s"${img.getHeight} smaller than the layout's ${w}x$h")
      val raster = img.getRaster
      if (raster.getNumBands != spp)
        throw DataIOError(path, s"JPEG chunk decodes to " +
          s"${raster.getNumBands} band(s), SamplesPerPixel says $spp")
      val out = new Array[Byte](w * h * spp)
      var i = 0; var r = 0
      while (r < h) {
        var c = 0
        while (c < w) {
          var b = 0
          while (b < spp) {
            out(i) = raster.getSample(c, r, b).toByte; i += 1; b += 1
          }
          c += 1
        }
        r += 1
      }
      out
    }

    /** Reassemble a complete baseline JIF from a fragmented
      * pre-TechNote2 JPEG-6 strip (TIFF 6.0 §22): SOI, DQT per quant
      * table, DHT per DC/AC table, optional DRI, a grayscale SOF0
      * sized to THIS strip, SOS, the raw entropy bytes, EOI. The
      * entropy data was produced against these exact tables by the
      * original writer, so the rebuilt stream decodes bit-identically
      * to what a §22-aware native reader produces. */
    def assembleOldJpeg6(t: OldJpeg6Tables, entropy: Array[Byte],
        w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(entropy.length + 512)
      def seg(marker: Int, payload: Array[Byte]): Unit = {
        out.write(0xFF); out.write(marker)
        val len = payload.length + 2
        out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
        out.write(payload, 0, payload.length)
      }
      out.write(0xFF); out.write(0xD8) // SOI
      t.quant.zipWithIndex.foreach { case (q, i) =>
        seg(0xDB, (i & 0x0F).toByte +: q) // DQT: Pq=0 (8-bit), Tq=i
      }
      t.dc.zipWithIndex.foreach { case (d, i) =>
        seg(0xC4, (i & 0x0F).toByte +: d) // DHT: Tc=0, Th=i
      }
      t.ac.zipWithIndex.foreach { case (a, i) =>
        seg(0xC4, (0x10 | (i & 0x0F)).toByte +: a) // DHT: Tc=1, Th=i
      }
      if (t.restartInterval > 0)
        seg(0xDD, Array((t.restartInterval >> 8).toByte,
          t.restartInterval.toByte)) // DRI
      // SOF0: precision 8, strip dims, 1 grayscale component (id 1,
      // H=V=1, quant table 0)
      seg(0xC0, Array(8.toByte,
        ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
        ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
        1.toByte, 1.toByte, 0x11.toByte, 0.toByte))
      // SOS: 1 component (id 1, DC table 0 / AC table 0), spectral 0..63
      seg(0xDA, Array(1.toByte, 1.toByte, 0x00.toByte,
        0.toByte, 63.toByte, 0.toByte))
      out.write(entropy, 0, entropy.length)
      out.write(0xFF); out.write(0xD9) // EOI
      out.toByteArray
    }

    /** Tables-only stream (SOI … EOI) + abbreviated image stream
      * (SOI …) → one complete JIF: drop the tables' EOI and the
      * image's SOI, concatenate. */
    def mergeAbbreviated(tables: Array[Byte],
        image: Array[Byte]): Array[Byte] = {
      val t = if (tables.length >= 2 &&
          (tables(tables.length - 2) & 0xFF) == 0xFF &&
          (tables(tables.length - 1) & 0xFF) == 0xD9)
        tables.dropRight(2) else tables
      val i = if (image.length >= 2 && (image(0) & 0xFF) == 0xFF &&
          (image(1) & 0xFF) == 0xD8) image.drop(2) else image
      t ++ i
    }

    /** Encode one grayscale 8-bit chunk as a complete JIF (writer/
      * fixture side; quality 0.95 keeps smooth test ramps within ±2). */
    def jpegEncodeGray(d: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val wr = img.getRaster
      var idx = 0; var r = 0
      while (r < h) {
        var c = 0
        while (c < w) { wr.setSample(c, r, 0, d(idx) & 0xFF); idx += 1; c += 1 }
        r += 1
      }
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(0.95f)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      } finally { ios.close(); writer.dispose() }
      bos.toByteArray
    }

    /** Disassemble a complete grayscale baseline JIF into the
      * fragmented-JPEG-6 pieces: (quant tables by Tq, DC Huffman
      * payloads by Th, AC Huffman payloads by Th, raw entropy bytes) —
      * the writer-side inverse of [[assembleOldJpeg6]], used to build
      * §22 fixtures from the JDK encoder's output. */
    def jifExtractOldJpeg6(jif: Array[Byte])
        : (Seq[Array[Byte]], Seq[Array[Byte]], Seq[Array[Byte]], Array[Byte]) = {
      require(jif.length >= 4 && (jif(0) & 0xFF) == 0xFF &&
        (jif(1) & 0xFF) == 0xD8, "not a JIF stream")
      val quant = scala.collection.mutable.SortedMap.empty[Int, Array[Byte]]
      val dc = scala.collection.mutable.SortedMap.empty[Int, Array[Byte]]
      val ac = scala.collection.mutable.SortedMap.empty[Int, Array[Byte]]
      var entropy: Array[Byte] = null
      var p = 2
      while (entropy == null && p + 4 <= jif.length) {
        require((jif(p) & 0xFF) == 0xFF, s"bad JIF marker at $p")
        val marker = jif(p + 1) & 0xFF
        val len = (((jif(p + 2) & 0xFF) << 8) | (jif(p + 3) & 0xFF)) + 2
        marker match {
          case 0xDB => // DQT: repeated [PqTq, 64 (8-bit) values]
            var q = p + 4
            while (q < p + len) {
              val pq = (jif(q) & 0xF0) >> 4; val tq = jif(q) & 0x0F
              require(pq == 0, s"16-bit quant table at $q unsupported")
              quant(tq) = jif.slice(q + 1, q + 65)
              q += 65
            }
          case 0xC4 => // DHT: repeated [TcTh, 16 counts, values]
            var q = p + 4
            while (q < p + len) {
              val tc = (jif(q) & 0xF0) >> 4; val th = jif(q) & 0x0F
              val n = (1 to 16).map(i => jif(q + i) & 0xFF).sum
              val payload = jif.slice(q + 1, q + 17 + n)
              if (tc == 0) dc(th) = payload else ac(th) = payload
              q += 17 + n
            }
          case 0xDA => // SOS header, then entropy until the trailing EOI
            val end =
              if ((jif(jif.length - 2) & 0xFF) == 0xFF &&
                (jif(jif.length - 1) & 0xFF) == 0xD9) jif.length - 2
              else jif.length
            entropy = jif.slice(p + len, end)
          case _ => // SOF/APP/COM — not needed for reassembly
        }
        if (entropy == null) p += len
      }
      require(entropy != null, "no SOS segment in JIF")
      (quant.values.toSeq, dc.values.toSeq, ac.values.toSeq, entropy)
    }

    /** Split a complete JIF into (DQT/DHT table segments, the stream
      * with those segments removed) — the writer's JPEGTables (347)
      * surgery. Entropy data from SOS onward passes through verbatim. */
    def jifStripTables(jif: Array[Byte]): (Array[Byte], Array[Byte]) = {
      require(jif.length >= 4 && (jif(0) & 0xFF) == 0xFF &&
        (jif(1) & 0xFF) == 0xD8, "not a JIF stream")
      val tables = new java.io.ByteArrayOutputStream()
      val rest = new java.io.ByteArrayOutputStream()
      rest.write(0xFF); rest.write(0xD8)
      var p = 2
      var done = false
      while (!done && p + 4 <= jif.length) {
        if ((jif(p) & 0xFF) != 0xFF)
          throw new IllegalStateException(s"bad JIF marker at $p")
        val marker = jif(p + 1) & 0xFF
        if (marker == 0xDA) { // SOS: segment + entropy data to the end
          rest.write(jif, p, jif.length - p); done = true
        } else {
          val len = (((jif(p + 2) & 0xFF) << 8) | (jif(p + 3) & 0xFF)) + 2
          val dst = if (marker == 0xDB || marker == 0xC4) tables else rest
          dst.write(jif, p, len)
          p += len
        }
      }
      (tables.toByteArray, rest.toByteArray)
    }

    /** In-place horizontal-differencing UNDO (predictor 2): within each
      * row, each pixel's sample adds the previous pixel's same-channel
      * sample, wrapping at the sample width. */
    def undoHorizontalDiff(buf: Array[Byte], w: Int, h: Int, spp: Int,
        bytesPer: Int, littleEndian: Boolean): Unit = {
      val ord = if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
      val bb = ByteBuffer.wrap(buf).order(ord)
      val rowSamples = w * spp
      var r = 0
      while (r < h) {
        val base = r * rowSamples
        var i = spp
        while (i < rowSamples) {
          val at = (base + i) * bytesPer
          val prev = (base + i - spp) * bytesPer
          bytesPer match {
            case 1 => buf(at) = (buf(at) + buf(prev)).toByte
            case 2 => bb.putShort(at, (bb.getShort(at) + bb.getShort(prev)).toShort)
            case 4 => bb.putInt(at, bb.getInt(at) + bb.getInt(prev))
            case _ => throw new IllegalStateException(s"predictor on $bytesPer-byte samples")
          }
          i += 1
        }
        r += 1
      }
    }

    /** Floating-point predictor (3, TIFF Technical Note 3) UNDO. The
      * encoded row is (a) byte-plane split — all most-significant bytes
      * of the row's samples first, then the next plane, LSB plane last
      * (big-endian plane order regardless of file byte order) — and
      * (b) byte-wise horizontally differenced with stride = samples
      * per pixel. Undo accumulates, then re-interleaves planes into
      * sample order in the FILE's byte order (the order the caller's
      * ByteBuffer reads). Returns a new array; `buf` is scratched. */
    def undoFloatPredictor(buf: Array[Byte], w: Int, h: Int, spp: Int,
        bytesPer: Int, littleEndian: Boolean): Array[Byte] = {
      val rowBytes = w * spp * bytesPer
      val wc = w * spp
      val out = new Array[Byte](buf.length)
      var r = 0
      while (r < h) {
        val base = r * rowBytes
        var i = spp
        while (i < rowBytes) {
          buf(base + i) = (buf(base + i) + buf(base + i - spp)).toByte
          i += 1
        }
        var s = 0
        while (s < wc) {
          var b = 0
          while (b < bytesPer) {
            val dstByte = if (littleEndian) bytesPer - 1 - b else b
            out(base + s * bytesPer + dstByte) = buf(base + b * wc + s)
            b += 1
          }
          s += 1
        }
        r += 1
      }
      out
    }

    /** Floating-point predictor APPLY (writer side; raw bytes are the
      * writer's little-endian layout). Returns a new array. */
    def applyFloatPredictor(raw: Array[Byte], w: Int, h: Int, spp: Int,
        bytesPer: Int): Array[Byte] = {
      val rowBytes = w * spp * bytesPer
      val wc = w * spp
      val out = new Array[Byte](raw.length)
      var r = 0
      while (r < h) {
        val base = r * rowBytes
        var s = 0
        while (s < wc) {
          var b = 0
          while (b < bytesPer) {
            // plane 0 = MSB = little-endian raw byte (bytesPer-1)
            out(base + b * wc + s) = raw(base + s * bytesPer + (bytesPer - 1 - b))
            b += 1
          }
          s += 1
        }
        var i = rowBytes - 1
        while (i >= spp) {
          out(base + i) = (out(base + i) - out(base + i - spp)).toByte
          i -= 1
        }
        r += 1
      }
      out
    }

    /** In-place horizontal-differencing APPLY (writer side). */
    def applyHorizontalDiff(buf: Array[Byte], w: Int, h: Int, spp: Int,
        bytesPer: Int, littleEndian: Boolean): Unit = {
      val ord = if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
      val bb = ByteBuffer.wrap(buf).order(ord)
      val rowSamples = w * spp
      var r = 0
      while (r < h) {
        val base = r * rowSamples
        var i = rowSamples - 1
        while (i >= spp) {
          val at = (base + i) * bytesPer
          val prev = (base + i - spp) * bytesPer
          bytesPer match {
            case 1 => buf(at) = (buf(at) - buf(prev)).toByte
            case 2 => bb.putShort(at, (bb.getShort(at) - bb.getShort(prev)).toShort)
            case 4 => bb.putInt(at, bb.getInt(at) - bb.getInt(prev))
            case _ => throw new IllegalStateException(s"predictor on $bytesPer-byte samples")
          }
          i -= 1
        }
        r += 1
      }
    }
  }

  // ---- minimal writer (fixtures + raster sink) -----------------------

  /** Compression selector for the writers. */
  val CompNone = 1L; val CompLzw = 5L; val CompJpeg = 7L
  val CompDeflate = 8L; val CompPackBits = 32773L

  /** Write a single-band float32 GeoTIFF from a row-major value array —
    * the symmetric fixture/sink half of [[readCells]]. `origin` is the
    * world coordinate of the raster's top-left CORNER; `scale` the
    * pixel size (sx, sy). Strip-organized with `rowsPerStrip` (default:
    * one strip), or TILE-organized when `tile` is given (tile dims must
    * be multiples of 16; edge tiles are zero-padded per spec).
    * `compression`: [[CompNone]]/[[CompLzw]]/[[CompDeflate]]/
    * [[CompPackBits]]. `predictor = 3` applies the TechNote-3
    * floating-point predictor (byte-plane split + byte differencing)
    * before compression — the pairing GDAL emits for float rasters. */
  def writeFloat(path: String, width: Int, height: Int,
      values: Array[Float], origin: (Double, Double),
      scale: (Double, Double), compression: Long = CompNone,
      rowsPerStrip: Int = 0, tile: Option[(Int, Int)] = None,
      predictor: Int = 1): Unit = {
    require(values.length == width * height,
      s"values.length ${values.length} != $width*$height")
    val raw = ByteBuffer.allocate(values.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(raw.putFloat)
    writeRaster(path, width, height, raw.array(), bytesPer = 4,
      bitsPerSample = 32, sampleFormat = 3, origin, scale, compression,
      rowsPerStrip, tile, predictor)
  }

  /** Write a single-band unsigned-16-bit GeoTIFF; `predictor = 2`
    * applies horizontal differencing before compression (the common
    * LZW/Deflate pairing for integer rasters). */
  def writeGray16(path: String, width: Int, height: Int,
      values: Array[Int], origin: (Double, Double),
      scale: (Double, Double), compression: Long = CompNone,
      rowsPerStrip: Int = 0, tile: Option[(Int, Int)] = None,
      predictor: Int = 1): Unit = {
    require(values.length == width * height,
      s"values.length ${values.length} != $width*$height")
    require(values.forall(v => v >= 0 && v <= 0xFFFF), "values must fit uint16")
    val raw = ByteBuffer.allocate(values.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(v => raw.putShort(v.toShort))
    writeRaster(path, width, height, raw.array(), bytesPer = 2,
      bitsPerSample = 16, sampleFormat = 1, origin, scale, compression,
      rowsPerStrip, tile, predictor)
  }

  /** Write a single-band 8-bit GRAYSCALE JPEG-compressed GeoTIFF
    * (compression 7) — the fixture/round-trip half of the JPEG decode
    * path. LOSSY by nature: values survive within codec error (±2 on
    * smooth content at quality 0.95), unlike every other writer here.
    * `abbreviatedTables = true` moves the shared DQT/DHT segments into
    * the JPEGTables tag (347) and strips them from each chunk — the
    * layout GDAL emits. */
  def writeGray8Jpeg(path: String, width: Int, height: Int,
      values: Array[Int], origin: (Double, Double),
      scale: (Double, Double), rowsPerStrip: Int = 0,
      abbreviatedTables: Boolean = false): Unit = {
    require(values.length == width * height,
      s"values.length ${values.length} != $width*$height")
    require(values.forall(v => v >= 0 && v <= 0xFF), "values must fit uint8")
    writeRaster(path, width, height, values.map(_.toByte), bytesPer = 1,
      bitsPerSample = 8, sampleFormat = 1, origin, scale, CompJpeg,
      rowsPerStrip, tile = None, predictor = 1,
      jpegAbbrev = abbreviatedTables)
  }

  /** Write a single-band 8-bit grayscale OLD-STYLE JPEG GeoTIFF
    * (compression 6, TIFF 6.0 §22): ONE complete whole-image JIF
    * stream behind JPEGInterchangeFormat (513) / -Length (514) — the
    * well-formed flavor legacy archives actually contain, and the
    * reader's round-trip fixture for the compression-6 path. Same
    * codec (and the same lossiness) as [[writeGray8Jpeg]]; the two
    * files carry byte-identical entropy streams, so their decodes are
    * bit-equal — the property q479 certifies. */
  def writeGray8JpegOldStyle(path: String, width: Int, height: Int,
      values: Array[Int], origin: (Double, Double),
      scale: (Double, Double)): Unit = {
    require(values.length == width * height,
      s"values.length ${values.length} != $width*$height")
    require(values.forall(v => v >= 0 && v <= 0xFF), "values must fit uint8")
    val jif = Codecs.jpegEncodeGray(values.map(_.toByte), width, height)
    val dataOff = 8
    val scaleOff = dataOff + jif.length
    val tieOff = scaleOff + 24
    val ifdOff = tieOff + 48
    val nTags = 11
    val buf = ByteBuffer.allocate(ifdOff + 2 + 12 * nTags + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42.toShort).putInt(ifdOff)
    buf.put(jif)
    buf.putDouble(scale._1).putDouble(scale._2).putDouble(0.0)
    buf.putDouble(0.0).putDouble(0.0).putDouble(0.0)
    buf.putDouble(origin._1).putDouble(origin._2).putDouble(0.0)
    buf.putShort(nTags.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Long): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3 && count == 1) buf.putShort(value.toShort).putShort(0.toShort)
      else buf.putInt(value.toInt)
    }
    entry(256, 4, 1, width.toLong)            // ImageWidth
    entry(257, 4, 1, height.toLong)           // ImageLength
    entry(258, 3, 1, 8L)                      // BitsPerSample
    entry(259, 3, 1, 6L)                      // Compression: old JPEG
    entry(262, 3, 1, 1L)                      // Photometric: BlackIsZero
    entry(277, 3, 1, 1L)                      // SamplesPerPixel
    entry(339, 3, 1, 1L)                      // SampleFormat
    entry(513, 4, 1, dataOff.toLong)          // JPEGInterchangeFormat
    entry(514, 4, 1, jif.length.toLong)       // JPEGInterchangeFormatLength
    entry(33550, 12, 3, scaleOff.toLong)      // ModelPixelScale
    entry(33922, 12, 6, tieOff.toLong)        // ModelTiepoint
    buf.putInt(0)                             // next IFD: none
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
  }

  /** Write a single-band 8-bit grayscale FRAGMENTED pre-TechNote2
    * JPEG-6 GeoTIFF (TIFF 6.0 §22 deprecated layout): strips carry RAW
    * entropy-coded data (no JIF markers) and the quantization/Huffman
    * tables sit behind JPEGQTables (519) / JPEGDCTables (520) /
    * JPEGACTables (521) file offsets, JPEGProc=1. Each strip encodes
    * through the SAME JDK codec as [[writeGray8Jpeg]], then the JIF is
    * disassembled — so a compression-7 file of the same pixels carries
    * byte-identical entropy streams and the two decodes are bit-equal
    * (the q492 property). All strips must share one table set (the JDK
    * encoder emits its fixed tables for a given quality, so they do). */
  def writeGray8JpegFragmented(path: String, width: Int, height: Int,
      values: Array[Int], origin: (Double, Double),
      scale: (Double, Double), rowsPerStrip: Int): Unit = {
    require(values.length == width * height,
      s"values.length ${values.length} != $width*$height")
    require(values.forall(v => v >= 0 && v <= 0xFF), "values must fit uint8")
    require(rowsPerStrip >= 1, "rowsPerStrip >= 1")
    val raw = values.map(_.toByte)
    val strips = (0 until height by rowsPerStrip).map { r0 =>
      val rows = math.min(rowsPerStrip, height - r0)
      val jif = Codecs.jpegEncodeGray(
        java.util.Arrays.copyOfRange(raw, r0 * width, (r0 + rows) * width),
        width, rows)
      Codecs.jifExtractOldJpeg6(jif)
    }
    val (quant, dc, ac, _) = strips.head
    require(quant.size == 1 && dc.size == 1 && ac.size == 1,
      "grayscale JIF must carry exactly one table of each kind")
    strips.tail.foreach { case (q2, d2, a2, _) =>
      require(q2.head.sameElements(quant.head) &&
        d2.head.sameElements(dc.head) && a2.head.sameElements(ac.head),
        "strips encoded with different tables — cannot share 519/520/521")
    }
    val entropies = strips.map(_._4)
    val n = entropies.size

    val header = 8
    val stripOffs = entropies.scanLeft(header.toLong)(_ + _.length).init
    val qOff = stripOffs.last + entropies.last.length
    val dcOff = qOff + 64
    val acOff = dcOff + dc.head.length
    val arrOff = acOff + ac.head.length // strip offset/count arrays (if n>1)
    val arrBytes = if (n > 1) n * 8 else 0
    val scaleOff = arrOff + arrBytes
    val tieOff = scaleOff + 24
    val ifdOff = tieOff + 48
    val nTags = 16
    val buf = java.nio.ByteBuffer
      .allocate((ifdOff + 2 + 12 * nTags + 4).toInt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42.toShort)
      .putInt(ifdOff.toInt)
    entropies.foreach(buf.put)
    buf.put(quant.head).put(dc.head).put(ac.head)
    if (n > 1) {
      stripOffs.foreach(o => buf.putInt(o.toInt))
      entropies.foreach(e => buf.putInt(e.length))
    }
    buf.putDouble(scale._1).putDouble(scale._2).putDouble(0.0)
    buf.putDouble(0.0).putDouble(0.0).putDouble(0.0)
    buf.putDouble(origin._1).putDouble(origin._2).putDouble(0.0)
    buf.putShort(nTags.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Long): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      typ match {
        case 3 => buf.putShort(value.toShort).putShort(0.toShort)
        case _ => buf.putInt(value.toInt)
      }
    }
    entry(256, 4, 1, width.toLong)   // ImageWidth
    entry(257, 4, 1, height.toLong)  // ImageLength
    entry(258, 3, 1, 8L)             // BitsPerSample
    entry(259, 3, 1, 6L)             // Compression: old-style JPEG
    entry(262, 3, 1, 1L)             // Photometric: BlackIsZero
    if (n == 1) entry(273, 4, 1, stripOffs.head)
    else entry(273, 4, n, arrOff)    // StripOffsets
    entry(277, 3, 1, 1L)             // SamplesPerPixel
    entry(278, 4, 1, rowsPerStrip.toLong) // RowsPerStrip
    if (n == 1) entry(279, 4, 1, entropies.head.length.toLong)
    else entry(279, 4, n, arrOff + n * 4L) // StripByteCounts
    entry(339, 3, 1, 1L)             // SampleFormat
    entry(512, 3, 1, 1L)             // JPEGProc: baseline
    entry(519, 4, 1, qOff)           // JPEGQTables
    entry(520, 4, 1, dcOff)          // JPEGDCTables
    entry(521, 4, 1, acOff)          // JPEGACTables
    entry(33550, 12, 3, scaleOff)    // ModelPixelScale
    entry(33922, 12, 6, tieOff)      // ModelTiepoint
    buf.putInt(0)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
  }

  private def writeRaster(path: String, width: Int, height: Int,
      raw: Array[Byte], bytesPer: Int, bitsPerSample: Int,
      sampleFormat: Int, origin: (Double, Double), scale: (Double, Double),
      compression: Long, rowsPerStrip: Int, tile: Option[(Int, Int)],
      predictor: Int, jpegAbbrev: Boolean = false): Unit = {
    require(predictor == 1 || (predictor == 2 && sampleFormat != 3) ||
      (predictor == 3 && sampleFormat == 3),
      "predictor 2 is integer-only; predictor 3 is float-only")
    val rowBytes = width * bytesPer

    // chunk the raw image: strips slice rows; tiles copy w×h windows
    // zero-padded to the full tile
    final case class Chunk(data: Array[Byte], w: Int, h: Int)
    val chunks: IndexedSeq[Chunk] = tile match {
      case Some((tw, th)) =>
        require(tw > 0 && th > 0 && tw % 16 == 0 && th % 16 == 0,
          "tile dims must be positive multiples of 16")
        val across = (width + tw - 1) / tw
        val down = (height + th - 1) / th
        for {
          tr <- 0 until down
          tc <- 0 until across
        } yield {
          val data = new Array[Byte](tw * th * bytesPer)
          val copyRows = math.min(th, height - tr * th)
          val copyCols = math.min(tw, width - tc * tw)
          (0 until copyRows).foreach { r =>
            System.arraycopy(raw,
              ((tr * th + r) * width + tc * tw) * bytesPer,
              data, r * tw * bytesPer, copyCols * bytesPer)
          }
          Chunk(data, tw, th)
        }
      case None =>
        val rps = if (rowsPerStrip <= 0) height else rowsPerStrip
        (0 until height by rps).map { r0 =>
          val n = math.min(rps, height - r0)
          Chunk(java.util.Arrays.copyOfRange(raw, r0 * rowBytes,
            (r0 + n) * rowBytes), width, n)
        }
    }
    val encoded: IndexedSeq[Array[Byte]] = chunks.map { ch =>
      var d = ch.data.clone()
      if (predictor == 2)
        Codecs.applyHorizontalDiff(d, ch.w, ch.h, 1, bytesPer,
          littleEndian = true)
      else if (predictor == 3)
        d = Codecs.applyFloatPredictor(d, ch.w, ch.h, 1, bytesPer)
      compression match {
        case 1L => d
        case 5L => Codecs.lzwEncode(d)
        case 7L => Codecs.jpegEncodeGray(d, ch.w, ch.h)
        case 8L => Codecs.deflate(d)
        case 32773L => Codecs.packBitsEncode(d, ch.w * bytesPer)
        case other => throw new IllegalArgumentException(
          s"writer compression $other unsupported")
      }
    }
    // JPEGTables surgery: every chunk shares the writer's DQT/DHT, so
    // the FIRST chunk's tables serve all; tag 347 = SOI + tables + EOI
    val (encodedFinal, jpegTables): (IndexedSeq[Array[Byte]], Array[Byte]) =
      if (compression == 7L && jpegAbbrev) {
        val split = encoded.map(Codecs.jifStripTables)
        val tbl = Array(0xFF.toByte, 0xD8.toByte) ++ split.head._1 ++
          Array(0xFF.toByte, 0xD9.toByte)
        (split.map(_._2), tbl)
      } else (encoded, Array.emptyByteArray)

    // layout: 8 header | chunk data... | offsets arrays | JPEGTables |
    // geo doubles | IFD
    val dataOff = 8
    val offs = new Array[Long](encodedFinal.length)
    var p = dataOff
    encodedFinal.indices.foreach { i =>
      offs(i) = p.toLong; p += encodedFinal(i).length }
    val nChunks = encodedFinal.length
    // >1 chunk: offset/count arrays live out-of-line (4 bytes each entry)
    val offArrOff = p
    val cntArrOff = offArrOff + (if (nChunks > 1) 4 * nChunks else 0)
    val tablesOff = cntArrOff + (if (nChunks > 1) 4 * nChunks else 0)
    val scaleOff = tablesOff + jpegTables.length
    val tieOff = scaleOff + 24
    val ifdOff = tieOff + 48
    val tiled = tile.isDefined
    // exact tag list: base 9 (width,height,bits,comp,photo,spp,format,
    // scale,tiepoint) + layout 3 or 4 (strips: offsets,rps,counts;
    // tiles: tw,th,offsets,counts) + predictor when != 1 + JPEGTables
    // when abbreviated
    val nTags = 9 + (if (tiled) 4 else 3) + (if (predictor != 1) 1 else 0) +
      (if (jpegTables.nonEmpty) 1 else 0)
    val buf = ByteBuffer.allocate(ifdOff + 2 + 12 * nTags + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42.toShort).putInt(ifdOff)
    encodedFinal.foreach(buf.put)
    if (nChunks > 1) {
      offs.foreach(o => buf.putInt(o.toInt))
      encodedFinal.foreach(e => buf.putInt(e.length))
    }
    buf.put(jpegTables)
    buf.putDouble(scale._1).putDouble(scale._2).putDouble(0.0)
    buf.putDouble(0.0).putDouble(0.0).putDouble(0.0)
    buf.putDouble(origin._1).putDouble(origin._2).putDouble(0.0)
    buf.putShort(nTags.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Long): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3 && count == 1) buf.putShort(value.toShort).putShort(0.toShort)
      else buf.putInt(value.toInt)
    }
    // IFD entries MUST be ascending by tag per spec
    entry(256, 4, 1, width.toLong)            // ImageWidth
    entry(257, 4, 1, height.toLong)           // ImageLength
    entry(258, 3, 1, bitsPerSample.toLong)    // BitsPerSample
    entry(259, 3, 1, compression)             // Compression
    entry(262, 3, 1, 1L)                      // Photometric: BlackIsZero
    if (!tiled) {
      entry(273, 4, nChunks,                  // StripOffsets
        if (nChunks == 1) offs(0) else offArrOff.toLong)
      entry(277, 3, 1, 1L)                    // SamplesPerPixel
      entry(278, 4, 1,                        // RowsPerStrip
        (if (rowsPerStrip <= 0) height else rowsPerStrip).toLong)
      entry(279, 4, nChunks,                  // StripByteCounts
        if (nChunks == 1) encodedFinal(0).length.toLong else cntArrOff.toLong)
    } else entry(277, 3, 1, 1L)               // SamplesPerPixel
    if (predictor != 1) entry(317, 3, 1, predictor.toLong)
    if (tiled) {
      entry(322, 4, 1, tile.get._1.toLong)    // TileWidth
      entry(323, 4, 1, tile.get._2.toLong)    // TileLength
      entry(324, 4, nChunks,                  // TileOffsets
        if (nChunks == 1) offs(0) else offArrOff.toLong)
      entry(325, 4, nChunks,                  // TileByteCounts
        if (nChunks == 1) encodedFinal(0).length.toLong else cntArrOff.toLong)
    }
    entry(339, 3, 1, sampleFormat.toLong)     // SampleFormat
    if (jpegTables.nonEmpty)
      entry(347, 7, jpegTables.length, tablesOff.toLong) // JPEGTables
    entry(33550, 12, 3, scaleOff.toLong)      // ModelPixelScale
    entry(33922, 12, 6, tieOff.toLong)        // ModelTiepoint
    buf.putInt(0)                             // next IFD: none
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
  }
}
