package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}

/** S1 — compressed + tiled GeoTIFF ingest (round-8 gap closure; the
  * reference opens any GDAL raster, src/data_preprocessing.py:470-472).
  * Two evidence layers:
  *   1. Scala write→read round-trips per codec (self-consistency);
  *   2. fixtures under src/test/resources/geotiff written by an
  *      INDEPENDENT pure-python implementation (dev/make_tiff_fixtures
  *      .py: stdlib zlib + from-the-spec LZW/PackBits encoders) — the
  *      reader is checked against a second codebase, so a shared
  *      encode/decode bug can't self-certify.
  */
class GeoTiffCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_tiffcodec").toString
  private def res(name: String): String = {
    val url = getClass.getResource(s"/geotiff/$name")
    assert(url != null, s"missing fixture $name")
    url.getPath
  }
  private def cellMap(path: String): Map[(Double, Double), Double] =
    graft.io.GeoTiff.readCells(spark, path).collect()
      .map(r => ((r.getDouble(1), r.getDouble(2)), r.getDouble(3))).toMap

  // ---- Scala round-trips, one per codec ------------------------------

  test("S1: float32 round-trips through deflate, LZW and PackBits strips") {
    val dir = tmpDir()
    val w = 21; val h = 13
    val vals = Array.tabulate(w * h)(i => ((i * 13) % 97).toFloat / 8f)
    for ((comp, tag) <- Seq(
        graft.io.GeoTiff.CompDeflate -> "defl",
        graft.io.GeoTiff.CompLzw -> "lzw",
        graft.io.GeoTiff.CompPackBits -> "pb")) {
      val p = s"$dir/$tag.tif"
      graft.io.GeoTiff.writeFloat(p, w, h, vals,
        origin = (0.0, h.toDouble), scale = (1.0, 1.0),
        compression = comp, rowsPerStrip = 3)
      val m = cellMap(p)
      assert(m.size == w * h, tag)
      (0 until h).foreach { r =>
        (0 until w).foreach { c =>
          assert(m((c + 0.5, h - r - 0.5)) == vals(r * w + c).toDouble,
            s"$tag ($c,$r)")
        }
      }
    }
  }

  test("S1: tiled deflate float32 round-trips with edge-tile clipping") {
    val dir = tmpDir()
    val w = 37; val h = 19 // NOT multiples of 16: right/bottom tiles pad
    val vals = Array.tabulate(w * h)(i => ((i * 7) % 89).toFloat / 4f)
    val p = s"$dir/tiled.tif"
    graft.io.GeoTiff.writeFloat(p, w, h, vals,
      origin = (50.0, 100.0), scale = (2.0, 2.0),
      compression = graft.io.GeoTiff.CompDeflate, tile = Some((16, 16)))
    val m = cellMap(p)
    assert(m.size == w * h) // padding never leaks cells
    (0 until h).foreach { r =>
      (0 until w).foreach { c =>
        assert(m((50.0 + (c + 0.5) * 2.0, 100.0 - (r + 0.5) * 2.0))
          == vals(r * w + c).toDouble, s"($c,$r)")
      }
    }
  }

  test("S1: gray16 + predictor 2 round-trips under deflate and LZW") {
    val dir = tmpDir()
    val w = 29; val h = 11
    val vals = Array.tabulate(w * h)(i => (i * 37) % 65536)
    for ((comp, tag) <- Seq(graft.io.GeoTiff.CompDeflate -> "defl",
        graft.io.GeoTiff.CompLzw -> "lzw")) {
      val p = s"$dir/p2_$tag.tif"
      graft.io.GeoTiff.writeGray16(p, w, h, vals,
        origin = (0.0, h.toDouble), scale = (1.0, 1.0),
        compression = comp, rowsPerStrip = 4, predictor = 2)
      val m = cellMap(p)
      assert(m.size == w * h, tag)
      (0 until h).foreach { r =>
        (0 until w).foreach { c =>
          assert(m((c + 0.5, h - r - 0.5)) == vals(r * w + c).toDouble,
            s"$tag ($c,$r)")
        }
      }
    }
  }

  test("S1: float32 + predictor 3 round-trips under deflate and LZW strips") {
    val dir = tmpDir()
    val w = 27; val h = 12
    // mixed magnitudes so every byte plane carries real structure
    val vals = Array.tabulate(w * h)(i =>
      ((i * 13) % 97).toFloat / 8f * (if (i % 3 == 0) 1000f else 1f))
    for ((comp, tag) <- Seq(graft.io.GeoTiff.CompDeflate -> "defl",
        graft.io.GeoTiff.CompLzw -> "lzw")) {
      val p = s"$dir/p3_$tag.tif"
      graft.io.GeoTiff.writeFloat(p, w, h, vals,
        origin = (0.0, h.toDouble), scale = (1.0, 1.0),
        compression = comp, rowsPerStrip = 5, predictor = 3)
      val m = cellMap(p)
      assert(m.size == w * h, tag)
      (0 until h).foreach { r =>
        (0 until w).foreach { c =>
          assert(m((c + 0.5, h - r - 0.5)) == vals(r * w + c).toDouble,
            s"$tag ($c,$r)")
        }
      }
    }
  }

  test("S1: tiled deflate float32 + predictor 3 round-trips with edge clipping") {
    val dir = tmpDir()
    val w = 35; val h = 18 // NOT tile multiples: padded edge tiles
    val vals = Array.tabulate(w * h)(i => ((i * 29) % 83).toFloat / 4f)
    val p = s"$dir/p3_tiled.tif"
    graft.io.GeoTiff.writeFloat(p, w, h, vals,
      origin = (10.0, 36.0), scale = (1.0, 2.0),
      compression = graft.io.GeoTiff.CompDeflate, tile = Some((16, 16)),
      predictor = 3)
    val m = cellMap(p)
    assert(m.size == w * h)
    (0 until h).foreach { r =>
      (0 until w).foreach { c =>
        assert(m((10.0 + c + 0.5, 36.0 - (r + 0.5) * 2.0))
          == vals(r * w + c).toDouble, s"($c,$r)")
      }
    }
  }

  test("S1: LZW codec survives a dictionary-stress stream (resets + 12-bit codes)") {
    // 48k pseudo-random bytes: the dictionary passes 511/1023/2047
    // (code-width changes) and 4094 (table reset) many times over
    val n = 48 * 1024
    var x = 987654321L
    val data = Array.tabulate(n) { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 33).toByte
    }
    val enc = graft.io.GeoTiff.Codecs.lzwEncode(data)
    val dec = graft.io.GeoTiff.Codecs.lzwDecode(enc, n, "stress")
    assert(java.util.Arrays.equals(dec, data))
  }

  // ---- cross-implementation fixtures (independent python writer) ----

  test("S1: python deflate+predictor2 gray16 fixture decodes exactly") {
    val m = cellMap(res("py_deflate_pred2_gray16.tif"))
    val w = 37; val h = 23
    assert(m.size == w * h)
    (0 until h).foreach { r =>
      (0 until w).foreach { c =>
        val v = ((r * 31 + c * 7) % 1000).toDouble
        assert(m((10.0 + (c + 0.5) * 0.5, 20.0 - (r + 0.5) * 0.25)) == v,
          s"($c,$r)")
      }
    }
  }

  test("S1: python LZW gray8 fixture decodes exactly") {
    val m = cellMap(res("py_lzw_gray8.tif"))
    val w = 41; val h = 17
    assert(m.size == w * h)
    (0 until h).foreach { r =>
      (0 until w).foreach { c =>
        val v = ((r * 13 + c * c) % 251).toDouble
        assert(m((-5.0 + c + 0.5, 5.0 - r - 0.5)) == v, s"($c,$r)")
      }
    }
  }

  test("S1: python PackBits gray8 fixture decodes exactly") {
    val m = cellMap(res("py_packbits_gray8.tif"))
    val w = 33; val h = 9
    assert(m.size == w * h)
    (0 until h).foreach { r =>
      (0 until w).foreach { c =>
        val v = ((c / 9 * 40 + r) % 256).toDouble
        assert(m((c + 0.5, 9.0 - r - 0.5)) == v, s"($c,$r)")
      }
    }
  }

  test("S1: python tiled deflate float32 fixture decodes exactly") {
    val m = cellMap(res("py_tiled_deflate_f32.tif"))
    val w = 40; val h = 24
    assert(m.size == w * h)
    (0 until h).foreach { r =>
      (0 until w).foreach { c =>
        val v = ((r * w + c) % 97) / 8.0
        assert(m((100.0 + (c + 0.5) * 2.0, 200.0 - (r + 0.5) * 2.0)) == v,
          s"($c,$r)")
      }
    }
  }

  test("S1: python big-LZW fixture (width changes + mid-stream resets) decodes") {
    val df = graft.io.GeoTiff.readCells(spark, res("py_lzw_big.tif"))
    val agg = df.selectExpr("count(*) AS n", "sum(value) AS s").head()
    assert(agg.getLong(0) == 256L * 128L)
    assert(agg.getDouble(1) == 4188307.0) // checksum from the generator
    val m = cellMap(res("py_lzw_big.tif"))
    // first five bytes of the generator's LCG stream
    assert(Seq(220, 4, 101, 170, 31).zipWithIndex.forall { case (v, c) =>
      m((c + 0.5, 128.0 - 0.5)) == v.toDouble })
  }

  test("S1: python PLANAR (separated) 2-band deflate fixture decodes exactly") {
    // band-major chunk order (TIFF6 §14): all band-1 strips, then all
    // band-2 strips; each chunk carries one band's samples
    val rows = graft.io.GeoTiff.readCells(spark,
        res("py_planar2_deflate_gray8.tif")).collect()
      .map(r => ((r.getInt(0), r.getDouble(1), r.getDouble(2)), r.getDouble(3)))
      .toMap
    val w = 21; val h = 13
    assert(rows.size == 2 * w * h)
    (0 until h).foreach { r =>
      (0 until w).foreach { c =>
        val key1 = (1, c + 0.5, 13.0 - r - 0.5)
        val key2 = (2, c + 0.5, 13.0 - r - 0.5)
        assert(rows(key1) == ((r * 7 + c) % 251).toDouble, s"b1 ($c,$r)")
        assert(rows(key2) == ((r + c * 5) % 251).toDouble, s"b2 ($c,$r)")
      }
    }
  }

  test("S1: python deflate + float-predictor-3 float32 fixture decodes exactly") {
    val m = cellMap(res("py_deflate_pred3_f32.tif"))
    val w = 29; val h = 14
    assert(m.size == w * h)
    (0 until h).foreach { r =>
      (0 until w).foreach { c =>
        val v = ((r * w + c) * 11 % 89) / 8.0
        assert(m((3.0 + c + 0.5, 14.0 - r - 0.5)) == v, s"($c,$r)")
      }
    }
  }

  test("S1: python BigTIFF fixture (magic 43, LONG8 arrays) decodes exactly") {
    val m = cellMap(res("py_bigtiff_deflate_gray8.tif"))
    val w = 19; val h = 11
    assert(m.size == w * h)
    (0 until h).foreach { r =>
      (0 until w).foreach { c =>
        val v = ((r * 17 + c * 3) % 253).toDouble
        assert(m((7.0 + c + 0.5, 11.0 - r - 0.5)) == v, s"($c,$r)")
      }
    }
  }

  test("S1: JPEG-in-TIFF round-trips within codec error; tables variant identical") {
    val dir = tmpDir()
    val w = 24; val h = 16
    // smooth ramp: JPEG at quality 0.95 stays within a few counts
    val vals = Array.tabulate(w * h)(i => (i / w) * 4 + (i % w) * 2)
    graft.io.GeoTiff.writeGray8Jpeg(s"$dir/full.tif", w, h, vals,
      origin = (0.0, h.toDouble), scale = (1.0, 1.0), rowsPerStrip = 5)
    graft.io.GeoTiff.writeGray8Jpeg(s"$dir/abbrev.tif", w, h, vals,
      origin = (0.0, h.toDouble), scale = (1.0, 1.0), rowsPerStrip = 5,
      abbreviatedTables = true)
    // abbreviated file carries the DQT/DHT once, not per strip
    val szF = java.nio.file.Files.size(java.nio.file.Paths.get(s"$dir/full.tif"))
    val szA = java.nio.file.Files.size(java.nio.file.Paths.get(s"$dir/abbrev.tif"))
    assert(szA < szF, s"abbrev $szA !< full $szF")
    val mF = cellMap(s"$dir/full.tif")
    assert(mF.size == w * h)
    (0 until h).foreach { r =>
      (0 until w).foreach { c =>
        val got = mF((c + 0.5, h - r - 0.5))
        assert(math.abs(got - vals(r * w + c)) <= 3.0,
          s"($c,$r): $got vs ${vals(r * w + c)}")
      }
    }
    // the JPEGTables merge path reconstructs the SAME entropy stream:
    // decoded pixels must be IDENTICAL, not merely close
    assert(cellMap(s"$dir/abbrev.tif") == mF)
    // and decode is deterministic
    assert(cellMap(s"$dir/full.tif") == mF)
  }

  // ---- typed boundaries ----------------------------------------------

  private def writeIfd(path: String, tags: Seq[(Int, Int, Long)]): Unit = {
    // minimal classic-TIFF skeleton with inline-value entries only
    val buf = ByteBuffer.allocate(8 + 2 + 12 * tags.length + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42.toShort).putInt(8)
    buf.putShort(tags.length.toShort)
    tags.sortBy(_._1).foreach { case (tag, typ, value) =>
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(1)
      if (typ == 3) buf.putShort(value.toShort).putShort(0.toShort)
      else buf.putInt(value.toInt)
    }
    buf.putInt(0)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
  }

  test("S1: old-style JPEG (6) with a whole-image JIF decodes = new-style (7)") {
    val dir = tmpDir()
    val w = 24; val h = 16
    val vals = Array.tabulate(w * h)(i => (i / w) * 4 + (i % w) * 2)
    graft.io.GeoTiff.writeGray8JpegOldStyle(s"$dir/old6.tif", w, h, vals,
      origin = (0.0, h.toDouble), scale = (1.0, 1.0))
    // same pixels as ONE whole-image chunk under compression 7: the
    // entropy streams are byte-identical, so decodes must be bit-equal
    graft.io.GeoTiff.writeGray8Jpeg(s"$dir/new7.tif", w, h, vals,
      origin = (0.0, h.toDouble), scale = (1.0, 1.0))
    val m6 = cellMap(s"$dir/old6.tif")
    assert(m6.size == w * h)
    (0 until h).foreach { r =>
      (0 until w).foreach { c =>
        val got = m6((c + 0.5, h - r - 0.5))
        assert(math.abs(got - vals(r * w + c)) <= 3.0,
          s"($c,$r): $got vs ${vals(r * w + c)}")
      }
    }
    assert(cellMap(s"$dir/new7.tif") == m6,
      "identical JIF streams must decode bit-equal across 6 and 7")
  }

  test("S1: fragmented old-style JPEG (no JIF, non-JIF strips) fails typed") {
    val dir = tmpDir()
    // compression 6 WITHOUT JPEGInterchangeFormat: strips point at bytes
    // that are not a standalone JIF stream (no SOI) — the incoherent
    // pre-TechNote2 flavor stays a typed boundary
    writeIfd(s"$dir/frag6.tif", Seq((256, 4, 4L), (257, 4, 4L),
      (258, 3, 8L), (259, 3, 6L), (273, 4, 8L), (278, 4, 4L),
      (279, 4, 16L)))
    val e = intercept[Exception] {
      graft.io.GeoTiff.readCells(spark, s"$dir/frag6.tif").collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("not a standalone JIF")),
      s"expected the fragmented-JPEG typed message, got: $e")
  }

  test("S1: FRAGMENTED old-style JPEG (raw entropy strips + 519/520/521 " +
      "tables) decodes = new-style (7), multi-strip") {
    val dir = tmpDir()
    val w = 32; val h = 24
    val vals = Array.tabulate(w * h)(i => (i % w) * 3 + (i / w) * 5)
    graft.io.GeoTiff.writeGray8JpegFragmented(s"$dir/frag6.tif", w, h, vals,
      origin = (0.0, h.toDouble), scale = (1.0, 1.0), rowsPerStrip = 8)
    graft.io.GeoTiff.writeGray8Jpeg(s"$dir/new7.tif", w, h, vals,
      origin = (0.0, h.toDouble), scale = (1.0, 1.0), rowsPerStrip = 8)
    val m6 = cellMap(s"$dir/frag6.tif")
    assert(m6.size == w * h)
    // lossy codec, smooth ramp: within ±3 of the source…
    (0 until h).foreach { r =>
      (0 until w).foreach { c =>
        val got = m6((c + 0.5, h - r - 0.5))
        assert(math.abs(got - vals(r * w + c)) <= 3.0,
          s"($c,$r): $got vs ${vals(r * w + c)}")
      }
    }
    // …and BIT-equal to the same entropy bytes through the 7-path
    assert(cellMap(s"$dir/new7.tif") == m6,
      "identical entropy streams must decode bit-equal across frag-6 and 7")
  }

  test("S1: fragmented JPEG-6 single-strip and assemble/extract round trip") {
    val dir = tmpDir()
    val w = 16; val h = 12
    val vals = Array.tabulate(w * h)(i => 40 + (i % w) + (i / w))
    graft.io.GeoTiff.writeGray8JpegFragmented(s"$dir/one.tif", w, h, vals,
      origin = (0.0, h.toDouble), scale = (1.0, 1.0), rowsPerStrip = h)
    val m = cellMap(s"$dir/one.tif")
    assert(m.size == w * h)
    // extract(assemble(x)) is the identity on tables and entropy
    val jif = graft.io.GeoTiff.Codecs.jpegEncodeGray(
      vals.map(_.toByte), w, h)
    val (q, dc, ac, ent) = graft.io.GeoTiff.Codecs.jifExtractOldJpeg6(jif)
    val re = graft.io.GeoTiff.Codecs.assembleOldJpeg6(
      graft.io.GeoTiff.OldJpeg6Tables(q, dc, ac, 0L), ent, w, h)
    val (q2, dc2, ac2, ent2) = graft.io.GeoTiff.Codecs.jifExtractOldJpeg6(re)
    assert(q2.head.sameElements(q.head) && dc2.head.sameElements(dc.head) &&
      ac2.head.sameElements(ac.head) && ent2.sameElements(ent))
  }

  test("S1: fragmented JPEG-6 typed errors — non-baseline proc, color, " +
      "missing Huffman tables") {
    val dir = tmpDir()
    // JPEGProc=14 (lossless): no JDK codec, typed error before table reads
    writeIfd(s"$dir/proc14.tif", Seq((256, 4, 4L), (257, 4, 4L),
      (258, 3, 8L), (259, 3, 6L), (273, 4, 8L), (278, 4, 4L),
      (279, 4, 16L), (512, 3, 14L), (519, 4, 8L)))
    val e1 = intercept[graft.core.DataIOError] {
      graft.io.GeoTiff.readCells(spark, s"$dir/proc14.tif").collect() }
    assert(e1.getMessage.contains("JPEGProc=14"))
    // color fragmented: SamplesPerPixel=3 needs YCbCr SOF reassembly
    writeIfd(s"$dir/color.tif", Seq((256, 4, 4L), (257, 4, 4L),
      (258, 3, 8L), (259, 3, 6L), (273, 4, 8L), (277, 3, 3L),
      (278, 4, 4L), (279, 4, 16L), (512, 3, 1L), (519, 4, 8L)))
    val e2 = intercept[graft.core.DataIOError] {
      graft.io.GeoTiff.readCells(spark, s"$dir/color.tif").collect() }
    assert(e2.getMessage.contains("SamplesPerPixel=3"))
    // 519 present but 520 missing: reassembly impossible, say which tag
    writeIfd(s"$dir/nodc.tif", Seq((256, 4, 4L), (257, 4, 4L),
      (258, 3, 8L), (259, 3, 6L), (273, 4, 8L), (278, 4, 4L),
      (279, 4, 16L), (512, 3, 1L), (519, 4, 8L)))
    val e3 = intercept[graft.core.DataIOError] {
      graft.io.GeoTiff.readCells(spark, s"$dir/nodc.tif").collect() }
    assert(e3.getMessage.contains("JPEGDCTables missing"))
  }

  test("S1: predictor-3-on-int and predictor-2-on-float fail typed") {
    val dir = tmpDir()

    // predictor 3 on integer samples (SampleFormat defaults to 1)
    writeIfd(s"$dir/fpred.tif", Seq((256, 4, 4L), (257, 4, 4L),
      (259, 3, 8L), (317, 3, 3L)))
    val e2 = intercept[graft.core.DataIOError] {
      graft.io.GeoTiff.readCells(spark, s"$dir/fpred.tif") }
    assert(e2.getMessage.contains("requires SampleFormat float"))

    writeIfd(s"$dir/p2f.tif", Seq((256, 4, 4L), (257, 4, 4L), (258, 3, 32L),
      (259, 3, 8L), (317, 3, 2L), (339, 3, 3L)))
    val e3 = intercept[graft.core.DataIOError] {
      graft.io.GeoTiff.readCells(spark, s"$dir/p2f.tif") }
    assert(e3.getMessage.contains("integer-only"))
  }
}
