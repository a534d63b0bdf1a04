package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{array, col}
import org.apache.spark.sql.types._
import graft.core.DataIOError

/** S6/S1 — minimal ESRI Shapefile sink AND source (Point, PolyLine
  * and Polygon layers): hand-written .shp/.shx/.dbf triple per the
  * public ESRI whitepaper format — no GDAL. Closes the reference's
  * default `out_driver='ESRI Shapefile'` sink contract
  * (src/data_preprocessing.py:156, :201-206) and, via [[read]], the
  * `open_spatial_data` vector-input leg (:462-492, fiona at :475).
  *
  * Scope: Point, single-part PolyLine, and Polygon (single outer ring,
  * optional interior rings via [[writePolygonsWithHoles]]) geometries
  * + scalar attribute columns (numeric → DBF 'N', boolean → 'L',
  * everything else → 'C' text). A layer is homogeneous by format
  * definition — [[write]] dispatches on the (single) geometry kind and
  * rejects mixed frames.
  * Assembled on the DRIVER by design: a shapefile is a single-file
  * (non-splittable, 2 GB-capped) format, so it is a RESULT-scale sink —
  * the same regime as `Sinks.write(singleFile = true)`; bulk data
  * belongs in parquet.
  */
object Shapefile {

  /** Kind-dispatching entry: Point layer, Polygon layer, or a loud
    * error for empty/mixed frames (a shapefile has ONE shape type). */
  def write(df: DataFrame, basePath: String): Int = {
    import graft.geo.Geo
    val geomField = findGeom(df, basePath)
    val raw = df.select(Geo.stKind(col(geomField.name))).distinct()
      .collect().map(_.getString(0))
    // a NULL geometry (outer-join artifact upstream) must hit the
    // typed error, not an NPE inside the sort below
    if (raw.contains(null))
      throw DataIOError(basePath, "geometry column contains NULL rows; " +
        "drop or fill them before the shapefile sink")
    val kinds = raw.sorted.toSeq
    kinds match {
      case Seq("point") => writePoints(df, basePath)
      case Seq("polygon") => writePolygons(df, basePath)
      case Seq("linestring") => writePolylines(df, basePath)
      case Seq() => writePoints(df, basePath) // empty frame → empty Point layer
      case other => throw DataIOError(basePath,
        s"shapefile layers are single-type; got kinds: ${other.mkString(", ")}")
    }
  }

  /** Write `df` (one geometry-struct column + attributes) as a POINT
    * layer `basePath.shp` / `.shx` / `.dbf`. Returns the row count. */
  def writePoints(df: DataFrame, basePath: String): Int = {
    import graft.geo.Geo
    val geomField = findGeom(df, basePath)
    val attrs = df.schema.fields.filter(_.name != geomField.name).toIndexedSeq
    val rows = df.select(
      (Seq(Geo.stX(col(geomField.name)).as("__x"), Geo.stY(col(geomField.name)).as("__y")) ++
        attrs.map(a => col(a.name))): _*).collect()
    val n = rows.length
    val xs = rows.map(_.getDouble(0)); val ys = rows.map(_.getDouble(1))
    val box = if (n == 0) (0.0, 0.0, 0.0, 0.0) else (xs.min, ys.min, xs.max, ys.max)

    // .shp — 100-byte header + per record: 8-byte record header (BE) +
    // 20-byte point content (LE shape type, x, y)
    val shp = ByteBuffer.allocate(100 + n * 28)
    shp.put(mainHeader(shapeType = 1, fileWords = (100 + n * 28) / 2, box))
    rows.zipWithIndex.foreach { case (r, i) =>
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(i + 1)               // record number, 1-based
      shp.putInt(10)                  // content length in words
      shp.order(ByteOrder.LITTLE_ENDIAN)
      shp.putInt(1)                   // Point
      shp.putDouble(r.getDouble(0)); shp.putDouble(r.getDouble(1))
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(basePath + ".shp"), shp.array())

    // .shx — same header + per record: offset (words) + content length
    val shx = ByteBuffer.allocate(100 + n * 8)
    shx.put(mainHeader(shapeType = 1, fileWords = (100 + n * 8) / 2, box))
    shx.order(ByteOrder.BIG_ENDIAN)
    (0 until n).foreach { i => shx.putInt((100 + i * 28) / 2); shx.putInt(10) }
    java.nio.file.Files.write(java.nio.file.Paths.get(basePath + ".shx"), shx.array())

    writeDbf(rows, attrs, attrOffset = 2, basePath)
    n
  }

  /** Write `df` (one geometry-struct column + attributes) as a
    * POLYGON layer. Rings are emitted closed (first vertex repeated)
    * and in the spec's clockwise outer-ring orientation regardless of
    * input winding. Returns the row count. */
  def writePolygons(df: DataFrame, basePath: String): Int =
    writePolygonsWithHoles(df, basePath, holesCol = None)

  /** Write a POLYGON layer with optional interior rings (holes).
    * `holesCol`, when given, names an `ARRAY<ARRAY<STRUCT<x,y>>>`
    * column carrying each record's holes (empty array = none). Per the
    * ESRI spec the outer ring is written CLOCKWISE and every hole
    * COUNTER-clockwise, each explicitly closed, as one multi-part
    * record (`numParts = 1 + holes`). The engine's geometry struct
    * stays single-ring — holes are a sink-level concept, exactly like
    * the reference's writer delegating ring assembly to the format
    * driver. Returns the row count. */
  def writePolygonsWithHoles(df: DataFrame, basePath: String,
      holesCol: Option[String]): Int = {
    import graft.geo.Geo
    val geomField = findGeom(df, basePath)
    val attrs = df.schema.fields
      .filter(f => f.name != geomField.name && !holesCol.contains(f.name))
      .toIndexedSeq
    val holesExpr = holesCol.map(col)
      .getOrElse(array().cast("array<array<struct<x:double,y:double>>>"))
    val rows = df.select(
      (Seq(col(geomField.name).getField("points").as("__pts"),
        holesExpr.as("__holes")) ++ attrs.map(a => col(a.name))): _*).collect()
    val n = rows.length

    def ringOf(raw: IndexedSeq[(Double, Double)], clockwise: Boolean)
        : IndexedSeq[(Double, Double)] = {
      if (raw.length < 3)
        throw DataIOError(basePath, s"polygon ring needs >= 3 vertices, got ${raw.length}")
      // shoelace sign: > 0 = counter-clockwise in y-up coordinates
      val closed = raw :+ raw.head
      val signed2 = closed.zip(closed.tail).map {
        case ((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1
      }.sum
      val oriented =
        if (clockwise == (signed2 > 0)) raw.reverse // wrong winding → flip
        else raw
      oriented :+ oriented.head      // explicit closure
    }
    def ptSeq(v: Any): IndexedSeq[(Double, Double)] =
      v.asInstanceOf[scala.collection.Seq[Row]].toIndexedSeq
        .map(p => (p.getDouble(0), p.getDouble(1)))

    // one record = outer ring first (CW), then holes (CCW)
    val records: IndexedSeq[IndexedSeq[IndexedSeq[(Double, Double)]]] =
      rows.toIndexedSeq.map { r =>
        val outer = ringOf(ptSeq(r.getSeq[Row](0)), clockwise = true)
        val holes =
          if (r.isNullAt(1)) IndexedSeq.empty
          else r.getSeq[Any](1).toIndexedSeq.map(h => ringOf(ptSeq(h), clockwise = false))
        outer +: holes
      }
    val allPts = records.flatten.flatten
    val box =
      if (allPts.isEmpty) (0.0, 0.0, 0.0, 0.0)
      else (allPts.map(_._1).min, allPts.map(_._2).min,
        allPts.map(_._1).max, allPts.map(_._2).max)

    // per record: 4 shape type + 32 box + 4 numParts + 4 numPoints +
    // 4 * numParts part offsets + 16 * numPoints  (LE), after the
    // 8-byte BE record header
    def contentBytes(np: Int, parts: Int): Int = 4 + 32 + 4 + 4 + 4 * parts + 16 * np
    def recBytes(rec: IndexedSeq[IndexedSeq[(Double, Double)]]): Int =
      contentBytes(rec.map(_.length).sum, rec.length)
    val shpLen = 100 + records.map(rec => 8 + recBytes(rec)).sum
    val shp = ByteBuffer.allocate(shpLen)
    shp.put(mainHeader(shapeType = 5, fileWords = shpLen / 2, box))
    val offsets = new Array[Int](n)
    var off = 100
    records.zipWithIndex.foreach { case (rec, i) =>
      val pts = rec.flatten
      offsets(i) = off
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(i + 1)
      shp.putInt(recBytes(rec) / 2)
      shp.order(ByteOrder.LITTLE_ENDIAN)
      shp.putInt(5)                    // Polygon
      shp.putDouble(pts.map(_._1).min); shp.putDouble(pts.map(_._2).min)
      shp.putDouble(pts.map(_._1).max); shp.putDouble(pts.map(_._2).max)
      shp.putInt(rec.length)           // numParts
      shp.putInt(pts.length)           // numPoints
      rec.scanLeft(0)(_ + _.length).init.foreach(p => shp.putInt(p)) // part start indices
      pts.foreach { case (x, y) => shp.putDouble(x); shp.putDouble(y) }
      off += 8 + recBytes(rec)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(basePath + ".shp"), shp.array())

    val shx = ByteBuffer.allocate(100 + n * 8)
    shx.put(mainHeader(shapeType = 5, fileWords = (100 + n * 8) / 2, box))
    shx.order(ByteOrder.BIG_ENDIAN)
    (0 until n).foreach { i =>
      shx.putInt(offsets(i) / 2); shx.putInt(recBytes(records(i)) / 2)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(basePath + ".shx"), shx.array())

    writeDbf(rows, attrs, attrOffset = 2, basePath)
    n
  }

  /** Write a POLYLINE layer (ESRI shape type 3). Each record is one
    * open path (one part, >= 2 vertices) — no closure or winding rule
    * applies to polylines; vertex order is preserved verbatim. The
    * record layout is identical to Polygon (box, numParts, numPoints,
    * parts, points), only the shape type differs. Returns the row
    * count. */
  def writePolylines(df: DataFrame, basePath: String): Int = {
    val geomField = findGeom(df, basePath)
    val attrs = df.schema.fields.filter(_.name != geomField.name).toIndexedSeq
    val rows = df.select(
      (Seq(col(geomField.name).getField("points").as("__pts")) ++
        attrs.map(a => col(a.name))): _*).collect()
    val n = rows.length

    def ptSeq(v: Any): IndexedSeq[(Double, Double)] =
      v.asInstanceOf[scala.collection.Seq[Row]].toIndexedSeq
        .map(p => (p.getDouble(0), p.getDouble(1)))
    val paths: IndexedSeq[IndexedSeq[(Double, Double)]] =
      rows.toIndexedSeq.map { r =>
        val p = ptSeq(r.getSeq[Row](0))
        if (p.length < 2)
          throw DataIOError(basePath, s"polyline needs >= 2 vertices, got ${p.length}")
        p
      }
    val allPts = paths.flatten
    val box =
      if (allPts.isEmpty) (0.0, 0.0, 0.0, 0.0)
      else (allPts.map(_._1).min, allPts.map(_._2).min,
        allPts.map(_._1).max, allPts.map(_._2).max)

    // per record: 4 shape type + 32 box + 4 numParts + 4 numPoints +
    // 4 part offset (always one part) + 16 * numPoints (LE), after the
    // 8-byte BE record header
    def recBytes(np: Int): Int = 4 + 32 + 4 + 4 + 4 + 16 * np
    val shpLen = 100 + paths.map(p => 8 + recBytes(p.length)).sum
    val shp = ByteBuffer.allocate(shpLen)
    shp.put(mainHeader(shapeType = 3, fileWords = shpLen / 2, box))
    val offsets = new Array[Int](n)
    var off = 100
    paths.zipWithIndex.foreach { case (pts, i) =>
      offsets(i) = off
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(i + 1)
      shp.putInt(recBytes(pts.length) / 2)
      shp.order(ByteOrder.LITTLE_ENDIAN)
      shp.putInt(3)                    // PolyLine
      shp.putDouble(pts.map(_._1).min); shp.putDouble(pts.map(_._2).min)
      shp.putDouble(pts.map(_._1).max); shp.putDouble(pts.map(_._2).max)
      shp.putInt(1)                    // numParts
      shp.putInt(pts.length)           // numPoints
      shp.putInt(0)                    // part 0 starts at vertex 0
      pts.foreach { case (x, y) => shp.putDouble(x); shp.putDouble(y) }
      off += 8 + recBytes(pts.length)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(basePath + ".shp"), shp.array())

    val shx = ByteBuffer.allocate(100 + n * 8)
    shx.put(mainHeader(shapeType = 3, fileWords = (100 + n * 8) / 2, box))
    shx.order(ByteOrder.BIG_ENDIAN)
    (0 until n).foreach { i =>
      shx.putInt(offsets(i) / 2); shx.putInt(recBytes(paths(i).length) / 2)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(basePath + ".shx"), shx.array())

    writeDbf(rows, attrs, attrOffset = 1, basePath)
    n
  }

  // ------------------------------------------------------------------
  // S1 — reader (mirror of the writer above): closes the reference's
  // `open_spatial_data` contract for actual .shp INPUT files
  // (src/data_preprocessing.py:462-492, geopandas/fiona at :475) — no
  // GDAL. Point (1), PolyLine (3) and Polygon (5) records; NULL shapes
  // (0) become null geometry rows; attributes come from the .dbf.
  // Parsed on the DRIVER by the same argument as the writer: a
  // shapefile is a single-file, 2 GB-capped, RESULT-scale format —
  // bulk data arrives as parquet. At 100 TB the cluster reads many
  // shapefiles via openDirOfData-style unions, never one big one.
  // ------------------------------------------------------------------

  /** Read `basePath.shp` (+ `.dbf` if present) into a DataFrame with a
    * `geometry` struct column followed by the DBF attribute columns.
    * Polygon records keep the OUTER ring only (part 0, the explicit
    * closing vertex stripped) — holes (counter-clockwise extra parts)
    * are a format-level concept the engine's single-ring geometry
    * struct deliberately does not carry (the writer symmetrically
    * assembles them only at the sink). Anything that WOULD lose data
    * silently fails loudly instead: multi-part PolyLines, Polygons
    * with additional clockwise (outer) rings, and DBF records carrying
    * the soft-delete flag. DBF types map N(dec=0)→long,
    * N(dec>0)/F→double, L→boolean, D→date, else→string; blank
    * numerics are null. */
  def read(spark: org.apache.spark.sql.SparkSession, basePath: String): DataFrame = {
    val shpPath = sidecar(basePath, "shp").getOrElse(
      throw DataIOError(basePath, s"no such file: $basePath.shp"))
    val bytes = java.nio.file.Files.readAllBytes(shpPath)
    if (bytes.length < 100)
      throw DataIOError(basePath, "truncated .shp: shorter than the 100-byte header")
    val bb = ByteBuffer.wrap(bytes)
    bb.order(ByteOrder.BIG_ENDIAN)
    if (bb.getInt(0) != 9994)
      throw DataIOError(basePath, s"not a shapefile (file code ${bb.getInt(0)} != 9994)")
    val fileBytes = math.min(bb.getInt(24).toLong * 2, bytes.length.toLong)
    bb.order(ByteOrder.LITTLE_ENDIAN)

    // geometry per record: Some((kind, vertices)) or None (null shape)
    val geoms = scala.collection.mutable.ArrayBuffer
      .empty[Option[(String, IndexedSeq[(Double, Double)])]]
    var pos = 100L
    while (pos + 12 <= fileBytes) {
      val p = pos.toInt
      bb.order(ByteOrder.BIG_ENDIAN)
      val contentWords = bb.getInt(p + 4)
      bb.order(ByteOrder.LITTLE_ENDIAN)
      bb.getInt(p + 8) match {
        case 0 => geoms += None
        case 1 =>
          geoms += Some(("point",
            IndexedSeq((bb.getDouble(p + 12), bb.getDouble(p + 20)))))
        case t @ (3 | 5) =>
          // content: type(4) at p+8, box(32) at p+12, numParts at p+44
          val numParts = bb.getInt(p + 44)
          val numPoints = bb.getInt(p + 48)
          if (numParts < 1 || numPoints < 1)
            throw DataIOError(basePath, s"record at byte $p: empty multi-part shape")
          val partsOff = p + 52
          val ptsOff = partsOff + 4 * numParts
          def partRange(j: Int): Range = {
            val s = bb.getInt(partsOff + 4 * j)
            val e = if (j + 1 < numParts) bb.getInt(partsOff + 4 * (j + 1))
                    else numPoints
            s until e
          }
          // loud boundary for silent data loss: a multi-part PolyLine,
          // or a Polygon whose extra parts are additional OUTER rings
          // (a multipolygon), would drop whole geometries if we kept
          // part 0 only. Interior rings (holes, counter-clockwise in
          // the shapefile winding convention) are the documented
          // single-ring-model drop; everything else fails typed.
          if (t == 3 && numParts > 1)
            throw DataIOError(basePath, s"record at byte $p: multi-part " +
              s"PolyLine ($numParts parts) — the single-ring geometry " +
              "model would silently drop parts; split the feature upstream")
          if (t == 5 && numParts > 1) {
            // shoelace Σ(x₂−x₁)(y₂+y₁) > 0 ⇒ clockwise ⇒ outer ring
            def clockwise(r: Range): Boolean = {
              var s = 0.0
              r.foreach { i =>
                val i2 = if (i + 1 < r.end) i + 1 else r.start
                s += (bb.getDouble(ptsOff + 16 * i2) - bb.getDouble(ptsOff + 16 * i)) *
                  (bb.getDouble(ptsOff + 16 * i2 + 8) + bb.getDouble(ptsOff + 16 * i + 8))
              }
              s > 0
            }
            val extraOuter = (1 until numParts).count(j => clockwise(partRange(j)))
            if (extraOuter > 0)
              throw DataIOError(basePath, s"record at byte $p: Polygon has " +
                s"$extraOuter additional outer ring(s) (multipolygon) — the " +
                "single-ring geometry model would silently drop them; split " +
                "the feature upstream (interior rings/holes are the " +
                "documented drop)")
          }
          val raw = partRange(0).map(i =>
            (bb.getDouble(ptsOff + 16 * i), bb.getDouble(ptsOff + 16 * i + 8)))
          val verts =
            if (t == 5 && raw.length >= 2 && raw.head == raw.last) raw.init
            else raw
          geoms += Some(((if (t == 5) "polygon" else "linestring"), verts))
        case other => throw DataIOError(basePath,
          s"unsupported shape type $other (Point=1, PolyLine=3, Polygon=5; " +
            "Z/M variants need a fuller reader)")
      }
      pos += 8 + contentWords.toLong * 2
    }

    val (attrFields, attrRows) = readDbf(basePath, geoms.length)
    val schema = StructType(
      StructField("geometry", graft.geo.Geo.geometryType) +: attrFields)
    val rows: Seq[Row] = geoms.toSeq.zip(attrRows).map { case (g, attrs) =>
      val geomRow = g.map { case (kind, pts) =>
        Row(kind, pts.map { case (x, y) => Row(x, y) })
      }.orNull
      Row.fromSeq(geomRow +: attrs)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(rows.length, 4))), schema)
  }

  /** Resolve `basePath.<ext>` CASE-INSENSITIVELY on the extension and
    * base name: shapefile sidecars from DOS-era tools arrive as .SHP/
    * .DBF (and dispatchers match extensions case-insensitively), so an
    * exact-case probe would miss `data.Shp` with a misleading
    * no-such-file error (advisor r7). Exact match wins; otherwise the
    * parent directory is scanned once for a case-variant. */
  private def sidecar(basePath: String,
      ext: String): Option[java.nio.file.Path] = {
    val exact = java.nio.file.Paths.get(s"$basePath.$ext")
    if (java.nio.file.Files.exists(exact)) return Some(exact)
    val parent = Option(exact.toAbsolutePath.getParent)
      .filter(java.nio.file.Files.isDirectory(_))
    val want = exact.getFileName.toString
    parent.flatMap { dir =>
      val s = java.nio.file.Files.list(dir)
      try {
        import scala.jdk.OptionConverters._
        s.filter(p => p.getFileName.toString.equalsIgnoreCase(want))
          .findFirst().toScala
      } finally s.close()
    }
  }

  /** Parse `basePath.dbf` into attribute fields + one value-seq per
    * record. A missing .dbf yields zero attributes (n empty rows);
    * a record-count mismatch with the .shp is a loud error. */
  private def readDbf(basePath: String,
      nShp: Int): (IndexedSeq[StructField], IndexedSeq[IndexedSeq[Any]]) = {
    val dbfPath = sidecar(basePath, "dbf").getOrElse(
      return (IndexedSeq.empty, IndexedSeq.fill(nShp)(IndexedSeq.empty)))
    val b = java.nio.file.Files.readAllBytes(dbfPath)
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt(4)
    val headLen = bb.getShort(8) & 0xFFFF
    val recLen = bb.getShort(10) & 0xFFFF
    if (n != nShp)
      throw DataIOError(basePath,
        s".dbf has $n records but .shp has $nShp — mismatched sidecar")
    final case class F(name: String, kind: Char, len: Int, dec: Int)
    val fields = scala.collection.mutable.ArrayBuffer.empty[F]
    var off = 32
    while (off + 32 <= headLen && b(off) != 0x0D) {
      val nameBytes = b.slice(off, off + 11).takeWhile(_ != 0)
      fields += F(new String(nameBytes, "US-ASCII"), b(off + 11).toChar,
        b(off + 16) & 0xFF, b(off + 17) & 0xFF)
      off += 32
    }
    // N(dec=0) → long whatever the width: the sibling writer emits
    // longs as N(19,0) and blanks anything not representable in 19
    // chars, so every non-blank value fits a long; a foreign file
    // with a genuinely over-long integer fails loudly in Long.valueOf
    def sparkType(f: F): DataType = f.kind match {
      case 'N' if f.dec == 0 => LongType
      case 'N' | 'F' => DoubleType
      case 'L' => BooleanType
      case 'D' => DateType
      case _ => StringType
    }
    val attrFields = fields.toIndexedSeq.map(f =>
      StructField(f.name, sparkType(f), nullable = true))
    val rows = (0 until n).map { r =>
      // soft-deleted DBF records ('*' flag) still have a .shp record,
      // so skipping would misalign the geometry zip — and including
      // them resurrects deleted data. Loud boundary instead.
      if (b(headLen + r * recLen) == 0x2A)
        throw DataIOError(basePath, s".dbf record $r carries the " +
          "soft-delete flag '*' — pack the file (drop deleted records) " +
          "upstream; silently including or skipping it would corrupt " +
          "the result")
      var p = headLen + r * recLen + 1 // +1 skips the deleted flag
      fields.toIndexedSeq.map { f =>
        val s = new String(b, p, f.len, "US-ASCII").trim
        p += f.len
        val v: Any = f.kind match {
          case 'N' if f.dec == 0 =>
            if (s.isEmpty) null else java.lang.Long.valueOf(s)
          case 'N' | 'F' =>
            if (s.isEmpty) null else java.lang.Double.valueOf(s)
          case 'L' => s.headOption match {
            case Some(c) if "TtYy".contains(c) => java.lang.Boolean.TRUE
            case Some(c) if "FfNn".contains(c) => java.lang.Boolean.FALSE
            case _ => null
          }
          case 'D' =>
            if (s.length != 8) null
            else java.sql.Date.valueOf(
              s"${s.substring(0, 4)}-${s.substring(4, 6)}-${s.substring(6, 8)}")
          case _ => if (s.isEmpty) null else s
        }
        v
      }
    }
    (attrFields, rows)
  }

  private def findGeom(df: DataFrame, basePath: String): StructField = {
    import graft.geo.Geo
    df.schema.fields
      .find(f => f.dataType.catalogString == Geo.geometryType.catalogString)
      .getOrElse(throw DataIOError(basePath, "shapefile sink needs a geometry column"))
  }

  /** 100-byte .shp/.shx main header (bbox in (xmin, ymin, xmax, ymax)). */
  private def mainHeader(shapeType: Int, fileWords: Int,
      box: (Double, Double, Double, Double)): Array[Byte] = {
    val b = ByteBuffer.allocate(100)
    b.order(ByteOrder.BIG_ENDIAN)
    b.putInt(0, 9994)               // file code
    b.putInt(24, fileWords)         // length in 16-bit words
    b.order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(28, 1000)              // version
    b.putInt(32, shapeType)
    b.putDouble(36, box._1); b.putDouble(44, box._2)
    b.putDouble(52, box._3); b.putDouble(60, box._4)
    b.array()
  }

  /** .dbf (dBase III) attribute table — always present, even with 0
    * fields. `attrOffset` = index of the first attribute inside the
    * collected rows (geometry projections precede it). */
  private def writeDbf(rows: Array[Row], attrs: IndexedSeq[StructField],
      attrOffset: Int, basePath: String): Unit = {
    final case class F(name: String, kind: Char, len: Int, dec: Int,
        fmt: Row => String)
    def text(v: Any): String = if (v == null) "" else v.toString
    // DBF 'N' fields are fixed-width ASCII: a value that cannot be
    // represented in `len` chars (overflow, NaN, Infinity) is written
    // blank (= null) rather than overrunning the record layout
    def numClamp(len: Int)(s: String): String = if (s.length > len) "" else s
    val fields: IndexedSeq[F] = attrs.zipWithIndex.map { case (a, i) =>
      val idx = i + attrOffset
      a.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          F(a.name, 'N', 19, 0, r =>
            if (r.isNullAt(idx)) "" else numClamp(19)(r.get(idx).toString))
        case FloatType | DoubleType | _: DecimalType =>
          F(a.name, 'N', 19, 6, r =>
            if (r.isNullAt(idx)) ""
            else {
              val raw = r.get(idx).toString
              if (raw == "NaN" || raw.endsWith("Infinity")) ""
              else numClamp(19)(
                BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                  .bigDecimal.toPlainString)
            })
        case BooleanType =>
          F(a.name, 'L', 1, 0, r => if (r.isNullAt(idx)) "?"
            else if (r.getBoolean(idx)) "T" else "F")
        case _ =>
          val w = math.max(1, math.min(254,
            if (rows.isEmpty) 1 else rows.map(r => text(r.get(idx)).length).max))
          F(a.name, 'C', w, 0, r => text(r.get(idx)).take(w))
      }
    }
    val n = rows.length
    val recLen = 1 + fields.map(_.len).sum
    val headLen = 32 + 32 * fields.length + 1
    // DBF stores both lengths as unsigned 16-bit; >~128 max-width text
    // columns (or >2046 fields) would silently wrap the .toShort below
    // into a corrupt file. Fail loudly instead.
    if (recLen > 0xFFFF)
      throw DataIOError(basePath, s"DBF record length $recLen exceeds the " +
        "65535-byte format limit; drop or narrow attribute columns")
    if (headLen > 0xFFFF)
      throw DataIOError(basePath, s"DBF header length $headLen exceeds the " +
        s"65535-byte format limit (${fields.length} fields); drop columns")
    // field names are truncated to 10 ASCII bytes — two columns that
    // collide after truncation would be indistinguishable to readers
    val collisions = fields.map(_.name)
      .groupBy(_.getBytes("US-ASCII").take(10).toSeq)
      .collect { case (_, names) if names.length > 1 => names.mkString("/") }
    if (collisions.nonEmpty)
      throw DataIOError(basePath, "duplicate DBF field names after 10-byte " +
        s"truncation: ${collisions.mkString(", ")}")
    val dbf = ByteBuffer.allocate(headLen + n * recLen + 1)
    dbf.order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0, 0x03.toByte)
    dbf.put(1, 95.toByte); dbf.put(2, 7.toByte); dbf.put(3, 26.toByte) // fixed date stamp
    dbf.putInt(4, n)
    dbf.putShort(8, headLen.toShort)
    dbf.putShort(10, recLen.toShort)
    fields.zipWithIndex.foreach { case (f, i) =>
      val off = 32 + 32 * i
      val nameBytes = f.name.getBytes("US-ASCII").take(10)
      (0 until nameBytes.length).foreach(j => dbf.put(off + j, nameBytes(j)))
      dbf.put(off + 11, f.kind.toByte)
      dbf.put(off + 16, f.len.toByte)
      dbf.put(off + 17, f.dec.toByte)
    }
    dbf.put(32 + 32 * fields.length, 0x0D.toByte)
    var pos = headLen
    rows.foreach { r =>
      dbf.put(pos, ' '.toByte); pos += 1 // not-deleted flag
      fields.foreach { f =>
        val s = f.fmt(r)
        val bytes = s.getBytes("US-ASCII")
        // 'N' right-justified, 'C' left-justified, space-padded
        val pad = f.len - bytes.length
        val (lead, trail) = if (f.kind == 'N') (pad, 0) else (0, pad)
        (0 until lead).foreach(_ => { dbf.put(pos, ' '.toByte); pos += 1 })
        bytes.foreach(b => { dbf.put(pos, b); pos += 1 })
        (0 until trail).foreach(_ => { dbf.put(pos, ' '.toByte); pos += 1 })
      }
    }
    dbf.put(pos, 0x1A.toByte) // EOF
    java.nio.file.Files.write(java.nio.file.Paths.get(basePath + ".dbf"), dbf.array())
  }
}
