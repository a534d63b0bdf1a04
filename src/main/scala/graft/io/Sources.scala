package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.DataIOError

/** Source registry (SURVEY.md S1-S4).
  *
  * Reproduces the reference's reader cascade and directory-union
  * semantics with Spark-native readers:
  *  - `openData` — try CSV, then JSON, then XLSX (a minimal sheet-1
  *    zip+XML parser — no POI needed), raise listing what failed
  *    (reference: src/data_preprocessing.py:444-458);
  *  - `openSensorRecords` — per-file CSV (scrubbing `unnamed*` index
  *    artifacts) or JSON, nested fields natively addressable by dotted
  *    path — json_normalize for free (reference :602-613);
  *  - `openDirOfData` — union every `*.json` in a directory aligning
  *    columns by name; optional per-file sensor-id stamping. The
  *    reference stamps `len(df)` — the FIRST file's length — for every
  *    file (:440, a bug); we implement the evident intent (each file
  *    gets its caller-supplied id).
  */
object Sources {

  /** S2 — tabular reader cascade: CSV → JSON → XLSX → DataIOError
    * (reference: src/data_preprocessing.py:444-458). A `.json` / `.xlsx`
    * extension moves that attempt first: the CSV reader "succeeds" on
    * almost any text by comma-splitting it, so extension is the
    * stronger signal and the cascade remains the fallback contract. */
  def openData(spark: SparkSession, path: String): DataFrame = {
    val csvAttempt = "csv" -> (() => {
      val df = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      // an empty or non-CSV file parses to zero columns — treat as failure
      if (df.columns.isEmpty) sys.error("no columns parsed") else df
    })
    val jsonAttempt = "json" -> (() => {
      val df = spark.read.json(path)
      if (df.columns.isEmpty || df.columns.sameElements(Array("_corrupt_record")))
        sys.error("not valid JSON lines") else df
    })
    val xlsxAttempt = "xlsx" -> (() => openXlsx(spark, path))
    // self-describing columnar formats: never worth cascading INTO
    // (the csv leg would happily comma-split their binary framing),
    // but an explicit extension routes straight to the native reader
    val parquetAttempt = "parquet" -> (() => spark.read.parquet(path))
    val orcAttempt = "orc" -> (() => spark.read.orc(path))
    // binary geo formats (S1): extension-routed, never cascaded into —
    // the csv leg would comma-split their binary framing
    // the dispatch below matched case-insensitively, so strip the last
    // 4 chars rather than exact-case suffixes (a mixed-case "data.Shp"
    // would otherwise probe "data.Shp.shp" → misleading no-such-file)
    val shpAttempt = "shp" -> (() =>
      Shapefile.read(spark, path.substring(0, path.length - 4)))
    val tiffAttempt = "geotiff" -> (() => GeoTiff.readCells(spark, path))
    val avroAttempt = "avro" -> (() => Avro.read(spark, path))
    val arrowAttempt = "arrow" -> (() => ArrowIpc.read(spark, path))
    val lower = path.toLowerCase
    val attempts =
      if (lower.endsWith(".json")) Seq(jsonAttempt, csvAttempt, xlsxAttempt)
      else if (lower.endsWith(".xlsx")) Seq(xlsxAttempt, csvAttempt, jsonAttempt)
      else if (lower.endsWith(".parquet")) Seq(parquetAttempt)
      else if (lower.endsWith(".orc")) Seq(orcAttempt)
      else if (lower.endsWith(".shp")) Seq(shpAttempt)
      else if (lower.endsWith(".tif") || lower.endsWith(".tiff")) Seq(tiffAttempt)
      else if (lower.endsWith(".avro")) Seq(avroAttempt)
      else if (lower.endsWith(".arrow") || lower.endsWith(".feather"))
        Seq(arrowAttempt)
      else Seq(csvAttempt, jsonAttempt, xlsxAttempt)
    val errors = Seq.newBuilder[String]
    attempts.foreach { case (fmt, read) =>
      try return read()
      catch { case e: Exception => errors += s"$fmt: ${e.getMessage}" }
    }
    throw DataIOError(path, errors.result().mkString("; "))
  }

  /** S2 — minimal XLSX reader, sheet 1 only: an xlsx is a zip of XML,
    * so JDK java.util.zip + DOM suffice — no POI. Supports shared and
    * inline strings and numeric cells; row 1 is the header; column
    * types are inferred (long → double → string) like the CSV leg.
    *
    * Parsed on the DRIVER by design: a spreadsheet is a config-scale
    * input (the reference hands it to pandas.read_excel the same way,
    * :453-456); anything big arrives as parquet/CSV/JSON. */
  def openXlsx(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val zf = new java.util.zip.ZipFile(path)
    val raw: Seq[Array[String]] =
      try {
        def parse(name: String): Option[org.w3c.dom.Document] =
          Option(zf.getEntry(name)).map { e =>
            val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
            // XXE hardening: spreadsheet XML needs no DTDs or external
            // entities — refuse them outright
            dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
            dbf.setXIncludeAware(false)
            dbf.setExpandEntityReferences(false)
            dbf.newDocumentBuilder().parse(zf.getInputStream(e))
          }
        val shared: IndexedSeq[String] = parse("xl/sharedStrings.xml").map { d =>
          val nodes = d.getElementsByTagName("si")
          (0 until nodes.getLength).map(i => nodes.item(i).getTextContent)
        }.getOrElse(IndexedSeq.empty)
        // SHEET-1-ONLY by design (the reference's pandas.read_excel
        // default, :453-456). A multi-sheet workbook is ambiguous —
        // silently reading sheet 1 would drop data, so refuse loudly.
        if (zf.getEntry("xl/worksheets/sheet2.xml") != null)
          throw DataIOError(path, "multi-sheet workbook: this reader " +
            "handles sheet 1 only — split the workbook or export the " +
            "target sheet as its own file")
        val sheet = parse("xl/worksheets/sheet1.xml")
          .getOrElse(sys.error("no xl/worksheets/sheet1.xml entry (not an xlsx?)"))
        def colIdx(ref: String): Int =
          ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c.toUpper - 'A' + 1)) - 1
        val rowNodes = sheet.getElementsByTagName("row")
        (0 until rowNodes.getLength).map { i =>
          val r = rowNodes.item(i).asInstanceOf[org.w3c.dom.Element]
          val cells = r.getElementsByTagName("c")
          val m = scala.collection.mutable.Map.empty[Int, String]
          var lastIdx = -1
          (0 until cells.getLength).foreach { j =>
            val c = cells.item(j).asInstanceOf[org.w3c.dom.Element]
            // the r= cell reference is optional (ECMA-376): without it
            // the cell takes the next sequential column
            val ref = c.getAttribute("r")
            val idx = if (ref.isEmpty) lastIdx + 1 else colIdx(ref)
            lastIdx = idx
            val t = c.getAttribute("t")
            val vs = c.getElementsByTagName("v")
            val v =
              if (t == "inlineStr") c.getTextContent
              else if (vs.getLength == 0) null
              else if (t == "s") shared(vs.item(0).getTextContent.trim.toInt)
              else vs.item(0).getTextContent
            if (v != null && idx >= 0) m(idx) = v
          }
          if (m.isEmpty) Array.empty[String]
          else Array.tabulate(m.keys.max + 1)(k => m.getOrElse(k, null))
        }
      } finally zf.close()
    if (raw.isEmpty || raw.head.isEmpty) sys.error("xlsx sheet1 has no header row")
    val header = raw.head.map(h => if (h == null) "" else h)
    val data = raw.tail.map(r => Array.tabulate(header.length)(i =>
      if (i < r.length) r(i) else null))
    // CSV-style inference per column: long → double → string
    def allParse(i: Int, p: String => Boolean): Boolean =
      data.forall(r => r(i) == null || p(r(i)))
    val types: Array[DataType] = header.indices.map { i =>
      if (allParse(i, s => s.toLongOption.isDefined)) LongType
      else if (allParse(i, s => s.toDoubleOption.isDefined)) DoubleType
      else StringType
    }.toArray
    val schema = StructType(header.zip(types).map { case (n, t) => StructField(n, t) })
    val rows = data.map(r => org.apache.spark.sql.Row.fromSeq(
      header.indices.map { i =>
        val v = r(i)
        if (v == null) null
        else types(i) match {
          case LongType => v.toLong
          case DoubleType => v.toDouble
          case _ => v
        }
      }))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), schema)
  }

  /** S3 — single sensor-record file: CSV (scrub unnamed index cols) or
    * JSON (nested structs keep dotted-path access). */
  def openSensorRecords(spark: SparkSession, path: String): DataFrame = {
    val df =
      if (path.toLowerCase.endsWith(".csv"))
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      else spark.read.json(path)
    df.drop(df.columns.filter(_.toLowerCase.contains("unnamed")).toIndexedSeq: _*)
  }

  /** S2+ — FIXED-WIDTH text reader (the COBOL/mainframe interchange
    * leg): each line carries columns at fixed 1-based character
    * offsets; `colSpecs` = (name, startPos, length, type) with type in
    * long/int/double/string (string is right-trimmed — the padding
    * convention). Cast failures become nulls (the CSV-leg
    * permissiveness); lines shorter than a column's span yield null
    * for that column. Splittable for free: it IS a text file, so HDFS
    * line splits parallelize it like any log. */
  def openFixedWidth(spark: SparkSession, path: String,
      colSpecs: Seq[(String, Int, Int, String)]): DataFrame = {
    require(colSpecs.nonEmpty, "need at least one column spec")
    colSpecs.foreach { case (n, s, l, t) =>
      require(s >= 1 && l >= 1, s"column '$n': 1-based start and length >= 1")
      require(Seq("long", "int", "double", "string").contains(t),
        s"column '$n': type '$t' not in long/int/double/string")
    }
    val lines = spark.read.text(path)
    val cols = colSpecs.map { case (name, start, len, typ) =>
      // try_cast: junk cells are null (CSV-leg permissiveness), not an
      // ANSI cast error that kills the scan
      val v = typ match {
        case "string" => rtrim(substring(col("value"), start, len))
        case t => expr(s"try_cast(trim(substring(value, $start, $len)) AS $t)")
      }
      // a line too short to reach the span yields null, not ""-casts
      when(length(col("value")) >= start, v).as(name)
    }
    lines.select(cols: _*)
  }

  /** S4 — read every `*.json` in a directory, union by name (the
    * reference's `append(sort=True)` aligns columns by name and
    * null-fills, :441 — `unionByName(allowMissingColumns=true)` is the
    * exact analog). With `sensorIds`, file i (sorted order) is stamped
    * `id_sensor = sensorIds(i)` — intended per-file semantics.
    *
    * Scale note: without stamping this should be ONE
    * `spark.read.json(dir)` (directory-native, parallel listing).
    * Per-file stamping keeps per-file reads but unions lazily — at
    * 100 TB you'd encode the id in the path and derive it from
    * `input_file_name()` instead; that variant is `openDirStamped`. */
  def openDirOfData(spark: SparkSession, dir: String,
      sensorIds: Option[Seq[Long]] = None): DataFrame = {
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val files =
      try listing.toArray.map(_.toString).filter(_.toLowerCase.endsWith(".json")).sorted
      finally listing.close() // Files.list leaks a directory handle otherwise
    if (files.isEmpty) throw DataIOError(dir, "no *.json files")
    sensorIds match {
      case None =>
        spark.read.json(files.toIndexedSeq: _*)
      case Some(ids) =>
        require(ids.length >= files.length,
          s"sensorIds has ${ids.length} entries for ${files.length} files")
        files.toIndexedSeq.zip(ids).map { case (f, id) =>
          spark.read.json(f).withColumn("id_sensor", lit(id))
        }.reduce(_.unionByName(_, allowMissingColumns = true))
    }
  }

  /** Scale-path variant of S4: one directory-native read, sensor id
    * derived from the file path — no per-file driver loop, listing and
    * reading fully parallel. */
  def openDirStamped(spark: SparkSession, dir: String): DataFrame =
    spark.read.json(dir)
      .withColumn("source_file", input_file_name())
}
