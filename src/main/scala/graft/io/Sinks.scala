package graft.io

import org.apache.spark.sql.DataFrame

/** Sink registry (SURVEY.md S5-S6).
  *
  * The reference lets every aggregation op write its result with any
  * GDAL driver, and — critically — SWALLOWS write failures: the
  * exception is printed and the result is still returned
  * (reference: src/data_preprocessing.py:201-206). `writeSafe` keeps
  * that contract. Shapefile output goes through [[Shapefile]] (a
  * hand-written point-layer .shp/.shx/.dbf triple — no GDAL needed);
  * GeoJSON maps to Spark's json writer with geometry columns rendered
  * by graft.geo before sinking.
  */
object Sinks {

  /** geometry-struct columns rendered as GeoJSON fragments before a
    * geojson sink (S5: `to_file(driver='GeoJSON')` analog). */
  private def renderGeometry(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.schema.fields.foldLeft(df) { (d, f) =>
      // catalogString compares field names+types but not nullability:
      // expression-built geometries (e.g. stPoint output) carry
      // non-nullable inner fields and must still render as GeoJSON
      if (f.dataType.catalogString == graft.geo.Geo.geometryType.catalogString)
        d.withColumn(f.name, graft.geo.Geo.stAsGeoJson(col(f.name)))
      else d
    }
  }

  /** geometry-struct columns rendered as WKT before tabular text sinks
    * (the OGR "CSV with GEOMETRY=AS_WKT" analog) — fully distributed,
    * geometry becomes one more string column. */
  private def renderWkt(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType.catalogString == graft.geo.Geo.geometryType.catalogString)
        d.withColumn(f.name, graft.geo.Geo.stAsText(col(f.name)))
      else d
    }
  }

  /** KML document sink (OGC KML 2.2, public spec): one Placemark per
    * row — Point or Polygon from the geometry struct, every other
    * column as ExtendedData/SimpleData. Like the shapefile sink this
    * is a SINGLE-document format, so rows are collected on the driver
    * — the bounded-result regime (maps, selections), never a fact
    * table. */
  private def writeKml(df: DataFrame, path: String): Unit = {
    val geomIdx = df.schema.fields.indexWhere(
      _.dataType.catalogString == graft.geo.Geo.geometryType.catalogString)
    require(geomIdx >= 0, "kml sink needs a geometry column")
    val attrs = df.schema.fields.zipWithIndex.filter(_._2 != geomIdx)
    // '"' must be escaped too: f.name lands inside name="..." below.
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= "<kml xmlns=\"http://www.opengis.net/kml/2.2\"><Document>\n"
    df.collect().foreach { row =>
      val g = row.getStruct(geomIdx)
      val kind = g.getString(0)
      val pts = g.getSeq[org.apache.spark.sql.Row](1)
      def coord(p: org.apache.spark.sql.Row) = s"${p.getDouble(0)},${p.getDouble(1)}"
      sb ++= "<Placemark><ExtendedData>"
      attrs.foreach { case (f, i) =>
        sb ++= s"""<Data name="${esc(f.name)}"><value>${
          esc(Option(row.get(i)).map(_.toString).getOrElse(""))}</value></Data>"""
      }
      sb ++= "</ExtendedData>"
      if (kind == "point")
        sb ++= s"<Point><coordinates>${coord(pts.head)}</coordinates></Point>"
      else {
        // KML rings are explicitly closed: repeat the first vertex
        val ring = (pts :+ pts.head).map(coord).mkString(" ")
        sb ++= "<Polygon><outerBoundaryIs><LinearRing><coordinates>" +
          ring + "</coordinates></LinearRing></outerBoundaryIs></Polygon>"
      }
      sb ++= "</Placemark>\n"
    }
    sb ++= "</Document></kml>\n"
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, sb.toString)
  }

  private val formats: Map[String, (DataFrame, String) => Unit] = Map(
    "parquet" -> ((df, path) => df.write.mode("overwrite").parquet(path)),
    "json" -> ((df, path) => df.write.mode("overwrite").json(path)),
    "geojson" -> ((df, path) => renderGeometry(df).write.mode("overwrite").json(path)),
    "geojsonseq" -> ((df, path) => renderGeometry(df).write.mode("overwrite").json(path)),
    "csv" -> ((df, path) => renderWkt(df).write.mode("overwrite")
      .option("header", "true").csv(path)),
    "wkt" -> ((df, path) => renderWkt(df).write.mode("overwrite")
      .option("header", "true").csv(path)),
    "orc" -> ((df, path) => df.write.mode("overwrite").orc(path)),
    "avro" -> ((df, path) => Avro.write(df, path)),
    "kml" -> writeKml,
    "shapefile" -> ((df, path) => Shapefile.write(df, path)),
    "esri shapefile" -> ((df, path) => Shapefile.write(df, path)))

  def known: Seq[String] = formats.keys.toSeq.sorted

  /** Write with the named format; single-file output via coalesce(1)
    * only when the caller says the result is small. */
  def write(df: DataFrame, path: String, format: String = "parquet",
      singleFile: Boolean = false): Unit = {
    val writer = formats.getOrElse(format.toLowerCase,
      throw graft.core.DataIOError(path,
        s"unknown sink format '$format'; known: ${known.mkString(", ")}"))
    writer(if (singleFile) df.coalesce(1) else df, path)
  }

  /** S6 contract: a failed write must not fail the query — the error is
    * reported and the result DataFrame is still usable. Returns the
    * error message, if any. */
  def writeSafe(df: DataFrame, path: String, format: String = "parquet",
      singleFile: Boolean = false): Option[String] =
    try { write(df, path, format, singleFile); None }
    catch {
      case e: Exception =>
        System.err.println(s"[graft.io] write to '$path' ($format) failed: ${e.getMessage}")
        Some(e.getMessage)
    }
}
