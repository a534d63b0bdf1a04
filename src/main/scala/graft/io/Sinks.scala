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

  private val formats: Map[String, (DataFrame, String) => Unit] = Map(
    "parquet" -> ((df, path) => df.write.mode("overwrite").parquet(path)),
    "json" -> ((df, path) => df.write.mode("overwrite").json(path)),
    "geojson" -> ((df, path) => renderGeometry(df).write.mode("overwrite").json(path)),
    "csv" -> ((df, path) => df.write.mode("overwrite").option("header", "true").csv(path)),
    "orc" -> ((df, path) => df.write.mode("overwrite").orc(path)),
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
