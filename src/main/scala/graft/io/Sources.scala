package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.DataIOError

/** Source registry (SURVEY.md S1-S4).
  *
  * Reproduces the reference's reader cascade and directory-union
  * semantics with Spark-native readers:
  *  - `openData` — try CSV, then JSON, raise listing what failed
  *    (reference: src/data_preprocessing.py:444-458; xlsx leg is
  *    documented-unsupported here: no POI jar in the image, the
  *    error cascade contract is kept);
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

  /** S2 — tabular reader cascade: CSV → JSON → DataIOError. A `.json`
    * extension flips the attempt order: the CSV reader "succeeds" on
    * JSON text by comma-splitting it, so extension is the stronger
    * signal and the cascade remains the fallback contract. */
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
    val attempts =
      if (path.toLowerCase.endsWith(".json")) Seq(jsonAttempt, csvAttempt)
      else Seq(csvAttempt, jsonAttempt)
    val errors = Seq.newBuilder[String]
    attempts.foreach { case (fmt, read) =>
      try return read()
      catch { case e: Exception => errors += s"$fmt: ${e.getMessage}" }
    }
    throw DataIOError(path, errors.result().mkString("; ") +
      "; xlsx: unsupported (no spreadsheet codec in this build)")
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
