package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Golden E2E (SURVEY §5.2 item 4): the reference README's UHI
  * walkthrough (README.md:265-285) — raster buffer aggregation over
  * sensors, dropna, equal-width binning with interval labels — run as a
  * JSON-round-tripped pipeline spec end-to-end. */
class GoldenUhiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("golden: UHI pipeline — raster buffer agg -> dropna -> get_intervals") {
    // synthetic 2-band raster cell table, nodata=0 stripes
    val cells = spark.range(2 * 30 * 30).select(
      (col("id") % 2 + 1).cast("int").as("band"),
      expr("CAST((id div 2) % 30 AS DOUBLE)").as("x"),
      expr("CAST((id div 2) div 30 AS DOUBLE)").as("y"),
      expr("CASE WHEN id % 7 = 0 THEN 0.0 ELSE CAST((id * 31) % 50 AS DOUBLE) + 10.0 END")
        .as("value"))
    val dir = java.nio.file.Files.createTempDirectory("graft_uhi").toString
    cells.write.mode("overwrite").parquet(s"$dir/raster")

    // sensor fleet; two sensors placed off-raster to exercise the NaN-row path
    val sensors = Seq(
      (1L, 5.0, 5.0), (2L, 15.0, 10.0), (3L, 25.0, 25.0),
      (4L, 500.0, 500.0), (5L, -100.0, -100.0)
    ).toDF("id_sensor", "x", "y")

    val spec = Pipeline("uhi")
      .addOperation(Operation("heat", "add_raster_buffer_data",
        "file" -> JStr(s"$dir/raster"), "raster_name" -> JStr("uhi"),
        "radius" -> JNum(4), "funcs" -> JArr(Vector(JStr("mean"), JStr("max")))))
      .addOperation(Operation("drop_missing", "dropna",
        "columns" -> JArr(Vector(JStr("mean_uhi_band1")))))
      .addOperation(Operation("bins", "get_intervals",
        "column" -> JStr("mean_uhi_band1"), "n" -> JNum(3)))

    // the full spec must survive the JSON codec (provenance contract)
    val (out, validated) = Pipeline.fromJson(spec.toJson.render).run(
      sensors, specOut = Some(dir))
    validated.requireValidated()

    val rows = out.orderBy("id_sensor").collect()
    // off-raster sensors dropped by dropna (reference NaN-row + dropna op)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // the func × raster × band naming contract (:195-197)
    val cols = out.columns.toSet
    assert(Set("mean_uhi_band1", "max_uhi_band1", "mean_uhi_band2", "max_uhi_band2",
      "bucket", "intervals_mean_uhi_band1").subsetOf(cols))
    // nodata cells excluded: all means strictly above the 10.0 floor
    assert(rows.forall(_.getAs[Double]("mean_uhi_band1") >= 10.0))
    // labels are pandas-style "[lo, hi]"
    assert(rows.forall(_.getAs[String]("intervals_mean_uhi_band1").matches(
      """\[-?\d+(\.\d+)?, -?\d+(\.\d+)?\]""")))
    // provenance spec written and reloadable
    val reloaded = Pipeline.fromJsonFile(s"$dir/uhi_pipe.json")
    assert(reloaded.operations.map(_.function) ==
      Vector("add_raster_buffer_data", "dropna", "get_intervals"))
  }
}
