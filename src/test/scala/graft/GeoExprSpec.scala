package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Row, SparkSession}
import graft.geo.{Geo, GeoExpressions, GeoMath}

class GeoExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("st_haversine: native expression matches scalar math and known distance") {
    // Paris -> London ≈ 343.5 km
    val df = Seq((2.3522, 48.8566, -0.1276, 51.5072)).toDF("lon1", "lat1", "lon2", "lat2")
    val got = df.select(GeoExpressions.stHaversine(
      col("lon1"), col("lat1"), col("lon2"), col("lat2"))).head.getDouble(0)
    assert(math.abs(got / 1000 - 343.5) < 1.0)
    assert(got == GeoMath.haversine(2.3522, 48.8566, -0.1276, 51.5072))
  }

  test("st_haversine: stays inside WholeStageCodegen (no UDF boundary)") {
    val df = spark.range(100).select(
      (col("id") % 360 - 180).cast("double").as("lon"),
      (col("id") % 180 - 90).cast("double").as("lat"))
    val out = df.select(GeoExpressions.stHaversine(col("lon"), col("lat"), lit(0.0), lit(0.0)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)")) // the WholeStageCodegen marker
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    assert(out.count() == 100)
  }

  test("st_haversine null propagation (nullIntolerant)") {
    val df = Seq((Some(1.0), None: Option[Double])).toDF("a", "b")
    val r = df.select(GeoExpressions.stHaversine(col("a"), col("b"), lit(0.0), lit(0.0))).head
    assert(r.isNullAt(0))
  }

  test("SQL surface: registerSql exposes st_haversine/st_distance to spark.sql") {
    Geo.registerSql(spark)
    val km = spark.sql(
      "SELECT st_haversine(2.3522D, 48.8566D, -0.1276D, 51.5072D) / 1000").head.getDouble(0)
    assert(math.abs(km - 343.5) < 1.0)
  }

  test("SparkSessionExtensions: st_haversine available via withExtensions") {
    val s2 = SparkSession.builder().master("local[2]")
      .appName("ext-test").config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    try {
      val m = s2.sql("SELECT st_haversine(0D, 0D, 0D, 1D)").head.getDouble(0)
      assert(math.abs(m - 111195.0) < 100.0) // 1 degree of latitude
    } finally () // shared-context session; do not stop the underlying SC
  }

  test("S5: GeoJSON and WKT rendering, ring closed") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("geometry", Geo.geometryType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(Row("point", Seq(Row(1.5, 2.5)))),
      Row(Row("polygon", Seq(Row(0.0, 0.0), Row(1.0, 0.0), Row(1.0, 1.0)))))), schema)
    val out = df.select(Geo.stAsGeoJson(col("geometry")).as("gj"),
      Geo.stAsText(col("geometry")).as("wkt")).collect()
    assert(out(0).getString(0) == """{"type":"Point","coordinates":[1.5,2.5]}""")
    assert(out(0).getString(1) == "POINT (1.5 2.5)")
    assert(out(1).getString(0) ==
      """{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]}""")
    assert(out(1).getString(1) == "POLYGON ((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 0.0))")
  }

  test("S5: geojson sink renders geometry columns") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("geometry", Geo.geometryType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, Row("point", Seq(Row(3.0, 4.0)))))), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft_geojson").toString
    assert(graft.io.Sinks.writeSafe(df, s"$dir/out", "geojson", singleFile = true).isEmpty)
    val back = spark.read.json(s"$dir/out")
    assert(back.select("geometry").as[String].head.contains("\"type\":\"Point\""))
  }
}
