package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.geo.Geo
import graft.ops.{Binning, Kriging, TimeSeriesOps, VectorOps}

/** Regressions for the round-1 self-review findings. */
class RegressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("withDerived derives MULTIPLE missing columns in one call") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("geometry", Geo.geometryType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(Row("polygon", Seq(Row(0.0, 0.0), Row(4.0, 0.0), Row(4.0, 2.0), Row(0.0, 2.0)))))),
      schema)
    val out = VectorOps.withDerived(df, Seq("area", "bounds_width"))
    val r = out.select("area", "bounds_width").head
    assert(r.getDouble(0) == 8.0 && r.getDouble(1) == 4.0)
  }

  test("cleanGeometries on an empty DataFrame returns (empty, 0, 0) — no NPE") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("geometry", Geo.geometryType)))
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val (clean, e, i) = VectorOps.cleanGeometries(empty)
    assert(clean.count() == 0 && e == 0 && i == 0)
  }

  test("gaussian variogram uses pykrige's (r*4/7)^2 denominator") {
    val v = Kriging.Variogram("gaussian", Array(1.0, 7.0, 0.0))
    // at h = r*4/7 = 4: gamma = 1 - exp(-1)
    assert(math.abs(v.gamma(4.0) - (1 - math.exp(-1))) < 1e-9)
  }

  test("cut on a constant column: every row lands in bucket 0 with a label") {
    val df = Seq(5.0, 5.0, 5.0).toDF("v")
    val out = Binning.cut(df, "v", 4).select("bucket", "intervals_v").collect()
    assert(out.forall(r => r.getInt(0) == 0 && r.getString(1) != null))
  }

  test("stBuffer centers on the polygon's AREA centroid, not its first vertex") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("geometry", Geo.geometryType)))
    val square = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(Row("polygon", Seq(Row(0.0, 0.0), Row(10.0, 0.0), Row(10.0, 10.0), Row(0.0, 10.0)))))),
      schema)
    val buf = square.select(Geo.stBuffer(col("geometry"), lit(1.0), lit(16)).as("b"))
    val c = buf.select(Geo.stX(Geo.stCentroid(col("b"))), Geo.stY(Geo.stCentroid(col("b")))).head
    assert(math.abs(c.getDouble(0) - 5.0) < 1e-9 && math.abs(c.getDouble(1) - 5.0) < 1e-9)
  }

  test("asofJoin: a right row with NULL payload supersedes older non-null rows") {
    val left = Seq((1L, ts("2024-01-01 11:30:00"), "q")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 11:00:00"), None: Option[Double])
    ).toDF("k", "t", "v")
    val out = TimeSeriesOps.asofJoin(left, right, "k", "t", Seq("v")).head
    assert(out.isNullAt(out.fieldIndex("asof_v")), "latest right row (null payload) must win")
  }

  test("JSON codec: non-finite numbers render as null and re-parse") {
    val p = graft.pipeline.Pipeline("p").addOperation(
      graft.pipeline.Operation("o", "filter", "x" -> graft.pipeline.JNum(Double.NaN)))
    val rendered = p.toJson.render
    assert(!rendered.contains("NaN"))
    val back = graft.pipeline.Pipeline.fromJson(rendered) // must not throw
    assert(back.operations.head.params("x") == graft.pipeline.JNull)
  }
}

class SketchLawSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("approx_count_distinct stays within its rsd bound on 50k keys") {
    val df = spark.range(50000).select((col("id") % 9173).as("k"))
    val Seq(exact, approx) = df
      .agg(countDistinct(col("k")).cast("double"),
        approx_count_distinct(col("k"), rsd = 0.02).cast("double"))
      .head.toSeq.map(_.asInstanceOf[Double])
    assert(exact == 9173.0)
    // HLL++ rsd is a standard deviation, not a hard bound — 5 sigma
    // would be astronomically unlikely; 3x slack keeps this stable
    assert(math.abs(approx - exact) / exact < 0.06,
      s"approx $approx vs exact $exact")
  }

  test("percentile_approx converges to the exact percentile as accuracy grows") {
    val df = spark.range(10000).select(col("id").cast("double").as("v"))
    val Seq(p50, p99) = df.agg(
      percentile_approx(col("v"), lit(0.5), lit(10000)),
      percentile_approx(col("v"), lit(0.99), lit(10000)))
      .head.toSeq.map(_.asInstanceOf[Double])
    assert(math.abs(p50 - 4999.5) <= 5.0)   // exact median of 0..9999
    assert(math.abs(p99 - 9899.0) <= 20.0)
  }

  test("normalizeText folds accents, case and whitespace into one dedup key") {
    import graft.ext.TextAnalysis
    val out = Seq("  Café  du\tMonde ", "cafe du monde", "Łódź — Ćwierć!")
      .toDF("t").select(TextAnalysis.normalizeText(col("t"))).as[String].collect()
    assert(out(0) == "cafe du monde" && out(0) == out(1))
    assert(out(2) == "lodz — cwierc!")
    // normalized texts hash to the same exact-dedup key
    val keys = Seq("Héllo  Wörld", "hello world").toDF("t")
      .select(xxhash64(TextAnalysis.normalizeText(col("t")))).as[Long].collect()
    assert(keys(0) == keys(1))
  }

  test("T1 variant: the built-in rate source streams through windowedStats") {
    val rate = spark.readStream.format("rate").option("rowsPerSecond", "500").load()
    val agg = graft.streaming.StreamOps.windowedStats(
      rate.withColumn("key", col("value") % 2), "timestamp", "key",
      "value", window = "1 second")
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("rate_smoke").start()
    try {
      // wait until rows actually flow (bounded retries, not a sleep race)
      var rows = 0L
      var tries = 0
      while (rows == 0 && tries < 20) {
        Thread.sleep(500)
        q.processAllAvailable()
        rows = spark.table("rate_smoke").count()
        tries += 1
      }
      assert(rows > 0, "the rate source must emit rows through windowedStats")
      assert(spark.table("rate_smoke").columns.contains("sum_value"))
    } finally q.stop()
  }
}
