package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Kriging

class KrigingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("LU solve round-trips a known system") {
    val a = Array(Array(2.0, 1.0, 1.0), Array(4.0, -6.0, 0.0), Array(-2.0, 7.0, 2.0))
    val orig = a.map(_.clone)
    val piv = Kriging.luFactor(a)
    val x = Kriging.luSolve(a, piv, Array(5.0, -2.0, 9.0))
    val back = orig.map(row => row.zip(x).map { case (c, v) => c * v }.sum)
    assert(back.zip(Array(5.0, -2.0, 9.0)).forall { case (g, w) => math.abs(g - w) < 1e-10 })
  }

  test("A7: exactness — kriging interpolates sensor values at sensor locations") {
    val sensors = Seq(
      (0.0, 0.0, 10.0), (10.0, 0.0, 20.0), (0.0, 10.0, 30.0),
      (10.0, 10.0, 40.0), (5.0, 5.0, 25.0)).toDF("x", "y", "v")
    // lattice chosen to land exactly on the sensor at (0,0) and (10,10)
    val out = Kriging.krige(sensors, "v", "linear",
      x0 = 0, y0 = 0, nx = 3, ny = 3, stepX = 5, stepY = 5).collect()
    val at00 = out.find(r => r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0).get
    val at55 = out.find(r => r.getDouble(0) == 5.0 && r.getDouble(1) == 5.0).get
    assert(math.abs(at00.getDouble(2) - 10.0) < 1e-6) // exact interpolation, nugget≈0
    assert(math.abs(at55.getDouble(2) - 25.0) < 1e-6)
    assert(at00.getDouble(3) < 1e-6) // kriging variance 0 at a sensor
  }

  test("A7: constant field predicts the constant everywhere (all models)") {
    val sensors = Seq((0.0, 0.0, 7.0), (4.0, 0.0, 7.0), (0.0, 4.0, 7.0), (4.0, 4.0, 7.0))
      .toDF("x", "y", "v")
    for (m <- Seq("linear", "gaussian", "spherical", "exponential")) {
      val out = Kriging.krige(sensors, "v", m, x0 = 1, y0 = 1, nx = 2, ny = 2,
        stepX = 2, stepY = 2).collect()
      assert(out.forall(r => math.abs(r.getDouble(2) - 7.0) < 1e-8),
        s"model $m should reproduce a constant field")
    }
  }

  test("A7: weights sum to 1 (unbiasedness) — prediction of shifted field shifts") {
    val sensors = Seq((0.0, 0.0, 1.0), (6.0, 0.0, 2.0), (0.0, 6.0, 3.0), (6.0, 6.0, 4.0))
      .toDF("x", "y", "v")
    val shifted = sensors.withColumn("v", org.apache.spark.sql.functions.col("v") + 100)
    val a = Kriging.krige(sensors, "v", "linear", 1, 1, 2, 2, 3, 3).collect()
      .map(r => ((r.getDouble(0), r.getDouble(1)), r.getDouble(2))).toMap
    val b = Kriging.krige(shifted, "v", "linear", 1, 1, 2, 2, 3, 3).collect()
      .map(r => ((r.getDouble(0), r.getDouble(1)), r.getDouble(2))).toMap
    a.foreach { case (key, v) => assert(math.abs(b(key) - v - 100.0) < 1e-8) }
  }
}
