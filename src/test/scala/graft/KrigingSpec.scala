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

  test("A7 golden: equilateral triangle — hand-solved system gives the exact mean") {
    // 3 sensors on an equilateral triangle (side 2): the single-bin
    // empirical variogram fits a pure-nugget linear model with
    // b = mean(0.5·Δv²) = 0.5·(4+49+25)/3 = 13. At the circumcenter
    // (equidistant), full symmetry forces λ = (1/3,1/3,1/3) exactly:
    // est = mean(v) = 4, variance = γ(r) + μ = b (± the 1e-10·h
    // regularizer). Hand-derived, no reference to the implementation.
    val s3 = math.sqrt(3.0)
    val sensors = Seq((0.0, 0.0, 1.0), (2.0, 0.0, 3.0), (1.0, s3, 8.0)).toDF("x", "y", "v")
    val out = Kriging.krige(sensors, "v", "linear",
      x0 = 1.0, y0 = 1.0 / s3, nx = 1, ny = 1).head
    assert(math.abs(out.getDouble(2) - 4.0) < 1e-8, "estimate = mean by symmetry")
    assert(math.abs(out.getDouble(3) - 13.0) < 1e-6, "variance = nugget 13")
  }

  test("A7 golden: collinear sensors — hand-solved λ = (1/2, 1/2, 0) and exact hit") {
    // sensors at x = 0,1,2 with v = 0,1,4. Empirical variogram:
    // bin1 (d=1 pairs): mean(0.5·1, 0.5·9) = 2.5 at h=1.0;
    // bin2 (d=2): 0.5·16 = 8 at h=5/3. Least-squares line:
    // a = (8−2.5)/(5/3−1) = 8.25, b = max(0, 5.25 − 8.25·4/3) = 0.
    // At (0.5, 0) the system solves BY HAND to λ = (1/2, 1/2, 0),
    // μ = 0 → est = 0.5 exactly, variance = 0.5·a = 4.125.
    // At (1, 0) — a sensor — λ = (0, 1, 0) → est = 1, variance = 0.
    val sensors = Seq((0.0, 0.0, 0.0), (1.0, 0.0, 1.0), (2.0, 0.0, 4.0)).toDF("x", "y", "v")
    val out = Kriging.krige(sensors, "v", "linear",
      x0 = 0.5, y0 = 0.0, nx = 2, ny = 1, stepX = 0.5).collect()
      .map(r => (r.getDouble(0), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    val (_, est1, var1) = out(0)
    val (_, est2, var2) = out(1)
    assert(math.abs(est1 - 0.5) < 1e-8, "λ=(1/2,1/2,0) → est 0.5")
    assert(math.abs(var1 - 4.125) < 1e-6, "variance = a/2 = 4.125")
    assert(math.abs(est2 - 1.0) < 1e-8, "exact hit at sensor 2")
    assert(math.abs(var2) < 1e-6, "zero variance at a sensor")
  }

  test("A7: weighted variogram fit recovers a known model and resists far-lag noise") {
    // exact spherical gammas: the weighted refinement must (a) fit exact
    // data essentially exactly, and (b) beat the moment fit when the
    // far-lag plateau is corrupted
    val sill = 10.0; val range = 8.0
    def sph(h: Double): Double =
      if (h >= range) sill else sill * (1.5 * h / range - 0.5 * math.pow(h / range, 3))
    val hs = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 9.0)
    val exact = hs.map(h => (h, sph(h), 10L))
    val fitted = Kriging.fitVariogramWeighted(exact, "spherical")
    val maxErr = hs.map(h => math.abs(fitted.gamma(h) - sph(h))).max
    assert(maxErr < 0.05, s"weighted fit off by $maxErr on exact data")

    // corrupt the two farthest lags (measurement noise at the plateau)
    val noisy = exact.zipWithIndex.map { case ((h, g, n), i) =>
      (h, if (i >= 6) g * 1.8 else g, n)
    }
    def nearErr(v: Kriging.Variogram): Double =
      hs.take(5).map(h => math.abs(v.gamma(h) - sph(h))).max
    val weighted = Kriging.fitVariogramWeighted(noisy, "spherical")
    val moment = Kriging.fitVariogram(noisy, "spherical")
    assert(nearErr(weighted) < nearErr(moment),
      s"weighted ${nearErr(weighted)} should beat moment ${nearErr(moment)} near the origin")
  }

  test("A7: q77's fixture pins the LU pivot order its oracle transliterates") {
    // q77's oracle hardcodes pivot order (2,0,1,3); this pin fails
    // loudly if a testdata refresh ever lands values that change the
    // elimination's pivot choices (the first pivot is structurally row
    // 2 — gamma(d02=10) is the column max for any slope/nugget >= 0)
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      if (new java.io.File(s"$dir/documents.parquet").exists()) {
        val pts = spark.read.parquet(s"$dir/documents.parquet")
          .filter(org.apache.spark.sql.functions.col("doc_id") < 3)
          .collect()
          .map(r => (r.getAs[Long]("doc_id") * 3.0, r.getAs[Long]("doc_id") * 4.0,
            r.getAs[Long]("n_chars").toDouble))
          .sortBy(p => (p._1, p._2))
        val emp = Kriging.empiricalVariogram(pts, 3)
        val vario = Kriging.fitVariogram(emp, "linear")
        val n = pts.length
        val k = Array.ofDim[Double](n + 1, n + 1)
        for (i <- 0 until n; j <- 0 until n)
          k(i)(j) = vario.gamma(Kriging.dist(pts(i)._1 - pts(j)._1, pts(i)._2 - pts(j)._2))
        for (i <- 0 until n) { k(i)(n) = 1.0; k(n)(i) = 1.0 }
        val piv = Kriging.luFactor(k)
        assert(piv.toSeq == Seq(2, 0, 1, 3), s"pivot order changed at sf$sf: ${piv.toSeq}")
      }
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
