package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A7 — ordinary kriging (reference: simple_kriging,
  * src/data_preprocessing.py:392-421, backed by pykrige 1.4).
  *
  * Structure (SURVEY §7.4): the kriging SYSTEM is solved on the driver —
  * it is (n+1)×(n+1) for n sensors, and the sensor fleet is the bounded
  * dimension of this workload (the reference collects the same data into
  * pykrige). The EVALUATION over the prediction lattice — the part that
  * scales with data volume — is distributed: LU factors are broadcast
  * and each partition back-substitutes its grid points (O(n²) per
  * point, no shuffle at all).
  *
  * Variogram models: the pykrige-1.4 set — linear, power, gaussian,
  * spherical, exponential — fit by least squares on the binned
  * empirical semivariogram. This is the documented scope; pykrige's
  * weighted fit refinements are out of scope.
  */
object Kriging {

  final case class Variogram(model: String, params: Array[Double]) {
    /** γ(h) for the fitted model, plus an infinitesimal linear term so a
      * degenerate (constant-field) variogram still yields a non-singular
      * kriging matrix; the term preserves γ(0)=nugget-exactness and the
      * Σλ=1 unbiasedness constraint. */
    def gamma(h: Double): Double = 1e-10 * h + (model match {
      case "linear" => params(0) * h + params(1) // slope, nugget
      case "power" => params(0) * math.pow(h, params(1)) + params(2)
      case "gaussian" =>
        // pykrige: exp(−h² / (r·4/7)²), i.e. r²·16/49 — not r²·4/7
        val Array(sill, range, nugget) = params
        val d = range * 4.0 / 7.0
        nugget + sill * (1 - math.exp(-(h * h) / (d * d)))
      case "spherical" =>
        val Array(sill, range, nugget) = params
        if (h >= range) nugget + sill
        else nugget + sill * (1.5 * h / range - 0.5 * math.pow(h / range, 3))
      case "exponential" =>
        val Array(sill, range, nugget) = params
        nugget + sill * (1 - math.exp(-h / (range / 3.0)))
      case other => sys.error(s"unknown variogram model '$other'")
    })
  }

  /** Euclidean distance as sqrt(dx·dx + dy·dy) — NOT math.hypot.
    * sqrt/mul/add are IEEE correctly-rounded, so this expression is
    * bit-identical in any engine that evaluates it as written (the
    * oracle's SQL does); hypot is only 1-ulp-accurate and its exact
    * result is implementation-defined. Coordinate magnitudes here are
    * far from the overflow regime hypot exists to handle. */
  @inline def dist(dx: Double, dy: Double): Double = math.sqrt(dx * dx + dy * dy)

  /** Empirical semivariogram on n·(n−1)/2 driver-side pairs, `nBins`
    * equal-width distance bins → (binCenter, gamma, count). */
  def empiricalVariogram(pts: Array[(Double, Double, Double)], nBins: Int)
      : Array[(Double, Double, Long)] = {
    val pairs = for {
      i <- pts.indices.iterator
      j <- (i + 1) until pts.length
    } yield {
      val d = dist(pts(i)._1 - pts(j)._1, pts(i)._2 - pts(j)._2)
      // dv·dv, not pow(dv, 2): pow's exactness is implementation-defined
      val dv = pts(i)._3 - pts(j)._3
      val g = 0.5 * (dv * dv)
      (d, g)
    }
    val all = pairs.toArray
    val dmax = all.map(_._1).max
    val w = dmax / nBins
    all.groupBy { case (d, _) => math.min((d / w).toInt, nBins - 1) }
      .toArray.sortBy(_._1)
      .map { case (b, xs) =>
        ((b + 0.5) * w, xs.map(_._2).sum / xs.length, xs.length.toLong)
      }
  }

  /** Least-squares fit of `model` to the empirical variogram. */
  def fitVariogram(emp: Array[(Double, Double, Long)], model: String): Variogram = {
    val hs = emp.map(_._1); val gs = emp.map(_._2)
    model match {
      case "linear" =>
        // minimize Σ (a·h + b − γ)²
        val n = hs.length.toDouble
        val sh = hs.sum; val sg = gs.sum
        val shh = hs.map(h => h * h).sum
        val shg = hs.zip(gs).map { case (h, g) => h * g }.sum
        val denom = n * shh - sh * sh
        val a = if (denom == 0) 0.0 else (n * shg - sh * sg) / denom
        val b = math.max(0.0, (sg - a * sh) / n)
        Variogram("linear", Array(math.max(a, 0.0), b))
      case "power" =>
        // log-space linear fit of γ ≈ s·h^e (nugget 0 seed); a constant
        // field has no positive gammas → degenerate flat variogram
        // (the ε·h regularizer in gamma() keeps the system solvable)
        val pos = hs.zip(gs).filter { case (h, g) => h > 0 && g > 0 }
        if (pos.isEmpty) return Variogram("power", Array(0.0, 1.0, 0.0))
        val lx = pos.map(p => math.log(p._1)); val ly = pos.map(p => math.log(p._2))
        val n = lx.length.toDouble
        val denom = n * lx.map(x => x * x).sum - math.pow(lx.sum, 2)
        val e = if (denom == 0) 1.0 else (n * lx.zip(ly).map(p => p._1 * p._2).sum - lx.sum * ly.sum) / denom
        val s = math.exp((ly.sum - e * lx.sum) / n)
        Variogram("power", Array(s, math.max(0.1, math.min(e, 1.99)), 0.0))
      case m @ ("gaussian" | "spherical" | "exponential") =>
        // moment-based fit: sill ≈ plateau, range ≈ dist where γ reaches 95% sill
        val sill = gs.max
        val target = 0.95 * sill
        val range = hs.zip(gs).find(_._2 >= target).map(_._1).getOrElse(hs.max)
        Variogram(m, Array(sill, math.max(range, 1e-9), 0.0))
      case other => sys.error(s"unknown variogram model '$other'")
    }
  }

  /** Weighted variogram fit (pykrige's `weight=True` refinement,
    * src/data_preprocessing.py:392-421 via pykrige 1.4): residuals are
    * weighted by DESCENDING lag order (w_i ∝ nBins − i, normalized), so
    * the near-origin structure — what kriging weights actually depend
    * on — dominates the fit instead of the noisy far-lag plateau.
    *
    * linear/power keep their closed-form solutions (weighting those is
    * a 2×2 normal-equation change with no behavioural payoff); the
    * three curved models refine the moment seed by a deterministic
    * bounded pattern search on (sill, range, nugget) minimizing
    * Σ wᵢ (γ_model(hᵢ) − γᵢ)². Driver-side, O(iters·nBins), nBins ≤ ~10. */
  def fitVariogramWeighted(emp: Array[(Double, Double, Long)], model: String): Variogram =
    model match {
      case "linear" | "power" => fitVariogram(emp, model)
      case m @ ("gaussian" | "spherical" | "exponential") =>
        val hs = emp.map(_._1); val gs = emp.map(_._2)
        val wRaw = hs.indices.map(i => (hs.length - i).toDouble)
        val w = wRaw.map(_ / wRaw.sum).toArray
        def loss(p: Array[Double]): Double = {
          val vg = Variogram(m, p)
          hs.indices.map(i => w(i) * math.pow(vg.gamma(hs(i)) - gs(i), 2)).sum
        }
        var best = fitVariogram(emp, m).params.clone()
        var bestLoss = loss(best)
        var step = 0.25
        var iter = 0
        while (step > 1e-4 && iter < 400) {
          var improved = false
          var j = 0
          while (j < 3) {
            for (dir <- Seq(1.0 + step, 1.0 / (1.0 + step))) {
              val cand = best.clone()
              cand(j) = math.max(if (j == 2) 0.0 else 1e-12, cand(j) * dir)
              // nugget can start at 0 — multiplicative moves never leave it;
              // give it an additive probe scaled by the sill
              if (j == 2 && best(2) == 0.0) cand(2) = best(0) * step * 0.1
              val l = loss(cand)
              if (l < bestLoss - 1e-15) { best = cand; bestLoss = l; improved = true }
            }
            j += 1
          }
          if (!improved) step /= 2
          iter += 1
        }
        Variogram(m, best)
      case other => sys.error(s"unknown variogram model '$other'")
    }

  /** LU decomposition with partial pivoting (in place); returns pivots. */
  def luFactor(a: Array[Array[Double]]): Array[Int] = {
    val n = a.length
    val piv = Array.tabulate(n)(identity)
    for (k <- 0 until n) {
      var p = k
      for (i <- (k + 1) until n) if (math.abs(a(i)(k)) > math.abs(a(p)(k))) p = i
      if (p != k) { val t = a(p); a(p) = a(k); a(k) = t; val tp = piv(p); piv(p) = piv(k); piv(k) = tp }
      val d = a(k)(k)
      require(math.abs(d) > 1e-300, "singular kriging matrix (duplicate sensor locations?)")
      for (i <- (k + 1) until n) {
        a(i)(k) /= d
        for (j <- (k + 1) until n) a(i)(j) -= a(i)(k) * a(k)(j)
      }
    }
    piv
  }

  def luSolve(lu: Array[Array[Double]], piv: Array[Int], b: Array[Double]): Array[Double] = {
    val n = lu.length
    val x = piv.map(b)
    for (i <- 1 until n; j <- 0 until i) x(i) -= lu(i)(j) * x(j)
    for (i <- (n - 1) to 0 by -1) {
      for (j <- (i + 1) until n) x(i) -= lu(i)(j) * x(j)
      x(i) /= lu(i)(i)
    }
    x
  }

  /** Ordinary kriging of `valueCol` onto an nx×ny lattice.
    * Returns (gx, gy, <valueCol>_krig, <valueCol>_krig_var). */
  def krige(
      sensors: DataFrame, valueCol: String, model: String = "linear",
      x0: Double = 0, y0: Double = 0, nx: Int = 10, ny: Int = 10,
      stepX: Double = 1, stepY: Double = 1, nBins: Int = 6,
      weightedFit: Boolean = false): DataFrame = {
    val spark = sensors.sparkSession

    // bounded driver collect — same regime as the reference feeding pykrige.
    // Duplicate sensor locations make the kriging matrix singular; collapse
    // them to their mean value first (standard practice; pykrige errors).
    // sorted: collect() row order depends on partitioning, and the LU
    // elimination's rounding (hence the last-ulp of every prediction)
    // depends on sensor order — sorting makes results reproducible
    // across cluster layouts (and lets q77's oracle mirror the solve)
    val pts = sensors.groupBy(col("x"), col("y"))
      .agg(avg(coalesce(col(valueCol), lit(0.0))).as("__v"))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
    require(pts.length >= 3, "kriging needs >= 3 sensors")
    val emp = empiricalVariogram(pts, math.min(nBins, pts.length))
    val vario =
      if (weightedFit) fitVariogramWeighted(emp, model) else fitVariogram(emp, model)

    // ordinary kriging system: K λ = k, K = [[γ(dij), 1], [1, 0]]
    val n = pts.length
    val k = Array.ofDim[Double](n + 1, n + 1)
    for (i <- 0 until n; j <- 0 until n)
      k(i)(j) = vario.gamma(dist(pts(i)._1 - pts(j)._1, pts(i)._2 - pts(j)._2))
    for (i <- 0 until n) { k(i)(n) = 1.0; k(n)(i) = 1.0 }
    k(n)(n) = 0.0
    val piv = luFactor(k)

    val bc = spark.sparkContext.broadcast((k, piv, pts, vario))
    val schema = StructType(Seq(
      StructField("gx", DoubleType), StructField("gy", DoubleType),
      StructField(s"${valueCol}_krig", DoubleType),
      StructField(s"${valueCol}_krig_var", DoubleType)))
    val grid = spark.range(nx.toLong * ny).rdd.map { id =>
      val (lu, pv, ps, vg) = bc.value
      val gx = x0 + (id % nx) * stepX
      val gy = y0 + (id / nx) * stepY
      val rhs = Array.tabulate(ps.length + 1) { i =>
        if (i < ps.length) vg.gamma(dist(gx - ps(i)._1, gy - ps(i)._2)) else 1.0
      }
      val lambda = luSolve(lu, pv, rhs)
      val est = (0 until ps.length).map(i => lambda(i) * ps(i)._3).sum
      val esv = (0 until ps.length).map(i => lambda(i) * rhs(i)).sum + lambda(ps.length)
      Row(gx, gy, est, esv)
    }
    spark.createDataFrame(grid, schema)
  }
}
