package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A9 — equal-width binning with pandas-cut-compatible labels, color
  * maps and style emission (reference: README.md:248-261 `get_intervals`,
  * `get_cm`, `get_styling_*`, `to_hex`).
  *
  * Observable contract reproduced exactly:
  *  - pd.cut makes n equal-width bins over [min, max], widening the
  *    FIRST bin's lower edge by 0.1% of the range so the minimum is
  *    included; labels are `str(Interval)` = "(lo, hi]" with the
  *    reference's `(` → `[` replacement applied (README.md:254-256);
  *  - edge values are printed with pandas' default 3-decimal rounding;
  *  - the color map is n hex colors linearly interpolated between two
  *    RGB endpoints (matplotlib-style `to_hex` lowercase output).
  *
  * The bin computation itself is one broadcast of a 1-row min/max agg +
  * a map-side expression — no extra shuffle at any scale.
  */
object Binning {

  /** pandas `_round_frac(x, precision=3)`: whole-part present → round
    * to 3 decimals; pure fraction → 3 significant fraction digits. */
  private[ops] def roundFrac(x: Double, precision: Int = 3): Double = {
    if (!java.lang.Double.isFinite(x) || x == 0.0) x
    else {
      val frac = x - x.toLong
      val digits =
        if (x.toLong == 0 && frac != 0)
          -math.floor(math.log10(math.abs(frac))).toInt - 1 + precision
        else precision
      BigDecimal(x).setScale(digits, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    }
  }

  /** pandas label: `str(Interval)` is "(lo, hi]"; the reference replaces
    * `(` with `[` (README.md:254-256). Scala's Double.toString matches
    * Python's shortest-repr for these rounded edges. */
  private[ops] def label(lo: Double, hi: Double): String =
    s"[${roundFrac(lo)}, ${roundFrac(hi)}]"

  private val labelUdf = udf((bucket: Int, mn: Double, mx: Double, n: Int) => {
    val width = (mx - mn) / n
    val adj = if (mx == mn) 0.001 else (mx - mn) * 0.001
    val lo = if (bucket == 0) mn - adj else mn + bucket * width
    val hi = mn + (bucket + 1) * width
    label(lo, hi)
  })

  /** Add `bucket` (0..n-1 int) and `intervals_<col>` (pandas-style
    * label) columns for n equal-width bins of `valueCol`. Bucketing is
    * exact arithmetic; only the label string goes through rounding
    * (matching pd.cut, which rounds breaks for display only). */
  def cut(df: DataFrame, valueCol: String, n: Int): DataFrame = {
    require(n >= 1, "need at least one bin")
    val bounds = df.agg(
      min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"))
    val withB = df.crossJoin(broadcast(bounds))
    val width = (col("__mx") - col("__mn")) / n
    // constant column → width 0 → x/0 is null in Spark SQL. DOCUMENTED
    // DIVERGENCE: we put constant values in bucket 0 with a degenerate
    // label; pandas pads both edges by 0.1% and lands them mid-bins —
    // the degenerate case has no meaningful binning either way
    // (pinned in RegressionSpec)
    val bucket = when(col("__mx") === col("__mn"), lit(0)).otherwise(
      least(greatest(
        ceil((col(valueCol) - col("__mn")) / width) - 1, lit(0)), lit(n - 1)))
      .cast("int")
    withB
      .withColumn("bucket", bucket)
      .withColumn(s"intervals_$valueCol",
        labelUdf(col("bucket"), col("__mn"), col("__mx"), lit(n)))
      .drop("__mn", "__mx")
  }

  /** Equal-FREQUENCY binning (pandas qcut's rank flavor): `bin` =
    * 1..n with bucket sizes differing by at most one, assigned by
    * exact global rank under the (valueCol, tieCol) total order —
    * bin = (rank−1)·n div N + 1, pure integer arithmetic shared by
    * any engine. Unlike [[cut]] (equal-width), the buckets hold equal
    * COUNTS, which is what score deciles / lift tables want.
    *
    * Scale: the rank comes from [[Ranking.globalRowNumber]] (range
    * repartition + bounded offset rollup — no single-partition
    * window); N is a 1-row broadcast. */
  def qcut(df: DataFrame, valueCol: String, tieCol: String, n: Int): DataFrame = {
    require(n >= 1, "need at least one bin")
    val ranked = Ranking.globalRowNumber(df, Seq(col(valueCol), col(tieCol)))
    val total = df.groupBy().agg(count(lit(1)).as("__N"))
    ranked.crossJoin(broadcast(total))
      .withColumn("bin", expr(s"(row_num - 1) * $n div __N + 1").cast("int"))
      .drop("__N", "row_num") // internals; the documented output adds only `bin`
  }

  /** Ordered distinct bin labels (the reference's
    * `sort_values().unique()` legend basis, README.md:252). */
  def legend(binned: DataFrame, valueCol: String): DataFrame =
    binned.select(col("bucket"), col(s"intervals_$valueCol"))
      .distinct().orderBy(col("bucket"))

  /** n hex colors linearly interpolated from `from` to `to` RGB —
    * matplotlib to_hex-style lowercase "#rrggbb" (README.md:243-246). */
  def colorMap(n: Int, from: (Int, Int, Int) = (255, 237, 160),
      to: (Int, Int, Int) = (189, 0, 38)): Seq[String] = {
    require(n >= 1)
    (0 until n).map { i =>
      val t = if (n == 1) 0.0 else i.toDouble / (n - 1)
      def mix(a: Int, b: Int) = math.round(a + (b - a) * t).toInt
      f"#${mix(from._1, to._1)}%02x${mix(from._2, to._2)}%02x${mix(from._3, to._3)}%02x"
    }
  }

  /** Style lines `<label> <color>` for legend/styling export — the
    * driver-side formatting analog of the reference's GeoServer/CAVI
    * style emitters (README.md:225-246). Pure formatting of the n
    * bucket bounds; no cluster work. */
  def styling(binned: DataFrame, valueCol: String): Seq[(String, String)] = {
    val labels = legend(binned, valueCol).collect()
      .map(r => r.getString(1))
    labels.toIndexedSeq.zip(colorMap(labels.length))
  }

  /** A9 — Fisher-Jenks natural breaks (Fisher, "On grouping for
    * maximum homogeneity", JASA 1958; Jenks' cartographic use): the
    * OPTIMAL k-class 1-D clustering minimizing within-class sum of
    * squared deviations, computed by exact dynamic programming over a
    * PRE-BINNED value rollup — the standard two-level scheme at
    * scale (the DP is O(bins²·k), so bins is the resolution/cost
    * knob; the data pass is one agg). Class costs are micro-quantized
    * from exact integer (n, Σv, Σv²) prefix differences, DP state is
    * integer sums of those terms, and argmin ties break to the LOWEST
    * split index — a pure function of the input that an engine
    * replaying the same DP table agrees with exactly.
    *
    * Returns one row per class: (class_id 1..k, bin_lo, bin_hi
    * [0-based, inclusive], n, cost_u).
    *
    * Scale: ONE (bin)-keyed agg with map-side combine over the data;
    * the ≤`nBins`-row rollup is a bounded driver solve (the kriging /
    * bin-labels license) and the DP is microseconds. */
  def jenksBreaks(df: DataFrame, valueCol: Column, nBins: Int,
      k: Int): DataFrame = {
    require(nBins >= 2 && k >= 2 && k <= nBins, "need 2 <= k <= nBins")
    val d38 = "decimal(38,0)"
    val v = valueCol.cast("long")
    val mm = df.agg(min(v).as("lo"), max(v).as("hi")).head()
    val lo = mm.getLong(0); val hi = mm.getLong(1)
    val width = hi - lo + 1
    val rolled = df
      // integer `div` (not `/`): the double quotient's rounding could
      // flip a floor at a bin boundary; div matches DuckDB's `//`
      .select(v.as("__v"))
      .select(expr(s"((__v - $lo) * $nBins) div $width").as("bin"),
        col("__v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__v").cast(d38)).as("s"),
        sum((col("__v") * col("__v")).cast(d38)).as("q"))
      .collect() // <= nBins rows — bounded driver solve by design
    val N = new Array[BigInt](nBins + 1)
    val S = new Array[BigInt](nBins + 1)
    val Q = new Array[BigInt](nBins + 1)
    N(0) = 0; S(0) = 0; Q(0) = 0
    val byBin = rolled.map(r => r.getLong(0).toInt ->
      (BigInt(r.getLong(1)), r.getDecimal(2).toBigInteger: BigInt,
        r.getDecimal(3).toBigInteger: BigInt)).toMap
    for (b <- 1 to nBins) {
      val (n, s, q) = byBin.getOrElse(b - 1, (BigInt(0), BigInt(0), BigInt(0)))
      N(b) = N(b - 1) + n; S(b) = S(b - 1) + s; Q(b) = Q(b - 1) + q
    }
    // class cost over 1-based bins [i, j]: micro-quantized SSE in
    // 1e6-cents² units — the double chain mirrored by the oracle
    def cost(i: Int, j: Int): Long = {
      val n = (N(j) - N(i - 1)).toDouble
      if (n == 0) 0L
      else {
        val s = (S(j) - S(i - 1)).toDouble
        val q = (Q(j) - Q(i - 1)).toDouble
        math.round((q - s * s / n) / 1000000.0)
      }
    }
    // DP: d(kk)(j) = best cost of kk classes over bins 1..j; best(kk)(j)
    // = the LOWEST argmin start of the last class
    val dp = Array.ofDim[Long](k + 1, nBins + 1)
    val best = Array.ofDim[Int](k + 1, nBins + 1)
    for (j <- 1 to nBins) { dp(1)(j) = cost(1, j); best(1)(j) = 1 }
    for (kk <- 2 to k; j <- kk to nBins) {
      var bv = Long.MaxValue; var bi = -1
      for (i <- kk to j) {
        val c = dp(kk - 1)(i - 1) + cost(i, j)
        if (c < bv) { bv = c; bi = i }
      }
      dp(kk)(j) = bv; best(kk)(j) = bi
    }
    // backtrack the k class start bins
    val starts = new Array[Int](k + 1)
    var j = nBins
    for (kk <- k to 1 by -1) { starts(kk) = best(kk)(j); j = starts(kk) - 1 }
    val spark = df.sparkSession
    import spark.implicits._
    (1 to k).map { kk =>
      val i = starts(kk)
      val jj = if (kk == k) nBins else starts(kk + 1) - 1
      (kk.toLong, (i - 1).toLong, (jj - 1).toLong,
        (N(jj) - N(i - 1)).toLong, cost(i, jj))
    }.toDF("class_id", "bin_lo", "bin_hi", "n", "cost_u")
  }
}
