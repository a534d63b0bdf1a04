package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Example user aggregator for the X2 extension surface: geometric
  * mean via a typed `Aggregator` registered through `functions.udaf` —
  * the path a user takes to bring "any iterable -> scalar" callable
  * (reference contract :176-177) into the engine under a name. */
object GeoMeanAggregator extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) =
    (b._1 + math.log(a), b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Named aggregation-function registry (SURVEY.md X2).
  *
  * The reference accepts any `iterable -> scalar` callable and keys the
  * output column name on the function's `__name__`
  * (reference: src/data_preprocessing.py:176-177, :197). We keep the
  * same observable contract — a registry of named aggregators plus the
  * deterministic `func_source_col` naming product (F1, reference :197,
  * :226) — while each built-in maps to a codegen'd Catalyst aggregate.
  *
  * Trap pinned here: numpy's `np.std` defaults to POPULATION std
  * (ddof=0), so "std" maps to `stddev_pop`, not Spark's default
  * `stddev` (= sample std). A silent-wrong-answer divergence otherwise.
  */
object Aggregates {

  // ---- by-design plan-hazard documentation (Guardrails.expect) ------
  // Each entry registers a deliberately-BOUNDED single-partition window
  // or unconditioned join this object builds, with its boundedness
  // argument, so the optimizer audit (PlanAudit / the Guardrails rule)
  // flags only NEW hazards instead of letting them hide among known
  // ones. Markers are operator-owned columns of the hazard plan node.
  graft.plans.Guardrails.expect("single_partition_window",
    "__v, __cnt, __ca", "mannWhitneyU: distinct-value rank rollup",
    "rollup")
  graft.plans.Guardrails.expect("cartesian_join",
    "__c1, __c2", "ransacLine: rollup-pair candidate lines (x1 < x2)",
    "rollup")
  graft.plans.Guardrails.expect("cartesian_join",
    "__dx, __dy", "ransacLine: candidate x point inlier tests " +
      "(rollup-cubed altitude, calendar-grain inputs only)",
    "rollup")
  graft.plans.Guardrails.expect("cartesian_join",
    "n_points, __nd", "ransacLine: 1-row totals broadcast",
    "k-literal")
  graft.plans.Guardrails.expect("cartesian_join",
    "n_candidates", "ransacLine: 1-row candidate-count broadcast",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__v, __ca, __cb", "cliffsDelta: distinct-value cumulative rollup",
    "rollup")
  graft.plans.Guardrails.expect("cartesian_join",
    "__tsa, __wsa", "yuenTrimmedT: 1-row-per-group finish broadcast",
    "k-literal")
  graft.plans.Guardrails.expect("cartesian_join",
    "__r, __c", "chiSquare/cramersV: r x c contingency-cell frame, k-row broadcast",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "__cuma, __cumb", "ksTest/wasserstein1: distinct-value CDF rollup",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "__na, __nb", "ksTest/wasserstein1: 1-row totals over the value rollup",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__cn, __cs, __t, __y",
    "binarySegmentation: prefix walk over the bounded series rollup",
    "calendar")
  graft.plans.Guardrails.expect("cartesian_join",
    "__rt, __rcn, __rcs",
    "binarySegmentation: 1-row root-split frame broadcast to the sides",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__v, __ca, __cb", "wasserstein1: distinct-value gap rollup",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "__W, ", "largestRemainder: |keys|-row seat table",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "__floor, __rem", "largestRemainder: |keys|-row remainder rank",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "__left", "largestRemainder: |keys|-row shortfall assignment",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "digit, exp_ppm", "benfordProfile: 9-row digit frame",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__K, __N", "skewAudit: top-k key rollup",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__rn, __k, __cnt", "skewAudit: top-k key rank",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__v, __cv", "kruskalWallis: distinct-value tie rollup",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "__ad, __c", "wilcoxonSignedRank: distinct-|diff| rank rollup",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "__t, __v", "ljungBox/xmr/acf: calendar-bounded series rollup",
    "calendar")
  graft.plans.Guardrails.expect("single_partition_window",
    "__rn, __x", "hillTailIndex: top-k order-statistic frame",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__v, __c, __s", "lorenzCurve: distinct-value cumulative rollup",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "__val, __cb", "abcClassification: |items|-row value rollup",
    "vocabulary")
  graft.plans.Guardrails.expect("single_partition_window",
    "__k, __val", "abcClassification: |items|-row rank",
    "vocabulary")
  graft.plans.Guardrails.expect("single_partition_window",
    "abc_class", "abcClassification: 3-row class finish",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__v, __c", "quantileNormalize/binned: distinct-value CDF rollup",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "__pv, d, v", "runsTest: day-rollup lag",
    "calendar")
  graft.plans.Guardrails.expect("single_partition_window",
    "__prev, __t, __f", "runsTest: day-rollup run flags",
    "calendar")
  graft.plans.Guardrails.expect("cartesian_join",
    "loa_low, loa_high", "blandAltman: 1-row limits broadcast",
    "k-literal")



  /** name -> column aggregator (@volatile: registered on one thread,
    * read from any plan-building thread) */
  @volatile private var registry: Map[String, Column => Column] = Map(
    "mean" -> (c => avg(c)),
    "max" -> (c => max(c)),
    "min" -> (c => min(c)),
    "std" -> (c => stddev_pop(c)), // numpy ddof=0 semantics
    "var" -> (c => var_pop(c)),
    "sum" -> (c => sum(c)),
    "count" -> (c => count(c)),
    "median" -> (c => median(c)),
    "first" -> (c => first(c, ignoreNulls = true)),
    "last" -> (c => last(c, ignoreNulls = true)),
    // X2 user-aggregator example: typed Aggregator via functions.udaf
    "geomean" -> { val u = udaf(GeoMeanAggregator); c => u(c) },
    // X2/E6 production-shaped aggregator: exact bitmap distinct over a
    // dense bounded id domain — the NATIVE TypedImperativeAggregate
    // (see ext.BitmapDistinctExpr; the udaf twin is the API example)
    "bitmap_distinct" ->
      (c => graft.ext.BitmapDistinct.bitmapDistinct(c, 1 << 20)))

  /** Register a user aggregator under a name (the reference's "any
    * callable" surface; users bring `functions.udaf(Aggregator)` here). */
  def register(name: String, f: Column => Column): Unit = synchronized {
    registry = registry + (name -> f)
  }

  def apply(name: String): Column => Column =
    registry.getOrElse(name,
      throw graft.core.UnknownFunction(name, registry.keys.toSeq.sorted))

  def known: Seq[String] = registry.keys.toSeq.sorted

  /** The reference's deterministic output-name product:
    * `'_'.join([func.__name__, name, col])` (reference :197, :226). */
  def statName(func: String, source: String, col: String): String =
    Seq(func, source, col).filter(_.nonEmpty).mkString("_")

  /** The func × cols aggregation block (A1): everything in ONE
    * hash-aggregate pass instead of the reference's per-row applies. */
  def block(funcs: Seq[String], source: String, cols: Seq[String]): Seq[Column] =
    for (f <- funcs; c <- cols)
      yield apply(f)(col(c)).as(statName(f, source, c))

  /** Per-key ordinary least squares + Pearson correlation via EXACT
    * integer sums — not the corr()/regr_slope() builtins, whose online
    * (Welford-style) accumulation is engine- and order-dependent. With
    * integer-valued x and y, every sum (Σx, Σy, Σxy, Σx², Σy²) is
    * exact in long arithmetic regardless of partitioning, so the final
    * slope/intercept/corr divisions and sqrts are bit-identical on any
    * engine that evaluates the same closed-form expression (IEEE
    * division and sqrt are correctly rounded). One hash-agg pass.
    *
    * Emits (key…, n, slope, intercept, corr); degenerate keys
    * (zero x-variance or zero y-variance) yield nulls. */
  def linearFitExact(df: org.apache.spark.sql.DataFrame, keys: Seq[Column],
      x: Column, y: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val agg = df.groupBy(keys: _*).agg(
      count(lit(1)).as("n"),
      sum(x.cast("long")).as("sx"), sum(y.cast("long")).as("sy"),
      sum((x.cast("long") * y.cast("long"))).as("sxy"),
      sum((x.cast("long") * x.cast("long"))).as("sxx"),
      sum((y.cast("long") * y.cast("long"))).as("syy"))
    val covN = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val varXN = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val varYN = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    agg.select((keys :+ col("n") :+
      when(varXN =!= 0.0, covN / varXN).as("slope") :+
      when(varXN =!= 0.0,
        (col("sy").cast("double") - (covN / varXN) * col("sx")) / col("n"))
        .as("intercept") :+
      when(varXN =!= 0.0 && varYN =!= 0.0,
        covN / (sqrt(varXN) * sqrt(varYN))).as("corr")): _*)
  }

  /** A-quantile — weighted median (lower convention): per key, the
    * smallest value whose cumulative weight reaches half the total —
    * the quantile Spark has no builtin for when rows carry integer
    * multiplicities (quantities, token counts, durations). The
    * crossing test is all-integer (2·cumw ≥ W); the value column is
    * never touched arithmetically, so results hash-match unrounded.
    * Ties in the value are safe: any tie order crosses inside the
    * same value run.
    *
    * Scale: one key-partitioned window sort (the same q07 envelope) +
    * a |keys|-row min. */
  def weightedMedian(df: org.apache.spark.sql.DataFrame, keys: Seq[Column],
      valueCol: Column, weightCol: Column,
      tieCols: Seq[Column]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    weightedQuantile(df, keys, valueCol, weightCol, tieCols, 1, 2)
      .withColumnRenamed("weighted_quantile", "weighted_median")
  }

  /** A-quantile — generalized exact weighted LOWER quantile: per key,
    * the smallest value whose cumulative weight reaches qNum/qDen of
    * the total (crossing test cumw·qDen ≥ W·qNum, all-integer). The
    * p10/p90 form is the winsorization primitive; qNum/qDen = 1/2 is
    * [[weightedMedian]]. */
  def weightedQuantile(df: org.apache.spark.sql.DataFrame, keys: Seq[Column],
      valueCol: Column, weightCol: Column, tieCols: Seq[Column],
      qNum: Long, qDen: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    require(qNum > 0 && qDen > 0 && qNum <= qDen, "quantile qNum/qDen in (0, 1]")
    // empty keys would silently plan the global single-partition
    // window this codebase forbids; empty ties weaken the total order
    require(keys.nonEmpty, "weightedQuantile requires at least one key column " +
      "(use a constant literal key for a global quantile)")
    require(tieCols.nonEmpty, "weightedQuantile requires tie-break column(s) " +
      "for a total order")
    val w = Window.partitionBy(keys: _*)
      .orderBy((valueCol +: tieCols).map(_.asc): _*)
    val total = Window.partitionBy(keys: _*)
    df.withColumn("__w", weightCol.cast("long"))
      .withColumn("__cumw", sum(col("__w")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__W", sum(col("__w")).over(total))
      .filter(col("__cumw") * qDen >= col("__W") * qNum)
      .groupBy(keys: _*)
      .agg(min(valueCol).as("weighted_quantile"),
        min(col("__W")).as("total_weight"))
  }

  /** A-stat — Mann–Whitney U (Wilcoxon rank-sum) between two groups,
    * all-integer: the A/B significance primitive for skewed metrics
    * where the t-test's normality assumption fails. Tie handling is
    * the textbook average rank, kept integral by working with DOUBLED
    * ranks (first+last of each tie run), so
    *   u2_a = 2·U_A = Σ_A rank2 − n_a·(n_a+1)
    * is exact on any engine/partitioning; the rank-biserial effect
    * size r = u2_a/(n_a·n_b) − 1 is the one float op (identical
    * operands). Returns (n_a, n_b, u2_a, rank_biserial).
    *
    * Scale: ranks come from a DISTINCT-VALUE rollup (value, count,
    * group-A count) — the ordered window runs on the rollup (the
    * skyline/globalRowNumber trick), never the fact table; all sums
    * widen to DECIMAL(38,0) before multiplying. */
  def mannWhitneyU(df: org.apache.spark.sql.DataFrame, valueCol: Column,
      groupCol: Column, groupA: String,
      groupB: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val d = df.filter(groupCol.isin(groupA, groupB))
      .select(groupCol.as("__g"), valueCol.as("__v"))
    val perV = d.groupBy(col("__v")).agg(count(lit(1)).as("__cnt"),
      sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("__ca"))
    val before = coalesce(sum(col("__cnt")).over(
      Window.orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    perV
      .withColumn("__rank2", lit(2) * before + col("__cnt") + 1)
      .agg(sum(col("__ca")).as("n_a"),
        sum(col("__cnt") - col("__ca")).as("n_b"),
        sum(col("__ca").cast(d38) * col("__rank2").cast(d38)).cast(d38).as("__r2a"))
      .withColumn("u2_a",
        col("__r2a") - col("n_a").cast(d38) * (col("n_a") + 1).cast(d38))
      .select(col("n_a"), col("n_b"), col("u2_a").cast("long").as("u2_a"),
        (col("u2_a").cast("double") /
          (col("n_a").cast(d38) * col("n_b").cast(d38)).cast("double") - 1)
          .as("rank_biserial"))
  }

  /** A-stat — two-sample Cramér–von Mises test statistic (Anderson
    * 1962, "On the distribution of the two-sample Cramér–von Mises
    * criterion"): the WHOLE-distribution distance between two
    * samples,
    *   T = U/(nm·N) − (4nm−1)/(6N),  N = n+m,
    *   U = n·Σᵢ(rᵢ−i)² + m·Σⱼ(sⱼ−j)²
    * (r/s = combined-sample ranks of each sample's ordered values) —
    * more sensitive than Kolmogorov–Smirnov to differences spread
    * across the distribution rather than concentrated at one point.
    * Tie handling: doubled midranks (the q152 device) and doubled
    * within-sample indices, so U₄ = 4U stays an exact integer; each
    * distinct value contributes a CLOSED-FORM range sum
    *   Σ_{i=p+1}^{p+c} (r₂ − 2i)² = c·r₂² − 4r₂·ΣI + 4·ΣI²
    * — never a per-row walk. Returns one row:
    * (n_a, n_b, u4, t_cvm).
    *
    * Scale: one distinct-value rollup with map-side combine; the
    * cumulative window is rollup-sized; the finish is one row. */
  def cramerVonMises2(df: org.apache.spark.sql.DataFrame, valueCol: Column,
      groupCol: Column, groupA: String,
      groupB: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val d = df.filter(groupCol.isin(groupA, groupB))
      .select(groupCol.as("__g"), valueCol.cast("long").as("__v"))
    val perV = d.groupBy(col("__v")).agg(count(lit(1)).as("__cnt"),
      sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("__ca"))
    val pre = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // Σ_{i=p+1..p+c} (r2 − 2i)² = c·r2² − 4·r2·(c·p + T) +
    //   4·(c·p² + 2p·T + F6), T = c(c+1)/2, F6 = c(c+1)(2c+1)/6.
    // Spark's decimal `div` silently wraps past 2^63, so T and F6
    // divide the SMALL factors first (one of {c, c+1} is even; one of
    // {c, c+1, 2c+1} is divisible by 3 — and a factor already halved
    // keeps its divisibility by 3 because 6 | the original) and only
    // then multiply in decimal(38,0) — exact at any N.
    def tHalf(cn: String): Column = expr(
      s"""CASE WHEN $cn % 2 = 0
         |  THEN cast($cn div 2 as decimal(38,0)) * ($cn + 1)
         |  ELSE cast($cn as decimal(38,0)) * (($cn + 1) div 2) END"""
        .stripMargin).cast(d38)
    def f6(cn: String): Column = expr(
      s"""cast(CASE WHEN $cn % 3 = 0 THEN
         |    CASE WHEN $cn % 2 = 0 THEN ($cn div 2) div 3
         |         ELSE $cn div 3 END
         |  ELSE CASE WHEN $cn % 2 = 0 THEN $cn div 2 ELSE $cn END END
         |  as decimal(38,0))
         |* (CASE WHEN ($cn + 1) % 3 = 0 AND $cn % 3 <> 0 THEN
         |     CASE WHEN $cn % 2 = 0 THEN ($cn + 1) div 3
         |          ELSE (($cn + 1) div 2) div 3 END
         |   ELSE CASE WHEN $cn % 2 = 0 THEN $cn + 1
         |        ELSE ($cn + 1) div 2 END END)
         |* (CASE WHEN $cn % 3 <> 0 AND ($cn + 1) % 3 <> 0
         |   THEN (2 * $cn + 1) div 3 ELSE 2 * $cn + 1 END)"""
        .stripMargin).cast(d38)
    def rangeSum(r2: Column, p: Column, c: Column, cn: String): Column = {
      def dd(x: Column) = x.cast(d38)
      val t = tHalf(cn)
      (dd(c) * dd(r2) * dd(r2) -
        dd(r2) * (dd(c) * dd(p) + t) * 4 +
        (dd(c) * dd(p) * dd(p) + dd(p) * t * 2 + f6(cn)) * 4).cast(d38)
    }
    val staged = perV
      .withColumn("__cb", col("__cnt") - col("__ca"))
      .withColumn("__pa", coalesce(sum(col("__ca")).over(pre), lit(0L)))
      .withColumn("__pb", coalesce(sum(col("__cb")).over(pre), lit(0L)))
      .withColumn("__r2",
        (col("__pa") + col("__pb")) * 2 + col("__cnt") + 1)
      .withColumn("__sa4",
        rangeSum(col("__r2"), col("__pa"), col("__ca"), "__ca"))
      .withColumn("__sb4",
        rangeSum(col("__r2"), col("__pb"), col("__cb"), "__cb"))
    staged.agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"),
        sum(col("__sa4")).cast(d38).as("__ta"),
        sum(col("__sb4")).cast(d38).as("__tb"))
      .withColumn("__u4",
        (col("n_a").cast(d38) * col("__ta") +
          col("n_b").cast(d38) * col("__tb")).cast(d38))
      // u4 itself exceeds BIGINT at scale (O(n·N³)); only the
      // normalized statistic leaves the operator
      .select(col("n_a"), col("n_b"),
        round(col("__u4").cast("double") /
          (col("n_a").cast(d38) * col("n_b").cast(d38) *
            (col("n_a") + col("n_b")).cast(d38) * 4).cast("double") -
          (col("n_a").cast(d38) * col("n_b").cast(d38) * 4 - 1)
            .cast("double") /
            ((col("n_a") + col("n_b")).cast(d38) * 6).cast("double"), 6)
          .as("t_cvm"))
  }

  /** A-stat — chi-square independence statistic over an R×C
    * contingency of two categorical columns:
    *   χ² = Σ_cells (o·N − r·c)² / (N·r·c)
    * (the (o−e)²/e form cleared of fractions). Each cell's term is a
    * quotient of exact DECIMAL(38,0) integer products, quantized to
    * micro-units before the sum so accumulation order cannot move a
    * bit (the q74 trick). Returns one row: (chi2, dof, n).
    *
    * Scale: one (r, c) agg + two marginal rollups joined back —
    * contingency-sized, never data-sized. */
  def chiSquare(df: org.apache.spark.sql.DataFrame, rowCol: Column,
      colCol: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val d38 = "decimal(38,0)"
    val observed = df.groupBy(rowCol.as("__r"), colCol.as("__c"))
      .agg(count(lit(1)).as("__o"))
    val rm = observed.groupBy(col("__r")).agg(sum(col("__o")).as("__rn"))
    val cm = observed.groupBy(col("__c")).agg(sum(col("__o")).as("__cn"))
    // ZERO cells still contribute (o=0 → term = r·c/N): densify to the
    // full R×C grid — contingency-sized, so the crossJoin is bounded
    val cells = rm.select(col("__r")).crossJoin(broadcast(cm.select(col("__c"))))
      .join(observed, Seq("__r", "__c"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
    // Spark name resolution is case-insensitive: totals must not
    // collide with the __r/__c keys, hence __dr/__dc/__tot
    val tot = cells.agg(sum(col("__o")).as("__tot"),
      count_distinct(col("__r")).as("__dr"), count_distinct(col("__c")).as("__dc"))
    val num = (col("__o").cast(d38) * col("__tot") -
      col("__rn").cast(d38) * col("__cn")).cast("double")
    val den = (col("__rn").cast(d38) * col("__cn") * col("__tot")).cast("double")
    cells.join(rm, "__r").join(cm, "__c").crossJoin(broadcast(tot))
      .withColumn("__term_u", round(num * num / den * 1e6, 0).cast("long"))
      .agg(round(sum(col("__term_u")).cast("double") / 1e6, 6).as("chi2"),
        ((max(col("__dr")) - 1) * (max(col("__dc")) - 1)).as("dof"),
        max(col("__tot")).cast("long").as("n"))
  }

  /** A-stat — two-sample Kolmogorov–Smirnov statistic between two
    * groups: D = max over values of |F_A(v) − F_B(v)|, kept integral by
    * clearing denominators — the crossing quantity is
    *   d_num = max |cumA·n_b − cumB·n_a|,  D = d_num / (n_a·n_b).
    * The complement of [[mannWhitneyU]]: MW detects a location shift,
    * KS any distributional difference (shape, spread, tails). Returns
    * one row: (n_a, n_b, d_num, ks_stat) — the one float op is the
    * final division of identical exact integers.
    *
    * Scale: like MW, the ordered window runs over the DISTINCT-VALUE
    * rollup (value, per-group counts), never the fact table; products
    * widen to DECIMAL(38,0) before the |·| so 10¹²-row groups can't
    * overflow. */
  def ksTest(df: DataFrame, valueCol: Column, groupCol: Column,
      groupA: String, groupB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val perV = df.filter(groupCol.isin(groupA, groupB))
      .groupBy(valueCol.as("__v"))
      .agg(sum(when(groupCol === groupA, 1L).otherwise(0L)).as("__ca"),
        sum(when(groupCol === groupB, 1L).otherwise(0L)).as("__cb"))
    val cum = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    perV
      .withColumn("__cuma", sum(col("__ca")).over(cum))
      .withColumn("__cumb", sum(col("__cb")).over(cum))
      .withColumn("__na", sum(col("__ca")).over(tot))
      .withColumn("__nb", sum(col("__cb")).over(tot))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        max(abs(col("__cuma").cast(d38) * col("__nb") -
          col("__cumb").cast(d38) * col("__na"))).as("__dnum"))
      .select(col("n_a"), col("n_b"), col("__dnum").cast("long").as("d_num"),
        (col("__dnum").cast("double") /
          (col("n_a").cast(d38) * col("n_b").cast(d38)).cast("double"))
          .as("ks_stat"))
  }

  /** A1 — largest-remainder (Hamilton) apportionment: split an integer
    * `total` across keys proportionally to an integer weight, exactly —
    * per key floor(total·w / W), then the leftover units go one each to
    * the largest remainders (key-ordered tie-break), so Σ alloc ≡ total
    * ALWAYS. The rounding step every budget/quota/shard-count
    * allocation needs; naive per-key round() drifts off the total.
    * Returns (key…, weight, alloc).
    *
    * Scale: the window runs over the |keys|-row weight rollup, never
    * the fact table; products widen to DECIMAL(38,0). */
  def largestRemainder(df: DataFrame, keys: Seq[Column], weightCol: Column,
      total: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keys.nonEmpty, "largestRemainder requires key column(s)")
    require(total >= 0, "total must be >= 0")
    val d38 = "decimal(38,0)"
    val rollup = df.groupBy(keys: _*)
      .agg(sum(weightCol.cast("long")).as("weight"))
    val keyNames = rollup.columns.dropRight(1).toSeq
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val scaled = rollup
      .withColumn("__W", sum(col("weight")).over(tot))
      .withColumn("__num", lit(total).cast(d38) * col("weight").cast(d38))
      .withColumn("__floor", expr("__num div __W").cast("long"))
      .withColumn("__rem", (col("__num") - col("__floor").cast(d38) *
        col("__W").cast(d38)).cast("long"))
      .withColumn("__left", (lit(total) - sum(col("__floor")).over(tot))
        .cast("long"))
    // leftover units < |keys|: rank remainders desc, keys asc tie-break
    val rn = row_number().over(Window.orderBy(
      (col("__rem").desc +: keyNames.map(col(_).asc)): _*))
    scaled.withColumn("__rn", rn)
      .select(keyNames.map(col) :+ col("weight") :+
        (col("__floor") + when(col("__rn") <= col("__left"), 1L)
          .otherwise(0L)).as("alloc"): _*)
  }

  /** A1 — PER-GROUP largest-remainder apportionment: within each group,
    * split that group's integer `totalCol` across its keys
    * proportionally to `weightCol`, exactly (Σ alloc ≡ total per
    * group — ALWAYS, including degenerate groups: all-zero weights
    * fall back to near-equal split `total div nKeys` (+1 to the first
    * `total mod nKeys` keys in remainder order), and a leftover larger
    * than nKeys — impossible when ΣW ≥ 1, but the clamp path reaches
    * it — is distributed as `left div nKeys` to every key plus the
    * modulo bump, never silently under-allocated). Disagreeing per-row
    * totals in a group raise rather than being collapsed via min().
    * The hierarchical-reconciliation primitive: a top-level forecast
    * splits across its children by bottom-level weights with no drift.
    * Returns (group…, key…, weight, total, alloc).
    *
    * Scale: BOTH windows partition on the group keys — unlike the
    * global [[largestRemainder]] there is no single-partition frame at
    * any size; groups shard freely across executors. */
  def largestRemainderByGroup(df: DataFrame, groupKeys: Seq[Column],
      keys: Seq[Column], weightCol: Column, totalCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupKeys.nonEmpty && keys.nonEmpty, "need group and key cols")
    val d38 = "decimal(38,0)"
    val rollup = df.groupBy((groupKeys ++ keys): _*)
      .agg(sum(weightCol.cast("long")).as("weight"),
        // the group total rides on every row of the group (callers
        // attach it upstream); any disagreement is a caller bug —
        // raise, don't silently pick min
        min(totalCol.cast("long")).as("total"),
        max(totalCol.cast("long")).as("__tmax"))
    val gNames = rollup.columns.dropRight(keys.length + 3).toSeq
    val kNames = rollup.columns.slice(gNames.length,
      gNames.length + keys.length).toSeq
    val grp = Window.partitionBy(gNames.map(col): _*)
    val tot = grp.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val scaled = rollup
      // the disagreement can be across KEYS of one group, so compare
      // against the group-wide max, not just this key's own rows
      .withColumn("__gmax", max(col("__tmax")).over(tot))
      .withColumn("total", when(col("total") === col("__gmax"), col("total"))
        .otherwise(raise_error(concat(
          lit("largestRemainderByGroup: disagreeing totals in a group ("),
          col("total").cast("string"), lit(" vs "),
          col("__gmax").cast("string"), lit(")")))))
      .drop("__tmax", "__gmax")
      .withColumn("__W", sum(col("weight")).over(tot))
      .withColumn("__nk", count(lit(1)).over(tot))
      .withColumn("__num", col("total").cast(d38) * col("weight").cast(d38))
      .withColumn("__floor", expr("__num div greatest(__W, 1L)").cast("long"))
      .withColumn("__rem", (col("__num") - col("__floor").cast(d38) *
        col("__W").cast(d38)).cast("long"))
      .withColumn("__left", (col("total") - sum(col("__floor")).over(tot))
        .cast("long"))
    val rn = row_number().over(grp.orderBy(
      (col("__rem").desc +: kNames.map(col(_).asc)): _*))
    scaled.withColumn("__rn", rn)
      .select((gNames ++ kNames).map(col) :+ col("weight") :+ col("total") :+
        (col("__floor") + expr("__left div __nk") +
          when(col("__rn") <= expr("__left % __nk"), 1L)
          .otherwise(0L)).as("alloc"): _*)
  }

  /** Benford first-significant-digit PPM table: log10(1 + 1/d) in
    * micro-units, d = 1..9 — literal constants (no libm on either
    * engine), summing to exactly 1 000 000. */
  val BenfordPpm: Seq[(Int, Long)] = Seq(1 -> 301030L, 2 -> 176091L,
    3 -> 124939L, 4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
    8 -> 51153L, 9 -> 45757L)

  /** A1/E4 — Benford first-digit audit: the observed first-significant-
    * digit distribution of a positive integer column vs the Benford
    * expectation, both in exact ppm (observed = cnt·10⁶ div n; expected
    * from the literal [[BenfordPpm]] table — no logs at runtime).
    * The classic fraud/synthetic-data screen: fabricated numerics are
    * uniform-ish in the leading digit, organic ones are not. Returns
    * one row per digit 1-9 (absent digits densified to 0):
    * (digit, n, obs_ppm, exp_ppm, dev_ppm = |obs−exp|).
    *
    * Scale: a 9-row rollup off one scan-side projection (first char of
    * the decimal rendering — no float log10); everything after is
    * constant-sized. */
  def benfordProfile(df: DataFrame, valueCol: Column): DataFrame = {
    val digits = BenfordPpm.map { case (d, ppm) =>
      struct(lit(d).as("digit"), lit(ppm).as("exp_ppm"))
    }
    val obs = df.select(valueCol.cast("long").as("__v"))
      .filter(col("__v") > 0)
      .select(substring(col("__v").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val exp = df.sparkSession.range(1)
      .select(explode(array(digits: _*)).as("e")).select(col("e.*"))
    val tot = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    exp.join(obs, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("__tot", sum(col("n")).over(tot))
      .withColumn("obs_ppm", expr("(n * 1000000L) div __tot"))
      .select(col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
        abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
      .orderBy(col("digit"))
  }

  /** A1/E4 — Benford MAD conformity verdict (Nigrini 2012, "Benford's
    * Law" ch. 7 — the acceptance bands auditors actually use; the χ²
    * on q158's profile over-rejects at scale because power grows with
    * n while real data never fits perfectly):
    *   MAD = (1/9)·Σ_digits |observed − expected|
    * with Nigrini's first-digit bands: < 0.006 close conformity,
    * < 0.012 acceptable, < 0.015 marginal, else nonconformity. MAD is
    * an exact integer ppm average over [[benfordProfile]]'s exact
    * deviations; the verdict is an integer threshold compare. Returns
    * ONE row: (n, mad_ppm, verdict).
    *
    * Scale: the q158 digit rollup (one scan, 9 rows) + a 9-row agg. */
  def benfordConformity(df: DataFrame, valueCol: Column): DataFrame = {
    graft.plans.Guardrails.expect("global_sort", "digit, dev_ppm",
      "benfordConformity: 9-row digit profile sort feeding the MAD agg",
    "k-literal")
    benfordProfile(df, valueCol)
      .agg(sum(col("n")).as("n"),
        expr("sum(dev_ppm) div 9").as("mad_ppm"))
      .withColumn("verdict",
        when(col("mad_ppm") < 6000, "close")
          .when(col("mad_ppm") < 12000, "acceptable")
          .when(col("mad_ppm") < 15000, "marginal")
          .otherwise("nonconforming"))
  }

  /** E6/A1 — join-key SKEW AUDIT: the distribution profile of a key
    * column that decides whether a join/agg on it needs salting, AQE
    * skew handling, or nothing — run BEFORE the 100 TB job, not after
    * it straggles. One row: total rows, distinct keys, the heaviest
    * key's count and ppm share, and the exact lower p50/p99 of the
    * per-key count distribution (integer crossing test over the
    * |keys|-row rollup — rn·100 ≥ K·q). All-integer decisions; the
    * hot-key ratio max/p50 is the one float op (identical operands).
    *
    * Scale: one key-keyed count agg (map-side combine) + a
    * |keys|-row window — the audit costs one pass at any volume. */
  def skewAudit(df: DataFrame, keyCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rollup = df.groupBy(keyCol.as("__k")).agg(count(lit(1)).as("__cnt"))
    // one key per rollup row → row_number over (cnt, key) is the
    // cumulative key count for the quantile crossing
    val rn = row_number().over(Window.orderBy(col("__cnt"), col("__k")))
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    rollup
      .withColumn("__rn", rn)
      .withColumn("__K", sum(lit(1L)).over(tot))
      .withColumn("__N", sum(col("__cnt")).over(tot))
      .agg(max(col("__N")).as("n_rows"), max(col("__K")).as("n_keys"),
        max(col("__cnt")).as("max_cnt"),
        min(when(col("__rn") * 100 >= col("__K") * 50, col("__cnt")))
          .as("p50_cnt"),
        min(when(col("__rn") * 100 >= col("__K") * 99, col("__cnt")))
          .as("p99_cnt"))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        expr("(max_cnt * 1000000L) div n_rows").as("top_share_ppm"),
        col("p50_cnt"), col("p99_cnt"),
        (col("max_cnt").cast("double") / col("p50_cnt").cast("double"))
          .as("hot_ratio"))
  }

  /** E6 — order-invariant dataset fingerprint: per group, the row
    * count plus the SUM (DECIMAL(38,0), overflow-free) and XOR of a
    * portable per-row hash ([[graft.ext.Dedup.md5Hash60]] over the
    * canonical column rendering). Addition and XOR commute, so two
    * copies of a dataset fingerprint equal REGARDLESS of row order,
    * partitioning, file layout or engine — the replica-verification /
    * migration-audit primitive that avoids sorting 100 TB to compare
    * it. Nulls render as an explicit sentinel so (null, "a") and
    * ("a", null) cannot collide through separator skipping.
    *
    * Scale: one scan + one group agg with map-side partials; output
    * is |groups| rows. Compare fingerprints, not data. */
  def datasetFingerprint(df: DataFrame, groupBy: Seq[Column],
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    val rendered = cols.map(c =>
      coalesce(col(c).cast("string"), lit("\u0000NULL\u0000")))
    val withH = df.withColumn("__h",
      graft.ext.Dedup.md5Hash60(concat_ws("\u0001", rendered: _*)))
    val grouped = if (groupBy.isEmpty)
      withH.groupBy(lit(1).as("__g")) else withH.groupBy(groupBy: _*)
    // the exact sum can exceed int64; reduce mod the Mersenne prime
    // 2^61 - 1 — modular addition still commutes, so order invariance
    // and the BIGINT output type both hold
    val out = grouped.agg(count(lit(1)).as("n_rows"),
      (sum(col("__h").cast("decimal(38,0)")) % lit(2305843009213693951L))
        .cast("long").as("sum_sig"),
      expr("bit_xor(__h)").as("xor_sig"))
    if (groupBy.isEmpty) out.drop("__g") else out
  }

  /** E6/J1 — join-cardinality audit: the EXACT inner-join row count
    * |A ⋈ B| = Σ_k cntA(k)·cntB(k) plus key-overlap counts, computed
    * from the two key rollups WITHOUT materializing the join — the
    * pre-flight that catches a fan-out join (many-to-many key reuse)
    * before it multiplies 100 TB by 40×. Returns one row:
    * (rows_a, rows_b, keys_a, keys_b, keys_matched, inner_rows,
    * max_fanout) — max_fanout the largest single-key cntA·cntB.
    *
    * Scale: two key-keyed count aggs + one |keys|-sized join; products
    * widen to DECIMAL(38,0). Nothing touches the fact rows twice. */
  def joinCardinality(a: DataFrame, keyA: Column,
      b: DataFrame, keyB: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val ra = a.groupBy(keyA.as("__k")).agg(count(lit(1)).as("__ca"))
    val rb = b.groupBy(keyB.as("__k")).agg(count(lit(1)).as("__cb"))
    ra.join(rb, Seq("__k"), "full_outer")
      .agg(sum(col("__ca")).cast("long").as("rows_a"),
        sum(col("__cb")).cast("long").as("rows_b"),
        count(col("__ca")).as("keys_a"),
        count(col("__cb")).as("keys_b"),
        sum(when(col("__ca").isNotNull && col("__cb").isNotNull, 1L)
          .otherwise(0L)).as("keys_matched"),
        sum(col("__ca").cast(d38) * col("__cb").cast(d38)).cast("long")
          .as("inner_rows"), // fits int64 for any join a cluster could run

        max(col("__ca").cast(d38) * col("__cb").cast(d38)).cast("long")
          .as("max_fanout"))
  }

  /** E6/A1 — merge two partial aggregation STATES: the incremental-
    * materialization kernel. Each side holds (key, partial…) rows where
    * every merge column is an ALGEBRAIC partial (sum, count — things
    * addition merges); the merge is one full-outer equi-join with
    * coalesced addition. This is the partial/final split Spark's hash
    * aggregate performs internally, made explicit as data: yesterday's
    * state table + today's delta partials = today's totals with no
    * rescan of history. Keep sums in DECIMAL so merge order can never
    * move a bit (exact addition), and derive means/ratios only AFTER
    * the final merge.
    *
    * Scale: state and delta co-partition on the key (uniform business
    * key); the join is the only shuffle and the output is |keys|-sized.
    * This replaces a 100 TB rescan with a |keys|+|delta| job — the
    * difference between a nightly window and a nightly impossibility. */
  def mergeAggStates(a: DataFrame, b: DataFrame, key: String,
      mergeCols: Seq[String]): DataFrame = {
    val aa = a.select(col(key) +: mergeCols.map(c => col(c).as(s"__a_$c")): _*)
    val bb = b.select(col(key) +: mergeCols.map(c => col(c).as(s"__b_$c")): _*)
    aa.join(bb, Seq(key), "full_outer")
      .select(col(key) +: mergeCols.map { c =>
        (coalesce(col(s"__a_$c"), lit(0)) + coalesce(col(s"__b_$c"), lit(0))).as(c)
      }: _*)
  }

  /** A1/E6 — numeric data PROFILE (the describe() every ingestion
    * pipeline runs first): per column — non-null count, null count,
    * exact distinct, min, max, exact decimal sum and the derived mean.
    * The algebraic stats fuse into ONE aggregate pass; each distinct
    * count runs as its own column-pruned pass (see inline comment);
    * the wide 1-row result melts to one row per column afterwards
    * (melt on 1 row costs nothing — q96's placement argument). Sums
    * ride in DECIMAL(18,2), so column order, partitioning and engine
    * cannot move a bit. Exact distinct is the correctness kernel; at
    * 100 TB swap approx_count_distinct (mergeable HLL — SketchSpec
    * pins the laws). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // algebraic stats fuse into ONE pass; the distinct counts run as
    // one column-pruned pass EACH (map-side partial dedup, one tiny
    // shuffle of distinct values) — several times cheaper than folding
    // N countDistinct into the same aggregate, which makes Spark
    // expand every input row (N+1)× before the shuffle
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        sum(col(c).cast("decimal(18,2)")).as(s"__sum_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val withNd = cols.foldLeft(one) { (acc, c) =>
      acc.crossJoin(broadcast(
        df.select(col(c)).agg(countDistinct(col(c)).as(s"__nd_$c"))))
    }
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"__n_$c").as("n"),
        col(s"__nulls_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min"), col(s"__max_$c").as("max"),
        col(s"__sum_$c").cast("double").as("sum"),
        (col(s"__sum_$c").cast("double") / col(s"__n_$c")).as("mean"))
    }
    withNd.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** A-stat — Theil–Sen robust trend slope per key: the median of all
    * pairwise slopes (y_j−y_i)/(x_j−x_i) over x_i < x_j (Theil 1950 /
    * Sen 1968, public literature) — the outlier-resistant alternative
    * to the OLS slope (q82), with ~29% breakdown instead of 0.
    * Deterministic median: pairs sort by the IEEE quotient with the
    * exact (num, den) pair as tie-break — equal-quotient ties are
    * interchangeable, colliding-double near-ties resolve identically
    * on any engine — and the LOWER median (rank ⌈m/2⌉) is selected, so
    * no averaging of two fractions. Returns
    * (…keys, n_pairs, slope_num, slope_den, slope) with slope the one
    * float op (num/den of exact integers).
    *
    * Scale: the caller aggregates to a rollup-grain series first
    * (days/weeks per key); the pair join is key-local and
    * O(series²) per key — bounded by the GRAIN, never the fact count.
    * The join and the rank window share one key partitioning. */
  /** A-stat — Welch's unequal-variance t-test of an integer-valued
    * metric between two groups: the parametric complement of
    * [[mannWhitneyU]] (MW detects location shift rank-wise; Welch
    * quantifies it in the metric's own units with no equal-variance
    * assumption). State is three exact sums per group (n, Σx, Σx²) in
    * DECIMAL(38,0); the finish — means, variances via
    * (n·Q − S²)/(n·(n−1)), t, and the Welch–Satterthwaite df — is a
    * fixed sequence of correctly-rounded IEEE ops on those exact
    * operands, written in the SAME order as the oracle SQL, so even
    * the doubles hash-match. Returns one row:
    * (n_a, n_b, mean_a, mean_b, t_stat, df). */
  def welchTTest(df: DataFrame, valueCol: Column, groupCol: Column,
      groupA: String, groupB: String): DataFrame = {
    val d38 = "decimal(38,0)"
    def side(g: String, tag: String) = {
      val v = valueCol.cast("long")
      df.filter(groupCol === g).agg(
        count(lit(1)).cast(d38).as(s"n_$tag"),
        sum(v).cast(d38).as(s"s_$tag"),
        sum(v.cast(d38) * v.cast(d38)).cast(d38).as(s"q_$tag"))
    }
    def mean(t: String) =
      col(s"s_$t").cast("double") / col(s"n_$t").cast("double")
    // sample variance over n-1; exact integer numerator, one division
    def variance(t: String) =
      (col(s"n_$t") * col(s"q_$t") - col(s"s_$t") * col(s"s_$t")).cast("double") /
        (col(s"n_$t") * (col(s"n_$t") - 1)).cast("double")
    def se2(t: String) = variance(t) / col(s"n_$t").cast("double")
    val tStat = (mean("a") - mean("b")) / sqrt(se2("a") + se2("b"))
    val dfW = (se2("a") + se2("b")) * (se2("a") + se2("b")) /
      (se2("a") * se2("a") / (col("n_a").cast("double") - 1.0) +
        se2("b") * se2("b") / (col("n_b").cast("double") - 1.0))
    side(groupA, "a").crossJoin(side(groupB, "b"))
      .select(col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        mean("a").as("mean_a"), mean("b").as("mean_b"),
        when(col("n_a") > 1 && col("n_b") > 1, tStat).as("t_stat"),
        when(col("n_a") > 1 && col("n_b") > 1, dfW).as("df"))
  }

  /** A-stat — one-way ANOVA F statistic of an integer-valued metric
    * across ALL levels of a categorical column: does the group mean
    * differ anywhere (the k-group generalization Welch can't ask)?
    * Between/within sums of squares come from per-group exact sums;
    * each group's S²/n term is quantized to micro-units BEFORE
    * summing (the q74/chi-square trick) so accumulation order cannot
    * move a bit:
    *   ssb_u = Σ_g round(10⁶·S_g²/n_g) − round(10⁶·S²/N)
    *   ssw_u = 10⁶·Q − Σ_g round(10⁶·S_g²/n_g)
    * and F = (ssb_u/(k−1)) / (ssw_u/(N−k)) divides exact longs.
    * Returns one row: (k, n, ssb_u, ssw_u, f_stat).
    *
    * Scale: one group-keyed agg (map-side combine) + a k-row finish;
    * never data-sized past the first pass. */
  def anovaF(df: DataFrame, valueCol: Column, groupCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val v = valueCol.cast("long")
    val per = df.groupBy(groupCol.as("__g")).agg(
      count(lit(1)).cast(d38).as("__n"),
      sum(v).cast(d38).as("__s"),
      sum(v.cast(d38) * v.cast(d38)).cast(d38).as("__q"))
    val term = round((col("__s") * col("__s")).cast("double") /
      col("__n").cast("double") * 1e6, 0).cast("long")
    per.withColumn("__t", term)
      .agg(count(lit(1)).as("k"),
        sum(col("__n")).cast(d38).as("__nn"),
        sum(col("__s")).cast(d38).as("__ss"),
        sum(col("__q")).cast(d38).as("__qq"),
        sum(col("__t")).as("__sumt"))
      .select(col("k"), col("__nn").cast("long").as("n"),
        (col("__sumt") -
          round((col("__ss") * col("__ss")).cast("double") /
            col("__nn").cast("double") * 1e6, 0).cast("long")).as("ssb_u"),
        (col("__qq").cast("long") * 1000000L - col("__sumt")).as("ssw_u"))
      .withColumn("f_stat",
        when(col("k") > 1 && col("n") > col("k") && col("ssw_u") > 0,
          (col("ssb_u").cast("double") / (col("k") - 1).cast("double")) /
            (col("ssw_u").cast("double") / (col("n") - col("k")).cast("double"))))
  }

  /** A1 — two-feature exact OLS (y on x1, x2 with intercept), per key:
    * [[linearFitExact]] lifted one dimension. The normal equations are
    * solved on CENTERED co-moments with cleared denominators —
    *   Sjk = n·Σxjxk − Σxj·Σxk   (exact DECIMAL(38,0) integers)
    *   b1 = (S22·S1y − S12·S2y) / (S11·S22 − S12²), b2 symmetric —
    * with the 2×2 Cramer finish in doubles (exact operands, fixed op
    * order, mirrored literally in the oracle SQL). Returns per key
    * (…keys, n, b1, b2, intercept); a singular design (collinear
    * features) yields nulls rather than garbage. */
  def linearFit2Exact(df: DataFrame, keys: Seq[Column], x1: Column,
      x2: Column, y: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    def l(c: Column) = c.cast("long").cast(d38)
    val agg = df.groupBy(keys: _*).agg(
      count(lit(1)).cast(d38).as("n"),
      sum(l(x1)).cast(d38).as("s1"), sum(l(x2)).cast(d38).as("s2"),
      sum(l(y)).cast(d38).as("sy"),
      sum(l(x1) * l(x1)).cast(d38).as("s11"),
      sum(l(x2) * l(x2)).cast(d38).as("s22"),
      sum(l(x1) * l(x2)).cast(d38).as("s12"),
      sum(l(x1) * l(y)).cast(d38).as("s1y"),
      sum(l(x2) * l(y)).cast(d38).as("s2y"))
    def cm(sjk: String, sj: String, sk: String) =
      (col("n") * col(sjk) - col(sj) * col(sk)).cast("double")
    val (c11, c22, c12) = (cm("s11", "s1", "s1"), cm("s22", "s2", "s2"),
      cm("s12", "s1", "s2"))
    val (c1y, c2y) = (cm("s1y", "s1", "sy"), cm("s2y", "s2", "sy"))
    val det = c11 * c22 - c12 * c12
    val b1 = (c22 * c1y - c12 * c2y) / det
    val b2 = (c11 * c2y - c12 * c1y) / det
    val icept = (col("sy").cast("double") - b1 * col("s1").cast("double") -
      b2 * col("s2").cast("double")) / col("n").cast("double")
    agg.select(keys :+ col("n").cast("long").as("n") :+
      when(det =!= 0.0, b1).as("b1") :+
      when(det =!= 0.0, b2).as("b2") :+
      when(det =!= 0.0, icept).as("intercept"): _*)
  }

  /** A-stat — Spearman rank correlation per key, tie-aware and exact:
    * Pearson on DOUBLED midranks (integers — first+last of each tie
    * run, the [[mannWhitneyU]] device), so every sum is exact and the
    * final correlation is one IEEE expression on exact operands. The
    * monotone-association complement to [[linearFitExact]]'s Pearson:
    * immune to monotone transforms and far less outlier-sensitive.
    * Returns (…keys, n, rho).
    *
    * Scale: per variable, ranks come from the (key, distinct-value)
    * rollup (a key-partitioned window over the rollup, never the fact
    * table) joined back broadcast; the co-moment agg is one pass. */
  def spearmanExact(df: DataFrame, keys: Seq[Column], xCol: Column,
      yCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val base = df.select(keys :+ xCol.cast("long").as("__x") :+
      yCol.cast("long").as("__y"): _*)
    val kNames = base.columns.dropRight(2).toSeq
    def rankMap(vCol: String, out: String) = {
      val w =
        if (kNames.isEmpty) Window.orderBy(col(vCol))
        else Window.partitionBy(kNames.map(col): _*).orderBy(col(vCol))
      base.groupBy((kNames :+ vCol).map(col): _*)
        .agg(count(lit(1)).as("__cnt"))
        .withColumn(out,
          lit(2) * coalesce(sum(col("__cnt")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) +
            col("__cnt") + 1)
        .drop("__cnt")
    }
    val rx = rankMap("__x", "__rx")
    val ry = rankMap("__y", "__ry")
    val ranked = base
      .join(broadcast(rx), kNames :+ "__x")
      .join(broadcast(ry), kNames :+ "__y")
    def s38(c: Column) = sum(c.cast(d38)).cast(d38)
    val agg = ranked.groupBy(kNames.map(col): _*).agg(
      count(lit(1)).cast(d38).as("n"),
      s38(col("__rx")).as("sx"), s38(col("__ry")).as("sy"),
      s38(col("__rx").cast(d38) * col("__ry").cast(d38)).as("sxy"),
      s38(col("__rx").cast(d38) * col("__rx").cast(d38)).as("sxx"),
      s38(col("__ry").cast(d38) * col("__ry").cast(d38)).as("syy"))
    val covN = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val varXN = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val varYN = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    agg.select(kNames.map(col) :+ col("n").cast("long").as("n") :+
      when(varXN =!= 0.0 && varYN =!= 0.0,
        covN / (sqrt(varXN) * sqrt(varYN))).as("rho"): _*)
  }

  /** A-stat — Kendall's τ-b per key, tie-aware and exact: concordant /
    * discordant pair counts computed over the (x, y) CELL rollup —
    * every distinct value combination with its multiplicity — so the
    * pair "loop" is |cells|² per key (value-domain-bounded: 11
    * discounts × 50 quantities = 550 cells regardless of row count),
    * never row². All counts are exact DECIMAL(38,0);
    *   τ_b = (nc − nd) / (√(n0−n1) · √(n0−n2))
    * is the one IEEE expression. Returns
    * (…keys, n, nc, nd, tau_b). */
  def kendallTau(df: DataFrame, keys: Seq[Column], xCol: Column,
      yCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = df.select(keys :+ xCol.cast("long").as("__x") :+
      yCol.cast("long").as("__y"): _*)
    val kNames = base.columns.dropRight(2).toSeq
    val cells = base.groupBy((kNames :+ "__x" :+ "__y").map(col): _*)
      .agg(count(lit(1)).cast(d38).as("__c"))
    val a = cells.toDF(kNames ++ Seq("__x1", "__y1", "__c1"): _*)
    val b = cells.toDF(kNames ++ Seq("__x2", "__y2", "__c2"): _*)
    // each unordered cell pair once: lexicographic (x, y) order
    val pairs = a.join(b, kNames)
      .filter(col("__x1") < col("__x2") ||
        (col("__x1") === col("__x2") && col("__y1") < col("__y2")))
      .withColumn("__w", col("__c1") * col("__c2"))
    val perKey = pairs.groupBy(kNames.map(col): _*).agg(
      sum(when(col("__x1") =!= col("__x2") && col("__y1") =!= col("__y2") &&
        ((col("__x1") < col("__x2")) === (col("__y1") < col("__y2"))),
        col("__w")).otherwise(lit(0).cast(d38))).cast(d38).as("__nc"),
      sum(when(col("__x1") =!= col("__x2") && col("__y1") =!= col("__y2") &&
        ((col("__x1") < col("__x2")) =!= (col("__y1") < col("__y2"))),
        col("__w")).otherwise(lit(0).cast(d38))).cast(d38).as("__nd"))
    val ties = cells.groupBy(kNames.map(col): _*).agg(
      sum(col("__c")).cast(d38).as("__n"))
    val tx = base.groupBy((kNames :+ "__x").map(col): _*)
      .agg(count(lit(1)).cast(d38).as("__c"))
      .groupBy(kNames.map(col): _*)
      .agg(sum(col("__c") * (col("__c") - 1)).cast(d38).as("__txd"))
    val ty = base.groupBy((kNames :+ "__y").map(col): _*)
      .agg(count(lit(1)).cast(d38).as("__c"))
      .groupBy(kNames.map(col): _*)
      .agg(sum(col("__c") * (col("__c") - 1)).cast(d38).as("__tyd"))
    val joined =
      if (kNames.isEmpty) perKey.crossJoin(ties).crossJoin(tx).crossJoin(ty)
      else perKey.join(ties, kNames).join(tx, kNames).join(ty, kNames)
    val n0d = (col("__n") * (col("__n") - 1)).cast("double") // doubled n0
    joined
      .withColumn("__den",
        sqrt(n0d - col("__txd").cast("double")) *
          sqrt(n0d - col("__tyd").cast("double")))
      .select(kNames.map(col) :+ col("__n").cast("long").as("n") :+
        col("__nc").cast("long").as("nc") :+
        col("__nd").cast("long").as("nd") :+
        when(col("__den") =!= 0.0,
          lit(2.0) * (col("__nc") - col("__nd")).cast("double") / col("__den"))
          .as("tau_b"): _*)
  }

  /** A-stat — Cramér's V effect size for a two-way contingency: the
    * [0,1]-normalized strength behind [[chiSquare]]'s significance
    * (χ² grows with n even for trivial association; V does not).
    * V = √(χ² / (n·min(r−1, c−1))) — χ² comes micro-quantized from
    * chiSquare, so V is deterministic too. Returns one row:
    * (chi2, dof, n, r_levels, c_levels, cramers_v). */
  def cramersV(df: DataFrame, rowCol: Column, colCol: Column): DataFrame = {
    val chi = chiSquare(df, rowCol, colCol)
    val dims = df.agg(count_distinct(rowCol).as("r_levels"),
      count_distinct(colCol).as("c_levels"))
    chi.crossJoin(broadcast(dims))
      .withColumn("cramers_v",
        when(col("n") > 0 && least(col("r_levels"), col("c_levels")) > 1,
          sqrt(col("chi2") / (col("n").cast("double") *
            (least(col("r_levels"), col("c_levels")) - 1).cast("double")))))
  }

  /** A-stat — 2×2 odds ratio and risk ratio of a binary outcome given
    * a binary exposure, integer-exact: OR = a·d/(b·c) reported both as
    * the exact-ppm integer quotient and the IEEE double of the same
    * exact operands. The case-control effect measure chi-square can't
    * give. Returns one row:
    * (n_ee, n_en, n_ne, n_nn, or_ppm, odds_ratio, rr_ppm). */
  def oddsRatio(df: DataFrame, exposure: Column, outcome: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    df.agg(
      sum(when(exposure && outcome, 1L).otherwise(0L)).as("n_ee"),
      sum(when(exposure && !outcome, 1L).otherwise(0L)).as("n_en"),
      sum(when(!exposure && outcome, 1L).otherwise(0L)).as("n_ne"),
      sum(when(!exposure && !outcome, 1L).otherwise(0L)).as("n_nn"))
      .withColumn("or_ppm",
        when(col("n_en") > 0 && col("n_ne") > 0,
          expr("(cast(1000000 as decimal(38,0)) * n_ee * n_nn)" +
            " div (cast(n_en as decimal(38,0)) * n_ne)")))
      .withColumn("odds_ratio",
        when(col("n_en") > 0 && col("n_ne") > 0,
          (col("n_ee").cast(d38) * col("n_nn").cast(d38)).cast("double") /
            (col("n_en").cast(d38) * col("n_ne").cast(d38)).cast("double")))
      .withColumn("rr_ppm",
        when(col("n_ne") + col("n_nn") > 0 && col("n_ee") + col("n_en") > 0 &&
          col("n_ne") > 0,
          expr("(cast(1000000 as decimal(38,0)) * n_ee * (n_ne + n_nn))" +
            " div (cast(n_ne as decimal(38,0)) * (n_ee + n_en))")))
  }

  /** A-stat — augmented-free Dickey–Fuller unit-root test per key: is
    * the series a random walk (γ ≈ 0 — difference before modeling) or
    * mean-reverting (γ < 0 — levels are safe)? The stationarity screen
    * run BEFORE trusting q173's Holt smoothing or q183's trend slope.
    * Regresses Δy_t on y_{t−1} (with intercept); the reported t-stat
    * compares against the Dickey–Fuller critical value (−2.86 at 5%,
    * a literal constant): `stationary` = t < −2.86. State is six
    * exact DECIMAL(38,0) sums over the lag pairs; the finish
    *   b = covN/varXN,
    *   se² = (varDN − covN²/varXN) / ((n−2)·varXN),
    *   t = b / √se²
    * is a pinned sequence of IEEE ops on exact operands, mirrored
    * literally in the oracle. Returns (…keys, n, gamma, t_stat,
    * stationary).
    *
    * Scale: one key-partitioned lag window over the rollup-grain
    * series + one exact-sum agg — the q82 envelope with a lag in
    * front. */
  def adfTest(df: DataFrame, keys: Seq[Column], orderCol: Column,
      valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val base = df.select(keys :+ orderCol.as("__o") :+
      valueCol.cast("long").as("__y"): _*)
    val kNames = base.columns.dropRight(2).toSeq
    val w =
      if (kNames.isEmpty) Window.orderBy(col("__o"))
      else Window.partitionBy(kNames.map(col): _*).orderBy(col("__o"))
    val lagged = base.withColumn("__x", lag(col("__y"), 1).over(w))
      .filter(col("__x").isNotNull)
      .withColumn("__d", col("__y") - col("__x"))
    def s38(c: Column) = sum(c.cast(d38)).cast(d38)
    val agg = lagged.groupBy(kNames.map(col): _*).agg(
      count(lit(1)).cast(d38).as("n"),
      s38(col("__x")).as("sx"), s38(col("__d")).as("sd"),
      s38(col("__x").cast(d38) * col("__x").cast(d38)).as("sxx"),
      s38(col("__x").cast(d38) * col("__d").cast(d38)).as("sxd"),
      s38(col("__d").cast(d38) * col("__d").cast(d38)).as("sdd"))
    val vx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val cv = (col("n") * col("sxd") - col("sx") * col("sd")).cast("double")
    val vd = (col("n") * col("sdd") - col("sd") * col("sd")).cast("double")
    val b = cv / vx
    val se2 = (vd - cv * cv / vx) /
      ((col("n").cast("double") - 2.0) * vx)
    val t = b / sqrt(se2)
    agg.select(kNames.map(col) :+ col("n").cast("long").as("n") :+
      when(vx =!= 0.0 && col("n") > 2, b).as("gamma") :+
      when(vx =!= 0.0 && col("n") > 2, t).as("t_stat") :+
      when(vx =!= 0.0 && col("n") > 2, (t < -2.86).cast("int"))
        .as("stationary"): _*)
  }

  /** A-stat — delete-one-group jackknife for the global mean of an
    * integer-valued metric: the distribution-free error bar at 100 TB,
    * where the "groups" are natural data blocks (shards, days,
    * sources). Each leave-group-out mean (S−S_g)/(N−n_g) divides exact
    * integers; the pseudo-value spread is quantized to micro-units
    * BEFORE the cross-group sums (the chi-square trick) so
    * accumulation order cannot move a bit:
    *   var_jk = (G−1)·(G·Σθ_u² − (Σθ_u)²) / G²   [micro-units²]
    * Returns one row: (g, n, mean, jk_var_u2, jk_se_u).
    *
    * Scale: one group-keyed agg pass (map-side combine) + a G-row
    * finish. The same pass structure as [[anovaF]] — the two share a
    * rollup if run together. */
  def jackknifeMeanByGroup(df: DataFrame, groupCol: Column,
      valueCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val v = valueCol.cast("long")
    val per = df.groupBy(groupCol.as("__g"))
      .agg(count(lit(1)).cast(d38).as("__n"), sum(v).cast(d38).as("__s"))
    val tot = per.agg(sum(col("__n")).cast(d38).as("__nn"),
      sum(col("__s")).cast(d38).as("__ss"),
      count(lit(1)).as("__gg"))
    val thetaU = round((col("__ss") - col("__s")).cast("double") /
      (col("__nn") - col("__n")).cast("double") * 1e6, 0).cast("long")
    per.crossJoin(broadcast(tot))
      .withColumn("__tu", thetaU)
      .groupBy()
      .agg(max(col("__gg")).as("g"),
        max(col("__nn")).cast("long").as("n"),
        (max(col("__ss")).cast("double") / max(col("__nn")).cast("double"))
          .as("mean"),
        sum(col("__tu")).cast(d38).as("__sumt"),
        sum(col("__tu").cast(d38) * col("__tu").cast(d38)).cast(d38).as("__sumt2"))
      .withColumn("jk_var_u2",
        (col("g") - 1).cast("double") *
          (col("g").cast(d38) * col("__sumt2") - col("__sumt") * col("__sumt"))
            .cast("double") /
          (col("g").cast("double") * col("g").cast("double")))
      .withColumn("jk_se_u", sqrt(col("jk_var_u2")))
      .select(col("g"), col("n"), col("mean"), col("jk_var_u2"), col("jk_se_u"))
  }

  def theilSen(df: DataFrame, keys: Seq[Column], xCol: Column,
      yCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(keys :+ xCol.cast("long").as("__x") :+
      yCol.cast("long").as("__y"): _*)
    val kNames = base.columns.dropRight(2).toSeq
    val lhs = base.toDF(kNames ++ Seq("__x1", "__y1"): _*)
    val rhs = base.toDF(kNames ++ Seq("__x2", "__y2"): _*)
    val pairs = lhs.join(rhs, kNames).filter(col("__x1") < col("__x2"))
      .withColumn("__num", col("__y2") - col("__y1"))
      .withColumn("__den", col("__x2") - col("__x1"))
    val w = Window.partitionBy(kNames.map(col): _*)
      .orderBy(col("__num").cast("double") / col("__den").cast("double"),
        col("__num"), col("__den"))
    val wAll = Window.partitionBy(kNames.map(col): _*)
    pairs
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(wAll))
      .filter(col("__rn") === expr("(n_pairs + 1) div 2"))
      .select(kNames.map(col) :+ col("n_pairs") :+
        col("__num").as("slope_num") :+ col("__den").as("slope_den") :+
        (col("__num").cast("double") / col("__den").cast("double"))
          .as("slope"): _*)
  }

  /** A-stat — deterministic EXHAUSTIVE-CONSENSUS robust line fit: the
    * RANSAC criterion (Fischler & Bolles 1981, CACM "Random sample
    * consensus" — public literature) with the sampling removed — EVERY
    * pair of distinct rollup points proposes the line through them,
    * and each candidate's consensus is the multiplicity-weighted count
    * of points within `epsNum/epsDen` VERTICAL distance, tested by the
    * exact cross-multiplied integer inequality
    *   |(y − y1)·dx − (x − x1)·dy| · epsDen ≤ epsNum · dx   (dx > 0).
    * No RNG, no ordering sensitivity: the winner maximizes consensus
    * with the lexicographic (x1, y1, x2, y2) tie-break, so the fit is
    * bit-stable under any partitioning and any engine. Where
    * [[theilSen]] medians all slopes and [[huberLocation]] reweights,
    * the consensus criterion IGNORES outliers entirely — the right
    * tool when a minority of points is arbitrarily corrupted.
    * Vertical candidate lines are excluded (x1 < x2). Returns 1 row:
    * (n_points, n_candidates, consensus, x1, y1, x2, y2, slope_micro,
    * intercept_micro) — slope/intercept as truncating micro-units.
    *
    * Scale: |rollup|² candidates × |rollup| inlier tests — the CUBED
    * rollup altitude (q454's Walsh-pair discipline one power up):
    * feed calendar-grain rollups of at most a few hundred rows. For
    * larger point sets use theilSen, or pre-sample candidates. */
  def ransacLine(df: DataFrame, xCol: Column, yCol: Column,
      epsNum: Long, epsDen: Long): DataFrame = {
    require(epsNum >= 0 && epsDen > 0, "eps = epsNum/epsDen >= 0")
    val d38 = "decimal(38,0)"
    val pts = df.select(xCol.cast("long").as("__x"),
        yCol.cast("long").as("__y"))
      .groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("__c"))
      .localCheckpoint() // read by both candidate sides + the test side
    val nPts = pts.agg(sum(col("__c")).cast("long").as("n_points"),
      count(lit(1)).as("__nd"))
    val a = pts.toDF("__x1", "__y1", "__c1")
    val b = pts.toDF("__x2", "__y2", "__c2")
    val cand = a.join(b, col("__x1") < col("__x2"))
      .select(col("__x1"), col("__y1"), col("__x2"), col("__y2"),
        (col("__x2") - col("__x1")).as("__dx"),
        (col("__y2") - col("__y1")).as("__dy"))
      .localCheckpoint() // rollup²; read by the test join + the count
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    val best = cand.join(pts,
        abs((col("__y") - col("__y1")).cast(d38) * col("__dx").cast(d38) -
          (col("__x") - col("__x1")).cast(d38) * col("__dy").cast(d38)) *
          lit(epsDen).cast(d38) <=
          lit(epsNum).cast(d38) * col("__dx").cast(d38))
      .groupBy(col("__x1"), col("__y1"), col("__x2"), col("__y2"),
        col("__dx"), col("__dy"))
      .agg(sum(col("__c")).cast("long").as("consensus"))
      .orderBy(col("consensus").desc, col("__x1"), col("__y1"),
        col("__x2"), col("__y2"))
      .limit(1)
    best.crossJoin(broadcast(nPts)).crossJoin(broadcast(nCand))
      .withColumn("slope_micro", expr("(__dy * 1000000L) div __dx"))
      .withColumn("intercept_micro",
        expr("__y1 * 1000000L - slope_micro * __x1"))
      .select(col("n_points"), col("n_candidates"), col("consensus"),
        col("__x1").as("x1"), col("__y1").as("y1"),
        col("__x2").as("x2"), col("__y2").as("y2"),
        col("slope_micro"), col("intercept_micro"))
  }

  /** A-stat — sample-ratio mismatch (SRM) check: are k assignment
    * buckets uniform, as the experiment design claims? The goodness-
    * of-fit chi-square against EQUAL expected counts, cleared of
    * fractions so the statistic is EXACT rational arithmetic (no
    * quantization at all):
    *   χ² = Σ_i (k·o_i − n)² / (k·n).
    * The pre-analysis gate of every A/B test — an SRM means the
    * assignment mechanism is broken and no downstream metric can be
    * trusted. Missing buckets still contribute (densified against the
    * declared k; buckets must land in [0, k)). Returns one row:
    * (k, n, chi2, max_dev_ppm) with max_dev_ppm the worst bucket's
    * relative deviation |k·o − n| / n in ppm.
    *
    * Scale: one bucket-keyed agg (k rows) + a k-row finish. */
  def srmCheck(df: DataFrame, bucketCol: Column, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val d38 = "decimal(38,0)"
    val counts = df.groupBy(bucketCol.cast("long").as("__b"))
      .agg(count(lit(1)).as("__o"))
    val dense = counts.sparkSession.range(k).select(col("id").as("__b"))
      .join(counts, Seq("__b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
    val tot = dense.agg(sum(col("__o")).as("n"))
    dense.crossJoin(broadcast(tot))
      .withColumn("__dev",
        (col("__o").cast(d38) * k - col("n").cast(d38)).cast(d38))
      .agg(max(col("n")).as("n"),
        sum(col("__dev") * col("__dev")).cast(d38).as("__num"),
        max(expr("1000000 * abs(__dev) div cast(n as decimal(38,0))"))
          .as("max_dev_ppm"))
      .select(lit(k).cast("long").as("k"), col("n"),
        (col("__num").cast("double") /
          (lit(k).cast(d38) * col("n").cast(d38)).cast("double")).as("chi2"),
        col("max_dev_ppm"))
  }

  /** A-stat — Cohen's d standardized effect size between two groups:
    * the "how big, in standard deviations" companion to
    * [[welchTTest]]'s "how sure". Pooled variance from the same three
    * exact sums per group; the finish is pinned IEEE on exact
    * operands. Returns one row: (n_a, n_b, mean_a, mean_b, cohens_d).
    * |d| ~ 0.2 small / 0.5 medium / 0.8 large (Cohen 1988, public
    * literature). */
  def cohensD(df: DataFrame, valueCol: Column, groupCol: Column,
      groupA: String, groupB: String): DataFrame = {
    val d38 = "decimal(38,0)"
    def side(g: String, tag: String) = {
      val v = valueCol.cast("long")
      df.filter(groupCol === g).agg(
        count(lit(1)).cast(d38).as(s"n_$tag"),
        sum(v).cast(d38).as(s"s_$tag"),
        sum(v.cast(d38) * v.cast(d38)).cast(d38).as(s"q_$tag"))
    }
    def mean(t: String) =
      col(s"s_$t").cast("double") / col(s"n_$t").cast("double")
    // (n-1)·s² = (n·Q − S²)/n, exact numerator
    def ssd(t: String) =
      (col(s"n_$t") * col(s"q_$t") - col(s"s_$t") * col(s"s_$t"))
        .cast("double") / col(s"n_$t").cast("double")
    val sp = sqrt((ssd("a") + ssd("b")) /
      (col("n_a") + col("n_b") - 2).cast("double"))
    side(groupA, "a").crossJoin(side(groupB, "b"))
      .select(col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        mean("a").as("mean_a"), mean("b").as("mean_b"),
        when(col("n_a") + col("n_b") > 2,
          (mean("a") - mean("b")) / sp).as("cohens_d"))
  }

  /** A-stat — Kruskal–Wallis H test across k groups: the k-sample
    * generalization of [[mannWhitneyU]] (one-way ANOVA on ranks,
    * normality-free). Tie handling via the same DOUBLED-midrank
    * device, so every per-group rank sum R2ᵢ = 2·Rᵢ is an exact
    * integer; with Rᵢ² = R2ᵢ²/4,
    *   H₀ = 12/(N(N+1))·Σ Rᵢ²/nᵢ − 3(N+1) = Σ 3·R2ᵢ²/(N(N+1)nᵢ) − 3(N+1)
    * and the tie correction divides by C = 1 − Σ(t³−t)/(N³−N). Each
    * group's term is micro-quantized before the k-row sum, so the
    * statistic is reproducible bit-for-bit. Returns one row:
    * (k, n, tie_sum, h).
    *
    * Scale: ranks come from the DISTINCT-VALUE rollup — the ordered
    * window never touches the fact table; the (group, value) rollup
    * joins the value ranks broadcast. One fact pass at any volume. */
  def kruskalWallis(df: DataFrame, valueCol: Column,
      groupCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val perGV = df.groupBy(groupCol.as("__g"), valueCol.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val perV = perGV.groupBy(col("__v")).agg(sum(col("__c")).as("__cv"))
    val rank2 = perV.withColumn("__rank2",
      lit(2) * coalesce(sum(col("__cv")).over(
        Window.orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)) + col("__cv") + 1)
    val grp = perGV.join(broadcast(rank2.select(col("__v"), col("__rank2"))), "__v")
      .groupBy(col("__g"))
      .agg(sum(col("__c")).as("__ni"),
        sum(col("__c").cast(d38) * col("__rank2").cast(d38)).cast(d38).as("__r2"))
    val tot = grp.agg(sum(col("__ni")).as("__n"),
      count(lit(1)).as("__k"))
    val ties = perV.agg(sum(col("__cv").cast(d38) * col("__cv").cast(d38) *
      col("__cv").cast(d38) - col("__cv").cast(d38)).cast(d38).as("__t"))
    // per-group H term, micro-quantized: 3·R2ᵢ² / (N(N+1)·nᵢ)
    grp.crossJoin(broadcast(tot)).crossJoin(broadcast(ties))
      .withColumn("__term_u", round(lit(3.0) *
        (col("__r2") * col("__r2")).cast("double") /
        ((col("__n").cast(d38) * (col("__n") + 1).cast(d38)).cast("double") *
          col("__ni").cast("double")) * 1e6, 0).cast("long"))
      .agg(max(col("__k")).cast("long").as("k"),
        max(col("__n")).cast("long").as("n"),
        max(col("__t")).cast("long").as("tie_sum"),
        round((sum(col("__term_u")).cast("double") / 1e6 -
          lit(3.0) * (max(col("__n")) + 1).cast("double")) /
          (lit(1.0) - max(col("__t")).cast("double") /
            (max(col("__n")).cast(d38) * max(col("__n")).cast(d38) *
              max(col("__n")).cast(d38) - max(col("__n")).cast(d38))
              .cast("double")), 6).as("h"))
  }

  /** A-stat — η² (eta-squared) one-way effect size: the share of
    * total variance explained by the grouping,
    *   η² = SS_between / SS_total,
    * the "how much does the factor matter" companion to q187's
    * ANOVA F (which only says whether it matters at all). Group
    * terms S_g²/n_g are micro-quantized (groups are domain-bounded);
    * SS components are IEEE finishes over exact decimal sums.
    * Returns one row: (n, k_groups, eta_sq).
    *
    * Scale: one group-grain agg with map-side combine — identical
    * plan shape to anovaF. */
  def etaSquared(df: DataFrame, valueCol: Column,
      groupCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val v = valueCol.cast("long")
    val g = df.groupBy(groupCol.as("__g")).agg(
      count(lit(1)).as("__ng"),
      sum(v).cast(d38).as("__sg"),
      sum(v.cast(d38) * v.cast(d38)).cast(d38).as("__qg"))
    g.withColumn("__term_u", round(
        (col("__sg") * col("__sg")).cast("double") /
          col("__ng").cast("double") * 1e6, 0).cast("long"))
      .agg(sum(col("__ng")).cast(d38).as("__n"),
        count(lit(1)).as("__k"),
        sum(col("__sg")).cast(d38).as("__s"),
        sum(col("__qg")).cast(d38).as("__q"),
        sum(col("__term_u")).as("__tb"))
      .select(col("__n").cast("long").as("n"),
        col("__k").cast("long").as("k_groups"),
        round((col("__tb").cast("double") / 1e6 -
          (col("__s") * col("__s")).cast("double") /
            col("__n").cast("double")) /
          (col("__q").cast("double") -
            (col("__s") * col("__s")).cast("double") /
              col("__n").cast("double")), 6).as("eta_sq"))
  }

  /** A-stat — Hill tail-index estimator over the top-k order
    * statistics (Hill, Annals of Statistics 1975 — public literature):
    *   α̂ = k / Σ_{i≤k} ln(x_(i) / x_(k+1)),
    * the heavy-tail exponent of doc lengths / degree / spend — α < 2
    * means the mean is tail-dominated and per-partition skew guards
    * (salting, caps) are mandatory, which makes this the diagnostic
    * behind every q52/q64-style decision. Only the top-(k+1) VALUE
    * multiset matters, so ties need no ordering contract; each ln is
    * micro-quantized (k of them, bounded). Returns one row:
    * (k, x_tail, alpha).
    *
    * Scale: TakeOrdered pulls k+1 values with per-partition heaps; the
    * window runs over k+1 rows. One pass at any volume. */
  def hillTailIndex(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k >= 1")
    val top = df.select(valueCol.cast("long").as("__x"))
      .filter(col("__x") > 0)
      .orderBy(col("__x").desc).limit(k + 1)
      .withColumn("__rn", row_number().over(Window.orderBy(col("__x").desc)))
    val xk1 = top.filter(col("__rn") === k + 1)
      .select(col("__x").as("__xk1"))
    top.filter(col("__rn") <= k).crossJoin(broadcast(xk1))
      .withColumn("__term_u", round(
        log(col("__x").cast("double") / col("__xk1").cast("double")) * 1e6, 0)
        .cast("long"))
      .agg(count(lit(1)).cast("long").as("k"),
        max(col("__xk1")).cast("long").as("x_tail"),
        round(count(lit(1)).cast("double") /
          (sum(col("__term_u")).cast("double") / 1e6), 6).as("alpha"))
  }

  /** A-stat — Cochran's Q test over binary block×treatment outcomes
    * (Cochran, Biometrika 1950 — public literature): did any of k
    * related binary conditions (did the user convert in year 1/2/3,
    * did the doc pass gate A/B/C) differ, accounting for per-block
    * baselines? With C_j treatment totals, R_i block totals, N = ΣR_i,
    *   Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²)
    * — every sum exact DECIMAL(38,0); Q is one pinned IEEE division.
    * All-zero blocks contribute nothing and may be absent. Input is
    * one row per (block, treatment) with a boolean success. Returns
    * one row: (n_blocks, k, q).
    *
    * Scale: one block-grain agg + one treatment-grain agg with
    * map-side combine; no window, no pair space. */
  def cochranQ(df: DataFrame, blockCol: Column, treatmentCol: Column,
      successCond: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val cell = df.groupBy(blockCol.as("__b"), treatmentCol.as("__t"))
      .agg(max(when(successCond, 1L).otherwise(0L)).as("__x"))
    val k1 = cell.agg(count_distinct(col("__t")).as("__k"))
    val cj = cell.groupBy(col("__t")).agg(sum(col("__x")).as("__c"))
      .agg(sum(col("__c").cast(d38) * col("__c").cast(d38)).cast(d38)
        .as("__sc2"), sum(col("__c")).cast(d38).as("__n"))
    val ri = cell.groupBy(col("__b")).agg(sum(col("__x")).as("__r"))
      .agg(count(lit(1)).as("__nb"),
        sum(col("__r").cast(d38) * col("__r").cast(d38)).cast(d38).as("__sr2"))
    cj.crossJoin(broadcast(ri)).crossJoin(broadcast(k1))
      .select(col("__nb").cast("long").as("n_blocks"),
        col("__k").cast("long").as("k"),
        round(((col("__k") - 1).cast(d38) *
          (col("__k").cast(d38) * col("__sc2") - col("__n") * col("__n")))
          .cast("double") /
          (col("__k").cast(d38) * col("__n") - col("__sr2")).cast("double"),
          6).as("q"))
  }

  /** A-stat — Ljung–Box portmanteau test over an ordered series
    * (Ljung & Box, Biometrika 1978 — public literature): is ANY of the
    * first K autocorrelations nonzero — the "is this residual white
    * noise" gate run before trusting a forecast model. Centered values
    * are cleared of the mean fraction (c_i = n·x_i − S, exact longs),
    * so every ρ_k = Σc_i·c_{i+k} / Σc_i² is a ratio of exact decimals;
    * each lag's ρ_k²/(n−k) is nano-quantized before the K-term sum and
    *   Q = n(n+2)·Σ_k ρ_k²/(n−k)
    * finishes pinned. Returns one row: (n, k_lags, q).
    *
    * Scale: series-grain like [[mannKendall]] — the lag join offsets a
    * dense row_number over the rollup, never the fact table. */
  def ljungBox(series: DataFrame, orderCol: Column, valueCol: Column,
      kLags: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(kLags >= 1, "kLags >= 1")
    val d38 = "decimal(38,0)"
    val s = series.select(orderCol.as("__t"), valueCol.cast("long").as("__v"))
      .withColumn("__i", row_number().over(Window.orderBy(col("__t"))).cast("long"))
    val tot = s.agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    val c = s.crossJoin(broadcast(tot))
      .select(col("__i"),
        (col("__n").cast(d38) * col("__v").cast(d38) -
          col("__s").cast(d38)).cast(d38).as("__c"), col("__n"))
      .localCheckpoint() // rollup-sized; read by the base and K lag joins
    val den = c.agg(sum(col("__c") * col("__c")).cast(d38).as("__d"))
    val lagged = c.select(col("__i").as("__i2"), col("__c").as("__c2"))
    val nums = (1 to kLags).map { lag =>
      c.join(lagged, col("__i2") === col("__i") + lag)
        .agg(coalesce(sum(col("__c") * col("__c2")),
          lit(0).cast(d38)).cast(d38).as("__num"))
        .select(lit(lag.toLong).as("__lag"), col("__num"))
    }.reduce(_ unionAll _)
    nums.crossJoin(broadcast(den)).crossJoin(broadcast(tot))
      .withColumn("__rho", col("__num").cast("double") / col("__d").cast("double"))
      .withColumn("__term_nano", round(col("__rho") * col("__rho") /
        (col("__n") - col("__lag")).cast("double") * 1e9, 0).cast("long"))
      .agg(max(col("__n")).cast("long").as("n"),
        count(lit(1)).as("k_lags"),
        round(max(col("__n")).cast("double") *
          (max(col("__n")) + 2).cast("double") *
          (sum(col("__term_nano")).cast("double") / 1e9), 6).as("q"))
  }

  /** A-stat — Simpson diversity per key: the probability two draws
    * without replacement differ,
    *   D = 1 − Σ_c n_c(n_c−1) / (N(N−1)),
    * exact-integer numerators, one pinned IEEE division per key. The
    * concentration gauge a mixing pipeline reads per slice (one
    * dominating category → D ≈ 0). Returns
    * (…keys, n, n_categories, d).
    *
    * Scale: one (key, category) agg with map-side combine + a
    * key-sized rollup of it. */
  def simpsonDiversity(df: DataFrame, keys: Seq[Column],
      catCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = df.select(keys :+ catCol.as("__cat"): _*)
    val kNames = base.columns.dropRight(1).toSeq
    val cells = base.groupBy((kNames :+ "__cat").map(col): _*)
      .agg(count(lit(1)).as("__c"))
    cells.groupBy(kNames.map(col): _*)
      .agg(sum(col("__c")).as("n"), count(lit(1)).as("n_categories"),
        sum(col("__c").cast(d38) * (col("__c") - 1).cast(d38)).cast(d38)
          .as("__same"))
      .select(kNames.map(col) :+ col("n").cast("long").as("n") :+
        col("n_categories").cast("long").as("n_categories") :+
        when(col("n") > 1, round(lit(1.0) - col("__same").cast("double") /
          (col("n").cast(d38) * (col("n") - 1).cast(d38)).cast("double"), 6))
          .as("d"): _*)
  }

  /** A-stat — Theil T inequality index over positive integer values
    * (Theil 1967 — public literature): T = (1/N)·Σ (x/μ)·ln(x/μ),
    * the decomposable concentration measure beside q142's Gini.
    * x/μ clears the mean fraction as (x·N)/S — one IEEE division of
    * exact integers per DISTINCT value — and each distinct value's
    * term is micro-quantized then weighted by its exact count, so the
    * data-sized sum is a long aggregation. Returns one row:
    * (n, sum_x, theil).
    *
    * Scale: one distinct-value rollup with map-side combine; the libm
    * ln runs once per distinct value, never per row. */
  def theilIndex(df: DataFrame, valueCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val perV = df.select(valueCol.cast("long").as("__x"))
      .filter(col("__x") > 0)
      .groupBy(col("__x")).agg(count(lit(1)).as("__c"))
    val tot = perV.agg(sum(col("__c")).as("__n"),
      sum(col("__x").cast(d38) * col("__c").cast(d38)).cast(d38).as("__s"))
    perV.crossJoin(broadcast(tot))
      .withColumn("__ratio",
        (col("__x").cast(d38) * col("__n").cast(d38)).cast("double") /
          col("__s").cast("double"))
      .withColumn("__term_u",
        round(col("__ratio") * log(col("__ratio")) * 1e6, 0).cast("long"))
      .agg(max(col("__n")).cast("long").as("n"),
        max(col("__s")).cast("long").as("sum_x"),
        round(sum(col("__c").cast(d38) * col("__term_u").cast(d38))
          .cast("double") / 1e6 / max(col("__n")).cast("double"), 6)
          .as("theil"))
  }

  /** A-stat — market-concentration audit per market (Herfindahl 1950 /
    * Hirschman 1945; the HHI + CRₖ pair antitrust and sourcing-risk
    * reviews read): per market, the Herfindahl–Hirschman index on the
    * 0–10000 points scale, HHI = 10⁴·Σᵢ sᵢ²/T², and the top-k
    * concentration ratios CRₖ = (Σ top-k firm values)/T. Firm ranks
    * break ties on the firm key, so CRₖ is deterministic under equal
    * shares. Every numerator/denominator is an exact integer
    * (decimal(38,0) squares); each readout is one pinned-order IEEE
    * chain — bit-identical across engines.
    *
    * Returns per market: (market, n_firms, total, hhi, cr1, cr4, cr8).
    *
    * Scale: ONE (market, firm) rollup off the fact table (map-side
    * combine); the rank window is market-partitioned; the finish is a
    * |markets|-row agg. Nothing global. */
  def marketConcentration(df: DataFrame, marketCol: Column, firmCol: Column,
      valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val cells = df.select(marketCol.as("market"), firmCol.as("__f"),
        valueCol.cast("long").as("__v"))
      .groupBy(col("market"), col("__f")).agg(sum(col("__v")).as("__s"))
    val ranked = cells.withColumn("__r", row_number().over(
      Window.partitionBy(col("market"))
        .orderBy(col("__s").desc, col("__f"))))
    val aggs = Seq(
      count(lit(1)).as("n_firms"),
      sum(col("__s")).cast(d38).as("__t"),
      sum(col("__s").cast(d38) * col("__s").cast(d38)).cast(d38).as("__sq")) ++
      Seq(1, 4, 8).map(k =>
        sum(when(col("__r") <= k, col("__s")).otherwise(0L)).as(s"__top$k"))
    def cr(k: Int) = when(col("__t") =!= 0,
      col(s"__top$k").cast("double") / col("__t").cast("double"))
    ranked.groupBy(col("market")).agg(aggs.head, aggs.tail: _*)
      .select(col("market"), col("n_firms"),
        col("__t").cast("long").as("total"),
        when(col("__t") =!= 0,
          col("__sq").cast("double") * 10000.0 /
            col("__t").cast("double") / col("__t").cast("double")).as("hhi"),
        cr(1).as("cr1"), cr(4).as("cr4"), cr(8).as("cr8"))
      .orderBy(col("market"))
  }

  /** A-stat — Atkinson inequality index, ε = 1 (Atkinson 1970):
    * A₁ = 1 − geomean(x)/mean(x) over positive values, per group —
    * the welfare-weighted companion to Gini (q142) and Theil (q253):
    * A₁ is the fraction of total value society could discard and be
    * exactly as well off under equality. The q253 determinism
    * discipline: ln runs once per DISTINCT value and is micro-nat
    * quantized to a long; sums are exact; the geometric mean's exp
    * takes a bit-identical rational argument, so both engines feed
    * libm the same double and the round-6 readout is stable.
    *
    * Returns per group: (g, n, sum_x, mean_ln_micro, atkinson).
    *
    * Scale: one (group, distinct-value) rollup with map-side combine;
    * libm work is |distinct values|, never |rows|. */
  def atkinsonIndex(df: DataFrame, valueCol: Column,
      groupCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val perV = df.select(groupCol.as("g"), valueCol.cast("long").as("__x"))
      .filter(col("__x") > 0)
      .groupBy(col("g"), col("__x")).agg(count(lit(1)).as("__c"))
      .withColumn("__lnu", round(log(col("__x")) * 1e6, 0).cast("long"))
    perV.groupBy(col("g"))
      .agg(sum(col("__c")).as("n"),
        sum(col("__x").cast(d38) * col("__c").cast(d38)).cast(d38).as("__s"),
        sum(col("__lnu").cast(d38) * col("__c").cast(d38)).cast(d38)
          .as("__lns"))
      .select(col("g"), col("n").cast("long").as("n"),
        col("__s").cast("long").as("sum_x"),
        expr("cast(__lns div n as long)").as("mean_ln_micro"),
        round(lit(1.0) -
          exp(expr("cast(__lns div n as long)").cast("double") / 1e6) /
            (col("__s").cast("double") / col("n").cast("double")), 6)
          .as("atkinson"))
      .orderBy(col("g"))
  }

  /** A-stat — Cochran–Armitage trend test: is a binary outcome's rate
    * MONOTONE across k ordered exposure groups (dose, decile, version)
    * — strictly more powerful than the omnibus χ² when the alternative
    * is a trend. With integer scores w_i, group sizes n_i, successes
    * r_i, N, R totals:
    *   Z² = N·(N·Σw·r − R·Σw·n)² /
    *        (R·(N−R)·(N·Σw²·n − (Σw·n)²))
    * — every sum exact DECIMAL(38,0), one pinned finish. Returns one
    * row: (n, k_groups, chi2_trend).
    *
    * Scale: one group-grain agg with map-side combine; group count is
    * domain-bounded. */
  def cochranArmitage(df: DataFrame, scoreCol: Column,
      successCond: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val g = df.groupBy(scoreCol.cast("long").as("__w"))
      .agg(count(lit(1)).as("__ni"),
        sum(when(successCond, 1L).otherwise(0L)).as("__ri"))
    g.agg(sum(col("__ni")).cast(d38).as("__n"),
      count(lit(1)).as("__k"),
      sum(col("__ri")).cast(d38).as("__r"),
      sum(col("__w").cast(d38) * col("__ri").cast(d38)).cast(d38).as("__swr"),
      sum(col("__w").cast(d38) * col("__ni").cast(d38)).cast(d38).as("__swn"),
      sum(col("__w").cast(d38) * col("__w").cast(d38) *
        col("__ni").cast(d38)).cast(d38).as("__swwn"))
      .select(col("__n").cast("long").as("n"),
        col("__k").cast("long").as("k_groups"),
        round((col("__n") *
          (col("__n") * col("__swr") - col("__r") * col("__swn")) *
          (col("__n") * col("__swr") - col("__r") * col("__swn")))
          .cast("double") /
          (col("__r") * (col("__n") - col("__r")) *
            (col("__n") * col("__swwn") - col("__swn") * col("__swn")))
          .cast("double"), 6).as("chi2_trend"))
  }

  /** A-stat — Mann–Kendall trend test over an ordered series (Mann
    * 1945; Kendall 1975 — public literature): the nonparametric "is
    * this metric drifting" readout run on time-grain rollups, immune
    * to outliers and monotone transforms.
    *   S = Σ_{i<j} sgn(x_j − x_i)          (exact integer)
    *   18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)   (tie-corrected)
    * and the continuity-corrected z = (S∓1)/√(Var) is one pinned IEEE
    * finish. Returns one row: (n, s, var18, z).
    *
    * Scale: the input is a SERIES — pass the time-grain rollup, never
    * raw facts; the pair space is series², bounded by the rollup grain
    * (monthly/daily), not data volume. */
  def mannKendall(series: DataFrame, orderCol: Column,
      valueCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val s = series.select(orderCol.as("__t"), valueCol.cast("long").as("__v"))
    val a = s.toDF("__t1", "__v1")
    val b = s.toDF("__t2", "__v2")
    val pairs = a.join(b, col("__t1") < col("__t2"))
      .agg(count(lit(1)).as("__np"),
        sum(signum(col("__v2") - col("__v1")).cast("long")).as("__s"))
    val ties = s.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c")).as("__n"),
        sum(col("__c").cast(d38) * (col("__c") - 1).cast(d38) *
          (col("__c") * 2 + 5).cast(d38)).cast(d38).as("__tsum"))
    pairs.crossJoin(broadcast(ties))
      .withColumn("__var18",
        (col("__n").cast(d38) * (col("__n") - 1).cast(d38) *
          (col("__n") * 2 + 5).cast(d38) - col("__tsum")).cast(d38))
      .select(col("__n").cast("long").as("n"),
        col("__s").cast("long").as("s"),
        col("__var18").cast("long").as("var18"),
        round(when(col("__var18") > 0,
          when(col("__s") > 0, (col("__s") - 1).cast("double") /
            sqrt(col("__var18").cast("double") / 18.0))
            .when(col("__s") < 0, (col("__s") + 1).cast("double") /
              sqrt(col("__var18").cast("double") / 18.0))
            .otherwise(lit(0.0))).otherwise(lit(0.0)), 6).as("z"))
  }

  /** A-stat — SEASONAL Mann–Kendall trend test (Hirsch & Slack 1984,
    * Water Resources Research): [[mannKendall]] computed WITHIN each
    * season (month, weekday …) and summed — the trend readout that
    * doesn't confuse seasonality with drift (a pure annual cycle
    * scores S = 0 here but can score huge on plain MK):
    *   S = Σ_s S_s,  18·Var = Σ_s [n_s(n_s−1)(2n_s+5) − Σ_t t(t−1)(2t+5)]
    * with the continuity-corrected z as one pinned finish. Returns
    * one row per season (season, n, s, var18) each carrying the
    * dataset totals (s_total, var18_total, z) — the per-season S
    * column shows WHICH seasons drive the trend.
    *
    * Scale: pair spaces are per-season series² (rollup-grain); the
    * season equi-join key keeps the join uniform. Input is a SERIES
    * rollup by contract. */
  def seasonalMannKendall(series: DataFrame, seasonCol: Column,
      orderCol: Column, valueCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val s = series.select(seasonCol.as("__sea"), orderCol.as("__t"),
      valueCol.cast("long").as("__v"))
    val a = s.toDF("__sea", "__t1", "__v1")
    val b = s.toDF("__sea", "__t2", "__v2")
    val perSeason = a.join(b, Seq("__sea"))
      .filter(col("__t1") < col("__t2"))
      .groupBy(col("__sea"))
      .agg(sum(signum(col("__v2") - col("__v1")).cast("long")).as("__s"))
    val ties = s.groupBy(col("__sea"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("__sea"))
      .agg(sum(col("__c")).as("__n"),
        (sum(col("__c").cast(d38) * (col("__c") - 1).cast(d38) *
          (col("__c") * 2 + 5).cast(d38))).cast(d38).as("__tsum"))
    val rows = ties.join(perSeason, Seq("__sea"), "left")
      .withColumn("__s", coalesce(col("__s"), lit(0L)))
      .withColumn("__var18",
        (col("__n").cast(d38) * (col("__n") - 1).cast(d38) *
          (col("__n") * 2 + 5).cast(d38) - col("__tsum")).cast(d38))
      .localCheckpoint()
    val tot = rows.agg(sum(col("__s")).as("__st"),
      sum(col("__var18")).cast(d38).as("__vt"))
    rows.crossJoin(broadcast(tot))
      .select(col("__sea").as("season"), col("__n").cast("long").as("n"),
        col("__s").as("s"), col("__var18").cast("long").as("var18"),
        col("__st").as("s_total"), col("__vt").cast("long").as("var18_total"),
        round(when(col("__vt") > 0,
          when(col("__st") > 0, (col("__st") - 1).cast("double") /
            sqrt(col("__vt").cast("double") / 18.0))
            .when(col("__st") < 0, (col("__st") + 1).cast("double") /
              sqrt(col("__vt").cast("double") / 18.0))
            .otherwise(lit(0.0))).otherwise(lit(0.0)), 6).as("z"))
      .orderBy(col("season"))
  }

  /** A-stat — Pettitt changepoint test over an ordered series
    * (Pettitt, JRSS-C 1979 — public literature): locates the single
    * most likely level-shift point without assuming a distribution.
    *   U_t = Σ_{i≤t} Σ_{j>t} sgn(x_j − x_i)     (exact integers)
    * and the report is the maximizing split: K = max_t |U_t|, t* the
    * smallest maximizer. Returns one row: (n, t_star, u_t, k_abs).
    *
    * Scale: series-grain like [[mannKendall]] — the pair space and the
    * |U_t| scan are rollup², never data-sized. */
  def pettitt(series: DataFrame, orderCol: Column,
      valueCol: Column): DataFrame = {
    val s = series.select(orderCol.as("__t"), valueCol.cast("long").as("__v"))
    val a = s.toDF("__t1", "__v1")
    val b = s.toDF("__t2", "__v2")
    // pair (i, j), i < j, contributes sgn(x_j − x_i) to every U_t with
    // t in [t_i, t_j) — realized as a range join against the split grid
    val pairs = a.join(b, col("__t1") < col("__t2"))
      .select(col("__t1"), col("__t2"),
        signum(col("__v2") - col("__v1")).cast("long").as("__sgn"))
    val grid = s.select(col("__t").as("__split"))
    val u = pairs.join(grid,
        col("__t1") <= col("__split") && col("__split") < col("__t2"))
      .groupBy(col("__split")).agg(sum(col("__sgn")).as("__u"))
    val n = s.agg(count(lit(1)).as("__n"))
    u.crossJoin(broadcast(n))
      .orderBy(abs(col("__u")).desc, col("__split"))
      .limit(1)
      .select(col("__n").cast("long").as("n"),
        col("__split").as("t_star"),
        col("__u").cast("long").as("u_t"),
        abs(col("__u")).cast("long").as("k_abs"))
  }

  /** A-stat — G-test (log-likelihood-ratio) of independence over an
    * R×C contingency: G = 2·Σ_{o>0} o·ln(o·N/(r·c)) — the
    * information-theoretic twin of [[chiSquare]] (G = 2N·MI in nats),
    * better behaved when expected counts are small. Each cell's term
    * is micro-quantized before the contingency-sized sum (zero cells
    * contribute 0 — lim x·ln x = 0). Returns one row: (g, dof, n).
    *
    * Scale: one (r, c) agg + two marginal rollups of it — identical
    * plan shape to chiSquare; the fact table is read once. */
  def gTest(df: DataFrame, rowCol: Column, colCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val observed = df.groupBy(rowCol.as("__r"), colCol.as("__c"))
      .agg(count(lit(1)).as("__o"))
    val rm = observed.groupBy(col("__r")).agg(sum(col("__o")).as("__rn"))
    val cm = observed.groupBy(col("__c")).agg(sum(col("__o")).as("__cn"))
    val tot = observed.agg(sum(col("__o")).as("__tot"),
      count_distinct(col("__r")).as("__dr"),
      count_distinct(col("__c")).as("__dc"))
    observed.join(rm, "__r").join(cm, "__c").crossJoin(broadcast(tot))
      .withColumn("__term_u", round(col("__o").cast("double") *
        log((col("__o").cast(d38) * col("__tot")).cast("double") /
          (col("__rn").cast(d38) * col("__cn")).cast("double")) * 1e6, 0)
        .cast("long"))
      .agg(round(lit(2.0) * sum(col("__term_u")).cast("double") / 1e6, 6)
        .as("g"),
        ((max(col("__dr")) - 1) * (max(col("__dc")) - 1)).as("dof"),
        max(col("__tot")).cast("long").as("n"))
  }

  /** A-stat — Wilcoxon signed-rank test over paired integer metrics
    * (x, y): the paired complement to [[mannWhitneyU]] — did the
    * second condition shift the metric, unit by unit? Zero diffs drop
    * (the standard Wilcoxon convention); |d| ranks use the DOUBLED-
    * midrank device over the DISTINCT-|d| rollup, so
    * W2⁺ = 2·W⁺ = Σ_{d>0} rank2(|d|) is an exact integer. The
    * normal-approximation z clears nothing — it is one pinned IEEE
    * expression on exact operands:
    *   z = (W2⁺ − n(n+1)/2) / (2·√(n(n+1)(2n+1)/24 − Σ(t³−t)/48)).
    * Returns one row: (n, n_pos, w2_plus, z).
    *
    * Scale: one pair-grain projection, one |d|-rollup (window over the
    * rollup, never the pairs), one broadcast join back. */
  def wilcoxonSignedRank(pairs: DataFrame, xCol: Column,
      yCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val d = pairs.select((yCol.cast("long") - xCol.cast("long")).as("__d"))
      .filter(col("__d") =!= 0)
      .select(abs(col("__d")).as("__ad"),
        when(col("__d") > 0, 1L).otherwise(0L).as("__pos"))
    val perAd = d.groupBy(col("__ad"))
      .agg(count(lit(1)).as("__c"), sum(col("__pos")).as("__cp"))
    val rank2 = perAd.withColumn("__rank2",
      lit(2) * coalesce(sum(col("__c")).over(
        Window.orderBy(col("__ad")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)) + col("__c") + 1)
    rank2.agg(
      sum(col("__c")).cast("long").as("n"),
      sum(col("__cp")).cast("long").as("n_pos"),
      sum(col("__cp").cast(d38) * col("__rank2").cast(d38)).cast(d38).as("__w2"),
      sum(col("__c").cast(d38) * col("__c").cast(d38) * col("__c").cast(d38) -
        col("__c").cast(d38)).cast(d38).as("__t"))
      .select(col("n"), col("n_pos"), col("__w2").cast("long").as("w2_plus"),
        round((col("__w2").cast("double") -
          col("n").cast("double") * (col("n") + 1).cast("double") / 2.0) /
          (lit(2.0) * sqrt(col("n").cast("double") * (col("n") + 1).cast("double") *
            (col("n") * 2 + 1).cast("double") / 24.0 -
            col("__t").cast("double") / 48.0)), 6).as("z"))
  }

  /** A-stat/A-quantile — Hodges–Lehmann pseudo-median per key (Hodges
    * & Lehmann, Ann. Math. Stat. 1963 — public literature): the median
    * of all pairwise Walsh averages (x_i + x_j)/2, i ≤ j — the
    * location estimate behind the Wilcoxon test, ~30% outlier-robust
    * like the median but far more efficient at clean data.
    *
    * Determinism contract: the pair multiset is built from the
    * DISTINCT-VALUE rollup (value v_a pairs with v_b carry weight
    * c_a·c_b, a diagonal cell c·(c+1)/2), kept in DOUBLED integer
    * units d = v_i + v_j so nothing floats; the median is the
    * all-integer LOWER crossing cumw·2 ≥ W of [[weightedQuantile]].
    * Returns per key: (keys…, n, n_pairs, hl_doubled, hl) with
    * hl = hl_doubled/2 as the one readout division.
    *
    * Scale: the pair space is |distinct values|² PER KEY — rollup
    * grain, never the fact table (the [[theilSen]] altitude); the
    * windows run over the distinct-SUM rollup. Wide-domain value
    * columns should be quantized before calling (the house rule every
    * rank op here shares). */
  def hodgesLehmann(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
      valueCol: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keys.nonEmpty, "hodgesLehmann requires at least one key column " +
      "(use a constant literal key for a global estimate)")
    val kc = keys.map(col)
    val rollup = df.groupBy((kc :+ valueCol.cast("long").as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // distinct-value grain; both pair sides + n read it
    val n = rollup.groupBy(kc: _*).agg(sum(col("__c")).as("n"))
    val a = rollup.select((kc :+ col("__v").as("__v1") :+
      col("__c").as("__c1")): _*)
    val b = rollup.select((kc :+ col("__v").as("__v2") :+
      col("__c").as("__c2")): _*)
    val pairs = a.join(b, keys).filter(col("__v1") <= col("__v2"))
      .withColumn("__d", col("__v1") + col("__v2"))
      .withColumn("__pw", when(col("__v1") === col("__v2"),
          expr("(__c1 * (__c1 + 1)) div 2"))
        .otherwise(col("__c1") * col("__c2")))
      .groupBy((kc :+ col("__d")): _*)
      .agg(sum(col("__pw")).as("__w"))
    val wk = Window.partitionBy(kc: _*).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(kc: _*)
    pairs
      .withColumn("__cumw", sum(col("__w")).over(wk))
      .withColumn("__tw", sum(col("__w")).over(tot))
      .filter(col("__cumw") * 2 >= col("__tw"))
      .groupBy(kc: _*)
      .agg(min(col("__d")).as("hl_doubled"), min(col("__tw")).as("n_pairs"))
      .join(n, keys)
      .select((kc :+ col("n") :+ col("n_pairs") :+ col("hl_doubled") :+
        round(col("hl_doubled").cast("double") / 2, 6).as("hl")): _*)
  }

  /** A-stat — Friedman test (Friedman, JASA 1937 — public literature):
    * do k treatments differ across b matched blocks, rank-based — the
    * repeated-measures counterpart to [[kruskalWallis]] (which assumes
    * independent groups and is wrong for within-block designs like
    * per-order line positions or per-user variant exposures). Only
    * COMPLETE blocks (all k treatments present) enter; one observation
    * per (block, treatment) is enforced by a deterministic max.
    *
    * Ranks are DOUBLED midranks computed inside each block from two
    * windows (2·|≤v| − |=v| + 1 — the [[spearmanExact]] device), so the
    * tie-corrected statistic
    *   Fr = (k−1)·Σ_j (R2_j − b(k+1))² / (Σ r2² − b·k·(k+1)²)
    * is a ratio of exact integers (doubled units clear every ½) with
    * ONE final double division. Ties across a whole block cancel from
    * both sides, as they must. Returns one row: (n_blocks, k, fr).
    *
    * Scale: a (block, treatment) cell agg, block-keyed windows over
    * k-row partitions, then a k-row treatment rollup — the fact table
    * is touched once, everything after is block/treatment grain. */
  def friedman(df: org.apache.spark.sql.DataFrame, blockCol: Column,
      treatmentCol: Column, valueCol: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val cell = df.groupBy(blockCol.as("__b"), treatmentCol.as("__t"))
      .agg(max(valueCol.cast("long")).as("__v"))
    val k1 = cell.agg(count_distinct(col("__t")).as("__k"))
    val sized = cell.groupBy(col("__b")).agg(count(lit(1)).as("__nt"))
    val complete = cell.join(sized, "__b").crossJoin(broadcast(k1))
      .filter(col("__nt") === col("__k"))
    val wLE = Window.partitionBy(col("__b")).orderBy(col("__v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wEq = Window.partitionBy(col("__b"), col("__v"))
    val ranked = complete
      .withColumn("__le", count(lit(1)).over(wLE))
      .withColumn("__eq", count(lit(1)).over(wEq))
      .withColumn("__r2", lit(2) * col("__le") - col("__eq") + 1)
      .localCheckpoint() // cell grain; treatment rollup + square sum read it
    val perT = ranked.groupBy(col("__t"))
      .agg(sum(col("__r2")).cast(d38).as("__rsum"))
    val tot = ranked.agg(
      sum(col("__r2").cast(d38) * col("__r2").cast(d38)).cast(d38).as("__sr2"),
      count_distinct(col("__b")).cast(d38).as("__nb"),
      count_distinct(col("__t")).cast(d38).as("__kk"))
    perT.crossJoin(broadcast(tot))
      .withColumn("__dev", col("__rsum") - col("__nb") * (col("__kk") + 1))
      .agg(max(col("__nb")).as("__b2"), max(col("__kk")).as("__k2"),
        max(col("__sr2")).as("__q2"),
        sum(col("__dev") * col("__dev")).cast(d38).as("__sd2"))
      .select(col("__b2").cast("long").as("n_blocks"),
        col("__k2").cast("long").as("k"),
        round(((col("__k2") - 1) * col("__sd2")).cast("double") /
          (col("__q2") - col("__b2") * col("__k2") *
            (col("__k2") + 1) * (col("__k2") + 1)).cast("double"), 6)
          .as("fr"))
  }

  /** A-quantile/E6 — Lorenz concentration curve: for each of nBins
    * population quantiles (bottom 10%, 20%, … of rows in VALUE order),
    * the exact share of total value that prefix holds — the curve
    * behind [[graft.ops.EventAnalytics.giniConcentration]]'s one
    * number, and the "what do the bottom 80% of documents contribute"
    * readout that sizes a corpus-pruning decision.
    *
    * Exactness: the prefix of m = (N·d) div nBins rows may SPLIT a tie
    * group; the split is integer arithmetic on the distinct-value
    * rollup (prev groups' full sum + (m − cum_before)·v), so the curve
    * is exact under any tie order. share = (1e6·prefix) div total.
    * Returns one row per quantile: (quantile, pop_rows, cum_value,
    * share_ppm).
    *
    * Scale: one distinct-value rollup agg (map-side combine), a
    * rollup-sized prefix window, and an nBins-row broadcast range join
    * to locate each crossing — fact table touched once. */
  def lorenzCurve(df: org.apache.spark.sql.DataFrame, valueCol: Column,
      nBins: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBins >= 2, "lorenzCurve needs >= 2 quantiles")
    val d38 = "decimal(38,0)"
    val rollup = df.groupBy(valueCol.cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__s", col("__v").cast(d38) * col("__c").cast(d38))
    val prev = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val cum = rollup
      .withColumn("__cb", coalesce(sum(col("__c")).over(prev), lit(0L)))
      .withColumn("__sb", coalesce(sum(col("__s")).over(prev),
        lit(0).cast(d38)))
      .withColumn("__nn", sum(col("__c")).over(all))
      .withColumn("__tt", sum(col("__s")).over(all))
    val bins = df.sparkSession.range(1, nBins + 1)
      .select(col("id").as("quantile"))
    cum.join(broadcast(bins),
        expr(s"__cb < (__nn * quantile) div ${nBins}L") &&
          expr(s"(__nn * quantile) div ${nBins}L <= __cb + __c"))
      .withColumn("__m", expr(s"(__nn * quantile) div ${nBins}L"))
      .withColumn("__cv",
        col("__sb") + (col("__m") - col("__cb")).cast(d38) * col("__v").cast(d38))
      .select(col("quantile"), col("__m").as("pop_rows"),
        col("__cv").cast("long").as("cum_value"),
        expr("(__cv * 1000000) div __tt").cast("long").as("share_ppm"))
  }

  /** A-stat — TOST equivalence test (two one-sided tests; Schuirmann,
    * J. Pharmacokinetics 1987 — public literature): is the A−B mean
    * difference provably WITHIN ±margin — the question a "no
    * regression" launch review actually asks, which [[welchTTest]]'s
    * "is there a difference" cannot answer (absence of evidence ≠
    * evidence of absence).
    *   t_lower = (Δ + margin)/se,  t_upper = (Δ − margin)/se
    * and equivalence holds at α = 0.05 when t_lower ≥ 1.644854 AND
    * t_upper ≤ −1.644854 (the large-sample z criterion, literal
    * constant — no t-quantile lookup, the q225 discipline). Built on
    * the same three exact sums per group as Welch; doubles appear only
    * in the 1-row finish. Returns one row: (n_a, n_b, mean_diff, se,
    * t_lower, t_upper, equivalent). */
  def tostEquivalence(df: org.apache.spark.sql.DataFrame, valueCol: Column,
      groupCol: Column, groupA: String, groupB: String,
      margin: Long): org.apache.spark.sql.DataFrame = {
    require(margin > 0, "equivalence margin must be positive")
    val d38 = "decimal(38,0)"
    def side(g: String, tag: String) = {
      val v = valueCol.cast("long")
      df.filter(groupCol === g).agg(
        count(lit(1)).cast(d38).as(s"n_$tag"),
        sum(v).cast(d38).as(s"s_$tag"),
        sum(v.cast(d38) * v.cast(d38)).cast(d38).as(s"q_$tag"))
    }
    def mean(t: String) =
      col(s"s_$t").cast("double") / col(s"n_$t").cast("double")
    def variance(t: String) =
      (col(s"n_$t") * col(s"q_$t") - col(s"s_$t") * col(s"s_$t")).cast("double") /
        (col(s"n_$t") * (col(s"n_$t") - 1)).cast("double")
    def se2(t: String) = variance(t) / col(s"n_$t").cast("double")
    val delta = mean("a") - mean("b")
    val se = sqrt(se2("a") + se2("b"))
    val zCrit = 1.644854
    side(groupA, "a").crossJoin(side(groupB, "b"))
      .withColumn("__tl", round((delta + margin) / se, 6))
      .withColumn("__tu", round((delta - margin) / se, 6))
      .select(col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        round(delta, 6).as("mean_diff"), round(se, 6).as("se"),
        col("__tl").as("t_lower"), col("__tu").as("t_upper"),
        (col("__tl") >= zCrit && col("__tu") <= -zCrit).as("equivalent"))
  }

  /** A-stat — Gumbel extreme-value fit by the method of moments
    * (Gumbel 1958 — public literature) over per-block MAXIMA: group
    * the metric into blocks (months, days), keep each block's max,
    * and fit the Type-I extreme-value law those maxima converge to
    * (Fisher–Tippett): scale β = s·√6/π and location μ = x̄ − γ·β
    * (γ = Euler–Mascheroni), then read the exceedance probability
    * P(X > T) = 1 − exp(−exp(−(T−μ)/β)) for a design threshold T.
    * "How likely is next month's peak to blow past X" — capacity
    * planning's question, which a normal fit materially understates
    * (maxima have the heavier Gumbel tail).
    *
    * Exactness: block maxima and both moments are exact integers
    * (moment agg over the block rollup); β, μ and the double-exp
    * readout are a bounded finish with LITERAL constants
    * (√6/π = 0.7796968012336293, γ = 0.5772156649015329), written
    * token-for-token in the oracle. Returns one row:
    * (n_blocks, mean, sd, beta, mu, p_exceed). */
  def gumbelFit(df: org.apache.spark.sql.DataFrame, blockCol: Column,
      valueCol: Column, threshold: Long): org.apache.spark.sql.DataFrame = {
    val d38 = "decimal(38,0)"
    val maxima = df.groupBy(blockCol.as("__b"))
      .agg(max(valueCol.cast("long")).as("__m"))
    val mom = maxima.agg(count(lit(1)).cast(d38).as("__n"),
      sum(col("__m")).cast(d38).as("__s"),
      sum(col("__m").cast(d38) * col("__m").cast(d38)).cast(d38).as("__q"))
    val mean = col("__s").cast("double") / col("__n").cast("double")
    val sd = sqrt((col("__n") * col("__q") - col("__s") * col("__s"))
      .cast("double") / (col("__n") * (col("__n") - 1)).cast("double"))
    val beta = sd * 0.7796968012336293
    val mu = mean - lit(0.5772156649015329) * beta
    mom.select(col("__n").cast("long").as("n_blocks"),
      round(mean, 6).as("mean"), round(sd, 6).as("sd"),
      round(beta, 6).as("beta"), round(mu, 6).as("mu"),
      round(lit(1.0) - exp(-exp((mu - threshold) / beta)), 6)
        .as("p_exceed"))
  }

  /** A-stat — 1-Wasserstein (earth-mover) distance between the
    * empirical distributions of two slices of an integer metric
    * (Vaserstein 1969; the Kantorovich–Rubinstein dual on ℝ — public
    * literature):
    *   W₁ = ∫ |F_A(x) − F_B(x)| dx = Σ_i |F_A(v_i) − F_B(v_i)|·(v_{i+1} − v_i)
    * over the sorted distinct values — drift measured IN THE METRIC'S
    * OWN UNITS ("order value shifted $230 of mass"), where KS (q154)
    * reports only the worst vertical gap, and PSI/JSD (q267/q218)
    * report unitless nats. The most decision-legible of the drift
    * family.
    *
    * Exactness: EVERYTHING is integer — the CDF gap is fraction-
    * cleared to |cumA·nB − cumB·nA| and weighted by the exact value
    * gap; one final double division by nA·nB, mirrored in the oracle.
    * Returns one row: (n_a, n_b, n_values, w1).
    *
    * Scale: one distinct-value rollup agg with map-side combine +
    * rollup-sized prefix/lead windows (the [[ksTest]] envelope).
    * Quantize wide domains first (the rank-op house rule). */
  def wasserstein1(df: org.apache.spark.sql.DataFrame, valueCol: Column,
      sliceCol: Column, sliceA: String,
      sliceB: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val rollup = df.filter(sliceCol.isin(sliceA, sliceB))
      .groupBy(valueCol.cast("long").as("__v"))
      .agg(sum(when(sliceCol === sliceA, 1L).otherwise(0L)).as("__ca"),
        sum(when(sliceCol === sliceB, 1L).otherwise(0L)).as("__cb"))
    val w = Window.orderBy(col("__v"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    rollup
      .withColumn("__cuma", sum(col("__ca")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__cumb", sum(col("__cb")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__gap", lead(col("__v"), 1).over(w) - col("__v"))
      .withColumn("__na", sum(col("__ca")).over(all))
      .withColumn("__nb", sum(col("__cb")).over(all))
      .withColumn("__t", when(col("__gap").isNotNull,
        abs(col("__cuma").cast(d38) * col("__nb") -
          col("__cumb").cast(d38) * col("__na")) * col("__gap"))
        .otherwise(lit(0).cast(d38)))
      .agg(max(col("__na")).as("__na2"), max(col("__nb")).as("__nb2"),
        count(lit(1)).as("n_values"), sum(col("__t")).cast(d38).as("__num"))
      .select(col("__na2").as("n_a"), col("__nb2").as("n_b"),
        col("n_values"),
        round(col("__num").cast("double") /
          (col("__na2").cast(d38) * col("__nb2").cast(d38)).cast("double"), 6)
          .as("w1"))
  }

  /** A-stat — Anderson–Darling normality test (Anderson & Darling
    * 1952; Stephens 1974 for the small-sample correction and the 5%
    * critical value 0.752 — public literature) over a BOUNDED sample
    * (a rollup series — monthly counts, per-group stats; never the
    * raw fact table):
    *   A² = −n − (1/n)·Σ_i (2i−1)[ln Φ(z_(i)) + ln(1 − Φ(z_(n+1−i)))]
    * rewritten index-free as Σ_i [(2i−1)·ln Φ(z_i) +
    * (2(n−i)+1)·ln(1−Φ(z_i))] so one ranked pass suffices. The
    * tail-weighted goodness-of-fit gate run before trusting any
    * ±kσ rule (q115's outlier flags, q263's control limits) — AD
    * catches the heavy tails a KS test waves through.
    *
    * Determinism contract: moments are exact sums; Φ is the
    * Abramowitz–Stegun 7.1.26 erfc polynomial (the q220 device),
    * evaluated token-for-token identically in the oracle; ranks come
    * from [[Ranking.globalRowNumber]] (no single-partition window);
    * each row's term is nano-quantized before the integer sum.
    * Returns one row: (n, mean, sd, a2, a2_star, non_normal) with
    * A*² = A²(1 + 0.75/n + 2.25/n²) vs the 0.752 literal. */
  def andersonDarling(df: org.apache.spark.sql.DataFrame,
      valueCol: Column): org.apache.spark.sql.DataFrame = {
    val d38 = "decimal(38,0)"
    val vals = df.select(valueCol.cast("long").as("__v"))
    val mom = vals.agg(count(lit(1)).cast(d38).as("__n"),
      sum(col("__v")).cast(d38).as("__s"),
      sum(col("__v").cast(d38) * col("__v").cast(d38)).cast(d38).as("__q"))
    val mean = col("__s").cast("double") / col("__n").cast("double")
    val sd = sqrt((col("__n") * col("__q") - col("__s") * col("__s"))
      .cast("double") / (col("__n") * (col("__n") - 1)).cast("double"))
    val ranked = Ranking.globalRowNumber(
      vals.crossJoin(broadcast(mom.select(col("__n"),
        round(mean, 12).as("__mean"), round(sd, 12).as("__sd")))),
      Seq(col("__v")))
    val terms = ranked
      .withColumn("__z", (col("__v").cast("double") - col("__mean")) / col("__sd"))
      // A&S 7.1.26 in Horner form — mirrored verbatim in the oracle
      .withColumn("__xa", abs(col("__z")) / sqrt(lit(2.0)))
      .withColumn("__t", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("__xa")))
      .withColumn("__pc",
        (((((lit(1.061405429) * col("__t") - lit(1.453152027)) * col("__t") +
          lit(1.421413741)) * col("__t") - lit(0.284496736)) * col("__t") +
          lit(0.254829592)) * col("__t")) * exp(-(col("__xa") * col("__xa"))))
      .withColumn("__phi", when(col("__z") >= 0,
        lit(1.0) - col("__pc") / 2).otherwise(col("__pc") / 2))
      // extreme |z| underflows the A&S polynomial: __pc → 0, so __phi
      // hits exactly 0 or 1 and a bare log() would go null and DROP the
      // row's term from the sum (understating A²). Clamp each log
      // ARGUMENT at 1e-300 — clamping __phi at 1−ε is an IEEE no-op
      // (1−1e-300 == 1.0) — so outlier terms saturate at ln(1e-300)
      // instead of vanishing; mirrored verbatim in the oracle.
      .withColumn("__term_nano", round(
        ((col("row_num") * 2 - 1).cast("double") *
           log(greatest(col("__phi"), lit(1e-300))) +
         ((col("__n").cast("long") - col("row_num")) * 2 + 1).cast("double") *
           log(greatest(lit(1.0) - col("__phi"), lit(1e-300)))) * 1e9, 0)
        .cast("long"))
    terms.agg(max(col("__n")).as("__n2"), max(col("__mean")).as("__m2"),
        max(col("__sd")).as("__sd2"), sum(col("__term_nano")).as("__sn"))
      .withColumn("__a2", -col("__n2").cast("double") -
        (col("__sn").cast("double") / 1e9) / col("__n2").cast("double"))
      .withColumn("__a2s", col("__a2") *
        (lit(1.0) + lit(0.75) / col("__n2").cast("double") +
          lit(2.25) / (col("__n2").cast("double") * col("__n2").cast("double"))))
      .select(col("__n2").cast("long").as("n"), round(col("__m2"), 6).as("mean"),
        round(col("__sd2"), 6).as("sd"), round(col("__a2"), 6).as("a2"),
        round(col("__a2s"), 6).as("a2_star"),
        (round(col("__a2s"), 6) > 0.752).as("non_normal"))
  }

  /** A-stat — Poisson overdispersion audit per key (the dispersion
    * index / index-of-dispersion test; Fisher 1950 — public
    * literature): for each key's count sample, D = s²/x̄ — Poisson
    * data has D ≈ 1; D ≫ 1 (overdispersion: bursts, contagion,
    * heterogeneity) means Poisson-based alerting thresholds and
    * confidence intervals are WRONG for this key and a negative-
    * binomial model is needed. The pre-flight check before any
    * count-based anomaly rule ships.
    *
    * Exactness: per-key moments are exact sums; D, the chi-square
    * form (n−1)·D and its normal approximation
    * z = √(2·χ²) − √(2(n−1) − 1) (Wilson–Hilferty-style, literal
    * constants only) are a bounded finish. Returns per key:
    * (keys…, n, mean, dispersion, chi2, z, overdispersed) with the
    * 1.644854 one-sided 5% gate. */
  def overdispersionAudit(df: org.apache.spark.sql.DataFrame,
      keys: Seq[Column], countCol: Column): org.apache.spark.sql.DataFrame = {
    require(keys.nonEmpty, "overdispersionAudit requires key column(s) " +
      "(use a constant literal key for one global audit)")
    val d38 = "decimal(38,0)"
    val v = countCol.cast("long")
    val g = df.groupBy(keys: _*).agg(count(lit(1)).cast(d38).as("__n"),
      sum(v).cast(d38).as("__s"),
      sum(v.cast(d38) * v.cast(d38)).cast(d38).as("__q"))
    val keyNames = g.columns.dropRight(3).toSeq
    val mean = col("__s").cast("double") / col("__n").cast("double")
    val variance = (col("__n") * col("__q") - col("__s") * col("__s"))
      .cast("double") / (col("__n") * (col("__n") - 1)).cast("double")
    val disp = variance / mean
    val chi2 = (col("__n").cast("double") - 1.0) * disp
    val z = sqrt(lit(2.0) * chi2) -
      sqrt(lit(2.0) * (col("__n").cast("double") - 1.0) - 1.0)
    g.filter(col("__n") > 1 && col("__s") > 0)
      .select(keyNames.map(col) :+ col("__n").cast("long").as("n") :+
        round(mean, 6).as("mean") :+ round(disp, 6).as("dispersion") :+
        round(chi2, 6).as("chi2") :+ round(z, 6).as("z") :+
        (round(z, 6) > 1.644854).as("overdispersed"): _*)
  }

  /** A1/E6 — ABC (Pareto) classification of items by value
    * concentration: rank items by value descending, class A while the
    * PRECEDING cumulative share is under 80%, B under 95%, C beyond —
    * the inventory-policy readout (tight control for A, periodic for
    * B, bulk rules for C) and, for a corpus, the "which sources are
    * worth per-source curation effort" cut. The classifier view of
    * [[lorenzCurve]]'s curve.
    *
    * Exactness: the class decision is the all-integer crossing
    * cum_before·k < total·(k·threshold) — cum_before·5 < total·4 for
    * A, cum_before·20 < total·19 for B — under the total (value desc,
    * key asc) order, so ties classify deterministically. Returns one
    * row per class: (abc_class, n_items, class_value, share_ppm).
    *
    * Scale: one item-grain agg with map-side combine, then an
    * |items|-row ranked prefix window (the [[skewAudit]] altitude —
    * pre-aggregate unbounded item domains first). */
  def abcClassification(df: org.apache.spark.sql.DataFrame, keyCol: Column,
      valueCol: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val items = df.groupBy(keyCol.as("__k"))
      .agg(sum(valueCol.cast("long")).as("__val"))
    val w = Window.orderBy(col("__val").desc, col("__k"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    items
      .withColumn("__cb", coalesce(sum(col("__val")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).cast(d38))
      .withColumn("__tot", sum(col("__val")).over(all).cast(d38))
      .withColumn("abc_class",
        when(col("__cb") * 5 < col("__tot") * 4, "A")
          .when(col("__cb") * 20 < col("__tot") * 19, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("__val")).as("class_value"))
      // d38 before the ×1e6 — a cent-grain class total × 1e6 overflows
      // a long at fact scale
      .withColumn("share_ppm", expr(
        "(cast(class_value as decimal(38,0)) * 1000000) div " +
          "(sum(class_value) over ())").cast("long"))
  }

  /** ML/A-quantile — quantile normalization: map every TARGET-slice
    * value onto the REFERENCE slice's distribution by rank fraction
    * (the microarray-era standard, Bolstad et al. 2003 — public
    * literature; the domain-adaptation transform that makes "week A
    * scores" comparable to "week B scores" after an upstream change).
    * Each target value maps to the smallest reference value whose CDF
    * reaches the target value's CDF — the all-integer crossing
    * cumR·nT ≥ cumT·nR, so no float quantile is ever computed.
    * Returns one row per distinct target value:
    * (value, n, cum_frac_ppm, mapped).
    *
    * Scale: two distinct-value rollups with prefix windows + one
    * rollup×rollup crossing join (min-aggregated) — the
    * [[wasserstein1]] envelope squared only at ROLLUP grain; quantize
    * wide domains first (the rank-op house rule). */
  def quantileNormalize(df: org.apache.spark.sql.DataFrame, valueCol: Column,
      sliceCol: Column, refSlice: String,
      targetSlice: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    def rollup(slice: String) =
      df.filter(sliceCol === slice)
        .groupBy(valueCol.cast("long").as("__v"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(w))
        .withColumn("__n", sum(col("__c")).over(all))
    val t = rollup(targetSlice).select(col("__v").as("value"),
      col("__c").as("n"), col("__cum").as("__cumt"), col("__n").as("__nt"))
    val r = rollup(refSlice).select(col("__v").as("__rv"),
      col("__cum").as("__cumr"), col("__n").as("__nr"))
    t.join(r, col("__cumr") * col("__nt") >= col("__cumt") * col("__nr"))
      .groupBy(col("value"), col("n"), col("__cumt"), col("__nt"))
      .agg(min(col("__rv")).as("mapped"))
      .select(col("value"), col("n"),
        expr("(__cumt * 1000000L) div __nt").as("cum_frac_ppm"),
        col("mapped"))
  }

  /** A-stat — Hellinger / Bhattacharyya distance between two binned
    * distributions (Hellinger 1909, Bhattacharyya 1943 — public
    * literature): BC = Σ √(p_i·q_i), H = √(1 − BC), d_B = −ln BC.
    * The bounded-[0,1] member of the drift family — H is a true
    * metric (PSI isn't) and needs no smoothing (empty bins contribute
    * 0), so it's the safest "how far apart" number to alarm on.
    *
    * Exactness: counts are exact; each bin's √(p·q) is ONE pinned
    * expression nano-quantized before the integer sum (the q218
    * discipline); the two readouts are single-ops on that sum.
    * Returns one row: (n_a, n_b, n_bins, bc, hellinger, bhattacharyya).
    *
    * Scale: one conditional-count agg with map-side combine; the term
    * pass runs over the bin rollup. */
  def hellingerBinned(df: org.apache.spark.sql.DataFrame, binCol: Column,
      sliceCol: Column, sliceA: String,
      sliceB: String): org.apache.spark.sql.DataFrame = {
    val obs = df.filter(sliceCol.isin(sliceA, sliceB))
      .select(binCol.cast("long").as("__bin"), sliceCol.as("__s"))
      .groupBy(col("__bin")).agg(
        sum(when(col("__s") === sliceA, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__s") === sliceB, 1L).otherwise(0L)).as("__cb"))
      .localCheckpoint() // bin rollup; totals + term pass read it
    val tot = obs.agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))
    obs.crossJoin(broadcast(tot))
      .withColumn("__term_nano", round(sqrt(
        (col("__ca").cast("double") / col("__na").cast("double")) *
          (col("__cb").cast("double") / col("__nb").cast("double"))) * 1e9,
        0).cast("long"))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        count(lit(1)).as("n_bins"), sum(col("__term_nano")).as("__bc_nano"))
      .select(col("n_a"), col("n_b"), col("n_bins"),
        round(col("__bc_nano").cast("double") / 1e9, 6).as("bc"),
        round(sqrt(greatest(lit(0.0),
          lit(1.0) - col("__bc_nano").cast("double") / 1e9)), 6)
          .as("hellinger"),
        // Spark log(<=0) is null (not -Inf): zero overlap -> null
        // distance, declared explicitly in the oracle too
        when(col("__bc_nano") > 0,
          round(-log(col("__bc_nano").cast("double") / 1e9), 6))
          .as("bhattacharyya"))
  }

  /** A-stat — Cronbach's alpha (Cronbach, Psychometrika 1951 — public
    * literature): internal-consistency reliability of a k-item scale,
    *   α = k/(k−1) · (1 − Σᵢ var(itemᵢ) / var(total score)),
    * over subjects with ALL k items (the complete-case convention;
    * one value per (subject, item) enforced by a deterministic max).
    * The "do these k signals measure one thing" gate run before
    * collapsing k quality scores into one composite — low α means the
    * composite is noise-averaging unrelated measures.
    *
    * Exactness: all moments are exact DECIMAL(38,0) sums; each item's
    * variance is nano-quantized before the k-term integer sum (double
    * addition order never touches corpus data); the finish is pinned.
    * Returns one row: (n_subjects, k_items, item_var_sum, total_var,
    * alpha).
    *
    * Scale: a (subject, item) cell agg, a subject-grain size filter
    * (semi-join), one item-grain and one subject-grain moment agg —
    * all map-side combinable. */
  def cronbachAlpha(df: org.apache.spark.sql.DataFrame, subjectCol: Column,
      itemCol: Column, valueCol: Column,
      nItems: Int): org.apache.spark.sql.DataFrame = {
    require(nItems >= 2, "a scale needs >= 2 items")
    val d38 = "decimal(38,0)"
    val cell = df.groupBy(subjectCol.as("__s"), itemCol.as("__it"))
      .agg(max(valueCol.cast("long")).as("__v"))
    val sized = cell.groupBy(col("__s")).agg(count(lit(1)).as("__k"))
      .filter(col("__k") === nItems).select(col("__s"))
    val kept = cell.join(sized, Seq("__s"), "left_semi")
      .localCheckpoint() // cell grain; item + subject aggs read it
    def varOf(nc: Column, sc: Column, qc: Column) =
      (nc * qc - sc * sc).cast("double") / (nc * (nc - 1)).cast("double")
    val items = kept.groupBy(col("__it"))
      .agg(count(lit(1)).cast(d38).as("__n"), sum(col("__v")).cast(d38).as("__sv"),
        sum(col("__v").cast(d38) * col("__v").cast(d38)).cast(d38).as("__qv"))
      .withColumn("__var_nano",
        round(varOf(col("__n"), col("__sv"), col("__qv")) * 1e9, 0)
          .cast("long"))
      .agg(count(lit(1)).as("__ki"), sum(col("__var_nano")).as("__siv_nano"))
    val totals = kept.groupBy(col("__s")).agg(sum(col("__v")).as("__t"))
      .agg(count(lit(1)).cast(d38).as("__ns"), sum(col("__t")).cast(d38).as("__st"),
        sum(col("__t").cast(d38) * col("__t").cast(d38)).cast(d38).as("__qt"))
    items.crossJoin(broadcast(totals))
      .withColumn("__vt", varOf(col("__ns"), col("__st"), col("__qt")))
      .select(col("__ns").cast("long").as("n_subjects"),
        col("__ki").as("k_items"),
        round(col("__siv_nano").cast("double") / 1e9, 6).as("item_var_sum"),
        round(col("__vt"), 6).as("total_var"),
        when(col("__vt") > 0, round(
          lit(nItems.toDouble) / (nItems - 1) *
            (lit(1.0) - (col("__siv_nano").cast("double") / 1e9) /
              col("__vt")), 6)).as("alpha"))
  }

  /** A-stat — first-order partial correlation (standard regression
    * theory — public literature): the x↔y association with z held
    * fixed,
    *   r_xy·z = (r_xy − r_xz·r_yz) / √((1 − r_xz²)(1 − r_yz²)),
    * the one-line confounder check run before reading q82's raw
    * correlation causally ("price correlates with returns — or do
    * both just follow quantity?").
    *
    * Exactness: all ten co-moment sums are exact DECIMAL(38,0); each
    * pairwise r is numerator.double / (√·√) in pinned token order;
    * the partial is a 1-row finish. Degenerate margins (any zero
    * variance, or |r| = 1 in a conditioning pair) → null. Returns one
    * row: (n, r_xy, r_xz, r_yz, r_partial). */
  def partialCorrelation(df: org.apache.spark.sql.DataFrame, xCol: Column,
      yCol: Column, zCol: Column): org.apache.spark.sql.DataFrame = {
    val d38 = "decimal(38,0)"
    def l(c: Column) = c.cast("long")
    def s38(c: Column) = sum(c.cast(d38)).cast(d38)
    val m = df.select(l(xCol).as("__x"), l(yCol).as("__y"), l(zCol).as("__z"))
      .agg(count(lit(1)).cast(d38).as("__n"),
        s38(col("__x")).as("__sx"), s38(col("__y")).as("__sy"),
        s38(col("__z")).as("__sz"),
        s38(col("__x").cast(d38) * col("__x").cast(d38)).as("__sxx"),
        s38(col("__y").cast(d38) * col("__y").cast(d38)).as("__syy"),
        s38(col("__z").cast(d38) * col("__z").cast(d38)).as("__szz"),
        s38(col("__x").cast(d38) * col("__y").cast(d38)).as("__sxy"),
        s38(col("__x").cast(d38) * col("__z").cast(d38)).as("__sxz"),
        s38(col("__y").cast(d38) * col("__z").cast(d38)).as("__syz"))
    def cNum(sab: Column, sa: Column, sb: Column) =
      (col("__n") * sab - sa * sb).cast("double")
    def cDen(saa: Column, sa: Column) =
      (col("__n") * saa - sa * sa).cast("double")
    def r(sab: Column, sa: Column, sb: Column, saa: Column, sbb: Column) =
      cNum(sab, sa, sb) / (sqrt(cDen(saa, sa)) * sqrt(cDen(sbb, sb)))
    val rxy = r(col("__sxy"), col("__sx"), col("__sy"), col("__sxx"), col("__syy"))
    val rxz = r(col("__sxz"), col("__sx"), col("__sz"), col("__sxx"), col("__szz"))
    val ryz = r(col("__syz"), col("__sy"), col("__sz"), col("__syy"), col("__szz"))
    m.withColumn("__rxy", rxy).withColumn("__rxz", rxz)
      .withColumn("__ryz", ryz)
      .select(col("__n").cast("long").as("n"),
        round(col("__rxy"), 6).as("r_xy"), round(col("__rxz"), 6).as("r_xz"),
        round(col("__ryz"), 6).as("r_yz"),
        when((lit(1.0) - col("__rxz") * col("__rxz")) > 0 &&
          (lit(1.0) - col("__ryz") * col("__ryz")) > 0, round(
            (col("__rxy") - col("__rxz") * col("__ryz")) /
              sqrt((lit(1.0) - col("__rxz") * col("__rxz")) *
                (lit(1.0) - col("__ryz") * col("__ryz"))), 6))
          .as("r_partial"))
  }

  /** A-stat/ML — simple-regression INFLUENCE audit (Cook, Technometrics
    * 1977 — public literature): fit y ~ x by exact-moment OLS, then
    * per point the residual, leverage h = 1/n + (n·x − Sx)²/(n·Sxx_c)
    * and Cook's distance D = e²·h / (p·s²·(1−h)²) with p = 2 — the
    * "which rows move the fitted line" list read before trusting any
    * trend (one bad ingest row can own the slope). Top-K by the
    * NANO-QUANTIZED D (ties → smallest id), so the cut is
    * engine-identical.
    *
    * Exactness: slope/intercept/SSE come from exact centered moments
    * (SSE = (Syy·Sxx − Sxy²)/(n·Sxx) — one division); each row's
    * e/h/D are pinned doubles of broadcast exact pieces — no
    * cross-row double accumulation anywhere. Returns top-K rows:
    * (id…, x, y, residual, leverage, cooks_d). */
  def regressionInfluence(df: org.apache.spark.sql.DataFrame, idCol: Column,
      xCol: Column, yCol: Column, topK: Int): org.apache.spark.sql.DataFrame = {
    require(topK >= 1, "topK >= 1")
    val d38 = "decimal(38,0)"
    def s38(c: Column) = sum(c.cast(d38)).cast(d38)
    val base = df.select(idCol.as("__id"), xCol.cast("long").as("__x"),
      yCol.cast("long").as("__y"))
    val m = base.agg(count(lit(1)).cast(d38).as("__n"),
        s38(col("__x")).as("__sx"), s38(col("__y")).as("__sy"),
        s38(col("__x").cast(d38) * col("__x").cast(d38)).as("__sxx"),
        s38(col("__x").cast(d38) * col("__y").cast(d38)).as("__sxy"),
        s38(col("__y").cast(d38) * col("__y").cast(d38)).as("__syy"))
      .withColumn("__cxx", (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast(d38))
      .withColumn("__cxy", (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast(d38))
      .withColumn("__cyy", (col("__n") * col("__syy") - col("__sy") * col("__sy")).cast(d38))
    val scored = base.crossJoin(broadcast(m))
      .withColumn("__slope", col("__cxy").cast("double") / col("__cxx").cast("double"))
      .withColumn("__icept",
        (col("__sy").cast("double") - col("__slope") * col("__sx").cast("double")) /
          col("__n").cast("double"))
      .withColumn("__e", col("__y").cast("double") -
        (col("__slope") * col("__x").cast("double") + col("__icept")))
      .withColumn("__h", lit(1.0) / col("__n").cast("double") +
        ((col("__n") * col("__x") - col("__sx")) *
         (col("__n") * col("__x") - col("__sx"))).cast("double") /
          (col("__n") * col("__cxx")).cast("double"))
      // s² = SSE/(n−2); SSE = (Cyy·Cxx − Cxy²)/(n·Cxx), all exact ints
      .withColumn("__s2",
        (col("__cyy") * col("__cxx") - col("__cxy") * col("__cxy")).cast("double") /
          (col("__n") * col("__cxx")).cast("double") /
          (col("__n").cast("double") - 2.0))
      .withColumn("__d", (col("__e") * col("__e")) * col("__h") /
        (lit(2.0) * col("__s2") * (lit(1.0) - col("__h")) *
          (lit(1.0) - col("__h"))))
      .withColumn("__d_nano", round(col("__d") * 1e9, 0).cast("long"))
    scored.orderBy(col("__d_nano").desc, col("__id"))
      .limit(topK)
      .select(col("__id").as("id"), col("__x").as("x"), col("__y").as("y"),
        round(col("__e"), 6).as("residual"), round(col("__h"), 6).as("leverage"),
        round(col("__d"), 6).as("cooks_d"))
  }

  /** A-stat/A-quantile — pairwise-difference robust SCALE per key (the
    * Qn idea of Rousseeuw & Croux, JASA 1993 — public literature,
    * realized here as the exact lower quartile of all |xᵢ − xⱼ|,
    * i < j, with the 2.2219 Gaussian-consistency constant): a 50%-
    * breakdown spread estimate that needs no location estimate first —
    * the dispersion twin of [[hodgesLehmann]], from the same
    * distinct-value-rollup pair multiset and the same all-integer
    * crossing (cumw·4 ≥ T). Keys with < 2 observations drop. Returns
    * per key: (keys…, n, n_pairs, q25_absdiff, qn).
    *
    * Scale: pair space = |distinct values|² per key — rollup grain,
    * never the fact table; quantize wide domains first. */
  def qnScale(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
      valueCol: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keys.nonEmpty, "qnScale requires at least one key column")
    val kc = keys.map(col)
    val rollup = df.groupBy((kc :+ valueCol.cast("long").as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // distinct-value grain; both pair sides + n read it
    val n = rollup.groupBy(kc: _*).agg(sum(col("__c")).as("n"))
      .filter(col("n") >= 2)
    val a = rollup.select((kc :+ col("__v").as("__v1") :+
      col("__c").as("__c1")): _*)
    val b = rollup.select((kc :+ col("__v").as("__v2") :+
      col("__c").as("__c2")): _*)
    val pairs = a.join(b, keys).filter(col("__v1") <= col("__v2"))
      .withColumn("__d", col("__v2") - col("__v1"))
      .withColumn("__pw", when(col("__v1") === col("__v2"),
          expr("(__c1 * (__c1 - 1)) div 2"))
        .otherwise(col("__c1") * col("__c2")))
      .filter(col("__pw") > 0)
      .groupBy((kc :+ col("__d")): _*)
      .agg(sum(col("__pw")).as("__w"))
    val wk = Window.partitionBy(kc: _*).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(kc: _*)
    pairs
      .withColumn("__cumw", sum(col("__w")).over(wk))
      .withColumn("__tw", sum(col("__w")).over(tot))
      .filter(col("__cumw") * 4 >= col("__tw"))
      .groupBy(kc: _*)
      .agg(min(col("__d")).as("q25_absdiff"), min(col("__tw")).as("n_pairs"))
      .join(n, keys)
      .select((kc :+ col("n") :+ col("n_pairs") :+ col("q25_absdiff") :+
        round(col("q25_absdiff").cast("double") * 2.2219, 6).as("qn")): _*)
  }

  /** A-stat — Bland–Altman agreement analysis (Bland & Altman, Lancet
    * 1986 — public literature) between two measurements of the same
    * quantity: mean difference (bias) and the 95% limits of agreement
    * mean ± 1.96·sd, plus the share of rows OUTSIDE those limits —
    * the method-comparison readout ("can detector B replace detector
    * A") that a correlation coefficient notoriously fakes.
    *
    * Exactness: differences are exact longs; moments are exact sums;
    * the outside test compares each integer difference against the
    * ROUNDED limits (6dp) so both engines gate identically. Returns
    * one row: (n, bias, sd_diff, loa_low, loa_high, n_outside,
    * outside_ppm). */
  def blandAltman(df: org.apache.spark.sql.DataFrame, aCol: Column,
      bCol: Column): org.apache.spark.sql.DataFrame = {
    val d38 = "decimal(38,0)"
    val diffs = df.select((aCol.cast("long") - bCol.cast("long")).as("__d"))
    val m = diffs.agg(count(lit(1)).cast(d38).as("__n"),
      sum(col("__d")).cast(d38).as("__s"),
      sum(col("__d").cast(d38) * col("__d").cast(d38)).cast(d38).as("__q"))
    val mean = col("__s").cast("double") / col("__n").cast("double")
    val sd = sqrt((col("__n") * col("__q") - col("__s") * col("__s"))
      .cast("double") / (col("__n") * (col("__n") - 1)).cast("double"))
    val lims = m.select(col("__n").cast("long").as("n"),
        round(mean, 6).as("bias"), round(sd, 6).as("sd_diff"),
        round(mean - lit(1.96) * sd, 6).as("loa_low"),
        round(mean + lit(1.96) * sd, 6).as("loa_high"))
      .localCheckpoint() // 1 row; outside gate + output read it
    val outside = diffs.crossJoin(broadcast(lims))
      .agg(sum((col("__d").cast("double") < col("loa_low") ||
        col("__d").cast("double") > col("loa_high")).cast("long"))
        .as("n_outside"))
    lims.crossJoin(broadcast(outside))
      .select(col("n"), col("bias"), col("sd_diff"), col("loa_low"),
        col("loa_high"), col("n_outside"),
        expr("(n_outside * 1000000L) div n").as("outside_ppm"))
  }

  /** A-stat — McNemar's test (McNemar, Psychometrika 1947 — public
    * literature) for PAIRED binary classifiers: on the same examples,
    * is model A right where model B is wrong more often than vice
    * versa? Only the discordant cells matter:
    *   χ² = (|b − c| − 1)² / (b + c)   (continuity-corrected)
    * — the correct A/B readout when both models score the SAME rows
    * (q186's unpaired test wastes the pairing and loses power).
    *
    * Exactness: the four cells are one conditional-sum agg; χ² is a
    * ratio of exact integers with one final division; b + c = 0 →
    * null. Returns one row: (n, both_right, only_a, only_b,
    * both_wrong, chi2, significant) with the 3.841459 χ²₁ 5% literal. */
  def mcNemar(df: org.apache.spark.sql.DataFrame, predACond: Column,
      predBCond: Column, labelCond: Column): org.apache.spark.sql.DataFrame = {
    val aOk = predACond === labelCond
    val bOk = predBCond === labelCond
    val d38 = "decimal(38,0)"
    df.agg(count(lit(1)).as("n"),
        sum((aOk && bOk).cast("long")).as("both_right"),
        sum((aOk && !bOk).cast("long")).as("only_a"),
        sum((!aOk && bOk).cast("long")).as("only_b"),
        sum((!aOk && !bOk).cast("long")).as("both_wrong"))
      .withColumn("chi2", when(col("only_a") + col("only_b") > 0, round(
        ((abs(col("only_a") - col("only_b")) - 1).cast(d38) *
          (abs(col("only_a") - col("only_b")) - 1).cast(d38)).cast("double") /
          (col("only_a") + col("only_b")).cast("double"), 6)))
      .withColumn("significant",
        coalesce(col("chi2") > 3.841459, lit(false)))
  }

  /** A-stat — Wald–Wolfowitz runs test (Wald & Wolfowitz, Ann. Math.
    * Stat. 1940 — public literature) on an ordered binary sequence:
    * too FEW runs means positive serial dependence (streaks — the
    * i.i.d. assumption behind every CI on the series is wrong), too
    * MANY means alternation. R = observed runs,
    *   μ = 2·n₁·n₀/n + 1,  σ² = (μ−1)(μ−2)/(n−1),  z = (R − μ)/σ.
    *
    * Exactness: the run count is an exact lag-comparison sum over one
    * ordered window; μ and σ are pinned finishes of exact counts.
    * Returns one row: (n, n_ones, n_runs, z) — z null when either
    * class is absent.
    *
    * Scale: the series is rollup-grain (the [[ljungBox]] altitude);
    * one ordered window + one 1-row finish. */
  def runsTest(series: org.apache.spark.sql.DataFrame, orderCol: Column,
      flagCond: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("__t"))
    val s = series.select(orderCol.as("__t"), flagCond.cast("int").as("__f"))
      .withColumn("__prev", lag(col("__f"), 1).over(w))
      .agg(count(lit(1)).as("n"), sum(col("__f").cast("long")).as("n_ones"),
        sum(when(col("__prev").isNull || col("__f") =!= col("__prev"), 1L)
          .otherwise(0L)).as("n_runs"))
    val n1 = col("n_ones").cast("double")
    val n0 = (col("n") - col("n_ones")).cast("double")
    val nn = col("n").cast("double")
    val mu = lit(2.0) * n1 * n0 / nn + 1.0
    val sig = sqrt((mu - 1.0) * (mu - 2.0) / (nn - 1.0))
    s.select(col("n"), col("n_ones"), col("n_runs"),
      when(col("n_ones") > 0 && col("n_ones") < col("n"),
        round((col("n_runs").cast("double") - mu) / sig, 6)).as("z"))
  }

  /** A-stat — CLIFF'S DELTA ordinal effect size (Cliff 1993; Romano
    * et al. 2006 thresholds — public literature) between two groups:
    *   δ = (#{a > b} − #{a < b}) / (n_a·n_b)
    * — the EFFECT-SIZE companion to [[mannWhitneyU]]'s significance:
    * at 100 TB everything is "significant"; δ says whether the shift
    * matters. Pair counts come from the distinct-value rollup and the
    * cumulative-count identity (#{a > b} = Σ_v ca(v)·cumB_before(v)),
    * never an n_a×n_b pair join. Exact integers; the single division
    * is the readout. Returns one row:
    * (n_a, n_b, gt_pairs, lt_pairs, tie_pairs, delta, magnitude) with
    * the standard |δ| bands (negligible < .147 < small < .33 < medium
    * < .474 < large).
    *
    * Scale: one value-grain agg with map-side combine + a
    * distinct-value cumulative window (the q152 envelope). */
  def cliffsDelta(df: org.apache.spark.sql.DataFrame, valueCol: Column,
      groupCol: Column, groupA: String,
      groupB: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val perV = df.filter(groupCol.isin(groupA, groupB))
      .select(groupCol.as("__g"), valueCol.cast("long").as("__v"))
      .groupBy(col("__v")).agg(
        sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__g") === groupB, 1L).otherwise(0L)).as("__cb"))
    val wv = Window.orderBy(col("__v"))
    // lt derives from the identity gt + lt + ties = n_a·n_b — no second
    // cumulative needed
    val agg = perV
      .withColumn("__cbBefore", coalesce(sum(col("__cb")).over(
        wv.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"),
        sum(col("__ca").cast(d38) * col("__cbBefore").cast(d38)).as("__gt"),
        sum(col("__ca").cast(d38) * col("__cb").cast(d38)).as("__tie"))
    agg
      .withColumn("gt_pairs", col("__gt").cast("long"))
      .withColumn("tie_pairs", col("__tie").cast("long"))
      .withColumn("lt_pairs",
        (col("n_a").cast(d38) * col("n_b").cast(d38) - col("__gt") -
          col("__tie")).cast("long"))
      .withColumn("delta",
        (col("gt_pairs") - col("lt_pairs")).cast("double") /
          (col("n_a").cast(d38) * col("n_b").cast(d38)).cast("double"))
      .withColumn("magnitude",
        when(abs(col("delta")) < 0.147, "negligible")
          .when(abs(col("delta")) < 0.33, "small")
          .when(abs(col("delta")) < 0.474, "medium")
          .otherwise("large"))
      .select(col("n_a"), col("n_b"), col("gt_pairs"), col("lt_pairs"),
        col("tie_pairs"), col("delta"), col("magnitude"))
  }

  /** A-stat — YUEN'S TRIMMED-MEANS t-test (Yuen, Biometrika 1974 —
    * public literature): compare 20%-style TRIMMED means with the
    * winsorized variance — the robust two-sample test that keeps its
    * nominal level under the heavy tails that wreck Student/Welch t
    * (q186's test chases outliers; this one ignores them by design).
    * Trim fraction is the exact rational gNum/gDen (g = ⌊γ·n⌋ per
    * group).
    *
    * Determinism contract: everything up to the final statistic is
    * exact integers from the distinct-value rollup — boundary order
    * statistics via cumulative counts, trimmed sums via per-value
    * range-overlap counts (duplicates at the boundary partially
    * included, the order-statistics definition), winsorized sums via
    * clamped values. The t finish is one pinned IEEE chain. Returns
    * one row: (n_a, n_b, h_a, h_b, mean_trim_a, mean_trim_b, t_stat).
    *
    * Scale: one value×group rollup + a distinct-value cumulative
    * window per group — the q152/q154 envelope; no per-row sort. */
  def yuenTrimmedT(df: org.apache.spark.sql.DataFrame, valueCol: Column,
      groupCol: Column, groupA: String, groupB: String,
      gNum: Long = 1, gDen: Long = 5): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(gNum >= 0 && gDen > 0 && 2 * gNum < gDen,
      "trim fraction must satisfy 0 <= gNum/gDen < 1/2")
    val d38 = "decimal(38,0)"
    val perV = df.filter(groupCol.isin(groupA, groupB))
      .select(groupCol.as("__g"), valueCol.cast("long").as("__v"))
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
    val wg = Window.partitionBy(col("__g")).orderBy(col("__v"))
    val wAll = Window.partitionBy(col("__g"))
    val cum = perV
      .withColumn("__cb", coalesce(sum(col("__c")).over(
        wg.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__ct", col("__cb") + col("__c"))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__trim", expr(s"(__n * $gNum) div $gDen"))
      // order-statistic boundaries: lo = value at rank g+1, hi = value
      // at rank n-g (1-based)
      .withColumn("__lo", min(when(col("__ct") >= col("__trim") + 1,
        col("__v"))).over(wAll))
      .withColumn("__hi", min(when(col("__ct") >= col("__n") - col("__trim"),
        col("__v"))).over(wAll))
      // trimmed-range inclusion count for this value's duplicates
      .withColumn("__inc", greatest(lit(0L),
        least(col("__ct"), col("__n") - col("__trim")) -
          greatest(col("__cb"), col("__trim"))))
      .withColumn("__w", greatest(col("__lo"), least(col("__hi"), col("__v"))))
    val g = cum.groupBy(col("__g")).agg(
      max(col("__n")).as("n"),
      max(col("__trim")).as("g"),
      sum(col("__inc").cast(d38) * col("__v").cast(d38)).as("__ts"),
      sum(col("__c").cast(d38) * col("__w").cast(d38)).as("__ws"),
      sum(col("__c").cast(d38) * (col("__w") * col("__w")).cast(d38))
        .as("__wq"))
    val a = g.filter(col("__g") === groupA)
    val b = g.filter(col("__g") === groupB)
    val joined = a.select(col("n").as("n_a"), col("g").as("__ga"),
        col("__ts").as("__tsa"), col("__ws").as("__wsa"),
        col("__wq").as("__wqa"))
      .crossJoin(broadcast(b.select(col("n").as("n_b"), col("g").as("__gb"),
        col("__ts").as("__tsb"), col("__ws").as("__wsb"),
        col("__wq").as("__wqb"))))
    def hCol(n: Column, gc: Column) = n - gc * 2
    val ha = hCol(col("n_a"), col("__ga"))
    val hb = hCol(col("n_b"), col("__gb"))
    // winsorized sample variance s² = (n·Σw² − (Σw)²)/(n·(n−1));
    // d = (n−1)·s² / (h·(h−1)) (Yuen); both as one pinned chain
    def dTerm(n: Column, h: Column, ws: Column, wq: Column) =
      ((n.cast(d38) * wq - ws * ws).cast("double") /
        (n.cast(d38) * (n.cast(d38) - 1)).cast("double")) *
        (n - 1).cast("double") / (h.cast(d38) * (h.cast(d38) - 1)).cast("double")
    joined
      .withColumn("h_a", ha).withColumn("h_b", hb)
      .withColumn("mean_trim_a",
        col("__tsa").cast("double") / ha.cast("double"))
      .withColumn("mean_trim_b",
        col("__tsb").cast("double") / hb.cast("double"))
      .withColumn("t_stat",
        (col("mean_trim_a") - col("mean_trim_b")) /
          sqrt(dTerm(col("n_a"), ha, col("__wsa"), col("__wqa")) +
            dTerm(col("n_b"), hb, col("__wsb"), col("__wqb"))))
      .select(col("n_a"), col("n_b"), col("h_a"), col("h_b"),
        col("mean_trim_a"), col("mean_trim_b"), col("t_stat"))
  }

  /** A-stat — HORVITZ–THOMPSON estimator (Horvitz & Thompson, JASA
    * 1952 — public literature) per slice: the unbiased population
    * total from an UNEQUAL-PROBABILITY sample,
    *   T̂ = Σ y_i/π_i,   V̂ = Σ (1−π_i)·(y_i/π_i)²  (Poisson sampling)
    * — the estimator behind every "we sampled 1% of big customers,
    * 0.01% of small ones" pipeline readout; the unweighted sum is
    * simply wrong there.
    *
    * Determinism contract: inclusion probabilities arrive as integer
    * ppm; each unit's expansion y_i/π_i floors ONCE to integer
    * natural units (q = (y·10⁶) div π_ppm), totals and the cleared
    * variance numerator Σ (10⁶−π)·q² are exact integer/decimal sums;
    * the variance divides by 10⁶ once at the end. Returns per slice:
    * (slice, n_sampled, ht_total, var_hat).
    *
    * Scale: one slice-keyed agg with map-side combine. */
  def horvitzThompson(df: org.apache.spark.sql.DataFrame, sliceCol: Column,
      valueCol: Column, probPpmCol: Column): org.apache.spark.sql.DataFrame = {
    val d38 = "decimal(38,0)"
    val q = expr(s"(CAST(${valueCol.toString} AS BIGINT) * 1000000L) div " +
      s"CAST(${probPpmCol.toString} AS BIGINT)")
    val p = probPpmCol.cast("long")
    df.select(sliceCol.as("slice"), q.as("__q"), p.as("__p"))
      .groupBy(col("slice")).agg(
        count(lit(1)).as("n_sampled"),
        sum(col("__q")).as("ht_total"),
        sum(((lit(1000000L) - col("__p")) .cast(d38) *
          (col("__q").cast(d38) * col("__q").cast(d38))).cast(d38))
          .as("__vnum"))
      .withColumn("var_hat", col("__vnum").cast("double") / 1e6)
      .select(col("slice"), col("n_sampled"), col("ht_total"), col("var_hat"))
  }

  /** A-stat — DETERMINISTIC POISSON BOOTSTRAP standard error (the
    * scalable bootstrap standard in large-scale systems — resample
    * weights w ~ Poisson(1) per unit per replicate approximate
    * multinomial resampling without coordination; public practice,
    * e.g. Chamandy et al., "Estimating Uncertainty for Massive Data
    * Streams", Google TR 2012): the SE of a mean WITHOUT a variance
    * formula — medians of ratios, post-gate rates, anything.
    *
    * Determinism contract: the "randomness" is the cross-engine
    * md5-60 hash of (unit id, replicate) reduced mod 10⁶ and cut at
    * the LITERAL Poisson(1) CDF ppm thresholds — every engine and
    * every run resamples identically (the q63 split device). Replicate
    * means are exact integer micro-units (one floor division each);
    * the SE over replicates is one pinned IEEE finish. Returns one
    * row: (n_units, n_reps, mean_micro, se).
    *
    * Scale: ONE map-side-combined pass over units — the fused
    * [[graft.ext.PoissonBootstrapPairs]] aggregate draws all B
    * weights per unit and accumulates (Σw·y, Σw) per replicate plus
    * (n, Σy) into a single (2B+2)-long buffer, so the scan is never
    * amplified B× and no per-draw hex string exists. Everything after
    * the agg is B rows. B is a constant (~50). */
  def poissonBootstrapSE(df: org.apache.spark.sql.DataFrame, idCol: Column,
      valueCol: Column, nReps: Int): org.apache.spark.sql.DataFrame = {
    require(nReps >= 2 && nReps <= 200, "nReps in [2, 200]")
    val d38 = "decimal(38,0)"
    val one = df.select(idCol.cast("string").as("__id"),
        valueCol.cast("long").as("__y"))
      .agg(graft.ext.BootstrapAgg.poissonBootstrapPairs(
        col("__id"), col("__y"), nReps).as("__a"))
    // buffer layout: [n, Σy, wy_1..wy_B, ws_1..ws_B] → B replicate rows
    val perRep = one.select(
        element_at(col("__a"), 1).as("n_units"),
        element_at(col("__a"), 2).as("__sy"),
        explode(expr(s"""transform(sequence(1, $nReps), b -> struct(
          element_at(__a, CAST(b + 2 AS INT)) AS __wy,
          element_at(__a, CAST(b + 2 + $nReps AS INT)) AS __ws))"""))
          .as("__r"))
      .select(col("n_units"), col("__sy"),
        col("__r.__wy").as("__wy"), col("__r.__ws").as("__ws"))
      .withColumn("__m", expr(
        "CASE WHEN __ws > 0 THEN (1000000L * __wy) div __ws ELSE 0L END"))
    perRep.agg(
        max(col("n_units")).as("n_units"),
        count(lit(1)).as("n_reps"),
        expr("(1000000L * max(__sy)) div max(n_units)").as("mean_micro"),
        sum(col("__m").cast(d38)).as("__sm"),
        sum(col("__m").cast(d38) * col("__m").cast(d38)).as("__smm"),
        count(lit(1)).cast(d38).as("__bb"))
      .withColumn("se", sqrt(
        (col("__bb") * col("__smm") - col("__sm") * col("__sm")).cast("double") /
          (col("__bb") * (col("__bb") - 1)).cast("double")) / 1e6)
      .select(col("n_units"), col("n_reps"), col("mean_micro"), col("se"))
  }

  /** A-stat — KISH EFFECTIVE SAMPLE SIZE and design effect (Kish 1965
    * — public literature) per slice of a WEIGHTED dataset:
    *   n_eff = (Σw)²/Σw²,  deff = n·Σw²/(Σw)²
    * — the honest sample size behind every weighted estimate (raking
    * q308's output weights, mixture weights q260, importance weights
    * q234): variance scales as 1/n_eff, not 1/n. Integer micro-unit
    * weights in, exact decimal sums, one pinned double finish per
    * slice. Returns per slice: (slice, n, w_sum, n_eff, deff).
    *
    * Scale: one slice-keyed agg with map-side combine — nothing else. */
  def kishNeff(df: org.apache.spark.sql.DataFrame, sliceCol: Column,
      weightMicroCol: Column): org.apache.spark.sql.DataFrame = {
    val d38 = "decimal(38,0)"
    val w = weightMicroCol.cast("long")
    df.groupBy(sliceCol.as("slice")).agg(
        count(lit(1)).as("n"),
        sum(w.cast(d38)).as("__sw"),
        sum((w * w).cast(d38)).as("__swq"))
      .withColumn("w_sum", col("__sw").cast("long"))
      .withColumn("n_eff", (col("__sw") * col("__sw")).cast("double") /
        col("__swq").cast("double"))
      .withColumn("deff", col("n").cast(d38).cast("double") *
        col("__swq").cast("double") /
        (col("__sw") * col("__sw")).cast("double"))
      .select(col("slice"), col("n"), col("w_sum"), col("n_eff"), col("deff"))
  }

  /** A-stat — Brown-Forsythe/Levene variance-homogeneity test: the
    * pre-check every ANOVA (q187) silently assumes. Robust (median)
    * form: z_i = |y_i − median(group)|, then the one-way F on z. To
    * stay integer-exact the deviations are computed in HALF-units —
    * z2_i = |2·y_i − med2_g| where med2 = lower + upper median (an
    * integer even when the median itself is x.5) — and the F
    * statistic is [[anovaF]]'s micro-quantized form on z2. Returns
    * one row: (k, n, ssb_u, ssw_u, f_stat) over the z2 deviations.
    *
    * Scale: one (group, value)-keyed rollup + a group-partitioned
    * cumulative window over it (rollup-sized, never raw rows), a
    * broadcast |groups|-row median join back onto the scan, and the
    * ANOVA agg — two passes over the data total. */
  def leveneBrownForsythe(df: DataFrame, valueCol: Column,
      groupCol: Column): DataFrame = {
    val v = valueCol.cast("long")
    val pv = df.groupBy(groupCol.as("__g"), v.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__v"))
    val cum = pv.withColumn("__ct", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__g"))))
    // med2 = lower + upper median: the smallest v whose cumulative
    // count reaches ceil(n/2) (2·ct ≥ n), plus the smallest reaching
    // ceil((n+1)/2) = floor(n/2)+1 (2·ct ≥ n+1). For odd n both picks
    // coincide at the median; for even n they bracket it, so med2 is
    // an exact integer even when the median itself is x.5.
    val med2 = cum.groupBy(col("__g")).agg(
      (min(when(col("__ct") * 2 >= col("__n"), col("__v"))) +
        min(when(col("__ct") * 2 >= col("__n") + 1, col("__v")))).as("__med2"))
    val z2 = df.select(groupCol.as("__g"), v.as("__y"))
      .join(broadcast(med2), "__g")
      .select(col("__g"), abs(lit(2) * col("__y") - col("__med2")).as("__z2"))
    anovaF(z2, col("__z2"), col("__g"))
  }

  /** A-stat — Chow structural-break test of a simple regression
    * y ~ x: did the relationship CHANGE across a split (pre/post a
    * date, a policy, a deploy)? Per-segment and pooled RSS come from
    * one agg's exact DECIMAL(38,0) moments via
    * RSS = (Cyy − Cxy²/Cxx)/n (centered, cleared denominators), the F
    * finish F = ((RSSp − RSS1 − RSS2)/2) / ((RSS1 + RSS2)/(n − 4)) in
    * doubles over those exact operands — mirrored
    * operation-for-operation by the oracle. Returns one row:
    * (n1, n2, rss1, rss2, rss_pooled, f_stat); a degenerate segment
    * (constant x, n < 3) yields null f_stat rather than garbage.
    *
    * Scale: ONE map-side-combined agg with conditional per-segment
    * sums (the pooled moments are their sums) + a 1-row finish. The
    * regression-stability check at any scan size. */
  def chowTest(df: DataFrame, xCol: Column, yCol: Column,
      inSecond: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    def l(c: Column) = c.cast("long").cast(d38)
    val x = l(xCol); val y = l(yCol)
    val seg = inSecond.cast("boolean")
    def half(tag: String, pred: Column) = Seq(
      sum(when(pred, 1L).otherwise(0L)).cast(d38).as(s"n$tag"),
      sum(when(pred, x).otherwise(lit(0).cast(d38))).cast(d38).as(s"sx$tag"),
      sum(when(pred, y).otherwise(lit(0).cast(d38))).cast(d38).as(s"sy$tag"),
      sum(when(pred, x * x).otherwise(lit(0).cast(d38))).cast(d38).as(s"sxx$tag"),
      sum(when(pred, x * y).otherwise(lit(0).cast(d38))).cast(d38).as(s"sxy$tag"),
      sum(when(pred, y * y).otherwise(lit(0).cast(d38))).cast(d38).as(s"syy$tag"))
    val sums = half("1", !seg) ++ half("2", seg)
    val aggd = df.agg(sums.head, sums.tail: _*)
    def rss(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column,
        syy: Column): Column = {
      val cxx = (n * sxx - sx * sx).cast("double")
      val cxy = (n * sxy - sx * sy).cast("double")
      val cyy = (n * syy - sy * sy).cast("double")
      when(n >= 3 && cxx > 0, (cyy - cxy * cxy / cxx) / n.cast("double"))
    }
    aggd
      .withColumn("rss1", rss(col("n1"), col("sx1"), col("sy1"),
        col("sxx1"), col("sxy1"), col("syy1")))
      .withColumn("rss2", rss(col("n2"), col("sx2"), col("sy2"),
        col("sxx2"), col("sxy2"), col("syy2")))
      .withColumn("rss_pooled", rss(
        col("n1") + col("n2"), col("sx1") + col("sx2"),
        col("sy1") + col("sy2"), col("sxx1") + col("sxx2"),
        col("sxy1") + col("sxy2"), col("syy1") + col("syy2")))
      .withColumn("f_stat",
        when(col("rss1").isNotNull && col("rss2").isNotNull &&
          col("rss1") + col("rss2") > 0,
          ((col("rss_pooled") - col("rss1") - col("rss2")) / 2) /
            ((col("rss1") + col("rss2")) /
              (col("n1") + col("n2") - 4).cast("double"))))
      .select(col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
        col("rss1"), col("rss2"), col("rss_pooled"), col("f_stat"))
  }

  /** A-stat/A8 — Durbin-Watson first-order autocorrelation statistic
    * of the residuals of y ~ x per key: the 'are my regression errors
    * independent' check (DW ≈ 2 ⟺ none; → 0 positive; → 4 negative).
    * Per key the slope/intercept come from exact centered moments;
    * each residual e = y − a − b·x is an identical double in any
    * engine (pure function of exact aggregates and the row), and
    * quantizes to MILLI-units before the lag sums so both Σe² and
    * Σ(Δe)² are exact integers. Returns per key:
    * (key, n, num_mu2, den_mu2, dw).
    *
    * Scale: one key-rollup agg for the moments, a broadcast join back
    * onto the series, and a key-partitioned lag window — callers pass
    * a SERIES frame (already rolled up, e.g. daily totals), so the
    * window is rollup-sized. */
  def durbinWatson(df: DataFrame, keyCol: Column, xCol: Column,
      yCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    def l(c: Column) = c.cast("long").cast(d38)
    val base = df.select(keyCol.as("__k"), xCol.cast("long").as("__x"),
      yCol.cast("long").as("__y"))
    val mo = base.groupBy(col("__k")).agg(
      count(lit(1)).cast(d38).as("__n"),
      sum(l(col("__x"))).cast(d38).as("__sx"),
      sum(l(col("__y"))).cast(d38).as("__sy"),
      sum(l(col("__x")) * l(col("__x"))).cast(d38).as("__sxx"),
      sum(l(col("__x")) * l(col("__y"))).cast(d38).as("__sxy"))
    val fit = mo.select(col("__k"), col("__n"),
      ((col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
        (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double"))
        .as("__b"),
      col("__sx").cast("double").as("__sxd"),
      col("__sy").cast("double").as("__syd"))
      .withColumn("__a", (col("__syd") - col("__b") * col("__sxd")) /
        col("__n").cast("double"))
    val res = base.join(broadcast(fit.select(col("__k"), col("__n"),
        col("__a"), col("__b"))), "__k")
      .withColumn("__eu", round((col("__y").cast("double") - col("__a") -
        col("__b") * col("__x").cast("double")) * 1000, 0).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__x"))
    res.withColumn("__lag", lag(col("__eu"), 1).over(w))
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__lag").isNotNull,
          (col("__eu") - col("__lag")).cast("decimal(38,0)") *
            (col("__eu") - col("__lag")).cast("decimal(38,0)"))).as("__num"),
        sum(col("__eu").cast("decimal(38,0)") *
          col("__eu").cast("decimal(38,0)")).as("__den"))
      // num/den are exact DECIMAL(38,0) integers (too wide for BIGINT);
      // emitted as doubles — decimal→double is one correctly-rounded
      // conversion of an exact value, identical in any engine
      .select(col("__k"), col("n"),
        col("__num").cast("double").as("num_mu2"),
        col("__den").cast("double").as("den_mu2"),
        when(col("__den") > 0,
          col("__num").cast("double") / col("__den").cast("double")).as("dw"))
  }

  /** A-stat/A8 — binary-segmentation changepoint detection, depth 2
    * (Scott & Knott 1974 / the standard recursive CUSUM-split scheme):
    * find the split of a series maximizing the between-segment
    * variance gain G(t) = (S₁·n₂ − S₂·n₁)² / (n₁·n₂) (the
    * cleared-denominator form of n₁n₂/n·(ȳ₁−ȳ₂)²), then recurse once
    * into each side — three candidate changepoints per series. The
    * gain numerator is an exact DECIMAL(38,0) square; only the final
    * division is a double over identical operands, and argmax ties
    * break on the EARLIER position — engine-replayable layer by
    * layer. Callers pass a SERIES frame (already rolled up). Returns
    * 3 rows: (level ∈ {1 root, 2 left, 3 right}, seg_start, seg_end,
    * split_at [last position of the left half], gain).
    *
    * Scale: one prefix window over the rollup-sized series (bounded,
    * documented) + three TakeOrdered(1) argmax passes over it — the
    * fact-table pass is whatever built the series. */
  def binarySegmentation(series: DataFrame, orderCol: Column,
      valueCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // prefix frame: bounded series rollup (documented hazard)
    val pre = series.select(orderCol.as("__t"), valueCol.cast("long").as("__y"))
      .withColumn("__cn", count(lit(1)).over(w))
      .withColumn("__cs", sum(col("__y")).over(w))
      .localCheckpoint() // read by all three argmax passes
    val bounds = pre.agg(min(col("__t")).as("__lo"), max(col("__t")).as("__hi"),
      max(col("__cn")).as("__n"), max(col("__cs")).as("__s"))
    def argmaxSplit(level: Int, segLo: Column, segHi: Column,
        cnLo: Column, csLo: Column, cnHi: Column, csHi: Column,
        frame: DataFrame): DataFrame = {
      frame
        .filter(col("__t") >= segLo && col("__t") < segHi)
        .withColumn("__n1", col("__cn") - cnLo)
        .withColumn("__s1", (col("__cs") - csLo).cast(d38))
        .withColumn("__n2", cnHi - col("__cn"))
        .withColumn("__s2", (csHi - col("__cs")).cast(d38))
        .filter(col("__n1") > 0 && col("__n2") > 0)
        .withColumn("__num",
          col("__s1") * col("__n2").cast(d38) - col("__s2") * col("__n1").cast(d38))
        .withColumn("gain", (col("__num") * col("__num")).cast("double") /
          (col("__n1") * col("__n2")).cast("double"))
        .orderBy(col("gain").desc, col("__t"))
        .limit(1)
        .select(lit(level.toLong).as("level"), segLo.as("seg_start"),
          segHi.as("seg_end"), col("__t").as("split_at"), col("gain"),
          col("__cn").as("__cnSplit"), col("__cs").as("__csSplit"))
    }
    val root = argmaxSplit(1, col("__lo"), col("__hi"), lit(0L), lit(0L),
      col("__n"), col("__s"), pre.crossJoin(broadcast(bounds)))
      .localCheckpoint()
    val rootB = broadcast(root.select(col("split_at").as("__rt"),
      col("__cnSplit").as("__rcn"), col("__csSplit").as("__rcs")))
    val withRoot = pre.crossJoin(rootB).crossJoin(broadcast(bounds))
    val left = argmaxSplit(2, col("__lo"), col("__rt"), lit(0L), lit(0L),
      col("__rcn"), col("__rcs"), withRoot)
    val right = argmaxSplit(3, expr("__rt + 1"), col("__hi"),
      col("__rcn"), col("__rcs"), col("__n"), col("__s"), withRoot)
    root.select(col("level"), col("seg_start"), col("seg_end"),
        col("split_at"), col("gain"))
      .unionByName(left.select(col("level"), col("seg_start"), col("seg_end"),
        col("split_at"), col("gain")))
      .unionByName(right.select(col("level"), col("seg_start"), col("seg_end"),
        col("split_at"), col("gain")))
  }

  graft.plans.Guardrails.expect("single_partition_window",
    "__cv, __v",
    "brunnerMunzel: cumulative over the bounded distinct-value rollup",
    "rollup")
  graft.plans.Guardrails.expect("cartesian_join",
    "__sra, __sda",
    "brunnerMunzel: 1-row-per-group finish broadcast",
    "k-literal")

  /** A-stat — Brunner-Munzel generalized Wilcoxon test (Brunner &
    * Munzel, Biometrical J. 2000): tests P(X < Y) + ½P(X = Y) = ½
    * WITHOUT the equal-variance/shift assumption Mann-Whitney (q152)
    * needs — the nonparametric Behrens-Fisher solution, with midrank
    * ties handled exactly. Returns ONE row:
    * (n_a, n_b, p_hat, bm_stat, df) — p̂ the stochastic-superiority
    * estimate, W the studentized statistic, df its Satterthwaite
    * degrees of freedom (the lawstat parameterization).
    *
    * Exactness: midranks live on the half-integer grid, so DOUBLED
    * ranks are integers computed from cumulative counts over the
    * (group × value) rollup — no per-row sort. The placement
    * deviations are n_g-cleared integers in decimal(38,0)
    * (exact while n_g·N < ~1e19, far past any real cohort), and every
    * float op is a pinned-order ÷/sqrt chain at the very end.
    *
    * Scale: the q152/q324 envelope — one fact pass to the value
    * rollup (map-side combine); the combined-rank cumulative runs on
    * the bounded DISTINCT-VALUE frame (documented single-partition
    * window); per-group cumulatives are group-keyed. */
  def brunnerMunzel(df: org.apache.spark.sql.DataFrame, valueCol: Column,
      groupCol: Column, groupA: String, groupB: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val perV = df.filter(groupCol.isin(groupA, groupB))
      .select(groupCol.as("__g"), valueCol.cast("long").as("__v"))
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
    val wv = Window.orderBy(col("__v"))
    val tot = perV.groupBy(col("__v")).agg(sum(col("__c")).as("__cv"))
      .withColumn("__cb", coalesce(sum(col("__cv")).over(
        wv.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // doubled combined midrank shared by every copy of this value
      .withColumn("__rho", lit(2L) * col("__cb") + col("__cv") + 1)
      .select(col("__v"), col("__rho"))
    val wg = Window.partitionBy(col("__g")).orderBy(col("__v"))
    val wAll = Window.partitionBy(col("__g"))
    val cum = perV.join(tot, "__v")
      .withColumn("__cbg", coalesce(sum(col("__c")).over(
        wg.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // doubled WITHIN-group midrank of the same copies
      .withColumn("__rhos", lit(2L) * col("__cbg") + col("__c") + 1)
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__srho",
        sum((col("__c") * col("__rho")).cast(d38)).over(wAll).cast(d38))
      // n_g-cleared placement deviation (integer, decimal-safe):
      // D = n_g·(ρ − ρ* + (n_g+1)) − Σρ_g
      .withColumn("__d",
        (col("__n").cast(d38) *
          (col("__rho") - col("__rhos") + col("__n") + 1) -
          col("__srho")).cast(d38))
    val g = cum.groupBy(col("__g")).agg(
      max(col("__n")).as("n"), max(col("__srho")).as("srho"),
      sum(col("__c").cast(d38) * col("__d") * col("__d")).as("sd2"))
    val a = g.filter(col("__g") === groupA)
      .select(col("n").as("n_a"), col("srho").as("__sra"),
        col("sd2").as("__sda"))
    val b = g.filter(col("__g") === groupB)
      .select(col("n").as("n_b"), col("srho").as("__srb"),
        col("sd2").as("__sdb"))
    // n_g·v_g = ΣD²/(4·n_g·(n_g−1)) — each term one pinned division
    def nv(sd2: Column, n: Column) = sd2.cast("double") /
      (lit(4L).cast(d38) * n * (n.cast(d38) - 1)).cast("double")
    a.crossJoin(broadcast(b))
      .withColumn("__t1", nv(col("__sda"), col("n_a")))
      .withColumn("__t2", nv(col("__sdb"), col("n_b")))
      .withColumn("__num",
        (col("n_a").cast(d38) * col("__srb") -
          col("n_b").cast(d38) * col("__sra")).cast("double"))
      .select(col("n_a"), col("n_b"),
        // p̂ = (Σρ_b − n_b(n_b+1)) / (2·n_a·n_b)
        ((col("__srb") - col("n_b").cast(d38) * (col("n_b") + 1))
          .cast("double") /
          (lit(2L).cast(d38) * col("n_a") * col("n_b")).cast("double"))
          .as("p_hat"),
        when(col("__t1") + col("__t2") =!= 0.0,
          col("__num") / 2.0 / (col("n_a") + col("n_b")).cast("double") /
            sqrt(col("__t1") + col("__t2"))).as("bm_stat"),
        when(col("__t1") =!= 0.0 || col("__t2") =!= 0.0,
          (col("__t1") + col("__t2")) * (col("__t1") + col("__t2")) /
            (col("__t1") * col("__t1") / (col("n_a") - 1).cast("double") +
             col("__t2") * col("__t2") / (col("n_b") - 1).cast("double")))
          .as("df"))
  }

  /** A-stat — negative-binomial method-of-moments fit per group
    * (the standard overdispersed-count model, Anscombe 1950 MoM
    * form): from exact integer moments, mean m = S₁/n, sample
    * variance v = (n·S₂ − S₁²)/(n(n−1)), then
    * r = m²/(v − m), p = m/v — defined only when v > m
    * (overdispersed; otherwise r/p are null and the Poisson already
    * fits). The companion readout to q288's dispersion TEST: q288
    * says "Poisson is wrong", this says what to use instead.
    *
    * Returns per group: (group, n, mean, variance, dispersion, r, p).
    *
    * Scale: ONE conditional-moment agg per group key (map-side
    * combine, decimal-exact sums); everything after is a
    * |groups|-row pinned double finish. */
  def negBinomialMom(df: org.apache.spark.sql.DataFrame, valueCol: Column,
      groupCol: Column): org.apache.spark.sql.DataFrame = {
    val d38 = "decimal(38,0)"
    val g = df.select(groupCol.as("g"), valueCol.cast("long").as("__v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("__v")).cast(d38).as("__s1"),
        sum(col("__v").cast(d38) * col("__v").cast(d38)).as("__s2"))
      .filter(col("n") >= 2)
    val mean = col("__s1").cast("double") / col("n").cast("double")
    val varS = (col("n").cast(d38) * col("__s2") -
      col("__s1") * col("__s1")).cast("double") /
      (col("n").cast(d38) * (col("n").cast(d38) - 1)).cast("double")
    g.withColumn("mean", mean)
      .withColumn("variance", varS)
      .withColumn("dispersion",
        when(col("mean") =!= 0.0, col("variance") / col("mean")))
      .withColumn("r", when(col("variance") > col("mean"),
        col("mean") * col("mean") / (col("variance") - col("mean"))))
      .withColumn("p", when(col("variance") > col("mean"),
        col("mean") / col("variance")))
      .select(col("g"), col("n"), col("mean"), col("variance"),
        col("dispersion"), col("r"), col("p"))
      .orderBy(col("g"))
  }

  /** A-stat — Lin's concordance correlation coefficient per group
    * (Lin 1989, Biometrics): agreement between two PAIRED continuous
    * measurements — penalizes both scatter AND systematic bias,
    * unlike Pearson (two methods can correlate at 1.0 while one reads
    * 2× high; CCC catches it):
    *   CCC = 2·s_xy / (s_x² + s_y² + (x̄ − ȳ)²)
    * in the n²-cleared exact-integer form
    *   2(n·Σxy − ΣxΣy) / ((n·Σx² − (Σx)²) + (n·Σy² − (Σy)²) +
    *                      (Σx − Σy)²).
    * The continuous-agreement row beside Cohen's κ (categorical,
    * q233) and Bland–Altman (q307). Returns per group:
    * (g, n, mean_x, mean_y, pearson_r, ccc).
    *
    * Scale: one group-keyed moment agg with map-side combine; the
    * finish is |groups| rows of pinned IEEE chains over exact
    * decimals. */
  def linConcordance(df: org.apache.spark.sql.DataFrame, xCol: Column,
      yCol: Column, groupCol: Column): org.apache.spark.sql.DataFrame = {
    val d38 = "decimal(38,0)"
    def dd(c: Column) = c.cast(d38)
    val m = df.select(groupCol.as("g"), xCol.cast("long").as("__x"),
        yCol.cast("long").as("__y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(dd(col("__x"))).cast(d38).as("__sx"),
        sum(dd(col("__y"))).cast(d38).as("__sy"),
        sum(dd(col("__x")) * dd(col("__x"))).cast(d38).as("__sxx"),
        sum(dd(col("__y")) * dd(col("__y"))).cast(d38).as("__syy"),
        sum(dd(col("__x")) * dd(col("__y"))).cast(d38).as("__sxy"))
      .filter(col("n") >= 2)
    val vx = dd(col("n")) * col("__sxx") - col("__sx") * col("__sx")
    val vy = dd(col("n")) * col("__syy") - col("__sy") * col("__sy")
    val cxy = dd(col("n")) * col("__sxy") - col("__sx") * col("__sy")
    val bias = (col("__sx") - col("__sy")) * (col("__sx") - col("__sy"))
    m.select(col("g"), col("n"),
        (col("__sx").cast("double") / col("n").cast("double")).as("mean_x"),
        (col("__sy").cast("double") / col("n").cast("double")).as("mean_y"),
        // rounded to 6: the 38-digit cross-moments exceed 2^53, and
        // decimal->double vs HUGEINT->double conversion can differ in
        // the last ulp across engines
        when(vx =!= 0 && vy =!= 0, round(cxy.cast("double") /
          sqrt(vx.cast("double") * vy.cast("double")), 6)).as("pearson_r"),
        when((vx + vy + bias) =!= 0,
          round(cxy.cast("double") * 2.0 / (vx + vy + bias).cast("double"),
            6)).as("ccc"))
      .orderBy(col("g"))
  }

  /** A-stat — process-capability indices per group (the SPC release
    * gate — Montgomery, Statistical Quality Control ch. 8; joins the
    * XmR chart q263 as the capability half of control charting):
    *   Cp  = (USL − LSL) / 6σ        (potential: spread only)
    *   Cpk = min(USL − μ, μ − LSL) / 3σ  (realized: centering counts)
    * with μ, σ the population moments of an integer measure.
    * Cpk < 1 ⇒ the process ships out-of-spec units even when stable.
    * Every readout is a pinned IEEE chain over exact integer moments.
    * Returns per group: (g, n, mean, std, cp, cpk).
    *
    * Scale: one group-keyed moment agg with map-side combine. */
  def processCapability(df: org.apache.spark.sql.DataFrame,
      valueCol: Column, groupCol: Column, lsl: Long,
      usl: Long): org.apache.spark.sql.DataFrame = {
    require(usl > lsl, "USL > LSL")
    val d38 = "decimal(38,0)"
    def dd(c: Column) = c.cast(d38)
    val m = df.select(groupCol.as("g"), valueCol.cast("long").as("__v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(dd(col("__v"))).cast(d38).as("__s"),
        sum(dd(col("__v")) * dd(col("__v"))).cast(d38).as("__ss"))
      .filter(col("n") >= 2)
    val mean = col("__s").cast("double") / col("n").cast("double")
    // population σ = sqrt(n·Σv² − (Σv)²) / n — exact integer radicand
    val std = sqrt((dd(col("n")) * col("__ss") - col("__s") * col("__s"))
      .cast("double")) / col("n").cast("double")
    m.select(col("g"), col("n"), mean.as("mean"), std.as("std"),
        when(std =!= 0.0, lit((usl - lsl).toDouble) / (std * 6.0)).as("cp"),
        when(std =!= 0.0,
          least(lit(usl.toDouble) - mean, mean - lit(lsl.toDouble)) /
            (std * 3.0)).as("cpk"))
      .orderBy(col("g"))
  }

  /** A-stat — Chao1 species-richness estimator per group (Chao 1984;
    * bias-corrected form of Colwell & Coddington 1994): from the
    * abundance spectrum of observed species, estimate how many
    * species the group REALLY has, unseen ones included —
    *   Ŝ = S_obs + f₁(f₁−1) / (2(f₂+1))
    * with f₁/f₂ the singleton/doubleton counts (bias-corrected form:
    * always defined, even with no doubletons). Beside it, Good's
    * sample coverage Ĉ = 1 − f₁/n — "what fraction of the next draw
    * is an already-seen species". The unseen-vocabulary / unseen-URL
    * estimator every corpus-growth decision needs (complements q192
    * capture-recapture and q258 Good-Turing).
    *
    * Returns per group: (g, n_obs, s_obs, f1, f2, chao1, coverage) —
    * integer spectrum counts, each double computed once in pinned
    * order from exact integers.
    *
    * Scale: ONE (group, species) rollup off the fact table (map-side
    * combine) then a |groups×species|→|groups| conditional agg —
    * never a distinct-count sketch compromise, and nothing wider than
    * the rollup shuffles. */
  def chao1Richness(df: org.apache.spark.sql.DataFrame, speciesCol: Column,
      groupCol: Column): org.apache.spark.sql.DataFrame = {
    val ab = df.select(groupCol.as("g"), speciesCol.as("__sp"))
      .groupBy(col("g"), col("__sp")).agg(count(lit(1)).as("__c"))
    ab.groupBy(col("g"))
      .agg(sum(col("__c")).as("n_obs"),
        count(lit(1)).as("s_obs"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("__c") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col("g"), col("n_obs"), col("s_obs"), col("f1"), col("f2"),
        (col("s_obs").cast("double") +
          (col("f1") * (col("f1") - 1)).cast("double") /
            ((col("f2") + 1) * 2L).cast("double")).as("chao1"),
        (lit(1.0) - col("f1").cast("double") / col("n_obs").cast("double"))
          .as("coverage"))
      .orderBy(col("g"))
  }

  /** A-stat — Huber M-estimator of location per group (Huber 1964),
    * by IRLS with a FIXED iteration count: start at the group mean,
    * then repeat mu ← Σ w·x / Σ w with the Huber weight
    * w = min(1, c / |x − mu|) — downweighting points past c the way
    * the trimmed mean (q324) hard-drops them, but smoothly.
    *
    * Determinism contract: values are integers, mu lives on the
    * integer MICRO grid, so |x − mu| is an exact integer micro-
    * distance; the weight is the exact integer ppm
    * min(1e6, (c_micro·1e6) div dist_micro), and each mu update is
    * one decimal(38,0) floor division — every iterate is bit-portable
    * across engines and partitionings, no float accumulates.
    *
    * Returns per group: (group, n, mean_micro, huber_mu_micro,
    * huber_mu), huber_mu = final iterate as a double (÷1e6, exact).
    *
    * Scale: ONE fact pass builds the (group, value, count) rollup
    * (map-side combine); all `iterations` updates run on that rollup
    * — for discrete-valued measures the rollup is |group|×|values|,
    * thousands of rows at any corpus size. */
  def huberLocation(df: org.apache.spark.sql.DataFrame, valueCol: Column,
      groupCol: Column, cMicro: Long, iterations: Int = 3)
      : org.apache.spark.sql.DataFrame = {
    require(cMicro > 0, "cMicro > 0")
    require(iterations >= 1 && iterations <= 8, "1 <= iterations <= 8")
    val d38 = "decimal(38,0)"
    val pv = df.select(groupCol.as("g"), valueCol.cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val mean = pv.groupBy(col("g"))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast(d38) * col("v").cast(d38)).as("__sv"))
      .withColumn("mean_micro",
        expr(s"CAST((__sv * 1000000) div n AS BIGINT)"))
      .select(col("g"), col("n"), col("mean_micro"))
    val withMu0 = pv.join(mean, "g").withColumn("__mu", col("mean_micro"))
    val iterated = (1 to iterations).foldLeft(withMu0) { (acc, _) =>
      val step = acc
        .withColumn("__dist",
          abs(col("v") * lit(1000000L) - col("__mu")))
        // exact integer ppm weight; dist 0 -> full weight
        .withColumn("__w", when(col("__dist") === 0, lit(1000000L))
          .otherwise(least(lit(1000000L),
            expr(s"${cMicro}L * 1000000L div __dist"))))
      val mu = step.groupBy(col("g"))
        .agg(((sum(col("c").cast(d38) * col("__w").cast(d38) *
            col("v").cast(d38)) * lit(1000000L)) cast d38).as("__num"),
          sum(col("c").cast(d38) * col("__w").cast(d38)).cast(d38).as("__den"))
        .select(col("g"), expr("CAST(__num div __den AS BIGINT)").as("__mu2"))
      acc.join(mu, "g").withColumn("__mu", col("__mu2")).drop("__mu2")
    }
    iterated.groupBy(col("g"))
      .agg(max(col("n")).as("n"), max(col("mean_micro")).as("mean_micro"),
        max(col("__mu")).as("huber_mu_micro"))
      .withColumn("huber_mu", col("huber_mu_micro").cast("double") / 1e6)
      .orderBy(col("g"))
  }
  /** A-stat/anomaly — HBOS: Histogram-Based Outlier Score (Goldstein
    * & Dengel, KI 2012 — the deterministic density-based outlier
    * detector that needs no distance joins and no RNG, linear where
    * LOF/iForest are not): per feature, equal-width histogram
    * densities; a row's score sums, over features, the log of how far
    * its bin falls below the modal bin:
    *   score = Σ_f ln(maxcount_f / count_f(bin_f(x))).
    * Bin edges are exact integer arithmetic ((v−min)·B div (range+1));
    * each log is micro-nat quantized once per (feature, bin) — scores
    * are integer sums, rankings bit-stable. Returns the top `k` rows:
    * (id, score_micro) descending (ties → id).
    *
    * Scale: per feature ONE histogram agg (map-side combine, B bins)
    * broadcast back onto the scan — no shuffle wider than the fact
    * table's feature projection, no pairwise anything. */
  def hbosOutliers(df: org.apache.spark.sql.DataFrame, idCol: Column,
      features: Seq[Column], bins: Int, k: Int): org.apache.spark.sql.DataFrame = {
    require(features.nonEmpty, "at least one feature")
    require(bins >= 2 && bins <= 10000, "2 <= bins <= 1e4")
    require(k >= 1, "k >= 1")
    val base = df.select(idCol.cast("long").as("__id") +:
      features.zipWithIndex.map { case (f, i) =>
        f.cast("long").as(s"__f$i") }: _*).localCheckpoint()
    val scored = features.indices.map { i =>
      val fc = col(s"__f$i")
      val mm = base.agg(min(fc).as("__mn"), max(fc).as("__mx"))
      val binned = base.crossJoin(broadcast(mm))
        .withColumn("__bin", expr(
          s"((__f$i - __mn) * ${bins}L) div (__mx - __mn + 1L)"))
        .select(col("__id"), col("__bin"))
      val hist = binned.groupBy(col("__bin")).agg(count(lit(1)).as("__c"))
        .localCheckpoint()
      val mx = hist.agg(max(col("__c")).as("__maxc"))
      val withScore = hist.crossJoin(broadcast(mx))
        .withColumn("__mnat", floor(
          log(col("__maxc").cast("double") / col("__c").cast("double"))
            * 1e6 + 0.5).cast("long"))
      binned.join(broadcast(withScore.select(col("__bin"), col("__mnat"))),
        "__bin")
        .select(col("__id"), col("__mnat"))
    }
    scored.reduce(_ unionByName _)
      .groupBy(col("__id").as("id"))
      .agg(sum(col("__mnat")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("id"))
      .limit(k)
  }

  /** A-stat — Theil's uncertainty coefficient U (Theil 1970; the
    * asymmetric, entropy-based categorical association — unlike
    * Cramér's V (q208) it answers the DIRECTIONAL question "how much
    * of X do I know once I know Y"):
    *   U(X|Y) = (H(X) − H(X|Y)) / H(X)
    * with every entropy a micro-nat integer sum over exact counts
    * (one libm log per margin/cell). Returns ONE row:
    * (n, h_x_micro, h_x_given_y_micro, u_x_given_y_ppm,
    * h_y_micro, h_y_given_x_micro, u_y_given_x_ppm).
    *
    * Scale: one (x, y) contingency agg with map-side combine; margins
    * and entropies run on the cell frame. */
  def uncertaintyCoefficient(df: org.apache.spark.sql.DataFrame,
      xCol: Column, yCol: Column): org.apache.spark.sql.DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.groupBy(xCol.cast("string").as("__x"),
        yCol.cast("string").as("__y"))
      .agg(count(lit(1)).as("__c")).localCheckpoint()
    val xm = cells.groupBy(col("__x")).agg(sum(col("__c")).as("__nx"))
    val ym = cells.groupBy(col("__y")).agg(sum(col("__c")).as("__ny"))
    val n = cells.agg(sum(col("__c")).as("__n"))
    def mnat(num: Column, den: Column) = floor(
      log(num.cast("double") / den.cast("double")) * 1e6 + 0.5).cast("long")
    val hx = xm.crossJoin(broadcast(n))
      .agg((sum(col("__nx").cast(d38) * mnat(col("__n"), col("__nx"))
        .cast(d38)).cast(d38)).as("__s"), max(col("__n")).as("__n"))
      .select(expr("cast(__s div __n as long)").as("h_x_micro"))
    val hy = ym.crossJoin(broadcast(n))
      .agg((sum(col("__ny").cast(d38) * mnat(col("__n"), col("__ny"))
        .cast(d38)).cast(d38)).as("__s"), max(col("__n")).as("__n"))
      .select(expr("cast(__s div __n as long)").as("h_y_micro"))
    val hxy = cells.join(broadcast(ym), "__y").crossJoin(broadcast(n))
      .agg((sum(col("__c").cast(d38) * mnat(col("__ny"), col("__c"))
        .cast(d38)).cast(d38)).as("__s"), max(col("__n")).as("__n"))
      .select(expr("cast(__s div __n as long)").as("h_x_given_y_micro"))
    val hyx = cells.join(broadcast(xm), "__x").crossJoin(broadcast(n))
      .agg((sum(col("__c").cast(d38) * mnat(col("__nx"), col("__c"))
        .cast(d38)).cast(d38)).as("__s"), max(col("__n")).as("__n"))
      .select(expr("cast(__s div __n as long)").as("h_y_given_x_micro"))
    n.select(col("__n").cast("long").as("n"))
      .crossJoin(hx).crossJoin(hxy).crossJoin(hy).crossJoin(hyx)
      .select(col("n"), col("h_x_micro"), col("h_x_given_y_micro"),
        expr("((h_x_micro - h_x_given_y_micro) * 1000000L) div " +
          "greatest(h_x_micro, 1L)").as("u_x_given_y_ppm"),
        col("h_y_micro"), col("h_y_given_x_micro"),
        expr("((h_y_micro - h_y_given_x_micro) * 1000000L) div " +
          "greatest(h_y_micro, 1L)").as("u_y_given_x_ppm"))
  }
  /** A-stat — Deming regression per group (Deming 1943; errors in
    * BOTH variables, λ = 1): the method-comparison LINE to go with
    * Lin's CCC (q412) and Bland–Altman (q307) — OLS is biased toward
    * zero slope when x carries noise too; Deming's closed form
    *   β = (S_yy − S_xx + √((S_yy − S_xx)² + 4·S_xy²)) / (2·S_xy)
    * treats both axes symmetrically. Moments are exact decimal; the
    * finish is one pinned IEEE chain rounded to 6 (the n-cleared
    * S-terms convert once to double; conversion parity is the q412
    * lesson, hence the rounding). Returns per group:
    * (g, n, slope, intercept).
    *
    * Scale: one group-keyed moment agg with map-side combine. */
  def demingRegression(df: org.apache.spark.sql.DataFrame, xCol: Column,
      yCol: Column, groupCol: Column): org.apache.spark.sql.DataFrame = {
    val d38 = "decimal(38,0)"
    def dd(c: Column) = c.cast(d38)
    val m = df.select(groupCol.as("g"), xCol.cast("long").as("__x"),
        yCol.cast("long").as("__y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(dd(col("__x"))).cast(d38).as("__sx"),
        sum(dd(col("__y"))).cast(d38).as("__sy"),
        sum(dd(col("__x")) * dd(col("__x"))).cast(d38).as("__sxx"),
        sum(dd(col("__y")) * dd(col("__y"))).cast(d38).as("__syy"),
        sum(dd(col("__x")) * dd(col("__y"))).cast(d38).as("__sxy"))
      .filter(col("n") >= 2)
    val sxxN = (dd(col("n")) * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val syyN = (dd(col("n")) * col("__syy") - col("__sy") * col("__sy"))
      .cast("double")
    val sxyN = (dd(col("n")) * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val slope = (syyN - sxxN +
      sqrt((syyN - sxxN) * (syyN - sxxN) + sxyN * sxyN * 4.0)) /
      (sxyN * 2.0)
    m.select(col("g"), col("n"),
        when(sxyN =!= 0.0, round(slope, 6)).as("slope"),
        when(sxyN =!= 0.0, round(
          col("__sy").cast("double") / col("n").cast("double") -
            slope * (col("__sx").cast("double") / col("n").cast("double")),
          6)).as("intercept"))
      .orderBy(col("g"))
  }

  /** A-stat — HODGES-LEHMANN location estimator per group (Hodges &
    * Lehmann 1963 — public literature): the median of all Walsh
    * averages (vᵢ+vⱼ)/2 over i ≤ j — the robust "center" whose
    * breakdown beats the mean and whose efficiency beats the median;
    * the location half of the Wilcoxon machinery. Kept EXACT by
    * selecting the median of the integer SUMS vᵢ+vⱼ (lower-median
    * convention of [[weightedMedian]]) and reporting it as
    * hl2 = 2·HL — callers halve for presentation; the selection is
    * integer end to end. Returns per group: (…keys, n, n_pairs, hl2).
    *
    * Scale: the Walsh self-join is |group|² pairs — run it on a
    * BOUNDED rollup (calendar-grain series, audit slices), never raw
    * facts; the doc says so and the query layer does so. The median
    * selection reuses weightedQuantile's key-partitioned envelope. */
  def hodgesLehmann(df: org.apache.spark.sql.DataFrame, keys: Seq[Column],
      valueCol: Column, tieCol: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base = df.select(keys :+ valueCol.cast("long").as("__v") :+
      tieCol.cast("long").as("__t"): _*)
    val kNames = base.columns.dropRight(2).toSeq
    val left = base.toDF(kNames.map(k => s"$k") :+ "__v1" :+ "__t1": _*)
    val right = base.toDF(kNames.map(k => s"$k") :+ "__v2" :+ "__t2": _*)
    val pairs = left.join(right, kNames)
      .filter(col("__t1") <= col("__t2"))
      .select((kNames.map(col) :+ (col("__v1") + col("__v2")).as("__w2") :+
        col("__t1") :+ col("__t2")): _*)
    val med = weightedQuantile(pairs, kNames.map(col), col("__w2"),
      lit(1L), Seq(col("__t1"), col("__t2")), 1, 2)
    val counts = base.groupBy(kNames.map(col): _*)
      .agg(count(lit(1)).as("n"))
    counts.join(med, kNames)
      .select((kNames.map(col) :+ col("n") :+
        (col("total_weight")).as("n_pairs") :+
        col("weighted_quantile").as("hl2")): _*)
  }

  /** A-stat — MEDIAN OF MEANS robust mean (the standard
    * heavy-tail-safe mean estimator; Nemirovsky-Yudin / Jerrum-
    * Valiant-Vazirani lineage — public literature): hash rows into
    * `k` deterministic buckets, take each bucket's exact micro-mean
    * (integer div), report the LOWER median of the k bucket means —
    * one outlier can poison at most one bucket. k odd recommended.
    * `bucketKeyCol` must be well-mixed (pass an id through xxhash64
    * upstream when ids are clustered; kept un-hashed HERE so a second
    * engine can replay the exact bucketing). Returns ONE row:
    * (n, k_buckets, mom_micro).
    *
    * Scale: one bucket-keyed agg with map-side combine + a k-row
    * TakeOrdered finish — the robust mean at any scan size, no
    * windows anywhere. */
  def medianOfMeans(df: org.apache.spark.sql.DataFrame, valueCol: Column,
      bucketKeyCol: Column, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(k >= 1, "k >= 1")
    val buckets = df.select(valueCol.cast("long").as("__v"),
        pmod(bucketKeyCol.cast("long"), lit(k.toLong)).as("__b"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
      .withColumn("__mean_u", expr("(__s * 1000000L) div __n"))
    // lower median of k means: the ceil(k/2)-smallest — TakeOrdered
    // (orderBy.limit), never a global sort materialization
    val kHalf = (k + 1) / 2
    val med = buckets.orderBy(col("__mean_u"), col("__b")).limit(kHalf)
      .agg(max(col("__mean_u")).as("mom_micro"))
    buckets.agg(sum(col("__n")).as("n"),
        count(lit(1)).as("k_buckets"))
      .crossJoin(broadcast(med))
  }
}
