package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Online-experimentation statistics beyond the per-metric tests in
  * [[Aggregates]] (Welch t q186, SRM q215, Cohen's d q216): CUPED
  * variance reduction and Benjamini-Hochberg multiple-testing control —
  * the two ops an A/B platform runs over EVERY experiment readout.
  * Reference surface: the sensor-stats aggregation loop
  * (`data_preprocessing.py:540-560`) computes per-group means; these
  * operators are what turns group means into decisions at fleet scale.
  *
  * Exactness discipline (shared with the Analytics modules): all
  * corpus-sized accumulation is exact integer/decimal sums; doubles
  * appear only in the O(groups)-sized finish, via formulas written
  * token-for-token identically in the oracle SQL.
  */
object Experimentation {

  // ---- by-design plan-hazard documentation (Guardrails.expect) ------
  // Each entry registers a deliberately-BOUNDED single-partition window
  // or unconditioned join this object builds, with its boundedness
  // argument, so the optimizer audit (PlanAudit / the Guardrails rule)
  // flags only NEW hazards instead of letting them hide among known
  // ones. Markers are operator-owned columns of the hazard plan node.
  graft.plans.Guardrails.expect("single_partition_window",
    "decile, n_t", "qiniCurve: 10-row decile rollup cumulative/lag",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "decile, qini_micro", "qiniCurve: 10-row lag for the trapezoid",
    "k-literal")
  graft.plans.Guardrails.expect("cartesian_join",
    "__ia, __lnS", "sbgFit: (t, censored) rollup x (a, b) literal lattice",
    "k-literal")
  graft.plans.Guardrails.expect("cartesian_join",
    "__y0, __w0", "syntheticControl: calendar frame x simplex-lattice broadcast",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__rem, stratum", "neymanAllocation: largest-remainder rank over strata",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "arm, pulls, wins", "ucb1: |arms|-row ranking",
    "vocabulary")
  graft.plans.Guardrails.expect("single_partition_window",
    "look", "sequentialBoundary/sprt: K-row look rollup (calendar-bounded)",
    "calendar")
  graft.plans.Guardrails.expect("cartesian_join",
    "slope_left, y_at_cut_left",
    "regressionDiscontinuity: two 1-row side fits joined for the finish",
    "k-literal")
  graft.plans.Guardrails.expect("cartesian_join", "n_a, n_b",
    "quantileTreatmentEffects: two 1-row per-arm quantile frames joined",
    "k-literal")
  graft.plans.Guardrails.expect("cartesian_join", "__na, __nb",
    "covariateBalance: two 1-row per-arm moment frames joined",
    "k-literal")
  // upliftBands' cumulative walk may optimize into one or two Window
  // nodes and the audit detail caps at 8 columns — two markers cover
  // both shapes (each is a subset of the combined node's column list)
  graft.plans.Guardrails.expect("single_partition_window",
    "cum_n_t, cum_n_c, band, n_t",
    "upliftBands: cumulative walk over the <=|bands| rollup (bounded)",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "cum_r_t, band, n_t",
    "upliftBands: cumulative walk over the <=|bands| rollup (bounded)",
    "rollup")



  /** CUPED (Controlled-experiment Using Pre-Experiment Data; Deng,
    * Xu, Kohavi & Walker, WSDM'13 — public literature): adjust the
    * experiment metric by its pre-period covariate,
    *   y' = y − θ·(x − x̄),  θ = cov(x,y) / var(x),
    * which shrinks metric variance by the squared correlation ρ² while
    * leaving arm-mean DIFFERENCES unbiased. The workhorse sensitivity
    * boost of every mature A/B platform.
    *
    * Input: one row per unit with integer-cent metric (`yCents`),
    * integer-cent covariate (`xCents`) and an arm label. Exact
    * decimal(38) sums of n, Σx, Σy, Σx², Σxy, Σy² (per-row products
    * fit a long; their corpus sums do not); θ and ρ² are a double
    * finish over those six numbers. Per arm: n, raw mean, adjusted
    * mean y̅ₐ − θ(x̅ₐ − x̄), all in dollars rounded to 6dp.
    *
    * Returns (arm, n, mean_y, mean_y_adj, theta_ppm, var_reduction_ppm)
    * — the last two are experiment-level constants repeated per row.
    *
    * Scale: one unit-grain agg (map-side combinable) + one arm-grain
    * agg over it; the six global sums broadcast to the arm rows. No
    * window, no per-unit second pass — 100 TB of exposures reduce to
    * |arms| rows in two shuffles. */
  def cuped(units: DataFrame, xCentsName: String, yCentsName: String,
      armName: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val x = col(xCentsName).cast("long")
    val y = col(yCentsName).cast("long")
    // ONE unit-grain pass computes all six sums per arm; the global
    // sums are a |arms|-row rollup of it — never a second fact scan
    val perArm = units.groupBy(col(armName).as("arm")).agg(
      count(lit(1)).as("n"),
      sum(x.cast(d38)).as("__sx_a"),
      sum(y.cast(d38)).as("__sy_a"),
      sum((x * x).cast(d38)).as("__sxx_a"),
      sum((x * y).cast(d38)).as("__sxy_a"),
      sum((y * y).cast(d38)).as("__syy_a"))
    // |arms| rows, read twice (global rollup + finish) — eager,
    // GC-scoped materialization
    val armSums = perArm.localCheckpoint()
    val globals = armSums.agg(
      sum(col("n")).as("__n"),
      sum(col("__sx_a")).as("__sx"),
      sum(col("__sy_a")).as("__sy"),
      sum(col("__sxx_a")).as("__sxx"),
      sum(col("__sxy_a")).as("__sxy"),
      sum(col("__syy_a")).as("__syy"))
    armSums.crossJoin(broadcast(globals))
      // θ num/den and ρ² stay exact (decimal×decimal fits: cents² sums
      // are ≲10²⁸ « 10³⁸); the double division is the only rounding
      .withColumn("__cov_n", col("__n").cast(d38) * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__var_x", col("__n").cast(d38) * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__var_y", col("__n").cast(d38) * col("__syy") - col("__sy") * col("__sy"))
      .withColumn("theta", col("__cov_n").cast("double") / col("__var_x").cast("double"))
      .withColumn("mean_y",
        round(col("__sy_a").cast("double") / col("n") / 100.0, 6))
      .withColumn("mean_y_adj",
        round((col("__sy_a").cast("double") / col("n") -
          col("theta") * (col("__sx_a").cast("double") / col("n") -
            col("__sx").cast("double") / col("__n"))) / 100.0, 6))
      .withColumn("theta_ppm", round(col("theta") * lit(1e6), 0).cast("long"))
      .withColumn("var_reduction_ppm",
        round(col("__cov_n").cast("double") * col("__cov_n").cast("double") /
          (col("__var_x").cast("double") * col("__var_y").cast("double")) * 1e6,
          0).cast("long"))
      .select(col("arm"), col("n"), col("mean_y"), col("mean_y_adj"),
        col("theta_ppm"), col("var_reduction_ppm"))
  }

  /** Benjamini-Hochberg step-up FDR control (Benjamini & Hochberg
    * 1995 — public literature) over per-group two-sided one-proportion
    * z-tests: which groups' success rates differ from the global rate,
    * with expected false-discovery fraction ≤ q? THE correction for
    * "we just tested 1 000 suppliers and 63 look significant".
    *
    * p-values use the Abramowitz-Stegun 7.1.26 erfc polynomial
    * (max abs error 1.5e-7) — evaluated token-for-token identically
    * here and in the oracle SQL, so both engines produce the SAME
    * IEEE doubles and the step-up comparisons agree exactly; no
    * tolerance band needed. The step-up rule: sort p ascending, find
    * the LARGEST rank i with p(i) ≤ i·q/m, reject hypotheses 1..i.
    *
    * Returns (group, n, successes, rate_ppm, z_milli, p_nano, p_rank,
    * discovery) ordered by (p_rank).
    *
    * Scale: the fact-table pass is one group-keyed agg; everything
    * after runs on |groups| rows. The global rank uses
    * [[Ranking.globalRowNumber]] (range shuffle + offset rollup), so
    * a million hypotheses never meet a single-partition window; the
    * two scalars (m, cutoff rank k) broadcast back. */
  def bhDiscoveries(df: DataFrame, groupName: String, successCond: org.apache.spark.sql.Column,
      qNum: Int = 5, qDen: Int = 100): DataFrame = {
    require(qNum > 0 && qDen > 0 && qNum < qDen, "need 0 < q < 1")
    // |groups| rows, read twice (global totals + scoring) —
    // materialize, or the fact-table agg runs once per consumer
    val g = df.groupBy(col(groupName).as("grp")).agg(
      count(lit(1)).as("n"),
      sum(successCond.cast("long")).as("successes"))
      .localCheckpoint()
    val glob = g.agg(sum(col("n")).as("__tn"), sum(col("successes")).as("__ts"),
      count(lit(1)).as("m"))
    val scored = g.crossJoin(broadcast(glob))
      .withColumn("__p0", col("__ts").cast("double") / col("__tn").cast("double"))
      .withColumn("__z",
        (col("successes").cast("double") / col("n").cast("double") - col("__p0")) /
          sqrt(col("__p0") * (lit(1.0) - col("__p0")) / col("n").cast("double")))
      // A&S 7.1.26 in Horner form — mirrored verbatim in the oracle
      .withColumn("__xa", abs(col("__z")) / sqrt(lit(2.0)))
      .withColumn("__t", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("__xa")))
      .withColumn("__p",
        (((((lit(1.061405429) * col("__t") - lit(1.453152027)) * col("__t") +
          lit(1.421413741)) * col("__t") - lit(0.284496736)) * col("__t") +
          lit(0.254829592)) * col("__t")) * exp(-(col("__xa") * col("__xa"))))
    val ranked = Ranking.globalRowNumber(scored, Seq(col("__p"), col("grp")))
      .withColumnRenamed("row_num", "p_rank")
      .withColumn("__pass",
        when(col("__p") <= col("p_rank").cast("double") * qNum / qDen / col("m"),
          col("p_rank")).otherwise(lit(0L)))
    val cutoff = ranked.agg(max(col("__pass")).as("__k"))
    ranked.crossJoin(broadcast(cutoff))
      .select(col("grp").as(groupName), col("n"), col("successes"),
        expr("(successes * 1000000L) div n").as("rate_ppm"),
        round(col("__z") * 1000, 0).cast("long").as("z_milli"),
        round(col("__p") * 1e9, 0).cast("long").as("p_nano"),
        col("p_rank"),
        (col("p_rank") <= col("__k")).as("discovery"))
      .orderBy(col("p_rank"))
  }

  /** A-stat — Benjamini–Yekutieli FDR control (Benjamini & Yekutieli
    * 2001): the step-up of [[bhDiscoveries]] made valid under
    * ARBITRARY dependence between the tests by deflating every
    * threshold by the harmonic factor c(m) = Σ_{i≤m} 1/i ≈ ln m —
    * the conservative fallback when supplier/segment tests share
    * structure (common customers, seasonal co-movement) and BH's
    * independence-ish assumption is indefensible.
    *
    * Determinism: c(m) is the ORDER-FREE integer nano-sum
    * Σ (10⁹ div i), so the cutoff comparison is one pinned IEEE chain
    * on both engines; the z/p machinery is q220's verbatim.
    *
    * Returns the q220 row shape with `discovery` under BY.
    *
    * Scale: identical to BH — one group-keyed agg, |groups|-row
    * scoring, the range-shuffle global rank, two broadcast scalars. */
  def byDiscoveries(df: DataFrame, groupName: String,
      successCond: org.apache.spark.sql.Column,
      qNum: Int = 5, qDen: Int = 100): DataFrame = {
    require(qNum > 0 && qDen > 0 && qNum < qDen, "need 0 < q < 1")
    val g = df.groupBy(col(groupName).as("grp")).agg(
      count(lit(1)).as("n"),
      sum(successCond.cast("long")).as("successes"))
      .localCheckpoint()
    val glob = g.agg(sum(col("n")).as("__tn"),
        sum(col("successes")).as("__ts"), count(lit(1)).as("m"))
      .withColumn("__cn", expr(
        "aggregate(sequence(1L, m), 0L, (acc, i) -> acc + 1000000000L div i)"))
    val scored = g.crossJoin(broadcast(glob))
      .withColumn("__p0", col("__ts").cast("double") / col("__tn").cast("double"))
      .withColumn("__z",
        (col("successes").cast("double") / col("n").cast("double") - col("__p0")) /
          sqrt(col("__p0") * (lit(1.0) - col("__p0")) / col("n").cast("double")))
      .withColumn("__xa", abs(col("__z")) / sqrt(lit(2.0)))
      .withColumn("__t", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("__xa")))
      .withColumn("__p",
        (((((lit(1.061405429) * col("__t") - lit(1.453152027)) * col("__t") +
          lit(1.421413741)) * col("__t") - lit(0.284496736)) * col("__t") +
          lit(0.254829592)) * col("__t")) * exp(-(col("__xa") * col("__xa"))))
    val ranked = Ranking.globalRowNumber(scored, Seq(col("__p"), col("grp")))
      .withColumnRenamed("row_num", "p_rank")
      .withColumn("__pass",
        when(col("__p") <= col("p_rank").cast("double") * qNum * 1e9 /
          qDen / col("m").cast("double") / col("__cn").cast("double"),
          col("p_rank")).otherwise(lit(0L)))
    val cutoff = ranked.agg(max(col("__pass")).as("__k"))
    ranked.crossJoin(broadcast(cutoff))
      .select(col("grp").as(groupName), col("n"), col("successes"),
        expr("(successes * 1000000L) div n").as("rate_ppm"),
        round(col("__z") * 1000, 0).cast("long").as("z_milli"),
        round(col("__p") * 1e9, 0).cast("long").as("p_nano"),
        col("p_rank"),
        (col("p_rank") <= col("__k")).as("discovery"))
      .orderBy(col("p_rank"))
  }

  /** A-stat — Holm step-down multiple-testing control (Holm 1979):
    * the FWER companion to [[bhDiscoveries]]'s FDR step-up, sharing
    * its per-group z/p machinery (same A&S 7.1.26 erfc polynomial,
    * mirrored in the oracle). Sort p ascending; reject hypothesis at
    * rank i only while p_(j) ≤ α/(m−j+1) for EVERY j ≤ i — the first
    * failure stops everything after it (step-DOWN), which is what
    * makes Holm valid with no independence assumption at all.
    *
    * Returns the q220 row shape with `discovery` under Holm.
    *
    * Scale: identical to BH — one group-keyed agg, |groups|-row
    * scoring, the range-shuffle global rank, and the first-failure
    * rank broadcast back as one scalar. */
  def holmDiscoveries(df: DataFrame, groupName: String,
      successCond: org.apache.spark.sql.Column,
      aNum: Int = 5, aDen: Int = 100): DataFrame = {
    require(aNum > 0 && aDen > 0 && aNum < aDen, "need 0 < alpha < 1")
    val g = df.groupBy(col(groupName).as("grp")).agg(
      count(lit(1)).as("n"),
      sum(successCond.cast("long")).as("successes"))
      .localCheckpoint()
    val glob = g.agg(sum(col("n")).as("__tn"), sum(col("successes")).as("__ts"),
      count(lit(1)).as("m"))
    val scored = g.crossJoin(broadcast(glob))
      .withColumn("__p0", col("__ts").cast("double") / col("__tn").cast("double"))
      .withColumn("__z",
        (col("successes").cast("double") / col("n").cast("double") - col("__p0")) /
          sqrt(col("__p0") * (lit(1.0) - col("__p0")) / col("n").cast("double")))
      .withColumn("__xa", abs(col("__z")) / sqrt(lit(2.0)))
      .withColumn("__t", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("__xa")))
      .withColumn("__p",
        (((((lit(1.061405429) * col("__t") - lit(1.453152027)) * col("__t") +
          lit(1.421413741)) * col("__t") - lit(0.284496736)) * col("__t") +
          lit(0.254829592)) * col("__t")) * exp(-(col("__xa") * col("__xa"))))
    val ranked = Ranking.globalRowNumber(scored, Seq(col("__p"), col("grp")))
      .withColumnRenamed("row_num", "p_rank")
      // step-down: the cutoff is the FIRST rank whose p exceeds its
      // own threshold α/(m − rank + 1); everything at or after fails
      .withColumn("__fail",
        when(col("__p") > lit(aNum.toDouble) / aDen /
          (col("m") - col("p_rank") + 1).cast("double"), col("p_rank")))
    val firstFail = ranked.agg(
      coalesce(min(col("__fail")), lit(Long.MaxValue)).as("__f"))
    ranked.crossJoin(broadcast(firstFail))
      .select(col("grp").as(groupName), col("n"), col("successes"),
        expr("(successes * 1000000L) div n").as("rate_ppm"),
        round(col("__z") * 1000, 0).cast("long").as("z_milli"),
        round(col("__p") * 1e9, 0).cast("long").as("p_nano"),
        col("p_rank"),
        (col("p_rank") < col("__f")).as("discovery"))
      .orderBy(col("p_rank"))
  }

  graft.plans.Guardrails.expect("cartesian_join",
    "__lnS, __lnP",
    "sbgFit: (K+1)-row count rollup x literal (a,b) lattice",
    "k-literal")

  /** A-stat/E7 — shifted-beta-geometric (sBG) churn model fit by
    * grid-search MLE (Fader & Hardie, "How to Project Customer
    * Retention", J. Interactive Marketing 2007): each customer churns
    * with an individual probability θ ~ Beta(a, b); the death-time
    * pmf follows the closed recursion P(T=1) = a/(a+b),
    * P(T=t) = P(T=1−1)·(b+t−2)/(a+b+t−1), survivors past the horizon
    * contribute S(K) = 1 − ΣP. The fit maximizes the log-likelihood
    * over an (a, b) lattice (gridMax² points at 1/gridDen spacing) —
    * deterministic, no optimizer state, and every engine lands on the
    * SAME lattice point because per-term log-likelihoods quantize to
    * integer micro-nats before the argmax.
    *
    * Input: one row per customer with the death period t ∈ [1, K]
    * (first period NOT renewed) or censored=true for survivors past
    * K. Returns ONE row: (a, b, ll_micro, p1, s_horizon).
    *
    * Scale: the fact pass is ONE rollup to ≤ K+1 (t, censored)
    * counts; the lattice cross join is (K+1)·gridMax² literal-sized
    * rows. The projection model behind every contractual-retention
    * forecast — fit it per segment and the lattice is still tiny. */
  def sbgFit(df: DataFrame, tCol: Column, censoredCol: Column,
      horizon: Int, gridDen: Int = 20, gridMax: Int = 60): DataFrame = {
    require(horizon >= 1 && horizon <= 8, "1 <= horizon <= 8")
    require(gridDen >= 1 && gridMax >= 2, "grid must be non-trivial")
    val counts = df.select(tCol.cast("long").as("__t"),
        censoredCol.cast("boolean").as("__c"))
      .groupBy(col("__t"), col("__c")).agg(count(lit(1)).as("__n"))
    val spark = df.sparkSession
    val grid = spark.range(1, gridMax + 1L).select(col("id").as("__ia"))
      .crossJoin(spark.range(1, gridMax + 1L).select(col("id").as("__ib")))
      .withColumn("__a", col("__ia").cast("double") / gridDen)
      .withColumn("__b", col("__ib").cast("double") / gridDen)
    // unroll the pmf recursion: p1..pK and the survivor mass
    val a = col("__a"); val b = col("__b")
    val ps = (1 to horizon).scanLeft(a / (a + b)) { (prev, t) =>
      // entering step t+1: P(t+1) = P(t)·(b+t−1)/(a+b+t)
      prev * (b + lit(t - 1.0)) / (a + b + lit(t.toDouble))
    }.take(horizon)
    val sK = ps.foldLeft(lit(1.0))((acc, p) => acc - p)
    val withP = grid
      .withColumn("__lnS", log(sK))
      .withColumn("__lnP", array(ps.map(log): _*))
    val scored = counts.crossJoin(withP)
      .withColumn("__ln",
        when(col("__c"), col("__lnS"))
          .otherwise(element_at(col("__lnP"), col("__t").cast("int"))))
      // micro-nat quantized per-term LL: exact integer sums, argmax
      // agrees across engines and partitionings
      .withColumn("__ll_u",
        col("__n") * floor(col("__ln") * 1e6 + 0.5).cast("long"))
    scored.groupBy(col("__ia"), col("__ib"), col("__a"), col("__b"))
      .agg(sum(col("__ll_u")).as("ll_micro"))
      .orderBy(col("ll_micro").desc, col("__ia"), col("__ib"))
      .limit(1)
      .select(col("__a").as("a"), col("__b").as("b"), col("ll_micro"),
        (col("__a") / (col("__a") + col("__b"))).as("p1"))
  }

  /** A-stat — Cochran-Mantel-Haenszel chi-square (continuity-
    * corrected) across 2×2 strata — the TEST companion to
    * [[mantelHaenszelOr]]'s estimate (Mantel & Haenszel 1959):
    * χ²_CMH = (|Σ(a_k − E_k)| − ½)² / Σ V_k with E = r1·c1/n and
    * V = r1·r0·c1·c0 / (n²(n−1)). Per-stratum E and V quantize by
    * integer floor division at micro precision, so both sums are
    * exact; the statistic is one pinned double chain. Returns ONE
    * row: (n_strata, sum_a, sum_e_micro, sum_v_micro, cmh_chi2). */
  def cmhChiSquare(df: DataFrame, stratumCol: Column,
      exposedCol: Column, outcomeCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.select(stratumCol.as("__s"),
        exposedCol.cast("boolean").as("__e"),
        outcomeCol.cast("boolean").as("__o"))
      .groupBy(col("__s"))
      .agg(sum(when(col("__e") && col("__o"), 1L).otherwise(0L)).as("a"),
        sum(when(col("__e") && !col("__o"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("__e") && col("__o"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("__e") && !col("__o"), 1L).otherwise(0L)).as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      // margins: r1 = a+b (exposed), c1 = a+c (outcome)
      .withColumn("__e_u", expr(s"CAST(CAST(a + b AS $d38) * (a + c) " +
        "* 1000000 div n AS BIGINT)"))
      .withColumn("__v_u", expr(
        s"""CAST(CAST(a + b AS $d38) * (c + d) * (a + c) * (b + d)
           | * 1000000 div (CAST(n AS $d38) * n * (n - 1)) AS BIGINT)"""
          .stripMargin))
    cells.agg(count(lit(1)).as("n_strata"), sum(col("a")).as("sum_a"),
        sum(col("__e_u")).as("sum_e_micro"), sum(col("__v_u")).as("sum_v_micro"))
      .withColumn("__dev", greatest(lit(0.0),
        abs(col("sum_a").cast("double") -
          col("sum_e_micro").cast("double") / 1e6) - 0.5))
      .select(col("n_strata"), col("sum_a"), col("sum_e_micro"),
        col("sum_v_micro"),
        when(col("sum_v_micro") > 0,
          col("__dev") * col("__dev") /
            (col("sum_v_micro").cast("double") / 1e6)).as("cmh_chi2"))
  }

  /** Difference-in-differences (Card & Krueger 1994 canonical form —
    * public literature): the causal workhorse when treatment was NOT
    * randomized — compare the treated group's pre→post change against
    * the control group's, so any shared trend subtracts out:
    *   DiD = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre).
    *
    * Input: unit-grain rows with integer-cent metric, a boolean
    * treated flag and a boolean post flag. One pass computes the four
    * exact cell sums; means and the estimate are a 4-row double finish
    * (dollars, 6dp) mirrored in the oracle.
    *
    * Returns ONE row: (n_t_pre, n_t_post, n_c_pre, n_c_post,
    * mean_t_pre, mean_t_post, mean_c_pre, mean_c_post, did).
    *
    * Scale: one map-side-combinable agg to FOUR groups, then a 4-row
    * pivot — nothing downstream of the fact scan exceeds four rows. */
  def diffInDiff(df: DataFrame, yCents: Column, treatedCond: Column,
      postCond: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.select(yCents.cast("long").as("__y"),
        treatedCond.cast("int").as("__t"), postCond.cast("int").as("__p"))
      .groupBy(col("__t"), col("__p"))
      .agg(count(lit(1)).as("__n"), sum(col("__y").cast(d38)).as("__s"))
    def cell(t: Int, p: Int, alias: String) = Seq(
      max(when(col("__t") === t && col("__p") === p, col("__n")))
        .as(s"n_$alias"),
      max(when(col("__t") === t && col("__p") === p,
        col("__s").cast("double") / col("__n") / 100.0)).as(s"mean_$alias"))
    val aggs = cell(1, 0, "t_pre") ++ cell(1, 1, "t_post") ++
      cell(0, 0, "c_pre") ++ cell(0, 1, "c_post")
    cells.agg(aggs.head, aggs.tail: _*)
      .select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
        round(col("mean_t_pre"), 6).as("mean_t_pre"),
        round(col("mean_t_post"), 6).as("mean_t_post"),
        round(col("mean_c_pre"), 6).as("mean_c_pre"),
        round(col("mean_c_post"), 6).as("mean_c_post"),
        round((col("mean_t_post") - col("mean_t_pre")) -
          (col("mean_c_post") - col("mean_c_pre")), 6).as("did"))
  }

  /** Experiment power planning: absolute minimum detectable effect on
    * a conversion rate, per stratum — "with this many units split
    * 50/50, how small a lift could we even see?" The sizing question
    * every experiment review asks FIRST, answered from data already
    * in the warehouse.
    *
    *   MDE ≈ (z_{1−α/2} + z_{power}) · √(2·p·(1−p)/(n/2))
    *
    * z-values are LITERAL constants (α = 5% two-sided → 1.959964,
    * power = 80% → 0.841621 — the Benford/NDCG literal-table
    * discipline), so the finish touches only ×, ÷ and √, ALL
    * correctly-rounded IEEE operations: both engines produce
    * identical doubles with no libm exposure.
    *
    * Returns per stratum: (stratum, n, positives, p (6dp), mde_ppm).
    *
    * Scale: one stratum-keyed agg over the fact table; the finish is
    * |strata|-sized. */
  def mdeByStratum(df: DataFrame, stratumCol: Column,
      successCond: Column): DataFrame = {
    val zSum = 1.959964 + 0.841621 // z_0.975 + z_0.80, literal
    df.select(stratumCol.as("stratum"), successCond.cast("long").as("__y"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("positives"))
      .withColumn("__p", col("positives").cast("double") / col("n").cast("double"))
      .withColumn("p", round(col("__p"), 6))
      .withColumn("mde_ppm",
        round(lit(zSum) * sqrt(lit(2.0) * col("__p") * (lit(1.0) - col("__p")) /
          (col("n").cast("double") / 2.0)) * 1e6, 0).cast("long"))
      .select(col("stratum"), col("n"), col("positives"), col("p"),
        col("mde_ppm"))
  }

  /** Inverse-propensity-scored off-policy evaluation (Horvitz-Thompson
    * estimator; Li et al. WWW'11 replay evaluation — public
    * literature): estimate what reward a NEW deterministic policy
    * would have earned from logs collected under a randomized logging
    * policy — the offline gate for router/ranker changes (e.g. "send
    * this prompt to which model?") before any live traffic.
    *
    *   V̂(π) = (1/N) Σ r · 1[π(x) = a_logged] / p_log(a_logged)
    *
    * Input: one row per logged decision with the logged arm, the
    * target policy's arm, an integer reward and the logging
    * propensity as an exact PPM integer. The estimator is then fully
    * integer: Σ r·match·10⁶·10⁶/p_ppm in exact decimal, one integral
    * divide by N — bit-identical on any engine.
    *
    * Returns ONE row: (n, matches, matched_reward, value_ppm,
    * naive_value_ppm) — naive = logged-policy mean reward, the number
    * V̂ must beat.
    *
    * Scale: a single map-side-combinable global agg; no shuffle wider
    * than one row. The variance caveat of IPS (rare-match blowup) is
    * visible in `matches` — a small count means the estimate is
    * noise, exactly as in production OPE. */
  def ipsPolicyValue(df: DataFrame, loggedArm: Column, targetArm: Column,
      reward: Column, propensityPpm: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    df.select(loggedArm.cast("long").as("__a"),
        targetArm.cast("long").as("__pi"),
        reward.cast("long").as("__r"),
        propensityPpm.cast("long").as("__p"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__a") === col("__pi"), 1L).otherwise(0L)).as("matches"),
        sum(when(col("__a") === col("__pi"), col("__r")).otherwise(0L))
          .as("matched_reward"),
        sum(when(col("__a") === col("__pi"),
          // r · 10⁶ (ppm out) · 10⁶ / p_ppm, floor-divided exactly
          expr("(cast(__r as decimal(38,0)) * 1000000 * 1000000) div __p")
            .cast(d38)).otherwise(lit(0L).cast(d38))).as("__w"),
        sum(col("__r").cast(d38)).as("__sr"))
      .select(col("n"), col("matches"), col("matched_reward"),
        expr("cast(__w div n as bigint)").as("value_ppm"),
        expr("cast((__sr * 1000000) div n as bigint)").as("naive_value_ppm"))
  }

  /** Self-normalized IPS off-policy value (SNIPS — Swaminathan &
    * Joachims NIPS'15, the weighted-importance-sampling estimator of
    * Precup et al. 2000): divide the importance-weighted reward by
    * the importance-weight SUM instead of N —
    *   V̂_SNIPS = Σ w·r·1[match] / Σ w·1[match],  w = 1/p_log
    * — biased but vastly lower-variance than plain IPS when matches
    * are rare, and invariant to reward shifts. Runs beside [[
    * ipsPolicyValue]] on identical inputs so the IPS/SNIPS gap itself
    * is the variance diagnostic.
    *
    * Determinism: weights are the exact integers 10⁶·10⁶ div p_ppm;
    * both sums accumulate in decimal(38,0); the SNIPS point estimate
    * is one exact integral floor-divide to ppm; Kish's effective
    * sample size of the matched weights, ESS = (Σw)²/Σw², is a
    * pinned-order double over exact integers.
    *
    * Returns ONE row: (n, matches, value_snips_ppm, value_ips_ppm,
    * ess_w) — ess_w ≪ matches means a few huge weights own the
    * estimate and neither number should be trusted.
    *
    * Scale: a single map-side-combinable global agg, one output row —
    * the same shuffle-free shape as IPS. */
  def snipsPolicyValue(df: DataFrame, loggedArm: Column, targetArm: Column,
      reward: Column, propensityPpm: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    df.select(loggedArm.cast("long").as("__a"),
        targetArm.cast("long").as("__pi"),
        reward.cast("long").as("__r"),
        propensityPpm.cast("long").as("__p"))
      .withColumn("__w", when(col("__a") === col("__pi"),
        expr("(cast(1000000 as decimal(38,0)) * 1000000) div __p").cast(d38))
        .otherwise(lit(0L).cast(d38)))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__a") === col("__pi"), 1L).otherwise(0L)).as("matches"),
        sum((col("__w") * col("__r").cast(d38)).cast(d38)).as("__wr"),
        sum(col("__w")).as("__sw"),
        sum((col("__w") * col("__w")).cast(d38)).as("__sw2"))
      .select(col("n"), col("matches"),
        when(col("__sw") =!= 0,
          expr("cast((__wr * 1000000) div __sw as bigint)"))
          .as("value_snips_ppm"),
        expr("cast(__wr div n as bigint)").as("value_ips_ppm"),
        // square in DOUBLE (not decimal): (Σw)² can exceed 38 digits
        // at extreme N, and ESS is a diagnostic, not a hash target
        when(col("__sw2") =!= 0,
          col("__sw").cast("double") * col("__sw").cast("double") /
            col("__sw2").cast("double")).as("ess_w"))
  }

  /** Post-stratification / direct standardization (classic survey +
    * causal adjustment — Cochran 1977, public literature): the
    * stratum-weighted treatment effect when assignment is only
    * ignorable WITHIN strata. Each stratum contributes its arm-mean
    * gap weighted by its population share:
    *   ATE = Σ_s (n_s/N) · (ȳ_t,s − ȳ_c,s)
    *
    * Exact integer-cent sums per (stratum, arm); each stratum's
    * weighted term is quantized to integer micro-dollars and the
    * terms sum as longs (order-independent); per-stratum means are a
    * double finish. Strata missing an arm are excluded from the
    * effect (and flagged by null means).
    *
    * Returns per stratum: (stratum, n, n_t, n_c, mean_t, mean_c,
    * diff, ate_micro) with `ate_micro` the dataset-level constant.
    *
    * Scale: one (stratum, arm) agg over the fact table + a
    * |strata|-row finish; the scalar ATE broadcasts back. */
  def stratifiedAte(df: DataFrame, stratumCol: Column, yCents: Column,
      treatedCond: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.select(stratumCol.as("stratum"),
        treatedCond.cast("int").as("__t"), yCents.cast("long").as("__y"))
      .groupBy(col("stratum"), col("__t"))
      .agg(count(lit(1)).as("__n"), sum(col("__y").cast(d38)).as("__s"))
    val strata = cells.groupBy(col("stratum")).agg(
        sum(col("__n")).as("n"),
        max(when(col("__t") === 1, col("__n"))).as("n_t"),
        max(when(col("__t") === 0, col("__n"))).as("n_c"),
        max(when(col("__t") === 1, col("__s"))).as("__st"),
        max(when(col("__t") === 0, col("__s"))).as("__sc"))
      .withColumn("mean_t",
        round(col("__st").cast("double") / col("n_t") / 100.0, 6))
      .withColumn("mean_c",
        round(col("__sc").cast("double") / col("n_c") / 100.0, 6))
      .withColumn("diff",
        round(col("__st").cast("double") / col("n_t") / 100.0 -
          col("__sc").cast("double") / col("n_c") / 100.0, 6))
      .localCheckpoint() // |strata| rows; read by the ATE rollup + output
    val tot = strata.filter(col("n_t").isNotNull && col("n_c").isNotNull)
      .withColumn("__term_micro", round(
        col("n").cast("double") *
          (col("__st").cast("double") / col("n_t") / 100.0 -
            col("__sc").cast("double") / col("n_c") / 100.0) * 1e6, 0)
        .cast("long"))
      .agg(sum(col("__term_micro")).as("__tm"), sum(col("n")).as("__tn"))
      .select(expr("__tm div __tn").as("ate_micro"))
    strata.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n"), col("n_t"), col("n_c"),
        col("mean_t"), col("mean_c"), col("diff"), col("ate_micro"))
  }

  /** A-stat/ML — UCB1 bandit scoring of logged arm outcomes: for each
    * arm, mean reward plus the optimism bonus √(2·ln T / nᵢ) (Auer,
    * Cesa-Bianchi & Fischer, "Finite-time Analysis of the Multiarmed
    * Bandit Problem", MLJ 2002 — public literature). Deterministic —
    * this is the SCORING step a batch re-ranker runs over yesterday's
    * logs to pick today's allocation; no randomness lives here. All
    * counts are exact; mean and bonus are pinned IEEE finishes,
    * reported ppm-rounded. Returns per arm:
    * (arm, pulls, wins, mean_ppm, ucb_ppm, ucb_rank).
    *
    * Scale: one arm-grain agg with map-side combine, a 1-row total
    * broadcast, an |arms|-row window. The fact table is read once. */
  def ucb1(df: DataFrame, armCol: Column, rewardCond: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val arms = df.groupBy(armCol.as("arm")).agg(
      count(lit(1)).as("pulls"),
      sum(when(rewardCond, 1L).otherwise(0L)).as("wins"))
    val tot = arms.agg(sum(col("pulls")).as("__t"))
    arms.crossJoin(broadcast(tot))
      .withColumn("mean_ppm", round(col("wins").cast("double") /
        col("pulls").cast("double") * 1e6, 0).cast("long"))
      .withColumn("ucb_ppm", round((col("wins").cast("double") /
        col("pulls").cast("double") +
        sqrt(lit(2.0) * log(col("__t").cast("double")) /
          col("pulls").cast("double"))) * 1e6, 0).cast("long"))
      .withColumn("ucb_rank", row_number().over(
        Window.orderBy(col("ucb_ppm").desc, col("arm"))).cast("long"))
      .select(col("arm"), col("pulls"), col("wins"), col("mean_ppm"),
        col("ucb_ppm"), col("ucb_rank"))
  }

  /** A-stat — group-sequential monitoring with an O'Brien–Fleming-
    * shaped spending boundary: the experiment readout is CHECKED at K
    * interim looks, and the two-proportion z at look k must clear
    *   boundary(k) = z_final · √(K/k)
    * (conservative early, nominal at the end — the OBF shape; Pocock/
    * OBF group-sequential designs, public literature) before anyone
    * stops early. Inputs are unit-grain exposures with an arm flag, a
    * success condition and an integer look index; counts cumulate over
    * a |looks|-sized rollup window, z is the pooled two-proportion
    * statistic — one pinned IEEE finish per look over exact cumulative
    * counts, emitted UNROUNDED (the q186 discipline: divide, multiply
    * and sqrt are exactly specified by IEEE-754, so a pinned op order
    * hash-matches across engines; round-to-decimals is the one
    * non-portable finish and is banned here). Returns per look:
    * (look, n_a, n_b, conv_a, conv_b, z, boundary, crossed).
    *
    * Scale: one (look, arm) agg with map-side combine; the cumulative
    * window runs over the K-row rollup, never the exposures. */
  def sequentialBoundary(df: DataFrame, lookCol: Column, armACond: Column,
      successCond: Column, zFinal: Double = 1.96): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val looks = df.groupBy(lookCol.cast("long").as("look")).agg(
      sum(when(armACond, 1L).otherwise(0L)).as("__na"),
      sum(when(!armACond, 1L).otherwise(0L)).as("__nb"),
      sum(when(armACond && successCond, 1L).otherwise(0L)).as("__ca"),
      sum(when(!armACond && successCond, 1L).otherwise(0L)).as("__cb"))
    val cum = Window.orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val pa = col("n_a").cast("double")
    val pb = col("n_b").cast("double")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") / (pa + pb)
    looks
      .withColumn("n_a", sum(col("__na")).over(cum))
      .withColumn("n_b", sum(col("__nb")).over(cum))
      .withColumn("conv_a", sum(col("__ca")).over(cum))
      .withColumn("conv_b", sum(col("__cb")).over(cum))
      .withColumn("__k", row_number().over(Window.orderBy(col("look"))))
      .withColumn("__kmax", count(lit(1)).over(all))
      .withColumn("z",
        (col("conv_a").cast("double") / pa - col("conv_b").cast("double") / pb) /
          sqrt(pooled * (lit(1.0) - pooled) * (lit(1.0) / pa + lit(1.0) / pb)))
      .withColumn("boundary", lit(zFinal) *
        sqrt(col("__kmax").cast("double") / col("__k").cast("double")))
      .withColumn("crossed", abs(col("z")) >= col("boundary"))
      .select(col("look"), col("n_a"), col("n_b"), col("conv_a"),
        col("conv_b"), col("z"), col("boundary"), col("crossed"))
  }

  /** A-stat — Population Stability Index (the standard credit-risk /
    * model-monitoring drift score; public literature, e.g. Siddiqi,
    * "Credit Risk Scorecards" 2006):
    *   PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)
    * between a REFERENCE slice and a CURRENT slice of the same
    * population, over caller-computed integer bins in [0, nBins).
    * Rule-of-thumb readout: <0.1 stable, 0.1–0.25 drifting, >0.25
    * shifted — the distribution-level alarm a JSD (q218) gives for
    * token text, here for any binned numeric.
    *
    * Determinism contract: bins are densified from a literal frame so
    * both engines see all nBins rows; counts get add-one (Laplace)
    * smoothing so empty bins contribute finite terms with NO epsilon
    * tuning; p and q are each ONE double division and the per-bin term
    * is nano-quantized (the [[graft.ext.TextAnalysis.jsDivergence]]
    * discipline) before the integer sum, so the total is identical on
    * any engine and any partitioning.
    *
    * Returns one row per bin: (bin, ref_n, cur_n, term_nano, psi) with
    * `psi` the broadcast total on every row.
    *
    * Scale: one conditional-count agg over the fact table (map-side
    * combine) → an nBins-row frame for everything after; the audit
    * costs one scan at any volume. */
  def psi(df: DataFrame, binCol: Column, sliceCol: Column,
      refSlice: String, curSlice: String, nBins: Int): DataFrame = {
    require(nBins >= 2, "psi needs >= 2 bins")
    val obs = df.filter(sliceCol.isin(refSlice, curSlice))
      .select(binCol.cast("long").as("bin"), sliceCol.as("__s"))
      .groupBy(col("bin")).agg(
        sum(when(col("__s") === refSlice, 1L).otherwise(0L)).as("__r"),
        sum(when(col("__s") === curSlice, 1L).otherwise(0L)).as("__c"))
    val frame = df.sparkSession.range(nBins).select(col("id").as("bin"))
    val cells = frame.join(obs, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("__r"), lit(0L)).as("ref_n"),
        coalesce(col("__c"), lit(0L)).as("cur_n"))
      .localCheckpoint() // nBins rows; totals + the term pass both read it
    val tot = cells.agg(sum(col("ref_n")).as("__nr"),
      sum(col("cur_n")).as("__nc"))
    // p, q and both logs are evaluated in this exact token order in the
    // oracle SQL — per-bin rounding is what makes the sum portable
    val terms = cells.crossJoin(broadcast(tot))
      .withColumn("__p", (col("ref_n") + 1).cast("double") /
        (col("__nr") + nBins).cast("double"))
      .withColumn("__q", (col("cur_n") + 1).cast("double") /
        (col("__nc") + nBins).cast("double"))
      .withColumn("term_nano", round((col("__p") - col("__q")) *
        (log(col("__p")) - log(col("__q"))) * 1e9, 0).cast("long"))
      .localCheckpoint() // nBins rows; total + output both read it
    val s = terms.agg(sum(col("term_nano")).as("__s_nano"))
    terms.crossJoin(broadcast(s))
      .select(col("bin"), col("ref_n"), col("cur_n"), col("term_nano"),
        round(col("__s_nano").cast("double") / 1e9, 6).as("psi"))
  }

  /** A-stat — raking / iterative proportional fitting (Deming &
    * Stephan, Ann. Math. Stat. 1940 — public literature): reweight a
    * CURRENT 2-way contingency table so its weighted marginals match
    * a REFERENCE slice's marginals — the survey-style
    * post-stratification fix for "this week's traffic mix is skewed
    * against baseline" that [[stratifiedAte]]'s single-factor strata
    * can't express (two factors need IPF).
    *
    * Determinism contract: weights live in integer micro-units; each
    * normalization step is w' = (w·target·1e6) div marginal_sum in
    * DECIMAL(38,0) — an integral divide, so the whole fixed-`rounds`
    * trajectory (row step then column step per round, no convergence
    * test) replays in an unrolled oracle exactly. Cells with no
    * reference counterpart on a margin get target 0 → weight 0,
    * declared. Returns per current cell:
    * (row_key, col_key, n, weight_micro) — weight_micro/1e6 is the
    * raked expected count.
    *
    * Scale: the table is (rows × cols) grain — domain-bounded; each
    * step is one margin-keyed agg + broadcast-back over that rollup.
    * The fact table is scanned once per slice. */
  def rakeToMarginals(df: DataFrame, rowCol: Column, colCol: Column,
      sliceCol: Column, refSlice: String, curSlice: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds >= 1")
    val cur = df.filter(sliceCol === curSlice)
      .groupBy(rowCol.as("__r"), colCol.as("__c"))
      .agg(count(lit(1)).as("n"))
    val ref = df.filter(sliceCol === refSlice)
    val rowT = ref.groupBy(rowCol.as("__r")).agg(count(lit(1)).as("__rt"))
    val colT = ref.groupBy(colCol.as("__c")).agg(count(lit(1)).as("__ct"))
    var w = cur
      .join(broadcast(rowT), Seq("__r"), "left")
      .join(broadcast(colT), Seq("__c"), "left")
      .withColumn("__rt", coalesce(col("__rt"), lit(0L)))
      .withColumn("__ct", coalesce(col("__ct"), lit(0L)))
      .withColumn("__w", col("n") * 1000000L)
      .localCheckpoint() // table grain; each step re-reads it
    var i = 0
    while (i < rounds) {
      val rs = w.groupBy(col("__r")).agg(sum(col("__w")).as("__rs"))
      w = w.join(broadcast(rs), Seq("__r"))
        .withColumn("__w", when(col("__rs") > 0, expr(
          "cast((cast(__w as decimal(38,0)) * __rt * 1000000) div __rs" +
            " as bigint)")).otherwise(0L))
        .drop("__rs").localCheckpoint()
      val cs = w.groupBy(col("__c")).agg(sum(col("__w")).as("__cs"))
      w = w.join(broadcast(cs), Seq("__c"))
        .withColumn("__w", when(col("__cs") > 0, expr(
          "cast((cast(__w as decimal(38,0)) * __ct * 1000000) div __cs" +
            " as bigint)")).otherwise(0L))
        .drop("__cs").localCheckpoint()
      i += 1
    }
    w.select(col("__r").as("row_key"), col("__c").as("col_key"), col("n"),
      col("__w").as("weight_micro"))
  }

  /** A-causal — DOUBLY-ROBUST off-policy value (Robins, Rotnitzky &
    * Zhao 1994; Dudík, Langford & Li, ICML'11 for the bandit form —
    * public literature): estimate what a TARGET policy would earn from
    * LOGGED data, combining the direct model (q̂) with an inverse-
    * propensity correction on matching actions:
    *   V̂_DR = mean[ q̂(x, π(x)) + 1{a = π(x)}/p(a|x) · (r − q̂(x, a)) ]
    * — unbiased if EITHER the model or the propensities are right,
    * where [[ipsPolicyValue]] needs the propensities alone.
    *
    * Determinism contract: rewards and model scores arrive in integer
    * micro-units, propensities in ppm; each unit's correction floors
    * ONCE ((r − q̂_logged)·10⁶ div p_ppm), sums are exact, the three
    * means divide once each. Returns one row:
    * (n, dm_micro, ips_micro, dr_micro) — direct-method, IPS and DR
    * estimates side by side (they should bracket; wild disagreement
    * means both inputs are suspect).
    *
    * Scale: one unit-grain agg with map-side combine. */
  def doublyRobustValue(df: DataFrame, matchCond: Column,
      propPpmCol: Column, rewardMicroCol: Column,
      qhatTargetMicroCol: Column, qhatLoggedMicroCol: Column): DataFrame = {
    val p = propPpmCol.cast("long")
    val r = rewardMicroCol.cast("long")
    val qt = qhatTargetMicroCol.cast("long")
    val ql = qhatLoggedMicroCol.cast("long")
    df.select(
        qt.as("__qt"),
        when(matchCond, expr(s"((${r.toString} - ${ql.toString}) * 1000000L)" +
          s" div ${p.toString}")).otherwise(0L).as("__corr"),
        when(matchCond, expr(s"(${r.toString} * 1000000L) div ${p.toString}"))
          .otherwise(0L).as("__ips"))
      .agg(count(lit(1)).as("n"),
        expr("sum(__qt) div count(1)").as("dm_micro"),
        expr("sum(__ips) div count(1)").as("ips_micro"),
        expr("(sum(__qt) + sum(__corr)) div count(1)").as("dr_micro"))
  }

  /** A-stat — ANYTIME-VALID CONFIDENCE SEQUENCE for a running mean
    * (Robbins 1970 normal-mixture boundary; Howard, Ramdas, McAuliffe
    * & Sekhon 2021 popularized the practice — public literature): a
    * CI you may look at after EVERY unit with total error ≤ α — the
    * continuous-monitoring answer where q236 fixes K looks and q325
    * fixes two hypotheses. Radius at look n:
    *   r_n = σ̂ · √( ((n + ρ)/n²) · ln((n + ρ)/(ρ·α²)) )
    * with ρ a tuning constant (unit default) and σ̂ the RUNNING sample
    * standard deviation from exact cumulative sums.
    *
    * Determinism contract: cumulative counts/sums/squares are exact
    * integers over the look rollup; each look's mean, σ̂ and radius
    * are one pinned IEEE chain, UNROUNDED (q186 discipline). Returns
    * per look: (look, n, mean, radius, ci_lo, ci_hi).
    *
    * Scale: one look-keyed agg; cumulation over the |looks| rollup
    * window (the q236 envelope). */
  def confidenceSequence(df: DataFrame, lookCol: Column, valueCol: Column,
      alpha: Double = 0.05, rho: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    require(rho > 0, "rho > 0")
    val d38 = "decimal(38,0)"
    val looks = df.groupBy(lookCol.cast("long").as("look")).agg(
      count(lit(1)).as("__cn"),
      sum(valueCol.cast("long").cast(d38)).as("__cs"),
      sum((valueCol.cast("long") * valueCol.cast("long")).cast(d38))
        .as("__cq"))
    val cum = Window.orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = col("n").cast("double")
    looks
      .withColumn("n", sum(col("__cn")).over(cum))
      .withColumn("__s", sum(col("__cs")).over(cum))
      .withColumn("__q", sum(col("__cq")).over(cum))
      .withColumn("mean", col("__s").cast("double") / n)
      .withColumn("__sd", sqrt(
        (col("n").cast(d38) * col("__q") - col("__s") * col("__s"))
          .cast("double") /
          (col("n").cast(d38) * (col("n").cast(d38) - 1)).cast("double")))
      .withColumn("radius", col("__sd") * sqrt(
        ((n + rho) / (n * n)) *
          log((n + rho) / lit(rho * alpha * alpha))))
      .withColumn("ci_lo", col("mean") - col("radius"))
      .withColumn("ci_hi", col("mean") + col("radius"))
      .select(col("look"), col("n"), col("mean"), col("radius"),
        col("ci_lo"), col("ci_hi"))
  }

  /** A-causal — COVARIATE BALANCE diagnostics (standardized mean
    * differences; Rosenbaum & Rubin 1985, Austin 2009 — public
    * literature): per covariate,
    *   SMD = (x̄_A − x̄_B) / √((s²_A + s²_B)/2)
    * — the pre-experiment (or post-matching) health check that says
    * whether two arms are comparable BEFORE anyone reads the metric;
    * |SMD| > 0.1 is the conventional imbalance flag.
    *
    * Determinism contract: per-arm moments are exact decimal sums of
    * integer covariates; each SMD is one pinned IEEE chain, emitted
    * UNROUNDED; the flag compares against the 0.1 literal. Returns
    * per covariate: (covariate, n_a, n_b, mean_a, mean_b, smd,
    * imbalanced).
    *
    * Scale: ONE unit-grain agg computes every covariate's six sums
    * (map-side combine); the finish is |covariates|-row arithmetic. */
  def covariateBalance(df: DataFrame, armCol: Column, armA: String,
      armB: String, covariates: Seq[(String, Column)]): DataFrame = {
    require(covariates.nonEmpty, "need at least one covariate")
    val d38 = "decimal(38,0)"
    val base = df.filter(armCol.isin(armA, armB))
      .select(armCol.as("__g") +:
        covariates.map { case (n, c) => c.cast("long").as(s"__x_$n") }: _*)
    val aggs = count(lit(1)).as("__n") +: covariates.flatMap { case (n, _) =>
      Seq(sum(col(s"__x_$n").cast(d38)).as(s"__s_$n"),
        sum((col(s"__x_$n") * col(s"__x_$n")).cast(d38)).as(s"__q_$n"))
    }
    val g = base.groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
      .localCheckpoint()
    val a = g.filter(col("__g") === armA)
    val b = g.filter(col("__g") === armB)
    val j = a.select(col("__n").as("__na") +: covariates.flatMap { case (n, _) =>
        Seq(col(s"__s_$n").as(s"__sa_$n"), col(s"__q_$n").as(s"__qa_$n")) }: _*)
      .crossJoin(broadcast(b.select(col("__n").as("__nb") +:
        covariates.flatMap { case (n, _) =>
          Seq(col(s"__s_$n").as(s"__sb_$n"), col(s"__q_$n").as(s"__qb_$n")) }: _*)))
    covariates.map { case (n, _) =>
      val na = col("__na").cast(d38); val nb = col("__nb").cast(d38)
      val ma = col(s"__sa_$n").cast("double") / col("__na").cast("double")
      val mb = col(s"__sb_$n").cast("double") / col("__nb").cast("double")
      val va = (na * col(s"__qa_$n") - col(s"__sa_$n") * col(s"__sa_$n"))
        .cast("double") / (na * (na - 1)).cast("double")
      val vb = (nb * col(s"__qb_$n") - col(s"__sb_$n") * col(s"__sb_$n"))
        .cast("double") / (nb * (nb - 1)).cast("double")
      j.select(lit(n).as("covariate"),
        col("__na").as("n_a"), col("__nb").as("n_b"),
        ma.as("mean_a"), mb.as("mean_b"),
        ((ma - mb) / sqrt((va + vb) / 2)).as("smd"))
        .withColumn("imbalanced", abs(col("smd")) > 0.1)
    }.reduce(_ unionByName _)
  }

  /** A-causal — QUANTILE TREATMENT EFFECTS (Lehmann/Doksum quantile
    * shift; standard large-sample practice — public literature): the
    * per-quantile difference between two arms' outcome distributions.
    * A mean difference (q186) can hide a policy that helps the median
    * user and hurts the tail; QTE reads the shift where it happens.
    *
    * Determinism contract: quantiles are exact LOWER order statistics
    * from per-arm distinct-value cumulative counts — rank =
    * ⌈n·q⌉ = (n·q_ppm + 999999) div 10⁶, value = min v with
    * cum ≥ rank; the effect is an integer difference. Returns per
    * requested quantile: (q_ppm, n_a, n_b, v_a, v_b, qte).
    *
    * Scale: one (arm, value) agg with map-side combine + arm-
    * partitioned cumulative windows (the q152 envelope). */
  def quantileTreatmentEffects(df: DataFrame, valueCol: Column,
      armCol: Column, armA: String, armB: String,
      qPpms: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qPpms.nonEmpty && qPpms.forall(q => q > 0 && q < 1000000),
      "quantiles must be ppm in (0, 1e6)")
    val perV = df.filter(armCol.isin(armA, armB))
      .select(armCol.as("__g"), valueCol.cast("long").as("__v"))
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
    val wg = Window.partitionBy(col("__g")).orderBy(col("__v"))
    val wAll = Window.partitionBy(col("__g"))
    val cum = perV
      .withColumn("__ct", sum(col("__c")).over(
        wg.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val qCols = qPpms.map { q =>
      min(when(col("__ct") >=
        expr(s"(__n * ${q}L + 999999L) div 1000000L"), col("__v")))
        .as(s"__q$q")
    }
    val aggCols = max(col("__n")).as("__nn") +: qCols
    val perArm = cum.groupBy(col("__g"))
      .agg(aggCols.head, aggCols.tail: _*)
    val a = perArm.filter(col("__g") === armA)
    val b = perArm.filter(col("__g") === armB)
    val joined = a.select(col("__nn").as("n_a") +:
        qPpms.map(q => col(s"__q$q").as(s"__qa$q")): _*)
      .crossJoin(broadcast(b.select(col("__nn").as("n_b") +:
        qPpms.map(q => col(s"__q$q").as(s"__qb$q")): _*)))
    qPpms.map { q =>
      joined.select(lit(q).as("q_ppm"), col("n_a"), col("n_b"),
        col(s"__qa$q").as("v_a"), col(s"__qb$q").as("v_b"),
        (col(s"__qa$q") - col(s"__qb$q")).as("qte"))
    }.reduce(_ unionByName _)
  }

  /** A-causal — sharp REGRESSION DISCONTINUITY (Thistlethwaite &
    * Campbell 1960; the local-linear form of Imbens & Lemieux 2008 —
    * public literature): units just below vs just above a cutoff of a
    * running variable identify a treatment effect no A/B test could
    * randomize (eligibility thresholds, score cutoffs, rate limits).
    * Separate OLS of y on (x − cutoff) fit on each side within the
    * bandwidth; the effect is the difference of the two fits AT the
    * cutoff (the intercepts).
    *
    * Determinism contract: per-side moments are exact decimal sums of
    * integer (x − cutoff, y); slopes/intercepts/effect are one pinned
    * IEEE finish (the q188/q305 exact-moment device), emitted
    * UNROUNDED. Returns one row: (n_left, n_right, slope_left,
    * slope_right, y_at_cut_left, y_at_cut_right, effect).
    *
    * Scale: one filtered scan → two 6-sum aggregates with map-side
    * combine; the finish is 1-row arithmetic. */
  def regressionDiscontinuity(df: DataFrame, runningCol: Column,
      outcomeCol: Column, cutoff: Long, bandwidth: Long): DataFrame = {
    require(bandwidth > 0, "bandwidth > 0")
    val d38 = "decimal(38,0)"
    val x = runningCol.cast("long") - cutoff
    val y = outcomeCol.cast("long")
    def s38(c: Column) = sum(c.cast(d38)).cast(d38)
    val sided = df
      .select(x.as("__x"), y.as("__y"))
      .filter(col("__x") >= -bandwidth && col("__x") <= bandwidth)
      .withColumn("__side", when(col("__x") < 0, "l").otherwise("r"))
      .groupBy(col("__side")).agg(
        count(lit(1)).cast(d38).as("__n"),
        s38(col("__x")).as("__sx"), s38(col("__y")).as("__sy"),
        s38(col("__x").cast(d38) * col("__x").cast(d38)).as("__sxx"),
        s38(col("__x").cast(d38) * col("__y").cast(d38)).as("__sxy"))
      .withColumn("__cxx",
        (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast(d38))
      .withColumn("__cxy",
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast(d38))
      .withColumn("__slope",
        col("__cxy").cast("double") / col("__cxx").cast("double"))
      .withColumn("__icept",
        (col("__sy").cast("double") - col("__slope") * col("__sx").cast("double")) /
          col("__n").cast("double"))
    val l = sided.filter(col("__side") === "l")
      .select(col("__n").cast("long").as("n_left"),
        col("__slope").as("slope_left"), col("__icept").as("y_at_cut_left"))
    val r = sided.filter(col("__side") === "r")
      .select(col("__n").cast("long").as("n_right"),
        col("__slope").as("slope_right"), col("__icept").as("y_at_cut_right"))
    l.crossJoin(broadcast(r))
      .withColumn("effect", col("y_at_cut_right") - col("y_at_cut_left"))
      .select(col("n_left"), col("n_right"), col("slope_left"),
        col("slope_right"), col("y_at_cut_left"), col("y_at_cut_right"),
        col("effect"))
  }

  /** A-stat — Wald's SEQUENTIAL PROBABILITY RATIO TEST (Wald 1945 —
    * public literature) for a Bernoulli rate, H0: p = p0 vs
    * H1: p = p1: after every look the cumulative log-likelihood ratio
    *   LLR = s·ln(p1/p0) + f·ln((1−p1)/(1−p0))
    * is compared against ln((1−β)/α) (reject H0) and ln(β/(1−α))
    * (accept H0) — the FULLY sequential design (decision after every
    * look) where [[sequentialBoundary]]'s group-sequential plan fixes
    * K looks in advance. Wald's classic result: expected sample size
    * beats any fixed-n test with the same α/β.
    *
    * Determinism contract: the two LLR increments and both thresholds
    * arrive as CALLER-SUPPLIED integer micro-nats (precomputed from
    * α, β, p0, p1 — ln is libm, so baking it into literals keeps the
    * op engine-portable); cumulative LLR is then an exact integer.
    * `decision` reports the CURRENT state per look; `decided_at` the
    * first crossing (sticky, via a running extremum). Returns per
    * look: (look, n, s, llr_micro, decision, decided).
    *
    * Scale: one (look)-keyed agg; cumulation over the |looks| rollup
    * window (calendar-bounded — the q236 envelope). */
  def sprt(df: DataFrame, lookCol: Column, successCond: Column,
      llrSuccessMicro: Long, llrFailureMicro: Long,
      upperMicro: Long, lowerMicro: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(upperMicro > 0 && lowerMicro < 0,
      "thresholds: upper > 0 > lower (micro-nats)")
    val looks = df.groupBy(lookCol.cast("long").as("look")).agg(
      count(lit(1)).as("__n"),
      sum(when(successCond, 1L).otherwise(0L)).as("__s"))
    val cum = Window.orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    looks
      .withColumn("n", sum(col("__n")).over(cum))
      .withColumn("s", sum(col("__s")).over(cum))
      .withColumn("llr_micro",
        col("s") * llrSuccessMicro + (col("n") - col("s")) * llrFailureMicro)
      .withColumn("decision",
        when(col("llr_micro") >= upperMicro, "reject_h0")
          .when(col("llr_micro") <= lowerMicro, "accept_h0")
          .otherwise("continue"))
      // sticky: decided once ANY previous look crossed either bound
      .withColumn("decided",
        max(when(col("decision") =!= "continue", 1L).otherwise(0L))
          .over(cum) === 1L)
      .select(col("look"), col("n"), col("s"), col("llr_micro"),
        col("decision"), col("decided"))
  }

  /** A-stat — delta-method variance for RATIO METRICS (standard
    * large-sample result; e.g. Deng, Knoblich & Lu, KDD'18 on ratio
    * metrics in A/B systems — public literature): most product metrics
    * are ratios of two unit-level sums (revenue per session, CTR =
    * clicks/views), and treating the ratio as a mean-of-ratios or
    * ignoring the numerator/denominator covariance UNDERSTATES its
    * variance. For each arm, with unit-grain (x, y):
    *   R = ΣY / ΣX,
    *   Var(R) ≈ (s²_y − 2R·s_xy + R²·s²_x) / (n·x̄²),
    * the first-order Taylor (delta-method) expansion. Returns per arm:
    * (arm, n, ratio, se, ci_lo, ci_hi) — UNROUNDED doubles from a
    * pinned op order over exact integer sums (the q186 discipline).
    *
    * Scale: one unit-grain agg with map-side combine per arm — six
    * exact sums; the finish is |arms|-row arithmetic. 100 TB of
    * sessions reduce to one pass. */
  def ratioMetricDelta(units: DataFrame, xCol: Column, yCol: Column,
      armCol: Column, zCrit: Double = 1.96): DataFrame = {
    val d38 = "decimal(38,0)"
    val x = xCol.cast("long")
    val y = yCol.cast("long")
    val g = units.groupBy(armCol.as("arm")).agg(
      count(lit(1)).as("n"),
      sum(x.cast(d38)).as("__sx"),
      sum(y.cast(d38)).as("__sy"),
      sum((x * x).cast(d38)).as("__sxx"),
      sum((x * y).cast(d38)).as("__sxy"),
      sum((y * y).cast(d38)).as("__syy"))
    val nD = col("n").cast("double")
    val nd38 = col("n").cast(d38)
    // exact decimal co-moment numerators; ONE double division each —
    // the oracle evaluates the identical token sequence
    val r = col("__sy").cast("double") / col("__sx").cast("double")
    val varx = (nd38 * col("__sxx") - col("__sx") * col("__sx")).cast("double") /
      (nd38 * (nd38 - 1)).cast("double")
    val vary = (nd38 * col("__syy") - col("__sy") * col("__sy")).cast("double") /
      (nd38 * (nd38 - 1)).cast("double")
    val covxy = (nd38 * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
      (nd38 * (nd38 - 1)).cast("double")
    val mx = col("__sx").cast("double") / nD
    g.withColumn("ratio", r)
      .withColumn("se", sqrt(
        (col("ratio") * col("ratio") * varx - col("ratio") * covxy * 2 + vary) /
          (nD * (mx * mx))))
      .withColumn("ci_lo", col("ratio") - lit(zCrit) * col("se"))
      .withColumn("ci_hi", col("ratio") + lit(zCrit) * col("se"))
      .select(col("arm"), col("n"), col("ratio"), col("se"),
        col("ci_lo"), col("ci_hi"))
  }

  /** A-causal — Coarsened Exact Matching (Iacus, King & Porro,
    * "Causal Inference without Balance Checking: Coarsened Exact
    * Matching", Political Analysis 2012): coarsen the covariates into
    * caller-supplied strata, keep only strata containing BOTH a
    * treated and a control unit, and report each matched stratum's
    * exact arm sums — the order-independent matching scheme (greedy
    * 1:1 nearest-neighbor matching depends on scan order and can
    * never be bit-reproducible on a cluster). Returns one row per
    * MATCHED stratum: (strata..., n_t, n_c, sum_t_cents,
    * sum_c_cents); the ATT is Σ_s n_t·(ȳ_t − ȳ_c) weighted over these
    * rows — left as exact integers so any consumer division happens
    * once, downstream, on audited operands.
    *
    * Scale: one stratum-keyed agg with map-side combine; the
    * both-arms filter is a HAVING over the same rollup — no join, no
    * per-unit pairing state. Matching at 100 TB only works coarsened:
    * the stratum key IS the shuffle key. */
  def cemMatch(df: DataFrame, treated: Column, outcomeCents: Column,
      strata: Seq[(String, Column)]): DataFrame = {
    require(strata.nonEmpty, "need at least one stratum column")
    val keyed = df.select(strata.map { case (n, c) => c.as(n) } ++
      Seq(treated.cast("boolean").as("__t"),
        outcomeCents.cast("long").as("__y")): _*)
    keyed.groupBy(strata.map { case (n, _) => col(n) }: _*)
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("n_t"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("n_c"),
        sum(when(col("__t"), col("__y")).otherwise(0L)).as("sum_t_cents"),
        sum(when(col("__t"), 0L).otherwise(col("__y"))).as("sum_c_cents"))
      .filter(col("n_t") >= 1 && col("n_c") >= 1)
  }

  /** A-causal — score-band uplift (Qini-style) curve (Radcliffe,
    * "Using control groups to target on predicted lift", 2007): bucket
    * units by a targeting score into fixed-width bands, then walk
    * bands from highest score down accumulating treated/control
    * responders; each band's cumulative Qini value
    * q = R_t − R_c·N_t/N_c says how many EXTRA responses targeting
    * down to that band bought vs the control baseline. Value-width
    * bands (score div width) keep banding scan-side and deterministic
    * — rank deciles need a global sort and tie-breaks that cannot be
    * reproduced engine-to-engine. Exact integer counts; the Qini
    * value in micro-units via one cleared-denominator floor division.
    * Returns per band (highest first): (band, n_t, n_c, r_t, r_c,
    * cum_n_t, cum_n_c, cum_r_t, cum_r_c, qini_micro).
    *
    * Scale: one band-keyed agg with map-side combine + a cumulative
    * window over the ≤|bands| rollup. The targeting-policy readout at
    * any unit count. */
  def upliftBands(df: DataFrame, treated: Column, responded: Column,
      score: Column, bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth > 0")
    val d38 = "decimal(38,0)"
    val base = df.select(
        score.cast("long").as("__s"),
        treated.cast("boolean").as("__t"),
        responded.cast("boolean").as("__r"))
      // integer division — a double quotient can flip a band at a
      // boundary for |score| beyond 2^53 (see Binning.jenksBreaks)
      .select(expr(s"__s div $bandWidth").cast("long").as("band"),
        col("__t"), col("__r"))
    val bands = base.groupBy(col("band")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("n_t"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("n_c"),
      sum(when(col("__t") && col("__r"), 1L).otherwise(0L)).as("r_t"),
      sum(when(!col("__t") && col("__r"), 1L).otherwise(0L)).as("r_c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("band").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    bands
      .withColumn("cum_n_t", sum(col("n_t")).over(w))
      .withColumn("cum_n_c", sum(col("n_c")).over(w))
      .withColumn("cum_r_t", sum(col("r_t")).over(w))
      .withColumn("cum_r_c", sum(col("r_c")).over(w))
      .withColumn("qini_micro",
        when(col("cum_n_c") > 0, expr(
          s"""CAST((1000000 * (CAST(cum_r_t AS $d38) * cum_n_c -
             |  CAST(cum_r_c AS $d38) * cum_n_t)) div cum_n_c AS BIGINT)"""
            .stripMargin)))
      .orderBy(col("band").desc)
  }

  /** A-stat — Mantel-Haenszel pooled odds ratio across strata (Mantel
    * & Haenszel 1959): the common-odds-ratio estimate that weights
    * each stratum's 2×2 table by its size —
    * OR_MH = Σ_k a_k·d_k/n_k  /  Σ_k b_k·c_k/n_k — robust to
    * confounding by the stratification variable where the crude
    * (pooled-table) OR is not (Simpson's reversal).
    *
    * Exactness: each stratum term quantizes by integer floor division
    * (a·d·1e6 div n, in decimal(38,0)) so the cross-stratum sums are
    * exact on any engine/partitioning; the single OR division is
    * last. Returns ONE row: (n_strata, sum_ad_micro, sum_bc_micro,
    * or_mh, crude_or) — crude_or from the collapsed table for the
    * Simpson's-reversal comparison.
    *
    * Scale: one conditional-sum agg per stratum key (map-side
    * combine) + a strata-count-sized rollup. */
  def mantelHaenszelOr(df: DataFrame, stratumCol: Column,
      exposedCol: Column, outcomeCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.select(stratumCol.as("__s"),
        exposedCol.cast("boolean").as("__e"),
        outcomeCol.cast("boolean").as("__o"))
      .groupBy(col("__s"))
      .agg(sum(when(col("__e") && col("__o"), 1L).otherwise(0L)).as("a"),
        sum(when(col("__e") && !col("__o"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("__e") && col("__o"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("__e") && !col("__o"), 1L).otherwise(0L)).as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
    cells.agg(count(lit(1)).as("n_strata"),
        sum(expr(s"CAST(CAST(a AS $d38) * d * 1000000 div n AS BIGINT)"))
          .as("sum_ad_micro"),
        sum(expr(s"CAST(CAST(b AS $d38) * c * 1000000 div n AS BIGINT)"))
          .as("sum_bc_micro"),
        sum(col("a")).as("__ta"), sum(col("b")).as("__tb"),
        sum(col("c")).as("__tc"), sum(col("d")).as("__td"))
      .select(col("n_strata"), col("sum_ad_micro"), col("sum_bc_micro"),
        when(col("sum_bc_micro") =!= 0,
          col("sum_ad_micro").cast("double") /
            col("sum_bc_micro").cast("double")).as("or_mh"),
        when((col("__tb").cast(d38) * col("__tc")).cast("double") =!= 0.0,
          (col("__ta").cast(d38) * col("__td")).cast("double") /
            (col("__tb").cast(d38) * col("__tc")).cast("double"))
          .as("crude_or"))
  }

  /** A-stat — the Wald instrumental-variable estimator (Wald 1940;
    * the binary-instrument case of 2SLS, Angrist-Imbens-Rubin 1996):
    * β_IV = (ȳ₁ − ȳ₀) / (x̄₁ − x̄₀) over instrument arms z ∈ {0, 1} —
    * the causal slope of y on x when z moves x but touches y only
    * through x. Integer-valued x and y by contract, so the clearing
    * (Sy₁n₀ − Sy₀n₁)/(Sx₁n₀ − Sx₀n₁) is exact until ONE double
    * division; the first-stage and ITT differences divide by n₁n₀ the
    * same way. Returns ONE row: (n1, n0, beta_iv, first_stage,
    * itt).
    *
    * Scale: a single conditional-sum agg over the joined frame —
    * map-side combined, no per-stratum state. */
  def waldIv(df: DataFrame, instrumentCol: Column, xCol: Column,
      yCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    df.select(instrumentCol.cast("boolean").as("__z"),
        xCol.cast("long").as("__x"), yCol.cast("long").as("__y"))
      .agg(sum(when(col("__z"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("__z"), 1L).otherwise(0L)).as("n0"),
        sum(when(col("__z"), col("__x")).otherwise(0L)).cast(d38).as("__sx1"),
        sum(when(!col("__z"), col("__x")).otherwise(0L)).cast(d38).as("__sx0"),
        sum(when(col("__z"), col("__y")).otherwise(0L)).cast(d38).as("__sy1"),
        sum(when(!col("__z"), col("__y")).otherwise(0L)).cast(d38).as("__sy0"))
      .select(col("n1"), col("n0"),
        when((col("__sx1") * col("n0") - col("__sx0") * col("n1"))
            .cast("double") =!= 0.0,
          (col("__sy1") * col("n0") - col("__sy0") * col("n1"))
            .cast("double") /
          (col("__sx1") * col("n0") - col("__sx0") * col("n1"))
            .cast("double")).as("beta_iv"),
        ((col("__sx1") * col("n0") - col("__sx0") * col("n1"))
          .cast("double") /
          (col("n1").cast(d38) * col("n0")).cast("double"))
          .as("first_stage"),
        ((col("__sy1") * col("n0") - col("__sy0") * col("n1"))
          .cast("double") /
          (col("n1").cast(d38) * col("n0")).cast("double")).as("itt"))
  }
  /** ML/A-stat — two-component 1-D Gaussian mixture fit by EM
    * (Dempster, Laird & Rubin 1977), fixed iteration count, integer-
    * quantized state — the soft-clustering companion to hard k-means
    * (q166): "this latency/spend column is secretly TWO populations;
    * find their weights, means and variances".
    *
    * Determinism contract (the suite's lattice/recursion discipline):
    * the fit runs on the DISTINCT-VALUE rollup (x integer, count c).
    * State is 5 integers: (w1_ppm, mu1, var1, mu2, var2) — means in
    * input units, variances in units², weights in ppm. Per iteration,
    * per distinct value, the log-likelihood gap is assembled from
    * integer terms (quadratic term by exact decimal floor-division;
    * ln terms micro-nat-rounded once per state constant), the
    * responsibility is ONE ppm-rounded logistic of an exact rational,
    * and the M-step is exact decimal sums with truncating division —
    * so every iterate is engine-replayable (a DuckDB recursive CTE
    * reproduces the whole trajectory bit-for-bit, modulo the shared
    * sub-ulp libm risk every micro-nat op in the suite accepts).
    * Init: means at the exact 25th/75th percentile values, both
    * variances at the population variance, weights 1/2 — fully
    * deterministic, no RNG.
    *
    * Degenerate guards, applied identically on both engines: a
    * component whose responsibility mass hits zero keeps its previous
    * (mu, var); variances clamp at >= 1 unit².
    *
    * Returns ONE row: (n, n_distinct, iters, w1_ppm, mu1, var1,
    * w2_ppm, mu2, var2).
    *
    * Scale: ONE fact pass builds the rollup (map-side combine); each
    * EM round is one broadcast-state scan + agg of the rollup; the
    * driver holds a single 5-integer state row per round (the
    * k-means-centroid license). Percentile init is one bounded
    * rollup-sized cumulative window. */
  def gmm2Em(df: DataFrame, valueCol: Column, iters: Int = 4,
      localRollupMax: Long = 500000L): DataFrame = {
    require(iters >= 1 && iters <= 64, "1 <= iters <= 64")
    val d38 = "decimal(38,0)"
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val rk = df.select(valueCol.cast("long").as("__x"))
      .groupBy(col("__x")).agg(count(lit(1)).as("__c"))
      .localCheckpoint() // read iters+2 times
    // DRIVER HISTOGRAM LOOP under a rollup-count gate (the q411/q497
    // audit-slice discipline, opt round 11): the EM state already
    // lives on the driver — the distributed path's only per-round
    // work is one agg JOB over the (value, count) rollup, i.e. pure
    // stage latency when the rollup is modest. Below the gate the
    // histogram is collected ONCE and every round's six exact sums run
    // in BigInt (≡ decimal(38,0), order-free) with the identical
    // libm/floor per-row scoring; above it, the distributed aggs below
    // run unchanged. A spec pins local ≡ distributed.
    val localHist: Option[Array[(Long, Long)]] =
      if (rk.count() <= localRollupMax)
        Some(rk.collect().map(r => (r.getLong(0), r.getLong(1))))
      else None
    // global moments + exact quartile values off the rollup
    val (n, sx, sxx) = localHist match {
      case Some(h) =>
        // same ANSI error surface as the decimal(38,0) agg below:
        // per-product and per-sum d38 checks, long-sum overflow throws
        var nn = 0L; var s1 = BigInt(0); var s2 = BigInt(0)
        h.foreach { case (x, c) =>
          import graft.core.AnsiNum.{d38 => ck}
          nn = graft.core.AnsiNum.add(nn, c)
          s1 = ck(s1 + ck(BigInt(x) * c))
          s2 = ck(s2 + ck(ck(BigInt(x) * x) * c))
        }
        (nn, s1, s2)
      case None =>
        val mom = rk.agg(sum(col("__c")).as("n"),
          sum(col("__x").cast(d38) * col("__c").cast(d38)).cast(d38).as("__sx"),
          sum(col("__x").cast(d38) * col("__x").cast(d38) * col("__c").cast(d38))
            .cast(d38).as("__sxx")).collect()(0)
        (mom.getAs[Long]("n"),
          BigInt(mom.getAs[java.math.BigDecimal]("__sx").toBigInteger),
          BigInt(mom.getAs[java.math.BigDecimal]("__sxx").toBigInteger))
    }
    require(n >= 2, "gmm2Em needs at least 2 rows")
    val var0 = ((BigInt(n) * sxx - sx * sx) / (BigInt(n) * BigInt(n)))
      .max(BigInt(1)).toLong
    val (q1v, q3v) = localHist match {
      case Some(h) =>
        val sorted = h.sortBy(_._1)
        var cum = 0L; var q1: Option[Long] = None; var q3: Option[Long] = None
        sorted.foreach { case (x, c) =>
          cum += c
          if (cum >= (n + 3) / 4 && q1.isEmpty) q1 = Some(x)
          if (cum >= (3 * n + 3) / 4 && q3.isEmpty) q3 = Some(x)
        }
        (q1.get, q3.get)
      case None =>
        val cumW = Window.orderBy(col("__x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val quart = rk.withColumn("__cum", sum(col("__c")).over(cumW))
          .filter(col("__cum") >= (n + 3) / 4)
          .agg(min(col("__x")).as("q1"),
            min(when(col("__cum") >= (3 * n + 3) / 4, col("__x"))).as("q3"))
          .collect()(0)
        (quart.getAs[Long]("q1"), quart.getAs[Long]("q3"))
    }
    var w1 = 500000L
    var mu1 = q1v; var v1 = var0
    var mu2 = q3v; var v2 = var0
    var it = 0
    while (it < iters) {
      // integer log-lik pieces: constants once per state, quadratic
      // per distinct value by exact decimal floor division
      def lnw(w: Long) = math.round(math.log(w.toDouble) * 1e6)
      def logv(v: Long) = math.round(math.log(v.toDouble) * 1e6) / 2
      val c1 = lnw(w1) - logv(v1)
      val c2 = lnw(1000000L - w1) - logv(v2)
      val (r1m, sx1, sxx1, r2m, sx2, sxx2) = localHist match {
        case Some(h) =>
          // identical per-row arithmetic to the expr branch below,
          // INCLUDING the error surface (ADVICE r11): this session runs
          // ANSI mode, so the distributed quadratic THROWS on a long
          // subtraction overflow, on a decimal(38,0) product overflow,
          // and on a long-cast overflow of the divided quadratic — the
          // local path replicates each throw (the PowerKernel zero-mx
          // discipline) instead of silently skipping or wrapping, so
          // the query's outcome never depends on which side of
          // localRollupMax the rollup lands.
          var (a1, b1s, g1, a2, b2s, g2) = (BigInt(0), BigInt(0), BigInt(0),
            BigInt(0), BigInt(0), BigInt(0))
          val d38Max = BigInt(10).pow(38)
          def quad(dx: Long, twoV: Long): Long = {
            val prod = BigInt(dx) * dx * 1000000
            if (prod.abs >= d38Max) throw new ArithmeticException(
              "[NUMERIC_VALUE_OUT_OF_RANGE] decimal(38,0) overflow " +
                "(gmm2Em quadratic) — replicates the ANSI error of the " +
                "distributed branch")
            val q = prod / twoV // BigInt / 0 throws, like ANSI div 0
            if (!q.isValidLong) throw new ArithmeticException(
              "[CAST_OVERFLOW] decimal to long overflow (gmm2Em " +
                "quadratic) — replicates the ANSI error of the " +
                "distributed branch")
            q.toLong
          }
          h.foreach { case (x, c) =>
            val dx1 = graft.core.AnsiNum.sub(x, mu1); val dx2 = graft.core.AnsiNum.sub(x, mu2)
            val q1 = quad(dx1, 2 * v1)
            val q2 = quad(dx2, 2 * v2)
            val dd = graft.core.AnsiNum.sub(graft.core.AnsiNum.sub(c1, q1), graft.core.AnsiNum.sub(c2, q2))
            val r1 = math.floor(
              1e6 / (1.0 + math.exp(-dd.toDouble / 1e6)) + 0.5).toLong
            val cc = BigInt(c)
            import graft.core.AnsiNum.{d38 => ck}
            val cr1 = ck(cc * r1); val crx1 = ck(cr1 * x)
            a1 = ck(a1 + cr1); b1s = ck(b1s + crx1)
            g1 = ck(g1 + ck(crx1 * x))
            val r2 = 1000000L - r1
            val cr2 = ck(cc * r2); val crx2 = ck(cr2 * x)
            a2 = ck(a2 + cr2); b2s = ck(b2s + crx2)
            g2 = ck(g2 + ck(crx2 * x))
          }
          (a1, b1s, g1, a2, b2s, g2)
        case None =>
          val scored = rk
            .withColumn("__q1", expr(
              s"cast((cast(__x - ${mu1}L as $d38) * (__x - ${mu1}L) * 1000000)" +
                s" div ${2 * v1}L as long)"))
            .withColumn("__q2", expr(
              s"cast((cast(__x - ${mu2}L as $d38) * (__x - ${mu2}L) * 1000000)" +
                s" div ${2 * v2}L as long)"))
            .withColumn("__d", (lit(c1) - col("__q1")) - (lit(c2) - col("__q2")))
            // floor(x + 0.5), not round(): identical tie semantics on both
            // engines (math.round ≡ floor(x+0.5) for positive arguments)
            .withColumn("__r1", floor(lit(1e6) /
              (lit(1.0) + exp(-col("__d").cast("double") / 1e6)) + 0.5)
              .cast("long"))
          val s = scored.agg(
            sum(col("__c").cast(d38) * col("__r1").cast(d38)).cast(d38).as("r1"),
            sum(col("__c").cast(d38) * col("__r1").cast(d38) *
              col("__x").cast(d38)).cast(d38).as("sx1"),
            sum(col("__c").cast(d38) * col("__r1").cast(d38) *
              col("__x").cast(d38) * col("__x").cast(d38)).cast(d38).as("sxx1"),
            sum(col("__c").cast(d38) * (lit(1000000L) - col("__r1")).cast(d38))
              .cast(d38).as("r2"),
            sum(col("__c").cast(d38) * (lit(1000000L) - col("__r1")).cast(d38) *
              col("__x").cast(d38)).cast(d38).as("sx2"),
            sum(col("__c").cast(d38) * (lit(1000000L) - col("__r1")).cast(d38) *
              col("__x").cast(d38) * col("__x").cast(d38)).cast(d38).as("sxx2"))
            .collect()(0)
          def big(i: Int) = BigInt(s.getAs[java.math.BigDecimal](i).toBigInteger)
          (big(0), big(1), big(2), big(3), big(4), big(5))
      }
      // variance around the TRUNCATED mean, exactly:
      // Σ r·c·(x−mu')² = sxx − 2·mu'·sx + mu'²·R — avoids the
      // m2 − mu'² bias (≈ 2·mu·frac) the coarse mu grid would inject
      if (r1m > 0) {
        val m = sx1 / r1m
        mu1 = m.toLong
        v1 = math.max(1L,
          ((sxx1 - m * sx1 * 2 + m * m * r1m) / r1m).toLong)
      }
      if (r2m > 0) {
        val m = sx2 / r2m
        mu2 = m.toLong
        v2 = math.max(1L,
          ((sxx2 - m * sx2 * 2 + m * m * r2m) / r2m).toLong)
      }
      w1 = math.min(999999L, math.max(1L, (r1m / BigInt(n)).toLong))
      it += 1
    }
    val nd = rk.count()
    spark.range(1).select(lit(n).as("n"), lit(nd).as("n_distinct"),
      lit(iters.toLong).as("iters"), lit(w1).as("w1_ppm"),
      lit(mu1).as("mu1"), lit(v1).as("var1"),
      lit(1000000L - w1).as("w2_ppm"), lit(mu2).as("mu2"),
      lit(v2).as("var2"))
  }
  /** ML — univariate LOGISTIC REGRESSION fit by fixed-round Newton/IRLS
    * (McCullagh & Nelder, GLMs — public literature): the most-used
    * tabular classifier, fit on the (x, y) distinct-value rollup with
    * integer-quantized state — the gmm2Em determinism discipline.
    *
    * Contract: x integer-valued (quantize upstream; rollup cardinality
    * = |x values| × 2), y ∈ {0, 1}. State is 2 integers
    * (b0_micro, b1_micro) — coefficients in micro-units, start (0, 0).
    * Per iteration, per rollup row: η_micro = b0 + b1·x; p_ppm = ONE
    * ppm-rounded logistic (floor(1e6/(1+exp(−η/1e6)) + 0.5) — identical
    * tie semantics on both engines); weight w_ppm = p(1e6−p) div 1e6.
    * Gradient/Hessian are exact decimal sums over the rollup; the
    * Newton step solves the 2×2 system in exact integer arithmetic
    * (adjugate over determinant, truncating division), so every
    * iterate is engine-replayable — a DuckDB recursive CTE reproduces
    * the whole trajectory bit-for-bit, modulo the shared sub-ulp libm
    * risk every micro-nat op in the suite accepts. Guards, identical
    * on both engines: no step when det ≤ 0 (all-saturated weights);
    * coefficients clamp to ±50e6 micro (|β| ≤ 50 — quasi-separation
    * cannot run the integers away).
    *
    * Returns ONE row: (n, n_distinct, iters, b0_micro, b1_micro).
    *
    * Scale: ONE fact pass builds the rollup (map-side combine); each
    * Newton round is one broadcast-state scan + agg of the rollup; the
    * driver holds a single 2-integer state row per round (the
    * k-means-centroid license). */
  def logisticIrls(df: DataFrame, xCol: Column, yCol: Column,
      iters: Int = 6, localRollupMax: Long = 500000L): DataFrame = {
    require(iters >= 1 && iters <= 64, "1 <= iters <= 64")
    val d38 = "decimal(38,0)"
    val spark = df.sparkSession
    val rk = df.select(xCol.cast("long").as("__x"),
        yCol.cast("int").cast("long").as("__y"))
      .groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("__c"))
      .localCheckpoint() // read iters+1 times
    val n = rk.agg(sum(col("__c")).as("n")).collect()(0).getAs[Long]("n")
    require(n >= 2, "logisticIrls needs at least 2 rows")
    val clamp = 50000000L
    // DRIVER HISTOGRAM LOOP under the rollup-count gate — the gmm2Em
    // rationale verbatim: one collect of the (x, y, count) rollup
    // replaces iters agg jobs of pure stage latency; identical libm
    // logistic, integral divides and BigInt (≡ decimal(38,0)) sums;
    // distributed path unchanged above the gate, spec-pinned equal.
    val localHist: Option[Array[(Long, Long, Long)]] =
      if (rk.count() <= localRollupMax)
        Some(rk.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
      else None
    var b0 = 0L; var b1 = 0L
    var it = 0
    while (it < iters) {
      val (g0, g1, h00, h01, h11) = localHist match {
        case Some(h) =>
          var (a0, a1, b00, b01, b11) =
            (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))
          import graft.core.AnsiNum.{d38 => ck}
          h.foreach { case (x, y, c) =>
            // η = b0 + b1·x with the ANSI error surface (ADVICE r11):
            // the distributed expr throws on long overflow under ANSI,
            // so the local path must too, never wrap; products and sums
            // are d38-checked like the decimal(38,0) agg they replicate
            val p = math.floor(1e6 / (1.0 +
              math.exp(-graft.core.AnsiNum.add(b0, graft.core.AnsiNum.mul(b1, x)).toDouble
                / 1e6)) + 0.5).toLong
            val w = (p * (1000000L - p)) / 1000000L
            val r = y * 1000000L - p
            val cc = BigInt(c)
            val cr = ck(cc * r); val crx = ck(cr * x)
            a0 = ck(a0 + cr); a1 = ck(a1 + crx)
            val cw = ck(cc * w); val cwx = ck(cw * x)
            b00 = ck(b00 + cw); b01 = ck(b01 + cwx)
            b11 = ck(b11 + ck(cwx * x))
          }
          (a0, a1, b00, b01, b11)
        case None =>
          val scored = rk
            .withColumn("__p", floor(lit(1e6) /
              (lit(1.0) + exp(-(lit(b0) + lit(b1) * col("__x"))
                .cast("double") / 1e6)) + 0.5).cast("long"))
            .withColumn("__w", expr("(__p * (1000000L - __p)) div 1000000L"))
            .withColumn("__r", col("__y") * lit(1000000L) - col("__p"))
          val s = scored.agg(
            sum(col("__c").cast(d38) * col("__r").cast(d38)).cast(d38).as("g0"),
            sum(col("__c").cast(d38) * col("__r").cast(d38) *
              col("__x").cast(d38)).cast(d38).as("g1"),
            sum(col("__c").cast(d38) * col("__w").cast(d38)).cast(d38).as("h00"),
            sum(col("__c").cast(d38) * col("__w").cast(d38) *
              col("__x").cast(d38)).cast(d38).as("h01"),
            sum(col("__c").cast(d38) * col("__w").cast(d38) *
              col("__x").cast(d38) * col("__x").cast(d38)).cast(d38).as("h11"))
            .collect()(0)
          def big(i: Int) = BigInt(s.getAs[java.math.BigDecimal](i).toBigInteger)
          (big(0), big(1), big(2), big(3), big(4))
      }
      val det = h00 * h11 - h01 * h01
      if (det > 0) {
        // δ_micro = 1e6·adj(H)·g / det: H is stored at 1e6× natural
        // scale (w in ppm) and g at 1e6× (residual in ppm), so the
        // scales cancel to 1 and the 1e6 factor lands δ in micro-units
        b0 = math.max(-clamp, math.min(clamp,
          b0 + ((BigInt(1000000) * (h11 * g0 - h01 * g1)) / det).toLong))
        b1 = math.max(-clamp, math.min(clamp,
          b1 + ((BigInt(1000000) * (h00 * g1 - h01 * g0)) / det).toLong))
      }
      it += 1
    }
    val nd = rk.count()
    spark.range(1).select(lit(n).as("n"), lit(nd).as("n_distinct"),
      lit(iters.toLong).as("iters"),
      lit(b0).as("b0_micro"), lit(b1).as("b1_micro"))
  }

  /** A-stat/causal — E-VALUE sensitivity analysis (VanderWeele & Ding
    * 2017, Annals of Internal Medicine "Sensitivity analysis in
    * observational research: introducing the E-value" — public
    * literature): the minimum strength of association an UNMEASURED
    * confounder would need with both exposure and outcome to fully
    * explain away an observed risk ratio,
    *   E = RR* + √(RR*·(RR*−1)),  RR* = max(RR, 1/RR).
    * The standard robustness readout attached to every observational
    * effect estimate — "how big a lurking confounder kills this".
    *
    * The 2×2 cells are exact longs; RR* is ONE pinned IEEE division of
    * exact integer products (numerator/denominator swapped when
    * RR < 1, so no reciprocal noise), and the E-value finish is
    * pinned +/×/√ — both engines replay it bit-for-bit (q186
    * discipline). Degenerate margins (no exposed, no unexposed, zero
    * unexposed-outcome risk) yield nulls. Returns one row:
    * (n_ee, n_en, n_ne, n_nn, rr_ppm, evalue).
    *
    * Scale: one conditional-sum agg over the facts; the finish is a
    * 1-row read. */
  def eValue(df: DataFrame, exposure: Column, outcome: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    df.agg(
      sum(when(exposure && outcome, 1L).otherwise(0L)).as("n_ee"),
      sum(when(exposure && !outcome, 1L).otherwise(0L)).as("n_en"),
      sum(when(!exposure && outcome, 1L).otherwise(0L)).as("n_ne"),
      sum(when(!exposure && !outcome, 1L).otherwise(0L)).as("n_nn"))
      .withColumn("rr_ppm",
        when(col("n_ne") + col("n_nn") > 0 &&
          col("n_ee") + col("n_en") > 0 && col("n_ne") > 0,
          // greatest(…, 1): ANSI `div` raises on a zero divisor even
          // inside the unreached CASE branch (codegen evaluates it);
          // the when-guard still nulls the result when n_ne = 0
          expr("(cast(1000000 as decimal(38,0)) * n_ee * (n_ne + n_nn))" +
            " div greatest(cast(n_ne as decimal(38,0)) * (n_ee + n_en)," +
            " cast(1 as decimal(38,0)))")))
      .withColumn("__num",
        (col("n_ee").cast(d38) * (col("n_ne") + col("n_nn")).cast(d38))
          .cast(d38))
      .withColumn("__den",
        (col("n_ne").cast(d38) * (col("n_ee") + col("n_en")).cast(d38))
          .cast(d38))
      .withColumn("__rrs", when(col("__num") > 0 && col("__den") > 0,
        when(col("__num") >= col("__den"),
          col("__num").cast("double") / col("__den").cast("double"))
        .otherwise(
          col("__den").cast("double") / col("__num").cast("double"))))
      .withColumn("evalue",
        when(col("n_ee") > 0 && col("n_ne") > 0 &&
          col("n_en") + col("n_nn") >= 0 && col("__den") > 0 &&
          col("__num") > 0,
          col("__rrs") + sqrt(col("__rrs") * (col("__rrs") - lit(1.0)))))
      .select(col("n_ee"), col("n_en"), col("n_ne"), col("n_nn"),
        col("rr_ppm"), col("evalue"))
  }

  /** A-stat/causal — synthetic-control gap readout (Abadie, Diamond &
    * Hainmueller 2010, JASA; simplex-lattice weight fit): build the
    * counterfactual for ONE treated unit as the convex combination of
    * donor units that best tracks it BEFORE the intervention, then
    * read the post-period actual-minus-synthetic gap as the effect.
    * Weights live on the exact simplex lattice {w ∈ ℕᵏ : Σw = den},
    * so the pre-period SSE of every candidate is an exact integer
    *   SSE(w) = Σ_{t ≤ preEnd} (den·y₀(t) − Σ_d w_d·y_d(t))²
    * and the argmin (ties → lexicographically smallest weight vector)
    * can never flip across engines or partitionings.
    *
    * Returns one row per period: (t, phase 'pre'|'post', actual,
    * synth_scaled, den, gap, w1..wk) — synth = synth_scaled/den,
    * gap = actual − synth as a double from exact integers.
    *
    * Scale: ONE (unit, t) rollup off the fact table (map-side
    * combine); the pivot keys on t alone; the lattice is
    * C(den+k−1, k−1) literal rows (286 at k=4, den=10) cross-joined
    * against the CALENDAR-sized pre frame; everything after is
    * lattice-sized. Donor count is the only combinatorial axis —
    * exactly as in the published method, where donors are hand-picked
    * few. */
  def syntheticControl(df: DataFrame, unitCol: Column, timeCol: Column,
      valueCol: Column, treatedUnit: Long, donorUnits: Seq[Long],
      preEnd: Long, den: Int = 10): DataFrame = {
    require(donorUnits.nonEmpty && donorUnits.size <= 6,
      "1..6 donor units (lattice is C(den+k-1, k-1))")
    require(den >= 2 && den <= 50, "2 <= den <= 50")
    require(!donorUnits.contains(treatedUnit), "treated unit not a donor")
    val d38 = "decimal(38,0)"
    val k = donorUnits.size
    val cells = df.select(unitCol.cast("long").as("__u"),
        timeCol.cast("long").as("__t"), valueCol.cast("long").as("__y"))
      .filter(col("__u") === treatedUnit ||
        col("__u").isin(donorUnits.map(java.lang.Long.valueOf): _*))
      .groupBy(col("__u"), col("__t")).agg(sum(col("__y")).as("__y"))
    val pivotAggs = (sum(when(col("__u") === treatedUnit, col("__y"))
      .otherwise(0L)).as("__y0")) +:
      donorUnits.zipWithIndex.map { case (u, i) =>
        sum(when(col("__u") === u, col("__y")).otherwise(0L)).as(s"__d$i") }
    val byT = cells.groupBy(col("__t"))
      .agg(pivotAggs.head, pivotAggs.tail: _*).localCheckpoint()
    // the exact simplex lattice, lexicographically enumerated
    def combos(rem: Int, slots: Int): Seq[Seq[Int]] =
      if (slots == 1) Seq(Seq(rem))
      else (0 to rem).flatMap(w => combos(rem - w, slots - 1).map(w +: _))
    val lattice = combos(den, k).zipWithIndex.map { case (ws, id) =>
      (id.toLong, ws.map(_.toLong)) }
    val spark = df.sparkSession
    import spark.implicits._
    val latDf = lattice.map { case (id, ws) =>
      (id, ws.head, ws.lift(1).getOrElse(0L), ws.lift(2).getOrElse(0L),
        ws.lift(3).getOrElse(0L), ws.lift(4).getOrElse(0L),
        ws.lift(5).getOrElse(0L))
    }.toDF("__cid", "__w0", "__w1", "__w2", "__w3", "__w4", "__w5")
      .select(col("__cid") +: (0 until k).map(i => col(s"__w$i")): _*)
    val synth = (0 until k).map(i =>
      col(s"__w$i").cast(d38) * col(s"__d$i").cast(d38))
      .reduce(_ + _)
    val err = (col("__y0").cast(d38) * den) - synth
    val best = byT.filter(col("__t") <= preEnd)
      .crossJoin(broadcast(latDf))
      .groupBy(col("__cid"))
      .agg(sum((err * err).cast(d38)).cast(d38).as("__sse"),
        (0 until k).map(i => max(col(s"__w$i")).as(s"__w$i")): _*)
      .agg(min(struct(col("__sse") +: col("__cid") +:
        (0 until k).map(i => col(s"__w$i")): _*)).as("__b"))
      .select((0 until k).map(i => col(s"__b.__w$i").as(s"__w$i")): _*)
      .localCheckpoint()
    byT.crossJoin(broadcast(best))
      .select(Seq(col("__t").as("t"),
        when(col("__t") <= preEnd, "pre").otherwise("post").as("phase"),
        col("__y0").as("actual"),
        synth.cast("long").as("synth_scaled"),
        lit(den.toLong).as("den"),
        (col("__y0").cast("double") -
          synth.cast("long").cast("double") / den).as("gap")) ++
        (0 until k).map(i => col(s"__w$i").as(s"w${i + 1}")): _*)
      .orderBy(col("t"))
  }
  /** A-stat/survey — Neyman optimal allocation for stratified
    * sampling (Neyman 1934): given a total sample budget n, allocate
    *   n_h ∝ N_h·S_h
    * — more samples to big AND volatile strata; the design that
    * minimizes the stratified-mean variance. The sampling plan behind
    * any "eval 100 TB on a 100k-row budget" decision.
    *
    * Determinism: N_h·S_h = √(N_h·Σx² − (Σx)²) EXACTLY (the N_h
    * denominators cancel), so each weight is ONE correctly-rounded
    * sqrt of an exact integer, rounded to an integer unit; the
    * allocation itself is largest-remainder apportionment (the q157
    * device) on exact integer products — sums to n by construction,
    * ties break on stratum order. Returns per stratum:
    * (stratum, n_pop, weight, share_ppm, alloc_n).
    *
    * Scale: one stratum-keyed moment agg with map-side combine; the
    * apportionment runs on the |strata|-row rollup. */
  def neymanAllocation(df: DataFrame, stratumCol: Column, valueCol: Column,
      sampleN: Long): DataFrame = {
    require(sampleN >= 1, "sampleN >= 1")
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val m = df.select(stratumCol.as("stratum"),
        valueCol.cast("long").as("__v"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_pop"),
        sum(col("__v").cast(d38)).cast(d38).as("__s"),
        sum(col("__v").cast(d38) * col("__v").cast(d38)).cast(d38)
          .as("__ss"))
      // weight = floor(sqrt(N·Σx² − (Σx)²) + 0.5): one sqrt of an
      // exact integer — bit-identical across engines
      .withColumn("weight", floor(sqrt(
        (col("n_pop").cast(d38) * col("__ss") - col("__s") * col("__s"))
          .cast("double")) + 0.5).cast("long"))
      .transform(graft.plans.Guardrails.checkpointPinned)
    val tot = m.agg(sum(col("weight")).as("__w"))
    val based = m.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("(weight * 1000000L) div greatest(__w, 1L)"))
      .withColumn("__base", expr(s"(${sampleN}L * weight) div greatest(__w, 1L)"))
      .withColumn("__rem", expr(s"(${sampleN}L * weight) % greatest(__w, 1L)"))
    val short = based.agg((lit(sampleN) - sum(col("__base"))).as("__short"))
    based.crossJoin(broadcast(short))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, col("stratum"))))
      .withColumn("alloc_n",
        col("__base") + when(col("__rk") <= col("__short"), 1L).otherwise(0L))
      .select(col("stratum"), col("n_pop"), col("weight"),
        col("share_ppm"), col("alloc_n"))
      .orderBy(col("stratum"))
  }

  /** A-stat/uplift — Qini curve + coefficient (Radcliffe 2007, "Using
    * control groups to target on predicted lift"): rank units by a
    * targeting score, and at each decile read the INCREMENTAL
    * conversions the model's targeting has earned over the control
    * baseline,
    *   g(t) = Y_T(t) − Y_C(t)·N_T(t)/N_C(t),
    * then the Qini coefficient = area between the curve and the
    * random-targeting diagonal. The uplift-model acceptance metric
    * (complements q358's uplift bands with the single ranking-quality
    * number).
    *
    * Determinism: ranks come from the range-shuffle global row number
    * over a TOTAL order (score, id); deciles are exact integer
    * buckets (rank−1)·10 div N; g is micro-quantized with one
    * truncating division per decile; the trapezoid area and diagonal
    * subtraction are exact integer algebra on those 10 values.
    *
    * Returns one row per decile d = 1..10: (decile, n_t, n_c, y_t,
    * y_c, qini_micro) plus the constant (auq_micro, qini_coef_micro).
    *
    * Scale: one global range-shuffle rank over UNITS (not facts), a
    * 10-row rollup, then driver-free integer finishes. */
  def qiniCurve(df: DataFrame, scoreCol: Column, idCol: Column,
      treatedCond: Column, outcomeCond: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val units = df.select(scoreCol.cast("long").as("__sc"),
      idCol.cast("long").as("__id"),
      treatedCond.cast("long").as("__tr"),
      outcomeCond.cast("long").as("__y"))
    val ranked = Ranking.globalRowNumber(units,
      Seq(col("__sc").desc, col("__id")))
      .withColumnRenamed("row_num", "__rn")
    val n = ranked.agg(count(lit(1)).as("__n"))
    val dec = ranked.crossJoin(broadcast(n))
      .withColumn("__d", expr("((__rn - 1) * 10) div __n + 1"))
      .groupBy(col("__d").as("decile"))
      .agg(sum(col("__tr")).as("n_t"),
        sum(lit(1L) - col("__tr")).as("n_c"),
        sum(col("__tr") * col("__y")).as("y_t"),
        sum((lit(1L) - col("__tr")) * col("__y")).as("y_c"))
    val cum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = dec
      .withColumn("__cnt", sum(col("n_t")).over(cum))
      .withColumn("__cnc", sum(col("n_c")).over(cum))
      .withColumn("__cyt", sum(col("y_t")).over(cum))
      .withColumn("__cyc", sum(col("y_c")).over(cum))
      .withColumn("qini_micro", expr(
        s"""1000000L * __cyt - cast(cast(1000000 as $d38) * __cyc * __cnt
           | div greatest(__cnc, 1L) as long)""".stripMargin))
      .localCheckpoint()
      // deciles live in [1,10] so this is a no-op — it re-attaches the
      // 10-row maxRows bound the checkpoint's LogicalRDD erased, so
      // the trapezoid lag window below is STRUCTURALLY provable
      // rollup-sized (Guardrails.verifyWindowClaims)
      .limit(10)
    // trapezoid area over the 10 deciles (Δt = 1/10, g(0) = 0) minus
    // the random diagonal's triangle (g(1)/2): exact integer algebra
    val area = g
      .withColumn("__gprev", coalesce(lag(col("qini_micro"), 1).over(
        Window.orderBy(col("decile"))), lit(0L)))
      .agg(sum(expr("(__gprev + qini_micro)")).as("__trap2"),
        max(when(col("decile") === 10, col("qini_micro"))).as("__g10"))
      .select(expr("__trap2 div 20").as("auq_micro"),
        expr("__trap2 div 20 - __g10 div 2").as("qini_coef_micro"))
    g.crossJoin(broadcast(area))
      .select(col("decile"), col("n_t"), col("n_c"), col("y_t"),
        col("y_c"), col("qini_micro"), col("auq_micro"),
        col("qini_coef_micro"))
      .orderBy(col("decile"))
  }
}
