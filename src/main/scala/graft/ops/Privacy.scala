package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification-risk audits over quasi-identifier groupings —
  * the release gates run before a derived dataset (or a training
  * corpus with user-derived fields) leaves the pipeline. Complements
  * the PII surface in `graft.ext.TextAnalysis` (q72 redaction, q194
  * redaction evaluation): those find identifiers INSIDE text, these
  * measure how identifying the STRUCTURED columns are in combination
  * (Sweeney, "k-anonymity: a model for protecting privacy", IJUFKS
  * 2002; Machanavajjhala et al., "l-diversity", ICDE'06 — public
  * literature).
  *
  * All outputs are exact integers / exact-ppm integer quotients —
  * a release decision must be reproducible bit-for-bit.
  */
object Privacy {

  // by-design plan-hazard documentation (Guardrails.expect): the
  // t-closeness lattice crosses the QI-class dictionary with the
  // distinct-value list — contingency-sized, never the fact table
  graft.plans.Guardrails.expect("cartesian_join", "__cumg",
    "tClosenessPerClass: QI-class x distinct-value densify lattice",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window", "__cumg, __v, __g",
    "tClosenessPerClass: global-distribution cumulative over the " +
      "distinct-value rollup",
    "rollup")

  /** k-anonymity audit: group by the quasi-identifier columns and
    * report the smallest equivalence class, how many classes fall
    * below `k`, and the ppm of ROWS at risk (in classes smaller than
    * k). A release passes when k_min ≥ k. Returns one row:
    * (n_rows, n_groups, k_min, groups_below_k, rows_below_ppm).
    *
    * Scale: one QI-grain agg with map-side combine + a groups-sized
    * rollup of it. The QI agg is the same shuffle a GROUP BY on those
    * columns would cost — nothing extra at 100 TB. */
  def kAnonymityAudit(df: DataFrame, quasiIds: Seq[Column],
      k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1, "k >= 1")
    val groups = df.groupBy(quasiIds: _*).agg(count(lit(1)).as("__n"))
    groups.agg(
      sum(col("__n")).cast("long").as("n_rows"),
      count(lit(1)).as("n_groups"),
      min(col("__n")).cast("long").as("k_min"),
      sum(when(col("__n") < k, 1L).otherwise(0L)).as("groups_below_k"),
      coalesce(sum(when(col("__n") < k, col("__n"))), lit(0L)).as("__below"))
      .withColumn("rows_below_ppm", expr("1000000 * __below div n_rows"))
      .drop("__below")
  }

  /** l-diversity audit: within each quasi-identifier class, count
    * DISTINCT sensitive values; report the least-diverse class and how
    * many classes fall below `l` (an attacker who locates a class with
    * one sensitive value learns it outright, k-anonymity
    * notwithstanding). Returns one row:
    * (n_groups, l_min, groups_below_l, below_ppm).
    *
    * Scale: one (QI, sensitive) distinct-grain agg + a QI-grain
    * rollup — both map-side combinable. */
  def lDiversityAudit(df: DataFrame, quasiIds: Seq[Column],
      sensitive: Column, l: Long): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    require(l >= 1, "l >= 1")
    val groups = df.groupBy(quasiIds: _*)
      .agg(count_distinct(sensitive).as("__l"))
    groups.agg(
      count(lit(1)).as("n_groups"),
      min(col("__l")).cast("long").as("l_min"),
      sum(when(col("__l") < l, 1L).otherwise(0L)).as("groups_below_l"))
      .withColumn("below_ppm", expr("1000000 * groups_below_l div n_groups"))
  }

  /** t-CLOSENESS audit (Li, Li & Venkatasubramanian, ICDE'07 — public
    * literature), completing the k-anonymity → l-diversity → t-closeness
    * triad: within each quasi-identifier class, the EARTH-MOVER'S
    * DISTANCE between the class's distribution over an ORDERED
    * sensitive attribute and the GLOBAL distribution. l-diversity
    * counts values; t-closeness catches the class where "diverse"
    * salaries are all in the top bracket. For an ordered attribute
    * with m distinct values at unit spacing,
    *   EMD = (1/(m−1)) · Σ_i |CumP_i − CumQ_i|.
    *
    * Determinism contract: fractions cleared — per class the summed
    * quantity is |cumc·N − cumg·n| (exact integers; n = class rows,
    * N = total rows), and
    *   t_ppm = (10⁶·Σ) div (n·N·(m−1)).
    * Returns per class: (class key cols…, n, emd_num, t_ppm) plus the
    * audit verdict columns via [[tClosenessAudit]].
    *
    * Scale: one (QI, value) agg → class-grain cumulative windows
    * PARTITIONED by class (fact-scale safe); the global distribution
    * is a values-sized broadcast. */
  def tClosenessPerClass(df: DataFrame, quasiIds: Seq[Column],
      sensitiveOrdered: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    val d38 = "decimal(38,0)"
    val cells = df.select((quasiIds :+ sensitiveOrdered.cast("long")
        .as("__v")): _*)
    val qiNames = cells.columns.dropRight(1).toSeq
    val byClassVal = cells.groupBy(qiNames.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val globalByVal = byClassVal.groupBy(col("__v"))
      .agg(sum(col("__c")).as("__g"))
      .withColumn("__cumg", sum(col("__g")).over(Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = globalByVal.agg(sum(col("__g")).as("__N"),
      count(lit(1)).as("__m"))
    // densify: every class must see EVERY distinct value (a missing
    // value still moves cumulative mass)
    val classes = byClassVal.select(qiNames.map(col): _*).distinct()
    val lattice = classes.join(globalByVal.select(col("__v"), col("__cumg")),
      lit(true))
    val wClass = Window.partitionBy(qiNames.map(col): _*)
      .orderBy(col("__v"))
    val wClassAll = Window.partitionBy(qiNames.map(col): _*)
    lattice.join(byClassVal, qiNames :+ "__v", "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
      .withColumn("__cumc", sum(col("__c")).over(
        wClass.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__nclass", sum(col("__c")).over(wClassAll))
      .crossJoin(broadcast(tot))
      .withColumn("__term", abs(col("__cumc").cast(d38) * col("__N") -
        col("__cumg").cast(d38) * col("__nclass")))
      .groupBy(qiNames.map(col): _*)
      .agg(max(col("__nclass")).as("n"),
        sum(col("__term")).as("__emd_pre"),
        max(col("__N")).as("__N2"), max(col("__m")).as("__m2"))
      .withColumn("emd_num", col("__emd_pre").cast(d38).cast("long"))
      .withColumn("t_ppm", expr(
        "CAST((1000000 * CAST(emd_num AS decimal(38,0))) div " +
          "(CAST(n AS decimal(38,0)) * __N2 * (__m2 - 1)) AS BIGINT)"))
      .select(qiNames.map(col) :+ col("n") :+ col("emd_num") :+
        col("t_ppm"): _*)
  }

  /** One-row t-closeness release gate over [[tClosenessPerClass]]:
    * (n_classes, t_max_ppm, classes_above_t). Passes when
    * t_max_ppm ≤ tPpm. */
  def tClosenessAudit(df: DataFrame, quasiIds: Seq[Column],
      sensitiveOrdered: Column, tPpm: Long): DataFrame = {
    val per = tClosenessPerClass(df, quasiIds, sensitiveOrdered)
    per.agg(count(lit(1)).as("n_classes"),
      max(col("t_ppm")).as("t_max_ppm"),
      sum(when(col("t_ppm") > tPpm, 1L).otherwise(0L))
        .as("classes_above_t"))
  }
  /** Mondrian multidimensional k-anonymization (LeFevre, DeWitt &
    * Ramakrishnan, ICDE 2006) over two numeric quasi-identifiers —
    * not just the AUDIT ([[kAnonymityAudit]]) but the GENERALIZER:
    * recursively split the record set at the median of the widest
    * (globally-normalized) QI dimension while both halves keep ≥ k
    * records; the final partitions' [min, max] ranges are the
    * generalized values a k-anonymous release publishes.
    *
    * Determinism contract: the width comparison is the exact integer
    * cross-product r₁·G₂ ≥ r₂·G₁ (ties → dim 1); the median is the
    * value at rank ⌈c/2⌉ of the (value, id) total order; partition
    * ids are path-encoded (pid·2+1 / pid·2+2), so after any fixed
    * round count the partition assignment is bit-identical across
    * engines and partitionings — a recursive CTE replays the whole
    * tree. Rounds are FIXED (not convergence-tested): a partition
    * that cannot split keeps its pid and re-declines every round.
    *
    * Returns one row per final partition:
    * (pid, n, qi1_min, qi1_max, qi2_min, qi2_max) — every n ≥ k by
    * construction (n ≥ 2k−1 partitions only stop when unsplittable).
    *
    * Scale: each round is pid-partitioned windows over the record
    * set — `rounds` passes, uniform keys (pids split geometrically,
    * so skew DECREASES each round); no driver traffic beyond the two
    * global range scalars. */
  def mondrianKAnonymity(df: DataFrame, idCol: Column, qi1: Column,
      qi2: Column, k: Int, rounds: Int = 8): DataFrame = {
    require(k >= 2, "k >= 2")
    require(rounds >= 1 && rounds <= 16, "1 <= rounds <= 16")
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    var recs = df.select(idCol.cast("long").as("__id"),
        qi1.cast("long").as("__v1"), qi2.cast("long").as("__v2"))
      .withColumn("__pid", lit(0L)).localCheckpoint()
    val g = recs.agg((max(col("__v1")) - min(col("__v1"))).as("g1"),
      (max(col("__v2")) - min(col("__v2"))).as("g2")).collect()(0)
    val g1 = math.max(1L, g.getLong(0)); val g2 = math.max(1L, g.getLong(1))
    var it = 0
    while (it < rounds) {
      val wp = Window.partitionBy(col("__pid"))
      val staged = recs
        .withColumn("__c", count(lit(1)).over(wp))
        .withColumn("__r1",
          max(col("__v1")).over(wp) - min(col("__v1")).over(wp))
        .withColumn("__r2",
          max(col("__v2")).over(wp) - min(col("__v2")).over(wp))
        .withColumn("__sv", when(
          expr(s"cast(__r1 as $d38) * ${g2}L >= cast(__r2 as $d38) * ${g1}L"),
          col("__v1")).otherwise(col("__v2")))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("__pid")).orderBy(col("__sv"), col("__id"))))
        .withColumn("__med", max(when(col("__rn") === expr("(__c + 1) div 2"),
          col("__sv"))).over(wp))
        .withColumn("__nl", sum(when(col("__sv") <= col("__med"), 1L)
          .otherwise(0L)).over(wp))
        .withColumn("__npid",
          when(col("__nl") < k || col("__c") - col("__nl") < k, col("__pid"))
            .when(col("__sv") <= col("__med"), col("__pid") * 2 + 1)
            .otherwise(col("__pid") * 2 + 2))
      recs = staged.select(col("__id"), col("__v1"), col("__v2"),
        col("__npid").as("__pid")).localCheckpoint()
      it += 1
    }
    recs.groupBy(col("__pid").as("pid"))
      .agg(count(lit(1)).as("n"),
        min(col("__v1")).as("qi1_min"), max(col("__v1")).as("qi1_max"),
        min(col("__v2")).as("qi2_min"), max(col("__v2")).as("qi2_max"))
      .orderBy(col("pid"))
  }

  /** privacy — DISCRETE-LAPLACE noisy counts via the two-sided
    * geometric mechanism (Ghosh, Roughgarden & Sundararajan, STOC'09
    * "Universally utility-maximizing privacy mechanisms" — public
    * literature), made ENGINE-REPLAYABLE: noise = G₁ − G₂ with
    * Gᵢ ~ Geometric(1 − 2^−k), giving the discrete Laplace with
    * α = 2^−k, i.e. ε = k·ln 2 per unit sensitivity — ε is a LATTICE
    * of multiples of ln 2, the price of staying inside exact integer
    * arithmetic (no libm anywhere). Each geometric is
    * trailing-zero-count(u) div k over a 64-bit draw u = splitmix64
    * finalizer of (key + salt) ([[graft.ext.Mix64]]): ctz via the
    * branch-free identity least(bit_count((u & −u) − 1), 64) —
    * lowest-set-bit isolation works on any two's-complement width (the
    * least() pins the u = 0 corner where a 128-bit engine would count
    * 128), so a replay agrees BIT-FOR-BIT.
    *
    * The mixer MUST be non-affine: an LCG draw per salt makes
    * u2 − u1 = a·(saltB − saltA) a key-independent constant, so the
    * two geometrics are strongly dependent (for k ≥ 3 they can never
    * both be nonzero) and the noise is NOT discrete Laplace. The
    * splitmix64 finalizer's xor-shift rounds break affinity; under the
    * standard PRF heuristic the two draws are independent uniforms.
    *
    * CAVEAT — this deterministic-replay variant is NOT itself a DP
    * release: with fixed public salts anyone can recompute the noise
    * and subtract it. It is a replayable SIMULATION of the mechanism
    * for pipeline audits and cross-engine testing. A real release must
    * draw the two geometrics from secret entropy (e.g. secret
    * per-release salts under the PRF assumption, or a hardware RNG);
    * only then does the ε = k·ln 2 analysis confer privacy.
    * Returns per key: (key, n, noise, noisy_n).
    *
    * Scale: one key-grain agg + scan-side bit arithmetic. */
  def dpCounts(df: DataFrame, keyCol: Column, k: Int,
      saltA: Long = 0x9E3779B97F4A7C15L,
      saltB: Long = 0x6A09E667F3BCC909L): DataFrame = {
    require(k >= 1 && k <= 64, "k in [1, 64] (epsilon = k*ln2)")
    // splitmix64 finalizer as a native wrapping expression — ANSI mode
    // rejects the wrap at the SQL layer, Java long arithmetic IS
    // mod-2^64 (see ext.Mix64; non-affine, unlike an LCG — see the
    // dependence caveat in the scaladoc above)
    def mix(seed: Column): Column = graft.ext.Mix64(seed)
    val counts = df.groupBy(keyCol.cast("long").as("key"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("__u1", mix(col("key") + lit(saltA)))
      .withColumn("__u2", mix(col("key") + lit(saltB)))
      .withColumn("__g1",
        expr(s"CAST(least(bit_count((__u1 & -__u1) - 1L), 64) AS BIGINT) div $k"))
      .withColumn("__g2",
        expr(s"CAST(least(bit_count((__u2 & -__u2) - 1L), 64) AS BIGINT) div $k"))
      .select(col("key"), col("n"),
        (col("__g1") - col("__g2")).cast("long").as("noise"),
        (col("n") + col("__g1") - col("__g2")).cast("long").as("noisy_n"))
  }

  /** privacy — WARNER RANDOMIZED RESPONSE (Warner 1965, JASA "Randomized
    * response: a survey technique for eliminating evasive answer bias" —
    * public literature; the local-DP primitive). Each unit reports its
    * sensitive bit TRUTHFULLY with probability p = 1 − 2^−k and flipped
    * otherwise; the analyst sees only the reported bits and unbiases:
    *
    *   E[λ̂] = pπ + (1−p)(1−π)  ⇒  π̂ = (λ̂ + p − 1) / (2p − 1)
    *                               = (2^k·yes_rep − n) / ((2^k − 2)·n)
    *
    * The dyadic p keeps the whole estimator inside exact integer
    * arithmetic: the flip decision is "the k low bits of
    * splitmix64(id + salt) are all zero" ([[graft.ext.Mix64]], the
    * q456 mixer — non-affine, so flips are key-independent under the
    * PRF heuristic), and π̂ is one floor division of exact products.
    * ε_local = ln(p/(1−p)) = ln(2^k − 1).
    *
    * Same caveat as [[dpCounts]]: with fixed public salts this is a
    * replayable SIMULATION of the mechanism (pipeline audits,
    * cross-engine tests); a real deployment draws the flip bit from
    * secret per-respondent entropy, and the truth column never leaves
    * the client at all — `yes_true`/`pi_true_ppm` exist here only
    * because the simulation holds both sides for calibration.
    * Returns per key: (…keys, n, yes_true, yes_reported, pi_true_ppm,
    * pi_hat_ppm).
    *
    * Scale: scan-side bit arithmetic + one key-grain agg with map-side
    * combine — no joins, no windows; the estimator is a rollup read. */
  def randomizedResponse(df: DataFrame, keys: Seq[Column], idCol: Column,
      truthCol: Column, k: Int,
      salt: Long = 0x9E3779B97F4A7C15L): DataFrame = {
    require(k >= 2 && k <= 62, "k in [2, 62] (p = 1 - 2^-k; k=1 is a coin)")
    val d38 = "decimal(38,0)"
    val mask = (1L << k) - 1
    val twoK = 1L << k
    val base = df.select(keys ++ Seq(idCol.cast("long").as("__id"),
      truthCol.cast("boolean").as("__y")): _*)
    val kNames = base.columns.dropRight(2).toSeq
    val agg = base
      .withColumn("__lie",
        graft.ext.Mix64(col("__id") + lit(salt)).bitwiseAND(lit(mask)) === 0L)
      .withColumn("__r", col("__y") =!= col("__lie"))
      .groupBy(kNames.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("yes_true"),
        sum(when(col("__r"), 1L).otherwise(0L)).as("yes_reported"))
    // the estimator numerator can go NEGATIVE (rare attribute, lies
    // dominating): integral `div` truncates toward zero, exactly like
    // DuckDB's integer `//` — a pmod-based floor would differ by 1 on
    // every negative quotient
    agg
      .withColumn("pi_true_ppm", expr("(yes_true * 1000000L) div n"))
      .withColumn("__hnum",
        (lit(twoK).cast(d38) * col("yes_reported").cast(d38) -
          col("n").cast(d38)) * lit(1000000L).cast(d38))
      .withColumn("__hden", lit(twoK - 2).cast(d38) * col("n").cast(d38))
      .withColumn("pi_hat_ppm", expr("CAST(__hnum div __hden AS BIGINT)"))
      .select(kNames.map(col) ++ Seq(col("n"), col("yes_true"),
        col("yes_reported"), col("pi_true_ppm"), col("pi_hat_ppm")): _*)
  }
}
