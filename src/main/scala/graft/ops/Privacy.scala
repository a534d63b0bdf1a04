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
    "tClosenessPerClass: QI-class x distinct-value densify lattice")
  graft.plans.Guardrails.expect("single_partition_window", "__cumg, __v, __g",
    "tClosenessPerClass: global-distribution cumulative over the " +
      "distinct-value rollup")

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
}
