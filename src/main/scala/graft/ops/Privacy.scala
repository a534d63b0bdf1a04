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
}
