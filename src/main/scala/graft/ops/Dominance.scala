package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the dominance query every
  * best-tradeoff dashboard runs (cheapest-earliest order, best
  * quality-per-length document). Row r is DOMINATED iff some r' has
  * x' ≤ x and y' ≥ y with at least one strict (minimize x, maximize
  * y); the skyline is the undominated set.
  */
object Dominance {

  // ---- by-design plan-hazard documentation (Guardrails.expect) ------
  // Each entry registers a deliberately-BOUNDED single-partition window
  // or unconditioned join this object builds, with its boundedness
  // argument, so the optimizer audit (PlanAudit / the Guardrails rule)
  // flags only NEW hazards instead of letting them hide among known
  // ones. Markers are operator-owned columns of the hazard plan node.
  graft.plans.Guardrails.expect("single_partition_window",
    "__ymax", "skyline2D: running-max over the sorted candidate rollup",
    "rollup")



  /** Skyline of `df` minimizing `xCol` and maximizing `yCol`.
    *
    * A row survives iff
    *   y > max{ y' : x' < x }   (nothing strictly cheaper is as good) and
    *   y = max{ y' : x' = x }   (nothing equally cheap is better),
    * which reduces the O(n²) dominance join to order statistics:
    *   1. per-x rollup: max y per distinct x (one map-side-partial agg);
    *   2. prefix max over x order on that |distinct x|-row rollup —
    *      the only ordered window, and it runs on the rollup, never the
    *      data;
    *   3. broadcast the rollup back and filter.
    * Duplicate points (same x AND same y) both survive — neither
    * strictly dominates — matching the textbook definition.
    *
    * Scale: the wide ops are one agg keyed on x and one broadcast
    * join; the global sort touches |distinct x| rows only. The 100 TB
    * failure mode (a single-partition window over the fact table)
    * never appears. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df.groupBy(col(xCol)).agg(max(col(yCol)).as("__ymax"))
    // strictly-before prefix max: ROWS .. -1 over the distinct-x rollup
    val prior = perX.withColumn("__before",
      max(col("__ymax")).over(
        Window.orderBy(col(xCol)).rowsBetween(Window.unboundedPreceding, -1)))
    df.join(broadcast(prior), Seq(xCol))
      .filter(col(yCol) === col("__ymax") &&
        (col("__before").isNull || col(yCol) > col("__before")))
      .drop("__ymax", "__before")
  }
}
