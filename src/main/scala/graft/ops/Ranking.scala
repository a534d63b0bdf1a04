package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL order statistics without the single-partition window —
  * the Spark-gap primitive behind qcut/ntile/exact-percentile-rank at
  * scale. `row_number() OVER (ORDER BY …)` with no PARTITION BY pulls
  * the whole table through one task; this computes the identical
  * number with a range repartition + per-partition windows + a
  * bounded offset rollup.
  */
object Ranking {

  /** Appends `row_num` = the 1-based global row number of the total
    * order `orderCols` (callers pass a tie-breaking suffix so the
    * order is total — ranks are then partitioning-independent).
    *
    * Plan: range-repartition on the order (cross-partition order
    * holds), per-partition `row_number` (each partition sorts
    * locally), then per-partition counts — a |partitions|-row rollup —
    * prefix-sum into offsets broadcast back. The only ordered window
    * over data rows is partitioned; the only global window runs on the
    * rollup. Range boundaries come from sampling, but with a total
    * order the assigned rank is boundary-independent, so results are
    * deterministic run to run. */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column]): DataFrame = {
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism, 2)
    val ranged = df.repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val inPart = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    val withRn = ranged.withColumn("__rn", row_number().over(inPart).cast("long"))
    val offsets = withRn.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__off"))
    withRn.join(broadcast(offsets), Seq("__pid"))
      .withColumn("row_num", col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__off")
  }
}
