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

  // ---- by-design plan-hazard documentation (Guardrails.expect) ------
  // Each entry registers a deliberately-BOUNDED single-partition window
  // or unconditioned join this object builds, with its boundedness
  // argument, so the optimizer audit (PlanAudit / the Guardrails rule)
  // flags only NEW hazards instead of letting them hide among known
  // ones. Markers are operator-owned columns of the hazard plan node.
  graft.plans.Guardrails.expect("single_partition_window",
    "__pid, __cnt", "globalRowNumber: numPartitions-row offset rollup (never the fact table)",
    "k-literal")



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
  /** The pre-materialization ranked frame — exposed for plan-shape
    * specs (the checkpoint below hides the range exchange and the
    * pid-partitioned window from the final plan string). */
  private[graft] def rankedWithPid(df: DataFrame,
      orderCols: Seq[Column]): DataFrame = {
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism, 2)
    val ranged = df.repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val inPart = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    ranged.withColumn("__rn", row_number().over(inPart).cast("long"))
  }

  def globalRowNumber(df: DataFrame, orderCols: Seq[Column]): DataFrame =
    globalRowNumberWithTotal(df, orderCols, totalCol = None)

  /** [[globalRowNumber]] plus, when `totalCol` is set, the EXACT global
    * row count attached as that column — the total is the sum of the
    * same numPartitions-row offsets rollup and rides through the same
    * broadcast join, so callers that need N (decile cuts, percentile
    * denominators) get it with NO unbounded window over the fact table
    * and no second scan. */
  def globalRowNumberWithTotal(df: DataFrame, orderCols: Seq[Column],
      totalCol: Option[String]): DataFrame = {
    // MUST materialize: the frame feeds two consumers (the ranks and
    // the offset rollup), and RangePartitioner samples its boundaries
    // with an RDD-id-derived seed — if exchange reuse ever fails (it
    // does under e.g. a downstream coalesce), each consumer re-runs
    // the range shuffle with DIFFERENT boundaries and the offsets no
    // longer describe the join side's __pid ranges. The checkpoint
    // pins one boundary draw for both.
    val withRn = rankedWithPid(df, orderCols).localCheckpoint()
    val counts = withRn.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    val offsets0 = counts
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    val offsets = totalCol match {
      case Some(t) => offsets0
        .withColumn(t, sum(col("__cnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("__pid") +: col("__off") +: Seq(col(t)): _*)
      case None => offsets0.select(col("__pid"), col("__off"))
    }
    withRn.join(broadcast(offsets), Seq("__pid"))
      .withColumn("row_num", col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__off")
  }

  graft.plans.Guardrails.expect("single_partition_window",
    "__pid, __psum", "globalRunningSum: numPartitions-row offset rollup " +
      "(never the fact table)", "k-literal")

  /** Appends `outCol` = the inclusive GLOBAL prefix sum of `valueCol`
    * (cast long) in the total order `orderCols` — the running-sum twin
    * of [[globalRowNumber]], and the scale-safe replacement for
    * `sum().over(Window.orderBy(...))` with no partition spec.
    *
    * Plan: range-repartition on the order, per-partition cumulative
    * sums (partitioned window), per-partition TOTALS — a
    * |partitions|-row rollup — prefix-summed into offsets broadcast
    * back. Same determinism argument as globalRowNumber: with a total
    * order the prefix sum is boundary-independent. The checkpoint pins
    * one boundary draw for both consumers (see globalRowNumber). */
  def globalRunningSum(df: DataFrame, orderCols: Seq[Column],
      valueCol: Column, outCol: String): DataFrame = {
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism, 2)
    val ranged = df.withColumn("__v", valueCol.cast("long"))
      .repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val inPart = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = ranged.withColumn("__cumv", sum(col("__v")).over(inPart))
      .localCheckpoint()
    val offsets = withCum.groupBy(col("__pid"))
      .agg(sum(col("__v")).as("__psum"))
      .withColumn("__off",
        coalesce(sum(col("__psum")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    withCum.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__off") + col("__cumv"))
      .drop("__pid", "__cumv", "__off", "__v")
  }

  /** NDCG@k position-discount table in ppm: round(10⁶ / log2(pos+1))
    * for pos = 1..10 — LITERAL constants (like the Benford table), so
    * no runtime log on either engine and the metric is exact integer
    * arithmetic end to end. */
  val NdcgDiscountPpm: Seq[Long] = Seq(1000000L, 630930L, 500000L,
    430677L, 386853L, 356207L, 333333L, 315465L, 301030L, 289065L)

  /** W2/A-stat — NDCG@k per key: how well the ACTUAL item order
    * (`orderCols`, e.g. arrival/serving order) agrees with the ideal
    * order (relevance descending) — the offline ranking-evaluation
    * metric of search/recsys. DCG = Σ rel·disc(pos) with the literal
    * ppm discount table, IDCG the same over the relevance-sorted
    * positions; both are exact integer sums (rel must be an integer
    * column — quantize money to cents first), and the one float op is
    * the final dcg/idcg division of identical exact operands. Items
    * beyond position k are ignored in both orders. Returns
    * (key, n_items, dcg_u, idcg_u, ndcg); keys whose relevance is all
    * zero get ndcg null (0/0).
    *
    * Scale: two row_number windows over the SAME key partitioning —
    * one shuffle, two in-partition sorts; the discount lookup is a
    * scan-side array index. */
  def ndcgAtK(df: DataFrame, keyCol: Column, orderCols: Seq[Column],
      relCol: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= NdcgDiscountPpm.size,
      s"k must be in 1..${NdcgDiscountPpm.size}")
    val disc = array(NdcgDiscountPpm.map(lit): _*)
    val actual = Window.partitionBy(keyCol).orderBy(orderCols.map(_.asc): _*)
    val ideal = Window.partitionBy(keyCol)
      .orderBy(relCol.desc +: orderCols.map(_.asc): _*)
    df.select(keyCol.as("key"), relCol.cast("long").as("__rel"),
        row_number().over(actual).as("__p"),
        row_number().over(ideal).as("__ip"))
      .groupBy(col("key"))
      .agg(sum(when(col("__p") <= k, 1L).otherwise(0L)).as("n_items"),
        sum(when(col("__p") <= k,
          col("__rel") * element_at(disc, col("__p"))).otherwise(0L))
          .as("dcg_u"),
        sum(when(col("__ip") <= k,
          col("__rel") * element_at(disc, col("__ip"))).otherwise(0L))
          .as("idcg_u"))
      .withColumn("ndcg", when(col("idcg_u") > 0,
        col("dcg_u").cast("double") / col("idcg_u").cast("double")))
  }
  /** W2/A-stat — Expected Reciprocal Rank at k (Chapelle, Metlzer,
    * Zhang & Grinspan, CIKM 2009): the cascade-model ranking metric —
    * a user scans down the list and stops at the first satisfying
    * item, so high-up relevant items SHADOW everything below (the
    * behavior NDCG's additive gains ignore):
    *   ERR = Σ_r (R_r / r) · Π_{i<r} (1 − R_i),
    *   R = (2^g − 1) / 2^gmax.
    * Determinism: R and every partial stop-probability are DYADIC
    * rationals (≤ gmax fractional bits per step, ≤ k·gmax ≪ 53 bits
    * at k ≤ 10), so products are EXACT doubles; the per-rank division
    * by r and the sum run in one ordered fold — the identical
    * operation sequence on both engines, bit-for-bit. Returns per
    * key: (key, n_items, err).
    *
    * Scale: one key-partitioned rank window + a k-bounded collect per
    * key — the [[ndcgAtK]] envelope. Grades must lie in 0..gmax. */
  def errAtK(df: DataFrame, keyCol: Column, orderCols: Seq[Column],
      gradeCol: Column, k: Int, gmax: Int = 4): DataFrame = {
    require(k >= 1 && k <= 100, "1 <= k <= 100")
    require(gmax >= 1 && gmax <= 8, "1 <= gmax <= 8")
    require(k * gmax <= 500, "k*gmax bounded")
    val actual = Window.partitionBy(keyCol).orderBy(orderCols.map(_.asc): _*)
    val denom = (1L << gmax).toDouble
    df.select(keyCol.as("key"), gradeCol.cast("long").as("__g"),
        row_number().over(actual).as("__p"))
      .filter(col("__p") <= k)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_items"),
        array_sort(collect_list(struct(col("__p"), col("__g"))))
          .as("__a"))
      .withColumn("err", expr(
        s"""aggregate(__a,
           |  named_struct('p', cast(1.0 as double), 'e', cast(0.0 as double)),
           |  (acc, x) -> named_struct(
           |    'p', acc.p * (1.0 - cast(shiftleft(1L, cast(x.__g as int)) - 1
           |           as double) / $denom),
           |    'e', acc.e + acc.p * (cast(shiftleft(1L, cast(x.__g as int)) - 1
           |           as double) / $denom) / cast(x.__p as double))).e"""
          .stripMargin))
      .select(col("key"), col("n_items"), col("err"))
  }
}
