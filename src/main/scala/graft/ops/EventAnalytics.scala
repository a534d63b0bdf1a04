package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` shape (ts, actor, type):
  * concurrency profiles, conversion funnels, retention cohorts. All
  * integer/timestamp arithmetic — exact on any engine and
  * partitioning.
  */
object EventAnalytics {

  /** Concurrency profile of half-open intervals `[start, end)`: for
    * every boundary instant, how many intervals are active. The
    * classic sweep line — +1 at each start, −1 at each end, cumulative
    * over time order — but as a TWO-PHASE plan that never needs a
    * global single-partition window:
    *   1. per-day net delta (a bounded rollup: one row per day) is
    *      prefix-summed over a tiny day-keyed window → each day's
    *      carry-in;
    *   2. the full delta set cumulates INSIDE each day (window
    *      partitioned by day, RANGE frame so equal instants tie
    *      deterministically) and adds the carry.
    * Intervals crossing midnight are exact: their −1 lives on the day
    * it falls in, and the carry moves the balance across the seam.
    * Returns one row per distinct boundary instant: (t, concurrency).
    *
    * Scale: phase 1's rollup is |days| rows (broadcastable); phase 2
    * partitions by day — hot days split further by AQE; nothing global.
    */
  def concurrencyProfile(df: DataFrame, startCol: String, endCol: String): DataFrame = {
    val deltas = df.select(explode(array(
        struct(col(startCol).as("t"), lit(1).as("d")),
        struct(col(endCol).as("t"), lit(-1).as("d")))).as("ev"))
      .select(col("ev.t").as("t"), col("ev.d").as("d"), to_date(col("ev.t")).as("day"))
    val dayNet = deltas.groupBy(col("day")).agg(sum(col("d")).as("net"))
    val carry = dayNet
      .withColumn("carry",
        coalesce(sum(col("net")).over(
          Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("day"), col("carry"))
    val inDay = Window.partitionBy(col("day")).orderBy(col("t"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("__cum", sum(col("d")).over(inDay))
      .join(broadcast(carry), Seq("day"))
      .select(col("t"), (col("__cum") + col("carry")).as("concurrency"))
      .distinct()
  }

  /** Strictly-ordered conversion funnel: for each actor, stage i is
    * reached at the FIRST event of `stages(i)` strictly after stage
    * i−1. One conditional-min aggregation per stage (each keyed on the
    * actor — uniform, map-side partials), not a per-event path walk.
    * Returns one row per actor with a nullable reach time per stage
    * (`t_<stage>`); count the non-nulls for the funnel counts. */
  def funnelReachTimes(df: DataFrame, actorCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = df.groupBy(col(actorCol))
      .agg(min(when(col(typeCol) === stages.head, col(tsCol))).as(s"t_${stages.head}"))
    stages.tail.zipWithIndex.foldLeft(first) { case (acc, (stage, i)) =>
      val prev = s"t_${stages(i)}"
      val accCols = acc.columns.map(col).toIndexedSeq
      df.join(acc, Seq(actorCol))
        .groupBy(accCols: _*)
        .agg(min(when(col(typeCol) === stage && col(tsCol) > col(prev), col(tsCol)))
          .as(s"t_$stage"))
    }
  }

  /** Merge overlapping-or-touching half-open intervals `[s, e)` per
    * key (gaps-and-islands): an interval starts a new island exactly
    * when its start exceeds the running max end of everything before
    * it. One key-partitioned window sort computes the island flags and
    * ids; a (key, island) agg emits each island's span and size. Both
    * decisions depend only on VALUES (ties share start/end), so the
    * output is deterministic under any tie order.
    *
    * Scale: one shuffle keyed on the series key for the window, one
    * map-side-partial agg on (key, island) — a hot key costs one
    * partition sort, the same regime as every window op here. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__new_island",
        when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1).otherwise(0))
      .withColumn("__island",
        sum(col("__new_island")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }

  /** Retention cohorts: actors cohort by their first-seen day; the
    * (cohort_day, k) cell counts distinct actors active exactly k days
    * after their cohort day. Two actor-keyed aggs + one join; output
    * is |days| × (maxDays+1) — bounded, broadcast-friendly. */
  def retentionCohorts(df: DataFrame, actorCol: String, tsCol: String,
      maxDays: Int): DataFrame = {
    val firstSeen = df.groupBy(col(actorCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val active = df.select(col(actorCol), to_date(col(tsCol)).as("d")).distinct()
    active.join(firstSeen, actorCol)
      .withColumn("k", datediff(col("d"), col("cohort_day")))
      .filter(col("k").between(0, maxDays))
      .groupBy(col("cohort_day"), col("k"))
      .agg(count(lit(1)).as("users"))
  }
}
