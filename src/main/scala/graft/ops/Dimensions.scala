package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the warehouse-side merge
  * that keeps attribute history when an upstream batch lands. */
object Dimensions {

  /** SCD type-2 merge of an updates batch into the OPEN slice of a
    * dimension (rows with `valid_to IS NULL`; closed history passes
    * through the caller untouched). One full-outer equi-join on the
    * business key decides each key's fate:
    *   - attribute change → the open row closes at `batchDate` and a
    *     new open row starts there (two output rows);
    *   - no-op update (attributes null-safe equal) → open row unchanged;
    *   - dimension-only key → open row unchanged;
    *   - brand-new key → one open row starting at `batchDate`.
    * Comparison is null-safe (`<=>`) per attribute column; emission is
    * a conditional struct-array explode — one pass, no second join.
    *
    * Scale: a single business-key equi-join (uniform hash key) + a
    * scan-side explode; output ≤ |dim| + 2·|updates|. The operator is
    * idempotent for a repeated identical batch: re-applying yields
    * only no-op branches. */
  def scd2Apply(dim: DataFrame, updates: DataFrame, keyCol: String,
      attrCols: Seq[String], fromCol: String, toCol: String,
      batchDate: String): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    val batch = to_date(lit(batchDate))
    val d = dim.select(col(keyCol) +: (attrCols.map(c => col(c).as(s"__d_$c")) ++
      Seq(col(fromCol).as("__d_from"), col(toCol).as("__d_to"),
        lit(1).as("__d_present"))): _*)
    val u = updates.select(col(keyCol) +: (attrCols.map(c => col(c).as(s"__u_$c")) :+
      lit(1).as("__u_present")): _*)
    val joined = d.join(u, Seq(keyCol), "full_outer")
    // presence markers, not attr nullness: an all-null row still counts
    val inDim = col("__d_present").isNotNull
    val inUpd = col("__u_present").isNotNull
    val changed = attrCols.map(c => !(col(s"__d_$c") <=> col(s"__u_$c"))).reduce(_ || _)
    def rowOf(prefix: String, from: Column, to: Column) =
      struct((attrCols.map(c => col(s"__$prefix$c").as(c)) ++
        Seq(from.as(fromCol), to.as(toCol))): _*)
    val keepOpen = rowOf("d_", col("__d_from"), col("__d_to"))
    val branches = when(inDim && inUpd && changed,
        array(rowOf("d_", col("__d_from"), batch),        // close old
          rowOf("u_", batch, lit(null).cast("date"))))    // open new
      .when(inDim, array(keepOpen))                       // no-op or dim-only
      .otherwise(array(rowOf("u_", batch, lit(null).cast("date")))) // new key
    joined.select(col(keyCol), explode(branches).as("__r"))
      .select(col(keyCol) +: (attrCols.map(c => col(s"__r.$c")) ++
        Seq(col(s"__r.$fromCol"), col(s"__r.$toCol"))): _*)
  }

  /** Snapshot diff (the batch CDC kernel): compare two snapshots of
    * the same table on a business key and emit one row per difference,
    * tagged `insert` / `delete` / `update` (null-safe attribute
    * compare; unchanged keys emit nothing). Old attribute values ride
    * along `old_`-prefixed for update auditing. One full-outer
    * equi-join on the key — uniform hash, map-side pruned to the
    * changed minority by the filter. */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "diff needs at least one compared attribute")
    val b = before.select(col(keyCol) +: (attrCols.map(c => col(c).as(s"__b_$c")) :+
      lit(1).as("__b_present")): _*)
    val a = after.select(col(keyCol) +: (attrCols.map(c => col(c).as(s"__a_$c")) :+
      lit(1).as("__a_present")): _*)
    val changed = attrCols.map(c => !(col(s"__b_$c") <=> col(s"__a_$c"))).reduce(_ || _)
    b.join(a, Seq(keyCol), "full_outer")
      .withColumn("change_type",
        when(col("__b_present").isNull, lit("insert"))
          .when(col("__a_present").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(col(keyCol) +: col("change_type") +:
        (attrCols.map(c => col(s"__a_$c").as(c)) ++
          attrCols.map(c => col(s"__b_$c").as(s"old_$c"))): _*)
  }

  /** The SCD2 READ side: the dimension as it stood on `asOfDate` —
    * rows whose validity interval covers the probe
    * (`valid_from <= D < valid_to`, open rows have null `valid_to`).
    * A scan-side filter: history tables partitioned/z-ordered by the
    * validity dates prune to the covering slice at 100 TB. */
  def snapshotAsOf(history: DataFrame, fromCol: String, toCol: String,
      asOfDate: String): DataFrame = {
    val d = to_date(lit(asOfDate))
    history.filter(col(fromCol) <= d && (col(toCol).isNull || col(toCol) > d))
  }

  /** CDC log application — the MERGE-shaped "apply_changes" every
    * lakehouse ingestion runs: reduce a change log to each key's
    * LATEST operation under the (orderCols) total order, then merge
    * into the base snapshot —
    *   latest op 'D'        → key dropped (even if present in base);
    *   latest op upsert     → delta payload wins (insert if absent);
    *   no delta for the key → base row unchanged.
    * Returns base columns + the delta's payload columns (null where
    * the base row was never touched). Callers pass tie-broken
    * orderCols so "latest" is a total order — out-of-order log
    * delivery then cannot change the outcome.
    *
    * Scale: one key-partitioned window over the DELTA (log-sized, not
    * snapshot-sized) + one full-outer equi-join on the business key.
    * This is the compaction step that turns an append-only change
    * stream into a queryable snapshot without rescanning history. */
  def applyCdc(base: DataFrame, delta: DataFrame, keyCol: String,
      orderCols: Seq[Column], opCol: String,
      deleteOp: String = "D"): DataFrame = {
    require(orderCols.nonEmpty, "applyCdc needs ordering column(s)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.desc): _*)
    val latest = delta.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    base.join(latest, Seq(keyCol), "full_outer")
      .filter(col(opCol).isNull || col(opCol) =!= deleteOp)
  }
}
