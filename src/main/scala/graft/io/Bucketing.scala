package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located-join story for repeated
  * large×large equi joins (SURVEY E6 / the 100 TB design rules).
  *
  * Writing both sides bucketed by the join key into the same bucket
  * count lets every subsequent join (and groupBy on the key) skip its
  * Exchange entirely: partitioning is recorded in the catalog and
  * Catalyst trusts it at plan time. This is the batch analog of
  * pre-partitioning a pipeline's hot key — pay one shuffle at ingest,
  * never again.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) managed table.
    * Bucket count should be sized so a bucket fits executor memory at
    * the target scale (e.g. 100TB / 8192 buckets ≈ 12GB splits). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sortByKey: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(buckets, key)
    (if (sortByKey) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — plans with
    * zero Exchange nodes when bucket counts match. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
