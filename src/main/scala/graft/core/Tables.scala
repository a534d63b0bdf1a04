package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets column
  * pruning + predicate pushdown into the scan for free; nothing here
  * materializes anything.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as a nanos
    * long and truncate to microseconds — exactly what DuckDB does when
    * it coerces TIMESTAMP_NS to its µs TIMESTAMP, so oracle comparisons
    * stay bit-identical. Integer `div` (not double /) — ns-since-epoch
    * exceeds double's 53-bit exact range.
    *
    * DELIBERATE session side effect: `nanosAsLong` stays set (it is a
    * session conf, not a per-read option, and the scan consults it at
    * execution time too). Scope of the change: columns Spark would
    * otherwise REFUSE to read now arrive as LongType — strictly more
    * permissive, never silently different for previously-working reads. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (raw.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
      // parquet timestamp[us] WITHOUT isAdjustedToUTC arrives as
      // TIMESTAMP_NTZ, which instant functions (unix_micros, windows)
      // reject. The session timezone is pinned to UTC everywhere
      // (build + GraftSession), so the NTZ→LTZ cast is wall-clock
      // identity and matches DuckDB's naive-timestamp read exactly.
      raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
