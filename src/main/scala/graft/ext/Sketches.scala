package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E6 — count-min sketch: the fixed-size frequency summary behind
  * heavy-hitter detection when the key domain is too large to count
  * exactly (URL hosts, user agents, n-grams at crawl scale). A d×w
  * integer grid; each key increments one cell per row via d
  * independent hashes; the estimate is the MIN over the key's d cells
  * — always ≥ the true count (one-sided error), within εN with
  * probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉ (Cormode & Muthu-
  * krishnan 2005, public literature).
  *
  * The hash family is md5-derived ([[Dedup.md5Hash60]] over
  * "row:key"), so an engine reproducing the same md5 arithmetic
  * builds the bit-identical grid — the property that lets the DuckDB
  * oracle verify the sketch EXACTLY, not just statistically.
  *
  * Scale: the build is one explode(d) + one (row, bucket)-keyed agg —
  * map-side combine collapses to ≤ d·w cells per partition before the
  * shuffle, so the shuffle volume is d·w·partitions regardless of
  * input size. The sketch itself (≤ d·w rows) broadcasts to probes. */
object Sketches {

  /** Bucket of `key` in hash row `j`: md5("j:key") mod width —
    * deterministic, cross-engine-reconstructible. */
  def cmsBucket(j: Int, key: Column, width: Int): Column =
    pmod(Dedup.md5Hash60(concat_ws(":", lit(j), key.cast("string"))), lit(width))

  /** Build the d×w count grid: one row per non-empty cell
    * (row_j, bucket, cnt). */
  def countMinBuild(df: DataFrame, keyCol: Column,
      width: Int, depth: Int): DataFrame = {
    require(width > 0 && depth > 0, "width and depth must be positive")
    df.select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("row_j"), cmsBucket(j, keyCol, width).as("bucket"))): _*))
        .as("c"))
      .groupBy(col("c.row_j").as("row_j"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch for each distinct probe key: est =
    * min over the key's d cells. The sketch side broadcasts (≤ d·w
    * rows); absent cells count 0 (possible only for keys never
    * inserted). */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame, keyCol: Column,
      width: Int, depth: Int): DataFrame = {
    require(width > 0 && depth > 0, "width and depth must be positive")
    probes.select(keyCol.as("key")).distinct()
      .select(col("key"), explode(array((0 until depth).map(j =>
        struct(lit(j).as("row_j"), cmsBucket(j, col("key"), width).as("bucket"))): _*))
        .as("c"))
      .select(col("key"), col("c.row_j").as("row_j"), col("c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row_j", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
