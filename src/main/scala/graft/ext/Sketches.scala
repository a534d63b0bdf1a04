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
  * The hash family is md5-derived — row j's bucket is the j-th 32-bit
  * chunk of the key's single md5 — so an engine reproducing the same
  * md5 arithmetic builds the bit-identical grid: the property that
  * lets the DuckDB oracle verify the sketch EXACTLY, not just
  * statistically.
  *
  * Scale: the build is one explode(d) + one (row, bucket)-keyed agg —
  * map-side combine collapses to ≤ d·w cells per partition before the
  * shuffle, so the shuffle volume is d·w·partitions regardless of
  * input size. The sketch itself (≤ d·w rows) broadcasts to probes. */
object Sketches {

  /** All `depth` (row_j, bucket) pairs of `key` from ONE md5 call:
    * row j's bucket is hex chars [8j+1 .. 8j+8] of md5(key) — a 32-bit
    * integer — mod width. One hash per input row instead of d (md5
    * dominates the build cost); 128 md5 bits cap depth at 4, which
    * already gives δ = e⁻⁴ < 2%. Deterministic and cross-engine-
    * reconstructible (the q46 nibble-reassembly trick, 8 chars per
    * chunk). */
  private def chunkPairs(md5Hex: Column, width: Int, depth: Int): Column = {
    require(width > 0, "width must be positive")
    require(depth >= 1 && depth <= 4,
      "depth must be in 1..4 (one 32-bit chunk of the row's single md5 each)")
    array((0 until depth).map(j =>
      struct(lit(j).as("row_j"),
        pmod(conv(substring(md5Hex, j * 8 + 1, 8), 16, 10).cast("long"),
          lit(width.toLong)).as("bucket"))): _*)
  }

  /** Build the d×w count grid: one row per non-empty cell
    * (row_j, bucket, cnt). The md5 is materialized in its own
    * projection BELOW the explode so it runs once per input row —
    * inlining it into the generator would re-hash per chunk (Generate
    * expressions get no subexpression elimination). */
  def countMinBuild(df: DataFrame, keyCol: Column,
      width: Int, depth: Int): DataFrame =
    df.select(md5(keyCol.cast("string")).as("__h"))
      .select(explode(chunkPairs(col("__h"), width, depth)).as("c"))
      .groupBy(col("c.row_j").as("row_j"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-query the sketch for each distinct probe key: est =
    * min over the key's d cells. The sketch side broadcasts (≤ d·w
    * rows); absent cells count 0 (possible only for keys never
    * inserted). */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame, keyCol: Column,
      width: Int, depth: Int): DataFrame =
    probes.select(keyCol.as("key")).distinct()
      .select(col("key"), md5(col("key").cast("string")).as("__h"))
      .select(col("key"), explode(chunkPairs(col("__h"), width, depth)).as("c"))
      .select(col("key"), col("c.row_j").as("row_j"), col("c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row_j", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
