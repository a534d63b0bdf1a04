package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E6 — physical data layout for 100 TB scans: Morton (Z-order) keys
  * and a Z-ordered parquet writer.
  *
  * Parquet data skipping works off per-file / per-row-group min-max
  * stats. A row-major sort gives tight stats on ONE dimension only; a
  * Z-order sort interleaves the bits of both quantized coordinates, so
  * every contiguous key range covers a compact 2-D region — per-file
  * bboxes shrink in BOTH x and y and a spatial predicate prunes most
  * files before any IO. This is the write-side complement of the
  * bbox/cell-join read path (SpatialOps): the same `.cx`-style clip
  * that the reference applies in memory becomes a file-skip at scale.
  */
object Layout {

  /** Morton key: quantize (x, y) to `bits`-bit cells over the given
    * bounds (clamped) and interleave — x bits at even positions, y at
    * odd. Pure column arithmetic, codegen-friendly, and DuckDB can
    * compute it with the same shift/mask expressions (q38's oracle). */
  def zorderKey(x: Column, y: Column,
      xmin: Double, xmax: Double, ymin: Double, ymax: Double,
      bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    require(xmax > xmin && ymax > ymin, "bounds must be non-degenerate")
    def q(c: Column, lo: Double, hi: Double): Column =
      greatest(lit(0L), least(lit((1L << bits) - 1),
        floor((c - lit(lo)) / lit(hi - lo) * lit((1L << bits).toDouble)).cast("long")))
    val qx = q(x, xmin, xmax)
    val qy = q(y, ymin, ymax)
    // interleaved bit positions are disjoint, so + is bitwise OR
    (0 until bits).map { b =>
      shiftright(qx, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(qy, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
  }

  /** Write `df` as Z-ordered parquet: range-partition on the Morton
    * key (so files own contiguous key ranges = compact 2-D regions),
    * sort within partitions (so row groups inherit the same
    * locality), drop the key, write. `numFiles` sizes the output —
    * at 100 TB pick it from target file size, not core count. */
  def writeZordered(df: DataFrame, path: String, xCol: String, yCol: String,
      xmin: Double, xmax: Double, ymin: Double, ymax: Double,
      bits: Int, numFiles: Int): Unit =
    df.withColumn("__zkey",
        zorderKey(col(xCol), col(yCol), xmin, xmax, ymin, ymax, bits))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
}
