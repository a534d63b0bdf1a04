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

  // ---- by-design plan-hazard documentation (Guardrails.expect) ------
  // Each entry registers a deliberately-BOUNDED single-partition window
  // or unconditioned join this object builds, with its boundedness
  // argument, so the optimizer audit (PlanAudit / the Guardrails rule)
  // flags only NEW hazards instead of letting them hide among known
  // ones. Markers are operator-owned columns of the hazard plan node.
  graft.plans.Guardrails.expect("single_partition_window",
    "__fid, __b", "compactionPlan: file-LISTING prefix sum (metadata-sized; documented exception)",
    "rollup")



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

  /** E6 — zone-map pruning audit: given a physical layout (a chunk id
    * standing in for a parquet file / row group), compute the per-chunk
    * min-max "zone map" of `valueCol` and report how much of the table
    * a `[lo, hi]` range predicate could skip WITHOUT reading it:
    * (layout, chunks, chunks_pruned, rows_total, rows_skipped,
    * rows_selected, prune_ppm). A chunk is pruned when its zone
    * [min, max] misses [lo, hi] entirely — exactly the file-skip
    * decision Parquet readers make from footer stats.
    *
    * This is the MEASUREMENT side of the layout story: run it with the
    * natural (insertion-order) chunking and with a clustered chunking
    * (sort / partition / Z-order key) and the ppm gap is the fraction
    * of 100 TB the clustered layout never reads. All arithmetic is
    * integer; one chunk-keyed agg (map-side combined) + one
    * chunks-sized final agg. */
  def zoneMapAudit(df: DataFrame, layout: String, chunkCol: Column,
      valueCol: Column, lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, "empty predicate range")
    val v = valueCol.cast("long")
    df.select(chunkCol.cast("long").as("__chunk"), v.as("__v"))
      .groupBy(col("__chunk"))
      .agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
        count(lit(1)).as("__n"),
        sum(when(col("__v").isNotNull && col("__v").between(lo, hi), 1L)
          .otherwise(0L)).as("__sel"))
      .agg(count(lit(1)).as("chunks"),
        sum(when(col("__mx") < lo || col("__mn") > hi, 1L).otherwise(0L))
          .as("chunks_pruned"),
        sum(col("__n")).as("rows_total"),
        sum(when(col("__mx") < lo || col("__mn") > hi, col("__n"))
          .otherwise(0L)).as("rows_skipped"),
        sum(col("__sel")).as("rows_selected"))
      .select(lit(layout).as("layout"), col("chunks"), col("chunks_pruned"),
        col("rows_total"), col("rows_skipped"), col("rows_selected"),
        expr("(1000000L * rows_skipped) div rows_total").as("prune_ppm"))
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

  /** E6 — greedy file-compaction plan: assign size-ordered input files
    * to output groups of ~`targetBytes` by the running prefix sum —
    * group = cum_bytes_before div target. The small-files problem IS
    * a 100 TB problem (a day of streaming ingest leaves millions of
    * KB-sized parquet files whose per-file open cost dwarfs the read);
    * this op turns the file listing into the rewrite plan and its
    * audit: groups_used vs ceil(total/target) says how close greedy
    * sits to the packing lower bound. Returns one row per output
    * group: (grp, n_files, bytes, file_lo, file_hi).
    *
    * Scale: the input is the file LISTING (metadata, ~10⁵ rows for
    * 100 TB), not data; the one ordered prefix window runs over that
    * listing — document-level exception to the no-single-partition
    * rule, bounded by metadata size. */
  def compactionPlan(files: DataFrame, fileIdCol: Column, bytesCol: Column,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("__fid"))
    val planned = files
      .select(fileIdCol.cast("long").as("__fid"),
        bytesCol.cast("long").as("__b"))
      .withColumn("__before",
        coalesce(sum(col("__b")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("grp", expr(s"__before div ${targetBytes}L"))
    planned.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_files"), sum(col("__b")).as("bytes"),
        min(col("__fid")).as("file_lo"), max(col("__fid")).as("file_hi"))
  }

  /** E6/F7 — HILBERT curve key (Hilbert 1891; the iterative xy2d form
    * is standard public knowledge): quantize (x, y) exactly like
    * [[zorderKey]] and map the cell to its position along the order-
    * `bits` Hilbert curve. Every unit step along the key moves ONE
    * cell (verified by the spec's adjacency law) where Morton jumps
    * across the plane at quadrant seams — measurably better row-group
    * locality for 2-D range scans at the same cost: the whole fold is
    * unrolled scan-side integer arithmetic (no UDF, codegen-friendly),
    * and the oracle replays it level by level.
    *
    * Convention pinned here: reflections use the CURRENT level size
    * (x ← s−1−x), the descending-s loop of the classic snippet.
    *
    * The fold itself is a codegen Catalyst Expression
    * ([[graft.ext.HilbertIndex]]): inlined as Column arithmetic each
    * level re-embeds the previous level's (cx, cy) subtrees, growing
    * the tree ~5× per level — a Catalyst analysis/codegen blowup
    * (468 s at bits=7 in the round-4 bench), while the Expression's
    * static kernel plans in constant time and runs inside the
    * enclosing WholeStageCodegen span. */
  def hilbertKey(x: Column, y: Column,
      xmin: Double, xmax: Double, ymin: Double, ymax: Double,
      bits: Int): Column = {
    require(bits >= 1 && bits <= 16, "bits must be in [1, 16]")
    require(xmax > xmin && ymax > ymin, "bounds must be non-degenerate")
    def q(c: Column, lo: Double, hi: Double): Column =
      greatest(lit(0L), least(lit((1L << bits) - 1),
        floor((c - lit(lo)) / lit(hi - lo) * lit((1L << bits).toDouble)).cast("long")))
    graft.ext.HilbertIndex.hilbertIndex(q(x, xmin, xmax), q(y, ymin, ymax), bits)
  }

  /** The DuckDB transliteration of [[hilbertKey]]'s unrolled fold:
    * per-level CTEs over columns named (x, y, d), starting from a CTE
    * `base` exposing quantized qx/qy plus `carry` columns. Used by the
    * declared query so both engines run the identical level steps. */
  def hilbertOracleSteps(bits: Int, carryCols: String): String = {
    val levels = (0 until bits).reverse.map(b => 1L << b)
    val steps = levels.zipWithIndex.map { case (s, i) =>
      val in = if (i == 0) "hl0" else s"hl$i"
      val out = s"hl${i + 1}"
      s"""$out AS (
         |  SELECT $carryCols,
         |    d + $s * $s * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
         |      (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)) AS d,
         |    CASE WHEN (y & $s) = 0 THEN
         |      CASE WHEN (x & $s) > 0 THEN $s - 1 - y ELSE y END
         |    ELSE x END AS x,
         |    CASE WHEN (y & $s) = 0 THEN
         |      CASE WHEN (x & $s) > 0 THEN $s - 1 - x ELSE x END
         |    ELSE y END AS y
         |  FROM $in)""".stripMargin
    }
    steps.mkString(",\n")
  }

  /** E6 — rendezvous (highest-random-weight) sharding + resize audit
    * (Thaler & Ravishankar, "Using name-based mappings to increase hit
    * rates", ToN 1998 — the consistent-placement scheme behind
    * cache/shard routing): each key's shard under `n` nodes is
    * argmax_s hash(key ‖ s), which moves only ~1/(n+1) of keys when a
    * node is ADDED — vs ~1−1/n for mod-hashing. This op assigns every
    * key under `nBefore` and `nAfter` nodes (portable
    * [[graft.ext.Dedup.md5Hash60]], ties broken by the higher slot id)
    * and reports the per-shard movement audit: (shard, n, n_moved,
    * moved_ppm), shard = the BEFORE assignment.
    *
    * Scale: pure scan-side arithmetic (n hashes per key, n is the
    * node count) + one shard-keyed agg with map-side combine. The
    * resize-cost estimate every storage/router migration plan needs
    * BEFORE executing it. */
  def rendezvousShards(df: DataFrame, idCol: Column,
      nBefore: Int, nAfter: Int): DataFrame = {
    require(nBefore >= 1 && nAfter >= 1, "node counts >= 1")
    def assign(n: Int): Column = {
      // array_max over struct(h, s): highest hash wins, higher slot on
      // a (never-observed) hash tie — a total, engine-mirrorable order
      val scored = expr(
        s"""transform(sequence(0, ${n - 1}), s -> struct(
           |  CAST(conv(substring(md5(concat(__id, '#', CAST(s AS STRING))),
           |    1, 15), 16, 10) AS BIGINT) AS h, s AS s))""".stripMargin)
      array_max(scored).getField("s").cast("long")
    }
    df.select(idCol.cast("string").as("__id"))
      .withColumn("shard", assign(nBefore))
      .withColumn("__after", assign(nAfter))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("shard") =!= col("__after"), 1L).otherwise(0L))
          .as("n_moved"))
      .withColumn("moved_ppm", expr("(1000000 * n_moved) div n"))
  }
}
