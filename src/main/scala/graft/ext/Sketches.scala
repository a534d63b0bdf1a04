package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  // ---- by-design plan-hazard documentation (Guardrails.expect) ------
  // Each entry registers a deliberately-BOUNDED single-partition window
  // or unconditioned join this object builds, with its boundedness
  // argument, so the optimizer audit (PlanAudit / the Guardrails rule)
  // flags only NEW hazards instead of letting them hide among known
  // ones. Markers are operator-owned columns of the hazard plan node.
  graft.plans.Guardrails.expect("single_partition_window",
    "__rn, h", "kmvSketch: k-row sketch rank (k<=1024)",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__cum, __bin", "binnedQuantileAudit: |bins|-row CDF",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__cum, __x", "binnedQuantileAudit: exact-quantile CDF over the bounded probe",
    "k-literal")



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

  /** HLL rank scale: registers hold values in [1, 33] (leading zeros
    * of a 32-bit sub-hash + 1); the indicator sum is kept as the
    * INTEGER Σ 2^(33−M_j) — empty registers contribute 2^33 — so the
    * whole sketch state is exact BIGINT arithmetic that a second
    * engine reproduces bit-for-bit. */
  private val HllRankMax = 33

  /** E6 — HyperLogLog register table (Flajolet et al. 2007, public
    * literature): per (group, register-index), the max over member
    * keys of (leading-zero count of a 32-bit sub-hash + 1). Hashes
    * are md5-derived like [[countMinBuild]] — chars 1-8 pick the
    * register (mod m), chars 9-16 give the rank word — so the
    * register table is deterministic and cross-engine-verifiable
    * EXACTLY, not just statistically.
    *
    * Scale: one explode-free scan + one (group, idx)-keyed agg with
    * map-side combine; shuffle volume ≤ groups·m rows no matter the
    * input size. Register max is associative+commutative, so any
    * partitioning / merge tree yields the identical table (the
    * mergeability law SketchSpec pins for Spark's own HLL). */
  def hllRegisters(df: DataFrame, groupKeys: Seq[Column], keyCol: Column,
      m: Int): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0 && m <= 65536,
      "register count m must be a power of two in [2, 65536]")
    val h = md5(keyCol.cast("string"))
    val idx = pmod(conv(substring(h, 1, 8), 16, 10).cast("long"), lit(m.toLong))
    val w = conv(substring(h, 9, 8), 16, 10).cast("long")
    // rank = leading zeros in the 32-bit word + 1 = 33 − bitlen(w);
    // bin() prints the minimal binary form, so length(bin(w)) = bitlen
    val rank = when(w === 0L, lit(HllRankMax.toLong))
      .otherwise(lit(HllRankMax.toLong) - length(bin(w)).cast("long"))
    val projected = df.select(groupKeys :+ idx.as("idx") :+ rank.as("rank"): _*)
    val gNames = projected.columns.dropRight(2).toSeq
    projected.groupBy((gNames :+ "idx").map(col): _*)
      .agg(max(col("rank")).as("m_rank"))
  }

  /** Collapse an [[hllRegisters]] table to per-group estimates:
    * (…group, registers_hit, sum_scaled, est_hll) where
    * sum_scaled = Σ_j 2^(33−M_j) (empty registers count 2^33) and
    * est_hll = α_m·m²·2^33 / sum_scaled — the RAW HLL estimate. The
    * single float op divides identical exact integers by a shared
    * literal product, so even the double hash-matches across engines.
    * No small/large-range correction (those need ln); callers read
    * `registers_hit` < m as the linear-counting signal instead. */
  def hllEstimate(registers: DataFrame, groupNames: Seq[String], m: Int): DataFrame = {
    val numLit = hllAlpha(m) * m * m * (1L << HllRankMax).toDouble
    registers.groupBy(groupNames.map(col): _*)
      .agg(count(lit(1)).as("registers_hit"),
        // scala functions.shiftleft takes a literal shift; the SQL
        // form accepts a column shift amount (ShiftLeft expression)
        (sum(expr(s"shiftleft(1L, $HllRankMax - m_rank)")) +
          (lit(m.toLong) - count(lit(1))) * lit(1L << HllRankMax)).as("sum_scaled"))
      .withColumn("est_hll", lit(numLit) / col("sum_scaled").cast("double"))
  }

  /** α_m bias constant (Flajolet et al. 2007): 0.7213/(1 + 1.079/m)
    * for m ≥ 128, with the published small-m values below. Public
    * constants; interpolate the SAME double literal into oracle SQL. */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** E6 — Bloom filter build: the distinct set-bit positions of a
    * `bits`-wide, k-hash filter over `keyCol` (Bloom 1970, public
    * literature). Hash j = j-th 32-bit md5 chunk mod bits (k ≤ 4 —
    * one md5 per key, same family as [[countMinBuild]]).
    *
    * Scale: the filter is the DISTINCT of ≤ k·|keys| bucket ids —
    * bounded by `bits` rows total, broadcastable at any input size.
    * This is the op behind semi-join pushdown: ship the bit set to
    * the scan side and drop non-members before the shuffle. */
  def bloomBuild(df: DataFrame, keyCol: Column, bits: Int, k: Int): DataFrame =
    df.select(md5(keyCol.cast("string")).as("__h"))
      .select(explode(chunkPairs(col("__h"), bits, k)).as("c"))
      .select(col("c.bucket").as("bit"))
      .distinct()

  /** Probe: per distinct probe key, how many of its k positions are
    * set (`hits`) and whether ALL are (`positive` — the Bloom
    * membership verdict: no false negatives, tunable false-positive
    * rate (1−e^(−kn/bits))^k). The filter side broadcasts. */
  def bloomProbe(bloom: DataFrame, probes: DataFrame, keyCol: Column,
      bits: Int, k: Int): DataFrame =
    probes.select(keyCol.as("key")).distinct()
      .select(col("key"), md5(col("key").cast("string")).as("__h"))
      .select(col("key"), explode(chunkPairs(col("__h"), bits, k)).as("c"))
      .select(col("key"), col("c.row_j").as("row_j"), col("c.bucket").as("bit"))
      .join(broadcast(bloom.withColumn("__set", lit(1))), Seq("bit"), "left")
      .groupBy(col("key"))
      .agg(sum(coalesce(col("__set"), lit(0))).cast("long").as("hits"))
      .withColumn("positive", (col("hits") === k.toLong).cast("int"))

  /** E6 — KMV (k-minimum-values / bottom-k) distinct sketch per group
    * (Bar-Yossef et al. 2002, public literature): the k smallest
    * DISTINCT 32-bit md5-chunk hashes of `keyCol`. Returns the sketch
    * table (…groups, h) — ≤ k rows per group, mergeable by
    * re-taking the bottom k of a union. Completes the sketch family:
    * count-min answers "how often", HLL "how many", Bloom "have I
    * seen it", KMV "how many AND how similar" (resemblance comes free
    * from comparing sketches — [[kmvResemblance]]).
    *
    * Scale: the (group, h) DISTINCT agg map-side combines; the
    * per-group bottom-k rank filter is a WindowGroupLimit (per-
    * partition k-heaps before the shuffle), so shuffle volume is
    * ≤ groups·k no matter the input size. */
  def kmvSketch(df: DataFrame, groupKeys: Seq[Column], keyCol: Column,
      k: Int): DataFrame = {
    require(k >= 2, "sketch size k must be >= 2")
    val h = conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10)
      .cast("long")
    val projected = df.select(groupKeys :+ h.as("h"): _*)
    val gNames = projected.columns.dropRight(1).toSeq
    val dedup = projected.groupBy((gNames :+ "h").map(col): _*).agg(lit(1).as("__one"))
    val w =
      if (gNames.isEmpty) Window.orderBy(col("h"))
      else Window.partitionBy(gNames.map(col): _*).orderBy(col("h"))
    dedup.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select((gNames :+ "h").map(col): _*)
  }

  /** Collapse a [[kmvSketch]] table to per-group distinct estimates:
    * (…groups, n_kept, h_max, est_kmv). A full sketch (n_kept = k)
    * estimates (k−1)·2³² div h_max — exact integer arithmetic on the
    * exact k-th minimum; a partial sketch (fewer distinct hashes than
    * k) IS the distinct count, so the estimate degrades to exact. */
  def kmvEstimate(sketch: DataFrame, groupNames: Seq[String],
      k: Int): DataFrame = {
    val grouped =
      if (groupNames.isEmpty) sketch.groupBy()
      else sketch.groupBy(groupNames.map(col): _*)
    grouped
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("h_max"))
      .withColumn("est_kmv",
        when(col("n_kept") === k.toLong && col("h_max") > 0,
          expr(s"(${k - 1}L * 4294967296L) div h_max"))
          .otherwise(col("n_kept")))
  }

  /** Jaccard resemblance estimate between two single-group
    * [[kmvSketch]] tables: take the bottom k of the hash UNION, count
    * how many of those survivors sit in BOTH sketches —
    * j_ppm = 10⁶ · |U_k ∩ A ∩ B| div |U_k| (Broder 1997 bottom-k
    * minhash, exact integer arithmetic given the sketches). The
    * source-vs-source overlap audit that never rescans either side:
    * both operands are ≤ k rows. */
  def kmvResemblance(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val ha = a.select(col("h")).withColumn("__ina", lit(1))
    val hb = b.select(col("h")).withColumn("__inb", lit(1))
    ha.join(hb, Seq("h"), "full_outer")
      .withColumn("__rn", row_number().over(Window.orderBy(col("h"))))
      .filter(col("__rn") <= k)
      .agg(count(lit(1)).as("union_kept"),
        sum(when(col("__ina") === 1 && col("__inb") === 1, 1L)
          .otherwise(0L)).as("inter_kept"))
      .withColumn("j_est_ppm", expr("1000000 * inter_kept div union_kept"))
  }

  /** E6/sketch — fixed-width-bin histogram quantiles AUDITED against
    * the exact order statistic: the mergeable-histogram quantile is
    * the 100 TB path (per-partition bin counts combine map-side; the
    * sketch is bin-domain-sized), and this op reports, per requested
    * level, both the histogram estimate (upper edge of the crossing
    * bin) and the exact lower-quantile value, with the signed ppm
    * error — the audit that sizes `binWidth` before trusting the
    * sketch in production. Rank convention: target = ⌈level·N⌉ (ppm),
    * estimate and exact both = first bin/value whose cumulative count
    * reaches it. All integers. Returns per level:
    * (level_ppm, target_rank, exact_q, binned_q, err_ppm).
    *
    * Scale: the histogram side is the scale path (bin-grain agg,
    * map-side combine, tiny ordered window). The exact side windows
    * the distinct-VALUE rollup — the bounded verification kernel
    * (q34's bucket≡naive pattern), not the production path. */
  def binnedQuantileAudit(df: DataFrame, valueCol: Column, binWidth: Long,
      levelsPpm: Seq[Long]): DataFrame = {
    require(binWidth > 0, "binWidth > 0")
    require(levelsPpm.nonEmpty, "need at least one level")
    val d = df.select(valueCol.cast("long").as("__x"))
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val levels = spark.createDataFrame(
      levelsPpm.map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("level_ppm",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val n1 = d.agg(count(lit(1)).as("__n"))
    // target rank: ceil(level·N / 1e6), exact in integers
    val tgt = levels.crossJoin(broadcast(n1))
      .withColumn("target_rank",
        expr("(level_ppm * __n + 999999) div 1000000"))
      .select(col("level_ppm"), col("target_rank"))
    val hist = d.groupBy(expr(s"__x div $binWidth").as("__bin"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(
        Window.orderBy(col("__bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val binned = tgt.join(hist, col("__cum") >= col("target_rank"))
      .groupBy(col("level_ppm"), col("target_rank"))
      .agg(((min(col("__bin")) + 1) * binWidth - 1).as("binned_q"))
    val vals = d.groupBy(col("__x")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(
        Window.orderBy(col("__x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val exact = tgt.join(vals, col("__cum") >= col("target_rank"))
      .groupBy(col("level_ppm"))
      .agg(min(col("__x")).as("exact_q"))
    binned.join(exact, "level_ppm")
      .withColumn("err_ppm",
        expr("1000000 * (binned_q - exact_q) div exact_q"))
      .select(col("level_ppm"), col("target_rank"), col("exact_q"),
        col("binned_q"), col("err_ppm"))
  }
}
