package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Sketches, TextAnalysis}
import graft.ops.{Layout, TimeSeriesOps}

/** Round-4 (batch 12): the remaining sketch family (HyperLogLog
  * cardinality, Bloom membership), trend-aware smoothing (Holt),
  * integer readability scoring, and the zone-map pruning audit that
  * quantifies what a clustered layout saves at 100 TB. Same
  * hash-exactness discipline as Analytics/Analytics2: integer/decimal
  * decision arithmetic; float ops only on identical exact operands. */
object Analytics3 {

  /** The q159 nibble-reassembly idiom: the j-th (0-based) 8-hex-char
    * chunk of md5(key) as a 32-bit integer, mod `m` — DuckDB's side of
    * the md5-derived hash family shared by count-min, HLL and Bloom. */
  private def chunkSql(j: Int, key: String, m: Int): String =
    s"""(SELECT CAST(sum(CAST(strpos('0123456789abcdef',
       |    substr(md5(CAST($key AS VARCHAR)), ${j * 8} + i, 1)) - 1
       |    AS BIGINT) << ((8 - i) * 4)) AS BIGINT)
       |  FROM (SELECT unnest(range(1, 9)) AS i)) % $m""".stripMargin

  /** Raw (un-modded) variant: the j-th 32-bit chunk as a plain value —
    * HLL's rank word. */
  private def chunkRawSql(j: Int, key: String): String =
    s"""(SELECT CAST(sum(CAST(strpos('0123456789abcdef',
       |    substr(md5(CAST($key AS VARCHAR)), ${j * 8} + i, 1)) - 1
       |    AS BIGINT) << ((8 - i) * 4)) AS BIGINT)
       |  FROM (SELECT unnest(range(1, 9)) AS i))""".stripMargin

  /** q171 — E6: HyperLogLog distinct-count sketch, register-exact.
    * Per return flag, the 64-register HLL over l_partkey: the md5-
    * derived register table ([[Sketches.hllRegisters]]) is exact
    * integer state, so the oracle rebuilds it bit-for-bit — including
    * the scaled indicator sum AND the raw estimate (one IEEE division
    * of identical operands by a shared literal). `n_exact` rides along
    * to show the estimate landing within the ~1.04/√64 ≈ 13% band.
    * SketchSpec pins the merge law for Spark's own HLL; this pins OURS
    * against a second engine. */
  val q171 = Declared(
    "q171_hll_distinct", "E6",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val regs = Sketches.hllRegisters(li, Seq(col("l_returnflag")),
        col("l_partkey"), m = 64)
      val est = Sketches.hllEstimate(regs, Seq("l_returnflag"), m = 64)
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      est.join(exact, "l_returnflag")
        .select(col("l_returnflag"), col("n_exact"), col("registers_hit"),
          col("sum_scaled"), col("est_hll"))
        .orderBy(col("l_returnflag"))
    },
    Some {
      val numLit = Sketches.hllAlpha(64) * 64 * 64 * (1L << 33).toDouble
      s"""WITH h AS (
         |  SELECT l_returnflag,
         |    ${chunkSql(0, "l_partkey", 64)} AS idx,
         |    ${chunkRawSql(1, "l_partkey")} AS w
         |  FROM lineitem),
         |regs AS (
         |  SELECT l_returnflag, idx,
         |    max(CASE WHEN w = 0 THEN 33
         |             ELSE 33 - length(format('{:b}', w)) END) AS m_rank
         |  FROM h GROUP BY 1, 2),
         |est AS (
         |  SELECT l_returnflag, count(*) AS registers_hit,
         |    CAST(sum(CAST(1 AS BIGINT) << (33 - m_rank)) +
         |      (64 - count(*)) * 8589934592 AS BIGINT) AS sum_scaled
         |  FROM regs GROUP BY 1),
         |exact AS (
         |  SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact
         |  FROM lineitem GROUP BY 1)
         |SELECT e.l_returnflag, x.n_exact, e.registers_hit, e.sum_scaled,
         |  $numLit / CAST(e.sum_scaled AS DOUBLE) AS est_hll
         |FROM est e JOIN exact x ON e.l_returnflag = x.l_returnflag
         |ORDER BY e.l_returnflag""".stripMargin
    },
    "The register table is ONE (group, idx)-keyed agg with map-side combine — " +
      "shuffle volume <= groups*64 rows at any input size, and register max is " +
      "associative+commutative so any merge tree (1000 executors, any layout) " +
      "yields the bit-identical sketch. THE distinct-count plan at 100 TB, where " +
      "exact countDistinct shuffles every key.")

  /** q172 — E6/J1-pushdown: Bloom-filter membership audit. Build a
    * 256-bit / 3-hash filter over the 15 allow-listed suppliers
    * (nations 0–4), probe every distinct lineitem supplier, and tally
    * the confusion row: members all hit (no false negatives — the
    * Bloom guarantee), non-members occasionally hit (false positives —
    * the tunable cost). The whole filter state and every verdict is
    * integer md5 arithmetic, so the oracle reproduces the EXACT bit
    * set and the exact false-positive count, not a rate bound. */
  val q172 = Declared(
    "q172_bloom_filter", "E6,J1",
    (s, dir) => {
      val allow = Tables.supplier(s, dir)
        .filter(col("s_nationkey") < 5).select(col("s_suppkey"))
      val bloom = Sketches.bloomBuild(allow, col("s_suppkey"), bits = 256, k = 3)
      val probed = Sketches.bloomProbe(bloom, Tables.lineitem(s, dir),
        col("l_suppkey"), bits = 256, k = 3)
      val withTruth = probed.join(
        allow.withColumnRenamed("s_suppkey", "key").withColumn("__m", lit(1)),
        Seq("key"), "left")
      val summary = withTruth.agg(
        count(lit(1)).as("n_probed"),
        sum(col("positive").cast("long")).as("n_positive"),
        sum(coalesce(col("__m"), lit(0)).cast("long")).as("n_member"),
        sum(when(col("positive") === 1 && col("__m").isNull, 1L).otherwise(0L))
          .as("n_false_pos"),
        sum(when(col("positive") === 0 && col("__m") === 1, 1L).otherwise(0L))
          .as("n_false_neg"))
      bloom.agg(count(lit(1)).as("bits_set")).crossJoin(summary)
    },
    Some {
      val arms = (0 until 3)
      val buildArms = arms.map(j =>
        s"SELECT ${chunkSql(j, "s_suppkey", 256)} AS bit FROM allow")
        .mkString("\n    UNION ALL\n    ")
      val probeArms = arms.map(j =>
        s"SELECT key, $j AS j, ${chunkSql(j, "key", 256)} AS bit FROM probes")
        .mkString("\n    UNION ALL\n    ")
      s"""WITH allow AS (
         |  SELECT s_suppkey FROM supplier WHERE s_nationkey < 5),
         |bloom AS (
         |  SELECT DISTINCT bit FROM (
         |    $buildArms)),
         |probes AS (
         |  SELECT DISTINCT l_suppkey AS key FROM lineitem),
         |pb AS (
         |    $probeArms),
         |hits AS (
         |  SELECT pb.key,
         |    sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS hits
         |  FROM pb LEFT JOIN bloom b ON pb.bit = b.bit
         |  GROUP BY pb.key),
         |w AS (
         |  SELECT h.key, CASE WHEN h.hits = 3 THEN 1 ELSE 0 END AS pos,
         |    CASE WHEN a.s_suppkey IS NOT NULL THEN 1 ELSE 0 END AS mem
         |  FROM hits h LEFT JOIN allow a ON h.key = a.s_suppkey)
         |SELECT (SELECT count(*) FROM bloom) AS bits_set,
         |  count(*) AS n_probed,
         |  CAST(sum(pos) AS BIGINT) AS n_positive,
         |  CAST(sum(mem) AS BIGINT) AS n_member,
         |  CAST(sum(CASE WHEN pos = 1 AND mem = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_false_pos,
         |  CAST(sum(CASE WHEN pos = 0 AND mem = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_false_neg
         |FROM w""".stripMargin
    },
    "The filter is the DISTINCT of <= k*|allowlist| bucket ids — bounded by `bits` " +
      "rows, broadcast to the probe side; probes never shuffle. This is semi-join " +
      "pushdown's engine: ship the bit set into the 100 TB scan and drop " +
      "non-members before any join. False-positive rows are the only wasted IO, " +
      "and this audit MEASURES that cost exactly.")

  /** q173 — A5/A8: Holt double-exponential smoothing (level + trend,
    * α = 1/5, β = 1/10, milli-scaled integer state) over each order
    * priority's daily order count. Where q156's EWMA lags any trending
    * series by design, Holt's trend term closes the gap — and
    * `forecast_s = level + trend` IS the one-step-ahead forecast. The
    * recurrence runs as [[TimeSeriesOps.holtInt]]'s ordered fold; the
    * oracle unrolls the SAME truncating-division recurrence as a
    * recursive CTE, so every scaled state hash-matches. */
  val q173 = Declared(
    "q173_holt_trend", "A5,A8",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n"))
      TimeSeriesOps.holtInt(daily, Seq(col("o_orderpriority")), col("day"),
          col("n"), aNum = 1, aDen = 5, bNum = 1, bDen = 10, scale = 1000)
        .select(col("o_orderpriority"), col("order").as("day"),
          col("value").as("n"), col("level_s"), col("trend_s"),
          col("forecast_s"))
        .orderBy(col("o_orderpriority"), col("day"))
    },
    Some("""WITH RECURSIVE d AS (
           |  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
           |    count(*) AS n
           |  FROM orders GROUP BY 1, 2),
           |r AS (
           |  SELECT pri, day, CAST(n AS BIGINT) AS n,
           |    row_number() OVER (PARTITION BY pri ORDER BY day) AS rn
           |  FROM d),
           |s AS (
           |  SELECT pri, rn, day, n, n * 1000 AS l, CAST(0 AS BIGINT) AS b
           |  FROM r WHERE rn = 1
           |  UNION ALL
           |  SELECT r.pri, r.rn, r.day, r.n,
           |    (1 * r.n * 1000 + 4 * (s.l + s.b)) // 5 AS l,
           |    (1 * ((1 * r.n * 1000 + 4 * (s.l + s.b)) // 5 - s.l) + 9 * s.b) // 10
           |      AS b
           |  FROM r JOIN s ON r.pri = s.pri AND r.rn = s.rn + 1)
           |SELECT pri AS o_orderpriority, day, n, l AS level_s, b AS trend_s,
           |  l + b AS forecast_s
           |FROM s ORDER BY o_orderpriority, day""".stripMargin),
    "Same scale contract as q156's EWMA: one key-partitioned shuffle, fold state " +
      "bounded by the key's ROLLUP-grain series (calendar days, not order volume). " +
      "Aggregate 100 TB of facts to the grain first; the smoother then costs " +
      "O(days-per-key) — the capacity-planning forecaster at any volume.")

  /** q174 — E4: Flesch reading-ease in exact integer milli-points over
    * every document — the readability axis of the corpus quality gate
    * (q87 gates on length/symbol ratios; this gates on prose
    * complexity). Counts are regexp cardinalities (letter-words,
    * sentence-punctuation runs, vowel-group syllable proxy); the
    * textbook float formula is re-expressed as truncating integer
    * division so both engines agree bit-for-bit. */
  val q174 = Declared(
    "q174_readability", "E4",
    (s, dir) =>
      TextAnalysis.readability(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          col("text"))
        .select(col("doc_id"), col("words"), col("sentences"),
          col("syllables"), col("flesch_milli"), col("band"))
        .orderBy(col("doc_id")),
    Some("""WITH w AS (
           |  SELECT doc_id,
           |    CAST(greatest(1, len(regexp_extract_all(lower(text), '[a-z]+')))
           |      AS BIGINT) AS words,
           |    CAST(greatest(1, len(regexp_extract_all(lower(text), '[.!?]+')))
           |      AS BIGINT) AS sentences,
           |    CAST(greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+')))
           |      AS BIGINT) AS syllables
           |  FROM documents),
           |f AS (
           |  SELECT doc_id, words, sentences, syllables,
           |    206835 - (1015 * words) // sentences - (84600 * syllables) // words
           |      AS flesch_milli
           |  FROM w)
           |SELECT doc_id, words, sentences, syllables, flesch_milli,
           |  CASE WHEN flesch_milli >= 90000 THEN 'very_easy'
           |       WHEN flesch_milli >= 60000 THEN 'standard'
           |       WHEN flesch_milli >= 30000 THEN 'difficult'
           |       ELSE 'very_confusing' END AS band
           |FROM f ORDER BY doc_id""".stripMargin),
    "Pure scan-side codegen'd regexp arithmetic — no shuffle, no UDF, prunes to " +
      "the text column only. Composes into the quality gate as one more pushdown-" +
      "friendly predicate; at crawl scale the score is computed in the same pass " +
      "that tokenizes.")

  /** q175 — E6: zone-map pruning audit — the measured answer to 'why
    * cluster 100 TB?'. The same Q1-1998 shipdate predicate is audited
    * against two physical layouts of lineitem: natural insertion order
    * (chunk = l_orderkey div 256 — every chunk spans all dates, zero
    * pruning) vs date-clustered (chunk = shipweek — zone maps become
    * tight and ~96% of chunks prune). prune_ppm is exactly the
    * fraction of the table a footer-stats reader never fetches. */
  val q175 = Declared(
    "q175_zone_map_audit", "E6",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val days = datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
      val lo = java.time.LocalDate.of(1998, 1, 1).toEpochDay
      val hi = java.time.LocalDate.of(1998, 3, 31).toEpochDay
      Layout.zoneMapAudit(li, "by_orderkey",
          expr("l_orderkey div 256"), days, lo, hi)
        .unionAll(Layout.zoneMapAudit(li, "by_shipweek",
          expr("datediff(to_date(l_shipdate), '1970-01-01') div 7"),
          days, lo, hi))
        .orderBy(col("layout"))
    },
    Some {
      val lo = java.time.LocalDate.of(1998, 1, 1).toEpochDay
      val hi = java.time.LocalDate.of(1998, 3, 31).toEpochDay
      def arm(layout: String, chunk: String) =
        s"""SELECT '$layout' AS layout, count(*) AS chunks,
           |    CAST(sum(CASE WHEN mx < $lo OR mn > $hi THEN 1 ELSE 0 END)
           |      AS BIGINT) AS chunks_pruned,
           |    CAST(sum(n) AS BIGINT) AS rows_total,
           |    CAST(sum(CASE WHEN mx < $lo OR mn > $hi THEN n ELSE 0 END)
           |      AS BIGINT) AS rows_skipped,
           |    CAST(sum(sel) AS BIGINT) AS rows_selected
           |  FROM (
           |    SELECT $chunk AS chunk, min(d) AS mn, max(d) AS mx,
           |      count(*) AS n,
           |      sum(CASE WHEN d BETWEEN $lo AND $hi THEN 1 ELSE 0 END) AS sel
           |    FROM b GROUP BY 1)""".stripMargin
      s"""WITH b AS (
         |  SELECT l_orderkey,
         |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
         |  FROM lineitem),
         |u AS (
         |  ${arm("by_orderkey", "l_orderkey // 256")}
         |  UNION ALL
         |  ${arm("by_shipweek", "d // 7")})
         |SELECT layout, chunks, chunks_pruned, rows_total, rows_skipped,
         |  rows_selected,
         |  (1000000 * rows_skipped) // rows_total AS prune_ppm
         |FROM u ORDER BY layout""".stripMargin
    },
    "The audit itself is one chunk-keyed agg (map-side combined to |chunks| rows) " +
      "+ a |chunks|-sized final agg — cheap enough to run as a planning pass. Its " +
      "verdict is the layout decision: the by_shipweek row's prune_ppm is the " +
      "fraction of a 100 TB scan that Z-order/sort clustering (q38, " +
      "Layout.writeZordered) converts from IO into footer reads.")

  val all: Seq[Declared] = Seq(q171, q172, q173, q174, q175)
}
