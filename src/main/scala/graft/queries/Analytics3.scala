package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Sketches, TextAnalysis}
import graft.ops.{Evaluation, Layout, TimeSeriesOps}

/** Round-4 (batches 12-13): the remaining sketch family (HyperLogLog
  * cardinality, Bloom membership, KMV bottom-k), trend-aware smoothing
  * (Holt), integer readability scoring, the zone-map pruning audit,
  * and the offline evaluation family (exact AUC, retrieval P@k/R@k/MRR,
  * per-class F1, decile lift) that
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

  /** q176 — A-stat: exact ROC AUC per lineitem line number — does the
    * discount level predict a return? Doubled-pair counts over the
    * distinct-score rollup ([[Evaluation.aucExact]]) keep the metric
    * integral; the one float op divides identical exact integers. */
  val q176 = Declared(
    "q176_auc", "E13",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      Evaluation.aucExact(li, Seq(col("l_linenumber")),
        (col("l_discount").cast("decimal(18,2)") * 100).cast("long"),
        (col("l_returnflag") === "R").cast("int"))
        .orderBy(col("l_linenumber"))
    },
    Some("""WITH b AS (
           |  SELECT l_linenumber,
           |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS s,
           |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
           |  FROM lineitem),
           |r AS (
           |  SELECT l_linenumber, s, count(*) AS cnt,
           |    CAST(sum(y) AS BIGINT) AS pos
           |  FROM b GROUP BY 1, 2),
           |w AS (
           |  SELECT l_linenumber, pos, cnt - pos AS neg,
           |    COALESCE(CAST(sum(cnt - pos) OVER (PARTITION BY l_linenumber
           |      ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |      AS BIGINT), 0) AS nb
           |  FROM r)
           |SELECT l_linenumber, CAST(sum(pos) AS BIGINT) AS n_pos,
           |  CAST(sum(neg) AS BIGINT) AS n_neg,
           |  CAST(sum(pos * (2 * nb + neg)) AS BIGINT) AS u2,
           |  CASE WHEN sum(pos) > 0 AND sum(neg) > 0 THEN
           |    CAST(sum(pos * (2 * nb + neg)) AS DOUBLE) /
           |    CAST(2 * CAST(sum(pos) AS HUGEINT) * CAST(sum(neg) AS HUGEINT)
           |         AS DOUBLE)
           |  END AS auc
           |FROM w GROUP BY l_linenumber
           |ORDER BY l_linenumber""".stripMargin),
    "The ordered window runs on the (group, distinct-score) rollup — 11 discount " +
      "levels per group — never the fact table; shuffle volume is rollup-sized at " +
      "any input size. This is the gate-audit primitive: run it on a quality " +
      "score before sorting 100 TB by that score (q180 shows the lift view).")

  /** q177 — E3/A-stat: retrieval evaluation of cosine top-10 against
    * label ground truth — P@10, R@10 and reciprocal rank per query in
    * exact ppm. Ranks come from the q44-proven IEEE cosine (folds in
    * index order on both engines); everything after the rank is
    * integer `div`. */
  val q177 = Declared(
    "q177_retrieval_eval", "E13",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") % 10 === 1)
      val runs = graft.ext.Similarity.topKCosineBatch(
        emb, q, "embedding", "vec_id", k = 10)
        .select(col("query_id"), col("item_id"), col("rank"))
      val items = emb.select(col("vec_id").as("item_id"), col("label"))
      val truth = q.select(col("vec_id").as("query_id"), col("label"))
        .join(items, Seq("label"))
        .filter(col("item_id") =!= col("query_id"))
        .select(col("query_id"), col("item_id"))
      Evaluation.retrievalEval(runs, truth, k = 10)
        .orderBy(col("query_id"))
    },
    Some("""WITH e AS (
           |  SELECT vec_id, label,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings),
           |q AS (SELECT * FROM e WHERE vec_id % 10 = 1),
           |scored AS (
           |  SELECT q.vec_id AS query_id, e.vec_id AS item_id,
           |    e.label AS item_label, q.label AS query_label,
           |    list_dot_product(e.v, q.v) /
           |      (sqrt(list_dot_product(e.v, e.v)) *
           |       sqrt(list_dot_product(q.v, q.v))) AS c
           |  FROM e, q WHERE e.vec_id <> q.vec_id),
           |runs AS (
           |  SELECT query_id, item_id, item_label, query_label,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY c DESC, item_id ASC) AS rnk
           |  FROM scored),
           |hits AS (
           |  SELECT query_id, CAST(count(*) AS BIGINT) AS hits,
           |    CAST(min(rnk) AS BIGINT) AS firsthit
           |  FROM runs WHERE rnk <= 10 AND item_label = query_label
           |  GROUP BY 1),
           |nrel AS (
           |  SELECT q.vec_id AS query_id, CAST(count(*) AS BIGINT) AS n_rel
           |  FROM q JOIN e ON e.label = q.label AND e.vec_id <> q.vec_id
           |  GROUP BY 1)
           |SELECT nrel.query_id, n_rel,
           |  COALESCE(hits, 0) AS hits,
           |  COALESCE(firsthit, 0) AS first_hit_rank,
           |  1000000 * COALESCE(hits, 0) // 10 AS prec_ppm,
           |  CASE WHEN n_rel > 0
           |    THEN 1000000 * COALESCE(hits, 0) // n_rel END AS rec_ppm,
           |  CASE WHEN COALESCE(firsthit, 0) > 0
           |    THEN 1000000 // firsthit ELSE 0 END AS rr_ppm
           |FROM nrel LEFT JOIN hits ON nrel.query_id = hits.query_id
           |ORDER BY nrel.query_id""".stripMargin),
    "The scoring join is |Q|×|corpus| with the query side broadcast; at 100 TB " +
      "the run comes from the IVF/LSH path (q58/q59) instead and this op evaluates " +
      "it unchanged — metrics cost is run-sized (|Q|·k rows), never corpus-sized.")

  /** q178 — E4/A-stat: per-class precision/recall/F1 of the language-ID
    * heuristic against the labeled lang column — the per-class readout
    * of q47's confusion matrix, F1 via the integer identity
    * 2tp div (2tp+fp+fn). Classes are the union of labels and
    * predictions ('und' appears only as a prediction). */
  val q178 = Declared(
    "q178_class_metrics", "E13",
    (s, dir) => {
      val pred = Tables.documents(s, dir)
        .select(col("lang"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("lang"), TextAnalysis.langIdFromTokens(col("toks")).as("pred"))
      Evaluation.classMetrics(pred, col("lang"), col("pred"))
        .orderBy(col("class"))
    },
    Some {
      def score(l: String): String = {
        val words = TextAnalysis.stopwords(l).map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(toks, t -> list_contains([$words], t))) AS DOUBLE)" +
          s" / greatest(len(toks), 1) AS s_$l"
      }
      s"""WITH t AS (SELECT lang, regexp_split_to_array(lower(text), '\\s+') AS toks
         |           FROM documents),
         |s AS (SELECT lang, ${score("de")}, ${score("en")}, ${score("es")}, ${score("fr")}
         |      FROM t),
         |p AS (
         |  SELECT lang,
         |    CASE WHEN greatest(s_de, s_en, s_es, s_fr) < 0.02 THEN 'und'
         |         WHEN s_fr >= greatest(s_de, s_en, s_es) THEN 'fr'
         |         WHEN s_es >= greatest(s_de, s_en) THEN 'es'
         |         WHEN s_en >= s_de THEN 'en'
         |         ELSE 'de' END AS pred
         |  FROM s),
         |cells AS (SELECT lang AS l, pred AS pr, count(*) AS n FROM p GROUP BY 1, 2),
         |bt AS (SELECT l AS class, CAST(sum(n) AS BIGINT) AS n_true FROM cells GROUP BY 1),
         |bp AS (SELECT pr AS class, CAST(sum(n) AS BIGINT) AS n_pred FROM cells GROUP BY 1),
         |tpc AS (SELECT l AS class, CAST(n AS BIGINT) AS tp FROM cells WHERE l = pr),
         |j AS (
         |  SELECT COALESCE(bt.class, bp.class) AS class,
         |    COALESCE(n_true, 0) AS n_true, COALESCE(n_pred, 0) AS n_pred
         |  FROM bt FULL OUTER JOIN bp ON bt.class = bp.class)
         |SELECT j.class, n_true, n_pred, COALESCE(tp, 0) AS tp,
         |  n_pred - COALESCE(tp, 0) AS fp,
         |  n_true - COALESCE(tp, 0) AS fn,
         |  CASE WHEN n_pred > 0
         |    THEN 1000000 * COALESCE(tp, 0) // n_pred END AS prec_ppm,
         |  CASE WHEN n_true > 0
         |    THEN 1000000 * COALESCE(tp, 0) // n_true END AS rec_ppm,
         |  CASE WHEN 2 * COALESCE(tp, 0) + (n_pred - COALESCE(tp, 0))
         |         + (n_true - COALESCE(tp, 0)) > 0
         |    THEN 2000000 * COALESCE(tp, 0) //
         |      (2 * COALESCE(tp, 0) + (n_pred - COALESCE(tp, 0))
         |       + (n_true - COALESCE(tp, 0))) END AS f1_ppm
         |FROM j LEFT JOIN tpc ON j.class = tpc.class
         |ORDER BY j.class""".stripMargin
    },
    "Metrics aggregate the |classes|² confusion cells — the scan is q47's " +
      "(one tokenize pass, map-side combine); everything after is confusion-sized.")

  /** q179 — E6: KMV bottom-k distinct sketch per return flag over
    * l_partkey, verified register-exact like q171: the oracle rebuilds
    * the same 64 minimum md5-chunk hashes and the same integer
    * (k−1)·2³² div h_k estimate. `n_exact` rides along to show the
    * estimate inside the ~1/√(k−2) ≈ 13% band. */
  val q179 = Declared(
    "q179_kmv_distinct", "E13",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sk = Sketches.kmvSketch(li, Seq(col("l_returnflag")),
        col("l_partkey"), k = 64)
      val est = Sketches.kmvEstimate(sk, Seq("l_returnflag"), k = 64)
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      est.join(exact, "l_returnflag")
        .select(col("l_returnflag"), col("n_exact"), col("n_kept"),
          col("h_max"), col("est_kmv"))
        .orderBy(col("l_returnflag"))
    },
    Some {
      s"""WITH d AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
         |h0 AS (
         |  SELECT l_returnflag,
         |    ${chunkRawSql(0, "l_partkey")} AS h
         |  FROM d),
         |hd AS (SELECT DISTINCT l_returnflag, h FROM h0),
         |r AS (
         |  SELECT l_returnflag, h,
         |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
         |  FROM hd),
         |kk AS (
         |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_kept,
         |    max(h) AS h_max
         |  FROM r WHERE rn <= 64 GROUP BY 1),
         |x AS (
         |  SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact
         |  FROM lineitem GROUP BY 1)
         |SELECT kk.l_returnflag, n_exact, n_kept, h_max,
         |  CASE WHEN n_kept = 64 AND h_max > 0
         |    THEN CAST((63 * 4294967296) // h_max AS BIGINT)
         |    ELSE n_kept END AS est_kmv
         |FROM kk JOIN x ON kk.l_returnflag = x.l_returnflag
         |ORDER BY kk.l_returnflag""".stripMargin
    },
    "The (group, hash) DISTINCT map-side combines and the bottom-k rank filter " +
      "is a WindowGroupLimit (per-partition 64-heaps), so shuffle volume is " +
      "groups·k at any scale. Two KMV sketches also answer source-overlap " +
      "resemblance without rescanning either side (Sketches.kmvResemblance, " +
      "SketchSpec).")

  /** q180 — A-stat: cumulative gains / lift table — rank lineitem by
    * extended price (cents, exact global rank), cut into deciles, and
    * measure how much of the big-quantity class the top deciles
    * capture. All-integer: capture and lift are ppm integer `div`
    * quotients over the 10-row bin rollup. */
  val q180 = Declared(
    "q180_decile_lift", "E13",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("price_c"),
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
      Evaluation.decileLift(li,
        Seq(col("price_c").desc, col("l_orderkey").asc, col("l_linenumber").asc,
          col("l_partkey").asc, col("l_suppkey").asc, col("l_quantity").asc),
        (col("l_quantity") >= 40).cast("int"), nBins = 10)
        .orderBy(col("bin"))
    },
    Some("""WITH b AS (
           |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS price_c,
           |    l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
           |    CASE WHEN l_quantity >= 40 THEN 1 ELSE 0 END AS y
           |  FROM lineitem),
           |r AS (
           |  SELECT y,
           |    row_number() OVER (ORDER BY price_c DESC, l_orderkey, l_linenumber,
           |      l_partkey, l_suppkey, l_quantity) AS rn,
           |    count(*) OVER () AS total
           |  FROM b),
           |g AS (
           |  SELECT CAST((rn - 1) * 10 // total AS BIGINT) AS bin,
           |    count(*) AS n, sum(y) AS pos
           |  FROM r GROUP BY 1),
           |c AS (
           |  SELECT bin, CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS n_pos,
           |    CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cum_n,
           |    CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS cum_pos,
           |    CAST(sum(n) OVER () AS BIGINT) AS tn,
           |    CAST(sum(pos) OVER () AS BIGINT) AS tpos
           |  FROM g)
           |SELECT bin, n, n_pos, cum_n, cum_pos,
           |  CASE WHEN tpos > 0 THEN 1000000 * cum_pos // tpos END AS capture_ppm,
           |  CASE WHEN tpos > 0 THEN CAST(
           |    (1000000 * CAST(cum_pos AS HUGEINT) * tn) //
           |    (CAST(cum_n AS HUGEINT) * tpos) AS BIGINT) END AS lift_ppm
           |FROM c ORDER BY bin""".stripMargin),
    "The fact table is touched once (range repartition + per-partition sort — " +
      "Ranking.globalRowNumber, no single-partition window); every window after " +
      "runs on the 10-row bin rollup. The audit that justifies sorting 100 TB " +
      "by a quality score before truncation.")

  val all: Seq[Declared] = Seq(q171, q172, q173, q174, q175,
    q176, q177, q178, q179, q180)
}
