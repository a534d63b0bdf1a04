package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, Binning, Dominance, EventAnalytics}
import graft.ext.{Dedup, Graph}

/** Round-4 (continued) order-statistics + graph analytics coverage:
  * skyline dominance, CUSUM change detection, equal-frequency
  * binning over exact distributed ranks, triangle counting, lagged
  * cross-correlation and last-touch attribution. Same hash-exactness
  * discipline as Events: integer/decimal decision arithmetic, IEEE
  * ops only on identical operands. */
object Analytics {

  /** Co-purchase part graph shared by q128/q134: parts sharing an
    * order (keys filtered by `modulus` to bound the fixture) are
    * adjacent; edges are distinct (p1 < p2) pairs. */
  private def coPurchaseEdges(s: org.apache.spark.sql.SparkSession,
      dir: String, modulus: Int): org.apache.spark.sql.DataFrame = {
    val pr = Tables.lineitem(s, dir).filter(col("l_orderkey") % modulus === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    pr.select(col("l_orderkey"), col("l_partkey").as("p1"))
      .join(pr.select(col("l_orderkey"), col("l_partkey").as("p2")), "l_orderkey")
      .filter(col("p1") < col("p2"))
      .select(col("p1"), col("p2")).distinct()
  }

  /** q125 — W-frame/O1: 2-D skyline of orders — the Pareto frontier
    * minimizing order day and maximizing total price ("no earlier
    * order was worth as much"). The engine's two-phase plan (per-day
    * rollup → prefix max over the |days|-row rollup → broadcast-join
    * filter) must equal the oracle's direct window formulation. No
    * arithmetic on the double column — only comparisons — so the hash
    * matches unrounded. */
  val q125 = Declared(
    "q125_skyline", "W-frame,O1",
    (s, dir) => {
      // o_orderdate is TIMESTAMP_NTZ (no unix_micros); epoch-day via
      // date difference — exact integer on both engines
      val d = Tables.orders(s, dir).select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("day"),
        col("o_totalprice"))
      Dominance.skyline2D(d, "day", "o_totalprice")
        .select(col("o_orderkey"), col("day"), col("o_totalprice"))
        .orderBy(col("day"), col("o_orderkey"))
    },
    Some("""WITH d AS (
           |  SELECT o_orderkey,
           |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
           |         o_totalprice
           |  FROM orders),
           |m AS (SELECT day, max(o_totalprice) AS ymax FROM d GROUP BY day),
           |p AS (
           |  SELECT day, ymax,
           |    max(ymax) OVER (ORDER BY day
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before
           |  FROM m)
           |SELECT o_orderkey, day, o_totalprice
           |FROM d JOIN p USING (day)
           |WHERE o_totalprice = ymax AND (before IS NULL OR o_totalprice > before)
           |ORDER BY day, o_orderkey""".stripMargin),
    "The O(n²) dominance join reduces to one agg keyed on x + a prefix max over the " +
      "|distinct x|-row rollup + a broadcast filter — no window ever touches the fact " +
      "table globally, so the plan is one uniform shuffle at any scale.")

  /** q126 — W-frame/A5: CUSUM drift flags per event type — positions
    * where the running deviation from the series mean escapes the
    * 2σ·√k random-walk envelope. The decision is a SQUARED all-integer
    * inequality in DECIMAL(38,0)/HUGEINT ((n·P_k − k·S)² > 4·k·(n·Q −
    * S²) over cent-quantized values), so no float accumulation, mean
    * division or sqrt exists to diverge between engines. */
  val q126 = Declared(
    "q126_cusum", "W-frame,A5",
    (s, dir) =>
      EventAnalytics.cusumFlags(Tables.events(s, dir),
          "event_type", "ts", "event_id", "value", cNum = 2, cDen = 1)
        .orderBy(col("event_type"), col("k")),
    Some("""WITH v AS (
           |  SELECT event_type, ts, event_id,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
           |  FROM events),
           |t AS (
           |  SELECT event_type, count(*) AS n,
           |    CAST(sum(vc) AS HUGEINT) AS s,
           |    CAST(sum(CAST(vc AS HUGEINT) * vc) AS HUGEINT) AS q
           |  FROM v GROUP BY event_type),
           |r AS (
           |  SELECT event_type, event_id,
           |    CAST(sum(vc) OVER w AS HUGEINT) AS pk,
           |    CAST(row_number() OVER w AS HUGEINT) AS k
           |  FROM v WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           |SELECT r.event_type, CAST(r.k AS BIGINT) AS k, r.event_id
           |FROM r JOIN t USING (event_type)
           |WHERE (n*pk - k*s) * (n*pk - k*s) > 4 * k * (n*q - s*s)
           |ORDER BY event_type, k""".stripMargin),
    "One groupBy(key) for the totals (broadcast back) + one key-partitioned window " +
      "sort — the q105 cost envelope. CUSUM is inherently sequential per key; a " +
      "year-long hot key splits by per-day subtotal carry (the q92 two-phase trick).")

  /** q127 — A9/W-frame: equal-frequency deciles of order value (pandas
    * qcut's rank flavor) — bin = (rank−1)·10 div N + 1 over the exact
    * GLOBAL rank, which the engine computes distributed (range
    * repartition + per-partition row_number + bounded offset rollup)
    * and the oracle computes with its single-node row_number. Bucket
    * populations differ by at most one; boundary values land by
    * (value, key) tie order identically on both sides. */
  val q127 = Declared(
    "q127_qcut", "A9,W-frame",
    (s, dir) => {
      val d = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
      Binning.qcut(d, "o_totalprice", "o_orderkey", 10)
        .groupBy(col("bin")).agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
        .orderBy(col("bin"))
    },
    Some("""WITH r AS (
           |  SELECT o_orderkey, o_totalprice,
           |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
           |    count(*) OVER () AS n_total
           |  FROM orders)
           |SELECT CAST((rn - 1) * 10 // n_total + 1 AS INT) AS bin,
           |  count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
           |FROM r GROUP BY 1 ORDER BY bin""".stripMargin),
    "Exact global rank without the single-partition window: range repartition keeps " +
      "cross-partition order, ranks are per-partition row_numbers plus a " +
      "|partitions|-row prefix-summed offset rollup — rank and bin are " +
      "boundary-independent because the (value, key) order is total.")

  /** q128 — E2/X4: per-node triangle counts of the co-purchase part
    * graph (parts sharing an order are adjacent). The engine orients
    * edges by (degree, id) — capping wedge fan-out at O(√m) under any
    * skew — while the oracle orients by id alone; each triangle is
    * counted exactly once either way, so the per-node counts must
    * agree bit-for-bit. */
  val q128 = Declared(
    "q128_triangles", "E2,X4",
    (s, dir) =>
      Graph.triangleCounts(coPurchaseEdges(s, dir, 10), "p1", "p2")
        .orderBy(col("node")),
    Some("""WITH pr AS (
           |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
           |  WHERE l_orderkey % 10 = 0),
           |e AS (
           |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           |  FROM pr a JOIN pr b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
           |tri AS (
           |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
           |  FROM e e1 JOIN e e2 ON e2.u = e1.v
           |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
           |SELECT node, count(*) AS n_triangles
           |FROM (SELECT unnest([a, b, c]) AS node FROM tri)
           |GROUP BY node ORDER BY node""".stripMargin),
    "Degree-ordered orientation bounds the wedge join at O(m^1.5) rows total and — " +
      "the skew story — makes every hub a wedge TARGET, never a fan-out source. All " +
      "joins are node-keyed equi-joins; the pair space of the naive formulation " +
      "never materializes.")

  /** q129 — A1/E4: lagged cross-correlation between the hourly 'view'
    * and 'purchase' value series at lags 0..6h — the lead-indicator
    * readout. Hourly sums quantize to cents; Pearson r per lag comes
    * from the q82 closed form over exact integer sums, so the only
    * float ops (final division, sqrt) run on identical operands in
    * both engines. */
  val q129 = Declared(
    "q129_lag_corr", "A1,E4",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      def hourly(t: String, alias: String) = ev
        .filter(col("event_type") === t)
        .groupBy(expr("unix_micros(ts) div 3600000000").as("bin"))
        .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as(alias))
      val paired = hourly("view", "xc")
        .withColumn("lag", explode(sequence(lit(0L), lit(6L))))
        .join(hourly("purchase", "yc").withColumnRenamed("bin", "ybin"),
          col("ybin") === col("bin") + col("lag"))
      Aggregates.linearFitExact(paired, Seq(col("lag")), col("xc"), col("yc"))
        .select(col("lag"), col("n"), col("corr"))
        .orderBy(col("lag"))
    },
    Some("""WITH x AS (
           |  SELECT epoch_us(ts) // 3600000000 AS bin,
           |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS xc
           |  FROM events WHERE event_type = 'view' GROUP BY 1),
           |y AS (
           |  SELECT epoch_us(ts) // 3600000000 AS bin,
           |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS yc
           |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
           |p AS (
           |  SELECT l.lag, x.xc, y.yc
           |  FROM x CROSS JOIN (SELECT unnest(range(0, 7)) AS lag) l
           |  JOIN y ON y.bin = x.bin + l.lag),
           |a AS (
           |  SELECT lag, count(*) AS n,
           |    CAST(sum(xc) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy,
           |    CAST(sum(xc*yc) AS BIGINT) AS sxy,
           |    CAST(sum(xc*xc) AS BIGINT) AS sxx,
           |    CAST(sum(yc*yc) AS BIGINT) AS syy
           |  FROM p GROUP BY lag),
           |f AS (
           |  SELECT lag, n,
           |    CAST(n*sxy - sx*sy AS DOUBLE) AS covn,
           |    CAST(n*sxx - sx*sx AS DOUBLE) AS varxn,
           |    CAST(n*syy - sy*sy AS DOUBLE) AS varyn
           |  FROM a)
           |SELECT lag, n,
           |  CASE WHEN varxn <> 0 AND varyn <> 0
           |       THEN covn / (sqrt(varxn) * sqrt(varyn)) END AS corr
           |FROM f ORDER BY lag""".stripMargin),
    "Two hourly rollups (map-side partials, uniform bin keys) + a 7-way lag explode " +
      "joined on the bin id — |bins|·7 rows, not |events|·7 — then one exact-sum agg " +
      "per lag. The event table is scanned twice with pushed type filters, never " +
      "shuffled whole.")

  /** q130 — W2/F5: last-touch attribution — each purchase credits the
    * user's most recent preceding non-purchase event under the
    * (ts, event_id) total order; first-session purchases credit
    * '(none)'. IGNORE-NULLS last over the strict ROWS..−1 frame on
    * both engines; counts are integers, so the hash matches
    * unrounded. */
  val q130 = Declared(
    "q130_attribution", "W2,F5",
    (s, dir) =>
      EventAnalytics.lastTouchAttribution(Tables.events(s, dir),
          "user_id", "ts", "event_id", "event_type", "purchase")
        .orderBy(col("attributed_type")),
    Some("""WITH a AS (
           |  SELECT event_type, user_id,
           |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
           |               IGNORE NULLS)
           |      OVER (PARTITION BY user_id ORDER BY ts, event_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
           |  FROM events)
           |SELECT coalesce(touch, '(none)') AS attributed_type,
           |  count(*) AS conversions, count(DISTINCT user_id) AS users
           |FROM a WHERE event_type = 'purchase'
           |GROUP BY 1 ORDER BY attributed_type""".stripMargin),
    "One actor-partitioned window (uniform shuffle key) + a |event types|-row agg — " +
      "attribution as a single pass, not a per-conversion lookup. The classic " +
      "marketing-credit primitive at any event volume.")

  /** q131 — A5/A1: time-weighted average of each user's event values —
    * each value holds until the user's next event, no extrapolation
    * past the last. Cent-quantized values × µs durations: both sums
    * exact DECIMAL(38,0)/HUGEINT; the single float division runs on
    * identical operands, so the result hash-matches unrounded. */
  val q131 = Declared(
    "q131_twap", "A5,A1",
    (s, dir) =>
      graft.ops.TimeSeriesOps.twap(Tables.events(s, dir),
          "user_id", "ts", "event_id", "value")
        .orderBy(col("user_id")),
    Some("""WITH v AS (
           |  SELECT user_id, event_id, epoch_us(ts) AS us,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
           |  FROM events),
           |l AS (
           |  SELECT user_id, vc,
           |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dt
           |  FROM v)
           |SELECT user_id, count(*) AS n_intervals,
           |  CAST(sum(dt) AS BIGINT) AS span_us,
           |  CAST(sum(CAST(vc AS HUGEINT) * dt) AS DOUBLE)
           |    / (CAST(sum(dt) AS DOUBLE) * 100) AS twap
           |FROM l WHERE dt IS NOT NULL
           |GROUP BY user_id ORDER BY user_id""".stripMargin),
    "One actor-keyed window sort for the lead + a map-side-partial agg to |users| rows. " +
      "The tick-stream average that a plain mean gets wrong under bursty arrival — and " +
      "the exactness discipline makes it reproducible under any partitioning.")

  /** q132 — A5/W2: hourly OHLC candles over purchase values. Open and
    * close are (ts, event_id)-first/-last — ascending/descending
    * row_number flags folded into one hash agg, so first/last are
    * total-order-deterministic on both engines (no arg-min tie
    * ambiguity). No value arithmetic → unrounded hash match. */
  val q132 = Declared(
    "q132_ohlc", "A5,W2",
    (s, dir) =>
      graft.ops.TimeSeriesOps.ohlcBars(
          Tables.events(s, dir).filter(col("event_type") === "purchase"),
          "ts", "event_id", "value", 3600000000L)
        .orderBy(col("bin")),
    Some("""WITH b AS (
           |  SELECT epoch_us(ts) // 3600000000 AS bin, value,
           |    row_number() OVER (PARTITION BY epoch_us(ts) // 3600000000
           |      ORDER BY ts, event_id) AS ra,
           |    row_number() OVER (PARTITION BY epoch_us(ts) // 3600000000
           |      ORDER BY ts DESC, event_id DESC) AS rd
           |  FROM events WHERE event_type = 'purchase')
           |SELECT bin, max(CASE WHEN ra = 1 THEN value END) AS open,
           |  max(value) AS high, min(value) AS low,
           |  max(CASE WHEN rd = 1 THEN value END) AS close,
           |  count(*) AS n
           |FROM b GROUP BY bin ORDER BY bin""".stripMargin),
    "One shuffle+sort keyed on the time bin (naturally balanced across history); the " +
      "agg is map-side-partial on the same key. The candle readout every monitoring " +
      "dashboard draws, with deterministic open/close under ties.")

  /** q133 — E4: collocation extraction — the corpus's top-20
    * adjacent-token bigrams by PMI (min pair count 5). The rank never
    * takes a log: PMI is monotone in n_xy·N/(n_x·n_y), and that
    * quotient of exact integer products is the same IEEE double on
    * both engines; ties break on the bigram itself. */
  val q133 = Declared(
    "q133_pmi", "E4",
    (s, dir) =>
      graft.ext.TextAnalysis.pmiCollocations(
          Tables.documents(s, dir), "text", minCount = 5, topK = 20)
        .orderBy(col("score").desc, col("w1"), col("w2")),
    Some("""WITH tok AS (
           |  SELECT regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
           |uni AS (
           |  SELECT w, count(*) AS n
           |  FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w),
           |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM uni),
           |bi AS (
           |  SELECT t[i] AS w1, t[i + 1] AS w2, count(*) AS n_xy
           |  FROM (SELECT t, unnest(range(1, len(t))) AS i
           |        FROM tok WHERE len(t) >= 2)
           |  GROUP BY 1, 2 HAVING count(*) >= 5)
           |SELECT w1, w2, n_xy,
           |  CAST(n_xy * n_tot AS DOUBLE) / CAST(a.n * b.n AS DOUBLE) AS score
           |FROM bi JOIN uni a ON bi.w1 = a.w JOIN uni b ON bi.w2 = b.w
           |CROSS JOIN tot
           |ORDER BY score DESC, w1, w2 LIMIT 20""".stripMargin),
    "Two content-keyed aggs + two vocabulary joins (Zipf heads are the skew — AQE " +
      "splits them) + a 1-row broadcast; top-k is a TakeOrdered, never a global sort. " +
      "The phrase-mining primitive for tokenizer/vocab curation.")

  /** q134 — E2/X4: 3-core of the co-purchase part graph after 5 FIXED
    * peel rounds (Matula–Beck bulk peeling). Fixed rounds make the
    * result a pure function of the input — the oracle unrolls the
    * SAME 5 rounds as chained CTEs, so the survivors and residual
    * degrees must match bit-for-bit, converged or not. */
  val q134 = Declared(
    "q134_kcore", "E2,X4",
    (s, dir) =>
      Graph.kCore(coPurchaseEdges(s, dir, 7), "p1", "p2", k = 3, rounds = 5)
        .orderBy(col("node")),
    Some {
      val rounds = (0 until 5).map { r =>
        s"""k$r AS (SELECT src FROM e$r GROUP BY src HAVING count(*) >= 3),
           |e${r + 1} AS (
           |  SELECT e.src, e.dst FROM e$r e
           |  JOIN k$r a ON e.src = a.src JOIN k$r b ON e.dst = b.src)""".stripMargin
      }.mkString(",\n")
      s"""WITH pr AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
         |  WHERE l_orderkey % 7 = 0),
         |ed AS (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM pr a JOIN pr b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |e0 AS (SELECT u AS src, v AS dst FROM ed
         |       UNION ALL SELECT v AS src, u AS dst FROM ed),
         |$rounds
         |SELECT src AS node, count(*) AS degree
         |FROM e5 GROUP BY src ORDER BY node""".stripMargin
    },
    "Each round is one degree agg + two node-keyed semi-joins over the checkpointed " +
      "edge list — uniform keys, zero driver traffic, constant plan depth. Bulk " +
      "peeling halves the graph per round in practice; the dense-cluster extractor " +
      "for spam/bot detection on link graphs.")

  /** q135 — J-fuzzy/W2: sorted-neighborhood entity resolution — the
    * complementary blocking family to q108's prefix blocks. Clean part
    * names + planted last-char-dropped variants sort by name; only
    * records within 4 rank positions pair; levenshtein ≤ 2 verifies.
    * The engine's distributed rank (q127's machinery) must agree with
    * the oracle's single-node row_number — same total order. */
  val q135 = Declared(
    "q135_sorted_neighborhood", "J-fuzzy,W2",
    (s, dir) => {
      val parts = Tables.part(s, dir)
      val recs = parts.select(col("p_partkey").as("rec_id"), col("p_name").as("name"))
        .unionByName(parts.filter(col("p_partkey") % 11 === 0)
          .select((col("p_partkey") + 10000000L).as("rec_id"),
            expr("substring(p_name, 1, length(p_name) - 1)").as("name")))
      graft.ops.EntityResolution.sortedNeighborhoodPairs(
          recs, "name", "rec_id", window = 4, maxDist = 2)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH recs AS (
           |  SELECT p_partkey AS rec_id, p_name AS name FROM part
           |  UNION ALL
           |  SELECT p_partkey + 10000000, substring(p_name, 1, length(p_name) - 1)
           |  FROM part WHERE p_partkey % 11 = 0),
           |r AS (SELECT rec_id, name,
           |        row_number() OVER (ORDER BY name, rec_id) AS rn
           |      FROM recs)
           |SELECT a.rec_id AS id_a, b.rec_id AS id_b,
           |  a.name AS key_a, b.name AS key_b,
           |  CAST(levenshtein(a.name, b.name) AS INT) AS distance
           |FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 4
           |WHERE levenshtein(a.name, b.name) <= 2
           |ORDER BY id_a, id_b""".stripMargin),
    "The pair space is |rows|·window, never |rows|² — the rank comes from the " +
      "distributed global row-number (no single-partition window), the neighborhood " +
      "is an offset explode + rank equi-join, and the banded levenshtein early-exits " +
      "at width 2. Catches first-character typos that prefix blocking (q108) misses.")

  /** q136 — E4: Stupid Backoff scoring — even-doc model scores odd-doc
    * probes; unseen bigrams fall back to the 0.4-discounted add-one
    * unigram, so the query exercises BOTH branches (the model has
    * never seen the probe docs). Micro-nat quantization before the
    * per-doc mean (q69's exactness argument). */
  val q136 = Declared(
    "q136_backoff", "E4",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.ext.TextAnalysis.stupidBackoffScore(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          "text", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""WITH m AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
           |p AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
           |mt AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w FROM m),
           |uni AS (SELECT w, count(*) AS nw FROM mt GROUP BY w),
           |tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM mt) AS n_tot,
           |               (SELECT CAST(count(*) AS BIGINT) FROM uni) AS n_vocab),
           |mb AS (
           |  SELECT t[i] AS w1, t[i + 1] AS w2
           |  FROM (SELECT regexp_split_to_array(lower(text), '\s+') AS t,
           |               unnest(range(1, len(regexp_split_to_array(lower(text), '\s+')))) AS i
           |        FROM m)),
           |pair AS (SELECT w1, w2, count(*) AS nxy FROM mb GROUP BY w1, w2),
           |head AS (SELECT w1, count(*) AS nhead FROM mb GROUP BY w1),
           |pb AS (
           |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t,
           |               unnest(range(1, len(regexp_split_to_array(lower(text), '\s+')))) AS i
           |        FROM p)),
           |sc AS (
           |  SELECT pb.doc_id,
           |    CAST(round(CASE WHEN pair.nxy IS NOT NULL
           |      THEN ln(CAST(pair.nxy AS DOUBLE) / head.nhead)
           |      ELSE ln(0.4 * (coalesce(uni.nw, 0) + 1) / (tot.n_tot + tot.n_vocab))
           |      END * 1e6, 0) AS BIGINT) AS ls
           |  FROM pb
           |  LEFT JOIN pair ON pb.w1 = pair.w1 AND pb.w2 = pair.w2
           |  LEFT JOIN head ON pb.w1 = head.w1
           |  LEFT JOIN uni ON pb.w2 = uni.w
           |  CROSS JOIN tot)
           |SELECT doc_id, count(*) AS n_bigrams,
           |  round(CAST(sum(ls) AS DOUBLE) / count(*) / 1e6, 6) AS mean_logsb
           |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "The production LM-quality shape: yesterday's corpus (model aggs, content-keyed " +
      "partials) scores today's crawl (probe joins, AQE-split Zipf heads); N and |V| " +
      "ride a 1-row broadcast. Stupid Backoff never normalizes — no per-head " +
      "distribution pass, which is exactly why it web-scales.")

  /** q137 — E2: directional CONTAINMENT near-dup — planted excerpts
    * (each doc's first 16 tokens as a new doc) must surface as
    * contained in their source even though Jaccard is far below any
    * near-dup threshold. The engine prunes with one-sided rare-shingle
    * prefixes; the oracle computes exact all-pairs containment over
    * the bounded corpus, so a green row proves zero missed pairs. */
  val q137 = Declared(
    "q137_containment", "E2",
    (s, dir) => {
      val base = Tables.documents(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id"), col("text"))
      val excerpts = base.select((col("doc_id") + 200000).as("doc_id"),
        array_join(slice(split(lower(col("text")), "\\s+"), 1, 16), " ").as("text"))
      Dedup.containmentPairs(base.unionByName(excerpts), "text", "doc_id",
          shingleSize = 2, tNum = 9, tDen = 10)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH base AS (
           |  SELECT doc_id, lower(text) AS text FROM documents WHERE doc_id < 150),
           |corpus AS (
           |  SELECT doc_id, text FROM base
           |  UNION ALL
           |  SELECT doc_id + 200000,
           |    array_to_string(regexp_split_to_array(text, '\s+')[1:16], ' ')
           |  FROM base),
           |d AS (
           |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] AS w
           |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t,
           |               unnest(range(1, len(regexp_split_to_array(lower(text), '\s+')))) AS i
           |        FROM corpus)),
           |c AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
           |i AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
           |  FROM d a JOIN d b ON a.w = b.w AND a.doc_id <> b.doc_id
           |  GROUP BY 1, 2)
           |SELECT id_a, id_b, inter, ca.n AS n_a
           |FROM i JOIN c ca ON i.id_a = ca.doc_id
           |WHERE inter * 10 >= ca.n * 9
           |ORDER BY id_a, id_b""".stripMargin),
    "Jaccard-blind duplication (quotes, page-in-page mirrors) needs the directional " +
      "measure. The one-sided rare-shingle prefix keeps recall complete for the " +
      "threshold while candidates stay hapax-keyed (anti-skew); the oracle's crossJoin " +
      "is the bounded ground truth, never the scale plan.")

  /** q138 — J-range/A5: interval × interval overlap join per user —
    * each user's view windows against their purchase windows (both
    * ±10 min half-open). The engine tiles time into 10-minute cells
    * and credits each pair to the cell holding max(s_a, s_b) — kept
    * exactly once, NO distinct — while the oracle states the textbook
    * inequality join. */
  val q138 = Declared(
    "q138_interval_join", "J-range,A5",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      def iv(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id"), col("event_id"), col("ts").as("s"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("e"))
      graft.ops.TimeSeriesOps.intervalOverlapJoin(
          iv("view"), iv("purchase"), "user_id", "event_id",
          "s", "e", 600000000L)
        .orderBy(col("user_id"), col("id_a"), col("id_b"))
    },
    Some("""WITH iv AS (
           |  SELECT user_id, event_id, event_type, ts AS s,
           |         ts + INTERVAL 10 MINUTE AS e
           |  FROM events WHERE event_type IN ('view', 'purchase'))
           |SELECT a.user_id AS user_id, a.event_id AS id_a, b.event_id AS id_b
           |FROM iv a JOIN iv b
           |  ON a.user_id = b.user_id
           | AND a.event_type = 'view' AND b.event_type = 'purchase'
           | AND a.s < b.e AND b.s < a.e
           |ORDER BY a.user_id, id_a, id_b""".stripMargin),
    "Directly expressed, Catalyst plans the inequality pair as a quadratic per-key " +
      "residual; the cell tiling makes it an equi-join on (user, time cell) with " +
      "arithmetic dedup — no |pairs| shuffle-distinct. Cell width ≈ interval length " +
      "is the selectivity knob at 100 TB.")

  /** q139 — W2/A1: top-20 length-3 event-type journeys — the n-gram
    * view of user paths, one rung above q102's pair transitions. Two
    * leads over the per-user (ts, event_id) order; full lexicographic
    * tie-break makes the top-k deterministic. */
  val q139 = Declared(
    "q139_top_paths", "W2,A1",
    (s, dir) =>
      EventAnalytics.topPaths(Tables.events(s, dir),
          "user_id", "ts", "event_id", "event_type", topK = 20)
        .orderBy(col("n").desc, col("s1"), col("s2"), col("s3")),
    Some("""WITH t AS (
           |  SELECT event_type AS s1,
           |    lead(event_type, 1) OVER w AS s2,
           |    lead(event_type, 2) OVER w AS s3
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
           |SELECT s1, s2, s3, count(*) AS n
           |FROM t WHERE s2 IS NOT NULL AND s3 IS NOT NULL
           |GROUP BY s1, s2, s3
           |ORDER BY n DESC, s1, s2, s3 LIMIT 20""".stripMargin),
    "One actor-keyed window shuffle; the triple space is |event types|³-bounded so " +
      "the agg output is tiny and top-k plans as TakeOrdered. The journey-mining " +
      "readout product analytics runs daily.")

  /** q140 — A5/U3: rolling 24-hour distinct actives at hourly steps —
    * the window Spark can't express (`count(DISTINCT) OVER RANGE`),
    * made exact with a BOUNDED fan-out: dedup to (user, hour) first,
    * then explode each to the ≤ 24 window-ends it serves. */
  val q140 = Declared(
    "q140_rolling_actives", "A5,U3",
    (s, dir) =>
      EventAnalytics.rollingActives(Tables.events(s, dir),
          "user_id", "ts", windowBins = 24, binMicros = 3600000000L)
        .orderBy(col("w")),
    Some("""WITH uh AS (
           |  SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS h FROM events),
           |b AS (SELECT max(h) AS mx FROM uh),
           |e AS (SELECT user_id, h + i AS w
           |      FROM uh, (SELECT unnest(range(0, 24)) AS i) u)
           |SELECT w, count(DISTINCT user_id) AS active
           |FROM e, b WHERE w <= mx
           |GROUP BY w ORDER BY w""".stripMargin),
    "The explode factor is the window/step ratio — a fixed resolution knob — and it " +
      "fans out the DEDUPED (actor, bin) set, not raw events. Both shuffles key " +
      "uniformly; the rolling-DAU curve every ops dashboard draws, exactly.")

  /** q141 — E4: Shannon token entropy per source — the
    * lexical-diversity signal a mixing pipeline reads per domain.
    * Per-token log-probs quantize to micro-nats; Σ c·lp is an exact
    * long; only the final division touches floats (identical
    * operands). */
  val q141 = Declared(
    "q141_entropy", "E4",
    (s, dir) =>
      graft.ext.TextAnalysis.tokenEntropy(
          Tables.documents(s, dir), "text", "source")
        .orderBy(col("source")),
    Some("""WITH tk AS (
           |  SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |  FROM documents),
           |cnt AS (SELECT source, w, count(*) AS c FROM tk GROUP BY source, w),
           |tot AS (SELECT source, count(*) AS n_tokens FROM tk GROUP BY source),
           |sm AS (
           |  SELECT cnt.source, n_tokens, count(*) AS n_vocab,
           |    CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE) / n_tokens) * 1e6, 0)
           |                      AS BIGINT)) AS BIGINT) AS s
           |  FROM cnt JOIN tot ON cnt.source = tot.source
           |  GROUP BY cnt.source, n_tokens)
           |SELECT source, n_tokens, n_vocab,
           |  round(-CAST(s AS DOUBLE) / n_tokens / 1e6, 6) AS entropy
           |FROM sm ORDER BY source""".stripMargin),
    "One (key, token) agg with map-side partials + a key-sized join; output is " +
      "|sources| rows. Template farms score low, organic text high — the diversity " +
      "dial of corpus mixing.")

  /** q142 — A1/W2: Gini concentration of per-user activity within
    * each event type — the bot/abuse skew signal. Exact integer
    * numerator/denominator over rank-weighted counts; Σ i·cᵢ is
    * tie-order-invariant, so both engines agree bit-for-bit. */
  val q142 = Declared(
    "q142_gini", "A1,W2",
    (s, dir) =>
      EventAnalytics.giniConcentration(Tables.events(s, dir),
          "event_type", "user_id")
        .orderBy(col("event_type")),
    Some("""WITH c AS (
           |  SELECT event_type, user_id, count(*) AS c
           |  FROM events GROUP BY 1, 2),
           |r AS (SELECT event_type, c,
           |        row_number() OVER (PARTITION BY event_type ORDER BY c, user_id) AS i
           |      FROM c),
           |a AS (SELECT event_type, count(*) AS n_actors,
           |        CAST(sum(c) AS BIGINT) AS n_events,
           |        CAST(sum(i * c) AS BIGINT) AS s
           |      FROM r GROUP BY event_type)
           |SELECT event_type, n_actors, n_events,
           |  CAST(2 * s - (n_actors + 1) * n_events AS DOUBLE)
           |    / CAST(n_actors * n_events AS DOUBLE) AS gini
           |FROM a ORDER BY event_type""".stripMargin),
    "Volume collapses at the (type, user) partial agg; the ranking window runs on " +
      "|types|·|users| rows, not events. The inequality readout that flags " +
      "single-actor domination however large the stream.")

  /** q143 — A5/A1: DAU/MAU stickiness per active day — daily actives
    * over trailing-30-day actives, both from the same bounded-explode
    * rolling-actives machinery (q140), ratio of exact longs. */
  val q143 = Declared(
    "q143_stickiness", "A5,A1",
    (s, dir) => {
      // ONE event scan + dedup serves both window widths (the oracle's
      // shared `ud` CTE); cached because the two widths are separate
      // Spark jobs over the same |users|·|days| frame
      val ud = graft.core.OperatorCaches.cached(
        Tables.events(s, dir).select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("__d")).distinct())
      val dau = EventAnalytics.rollingActivesFromBins(ud, "user_id", "__d", 1)
        .withColumnRenamed("active", "dau")
      val mau = EventAnalytics.rollingActivesFromBins(ud, "user_id", "__d", 30)
        .withColumnRenamed("active", "mau")
      dau.join(mau, "w")
        .withColumn("stickiness", col("dau").cast("double") / col("mau"))
        .orderBy(col("w"))
    },
    Some("""WITH ud AS (
           |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
           |b AS (SELECT max(d) AS mx FROM ud),
           |dau AS (SELECT d AS w, count(DISTINCT user_id) AS dau FROM ud GROUP BY d),
           |me AS (SELECT user_id, d + i AS w
           |       FROM ud, (SELECT unnest(range(0, 30)) AS i) u),
           |mau AS (SELECT w, count(DISTINCT user_id) AS mau
           |        FROM me, b WHERE w <= mx GROUP BY w)
           |SELECT w, dau, mau, CAST(dau AS DOUBLE) / mau AS stickiness
           |FROM dau JOIN mau USING (w) ORDER BY w""".stripMargin),
    "Two passes of the same bounded fan-out over the deduped (user, day) set — the " +
      "30× explode is the resolution knob, never data-dependent. The canonical " +
      "engagement ratio, exact.")

  /** q144 — A1/F6: cohort LTV curve — cumulative purchase value per
    * user by days-since-cohort, the revenue view of q94's retention
    * grid. Cents-exact cells cumulated over the bounded
    * (cohort, k) grid; the per-user division is the one float op. */
  val q144 = Declared(
    "q144_cohort_ltv", "A1,F6",
    (s, dir) =>
      EventAnalytics.cohortValueCurve(Tables.events(s, dir),
          "user_id", "ts", "value", "event_type", "purchase", maxDays = 7)
        .orderBy(col("cohort_day"), col("k")),
    Some("""WITH fs AS (
           |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
           |  FROM events GROUP BY user_id),
           |cs AS (SELECT cohort_day, count(*) AS cohort_users FROM fs GROUP BY cohort_day),
           |pv AS (
           |  SELECT fs.cohort_day,
           |    CAST(CAST(e.ts AS DATE) - fs.cohort_day AS BIGINT) AS k,
           |    sum(CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cell
           |  FROM events e JOIN fs ON e.user_id = fs.user_id
           |  WHERE e.event_type = 'purchase'
           |    AND CAST(e.ts AS DATE) - fs.cohort_day BETWEEN 0 AND 7
           |  GROUP BY 1, 2),
           |grid AS (SELECT cohort_day, unnest(range(0, 8)) AS k FROM cs),
           |cum AS (
           |  SELECT g.cohort_day, g.k,
           |    CAST(sum(coalesce(pv.cell, 0)) OVER (
           |      PARTITION BY g.cohort_day ORDER BY g.k
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumv
           |  FROM grid g LEFT JOIN pv ON g.cohort_day = pv.cohort_day AND g.k = pv.k)
           |SELECT c.cohort_day AS cohort_day, c.k, cs.cohort_users,
           |  CAST(cumv AS DOUBLE) / (cs.cohort_users * 100) AS ltv_per_user
           |FROM cum c JOIN cs ON c.cohort_day = cs.cohort_day
           |ORDER BY c.cohort_day, c.k""".stripMargin),
    "Two actor-keyed aggs + one actor join; the cumulative window runs on the " +
      "|days|·8 grid, never on events. The unit-economics readout next to q94's " +
      "retention counts.")

  /** q145 — J-anti/A1: referential-integrity audit against DAMAGED
    * dimension snapshots (every 5th customer, every 7th part dropped —
    * simulating a bad partition load): orphan counts per relation.
    * Anti-joins with pushed filters; the intact lineitem→orders
    * relation pins the zero row. */
  val q145 = Declared(
    "q145_ri_audit", "J-anti,A1",
    (s, dir) => {
      val orders = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val cust = Tables.customer(s, dir).filter(col("c_custkey") % 5 =!= 0)
      val part = Tables.part(s, dir).filter(col("p_partkey") % 7 =!= 0)
      def audit(rel: String, child: org.apache.spark.sql.DataFrame,
          childKey: String, parent: org.apache.spark.sql.DataFrame,
          parentKey: String) =
        child.join(parent, child(childKey) === parent(parentKey), "left_anti")
          .agg(count(lit(1)).as("orphans"))
          .withColumn("relation", lit(rel))
      audit("lineitem->orders", li, "l_orderkey", orders, "o_orderkey")
        .unionByName(audit("lineitem->part", li, "l_partkey", part, "p_partkey"))
        .unionByName(audit("orders->customer", orders, "o_custkey", cust, "c_custkey"))
        .select(col("relation"), col("orphans"))
        .orderBy(col("relation"))
    },
    Some("""WITH cust AS (SELECT c_custkey FROM customer WHERE c_custkey % 5 <> 0),
           |pt AS (SELECT p_partkey FROM part WHERE p_partkey % 7 <> 0)
           |SELECT 'lineitem->orders' AS relation,
           |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
           |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS orphans
           |UNION ALL
           |SELECT 'lineitem->part',
           |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
           |    (SELECT 1 FROM pt WHERE pt.p_partkey = l.l_partkey))
           |UNION ALL
           |SELECT 'orders->customer',
           |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
           |    (SELECT 1 FROM cust WHERE cust.c_custkey = o.o_custkey))
           |ORDER BY relation""".stripMargin),
    "Each relation is one anti-join on its key — the child side never carries payload " +
      "columns past the scan, and at 100 TB the damaged-dimension side broadcasts. " +
      "The nightly data-quality gate every warehouse runs.")

  /** q146 — A1/E2: market-basket association rules — directional
    * confidence and lift for part pairs co-ordered ≥ 2 times.
    * Both measures are quotients of exact integer counts (the q133
    * rational-ranking argument), so the hash matches unrounded. */
  val q146 = Declared(
    "q146_market_basket", "A1,E2",
    (s, dir) =>
      graft.ops.Associations.pairRules(
          Tables.lineitem(s, dir).filter(col("l_orderkey") % 3 === 0)
            .select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", minSupport = 2)
        .orderBy(col("lift").desc, col("item_x"), col("item_y")),
    Some("""WITH bi AS (
           |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i
           |  FROM lineitem WHERE l_orderkey % 3 = 0),
           |n AS (SELECT count(DISTINCT b) AS n_b FROM bi),
           |freq AS (SELECT i, count(*) AS n_i FROM bi GROUP BY i),
           |pairs AS (
           |  SELECT a.i AS x, b.i AS y, count(*) AS n_xy
           |  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
           |  GROUP BY 1, 2 HAVING count(*) >= 2),
           |rules AS (
           |  SELECT x, y, n_xy FROM pairs
           |  UNION ALL SELECT y, x, n_xy FROM pairs)
           |SELECT r.x AS item_x, r.y AS item_y, r.n_xy, fx.n_i AS n_x,
           |  CAST(r.n_xy AS DOUBLE) / fx.n_i AS confidence,
           |  CAST(r.n_xy * n.n_b AS DOUBLE)
           |    / CAST(fx.n_i * fy.n_i AS DOUBLE) AS lift
           |FROM rules r
           |JOIN freq fx ON r.x = fx.i JOIN freq fy ON r.y = fy.i
           |CROSS JOIN n
           |ORDER BY lift DESC, item_x, item_y""".stripMargin),
    "Pair generation is basket-keyed (k² per basket, never |items|²) and the support " +
      "threshold prunes before the Zipf-skewed frequency joins (AQE splits staples). " +
      "The cross-sell primitive, exact.")

  /** q147 — A-quantile: weighted median order-line price per return
    * flag, weighted by quantity — the quantile Spark has no builtin
    * for. All-integer crossing test (2·cumw ≥ W); the price column is
    * never touched arithmetically. */
  val q147 = Declared(
    "q147_weighted_median", "A-quantile",
    (s, dir) =>
      Aggregates.weightedMedian(Tables.lineitem(s, dir),
          Seq(col("l_returnflag")), col("l_extendedprice"),
          col("l_quantity").cast("decimal(18,2)"),
          Seq(col("l_orderkey"), col("l_linenumber")))
        .orderBy(col("l_returnflag")),
    Some("""WITH r AS (
           |  SELECT l_returnflag, l_extendedprice,
           |    sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)) OVER (
           |      PARTITION BY l_returnflag
           |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
           |    sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)) OVER (
           |      PARTITION BY l_returnflag) AS w_total
           |  FROM lineitem)
           |SELECT l_returnflag, min(l_extendedprice) AS weighted_median,
           |  CAST(min(w_total) AS BIGINT) AS total_weight
           |FROM r WHERE cumw * 2 >= w_total
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    "One key-partitioned window sort (the q07 envelope) + a |keys|-row min. Weighted " +
      "quantiles are what duration/volume-weighted SLOs actually need; ties in the " +
      "value are safe because any tie order crosses inside the same value run.")

  /** q149 — U-merge/J1: CDC log application — orders become a change
    * log over the customer dimension (every 13th order key is a
    * delete, the rest upsert the account balance); each key's LATEST
    * op under the (o_orderdate, o_orderkey) total order wins, deletes
    * drop the row even if the base had it, untouched customers pass
    * through. The lakehouse "apply_changes" compaction as one
    * window + one full-outer join. */
  val q149 = Declared(
    "q149_cdc_apply", "U-merge,J1",
    (s, dir) => {
      val base = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_acctbal"))
      val delta = Tables.orders(s, dir).select(
        col("o_custkey").as("c_custkey"),
        col("o_orderdate"), col("o_orderkey"),
        when(col("o_orderkey") % 13 === 0, lit("D")).otherwise(lit("U")).as("op"),
        col("o_totalprice").as("new_bal"))
      graft.ops.Dimensions.applyCdc(base, delta, "c_custkey",
          Seq(col("o_orderdate"), col("o_orderkey")), "op")
        .select(col("c_custkey"), col("c_acctbal"), col("op"), col("new_bal"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH delta AS (
           |  SELECT o_custkey AS c_custkey, o_orderdate, o_orderkey,
           |    CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
           |    o_totalprice AS new_bal
           |  FROM orders),
           |latest AS (
           |  SELECT c_custkey, op, new_bal FROM (
           |    SELECT *, row_number() OVER (PARTITION BY c_custkey
           |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           |    FROM delta) WHERE rn = 1)
           |SELECT c.c_custkey AS c_custkey, c.c_acctbal, l.op, l.new_bal
           |FROM customer c FULL OUTER JOIN latest l USING (c_custkey)
           |WHERE l.op IS NULL OR l.op <> 'D'
           |ORDER BY c_custkey""".stripMargin),
    "The window runs over the LOG (delta-sized), never the snapshot; the merge is one " +
      "business-key full-outer join. Out-of-order delivery cannot change the outcome " +
      "because 'latest' is a total order — the compaction every lakehouse table runs.")

  /** q150 — A1/F5: time-BOUNDED funnel — view → click within 30 min →
    * purchase within 30 min of the click. The unbounded q93 funnel
    * over-counts lazy conversions; this is the windowed form product
    * analytics ships. Same conditional-min shape, one agg per
    * stage. */
  val q150 = Declared(
    "q150_windowed_funnel", "A1,F5",
    (s, dir) =>
      EventAnalytics.windowedFunnelReachTimes(Tables.events(s, dir),
          "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), withinSeconds = 1800)
        .agg(count(col("t_view")).as("reached_view"),
          count(col("t_click")).as("reached_click"),
          count(col("t_purchase")).as("reached_purchase")),
    Some("""WITH s1 AS (
           |  SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS t_view
           |  FROM events GROUP BY user_id),
           |s2 AS (
           |  SELECT s1.user_id, s1.t_view,
           |    min(e.ts) FILTER (WHERE e.event_type = 'click'
           |      AND e.ts > s1.t_view
           |      AND e.ts <= s1.t_view + INTERVAL 1800 SECOND) AS t_click
           |  FROM events e JOIN s1 ON e.user_id = s1.user_id
           |  GROUP BY s1.user_id, s1.t_view),
           |s3 AS (
           |  SELECT s2.user_id, s2.t_view, s2.t_click,
           |    min(e.ts) FILTER (WHERE e.event_type = 'purchase'
           |      AND e.ts > s2.t_click
           |      AND e.ts <= s2.t_click + INTERVAL 1800 SECOND) AS t_purchase
           |  FROM events e JOIN s2 ON e.user_id = s2.user_id
           |  GROUP BY s2.user_id, s2.t_view, s2.t_click)
           |SELECT count(t_view) AS reached_view,
           |       count(t_click) AS reached_click,
           |       count(t_purchase) AS reached_purchase
           |FROM s3""".stripMargin),
    "k stages = k actor-keyed conditional-min aggs (map-side partials, uniform actor " +
      "shuffle); the 30-minute bound is a scan-side predicate, so the windowed form " +
      "costs exactly what the unbounded one does.")

  /** q151 — A-quantile/A1: winsorized mean — per return flag, clip
    * line prices at the exact lower-convention p10/p90 (all-integer
    * crossing over the (price, key) total order), then average the
    * clipped values with the round-sum-then-divide convention. The
    * robust mean every metrics pipeline ships next to the raw one. */
  val q151 = Declared(
    "q151_winsorize", "A-quantile,A1",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      def q(num: Long, as: String) =
        Aggregates.weightedQuantile(li, Seq(col("l_returnflag")),
            col("l_extendedprice"), lit(1L),
            Seq(col("l_orderkey"), col("l_linenumber")), num, 10)
          .select(col("l_returnflag"), col("weighted_quantile").as(as))
      li.join(broadcast(q(1, "p10")), "l_returnflag")
        .join(broadcast(q(9, "p90")), "l_returnflag")
        .withColumn("__clip",
          least(greatest(col("l_extendedprice"), col("p10")), col("p90")))
        .groupBy(col("l_returnflag"), col("p10"), col("p90"))
        .agg(count(lit(1)).as("n"),
          (round(sum(col("__clip").cast("decimal(18,2)")), 2).cast("double") /
            count(lit(1))).as("win_mean"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH r AS (
           |  SELECT l_returnflag, l_extendedprice,
           |    row_number() OVER (PARTITION BY l_returnflag
           |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
           |    count(*) OVER (PARTITION BY l_returnflag) AS nn
           |  FROM lineitem),
           |q AS (
           |  SELECT l_returnflag,
           |    min(CASE WHEN rn * 10 >= nn * 1 THEN l_extendedprice END) AS p10,
           |    min(CASE WHEN rn * 10 >= nn * 9 THEN l_extendedprice END) AS p90
           |  FROM r GROUP BY l_returnflag)
           |SELECT li.l_returnflag AS l_returnflag, q.p10, q.p90,
           |  count(*) AS n,
           |  CAST(round(sum(CAST(least(greatest(l_extendedprice, p10), p90)
           |    AS DECIMAL(18,2))), 2) AS DOUBLE) / count(*) AS win_mean
           |FROM lineitem li JOIN q USING (l_returnflag)
           |GROUP BY li.l_returnflag, q.p10, q.p90
           |ORDER BY l_returnflag""".stripMargin),
    "The quantiles come from one key-partitioned window sort (shared by both cuts); the " +
      "clip pass is scan-side against two broadcast |keys|-row frames. Winsorization is " +
      "the outlier guard that keeps means reportable at any scale.")

  /** q152 — A-stat: Mann–Whitney U between returned ('R') and
    * accepted ('A') line quantities — the rank-sum A/B test with
    * textbook average-rank ties kept integral via DOUBLED ranks.
    * Heavy ties (quantities 1..50) exercise the tie path hard. */
  val q152 = Declared(
    "q152_mannwhitney", "A-stat",
    (s, dir) =>
      Aggregates.mannWhitneyU(Tables.lineitem(s, dir),
        col("l_quantity"), col("l_returnflag"), "A", "R"),
    Some("""WITH d AS (
           |  SELECT l_returnflag AS g, l_quantity AS v FROM lineitem
           |  WHERE l_returnflag IN ('A', 'R')),
           |pv AS (
           |  SELECT v, count(*) AS cnt,
           |    sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS ca
           |  FROM d GROUP BY v),
           |rk AS (
           |  SELECT v, cnt, ca,
           |    2 * coalesce(sum(cnt) OVER (ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      + cnt + 1 AS rank2
           |  FROM pv),
           |a AS (
           |  SELECT CAST(sum(ca) AS BIGINT) AS n_a,
           |    CAST(sum(cnt - ca) AS BIGINT) AS n_b,
           |    CAST(sum(CAST(ca AS HUGEINT) * rank2) AS HUGEINT) AS r2a
           |  FROM rk)
           |SELECT n_a, n_b,
           |  CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2_a,
           |  CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE)
           |    / CAST(CAST(n_a AS HUGEINT) * n_b AS DOUBLE) - 1 AS rank_biserial
           |FROM a""".stripMargin),
    "Ranks come from the DISTINCT-VALUE rollup (50 rows here) — the ordered window " +
      "never touches the fact table, so the test costs one value-keyed agg at any " +
      "volume. The nonparametric A/B readout for skewed metrics.")

  /** q153 — A-stat: chi-square independence of event type × 6-hour
    * time-of-day bucket. Each cell term is a quotient of exact
    * DECIMAL(38,0)/HUGEINT products quantized to micro-units before
    * the sum (the q74 trick), so accumulation order cannot move a
    * bit. */
  val q153 = Declared(
    "q153_chisq", "A-stat",
    (s, dir) =>
      Aggregates.chiSquare(
        Tables.events(s, dir).withColumn("hod_bucket", expr("hour(ts) div 6")),
        col("event_type"), col("hod_bucket")),
    Some("""WITH obs AS (
           |  SELECT event_type AS r, hour(ts) // 6 AS c, count(*) AS o
           |  FROM events GROUP BY 1, 2),
           |rm AS (SELECT r, sum(o) AS rsum FROM obs GROUP BY r),
           |cm AS (SELECT c, sum(o) AS csum FROM obs GROUP BY c),
           |cells AS (
           |  SELECT rm.r, cm.c, coalesce(obs.o, 0) AS o
           |  FROM rm CROSS JOIN cm
           |  LEFT JOIN obs ON obs.r = rm.r AND obs.c = cm.c),
           |tot AS (SELECT CAST(sum(o) AS HUGEINT) AS nn,
           |               count(DISTINCT r) AS nr, count(DISTINCT c) AS nc
           |        FROM obs),
           |t AS (
           |  SELECT CAST(round(
           |    CAST(CAST(o AS HUGEINT) * nn - CAST(rsum AS HUGEINT) * csum AS DOUBLE)
           |      * CAST(CAST(o AS HUGEINT) * nn - CAST(rsum AS HUGEINT) * csum AS DOUBLE)
           |      / CAST(CAST(rsum AS HUGEINT) * csum * nn AS DOUBLE)
           |      * 1e6, 0) AS BIGINT) AS term
           |  FROM cells JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN tot)
           |SELECT round(CAST(sum(term) AS DOUBLE) / 1e6, 6) AS chi2,
           |  (SELECT CAST((nr - 1) * (nc - 1) AS BIGINT) FROM tot) AS dof,
           |  (SELECT CAST(nn AS BIGINT) FROM tot) AS n
           |FROM t""".stripMargin),
    "One (r, c) contingency agg + two marginal rollups joined back — contingency-sized, " +
      "never data-sized. The independence check behind seasonality/anomaly triage.")

  val all: Seq[Declared] = Seq(q125, q126, q127, q128, q129, q130,
    q131, q132, q133, q134, q135, q136, q137, q138, q139,
    q140, q141, q142, q143, q144, q145, q146, q147, q149, q150,
    q151, q152, q153)
}
