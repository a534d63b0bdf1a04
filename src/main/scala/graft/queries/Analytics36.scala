package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Round-9 batch: banded-DTW profile similarity, Huffman corpus bit
  * budget, Granger-style lagged predictivity — the time-series/
  * information-theoretic layer over the existing corpus ops. */
object Analytics36 {

  /** q480 — A-sim/X3: BANDED DTW SIMILARITY JOIN over per-user daily
    * spend profiles (14-day cent-exact vectors), Sakoe-Chiba band 2,
    * blocked by user-id range, global top-15 most-similar pairs. The
    * oracle replays the min-plus DP row by row in a recursive CTE with
    * an in-row list fold (the q330 LCS device, min-plus instead of
    * max), INF saturation and band mask included — every distance is
    * an exact long, so the ranking is bit-stable. */
  val q480 = {
    val INF = Long.MaxValue / 4 // 2305843009213693951
    val sql =
      s"""WITH RECURSIVE ev AS (
         |  SELECT user_id, CAST(day(ts) AS INT) AS d,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
         |  FROM events
         |  WHERE ts >= TIMESTAMP '2024-01-01'
         |    AND ts < TIMESTAMP '2024-01-15'),
         |ds AS (SELECT user_id, d, sum(cents) AS v FROM ev GROUP BY 1, 2),
         |users AS (SELECT DISTINCT user_id FROM ev),
         |grid AS (
         |  SELECT u.user_id, g.d FROM users u CROSS JOIN
         |    (SELECT CAST(x AS INT) AS d FROM generate_series(1, 14) t(x)) g),
         |prof AS MATERIALIZED (
         |  SELECT g.user_id, list(coalesce(ds.v, 0) ORDER BY g.d) AS p
         |  FROM grid g LEFT JOIN ds ON ds.user_id = g.user_id AND ds.d = g.d
         |  GROUP BY 1),
         |pairs AS MATERIALIZED (
         |  SELECT a.user_id AS ua, b.user_id AS ub, a.p AS pa, b.p AS pb
         |  FROM prof a JOIN prof b
         |    ON a.user_id // 50 = b.user_id // 50 AND a.user_id < b.user_id),
         |dtw(i, ua, ub, row) AS (
         |  SELECT 0, ua, ub,
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, 15), x -> CAST($INF AS BIGINT)))
         |  FROM pairs
         |  UNION ALL
         |  SELECT d.i + 1, d.ua, d.ub,
         |    list_reduce(
         |      list_prepend([CAST($INF AS BIGINT)],
         |        list_transform(range(1, 15), j -> [CAST(j AS BIGINT)])),
         |      (acc, x) -> list_append(acc,
         |        CASE
         |          WHEN abs(x[1] - (d.i + 1)) > 2 THEN CAST($INF AS BIGINT)
         |          WHEN least(d.row[x[1] + 1], acc[-1], d.row[x[1]])
         |            >= CAST($INF AS BIGINT) THEN CAST($INF AS BIGINT)
         |          ELSE least(d.row[x[1] + 1], acc[-1], d.row[x[1]])
         |            + abs(p.pa[d.i + 1] - p.pb[x[1]]) END))
         |  FROM dtw d JOIN pairs p ON p.ua = d.ua AND p.ub = d.ub
         |  WHERE d.i < 14),
         |fin AS (SELECT ua, ub, row[15] AS dist FROM dtw WHERE i = 14)
         |SELECT ua AS user_a, ub AS user_b, dist AS dtw
         |FROM fin WHERE dist < CAST($INF AS BIGINT)
         |ORDER BY dtw, user_a, user_b LIMIT 15""".stripMargin
    Declared(
      "q480_dtw_profile_pairs", "A-sim,X3",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("ts") >= lit("2024-01-01").cast("timestamp") &&
            col("ts") < lit("2024-01-15").cast("timestamp"))
          .select(col("user_id"), dayofmonth(col("ts")).as("d"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
        val daily = ev.groupBy(col("user_id"), col("d"))
          .agg(sum(col("cents")).as("v"))
        val prof = daily.groupBy(col("user_id"))
          .agg(map_from_entries(collect_list(
            struct(col("d"), col("v")))).as("m"))
          .select(col("user_id"),
            transform(sequence(lit(1), lit(14)),
              d => coalesce(element_at(col("m"), d), lit(0L))).as("prof"))
          .withColumn("blk", expr("user_id div 50"))
        graft.ops.TimeSeriesOps.dtwSimilarPairs(prof, "user_id", "blk",
            "prof", band = 2, topK = 15)
          .select(col("key_a").as("user_a"), col("key_b").as("user_b"),
            col("dtw"))
      },
      Some(sql),
      "Pairs form inside the user-range block (Σ|b|² fan-out — the " +
        "blocking dial of the PPJoin/LSH family), the DP kernel runs " +
        "as ONE static codegen call per pair inside the join stage, " +
        "and the finish is TakeOrdered. The elastic-alignment " +
        "similarity search behind behavioral cohorting at 100 TB: " +
        "cost is kernel × blocked fan-out, never all-pairs, never a " +
        "UDF boundary.")
  }

  /** q481 — E4: HUFFMAN CORPUS BIT BUDGET — exact optimal prefix-code
    * lengths over the top-63-token + OOV alphabet of the documents
    * corpus, with the corpus bit cost per token. The oracle replays
    * the deterministic greedy merge round by round in a recursive CTE
    * (per-root weights and the two-minimum pick via layered windows
    * over the single recursive reference — the q36 LU device). */
  val q481 = Declared(
    "q481_huffman_bits", "E4",
    (s, dir) => graft.ext.TextAnalysis.huffmanCodeLengths(
        Tables.documents(s, dir), col("text"), topV = 64)
      .orderBy(col("token")),
    Some("""WITH RECURSIVE freq AS MATERIALIZED (
           |  SELECT w AS token, count(*) AS c
           |  FROM (SELECT unnest(list_filter(
           |      regexp_split_to_array(lower(text), '\s+'),
           |      x -> x <> '')) AS w FROM documents)
           |  GROUP BY 1),
           |top AS MATERIALIZED (
           |  SELECT token, c FROM freq ORDER BY c DESC, token LIMIT 63),
           |tot AS (SELECT sum(c) AS t FROM freq),
           |leaves AS MATERIALIZED (
           |  SELECT token, c AS w FROM top
           |  UNION ALL
           |  SELECT '__oov__', t.t - (SELECT sum(c) FROM top) FROM tot t
           |  WHERE t.t - (SELECT sum(c) FROM top) > 0),
           |nv AS MATERIALIZED (SELECT count(*) AS n FROM leaves),
           |st(round, token, w, root, len) AS (
           |  SELECT 0, token, w, token, 0 FROM leaves
           |  UNION ALL
           |  SELECT round + 1, token, w,
           |    CASE WHEN rk <= 2 THEN min2 ELSE root END,
           |    len + CASE WHEN rk <= 2 THEN 1 ELSE 0 END
           |  FROM (
           |    SELECT *, min(CASE WHEN rk <= 2 THEN root END) OVER () AS min2
           |    FROM (
           |      SELECT *, dense_rank() OVER (ORDER BY root_w, root) AS rk
           |      FROM (
           |        SELECT round, token, w, root, len,
           |          sum(w) OVER (PARTITION BY root) AS root_w
           |        FROM st)))
           |  WHERE round < (SELECT n - 1 FROM nv)),
           |fin AS (
           |  SELECT token, w, len FROM st
           |  WHERE round = (SELECT n - 1 FROM nv))
           |SELECT token, CAST(w AS BIGINT) AS freq,
           |  CAST(len AS BIGINT) AS code_len,
           |  CAST(w * len AS BIGINT) AS bits
           |FROM fin ORDER BY token""".stripMargin),
    "ONE corpus pass (token rollup, map-side combine) + a TakeOrdered " +
      "top-V cut; the greedy merge folds 64 rows on the driver — the " +
      "vocabulary-literal altitude of the BPE/LM family. The " +
      "achievable-bit-budget readout that prices corpus storage and " +
      "dedup payoff before anything is shipped.")

  /** q482 — A5/A-stat: GRANGER LAG-1 PREDICTIVITY between the daily
    * click and purchase counts (does yesterday's click volume improve
    * the AR(1) prediction of today's purchases, and vice versa?). All
    * moments are exact HUGEINT/DECIMAL(38,0) sums; the F finish is the
    * identical pinned IEEE trajectory on both engines, emitted
    * UNROUNDED (q186 discipline). */
  val q482 = Declared(
    "q482_granger_lag1", "A5,A-stat",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("ts") < lit("2024-02-01").cast("timestamp"))
      val daily = ev.groupBy(dayofmonth(col("ts")).as("d"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      val grid = s.range(1, 31).select(col("id").cast("int").as("d"))
      val ser = grid.join(daily, Seq("d"), "left")
        .select(col("d"), coalesce(col("x"), lit(0L)).as("x"),
          coalesce(col("y"), lit(0L)).as("y"))
      graft.ops.TimeSeriesOps.grangerLag1(ser, col("d"), col("x"), col("y"))
        .orderBy(col("direction"))
    },
    Some("""WITH dd AS (
           |  SELECT CAST(day(ts) AS INT) AS d,
           |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
           |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
           |  FROM events WHERE ts < TIMESTAMP '2024-02-01' GROUP BY 1),
           |g AS (SELECT CAST(gs.x AS INT) AS d FROM generate_series(1, 30) gs(x)),
           |ser AS (
           |  SELECT g.d, CAST(coalesce(dd.x, 0) AS BIGINT) AS x,
           |    CAST(coalesce(dd.y, 0) AS BIGINT) AS y
           |  FROM g LEFT JOIN dd ON dd.d = g.d),
           |lg AS (
           |  SELECT x, y, lag(x) OVER (ORDER BY d) AS x1,
           |    lag(y) OVER (ORDER BY d) AS y1
           |  FROM ser),
           |s AS (
           |  SELECT CAST(count(*) AS HUGEINT) AS np,
           |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
           |    CAST(sum(x1) AS HUGEINT) AS sx1, CAST(sum(y1) AS HUGEINT) AS sy1,
           |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
           |    CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS sx1x1,
           |    CAST(sum(CAST(y1 AS HUGEINT) * y1) AS HUGEINT) AS sy1y1,
           |    CAST(sum(CAST(x AS HUGEINT) * x1) AS HUGEINT) AS sxx1,
           |    CAST(sum(CAST(x AS HUGEINT) * y1) AS HUGEINT) AS sxy1,
           |    CAST(sum(CAST(y AS HUGEINT) * y1) AS HUGEINT) AS syy1,
           |    CAST(sum(CAST(y AS HUGEINT) * x1) AS HUGEINT) AS syx1,
           |    CAST(sum(CAST(x1 AS HUGEINT) * y1) AS HUGEINT) AS sx1y1
           |  FROM lg WHERE x1 IS NOT NULL AND y1 IS NOT NULL),
           |dirs AS (
           |  SELECT 'x->y' AS direction,
           |    np * syy - sy * sy AS caa, np * syy1 - sy * sy1 AS cab,
           |    np * syx1 - sy * sx1 AS cac, np * sy1y1 - sy1 * sy1 AS cbb,
           |    np * sx1y1 - sx1 * sy1 AS cbc, np * sx1x1 - sx1 * sx1 AS ccc,
           |    np FROM s
           |  UNION ALL
           |  SELECT 'y->x',
           |    np * sxx - sx * sx, np * sxx1 - sx * sx1,
           |    np * sxy1 - sx * sy1, np * sx1x1 - sx1 * sx1,
           |    np * sx1y1 - sx1 * sy1, np * sy1y1 - sy1 * sy1,
           |    np FROM s),
           |fin AS (
           |  SELECT direction, CAST(np AS BIGINT) AS n,
           |    CASE WHEN np < 4 OR cbb = 0 OR cbb * ccc - cbc * cbc = 0
           |      THEN NULL
           |      ELSE CAST(caa AS DOUBLE)
           |        - CAST(cab AS DOUBLE) * CAST(cab AS DOUBLE)
           |          / CAST(cbb AS DOUBLE) END AS rss_r,
           |    CASE WHEN np < 4 OR cbb = 0 OR cbb * ccc - cbc * cbc = 0
           |      THEN NULL
           |      ELSE CAST(caa AS DOUBLE) -
           |        ((CAST(cab AS DOUBLE) * CAST(ccc AS DOUBLE)
           |            - CAST(cac AS DOUBLE) * CAST(cbc AS DOUBLE))
           |          / CAST(cbb * ccc - cbc * cbc AS DOUBLE)
           |            * CAST(cab AS DOUBLE)
           |         + (CAST(cac AS DOUBLE) * CAST(cbb AS DOUBLE)
           |            - CAST(cab AS DOUBLE) * CAST(cbc AS DOUBLE))
           |          / CAST(cbb * ccc - cbc * cbc AS DOUBLE)
           |            * CAST(cac AS DOUBLE)) END AS rss_u
           |  FROM dirs)
           |SELECT direction, n, rss_r, rss_u,
           |  CASE WHEN rss_u IS NULL OR rss_u <= 0 THEN NULL
           |    ELSE (rss_r - rss_u) * (n - 3) / rss_u END AS f_stat
           |FROM fin ORDER BY direction""".stripMargin),
    "ONE moment agg over a calendar-rollup series (the fact scan " +
      "collapses at the daily groupBy); the lag window is " +
      "single-partition over 30 rows by design. The causality screen " +
      "run before anyone ships a leading-indicator feature.")

  /** q483 — T-state: EVENT-TIME-TIMER sessionization through
    * `transformWithState` (ValueState + registered timers, RocksDB
    * store) — gap-closed sessions emit inline, each user's open tail
    * flushes when the WATERMARK passes its lastEvent + gap timer. The
    * batch oracle is the gaps-and-islands window with the STRICT-gap
    * convention this state machine uses (diff > gap starts a session;
    * q103's session_window twin uses >=, aligned there — no exact-gap
    * pair exists in the fixture, but conventions are pinned, not
    * assumed). Values ride as integer cents in a double (exact in any
    * sum order), and the output is sealed a full day before max event
    * time — far from the eviction boundary. */
  val q483 = Declared(
    "q483_stream_timer_sessions", "T-state,T3",
    (s, dir) => {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
      val sealedSessions =
        try TimeSeries.streamEventsToTable(s, dir, "q483", mode = "append")(ev => {
          import s.implicits._
          graft.streaming.StreamOps.statefulTimerSessions(
            ev.select(col("event_id").cast("long").as("event_id"),
                col("ts"),
                col("user_id").cast("long").as("user_id"),
                floor(col("value") * 100 + 0.5).cast("double").as("value"))
              .as[graft.streaming.StreamOps.SessionEvent],
            gap = java.time.Duration.ofMinutes(30),
            watermark = "1 hour").toDF()
        }) finally prev match {
          case Some(v) => s.conf.set(key, v)
          case None    => s.conf.unset(key)
        }
      sealedSessions
        .filter(col("session_end") < lit("2024-01-30 00:00:00").cast("timestamp"))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("sum_value").as("sum_cents"))
        .orderBy(col("user_id"), col("session_start"))
    },
    Some("""WITH marked AS (
           |  SELECT user_id, event_id, ts,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
           |         THEN 1 ELSE 0 END AS new_sess
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
           |), numbered AS (
           |  SELECT user_id, ts, cents,
           |    CAST(sum(new_sess) OVER (PARTITION BY user_id
           |      ORDER BY ts ASC, event_id ASC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS session_no
           |  FROM marked)
           |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           |  CAST(count(*) AS BIGINT) AS n_events,
           |  CAST(sum(cents) AS DOUBLE) AS sum_cents
           |FROM numbered
           |GROUP BY user_id, session_no
           |HAVING max(ts) < TIMESTAMP '2024-01-30 00:00:00'
           |ORDER BY user_id, session_start""".stripMargin),
    "State = one 4-field record + ONE registered timer per open " +
      "session; expiry is driven by the store's timer index as the " +
      "watermark advances — no state scan, no wall-clock flake. The " +
      "idle-session flush pattern production sessionization needs, " +
      "completing the transformWithState surface (ValueState q452, " +
      "MapState q471, ListState q476, timers here).")

  /** q484 — E4/X3: COMPRESSION-RATIO QUALITY SCREEN (the MassiveText/
    * Gopher compressibility filter): per-document deflate(text) byte
    * length over raw UTF-8 length, rolled up per (lang, source) with
    * low/high-tail flag counts. NO SQL oracle — the deflate length is
    * a zlib-build-specific signal, not a portable constant (the spec
    * pins the ORDER properties instead: boilerplate < prose < random);
    * the driver records the rows-only check. */
  val q484 = Declared(
    "q484_compress_quality", "E4,X3",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .filter(length(col("text")) > 0)
        .withColumn("__bytes", octet_length(col("text")).cast("long"))
        .withColumn("__dl",
          graft.ext.DeflateLength.deflateLength(col("text")))
        .withColumn("__ratio_ppm", expr("__dl * 1000000L div __bytes"))
      d.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__ratio_ppm") < 250000L, 1L).otherwise(0L))
            .as("n_boilerplate_tail"),
          sum(when(col("__ratio_ppm") > 650000L, 1L).otherwise(0L))
            .as("n_random_tail"),
          min(col("__ratio_ppm")).as("min_ratio_ppm"),
          max(col("__ratio_ppm")).as("max_ratio_ppm"))
        .orderBy(col("lang"), col("source"))
    },
    None, // zlib-length signal: rows-only driver check + property spec
    "Scan-side only: one codegen'd static deflate call per document " +
      "inside the same stage as the rollup — the quality gate that " +
      "screens both repetitive boilerplate AND garbled noise in one " +
      "pass, no UDF boundary, no second scan.")

  /** q485 — E4/X3: AHO-CORASICK DICTIONARY TAGGING — total keyword
    * occurrences per document (overlapping matches included) through
    * the one-pass multi-pattern automaton, rolled up to a per-(lang,
    * matches) histogram. The oracle enumerates every (position,
    * pattern) match by brute substring probing — exact overlapping
    * semantics, any dictionary. */
  val q485 = {
    val dict = Seq("data", "the", "model", "process", "in")
    val dictSql = dict.map(p => s"'$p'").mkString("[", ", ", "]")
    Declared(
      "q485_aho_dictionary_tags", "E4,X3",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("matches", graft.ext.AhoCorasickCount.ahoCount(
          lower(col("text")), dict))
        .groupBy(col("lang"), col("matches"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("matches")),
      Some(s"""WITH pats AS (SELECT unnest($dictSql) AS p),
             |per_doc AS (
             |  SELECT d.doc_id, d.lang,
             |    (SELECT coalesce(sum(len(list_filter(
             |        range(1, len(lower(d.text)) - len(p.p) + 2),
             |        i -> substr(lower(d.text), CAST(i AS INT),
             |               len(p.p)) = p.p))), 0)
             |     FROM pats p) AS matches
             |  FROM documents d)
             |SELECT lang, CAST(matches AS BIGINT) AS matches,
             |  CAST(count(*) AS BIGINT) AS n_docs
             |FROM per_doc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      "The automaton builds ONCE per plan from the literal dictionary " +
        "and matches in O(|text| + hits) per document regardless of " +
        "dictionary size — the keyword/PII/blocklist tagger that " +
        "replaces k regex probes with one scan-side pass at 100 TB.")
  }

  /** q486 — A3+/E2: D8 FLOW ACCUMULATION over an integer egg-carton
    * DEM (6×6 basins, pit-centered) built on the part-key lattice —
    * steepest-descent flow directions with the √2 diagonal cleared by
    * cross-multiplication, then 8 exact Jacobi accumulation rounds.
    * The oracle recomputes the argmax directions and replays every
    * round with the single-reference self+inflow contribution device
    * (each acc row fans into its own +1 and its target's acc). */
  val q486 = Declared(
    "q486_d8_flow_accumulation", "A3+,E2",
    (s, dir) => {
      val cells = Tables.part(s, dir).filter(col("p_partkey") < 1200)
        .select((col("p_partkey") % 40).as("x"),
          expr("p_partkey div 40").as("y"))
        .withColumn("z",
          (col("x") % 6 - 3) * (col("x") % 6 - 3) +
            (col("y") % 6 - 3) * (col("y") % 6 - 3))
      graft.ops.SpatialOps.d8FlowAccumulation(cells,
          col("x"), col("y"), col("z"), rounds = 8)
        .groupBy(col("acc"))
        .agg(count(lit(1)).as("n_cells"),
          sum(when(col("flow_dir").isNull, 1L).otherwise(0L)).as("n_pits"))
        .orderBy(col("acc"))
    },
    Some("""WITH RECURSIVE cells AS MATERIALIZED (
           |  SELECT CAST(p_partkey % 40 AS BIGINT) AS x,
           |         CAST(p_partkey // 40 AS BIGINT) AS y,
           |         CAST((p_partkey % 40 % 6 - 3)
           |            * (p_partkey % 40 % 6 - 3)
           |            + (p_partkey // 40 % 6 - 3)
           |            * (p_partkey // 40 % 6 - 3) AS BIGINT) AS z
           |  FROM part WHERE p_partkey < 1200),
           |dirs AS (SELECT * FROM (VALUES (0,1,0,2),(1,1,1,1),(2,0,1,2),
           |  (3,-1,1,1),(4,-1,0,2),(5,-1,-1,1),(6,0,-1,2),(7,1,-1,1))
           |  d(k, dx, dy, w)),
           |flows AS MATERIALIZED (
           |  SELECT x, y, k AS flow_dir, tx, ty FROM (
           |    SELECT c.x, c.y, d.k, c.x + d.dx AS tx, c.y + d.dy AS ty,
           |      row_number() OVER (PARTITION BY c.x, c.y
           |        ORDER BY (c.z - n.z) * (c.z - n.z) * d.w DESC, d.k ASC)
           |        AS rn
           |    FROM cells c CROSS JOIN dirs d
           |    JOIN cells n ON n.x = c.x + d.dx AND n.y = c.y + d.dy
           |    WHERE c.z > n.z)
           |  WHERE rn = 1),
           |acc(r, x, y, a) AS (
           |  SELECT 0, x, y, CAST(1 AS BIGINT) FROM cells
           |  UNION ALL
           |  SELECT r + 1, tx, ty, CAST(sum(v) AS BIGINT) FROM (
           |    SELECT a.r AS r, un.c.tx AS tx, un.c.ty AS ty, un.c.v AS v
           |    FROM acc a LEFT JOIN flows f ON f.x = a.x AND f.y = a.y,
           |    UNNEST(CASE WHEN f.tx IS NULL
           |      THEN [{'tx': a.x, 'ty': a.y, 'v': CAST(1 AS BIGINT)}]
           |      ELSE [{'tx': a.x, 'ty': a.y, 'v': CAST(1 AS BIGINT)},
           |            {'tx': f.tx, 'ty': f.ty, 'v': a.a}] END) AS un(c)
           |    WHERE a.r < 8)
           |  GROUP BY 1, 2, 3),
           |fin AS (SELECT x, y, a FROM acc WHERE r = 8)
           |SELECT f2.a AS acc, CAST(count(*) AS BIGINT) AS n_cells,
           |  CAST(sum(CASE WHEN fl.x IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_pits
           |FROM fin f2 LEFT JOIN flows fl ON fl.x = f2.x AND fl.y = f2.y
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    "The neighbor argmax is one explode(8) + grouped max_by keyed on " +
      "the cell; each accumulation round is one flow-edge join + " +
      "grouped sum chained lazily (checkpoint every third round — the " +
      "BFS-family discipline). The hydrology backbone (drainage, " +
      "watersheds, stream power) expressed on the same cell-table " +
      "model as zonal stats and Horn gradients — rounds bound the " +
      "path horizon exactly like q155/q384.")

  /** q487 — A3+/E2: D8 WATERSHED LABELING over the same egg-carton DEM
    * as q486 — every cell labeled with the pit its flow path ends in,
    * resolved by POINTER DOUBLING (8 halvings cover 2⁸ flow steps),
    * reported as per-basin cell counts. The oracle walks the flow
    * forest by single steps to the same fixed point — method differs,
    * the converged labels cannot. */
  val q487 = Declared(
    "q487_d8_watersheds", "A3+,E2",
    (s, dir) => {
      val cells = Tables.part(s, dir).filter(col("p_partkey") < 1200)
        .select((col("p_partkey") % 40).as("x"),
          expr("p_partkey div 40").as("y"))
        .withColumn("z",
          (col("x") % 6 - 3) * (col("x") % 6 - 3) +
            (col("y") % 6 - 3) * (col("y") % 6 - 3))
      graft.ops.SpatialOps.d8Watersheds(cells,
          col("x"), col("y"), col("z"), rounds = 8)
        .groupBy(col("basin_x"), col("basin_y"))
        .agg(count(lit(1)).as("n_cells"))
        .orderBy(col("basin_x"), col("basin_y"))
    },
    Some("""WITH RECURSIVE cells AS MATERIALIZED (
           |  SELECT CAST(p_partkey % 40 AS BIGINT) AS x,
           |         CAST(p_partkey // 40 AS BIGINT) AS y,
           |         CAST((p_partkey % 40 % 6 - 3)
           |            * (p_partkey % 40 % 6 - 3)
           |            + (p_partkey // 40 % 6 - 3)
           |            * (p_partkey // 40 % 6 - 3) AS BIGINT) AS z
           |  FROM part WHERE p_partkey < 1200),
           |dirs AS (SELECT * FROM (VALUES (0,1,0,2),(1,1,1,1),(2,0,1,2),
           |  (3,-1,1,1),(4,-1,0,2),(5,-1,-1,1),(6,0,-1,2),(7,1,-1,1))
           |  d(k, dx, dy, w)),
           |flows AS MATERIALIZED (
           |  SELECT x, y, tx, ty FROM (
           |    SELECT c.x, c.y, c.x + d.dx AS tx, c.y + d.dy AS ty,
           |      row_number() OVER (PARTITION BY c.x, c.y
           |        ORDER BY (c.z - n.z) * (c.z - n.z) * d.w DESC, d.k ASC)
           |        AS rn
           |    FROM cells c CROSS JOIN dirs d
           |    JOIN cells n ON n.x = c.x + d.dx AND n.y = c.y + d.dy
           |    WHERE c.z > n.z)
           |  WHERE rn = 1),
           |ptr(r, x, y, px, py) AS (
           |  SELECT 0, c.x, c.y, coalesce(f.tx, c.x), coalesce(f.ty, c.y)
           |  FROM cells c LEFT JOIN flows f ON f.x = c.x AND f.y = c.y
           |  UNION ALL
           |  SELECT r + 1, p.x, p.y,
           |    coalesce(f.tx, p.px), coalesce(f.ty, p.py)
           |  FROM ptr p LEFT JOIN flows f ON f.x = p.px AND f.y = p.py
           |  WHERE p.r < 40),
           |fin AS (SELECT x, y, px, py FROM ptr WHERE r = 40)
           |SELECT px AS basin_x, py AS basin_y,
           |  CAST(count(*) AS BIGINT) AS n_cells
           |FROM fin GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "Pointer doubling squares the resolved reach every round — " +
      "log(depth) self-joins of the cell-sized pointer frame keyed on " +
      "the current parent, the q70 components device applied to the " +
      "flow forest. Watershed partitioning is the canonical " +
      "raster-to-catchment rollup key at continental-DEM scale.")

  /** q488 — A3+/S5: POLYGON RASTERIZATION — two overlapping literal
    * polygons burned into a 60×48 unit grid by the center-sampling
    * rule, overlaps resolved to the smallest id, reported as
    * per-polygon coverage (cell count + index checksums). The oracle
    * replays the even-odd ray cast per (cell, polygon) with the q109
    * crossing formula and the same min-id tie-break. */
  val q488 = {
    val pent = Seq((9.2, 8.3), (48.7, 4.1), (55.3, 33.8), (30.4, 43.9),
      (5.6, 30.2))
    val tri = Seq((35.3, 20.2), (58.8, 38.7), (38.1, 39.4))
    def edgesSql(pid: Int, vs: Seq[(Double, Double)]): String =
      (vs :+ vs.head).sliding(2).map { case Seq((ax, ay), (bx, by)) =>
        s"($pid, $ax, $ay, $bx, $by)" }.mkString(",\n|         ")
    Declared(
      "q488_rasterize_polygons", "A3+,S5",
      (s, dir) => {
        import graft.geo.Geo
        def mk(id: Long, vs: Seq[(Double, Double)]) =
          s.range(1).select(lit(id).as("pid"),
            Geo.stPolygon(array(vs.map { case (vx, vy) =>
              struct(lit(vx).as("x"), lit(vy).as("y")) }: _*)).as("geom"))
        val polys = mk(1L, pent).unionByName(mk(2L, tri))
        graft.ops.SpatialOps.rasterizePolygons(polys,
            col("pid"), col("geom"),
            originX = 0.0, originY = 48.0, scaleX = 1.0, scaleY = 1.0,
            width = 60, height = 48)
          .groupBy(col("polygon_id"))
          .agg(count(lit(1)).as("n_cells"),
            sum(col("c")).as("sum_c"), sum(col("r")).as("sum_r"))
          .orderBy(col("polygon_id"))
      },
      Some(s"""WITH edges(pid, ax, ay, bx, by) AS (
             |  VALUES ${edgesSql(1, pent)},
             |         ${edgesSql(2, tri)}),
             |lattice AS (
             |  SELECT CAST(c.x AS BIGINT) AS c, CAST(r.x AS BIGINT) AS r,
             |    CAST(c.x AS DOUBLE) + 0.5 AS px,
             |    48.0 - (CAST(r.x AS DOUBLE) + 0.5) AS py
             |  FROM generate_series(0, 59) c(x)
             |  CROSS JOIN generate_series(0, 47) r(x)),
             |cr AS (
             |  SELECT l.c, l.r, e.pid,
             |    sum(CASE WHEN (e.ay > l.py) <> (e.by > l.py)
             |          AND l.px < (e.bx - e.ax) * (l.py - e.ay)
             |                / (e.by - e.ay) + e.ax
             |        THEN 1 ELSE 0 END) AS k
             |  FROM lattice l CROSS JOIN edges e
             |  GROUP BY 1, 2, 3),
             |hit AS (
             |  SELECT c, r, min(pid) AS polygon_id
             |  FROM cr WHERE k % 2 = 1 GROUP BY 1, 2)
             |SELECT CAST(polygon_id AS BIGINT) AS polygon_id,
             |  CAST(count(*) AS BIGINT) AS n_cells,
             |  CAST(sum(c) AS BIGINT) AS sum_c,
             |  CAST(sum(r) AS BIGINT) AS sum_r
             |FROM hit GROUP BY 1 ORDER BY 1""".stripMargin),
      "Each polygon explodes to its OWN bbox's cell window (never the " +
        "grid), the ray cast is a scan-side predicate on the exploded " +
        "pairs, and the min-id burn is one cell-keyed agg — a " +
        "continental raster x a big vector layer shuffles on cell " +
        "indices only. Completes the vector-to-raster direction of the " +
        "bridge whose inverse is zonalStats.")
  }

  /** q489 — A3+/E2: COST-DISTANCE surface — accumulated least cost
    * from ~6 scattered source cells over a 1..5 integer cost raster on
    * the part-key lattice, 24 min-plus relaxation rounds under the
    * exact ×2/×3 rational metric, reported as distance-band stats.
    * The oracle replays every round with the same self-loop device
    * (a zero-cost (v → v) edge carries the previous label through the
    * single grouped min). */
  val q489 = Declared(
    "q489_cost_distance", "A3+,E2",
    (s, dir) => {
      val cells = Tables.part(s, dir).filter(col("p_partkey") < 1200)
        .select((col("p_partkey") % 40).as("x"),
          expr("p_partkey div 40").as("y"))
        .withColumn("cost", lit(1L) + (col("x") * 3 + col("y") * 7) % 5)
        .withColumn("src", (col("x") * 31 + col("y") * 17) % 211 === 0)
      graft.ops.SpatialOps.costDistance(cells, col("x"), col("y"),
          col("cost"), col("src"), rounds = 24)
        .groupBy(expr("cost_dist div 25").as("band"))
        .agg(count(lit(1)).as("n_cells"),
          min(col("cost_dist")).as("min_d"),
          max(col("cost_dist")).as("max_d"),
          sum(col("cost_dist")).as("sum_d"))
        .orderBy(col("band"))
    },
    Some("""WITH RECURSIVE cells AS MATERIALIZED (
           |  SELECT CAST(p_partkey % 40 AS BIGINT) AS x,
           |         CAST(p_partkey // 40 AS BIGINT) AS y,
           |         CAST(1 + (p_partkey % 40 * 3
           |            + p_partkey // 40 * 7) % 5 AS BIGINT) AS c,
           |         (p_partkey % 40 * 31
           |            + p_partkey // 40 * 17) % 211 = 0 AS src
           |  FROM part WHERE p_partkey < 1200),
           |dirs AS (SELECT * FROM (VALUES (1,0,2),(1,1,3),(0,1,2),
           |  (-1,1,3),(-1,0,2),(-1,-1,3),(0,-1,2),(1,-1,3)) d(dx, dy, m)),
           |edges AS MATERIALIZED (
           |  SELECT a.x, a.y, n.x AS tx, n.y AS ty,
           |    CAST((a.c + n.c) * d.m AS BIGINT) AS w
           |  FROM cells a CROSS JOIN dirs d
           |  JOIN cells n ON n.x = a.x + d.dx AND n.y = a.y + d.dy
           |  UNION ALL
           |  SELECT x, y, x, y, CAST(0 AS BIGINT) FROM cells),
           |st(r, x, y, d) AS (
           |  SELECT 0, x, y,
           |    CASE WHEN src THEN CAST(0 AS BIGINT)
           |         ELSE CAST(2305843009213693951 AS BIGINT) END
           |  FROM cells
           |  UNION ALL
           |  SELECT s.r + 1, e.tx, e.ty, CAST(min(s.d + e.w) AS BIGINT)
           |  FROM st s JOIN edges e ON e.x = s.x AND e.y = s.y
           |  WHERE s.r < 24
           |  GROUP BY 1, 2, 3),
           |fin AS (
           |  SELECT x, y, CASE WHEN d >= 2305843009213693951 THEN NULL
           |    ELSE d END AS d
           |  FROM st WHERE r = 24)
           |SELECT d // 25 AS band, CAST(count(*) AS BIGINT) AS n_cells,
           |  min(d) AS min_d, max(d) AS max_d,
           |  CAST(sum(d) AS BIGINT) AS sum_d
           |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin),
    "The edge frame (8 + self-loop per cell) checkpoints once keyed on " +
      "the source cell; every relaxation round is ONE cell-keyed join " +
      "+ grouped min chained lazily — the friction/least-cost surface " +
      "behind siting, routing and proximity analysis, on the same " +
      "horizon contract as the BFS family.")

  /** q490 — A3+/E2: VIEWSHED from a ridge cell of the egg-carton DEM
    * (observer at (12, 0) — a ridge cell present at every
    * scale factor's lattice — z 18 + 2 height, 12-cell horizon) —
    * visibility counted per Chebyshev ring. Every decision is integer
    * (nearest-sample round-half-up on rational numerators, sign-split
    * squared angle comparisons), so the oracle replays the geometry
    * bit for bit. */
  val q490 = Declared(
    "q490_viewshed", "A3+,E2",
    (s, dir) => {
      val cells = Tables.part(s, dir).filter(col("p_partkey") < 1200)
        .select((col("p_partkey") % 40).as("x"),
          expr("p_partkey div 40").as("y"))
        .withColumn("z",
          (col("x") % 6 - 3) * (col("x") % 6 - 3) +
            (col("y") % 6 - 3) * (col("y") % 6 - 3))
      graft.ops.SpatialOps.viewshed(cells, col("x"), col("y"), col("z"),
          obsX = 12L, obsY = 0L, height = 2L, maxDist = 12)
        .groupBy(greatest(abs(col("x") - 12L), abs(col("y")))
          .as("ring"))
        .agg(count(lit(1)).as("n_cells"),
          sum(when(col("visible"), 1L).otherwise(0L)).as("n_visible"))
        .orderBy(col("ring"))
    },
    Some("""WITH cells AS MATERIALIZED (
           |  SELECT CAST(p_partkey % 40 AS BIGINT) AS x,
           |         CAST(p_partkey // 40 AS BIGINT) AS y,
           |         CAST((p_partkey % 40 % 6 - 3)
           |            * (p_partkey % 40 % 6 - 3)
           |            + (p_partkey // 40 % 6 - 3)
           |            * (p_partkey // 40 % 6 - 3) AS BIGINT) AS z
           |  FROM part WHERE p_partkey < 1200),
           |obs AS (SELECT z + 2 AS zo FROM cells WHERE x = 12 AND y = 0),
           |tgt AS MATERIALIZED (
           |  SELECT x, y, x - 12 AS dx, y AS dy,
           |    greatest(abs(x - 12), abs(y)) AS s,
           |    z - (SELECT zo FROM obs) AS a,
           |    (x - 12) * (x - 12) + y * y AS p
           |  FROM cells
           |  WHERE greatest(abs(x - 12), abs(y)) BETWEEN 1 AND 12),
           |smp AS (
           |  SELECT t.x, t.y, t.a, t.p,
           |    c.z - (SELECT zo FROM obs) AS b,
           |    (c.x - 12) * (c.x - 12) + c.y * c.y AS q
           |  FROM tgt t
           |  CROSS JOIN LATERAL (SELECT unnest(range(1, t.s)) AS tt) g
           |  JOIN cells c
           |    ON c.x = (2 * (12 * t.s + g.tt * t.dx) + t.s) // (2 * t.s)
           |   AND c.y = (2 * (g.tt * t.dy) + t.s) // (2 * t.s)),
           |ver AS (
           |  SELECT x, y, bool_or(
           |      (b >= 0 AND a < 0) OR
           |      (b >= 0 AND a >= 0 AND b * b * p >= a * a * q) OR
           |      (b < 0 AND a < 0 AND b * b * p <= a * a * q))
           |    AS blocked
           |  FROM smp GROUP BY 1, 2),
           |vis AS (
           |  SELECT t.x, t.y, NOT coalesce(v.blocked, false) AS visible
           |  FROM tgt t LEFT JOIN ver v ON v.x = t.x AND v.y = t.y
           |  UNION ALL
           |  SELECT 12, 0, true)
           |SELECT greatest(abs(x - 12), abs(y)) AS ring,
           |  CAST(count(*) AS BIGINT) AS n_cells,
           |  CAST(sum(CASE WHEN visible THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_visible
           |FROM vis GROUP BY 1 ORDER BY 1""".stripMargin),
    "Targets explode to <= maxDist line samples (the documented " +
      "O(cells·maxDist) fan-out dial), sample elevations attach by ONE " +
      "lattice equi-join, and the verdict is a grouped bool agg — the " +
      "r.viewshed operation with no cartesian, no window, no driver " +
      "loop. Completes the raster-analytics suite: gradients, zonal, " +
      "flow, watersheds, rasterize, cost-distance, viewshed.")

  val all: Seq[Declared] =
    Seq(q480, q481, q482, q483, q484, q485, q486, q487, q488, q489, q490)
}
