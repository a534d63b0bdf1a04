package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{EventAnalytics, Privacy, TimeSeriesOps}

/** Round-8 batch: local-DP randomized response, the AR(2) Yule-Walker
  * model fit, multinomial naive Bayes classification, and GSP frequent
  * sequential patterns — all exact-integer or pinned-IEEE end to end. */
object Analytics35 {

  /** q462 — privacy: WARNER RANDOMIZED RESPONSE prevalence estimate of
    * "high-value event" (value ≥ 100) per event type, p = 7/8
    * truthful. The flip bit replays the q456 splitmix64 mixer on
    * event_id, so the DuckDB oracle reproduces every reported bit and
    * both the raw and unbiased prevalences bit-for-bit. */
  val q462 = Declared(
    "q462_randomized_response", "privacy",
    (s, dir) => Privacy.randomizedResponse(
        Tables.events(s, dir), Seq(col("event_type")),
        col("event_id"), col("value") >= 100.0, k = 3)
      .orderBy(col("event_type")),
    Some("""WITH b AS (
           |  SELECT event_type,
           |    value >= 100.0 AS y,
           |    ((CAST(event_id AS HUGEINT) + 11400714819323198485)
           |      % 18446744073709551616 + 18446744073709551616)
           |      % 18446744073709551616 AS z
           |  FROM events),
           |x2 AS (SELECT event_type, y, xor(z, z >> 30) AS z FROM b),
           |x3 AS (SELECT event_type, y,
           |    (((z >> 32) * 13787848793156543929 % 4294967296) * 4294967296
           |      + (z % 4294967296) * 13787848793156543929)
           |      % 18446744073709551616 AS z
           |  FROM x2),
           |x4 AS (SELECT event_type, y, xor(z, z >> 27) AS z FROM x3),
           |x5 AS (SELECT event_type, y,
           |    (((z >> 32) * 10723151780598845931 % 4294967296) * 4294967296
           |      + (z % 4294967296) * 10723151780598845931)
           |      % 18446744073709551616 AS z
           |  FROM x4),
           |u AS (SELECT event_type, y,
           |    xor(z, z >> 31) % 8 = 0 AS lie FROM x5),
           |g AS (
           |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
           |      AS yes_true,
           |    CAST(sum(CASE WHEN y != lie THEN 1 ELSE 0 END) AS BIGINT)
           |      AS yes_reported
           |  FROM u GROUP BY 1)
           |SELECT event_type, n, yes_true, yes_reported,
           |  CAST(yes_true * 1000000 // n AS BIGINT) AS pi_true_ppm,
           |  CAST((8 * CAST(yes_reported AS HUGEINT) - n) * 1000000
           |    // (6 * CAST(n AS HUGEINT)) AS BIGINT) AS pi_hat_ppm
           |FROM g ORDER BY event_type""".stripMargin),
    "Scan-side bit arithmetic + one key-grain agg with map-side " +
      "combine — the local-DP estimator is a rollup read; no joins, " +
      "no windows. Deterministic flips make the simulation replayable " +
      "for calibration; a real deployment draws them from secret " +
      "client entropy and the truth column never leaves the client.")

  /** q463 — A5/A8: AR(2) YULE-WALKER fit + one-step forecast of the
    * daily order-count series per order priority. Mean clearing keeps
    * r₁/r₂ single divisions of exact integers; every later op is
    * pinned ×/−/÷ in fixed order, mirrored token-for-token in the
    * oracle so the doubles hash-match unrounded (q186 discipline). */
  val q463 = Declared(
    "q463_ar2_yule_walker", "A5,A8",
    (s, dir) => TimeSeriesOps.ar2YuleWalker(
        Tables.orders(s, dir)
          .groupBy(col("o_orderpriority").as("prio"),
            datediff(to_date(col("o_orderdate")), lit("1990-01-01"))
              .cast("long").as("__d"))
          .agg(count(lit(1)).as("__c")),
        Seq(col("prio")), col("__d"), col("__c"))
      .orderBy(col("prio")),
    Some("""WITH daily AS (
           |  SELECT o_orderpriority AS prio,
           |    date_diff('day', DATE '1990-01-01',
           |      CAST(o_orderdate AS DATE)) AS d,
           |    CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1, 2),
           |tot AS (
           |  SELECT prio, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(v) AS HUGEINT) AS s
           |  FROM daily GROUP BY 1),
           |c AS (
           |  SELECT daily.prio, n, s, v,
           |    n * CAST(v AS HUGEINT) - s AS cc,
           |    lag(n * CAST(v AS HUGEINT) - s, 1)
           |      OVER (PARTITION BY daily.prio ORDER BY d) AS c1,
           |    lag(n * CAST(v AS HUGEINT) - s, 2)
           |      OVER (PARTITION BY daily.prio ORDER BY d) AS c2,
           |    row_number() OVER (PARTITION BY daily.prio ORDER BY d DESC)
           |      AS rd
           |  FROM daily JOIN tot ON daily.prio = tot.prio),
           |m AS (
           |  SELECT prio, max(n) AS n, max(s) AS sm,
           |    sum(cc * cc) AS den,
           |    coalesce(sum(cc * c1), 0) AS num1,
           |    coalesce(sum(cc * c2), 0) AS num2,
           |    max(CASE WHEN rd = 1 THEN v END) AS vn,
           |    max(CASE WHEN rd = 2 THEN v END) AS vn1
           |  FROM c GROUP BY prio),
           |f AS (
           |  SELECT prio, n, sm, den, vn, vn1,
           |    CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) AS r1,
           |    CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) AS r2
           |  FROM m),
           |g AS (
           |  SELECT prio, n, sm, vn, vn1, r1, r2,
           |    n >= 3 AND den != 0 AND abs(r1) < 1.0 AS ok,
           |    (r1 * (1.0 - r2)) / (1.0 - r1 * r1) AS phi1,
           |    (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2,
           |    CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) AS mu
           |  FROM f)
           |SELECT prio, CAST(n AS BIGINT) AS n,
           |  CASE WHEN ok THEN r1 END AS r1,
           |  CASE WHEN ok THEN r2 END AS r2,
           |  CASE WHEN ok THEN phi1 END AS phi1,
           |  CASE WHEN ok THEN phi2 END AS phi2,
           |  CASE WHEN ok THEN 1.0 - phi1 * r1 - phi2 * r2 END
           |    AS innov_share,
           |  CASE WHEN ok THEN mu + phi1 * (CAST(vn AS DOUBLE) - mu)
           |    + phi2 * (CAST(vn1 AS DOUBLE) - mu) END AS forecast
           |FROM g ORDER BY prio""".stripMargin),
    "One key-grain moment agg joined back (both sides hash on the " +
      "key), one keyed window for the two lags — no single-partition " +
      "window; the fit itself is a rollup finish. The two-knob " +
      "autoregressor behind capacity forecasts and anomaly baselines.")

  /** q464 — E4: MULTINOMIAL NAIVE BAYES language classification of the
    * documents corpus (train + self-score; the resubstitution
    * readout). Micro-nat-quantized log-probs make each doc score an
    * exact long, so the argmax with the (score desc, label asc)
    * tie-break is engine-portable per-row. */
  val q464 = Declared(
    "q464_naive_bayes", "E4",
    (s, dir) => graft.ext.TextAnalysis.naiveBayesClassify(
        Tables.documents(s, dir),
        col("doc_id"), col("text"), col("lang"))
      .orderBy(col("doc")),
    Some("""WITH tk AS (
           |  SELECT doc_id AS d, lang AS l,
           |    unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |  FROM documents),
           |nd AS (SELECT lang AS l, count(*) AS nl FROM documents
           |       GROUP BY 1),
           |ntot AS (SELECT count(*) AS ndoc FROM documents),
           |tl AS (SELECT l, count(*) AS t FROM tk GROUP BY 1),
           |vo AS (SELECT count(DISTINCT w) AS v FROM tk),
           |ls AS (
           |  SELECT nd.l AS cl, t, v,
           |    CAST(round(ln(CAST(nl AS DOUBLE) / ndoc) * 1e6, 0)
           |      AS BIGINT) AS prior_u,
           |    CAST(round(ln(1.0 / (t + v)) * 1e6, 0) AS BIGINT) AS lp0_u
           |  FROM nd JOIN tl ON nd.l = tl.l CROSS JOIN ntot CROSS JOIN vo),
           |cw AS (SELECT l AS cl, w, count(*) AS c FROM tk GROUP BY 1, 2),
           |lp AS (
           |  SELECT cw.cl, w,
           |    CAST(round(ln(CAST(c + 1 AS DOUBLE) / (t + v)) * 1e6, 0)
           |      AS BIGINT) AS lp_u
           |  FROM cw JOIN ls ON cw.cl = ls.cl),
           |dt AS (SELECT d, l AS lt, w, count(*) AS cdw FROM tk
           |       GROUP BY 1, 2, 3),
           |sc AS (
           |  SELECT d, lt, ls.cl,
           |    prior_u + sum(cdw * coalesce(lp_u, lp0_u)) AS score
           |  FROM dt CROSS JOIN ls
           |    LEFT JOIN lp ON lp.cl = ls.cl AND lp.w = dt.w
           |  GROUP BY d, lt, ls.cl, prior_u),
           |best AS (
           |  SELECT d, lt, cl, score,
           |    row_number() OVER (PARTITION BY d ORDER BY score DESC, cl)
           |      AS rn
           |  FROM sc)
           |SELECT d AS doc, lt AS label_true, cl AS label_pred,
           |  CAST(score AS BIGINT) AS score_u
           |FROM best WHERE rn = 1 ORDER BY doc""".stripMargin),
    "Token rollups with map-side combine; the doc-token frame fans " +
      "out only |labels|-fold against broadcast class stats, and the " +
      "smoothed-table join shuffles on the TOKEN key (vocabulary-" +
      "sized), not the corpus key. The classic quality/language gate " +
      "of corpus curation, trained and applied without leaving the " +
      "engine.")

  /** q465 — W2/E-pattern: GSP FREQUENT SEQUENTIAL PATTERNS (length ≤ 3,
    * support ≥ 1% of sessions) over per-(user, day) event sessions —
    * the non-contiguous complement of q311's adjacency triples.
    * Existence tests are rollup arithmetic (minpos/maxpos/minfollow),
    * each level Apriori-pruned before its join fans out. */
  val q465 = Declared(
    "q465_sequential_patterns", "W2",
    (s, dir) => EventAnalytics.sequentialPatterns(
        Tables.events(s, dir),
        Seq(col("user_id"), to_date(col("ts")).as("day")),
        col("event_type"), Seq(col("ts"), col("event_id")),
        minSupportPpm = 10000L)
      .orderBy(col("len"), col("e1"), col("e2"), col("e3")),
    Some("""WITH pos AS (
           |  SELECT user_id, CAST(ts AS DATE) AS day, event_type AS e,
           |    CAST(row_number() OVER (
           |      PARTITION BY user_id, CAST(ts AS DATE)
           |      ORDER BY ts, event_id) AS BIGINT) AS p
           |  FROM events),
           |occ AS (SELECT user_id, day, e, min(p) AS minp, max(p) AS maxp
           |        FROM pos GROUP BY 1, 2, 3),
           |ns AS (SELECT count(*) AS nseq
           |       FROM (SELECT DISTINCT user_id, day FROM occ)),
           |l1 AS (
           |  SELECT e, count(*) AS support FROM occ GROUP BY 1
           |  HAVING count(*) * 1000000 >= 10000 * (SELECT nseq FROM ns)),
           |p2 AS (
           |  SELECT a.user_id, a.day, a.e AS ea, b.e AS eb
           |  FROM occ a
           |    JOIN occ b ON a.user_id = b.user_id AND a.day = b.day
           |      AND a.minp < b.maxp
           |    JOIN l1 fa ON a.e = fa.e
           |    JOIN l1 fb ON b.e = fb.e),
           |l2 AS (
           |  SELECT ea, eb, count(*) AS support FROM p2 GROUP BY 1, 2
           |  HAVING count(*) * 1000000 >= 10000 * (SELECT nseq FROM ns)),
           |mf AS (
           |  SELECT pos.user_id, pos.day, a.e AS ea, pos.e AS eb,
           |    min(pos.p) AS mfp
           |  FROM pos
           |    JOIN occ a ON pos.user_id = a.user_id AND pos.day = a.day
           |      AND pos.p > a.minp
           |    JOIN l2 ON l2.ea = a.e AND l2.eb = pos.e
           |  GROUP BY 1, 2, 3, 4),
           |t3 AS (
           |  SELECT mf.ea, mf.eb, c.e AS ec, count(*) AS support
           |  FROM mf
           |    JOIN occ c ON mf.user_id = c.user_id AND mf.day = c.day
           |      AND mf.mfp < c.maxp
           |    JOIN l2 g ON g.ea = mf.eb AND g.eb = c.e
           |    JOIN l2 h ON h.ea = mf.ea AND h.eb = c.e
           |  GROUP BY 1, 2, 3
           |  HAVING count(*) * 1000000 >= 10000 * (SELECT nseq FROM ns)),
           |u AS (
           |  SELECT CAST(1 AS INT) AS len, e AS e1,
           |    CAST(NULL AS VARCHAR) AS e2, CAST(NULL AS VARCHAR) AS e3,
           |    support FROM l1
           |  UNION ALL
           |  SELECT CAST(2 AS INT), ea, eb, CAST(NULL AS VARCHAR), support
           |  FROM l2
           |  UNION ALL
           |  SELECT CAST(3 AS INT), ea, eb, ec, support FROM t3)
           |SELECT len, e1, e2, e3, CAST(support AS BIGINT) AS support,
           |  CAST(support * 1000000 // (SELECT nseq FROM ns) AS BIGINT)
           |    AS support_ppm
           |FROM u ORDER BY len, e1, e2, e3""".stripMargin),
    "Positions are ONE keyed window; occ is a (session × alphabet) " +
      "rollup; the pair join fans out ≤ alphabet² per session and the " +
      "minfollow join ≤ |frequent pairs| per event — alphabet-bounded, " +
      "never event². Apriori pruning broadcasts k-row level tables; " +
      "all big joins hash on the session key.")

  /** q466 — E4: 2-TOPIC pLSA over the documents corpus — 3 EM rounds,
    * integer-ppm trajectory, top-8 tokens per topic. The oracle
    * UNROLLS every round (E-step responsibilities, both M-steps) as a
    * chained-CTE replay in pure integer arithmetic, so the hash match
    * proves the whole trajectory, not just the end state. */
  val q466 = {
    val rounds = 3
    def eBlock(r: Int) = {
      val rEx = "CASE WHEN p1*t1 + p2*t2 = 0 THEN 500000 " +
        "ELSE (p1*t1 * 1000000) // (p1*t1 + p2*t2) END"
      s"""e$r AS MATERIALIZED (
         |  SELECT cells.d, cells.w,
         |    c * ($rEx) AS s1,
         |    c * (1000000 - ($rEx)) AS s2
         |  FROM cells JOIN phi${r - 1} USING (w) JOIN th${r - 1} USING (d)),
         |bw$r AS (SELECT w, sum(s1) AS sw1, sum(s2) AS sw2
         |         FROM e$r GROUP BY w),
         |tt$r AS (SELECT sum(sw1) AS u1, sum(sw2) AS u2 FROM bw$r),
         |phi$r AS (
         |  SELECT w,
         |    CAST(CASE WHEN u1 = 0 THEN 0
         |      ELSE (sw1 * 1000000) // u1 END AS BIGINT) AS p1,
         |    CAST(CASE WHEN u2 = 0 THEN 0
         |      ELSE (sw2 * 1000000) // u2 END AS BIGINT) AS p2
         |  FROM bw$r CROSS JOIN tt$r),
         |th$r AS (
         |  SELECT d,
         |    CAST((sum(s1) * 1000000) // (sum(s1) + sum(s2)) AS BIGINT)
         |      AS t1,
         |    CAST(1000000 - (sum(s1) * 1000000) // (sum(s1) + sum(s2))
         |      AS BIGINT) AS t2
         |  FROM e$r GROUP BY d)""".stripMargin
    }
    val sql =
      s"""WITH tk AS (
         |  SELECT doc_id AS d,
         |    unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
         |  FROM documents),
         |cells AS MATERIALIZED (
         |  SELECT d, w, CAST(count(*) AS BIGINT) AS c
         |  FROM tk GROUP BY 1, 2),
         |vo AS (SELECT count(DISTINCT w) AS v FROM cells),
         |phi0 AS (
         |  SELECT w, CAST(1000000 // v AS BIGINT) AS p1,
         |    CAST(1000000 // v AS BIGINT) AS p2
         |  FROM (SELECT DISTINCT w FROM cells) CROSS JOIN vo),
         |th0 AS (
         |  SELECT d, CAST(200000 + (d % 7) * 100000 AS BIGINT) AS t1,
         |    CAST(800000 - (d % 7) * 100000 AS BIGINT) AS t2
         |  FROM (SELECT DISTINCT d FROM cells)),
         |${(1 to rounds).map(eBlock).mkString(",\n")},
         |top1 AS (
         |  SELECT CAST(1 AS INT) AS topic, w AS token, p1 AS phi_ppm,
         |    row_number() OVER (ORDER BY p1 DESC, w) AS rn FROM phi$rounds),
         |top2 AS (
         |  SELECT CAST(2 AS INT) AS topic, w AS token, p2 AS phi_ppm,
         |    row_number() OVER (ORDER BY p2 DESC, w) AS rn FROM phi$rounds)
         |SELECT topic, token, phi_ppm
         |FROM (SELECT * FROM top1 WHERE rn <= 8
         |      UNION ALL SELECT * FROM top2 WHERE rn <= 8)
         |ORDER BY topic, phi_ppm DESC, token""".stripMargin
    Declared(
      "q466_plsa_topics", "E4",
      (s, dir) => graft.ext.TextAnalysis.plsa2Topics(
          Tables.documents(s, dir), col("doc_id"), col("text"),
          rounds = rounds, topK = 8)
        .orderBy(col("topic"), col("phi_ppm").desc, col("token")),
      Some(sql),
      "Cells checkpoint once; each round is a vocab-keyed and a " +
        "doc-keyed rollup join + two grouped sums with map-side " +
        "combine; per-topic totals are a 1-row broadcast. Fixed " +
        "rounds, all-integer floor arithmetic — bit-identical under " +
        "any partitioning and any engine. The unsupervised " +
        "corpus-structure readout beside q345's SemDeDup clusters.")
  }

  private val PartOffset = 1L << 40 // bipartite shift, literal in SQL

  /** q467 — E2+: k-pivot hop-bounded BRANDES BETWEENNESS over the
    * supplier–part purchase graph (q155's edge set) — 3 smallest-id
    * pivots, 3-hop horizon, supplier nodes reported. The oracle
    * unrolls BOTH passes: 3 layered-BFS rounds carrying exact HUGEINT
    * path counts, then 3 descending dependency levels with the same
    * ppm floor divisions — the whole trajectory hash-matches. */
  val q467 = {
    val hops = 3
    val fwd = (1 to hops).map { l =>
      s"""i$l AS (
         |  SELECT f.s, e.dst AS node, sum(f.sigma) AS sigma
         |  FROM f${l - 1} f JOIN sym e ON e.src = f.node
         |  GROUP BY 1, 2),
         |f$l AS MATERIALIZED (
         |  SELECT i.s, i.node, CAST($l AS BIGINT) AS dist, i.sigma
         |  FROM i$l i LEFT JOIN lab${l - 1} x
         |    ON x.s = i.s AND x.node = i.node
         |  WHERE x.node IS NULL),
         |lab$l AS MATERIALIZED (
         |  SELECT * FROM lab${l - 1} UNION ALL SELECT * FROM f$l)"""
        .stripMargin
    }.mkString(",\n")
    val bwd = ((hops - 1) to 0 by -1).map { lev =>
      s"""d$lev AS MATERIALIZED (
         |  SELECT v.s, v.node,
         |    sum((v.sigma * (1000000 + coalesce(dw.delta,
         |      CAST(0 AS HUGEINT)))) // w.sigma) AS delta
         |  FROM lab$hops v
         |    JOIN sym e ON e.src = v.node
         |    JOIN lab$hops w ON w.s = v.s AND w.node = e.dst
         |      AND w.dist = v.dist + 1
         |    LEFT JOIN dall${lev + 1} dw
         |      ON dw.s = v.s AND dw.node = w.node
         |  WHERE v.dist = $lev
         |  GROUP BY 1, 2),
         |dall$lev AS (
         |  SELECT * FROM dall${lev + 1} UNION ALL SELECT * FROM d$lev)"""
        .stripMargin
    }.mkString(",\n")
    val sql =
      s"""WITH e0 AS (
         |  SELECT DISTINCT l_suppkey AS a,
         |    l_partkey + 1099511627776 AS b
         |  FROM lineitem),
         |sym AS MATERIALIZED (
         |  SELECT a AS src, b AS dst FROM e0
         |  UNION ALL SELECT b AS src, a AS dst FROM e0),
         |p AS (SELECT src AS s
         |      FROM (SELECT DISTINCT src FROM sym) ORDER BY src LIMIT 3),
         |f0 AS (SELECT s, s AS node, CAST(0 AS BIGINT) AS dist,
         |         CAST(1 AS HUGEINT) AS sigma FROM p),
         |lab0 AS (SELECT * FROM f0),
         |$fwd,
         |dall$hops AS (
         |  SELECT s, node, CAST(0 AS HUGEINT) AS delta
         |  FROM lab$hops WHERE false),
         |$bwd,
         |bc AS (
         |  SELECT d.node, sum(d.delta) AS bc
         |  FROM dall0 d JOIN lab$hops x
         |    ON x.s = d.s AND x.node = d.node
         |  WHERE x.dist >= 1 GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS node FROM sym)
         |SELECT nodes.node AS supplier,
         |  CAST(coalesce(bc, 0) AS BIGINT) AS bc_ppm
         |FROM nodes LEFT JOIN bc ON bc.node = nodes.node
         |WHERE nodes.node < 1099511627776
         |ORDER BY supplier""".stripMargin
    Declared(
      "q467_betweenness", "E2+",
      (s, dir) => {
        val edges = Tables.lineitem(s, dir)
          .select(col("l_suppkey").as("src"),
            (col("l_partkey") + PartOffset).as("dst"))
        graft.ext.Graph.betweennessPivots(edges, "src", "dst",
            numPivots = 3, maxHops = hops)
          .filter(col("node") < PartOffset)
          .select(col("node").as("supplier"), col("bc_ppm"))
          .orderBy(col("supplier"))
      },
      Some(sql),
      "State is (pivots × reached nodes); each forward round is one " +
        "frontier-keyed join + a grouped exact sigma sum, each " +
        "backward level one level-keyed join — all hash on the node " +
        "key, no windows. Pivot count is the precision/cost dial " +
        "(Brandes-Pich); the hop horizon is the q155 purity contract. " +
        "The broker-node ranking behind influence and cut-vertex triage.")
  }

  /** q468 — T7: stream-STREAM LEFT OUTER join with event-time range
    * bounds — q78's attribution join with the unmatched clicks KEPT
    * (the conversion-rate denominator). Outer null rows only emit when
    * the watermark passes a buffered left row's expiry (l_ts + within),
    * so the OUTPUT is filtered to a sealed region well behind the final
    * watermark (the q103 sealing discipline; the seal must not touch
    * the join INPUT — see the in-code note on watermark dragging) and
    * the watermark delay is small (1 minute); the no-data final
    * micro-batch then flushes every survivor. The batch LEFT JOIN over
    * the same sealed region is the exact oracle. */
  val q468 = Declared(
    "q468_stream_left_join", "T7,J4",
    (s, dir) => {
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try TimeSeries.streamEventsToTable(s, dir, "q468", mode = "append") { ev =>
        // the seal must filter the join OUTPUT, not the click input:
        // the left watermark is computed from the filtered stream's
        // max event time, so an input-side seal drags the watermark
        // down to the seal itself and the last ~hour of sealed clicks
        // never expire out of state
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("ts").as("l_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("r_ts"))
        graft.streaming.StreamOps.streamStreamJoin(
            clicks, purchases, "user_id", "l_ts", "r_ts",
            watermark = "1 minute", within = "30 minutes",
            joinType = "left_outer")
          .filter(col("l_ts") < lit("2024-01-30 12:00:00").cast("timestamp"))
          .select(col("user_id"), col("click_id"), col("purchase_id"))
      }.orderBy(col("user_id"), col("click_id"), col("purchase_id"))
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    },
    Some("""WITH c AS (
           |  SELECT user_id, event_id AS click_id, ts AS l_ts
           |  FROM events
           |  WHERE event_type = 'click'
           |    AND ts < TIMESTAMP '2024-01-30 12:00:00'),
           |p AS (
           |  SELECT user_id, event_id AS purchase_id, ts AS r_ts
           |  FROM events WHERE event_type = 'purchase')
           |SELECT c.user_id, c.click_id, p.purchase_id
           |FROM c LEFT JOIN p
           |  ON c.user_id = p.user_id
           | AND p.r_ts >= c.l_ts
           | AND p.r_ts <= c.l_ts + INTERVAL 30 MINUTE
           |ORDER BY 1, 2, 3 NULLS FIRST""".stripMargin),
    "Outer join state is bounded by watermark + within on both sides; " +
      "null emission is watermark-DRIVEN, so the sealing filter is " +
      "what makes the replay deterministic — production streams read " +
      "the same rows continuously as the watermark sweeps forward. " +
      "The unmatched-click denominator is how attribution rates are " +
      "actually computed.")

  /** q469 — ML/A-stat: COX PROPORTIONAL HAZARDS on time-to-purchase —
    * per user, duration = hours from first event to first purchase
    * (censored at last activity when none), covariate = whether the
    * journey opened with a view/click. Five Newton rounds on the Breslow
    * partial likelihood; the oracle replays the WHOLE trajectory as a
    * recursive CTE (ppm-floored e^{βx} weights, HUGEINT suffix
    * risk-set sums, the same truncating divisions and the ±20 clamp),
    * so beta and the hazard ratio hash-match bit-for-bit. */
  val q469 = {
    val iters = 5
    val wExpr = "CAST(floor(exp(greatest(-20.0, least(20.0, " +
      "(CAST(it.b AS DOUBLE) / 1000000) * cl.x))) * 1000000 + 0.5) " +
      "AS BIGINT)"
    val sql =
      s"""WITH RECURSIVE fe AS (
         |  SELECT user_id, ts AS ts0, event_type AS ft
         |  FROM (SELECT user_id, ts, event_id, event_type,
         |          row_number() OVER (PARTITION BY user_id
         |            ORDER BY ts, event_id) AS rn
         |        FROM events) WHERE rn = 1),
         |agg AS (
         |  SELECT user_id, max(ts) AS tmax,
         |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
         |  FROM events GROUP BY 1),
         |subj AS (
         |  SELECT (epoch_us(coalesce(a.tp, a.tmax)) - epoch_us(f.ts0))
         |      // 3600000000 + 1 AS t,
         |    CASE WHEN a.tp IS NULL THEN 0 ELSE 1 END AS ev,
         |    CASE WHEN f.ft IN ('view', 'click') THEN 1 ELSE 0 END AS x
         |  FROM fe f JOIN agg a ON f.user_id = a.user_id),
         |cells AS MATERIALIZED (
         |  SELECT t, x, CAST(count(*) AS BIGINT) AS c,
         |    CAST(sum(ev) AS BIGINT) AS d
         |  FROM subj GROUP BY 1, 2),
         |it AS (
         |  SELECT 0 AS i, CAST(0 AS BIGINT) AS b
         |  UNION ALL
         |  SELECT i + 1,
         |    CASE WHEN ii > 0 THEN greatest(-20000000, least(20000000,
         |      b + CAST((1000000 * uu) // ii AS BIGINT))) ELSE b END
         |  FROM (
         |    SELECT i, b, sum(uc) AS uu, sum(ic) AS ii FROM (
         |      SELECT i, b,
         |        1000000 * CAST(ex AS HUGEINT) -
         |          CAST(dd AS HUGEINT) * s1u AS uc,
         |        CAST(dd AS HUGEINT) *
         |          (s2u - (s1u * s1u) // 1000000) AS ic
         |      FROM (
         |        SELECT i, b, t, dd, ex,
         |          (s1 * 1000000) // s0 AS s1u,
         |          (s2 * 1000000) // s0 AS s2u
         |        FROM (
         |          SELECT i, b, t, dd, ex,
         |            sum(a0) OVER (ORDER BY t DESC ROWS BETWEEN
         |              UNBOUNDED PRECEDING AND CURRENT ROW) AS s0,
         |            sum(a1) OVER (ORDER BY t DESC ROWS BETWEEN
         |              UNBOUNDED PRECEDING AND CURRENT ROW) AS s1,
         |            sum(a2) OVER (ORDER BY t DESC ROWS BETWEEN
         |              UNBOUNDED PRECEDING AND CURRENT ROW) AS s2
         |          FROM (
         |            SELECT i, b, t, sum(c * w) AS a0,
         |              sum(c * x * w) AS a1, sum(c * x * x * w) AS a2,
         |              sum(d) AS dd, sum(d * x) AS ex
         |            FROM (
         |              SELECT it.i, it.b, cl.t, cl.x, cl.c, cl.d,
         |                $wExpr AS w
         |              FROM it, cells cl WHERE it.i < $iters)
         |            GROUP BY i, b, t)
         |        ) WHERE dd > 0
         |      )
         |    ) GROUP BY i, b
         |  )
         |)
         |SELECT CAST((SELECT sum(c) FROM cells) AS BIGINT) AS n,
         |  CAST((SELECT sum(d) FROM cells) AS BIGINT) AS n_events,
         |  CAST((SELECT count(DISTINCT t) FROM cells) AS BIGINT)
         |    AS n_times,
         |  CAST($iters AS BIGINT) AS iters,
         |  b AS beta_micro,
         |  CAST(floor(exp(CAST(b AS DOUBLE) / 1000000) * 1000000 + 0.5)
         |    AS BIGINT) AS hr_micro
         |FROM it WHERE i = $iters""".stripMargin
    Declared(
      "q469_cox_ph", "ML",
      (s, dir) => {
        val subjects = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(min(struct(col("ts"), col("event_id"),
              col("event_type"))).as("__f"),
            max(col("ts")).as("__tmax"),
            min(when(col("event_type") === "purchase", col("ts")))
              .as("__tp"))
          .select(col("user_id"),
            (expr("(unix_micros(coalesce(__tp, __tmax)) - " +
              "unix_micros(__f.ts)) div 3600000000L") + 1L).as("dur"),
            col("__tp").isNotNull.as("evt"),
            when(col("__f.event_type").isin("view", "click"), 1L)
              .otherwise(0L).as("x"))
        EventAnalytics.coxPh(subjects, col("dur"), col("evt"), col("x"),
          iters = iters)
      },
      Some(sql),
      "ONE (duration, covariate) cell agg off the fact table; every " +
        "Newton round is rollup-sized (a duration-grain suffix window " +
        "+ a 1-row collect) — the regression of survival analysis at " +
        "raw-corpus scale, censoring handled where plain OLS cannot.")
  }

  /** q471 — T-state: per-event-type RUNNING TOP-5 CONTRIBUTORS through
    * `transformWithState` with MAP state (q452's ValueState sibling —
    * the per-key COLLECTION shape: leaderboards, heavy hitters). The
    * replay emits the final leaderboard; the batch oracle is the
    * groupBy + rank over the same cent totals. */
  val q471 = Declared(
    "q471_stream_topk_tws", "T-state",
    (s, dir) => {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
      try TimeSeries.streamEventsToTable(s, dir, "q471", mode = "update")(ev => {
        import s.implicits._
        graft.streaming.StreamOps.statefulTopContributors(
          ev.select(col("event_type").as("key"),
              col("user_id").cast("long").as("user"),
              floor(col("value") * 100 + 0.5).cast("long").as("cents"))
            .as[graft.streaming.StreamOps.ContribIn], k = 5).toDF()
      }).orderBy(col("event_type"), col("rank"))
      finally prev match {
        case Some(p) => s.conf.set(key, p)
        case None => s.conf.unset(key)
      }
    },
    Some("""WITH t AS (
           |  SELECT event_type, user_id,
           |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS total_cents
           |  FROM events GROUP BY 1, 2),
           |r AS (
           |  SELECT event_type, user_id, total_cents,
           |    CAST(row_number() OVER (PARTITION BY event_type
           |      ORDER BY total_cents DESC, user_id) AS INT) AS rank
           |  FROM t)
           |SELECT event_type, rank, user_id, total_cents
           |FROM r WHERE rank <= 5
           |ORDER BY event_type, rank""".stripMargin),
    "State is one RocksDB map entry per (type, contributor) — the same " +
      "cardinality a batch groupBy shuffles; each micro-batch shuffles " +
      "only its own rows keyed by type and re-emits a k-row changelog. " +
      "The heavy-hitters dashboard shape on the modern arbitrary-state " +
      "API, under the same oracle gate as the batch suite.")

  /** q472 — A-stat: deterministic exhaustive-consensus RANSAC line on
    * the monthly order-count series — every month-pair proposes a
    * line, consensus counts months within ±30 orders vertically
    * (exact cross-multiplied integers), lexicographic tie-break. The
    * robust trend read beside q183's Theil-Sen median slope. */
  val q472 = Declared(
    "q472_ransac_line", "A-stat",
    (s, dir) => graft.ops.Aggregates.ransacLine(
      Tables.orders(s, dir)
        .groupBy((year(to_date(col("o_orderdate"))) * 12 +
          month(to_date(col("o_orderdate")))).cast("long").as("__mx"))
        .agg(count(lit(1)).as("__my")),
      col("__mx"), col("__my"), epsNum = 30L, epsDen = 1L),
    Some("""WITH m AS (
           |  SELECT CAST(year(CAST(o_orderdate AS DATE)) * 12 +
           |      month(CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
           |    CAST(count(*) AS BIGINT) AS y
           |  FROM orders GROUP BY 1),
           |pts AS MATERIALIZED (
           |  SELECT x, y, CAST(count(*) AS BIGINT) AS c
           |  FROM m GROUP BY 1, 2),
           |np AS (SELECT CAST(sum(c) AS BIGINT) AS n_points FROM pts),
           |cand AS MATERIALIZED (
           |  SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2,
           |    b.x - a.x AS dx, b.y - a.y AS dy
           |  FROM pts a JOIN pts b ON a.x < b.x),
           |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates
           |       FROM cand),
           |t AS (
           |  SELECT x1, y1, x2, y2, dx, dy,
           |    CAST(sum(c) AS BIGINT) AS consensus
           |  FROM cand JOIN pts p
           |    ON abs((p.y - y1) * CAST(dx AS HUGEINT) -
           |         (p.x - x1) * CAST(dy AS HUGEINT)) * 1 <=
           |       30 * CAST(dx AS HUGEINT)
           |  GROUP BY 1, 2, 3, 4, 5, 6),
           |best AS (SELECT * FROM t
           |         ORDER BY consensus DESC, x1, y1, x2, y2 LIMIT 1)
           |SELECT (SELECT n_points FROM np) AS n_points,
           |  (SELECT n_candidates FROM nc) AS n_candidates,
           |  consensus, x1, y1, x2, y2,
           |  CAST((dy * 1000000) // dx AS BIGINT) AS slope_micro,
           |  CAST(y1 * 1000000 - ((dy * 1000000) // dx) * x1 AS BIGINT)
           |    AS intercept_micro
           |FROM best""".stripMargin),
    "Rollup-cubed altitude by design: candidates are month-pairs of a " +
      "CALENDAR-grain rollup (the q454 Walsh discipline one power up) " +
      "— the fact scan collapses at the first agg and everything after " +
      "is O(months³) distributed arithmetic. The argmax is a " +
      "TakeOrdered(1), never a global sort.")

  /** q473 — ML: mRMR FEATURE SELECTION — rank 4 lineitem features
    * against the return flag, greedily maximizing relevance minus mean
    * redundancy over q219's nano-nat exact mutual informations. The
    * oracle recomputes every pairwise MI and replays the greedy with
    * the SAME cross-multiplied integer argmax and name tie-break. */
  val q473 = {
    val feats = Seq(
      "disc" -> "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)",
      "month" -> "CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT)",
      "qty" -> "CAST(l_quantity AS BIGINT) // 10",
      "stat" -> "l_linestatus")
    def miBlock(label: String, xExpr: String, yExpr: String) =
      s"""x_$label AS (
         |  SELECT $xExpr AS x, $yExpr AS y,
         |    CAST(count(*) AS BIGINT) AS nxy
         |  FROM lineitem GROUP BY 1, 2),
         |mx_$label AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx
         |              FROM x_$label GROUP BY x),
         |my_$label AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny
         |              FROM x_$label GROUP BY y),
         |n_$label AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM x_$label),
         |r_$label AS (
         |  SELECT CAST(sum(CAST(round(CAST(c.nxy AS DOUBLE) /
         |      CAST(n AS DOUBLE) *
         |      ln(CAST(n AS DOUBLE) * CAST(c.nxy AS DOUBLE) /
         |         (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))) * 1e9, 0)
         |      AS BIGINT)) AS BIGINT) AS mi
         |  FROM x_$label c JOIN mx_$label USING (x)
         |    JOIN my_$label USING (y) CROSS JOIN n_$label)""".stripMargin
    val relBlocks = feats.map { case (n, e) =>
      miBlock(s"rel_$n", e, "l_returnflag") }
    val redPairs = for {
      i <- feats.indices; j <- feats.indices if i < j
    } yield (feats(i), feats(j))
    val redBlocks = redPairs.map { case ((na, ea), (nb, eb)) =>
      miBlock(s"red_${na}_$nb", ea, eb) }
    val relsUnion = feats.map { case (n, _) =>
      s"SELECT '$n' AS feature, mi FROM r_rel_$n" }.mkString("\n  UNION ALL ")
    val redsUnion = redPairs.map { case ((na, _), (nb, _)) =>
      s"SELECT '$na' AS fa, '$nb' AS fb, mi FROM r_red_${na}_$nb\n" +
        s"  UNION ALL SELECT '$nb', '$na', mi FROM r_red_${na}_$nb" }
      .mkString("\n  UNION ALL ")
    val sql =
      s"""WITH ${(relBlocks ++ redBlocks).mkString(",\n")},
         |rels AS MATERIALIZED ($relsUnion),
         |reds AS MATERIALIZED ($redsUnion),
         |s1 AS (SELECT feature, mi AS rel FROM rels
         |       ORDER BY mi DESC, feature LIMIT 1),
         |r1 AS (SELECT CAST(1 AS INT) AS round, feature,
         |         rel AS relevance_nano, CAST(0 AS BIGINT)
         |         AS redundancy_avg_nano, rel AS score_nano
         |       FROM s1),
         |c2 AS (
         |  SELECT r.feature, r.mi AS rel,
         |    (SELECT mi FROM reds WHERE fa = r.feature
         |       AND fb = (SELECT feature FROM s1)) AS sred
         |  FROM rels r
         |  WHERE r.feature != (SELECT feature FROM s1)),
         |s2 AS (SELECT feature, rel, sred FROM c2
         |       ORDER BY rel - sred DESC, feature LIMIT 1),
         |r2 AS (SELECT CAST(2 AS INT), feature, rel,
         |         CAST(sred // 1 AS BIGINT), rel - sred // 1 FROM s2),
         |c3 AS (
         |  SELECT r.feature, r.mi AS rel,
         |    (SELECT CAST(sum(mi) AS BIGINT) FROM reds
         |     WHERE fa = r.feature AND fb IN (
         |       SELECT feature FROM s1 UNION ALL SELECT feature FROM s2))
         |      AS sred
         |  FROM rels r
         |  WHERE r.feature NOT IN (
         |    SELECT feature FROM s1 UNION ALL SELECT feature FROM s2)),
         |s3 AS (SELECT feature, rel, sred FROM c3
         |       ORDER BY rel * 2 - sred DESC, feature LIMIT 1),
         |r3 AS (SELECT CAST(3 AS INT), feature, rel,
         |         CAST(sred // 2 AS BIGINT), rel - sred // 2 FROM s3)
         |SELECT * FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
         |               UNION ALL SELECT * FROM r3)
         |ORDER BY round""".stripMargin
    Declared(
      "q473_mrmr_select", "ML",
      (s, dir) => graft.ops.Features.mrmrSelect(
        Tables.lineitem(s, dir),
        Seq(
          "disc" -> expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100" +
            " AS BIGINT)"),
          "month" -> month(to_date(col("l_shipdate"))).cast("long"),
          "qty" -> expr("CAST(l_quantity AS BIGINT) div 10"),
          "stat" -> col("l_linestatus")),
        col("l_returnflag"), select = 3).orderBy(col("round")),
      Some(sql),
      "ONE lineitem scan explodes each row into the k + C(k,2) pair " +
        "cells (map-side combine collapses the fan-out); margins come " +
        "from the bounded cell frame, and the greedy runs on the " +
        "collected k-literal MI table with exact cross-multiplied " +
        "comparisons. The standard filter-method ranking before any " +
        "model training touches 100 TB.")
  }

  /** q474 — E3+/ML: TOP-2 PCA by power iteration with exact integer
    * deflation over the 16-dim embedding correlation matrix — q213's
    * first component plus the rank-one-deflated second. The oracle
    * replays BOTH 8-round chases and the deflation arithmetic. */
  val q474 = {
    val dims = 16; val rounds = 8
    def chaseRound(pfx: String, mat: String, k: Int) =
      s"""${pfx}w$k AS (
         |  SELECT f.j, CAST(sum(CAST(f.c AS HUGEINT) * ${pfx}r${k - 1}.v)
         |    AS HUGEINT) AS w
         |  FROM $mat f JOIN ${pfx}r${k - 1} ON f.i = ${pfx}r${k - 1}.j
         |  GROUP BY f.j),
         |${pfx}m$k AS (SELECT max(abs(w)) AS mx FROM ${pfx}w$k),
         |${pfx}r$k AS (
         |  SELECT j, CAST(CASE WHEN mx = 0 THEN 0
         |    ELSE (w * 1000000) // mx END AS BIGINT) AS v
         |  FROM ${pfx}w$k, ${pfx}m$k)""".stripMargin
    val sql =
      s"""WITH q AS (
         |  SELECT list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))
         |    AS qv
         |  FROM embeddings),
         |p AS (
         |  SELECT ii.i, jj.j, qv[ii.i + 1] AS x, qv[jj.j + 1] AS y
         |  FROM q,
         |    (SELECT unnest(range(0, $dims)) AS i) ii,
         |    (SELECT unnest(range(0, $dims)) AS j) jj
         |  WHERE jj.j >= ii.i),
         |s AS (
         |  SELECT i, j, count(*) AS n,
         |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
         |  FROM p GROUP BY 1, 2),
         |m AS (SELECT i, j, CAST(n AS HUGEINT) * sxy - sx * sy AS spp
         |      FROM s),
         |vv AS (SELECT i AS k, CAST(spp AS DOUBLE) AS sppk FROM m
         |       WHERE i = j),
         |cm AS (
         |  SELECT m.i, m.j,
         |    CAST(round(CASE WHEN vi.sppk > 0 AND vj.sppk > 0
         |      THEN CAST(m.spp AS DOUBLE) / (sqrt(vi.sppk) * sqrt(vj.sppk))
         |      END * 1000000, 0) AS BIGINT) AS c
         |  FROM m JOIN vv vi ON m.i = vi.k JOIN vv vj ON m.j = vj.k),
         |fm AS MATERIALIZED (
         |  SELECT i, j, c FROM cm
         |  UNION ALL
         |  SELECT j AS i, i AS j, c FROM cm WHERE i <> j),
         |r0 AS (SELECT unnest(range(0, $dims)) AS j,
         |       CAST(1000000 AS BIGINT) AS v),
         |${(1 to rounds).map(chaseRound("", "fm", _)).mkString(",\n")},
         |l1 AS (SELECT CAST(mx // 1000000 AS BIGINT) AS l1
         |       FROM m$rounds),
         |n2 AS (SELECT CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT)
         |       AS n2 FROM r$rounds),
         |fm2 AS MATERIALIZED (
         |  SELECT f.i, f.j, CAST(CAST(f.c AS HUGEINT) -
         |    (CAST(l1 AS HUGEINT) * a.v * b.v) // n2
         |    AS BIGINT) AS c
         |  FROM fm f JOIN r$rounds a ON a.j = f.i
         |    JOIN r$rounds b ON b.j = f.j CROSS JOIN l1 CROSS JOIN n2),
         |br0 AS (SELECT j, CAST(1000000 + j AS BIGINT) AS v
         |        FROM (SELECT unnest(range(0, $dims)) AS j)),
         |${(1 to rounds).map(chaseRound("b", "fm2", _)).mkString(",\n")}
         |SELECT * FROM (
         |  SELECT CAST(1 AS INT) AS component, CAST(j AS BIGINT) AS j,
         |    v AS v_u,
         |    (SELECT CAST(mx // 1000000 AS BIGINT) FROM m$rounds)
         |      AS lambda_u
         |  FROM r$rounds
         |  UNION ALL
         |  SELECT CAST(2 AS INT), CAST(j AS BIGINT), v,
         |    (SELECT CAST(mx // 1000000 AS BIGINT) FROM bm$rounds)
         |  FROM br$rounds)
         |ORDER BY component, j""".stripMargin
    Declared(
      "q474_pca_two", "E3+,ML",
      (s, dir) => graft.ext.Clustering.powerIterationTwo(
          graft.ext.Clustering.correlationMatrix(
            Tables.embeddings(s, dir), "embedding", dims = dims),
          dims = dims, rounds = rounds)
        .orderBy(col("component"), col("j")),
      Some(sql),
      "The corpus is touched once (the co-moment scan); both chases " +
        "and the exact rank-one deflation run on the dims² broadcast " +
        "frame — 2·rounds joins of a 256-row table. lambda2/lambda1 is " +
        "the is-it-really-1-D readout beside q357's anisotropy share.")
  }

  /** q475 — ML/mixing: ENTROPIC OPTIMAL-TRANSPORT PLAN (fixed-round
    * Sinkhorn) between the 1993 and 1997 order-priority mixes under
    * the ordinal cost |i−j|. The oracle replays every scaling round in
    * a recursive CTE: the k² kernel stream carries both windowed
    * scalings per step (u from the row sums, v from the column sums of
    * the JUST-updated u), and the diagonal rows read the state out. */
  val q475 = {
    val k = 5; val rounds = 6
    val sql =
      s"""WITH RECURSIVE b AS (
         |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) - 1
         |      AS cat,
         |    year(CAST(o_orderdate AS DATE)) AS yr
         |  FROM orders
         |  WHERE year(CAST(o_orderdate AS DATE)) IN (1993, 1997)),
         |g AS (SELECT unnest(range(0, $k)) AS x),
         |rr AS MATERIALIZED (
         |  SELECT g.x AS i, CAST(CASE WHEN
         |      (SELECT count(*) FROM b WHERE yr = 1993) = 0 THEN 0
         |    ELSE ((SELECT count(*) FROM b b2
         |           WHERE b2.yr = 1993 AND b2.cat = g.x) * 1000000)
         |      // (SELECT count(*) FROM b WHERE yr = 1993) END
         |    AS HUGEINT) AS rppm FROM g),
         |cc AS MATERIALIZED (
         |  SELECT g.x AS j, CAST(CASE WHEN
         |      (SELECT count(*) FROM b WHERE yr = 1997) = 0 THEN 0
         |    ELSE ((SELECT count(*) FROM b b2
         |           WHERE b2.yr = 1997 AND b2.cat = g.x) * 1000000)
         |      // (SELECT count(*) FROM b WHERE yr = 1997) END
         |    AS HUGEINT) AS cppm FROM g),
         |kern AS MATERIALIZED (
         |  SELECT ii.x AS i, jj.x AS j, abs(ii.x - jj.x) AS cost,
         |    CAST(round(exp(-CAST(abs(ii.x - jj.x) AS DOUBLE)) * 1e6, 0)
         |      AS BIGINT) AS k_ppm
         |  FROM g ii, g jj),
         |it AS (
         |  SELECT 0 AS rnd, x, CAST(1000000 AS HUGEINT) AS u,
         |    CAST(1000000 AS HUGEINT) AS v
         |  FROM g
         |  UNION ALL
         |  SELECT rnd + 1, i AS x, u2 AS u, v2 AS v
         |  FROM (
         |    SELECT rnd, i, j, u2,
         |      CAST(CASE WHEN t2 = 0 THEN 0
         |        ELSE (cppm * 1000000000000) // t2 END AS HUGEINT) AS v2
         |    FROM (
         |      SELECT rnd, i, j, u2, cppm,
         |        sum(k_ppm * u2) OVER (PARTITION BY rnd, j) AS t2
         |      FROM (
         |        SELECT rnd, i, j, k_ppm, cppm,
         |          CAST(CASE WHEN s = 0 THEN 0
         |            ELSE (rppm * 1000000000000) // s END AS HUGEINT)
         |            AS u2
         |        FROM (
         |          SELECT it.rnd, k.i, k.j, k.k_ppm, rr.rppm, cc.cppm,
         |            sum(k.k_ppm * it.v) OVER (PARTITION BY k.i) AS s
         |          FROM it
         |            JOIN kern k ON k.j = it.x
         |            JOIN rr ON rr.i = k.i
         |            JOIN cc ON cc.j = k.j
         |          WHERE it.rnd < $rounds)
         |      )
         |    )
         |  ) WHERE i = j)
         |SELECT k.i, k.j, CAST(k.cost AS BIGINT) AS cost, k.k_ppm,
         |  CAST((uu.u * k.k_ppm * vv.v) // 1000000000000 AS BIGINT)
         |    AS plan_micro
         |FROM kern k
         |  JOIN (SELECT x, u FROM it WHERE rnd = $rounds) uu ON uu.x = k.i
         |  JOIN (SELECT x, v FROM it WHERE rnd = $rounds) vv ON vv.x = k.j
         |ORDER BY k.i, k.j""".stripMargin
    Declared(
      "q475_sinkhorn_ot", "ML",
      (s, dir) => graft.ext.Curation.sinkhornPlan(
          Tables.orders(s, dir)
            .filter(year(to_date(col("o_orderdate"))).isin(1993, 1997)),
          (substring(col("o_orderpriority"), 1, 1).cast("long") - 1)
            .as("cat"),
          year(to_date(col("o_orderdate"))) === 1993,
          k = k, rounds = rounds)
        .orderBy(col("i"), col("j")),
      Some(sql),
      "Two category-grain marginal aggs touch the facts; the " +
        "iteration runs on the k² literal kernel frame — rounds × two " +
        "k-row joins, nothing corpus-sized. The plan says WHICH mass " +
        "moved WHERE — the distribution-shift decomposition a mixing " +
        "pipeline acts on, beside q285's scalar Wasserstein gap.")
  }

  /** q476 — T-state: cross-batch ADJACENT view→click→purchase pattern
    * trigger through `transformWithState` with LIST state — the CEP
    * shape completing the arbitrary-state trio (q452 ValueState, q471
    * MapState). The batch lag-window triple is the exact oracle. */
  val q476 = Declared(
    "q476_stream_pattern_tws", "T-state",
    (s, dir) => {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
      try TimeSeries.streamEventsToTable(s, dir, "q476", mode = "append")(ev => {
        import s.implicits._
        graft.streaming.StreamOps.statefulPatternMatch(
          ev.select(col("user_id").cast("long").as("key"),
              unix_micros(col("ts")).as("us"),
              col("event_id").cast("long").as("tie"),
              col("event_type").as("etype"))
            .as[graft.streaming.StreamOps.PatternIn],
          Seq("view", "click", "purchase")).toDF()
      }).orderBy(col("user_id"), col("hit_event"))
      finally prev match {
        case Some(p) => s.conf.set(key, p)
        case None => s.conf.unset(key)
      }
    },
    Some("""WITH w AS (
           |  SELECT user_id, event_id, event_type,
           |    lag(event_type, 2) OVER (PARTITION BY user_id
           |      ORDER BY epoch_us(ts), event_id) AS t2,
           |    lag(event_type, 1) OVER (PARTITION BY user_id
           |      ORDER BY epoch_us(ts), event_id) AS t1
           |  FROM events)
           |SELECT user_id, event_id AS hit_event
           |FROM w
           |WHERE t2 = 'view' AND t1 = 'click'
           |  AND event_type = 'purchase'
           |ORDER BY user_id, hit_event""".stripMargin),
    "State is pattern-length-minus-one strings per key in RocksDB; " +
      "each micro-batch shuffles only its own rows keyed by user and " +
      "emits hits in append mode. The funnel-trigger/CEP shape that " +
      "fires across batch boundaries — no window re-scan, no batch " +
      "recompute.")

  /** q477 — A5/A8: ROLLING-ORIGIN forecast cross-validation — the
    * q424 theta backtest refit at three monthly origins, per-fold
    * WAPE/MASE plus the pooled CV verdict. The oracle replays all
    * three integer theta folds (each a recursive-CTE SES recursion)
    * and the pooled division. */
  val q477 = {
    val splits = Seq(10346L, 10377L, 10407L)
    val horizon = 14
    def foldSql(split: Long, f: Int) =
      s"""rk_$f AS MATERIALIZED (
         |  SELECT t, v, row_number() OVER (ORDER BY t) AS r
         |  FROM daily WHERE t <= $split),
         |s_$f AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(v) AS BIGINT) AS sy,
         |    CAST(sum(r * v) AS BIGINT) AS siy
         |  FROM rk_$f),
         |c_$f AS (
         |  SELECT n, sy, siy, n * (n + 1) // 2 AS si,
         |    n * (n + 1) * (2 * n + 1) // 6 AS si2
         |  FROM s_$f),
         |q_$f AS (
         |  SELECT *, CAST((CAST(n AS HUGEINT) * siy
         |      - CAST(si AS HUGEINT) * sy) * 1000000
         |    // (CAST(n AS HUGEINT) * si2 - CAST(si AS HUGEINT) * si)
         |    AS BIGINT) AS bm
         |  FROM c_$f),
         |q2_$f AS MATERIALIZED (
         |  SELECT *, CAST((CAST(sy AS HUGEINT) * 1000000
         |    - CAST(bm AS HUGEINT) * si) // n AS BIGINT) AS am
         |  FROM q_$f),
         |fit_$f(r, st) AS (
         |  SELECT 1, 2000000 * rk_$f.v - (am + bm) FROM rk_$f, q2_$f
         |  WHERE rk_$f.r = 1
         |  UNION ALL
         |  SELECT ff.r + 1,
         |    ((2000000 * rk_$f.v - (am + bm * (ff.r + 1))) + ff.st) // 2
         |  FROM fit_$f ff JOIN rk_$f ON rk_$f.r = ff.r + 1, q2_$f),
         |lvl_$f AS (SELECT max_by(st, r) AS l FROM fit_$f),
         |tn_$f AS (SELECT max(t) AS tmax FROM rk_$f),
         |fc_$f AS (
         |  SELECT h, tmax + h AS t,
         |    (am + bm * (n + h) + l) // 2 AS forecast_micro
         |  FROM (SELECT range AS h FROM range(1, ${horizon + 1})),
         |    q2_$f, lvl_$f, tn_$f),
         |lastv_$f AS (SELECT max_by(v, t) AS lastv FROM daily
         |             WHERE t <= $split),
         |sc_$f AS MATERIALIZED (
         |  SELECT CAST($f AS INT) AS fold, fc.h, fc.t, d.v AS actual,
         |    fc.forecast_micro,
         |    abs(d.v * 1000000 - fc.forecast_micro) AS ae_micro,
         |    abs(d.v - lastv) * 1000000 AS naive_ae_micro
         |  FROM fc_$f fc JOIN daily d ON d.t = fc.t, lastv_$f),
         |tot_$f AS (
         |  SELECT CAST(sum(ae_micro) AS BIGINT) AS sae,
         |    CAST(sum(naive_ae_micro) AS BIGINT) AS snae,
         |    CAST(sum(abs(actual)) AS BIGINT) AS sa
         |  FROM sc_$f),
         |out_$f AS (
         |  SELECT fold, h, t, actual, forecast_micro, ae_micro,
         |    naive_ae_micro,
         |    CAST(sae // greatest(sa, 1) AS BIGINT) AS wape_ppm,
         |    CAST((sae * 1000000) // greatest(snae, 1) AS BIGINT)
         |      AS mase_ppm
         |  FROM sc_$f, tot_$f)""".stripMargin
    val folds = splits.zipWithIndex
      .map { case (sp, i) => foldSql(sp, i + 1) }.mkString(",\n")
    val unionAll = (1 to splits.size)
      .map(f => s"SELECT * FROM out_$f").mkString("\n  UNION ALL ")
    val sql =
      s"""WITH RECURSIVE daily AS MATERIALIZED (
         |  SELECT CAST(datediff('day', DATE '1970-01-01', o_orderdate)
         |    AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
         |  FROM orders GROUP BY 1),
         |$folds,
         |uni AS MATERIALIZED ($unionAll),
         |cv AS (
         |  SELECT CAST(sum(ae_micro) AS HUGEINT) AS cae,
         |    CAST(sum(naive_ae_micro) AS HUGEINT) AS cnae
         |  FROM uni)
         |SELECT uni.*, CAST((cae * 1000000) // greatest(cnae, 1)
         |    AS BIGINT) AS cv_mase_ppm
         |FROM uni, cv ORDER BY fold, h""".stripMargin
    Declared(
      "q477_forecast_cv", "A5,A8",
      (s, dir) => graft.ops.TimeSeriesOps.forecastCvRolling(
          Tables.orders(s, dir)
            .groupBy(expr("datediff(o_orderdate, DATE'1970-01-01')")
              .cast("long").as("day"))
            .agg(count(lit(1)).as("cnt")),
          col("day"), col("cnt"), splits, horizon)
        .orderBy(col("fold"), col("h")),
      Some(sql),
      "Each fold folds the integer theta fit over ITS train slice of " +
        "the day rollup and scores horizon rows; folds share nothing " +
        "and parallelize. The pooled CV quotient is one more integer " +
        "division — the model-selection verdict a single lucky origin " +
        "cannot fake.")
  }

  /** q478 — A-stat/causal: E-VALUE sensitivity of the observed
    * air-shipment → return-flag risk ratio — how strong an unmeasured
    * confounder must be to explain the association away. One exact
    * 2×2 agg; RR* and the E-value are pinned IEEE ops over exact
    * integer products, hash-matched unrounded. */
  val q478 = Declared(
    "q478_evalue", "A-stat",
    (s, dir) => graft.ops.Experimentation.eValue(
      Tables.lineitem(s, dir),
      expr("CAST(l_quantity AS BIGINT) >= 25"),
      col("l_returnflag") === "R"),
    Some("""WITH c AS (
           |  SELECT
           |    CAST(sum(CASE WHEN q AND o THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_ee,
           |    CAST(sum(CASE WHEN q AND NOT o THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_en,
           |    CAST(sum(CASE WHEN NOT q AND o THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_ne,
           |    CAST(sum(CASE WHEN NOT q AND NOT o THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_nn
           |  FROM (SELECT CAST(l_quantity AS BIGINT) >= 25 AS q,
           |          l_returnflag = 'R' AS o FROM lineitem)),
           |f AS (
           |  SELECT *,
           |    CASE WHEN n_ne + n_nn > 0 AND n_ee + n_en > 0 AND n_ne > 0
           |      THEN CAST((CAST(1000000 AS HUGEINT) * n_ee
           |        * (n_ne + n_nn)) // (CAST(n_ne AS HUGEINT)
           |        * (n_ee + n_en)) AS BIGINT) END AS rr_ppm,
           |    CAST(n_ee AS HUGEINT) * (n_ne + n_nn) AS num,
           |    CAST(n_ne AS HUGEINT) * (n_ee + n_en) AS den
           |  FROM c),
           |g AS (
           |  SELECT *, CASE WHEN num >= den
           |      THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
           |      ELSE CAST(den AS DOUBLE) / CAST(num AS DOUBLE) END
           |    AS rrs
           |  FROM f)
           |SELECT n_ee, n_en, n_ne, n_nn, rr_ppm,
           |  CASE WHEN n_ee > 0 AND n_ne > 0 AND den > 0 AND num > 0
           |    THEN rrs + sqrt(rrs * (rrs - 1.0)) END AS evalue
           |FROM g""".stripMargin),
    "One conditional-sum pass over the facts, a 1-row finish — the " +
      "sensitivity number every observational effect estimate should " +
      "carry, computed at any scale for the cost of a count.")

  val all: Seq[Declared] =
    Seq(q462, q463, q464, q465, q466, q467, q468, q469, q471, q472,
      q473, q474, q475, q476, q477, q478)
}
