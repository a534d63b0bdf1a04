package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Batch 70 — density + symbolization: the gridded KDE hotspot
  * surface (the "where is the heat" map behind every spatial
  * dashboard) and SAX symbolic time-series words (the motif/anomaly
  * alphabet behind pattern mining), both in exact integer arithmetic.
  */
object Analytics31 {

  // sensor field in integer cents (exact) — the Analytics30 lattice.
  private def sensorCents(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.supplier(s, dir).select(
      expr("CAST((s_suppkey * 37) % 100 AS DOUBLE)").as("x"),
      expr("CAST((s_suppkey * 73) % 100 AS DOUBLE)").as("y"),
      expr("CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))

  private val sensorsCentsSql =
    """sens AS (
      |  SELECT CAST((s_suppkey * 37) % 100 AS DOUBLE) AS x,
      |    CAST((s_suppkey * 73) % 100 AS DOUBLE) AS y,
      |    CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM supplier)""".stripMargin

  /** q391 — A3+/F9: discrete-Epanechnikov KDE hotspot surface on the
    * sensor lattice (cell = 4 units, bandwidth = 3 cells), top-15
    * density cells — all-integer masses, so the ranking is exact. */
  val q391 = Declared(
    "q391_kde_grid", "A3,F9",
    (s, dir) => graft.ops.SpatialStats.kdeGrid(
      sensorCents(s, dir), col("x"), col("y"), col("v"),
      cellSize = 4.0, radius = 3)
      .orderBy(col("kde_mass").desc, col("cx"), col("cy")).limit(15),
    Some(s"""WITH $sensorsCentsSql,
           |cells AS (
           |  SELECT CAST(floor(x / 4.0) AS BIGINT) AS cx,
           |    CAST(floor(y / 4.0) AS BIGINT) AS cy,
           |    CAST(sum(v) AS BIGINT) AS xsum
           |  FROM sens GROUP BY 1, 2),
           |offs AS (
           |  SELECT dx.range AS dx, dy.range AS dy,
           |    9 - dx.range * dx.range - dy.range * dy.range AS w
           |  FROM range(-3, 4) dx, range(-3, 4) dy
           |  WHERE dx.range * dx.range + dy.range * dy.range < 9),
           |scat AS (
           |  SELECT cx + dx AS cx, cy + dy AS cy, xsum * w AS m
           |  FROM cells, offs)
           |SELECT cx, cy, CAST(sum(m) AS BIGINT) AS kde_mass,
           |  CAST(count(*) AS BIGINT) AS n_src
           |FROM scat GROUP BY 1, 2
           |ORDER BY kde_mass DESC, cx, cy LIMIT 15""".stripMargin),
    "ONE fact pass to the cell rollup; the kernel scatter explodes the " +
      "ROLLUP by the 29 in-disc offsets into a map-side-combinable groupBy " +
      "on target cells — never a distance join on facts, no inequality " +
      "predicates. Top-15 is TakeOrdered. Integer masses: the hotspot " +
      "ranking can never flip across engines or partitionings.")

  /** q392 — A8/F1: SAX words (quartile-breakpoint variant) of the
    * daily order-count series per priority class, 16-day segments —
    * the symbolic compression behind motif/novelty mining. */
  val q392 = Declared(
    "q392_sax_words", "A8,F1",
    (s, dir) => {
      val ser = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("k"), col("o_orderdate").as("t"))
        .agg(count(lit(1)).as("v"))
      graft.ops.TimeSeriesOps.saxSymbolize(ser, col("k"), col("t"),
        col("v"), segLen = 16)
    },
    Some("""WITH ser AS (
           |  SELECT o_orderpriority AS k, o_orderdate AS t,
           |    CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1, 2),
           |rn AS (
           |  SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY t)
           |    AS rn
           |  FROM ser),
           |seg AS (
           |  SELECT k, (rn - 1) // 16 AS seg, CAST(sum(v) AS BIGINT) AS s
           |  FROM rn GROUP BY 1, 2 HAVING count(*) = 16),
           |rk AS (
           |  SELECT *, row_number() OVER (ORDER BY s, k, seg) AS r,
           |    count(*) OVER () AS nn
           |  FROM seg),
           |bk AS (
           |  SELECT max(CASE WHEN r = (nn + 3) // 4 THEN s END) AS b1,
           |    max(CASE WHEN r = (nn * 2 + 3) // 4 THEN s END) AS b2,
           |    max(CASE WHEN r = (nn * 3 + 3) // 4 THEN s END) AS b3
           |  FROM rk),
           |sym AS (
           |  SELECT k, seg, CASE WHEN s <= b1 THEN 'a'
           |    WHEN s <= b2 THEN 'b' WHEN s <= b3 THEN 'c'
           |    ELSE 'd' END AS c
           |  FROM seg, bk)
           |SELECT k AS key, string_agg(c, '' ORDER BY seg) AS sax_word,
           |  CAST(count(*) AS BIGINT) AS n_segments
           |FROM sym GROUP BY 1 ORDER BY key""".stripMargin),
    "Per-key rank windows are key-partitioned; the only global step is " +
      "quartile rank selection on the SEGMENT rollup (|points|/16 rows, " +
      "documented bounded window). Symbols are pure integer compares and " +
      "words assemble in one collect_list+sort agg per key — the 100 TB " +
      "cost is the day rollup, everything after is rollup-sized.")

  /** q393 — A-stat: Chao1 unseen-species richness of the yearly part
    * catalog actually shipped — "how many parts does this year's
    * demand REALLY touch, unseen ones included" — plus Good's sample
    * coverage. The corpus question (unseen vocabulary / URLs) in its
    * original ecological form. */
  val q393 = Declared(
    "q393_chao1_richness", "A-stat",
    (s, dir) => graft.ops.Aggregates.chao1Richness(
      Tables.lineitem(s, dir), col("l_partkey"),
      year(col("l_shipdate")).cast("int")),
    Some("""WITH ab AS (
           |  SELECT CAST(year(l_shipdate) AS INT) AS g, l_partkey,
           |    count(*) AS c
           |  FROM lineitem GROUP BY 1, 2),
           |sp AS (
           |  SELECT g, CAST(sum(c) AS BIGINT) AS n_obs,
           |    CAST(count(*) AS BIGINT) AS s_obs,
           |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
           |  FROM ab GROUP BY g)
           |SELECT g, n_obs, s_obs, f1, f2,
           |  CAST(s_obs AS DOUBLE) +
           |    CAST(f1 * (f1 - 1) AS DOUBLE) / CAST(2 * (f2 + 1) AS DOUBLE)
           |    AS chao1,
           |  1.0 - CAST(f1 AS DOUBLE) / CAST(n_obs AS DOUBLE) AS coverage
           |FROM sp ORDER BY g""".stripMargin),
    "ONE (year, part) rollup with map-side combine, then a conditional agg " +
      "to |years| rows — the exact abundance spectrum, no distinct-count " +
      "sketch. The unseen-mass estimate that decides whether another crawl " +
      "of the same source can still add vocabulary.")

  /** q394 — A-stat/eval: SNIPS self-normalized off-policy value on
    * the exact q229 replay logs — the lower-variance estimator beside
    * the unbiased one, with Kish ESS as the trust diagnostic. */
  val q394 = Declared(
    "q394_snips_policy_value", "A-stat",
    (s, dir) => {
      val per = Tables.lineitem(s, dir).groupBy(col("l_orderkey")).agg(
        countDistinct(col("l_suppkey")).as("k"),
        min(col("l_suppkey")).as("target"),
        max(when(col("l_linenumber") === 1, col("l_suppkey"))).as("logged"),
        max(when(col("l_linenumber") === 1,
          when(col("l_returnflag") =!= "R", 1L).otherwise(0L))).as("reward"))
      graft.ops.Experimentation.snipsPolicyValue(per, col("logged"),
        col("target"), col("reward"), expr("1000000L div k"))
    },
    Some("""WITH per AS (
           |  SELECT l_orderkey,
           |    CAST(count(DISTINCT l_suppkey) AS BIGINT) AS k,
           |    min(l_suppkey) AS target,
           |    max(CASE WHEN l_linenumber = 1 THEN l_suppkey END) AS logged,
           |    max(CASE WHEN l_linenumber = 1 THEN
           |      CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END END)
           |      AS reward
           |  FROM lineitem GROUP BY l_orderkey),
           |w AS (
           |  SELECT *, CASE WHEN logged = target THEN
           |      (CAST(1000000 AS HUGEINT) * 1000000) // (1000000 // k)
           |    ELSE CAST(0 AS HUGEINT) END AS w
           |  FROM per),
           |a AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN logged = target THEN 1 ELSE 0 END)
           |      AS BIGINT) AS matches,
           |    sum(w * reward) AS wr, sum(w) AS sw, sum(w * w) AS sw2
           |  FROM w)
           |SELECT n, matches,
           |  CASE WHEN sw <> 0 THEN CAST((wr * 1000000) // sw AS BIGINT)
           |    END AS value_snips_ppm,
           |  CAST(wr // n AS BIGINT) AS value_ips_ppm,
           |  CASE WHEN sw2 <> 0 THEN CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
           |    / CAST(sw2 AS DOUBLE) END AS ess_w
           |FROM a""".stripMargin),
    "Identical shuffle shape to q229 (one order-grain agg, one scalar " +
      "agg); the SNIPS/IPS gap and the Kish ESS of the matched weights " +
      "are the variance instrumentation production OPE reads before " +
      "trusting either point estimate.")

  /** q395 — A-stat: supplier-market concentration per nation — HHI
    * points + CR1/CR4/CR8 of revenue share — the sourcing-risk audit
    * ("is this market one supplier failing away from a stockout"). */
  val q395 = Declared(
    "q395_market_concentration", "A-stat",
    (s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey"), col("l_suppkey"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
      graft.ops.Aggregates.marketConcentration(rev, col("s_nationkey"),
        col("l_suppkey"), col("cents"))
    },
    Some("""WITH cells AS (
           |  SELECT s_nationkey AS market, l_suppkey AS f,
           |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS s
           |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           |  GROUP BY 1, 2),
           |rk AS (
           |  SELECT *, row_number() OVER (PARTITION BY market
           |    ORDER BY s DESC, f) AS r
           |  FROM cells),
           |a AS (
           |  SELECT market, CAST(count(*) AS BIGINT) AS n_firms,
           |    CAST(sum(s) AS HUGEINT) AS t,
           |    sum(CAST(s AS HUGEINT) * s) AS sq,
           |    CAST(sum(CASE WHEN r <= 1 THEN s ELSE 0 END) AS HUGEINT)
           |      AS top1,
           |    CAST(sum(CASE WHEN r <= 4 THEN s ELSE 0 END) AS HUGEINT)
           |      AS top4,
           |    CAST(sum(CASE WHEN r <= 8 THEN s ELSE 0 END) AS HUGEINT)
           |      AS top8
           |  FROM rk GROUP BY market)
           |SELECT market, n_firms, CAST(t AS BIGINT) AS total,
           |  CASE WHEN t <> 0 THEN CAST(sq AS DOUBLE) * 10000.0
           |    / CAST(t AS DOUBLE) / CAST(t AS DOUBLE) END AS hhi,
           |  CASE WHEN t <> 0 THEN CAST(top1 AS DOUBLE) / CAST(t AS DOUBLE)
           |    END AS cr1,
           |  CASE WHEN t <> 0 THEN CAST(top4 AS DOUBLE) / CAST(t AS DOUBLE)
           |    END AS cr4,
           |  CASE WHEN t <> 0 THEN CAST(top8 AS DOUBLE) / CAST(t AS DOUBLE)
           |    END AS cr8
           |FROM a ORDER BY market""".stripMargin),
    "The supplier dim broadcasts into the fact scan; ONE (market, firm) " +
      "rollup with map-side combine; the rank window is market-partitioned " +
      "and the finish is |markets| rows. Exact integer squares — the " +
      "concentration ranking cannot flip across engines.")

  /** q396 — A-stat: Atkinson(ε=1) inequality of order values per
    * priority class — the welfare-form readout beside Gini (q142) and
    * Theil (q253), micro-nat-quantized per distinct value. */
  val q396 = Declared(
    "q396_atkinson_index", "A-stat",
    (s, dir) => graft.ops.Aggregates.atkinsonIndex(
      Tables.orders(s, dir),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
      col("o_orderpriority")),
    Some("""WITH v AS (
           |  SELECT o_orderpriority AS g,
           |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS x
           |  FROM orders),
           |pv AS (
           |  SELECT g, x, count(*) AS c,
           |    CAST(round(ln(x) * 1e6, 0) AS BIGINT) AS lnu
           |  FROM v WHERE x > 0 GROUP BY g, x),
           |a AS (
           |  SELECT g, CAST(sum(c) AS BIGINT) AS n,
           |    sum(CAST(x AS HUGEINT) * c) AS s,
           |    sum(CAST(lnu AS HUGEINT) * c) AS lns
           |  FROM pv GROUP BY g)
           |SELECT g, n, CAST(s AS BIGINT) AS sum_x,
           |  CAST(lns // n AS BIGINT) AS mean_ln_micro,
           |  round(1.0 - exp(CAST(CAST(lns // n AS BIGINT) AS DOUBLE) / 1e6)
           |    / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS atkinson
           |FROM a ORDER BY g""".stripMargin),
    "libm ln runs once per DISTINCT cent value (rollup-sized), quantized " +
      "to micro-nats and summed exactly; exp takes a bit-identical rational " +
      "argument. One (group, value) rollup with map-side combine — the " +
      "inequality panel (Gini/Theil/Atkinson) shares one scan shape.")

  /** q397 — E4/E2+: TextRank keyword extraction over the documents
    * corpus (Mihalcea & Tarau 2004) — co-occurrence graph of length-≥4
    * tokens, 3 integer PageRank rounds, top-20 keywords. The oracle
    * replays tokenization, vocabulary id assignment AND all three
    * rank rounds as unrolled CTEs — bit-for-bit. */
  val q397 = Declared(
    "q397_textrank_keywords", "E4,E2+",
    (s, dir) => graft.ext.TextAnalysis.textRankKeywords(
      Tables.documents(s, dir), col("doc_id"), col("text"), minLen = 4)
      .orderBy(col("rank_ppm").desc, col("word")).limit(20),
    Some("""WITH t AS (
           |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+')
           |    AS toks
           |  FROM documents),
           |p AS (
           |  SELECT doc_id, unnest(range(1, len(toks) + 1)) AS i, toks
           |  FROM t),
           |w AS (
           |  SELECT doc_id, i, toks[i] AS w FROM p
           |  WHERE length(toks[i]) >= 4),
           |nx AS (
           |  SELECT doc_id, w,
           |    lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS nw
           |  FROM w),
           |e0 AS (
           |  SELECT DISTINCT w AS wa, nw AS wb FROM nx
           |  WHERE nw IS NOT NULL AND nw <> w),
           |vw AS (SELECT wa AS word FROM e0 UNION SELECT wb FROM e0),
           |vocab AS (
           |  SELECT word, CAST(row_number() OVER (ORDER BY word) AS BIGINT)
           |    AS id
           |  FROM vw),
           |ed AS (
           |  SELECT va.id AS src, vb.id AS dst
           |  FROM e0 JOIN vocab va ON e0.wa = va.word
           |          JOIN vocab vb ON e0.wb = vb.word),
           |sym AS (SELECT src, dst FROM ed UNION
           |        SELECT dst AS src, src AS dst FROM ed),
           |deg AS (SELECT src AS node, count(*) AS deg FROM sym GROUP BY src),
           |r0 AS (SELECT node, deg, CAST(1000000 AS BIGINT) AS r FROM deg),
           |i1 AS (SELECT s.dst AS node, sum(r.r // r.deg) AS inflow
           |       FROM sym s JOIN r0 r ON s.src = r.node GROUP BY s.dst),
           |r1 AS (SELECT d.node, d.deg,
           |         CAST(150000 + (85 * coalesce(i.inflow, 0)) // 100
           |           AS BIGINT) AS r
           |       FROM deg d LEFT JOIN i1 i ON d.node = i.node),
           |i2 AS (SELECT s.dst AS node, sum(r.r // r.deg) AS inflow
           |       FROM sym s JOIN r1 r ON s.src = r.node GROUP BY s.dst),
           |r2 AS (SELECT d.node, d.deg,
           |         CAST(150000 + (85 * coalesce(i.inflow, 0)) // 100
           |           AS BIGINT) AS r
           |       FROM deg d LEFT JOIN i2 i ON d.node = i.node),
           |i3 AS (SELECT s.dst AS node, sum(r.r // r.deg) AS inflow
           |       FROM sym s JOIN r2 r ON s.src = r.node GROUP BY s.dst),
           |r3 AS (SELECT d.node, d.deg,
           |         CAST(150000 + (85 * coalesce(i.inflow, 0)) // 100
           |           AS BIGINT) AS r
           |       FROM deg d LEFT JOIN i3 i ON d.node = i.node)
           |SELECT v.word, r3.r AS rank_ppm
           |FROM r3 JOIN vocab v ON r3.node = v.id
           |ORDER BY rank_ppm DESC, word LIMIT 20""".stripMargin),
    "Tokenization is scan-side; edges dedup map-side; vocabulary ids come " +
      "from ONE bounded rank window over the |vocab| rollup; the 3 rank " +
      "rounds are node-keyed equi-joins + dst-keyed aggs. Integer ranks: " +
      "the top-20 cut is bit-stable at any partitioning — the keyword " +
      "extractor a labeling pipeline runs across millions of docs.")

  /** q398 — E2+: Katz centrality of the part-succession graph (what
    * part tends to FOLLOW what in an order) — influence by endorsement
    * without PageRank's out-degree discount; 3 integer rounds, top 25
    * parts. */
  val q398 = Declared(
    "q398_katz_centrality", "E2+",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // (orderkey, linenumber) is NOT unique in this synthetic table;
      // adding l_partkey makes the PARTKEY SEQUENCE total (rows tied on
      // both carry equal partkeys, so any tie order yields the same
      // succession pairs)
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"))
      val edges = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey").as("src"),
          lead(col("l_partkey"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull && col("dst") =!= col("src"))
      graft.ext.Graph.katzCentrality(edges, "src", "dst", iters = 3)
        .orderBy(col("katz_ppm").desc, col("node")).limit(25)
    },
    Some("""WITH nx AS (
           |  SELECT l_partkey AS src,
           |    lead(l_partkey) OVER (PARTITION BY l_orderkey
           |      ORDER BY l_linenumber, l_partkey) AS dst
           |  FROM lineitem),
           |e AS (SELECT DISTINCT src, dst FROM nx
           |      WHERE dst IS NOT NULL AND dst <> src),
           |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
           |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS k FROM nodes),
           |i1 AS (SELECT e.dst AS node, sum(r.k) AS inflow
           |       FROM e JOIN r0 r ON e.src = r.node GROUP BY e.dst),
           |r1 AS (SELECT n.node,
           |         CAST(1000000 + (20 * coalesce(i.inflow, 0)) // 100
           |           AS BIGINT) AS k
           |       FROM nodes n LEFT JOIN i1 i ON n.node = i.node),
           |i2 AS (SELECT e.dst AS node, sum(r.k) AS inflow
           |       FROM e JOIN r1 r ON e.src = r.node GROUP BY e.dst),
           |r2 AS (SELECT n.node,
           |         CAST(1000000 + (20 * coalesce(i.inflow, 0)) // 100
           |           AS BIGINT) AS k
           |       FROM nodes n LEFT JOIN i2 i ON n.node = i.node),
           |i3 AS (SELECT e.dst AS node, sum(r.k) AS inflow
           |       FROM e JOIN r2 r ON e.src = r.node GROUP BY e.dst),
           |r3 AS (SELECT n.node,
           |         CAST(1000000 + (20 * coalesce(i.inflow, 0)) // 100
           |           AS BIGINT) AS k
           |       FROM nodes n LEFT JOIN i3 i ON n.node = i.node)
           |SELECT node, k AS katz_ppm FROM r3
           |ORDER BY katz_ppm DESC, node LIMIT 25""".stripMargin),
    "One order-keyed window builds the succession edges (the q102 sort " +
      "shape on partkeys); each Katz round is one dst-keyed agg + one " +
      "node-keyed left join on the checkpointed edge list — no degree " +
      "join at all, cheaper per round than PageRank. Truncating integer " +
      "arithmetic keeps the top-25 bit-stable cluster-wide.")

  /** q399 — A-stat/A8: Weibull probability-plot fit of order-to-ship
    * fulfillment delay per order priority — the reliability-engineering
    * lifetime model (shape k < 1 infant-mortality, k ≈ 1 memoryless,
    * k > 1 wear-out) applied to operational latency. */
  val q399 = Declared(
    "q399_weibull_fit", "A-stat,A8",
    (s, dir) => {
      val dur = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("pri"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .as("delay"))
      graft.ops.EventAnalytics.weibullPlotFit(dur, col("delay"), col("pri"))
    },
    Some("""WITH r AS (
           |  SELECT o_orderpriority AS g,
           |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
           |      CAST(l_shipdate AS DATE)) AS BIGINT) AS t
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |ru AS (SELECT g, t, count(*) AS c FROM r WHERE t > 0
           |       GROUP BY 1, 2),
           |p AS (
           |  SELECT g, t, c,
           |    CAST(sum(c) OVER (PARTITION BY g ORDER BY t) AS BIGINT)
           |      AS cum,
           |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
           |  FROM ru),
           |q AS (
           |  SELECT g, n,
           |    CAST(round(ln(t) * 1e6, 0) AS BIGINT) AS x,
           |    CAST(round(ln(-ln(1.0 - (CAST(cum AS DOUBLE) * 10.0 - 3.0)
           |      / (CAST(n AS DOUBLE) * 10.0 + 4.0))) * 1e6, 0) AS BIGINT)
           |      AS y
           |  FROM p),
           |m AS (
           |  SELECT g, CAST(max(n) AS BIGINT) AS n,
           |    CAST(count(*) AS BIGINT) AS m_points,
           |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
           |    sum(CAST(x AS HUGEINT) * x) AS sxx,
           |    sum(CAST(x AS HUGEINT) * y) AS sxy,
           |    sum(CAST(y AS HUGEINT) * y) AS syy
           |  FROM q GROUP BY g),
           |f AS (
           |  SELECT g, n, m_points,
           |    CAST(m_points * sxx - sx * sx AS DOUBLE) AS sxxn,
           |    CAST(m_points * sxy - sx * sy AS DOUBLE) AS sxyn,
           |    CAST(m_points * syy - sy * sy AS DOUBLE) AS syyn,
           |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
           |  FROM m)
           |SELECT g, n, m_points,
           |  CASE WHEN m_points >= 2 AND sxxn <> 0 THEN
           |    round(sxyn / sxxn, 6) END AS shape,
           |  CASE WHEN m_points >= 2 AND sxxn <> 0 AND sxyn <> 0 THEN
           |    round(exp((sxd / CAST(m_points AS DOUBLE)
           |      - syd / CAST(m_points AS DOUBLE) / (sxyn / sxxn)) / 1e6), 6)
           |    END AS scale,
           |  CASE WHEN m_points >= 2 AND sxxn <> 0 AND syyn <> 0 THEN
           |    round(sxyn * sxyn / (sxxn * syyn), 6) END AS r2
           |FROM f ORDER BY g""".stripMargin),
    "The orders dim joins into the fact scan (broadcast at gate SF; " +
      "co-partitioned on orderkey at 100 TB); ONE (priority, delay) rollup " +
      "with map-side combine; libm runs once per distinct delay; the " +
      "regression is a 5-row finish. The latency-distribution model that " +
      "turns SLA debates into (shape, scale) numbers.")

  /** q400 — A8: Theta-method 14-day forecast of the daily order-count
    * series (Assimakopoulos & Nikolopoulos 2000, fixed-α variant) —
    * micro-integer trend + integer SES of the θ=2 line, averaged; the
    * oracle replays trend quantization AND the SES fold recursively. */
  val q400 = Declared(
    "q400_theta_forecast", "A8",
    (s, dir) => graft.ops.TimeSeriesOps.thetaForecast(
      Tables.orders(s, dir)
        .groupBy(expr("datediff(o_orderdate, DATE'1970-01-01')")
          .cast("long").as("day"))
        .agg(count(lit(1)).as("cnt")),
      col("day"), col("cnt"), horizon = 14).orderBy(col("h")),
    Some("""WITH RECURSIVE daily AS (
           |  SELECT CAST(datediff('day', DATE '1970-01-01', o_orderdate)
           |    AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1),
           |rk AS MATERIALIZED (
           |  SELECT t, v, row_number() OVER (ORDER BY t) AS r FROM daily),
           |s AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(v) AS BIGINT) AS sy,
           |    CAST(sum(r * v) AS BIGINT) AS siy
           |  FROM rk),
           |c AS (
           |  SELECT n, sy, siy, n * (n + 1) // 2 AS si,
           |    n * (n + 1) * (2 * n + 1) // 6 AS si2
           |  FROM s),
           |q AS (
           |  SELECT *, CAST((CAST(n AS HUGEINT) * siy
           |      - CAST(si AS HUGEINT) * sy) * 1000000
           |    // (CAST(n AS HUGEINT) * si2 - CAST(si AS HUGEINT) * si)
           |    AS BIGINT) AS bm
           |  FROM c),
           |q2 AS MATERIALIZED (
           |  SELECT *, CAST((CAST(sy AS HUGEINT) * 1000000
           |    - CAST(bm AS HUGEINT) * si) // n AS BIGINT) AS am
           |  FROM q),
           |fit(r, s) AS (
           |  SELECT 1, 2000000 * rk.v - (am + bm) FROM rk, q2
           |  WHERE rk.r = 1
           |  UNION ALL
           |  SELECT f.r + 1,
           |    ((2000000 * rk.v - (am + bm * (f.r + 1))) + f.s) // 2
           |  FROM fit f JOIN rk ON rk.r = f.r + 1, q2),
           |lvl AS (SELECT max_by(s, r) AS l FROM fit),
           |hh AS (SELECT range AS h FROM range(1, 15))
           |SELECT h, am + bm * (n + h) AS trend_micro,
           |  l AS ses_level_micro,
           |  (am + bm * (n + h) + l) // 2 AS forecast_micro,
           |  CAST((am + bm * (n + h) + l) // 2 AS DOUBLE) / 1e6
           |    AS forecast
           |FROM hh, q2, lvl ORDER BY h""".stripMargin),
    "The fact pass is the day rollup; OLS moments, trend quantization and " +
      "the SES fold all run over ONE collected rollup array in exact " +
      "integer state (Spark div ≡ DuckDB // even on negatives — verified), " +
      "so every horizon value is bit-portable. The M3-competition baseline " +
      "every demand forecast should have to beat.")

  /** q401 — ML/A-stat: 2-component Gaussian-mixture EM fit (Dempster-
    * Laird-Rubin 1977) of a PLANTED bimodal spend field (odd custkeys
    * shifted +$500k) — 4 integer-quantized EM rounds whose entire
    * trajectory the oracle replays as a recursive CTE. The soft twin
    * of q166's k-means. */
  val q401 = Declared(
    "q401_gmm2_em", "ML,A-stat",
    (s, dir) => graft.ops.Experimentation.gmm2Em(
      Tables.orders(s, dir),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
        " + CASE WHEN o_custkey % 2 = 1 THEN 50000000L ELSE 0L END"),
      iters = 4),
    Some("""WITH RECURSIVE v AS (
           |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)
           |    + CASE WHEN o_custkey % 2 = 1 THEN 50000000 ELSE 0 END AS x
           |  FROM orders),
           |rk AS MATERIALIZED (
           |  SELECT x, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY x),
           |mom AS (
           |  SELECT CAST(sum(c) AS BIGINT) AS n,
           |    CAST(sum(CAST(x AS HUGEINT) * c) AS HUGEINT) AS sx,
           |    sum(CAST(x AS HUGEINT) * x * c) AS sxx
           |  FROM rk),
           |ini AS MATERIALIZED (
           |  SELECT n, greatest(CAST((CAST(n AS HUGEINT) * sxx - sx * sx)
           |    // (CAST(n AS HUGEINT) * n) AS BIGINT), 1) AS v0
           |  FROM mom),
           |cum AS (SELECT x, sum(c) OVER (ORDER BY x) AS cum FROM rk),
           |qs AS MATERIALIZED (
           |  SELECT min(CASE WHEN cum >= (n + 3) // 4 THEN x END) AS q1,
           |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN x END) AS q3
           |  FROM cum, ini),
           |st(it, w1, mu1, v1, mu2, v2) AS (
           |  SELECT 0, CAST(500000 AS BIGINT), q1, v0, q3, v0
           |  FROM qs, ini
           |  UNION ALL
           |  SELECT it + 1,
           |    least(999999, greatest(1, CAST(r1m // nn AS BIGINT))),
           |    CASE WHEN r1m > 0 THEN CAST(nm1 AS BIGINT) ELSE mu1 END,
           |    CASE WHEN r1m > 0 THEN greatest(1, CAST(
           |      (sxx1 - nm1 * sx1 * 2 + nm1 * nm1 * r1m) // r1m
           |      AS BIGINT)) ELSE v1 END,
           |    CASE WHEN r2m > 0 THEN CAST(nm2 AS BIGINT) ELSE mu2 END,
           |    CASE WHEN r2m > 0 THEN greatest(1, CAST(
           |      (sxx2 - nm2 * sx2 * 2 + nm2 * nm2 * r2m) // r2m
           |      AS BIGINT)) ELSE v2 END
           |  FROM (
           |    SELECT y.*,
           |      CASE WHEN r1m > 0 THEN sx1 // r1m ELSE CAST(0 AS HUGEINT)
           |        END AS nm1,
           |      CASE WHEN r2m > 0 THEN sx2 // r2m ELSE CAST(0 AS HUGEINT)
           |        END AS nm2
           |    FROM (
           |    SELECT t.*,
           |      sum(CAST(c AS HUGEINT) * r1) OVER () AS r1m,
           |      sum(CAST(c AS HUGEINT) * r1 * x) OVER () AS sx1,
           |      sum(CAST(c AS HUGEINT) * r1 * x * x) OVER () AS sxx1,
           |      sum(CAST(c AS HUGEINT) * (1000000 - r1)) OVER () AS r2m,
           |      sum(CAST(c AS HUGEINT) * (1000000 - r1) * x) OVER ()
           |        AS sx2,
           |      sum(CAST(c AS HUGEINT) * (1000000 - r1) * x * x) OVER ()
           |        AS sxx2,
           |      row_number() OVER (ORDER BY x) AS rn
           |    FROM (
           |      SELECT st.it, st.w1, st.mu1, st.v1, st.mu2, st.v2,
           |        rk.x, rk.c, ini.n AS nn,
           |        CAST(floor(1e6 / (1.0 + exp(-(CAST(
           |          (CAST(floor(ln(w1) * 1e6 + 0.5) AS BIGINT)
           |            - CAST(floor(ln(v1) * 1e6 + 0.5) AS BIGINT) // 2
           |            - CAST((CAST(x - mu1 AS HUGEINT) * (x - mu1)
           |              * 1000000) // (2 * CAST(v1 AS HUGEINT))
           |              AS BIGINT))
           |          - (CAST(floor(ln(1000000 - w1) * 1e6 + 0.5) AS BIGINT)
           |            - CAST(floor(ln(v2) * 1e6 + 0.5) AS BIGINT) // 2
           |            - CAST((CAST(x - mu2 AS HUGEINT) * (x - mu2)
           |              * 1000000) // (2 * CAST(v2 AS HUGEINT))
           |              AS BIGINT))
           |          AS DOUBLE)) / 1e6)) + 0.5) AS BIGINT) AS r1
           |      FROM st, rk, ini WHERE st.it < 4) t) y
           |    WHERE rn = 1) z)
           |SELECT ini.n AS n,
           |  (SELECT CAST(count(*) AS BIGINT) FROM rk) AS n_distinct,
           |  CAST(4 AS BIGINT) AS iters, w1 AS w1_ppm, mu1, v1 AS var1,
           |  1000000 - w1 AS w2_ppm, mu2, v2 AS var2
           |FROM st, ini WHERE it = 4""".stripMargin),
    "ONE fact pass builds the distinct-value rollup; each EM round is a " +
      "broadcast-state scan + agg of that rollup with a 5-integer driver " +
      "state (the k-means license). Quantized responsibilities make the " +
      "trajectory engine-replayable — the oracle recursion IS the fit. " +
      "The planted +$500k mode is recovered: w ≈ 1/2, means a mode apart.")

  val all: Seq[Declared] =
    Seq(q391, q392, q393, q394, q395, q396, q397, q398, q399, q400, q401)
}
