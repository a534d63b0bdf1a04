package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Batch 76 — causal + linkage infrastructure: the synthetic-control
  * counterfactual gap (the panel-data causal method when there is ONE
  * treated unit and no experiment) and the blocking-quality audit
  * (reduction ratio / pairs completeness — the two numbers any dedup
  * or record-linkage blocking scheme is judged by).
  */
object Analytics32 {

  /** q402 — A-stat/causal: synthetic control for nation 0's monthly
    * revenue from donors 1-4 — simplex-lattice weights fit on
    * pre-1996 months, post-period actual-vs-synthetic gap read out.
    * Exact-integer SSE: the chosen weights can never flip. */
  val q402 = Declared(
    "q402_synthetic_control", "A-stat",
    (s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").as("u"),
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
            .cast("long").as("t"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
      graft.ops.Experimentation.syntheticControl(rev, col("u"), col("t"),
        col("cents"), treatedUnit = 0L, donorUnits = Seq(1L, 2L, 3L, 4L),
        preEnd = 199512L, den = 10)
    },
    Some("""WITH rev AS (
           |  SELECT s_nationkey AS u,
           |    CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
           |      AS t,
           |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS y
           |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           |  WHERE s_nationkey IN (0, 1, 2, 3, 4)
           |  GROUP BY 1, 2),
           |byt AS (
           |  SELECT t,
           |    CAST(sum(CASE WHEN u = 0 THEN y ELSE 0 END) AS BIGINT) AS y0,
           |    CAST(sum(CASE WHEN u = 1 THEN y ELSE 0 END) AS BIGINT) AS d0,
           |    CAST(sum(CASE WHEN u = 2 THEN y ELSE 0 END) AS BIGINT) AS d1,
           |    CAST(sum(CASE WHEN u = 3 THEN y ELSE 0 END) AS BIGINT) AS d2,
           |    CAST(sum(CASE WHEN u = 4 THEN y ELSE 0 END) AS BIGINT) AS d3
           |  FROM rev GROUP BY t),
           |lat AS (
           |  SELECT a.range AS w0, b.range AS w1, c.range AS w2,
           |    10 - a.range - b.range - c.range AS w3
           |  FROM range(0, 11) a, range(0, 11) b, range(0, 11) c
           |  WHERE a.range + b.range + c.range <= 10),
           |sse AS (
           |  SELECT w0, w1, w2, w3,
           |    sum((CAST(y0 AS HUGEINT) * 10
           |      - (w0 * CAST(d0 AS HUGEINT) + w1 * CAST(d1 AS HUGEINT)
           |        + w2 * CAST(d2 AS HUGEINT) + w3 * CAST(d3 AS HUGEINT)))
           |      * (CAST(y0 AS HUGEINT) * 10
           |      - (w0 * CAST(d0 AS HUGEINT) + w1 * CAST(d1 AS HUGEINT)
           |        + w2 * CAST(d2 AS HUGEINT) + w3 * CAST(d3 AS HUGEINT))))
           |      AS s
           |  FROM byt, lat WHERE t <= 199512 GROUP BY 1, 2, 3, 4),
           |best AS (SELECT w0, w1, w2, w3 FROM sse
           |         ORDER BY s, w0, w1, w2 LIMIT 1)
           |SELECT t, CASE WHEN t <= 199512 THEN 'pre' ELSE 'post' END
           |    AS phase,
           |  y0 AS actual,
           |  CAST(w0 * CAST(d0 AS HUGEINT) + w1 * CAST(d1 AS HUGEINT)
           |    + w2 * CAST(d2 AS HUGEINT) + w3 * CAST(d3 AS HUGEINT)
           |    AS BIGINT) AS synth_scaled,
           |  CAST(10 AS BIGINT) AS den,
           |  CAST(y0 AS DOUBLE)
           |    - CAST(CAST(w0 * CAST(d0 AS HUGEINT)
           |      + w1 * CAST(d1 AS HUGEINT) + w2 * CAST(d2 AS HUGEINT)
           |      + w3 * CAST(d3 AS HUGEINT) AS BIGINT) AS DOUBLE) / 10
           |    AS gap,
           |  w0 AS w1, w1 AS w2, w2 AS w3, w3 AS w4
           |FROM byt, best ORDER BY t""".stripMargin),
    "ONE (nation, month) rollup (supplier dim broadcasts into the scan); " +
      "the 286-row weight lattice cross-joins the CALENDAR-sized pre frame " +
      "only; the argmin and the readout are lattice/calendar-sized. The " +
      "no-experiment causal method for one-off launches, priced at a " +
      "broadcast.")

  /** q403 — E2: blocking-quality audit of a length-band blocking
    * scheme on the planted near-dup corpus — reduction ratio vs pairs
    * completeness against EXACT Jaccard-0.8 ground truth (the
    * prefix-filter join, q104's zero-missed-pairs machinery). */
  val q403 = Declared(
    "q403_blocking_audit", "E2",
    (s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      val corpus = docs.unionByName(
        docs.select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" mutationtoken")).as("text")))
      val assign = corpus.select(col("doc_id"),
        expr("length(text) div 40").as("block"))
      val truth = graft.ext.Dedup.prefixFilterJaccardPairs(
        corpus, "text", "doc_id", shingleSize = 3, tNum = 4, tDen = 5)
      graft.ext.Dedup.blockingAudit(assign, "doc_id", "block",
        truth, "id_a", "id_b")
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id < 100
           |  UNION ALL
           |  SELECT doc_id + 100000, text || ' mutationtoken'
           |  FROM documents WHERE doc_id < 100),
           |t AS (SELECT doc_id,
           |        regexp_split_to_array(lower(text), '\s+') AS toks
           |      FROM corpus),
           |st AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 2 + 1))
           |         AS i
           |       FROM t WHERE len(toks) >= 3),
           |sh AS (SELECT DISTINCT doc_id,
           |         array_to_string(list_slice(toks, i, i + 2), ' ')
           |           AS shingle
           |       FROM st),
           |c AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           |tr AS (
           |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
           |  FROM sh a JOIN sh b ON a.shingle = b.shingle
           |    AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |truth AS (
           |  SELECT ia, ib FROM tr
           |  JOIN c ca ON tr.ia = ca.doc_id JOIN c cb ON tr.ib = cb.doc_id
           |  WHERE inter * 5 >= (ca.n + cb.n - inter) * 4),
           |blocks AS (
           |  SELECT doc_id AS id, length(text) // 40 AS b FROM corpus),
           |cand AS (
           |  SELECT DISTINCT x.id AS ia, y.id AS ib
           |  FROM blocks x JOIN blocks y ON x.b = y.b AND x.id < y.id),
           |cov AS (SELECT count(*) AS covered
           |        FROM truth JOIN cand USING (ia, ib)),
           |agg AS (
           |  SELECT (SELECT CAST(count(DISTINCT id) AS BIGINT) FROM blocks)
           |      AS n_ids,
           |    (SELECT CAST(count(DISTINCT b) AS BIGINT) FROM blocks)
           |      AS n_blocks,
           |    (SELECT CAST(count(*) AS BIGINT) FROM cand)
           |      AS candidate_pairs,
           |    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS true_pairs,
           |    (SELECT CAST(covered AS BIGINT) FROM cov) AS covered_pairs)
           |SELECT n_ids, n_blocks,
           |  n_ids * (n_ids - 1) // 2 AS total_pairs,
           |  candidate_pairs, true_pairs, covered_pairs,
           |  1.0 - CAST(candidate_pairs AS DOUBLE)
           |    / CAST(n_ids * (n_ids - 1) // 2 AS DOUBLE)
           |    AS reduction_ratio,
           |  CASE WHEN true_pairs > 0 THEN CAST(covered_pairs AS DOUBLE)
           |    / CAST(true_pairs AS DOUBLE) END AS pairs_completeness
           |FROM agg""".stripMargin),
    "The audit's candidate join is the block equi-join itself — exactly " +
      "what the scheme costs in production; ground truth is the exact " +
      "prefix-filter join on the audit sample. RR vs PC is the dial every " +
      "100 TB dedup blocking scheme is tuned by: this query prices a " +
      "length-band blocker before anyone trusts it.")

  /** q404 — A5/A8: Holt–Winters-style seasonal forecast of daily
    * order counts (weekly season, classical decomposition + integer
    * Holt) — 14 days ahead with the weekday cycle re-applied; the
    * oracle replays profile, residual recursion and horizon. */
  val q404 = Declared(
    "q404_holt_winters", "A5,A8",
    (s, dir) => graft.ops.TimeSeriesOps.holtWintersForecast(
      Tables.orders(s, dir)
        .groupBy(expr("datediff(o_orderdate, DATE'1970-01-01')")
          .cast("long").as("day"))
        .agg(count(lit(1)).as("cnt")),
      col("day"), col("cnt"), m = 7, aNum = 1, aDen = 5,
      bNum = 1, bDen = 10, scale = 1000, horizon = 14),
    Some("""WITH RECURSIVE daily AS (
           |  SELECT CAST(datediff('day', DATE '1970-01-01', o_orderdate)
           |    AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1),
           |prof AS MATERIALIZED (
           |  SELECT t % 7 AS season,
           |    CAST(sum(v) // count(*) AS BIGINT) AS s_c
           |  FROM daily GROUP BY 1),
           |res AS MATERIALIZED (
           |  SELECT t, v - s_c AS rv,
           |    row_number() OVER (ORDER BY t) AS rn
           |  FROM daily JOIN prof ON daily.t % 7 = prof.season),
           |hw(rn, t, l, b) AS (
           |  SELECT rn, t, rv * 1000, CAST(0 AS BIGINT) FROM res
           |  WHERE rn = 1
           |  UNION ALL
           |  SELECT r.rn, r.t,
           |    (1 * r.rv * 1000 + 4 * (hw.l + hw.b)) // 5,
           |    (1 * ((1 * r.rv * 1000 + 4 * (hw.l + hw.b)) // 5 - hw.l)
           |      + 9 * hw.b) // 10
           |  FROM res r JOIN hw ON r.rn = hw.rn + 1),
           |fin AS (SELECT max_by(t, rn) AS tn, max_by(l, rn) AS l,
           |          max_by(b, rn) AS b FROM hw),
           |hh AS (SELECT range AS h FROM range(1, 15))
           |SELECT h, tn + h AS t, (tn + h) % 7 AS season, s_c AS seasonal_c,
           |  l AS level_s, b AS trend_s,
           |  l + h * b + s_c * 1000 AS forecast_s,
           |  CAST(l + h * b + s_c * 1000 AS DOUBLE) / 1000 AS forecast
           |FROM hh, fin JOIN prof ON (tn + h) % 7 = prof.season
           |ORDER BY h""".stripMargin),
    "A season-keyed agg (map-side combine) + the rollup-array Holt fold + " +
      "a 14-row finish — fact cost is the day rollup. The " +
      "seasonality-aware capacity forecast q173 alone can't produce: the " +
      "weekday cycle would otherwise swallow the trend signal.")

  /** q405 — A-stat: Benjamini–Yekutieli FDR over the q220 supplier
    * return-rate tests — the arbitrary-dependence-safe step-up next
    * to BH (q220) and Holm (q383): same p machinery, harmonically
    * deflated thresholds. */
  val q405 = Declared(
    "q405_by_fdr", "A-stat,W2",
    (s, dir) => graft.ops.Experimentation.byDiscoveries(
      Tables.lineitem(s, dir).select(col("l_suppkey").as("supplier"),
        col("l_returnflag")),
      "supplier", col("l_returnflag") === "R"),
    Some("""WITH g AS (
           |  SELECT supplier, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS successes
           |  FROM (SELECT l_suppkey AS supplier, l_returnflag FROM lineitem)
           |  GROUP BY supplier),
           |gl AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
           |              CAST(sum(successes) AS BIGINT) AS ts,
           |              CAST(count(*) AS BIGINT) AS m FROM g),
           |cn AS (
           |  SELECT CAST(sum(CASE WHEN r1.range <= m
           |    THEN 1000000000 // r1.range ELSE 0 END) AS BIGINT) AS cn
           |  FROM range(1, 1000001) r1, gl),
           |z AS (
           |  SELECT supplier, n, successes, m,
           |    (CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) -
           |       CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE)) /
           |    sqrt(CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE) *
           |         (1.0 - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE)) /
           |         CAST(n AS DOUBLE)) AS zv
           |  FROM g CROSS JOIN gl),
           |e AS (SELECT *, 1.0 / (1.0 + 0.3275911 * (abs(zv) / sqrt(2.0)))
           |        AS t, abs(zv) / sqrt(2.0) AS xa FROM z),
           |p AS (SELECT *,
           |    (((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
           |       - 0.284496736) * t + 0.254829592) * t) * exp(-(xa * xa))
           |      AS pv
           |  FROM e),
           |r AS (SELECT *, CAST(row_number() OVER (ORDER BY pv, supplier)
           |                     AS BIGINT) AS p_rank FROM p),
           |k AS (SELECT max(CASE WHEN pv <= CAST(p_rank AS DOUBLE) * 5 * 1e9
           |                      / 100 / CAST(m AS DOUBLE)
           |                      / CAST(cn AS DOUBLE)
           |                      THEN p_rank ELSE 0 END) AS kk
           |      FROM r, cn)
           |SELECT supplier, n, successes,
           |  successes * 1000000 // n AS rate_ppm,
           |  CAST(round(zv * 1000, 0) AS BIGINT) AS z_milli,
           |  CAST(round(pv * 1e9, 0) AS BIGINT) AS p_nano,
           |  p_rank, p_rank <= kk AS discovery
           |FROM r CROSS JOIN k
           |ORDER BY p_rank""".stripMargin),
    "Identical shuffle shape to q220 (one supplier agg, range-shuffle " +
      "p-rank, two broadcast scalars); c(m) is an order-free integer " +
      "nano-sum, so the deflated cutoffs are engine-stable. The safe " +
      "default when the hypotheses share structure — fewer discoveries, " +
      "honest FDR.")

  /** q406 — ML/E3: rank-1 ALS factorization of the customer×part
    * quantity matrix (Koren-Bell-Volinsky 2009) — 3 alternations on
    * the integer micro grid, top-20 items by final factor; the oracle
    * replays the whole alternating trajectory as one recursive CTE. */
  val q406 = Declared(
    "q406_als_rank1", "ML,E3",
    (s, dir) => {
      val ratings = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("u"), col("l_partkey").as("i"),
          col("l_quantity").cast("long").as("r"))
      graft.ext.Similarity.als1Factor(ratings, col("u"), col("i"),
        col("r"), iters = 3)
        .orderBy(col("factor_micro").desc, col("item")).limit(20)
    },
    Some("""WITH RECURSIVE e AS MATERIALIZED (
           |  SELECT o_custkey AS u, l_partkey AS i,
           |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS r
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  WHERE CAST(l_quantity AS BIGINT) > 0
           |  GROUP BY 1, 2),
           |st(it, side, id, f) AS (
           |  SELECT 0, 'v', i, CAST(1000000 AS BIGINT)
           |  FROM (SELECT DISTINCT i FROM e)
           |  UNION ALL
           |  SELECT it + 1, CASE WHEN side = 'v' THEN 'u' ELSE 'v' END,
           |    nid, CAST((num * 1000000000000) // den AS BIGINT)
           |  FROM (
           |    SELECT st.it, st.side,
           |      CASE WHEN st.side = 'v' THEN e.u ELSE e.i END AS nid,
           |      sum(CAST(e.r AS HUGEINT) * st.f) OVER (PARTITION BY
           |        CASE WHEN st.side = 'v' THEN e.u ELSE e.i END) AS num,
           |      sum(CAST(st.f AS HUGEINT) * st.f) OVER (PARTITION BY
           |        CASE WHEN st.side = 'v' THEN e.u ELSE e.i END) AS den,
           |      row_number() OVER (PARTITION BY
           |        CASE WHEN st.side = 'v' THEN e.u ELSE e.i END
           |        ORDER BY CASE WHEN st.side = 'v' THEN e.i ELSE e.u END)
           |        AS rn
           |    FROM st JOIN e ON (st.side = 'v' AND e.i = st.id)
           |                   OR (st.side = 'u' AND e.u = st.id)
           |    WHERE st.it < 6) t
           |  WHERE rn = 1),
           |cnt AS (SELECT i, CAST(count(*) AS BIGINT) AS n_users
           |        FROM e GROUP BY i)
           |SELECT id AS item, f AS factor_micro, n_users
           |FROM st JOIN cnt ON st.id = cnt.i
           |WHERE it = 6
           |ORDER BY factor_micro DESC, item LIMIT 20""".stripMargin),
    "Each half-step is ONE node-keyed equi-join + ONE node-keyed agg on " +
      "the checkpointed edge rollup — pageRank's shuffle shape with a " +
      "least-squares numerator; fixed rounds, no driver traffic. Positive " +
      "ratings keep factors positive, so truncating division is " +
      "engine-identical and the top-20 can never flip. Deflate and repeat " +
      "for higher ranks.")

  /** q407 — A-stat/A8: Aalen–Johansen cumulative incidence of order
    * resolution under competing risks — fulfilled ('F') vs partial
    * ('P'), open orders censored; duration = order date → last
    * shipment. The estimator 1−KM-per-cause gets wrong. */
  val q407 = Declared(
    "q407_aalen_johansen", "A-stat,A8",
    (s, dir) => {
      val subj = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(min(col("o_orderstatus")).as("st"),
          min(to_date(col("o_orderdate"))).as("fd"),
          max(to_date(col("l_shipdate"))).as("ld"))
        .select(col("st"), datediff(col("ld"), col("fd")).cast("long")
          .as("dur"))
      graft.ops.EventAnalytics.aalenJohansen(subj, col("dur"),
        col("st") === "F", col("st") === "P").orderBy(col("t"))
    },
    Some("""WITH RECURSIVE subj AS (
           |  SELECT o_orderkey, min(o_orderstatus) AS st,
           |    CAST(date_diff('day', CAST(min(o_orderdate) AS DATE),
           |      CAST(max(l_shipdate) AS DATE)) AS BIGINT) AS dur
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |  GROUP BY 1),
           |r0 AS (
           |  SELECT dur AS t,
           |    CAST(sum(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS d1,
           |    CAST(sum(CASE WHEN st = 'P' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS d2,
           |    CAST(count(*) AS BIGINT) AS alln
           |  FROM subj GROUP BY 1),
           |w AS MATERIALIZED (
           |  SELECT t, d1, d2, alln,
           |    CAST(sum(alln) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk,
           |    row_number() OVER (ORDER BY t) AS rn
           |  FROM r0),
           |aj(rn, t, n_risk, d1, d2, cens, s, c1, c2) AS (
           |  SELECT rn, t, n_risk, d1, d2, alln - d1 - d2,
           |    (1000000 * (n_risk - d1 - d2)) // n_risk,
           |    (1000000 * d1) // n_risk, (1000000 * d2) // n_risk
           |  FROM w WHERE rn = 1
           |  UNION ALL
           |  SELECT w.rn, w.t, w.n_risk, w.d1, w.d2,
           |    w.alln - w.d1 - w.d2,
           |    (aj.s * (w.n_risk - w.d1 - w.d2)) // w.n_risk,
           |    aj.c1 + (aj.s * w.d1) // w.n_risk,
           |    aj.c2 + (aj.s * w.d2) // w.n_risk
           |  FROM w JOIN aj ON w.rn = aj.rn + 1)
           |SELECT t, n_risk, d1, d2, cens AS censored, s AS surv_ppm,
           |  c1 AS cif1_ppm, c2 AS cif2_ppm
           |FROM aj ORDER BY t""".stripMargin),
    "The kaplanMeier envelope exactly: one duration-keyed agg with " +
      "map-side combine + suffix window + fold over the calendar-bounded " +
      "rollup — subject volume never shuffles twice. Integer ppm state: " +
      "the oracle recursion replays the estimator bit-for-bit. CIF₁+CIF₂+S " +
      "= 1 up to floor dust — the sanity identity 1−KM violates.")

  /** q408 — E4: Yule's characteristic K per language — the
    * size-invariant lexical-richness axis of the corpus quality
    * panel (template spam scores huge K at any document length). */
  val q408 = Declared(
    "q408_yule_k", "E4",
    (s, dir) => graft.ext.TextAnalysis.yuleK(
      Tables.documents(s, dir), col("text"), col("lang")),
    Some("""WITH t AS (
           |  SELECT lang AS g,
           |    unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |  FROM documents),
           |pt AS (
           |  SELECT g, w, count(*) AS c FROM t WHERE length(w) > 0
           |  GROUP BY 1, 2),
           |a AS (
           |  SELECT g, CAST(sum(c) AS BIGINT) AS n_tokens,
           |    CAST(count(*) AS BIGINT) AS n_types,
           |    sum(CAST(c AS HUGEINT) * c) AS s2
           |  FROM pt GROUP BY g)
           |SELECT g, n_tokens, n_types,
           |  1e4 * (CAST(s2 AS DOUBLE) - CAST(n_tokens AS DOUBLE))
           |    / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
           |    AS yule_k
           |FROM a ORDER BY g""".stripMargin),
    "ONE (lang, token) rollup with map-side combine then a |langs|-row " +
      "finish — the exact frequency-spectrum moment, no sampling. Pairs " +
      "with q87's gates and q250's Zipf slope as the repetitiveness axis " +
      "of corpus quality.")

  /** q409 — privacy: Mondrian k-anonymization of customers over the
    * (acctbal, nation) quasi-identifier pair, k=25 — the generalizer
    * whose output ranges a release publishes; the oracle replays the
    * full 8-round median-split tree recursively. */
  val q409 = Declared(
    "q409_mondrian_kanon", "privacy",
    (s, dir) => graft.ops.Privacy.mondrianKAnonymity(
      Tables.customer(s, dir), col("c_custkey"),
      expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"),
      col("c_nationkey"), k = 25, rounds = 8),
    Some("""WITH RECURSIVE base AS MATERIALIZED (
           |  SELECT c_custkey AS id,
           |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS v1,
           |    CAST(c_nationkey AS BIGINT) AS v2
           |  FROM customer),
           |g AS MATERIALIZED (
           |  SELECT greatest(max(v1) - min(v1), 1) AS g1,
           |         greatest(max(v2) - min(v2), 1) AS g2
           |  FROM base),
           |st(it, pid, id, v1, v2) AS (
           |  SELECT 0, CAST(0 AS BIGINT), id, v1, v2 FROM base
           |  UNION ALL
           |  SELECT it + 1,
           |    CASE WHEN nl < 25 OR c - nl < 25 THEN pid
           |         WHEN sv <= med THEN pid * 2 + 1
           |         ELSE pid * 2 + 2 END,
           |    id, v1, v2
           |  FROM (
           |    SELECT q4.*,
           |      sum(CASE WHEN sv <= med THEN 1 ELSE 0 END)
           |        OVER (PARTITION BY pid) AS nl
           |    FROM (
           |      SELECT q3.*,
           |        max(CASE WHEN rn = (c + 1) // 2 THEN sv END)
           |          OVER (PARTITION BY pid) AS med
           |      FROM (
           |        SELECT q2.*,
           |          row_number() OVER (PARTITION BY pid ORDER BY sv, id)
           |            AS rn
           |        FROM (
           |          SELECT q1.*,
           |            CASE WHEN CAST(r1 AS HUGEINT) * g2
           |                   >= CAST(r2 AS HUGEINT) * g1
           |              THEN v1 ELSE v2 END AS sv
           |          FROM (
           |            SELECT st.it, st.pid, st.id, st.v1, st.v2, g1, g2,
           |              count(*) OVER (PARTITION BY pid) AS c,
           |              max(v1) OVER (PARTITION BY pid)
           |                - min(v1) OVER (PARTITION BY pid) AS r1,
           |              max(v2) OVER (PARTITION BY pid)
           |                - min(v2) OVER (PARTITION BY pid) AS r2
           |            FROM st, g WHERE st.it < 8) q1) q2) q3) q4) q5)
           |SELECT pid, CAST(count(*) AS BIGINT) AS n,
           |  min(v1) AS qi1_min, max(v1) AS qi1_max,
           |  min(v2) AS qi2_min, max(v2) AS qi2_max
           |FROM st WHERE it = 8
           |GROUP BY pid ORDER BY pid""".stripMargin),
    "Each round is pid-partitioned windows over the release table — " +
      "`rounds` passes whose key count doubles as the tree descends (the " +
      "top of the tree is inherently few-partition: anonymize per stratum " +
      "or on the release sample at 100 TB). Exact integer medians and " +
      "cross-multiplied width compares: the partition tree — and thus the " +
      "published ranges — can never differ between engines. Every class " +
      "carries n >= k by construction.")

  /** q410 — A-stat: two-sample Cramér–von Mises criterion on
    * quantities of returned ('R') vs audited ('A') line items — the
    * whole-distribution companion to KS (q154) and Mann-Whitney
    * (q152), tie-exact via doubled midranks and closed-form range
    * sums. */
  val q410 = Declared(
    "q410_cramer_von_mises", "A-stat",
    (s, dir) => graft.ops.Aggregates.cramerVonMises2(
      Tables.lineitem(s, dir), col("l_quantity"), col("l_returnflag"),
      "R", "A"),
    Some("""WITH d AS (
           |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
           |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
           |pv AS (
           |  SELECT v, CAST(count(*) AS BIGINT) AS cnt,
           |    CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS ca
           |  FROM d GROUP BY v),
           |st AS (
           |  SELECT *, cnt - ca AS cb,
           |    coalesce(CAST(sum(ca) OVER (ORDER BY v ROWS BETWEEN
           |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS pa,
           |    coalesce(CAST(sum(cnt - ca) OVER (ORDER BY v ROWS BETWEEN
           |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS pb
           |  FROM pv),
           |s2 AS (SELECT *, (pa + pb) * 2 + cnt + 1 AS r2 FROM st),
           |rs AS (
           |  SELECT *,
           |    CAST(ca AS HUGEINT) * r2 * r2
           |      - CAST(r2 AS HUGEINT) * (CAST(ca AS HUGEINT) * pa
           |        + CAST(ca AS HUGEINT) * (ca + 1) // 2) * 4
           |      + (CAST(ca AS HUGEINT) * pa * pa
           |        + CAST(pa AS HUGEINT) * (CAST(ca AS HUGEINT)
           |          * (ca + 1) // 2) * 2
           |        + CAST(ca AS HUGEINT) * (ca + 1) * (2 * ca + 1) // 6)
           |        * 4 AS sa4,
           |    CAST(cb AS HUGEINT) * r2 * r2
           |      - CAST(r2 AS HUGEINT) * (CAST(cb AS HUGEINT) * pb
           |        + CAST(cb AS HUGEINT) * (cb + 1) // 2) * 4
           |      + (CAST(cb AS HUGEINT) * pb * pb
           |        + CAST(pb AS HUGEINT) * (CAST(cb AS HUGEINT)
           |          * (cb + 1) // 2) * 2
           |        + CAST(cb AS HUGEINT) * (cb + 1) * (2 * cb + 1) // 6)
           |        * 4 AS sb4
           |  FROM s2),
           |a AS (
           |  SELECT CAST(sum(ca) AS BIGINT) AS n_a,
           |    CAST(sum(cb) AS BIGINT) AS n_b,
           |    sum(sa4) AS ta, sum(sb4) AS tb
           |  FROM rs)
           |SELECT n_a, n_b,
           |  round(CAST(n_a * ta + n_b * tb AS DOUBLE) /
           |    CAST(CAST(n_a AS HUGEINT) * n_b * (n_a + n_b) * 4
           |      AS DOUBLE)
           |  - CAST(CAST(n_a AS HUGEINT) * n_b * 4 - 1 AS DOUBLE) /
           |    CAST((CAST(n_a AS HUGEINT) + n_b) * 6 AS DOUBLE), 6)
           |    AS t_cvm
           |FROM a""".stripMargin),
    "One distinct-value rollup with map-side combine; the cumulative " +
      "window is rollup-sized; every tie group contributes a CLOSED-FORM " +
      "integer range sum, so heavy ties (discrete quantities) cost one row " +
      "each, never a per-row walk. The spread-sensitive distribution test " +
      "KS misses mid-shape drift on.")

  /** q411 — A-stat/E2+: entropy rate of the user-journey event-type
    * Markov chain — stationary distribution by 6 integer ppm power
    * rounds, micro-nat cell entropies; the session-predictability
    * number ("are journeys becoming templated?"). */
  val q411 = Declared(
    "q411_markov_entropy_rate", "A-stat,E2+",
    (s, dir) => graft.ops.EventAnalytics.markovEntropyRate(
      Tables.events(s, dir), col("user_id"), col("ts"), col("event_id"),
      col("event_type")),
    Some("""WITH t AS (
           |  SELECT event_type AS s, lead(event_type) OVER (
           |    PARTITION BY user_id ORDER BY ts, event_id) AS d
           |  FROM events),
           |c AS MATERIALIZED (
           |  SELECT s, d, CAST(count(*) AS BIGINT) AS c FROM t
           |  WHERE d IS NOT NULL GROUP BY 1, 2),
           |r AS MATERIALIZED (
           |  SELECT s, CAST(sum(c) AS BIGINT) AS r FROM c GROUP BY 1),
           |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM r),
           |p0 AS (SELECT s AS state, CAST(1000000 // m AS BIGINT) AS pi
           |       FROM r, m),
           |p1 AS (SELECT c.d AS state,
           |         CAST(sum((p.pi * c.c) // r.r) AS BIGINT) AS pi
           |       FROM c JOIN r ON c.s = r.s JOIN p0 p ON p.state = c.s
           |       WHERE c.d IN (SELECT s FROM r) GROUP BY 1),
           |p2 AS (SELECT c.d AS state,
           |         CAST(sum((p.pi * c.c) // r.r) AS BIGINT) AS pi
           |       FROM c JOIN r ON c.s = r.s JOIN p1 p ON p.state = c.s
           |       WHERE c.d IN (SELECT s FROM r) GROUP BY 1),
           |p3 AS (SELECT c.d AS state,
           |         CAST(sum((p.pi * c.c) // r.r) AS BIGINT) AS pi
           |       FROM c JOIN r ON c.s = r.s JOIN p2 p ON p.state = c.s
           |       WHERE c.d IN (SELECT s FROM r) GROUP BY 1),
           |p4 AS (SELECT c.d AS state,
           |         CAST(sum((p.pi * c.c) // r.r) AS BIGINT) AS pi
           |       FROM c JOIN r ON c.s = r.s JOIN p3 p ON p.state = c.s
           |       WHERE c.d IN (SELECT s FROM r) GROUP BY 1),
           |p5 AS (SELECT c.d AS state,
           |         CAST(sum((p.pi * c.c) // r.r) AS BIGINT) AS pi
           |       FROM c JOIN r ON c.s = r.s JOIN p4 p ON p.state = c.s
           |       WHERE c.d IN (SELECT s FROM r) GROUP BY 1),
           |p6 AS (SELECT c.d AS state,
           |         CAST(sum((p.pi * c.c) // r.r) AS BIGINT) AS pi
           |       FROM c JOIN r ON c.s = r.s JOIN p5 p ON p.state = c.s
           |       WHERE c.d IN (SELECT s FROM r) GROUP BY 1),
           |h AS (
           |  SELECT c.s AS state,
           |    CAST(sum((c.c * CAST(floor(ln(CAST(r.r AS DOUBLE) /
           |      CAST(c.c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) // r.r)
           |      AS BIGINT) AS h_state_micro
           |  FROM c JOIN r ON c.s = r.s GROUP BY 1),
           |j AS (
           |  SELECT h.state, coalesce(p6.pi, 0) AS pi_ppm, h.h_state_micro
           |  FROM h LEFT JOIN p6 ON h.state = p6.state),
           |rate AS (
           |  SELECT CAST(sum((pi_ppm * h_state_micro) // 1000000)
           |    AS BIGINT) AS h_rate_micro
           |  FROM j)
           |SELECT state, CAST(pi_ppm AS BIGINT) AS pi_ppm, h_state_micro,
           |  h_rate_micro
           |FROM j, rate ORDER BY state""".stripMargin),
    "The fact pass is q102's user-keyed lead window + (src, dst) agg; the " +
      "power rounds and entropies run on the |types|² cell frame — " +
      "broadcast-sized at any event volume. Integer ppm π and micro-nat " +
      "cells: the predictability readout is bit-stable cluster-wide.")

  /** q412 — A-stat: Lin's concordance correlation between the order
    * header total and the line-item price sum per priority — the
    * continuous-agreement audit (bias counts, unlike Pearson) for the
    * classic "header vs detail" reconciliation. */
  val q412 = Declared(
    "q412_lin_concordance", "A-stat",
    (s, dir) => {
      val lineSum = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(expr(
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("line_cents"))
      val paired = Tables.orders(s, dir)
        .join(lineSum, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority").as("pri"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("hdr_cents"), col("line_cents"))
      graft.ops.Aggregates.linConcordance(paired, col("hdr_cents"),
        col("line_cents"), col("pri"))
    },
    Some("""WITH ls AS (
           |  SELECT l_orderkey,
           |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS y
           |  FROM lineitem GROUP BY 1),
           |p AS (
           |  SELECT o_orderpriority AS g,
           |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS x, y
           |  FROM orders JOIN ls ON o_orderkey = l_orderkey),
           |m AS (
           |  SELECT g, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
           |    sum(CAST(x AS HUGEINT) * x) AS sxx,
           |    sum(CAST(y AS HUGEINT) * y) AS syy,
           |    sum(CAST(x AS HUGEINT) * y) AS sxy
           |  FROM p GROUP BY g HAVING count(*) >= 2),
           |f AS (
           |  SELECT g, n, sx, sy,
           |    n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy,
           |    n * sxy - sx * sy AS cxy,
           |    (sx - sy) * (sx - sy) AS bias
           |  FROM m)
           |SELECT g, n,
           |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x,
           |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
           |  CASE WHEN vx <> 0 AND vy <> 0 THEN round(CAST(cxy AS DOUBLE)
           |    / sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)), 6) END
           |    AS pearson_r,
           |  CASE WHEN vx + vy + bias <> 0 THEN
           |    round(CAST(cxy AS DOUBLE) * 2.0
           |      / CAST(vx + vy + bias AS DOUBLE), 6) END AS ccc
           |FROM f ORDER BY g""".stripMargin),
    "One order-grain rollup + one priority-keyed moment agg, both " +
      "map-side combinable; the finish is 5 pinned IEEE chains. CCC < r " +
      "exposes systematic header/detail bias that correlation alone would " +
      "bless — the reconciliation gate in one number.")

  /** q413 — A-stat: process capability (Cp/Cpk) of order-to-ship
    * latency per priority against a [0, 90]-day spec window — the SPC
    * capability readout beside the XmR chart (q263). */
  val q413 = Declared(
    "q413_process_capability", "A-stat",
    (s, dir) => {
      val lat = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("pri"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast("long").as("delay"))
      graft.ops.Aggregates.processCapability(lat, col("delay"),
        col("pri"), lsl = 0L, usl = 90L)
    },
    Some("""WITH d AS (
           |  SELECT o_orderpriority AS g,
           |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
           |      CAST(l_shipdate AS DATE)) AS BIGINT) AS v
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |m AS (
           |  SELECT g, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(v) AS HUGEINT) AS s,
           |    sum(CAST(v AS HUGEINT) * v) AS ss
           |  FROM d GROUP BY g HAVING count(*) >= 2),
           |f AS (
           |  SELECT g, n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           |    sqrt(CAST(n * ss - s * s AS DOUBLE)) / CAST(n AS DOUBLE)
           |      AS std
           |  FROM m)
           |SELECT g, n, mean, std,
           |  CASE WHEN std <> 0 THEN 90.0 / (std * 6.0) END AS cp,
           |  CASE WHEN std <> 0 THEN
           |    least(90.0 - mean, mean - 0.0) / (std * 3.0) END AS cpk
           |FROM f ORDER BY g""".stripMargin),
    "One moment agg keyed by group (map-side combine); the capability " +
      "indices are pinned chains over exact integer moments. Cpk < 1 says " +
      "the fulfillment process ships out-of-SLA even when stable — the " +
      "spec-window verdict a latency dashboard should lead with.")

  /** q414 — A-stat/A8: seasonal Mann–Kendall trend of monthly order
    * counts (Hirsch-Slack 1984) — within-month year-over-year trend,
    * immune to the annual cycle that would pollute plain MK (q243). */
  val q414 = Declared(
    "q414_seasonal_mann_kendall", "A-stat,A8",
    (s, dir) => graft.ops.Aggregates.seasonalMannKendall(
      Tables.orders(s, dir)
        .groupBy(month(col("o_orderdate")).cast("long").as("sea"),
          year(col("o_orderdate")).cast("long").as("yr"))
        .agg(count(lit(1)).as("cnt")),
      col("sea"), col("yr"), col("cnt")),
    Some("""WITH ser AS (
           |  SELECT CAST(month(o_orderdate) AS BIGINT) AS sea,
           |    CAST(year(o_orderdate) AS BIGINT) AS t,
           |    CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1, 2),
           |ps AS (
           |  SELECT a.sea, CAST(sum(CASE WHEN b.v > a.v THEN 1
           |    WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
           |  FROM ser a JOIN ser b ON a.sea = b.sea AND a.t < b.t
           |  GROUP BY 1),
           |ties AS (
           |  SELECT sea, CAST(sum(c) AS BIGINT) AS n,
           |    CAST(sum(CAST(c AS HUGEINT) * (c - 1) * (2 * c + 5))
           |      AS HUGEINT) AS tsum
           |  FROM (SELECT sea, v, count(*) AS c FROM ser GROUP BY 1, 2)
           |  GROUP BY sea),
           |rws AS (
           |  SELECT t.sea, t.n, coalesce(ps.s, 0) AS s,
           |    CAST(t.n AS HUGEINT) * (t.n - 1) * (2 * t.n + 5) - t.tsum
           |      AS var18
           |  FROM ties t LEFT JOIN ps ON t.sea = ps.sea),
           |tot AS (
           |  SELECT CAST(sum(s) AS BIGINT) AS st, sum(var18) AS vt
           |  FROM rws)
           |SELECT sea AS season, n, s, CAST(var18 AS BIGINT) AS var18,
           |  st AS s_total, CAST(vt AS BIGINT) AS var18_total,
           |  round(CASE WHEN vt > 0 THEN
           |    CASE WHEN st > 0 THEN CAST(st - 1 AS DOUBLE)
           |        / sqrt(CAST(vt AS DOUBLE) / 18.0)
           |      WHEN st < 0 THEN CAST(st + 1 AS DOUBLE)
           |        / sqrt(CAST(vt AS DOUBLE) / 18.0)
           |      ELSE 0.0 END ELSE 0.0 END, 6) AS z
           |FROM rws, tot ORDER BY season""".stripMargin),
    "Pair spaces are per-season series² on the (month, year) rollup — " +
      "calendar-bounded; the season key keeps the self-join uniform. The " +
      "per-season S column shows WHICH months drive the drift; the total z " +
      "is the cycle-proof trend verdict.")

  /** q415 — E4: Burrows' Delta stylistic distance between document
    * sources over the 30 most frequent corpus words — the attribution
    * distance (z-scored function-word profiles, exact ppm counts). */
  val q415 = Declared(
    "q415_burrows_delta", "E4",
    (s, dir) => graft.ext.TextAnalysis.burrowsDelta(
      Tables.documents(s, dir), col("text"), col("source"), topK = 30),
    Some("""WITH aw AS (
           |  SELECT au, w, CAST(count(*) AS BIGINT) AS bc
           |  FROM (SELECT source AS au,
           |          unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |        FROM documents)
           |  WHERE length(w) > 0 GROUP BY 1, 2),
           |words AS (
           |  SELECT w FROM (
           |    SELECT w, row_number() OVER (ORDER BY sum(bc) DESC, w) AS r
           |    FROM aw GROUP BY w)
           |  WHERE r <= 30),
           |totals AS (SELECT au, CAST(sum(bc) AS BIGINT) AS tot
           |           FROM aw GROUP BY 1),
           |cells AS (
           |  SELECT t.au, wd.w, (coalesce(aw.bc, 0) * 1000000) // t.tot
           |    AS f
           |  FROM totals t CROSS JOIN words wd
           |  LEFT JOIN aw ON aw.au = t.au AND aw.w = wd.w),
           |stats AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS na,
           |    CAST(sum(f) AS HUGEINT) AS sf,
           |    sum(CAST(f AS HUGEINT) * f) AS sff
           |  FROM cells GROUP BY w),
           |z AS (
           |  SELECT c.au, c.w,
           |    CAST(floor(CASE WHEN
           |        sqrt(CAST(na * sff - sf * sf AS DOUBLE))
           |          / CAST(na AS DOUBLE) <> 0
           |      THEN (CAST(f AS DOUBLE)
           |          - CAST(sf AS DOUBLE) / CAST(na AS DOUBLE))
           |        / (sqrt(CAST(na * sff - sf * sf AS DOUBLE))
           |          / CAST(na AS DOUBLE))
           |      ELSE 0.0 END * 1e6 + 0.5) AS BIGINT) AS zz
           |  FROM cells c JOIN stats USING (w)),
           |pairs AS (
           |  SELECT z1.au AS author_a, z2.au AS author_b,
           |    CAST(count(*) AS BIGINT) AS k_words,
           |    CAST(sum(abs(z1.zz - z2.zz)) AS BIGINT) AS s
           |  FROM z z1 JOIN z z2 ON z1.w = z2.w AND z1.au < z2.au
           |  GROUP BY 1, 2)
           |SELECT author_a, author_b, k_words,
           |  s // k_words AS delta_micro,
           |  CAST(s // k_words AS DOUBLE) / 1e6 AS delta
           |FROM pairs ORDER BY author_a, author_b""".stripMargin),
    "ONE (source, word) rollup with map-side combine; the top-30 rank " +
      "runs on the word rollup (bounded window); the z frame is " +
      "|sources|×30 cells and the pair join |sources|² — broadcast-sized " +
      "forever. The style fingerprint that separates scraped sources " +
      "wearing the same template.")

  /** q416 — E4/IR: Dirichlet-smoothed query-likelihood retrieval over
    * the documents corpus for the query {hash, join, vector} — the
    * language-modeling ranker beside BM25 (q74/q79), micro-nat exact,
    * top-25 docs. */
  val q416 = Declared(
    "q416_dirichlet_ql", "E4",
    (s, dir) => graft.ext.Curation.dirichletQL(
      Tables.documents(s, dir), "text", "doc_id",
      Seq("hash", "join", "vector"), mu = 2000L)
      .orderBy(col("score_micro").desc, col("doc")).limit(25),
    Some("""WITH toks AS (
           |  SELECT d, w FROM (
           |    SELECT doc_id AS d,
           |      unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |    FROM documents)
           |  WHERE length(w) > 0),
           |lens AS (SELECT d, CAST(count(*) AS BIGINT) AS len
           |         FROM toks GROUP BY 1),
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM toks),
           |cf AS (SELECT w, CAST(count(*) AS BIGINT) AS cf FROM toks
           |       WHERE w IN ('hash', 'join', 'vector') GROUP BY 1),
           |tf AS (SELECT d, w, CAST(count(*) AS BIGINT) AS tf FROM toks
           |       WHERE w IN ('hash', 'join', 'vector') GROUP BY 1, 2),
           |hd AS (SELECT DISTINCT d FROM tf),
           |cells AS (
           |  SELECT hd.d, cf.w, cf.cf, coalesce(tf.tf, 0) AS tf
           |  FROM hd CROSS JOIN cf
           |  LEFT JOIN tf ON tf.d = hd.d AND tf.w = cf.w),
           |sc AS (
           |  SELECT c.d, c.tf, lens.len,
           |    CAST(floor(ln(
           |      CAST(CAST(c.tf AS HUGEINT) * t + 2000 * c.cf AS DOUBLE) /
           |      CAST(CAST(t AS HUGEINT) * (lens.len + 2000) AS DOUBLE))
           |      * 1e6 + 0.5) AS BIGINT) AS mnat
           |  FROM cells c JOIN lens ON lens.d = c.d, tot)
           |SELECT d AS doc, CAST(max(len) AS BIGINT) AS doc_len,
           |  CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_terms_hit,
           |  CAST(sum(mnat) AS BIGINT) AS score_micro
           |FROM sc GROUP BY d
           |ORDER BY score_micro DESC, doc LIMIT 25""".stripMargin),
    "ONE (doc, term) rollup with the |q|-term IN filter pushed to the " +
      "scan; corpus frequencies are a 3-row broadcast; libm runs once per " +
      "(hit-doc, term) cell, micro-nat quantized — integer scores, " +
      "bit-stable top-k. The verbose-query ranker the retrieval family " +
      "was missing next to BM25.")

  /** q417 — W2/A-stat: Expected Reciprocal Rank @10 per user on the
    * event stream (cascade click model) — the shadowing-aware ranking
    * metric beside NDCG (q164); dyadic-exact fold. */
  val q417 = Declared(
    "q417_err_at_k", "W2,A-stat",
    (s, dir) => {
      val cents = coalesce(
        (col("value").cast("decimal(18,2)") * 100).cast("long"), lit(0L))
      graft.ops.Ranking.errAtK(
          Tables.events(s, dir).withColumn("__g", pmod(cents, lit(5L))),
          col("user_id"), Seq(col("ts"), col("event_id")), col("__g"),
          k = 10, gmax = 4)
        .select(col("key").as("user_id"), col("n_items"), col("err"))
        .orderBy(col("user_id"))
    },
    Some("""WITH d AS (
           |  SELECT user_id,
           |    ((coalesce(CAST(CAST(value AS DECIMAL(18,2)) * 100
           |      AS BIGINT), 0) % 5) + 5) % 5 AS g,
           |    row_number() OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS p
           |  FROM events),
           |l AS (
           |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_items,
           |    list([CAST(p AS DOUBLE), CAST(g AS DOUBLE)] ORDER BY p)
           |      AS xs
           |  FROM d WHERE p <= 10 GROUP BY user_id)
           |SELECT user_id, n_items,
           |  list_reduce(list_prepend([1.0, 0.0], xs),
           |    (a, x) -> [a[1] * (1.0 - (power(2.0, x[2]) - 1.0) / 16.0),
           |               a[2] + a[1] * ((power(2.0, x[2]) - 1.0) / 16.0)
           |                 / x[1]])[2] AS err
           |FROM l ORDER BY user_id""".stripMargin),
    "One user-keyed rank window + a 10-bounded collect per user — the " +
      "q164 envelope. Stop probabilities are dyadic rationals (≤ 40 " +
      "fractional bits at k=10), so the fold is EXACT double arithmetic " +
      "and both engines replay the identical operation sequence — no " +
      "quantization needed at all.")

  /** q418 — T-state/A8: STREAMING tabular CUSUM drift alarm per event
    * type (Page 1954) — the live volume-drift monitor carried as
    * flatMapGroupsWithState custom state, verified bit-for-bit
    * against the batch CUSUM recursion (the q126/q337 contract: the
    * monitoring loop and the warehouse agree exactly). */
  val q418 = Declared(
    "q418_stream_cusum", "T-state,A8",
    (s, dir) => {
      import s.implicits._
      TimeSeries.streamEventsToTable(s, dir, "q418", mode = "append")(ev =>
        graft.streaming.StreamOps.statefulDailyCusum(
          ev.select(col("event_type").as("key"), col("ts"))
            .as[graft.streaming.StreamOps.KeyedStamp],
          mu0 = 66L, slack = 3L, h = 40L).toDF())
        // changelog compaction: keep the final (largest-n) row per day
        .groupBy(col("event_type"), col("day"))
        .agg(max(col("n")).as("n"),
          expr("max_by(s_pos, n)").as("s_pos"),
          expr("max_by(s_neg, n)").as("s_neg"),
          expr("max_by(alarm, n)").as("alarm"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""WITH RECURSIVE d AS (
           |  SELECT event_type, CAST(ts AS DATE) AS day,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM events GROUP BY 1, 2),
           |r AS (
           |  SELECT *, row_number() OVER (PARTITION BY event_type
           |    ORDER BY day) AS rn
           |  FROM d),
           |s AS (
           |  SELECT event_type, rn, day, n,
           |    greatest(0, n - 66 - 3) AS sp,
           |    greatest(0, 66 - n - 3) AS sn
           |  FROM r WHERE rn = 1
           |  UNION ALL
           |  SELECT r.event_type, r.rn, r.day, r.n,
           |    greatest(0, s.sp + (r.n - 66 - 3)),
           |    greatest(0, s.sn + (66 - r.n - 3))
           |  FROM r JOIN s ON r.event_type = s.event_type
           |    AND r.rn = s.rn + 1)
           |SELECT event_type, day, n, sp AS s_pos, sn AS s_neg,
           |  (sp >= 40 OR sn >= 40) AS alarm
           |FROM s ORDER BY event_type, day""".stripMargin),
    "State is 28 bytes per key, shuffle keyed on the type; each batch " +
      "folds its own (key, day) rollup. The drift detector pages BEFORE " +
      "the nightly batch job would notice, and the oracle proves the " +
      "stream and the warehouse compute the same alarm stream — no " +
      "monitoring/reporting split-brain.")

  /** q419 — E2+: rich-club coefficient profile of the part-succession
    * graph — do the hub parts interlink into a club? (Colizza et al.
    * 2006). Exact integer counts per degree threshold. */
  val q419 = Declared(
    "q419_rich_club", "E2+",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"))
      val edges = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey").as("src"),
          lead(col("l_partkey"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull && col("dst") =!= col("src"))
      graft.ext.Graph.richClub(edges, "src", "dst", Seq(5, 10, 20, 40))
    },
    Some("""WITH nx AS (
           |  SELECT l_partkey AS src,
           |    lead(l_partkey) OVER (PARTITION BY l_orderkey
           |      ORDER BY l_linenumber, l_partkey) AS dst
           |  FROM lineitem),
           |e0 AS (
           |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           |  FROM nx WHERE dst IS NOT NULL AND dst <> src),
           |deg AS (
           |  SELECT node, CAST(count(*) AS BIGINT) AS deg
           |  FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
           |  GROUP BY 1),
           |ks(k) AS (VALUES (5), (10), (20), (40)),
           |er AS (
           |  SELECT k, CAST(count(CASE WHEN da.deg > k AND db.deg > k
           |    THEN 1 END) AS BIGINT) AS e_rich
           |  FROM ks CROSS JOIN e0
           |  JOIN deg da ON e0.a = da.node JOIN deg db ON e0.b = db.node
           |  GROUP BY k),
           |nr AS (
           |  SELECT k, CAST(count(CASE WHEN deg > k THEN 1 END) AS BIGINT)
           |    AS n_rich
           |  FROM ks CROSS JOIN deg GROUP BY k)
           |SELECT CAST(k AS BIGINT) AS k, n_rich, e_rich,
           |  CASE WHEN n_rich >= 2 THEN CAST(e_rich AS DOUBLE) * 2.0
           |    / (CAST(n_rich AS DOUBLE) * CAST(n_rich - 1 AS DOUBLE)) END
           |    AS phi
           |FROM er JOIN nr USING (k) ORDER BY k""".stripMargin),
    "Degrees are one agg of the canonical edge list; each threshold is a " +
      "conditional agg over degree-joined edges — |ks| scans of one " +
      "broadcast-degree frame, never a pair blowup. Rising φ(k) = the " +
      "hubs fail together; the supply-chain concentration readout beside " +
      "q395's HHI.")

  /** q420 — A-stat/uplift: Qini curve and coefficient of account-
    * balance-ranked targeting for urgent-order conversion under the
    * custkey-parity pseudo-experiment — the uplift-model acceptance
    * number beside q358's bands. */
  val q420 = Declared(
    "q420_qini", "A-stat",
    (s, dir) => {
      val oy = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === 1995 &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(col("o_custkey")).agg(lit(1L).as("y"))
      val units = Tables.customer(s, dir)
        .join(oy, col("c_custkey") === col("o_custkey"), "left")
        .select(
          expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("sc"),
          col("c_custkey").as("id"),
          (col("c_custkey") % 2 === 1).as("tr"),
          (coalesce(col("y"), lit(0L)) === 1L).as("yy"))
      graft.ops.Experimentation.qiniCurve(units, col("sc"), col("id"),
        col("tr"), col("yy"))
    },
    Some("""WITH oy AS (
           |  SELECT o_custkey, CAST(1 AS BIGINT) AS y FROM orders
           |  WHERE year(o_orderdate) = 1995
           |    AND o_orderpriority IN ('1-URGENT', '2-HIGH')
           |  GROUP BY 1),
           |u AS (
           |  SELECT c_custkey AS id,
           |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS sc,
           |    c_custkey % 2 AS tr, coalesce(oy.y, 0) AS y
           |  FROM customer LEFT JOIN oy ON o_custkey = c_custkey),
           |r AS (
           |  SELECT *, row_number() OVER (ORDER BY sc DESC, id) AS rn,
           |    count(*) OVER () AS n
           |  FROM u),
           |dec AS (
           |  SELECT ((rn - 1) * 10) // n + 1 AS decile,
           |    CAST(sum(tr) AS BIGINT) AS n_t,
           |    CAST(sum(1 - tr) AS BIGINT) AS n_c,
           |    CAST(sum(tr * y) AS BIGINT) AS y_t,
           |    CAST(sum((1 - tr) * y) AS BIGINT) AS y_c
           |  FROM r GROUP BY 1),
           |g AS (
           |  SELECT *,
           |    1000000 * cyt - CAST(CAST(1000000 AS HUGEINT) * cyc * cnt
           |      // greatest(cnc, 1) AS BIGINT) AS qini_micro
           |  FROM (
           |    SELECT *,
           |      CAST(sum(n_t) OVER w AS BIGINT) AS cnt,
           |      CAST(sum(n_c) OVER w AS BIGINT) AS cnc,
           |      CAST(sum(y_t) OVER w AS BIGINT) AS cyt,
           |      CAST(sum(y_c) OVER w AS BIGINT) AS cyc
           |    FROM dec WINDOW w AS (ORDER BY decile))),
           |a AS (
           |  SELECT CAST(sum(gprev + qini_micro) AS BIGINT) AS trap2,
           |    max(CASE WHEN decile = 10 THEN qini_micro END) AS g10
           |  FROM (SELECT *, coalesce(lag(qini_micro)
           |          OVER (ORDER BY decile), 0) AS gprev
           |        FROM g))
           |SELECT decile, n_t, n_c, y_t, y_c, qini_micro,
           |  trap2 // 20 AS auq_micro,
           |  trap2 // 20 - g10 // 2 AS qini_coef_micro
           |FROM g, a ORDER BY decile""".stripMargin),
    "One range-shuffle rank over UNITS (customers, not orders), a 10-row " +
      "decile rollup, integer trapezoid algebra — the uplift acceptance " +
      "number at dimension-table cost. Parity assignment means true " +
      "uplift ≈ 0: the near-zero coefficient IS the calibration check.")

  /** q421 — E4: "Fightin' Words" contrastive keywords — which words
    * distinguish English docs from the rest, under the informative
    * Dirichlet prior that tames both rare and frequent words (Monroe
    * et al. 2008). Top 20 by z. */
  val q421 = Declared(
    "q421_fightin_words", "E4",
    (s, dir) => graft.ext.TextAnalysis.logOddsFightinWords(
      Tables.documents(s, dir), col("text"), col("lang") === "en",
      alpha0 = 500L)
      .orderBy(col("z").desc, col("word")).limit(20),
    Some("""WITH c AS (
           |  SELECT w,
           |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS ya,
           |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
           |      AS BIGINT) AS yb
           |  FROM (SELECT lang,
           |          unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |        FROM documents)
           |  WHERE length(w) > 0 GROUP BY w),
           |t AS (SELECT CAST(sum(ya) AS BIGINT) AS na,
           |             CAST(sum(yb) AS BIGINT) AS nb FROM c),
           |s AS (
           |  SELECT w, ya, yb, na + nb AS nn, ya + yb AS cw FROM c, t),
           |s2 AS (
           |  SELECT w, ya, yb,
           |    CAST(ya AS HUGEINT) * nn + CAST(cw AS HUGEINT) * 500 AS pa,
           |    CAST(na AS HUGEINT) * nn + CAST(500 AS HUGEINT) * nn
           |      - CAST(ya AS HUGEINT) * nn - CAST(cw AS HUGEINT) * 500
           |      AS qa,
           |    CAST(yb AS HUGEINT) * nn + CAST(cw AS HUGEINT) * 500 AS pb,
           |    CAST(nb AS HUGEINT) * nn + CAST(500 AS HUGEINT) * nn
           |      - CAST(yb AS HUGEINT) * nn - CAST(cw AS HUGEINT) * 500
           |      AS qb,
           |    nn
           |  FROM s, t),
           |s3 AS (
           |  SELECT w, ya AS y_a, yb AS y_b,
           |    CAST(floor(ln(CAST(pa AS DOUBLE) / CAST(qa AS DOUBLE))
           |      * 1e6 + 0.5) AS BIGINT)
           |    - CAST(floor(ln(CAST(pb AS DOUBLE) / CAST(qb AS DOUBLE))
           |      * 1e6 + 0.5) AS BIGINT) AS delta_micro,
           |    CAST(nn AS DOUBLE) / CAST(pa AS DOUBLE)
           |      + CAST(nn AS DOUBLE) / CAST(pb AS DOUBLE) AS v
           |  FROM s2)
           |SELECT w AS word, y_a, y_b, delta_micro,
           |  round(CAST(delta_micro AS DOUBLE) / 1e6 / sqrt(v), 6) AS z
           |FROM s3 ORDER BY z DESC, word LIMIT 20""".stripMargin),
    "ONE (word, side) rollup with map-side combine; scoring is per-word " +
      "scan arithmetic on the vocab rollup. The corpus-comparison " +
      "statistic that replaces both raw log-odds (rare-word blowups) and " +
      "chi2 keywords (q292's frequent-word bias) for 'what makes slice A " +
      "different'.")

  /** q422 — E2/J-fuzzy: exact edit-distance-1 join by FastSS deletion
    * neighborhoods over part names with planted last-char AND
    * first-char corruptions — recall-complete where q108's prefix
    * blocking is structurally blind (first-character edits). */
  val q422 = Declared(
    "q422_edit_distance_join", "E2,J-fuzzy",
    (s, dir) => {
      // fixed-size audit corpus: ed<=1 pair density in these synthetic
      // names grows ~quadratically with the dictionary, so the query
      // pins its input size rather than scaling with SF
      val parts = Tables.part(s, dir).filter(col("p_partkey") <= 2500)
      val clean = parts.select(col("p_partkey").as("id"),
        col("p_name").as("name"))
      val dirtyTail = parts.filter(col("p_partkey") % 7 === 0)
        .select((col("p_partkey") + 10000000L).as("id"),
          expr("substring(p_name, 1, length(p_name) - 1)").as("name"))
      val dirtyHead = parts.filter(col("p_partkey") % 11 === 0)
        .select((col("p_partkey") + 20000000L).as("id"),
          expr("substring(p_name, 2)").as("name"))
      graft.ext.Dedup.editDistance1Join(
        clean.unionByName(dirtyTail).unionByName(dirtyHead), "id", "name")
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH pt AS (SELECT * FROM part WHERE p_partkey <= 2500),
           |corpus AS (
           |  SELECT p_partkey AS id, p_name AS name FROM pt
           |  UNION ALL
           |  SELECT p_partkey + 10000000,
           |    substring(p_name, 1, length(p_name) - 1)
           |  FROM pt WHERE p_partkey % 7 = 0
           |  UNION ALL
           |  SELECT p_partkey + 20000000, substring(p_name, 2)
           |  FROM pt WHERE p_partkey % 11 = 0),
           |base AS (SELECT DISTINCT id, name FROM corpus
           |         WHERE name IS NOT NULL),
           |v AS (
           |  SELECT DISTINCT id, name,
           |    CASE WHEN i = 0 THEN name
           |      ELSE substring(name, 1, i - 1) || substring(name, i + 1)
           |      END AS var
           |  FROM base, unnest(range(0, length(name) + 1)) AS t(i)),
           |cand AS (
           |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           |    a.name AS s_a, b.name AS s_b
           |  FROM v a JOIN v b ON a.var = b.var AND a.id < b.id)
           |SELECT id_a, id_b, s_a, s_b,
           |  CAST(levenshtein(s_a, s_b) AS BIGINT) AS dist
           |FROM cand WHERE levenshtein(s_a, s_b) <= 1
           |ORDER BY id_a, id_b""".stripMargin),
    "The explode is |s|+1 variants per DISTINCT name; the join keys on " +
      "variant content (uniform hash); candidates are " +
      "true-neighborhood-sized, never n². Deletion neighborhoods are " +
      "recall-COMPLETE at distance 1 — the first-char corruptions planted " +
      "here are exactly what prefix blocking silently loses.")

  /** q423 — A-stat/attribution: Markov-chain removal-effect channel
    * attribution for purchase journeys (Anderl et al. 2016) — credit
    * = how much START→CONV absorption drops when the channel is
    * deleted; integer ppm value iteration (40 rounds), fully replayed
    * by the oracle's recursive CTE over the padded transition
    * matrix. */
  val q423 = Declared(
    "q423_markov_attribution", "A-stat",
    (s, dir) => graft.ops.EventAnalytics.markovRemovalAttribution(
      Tables.events(s, dir), col("user_id"), col("ts"), col("event_id"),
      col("event_type"), convType = "purchase", iters = 40),
    Some("""WITH RECURSIVE fc AS (
           |  SELECT user_id, min(ROW(ts, event_id)) AS fc
           |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
           |tch AS (
           |  SELECT e.user_id, e.event_type AS t,
           |    lead(e.event_type) OVER w AS nxt,
           |    row_number() OVER w AS rn,
           |    fc.fc IS NOT NULL AS conv
           |  FROM events e LEFT JOIN fc ON e.user_id = fc.user_id
           |  WHERE e.event_type <> 'purchase'
           |    AND (fc.fc IS NULL OR ROW(e.ts, e.event_id) < fc.fc)
           |  WINDOW w AS (PARTITION BY e.user_id ORDER BY e.ts, e.event_id)),
           |edges AS (
           |  SELECT t AS src, coalesce(nxt,
           |      CASE WHEN conv THEN 'CONV' ELSE 'NULL' END) AS dst
           |  FROM tch
           |  UNION ALL
           |  SELECT 'START', t FROM tch WHERE rn = 1),
           |cnt AS MATERIALIZED (
           |  SELECT src, dst, CAST(count(*) AS BIGINT) AS c
           |  FROM edges GROUP BY 1, 2),
           |chans AS MATERIALIZED (
           |  SELECT DISTINCT s AS ch FROM (
           |    SELECT src AS s FROM cnt UNION SELECT dst FROM cnt)
           |  WHERE s NOT IN ('START', 'CONV', 'NULL')),
           |states AS MATERIALIZED (
           |  SELECT 'START' AS s UNION ALL SELECT 'CONV'
           |  UNION ALL SELECT 'NULL' UNION ALL SELECT ch FROM chans),
           |stm AS MATERIALIZED (
           |  SELECT src, dst, c FROM cnt
           |  UNION ALL SELECT s, 'NULL', 0 FROM states),
           |rsum AS MATERIALIZED (
           |  SELECT src, CAST(sum(c) AS BIGINT) AS r FROM stm GROUP BY 1),
           |rms AS MATERIALIZED (
           |  SELECT 'NONE' AS rm UNION ALL SELECT ch FROM chans),
           |st(rm, it, s, p) AS (
           |  SELECT rm, 0, s,
           |    CASE WHEN s = 'CONV' THEN CAST(1000000 AS BIGINT)
           |      ELSE CAST(0 AS BIGINT) END
           |  FROM rms, states
           |  UNION ALL
           |  SELECT rm, it + 1, src,
           |    CASE WHEN src = rm THEN 0
           |      WHEN r = 0 THEN
           |        CASE WHEN src = 'CONV' THEN 1000000 ELSE 0 END
           |      ELSE inflow // r END
           |  FROM (
           |    SELECT x.rm, x.it, m.src, rs.r,
           |      sum(m.c * (CASE WHEN x.s = x.rm THEN 0 ELSE x.p END))
           |        OVER (PARTITION BY x.rm, m.src) AS inflow,
           |      row_number() OVER (PARTITION BY x.rm, m.src
           |        ORDER BY x.s) AS rn
           |    FROM st x JOIN stm m ON m.dst = x.s
           |    JOIN rsum rs ON rs.src = m.src
           |    WHERE x.it < 40) z
           |  WHERE rn = 1),
           |fin AS (SELECT rm, p FROM st WHERE it = 40 AND s = 'START'),
           |re AS (
           |  SELECT ch AS channel,
           |    (SELECT p FROM fin WHERE rm = 'NONE') AS base_conv_ppm,
           |    fin.p AS removed_conv_ppm,
           |    (SELECT p FROM fin WHERE rm = 'NONE') - fin.p
           |      AS removal_effect_ppm
           |  FROM chans JOIN fin ON fin.rm = chans.ch),
           |tot AS (SELECT greatest(CAST(sum(removal_effect_ppm) AS BIGINT),
           |          1) AS t FROM re)
           |SELECT channel, base_conv_ppm, removed_conv_ppm,
           |  removal_effect_ppm,
           |  (removal_effect_ppm * 1000000) // t AS share_ppm
           |FROM re, tot ORDER BY channel""".stripMargin),
    "ONE actor-keyed window pass builds transitions (the q102 sort " +
      "shape); the matrix collapses to a ≤(|types|+3)² rollup and the " +
      "value iteration replaces the matrix inverse with 40 integer ppm " +
      "rounds — no solve, engine-replayable. The attribution model that " +
      "prices channels by graph damage, not position heuristics.")

  /** q424 — A5/A8: fixed-origin forecast backtest — theta fit on the
    * daily order counts up to 1998-06-30 only, scored on the 14
    * UNSEEN days after (WAPE + MASE vs naive). The honest-evaluation
    * loop that keeps q400/q404 from grading their own homework. */
  val q424 = Declared(
    "q424_forecast_backtest", "A5,A8",
    (s, dir) => graft.ops.TimeSeriesOps.forecastBacktest(
      Tables.orders(s, dir)
        .groupBy(expr("datediff(o_orderdate, DATE'1970-01-01')")
          .cast("long").as("day"))
        .agg(count(lit(1)).as("cnt")),
      col("day"), col("cnt"), splitT = 10407L, horizon = 14),
    Some("""WITH RECURSIVE daily AS (
           |  SELECT CAST(datediff('day', DATE '1970-01-01', o_orderdate)
           |    AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1),
           |rk AS MATERIALIZED (
           |  SELECT t, v, row_number() OVER (ORDER BY t) AS r
           |  FROM daily WHERE t <= 10407),
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
           |fit(r, st) AS (
           |  SELECT 1, 2000000 * rk.v - (am + bm) FROM rk, q2
           |  WHERE rk.r = 1
           |  UNION ALL
           |  SELECT f.r + 1,
           |    ((2000000 * rk.v - (am + bm * (f.r + 1))) + f.st) // 2
           |  FROM fit f JOIN rk ON rk.r = f.r + 1, q2),
           |lvl AS (SELECT max_by(st, r) AS l FROM fit),
           |tn AS (SELECT max(t) AS tmax FROM rk),
           |hh AS (SELECT range AS h FROM range(1, 15)),
           |fc AS (
           |  SELECT h, tmax + h AS t,
           |    (am + bm * (n + h) + l) // 2 AS forecast_micro
           |  FROM hh, q2, lvl, tn),
           |lastv AS (SELECT max_by(v, t) AS lastv FROM daily
           |          WHERE t <= 10407),
           |sc AS MATERIALIZED (
           |  SELECT fc.h, fc.t, d.v AS actual, fc.forecast_micro,
           |    abs(d.v * 1000000 - fc.forecast_micro) AS ae_micro,
           |    abs(d.v - lastv) * 1000000 AS naive_ae_micro
           |  FROM fc JOIN daily d ON d.t = fc.t, lastv),
           |tot AS (
           |  SELECT CAST(sum(ae_micro) AS BIGINT) AS sae,
           |    CAST(sum(naive_ae_micro) AS BIGINT) AS snae,
           |    CAST(sum(abs(actual)) AS BIGINT) AS sa
           |  FROM sc)
           |SELECT h, t, actual, forecast_micro, ae_micro, naive_ae_micro,
           |  sae // greatest(sa, 1) AS wape_ppm,
           |  (sae * 1000000) // greatest(snae, 1) AS mase_ppm
           |FROM sc, tot ORDER BY h""".stripMargin),
    "The theta fit folds over the TRAIN slice of the day rollup; the " +
      "holdout join touches 14 rows. WAPE/MASE are exact integer ratios — " +
      "the backtest verdict is bit-portable, and the fixed-origin split " +
      "means the model is never graded on days it saw.")

  /** q425 — A-stat/survey: Neyman optimal allocation of a 1000-row
    * sample across market segments by account-balance volatility —
    * big AND volatile strata get the samples; largest-remainder
    * apportionment sums exactly to budget. */
  val q425 = Declared(
    "q425_neyman_allocation", "A-stat",
    (s, dir) => graft.ops.Experimentation.neymanAllocation(
      Tables.customer(s, dir), col("c_mktsegment"),
      expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"),
      sampleN = 1000L),
    Some("""WITH m AS (
           |  SELECT c_mktsegment AS stratum, CAST(count(*) AS BIGINT)
           |      AS n_pop,
           |    CAST(sum(v) AS HUGEINT) AS s,
           |    sum(CAST(v AS HUGEINT) * v) AS ss
           |  FROM (SELECT c_mktsegment,
           |          CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
           |            AS BIGINT) AS v
           |        FROM customer)
           |  GROUP BY 1),
           |w AS (
           |  SELECT stratum, n_pop,
           |    CAST(floor(sqrt(CAST(n_pop * ss - s * s AS DOUBLE)) + 0.5)
           |      AS BIGINT) AS weight
           |  FROM m),
           |t AS (SELECT CAST(sum(weight) AS BIGINT) AS tw FROM w),
           |b AS (
           |  SELECT *, (weight * 1000000) // greatest(tw, 1) AS share_ppm,
           |    (1000 * weight) // greatest(tw, 1) AS base,
           |    (1000 * weight) % greatest(tw, 1) AS rem
           |  FROM w, t),
           |sh AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS short FROM b),
           |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, stratum)
           |        AS rk FROM b)
           |SELECT stratum, n_pop, weight, share_ppm,
           |  base + CASE WHEN rk <= short THEN 1 ELSE 0 END AS alloc_n
           |FROM r, sh ORDER BY stratum""".stripMargin),
    "One stratum-keyed moment agg; N·S = sqrt(N·Σx² − (Σx)²) needs no " +
      "division, so each weight is one correctly-rounded sqrt of an exact " +
      "integer. Largest-remainder apportionment makes Σn_h = n a theorem, " +
      "not a hope — the sampling plan for any bounded-budget eval of an " +
      "unbounded corpus.")

  /** q426 — E7: greedy maximum-coverage source selection — which 5
    * document sources jointly cover the most distinct vocabulary
    * (the (1−1/e) submodular greedy); the oracle replays every greedy
    * round recursively. */
  val q426 = Declared(
    "q426_max_coverage", "E7",
    (s, dir) => graft.ext.Curation.maxCoverageSources(
      Tables.documents(s, dir), "text", "source", k = 5, shingleSize = 3),
    Some("""WITH RECURSIVE tk AS (
           |  SELECT source AS src,
           |    regexp_split_to_array(lower(text), '\s+') AS toks
           |  FROM documents),
           |sg AS (
           |  SELECT src, toks, unnest(range(1, len(toks) - 2 + 1)) AS i
           |  FROM tk WHERE len(toks) >= 3),
           |aw AS MATERIALIZED (
           |  SELECT DISTINCT src,
           |    array_to_string(list_slice(toks, i, i + 2), ' ') AS w
           |  FROM sg WHERE length(array_to_string(
           |    list_slice(toks, i, i + 2), ' ')) > 0),
           |st(it, chosen, gains, cums) AS (
           |  SELECT 0, CAST([] AS VARCHAR[]), CAST([] AS BIGINT[]),
           |    CAST([] AS BIGINT[])
           |  UNION ALL
           |  SELECT it + 1, list_append(chosen, src),
           |    list_append(gains, gain),
           |    list_append(cums, coalesce(cums[len(cums)], 0) + gain)
           |  FROM (
           |    SELECT y.*, row_number() OVER (ORDER BY gain DESC, src)
           |      AS rn
           |    FROM (
           |      SELECT z.*
           |      FROM (
           |        SELECT st.it, st.chosen, st.gains, st.cums, a.src,
           |          count(*) OVER (PARTITION BY a.src) AS gain,
           |          row_number() OVER (PARTITION BY a.src ORDER BY a.w)
           |            AS rs
           |        FROM st, aw a
           |        WHERE st.it < 5 AND NOT list_contains(st.chosen, a.src)
           |          AND NOT EXISTS (SELECT 1 FROM aw b WHERE b.w = a.w
           |            AND list_contains(st.chosen, b.src))) z
           |      WHERE rs = 1) y) x
           |  WHERE rn = 1),
           |fin AS (SELECT * FROM st ORDER BY it DESC LIMIT 1)
           |SELECT CAST(i AS BIGINT) AS pick_order, chosen[i] AS source,
           |  gains[i] AS gain, cums[i] AS cumulative_coverage
           |FROM fin, unnest(range(1, len(chosen) + 1)) AS t(i)
           |ORDER BY pick_order""".stripMargin),
    "The (source, word) rollup is one fact pass; each greedy round is an " +
      "anti-join against covered words + a source-keyed agg + " +
      "TakeOrdered(1) — k rounds, one 2-field row to the driver each (the " +
      "k-center license). The licensing/crawl budget answer with the " +
      "classic (1−1/e) guarantee.")

  /** q427 — A-stat/anomaly: HBOS outlier scores over three order
    * features (spend, order day, customer bucket) — the linear,
    * deterministic density outlier detector; top 25. */
  val q427 = Declared(
    "q427_hbos_outliers", "A-stat",
    (s, dir) => graft.ops.Aggregates.hbosOutliers(
      Tables.orders(s, dir), col("o_orderkey"),
      Seq(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        expr("datediff(o_orderdate, DATE'1970-01-01')"),
        col("o_custkey") % 97),
      bins = 10, k = 25),
    Some("""WITH base AS (
           |  SELECT o_orderkey AS id,
           |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS f0,
           |    CAST(datediff('day', DATE '1970-01-01', o_orderdate)
           |      AS BIGINT) AS f1,
           |    o_custkey % 97 AS f2
           |  FROM orders),
           |u AS (
           |  SELECT id, f, v FROM (
           |    SELECT id, 0 AS f, f0 AS v FROM base
           |    UNION ALL SELECT id, 1, f1 FROM base
           |    UNION ALL SELECT id, 2, f2 FROM base)),
           |mm AS (SELECT f, min(v) AS mn, max(v) AS mx FROM u GROUP BY f),
           |b AS (
           |  SELECT id, u.f, ((v - mn) * 10) // (mx - mn + 1) AS bin
           |  FROM u JOIN mm ON u.f = mm.f),
           |hist AS (SELECT f, bin, CAST(count(*) AS BIGINT) AS c
           |         FROM b GROUP BY 1, 2),
           |mxc AS (SELECT f, max(c) AS maxc FROM hist GROUP BY f),
           |sc AS (
           |  SELECT hist.f, bin,
           |    CAST(floor(ln(CAST(maxc AS DOUBLE) / CAST(c AS DOUBLE))
           |      * 1e6 + 0.5) AS BIGINT) AS mnat
           |  FROM hist JOIN mxc ON hist.f = mxc.f)
           |SELECT id, CAST(sum(mnat) AS BIGINT) AS score_micro
           |FROM b JOIN sc ON b.f = sc.f AND b.bin = sc.bin
           |GROUP BY id ORDER BY score_micro DESC, id LIMIT 25""".stripMargin),
    "Per feature: ONE 10-bin histogram agg broadcast back onto the scan — " +
      "no distance joins, no RNG, O(rows·features). The anomaly " +
      "triage that runs BEFORE anyone pays for pairwise methods; " +
      "micro-nat scores keep the top-k bit-stable.")

  /** q428 — A-stat: Theil's uncertainty coefficient between order
    * priority and order status — the DIRECTIONAL categorical
    * association beside Cramér's V (q208): how much of one column do
    * you know once you know the other. */
  val q428 = Declared(
    "q428_uncertainty_coefficient", "A-stat",
    (s, dir) => graft.ops.Aggregates.uncertaintyCoefficient(
      Tables.orders(s, dir), col("o_orderpriority"), col("o_orderstatus")),
    Some("""WITH cells AS (
           |  SELECT o_orderpriority AS x, o_orderstatus AS y,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM orders GROUP BY 1, 2),
           |xm AS (SELECT x, CAST(sum(c) AS BIGINT) AS nx
           |       FROM cells GROUP BY 1),
           |ym AS (SELECT y, CAST(sum(c) AS BIGINT) AS ny
           |       FROM cells GROUP BY 1),
           |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
           |hx AS (
           |  SELECT CAST(sum(CAST(nx AS HUGEINT)
           |    * CAST(floor(ln(CAST(n AS DOUBLE) / CAST(nx AS DOUBLE))
           |      * 1e6 + 0.5) AS BIGINT)) // max(n) AS BIGINT)
           |    AS h_x_micro
           |  FROM xm, n),
           |hy AS (
           |  SELECT CAST(sum(CAST(ny AS HUGEINT)
           |    * CAST(floor(ln(CAST(n AS DOUBLE) / CAST(ny AS DOUBLE))
           |      * 1e6 + 0.5) AS BIGINT)) // max(n) AS BIGINT)
           |    AS h_y_micro
           |  FROM ym, n),
           |hxy AS (
           |  SELECT CAST(sum(CAST(c AS HUGEINT)
           |    * CAST(floor(ln(CAST(ny AS DOUBLE) / CAST(c AS DOUBLE))
           |      * 1e6 + 0.5) AS BIGINT)) // max(n) AS BIGINT)
           |    AS h_x_given_y_micro
           |  FROM cells JOIN ym USING (y), n),
           |hyx AS (
           |  SELECT CAST(sum(CAST(c AS HUGEINT)
           |    * CAST(floor(ln(CAST(nx AS DOUBLE) / CAST(c AS DOUBLE))
           |      * 1e6 + 0.5) AS BIGINT)) // max(n) AS BIGINT)
           |    AS h_y_given_x_micro
           |  FROM cells JOIN xm USING (x), n)
           |SELECT n, h_x_micro, h_x_given_y_micro,
           |  ((h_x_micro - h_x_given_y_micro) * 1000000)
           |    // greatest(h_x_micro, 1) AS u_x_given_y_ppm,
           |  h_y_micro, h_y_given_x_micro,
           |  ((h_y_micro - h_y_given_x_micro) * 1000000)
           |    // greatest(h_y_micro, 1) AS u_y_given_x_ppm
           |FROM n, hx, hxy, hy, hyx""".stripMargin),
    "One contingency agg with map-side combine; margins and entropies " +
      "run on the cell frame — libm once per cell/margin, micro-nat " +
      "quantized. The asymmetric feature-selection readout Cramér's V " +
      "can't give: near-zero both ways here means priority and status " +
      "carry independent information.")

  val all: Seq[Declared] =
    Seq(q402, q403, q404, q405, q406, q407, q408, q409, q410, q411,
      q412, q413, q414, q415, q416, q417, q418, q419, q420, q421, q422,
      q423, q424, q425, q426, q427, q428)
}
