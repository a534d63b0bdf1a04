package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.TextAnalysis
import graft.ops.{Aggregates, Associations, Features}

/** Round-4 (batches 18-20): the feature-engineering, corpus-shape &
  * distribution-free-ML layer — boilerplate spans, the co-occurrence
  * item graph, leakage-safe target encoding, class rebalancing, the
  * vocabulary-growth curve; rank statistics (Spearman, Kendall τ-b,
  * Cramér's V, odds ratio) and conformal intervals; log-rank survival
  * testing, declarative data contracts and power-iteration PCA. Same
  * exactness discipline as the other Analytics modules. */
object Analytics6 {

  private def centsSql(e: String) =
    s"CAST(CAST($e AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** q201 — E4: corpus boilerplate spans — word bigrams present in
    * ≥5% of documents, the repeated-span complement of whole-document
    * dedup. Integer-exact document frequencies. */
  val q201 = Declared(
    "q201_boilerplate", "E4",
    (s, dir) => TextAnalysis.boilerplateShingles(
        Tables.documents(s, dir), col("text"), col("doc_id"),
        shingleSize = 2, minDfPpm = 50000L)
      .orderBy(col("df").desc, col("shingle"))
      .limit(50),
    Some("""WITH t AS (
           |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
           |  FROM documents),
           |st AS (
           |  SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
           |  FROM t WHERE len(toks) >= 2),
           |sh AS (
           |  SELECT DISTINCT doc_id,
           |    array_to_string(list_slice(toks, i, i + 1), ' ') AS shingle
           |  FROM st),
           |d AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df
           |      FROM sh GROUP BY 1),
           |n AS (SELECT count(DISTINCT doc_id) AS nd FROM t)
           |SELECT shingle, df, 1000000 * df // nd AS df_ppm
           |FROM d, n
           |WHERE 1000000 * df // nd >= 50000
           |ORDER BY df DESC, shingle
           |LIMIT 50""".stripMargin),
    "The distinct (doc, shingle) explode map-side combines into a shingle-keyed " +
      "agg — n-gram-volume cost, like q65's TF-IDF pass. Spans flagged here get " +
      "regexp-stripped scan-side BEFORE dedup/quality, where they'd otherwise " +
      "glue unrelated documents into near-dup false positives.")

  /** q202 — E2+/graph: co-purchase projection — the supplier-agnostic
    * item-item graph from shared orders, weight = co-occurrence count.
    * Basket fan-out is bounded (≤7 line items per order), so the pair
    * explosion is linear in orders at any scale. */
  val q202 = Declared(
    "q202_copurchase", "E2+",
    (s, dir) => Associations.coOccurrence(Tables.lineitem(s, dir),
      col("l_orderkey"), col("l_partkey"), topK = 25),
    Some("""WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
           |           FROM lineitem),
           |p AS (
           |  SELECT a.it AS item_a, b2.it AS item_b,
           |    CAST(count(*) AS BIGINT) AS weight
           |  FROM b a JOIN b b2 ON a.bk = b2.bk AND a.it < b2.it
           |  GROUP BY 1, 2)
           |SELECT item_a, item_b, weight FROM p
           |ORDER BY weight DESC, item_a, item_b
           |LIMIT 25""".stripMargin),
    "distinct + basket-keyed self-join + pair agg with map-side combine; " +
      "TakeOrdered (per-partition heaps) serves the top-k. The item graph is " +
      "then q100/q184 PageRank input or q128 triangle input — graph " +
      "construction IS a bounded relational plan here, not a special engine.")

  /** q203 — A1/ML: leave-one-out target encoding of order priority
    * against order value — the leakage-safe categorical feature. Each
    * row's encoding excludes its own target: one IEEE division of
    * exact integers. */
  val q203 = Declared(
    "q203_target_encoding", "A1",
    (s, dir) => Features.targetEncodeLoo(
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            .as("price_c")),
        col("o_orderpriority"), col("price_c"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("loo_mean"))
      .orderBy(col("o_orderkey")),
    Some(s"""WITH b AS (
           |  SELECT o_orderkey, o_orderpriority,
           |    ${centsSql("o_totalprice")} AS y
           |  FROM orders),
           |st AS (
           |  SELECT o_orderpriority, CAST(sum(y) AS HUGEINT) AS s,
           |    count(*) AS n
           |  FROM b GROUP BY 1)
           |SELECT o_orderkey, b.o_orderpriority,
           |  CASE WHEN n > 1 THEN
           |    CAST(s - y AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS loo_mean
           |FROM b JOIN st ON b.o_orderpriority = st.o_orderpriority
           |ORDER BY o_orderkey""".stripMargin),
    "One |categories|-row agg broadcast back onto a single fact scan — no " +
      "window, no shuffle of the facts. The encoding regenerates bit-identically " +
      "on any layout, so train/serve skew from the FEATURE PIPELINE is zero.")

  /** q204 — ML/E6: majority-class cap audit — bound every order-status
    * class to ≤2× the minority count. The audit twin reports the
    * keep/drop plan; classBalanceCap materializes it (spec-pinned
    * deterministic under a total order). */
  val q204 = Declared(
    "q204_class_balance", "E6",
    (s, dir) => Features.classBalanceAudit(Tables.orders(s, dir),
        col("o_orderstatus"), ratio = 2)
      .orderBy(col("class")),
    Some("""WITH c AS (
           |  SELECT o_orderstatus AS class, CAST(count(*) AS BIGINT) AS n_before
           |  FROM orders GROUP BY 1),
           |m AS (SELECT min(n_before) AS mn FROM c)
           |SELECT class, n_before,
           |  least(n_before, mn * 2) AS n_kept,
           |  n_before - least(n_before, mn * 2) AS dropped
           |FROM c, m ORDER BY class""".stripMargin),
    "The audit is |classes| rows from one agg. The materializing twin keeps " +
      "each class's FIRST rows under a caller-supplied total order — " +
      "deterministic rebalancing, and rank<=cap plans as WindowGroupLimit " +
      "(per-partition heaps), so even the cap filter never sorts a full class.")

  /** q205 — E4: vocabulary growth curve — distinct BIGRAMS vs
    * documents ingested, at 25-doc checkpoints (bigrams, because the
    * synthetic unigram vocabulary saturates within one checkpoint —
    * the n-gram unit is the op's caller choice). Each n-gram counts at
    * its FIRST document (an associative min), so the curve costs one
    * agg pass + a checkpoint-rollup window. */
  val q205 = Declared(
    "q205_vocab_growth", "E4",
    (s, dir) => TextAnalysis.vocabGrowth(Tables.documents(s, dir),
        graft.ext.Dedup.wordShingles(col("text"), 2), col("doc_id"),
        every = 25L)
      .orderBy(col("docs_seen")),
    Some("""WITH t AS (
           |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
           |  FROM documents),
           |st AS (
           |  SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
           |  FROM t WHERE len(toks) >= 2),
           |g AS (
           |  SELECT doc_id,
           |    array_to_string(list_slice(toks, i, i + 1), ' ') AS tok
           |  FROM st),
           |f AS (
           |  SELECT tok, min(doc_id) AS fd FROM g WHERE tok <> ''
           |  GROUP BY 1),
           |cp AS (
           |  SELECT (fd // 25 + 1) * 25 AS cp,
           |    CAST(count(*) AS BIGINT) AS new_tokens
           |  FROM f GROUP BY 1),
           |n AS (SELECT count(DISTINCT doc_id) AS nd FROM t)
           |SELECT least(cp, nd) AS docs_seen, new_tokens,
           |  CAST(sum(new_tokens) OVER (ORDER BY cp) AS BIGINT) AS vocab
           |FROM cp, n
           |ORDER BY docs_seen""".stripMargin),
    "min(first-doc) is associative — any partitioning yields the same curve — " +
      "and the cumulative window runs over the CHECKPOINT rollup (corpus/50 " +
      "rows). Flattening growth is the 'more data stops buying vocabulary' " +
      "signal that sizes the tokenizer before a 100 TB training run.")

  /** q206 — A-stat: Spearman rank correlation of discount vs quantity
    * per return flag — Pearson on doubled midranks, tie-aware,
    * integer-exact until the one IEEE finish. */
  val q206 = Declared(
    "q206_spearman", "A-stat",
    (s, dir) => graft.ops.Aggregates.spearmanExact(Tables.lineitem(s, dir),
        Seq(col("l_returnflag")),
        (col("l_discount").cast("decimal(18,2)") * 100).cast("long"),
        col("l_quantity"))
      .orderBy(col("l_returnflag")),
    Some(s"""WITH b AS (
           |  SELECT l_returnflag AS f,
           |    ${centsSql("l_discount")} AS x,
           |    CAST(l_quantity AS BIGINT) AS y
           |  FROM lineitem),
           |rx AS (
           |  SELECT f, x,
           |    2 * COALESCE(CAST(sum(cnt) OVER (PARTITION BY f ORDER BY x
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           |      0) + cnt + 1 AS r
           |  FROM (SELECT f, x, count(*) AS cnt FROM b GROUP BY 1, 2)),
           |ry AS (
           |  SELECT f, y,
           |    2 * COALESCE(CAST(sum(cnt) OVER (PARTITION BY f ORDER BY y
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           |      0) + cnt + 1 AS r
           |  FROM (SELECT f, y, count(*) AS cnt FROM b GROUP BY 1, 2)),
           |j AS (
           |  SELECT b.f, rx.r AS u, ry.r AS v
           |  FROM b JOIN rx ON b.f = rx.f AND b.x = rx.x
           |         JOIN ry ON b.f = ry.f AND b.y = ry.y),
           |a AS (
           |  SELECT f, CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(u) AS HUGEINT) AS sx, CAST(sum(v) AS HUGEINT) AS sy,
           |    CAST(sum(CAST(u AS HUGEINT) * v) AS HUGEINT) AS sxy,
           |    CAST(sum(CAST(u AS HUGEINT) * u) AS HUGEINT) AS sxx,
           |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS syy
           |  FROM j GROUP BY 1),
           |g AS (
           |  SELECT f, n,
           |    CAST(n * sxy - sx * sy AS DOUBLE) AS cv,
           |    CAST(n * sxx - sx * sx AS DOUBLE) AS vx,
           |    CAST(n * syy - sy * sy AS DOUBLE) AS vy
           |  FROM a)
           |SELECT f AS l_returnflag, CAST(n AS BIGINT) AS n,
           |  CASE WHEN vx <> 0 AND vy <> 0
           |    THEN cv / (sqrt(vx) * sqrt(vy)) END AS rho
           |FROM g ORDER BY f""".stripMargin),
    "Ranks come from the (key, distinct-value) rollup — 11 discounts, 50 " +
      "quantities — broadcast back; the fact table is scanned once and the " +
      "co-moment agg map-side combines. Monotone association at 100 TB for " +
      "the cost of q82's Pearson.")

  /** q207 — A-stat: Kendall's τ-b per return flag — concordant /
    * discordant counts over the value-domain-bounded (x, y) cell
    * rollup, never row pairs. */
  val q207 = Declared(
    "q207_kendall", "A-stat",
    (s, dir) => graft.ops.Aggregates.kendallTau(Tables.lineitem(s, dir),
        Seq(col("l_returnflag")),
        (col("l_discount").cast("decimal(18,2)") * 100).cast("long"),
        col("l_quantity"))
      .orderBy(col("l_returnflag")),
    Some(s"""WITH b AS (
           |  SELECT l_returnflag AS f,
           |    ${centsSql("l_discount")} AS x,
           |    CAST(l_quantity AS BIGINT) AS y
           |  FROM lineitem),
           |cells AS (
           |  SELECT f, x, y, CAST(count(*) AS HUGEINT) AS c
           |  FROM b GROUP BY 1, 2, 3),
           |p AS (
           |  SELECT a.f,
           |    CAST(sum(CASE WHEN a.x <> b2.x AND a.y <> b2.y AND
           |      ((a.x < b2.x) = (a.y < b2.y)) THEN a.c * b2.c ELSE 0 END)
           |      AS HUGEINT) AS nc,
           |    CAST(sum(CASE WHEN a.x <> b2.x AND a.y <> b2.y AND
           |      ((a.x < b2.x) <> (a.y < b2.y)) THEN a.c * b2.c ELSE 0 END)
           |      AS HUGEINT) AS nd
           |  FROM cells a JOIN cells b2 ON a.f = b2.f AND
           |    (a.x < b2.x OR (a.x = b2.x AND a.y < b2.y))
           |  GROUP BY 1),
           |nn AS (SELECT f, CAST(count(*) AS HUGEINT) AS n FROM b GROUP BY 1),
           |tx AS (
           |  SELECT f, CAST(sum(c * (c - 1)) AS HUGEINT) AS txd FROM (
           |    SELECT f, x, CAST(count(*) AS HUGEINT) AS c FROM b GROUP BY 1, 2)
           |  GROUP BY 1),
           |ty AS (
           |  SELECT f, CAST(sum(c * (c - 1)) AS HUGEINT) AS tyd FROM (
           |    SELECT f, y, CAST(count(*) AS HUGEINT) AS c FROM b GROUP BY 1, 2)
           |  GROUP BY 1),
           |g AS (
           |  SELECT p.f, nn.n, p.nc, p.nd,
           |    sqrt(CAST(nn.n * (nn.n - 1) AS DOUBLE) - CAST(txd AS DOUBLE)) *
           |    sqrt(CAST(nn.n * (nn.n - 1) AS DOUBLE) - CAST(tyd AS DOUBLE))
           |      AS den
           |  FROM p JOIN nn ON p.f = nn.f JOIN tx ON p.f = tx.f
           |    JOIN ty ON p.f = ty.f)
           |SELECT f AS l_returnflag, CAST(n AS BIGINT) AS n,
           |  CAST(nc AS BIGINT) AS nc, CAST(nd AS BIGINT) AS nd,
           |  CASE WHEN den <> 0
           |    THEN 2.0 * CAST(nc - nd AS DOUBLE) / den END AS tau_b
           |FROM g ORDER BY f""".stripMargin),
    "The pair space is |cells|² per key with cells bounded by the VALUE domains " +
      "(11×50 here) — constant work per key at any row count, after one " +
      "cell-rollup pass. The rank statistic to reach for when even Spearman's " +
      "rank map is too wide.")

  /** q208 — A-stat: Cramér's V — the [0,1] effect size that q153's
    * χ² significance lacks, over return flag × line number. */
  val q208 = Declared(
    "q208_cramers_v", "A-stat",
    (s, dir) => graft.ops.Aggregates.cramersV(Tables.lineitem(s, dir),
      col("l_returnflag"), col("l_linenumber")),
    Some("""WITH obs AS (
           |  SELECT l_returnflag AS r, l_linenumber AS c, count(*) AS o
           |  FROM lineitem GROUP BY 1, 2),
           |rm AS (SELECT r, sum(o) AS rsum FROM obs GROUP BY r),
           |cm AS (SELECT c, sum(o) AS csum FROM obs GROUP BY c),
           |cells AS (
           |  SELECT rm.r, cm.c, coalesce(obs.o, 0) AS o
           |  FROM rm CROSS JOIN cm
           |  LEFT JOIN obs ON obs.r = rm.r AND obs.c = cm.c),
           |tot AS (SELECT CAST(sum(o) AS HUGEINT) AS nn,
           |               count(DISTINCT r) AS nr, count(DISTINCT c) AS ncc
           |        FROM obs),
           |t AS (
           |  SELECT CAST(round(
           |    CAST(CAST(o AS HUGEINT) * nn - CAST(rsum AS HUGEINT) * csum AS DOUBLE)
           |      * CAST(CAST(o AS HUGEINT) * nn - CAST(rsum AS HUGEINT) * csum AS DOUBLE)
           |      / CAST(CAST(rsum AS HUGEINT) * csum * nn AS DOUBLE)
           |      * 1e6, 0) AS BIGINT) AS term
           |  FROM cells JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN tot)
           |SELECT round(CAST(sum(term) AS DOUBLE) / 1e6, 6) AS chi2,
           |  (SELECT CAST((nr - 1) * (ncc - 1) AS BIGINT) FROM tot) AS dof,
           |  (SELECT CAST(nn AS BIGINT) FROM tot) AS n,
           |  (SELECT CAST(nr AS BIGINT) FROM tot) AS r_levels,
           |  (SELECT CAST(ncc AS BIGINT) FROM tot) AS c_levels,
           |  CASE WHEN (SELECT nn FROM tot) > 0
           |         AND (SELECT least(nr, ncc) FROM tot) > 1 THEN
           |    sqrt(round(CAST(sum(term) AS DOUBLE) / 1e6, 6) /
           |      (CAST((SELECT nn FROM tot) AS DOUBLE) *
           |       CAST((SELECT least(nr, ncc) FROM tot) - 1 AS DOUBLE)))
           |  END AS cramers_v
           |FROM t""".stripMargin),
    "Contingency-sized arithmetic on top of the q153 χ² pass — V normalizes by " +
      "n·min(r−1, c−1), so growing 100 TB of rows cannot inflate the effect the " +
      "way it inflates χ². Screen associations by V, then test by χ².")

  /** q209 — A-stat: 2×2 odds ratio — deep-discount exposure vs return
    * outcome, exact-ppm integer quotient + the IEEE double of the same
    * operands. */
  val q209 = Declared(
    "q209_odds_ratio", "A-stat",
    (s, dir) => graft.ops.Aggregates.oddsRatio(Tables.lineitem(s, dir),
      (col("l_discount").cast("decimal(18,2)") * 100).cast("long") >= 5L,
      col("l_returnflag") === "R"),
    Some("""WITH b AS (
           |  SELECT
           |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) >= 5
           |      AS e,
           |    l_returnflag = 'R' AS o
           |  FROM lineitem),
           |a AS (
           |  SELECT
           |    CAST(sum(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT) AS n_ee,
           |    CAST(sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
           |    CAST(sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END) AS BIGINT) AS n_ne,
           |    CAST(sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS n_nn
           |  FROM b)
           |SELECT n_ee, n_en, n_ne, n_nn,
           |  CASE WHEN n_en > 0 AND n_ne > 0 THEN CAST(
           |    (CAST(1000000 AS HUGEINT) * n_ee * n_nn) //
           |    (CAST(n_en AS HUGEINT) * n_ne) AS BIGINT) END AS or_ppm,
           |  CASE WHEN n_en > 0 AND n_ne > 0 THEN
           |    CAST(CAST(n_ee AS HUGEINT) * n_nn AS DOUBLE) /
           |    CAST(CAST(n_en AS HUGEINT) * n_ne AS DOUBLE) END AS odds_ratio,
           |  CASE WHEN n_ne + n_nn > 0 AND n_ee + n_en > 0 AND n_ne > 0 THEN
           |    CAST((CAST(1000000 AS HUGEINT) * n_ee * (n_ne + n_nn)) //
           |    (CAST(n_ne AS HUGEINT) * (n_ee + n_en)) AS BIGINT) END AS rr_ppm
           |FROM a""".stripMargin),
    "One agg pass, four exact cells — the effect measure for binary gates " +
      "(did the discount CAUSE the return?) that composes with q153/q208 for " +
      "significance and strength.")

  /** q210 — ML: split-conformal prediction intervals per order
    * priority with the empirical-coverage audit — the distribution-
    * free ±qhat band whose ≥90% coverage holds by exchangeability no
    * matter how crude the category-mean predictor is. Exact rank
    * statistic, integer residuals. */
  val q210 = Declared(
    "q210_conformal", "A-stat",
    (s, dir) => Features.conformalInterval(
        Tables.orders(s, dir),
        col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
        col("o_orderkey") % 2 === 0, alphaNum = 1L, alphaDen = 10L)
      .orderBy(col("category")),
    Some(s"""WITH b AS (
           |  SELECT o_orderpriority AS cat,
           |    ${centsSql("o_totalprice")} AS y,
           |    o_orderkey % 2 = 0 AS cal
           |  FROM orders),
           |st AS (
           |  SELECT cat, CAST(sum(y) AS HUGEINT) AS s, count(*) AS n_cal
           |  FROM b WHERE cal GROUP BY 1),
           |pr AS (SELECT cat, n_cal, CAST(s // n_cal AS BIGINT) AS pred_c
           |       FROM st),
           |r AS (
           |  SELECT b.cat, b.cal, b.y, pr.n_cal, pr.pred_c,
           |    abs(b.y - pr.pred_c) AS resid
           |  FROM b JOIN pr ON b.cat = pr.cat),
           |ranked AS (
           |  SELECT cat, resid,
           |    row_number() OVER (PARTITION BY cat
           |      ORDER BY resid ASC, y ASC) AS rn,
           |    least(n_cal, ((n_cal + 1) * 9 + 9) // 10) AS k
           |  FROM r WHERE cal),
           |q AS (SELECT cat, resid AS qhat FROM ranked WHERE rn = k)
           |SELECT r.cat AS category, max(r.n_cal) AS n_cal,
           |  CAST(count(*) AS BIGINT) AS n_test,
           |  max(r.pred_c) AS pred_c, max(q.qhat) AS qhat,
           |  1000000 * CAST(sum(CASE WHEN r.resid <= q.qhat THEN 1 ELSE 0 END)
           |    AS BIGINT) // CAST(count(*) AS BIGINT) AS cover_ppm
           |FROM r JOIN q ON r.cat = q.cat
           |WHERE NOT r.cal
           |GROUP BY r.cat
           |ORDER BY category""".stripMargin),
    "One category agg broadcast back, one category-keyed rank window over the " +
      "calibration half, one test agg — error bars on a 100 TB prediction table " +
      "for two scans. cover_ppm ≈ 900000 certifies the guarantee empirically.")

  /** q211 — A-stat: two-group log-rank test — do even- and odd-id user
    * cohorts hit their first error on different schedules? Durations
    * are minutes from first activity to first 'error' (censored at
    * last activity); the hypothesis test paired with q163's
    * Kaplan–Meier curve, micro-quantized O−E terms over the
    * distinct-duration rollup. */
  val q211 = Declared(
    "q211_logrank", "A-stat",
    (s, dir) => {
      val per = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(min(col("ts")).as("t0"),
          min(when(col("event_type") === "error", col("ts"))).as("te"),
          max(col("ts")).as("tl"))
      val subj = per.select(expr("cast(user_id % 2 as string)").as("grp"),
        expr("(unix_micros(coalesce(te, tl)) - unix_micros(t0))" +
          " div 60000000").as("dur"),
        col("te").isNotNull.cast("int").as("churned"))
      graft.ops.EventAnalytics.logRank(subj, col("dur"), col("churned"),
        col("grp"), "0")
    },
    Some("""WITH per AS (
           |  SELECT user_id, min(ts) AS t0,
           |    min(CASE WHEN event_type = 'error' THEN ts END) AS te,
           |    max(ts) AS tl
           |  FROM events GROUP BY 1),
           |subj AS (
           |  SELECT user_id % 2 AS grp,
           |    (epoch_us(coalesce(te, tl)) - epoch_us(t0)) // 60000000 AS t,
           |    CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END AS e
           |  FROM per),
           |roll AS (
           |  SELECT t, count(*) AS c,
           |    sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS ca,
           |    CAST(sum(e) AS BIGINT) AS d,
           |    CAST(sum(e * CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS da
           |  FROM subj GROUP BY 1),
           |at AS (
           |  SELECT t, d, da,
           |    CAST(sum(c) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
           |      UNBOUNDED FOLLOWING) AS BIGINT) AS n,
           |    CAST(sum(ca) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
           |      UNBOUNDED FOLLOWING) AS BIGINT) AS n1
           |  FROM roll),
           |terms AS (
           |  SELECT da,
           |    CAST(round(CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) /
           |      CAST(n AS DOUBLE) * 1000000.0, 0) AS BIGINT) AS e1u,
           |    CASE WHEN n > 1 THEN CAST(round(
           |      CAST(CAST(d AS HUGEINT) * n1 * (n - n1) * (n - d) AS DOUBLE) /
           |      CAST(CAST(n AS HUGEINT) * n * (n - 1) AS DOUBLE)
           |      * 1000000.0, 0) AS BIGINT) ELSE 0 END AS vu
           |  FROM at WHERE d > 0),
           |counts AS (
           |  SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_a,
           |    CAST(count(*) - sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_b
           |  FROM subj)
           |SELECT n_a, n_b,
           |  CAST(sum(da) AS BIGINT) AS o1,
           |  CAST(sum(e1u) AS BIGINT) AS e1_u,
           |  CAST(sum(vu) AS BIGINT) AS v_u,
           |  CASE WHEN sum(vu) > 0 THEN
           |    (CAST(sum(da) AS DOUBLE) * 1000000.0 - CAST(sum(e1u) AS DOUBLE)) *
           |    (CAST(sum(da) AS DOUBLE) * 1000000.0 - CAST(sum(e1u) AS DOUBLE)) /
           |    (1000000.0 * CAST(sum(vu) AS DOUBLE))
           |  END AS chi2
           |FROM terms, counts
           |GROUP BY n_a, n_b""".stripMargin),
    "At-risk counts are suffix sums over the distinct-duration rollup — the " +
      "q163 envelope; subjects are touched once. With parity cohorts the null " +
      "is true by construction, so chi2 ~ small — the A/B churn test whose " +
      "significance machinery costs one rollup window at any fleet size.")

  /** q212 — C11+/E6: declarative data contract — five rules over
    * lineitem evaluated in ONE agg pass; `qty_le_30` is planted to
    * fail so the report proves violations are counted, not assumed. */
  val q212 = Declared(
    "q212_data_contract", "C11+,E6",
    (s, dir) => graft.ops.Expectations.validate(Tables.lineitem(s, dir), Seq(
        graft.ops.Expectations.Rule("qty_range",
          "l_quantity BETWEEN 1 AND 50"),
        graft.ops.Expectations.Rule("disc_range",
          "l_discount BETWEEN 0 AND 0.1"),
        graft.ops.Expectations.Rule("price_positive", "l_extendedprice > 0"),
        graft.ops.Expectations.Rule("ship_not_null", "l_shipdate IS NOT NULL"),
        graft.ops.Expectations.Rule("qty_le_30", "l_quantity <= 30")))
      .orderBy(col("rule")),
    Some("""WITH n AS (SELECT count(*) AS n_rows FROM lineitem),
           |v AS (
           |  SELECT
           |    CAST(count(*) FILTER (WHERE NOT coalesce(
           |      l_quantity BETWEEN 1 AND 50, false)) AS BIGINT) AS qty_range,
           |    CAST(count(*) FILTER (WHERE NOT coalesce(
           |      l_discount BETWEEN 0 AND 0.1, false)) AS BIGINT) AS disc_range,
           |    CAST(count(*) FILTER (WHERE NOT coalesce(
           |      l_extendedprice > 0, false)) AS BIGINT) AS price_positive,
           |    CAST(count(*) FILTER (WHERE l_shipdate IS NULL) AS BIGINT)
           |      AS ship_not_null,
           |    CAST(count(*) FILTER (WHERE NOT coalesce(
           |      l_quantity <= 30, false)) AS BIGINT) AS qty_le_30
           |  FROM lineitem),
           |rows_out AS (
           |  SELECT 'qty_range' AS rule, qty_range AS n_violations FROM v
           |  UNION ALL SELECT 'disc_range', disc_range FROM v
           |  UNION ALL SELECT 'price_positive', price_positive FROM v
           |  UNION ALL SELECT 'ship_not_null', ship_not_null FROM v
           |  UNION ALL SELECT 'qty_le_30', qty_le_30 FROM v)
           |SELECT rule, CAST(n_rows AS BIGINT) AS n_rows, n_violations,
           |  CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT) AS pass
           |FROM rows_out, n
           |ORDER BY rule""".stripMargin),
    "All rules share one scan + one conditional-sum agg (map-side combined): " +
      "adding a rule costs a column, never a pass. The |rules|-row report is " +
      "what the pipeline routes on — quarantine/alert/proceed — which is how a " +
      "contract survives 100 TB: no exception-per-row, no second scan.")

  /** q213 — E3+/A1: first principal component by integer power
    * iteration over the exact 16-dim correlation matrix — micro-unit
    * matrix-vector products and a max-norm integer rescale, replayed
    * round-for-round by the unrolled-CTE oracle. */
  val q213 = Declared(
    "q213_power_iteration", "E3+,A1",
    (s, dir) => graft.ext.Clustering.powerIterationInt(
        graft.ext.Clustering.correlationMatrix(
          Tables.embeddings(s, dir), "embedding", dims = 16),
        dims = 16, rounds = 8)
      .orderBy(col("j")),
    Some {
      def round(k: Int): String =
        s"""w$k AS (
           |  SELECT f.j, CAST(sum(CAST(f.c AS HUGEINT) * r${k - 1}.v)
           |    AS HUGEINT) AS w
           |  FROM fm f JOIN r${k - 1} ON f.i = r${k - 1}.j GROUP BY f.j),
           |m$k AS (SELECT max(abs(w)) AS mx FROM w$k),
           |r$k AS (
           |  SELECT j, CAST((w * 1000000) // mx AS BIGINT) AS v
           |  FROM w$k, m$k)""".stripMargin
      s"""WITH q AS (
         |  SELECT list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS qv
         |  FROM embeddings),
         |p AS (
         |  SELECT ii.i, jj.j, qv[ii.i + 1] AS x, qv[jj.j + 1] AS y
         |  FROM q,
         |    (SELECT unnest(range(0, 16)) AS i) ii,
         |    (SELECT unnest(range(0, 16)) AS j) jj
         |  WHERE jj.j >= ii.i),
         |s AS (
         |  SELECT i, j, count(*) AS n,
         |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
         |  FROM p GROUP BY 1, 2),
         |m AS (
         |  SELECT i, j, CAST(n AS HUGEINT) * sxy - sx * sy AS spp
         |  FROM s),
         |vv AS (SELECT i AS k, CAST(spp AS DOUBLE) AS sppk FROM m WHERE i = j),
         |cm AS (
         |  SELECT m.i, m.j,
         |    CAST(round(CASE WHEN vi.sppk > 0 AND vj.sppk > 0
         |      THEN CAST(m.spp AS DOUBLE) / (sqrt(vi.sppk) * sqrt(vj.sppk))
         |      END * 1000000, 0) AS BIGINT) AS c
         |  FROM m JOIN vv vi ON m.i = vi.k JOIN vv vj ON m.j = vj.k),
         |fm AS (
         |  SELECT i, j, c FROM cm
         |  UNION ALL
         |  SELECT j AS i, i AS j, c FROM cm WHERE i <> j),
         |r0 AS (SELECT unnest(range(0, 16)) AS j,
         |       CAST(1000000 AS BIGINT) AS v),
         |${(1 to 8).map(round).mkString(",\n")}
         |SELECT CAST(r8.j AS BIGINT) AS j, r8.v AS v_u,
         |  (SELECT CAST(mx // 1000000 AS BIGINT) FROM m8) AS lambda_u
         |FROM r8 ORDER BY j""".stripMargin
    },
    "The only corpus-sized pass is the co-moment scan (q167); iteration runs " +
      "on the dims^2 broadcast frame — 8 rounds of a 256-row join+agg, no " +
      "driver solve. Integer state makes each round bit-identical under any " +
      "partitioning, which is what lets a second engine replay all 8 rounds.")

  /** q214 — ML: best decision-stump split — which quantity threshold
    * best separates returned from accepted line items, by weighted
    * Gini over the distinct-value rollup with a deterministic
    * argmin. */
  val q214 = Declared(
    "q214_gini_split", "A-stat",
    (s, dir) => Features.giniSplit(Tables.lineitem(s, dir),
      col("l_quantity"), (col("l_returnflag") === "R").cast("int")),
    Some("""WITH roll AS (
           |  SELECT CAST(l_quantity AS BIGINT) AS v, count(*) AS c,
           |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS p
           |  FROM lineitem GROUP BY 1),
           |pre AS (
           |  SELECT v,
           |    CAST(sum(c) OVER (ORDER BY v) AS HUGEINT) AS nl,
           |    CAST(sum(p) OVER (ORDER BY v) AS HUGEINT) AS pl,
           |    CAST(sum(c) OVER () AS HUGEINT) AS n,
           |    CAST(sum(p) OVER () AS HUGEINT) AS ptot
           |  FROM roll),
           |scored AS (
           |  SELECT v, n,
           |    CAST(round((
           |      CAST(nl * nl - pl * pl - (nl - pl) * (nl - pl) AS DOUBLE) /
           |        CAST(nl AS DOUBLE) +
           |      CAST((n - nl) * (n - nl) - (ptot - pl) * (ptot - pl) -
           |        ((n - nl) - (ptot - pl)) * ((n - nl) - (ptot - pl))
           |        AS DOUBLE) / CAST(n - nl AS DOUBLE)
           |      ) / CAST(n AS DOUBLE) * 1e6, 0) AS BIGINT) AS wg_u,
           |    CAST(round(
           |      CAST(n * n - ptot * ptot - (n - ptot) * (n - ptot) AS DOUBLE) /
           |      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 1e6, 0) AS BIGINT)
           |      AS baseline_u
           |  FROM pre WHERE n - nl > 0)
           |SELECT v AS split_value, CAST(n AS BIGINT) AS n, baseline_u, wg_u,
           |  baseline_u - wg_u AS gain_u
           |FROM scored
           |ORDER BY wg_u ASC, v ASC LIMIT 1""".stripMargin),
    "Candidates are the DISTINCT feature values (50 here), scored from prefix " +
      "sums over that rollup — never the fact table. A full tree is this op " +
      "recursed over node partitions; at 100 TB the rollup agg is the only " +
      "data-sized pass per node.")

  /** q215 — A-stat: sample-ratio mismatch — is the orderkey mod-7
    * bucketing uniform? EXACT rational chi-square (cleared of
    * fractions, zero quantization) — the pre-analysis gate of every
    * A/B test. */
  val q215 = Declared(
    "q215_srm", "A-stat",
    (s, dir) => Aggregates.srmCheck(Tables.orders(s, dir),
      pmod(col("o_orderkey"), lit(7)), k = 7),
    Some("""WITH counts AS (
           |  SELECT o_orderkey % 7 AS b, count(*) AS o
           |  FROM orders GROUP BY 1),
           |dense AS (
           |  SELECT k.b, COALESCE(counts.o, 0) AS o
           |  FROM (SELECT unnest(range(0, 7)) AS b) k
           |  LEFT JOIN counts ON k.b = counts.b),
           |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM dense),
           |dev AS (
           |  SELECT CAST(o AS HUGEINT) * 7 - n AS d, n
           |  FROM dense CROSS JOIN tot)
           |SELECT CAST(7 AS BIGINT) AS k, CAST(max(n) AS BIGINT) AS n,
           |  CAST(sum(d * d) AS DOUBLE) /
           |    CAST(7 * CAST(max(n) AS HUGEINT) AS DOUBLE) AS chi2,
           |  CAST(max(1000000 * abs(d) // CAST(n AS HUGEINT)) AS BIGINT)
           |    AS max_dev_ppm
           |FROM dev""".stripMargin),
    "One bucket agg (k rows) + a k-row finish. chi2 >> k-1 on an assignment " +
      "column means the randomizer is broken and every downstream metric is " +
      "biased — the cheapest test in the suite guards the most expensive " +
      "mistakes.")

  /** q216 — A-stat: Cohen's d standardized effect size — how big is
    * the quantity gap between returned and accepted line items, in
    * pooled standard deviations (the companion to q186's 'how
    * sure'). */
  val q216 = Declared(
    "q216_cohens_d", "A-stat",
    (s, dir) => Aggregates.cohensD(Tables.lineitem(s, dir),
      col("l_quantity"), col("l_returnflag"), "A", "R"),
    Some("""WITH g AS (
           |  SELECT l_returnflag AS f,
           |    CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS s,
           |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
           |      AS HUGEINT) AS q
           |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
           |w AS (
           |  SELECT a.n AS na, b.n AS nb,
           |    CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS ma,
           |    CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS mb,
           |    CAST(a.n * a.q - a.s * a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
           |      AS ssa,
           |    CAST(b.n * b.q - b.s * b.s AS DOUBLE) / CAST(b.n AS DOUBLE)
           |      AS ssb
           |  FROM (SELECT * FROM g WHERE f = 'A') a,
           |       (SELECT * FROM g WHERE f = 'R') b)
           |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           |  ma AS mean_a, mb AS mean_b,
           |  CASE WHEN na + nb > 2 THEN
           |    (ma - mb) / sqrt((ssa + ssb) / CAST(na + nb - 2 AS DOUBLE))
           |  END AS cohens_d
           |FROM w""".stripMargin),
    "Same 3-exact-sums-per-group state as q186 — the two statistics share one " +
      "agg pass when run together. Report d WITH the t-stat: at 100 TB " +
      "everything is 'significant'; d says whether it matters.")

  val all: Seq[Declared] = Seq(q201, q202, q203, q204, q205,
    q206, q207, q208, q209, q210, q211, q212, q213, q214, q215, q216)
}
