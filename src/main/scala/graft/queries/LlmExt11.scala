package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Dedup

/** Round-7 batch: EXHAUSTIVE substring-level dedup (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better") — the
  * exact k-token-gram layer under the sampled winnowing fingerprints:
  * forensic duplicate-pair evidence and the per-document duplication
  * mass (memorization-risk) readout. */
object LlmExt11 {

  /** q444 — E2: exhaustive 12-token-gram duplicate pairs over the
    * documents table — every pair sharing ≥3 distinct grams, with
    * boilerplate grams (doc-freq > 10) dropped before the pair join
    * (the Lee-et-al common-substring cap that keeps the fan-out
    * bounded). */
  val q444 = Declared(
    "q444_substring_dup_pairs", "E2",
    (s, dir) => Dedup.substringDupPairs(Tables.documents(s, dir),
        "text", "doc_id", k = 12, minShared = 3, maxDocFreq = 10)
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH d AS (
           |  SELECT doc_id AS id,
           |    list_filter(regexp_split_to_array(lower(text), '\s+'),
           |      t -> t != '') AS toks
           |  FROM documents),
           |g0 AS (
           |  SELECT id, unnest(list_distinct(
           |    [array_to_string(toks[i:i+11], ' ')
           |     for i in range(1, len(toks) - 10)])) AS g
           |  FROM d WHERE len(toks) >= 12),
           |df AS (
           |  SELECT g FROM g0 GROUP BY g
           |  HAVING count(DISTINCT id) BETWEEN 2 AND 10)
           |SELECT a.id AS id_a, b.id AS id_b,
           |  CAST(count(DISTINCT a.g) AS BIGINT) AS shared_grams
           |FROM g0 a JOIN df USING (g) JOIN g0 b USING (g)
           |WHERE a.id < b.id
           |GROUP BY 1, 2 HAVING count(DISTINCT a.g) >= 3
           |ORDER BY 1, 2""".stripMargin),
    "Token explode is corpus-linear; the gram rollup keys on uniform " +
      "content strings (hash them at raw 100 TB — same plan shape); the " +
      "doc-freq cap bounds the self-join fan-out at maxDocFreq² rows per " +
      "gram, so boilerplate can never go quadratic. Winnowing samples; " +
      "this is the exact evidence pass over its candidate closure.")

  /** q445 — E2/E4: per-document duplication mass — share of each doc's
    * distinct 12-grams appearing in at least one other doc, in ppm.
    * Lee et al.'s memorization-risk readout; no pair join, so this
    * variant runs at raw corpus scale. */
  val q445 = Declared(
    "q445_substring_dup_mass", "E2,E4",
    (s, dir) => Dedup.substringDupMass(Tables.documents(s, dir),
        "text", "doc_id", k = 12)
      .orderBy(col("id")),
    Some("""WITH d AS (
           |  SELECT doc_id AS id,
           |    list_filter(regexp_split_to_array(lower(text), '\s+'),
           |      t -> t != '') AS toks
           |  FROM documents),
           |g0 AS (
           |  SELECT id, unnest(list_distinct(
           |    [array_to_string(toks[i:i+11], ' ')
           |     for i in range(1, len(toks) - 10)])) AS g
           |  FROM d WHERE len(toks) >= 12),
           |df AS (SELECT g, count(DISTINCT id) AS dfreq FROM g0 GROUP BY g)
           |SELECT id, CAST(count(*) AS BIGINT) AS n_grams,
           |  CAST(sum(CASE WHEN dfreq >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS dup_grams,
           |  (CAST(sum(CASE WHEN dfreq >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |    * 1000000) // count(*) AS dup_ppm
           |FROM g0 JOIN df USING (g)
           |GROUP BY id ORDER BY id""".stripMargin),
    "One gram rollup + one doc-keyed agg — no pair join anywhere, so the " +
      "risk readout runs at raw corpus scale with content-uniform shuffle " +
      "keys and map-side combine.")

  /** q447 — ML/J2: deterministic DBSCAN over the supplier-derived
    * sensor lattice — density clusters with no k, core/border/noise
    * roles, clusters labelled by min core id. Integer coordinates keep
    * the eps² boundary test exact on both engines; the oracle replays
    * the core graph's transitive closure recursively. */
  val q447 = Declared(
    "q447_dbscan", "ML,J2",
    (s, dir) => graft.ext.Clustering.dbscan(
        Tables.supplier(s, dir).select(
          col("s_suppkey").as("id"),
          expr("CAST((s_suppkey * 37) % 100 AS DOUBLE)").as("x"),
          expr("CAST((s_suppkey * 73) % 100 AS DOUBLE)").as("y")),
        "id", "x", "y", eps = 8.0, minPts = 4)
      .orderBy(col("id")),
    Some("""WITH RECURSIVE s AS (
           |  SELECT s_suppkey AS id,
           |    CAST((s_suppkey * 37) % 100 AS DOUBLE) AS x,
           |    CAST((s_suppkey * 73) % 100 AS DOUBLE) AS y
           |  FROM supplier),
           |p AS (
           |  SELECT a.id AS id, b.id AS nbr FROM s a JOIN s b
           |  ON (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 64),
           |core AS (SELECT id FROM p GROUP BY id HAVING count(*) >= 4),
           |e AS (
           |  SELECT p.id AS a, p.nbr AS b FROM p
           |  JOIN core c1 ON p.id = c1.id JOIN core c2 ON p.nbr = c2.id),
           |reach AS (
           |  SELECT a AS node, a AS comp FROM e
           |  UNION
           |  SELECT e.a, reach.comp FROM e JOIN reach ON reach.node = e.b),
           |comp AS (SELECT node, min(comp) AS component FROM reach GROUP BY node),
           |border AS (
           |  SELECT p.id, min(comp.component) AS cluster
           |  FROM p JOIN core cn ON p.nbr = cn.id
           |  JOIN comp ON comp.node = p.nbr
           |  WHERE p.id NOT IN (SELECT id FROM core)
           |  GROUP BY p.id)
           |SELECT s.id,
           |  CASE WHEN comp.component IS NOT NULL THEN 'core'
           |       WHEN border.cluster IS NOT NULL THEN 'border'
           |       ELSE 'noise' END AS role,
           |  coalesce(comp.component, border.cluster) AS cluster
           |FROM s LEFT JOIN comp ON comp.node = s.id
           |  LEFT JOIN border ON border.id = s.id
           |ORDER BY s.id""".stripMargin),
    "The eps-neighborhood is the grid-bucket equi-join (cell = eps, 3x3 " +
      "buckets, exact distance refinement) — never a point-cross-point " +
      "cartesian; clusters are O(log diameter) CC rounds over the core " +
      "graph; border/noise roles are node-keyed joins. Density skew " +
      "lands on space-uniform cell keys with AQE skew-split behind it.")

  private val scoreSql =
    "((l_orderkey * 7919 + l_linenumber) % 1000001)"
  private val labelSql =
    s"((l_orderkey * 13 + l_partkey) % 100) * 10000 < $scoreSql"

  /** q448 — eval: reliability diagram (10 equal-width bins) of a
    * deterministic ppm score whose label probability tracks the score
    * — per-bin confidence vs accuracy, all integer. */
  val q448 = Declared(
    "q448_reliability_diagram", "eval",
    (s, dir) => graft.ops.Evaluation.reliabilityDiagram(
        Tables.lineitem(s, dir),
        expr(scoreSql), expr(labelSql), nBins = 10)
      .orderBy(col("bin")),
    Some(s"""WITH b0 AS (
           |  SELECT $scoreSql AS s,
           |    CASE WHEN $labelSql THEN 1 ELSE 0 END AS y
           |  FROM lineitem),
           |g AS (
           |  SELECT least((s * 10) // 1000000, 9) AS bin,
           |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos,
           |    CAST(sum(s) AS HUGEINT) AS ssum
           |  FROM b0 GROUP BY 1)
           |SELECT bin, n, pos, CAST(ssum // n AS BIGINT) AS conf_ppm,
           |  (pos * 1000000) // n AS acc_ppm,
           |  CAST(abs(pos * 1000000 - ssum) AS BIGINT) AS gap_mass
           |FROM g ORDER BY bin""".stripMargin),
    "One bin-keyed agg with map-side combine; nBins rows out. Binning is " +
      "pure integer arithmetic (score·nBins div 1e6) — no float boundary " +
      "can disagree between engines.")

  /** q449 — eval: expected calibration error in ppm — one exact
    * integer division over the q448 bins' gap mass. */
  val q449 = Declared(
    "q449_ece", "eval",
    (s, dir) => graft.ops.Evaluation.reliabilityDiagram(
        Tables.lineitem(s, dir),
        expr(scoreSql), expr(labelSql), nBins = 10)
      .agg(sum(col("n")).as("n"),
        expr("sum(gap_mass) div sum(n)").as("ece_ppm")),
    Some(s"""WITH b0 AS (
           |  SELECT $scoreSql AS s,
           |    CASE WHEN $labelSql THEN 1 ELSE 0 END AS y
           |  FROM lineitem),
           |g AS (
           |  SELECT least((s * 10) // 1000000, 9) AS bin,
           |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos,
           |    CAST(sum(s) AS HUGEINT) AS ssum
           |  FROM b0 GROUP BY 1)
           |SELECT CAST(sum(n) AS BIGINT) AS n,
           |  CAST(sum(abs(pos * 1000000 - ssum)) // sum(n) AS BIGINT)
           |    AS ece_ppm
           |FROM g""".stripMargin),
    "ECE = sum of per-bin |accuracy - confidence| mass over N, computed " +
      "as ONE integer division over exact integer bin masses — the " +
      "calibration number that decides whether a quality scorer's " +
      "probabilities can gate data at face value.")

  /** q450 — eval/fairness: group fairness audit of a price-threshold
    * classifier against order status, grouped by priority — selection
    * rate, TPR, FPR and the demographic-parity gap per group, each an
    * exact ppm integer. */
  val q450 = Declared(
    "q450_fairness_audit", "eval",
    (s, dir) => graft.ops.Evaluation.fairnessAudit(
        Tables.orders(s, dir), col("o_orderpriority"),
        col("o_orderstatus") === "F",
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) > 15000000"))
      .orderBy(col("group")),
    Some("""WITH b AS (
           |  SELECT o_orderpriority AS grp,
           |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
           |    CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT) > 15000000 THEN 1 ELSE 0 END AS p
           |  FROM orders),
           |o AS (SELECT CAST(sum(p) AS BIGINT) * 1000000 AS allsel,
           |        CAST(count(*) AS BIGINT) AS alln FROM b),
           |g AS (
           |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(p) AS BIGINT) AS sel, CAST(sum(y) AS BIGINT) AS pos,
           |    CAST(sum(y * p) AS BIGINT) AS tp,
           |    CAST(sum((1 - y) * p) AS BIGINT) AS fp
           |  FROM b GROUP BY 1)
           |SELECT grp AS "group", n, (sel * 1000000) // n AS sel_ppm,
           |  CASE WHEN pos > 0 THEN (tp * 1000000) // pos END AS tpr_ppm,
           |  CASE WHEN n - pos > 0 THEN (fp * 1000000) // (n - pos) END
           |    AS fpr_ppm,
           |  (sel * 1000000) // n - allsel // alln AS sel_gap_ppm
           |FROM g, o ORDER BY 1""".stripMargin),
    "One group-keyed agg + a 1-row overall broadcast; reference-free " +
      "gaps mean adding a group never changes another group's row. The " +
      "equity readout run on every curated training slice.")

  /** q451 — eval: split-conformal calibration of a naive unit-price
    * model — the ⌈(n+1)(1−α)⌉-th calibration residual (α = 0.1) and
    * the eval slice's observed coverage of |y−ŷ| ≤ q̂, exact integers
    * end to end with the order statistic ranked distributed. */
  val q451 = Declared(
    "q451_split_conformal", "eval,W2",
    (s, dir) => graft.ops.Evaluation.splitConformal(
        Tables.lineitem(s, dir),
        residualCol = expr("abs(CAST(CAST(l_extendedprice AS DECIMAL(18,2))" +
          " * 100 AS BIGINT) - CAST(l_quantity AS BIGINT) * 100000)"),
        tieCol = expr("l_orderkey * 10 + l_linenumber"),
        isCalib = expr("(l_orderkey * 31 + l_linenumber) % 2 = 0"),
        alphaNum = 10, alphaDen = 100),
    Some("""WITH b AS (
           |  SELECT abs(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT) - CAST(l_quantity AS BIGINT) * 100000) AS r,
           |    l_orderkey * 10 + l_linenumber AS tie,
           |    ((l_orderkey * 31 + l_linenumber) % 2 = 0) AS c
           |  FROM lineitem),
           |nc AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM b WHERE c),
           |rk AS (SELECT r, row_number() OVER (ORDER BY r, tie) AS rn
           |       FROM b WHERE c),
           |q AS (SELECT CAST(min(r) AS BIGINT) AS qhat FROM rk, nc
           |      WHERE rn * 100 >= (nc + 1) * 90)
           |SELECT nc AS n_calib, CAST(count(*) AS BIGINT) AS n_eval, qhat,
           |  CASE WHEN qhat IS NOT NULL AND count(*) > 0 THEN
           |    (CAST(sum(CASE WHEN r <= qhat THEN 1 ELSE 0 END) AS BIGINT)
           |      * 1000000) // count(*) END AS coverage_ppm
           |FROM b, q, nc WHERE NOT c GROUP BY nc, qhat""".stripMargin),
    "The conformal order statistic runs through globalRowNumber (range " +
      "repartition + |partitions|-row offset rollup — never a " +
      "single-partition window over the calibration slice); the crossing " +
      "test is pure integer arithmetic, and coverage is one more " +
      "map-side-combined agg. Distribution-free interval calibration for " +
      "any quality/score model gating data.")

  /** q452 — T-state: per-user running maximum drawdown through the
    * Spark 4 `transformWithState` StatefulProcessor (ValueState +
    * RocksDB store — the arbitrary-state API that supersedes
    * flatMapGroupsWithState), replayed over the events fixture and
    * checked against a batch cumulative-max oracle. */
  val q452 = Declared(
    "q452_stream_drawdown_tws", "T-state",
    (s, dir) => {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
      try TimeSeries.streamEventsToTable(s, dir, "q452", mode = "update")(ev => {
        import s.implicits._
        graft.streaming.StreamOps.statefulDrawdown(
          ev.select(col("user_id").cast("long").as("key"),
              unix_micros(col("ts")).as("us"),
              col("event_id").cast("long").as("tie"),
              floor(col("value") * 1e6 + 0.5).cast("long").as("vMicro"))
            .as[graft.streaming.StreamOps.DrawdownIn]).toDF()
      }).orderBy(col("user_id"))
      finally prev match {
        case Some(p) => s.conf.set(key, p)
        case None => s.conf.unset(key)
      }
    },
    Some("""WITH e AS (
           |  SELECT user_id, epoch_us(ts) AS us, event_id,
           |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
           |  FROM events),
           |w AS (
           |  SELECT user_id, v,
           |    max(v) OVER (PARTITION BY user_id ORDER BY us, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
           |  FROM e)
           |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           |  CAST(max(peak) AS BIGINT) AS peak_micro,
           |  CAST(max(peak - v) AS BIGINT) AS max_drawdown_micro
           |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin),
    "State is 3 longs per key in RocksDB; each micro-batch shuffles only " +
      "its own rows keyed by user, and the in-batch event-time sort makes " +
      "the single-batch replay bit-deterministic against the batch " +
      "cumulative-max window. The modern stateful API exercised under " +
      "the same oracle gate as everything else.")

  /** q453 — E2+/ML: Borůvka minimum spanning forest of the supplier
    * proximity graph (grid-bucketed eps-pairs, unique integer weights
    * d²·10⁵ + a·101 + b) — the single-linkage backbone. The oracle
    * replays Kruskal's cut property: an edge is in the MST iff its
    * endpoints are disconnected using only strictly lighter edges,
    * checked for EVERY edge at once via a threshold-keyed recursive
    * closure. */
  val q453 = Declared(
    "q453_boruvka_mst", "E2+,ML",
    (s, dir) => {
      val pts = Tables.supplier(s, dir)
        .filter(col("s_suppkey") <= 60)
        .select(col("s_suppkey").as("id"),
          expr("CAST((s_suppkey * 37) % 100 AS DOUBLE)").as("x"),
          expr("CAST((s_suppkey * 73) % 100 AS DOUBLE)").as("y"))
      val pairs = graft.ops.SpatialOps.gridBucketJoin(
          pts.select(col("id").as("id_sensor"), col("x"), col("y")),
          pts.select(col("id").as("nbr"), col("x"), col("y")),
          radius = 15.0, cell = 15.0)
        .filter(col("id_sensor") < col("nbr"))
        .select(col("id_sensor").as("u"), col("nbr").as("v"),
          (((col("sx") - col("x")) * (col("sx") - col("x")) +
            (col("sy") - col("y")) * (col("sy") - col("y"))).cast("long")
            * 100000L + col("id_sensor") * 101L + col("nbr")).as("w"))
      graft.ext.Graph.boruvkaMst(pairs, "u", "v", "w")
        .orderBy(col("w"))
    },
    Some("""WITH RECURSIVE s AS (
           |  SELECT s_suppkey AS id,
           |    CAST((s_suppkey * 37) % 100 AS DOUBLE) AS x,
           |    CAST((s_suppkey * 73) % 100 AS DOUBLE) AS y
           |  FROM supplier WHERE s_suppkey <= 60),
           |ed AS (
           |  SELECT a.id AS a, b.id AS b,
           |    CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT)
           |      * 100000 + a.id * 101 + b.id AS w
           |  FROM s a JOIN s b ON a.id < b.id
           |  WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 225),
           |sub AS (
           |  SELECT e1.w AS t, e2.a, e2.b FROM ed e1
           |  JOIN ed e2 ON e2.w < e1.w),
           |sym AS (SELECT t, a, b FROM sub
           |        UNION ALL SELECT t, b, a FROM sub),
           |reach AS (
           |  SELECT t, a AS node, a AS comp FROM sym
           |  UNION
           |  SELECT sym.t, sym.a, reach.comp FROM sym
           |  JOIN reach ON reach.t = sym.t AND reach.node = sym.b),
           |cmp AS (SELECT t, node, min(comp) AS comp FROM reach GROUP BY 1, 2)
           |SELECT e.a, e.b, e.w FROM ed e
           |LEFT JOIN cmp ca ON ca.t = e.w AND ca.node = e.a
           |LEFT JOIN cmp cb ON cb.t = e.w AND cb.node = e.b
           |WHERE ca.comp IS NULL OR cb.comp IS NULL OR ca.comp <> cb.comp
           |ORDER BY e.w""".stripMargin),
    "Each Borůvka round: two node-keyed label joins, one min-struct agg " +
      "per component, and a COMPONENT-level contraction — frames shrink " +
      "at least geometrically, O(log V) rounds, one scalar to the driver " +
      "per round. The forest feeds single-linkage clustering (cut at a " +
      "threshold) and bottleneck-path queries; the eps-graph build is the " +
      "same grid-bucket join as DBSCAN's, never a cartesian.")

  /** q457 — ML: single-linkage clusters of the q453 proximity graph at
    * an exact threshold. The ENGINE routes through the Borůvka forest
    * (cut edges heavier than T, then CC); the ORACLE uses the
    * independent characterization — single linkage at T ≡ connected
    * components of the T-thresholded graph — so the two sides agreeing
    * is a real cross-check of the MST path, not a replay. */
  val q457 = Declared(
    "q457_single_linkage", "ML,E2+",
    (s, dir) => {
      val pts = Tables.supplier(s, dir)
        .filter(col("s_suppkey") <= 60)
        .select(col("s_suppkey").as("id"),
          expr("CAST((s_suppkey * 37) % 100 AS DOUBLE)").as("x"),
          expr("CAST((s_suppkey * 73) % 100 AS DOUBLE)").as("y"))
      val pairs = graft.ops.SpatialOps.gridBucketJoin(
          pts.select(col("id").as("id_sensor"), col("x"), col("y")),
          pts.select(col("id").as("nbr"), col("x"), col("y")),
          radius = 15.0, cell = 15.0)
        .filter(col("id_sensor") < col("nbr"))
        .select(col("id_sensor").as("u"), col("nbr").as("v"),
          (((col("sx") - col("x")) * (col("sx") - col("x")) +
            (col("sy") - col("y")) * (col("sy") - col("y"))).cast("long")
            * 100000L + col("id_sensor") * 101L + col("nbr")).as("w"))
      graft.ext.Graph.singleLinkage(pairs, "u", "v", "w",
          threshold = 10000000L) // d2 <= 100, i.e. distance <= 10
        .orderBy(col("node"))
    },
    Some("""WITH RECURSIVE s AS (
           |  SELECT s_suppkey AS id,
           |    CAST((s_suppkey * 37) % 100 AS DOUBLE) AS x,
           |    CAST((s_suppkey * 73) % 100 AS DOUBLE) AS y
           |  FROM supplier WHERE s_suppkey <= 60),
           |ed AS (
           |  SELECT a.id AS a, b.id AS b,
           |    CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT)
           |      * 100000 + a.id * 101 + b.id AS w
           |  FROM s a JOIN s b ON a.id < b.id
           |  WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 225),
           |cut AS (SELECT a, b FROM ed WHERE w <= 10000000),
           |sym AS (SELECT a, b FROM cut UNION ALL SELECT b, a FROM cut),
           |reach AS (
           |  SELECT a AS node, a AS comp FROM sym
           |  UNION
           |  SELECT sym.a, reach.comp FROM sym
           |  JOIN reach ON reach.node = sym.b),
           |cmp AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
           |-- bare UNION inside a WITH RECURSIVE block is parsed as an
           |-- anchor/step split (no dedup); spell out the DISTINCT
           |nodes AS (
           |  SELECT DISTINCT node FROM (
           |    SELECT a AS node FROM ed UNION ALL SELECT b FROM ed))
           |SELECT n.node, coalesce(cmp.comp, n.node) AS cluster
           |FROM nodes n LEFT JOIN cmp ON cmp.node = n.node
           |ORDER BY n.node""".stripMargin),
    "Engine path: Borůvka forest (O(log V) rounds) + a cut + CC over the " +
      "n-1 forest edges; oracle path: direct thresholded closure. Cutting " +
      "the FOREST instead of re-thresholding the raw graph is the win at " +
      "scale — the forest is |V|-1 edges however dense the eps-graph was, " +
      "and one forest answers every threshold.")

  val all: Seq[Declared] =
    Seq(q444, q445, q447, q448, q449, q450, q451, q452, q453, q457)
}
