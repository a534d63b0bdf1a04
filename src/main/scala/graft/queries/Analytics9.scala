package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Graph, Similarity}
import graft.ops.{Aggregates, Evaluation}

/** Round-4 batch 27: distribution-free time-series decision tests
  * (Mann–Kendall trend, Pettitt changepoint), the likelihood-ratio
  * G-test, graph-topology fingerprints (degree assortativity, local
  * clustering coefficients) and MAP@k retrieval evaluation. Exactness
  * discipline unchanged: integer pair/sgn sums, micro-quantized libm
  * terms, IEEE finishes mirrored token-for-token in the oracle SQL. */
object Analytics9 {

  private def coEdges(s: org.apache.spark.sql.SparkSession, dir: String,
      modulus: Int): org.apache.spark.sql.DataFrame = {
    val pr = Tables.lineitem(s, dir).filter(col("l_orderkey") % modulus === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    pr.select(col("l_orderkey"), col("l_partkey").as("p1"))
      .join(pr.select(col("l_orderkey"), col("l_partkey").as("p2")), "l_orderkey")
      .filter(col("p1") < col("p2"))
      .select(col("p1"), col("p2")).distinct()
  }

  /** Month key as a portable BIGINT (year·100 + month) so both engines
    * agree on the series key type. */
  private def monthlyOrders(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.orders(s, dir)
      .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("t"))
      .agg(count(lit(1)).as("v"))

  /** q243 — A-stat: Mann–Kendall trend test on the monthly order-count
    * series — is volume drifting, without assuming normality or
    * linearity? S is an exact pair-sign sum over the month rollup;
    * the tie-corrected variance is exact; z is one pinned finish. */
  val q243 = Declared(
    "q243_mann_kendall", "A-stat",
    (s, dir) => Aggregates.mannKendall(monthlyOrders(s, dir),
      col("t"), col("v")),
    Some("""WITH s AS (
           |  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
           |    AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1),
           |p AS (
           |  SELECT CAST(sum(CASE WHEN b.v > a.v THEN 1
           |    WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
           |  FROM s a JOIN s b ON a.t < b.t),
           |ti AS (
           |  SELECT CAST(sum(c) AS HUGEINT) AS n,
           |    CAST(sum(CAST(c AS HUGEINT) * (c - 1) * (c * 2 + 5))
           |      AS HUGEINT) AS tsum
           |  FROM (SELECT count(*) AS c FROM s GROUP BY v)),
           |f AS (
           |  SELECT n, s,
           |    CAST(n * (n - 1) * (n * 2 + 5) - tsum AS HUGEINT) AS var18
           |  FROM p CROSS JOIN ti)
           |SELECT CAST(n AS BIGINT) AS n, s, CAST(var18 AS BIGINT) AS var18,
           |  round(CASE WHEN var18 > 0 THEN
           |    CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) /
           |           sqrt(CAST(var18 AS DOUBLE) / 18.0)
           |         WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) /
           |           sqrt(CAST(var18 AS DOUBLE) / 18.0)
           |         ELSE 0.0 END ELSE 0.0 END, 6) AS z
           |FROM f""".stripMargin),
    "The fact table reduces to the month-grain rollup FIRST; the pair join is " +
      "rollup² (84 months → 3.5k pairs), never data-sized. The drift alarm a " +
      "pipeline owner runs on every ingest-volume series before trusting " +
      "week-over-week comparisons.")

  /** q244 — A-stat: Pettitt changepoint on the same monthly series —
    * WHERE did the level shift, distribution-free. U_t is an exact
    * pair-sign sum per split; the report is the max-|U| split with the
    * smallest-t tie-break. */
  val q244 = Declared(
    "q244_pettitt", "A-stat",
    (s, dir) => Aggregates.pettitt(monthlyOrders(s, dir),
      col("t"), col("v")),
    Some("""WITH s AS (
           |  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
           |    AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1),
           |pr AS (
           |  SELECT a.t AS t1, b.t AS t2,
           |    CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END
           |      AS sg
           |  FROM s a JOIN s b ON a.t < b.t),
           |u AS (
           |  SELECT g.t AS split, CAST(sum(sg) AS BIGINT) AS ut
           |  FROM pr JOIN s g ON pr.t1 <= g.t AND g.t < pr.t2
           |  GROUP BY 1),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s)
           |SELECT n, split AS t_star, ut AS u_t, abs(ut) AS k_abs
           |FROM u CROSS JOIN n
           |ORDER BY abs(ut) DESC, split LIMIT 1""".stripMargin),
    "Same rollup-first shape as q243 — the U_t scan is a bounded range join " +
      "of rollup pairs against the rollup's own split grid. The 'when did the " +
      "upstream crawler change' localizer behind every volume-drift alarm.")

  /** q245 — A-stat: G-test of independence (return flag × line status)
    * — the log-likelihood-ratio twin of q153's χ² (G = 2N·MI in nats),
    * the better-calibrated choice for sparse cells. Per-cell terms
    * micro-quantized; zero cells contribute zero exactly. */
  val q245 = Declared(
    "q245_g_test", "A-stat",
    (s, dir) => Aggregates.gTest(Tables.lineitem(s, dir),
      col("l_returnflag"), col("l_linestatus")),
    Some("""WITH obs AS (
           |  SELECT l_returnflag AS r, l_linestatus AS c, count(*) AS o
           |  FROM lineitem GROUP BY 1, 2),
           |rm AS (SELECT r, sum(o) AS rn FROM obs GROUP BY r),
           |cm AS (SELECT c, sum(o) AS cn FROM obs GROUP BY c),
           |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
           |  count(DISTINCT r) AS dr, count(DISTINCT c) AS dc FROM obs),
           |t AS (
           |  SELECT CAST(round(CAST(o AS DOUBLE) *
           |    ln(CAST(CAST(o AS HUGEINT) * n AS DOUBLE) /
           |       CAST(CAST(rn AS HUGEINT) * cn AS DOUBLE)) * 1e6, 0)
           |    AS BIGINT) AS tu
           |  FROM obs JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN tot)
           |SELECT round(2.0 * CAST(sum(tu) AS DOUBLE) / 1e6, 6) AS g,
           |  CAST((max(dr) - 1) * (max(dc) - 1) AS BIGINT) AS dof,
           |  CAST(max(n) AS BIGINT) AS n
           |FROM t CROSS JOIN tot""".stripMargin),
    "Identical plan shape to q153: one contingency agg plus two marginal " +
      "rollups of it — contingency-sized, never data-sized.")

  /** q246 — E2+: degree assortativity of the co-purchase graph — do
    * popular parts co-occur with popular parts (r > 0) or with
    * long-tail parts (r < 0)? The one-number topology fingerprint;
    * five exact edge-grain sums, one IEEE finish. */
  val q246 = Declared(
    "q246_assortativity", "E2+",
    (s, dir) => Graph.assortativity(coEdges(s, dir, 10), "p1", "p2"),
    Some("""WITH pr AS (
           |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
           |  WHERE l_orderkey % 10 = 0),
           |e AS (
           |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           |  FROM pr a JOIN pr b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
           |sym AS (SELECT u AS src, v AS dst FROM e
           |        UNION ALL SELECT v, u FROM e),
           |deg AS (SELECT src AS node, count(*) AS dg FROM sym GROUP BY 1),
           |tg AS (
           |  SELECT dx.dg AS x, dy.dg AS y
           |  FROM sym JOIN deg dx ON dx.node = sym.src
           |  JOIN deg dy ON dy.node = sym.dst),
           |a AS (
           |  SELECT CAST(count(*) AS HUGEINT) AS m2,
           |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
           |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
           |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
           |  FROM tg)
           |SELECT CAST(m2 // 2 AS BIGINT) AS m,
           |  round(CAST(m2 * sxy - sx * sy AS DOUBLE) /
           |    (sqrt(CAST(m2 * sxx - sx * sx AS DOUBLE)) *
           |     sqrt(CAST(m2 * syy - sy * sy AS DOUBLE))), 6) AS r
           |FROM a""".stripMargin),
    "Degree is a node-keyed agg; endpoint tagging is two equi-joins on node " +
      "id (Zipf hubs → AQE skew-split); the correlation is one edge-grain " +
      "agg. Costs one pass over the edge list at any graph size.")

  /** q247 — E2+: local clustering coefficients of the co-purchase
    * graph — c_v = 2·T_v/(deg(deg−1)) in exact ppm, triangles from the
    * degree-oriented wedge kernel (q128), zero-triangle nodes
    * reporting 0. Top-50 under (degree desc, node). */
  val q247 = Declared(
    "q247_clustering_coef", "E2+",
    (s, dir) => Graph.clusteringCoefficients(coEdges(s, dir, 10), "p1", "p2")
      .orderBy(col("degree").desc, col("node")).limit(50),
    Some("""WITH pr AS (
           |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
           |  WHERE l_orderkey % 10 = 0),
           |e AS (
           |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           |  FROM pr a JOIN pr b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
           |deg AS (
           |  SELECT node, CAST(count(*) AS BIGINT) AS degree
           |  FROM (SELECT unnest([u, v]) AS node FROM e) GROUP BY node),
           |tri AS (
           |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
           |  FROM e e1 JOIN e e2 ON e2.u = e1.v
           |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
           |tc AS (
           |  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
           |  FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY node)
           |SELECT deg.node, degree, coalesce(n_triangles, 0) AS n_triangles,
           |  2000000 * coalesce(n_triangles, 0) // (degree * (degree - 1))
           |    AS local_cc_ppm
           |FROM deg LEFT JOIN tc ON tc.node = deg.node
           |WHERE degree >= 2
           |ORDER BY degree DESC, deg.node LIMIT 50""".stripMargin),
    "The oriented wedge join bounds triangle work at O(m^1.5); the " +
      "coefficient join is node-keyed. The 'is this neighborhood a clique or " +
      "a star' signal behind community sanity checks on the dedup graph.")

  /** q248 — E13: MAP@10 over the label-relevance retrieval setup of
    * q177 — the rank-sensitive score that q177's flat P/R/MRR miss.
    * Each hit's P@i is one micro-quantized division of exact
    * integers; the per-query AP is a pinned finish. */
  val q248 = Declared(
    "q248_map_at_k", "E13",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") % 10 === 1)
      val runs = Similarity.topKCosineBatch(
        emb, q, "embedding", "vec_id", k = 10)
        .select(col("query_id"), col("item_id"), col("rank"))
      val items = emb.select(col("vec_id").as("item_id"), col("label"))
      val truth = q.select(col("vec_id").as("query_id"), col("label"))
        .join(items, Seq("label"))
        .filter(col("item_id") =!= col("query_id"))
        .select(col("query_id"), col("item_id"))
      Evaluation.mapAtK(runs, truth, k = 10)
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
           |marked AS (
           |  SELECT query_id, rnk,
           |    CASE WHEN item_label = query_label THEN 1 ELSE 0 END AS rel,
           |    CAST(sum(CASE WHEN item_label = query_label THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY query_id ORDER BY rnk
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS hits_i
           |  FROM runs WHERE rnk <= 10),
           |perq AS (
           |  SELECT query_id, CAST(sum(rel) AS BIGINT) AS hits,
           |    CAST(sum(CASE WHEN rel = 1 THEN
           |      CAST(round(1e6 * CAST(hits_i AS DOUBLE) /
           |        CAST(rnk AS DOUBLE), 0) AS BIGINT) ELSE 0 END)
           |      AS BIGINT) AS apsum
           |  FROM marked GROUP BY 1),
           |nrel AS (
           |  SELECT q.vec_id AS query_id, CAST(count(*) AS BIGINT) AS n_rel
           |  FROM q JOIN e ON e.label = q.label AND e.vec_id <> q.vec_id
           |  GROUP BY 1)
           |SELECT nrel.query_id, n_rel, COALESCE(hits, 0) AS hits,
           |  CASE WHEN n_rel > 0 THEN
           |    round(CAST(COALESCE(apsum, 0) AS DOUBLE) /
           |      CAST(least(n_rel, 10) AS DOUBLE) / 1e6, 6) END AS ap
           |FROM nrel LEFT JOIN perq ON nrel.query_id = perq.query_id
           |ORDER BY nrel.query_id""".stripMargin),
    "Metric cost is run-sized (|Q|·k rows), never corpus-sized — the " +
      "cumulative-hits window partitions by query over ≤ k rows. Evaluates " +
      "the IVF/LSH runs (q58/q59) unchanged at 100 TB.")

  val all: Seq[Declared] = Seq(q243, q244, q245, q246, q247, q248)
}
