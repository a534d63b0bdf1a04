package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, EventAnalytics, Evaluation, TimeSeriesOps}
import graft.ext.{Clustering, Graph}

/** Round-4 batch 33: sequential drift detection (Page–Hinkley),
  * imbalance-proof classifier diagnostics (MCC family), edge-grain
  * graph cohesion (k-truss), extreme-value capacity planning (Gumbel),
  * the period-over-period category-mix drift series, and the
  * embedding label-centroid audit. Exactness discipline unchanged. */
object Analytics15 {

  /** Co-purchase part graph (the q128/q134 fixture shape): parts
    * sharing an order are adjacent; distinct (p1 < p2) pairs. */
  private def coEdges(s: org.apache.spark.sql.SparkSession, dir: String,
      modulus: Int): org.apache.spark.sql.DataFrame = {
    val pr = Tables.lineitem(s, dir).filter(col("l_orderkey") % modulus === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    pr.select(col("l_orderkey"), col("l_partkey").as("p1"))
      .join(pr.select(col("l_orderkey"), col("l_partkey").as("p2")),
        "l_orderkey")
      .filter(col("p1") < col("p2"))
      .select(col("p1"), col("p2")).distinct()
  }

  /** q279 — A-stat/A8: Page–Hinkley drift monitor over the monthly
    * order-count series (δ = 0.05, λ = 5) — the sequential alarm
    * version of q244's retrospective changepoint. The whole integer
    * trajectory (running-mean micro terms, running min, PH gap)
    * replays in the oracle's recursive CTE bit-for-bit. */
  val q279 = Declared(
    "q279_page_hinkley", "A-stat,A8",
    (s, dir) => TimeSeriesOps.pageHinkleyInt(
        Tables.orders(s, dir)
          .groupBy(lit("all").as("k"),
            (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
              .cast("long").as("t"))
          .agg(count(lit(1)).as("v")),
        Seq(col("k")), col("t"), col("v"),
        deltaMicro = 50000L, lambdaMicro = 5000000L)
      .orderBy(col("order")),
    Some("""WITH RECURSIVE s0 AS (
           |  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
           |    AS BIGINT) AS o, CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1),
           |rn AS (SELECT o, v, row_number() OVER (ORDER BY o) AS i
           |       FROM s0),
           |rec AS (
           |  SELECT o, v, i, CAST(1 AS BIGINT) AS t, v AS s,
           |    CAST(0 - 50000 AS BIGINT) AS m,
           |    CAST(least(0, 0 - 50000) AS BIGINT) AS mn
           |  FROM rn WHERE i = 1
           |  UNION ALL
           |  SELECT r.o, r.v, r.i, p.t + 1, p.s + r.v,
           |    p.m + (1000000 * ((p.t + 1) * r.v - (p.s + r.v)))
           |      // (p.t + 1) - 50000,
           |    least(p.mn,
           |      p.m + (1000000 * ((p.t + 1) * r.v - (p.s + r.v)))
           |        // (p.t + 1) - 50000)
           |  FROM rn r JOIN rec p ON r.i = p.i + 1)
           |SELECT 'all' AS k, o AS "order", v AS value, m AS m_u,
           |  mn AS min_m_u, m - mn AS ph_u, m - mn >= 5000000 AS alarm
           |FROM rec ORDER BY "order"""".stripMargin),
    "One month-grain rollup feeds a per-key fold (calendar-bounded " +
      "series); the detector state is all integers — Spark div and DuckDB " +
      "// both truncate toward zero (the q166-verified pin), so the signed " +
      "running-mean terms replay exactly.")

  /** q280 — A-stat/ML: binary diagnostics of the 'shipped before
    * 1998-05-24 ⇒ returned' rule — confusion cells, sensitivity/
    * specificity, Youden's J, balanced accuracy and MCC, the
    * imbalance-proof readout set. */
  val q280 = Declared(
    "q280_binary_diagnostics", "A-stat,ML",
    (s, dir) => Evaluation.binaryDiagnostics(Tables.lineitem(s, dir),
      col("l_shipdate") < lit("1998-05-24").cast("date"),
      col("l_returnflag") === "R"),
    Some("""WITH c AS (
           |  SELECT
           |    CAST(sum(CASE WHEN l_shipdate < DATE '1998-05-24'
           |      AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |    CAST(sum(CASE WHEN l_shipdate < DATE '1998-05-24'
           |      AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |    CAST(sum(CASE WHEN l_shipdate >= DATE '1998-05-24'
           |      AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           |    CAST(sum(CASE WHEN l_shipdate >= DATE '1998-05-24'
           |      AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS tn
           |  FROM lineitem),
           |r AS (SELECT tp, fp, fn, tn,
           |    (tp * 1000000) // (tp + fn) AS sens_ppm,
           |    (tn * 1000000) // (tn + fp) AS spec_ppm
           |  FROM c)
           |SELECT tp, fp, fn, tn, sens_ppm, spec_ppm,
           |  sens_ppm + spec_ppm - 1000000 AS youden_j_ppm,
           |  (sens_ppm + spec_ppm) // 2 AS balanced_acc_ppm,
           |  CASE WHEN CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp) *
           |      (tn + fn) <> 0 THEN
           |    round(CAST(CAST(tp AS HUGEINT) * tn -
           |               CAST(fp AS HUGEINT) * fn AS DOUBLE) /
           |      sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn) *
           |        (tn + fp) * (tn + fn) AS DOUBLE)), 6)
           |  END AS mcc
           |FROM r""".stripMargin),
    "One conditional-sum agg over the fact table (map-side combine) and a " +
      "1-row finish. MCC is the single number that survives the 25/75 " +
      "class skew this rule faces; accuracy would flatter it.")

  /** q281 — E2+/E6: 4-truss of the co-purchase part graph — two bulk
    * peels of edges with < 2 supporting triangles, then the survivor
    * support. The edge-grain cohesion filter q134's k-core cannot
    * express. */
  val q281 = Declared(
    "q281_ktruss", "E2+,E6",
    (s, dir) => Graph.kTruss(coEdges(s, dir, 10), "p1", "p2",
        k = 4, rounds = 2)
      .orderBy(col("u"), col("v")),
    Some {
      def supportOf(e: String, out: String) =
        s"""tri_$out AS (
           |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
           |  FROM $e e1 JOIN $e e2 ON e2.u = e1.u AND e1.v < e2.v
           |  WHERE EXISTS (SELECT 1 FROM $e e3
           |                WHERE e3.u = e1.v AND e3.v = e2.v)),
           |supp_$out AS (
           |  SELECT u, v, CAST(count(*) AS BIGINT) AS support
           |  FROM (SELECT a AS u, b AS v FROM tri_$out
           |        UNION ALL SELECT a, c FROM tri_$out
           |        UNION ALL SELECT b, c FROM tri_$out)
           |  GROUP BY 1, 2)""".stripMargin
      s"""WITH pr AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
         |  WHERE l_orderkey % 10 = 0),
         |e0 AS (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM pr a JOIN pr b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |${supportOf("e0", "r1")},
         |e1 AS (
         |  SELECT e0.u, e0.v FROM e0 LEFT JOIN supp_r1 s USING (u, v)
         |  WHERE coalesce(s.support, 0) >= 2),
         |${supportOf("e1", "r2")},
         |e2 AS (
         |  SELECT e1.u, e1.v FROM e1 LEFT JOIN supp_r2 s USING (u, v)
         |  WHERE coalesce(s.support, 0) >= 2),
         |${supportOf("e2", "fin")}
         |SELECT e2.u, e2.v, coalesce(s.support, 0) AS support
         |FROM e2 LEFT JOIN supp_fin s USING (u, v)
         |ORDER BY 1, 2""".stripMargin
    },
    "Per round: one self equi-join on the shared lower endpoint, one " +
      "closing semi-join, one edge-keyed count — no cartesian anywhere; " +
      "localCheckpoint cuts lineage between peels. Edge-grain cohesion at " +
      "graph scale; compose the q128 degree orientation in front for " +
      "skew-heavy graphs.")

  /** q282 — A-stat: Gumbel extreme-value fit of monthly peak order
    * values — method-of-moments location/scale over block maxima and
    * the exceedance probability of a $580k design threshold. The
    * capacity question a normal fit understates. */
  val q282 = Declared(
    "q282_gumbel_maxima", "A-stat",
    (s, dir) => Aggregates.gumbelFit(Tables.orders(s, dir),
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
      threshold = 58000000L),
    Some("""WITH m AS (
           |  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
           |      AS BIGINT) AS b,
           |    max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS mx
           |  FROM orders GROUP BY 1),
           |s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |        CAST(sum(mx) AS HUGEINT) AS sm,
           |        CAST(sum(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS qm
           |      FROM m),
           |f AS (SELECT n,
           |    CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           |    sqrt(CAST(n * qm - sm * sm AS DOUBLE) /
           |         CAST(n * (n - 1) AS DOUBLE)) AS sd
           |  FROM s)
           |SELECT CAST(n AS BIGINT) AS n_blocks, round(mean, 6) AS mean,
           |  round(sd, 6) AS sd,
           |  round(sd * 0.7796968012336293, 6) AS beta,
           |  round(mean - 0.5772156649015329 * (sd * 0.7796968012336293), 6)
           |    AS mu,
           |  round(1.0 - exp(-exp(((mean - 0.5772156649015329 *
           |    (sd * 0.7796968012336293)) - 58000000) /
           |    (sd * 0.7796968012336293))), 6) AS p_exceed
           |FROM f""".stripMargin),
    "A month-grain max rollup (map-side combine) and a 1-row literal-" +
      "constant finish. The peak-load answer normal tails understate — " +
      "sizing for mean+3σ under-provisions against a Gumbel month.")

  /** q283 — A-stat/E6: day-over-day event-type mix drift — q218's JSD
    * as a time series over adjacent observed days, nano-quantized
    * per-category terms. The mix-shift alarm an ingest dashboard
    * watches. */
  val q283 = Declared(
    "q283_mix_drift_series", "A-stat,E6",
    (s, dir) => EventAnalytics.categoryMixDrift(
        Tables.events(s, dir),
        to_date(col("ts")).cast("string"), col("event_type"))
      .orderBy(col("period")),
    Some("""WITH cells AS (
           |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS p, event_type AS c,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM events GROUP BY 1, 2),
           |pr AS (
           |  SELECT p, CAST(sum(n) AS BIGINT) AS tot,
           |    lag(p, 1) OVER (ORDER BY p) AS prev,
           |    lag(CAST(sum(n) AS BIGINT), 1) OVER (ORDER BY p) AS ptot
           |  FROM cells GROUP BY p),
           |pairs AS (SELECT * FROM pr WHERE prev IS NOT NULL),
           |cur AS (SELECT pairs.p, cells.c, cells.n AS a
           |        FROM pairs JOIN cells ON cells.p = pairs.p),
           |prv AS (SELECT pairs.p, cells.c, cells.n AS b
           |        FROM pairs JOIN cells ON cells.p = pairs.prev),
           |m AS (
           |  SELECT coalesce(cur.p, prv.p) AS p,
           |    coalesce(cur.c, prv.c) AS c,
           |    coalesce(a, 0) AS a, coalesce(b, 0) AS b
           |  FROM cur FULL OUTER JOIN prv
           |    ON cur.p = prv.p AND cur.c = prv.c),
           |t AS (
           |  SELECT m.p, pairs.prev, pairs.tot, pairs.ptot,
           |    CAST(round((CASE WHEN a > 0 THEN
           |        (CAST(a AS DOUBLE) / CAST(tot AS DOUBLE)) *
           |        ln((CAST(a AS DOUBLE) / CAST(tot AS DOUBLE)) /
           |           ((CAST(a AS DOUBLE) / CAST(tot AS DOUBLE) +
           |             CAST(b AS DOUBLE) / CAST(ptot AS DOUBLE)) / 2))
           |      ELSE 0.0 END +
           |      CASE WHEN b > 0 THEN
           |        (CAST(b AS DOUBLE) / CAST(ptot AS DOUBLE)) *
           |        ln((CAST(b AS DOUBLE) / CAST(ptot AS DOUBLE)) /
           |           ((CAST(a AS DOUBLE) / CAST(tot AS DOUBLE) +
           |             CAST(b AS DOUBLE) / CAST(ptot AS DOUBLE)) / 2))
           |      ELSE 0.0 END) * 1e9, 0) AS BIGINT) AS term_nano
           |  FROM m JOIN pairs ON pairs.p = m.p)
           |SELECT p AS period, max(prev) AS prev_period,
           |  max(tot) AS n_cur, max(ptot) AS n_prev,
           |  round(CAST(sum(term_nano) AS DOUBLE) / 2 / 1e9, 6) AS jsd
           |FROM t GROUP BY p ORDER BY period""".stripMargin),
    "One (day, type) agg with map-side combine; pairing and terms run " +
      "over the day×type rollup (calendar × domain bounded). The drift " +
      "ALARM needs the series, not q218's one number — a slow mix rotation " +
      "never spikes any single day.")

  /** q284 — E3/ML: label-centroid cosine audit of the embeddings
    * table — which label pairs has the encoder failed to separate?
    * Micro-quantized components, exact per-(label, dim) sums; counts
    * cancel from the centroid cosine so the finish is integer-exact
    * until one dot/(√·√). */
  val q284 = Declared(
    "q284_centroid_cosines", "E3,ML",
    (s, dir) => Clustering.labelCentroidCosines(
        Tables.embeddings(s, dir), col("embedding"), col("label"))
      .orderBy(col("label_a"), col("label_b")),
    Some("""WITH comps AS (
           |  SELECT label AS l, i - 1 AS d,
           |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6, 0) AS BIGINT)
           |      AS q
           |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
           |sums AS (SELECT l, d, CAST(sum(q) AS HUGEINT) AS s
           |         FROM comps GROUP BY 1, 2),
           |cnt AS (SELECT label AS l, CAST(count(*) AS BIGINT) AS n
           |        FROM embeddings GROUP BY 1),
           |pair AS (
           |  SELECT a.l AS la, b.l AS lb,
           |    CAST(sum(a.s * b.s) AS HUGEINT) AS dot,
           |    CAST(sum(a.s * a.s) AS HUGEINT) AS na2,
           |    CAST(sum(b.s * b.s) AS HUGEINT) AS nb2
           |  FROM sums a JOIN sums b ON a.d = b.d AND a.l < b.l
           |  GROUP BY 1, 2)
           |SELECT la AS label_a, lb AS label_b, ca.n AS n_a, cb.n AS n_b,
           |  round(CAST(dot AS DOUBLE) /
           |    (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))), 6)
           |    AS cosine
           |FROM pair JOIN cnt ca ON ca.l = la JOIN cnt cb ON cb.l = lb
           |ORDER BY 1, 2""".stripMargin),
    "One posexplode + (label, dim) agg with map-side combine; the pair " +
      "join runs over the |labels|·dims rollup, never the vector table. " +
      "The pre-flight audit for nearest-centroid routing and per-label " +
      "mixture weights.")

  val all: Seq[Declared] = Seq(q279, q280, q281, q282, q283, q284)
}
