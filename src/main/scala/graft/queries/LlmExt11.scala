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

  val all: Seq[Declared] = Seq(q444, q445, q447)
}
