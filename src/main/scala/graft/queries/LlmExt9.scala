package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Clustering, Dedup}
import graft.ops.Experimentation

/** Round-6 batch 51: MAUVE-lite embedding-distribution divergence
  * (Pillutla et al. 2021), coarsened exact matching (Iacus/King/Porro
  * 2012), and template-skeleton duplicate families (the CCNet /
  * RefinedWeb boilerplate device). */
object LlmExt9 {

  /** q351 — E3+/A-eval: MAUVE-lite — cluster the pooled embeddings
    * (k = 8, 2 integer rounds), histogram P (labels 0-4, the "model"
    * set) vs Q (labels 5-9, the "reference") over the shared
    * clusters, and score each cluster's smoothed Jensen-Shannon
    * contribution in micro-nats. The oracle replays the identical
    * k-means rounds, so every histogram count — and therefore every
    * quantized JS term — must agree exactly. */
  val q351 = Declared(
    "q351_mauve_lite", "E3+,A-eval",
    (s, dir) => Clustering.mauveLite(Tables.embeddings(s, dir),
        "vec_id", "embedding", isP = col("label") < 5, k = 8, iters = 2)
      .orderBy(col("cluster")),
    Some {
      def dist(tag: String, cs: String) =
        s"""d$tag AS (
           |  SELECT p.id, c.ck, sum((p.q - c.c) * (p.q - c.c)) AS dist2
           |  FROM pts p JOIN $cs c ON p.d = c.d GROUP BY p.id, c.ck),
           |a$tag AS (
           |  SELECT id, ck, dist2 FROM (
           |    SELECT id, ck, dist2,
           |      row_number() OVER (PARTITION BY id ORDER BY dist2, ck) AS rn
           |    FROM d$tag) WHERE rn = 1)""".stripMargin
      val rounds = (1 to 2).map { i =>
        s"""${dist(i.toString, s"c${i - 1}")},
           |u$i AS (
           |  SELECT a.ck, p.d, CAST(sum(p.q) // count(*) AS BIGINT) AS c
           |  FROM pts p JOIN a$i a USING (id) GROUP BY a.ck, p.d),
           |c$i AS (
           |  SELECT c.ck, c.d, coalesce(u.c, c.c) AS c
           |  FROM c${i - 1} c LEFT JOIN u$i u ON c.ck = u.ck AND c.d = u.d)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH pts AS (
         |  SELECT vec_id AS id, i - 1 AS d,
         |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
         |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx),
         |flags AS (SELECT vec_id AS id, label < 5 AS p FROM embeddings),
         |init AS (
         |  SELECT id, row_number() OVER (ORDER BY id) - 1 AS ck
         |  FROM (SELECT DISTINCT id FROM pts) ORDER BY id LIMIT 8),
         |c0 AS (
         |  SELECT init.ck, pts.d, pts.q AS c FROM pts JOIN init USING (id)),
         |$rounds,
         |${dist("f", "c2")},
         |hist AS (
         |  SELECT af.ck AS cluster,
         |    CAST(sum(CASE WHEN f.p THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
         |    CAST(sum(CASE WHEN f.p THEN 0 ELSE 1 END) AS BIGINT) AS n_q
         |  FROM af JOIN flags f USING (id) GROUP BY af.ck),
         |tot AS (
         |  SELECT CAST(sum(n_p) AS BIGINT) AS np,
         |    CAST(sum(n_q) AS BIGINT) AS nq FROM hist)
         |SELECT CAST(cluster AS BIGINT) AS cluster, n_p, n_q,
         |  CAST(round((
         |    pp * ln(pp / mm) + qq * ln(qq / mm)) / 2 * 1e6, 0) AS BIGINT)
         |    AS js_u
         |FROM (
         |  SELECT cluster, n_p, n_q,
         |    CAST(n_p + 1 AS DOUBLE) / (np + 8) AS pp,
         |    CAST(n_q + 1 AS DOUBLE) / (nq + 8) AS qq,
         |    (CAST(n_p + 1 AS DOUBLE) / (np + 8) +
         |     CAST(n_q + 1 AS DOUBLE) / (nq + 8)) / 2 AS mm
         |  FROM hist, tot)
         |ORDER BY cluster""".stripMargin
    },
    "The k-means pass dominates; the histogram is one cluster-keyed agg with " +
      "map-side combine and the JS finish is k rows. The embedding-space " +
      "distribution-gap readout (is synthetic text distributionally distinct " +
      "from reference text?) at any generation-set size.")

  /** q352 — A-causal: coarsened exact matching of returned (R) vs
    * other line items on (quantity decile-bin, line status, ship
    * month) strata — the order-independent matching scheme. Each
    * matched stratum's row carries exact integer arm sums; the ATT is
    * one downstream weighted division over these audited operands. */
  val q352 = Declared(
    "q352_cem_matching", "A-causal",
    (s, dir) => Experimentation.cemMatch(Tables.lineitem(s, dir),
        treated = col("l_returnflag") === "R",
        outcomeCents = (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long"),
        strata = Seq(
          "qty_bin" -> expr("CAST(l_quantity AS BIGINT) div 10"),
          "line_status" -> col("l_linestatus"),
          "ship_month" -> month(col("l_shipdate")).cast("long")))
      .orderBy(col("qty_bin"), col("line_status"), col("ship_month")),
    Some("""SELECT CAST(l_quantity AS BIGINT) // 10 AS qty_bin,
           |  l_linestatus AS line_status,
           |  CAST(month(l_shipdate) AS BIGINT) AS ship_month,
           |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_t,
           |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END)
           |    AS BIGINT) AS n_c,
           |  CAST(sum(CASE WHEN l_returnflag = 'R'
           |    THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |    ELSE 0 END) AS BIGINT) AS sum_t_cents,
           |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 0
           |    ELSE CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |    END) AS BIGINT) AS sum_c_cents
           |FROM lineitem
           |GROUP BY 1, 2, 3
           |HAVING n_t >= 1 AND n_c >= 1
           |ORDER BY qty_bin, line_status, ship_month""".stripMargin),
    "ONE stratum-keyed agg with map-side combine; the both-arms rule is a " +
      "HAVING over the same rollup — no join, no per-unit pairing state. " +
      "Greedy 1:1 matching is scan-order-dependent and can never be " +
      "bit-reproducible on a cluster; CEM's stratum key IS the shuffle key, " +
      "which is why matching at 100 TB is done coarsened.")

  /** q353 — E1+/E7: template-skeleton duplicate families — docs that
    * differ only in digits/punctuation share a skeleton hash. Inputs
    * are documents plus TWO planted digit-variants per source doc
    * (ids +200000/+300000, different counters appended), so true
    * template families exist: each family is the source + 2 variants
    * sharing one skeleton with 3 distinct raw texts. */
  val q353 = Declared(
    "q353_template_skeletons", "E1+,E7",
    (s, dir) => {
      val base = Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      def variant(offset: Int, counter: String) = base.select(
        (col("doc_id") + offset).as("doc_id"),
        concat(col("text"), lit(s" showing $counter results")).as("text"))
      Dedup.templateSkeletons(
          base.unionByName(variant(200000, "123 of 4567"))
            .unionByName(variant(300000, "89 of 101112")),
          "text", "doc_id")
        .orderBy(col("first_id"))
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id < 100
           |  UNION ALL
           |  SELECT doc_id + 200000, text || ' showing 123 of 4567 results'
           |  FROM documents WHERE doc_id < 100
           |  UNION ALL
           |  SELECT doc_id + 300000, text || ' showing 89 of 101112 results'
           |  FROM documents WHERE doc_id < 100),
           |sk AS (
           |  SELECT doc_id,
           |    trim(regexp_replace(regexp_replace(regexp_replace(
           |      lower(text), '[0-9]+', '0', 'g'), '[^a-z0 ]', '', 'g'),
           |      ' +', ' ', 'g')) AS skel,
           |    md5(text) AS raw
           |  FROM corpus),
           |sh AS (
           |  SELECT doc_id, raw,
           |    (SELECT CAST(sum(CAST(strpos('0123456789abcdef',
           |        substr(md5(skel), i, 1)) - 1 AS BIGINT) << ((15 - i) * 4))
           |      AS BIGINT)
           |     FROM (SELECT unnest(range(1, 16)) AS i)) AS skeleton_hash
           |  FROM sk)
           |SELECT skeleton_hash, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(count(DISTINCT raw) AS BIGINT) AS n_distinct_raw,
           |  min(doc_id) AS first_id
           |FROM sh GROUP BY skeleton_hash
           |HAVING count(*) >= 2
           |ORDER BY first_id""".stripMargin),
    "Pure scan-side normalization (three codegen'd regexp passes, no UDF) + " +
      "one content-hash-keyed agg — exact dedup's cost profile with a uniform " +
      "shuffle key. Catches the 'Showing 1-10 of N' template spam that " +
      "byte-exact dedup misses and near-dup sketches waste candidates on.")

  /** q357 — E3+/A1: embedding anisotropy per label — the share of
    * vector energy in the mean direction (Mu & Viswanath 2018).
    * Healthy slices near 0 ppm; a hot slice means cosines there are
    * inflated by a shared component. All-integer readout. */
  val q357 = Declared(
    "q357_embedding_isotropy", "E3+,A1",
    (s, dir) => Clustering.embeddingIsotropy(Tables.embeddings(s, dir),
        col("label").cast("long"), col("embedding"))
      .orderBy(col("slice")),
    Some("""WITH pts AS (
           |  SELECT label, i - 1 AS d,
           |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT)
           |      AS q
           |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx),
           |pd AS (
           |  SELECT label, d, CAST(sum(q) AS HUGEINT) AS s,
           |    CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS qq,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM pts GROUP BY 1, 2)
           |SELECT CAST(label AS BIGINT) AS slice, max(n) AS n,
           |  CAST(sum(qq) AS BIGINT) AS sum_norm2,
           |  CAST((1000000 * CAST(sum(s * s) AS HUGEINT)) //
           |    (max(n) * CAST(sum(qq) AS HUGEINT)) AS BIGINT) AS aniso_ppm
           |FROM pd GROUP BY label ORDER BY slice""".stripMargin),
    "One posexplode + (slice, dim) agg with map-side combine -> a " +
      "|slices|*dims rollup; the finish is |slices| rows. The " +
      "embedding-health gate before trusting any cosine op: a large " +
      "aniso_ppm says subtract the mean (all-but-the-top) first.")

  val all: Seq[Declared] = Seq(q351, q352, q353, q357)
}
