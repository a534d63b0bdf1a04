package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Clustering, Dedup}
import graft.ops.Experimentation
import LlmExt2.duckMd5Hash60

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

  /** q360 — E6: rendezvous-hash sharding + resize audit — assign
    * every document under 8 and then 9 nodes and measure per-shard
    * movement. HRW's contract: adding a node moves ~1/(n+1) ≈ 11% of
    * keys, vs ~89% for mod-hashing; the audit makes the migration
    * cost a number before the migration. */
  val q360 = Declared(
    "q360_rendezvous_shards", "E6",
    (s, dir) => graft.ops.Layout.rendezvousShards(
        Tables.documents(s, dir), col("doc_id"), nBefore = 8, nAfter = 9)
      .orderBy(col("shard")),
    Some(s"""WITH ds AS (
           |  SELECT CAST(doc_id AS VARCHAR) AS id FROM documents),
           |sh AS (
           |  SELECT id, n, s,
           |    ${duckMd5Hash60("id || '#' || CAST(s AS VARCHAR)")} AS h
           |  FROM ds, (SELECT 8 AS n UNION ALL SELECT 9) nn,
           |    LATERAL (SELECT unnest(range(0, nn.n)) AS s)),
           |pick AS (
           |  SELECT id, n, s FROM (
           |    SELECT id, n, s, row_number() OVER (
           |      PARTITION BY id, n ORDER BY h DESC, s DESC) AS rn
           |    FROM sh) WHERE rn = 1),
           |wide AS (
           |  SELECT b.id, b.s AS shard, a.s AS after_s
           |  FROM pick b JOIN pick a ON b.id = a.id AND a.n = 9
           |  WHERE b.n = 8)
           |SELECT CAST(shard AS BIGINT) AS shard,
           |  CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CASE WHEN shard <> after_s THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_moved,
           |  CAST((1000000 * sum(CASE WHEN shard <> after_s THEN 1 ELSE 0 END))
           |    // count(*) AS BIGINT) AS moved_ppm
           |FROM wide GROUP BY shard ORDER BY shard""".stripMargin),
    "Pure scan-side arithmetic (n hashes per key) + one shard-keyed agg with " +
      "map-side combine. The resize-cost estimate every storage/router " +
      "migration needs before executing: HRW moves ~1/(n+1) of keys where " +
      "mod-hashing moves almost all of them.")

  /** q361 — A-eval/E7: self-BLEU corpus diversity (Zhu et al. 2018,
    * Texygen) — mean pairwise BLEU-2 over a deterministic sample of
    * within-source pairs. High self-BLEU = mode-collapsed/templated
    * source; run over generation batches before training on them. */
  val q361 = Declared(
    "q361_self_bleu", "A-eval,E7",
    (s, dir) => {
      // constant gate (q45 discipline): the pair space is quadratic in
      // source size — the oracle-scale slice keeps it fixed across SFs
      val d = Tables.documents(s, dir).filter(col("doc_id") < 500)
        .select(col("source"), col("doc_id"), col("text"))
      val a = d.select(col("source"), col("doc_id").as("ida"),
        col("text").as("cand"))
      val b = d.select(col("source"), col("doc_id").as("idb"),
        col("text").as("ref"))
      val pairs = a.join(b, Seq("source"))
        .filter(col("ida") < col("idb") &&
          (col("ida") + col("idb")) % 7 === 0)
        .select(concat_ws(":", col("source"), col("ida"), col("idb"))
          .as("pid"), col("cand"), col("ref"))
      graft.ext.Curation.bleu(pairs, "pid", "cand", "ref", maxN = 2)
        .withColumn("source", split(col("pid"), ":")(0))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(bleu_nano) div count(1)").as("mean_bleu_nano"))
        .orderBy(col("source"))
    },
    Some("""WITH prs AS (
           |  SELECT a.source,
           |    list_filter(regexp_split_to_array(lower(a.text), '\s+'),
           |      x -> x <> '') AS ct,
           |    list_filter(regexp_split_to_array(lower(b.text), '\s+'),
           |      x -> x <> '') AS rt,
           |    a.source || ':' || a.doc_id || ':' || b.doc_id AS pid
           |  FROM documents a JOIN documents b ON a.source = b.source
           |  WHERE a.doc_id < 500 AND b.doc_id < 500
           |    AND a.doc_id < b.doc_id AND (a.doc_id + b.doc_id) % 7 = 0),
           |c1 AS (
           |  SELECT pid, g, CAST(count(*) AS BIGINT) AS cc FROM
           |    (SELECT pid, unnest(ct) AS g FROM prs) GROUP BY 1, 2),
           |r1 AS (
           |  SELECT pid, g, CAST(count(*) AS BIGINT) AS cr FROM
           |    (SELECT pid, unnest(rt) AS g FROM prs) GROUP BY 1, 2),
           |ov1 AS (
           |  SELECT pid, CAST(sum(least(cc, cr)) AS BIGINT) AS ov
           |  FROM c1 JOIN r1 USING (pid, g) GROUP BY pid),
           |t1 AS (SELECT pid, CAST(sum(cc) AS BIGINT) AS tot
           |       FROM c1 GROUP BY pid),
           |c2 AS (
           |  SELECT pid, g, CAST(count(*) AS BIGINT) AS cc FROM
           |    (SELECT pid, ct[i] || ' ' || ct[i + 1] AS g
           |     FROM (SELECT pid, ct, unnest(range(1, len(ct))) AS i FROM prs))
           |  GROUP BY 1, 2),
           |r2 AS (
           |  SELECT pid, g, CAST(count(*) AS BIGINT) AS cr FROM
           |    (SELECT pid, rt[i] || ' ' || rt[i + 1] AS g
           |     FROM (SELECT pid, rt, unnest(range(1, len(rt))) AS i FROM prs))
           |  GROUP BY 1, 2),
           |ov2 AS (
           |  SELECT pid, CAST(sum(least(cc, cr)) AS BIGINT) AS ov
           |  FROM c2 JOIN r2 USING (pid, g) GROUP BY pid),
           |t2 AS (SELECT pid, CAST(sum(cc) AS BIGINT) AS tot
           |       FROM c2 GROUP BY pid),
           |j AS (
           |  SELECT p.pid, split_part(p.pid, ':', 1) AS source,
           |    CAST(len(p.ct) AS BIGINT) AS c_len,
           |    CAST(len(p.rt) AS BIGINT) AS r_len,
           |    coalesce(ov1.ov, 0) AS overlap_1, coalesce(t1.tot, 0) AS tot1,
           |    coalesce(ov2.ov, 0) AS overlap_2, coalesce(t2.tot, 0) AS tot2
           |  FROM prs p
           |  LEFT JOIN ov1 ON ov1.pid = p.pid
           |  LEFT JOIN t1 ON t1.pid = p.pid
           |  LEFT JOIN ov2 ON ov2.pid = p.pid
           |  LEFT JOIN t2 ON t2.pid = p.pid),
           |scored AS (
           |  SELECT source,
           |    CAST(round(
           |      (CASE WHEN c_len >= r_len THEN 1.0
           |        ELSE exp(1.0 - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE))
           |        END) *
           |      exp((ln(CAST(overlap_1 + 1 AS DOUBLE) /
           |             CAST(tot1 + 1 AS DOUBLE)) +
           |           ln(CAST(overlap_2 + 1 AS DOUBLE) /
           |             CAST(tot2 + 1 AS DOUBLE))) / 2) * 1e9, 0) AS BIGINT)
           |      AS bleu_nano
           |  FROM j)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(sum(bleu_nano) // count(*) AS BIGINT) AS mean_bleu_nano
           |FROM scored GROUP BY source ORDER BY source""".stripMargin),
    "The pair sample is a deterministic hash-free predicate ((ida+idb) % 7) so " +
      "pair volume is a fixed fraction of each source's quadratic — bounded " +
      "per source exactly like SemDeDup's clusters; the BLEU core is q332's " +
      "content-keyed gram machinery. The mode-collapse screen for synthetic " +
      "generation batches.")

  /** q362 — E6/E8: deterministic weighted sampling without
    * replacement (Efraimidis-Spirakis) — 50 documents drawn with
    * probability proportional to length, selection = top-k of a
    * content-derived integer key, reproducible anywhere. */
  val q362 = Declared(
    "q362_weighted_sample", "E6,E8",
    (s, dir) => graft.ext.Curation.weightedSample(
        Tables.documents(s, dir), "doc_id", col("n_chars"), k = 50)
      .orderBy(col("score_nano").desc, col("doc_id")),
    Some(s"""WITH u AS (
           |  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           |    (${duckMd5Hash60("CAST(doc_id AS VARCHAR)")} % 1000000) + 1
           |      AS u_ppm
           |  FROM documents WHERE n_chars > 0)
           |SELECT doc_id, weight, u_ppm,
           |  CAST(round(ln(CAST(u_ppm AS DOUBLE) / 1e6) /
           |    CAST(weight AS DOUBLE) * 1e9, 0) AS BIGINT) AS score_nano
           |FROM u
           |ORDER BY score_nano DESC, doc_id
           |LIMIT 50""".stripMargin),
    "Scan-side scoring + TakeOrdered(k): per-partition heaps, no global sort, " +
      "no shuffle wider than k rows, and the top-k of a union is the top-k of " +
      "per-part top-ks — the mergeable weighted subsampler. What 'sample 1M " +
      "docs proportional to quality' actually runs at 100 TB.")

  val all: Seq[Declared] = Seq(q351, q352, q353, q357, q360, q361, q362)
}
