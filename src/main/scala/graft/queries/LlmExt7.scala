package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Curation, Dedup, TextAnalysis}

/** Round-4 batch 36 — corpus-ops citizens: context-window packing
  * audit, near-dup cluster purity, source overlap matrix, per-source
  * health cards, vocabulary coverage sizing and crawler-template
  * detection. Exactness discipline unchanged. */
object LlmExt7 {

  /** q297 — E7/E6: context-packing audit of the corpus at a 4096-char
    * capacity — which training windows straddle documents (cross-doc
    * attention contamination unless masked) and how full each window
    * is. Integer window ids from exact prefix sums. */
  val q297 = Declared(
    "q297_context_packing", "E7,E6",
    (s, dir) => Curation.contextPackingAudit(Tables.documents(s, dir),
        col("doc_id"), col("n_chars"), capacity = 4096L)
      .orderBy(col("window_id")),
    Some("""WITH d AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS sz
           |           FROM documents WHERE n_chars > 0),
           |c AS (SELECT id, sz,
           |    CAST(sum(sz) OVER (ORDER BY id) AS BIGINT) AS cum FROM d),
           |b AS (SELECT id, sz, cum, (cum - sz) // 4096 AS w0,
           |    (cum - 1) // 4096 AS w1 FROM c),
           |e AS (SELECT b.*, unnest(range(w0, w1 + 1)) AS window_id FROM b),
           |t AS (SELECT window_id, w0, w1,
           |    least(cum, (window_id + 1) * 4096) -
           |    greatest(cum - sz, window_id * 4096) AS tok_in
           |  FROM e)
           |SELECT window_id, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN w1 > w0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_split,
           |  CAST(sum(tok_in) AS BIGINT) AS tokens_in
           |FROM t GROUP BY 1 ORDER BY window_id""".stripMargin),
    "One ordered prefix window over the doc rollup, then a layout-bounded " +
      "explode (≤ ⌈size/C⌉+1 rows per doc). The capacity-picking readout " +
      "run before a 100 TB sequence-packing job.")

  /** q298 — E2+/E7: purity of simhash-bucket clusters against the
    * language label — top-8-bit buckets of the portable md5-simhash
    * as coarse near-dup clusters; a low-purity bucket groups docs
    * across languages (translation twins the dedup graph would fuse).
    * The q46 fingerprint reconstruction feeds the q141-style entropy. */
  val q298 = Declared(
    "q298_cluster_purity", "E2+,E7",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val fp = Dedup.simhash(docs, "text", "doc_id",
        tokenHash = Dedup.md5Hash60, nBits = 60)
      Curation.clusterPurity(
        fp.join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .withColumn("__cl", expr("shiftright(simhash, 52) & 255L")),
        col("__cl"), col("lang"))
        .orderBy(col("cluster_id"))
    },
    Some("""WITH tok AS (SELECT DISTINCT doc_id,
           |    unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |  FROM documents),
           |th AS (
           |  SELECT doc_id, w,
           |    CAST(sum(CAST(strpos('0123456789abcdef',
           |      substr(md5(w), i, 1)) - 1 AS BIGINT)
           |        << ((15 - i) * 4)) AS BIGINT) AS h
           |  FROM tok CROSS JOIN (SELECT unnest(range(1, 16)) AS i) idx
           |  GROUP BY doc_id, w),
           |bits AS (
           |  SELECT doc_id, b,
           |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
           |  FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bs
           |  GROUP BY doc_id, b),
           |fp AS (
           |  SELECT doc_id,
           |    CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b
           |      ELSE 0 END) AS BIGINT) AS fp
           |  FROM bits GROUP BY doc_id),
           |asg AS (
           |  SELECT (fp.fp >> 52) & 255 AS cl, d.lang
           |  FROM fp JOIN documents d ON d.doc_id = fp.doc_id),
           |cells AS (SELECT cl, lang, CAST(count(*) AS BIGINT) AS c
           |          FROM asg GROUP BY 1, 2),
           |c2 AS (SELECT cl, lang, c,
           |    CAST(sum(c) OVER (PARTITION BY cl) AS BIGINT) AS n,
           |    row_number() OVER (PARTITION BY cl
           |      ORDER BY c DESC, lang) AS rk
           |  FROM cells),
           |c3 AS (SELECT cl, lang, c, n, rk,
           |    CAST(round(-((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
           |      ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))) * 1e9, 0)
           |      AS BIGINT) AS e
           |  FROM c2)
           |SELECT cl AS cluster_id, max(n) AS n_docs,
           |  CAST(count(*) AS BIGINT) AS n_labels,
           |  max(CASE WHEN rk = 1 THEN lang END) AS modal_label,
           |  CAST(max(CASE WHEN rk = 1 THEN (c * 1000000) // n END)
           |    AS BIGINT) AS purity_ppm,
           |  CAST(sum(e) AS BIGINT) AS entropy_nano
           |FROM c3 GROUP BY 1 ORDER BY cluster_id""".stripMargin),
    "The fingerprint agg is q46's scale path (tall per-bit partials, " +
      "map-side combine); purity runs over the cluster×label rollup. The " +
      "audit between building the dedup graph and trusting its merges.")

  /** q299 — E2+/E7: source-overlap matrix — exact 3-shingle-set
    * Jaccard between every source pair; twin SOURCES are a licensing
    * and mixture-weights question doc-level dedup never surfaces. */
  val q299 = Declared(
    "q299_source_overlap", "E2+,E7",
    (s, dir) => Curation.sourceOverlapMatrix(Tables.documents(s, dir),
        col("text"), col("source"), shingleSize = 3)
      .orderBy(col("source_a"), col("source_b")),
    Some("""WITH t AS (SELECT source,
           |    regexp_split_to_array(lower(text), '\s+') AS toks
           |  FROM documents),
           |st AS (SELECT source, toks, unnest(range(1, len(toks) - 1)) AS i
           |       FROM t WHERE len(toks) >= 3),
           |g AS (SELECT DISTINCT source,
           |    array_to_string(list_slice(toks, i, i + 2), ' ') AS sh
           |  FROM st),
           |g2 AS (SELECT source, sh FROM g WHERE sh <> ''),
           |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n
           |       FROM g2 GROUP BY 1),
           |iv AS (SELECT a.source AS sa, b.source AS sb,
           |    CAST(count(*) AS BIGINT) AS inter
           |  FROM g2 a JOIN g2 b ON a.sh = b.sh AND a.source < b.source
           |  GROUP BY 1, 2)
           |SELECT sa AS source_a, sb AS source_b, za.n AS n_a, zb.n AS n_b,
           |  inter,
           |  round(CAST(inter AS DOUBLE) /
           |    CAST(za.n + zb.n - inter AS DOUBLE), 6) AS jaccard
           |FROM iv JOIN sz za ON za.source = sa JOIN sz zb ON zb.source = sb
           |ORDER BY 1, 2""".stripMargin),
    "One (source, shingle) distinct agg; the intersection join keys on " +
      "shingles (rare-end skew only — the q104 argument); the readout is " +
      "|sources|² rows. Zero-overlap pairs are absent on both engines by " +
      "the same inner join.")

  /** q300 — E4/E7: per-source health cards — doc count, exact-dup
    * ratio, mean length, modal language + share, language entropy.
    * The triage table deciding which sources earn curation effort. */
  val q300 = Declared(
    "q300_source_health", "E4,E7",
    (s, dir) => Curation.sourceHealthProfile(Tables.documents(s, dir),
        col("source"), col("text"), col("lang"), col("n_chars"))
      .orderBy(col("source")),
    Some("""WITH ps AS (SELECT source AS src, CAST(count(*) AS BIGINT)
           |      AS n_docs,
           |    CAST(count(DISTINCT text) AS BIGINT) AS dh,
           |    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sc
           |  FROM documents GROUP BY 1),
           |ps2 AS (SELECT src, n_docs,
           |    ((n_docs - dh) * 1000000) // n_docs AS dup_ppm,
           |    sc // n_docs AS mean_chars FROM ps),
           |lc AS (SELECT source AS src, lang, CAST(count(*) AS BIGINT) AS c
           |       FROM documents GROUP BY 1, 2),
           |lc2 AS (SELECT src, lang, c,
           |    CAST(sum(c) OVER (PARTITION BY src) AS BIGINT) AS n,
           |    row_number() OVER (PARTITION BY src
           |      ORDER BY c DESC, lang) AS rk FROM lc),
           |lc3 AS (SELECT src, lang, c, n, rk,
           |    CAST(round(-((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
           |      ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))) * 1e9, 0)
           |      AS BIGINT) AS e FROM lc2),
           |la AS (SELECT src, max(CASE WHEN rk = 1 THEN lang END)
           |      AS modal_lang,
           |    CAST(max(CASE WHEN rk = 1 THEN (c * 1000000) // n END)
           |      AS BIGINT) AS modal_share_ppm,
           |    CAST(sum(e) AS BIGINT) AS lang_entropy_nano
           |  FROM lc3 GROUP BY 1)
           |SELECT ps2.src AS source, n_docs, CAST(dup_ppm AS BIGINT)
           |    AS dup_ppm,
           |  CAST(mean_chars AS BIGINT) AS mean_chars, modal_lang,
           |  modal_share_ppm, lang_entropy_nano
           |FROM ps2 JOIN la ON la.src = ps2.src
           |ORDER BY source""".stripMargin),
    "Two source-grain aggs (hash-distinct + language cells), all map-side " +
      "combinable. The oracle counts DISTINCT text where the engine counts " +
      "distinct sha256(text) — identical by injectivity, cheaper at 100 TB " +
      "on the engine side.")

  /** q301 — E4/E7: vocabulary coverage sizing — the smallest
    * frequency-ranked vocabulary reaching 50/90/99% of token
    * occurrences. All-integer crossings under the total rank order. */
  val q301 = Declared(
    "q301_vocab_coverage", "E4,E7",
    (s, dir) => TextAnalysis.vocabCoverage(Tables.documents(s, dir),
        col("text"), Seq(500000L, 900000L, 990000L))
      .orderBy(col("coverage_ppm")),
    Some("""WITH tk AS (SELECT
           |    unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |  FROM documents),
           |f AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tk
           |      WHERE w <> '' GROUP BY 1),
           |r AS (SELECT w, c,
           |    CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS rk,
           |    CAST(sum(c) OVER (ORDER BY c DESC, w
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS cum,
           |    CAST(sum(c) OVER () AS BIGINT) AS nt,
           |    CAST(count(*) OVER () AS BIGINT) AS ty
           |  FROM f),
           |th AS (SELECT CAST(unnest([500000, 900000, 990000]) AS BIGINT)
           |    AS coverage_ppm)
           |SELECT coverage_ppm, CAST(min(rk) AS BIGINT) AS vocab_size,
           |  max(ty) AS n_types, max(nt) AS n_tokens
           |FROM r JOIN th ON cum * 1000000 >= nt * coverage_ppm
           |GROUP BY 1 ORDER BY coverage_ppm""".stripMargin),
    "One token agg with map-side combine, vocabulary-rollup windows (the " +
      "q162 altitude) and a 3-row broadcast crossing join. Sizes the " +
      "tokenizer BEFORE the 100 TB tokenization run, next to q250/q275.")

  /** q302 — E4/E7: crawler-template prefix profile — per source, the
    * share of documents opening with the modal 3-token prefix; high
    * shares flag templated boilerplate that per-doc dedup misses. */
  val q302 = Declared(
    "q302_template_prefixes", "E4,E7",
    (s, dir) => TextAnalysis.templatePrefixProfile(Tables.documents(s, dir),
        col("text"), col("source"), k = 3)
      .orderBy(col("source")),
    Some("""WITH p AS (SELECT source AS src,
           |    array_to_string(list_slice(
           |      regexp_split_to_array(lower(text), '\s+'), 1, 3), ' ')
           |      AS pre
           |  FROM documents),
           |c AS (SELECT src, pre, CAST(count(*) AS BIGINT) AS c
           |      FROM p GROUP BY 1, 2),
           |c2 AS (SELECT src, pre, c,
           |    CAST(sum(c) OVER (PARTITION BY src) AS BIGINT) AS n,
           |    row_number() OVER (PARTITION BY src
           |      ORDER BY c DESC, pre) AS rk FROM c)
           |SELECT src AS source, max(n) AS n_docs,
           |  CAST(count(*) AS BIGINT) AS n_prefixes,
           |  max(CASE WHEN rk = 1 THEN pre END) AS modal_prefix,
           |  CAST(max(CASE WHEN rk = 1 THEN (c * 1000000) // n END)
           |    AS BIGINT) AS modal_ppm
           |FROM c2 GROUP BY 1 ORDER BY source""".stripMargin),
    "One (source, prefix) agg with map-side combine + a source-" +
      "partitioned rank window over it. The opening-lines fingerprint of " +
      "spun/templated crawls — bodies differ, openings don't.")

  val all: Seq[Declared] = Seq(q297, q298, q299, q300, q301, q302)
}
