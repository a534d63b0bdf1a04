package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.TextAnalysis

/** Round-4 (late) cleaning-decision coverage: the composite C4/Gopher
  * quality gate (the keep/drop verdict the earlier signal queries feed),
  * URL canonicalization, and bigram LM scoring. */
object LlmExt5 {

  /** q87 — E4: the composite quality KEEP decision. The corpus plants
    * three failure modes with identical string construction on both
    * engines — too-short docs (%13), symbol spam (%11), long-word
    * garble (%17) — and the gate emits every rule verdict plus the
    * exact signals behind it. Ratios are exact int/int divisions,
    * deliberately UNROUNDED (q73's argument); the float thresholds are
    * CAST AS DOUBLE in the oracle so both engines compare in the
    * double domain. */
  val q87 = Declared(
    "q87_quality_gate", "E4",
    (s, dir) => {
      val planted = Tables.documents(s, dir).filter(col("doc_id") < 300)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, lit("tiny doc"))
            .when(col("doc_id") % 11 === 0,
              concat(col("text"), lit(" ### $$$ !!! ??? *** ### $$$ !!! ??? ***")))
            .when(col("doc_id") % 17 === 0,
              concat(col("text"), lit(" "), lit("z" * 40), lit(" "), lit("q" * 40)))
            .otherwise(col("text")).as("text"))
      TextAnalysis.qualityGate(planted, "text", "doc_id")
        .select(col("doc_id"),
          col("n_words").cast("long").as("n_words"),
          col("mean_word_len"), col("alpha_frac"),
          col("stop_hits").cast("long").as("stop_hits"),
          col("rule_len"), col("rule_word_len"), col("rule_alpha"),
          col("rule_stop"), col("keep"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 13 = 0 THEN 'tiny doc'
           |         WHEN doc_id % 11 = 0 THEN text || ' ### $$$ !!! ??? *** ### $$$ !!! ??? ***'
           |         WHEN doc_id % 17 = 0 THEN text || ' ' || repeat('z', 40) || ' ' || repeat('q', 40)
           |         ELSE text END AS text
           |  FROM documents WHERE doc_id < 300),
           |t AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM corpus),
           |s AS (SELECT doc_id,
           |        len(toks) AS n_words,
           |        CAST(CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS DOUBLE)
           |          / len(toks) AS mean_word_len,
           |        CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
           |          / len(toks) AS alpha_frac,
           |        len(list_filter(toks,
           |          x -> x IN ('the','and','of','to','a','in','is','that','it','for'))) AS stop_hits
           |      FROM t)
           |SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
           |  (n_words BETWEEN 20 AND 100000) AS rule_len,
           |  (mean_word_len BETWEEN CAST(2.0 AS DOUBLE) AND CAST(10.0 AS DOUBLE)) AS rule_word_len,
           |  (alpha_frac >= CAST(0.8 AS DOUBLE)) AS rule_alpha,
           |  (stop_hits >= 1) AS rule_stop,
           |  ((n_words BETWEEN 20 AND 100000)
           |   AND (mean_word_len BETWEEN CAST(2.0 AS DOUBLE) AND CAST(10.0 AS DOUBLE))
           |   AND (alpha_frac >= CAST(0.8 AS DOUBLE)) AND (stop_hits >= 1)) AS keep
           |FROM s ORDER BY doc_id""".stripMargin),
    "One scan-side projection per doc — no shuffle, no UDF; the gate is the decision " +
      "stage every signal query (q41/q47/q73) feeds, and at 100TB it costs one pass " +
      "over text bytes with full pushdown.")

  /** q89 — E7: URL canonicalization + URL-level dedup. Four raw
    * variants per resource are planted (case-mangled host, default
    * port, slash runs + fragment, tracking params in varying order) —
    * identical string construction on both engines — and must collapse
    * to one canonical key; the groups' counts and representatives are
    * compared. The oracle reruns every canonicalization regex under
    * RE2 with the 'g' flag (Spark's regexp_replace is global by
    * default; DuckDB's is per-first-match without it). */
  val q89 = Declared(
    "q89_url_canonicalize", "E7",
    (s, dir) => {
      val d = col("doc_id")
      val host = concat(lit("site"), (d % 20).cast("string"), lit(".example"))
      val p = (d % 10).cast("string")
      val q = (d % 5).cast("string")
      val raw = Tables.documents(s, dir).select(d.as("doc_id"),
        when(d % 4 === 0,
          concat(lit("https://"), host, lit("/p/"), p, lit("?q="), q))
          .when(d % 4 === 1,
            concat(lit("HTTPS://"), upper(host), lit(":443/p/"), p,
              lit("?utm_source=feed&q="), q))
          .when(d % 4 === 2,
            concat(lit("https://"), host, lit("//p//"), p, lit("/?q="), q,
              lit("&utm_campaign=x#top")))
          .otherwise(
            concat(lit("https://"), host, lit(":443/p/"), p, lit("?ref=tw&q="), q,
              lit("#frag"))).as("url"))
      raw.select(col("doc_id"), TextAnalysis.canonicalizeUrl(col("url")).as("canonical"))
        .groupBy(col("canonical"))
        .agg(count(lit(1)).as("n_raw"), min(col("doc_id")).as("kept_doc"))
        .orderBy(col("canonical"))
    },
    Some("""WITH raw AS (
           |  SELECT doc_id,
           |    CASE
           |      WHEN doc_id % 4 = 0 THEN
           |        'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example/p/' ||
           |        CAST(doc_id % 10 AS VARCHAR) || '?q=' || CAST(doc_id % 5 AS VARCHAR)
           |      WHEN doc_id % 4 = 1 THEN
           |        'HTTPS://' || upper('site' || CAST(doc_id % 20 AS VARCHAR) || '.example') ||
           |        ':443/p/' || CAST(doc_id % 10 AS VARCHAR) ||
           |        '?utm_source=feed&q=' || CAST(doc_id % 5 AS VARCHAR)
           |      WHEN doc_id % 4 = 2 THEN
           |        'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example//p//' ||
           |        CAST(doc_id % 10 AS VARCHAR) || '/?q=' || CAST(doc_id % 5 AS VARCHAR) ||
           |        '&utm_campaign=x#top'
           |      ELSE
           |        'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example:443/p/' ||
           |        CAST(doc_id % 10 AS VARCHAR) || '?ref=tw&q=' || CAST(doc_id % 5 AS VARCHAR) ||
           |        '#frag'
           |    END AS url
           |  FROM documents),
           |c AS (
           |  SELECT doc_id,
           |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
           |    regexp_replace(
           |      lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
           |      ':(80|443)$', '') AS host,
           |    regexp_replace(regexp_replace(
           |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
           |      '/+', '/', 'g'), '/+$', '') AS path1,
           |    regexp_replace(
           |      regexp_replace('&' || regexp_extract(url, '\?([^#]*)', 1),
           |        '&(utm_[a-z]+|fbclid|gclid|ref)=[^&]*', '', 'g'),
           |      '^&', '') AS qclean
           |  FROM raw),
           |k AS (
           |  SELECT doc_id,
           |    scheme || '://' || host ||
           |    (CASE WHEN path1 = '' THEN '/' ELSE path1 END) ||
           |    (CASE WHEN qclean = '' THEN ''
           |          ELSE '?' || array_to_string(list_sort(string_split(qclean, '&')), '&')
           |     END) AS canonical
           |  FROM c)
           |SELECT canonical, count(*) AS n_raw, min(doc_id) AS kept_doc
           |FROM k GROUP BY canonical
           |ORDER BY canonical""".stripMargin),
    "Pure scan-side canonicalization (regex chain, codegen'd) followed by one uniform " +
      "content-keyed agg — the canonical string is THE crawl dedup / frontier-merge key; " +
      "at 100TB group on xxhash64(canonical) to cut shuffle bytes.")

  /** q90 — E4: bigram conditional log-prob scoring (the word-order-
    * aware rung above q69's unigram filter). A scrambled twin of each
    * %9 doc is planted — same unigram profile, broken bigrams — and
    * must score strictly below well-ordered text. Micro-nat
    * quantization keeps the per-doc mean exact across engines. */
  val q90 = Declared(
    "q90_bigram_logprob", "E4",
    (s, dir) => {
      val base = Tables.documents(s, dir).filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      // deterministic scramble: reverse the token order of %9 docs
      val scrambled = base.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 900000).as("doc_id"),
          concat_ws(" ", reverse(split(col("text"), "\\s+"))).as("text"))
      TextAnalysis.bigramLogProb(base.unionByName(scrambled), "text", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id < 300
           |  UNION ALL
           |  SELECT doc_id + 900000,
           |    array_to_string(list_reverse(regexp_split_to_array(text, '\s+')), ' ')
           |  FROM documents WHERE doc_id < 300 AND doc_id % 9 = 0),
           |t AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM corpus),
           |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
           |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
           |             FROM t WHERE len(toks) >= 2)),
           |pf AS (SELECT w1, w2, count(*) AS c_pair FROM bg GROUP BY 1, 2),
           |hf AS (SELECT w1, count(*) AS c_head FROM bg GROUP BY 1),
           |s AS (SELECT doc_id,
           |        CAST(round(ln(CAST(c_pair AS DOUBLE) / c_head) * 1e6, 0) AS BIGINT) AS lp
           |      FROM bg JOIN pf USING (w1, w2) JOIN hf USING (w1))
           |SELECT doc_id, count(*) AS n_bigrams,
           |  round(CAST(sum(lp) AS DOUBLE) / count(*) / 1e6, 6) AS mean_logp
           |FROM s GROUP BY doc_id
           |ORDER BY doc_id""".stripMargin),
    "Same economics as q69 one rung up: a bigram explode cached for three consumers, " +
      "uniform content-keyed pair/head aggs, and Zipf-skewed score joins on common heads " +
      "(AQE skew-split) — the cheap word-order-aware gate before a real LM perplexity pass.")

  /** q101 — E4/F1: GROUP-leakage-safe train/val/test split — the split
    * key is the md5-derived bucket of the SOURCE (domain), not the
    * document, so every document of a domain lands in the same split
    * and near-duplicate boilerplate within a domain can never straddle
    * train/test. n_sources across the three rows must sum to the
    * total distinct source count (straddle-freedom made visible). */
  val q101 = Declared(
    "q101_group_split", "E4,F1",
    (s, dir) => {
      import graft.ext.{Curation, Dedup}
      Tables.documents(s, dir)
        .select(Curation.split(col("source"), 80, 10, Dedup.md5Hash60).as("split"),
          col("source"), col("n_chars"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"))
    },
    Some(s"""WITH h AS (
            |  SELECT source, n_chars,
            |         ${LlmExt2.duckMd5Hash60("source")} % 100 AS bucket
            |  FROM documents),
            |s AS (
            |  SELECT CASE WHEN bucket < 80 THEN 'train'
            |              WHEN bucket < 90 THEN 'val'
            |              ELSE 'test' END AS split, source, n_chars
            |  FROM h)
            |SELECT split, count(*) AS n_docs,
            |       count(DISTINCT source) AS n_sources,
            |       CAST(sum(n_chars) AS BIGINT) AS total_chars
            |FROM s GROUP BY split ORDER BY split""".stripMargin),
    "The split is a pure function of the group key: no shuffle to assign membership (scan-" +
      "side hash), and group atomicity holds under any re-shard or re-ingest. This is how " +
      "eval contamination through intra-domain boilerplate is prevented at 100TB — q63 " +
      "splits by document, this splits by provenance.")

  /** q107 — E7: temperature-flattened source mixing at α = 1/2. The
    * keep-rate √(n_min/n_s) uses only correctly-rounded IEEE ops (√, ÷,
    * ×, ⌊⌋), so the ppm thresholds — and therefore the exact surviving
    * document set — are identical on both engines; the md5 bucket makes
    * membership content-addressed. The oracle rebuilds rates and
    * membership from scratch in SQL. */
  val q107 = Declared(
    "q107_temperature_mix", "E7,F1",
    (s, dir) => {
      import graft.ext.Curation
      val kept = Curation.sqrtTemperatureSample(
        Tables.documents(s, dir), col("source"), col("text"))
      kept.groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
        .orderBy(col("source"))
    },
    Some(s"""WITH n AS (
            |  SELECT source, count(*) AS ns FROM documents GROUP BY source),
            |m AS (SELECT min(ns) AS nmin FROM n),
            |r AS (
            |  SELECT source,
            |         CAST(floor(sqrt(CAST(nmin AS DOUBLE) / ns) * 1000000) AS BIGINT)
            |           AS keep_ppm
            |  FROM n, m),
            |k AS (
            |  SELECT d.source, d.n_chars
            |  FROM documents d JOIN r ON d.source = r.source
            |  WHERE ${LlmExt2.duckMd5Hash60("d.text")} % 1000000 < r.keep_ppm)
            |SELECT source, count(*) AS n_kept,
            |       CAST(sum(n_chars) AS BIGINT) AS kept_chars
            |FROM k GROUP BY source ORDER BY source""".stripMargin),
    "Per-source counts are one partial-agg pass; the |sources|-row rate table broadcasts " +
      "back and the keep test is scan-side hash arithmetic — no shuffle touches the " +
      "documents themselves. The α=1/2 restriction keeps the decision libm-free, hence " +
      "bit-reproducible across engines and platforms forever.")

  /** q119 — E1/E2/E4/E7 capstone: the WHOLE curation DAG in one
    * oracle-gated query — plant (tiny docs %13, near-dup twins
    * +100000, exact copies +200000) → normalize (lower) → token-count
    * quality gate → exact dedup (min-id canonical) → MinHash-LSH
    * near-dup pairs → connected components → canonical keep → content-
    * hash split → per-split totals. Every stage is individually proven
    * (q40/q45/q63/q70/q87); this row proves the COMPOSITION: the
    * oracle rebuilds the full chain in SQL, closing the near-dup pairs
    * with the recursive transitive closure. Same LSH parameters and
    * corpus family as q70, whose green row established exact candidate
    * recall on these planted pairs. */
  val q119 = Declared(
    "q119_corpus_e2e", "E1,E2,E4,E7,C1",
    (s, dir) => {
      import graft.ext.{Curation, Dedup, Graph}
      import org.apache.spark.sql.expressions.Window
      val base = Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, lit("tiny doc"))
            .otherwise(col("text")).as("text"))
      val corpus = base
        .unionByName(base.select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" mutationtoken")).as("text")))
        .unionByName(base.select((col("doc_id") + 200000).as("doc_id"), col("text")))
        .select(col("doc_id"), lower(col("text")).as("text"))
        .withColumn("n_tokens",
          length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
        .filter(col("n_tokens") >= 5)
      val minIds = corpus.groupBy(col("text")).agg(min(col("doc_id")).as("keep_id"))
      // cached: three consumers read this frame (signature build,
      // Jaccard-verify shingles, canonical-keep join) — uncached, the
      // scan + gate + dedup join would re-execute per consumer. The
      // driver's Verify/Bench release operator caches between queries.
      val afterExact = graft.core.OperatorCaches.cached(
        corpus.join(minIds, "text")
          .filter(col("doc_id") === col("keep_id"))
          .select(col("doc_id"), col("text"), col("n_tokens")))
      val pairs = Dedup.minhashNearDuplicates(afterExact, "text", "doc_id",
        shingleSize = 3, numHashes = 16, bands = 16, threshold = 0.8)
      val clusters = Graph.dedupClusters(pairs, "id_a", "id_b")
      afterExact
        .join(clusters.select(col("node").as("doc_id"), col("is_canonical")),
          Seq("doc_id"), "left")
        .filter(col("is_canonical").isNull || col("is_canonical"))
        .select(Curation.split(col("text"), 80, 10, Dedup.md5Hash60).as("split"),
          col("n_tokens"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy(col("split"))
    },
    Some(s"""WITH RECURSIVE base AS (
            |  SELECT doc_id,
            |         CASE WHEN doc_id % 13 = 0 THEN 'tiny doc' ELSE text END AS text
            |  FROM documents WHERE doc_id < 100),
            |corpus0 AS (
            |  SELECT doc_id, lower(text) AS text FROM base
            |  UNION ALL
            |  SELECT doc_id + 100000, lower(text || ' mutationtoken') FROM base
            |  UNION ALL
            |  SELECT doc_id + 200000, lower(text) FROM base),
            |gated AS (
            |  SELECT doc_id, text,
            |         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
            |  FROM corpus0
            |  WHERE length(text) - length(replace(text, ' ', '')) + 1 >= 5),
            |afterexact AS (
            |  SELECT g.doc_id, g.text, g.n_tokens
            |  FROM gated g
            |  JOIN (SELECT text, min(doc_id) AS keep_id FROM gated GROUP BY text) k
            |    ON g.text = k.text AND g.doc_id = k.keep_id),
            |t AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM afterexact),
            |st AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 2 + 1)) AS i
            |       FROM t WHERE len(toks) >= 3),
            |sh AS (SELECT DISTINCT doc_id,
            |         array_to_string(list_slice(toks, i, i + 2), ' ') AS shingle
            |       FROM st),
            |c AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            |i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
            |      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            |      GROUP BY 1, 2),
            |p AS (
            |  SELECT id_a, id_b
            |  FROM i JOIN c ca ON i.id_a = ca.doc_id JOIN c cb ON i.id_b = cb.doc_id
            |  WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.8),
            |e AS (SELECT id_a AS a, id_b AS b FROM p
            |      UNION ALL SELECT id_b, id_a FROM p),
            |reach AS (
            |  SELECT a AS node, a AS comp FROM e
            |  UNION
            |  SELECT e.a, reach.comp FROM e JOIN reach ON reach.node = e.b),
            |comp AS (SELECT node, min(comp) AS component FROM reach GROUP BY node),
            |kept AS (
            |  SELECT a.doc_id, a.text, a.n_tokens
            |  FROM afterexact a LEFT JOIN comp ON a.doc_id = comp.node
            |  WHERE comp.node IS NULL OR comp.component = a.doc_id),
            |h AS (
            |  SELECT n_tokens, ${LlmExt2.duckMd5Hash60("text")} % 100 AS bucket
            |  FROM kept)
            |SELECT CASE WHEN bucket < 80 THEN 'train'
            |            WHEN bucket < 90 THEN 'val'
            |            ELSE 'test' END AS split,
            |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
            |FROM h GROUP BY 1 ORDER BY 1""".stripMargin),
    "The composition inherits each stage's scale shape: scan-side gate, content-hash " +
      "dedup shuffle, banded LSH equi-joins, O(log diameter) component rounds, scan-side " +
      "split hash, one final tiny agg. No stage materializes a pair space or collects to " +
      "the driver — composing the operators composes their 100TB stories.")

  /** q124 — E4/F7: the feature-HASHING trick (hashing vectorizer) —
    * token counts folded into a fixed 8-bucket space by content hash,
    * one row per document with explicit bucket columns. The fixed
    * output dimensionality regardless of vocabulary size is the whole
    * point at scale: no vocabulary dictionary to build, broadcast or
    * keep consistent across batches. Buckets use the md5-derived hash
    * both engines can compute. */
  val q124 = Declared(
    "q124_feature_hash", "E4,F7",
    (s, dir) => {
      import graft.ext.Dedup
      val toks = Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
        .select(col("doc_id"), pmod(Dedup.md5Hash60(col("tok")), lit(8)).as("b"))
      val buckets = (0 until 8).map(i =>
        sum(when(col("b") === i, 1L).otherwise(0L)).as(s"b$i"))
      toks.groupBy(col("doc_id")).agg(buckets.head, buckets.tail: _*)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH t AS (
            |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
            |  FROM documents WHERE doc_id < 200),
            |b AS (
            |  SELECT doc_id, ${LlmExt2.duckMd5Hash60("tok")} % 8 AS b
            |  FROM t WHERE length(tok) > 0)
            |SELECT doc_id,
            |  ${(0 until 8).map(i =>
                 s"CAST(count(*) FILTER (WHERE b = $i) AS BIGINT) AS b$i")
                 .mkString(",\n            |  ")}
            |FROM b GROUP BY doc_id
            |ORDER BY doc_id""".stripMargin),
    "One explode + ONE conditional-agg pass keyed on doc_id (the 8 buckets are columns, " +
      "not rows — no pivot discovery job, no second shuffle). Output width is fixed by " +
      "the bucket count, never the vocabulary: the property that lets 100TB of text " +
      "vectorize without a dictionary build.")

  val all: Seq[Declared] = Seq(q87, q89, q90, q101, q107, q119, q124)
}
