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

  val all: Seq[Declared] = Seq(q87, q89, q90, q101, q107)
}
