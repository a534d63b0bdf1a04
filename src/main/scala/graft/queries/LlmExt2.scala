package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Curation, Dedup, TextAnalysis}

/** Round-3 corpus-curation + retrieval coverage (SURVEY.md §2.12
  * E3/E4/E7): winnowing fingerprints, deterministic dataset splits,
  * per-domain caps, TF-IDF, weighted stratified sampling, unigram
  * log-prob quality scores, and product-quantization ANN — the
  * assembly/retrieval steps of a training-data pipeline downstream of
  * cleaning/dedup. */
object LlmExt2 {

  /** The q46-proven DuckDB reconstruction of [[Dedup.md5Hash60]]: the
    * first 15 hex chars of md5 assembled nibble-by-nibble into a
    * BIGINT. `expr` must be a column expression over the enclosing
    * row; emits a correlated 15-row nibble aggregate. */
  private[queries] def duckMd5Hash60(expr: String): String =
    s"""(SELECT CAST(sum(CAST(strpos('0123456789abcdef',
       |    substr(md5($expr), i, 1)) - 1 AS BIGINT) << ((15 - i) * 4)) AS BIGINT)
       |  FROM (SELECT unnest(range(1, 16)) AS i))""".stripMargin

  /** q62 — E4: winnowing document fingerprints (MOSS): k=4-token grams,
    * window w=4, keep each window's min gram hash. Hash family is the
    * portable md5-60 so DuckDB reconstructs fingerprints exactly. */
  val q62 = Declared(
    "q62_winnowing", "E4,X4",
    (s, dir) => {
      TextAnalysis.winnowingFingerprints(
        Tables.documents(s, dir).filter(col("doc_id") < 200),
        "text", "doc_id", k = 4, w = 4, gramHash = Dedup.md5Hash60)
        .orderBy(col("doc_id"), col("fingerprint"))
    },
    Some(s"""WITH toks AS (
            |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
            |  FROM documents WHERE doc_id < 200),
            |grams AS (
            |  SELECT doc_id, len(t) - 3 AS ng,
            |         unnest(range(1, len(t) - 2)) AS p, t
            |  FROM toks WHERE len(t) >= 4),
            |gs AS (
            |  SELECT doc_id, ng, p, array_to_string(t[p:p+3], ' ') AS gram
            |  FROM grams),
            |th AS (
            |  SELECT doc_id, ng, p,
            |    CAST(sum(CAST(strpos('0123456789abcdef', substr(md5(gram), i, 1)) - 1 AS BIGINT)
            |             << ((15 - i) * 4)) AS BIGINT) AS h
            |  FROM gs CROSS JOIN (SELECT unnest(range(1, 16)) AS i) idx
            |  GROUP BY doc_id, ng, p),
            |wm AS (
            |  SELECT doc_id, ng, p,
            |    min(h) OVER (PARTITION BY doc_id ORDER BY p
            |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fingerprint
            |  FROM th)
            |SELECT DISTINCT doc_id, fingerprint FROM wm
            |WHERE p <= ng - 3 OR (ng < 4 AND p = 1)
            |ORDER BY doc_id, fingerprint""".stripMargin),
    "One doc-keyed window pass (explode + sliding min in a single sort); fingerprints are " +
      "content hashes — uniform keys for the downstream contamination join. Index is ~1/w " +
      "of the full k-gram set, the property that makes corpus-vs-benchmark checks feasible at 100TB.")

  /** q63 — E4: deterministic content-hash train/val/test split.
    * Content-addressed: exact duplicates always land in the same split
    * (no leakage through copies); membership survives re-sharding. */
  val q63 = Declared(
    "q63_hash_split", "E4,F1",
    (s, dir) => {
      val t = col("text")
      Tables.documents(s, dir)
        .select(
          Curation.split(t, 80, 10, Dedup.md5Hash60).as("split"),
          (length(t) - length(regexp_replace(t, " ", "")) + 1).as("n_tokens"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy(col("split"))
    },
    Some(s"""WITH h AS (
            |  SELECT ${duckMd5Hash60("text")} % 100 AS bucket,
            |         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
            |  FROM documents),
            |s AS (
            |  SELECT CASE WHEN bucket < 80 THEN 'train'
            |              WHEN bucket < 90 THEN 'val'
            |              ELSE 'test' END AS split, n_tokens
            |  FROM h)
            |SELECT split, count(*) AS n_docs,
            |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
            |FROM s GROUP BY split ORDER BY split""".stripMargin),
    "Scan-side hash + 3-group aggregate: map-side partials collapse everything before the " +
      "single tiny shuffle. The split is a pure function of content — reproducible on any " +
      "cluster layout, stable across re-ingests, duplicate-safe.")

  /** q64 — E4+W2: per-domain document cap (data mixing): keep the 50
    * largest docs per source, deterministically ranked. */
  val q64 = Declared(
    "q64_domain_cap", "E4,W2",
    (s, dir) => {
      Curation.capPerKey(Tables.documents(s, dir), col("source"),
        Seq(col("n_chars").desc, col("doc_id").asc), cap = 50)
        .select(col("source"), col("rank_in_key"), col("doc_id"), col("n_chars"))
        .orderBy(col("source"), col("rank_in_key"))
    },
    Some("""WITH ranked AS (
           |  SELECT source, doc_id, n_chars,
           |    CAST(row_number() OVER (PARTITION BY source
           |      ORDER BY n_chars DESC, doc_id) AS INT) AS rank_in_key
           |  FROM documents)
           |SELECT source, rank_in_key, doc_id, n_chars
           |FROM ranked WHERE rank_in_key <= 50
           |ORDER BY source, rank_in_key""".stripMargin),
    "Domain-keyed row_number window; the cap bounds every domain's output at 50 rows, so a " +
      "mega-domain costs one partition sort and emits a constant — the skew IS the use case.")

  /** q65 — E4: top-3 TF-IDF terms per document. Scores are rounded
    * before ranking so rank order is libm-independent. */
  val q65 = Declared(
    "q65_tfidf", "E4,A1,W2",
    (s, dir) => {
      Curation.tfIdfTopTerms(
        Tables.documents(s, dir).filter(col("doc_id") < 300),
        "text", "doc_id", topK = 3)
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
           |tok AS (
           |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
           |  FROM corpus),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
           |idf AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
           |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM corpus),
           |scored AS (
           |  SELECT tf.doc_id, tf.term,
           |         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / idf.df), 6) AS tfidf
           |  FROM tf JOIN idf USING (term) CROSS JOIN n),
           |ranked AS (
           |  SELECT doc_id, term, tfidf,
           |    CAST(row_number() OVER (PARTITION BY doc_id
           |      ORDER BY tfidf DESC, term) AS INT) AS rank
           |  FROM scored)
           |SELECT doc_id, rank, term, tfidf FROM ranked WHERE rank <= 3
           |ORDER BY doc_id, rank""".stripMargin),
    "tf/df are uniform content-keyed aggs with map-side partials; N is a 1-row broadcast. " +
      "The tf⋈df join on term is Zipf-skewed (stopwords hit every doc) — AQE skew-split " +
      "handles it; pre-salting the stopword band is the documented fallback at extreme vocab.")

  /** q68 — E7: weighted stratified sampling (data mixing): per-source
    * retention rates applied via the portable md5-60 content hash, so
    * DuckDB reproduces the exact kept set. The output is the mixed
    * corpus profile — what a mixture-weights config turns into. */
  val q68 = Declared(
    "q68_stratified_sample", "E4,F1",
    (s, dir) => {
      val t = col("text")
      Curation.stratifiedSample(Tables.documents(s, dir),
        col("source"), t,
        rates = Map("src0" -> 100, "src1" -> 50, "src2" -> 25),
        defaultPct = 10, hash = Dedup.md5Hash60)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("source"))
    },
    Some(s"""WITH h AS (
            |  SELECT source, n_chars, ${duckMd5Hash60("text")} % 100 AS bucket
            |  FROM documents),
            |kept AS (
            |  SELECT source, n_chars FROM h
            |  WHERE bucket < CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
            |                             WHEN 'src2' THEN 25 ELSE 10 END)
            |SELECT source, count(*) AS n_docs,
            |       CAST(sum(n_chars) AS BIGINT) AS total_chars
            |FROM kept GROUP BY source ORDER BY source""".stripMargin),
    "Scan-side hash predicate — no shuffle before the tiny profile agg; pushdown-friendly. " +
      "Content-hash membership makes the mixture reproducible on any layout and " +
      "duplicate-consistent; per-stratum retention converges to rate/100 by hash uniformity.")

  /** q69 — E4: unigram log-probability quality scores (perplexity
    * proxy). Token log-probs quantize to integer micro-nats so the
    * per-doc aggregation is exact and order-independent; the corpus
    * restriction keeps the oracle's token self-join bounded. */
  val q69 = Declared(
    "q69_unigram_logprob", "E4,A1",
    (s, dir) => {
      TextAnalysis.unigramLogProb(
        Tables.documents(s, dir).filter(col("doc_id") < 400),
        "text", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
           |tok AS (
           |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
           |  FROM corpus),
           |freq AS (SELECT term, count(*) AS n_t FROM tok GROUP BY term),
           |total AS (SELECT count(*) AS n_total FROM tok),
           |scored AS (
           |  SELECT tok.doc_id,
           |    CAST(round(ln(CAST(freq.n_t AS DOUBLE) / total.n_total) * 1e6, 0) AS BIGINT) AS logp_u
           |  FROM tok JOIN freq USING (term) CROSS JOIN total)
           |SELECT doc_id, count(*) AS n_tokens,
           |       round(CAST(sum(logp_u) AS DOUBLE) / count(*) / 1e6, 6) AS mean_logp
           |FROM scored GROUP BY doc_id
           |ORDER BY doc_id""".stripMargin),
    "The corpus IS the model: one uniform frequency agg + a 1-row broadcast N; the score " +
      "join on term is Zipf-skewed like TF-IDF (AQE skew-split). The score is the standard " +
      "first-pass quality gate before an actual LM perplexity filter at 100TB.")

  /** q67 — E3: product quantization under the oracle gate, via the
    * lossless construction (q58's trick adapted to PQ): the derived
    * corpus has exactly 4 distinct subvectors per subspace and the
    * first-k-by-id seeds cover all of them, so Lloyd converges to the
    * exact points, quantization error is zero, and the ADC distance
    * equals the exact squared L2 — which DuckDB computes from the same
    * integer arithmetic. Every value stays an exact small-integer
    * double on both engines; no rounding needed. */
  val q67 = Declared(
    "q67_pq_lossless", "E3",
    (s, dir) => {
      import graft.ext.Similarity
      val corpus = Tables.embeddings(s, dir).filter(col("vec_id") < 200)
        .select(col("vec_id"),
          transform(sequence(lit(0), lit(7)), d =>
            (((col("vec_id") % 4) * 31 + d * 7) % 23).cast("float")).as("embedding"))
      // one Lloyd iteration IS convergence here (seeds cover all 4
      // patterns; the mean of identical points is the point); the
      // 200-row corpus is cached across the 4 per-subspace trainings
      val (encoded, codebooks) = Similarity.pqIndex(
        graft.core.OperatorCaches.cached(corpus), "embedding", "vec_id",
        dim = 8, m = 4, k = 4, iterations = 1)
      val query = Array.tabulate(8)(d => ((d * 3) % 7).toFloat)
      Similarity.pqTopK(encoded, codebooks, "vec_id", query, topK = 12)
    },
    Some("""SELECT vec_id,
           |  CAST(list_sum(list_transform(range(0, 8), d ->
           |    CAST(((vec_id % 4) * 31 + d * 7) % 23 - (d * 3) % 7 AS DOUBLE)
           |      * CAST(((vec_id % 4) * 31 + d * 7) % 23 - (d * 3) % 7 AS DOUBLE)))
           |    AS DOUBLE) AS pq_d2
           |FROM embeddings WHERE vec_id < 200
           |ORDER BY pq_d2, vec_id LIMIT 12""".stripMargin),
    "PQ stores m byte-codes per vector instead of 4·dim bytes — the index that still fits " +
      "executor memory at 100TB. Search is m table lookups per row (driver-built LUT as plan " +
      "literals), a single scan-side projection + TakeOrdered; training reaches the driver " +
      "only through k codebook rows per subspace.")

  val all: Seq[Declared] = Seq(q62, q63, q64, q65, q67, q68, q69)
}
