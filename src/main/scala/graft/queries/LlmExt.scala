package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{OperatorCaches, Tables}
import graft.ext.{Dedup, Similarity, TextAnalysis}

/** LLM-data-pipeline extension coverage (SURVEY.md §2.12: E1-E4) over
  * `documents` and `embeddings`. */
object LlmExt {

  /** q40 — E1: exact dedup bookkeeping on content hash (sha256 parity
    * between Spark sha2 and DuckDB sha256). */
  val q40 = Declared(
    "q40_exact_dedup", "E1,U2",
    (s, dir) => {
      Dedup.exact(Tables.documents(s, dir), "text", "doc_id")
        .select(col("doc_id"), col("content_hash"), col("dup_group_size"), col("is_canonical"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, sha256(text) AS content_hash,
           |  count(*) OVER (PARTITION BY sha256(text)) AS dup_group_size,
           |  doc_id = min(doc_id) OVER (PARTITION BY sha256(text)) AS is_canonical
           |FROM documents
           |ORDER BY doc_id""".stripMargin),
    "Hash-partitioned window; content hashes are uniform keys — no skew at any corpus size.")

  /** q41 — E4: per-document token statistics (portable split-free
    * arithmetic: counts derived from length/replace so both engines
    * compute identical integers). */
  val q41 = Declared(
    "q41_text_stats", "E4",
    (s, dir) => {
      val t = col("text")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          length(t).as("n_chars_calc"),
          (length(t) - length(regexp_replace(t, " ", "")) + 1).as("n_tokens"),
          round((length(regexp_replace(t, " ", "")).cast("double")) /
            (length(t) - length(regexp_replace(t, " ", "")) + 1), 6).as("mean_word_len"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang, length(text) AS n_chars_calc,
           |  length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
           |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
           |    / (length(text) - length(replace(text, ' ', '')) + 1), 6) AS mean_word_len
           |FROM documents
           |ORDER BY doc_id""".stripMargin),
    "Scan-only map stage; at 100TB this is the cheap first pass that feeds quality filters.")

  /** q42 — E4: corpus profile by language × source. */
  val q42 = Declared(
    "q42_lang_profile", "E4,A1",
    (s, dir) => {
      Tables.documents(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          (round(sum(col("n_chars")), 2) / count(col("n_chars"))).as("mean_chars"))
        .orderBy(col("lang"), col("source"))
    },
    Some("""SELECT lang, source, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
           |  round(sum(n_chars), 2) / count(n_chars) AS mean_chars
           |FROM documents
           |GROUP BY lang, source
           |ORDER BY lang, source""".stripMargin),
    "Classic partial-agg reduction; output bounded by |lang|×|source|.")

  /** q43 — E2: exact pairwise token-set Jaccard via explode+join (the
    * relational reduction of n-gram near-dup; bounded to a doc prefix
    * so the oracle's pair space stays small). */
  val q43 = Declared(
    "q43_ngram_jaccard", "E2",
    (s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 40)
      val pairs = docs.select(col("doc_id").as("id_a"))
        .crossJoin(docs.select(col("doc_id").as("id_b")))
        .filter(col("id_a") < col("id_b"))
      Dedup.verifyJaccard(docs, "text", "doc_id", pairs, shingleSize = 1)
        .filter(col("jaccard") >= 0.62)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH d AS (
           |  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |  FROM documents WHERE doc_id < 40),
           |c AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
           |i AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
           |  FROM d a JOIN d b ON a.w = b.w AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT id_a, id_b,
           |  round(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter), 6) AS jaccard
           |FROM i JOIN c ca ON i.id_a = ca.doc_id JOIN c cb ON i.id_b = cb.doc_id
           |WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.62
           |ORDER BY id_a, id_b""".stripMargin),
    "Candidate generation must NOT be this crossJoin at scale — that's what MinHash LSH (q45) " +
      "is for; this query is the exact-verification kernel both paths share.")

  /** q44 — E3: brute-force cosine top-k against one query vector.
    * Dot products fold in index order in both engines → bit-identical
    * before rounding. */
  val q44 = Declared(
    "q44_cosine_topk", "E3",
    (s, dir) => {
      val q = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      Similarity.topKCosine(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        "embedding", "vec_id", q, k = 10)
        .select(col("vec_id"), round(col("cosine"), 6).as("cosine"))
    },
    Some("""WITH q AS (
           |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           |  FROM embeddings WHERE vec_id = 0),
           |scored AS (
           |  SELECT vec_id,
           |    list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qv)
           |      / (sqrt(list_dot_product(qv, qv))
           |         * sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
           |                                 list_transform(embedding, x -> CAST(x AS DOUBLE))))) AS c
           |  FROM embeddings, q WHERE vec_id <> 0)
           |SELECT vec_id, round(c, 6) AS cosine
           |FROM scored
           |ORDER BY c DESC, vec_id ASC
           |LIMIT 10""".stripMargin),
    "One scan + TakeOrdered (per-partition k-heaps). The LSH-bucketed variant " +
      "(Similarity.lshTopKCosine) prunes candidates 2^bits× for the 100TB regime.")

  /** q45 — E2: MinHash-LSH near-dup detection. Inputs are documents
    * plus mutated copies (one word appended, id+100000) so true
    * near-dups exist. The ORACLE is the exact thresholded Jaccard pair
    * set (DuckDB computes all-pairs ground truth at oracle scale) — so
    * a green row certifies 100% LSH recall AND precision on this
    * corpus, not just that the query ran. Banding/hashing stays
    * engine-internal; the deterministic corpus makes the recall
    * contract exact. DedupSpec pins the same property on planted pairs. */
  val q45 = Declared(
    "q45_minhash_lsh", "E2",
    (s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      val mutated = docs.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" mutationtoken")).as("text"))
      // 16 bands × 1 row: a qualifying pair (jaccard >= 0.8) escapes
      // every band with probability (1-0.8)^16 ≈ 7e-12 — recall is
      // effectively structural at ANY scale factor, which is what the
      // equality-to-ground-truth oracle asserts. (4 rows/band, the
      // low-candidate production tuning, missed 4 of 116 true pairs at
      // sf0.001.) Precision is exact either way: candidates are
      // verified against true Jaccard before the threshold.
      Dedup.minhashNearDuplicates(docs.unionByName(mutated),
        "text", "doc_id", shingleSize = 3, numHashes = 16, bands = 16, threshold = 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id < 100
           |  UNION ALL
           |  SELECT doc_id + 100000, text || ' mutationtoken' FROM documents WHERE doc_id < 100),
           |t AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM corpus),
           |st AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 2 + 1)) AS i
           |       FROM t WHERE len(toks) >= 3),
           |sh AS (SELECT DISTINCT doc_id,
           |         array_to_string(list_slice(toks, i, i + 2), ' ') AS shingle
           |       FROM st),
           |c AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           |i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
           |      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           |      GROUP BY 1, 2)
           |SELECT id_a, id_b,
           |  round(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter), 6) AS jaccard
           |FROM i JOIN c ca ON i.id_a = ca.doc_id JOIN c cb ON i.id_b = cb.doc_id
           |WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.8
           |ORDER BY id_a, id_b""".stripMargin),
    "Shingle explode → per-doc signature agg → band equi-join: the pair space never " +
      "materializes; every shuffle key (band hash) is uniform. The oracle's all-pairs " +
      "crossJoin exists ONLY on the DuckDB side as ground truth.")

  /** q46 — E2: SimHash fingerprints + hamming near-dup candidates on
    * the planted near-dup corpus. Runs on the PORTABLE 60-bit
    * md5-prefix token hash (Dedup.md5Hash60) so DuckDB can recompute
    * the ENTIRE pipeline — token hash (nibble arithmetic over the md5
    * hex), per-bit ±1 sums, sign→fingerprint, 15-bit chunk blocking,
    * hamming verify — making every emitted pair AND its hamming value
    * oracle-exact. The xxhash64/64-bit variant stays the production
    * default (DedupSpec pins it). */
  val q46 = Declared(
    "q46_simhash", "E2",
    (s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      val mutated = docs.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"))
      Dedup.simhashNearDuplicates(docs.unionByName(mutated), "text", "doc_id",
        maxDistance = 3, tokenHash = Dedup.md5Hash60, nBits = 60)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id < 100
           |  UNION ALL
           |  SELECT doc_id + 100000, text || ' zz' FROM documents WHERE doc_id < 100),
           |tok AS (SELECT DISTINCT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |        FROM corpus),
           |th AS (
           |  SELECT doc_id, w,
           |    CAST(sum(CAST(strpos('0123456789abcdef', substr(md5(w), i, 1)) - 1 AS BIGINT)
           |             << ((15 - i) * 4)) AS BIGINT) AS h
           |  FROM tok CROSS JOIN (SELECT unnest(range(1, 16)) AS i) idx
           |  GROUP BY doc_id, w),
           |bits AS (
           |  SELECT doc_id, b,
           |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
           |  FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bs
           |  GROUP BY doc_id, b),
           |fp AS (
           |  SELECT doc_id,
           |    CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS fp
           |  FROM bits GROUP BY doc_id),
           |ch AS (
           |  SELECT doc_id, fp, c, (fp >> (c * 15)) & 32767 AS cv
           |  FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS c) cs),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           |    CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
           |  FROM ch a JOIN ch b ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id)
           |SELECT id_a, id_b, hamming FROM cand
           |WHERE hamming <= 3
           |ORDER BY id_a, id_b""".stripMargin),
    "Fingerprint agg + 15-bit chunk blocking (pigeonhole ≤3 bit flips): " +
      "4 rows per doc, equi-join on chunk value — linear in corpus size.")

  /** q47 — E4: language-ID heuristic vs the labeled lang column —
    * accuracy profile per true language. The langId predicate is pure
    * integer-ratio arithmetic, so the oracle transliterates it: per
    * language, hits/tokens as an exact int/int IEEE division; argmax
    * with Spark's array_max(struct) tie-break (equal scores → the
    * lexicographically LARGER lang wins, hence the fr→es→en→de CASE
    * order); 'und' below the 0.02 floor. */
  val q47 = Declared(
    "q47_lang_id", "E4",
    (s, dir) => {
      Tables.documents(s, dir)
        // tokenize in a named projection: the split runs once per row,
        // not once per stopword filter (see langIdFromTokens)
        .select(col("lang"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("lang"), TextAnalysis.langIdFromTokens(col("toks")).as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred_lang"))
    },
    Some {
      def score(l: String): String = {
        val words = TextAnalysis.stopwords(l).map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(toks, t -> list_contains([$words], t))) AS DOUBLE)" +
          s" / greatest(len(toks), 1) AS s_$l"
      }
      s"""WITH t AS (SELECT lang, regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents),
         |s AS (SELECT lang, ${score("de")}, ${score("en")}, ${score("es")}, ${score("fr")}
         |      FROM t),
         |p AS (
         |  SELECT lang,
         |    CASE WHEN greatest(s_de, s_en, s_es, s_fr) < 0.02 THEN 'und'
         |         WHEN s_fr >= greatest(s_de, s_en, s_es) THEN 'fr'
         |         WHEN s_es >= greatest(s_de, s_en) THEN 'es'
         |         WHEN s_en >= s_de THEN 'en'
         |         ELSE 'de' END AS pred_lang
         |  FROM s)
         |SELECT lang, pred_lang, count(*) AS n
         |FROM p GROUP BY lang, pred_lang
         |ORDER BY lang, pred_lang""".stripMargin
    },
    "Pure scan-side expression; confusion-matrix agg output bounded by |langs|².")

  /** q58 — E3 scale path under the oracle gate: IVF index (k-means in
    * DataFrame ops) probed at nProbe = nCentroids, which provably
    * degrades to exact brute-force — so the brute SQL is its oracle.
    * A partial probe (the 100 TB configuration) is the same plan minus
    * clusters; SimilaritySpec pins partial ≡ brute on planted data. */
  val q58 = Declared(
    "q58_ann_ivf_fullprobe", "E3",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") =!= 0)
      val qv = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      // the declared query rebuilds the index EVERY run (production
      // builds once, probes many); one Lloyd iteration over 4 centroids
      // exercises the full build path at bench-friendly cost — full
      // probe is exact regardless of centroid quality
      val (indexed, centroids) = Similarity.ivfIndex(
        emb, "embedding", "vec_id", dim = qv.length, nCentroids = 4, iterations = 1)
      Similarity.ivfTopKCosine(indexed, centroids, "embedding", "vec_id",
        qv, k = 10, nProbe = 4)
        .select(col("vec_id"), round(col("cosine"), 6).as("cosine"))
    },
    Some("""WITH q AS (
           |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           |  FROM embeddings WHERE vec_id = 0),
           |scored AS (
           |  SELECT vec_id,
           |    list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qv)
           |      / (sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
           |                               list_transform(embedding, x -> CAST(x AS DOUBLE))))
           |         * sqrt(list_dot_product(qv, qv))) AS c
           |  FROM embeddings, q WHERE vec_id <> 0)
           |SELECT vec_id, round(c, 6) AS cosine
           |FROM scored
           |ORDER BY c DESC, vec_id ASC
           |LIMIT 10""".stripMargin),
    "The cluster column is the partition key at 100TB: a real probe touches " +
      "nProbe/nCentroids of the data; full probe = correctness proof, not the scale config.")

  /** q59 — E3 batch form: top-3 neighbours for EVERY query row (small
    * query side broadcast, ranking window per query). */
  val q59 = Declared(
    "q59_ann_batch", "E3,W2",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.topKCosineBatch(
        emb.filter(col("vec_id") >= 5), emb.filter(col("vec_id") < 5),
        "embedding", "vec_id", k = 3)
        .select(col("query_id"), col("item_id"), col("rank"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH e AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings),
           |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
           |i AS (SELECT vec_id AS item_id, v AS iv FROM e WHERE vec_id >= 5),
           |scored AS (
           |  SELECT query_id, item_id,
           |    list_dot_product(iv, qv)
           |      / (sqrt(list_dot_product(iv, iv)) * sqrt(list_dot_product(qv, qv))) AS c
           |  FROM i CROSS JOIN q),
           |ranked AS (
           |  SELECT query_id, item_id, c,
           |    row_number() OVER (PARTITION BY query_id ORDER BY c DESC, item_id ASC) AS rank
           |  FROM scored)
           |SELECT query_id, item_id, CAST(rank AS INT) AS rank, round(c, 6) AS cosine
           |FROM ranked WHERE rank <= 3
           |ORDER BY query_id, rank""".stripMargin),
    "Query side broadcasts (bounded); scoring is a codegen'd map over the item scan; " +
      "one shuffle for the per-query ranking window — scales with |items|, not pairs.")

  /** q61 — E2/E3: embedding-cosine near-dup pairs. The corpus plants
    * near-dups (v → 1.01·v + 0.005, cosine ≈ 0.998) with identical
    * float→double arithmetic on both engines; banded sign-LSH recall
    * is structural at threshold 0.99 (see cosineNearDuplicates), so
    * the DuckDB all-pairs ground truth is the exact oracle. */
  val q61 = Declared(
    "q61_embed_near_dup", "E2,E3",
    (s, dir) => {
      // bounded corpus — the correctness kernel (q43's pattern); the
      // operator itself is row-linear and the scale note carries the
      // 100 TB story
      val base = Tables.embeddings(s, dir).filter(col("vec_id") < 100)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val dim = base.select(size(col("embedding"))).head().getInt(0)
      val mutated = base.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.01) + lit(0.005)).as("embedding"))
      Similarity.cosineNearDuplicates(base.unionByName(mutated),
        "embedding", "vec_id", threshold = 0.99, dim = dim)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH base AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings WHERE vec_id < 100),
           |corpus AS (
           |  SELECT vec_id, v FROM base
           |  UNION ALL
           |  SELECT vec_id + 100000, list_transform(v, x -> x * 1.01 + 0.005) FROM base),
           |pairs AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |    list_dot_product(a.v, b.v)
           |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS c
           |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
           |SELECT id_a, id_b, round(c, 6) AS cosine
           |FROM pairs WHERE c >= 0.99
           |ORDER BY id_a, id_b""".stripMargin),
    "Candidates from an equi-join on (band, bucket) — the O(n²) pair space exists only " +
      "in the ORACLE; every shuffle key is a uniform hash of vector signs.")

  /** q51 — composite corpus pipeline (the E1+E4 shape of a real
    * training-data job): quality gate → canonical-only dedup → per-lang
    * profile, all in one declarative plan. */
  val q51 = Declared(
    "q51_corpus_pipeline", "E1,E4,A1",
    (s, dir) => {
      val t = col("text")
      val nToks = length(t) - length(regexp_replace(t, " ", "")) + 1
      val gated = Tables.documents(s, dir)
        .filter(col("n_chars").between(150, 1500) && nToks >= 20)
      Dedup.exact(gated, "text", "doc_id")
        .filter(col("is_canonical"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          (round(sum(col("n_chars")), 2) / count(col("n_chars"))).as("mean_chars"))
        .orderBy(col("lang"))
    },
    Some("""WITH gated AS (
           |  SELECT * FROM documents
           |  WHERE n_chars BETWEEN 150 AND 1500
           |    AND length(text) - length(replace(text, ' ', '')) + 1 >= 20),
           |canon AS (
           |  SELECT * FROM gated
           |  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY sha256(text)))
           |SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
           |  round(sum(n_chars), 2) / count(n_chars) AS mean_chars
           |FROM canon
           |GROUP BY lang
           |ORDER BY lang""".stripMargin),
    "Quality gate is scan-side (pushdown-friendly arithmetic); dedup window shuffles on the " +
      "content hash; final agg output bounded by |langs| — the canonical 100TB corpus-prep shape.")

  /** q55 — partial-overlap (contamination) detection via rolling
    * 20-token chunks, stride 10: docs sharing any aligned chunk pair
    * up. The corpus plants plagiarized composites (prefix of doc i +
    * middle of doc i+1) with identical string construction on both
    * engines. The relational reduction of
    * `TextAnalysis.chunkFingerprints` (hash-free so DuckDB can check). */
  val q55 = Declared(
    "q55_chunk_overlap", "E2,E4",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = docs.filter(col("doc_id") < 60).select(col("doc_id"), col("text"))
      val a = docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("aid"), col("text").as("atext"))
      val b = docs.select(col("doc_id").as("bid"), col("text").as("btext"))
      val planted = a.join(b, col("bid") === col("aid") + 1)
        .select((col("aid") + 200000).as("doc_id"),
          concat(substring(col("atext"), 1, 300), lit(" "),
            substring(col("btext"), 100, 200)).as("text"))
      val corpus = base.unionByName(planted)
      val toks = corpus.select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
        .filter(size(col("toks")) >= 20)
      // self-join keys on the chunk's xxhash64 FINGERPRINT, not the raw
      // 20-token string — ~10× fewer shuffle bytes (the scale note's
      // prescription); 64-bit collisions are vanishing at any corpus
      // size where this plan is sane, and the oracle (string join)
      // would catch one
      // cached: both self-join sides read the chunk fingerprints
      val chunks0 = toks
        .withColumn("st", explode(sequence(lit(1), greatest(size(col("toks")) - 19, lit(1)), lit(10))))
        .select(col("doc_id"),
          xxhash64(concat_ws(" ", slice(col("toks"), col("st"), lit(20)))).as("chunk_h"))
      val chunks = OperatorCaches.cached(chunks0)
      val ca = chunks.select(col("doc_id").as("id_a"), col("chunk_h"))
      val cb = chunks.select(col("doc_id").as("id_b"), col("chunk_h"))
      ca.join(cb, Seq("chunk_h")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id < 60
           |  UNION ALL
           |  SELECT a.doc_id + 200000, substr(a.text, 1, 300) || ' ' || substr(b.text, 100, 200)
           |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
           |  WHERE a.doc_id < 20),
           |t AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM corpus),
           |st AS (SELECT doc_id, toks,
           |         unnest(range(1, greatest(len(toks) - 19, 1) + 1, 10)) AS s
           |       FROM t WHERE len(toks) >= 20),
           |c AS (SELECT doc_id, array_to_string(list_slice(toks, s, s + 19), ' ') AS chunk FROM st)
           |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |FROM c a JOIN c b ON a.chunk = b.chunk AND a.doc_id < b.doc_id
           |ORDER BY id_a, id_b""".stripMargin),
    "Chunk explode is ~n_tokens/stride rows per doc; the self-join keys on chunk content " +
      "(uniform hash shuffle at scale — use chunkFingerprints' xxhash64 instead of raw strings " +
      "to cut shuffle bytes 10x at 100TB).")

  /** q104 — E2: EXACT set-similarity self-join via prefix filtering
    * (SSJoin/PPJoin): candidates must share one of the globally-rarest
    * (L − ⌈t·L⌉ + 1) shingles of each doc, then verify exactly. The
    * deterministic, recall-complete counterpart of q45's MinHash LSH —
    * the oracle is the ALL-PAIRS ground truth, so a green row proves
    * the prefix filter dropped nothing. Threshold 1/2 is held as a
    * rational: both engines compare inter·2 ≥ union·1 in integers. */
  val q104 = Declared(
    "q104_prefix_join", "E2",
    (s, dir) => {
      val base = Tables.documents(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id"), col("text"))
      val twins = base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 500000).as("doc_id"),
          concat(col("text"), lit(" prefixprobe")).as("text"))
      Dedup.prefixFilterJaccardPairs(base.unionByName(twins), "text", "doc_id",
          shingleSize = 3, tNum = 1, tDen = 2)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id < 150
           |  UNION ALL
           |  SELECT doc_id + 500000, text || ' prefixprobe' FROM documents
           |  WHERE doc_id < 150 AND doc_id % 5 = 0),
           |t AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM corpus),
           |st AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 2 + 1)) AS i
           |       FROM t WHERE len(toks) >= 3),
           |sh AS (SELECT DISTINCT doc_id,
           |         array_to_string(list_slice(toks, i, i + 2), ' ') AS shingle
           |       FROM st),
           |c AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           |i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
           |      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           |      GROUP BY 1, 2)
           |SELECT id_a, id_b,
           |  round(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter), 6) AS jaccard
           |FROM i JOIN c ca ON i.id_a = ca.doc_id JOIN c cb ON i.id_b = cb.doc_id
           |WHERE inter * 2 >= (ca.n + cb.n - inter) * 1
           |ORDER BY id_a, id_b""".stripMargin),
    "The df-rarest-first prefix order is the anti-skew device: candidate joins key on " +
      "hapax-end shingles, not stopwords, and prefixes shrink with the threshold. Exact " +
      "recall with a linear-ish candidate space — the choice between this and LSH at " +
      "100TB is a recall-contract choice, not a feasibility one.")

  val all: Seq[Declared] =
    Seq(q40, q41, q42, q43, q44, q45, q46, q47, q51, q55, q58, q59, q61, q104)
}
