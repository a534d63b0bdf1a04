package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Curation, Dedup, Graph, TextAnalysis}

/** Round-4 corpus-pipeline coverage (SURVEY.md §2.12 E2/E4/E7): dedup
  * clustering (connected components), line-level boilerplate removal,
  * PII redaction, Gopher-style repetition signals, BM25 retrieval
  * scoring, and Bloom-prefiltered benchmark decontamination — the
  * remaining cleaning/audit stages of a training-data pipeline. */
object LlmExt3 {

  /** q70 — E2: near-dup pairs → connected components → duplicate
    * clusters. The corpus is q45's (docs + mutated copies, exact
    * ground-truth pair set at threshold 0.8, where LSH recall is
    * structural); components then collapse transitive chains (A~B~C
    * with no A~C pair). The oracle recomputes the SAME pair set in SQL
    * and closes it with a recursive min-label CTE — so a green row
    * certifies the distributed label propagation against a full
    * transitive closure. */
  val q70 = Declared(
    "q70_dedup_components", "E2",
    (s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      val mutated = docs.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" mutationtoken")).as("text"))
      val pairs = Dedup.minhashNearDuplicates(docs.unionByName(mutated),
        "text", "doc_id", shingleSize = 3, numHashes = 16, bands = 16, threshold = 0.8)
      Graph.connectedComponents(pairs, "id_a", "id_b")
        .orderBy(col("node"))
    },
    Some("""WITH RECURSIVE corpus AS (
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
           |  SELECT e.a, reach.comp FROM e JOIN reach ON reach.node = e.b)
           |SELECT node, min(comp) AS component
           |FROM reach GROUP BY node
           |ORDER BY node""".stripMargin),
    "Label propagation with pointer doubling: O(log diameter) rounds, each one node-keyed " +
      "equi-join + agg; ONE scalar (the change count) reaches the driver per round. The " +
      "oracle's transitive closure exists only on the DuckDB side.")

  /** Part node ids live at +2^40 — beyond any TPC-H suppkey at any
    * scale factor, so the supplier and part namespaces cannot collide
    * (a small offset would silently merge nodes at large sf, and the
    * oracle, applying the same encoding, would never notice). */
  private val PartOffset = 1L << 40 // = 1099511627776, literal in the SQL

  /** q100 — E2+/E6: fixed-point integer PageRank (3 damped rounds) over
    * the supplier↔part co-purchase graph from lineitem — the
    * link-analysis primitive a crawl pipeline uses to prioritize its
    * frontier. Every rank is a 64-bit integer in micro-units with
    * explicit floor division, so Spark and DuckDB agree BIT-FOR-BIT
    * with no rounding escape hatch: long sums commute exactly, which is
    * the whole design point (a double formulation's low bits would
    * depend on reduce order and partitioning). The oracle unrolls the
    * three rounds as CTEs with DuckDB's `//` floor division. */
  val q100 = Declared(
    "q100_pagerank", "E2+,E6",
    (s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("src"),
          (col("l_partkey") + PartOffset).as("dst"))
      Graph.pageRank(edges, "src", "dst", iters = 3)
        .filter(col("node") < PartOffset) // report the supplier side
        .select(col("node").as("supplier"), col("rank_ppm"))
        .orderBy(col("supplier"))
    },
    Some("""WITH e0 AS (
           |  SELECT DISTINCT l_suppkey AS src, l_partkey + 1099511627776 AS dst
           |  FROM lineitem),
           |sym AS (
           |  SELECT src, dst FROM e0
           |  UNION
           |  SELECT dst AS src, src AS dst FROM e0),
           |deg AS (SELECT src AS node, count(*) AS deg FROM sym GROUP BY src),
           |r0 AS (SELECT node, deg, CAST(1000000 AS BIGINT) AS r FROM deg),
           |i1 AS (SELECT s.dst AS node, sum(r.r // r.deg) AS inflow
           |       FROM sym s JOIN r0 r ON s.src = r.node GROUP BY s.dst),
           |r1 AS (SELECT d.node, d.deg,
           |         CAST(150000 + (85 * coalesce(i.inflow, 0)) // 100 AS BIGINT) AS r
           |       FROM deg d LEFT JOIN i1 i ON d.node = i.node),
           |i2 AS (SELECT s.dst AS node, sum(r.r // r.deg) AS inflow
           |       FROM sym s JOIN r1 r ON s.src = r.node GROUP BY s.dst),
           |r2 AS (SELECT d.node, d.deg,
           |         CAST(150000 + (85 * coalesce(i.inflow, 0)) // 100 AS BIGINT) AS r
           |       FROM deg d LEFT JOIN i2 i ON d.node = i.node),
           |i3 AS (SELECT s.dst AS node, sum(r.r // r.deg) AS inflow
           |       FROM sym s JOIN r2 r ON s.src = r.node GROUP BY s.dst),
           |r3 AS (SELECT d.node, d.deg,
           |         CAST(150000 + (85 * coalesce(i.inflow, 0)) // 100 AS BIGINT) AS r
           |       FROM deg d LEFT JOIN i3 i ON d.node = i.node)
           |SELECT node AS supplier, r AS rank_ppm
           |FROM r3 WHERE node < 1099511627776
           |ORDER BY supplier""".stripMargin),
    "Fixed iteration count, zero per-round driver traffic: each round is one node-keyed " +
      "equi-join + one dst-keyed agg (uniform hash keys). " +
      "Integer micro-unit arithmetic makes rank snapshots " +
      "reproducible across any cluster layout — the property that lets two 1000-executor " +
      "runs diff each other at 100 TB. Ranks checkpoint every 8th round (plan-depth " +
      "bound for deep runs); 3 rounds chain as one lazy plan.")

  /** q71 — E7: line-level dedup (C4-style boilerplate removal). The
    * corpus plants a universal header/footer (removed), a mid-frequency
    * promo line (doc_id%7 → ~21 docs ≥ 10, removed), a rare promo line
    * (doc_id%30 → 5 docs < 10, kept) around each document's own text —
    * identical string construction on both engines, so the surviving
    * reassembled text is exactly comparable. */
  val q71 = Declared(
    "q71_line_dedup", "E7",
    (s, dir) => {
      val planted = Tables.documents(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id"), concat(
          lit("site header menu home about\n"),
          col("text"), lit("\n"),
          lit("promo block "), (col("doc_id") % 7).cast("string"), lit("\n"),
          lit("rare promo "), (col("doc_id") % 30).cast("string"), lit("\n"),
          lit("copyright footer all rights reserved")).as("text"))
      Curation.removeDuplicateLines(planted, "text", "doc_id", minDocFreq = 10)
        .orderBy(col("doc_id"))
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id,
           |    'site header menu home about' || chr(10) || text || chr(10) ||
           |    'promo block ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) ||
           |    'rare promo ' || CAST(doc_id % 30 AS VARCHAR) || chr(10) ||
           |    'copyright footer all rights reserved' AS text
           |  FROM documents WHERE doc_id < 150),
           |sp AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM corpus),
           |l AS (SELECT doc_id, unnest(range(1, len(lines) + 1)) AS pos, lines FROM sp),
           |ln AS (SELECT doc_id, pos, lines[pos] AS line FROM l),
           |ldf AS (SELECT line, count(DISTINCT doc_id) AS line_df FROM ln GROUP BY line),
           |kept AS (SELECT doc_id, pos, ln.line FROM ln JOIN ldf USING (line)
           |         WHERE line_df < 10)
           |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
           |FROM kept GROUP BY doc_id
           |ORDER BY doc_id""".stripMargin),
    "Line doc-frequency keys on line CONTENT (uniform hash; at 100TB key on xxhash64(line) " +
      "to cut shuffle bytes); boilerplate lines are the hot keys and AQE skew-split covers " +
      "the rejoin; reassembly is one doc-keyed shuffle.")

  /** q72 — E4: PII redaction + per-kind audit counts. Deterministic
    * PII is planted (email / IPv4 / phone per doc, a second email on
    * doc_id%3==0) with identical string construction on both engines;
    * the patterns are RE2-and-Java-compatible by construction
    * ([[TextAnalysis.piiPatterns]]), so the redacted text itself is
    * hash-compared, not just the counts. */
  val q72 = Declared(
    "q72_pii_redact", "E4",
    (s, dir) => {
      val aug = Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"), concat(
          col("text"),
          lit(" contact doc"), col("doc_id").cast("string"), lit("@mail.example.com ip 10."),
          (col("doc_id") % 250).cast("string"), lit(".0.7 phone 555-01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" alt doc"), col("doc_id").cast("string"), lit("@alt.example.org")))
            .otherwise(lit(""))).as("t"))
      aug.select(col("doc_id"),
        TextAnalysis.piiCount(col("t"), "email").as("n_emails"),
        TextAnalysis.piiCount(col("t"), "ipv4").as("n_ips"),
        TextAnalysis.piiCount(col("t"), "phone").as("n_phones"),
        TextAnalysis.redactPii(col("t")).as("redacted"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH aug AS (
           |  SELECT doc_id,
           |    text || ' contact doc' || CAST(doc_id AS VARCHAR) || '@mail.example.com ip 10.' ||
           |    CAST(doc_id % 250 AS VARCHAR) || '.0.7 phone 555-01' ||
           |    lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
           |    CASE WHEN doc_id % 3 = 0
           |         THEN ' alt doc' || CAST(doc_id AS VARCHAR) || '@alt.example.org'
           |         ELSE '' END AS t
           |  FROM documents WHERE doc_id < 200)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(t, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
           |  CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
           |  CAST(len(regexp_extract_all(t, '\b\d{3}-\d{4}\b')) AS INT) AS n_phones,
           |  regexp_replace(regexp_replace(regexp_replace(t,
           |    '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
           |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
           |    '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
           |FROM aug
           |ORDER BY doc_id""".stripMargin),
    "Pure scan-side regexp chain — codegen'd, no shuffle, pushdown-friendly; the privacy " +
      "scrub costs one pass over the text bytes regardless of corpus size.")

  /** q73 — E4: Gopher-style intra-document repetition signals over the
    * full documents table. Ratios are exact int/int IEEE divisions —
    * deliberately UNrounded (identical integer operands give
    * bit-identical doubles; rounding could land c/2^k exactly on a
    * tie boundary where engine rules differ). */
  val q73 = Declared(
    "q73_repetition", "E4",
    (s, dir) => {
      TextAnalysis.repetitionSignals(Tables.documents(s, dir), "text", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS (
           |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
           |  FROM documents),
           |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
           |ts AS (
           |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
           |    CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_token_frac,
           |    CAST(sum(c) - count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_token_frac
           |  FROM tc GROUP BY doc_id),
           |tl AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
           |       FROM documents),
           |bg AS (
           |  SELECT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS bg
           |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
           |        FROM tl WHERE len(toks) >= 2)),
           |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
           |bs AS (
           |  SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac
           |  FROM bc GROUP BY doc_id)
           |SELECT ts.doc_id, n_tokens, top_token_frac, dup_token_frac,
           |  coalesce(top_bigram_frac, 0.0) AS top_bigram_frac
           |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
           |ORDER BY ts.doc_id""".stripMargin),
    "Two doc-keyed aggregations (tokens, bigrams) with map-side partials; output one row " +
      "per doc — the canonical first-pass quality gate next to q41/q69 at 100TB.")

  /** q74 — E7: BM25 retrieval scores for a literal term query. Each
    * per-term contribution quantizes to an integer micro-unit BEFORE
    * the per-doc sum (float addition is order-dependent — the q69
    * lesson), so the score and the (score desc, id) order are exact on
    * both engines. Derived constants (k1+1, 1−b) are computed in Scala
    * and interpolated into the oracle via shortest-round-trip toString,
    * so both engines parse the SAME double. */
  val q74 = {
    val (k1, b) = (1.2, 0.75)
    Declared(
      "q74_bm25", "E7,A1",
      (s, dir) => {
        Curation.bm25Scores(
          Tables.documents(s, dir).filter(col("doc_id") < 300),
          "text", "doc_id", queryTerms = Seq("table", "fast", "join"), k1 = k1, b = b)
          .orderBy(col("score").desc, col("doc_id"))
      },
      Some(s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
              |tk AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks FROM corpus),
              |dl AS (SELECT doc_id, len(toks) AS dl FROM tk),
              |tok AS (SELECT doc_id, unnest(toks) AS term FROM tk),
              |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
              |       WHERE term IN ('table', 'fast', 'join') GROUP BY doc_id, term),
              |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
              |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
              |          FROM dl),
              |contrib AS (
              |  SELECT tf.doc_id,
              |    CAST(round(ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
              |      * tf.tf * ${k1 + 1} / (tf.tf + $k1 * (${1 - b} + $b * dl.dl / stats.avgdl))
              |      * 1e6, 0) AS BIGINT) AS cu
              |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
              |SELECT doc_id, round(CAST(sum(cu) AS DOUBLE) / 1e6, 6) AS score
              |FROM contrib GROUP BY doc_id
              |ORDER BY score DESC, doc_id""".stripMargin),
      "The term filter collapses the explode to |q| rows per doc BEFORE any shuffle; df and " +
        "corpus stats broadcast; the one real shuffle keys on doc id. The inverted-index " +
        "variant (pre-aggregated postings) is the same plan read from a bucketed term table.")
  }

  /** q75 — E7: benchmark decontamination. The corpus plants
    * plagiarized composites embedding benchmark text (q55's
    * construction); the Bloom sketch prunes scan-side and the exact
    * semi-join kills its false positives, so the plain exact-join SQL
    * is the oracle — a green row proves the sketch path changes cost,
    * not results. */
  val q75 = Declared(
    "q75_decontaminate", "E7",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val bench = docs.filter(col("doc_id") < 20).select(col("doc_id"), col("text"))
      val base = docs.filter(col("doc_id") >= 100 && col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      val a = docs.filter(col("doc_id") < 10)
        .select(col("doc_id").as("aid"), col("text").as("atext"))
      val bsrc = docs.select(col("doc_id").as("bid"), col("text").as("btext"))
      val planted = a.join(bsrc, col("bid") === col("aid") + 150)
        .select((col("aid") + 400000).as("doc_id"),
          concat(substring(col("btext"), 1, 150), lit(" "),
            substring(col("atext"), 1, 120)).as("text"))
      Curation.decontaminate(base.unionByName(planted), bench,
        "text", "doc_id", gramSize = 8, expectedItems = 100000, fpp = 0.01)
        .orderBy(col("doc_id"))
    },
    Some("""WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
           |corp AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id >= 100 AND doc_id < 300
           |  UNION ALL
           |  SELECT a.doc_id + 400000, substr(b.text, 1, 150) || ' ' || substr(a.text, 1, 120)
           |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 150
           |  WHERE a.doc_id < 10),
           |bt AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM bench),
           |bg AS (SELECT DISTINCT array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
           |       FROM (SELECT toks, unnest(range(1, len(toks) - 6)) AS i
           |             FROM bt WHERE len(toks) >= 8)),
           |ct AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM corp),
           |cg AS (SELECT DISTINCT doc_id,
           |         array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
           |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
           |             FROM ct WHERE len(toks) >= 8))
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
           |FROM cg JOIN bg USING (gram)
           |GROUP BY doc_id
           |ORDER BY doc_id""".stripMargin),
    "The benchmark side is eval-set-sized by definition: its gram sketch is driver-bounded " +
      "(O(expected items), NOT O(corpus)) and broadcasts once; the corpus gram stream prunes " +
      "to ~fpp scan-side BEFORE the only shuffle — the 100TB plan reads everything, shuffles " +
      "almost nothing.")

  /** q79 — E7: BM25 from an inverted-index postings table (the
    * query-MANY retrieval path). Same corpus, terms and ORACLE as q74:
    * a green row proves scoring from the index is bit-equal to scoring
    * from the corpus scan. The build-once artifact is written bucketed
    * by term at scale (CorpusCurationSpec proves the pruned, shuffle-free
    * lookup plan). */
  val q79 = Declared(
    "q79_bm25_indexed", "E7,A1",
    (s, dir) => {
      val corpus = Tables.documents(s, dir).filter(col("doc_id") < 300)
      val postings = Curation.buildPostings(corpus, "text", "doc_id")
      Curation.bm25FromPostings(postings, "doc_id",
        queryTerms = Seq("table", "fast", "join"), k1 = 1.2, b = 0.75)
        .orderBy(col("score").desc, col("doc_id"))
    },
    q74.oracle,
    "Build once (term-bucketed postings: one uniform content-keyed agg), query many: a " +
      "lookup touches |q| buckets, joins shuffle-free, and never rescans the corpus — " +
      "THE retrieval economics at 100TB. Bit-equality with the scan path is the oracle.")

  /** q80 — E7: TOKEN-budget sampling (mixing by token count, not doc
    * percentage): per-source budgets applied over a content-hash
    * deterministic order; every kept row carries its running token
    * total. Integer-only arithmetic on the portable md5-60 hash, so
    * DuckDB reproduces the exact kept set AND the running totals. */
  val q80 = Declared(
    "q80_token_budget", "E7,W1",
    (s, dir) => {
      Curation.tokenBudgetSample(Tables.documents(s, dir), col("source"),
        "text", "doc_id", budgets = Map("src0" -> 600L, "src1" -> 300L),
        defaultBudget = 150L, hash = Dedup.md5Hash60)
        .select(col("source"), col("doc_id"),
          col("n_tokens").cast("long").as("n_tokens"), col("cum_tokens"))
        .orderBy(col("source"), col("cum_tokens"), col("doc_id"))
    },
    Some(s"""WITH h AS (
            |  SELECT source, doc_id,
            |    CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS n_tokens,
            |    ${LlmExt2.duckMd5Hash60("text")} AS hh
            |  FROM documents),
            |c AS (
            |  SELECT source, doc_id, n_tokens,
            |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY hh, doc_id
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
            |  FROM h)
            |SELECT source, doc_id, n_tokens, cum_tokens
            |FROM c
            |WHERE cum_tokens - n_tokens <
            |  CASE source WHEN 'src0' THEN 600 WHEN 'src1' THEN 300 ELSE 150 END
            |ORDER BY source, cum_tokens, doc_id""".stripMargin),
    "One window pass keyed on the stratum (the per-domain-cap shape); the budget bounds " +
      "output tokens per source exactly — mixing configs talk in tokens, and this is the " +
      "operator that enforces them. Content-hash order = reproducible on any layout.")

  /** q81 — E7: sequence packing — documents dealt to shards by content
    * hash, greedily concatenated per shard, assigned (sequence number,
    * starting offset) for a fixed 512-token training-sequence length.
    * Integer-only; DuckDB reproduces every assignment exactly. */
  val q81 = Declared(
    "q81_sequence_pack", "E7,W1",
    (s, dir) => {
      Curation.packSequences(
        Tables.documents(s, dir).filter(col("doc_id") < 250),
        "text", "doc_id", seqLen = 512, nShards = 4, hash = Dedup.md5Hash60)
        .select(col("doc_id"), col("shard"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("seq_in_shard"), col("offset_in_seq"))
        .orderBy(col("shard"), col("seq_in_shard"), col("offset_in_seq"), col("doc_id"))
    },
    Some(s"""WITH h AS (
            |  SELECT doc_id,
            |    CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS n_tokens,
            |    ${LlmExt2.duckMd5Hash60("text")} AS hh
            |  FROM documents WHERE doc_id < 250),
            |c AS (
            |  SELECT doc_id, n_tokens, hh % 4 AS shard,
            |    CAST(sum(n_tokens) OVER (PARTITION BY hh % 4 ORDER BY hh, doc_id
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            |  FROM h)
            |SELECT doc_id, shard, n_tokens,
            |  (cum - n_tokens) // 512 AS seq_in_shard,
            |  (cum - n_tokens) % 512 AS offset_in_seq
            |FROM c
            |ORDER BY shard, seq_in_shard, offset_in_seq, doc_id""".stripMargin),
    "Sharding IS the scale story: global packing is sequential by nature; per-shard packing " +
      "is embarrassingly parallel, reproducible (shard and order are pure content " +
      "functions), and feeds the tokenizer one shard per task.")

  /** q82 — A1/E4: per-source OLS + Pearson correlation between doc
    * length (chars) and token count, via EXACT integer sums — the
    * corr()/regr_* builtins accumulate online (Welford) and are engine-
    * and order-dependent; closed-form over exact sums is bit-portable
    * UNROUNDED (division and sqrt are IEEE correctly-rounded). */
  val q82 = Declared(
    "q82_corr_ols", "A1,E4",
    (s, dir) => {
      val t = col("text")
      val d = Tables.documents(s, dir).select(col("source"),
        col("n_chars").as("x"),
        (length(t) - length(regexp_replace(t, " ", "")) + 1).as("y"))
      graft.ops.Aggregates.linearFitExact(d, Seq(col("source")), col("x"), col("y"))
        .orderBy(col("source"))
    },
    Some("""WITH d AS (
           |  SELECT source, n_chars AS x,
           |         length(text) - length(replace(text, ' ', '')) + 1 AS y
           |  FROM documents),
           |a AS (
           |  SELECT source, count(*) AS n,
           |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           |    CAST(sum(x * y) AS BIGINT) AS sxy,
           |    CAST(sum(x * x) AS BIGINT) AS sxx,
           |    CAST(sum(y * y) AS BIGINT) AS syy
           |  FROM d GROUP BY source),
           |f AS (
           |  SELECT source, n, sx, sy,
           |    CAST(n * sxy - sx * sy AS DOUBLE) AS covn,
           |    CAST(n * sxx - sx * sx AS DOUBLE) AS varxn,
           |    CAST(n * syy - sy * sy AS DOUBLE) AS varyn
           |  FROM a)
           |SELECT source, n,
           |  CASE WHEN varxn <> 0 THEN covn / varxn END AS slope,
           |  CASE WHEN varxn <> 0
           |       THEN (CAST(sy AS DOUBLE) - (covn / varxn) * sx) / n END AS intercept,
           |  CASE WHEN varxn <> 0 AND varyn <> 0
           |       THEN covn / (sqrt(varxn) * sqrt(varyn)) END AS corr
           |FROM f
           |ORDER BY source""".stripMargin),
    "One hash-agg pass of five exact long sums with map-side partials — the portable form " +
      "of regr_slope/corr; output bounded by |keys|. Exactness is partitioning-independent " +
      "because integer addition is associative, unlike the builtins' float accumulation.")

  /** q83 — E4: text normalization (lowercase, Latin accent fold,
    * whitespace collapse, trim) under the oracle gate: accented
    * prefixes are planted with identical string construction, and the
    * oracle interpolates the SAME fold table into DuckDB's translate —
    * both engines' lower() and translate() are codepoint-based, so the
    * normalized text hash-compares exactly. */
  val q83 = Declared(
    "q83_normalize", "E4",
    (s, dir) => {
      val planted = Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id"),
          concat(lit("Café ÜBER naïve São Señor ÉLÈVE  çà\t"), col("text")).as("t"))
      planted.select(col("doc_id"),
        TextAnalysis.normalizeText(col("t")).as("normalized"))
        .orderBy(col("doc_id"))
    },
    Some(s"""SELECT doc_id,
            |  trim(regexp_replace(
            |    translate(lower('Café ÜBER naïve São Señor ÉLÈVE  çà' || chr(9) || text),
            |              '${TextAnalysis.accented}', '${TextAnalysis.folded}'),
            |    '\\s+', ' ', 'g')) AS normalized
            |FROM documents WHERE doc_id < 100
            |ORDER BY doc_id""".stripMargin),
    "Pure scan-side string expressions (codegen'd, no UDF) — normalization before hashing " +
      "is what makes accent variants the same dedup key; cost is one pass over text bytes.")

  val all: Seq[Declared] =
    Seq(q70, q71, q72, q73, q74, q75, q79, q80, q81, q82, q83, q100)
}
