package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{EventAnalytics, Experimentation}
import graft.ext.{MultiContains, Similarity, TextAnalysis}

/** Round-5 batch 39: ratio-metric delta method, Aho–Corasick
  * multi-pattern scan, MMR diversity re-ranking, exact Shapley-value
  * attribution, BPE merge-table training. Exactness discipline
  * unchanged: integer/string outputs where possible, pinned-IEEE
  * unrounded doubles elsewhere. */
object Analytics20 {

  /** q314 — A-stat: delta-method ratio metric (revenue per order) per
    * customer-parity arm. Unit = customer; six exact sums; the
    * variance includes the numerator/denominator covariance the naive
    * per-unit-mean treatment drops. Unrounded pinned-IEEE finish. */
  val q314 = Declared(
    "q314_ratio_delta", "A-stat",
    (s, dir) => {
      val units = Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("x"),
          sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("y"))
        .withColumn("arm",
          when(col("o_custkey") % 2 === 0, "even").otherwise("odd"))
      Experimentation.ratioMetricDelta(units, col("x"), col("y"), col("arm"))
        .orderBy(col("arm"))
    },
    Some("""WITH u AS (
           |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS x,
           |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS y
           |  FROM orders GROUP BY 1),
           |g AS (
           |  SELECT CASE WHEN o_custkey % 2 = 0 THEN 'even' ELSE 'odd' END
           |      AS arm,
           |    CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
           |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
           |    CAST(sum(CAST(x * x AS HUGEINT)) AS HUGEINT) AS sxx,
           |    CAST(sum(CAST(x * y AS HUGEINT)) AS HUGEINT) AS sxy,
           |    CAST(sum(CAST(y * y AS HUGEINT)) AS HUGEINT) AS syy
           |  FROM u GROUP BY 1),
           |f AS (
           |  SELECT arm, n, sx, sy,
           |    CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) AS ratio,
           |    CAST(n * sxx - sx * sx AS DOUBLE) /
           |      CAST(n * (n - 1) AS DOUBLE) AS varx,
           |    CAST(n * syy - sy * sy AS DOUBLE) /
           |      CAST(n * (n - 1) AS DOUBLE) AS vary,
           |    CAST(n * sxy - sx * sy AS DOUBLE) /
           |      CAST(n * (n - 1) AS DOUBLE) AS cov,
           |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx
           |  FROM g),
           |z AS (
           |  SELECT arm, CAST(n AS BIGINT) AS n, ratio,
           |    sqrt((ratio * ratio * varx - ratio * cov * 2 + vary) /
           |      (CAST(n AS DOUBLE) * (mx * mx))) AS se
           |  FROM f)
           |SELECT arm, n, ratio, se,
           |  ratio - 1.96 * se AS ci_lo, ratio + 1.96 * se AS ci_hi
           |FROM z ORDER BY arm""".stripMargin),
    "One unit-grain agg with map-side combine; the finish is |arms|-row " +
      "arithmetic over exact sums. The variance a mean-of-ratios readout " +
      "silently understates is priced correctly at any scale.")

  private val patterns = Seq("data", "model", "the", "quantum", "learning")

  /** q315 — E1/X3: multi-pattern corpus scan through ONE Aho–Corasick
    * automaton pass per document (native codegen Expression) — vs k
    * full `contains` scans. The mask decodes per pattern; counts match
    * DuckDB's per-pattern contains exactly (integers). */
  val q315 = Declared(
    "q315_multi_pattern", "E1,X3",
    (s, dir) => {
      val masked = Tables.documents(s, dir).select(
        MultiContains.multiContains(col("text"), patterns).as("__m"))
      val pats = patterns.zipWithIndex
      pats.map { case (p, i) =>
        masked.select(lit(p).as("pattern"),
          when(col("__m").bitwiseAND(lit(1L << i)) =!= 0, 1L).otherwise(0L)
            .as("__hit"))
          .agg(sum(col("__hit")).as("n_docs"))
          .select(lit(p).as("pattern"), col("n_docs"))
      }.reduce(_ unionByName _).orderBy(col("pattern"))
    },
    Some(s"""WITH pats(p) AS (VALUES ${patterns.map(p => s"('$p')").mkString(", ")})
            |SELECT p AS pattern,
            |  CAST(sum(CASE WHEN contains(text, p) THEN 1 ELSE 0 END)
            |    AS BIGINT) AS n_docs
            |FROM documents CROSS JOIN pats
            |GROUP BY p ORDER BY pattern""".stripMargin),
    "One automaton pass per document regardless of pattern count — the naive " +
      "plan re-scans every byte once PER PATTERN. At 100 TB with a 1000-term " +
      "blocklist that is the difference between 1 and 1000 corpus scans.")

  /** q316 — E3/E7: MMR diversity re-ranking of a top-40 cosine
    * candidate list (k = 10, λ = 0.7). Greedy integer argmax over
    * micro-quantized relevance/sims; the oracle replays every round
    * via a recursive CTE. */
  val q316 = Declared(
    "q316_mmr_rerank", "E3,E7",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val cands = Similarity.topKCosine(emb.filter(col("vec_id") =!= 0),
          "embedding", "vec_id", q, k = 40)
        .join(emb, Seq("vec_id"))
        .select(col("vec_id"), col("cosine"), col("embedding"))
      Similarity.mmrRerank(cands, "vec_id", "cosine", "embedding",
          k = 10, lamNum = 7, lamDen = 10)
        .orderBy(col("pick_order"))
    },
    Some("""WITH RECURSIVE
           |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           |      FROM embeddings WHERE vec_id = 0),
           |scored AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev,
           |    list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qv)
           |      / (sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
           |                               list_transform(embedding, x -> CAST(x AS DOUBLE))))
           |         * sqrt(list_dot_product(qv, qv))) AS c
           |  FROM embeddings, q WHERE vec_id <> 0),
           |cand AS (SELECT vec_id, ev, c FROM scored
           |         ORDER BY c DESC, vec_id ASC LIMIT 40),
           |cord AS (SELECT vec_id AS id, ev,
           |    CAST(floor(c * 1e6) AS BIGINT) AS rel_u,
           |    CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS ord
           |  FROM cand),
           |simm AS MATERIALIZED (
           |  SELECT a.ord AS oa,
           |    list(CAST(floor(
           |      list_dot_product(a.ev, b.ev) /
           |        (sqrt(list_dot_product(a.ev, a.ev)) *
           |         sqrt(list_dot_product(b.ev, b.ev))) * 1e6) AS BIGINT)
           |      ORDER BY b.ord) AS sims
           |  FROM cord a CROSS JOIN cord b
           |  GROUP BY a.ord),
           |base AS MATERIALIZED (
           |  SELECT c.ord, c.id, c.rel_u, s.sims
           |  FROM cord c JOIN simm s ON s.oa = c.ord),
           |sel(round, ord, id, rel_u, sims, picked, msp, scp, selected) AS (
           |  SELECT 0, ord, id, rel_u, sims, CAST(NULL AS INT),
           |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST([] AS INT[])
           |  FROM base
           |  UNION ALL
           |  SELECT round + 1, ord, id, rel_u, sims,
           |    CASE WHEN picked IS NULL AND ord = pko THEN round + 1
           |         ELSE picked END,
           |    CASE WHEN picked IS NULL AND ord = pko THEN ms ELSE msp END,
           |    CASE WHEN picked IS NULL AND ord = pko THEN score ELSE scp END,
           |    list_append(selected, pko)
           |  FROM (
           |    SELECT *,
           |      min(CASE WHEN picked IS NULL AND score = mx AND id = pki
           |            THEN ord END) OVER () AS pko
           |    FROM (
           |      SELECT *,
           |        min(CASE WHEN picked IS NULL AND score = mx THEN id END)
           |          OVER () AS pki
           |      FROM (
           |        SELECT *, max(CASE WHEN picked IS NULL THEN score END)
           |            OVER () AS mx
           |        FROM (
           |          SELECT *, 7 * rel_u - 3 * ms AS score
           |          FROM (
           |            SELECT *,
           |              CASE WHEN len(selected) = 0 THEN 0
           |                ELSE list_aggregate(list_transform(selected,
           |                       s -> sims[s]), 'max') END AS ms
           |            FROM sel WHERE round < 10)))))
           |)
           |SELECT CAST(picked AS BIGINT) AS pick_order, CAST(id AS BIGINT) AS id,
           |  rel_u, msp AS maxsim_u, scp AS mmr_score
           |FROM sel WHERE round = 10 AND picked IS NOT NULL
           |ORDER BY pick_order""".stripMargin),
    "The candidate list is the upstream top-N (bounded), never the corpus; " +
      "k greedy rounds each cost one bounded pass + a 1-row driver collect. " +
      "The N^2 sim matrix is 1600 integers. The standard RAG context-window " +
      "diversity pass, exact.")

  /** q317 — W-frame/A1: EXACT Shapley-value attribution over the
    * 4-channel touch lattice (purchase = conversion; reach game
    * v(S) = converting journeys with coalition ⊆ S). Integer
    * permutation counts; efficiency law Σφ = v(full)·k! exact. */
  val q317 = Declared(
    "q317_shapley_attrib", "W-frame,A1",
    (s, dir) =>
      EventAnalytics.shapleyAttribution(Tables.events(s, dir),
          "user_id", "ts", "event_id", "event_type", "purchase")
        .orderBy(col("touch_type")),
    Some("""WITH RECURSIVE seg AS (
           |  SELECT user_id, ts, event_id, event_type,
           |    coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
           |      END) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS seg
           |  FROM events),
           |touches AS (
           |  SELECT user_id, seg, event_type AS touch
           |  FROM seg WHERE event_type <> 'purchase'),
           |convs AS (
           |  SELECT DISTINCT user_id, seg
           |  FROM seg WHERE event_type = 'purchase'),
           |types AS (
           |  SELECT t, CAST(row_number() OVER (ORDER BY t) - 1 AS INT) AS bit
           |  FROM (SELECT DISTINCT touch AS t FROM touches)),
           |kk AS (SELECT CAST(count(*) AS INT) AS k FROM types),
           |jm AS (
           |  SELECT t.user_id, t.seg,
           |    CAST(sum(DISTINCT (1::BIGINT << ty.bit)) AS BIGINT) AS m
           |  FROM touches t
           |  JOIN convs c ON c.user_id = t.user_id AND c.seg = t.seg
           |  JOIN types ty ON ty.t = t.touch
           |  GROUP BY 1, 2),
           |mc AS (SELECT m, CAST(count(*) AS BIGINT) AS nconv
           |       FROM jm GROUP BY 1),
           |latr(b, mask) AS ( -- subset lattice by bit doubling (range()
           |  -- rejects subquery bounds; this stays exact in k)
           |  SELECT 0, CAST(0 AS BIGINT)
           |  UNION ALL
           |  SELECT b + 1, mask | (CAST(add AS BIGINT) << b)
           |  FROM latr, (VALUES (0), (1)) bits(add), kk
           |  WHERE b < kk.k),
           |lat AS (SELECT mask FROM latr, kk WHERE b = kk.k),
           |v AS (
           |  SELECT mask, CAST(coalesce(sum(nconv), 0) AS BIGINT) AS v
           |  FROM lat LEFT JOIN mc ON (m & ~mask) = 0
           |  GROUP BY mask),
           |phi AS (
           |  SELECT ty.t AS touch_type,
           |    CAST(sum(CAST(factorial(bit_count(s.mask)) AS BIGINT) *
           |      CAST(factorial(k.k - bit_count(s.mask) - 1) AS BIGINT) *
           |      (vi.v - s.v)) AS BIGINT) AS phi_perm,
           |    max(k.k) AS kmax
           |  FROM types ty CROSS JOIN kk k
           |  JOIN v s ON (s.mask & (1::BIGINT << ty.bit)) = 0
           |  JOIN v vi ON vi.mask = (s.mask | (1::BIGINT << ty.bit))
           |  GROUP BY 1),
           |solo AS (
           |  SELECT ty.t, v.v AS v_solo
           |  FROM types ty JOIN v ON v.mask = (1::BIGINT << ty.bit)),
           |vf AS (SELECT v AS v_full FROM v, kk
           |       WHERE mask = (1::BIGINT << k) - 1)
           |SELECT p.touch_type, p.phi_perm,
           |  (1000000 * p.phi_perm) // CAST(factorial(p.kmax) AS BIGINT)
           |    AS phi_micro,
           |  s.v_solo, vf.v_full
           |FROM phi p JOIN solo s ON s.t = p.touch_type CROSS JOIN vf
           |ORDER BY touch_type""".stripMargin),
    "The fact pass is one actor-keyed window + a rollup to <= 2^k coalition " +
      "masks; the lattice math is k-bounded (k = channel count). The " +
      "principled credit split where first/last/decay heuristics disagree — " +
      "exact, not sampled permutations.")

  /** q318 — E4: BPE merge-table training, first 5 merges over the
    * document corpus (word-level, `</w>` terminal, lexicographic tie
    * break). Pure integer/string outputs; the oracle replays every
    * round's pair count, argmax and fold. */
  val q318 = Declared(
    "q318_bpe_train", "E4",
    (s, dir) => TextAnalysis.bpeTrain(
        Tables.documents(s, dir).filter(col("doc_id") < 300),
        col("text"), merges = 5)
      .orderBy(col("round")),
    Some(s"""WITH w0 AS (
            |  SELECT w, CAST(count(*) AS BIGINT) AS f
            |  FROM (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
            |        FROM documents WHERE doc_id < 300)
            |  WHERE w <> '' GROUP BY w),
            |v0 AS (
            |  SELECT w, f,
            |    list_append(list_transform(range(1, length(w) + 1),
            |      i -> substring(w, i, 1)), '</w>') AS syms
            |  FROM w0),
            |${TextAnalysis.bpeOracleSteps(5)}
            |SELECT * FROM (
            |  SELECT 1 AS round, l AS lhs, rr AS rhs, l || rr AS merged,
            |    CAST(cnt AS BIGINT) AS pair_count FROM b1
            |  UNION ALL SELECT 2, l, rr, l || rr, CAST(cnt AS BIGINT) FROM b2
            |  UNION ALL SELECT 3, l, rr, l || rr, CAST(cnt AS BIGINT) FROM b3
            |  UNION ALL SELECT 4, l, rr, l || rr, CAST(cnt AS BIGINT) FROM b4
            |  UNION ALL SELECT 5, l, rr, l || rr, CAST(cnt AS BIGINT) FROM b5)
            |ORDER BY round""".stripMargin),
    "The corpus reduces ONCE to the word-frequency vocabulary (Heaps-bounded); " +
      "each merge round is a vocab-sized pair explode + 1-row argmax + array " +
      "fold. The tokenizer-vocabulary build, distributed — 100 TB of text " +
      "trains from the same rollup as 100 GB.")

  val all: Seq[Declared] = Seq(q314, q315, q316, q317, q318)
}
