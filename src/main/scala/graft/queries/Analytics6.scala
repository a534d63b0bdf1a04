package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.TextAnalysis
import graft.ops.{Associations, Features}

/** Round-4 (batch 18): the feature-engineering & corpus-shape layer —
  * boilerplate-span detection, the co-occurrence item graph,
  * leakage-safe target encoding, deterministic class rebalancing and
  * the vocabulary-growth curve. Same exactness discipline as the
  * other Analytics modules. */
object Analytics6 {

  private def centsSql(e: String) =
    s"CAST(CAST($e AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** q201 — E4: corpus boilerplate spans — word bigrams present in
    * ≥5% of documents, the repeated-span complement of whole-document
    * dedup. Integer-exact document frequencies. */
  val q201 = Declared(
    "q201_boilerplate", "E4",
    (s, dir) => TextAnalysis.boilerplateShingles(
        Tables.documents(s, dir), col("text"), col("doc_id"),
        shingleSize = 2, minDfPpm = 50000L)
      .orderBy(col("df").desc, col("shingle"))
      .limit(50),
    Some("""WITH t AS (
           |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
           |  FROM documents),
           |st AS (
           |  SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
           |  FROM t WHERE len(toks) >= 2),
           |sh AS (
           |  SELECT DISTINCT doc_id,
           |    array_to_string(list_slice(toks, i, i + 1), ' ') AS shingle
           |  FROM st),
           |d AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df
           |      FROM sh GROUP BY 1),
           |n AS (SELECT count(DISTINCT doc_id) AS nd FROM t)
           |SELECT shingle, df, 1000000 * df // nd AS df_ppm
           |FROM d, n
           |WHERE 1000000 * df // nd >= 50000
           |ORDER BY df DESC, shingle
           |LIMIT 50""".stripMargin),
    "The distinct (doc, shingle) explode map-side combines into a shingle-keyed " +
      "agg — n-gram-volume cost, like q65's TF-IDF pass. Spans flagged here get " +
      "regexp-stripped scan-side BEFORE dedup/quality, where they'd otherwise " +
      "glue unrelated documents into near-dup false positives.")

  /** q202 — E2+/graph: co-purchase projection — the supplier-agnostic
    * item-item graph from shared orders, weight = co-occurrence count.
    * Basket fan-out is bounded (≤7 line items per order), so the pair
    * explosion is linear in orders at any scale. */
  val q202 = Declared(
    "q202_copurchase", "E2+",
    (s, dir) => Associations.coOccurrence(Tables.lineitem(s, dir),
      col("l_orderkey"), col("l_partkey"), topK = 25),
    Some("""WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
           |           FROM lineitem),
           |p AS (
           |  SELECT a.it AS item_a, b2.it AS item_b,
           |    CAST(count(*) AS BIGINT) AS weight
           |  FROM b a JOIN b b2 ON a.bk = b2.bk AND a.it < b2.it
           |  GROUP BY 1, 2)
           |SELECT item_a, item_b, weight FROM p
           |ORDER BY weight DESC, item_a, item_b
           |LIMIT 25""".stripMargin),
    "distinct + basket-keyed self-join + pair agg with map-side combine; " +
      "TakeOrdered (per-partition heaps) serves the top-k. The item graph is " +
      "then q100/q184 PageRank input or q128 triangle input — graph " +
      "construction IS a bounded relational plan here, not a special engine.")

  /** q203 — A1/ML: leave-one-out target encoding of order priority
    * against order value — the leakage-safe categorical feature. Each
    * row's encoding excludes its own target: one IEEE division of
    * exact integers. */
  val q203 = Declared(
    "q203_target_encoding", "A1",
    (s, dir) => Features.targetEncodeLoo(
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            .as("price_c")),
        col("o_orderpriority"), col("price_c"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("loo_mean"))
      .orderBy(col("o_orderkey")),
    Some(s"""WITH b AS (
           |  SELECT o_orderkey, o_orderpriority,
           |    ${centsSql("o_totalprice")} AS y
           |  FROM orders),
           |st AS (
           |  SELECT o_orderpriority, CAST(sum(y) AS HUGEINT) AS s,
           |    count(*) AS n
           |  FROM b GROUP BY 1)
           |SELECT o_orderkey, b.o_orderpriority,
           |  CASE WHEN n > 1 THEN
           |    CAST(s - y AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS loo_mean
           |FROM b JOIN st ON b.o_orderpriority = st.o_orderpriority
           |ORDER BY o_orderkey""".stripMargin),
    "One |categories|-row agg broadcast back onto a single fact scan — no " +
      "window, no shuffle of the facts. The encoding regenerates bit-identically " +
      "on any layout, so train/serve skew from the FEATURE PIPELINE is zero.")

  /** q204 — ML/E6: majority-class cap audit — bound every order-status
    * class to ≤2× the minority count. The audit twin reports the
    * keep/drop plan; classBalanceCap materializes it (spec-pinned
    * deterministic under a total order). */
  val q204 = Declared(
    "q204_class_balance", "E6",
    (s, dir) => Features.classBalanceAudit(Tables.orders(s, dir),
        col("o_orderstatus"), ratio = 2)
      .orderBy(col("class")),
    Some("""WITH c AS (
           |  SELECT o_orderstatus AS class, CAST(count(*) AS BIGINT) AS n_before
           |  FROM orders GROUP BY 1),
           |m AS (SELECT min(n_before) AS mn FROM c)
           |SELECT class, n_before,
           |  least(n_before, mn * 2) AS n_kept,
           |  n_before - least(n_before, mn * 2) AS dropped
           |FROM c, m ORDER BY class""".stripMargin),
    "The audit is |classes| rows from one agg. The materializing twin keeps " +
      "each class's FIRST rows under a caller-supplied total order — " +
      "deterministic rebalancing, and rank<=cap plans as WindowGroupLimit " +
      "(per-partition heaps), so even the cap filter never sorts a full class.")

  /** q205 — E4: vocabulary growth curve — distinct BIGRAMS vs
    * documents ingested, at 25-doc checkpoints (bigrams, because the
    * synthetic unigram vocabulary saturates within one checkpoint —
    * the n-gram unit is the op's caller choice). Each n-gram counts at
    * its FIRST document (an associative min), so the curve costs one
    * agg pass + a checkpoint-rollup window. */
  val q205 = Declared(
    "q205_vocab_growth", "E4",
    (s, dir) => TextAnalysis.vocabGrowth(Tables.documents(s, dir),
        graft.ext.Dedup.wordShingles(col("text"), 2), col("doc_id"),
        every = 25L)
      .orderBy(col("docs_seen")),
    Some("""WITH t AS (
           |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
           |  FROM documents),
           |st AS (
           |  SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
           |  FROM t WHERE len(toks) >= 2),
           |g AS (
           |  SELECT doc_id,
           |    array_to_string(list_slice(toks, i, i + 1), ' ') AS tok
           |  FROM st),
           |f AS (
           |  SELECT tok, min(doc_id) AS fd FROM g WHERE tok <> ''
           |  GROUP BY 1),
           |cp AS (
           |  SELECT (fd // 25 + 1) * 25 AS cp,
           |    CAST(count(*) AS BIGINT) AS new_tokens
           |  FROM f GROUP BY 1),
           |n AS (SELECT count(DISTINCT doc_id) AS nd FROM t)
           |SELECT least(cp, nd) AS docs_seen, new_tokens,
           |  CAST(sum(new_tokens) OVER (ORDER BY cp) AS BIGINT) AS vocab
           |FROM cp, n
           |ORDER BY docs_seen""".stripMargin),
    "min(first-doc) is associative — any partitioning yields the same curve — " +
      "and the cumulative window runs over the CHECKPOINT rollup (corpus/50 " +
      "rows). Flattening growth is the 'more data stops buying vocabulary' " +
      "signal that sizes the tokenizer before a 100 TB training run.")

  val all: Seq[Declared] = Seq(q201, q202, q203, q204, q205)
}
