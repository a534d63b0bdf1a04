package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Similarity, TextAnalysis}
import graft.ops.Evaluation

/** Round-5 batch 40: isotonic calibration (PAV), RAKE keyphrases,
  * BPE encoding compression, hard-negative mining. */
object Analytics21 {

  /** q319 — A-eval: isotonic (PAV) calibration of urgent-priority rate
    * over 20 order-value bins. Exact cross-multiplied pool merges; the
    * oracle converges to the same unique pools by repeatedly merging
    * the first adjacent violator (recursive CTE). */
  val q319 = Declared(
    "q319_isotonic_pav", "A-eval",
    (s, dir) => Evaluation.isotonicCalibration(
        Tables.orders(s, dir),
        least(lit(19L), floor(col("o_totalprice") / 25000.0).cast("long")),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .orderBy(col("bin")),
    Some("""WITH RECURSIVE b AS (
           |  SELECT CAST(least(19, CAST(floor(o_totalprice / 25000.0)
           |      AS BIGINT)) AS BIGINT) AS bin,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           |      THEN 1 ELSE 0 END) AS BIGINT) AS pos
           |  FROM orders GROUP BY 1),
           |pav(step, lo, hi, n, pos) AS (
           |  SELECT 0, bin, bin, n, pos FROM b
           |  UNION ALL
           |  SELECT step + 1, lo,
           |    CASE WHEN nlo = vr THEN nhi ELSE hi END,
           |    CASE WHEN nlo = vr THEN n + nn ELSE n END,
           |    CASE WHEN nlo = vr THEN pos + npos ELSE pos END
           |  FROM (
           |    SELECT *, min(CASE WHEN viol THEN lo END) OVER () AS vr
           |    FROM (
           |      SELECT *,
           |        coalesce(ppos * n > pos * pn, FALSE) AS viol
           |      FROM (
           |        SELECT step, lo, hi, n, pos,
           |          lead(lo) OVER w AS nlo, lead(hi) OVER w AS nhi,
           |          lead(n) OVER w AS nn, lead(pos) OVER w AS npos,
           |          lag(pos) OVER w AS ppos, lag(n) OVER w AS pn
           |        FROM pav WINDOW w AS (ORDER BY lo))))
           |  WHERE vr IS NOT NULL AND lo <> vr)
           |SELECT b.bin, b.n, b.pos, p.lo AS pool_lo, p.hi AS pool_hi,
           |  (1000000 * p.pos) // p.n AS fit_ppm
           |FROM (SELECT * FROM pav
           |      WHERE step = (SELECT max(step) FROM pav)) p
           |JOIN b ON b.bin BETWEEN p.lo AND p.hi
           |ORDER BY b.bin""".stripMargin),
    "One bin-keyed agg over the fact table; PAV runs on the 20-row rollup " +
      "(bounded-driver regime). The monotone calibration map Platt's sigmoid " +
      "can't fit; exact integer pool rates, no merge-order sensitivity.")

  private val rakeStops = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "on", "for", "with", "is", "are", "was", "be", "by", "at", "as",
    "it", "that", "this", "from", "we", "you", "they")

  /** q320 — E4: RAKE keyphrase extraction over the document corpus —
    * stopword-delimited content-word runs, deg/freq word scores in
    * exact ppm, top-15 phrases. */
  val q320 = Declared(
    "q320_rake_keyphrases", "E4",
    (s, dir) => TextAnalysis.keyphrasesRake(
        Tables.documents(s, dir).filter(col("doc_id") < 500),
        col("doc_id"), col("text"), rakeStops, topK = 15),
    Some(s"""WITH t0 AS (
            |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS arr
            |  FROM documents WHERE doc_id < 500),
            |tk AS (
            |  SELECT doc_id, i AS pos, arr[i] AS w
            |  FROM (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS i
            |        FROM t0)),
            |nt AS (
            |  SELECT doc_id, pos, w FROM tk
            |  WHERE w <> '' AND w NOT IN (${rakeStops.map(w => s"'$w'").mkString(", ")})),
            |ph AS (
            |  SELECT doc_id, grp,
            |    string_agg(w, ' ' ORDER BY pos) AS phrase,
            |    CAST(count(*) AS BIGINT) AS n_words,
            |    list(w ORDER BY pos) AS ws
            |  FROM (SELECT *,
            |          pos - row_number() OVER (PARTITION BY doc_id
            |            ORDER BY pos) AS grp
            |        FROM nt)
            |  GROUP BY doc_id, grp),
            |wstat AS (
            |  SELECT w, CAST(count(*) AS BIGINT) AS freq,
            |    CAST(sum(n_words) AS BIGINT) AS deg
            |  FROM (SELECT n_words, unnest(ws) AS w FROM ph) GROUP BY w),
            |sc AS (SELECT w, (1000000 * deg) // freq AS score FROM wstat),
            |psc AS (
            |  SELECT phrase, n_words, CAST(sum(score) AS BIGINT) AS ssum,
            |    CAST(count(*) AS BIGINT) AS cnt
            |  FROM (SELECT ph.phrase, ph.n_words, unnest(ph.ws) AS w FROM ph) px
            |  JOIN sc USING (w)
            |  GROUP BY phrase, n_words)
            |SELECT phrase, n_words, cnt // n_words AS n_occurs,
            |  ssum // (cnt // n_words) AS score_ppm
            |FROM psc ORDER BY score_ppm DESC, phrase ASC LIMIT 15""".stripMargin),
    "Phrase islands ride one doc-partitioned window; word and phrase stats " +
      "are vocabulary-grain aggs with map-side combine. The zero-supervision " +
      "corpus-card keyphrase readout (q292's chi-square needs a contrast " +
      "slice; RAKE runs on anything).")

  /** q321 — E4: BPE encoding compression — train 5 merges (q318's
    * table), apply them to the same corpus, report char-level vs BPE
    * token counts and the ppm saved. */
  val q321 = Declared(
    "q321_bpe_encode", "E4",
    (s, dir) => {
      val corpus = Tables.documents(s, dir).filter(col("doc_id") < 300)
      val merges = TextAnalysis.bpeTrain(corpus, col("text"), merges = 5)
        .orderBy(col("round")).collect()
        .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
      TextAnalysis.bpeEncode(corpus, col("doc_id"), col("text"), merges)
    },
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
            |${TextAnalysis.bpeOracleSteps(5)},
            |enc AS (SELECT w, CAST(len(syms) AS BIGINT) AS nt FROM v5),
            |wd AS (
            |  SELECT doc_id, w
            |  FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text),
            |          '\\s+')) AS w
            |        FROM documents WHERE doc_id < 300)
            |  WHERE w <> '')
            |SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
            |  CAST(count(*) AS BIGINT) AS n_words,
            |  CAST(sum(length(w) + 1) AS BIGINT) AS n_char_tokens,
            |  CAST(sum(nt) AS BIGINT) AS n_bpe_tokens,
            |  CAST((1000000 * (CAST(sum(length(w) + 1) AS BIGINT) -
            |      CAST(sum(nt) AS BIGINT))) //
            |    CAST(sum(length(w) + 1) AS BIGINT) AS BIGINT) AS saved_ppm
            |FROM wd JOIN enc USING (w)""".stripMargin),
    "The merge folds run once over the distinct-word vocabulary as chained " +
      "projections; the corpus pass is an explode + vocab join + one agg. " +
      "Train-then-measure in one query — the compression readout that " +
      "decides whether more merges are worth it.")

  /** q322 — E3: hard-negative mining — for each embedding, the 3
    * most-similar vectors with a DIFFERENT label (vec_id mod 5).
    * Exact pairwise form at oracle scale; the LSH-bucketed variant is
    * the documented 100 TB path. */
  val q322 = Declared(
    "q322_hard_negatives", "E3",
    (s, dir) => Similarity.hardNegatives(
        Tables.embeddings(s, dir).filter(col("vec_id") < 120)
          .select(col("vec_id"), (col("vec_id") % 5).as("label"),
            col("embedding")),
        "vec_id", "label", "embedding", k = 3)
      .select(col("anchor_id"), col("neg_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy(col("anchor_id"), col("rank")),
    Some("""WITH e AS (
           |  SELECT vec_id, vec_id % 5 AS label,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings WHERE vec_id < 120),
           |p AS (
           |  SELECT a.vec_id AS anchor_id, b.vec_id AS neg_id,
           |    list_dot_product(a.v, b.v) /
           |      (sqrt(list_dot_product(a.v, a.v)) *
           |       sqrt(list_dot_product(b.v, b.v))) AS c
           |  FROM e a JOIN e b
           |    ON a.vec_id <> b.vec_id AND a.label <> b.label),
           |r AS (
           |  SELECT anchor_id, neg_id,
           |    CAST(row_number() OVER (PARTITION BY anchor_id
           |      ORDER BY c DESC, neg_id ASC) AS INT) AS rank,
           |    c
           |  FROM p)
           |SELECT anchor_id, neg_id, rank, round(c, 6) AS cosine
           |FROM r WHERE rank <= 3
           |ORDER BY anchor_id, rank""".stripMargin),
    "Anchor-keyed rank windows over label-mismatched pairs — skew-free. At " +
      "corpus scale the same contract runs over lshBucket-joined candidates " +
      "(2^bits fewer pairs): the negatives that actually move a contrastive " +
      "loss, mined where the data lives.")

  val all: Seq[Declared] = Seq(q319, q320, q321, q322)
}
