package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Clustering, Curation, TextAnalysis}
import LlmExt2.duckMd5Hash60

/** Round-6 batch 49: published corpus-curation methods as engine
  * operators — SemDeDup semantic near-dup removal (Abbas et al. 2023),
  * batch-perceptron quality-classifier training (Rosenblatt 1958,
  * order-independent batch form), and DSIR importance scoring
  * (Xie et al., NeurIPS 2023). */
object LlmExt8 {

  /** q345 — E3+/E6: SemDeDup — cluster embeddings with fixed-round
    * integer k-means, then drop every doc whose within-cluster cosine
    * to a LOWER-id mate reaches τ = 0.9. Inputs are embeddings plus
    * planted near-copies (every component +0.05, id +100000 — cosine
    * 0.917..0.949 to the source vs ≤ 0.52 between any natural pair),
    * so true semantic dups exist and the τ gate separates them with
    * margin. The cosine test is exact integer arithmetic
    * (dot² ·100 ≥ 81·‖a‖²‖b‖², no sqrt), so the oracle replays the
    * identical k-means rounds and the identical pair decisions. */
  val q345 = Declared(
    "q345_semantic_dedup", "E3+,E6",
    (s, dir) => {
      val base = Tables.embeddings(s, dir).filter(col("vec_id") < 250)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val planted = base.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.05)).as("embedding"))
      Clustering.semanticDedup(base.unionByName(planted),
          "vec_id", "embedding", k = 4, iters = 2,
          tauNumSq = 81L, tauDenSq = 100L)
        .orderBy(col("id"))
    },
    Some {
      // the q166 k-means replay at k=4, iters=2, then the
      // within-cluster integer-cosine prune
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
      s"""WITH corpus AS (
         |  SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE vec_id < 250
         |  UNION ALL
         |  SELECT vec_id + 100000,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.05)
         |  FROM embeddings WHERE vec_id < 250),
         |pts AS (
         |  SELECT id, i - 1 AS d,
         |    CAST(round(emb[i] * 1000000, 0) AS BIGINT) AS q
         |  FROM corpus, (SELECT unnest(range(1, 65)) AS i) idx),
         |init AS (
         |  SELECT id, row_number() OVER (ORDER BY id) - 1 AS ck
         |  FROM (SELECT DISTINCT id FROM pts) ORDER BY id LIMIT 4),
         |c0 AS (
         |  SELECT init.ck, pts.d, pts.q AS c FROM pts JOIN init USING (id)),
         |$rounds,
         |${dist("f", "c2")},
         |nn AS (
         |  SELECT id, CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS n2
         |  FROM pts GROUP BY id),
         |cand AS (
         |  SELECT x.id AS id_a, y.id AS id_b, x.ck AS cluster
         |  FROM af x JOIN af y ON x.ck = y.ck AND x.id < y.id),
         |dots AS (
         |  SELECT c.id_a, c.id_b, c.cluster,
         |    CAST(sum(CAST(pa.q AS HUGEINT) * pb.q) AS HUGEINT) AS dot
         |  FROM cand c
         |  JOIN pts pa ON pa.id = c.id_a
         |  JOIN pts pb ON pb.id = c.id_b AND pb.d = pa.d
         |  GROUP BY 1, 2, 3),
         |dup AS (
         |  SELECT d.id_a, d.id_b, d.cluster
         |  FROM dots d
         |  JOIN nn na ON na.id = d.id_a
         |  JOIN nn nb ON nb.id = d.id_b
         |  WHERE d.dot > 0 AND d.dot * d.dot * 100 >= 81 * na.n2 * nb.n2)
         |SELECT id_b AS id, CAST(cluster AS BIGINT) AS cluster,
         |  min(id_a) AS kept_by, CAST(count(*) AS BIGINT) AS n_dups
         |FROM dup GROUP BY id_b, cluster ORDER BY id""".stripMargin
    },
    "The published SemDeDup shape: cluster count scales with the corpus so the " +
      "quadratic pair join runs per bounded cluster key, never corpus x corpus; " +
      "the k-means pass is the only corpus-wide cost. The planted-copy corpus " +
      "makes the oracle an exact recall+precision certificate at tau=0.9.")

  /** q346 — ML/E4+: batch-perceptron training of a document quality
    * classifier — features (bias, token count, distinct-token ratio in
    * permil), label +1 iff n_chars ≥ 300 (the long-doc rule the
    * classifier must learn from token statistics). 5 batch rounds;
    * each row reports the misclassified count entering the round and
    * the integer weights after it — the training CURVE, not just the
    * fit, so a regression in any round trips the hash. */
  val q346 = Declared(
    "q346_quality_perceptron", "ML,E4+",
    (s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      Curation.batchPerceptron(Tables.documents(s, dir),
          features = Seq(lit(1L),
            size(toks).cast("long"),
            expr("(CAST(size(array_distinct(split(lower(text), '\\\\s+'))) AS BIGINT) * 1000) div CAST(size(split(lower(text), '\\\\s+')) AS BIGINT)")),
          label = when(col("n_chars") >= 300, 1L).otherwise(-1L),
          rounds = 5)
        .orderBy(col("round"))
    },
    Some {
      def err(k: Int) =
        s"""e$k AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_err,
           |    CAST(coalesce(sum(y * x0), 0) AS BIGINT) AS d0,
           |    CAST(coalesce(sum(y * x1), 0) AS BIGINT) AS d1,
           |    CAST(coalesce(sum(y * x2), 0) AS BIGINT) AS d2
           |  FROM f, w${k - 1}c
           |  WHERE y * (w0 * x0 + w1 * x1 + w2 * x2) <= 0),
           |w${k}c AS (
           |  SELECT w0 + d0 AS w0, w1 + d1 AS w1, w2 + d2 AS w2
           |  FROM w${k - 1}c, e$k)""".stripMargin
      s"""WITH f AS (
         |  SELECT CAST(1 AS BIGINT) AS x0,
         |    CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS x1,
         |    CAST(len(list_distinct(regexp_split_to_array(lower(text), '\\s+'))) * 1000
         |      // len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS x2,
         |    CASE WHEN n_chars >= 300 THEN CAST(1 AS BIGINT)
         |         ELSE CAST(-1 AS BIGINT) END AS y
         |  FROM documents),
         |w0c AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
         |        CAST(0 AS BIGINT) AS w2),
         |${(1 to 5).map(err).mkString(",\n")}
         |SELECT * FROM (
         |${(1 to 5).map(k =>
        s"  SELECT CAST($k AS BIGINT) AS round, e$k.n_err, w${k}c.w0, w${k}c.w1, w${k}c.w2 FROM e$k, w${k}c")
        .mkString("\n  UNION ALL\n")}
         |) ORDER BY round""".stripMargin
    },
    "Per round: ONE map-side-combined agg over the corpus against broadcast " +
      "1-row weights (no driver state, no per-example sequencing) — the " +
      "order-independent batch form is the only perceptron that can be " +
      "bit-reproducible on a cluster. Rounds are the sole sequential axis; " +
      "each is a single corpus pass at any scale.")

  /** q347 — E4+/E8: DSIR importance scores — every doc outside the
    * target sources (src0/src1) scored by Σ ln[p_target(b)/p_raw(b)]
    * over md5-hashed unigram buckets (256), Laplace-smoothed,
    * micro-nat-quantized per bucket so the doc sum is exact. The
    * data-selection step that upweights target-like raw documents. */
  val q347 = Declared(
    "q347_dsir_scores", "E4+,E8",
    (s, dir) => Curation.dsirScores(Tables.documents(s, dir),
        "text", "doc_id",
        isTarget = col("source").isin("src0", "src1"), buckets = 256)
      .orderBy(col("doc_id")),
    Some(s"""WITH tok AS (
           |  SELECT doc_id, source IN ('src0', 'src1') AS t,
           |    unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
           |  FROM documents),
           |tb AS (
           |  SELECT doc_id, t, ${duckMd5Hash60("term")} % 256 AS b
           |  FROM tok),
           |counts AS (
           |  SELECT b,
           |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
           |    CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS cr
           |  FROM tb GROUP BY b),
           |tot AS (
           |  SELECT CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
           |    CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS nr
           |  FROM tb),
           |model AS (
           |  SELECT b, CAST(round((
           |      ln(CAST(ct + 1 AS DOUBLE)) - ln(CAST(nt + 256 AS DOUBLE)) -
           |      ln(CAST(cr + 1 AS DOUBLE)) + ln(CAST(nr + 256 AS DOUBLE))
           |    ) * 1e6, 0) AS BIGINT) AS lr_u
           |  FROM counts, tot)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           |  CAST(sum(lr_u) AS BIGINT) AS score_u
           |FROM tb JOIN model USING (b)
           |WHERE NOT t GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "Two bucket-keyed token aggs (uniform by hashing) + a broadcast 256-row " +
      "model joined back onto the token scan — the model is O(buckets), never " +
      "O(vocab), and no shuffle is wider than the token explode. The " +
      "importance-resampling selector at any raw-corpus size.")

  /** q348 — E1+/E7: exact cross-document substring spans (Lee et al.,
    * ACL 2022) — every maximal run of >= 12 shared consecutive tokens
    * between two docs, found via 8-token-gram diagonal islands.
    * Inputs are long docs plus planted partial copies (tokens 11..50
    * of each source re-issued as id+100000 with a unique tail), so
    * true shared spans exist at a known offset and length. */
  val q348 = Declared(
    "q348_substring_spans", "E1+,E7",
    (s, dir) => {
      val base = Tables.documents(s, dir)
        .filter(col("doc_id") < 150 &&
          size(split(lower(col("text")), "\\s+")) >= 50)
        .select(col("doc_id"), col("text"))
      val planted = base.select((col("doc_id") + 100000).as("doc_id"),
        concat(
          concat_ws(" ", slice(split(lower(col("text")), "\\s+"), 11, 40)),
          lit(" ptail"), col("doc_id").cast("string")).as("text"))
      graft.ext.Dedup.substringSpans(base.unionByName(planted),
          "text", "doc_id", k = 8, minSpanTokens = 12)
        .select(col("id_a"), col("id_b"), col("start_a"), col("start_b"),
          col("len_tokens"))
        .orderBy(col("id_a"), col("id_b"), col("start_a"))
    },
    Some(s"""WITH base AS (
           |  SELECT doc_id, lower(text) AS text
           |  FROM documents
           |  WHERE doc_id < 150
           |    AND len(regexp_split_to_array(lower(text), '\\s+')) >= 50),
           |corpus AS (
           |  SELECT doc_id, text FROM base
           |  UNION ALL
           |  SELECT doc_id + 100000,
           |    array_to_string(list_slice(
           |      regexp_split_to_array(text, '\\s+'), 11, 50), ' ')
           |      || ' ptail' || CAST(doc_id AS VARCHAR)
           |  FROM base),
           |tk AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
           |       FROM corpus),
           |gs AS (
           |  SELECT doc_id, p AS pos,
           |    array_to_string(list_slice(t, p, p + 7), ' ') AS gtxt
           |  FROM tk, LATERAL (SELECT unnest(range(1, len(t) - 8 + 2)) AS p)),
           |g AS (
           |  -- NOTE: the md5-60 helper's internal unnest alias is `i`;
           |  -- hashing a pre-computed column avoids capture
           |  SELECT doc_id, pos, ${duckMd5Hash60("gtxt")} AS g FROM gs),
           |mt AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
           |  FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id),
           |isl AS (
           |  SELECT *, pos_a - row_number() OVER (
           |    PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS grp
           |  FROM mt)
           |SELECT id_a, id_b,
           |  CAST(min(pos_a) AS BIGINT) AS start_a,
           |  CAST(min(pos_b) AS BIGINT) AS start_b,
           |  CAST(max(pos_a) - min(pos_a) + 8 AS BIGINT) AS len_tokens
           |FROM isl GROUP BY id_a, id_b, diag, grp
           |HAVING max(pos_a) - min(pos_a) + 8 >= 12
           |ORDER BY id_a, id_b, start_a""".stripMargin),
    "The gram join is keyed on CONTENT hash — uniform except boilerplate grams " +
      "(real skew: AQE skew-split, or drop top-frequency grams first, which is " +
      "exactly what line-dedup removes). The islands window partitions by " +
      "(pair, diagonal), never globally; pair volume is match-bounded, not " +
      "|docs|^2. The exact-substring half of the ACL 2022 dedup paper as a plan.")

  /** q349 — E4+/A-eval: LLM watermark detection (Kirchenbauer et al.,
    * ICML 2023, γ = 1/2): per doc, the green-token fraction under the
    * md5-parity green-list partition and its one-proportion z-score —
    * natural text sits near z = 0, watermarked generations far
    * positive. The z is (2g−n)/√n over exact integers: ÷ and √ are
    * correctly-rounded IEEE, so the double hash-compares. */
  val q349 = Declared(
    "q349_watermark_detect", "E4+,A-eval",
    (s, dir) => graft.ext.TextAnalysis.watermarkGreenStats(
        Tables.documents(s, dir), "text", "doc_id")
      .orderBy(col("doc_id")),
    Some(s"""WITH tk AS (
           |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
           |  FROM documents),
           |pr AS (
           |  SELECT doc_id, t[i - 1] || '|' || t[i] AS pair
           |  FROM tk, LATERAL (SELECT unnest(range(2, len(t) + 1)) AS i)
           |  WHERE len(t) >= 2),
           |sc AS (
           |  SELECT doc_id,
           |    CASE WHEN ${duckMd5Hash60("pair")} % 2 = 0 THEN 1 ELSE 0 END AS green
           |  FROM pr)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
           |  CAST(sum(green) AS BIGINT) AS n_green,
           |  CAST(2 * sum(green) - count(*) AS DOUBLE) /
           |    sqrt(CAST(count(*) AS DOUBLE)) AS z
           |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "One scan-side pair explode (the lag pair comes from the same doc's token " +
      "array — no join) + a doc-keyed agg with map-side combine. The provenance " +
      "screen a training pipeline runs over crawl data to keep synthetic " +
      "(watermarked) generations out of the pretraining mix.")

  /** q350 — E3+/E6: greedy k-center coreset selection (Gonzalez 1985
    * farthest-point traversal) over the embeddings — 6 picks, exact
    * integer distances, ties to the lower id. Each row is one pick
    * with its distance-to-selected-set at pick time; the oracle
    * replays every round's argmax, so any divergence in any round
    * trips the hash. */
  val q350 = Declared(
    "q350_kcenter_coreset", "E3+,E6",
    (s, dir) => Clustering.kCenterSelect(
        Tables.embeddings(s, dir).filter(col("vec_id") < 200),
        "vec_id", "embedding", k = 6)
      .orderBy(col("sel_order")),
    Some {
      def round(r: Int): String =
        s"""nd$r AS (
           |  SELECT p.id, CAST(sum((p.q - c.q) * (p.q - c.q)) AS BIGINT) AS nd
           |  FROM pts p JOIN (SELECT d, q FROM pts, s${r - 1} WHERE id = cid) c
           |    USING (d)
           |  GROUP BY p.id),
           |m$r AS (
           |  SELECT m.id, least(m.mind, nd$r.nd) AS mind
           |  FROM m${r - 1} m JOIN nd$r USING (id)
           |  WHERE m.id <> (SELECT cid FROM s${r - 1})),
           |s$r AS (SELECT id AS cid, mind FROM m$r ORDER BY mind DESC, id LIMIT 1)"""
          .stripMargin
      s"""WITH pts AS (
         |  SELECT vec_id AS id, i - 1 AS d,
         |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
         |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx
         |  WHERE vec_id < 200),
         |s1 AS (SELECT min(id) AS cid FROM pts),
         |m1 AS (
         |  SELECT id, CAST(9223372036854775807 AS BIGINT) AS mind
         |  FROM (SELECT DISTINCT id FROM pts)),
         |${(2 to 6).map(round).mkString(",\n")}
         |SELECT CAST(1 AS BIGINT) AS sel_order, cid AS id,
         |  CAST(0 AS BIGINT) AS dist2 FROM s1
         |${(2 to 6).map(r =>
        s"UNION ALL SELECT CAST($r AS BIGINT), cid, mind FROM s$r").mkString("\n")}
         |ORDER BY sel_order""".stripMargin
    },
    "Each round is ONE broadcast-1-row crossJoin + least() over the points and " +
      "one TakeOrdered(1) argmax — O(n k dim) total, the farthest-point lower " +
      "bound; k rounds is the only sequential axis. The diversity/coreset " +
      "sampler that picks what random sampling at 100 TB never finds: the tails.")

  val all: Seq[Declared] = Seq(q345, q346, q347, q348, q349, q350)
}
