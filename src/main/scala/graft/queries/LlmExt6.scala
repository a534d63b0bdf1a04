package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Similarity, TextAnalysis}
import graft.ops.Associations

/** Round-4 batch 26 — the evaluation/compression side of the LLM-data
  * surface: ROUGE-2 pair scoring, item-item cosine collaborative
  * filtering, Kneser–Ney LM scoring, deterministic ±1 Johnson–
  * Lindenstrauss embedding compression with a distortion audit, and
  * n-gram novelty (the cheap memorization screen). Exactness
  * discipline unchanged: integer counts, ppm/micro-nat quantization,
  * IEEE finishes mirrored token-for-token in the oracle SQL. */
object LlmExt6 {

  /** q237 — E4/eval: ROUGE-2 between adjacent document pairs —
    * clipped bigram-multiset overlap with exact-ppm P/R/F1. The
    * pairwise fidelity score a summarization/distillation pipeline
    * tracks; adjacent unrelated docs give the low-overlap baseline
    * band. */
  val q237 = Declared(
    "q237_rouge_overlap", "E4,eval",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val cand = docs.filter(col("doc_id") < 30)
        .select(col("doc_id").as("pair_id"), col("text").as("cand"))
      val ref = docs.filter(col("doc_id") >= 1 && col("doc_id") <= 30)
        .select((col("doc_id") - 1).as("pair_id"), col("text").as("ref"))
      TextAnalysis.rouge2(cand.join(ref, "pair_id"), "pair_id", "cand", "ref")
        .orderBy(col("pair_id"))
    },
    Some("""WITH d AS (SELECT doc_id, text FROM documents),
           |p AS (
           |  SELECT a.doc_id AS pair_id, a.text AS ca, b.text AS rf
           |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
           |  WHERE a.doc_id < 30),
           |cb AS (
           |  SELECT pair_id, t[i] || ' ' || t[i + 1] AS g, count(*) AS cc
           |  FROM (SELECT pair_id, regexp_split_to_array(lower(ca), '\s+') AS t,
           |          unnest(range(1, len(regexp_split_to_array(lower(ca), '\s+')))) AS i
           |        FROM p)
           |  GROUP BY pair_id, g),
           |rb AS (
           |  SELECT pair_id, t[i] || ' ' || t[i + 1] AS g, count(*) AS cr
           |  FROM (SELECT pair_id, regexp_split_to_array(lower(rf), '\s+') AS t,
           |          unnest(range(1, len(regexp_split_to_array(lower(rf), '\s+')))) AS i
           |        FROM p)
           |  GROUP BY pair_id, g),
           |ov AS (SELECT pair_id, CAST(sum(least(cc, cr)) AS BIGINT) AS ovl
           |       FROM cb JOIN rb USING (pair_id, g) GROUP BY pair_id),
           |nc AS (SELECT pair_id, CAST(sum(cc) AS BIGINT) AS n_bi_cand
           |       FROM cb GROUP BY pair_id),
           |nr AS (SELECT pair_id, CAST(sum(cr) AS BIGINT) AS n_bi_ref
           |       FROM rb GROUP BY pair_id)
           |SELECT nc.pair_id, n_bi_cand, n_bi_ref,
           |  coalesce(ovl, 0) AS overlap,
           |  1000000 * coalesce(ovl, 0) // n_bi_cand AS p_ppm,
           |  1000000 * coalesce(ovl, 0) // n_bi_ref AS r_ppm,
           |  2000000 * coalesce(ovl, 0) // (n_bi_cand + n_bi_ref) AS f1_ppm
           |FROM nc JOIN nr USING (pair_id) LEFT JOIN ov USING (pair_id)
           |ORDER BY pair_id""".stripMargin),
    "Both sides reduce to (pair, bigram, count) rollups — content-keyed, " +
      "map-side combinable — and the clip join keys on (pair, gram). Linear " +
      "in total text, no pair², so scoring a billion generated/reference " +
      "pairs is one shuffle on uniform keys.")

  /** q238 — E2+/ML: item-item cosine collaborative filtering over the
    * customer–part incidence — with binary ratings the dot product is
    * the shared-customer count and norms are √degree, so every score
    * is a pinned IEEE expression over exact integers. Top-20 pairs,
    * support ≥ 2. */
  val q238 = Declared(
    "q238_item_cf", "E2+,ML",
    (s, dir) => Associations.itemCosine(
      Tables.lineitem(s, dir).join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_partkey")),
      col("o_custkey"), col("l_partkey"), minCommon = 2L, topK = 20),
    Some("""WITH bi AS (
           |  SELECT DISTINCT o_custkey AS b, l_partkey AS i
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |deg AS (SELECT i, count(*) AS n FROM bi GROUP BY i),
           |pr AS (
           |  SELECT a.i AS item_a, b2.i AS item_b,
           |    CAST(count(*) AS BIGINT) AS n_common
           |  FROM bi a JOIN bi b2 ON a.b = b2.b AND a.i < b2.i
           |  GROUP BY 1, 2 HAVING count(*) >= 2)
           |SELECT item_a, item_b, n_common,
           |  CAST(da.n AS BIGINT) AS n_a, CAST(db.n AS BIGINT) AS n_b,
           |  CAST(round(CAST(n_common AS DOUBLE) /
           |    (sqrt(CAST(da.n AS DOUBLE)) * sqrt(CAST(db.n AS DOUBLE))) *
           |    1e6, 0) AS BIGINT) AS cos_ppm
           |FROM pr JOIN deg da ON da.i = item_a JOIN deg db ON db.i = item_b
           |ORDER BY cos_ppm DESC, item_a, item_b LIMIT 20""".stripMargin),
    "The pair space is Σ basket², never |items|² — the support filter " +
      "prunes BEFORE the degree joins, degrees join on item id (Zipf staples " +
      "→ AQE skew-split), TakeOrdered serves the top-k. The q202 co-purchase " +
      "kernel with the normalization a recommender actually ships.")

  /** q239 — E4: interpolated Kneser–Ney bigram scoring — even-doc
    * model scores odd-doc probes, backing off to CONTINUATION
    * probability (contexts, not frequency) with absolute discount
    * D = 0.75 (dyadic, so c−D is exact). The fourth rung of the
    * LM-quality ladder over q69/q90/q136; micro-nat quantization per
    * bigram keeps the per-doc mean engine-portable. */
  val q239 = Declared(
    "q239_kneser_ney", "E4",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.kneserNeyScore(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          "text", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""WITH m AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
           |p AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
           |mb AS (
           |  SELECT t[i] AS w1, t[i + 1] AS w2
           |  FROM (SELECT regexp_split_to_array(lower(text), '\s+') AS t,
           |          unnest(range(1, len(regexp_split_to_array(lower(text), '\s+')))) AS i
           |        FROM m)),
           |pair AS (SELECT w1, w2, count(*) AS nxy FROM mb GROUP BY w1, w2),
           |head AS (SELECT w1, sum(nxy) AS nhead, count(*) AS ta
           |         FROM pair GROUP BY w1),
           |cont AS (SELECT w2, count(*) AS nc FROM pair GROUP BY w2),
           |tot AS (SELECT
           |  (SELECT CAST(count(*) AS BIGINT) FROM pair) AS t_types,
           |  (SELECT CAST(count(DISTINCT w) AS BIGINT) FROM
           |     (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |      FROM m)) AS v_vocab),
           |pb AS (
           |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t,
           |          unnest(range(1, len(regexp_split_to_array(lower(text), '\s+')))) AS i
           |        FROM p)),
           |sc AS (
           |  SELECT pb.doc_id,
           |    CAST(round(CASE WHEN head.nhead IS NOT NULL
           |      THEN ln(greatest(CAST(coalesce(pair.nxy, 0) AS DOUBLE) - 0.75,
           |                       0.0) / CAST(head.nhead AS DOUBLE) +
           |              0.75 * CAST(head.ta AS DOUBLE) /
           |                CAST(head.nhead AS DOUBLE) *
           |                (CAST(coalesce(cont.nc, 0) + 1 AS DOUBLE) /
           |                 CAST(t_types + v_vocab AS DOUBLE)))
           |      ELSE ln(CAST(coalesce(cont.nc, 0) + 1 AS DOUBLE) /
           |              CAST(t_types + v_vocab AS DOUBLE))
           |      END * 1e6, 0) AS BIGINT) AS ls
           |  FROM pb
           |  LEFT JOIN pair ON pb.w1 = pair.w1 AND pb.w2 = pair.w2
           |  LEFT JOIN head ON pb.w1 = head.w1
           |  LEFT JOIN cont ON pb.w2 = cont.w2
           |  CROSS JOIN tot)
           |SELECT doc_id, count(*) AS n_bigrams,
           |  round(CAST(sum(ls) AS DOUBLE) / count(*) / 1e6, 6) AS mean_logkn
           |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "Identical production shape to q136 (model aggs content-keyed, probe " +
      "joins Zipf-head skew-split, scalars on a 1-row broadcast) — the " +
      "continuation rollup is one extra pair-rollup agg, so the better " +
      "smoothing costs nothing extra at scale.")

  private val JlSigns = Similarity.jlSigns(64, 16)

  private def jlSignRowsSql: String =
    JlSigns.zipWithIndex.map { case (row, k) =>
      s"(${k + 1}, [${row.map(v => if (v > 0) "1.0" else "-1.0").mkString(", ")}])"
    }.mkString(",\n")

  /** q240 — E3: Johnson–Lindenstrauss compression audit — embeddings
    * project 64→16 dims through a deterministic ±1 md5-seeded sign
    * matrix (Achlioptas'01), and the query reports original vs
    * projected cosine for every probe pair plus the ppm distortion.
    * The shuffle-diet decision (4× fewer bytes) made measurable; the
    * oracle interpolates the SAME public sign literals. */
  val q240 = Declared(
    "q240_jl_distortion", "E3",
    (s, dir) => {
      val e = Tables.embeddings(s, dir).filter(col("vec_id") < 12)
        .withColumn("p", Similarity.jlProject(col("embedding"), JlSigns))
        .select(col("vec_id"), col("embedding"), col("p"))
      val a = e.toDF("vec_id_a", "va", "pa")
      val b = e.toDF("vec_id_b", "vb", "pb")
      a.join(b, col("vec_id_a") < col("vec_id_b"))
        .withColumn("cos_orig", round(Similarity.cosine(col("va"), col("vb")), 6))
        .withColumn("cos_proj", round(Similarity.cosine(col("pa"), col("pb")), 6))
        .withColumn("dist_ppm",
          round(abs(col("cos_orig") - col("cos_proj")) * 1e6, 0).cast("long"))
        .select(col("vec_id_a"), col("vec_id_b"), col("cos_orig"),
          col("cos_proj"), col("dist_ppm"))
        .orderBy(col("vec_id_a"), col("vec_id_b"))
    },
    Some(s"""WITH sm(k, sv) AS (VALUES
            |$jlSignRowsSql),
            |e AS (SELECT vec_id,
            |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            |      FROM embeddings WHERE vec_id < 12),
            |pr AS (SELECT vec_id, list(list_dot_product(v, sv) ORDER BY k) AS p
            |       FROM e CROSS JOIN sm GROUP BY vec_id),
            |j AS (SELECT e.vec_id, v, p FROM e JOIN pr USING (vec_id)),
            |pairs AS (
            |  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
            |    round(list_dot_product(a.v, b.v) /
            |      (sqrt(list_dot_product(a.v, a.v)) *
            |       sqrt(list_dot_product(b.v, b.v))), 6) AS cos_orig,
            |    round(list_dot_product(a.p, b.p) /
            |      (sqrt(list_dot_product(a.p, a.p)) *
            |       sqrt(list_dot_product(b.p, b.p))), 6) AS cos_proj
            |  FROM j a JOIN j b ON a.vec_id < b.vec_id)
            |SELECT vec_id_a, vec_id_b, cos_orig, cos_proj,
            |  CAST(round(abs(cos_orig - cos_proj) * 1e6, 0) AS BIGINT)
            |    AS dist_ppm
            |FROM pairs ORDER BY vec_id_a, vec_id_b""".stripMargin),
    "The projection is 16 index-order arrayDot kernels against literal sign " +
      "rows — codegen'd, no UDF, no shuffle; at 100 TB the projected column " +
      "replaces the raw one in every downstream pair join, cutting shuffle " +
      "bytes 4× for ~2% cosine distortion (this query MEASURES that claim).")

  /** q241 — A-stat/E4: Krippendorff's α with abstentions — the
    * length-gate rater vs a word-count rater that abstains on short
    * docs. Units missing a rating drop from the pairable set; chance
    * disagreement comes from the POOLED value distribution (the κ
    * difference). All-integer; one IEEE finish. */
  val q241 = Declared(
    "q241_krippendorff", "A-stat,E4",
    (s, dir) => graft.ops.Evaluation.krippendorffAlpha(
      Tables.documents(s, dir),
      when(col("n_chars") >= 300, "keep").otherwise("drop"),
      when(col("n_chars") < 120, lit(null).cast("string"))
        .otherwise(when(length(col("text")) -
          length(replace(col("text"), lit(" "), lit(""))) >= 49, "keep")
          .otherwise("drop"))),
    Some("""WITH r AS (
           |  SELECT CASE WHEN n_chars >= 300 THEN 'keep' ELSE 'drop' END AS a,
           |    CASE WHEN n_chars < 120 THEN NULL
           |         WHEN length(text) - length(replace(text, ' ', '')) >= 49
           |         THEN 'keep' ELSE 'drop' END AS b
           |  FROM documents),
           |pair AS (SELECT a, b FROM r
           |         WHERE a IS NOT NULL AND b IS NOT NULL),
           |pooled AS (
           |  SELECT v, count(*) AS nv
           |  FROM (SELECT a AS v FROM pair UNION ALL SELECT b FROM pair)
           |  GROUP BY v),
           |vals AS (SELECT CAST(count(*) AS BIGINT) AS n_values,
           |  CAST(sum(nv) AS HUGEINT) AS n,
           |  CAST(sum(CAST(nv AS HUGEINT) * nv) AS HUGEINT) AS sq
           |  FROM pooled),
           |dis AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
           |  CAST(2 * sum(CASE WHEN a <> b THEN 1 ELSE 0 END) AS HUGEINT)
           |    AS dnum
           |  FROM pair)
           |SELECT n_units, n_values, CAST(dnum AS BIGINT) AS do_num,
           |  CAST(n * n - sq AS BIGINT) AS de_num,
           |  round(1.0 - CAST((n - 1) * dnum AS DOUBLE) /
           |        CAST(n * n - sq AS DOUBLE), 6) AS alpha
           |FROM dis CROSS JOIN vals""".stripMargin),
    "One unit-grain projection, one value-sized pooled rollup, a scalar " +
      "finish — same cost as κ but correct when annotators skip units, which " +
      "is every real labeling queue.")

  /** q242 — E4/E7: trigram novelty of odd docs against the even-doc
    * corpus — the fraction of each probe doc's trigram OCCURRENCES
    * whose TYPE the model corpus never saw. The cheap memorization /
    * split-leakage screen complementing q75's exact-match
    * decontamination. Integer counts; ppm via integer div. */
  val q242 = Declared(
    "q242_ngram_novelty", "E4,E7",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.ngramNovelty(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1 && col("doc_id") < 1000),
          "text", "doc_id", n = 3)
        .orderBy(col("doc_id"))
    },
    Some("""WITH m AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
           |known AS (
           |  SELECT DISTINCT t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g
           |  FROM (SELECT regexp_split_to_array(lower(text), '\s+') AS t,
           |          unnest(range(1, len(regexp_split_to_array(lower(text), '\s+')) - 1)) AS i
           |        FROM m)),
           |pg AS (
           |  SELECT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g
           |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t,
           |          unnest(range(1, len(regexp_split_to_array(lower(text), '\s+')) - 1)) AS i
           |        FROM documents WHERE doc_id % 2 = 1 AND doc_id < 1000))
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           |  CAST(sum(CASE WHEN known.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_unseen,
           |  1000000 * CAST(sum(CASE WHEN known.g IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) // CAST(count(*) AS BIGINT) AS novelty_ppm
           |FROM pg LEFT JOIN known ON pg.g = known.g
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "The model's trigram TYPE set is a content-keyed distinct; the probe " +
      "joins it on the gram value — an equi-join on uniform content hashes, " +
      "no pair space. At 100 TB the gram key becomes xxhash64(gram) to cut " +
      "shuffle bytes (q55's fingerprint diet), same verdicts.")

  val all: Seq[Declared] = Seq(q237, q238, q239, q240, q241, q242)
}
