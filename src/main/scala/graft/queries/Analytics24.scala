package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Curation

/** Round-5 batch 43: training-batch padding economics and BLEU. */
object Analytics24 {

  /** q331 — E7: padding-waste audit of 32-token length buckets over
    * document token lengths — how much compute the bucketing saves vs
    * padding everything to the global max. All integers. */
  val q331 = Declared(
    "q331_padding_waste", "E7",
    (s, dir) => Curation.paddingWasteAudit(
        Tables.documents(s, dir).select(
          size(expr("filter(split(lower(text), '\\\\s+'), x -> x <> '')"))
            .cast("long").as("len")),
        col("len"), bucketWidth = 32)
      .orderBy(col("bucket")),
    Some("""WITH s AS (
           |  SELECT CAST(len(list_filter(
           |    regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))
           |    AS BIGINT) AS l
           |  FROM documents),
           |b AS (
           |  SELECT l // 32 AS bucket, CAST(count(*) AS BIGINT) AS n_seqs,
           |    max(l) AS max_len, CAST(sum(l) AS BIGINT) AS token_sum
           |  FROM s GROUP BY 1),
           |bb AS (
           |  SELECT bucket, n_seqs, max_len, token_sum,
           |    n_seqs * max_len AS padded_sum
           |  FROM b),
           |t AS (
           |  SELECT CAST(NULL AS BIGINT) AS bucket,
           |    CAST(sum(n_seqs) AS BIGINT) AS n_seqs,
           |    max(max_len) AS max_len,
           |    CAST(sum(token_sum) AS BIGINT) AS token_sum,
           |    CAST(sum(padded_sum) AS BIGINT) AS padded_sum
           |  FROM bb)
           |SELECT bucket, n_seqs, max_len, token_sum, padded_sum,
           |  CASE WHEN padded_sum > 0 THEN
           |    (1000000 * (padded_sum - token_sum)) // padded_sum
           |    ELSE 0 END AS waste_ppm,
           |  CAST(NULL AS BIGINT) AS baseline_waste_ppm
           |FROM bb
           |UNION ALL
           |SELECT bucket, n_seqs, max_len, token_sum, padded_sum,
           |  (1000000 * (padded_sum - token_sum)) // padded_sum,
           |  (1000000 * (n_seqs * max_len - token_sum)) //
           |    (n_seqs * max_len)
           |FROM t
           |ORDER BY bucket""".stripMargin),
    "One bucket-keyed agg with map-side combine. The number that sizes a " +
      "training run's real token throughput: padding is compute spent on " +
      "nothing, and this prices every bucketing scheme before the run.")

  /** q332 — A-eval: smoothed BLEU-2 between paired documents (the
    * q330 pairs) — clipped n-gram precisions, brevity penalty, one
    * pinned IEEE finish nano-quantized. */
  val q332 = Declared(
    "q332_bleu", "A-eval",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val cand = d.filter(col("doc_id") < 40)
        .select(col("doc_id").as("pair_id"), col("text").as("cand"))
      val ref = d.filter(col("doc_id") >= 250 && col("doc_id") < 290)
        .select((col("doc_id") - 250).as("pair_id"), col("text").as("ref"))
      Curation.bleu(cand.join(ref, "pair_id"), "pair_id", "cand", "ref",
          maxN = 2)
        .orderBy(col("pair_id"))
    },
    Some("""WITH prs AS (
           |  SELECT a.doc_id AS pid,
           |    list_filter(regexp_split_to_array(lower(a.text), '\s+'),
           |      x -> x <> '') AS ct,
           |    list_filter(regexp_split_to_array(lower(b.text), '\s+'),
           |      x -> x <> '') AS rt
           |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 250
           |  WHERE a.doc_id < 40),
           |c1 AS (
           |  SELECT pid, g, CAST(count(*) AS BIGINT) AS cc FROM
           |    (SELECT pid, unnest(ct) AS g FROM prs) GROUP BY 1, 2),
           |r1 AS (
           |  SELECT pid, g, CAST(count(*) AS BIGINT) AS cr FROM
           |    (SELECT pid, unnest(rt) AS g FROM prs) GROUP BY 1, 2),
           |ov1 AS (
           |  SELECT pid, CAST(sum(least(cc, cr)) AS BIGINT) AS ov
           |  FROM c1 JOIN r1 USING (pid, g) GROUP BY pid),
           |t1 AS (SELECT pid, CAST(sum(cc) AS BIGINT) AS tot
           |       FROM c1 GROUP BY pid),
           |c2 AS (
           |  SELECT pid, g, CAST(count(*) AS BIGINT) AS cc FROM
           |    (SELECT pid, ct[i] || ' ' || ct[i + 1] AS g
           |     FROM (SELECT pid, ct, unnest(range(1, len(ct))) AS i FROM prs))
           |  GROUP BY 1, 2),
           |r2 AS (
           |  SELECT pid, g, CAST(count(*) AS BIGINT) AS cr FROM
           |    (SELECT pid, rt[i] || ' ' || rt[i + 1] AS g
           |     FROM (SELECT pid, rt, unnest(range(1, len(rt))) AS i FROM prs))
           |  GROUP BY 1, 2),
           |ov2 AS (
           |  SELECT pid, CAST(sum(least(cc, cr)) AS BIGINT) AS ov
           |  FROM c2 JOIN r2 USING (pid, g) GROUP BY pid),
           |t2 AS (SELECT pid, CAST(sum(cc) AS BIGINT) AS tot
           |       FROM c2 GROUP BY pid),
           |j AS (
           |  SELECT p.pid, CAST(len(p.ct) AS BIGINT) AS c_len,
           |    CAST(len(p.rt) AS BIGINT) AS r_len,
           |    coalesce(ov1.ov, 0) AS overlap_1,
           |    coalesce(t1.tot, 0) AS tot1,
           |    coalesce(ov2.ov, 0) AS overlap_2,
           |    coalesce(t2.tot, 0) AS tot2
           |  FROM prs p
           |  LEFT JOIN ov1 ON ov1.pid = p.pid
           |  LEFT JOIN t1 ON t1.pid = p.pid
           |  LEFT JOIN ov2 ON ov2.pid = p.pid
           |  LEFT JOIN t2 ON t2.pid = p.pid)
           |SELECT pid AS pair_id, c_len, r_len, overlap_1, overlap_2,
           |  CAST(round(
           |    (CASE WHEN c_len >= r_len THEN 1.0
           |      ELSE exp(1.0 - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE))
           |      END) *
           |    exp((ln(CAST(overlap_1 + 1 AS DOUBLE) /
           |           CAST(tot1 + 1 AS DOUBLE)) +
           |         ln(CAST(overlap_2 + 1 AS DOUBLE) /
           |           CAST(tot2 + 1 AS DOUBLE))) / 2) * 1e9, 0) AS BIGINT)
           |    AS bleu_nano
           |FROM j ORDER BY pair_id""".stripMargin),
    "Explode to (pair, gram) rollups per order, min-join on (pair, gram) — " +
      "content-keyed, map-side combinable. The generation-fidelity precision " +
      "view next to q330's LCS recall view; both run where distillation " +
      "outputs land, not in a single-node scorer.")

  val all: Seq[Declared] = Seq(q331, q332)
}
