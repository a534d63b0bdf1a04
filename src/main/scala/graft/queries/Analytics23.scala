package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Evaluation, Privacy}
import graft.ext.TextAnalysis

/** Round-5 batch 42: t-closeness (completing the privacy-audit triad),
  * the unbiased pass@k estimator, and ROUGE-L via the native
  * token-LCS codegen expression. */
object Analytics23 {

  /** q328 — A-privacy: t-closeness of account-balance brackets within
    * (nation, market-segment) classes — the audit that catches a
    * "diverse" class whose sensitive values all sit in one tail.
    * Fraction-cleared integer EMD; per-class rows. */
  val q328 = Declared(
    "q328_t_closeness", "A-privacy",
    (s, dir) => Privacy.tClosenessPerClass(
        Tables.customer(s, dir),
        Seq(col("c_nationkey").as("nation"), col("c_mktsegment").as("segment")),
        floor(col("c_acctbal") / 2000.0).cast("long"))
      .orderBy(col("nation"), col("segment")),
    Some("""WITH cells AS (
           |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
           |    CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS v
           |  FROM customer),
           |bcv AS (
           |  SELECT nation, segment, v, CAST(count(*) AS BIGINT) AS c
           |  FROM cells GROUP BY 1, 2, 3),
           |gbv AS (
           |  SELECT v, CAST(sum(c) AS BIGINT) AS g,
           |    CAST(sum(sum(c)) OVER (ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS cumg
           |  FROM bcv GROUP BY v),
           |tot AS (SELECT CAST(sum(g) AS BIGINT) AS n_tot,
           |        CAST(count(*) AS BIGINT) AS m FROM gbv),
           |cls AS (SELECT DISTINCT nation, segment FROM bcv),
           |lat AS (
           |  SELECT cls.nation, cls.segment, gbv.v, gbv.cumg
           |  FROM cls CROSS JOIN gbv),
           |d AS (
           |  SELECT l.nation, l.segment, l.v, l.cumg,
           |    coalesce(b.c, 0) AS c
           |  FROM lat l LEFT JOIN bcv b
           |    ON b.nation = l.nation AND b.segment = l.segment AND b.v = l.v),
           |e AS (
           |  SELECT *,
           |    sum(c) OVER (PARTITION BY nation, segment ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
           |    sum(c) OVER (PARTITION BY nation, segment) AS nclass
           |  FROM d),
           |f AS (
           |  SELECT nation, segment, max(nclass) AS n,
           |    CAST(sum(abs(CAST(cumc AS HUGEINT) * n_tot -
           |      CAST(cumg AS HUGEINT) * nclass)) AS HUGEINT) AS emd,
           |    max(n_tot) AS n2, max(m) AS m2
           |  FROM e CROSS JOIN tot
           |  GROUP BY nation, segment)
           |SELECT nation, segment, CAST(n AS BIGINT) AS n,
           |  CAST(emd AS BIGINT) AS emd_num,
           |  CAST((1000000 * emd) //
           |    (CAST(n AS HUGEINT) * n2 * (m2 - 1)) AS BIGINT) AS t_ppm
           |FROM f ORDER BY nation, segment""".stripMargin),
    "One (QI, value) agg; cumulative windows PARTITIONED per class; the " +
      "densify lattice is classes x distinct-values (contingency-sized). " +
      "Completes the k-anonymity/l-diversity/t-closeness release triad with " +
      "the same bit-reproducible integer discipline.")

  /** q329 — A-eval: unbiased pass@5 per 50 synthetic tasks (customer
    * cohorts; 'correct' = high-priority order). The binomial-ratio
    * product folds index-order in both engines; nano-quantized
    * per-task, integer-averaged for the summary row. */
  val q329 = Declared(
    "q329_pass_at_k", "A-eval",
    (s, dir) => Evaluation.passAtK(Tables.orders(s, dir),
        col("o_custkey") % 50,
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"), k = 5)
      .orderBy(col("task")),
    Some("""WITH t AS (
           |  SELECT CAST(o_custkey % 50 AS BIGINT) AS task,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           |      THEN 1 ELSE 0 END) AS BIGINT) AS c
           |  FROM orders GROUP BY 1),
           |f AS (SELECT task, n, c FROM t WHERE n >= 5),
           |p AS (
           |  SELECT task, n, c,
           |    CAST(round((1.0 - list_reduce(
           |      list_prepend(CAST(1.0 AS DOUBLE),
           |        list_transform(range(0, 5), i ->
           |          CAST(CASE WHEN n - c - i <= 0 THEN -1 ELSE i END
           |            AS DOUBLE))),
           |      (acc, i) -> CASE WHEN i < 0 THEN CAST(0.0 AS DOUBLE)
           |        ELSE acc * (CAST(n - c AS DOUBLE) - i) /
           |          (CAST(n AS DOUBLE) - i) END)) * 1e9, 0) AS BIGINT)
           |      AS pass_nano
           |  FROM f)
           |SELECT task, n, c, pass_nano FROM p
           |UNION ALL
           |SELECT CAST(NULL AS BIGINT), CAST(count(*) AS BIGINT),
           |  CAST(sum(c) AS BIGINT),
           |  CAST(sum(pass_nano) // count(*) AS BIGINT)
           |FROM p
           |ORDER BY task""".stripMargin),
    "One task-grain agg; the fold is k scalar steps per TASK row. The " +
      "estimator every code-eval harness needs, computed where the sample " +
      "logs live instead of in a notebook.")

  /** q330 — A-eval: ROUGE-L between paired documents (doc i vs
    * doc i+250, first 60 tokens each) through the native TokenLcs
    * codegen expression; the oracle replays the LCS DP row by row in
    * a recursive CTE with an in-row list fold. */
  val q330 = Declared(
    "q330_rouge_l", "A-eval",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val cand = d.filter(col("doc_id") < 40)
        .select(col("doc_id").as("pair_id"), col("text").as("cand"))
      val ref = d.filter(col("doc_id") >= 250 && col("doc_id") < 290)
        .select((col("doc_id") - 250).as("pair_id"), col("text").as("ref"))
      // filter empties BEFORE the 60-token cut (the oracle slices the
      // filtered list), then rejoin — tokens carry no whitespace, so
      // the round trip through rougeL's splitter is exact
      def cut(c: org.apache.spark.sql.Column) = concat_ws(" ",
        slice(filter(split(lower(c), "\\s+"), x => x =!= ""), 1, 60))
      val pairs = cand.join(ref, "pair_id")
        .select(col("pair_id"), cut(col("cand")).as("cand"),
          cut(col("ref")).as("ref"))
      TextAnalysis.rougeL(pairs, "pair_id", "cand", "ref")
        .orderBy(col("pair_id"))
    },
    Some("""WITH RECURSIVE prs AS (
           |  SELECT a.doc_id AS pair_id,
           |    list_filter(regexp_split_to_array(lower(a.text), '\s+'),
           |      x -> x <> '')[1:60] AS ct,
           |    list_filter(regexp_split_to_array(lower(b.text), '\s+'),
           |      x -> x <> '')[1:60] AS rt
           |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 250
           |  WHERE a.doc_id < 40),
           |mx AS (SELECT max(len(ct)) AS mm FROM prs),
           |lcsr(step, pair_id, dp) AS (
           |  SELECT 0, pair_id,
           |    list_transform(range(0, len(rt) + 1), x -> CAST(0 AS INT))
           |  FROM prs
           |  UNION ALL
           |  SELECT step + 1, s.pair_id,
           |    CASE WHEN step < len(p.ct) THEN
           |      list_reduce(
           |        list_prepend([CAST(0 AS INT)],
           |          list_transform(range(1, len(p.rt) + 1), j -> [CAST(j AS INT)])),
           |        (acc, x) -> list_append(acc,
           |          CASE WHEN p.ct[s.step + 1] = p.rt[x[1]]
           |            THEN s.dp[x[1]] + 1
           |            ELSE greatest(s.dp[x[1] + 1], acc[-1]) END))
           |    ELSE s.dp END
           |  FROM lcsr s JOIN prs p USING (pair_id) CROSS JOIN mx
           |  WHERE s.step < mx.mm),
           |fin AS (
           |  SELECT l.pair_id, p.ct, p.rt, l.dp[len(p.rt) + 1] AS lcs
           |  FROM lcsr l JOIN prs p USING (pair_id) CROSS JOIN mx
           |  WHERE l.step = mx.mm)
           |SELECT pair_id,
           |  CAST(len(ct) AS BIGINT) AS n_tok_cand,
           |  CAST(len(rt) AS BIGINT) AS n_tok_ref,
           |  CAST(lcs AS BIGINT) AS lcs,
           |  (1000000 * CAST(lcs AS BIGINT)) // len(ct) AS p_ppm,
           |  (1000000 * CAST(lcs AS BIGINT)) // len(rt) AS r_ppm,
           |  (2000000 * CAST(lcs AS BIGINT)) // (len(ct) + len(rt)) AS f_ppm
           |FROM fin ORDER BY pair_id""".stripMargin),
    "Pure scan-side: no explode, no join — the DP runs as one static " +
      "codegen call per pair. The reorder-tolerant eval score next to q296's " +
      "bigram ROUGE-2; at distillation scale the kernel cost IS the " +
      "algorithm, and the plan adds nothing.")

  val all: Seq[Declared] = Seq(q328, q329, q330)
}
