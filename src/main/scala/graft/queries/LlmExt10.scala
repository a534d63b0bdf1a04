package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Round-6 batch 56: post-training data-assembly ops — DPO
  * preference-pair construction, the best-of-n yield curve, and the
  * prefix-cache (RadixAttention-style) sharing audit. */
object LlmExt10 {

  private val scorePermil =
    "(CAST(size(array_distinct(split(lower(text), '\\\\s+'))) AS BIGINT) * 1000)" +
      " div CAST(size(split(lower(text), '\\\\s+')) AS BIGINT)"
  private val scorePermilSql =
    "len(list_distinct(regexp_split_to_array(lower(text), '\\s+'))) * 1000" +
      " // len(regexp_split_to_array(lower(text), '\\s+'))"

  /** q365 — E8/A-eval: DPO preference-pair construction (Rafailov et
    * al. 2023's data shape): per prompt group (source), pair the
    * highest-scored response with the lowest-scored one, keep pairs
    * whose margin clears a threshold. Chosen/rejected selection is a
    * total-order argmax/argmin (score, then id), so the pair set is a
    * pure function of the corpus. */
  val q365 = Declared(
    "q365_dpo_pairs", "E8,A-eval",
    (s, dir) => Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), expr(scorePermil).as("score"))
      .groupBy(col("source"))
      .agg(max(struct(col("score"), col("doc_id"))).as("__c"),
        min(struct(col("score"), col("doc_id"))).as("__r"))
      .select(col("source"),
        col("__c.doc_id").as("chosen_id"), col("__c.score").as("chosen_score"),
        col("__r.doc_id").as("rejected_id"), col("__r.score").as("rejected_score"),
        (col("__c.score") - col("__r.score")).as("margin"))
      .filter(col("margin") >= 100)
      .orderBy(col("source")),
    Some(s"""WITH sc AS (
           |  SELECT source, doc_id, $scorePermilSql AS score
           |  FROM documents),
           |ch AS (
           |  SELECT source, doc_id AS chosen_id, score AS chosen_score
           |  FROM (SELECT *, row_number() OVER (PARTITION BY source
           |    ORDER BY score DESC, doc_id DESC) AS rn FROM sc) WHERE rn = 1),
           |rj AS (
           |  SELECT source, doc_id AS rejected_id, score AS rejected_score
           |  FROM (SELECT *, row_number() OVER (PARTITION BY source
           |    ORDER BY score ASC, doc_id ASC) AS rn FROM sc) WHERE rn = 1)
           |SELECT ch.source, chosen_id, chosen_score, rejected_id,
           |  rejected_score, chosen_score - rejected_score AS margin
           |FROM ch JOIN rj ON ch.source = rj.source
           |WHERE chosen_score - rejected_score >= 100
           |ORDER BY ch.source""".stripMargin),
    "One group-keyed agg with map-side combine (struct max/min IS the " +
      "total-order argmax — no window over the fact table). The pair-mining " +
      "step of every preference-tuning pipeline; the margin gate is what " +
      "keeps label noise out of the DPO loss.")

  /** q366 — A-eval/E8: best-of-n yield curve — for n ∈ {1,2,4,8}, the
    * mean over prompt groups of the best response score among the
    * FIRST n responses (id order = arrival order). The diminishing-
    * returns readout that prices how many samples per prompt a
    * rejection-sampling pipeline should pay for. */
  val q366 = Declared(
    "q366_best_of_n_curve", "A-eval,E8",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      val ranked = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"), expr(scorePermil).as("score"))
        .withColumn("__rn", row_number().over(w))
      val perN = Seq(1, 2, 4, 8).map { n =>
        ranked.filter(col("__rn") <= n)
          .groupBy(col("source"))
          .agg(max(col("score")).as("__best"))
          .agg(lit(n.toLong).as("n"),
            count(lit(1)).as("n_groups"),
            expr("sum(__best) div count(1)").as("mean_best_permil"))
      }
      perN.reduce(_ unionByName _).orderBy(col("n"))
    },
    Some(s"""WITH sc AS (
           |  SELECT source, doc_id, $scorePermilSql AS score,
           |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
           |  FROM documents),
           |best AS (
           |  SELECT nn.n, sc.source, max(sc.score) AS best
           |  FROM sc, (SELECT unnest([1, 2, 4, 8]) AS n) nn
           |  WHERE sc.rn <= nn.n
           |  GROUP BY nn.n, sc.source)
           |SELECT CAST(n AS BIGINT) AS n,
           |  CAST(count(*) AS BIGINT) AS n_groups,
           |  CAST(sum(best) // count(*) AS BIGINT) AS mean_best_permil
           |FROM best GROUP BY n ORDER BY n""".stripMargin),
    "One group-partitioned rank window + four bounded rollups over it — the " +
      "fact pass is shared. At 100 TB the n values are literals and each " +
      "curve point is a filter over the SAME ranked frame, never a rescan. " +
      "The curve's knee is the sampling budget a best-of-n pipeline buys.")

  /** q367 — E6/E8: prefix-cache sharing audit (the RadixAttention /
    * vLLM prefix-tree sizing number): per depth d = 1..8, how many
    * DISTINCT d-token prefixes the corpus has vs documents reaching
    * that depth — shared_ppm is the fraction of prefix slots a
    * radix cache would deduplicate. */
  val q367 = Declared(
    "q367_prefix_cache_audit", "E6,E8",
    (s, dir) => Tables.documents(s, dir)
      .select(explode(expr(
        """transform(sequence(1, 8), d -> struct(d AS depth,
          |  CASE WHEN size(split(lower(text), '\\s+')) >= d
          |    THEN concat_ws(' ', slice(split(lower(text), '\\s+'), 1, d))
          |    END AS prefix))""".stripMargin)).as("__p"))
      .select(col("__p.depth").cast("long").as("depth"),
        col("__p.prefix").as("prefix"))
      .filter(col("prefix").isNotNull)
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("prefix")).as("n_distinct_prefixes"))
      .withColumn("shared_ppm",
        expr("(1000000 * (n_docs - n_distinct_prefixes)) div n_docs"))
      .orderBy(col("depth")),
    Some("""WITH p AS (
           |  SELECT dd.d AS depth,
           |    array_to_string(list_slice(
           |      regexp_split_to_array(lower(text), '\s+'), 1, dd.d), ' ')
           |      AS prefix
           |  FROM documents, (SELECT unnest(range(1, 9)) AS d) dd
           |  WHERE len(regexp_split_to_array(lower(text), '\s+')) >= dd.d)
           |SELECT CAST(depth AS BIGINT) AS depth,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(count(DISTINCT prefix) AS BIGINT) AS n_distinct_prefixes,
           |  CAST((1000000 * (count(*) - count(DISTINCT prefix))) // count(*)
           |    AS BIGINT) AS shared_ppm
           |FROM p GROUP BY depth ORDER BY depth""".stripMargin),
    "One scan-side depth explode (8x, a constant) + a depth-keyed distinct " +
      "agg — prefix content is the shuffle key, uniform by construction. The " +
      "number that sizes a serving fleet's radix/prefix KV cache and prices " +
      "prompt-template consolidation before deployment.")

  val all: Seq[Declared] = Seq(q365, q366, q367)
}
