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

  /** q368 — T5+T2: CHAINED stateful streaming — watermark →
    * dropDuplicatesWithinWatermark on (user, type, window) → tumbling
    * 6 h windowed count, append mode (the multiple-stateful-operator
    * pipeline). Per window the count is the DISTINCT (user, type)
    * pairs, which the batch oracle computes directly; append emits
    * only watermark-sealed windows, so both sides filter to windows
    * safely before the horizon. */
  val q368 = Declared(
    "q368_stream_dedup_window", "T5,T2",
    (s, dir) => {
      TimeSeries.streamEventsToTable(s, dir, "q368", mode = "append")(ev => {
        val deduped = ev
          .withColumn("wstart",
            window(col("ts"), "6 hours").getField("start"))
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("user_id", "event_type", "wstart")
        deduped.groupBy(window(col("ts"), "6 hours"))
          .agg(count(lit(1)).as("n_distinct_pairs"))
          .select(col("window.start").as("window_start"),
            col("n_distinct_pairs"))
      })
        .filter(col("window_start") <
          lit("2024-01-29 00:00:00").cast("timestamp"))
        .orderBy(col("window_start"))
    },
    Some("""SELECT make_timestamp(epoch_us(ts) // 21600000000 * 21600000000)
           |    AS window_start,
           |  CAST(count(DISTINCT user_id || '|' || event_type) AS BIGINT)
           |    AS n_distinct_pairs
           |FROM events
           |GROUP BY 1
           |HAVING window_start < TIMESTAMP '2024-01-29 00:00:00'
           |ORDER BY window_start""".stripMargin),
    "Two chained state stores, both keyed and watermark-bounded: dedup state " +
      "= one row per distinct (user, type, window) inside the horizon, agg " +
      "state = one row per open window. The dedup-then-aggregate shape every " +
      "exactly-once metrics pipeline needs — without the chain, upstream " +
      "replays double-count.")

  /** q369 — E3+/E7: cluster-mixing entropy — k-means the embeddings
    * (q351's k = 8 rounds), then per cluster the source-distribution
    * entropy in micro-nats. Low-entropy clusters are single-source
    * islands (a mixing/balance smell); uniform mixing approaches
    * ln(#sources). Per-term micro-quantization keeps the sum exact. */
  val q369 = Declared(
    "q369_cluster_mixing_entropy", "E3+,E7",
    (s, dir) => {
      val clusters = graft.ext.Clustering.kMeansInt(
        Tables.embeddings(s, dir), "vec_id", "embedding", k = 8, iters = 2)
        .select(col("id"), col("cluster"))
      val src = Tables.documents(s, dir)
        .select(col("doc_id").as("id"), col("source"))
      val counts = clusters.join(src, "id")
        .groupBy(col("cluster"), col("source"))
        .agg(count(lit(1)).as("c"))
      val tot = counts.groupBy(col("cluster"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_sources"))
      counts.join(tot, "cluster")
        .withColumn("__term", round(
          (col("c").cast("double") / col("n").cast("double")) *
            log(col("c").cast("double") / col("n").cast("double")) * 1e6, 0)
          .cast("long"))
        .groupBy(col("cluster"))
        .agg(max(col("n")).as("n"), max(col("n_sources")).as("n_sources"),
          (-sum(col("__term"))).as("entropy_u"))
        .orderBy(col("cluster"))
    },
    Some {
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
      s"""WITH pts AS (
         |  SELECT vec_id AS id, i - 1 AS d,
         |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT)
         |      AS q
         |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx),
         |init AS (
         |  SELECT id, row_number() OVER (ORDER BY id) - 1 AS ck
         |  FROM (SELECT DISTINCT id FROM pts) ORDER BY id LIMIT 8),
         |c0 AS (
         |  SELECT init.ck, pts.d, pts.q AS c FROM pts JOIN init USING (id)),
         |$rounds,
         |${dist("f", "c2")},
         |cnt AS (
         |  SELECT af.ck AS cluster, d.source, CAST(count(*) AS BIGINT) AS c
         |  FROM af JOIN documents d ON af.id = d.doc_id
         |  GROUP BY 1, 2),
         |tot AS (
         |  SELECT cluster, CAST(sum(c) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS n_sources
         |  FROM cnt GROUP BY 1)
         |SELECT CAST(cnt.cluster AS BIGINT) AS cluster, max(tot.n) AS n,
         |  max(tot.n_sources) AS n_sources,
         |  CAST(-sum(CAST(round(
         |    (CAST(c AS DOUBLE) / tot.n) * ln(CAST(c AS DOUBLE) / tot.n)
         |      * 1000000, 0) AS BIGINT)) AS BIGINT) AS entropy_u
         |FROM cnt JOIN tot USING (cluster)
         |GROUP BY cnt.cluster ORDER BY cluster""".stripMargin
    },
    "The k-means pass dominates; the entropy finish is a (cluster, source) " +
      "rollup + a cluster rollup over it. The mixing-health companion to " +
      "q351: MAUVE-lite asks 'do two sets overlap?', this asks 'is every " +
      "semantic region fed by enough sources?' — the balance check before " +
      "trusting a domain-capped mixture.")

  /** q370 — E4+/E8: negative-sampling distribution table (Mikolov et
    * al. 2013's unigram^(3/4) smoothing): per token, the smoothed
    * sampling weight f^(3/4) — computed as the correctly-rounded IEEE
    * chain sqrt(sqrt(f)·sqrt(f)·sqrt(f)) so both engines produce the
    * SAME double with no libm pow — quantized to micro-units BEFORE
    * any summation. Top 100 tokens by (weight, token): the table head
    * a skip-gram/contrastive trainer samples negatives from. */
  val q370 = Declared(
    "q370_negative_sampling_table", "E4+,E8",
    (s, dir) => Tables.documents(s, dir)
      .select(explode(graft.ext.TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("f"))
      .withColumn("w_u", round(
        sqrt(sqrt(col("f").cast("double")) * sqrt(col("f").cast("double")) *
          sqrt(col("f").cast("double"))) * 1e6, 0).cast("long"))
      .orderBy(col("w_u").desc, col("term"))
      .limit(100),
    Some("""WITH tok AS (
           |  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term
           |  FROM documents),
           |f AS (SELECT term, CAST(count(*) AS BIGINT) AS f
           |      FROM tok GROUP BY term)
           |SELECT term, f,
           |  CAST(round(sqrt(sqrt(CAST(f AS DOUBLE)) * sqrt(CAST(f AS DOUBLE))
           |    * sqrt(CAST(f AS DOUBLE))) * 1000000, 0) AS BIGINT) AS w_u
           |FROM f
           |ORDER BY w_u DESC, term
           |LIMIT 100""".stripMargin),
    "One token explode + a content-keyed frequency agg + TakeOrdered(100). " +
      "The ^(3/4) smoothing runs as sqrt/multiply (correctly-rounded IEEE) " +
      "instead of libm pow, so the table is bit-identical across engines — " +
      "which matters because training reproducibility inherits from it.")

  val all: Seq[Declared] = Seq(q365, q366, q367, q368, q369, q370)
}
