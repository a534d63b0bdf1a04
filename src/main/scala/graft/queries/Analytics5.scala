package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.ext.{Dedup, Graph, TextAnalysis}
import graft.ops.Aggregates

/** Round-4 (batches 16-17): the data-quality OPERATIONS layer — not
  * new detectors, but the ops that tell you whether the detectors you
  * already run (q43-q46, q70, q72) are good enough: grouped jackknife
  * error bars, capture–recapture dedup-coverage estimation, cluster
  * canonicalization, PII-detector evaluation, the dedup threshold
  * curve — plus the exact/approximate cardinality kit (native bitmap
  * aggregate, KMV join-overlap, HLL rollup, streaming count-min) and
  * the Dickey–Fuller stationarity screen. */
object Analytics5 {

  private def mutatedCorpusSql(maxId: Int) =
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < $maxId
       |  UNION ALL
       |  SELECT doc_id + 100000, text || ' mutationtoken'
       |  FROM documents WHERE doc_id < $maxId)""".stripMargin

  private def mutatedCorpus(s: org.apache.spark.sql.SparkSession, dir: String,
      maxId: Int) = {
    val docs = Tables.documents(s, dir).filter(col("doc_id") < maxId)
      .select(col("doc_id"), col("text"))
    docs.unionByName(docs.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" mutationtoken")).as("text")))
  }

  /** Shingle/pair-set CTEs for one detector arm: exact all-pairs
    * Jaccard at word-shingle size `k`, integer-thresholded
    * inter·`tDen` ≥ `tNum`·union. */
  private def pairArmSql(k: Int, tNum: Int, tDen: Int, tag: String): String = {
    val shingle =
      if (k == 1) "unnest(toks) AS w"
      else s"array_to_string(list_slice(toks, i, i + ${k - 1}), ' ') AS w"
    val src =
      if (k == 1) s"SELECT DISTINCT doc_id, $shingle FROM tok"
      else s"""SELECT DISTINCT doc_id, $shingle
              |       FROM (SELECT doc_id, toks,
              |               unnest(range(1, len(toks) - $k + 2)) AS i
              |             FROM tok WHERE len(toks) >= $k)""".stripMargin
    s"""sh$tag AS ($src),
       |c$tag AS (SELECT doc_id, count(*) AS n FROM sh$tag GROUP BY doc_id),
       |p$tag AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM sh$tag a JOIN sh$tag b ON a.w = b.w AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |q$tag AS (
       |  SELECT p.id_a, p.id_b
       |  FROM p$tag p JOIN c$tag ca ON p.id_a = ca.doc_id
       |    JOIN c$tag cb ON p.id_b = cb.doc_id
       |  WHERE p.inter * $tDen >= $tNum * (ca.n + cb.n - p.inter))""".stripMargin
  }

  /** All exact thresholded pairs for one shingle size (Spark side). */
  private def exactPairs(docs: org.apache.spark.sql.DataFrame, k: Int,
      tNum: Int, tDen: Int) = {
    val pairs = docs.select(col("doc_id").as("id_a"))
      .crossJoin(docs.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    Dedup.verifyJaccard(docs, "text", "doc_id", pairs, shingleSize = k,
        cache = false)
      .filter(col("inter") * lit(tDen) >=
        lit(tNum) * (col("n_a") + col("n_b") - col("inter")))
      .select(col("id_a"), col("id_b"))
  }

  /** q191 — A-stat: delete-one-group jackknife error bar for mean
    * line-item revenue, groups = line number — the uncertainty number a
    * 100 TB mean should never ship without. Micro-quantized
    * pseudo-values keep the variance order-independent. */
  val q191 = Declared(
    "q191_jackknife", "A-stat",
    (s, dir) => Aggregates.jackknifeMeanByGroup(Tables.lineitem(s, dir),
      col("l_linenumber"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")),
    Some("""WITH per AS (
           |  SELECT l_linenumber,
           |    CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS HUGEINT) AS s
           |  FROM lineitem GROUP BY 1),
           |tot AS (
           |  SELECT CAST(sum(n) AS HUGEINT) AS nn, CAST(sum(s) AS HUGEINT) AS ss,
           |    CAST(count(*) AS BIGINT) AS g
           |  FROM per),
           |theta AS (
           |  SELECT g, nn, ss,
           |    CAST(round(CAST(ss - s AS DOUBLE) / CAST(nn - n AS DOUBLE)
           |      * 1000000.0, 0) AS BIGINT) AS tu
           |  FROM per, tot),
           |agg AS (
           |  SELECT max(g) AS g, CAST(max(nn) AS BIGINT) AS n,
           |    CAST(max(ss) AS DOUBLE) / CAST(max(nn) AS DOUBLE) AS mean,
           |    CAST(sum(tu) AS HUGEINT) AS sumt,
           |    CAST(sum(CAST(tu AS HUGEINT) * tu) AS HUGEINT) AS sumt2
           |  FROM theta)
           |SELECT g, n, mean,
           |  CAST(g - 1 AS DOUBLE) *
           |    CAST(g * sumt2 - sumt * sumt AS DOUBLE) /
           |    (CAST(g AS DOUBLE) * CAST(g AS DOUBLE)) AS jk_var_u2,
           |  sqrt(CAST(g - 1 AS DOUBLE) *
           |    CAST(g * sumt2 - sumt * sumt AS DOUBLE) /
           |    (CAST(g AS DOUBLE) * CAST(g AS DOUBLE))) AS jk_se_u
           |FROM agg""".stripMargin),
    "One group-keyed agg pass + a |groups|-row finish, the anovaF cost envelope. " +
      "With groups = ingest shards, this is the free error bar on any mean the " +
      "pipeline reports — no resampling pass over 100 TB, just the rollup.")

  /** q192 — E2: capture–recapture estimate of dedup coverage — run TWO
    * independent near-dup detectors (word-shingle Jaccard at k=3 and
    * k=4), treat their pair sets as two 'captures', and
    * Lincoln–Petersen-estimate the true duplicate-pair population:
    * est = n_a·n_b div overlap. The answer to 'how many dups did we
    * MISS?' — without ground truth. */
  val q192 = Declared(
    "q192_capture_recapture", "E2",
    (s, dir) => {
      val corpus = mutatedCorpus(s, dir, 100)
      val a = exactPairs(corpus, k = 3, tNum = 3, tDen = 5)
      val b = exactPairs(corpus, k = 4, tNum = 3, tDen = 5)
      val m = a.join(b, Seq("id_a", "id_b"), "left_semi")
      val u = a.unionByName(b).distinct()
      a.agg(count(lit(1)).as("n_a")).crossJoin(b.agg(count(lit(1)).as("n_b")))
        .crossJoin(m.agg(count(lit(1)).as("overlap")))
        .crossJoin(u.agg(count(lit(1)).as("n_union")))
        .withColumn("est_total",
          when(col("overlap") > 0, expr("n_a * n_b div overlap")))
        .withColumn("est_missed",
          when(col("overlap") > 0, expr("n_a * n_b div overlap - n_union")))
    },
    Some {
      s"""WITH ${mutatedCorpusSql(100)},
         |tok AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks
         |        FROM corpus),
         |${pairArmSql(3, 3, 5, "a")},
         |${pairArmSql(4, 3, 5, "b")},
         |na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM qa),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM qb),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS overlap
         |      FROM qa JOIN qb ON qa.id_a = qb.id_a AND qa.id_b = qb.id_b),
         |u AS (SELECT CAST(count(*) AS BIGINT) AS n_union FROM (
         |        SELECT id_a, id_b FROM qa UNION SELECT id_a, id_b FROM qb))
         |SELECT n_a, n_b, overlap, n_union,
         |  CASE WHEN overlap > 0 THEN n_a * n_b // overlap END AS est_total,
         |  CASE WHEN overlap > 0 THEN n_a * n_b // overlap - n_union
         |    END AS est_missed
         |FROM na, nb, m, u""".stripMargin
    },
    "At scale the two 'captures' come from the LSH detectors (q45/q46) whose " +
      "pair sets are already materialized — the estimator itself joins two " +
      "pair lists, never rescanning the corpus. est_missed >> 0 is the signal " +
      "to lower the threshold or add a third detector family.")

  /** q193 — E2: canonical-document selection — collapse near-dup
    * clusters (q70's components) to one keeper each: the LONGEST
    * member, doc_id ascending on ties. The decision layer between
    * detection (pairs) and action (drop): per cluster, who stays, how
    * many go, how many chars survive. */
  val q193 = Declared(
    "q193_canonical_docs", "E2",
    (s, dir) => {
      val corpus = mutatedCorpus(s, dir, 100)
      val pairs = Dedup.minhashNearDuplicates(corpus, "text", "doc_id",
        shingleSize = 3, numHashes = 16, bands = 16, threshold = 0.8)
      val comps = Graph.connectedComponents(pairs, "id_a", "id_b")
      val sized = comps.join(
        corpus.select(col("doc_id").as("node"), length(col("text")).as("n_chars")),
        "node")
      val w = Window.partitionBy(col("component"))
        .orderBy(col("n_chars").desc, col("node").asc)
      sized.withColumn("__rn", row_number().over(w))
        .groupBy(col("component"))
        .agg(min(when(col("__rn") === 1, col("node"))).as("canonical_id"),
          count(lit(1)).as("n_members"),
          sum(col("n_chars")).as("total_chars"),
          max(when(col("__rn") === 1, col("n_chars"))).as("kept_chars"))
        .withColumn("dropped", col("n_members") - 1)
        .orderBy(col("component"))
    },
    Some {
      s"""WITH RECURSIVE ${mutatedCorpusSql(100)},
         |tok AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks
         |        FROM corpus),
         |${pairArmSql(3, 4, 5, "a")},
         |e AS (SELECT id_a AS a, id_b AS b FROM qa
         |      UNION ALL SELECT id_b, id_a FROM qa),
         |reach AS (
         |  SELECT a AS node, a AS comp FROM e
         |  UNION
         |  SELECT e.a, reach.comp FROM e JOIN reach ON reach.node = e.b),
         |comps AS (SELECT node, min(comp) AS component FROM reach GROUP BY node),
         |sized AS (
         |  SELECT c.component, c.node, length(x.text) AS n_chars
         |  FROM comps c JOIN corpus x ON c.node = x.doc_id),
         |ranked AS (
         |  SELECT component, node, n_chars,
         |    row_number() OVER (PARTITION BY component
         |      ORDER BY n_chars DESC, node ASC) AS rn
         |  FROM sized)
         |SELECT component,
         |  CAST(min(CASE WHEN rn = 1 THEN node END) AS BIGINT) AS canonical_id,
         |  CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(max(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS kept_chars,
         |  CAST(count(*) - 1 AS BIGINT) AS dropped
         |FROM ranked GROUP BY component
         |ORDER BY component""".stripMargin
    },
    "Components come from the LSH pair stream (q45's scale path); the keeper " +
      "window runs per cluster — cluster-sized, never corpus-sized. The oracle " +
      "side certifies MinHash recall AGAIN (its pairs are the exact 0.8 set) " +
      "plus the closure and the keeper choice.")

  /** q194 — E4/A-stat: PII-detector evaluation against planted ground
    * truth — valid plants the regex family must catch, obfuscated
    * plants ('bob at example dot com') an ideal detector would catch
    * but the regex can't. Recall < 10⁶ ppm on email is the measured,
    * quantified gap — the honest audit line for q72's scrub. */
  val q194 = Declared(
    "q194_pii_eval", "E4",
    (s, dir) => {
      val base = Tables.documents(s, dir).filter(col("doc_id") < 200)
      val planted = base.select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(" call 555-1234")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          lit(" reach bob at example dot com")).otherwise(lit("")))
        .as("text"))
      val flags = planted.select(col("doc_id"),
        (col("doc_id") % 5 === 0 || col("doc_id") % 11 === 0).as("truth_email"),
        (col("doc_id") % 7 === 0).as("truth_phone"),
        (TextAnalysis.piiCount(col("text"), "email") > 0).as("det_email"),
        (TextAnalysis.piiCount(col("text"), "phone") > 0).as("det_phone"))
      def arm(kind: String, truth: String, det: String) =
        flags.agg(lit(kind).as("pii_type"),
          sum(when(col(truth), 1L).otherwise(0L)).as("n_truth"),
          sum(when(col(det), 1L).otherwise(0L)).as("n_detected"),
          sum(when(col(truth) && col(det), 1L).otherwise(0L)).as("tp"),
          sum(when(!col(truth) && col(det), 1L).otherwise(0L)).as("fp"),
          sum(when(col(truth) && !col(det), 1L).otherwise(0L)).as("fn"))
      arm("email", "truth_email", "det_email")
        .unionByName(arm("phone", "truth_phone", "det_phone"))
        .withColumn("prec_ppm",
          when(col("n_detected") > 0, expr("1000000 * tp div n_detected")))
        .withColumn("rec_ppm",
          when(col("n_truth") > 0, expr("1000000 * tp div n_truth")))
        .orderBy(col("pii_type"))
    },
    Some("""WITH planted AS (
           |  SELECT doc_id, text ||
           |    CASE WHEN doc_id % 5 = 0
           |      THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
           |    CASE WHEN doc_id % 7 = 0 THEN ' call 555-1234' ELSE '' END ||
           |    CASE WHEN doc_id % 11 = 0
           |      THEN ' reach bob at example dot com' ELSE '' END AS text
           |  FROM documents WHERE doc_id < 200),
           |flags AS (
           |  SELECT doc_id,
           |    (doc_id % 5 = 0 OR doc_id % 11 = 0) AS truth_email,
           |    (doc_id % 7 = 0) AS truth_phone,
           |    len(regexp_extract_all(text,
           |      '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) > 0 AS det_email,
           |    len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) > 0 AS det_phone
           |  FROM planted),
           |arms AS (
           |  SELECT 'email' AS pii_type,
           |    CAST(sum(CASE WHEN truth_email THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
           |    CAST(sum(CASE WHEN det_email THEN 1 ELSE 0 END) AS BIGINT) AS n_detected,
           |    CAST(sum(CASE WHEN truth_email AND det_email THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |    CAST(sum(CASE WHEN NOT truth_email AND det_email THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |    CAST(sum(CASE WHEN truth_email AND NOT det_email THEN 1 ELSE 0 END) AS BIGINT) AS fn
           |  FROM flags
           |  UNION ALL
           |  SELECT 'phone',
           |    CAST(sum(CASE WHEN truth_phone THEN 1 ELSE 0 END) AS BIGINT),
           |    CAST(sum(CASE WHEN det_phone THEN 1 ELSE 0 END) AS BIGINT),
           |    CAST(sum(CASE WHEN truth_phone AND det_phone THEN 1 ELSE 0 END) AS BIGINT),
           |    CAST(sum(CASE WHEN NOT truth_phone AND det_phone THEN 1 ELSE 0 END) AS BIGINT),
           |    CAST(sum(CASE WHEN truth_phone AND NOT det_phone THEN 1 ELSE 0 END) AS BIGINT)
           |  FROM flags)
           |SELECT pii_type, n_truth, n_detected, tp, fp, fn,
           |  CASE WHEN n_detected > 0 THEN 1000000 * tp // n_detected END AS prec_ppm,
           |  CASE WHEN n_truth > 0 THEN 1000000 * tp // n_truth END AS rec_ppm
           |FROM arms ORDER BY pii_type""".stripMargin),
    "Scan-side regex + one agg — evaluation costs what the scrub itself costs. " +
      "Plant-and-measure is the only honest recall number a regex scrub can " +
      "claim; the obfuscated arm keeps the metric from reading 100% forever.")

  /** q195 — E2: dedup threshold-tuning curve — for each candidate
    * Jaccard threshold, how many pairs fire and how many documents are
    * touched. The integer comparison inter·100 ≥ t·union makes every
    * point on the curve exact — the tuning table read BEFORE committing
    * a 100 TB dedup pass to one threshold. */
  val q195 = Declared(
    "q195_dedup_threshold_curve", "E2",
    (s, dir) => {
      import s.implicits._
      val corpus = mutatedCorpus(s, dir, 80)
      val pairs = corpus.select(col("doc_id").as("id_a"))
        .crossJoin(corpus.select(col("doc_id").as("id_b")))
        .filter(col("id_a") < col("id_b"))
      val scored = Dedup.verifyJaccard(corpus, "text", "doc_id", pairs,
          shingleSize = 3, cache = false)
        .select(col("id_a"), col("id_b"), col("inter"),
          (col("n_a") + col("n_b") - col("inter")).as("uni"))
        .filter(col("inter") > 0)
      val thresholds = Seq(50, 60, 70, 80, 90)
      val swept = scored.crossJoin(
          broadcast(thresholds.toDF("t_pct")))
        .filter(col("inter") * 100 >= col("t_pct") * col("uni"))
      val byT = swept.groupBy(col("t_pct"))
        .agg(count(lit(1)).as("n_pairs"))
      val docsTouched = swept
        .select(col("t_pct"), explode(array(col("id_a"), col("id_b"))).as("d"))
        .groupBy(col("t_pct"))
        .agg(count_distinct(col("d")).as("n_docs"))
      byT.join(docsTouched, "t_pct").orderBy(col("t_pct"))
    },
    Some {
      s"""WITH ${mutatedCorpusSql(80)},
         |tok AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks
         |        FROM corpus),
         |sh AS (SELECT DISTINCT doc_id,
         |         array_to_string(list_slice(toks, i, i + 2), ' ') AS w
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
         |             FROM tok WHERE len(toks) >= 3)),
         |c AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.w = b.w AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT p.id_a, p.id_b, p.inter,
         |    ca.n + cb.n - p.inter AS uni
         |  FROM p JOIN c ca ON p.id_a = ca.doc_id
         |    JOIN c cb ON p.id_b = cb.doc_id
         |  WHERE p.inter > 0),
         |t AS (SELECT unnest([50, 60, 70, 80, 90]) AS t_pct),
         |swept AS (
         |  SELECT t.t_pct, s.id_a, s.id_b
         |  FROM scored s, t WHERE s.inter * 100 >= t.t_pct * s.uni),
         |byt AS (SELECT t_pct, CAST(count(*) AS BIGINT) AS n_pairs
         |        FROM swept GROUP BY 1),
         |docs AS (
         |  SELECT t_pct, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
         |  FROM (SELECT t_pct, id_a AS d FROM swept
         |        UNION ALL SELECT t_pct, id_b FROM swept)
         |  GROUP BY 1)
         |SELECT byt.t_pct, n_pairs, n_docs
         |FROM byt JOIN docs ON byt.t_pct = docs.t_pct
         |ORDER BY byt.t_pct""".stripMargin
    },
    "The expensive part (exact pair scores) is computed ONCE; the sweep is a " +
      "broadcast of 5 threshold rows against the pair list. At 100 TB the pair " +
      "list comes from LSH candidates (q45) and the same sweep costs a " +
      "pair-list scan — threshold tuning without re-running detection.")

  // md5-chunk helpers (the q159 nibble-reassembly idiom), local copy
  private def chunkSql(j: Int, key: String, m: Int): String =
    s"""(SELECT CAST(sum(CAST(strpos('0123456789abcdef',
       |    substr(md5(CAST($key AS VARCHAR)), ${j * 8} + i, 1)) - 1
       |    AS BIGINT) << ((8 - i) * 4)) AS BIGINT)
       |  FROM (SELECT unnest(range(1, 9)) AS i)) % $m""".stripMargin

  private def chunkRawSql(j: Int, key: String): String =
    s"""(SELECT CAST(sum(CAST(strpos('0123456789abcdef',
       |    substr(md5(CAST($key AS VARCHAR)), ${j * 8} + i, 1)) - 1
       |    AS BIGINT) << ((8 - i) * 4)) AS BIGINT)
       |  FROM (SELECT unnest(range(1, 9)) AS i))""".stripMargin

  /** q196 — X2/E6: exact distinct via the bitmap typed Aggregator —
    * per return flag, bitmap-OR distinct of l_partkey against the
    * engine's own countDistinct. The dense-bounded-domain companion
    * to q171's HLL: same mergeability law, zero error. */
  val q196 = Declared(
    "q196_bitmap_distinct", "X2,E6",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      // the two aggregates MUST NOT share one agg: Spark rewrites the
      // mixed distinct+imperative combination through an Expand whose
      // first phase groups by (flag, partkey) — allocating a bitmap
      // buffer per PARTKEY group. Separate aggs keep the bitmap at
      // |flags| buffers; the join is 3 rows.
      val bm = li.groupBy(col("l_returnflag"))
        .agg(graft.ext.BitmapDistinct
          .bitmapDistinct(col("l_partkey"), 1 << 20).as("n_bitmap"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      bm.join(exact, "l_returnflag").orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
           |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_bitmap,
           |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact
           |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
    "The buffer is domain/8 bytes per (group, partition) and merge is wordwise " +
      "OR — the shuffle carries bitmaps, never keys. Bitmap when the id domain " +
      "is dense and bounded (surrogate keys), HLL (q171) when huge or sparse; " +
      "both merge associatively so pre-agged cubes reaggregate without rescan.")

  /** q197 — A-stat: Dickey–Fuller unit-root screen per order priority —
    * is the daily-count series mean-reverting (model levels) or a
    * random walk (difference first)? The stationarity gate in front of
    * q173's smoothing and q183's trend. */
  val q197 = Declared(
    "q197_adf", "A-stat",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("y"))
      Aggregates.adfTest(daily, Seq(col("o_orderpriority")), col("day"),
          col("y"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH d AS (
           |  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
           |    CAST(count(*) AS BIGINT) AS y
           |  FROM orders GROUP BY 1, 2),
           |l AS (
           |  SELECT pri, y, lag(y) OVER (PARTITION BY pri ORDER BY day) AS x
           |  FROM d),
           |p AS (SELECT pri, x, y - x AS dd FROM l WHERE x IS NOT NULL),
           |a AS (
           |  SELECT pri, CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(dd) AS HUGEINT) AS sd,
           |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           |    CAST(sum(CAST(x AS HUGEINT) * dd) AS HUGEINT) AS sxd,
           |    CAST(sum(CAST(dd AS HUGEINT) * dd) AS HUGEINT) AS sdd
           |  FROM p GROUP BY 1),
           |f AS (
           |  SELECT pri, n,
           |    CAST(n * sxx - sx * sx AS DOUBLE) AS vx,
           |    CAST(n * sxd - sx * sd AS DOUBLE) AS cv,
           |    CAST(n * sdd - sd * sd AS DOUBLE) AS vd
           |  FROM a)
           |SELECT pri AS o_orderpriority, CAST(n AS BIGINT) AS n,
           |  CASE WHEN vx <> 0 AND n > 2 THEN cv / vx END AS gamma,
           |  CASE WHEN vx <> 0 AND n > 2 THEN
           |    (cv / vx) / sqrt((vd - cv * cv / vx) /
           |      ((CAST(n AS DOUBLE) - 2.0) * vx)) END AS t_stat,
           |  CASE WHEN vx <> 0 AND n > 2 THEN
           |    CAST((cv / vx) / sqrt((vd - cv * cv / vx) /
           |      ((CAST(n AS DOUBLE) - 2.0) * vx)) < -2.86 AS INT)
           |  END AS stationary
           |FROM f ORDER BY o_orderpriority""".stripMargin),
    "One lag window over the rollup-grain series + six exact sums — the q82 " +
      "envelope. gamma near -1 with t << -2.86 (iid daily counts) says model " +
      "levels; gamma near 0 says difference first. Literal critical value, no " +
      "distribution functions.")

  /** q198 — E6: join-overlap estimate from KMV sketches — how many
    * distinct join keys do two sides share, WITHOUT scanning either
    * side again: |A∩B| ≈ J·|A∪B| from two 128-hash bottom-k sketches.
    * The sketch-side answer to q170's exact join-cardinality audit,
    * register-exact against the oracle like q171/q179. */
  val q198 = Declared(
    "q198_kmv_join_overlap", "E6",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val k = 128
      def sk(flag: String) = graft.ext.Sketches.kmvSketch(
        li.filter(col("l_returnflag") === flag), Nil, col("l_partkey"), k)
      val a = sk("A").localCheckpoint()
      val b = sk("R").localCheckpoint()
      def est(sketch: org.apache.spark.sql.DataFrame, name: String) =
        graft.ext.Sketches.kmvEstimate(sketch, Nil, k)
          .select(col("est_kmv").as(name))
      val unionSketch = a.unionByName(b).distinct()
        .withColumn("__rn", row_number().over(Window.orderBy(col("h"))))
        .filter(col("__rn") <= k).select(col("h"))
      val unionEst = graft.ext.Sketches.kmvEstimate(unionSketch, Nil, k)
        .select(col("est_kmv").as("union_est"))
      val res = graft.ext.Sketches.kmvResemblance(a, b, k)
        .select(col("j_est_ppm"))
      val exact = li.filter(col("l_returnflag") === "A")
        .select(col("l_partkey")).distinct()
        .join(li.filter(col("l_returnflag") === "R")
          .select(col("l_partkey")).distinct(), Seq("l_partkey"), "left_semi")
        .agg(count(lit(1)).as("overlap_exact"))
      est(a, "d_a_est").crossJoin(est(b, "d_b_est"))
        .crossJoin(unionEst).crossJoin(res).crossJoin(exact)
        .withColumn("overlap_est", expr("j_est_ppm * union_est div 1000000"))
        .select(col("d_a_est"), col("d_b_est"), col("union_est"),
          col("j_est_ppm"), col("overlap_est"), col("overlap_exact"))
    },
    Some {
      def arm(flag: String, tag: String) =
        s"""hd$tag AS (
           |  SELECT DISTINCT h FROM (
           |    SELECT ${chunkRawSql(0, "l_partkey")} AS h
           |    FROM (SELECT DISTINCT l_partkey FROM lineitem
           |          WHERE l_returnflag = '$flag'))),
           |s$tag AS (
           |  SELECT h FROM (
           |    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hd$tag)
           |  WHERE rn <= 128),
           |e$tag AS (
           |  SELECT CASE WHEN count(*) = 128 AND max(h) > 0
           |    THEN (127 * 4294967296) // max(h)
           |    ELSE count(*) END AS est
           |  FROM s$tag)""".stripMargin
      s"""WITH ${arm("A", "a")},
         |${arm("R", "b")},
         |uh AS (SELECT DISTINCT h FROM (
         |         SELECT h FROM sa UNION SELECT h FROM sb)),
         |su AS (
         |  SELECT h FROM (
         |    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM uh)
         |  WHERE rn <= 128),
         |eu AS (
         |  SELECT CASE WHEN count(*) = 128 AND max(h) > 0
         |    THEN (127 * 4294967296) // max(h)
         |    ELSE count(*) END AS union_est,
         |    count(*) AS union_kept
         |  FROM su),
         |res AS (
         |  SELECT CAST(1000000 * sum(CASE WHEN sa.h IS NOT NULL
         |      AND sb.h IS NOT NULL THEN 1 ELSE 0 END) // count(*) AS BIGINT)
         |    AS j_est_ppm
         |  FROM su LEFT JOIN sa ON su.h = sa.h LEFT JOIN sb ON su.h = sb.h),
         |ex AS (
         |  SELECT CAST(count(*) AS BIGINT) AS overlap_exact FROM (
         |    SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'A'
         |    INTERSECT
         |    SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R'))
         |SELECT CAST(ea.est AS BIGINT) AS d_a_est,
         |  CAST(eb.est AS BIGINT) AS d_b_est,
         |  CAST(eu.union_est AS BIGINT) AS union_est,
         |  j_est_ppm,
         |  CAST(j_est_ppm * eu.union_est // 1000000 AS BIGINT) AS overlap_est,
         |  overlap_exact
         |FROM ea, eb, eu, res, ex""".stripMargin
    },
    "The estimator's operands are two <=128-row sketches — join planning " +
      "(semi-join pushdown worth it? broadcast the intersection?) from state " +
      "that fits in a driver heartbeat, maintained incrementally as data lands. " +
      "q170 is the exact audit you run after; this is the cheap screen before.")

  /** q199 — E6: sketch re-aggregation — nation-level HLL registers
    * rolled up to regions by register max, against the exact distinct.
    * THE pre-aggregated-cube property: a 100 TB scan builds the finest
    * grain once; every coarser grain merges sketches without rescan,
    * and the oracle (which builds regions DIRECTLY) certifies the
    * merge is lossless. */
  val q199 = Declared(
    "q199_hll_rollup", "E6",
    (s, dir) => {
      val sup = Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))
      val nat = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_regionkey"))
      val keyed = Tables.lineitem(s, dir)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").as("nation"), col("l_partkey"))
      val natRegs = graft.ext.Sketches.hllRegisters(keyed,
        Seq(col("nation")), col("l_partkey"), m = 64)
      val regRegs = natRegs
        .join(broadcast(nat), col("nation") === col("n_nationkey"))
        .groupBy(col("n_regionkey").as("region"), col("idx"))
        .agg(max(col("m_rank")).as("m_rank"))
      val est = graft.ext.Sketches.hllEstimate(regRegs, Seq("region"), m = 64)
      val exact = keyed.join(broadcast(nat), col("nation") === col("n_nationkey"))
        .groupBy(col("n_regionkey").as("region"))
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      est.join(exact, "region")
        .select(col("region"), col("n_exact"), col("registers_hit"),
          col("sum_scaled"), col("est_hll"))
        .orderBy(col("region"))
    },
    Some {
      val numLit = graft.ext.Sketches.hllAlpha(64) * 64 * 64 * (1L << 33).toDouble
      s"""WITH h AS (
         |  SELECT n.n_regionkey AS region,
         |    ${chunkSql(0, "l.l_partkey", 64)} AS idx,
         |    ${chunkRawSql(1, "l.l_partkey")} AS w
         |  FROM lineitem l
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  JOIN nation n ON s.s_nationkey = n.n_nationkey),
         |regs AS (
         |  SELECT region, idx,
         |    max(CASE WHEN w = 0 THEN 33
         |             ELSE 33 - length(format('{:b}', w)) END) AS m_rank
         |  FROM h GROUP BY 1, 2),
         |est AS (
         |  SELECT region, count(*) AS registers_hit,
         |    CAST(sum(CAST(1 AS BIGINT) << (33 - m_rank)) +
         |      (64 - count(*)) * 8589934592 AS BIGINT) AS sum_scaled
         |  FROM regs GROUP BY 1),
         |exact AS (
         |  SELECT n.n_regionkey AS region,
         |    count(DISTINCT l.l_partkey) AS n_exact
         |  FROM lineitem l
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  JOIN nation n ON s.s_nationkey = n.n_nationkey
         |  GROUP BY 1)
         |SELECT e.region, x.n_exact, e.registers_hit, e.sum_scaled,
         |  $numLit / CAST(e.sum_scaled AS DOUBLE) AS est_hll
         |FROM est e JOIN exact x ON e.region = x.region
         |ORDER BY e.region""".stripMargin
    },
    "The Spark side builds NATION sketches and max-merges to regions; the " +
      "oracle builds regions directly — equality IS the lossless-rollup proof. " +
      "At 100 TB this is the cube strategy: materialize registers at the finest " +
      "grain (groups x 64 rows), answer every ancestor grain by merge.")

  /** q200 — T-family/E6: count-min sketch built THROUGH the streaming
    * path — the event stream's user-frequency grid maintained by a
    * streaming aggregation, equal to the batch-built grid because cell
    * counts merge associatively across micro-batches. Streaming ingest
    * + sketch state: the 100 TB frequency monitor. */
  val q200 = Declared(
    "q200_stream_count_min", "T2,E6",
    (s, dir) => TimeSeries.streamEventsToTable(s, dir, "q200")(ev =>
        graft.ext.Sketches.countMinBuild(ev.select(col("user_id")),
          col("user_id"), width = 64, depth = 4))
      .orderBy(col("row_j"), col("bucket")),
    Some {
      val arms = (0 until 4).map(j =>
        s"SELECT $j AS row_j, ${chunkSql(j, "user_id", 64)} AS bucket FROM events")
        .mkString("\n    UNION ALL\n    ")
      s"""SELECT row_j, bucket, count(*) AS cnt FROM (
         |    $arms)
         |GROUP BY row_j, bucket
         |ORDER BY row_j, bucket""".stripMargin
    },
    "Streaming state is the grid itself (<= d*w rows) — bounded forever, no " +
      "watermark needed, complete-mode emit. Cell increments commute, so ANY " +
      "micro-batch split yields the identical grid (StreamingSpec pins the " +
      "multi-batch law); the oracle equals the batch build.")

  val all: Seq[Declared] = Seq(q191, q192, q193, q194, q195,
    q196, q197, q198, q199, q200)
}
