package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** E4+ — corpus curation operators for training-data pipelines:
  * deterministic dataset splits, per-domain caps (data mixing), and
  * TF-IDF term scoring. All pure DataFrame plans.
  *
  * These model the assembly steps downstream of cleaning/dedup: decide
  * which split each document belongs to, bound any single domain's
  * contribution, and surface the terms that characterize a document.
  */
object Curation {

  /** Deterministic split bucket in [0, 100): a content-derived hash of
    * `content` mod 100. Content-addressed by design — a document keeps
    * its split across re-shards, re-ingests and dedup reorderings, and
    * exact duplicates always land in the SAME split (no train/test
    * leakage through copies). `hash` defaults to xxhash64; pass
    * [[Dedup.md5Hash60]] for a cross-engine-reconstructible bucket. */
  def splitBucket(content: Column,
      hash: Column => Column = xxhash64(_)): Column =
    pmod(hash(content), lit(100))

  /** Train/val/test label from [[splitBucket]]: bucket < trainPct →
    * "train", < trainPct+valPct → "val", else "test". */
  def split(content: Column, trainPct: Int = 80, valPct: Int = 10,
      hash: Column => Column = xxhash64(_)): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "trainPct + valPct must be <= 100")
    val b = splitBucket(content, hash)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Per-key document cap (data mixing / domain balancing): keep at
    * most `cap` rows per `key`, ranked by `order` (callers pass a full
    * deterministic tie-break). Adds `rank_in_key`. One shuffle keyed on
    * the domain key; a skewed mega-domain is exactly the case the cap
    * exists for — its partition processes at most its own rows once,
    * and emits `cap`. */
  def capPerKey(df: DataFrame, key: Column, order: Seq[Column],
      cap: Int): DataFrame =
    df.withColumn("rank_in_key",
        row_number().over(Window.partitionBy(key).orderBy(order: _*)))
      .filter(col("rank_in_key") <= cap)

  /** Deterministic per-stratum sampling — the data-MIXING primitive:
    * each key (domain/source/language) gets its own retention rate in
    * [0, 100]%, and membership is a pure function of content hash, so
    * the mix is reproducible across cluster layouts and re-ingests and
    * exact duplicates sample identically. Keys absent from `rates` use
    * `defaultPct`. Scan-side predicate — no shuffle, pushdown-friendly,
    * and the retained fraction per stratum converges to rate/100 by
    * hash uniformity. */
  def stratifiedSample(df: DataFrame, keyCol: Column, content: Column,
      rates: Map[String, Int], defaultPct: Int = 100,
      hash: Column => Column = xxhash64(_)): DataFrame = {
    require((rates.values ++ Seq(defaultPct)).forall(r => r >= 0 && r <= 100),
      "rates must be percentages in [0, 100]")
    val bucket = splitBucket(content, hash)
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (k, r)) =>
      when(keyCol === k, lit(r)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /** Top-`topK` TF-IDF terms per document. tf = term count in doc,
    * idf = ln(N / df) with N = |docs|, df = docs containing the term.
    * The score is rounded to 6 decimals BEFORE ranking so rank order is
    * reproducible across engines/libms (mathematically-equal scores
    * computed through different expressions — e.g. 2·ln10 vs ln100 —
    * can differ in the last ulp); ties break on the term.
    *
    * Scale: tf and df are uniform content-keyed aggregations with
    * map-side partial aggregation; N is a 1-row broadcast. The tf⋈df
    * equi-join on `term` is Zipf-skewed (stopwords touch every doc) —
    * the df side is one row per vocab term, so AQE's skew-join split
    * handles the hot keys; at extreme vocabulary sizes pre-salting the
    * stopword band is the documented fallback. */
  def tfIdfTopTerms(docs: DataFrame, textCol: String, idCol: String,
      topK: Int, cache: Boolean = true): DataFrame = {
    // cached: tf and df aggregate the exploded tokens under DIFFERENT
    // keys, so exchange reuse can't deduplicate the scan+explode —
    // without the cache the corpus tokenizes once per consumer.
    // `cache = false` opts out for callers with no release point
    // (e.g. the pipeline registry, whose result lifetime is unmanaged);
    // they pay the recompute instead of accumulating pinned blocks.
    val tok0 = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tok = if (cache) graft.core.OperatorCaches.cached(tok0) else tok0
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df"))
    val n = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("tfidf").desc, col("term").asc)))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("rank"), col("term"), col("tfidf"))
  }
}
