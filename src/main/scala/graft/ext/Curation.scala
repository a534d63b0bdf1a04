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

  graft.plans.Guardrails.expect("cartesian_join",
    "__d, __cf", "dirichletQL: hit-doc frame x |q|-term corpus-frequency broadcast",
    "k-literal")

  // ---- by-design plan-hazard documentation (Guardrails.expect) ------
  // Each entry registers a deliberately-BOUNDED single-partition window
  // or unconditioned join this object builds, with its boundedness
  // argument, so the optimizer audit (PlanAudit / the Guardrails rule)
  // flags only NEW hazards instead of letting them hide among known
  // ones. Markers are operator-owned columns of the hazard plan node.
  graft.plans.Guardrails.expect("single_partition_window",
    "source, tokens, quality_u", "greedyMixture: |sources|-row allocation",
    "vocabulary")



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

  /** E7 — temperature-flattened source mixing at α = 1/2 (the
    * n_s^α reweighting of multilingual/multi-source training mixes):
    * each source's keep-rate is r_s = √(n_min / n_s) — the rarest
    * source keeps everything; a source 100× larger keeps 1/10 —
    * applied as a deterministic content-hash test
    * (md5-derived ppm bucket < ⌊10⁶ · r_s⌋), so the SAME documents
    * survive on every engine, re-shard and re-run.
    *
    * α is fixed at 1/2 deliberately: √ and ÷ are correctly-rounded
    * IEEE operations, so ⌊10⁶·r_s⌋ is bit-reproducible anywhere;
    * general α routes through libm pow, whose low bits are platform-
    * dependent — unacceptable for a keep/drop decision that must be
    * re-derivable forever.
    *
    * Scale: per-source counts are one partial-agg pass; the rate table
    * is |sources| rows broadcast back; the keep test is scan-side. */
  def sqrtTemperatureSample(df: DataFrame, keyCol: Column, content: Column,
      hash: Column => Column = Dedup.md5Hash60): DataFrame = {
    val counts = df.groupBy(keyCol.as("__key")).agg(count(lit(1)).as("__ns"))
    val nmin = counts.agg(min(col("__ns")).as("__nmin")) // 1 row, broadcast
    val rates = counts.crossJoin(broadcast(nmin))
      .select(col("__key"),
        floor(sqrt(col("__nmin").cast("double") / col("__ns")) * 1000000L)
          .cast("long").as("__keep_ppm"))
    df.join(broadcast(rates), keyCol === col("__key"))
      .filter(pmod(hash(content), lit(1000000L)) < col("__keep_ppm"))
      .drop("__key", "__keep_ppm")
  }

  /** E7 — line-level dedup (the C4/CCNet boilerplate-removal pass):
    * drop every line whose document frequency is >= `minDocFreq`
    * (headers, footers, cookie banners, nav menus — content that
    * repeats across many documents), keep the rest, and reassemble
    * each document's surviving lines in their original order.
    * Documents whose every line was boilerplate disappear from the
    * output (callers wanting them keep an outer join on the id).
    *
    * Scale: line doc-frequency is one aggregation keyed on line
    * CONTENT — a uniform hash key; the hot boilerplate lines are
    * exactly the high-frequency ones, and AQE's skew-join split covers
    * the line⋈df join's hot keys. Reassembly is one shuffle keyed on
    * the doc id. At 100 TB, key the df aggregation on xxhash64(line)
    * instead of the raw string to cut shuffle bytes — same plan shape. */
  def removeDuplicateLines(docs: DataFrame, textCol: String, idCol: String,
      minDocFreq: Int, cache: Boolean = true): DataFrame = {
    require(minDocFreq >= 2, "minDocFreq < 2 would drop every line")
    // functions.split qualified: Curation.split (the dataset splitter)
    // shadows it in this scope. cached: the exploded lines feed both
    // the doc-frequency agg and the join side (different plan shapes —
    // exchange reuse can't merge them); cache = false opts out for
    // callers with no release point.
    val lines = graft.core.OperatorCaches.cachedIf(cache, docs.select(col(idCol),
      posexplode(org.apache.spark.sql.functions.split(col(textCol), "\n"))
        .as(Seq("pos", "line"))))
    val lineDf = lines.groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("line_df"))
    lines.join(lineDf, "line")
      .filter(col("line_df") < minDocFreq)
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), "\n").as(textCol))
  }

  /** E7 — BM25 relevance scores (Robertson/Spärck Jones; the Lucene
    * `(N - df + 0.5)/(df + 0.5)` idf variant inside `ln(1 + ·)` so idf
    * stays positive) for a literal term query over the corpus:
    *   score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * Returns (id, score) for every document matching at least one term.
    *
    * Cross-engine determinism: each per-term contribution quantizes to
    * integer MICRO units before the per-document sum — float addition
    * is order-dependent, and both the sum order and a boundary-landing
    * round differ between engines (the q69 lesson). The sum of
    * integers is exact; `score` and the (score desc, id) rank order
    * are therefore reproducible anywhere.
    *
    * Scale: the term filter collapses the token explode to |q| terms
    * per doc BEFORE any shuffle; df/N/avgdl are tiny broadcast sides;
    * the only real shuffle keys on the doc id. */
  def bm25Scores(docs: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // null-text rows are not documents — excluded HERE so corpus stats
    // (N, avgdl) agree exactly with the postings path, where such rows
    // can produce no postings at all
    val withDl = docs.filter(col(textCol).isNotNull).select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("dl"))
    val tok = withDl.select(col(idCol), col("dl"),
      explode(col("__toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val postings = tok.groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    bm25FromPostings(postings, idCol, queryTerms, k1, b,
      stats = withDl.agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl")))
  }

  /** E7 — inverted-index postings: one row per (doc, term, tf) with
    * the document length alongside — the build-ONCE artifact of a
    * retrieval layer. At 100 TB this is written bucketed by `term`
    * (io.Bucketing): a query's term lookups then prune to |q| buckets
    * and join postings shuffle-free (CorpusCurationSpec proves the
    * zero-exchange plan). Null-text rows are excluded — mirroring
    * [[bm25Scores]], so index and scan paths see the same corpus. */
  def buildPostings(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("dl"), explode(col("__toks")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** E7 — POSITIONAL postings: one row per (doc, term) carrying the
    * SORTED 0-based token position list plus tf and dl — the index
    * artifact phrase and proximity queries need ([[buildPostings]]
    * stores only tf; this is its phrase-capable sibling, written
    * term-bucketed at scale exactly like it). Positions index the raw
    * whitespace token array, matching [[TextAnalysis.tokens]]. */
  def buildPositionalPostings(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("dl"),
        posexplode(col("__toks")).as(Seq("pos", "term")))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("tf"))

  /** E7 — EXACT PHRASE search from positional postings: documents
    * containing `phrase` as consecutive tokens, with the occurrence
    * count and first match position. The classic positional-index
    * plan (Manning/Raghavan/Schütze IR ch. 2): one postings row per
    * phrase slot joins on the doc id, a match is a start position p
    * with slot i's list containing p+i — position lists are per-doc
    * bounded, so the conjunction evaluates scan-side after the |m|-way
    * doc-keyed join, never touching the pair space.
    *
    * Returns (id, n_occurrences, first_pos).
    *
    * Scale: the term filter prunes the index to |phrase| terms before
    * any join (bucketed postings make those lookups shuffle-free);
    * joins key on the doc id. Rare-term phrases — the realistic kind —
    * collapse the frame at the first join. */
  def phraseSearch(docs: DataFrame, textCol: String, idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phrase needs >= 2 terms")
    // the index is built over lowercased tokens — normalize the query
    // the same way, or an uppercase term silently matches nothing
    val ph = phrase.map(_.toLowerCase)
    val posts = graft.core.OperatorCaches.cachedIf(true,
      buildPositionalPostings(docs, textCol, idCol)
        .filter(col("term").isin(ph.distinct: _*)))
    val sides = ph.zipWithIndex.map { case (t, i) =>
      posts.filter(col("term") === t)
        .select(col(idCol), col("positions").as(s"__p$i"))
    }
    val joined = sides.reduce((a: DataFrame, b: DataFrame) =>
      a.join(b, Seq(idCol)))
    joined
      .select((col(idCol) +: (1 until phrase.size).map(i => col(s"__p$i")))
        :+ explode(col("__p0")).as("__s"): _*)
      .filter((1 until phrase.size)
        .map(i => array_contains(col(s"__p$i"), col("__s") + i))
        .reduce(_ && _))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occurrences"),
        min(col("__s")).cast("long").as("first_pos"))
  }

  /** E7 — PROXIMITY search from positional postings: documents where
    * ALL `terms` co-occur inside some `window`-token span, scored by
    * the number of start positions that open such a span (a start is
    * any occurrence of any term; the span [p, p+window) must contain
    * every term). The WITHIN-k operator of classic boolean IR —
    * phrase search's tolerant sibling on the same index artifact.
    *
    * Returns (id, n_windows, first_pos) — first_pos the smallest
    * opening position.
    *
    * Scale: same plan as [[phraseSearch]] — |terms| postings rows per
    * doc meet in a doc-keyed join, the span test is an array_exists
    * conjunction over per-doc bounded lists, scan-side. */
  def proximitySearch(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], window: Int): DataFrame = {
    require(terms.size >= 2, "proximity needs >= 2 terms")
    require(window >= terms.size, "window must fit all terms")
    // lowercase like the index (the phraseSearch normalization)
    val tms = terms.map(_.toLowerCase).distinct
    val posts = graft.core.OperatorCaches.cachedIf(true,
      buildPositionalPostings(docs, textCol, idCol)
        .filter(col("term").isin(tms: _*)))
    val sides = tms.zipWithIndex.map { case (t, i) =>
      posts.filter(col("term") === t)
        .select(col(idCol), col("positions").as(s"__p$i"))
    }
    val joined = sides.reduce((a: DataFrame, b: DataFrame) =>
      a.join(b, Seq(idCol)))
    val m = tms.size
    // candidate span starts: every occurrence of every term
    val starts = joined.withColumn("__starts",
      array_distinct(concat((0 until m).map(i => col(s"__p$i")): _*)))
    starts
      .select((col(idCol) +: (0 until m).map(i => col(s"__p$i")))
        :+ explode(col("__starts")).as("__s"): _*)
      .filter((0 until m)
        .map(i => exists(col(s"__p$i"),
          p => p >= col("__s") && p < col("__s") + window))
        .reduce(_ && _))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        min(col("__s")).cast("long").as("first_pos"))
  }

  /** E7 — RAG PASSAGE CHUNKING: fixed `window`-token chunks every
    * `stride` tokens (overlap = window − stride), the retrieval-corpus
    * builder every RAG stack runs before embedding. Chunk k covers
    * tokens [k·stride, min(k·stride+window, n)); the chunk count is
    * 1 + ⌈(n−window)/stride⌉ clamped at 1, so every token lands in ≥ 1
    * chunk, the last chunk may run short, and no chunk starts past the
    * end. Returns (id…, chunk_idx, tok_start, tok_end, n_chunk_tokens,
    * chunk_text).
    *
    * Scale: pure per-row column ops (sequence/transform/slice +
    * posexplode) — scan-side, no shuffle; output is fact-linear with
    * factor window/stride. */
  def chunkPassages(docs: DataFrame, textCol: String, idCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need 1 <= stride <= window")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") >= 1)
      .withColumn("__nc", when(col("__n") <= window, lit(1))
        .otherwise(expr(s"1 + (__n - $window + $stride - 1) div $stride")))
      .select(col(idCol), col("__n"),
        posexplode(transform(sequence(lit(0), col("__nc") - 1), k =>
          struct(
            (k * stride).cast("long").as("tok_start"),
            least(k * stride + window, col("__n")).cast("long").as("tok_end"),
            concat_ws(" ", slice(col("__toks"), k * stride + 1, lit(window)))
              .as("chunk_text")))).as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("__c.tok_start").as("tok_start"), col("__c.tok_end").as("tok_end"),
        (col("__c.tok_end") - col("__c.tok_start")).as("n_chunk_tokens"),
        col("__c.chunk_text").as("chunk_text"))
  }

  /** Corpus stats (N, avgdl) from a postings table — one aggregation
    * over the distinct (doc, dl) pairs. Exact-portable: the same
    * integers q74's scan path aggregates, in the same expression. */
  def postingsStats(postings: DataFrame, idCol: String): DataFrame =
    postings.select(col(idCol), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

  /** E7 — BM25 from a postings index (the query-MANY path): identical
    * arithmetic to [[bm25Scores]] — scoring from the index is
    * bit-equal to scoring from the corpus scan (q79 proves it against
    * q74's own oracle). `stats` defaults to [[postingsStats]] of the
    * postings themselves; pass the corpus-wide stats when the postings
    * were pre-filtered to the query terms. */
  /** The EXACT micro-quantized BM25 per-term contribution — one
    * definition shared by [[bm25FromPostings]] and
    * [[graft.ext.Similarity.gatedMaxsimRerank]], so the bit-exactness
    * the oracles rely on can never drift between the scan, index and
    * gated-rerank plans. Expects columns (n_docs, df, tf, dl, avgdl)
    * in scope. */
  def bm25ContribU(k1: Double, b: Double): Column =
    round(
      log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
        * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))) * 1e6, 0)
      .cast("long")

  def bm25FromPostings(postings: DataFrame, idCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      stats: DataFrame = null): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val tf = postings.filter(col("term").isin(queryTerms: _*))
    val st = Option(stats).getOrElse(postingsStats(postings, idCol))
    val dfreq = tf.groupBy(col("term")).agg(countDistinct(col(idCol)).as("df"))
    val contrib = tf.join(broadcast(dfreq), "term").crossJoin(broadcast(st))
      .withColumn("__contrib_u", bm25ContribU(k1, b))
    contrib.groupBy(col(idCol))
      .agg(round(sum(col("__contrib_u")).cast("double") / 1e6, 6).as("score"))
  }

  /** E7 — benchmark decontamination via a broadcast Bloom-filter
    * semi-join: find corpus documents sharing any `gramSize`-token
    * gram with a benchmark/eval set (train-test leakage detection).
    *
    * The benchmark side is SMALL by definition (an eval set, not the
    * corpus), so its distinct grams fit a driver-built Bloom filter
    * (`df.stat.bloomFilter` — a merged sketch of size O(expected
    * items), NOT O(corpus)); the sketch broadcasts to every executor
    * and prunes the corpus gram stream scan-side to ~fpp of its
    * volume BEFORE the only shuffle. Survivors are then exact-verified
    * with a semi-join against the real benchmark grams, so Bloom false
    * positives never reach the output — the sketch changes the plan's
    * cost, never its result. Returns (id, n_shared_grams > 0 docs).
    *
    * The mightContain call is a Scala UDF by necessity (the sketch
    * lives in a broadcast variable, not a Column); it sits OUTSIDE the
    * shuffle hot path — scan-side filter only — which is the documented
    * E6 exception to the no-UDF rule. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, gramSize: Int,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    def grams(df: DataFrame) = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= gramSize)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__toks")) - (gramSize - 1)),
        i => concat_ws(" ", slice(col("__toks"), i, lit(gramSize))))).as("gram"))
    val benchGrams = grams(benchmark).select("gram").distinct()
    val bloom = benchGrams.stat.bloomFilter("gram", expectedItems, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((g: String) => g != null && bc.value.mightContain(g))
    grams(corpus)
      .filter(mightContain(col("gram")))          // sketch prefilter (lossy-in, no false drops)
      .join(benchGrams, Seq("gram"), "left_semi") // exact verify — kills false positives
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
  }

  /** E7 — TOKEN-budget sampling (the real mixing primitive: "sample
    * source X down to N tokens", not "to N% of documents"): within
    * each key, documents are ordered by a content-derived hash (a
    * deterministic shuffle — reproducible on any layout, and exact
    * duplicates order adjacently), the running token total is
    * accumulated, and a document is kept while the budget is not yet
    * exhausted when it STARTS (so each stratum overshoots by at most
    * one document). Keys absent from `budgets` get `defaultBudget`.
    * Integer-only arithmetic — exactly portable.
    *
    * One window pass keyed on the stratum: the same shape as the
    * per-domain cap; a mega-source costs one partition sort. Adds
    * `n_tokens` (doc length) and `cum_tokens` (running total). */
  def tokenBudgetSample(docs: DataFrame, keyCol: Column, textCol: String,
      idCol: String, budgets: Map[String, Long], defaultBudget: Long,
      hash: Column => Column = xxhash64(_)): DataFrame = {
    val dl = size(TextAnalysis.tokens(col(textCol)))
    val w = Window.partitionBy(keyCol)
      .orderBy(hash(col(textCol)).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (k, v)) =>
      when(keyCol === k, lit(v)).otherwise(acc)
    }
    docs.withColumn("n_tokens", dl)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
  }

  /** E7 — sequence packing (the pre-tokenization step that turns a
    * cleaned corpus into fixed-length training sequences): documents
    * are dealt to `nShards` shards by content hash, ordered within
    * each shard by the same hash, and greedily concatenated; a
    * document's sequence number is its starting offset ÷ `seqLen`.
    * Returns (shard, seq_in_shard, offset_in_seq) per document —
    * offset = where the doc's tokens begin inside its sequence (docs
    * straddle boundaries; the tokenizer consumes the concatenation).
    *
    * Sharding IS the scale story: global packing is inherently
    * sequential, per-shard packing is embarrassingly parallel and
    * reproducible (shard and order are pure content functions).
    * Integer-only arithmetic — exactly portable. */
  def packSequences(docs: DataFrame, textCol: String, idCol: String,
      seqLen: Int, nShards: Int,
      hash: Column => Column = xxhash64(_)): DataFrame = {
    require(seqLen > 0 && nShards > 0, "seqLen and nShards must be positive")
    val dl = size(TextAnalysis.tokens(col(textCol)))
    // the hash is projected ONCE and reused for both the shard and the
    // window order — md5-class hashes dominate this scan's cost
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("__h", hash(col(textCol)))
      .withColumn("n_tokens", dl)
      // cast: shard must be LongType regardless of the hash family's width
      .withColumn("shard", pmod(col("__h"), lit(nShards)).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .drop("__h")
      // DIV, not `/`: Column./ is double division — integer DIV matches
      // DuckDB's // exactly at any magnitude
      .withColumn("seq_in_shard", expr(s"(cum_tokens - n_tokens) DIV $seqLen"))
      .withColumn("offset_in_seq", pmod(col("cum_tokens") - col("n_tokens"), lit(seqLen.toLong)))
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

  /** E7 — reciprocal-rank fusion (Cormack et al. 2009, public
    * literature): merge rankings from heterogeneous retrievers
    * (lexical BM25, vector cosine, …) without score calibration —
    * each list contributes unit div (k + rank) to its members, summed.
    * Integer micro-unit quotients (truncating division on both
    * engines), so the fused ranking is exact and engine-portable —
    * the property score-sum fusion can't have (incomparable scales).
    * Input frames carry (idCol, rankCol) with rank 1-based. Returns
    * (id, n_lists, rrf_u) — ids in fewer lists simply earn fewer
    * contributions.
    *
    * Scale: each list is already rank-bounded (top-k per retriever);
    * the fusion is one union + one id-keyed agg over |lists|·k rows —
    * the cheap last stage of a hybrid search/retrieval pipeline. */
  def reciprocalRankFusion(lists: Seq[DataFrame], idCol: String,
      rankCol: String, k: Int = 60, unit: Long = 1000000L): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    require(k >= 0 && unit > 0, "k must be >= 0, unit positive")
    lists.map(df => df.select(col(idCol).as("id"),
        expr(s"${unit}L div (${k}L + $rankCol)").as("__s")))
      .reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lists"), sum(col("__s")).as("rrf_u"))
  }

  /** E7 — greedy quality-first mixture under a token budget: rank
    * sources by an integer quality score (tie: source id), walk the
    * cumulative token count, take each source whole until the budget
    * line, and split the boundary source pro-rata. The simplest
    * defensible mixture when the constraint is "best B tokens", and
    * the baseline every learned mixture (DoReMi-style) is judged
    * against. Budget = total·num div den — exact integers throughout;
    * alloc_ppm is the per-source inclusion rate a downstream sampler
    * (q63's hash split) enforces. Returns per source:
    * (source, tokens, quality_u, alloc_tokens, alloc_ppm).
    *
    * Scale: the walk is a window over the SOURCE-grain rollup (tens
    * to thousands of rows), never documents; the emitted alloc_ppm
    * turns into a content-hash keep rule applied scan-side. */
  /** ML/mixing — ENTROPIC OPTIMAL-TRANSPORT PLAN between two
    * categorical distributions by fixed-round SINKHORN scaling
    * (Sinkhorn 1964; Cuturi, NeurIPS'13 "Sinkhorn distances:
    * lightspeed computation of optimal transport" — public
    * literature). Where q285's 1-Wasserstein reads the 1-D CDF gap,
    * the Sinkhorn PLAN says WHICH mass moves WHERE under the ordinal
    * ground cost |i − j| — the distribution-shift decomposition a
    * mixing pipeline acts on ("the 1-URGENT overflow became 3-MEDIUM").
    *
    * Integer trajectory (the q466 discipline): both marginals
    * normalize to exact ppm; the Gibbs kernel K = exp(−|i−j|)
    * quantizes once to ppm (the single libm touch, q141 rounding);
    * each round is two floor-divided scalings
    *   u_i = ⌊r_i·10¹² / Σ_j K_ij v_j⌋,  v_j = ⌊c_j·10¹² / Σ_i K_ij u_i⌋
    * and the read-out plan P_ij = ⌊u_i K_ij v_j / 10¹²⌋ is micro-mass
    * — bit-identical under any partitioning and replayable by a
    * second engine. `epsInv` is the integer inverse temperature
    * (kernel exp(−|i−j|·epsInv)): 1 gives the softest entropic plan,
    * larger values approach the unregularized OT plan; (k−1)·epsInv
    * must stay ≤ ~13 or the kernel underflows ppm (typed error). Returns k² rows:
    * (i, j, cost, k_ppm, plan_micro).
    *
    * Scale: two category-grain marginal aggs off the fact table; the
    * iteration runs on the k² literal-bounded kernel frame —
    * rounds × two k-row joins. */
  def sinkhornPlan(df: DataFrame, catCol: Column, isA: Column, k: Int,
      rounds: Int, epsInv: Int = 1): DataFrame = {
    require(k >= 2 && k <= 64, "k in [2, 64]")
    require(rounds >= 1 && rounds <= 64, "rounds in [1, 64]")
    require(epsInv >= 1 && (k - 1) * epsInv <= 13,
      s"(k-1)*epsInv <= 13 keeps the kernel within ppm precision " +
        "(exp(-13) ~ 2 ppm); bucket categories or soften epsilon")
    val d38 = "decimal(38,0)"
    val spark = df.sparkSession
    val base = df.select(catCol.cast("long").as("__cat"),
      isA.cast("boolean").as("__a"))
    def marginalPpm(side: Boolean, name: String): DataFrame = {
      val cnt = base.filter(col("__a") === side)
        .groupBy(col("__cat")).agg(count(lit(1)).as("__n"))
      val dense = spark.range(k).select(col("id").as("__cat"))
        .join(cnt, Seq("__cat"), "left")
        .withColumn("__n", coalesce(col("__n"), lit(0L)))
      dense.crossJoin(broadcast(dense.agg(sum(col("__n")).as("__tot"))))
        .select(col("__cat"),
          expr("CASE WHEN __tot = 0 THEN 0L ELSE " +
            "(__n * 1000000L) div __tot END").as(name))
    }
    val r = marginalPpm(side = true, "__r").localCheckpoint()
    val c = marginalPpm(side = false, "__c").localCheckpoint()
    val kern = spark.range(k).select(col("id").as("i"))
      .crossJoin(spark.range(k).select(col("id").as("j")))
      .withColumn("cost", abs(col("i") - col("j")))
      .withColumn("k_ppm",
        round(exp(-(col("cost") * epsInv).cast("double")) * 1e6, 0)
          .cast("long"))
      .localCheckpoint() // k² rows; read every round
    var u = spark.range(k).select(col("id").as("i"), lit(1000000L).as("__u"))
    var v = spark.range(k).select(col("id").as("j"), lit(1000000L).as("__v"))
    (1 to rounds).foreach { _ =>
      u = kern.join(v, "j")
        .groupBy(col("i"))
        .agg(sum(col("k_ppm").cast(d38) * col("__v")).cast(d38).as("__s"))
        .join(r.withColumnRenamed("__cat", "i"), "i")
        .select(col("i"), expr("CASE WHEN __s = 0 THEN 0L ELSE " +
          "CAST((CAST(__r AS decimal(38,0)) * 1000000000000) div __s " +
          "AS BIGINT) END").as("__u"))
        .localCheckpoint()
      v = kern.join(u, "i")
        .groupBy(col("j"))
        .agg(sum(col("k_ppm").cast(d38) * col("__u")).cast(d38).as("__t"))
        .join(c.withColumnRenamed("__cat", "j"), "j")
        .select(col("j"), expr("CASE WHEN __t = 0 THEN 0L ELSE " +
          "CAST((CAST(__c AS decimal(38,0)) * 1000000000000) div __t " +
          "AS BIGINT) END").as("__v"))
        .localCheckpoint()
    }
    kern.join(u, "i").join(v, "j")
      .select(col("i"), col("j"), col("cost"), col("k_ppm"),
        expr("CAST((CAST(__u AS decimal(38,0)) * k_ppm * __v) " +
          "div 1000000000000 AS BIGINT)").as("plan_micro"))
  }

  def greedyMixture(perSource: DataFrame, sourceCol: Column,
      tokensCol: Column, qualityCol: Column,
      budgetNum: Long, budgetDen: Long): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0, "budget fraction invalid")
    val base = perSource.select(sourceCol.as("source"),
      tokensCol.cast("long").as("tokens"),
      qualityCol.cast("long").as("quality_u"))
    val tot = base.agg(sum(col("tokens")).as("__total"))
    val w = Window.orderBy(col("quality_u").desc, col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.crossJoin(broadcast(tot))
      .withColumn("__budget", expr(s"__total * ${budgetNum}L div ${budgetDen}L"))
      .withColumn("__before", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .withColumn("alloc_tokens",
        greatest(lit(0L), least(col("tokens"), col("__budget") - col("__before"))))
      .withColumn("alloc_ppm", expr("1000000 * alloc_tokens div tokens"))
      .select(col("source"), col("tokens"), col("quality_u"),
        col("alloc_tokens"), col("alloc_ppm"))
  }

  /** E7/E6 — context-window PACKING AUDIT: lay the corpus out in a
    * deterministic total order, cut it into contiguous windows of
    * `capacity` tokens (documents MAY straddle a cut — the standard
    * "packed sequences" training layout), and report per window: how
    * many documents it touches, how many are SPLIT across its
    * boundary, and fill. High split counts mean cross-document
    * attention contamination unless the trainer masks boundaries —
    * the audit run before choosing capacity.
    *
    * Exactness: window ids are integer arithmetic on the exact token
    * prefix sums ((cum − size) div C for the start, (cum − 1) div C
    * for the end); a document touches windows start..end and is
    * "split" when end > start. Fan-out is end−start+1 ≤ ⌈size/C⌉+1
    * rows per doc via sequence() — bounded by the layout itself.
    * Returns per window: (window_id, n_docs, n_split, tokens_in).
    *
    * Scale: the prefix sum is [[graft.ops.Ranking.globalRunningSum]]
    * — range repartition + per-partition cumsums + a
    * |partitions|-row offset rollup, NEVER a single-partition window
    * over the doc table — so the audit runs at full corpus scale; the
    * explode is layout-bounded. */
  def contextPackingAudit(docs: DataFrame, idCol: Column, sizeCol: Column,
      capacity: Long): DataFrame = {
    require(capacity >= 1, "capacity >= 1")
    val laid = graft.ops.Ranking.globalRunningSum(
      docs.select(idCol.as("__id"), sizeCol.cast("long").as("__sz"))
        .filter(col("__sz") > 0),
      Seq(col("__id")), col("__sz"), "__cum")
      .withColumn("__w0", expr(s"(__cum - __sz) div ${capacity}L"))
      .withColumn("__w1", expr(s"(__cum - 1L) div ${capacity}L"))
    laid
      .withColumn("window_id",
        explode(sequence(col("__w0"), col("__w1"))))
      .withColumn("__in", least(col("__cum"),
        (col("window_id") + 1) * capacity) -
        greatest(col("__cum") - col("__sz"), col("window_id") * capacity))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("__w1") > col("__w0")).cast("long")).as("n_split"),
        sum(col("__in")).as("tokens_in"))
  }

  /** E2+/E7 — near-dup CLUSTER PURITY against a label (language,
    * source, license): per cluster, the modal label's share and the
    * label entropy. A low-purity cluster means the dedup graph fused
    * documents that differ where it matters (translations, forks,
    * licensed/unlicensed twins) — the audit between q70's components
    * and the q193 canonical keep.
    *
    * Exactness: shares are ppm integral quotients; entropy terms are
    * nano-nat quantized per (cluster, label) cell before the integer
    * sum (the q141 discipline). Modal label ties break to the
    * smallest label. Returns per cluster:
    * (cluster_id, n_docs, n_labels, modal_label, purity_ppm,
    * entropy_nano).
    *
    * Scale: one (cluster, label) agg with map-side combine + one
    * cluster-grain rollup of it. */
  def clusterPurity(assignments: DataFrame, clusterCol: Column,
      labelCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = assignments.groupBy(clusterCol.as("__cl"),
        labelCol.as("__lab"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // cluster×label grain; rollup + modal read it
    val tot = Window.partitionBy(col("__cl"))
    val ranked = cells
      .withColumn("__n", sum(col("__c")).over(tot))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__cl"))
          .orderBy(col("__c").desc, col("__lab"))))
      .withColumn("__p",
        col("__c").cast("double") / col("__n").cast("double"))
      .withColumn("__e_nano",
        round(-(col("__p") * log(col("__p"))) * 1e9, 0).cast("long"))
    ranked.groupBy(col("__cl").as("cluster_id"))
      .agg(max(col("__n")).as("n_docs"),
        count(lit(1)).as("n_labels"),
        max(when(col("__rk") === 1, col("__lab"))).as("modal_label"),
        max(when(col("__rk") === 1,
          expr("(__c * 1000000L) div __n"))).as("purity_ppm"),
        sum(col("__e_nano")).as("entropy_nano"))
  }

  /** E2+/E7 — SOURCE overlap matrix: exact shingle-set Jaccard between
    * every pair of sources — which crawls/feeds are substantially the
    * same corpus wearing two names. Doc-level dedup (q40-q46) finds
    * twin documents; this finds twin SOURCES, the licensing/mixture
    * question. Returns per pair (a < b):
    * (source_a, source_b, n_a, n_b, inter, jaccard).
    *
    * Exactness: set sizes and intersections are exact distinct
    * counts; jaccard is one pinned division, with the integer triple
    * kept so callers can threshold exactly (the q43 convention).
    *
    * Scale: one (source, shingle) distinct agg, a shingle-keyed
    * self-join for intersections (rare-shingle skew only — the q104
    * anti-skew argument), and a |sources|²-row finish. */
  def sourceOverlapMatrix(docs: DataFrame, textCol: Column,
      sourceCol: Column, shingleSize: Int): DataFrame = {
    val sh = docs.select(sourceCol.as("__src"),
        explode(Dedup.wordShingles(textCol, shingleSize)).as("__g"))
      .filter(col("__g") =!= "").distinct()
      .localCheckpoint() // (source, shingle) grain; sizes + join read it
    val sizes = sh.groupBy(col("__src")).agg(count(lit(1)).as("__n"))
    val inter = sh.select(col("__src").as("__sa"), col("__g"))
      .join(sh.select(col("__src").as("__sb"), col("__g")), Seq("__g"))
      .filter(col("__sa") < col("__sb"))
      .groupBy(col("__sa"), col("__sb"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("__src").as("__sa"),
        col("__n").as("n_a"))), Seq("__sa"))
      .join(broadcast(sizes.select(col("__src").as("__sb"),
        col("__n").as("n_b"))), Seq("__sb"))
      .select(col("__sa").as("source_a"), col("__sb").as("source_b"),
        col("n_a"), col("n_b"), col("inter"),
        round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 6)
          .as("jaccard"))
  }

  /** E4/E7 — per-source HEALTH PROFILE: the one-row-per-source corpus
    * card — doc count, exact-duplicate ratio (content-hash), mean
    * length (integral), language entropy (nano-nats) and modal
    * language share. The triage view that decides which source gets
    * per-source curation effort (q286's ABC cut reads value; this
    * reads QUALITY).
    *
    * Exactness: dup ratio = (n − distinct hashes)·1e6 div n; entropy
    * cells are nano-quantized before the integer sum; modal ties
    * break to the smallest language code. Returns per source:
    * (source, n_docs, dup_ppm, mean_chars, modal_lang,
    * modal_share_ppm, lang_entropy_nano).
    *
    * Scale: one source-grain agg (distinct-hash via approx-free exact
    * count_distinct — a second hash-keyed pass) + one (source, lang)
    * rollup; all map-side combinable. */
  def sourceHealthProfile(docs: DataFrame, sourceCol: Column,
      textCol: Column, langCol: Column, charsCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(sourceCol.as("__src"), langCol.as("__lang"),
      charsCol.cast("long").as("__chars"), sha2(textCol, 256).as("__h"))
    val perSrc = base.groupBy(col("__src"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("__h")).as("__dh"),
        sum(col("__chars")).as("__sc"))
      .withColumn("dup_ppm", expr("((n_docs - __dh) * 1000000L) div n_docs"))
      .withColumn("mean_chars", expr("__sc div n_docs"))
    val langCells = base.groupBy(col("__src"), col("__lang"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(col("__src"))))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__src"))
          .orderBy(col("__c").desc, col("__lang"))))
      .withColumn("__p",
        col("__c").cast("double") / col("__n").cast("double"))
      .withColumn("__e_nano",
        round(-(col("__p") * log(col("__p"))) * 1e9, 0).cast("long"))
    val langAgg = langCells.groupBy(col("__src"))
      .agg(max(when(col("__rk") === 1, col("__lang"))).as("modal_lang"),
        max(when(col("__rk") === 1,
          expr("(__c * 1000000L) div __n"))).as("modal_share_ppm"),
        sum(col("__e_nano")).as("lang_entropy_nano"))
    perSrc.join(langAgg, Seq("__src"))
      .select(col("__src").as("source"), col("n_docs"), col("dup_ppm"),
        col("mean_chars"), col("modal_lang"), col("modal_share_ppm"),
        col("lang_entropy_nano"))
  }

  /** E7 — PADDING-WASTE audit for length-bucketed training batches
    * (standard practice in sequence-model training — bucketing by
    * length to cut padding; public knowledge): given per-sequence
    * token lengths and a bucket width, every sequence in a bucket
    * pads to the bucket's MAX length. Reports, per bucket:
    * (bucket, n_seqs, max_len, token_sum, padded_sum, waste_ppm)
    * plus one '(all)' row (bucket = null) with corpus totals and the
    * NO-BUCKETING baseline waste (everything pads to the global max)
    * in baseline_waste_ppm — the number that justifies the bucketing.
    *
    * All integers; waste_ppm = 10⁶·(padded − tokens) div padded.
    *
    * Scale: one bucket-keyed agg with map-side combine + a
    * buckets-sized rollup. */
  def paddingWasteAudit(seqs: DataFrame, lenCol: Column,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth >= 1")
    val b = seqs.select(lenCol.cast("long").as("__len"))
      .withColumn("bucket", expr(s"__len div ${bucketWidth}L"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_seqs"), max(col("__len")).as("max_len"),
        sum(col("__len")).as("token_sum"))
      .withColumn("padded_sum", col("n_seqs") * col("max_len"))
      .withColumn("waste_ppm", expr(
        "CASE WHEN padded_sum > 0 THEN " +
          "(1000000 * (padded_sum - token_sum)) div padded_sum ELSE 0 END"))
      .localCheckpoint() // buckets-sized; summary + output read it
    val total = b.agg(
      lit(null).cast("long").as("bucket"),
      sum(col("n_seqs")).as("n_seqs"),
      max(col("max_len")).as("max_len"),
      sum(col("token_sum")).as("token_sum"),
      sum(col("padded_sum")).as("padded_sum"))
      .withColumn("waste_ppm", expr(
        "(1000000 * (padded_sum - token_sum)) div padded_sum"))
      // the no-bucketing baseline: everything pads to the global max
      .withColumn("baseline_waste_ppm", expr(
        "(1000000 * (n_seqs * max_len - token_sum)) div (n_seqs * max_len)"))
    b.withColumn("baseline_waste_ppm", lit(null).cast("long"))
      .unionByName(total)
  }

  /** BLEU between paired texts (Papineni et al., ACL'02 — public
    * literature), smoothed, orders 1..`maxN`: clipped n-gram
    * precisions p_n combined as exp(Σ ln p_n / N) with the brevity
    * penalty exp(1 − r/c) for c < r — the generation-fidelity
    * companion to [[graft.ext.TextAnalysis.rouge2]]'s recall view.
    *
    * Determinism contract: n-gram counts and clipped overlaps are
    * exact integers ((cand, gram) min-joins, the rouge2 machinery);
    * add-one smoothing keeps every precision in (0,1]; the geometric
    * mean and brevity penalty are ONE pinned IEEE chain per pair,
    * nano-quantized (the psi device) as bleu_nano. Returns per pair:
    * (pair…, c_len, r_len, overlap_1..maxN, bleu_nano).
    *
    * Scale: explode to (pair, gram) rollups per order — content-keyed,
    * map-side combinable; everything joins on (pair, gram). */
  def bleu(pairs: DataFrame, pairIdCol: String, candCol: String,
      refCol: String, maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 4, "maxN in [1, 4]")
    def toks(c: String) =
      expr(s"filter(split(lower($c), '\\\\s+'), x -> x <> '')")
    val base = pairs.select(col(pairIdCol).as("__pid"),
      toks(candCol).as("__ct"), toks(refCol).as("__rt"))
      .localCheckpoint() // pair grain; every order's explode reads it
    def gramCounts(src: Column, n: Int, tag: String) = {
      // guard: sequence(1, 0) would DESCEND in Spark — short inputs
      // must yield no grams, not a reversed index walk
      val grams = expr(
        s"""CASE WHEN size(${src.toString}) < $n
           |  THEN CAST(array() AS array<string>)
           |  ELSE transform(sequence(1, size(${src.toString}) - ${n - 1}),
           |    i -> concat_ws(' ', slice(${src.toString}, i, $n))) END""".stripMargin)
      base.select(col("__pid"), explode(grams).as("__g"))
        .groupBy(col("__pid"), col("__g"))
        .agg(count(lit(1)).as(s"__c$tag"))
    }
    val perOrder = (1 to maxN).map { n =>
      val c = gramCounts(col("__ct"), n, "c")
      val r = gramCounts(col("__rt"), n, "r")
      val ov = c.join(r, Seq("__pid", "__g"))
        .groupBy(col("__pid"))
        .agg(sum(least(col("__cc"), col("__cr"))).as(s"overlap_$n"))
      val tot = c.groupBy(col("__pid")).agg(sum(col("__cc")).as(s"__tot_$n"))
      tot.join(ov, Seq("__pid"), "left")
        .withColumn(s"overlap_$n", coalesce(col(s"overlap_$n"), lit(0L)))
    }
    val lens = base.select(col("__pid"),
      size(col("__ct")).cast("long").as("c_len"),
      size(col("__rt")).cast("long").as("r_len"))
    val joined = perOrder.foldLeft(lens)((acc, o) =>
      acc.join(o, Seq("__pid"), "left"))
    // smoothed precision ln((ov+1)/(tot+1)) per order; pinned chain
    val lnSum = (1 to maxN).map { n =>
      log((coalesce(col(s"overlap_$n"), lit(0L)) + 1).cast("double") /
        (coalesce(col(s"__tot_$n"), lit(0L)) + 1).cast("double"))
    }.reduce(_ + _)
    val bp = when(col("c_len") >= col("r_len"), lit(1.0))
      .otherwise(exp(lit(1.0) -
        col("r_len").cast("double") / col("c_len").cast("double")))
    joined
      .withColumn("bleu_nano", round(
        bp * exp(lnSum / maxN) * 1e9, 0).cast("long"))
      .select(Seq(col("__pid").as(pairIdCol), col("c_len"), col("r_len")) ++
        (1 to maxN).map(n => coalesce(col(s"overlap_$n"), lit(0L))
          .as(s"overlap_$n")) :+ col("bleu_nano"): _*)
  }

  /** E4+/ML — BATCH perceptron training for a corpus quality
    * classifier (Rosenblatt 1958, batch/"gradient" form): per round,
    * over the FULL corpus, sum y·x over currently-misclassified
    * examples (y·(w·x) ≤ 0) and add the sum to the weights — the
    * order-independent sibling of the classic sequential perceptron
    * (whose per-example updates depend on scan order and can never
    * hash-match across partitionings). All-integer features, labels
    * (±1), and weights: every round is a pure function of the corpus,
    * so an engine unrolling the same rounds agrees bit-for-bit.
    *
    * Returns one row per round: (round, n_err = misclassified count
    * BEFORE that round's update, w0..w{k-1} = weights AFTER it).
    *
    * Scale: one localCheckpointed pass-per-round over the feature
    * frame with broadcast 1-row weights (powerIterationInt's shape —
    * no driver loop state beyond the plan); misclassification and the
    * y·x sums are one map-side-combined agg. The linear-classifier
    * quality gate (fastText-style) trained inside the engine at any
    * corpus size; rounds is the only sequential dimension.
    * Overflow: |w_d| grows ≤ rounds·Σ|x_d|; callers keep
    * rounds·n·max|x| ≪ 2⁶³ (requireed loosely below). */
  def batchPerceptron(df: DataFrame, features: Seq[Column],
      label: Column, rounds: Int): DataFrame = {
    require(features.nonEmpty && rounds >= 1, "need features and rounds >= 1")
    val nF = features.size
    val spark = df.sparkSession
    val pts = df.select(features.zipWithIndex.map { case (f, i) =>
        f.cast("long").as(s"__x$i") } :+ label.cast("long").as("__y"): _*)
      .localCheckpoint() // re-read every round
    def margin: Column = (0 until nF).map(i =>
      col(s"__w$i") * col(s"__x$i")).reduce(_ + _)
    var w: DataFrame = spark.range(1)
      .select((0 until nF).map(i => lit(0L).as(s"__w$i")): _*)
    val out = (1 to rounds).map { r =>
      val mis = pts.crossJoin(broadcast(w))
        .filter(col("__y") * margin <= 0)
      val delta = mis.agg(
        count(lit(1)).as("__nerr"),
        (0 until nF).map(i =>
          coalesce(sum(col("__y") * col(s"__x$i")), lit(0L)).as(s"__d$i")): _*)
      // 1-row × 1-row: weights advance by the misclassified-sum
      val stepped = w.crossJoin(delta)
        .select((0 until nF).map(i =>
          (col(s"__w$i") + col(s"__d$i")).as(s"__w$i")) :+
          col("__nerr"): _*)
        .localCheckpoint() // bounds plan depth across rounds
      // next round carries ONLY the weights (a carried __nerr would
      // collide with the next delta's on the crossJoin)
      w = stepped.select((0 until nF).map(i => col(s"__w$i")): _*)
      stepped.select(Seq(lit(r.toLong).as("round"),
        col("__nerr").as("n_err")) ++
        (0 until nF).map(i => col(s"__w$i").as(s"w$i")): _*)
    }
    val res = out.reduce(_ unionByName _)
    res
  }

  /** E4+/E8 — DSIR importance scores (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023):
    * score every RAW-pool document by how target-like its hashed
    * unigram distribution is. Tokens hash into `buckets` buckets
    * ([[Dedup.md5Hash60]] — cross-engine-reconstructible); target and
    * raw bucket counts give Laplace-smoothed models
    * p(b) = (c_b + 1)/(N + buckets), and a doc's score is
    * Σ_tokens [ln p_target(b) − ln p_raw(b)]. Per-BUCKET log-ratios
    * quantize to integer micro-nats once (q69's exactness argument),
    * so the per-doc sum is exact and order-independent. Returns
    * (id, n_tokens, score_u) for raw-pool docs; callers resample
    * top-score_u (or Gumbel-perturbed) as the selection step.
    *
    * Scale: two token-scan aggs (bucket-keyed, uniform by hashing) +
    * a broadcast |buckets|-row model join back onto the token scan —
    * no shuffle wider than the token explode itself. The
    * importance-resampling selector over any raw-corpus size; the
    * model is O(buckets), never O(vocab). */
  def dsirScores(docs: DataFrame, textCol: String, idCol: String,
      isTarget: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, "buckets >= 2")
    // cached: the bucketed token explode feeds the model agg AND the
    // raw-doc scoring join
    val tok = graft.core.OperatorCaches.cached(
      docs.select(col(idCol).as("__id"), isTarget.as("__t"),
          explode(TextAnalysis.tokens(col(textCol))).as("__term"))
        .withColumn("__b", pmod(Dedup.md5Hash60(col("__term")), lit(buckets.toLong))))
    val counts = tok.groupBy(col("__b")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
      sum(when(col("__t"), 0L).otherwise(1L)).as("__cr"))
    val totals = tok.agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__nt"),
      sum(when(col("__t"), 0L).otherwise(1L)).as("__nr"))
    // per-bucket micro-nat log-ratio, quantized ONCE; the doc score is
    // then an exact integer sum
    val model = counts.crossJoin(broadcast(totals))
      .select(col("__b"), round((
        log((col("__ct") + 1).cast("double")) -
        log((col("__nt") + buckets).cast("double")) -
        log((col("__cr") + 1).cast("double")) +
        log((col("__nr") + buckets).cast("double"))) * 1e6, 0)
        .cast("long").as("__lr_u"))
    tok.filter(!col("__t"))
      .join(broadcast(model), Seq("__b"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__lr_u")).as("score_u"))
      .select(col("__id").as(idCol), col("n_tokens"), col("score_u"))
  }

  /** E6/E8 — weighted sampling WITHOUT replacement via hash keys
    * (Efraimidis & Spirakis, "Weighted random sampling with a
    * reservoir", IPL 2006): each unit gets key u^(1/w) for a
    * content-derived uniform u — the top-k keys ARE a weighted
    * sample without replacement. Maximizing u^(1/w) is maximizing
    * ln(u)/w, computed here as one nano-nat integer per unit
    * (ln over a ratio of exact integers — the q69 discipline), so
    * selection is a deterministic top-k on (score, id): reproducible
    * across engines, reruns and reshards, and mergeable (the top-k of
    * a union is the top-k of per-part top-ks). Returns the k selected
    * rows: (id, weight, u_ppm, score_nano), best first.
    *
    * Scale: scan-side scoring + TakeOrdered(k) — per-partition heaps,
    * no global sort, no shuffle wider than k rows. The deterministic
    * weighted corpus subsampler (quality-weighted doc selection) at
    * any size. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val w = weightCol.cast("long")
    df.select(col(idCol), w.as("weight"))
      .filter(col("weight") > 0)
      .withColumn("u_ppm",
        pmod(Dedup.md5Hash60(col(idCol).cast("string")), lit(1000000L)) + 1)
      .withColumn("score_nano", round(
        log(col("u_ppm").cast("double") / 1e6) / col("weight").cast("double")
          * 1e9, 0).cast("long"))
      .orderBy(col("score_nano").desc, col(idCol))
      .limit(k)
  }

  /** E4+ — one DoReMi domain-reweighting step (Xie et al., "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    * NeurIPS 2023): per training domain, measure excess loss over the
    * corpus-wide baseline and tilt the token-share mixture
    * multiplicatively toward high-excess (hard) domains —
    * w'_d ∝ T_d · exp(η · max(0, L_d − B)), the exponentiated-
    * gradient update of the paper's minimax objective with the
    * corpus unigram LM standing in for the proxy/reference pair
    * (the q69 perplexity-proxy discipline).
    *
    * Exactness: per-token log-probs quantize to integer micro-nats;
    * per-domain mean loss is an integer floor-division of exact sums
    * (micro-nats), as is the global baseline — so excess is exact
    * integer on any engine/partitioning. The libm exp tilt quantizes
    * to an integer micro-factor before the share division; the two
    * emitted shares are single pinned-order double divisions.
    *
    * Returns per domain: (domain, n_tokens, base_share, loss_micro,
    * excess_micro, new_share), ordered by domain.
    *
    * Scale: one token explode feeds a content-keyed frequency agg +
    * a 1-row broadcast total (the unigramLogProb shape); everything
    * per-domain is a |domains|-row rollup. The mixture step a 100 TB
    * pretraining pipeline actually runs between proxy epochs. */
  def doremiStep(docs: DataFrame, textCol: String, domainCol: String,
      etaMicro: Long = 1000000L): DataFrame = {
    require(etaMicro >= 0, "etaMicro >= 0")
    val d38 = "decimal(38,0)"
    val tok = graft.core.OperatorCaches.cached(
      docs.select(col(domainCol).as("domain"),
        explode(TextAnalysis.tokens(col(textCol))).as("term")))
    val freq = tok.groupBy(col("term")).agg(count(lit(1)).as("n_t"))
    val total = tok.agg(count(lit(1)).as("n_total"))
    val perDom = tok.join(freq, "term").crossJoin(broadcast(total))
      .withColumn("__nll_u",
        -round(log(col("n_t").cast("double") / col("n_total")) * 1e6, 0)
          .cast("long"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__nll_u")).as("__nll_sum"))
      .withColumn("loss_micro", expr("__nll_sum div n_tokens"))
    val base = perDom.agg(sum(col("n_tokens")).as("__t_tot"),
      sum(col("__nll_sum")).as("__nll_tot"))
      .withColumn("__base_micro", expr("__nll_tot div __t_tot"))
    val tilted = perDom.crossJoin(broadcast(base))
      .withColumn("excess_micro",
        greatest(lit(0L), col("loss_micro") - col("__base_micro")))
      // libm exp differs across engines in the low bits — quantize the
      // tilt factor to an integer micro-factor before any division
      .withColumn("__tilt_u",
        floor(exp(col("excess_micro").cast("double") / 1e6 *
          (etaMicro.toDouble / 1e6)) * 1e6 + 0.5).cast("long"))
      .withColumn("__mass", col("n_tokens").cast(d38) * col("__tilt_u"))
    val z = tilted.agg(sum(col("__mass")).cast(d38).as("__z"))
    tilted.crossJoin(broadcast(z))
      .select(col("domain"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("__t_tot").cast("double"))
          .as("base_share"),
        col("loss_micro"), col("excess_micro"),
        (col("__mass").cast("double") / col("__z").cast("double"))
          .as("new_share"))
      .orderBy(col("domain"))
  }
  /** E4/IR — Dirichlet-smoothed query-likelihood retrieval scoring
    * (Zhai & Lafferty, SIGIR 2001 — the language-modeling ranker that
    * beats BM25 on verbose queries):
    *   score(q, d) = Σ_{w∈q} ln( (tf(w,d) + μ·p(w|C)) / (|d| + μ) )
    * with p(w|C) = cf(w)/T the corpus unigram model. Cleared of
    * fractions, each term is ln((tf·T + μ·cf) / (T·(|d| + μ))) — an
    * exact integer ratio, micro-nat quantized once per (doc, term)
    * cell (floor(·1e6 + 0.5), the suite's libm discipline), so scores
    * are integer sums. Query terms absent from the corpus are dropped
    * (cf = 0 ⇒ ln 0), the standard OOV convention. Returns one row
    * per document scoring at least one term:
    * (doc, doc_len, n_terms_hit, score_micro).
    *
    * Scale: ONE (doc, term) rollup filtered to the |q| query terms
    * (scan-side IN filter), doc lengths ride the same pass; corpus
    * frequencies are a |q|-row broadcast. The scoring shape of
    * [[bm25Scores]] with the LM numerator. */
  def dirichletQL(docs: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], mu: Long = 2000L): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    require(mu >= 1, "mu >= 1")
    val d38 = "decimal(38,0)"
    val toks = docs.select(col(idCol).as("__d"),
        explode(org.apache.spark.sql.functions.split(
          lower(col(textCol)), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .localCheckpoint()
    val lens = toks.groupBy(col("__d")).agg(count(lit(1)).as("__len"))
    val tot = toks.agg(count(lit(1)).as("__t"))
    val qset = queryTerms.map(_.toLowerCase)
    val cf = toks.filter(col("__w").isin(qset: _*))
      .groupBy(col("__w")).agg(count(lit(1)).as("__cf"))
    val tf = toks.filter(col("__w").isin(qset: _*))
      .groupBy(col("__d"), col("__w")).agg(count(lit(1)).as("__tf"))
    // densify: every (doc-with-a-hit, query term) cell so zero-tf
    // terms still contribute their smoothed mass
    val hitDocs = tf.select(col("__d")).distinct()
    val cells = hitDocs.crossJoin(broadcast(cf))
      .join(tf, Seq("__d", "__w"), "left")
      .withColumn("__tf", coalesce(col("__tf"), lit(0L)))
      .join(lens, "__d").crossJoin(broadcast(tot))
    cells
      .withColumn("__num", expr(
        s"cast(__tf as $d38) * __t + cast(${mu}L as $d38) * __cf"))
      .withColumn("__den", expr(
        s"cast(__t as $d38) * (__len + ${mu}L)"))
      .withColumn("__mnat", floor(
        log(col("__num").cast("double") / col("__den").cast("double"))
          * 1e6 + 0.5).cast("long"))
      .groupBy(col("__d").as("doc"))
      .agg(max(col("__len")).as("doc_len"),
        sum(when(col("__tf") > 0, 1L).otherwise(0L)).as("n_terms_hit"),
        sum(col("__mnat")).as("score_micro"))
  }
  /** E7 — greedy maximum-coverage source selection (Nemhauser,
    * Wolsey & Fisher 1978 — the (1−1/e) greedy for submodular
    * coverage): pick k sources so their union covers the most
    * distinct vocabulary — the "which feeds are worth licensing /
    * crawling" budget decision. Each round takes the source with the
    * largest NEW-word gain (ties → source asc), deterministic and
    * replayable round by round.
    *
    * Returns one row per pick: (pick_order, source, gain,
    * cumulative_coverage).
    *
    * Scale: the (source, word) rollup is one fact pass; each round is
    * one anti-join against the covered-word set + a source-keyed agg
    * + a TakeOrdered(1) argmax — k rounds, one 2-field row to the
    * driver per round (the k-center/MMR license). */
  def maxCoverageSources(docs: DataFrame, textCol: String,
      sourceCol: String, k: Int, shingleSize: Int = 1): DataFrame = {
    require(k >= 1 && k <= 100, "1 <= k <= 100")
    require(shingleSize >= 1 && shingleSize <= 8, "1 <= shingleSize <= 8")
    val tok =
      if (shingleSize == 1) org.apache.spark.sql.functions.split(
        lower(col(textCol)), "\\s+")
      else graft.ext.Dedup.wordShingles(col(textCol), shingleSize)
    // ONE word-keyed pin of the (source, word) rollup (opt round 11,
    // guide §2.4): every greedy round's anti-join keys on __w, so the
    // exchange + in-partition sort are paid once here and each round's
    // SortMergeJoin(LeftAnti) consumes BOTH sides exchange-free and
    // sort-free — the covered set is just the chosen slice of this same
    // pinned frame (duplicates are harmless to an anti join), which
    // also deletes the old per-round union+distinct+checkpoint of the
    // covered vocabulary. k driver rows per run, unchanged.
    val np = docs.sparkSession.sparkContext.defaultParallelism
    val aw = docs.select(col(sourceCol).cast("string").as("__src"),
        explode(tok).as("__w"))
      .filter(length(col("__w")) > 0)
      .select(col("__src"), col("__w")).distinct()
      .repartition(np, col("__w")).sortWithinPartitions("__w")
      .localCheckpoint()
    var chosen = Vector.empty[(String, Long, Long)] // (src, gain, cum)
    var cum = 0L
    var i = 0
    while (i < k) {
      val remaining = aw.filter(!col("__src").isin(chosen.map(_._1): _*))
      val gains = (if (chosen.isEmpty) remaining
        else remaining.join(
          aw.filter(col("__src").isin(chosen.map(_._1): _*))
            .select(col("__w")), Seq("__w"), "left_anti"))
        .groupBy(col("__src")).agg(count(lit(1)).as("__g"))
        .orderBy(col("__g").desc, col("__src")).limit(1).collect()
      if (gains.nonEmpty) {
        val pick = gains(0).getString(0); val g = gains(0).getLong(1)
        cum += g
        chosen :+= ((pick, g, cum))
      }
      i += 1
    }
    val spark = docs.sparkSession
    import spark.implicits._
    chosen.zipWithIndex.map { case ((s, g, c), ix) =>
      (ix.toLong + 1, s, g, c)
    }.toDF("pick_order", "source", "gain", "cumulative_coverage")
      .orderBy(col("pick_order"))
  }
}
