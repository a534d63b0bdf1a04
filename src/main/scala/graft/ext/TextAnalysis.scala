package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E4 — text analysis for training-data pipelines: language ID
  * (stopword-hit heuristic), quality scoring, token counting,
  * document fingerprinting. All pure column expressions — these run
  * per-document in the scan, no shuffle, no UDFs.
  */
object TextAnalysis {

  // ---- by-design plan-hazard documentation (Guardrails.expect) ------
  // Each entry registers a deliberately-BOUNDED single-partition window
  // or unconditioned join this object builds, with its boundedness
  // argument, so the optimizer audit (PlanAudit / the Guardrails rule)
  // flags only NEW hazards instead of letting them hide among known
  // ones. Markers are operator-owned columns of the hazard plan node.
  graft.plans.Guardrails.expect("single_partition_window",
    "vocab, __cp", "vocabGrowth/heapsFit: checkpoint rollup (corpus/every rows)",
    "rollup")
  graft.plans.Guardrails.expect("single_partition_window",
    "__w, __f", "zipfSlope: top-k frequency ranks",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__cum, __w, __c", "vocabCoverage: vocabulary-rollup cumulative mass",
    "vocabulary")
  graft.plans.Guardrails.expect("single_partition_window",
    "__nt, __ty", "vocabCoverage: 1-row totals over the vocabulary rollup",
    "k-literal")
  graft.plans.Guardrails.expect("cartesian_join",
    "__cdw, __prior_u", "naiveBayesClassify: doc-token frame × the " +
      "|labels|-row class-stats broadcast (every doc scores every class)",
    "vocabulary")
  graft.plans.Guardrails.expect("cartesian_join",
    "__sw1, __u1", "plsa2Topics: vocab rollup × the 1-row per-topic " +
      "M-step totals broadcast",
    "k-literal")



  /** Tiny built-in stopword profiles for the n-gram/stopword language
    * heuristic. Deliberately small — the contract is "cheap scan-side
    * lang-id", not a full classifier. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "du", "que", "pour"),
    "de" -> Seq("der", "die", "und", "das", "ein", "mit", "von", "zu", "den", "ist"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por", "con", "para", "las"))

  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Latin accent folding table for [[normalizeText]] — a fixed
    * translate() mapping (codegen'd, no UDF). Covers the Latin-1 +
    * Latin-Extended-A letters that dominate European corpora; anything
    * outside the table passes through unchanged. */
  private val foldPairs = Seq(
    "àáâãäåāăą" -> 'a', "èéêëēĕėęě" -> 'e', "ìíîïĩīĭįı" -> 'i',
    "òóôõöøōŏő" -> 'o', "ùúûüũūŭůűų" -> 'u', "çćĉċč" -> 'c',
    "ñńņň" -> 'n', "ðďđ" -> 'd', "ĝğġģ" -> 'g', "ĥħ" -> 'h',
    "ĵ" -> 'j', "ķ" -> 'k', "ĺļľŀł" -> 'l', "ŕŗř" -> 'r',
    "śŝşš" -> 's', "ţťŧ" -> 't', "ŵ" -> 'w', "ýÿŷ" -> 'y',
    "źżž" -> 'z')
  // private[graft]: q83's oracle interpolates the same tables into its
  // SQL so DuckDB folds with the identical mapping
  private[graft] val accented = foldPairs.map(_._1).mkString
  private[graft] val folded = foldPairs.map { case (s, c) => c.toString * s.length }.mkString

  /** E4 — text normalization for dedup/fingerprint keys: lowercase,
    * fold Latin accents, collapse whitespace runs, trim. Normalizing
    * BEFORE hashing is what makes "Café  du  Monde" and "cafe du
    * monde" the same dedup key; all four steps are codegen'd string
    * expressions. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(translate(lower(text), accented, folded), "\\s+", " "))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word-piece regex (letter runs, digit runs,
    * single punctuation marks) — a cheap proxy for tokenizer cost. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Stopword hit ratio of a pre-tokenized array for one language
    * profile — the single definition of the score formula (q47's oracle
    * transliterates exactly this). */
  def stopwordRatioFromTokens(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang): _*))) /
      greatest(size(toks), lit(1)).cast("double")

  /** Stopword hit ratio for one language profile. */
  def stopwordRatio(text: Column, lang: String): Column =
    stopwordRatioFromTokens(tokens(text), lang)

  /** Language ID over a PRE-TOKENIZED array column: argmax of stopword
    * hit ratio; "und" (undetermined) when no profile scores above
    * `minRatio`. Callers should project `tokens(text)` into a named
    * column first — Catalyst's CollapseProject keeps a non-cheap
    * expression referenced this many times in its own projection, so
    * the split runs once per row instead of once per stopword filter
    * (16× in the inlined form). */
  def langIdFromTokens(toks: Column, minRatio: Double = 0.02): Column = {
    val scored = stopwords.keys.toSeq.sorted.map(l => struct(
      stopwordRatioFromTokens(toks, l).as("score"), lit(l).as("lang")))
    val best = array_max(array(scored: _*))
    when(best.getField("score") >= minRatio, best.getField("lang")).otherwise(lit("und"))
  }

  /** Language ID from raw text (single-expression convenience; prefer
    * [[langIdFromTokens]] over a named token column in wide scans). */
  def langId(text: Column, minRatio: Double = 0.02): Column =
    langIdFromTokens(tokens(text), minRatio)

  /** Quality features + a composite score in [0,1]: length band,
    * mean word length band, punctuation ratio, all-caps ratio.
    * (Heuristics in the C4/Gopher-rules tradition, scan-side.) */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val toks = tokens(t)
    val nToks = greatest(size(toks), lit(1))
    val punct = size(regexp_extract_all(t, lit("[.,;:!?]"), lit(0)))
    df.withColumn("n_chars", nChars)
      .withColumn("n_tokens", size(toks))
      .withColumn("mean_word_len",
        (nChars - size(toks) + 1).cast("double") / nToks)
      .withColumn("punct_ratio", punct.cast("double") / greatest(nChars, lit(1)))
      .withColumn("quality_score",
        (when(nChars.between(50, 20000), 0.4).otherwise(0.0) +
         when((nChars.cast("double") / nToks).between(3, 12), 0.4).otherwise(0.0) +
         when(punct.cast("double") / greatest(nChars, lit(1)) < 0.1, 0.2).otherwise(0.0)))
  }

  /** E4 — the composite C4/Gopher-style KEEP decision: every rule is a
    * named boolean column plus the exact integer/ratio signal it reads,
    * so a filtered corpus is auditable (why did this doc die?). All
    * signals are exact int/int arithmetic over whitespace tokens —
    * deliberately UNROUNDED (identical integer operands give
    * bit-identical IEEE divisions; see q73) — and the whole thing is
    * one scan-side projection: no shuffle, no UDF, pushdown-friendly.
    *
    * Rules (the Gopher/C4 tradition, thresholds as parameters):
    *   - word count within [minWords, maxWords]
    *   - mean word length within [minMeanLen, maxMeanLen]
    *   - fraction of words containing a letter >= minAlphaFrac
    *   - at least minStopHits English stopword hits
    */
  def qualityGate(df: DataFrame, textCol: String, idCol: String,
      minWords: Int = 20, maxWords: Int = 100000,
      minMeanLen: Double = 2.0, maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopHits: Int = 1): DataFrame = {
    // named token column → the split runs once per row (langId lesson)
    val toked = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val nW = size(col("__toks"))
    val meanLen = aggregate(transform(col("__toks"), t => length(t)),
      lit(0), (a, x) => a + x).cast("double") / nW
    val alphaFrac = size(filter(col("__toks"), t => t.rlike("[a-z]")))
      .cast("double") / nW
    val stopHits = size(filter(col("__toks"), t => t.isin(stopwords("en"): _*)))
    toked.select(col(idCol),
        nW.as("n_words"), meanLen.as("mean_word_len"),
        alphaFrac.as("alpha_frac"), stopHits.as("stop_hits"))
      .withColumn("rule_len", col("n_words").between(minWords, maxWords))
      .withColumn("rule_word_len", col("mean_word_len").between(minMeanLen, maxMeanLen))
      .withColumn("rule_alpha", col("alpha_frac") >= minAlphaFrac)
      .withColumn("rule_stop", col("stop_hits") >= minStopHits)
      .withColumn("keep",
        col("rule_len") && col("rule_word_len") && col("rule_alpha") && col("rule_stop"))
  }

  /** E4 — PII patterns for [[redactPii]]: (kind, regex, replacement).
    * Deliberately conservative character-class/bounded-repeat syntax —
    * no backreferences or lookaround — so the SAME pattern string means
    * the same thing to Java regex (Spark) and RE2 (DuckDB, the oracle
    * engine): redaction is oracle-checkable, not just spec'd. Order
    * matters: emails first (their local part could otherwise feed the
    * number patterns). */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    // (?i) — supported identically by Java regex and RE2 — because raw
    // corpora carry mixed-case emails and a case-sensitive scrub would
    // let them through
    ("email", "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}-\\d{4}\\b", "<PHONE>"))

  /** E4 — PII redaction (the pre-training privacy scrub): replace
    * every email / IPv4 / phone-shaped span with a typed placeholder
    * token. Pure codegen'd regexp_replace chain — scan-side, no
    * shuffle, pushdown-friendly. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Per-kind PII match count (audit surface for the scrub). */
  def piiCount(text: Column, kind: String): Column = {
    val pat = piiPatterns.collectFirst { case (`kind`, p, _) => p }
      .getOrElse(sys.error(s"unknown PII kind '$kind'; known: ${piiPatterns.map(_._1)}"))
    size(regexp_extract_all(text, lit(pat), lit(0)))
  }

  /** E4 — intra-document repetition signals (the Gopher repetition
    * rules): the quality gates that kill machine-generated loops and
    * template spam.
    *   - top_token_frac:  occurrences of the most frequent token / all
    *     tokens (Gopher kills docs > 0.?? depending on n)
    *   - dup_token_frac:  (tokens − distinct tokens) / tokens
    *   - top_bigram_frac: occurrences of the most frequent bigram /
    *     all bigrams (0 for single-token docs)
    * All ratios are exact int/int IEEE divisions of identical integer
    * operands — bit-identical across engines WITHOUT rounding (and
    * deliberately not rounded: c/2^k ratios can land exactly on a
    * round-half boundary, where engines' tie rules differ). One token
    * explode + one bigram explode, each feeding a doc-keyed
    * aggregation: two shuffles keyed on the doc id, output one row per
    * document. */
  def repetitionSignals(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val tokStats = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        max(col("c")).as("top_c"),
        count(lit(1)).as("n_distinct"))
      .select(col(idCol), col("n_tokens"),
        (col("top_c") / col("n_tokens").cast("double")).as("top_token_frac"),
        ((col("n_tokens") - col("n_distinct")) / col("n_tokens").cast("double"))
          .as("dup_token_frac"))
    // bigrams WITHOUT array_distinct — repetition is the signal here
    val bigrams = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => concat_ws(" ", slice(col("__toks"), i, lit(2))))).as("bg"))
    val bgStats = bigrams.groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg((max(col("c")) / sum(col("c")).cast("double")).as("top_bigram_frac"))
    tokStats.join(bgStats, Seq(idCol), "left")
      .withColumn("top_bigram_frac", coalesce(col("top_bigram_frac"), lit(0.0)))
  }

  /** E4 — markup stripping (the first step of web-corpus extraction):
    * drop script blocks, then all tags, decode the five predefined
    * HTML entities, collapse whitespace. Patterns use only negated
    * character classes (no lazy quantifiers, no lookaround) so Java
    * regex and RE2 agree span-for-span. Pure codegen'd scan-side
    * expression chain. */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text, "<script[^>]*>[^<]*</script>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    val decoded = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'")
      .foldLeft(noTags) { case (c, (ent, ch)) => regexp_replace(c, ent, ch) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Host part of a URL (scheme://host[/...]) — empty string when the
    * value is not URL-shaped. Conservative portable regex. */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)

  /** Registrable-domain approximation: the last two dot-labels of the
    * host (public-suffix lists are a lookup-table refinement on top —
    * the grouping key shape is identical). */
  def urlDomain(url: Column): Column =
    regexp_extract(urlHost(url), "([a-z0-9-]+\\.[a-z]+)$", 1)

  /** E7 — URL canonicalization: the key-maker for URL-level dedup,
    * domain caps and crawl frontier merging. Steps (all portable
    * regex — no backreferences, no lookaround, so the oracle runs the
    * SAME patterns under RE2):
    *   - scheme and host lowercase; default ports (:80/:443) dropped
    *   - path: slash runs collapse, trailing slash drops, empty → "/"
    *   - query: tracking params (utm_*, fbclid, gclid, ref) drop; the
    *     survivors SORT (param order never distinguishes resources)
    *   - fragment drops
    * Pure scan-side column expressions — one pass per URL, no UDF. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
      ":(80|443)$", "")
    val path0 = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1), "/+", "/")
    val path1 = regexp_replace(path0, "/+$", "")
    val path = when(path1 === "", lit("/")).otherwise(path1)
    // prefix '&' so the FIRST param matches the same &-form as the rest,
    // strip tracking params, then drop the sentinel and sort survivors
    val qClean = regexp_replace(
      regexp_replace(concat(lit("&"), regexp_extract(url, "\\?([^#]*)", 1)),
        "&(utm_[a-z]+|fbclid|gclid|ref)=[^&]*", ""),
      "^&", "")
    val query = when(qClean === "", lit(""))
      .otherwise(concat(lit("?"), concat_ws("&", array_sort(split(qClean, "&")))))
    // non-URL-shaped values canonicalize to "" (same contract as urlHost)
    when(host === "", lit(""))
      .otherwise(concat(scheme, lit("://"), host, path, query))
  }

  /** Document fingerprint: 64-bit hash of whitespace-normalized
    * lowercase text — the cheap exact-dup / shard-routing key. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Rolling-window chunk fingerprints (w tokens, stride s) for
    * partial-overlap detection: array of xxhash64 per chunk. */
  def chunkFingerprints(text: Column, w: Int, stride: Int): Column = {
    val toks = tokens(text)
    val starts = sequence(lit(0),
      greatest(size(toks) - w, lit(0)), lit(stride))
    transform(starts, i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(w)))))
  }

  /** E4 — unigram log-probability scoring (the perplexity-proxy
    * quality filter in the CCNet tradition): the corpus itself is the
    * language model — per-token log p(t) = ln(count(t) / N) — and a
    * document's score is its mean token log-probability. Documents of
    * rare/garbled tokens score very negative; boilerplate scores high.
    * Token log-probs quantize to integer micro-nats before the
    * per-doc mean, making the aggregation exact and order-independent
    * — reproducible across engines, libms and partitionings.
    *
    * Scale: one token explode feeding a frequency agg (uniform
    * content-keyed shuffle) + a 1-row total broadcast; the score join
    * on `term` is Zipf-skewed like TF-IDF — AQE skew-split applies.
    * `cache = false` for callers with no release point. */
  def unigramLogProb(docs: DataFrame, textCol: String, idCol: String,
      cache: Boolean = true): DataFrame = {
    val tok0 = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tok = if (cache) graft.core.OperatorCaches.cached(tok0) else tok0
    val freq = tok.groupBy(col("term")).agg(count(lit(1)).as("n_t"))
    val total = tok.agg(count(lit(1)).as("n_total"))
    // per-token log-probs quantize to integer MICRO-nats, so the
    // per-doc sum is exact and order-independent — a float sum's
    // last-ulp depends on accumulation order, and a mean landing on a
    // rounding boundary then flips between engines (seen in practice)
    tok.join(freq, "term").crossJoin(broadcast(total))
      .withColumn("__logp_u",
        round(log(col("n_t").cast("double") / col("n_total")) * 1e6, 0).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("__logp_u")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("mean_logp"))
  }

  /** E4 — bigram conditional log-probability scoring: the second rung
    * of the perplexity-proxy ladder above [[unigramLogProb]]. The
    * corpus is the model — p(w2|w1) = c(w1,w2) / c(w1,·) over observed
    * bigrams — and a document's score is its mean bigram conditional
    * log-probability: high for well-worn continuations, very negative
    * for scrambled/garbled text that unigram frequency alone cannot
    * distinguish (same words, wrong order). Token log-probs quantize
    * to integer micro-nats before the per-doc mean (q69's exactness
    * argument: the sum is exact and order-independent).
    *
    * Scale: one bigram explode cached for three consumers; pair and
    * head frequencies are uniform content-keyed aggs; the score joins
    * are Zipf-skewed on common heads (AQE skew-split). Docs with < 2
    * tokens emit no row. `cache = false` for callers with no release
    * point. */
  def bigramLogProb(docs: DataFrame, textCol: String, idCol: String,
      cache: Boolean = true): DataFrame = {
    val bg0 = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => struct(element_at(col("__toks"), i).as("w1"),
          element_at(col("__toks"), i + 1).as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bg = if (cache) graft.core.OperatorCaches.cached(bg0) else bg0
    val pairFreq = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_pair"))
    val headFreq = bg.groupBy(col("w1")).agg(count(lit(1)).as("c_head"))
    bg.join(pairFreq, Seq("w1", "w2")).join(headFreq, Seq("w1"))
      .withColumn("__logp_u",
        round(log(col("c_pair").cast("double") / col("c_head")) * 1e6, 0).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("__logp_u")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("mean_logp"))
  }

  /** E4 — winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    * — the MOSS algorithm): hash every k-token gram, slide a window of
    * w consecutive gram hashes, keep each window's minimum; the
    * distinct minima are the document's fingerprint set. Any shared
    * token run of length >= k + w - 1 between two documents is
    * guaranteed to share a fingerprint, at ~1/w of the full k-gram
    * index size — the standard contamination/plagiarism sketch.
    *
    * Documents with fewer than k tokens emit no fingerprints; with
    * fewer than w grams, the single truncated window (all grams) emits
    * one — every hashable doc keeps at least one fingerprint.
    *
    * One shuffle, keyed on the doc id: the gram explode, the gram
    * count, and the sliding min all evaluate inside a single
    * sort-based window pass per document. Fingerprint values are
    * content-derived hashes — uniform downstream join/group keys.
    *
    * `gramHash` defaults to xxhash64; pass [[graft.ext.Dedup.md5Hash60]]
    * for a cross-engine-reconstructible fingerprint (q62's oracle). */
  def winnowingFingerprints(docs: DataFrame, textCol: String, idCol: String,
      k: Int, w: Int, gramHash: Column => Column = xxhash64(_)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && w >= 1, "k and w must be positive")
    val grams = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col(idCol),
        posexplode(transform(sequence(lit(1), size(col("__toks")) - (k - 1)),
          i => gramHash(concat_ws(" ", slice(col("__toks"), i, lit(k)))))))
      .withColumnRenamed("pos", "__p").withColumnRenamed("col", "__h")
    val byDoc = Window.partitionBy(col(idCol))
    val frame = byDoc.orderBy(col("__p")).rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("__ng", count(lit(1)).over(byDoc))
      .withColumn("fingerprint", min(col("__h")).over(frame))
      // full windows only — except the short-doc single window
      .filter(col("__p") <= col("__ng") - w ||
        (col("__ng") < w && col("__p") === 0))
      .select(col(idCol), col("fingerprint")).distinct()
  }

  /** E4 — collocation extraction: the corpus's top-k adjacent-token
    * bigrams by pointwise mutual information, PMI ∝ n_xy·N/(n_x·n_y).
    * The ranking never takes a log: the score is the exact integer
    * products' IEEE quotient — identical on any engine — and log is
    * monotone, so the PMI order is the quotient order. Ties break on
    * the bigram itself. `minCount` kills the hapax-pair noise floor
    * (the standard collocation guard).
    *
    * Scale: two content-keyed aggs (unigrams, bigrams) with map-side
    * partials + two vocabulary joins (Zipf-skewed on stopword heads —
    * AQE skew-split) + a 1-row broadcast total; top-k is a
    * TakeOrdered, never a full sort. */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Int, topK: Int): DataFrame = {
    val toks = docs.select(tokens(col(textCol)).as("__t"))
    val uni = toks.select(explode(col("__t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("__nw"))
    val total = uni.agg(sum(col("__nw")).as("__N"))
    val bi = toks.filter(size(col("__t")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("w1"),
          element_at(col("__t"), i + 1).as("w2")))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    bi.join(uni.select(col("w").as("w1"), col("__nw").as("n_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("__nw").as("n_y")), "w2")
      .crossJoin(broadcast(total))
      // widen BEFORE multiplying: long*long wraps silently past 9.2e18
      // (web-scale N × a frequent pair), flipping the sign of the top
      // collocations; decimal products can't wrap
      .withColumn("score",
        (col("n_xy").cast("decimal(38,0)") * col("__N")).cast("double") /
          (col("n_x").cast("decimal(38,0)") * col("n_y")).cast("double"))
      .orderBy(col("score").desc, col("w1"), col("w2"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("n_xy"), col("score"))
  }

  /** Adjacent-token bigrams (id, w1, w2) — shared by [[bigramLogProb]]
    * -style scorers. Docs with < 2 tokens emit nothing. */
  private def bigramPairs(docs: DataFrame, textCol: String, idCol: String) =
    docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => struct(element_at(col("__toks"), i).as("w1"),
          element_at(col("__toks"), i + 1).as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** E4 — Stupid Backoff scoring (Brants et al., EMNLP'07 — the
    * web-scale LM that never normalizes): score a PROBE corpus against
    * a MODEL corpus —
    *   S(w2|w1) = c(w1w2)/c(w1·)           if the bigram is in the model
    *            = 0.4·(c(w2)+1)/(N+|V|)    otherwise (add-one unigram
    *                                        floor keeps OOV finite).
    * The third rung of the quality ladder over [[unigramLogProb]] and
    * [[bigramLogProb]] — and the first that handles text the model has
    * never seen, which is the production case (yesterday's corpus
    * scores today's crawl). Per-bigram log scores quantize to integer
    * micro-nats (q69's exactness argument) before the per-doc mean.
    *
    * Scale: model aggs are content-keyed with map-side partials; the
    * probe joins are Zipf-skewed on stopword heads (AQE skew-split);
    * N/|V| ride a 1-row broadcast. Probe docs with < 2 tokens emit no
    * row. */
  def stupidBackoffScore(model: DataFrame, probe: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    val mtoks = model.select(explode(tokens(col(textCol))).as("w"))
    val uni = mtoks.groupBy(col("w")).agg(count(lit(1)).as("__nw"))
    val totals = mtoks.agg(count(lit(1)).as("__N"))
      .crossJoin(uni.agg(count(lit(1)).as("__V")))
    val mbg = bigramPairs(model, textCol, idCol)
    val pair = mbg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__nxy"))
    val head = mbg.groupBy(col("w1")).agg(count(lit(1)).as("__nhead"))
    bigramPairs(probe, textCol, idCol)
      .join(pair, Seq("w1", "w2"), "left")
      .join(head, Seq("w1"), "left")
      .join(uni.withColumnRenamed("w", "w2"), Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__logs_u", round(
        when(col("__nxy").isNotNull,
          log(col("__nxy").cast("double") / col("__nhead")))
          .otherwise(log(lit(0.4) *
            (coalesce(col("__nw"), lit(0L)) + 1).cast("double") /
            (col("__N") + col("__V")))) * 1e6, 0).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("__logs_u")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("mean_logsb"))
  }

  /** E4 — Shannon token entropy per corpus key (source, language…):
    * H = −Σ (c/N)·ln(c/N) over the key's token distribution — the
    * lexical-diversity signal a mixing pipeline reads per domain
    * (template farms score low, organic text high). Per-token
    * log-probs quantize to integer micro-nats, the weighted sum
    * Σ c·lp is an exact long, and only the final division and sign
    * touch floats — on identical operands (q69's exactness argument).
    * Returns (key, n_tokens, n_vocab, entropy) with entropy in nats
    * rounded to 6 dp.
    *
    * Scale: one (key, token) agg with map-side partials + a key-sized
    * join; output is |keys| rows. */
  def tokenEntropy(docs: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val tk = docs.select(col(keyCol), explode(tokens(col(textCol))).as("__w"))
    val cnt = tk.groupBy(col(keyCol), col("__w")).agg(count(lit(1)).as("__c"))
    val tot = tk.groupBy(col(keyCol)).agg(count(lit(1)).as("n_tokens"))
    cnt.join(tot, keyCol)
      .withColumn("__lp_u",
        round(log(col("__c").cast("double") / col("n_tokens")) * 1e6, 0).cast("long"))
      .groupBy(col(keyCol), col("n_tokens"))
      .agg(count(lit(1)).as("n_vocab"),
        sum(col("__c") * col("__lp_u")).as("__s"))
      .withColumn("entropy",
        round(-col("__s").cast("double") / col("n_tokens") / 1e6, 6))
      .drop("__s")
      .select(col(keyCol), col("n_tokens"), col("n_vocab"), col("entropy"))
  }

  /** E4 — 2-TOPIC pLSA by fixed-round EM (Hofmann, SIGIR'99
    * "Probabilistic latent semantic indexing" — public literature; the
    * statistical ancestor of LDA and the classic unsupervised
    * corpus-structure readout). Over the (doc, word, count) cell table:
    *
    *   E: r(d,w) = P(z=1|d,w) = φ₁w·θ_d1 / (φ₁w·θ_d1 + φ₂w·θ_d2)
    *   M: φ_zw ∝ Σ_d c_dw·r_z,   θ_dz ∝ Σ_w c_dw·r_z
    *
    * INTEGER-QUANTIZED trajectory (the q401 GMM device): φ/θ live as
    * ppm longs, responsibilities floor to ppm (r₂ = 10⁶ − r₁ exactly,
    * so the θ denominator is n_d·10⁶ and never zero), M-step sums are
    * exact DECIMAL(38,0), and every division is a floor division of
    * non-negative integers — the whole R-round trajectory is
    * bit-identical under any partitioning AND any engine. Symmetry
    * breaks via the deterministic doc tilt θ_d1⁰ = 200000 + (d mod
    * 7)·10⁵; φ⁰ is uniform. Output: the top-`topK` tokens per topic by
    * final φ ppm, tie-broken (φ desc, token asc) —
    * (topic, token, phi_ppm).
    *
    * Scale: cells checkpoint once; each round is two rollup joins
    * (vocab-keyed φ, doc-keyed θ) + two grouped sums with map-side
    * combine; the per-topic totals are a 1-row broadcast. Fixed R
    * rounds → a pure function of the input. The top-k finish is two
    * TakeOrdered branches, not a global window. */
  def plsa2Topics(docs: DataFrame, idCol: Column, textCol: Column,
      rounds: Int, topK: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10, "rounds in [1, 10]")
    require(topK >= 1, "topK >= 1")
    val d38 = "decimal(38,0)"
    val cells = docs.select(idCol.cast("long").as("__d"),
        explode(tokens(textCol)).as("__w"))
      .groupBy(col("__d"), col("__w")).agg(count(lit(1)).as("__c"))
      .localCheckpoint() // read every round
    val v = cells.select(countDistinct(col("__w")).as("v")).head.getLong(0)
    if (v == 0L) throw graft.core.DataIOError("plsa2Topics",
      "empty corpus: no tokens after tokenization — nothing to factor")
    val phiInit = 1000000L / v
    // non-negative floor division in d38 via pmod — matches DuckDB //
    def floorDiv(num: Column, den: Column): Column =
      ((num - pmod(num, den)) / den).cast("long")
    var phi = cells.select(col("__w")).distinct()
      .select(col("__w"), lit(phiInit).as("__p1"), lit(phiInit).as("__p2"))
      .localCheckpoint()
    var theta = cells.select(col("__d")).distinct()
      .select(col("__d"),
        (lit(200000L) + pmod(col("__d"), lit(7L)) * 100000L).as("__t1"))
      .withColumn("__t2", lit(1000000L) - col("__t1"))
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      val e = cells.join(phi, "__w").join(theta, "__d")
        .withColumn("__n1", col("__p1") * col("__t1"))
        .withColumn("__n2", col("__p2") * col("__t2"))
        .withColumn("__r1", when(col("__n1") + col("__n2") === 0L,
          lit(500000L)).otherwise(
          expr("(__n1 * 1000000L) div (__n1 + __n2)")))
        .select(col("__d"), col("__w"),
          (col("__c") * col("__r1")).as("__s1"),
          (col("__c") * (lit(1000000L) - col("__r1"))).as("__s2"))
      val byW = e.groupBy(col("__w"))
        .agg(sum(col("__s1").cast(d38)).cast(d38).as("__sw1"),
          sum(col("__s2").cast(d38)).cast(d38).as("__sw2"))
      val tot = byW.agg(sum(col("__sw1")).cast(d38).as("__u1"),
        sum(col("__sw2")).cast(d38).as("__u2"))
      phi = byW.crossJoin(broadcast(tot))
        .select(col("__w"),
          when(col("__u1") === lit(0).cast(d38), 0L).otherwise(
            floorDiv(col("__sw1") * lit(1000000L).cast(d38), col("__u1")))
            .as("__p1"),
          when(col("__u2") === lit(0).cast(d38), 0L).otherwise(
            floorDiv(col("__sw2") * lit(1000000L).cast(d38), col("__u2")))
            .as("__p2"))
        .localCheckpoint()
      theta = e.groupBy(col("__d"))
        .agg(sum(col("__s1").cast(d38)).cast(d38).as("__sd1"),
          sum(col("__s2").cast(d38)).cast(d38).as("__sd2"))
        .select(col("__d"),
          floorDiv(col("__sd1") * lit(1000000L).cast(d38),
            col("__sd1") + col("__sd2")).as("__t1"))
        .withColumn("__t2", lit(1000000L) - col("__t1"))
        .localCheckpoint()
    }
    val top1 = phi.select(lit(1).as("topic"), col("__w").as("token"),
        col("__p1").as("phi_ppm"))
      .orderBy(col("phi_ppm").desc, col("token")).limit(topK)
    val top2 = phi.select(lit(2).as("topic"), col("__w").as("token"),
        col("__p2").as("phi_ppm"))
      .orderBy(col("phi_ppm").desc, col("token")).limit(topK)
    top1.unionAll(top2)
  }

  /** E4 — MULTINOMIAL NAIVE BAYES text classifier, train + score in
    * one pass (McCallum & Nigam, AAAI'98 workshop "A comparison of
    * event models for naive Bayes text classification" — public
    * literature; the classic quality/language/domain gate of corpus
    * pipelines). Laplace add-one smoothing:
    *
    *   score(d, l) = ln P(l) + Σ_w c_dw · ln((c_lw + 1)/(T_l + |V|))
    *
    * with T_l = class token total, |V| = corpus vocabulary. Every
    * log-prob quantizes to micro-nats (the q141 idiom) so each doc
    * score is an EXACT long — Σ c·lp commutes under any partitioning,
    * and argmax with the (score desc, label asc) tie-break is
    * engine-portable. Unseen (w, l) pairs back off to the smoothed
    * floor ln(1/(T_l + |V|)). Self-scoring the training frame gives
    * the resubstitution readout (pair with a q63-style split for
    * honest eval). Returns per doc:
    * (doc, label_true, label_pred, score_u).
    *
    * Scale: token rollups with map-side combine; the doc-token frame
    * fans out only |labels|-fold (the label stats broadcast); the
    * (token, label) smoothed-table join shuffles on the token — the
    * vocabulary key, not the corpus key. No driver loops, no UDFs. */
  def naiveBayesClassify(docs: DataFrame, idCol: Column, textCol: Column,
      labelCol: Column): DataFrame = {
    val tk = docs.select(idCol.as("__d"), labelCol.as("__l"),
      explode(tokens(textCol)).as("__w"))
    // class stats: docs per label (prior), tokens per label
    val nd = docs.groupBy(labelCol.as("__l")).agg(count(lit(1)).as("__nl"))
    val nTot = docs.agg(count(lit(1)).as("__nd"))
    val tl = tk.groupBy(col("__l")).agg(count(lit(1)).as("__tl"))
    val vocab = tk.agg(countDistinct(col("__w")).as("__v"))
    val labelStats = nd.join(tl, "__l").crossJoin(broadcast(nTot))
      .crossJoin(broadcast(vocab))
      .withColumn("__prior_u",
        round(log(col("__nl").cast("double") / col("__nd")) * 1e6, 0)
          .cast("long"))
      .withColumn("__lp0_u",
        round(log(lit(1.0) / (col("__tl") + col("__v"))) * 1e6, 0)
          .cast("long"))
      .select(col("__l").as("__cl"), col("__tl"), col("__v"),
        col("__prior_u"), col("__lp0_u"))
    // smoothed per-(label, token) log-probs
    val lp = tk.groupBy(col("__l").as("__cl"), col("__w"))
      .agg(count(lit(1)).as("__c"))
      .join(labelStats, "__cl")
      .withColumn("__lp_u",
        round(log((col("__c") + 1).cast("double") /
          (col("__tl") + col("__v"))) * 1e6, 0).cast("long"))
      .select(col("__cl"), col("__w"), col("__lp_u"))
    // doc-token rollup × candidate labels, backing off to the floor
    val docTok = tk.groupBy(col("__d"), col("__l").as("__lt"), col("__w"))
      .agg(count(lit(1)).as("__cdw"))
    val scored = docTok
      .join(broadcast(labelStats.select(col("__cl"), col("__prior_u"),
        col("__lp0_u"))))
      .join(lp, Seq("__cl", "__w"), "left")
      .withColumn("__term",
        col("__cdw") * coalesce(col("__lp_u"), col("__lp0_u")))
      .groupBy(col("__d"), col("__lt"), col("__cl"), col("__prior_u"))
      .agg(sum(col("__term")).as("__sum"))
      .withColumn("__score_u", col("__prior_u") + col("__sum"))
    scored.groupBy(col("__d").as("doc"), col("__lt").as("label_true"))
      .agg(min(struct((-col("__score_u")).as("__neg"),
        col("__cl").as("__lbl"))).as("__best"))
      .select(col("doc"), col("label_true"),
        col("__best.__lbl").as("label_pred"),
        (-col("__best.__neg")).cast("long").as("score_u"))
  }

  /** E4 — Flesch reading-ease in exact integer milli-points (Flesch
    * 1948; the readability gate of corpus quality filters):
    *   flesch_milli = 206835 − (1015·W) div S − (84600·Y) div W
    * where W = letter-words, S = sentence-ending punctuation runs,
    * Y = vowel-group syllable proxy — all regexp counts, all guarded
    * to ≥ 1 so empty docs score rather than crash. Truncating integer
    * division on non-negative counts is engine-portable, so the score
    * (unlike the float textbook formula) hash-matches an oracle.
    * Returns (…df, words, sentences, syllables, flesch_milli, band).
    *
    * Scale: pure scan-side codegen'd column arithmetic — no shuffle,
    * no UDF; composes with the q87-style quality gate as one more
    * pushdown-friendly predicate column. */
  def readability(df: DataFrame, textCol: Column): DataFrame = {
    val t = lower(textCol)
    val w = greatest(lit(1L), size(regexp_extract_all(t, lit("[a-z]+"), lit(0))).cast("long"))
    val s = greatest(lit(1L), size(regexp_extract_all(t, lit("[.!?]+"), lit(0))).cast("long"))
    val y = greatest(lit(1L), size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))).cast("long"))
    df.withColumn("words", w)
      .withColumn("sentences", s)
      .withColumn("syllables", y)
      .withColumn("flesch_milli", expr(
        "206835L - (1015L * words) div sentences - (84600L * syllables) div words"))
      .withColumn("band",
        when(col("flesch_milli") >= 90000L, "very_easy")
          .when(col("flesch_milli") >= 60000L, "standard")
          .when(col("flesch_milli") >= 30000L, "difficult")
          .otherwise("very_confusing"))
  }

  /** E4 — corpus boilerplate detection: word shingles ranked by
    * DOCUMENT frequency. Navigation chrome, license headers and
    * template fragments repeat verbatim across unrelated pages; a
    * shingle present in >= minDfPpm of documents is boilerplate to
    * strip before training (the dedup family removes whole near-dup
    * DOCS; this removes repeated SPANS inside otherwise-unique docs).
    * Returns (shingle, df, df_ppm), integer-exact.
    *
    * Scale: the distinct (doc, shingle) explode map-side combines into
    * a shingle-keyed agg; the doc count is one broadcast scalar. */
  def boilerplateShingles(df: DataFrame, textCol: Column, idCol: Column,
      shingleSize: Int, minDfPpm: Long): DataFrame = {
    val sh = df.select(idCol.as("__id"),
        explode(graft.ext.Dedup.wordShingles(textCol, shingleSize))
          .as("shingle"))
      .distinct()
    val nDocs = df.agg(countDistinct(idCol).as("__nd"))
    sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("df_ppm", expr("1000000 * df div __nd"))
      .filter(col("df_ppm") >= minDfPpm)
      .drop("__nd")
  }

  /** E4 — vocabulary growth curve (Heaps' law, empirically): distinct
    * tokens seen after ingesting the first c documents, at checkpoint
    * grain `every`. Each token contributes at its FIRST document —
    * min() over doc ids, associative, so one agg pass — and the curve
    * is a cumulative sum over the checkpoint ROLLUP, never the corpus.
    * Flattening growth = the tokenizer's open-vocabulary pressure
    * easing; still-linear growth at corpus end = more data still buys
    * vocabulary. Returns (docs_seen, new_tokens, vocab). */
  def vocabGrowth(df: DataFrame, tokensCol: Column, idCol: Column,
      every: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(every > 0, "checkpoint grain must be positive")
    val firstDoc = df.select(idCol.as("__id"), explode(tokensCol).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(min(col("__id")).as("__first"))
    val total = df.agg(countDistinct(idCol).as("__nd"))
    val perCheckpoint = firstDoc
      .withColumn("__cp", expr(s"(__first div ${every}L + 1) * ${every}L"))
      .groupBy(col("__cp")).agg(count(lit(1)).as("new_tokens"))
    perCheckpoint
      .withColumn("vocab", sum(col("new_tokens")).over(
        Window.orderBy(col("__cp"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(least(col("__cp"), col("__nd")).as("docs_seen"),
        col("new_tokens"), col("vocab"))
  }

  /** E4 — Jensen-Shannon divergence (nats) between the unigram
    * distributions of two corpus slices — the symmetric, bounded
    * (≤ ln 2) drift metric of corpus curation (Lin 1991, public
    * literature): did this week's crawl shift against the reference
    * mix? is the 'de' slice distributionally distinct from 'en'?
    * Unlike KL it tolerates tokens present on only one side, which is
    * exactly the vocabulary-mismatch regime real corpus pairs live in.
    *
    *   JSD = ½·Σ_w [ p_w·ln(p_w/m_w) + q_w·ln(q_w/m_w) ],
    *   m_w = (p_w + q_w)/2
    *
    * Token counts are exact longs from one (slice, token) agg; each
    * TOKEN's double contribution is rounded to integer nano-nats and
    * summed as longs (same order-independence discipline as
    * [[tokenEntropy]]), so the result survives any partitioning and an
    * oracle replays it exactly.
    *
    * Returns ONE row: (n_a, n_b, vocab_a, vocab_b, vocab_union, jsd).
    *
    * Scale: one token-keyed agg with map-side combine over each slice
    * (vocabulary-sized output), a full-outer merge on token, and a
    * scalar finish — the corpus is read once; nothing downstream
    * exceeds vocabulary size. */
  def jsDivergence(docs: DataFrame, textCol: Column, sliceCol: Column,
      sliceA: String, sliceB: String): DataFrame = {
    val tk = docs.filter(sliceCol.isin(sliceA, sliceB))
      .select(sliceCol.as("__s"), explode(tokens(textCol)).as("__w"))
      .filter(col("__w") =!= "")
    // vocabulary-sized and read twice (totals + the term pass) —
    // localCheckpoint (eager, GC-scoped: safe for unmanaged callers),
    // or the corpus explode+agg runs once per consumer
    val cnt = tk.groupBy(col("__w")).agg(
      sum(when(col("__s") === sliceA, 1L).otherwise(0L)).as("__ca"),
      sum(when(col("__s") === sliceB, 1L).otherwise(0L)).as("__cb"))
      .localCheckpoint()
    val tot = cnt.agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))
    cnt.crossJoin(broadcast(tot))
      // pa, pb, m and both logs are evaluated in this exact token
      // order in the oracle SQL — per-token rounding is what makes the
      // corpus-sized sum engine-portable
      .withColumn("__pa", col("__ca").cast("double") / col("__na").cast("double"))
      .withColumn("__pb", col("__cb").cast("double") / col("__nb").cast("double"))
      .withColumn("__m", (col("__pa") + col("__pb")) / 2)
      .withColumn("__term_nano", round(
        (when(col("__ca") > 0, col("__pa") * log(col("__pa") / col("__m")))
          .otherwise(lit(0.0)) +
         when(col("__cb") > 0, col("__pb") * log(col("__pb") / col("__m")))
          .otherwise(lit(0.0))) * 1e9, 0).cast("long"))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(when(col("__ca") > 0, 1L).otherwise(0L)).as("vocab_a"),
        sum(when(col("__cb") > 0, 1L).otherwise(0L)).as("vocab_b"),
        count(lit(1)).as("vocab_union"),
        sum(col("__term_nano")).as("__s_nano"))
      .select(col("n_a"), col("n_b"), col("vocab_a"), col("vocab_b"),
        col("vocab_union"),
        round(col("__s_nano").cast("double") / 2 / 1e9, 6).as("jsd"))
  }

  /** E4 — Good–Turing unseen-mass estimate (Good, Biometrika 1953 —
    * public literature): from the frequency-of-frequencies spectrum,
    * the probability the NEXT token is a never-seen type is p₀ ≈ N₁/N
    * (singleton share), and the adjusted count for once-seen types is
    * r₁* = 2·N₂/N₁. The "how much of the language have we actually
    * covered" number a corpus-growth decision reads next to q205's
    * vocab curve — all exact integers and exact-ppm quotients.
    * Returns one row: (n_tokens, n_types, n1, n2, p0_ppm, r1_star_ppm).
    *
    * Scale: one token agg → one count-of-counts rollup, both with
    * map-side combine. */
  def goodTuring(docs: DataFrame, textCol: String): DataFrame = {
    val freq = docs.select(explode(tokens(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
    freq.agg(sum(col("__f")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("__f") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("__f") === 2, 1L).otherwise(0L)).as("n2"))
      .withColumn("p0_ppm", expr("1000000 * n1 div n_tokens"))
      .withColumn("r1_star_ppm",
        when(col("n1") > 0, expr("2000000 * n2 div n1")))
  }

  /** E4 — Zipf slope of the corpus frequency spectrum: OLS of
    * ln(freq) on ln(rank) over the top-N token frequencies. Healthy
    * organic text sits near −1 (Zipf 1949 — public literature);
    * template/boilerplate farms flatten the head, spam steepens it —
    * the one-number spectrum fingerprint beside q141's entropy. Ranks
    * are exact (freq desc, token tie-break); both logs are
    * micro-quantized per TERM, so the OLS moments are exact decimal
    * sums of integers and the slope/intercept are pinned finishes.
    * Returns one row: (n_terms, top_freq, slope, intercept).
    *
    * Scale: one token agg with map-side combine; the ordered window
    * runs on the top-N rollup (TakeOrdered), never the token stream. */
  def zipfSlope(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN >= 2, "topN >= 2")
    val d38 = "decimal(38,0)"
    val freq = docs.select(explode(tokens(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .orderBy(col("__f").desc, col("__w")).limit(topN)
    val ranked = freq
      .withColumn("__r", row_number().over(
        Window.orderBy(col("__f").desc, col("__w"))).cast("long"))
      .withColumn("__x", round(log(col("__r").cast("double")) * 1e6, 0)
        .cast("long"))
      .withColumn("__y", round(log(col("__f").cast("double")) * 1e6, 0)
        .cast("long"))
    def s38(c: Column) = sum(c.cast(d38)).cast(d38)
    ranked.agg(count(lit(1)).cast(d38).as("__n"),
      max(col("__f")).as("top_freq"),
      s38(col("__x")).as("__sx"), s38(col("__y")).as("__sy"),
      s38(col("__x").cast(d38) * col("__y").cast(d38)).as("__sxy"),
      s38(col("__x").cast(d38) * col("__x").cast(d38)).as("__sxx"))
      .select(col("__n").cast("long").as("n_terms"),
        col("top_freq").cast("long").as("top_freq"),
        round((col("__n") * col("__sxy") - col("__sx") * col("__sy"))
          .cast("double") /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
          .cast("double"), 6).as("slope"),
        round((col("__sy").cast("double") -
          (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
            .cast("double") /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
            .cast("double") * col("__sx").cast("double")) /
          col("__n").cast("double") / 1e6, 6).as("intercept"))
  }

  /** E4 — interpolated Kneser–Ney bigram scoring (Kneser & Ney,
    * ICASSP'95; Chen & Goodman, 1998 — public literature): the
    * fourth rung of the LM-quality ladder, above [[stupidBackoffScore]]
    * — instead of backing off to raw unigram frequency it backs off to
    * the CONTINUATION probability ("how many contexts does w2 follow"),
    * which is what makes "francisco" (frequent, one context) score
    * below "report" (less frequent, many contexts). With absolute
    * discount D = 0.75 (dyadic — `c − D` is exact IEEE):
    *   P(w2|w1) = max(c(w1w2)−D, 0)/c(w1·) + D·N1+(w1·)/c(w1·)·Pc(w2)
    *   Pc(w2)   = (N1+(·w2) + 1) / (T + V)    (add-one keeps OOV finite)
    * where N1+ are distinct-continuation counts, T = bigram types,
    * V = model vocabulary. Unseen heads fall back to Pc(w2) alone.
    * Per-bigram log scores quantize to integer micro-nats before the
    * per-doc mean (q69's exactness argument). Returns per probe doc:
    * (id, n_bigrams, mean_logkn).
    *
    * Scale: all model aggs are content-keyed with map-side partials;
    * probe joins are Zipf-skewed on stopword heads (AQE skew-split);
    * T/V ride a 1-row broadcast. */
  def kneserNeyScore(model: DataFrame, probe: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    val mbg = bigramPairs(model, textCol, idCol)
    val pair = mbg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__nxy"))
    // one pass over the pair rollup yields both head aggregates
    val head = pair.groupBy(col("w1")).agg(sum(col("__nxy")).as("__nhead"),
      count(lit(1)).as("__types_after"))
    val cont = pair.groupBy(col("w2")).agg(count(lit(1)).as("__nc"))
    val totals = pair.agg(count(lit(1)).as("__T")).crossJoin(
      model.select(explode(tokens(col(textCol))).as("w"))
        .agg(count_distinct(col("w")).as("__V")))
    val pc = (coalesce(col("__nc"), lit(0L)) + 1).cast("double") /
      (col("__T") + col("__V")).cast("double")
    bigramPairs(probe, textCol, idCol)
      .join(pair, Seq("w1", "w2"), "left")
      .join(head, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__logs_u", round(
        when(col("__nhead").isNotNull,
          log(greatest(coalesce(col("__nxy"), lit(0L)).cast("double") -
            lit(0.75), lit(0.0)) / col("__nhead").cast("double") +
            lit(0.75) * col("__types_after").cast("double") /
            col("__nhead").cast("double") * pc))
          .otherwise(log(pc)) * 1e6, 0).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("__logs_u")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("mean_logkn"))
  }

  /** E4/eval — ROUGE-2 overlap between paired texts (Lin, "ROUGE: a
    * Package for Automatic Evaluation of Summaries", ACL'04 — public
    * literature): clipped bigram-multiset overlap,
    *   overlap = Σ_g min(c_cand(g), c_ref(g)),
    * precision/recall/F1 as exact-ppm integer quotients. The pairwise
    * n-gram fidelity score a distillation or summarization pipeline
    * tracks per generated/reference pair. Input is a PAIRS frame
    * (pairId, candidate text, reference text). Returns
    * (pair…, n_bi_cand, n_bi_ref, overlap, p_ppm, r_ppm, f1_ppm).
    *
    * Scale: both sides explode to (pair, bigram, count) rollups —
    * content-keyed, map-side combinable; the min-join keys on
    * (pair, bigram). Pair count, not pair², bounds everything. */
  def rouge2(pairs: DataFrame, pairIdCol: String, candCol: String,
      refCol: String): DataFrame = {
    def grams(c: String, tag: String) =
      bigramPairs(pairs.select(col(pairIdCol), col(c)), c, pairIdCol)
        .groupBy(col(pairIdCol), concat_ws(" ", col("w1"), col("w2")).as("__g"))
        .agg(count(lit(1)).as(s"__c$tag"))
    val cand = grams(candCol, "c")
    val ref = grams(refCol, "r")
    val ov = cand.join(ref, Seq(pairIdCol, "__g"))
      .groupBy(col(pairIdCol))
      .agg(sum(least(col("__cc"), col("__cr"))).as("__ov"))
    val nc = cand.groupBy(col(pairIdCol)).agg(sum(col("__cc")).as("n_bi_cand"))
    val nr = ref.groupBy(col(pairIdCol)).agg(sum(col("__cr")).as("n_bi_ref"))
    nc.join(nr, pairIdCol)
      .join(ov, Seq(pairIdCol), "left")
      .withColumn("overlap", coalesce(col("__ov"), lit(0L)))
      .withColumn("p_ppm", expr("1000000 * overlap div n_bi_cand"))
      .withColumn("r_ppm", expr("1000000 * overlap div n_bi_ref"))
      // F1 cleared of fractions: 2·ov·10⁶ div (n_c + n_r)
      .withColumn("f1_ppm", expr("2000000 * overlap div (n_bi_cand + n_bi_ref)"))
      .select(col(pairIdCol), col("n_bi_cand"), col("n_bi_ref"),
        col("overlap"), col("p_ppm"), col("r_ppm"), col("f1_ppm"))
  }

  /** E1 — CODE-QUALITY signals per document: the scan-side structural
    * features a code-corpus curation gate filters on (standard
    * practice in code-LLM data pipelines — e.g. alpha ratio, line
    * length and comment-density screens; public knowledge). Per doc:
    * (id, n_lines, max_line_len, comment_lines, comment_ppm,
    * brace_delta, alpha_ppm) — comment lines are those whose first
    * non-space characters are `//`, `#` or `--`; brace_delta is
    * #'{' − #'}' (non-zero means truncated or mangled code); alpha
    * ratio is letters over non-whitespace chars.
    *
    * All integer counts from length/replace arithmetic — no regex
    * backtracking, no UDF; every count is a portable string-op chain
    * the oracle replays. NULL text → null row values.
    *
    * Scale: pure scan-side column arithmetic; the gate composes with
    * qualityFeatures/repetition like any other per-doc signal. */
  def codeQualitySignals(docs: DataFrame, idCol: Column,
      textCol: Column): DataFrame = {
    val lines = split(textCol, "\n")
    val nonWs = length(regexp_replace(textCol, "\\s", ""))
    val letters = length(regexp_replace(textCol, "[^A-Za-z]", ""))
    docs.select(idCol.as("id"),
        size(lines).cast("long").as("n_lines"),
        aggregate(transform(lines, l => length(l)), lit(0),
          (a, x) => greatest(a, x)).cast("long").as("max_line_len"),
        aggregate(transform(lines, l =>
          when(regexp_replace(l, "^\\s+", "").startsWith("//") ||
            regexp_replace(l, "^\\s+", "").startsWith("#") ||
            regexp_replace(l, "^\\s+", "").startsWith("--"), 1)
            .otherwise(0)), lit(0), (a, x) => a + x).cast("long")
          .as("comment_lines"),
        (length(textCol) - length(regexp_replace(textCol, "\\{", "")) -
          (length(textCol) - length(regexp_replace(textCol, "\\}", ""))))
          .cast("long").as("brace_delta"),
        nonWs.cast("long").as("__nws"),
        letters.cast("long").as("__let"))
      .withColumn("comment_ppm",
        expr("CASE WHEN n_lines > 0 THEN (1000000L * comment_lines) div n_lines ELSE 0L END"))
      .withColumn("alpha_ppm",
        expr("CASE WHEN __nws > 0 THEN (1000000L * __let) div __nws ELSE 0L END"))
      .select(col("id"), col("n_lines"), col("max_line_len"),
        col("comment_lines"), col("comment_ppm"), col("brace_delta"),
        col("alpha_ppm"))
  }

  /** E4/eval — ROUGE-L between paired texts (Lin, ACL'04 — public
    * literature): token-level LONGEST COMMON SUBSEQUENCE, the
    * reorder-tolerant companion to [[rouge2]]'s clipped bigrams —
    * "same content, different phrasing" scores here where bigrams
    * collapse. LCS runs as the native [[TokenLcs]] codegen expression
    * (one static DP call per pair, inside whole-stage codegen).
    * Precision/recall/F over token counts as exact-ppm integer
    * quotients (F cleared of fractions like rouge2's). Returns per
    * pair: (pair…, n_tok_cand, n_tok_ref, lcs, p_ppm, r_ppm, f_ppm).
    *
    * Scale: pure scan-side — no explode, no join; cost is the DP
    * (len_c·len_r per pair), which is the algorithm, not the plan. */
  def rougeL(pairs: DataFrame, pairIdCol: String, candCol: String,
      refCol: String): DataFrame = {
    val ct = tokens(col(candCol))
    val rt = tokens(col(refCol))
    pairs.select(col(pairIdCol),
        filter(ct, _ =!= "").as("__ct"),
        filter(rt, _ =!= "").as("__rt"))
      .withColumn("n_tok_cand", size(col("__ct")).cast("long"))
      .withColumn("n_tok_ref", size(col("__rt")).cast("long"))
      .withColumn("lcs",
        TokenLcs.tokenLcs(col("__ct"), col("__rt")).cast("long"))
      .withColumn("p_ppm", expr("1000000 * lcs div n_tok_cand"))
      .withColumn("r_ppm", expr("1000000 * lcs div n_tok_ref"))
      .withColumn("f_ppm", expr("2000000 * lcs div (n_tok_cand + n_tok_ref)"))
      .select(col(pairIdCol), col("n_tok_cand"), col("n_tok_ref"),
        col("lcs"), col("p_ppm"), col("r_ppm"), col("f_ppm"))
  }

  /** E4/E7 — n-gram novelty of a probe corpus against a model corpus:
    * the fraction of each probe doc's token n-gram OCCURRENCES whose
    * TYPE never appears in the model — the cheap memorization /
    * split-leakage screen (a "new" document whose trigrams are 90%
    * known is a paraphrase or a leak; complements q75's exact-match
    * decontamination). Integer counts, ppm via integer div. Returns
    * per probe doc: (id, n_grams, n_unseen, novelty_ppm).
    *
    * Scale: the model's n-gram TYPE set is a content-keyed distinct —
    * the join is an equi-join on the gram hash; no pair space. */
  def ngramNovelty(model: DataFrame, probe: DataFrame, textCol: String,
      idCol: String, n: Int): DataFrame = {
    def grams(df: DataFrame) =
      df.select(col(idCol), tokens(col(textCol)).as("__toks"))
        .filter(size(col("__toks")) >= n)
        .select(col(idCol), explode(transform(
          sequence(lit(1), size(col("__toks")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j =>
            element_at(col("__toks"), i + j)): _*))).as("__g"))
    val known = grams(model).select(col("__g")).distinct()
      .withColumn("__known", lit(1L))
    grams(probe)
      .join(known, Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__known").isNull, 1L).otherwise(0L)).as("n_unseen"))
      .withColumn("novelty_ppm", expr("1000000 * n_unseen div n_grams"))
  }

  /** E4 — χ²-ranked keyword extraction per slice: for every (slice,
    * token), the chi-square of the 2×2 occurrence table (token in
    * slice / token elsewhere / other tokens in slice / elsewhere),
    * top-K per slice — the "what characterizes this source/language"
    * readout behind corpus cards and slice debugging (public
    * standard practice; e.g. Manning & Schütze ch. 5).
    *
    * Determinism contract: all four cells and the χ² numerator
    * N·(ad−bc)² are exact DECIMAL(38,0); ranking runs on the
    * NANO-QUANTIZED χ² long (one pinned division, round, cast) with
    * token as tie-break, so the top-K cut is identical on any engine.
    * Returns (slice, token, n_in_slice, chi2) × topK per slice.
    *
    * Scale: one (slice, token) agg with map-side combine → a
    * vocabulary-sized frame; the rank window partitions by slice.
    * χ² ranking needs no smoothing — zero cells score zero. */
  def keywordsByChi2(docs: DataFrame, textCol: Column, sliceCol: Column,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1, "topK >= 1")
    val d38 = "decimal(38,0)"
    val tk = docs.select(sliceCol.as("__s"), explode(tokens(textCol)).as("__w"))
      .filter(col("__w") =!= "")
    val cells = tk.groupBy(col("__s"), col("__w"))
      .agg(count(lit(1)).as("__a"))
      .localCheckpoint() // vocabulary grain; three rollups read it
    val perW = cells.groupBy(col("__w")).agg(sum(col("__a")).as("__wtot"))
    val perS = cells.groupBy(col("__s")).agg(sum(col("__a")).as("__stot"))
    val tot = cells.agg(sum(col("__a")).as("__N"))
    val scored = cells
      .join(broadcast(perW), "__w").join(broadcast(perS), "__s")
      .crossJoin(broadcast(tot))
      .withColumn("__b", col("__wtot") - col("__a"))
      .withColumn("__c", col("__stot") - col("__a"))
      .withColumn("__d",
        col("__N") - col("__a") - col("__b") - col("__c"))
      .withColumn("__num", col("__N").cast(d38) *
        ((col("__a").cast(d38) * col("__d") - col("__b").cast(d38) * col("__c")) *
         (col("__a").cast(d38) * col("__d") - col("__b").cast(d38) * col("__c")))
          .cast(d38))
      .withColumn("__den",
        ((col("__a") + col("__b")).cast(d38) * (col("__c") + col("__d")).cast(d38) *
         (col("__a") + col("__c")).cast(d38) * (col("__b") + col("__d")).cast(d38))
          .cast(d38))
      .withColumn("__chi2_nano", when(col("__den") =!= lit(0).cast(d38),
        round(col("__num").cast("double") / col("__den").cast("double") * 1e9,
          0).cast("long")).otherwise(0L))
    val w = Window.partitionBy(col("__s"))
      .orderBy(col("__chi2_nano").desc, col("__w"))
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= topK)
      .select(col("__s").as("slice"), col("__w").as("token"),
        col("__a").as("n_in_slice"),
        round(col("__chi2_nano").cast("double") / 1e9, 6).as("chi2"))
  }

  /** E4/E7 — vocabulary COVERAGE curve: for each target coverage
    * (ppm of token occurrences), the smallest frequency-ranked
    * vocabulary that reaches it — "how big must the tokenizer's word
    * list be to cover 99% of the corpus". The direct sizing readout
    * next to q250's Zipf slope and q275's Heaps exponent.
    *
    * Exactness: the crossing cum·1e6 ≥ N·threshold is all-integer
    * under the total (count desc, token asc) rank order; ties
    * therefore cut identically on any engine. Returns one row per
    * threshold: (coverage_ppm, vocab_size, n_types, n_tokens).
    *
    * Scale: one token agg with map-side combine, then
    * vocabulary-rollup windows (the [[graft.ops.Aggregates.skewAudit]]
    * altitude) and a |thresholds|-row broadcast crossing join. */
  def vocabCoverage(docs: DataFrame, textCol: Column,
      thresholdsPpm: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(thresholdsPpm.nonEmpty, "need >= 1 coverage threshold")
    require(thresholdsPpm.forall(t => t > 0 && t <= 1000000L),
      "thresholds are ppm in (0, 1e6]")
    val freq = docs.select(explode(tokens(textCol)).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    val w = Window.orderBy(col("__c").desc, col("__w"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val ranked = freq
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__cum", sum(col("__c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__nt", sum(col("__c")).over(all))
      .withColumn("__ty", count(lit(1)).over(all))
    val th = docs.sparkSession.range(1)
      .select(explode(array(thresholdsPpm.map(lit): _*)).as("coverage_ppm"))
    ranked.join(broadcast(th),
        col("__cum") * 1000000L >= col("__nt") * col("coverage_ppm"))
      .groupBy(col("coverage_ppm"))
      .agg(min(col("__rk")).as("vocab_size"), max(col("__ty")).as("n_types"),
        max(col("__nt")).as("n_tokens"))
  }

  /** E4/E7 — crawler-TEMPLATE prefix profile: per source, how many
    * documents open with the source's most common k-token prefix — a
    * high modal share is the signature of boilerplate headers/spun
    * templates that per-document dedup misses (each body differs; the
    * opening doesn't). Returns per source:
    * (source, n_docs, n_prefixes, modal_prefix, modal_ppm).
    *
    * Exactness: modal ties break to the smallest prefix string;
    * share is a ppm integral quotient. Scale: one (source, prefix)
    * agg with map-side combine + a source-partitioned rank window
    * over it. */
  def templatePrefixProfile(docs: DataFrame, textCol: Column,
      sourceCol: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "prefix length k >= 1")
    val pre = docs.select(sourceCol.as("__src"),
      array_join(slice(tokens(textCol), 1, k), " ").as("__pre"))
    val cells = pre.groupBy(col("__src"), col("__pre"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(col("__src"))))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__src"))
          .orderBy(col("__c").desc, col("__pre"))))
    cells.groupBy(col("__src").as("source"))
      .agg(max(col("__n")).as("n_docs"), count(lit(1)).as("n_prefixes"),
        max(when(col("__rk") === 1, col("__pre"))).as("modal_prefix"),
        max(when(col("__rk") === 1,
          expr("(__c * 1000000L) div __n"))).as("modal_ppm"))
  }

  /** E4 — Heaps' law fit (Heaps 1978 — public literature): V ≈ K·nᵝ
    * over the [[vocabGrowth]] checkpoints (n = documents seen, V =
    * vocabulary size), fit as ln V ~ ln K + β·ln n by exact-moment OLS
    * over micro-quantized logs (the q250/q266 device). β near 1 means
    * vocabulary still grows linearly — more data keeps buying new
    * types; β well below 1 quantifies the flattening q205 only shows
    * visually, and K·Nᵝ extrapolates tokenizer vocabulary pressure to
    * the 100 TB corpus before it is crawled. Returns one row:
    * (n_points, beta, ln_k, k).
    *
    * Scale: the fit runs over the checkpoint rollup (corpus/every
    * rows) — [[vocabGrowth]]'s cost envelope, nothing more. */
  def heapsFit(df: DataFrame, tokensCol: Column, idCol: Column,
      every: Long): DataFrame = {
    val d38 = "decimal(38,0)"
    val pts = vocabGrowth(df, tokensCol, idCol, every)
      .select(
        round(log(col("docs_seen").cast("double")) * 1e6, 0).cast("long")
          .as("__x"),
        round(log(col("vocab").cast("double")) * 1e6, 0).cast("long")
          .as("__y"))
    def s38(c: Column) = sum(c.cast(d38)).cast(d38)
    pts.agg(count(lit(1)).cast(d38).as("__n"),
        s38(col("__x")).as("__sx"), s38(col("__y")).as("__sy"),
        s38(col("__x").cast(d38) * col("__y").cast(d38)).as("__sxy"),
        s38(col("__x").cast(d38) * col("__x").cast(d38)).as("__sxx"))
      .withColumn("__den",
        (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double"))
      .withColumn("__beta", when(col("__den") =!= 0.0,
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
          col("__den")))
      .withColumn("__lnk",
        (col("__sy").cast("double") - col("__beta") * col("__sx").cast("double")) /
          col("__n").cast("double") / 1e6)
      .select(col("__n").cast("long").as("n_points"),
        round(col("__beta"), 6).as("beta"),
        round(col("__lnk"), 6).as("ln_k"),
        round(exp(col("__lnk")), 6).as("k"))
  }

  /** E4 — BPE merge-table TRAINING (byte-pair encoding; Sennrich,
    * Haddow & Birch, ACL'16 — public literature): learn the first
    * `merges` subword merges from the corpus — the core of every
    * modern tokenizer's vocabulary build, run where it belongs: on the
    * cluster, over the full corpus, instead of a single-machine
    * sample.
    *
    * Classic word-level formulation: the corpus reduces ONCE to the
    * word-frequency vocabulary; each word is a symbol sequence
    * (characters + a terminal `</w>` marker). Per round: count
    * adjacent symbol pairs weighted by word frequency, take the most
    * frequent pair (ties broken lexicographically on (left, right) —
    * pinned), and merge it left-to-right non-overlapping in every
    * word. Returns the merge table: (round, lhs, rhs, merged,
    * pair_count) — all integers and strings, so the oracle needs only
    * semantic (not IEEE) parity.
    *
    * Scale: the fact pass is one word-count agg (map-side combined);
    * every round then runs on the VOCABULARY frame (|vocab| ≪ corpus;
    * Heaps' law bounds it) — a pair explode ~|vocab|·word-len rows, a
    * 1-row argmax collect (bounded-driver regime), and an array fold
    * per word. 100 TB of text trains from the same vocab rollup as
    * 100 GB. */
  def bpeTrain(docs: DataFrame, textCol: Column, merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 50, "merges in [1, 50]")
    val spark = docs.sparkSession
    val words = docs.select(explode(tokens(textCol)).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
    var vocab = words.withColumn("__syms",
      concat(expr("transform(sequence(1, length(__w)), i -> substring(__w, i, 1))"),
        array(lit("</w>"))))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val best = vocab
        .select(col("__f"), explode(expr(
          "transform(sequence(1, size(__syms) - 1), " +
            "i -> struct(element_at(__syms, i) as l, " +
            "element_at(__syms, i + 1) as r))")).as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(sum(col("__f")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val b = best(0)
        val (bl, br) = (b.getAs[String]("l"), b.getAs[String]("r"))
        out += ((r, bl, br, bl + br, b.getAs[Long]("cnt")))
        // left-to-right non-overlapping merge as an ordered fold:
        // "aaa" + (a,a) -> (aa, a), because a just-merged symbol never
        // re-merges with the next (its label is the merged string)
        vocab = vocab.withColumn("__syms",
          aggregate(col("__syms"), array().cast("array<string>"),
            (acc, x) => when(size(acc) > 0 &&
                element_at(acc, -1) === lit(bl) && x === lit(br),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(bl + br))))
              .otherwise(concat(acc, array(x)))))
          .localCheckpoint()
        r += 1
      }
    }
    import spark.implicits._
    out.toSeq.toDF("round", "lhs", "rhs", "merged", "pair_count")
  }

  /** E4 — RAKE keyphrase extraction (Rapid Automatic Keyword
    * Extraction; Rose, Engel, Cramer & Cowley 2010 — public
    * literature): candidate phrases are maximal runs of non-stopword
    * tokens; each word scores deg(w)/freq(w) (deg = Σ lengths of
    * phrases containing it, freq = occurrence count) and a phrase
    * scores the sum of its words' scores — long phrases of
    * co-occurring content words win. The unsupervised per-corpus
    * keyphrase readout (χ²-keywords q292 needs a contrast slice; RAKE
    * needs nothing).
    *
    * Determinism contract: integer throughout — word score in ppm by
    * one floor division, phrase score an integer ppm sum
    * (order-independent); ties break on the phrase string. Tokens are
    * the standard whitespace-split lowercase stream (punctuation-glued
    * words keep their punctuation — documented difference from
    * classic RAKE's punctuation delimiters, shared by the oracle).
    * Returns top-K: (phrase, n_words, n_occurs, score_ppm).
    *
    * Scale: phrase islands come from ONE doc-partitioned window over
    * the token stream; word stats and phrase stats are two
    * vocabulary-grain aggs with map-side combine; only the top-K rank
    * is global ([[Ranking.globalRowNumber]]-free: TakeOrdered via
    * orderBy+limit). */
  def keyphrasesRake(docs: DataFrame, idCol: Column, textCol: Column,
      stopwords: Seq[String], topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1, "topK >= 1")
    require(stopwords.nonEmpty, "need a stopword list")
    val toks = docs.select(idCol.as("__d"), posexplode(tokens(textCol)))
      .select(col("__d"), col("pos").as("__p"), col("col").as("__w"))
      .filter(col("__w") =!= "")
      .filter(!col("__w").isin(stopwords: _*))
    val wDoc = Window.partitionBy(col("__d")).orderBy(col("__p"))
    val phrases = toks
      .withColumn("__grp", col("__p") - row_number().over(wDoc))
      .groupBy(col("__d"), col("__grp"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("__p"), col("__w")))),
          x => x.getField("__w")), " ").as("phrase"),
        count(lit(1)).as("n_words"),
        collect_list(col("__w")).as("__ws"))
      .localCheckpoint() // phrase-grain; word stats + scoring read it
    val wordStats = phrases
      .select(col("n_words"), explode(col("__ws")).as("__w"))
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("__freq"), sum(col("n_words")).as("__deg"))
      .withColumn("__score_ppm", expr("(1000000L * __deg) div __freq"))
    phrases.select(col("phrase"), col("n_words"), explode(col("__ws")).as("__w"))
      .join(broadcast(wordStats.select(col("__w"), col("__score_ppm"))), "__w")
      .groupBy(col("phrase"), col("n_words"))
      // every occurrence contributes the identical per-word scores, so
      // sum = n_occurs·phrase_score and count = n_occurs·n_words —
      // both divisions below are EXACT integer ratios
      .agg(sum(col("__score_ppm")).as("__sum"), count(lit(1)).as("__cnt"))
      .withColumn("n_occurs", expr("__cnt div n_words"))
      .withColumn("score_ppm", expr("__sum div n_occurs"))
      .select(col("phrase"), col("n_words"), col("n_occurs"), col("score_ppm"))
      .orderBy(col("score_ppm").desc, col("phrase").asc)
      .limit(topK)
  }

  /** E4 — BPE ENCODING with a learned merge list (the apply side of
    * [[bpeTrain]]): tokenize the corpus with the first k merges and
    * report the compression the subword vocabulary buys —
    * (n_docs, n_words, n_char_tokens, n_bpe_tokens, saved_ppm). The
    * readout that says whether the next 10k merges are worth training.
    *
    * Scale: the merge folds run ONCE over the distinct-word
    * vocabulary (Heaps-bounded), as k chained projections — no driver
    * rounds; the corpus pass is one word explode + a vocabulary join
    * + one agg. */
  def bpeEncode(docs: DataFrame, idCol: Column, textCol: Column,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "need at least one merge")
    val words = docs.select(idCol.as("__d"), explode(tokens(textCol)).as("__w"))
      .filter(col("__w") =!= "")
    val vocab0 = words.select(col("__w")).distinct()
      .withColumn("__syms", concat(
        expr("transform(sequence(1, length(__w)), i -> substring(__w, i, 1))"),
        array(lit("</w>"))))
    val encoded = merges.foldLeft(vocab0) { case (v, (bl, br)) =>
      v.withColumn("__syms",
        aggregate(col("__syms"), array().cast("array<string>"),
          (acc, x) => when(size(acc) > 0 &&
              element_at(acc, -1) === lit(bl) && x === lit(br),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(bl + br))))
            .otherwise(concat(acc, array(x)))))
    }
    words.join(encoded.select(col("__w"), size(col("__syms")).as("__nt")), "__w")
      .agg(countDistinct(col("__d")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(length(col("__w")) + 1).as("n_char_tokens"),
        sum(col("__nt")).as("n_bpe_tokens"))
      .withColumn("saved_ppm",
        expr("(1000000L * (n_char_tokens - n_bpe_tokens)) div n_char_tokens"))
  }

  /** The DuckDB transliteration of [[bpeTrain]]'s round loop: per
    * round a pair-count CTE, a 1-row argmax CTE, and a list-fold merge
    * CTE (list-of-lists trick: list_reduce's accumulator must share
    * the element type, so symbols fold as single-element lists).
    * `v0` must expose (w, f, syms). */
  def bpeOracleSteps(merges: Int): String = {
    val steps = (1 to merges).map { r =>
      val in = s"v${r - 1}"
      s"""p$r AS (
         |  SELECT syms[i] AS l, syms[i + 1] AS rr, sum(f) AS cnt
         |  FROM (SELECT f, syms, unnest(range(1, len(syms))) AS i FROM $in)
         |  GROUP BY 1, 2),
         |b$r AS (SELECT l, rr, cnt FROM p$r
         |        ORDER BY cnt DESC, l ASC, rr ASC LIMIT 1),
         |v$r AS (
         |  SELECT w, f,
         |    list_reduce(
         |      list_prepend(CAST([] AS VARCHAR[]),
         |        list_transform(syms, s -> [s])),
         |      (acc, x) -> CASE
         |        WHEN len(acc) > 0 AND acc[-1] = b.l AND x[1] = b.rr
         |        THEN list_append(acc[:len(acc) - 1], b.l || b.rr)
         |        ELSE list_append(acc, x[1]) END) AS syms
         |  FROM $in CROSS JOIN b$r b)""".stripMargin
    }
    steps.mkString(",\n")
  }

  /** E4+/A-eval — LLM watermark detection (Kirchenbauer et al., "A
    * Watermark for Large Language Models", ICML 2023, γ = 1/2 soft
    * scheme): each token position t >= 2 is GREEN iff the hash of its
    * (previous, current) token pair lands in the green half of the
    * partition — here the parity of the portable
    * [[Dedup.md5Hash60]](prev ‖ '|' ‖ cur). Watermarked generations
    * over-select green tokens; natural text sits at γ. Per doc:
    * n_scored = positions, n_green, and the one-proportion z-score
    * z = (2·n_green − n)/√n — both operands exact integers, so ÷ and
    * √ are correctly-rounded IEEE and the double hash-compares.
    *
    * Scale: one token explode with a lag pair per position (scan-side
    * arithmetic, no join — the pair comes from the SAME doc's array),
    * then a doc-keyed agg with map-side combine. The provenance
    * screen over any corpus size. */
  def watermarkGreenStats(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val pairs = docs
      .select(col(idCol).as("__id"), tokens(col(textCol)).as("__t"))
      .select(col("__id"), explode(expr(
        """CASE WHEN size(__t) >= 2
          |  THEN transform(sequence(2, size(__t)),
          |         i -> concat(element_at(__t, i - 1), '|', element_at(__t, i)))
          |  ELSE array() END""".stripMargin)).as("__pair"))
      .withColumn("__green",
        (pmod(Dedup.md5Hash60(col("__pair")), lit(2L)) === 0L).cast("long"))
    pairs.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_scored"), sum(col("__green")).as("n_green"))
      .withColumn("z",
        (lit(2L) * col("n_green") - col("n_scored")).cast("double") /
          sqrt(col("n_scored").cast("double")))
      .select(col("__id").as(idCol), col("n_scored"), col("n_green"), col("z"))
  }
  graft.plans.Guardrails.expect("single_partition_window",
    "__trw", "textRankKeywords: vocab-rollup id assignment",
    "vocabulary")

  /** E4/E2+ — TextRank keyword extraction (Mihalcea & Tarau, EMNLP
    * 2004): build the word co-occurrence graph of candidate tokens
    * (adjacent after filtering, the paper's window-2 form), run the
    * fixed-round integer [[graft.ext.Graph.pageRank]] over it, and
    * return every candidate word with its rank mass — callers take
    * the top k. Candidates are lowercase whitespace tokens of length
    * >= `minLen` (the cheap stopword proxy; short function words
    * drop). Ranks are bit-portable micro-unit integers, so the top-k
    * cut can never flip across engines or partitionings.
    *
    * Returns one row per candidate word: (word, rank_ppm).
    *
    * Scale: tokenization is scan-side; the co-occurrence edge list
    * dedups on (wa, wb) with map-side combine; vocabulary ids assign
    * via ONE rank window over the |vocab| rollup (bounded, documented
    * above); then 3 PageRank rounds of node-keyed joins. Nothing
    * fact-sized shuffles twice. */
  def textRankKeywords(docs: DataFrame, idCol: Column, textCol: Column,
      minLen: Int = 4, iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(idCol.as("__d"),
        posexplode(split(lower(textCol), "\\s+")).as(Seq("__p", "__w")))
      .filter(length(col("__w")) >= minLen)
    val nxt = toks.withColumn("__nw",
      lead(col("__w"), 1).over(
        Window.partitionBy(col("__d")).orderBy(col("__p"))))
    val edges = nxt
      .filter(col("__nw").isNotNull && col("__nw") =!= col("__w"))
      .select(col("__w").as("wa"), col("__nw").as("wb")).distinct()
    val vocab = edges
      .select(explode(array(col("wa"), col("wb"))).as("__trw")).distinct()
      .withColumn("__vid",
        row_number().over(Window.orderBy(col("__trw"))).cast("long"))
      .localCheckpoint() // ids must be stable across the two edge joins
    val eid = edges
      .join(vocab.select(col("__trw").as("wa"), col("__vid").as("src")), "wa")
      .join(vocab.select(col("__trw").as("wb"), col("__vid").as("dst")), "wb")
      .select(col("src"), col("dst"))
    Graph.pageRank(eid, "src", "dst", iters = iters)
      .join(vocab.select(col("__vid").as("node"), col("__trw").as("word")),
        "node")
      .select(col("word"), col("rank_ppm"))
  }
  /** E4 — Yule's characteristic K per group (Yule 1944, "The
    * Statistical Study of Literary Vocabulary"): the classic
    * repeat-rate measure of lexical richness,
    *   K = 10⁴ · (Σ_m m²·V_m − N) / N²  =  10⁴ · (Σ_types c² − N) / N²
    * — size-invariant (unlike type-token ratio), higher = more
    * repetitive vocabulary. The corpus-quality axis that separates
    * template spam (huge K) from natural prose (K ≈ 100-200) even
    * when lengths match. Exact integer spectrum sums; one pinned IEEE
    * finish. Returns per group: (g, n_tokens, n_types, yule_k).
    *
    * Scale: ONE (group, token) rollup with map-side combine, then a
    * |groups|-row conditional agg — the q253/q396 scan shape. */
  def yuleK(docs: DataFrame, textCol: Column, groupCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val toks = docs.select(groupCol.as("g"),
        explode(split(lower(textCol), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("g"), col("__w")).agg(count(lit(1)).as("__c"))
    toks.groupBy(col("g"))
      .agg(sum(col("__c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("__c").cast(d38) * col("__c").cast(d38)).cast(d38)
          .as("__s2"))
      .select(col("g"), col("n_tokens"), col("n_types"),
        (lit(1e4) * (col("__s2").cast("double") -
          col("n_tokens").cast("double")) /
          (col("n_tokens").cast("double") * col("n_tokens").cast("double")))
          .as("yule_k"))
      .orderBy(col("g"))
  }
  graft.plans.Guardrails.expect("single_partition_window",
    "__bw, __wc", "burrowsDelta: top-k word rank over the word rollup",
    "k-literal")
  graft.plans.Guardrails.expect("cartesian_join",
    "__au, __tot", "burrowsDelta: author totals x top-k word broadcast",
    "k-literal")

  /** E4 — Burrows' Delta authorship/stylometry distance (Burrows
    * 2002, "Delta: a measure of stylistic difference"; Argamon 2008
    * for the analysis): over the K most frequent words of the whole
    * corpus, z-score each author's relative word frequency against
    * the across-author distribution, then
    *   Δ(a, b) = (1/K) Σ_w |z_a(w) − z_b(w)|
    * — the standard attribution distance (function words carry style;
    * z-scoring stops "the" from drowning "whilst"). Frequencies are
    * exact ppm integers; z is micro-quantized once per (author, word)
    * cell; Δ sums exactly. Returns one row per unordered author pair:
    * (author_a, author_b, k_words, delta_micro, delta).
    *
    * Scale: ONE (author, word) rollup with map-side combine; the
    * top-K rank runs on the WORD rollup (bounded window, documented);
    * the z frame is |authors|·K cells and the pair join
    * |authors|²-bounded — broadcast-sized for any real author set. */
  def burrowsDelta(docs: DataFrame, textCol: Column, authorCol: Column,
      topK: Int = 30): DataFrame = {
    require(topK >= 1 && topK <= 10000, "1 <= topK <= 1e4")
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val aw = docs.select(authorCol.cast("string").as("__au"),
        explode(split(lower(textCol), "\\s+")).as("__bw"))
      .filter(length(col("__bw")) > 0)
      .groupBy(col("__au"), col("__bw")).agg(count(lit(1)).as("__bc"))
      .localCheckpoint()
    val words = aw.groupBy(col("__bw")).agg(sum(col("__bc")).as("__wc"))
      .withColumn("__r", row_number().over(
        Window.orderBy(col("__wc").desc, col("__bw"))))
      .filter(col("__r") <= topK).select(col("__bw"))
    val totals = aw.groupBy(col("__au")).agg(sum(col("__bc")).as("__tot"))
    // densify: every (author, top word) cell, zero counts included
    val cells = totals.crossJoin(broadcast(words))
      .join(aw, Seq("__au", "__bw"), "left")
      .withColumn("__f", expr("(coalesce(__bc, 0L) * 1000000L) div __tot"))
    val stats = cells.groupBy(col("__bw"))
      .agg(count(lit(1)).as("__na"),
        sum(col("__f")).cast(d38).as("__sf"),
        sum(col("__f").cast(d38) * col("__f").cast(d38)).cast(d38)
          .as("__sff"))
    val z = cells.join(broadcast(stats), "__bw")
      .withColumn("__mu",
        col("__sf").cast("double") / col("__na").cast("double"))
      .withColumn("__sd", sqrt(
        (col("__na").cast(d38) * col("__sff") - col("__sf") * col("__sf"))
          .cast("double")) / col("__na").cast("double"))
      .withColumn("__z", floor(when(col("__sd") =!= 0.0,
        (col("__f").cast("double") - col("__mu")) / col("__sd"))
        .otherwise(lit(0.0)) * 1e6 + 0.5).cast("long"))
      .select(col("__au"), col("__bw"), col("__z")).localCheckpoint()
    val pairs = z.toDF("__a1", "__w1", "__z1")
      .join(z.toDF("__a2", "__w2", "__z2"),
        col("__w1") === col("__w2") && col("__a1") < col("__a2"))
      .groupBy(col("__a1").as("author_a"), col("__a2").as("author_b"))
      .agg(count(lit(1)).as("k_words"),
        sum(abs(col("__z1") - col("__z2"))).as("__sum"))
    pairs.select(col("author_a"), col("author_b"), col("k_words"),
        expr("__sum div k_words").as("delta_micro"))
      .withColumn("delta", col("delta_micro").cast("double") / 1e6)
      .orderBy(col("author_a"), col("author_b"))
  }
  /** E4 — "Fightin' Words" contrastive keywords: log-odds ratio with
    * an informative Dirichlet prior (Monroe, Colaresi & Quinn 2008,
    * Political Analysis — THE principled corpus-comparison statistic;
    * raw log-odds explodes on rare words, PMI on frequent ones; the
    * corpus-rate prior fixes both):
    *   δ_w = ln[(y_w^A + α_w)/(n_A + α₀ − y_w^A − α_w)]
    *       − ln[(y_w^B + α_w)/(n_B + α₀ − y_w^B − α_w)],
    *   α_w = α₀·c_w/N,   z_w = δ_w / √(1/(y_w^A+α_w) + 1/(y_w^B+α_w)).
    * Fraction-cleared: every log argument is a ratio of exact integers
    * (scaled by N), micro-nat quantized; the variance chain is pinned
    * IEEE over the same integers; z rounds to 6. Returns per word:
    * (word, y_a, y_b, delta_micro, z).
    *
    * Scale: ONE (word, side) rollup with map-side combine; scoring is
    * per-word scan-side arithmetic — |vocab|-sized, never doc-sized. */
  def logOddsFightinWords(docs: DataFrame, textCol: Column,
      sideACond: Column, alpha0: Long = 500L): DataFrame = {
    require(alpha0 >= 1, "alpha0 >= 1")
    val d38 = "decimal(38,0)"
    val counts = docs.select(sideACond.cast("long").as("__a"),
        explode(split(lower(textCol), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w"))
      .agg(sum(col("__a")).as("__ya"),
        sum(lit(1L) - col("__a")).as("__yb"))
      .localCheckpoint()
    val tot = counts.agg(sum(col("__ya")).as("__na"),
      sum(col("__yb")).as("__nb"))
    def dd(c: Column) = c.cast(d38)
    val scored = counts.crossJoin(broadcast(tot))
      .withColumn("__nn", col("__na") + col("__nb"))
      .withColumn("__cw", col("__ya") + col("__yb"))
      // scaled by N: y + α₀·c/N → y·N + α₀·c (exact)
      .withColumn("__pa", dd(col("__ya")) * col("__nn") +
        dd(col("__cw")) * alpha0)
      .withColumn("__qa", dd(col("__na")) * col("__nn") +
        dd(lit(alpha0)) * col("__nn") - dd(col("__ya")) * col("__nn") -
        dd(col("__cw")) * alpha0)
      .withColumn("__pb", dd(col("__yb")) * col("__nn") +
        dd(col("__cw")) * alpha0)
      .withColumn("__qb", dd(col("__nb")) * col("__nn") +
        dd(lit(alpha0)) * col("__nn") - dd(col("__yb")) * col("__nn") -
        dd(col("__cw")) * alpha0)
      .withColumn("delta_micro",
        floor(log(col("__pa").cast("double") / col("__qa").cast("double"))
          * 1e6 + 0.5).cast("long") -
        floor(log(col("__pb").cast("double") / col("__qb").cast("double"))
          * 1e6 + 0.5).cast("long"))
      // var = 1/(y_a + α_w) + 1/(y_b + α_w) = N/pa' + N/pb' with
      // pa' = y·N + α₀·c — the same exact integers as the log terms
      .withColumn("__var",
        col("__nn").cast("double") / col("__pa").cast("double") +
        col("__nn").cast("double") / col("__pb").cast("double"))
      .withColumn("z", round(col("delta_micro").cast("double") / 1e6 /
        sqrt(col("__var")), 6))
    scored.select(col("__w").as("word"), col("__ya").as("y_a"),
      col("__yb").as("y_b"), col("delta_micro"), col("z"))
  }

  /** E4 — HUFFMAN CODE LENGTHS over the corpus token distribution
    * (Huffman 1952, Proc. IRE — public literature): the exact optimal
    * prefix-code length per token, i.e. the achievable compressed BIT
    * BUDGET of the corpus under a token-level entropy coder — the
    * standard "how much is this corpus really worth storing/shipping"
    * readout next to [[tokenEntropy]]'s lower bound.
    *
    * The alphabet is the top (topV−1) tokens by (freq DESC, token ASC)
    * plus one `__oov__` bucket absorbing the tail mass (dropped when
    * empty) — the same vocabulary-literal bounding as the BPE/LM ops,
    * which is what keeps the greedy merge a k-literal driver fold
    * rather than a data-sized loop. The merge is DETERMINISTIC: each
    * round joins the two minimal (weight, key) subtrees, the merged
    * node keeping the smaller key — so an oracle can replay every
    * round. Exact long weights throughout; ties in weight break on
    * key. Returns one row per alphabet token:
    * (token, freq, code_len, bits = freq·code_len).
    *
    * Scale: ONE corpus-sized pass (the token rollup with map-side
    * combine); the top-V cut is TakeOrdered; the merge itself touches
    * topV rows on the driver — the vocabulary-literal altitude. */
  def huffmanCodeLengths(docs: DataFrame, textCol: Column,
      topV: Int): DataFrame = {
    require(topV >= 2 && topV <= 256,
      "topV in [2, 256] (vocabulary-literal merge)")
    val spark = docs.sparkSession
    val freq = docs
      .select(explode(filter(tokens(textCol), t => t =!= "")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .localCheckpoint() // feeds the top-V cut AND the total
    val top = freq.orderBy(col("__c").desc, col("__w").asc)
      .limit(topV - 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    require(top.size >= 2, "huffmanCodeLengths needs >= 2 distinct tokens")
    val total = freq.agg(sum(col("__c"))).head.getLong(0)
    val oov = total - top.map(_._2).sum
    val leaves = top ++ (if (oov > 0) Seq("__oov__" -> oov) else Nil)
    // greedy merge on the k-literal alphabet (deterministic: two
    // minimal (weight, key) nodes; merged key = smaller key)
    final case class Node(w: Long, key: String, members: List[String])
    var nodes = leaves.map { case (t, w) => Node(w, t, List(t)) }.toVector
    val depth = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    while (nodes.length > 1) {
      val sorted = nodes.sortBy(n => (n.w, n.key))
      val a = sorted(0); val b = sorted(1)
      (a.members ++ b.members).foreach(l => depth(l) += 1)
      nodes = sorted.drop(2) :+ Node(a.w + b.w,
        if (a.key < b.key) a.key else b.key, a.members ++ b.members)
    }
    spark.createDataFrame(leaves.map { case (t, w) =>
      (t, w, depth(t).toLong, w * depth(t)) })
      .toDF("token", "freq", "code_len", "bits")
  }

  /** E4 — EXACT VITERBI SEGMENTATION under a substring-frequency
    * unigram vocabulary (the SentencePiece-unigram shape, Kudo 2018
    * ACL — public literature — with an EXACT integer objective in
    * place of float log-probs): the vocabulary is every substring of
    * length ≤ `maxPieceLen` over the (≤ 30-char) corpus words,
    * weighted by word frequency and thresholded at `minCount`; each of
    * the `topWords` most frequent words is then segmented by the DP
    * maximizing Σ count(piece)·64 − |pieces| (the ·64 − 1 encoding
    * makes "maximize frequency mass, tie-break fewer pieces" ONE long
    * comparison — bit-stable on any engine). Unknown single characters
    * are always admissible at count 0, so every word segments.
    *
    * Returns the word-length rollup (word_len, n_words, total_wc,
    * sum_score) — sum_score pins every per-word DP jointly.
    *
    * Scale: vocab is one explode + piece-keyed agg (map-side combine);
    * candidates are a piece equi-join; each word's DP is one kernel
    * call over its ≤ len·maxPieceLen candidate list. Nothing touches
    * pair space. */
  def unigramSegmentScores(docs: DataFrame, textCol: Column,
      maxPieceLen: Int, minCount: Long, topWords: Int): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 8, "maxPieceLen in [1, 8]")
    require(topWords >= 1 && topWords <= 10000, "topWords in [1, 10000]")
    val words = docs.select(explode(tokens(textCol)).as("__w"))
      .filter(col("__w") =!= "" && length(col("__w")) <= 30)
      .groupBy(col("__w")).agg(count(lit(1)).as("__wc"))
      .localCheckpoint() // feeds the vocabulary AND the analyzed set
    def subPieces(extra: String) = expr(
      s"""flatten(transform(sequence(1, length(__w)),
         |  s -> transform(sequence(s, least(length(__w), s + ${maxPieceLen - 1})),
         |    e -> struct(s as s, e as e, substring(__w, s, e - s + 1) as p$extra))))"""
        .stripMargin)
    val pieces = words
      .select(col("__wc"), explode(subPieces("")).as("__c"))
      .groupBy(col("__c.p").as("__p")).agg(sum(col("__wc")).as("__cnt"))
      .filter(col("__cnt") >= minCount)
    val top = words.orderBy(col("__wc").desc, col("__w")).limit(topWords)
    val cand = top
      .select(col("__w"), col("__wc"), explode(subPieces("")).as("__c"))
      .select(col("__w"), col("__wc"), col("__c.s").as("__s"),
        col("__c.e").as("__e"), col("__c.p").as("__p"))
      .join(pieces, Seq("__p"), "left")
      // unknown pieces are admissible only as single characters (count 0)
      .filter(col("__cnt").isNotNull || col("__s") === col("__e"))
      .withColumn("__contrib", coalesce(col("__cnt"), lit(0L)) * 64 - 1)
    val dp = udf((len: Int, cands: Seq[org.apache.spark.sql.Row]) => {
      val NEG = Long.MinValue / 4
      val f = Array.fill(len + 1)(NEG)
      f(0) = 0L
      // group candidates by end; process ends ascending (s <= e always)
      val byEnd = Array.fill(len + 1)(List.empty[(Int, Long)])
      cands.foreach { r =>
        byEnd(r.getInt(1)) ::= (r.getInt(0), r.getLong(2))
      }
      var e = 1
      while (e <= len) {
        byEnd(e).foreach { case (st, c) =>
          if (f(st - 1) > NEG && f(st - 1) + c > f(e)) f(e) = f(st - 1) + c
        }
        e += 1
      }
      f(len)
    })
    cand.groupBy(col("__w"), col("__wc"))
      .agg(collect_list(struct(col("__s"), col("__e"), col("__contrib")))
        .as("__cl"))
      .withColumn("__score", dp(length(col("__w")), col("__cl")))
      .groupBy(length(col("__w")).cast("long").as("word_len"))
      .agg(count(lit(1)).as("n_words"), sum(col("__wc")).as("total_wc"),
        sum(col("__score")).as("sum_score"))
  }

  /** E7 — SCOPED UNICODE NORMALIZATION (a documented NFKC subset +
    * corpus cleanup — the pre-tokenization pass every web corpus runs):
    *  1. zero-width chars (U+200B/200C/200D) and the BOM stripped;
    *  2. NBSP and ideographic space → ASCII space;
    *  3. curly quotes → ASCII ' and ";
    *  4. en/em dash and minus sign → '-';
    *  5. ellipsis → "...";  6. fi/fl ligatures expanded;
    *  7. full-width ASCII (U+FF01–FF5E) → ASCII (cp − 0xFEE0).
    * Pure translate/replace chain — codegen'd, no regex, no UDF, and
    * byte-for-byte replayable in SQL (the mapping strings are exposed
    * so oracles interpolate the SAME literals). */
  val FullWidthSrc: String = (0xFF01 to 0xFF5E).map(_.toChar).mkString
  val FullWidthDst: String = (0x21 to 0x7E).map(_.toChar).mkString
  val ZeroWidthChars: String = "\u200B\u200C\u200D\uFEFF"
  val SpaceLikeChars: String = "\u00A0\u3000"
  val QuoteDashSrc: String = "\u2018\u2019\u201C\u201D\u2013\u2014\u2212"
  val QuoteDashDst: String = "''\"\"---"

  def normalizeUnicodeScoped(text: Column): Column = {
    val t1 = translate(text, ZeroWidthChars, "") // delete (dst shorter)
    val t2 = translate(t1, SpaceLikeChars, "  ")
    val t3 = translate(t2, QuoteDashSrc, QuoteDashDst)
    val t4 = translate(t3, FullWidthSrc, FullWidthDst)
    // 1:N expansions need replace, not translate
    val t5 = regexp_replace(t4, "\u2026", "...")
    val t6 = regexp_replace(t5, "\uFB01", "fi")
    regexp_replace(t6, "\uFB02", "fl")
  }

  /** E7 — LINE-WRAP REPAIR (the PDF/OCR-text cleanup pass):
    *  1. dehyphenate across a line break — letter/digit, '-', newline,
    *     letter/digit → the two joined;
    *  2. paragraph breaks (\n\n, matched left-to-right) preserved;
    *  3. remaining single newlines → space.
    * The double-newline protection runs on a sentinel (U+0001) replace
    * chain — replace() is all-occurrences left-to-right in Spark AND
    * DuckDB, so the chain is engine-exact without lookaround (RE2 has
    * none). */
  def repairLineWraps(text: Column): Column = {
    val d1 = regexp_replace(text, "([\\p{L}0-9])-\\n([\\p{L}0-9])", "$1$2")
    val d2 = regexp_replace(d1, "\\n\\n", "\u0001")
    val d3 = regexp_replace(d2, "\\n", " ")
    regexp_replace(d3, "\u0001", "\n\n")
  }

  /** E7 — SENTENCE SPLIT + stats, scan-side: sentences are the
    * non-empty spans between [.!?]+ runs (trailing whitespace
    * absorbed) — the rule-based splitter corpus pipelines run before
    * sentence-level dedup/packing. Returns a struct
    * (n_sentences, sum_chars, max_chars) of exact integers; pure
    * split/filter/aggregate column ops, no UDF. */
  def sentenceStats(text: Column): Column = {
    val parts = filter(split(text, "[.!?]+\\s*"), x => x =!= "")
    val lens = transform(parts, x => length(x).cast("long"))
    struct(
      size(parts).cast("long").as("n_sentences"),
      coalesce(aggregate(lens, lit(0L), (a, x) => a + x), lit(0L))
        .as("sum_chars"),
      coalesce(array_max(lens), lit(0L)).as("max_chars"))
  }

  /** E7 — MULTILINGUAL token stream: whitespace-delimited scripts
    * tokenize on \\s+; CJK-script languages (no word delimiters)
    * tokenize as CHARACTER BIGRAMS of each non-space run (the
    * standard CJK IR fallback — Nie et al., cross-lingual IR
    * literature) with a lone trailing char kept as a unigram. The
    * language column picks the rule per row, so one scan tokenizes a
    * mixed corpus. Pure column ops (split / transform / flatten).
    *
    * Code-point correctness: Spark's `length`/`substring` run on
    * UTF8String and count CODE POINTS, not UTF-16 units, so
    * supplementary-plane ideographs (CJK Ext-B+) bigram cleanly —
    * no surrogate pair is ever split (pinned by the Ext-B fixture in
    * Round11Spec). */
  def tokensMultilingual(text: Column, lang: Column): Column = {
    val cjk = lang.isin("zh", "ja", "ko")
    val runs = filter(split(lower(text), "\\s+"), x => x =!= "")
    val bigrams = flatten(transform(runs, r =>
      when(length(r) === 1, array(r)).otherwise(
        transform(sequence(lit(1), length(r) - 1),
          i => substring(r, i, lit(2))))))
    when(cjk, bigrams).otherwise(runs)
  }

  /** E7 — LOG TEMPLATE MINING (the Drain-family shape with a
    * deterministic masking rule instead of a learned parse tree):
    * variable fields collapse to placeholders —
    * UUIDs → <UUID>, 8+-char hex runs → <HEX>, IPv4 → <IP>,
    * digit runs → <N> — applied in that order, so every log line maps
    * to its TEMPLATE and the groupBy is the miner. Masking is one
    * scan-side regexp chain (RE2-safe, no lookaround). */
  def logTemplate(msg: Column): Column = {
    val t1 = regexp_replace(msg,
      "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
      "<UUID>")
    val t2 = regexp_replace(t1, "\\b[0-9a-fA-F]{8,}\\b", "<HEX>")
    val t3 = regexp_replace(t2,
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>")
    regexp_replace(t3, "[0-9]+", "<N>")
  }
}
