package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.OperatorCaches

/** E1/E2 — deduplication for training-data pipelines: exact, MinHash
  * LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: every method is a pure DataFrame plan whose only
  * shuffles are keyed on content-derived hashes (uniform by
  * construction — cryptographic/xx hashes don't skew). Candidate
  * generation never materializes the O(n²) pair space: LSH bands and
  * simhash chunks turn near-dup search into equi-joins on bucket keys.
  *
  * CACHE LIFETIME: the near-dup operators cache their bounded
  * per-doc sketches (signatures, fingerprints, shingle sets) because
  * each feeds 2-3 aliased consumers that exchange reuse cannot
  * deduplicate. The operator cannot unpersist before its result is
  * consumed, so every such cache registers with
  * [[graft.core.OperatorCaches]]: long-lived sessions call
  * `OperatorCaches.releaseAll(spark)` after consuming a result
  * (graft.Bench/Verify do, between queries) — deterministic cleanup
  * without clobbering user-owned caches.
  */
object Dedup {

  /** E1 — exact dedup on content hash. Returns the input annotated with
    * `content_hash`, `dup_group_size` and `is_canonical` (first doc id
    * per hash wins — deterministic, no dropDuplicates). */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hashed = docs.withColumn("content_hash", sha2(col(textCol), 256))
    val w = Window.partitionBy(col("content_hash"))
    hashed
      .withColumn("dup_group_size", count(lit(1)).over(w))
      .withColumn("is_canonical", col(idCol) === min(col(idCol)).over(w))
  }

  /** Word shingles of size n as a distinct array column. Documents with
    * fewer than n tokens yield an EMPTY array (no truncated shingle —
    * a 1-token doc must not emit a 1-token "3-shingle" that silently
    * skews Jaccard among very short docs). */
  def wordShingles(text: Column, n: Int): Column =
    // native codegen expression (see [[graft.ext.WordShingles]]) —
    // replaces the transform/slice/concat_ws higher-order formula,
    // which never enters codegen and paid an interpreted lambda per
    // shingle; semantics pinned identical by ExperimentationSpec
    WordShingles.wordShingles(text, n)

  /** E2 — MinHash signature: `numHashes` independent min-hashes over the
    * shingle set. Hash family: xxhash64 salted by the hash index —
    * deterministic across runs and cluster layouts. */
  def minhashSignature(docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int, numHashes: Int): DataFrame = {
    val exploded = docs
      .select(col(idCol), explode(wordShingles(col(textCol), shingleSize)).as("shingle"))
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    exploded.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"h$i")): _*).as("signature"))
  }

  /** E2 — LSH candidate pairs: signatures split into `bands` bands;
    * docs sharing any band-hash become a candidate pair; each pair is
    * then verified with exact Jaccard and filtered by `threshold`.
    * The band join is an equi-join on (band index, band hash) — a
    * uniform shuffle key; no cartesian anywhere. */
  def minhashNearDuplicates(docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, cache: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // cached: one signature row per doc — the bounded sketch. The band
    // self-join references it twice (a and b sides differ by alias, so
    // exchange reuse can't kick in); without the cache the shingle
    // explode + signature agg runs once PER SIDE. `cache = false` for
    // callers with no release point (pipeline registry).
    val sig = OperatorCaches.cachedIf(cache,
      minhashSignature(docs, textCol, idCol, shingleSize, numHashes))
    val banded = sig.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(concat_ws("_", b,
          concat_ws(",", slice(col("signature"), b * rows + 1, lit(rows))))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("band_hash"))
    val candidates = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    verifyJaccard(docs, textCol, idCol, candidates, shingleSize, cache)
      .filter(col("jaccard") >= threshold)
  }

  /** E2 — INCREMENTAL near-dup detection: a new batch checked against
    * an existing corpus (the daily-crawl shape — the corpus's
    * signatures are computed once and reused; production stores them
    * as a table and this function's corpus side reads it back). Band
    * hashes from each side meet in an equi-join — new×corpus candidate
    * pairs only, never corpus×corpus — then exact-Jaccard verification
    * exactly as the batch operator. Ids must be disjoint across sides.
    * Returns (id_corpus, id_new, jaccard >= threshold). */
  def minhashNearDuplicatesAgainst(corpus: DataFrame, newDocs: DataFrame,
      textCol: String, idCol: String,
      shingleSize: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, cache: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    def banded(docs: DataFrame) = OperatorCaches.cachedIf(cache,
      minhashSignature(docs, textCol, idCol, shingleSize, numHashes))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(concat_ws("_", b,
            concat_ws(",", slice(col("signature"), b * rows + 1, lit(rows))))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val c = banded(corpus).select(col(idCol).as("id_corpus"), col("band"), col("band_hash"))
    val n = banded(newDocs).select(col(idCol).as("id_new"), col("band"), col("band_hash"))
    val candidates = c.join(n, Seq("band", "band_hash"))
      .select("id_corpus", "id_new").distinct()
    val pairs = candidates
      .select(col("id_corpus").as("id_a"), col("id_new").as("id_b"))
    verifyJaccard(corpus.unionByName(newDocs), textCol, idCol, pairs, shingleSize, cache)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a").as("id_corpus"), col("id_b").as("id_new"), col("jaccard"))
  }

  /** Exact Jaccard for given candidate pairs via shingle-set join. */
  def verifyJaccard(docs: DataFrame, textCol: String, idCol: String,
      pairs: DataFrame, shingleSize: Int, cache: Boolean = true): DataFrame = {
    // cached: the exploded shingle set feeds three consumers (two join
    // sides + the per-doc counts); ~n_tokens rows per doc, bounded
    val sh = OperatorCaches.cachedIf(cache, docs.select(col(idCol).as("__id"),
      explode(wordShingles(col(textCol), shingleSize)).as("shingle")).distinct())
    val counts = sh.groupBy("__id").agg(count(lit(1)).as("n"))
    val shA = sh.select(col("__id").as("id_a"), col("shingle"))
    val shB = sh.select(col("__id").as("id_b"), col("shingle"))
    val interCount = pairs.join(shA, "id_a").join(shB, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    pairs
      .join(interCount, Seq("id_a", "id_b"), "left")
      .join(counts.select(col("__id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(counts.select(col("__id").as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      // the integer (inter, n_a, n_b) triple rides along so callers
      // can threshold EXACTLY (inter·k >= t·union) instead of via the
      // float quotient — q195's threshold sweep needs it
      .select("id_a", "id_b", "jaccard", "inter", "n_a", "n_b")
  }

  /** Cross-engine-portable 60-bit token hash: the first 15 hex chars of
    * md5 as a long. DuckDB reconstructs the identical value
    * nibble-by-nibble (q46's oracle does) — so a simhash built on it is
    * exactly oracle-checkable. xxhash64 stays the production default
    * (one codegen'd op vs an md5 round per token). */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** E2 — SimHash fingerprint over word tokens: per bit, sum of ±1
    * across token hashes; sign → bit. Pure column expressions.
    * `tokenHash`/`nBits` select the hash family (default xxhash64/64;
    * [[md5Hash60]]/60 for cross-engine verification).
    *
    * Shape: a TALL (doc, bit) aggregation rather than one nBits-wide
    * aggregate. The wide form generates one enormous codegen method (64
    * buffer updates, each with a branch) whose JIT ramp dominated small
    * runs (~2s until C2 lands vs a ~1s plan floor); the tall form's
    * methods are tiny and compile immediately. Shuffle bytes are the
    * same either way (nBits partial sums per doc per partition), and
    * sign(Σ±1) ≡ 2·ones > n exactly, so fingerprints are unchanged. */
  def simhash(docs: DataFrame, textCol: String, idCol: String,
      tokenHash: Column => Column = xxhash64(_), nBits: Int = 64): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(array_distinct(split(lower(col(textCol)), "\\s+"))).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    val tall = toks.select(col(idCol), col("h"),
      explode(sequence(lit(0), lit(nBits - 1))).as("bit"))
    val perBit = tall.groupBy(col(idCol), col("bit"))
      .agg(sum(call_function("shiftright", col("h"), col("bit")).bitwiseAND(1)).as("ones"),
        count(lit(1)).as("n"))
    perBit.groupBy(col(idCol))
      .agg(sum(when(col("ones") * 2 > col("n"),
        call_function("shiftleft", lit(1L), col("bit"))).otherwise(lit(0L))).as("simhash"))
  }

  /** Hamming distance between two fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** E2 — simhash near-dup candidates: fingerprint, then pigeonhole
    * chunk blocking + exact hamming verify via
    * [[fingerprintNearDuplicates]] (maxDistance+1 chunks — so, unlike
    * a fixed 4-chunk split, recall holds for ANY maxDistance). */
  def simhashNearDuplicates(docs: DataFrame, textCol: String, idCol: String,
      maxDistance: Int = 3,
      tokenHash: Column => Column = xxhash64(_), nBits: Int = 64,
      cache: Boolean = true): DataFrame =
    fingerprintNearDuplicates(simhash(docs, textCol, idCol, tokenHash, nBits),
      idCol, "simhash", maxDistance, nBits, cache)

  /** E2 — EXACT set-similarity self-join via prefix filtering (the
    * SSJoin/PPJoin family — Chaudhuri et al. ICDE'06, Xiao et al.
    * WWW'08, public literature): every pair with Jaccard ≥ tNum/tDen
    * must share a shingle inside both documents' PREFIXES — the
    * (L − ⌈t·L⌉ + 1) globally-rarest shingles of each — so the
    * candidate join touches prefixes only, then verifies exactly.
    * Deterministic and recall-COMPLETE, unlike MinHash LSH (q45):
    * this is the exact candidate generator; LSH is the probabilistic
    * one. The threshold is a rational tNum/tDen and every comparison
    * is integer arithmetic (⌈t·L⌉ = (tNum·L + tDen − 1) div tDen;
    * keep iff inter·tDen ≥ tNum·(nA + nB − inter)) — no float ceil
    * can shorten a prefix below what the pigeonhole bound needs.
    *
    * Scale: the global document-frequency order biases prefixes toward
    * the RARE end of the vocabulary, which is precisely the anti-skew
    * device — a raw token equi-join would hot-spot on stopwords; the
    * prefix join hot-spots on hapaxes, which don't hot-spot. One
    * df agg + one doc-keyed ranking window + shingle equi-joins; the
    * all-pairs space never materializes. */
  def prefixFilterJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, tNum: Int = 1, tDen: Int = 2,
      cache: Boolean = true): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      "threshold tNum/tDen must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val sh = OperatorCaches.cachedIf(cache, docs.select(col(idCol).as("__id"),
      explode(wordShingles(col(textCol), shingleSize)).as("shingle")).distinct())
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("__df"))
    // per-doc rank under the global (df asc, shingle asc) total order
    val w = Window.partitionBy(col("__id")).orderBy(col("__df"), col("shingle"))
    val prefix = sh.join(dfreq, "shingle")
      .select(col("__id"), col("shingle"),
        row_number().over(w).as("__pos"),
        count(lit(1)).over(Window.partitionBy(col("__id"))).as("__len"))
      // α = ⌈t·L⌉ in exact integers; keep positions 1 .. L − α + 1
      .filter(col("__pos") <=
        col("__len") - expr(s"(${tNum}L * __len + ${tDen - 1}L) div ${tDen}L") + 1)
    val cand = prefix.select(col("__id").as("id_a"), col("shingle"))
      .join(prefix.select(col("__id").as("id_b"), col("shingle")), "shingle")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val counts = sh.groupBy("__id").agg(count(lit(1)).as("n"))
    val interCount = cand
      .join(sh.select(col("__id").as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col("__id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    interCount
      .join(counts.select(col("__id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(counts.select(col("__id").as("id_b"), col("n").as("n_b")), "id_b")
      .filter(col("inter") * tDen >= (col("n_a") + col("n_b") - col("inter")) * tNum)
      .select(col("id_a"), col("id_b"),
        (col("inter") / (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
  }

  /** E2 — EXACT directional CONTAINMENT self-join: pairs (a, b) with
    * |shingles(a) ∩ shingles(b)| ≥ (tNum/tDen)·|shingles(a)| — the
    * ASYMMETRIC near-dup relation Jaccard misses entirely: an excerpt
    * quoted inside a much larger document has containment ≈ 1 but
    * Jaccard ≈ |a|/|b| ≈ 0. The dedup pass that catches quote-farms
    * and page-in-page mirrors.
    *
    * Same prefix-filter machinery as [[prefixFilterJaccardPairs]] but
    * ONE-SIDED: if a pair shares none of a's (|a| − ⌈t·|a|⌉ + 1)
    * globally-rarest shingles, then inter ≤ ⌈t·|a|⌉ − 1 < t·|a| —
    * so probing a's prefix against ALL of b's shingles is
    * recall-complete for the directional threshold. Exact integer
    * verify: keep iff inter·tDen ≥ tNum·|a|.
    *
    * Scale: candidates key on rare shingles (anti-skew, as in the
    * Jaccard form); the b side is the full shingle set, so the join is
    * |prefix(a)|·df-bounded, never |docs|². */
  def containmentPairs(docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, tNum: Int = 3, tDen: Int = 4,
      cache: Boolean = true): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      "threshold tNum/tDen must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val sh = OperatorCaches.cachedIf(cache, docs.select(col(idCol).as("__id"),
      explode(wordShingles(col(textCol), shingleSize)).as("shingle")).distinct())
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("__df"))
    val w = Window.partitionBy(col("__id")).orderBy(col("__df"), col("shingle"))
    val prefix = sh.join(dfreq, "shingle")
      .select(col("__id"), col("shingle"),
        row_number().over(w).as("__pos"),
        count(lit(1)).over(Window.partitionBy(col("__id"))).as("__len"))
      .filter(col("__pos") <=
        col("__len") - expr(s"(${tNum}L * __len + ${tDen - 1}L) div ${tDen}L") + 1)
    val cand = prefix.select(col("__id").as("id_a"), col("shingle"))
      .join(sh.select(col("__id").as("id_b"), col("shingle")), "shingle")
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    val counts = sh.groupBy("__id").agg(count(lit(1)).as("n"))
    cand
      .join(sh.select(col("__id").as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col("__id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(counts.select(col("__id").as("id_a"), col("n").as("n_a")), "id_a")
      .filter(col("inter") * tDen >= col("n_a") * tNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"))
  }

  /** E2 — near-dup candidates over an EXISTING 64-bit fingerprint
    * column (any family: simhash, image aHash, audio chromaprint-style
    * hashes…): pigeonhole blocking on `maxDistance + 1` bit chunks —
    * `maxDistance` flips cannot touch every chunk, so true pairs share
    * at least one exact chunk value — then exact hamming verification.
    *
    * Chunk widths are floor(nBits/chunks) with the last chunk absorbing
    * the remainder, so any (nBits, maxDistance) combination blocks
    * correctly. Same scale shape as [[simhashNearDuplicates]]: the
    * pair space never materializes; the join keys on (chunk index,
    * chunk value) — content-derived, uniform. */
  def fingerprintNearDuplicates(fps: DataFrame, idCol: String, fpCol: String,
      maxDistance: Int = 3, nBits: Int = 64,
      cache: Boolean = true): DataFrame = {
    val nChunks = maxDistance + 1
    require(nBits >= 1 && nBits <= 64,
      s"fingerprints are 64-bit longs; nBits must be 1..64, got $nBits")
    require(nChunks >= 1 && nChunks <= nBits,
      s"need 1..$nBits chunks, got $nChunks")
    val baseW = nBits / nChunks
    val f = OperatorCaches.cachedIf(cache,
      fps.select(col(idCol), col(fpCol).cast("long").as("__fp")))
    val chunked = f.select(col(idCol), col("__fp"),
      posexplode(array((0 until nChunks).map { i =>
        val w = if (i == nChunks - 1) nBits - i * baseW else baseW
        val mask = if (w >= 64) -1L else (1L << w) - 1
        shiftright(col("__fp"), i * baseW).bitwiseAND(lit(mask))
      }: _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val a = chunked.select(col(idCol).as("id_a"), col("__fp").as("fp_a"),
      col("chunk"), col("chunk_val"))
    val b = chunked.select(col(idCol).as("id_b"), col("__fp").as("fp_b"),
      col("chunk"), col("chunk_val"))
    a.join(b, Seq("chunk", "chunk_val")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("fp_a"), col("fp_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  /** E1+/E7 — EXACT cross-document substring spans (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL
    * 2022 — the exact-substring half of that paper, token-windowed
    * rather than suffix-array): every maximal run of >= `k` shared
    * consecutive tokens between two documents. k-token grams hash with
    * the portable [[md5Hash60]]; cross-doc gram matches land on a
    * DIAGONAL (pos_a − pos_b constant), and consecutive matches on a
    * diagonal merge into maximal spans with the islands trick
    * (pos − row_number per diagonal). Returns one row per maximal
    * span with `len_tokens` >= `minSpanTokens`:
    * (id_a, id_b, start_a, start_b, len_tokens), 1-based positions,
    * id_a < id_b.
    *
    * Scale: the join is keyed on gram CONTENT hash — uniform except
    * for boilerplate grams, which are real skew (AQE skew-join
    * handles moderate cases; for web-scale corpora drop the
    * top-frequency grams first — they are exactly the boilerplate a
    * line-dedup pass (q71) removes). The islands window partitions by
    * (pair, diagonal) — never global. Pair volume is match-bounded,
    * not |docs|² — only documents actually sharing a gram ever meet. */
  def substringSpans(docs: DataFrame, textCol: String, idCol: String,
      k: Int, minSpanTokens: Int): DataFrame = {
    require(k >= 2 && minSpanTokens >= k, "need k >= 2, minSpanTokens >= k")
    val grams = docs
      .select(col(idCol).as("__id"), TextAnalysis.tokens(col(textCol)).as("__t"))
      // sequence(1, n) DESCENDS for n < 1 — guard short docs to empty
      .select(col("__id"), explode(expr(
        s"""CASE WHEN size(__t) >= $k
           |  THEN transform(sequence(1, size(__t) - $k + 1),
           |         i -> struct(i AS pos, concat_ws(' ', slice(__t, i, $k)) AS gs))
           |  ELSE array() END""".stripMargin)).as("__g"))
      .select(col("__id"), col("__g.pos").as("pos"),
        md5Hash60(col("__g.gs")).as("g"))
    val a = grams.select(col("__id").as("id_a"), col("pos").as("pos_a"), col("g"))
    val b = grams.select(col("__id").as("id_b"), col("pos").as("pos_b"), col("g"))
    val matches = a.join(b, Seq("g")).filter(col("id_a") < col("id_b"))
      .withColumn("diag", col("pos_a") - col("pos_b"))
    val isl = matches.withColumn("__grp", col("pos_a") -
      row_number().over(Window.partitionBy(col("id_a"), col("id_b"), col("diag"))
        .orderBy(col("pos_a"))))
    isl.groupBy(col("id_a"), col("id_b"), col("diag"), col("__grp"))
      .agg(min(col("pos_a")).as("start_a"), min(col("pos_b")).as("start_b"),
        (max(col("pos_a")) - min(col("pos_a")) + k).cast("long").as("len_tokens"))
      .filter(col("len_tokens") >= minSpanTokens)
      .select(col("id_a"), col("id_b"),
        col("start_a").cast("long").as("start_a"),
        col("start_b").cast("long").as("start_b"), col("len_tokens"))
  }

  /** E1+/E7 — template-skeleton duplicate families (the CCNet /
    * RefinedWeb boilerplate device): normalize each document to its
    * SKELETON — lowercase, every digit run → '0', everything outside
    * [a-z0 ] dropped, whitespace collapsed — and group by the
    * skeleton's [[md5Hash60]]. Families with >= 2 docs are template
    * spam ("Showing 1-10 of 234 results" pages, timestamps, counters)
    * that exact dedup misses because the raw bytes differ. Returns
    * (skeleton_hash, n_docs, n_distinct_raw, first_id) per family
    * with n_docs >= 2; `n_distinct_raw < n_docs` additionally flags
    * byte-exact members inside the family.
    *
    * Scale: pure scan-side normalization (three codegen'd
    * regexp_replace passes, no UDF) + one content-hash-keyed agg with
    * map-side combine — exact dedup's cost profile, uniform shuffle
    * by construction. */
  def templateSkeletons(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val skel = trim(regexp_replace(regexp_replace(regexp_replace(
      lower(col(textCol)), "[0-9]+", "0"), "[^a-z0 ]", ""), " +", " "))
    docs.select(col(idCol).as("__id"), md5Hash60(skel).as("skeleton_hash"),
        sha2(col(textCol), 256).as("__raw"))
      .groupBy(col("skeleton_hash"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__raw")).as("n_distinct_raw"),
        min(col("__id")).as("first_id"))
      .filter(col("n_docs") >= 2)
  }
  /** E2 — blocking-quality audit (Christen, Data Matching 2012 §7.4:
    * reduction ratio + pairs completeness): given a blocking
    * assignment (id → block key, one or many per id) and a GROUND-
    * TRUTH match-pair set, measure the two numbers every record-
    * linkage / dedup blocking scheme is judged by —
    *   RR = 1 − |candidate pairs| / C(n,2)   (work saved)
    *   PC = |truth ∩ candidates| / |truth|   (recall preserved)
    * Returns ONE row: (n_ids, n_blocks, total_pairs, candidate_pairs,
    * true_pairs, covered_pairs, reduction_ratio, pairs_completeness).
    * All counts exact integers; the two ratios are one pinned IEEE
    * division each.
    *
    * Scale: the candidate join is the block equi-join itself (what the
    * blocking scheme pays in production); truth is audit-scale input
    * by contract (ground truth only exists where someone labeled or
    * exhaustively verified — run the audit on that sample). */
  def blockingAudit(assign: DataFrame, idCol: String, blockCol: String,
      truth: DataFrame, idA: String, idB: String): DataFrame = {
    val a = assign.select(col(idCol).cast("long").as("__ia"),
      col(blockCol).as("__b")).distinct().localCheckpoint()
    val cand = a.join(
        a.select(col("__ia").as("__ib"), col("__b")), Seq("__b"))
      .filter(col("__ia") < col("__ib"))
      .select(col("__ia"), col("__ib")).distinct().localCheckpoint()
    val tp = truth.select(
        least(col(idA), col(idB)).cast("long").as("__ia"),
        greatest(col(idA), col(idB)).cast("long").as("__ib"))
      .filter(col("__ia") < col("__ib")).distinct().localCheckpoint()
    val covered = tp.join(cand, Seq("__ia", "__ib"), "left_semi")
    val nIds = a.select(col("__ia")).distinct().count()
    val nBlocks = a.select(col("__b")).distinct().count()
    val sp = assign.sparkSession
    sp.range(1).select(
        lit(nIds).as("n_ids"), lit(nBlocks).as("n_blocks"),
        lit(nIds * (nIds - 1) / 2).as("total_pairs"),
        lit(cand.count()).as("candidate_pairs"),
        lit(tp.count()).as("true_pairs"),
        lit(covered.count()).as("covered_pairs"))
      .withColumn("reduction_ratio",
        lit(1.0) - col("candidate_pairs").cast("double") /
          col("total_pairs").cast("double"))
      .withColumn("pairs_completeness",
        when(col("true_pairs") > 0,
          col("covered_pairs").cast("double") /
            col("true_pairs").cast("double")))
  }
  /** E2/J-fuzzy — exact edit-distance-1 self-join by DELETION
    * NEIGHBORHOODS (FastSS — Bocek, Hunt & Stiller 2007): every
    * string generates itself plus its |s| one-character-deletion
    * variants; two strings with Levenshtein distance ≤ 1 ALWAYS share
    * a variant (a substitution shares the deletion at the edited
    * position; an insertion's deletion IS the other string) — so the
    * variant equi-join is recall-COMPLETE, unlike prefix blocking
    * (q108), which is blind to first-character edits. Candidates
    * verify with exact Levenshtein. Returns (id_a, id_b, s_a, s_b,
    * dist ≤ 1).
    *
    * Scale: the explode is |s|+1 variants per DISTINCT string; the
    * join keys on variant content (uniform hash); the pair space is
    * true-neighborhood-sized, never n². */
  def editDistance1Join(df: DataFrame, idCol: String,
      strCol: String): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("__id"),
        col(strCol).as("__s"))
      .filter(col("__s").isNotNull).distinct().localCheckpoint()
    val variants = base.select(col("__id"), col("__s"),
        explode(expr(
          """transform(sequence(0, length(__s)),
            |  i -> CASE WHEN i = 0 THEN __s
            |       ELSE concat(substring(__s, 1, i - 1),
            |                   substring(__s, i + 1)) END)"""
            .stripMargin)).as("__v"))
      .select(col("__id"), col("__s"), col("__v")).distinct()
    val cand = variants.select(col("__id").as("id_a"), col("__s").as("s_a"),
        col("__v"))
      .join(variants.select(col("__id").as("id_b"), col("__s").as("s_b"),
        col("__v")), Seq("__v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b")).distinct()
    cand.withColumn("dist",
        levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= 1)
  }

  /** E2 — the shared k-token-gram table behind [[substringDupPairs]] /
    * [[substringDupMass]]: one row per (doc, DISTINCT k-gram), with
    * each gram's document frequency. Grams seen in more than
    * `maxDocFreq` docs are DROPPED — boilerplate n-grams (headers,
    * license blocks) would otherwise quadratically dominate the pair
    * join, and Lee et al. treat them as non-signal for the same
    * reason. Grams are kept as STRINGS (exact, oracle-comparable);
    * at 100 TB swap the groupBy key for xxhash64(gram) — the plan
    * shape is unchanged and a 64-bit collision is ~(grams²/2⁶⁵).
    *
    * Scale: token explode is linear in corpus tokens; the gram rollup
    * keys on content-uniform gram text; the doc-freq cap bounds every
    * downstream fan-out at maxDocFreq per gram. */
  private def kgramTable(docs: DataFrame, textCol: String, idCol: String,
      k: Int, maxDocFreq: Int, cache: Boolean): DataFrame = {
    require(k >= 2, "k >= 2")
    require(maxDocFreq >= 2, "maxDocFreq >= 2 (1 would drop every shared gram)")
    val toks = docs.select(col(idCol).as("__id"),
      expr(s"filter(split(lower($textCol), '\\\\s+'), t -> t != '')").as("__t"))
    val grams = toks
      .filter(size(col("__t")) >= k)
      .select(col("__id"), explode(expr(
        s"""array_distinct(transform(sequence(1, size(__t) - ${k - 1}),
           |  i -> concat_ws(' ', slice(__t, i, $k))))""".stripMargin))
        .as("__g"))
    val tbl = graft.core.OperatorCaches.cachedIf(cache, grams)
    val dfreq = tbl.groupBy(col("__g"))
      .agg(countDistinct(col("__id")).as("__df"))
      .filter(col("__df") <= maxDocFreq)
    tbl.join(dfreq, "__g")
  }

  /** E2 — EXHAUSTIVE k-token-gram substring duplicate pairs (Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models
    * Better" — public literature): every doc pair sharing at least
    * `minShared` distinct k-grams, with the shared count. Winnowing
    * ([[TextAnalysis.winnowingFingerprints]]) SAMPLES fingerprints and
    * only guarantees matches longer than its window; this is the
    * exhaustive variant — the forensic pass run when a winnowing hit
    * needs exact shared-substring evidence, or on an eval set where
    * recall must be 1. Returns (id_a, id_b, shared_grams), id_a < id_b.
    *
    * Scale: the gram self-join fans out at most maxDocFreq² rows per
    * gram (boilerplate grams are dropped — see [[kgramTable]]); pair
    * aggregation keys on the (id_a, id_b) pair. Exhaustive beats
    * sampled only when evidence matters; at raw 100 TB run winnowing
    * first and this on the candidate closure. */
  def substringDupPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int, minShared: Int, maxDocFreq: Int,
      cache: Boolean = true): DataFrame = {
    require(minShared >= 1, "minShared >= 1")
    val tbl = kgramTable(docs, textCol, idCol, k, maxDocFreq, cache)
      .select(col("__g"), col("__id"))
    tbl.select(col("__g"), col("__id").as("id_a"))
      .join(tbl.select(col("__g"), col("__id").as("id_b")), Seq("__g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("__g")).as("shared_grams"))
      .filter(col("shared_grams") >= minShared)
  }

  /** E2 — per-document DUPLICATION MASS: the share of a doc's distinct
    * k-grams that appear in at least one OTHER doc — Lee et al.'s
    * memorization-risk readout, per doc in ppm. Boilerplate grams past
    * maxDocFreq count as duplicated (they are, maximally) without
    * paying their join fan-out. Returns
    * (id, n_grams, dup_grams, dup_ppm).
    *
    * Scale: one gram rollup + one doc-keyed agg — no pair join at all,
    * so this one DOES run at raw corpus scale. */
  def substringDupMass(docs: DataFrame, textCol: String, idCol: String,
      k: Int, cache: Boolean = true): DataFrame = {
    require(k >= 2, "k >= 2")
    val toks = docs.select(col(idCol).as("__id"),
      expr(s"filter(split(lower($textCol), '\\\\s+'), t -> t != '')").as("__t"))
    val grams = toks
      .filter(size(col("__t")) >= k)
      .select(col("__id"), explode(expr(
        s"""array_distinct(transform(sequence(1, size(__t) - ${k - 1}),
           |  i -> concat_ws(' ', slice(__t, i, $k))))""".stripMargin))
        .as("__g"))
    val tbl = graft.core.OperatorCaches.cachedIf(cache, grams)
    val dfreq = tbl.groupBy(col("__g"))
      .agg(countDistinct(col("__id")).as("__df"))
    tbl.join(dfreq, "__g")
      .groupBy(col("__id").as("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("dup_grams"))
      .withColumn("dup_ppm", expr("(dup_grams * 1000000L) div n_grams"))
  }
}
