package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** E1/E2 — deduplication for training-data pipelines: exact, MinHash
  * LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: every method is a pure DataFrame plan whose only
  * shuffles are keyed on content-derived hashes (uniform by
  * construction — cryptographic/xx hashes don't skew). Candidate
  * generation never materializes the O(n²) pair space: LSH bands and
  * simhash chunks turn near-dup search into equi-joins on bucket keys.
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

  /** Word shingles of size n as a distinct array column. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(lower(text), "\\s+")
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    array_distinct(transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

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
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = minhashSignature(docs, textCol, idCol, shingleSize, numHashes)
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
    verifyJaccard(docs, textCol, idCol, candidates, shingleSize)
      .filter(col("jaccard") >= threshold)
  }

  /** Exact Jaccard for given candidate pairs via shingle-set join. */
  def verifyJaccard(docs: DataFrame, textCol: String, idCol: String,
      pairs: DataFrame, shingleSize: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"),
      explode(wordShingles(col(textCol), shingleSize)).as("shingle")).distinct()
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
      .select("id_a", "id_b", "jaccard")
  }

  /** E2 — 64-bit SimHash fingerprint over word tokens: per bit, sum of
    * ±1 across token hashes; sign → bit. Pure column expressions. */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(array_distinct(split(lower(col(textCol)), "\\s+"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val agg = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    agg.select(col(idCol), fp.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** E2 — simhash near-dup candidates: block on 4×16-bit chunks (two
    * fingerprints within hamming distance 3 share at least one exact
    * chunk — pigeonhole), verify hamming <= maxDistance. */
  def simhashNearDuplicates(docs: DataFrame, textCol: String, idCol: String,
      maxDistance: Int = 3): DataFrame = {
    val fp = simhash(docs, textCol, idCol)
    val chunked = fp.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val a = chunked.select(col(idCol).as("id_a"), col("simhash").as("fp_a"),
      col("chunk"), col("chunk_val"))
    val b = chunked.select(col(idCol).as("id_b"), col("simhash").as("fp_b"),
      col("chunk"), col("chunk_val"))
    a.join(b, Seq("chunk", "chunk_val")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("fp_a"), col("fp_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }
}
