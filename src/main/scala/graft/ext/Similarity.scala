package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.OperatorCaches

/** E3 — similarity search over embedding columns (ARRAY<FLOAT>).
  *
  * Baseline: brute-force cosine top-k — a scan with a codegen'd
  * `aggregate`/`zip_with` dot product (no UDF), TakeOrdered for the
  * top-k (per-partition k-heaps, no full sort).
  *
  * Scale path: LSH bucketing via random-hyperplane signs — candidate
  * set shrinks ~2^bits×, bucket id is a uniform equi-join/groupBy key.
  * An IVF variant (assign to nearest of C sampled centroids, probe P)
  * follows the same plan shape: the pruning key is precomputable,
  * partition-prunable, and skew-free.
  */
object Similarity {

  /** Dot product of two array<double|float> columns — the native
    * codegen [[ArrayDotProduct]] expression: a primitive double loop
    * inside whole-stage codegen, index-order accumulation (IEEE-equal
    * to the old `aggregate`/`zip_with` fold and to DuckDB's
    * list_dot_product — the oracle gate re-proves it per round). */
  def dot(a: Column, b: Column): Column = VectorExpressions.arrayDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine against one query vector (broadcast as a
    * literal array — no join at all, one scan + TakeOrdered). */
  def topKCosine(embeddings: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val q = array(query.toIndexedSeq.map(v => lit(v.toDouble)): _*)
    embeddings
      .withColumn("cosine", cosine(col(vecCol), q))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch form: top-k neighbours for EVERY query row (small query
    * side broadcast; ranking window per query id). */
  def topKCosineBatch(embeddings: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val e = embeddings.select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec")))
    val scored = e.join(q, col("item_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("item_vec"), col("query_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "item_id", "rank", "cosine")
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH: plane p,
    * dim d weight = hash-derived value in [-1, 1).
    *
    * productHash is deprecated in favor of caseClassHash, but the two
    * hash DIFFERENTLY — switching would silently reassign every LSH
    * bucket and break stored signatures; the exact current values are
    * the contract. */
  @annotation.nowarn("cat=deprecation")
  private def planeWeight(p: Int, d: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((p, d, 0x9e3779b9))
    (h.toDouble / Int.MaxValue)
  }

  /** Projection of a vector column onto literal plane weights — a
    * zip_with/aggregate fold, NOT dim-unrolled element_at arithmetic:
    * the unrolled form is ~3·dim expression nodes per plane, which
    * overflows whole-stage codegen's method budget. Fold order matches
    * a driver-side left-to-right sum, so bucket ids agree with
    * Scala-computed query buckets bit for bit.
    *
    * Dim-mismatch safety: the vector is sliced to `dim` (prefix
    * semantics, like the element_at form) and missing trailing dims
    * contribute 0 — without the guards, zip_with null-pads the shorter
    * side and one null poisons the whole fold, silently zeroing every
    * bucket bit. */
  private def projectOnPlane(vec: Column, p: Int, dim: Int): Column =
    aggregate(
      zip_with(slice(vec, 1, dim), array((0 until dim).map(d => lit(planeWeight(p, d))): _*),
        (x, pw) => coalesce(x.cast("double") * pw, lit(0.0))),
      lit(0.0), (acc, v) => acc + v)

  /** E3 scale path — sign-LSH bucket id per row: `bits` hyperplane
    * sign bits packed into a long. Pure column expressions (the plane
    * weights are literals baked into the plan). */
  def lshBucket(vec: Column, dim: Int, bits: Int): Column =
    (0 until bits).map { p =>
      when(projectOnPlane(vec, p, dim) >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** IVF (inverted-file) index: Lloyd's k-means over the embedding
    * column, entirely in DataFrame ops — assignment is an argmin over
    * broadcast centroid literals; the update step collects only nC
    * centroid rows (bounded, like the kriging solve). Returns the
    * embeddings annotated with `cluster` plus the centroids. At 100 TB
    * the `cluster` column becomes the partition key: a probe touches
    * nProbe/nCentroids of the data. */
  def ivfIndex(embeddings: DataFrame, vecCol: String, idCol: String,
      dim: Int, nCentroids: Int, iterations: Int = 5)
      : (DataFrame, Array[Array[Double]]) = {
    val centroids = kmeans(embeddings, col(vecCol), idCol, dim, nCentroids, iterations)
    (embeddings.withColumn("cluster", argminExpr(centroids, col(vecCol), dim)), centroids)
  }

  /** Argmin over squared distance to each centroid literal array.
    * zip_with/aggregate, not dim-unrolled element_at arithmetic: the
    * unrolled form is ~4·dim expression nodes PER CENTROID, which
    * overflows whole-stage codegen's method budget and drops the
    * scan to interpreted evaluation. */
  private def argminExpr(cs: Array[Array[Double]], vec: Column, dim: Int): Column = {
    val scored = cs.zipWithIndex.map { case (c, i) =>
      val carr = array(c.toIndexedSeq.map(lit): _*)
      // slice + coalesce: see projectOnPlane's dim-mismatch note
      val d2 = aggregate(
        zip_with(slice(vec, 1, dim), carr, (x, cd) => {
          val diff = x.cast("double") - cd; coalesce(diff * diff, lit(0.0))
        }),
        lit(0.0), (acc, v) => acc + v)
      struct(d2.as("d2"), lit(i).as("i"))
    }
    array_min(array(scored.toIndexedSeq: _*)).getField("i")
  }

  /** Lloyd k-means over an array column, deterministic seed (first nC
    * vectors by id). Distributed assignment + aggregation; only the
    * nC centroid rows ever reach the driver. */
  private def kmeans(df: DataFrame, vec: Column, idCol: String, dim: Int,
      nC: Int, iterations: Int): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = df
      .orderBy(col(idCol)).limit(nC)
      .select(vec).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    for (_ <- 1 to iterations) {
      val assigned = df.withColumn("__c", argminExpr(centroids, vec, dim))
      val sums = (0 until dim).map(d =>
        sum(element_at(vec, d + 1).cast("double")).as(s"s$d")) :+
        count(lit(1)).as("n")
      val updated = assigned.groupBy(col("__c"))
        .agg(sums.head, sums.tail: _*)
        .collect()
        .map { r =>
          val n = r.getAs[Long]("n").toDouble
          r.getAs[Int]("__c") -> (0 until dim).map(d => r.getAs[Double](s"s$d") / n).toArray
        }.toMap
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** E3 — product quantization (Jégou/Douze/Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): split
    * each vector into `m` subvectors, k-means each subspace to `k`
    * codewords, store each vector as `m` small codes. Memory per
    * vector drops from 4·dim bytes to m codes (one byte each at
    * k ≤ 256) — the difference between an index that fits executor
    * memory at 100 TB and one that doesn't. Returns the embeddings
    * annotated with `pq_code: ARRAY<INT>` plus the per-subspace
    * codebooks. Training is the same distributed Lloyd iteration as
    * IVF, once per subspace; only codebook rows reach the driver. */
  def pqIndex(embeddings: DataFrame, vecCol: String, idCol: String,
      dim: Int, m: Int, k: Int, iterations: Int = 5)
      : (DataFrame, Array[Array[Array[Double]]]) = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    val codebooks = Array.tabulate(m) { j =>
      kmeans(embeddings, slice(col(vecCol), j * sub + 1, sub), idCol,
        sub, k, iterations)
    }
    val codes = array(codebooks.zipWithIndex.map { case (cb, j) =>
      argminExpr(cb, slice(col(vecCol), j * sub + 1, sub), sub)
    }.toIndexedSeq: _*)
    (embeddings.withColumn("pq_code", codes), codebooks)
  }

  /** PQ search via the asymmetric distance computation (ADC): the
    * query stays exact; per subspace a k-entry lookup table of
    * squared distances to each codeword is built ON THE DRIVER (m·k
    * doubles — broadcast as plan literals), and each row's
    * approximate distance is m table lookups + adds instead of dim
    * multiplies over decoded floats. Returns top-k by ADC distance
    * with `pq_d2`; exactness is what's traded — compose with an exact
    * re-rank of the short list when needed. */
  def pqTopK(encoded: DataFrame, codebooks: Array[Array[Array[Double]]],
      idCol: String, query: Array[Float], topK: Int): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val luts: Array[Array[Double]] = Array.tabulate(m) { j =>
      val q = query.slice(j * sub, (j + 1) * sub).map(_.toDouble)
      codebooks(j).map(c => c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
    val d2 = (0 until m).map { j =>
      element_at(array(luts(j).map(lit).toIndexedSeq: _*),
        element_at(col("pq_code"), j + 1) + 1)
    }.reduce(_ + _)
    encoded.withColumn("pq_d2", d2)
      .select(col(idCol), col("pq_d2"))
      .orderBy(col("pq_d2").asc, col(idCol).asc)
      .limit(topK)
  }

  /** IVF search: exact cosine top-k within the query's nProbe nearest
    * clusters. Probing every cluster degrades gracefully to brute force. */
  def ivfTopKCosine(indexed: DataFrame, centroids: Array[Array[Double]],
      vecCol: String, idCol: String, query: Array[Float], k: Int,
      nProbe: Int): DataFrame = {
    val qd = query.map(_.toDouble)
    val probes = centroids.zipWithIndex
      .map { case (c, i) => (i, c.zip(qd).map { case (a, b) => (a - b) * (a - b) }.sum) }
      .sortBy(_._2).take(nProbe).map(_._1)
    val q = array(query.toIndexedSeq.map(v => lit(v.toDouble)): _*)
    indexed.filter(col("cluster").isin(probes.toIndexedSeq: _*))
      .withColumn("cosine", cosine(col(vecCol), q))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** E2+E3 — embedding-cosine near-duplicate PAIRS: banded sign-LSH
    * candidate generation, then exact cosine verification.
    *
    * Band b packs `bitsPerBand` hyperplane sign bits; two vectors at
    * angle θ agree on one band w.p. (1−θ/π)^bits and escape ALL bands
    * w.p. (1−(1−θ/π)^bits)^bands — for near-dup thresholds (cosine
    * ≥ 0.99 → θ/π ≈ 0.045, defaults 16×6) that is ~1e-10: recall is
    * structural, so the exact all-pairs ground truth is a valid oracle.
    * Wider bands also do the candidate PRUNING: a random pair collides
    * per band w.p. 2^-bits, so 6-bit bands admit ~16/64 of random
    * pairs vs ~all of them at 2 bits.
    * Precision is exact: candidates verify true cosine ≥ threshold.
    * The O(n²) pair space never materializes — candidates come from an
    * equi-join on (band, bucket), a uniform key. */
  def cosineNearDuplicates(embeddings: DataFrame, vecCol: String, idCol: String,
      threshold: Double, dim: Int, bands: Int = 16, bitsPerBand: Int = 6): DataFrame = {
    // cached: (id, vec, norm) feeds the bucketing pass and both verify
    // sides; precomputing the norm halves the per-pair verify cost
    val e = OperatorCaches.cached(
      embeddings.select(col(idCol).as("__id"), col(vecCol).as("__vec"))
        .withColumn("__norm", norm(col("__vec"))))
    def bandBucket(b: Int): Column =
      (0 until bitsPerBand).map { j =>
        when(projectOnPlane(col("__vec"), b * bitsPerBand + j, dim) >= 0,
          shiftleft(lit(1L), j)).otherwise(lit(0L))
      }.reduce((x, y) => x.bitwiseOR(y))
    val banded = e.select(col("__id"),
      posexplode(array((0 until bands).map(bandBucket): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("__id").as("id_a"), col("band"), col("bucket"))
    val b = banded.select(col("__id").as("id_b"), col("band"), col("bucket"))
    val cand = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(e.select(col("__id").as("id_a"), col("__vec").as("__va"),
        col("__norm").as("__na")), "id_a")
      .join(e.select(col("__id").as("id_b"), col("__vec").as("__vb"),
        col("__norm").as("__nb")), "id_b")
      .withColumn("cosine", dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Bucketed ANN: exact cosine only within the query's bucket.
    * Recall is tunable via `bits` (fewer bits → bigger buckets). */
  def lshTopKCosine(embeddings: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int, dim: Int, bits: Int = 8): DataFrame = {
    val bucketed = embeddings.withColumn("bucket", lshBucket(col(vecCol), dim, bits))
    // compute the query's bucket driver-side with the same weights
    val qBucket = (0 until bits).map { p =>
      val proj = (0 until dim).map(d => query(d).toDouble * planeWeight(p, d)).sum
      if (proj >= 0) 1L << p else 0L
    }.reduce(_ | _)
    val q = array(query.toIndexedSeq.map(v => lit(v.toDouble)): _*)
    bucketed.filter(col("bucket") === qBucket)
      .withColumn("cosine", cosine(col(vecCol), q))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** E3 — deterministic ±1 Johnson–Lindenstrauss sign matrix
    * (Achlioptas, "Database-friendly random projections", PODS'01 —
    * public literature): entry (k, j) is the low bit of
    * md5("graft-jl-k-j"), a PUBLIC seeded constant any engine can
    * reproduce (the oracle SQL interpolates the same literals). */
  def jlSigns(dimIn: Int, dimOut: Int): Array[Array[Double]] =
    Array.tabulate(dimOut, dimIn) { (k, j) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-jl-$k-$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }

  /** E3 — project an embedding to `signs.length` dims: p_k = Σ_j
    * s_kj·v_j, each component one [[VectorExpressions.arrayDot]]
    * against a literal sign row (index-order accumulation — the
    * IEEE-pinned kernel the cosine paths already use). 16 dims keep
    * ~90% of cosine contrast at 1/4 the bytes — the shuffle-diet
    * transform before a 100 TB all-pairs similarity pass. */
  def jlProject(vec: Column, signs: Array[Array[Double]]): Column =
    array(signs.toIndexedSeq.map(row =>
      dot(vec, array(row.toIndexedSeq.map(lit(_)): _*))): _*)

  /** E3 — HARD-NEGATIVE mining for contrastive training (standard
    * practice in embedding-model training; e.g. dense-retrieval
    * literature, Karpukhin et al. 2020 — public): for every anchor,
    * the k most-similar items with a DIFFERENT label — the negatives
    * that actually teach the model, where random negatives are
    * trivially separable. Returns (anchor_id, neg_id, rank, cosine).
    *
    * Scale: this is the exact form (all label-mismatched pairs,
    * per-anchor rank window — anchor-keyed, skew-free). At corpus
    * scale, pre-bucket both sides with [[lshBucket]] and join on the
    * bucket id first: same output contract on the candidate set,
    * 2^bits fewer pairs. */
  def hardNegatives(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val a = df.select(col(idCol).as("anchor_id"), col(labelCol).as("__la"),
      col(vecCol).as("__va"))
    val b = df.select(col(idCol).as("neg_id"), col(labelCol).as("__lb"),
      col(vecCol).as("__vb"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cosine").desc, col("neg_id").asc)
    a.join(b, col("anchor_id") =!= col("neg_id") && col("__la") =!= col("__lb"))
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("anchor_id"), col("neg_id"), col("rank"), col("cosine"))
  }

  /** E3/E7 — MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell &
    * Goldstein, SIGIR'98 — public literature): greedily pick k results
    * maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked —
    * THE standard diversity pass between a similarity search and a RAG
    * context window (top-k cosine alone returns k near-copies of the
    * best hit; MMR trades raw relevance for coverage).
    *
    * Determinism contract: relevance and pairwise cosines quantize to
    * micro-units by floor(c·10⁶) (floor is IEEE-portable; the doubles
    * fold index-order like q44), and the greedy score is the exact
    * integer lamNum·rel_u − (lamDen−lamNum)·maxsim_u (λ scaled away —
    * argmax-invariant), ties broken on ascending id. A recursive-CTE
    * oracle replays every round bit-for-bit.
    *
    * Scale: the INPUT is an upstream top-N candidate list (N ~ 100s —
    * the [[topKCosine]] output), never the corpus; the k greedy rounds
    * run k bounded passes with a 1-row driver collect each (the
    * ucb/kriging bounded-driver regime). The pairwise sim matrix is
    * N² ≤ 10⁴ integers. Returns the picked rows:
    * (pick_order, id, rel_u, maxsim_u, mmr_score). */
  def mmrRerank(candidates: DataFrame, idCol: String, relCol: String,
      vecCol: String, k: Int, lamNum: Long, lamDen: Long): DataFrame = {
    require(k >= 1, "k >= 1")
    require(lamNum >= 0 && lamDen > 0 && lamNum <= lamDen,
      "lambda num/den must satisfy 0 <= num <= den")
    graft.plans.Guardrails.expect("single_partition_window", "__ord",
      "mmrRerank: top-N candidate-list ordinal (bounded by upstream k)",
    "k-literal")
    graft.plans.Guardrails.expect("cartesian_join", "__v, __ord",
      "mmrRerank: N x N sim matrix over the bounded candidate list",
    "k-literal")
    // ordinal over the BOUNDED candidate list; sims indexed by ordinal
    val base = candidates.select(col(idCol).cast("long").as("__id"),
        floor(col(relCol) * 1e6).cast("long").as("rel_u"),
        col(vecCol).as("__v"))
      .withColumn("__ord", row_number().over(Window.orderBy(col("__id"))))
      .localCheckpoint()
    val pairs = base.alias("a").join(base.alias("b"), lit(true))
      .select(col("a.__ord").as("__oa"), col("b.__ord").as("__ob"),
        floor(cosine(col("a.__v"), col("b.__v")) * 1e6).cast("long").as("__s"))
    val withSims = base.join(
        pairs.groupBy(col("__oa"))
          .agg(transform(array_sort(collect_list(struct(col("__ob"), col("__s")))),
            x => x.getField("__s")).as("__sims")),
        col("__ord") === col("__oa"))
      .select(col("__id"), col("rel_u"), col("__ord"), col("__sims"))
      .localCheckpoint()
    var selected = List.empty[(Int, Long, Long, Long, Long)] // ord,id,rel,maxsim,score
    val n = withSims.count().toInt
    var i = 0
    while (i < math.min(k, n)) {
      val selOrds = selected.map(_._1)
      // max over SELECTED only (no 0 floor: all-negative sims keep
      // their true max, the textbook formula)
      val maxSim = selOrds.map(o => element_at(col("__sims"), o)) match {
        case Nil => lit(0L) // first pick: no diversity term at all
        case one :: Nil => one
        case many => greatest(many: _*)
      }
      val pick = withSims
        .filter(!col("__ord").isin(selOrds: _*))
        .withColumn("__ms", maxSim)
        .withColumn("__score",
          lit(lamNum) * col("rel_u") - lit(lamDen - lamNum) * col("__ms"))
        .orderBy(col("__score").desc, col("__id").asc)
        .limit(1).collect()(0)
      selected ::= ((pick.getAs[Int]("__ord"), pick.getAs[Long]("__id"),
        pick.getAs[Long]("rel_u"), pick.getAs[Long]("__ms"),
        pick.getAs[Long]("__score")))
      i += 1
    }
    val spark = candidates.sparkSession
    import spark.implicits._
    selected.reverse.zipWithIndex
      .map { case ((_, id, rel, ms, sc), ord) => (ord + 1L, id, rel, ms, sc) }
      .toDF("pick_order", "id", "rel_u", "maxsim_u", "mmr_score")
  }
  /** ML/E3 — rank-1 alternating-least-squares matrix factorization
    * (Koren, Bell & Volinsky 2009, the ALS family at its smallest
    * useful rank): factor the (user, item, rating) matrix as
    * r̂_ui ≈ u_i·v_j by alternating the exact least-squares scalar
    * updates
    *   u_i = Σ_j r_ij·v_j / Σ_j v_j²,   v_j = Σ_i r_ij·u_i / Σ_i u_i²
    * from a uniform item start. The rank-1 factor is the "market
    * size" axis every recommender baseline needs (and the building
    * block of deflation-based higher ranks).
    *
    * Determinism contract: factors live on the integer MICRO grid —
    * each update is one decimal(38,0) truncating division of exact
    * integer sums (ratings positive ⇒ factors stay positive ⇒
    * truncation matches the oracle's `//`), so the whole trajectory
    * is bit-portable and a recursive CTE replays it.
    *
    * Returns one row per item: (item, factor_micro, n_users) — the
    * final item-side factor and its rating count.
    *
    * Scale: the edge rollup is ONE fact pass (map-side combine); each
    * half-step is ONE node-keyed equi-join + ONE node-keyed agg on
    * the edge list — uniform hash keys, fixed rounds, no driver
    * traffic. The exact shuffle shape of [[graft.ext.Graph.pageRank]]
    * with a different numerator. */
  def als1Factor(ratings: DataFrame, userCol: Column, itemCol: Column,
      valueCol: Column, iters: Int = 3,
      bcastPairMax: Long = graft.core.Gates.BcastRowsMax): DataFrame = {
    require(iters >= 1 && iters <= 32, "1 <= iters <= 32")
    val d38 = "decimal(38,0)"
    val e = ratings.select(userCol.cast("long").as("__u"),
        itemCol.cast("long").as("__i"), valueCol.cast("long").as("__r"))
      .filter(col("__r") > 0)
      .groupBy(col("__u"), col("__i")).agg(sum(col("__r")).as("__r"))
      .localCheckpoint()
    // ADAPTIVE per-round strategy (the Graph.pageRank device): the
    // factor frames are ITEM/USER-sized while the rollup is PAIR-sized
    // — below a rollup-count gate (items and users are each ≤ the pair
    // count) every half-step BROADCASTS its factor frame and the
    // rollup is only scanned, zero per-round rollup exchanges (guide
    // §3.1); above it the two half-steps join on DIFFERENT keys, so
    // one checkpoint-pinned copy per key (localCheckpoint keeps the
    // layout without the InMemoryRelation columnar tax) makes each
    // sort-merge join exchange-free on the rollup side (guide §2.4).
    val bcast = e.count() <= bcastPairMax
    def side(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    val np = e.sparkSession.sparkContext.defaultParallelism
    val eI = if (bcast) e
      else e.repartition(np, col("__i")).sortWithinPartitions("__i")
        .localCheckpoint()
    val eU = if (bcast) e
      else e.repartition(np, col("__u")).sortWithinPartitions("__u")
        .localCheckpoint()
    var v = eI.select(col("__i")).distinct()
      .withColumn("__f", lit(1000000L))
    var it = 0
    while (it < iters) {
      val u = eI.join(side(v), "__i")
        .groupBy(col("__u"))
        .agg(sum(col("__r").cast(d38) * col("__f").cast(d38)).cast(d38)
          .as("__num"),
          sum(col("__f").cast(d38) * col("__f").cast(d38)).cast(d38)
            .as("__den"))
        .select(col("__u"),
          expr("cast((__num * 1000000000000) div __den as long)").as("__f"))
      v = eU.join(side(u), "__u")
        .groupBy(col("__i"))
        .agg(sum(col("__r").cast(d38) * col("__f").cast(d38)).cast(d38)
          .as("__num"),
          sum(col("__f").cast(d38) * col("__f").cast(d38)).cast(d38)
            .as("__den"))
        .select(col("__i"),
          expr("cast((__num * 1000000000000) div __den as long)").as("__f"))
      if ((it + 1) % 4 == 0 && it < iters - 1) v = v.localCheckpoint()
      it += 1
    }
    val counts = eI.groupBy(col("__i")).agg(count(lit(1)).as("n_users"))
    v.join(counts, "__i")
      .select(col("__i").as("item"), col("__f").as("factor_micro"),
        col("n_users"))
  }

  /** md5-digit token embedding shared by the MaxSim rerankers: dim j
    * = hex digit j of md5(token), minus 8 — ONE definition, so the
    * gated and pass-through plans can never drift apart. */
  private def tokVec(tok: Column): Column =
    transform(sequence(lit(1), lit(8)),
      j => conv(substring(md5(tok), j, lit(1)), 16, 10)
        .cast("long") - 8L)

  /** E3+ — LATE-INTERACTION MaxSim reranking (the ColBERT scoring
    * shape, Khattab & Zaharia SIGIR'20 — public literature — with an
    * EXACT integer token embedding in place of a learned one): every
    * token maps to an 8-dim integer vector read off its md5 hex digits
    * (digit − 8 per dim — deterministic, language-free, and exactly
    * replayable on any engine), and a candidate document scores
    *   maxsim(q, d) = Σ_{DISTINCT query tokens} max_{doc tokens} ⟨qv, dv⟩
    * (a repeated query token contributes ONCE — the oracle-pinned
    * convention; ColBERT's occurrence-summed variant differs only on
    * queries with duplicate tokens).
    * Candidates are gated by a shared-token equi-join (swap in an
    * ANN/BM25 gate upstream at scale — the reranker takes whatever
    * candidate list arrives); only the first `maxDocTokens` tokens of
    * each document participate (the ColBERT doc-length dial).
    *
    * Returns (query_id, rank, doc_id, maxsim) — topK per query, ties
    * to the smaller doc id.
    *
    * Scale: cost = |candidates| · |q tokens| · maxDocTokens exact-long
    * dot products inside one codegen span (zip_with + aggregate), then
    * two keyed aggs and a per-query TakeOrdered. No pair space beyond
    * the gated candidates. */
  def maxsimRerank(docs: DataFrame, idCol: Column, textCol: Column,
      queries: Seq[(String, String)], maxDocTokens: Int,
      topK: Int): DataFrame = {
    require(maxDocTokens >= 1 && topK >= 1, "maxDocTokens/topK >= 1")
    val spark = docs.sparkSession
    import org.apache.spark.sql.expressions.Window
    val qRows = queries.flatMap { case (qid, qtext) =>
      qtext.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
        .map(t => (qid, t))
    }
    import spark.implicits._
    val q = qRows.toDF("query_id", "qtok")
      .withColumn("qv", tokVec(col("qtok")))
      .localCheckpoint() // literal-sized; feeds gate + scoring
    val dtok = docs
      .select(idCol.cast("long").as("doc_id"),
        posexplode(split(lower(textCol), "\\s+")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "" && col("pos") < maxDocTokens)
      .withColumn("dv", tokVec(col("tok")))
    val cand = dtok.select(col("doc_id"), col("tok"))
      .join(broadcast(q.select(col("query_id"), col("qtok").as("tok"))
        .distinct()), Seq("tok"))
      .select(col("query_id"), col("doc_id")).distinct()
    val dots = cand
      .join(dtok, Seq("doc_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("dot", aggregate(
        zip_with(col("qv"), col("dv"), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x))
    val best = dots.groupBy(col("query_id"), col("doc_id"), col("qtok"))
      .agg(max(col("dot")).as("best"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("best")).as("maxsim"))
    best.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("maxsim").desc, col("doc_id"))))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("maxsim"))
  }

  /** E3+/E7 — the PRODUCTION retrieval pipeline: sparse BM25 GATE →
    * late-interaction MaxSim RERANK (the two-stage architecture every
    * modern retrieval stack runs: a cheap recall stage bounds the
    * candidate set, the expensive reranker touches only survivors).
    * The gate scores with [[Curation.bm25FromPostings]]' exact
    * micro-quantized arithmetic over the DISTINCT terms of each query
    * and keeps the top `gateK` docs per query (ties to the smaller doc
    * id); the reranker is [[maxsimRerank]]'s md5-digit MaxSim over
    * ONLY the gated pairs.
    *
    * Returns (query_id, rank, doc_id, maxsim, bm25_u) — topK per
    * query, rank by (maxsim desc, doc_id); bm25_u is the gate score in
    * integer micro units.
    *
    * Scale: the reranker's cost is gateK · |q tokens| · maxDocTokens
    * dot products per query — a LITERAL bound independent of corpus
    * size (the answer to q500's pass-through-gate dial: at 100 TB you
    * run THIS composed plan). The gate is q79's postings shape:
    * term-filtered scan, broadcast df/stats, one doc-keyed shuffle. */
  def gatedMaxsimRerank(docs: DataFrame, idColName: String,
      textColName: String, queries: Seq[(String, String)], gateK: Int,
      maxDocTokens: Int, topK: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(gateK >= 1 && maxDocTokens >= 1 && topK >= 1,
      "gateK/maxDocTokens/topK >= 1")
    val spark = docs.sparkSession
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // ---- gate: per-query BM25 over the postings shape ----
    val qTermRows = queries.flatMap { case (qid, qtext) =>
      qtext.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
        .map(t => (qid, t))
    }
    val qTerms = qTermRows.toDF("query_id", "term")
    val allTerms = qTermRows.map(_._2).distinct
    val postings = Curation.buildPostings(docs, textColName, idColName)
      .withColumn("doc_id", col(idColName).cast("long"))
    val stats = Curation.postingsStats(postings, "doc_id")
    val tf = postings.filter(col("term").isin(allTerms: _*))
    val dfreq = tf.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val contrib = tf.join(broadcast(qTerms), "term")
      .join(broadcast(dfreq), "term").crossJoin(broadcast(stats))
      .withColumn("__contrib_u", Curation.bm25ContribU(k1, b))
    val gate = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__contrib_u")).as("bm25_u"))
      .withColumn("__g", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("bm25_u").desc, col("doc_id"))))
      .filter(col("__g") <= gateK)
      .select(col("query_id"), col("doc_id"), col("bm25_u"))
    // ---- rerank: MaxSim over the gated pairs only ----
    val qRows = queries.flatMap { case (qid, qtext) =>
      qtext.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
        .map(t => (qid, t))
    }
    val q = qRows.toDF("query_id", "qtok")
      .withColumn("qv", tokVec(col("qtok")))
    val dtok = docs
      .select(col(idColName).cast("long").as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textColName))).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "" && col("pos") < maxDocTokens)
    // doc-token embeddings are computed AFTER the gate join — md5 work
    // is gateK-bounded, never corpus-linear (the whole point of the
    // two-stage plan; computing dv on dtok before the join would md5
    // every document's tokens)
    val dots = gate
      .join(dtok, Seq("doc_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("dot", aggregate(
        zip_with(col("qv"), tokVec(col("tok")), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x))
    val best = dots.groupBy(col("query_id"), col("doc_id"),
        col("bm25_u"), col("qtok"))
      .agg(max(col("dot")).as("best"))
      .groupBy(col("query_id"), col("doc_id"), col("bm25_u"))
      .agg(sum(col("best")).as("maxsim"))
    best.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("maxsim").desc, col("doc_id"))))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("maxsim"), col("bm25_u"))
  }
}
