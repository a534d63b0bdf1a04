package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E3+ — feature-space operators over embedding columns: fixed-
  * iteration integer k-means (the semantic-clustering step a corpus
  * pipeline runs between near-dup removal and mixture balancing) and
  * the exact dimension correlation matrix (the redundancy screen run
  * before distance-based anything).
  *
  * Both quantize the float vectors to micro-units ONCE and then stay
  * in 64-bit/decimal integer arithmetic, so results are bit-identical
  * under any partitioning and any engine unrolling the same steps —
  * float k-means can't even reproduce itself across two of its own
  * runs on a cluster (reduce-order-dependent centroid sums).
  */
object Clustering {

  // ---- by-design plan-hazard documentation (Guardrails.expect) ------
  // Each entry registers a deliberately-BOUNDED single-partition window
  // or unconditioned join this object builds, with its boundedness
  // argument, so the optimizer audit (PlanAudit / the Guardrails rule)
  // flags only NEW hazards instead of letting them hide among known
  // ones. Markers are operator-owned columns of the hazard plan node.
  graft.plans.Guardrails.expect("single_partition_window",
    "_we0, id", "kMeansInt: nC-row centroid seeding (bounded by k)",
    "k-literal")



  /** Quantize a float-array column to micro-unit longs (×10⁶,
    * half-away-from-zero — Spark round and DuckDB round agree). */
  def microQuantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1e6, 0).cast("long"))

  /** Lloyd's k-means, `iters` FIXED iterations, all-integer:
    * distances are Σ(q−c)² over micro-unit longs, assignment breaks
    * ties on the lower cluster id, and centroid updates use the
    * TRUNCATING integer mean (Spark `div` and DuckDB `//` both
    * truncate toward zero, so negative sums agree too). Init = the k
    * lowest-id vectors; an emptied cluster keeps its previous
    * centroid. Fixed rounds → a pure function of the input (the
    * q100/q134 determinism contract) — an engine unrolling the same
    * rounds as chained CTEs agrees bit-for-bit even before
    * convergence. Returns (id, cluster, dist2) — dist2 the exact
    * squared distance to the winning centroid in micro².
    *
    * Scale: points live in LONG FORM (id, dim, q), checkpointed once
    * and re-read per round; a round is one broadcast-joined distance
    * agg keyed on (id, cluster) + one (cluster, dim) mean agg —
    * centroids are k·d rows and always broadcast. The k×d cost per
    * point per round is Lloyd's lower bound; nothing here shuffles
    * the points more than once per round. */
  def kMeansInt(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1, "k and iters must be >= 1")
    val pts = vectors.select(col(idCol).cast("long").as("id"),
        posexplode(microQuantize(col(vecCol))).as(Seq("d", "q")))
      .localCheckpoint() // re-read every round
    val initIds = pts.select(col("id")).distinct()
      .orderBy(col("id")).limit(k)
      .withColumn("ck", (row_number().over(Window.orderBy(col("id"))) - 1)
        .cast("long"))
    var centroids = pts.join(initIds, "id")
      .select(col("ck"), col("d"), col("q").as("c"))
      .localCheckpoint()
    def assigned(cs: DataFrame): DataFrame = {
      val dist = pts.join(broadcast(cs), "d")
        .groupBy(col("id"), col("ck"))
        .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("dist2"))
      dist.withColumn("__rn", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("dist2"), col("ck"))))
        .filter(col("__rn") === 1)
        .select(col("id"), col("ck"), col("dist2"))
    }
    var i = 0
    while (i < iters) {
      val assign = assigned(centroids)
      // TRUNCATING mean: Spark `div` and DuckDB `//` both truncate
      // toward zero (including on negative sums), so the centroid
      // update is engine-exact without any floor adjustment
      val updated = pts.join(assign.select(col("id"), col("ck")), "id")
        .groupBy(col("ck"), col("d"))
        .agg(expr("sum(q) div count(1)").as("__u"))
      centroids = centroids
        .join(updated, Seq("ck", "d"), "left")
        .select(col("ck"), col("d"), coalesce(col("__u"), col("c")).as("c"))
        .localCheckpoint()
      i += 1
    }
    assigned(centroids).select(col("id"), col("ck").as("cluster"), col("dist2"))
  }

  /** E3+/E6 — SemDeDup (Abbas et al., "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication", 2023):
    * semantic near-duplicate removal by CLUSTER-then-PRUNE — k-means
    * the embeddings ([[kMeansInt]], fixed integer rounds), then
    * compare pairs only WITHIN a cluster and drop every doc whose
    * cosine to a LOWER-id cluster-mate reaches τ (keep-first, the U2
    * discipline; the connected-components variant is Graph.scala's
    * job). The cosine test stays in exact integer arithmetic: with
    * micro-quantized vectors, cos(a,b) ≥ τ (τ > 0) ⟺
    * dot > 0 ∧ dot²·tauDenSq ≥ tauNumSq·‖a‖²·‖b‖² where
    * τ² = tauNumSq/tauDenSq — DECIMAL(38,0) products, no sqrt, no
    * float compare (|dot| ≤ 64·10¹⁴ for unit-ish vectors, so dot²
    * ≤ 4·10³¹ and the ×tauDenSq product stays under 10³⁸ for
    * tauDenSq ≤ 10⁴).
    *
    * Returns one row per REMOVED doc: (id, cluster, kept_by = lowest
    * near-dup partner id, n_dups = near-dup partners with lower id).
    *
    * Scale: the published SemDeDup design — cluster count grows with
    * the corpus so cluster population is bounded, and the quadratic
    * pair join runs per cluster key (uniform-ish shuffle; AQE
    * skew-split on lopsided clusters), never corpus×corpus. The
    * k-means pass is the [[kMeansInt]] cost; everything after is one
    * self-join keyed on `cluster` + one (id)-keyed rollup. */
  def semanticDedup(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, tauNumSq: Long, tauDenSq: Long): DataFrame = {
    require(tauNumSq > 0 && tauDenSq > 0 && tauNumSq <= tauDenSq,
      "require 0 < tauNumSq <= tauDenSq (tau^2 as a fraction)")
    require(tauDenSq <= 10000L, "tauDenSq <= 1e4 keeps dot^2*den < 1e38")
    val d38 = "decimal(38,0)"
    val q = vectors.select(col(idCol).cast("long").as("id"),
      microQuantize(col(vecCol)).as("qv"))
    val clusters = kMeansInt(vectors, idCol, vecCol, k, iters)
      .select(col("id"), col("cluster"))
    // cached: one row per doc (id, cluster, qv, ‖qv‖²) — referenced by
    // both sides of the within-cluster pair join (aliases defeat
    // exchange reuse), and the k-means DAG above it is multi-round
    val cd = graft.core.OperatorCaches.cached(
      q.join(clusters, "id")
        .withColumn("n2", aggregate(col("qv"),
          lit(0).cast(d38), (acc, x) => acc + x.cast(d38) * x.cast(d38))))
    val a = cd.select(col("cluster"), col("id").as("id_a"),
      col("qv").as("qa"), col("n2").as("n2a"))
    val b = cd.select(col("cluster"), col("id").as("id_b"),
      col("qv").as("qb"), col("n2").as("n2b"))
    val dup = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dot", aggregate(
        zip_with(col("qa"), col("qb"), (x, y) => x.cast(d38) * y),
        lit(0).cast(d38), (acc, v) => acc + v))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit(tauDenSq) >=
          lit(tauNumSq).cast(d38) * col("n2a") * col("n2b"))
    dup.groupBy(col("cluster"), col("id_b").as("id"))
      .agg(min(col("id_a")).as("kept_by"), count(lit(1)).as("n_dups"))
      .select(col("id"), col("cluster"), col("kept_by"), col("n_dups"))
  }

  /** E3+/E6 — greedy k-center coreset selection (Gonzalez 1985
    * farthest-point traversal — the diversity-sampling step coreset
    * and active-learning pipelines run over embeddings): start from
    * the lowest-id vector, then repeatedly select the point FARTHEST
    * from the already-selected set (max over points of min squared
    * distance to any center, ties to the lower id). All-integer over
    * micro-quantized vectors, fixed k rounds — a pure function of the
    * input that an engine unrolling the same rounds replays exactly.
    * Returns (sel_order, id, dist2) — dist2 the point's min squared
    * distance to the prior selection at pick time (0 for the seed);
    * the k-th row's dist2 is the corpus covering radius estimate.
    *
    * Scale: the running min-distance column makes each round ONE
    * broadcast-1-row crossJoin + least() update over the points (no
    * pairwise anything) and one TakeOrdered(1) argmax; k rounds is
    * the only sequential axis — O(n·k·dim) total work, the
    * farthest-point lower bound. */
  def kCenterSelect(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    def d2(a: Column, b: Column): Column = aggregate(
      zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    var cur = vectors.select(col(idCol).cast("long").as("id"),
        microQuantize(col(vecCol)).as("qv"))
      .withColumn("__mind", lit(Long.MaxValue))
      .localCheckpoint()
    var center = cur.orderBy(col("id")).limit(1)
      .select(col("id").as("__cid"), col("qv").as("__cqv"),
        lit(0L).as("__cd"))
    val out = scala.collection.mutable.ArrayBuffer(
      center.select(lit(1L).as("sel_order"), col("__cid").as("id"),
        col("__cd").as("dist2")))
    var r = 2
    while (r <= k) {
      cur = cur.crossJoin(broadcast(center.select(col("__cid"), col("__cqv"))))
        .filter(col("id") =!= col("__cid"))
        .withColumn("__mind", least(col("__mind"), d2(col("qv"), col("__cqv"))))
        .select(col("id"), col("qv"), col("__mind"))
        .localCheckpoint() // bounds plan depth across rounds
      center = cur.orderBy(col("__mind").desc, col("id")).limit(1)
        .select(col("id").as("__cid"), col("qv").as("__cqv"),
          col("__mind").as("__cd"))
      out += center.select(lit(r.toLong).as("sel_order"),
        col("__cid").as("id"), col("__cd").as("dist2"))
      r += 1
    }
    out.reduce(_ unionByName _)
  }

  /** E3+/A-eval — MAUVE-lite (the discrete divergence core of
    * Pillutla et al., "MAUVE: Measuring the Gap Between Neural Text
    * and Human Text using Divergence Frontiers", NeurIPS 2021):
    * cluster the POOLED embeddings of two text sets (P = model
    * generations, Q = human reference) with fixed-round integer
    * k-means, histogram each set over the shared clusters, and score
    * the smoothed Jensen-Shannon divergence between the histograms —
    * the quantized-support proxy MAUVE builds its frontier from.
    * Returns one row per cluster: (cluster, n_p, n_q, js_u) with
    * js_u the cluster's micro-nat JS contribution
    * [p·ln(p/m) + q·ln(q/m)]/2 over Laplace-smoothed shares — every
    * input to the ln is a ratio of exact integers, so both engines
    * quantize identically (q69 discipline). Σ js_u ≈ 0 ⟺ the model
    * text is embedding-indistinguishable from the reference.
    *
    * Scale: the k-means pass dominates ([[kMeansInt]]); the histogram
    * is one (cluster)-keyed agg with map-side combine and the finish
    * is k rows. The distribution-gap readout for generation QA at any
    * corpus size. */
  def mauveLite(vectors: DataFrame, idCol: String, vecCol: String,
      isP: Column, k: Int, iters: Int): DataFrame = {
    val flags = vectors.select(col(idCol).cast("long").as("id"),
      isP.cast("boolean").as("__p"))
    val hist = kMeansInt(vectors, idCol, vecCol, k, iters)
      .join(flags, "id")
      .groupBy(col("cluster"))
      .agg(sum(when(col("__p"), 1L).otherwise(0L)).as("n_p"),
        sum(when(col("__p"), 0L).otherwise(1L)).as("n_q"))
    val totals = hist.agg(sum(col("n_p")).as("__np"), sum(col("n_q")).as("__nq"))
    hist.crossJoin(broadcast(totals))
      .withColumn("__pp", (col("n_p") + 1).cast("double") /
        (col("__np") + k).cast("double"))
      .withColumn("__qq", (col("n_q") + 1).cast("double") /
        (col("__nq") + k).cast("double"))
      .withColumn("__m", (col("__pp") + col("__qq")) / 2)
      .withColumn("js_u", round((
        col("__pp") * log(col("__pp") / col("__m")) +
        col("__qq") * log(col("__qq") / col("__m"))) / 2 * 1e6, 0).cast("long"))
      .select(col("cluster"), col("n_p"), col("n_q"), col("js_u"))
  }

  /** E3+/A1 — embedding anisotropy audit (the common-mean-direction
    * diagnostic of Mu & Viswanath, "All-but-the-Top: Simple and
    * Effective Postprocessing for Word Representations", ICLR 2018):
    * per slice, the share of total vector energy captured by the MEAN
    * direction — aniso_ppm = 10⁶·‖Σx‖² / (n·Σ‖x‖²). Healthy
    * (centered, isotropic) embedding spaces sit near 0; a large value
    * means every cosine is inflated by a shared component and
    * retrieval/dedup thresholds are miscalibrated until the mean is
    * subtracted. All integer: micro-quantized components, exact
    * DECIMAL(38,0) sums, one floor division. Returns per slice:
    * (slice, n, sum_norm2, aniso_ppm).
    *
    * Scale: one posexplode + (slice, dim) agg with map-side combine →
    * a |slices|·dims rollup; the finish is |slices| rows. The
    * embedding-health gate run before trusting any cosine op. */
  def embeddingIsotropy(vectors: DataFrame, sliceCol: Column,
      vecCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val comps = vectors.select(sliceCol.as("slice"),
      posexplode(microQuantize(vecCol)).as(Seq("__d", "__q")))
    val perDim = comps.groupBy(col("slice"), col("__d")).agg(
      sum(col("__q")).cast(d38).as("__s"),
      sum(col("__q").cast(d38) * col("__q").cast(d38)).cast(d38).as("__qq"),
      count(lit(1)).as("__n"))
    perDim.groupBy(col("slice")).agg(
        max(col("__n")).as("n"), // rows per dim == vector count
        sum(col("__s") * col("__s")).cast(d38).as("__mu2"),
        sum(col("__qq")).cast(d38).as("__sn2"))
      .select(col("slice"), col("n"),
        col("__sn2").cast("long").as("sum_norm2"),
        expr("CAST((1000000 * __mu2) div (n * __sn2) AS BIGINT)")
          .as("aniso_ppm"))
  }

  /** Exact dimension correlation matrix over the first `dims` vector
    * components (upper triangle i ≤ j): per pair, the scaled
    * co-moment SPP = n·Σxy − Σx·Σy in DECIMAL(38,0), then
    * corr = SPP_ij / (√SPP_ii · √SPP_jj) — the q82 closed form lifted
    * to a matrix. The pair explode is dims²-bounded per row (never
    * |rows|²); the ÷ and √ are IEEE correctly-rounded over identical
    * exact operands, so the matrix hash-compares UNROUNDED.
    *
    * Scale: one explode + one (i, j)-keyed agg with map-side partials;
    * the diagonal joins back from a broadcast |dims|-row frame. The
    * feature-redundancy screen at any corpus size. */
  def correlationMatrix(vectors: DataFrame, vecCol: String,
      dims: Int): DataFrame = {
    require(dims >= 2, "dims must be >= 2")
    val d38 = "decimal(38,0)"
    val pairs = vectors
      .select(microQuantize(col(vecCol)).as("__q"))
      .select(explode(expr(
        s"""flatten(transform(sequence(0, ${dims - 1}), i ->
           |  transform(sequence(i, ${dims - 1}), j ->
           |    struct(i, j, element_at(__q, i + 1) AS x,
           |      element_at(__q, j + 1) AS y))))""".stripMargin)).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"),
        col("p.x").as("x"), col("p.y").as("y"))
    val moments = pairs.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast(d38) * col("y")).as("sxy"))
      .withColumn("spp", (col("n").cast(d38) * col("sxy") -
        col("sx").cast(d38) * col("sy")).cast(d38))
    val diag = moments.filter(col("i") === col("j"))
      .select(col("i").as("__k"), col("spp").cast("double").as("__sppk"))
    moments
      .join(broadcast(diag.withColumnRenamed("__k", "i")
        .withColumnRenamed("__sppk", "__si")), "i")
      .join(broadcast(diag.withColumnRenamed("__k", "j")
        .withColumnRenamed("__sppk", "__sj")), "j")
      .select(col("i"), col("j"), col("n"), col("spp").cast("double").as("spp"),
        when(col("__si") > 0 && col("__sj") > 0,
          col("spp").cast("double") / (sqrt(col("__si")) * sqrt(col("__sj"))))
          .as("corr"))
  }

  /** E3+/A1 — dominant eigenvector of the feature-correlation matrix
    * by INTEGER power iteration (PCA's first component, von Mises
    * iteration — public literature): quantize the [[correlationMatrix]]
    * to micro-unit longs, then repeat
    *   w = C_u · v;   v = (w · 10⁶) div max|w|
    * for a fixed round count — matrix-vector products are exact
    * integer sums and the max-norm rescale is one integer division,
    * so the vector is bit-identical on any engine/partitioning and an
    * unrolled-CTE oracle can replay it. max|w| of the final round
    * estimates the top eigenvalue (v is max-normalized to 10⁶).
    * Returns (j, v_u, lambda_u) — dims rows.
    *
    * Scale: the expensive pass is correlationMatrix's co-moment scan;
    * iteration runs on the dims² broadcast-sized cell frame —
    * driver-free, rounds × (join + agg) over ≤ dims² rows. */
  def powerIterationInt(corr: DataFrame, dims: Int, rounds: Int,
      localDimsMax: Int = 128): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val d38 = "decimal(38,0)"
    val cells = corr
      .select(col("i").cast("int").as("i"), col("j").cast("int").as("j"),
        round(col("corr") * 1e6, 0).cast("long").as("c_u"))
    val fullPlan = cells.unionByName(
        cells.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("c_u")))
    val spark = corr.sparkSession
    // DRIVER KERNEL under the dims gate (the q411/q497 audit-slice
    // discipline — opt round 11): the chase state is dims² cells by
    // CONSTRUCTION (a caller literal, not data), yet the distributed
    // loop pays `rounds` join+agg+checkpoint stage barriers on a
    // ≤localDimsMax²-row frame — pure scheduling latency. One collect
    // of the quantized matrix, the identical integer recursion in
    // BigInt (≡ decimal(38,0)), one parallelize back. Above the gate
    // the distributed loop below runs unchanged (and a spec pins
    // driver ≡ distributed on the same matrices).
    if (dims <= localDimsMax) {
      val (v, mx) = PowerKernel.chase(
        PowerKernel.cellsOf(fullPlan.collect().toSeq), dims, rounds,
        _ => BigInt(1000000), zeroGuard = false)
      val lam = mx.map(m => (m / 1000000).toLong)
      val out = v.toSeq.sortBy(_._1).map { case (j, vu) =>
        org.apache.spark.sql.Row(j.toLong,
          vu.map(x => java.lang.Long.valueOf(x.toLong)).orNull,
          lam.map(java.lang.Long.valueOf).orNull)
      }
      return spark.createDataFrame(
        spark.sparkContext.parallelize(out, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("j",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("v_u",
            org.apache.spark.sql.types.LongType, nullable = true),
          org.apache.spark.sql.types.StructField("lambda_u",
            org.apache.spark.sql.types.LongType, nullable = true))))
    }
    val full = fullPlan.localCheckpoint() // re-read every round
    var v = spark.range(dims)
      .select(col("id").cast("int").as("j"), lit(1000000L).as("v_u"))
    var lambdaScale: DataFrame = null
    var r = 0
    while (r < rounds) {
      val w = full
        .join(v.select(col("j").as("i"), col("v_u").as("__vi")), "i")
        .groupBy(col("j"))
        .agg(sum(col("c_u").cast(d38) * col("__vi")).cast(d38).as("__w"))
      val mx = w.agg(max(abs(col("__w"))).cast(d38).as("__mx"))
      v = w.crossJoin(broadcast(mx))
        .select(col("j"),
          expr("(__w * 1000000) div __mx").as("v_u"))
        .localCheckpoint() // dims rows; bounds plan depth across rounds
      lambdaScale = mx
      r += 1
    }
    v.crossJoin(broadcast(
        lambdaScale.select(expr("__mx div 1000000").as("lambda_u"))))
      .select(col("j").cast("long").as("j"), col("v_u"), col("lambda_u"))
  }

  /** E3+/ML — TOP-2 PRINCIPAL COMPONENTS by power iteration WITH
    * DEFLATION (Hotelling 1933 deflation; Golub & Van Loan §8 — public
    * literature): the first component exactly as [[powerIterationInt]]
    * (integer micro state, max-normalized rounds), then the rank-one
    * deflation C₂ = C − λ₁·v₁v₁ᵀ carried out in EXACT integer
    * arithmetic — c₂(i,j) = c(i,j) − ⌊λ₁ᵤ·v₁ᵤ(i)·v₁ᵤ(j)/10¹²⌋ — and a
    * second identical power iteration on C₂. One quantized matrix,
    * two quantized chases: the whole trajectory is bit-identical under
    * any partitioning and replayable by a second engine. The second
    * eigenpair answers what PC1 alone cannot: is the embedding space
    * effectively 1-D (λ₂ ≪ λ₁ — q357's anisotropy read), or is there
    * real second structure worth a 2-D projection?
    * Returns (component ∈ {1,2}, j, v_u, lambda_u).
    *
    * Scale: the corpus touches only the co-moment scan upstream
    * ([[correlationMatrix]]); both chases run on the dims² broadcast
    * frame — 2·rounds joins of a dims²-row table. */
  def powerIterationTwo(corr: DataFrame, dims: Int, rounds: Int,
      localDimsMax: Int = 128): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val d38 = "decimal(38,0)"
    val spark = corr.sparkSession
    val cells = corr
      .select(col("i").cast("int").as("i"), col("j").cast("int").as("j"),
        round(col("corr") * 1e6, 0).cast("long").as("c_u"))
    val fullPlan = cells.unionByName(
        cells.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("c_u")))
    // DRIVER KERNEL under the dims gate — see [[powerIterationInt]]:
    // 2·rounds join+agg+checkpoint barriers on a dims²-row frame are
    // scheduling latency, not computation. Identical BigInt recursion
    // incl. the CASE-guarded zero-mx hold, the exact rank-one
    // deflation and the second tilted chase; distributed path
    // unchanged above the gate; spec pins driver ≡ distributed.
    if (dims <= localDimsMax) {
      val fullCells = PowerKernel.cellsOf(fullPlan.collect().toSeq)
      val (v1, mx1) = PowerKernel.chase(fullCells, dims, rounds,
        _ => BigInt(1000000), zeroGuard = true)
      val l1 = mx1.map(_ / 1000000)
      val n2vals = v1.values.flatten.toSeq
      val n2 = if (n2vals.isEmpty) None else Some(n2vals.map(x => x * x).sum)
      val deflated = fullCells.flatMap { case (i, j, c) =>
        // inner joins on v1(i) and v1(j): a missing key drops the row
        for { v1i <- v1.get(i); v1j <- v1.get(j) } yield {
          val sub = for { l <- l1; a <- v1i; b <- v1j; n <- n2 } yield {
            if (n == 0) throw new ArithmeticException(
              "[DIVIDE_BY_ZERO] Division by zero (rank-one deflation: " +
                "zero first-eigenvector norm)") // ANSI IntegralDivide
            l * a * b / n
          }
          (i, j, for { cv <- c; s <- sub } yield cv - s)
        }
      }
      val (v2, mx2) = PowerKernel.chase(deflated, dims, rounds,
        j => BigInt(1000000) + j, zeroGuard = true)
      def rowsOf(comp: Int, v: Map[Int, Option[BigInt]],
          mx: Option[BigInt]): Seq[org.apache.spark.sql.Row] = {
        val lam = mx.map(m => java.lang.Long.valueOf((m / 1000000).toLong))
        v.toSeq.sortBy(_._1).map { case (j, vu) =>
          org.apache.spark.sql.Row(comp, j.toLong,
            vu.map(x => java.lang.Long.valueOf(x.toLong)).orNull,
            lam.orNull)
        }
      }
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.parallelize(
          rowsOf(1, v1, mx1) ++ rowsOf(2, v2, mx2), 1),
        StructType(Seq(
          StructField("component", IntegerType, nullable = false),
          StructField("j", LongType, nullable = false),
          StructField("v_u", LongType, nullable = true),
          StructField("lambda_u", LongType, nullable = true))))
    }
    val full = fullPlan.localCheckpoint()
    def chase(mat: DataFrame, init: Column): (DataFrame, DataFrame) = {
      var v = spark.range(dims)
        .select(col("id").cast("int").as("j"), init.as("v_u"))
      var lambdaScale: DataFrame = null
      var r = 0
      while (r < rounds) {
        val w = mat
          .join(v.select(col("j").as("i"), col("v_u").as("__vi")), "i")
          .groupBy(col("j"))
          .agg(sum(col("c_u").cast(d38) * col("__vi")).cast(d38).as("__w"))
        val mx = w.agg(max(abs(col("__w"))).cast(d38).as("__mx"))
        // mx = 0 (zero matrix, or an init exactly orthogonal to every
        // remaining direction): hold a zero vector, not nulls
        v = w.crossJoin(broadcast(mx))
          .select(col("j"), expr("CASE WHEN __mx = 0 THEN 0L ELSE " +
            "(__w * 1000000) div __mx END").as("v_u"))
          .localCheckpoint()
        lambdaScale = mx
        r += 1
      }
      (v, lambdaScale)
    }
    // chase 1 starts all-ones (the q213 convention); chase 2 starts
    // with a deterministic index tilt — an untilted start can be
    // EXACTLY orthogonal to the second eigenvector (symmetric
    // matrices), freezing the iteration at zero
    val (v1, mx1) = chase(full, lit(1000000L))
    val l1 = mx1.select(expr("CAST(__mx div 1000000 AS BIGINT)").as("__l1"))
    // v₁ is ∞-normalized, NOT unit-2-norm: the rank-one subtraction
    // must divide by ‖v₁‖² = Σ v_u² (exact micro² integer), or the
    // deflation overshoots by that factor
    val n2 = v1.agg(sum(col("v_u").cast(d38) * col("v_u").cast(d38))
      .cast(d38).as("__n2"))
    val deflated = full
      .join(v1.select(col("j").as("i"), col("v_u").as("__v1i")), "i")
      .join(v1.select(col("j"), col("v_u").as("__v1j")), "j")
      .crossJoin(broadcast(l1)).crossJoin(broadcast(n2))
      .select(col("i"), col("j"),
        (col("c_u") - expr("CAST(CAST(__l1 AS decimal(38,0)) * __v1i " +
          "* __v1j div __n2 AS BIGINT)")).as("c_u"))
      .localCheckpoint()
    val (v2, mx2) = chase(deflated, lit(1000000L) + col("id"))
    def out(comp: Int, v: DataFrame, mx: DataFrame): DataFrame =
      v.crossJoin(broadcast(
          mx.select(expr("__mx div 1000000").as("lambda_u"))))
        .select(lit(comp).as("component"), col("j").cast("long").as("j"),
          col("v_u"), col("lambda_u"))
    out(1, v1, mx1).unionByName(out(2, v2, mx2))
  }

  /** E3/ML — label-centroid cosine audit over an embedding column:
    * for every pair of labels, the cosine between their class
    * centroids — the embedding-space health check run before trusting
    * labels for retrieval or dedup ("are 'news' and 'sports' actually
    * separated, or is the encoder collapsing them?"). High off-diagonal
    * cosines flag label pairs a nearest-centroid classifier will
    * confuse and a mixture-balancing pipeline will double-count.
    *
    * Determinism contract: components are micro-quantized to longs at
    * the scan (round(1e6·x) — float→double widening is exact, so both
    * engines quantize identically); per-(label, dim) sums are exact
    * DECIMAL(38,0); and because cos(Sa/na, Sb/nb) = cos(Sa, Sb) the
    * counts cancel — the finish is one dot/(√·√) over exact integers.
    * Returns one row per unordered label pair:
    * (label_a, label_b, n_a, n_b, cosine).
    *
    * Scale: one posexplode + (label, dim) agg with map-side combine →
    * a |labels|·dims rollup; the pair join is |labels|²·dims over that
    * broadcast-sized frame, never the vector table. */
  def labelCentroidCosines(df: DataFrame, vecCol: Column,
      labelCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val comps = df.select(labelCol.as("__l"),
        posexplode(vecCol).as(Seq("__d", "__x")))
      .select(col("__l"), col("__d"),
        round(col("__x").cast("double") * 1e6, 0).cast("long").as("__q"))
    val sums = comps.groupBy(col("__l"), col("__d"))
      .agg(sum(col("__q")).cast(d38).as("__s"))
      .localCheckpoint() // |labels|·dims rows; both pair sides read it
    val counts = df.groupBy(labelCol.as("__l")).agg(count(lit(1)).as("__n"))
      .localCheckpoint() // |labels| rows
    val a = sums.select(col("__l").as("__la"), col("__d"), col("__s").as("__sa"))
    val b = sums.select(col("__l").as("__lb"), col("__d"), col("__s").as("__sb"))
    val pair = a.join(b, Seq("__d")).filter(col("__la") < col("__lb"))
      .groupBy(col("__la"), col("__lb"))
      .agg(sum(col("__sa") * col("__sb")).cast(d38).as("__dot"),
        sum(col("__sa") * col("__sa")).cast(d38).as("__na2"),
        sum(col("__sb") * col("__sb")).cast(d38).as("__nb2"))
    pair
      .join(broadcast(counts.select(col("__l").as("__la"),
        col("__n").as("n_a"))), Seq("__la"))
      .join(broadcast(counts.select(col("__l").as("__lb"),
        col("__n").as("n_b"))), Seq("__lb"))
      .select(col("__la").as("label_a"), col("__lb").as("label_b"),
        col("n_a"), col("n_b"),
        round(col("__dot").cast("double") /
          (sqrt(col("__na2").cast("double")) *
            sqrt(col("__nb2").cast("double"))), 6).as("cosine"))
  }

  /** E3/ML — simplified silhouette of the LABEL partition
    * (Rousseeuw 1987 for the silhouette; the centroid-based
    * "simplified" form is the standard linear-cost variant — public
    * literature): per vector, a = distance to its own label centroid,
    * b = distance to the nearest OTHER label centroid,
    * s = (b − a)/max(a, b); averaged per label. The per-label
    * cohesion verdict that tells you WHICH labels in q284's cosine
    * audit are actually mixed (silhouette near 0 or negative) rather
    * than merely close.
    *
    * Determinism contract: components micro-quantized at the scan;
    * centroids are per-dim truncating integer means of the quantized
    * components; squared distances are exact DECIMAL(38,0); a and b
    * are single sqrts; b's argmin is an exact integer min over d²;
    * each vector's s is micro-quantized before the per-label integer
    * mean (integral div). Returns per label:
    * (label, n, mean_sil_micro).
    *
    * Scale: one posexplode + (label, dim) agg builds |labels|·dims
    * centroid cells (broadcast); per-vector distances to ALL k
    * centroids are a broadcast join + dim-grain agg — linear in
    * vectors·dims·k, never quadratic in vectors (the full silhouette's
    * fatal cost). */
  def labelSilhouette(df: DataFrame, idCol: Column, vecCol: Column,
      labelCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val comps = df.select(idCol.as("__id"), labelCol.as("__l"),
        posexplode(vecCol).as(Seq("__d", "__x")))
      .select(col("__id"), col("__l"), col("__d"),
        round(col("__x").cast("double") * 1e6, 0).cast("long").as("__q"))
    val cent = comps.groupBy(col("__l"), col("__d"))
      .agg(sum(col("__q")).as("__s"), count(lit(1)).as("__n"))
      .withColumn("__c", expr("__s div __n"))
      .select(col("__l").as("__cl"), col("__d"), col("__c"))
      .localCheckpoint() // |labels|·dims rows
    // every vector against every centroid: broadcast the centroid
    // frame, one (id, centroid-label) d² agg
    val d2 = comps.join(broadcast(cent), Seq("__d"))
      .groupBy(col("__id"), col("__l"), col("__cl"))
      .agg(sum((col("__q") - col("__c")).cast(d38) *
        (col("__q") - col("__c")).cast(d38)).cast(d38).as("__d2"))
    val own = d2.filter(col("__l") === col("__cl"))
      .select(col("__id"), col("__l"), col("__d2").as("__a2"))
    val other = d2.filter(col("__l") =!= col("__cl"))
      .groupBy(col("__id")).agg(min(col("__d2")).as("__b2"))
    own.join(other, Seq("__id"))
      .withColumn("__a", sqrt(col("__a2").cast("double")))
      .withColumn("__b", sqrt(col("__b2").cast("double")))
      .withColumn("__s_micro", when(greatest(col("__a"), col("__b")) > 0,
        round((col("__b") - col("__a")) / greatest(col("__a"), col("__b")) *
          1e6, 0).cast("long")).otherwise(0L))
      .groupBy(col("__l").as("label"))
      .agg(count(lit(1)).as("n"),
        expr("sum(__s_micro) div count(1)").as("mean_sil_micro"))
  }

  /** ML — DBSCAN over 2-D points (Ester, Kriegel, Sander & Xu, KDD'96
    * — public literature), fully deterministic: density clustering
    * with no k, the standard tool for spatial hotspots / sensor-fault
    * pockets / GPS stop detection. Semantics are the textbook ones:
    *   - a point is CORE when ≥ minPts points (itself included) lie
    *     within eps;
    *   - clusters are the connected components of the core↔core
    *     eps-graph (labelled by MIN core id — partitioning-free);
    *   - a non-core point within eps of ≥ 1 core is a BORDER point,
    *     assigned the MIN cluster label among its core neighbors (the
    *     textbook leaves border ties arbitrary; min makes the result
    *     a pure function of the input);
    *   - everything else is NOISE (cluster null).
    * Returns (id, role ∈ core|border|noise, cluster).
    *
    * Scale: the eps-neighborhood is [[graft.ops.SpatialOps.gridBucketJoin]]
    * (cell = eps, 3×3 bucket equi-join + exact distance filter) — never
    * a point×point cartesian; clusters come from the O(log diameter)
    * [[Graph.connectedComponents]] rounds; every other step is a
    * node-keyed agg/join. Density skew lands on space-uniform cell
    * keys, and AQE's skew-join split covers a mega-cell. */
  def dbscan(points: DataFrame, idCol: String, xCol: String, yCol: String,
      eps: Double, minPts: Int): DataFrame = {
    require(eps > 0, "eps > 0")
    require(minPts >= 1, "minPts >= 1")
    val pts = points.select(col(idCol).cast("long").as("id"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .localCheckpoint() // probe side + feature side + final rejoin
    // eps-pairs, SELF-PAIRS INCLUDED (minPts counts the point itself)
    val pairs = graft.ops.SpatialOps.gridBucketJoin(
        pts.select(col("id").as("id_sensor"), col("x"), col("y")),
        pts.select(col("id").as("nbr_id"), col("x"), col("y")),
        radius = eps, cell = eps)
      .select(col("id_sensor").as("id"), col("nbr_id"))
      .localCheckpoint() // read by the count, the core graph, the border join
    val coreIds = pairs.groupBy(col("id"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minPts)
      .select(col("id"))
      .localCheckpoint()
    val coreEdges = pairs
      .join(coreIds, Seq("id"), "left_semi")
      .join(coreIds.withColumnRenamed("id", "nbr_id"), Seq("nbr_id"), "left_semi")
    val comp = Graph.connectedComponents(coreEdges, "id", "nbr_id",
      cache = false) // (node, component) over core points
    val borders = pairs
      .join(coreIds.withColumnRenamed("id", "nbr_id"), Seq("nbr_id"), "left_semi")
      .join(coreIds, Seq("id"), "left_anti") // non-core with a core neighbor
      .join(comp.withColumnRenamed("node", "nbr_id"), Seq("nbr_id"))
      .groupBy(col("id")).agg(min(col("component")).as("cluster"))
    pts.select(col("id"))
      .join(comp.withColumnRenamed("node", "id")
        .withColumnRenamed("component", "__core_cl"), Seq("id"), "left")
      .join(borders.withColumnRenamed("cluster", "__border_cl"), Seq("id"), "left")
      .select(col("id"),
        when(col("__core_cl").isNotNull, lit("core"))
          .when(col("__border_cl").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("__core_cl"), col("__border_cl")).as("cluster"))
  }
}

/** Driver-side replica of the distributed power-iteration chase
  * (opt round 11, the q411/q497 audit-slice discipline): EXACTLY the
  * SQL semantics of the loop in [[Clustering.powerIterationInt]] /
  * [[Clustering.powerIterationTwo]], in BigInt (≡ decimal(38,0)):
  *
  *   - a matrix cell with NULL c_u contributes a NULL product, which
  *     SUM skips; a group whose every product is NULL sums to NULL;
  *   - mx = MAX(ABS(w)) ignores NULLs and is NULL on an all-NULL w;
  *   - `div` is integral division truncating toward zero (BigInt /);
  *   - division by a NULL mx yields NULL; by a ZERO mx REPLICATES the
  *     ANSI error (throws DIVIDE_BY_ZERO, exactly as the distributed
  *     IntegralDivide would under this session's ANSI mode) unless
  *     `zeroGuard` replays the explicit CASE WHEN __mx = 0 THEN 0L of
  *     the two-chase variant;
  *   - each round's v covers exactly the j-groups the join produced.
  *
  * A property spec pins driver ≡ distributed on shared matrices
  * (including NULL-cell and zero-matrix edges). */
private[ext] object PowerKernel {
  type Cells = Seq[(Int, Int, Option[BigInt])]

  def cellsOf(rows: Seq[org.apache.spark.sql.Row]): Cells =
    rows.map(r => (r.getInt(0), r.getInt(1),
      if (r.isNullAt(2)) None else Some(BigInt(r.getLong(2)))))

  /** One full chase; returns (final v by j, final mx). */
  def chase(cells: Cells, dims: Int, rounds: Int,
      init: Int => BigInt, zeroGuard: Boolean)
      : (Map[Int, Option[BigInt]], Option[BigInt]) = {
    var v: Map[Int, Option[BigInt]] =
      (0 until dims).map(j => j -> Option(init(j))).toMap
    var mxLast: Option[BigInt] = None
    var r = 0
    while (r < rounds) {
      val w = scala.collection.mutable.Map.empty[Int, Option[Seq[BigInt]]]
      cells.foreach { case (i, j, c) =>
        v.get(i).foreach { vi => // join on i: row joins iff i has a v row
          val term = for { cv <- c; x <- vi } yield cv * x
          val cur = w.getOrElse(j, Some(Seq.empty[BigInt]))
          w(j) = (cur, term) match {
            case (Some(ts), Some(t)) => Some(ts :+ t)
            case (Some(ts), None)    => Some(ts) // SUM skips NULL terms
            case (None, t)           => t.map(Seq(_))
          }
        }
      }
      // SUM semantics: a group with zero non-NULL terms is NULL
      val wSum: Map[Int, Option[BigInt]] = w.toMap.map { case (j, ts) =>
        j -> ts.flatMap(s => if (s.isEmpty) None else Some(s.sum))
      }
      val present = wSum.values.flatten.toSeq
      val mx: Option[BigInt] =
        if (present.isEmpty) None else Some(present.map(_.abs).max)
      v = wSum.map { case (j, wj) =>
        j -> (mx match {
          case Some(m) if m == 0 =>
            // the two-chase variant CASE-guards mx = 0 to a zero hold;
            // the single-chase variant divides and, under ANSI (the
            // Spark 4 default), ERRORS — replicate both exactly (mx = 0
            // implies at least one non-null w, so the divide is reached)
            if (zeroGuard) Some(BigInt(0))
            else throw new ArithmeticException(
              "[DIVIDE_BY_ZERO] Division by zero (power-iteration max |w| " +
                "is 0 — zero matrix)")
          case Some(m) => wj.map(x => x * 1000000 / m)
          case None => None
        })
      }
      mxLast = mx
      r += 1
    }
    (v, mxLast)
  }
}
