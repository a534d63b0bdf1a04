package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.Sketches

/** E6 — the approximate-sketch laws that make 100 TB cardinality and
  * quantile work feasible. Exact distinct (q15) and exact median (q27)
  * are the correctness kernels; at scale the plan of record is
  * HLL / KLL sketches, whose defining property is MERGEABILITY: a
  * sketch built per partition and merged must equal the sketch built
  * in one pass, so the reduction tree's shape (and any cluster
  * layout) cannot change the answer. These laws pin that contract.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("E6: HLL estimates distinct counts within the configured error bound") {
    val df = spark.range(100000).select((col("id") % 20000).as("k"))
    val est = df
      .agg(hll_sketch_estimate(hll_sketch_agg(col("k"), lit(12))).as("e"))
      .head.getLong(0)
    // lgConfigK=12 → ~1.6% relative standard error; 5% is >3 sigma
    assert(math.abs(est - 20000.0) / 20000 < 0.05, s"estimate $est")
  }

  test("E6: HLL merge is partition/shape invariant — merged ≡ single-pass registers") {
    val df = spark.range(60000)
      .select((col("id") % 7000).as("k"), (col("id") % 13).as("g"))
    val global = df
      .agg(hll_sketch_estimate(hll_sketch_agg(col("k"), lit(12))))
      .head.getLong(0)
    // build one sketch per group, merge the 13 — register max is
    // associative+commutative, so this is BIT-equal, not just close
    val merged = df.groupBy(col("g"))
      .agg(hll_sketch_agg(col("k"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head.getLong(0)
    assert(global == merged, s"global $global vs merged $merged")
  }

  test("E6: count-min estimates are one-sided — est >= true for every key") {
    import graft.ext.Sketches
    // Zipf-ish: key k appears ~200/k times over a 200-key domain
    val df = spark.range(40000).select((col("id") % 200 + 1).as("k"))
      .filter(col("id") % (col("k")) === 0)
    val truth = df.groupBy(col("k")).agg(count(lit(1)).as("t"))
    val sk = Sketches.countMinBuild(df, col("k"), width = 64, depth = 4)
    val est = Sketches.countMinEstimate(sk, truth, col("k"), 64, 4)
    val joined = est.join(truth, col("key") === col("k"))
      .select(col("t"), col("est")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(1) >= r.getLong(0),
      s"est ${r.getLong(1)} < true ${r.getLong(0)}"))
  }

  test("E6: count-min is exact when the grid is collision-free") {
    import graft.ext.Sketches
    val df = spark.range(300).select((col("id") % 3).as("k"))
    val truth = df.groupBy(col("k")).agg(count(lit(1)).as("t"))
    // 3 keys in a 4096-wide, 4-deep grid: some row is collision-free,
    // and min() finds it — estimates are exact
    val sk = Sketches.countMinBuild(df, col("k"), width = 4096, depth = 4)
    val est = Sketches.countMinEstimate(sk, truth, col("k"), 4096, 4)
      .join(truth, col("key") === col("k")).select(col("t"), col("est"))
      .collect()
    est.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // degenerate width 1: every cell holds the full row count
    val sk1 = Sketches.countMinBuild(df, col("k"), width = 1, depth = 2)
    val est1 = Sketches.countMinEstimate(sk1, truth, col("k"), 1, 2)
      .select(col("est")).collect()
    est1.foreach(r => assert(r.getLong(0) == 300L))
  }

  test("E6: custom HLL registers are partition/merge invariant; estimate in band") {
    import graft.ext.Sketches
    val df = spark.range(30000).select((col("id") % 5000).as("k"),
      lit("g").as("grp"))
    def regs(d: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(d, Seq(col("grp")), col("k"), m = 64)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val base = regs(df)
    // register max is associative+commutative: any partitioning and
    // any split/merge produces the bit-identical table
    assert(regs(df.repartition(13)) == base)
    val halves = regs(df.filter(col("id") % 2 === 0)) ++
      regs(df.filter(col("id") % 2 === 1))
    val merged = halves.groupBy(t => (t._1, t._2))
      .map { case (k, vs) => (k._1, k._2, vs.map(_._3).max) }.toSet
    assert(merged == base)
    // m=64 → RSE ~1.04/8 = 13%; 40% is ~3 sigma
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(df, Seq(col("grp")), col("k"), 64),
        Seq("grp"), 64)
      .select(col("est_hll")).head.getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.4, s"estimate $est")
  }

  test("E6: Bloom filter has zero false negatives; bit count bounded by k*n") {
    import graft.ext.Sketches
    val allow = spark.range(20).select((col("id") * 7).as("k"))
    val bloom = Sketches.bloomBuild(allow, col("k"), bits = 64, k = 3)
    val bitsSet = bloom.count()
    assert(bitsSet <= 60, s"more bits than k*n: $bitsSet")
    val probes = spark.range(200).select(col("id").as("k"))
    val out = Sketches.bloomProbe(bloom, probes, col("k"), bits = 64, k = 3)
    val members = (0 until 20).map(_ * 7L).toSet
    out.collect().foreach { r =>
      val (key, hits, pos) = (r.getLong(0), r.getLong(1), r.getInt(2))
      if (members(key))
        assert(pos == 1 && hits == 3, s"false negative on member $key")
      assert(hits >= 0 && hits <= 3)
    }
    // a crowded 64-bit filter over 200 probes MUST show the tradeoff:
    // some non-member collides on all 3 hashes (P(fp) ~ (bits/64)^3)
    val fp = out.collect().count(r => r.getInt(2) == 1 && !members(r.getLong(0)))
    assert(fp > 0, "expected at least one false positive in a crowded filter")
  }

  test("E6: percentile_approx rank error stays within the accuracy contract") {
    // long-tail skew: v = (id % 1000)^2 — exactly the shape that breaks
    // naive sampling
    val df = spark.range(50000)
      .select(((col("id") % 1000) * (col("id") % 1000)).cast("double").as("v"))
    val approx = df
      .agg(percentile_approx(col("v"), lit(0.5), lit(1000)).as("p"))
      .head.getDouble(0)
    val n = 50000L
    val rank = df.filter(col("v") <= approx).count()
    // guarantee: |rank(approx) − 0.5·n| ≤ n/accuracy (+ duplicate mass:
    // each distinct v holds 50 copies here, so allow one value's worth)
    assert(math.abs(rank - n / 2) <= n / 1000 + 50,
      s"approx p50 $approx has rank $rank of $n")
  }

  test("E6: KMV sketch is exact below k, in-band above, and merge-invariant") {
    import spark.implicits._
    // below k: the sketch IS the distinct set
    val small = (1L to 40L).map(i => ("g", i)).toDF("g", "key")
    val smallEst = Sketches.kmvEstimate(
      Sketches.kmvSketch(small, Seq(col("g")), col("key"), k = 64),
      Seq("g"), k = 64).head()
    assert(smallEst.getAs[Long]("n_kept") == 40L
      && smallEst.getAs[Long]("est_kmv") == 40L)
    // above k: estimate within the ~1/sqrt(k-2) relative-error band (3x slack)
    val big = (1L to 5000L).map(i => ("g", i)).toDF("g", "key")
    val est = Sketches.kmvEstimate(
      Sketches.kmvSketch(big, Seq(col("g")), col("key"), k = 64),
      Seq("g"), k = 64).head().getAs[Long]("est_kmv")
    assert(math.abs(est - 5000L) < 5000 * 3 / math.sqrt(62),
      s"KMV estimate $est too far from 5000")
    // mergeability: bottom-k of the union of two sketches == sketch of union
    val a = (1L to 3000L).map(i => ("g", i)).toDF("g", "key")
    val b = (2000L to 5000L).map(i => ("g", i)).toDF("g", "key")
    val direct = Sketches.kmvSketch(a.unionByName(b), Seq(col("g")), col("key"), k = 64)
      .select("h").as[Long].collect().sorted.toSeq
    val viaMerge = Sketches.kmvSketch(a, Seq(col("g")), col("key"), k = 64)
      .unionByName(Sketches.kmvSketch(b, Seq(col("g")), col("key"), k = 64))
      .select("h").distinct().as[Long].collect().sorted.take(64).toSeq
    assert(direct == viaMerge, "bottom-k of sketch union must equal union sketch")
  }

  test("E6: KMV resemblance — identical sets 10^6 ppm, disjoint 0, overlap in band") {
    import spark.implicits._
    def sk(lo: Long, hi: Long) = Sketches.kmvSketch(
      (lo to hi).map(i => ("g", i)).toDF("g", "key"), Nil, col("key"), k = 64)
    val same = Sketches.kmvResemblance(sk(1, 2000), sk(1, 2000), k = 64).head()
    assert(same.getAs[Long]("j_est_ppm") == 1000000L)
    val disjoint = Sketches.kmvResemblance(sk(1, 2000), sk(3000, 5000), k = 64).head()
    assert(disjoint.getAs[Long]("j_est_ppm") == 0L)
    // true J = 1000/3000 = 1/3; allow a generous sampling band
    val half = Sketches.kmvResemblance(sk(1, 2000), sk(1001, 3000), k = 64)
      .head().getAs[Long]("j_est_ppm")
    assert(half > 120000L && half < 550000L, s"J estimate $half ppm out of band")
  }

  test("X2/E6: bitmap distinct is exact, partitioning-invariant, and range-guarded") {
    import spark.implicits._
    import graft.ext.BitmapDistinct
    val keys = (1 to 5000).map(i => (i % 7).toLong -> ((i * 131) % 1200).toLong)
    val df = keys.toDF("g", "k")
    val exact = keys.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size.toLong }
    // BOTH forms agree with ground truth: the native
    // TypedImperativeAggregate (production) and the udaf Aggregator
    // (the user-registration example, same algebra)
    for (agg <- Seq(
        (c: org.apache.spark.sql.Column) => BitmapDistinct.bitmapDistinct(c, 4096),
        (c: org.apache.spark.sql.Column) => BitmapDistinct.bitmapDistinctUdaf(c, 4096))) {
      val got = df.groupBy("g").agg(agg(col("k")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == exact)
      // OR-merge is partitioning-invariant: any repartition, same answer
      val re = df.repartition(13).groupBy("g").agg(agg(col("k")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(re == got)
    }
    // out-of-domain keys fail fast instead of aliasing
    val err = intercept[org.apache.spark.SparkException] {
      Seq(5000L).toDF("k")
        .agg(BitmapDistinct.bitmapDistinct(col("k"), 4096)).collect()
    }
    assert(err.getMessage.contains("bitmap domain") ||
      Option(err.getCause).exists(_.getMessage.contains("bitmap domain")))
  }
}
