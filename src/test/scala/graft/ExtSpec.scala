package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity, TextAnalysis, Multimodal}

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "completely different words entirely unrelated text here"),
    (4L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (5L, "spark catalyst optimizer rewrites logical plans")
  ).toDF("doc_id", "text")

  test("E1: exact dedup groups identical texts, min-id canonical") {
    val out = Dedup.exact(docs, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_group_size"), r.getAs[Boolean]("is_canonical"))).toMap
    assert(out(1L) == (2L, true) && out(4L) == (2L, false))
    assert(out(3L) == (1L, true))
  }

  test("E2: verifyJaccard computes exact token-set jaccard") {
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val j = Dedup.verifyJaccard(docs, "text", "doc_id", pairs, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    // doc1: {the,quick,brown,fox,jumps,over,lazy,dog} (8 distinct)
    // doc2: same minus dog plus cat → inter 7, union 9
    assert(math.abs(j((1L, 2L)) - 7.0 / 9) < 1e-12)
    assert(j((1L, 3L)) == 0.0)
  }

  test("E2: prefix-filter join equals brute-force exact Jaccard (recall-complete)") {
    // sliding-window corpus: doc i holds tokens t(i)..t(i+9), so near
    // neighbors overlap heavily and far docs not at all — plus ties
    val corpus = (0 until 50).map { i =>
      (i.toLong, (0 until 10).map(j => s"t${i + j}").mkString(" "))
    }.toDF("doc_id", "text")
    val fast = Dedup.prefixFilterJaccardPairs(corpus, "text", "doc_id",
        shingleSize = 1, tNum = 1, tDen = 3, cache = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val allPairs = corpus.select(col("doc_id").as("id_a"))
      .crossJoin(corpus.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    // 1.0/3 and the k=5 pairs' 5.0/15 share one true quotient, hence
    // one double — the >= can't disagree with the integer filter
    val brute = Dedup.verifyJaccard(corpus, "text", "doc_id", allPairs, 1, cache = false)
      .filter(col("jaccard") >= lit(1.0 / 3)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(fast.nonEmpty && fast == brute,
      s"prefix filter must drop nothing: ${brute.keySet -- fast.keySet} missed")
  }

  test("E2: minhash LSH finds near-dups and skips unrelated docs") {
    val out = Dedup.minhashNearDuplicates(docs, "text", "doc_id",
      shingleSize = 1, numHashes = 16, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 4L))) // exact dup always found (identical signatures)
    assert(out.contains((1L, 2L)) || out.contains((2L, 4L))) // near-dup pair found
    assert(!out.exists { case (a, b) => a == 3L || b == 3L }) // unrelated never passes verify
  }

  test("E2: simhash — identical docs distance 0, near-dups close, unrelated far") {
    val fp = Dedup.simhash(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    assert(ham(1L, 4L) == 0)
    assert(ham(1L, 2L) < ham(1L, 3L))
  }

  test("E2: simhash blocking finds all pairs within distance 3 (pigeonhole)") {
    val out = Dedup.simhashNearDuplicates(docs, "text", "doc_id", maxDistance = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 4L)))
  }

  test("E2: md5Hash60 pins the portable token-hash values q46's oracle reconstructs") {
    // expected = int(md5(s).hexdigest()[:15], 16), computed independently
    val out = Seq("a", "spark catalyst").toDF("s")
      .select(Dedup.md5Hash60(col("s"))).as[Long].collect().toSeq
    assert(out == Seq(57446577476672362L, 790351668529426805L))
  }

  test("E2: editDistance1Join — complete at distance 1 incl. first-char edits") {
    val df = Seq((1L, "spark"), (2L, "spark"), (3L, "spork"), (4L, "park"),
      (5L, "sparks"), (6L, "totally")).toDF("id", "s")
    val out = Dedup.editDistance1Join(df, "id", "s")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // brute-force truth: every pair with levenshtein <= 1
    val strs = Map(1L -> "spark", 2L -> "spark", 3L -> "spork",
      4L -> "park", 5L -> "sparks", 6L -> "totally")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val truth = (for {
      a <- strs.keys; b <- strs.keys if a < b
      if lev(strs(a), strs(b)) <= 1
    } yield (a, b)).toSet
    assert(out == truth, s"missing ${truth -- out}, extra ${out -- truth}")
    // the first-char edit (park ~ spark) MUST be present — the case
    // prefix blocking is blind to
    assert(out.contains((1L, 4L)))
  }

  test("E2: substringDupPairs — planted shared k-grams found, boilerplate capped") {
    import spark.implicits._
    // docs 1 and 2 share a 6-token run -> 3 distinct 4-grams; doc 3 is
    // unrelated; docs 4..8 all carry the same boilerplate sentence
    val shared = "alpha beta gamma delta epsilon zeta"
    val boiler = "this footer appears on every single page"
    val docs = Seq(
      (1L, s"one two $shared done"),
      (2L, s"$shared other tail words here"),
      (3L, "completely different content with no overlap at all okay"),
      (4L, s"$boiler aaa bbb"), (5L, s"$boiler ccc ddd"),
      (6L, s"$boiler eee fff"), (7L, s"$boiler ggg hhh"),
      (8L, s"$boiler iii jjj")).toDF("id", "text")
    val pairs = graft.ext.Dedup.substringDupPairs(docs, "text", "id",
        k = 4, minShared = 3, maxDocFreq = 4, cache = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 6 shared tokens -> 3 distinct 4-grams for (1,2)
    assert(pairs.toSeq == Seq((1L, 2L, 3L)),
      s"expected only (1,2,3), got ${pairs.toSeq}")
    // with the cap raised, the 5-doc boilerplate family appears too
    val loose = graft.ext.Dedup.substringDupPairs(docs, "text", "id",
        k = 4, minShared = 3, maxDocFreq = 10, cache = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(loose.length == 1 + 10) // (1,2) + C(5,2) boilerplate pairs
  }

  test("E2: substringDupMass — dup share is exact per doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),      // grams(k=4): abcd bcde cdef
      (2L, "a b c d x y"),      // grams: abcd bcdx cdxy — shares abcd
      (3L, "p q r s t")).toDF("id", "text")
    val m = graft.ext.Dedup.substringDupMass(docs, "text", "id", k = 4,
        cache = false)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m(1L) == ((3L, 1L, 333333L)))
    assert(m(2L) == ((3L, 1L, 333333L)))
    assert(m(3L) == ((2L, 0L, 0L)))
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f)),
    (4L, Array(0.7f, 0.7f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("E3: native array_dot equals the HOF fold bit-for-bit; null/mismatch yield null") {
    val df = Seq((Array(1.5, -2.25, 3.0, 0.125), Array(0.5, 4.0, -1.25, 8.0)))
      .toDF("a", "b")
    val Seq(native, fold) = df.select(
      graft.ext.VectorExpressions.arrayDot(col("a"), col("b")),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).head.toSeq.map(_.asInstanceOf[Double])
    assert(native == fold) // identical accumulation order → identical doubles
    // SQL registration through SparkSessionExtensions-equivalent path
    val viaSql = df.select(expr("array(1.0d, 2.0d)").as("x"), expr("array(3.0d, 4.0d)").as("y"))
      .select(graft.ext.VectorExpressions.arrayDot(col("x"), col("y"))).head.getDouble(0)
    assert(viaSql == 11.0)
    val mismatch = df.select(graft.ext.VectorExpressions.arrayDot(
      col("a"), expr("array(1.0d, 2.0d)"))).head
    assert(mismatch.isNullAt(0), "length mismatch must yield null")
    val withNull = df.select(graft.ext.VectorExpressions.arrayDot(
      col("a"), expr("array(1.0d, CAST(null AS DOUBLE), 2.0d, 3.0d)"))).head
    assert(withNull.isNullAt(0), "a null element must poison to null")
  }

  test("E3: array_dot over two NON-nullable children still nulls on length mismatch") {
    // array(cast(id as double)) is non-foldable and non-nullable: without
    // `override def nullable = true` nullSafeCodeGen binds ev.isNull to
    // FalseLiteral and the generated `isNull = true;` does not compile
    // (and interpreted eval hands null into a non-null slot).
    val out = spark.range(2).select(graft.ext.VectorExpressions.arrayDot(
      expr("array(cast(id as double))"), expr("array(1.0d, 2.0d)")).as("d"))
    assert(out.schema("d").nullable, "array_dot must declare itself nullable")
    val rows = out.collect()
    assert(rows.length == 2 && rows.forall(_.isNullAt(0)),
      "length mismatch over non-nullable inputs must yield null")
    // equal-length non-nullable inputs still compute through the same path
    val ok = spark.range(3).select(graft.ext.VectorExpressions.arrayDot(
      expr("array(cast(id as double), 2.0d)"), expr("array(10.0d, 0.5d)")))
      .as[Double].collect().toSeq
    assert(ok == Seq(1.0, 11.0, 21.0))
  }

  test("E3/E2: operator caches register per session and release deterministically") {
    import graft.core.OperatorCaches
    OperatorCaches.releaseAll(spark)
    val emb = (0L until 20L).map(i => (i, Array.tabulate(4)(d => (i * 7 + d) % 5 / 4.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.cosineNearDuplicates(emb, "embedding", "vec_id",
      threshold = 0.999, dim = 4)
    out.count() // materialize: the norm frame is now cached
    assert(OperatorCaches.registeredCount(spark) == 1)
    OperatorCaches.releaseAll(spark)
    assert(OperatorCaches.registeredCount(spark) == 0)
    // result remains recomputable from lineage after release
    assert(out.count() >= 0)
  }

  test("E3: brute-force top-k cosine ranks by true cosine") {
    val out = Similarity.topKCosine(vecs.filter($"vec_id" =!= 0L),
      "embedding", "vec_id", Array(1.0f, 0.0f, 0.0f), 3)
      .select("vec_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 4L, 2L)) // cos: .9938, .7071, 0
  }

  test("E3: jlSigns is a deterministic public ±1 matrix; jlProject = manual dot") {
    val signs = Similarity.jlSigns(4, 2)
    assert(signs.map(_.toSeq).toSeq == Similarity.jlSigns(4, 2).map(_.toSeq).toSeq)
    assert(signs.flatten.forall(v => v == 1.0 || v == -1.0))
    val v = Array(1.0f, 2.0f, 3.0f, 4.0f)
    val got = Seq((1L, v)).toDF("id", "emb")
      .select(Similarity.jlProject(col("emb"), signs).as("p"))
      .head().getSeq[Double](0)
    val want = signs.map(row =>
      row.zip(v).map { case (s, x) => s * x.toDouble }.sum)
    assert(got.toSeq == want.toSeq)
  }

  test("E3: JL projection preserves cosine contrast on separated blobs") {
    val signs = Similarity.jlSigns(16, 8)
    val a = Array.tabulate(16)(d => if (d < 8) 1.0f else 0.0f)
    val b = Array.tabulate(16)(d => if (d < 8) 1.0f else 0.1f) // near a
    val c = Array.tabulate(16)(d => if (d >= 8) 1.0f else 0.0f) // far from a
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "emb")
      .withColumn("p", Similarity.jlProject(col("emb"), signs))
    val rows = df.select("id", "p").as[(Long, Seq[Double])].collect().toMap
    def cos(x: Seq[Double], y: Seq[Double]) = {
      val d = x.zip(y).map { case (u, w) => u * w }.sum
      d / (math.sqrt(x.map(u => u * u).sum) * math.sqrt(y.map(u => u * u).sum))
    }
    assert(cos(rows(1L), rows(2L)) > cos(rows(1L), rows(3L)))
  }

  test("E3: batch top-k returns per-query ranks") {
    val out = Similarity.topKCosineBatch(vecs, vecs.filter($"vec_id" === 0L),
      "embedding", "vec_id", 2).orderBy("rank")
      .select("item_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 4L))
  }

  test("E3: IVF — probing all clusters equals brute force; fewer probes stay a subset") {
    val s = spark
    val dim = 4
    val data = (0L until 60L).map { i =>
      // three well-separated blobs
      val base = (i % 3).toInt
      val v = Array.tabulate(dim)(d =>
        (if (d == base) 10f else 0f) + ((i * 7 + d) % 5) * 0.1f)
      (i, v)
    }.toDF("vec_id", "embedding")
    val (indexed, cents) = Similarity.ivfIndex(data, "embedding", "vec_id",
      dim, nCentroids = 3, iterations = 4)
    assert(indexed.select("cluster").distinct().count() <= 3)
    val q = Array(10f, 0.2f, 0.1f, 0.3f)
    val brute = Similarity.topKCosine(data, "embedding", "vec_id", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    val allProbe = Similarity.ivfTopKCosine(indexed, cents, "embedding", "vec_id",
      q, 5, nProbe = 3).select("vec_id").as[Long].collect().toSeq
    assert(allProbe == brute) // full probe = brute force
    val oneProbe = Similarity.ivfTopKCosine(indexed, cents, "embedding", "vec_id",
      q, 5, nProbe = 1).select("vec_id").as[Long].collect().toSet
    assert(oneProbe.subsetOf(brute.toSet) && oneProbe.nonEmpty)
    // blobs are separated → the single nearest cluster holds the true top-5
    assert(oneProbe == brute.toSet)
  }

  test("E3: PQ — codes compress to m smalls, ADC retrieves the query's blob") {
    val dim = 8; val m = 4
    val data = (0L until 60L).map { i =>
      val base = (i % 3).toInt
      val v = Array.tabulate(dim)(d =>
        (if (d == base) 10f else 0f) + ((i * 7 + d) % 5) * 0.1f)
      (i, v)
    }.toDF("vec_id", "embedding")
    val (encoded, codebooks) = Similarity.pqIndex(data, "embedding", "vec_id",
      dim, m = m, k = 4, iterations = 4)
    // code shape: m codes per vector, each within [0, k)
    val codes = encoded.select("pq_code").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == m && c.forall(x => x >= 0 && x < 4)))
    assert(codebooks.length == m && codebooks.forall(_.length == 4)
      && codebooks.forall(_.forall(_.length == dim / m)))
    // blobs are far apart vs quantization error: ADC top-10 for a
    // query at blob 0's center must come entirely from blob 0
    val q = Array.tabulate(dim)(d => if (d == 0) 10f else 0.2f)
    val top = Similarity.pqTopK(encoded, codebooks, "vec_id", q, 10)
      .select("vec_id").as[Long].collect()
    assert(top.length == 10 && top.forall(_ % 3 == 0), top.toSeq.toString)
    // ADC distance to a vector's own codeword reconstruction is the
    // quantization residual — far below the inter-blob distance
    val d2 = Similarity.pqTopK(encoded, codebooks, "vec_id", q, 10)
      .select("pq_d2").as[Double].collect()
    assert(d2.forall(_ < 25.0), d2.toSeq.toString) // inter-blob d2 is ~200
  }

  test("E3: LSH bucket search returns a subset of brute force, query bucket consistent") {
    val q = Array(1.0f, 0.0f, 0.0f)
    val brute = Similarity.topKCosine(vecs.filter($"vec_id" =!= 0L),
      "embedding", "vec_id", q, 5).select("vec_id").as[Long].collect().toSet
    val lsh = Similarity.lshTopKCosine(vecs.filter($"vec_id" =!= 0L),
      "embedding", "vec_id", q, 5, dim = 3, bits = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(lsh.subsetOf(brute))
    assert(lsh.nonEmpty) // vec 1 at least lands in the query's bucket
    assert(lsh.contains(1L))
  }

  test("ML: als1Factor — hand one-step algebra, popular item dominates, partition-invariant") {
    // 2 users x 2 items; item 20 carries double the rating mass
    val r = Seq((1L, 10L, 2L), (1L, 20L, 4L), (2L, 10L, 2L), (2L, 20L, 4L))
      .toDF("u", "i", "v")
    // iter 1 by hand: v0 = 1e6; u = 1e12*(6e6)//(2e12) = 3e6 (both users)
    // vA: num = 2*(2*3e6) = 12e6, den = 2*(3e6)^2 = 18e12
    //   -> 1e12*12e6 // 18e12 = 666666;  vB: 24e6 -> 1333333
    val out = graft.ext.Similarity.als1Factor(r, col("u"), col("i"),
      col("v"), iters = 1).collect()
      .map(x => x.getAs[Long]("item") -> x.getAs[Long]("factor_micro")).toMap
    assert(out(10L) == 666666L)
    assert(out(20L) == 1333333L)
    def run(parts: Int) = graft.ext.Similarity.als1Factor(
      r.repartition(parts), col("u"), col("i"), col("v"), iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val a = run(1); val b = run(7)
    assert(a == b)
    assert(a(20L) > a(10L))
  }
}

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("E4: huffmanCodeLengths — textbook depths, Kraft equality, OOV pool") {
    // freqs a:5 b:2 c:1 d:1 → classic tree: a=1, b=2, c=d=3
    val df = Seq("a a a a a b b c d").toDF("text")
    val out = TextAnalysis.huffmanCodeLengths(df, col("text"), topV = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      "a" -> ((5L, 1L, 5L)), "b" -> ((2L, 2L, 4L)),
      "c" -> ((1L, 3L, 3L)), "d" -> ((1L, 3L, 3L))))
    // Kraft equality for a full binary code: Σ 2^-len = 1
    val kraft = out.values.map { case (_, len, _) =>
      1.0 / (1L << len) }.sum
    assert(kraft == 1.0)
    // OOV pool: topV = 3 keeps a, b; c + d fold into __oov__ (weight 2)
    val oov = TextAnalysis.huffmanCodeLengths(df, col("text"), topV = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(oov == Map("a" -> 5L, "b" -> 2L, "__oov__" -> 2L))
    // bits never beat the entropy bound: Σ freq·len ≥ n·H / ln 2
    val n = 9.0
    val h = Seq(5.0, 2.0, 1.0, 1.0).map(f => -f / n * math.log(f / n)).sum
    val bits = out.values.map(_._3).sum.toDouble
    assert(bits >= n * h / math.log(2.0) - 1e-9)
  }

  test("E4: langId picks the stopword-matching language") {
    val df = Seq(
      "the cat and the dog sat in the house for a while",
      "le chat et les chiens du village pour une promenade",
      "der hund und die katze mit dem ball ist ein spiel",
      "xyzzy qwerty asdf").toDF("text")
    val out = df.select(TextAnalysis.langId(col("text"))).as[String].collect()
    assert(out.toSeq == Seq("en", "fr", "de", "und"))
  }

  test("E4: token and subword counts") {
    val df = Seq("hello world, it's 42 degrees!").toDF("text")
    val r = df.select(TextAnalysis.tokenCount(col("text")),
      TextAnalysis.subwordCount(col("text"))).head
    assert(r.getInt(0) == 5)
    // hello|world|,|it|'|s|42|degrees|! → 9
    assert(r.getInt(1) == 9)
  }

  test("E4: quality features flag short junk low, prose high") {
    val df = Seq(
      "good plain prose with reasonable words that continues for a while and ends",
      "x").toDF("text")
    val out = TextAnalysis.qualityFeatures(df, "text")
      .select("quality_score").as[Double].collect()
    assert(out(0) > out(1))
  }

  test("E4: fingerprint is whitespace/case-insensitive stable") {
    val df = Seq(("A  B\tC", "a b c")).toDF("t1", "t2")
    val r = df.select(TextAnalysis.fingerprint(col("t1")) === TextAnalysis.fingerprint(col("t2")))
      .head.getBoolean(0)
    assert(r)
  }

  test("E4: chunk fingerprints slide with stride") {
    val df = Seq("a b c d e f g h").toDF("text")
    val n = df.select(size(TextAnalysis.chunkFingerprints(col("text"), 4, 2))).head.getInt(0)
    assert(n == 3) // starts at 0,2,4
  }

  test("E2: blockingAudit — hand RR and PC") {
    // blocks: {1,2} | {3,4}; truth: (1,2) covered, (1,3) split
    val assign = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("id", "block")
    val truth = Seq((2L, 1L), (1L, 3L)).toDF("x", "y")
    val r = Dedup.blockingAudit(assign, "id", "block", truth, "x", "y")
      .collect()(0)
    assert(r.getAs[Long]("n_ids") == 4L && r.getAs[Long]("n_blocks") == 2L)
    assert(r.getAs[Long]("total_pairs") == 6L)
    assert(r.getAs[Long]("candidate_pairs") == 2L)
    assert(r.getAs[Long]("true_pairs") == 2L)
    assert(r.getAs[Long]("covered_pairs") == 1L)
    assert(math.abs(r.getAs[Double]("reduction_ratio") - 2.0 / 3.0) < 1e-12)
    assert(r.getAs[Double]("pairs_completeness") == 0.5)
  }

  test("E4: textRankKeywords — short tokens drop, symmetric pair ties, hub outranks") {
    // doc 1: hub word "alpha" co-occurs with three spokes; doc 2 is a
    // lone pair; "of"/"to" fall to the length gate
    val docs = Seq(
      (1L, "alpha beta of alpha gamma to alpha delta"),
      (2L, "epsilon zeta")).toDF("doc_id", "text")
    val out = TextAnalysis.textRankKeywords(docs, col("doc_id"),
      col("text"), minLen = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("of") && !out.contains("to"))
    // the hub accumulates more rank than any spoke
    assert(out("alpha") > out("beta") && out("alpha") > out("gamma"))
    // the isolated symmetric pair ties exactly (integer arithmetic)
    assert(out("epsilon") == out("zeta"))
  }

  test("E4: yuleK — hand spectrum, repetitive text scores higher") {
    val docs = Seq(("x", "a a a b"), ("y", "a a a a")).toDF("g", "text")
    val out = TextAnalysis.yuleK(docs, col("text"), col("g")).collect()
      .map(r => r.getString(0) -> r).toMap
    // x: N=4, types=2, S2=10 -> K = 1e4*6/16 = 3750
    assert(out("x").getAs[Long]("n_tokens") == 4L)
    assert(out("x").getAs[Long]("n_types") == 2L)
    assert(out("x").getAs[Double]("yule_k") == 3750.0)
    // y: all repeats -> K = 1e4*12/16 = 7500 > x
    assert(out("y").getAs[Double]("yule_k") == 7500.0)
  }

  test("E4: burrowsDelta — mirrored profiles score 2.0, identical authors 0") {
    val docs = Seq((1L, "alpha", "x x y"), (2L, "beta", "x y y"),
      (3L, "gamma", "x x y")).toDF("doc_id", "src", "text")
    val out = TextAnalysis.burrowsDelta(docs, col("text"), col("src"),
      topK = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("delta"))
      .toMap
    // three authors, beta mirrored: z = (+1/sqrt2, -2/sqrt2, +1/sqrt2)
    // per word -> |z_a - z_b| = 3/sqrt2 on both words
    assert(math.abs(out(("alpha", "beta")) - 3.0 / math.sqrt(2.0)) < 1e-5)
    // identical frequency profiles: zero stylistic distance
    assert(out(("alpha", "gamma")) == 0.0)
    assert(math.abs(out(("beta", "gamma")) - 3.0 / math.sqrt(2.0)) < 1e-5)
  }

  test("E4: dirichletQL — hand micro-nat scores, zero-tf smoothing, OOV drop") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = graft.ext.Curation.dirichletQL(docs, "text", "doc_id",
      Seq("a", "b", "zzz"), mu = 10L).collect()
      .map(r => r.getAs[Long]("doc") -> r).toMap
    def mnat(num: Long, den: Long) =
      math.floor(math.log(num.toDouble / den.toDouble) * 1e6 + 0.5).toLong
    // T = 5, cf(a) = 2, cf(b) = 2, zzz absent (dropped)
    val d1 = out(1L) // len 3: tf(a)=2, tf(b)=1
    assert(d1.getAs[Long]("doc_len") == 3L)
    assert(d1.getAs[Long]("n_terms_hit") == 2L)
    assert(d1.getAs[Long]("score_micro") ==
      mnat(2 * 5 + 10 * 2, 5 * 13) + mnat(1 * 5 + 10 * 2, 5 * 13))
    val d2 = out(2L) // len 2: tf(a)=0 (smoothed), tf(b)=1
    assert(d2.getAs[Long]("n_terms_hit") == 1L)
    assert(d2.getAs[Long]("score_micro") ==
      mnat(10 * 2, 5 * 12) + mnat(1 * 5 + 10 * 2, 5 * 12))
  }

  test("E4: logOddsFightinWords — side-marker words score opposite extremes") {
    val docs = Seq((true, "apple apple common common"),
      (true, "apple common"), (false, "banana banana common common"),
      (false, "banana common")).toDF("a", "text")
    val out = TextAnalysis.logOddsFightinWords(docs, col("text"),
      col("a"), alpha0 = 10L).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("z")).toMap
    assert(out("apple") > 0 && out("banana") < 0)
    // symmetric construction: the two markers score symmetric z
    assert(math.abs(out("apple") + out("banana")) < 1e-9)
    // the shared word sits near zero, strictly between the markers
    assert(math.abs(out("common")) < out("apple"))
  }

  test("E4: plsa2Topics — planted two-theme corpus separates; partition-invariant") {
    // two disjoint vocabularies; doc ids chosen so the (d mod 7) init
    // tilt CORRELATES with the theme (EM is a local-optimum chaser —
    // the deterministic init must not start it on the ridge)
    val fruit = "apple pear plum apple grape pear apple"
    val motor = "engine piston motor engine valve motor engine"
    val docs = ((0L until 28L by 7L).map(i => (i, fruit)) ++
      (6L until 34L by 7L).map(i => (i, motor))).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.plsa2Topics(docs, col("doc_id"),
      col("text"), rounds = 5, topK = 3).collect()
    val byTopic = out.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    val fruitSet = Set("apple", "pear", "plum", "grape")
    val motorSet = Set("engine", "piston", "motor", "valve")
    // each topic's top tokens come from ONE theme, and the two topics
    // pick different themes
    val t1Fruit = byTopic(1).subsetOf(fruitSet)
    val t2Fruit = byTopic(2).subsetOf(fruitSet)
    assert(t1Fruit || byTopic(1).subsetOf(motorSet), byTopic(1).toString)
    assert(t2Fruit || byTopic(2).subsetOf(motorSet), byTopic(2).toString)
    assert(t1Fruit != t2Fruit, s"topics collapsed: $byTopic")
    // fixed rounds + integer arithmetic: repartitioning changes nothing
    val out2 = graft.ext.TextAnalysis.plsa2Topics(docs.repartition(7),
      col("doc_id"), col("text"), rounds = 5, topK = 3).collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet ==
      out2.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet)
  }

  test("E4: naiveBayesClassify — hand-computed scores, smoothing backoff, tie-break") {
    val docs = Seq(
      (1L, "pos", "good good great"),
      (2L, "pos", "good fine"),
      (3L, "neg", "bad bad awful"),
      (4L, "neg", "bad poor")).toDF("doc_id", "text_label", "text")
      .withColumnRenamed("text_label", "lbl")
    val out = TextAnalysis.naiveBayesClassify(docs, col("doc_id"),
        col("text"), col("lbl"))
      .collect().map(r => r.getAs[Long]("doc") ->
        (r.getAs[String]("label_pred"), r.getAs[Long]("score_u"))).toMap
    // separable vocabulary: every doc classifies back to its own class
    assert(out(1L)._1 == "pos" && out(2L)._1 == "pos")
    assert(out(3L)._1 == "neg" && out(4L)._1 == "neg")
    // hand score for doc 1 under "pos": V = 6, T_pos = 5,
    // prior ln(2/4); good seen 3x, great 1x — micro-nat quantized
    def u(x: Double): Long = math.round(x * 1e6)
    val expected1 = u(math.log(2.0 / 4)) +
      2 * u(math.log(4.0 / 11)) + u(math.log(2.0 / 11))
    assert(out(1L)._2 == expected1)
    // and under "neg" every token is UNSEEN — backoff floor ln(1/11);
    // the pos score must beat it (that's why doc 1 classifies pos)
    val negScore1 = u(math.log(2.0 / 4)) + 3 * u(math.log(1.0 / 11))
    assert(expected1 > negScore1)
    // exact tie between classes → lexicographically smaller label wins
    val tie = Seq((1L, "a", "x"), (2L, "b", "x")).toDF("doc_id", "lbl", "text")
    val tout = TextAnalysis.naiveBayesClassify(tie, col("doc_id"),
        col("text"), col("lbl"))
      .collect().map(r => r.getAs[Long]("doc") ->
        r.getAs[String]("label_pred")).toMap
    assert(tout(1L) == "a" && tout(2L) == "a")
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("E5: synthetic media → batch feature extraction keeps schema contract") {
    val media = Multimodal.withSyntheticMedia(spark, 30)
    val feats = Multimodal.extractFeatures(media, numPartitions = 4)
    assert(feats.schema == Multimodal.featureSchema)
    assert(feats.count() == 30)
    val r = feats.filter(col("media_id") === 5L).head
    assert(r.getAs[Int]("n_bytes") == 256 + (5 % 7) * 128)
    assert(r.getSeq[Double](r.fieldIndex("feature_vec")).length == 8)
    // deterministic: re-extraction yields identical features
    val again = Multimodal.extractFeatures(media).filter(col("media_id") === 5L).head
    assert(again.getAs[Double]("mean_intensity") == r.getAs[Double]("mean_intensity"))
  }

  test("E5: real PNG payloads decode to actual pixel dimensions and mean luminance") {
    val media = Multimodal.withSyntheticMedia(spark, 12)
    val feats = Multimodal.extractFeatures(media, numPartitions = 2)
      .filter(col("media_type") === "image").collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val expectedW = 64 + (id % 4).toInt * 32
      assert(r.getAs[Int]("width") == expectedW, s"width of media $id")
      assert(r.getAs[Int]("height") == 64)
      // expected mean of the generated gradient, computed independently
      val exp = (for (y <- 0 until 64; x <- 0 until expectedW)
        yield ((x * 31 + y * 17 + id * 7) % 256).toDouble).sum / (64.0 * expectedW)
      assert(math.abs(r.getAs[Double]("mean_intensity") - exp) < 1e-9,
        s"mean luminance of media $id")
      val hist = r.getSeq[Double](r.fieldIndex("feature_vec"))
      assert(hist.length == 8 && math.abs(hist.sum - 1.0) < 1e-9)
    }
  }

  test("E5: real WAV payloads decode to sample rate, channels, and exact RMS") {
    val media = Multimodal.withSyntheticMedia(spark, 12)
    val feats = Multimodal.extractFeatures(media, numPartitions = 2)
      .filter(col("media_type") === "audio").collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("width") == 16000, "width carries the decoded sample rate")
      assert(r.getAs[Int]("height") == 1, "height carries the channel count")
      // recompute expected RMS from the same integer triangle wave
      val n = 800 + (id % 5).toInt * 160
      val k = (7 + (id % 5)).toInt
      val sumSq = (0 until n).map { i =>
        val s = ((i.toLong * k) % 2048 - 1024) * 16 / 32768.0; s * s
      }.sum
      assert(math.abs(r.getAs[Double]("mean_intensity") - math.sqrt(sumSq / n)) < 1e-12,
        s"RMS of media $id")
      val hist = r.getSeq[Double](r.fieldIndex("feature_vec"))
      assert(hist.length == 8 && math.abs(hist.sum - 1.0) < 1e-9)
      // triangle wave spans roughly ±0.5: outer amplitude bins stay empty
      assert(hist(0) == 0.0 && hist(7) == 0.0)
    }
    // a non-WAV payload falls back to the byte-stats stub, not a crash
    assert(Multimodal.decodeWav("not a riff file at all".getBytes).isEmpty)
  }

  test("E5: animated GIFs decode to real frame counts and per-frame luminance profile") {
    val media = Multimodal.withSyntheticMedia(spark, 12)
    val vids = Multimodal.extractFeatures(media, numPartitions = 2)
      .filter(col("media_type") === "video").collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    // id 2 and 8 are real GIFs (id % 6 == 2); id 5 and 11 are stub bytes
    Seq(2L, 8L).foreach { id =>
      val r = vids(id)
      assert(r.getAs[Int]("width") == 32 && r.getAs[Int]("height") == 16, s"dims of $id")
      val frames = 3 + ((id / 6) % 3).toInt
      val profile = r.getSeq[Double](r.fieldIndex("feature_vec"))
      assert(profile.length == frames, s"temporal profile length of $id")
      // constant-gray frames survive palette quantization losslessly:
      // frame f is exactly 40 + (id*7 % 100) + f*16
      assert(profile.head == 40.0 + (id * 7 % 100) && profile.last == profile.head + (frames - 1) * 16,
        s"profile $profile")
      val deltas = profile.sliding(2).map(p => p(1) - p(0)).toSeq
      assert(deltas.forall(_ == 16.0), s"deltas $deltas")
      assert(math.abs(r.getAs[Double]("mean_intensity") -
        profile.sum / profile.length) < 1e-9)
    }
    Seq(5L, 11L).foreach { id => // stub fallback: byte stats, declared dims
      val r = vids(id)
      assert(r.getAs[Int]("width") == 64 + (id % 4).toInt * 32)
      assert(r.getSeq[Double](r.fieldIndex("feature_vec")).length == 8)
    }
    // a single-frame image payload is NOT a video
    assert(Multimodal.decodeVideo(Multimodal.syntheticPng(8, 8, 1L)).isEmpty)
  }

  test("E5: frame sampling indices are declarative and bounded") {
    import spark.implicits._
    val df = Seq(100).toDF("n_frames")
    val idx = df.select(Multimodal.frameSampleIndices(col("n_frames"), 10, 5)).head.getSeq[Long](0)
    assert(idx == Seq(0L, 10L, 20L, 30L, 40L))
  }

  test("E5+E2: averageHash recovers the planted block pattern exactly") {
    // mixed bright/dark block grids: block averaging must wash out the
    // ±10 per-pixel jitter and the threshold must split 220 vs 40
    val patterns = Seq(0x5A5A5A5A5A5A5A5AL, 0x0F0F00FF33CC55AAL, 1L, ~1L)
    patterns.foreach { p =>
      assert(Multimodal.averageHash(Multimodal.syntheticBlockPng(p)) == Some(p),
        s"pattern ${p.toHexString}")
      // resolution-independent: 128x96 renders to the same fingerprint
      assert(Multimodal.averageHash(Multimodal.syntheticBlockPng(p, 128, 96)) == Some(p),
        s"pattern ${p.toHexString} at 128x96")
    }
    // non-image bytes hash to None, not an exception
    assert(Multimodal.averageHash("not an image".getBytes).isEmpty)
  }

  test("E5+E2: audioHash recovers the planted energy-envelope pattern exactly") {
    val patterns = Seq(0xA5A5A5A5A5A5A5A5L, 0x0FF0123456789ABCL, 1L, ~1L)
    patterns.foreach { p =>
      assert(Multimodal.audioHash(Multimodal.syntheticBlockWav(p)) == Some(p),
        s"pattern ${p.toHexString}")
      // frame-count independent: 50 samples/frame hashes identically
      assert(Multimodal.audioHash(Multimodal.syntheticBlockWav(p, 50)) == Some(p),
        s"pattern ${p.toHexString} at 50 samples/frame")
    }
    // non-audio bytes and too-short clips hash to None, not an exception
    assert(Multimodal.audioHash("not a riff".getBytes).isEmpty)
    assert(Multimodal.audioHash(Multimodal.syntheticWav(32, 16000, 1L)).isEmpty)
  }

  test("E5+E2: audioNearDuplicates finds perturbed twins among decoys") {
    import spark.implicits._
    val base = 0xA5A50F0F33CC55AAL
    val twin = base ^ (1L << 3) ^ (1L << 47)           // 2 frame flips
    val media = Seq(
      (1L, Multimodal.syntheticBlockWav(base)),
      (2L, Multimodal.syntheticBlockWav(twin)),
      (3L, Multimodal.syntheticBlockWav(~base)),        // hamming 64
      (4L, "undecodable junk".getBytes)
    ).toDF("media_id", "payload")
    val pairs = Multimodal.audioNearDuplicates(media, "media_id", "payload",
        maxDistance = 3, cache = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    assert(pairs.toSeq == Seq((1L, 2L, 2L)),
      s"expected exactly the planted twin pair at hamming 2, got ${pairs.toSeq}")
  }

  test("E5+E2: imageNearDuplicates finds perturbed twins, skips unrelated and undecodable") {
    import spark.implicits._
    val base = 0x5A5A12345A5AFEDCL
    val twin = base ^ (1L << 7) ^ (1L << 40)          // 2 block flips
    val far = ~base                                    // hamming 64
    val media = Seq(
      (1L, Multimodal.syntheticBlockPng(base)),
      (2L, Multimodal.syntheticBlockPng(twin)),
      (3L, Multimodal.syntheticBlockPng(far)),
      (4L, "undecodable junk bytes".getBytes)
    ).toDF("media_id", "payload")
    val pairs = Multimodal.imageNearDuplicates(media, "media_id", "payload",
        maxDistance = 3, cache = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    assert(pairs.toSeq == Seq((1L, 2L, 2L)),
      s"expected exactly the planted twin pair at hamming 2, got ${pairs.toSeq}")
  }

  test("E5: imageDHash — exact gradient bits, brightness-shift invariance, near-dup pairing") {
    import spark.implicits._
    import javax.imageio.ImageIO
    import java.awt.image.BufferedImage
    def png(shift: Int): Array[Byte] = {
      // 18x8 left-to-right luminance ramp: every cell brighter than its
      // right neighbor is FALSE (ramp rises) -> dHash = 0
      val img = new BufferedImage(18, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 18) {
        val v = math.min(255, 40 + x * 10 + shift)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", bos); bos.toByteArray
    }
    val df = Seq((1L, png(0)), (2L, png(30)), (3L, "notanimage".getBytes))
      .toDF("id", "payload")
    val fps = df.select(col("id"), Multimodal.imageDHash(col("payload")).as("fp"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // rising ramp: no cell brighter than its right neighbor
    assert(fps(1L).contains(0L))
    // +30 brightness (no clipping at these values): gradients unchanged
    assert(fps(2L) == fps(1L))
    assert(fps(3L).isEmpty)
    // near-dup pairing finds the brightness-shifted twin at distance 0
    val pairs = Multimodal.imageNearDuplicatesDHash(df, "id", "payload",
      maxDistance = 2, cache = false)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }
}

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("E7: sinkhornPlan — identical marginals stay diagonal; a shift moves the mass") {
    import graft.ext.Curation
    // side A and side B both uniform over 3 categories: the optimal
    // plan under |i-j| cost is (near-)diagonal and conserves mass
    val same = (0L until 300L).map(i => (i % 3, i % 2 == 0))
      .toDF("cat", "a")
    // epsInv = 4 sharpens the entropic plan toward the true OT plan
    val p1 = Curation.sinkhornPlan(same, col("cat"), col("a"),
        k = 3, rounds = 8, epsInv = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Long]("plan_micro")).toMap
    val diag = (0L until 3L).map(i => p1((i, i))).sum
    val total = p1.values.sum
    assert(math.abs(total - 1000000L) < 2000L, s"mass $total")
    assert(diag > 950000L, s"diagonal mass $diag of $total")
    // and the soft default spreads mass but keeps every row's argmax
    // on the diagonal (the entropic-regularization signature)
    val soft = Curation.sinkhornPlan(same, col("cat"), col("a"),
        k = 3, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Long]("plan_micro")).toMap
    (0L until 3L).foreach { i =>
      (0L until 3L).filter(_ != i).foreach { j =>
        assert(soft((i, i)) > soft((i, j)), s"row $i argmax") } }
    // A all in category 0, B all in category 2: the plan transports
    // everything along (0, 2)
    val shift = ((0L until 100L).map(_ => (0L, true)) ++
      (0L until 100L).map(_ => (2L, false))).toDF("cat", "a")
    val p2 = Curation.sinkhornPlan(shift, col("cat"), col("a"),
        k = 3, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Long]("plan_micro")).toMap
    assert(p2((0L, 2L)) > 990000L, p2.toString)
    assert(p2.filterKeys(_ != ((0L, 2L))).values.forall(_ < 5000L))
  }

  test("E4: winnowing — shared runs of k+w-1 tokens share a fingerprint; short docs behave") {
    import graft.ext.TextAnalysis
    val sharedRun = "alpha beta gamma delta epsilon zeta eta" // 7 tokens = k+w-1 for k=w=4
    val docs = Seq(
      (1L, s"one two three $sharedRun red blue"),
      (2L, s"$sharedRun nine ten eleven twelve"),
      (3L, "completely unrelated words with nothing in common here at all"),
      (4L, "tiny doc"),                   // < k tokens: no fingerprints
      (5L, "exactly four tokens here"),   // k tokens, 1 gram < w: one truncated window
      (6L, s"one two three $sharedRun red blue") // identical to 1
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowingFingerprints(docs, "text", "doc_id", k = 4, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // guarantee: >= k+w-1 shared tokens => >= 1 shared fingerprint
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    // unrelated docs share nothing
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    // identical docs have identical fingerprint sets
    assert(byDoc(1L) == byDoc(6L))
    // < k tokens: absent; exactly one gram: exactly one fingerprint
    assert(!byDoc.contains(4L))
    assert(byDoc(5L).size == 1)
  }

  test("E4+: doremiStep — identical domains keep their shares; hard domain tilts up") {
    import graft.ext.Curation
    import org.apache.spark.sql.functions._
    // two domains with the SAME text: zero excess everywhere, so the
    // tilt factor is exp(0) = 1 and shares equal the token shares
    val same = Seq(
      (1L, "a", "the quick brown fox"), (2L, "a", "the quick brown fox"),
      (3L, "b", "the quick brown fox")).toDF("doc_id", "domain", "text")
    val eq = Curation.doremiStep(same, "text", "domain").collect()
    assert(eq.forall(r =>
      r.getAs[Double]("new_share") == r.getAs[Double]("base_share")))
    assert(math.abs(eq.map(_.getAs[Double]("new_share")).sum - 1.0) < 1e-12)
    // one domain of common tokens, one of all-rare tokens: the rare
    // (high-loss) domain's share must strictly increase
    val mixed = Seq(
      (1L, "easy", "common common common common common common"),
      (2L, "easy", "common common common common common common"),
      (3L, "hard", "zyx wvu tsr qpo nml kji")).toDF("doc_id", "domain", "text")
    val out = Curation.doremiStep(mixed, "text", "domain")
      .collect().map(r => r.getAs[String]("domain") -> r).toMap
    assert(out("hard").getAs[Long]("excess_micro") > 0L)
    assert(out("easy").getAs[Long]("excess_micro") == 0L)
    assert(out("hard").getAs[Double]("new_share") >
      out("hard").getAs[Double]("base_share"))
    assert(out("easy").getAs[Double]("new_share") <
      out("easy").getAs[Double]("base_share"))
    // eta = 0 switches the update off even when excess is positive
    val off = Curation.doremiStep(mixed, "text", "domain", etaMicro = 0L)
      .collect()
    assert(off.forall(r =>
      r.getAs[Double]("new_share") == r.getAs[Double]("base_share")))
  }

  test("E4: hash split is deterministic, duplicate-safe, and percentage-shaped") {
    import graft.ext.Curation
    val docs = (0 until 2000).map(i => (i.toLong, s"document number $i with some text"))
      .toDF("doc_id", "text")
    val split = docs.select(col("doc_id"), Curation.split(col("text")).as("s"))
    val counts = split.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // hash buckets approximate the 80/10/10 request (binomial tolerance)
    assert(counts("train") > 1500 && counts("val") > 120 && counts("test") > 120)
    assert(counts.values.sum == 2000)
    // determinism + content-addressing: identical text => identical split
    val dup = Seq((9001L, "document number 7 with some text")).toDF("doc_id", "text")
      .select(Curation.split(col("text")).as("s")).head.getString(0)
    val orig = split.filter(col("doc_id") === 7L).head.getString(1)
    assert(dup == orig)
  }

  test("E4: capPerKey keeps at most cap rows per key in the requested order") {
    import graft.ext.Curation
    val df = (0 until 100).map(i => (i.toLong, s"src${i % 3}", (i * 37) % 100))
      .toDF("doc_id", "source", "sz")
    val kept = Curation.capPerKey(df, col("source"),
      Seq(col("sz").desc, col("doc_id").asc), cap = 5)
    val byKey = kept.collect().groupBy(_.getString(1))
    assert(byKey.size == 3 && byKey.values.forall(_.length == 5))
    // kept rows are exactly the top-5 sz per key (with id tie-break)
    byKey.foreach { case (src, rows) =>
      val expect = (0 until 100).filter(i => s"src${i % 3}" == src)
        .sortBy(i => (-((i * 37) % 100), i)).take(5).map(_.toLong).toSet
      assert(rows.map(_.getLong(0)).toSet == expect, src)
    }
  }

  test("E7: stratified sampling applies per-stratum rates, duplicate-consistently") {
    import graft.ext.Curation
    val docs = (0 until 3000).map(i =>
      (i.toLong, s"doc body number ${i % 1500}", s"src${i % 3}"))
      .toDF("doc_id", "text", "source") // every text appears twice (dup pairs)
    val kept = Curation.stratifiedSample(docs, col("source"), col("text"),
      rates = Map("src0" -> 100, "src1" -> 50, "src2" -> 0))
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 1000)                       // 100% kept
    assert(bySrc.getOrElse("src2", 0L) == 0)            // 0% kept
    val s1 = bySrc.getOrElse("src1", 0L)
    assert(s1 > 350 && s1 < 650, s"src1 kept $s1 of 1000 at 50%")
    // duplicate texts sample identically: kept texts appear with BOTH ids
    val perText = kept.filter(col("source") === "src1")
      .groupBy("text").count().select("count").as[Long].collect()
    assert(perText.nonEmpty && perText.forall(_ == 2L),
      "every kept text must keep both its duplicate rows")
  }

  test("E4: unigram log-prob — common-token docs outscore rare-token docs; exact mean") {
    import graft.ext.TextAnalysis
    val docs = Seq(
      (1L, "common common common common"),  // all high-probability tokens
      (2L, "common rare1 rare2 rare3"),     // mostly singletons
      (3L, "common common rare4 common")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 4)
    assert(out(1L)._2 > out(3L)._2 && out(3L)._2 > out(2L)._2)
    // exact value: 'common' appears 8 of 12 tokens; doc 1 is all-common
    assert(math.abs(out(1L)._2 - math.rint(math.log(8.0 / 12) * 1e6) / 1e6) < 1e-9)
    graft.core.OperatorCaches.releaseAll(spark)
  }

  test("E4: tfidf — ubiquitous terms score zero, distinctive terms rank first") {
    import graft.ext.Curation
    val docs = Seq(
      (1L, "shared shared unique1 filler"),
      (2L, "shared filler unique2 unique2"),
      (3L, "shared filler other words")
    ).toDF("doc_id", "text")
    val out = Curation.tfIdfTopTerms(docs, "text", "doc_id", topK = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getDouble(3))).toMap
    // 'shared' appears in all 3 docs: idf = ln(1) = 0 — never outranks a unique term
    assert(out((1L, 1))._1 == "unique1")
    assert(out((2L, 1))._1 == "unique2")
    // tf doubles the score: unique2 (tf=2) = 2 * ln(3)
    assert(math.abs(out((2L, 1))._2 - math.rint(2 * math.log(3.0) * 1e6) / 1e6) < 1e-9)
  }

  test("E7: contextPackingAudit — hand-traced windows, splits and fill") {
    import graft.ext.Curation
    // sizes 3, 2, 4 at capacity 4: cums 3, 5, 9 → doc2 spans w0/w1,
    // doc3 spans w1/w2
    val docs = Seq((1L, 3L), (2L, 2L), (3L, 4L)).toDF("id", "sz")
    val out = Curation.contextPackingAudit(docs, col("id"), col("sz"), 4L)
      .orderBy(col("window_id")).collect()
      .map(r => (r.getAs[Long]("window_id"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_split"),
        r.getAs[Long]("tokens_in")))
    assert(out.toSeq == Seq((0L, 2L, 1L, 4L), (1L, 2L, 2L, 4L),
      (2L, 1L, 1L, 1L)))
    // conservation: window fills sum to the corpus token total
    assert(out.map(_._4).sum == 9L)
  }

  test("E2+: clusterPurity — modal share, tie-break and zero entropy " +
      "for pure clusters") {
    import graft.ext.Curation
    val asg = Seq((10L, "x"), (10L, "x"), (10L, "y"), (20L, "z"))
      .toDF("cl", "lab")
    val out = Curation.clusterPurity(asg, col("cl"), col("lab"))
      .collect().map(r => r.getAs[Long]("cluster_id") -> r).toMap
    val a = out(10L)
    assert(a.getAs[Long]("n_docs") == 3L && a.getAs[Long]("n_labels") == 2L)
    assert(a.getAs[String]("modal_label") == "x")
    assert(a.getAs[Long]("purity_ppm") == 666666L)
    val wantE = math.round(-(2.0 / 3 * math.log(2.0 / 3)) * 1e9) +
      math.round(-(1.0 / 3 * math.log(1.0 / 3)) * 1e9)
    assert(a.getAs[Long]("entropy_nano") == wantE)
    val b = out(20L)
    assert(b.getAs[Long]("purity_ppm") == 1000000L)
    assert(b.getAs[Long]("entropy_nano") == 0L)
  }

  test("E2+: sourceOverlapMatrix — shared shingle scores 1/3, disjoint " +
      "pairs are absent") {
    import graft.ext.Curation
    val docs = Seq(("p", "a b c d"), ("q", "a b c x"), ("r", "z y w v"))
      .toDF("source", "text")
    val out = Curation.sourceOverlapMatrix(docs, col("text"), col("source"),
      shingleSize = 3)
      .collect().map(r => (r.getAs[String]("source_a"),
        r.getAs[String]("source_b")) ->
        (r.getAs[Long]("inter"), r.getAs[Double]("jaccard"))).toMap
    assert(out.keySet == Set(("p", "q")))
    assert(out(("p", "q")) == ((1L, 0.333333)))
  }

  test("E4: sourceHealthProfile — dup ratio, modal language, entropy") {
    import graft.ext.Curation
    val docs = Seq(
      ("s1", "hello", "en", 5L), ("s1", "hello", "en", 5L),
      ("s2", "aa", "en", 2L), ("s2", "bb", "de", 2L))
      .toDF("source", "text", "lang", "n_chars")
    val out = Curation.sourceHealthProfile(docs, col("source"), col("text"),
      col("lang"), col("n_chars"))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val s1 = out("s1")
    assert(s1.getAs[Long]("dup_ppm") == 500000L)
    assert(s1.getAs[Long]("mean_chars") == 5L)
    assert(s1.getAs[String]("modal_lang") == "en")
    assert(s1.getAs[Long]("lang_entropy_nano") == 0L)
    val s2 = out("s2")
    assert(s2.getAs[Long]("dup_ppm") == 0L)
    assert(s2.getAs[Long]("modal_share_ppm") == 500000L)
    assert(s2.getAs[String]("modal_lang") == "de") // tie → smallest code
  }

  test("E4: vocabCoverage — crossing vocab sizes on a 9/1 skew") {
    val docs = Seq((1L, ("a " * 9).trim + " b")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(docs, col("text"),
      Seq(500000L, 900000L, 1000000L))
      .orderBy(col("coverage_ppm")).collect()
      .map(r => r.getAs[Long]("coverage_ppm") ->
        r.getAs[Long]("vocab_size")).toMap
    assert(out == Map(500000L -> 1L, 900000L -> 1L, 1000000L -> 2L))
  }

  test("E4: templatePrefixProfile — shared openings dominate the modal " +
      "share") {
    val docs = Seq(
      ("s", "breaking news today markets fell"),
      ("s", "breaking news today rates rose"),
      ("s", "quiet day in the city"))
      .toDF("source", "text")
    val r = TextAnalysis.templatePrefixProfile(docs, col("text"),
      col("source"), k = 3).head()
    assert(r.getAs[Long]("n_docs") == 3L && r.getAs[Long]("n_prefixes") == 2L)
    assert(r.getAs[String]("modal_prefix") == "breaking news today")
    assert(r.getAs[Long]("modal_ppm") == 666666L)
  }

  test("X3: MultiContains — one-pass Aho-Corasick mask matches contains()") {
    import graft.ext.MultiContains.multiContains
    val pats = Seq("he", "she", "his", "hers", "xyz")
    val rows = Seq("ushers", "his house", "nothing here", "shehe", "")
      .toDF("t")
    val got = rows.select(multiContains(col("t"), pats).as("m"))
      .collect().map(_.getLong(0))
    val want = rows.collect().map(_.getString(0)).map { s =>
      pats.zipWithIndex.foldLeft(0L) { case (m, (p, i)) =>
        if (s.contains(p)) m | (1L << i) else m }
    }
    assert(got.toSeq == want.toSeq) // incl. overlapping matches in "ushers"
    // null in -> null out
    assert(Seq[Option[String]](None).toDF("t")
      .select(multiContains(col("t"), pats)).collect()(0).isNullAt(0))
    // codegen and interpreted agree
    val big = (0 until 64).map(i => s"word$i text he xyz").toDF("t")
    val cnt = big.select(multiContains(col("t"), pats).as("m"))
      .filter(col("m") === ((1L << 0) | (1L << 4))).count()
    assert(cnt == 64)
  }

  test("E3: mmrRerank — relevance-first at lambda=1, diversity kicks in below") {
    import graft.ext.Similarity
    // three near-identical vectors with top relevance + one orthogonal
    val rows = Seq(
      (1L, 0.99, Array(1.0f, 0.0f)),
      (2L, 0.98, Array(1.0f, 0.01f)),
      (3L, 0.97, Array(1.0f, 0.02f)),
      (4L, 0.50, Array(0.0f, 1.0f)))
      .toDF("id", "rel", "vec")
    // lambda = 1: pure relevance order
    val pure = Similarity.mmrRerank(rows, "id", "rel", "vec", 3, 1, 1)
      .orderBy("pick_order").collect().map(_.getAs[Long]("id"))
    assert(pure.toSeq == Seq(1L, 2L, 3L))
    // lambda = 0.5: after the best pick, the orthogonal vector beats
    // the near-duplicates despite lower relevance
    val div = Similarity.mmrRerank(rows, "id", "rel", "vec", 2, 1, 2)
      .orderBy("pick_order").collect().map(_.getAs[Long]("id"))
    assert(div.toSeq == Seq(1L, 4L))
    // k > N returns all N, each picked exactly once
    val all4 = Similarity.mmrRerank(rows, "id", "rel", "vec", 9, 7, 10)
      .collect()
    assert(all4.map(_.getAs[Long]("id")).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(all4.map(_.getAs[Long]("pick_order")).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("E4: bpeTrain — hand-checked merges on a tiny corpus") {
    import graft.ext.TextAnalysis
    // corpus: "low low low lower" -> vocab low:3, lower:1
    // symbols: l o w </w> (x3), l o w e r </w> (x1)
    // round 1 pairs: (l,o):4 (o,w):4 (w,</w>):3 (w,e):1 (e,r):1 (r,</w>):1
    //   tie (l,o) vs (o,w) -> lexicographic: (l,o); merged "lo"
    // round 2: (lo,w):4 wins; round 3: (low,</w>):3 wins
    val docs = Seq("low low low lower").toDF("text")
    val out = TextAnalysis.bpeTrain(docs, col("text"), merges = 3)
      .orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count")))
    assert(out.toSeq == Seq(
      (1, "l", "o", "lo", 4L),
      (2, "lo", "w", "low", 4L),
      (3, "low", "</w>", "low</w>", 3L)))
    // greedy left-to-right non-overlap: "aaa" + (a,a) -> [aa, a]
    val aaa = Seq("aaa").toDF("text")
    val m1 = TextAnalysis.bpeTrain(aaa, col("text"), merges = 1).collect()(0)
    assert(m1.getAs[String]("merged") == "aa" &&
      m1.getAs[Long]("pair_count") == 2L)
  }

  test("E4: keyphrasesRake — deg/freq scoring on a hand corpus") {
    import graft.ext.TextAnalysis
    // doc: "deep learning of deep networks" stopword 'of' splits runs:
    // phrases: "deep learning" (len 2), "deep networks" (len 2)
    // deg(deep) = 4, freq = 2 -> 2e6; learning 2/1 -> 2e6; networks 2e6
    // both phrases score 4e6
    val docs = Seq((1L, "deep learning of deep networks")).toDF("id", "text")
    val out = TextAnalysis.keyphrasesRake(docs, col("id"), col("text"),
      Seq("of", "the"), topK = 5).orderBy("phrase").collect()
    assert(out.map(r => (r.getAs[String]("phrase"), r.getAs[Long]("n_words"),
      r.getAs[Long]("n_occurs"), r.getAs[Long]("score_ppm"))).toSeq ==
      Seq(("deep learning", 2L, 1L, 4000000L),
        ("deep networks", 2L, 1L, 4000000L)))
    // repeated phrase counts occurrences once per appearance
    val rep = Seq((1L, "big data and big data")).toDF("id", "text")
    val ro = TextAnalysis.keyphrasesRake(rep, col("id"), col("text"),
      Seq("and"), topK = 5).collect()(0)
    assert(ro.getAs[String]("phrase") == "big data" &&
      ro.getAs[Long]("n_occurs") == 2L)
  }

  test("E4: bpeEncode — compression accounting on a hand corpus") {
    import graft.ext.TextAnalysis
    // "low low" with merges (l,o), (lo,w), (low,</w>): each 'low'
    // encodes to ONE token; char-level is 4 tokens per word (l o w </w>)
    val docs = Seq((1L, "low low")).toDF("id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"))
    val out = TextAnalysis.bpeEncode(docs, col("id"), col("text"), merges)
      .collect()(0)
    assert(out.getAs[Long]("n_docs") == 1L)
    assert(out.getAs[Long]("n_words") == 2L)
    assert(out.getAs[Long]("n_char_tokens") == 8L) // (3 chars + </w>) x 2
    assert(out.getAs[Long]("n_bpe_tokens") == 2L)
    assert(out.getAs[Long]("saved_ppm") == 750000L)
  }

  test("E3: hardNegatives — same-label and self pairs excluded, top-k ranked") {
    import graft.ext.Similarity
    val rows = Seq(
      (1L, 0L, Array(1.0f, 0.0f)),
      (2L, 0L, Array(1.0f, 0.1f)),   // same label as 1: never its negative
      (3L, 1L, Array(0.9f, 0.1f)),   // closest cross-label to 1
      (4L, 1L, Array(0.0f, 1.0f)))   // far cross-label
      .toDF("id", "label", "vec")
    val out = Similarity.hardNegatives(rows, "id", "label", "vec", k = 2)
      .filter(col("anchor_id") === 1L).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neg_id")).toSeq == Seq(3L, 4L))
    // no anchor ever lists itself or a same-label item
    val all = Similarity.hardNegatives(rows, "id", "label", "vec", k = 3)
      .collect()
    assert(all.forall(r =>
      r.getAs[Long]("anchor_id") != r.getAs[Long]("neg_id")))
    val lbl = rows.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all.forall(r =>
      lbl(r.getAs[Long]("anchor_id")) != lbl(r.getAs[Long]("neg_id"))))
  }

  test("A-eval: TokenLcs/rougeL — hand LCS, reorder tolerance, empties") {
    import graft.ext.{TextAnalysis, TokenLcs}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ws: String*): ArrayData = ArrayData.toArrayData(
      ws.map(UTF8String.fromString).toArray)
    assert(TokenLcs.compute(arr("a", "b", "c", "d"), arr("b", "d")) == 2)
    assert(TokenLcs.compute(arr("x"), arr("y")) == 0)
    assert(TokenLcs.compute(arr(), arr("a")) == 0)
    assert(TokenLcs.compute(arr("a", "b"), arr("a", "b")) == 2)
    // rougeL end to end: "the cat sat" vs "the sat cat" -> LCS 2
    val pairs = Seq((1L, "the cat sat", "the sat cat")).toDF("id", "c", "r")
    val out = TextAnalysis.rougeL(pairs, "id", "c", "r").head()
    assert(out.getAs[Long]("lcs") == 2L)
    assert(out.getAs[Long]("p_ppm") == 666666L)
    assert(out.getAs[Long]("f_ppm") == 666666L)
    // ROUGE-2 would score this pair's bigram overlap at 0 — LCS is the
    // reorder-tolerant signal
  }

  test("E7: paddingWasteAudit — hand buckets and the no-bucket baseline") {
    import graft.ext.Curation
    // lens 10, 30 (bucket 0, max 30) and 40 (bucket 1, max 40), width 32
    val out = Curation.paddingWasteAudit(
      Seq(10L, 30L, 40L).toDF("len"), col("len"), bucketWidth = 32)
      .orderBy(col("bucket")).collect()
    val b0 = out.find(r => !r.isNullAt(0) && r.getLong(0) == 0L).get
    assert(b0.getAs[Long]("padded_sum") == 60L)
    assert(b0.getAs[Long]("waste_ppm") == 1000000L * 20 / 60)
    val tot = out.find(_.isNullAt(0)).get
    assert(tot.getAs[Long]("padded_sum") == 100L)
    // baseline: 3 x 40 = 120 padded for 80 tokens
    assert(tot.getAs[Long]("baseline_waste_ppm") == 1000000L * 40 / 120)
  }

  test("A-eval: bleu — identity scores ~1, brevity penalty bites, clipping") {
    import graft.ext.Curation
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat sat on the mat"), // identical
      (2L, "the cat", "the cat sat on the mat"),                // short cand
      (3L, "the the the the", "the cat"))                       // clipped
      .toDF("id", "c", "r")
    val out = Curation.bleu(pairs, "id", "c", "r", maxN = 2)
      .orderBy("id").collect()
    // identical: smoothed precisions (6+1)/(6+1) = 1 and (5+1)/(5+1) = 1,
    // bp = 1 -> bleu exactly 1e9
    assert(out(0).getAs[Long]("bleu_nano") == 1000000000L)
    // short candidate: bp = exp(1 - 6/2) < 1 pulls the score down
    assert(out(1).getAs[Long]("bleu_nano") <
      out(0).getAs[Long]("bleu_nano") / 2)
    // clipping: 'the' counts at most ref's occurrences (1)
    assert(out(2).getAs[Long]("overlap_1") == 1L)
    assert(out(2).getAs[Long]("overlap_2") == 0L)
  }

  test("E1: codeQualitySignals — comments, braces, alpha on a hand snippet") {
    import graft.ext.TextAnalysis
    val code = "def f(x) {\n  // doubles x\n  return 2*x\n}"
    val prose = "just some words here"
    val df = Seq((1L, code), (2L, prose)).toDF("id", "t")
    val out = TextAnalysis.codeQualitySignals(df, col("id"), col("t"))
      .orderBy("id").collect()
    val c = out(0)
    assert(c.getAs[Long]("n_lines") == 4L)
    assert(c.getAs[Long]("comment_lines") == 1L)
    assert(c.getAs[Long]("comment_ppm") == 250000L)
    assert(c.getAs[Long]("brace_delta") == 0L)
    val p = out(1)
    assert(p.getAs[Long]("n_lines") == 1L && p.getAs[Long]("brace_delta") == 0L)
    assert(p.getAs[Long]("alpha_ppm") == 1000000L) // letters only
    // unbalanced brace flags truncation
    val trunc = Seq((3L, "f() {\n  g();")).toDF("id", "t")
    assert(TextAnalysis.codeQualitySignals(trunc, col("id"), col("t"))
      .head().getAs[Long]("brace_delta") == 1L)
  }

  test("ML: batchPerceptron — hand-checked rounds on a separable set") {
    import graft.ext.Curation
    // x = (1, v); y separable by v's sign
    val df = Seq((2L, 1L), (3L, 1L), (-1L, -1L)).toDF("v", "y")
    val out = Curation.batchPerceptron(df,
        features = Seq(lit(1L), col("v")), label = col("y"), rounds = 2)
      .orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // round 1: w = 0 -> every margin 0 -> all 3 misclassified ->
    // w = (sum y, sum y*v) = (1, 6); round 2: all correct, w frozen
    assert(out.toSeq == Seq((1L, 3L, 1L, 6L), (2L, 0L, 1L, 6L)))
  }

  test("E8: dsirScores — target-like raw docs outscore target-unlike ones") {
    import graft.ext.Curation
    val docs = Seq(
      (1L, "alpha alpha alpha alpha", true),   // target model: all alpha
      (2L, "alpha alpha alpha", true),
      (10L, "alpha alpha alpha alpha", false), // raw, target-like
      (11L, "beta beta beta beta", false)      // raw, target-unlike
    ).toDF("doc_id", "text", "is_t")
    val out = Curation.dsirScores(docs, "text", "doc_id",
        isTarget = col("is_t"), buckets = 256)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(10L, 11L))        // raw pool only
    assert(out(10L)._1 == 4L && out(11L)._1 == 4L)
    assert(out(10L)._2 > 0L,  "alpha doc must look target-like")
    assert(out(11L)._2 < 0L,  "beta doc must look raw-like")
    assert(out(10L)._2 > out(11L)._2)
  }

  test("E1+: substringSpans — maximal shared runs, short docs silent") {
    import graft.ext.Dedup
    val shared = "a b c d e f g h i j k l" // 12 shared tokens
    val docs = Seq(
      (1L, s"$shared xx yy"),
      (2L, s"zz ww $shared qq"),
      (3L, "totally different words entirely here okay fine then"),
      (4L, "tiny")
    ).toDF("doc_id", "text")
    val out = Dedup.substringSpans(docs, "text", "doc_id",
        k = 8, minSpanTokens = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // ONE maximal span: doc1 pos 1..12 == doc2 pos 3..14
    assert(out.toSeq == Seq((1L, 2L, 1L, 3L, 12L)))
  }

  test("E4+: watermarkGreenStats — z from exact integers, short docs silent") {
    import graft.ext.TextAnalysis
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "single")  // < 2 tokens: no scored positions, no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.watermarkGreenStats(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L))
    val (n, g, z) = out(1L)
    assert(n == 5L && g >= 0L && g <= n)
    assert(z == (2.0 * g - n) / math.sqrt(n.toDouble))
  }

  test("E1+: templateSkeletons — digit variants family up, singletons drop") {
    import graft.ext.Dedup
    val docs = Seq(
      (1L, "Showing 1-10 of 234 results!"),
      (2L, "Showing 11-20 of 234 results!"),
      (3L, "Showing 11-20 of 234 results!"),   // byte-exact dup of 2
      (4L, "a completely different page body")
    ).toDF("doc_id", "text")
    val out = Dedup.templateSkeletons(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // one family: 3 docs, 2 distinct raw texts, first id 1; doc 4 silent
    assert(out.toSeq == Seq((3L, 2L, 1L)))
  }

  test("E6: weightedSample — deterministic, weight-gated, k-bounded") {
    import graft.ext.Curation
    val docs = (1L to 200L).map(i => (i, if (i <= 100) 1000L else 10L))
      .toDF("doc_id", "w")
    val s1 = Curation.weightedSample(docs, "doc_id", col("w"), k = 20)
      .collect().map(_.getLong(0)).toSeq
    val s2 = Curation.weightedSample(docs, "doc_id", col("w"), k = 20)
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2 && s1.length == 20)          // reproducible, k rows
    // 100x weight -> heavy ids dominate the sample
    assert(s1.count(_ <= 100) >= 15, s"heavy ids underrepresented: $s1")
    // non-positive weights are excluded entirely
    val withZero = docs.withColumn("w",
      when(col("doc_id") <= 100, 0L).otherwise(col("w")))
    val s3 = Curation.weightedSample(withZero, "doc_id", col("w"), k = 20)
      .collect().map(_.getLong(0))
    assert(s3.forall(_ > 100))
  }
}
