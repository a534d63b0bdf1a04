package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{ChangepointsExact, Graph}

/** Round-11 fixes: the q411 driver fast path for the Markov entropy
  * rate (fast ≡ distributed), SCC closure-convergence detection,
  * checked arithmetic in the changepoint DP, and the per-group
  * largest-remainder invariant in degenerate groups. */
class Round11Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- driver contract smoke ------------------------------------------

  test("contract: entry() returns rows; maps cover every declared query") {
    assert(graft.SparkEntry.queries.size == graft.queries.Declared.all.size)
    assert(graft.SparkEntry.oracleSql.size ==
      graft.queries.Declared.all.count(_.oracle.isDefined))
    if (new java.io.File("/root/testdata/sf0.001").isDirectory)
      assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  // ---- markovEntropyRate fast path ------------------------------------

  test("A-stat: markovEntropyRate driver fast path == distributed plan") {
    def ts(x: Long) = new java.sql.Timestamp(x * 1000L)
    val r = new scala.util.Random(11)
    val types = Seq("view", "cart", "buy", "search", "help")
    val ev = (0 until 400).map { i =>
      (r.nextInt(7).toLong, ts(i.toLong), i.toLong, types(r.nextInt(types.size)))
    }.toDF("user_id", "t", "eid", "etype")
    def run(fast: Boolean) = graft.ops.EventAnalytics.markovEntropyRate(
      ev, col("user_id"), col("t"), col("eid"), col("etype"),
      driverFastPath = fast)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).sortBy(_._1).toSeq
    val fastRows = run(true)
    val distRows = run(false)
    assert(fastRows == distRows)
    assert(fastRows.nonEmpty)
  }

  // ---- SCC convergence fence -------------------------------------------

  test("graph: SCC distributed path converges early on a small cycle") {
    // 10-cycle: closure needs diameter 10 <= 2^4; fast path disabled
    val e = (0L until 10L).map(i => (i, (i + 1) % 10)).toDF("s", "d")
    val out = Graph.stronglyConnectedComponents(e, "s", "d",
      maxDoublings = 4, smallGraphFastPath = false)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(out == (0L until 10L).map(i => (i, 0L)))
  }

  test("graph: SCC refuses when closure has not converged (diameter > 2^k)") {
    // 40-cycle with only 2 doubling rounds (covers diameter 4): the
    // old code silently split the SCC; now it must raise
    val e = (0L until 40L).map(i => (i, (i + 1) % 40)).toDF("s", "d")
    val ex = intercept[IllegalStateException] {
      Graph.stronglyConnectedComponents(e, "s", "d",
        maxDoublings = 2, smallGraphFastPath = false).collect()
    }
    assert(ex.getMessage.contains("not converged"))
  }

  // ---- changepoint overflow guard ---------------------------------------

  test("X3: changepoints returns null (not a wrapped argmin) on overflow") {
    // x*x overflows a long for |x| > ~3.04e9
    val big = Seq(Seq(4000000000L, 4000000000L, 1L)).toDF("s")
      .select(ChangepointsExact.changepointsExact(col("s"), 10L).as("cp"))
      .head
    assert(big.isNullAt(0))
    // each x² fits but the Σx² prefix overflows across elements
    val acc = Seq(Seq.fill(4)(3000000000L)).toDF("s")
      .select(ChangepointsExact.changepointsExact(col("s"), 10L).as("cp"))
      .head
    assert(acc.isNullAt(0))
    // a safely-bounded series still computes (guard is not over-eager)
    val ok = Seq(Seq(1000000L, 1000000L, 5000000L)).toDF("s")
      .select(ChangepointsExact.changepointsExact(col("s"), 1L).as("cp"))
      .head
    assert(!ok.isNullAt(0))
  }

  // ---- CJK bigrams on supplementary-plane ideographs ---------------------

  test("E7: tokensMultilingual bigrams are codePoint-aware (Ext-B)") {
    // U+20000..U+20002 live outside the BMP (UTF-16 surrogate pairs);
    // bigrams must split on CODE POINTS, never through a pair
    val s = (0x20000 to 0x20002).map(c => new String(Character.toChars(c)))
      .mkString
    val out = Seq((s, "zh")).toDF("text", "lang")
      .select(graft.ext.TextAnalysis.tokensMultilingual(
        col("text"), col("lang")).as("t"))
      .head.getSeq[String](0)
    val want = Seq(
      new String(Character.toChars(0x20000)) + new String(Character.toChars(0x20001)),
      new String(Character.toChars(0x20001)) + new String(Character.toChars(0x20002)))
    assert(out == want)
    // mixed BMP + Ext-B run stays pairwise-correct too
    val mixed = "中" + new String(Character.toChars(0x20000)) + "文"
    val out2 = Seq((mixed, "zh")).toDF("text", "lang")
      .select(graft.ext.TextAnalysis.tokensMultilingual(
        col("text"), col("lang")).as("t"))
      .head.getSeq[String](0)
    assert(out2 == Seq("中" + new String(Character.toChars(0x20000)),
      new String(Character.toChars(0x20000)) + "文"))
  }

  // ---- streaming near-dup screen == batch operator ------------------------

  test("T-state/E2: streamingNearDupScreen == batch minhashNearDuplicatesAgainst") {
    // bands=4/rows=4 exercises non-trivial banding: equality holds ONLY
    // if the stream's scan-side signatures and band hashes are
    // bit-identical to the batch aggregation's
    def doc(i: Long, words: Seq[String]) = (i, words.mkString(" "))
    val base = (0 until 12).map(w => s"w$w")
    val corpus = Seq(
      doc(1, base), doc(2, base.map(w => w + "x")), doc(3, base.reverse))
      .toDF("doc_id", "text")
    val fresh = Seq(
      doc(101, base :+ "extra"),            // near-dup of 1
      doc(102, (0 until 12).map(w => s"z$w")), // unrelated
      doc(103, base.reverse :+ "tail"))     // near-dup of 3
      .toDF("doc_id", "text")
    val batch = graft.ext.Dedup.minhashNearDuplicatesAgainst(
      corpus, fresh, "text", "doc_id",
      shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.5)
      .select(col("id_corpus"), col("id_new"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_sndq").toString
    fresh.coalesce(1).write.mode("append").parquet(dir)
    fresh.coalesce(1).write.mode("append").parquet(dir) // re-delivery
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val q = graft.streaming.StreamOps.streamingNearDupScreen(
          stream, corpus, "text", "doc_id",
          shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.5)
        .toDF().writeStream.format("memory").queryName("sndq")
        .outputMode("append").start()
      q.processAllAvailable(); q.stop(); q.awaitTermination(10000)
      val got = spark.table("sndq").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // emit-once: re-delivered batch adds NO rows (no duplicates)
      assert(got.length == got.toSet.size)
      assert(got.toSet == batch)
      assert(batch.exists(_._2 == 101L) && batch.exists(_._2 == 103L))
      assert(!batch.exists(_._2 == 102L))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  // ---- positional retrieval + chunking edges -----------------------------

  test("E7: phraseSearch handles repeated terms and overlapping matches") {
    val docs = Seq(
      (1L, "table table table x"),   // "table table" occurs at 0 and 1
      (2L, "table x table"),          // never consecutively
      (3L, "x table table")           // once, at position 1
    ).toDF("doc_id", "text")
    val out = graft.ext.Curation.phraseSearch(
        docs, "text", "doc_id", Seq("table", "table"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L, 0L), (3L, 1L, 1L)))
  }

  test("E7: chunkPassages spans — exact window, shorter doc, stride tail") {
    def chunksOf(text: String) = graft.ext.Curation.chunkPassages(
        Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id",
        window = 4, stride = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(5))).toSeq
    // n == window: one chunk, full span
    assert(chunksOf("a b c d") == Seq((0L, 0L, 4L, "a b c d")))
    // n < window: one short chunk
    assert(chunksOf("a b") == Seq((0L, 0L, 2L, "a b")))
    // n = 6, window 4, stride 3: chunks at 0 and 3, second runs short
    assert(chunksOf("a b c d e f") ==
      Seq((0L, 0L, 4L, "a b c d"), (1L, 3L, 6L, "d e f")))
    // n = 7: second chunk exactly fills [3,7)
    assert(chunksOf("a b c d e f g") ==
      Seq((0L, 0L, 4L, "a b c d"), (1L, 3L, 7L, "d e f g")))
    // n = 8: third chunk [6,8) — every token covered, none past end
    assert(chunksOf("a b c d e f g h") ==
      Seq((0L, 0L, 4L, "a b c d"), (1L, 3L, 7L, "d e f g"),
        (2L, 6L, 8L, "g h")))
  }

  test("E7: proximitySearch window semantics — inside vs just outside") {
    val docs = Seq(
      (1L, "fast x x x scan"),  // span [0,5) holds both at window 5
      (2L, "fast x x x x scan") // distance 5 — outside a 5-token window
    ).toDF("doc_id", "text")
    val out = graft.ext.Curation.proximitySearch(
        docs, "text", "doc_id", Seq("fast", "scan"), window = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 1L, 0L)))
  }

  // ---- cut vertices / bridges ---------------------------------------------

  test("graph: cutVerticesAndBridges — barbell, pendant, cycle") {
    // two triangles {1,2,3} and {4,5,6} joined by bridge 3—4, plus a
    // pendant 7 hanging off 6
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L), (6L, 7L)).toDF("a", "b")
    val (cuts, bridges) = graft.ext.Graph.cutVerticesAndBridges(e, "a", "b")
    assert(cuts.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L, 6L))
    assert(bridges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((3L, 4L), (6L, 7L)))
    // a pure cycle has neither; parallel edges and self-loops are
    // dropped (simple-graph semantics)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 2L), (2L, 2L))
      .toDF("a", "b")
    val (c2, b2) = graft.ext.Graph.cutVerticesAndBridges(cyc, "a", "b")
    assert(c2.count() == 0 && b2.count() == 0)
  }

  // ---- Smith-Waterman local alignment -------------------------------------

  test("X3: tokenSmithWaterman anchors + codegen agrees with compute()") {
    import graft.ext.TokenSmithWaterman.tokenSmithWaterman
    def sw(a: Seq[String], b: Seq[String]): Long =
      Seq((a, b)).toDF("a", "b")
        .select(tokenSmithWaterman(col("a"), col("b")).as("s"))
        .head.getLong(0)
    assert(sw(Seq("a", "b", "c"), Seq("a", "b", "c")) == 6L) // 3 matches
    assert(sw(Seq("a", "b"), Seq("x", "y")) == 0L)           // disjoint
    // local region beats global: flanks never drag the score below 0
    assert(sw(Seq("x", "a", "b", "c", "y"), Seq("z", "a", "b", "c", "w")) == 6L)
    // one gap: a _ c aligned to a c -> 2 - 1 + 2 = 3
    assert(sw(Seq("a", "b", "c"), Seq("a", "c")) == 3L)
    // codegen path == interpreted kernel on random fixtures
    val r = new scala.util.Random(11)
    val vocab = Seq("p", "q", "r", "s")
    val rows = (0 until 60).map { _ =>
      (Seq.fill(1 + r.nextInt(20))(vocab(r.nextInt(4))),
        Seq.fill(1 + r.nextInt(20))(vocab(r.nextInt(4))))
    }
    val got = rows.toDF("a", "b")
      .select(tokenSmithWaterman(col("a"), col("b"), 3, -2, -1).as("s"))
      .collect().map(_.getLong(0)).toSeq
    val want = rows.map { case (a, b) =>
      def ad(x: Seq[String]) =
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          x.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      graft.ext.TokenSmithWaterman.compute(ad(a), ad(b), 3, -2, -1)
    }
    assert(got == want)
  }

  // ---- Needleman-Wunsch global alignment ----------------------------------

  test("X3: tokenNeedlemanWunsch anchors + codegen agrees with kernel") {
    import graft.ext.TokenNeedlemanWunsch.tokenNeedlemanWunsch
    def nw(a: Seq[String], b: Seq[String]): Long =
      Seq((a, b)).toDF("a", "b")
        .select(tokenNeedlemanWunsch(col("a"), col("b")).as("s"))
        .head.getLong(0)
    assert(nw(Seq("a", "b", "c"), Seq("a", "b", "c")) == 6L)
    assert(nw(Seq("a", "b", "c"), Seq("a", "c")) == 3L)  // one gap
    assert(nw(Seq("a", "b"), Seq("x", "y")) == -2L)      // two mismatches
    assert(nw(Seq("a"), Seq.empty[String]) == -1L)       // all-gap column
    // GLOBAL vs LOCAL divergence: flanking noise drags NW, not SW
    assert(nw(Seq("x", "a", "b", "c", "y"), Seq("z", "a", "b", "c", "w")) == 4L)
    val r = new scala.util.Random(13)
    val vocab = Seq("p", "q", "r", "s")
    val rows = (0 until 60).map { _ =>
      (Seq.fill(r.nextInt(20))(vocab(r.nextInt(4))),
        Seq.fill(r.nextInt(20))(vocab(r.nextInt(4))))
    }
    val got = rows.toDF("a", "b")
      .select(tokenNeedlemanWunsch(col("a"), col("b"), 3, -2, -1).as("s"))
      .collect().map(_.getLong(0)).toSeq
    val want = rows.map { case (a, b) =>
      def ad(x: Seq[String]) =
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          x.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      graft.ext.TokenSmithWaterman.computeGlobal(ad(a), ad(b), 3, -2, -1)
    }
    assert(got == want)
  }

  // ---- LIS patience kernel -------------------------------------------------

  test("X3: lisLength anchors + patience == O(n^2) DP on random series") {
    import graft.ext.LisLength.lisLength
    def lis(xs: Seq[Long]): Int =
      Seq(Tuple1(xs)).toDF("v").select(lisLength(col("v")).as("l"))
        .head.getInt(0)
    assert(lis(Seq(1L, 2L, 3L)) == 3)
    assert(lis(Seq(3L, 2L, 1L)) == 1)
    assert(lis(Seq(2L, 2L, 2L)) == 1)             // STRICT increase
    assert(lis(Seq(10L, 1L, 2L, 11L, 3L, 4L)) == 4) // 1 2 3 4
    assert(lis(Seq.empty[Long]) == 0)
    def dpRef(xs: Seq[Long]): Int =
      if (xs.isEmpty) 0
      else {
        val dp = Array.fill(xs.length)(1)
        for (i <- xs.indices; j <- 0 until i if xs(j) < xs(i))
          dp(i) = math.max(dp(i), dp(j) + 1)
        dp.max
      }
    val r = new scala.util.Random(17)
    val rows = (0 until 80).map(_ => Seq.fill(r.nextInt(40))(r.nextInt(15).toLong))
    val got = rows.map(Tuple1(_)).toDF("v")
      .select(lisLength(col("v")).as("l")).collect().map(_.getInt(0)).toSeq
    assert(got == rows.map(dpRef))
  }

  // ---- largestRemainderByGroup degenerate groups -------------------------

  test("A1: largestRemainderByGroup sums to total with all-zero weights") {
    val df = Seq(
      ("g1", "a", 0L, 7L), ("g1", "b", 0L, 7L), ("g1", "c", 0L, 7L),
      ("g2", "a", 1L, 10L), ("g2", "b", 1L, 10L), ("g2", "c", 1L, 10L))
      .toDF("g", "k", "w", "tot")
    val out = graft.ops.Aggregates.largestRemainderByGroup(
      df, Seq(col("g")), Seq(col("k")), col("w"), col("tot"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Long]("alloc"))).toMap
    // g1: all-zero weights -> near-equal split, Σ == 7 (was 3 before)
    assert(out(("g1", "a")) == 3L && out(("g1", "b")) == 2L &&
      out(("g1", "c")) == 2L)
    // g2: the normal path is unchanged — floors 3 each, one bump
    assert(out(("g2", "a")) == 4L && out(("g2", "b")) == 3L &&
      out(("g2", "c")) == 3L)
  }

  test("A1: largestRemainderByGroup raises on disagreeing totals") {
    val df = Seq(("g1", "a", 2L, 7L), ("g1", "b", 3L, 9L))
      .toDF("g", "k", "w", "tot")
    val ex = intercept[Exception] {
      graft.ops.Aggregates.largestRemainderByGroup(
        df, Seq(col("g")), Seq(col("k")), col("w"), col("tot")).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("disagreeing totals")))
  }
}
