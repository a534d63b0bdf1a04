package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{ChangepointsExact, Graph, Multimodal, TextAnalysis}

/** Round-10 operators: exact changepoints (optimal partitioning),
  * strongly connected components, unigram Viterbi segmentation, and
  * the exact multimodal feature trio (image block stats, audio frame
  * stats, video frame sample). */
class Round10Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- ChangepointsExact ----------------------------------------------

  test("X3: changepoints — flat series has no cuts, a level shift has one") {
    val flat = Seq(Seq.fill(10)(100L)).toDF("s")
      .select(ChangepointsExact.changepointsExact(col("s"), 1000L).as("cp"))
      .head.getSeq[Long](0)
    // cost of one segment of constant 100: 10·10⁴ − (10·100)² div 10 = 0
    assert(flat == Seq(1000L * -1 + 0 + 1000L)) // F(n) = -β + C + β = 0
    assert(flat == Seq(0L))

    val shift = Seq((Seq.fill(8)(0L) ++ Seq.fill(8)(1000L))).toDF("s")
      .select(ChangepointsExact.changepointsExact(col("s"), 1000L).as("cp"))
      .head.getSeq[Long](0)
    // two flat segments cost 0 each; one cut at index 8; total = β = 1000
    assert(shift == Seq(1000L, 8L))
  }

  test("X3: changepoints codegen path agrees with interpreted compute()") {
    val r = new scala.util.Random(7)
    val rows = (0 until 80).map { _ =>
      Seq.fill(3 + r.nextInt(25))(r.nextInt(2000).toLong - 500L)
    }
    val got = rows.toDF("s")
      .select(ChangepointsExact.changepointsExact(col("s"), 50000L).as("cp"))
      .collect().map(_.getSeq[Long](0))
    val want = rows.map(s => ChangepointsExact.compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(s.toArray),
      50000L).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq)
    assert(got.toSeq == want)
    // nulls poison; empty poisons
    val n = Seq(Option.empty[Seq[Long]]).toDF("s")
      .select(ChangepointsExact.changepointsExact(col("s"), 10L).as("cp"))
      .collect()
    assert(n.head.isNullAt(0))
    val e = Seq(Seq.empty[Long]).toDF("s")
      .select(ChangepointsExact.changepointsExact(col("s"), 10L).as("cp"))
      .collect()
    assert(e.head.isNullAt(0))
  }

  test("X3: changepoints match a brute-force optimal partition") {
    // brute force over all 2^(n-1) cuts for small n
    def brute(xs: Seq[Long], pen: Long): Long = {
      val n = xs.length
      def segCost(a: Int, b: Int): Long = { // [a, b)
        val s = xs.slice(a, b)
        val sum = s.sum
        s.map(x => x * x).sum - (sum * sum) / (b - a)
      }
      (0 until (1 << (n - 1))).map { mask =>
        val cuts = (1 until n).filter(i => ((mask >> (i - 1)) & 1) == 1)
        val bounds = 0 +: cuts :+ n
        bounds.sliding(2).map { case Seq(a, b) => segCost(a, b) }.sum +
          pen * (cuts.length + 1) - pen
      }.min
    }
    val r = new scala.util.Random(13)
    (0 until 25).foreach { _ =>
      val xs = Seq.fill(2 + r.nextInt(9))(r.nextInt(200).toLong)
      val pen = 1L + r.nextInt(5000)
      val got = Seq(xs).toDF("s")
        .select(ChangepointsExact.changepointsExact(col("s"), pen).as("cp"))
        .head.getSeq[Long](0)
      assert(got.head == brute(xs, pen), s"series $xs pen $pen")
    }
  }

  // ---- SCC --------------------------------------------------------------

  test("E-graph: SCC labels a cycle, singletons, and two joined cycles") {
    // 1→2→3→1 (one SCC), 3→4→5 (two singletons), 6→7→6 (one SCC),
    // 5→6 links but no back-path
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (7L, 6L)).toDF("src", "dst")
    val got = Graph.stronglyConnectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L,
      6L -> 6L, 7L -> 6L))
  }

  test("E-graph: SCC driver Tarjan ≡ distributed pointer doubling " +
      "(random digraphs)") {
    val rnd = new scala.util.Random(31)
    (0 until 5).foreach { _ =>
      val n = 8 + rnd.nextInt(10)
      val edges = Seq.fill(2 * n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).distinct
      val df = edges.toDF("src", "dst")
      val fast = Graph.stronglyConnectedComponents(df, "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Graph.stronglyConnectedComponents(df, "src", "dst",
          smallGraphFastPath = false)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == dist, s"edges $edges")
    }
  }

  test("E-graph: SCC empty input and the audit-slice node cap") {
    val empty = Graph.stronglyConnectedComponents(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst")
    assert(empty.count() == 0)
    val big = spark.range(100001)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val e = intercept[IllegalArgumentException] {
      Graph.stronglyConnectedComponents(big, "src", "dst").collect()
    }
    assert(e.getMessage.contains("audit-slice"))
  }

  // ---- unigram segmentation --------------------------------------------

  test("E4: unigram segmentation maximizes Σcnt·64 − |pieces| exactly") {
    // corpus: "ab" ×3, "b" ×1 → pieces (minCount 1):
    //   a:3, b:4 (3 from "ab" + 1 from "b"), ab:3
    // segment "ab": {ab} → 3·64−1 = 191; {a,b} → (3·64−1)+(4·64−1) = 446
    // → the DP must pick {a,b} (mass-additive objective); score 446.
    // segment "b": {b} → 255.
    val docs = Seq((1L, "ab ab"), (2L, "ab b")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSegmentScores(docs, col("text"),
        maxPieceLen = 4, minCount = 1L, topWords = 10)
      .orderBy(col("word_len"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 1L, 255L), (2L, 1L, 3L, 446L)))
  }

  test("E4: unknown characters segment at count 0") {
    // "xq" appears once; with minCount 5 no piece qualifies, so the
    // word segments as two unknown chars: 2·(0·64 − 1) = −2
    val docs = Seq((1L, "xq")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSegmentScores(docs, col("text"),
        maxPieceLen = 4, minCount = 5L, topWords = 10)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got.toSeq == Seq((2L, -2L)))
  }

  // ---- text cleanup + maxsim ---------------------------------------------

  test("E7: normalizeUnicodeScoped applies the documented mapping set") {
    val in = Seq(
      "ﬁn ﬂow",                       // ligatures
      "Ａｂｃ！",                      // full-width ASCII
      "a​b c　d",       // zero-width + space-likes
      "‘q’ “w” – — − …",
      "plain").toDF("t")
      .select(TextAnalysis.normalizeUnicodeScoped(col("t")).as("n"))
      .collect().map(_.getString(0))
    assert(in.toSeq == Seq(
      "fin flow", "Abc!", "ab c d", "'q' \"w\" - - - ...", "plain"))
  }

  test("E7: repairLineWraps — dehyphenate, wrap-collapse, paragraphs kept") {
    val got = Seq(
      "exam-\nple",
      "line one\nline two",
      "para one\n\npara two",
      "a-\nb c\nd\n\ne",
      "odd\n\n\ncase" // \n\n protected left-to-right, tail \n -> space
    ).toDF("t")
      .select(TextAnalysis.repairLineWraps(col("t")).as("f"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq(
      "example", "line one line two", "para one\n\npara two",
      "ab c d\n\ne", "odd\n\n case"))
  }

  test("E3+: maxsimRerank matches a Scala replica of the md5 embedding") {
    def vec(tok: String): Array[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (0 until 8).map(j =>
        java.lang.Long.parseLong(hex.substring(j, j + 1), 16) - 8L).toArray
    }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val docs = Seq(
      (1L, "fast scan table fast"),
      (2L, "slow join window"),
      (3L, "scan scan scan")).toDF("doc_id", "text")
    val got = graft.ext.Similarity.maxsimRerank(docs, col("doc_id"),
        col("text"), Seq(("q1", "fast scan")), maxDocTokens = 16, topK = 3)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    // replica: all three docs share a token? doc2 shares none of
    // {fast, scan} -> not a candidate
    def score(dtoks: Seq[String]): Long =
      Seq("fast", "scan").map(q =>
        dtoks.map(d => dot(vec(q), vec(d))).max).sum
    val want = Seq(
      1L -> score(Seq("fast", "scan", "table", "fast")),
      3L -> score(Seq("scan", "scan", "scan")))
      .sortBy { case (id, s) => (-s, id) }
    assert(got.toSeq == want)
  }

  test("E7: sentenceStats — splits, empties, punctuation runs") {
    val got = Seq(
      "One. Two two! Three?? ",
      "no punctuation at all",
      "...",
      "a.b. c").toDF("t")
      .select(TextAnalysis.sentenceStats(col("t")).as("s"))
      .select(col("s.n_sentences"), col("s.sum_chars"), col("s.max_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (3L, 3L + 7L + 5L, 7L),  // "One", "Two two", "Three"
      (1L, 21L, 21L),
      (0L, 0L, 0L),
      (3L, 1L + 1L + 1L, 1L))) // "a", "b", "c"
  }

  test("A1: largestRemainderByGroup — per-group totals hold exactly") {
    val df = Seq(
      ("r1", "a", 1L, 10L), ("r1", "b", 1L, 10L), ("r1", "c", 1L, 10L),
      ("r2", "x", 5L, 7L), ("r2", "y", 3L, 7L))
      .toDF("g", "k", "w", "tot")
    val got = graft.ops.Aggregates.largestRemainderByGroup(df,
        Seq(col("g")), Seq(col("k")), col("w"), col("tot"))
      .orderBy(col("g"), col("k"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    // r1: 10 over equal weights -> floors 3,3,3, leftover 1 to "a"
    // r2: 7 over 5:3 -> floors 4,2; remainders 3/8, 5/8 -> +1 to y
    assert(got.toSeq == Seq(("r1", "a", 4L), ("r1", "b", 3L),
      ("r1", "c", 3L), ("r2", "x", 4L), ("r2", "y", 3L)))
    // Σ alloc ≡ total per group, always
    val sums = graft.ops.Aggregates.largestRemainderByGroup(df,
        Seq(col("g")), Seq(col("k")), col("w"), col("tot"))
      .groupBy(col("g")).agg(sum(col("alloc")).as("s"), max(col("total")))
      .collect().map(r => r.getLong(1) -> r.getLong(2))
    assert(sums.forall { case (s, t) => s == t })
  }

  test("J-asof: asofJoinDirected — directions, tolerance, nearest ties") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    val left = Seq((1L, t(100)), (1L, t(200)), (1L, t(350)))
      .toDF("k", "ts")
    val right = Seq((1L, t(90), "a"), (1L, t(150), "b"), (1L, t(300), "c"))
      .toDF("k", "ts", "v")
    def run(d: String, tol: Long = -1L) =
      graft.ops.TimeSeriesOps.asofJoinDirected(left, right, "k", "ts",
          Seq("v"), direction = d, toleranceMicros = tol)
        .orderBy(col("ts"))
        .collect().map(r => Option(r.getString(r.fieldIndex("asof_v"))))
    // lts 100: backward a(90), forward b(150); lts 200: b(150)/c(300);
    // lts 350: c(300)/none
    assert(run("backward").toSeq == Seq(Some("a"), Some("b"), Some("c")))
    assert(run("forward").toSeq == Seq(Some("b"), Some("c"), None))
    // nearest: 100 -> a (10 vs 50); 200 -> b (50 vs 100); 350 -> c
    assert(run("nearest").toSeq == Seq(Some("a"), Some("b"), Some("c")))
    // tolerance 30 s: backward keeps only gaps <= 30 s
    assert(run("backward", 30L * 1000000L).toSeq ==
      Seq(Some("a"), None, None))
    // exact tie goes backward: left at 225 is 75 from b and 75 from c
    val tie = Seq((1L, t(225))).toDF("k", "ts")
    val got = graft.ops.TimeSeriesOps.asofJoinDirected(tie, right, "k",
        "ts", Seq("v"), "nearest").collect().head
    assert(got.getString(got.fieldIndex("asof_v")) == "b")
    // equal timestamps: backward <= includes the equal row, forward >=
    val eq = Seq((1L, t(150))).toDF("k", "ts")
    def eqRun(d: String) = {
      val r = graft.ops.TimeSeriesOps.asofJoinDirected(
        eq, right, "k", "ts", Seq("v"), d).collect().head
      r.getString(r.fieldIndex("asof_v"))
    }
    assert(eqRun("backward") == "b" && eqRun("forward") == "b")
  }

  test("S2+: openFixedWidth — carving, trims, short lines, junk casts") {
    val dir = java.nio.file.Files.createTempDirectory("fw").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/f.txt"),
      Seq("   42hello   123 4.5",
        "    7x        -9-0.5",
        "    1tiny", // short: cols past 'name' null
        "   bad???    zzz abc" // junk: long/double casts -> null
      ).mkString("\n").getBytes("UTF-8"))
    val got = graft.io.Sources.openFixedWidth(spark, s"$dir/f.txt", Seq(
        ("id", 1, 5, "long"), ("name", 6, 8, "string"),
        ("n", 14, 3, "long"), ("v", 17, 4, "double")))
      .collect().map(r => (Option(r.get(0)), r.getString(1),
        Option(r.get(2)), Option(r.get(3))))
    assert(got(0) == ((Some(42L), "hello", Some(123L), Some(4.5))))
    assert(got(1) == ((Some(7L), "x", Some(-9L), Some(-0.5))))
    assert(got(2) == ((Some(1L), "tiny", None, None)))
    assert(got(3) == ((None, "d???", None, None)))
    // bad specs are typed errors
    intercept[IllegalArgumentException] {
      graft.io.Sources.openFixedWidth(spark, s"$dir/f.txt",
        Seq(("a", 0, 3, "long")))
    }
    intercept[IllegalArgumentException] {
      graft.io.Sources.openFixedWidth(spark, s"$dir/f.txt",
        Seq(("a", 1, 3, "timestamp")))
    }
  }

  test("E7: tokensMultilingual — CJK bigrams vs whitespace by lang") {
    val df = Seq(("en", "hello big world"), ("zh", "深度学习 好"),
      ("ja", "ab"), ("es", "hola"))
      .toDF("lang", "t")
      .select(col("lang"),
        TextAnalysis.tokensMultilingual(col("t"), col("lang")).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(df("en") == Seq("hello", "big", "world"))
    assert(df("zh") == Seq("深度", "度学", "学习", "好")) // bigrams + lone char
    assert(df("ja") == Seq("ab")) // 2-char run -> one bigram
    assert(df("es") == Seq("hola"))
  }

  test("E7: logTemplate masks UUID, hex, IP and digit runs in order") {
    val got = Seq(
      "req 550e8400-e29b-41d4-a716-446655440000 from 10.0.12.9 took 42ms",
      "cache deadbeefcafe hit id=7",
      "plain words only").toDF("m")
      .select(TextAnalysis.logTemplate(col("m")).as("t"))
      .collect().map(_.getString(0))
    assert(got(0) == "req <UUID> from <IP> took <N>ms")
    assert(got(1) == "cache <HEX> hit id=<N>")
    assert(got(2) == "plain words only")
  }

  // ---- multimodal exact feature trio -------------------------------------

  test("E5: imageBlockStats recovers the generator formula per block") {
    val png = udf((id: Long) => Multimodal.syntheticPng(16, 8, id))
    val media = spark.range(3).select(col("id"))
      .withColumn("payload", png(col("id")))
    val got = Multimodal.imageBlockStats(media, "id", "payload", factor = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    (0L until 3L).foreach { id =>
      (0 until 2).foreach { bx =>
        var sum = 0L
        for (x <- bx * 8 until bx * 8 + 8; y <- 0 until 8)
          sum += 3 * ((x * 31 + y * 17 + id * 7) % 256)
        assert(got((id, bx.toLong, 0L)) == ((64L, sum)), s"id $id bx $bx")
      }
    }
  }

  test("E5: imageBlockStats partial edge blocks carry true pixel counts") {
    val png = udf((id: Long) => Multimodal.syntheticPng(10, 6, id))
    val media = spark.range(1).select(col("id"))
      .withColumn("payload", png(col("id")))
    val counts = Multimodal.imageBlockStats(media, "id", "payload", 8)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(counts == Map((0L, 0L) -> 48L, (1L, 0L) -> 12L))
  }

  test("E5: audioFrameStats — exact energy and zero crossings") {
    val wav = udf((id: Long) => Multimodal.syntheticWav(500, 8000, id))
    val media = spark.range(2).select(col("id"))
      .withColumn("payload", wav(col("id")))
    val got = Multimodal.audioFrameStats(media, "id", "payload", 200)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    (0L until 2L).foreach { id =>
      val k = (7 + id % 5).toInt
      val s = (0 until 500).map(i => ((i.toLong * k) % 2048 - 1024) * 16)
      (0 until 3).foreach { f =>
        val fr = s.slice(f * 200, math.min((f + 1) * 200, 500))
        val sumSq = fr.map(x => x * x).sum
        val zcr = fr.sliding(2).count(p => p.length == 2 && p(0) * p(1) < 0)
        assert(got((id, f.toLong)) ==
          ((fr.length.toLong, sumSq, zcr.toLong)), s"id $id frame $f")
      }
    }
  }

  test("E5: videoFrameSample strides the real GIF frames") {
    val gif = udf((id: Long) =>
      Multimodal.syntheticGif(8, 4, frames = 5, seed = id))
    val media = spark.range(2).select(col("id"))
      .withColumn("payload", gif(col("id")))
    val got = Multimodal.videoFrameSample(media, "id", "payload",
        stride = 2, maxFrames = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    (0L until 2L).foreach { id =>
      Seq(0, 2).foreach { f =>
        val v = 40 + math.floorMod(id * 7, 100).toInt + f * 16
        assert(got((id, f.toLong)) == ((5L, 32L, 3L * v * 32)),
          s"id $id frame $f")
      }
    }
    // non-video payloads yield no rows
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    assert(Multimodal.videoFrameSample(junk, "id", "payload", 2, 2)
      .count() == 0)
  }
}
