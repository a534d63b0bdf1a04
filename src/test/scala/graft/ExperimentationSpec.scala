package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Graph, JaroWinkler, TextAnalysis}
import graft.ops.{Experimentation, Features}

/** Specs for batch 22 (q217-q222): the Jaro-Winkler native expression,
  * JS divergence, mutual information, BH-FDR, CUPED and label
  * propagation. */
class ExperimentationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- JaroWinkler: doubles pinned to the oracle engine's
  // jaro_winkler_similarity on the classic literature pairs ----
  test("X3: JaroWinkler.compute matches oracle-engine doubles bit-for-bit") {
    def jw(a: String, b: String): Double = JaroWinkler.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("abcdef", "badcfe") == 0.8333333333333334) // jaro > 0.7, no prefix
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)   // below boost gate
    assert(jw("goldenrod lavender", "goldenrod lavendre") == 0.9888888888888889)
    assert(jw("same", "same") == 1.0)
    // empty-side contract is the ORACLE'S, not the textbook's: '' vs ''
    // is 0, not 1
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("", "x") == 0.0)
  }

  test("X3: JaroWinkler codegen path agrees with interpreted compute()") {
    val pairs = (0 until 200).map { i =>
      val r = new scala.util.Random(i)
      (r.alphanumeric.take(r.nextInt(9)).mkString,
        r.alphanumeric.take(r.nextInt(9)).mkString)
    }
    val got = pairs.toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
      .as[Double].collect()
    val want = pairs.map { case (a, b) => JaroWinkler.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b)) }
    assert(got.toSeq == want.toSeq)
    // null poisoning
    val n = Seq((Option.empty[String], Option("x"))).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect()
    assert(n.head.isNullAt(0))
  }

  // ---- banded DTW ----

  /** Unbanded reference DP (full O(n·m) table) for cross-checking the
    * banded kernel where the band covers the whole table. */
  private def dtwRef(a: Seq[Long], b: Seq[Long]): Long = {
    val INF = Long.MaxValue / 4
    val dp = Array.fill(a.length + 1, b.length + 1)(INF)
    dp(0)(0) = 0L
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val best = Seq(dp(i - 1)(j), dp(i)(j - 1), dp(i - 1)(j - 1)).min
      if (best < INF) dp(i)(j) = best + math.abs(a(i - 1) - b(j - 1))
    }
    dp(a.length)(b.length)
  }

  test("X3: DtwBanded — hand cases, wide-band == full DP, corridor nulls") {
    import graft.ext.DtwBanded
    def k(a: Seq[Long], b: Seq[Long], band: Int): Any = DtwBanded.compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.toArray),
      band)
    assert(k(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 1) == 0L)
    // classic warp: [1,3,4] vs [1,2,4] — best path |3-2| = 1
    assert(k(Seq(1L, 3L, 4L), Seq(1L, 2L, 4L), 1) == 1L)
    // constant offset accumulates per aligned step
    assert(k(Seq(0L, 0L, 0L), Seq(1L, 1L, 1L), 0) == 3L)
    // wide band reproduces the full (unbanded) DP on random sequences
    val r = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val a = Seq.fill(3 + r.nextInt(8))(r.nextInt(20).toLong)
      val b = Seq.fill(3 + r.nextInt(8))(r.nextInt(20).toLong)
      assert(k(a, b, 16) == dtwRef(a, b), s"$a vs $b")
    }
    // a TIGHTER band can only raise the cost (fewer admissible paths)
    (0 until 50).foreach { _ =>
      val a = Seq.fill(6)(r.nextInt(20).toLong)
      val b = Seq.fill(6)(r.nextInt(20).toLong)
      val wide = k(a, b, 16).asInstanceOf[Long]
      val tight = k(a, b, 1).asInstanceOf[Long]
      assert(tight >= wide, s"$a vs $b")
    }
    // length gap beyond the band: no admissible path
    assert(k(Seq(1L, 2L, 3L, 4L, 5L), Seq(1L), 2) == null)
    // empty side
    assert(k(Seq.empty[Long], Seq(1L), 3) == null)
  }

  test("X3: DtwBanded codegen path agrees with interpreted compute()") {
    import graft.ext.DtwBanded
    val r = new scala.util.Random(11)
    val rows = (0 until 120).map { _ =>
      (Seq.fill(2 + r.nextInt(10))(r.nextInt(1000).toLong),
        Seq.fill(2 + r.nextInt(10))(r.nextInt(1000).toLong))
    }
    val got = rows.toDF("a", "b")
      .select(DtwBanded.dtwBanded(col("a"), col("b"), 3).as("d"))
      .collect().map(x => if (x.isNullAt(0)) null else x.getLong(0))
    val want = rows.map { case (a, b) => DtwBanded.compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.toArray),
      3) }
    assert(got.toSeq == want.map {
      case null => null
      case v: java.lang.Long => v.longValue()
    }.toSeq)
    // null array poisons; null ELEMENT poisons
    val n = Seq((Option.empty[Seq[Long]], Option(Seq(1L)))).toDF("a", "b")
      .select(DtwBanded.dtwBanded(col("a"), col("b"), 3).as("d")).collect()
    assert(n.head.isNullAt(0))
    val withNullElem = Seq(1).toDF("x")
      .select(DtwBanded.dtwBanded(
        array(lit(1L), lit(null).cast("long")), array(lit(1L), lit(2L)), 3)
        .as("d")).collect()
    assert(withNullElem.head.isNullAt(0))
    // TWO instances in one projection: the generated locals must not
    // collide (fresh names), or the whole stage silently degrades to
    // interpreted mode — both values must still be correct
    val two = rows.take(20).toDF("a", "b")
      .select(DtwBanded.dtwBanded(col("a"), col("b"), 3).as("d3"),
        DtwBanded.dtwBanded(col("a"), col("b"), 1).as("d1"))
      .collect()
    rows.take(20).zip(two).foreach { case ((a, b), row) =>
      def k(band: Int) = DtwBanded.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.toArray),
        band)
      assert((if (row.isNullAt(0)) null else row.getLong(0)) ==
        (k(3) match { case null => null; case v: java.lang.Long => v.longValue() }))
      assert((if (row.isNullAt(1)) null else row.getLong(1)) ==
        (k(1) match { case null => null; case v: java.lang.Long => v.longValue() }))
    }
  }

  // ---- deflate length ----

  test("X3: DeflateLength — order properties, determinism, null poisoning") {
    import graft.ext.DeflateLength
    def dl(s: String): Long = DeflateLength.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    val rep = "the same line over and over. " * 40
    val prose = (0 until 40).map(i =>
      s"sentence $i talks about topic ${i % 7} with detail ${i * 13 % 29}.")
      .mkString(" ")
    val rnd = { val r = new scala.util.Random(3)
      r.alphanumeric.take(rep.length).mkString }
    // compressibility ordering: boilerplate < prose < random (each
    // normalized by byte length via same-length inputs where possible)
    assert(dl(rep).toDouble / rep.length <
      dl(prose).toDouble / prose.length)
    assert(dl(prose).toDouble / prose.length <
      dl(rnd).toDouble / rnd.length)
    assert(dl(rep) == dl(rep), "deterministic")
    assert(dl("") == 2L, "empty raw-deflate block is 2 bytes")
    // codegen path agrees with the kernel
    val got = Seq(rep, prose, rnd).toDF("t")
      .select(DeflateLength.deflateLength(col("t"))).as[Long].collect()
    assert(got.toSeq == Seq(dl(rep), dl(prose), dl(rnd)))
    val n = Seq(Option.empty[String]).toDF("t")
      .select(DeflateLength.deflateLength(col("t"))).collect()
    assert(n.head.isNullAt(0))
  }

  // ---- Aho-Corasick ----

  private def bruteCount(text: String, pats: Seq[String]): Long =
    pats.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }.sum

  test("X3: AhoCorasickCount — overlaps, fail links, brute-force parity") {
    import graft.ext.AhoCorasickCount
    def k(text: String, pats: Seq[String]): Long = AhoCorasickCount.count(
      AhoCorasickCount.build(pats),
      org.apache.spark.unsafe.types.UTF8String.fromString(text))
    assert(k("abc", Seq("ab", "b", "bc")) == 3L)
    assert(k("aaaa", Seq("aa")) == 3L) // overlapping positions count
    assert(k("ushers", Seq("he", "she", "his", "hers")) == 3L) // classic
    assert(k("", Seq("a")) == 0L)
    assert(k("xyz", Seq("a", "ab")) == 0L)
    // suffix-of-pattern outputs via fail chain: "abab" twice (overlap
    // at positions 2 and 4), "ba" twice — both found in one pass
    assert(k("cababab", Seq("abab", "ba")) == 2L + 2L)
    assert(k("cababab", Seq("abab", "ba")) ==
      bruteCount("cababab", Seq("abab", "ba")))
    val r = new scala.util.Random(13)
    (0 until 80).foreach { _ =>
      val text = Seq.fill(40)("abc".charAt(r.nextInt(3))).mkString
      val pats = (0 until 5).map(_ =>
        Seq.fill(1 + r.nextInt(3))("abc".charAt(r.nextInt(3))).mkString)
        .distinct
      assert(k(text, pats) == bruteCount(text, pats), s"$text vs $pats")
    }
  }

  test("X3: AhoCorasickCount codegen path agrees with interpreted count()") {
    import graft.ext.AhoCorasickCount
    val pats = Seq("the", "he", "her", "data")
    val r = new scala.util.Random(5)
    val rows = (0 until 100).map(_ =>
      Seq.fill(30)("theakdr ".charAt(r.nextInt(8))).mkString)
    val got = rows.toDF("t")
      .select(AhoCorasickCount.ahoCount(col("t"), pats)).as[Long].collect()
    val want = rows.map(bruteCount(_, pats))
    assert(got.toSeq == want)
    val n = Seq(Option.empty[String]).toDF("t")
      .select(AhoCorasickCount.ahoCount(col("t"), pats)).collect()
    assert(n.head.isNullAt(0))
  }

  test("X3: jaro_winkler registered via SparkSessionExtensions") {
    val s2 = SparkSession.builder().master("local[2]")
      .appName("jw-ext-test").config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    val v = s2.sql("SELECT jaro_winkler('martha', 'marhta')").head.getDouble(0)
    assert(v == 0.9611111111111111)
    val d = s2.sql(
      "SELECT dtw_banded(array(1L, 3L, 4L), array(1L, 2L, 4L), 1)")
      .head.getLong(0)
    assert(d == 1L)
  }

  // ---- JS divergence ----
  test("E4: jsDivergence — identical slices give 0, disjoint vocab gives ln 2") {
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("lang", "text")
    val j0 = TextAnalysis.jsDivergence(same, col("text"), col("lang"), "a", "b")
      .select("jsd").as[Double].head()
    assert(j0 == 0.0)
    val disjoint = Seq(("a", "p q r s"), ("b", "t u v w")).toDF("lang", "text")
    val j1 = TextAnalysis.jsDivergence(disjoint, col("text"), col("lang"), "a", "b")
      .select("jsd").as[Double].head()
    assert(math.abs(j1 - math.log(2)) < 1e-5)
  }

  test("E4: jsDivergence counts vocab per side and is symmetric") {
    val df = Seq(("a", "x x y"), ("b", "x z")).toDF("lang", "text")
    val r = TextAnalysis.jsDivergence(df, col("text"), col("lang"), "a", "b")
      .head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("vocab_a") == 2L && r.getAs[Long]("vocab_b") == 2L)
    assert(r.getAs[Long]("vocab_union") == 3L)
    val fwd = r.getAs[Double]("jsd")
    val rev = TextAnalysis.jsDivergence(df, col("text"), col("lang"), "b", "a")
      .select("jsd").as[Double].head()
    assert(fwd == rev && fwd > 0.0 && fwd < math.log(2))
  }

  // ---- mutual information ----
  test("A-stat: mutualInformation — independence gives 0, identity gives H(X)") {
    // x uniform over {0,1}, y independent uniform over {0,1}: all four
    // cells equal -> every term's log is ln(1) = 0
    val indep = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)).toDF("x", "y")
    val mi0 = Features.mutualInformation(indep, "f", col("x"), col("y"))
      .select("mi").as[Double].head()
    assert(mi0 == 0.0)
    // y = x, x uniform over {0,1}: I = H(X) = ln 2
    val ident = Seq((0L, 0L), (1L, 1L), (0L, 0L), (1L, 1L)).toDF("x", "y")
    val mi1 = Features.mutualInformation(ident, "f", col("x"), col("y"))
      .select("mi").as[Double].head()
    assert(math.abs(mi1 - math.log(2)) < 1e-6)
  }

  test("A-stat: mutualInformation is symmetric and reports levels") {
    val df = Seq(("a", 0L), ("a", 0L), ("a", 1L), ("b", 1L), ("b", 1L), ("c", 0L))
      .toDF("x", "y")
    val f = Features.mutualInformation(df, "f", col("x"), col("y")).head()
    val b = Features.mutualInformation(df, "f", col("y"), col("x")).head()
    assert(f.getAs[Long]("mi_nano") == b.getAs[Long]("mi_nano"))
    assert(f.getAs[Long]("levels_x") == 3L && f.getAs[Long]("levels_y") == 2L)
    assert(f.getAs[Long]("n") == 6L)
  }

  // ---- BH-FDR ----
  test("A-stat: bhDiscoveries — a deviant group is discovered, uniform ones are not") {
    // 9 groups at the global rate, one group far above it
    val rows = (0 until 9).flatMap { g =>
      (0 until 100).map(i => (g.toLong, if (i < 20) "R" else "N"))
    } ++ (0 until 100).map(i => (9L, if (i < 80) "R" else "N"))
    val df = rows.toDF("grp", "flag")
    val out = Experimentation.bhDiscoveries(df, "grp", col("flag") === "R")
      .collect()
    val byGrp = out.map(r => r.getAs[Long]("grp") -> r).toMap
    assert(byGrp(9L).getAs[Boolean]("discovery"))
    assert(byGrp(9L).getAs[Long]("p_rank") == 1L)
    // the uniform groups sit close to the (shifted) global rate; none
    // should clear the BH bar once group 9 is accounted
    assert(out.count(_.getAs[Boolean]("discovery")) < 10)
    // discoveries form a PREFIX of the p-rank order (step-up property)
    val flags = out.sortBy(_.getAs[Long]("p_rank")).map(_.getAs[Boolean]("discovery"))
    assert(!flags.dropWhile(identity).contains(true))
  }

  test("A-stat: bhDiscoveries p-value finish — z=0 maps to p within approx error of 1") {
    // two groups, identical rates -> z exactly 0 -> erfc approx at 0
    val df = ((0 until 50).map(i => (1L, i < 10)) ++
      (0 until 50).map(i => (2L, i < 10))).toDF("grp", "s")
    val out = Experimentation.bhDiscoveries(df, "grp", col("s"))
      .select("p_nano").as[Long].collect()
    assert(out.forall(p => math.abs(p - 1000000000L) < 10L)) // A&S |err| <= 1.5e-7
  }

  // ---- CUPED ----
  test("A-stat: cuped — hand-computed theta and adjusted means on a 6-unit fixture") {
    // units: (x pre-cents, y post-cents, arm)
    val units = Seq(
      (100L, 210L, 0L), (200L, 395L, 0L), (300L, 610L, 0L),
      (100L, 205L, 1L), (200L, 410L, 1L), (300L, 590L, 1L))
      .toDF("x_cents", "y_cents", "arm")
    val out = Experimentation.cuped(units, "x_cents", "y_cents", "arm")
      .orderBy("arm").collect()
    // exact-sums finish, recomputed by hand:
    val xs = Seq(100.0, 200.0, 300.0, 100.0, 200.0, 300.0)
    val ys = Seq(210.0, 395.0, 610.0, 205.0, 410.0, 590.0)
    val n = 6.0
    val theta = (n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum) /
      (n * xs.map(a => a * a).sum - xs.sum * xs.sum)
    val xbar = xs.sum / n
    def adj(ix: Seq[Int]) = {
      val ya = ix.map(ys).sum / ix.size
      val xa = ix.map(xs).sum / ix.size
      (ya - theta * (xa - xbar)) / 100.0
    }
    assert(out(0).getAs[Long]("theta_ppm") == math.round(theta * 1e6))
    assert(math.abs(out(0).getAs[Double]("mean_y_adj") - adj(Seq(0, 1, 2))) < 1e-6)
    assert(math.abs(out(1).getAs[Double]("mean_y_adj") - adj(Seq(3, 4, 5))) < 1e-6)
    // both arms see the same pre-period mix here, so the adjustment
    // must leave the arm DIFFERENCE unchanged (CUPED unbiasedness)
    val rawDiff = out(0).getAs[Double]("mean_y") - out(1).getAs[Double]("mean_y")
    val adjDiff = out(0).getAs[Double]("mean_y_adj") - out(1).getAs[Double]("mean_y_adj")
    assert(math.abs(rawDiff - adjDiff) < 1e-6)
    // strong x-y correlation in the fixture -> large variance reduction
    assert(out(0).getAs[Long]("var_reduction_ppm") > 900000L)
  }

  // ---- label propagation ----
  test("E2+: labelPropagation separates two cliques joined by a bridge") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), // clique A
      (4L, 5L), (4L, 6L), (5L, 6L), // clique B
      (3L, 4L))                     // bridge
      .toDF("src", "dst")
    val out = Graph.labelPropagation(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("community"))
      .toMap
    // hand-simulated synchronous min-tie-break rounds
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("E2+: labelPropagation is deterministic under repartitioning") {
    val r = new scala.util.Random(11)
    val edges = (0 until 300).map(_ => (r.nextInt(40).toLong, r.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val a = Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    val b = Graph.labelPropagation(edges.toDF("src", "dst").repartition(7), "src", "dst", 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  // ---- HITS ----
  test("E2+: hits — hand-computed integer trajectory on a directed star") {
    val edges = Seq((1L, 10L), (2L, 10L), (1L, 11L)).toDF("src", "dst")
    val out = Graph.hits(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("hub_u"), r.getAs[Long]("auth_u"))).toMap
    // round 1 by hand: authRaw(10)=2e6, authRaw(11)=1e6, amax=2e6
    //   auth: 10 -> 1000000, 11 -> 500000; sources have no in-edges -> 0
    // hubRaw(1)=1.5e6, hubRaw(2)=1e6, hmax=1.5e6
    //   hub: 1 -> 1000000, 2 -> 666666; sinks have no out-edges -> 0
    assert(out == Map(
      1L -> (1000000L, 0L), 2L -> (666666L, 0L),
      10L -> (0L, 1000000L), 11L -> (0L, 500000L)))
  }

  test("E2+: hits is deterministic under repartitioning") {
    val r = new scala.util.Random(5)
    val edges = (0 until 400).map(_ => (r.nextInt(30).toLong, (30 + r.nextInt(30)).toLong))
    val a = Graph.hits(edges.toDF("src", "dst"), "src", "dst", 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted.toSeq
    val b = Graph.hits(edges.toDF("src", "dst").repartition(9), "src", "dst", 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted.toSeq
    assert(a == b)
  }

  // ---- difference-in-differences ----
  test("A-stat: diffInDiff — hand cells; a shared post-period shift cancels") {
    // treated: pre mean $2, post mean $5 (delta 3); control: $1 -> $3
    // (delta 2) => DiD = 1
    def rows(shift: Long) = Seq(
      (200L, true, false), (200L, true, false),
      (500L + shift, true, true), (500L + shift, true, true),
      (100L, false, false), (100L, false, false),
      (300L + shift, false, true), (300L + shift, false, true))
    val out = rows(0L).toDF("y", "t", "p")
    val r0 = Experimentation.diffInDiff(out, col("y"), col("t"), col("p")).head()
    assert(r0.getAs[Double]("mean_t_pre") == 2.0 && r0.getAs[Double]("mean_t_post") == 5.0)
    assert(r0.getAs[Double]("mean_c_pre") == 1.0 && r0.getAs[Double]("mean_c_post") == 3.0)
    assert(r0.getAs[Double]("did") == 1.0)
    assert(r0.getAs[Long]("n_t_pre") == 2L && r0.getAs[Long]("n_c_post") == 2L)
    // add $7 to EVERY post-period unit: the shared trend subtracts out
    val r1 = Experimentation.diffInDiff(rows(700L).toDF("y", "t", "p"),
      col("y"), col("t"), col("p")).head()
    assert(r1.getAs[Double]("did") == 1.0)
  }

  // ---- MDE ----
  test("A-stat: mdeByStratum matches the closed-form on a known stratum") {
    val df = ((0 until 50).map(_ => ("A", true)) ++
      (0 until 150).map(_ => ("A", false))).toDF("s", "y")
    val r = Experimentation.mdeByStratum(df, col("s"), col("y")).head()
    assert(r.getAs[Long]("n") == 200L && r.getAs[Long]("positives") == 50L)
    assert(r.getAs[Double]("p") == 0.25)
    val want = math.round((1.959964 + 0.841621) *
      math.sqrt(2.0 * 0.25 * 0.75 / 100.0) * 1e6)
    assert(r.getAs[Long]("mde_ppm") == want)
  }

  // ---- Bradley-Terry ----
  test("A-stat: bradleyTerry — two-item fixed point equals the win rate") {
    // A beats B 3x, B beats A 1x: BT strengths settle at ratio 3:1
    val games = Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L))
      .toDF("winner", "loser")
    val out = graft.ops.Evaluation.bradleyTerry(games, col("winner"), col("loser"), 3)
      .collect().map(r => r.getAs[Long]("item") ->
        (r.getAs[Long]("games"), r.getAs[Long]("wins"),
          r.getAs[Long]("strength_u"), r.getAs[Long]("share_ppm"))).toMap
    assert(out(1L) == ((4L, 3L, 1500000L, 750000L)))
    assert(out(2L) == ((4L, 1L, 500000L, 250000L)))
  }

  test("A-stat: bradleyTerry recovers the transitive order") {
    val games = (Seq.fill(4)((1L, 2L)) ++ Seq.fill(4)((2L, 3L)) ++
      Seq.fill(1)((3L, 1L))).toDF("winner", "loser")
    val s = graft.ops.Evaluation.bradleyTerry(games, col("winner"), col("loser"), 3)
      .collect().map(r => r.getAs[Long]("item") -> r.getAs[Long]("strength_u")).toMap
    assert(s(1L) > s(2L) && s(2L) > s(3L))
  }

  // ---- calibration ----
  test("A-stat: calibrationBins — integer bin stats and count-weighted ECE") {
    val rows = Seq.fill(4)((100000L, 0)) ++ Seq((100000L, 1)).map(t => (t._1, t._2)) ++
      Seq.fill(5)((950000L, 1))
    // bin 1: 5 rows conf 100000, 1 positive -> rate 200000, gap 100000
    // bin 9: 5 rows conf 950000, all positive -> rate 1000000, gap 50000
    val df = rows.toDF("conf", "y")
    val out = graft.ops.Evaluation.calibrationBins(df, col("conf"), col("y"))
      .orderBy("bin").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("bin") == 1L && out(0).getAs[Long]("n") == 5L)
    assert(out(0).getAs[Long]("mean_conf_ppm") == 100000L)
    assert(out(0).getAs[Long]("rate_ppm") == 200000L)
    assert(out(0).getAs[Long]("gap_ppm") == 100000L)
    assert(out(1).getAs[Long]("bin") == 9L && out(1).getAs[Long]("gap_ppm") == 50000L)
    // ECE = (5*100000 + 5*50000) div 10 = 75000, repeated on every row
    assert(out.forall(_.getAs[Long]("ece_ppm") == 75000L))
    // conf exactly 1.0 clamps into the top bin
    val clamp = Seq((1000000L, 1)).toDF("conf", "y")
    val c = graft.ops.Evaluation.calibrationBins(clamp, col("conf"), col("y")).head()
    assert(c.getAs[Long]("bin") == 9L)
  }

  // ---- modularity ----
  test("E2+: modularity — exact rationals on the two-clique bridge graph") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 2L))
      .toDF("node", "community")
    val r = Graph.modularity(edges, "src", "dst", labels, "node", "community")
      .head()
    // m = 7; per clique e = 3, d = 7: q_num = 2·(4·7·3 − 49) = 70,
    // q_den = 4·49 = 196, Q = 70/196 ≈ 0.357143
    assert(r.getAs[Long]("n_communities") == 2L && r.getAs[Long]("m") == 7L)
    assert(r.getAs[Long]("q_num") == 70L && r.getAs[Long]("q_den") == 196L)
    assert(r.getAs[Double]("modularity") == math.rint(70.0 / 196.0 * 1e6) / 1e6 ||
      r.getAs[Double]("modularity") == 0.357143)
    // everything-in-one-community is Q = 0 by construction
    val one = labels.withColumn("community", lit(1L))
    val r1 = Graph.modularity(edges, "src", "dst", one, "node", "community").head()
    assert(r1.getAs[Long]("q_num") == 0L && r1.getAs[Double]("modularity") == 0.0)
  }

  // ---- IPS off-policy value ----
  test("A-stat: ipsPolicyValue — hand-computed Horvitz-Thompson fixture") {
    val rows = Seq(
      (1L, 1L, 1L, 500000L), // match, k=2
      (2L, 2L, 0L, 250000L), // match, zero reward
      (1L, 2L, 1L, 500000L), // no match
      (3L, 3L, 1L, 200000L)) // match, k=5
      .toDF("logged", "target", "reward", "p_ppm")
    val r = Experimentation.ipsPolicyValue(rows, col("logged"), col("target"),
      col("reward"), col("p_ppm")).head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("matches") == 3L)
    assert(r.getAs[Long]("matched_reward") == 2L)
    // wsum = 1e12/5e5 + 0 + 1e12/2e5 = 2e6 + 5e6 = 7e6; value = 7e6/4
    assert(r.getAs[Long]("value_ppm") == 1750000L)
    assert(r.getAs[Long]("naive_value_ppm") == 750000L)
  }

  // ---- stratified ATE ----
  test("A-stat: stratifiedAte — hand strata; single-arm stratum excluded") {
    val rows = Seq(
      ("A", 300L, true), ("A", 300L, true), ("A", 100L, false),
      ("B", 500L, true), ("B", 500L, false), ("B", 500L, false),
      ("C", 700L, true)) // no control arm: excluded from the effect
      .toDF("s", "y", "t")
    val out = Experimentation.stratifiedAte(rows, col("s"), col("y"), col("t"))
      .orderBy("stratum").collect()
    val a = out(0); val b = out(1); val cRow = out(2)
    assert(a.getAs[Double]("mean_t") == 3.0 && a.getAs[Double]("mean_c") == 1.0)
    assert(a.getAs[Double]("diff") == 2.0)
    assert(b.getAs[Double]("diff") == 0.0)
    assert(cRow.isNullAt(cRow.fieldIndex("mean_c")) &&
      cRow.isNullAt(cRow.fieldIndex("diff")))
    // ATE over A (n=3, diff $2) and B (n=3, diff 0): 6e6 div 6 = 1e6 micro
    assert(out.forall(_.getAs[Long]("ate_micro") == 1000000L))
  }

  // ---- native word shingles ----
  test("X3: WordShingles ≡ the higher-order column formula it replaced") {
    import graft.ext.WordShingles
    // the OLD formula, verbatim, as the parity oracle
    def oldShingles(text: org.apache.spark.sql.Column, n: Int) = {
      val toks = split(lower(text), "\\s+")
      val idx = when(size(toks) >= n, sequence(lit(0), size(toks) - n))
        .otherwise(array().cast("array<int>"))
      array_distinct(transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    }
    val r = new scala.util.Random(23)
    val words = Seq("the", "Cat", "ÉTÉ", "ب", "x1", "", "straße")
    val adversarial = Seq("", " ", "  a", "a  b   c", "one", "tab\tsep",
      "line\nbreak", " lead and trail ", "rep rep rep rep")
    val random = (0 until 150).map(_ =>
      (0 until r.nextInt(12)).map(_ => words(r.nextInt(words.length)))
        .mkString(Seq(" ", "  ", "\t")(r.nextInt(3))))
    for (n <- Seq(1, 2, 3)) {
      val df = (adversarial ++ random).toDF("text")
      val both = df.select(
        WordShingles.wordShingles(col("text"), n).as("nu"),
        oldShingles(col("text"), n).as("old"))
        .collect()
      both.foreach { row =>
        assert(row.getSeq[String](0) == row.getSeq[String](1),
          s"n=$n mismatch: ${row.getSeq[String](0)} vs ${row.getSeq[String](1)}")
      }
    }
    // null poisoning
    val nr = Seq(Option.empty[String]).toDF("text")
      .select(WordShingles.wordShingles(col("text"), 2)).collect()
    assert(nr.head.isNullAt(0))
  }

  test("ucb1: undersampled arm outranks a better-mean arm via the bonus") {
    // a: 4 pulls 2 wins, b: 1 pull 1 win, T = 5 —
    // ucb_b = 1 + √(2·ln5) > ucb_a = 0.5 + √(2·ln5/4)
    val df = (Seq.fill(2)(("a", 1)) ++ Seq.fill(2)(("a", 0)) ++
      Seq(("b", 1))).toDF("arm", "r")
    val out = Experimentation.ucb1(df, col("arm"), col("r") === 1)
      .orderBy("ucb_rank").collect()
    assert(out.map(_.getAs[String]("arm")).toSeq == Seq("b", "a"))
    val a = out(1)
    assert(a.getAs[Long]("pulls") == 4L && a.getAs[Long]("wins") == 2L)
    assert(a.getAs[Long]("mean_ppm") == 500000L)
    assert(a.getAs[Long]("ucb_ppm") ==
      math.rint((0.5 + math.sqrt(2.0 * math.log(5.0) / 4.0)) * 1e6).toLong)
    assert(out(0).getAs[Long]("ucb_ppm") ==
      math.rint((1.0 + math.sqrt(2.0 * math.log(5.0))) * 1e6).toLong)
  }

  test("sequentialBoundary: OBF shape — conservative early, nominal late") {
    // look 1: A 1/2 vs B 0/2 → z = 0.5/√(0.25·0.75·1) ≈ 1.1547005,
    //   boundary = 1.96·√2 ≈ 2.7718586 — NOT crossed;
    // look 2 cumulative: A 3/4 vs B 1/4 → z = 0.5/√0.125 = √2,
    //   boundary = 1.96 — still not crossed (the A/A-ish outcome).
    // Values are UNROUNDED doubles from a pinned op order (the q186
    // discipline), asserted bit-exact against the same IEEE chain.
    val rows = Seq((1, "A", 1), (1, "A", 0), (1, "B", 0), (1, "B", 0),
      (2, "A", 1), (2, "A", 1), (2, "B", 1), (2, "B", 0))
    val out = Experimentation.sequentialBoundary(rows.toDF("look", "arm", "s"),
      col("look"), col("arm") === "A", col("s") === 1)
      .orderBy("look").collect()
    assert(out.length == 2)
    val l1 = out(0); val l2 = out(1)
    assert(l1.getAs[Long]("n_a") == 2L && l1.getAs[Long]("conv_a") == 1L)
    assert(l1.getAs[Double]("z") == 0.5 / math.sqrt(0.25 * 0.75 * 1.0))
    assert(l1.getAs[Double]("boundary") == 1.96 * math.sqrt(2.0))
    assert(!l1.getAs[Boolean]("crossed"))
    assert(l2.getAs[Long]("n_a") == 4L && l2.getAs[Long]("conv_a") == 3L)
    assert(l2.getAs[Double]("z") == 0.5 / math.sqrt(0.5 * 0.5 * 0.5))
    assert(l2.getAs[Double]("boundary") == 1.96)
    assert(!l2.getAs[Boolean]("crossed"))
  }

  // ---- psi ------------------------------------------------------------

  test("psi: identical slices score exactly 0; bins densify") {
    // same shape in both slices → every term_nano = 0; bin 2 appears in
    // neither slice but the frame still emits its row
    val rows = Seq((0L, "ref"), (0L, "ref"), (1L, "ref"),
      (0L, "cur"), (0L, "cur"), (1L, "cur"))
    val out = Experimentation.psi(rows.toDF("bin", "s"), col("bin"),
      col("s"), "ref", "cur", nBins = 3).orderBy(col("bin")).collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Long]("term_nano") == 0L))
    assert(out.forall(_.getAs[Double]("psi") == 0.0))
    assert(out(2).getAs[Long]("ref_n") == 0L &&
      out(2).getAs[Long]("cur_n") == 0L)
  }

  test("rakeToMarginals: weighted marginals hit the reference targets " +
      "and converge in one round here") {
    // cur table uniform 1 per cell; ref marginals rows (a:2, b:2),
    // cols (x:3, y:1) → raked weights 1.5e6 for x cells, 0.5e6 for y
    val rows = Seq(("a", "x", "cur"), ("a", "y", "cur"),
      ("b", "x", "cur"), ("b", "y", "cur"),
      ("a", "x", "ref"), ("a", "x", "ref"),
      ("b", "x", "ref"), ("b", "y", "ref"))
    val out = Experimentation.rakeToMarginals(rows.toDF("r", "c", "s"),
      col("r"), col("c"), col("s"), "ref", "cur", rounds = 2)
      .collect().map(x => (x.getAs[String]("row_key"),
        x.getAs[String]("col_key")) -> x.getAs[Long]("weight_micro")).toMap
    assert(out == Map(("a", "x") -> 1500000L, ("a", "y") -> 500000L,
      ("b", "x") -> 1500000L, ("b", "y") -> 500000L))
    // column sums now match ref col marginals ×1e6 exactly
    assert(out(("a", "x")) + out(("b", "x")) == 3000000L)
    assert(out(("a", "y")) + out(("b", "y")) == 1000000L)
  }

  test("psi: a mirrored 8/2 → 2/8 shift scores 2·(0.5·ln 3) = ln 3") {
    // smoothed p = (8+1)/(10+2) = .75 vs q = .25 in bin 0, mirrored in
    // bin 1 → each term .5·ln3, psi = ln 3 = 1.098612
    val rows = Seq.fill(8)((0L, "ref")) ++ Seq.fill(2)((1L, "ref")) ++
      Seq.fill(2)((0L, "cur")) ++ Seq.fill(8)((1L, "cur"))
    val out = Experimentation.psi(rows.toDF("bin", "s"), col("bin"),
      col("s"), "ref", "cur", nBins = 2).orderBy(col("bin")).collect()
    val t = math.round(0.5 * math.log(3.0) * 1e9)
    assert(out.map(_.getAs[Long]("term_nano")).toSeq == Seq(t, t))
    assert(out.head.getAs[Double]("psi") == 1.098612)
  }

  test("ratioMetricDelta: hand case — ratio, covariance-aware variance") {
    // one arm, units (x, y): (1, 2), (2, 2), (1, 4)
    // n=3, Sx=4, Sy=8, Sxx=6, Sxy=10, Syy=24
    // R = 2, varx = (18-16)/6 = 1/3, vary = (72-64)/6 = 4/3,
    // cov = (30-32)/6 = -1/3, mx = 4/3
    // Var(R) = (4/3 + 4/3 + 4/3) / (3 * 16/9) = 0.75 -> se = sqrt(0.75)
    val df = Seq((1L, 2L, "a"), (2L, 2L, "a"), (1L, 4L, "a"))
      .toDF("x", "y", "arm")
    val out = Experimentation.ratioMetricDelta(df, col("x"), col("y"),
      col("arm")).collect()(0)
    assert(out.getAs[Long]("n") == 3L)
    assert(out.getAs[Double]("ratio") == 2.0)
    val varx = 2.0 / 6.0; val vary = 8.0 / 6.0; val cov = -2.0 / 6.0
    val mx = 4.0 / 3.0
    val se = math.sqrt((2.0 * 2.0 * varx - 2.0 * cov * 2 + vary) /
      (3.0 * (mx * mx)))
    assert(out.getAs[Double]("se") == se)
    assert(out.getAs[Double]("ci_lo") == 2.0 - 1.96 * se)
    assert(out.getAs[Double]("ci_hi") == 2.0 + 1.96 * se)
  }

  test("A-causal: regressionDiscontinuity — planted jump recovered exactly") {
    // y = 10 + x below cutoff 0; y = 50 + x at/above: effect = 40,
    // slopes 1 on both sides
    val rows = (-5 to -1).map(x => (x.toLong, 10L + x)) ++
      (0 to 4).map(x => (x.toLong, 50L + x))
    val r = Experimentation.regressionDiscontinuity(
      rows.toDF("x", "y"), col("x"), col("y"),
      cutoff = 0L, bandwidth = 10L).head()
    assert(r.getAs[Long]("n_left") == 5L && r.getAs[Long]("n_right") == 5L)
    assert(r.getAs[Double]("slope_left") == 1.0)
    assert(r.getAs[Double]("slope_right") == 1.0)
    assert(r.getAs[Double]("y_at_cut_left") == 10.0)
    assert(r.getAs[Double]("y_at_cut_right") == 50.0)
    assert(r.getAs[Double]("effect") == 40.0)
    // bandwidth excludes far points
    val wide = rows ++ Seq((100L, 0L))
    val r2 = Experimentation.regressionDiscontinuity(
      wide.toDF("x", "y"), col("x"), col("y"), 0L, 10L).head()
    assert(r2.getAs[Long]("n_right") == 5L)
  }

  test("A-causal: covariateBalance — balanced arms flag nothing, shifted flags") {
    // covariate x identical across arms -> SMD 0; covariate y shifted
    val rows = Seq(("A", 1L, 10L), ("A", 2L, 11L), ("A", 3L, 12L),
      ("B", 1L, 20L), ("B", 2L, 21L), ("B", 3L, 22L))
      .toDF("g", "x", "y")
    val out = Experimentation.covariateBalance(rows, col("g"), "A", "B",
      Seq("x" -> col("x"), "y" -> col("y"))).orderBy("covariate").collect()
    val x = out(0); val y = out(1)
    assert(x.getAs[String]("covariate") == "x")
    assert(x.getAs[Double]("smd") == 0.0 && !x.getAs[Boolean]("imbalanced"))
    // y: means 11 vs 21, pooled sd 1 -> SMD = -10
    assert(y.getAs[Double]("smd") == -10.0 && y.getAs[Boolean]("imbalanced"))
  }

  test("A-causal: quantileTreatmentEffects edge — tied arms give zero QTE") {
    val rows = (1 to 6).flatMap(v => Seq(("A", v.toLong), ("B", v.toLong)))
    val out = Experimentation.quantileTreatmentEffects(rows.toDF("g", "v"),
      col("v"), col("g"), "A", "B", Seq(500000L)).head()
    assert(out.getAs[Long]("qte") == 0L)
  }

  test("A-causal: doublyRobustValue — perfect model recovers truth, DM/IPS bracket") {
    // units: reward known; model exactly right -> DR = DM = truth
    // regardless of propensities; target matches half the logs
    val rows = Seq((true, 500000L, 10L, 10L, 10L), (false, 500000L, 20L, 30L, 20L))
      .toDF("m", "p", "r", "qt", "ql")
    // qhat_target for unit 2 is 30 (what the TARGET action would earn)
    val out = Experimentation.doublyRobustValue(rows, col("m"), col("p"),
      col("r"), col("qt"), col("ql")).head()
    // dm = (10 + 30)/2 = 20; correction = (10-10)*1e6/5e5 = 0 -> dr = dm
    assert(out.getAs[Long]("dm_micro") == 20L)
    assert(out.getAs[Long]("dr_micro") == 20L)
    // ips only counts the matching unit: (10*1e6/5e5)/2 = 10
    assert(out.getAs[Long]("ips_micro") == 10L)
    // wrong model, right propensities: DR corrects toward IPS
    val bad = Seq((true, 500000L, 10L, 0L, 0L), (false, 500000L, 20L, 0L, 0L))
      .toDF("m", "p", "r", "qt", "ql")
    val b = Experimentation.doublyRobustValue(bad, col("m"), col("p"),
      col("r"), col("qt"), col("ql")).head()
    assert(b.getAs[Long]("dm_micro") == 0L)
    assert(b.getAs[Long]("dr_micro") == b.getAs[Long]("ips_micro"))
  }

  test("A-stat: confidenceSequence — radius shrinks, brackets the mean") {
    val rows = (1 to 4).flatMap(lk => (1 to 50).map(i =>
      (lk.toLong, ((i * 7) % 13).toLong)))
    val out = Experimentation.confidenceSequence(rows.toDF("lk", "v"),
      col("lk"), col("v")).orderBy("look").collect()
    assert(out.length == 4)
    val radii = out.map(_.getAs[Double]("radius"))
    assert(radii.sliding(2).forall(s => s(1) < s(0))) // time-uniform shrink
    out.foreach { r =>
      assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("mean"))
      assert(r.getAs[Double]("mean") < r.getAs[Double]("ci_hi"))
    }
    // anytime-valid radius is wider than the fixed-n z-interval
    val last = out.last
    val n = last.getAs[Long]("n").toDouble
    val vs = rows.map(_._2.toDouble)
    val m = vs.sum / vs.size
    val sd = math.sqrt(vs.map(v => (v - m) * (v - m)).sum / (vs.size - 1))
    assert(last.getAs[Double]("radius") > 1.96 * sd / math.sqrt(n))
  }

  test("A-causal: cemMatch — exact arm sums per stratum, unmatched strata drop") {
    import graft.ops.Experimentation
    import org.apache.spark.sql.functions._
    val df = Seq(
      // stratum 0: 1 treated (y=100), 2 control (y=50, 70) -> matched
      (0L, true, 100L), (0L, false, 50L), (0L, false, 70L),
      // stratum 1: treated only -> dropped
      (1L, true, 999L),
      // stratum 2: control only -> dropped
      (2L, false, 111L))
      .toDF("b", "t", "y")
    val out = Experimentation.cemMatch(df, col("t"), col("y"),
        strata = Seq("b" -> col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((0L, 1L, 2L, 100L, 120L)))
  }

  test("A-causal: upliftBands — cumulative walk and exact Qini values") {
    import graft.ops.Experimentation
    import org.apache.spark.sql.functions._
    // band 1 (score 10-19): 2 treated (1 resp), 2 control (0 resp)
    // band 0 (score 0-9):   1 treated (0 resp), 1 control (1 resp)
    val df = Seq(
      (15L, true, true), (16L, true, false), (17L, false, false),
      (18L, false, false),
      (5L, true, false), (6L, false, true))
      .toDF("score", "t", "r")
    val out = Experimentation.upliftBands(df, col("t"), col("r"),
        col("score"), bandWidth = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9)))
    // top band: cum 2t/2c, 1/0 resp -> qini = 1e6*(1*2 - 0*2)/2 = 1e6
    // both bands: cum 3t/3c, 1/1 resp -> qini = 1e6*(1*3 - 1*3)/3 = 0
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 1L, 0L, 1000000L),
      (0L, 3L, 3L, 1L, 1L, 0L)))
  }

  test("A-stat: mantelHaenszelOr — Simpson's reversal: stratified OR 1, crude OR > 5") {
    import org.apache.spark.sql.functions._
    // two strata, OR = 1 WITHIN each (45·5/45·5 and 1·81/9·9), but
    // exposure and outcome both concentrate in stratum 1 — the crude
    // collapsed table shows a spurious OR of 46·86/(54·14) ≈ 5.23
    def rows(s: Int, e: Boolean, o: Boolean, k: Int) =
      Seq.fill(k)((s, e, o))
    val df = (rows(1, true, true, 45) ++ rows(1, true, false, 45) ++
      rows(1, false, true, 5) ++ rows(1, false, false, 5) ++
      rows(2, true, true, 1) ++ rows(2, true, false, 9) ++
      rows(2, false, true, 9) ++ rows(2, false, false, 81))
      .toDF("s", "e", "o")
    val r = Experimentation.mantelHaenszelOr(df, col("s"), col("e"), col("o"))
      .collect()(0)
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Double]("or_mh") == 1.0) // 2.25+0.81 over 2.25+0.81, exact
    assert(r.getAs[Double]("crude_or") > 5.0)
  }

  test("A-stat: waldIv — exact slope under perfect compliance; null on no first stage") {
    import org.apache.spark.sql.functions._
    // z=1 -> x=2, z=0 -> x=1, y = 10x: beta = (20-10)/(2-1) = 10
    val df = (Seq.fill(4)((true, 2L, 20L)) ++ Seq.fill(6)((false, 1L, 10L)))
      .toDF("z", "x", "y")
    val r = Experimentation.waldIv(df, col("z"), col("x"), col("y"))
      .collect()(0)
    assert((r.getAs[Long]("n1"), r.getAs[Long]("n0")) == (4L, 6L))
    assert(r.getAs[Double]("beta_iv") == 10.0)
    assert(r.getAs[Double]("first_stage") == 1.0)
    assert(r.getAs[Double]("itt") == 10.0)
    // instrument that never moves x: beta undefined -> null, not NaN
    val flat = Seq((true, 1L, 5L), (false, 1L, 7L)).toDF("z", "x", "y")
    val rf = Experimentation.waldIv(flat, col("z"), col("x"), col("y"))
      .collect()(0)
    assert(rf.isNullAt(rf.fieldIndex("beta_iv")))
    assert(rf.getAs[Double]("first_stage") == 0.0)
  }

  test("A-stat/E7: sbgFit — exact-model cohort recovers (a,b); all-survivor boundary") {
    import org.apache.spark.sql.functions._
    // a cohort whose death counts EXACTLY match sBG(a=1, b=1) over 4
    // periods: P = 1/2, 1/6, 1/12, 1/20, S4 = 1/5. n = 60 →
    // deaths (30, 10, 5, 3), survivors 12. The lattice MLE must land
    // exactly on (1.0, 1.0) — the model that reproduces the data.
    val rows = Seq.fill(30)((1L, false)) ++ Seq.fill(10)((2L, false)) ++
      Seq.fill(5)((3L, false)) ++ Seq.fill(3)((4L, false)) ++
      Seq.fill(12)((0L, true))
    val df = rows.toDF("t", "c")
    val r = Experimentation.sbgFit(df, col("t"), col("c"), horizon = 4)
      .collect()(0)
    assert(r.getAs[Double]("a") == 1.0, s"a = ${r.getAs[Double]("a")}")
    assert(r.getAs[Double]("b") == 1.0, s"b = ${r.getAs[Double]("b")}")
    assert(r.getAs[Double]("p1") == 0.5)
    // everyone survives: likelihood pushes churn to the lattice edge —
    // smallest a, largest b
    val surv = Seq.fill(20)((0L, true)).toDF("t", "c")
    val rs = Experimentation.sbgFit(surv, col("t"), col("c"), horizon = 4)
      .collect()(0)
    assert(rs.getAs[Double]("a") == 0.05)
    assert(rs.getAs[Double]("b") == 3.0)
  }

  test("A-stat: cmhChiSquare — zero on the stratified null, hand value on perfect association") {
    import org.apache.spark.sql.functions._
    def rows(s: Int, e: Boolean, o: Boolean, k: Int) =
      Seq.fill(k)((s, e, o))
    // the q381 Simpson data: within each stratum a = E exactly
    val nullDf = (rows(1, true, true, 45) ++ rows(1, true, false, 45) ++
      rows(1, false, true, 5) ++ rows(1, false, false, 5) ++
      rows(2, true, true, 1) ++ rows(2, true, false, 9) ++
      rows(2, false, true, 9) ++ rows(2, false, false, 81))
      .toDF("s", "e", "o")
    val r0 = Experimentation.cmhChiSquare(nullDf, col("s"), col("e"), col("o"))
      .collect()(0)
    assert(r0.getAs[Double]("cmh_chi2") == 0.0)
    // one stratum, perfect association: a=d=5, b=c=0 →
    // E = 2.5, V = 625/900, χ² = (2.5 − 0.5)² / V ≈ 5.76
    val perf = (rows(1, true, true, 5) ++ rows(1, false, false, 5))
      .toDF("s", "e", "o")
    val r1 = Experimentation.cmhChiSquare(perf, col("s"), col("e"), col("o"))
      .collect()(0)
    assert(math.abs(r1.getAs[Double]("cmh_chi2") - 5.76) < 1e-2)
  }

  test("A-stat: holmDiscoveries — subset of BH, and rejections form a prefix of the p-order") {
    import org.apache.spark.sql.functions._
    // one wildly deviant group, several mild ones, many on-rate groups
    val rows = (1 to 20).flatMap { g =>
      val succ = if (g == 1) 90 else if (g <= 4) 60 else 50
      Seq.fill(succ)((g, true)) ++ Seq.fill(100 - succ)((g, false))
    }
    val df = rows.toDF("g", "s")
    val holm = Experimentation.holmDiscoveries(df, "g", col("s"))
      .select("g", "p_rank", "discovery").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getBoolean(2)))
    val bh = Experimentation.bhDiscoveries(df, "g", col("s"))
      .select("g", "discovery").collect()
      .map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    // FWER is never more permissive than FDR on the same p-values
    assert(holm.forall { case (g, _, d) => !d || bh(g) })
    // step-down: the discovery set is a PREFIX of the p-ranking
    val ranks = holm.filter(_._3).map(_._2)
    assert(ranks.sorted.sameElements(1L to ranks.length))
    // the extreme group is found, an on-rate group is not
    assert(holm.find(_._1 == 1).exists(_._3))
    assert(!holm.find(_._1 == 20).exists(_._3))
  }
  test("A-stat: snipsPolicyValue — hand weights, SNIPS vs IPS, Kish ESS, no-match nulls") {
    // (logged, target, reward, p_ppm): two matches with w = 2e6, 4e6
    val df = Seq(
      (1L, 1L, 2L, 500000L), (2L, 2L, 0L, 250000L), (3L, 4L, 5L, 1000000L))
      .toDF("logged", "target", "reward", "p")
    val r = Experimentation.snipsPolicyValue(df, col("logged"),
      col("target"), col("reward"), col("p")).collect()(0)
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("matches") == 2L)
    // wr = 2e6*2, sw = 6e6: SNIPS = 4e12 // 6e6 = 666666; IPS = 4e6 // 3
    assert(r.getAs[Long]("value_snips_ppm") == 666666L)
    assert(r.getAs[Long]("value_ips_ppm") == 1333333L)
    // ESS = (6e6)^2 / (4e12 + 16e12) = 1.8
    assert(math.abs(r.getAs[Double]("ess_w") - 1.8) < 1e-12)
    val none = Seq((1L, 2L, 3L, 500000L)).toDF("logged", "target", "reward", "p")
    val r0 = Experimentation.snipsPolicyValue(none, col("logged"),
      col("target"), col("reward"), col("p")).collect()(0)
    assert(r0.isNullAt(r0.fieldIndex("value_snips_ppm")))
    assert(r0.getAs[Long]("value_ips_ppm") == 0L)
    assert(r0.isNullAt(r0.fieldIndex("ess_w")))
  }
  test("ML: gmm2Em — recovers a planted two-mode mixture, partition-invariant") {
    // two tight modes at ~10 and ~100, equal mass
    val xs = Seq(10L, 10L, 10L, 11L, 100L, 100L, 101L, 101L)
    val df = xs.toDF("x")
    val r = Experimentation.gmm2Em(df, col("x"), iters = 6).collect()(0)
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("n_distinct") == 4L)
    // weights near 1/2, means at the modes, variances tiny vs the gap
    assert(math.abs(r.getAs[Long]("w1_ppm") - 500000L) < 50000L)
    assert(math.abs(r.getAs[Long]("mu1") - 10L) <= 1L)
    assert(math.abs(r.getAs[Long]("mu2") - 100L) <= 1L)
    assert(r.getAs[Long]("var1") <= 2L && r.getAs[Long]("var2") <= 2L)
    // bit-identical under repartitioning (integer-quantized trajectory)
    val r13 = Experimentation.gmm2Em(df.repartition(13), col("x"), iters = 6)
      .collect()(0)
    assert(r.toSeq == r13.toSeq)
  }
  test("ML: logisticIrls — hits the closed-form two-level MLE, partition-invariant") {
    // x in {0, 1}: P(y=1|x=0) = 1/4, P(y=1|x=1) = 3/4 — the saturated
    // MLE is b0 = ln(1/3) = -1.098612, b0+b1 = ln(3), so
    // b1 = ln(9) = 2.197225 (micro-units, within quantization)
    val rows = Seq.fill(3)((0L, 0L)) ++ Seq((0L, 1L)) ++
      Seq((1L, 0L)) ++ Seq.fill(3)((1L, 1L))
    val df = rows.toDF("x", "y")
    val r = Experimentation.logisticIrls(df, col("x"), col("y"), iters = 8)
      .collect()(0)
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("n_distinct") == 4L)
    assert(math.abs(r.getAs[Long]("b0_micro") - (-1098612L)) <= 3L,
      s"b0 ${r.getAs[Long]("b0_micro")}")
    assert(math.abs(r.getAs[Long]("b1_micro") - 2197225L) <= 5L,
      s"b1 ${r.getAs[Long]("b1_micro")}")
    // bit-identical under repartitioning (integer-quantized trajectory)
    val r13 = Experimentation.logisticIrls(
      df.repartition(13), col("x"), col("y"), iters = 8).collect()(0)
    assert(r.toSeq == r13.toSeq)
    // quasi-separated data cannot run the integers away: the clamp holds
    val sep = Seq((0L, 0L), (0L, 0L), (10L, 1L), (10L, 1L)).toDF("x", "y")
    val rs = Experimentation.logisticIrls(sep, col("x"), col("y"),
      iters = 20).collect()(0)
    assert(math.abs(rs.getAs[Long]("b0_micro")) <= 50000000L)
    assert(math.abs(rs.getAs[Long]("b1_micro")) <= 50000000L)
  }

  test("A-stat: syntheticControl — perfect donor gets all weight, post gap read out") {
    // treated 0 tracks donor 1 exactly pre-period; donor 2 is noise
    val panel = Seq(
      (0L, 1L, 10L), (0L, 2L, 20L), (0L, 3L, 30L), (0L, 4L, 99L),
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L), (1L, 4L, 40L),
      (2L, 1L, 5L), (2L, 2L, 5L), (2L, 3L, 5L), (2L, 4L, 5L))
      .toDF("u", "t", "y")
    val out = Experimentation.syntheticControl(panel, col("u"), col("t"),
      col("y"), treatedUnit = 0L, donorUnits = Seq(1L, 2L),
      preEnd = 3L, den = 10).collect()
    assert(out.forall(_.getAs[Long]("w1") == 10L))
    assert(out.forall(_.getAs[Long]("w2") == 0L))
    val pre = out.filter(_.getAs[String]("phase") == "pre")
    assert(pre.forall(_.getAs[Double]("gap") == 0.0))
    val post = out.filter(_.getAs[String]("phase") == "post")
    assert(post.length == 1)
    assert(post(0).getAs[Long]("actual") == 99L)
    assert(post(0).getAs[Long]("synth_scaled") == 400L)
    assert(post(0).getAs[Double]("gap") == 59.0)
  }
  test("A-stat: byDiscoveries — extreme group found, never more discoveries than BH") {
    // 20 groups at the base rate, one with an extreme rate
    val rows = (1 to 20).flatMap { g =>
      val hits = if (g == 1) 90 else 30
      (1 to 100).map(i => (g.toLong, i <= hits))
    }
    val df = rows.toDF("grp", "hit")
    val by = Experimentation.byDiscoveries(df, "grp", col("hit"))
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("discovery"))
    val bh = Experimentation.bhDiscoveries(df, "grp", col("hit"))
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("discovery"))
    assert(by.find(_._1 == 1L).exists(_._2), "extreme group must survive BY")
    assert(by.count(_._2) <= bh.count(_._2),
      "BY is strictly more conservative than BH")
    // a plain base-rate group is not discovered
    assert(!by.find(_._1 == 20L).exists(_._2))
  }
  test("A-stat: qiniCurve — perfect-targeting hand trapezoid, null outcome zero") {
    // 10 units, one per decile (score = -id): treated = odd ids,
    // outcome = treated only, control never converts -> g = 1e6 * cyt
    val df = (1L to 10L).map(i => (100L - i, i, i % 2 == 1L, i % 2 == 1L))
      .toDF("sc", "id", "tr", "yy")
    val out = Experimentation.qiniCurve(df, col("sc"), col("id"),
      col("tr"), col("yy")).collect()
    assert(out.length == 10)
    assert(out.map(_.getAs[Long]("qini_micro")).toSeq ==
      Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L, 5L, 5L).map(_ * 1000000L))
    assert(out(0).getAs[Long]("auq_micro") == 2750000L)
    assert(out(0).getAs[Long]("qini_coef_micro") == 250000L)
    // no outcomes anywhere: flat zero curve and coefficient
    val z = (1L to 10L).map(i => (100L - i, i, i % 2 == 1L, false))
      .toDF("sc", "id", "tr", "yy")
    val oz = Experimentation.qiniCurve(z, col("sc"), col("id"),
      col("tr"), col("yy")).collect()
    assert(oz.forall(_.getAs[Long]("qini_micro") == 0L))
    assert(oz.forall(_.getAs[Long]("qini_coef_micro") == 0L))
  }
  test("A-stat: neymanAllocation — volatility earns samples, sums exactly to budget") {
    val df = Seq(("A", 0L), ("A", 10L), ("B", 5L), ("B", 5L),
      ("C", 0L), ("C", 20L)).toDF("st", "v")
    val out = Experimentation.neymanAllocation(df, col("st"), col("v"),
      sampleN = 10L).collect().map(r => r.getString(0) -> r).toMap
    // weights = sqrt(N·Σv² − (Σv)²): A=10, B=0 (zero variance), C=20
    assert(out("A").getAs[Long]("weight") == 10L)
    assert(out("B").getAs[Long]("weight") == 0L)
    assert(out("C").getAs[Long]("weight") == 20L)
    // bases 3/0/6, short 1 -> largest remainder (C) gets it
    assert(out("A").getAs[Long]("alloc_n") == 3L)
    assert(out("B").getAs[Long]("alloc_n") == 0L)
    assert(out("C").getAs[Long]("alloc_n") == 7L)
    assert(out.values.map(_.getAs[Long]("alloc_n")).sum == 10L)
  }

  test("eValue: RR = 2 gives E = 2 + sqrt(2); protective effects mirror; degenerate nulls") {
    import graft.ops.Experimentation
    // exposed: 2 of 10 events; unexposed: 1 of 10 -> RR exactly 2
    def mk(ee: Int, en: Int, ne: Int, nn: Int) =
      (Seq.fill(ee)((true, true)) ++ Seq.fill(en)((true, false)) ++
        Seq.fill(ne)((false, true)) ++ Seq.fill(nn)((false, false)))
        .toDF("x", "y")
    val r = Experimentation.eValue(mk(2, 8, 1, 9), col("x"), col("y")).head()
    assert(r.getAs[Long]("rr_ppm") == 2000000L)
    assert(r.getAs[Double]("evalue") == 2.0 + math.sqrt(2.0 * 1.0))
    // protective RR = 1/2 has the SAME E-value (RR* = max(RR, 1/RR))
    val p = Experimentation.eValue(mk(1, 9, 2, 8), col("x"), col("y")).head()
    assert(p.getAs[Double]("evalue") == r.getAs[Double]("evalue"))
    // no unexposed events -> rr undefined -> nulls, not NaN
    val d = Experimentation.eValue(mk(3, 7, 0, 10), col("x"), col("y")).head()
    assert(d.isNullAt(d.fieldIndex("rr_ppm")))
    assert(d.isNullAt(d.fieldIndex("evalue")))
  }
}
