package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Evaluation

/** Specs for the offline evaluation family behind q176-q180: exact
  * AUC, retrieval P@k/R@k/MRR, per-class precision/recall/F1 and the
  * decile lift table — hand-checkable cases plus the conservation
  * laws the ppm arithmetic must satisfy. */
class EvaluationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- aucExact -------------------------------------------------------

  test("aucExact: perfect separation scores 1, reversed scores 0") {
    val df = Seq((10L, 1), (9L, 1), (2L, 0), (1L, 0)).toDF("s", "y")
    val up = Evaluation.aucExact(df, Nil, col("s"), col("y")).head()
    assert(up.getAs[Long]("n_pos") == 2 && up.getAs[Long]("n_neg") == 2)
    assert(up.getAs[Long]("u2") == 8L)          // 2 * (2x2 pairs all won)
    assert(up.getAs[Double]("auc") == 1.0)
    val down = Evaluation.aucExact(df, Nil, -col("s"), col("y")).head()
    assert(down.getAs[Long]("u2") == 0L && down.getAs[Double]("auc") == 0.0)
  }

  test("aucExact: all-tied scores give exactly 0.5; textbook mid case") {
    val tied = Seq((5L, 1), (5L, 0), (5L, 1), (5L, 0)).toDF("s", "y")
    val t = Evaluation.aucExact(tied, Nil, col("s"), col("y")).head()
    assert(t.getAs[Long]("u2") == 4L)           // 4 pairs, all half-credit
    assert(t.getAs[Double]("auc") == 0.5)
    // scores pos {3,1}, neg {2,0}: pairs won = 3 (3>2, 3>0, 1>0), lost 1
    val mid = Seq((3L, 1), (1L, 1), (2L, 0), (0L, 0)).toDF("s", "y")
    val m = Evaluation.aucExact(mid, Nil, col("s"), col("y")).head()
    assert(m.getAs[Long]("u2") == 6L && m.getAs[Double]("auc") == 0.75)
  }

  test("aucExact: per-group independence and null on a degenerate group") {
    val df = Seq(("a", 2L, 1), ("a", 1L, 0), ("b", 7L, 1), ("b", 7L, 1))
      .toDF("g", "s", "y")
    val out = Evaluation.aucExact(df, Seq(col("g")), col("s"), col("y"))
      .orderBy("g").collect()
    assert(out(0).getAs[Double]("auc") == 1.0)
    assert(out(1).isNullAt(out(1).fieldIndex("auc"))) // no negatives
  }

  // ---- retrievalEval --------------------------------------------------

  test("retrievalEval: hits, first rank and the ppm quotients") {
    // q1: rel items {10, 11, 12}; run returns 10 at rank 2, 11 at rank 5
    // q2: rel items {20}; run has no relevant item
    val runs = Seq((1L, 99L, 1), (1L, 10L, 2), (1L, 50L, 3), (1L, 51L, 4),
      (1L, 11L, 5), (2L, 98L, 1), (2L, 97L, 2)).toDF("query_id", "item_id", "rank")
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L))
      .toDF("query_id", "item_id")
    val out = Evaluation.retrievalEval(runs, truth, k = 5)
      .orderBy("query_id").collect()
    val q1 = out(0)
    assert(q1.getAs[Long]("n_rel") == 3 && q1.getAs[Long]("hits") == 2)
    assert(q1.getAs[Long]("first_hit_rank") == 2)
    assert(q1.getAs[Long]("prec_ppm") == 400000L)   // 2/5
    assert(q1.getAs[Long]("rec_ppm") == 666666L)    // 2/3 floored
    assert(q1.getAs[Long]("rr_ppm") == 500000L)     // 1/2
    val q2 = out(1)
    assert(q2.getAs[Long]("hits") == 0 && q2.getAs[Long]("rr_ppm") == 0L)
    assert(q2.getAs[Long]("prec_ppm") == 0L && q2.getAs[Long]("rec_ppm") == 0L)
  }

  test("retrievalEval: ranks beyond k are ignored") {
    val runs = Seq((1L, 10L, 1), (1L, 11L, 7)).toDF("query_id", "item_id", "rank")
    val truth = Seq((1L, 10L), (1L, 11L)).toDF("query_id", "item_id")
    val r = Evaluation.retrievalEval(runs, truth, k = 5).head()
    assert(r.getAs[Long]("hits") == 1)
  }

  // ---- classMetrics ---------------------------------------------------

  test("classMetrics: hallucinated and never-predicted classes surface") {
    // truth: a,a,b ; pred: a,b,c — c is hallucinated, b never correct
    val df = Seq(("a", "a"), ("a", "b"), ("b", "c")).toDF("l", "p")
    val out = Evaluation.classMetrics(df, col("l"), col("p"))
      .orderBy("class").collect()
    val a = out(0); val b = out(1); val c = out(2)
    assert(a.getAs[Long]("tp") == 1 && a.getAs[Long]("fn") == 1
      && a.getAs[Long]("fp") == 0)
    assert(a.getAs[Long]("prec_ppm") == 1000000L)
    assert(a.getAs[Long]("rec_ppm") == 500000L)
    assert(a.getAs[Long]("f1_ppm") == 666666L)      // 2/3 floored
    assert(b.getAs[Long]("n_true") == 1 && b.getAs[Long]("n_pred") == 1
      && b.getAs[Long]("tp") == 0 && b.getAs[Long]("f1_ppm") == 0L)
    // hallucinated class: no truth rows → recall null, precision 0
    assert(c.getAs[Long]("n_true") == 0 && c.getAs[Long]("n_pred") == 1)
    assert(c.getAs[Long]("prec_ppm") == 0L)
    assert(c.isNullAt(c.fieldIndex("rec_ppm")))
  }

  test("classMetrics: Σtp/Σfp/Σfn are consistent with the population") {
    val df = Seq(("x", "x"), ("x", "y"), ("y", "y"), ("y", "x"), ("y", "y"))
      .toDF("l", "p")
    val out = Evaluation.classMetrics(df, col("l"), col("p")).collect()
    assert(out.map(_.getAs[Long]("tp")).sum == 3)
    // every error is one class's fp and another's fn
    assert(out.map(_.getAs[Long]("fp")).sum == out.map(_.getAs[Long]("fn")).sum)
    assert(out.map(_.getAs[Long]("n_true")).sum == 5)
  }

  // ---- decileLift -----------------------------------------------------

  test("decileLift: conservation — bins tile the population, cum hits totals") {
    val df = (1 to 100).map(i => (i.toLong, if (i > 80) 1 else 0))
      .toDF("s", "y")
    val out = Evaluation.decileLift(df,
      Seq(col("s").desc, col("s").asc), col("y"), nBins = 10)
      .orderBy("bin").collect()
    assert(out.length == 10 && out.forall(_.getAs[Long]("n") == 10))
    // top two deciles hold ALL positives (scores 81-100)
    assert(out(0).getAs[Long]("n_pos") == 10 && out(1).getAs[Long]("n_pos") == 10)
    assert(out(1).getAs[Long]("capture_ppm") == 1000000L)
    // decile-1 lift = (10/10) / (20/100) = 5x
    assert(out(0).getAs[Long]("lift_ppm") == 5000000L)
    // full-population lift is exactly 1
    assert(out(9).getAs[Long]("lift_ppm") == 1000000L)
    assert(out(9).getAs[Long]("cum_n") == 100 && out(9).getAs[Long]("cum_pos") == 20)
  }

  test("decileLift: uneven population — bin sizes differ by at most one") {
    val df = (1 to 23).map(i => (i.toLong, i % 2)).toDF("s", "y")
    val out = Evaluation.decileLift(df, Seq(col("s").asc), col("y"), nBins = 4)
      .orderBy("bin").collect()
    val sizes = out.map(_.getAs[Long]("n"))
    assert(sizes.sum == 23 && (sizes.max - sizes.min) <= 1)
  }

  test("cohensKappa: hand-solved 2×2 — κ = 0.4 exactly") {
    import spark.implicits._
    // 4 keep/keep, 3 drop/drop, 2 keep/drop, 1 drop/keep:
    // p_o = 0.7, marginals 6·5 + 4·5 = 50 → p_e = 0.5,
    // κ = (70 − 50) / (100 − 50) = 0.4
    val rows = Seq.fill(4)(("keep", "keep")) ++ Seq.fill(3)(("drop", "drop")) ++
      Seq.fill(2)(("keep", "drop")) ++ Seq.fill(1)(("drop", "keep"))
    val r = Evaluation.cohensKappa(rows.toDF("a", "b"),
      col("a"), col("b")).head()
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("n_agree") == 7L)
    assert(r.getAs[Double]("p_o") == 0.7)
    assert(r.getAs[Double]("p_e") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.4)
  }

  test("cohensKappa: perfect agreement is 1, marginal-independent") {
    import spark.implicits._
    val rows = Seq(("x", "x"), ("y", "y"), ("z", "z"), ("x", "x"))
    val r = Evaluation.cohensKappa(rows.toDF("a", "b"),
      col("a"), col("b")).head()
    assert(r.getAs[Double]("kappa") == 1.0)
  }

  test("mapAtK: rank-weighted hits; empty-truth query reports null ap") {
    import spark.implicits._
    val runs = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 4L),
      (2L, 10L, 1L)).toDF("query_id", "item_id", "rank")
    val truth = Seq((1L, 11L), (1L, 13L), (1L, 99L)).toDF("query_id", "item_id")
    val out = Evaluation.mapAtK(runs, truth, k = 10)
      .orderBy("query_id").collect()
    // q1: hits at ranks 2 (P=1/2) and 4 (P=2/4); AP = 1.0/min(3,10)/...
    assert(out.length == 1) // q2 has no truth rows → no n_rel row
    val r = out.head
    assert(r.getAs[Long]("n_rel") == 3L && r.getAs[Long]("hits") == 2L)
    assert(r.getAs[Double]("ap") == 0.333333)
  }

  test("mapAtK: perfect top-ranked retrieval scores AP = 1") {
    import spark.implicits._
    val runs = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "item_id", "rank")
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L)).toDF("query_id", "item_id")
    val r = Evaluation.mapAtK(runs, truth, k = 3).head()
    assert(r.getAs[Double]("ap") == 1.0)
  }

  test("krippendorffAlpha: abstentions drop; pooled-distribution chance") {
    import spark.implicits._
    // pairable units (k,k),(k,d),(d,d),(d,d) + one dropped abstention:
    // Do = 2, pooled k=3 d=5 → n=8, Σnv²=34, De=30, α = 1 − 7·2/30
    val rows = Seq(Some("k") -> Some("k"), Some("k") -> Some("d"),
      Some("d") -> Some("d"), Some("d") -> Some("d"),
      Some("k") -> Option.empty[String])
    val r = Evaluation.krippendorffAlpha(rows.toDF("a", "b"),
      col("a"), col("b")).head()
    assert(r.getAs[Long]("n_units") == 4L && r.getAs[Long]("n_values") == 2L)
    assert(r.getAs[Long]("do_num") == 2L && r.getAs[Long]("de_num") == 30L)
    assert(r.getAs[Double]("alpha") == BigDecimal(1.0 - 14.0 / 30.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ---- fleissKappa ----------------------------------------------------

  test("fleissKappa: unanimous raters with split categories score 1") {
    // 4 items × 2 raters; both raters agree on every item, categories
    // split 2/2 → P̄ = 1, P̄e = 0.5, κ = 1
    val df = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "A"),
      (3L, "B"), (3L, "B"), (4L, "B"), (4L, "B")).toDF("item", "cat")
    val r = Evaluation.fleissKappa(df, col("item"), col("cat"), 2).head()
    assert(r.getAs[Long]("n_items") == 4L && r.getAs[Long]("n_raters") == 2L)
    assert(r.getAs[Double]("p_bar") == 1.0)
    assert(r.getAs[Double]("p_e") == 0.5)
    assert(r.getAs[Double]("kappa") == 1.0)
  }

  test("fleissKappa: total disagreement with balanced margins scores -1") {
    // every item rated (A, B) → P̄ = 0; margins 4/4 → P̄e = 0.5 → κ = −1
    val df = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (4L, "A"), (4L, "B")).toDF("item", "cat")
    val r = Evaluation.fleissKappa(df, col("item"), col("cat"), 2).head()
    assert(r.getAs[Double]("p_bar") == 0.0)
    assert(r.getAs[Double]("kappa") == -1.0)
  }

  test("fleissKappa: degenerate single category → null kappa; " +
      "wrong-size items drop") {
    // item 3 has three ratings → dropped by the nRaters = 2 filter;
    // the survivors all say A → P̄e = 1 → κ = 0/0 = null
    val df = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "A"),
      (3L, "A"), (3L, "A"), (3L, "A")).toDF("item", "cat")
    val r = Evaluation.fleissKappa(df, col("item"), col("cat"), 2).head()
    assert(r.getAs[Long]("n_items") == 2L)
    assert(r.getAs[Double]("p_bar") == 1.0 && r.getAs[Double]("p_e") == 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }

  // ---- brierDecomposition ---------------------------------------------

  test("brierDecomposition: perfectly calibrated bins → zero reliability, " +
      "hand-checked resolution and Brier") {
    // bin 2: conf 200 000 ppm, 1 of 5 positive (rate = conf);
    // bin 8: conf 800 000 ppm, 4 of 5 positive (rate = conf);
    // ȳ = 0.5 → REL = 0, RES = (5·3e5² + 5·3e5²)/10 = 9e10,
    // UNC = 5e5·5e5 = 2.5e11, BRIER = 1.6e12/10 = 1.6e11
    val rows = Seq.fill(1)((200000L, 1)) ++ Seq.fill(4)((200000L, 0)) ++
      Seq.fill(4)((800000L, 1)) ++ Seq.fill(1)((800000L, 0))
    val r = Evaluation.brierDecomposition(rows.toDF("conf", "y"),
      col("conf"), col("y"), bins = 10).head()
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("y_bar_ppm") == 500000L)
    assert(r.getAs[Long]("reliability_ppm2") == 0L)
    assert(r.getAs[Long]("resolution_ppm2") == 90000000000L)
    assert(r.getAs[Long]("uncertainty_ppm2") == 250000000000L)
    assert(r.getAs[Long]("brier_ppm2") == 160000000000L)
    // Murphy identity holds exactly on this fixture: REL − RES + UNC
    assert(r.getAs[Long]("reliability_ppm2") - r.getAs[Long]("resolution_ppm2")
      + r.getAs[Long]("uncertainty_ppm2") == r.getAs[Long]("brier_ppm2"))
  }

  // ---- binaryDiagnostics ----------------------------------------------

  test("binaryDiagnostics: hand 2×2 — rates, Youden's J and MCC") {
    // tp=4 fp=1 fn=2 tn=3: sens = 4/6, spec = 3/4
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false))
    val r = Evaluation.binaryDiagnostics(rows.toDF("p", "y"),
      col("p"), col("y")).head()
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
      r.getAs[Long]("tn")) == ((4L, 1L, 2L, 3L)))
    assert(r.getAs[Long]("sens_ppm") == 666666L)
    assert(r.getAs[Long]("spec_ppm") == 750000L)
    assert(r.getAs[Long]("youden_j_ppm") == 416666L)
    assert(r.getAs[Long]("balanced_acc_ppm") == 708333L)
    // mcc = (12 − 2)/√(5·6·4·5) = 10/√600
    assert(r.getAs[Double]("mcc") == BigDecimal(10.0 / math.sqrt(600.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("binaryDiagnostics: degenerate margin → null MCC") {
    // predictor always fires: tn + fn = 0 column margin zero
    val rows = Seq((true, true), (true, false))
    val r = Evaluation.binaryDiagnostics(rows.toDF("p", "y"),
      col("p"), col("y")).head()
    assert(r.isNullAt(r.fieldIndex("mcc")))
  }

  test("brierDecomposition: anti-calibrated predictor — reliability " +
      "dominates, resolution zero") {
    // both bins have the SAME outcome rate 0.5 → no discrimination;
    // conf says 0.2 and 0.8 → pure miscalibration
    val rows = Seq.fill(2)((200000L, 1)) ++ Seq.fill(2)((200000L, 0)) ++
      Seq.fill(2)((800000L, 1)) ++ Seq.fill(2)((800000L, 0))
    val r = Evaluation.brierDecomposition(rows.toDF("conf", "y"),
      col("conf"), col("y"), bins = 10).head()
    assert(r.getAs[Long]("resolution_ppm2") == 0L)
    assert(r.getAs[Long]("reliability_ppm2") == 90000000000L)
  }

  test("A-eval: isotonicCalibration — PAV pools violators, keeps monotone input") {
    import graft.ops.Evaluation
    // bins: rates 1/4, 3/4, 1/4 -> bins 1,2 violate (3/4 > 1/4): pool to
    // (4/8 = 1/2); bin 0 (1/4) <= 1/2 stays alone
    val rows = Seq.tabulate(4)(i => (0L, i < 1)) ++
      Seq.tabulate(4)(i => (1L, i < 3)) ++
      Seq.tabulate(4)(i => (2L, i < 1))
    val out = Evaluation.isotonicCalibration(rows.toDF("bin", "y"),
      col("bin"), col("y")).orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("fit_ppm")).toSeq ==
      Seq(250000L, 500000L, 500000L))
    assert(out.map(r => (r.getAs[Long]("pool_lo"), r.getAs[Long]("pool_hi")))
      .toSeq == Seq((0L, 0L), (1L, 2L), (1L, 2L)))
    // already-monotone input is untouched, and output is non-decreasing
    val mono = Seq.tabulate(4)(i => (0L, i < 1)) ++
      Seq.tabulate(4)(i => (1L, i < 2)) ++
      Seq.tabulate(4)(i => (2L, i < 3))
    val mo = Evaluation.isotonicCalibration(mono.toDF("bin", "y"),
      col("bin"), col("y")).orderBy("bin").collect()
      .map(_.getAs[Long]("fit_ppm"))
    assert(mo.toSeq == Seq(250000L, 500000L, 750000L))
    assert(mo.sliding(2).forall(s => s(0) <= s(1)))
    // cascade: rates 3/4, 2/4, 1/4 all pool into one (6/12 = 1/2)
    val casc = Seq.tabulate(4)(i => (0L, i < 3)) ++
      Seq.tabulate(4)(i => (1L, i < 2)) ++
      Seq.tabulate(4)(i => (2L, i < 1))
    val co = Evaluation.isotonicCalibration(casc.toDF("bin", "y"),
      col("bin"), col("y")).collect().map(_.getAs[Long]("fit_ppm"))
    assert(co.toSeq == Seq(500000L, 500000L, 500000L))
  }

  test("A-eval: passAtK — closed-form cases and the n-c < k clamp") {
    import graft.ops.Evaluation
    // task 0: n=4, c=1, k=2 -> 1 - C(3,2)/C(4,2) = 1 - 3/6 = 0.5
    // task 1: n=4, c=3, k=2 -> n-c=1 < 2 -> pass = 1 exactly
    // task 2: n=4, c=0 -> pass = 0
    val rows = (0 until 4).map(i => (0L, i < 1)) ++
      (0 until 4).map(i => (1L, i < 3)) ++
      (0 until 4).map(i => (2L, false))
    val out = Evaluation.passAtK(rows.toDF("t", "ok"), col("t"),
      col("ok"), k = 2).collect()
    val byTask = out.filter(!_.isNullAt(0))
      .map(r => r.getAs[Long]("task") -> r.getAs[Long]("pass_nano")).toMap
    assert(byTask(0L) == 500000000L)
    assert(byTask(1L) == 1000000000L)
    assert(byTask(2L) == 0L)
    // summary row: integer mean of the three
    val s = out.filter(_.isNullAt(0))(0)
    assert(s.getAs[Long]("pass_nano") == 1500000000L / 3L)
    // tasks with n < k are excluded
    val small = Seq((9L, true)).toDF("t", "ok")
    assert(Evaluation.passAtK(rows.toDF("t", "ok").union(small), col("t"),
      col("ok"), k = 2).filter(col("task") === 9L).count() == 0)
  }

  test("A-eval: dawidSkene — a consistent rater beats noisy ones; caps at 4") {
    import graft.ops.Evaluation
    // 12 items, true label = item % 2. Rater "good" always truthful;
    // raters n1, n2 flip a third of their labels.
    val rows = (0 until 12).flatMap { i =>
      val truth = i % 2
      Seq((i.toLong, "good", truth),
        (i.toLong, "n1", if (i % 3 == 0) 1 - truth else truth),
        (i.toLong, "n2", if (i % 4 == 0) 1 - truth else truth))
    }
    val out = Evaluation.dawidSkene(rows.toDF("i", "r", "l"),
      col("i"), col("r"), col("l") === 1, rounds = 2)
      .collect().map(r => r.getAs[String]("rater") ->
        (r.getAs[Long]("alpha_ppm"), r.getAs[Long]("beta_ppm"))).toMap
    // the truthful rater separates the classes best: its false-positive
    // rate is the lowest and its Youden-style gap (alpha - beta)
    // dominates both noisy raters (raw alpha alone can tie when a noisy
    // rater's flips all land on one class)
    assert(out("good")._2 < out("n1")._2 && out("good")._2 < out("n2")._2)
    def gap(k: String) = out(k)._1 - out(k)._2
    assert(gap("good") > gap("n1") && gap("good") > gap("n2"))
    // > 4 raters per item rejected (exact-integer overflow guard)
    val five = (0 until 5).map(r => (1L, s"r$r", 1))
    assertThrows[IllegalArgumentException] {
      Evaluation.dawidSkene(five.toDF("i", "r", "l"),
        col("i"), col("r"), col("l") === 1)
    }
  }

  test("A-eval: rankBiasedOverlap — identical lists score ~1, disjoint 0") {
    import graft.ops.Evaluation
    val a = (1 to 10).map(i => (i.toLong, i.toLong)).toDF("id", "rank")
    val same = Evaluation.rankBiasedOverlap(a, a, "id", "rank", 0.9, 10)
      .head()
    assert(same.getAs[Long]("n_common") == 10L)
    // truncated RBO of identical lists = (1-p) sum p^(d-1) * 1 =
    // 1 - p^10 (geometric) in nano, up to per-term rounding
    val expect = math.round((1 - math.pow(0.9, 10)) * 1e9)
    assert(math.abs(same.getAs[Long]("rbo_nano") - expect) <= 10)
    val b = (1 to 10).map(i => ((i + 100).toLong, i.toLong)).toDF("id", "rank")
    val disj = Evaluation.rankBiasedOverlap(a, b, "id", "rank", 0.9, 10)
      .head()
    assert(disj.getAs[Long]("n_common") == 0L)
    assert(disj.getAs[Long]("rbo_nano") == 0L)
    // top-weighting: agreeing on rank 1 beats agreeing on rank 10
    val top = (Seq((1L, 1L)) ++ (2 to 10).map(i => ((i + 50).toLong, i.toLong)))
      .toDF("id", "rank")
    val bot = (Seq((10L, 10L)) ++ (1 to 9).map(i => ((i + 70).toLong, i.toLong)))
      .toDF("id", "rank")
    val aTop = Evaluation.rankBiasedOverlap(a, top, "id", "rank", 0.9, 10)
      .head().getAs[Long]("rbo_nano")
    val aBot = Evaluation.rankBiasedOverlap(a, bot, "id", "rank", 0.9, 10)
      .head().getAs[Long]("rbo_nano")
    assert(aTop > aBot)
  }

  test("eval: reliabilityDiagram — hand bins, exact gap mass, top-edge bin") {
    import spark.implicits._
    // 2 bins: scores 200k/300k (bin 0), 800k + the exact top edge
    // 1000000 (both bin 1 — the least() clamp)
    val df = Seq((200000L, false), (300000L, true),
      (800000L, true), (1000000L, true)).toDF("s", "y")
    val out = Evaluation.reliabilityDiagram(df, col("s"), col("y"), 2)
      .orderBy("bin").collect()
    assert(out.length == 2)
    val b0 = out(0); val b1 = out(1)
    assert(b0.getAs[Long]("n") == 2 && b0.getAs[Long]("pos") == 1)
    assert(b0.getAs[Long]("conf_ppm") == 250000L)
    assert(b0.getAs[Long]("acc_ppm") == 500000L)
    assert(b0.getAs[Long]("gap_mass") == math.abs(1000000L - 500000L))
    assert(b1.getAs[Long]("n") == 2 && b1.getAs[Long]("pos") == 2)
    assert(b1.getAs[Long]("conf_ppm") == 900000L)
    assert(b1.getAs[Long]("gap_mass") == math.abs(2000000L - 1800000L))
    // ECE = (500000 + 200000) div 4 = 175000 ppm
    val ece = Evaluation.reliabilityDiagram(df, col("s"), col("y"), 2)
      .agg(org.apache.spark.sql.functions.expr("sum(gap_mass) div sum(n)"))
      .head().getLong(0)
    assert(ece == 175000L)
  }

  test("eval: fairnessAudit — per-group rates and parity gap, null-safe") {
    import spark.implicits._
    // group A: 4 rows, sel 2, pos 2 (tp 2, fp 0); group B: 2 rows,
    // sel 1, pos 0 (tpr null), fp 1
    val df = Seq(
      ("A", true, true), ("A", true, true), ("A", false, false),
      ("A", false, false), ("B", false, true), ("B", false, false))
      .toDF("g", "y", "p")
    val out = Evaluation.fairnessAudit(df, col("g"), col("y"), col("p"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A"); val b = out("B")
    assert(a.getAs[Long]("sel_ppm") == 500000L)
    assert(a.getAs[Long]("tpr_ppm") == 1000000L)
    assert(a.getAs[Long]("fpr_ppm") == 0L)
    assert(b.getAs[Long]("sel_ppm") == 500000L)
    assert(b.isNullAt(b.fieldIndex("tpr_ppm"))) // no positives in B
    assert(b.getAs[Long]("fpr_ppm") == 500000L)
    // overall sel = 3/6 -> both groups' parity gap is 0
    assert(a.getAs[Long]("sel_gap_ppm") == 0L)
    assert(b.getAs[Long]("sel_gap_ppm") == 0L)
  }

  test("eval: splitConformal — hand order statistic and coverage") {
    import spark.implicits._
    // calib residuals 10,20,30,40,50,60,70,80,90 (n=9); alpha=0.2 ->
    // k = ceil(10*0.8) = 8 -> qhat = 80; eval residuals 5,75,85,95
    // -> coverage 2/4? no: 5<=80, 75<=80, 85>80, 95>80 -> 500000 ppm
    val rows = (1 to 9).map(i => (i * 10L, i.toLong, true)) ++
      Seq((5L, 101L, false), (75L, 102L, false),
        (85L, 103L, false), (95L, 104L, false))
    val df = rows.toDF("r", "tie", "c")
    val out = Evaluation.splitConformal(df, col("r"), col("tie"),
      col("c"), alphaNum = 20, alphaDen = 100).head()
    assert(out.getAs[Long]("n_calib") == 9L)
    assert(out.getAs[Long]("n_eval") == 4L)
    assert(out.getAs[Long]("qhat") == 80L)
    assert(out.getAs[Long]("coverage_ppm") == 500000L)
    // too-small calibration slice (k > n) -> null qhat and coverage
    val tiny = Seq((10L, 1L, true), (20L, 2L, true), (5L, 3L, false))
      .toDF("r", "tie", "c")
    val t = Evaluation.splitConformal(tiny, col("r"), col("tie"),
      col("c"), alphaNum = 10, alphaDen = 100).head()
    assert(t.isNullAt(t.fieldIndex("qhat")))
    assert(t.isNullAt(t.fieldIndex("coverage_ppm")))
  }
}
