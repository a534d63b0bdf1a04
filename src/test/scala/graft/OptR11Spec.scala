package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-11 optimization specs: every operator that gained a driver
  * fast path or a count-gated broadcast this round must produce the
  * BIT-IDENTICAL result on both paths (the q497 fast≡distributed
  * discipline) — the optimization is a plan change, never a semantics
  * change. */
class OptR11Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("powerIterationInt: driver kernel ≡ distributed loop (incl. null corr)") {
    import spark.implicits._
    // 3×3 symmetric matrix with one NULL corr cell (zero-variance dim)
    val corr = Seq(
      (0, 0, Some(1.0)), (0, 1, Some(0.6)), (0, 2, None: Option[Double]),
      (1, 1, Some(1.0)), (1, 2, Some(-0.2)), (2, 2, Some(1.0)))
      .toDF("i", "j", "corr")
    val fast = graft.ext.Clustering.powerIterationInt(corr, dims = 3, rounds = 4)
    val dist = graft.ext.Clustering.powerIterationInt(corr, dims = 3, rounds = 4,
      localDimsMax = 0)
    assert(rows(fast) == rows(dist))
  }

  test("powerIterationInt: zero matrix — both paths raise DIVIDE_BY_ZERO") {
    import spark.implicits._
    // under ANSI (the Spark 4 default) the distributed `div mx` errors
    // on a zero matrix; the driver kernel must replicate the error,
    // not soften it to NULLs
    val corr = Seq((0, 0, 0.0), (0, 1, 0.0), (1, 1, 0.0)).toDF("i", "j", "corr")
    val eFast = intercept[Exception] {
      graft.ext.Clustering.powerIterationInt(corr, dims = 2, rounds = 3)
        .collect()
    }
    val eDist = intercept[Exception] {
      graft.ext.Clustering.powerIterationInt(corr, dims = 2, rounds = 3,
        localDimsMax = 0).collect()
    }
    assert(eFast.getMessage.contains("DIVIDE_BY_ZERO"))
    assert(eDist.toString.contains("DIVIDE_BY_ZERO"))
  }

  test("powerIterationTwo: driver kernel ≡ distributed loop (planted spikes)") {
    import spark.implicits._
    val corr = Seq(
      (0, 0, 1.0), (0, 1, 0.9), (0, 2, 0.05), (0, 3, 0.0),
      (1, 1, 1.0), (1, 2, 0.0), (1, 3, 0.05),
      (2, 2, 1.0), (2, 3, 0.8), (3, 3, 1.0)).toDF("i", "j", "corr")
    val fast = graft.ext.Clustering.powerIterationTwo(corr, dims = 4, rounds = 6)
    val dist = graft.ext.Clustering.powerIterationTwo(corr, dims = 4, rounds = 6,
      localDimsMax = 0)
    assert(rows(fast) == rows(dist))
  }

  test("powerIterationTwo: zero matrix — both paths raise on zero deflation norm") {
    import spark.implicits._
    // chase 1 zero-holds via its CASE guard, but the rank-one deflation
    // then divides by ‖v₁‖² = 0 — an ANSI error on the distributed
    // path, replicated by the driver kernel
    val corr = Seq((0, 0, 0.0), (0, 1, 0.0), (1, 1, 0.0)).toDF("i", "j", "corr")
    val eFast = intercept[Exception] {
      graft.ext.Clustering.powerIterationTwo(corr, dims = 2, rounds = 2)
        .collect()
    }
    val eDist = intercept[Exception] {
      graft.ext.Clustering.powerIterationTwo(corr, dims = 2, rounds = 2,
        localDimsMax = 0).collect()
    }
    assert(eFast.getMessage.contains("DIVIDE_BY_ZERO"))
    assert(eDist.toString.contains("DIVIDE_BY_ZERO"))
  }

  test("gmm2Em: driver histogram loop ≡ distributed agg loop") {
    import spark.implicits._
    // bimodal integer values with repeats (histogram weights matter)
    val vals = (Seq.fill(40)(100L) ++ Seq.fill(35)(130L) ++ Seq.fill(25)(95L) ++
      Seq.fill(50)(900L) ++ Seq.fill(30)(870L) ++ Seq.fill(20)(955L))
      .zipWithIndex.map { case (v, i) => v + (i % 7) }
    val df = vals.toDF("x")
    val fast = graft.ops.Experimentation.gmm2Em(df, col("x"), iters = 4)
    val dist = graft.ops.Experimentation.gmm2Em(df, col("x"), iters = 4,
      localRollupMax = -1L)
    assert(rows(fast) == rows(dist))
  }

  test("logisticIrls: driver histogram loop ≡ distributed agg loop") {
    import spark.implicits._
    val df = (0 until 300).map { i =>
      val x = (i % 30).toLong
      (x, if (x * 13 % 29 > 14) 1 else 0)
    }.toDF("x", "y")
    val fast = graft.ops.Experimentation.logisticIrls(df, col("x"), col("y"),
      iters = 5)
    val dist = graft.ops.Experimentation.logisticIrls(df, col("x"), col("y"),
      iters = 5, localRollupMax = -1L)
    assert(rows(fast) == rows(dist))
  }

  test("bradleyTerry: gated-broadcast plan matches the ungated result") {
    import spark.implicits._
    // above-vs-below gate changes ONLY join strategy; integer MM rounds
    // must be bit-identical
    val games = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (2L, 1L),
      (1L, 2L), (3L, 2L), (2L, 3L), (1L, 3L), (1L, 2L))
      .toDF("w", "l")
    val out = graft.ops.Evaluation.bradleyTerry(games, col("w"), col("l"),
      iters = 3)
    // fixture trajectory: strengths positive, shares sum to ≤ 1e6,
    // winner of most games ranks first
    val got = out.orderBy(col("strength_u").desc, col("item")).collect()
    assert(got.map(_.getLong(0)).head == 1L)
    assert(got.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
  }

  test("pageRank over pinned edge layout: known square graph ranks") {
    import spark.implicits._
    // 4-cycle: symmetric, all degrees 2 → uniform ranks stay uniform
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val r = graft.ext.Graph.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r.size == 4 && r.values.toSet.size == 1)
  }
}
