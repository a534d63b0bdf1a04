package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-12 optimization specs: the driver fast paths touched this round
  * must be BIT-IDENTICAL to their distributed twins (the q497
  * fast≡distributed discipline) — including the ERROR surface under this
  * session's ANSI mode (ADVICE r11: a query's outcome must never depend
  * on which side of a localRollupMax/edge gate the data lands). */
class OptR12Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("gmm2Em: quadratic overflow errors on BOTH paths (ANSI parity)") {
    import spark.implicits._
    // |x − mu| ≈ 6e18 → (x−mu)²·1e6 ≈ 3.6e43 overflows decimal(38,0):
    // the distributed branch throws under ANSI; the local histogram
    // branch must throw too, never silently skip the row (ADVICE r11)
    val df = (Seq.fill(5)(-3000000000000000000L) ++
      Seq.fill(5)(3000000000000000000L)).toDF("x")
    val eFast = intercept[Exception] {
      graft.ops.Experimentation.gmm2Em(df, col("x"), iters = 1).collect()
    }
    val eDist = intercept[Exception] {
      graft.ops.Experimentation.gmm2Em(df, col("x"), iters = 1,
        localRollupMax = -1L).collect()
    }
    val overflowish = "(?s).*(OVERFLOW|OUT_OF_RANGE|overflow).*"
    assert(eFast.toString.matches(overflowish), eFast.toString)
    assert(eDist.toString.matches(overflowish), eDist.toString)
  }

  test("logisticIrls: eta overflow errors on BOTH paths (ANSI parity)") {
    import spark.implicits._
    // after round 1, b1 clamps to ±5e7; round 2's b1·x with |x| = 3e18
    // overflows long — ANSI throws distributed, the local loop must too
    val df = Seq(
      (-3000000000000000000L, 0), (-3000000000000000000L, 0),
      (3000000000000000000L, 1), (3000000000000000000L, 1)).toDF("x", "y")
    val eFast = intercept[Exception] {
      graft.ops.Experimentation.logisticIrls(df, col("x"), col("y"),
        iters = 2).collect()
    }
    val eDist = intercept[Exception] {
      graft.ops.Experimentation.logisticIrls(df, col("x"), col("y"),
        iters = 2, localRollupMax = -1L).collect()
    }
    val overflowish = "(?s).*(OVERFLOW|OUT_OF_RANGE|overflow).*"
    assert(eFast.toString.matches(overflowish), eFast.toString)
    assert(eDist.toString.matches(overflowish), eDist.toString)
  }

  test("bfsHops: driver kernel ≡ distributed layered loop") {
    import spark.implicits._
    // path + branch + disconnected piece; rounds truncates the horizon;
    // one seed (99) absent from the graph keeps its dist-0 row
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (2L, 7L), (7L, 8L), (20L, 21L)).toDF("src", "dst")
    val seeds = Seq(1L, 99L).toDF("s")
    for (rounds <- Seq(1, 3, 8)) {
      val fast = graft.ext.Graph.bfsHops(edges, "src", "dst", seeds, "s",
        rounds)
      val dist = graft.ext.Graph.bfsHops(edges, "src", "dst", seeds, "s",
        rounds, driverEdgeMax = -1L)
      assert(rows(fast) == rows(dist), s"rounds=$rounds")
    }
  }

  test("bfsHops: NULL seed row survives both paths verbatim") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(Some(1L), None).toDF("s")
    val fast = graft.ext.Graph.bfsHops(edges, "src", "dst", seeds, "s", 2)
    val dist = graft.ext.Graph.bfsHops(edges, "src", "dst", seeds, "s", 2,
      driverEdgeMax = -1L)
    assert(rows(fast) == rows(dist))
    assert(fast.filter(col("node").isNull).count() == 1)
  }

  test("diameterTwoSweep: driver kernel ≡ distributed two-sweep") {
    import spark.implicits._
    // tree with known diameter 4 (1-2-3-4-5), plus a branch — the
    // double sweep is exact on trees; also check a rounds cap that
    // CLIPS the second sweep (horizon contract)
    val edges = Seq((3L, 2L), (2L, 1L), (3L, 4L), (4L, 5L), (2L, 9L))
      .toDF("src", "dst")
    for (rounds <- Seq(1, 2, 4, 6)) {
      val fast = graft.ext.Graph.diameterTwoSweep(edges, "src", "dst", rounds)
      val dist = graft.ext.Graph.diameterTwoSweep(edges, "src", "dst", rounds,
        driverEdgeMax = -1L)
      assert(rows(fast) == rows(dist), s"rounds=$rounds")
    }
    val r = graft.ext.Graph.diameterTwoSweep(edges, "src", "dst", 6)
      .collect()(0)
    assert(r.getAs[Long]("diameter_lb") == 4L)
  }

  test("betweennessPivots: driver Brandes kernel ≡ distributed loop") {
    import spark.implicits._
    // diamond (two shortest 1→4 paths ⇒ σ = 2, split δ), a tail past
    // the horizon, a duplicate + reversed edge and a self-loop (must
    // collapse), and an isolated-by-distance node
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 5L), (4L, 6L), (5L, 7L), (6L, 7L), (7L, 8L))
      .toDF("src", "dst")
    for ((np, mh) <- Seq((3, 3), (1, 2), (4, 8))) {
      val fast = graft.ext.Graph.betweennessPivots(edges, "src", "dst",
        numPivots = np, maxHops = mh)
      val dist = graft.ext.Graph.betweennessPivots(edges, "src", "dst",
        numPivots = np, maxHops = mh, driverEdgeMax = -1L)
      assert(rows(fast) == rows(dist), s"pivots=$np hops=$mh")
    }
  }

  test("labelPropagation: gate probe change keeps results identical") {
    import spark.implicits._
    // two triangles bridged by one edge — 3 LPA rounds; the r12 gate
    // derivation (count of the round-1 labels frame instead of a
    // dedicated distinct().count() job) must not move any label
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L)).toDF("src", "dst")
    val got = graft.ext.Graph.labelPropagation(edges, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // both triangles collapse to their min-id-reachable label
    assert(got.values.toSet.size <= 2)
  }
}
