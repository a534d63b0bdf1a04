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
