package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Clustering

/** E3+ feature-space ops: integer k-means and the exact dimension
  * correlation matrix. */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("kMeansInt: well-separated blobs are recovered exactly") {
    // two tight blobs around (0, 0) and (10, 10); k = 2, ids 0/1 seed
    // one blob each, so one round converges
    val df = vecs(
      0L -> Seq(0.0f, 0.1f), 2L -> Seq(0.1f, 0.0f), 4L -> Seq(0.05f, 0.05f),
      1L -> Seq(10.0f, 10.1f), 3L -> Seq(10.1f, 10.0f), 5L -> Seq(9.9f, 10.0f))
    val out = Clustering.kMeansInt(df, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == out(2L) && out(2L) == out(4L))
    assert(out(1L) == out(3L) && out(3L) == out(5L))
    assert(out(0L) != out(1L))
  }

  test("kMeansInt: an emptied cluster keeps its previous centroid") {
    // k = 3 over two distinct points: init takes ids 0, 1, 2 but id 2
    // duplicates id 0's vector, so cluster 2 empties after round 1
    // (ties break to the LOWER cluster id) and must keep its centroid
    val df = vecs(0L -> Seq(0.0f), 1L -> Seq(5.0f), 2L -> Seq(0.0f))
    val out = Clustering.kMeansInt(df, "vec_id", "embedding", k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 2L -> 0L, 1L -> 1L))
  }

  test("kMeansInt: dist2 is the exact integer squared distance") {
    // one point, one cluster: centroid = the point itself -> dist2 = 0
    val df = vecs(7L -> Seq(0.25f, -0.5f))
    val r = Clustering.kMeansInt(df, "vec_id", "embedding", 1, 1)
      .collect().head
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
  }

  test("correlationMatrix: perfect +/- correlation and unit diagonal") {
    // dim1 = 2*dim0 (corr +1), dim2 = -dim0 (corr -1)
    val df = vecs(
      1L -> Seq(1.0f, 2.0f, -1.0f),
      2L -> Seq(2.0f, 4.0f, -2.0f),
      3L -> Seq(3.0f, 6.0f, -3.0f))
    val out = Clustering.correlationMatrix(df, "embedding", dims = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(4)).toMap
    assert(math.abs(out((0, 0)) - 1.0) < 1e-12)
    assert(math.abs(out((0, 1)) - 1.0) < 1e-12)
    assert(math.abs(out((0, 2)) + 1.0) < 1e-12)
    assert(out.size == 6) // upper triangle of 3 dims
  }

  test("correlationMatrix: constant dimension yields null corr, not NaN") {
    val df = vecs(1L -> Seq(1.0f, 5.0f), 2L -> Seq(2.0f, 5.0f))
    val rows = Clustering.correlationMatrix(df, "embedding", dims = 2)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.isNullAt(4))).toMap
    assert(rows((0, 1)) && rows((1, 1))) // anything vs the constant dim
    assert(!rows((0, 0)))
  }

  test("labelCentroidCosines: orthogonal labels score 0, aligned score 1") {
    // label 1 lives on the x axis, label 2 on the y axis, label 3 is a
    // scaled copy of label 1's direction
    val df = Seq(
      (1, Seq(1.0f, 0.0f)), (1, Seq(3.0f, 0.0f)),
      (2, Seq(0.0f, 2.0f)),
      (3, Seq(2.0f, 0.0f)))
      .toDF("label", "embedding")
    val out = Clustering.labelCentroidCosines(df, col("embedding"),
        col("label"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("cosine"))).toMap
    assert(out((1, 2)) == ((2L, 1L, 0.0)))
    assert(out((2, 3)) == ((1L, 1L, 0.0)))
    assert(out((1, 3)) == ((2L, 1L, 1.0)))
  }

  test("labelSilhouette: tight separated labels score 1e6; a straddler " +
      "drags its label down") {
    val tight = Seq(
      (1L, 1, Seq(0.0f, 0.0f)), (2L, 1, Seq(0.0f, 0.0f)),
      (3L, 2, Seq(10.0f, 10.0f)), (4L, 2, Seq(10.0f, 10.0f)))
    val out1 = Clustering.labelSilhouette(tight.toDF("id", "label", "embedding"),
      col("id"), col("embedding"), col("label"))
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("mean_sil_micro")).toMap
    assert(out1 == Map(1 -> 1000000L, 2 -> 1000000L))
    // move one label-1 member onto label 2's centroid: its s < 0
    val straddle = tight.updated(1, (2L, 1, Seq(10.0f, 10.0f)))
    val out2 = Clustering.labelSilhouette(
      straddle.toDF("id", "label", "embedding"),
      col("id"), col("embedding"), col("label"))
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("mean_sil_micro")).toMap
    // label 1 = {(0,0), (10,10)}: the straddler sits ON label 2's
    // centroid (s = −1) and the stay-behind is pulled to s = 0.5 →
    // mean −250000; label 2's own members are untouched
    assert(out2(1) == -250000L)
    assert(out2(2) == 1000000L)
  }

  test("semanticDedup: planted within-cluster near-copies removed, keep-first") {
    // blob A around (1, 0), blob B around (0, 1); ids 0/1 seed one
    // blob each. 10/11 are near-copies of 0/1 (cos ~ 0.9999); 20 is an
    // independent A-cluster doc (cos to 0 ~ 0.71, below tau = 0.9)
    val df = vecs(
      0L -> Seq(1.0f, 0.0f), 10L -> Seq(1.0f, 0.01f), 20L -> Seq(1.0f, 1.0f),
      1L -> Seq(0.0f, 1.0f), 11L -> Seq(0.01f, 1.0f))
    val out = Clustering.semanticDedup(df, "vec_id", "embedding",
        k = 2, iters = 2, tauNumSq = 81L, tauDenSq = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // exactly the two planted copies are removed, each kept_by its source
    assert(out.toSet == Set((10L, 0L, 1L), (11L, 1L, 1L)))
  }

  test("semanticDedup: negative-dot pairs never qualify") {
    // antipodal unit vectors share a cluster under k = 1 but cos = -1
    val df = vecs(0L -> Seq(1.0f, 0.0f), 1L -> Seq(-1.0f, 0.0f))
    val out = Clustering.semanticDedup(df, "vec_id", "embedding",
      k = 1, iters = 1, tauNumSq = 1L, tauDenSq = 100L)
    assert(out.count() == 0)
  }

  test("kCenterSelect: farthest-point order and exact distances, hand case") {
    // 1-D points at 0, 1, 10, 20 (ids 0..3): seed id 0, then the
    // farthest (id 3 at 20), then id 2 (10, equidistant-ish), micro^2
    val df = vecs(0L -> Seq(0.0f), 1L -> Seq(1.0f),
      2L -> Seq(10.0f), 3L -> Seq(20.0f))
    val out = Clustering.kCenterSelect(df, "vec_id", "embedding", k = 3)
      .orderBy(col("sel_order"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L),
      (2L, 3L, 400000000000000L),   // (2e7)^2
      (3L, 2L, 100000000000000L)))  // (1e7)^2
  }

  test("mauveLite: identical histograms score 0; disjoint support scores > 0") {
    // two tight blobs; ids 0/1 seed one each. P and Q each hold one
    // point per blob -> per-cluster n_p = n_q -> every js_u term is 0
    val df = Seq(
      (0L, Seq(0.0f, 0.0f), 1), (1L, Seq(10.0f, 10.0f), 1),
      (2L, Seq(0.1f, 0.0f), 0), (3L, Seq(10.1f, 10.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val even = Clustering.mauveLite(df, "vec_id", "embedding",
        isP = col("label") === 1, k = 2, iters = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(even.forall { case (np, nq, js) => np == 1 && nq == 1 && js == 0 })
    // P entirely in blob A, Q entirely in blob B -> positive divergence
    val skew = Clustering.mauveLite(df, "vec_id", "embedding",
        isP = col("vec_id") % 2 === 0, k = 2, iters = 2)
      .collect().map(_.getLong(3))
    assert(skew.sum > 0, s"disjoint support must diverge, got ${skew.toSeq}")
  }

  test("embeddingIsotropy: identical vectors saturate, mirrored pair cancels") {
    // slice A: all the same vector -> mean direction holds ALL energy
    // (1e6 ppm); slice B: v and -v -> mean is zero -> 0 ppm
    val df = Seq(
      (0L, "A", Seq(3.0f, 4.0f)), (1L, "A", Seq(3.0f, 4.0f)),
      (2L, "B", Seq(3.0f, 4.0f)), (3L, "B", Seq(-3.0f, -4.0f)))
      .toDF("vec_id", "slice_in", "embedding")
    val out = Clustering.embeddingIsotropy(df, col("slice_in"), col("embedding"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out("A") == (2L, 1000000L))
    assert(out("B") == (2L, 0L))
  }

  test("dbscan: core/border/noise roles and min-id cluster labels") {
    import spark.implicits._
    // blob A (ids 1-4): unit square, every point within eps=1.5 of all
    // others -> 4 neighbors each (incl. self) = core, cluster 1.
    // id 9 at (2,1): 3 eps-neighbors (self, (1,1), (1,0)) -> border.
    // blob B (ids 5-7): only 3 mutual neighbors -> no core -> noise.
    // id 8 isolated -> noise.
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0), (4L, 1.0, 1.0),
      (5L, 10.0, 10.0), (6L, 11.0, 10.0), (7L, 10.0, 11.0),
      (8L, 5.0, 5.0), (9L, 2.0, 1.0)).toDF("id", "x", "y")
    val out = graft.ext.Clustering.dbscan(pts, "id", "x", "y",
        eps = 1.5, minPts = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    (1L to 4L).foreach(i => assert(out(i) == (("core", 1L)), s"id $i: ${out(i)}"))
    assert(out(9L) == (("border", 1L)))
    Seq(5L, 6L, 7L, 8L).foreach(i =>
      assert(out(i) == (("noise", -1L)), s"id $i: ${out(i)}"))
    // a singleton dense knot: 4 coincident points are core of their own
    // cluster even with no other core component nearby
    val knot = (Seq.tabulate(4)(i => (20L + i, 50.0, 50.0)) ++
      Seq((30L, 0.0, 0.0))).toDF("id", "x", "y")
    val k = graft.ext.Clustering.dbscan(knot, "id", "x", "y", 1.0, 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    (20L to 23L).foreach(i => assert(k(i) == (("core", 20L))))
    assert(k(30L)._1 == "noise")
  }

  test("powerIterationTwo: planted 2-spike matrix recovers both eigenpairs") {
    // C = 2·u1u1' + 1·u2u2' with u1 = (1,1,1,1)/2, u2 = (1,-1,1,-1)/2:
    // eigenvalues exactly 2 and 1; the all-ones start is EXACTLY
    // orthogonal to u2, which is why chase 2 needs the tilted init
    val s = Seq(1L, -1L, 1L, -1L)
    val cells = for { i <- 0 until 4; j <- i until 4 } yield
      (i, j, 0.5 + 0.25 * (s(i) * s(j)).toDouble)
    val corr = cells.toDF("i", "j", "corr")
    val out = graft.ext.Clustering.powerIterationTwo(corr, dims = 4,
        rounds = 8).collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // component 1: the flat eigenvector, lambda = 2 exactly
    (0L until 4L).foreach { j =>
      assert(out((1, j))._1 == 1000000L, s"v1[$j]")
      assert(out((1, j))._2 == 2000000L, s"lambda1[$j]")
    }
    // component 2: the alternating eigenvector (sign-normalized by the
    // max-abs convention), lambda = 1 within deflation quantization
    val v2 = (0L until 4L).map(j => out((2, j))._1)
    assert(v2.map(math.abs).forall(a => math.abs(a - 1000000L) <= 2L),
      v2.toString)
    assert(v2(0) == v2(2) && v2(1) == v2(3) && v2(0) == -v2(1),
      v2.toString)
    assert(math.abs(out((2, 0L))._2 - 1000000L) <= 2L)
  }
}
