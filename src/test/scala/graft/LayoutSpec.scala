package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("E6: Morton key interleaves quantized bits (known values, clamping)") {
    val df = Seq(
      (1.0, 2.0),   // qx=1 (01), qy=2 (10) -> z = 1 + (1<<3) = 9
      (0.0, 0.0),   // z = 0
      (3.9, 3.9),   // qx=qy=3 -> z = 0b1111 = 15
      (-5.0, 99.0)  // clamps to (0, 3) -> y bits only: (1<<1)+(1<<3) = 10
    ).toDF("x", "y")
    val z = df.select(Layout.zorderKey(col("x"), col("y"), 0.0, 4.0, 0.0, 4.0, bits = 2))
      .as[Long].collect().toSeq
    assert(z == Seq(9L, 0L, 15L, 10L))
  }

  test("E6: zoneMapAudit — clustered layout prunes, scrambled layout cannot") {
    // 100 rows, value = id; predicate [0, 9] selects 10 rows either way
    val df = spark.range(100).toDF("id")
    val sorted = Layout.zoneMapAudit(df, "sorted",
      expr("id div 10"), col("id"), 0L, 9L).collect().head
    // chunks 0..9; only chunk 0 overlaps [0,9] → 9 pruned, 90 skipped
    assert((sorted.getString(0), sorted.getLong(1), sorted.getLong(2),
      sorted.getLong(3), sorted.getLong(4), sorted.getLong(5),
      sorted.getLong(6)) ==
      (("sorted", 10L, 9L, 100L, 90L, 10L, 900000L)))
    // round-robin chunking: every chunk spans [chunk, 90+chunk] → its
    // zone overlaps the predicate and NOTHING prunes
    val scrambled = Layout.zoneMapAudit(df, "scrambled",
      expr("id % 10"), col("id"), 0L, 9L).collect().head
    assert((scrambled.getLong(2), scrambled.getLong(4), scrambled.getLong(5)) ==
      ((0L, 0L, 10L)))
  }

  test("E6: Z-ordered write shrinks per-file bboxes vs an unsorted write") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val pts = (0 until 1024).map(i => (i.toLong, (i % 32).toDouble, (i / 32).toDouble))
      .toDF("id", "x", "y")
    Layout.writeZordered(pts, s"$dir/z", "x", "y", 0.0, 32.0, 0.0, 32.0,
      bits = 5, numFiles = 4)
    pts.repartition(4).write.parquet(s"$dir/flat") // hash layout baseline

    def meanBboxArea(path: String): Double = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(files.length == 4)
      val areas = files.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("x"), max("x"), min("y"), max("y")).head
        (r.getDouble(1) - r.getDouble(0)) * (r.getDouble(3) - r.getDouble(2))
      }
      areas.sum / areas.length
    }
    val global = 31.0 * 31.0
    val zArea = meanBboxArea(s"$dir/z")
    val flatArea = meanBboxArea(s"$dir/flat")
    // each Z file owns a compact region (~a quadrant); hash files span everything
    assert(zArea < 0.45 * global, s"z-ordered mean bbox $zArea vs global $global")
    assert(zArea < flatArea / 2,
      s"z-ordered ($zArea) must beat the hash layout ($flatArea) by 2x+")
  }

  test("E6: compactionPlan packs the listing greedily and conserves bytes") {
    import spark.implicits._
    import graft.ops.Layout
    val files = Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 5L)).toDF("fid", "b")
    val out = Layout.compactionPlan(files, col("fid"), col("b"), 4L)
      .orderBy("grp").collect()
    // prefix sums 0,3,6,9 -> groups 0,0,1,2
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("bytes")).sum == 14L)
    assert(out(0).getAs[Long]("n_files") == 2L &&
      out(0).getAs[Long]("file_lo") == 1L && out(0).getAs[Long]("file_hi") == 2L)
  }

  test("hilbertKey: the order-3 curve is bijective and every key step " +
      "moves exactly one cell") {
    // feed the raw 8×8 integer lattice through identity bounds
    val cells = for { x <- 0 until 8; y <- 0 until 8 }
      yield (x.toLong, x.toDouble, y.toDouble)
    val out = cells.toDF("id", "x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertKey(col("x"), col("y"), 0.0, 8.0, 0.0, 8.0,
          bits = 3).as("d"))
      .collect().map(r => r.getAs[Long]("d") ->
        (r.getAs[Double]("x").toInt, r.getAs[Double]("y").toInt))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 64L)) // bijective onto 0..63
    val walk = out.map(_._2)
    assert(walk.zip(walk.tail).forall { case ((ax, ay), (bx, by)) =>
      math.abs(ax - bx) + math.abs(ay - by) == 1 }) // unit-step adjacency
  }

  test("hilbertKey: walk locality strictly beats the Morton key") {
    // Manhattan distance between the cells of CONSECUTIVE keys:
    // Hilbert is 1 everywhere; Morton jumps across quadrant seams
    val cells = for { x <- 0 until 8; y <- 0 until 8 }
      yield (x.toDouble, y.toDouble)
    val rows = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertKey(col("x"), col("y"), 0.0, 8.0, 0.0, 8.0, 3)
          .as("h"),
        Layout.zorderKey(col("x"), col("y"), 0.0, 8.0, 0.0, 8.0, 3).as("z"))
      .collect()
    def walkCost(key: String): Int = {
      val walk = rows.sortBy(_.getAs[Long](key))
        .map(r => (r.getAs[Double]("x").toInt, r.getAs[Double]("y").toInt))
      walk.zip(walk.tail)
        .map { case ((ax, ay), (bx, by)) =>
          math.abs(ax - bx) + math.abs(ay - by) }.sum
    }
    assert(walkCost("h") == 63)       // 63 unit steps, the optimum
    assert(walkCost("z") > walkCost("h")) // Morton pays seam jumps
  }

  test("E6: rendezvousShards — full coverage, single-node identity, bounded movement") {
    import org.apache.spark.sql.functions._
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val ids = (1L to 500L).toDF("id")
    // n -> n: nothing can move
    val same = graft.ops.Layout.rendezvousShards(ids, col("id"), 4, 4)
      .collect()
    assert(same.map(_.getAs[Long]("n")).sum == 500L)
    assert(same.forall(_.getAs[Long]("n_moved") == 0L))
    // 4 -> 5: HRW moves ~1/5 of keys; assert well under a mod-hash reshuffle
    val grow = graft.ops.Layout.rendezvousShards(ids, col("id"), 4, 5)
      .collect()
    val total = grow.map(_.getAs[Long]("n")).sum
    val moved = grow.map(_.getAs[Long]("n_moved")).sum
    assert(total == 500L)
    assert(moved > 0 && moved < 200L, s"moved $moved of $total — HRW should move ~100")
    assert(grow.map(_.getAs[Long]("shard")).toSet.subsetOf((0L until 4L).toSet))
  }
}
