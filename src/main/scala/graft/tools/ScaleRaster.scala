package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.GraftSession

/** Dev tool — SCALE_SPOT rows for the raster iteratives' REAL axes
  * (VERDICT r9 item 8): q486/q489's fixtures cap the lattice at
  * p_partkey < 1200, so ×10 fact replication is flat by construction.
  * The axes that actually grow the work are CELLS (lattice size — the
  * partitionable axis) and ROUNDS (the path horizon — the fixed-cost
  * axis, like q384's BFS floor). This probe times the two heaviest
  * raster iteratives on synthetic lattices at 1× (1200 cells = the
  * fixture), ×4 (4800) and ×16 (19200) with fixture rounds, plus a
  * rounds×2 row at the fixture lattice.
  * `runMain graft.tools.ScaleRaster [reps=2]` */
object ScaleRaster {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-scale-raster"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the q486/q489 lattice generalized: width w, n cells; egg-carton
    // DEM for flow, the 1..5 modular cost + scattered sources for
    // cost-distance — identical formulas to the fixtures
    def lattice(n: Long, w: Long) = spark.range(n)
      .select((col("id") % w).as("x"), expr(s"id div ${w}L").as("y"))

    def flowCells(n: Long, w: Long) = lattice(n, w).withColumn("z",
      (col("x") % 6 - 3) * (col("x") % 6 - 3) +
        (col("y") % 6 - 3) * (col("y") % 6 - 3))

    def costCells(n: Long, w: Long) = lattice(n, w)
      .withColumn("cost", lit(1L) + (col("x") * 3 + col("y") * 7) % 5)
      .withColumn("src", (col("x") * 31 + col("y") * 17) % 211 === 0)

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        graft.core.OperatorCaches.releaseAll(spark); spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scale-raster] $label: min ${times.min}%.3f s " +
        s"(runs ${times.map(t => f"$t%.2f").mkString(", ")})")
    }

    // warm-up absorbs codegen/session costs
    graft.ops.SpatialOps.d8FlowAccumulation(flowCells(1200, 40),
      col("x"), col("y"), col("z"), rounds = 8)
      .write.format("noop").mode("overwrite").save()

    time("d8flow cells=1200 rounds=8 (fixture)")(
      graft.ops.SpatialOps.d8FlowAccumulation(flowCells(1200, 40),
        col("x"), col("y"), col("z"), rounds = 8))
    time("d8flow cells=4800 (x4) rounds=8")(
      graft.ops.SpatialOps.d8FlowAccumulation(flowCells(4800, 80),
        col("x"), col("y"), col("z"), rounds = 8))
    time("d8flow cells=19200 (x16) rounds=8")(
      graft.ops.SpatialOps.d8FlowAccumulation(flowCells(19200, 160),
        col("x"), col("y"), col("z"), rounds = 8))
    time("d8flow cells=1200 rounds=16 (x2 rounds)")(
      graft.ops.SpatialOps.d8FlowAccumulation(flowCells(1200, 40),
        col("x"), col("y"), col("z"), rounds = 16))

    time("costdist cells=1200 rounds=24 (fixture)")(
      graft.ops.SpatialOps.costDistance(costCells(1200, 40),
        col("x"), col("y"), col("cost"), col("src"), rounds = 24))
    time("costdist cells=4800 (x4) rounds=24")(
      graft.ops.SpatialOps.costDistance(costCells(4800, 80),
        col("x"), col("y"), col("cost"), col("src"), rounds = 24))
    time("costdist cells=19200 (x16) rounds=24")(
      graft.ops.SpatialOps.costDistance(costCells(19200, 160),
        col("x"), col("y"), col("cost"), col("src"), rounds = 24))
    time("costdist cells=1200 rounds=48 (x2 rounds)")(
      graft.ops.SpatialOps.costDistance(costCells(1200, 40),
        col("x"), col("y"), col("cost"), col("src"), rounds = 48))

    spark.stop()
  }
}
