package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Dev tool — SCALE_SPOT row for q467's REAL scale axes (VERDICT r8
  * item 8): the sf0.1 fixture's supplier—part edge set saturates under
  * fact replication, so the ×10 table row is flat by construction.
  * The axes that actually grow the Brandes work are (a) PIVOT count
  * (state and every per-round frame scale ∝ pivots) and (b) EDGE count
  * at fixed pivots (DAG pairs scale ∝ edges within the reached hops).
  * This probe times `Graph.betweennessPivots` on:
  *   - the base sf0.1 supplier—part graph at 3 and 6 pivots,
  *   - a ×10-edge synthetic (same suppliers, 10 part-id-offset copies
  *     of the edge set → 10× degree, 10× DAG pairs) at 3 pivots.
  * `runMain graft.tools.ScaleBetweenness [sfDir] [reps=2]` */
object ScaleBetweenness {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-scale-bc"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val PartOffset = 1099511627776L

    def baseEdges = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("src"),
        (col("l_partkey") + PartOffset).as("dst"))
    // ×10 edges: same supplier set, ten part-id-offset copies — degree
    // (and therefore layer fan-out and DAG pair count) grows 10×
    def wideEdges = (0 until 10).map { i =>
      baseEdges.withColumn("dst", col("dst") + lit(i * 10000000L))
    }.reduce(_ unionByName _)

    def time(label: String, pivots: Int,
        edges: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        graft.ext.Graph.betweennessPivots(edges, "src", "dst",
            numPivots = pivots, maxHops = 3)
          .write.format("noop").mode("overwrite").save()
        graft.core.OperatorCaches.releaseAll(spark); spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scale-bc] $label: min ${times.min}%.3f s " +
        s"(runs ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    time("base edges, 3 pivots", 3, baseEdges)
    time("base edges, 6 pivots", 6, baseEdges)
    time("x10 edges, 3 pivots", 3, wideEdges)
    spark.stop()
  }
}
