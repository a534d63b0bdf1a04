package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.GraftSession

/** Dev tool: reproduce graft.Bench's exact per-query scheme for ONE
  * query — warm-up run, clearCache, timed run — so a bench outlier can
  * be isolated without the full suite.
  * `runMain graft.tools.BenchOne <sfDir> <name> [n]` */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-benchone")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)
    for (i <- 0 until n) {
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.OperatorCaches.releaseAll(spark); spark.catalog.clearCache()
      println(f"[benchone] $name run$i: $dt%.3f s")
    }
    spark.stop()
  }
}
