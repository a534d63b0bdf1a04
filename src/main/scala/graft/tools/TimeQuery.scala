package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.GraftSession

/** Dev tool: time one declared query N times back-to-back (first run
  * warm-up) — isolates a single query's steady-state cost from the
  * whole-suite bench. `runMain graft.tools.TimeQuery <sfDir> <name> [n]`. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 4
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-timeq")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)
    for (i <- 0 until n) {
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[timeq] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
