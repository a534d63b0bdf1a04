package graft

import org.apache.spark.sql.SparkSession
import graft.core.GraftSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is forced through the `noop` sink — a plain count() would
  * let Catalyst prune away most of the computed columns and understate
  * the work. One warm-up query (q01) absorbs first-job session costs
  * (codegen compilation, shuffle service spin-up) so per-query numbers
  * measure the plan, not JVM warmup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
      } finally {
        // scope operator-cached intermediates (e.g. kNN candidates) to
        // the run that created them — even a FAILED run may have
        // registered caches; ~200 executions must not accumulate blocks.
        // Guarded: if the failure killed the session, cleanup throwing
        // here would supersede the -1.0 and abort the whole suite.
        try { graft.core.OperatorCaches.releaseAll(spark); spark.catalog.clearCache() }
        catch { case _: Exception => () }
      }
    }

    val names = queries.Declared.all.map(_.name)
    // Per-query warm-up, BACK-TO-BACK with the timed runs: the untimed
    // execution absorbs JIT + codegen compilation + shuffle spin-up for
    // exactly this plan, and the timed runs follow immediately while
    // its code and file caches are hot. (A separate whole-suite warm-up
    // pass — the round-1 scheme — lets the other queries evict those
    // caches before the timed run; per-query numbers varied 2-4x run to
    // run.) The reported number is the MIN of two timed runs: the
    // plan's cost is the quantity bounded from below — a transient
    // co-tenant burst can only inflate a sample, never deflate it, so
    // min-of-2 measures the plan rather than the box (the round-2
    // driver run showed isolated 4-9x spikes on a loaded host that no
    // local rerun could reproduce). A failed run reports -1 and keeps
    // its failure signal through the min.
    exec(names.head) // session-level first-job costs land here

    val results = names.map { n => exec(n); n -> math.min(exec(n), exec(n)) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
