package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.GraftSession

/** Dev tool: reproduce graft.Bench's exact per-query scheme for ONE
  * query — warm-up run, clearCache, timed run — so a bench outlier can
  * be isolated without the full suite.
  *
  * Every invocation ALSO runs graft.Bench's 5 pinned control queries
  * (warm-up + min-of-2, the suite scheme) and prints one
  * `[benchone-controls]` JSON line with each control's seconds, its
  * ratio to the committed ledger minimum, and the median ratio
  * (box_factor) — so a single-query floor re-record carries its own
  * calibration block instead of an ad-hoc prose control median
  * (VERDICT r10 item 6). Skip with SPARK_GRAFT_NO_CONTROLS=1.
  *
  * `runMain graft.tools.BenchOne <sfDir> <name> [n]` */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-benchone")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(qn: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(qn)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.OperatorCaches.releaseAll(spark); spark.catalog.clearCache()
      dt
    }
    for (i <- 0 until n)
      println(f"[benchone] $name run$i: ${timed(name)}%.3f s")

    if (!sys.env.get("SPARK_GRAFT_NO_CONTROLS").contains("1")) {
      val controls = Seq("q01_agg_multi", "q03_join_agg", "q100_pagerank",
        "q119_corpus_e2e", "q23_dedup_first")
      val baselinePath = java.nio.file.Paths.get("dev/bench_baseline.json")
      val baseline: Map[String, Double] =
        if (java.nio.file.Files.exists(baselinePath)) {
          val txt = java.nio.file.Files.readString(baselinePath)
          "\"(q[^\"]+)\"\\s*:\\s*([0-9.]+)".r.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        } else Map.empty
      def fmt(v: Double): String =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val runs = controls.map { c =>
        timed(c) // warm-up (suite scheme: absorbs codegen for this plan)
        c -> math.min(timed(c), timed(c))
      }
      val ratios = runs.flatMap { case (c, v) =>
        baseline.get(c).filter(_ > 0).map(v / _) }.sorted
      val boxFactor =
        if (ratios.isEmpty) 1.0
        else if (ratios.size % 2 == 1) ratios(ratios.size / 2)
        else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2
      val body = runs.map { case (c, v) =>
        val r = baseline.get(c).filter(_ > 0).map(b => fmt(v / b)).getOrElse("null")
        s""""$c":{"sec":${fmt(v)},"ratio":$r}"""
      }.mkString(",")
      println(s"""[benchone-controls] {"box_factor":${fmt(boxFactor)},"controls":{$body}}""")
    }
    spark.stop()
  }
}
