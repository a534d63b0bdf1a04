package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Dev tool (opt round 12, VERDICT r11 item 3): exercise the ABOVE-GATE
  * `pinByKey` fallbacks of the adaptive iterative loops at sf-bench
  * scale by forcing the broadcast gate to 0 through the operators'
  * bcastNodeMax test hook, then
  *
  *   1. assert the above-gate result is IDENTICAL to the default
  *      (broadcast, oracle-green) path on the same input, and
  *   2. dump the AQE-final physical plan after execution, so the
  *      committed plans show whether each round's sort-merge join is
  *      exchange-free on the pinned edge side.
  *
  * `runMain graft.tools.PinPlans [sfDir]` — output is committed to
  * plans/r12/abovegate_*.txt.
  */
object PinPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-pinplans"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // q100/q155-shaped supplier-part purchase graph and the q406 ratings
    val edges = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey").as("src"),
        (col("l_partkey") + lit(1099511627776L)).as("dst"))
    val ratings = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("i"),
        col("l_quantity").cast("long").as("r"))

    def check(name: String, above: DataFrame, default: DataFrame): Unit = {
      spark.sparkContext.setJobDescription(s"pinplans: $name")
      val a = above.collect().map(_.toString).sorted
      val d = default.collect().map(_.toString).sorted
      val eq = a.toSeq == d.toSeq
      println(s"========== $name ==========")
      println(s"[pinplans] $name rows=${a.length} above-gate == default: $eq")
      require(eq, s"$name: above-gate result diverges from default path")
      // AQE-final plan (the collect above executed the above-gate DF)
      above.explain("formatted")
      graft.core.OperatorCaches.releaseAll(spark); spark.catalog.clearCache()
      spark.sparkContext.setJobDescription(null)
    }

    check("pagerank_abovegate",
      graft.ext.Graph.pageRank(edges, "src", "dst", iters = 3, bcastNodeMax = 0),
      graft.ext.Graph.pageRank(edges, "src", "dst", iters = 3))
    check("hits_abovegate",
      graft.ext.Graph.hits(edges, "src", "dst", iters = 2, bcastNodeMax = 0),
      graft.ext.Graph.hits(edges, "src", "dst", iters = 2))
    check("kcore_abovegate",
      graft.ext.Graph.kCore(edges, "src", "dst", k = 2, rounds = 3,
        bcastNodeMax = 0),
      graft.ext.Graph.kCore(edges, "src", "dst", k = 2, rounds = 3))
    check("labelprop_abovegate",
      graft.ext.Graph.labelPropagation(edges, "src", "dst", iters = 3,
        bcastNodeMax = 0),
      graft.ext.Graph.labelPropagation(edges, "src", "dst", iters = 3))
    check("als_rank1_abovegate",
      graft.ext.Similarity.als1Factor(ratings, col("u"), col("i"), col("r"),
        iters = 3, bcastPairMax = 0),
      graft.ext.Similarity.als1Factor(ratings, col("u"), col("i"), col("r"),
        iters = 3))
    println("[pinplans] ALL ABOVE-GATE PATHS MATCH THE DEFAULT RESULTS")
    spark.stop()
  }
}
