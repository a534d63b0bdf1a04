package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraftSession

/** Dev tool (opt round 12, VERDICT r11 items 3 and 9): measure the
  * above-gate regime on a synthetic graph BIG enough that the node/pair
  * frames exceed both the 2M-row gate and AQE's 10 MB auto-broadcast
  * threshold — the regime sf0.1 cannot reach (its node frames are ~21k
  * rows, so AQE broadcast-converts every join regardless of the pin).
  *
  * For each operator, times the two ADAPTIVE strategies on the same
  * input and checks their results agree (count + value checksum):
  *   - pin     = the above-gate default (node count > gate → pinByKey
  *               layout, per-round sort-merge joins, edge side
  *               exchange-free);
  *   - bcast   = the below-gate shape FORCED above the gate
  *               (bcastNodeMax = Long.MaxValue → every round broadcasts
  *               the multi-million-row node frame).
  *
  * `runMain graft.tools.ScalePins [nNodes=3000000] [ops=pagerank,hits,als]` */
object ScalePins {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(3000000L)
    val ops = if (args.length > 1) args(1).split(",").toSet
      else Set("pagerank", "hits", "als")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-scalepins"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic: a path graph (diameter n) + skip links —
    // n nodes, ~1.33n edges, no RNG
    val edges = spark.range(n - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
      .unionByName(spark.range(n / 3)
        .select((col("id") * 3).as("src"),
          pmod(col("id") * 7 + 11, lit(n)).as("dst")))
      .filter(col("src") =!= col("dst"))
    // rank-1 ALS ratings: ~n distinct (u, i) pairs over n/2 users and
    // n/2 items — pair count above the gate, factor frames ~n/2 rows
    val ratings = spark.range(n)
      .select(pmod(col("id"), lit(n / 2)).as("u"),
        pmod(col("id") * 7 + 3, lit(n / 2)).as("i"),
        (pmod(col("id"), lit(5)) + 1).as("r"))

    def sig(df: DataFrame): (Long, String) = {
      val cols = df.columns.map(col)
      // decimal(38,0) sum: a long sum of 3M xxhash64 values overflows ANSI
      val r = df.agg(count(lit(1)).as("n"),
        sum(xxhash64(cols: _*).cast("decimal(38,0)")).as("h")).collect()(0)
      (r.getLong(0), String.valueOf(r.get(1)))
    }
    def timed(label: String)(f: => DataFrame): (Double, (Long, String)) = {
      spark.sparkContext.setJobDescription(s"scalepins: $label")
      def once(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up (suite scheme)
      val t = math.min(once(), once())
      val s = sig(f)
      graft.core.OperatorCaches.releaseAll(spark); spark.catalog.clearCache()
      spark.sparkContext.setJobDescription(null)
      println(f"[scalepins] $label: $t%.3f s  (rows=${s._1}, checksum=${s._2})")
      (t, s)
    }

    val big = Long.MaxValue
    if (ops("pagerank")) {
    val prPin = timed("pagerank above-gate PIN (default)")(
      graft.ext.Graph.pageRank(edges, "src", "dst", iters = 3))
    val prB = timed("pagerank above-gate BROADCAST-forced")(
      graft.ext.Graph.pageRank(edges, "src", "dst", iters = 3,
        bcastNodeMax = big))
    require(prPin._2 == prB._2, "pageRank variants diverge")
    }
    if (ops("hits")) {
    val hPin = timed("hits above-gate PIN (default)")(
      graft.ext.Graph.hits(edges, "src", "dst", iters = 2))
    val hB = timed("hits above-gate BROADCAST-forced")(
      graft.ext.Graph.hits(edges, "src", "dst", iters = 2,
        bcastNodeMax = big))
    require(hPin._2 == hB._2, "hits variants diverge")
    }
    if (ops("als")) {
    val aPin = timed("als_rank1 above-gate PIN (default)")(
      graft.ext.Similarity.als1Factor(ratings, col("u"), col("i"), col("r"),
        iters = 3))
    val aB = timed("als_rank1 above-gate BROADCAST-forced")(
      graft.ext.Similarity.als1Factor(ratings, col("u"), col("i"), col("r"),
        iters = 3, bcastPairMax = big))
    require(aPin._2 == aB._2, "als variants diverge")
    }
    println("[scalepins] all variant pairs agree (count + checksum)")
    spark.stop()
  }
}
