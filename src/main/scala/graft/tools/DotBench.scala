package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.GraftSession

/** Dev micro-bench: native ArrayDotProduct vs the interpreted HOF fold. */
object DotBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-dotbench")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    val df = spark.range(2L * 1000 * 1000)
      .withColumn("v", transform(sequence(lit(1), lit(dim)),
        i => (col("id") % 97 + i).cast("double") / 97.0))
      .withColumn("w", transform(sequence(lit(1), lit(dim)),
        i => (col("id") % 89 + i * 2).cast("double") / 89.0))
      .cache()
    df.count()
    def t(label: String)(c: org.apache.spark.sql.Column): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.select(sum(c)).head()
        println(f"[dotbench] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    t("hof fold")(aggregate(zip_with(col("v"), col("w"),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
    t("native array_dot")(graft.ext.VectorExpressions.arrayDot(col("v"), col("w")))
    spark.stop()
  }
}
