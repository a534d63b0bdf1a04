package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.ops.Kriging

/** Dev diagnostic for the q77 portable-kriging fixture: dumps every
  * intermediate of the solve (empirical bins, fitted variogram, K
  * matrix, pivot order, LU factors, per-point predictions) with
  * shortest-round-trip doubles, so the oracle SQL's step-for-step
  * transliteration can be written and checked against the real path.
  * `runMain graft.tools.KrigingProbe <sfDir>` */
object KrigingProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[4]").appName("graft-krigprobe")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sensors = Tables.documents(spark, dir).filter(col("doc_id") < 3)
      .select((col("doc_id") * 3).cast("double").as("x"),
        (col("doc_id") * 4).cast("double").as("y"),
        col("n_chars").cast("double").as("v"))
    val pts = sensors.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
    println(s"pts = ${pts.toSeq}")

    val emp = Kriging.empiricalVariogram(pts, math.min(6, pts.length))
    println(s"emp = ${emp.toSeq}")
    val vario = Kriging.fitVariogram(emp, "linear")
    println(s"vario a=${vario.params(0)} b=${vario.params(1)}")

    val n = pts.length
    val k = Array.ofDim[Double](n + 1, n + 1)
    for (i <- 0 until n; j <- 0 until n)
      k(i)(j) = vario.gamma(Kriging.dist(pts(i)._1 - pts(j)._1, pts(i)._2 - pts(j)._2))
    for (i <- 0 until n) { k(i)(n) = 1.0; k(n)(i) = 1.0 }
    k(n)(n) = 0.0
    println("K pre-LU:")
    k.foreach(row => println("  " + row.mkString(", ")))
    val piv = Kriging.luFactor(k)
    println(s"piv = ${piv.toSeq}")
    println("LU:")
    k.foreach(row => println("  " + row.mkString(", ")))

    val out = Kriging.krige(sensors, "v", "linear",
      x0 = 0, y0 = 0, nx = 4, ny = 4, stepX = 2, stepY = 3)
    out.orderBy("gy", "gx").collect().foreach { r =>
      println(s"grid ${r.getDouble(0)} ${r.getDouble(1)} -> ${r.getDouble(2)} var ${r.getDouble(3)}")
    }
    spark.stop()
  }
}
