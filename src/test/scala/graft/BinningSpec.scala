package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Binning

/** A9 — pandas-cut label/color/styling parity (expected strings
  * generated with pandas 'str(iv).replace("(", "[")' on the same data). */
class BinningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("A9: cut matches pandas bucket assignment and labels") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 10.0).toDF("v")
    val out = Binning.cut(df, "v", 3).orderBy("v")
      .select("v", "bucket", "intervals_v").collect()
    val got = out.map(r => (r.getDouble(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1.0, 0, "[0.991, 4.0]"),
      (2.0, 0, "[0.991, 4.0]"),
      (3.0, 0, "[0.991, 4.0]"),
      (4.0, 0, "[0.991, 4.0]"),
      (10.0, 2, "[7.0, 10.0]")))
  }

  test("A9: fraction-only edges use 3 significant fraction digits (pandas _round_frac)") {
    val df = Seq(0.1, 0.2, 0.35).toDF("v")
    val got = Binning.cut(df, "v", 2).orderBy("v")
      .select("intervals_v").as[String].collect()
    assert(got.toSeq == Seq("[0.0998, 0.225]", "[0.0998, 0.225]", "[0.225, 0.35]"))
  }

  test("A9: legend is ordered distinct labels") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 10.0).toDF("v")
    val legend = Binning.legend(Binning.cut(df, "v", 3), "v").collect()
    assert(legend.map(_.getInt(0)).toSeq == Seq(0, 2)) // bin 1 is empty
  }

  test("A9: color map endpoints and size; styling pairs labels with colors") {
    val cm = Binning.colorMap(3, (0, 0, 0), (255, 255, 255))
    assert(cm == Seq("#000000", "#7f7f7f", "#ffffff") ||
      cm == Seq("#000000", "#808080", "#ffffff")) // rounding midpoint
    val df = Seq(1.0, 10.0).toDF("v")
    val st = Binning.styling(Binning.cut(df, "v", 2), "v")
    assert(st.length == 2 && st.forall(_._2.matches("#[0-9a-f]{6}")))
  }

  test("A9: jenksBreaks — well-separated clusters split exactly") {
    import org.apache.spark.sql.functions._
    val df = Seq(1L, 2L, 3L, 100L, 101L, 102L).toDF("v")
    val out = graft.ops.Binning.jenksBreaks(df, col("v"), nBins = 10, k = 2)
      .orderBy(col("class_id"))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    // optimal 2-class split separates the two tight clusters; within-
    // class SSE is ~2 cents^2 scale -> 0 in micro-units
    assert(out.map(_._2).toSeq == Seq(3L, 3L), s"got ${out.toSeq}")
    assert(out.forall(_._3 == 0L))
  }
}
