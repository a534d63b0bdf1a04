package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.io.ArrowIpc

/** S2 — Arrow IPC (Feather v2) source/sink: typed round trips, nulls,
  * footer-indexed multi-batch splits, and the typed scope errors. */
class ArrowIpcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("k", IntegerType, nullable = false),
    StructField("v", DoubleType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("b", BooleanType, nullable = false)))

  private def mkRows(n: Int): Seq[Row] = (0 until n).map { i =>
    Row(i.toLong, i * 2, i / 4.0,
      if (i % 7 == 0) null else s"s$i", i % 2 == 0)
  }

  test("round trip: all five types + nulls, single batch") {
    val p = java.nio.file.Files.createTempDirectory("arrow1").toString + "/a.arrow"
    ArrowIpc.write(p, schema, mkRows(50))
    val back = ArrowIpc.read(spark, p)
    assert(back.schema == schema.copy(fields = schema.fields.map(f =>
      f.copy(nullable = f.nullable))))
    val got = back.collect().sortBy(_.getLong(0))
    assert(got.length == 50)
    assert(got.toSeq == mkRows(50))
  }

  test("multi-batch file: one task per footer block, same rows back") {
    val p = java.nio.file.Files.createTempDirectory("arrow2").toString + "/m.feather"
    ArrowIpc.write(p, schema, mkRows(100), batchRows = 17) // 6 batches
    val df = graft.io.Sources.openData(spark, p) // .feather routes here too
    assert(df.rdd.getNumPartitions == 6)
    assert(df.collect().sortBy(_.getLong(0)).toSeq == mkRows(100))
  }

  test("empty file (zero batches) reads as an empty frame with schema") {
    val p = java.nio.file.Files.createTempDirectory("arrow3").toString + "/e.arrow"
    ArrowIpc.write(p, schema, Seq.empty)
    val df = ArrowIpc.read(spark, p)
    assert(df.count() == 0 && df.columns.toSeq ==
      Seq("id", "k", "v", "s", "b"))
  }

  test("typed errors: unsupported sink type, non-arrow file") {
    val bad = StructType(Seq(StructField("a", ArrayType(LongType))))
    val p = java.nio.file.Files.createTempDirectory("arrow4").toString
    val e = intercept[graft.core.DataIOError] {
      ArrowIpc.write(s"$p/bad.arrow", bad, Seq.empty)
    }
    assert(e.getMessage.contains("no") && e.getMessage.contains("Arrow"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$p/junk.arrow"),
      Array.fill[Byte](64)(3))
    val e2 = intercept[graft.core.DataIOError] {
      ArrowIpc.read(spark, s"$p/junk.arrow")
    }
    assert(e2.getMessage.contains("Arrow IPC open failed"))
  }
}
