package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

/** S2 — Avro container ingest. Two evidence layers, mirroring the
  * GeoTIFF codec spec: Scala write→read round-trips through the Avro
  * JAVA library, and a fixture hand-rolled by an independent python
  * implementation of the container spec (dev/make_avro_fixture.py —
  * no avro lib, straight zigzag/deflate/sync bytes). */
class AvroSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schemaJson =
    """{"type":"record","name":"r","fields":[
      |{"name":"id","type":"long"},
      |{"name":"v","type":"double"},
      |{"name":"tag","type":"string"},
      |{"name":"opt","type":["null","long"]}]}""".stripMargin

  private def writeFixture(path: String, n: Int, codec: CodecFactory,
      blockRows: Int = 1000): Unit = {
    val schema = new Schema.Parser().parse(schemaJson)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(codec)
    // small sync interval forces multiple blocks (the split unit)
    w.setSyncInterval(blockRows)
    w.create(schema, new java.io.File(path))
    (0 until n).foreach { i =>
      val rec = new GenericData.Record(schema)
      rec.put("id", i.toLong)
      rec.put("v", ((i * 7) % 31) / 4.0)
      rec.put("tag", "t" + (i % 5))
      rec.put("opt", if (i % 4 == 0) null else java.lang.Long.valueOf(i * 3L))
      w.append(rec)
    }
    w.close()
  }

  private def checkRows(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    assert(df.count() == n.toLong)
    val rows = df.collect().map(r => r.getLong(0) ->
      (r.getDouble(1), r.getString(2), Option(r.get(3)))).toMap
    (0 until n).foreach { i =>
      val (v, tag, opt) = rows(i.toLong)
      assert(v == ((i * 7) % 31) / 4.0, s"v $i")
      assert(tag == "t" + (i % 5), s"tag $i")
      assert(opt == (if (i % 4 == 0) None else Some(i * 3L)), s"opt $i")
    }
  }

  test("S2: avro round-trips under null and deflate codecs, multi-block") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString
    for ((codec, tag) <- Seq(CodecFactory.nullCodec() -> "null",
        CodecFactory.deflateCodec(6) -> "deflate")) {
      val p = s"$dir/$tag.avro"
      writeFixture(p, 500, codec, blockRows = 512) // ~dozens of blocks
      val df = graft.io.Avro.read(spark, p)
      assert(df.schema.fields.map(f => (f.name, f.nullable)).toSeq ==
        Seq(("id", false), ("v", false), ("tag", false), ("opt", true)))
      checkRows(df, 500)
      // the openData cascade routes .avro to the native reader
      checkRows(graft.io.Sources.openData(spark, p), 500)
    }
  }

  test("S2: a directory of avro files unions across files and spans") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avrodir")
    writeFixture(s"$dir/a.avro", 40, CodecFactory.deflateCodec(3))
    writeFixture(s"$dir/b.avro", 40, CodecFactory.nullCodec())
    val df = graft.io.Avro.read(spark, dir.toString)
    assert(df.count() == 80)
    assert(df.groupBy(col("id")).count().filter(col("count") =!= 2)
      .count() == 0) // every id appears once per file
  }

  test("S2: independent python fixture (hand-rolled container) decodes exactly") {
    val url = getClass.getResource("/avro/py_deflate_3blocks.avro")
    assert(url != null, "missing avro fixture")
    checkRows(graft.io.Avro.read(spark, url.getPath), 120)
  }

  test("S6: avro sink round-trips a mixed frame through the reader") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avrosink")
      .toString + "/out"
    val df = spark.createDataFrame(
      (0 until 120).map { i =>
        (i.toLong, ((i * 7) % 31) / 4.0, "t" + (i % 5),
          if (i % 4 == 0) null else java.lang.Long.valueOf(i * 3L))
      }).toDF("id", "v", "tag", "opt").repartition(5)
    graft.io.Sinks.write(df, dir, format = "avro")
    // several partitions → several part files, reassembled by the reader
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".avro")) > 1)
    checkRows(graft.io.Avro.read(spark, dir)
      .select(col("id"), col("v"), col("tag"), col("opt")), 120)
    // unsupported column types fail typed, not silently
    val bad = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    val e = intercept[graft.core.DataIOError] {
      graft.io.Avro.write(bad, dir + "2") }
    assert(e.getMessage.contains("no flat Avro mapping"))
  }

  test("S2: nested and non-nullable-union schemas fail typed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avrobad").toString
    val nested = new Schema.Parser().parse(
      """{"type":"record","name":"o","fields":[
        |{"name":"inner","type":{"type":"record","name":"i","fields":[
        |{"name":"x","type":"long"}]}}]}""".stripMargin)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](nested))
    w.create(nested, new java.io.File(s"$dir/nested.avro"))
    val inner = new GenericData.Record(nested.getField("inner").schema())
    inner.put("x", 1L)
    val rec = new GenericData.Record(nested)
    rec.put("inner", inner)
    w.append(rec); w.close()
    val e = intercept[graft.core.DataIOError] {
      graft.io.Avro.read(spark, s"$dir/nested.avro") }
    assert(e.getMessage.contains("flatten nested structures"))

    val union = new Schema.Parser().parse(
      """{"type":"record","name":"u","fields":[
        |{"name":"either","type":["long","string"]}]}""".stripMargin)
    val w2 = new DataFileWriter(new GenericDatumWriter[GenericRecord](union))
    w2.create(union, new java.io.File(s"$dir/union.avro"))
    val rec2 = new GenericData.Record(union)
    rec2.put("either", 5L)
    w2.append(rec2); w2.close()
    val e2 = intercept[graft.core.DataIOError] {
      graft.io.Avro.read(spark, s"$dir/union.avro") }
    assert(e2.getMessage.contains("unions"))
  }
}
