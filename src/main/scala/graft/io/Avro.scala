package graft.io

import scala.jdk.CollectionConverters._
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, SeekableFileInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.core.DataIOError

/** S2 — Avro Object Container File reader → DataFrame, built on the
  * public Apache Avro Java library (already on the Spark classpath;
  * the spark-avro connector is not) — closing the Avro leg of the
  * open_data cascade the way io.GeoTiff/io.Shapefile close the binary
  * geo legs: no extra dependency, loud boundaries.
  *
  * Supported: flat records of null/boolean/int/long/float/double/
  * string/bytes, including the [null, T] nullable-union idiom; codecs
  * null and deflate (what the Avro core library decodes). Typed
  * errors name the boundaries: nested records/arrays/maps/enums/fixed
  * (flatten upstream — the engine's table model is flat columns, the
  * same contract as the CSV/JSON legs) and non-nullable unions.
  *
  * Scale: the DRIVER reads only the file header (schema + codec); the
  * byte range is split into `defaultParallelism` spans and each TASK
  * aligns its span to the next 16-byte sync marker (`DataFileReader
  * .sync`), decoding blocks until it passes its end — the standard
  * splittable-Avro contract, so ONE large file parallelizes across
  * the cluster and a directory parallelizes across files and spans. */
object Avro extends Serializable {

  def read(spark: SparkSession, path: String): DataFrame = {
    val files = listAvroFiles(path)
    if (files.isEmpty) throw DataIOError(path, "no .avro files found")
    val schema = {
      val r = new DataFileReader(new SeekableFileInput(files.head),
        new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    }
    val sparkSchema = toSparkSchema(schema, path)
    val fieldNames = schema.getFields.asScala.map(_.name).toArray
    val splits = files.flatMap { f =>
      val len = f.length()
      val n = math.max(1, math.min(spark.sparkContext.defaultParallelism,
        (len / (4L << 20)).toInt + 1)) // ~4 MB spans, capped at cores
      val span = (len + n - 1) / n
      (0 until n).map(i =>
        (f.getAbsolutePath, i * span, math.min(len, (i + 1) * span)))
    }
    val avroJson = schema.toString // Schema is not serializable-stable
    val rows = spark.sparkContext
      .parallelize(splits, splits.length)
      .flatMap { case (file, start, end) =>
        decodeSpan(file, start, end, avroJson, fieldNames)
      }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** S6 — distributed Avro container SINK, the symmetric write leg:
    * each partition writes its own `part-NNNNN.avro` into `path`
    * (deflate codec), so the sink parallelizes exactly like the
    * built-in file writers and [[read]] reassembles the directory.
    * Flat primitive schemas only — the same contract as the reader;
    * nullable Spark fields become [null, T] unions. */
  def write(df: DataFrame, path: String, deflateLevel: Int = 6): Unit = {
    val fields = df.schema.fields
    val avroJson = sparkToAvroJson(df.schema, path)
    val dir = new java.io.File(path)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
    dir.mkdirs()
    val names = fields.map(_.name)
    val binary = fields.map(_.dataType == BinaryType)
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.get().partitionId()
        val schema = new Schema.Parser().parse(avroJson)
        val w = new org.apache.avro.file.DataFileWriter(
          new org.apache.avro.generic.GenericDatumWriter[GenericRecord](
            schema))
        w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(
          deflateLevel))
        w.create(schema, new java.io.File(f"$path/part-$pid%05d.avro"))
        try it.foreach { row =>
          val rec = new org.apache.avro.generic.GenericData.Record(schema)
          var i = 0
          while (i < names.length) {
            val v = row.get(i)
            rec.put(names(i),
              if (v == null) null
              else if (binary(i))
                java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
              else v)
            i += 1
          }
          w.append(rec); ()
        } finally w.close()
      }
    }
    // empty partitions write nothing, so an all-empty DataFrame would
    // leave a part-less directory that [[read]] rejects — the write→read
    // round trip would lose the schema. Emit one header-only container
    // from the driver so the schema survives (zero records, valid file).
    if (!dir.listFiles().exists(_.getName.endsWith(".avro"))) {
      val schema = new Schema.Parser().parse(avroJson)
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[GenericRecord](schema))
      w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(deflateLevel))
      w.create(schema, new java.io.File(s"$path/part-empty.avro"))
      w.close()
    }
  }

  private def sparkToAvroJson(schema: StructType, path: String): String = {
    def prim(dt: DataType, name: String): String = dt match {
      case BooleanType => "\"boolean\""
      case IntegerType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case other => throw DataIOError(path,
        s"field '$name': Spark type ${other.catalogString} has no flat " +
          "Avro mapping — cast or flatten before the avro sink")
    }
    val fs = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null", ${prim(f.dataType, f.name)}]"""
      else prim(f.dataType, f.name)
      s"""{"name":"${f.name}","type":$t}"""
    }.mkString(",")
    s"""{"type":"record","name":"graft","fields":[$fs]}"""
  }

  private def listAvroFiles(path: String): Seq[java.io.File] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().toSeq.filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    else Seq(f)
  }

  /** One task's span: align to the sync marker at/after `start`, then
    * decode whole blocks until past `end` (a block belongs to the span
    * containing its first byte — each block decoded exactly once). */
  private def decodeSpan(file: String, start: Long, end: Long,
      avroJson: String, fieldNames: Array[String]): Iterator[Row] = {
    val schema = new Schema.Parser().parse(avroJson)
    val reader = new DataFileReader(
      new SeekableFileInput(new java.io.File(file)),
      new GenericDatumReader[GenericRecord](schema))
    try reader.sync(start)
    catch { case e: Throwable => reader.close(); throw e }
    // LAZY iterator, not a buffered ArrayBuffer: a span is len/parallelism
    // bytes, so eager decode would hold a whole span of Rows per task —
    // exactly the memory cliff the splittable contract exists to avoid.
    // The reader closes on exhaustion AND on task completion (covers
    // abandoned iterators from limits/early task kill).
    val tc = org.apache.spark.TaskContext.get()
    if (tc == null) {
      // Driver-side caller (tests, direct reads): there is no task
      // completion hook to catch an abandoned iterator, so an
      // un-drained lazy span would leak the file handle. Eager
      // drain-and-close — driver-side spans are small by construction
      // (no executor memory cliff to avoid here).
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      try {
        while (reader.hasNext && !reader.pastSync(end)) {
          val rec = reader.next()
          buf += Row.fromSeq(fieldNames.toIndexedSeq.map(n => fromAvro(rec.get(n))))
        }
      } finally reader.close()
      return buf.iterator
    }
    tc.addTaskCompletionListener[Unit](_ =>
      try reader.close() catch { case _: Exception => () })
    new Iterator[Row] {
      private var closed = false
      def hasNext: Boolean =
        !closed && {
          val more = reader.hasNext && !reader.pastSync(end)
          if (!more) {
            closed = true
            try reader.close() catch { case _: Exception => () }
          }
          more
        }
      def next(): Row = {
        if (!hasNext) throw new NoSuchElementException("span exhausted")
        val rec = reader.next()
        Row.fromSeq(fieldNames.toIndexedSeq.map(n => fromAvro(rec.get(n))))
      }
    }
  }

  private def fromAvro(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case s: String => s
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case other => other // int/long/float/double/boolean pass through
  }

  private def toSparkSchema(schema: Schema, path: String): StructType = {
    if (schema.getType != Schema.Type.RECORD) throw DataIOError(path,
      s"top-level Avro type ${schema.getType} unsupported — need a record")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = fieldType(f.schema(), f.name, path)
      StructField(f.name, t, nullable)
    })
  }

  private def fieldType(s: Schema, name: String,
      path: String): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      if (branches.size != nonNull.size + 1 || nonNull.size != 1)
        throw DataIOError(path, s"field '$name': only [null, T] unions " +
          s"are supported, got ${s}")
      (primitive(nonNull.head, name, path), true)
    case _ => (primitive(s, name, path), false)
  }

  private def primitive(s: Schema, name: String, path: String): DataType =
    s.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT => IntegerType
      case Schema.Type.LONG => LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES => BinaryType
      case other => throw DataIOError(path,
        s"field '$name': Avro type $other unsupported — the table model " +
          "is flat columns; flatten nested structures upstream")
    }
}
