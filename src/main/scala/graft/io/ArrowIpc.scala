package graft.io

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.ipc.message.ArrowBlock
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.DataIOError

/** S2 — Arrow IPC FILE format (Feather v2) source/sink, built on the
  * arrow-vector classes Spark already ships (no new dependency — the
  * same bundled-library rule as the ImageIO codecs).
  *
  * Split model (the Avro `io/Avro.scala` design transplanted): the
  * FILE FOOTER indexes every record batch (offset + length), so the
  * driver reads only schema + block list, and each task seeks to its
  * assigned batches and decodes whole batches — embarrassingly
  * parallel across batches AND files, no byte-range guessing needed
  * because the footer is the split index. A single-batch file degrades
  * to one task, which is what the format's writer granularity implies.
  *
  * Type surface (the flat-analytics contract the other binary sources
  * share): Int(64/32, signed) → long/int, FloatingPoint(DOUBLE) →
  * double, Utf8 → string, Bool → boolean. Anything else raises a typed
  * [[DataIOError]] naming the field — nested/dictionary columns are
  * out of scope the way multi-part polylines are for the shapefile. */
object ArrowIpc {

  private def toSparkType(f: Field, path: String): DataType =
    f.getType match {
      case i: ArrowType.Int if i.getBitWidth == 64 && i.getIsSigned => LongType
      case i: ArrowType.Int if i.getBitWidth == 32 && i.getIsSigned => IntegerType
      case fp: ArrowType.FloatingPoint
          if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Bool => BooleanType
      case other => throw DataIOError(path,
        s"Arrow field '${f.getName}' has type $other — flat " +
          "long/int/double/string/boolean columns only (nested and " +
          "dictionary columns are out of scope)")
    }

  /** Read one Arrow IPC file into a DataFrame, one task per record
    * batch (footer-indexed). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val (schema, nBlocks) = {
      val alloc = new RootAllocator()
      try {
        val ch = java.nio.channels.FileChannel.open(
          java.nio.file.Paths.get(path))
        val reader = new ArrowFileReader(ch, alloc)
        try {
          val aschema = reader.getVectorSchemaRoot.getSchema
          val fields = aschema.getFields.asScala.toSeq
          (StructType(fields.map(f =>
            StructField(f.getName, toSparkType(f, path), f.isNullable))),
            reader.getRecordBlocks.size())
        } finally { reader.close(); ch.close() }
      } catch {
        case e: DataIOError => throw e
        case e: Exception => throw DataIOError(path,
          s"Arrow IPC open failed: ${e.getMessage}")
      } finally alloc.close()
    }
    val fieldTypes = schema.fields.map(_.dataType)
    val n = schema.fields.length
    val rdd = spark.sparkContext
      .parallelize(0 until math.max(nBlocks, 1), math.max(nBlocks, 1))
      .flatMap { blockIdx =>
        if (nBlocks == 0) Iterator.empty
        else {
          val alloc = new RootAllocator()
          val ch = java.nio.channels.FileChannel.open(
            java.nio.file.Paths.get(path))
          val reader = new ArrowFileReader(ch, alloc)
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          try {
            val block: ArrowBlock = reader.getRecordBlocks.get(blockIdx)
            if (!reader.loadRecordBatch(block))
              throw DataIOError(path, s"record batch $blockIdx failed to load")
            val root = reader.getVectorSchemaRoot
            val vecs = (0 until n).map(i => root.getVector(i))
            var r = 0
            while (r < root.getRowCount) {
              val vals = new Array[Any](n)
              var c = 0
              while (c < n) {
                val v = vecs(c)
                vals(c) =
                  if (v.isNull(r)) null
                  else fieldTypes(c) match {
                    case LongType => v.asInstanceOf[BigIntVector].get(r)
                    case IntegerType => v.asInstanceOf[IntVector].get(r)
                    case DoubleType => v.asInstanceOf[Float8Vector].get(r)
                    case StringType => new String(
                      v.asInstanceOf[VarCharVector].get(r), "UTF-8")
                    case BooleanType =>
                      v.asInstanceOf[BitVector].get(r) == 1
                    case other => throw DataIOError(path,
                      s"unreachable type $other")
                  }
                c += 1
              }
              out += Row.fromSeq(vals.toIndexedSeq)
              r += 1
            }
          } finally {
            try reader.close() catch { case _: Exception => () }
            try ch.close() catch { case _: Exception => () }
            try alloc.close() catch { case _: Exception => () }
          }
          out.iterator
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Write rows as one Arrow IPC file (fixture/interchange sink —
    * driver-side like the shapefile writer; `batchRows` controls the
    * footer's split granularity so tests exercise multi-batch reads). */
  def write(path: String, schema: StructType, rows: Seq[Row],
      batchRows: Int = 1 << 16): Unit = {
    require(batchRows >= 1, "batchRows >= 1")
    def toArrowField(f: StructField): Field = {
      val t = f.dataType match {
        case LongType => new ArrowType.Int(64, true)
        case IntegerType => new ArrowType.Int(32, true)
        case DoubleType =>
          new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case StringType => new ArrowType.Utf8()
        case BooleanType => new ArrowType.Bool()
        case other => throw DataIOError(path,
          s"field '${f.name}': Spark type ${other.catalogString} has no " +
            "flat Arrow mapping — cast or flatten before the arrow sink")
      }
      new Field(f.name, new FieldType(f.nullable, t, null), null)
    }
    val aschema = new ASchema(schema.fields.map(toArrowField).toSeq.asJava)
    val alloc = new RootAllocator()
    try {
      val root = VectorSchemaRoot.create(aschema, alloc)
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(path),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      val writer = new ArrowFileWriter(root, null, ch)
      try {
        writer.start()
        rows.grouped(batchRows).foreach { batch =>
          root.allocateNew()
          batch.zipWithIndex.foreach { case (row, r) =>
            schema.fields.zipWithIndex.foreach { case (f, c) =>
              val vec = root.getVector(c)
              if (row.isNullAt(c)) vec match {
                case v: BigIntVector => v.setNull(r)
                case v: IntVector => v.setNull(r)
                case v: Float8Vector => v.setNull(r)
                case v: VarCharVector => v.setNull(r)
                case v: BitVector => v.setNull(r)
                case _ => ()
              }
              else f.dataType match {
                case LongType =>
                  vec.asInstanceOf[BigIntVector].setSafe(r, row.getLong(c))
                case IntegerType =>
                  vec.asInstanceOf[IntVector].setSafe(r, row.getInt(c))
                case DoubleType =>
                  vec.asInstanceOf[Float8Vector].setSafe(r, row.getDouble(c))
                case StringType => vec.asInstanceOf[VarCharVector]
                  .setSafe(r, row.getString(c).getBytes("UTF-8"))
                case BooleanType => vec.asInstanceOf[BitVector]
                  .setSafe(r, if (row.getBoolean(c)) 1 else 0)
                case _ => ()
              }
            }
          }
          root.setRowCount(batch.length)
          writer.writeBatch()
        }
        writer.end()
      } finally {
        try writer.close() catch { case _: Exception => () }
        try root.close() catch { case _: Exception => () }
        try ch.close() catch { case _: Exception => () }
      }
    } finally alloc.close()
  }
}
