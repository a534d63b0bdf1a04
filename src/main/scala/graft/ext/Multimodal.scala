package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** E5 — multimodal columns: image/audio/video as opaque BINARY payloads
  * with typed metadata structs, processed in partition-sized batches.
  *
  * The Spark-side plumbing here is real and tested: schema, batch
  * iteration (mapPartitions — the JVM analog of mapInPandas batches),
  * payload-hash partitioning for decode locality, and the feature
  * schema contract. The DECODE ITSELF IS A STUB — this container has no
  * image/audio codecs — implemented as a deterministic fake
  * (byte-statistics standing in for pixel statistics) and clearly
  * marked below. Swapping in a real codec changes only the body of
  * `decodeStub`, nothing in the plan shape.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),   // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("declared_width", IntegerType),
      StructField("declared_height", IntegerType),
      StructField("sample_rate", IntegerType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_intensity", DoubleType),
    StructField("feature_vec", ArrayType(DoubleType))))

  /** Deterministic synthetic payloads for tests/benchmarks: media_id →
    * pseudo-random bytes (splitmix-style), length keyed by id. */
  def withSyntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    val rows = spark.range(n).rdd.map { id =>
      var x = id * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
      def next(): Byte = { x ^= x >>> 27; x *= 0x94D049BB133111EBL; (x >>> 56).toByte }
      val len = 256 + (id % 7).toInt * 128
      val payload = Array.fill(len)(next())
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      Row(id, kind, payload, Row(64 + (id % 4).toInt * 32, 64, 16000))
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  /** ======================= DECODE STUB =======================
    * Stands in for a real image/audio decoder (none in this image).
    * Deterministic: features derive from byte statistics, so tests are
    * stable. A real implementation replaces ONLY this function body
    * (e.g. javax.imageio / ffmpeg bindings), keeping the batch shape.
    */
  private def decodeStub(mediaType: String, payload: Array[Byte],
      declaredW: Int, declaredH: Int): (Int, Int, Double, Array[Double]) = {
    val n = payload.length
    val mean = if (n == 0) 0.0 else payload.iterator.map(b => (b & 0xFF).toDouble).sum / n
    // fake 8-bin byte histogram as the "feature vector"
    val hist = new Array[Double](8)
    payload.foreach(b => hist((b & 0xFF) >> 5) += 1.0)
    val vec = if (n == 0) hist else hist.map(_ / n)
    (declaredW, declaredH, mean, vec)
  }

  /** Batch feature extraction: one mapPartitions pass, partition-local
    * batches (the mapInPandas analog). Repartitioning by payload hash
    * first spreads decode cost uniformly regardless of upstream file
    * layout — the decode stage is CPU-bound, so partition count should
    * track cores, not input splits. */
  def extractFeatures(media: DataFrame, numPartitions: Int = 0): DataFrame = {
    val spark = media.sparkSession
    val prepared =
      if (numPartitions > 0) media.repartition(numPartitions, xxhash64(col("payload")))
      else media
    val out = prepared.select("media_id", "media_type", "payload",
      "meta.declared_width", "meta.declared_height").rdd
      .mapPartitions { batch =>
        batch.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h, mean, vec) = decodeStub(r.getString(1), payload,
            r.getInt(3), r.getInt(4))
          Row(r.getLong(0), r.getString(1), payload.length, w, h, mean, vec.toSeq)
        }
      }
    spark.createDataFrame(out, featureSchema)
  }

  /** Frame sampling plan for video payloads: every `stride`-th frame
    * index up to `maxFrames` — the plan-side half of video decode
    * (indices are computed declaratively; the decode of each frame
    * would go through the same stub boundary). */
  def frameSampleIndices(nFrames: org.apache.spark.sql.Column, stride: Int, maxFrames: Int)
      : org.apache.spark.sql.Column =
    slice(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)), 1, maxFrames)
}
