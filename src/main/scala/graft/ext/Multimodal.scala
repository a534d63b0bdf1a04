package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** E5 — multimodal columns: image/audio/video as opaque BINARY payloads
  * with typed metadata structs, processed in partition-sized batches.
  *
  * The Spark-side plumbing is real and tested: schema, batch iteration
  * (mapPartitions — the JVM analog of mapInPandas batches),
  * payload-hash partitioning for decode locality, and the feature
  * schema contract. IMAGE DECODE IS REAL — javax.imageio ships with the
  * JDK (PNG/JPEG/BMP/GIF), so width/height/mean-luminance/histogram
  * come from actual pixels. Audio/video decode remains a clearly-marked
  * deterministic STUB (no ffmpeg-style codecs in this environment);
  * swapping in a real codec changes only `byteStatsStub`'s body,
  * nothing in the plan shape.
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

  /** Deterministic synthetic payloads for tests/benchmarks. IMAGE rows
    * carry REAL PNG payloads (a deterministic grayscale gradient keyed
    * by id, encoded via the JDK's ImageIO) so the decode path is
    * exercised end to end; audio/video rows carry pseudo-random bytes
    * (splitmix-style), length keyed by id. */
  def withSyntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    val rows = spark.range(n).rdd.map { id =>
      val w = 64 + (id % 4).toInt * 32
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val payload =
        if (kind == "image") syntheticPng(w, 64, id)
        else {
          var x = id * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
          def next(): Byte = { x ^= x >>> 27; x *= 0x94D049BB133111EBL; (x >>> 56).toByte }
          Array.fill(256 + (id % 7).toInt * 128)(next())
        }
      Row(id, kind, payload, Row(w, 64, 16000))
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  /** Deterministic grayscale PNG: pixel (x,y) = (x*31 + y*17 + seed*7) % 256. */
  def syntheticPng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (((x * 31 + y * 17).toLong + seed * 7) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image decode via the JDK's javax.imageio (PNG/JPEG/BMP/GIF —
    * no external codec jar needed): actual width/height, mean luminance
    * ((r+g+b)/3 averaged over pixels), 8-bin luminance histogram as the
    * feature vector. None when the payload isn't a decodable image. */
  private def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double, Array[Double])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val hist = new Array[Double](8)
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
            sum += lum
            hist(math.min((lum / 32).toInt, 7)) += 1.0
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        Some((w, h, sum / n, hist.map(_ / n)))
      }
    } catch { case _: Exception => None }

  /** ================== AUDIO/VIDEO DECODE STUB ==================
    * Stands in for a real audio/video decoder (no ffmpeg-style codecs
    * in this environment — unlike images, the JDK ships none).
    * Deterministic: features derive from byte statistics, so tests are
    * stable. A real implementation replaces ONLY this function body,
    * keeping the batch shape. Also the fallback for undecodable image
    * payloads (corrupt/unknown format).
    */
  private def byteStatsStub(payload: Array[Byte],
      declaredW: Int, declaredH: Int): (Int, Int, Double, Array[Double]) = {
    val n = payload.length
    val mean = if (n == 0) 0.0 else payload.iterator.map(b => (b & 0xFF).toDouble).sum / n
    // byte histogram standing in for a decoded-sample histogram
    val hist = new Array[Double](8)
    payload.foreach(b => hist((b & 0xFF) >> 5) += 1.0)
    val vec = if (n == 0) hist else hist.map(_ / n)
    (declaredW, declaredH, mean, vec)
  }

  private def decode(mediaType: String, payload: Array[Byte],
      declaredW: Int, declaredH: Int): (Int, Int, Double, Array[Double]) =
    if (mediaType == "image")
      decodeImage(payload).getOrElse(byteStatsStub(payload, declaredW, declaredH))
    else byteStatsStub(payload, declaredW, declaredH)

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
          val (w, h, mean, vec) = decode(r.getString(1), payload,
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
