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
  * come from actual pixels. AUDIO DECODE IS REAL for WAV/PCM — RIFF is
  * a length-prefixed chunk format parseable with plain byte arithmetic
  * (no codec library): sample rate, channel count, RMS amplitude and an
  * amplitude histogram come from actual samples. VIDEO DECODE IS REAL
  * for the JDK-decodable multi-frame formats (animated GIF — ImageIO
  * exposes every frame): dims, mean luminance and a temporal profile
  * of sampled frame means come from actual pixels (full-frame
  * animations; inter-frame-optimized GIFs would need disposal
  * compositing and fall back). Only
  * compressed-codec video (H.264 etc.) falls back to the
  * clearly-marked deterministic byte-stats STUB; swapping a codec in
  * changes only `byteStatsStub`'s body, nothing in the plan shape.
  *
  * Feature-column mapping per modality (featureSchema is shared):
  * image → (width, height, mean luminance, luminance histogram);
  * audio → (sample rate, channels, RMS amplitude, amplitude histogram);
  * video → (width, height, mean frame luminance, sampled per-frame
  * mean luminances); codec-video stub → (declared dims, byte stats).
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
    * by id, encoded via the JDK's ImageIO) and AUDIO rows carry REAL
    * WAV/PCM16 payloads (a deterministic triangle wave keyed by id), so
    * both decode paths are exercised end to end; HALF the video rows
    * carry REAL animated GIFs (multi-frame decode path), the rest
    * pseudo-random bytes (splitmix-style) exercising the codec stub. */
  def withSyntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    val rows = spark.range(n).rdd.map { id =>
      val w = 64 + (id % 4).toInt * 32
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val payload =
        if (kind == "image") syntheticPng(w, 64, id)
        else if (kind == "audio") syntheticWav(800 + (id % 5).toInt * 160, 16000, id)
        // half the video rows are REAL animated GIFs (decodable frames),
        // half are opaque codec-like bytes exercising the stub fallback.
        // frame count uses a residue independent of the id%6 GIF gate
        // (id%3 would be constant on the gated ids)
        else if (id % 6 == 2) syntheticGif(32, 16, frames = 3 + ((id / 6) % 3).toInt, seed = id)
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

  /** Deterministic mono PCM16 WAV: sample i of the triangle-ish wave
    * `(((i * (7 + seed % 5)) % 2048) - 1024) * 16` — integer math only,
    * so tests recompute expected RMS bit-exactly without libm. */
  /** Allocate a PCM16-mono WAV buffer with its 44-byte RIFF header
    * written, positioned at the data section (shared by both synthetic
    * WAV builders so the header layout exists once). */
  private def pcm16MonoWavBuffer(nSamples: Int, sampleRate: Int): java.nio.ByteBuffer = {
    val dataLen = nSamples * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)            // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)           // block align, bits/sample
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    b
  }

  def syntheticWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val b = pcm16MonoWavBuffer(nSamples, sampleRate)
    val k = (7 + (seed % 5)).toInt
    var i = 0
    while (i < nSamples) {
      b.putShort((((i.toLong * k) % 2048 - 1024) * 16).toShort)
      i += 1
    }
    b.array()
  }

  /** REAL audio decode for WAV/PCM (8/16-bit): walks the RIFF chunk
    * list with plain byte arithmetic — no codec library exists or is
    * needed for PCM. Features: (sampleRate, channels, RMS of samples
    * normalized to [-1,1), 8-bin histogram of normalized amplitude).
    * None when the payload isn't RIFF/WAVE PCM. */
  /** Shared RIFF/WAVE chunk walk: (channels, sampleRate, bits, dataOff,
    * nSamples) for integer-PCM payloads; None for anything else. */
  private def wavPcm(payload: Array[Byte]): Option[(Int, Int, Int, Int, Int)] =
    try {
      if (payload.length < 44) return None
      val b = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int) = new String(payload, off, 4, "US-ASCII")
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var fmt: Option[(Int, Int, Int)] = None // channels, sampleRate, bits
      var data: Option[(Int, Int)] = None     // offset, length
      while (off + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
        val id = tag(off); val len = b.getInt(off + 4)
        if (len < 0) return None // corrupt length would stall the walk
        if (id == "fmt " && len >= 16) {
          if (b.getShort(off + 8) != 1) return None // PCM only
          fmt = Some((b.getShort(off + 10).toInt, b.getInt(off + 12),
            b.getShort(off + 22).toInt))
        } else if (id == "data")
          data = Some((off + 8, math.min(len, payload.length - off - 8)))
        off += 8 + len + (len & 1) // chunks are word-aligned
      }
      for ((channels, rate, bits) <- fmt; (dOff, dLen) <- data) yield {
        if (bits != 8 && bits != 16) return None
        (channels, rate, bits, dOff, dLen / (bits / 8))
      }
    } catch { case _: Exception => None }

  /** Sample i in [-1, 1) for a parsed PCM payload. */
  @inline private def pcmSample(payload: Array[Byte],
      b: java.nio.ByteBuffer, bits: Int, dOff: Int, i: Int): Double =
    if (bits == 16) b.getShort(dOff + i * 2) / 32768.0
    else ((payload(dOff + i) & 0xFF) - 128) / 128.0

  private[graft] def decodeWav(payload: Array[Byte]): Option[(Int, Int, Double, Array[Double])] =
    wavPcm(payload).map { case (channels, rate, bits, dOff, n) =>
      val b = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val hist = new Array[Double](8)
      var sumSq = 0.0
      var i = 0
      while (i < n) {
        val s = pcmSample(payload, b, bits, dOff, i)
        sumSq += s * s
        hist(math.min(((s + 1.0) / 2.0 * 8).toInt, 7)) += 1.0
        i += 1
      }
      val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
      (rate, channels, rms, if (n == 0) hist else hist.map(_ / n))
    }

  /** E5+E2 — audio perceptual fingerprint over the REAL PCM decode:
    * 64 equal time frames, mean |amplitude| per frame, each frame
    * thresholded at the global frame mean → 64-bit fingerprint
    * (bit i = frame i is louder than average). The energy ENVELOPE
    * survives re-encoding and low-level noise, so perceptual
    * duplicates land within a few hamming bits — the audio analogue of
    * the image aHash, feeding the same pigeonhole blocking. None for
    * non-WAV payloads or clips shorter than the frame grid. */
  private[graft] def audioHash(payload: Array[Byte]): Option[Long] =
    wavPcm(payload).flatMap { case (_, _, bits, dOff, n) =>
      if (n < 64) None
      else {
        val b = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val sums = new Array[Double](64)
        val counts = new Array[Long](64)
        var i = 0
        while (i < n) {
          val frame = (i.toLong * 64 / n).toInt
          sums(frame) += math.abs(pcmSample(payload, b, bits, dOff, i))
          counts(frame) += 1
          i += 1
        }
        val means = Array.tabulate(64)(f => if (counts(f) == 0) 0.0 else sums(f) / counts(f))
        val global = means.sum / 64
        var fp = 0L
        var f = 0
        while (f < 64) { if (means(f) > global) fp |= (1L << f); f += 1 }
        Some(fp)
      }
    }

  private val audioHashUdf =
    org.apache.spark.sql.functions.udf((p: Array[Byte]) => audioHash(p))

  /** Per-row audio fingerprint column (null where the payload isn't
    * decodable PCM). */
  def audioAHash(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    audioHashUdf(payload)

  /** E5+E2 — near-duplicate AUDIO pairs: energy-envelope fingerprint +
    * [[Dedup.fingerprintNearDuplicates]] pigeonhole blocking, exactly
    * the image path's shape. Undecodable payloads drop out as nulls. */
  def audioNearDuplicates(media: DataFrame, idCol: String, payloadCol: String,
      maxDistance: Int = 5, cache: Boolean = true): DataFrame = {
    val fps = media.select(col(idCol), audioAHash(col(payloadCol)).as("audio_hash"))
      .filter(col("audio_hash").isNotNull)
    Dedup.fingerprintNearDuplicates(fps, idCol, "audio_hash", maxDistance,
      nBits = 64, cache = cache)
  }

  /** Deterministic animated GIF: frame f is the CONSTANT gray level
    * `40 + (seed·7 mod 100) + f·16` — constant frames survive GIF's
    * palette quantization losslessly, so per-frame means (and their
    * +16 deltas) are exactly recomputable in tests. */
  def syntheticGif(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
    // base <= 139 and (frames-1)*16 <= 112 keep every level in [40, 251]
    require(frames >= 1 && frames <= 8, "constant-gray levels must stay below 256")
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until frames).foreach { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val v = 40 + math.floorMod(seed * 7, 100).toInt + f * 16
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    out.toByteArray
  }

  /** REAL video decode for the JDK-decodable multi-frame formats —
    * animated GIF (ImageIO's GIF reader exposes every frame). Features:
    * (width, height, mean luminance across sampled frames, per-sampled-
    * frame mean luminance as the feature vector — a temporal profile,
    * up to 8 frames via [[frameSampleIndices]]-style striding). None
    * when the payload isn't a multi-frame-readable image format.
    * Compressed codecs (H.264 etc.) have no JDK decoder and fall to
    * the byte-stats stub — the one remaining honest stub. */
  private[graft] def decodeVideo(payload: Array[Byte]): Option[(Int, Int, Double, Array[Double])] = {
    var iis: javax.imageio.stream.ImageInputStream = null
    var reader: javax.imageio.ImageReader = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      reader = readers.next()
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      if (n < 2) return None // single image is not a video
      val w = reader.getWidth(0); val h = reader.getHeight(0)
      val stride = math.max(1, n / 8)
      val sampled = (0 until n by stride).take(8)
      val means = sampled.map { i =>
        val img = reader.read(i)
        // inter-frame-optimized GIFs store only the changed
        // sub-rectangle per frame; a correct luminance needs disposal
        // compositing, which is out of scope — fall back honestly
        // rather than average a partial raster
        if (img.getWidth != w || img.getHeight != h) return None
        var sum = 0.0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
            x += 1
          }
          y += 1
        }
        sum / (img.getWidth.toDouble * img.getHeight)
      }
      Some((w, h, means.sum / means.length, means.toArray))
    } catch { case _: Exception => None }
    finally {
      if (reader != null) reader.dispose()
      if (iis != null) iis.close()
    }
  }

  /** ================== COMPRESSED-VIDEO DECODE STUB ==================
    * Stands in for a real codec-video decoder (ffmpeg-class codecs
    * don't exist in this environment; H.264 and friends can't be
    * parsed with JDK-only means — multi-frame GIF/MJPEG CAN and are
    * real, see [[decodeVideo]]). Deterministic: features derive from
    * byte statistics, so tests are stable. A real implementation
    * replaces ONLY this function body, keeping the batch shape. Also
    * the fallback for undecodable image/audio payloads.
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
    else if (mediaType == "audio")
      decodeWav(payload).getOrElse(byteStatsStub(payload, declaredW, declaredH))
    else
      decodeVideo(payload).getOrElse(byteStatsStub(payload, declaredW, declaredH))

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

  /** E5+E2 — average-hash (aHash) perceptual fingerprint of an image
    * payload: REAL decode (javax.imageio), 8×8 box-averaged luminance,
    * threshold each cell at the global cell mean → 64-bit fingerprint
    * (bit index = cellY*8 + cellX). Re-encodes, resizes and small
    * pixel-level edits preserve block means, so perceptual duplicates
    * land within a few bits of hamming distance — the image analogue of
    * text SimHash, feeding the same pigeonhole blocking. None when the
    * payload isn't a decodable image (or is smaller than the 8×8 grid). */
  private[graft] def averageHash(payload: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth < 8 || img.getHeight < 8) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val sums = new Array[Double](64)
        val counts = new Array[Long](64)
        // one bulk ARGB fetch — per-pixel getRGB pays a ColorModel
        // conversion per call, several times slower on the media path
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var y = 0
        while (y < h) {
          val by = y * 8 / h
          var x = 0
          while (x < w) {
            val rgb = px(y * w + x)
            val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
            val cell = by * 8 + x * 8 / w
            sums(cell) += lum; counts(cell) += 1
            x += 1
          }
          y += 1
        }
        val means = Array.tabulate(64)(i => if (counts(i) == 0) 0.0 else sums(i) / counts(i))
        val global = means.sum / 64
        var fp = 0L
        var i = 0
        while (i < 64) { if (means(i) > global) fp |= (1L << i); i += 1 }
        Some(fp)
      }
    } catch { case _: Exception => None }

  /** E5+E2 — difference-hash (dHash) perceptual image fingerprint
    * (Krawetz 2013, "Kind of Like That" — the gradient companion to
    * aHash): 9×8 box-averaged luminance grid, bit = 1 where each cell
    * is brighter than its RIGHT neighbor (bit index = row*8 + col).
    * Gradients survive global brightness/contrast shifts that move
    * aHash's global mean — an edit aHash reads as a wholesale flip
    * lands within a few dHash bits. Same 64-bit shape, feeds the same
    * pigeonhole blocking. None for undecodable or sub-grid images. */
  private[graft] def differenceHash(payload: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth < 9 || img.getHeight < 8) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val sums = new Array[Double](72)
        val counts = new Array[Long](72)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var y = 0
        while (y < h) {
          val by = y * 8 / h
          var x = 0
          while (x < w) {
            val rgb = px(y * w + x)
            val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
            val cell = by * 9 + x * 9 / w
            sums(cell) += lum; counts(cell) += 1
            x += 1
          }
          y += 1
        }
        val means = Array.tabulate(72)(i => if (counts(i) == 0) 0.0 else sums(i) / counts(i))
        var fp = 0L
        var row = 0
        while (row < 8) {
          var colI = 0
          while (colI < 8) {
            if (means(row * 9 + colI) > means(row * 9 + colI + 1))
              fp |= (1L << (row * 8 + colI))
            colI += 1
          }
          row += 1
        }
        Some(fp)
      }
    } catch { case _: Exception => None }

  private val dHashUdf =
    org.apache.spark.sql.functions.udf((p: Array[Byte]) => differenceHash(p))

  /** Per-row dHash column (null where the payload isn't an image). */
  def imageDHash(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    dHashUdf(payload)

  private val aHashUdf =
    org.apache.spark.sql.functions.udf((p: Array[Byte]) => averageHash(p))

  /** Per-row aHash column over a binary payload column (null where the
    * payload doesn't decode as an image). */
  def imageAHash(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aHashUdf(payload)

  /** E5+E2 — near-duplicate IMAGE pairs: aHash each decodable payload,
    * then [[Dedup.fingerprintNearDuplicates]] pigeonhole blocking +
    * exact hamming verify. Non-image payloads drop out (null hash)
    * instead of failing the job — a 100 TB media crawl always contains
    * undecodable bytes. Output: (id_a, id_b, hamming). */
  def imageNearDuplicates(media: DataFrame, idCol: String, payloadCol: String,
      maxDistance: Int = 5, cache: Boolean = true): DataFrame = {
    val fps = media.select(col(idCol), imageAHash(col(payloadCol)).as("ahash"))
      .filter(col("ahash").isNotNull)
    Dedup.fingerprintNearDuplicates(fps, idCol, "ahash", maxDistance,
      nBits = 64, cache = cache)
  }

  /** E5+E2 — near-duplicate IMAGE pairs under the dHash gradient
    * fingerprint — same pigeonhole blocking as [[imageNearDuplicates]],
    * robust to global brightness/contrast edits aHash is not. */
  def imageNearDuplicatesDHash(media: DataFrame, idCol: String,
      payloadCol: String, maxDistance: Int = 5,
      cache: Boolean = true): DataFrame = {
    val fps = media.select(col(idCol), imageDHash(col(payloadCol)).as("dhash"))
      .filter(col("dhash").isNotNull)
    Dedup.fingerprintNearDuplicates(fps, idCol, "dhash", maxDistance,
      nBits = 64, cache = cache)
  }

  /** Deterministic block-ENVELOPE WAV for perceptual-hash tests: 64
    * frames of `samplesPerFrame` PCM16 samples; frame f carries an
    * alternating-sign square wave at amplitude 26000 (pattern bit set)
    * or 1600 (clear), plus a small per-sample jitter (< 100 units) that
    * frame averaging must wash out — so [[audioHash]] recovers
    * `pattern` exactly and a k-bit pattern flip is hamming k away. */
  def syntheticBlockWav(pattern: Long, samplesPerFrame: Int = 100): Array[Byte] = {
    val nSamples = 64 * samplesPerFrame
    val b = pcm16MonoWavBuffer(nSamples, 16000)
    var i = 0
    while (i < nSamples) {
      val frame = i / samplesPerFrame
      val base = if (((pattern >>> frame) & 1L) == 1L) 26000 else 1600
      val jitter = (i * 13) % 97
      val amp = base + jitter
      b.putShort((if (i % 2 == 0) amp else -amp).toShort)
      i += 1
    }
    b.array()
  }

  // ---- round-10 exact per-element feature ops ------------------------
  // The brief's decode / feature-extract / RESIZE / FRAME-SAMPLE set as
  // first-class EXACT operators: every output is integer arithmetic
  // over real decoded pixels/samples, so a SQL oracle can replay a
  // synthetic payload's formula bit-for-bit (lossless codecs only:
  // PNG/GIF pixels and PCM samples round-trip exactly).

  /** E5 — image BOX-DOWNSAMPLE (integer resize): decode, cut into
    * `factor`×`factor` blocks, emit per block the pixel count and the
    * exact channel-sum Σ(r+g+b) — callers derive mean luminance with
    * one integer `div`. Edge blocks are partial (n_px carries the true
    * count). Null/undecodable payloads yield no rows. */
  def imageBlockStats(media: DataFrame, idCol: String, payloadCol: String,
      factor: Int): DataFrame = {
    require(factor >= 1, "factor >= 1")
    val u = udf((payload: Array[Byte]) =>
      if (payload == null) Seq.empty[ImageBlock]
      else try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) Seq.empty[ImageBlock]
        else {
          val w = img.getWidth; val h = img.getHeight
          val bw = (w + factor - 1) / factor; val bh = (h + factor - 1) / factor
          val sums = new Array[Long](bw * bh)
          val counts = new Array[Long](bw * bh)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val i = (y / factor) * bw + (x / factor)
              sums(i) += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
              counts(i) += 1L
              x += 1
            }
            y += 1
          }
          (0 until bw * bh).map(i =>
            ImageBlock(i % bw, i / bw, counts(i), sums(i)))
        }
      } catch { case _: Exception => Seq.empty[ImageBlock] })
    media.select(col(idCol).as("media_id"),
        explode(u(col(payloadCol))).as("__b"))
      .select(col("media_id"), col("__b.bx").as("bx"), col("__b.by").as("by"),
        col("__b.nPx").as("n_px"), col("__b.sumRgb").as("sum_rgb"))
  }

  /** E5 — audio FRAME FEATURES over raw integer PCM: fixed-length
    * frames of `frameLen` samples (last frame partial), per frame the
    * exact energy Σs² (raw int16/int8 values, a long) and the strict
    * zero-crossing count (s_i·s_{i+1} < 0 within the frame). The
    * VAD/silence-gate readout of a speech-corpus pipeline with no
    * float anywhere. Non-PCM payloads yield no rows. */
  def audioFrameStats(media: DataFrame, idCol: String, payloadCol: String,
      frameLen: Int): DataFrame = {
    require(frameLen >= 2, "frameLen >= 2")
    val u = udf((payload: Array[Byte]) =>
      if (payload == null) Seq.empty[AudioFrame]
      else wavPcm(payload) match {
        case None => Seq.empty[AudioFrame]
        case Some((_, _, bits, dOff, n)) =>
          val b = java.nio.ByteBuffer.wrap(payload)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          @inline def raw(i: Int): Long =
            if (bits == 16) b.getShort(dOff + i * 2).toLong
            else ((payload(dOff + i) & 0xFF) - 128).toLong
          (0 until n by frameLen).map { f0 =>
            val len = math.min(frameLen, n - f0)
            var sumSq = 0L; var zcr = 0L
            var i = 0
            while (i < len) {
              val s = raw(f0 + i)
              sumSq += s * s
              if (i > 0 && raw(f0 + i - 1) * s < 0) zcr += 1
              i += 1
            }
            AudioFrame(f0 / frameLen, len.toLong, sumSq, zcr)
          }
      })
    media.select(col(idCol).as("media_id"),
        explode(u(col(payloadCol))).as("__f"))
      .select(col("media_id"), col("__f.frame").as("frame"),
        col("__f.nSamples").as("n_samples"),
        col("__f.sumSq").as("sum_sq"), col("__f.zcr").as("zero_crossings"))
  }

  /** E5 — video FRAME-SAMPLE: decode the multi-frame payload (animated
    * GIF — the JDK-decodable format), take every `stride`-th frame up
    * to `maxFrames`, emit per sampled frame the frame index, total
    * frame count, pixel count and exact Σ(r+g+b). The temporal
    * thumbnail strip every video-corpus pipeline cuts before the
    * expensive per-frame models. Single-image/undecodable payloads
    * yield no rows. */
  def videoFrameSample(media: DataFrame, idCol: String, payloadCol: String,
      stride: Int, maxFrames: Int): DataFrame = {
    require(stride >= 1 && maxFrames >= 1, "stride/maxFrames >= 1")
    val u = udf((payload: Array[Byte]) => {
      if (payload == null) Seq.empty[VideoFrame]
      else {
        var iis: javax.imageio.stream.ImageInputStream = null
        var reader: javax.imageio.ImageReader = null
        try {
          iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(payload))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Seq.empty[VideoFrame]
          else {
            reader = readers.next()
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            if (n < 2) Seq.empty[VideoFrame]
            else (0 until n by stride).take(maxFrames).map { f =>
              val img = reader.read(f)
              var sum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
                  x += 1
                }
                y += 1
              }
              VideoFrame(f.toLong, n.toLong,
                img.getWidth.toLong * img.getHeight, sum)
            }
          }
        } catch { case _: Exception => Seq.empty[VideoFrame] }
        finally {
          if (reader != null) reader.dispose()
          if (iis != null) try iis.close() catch { case _: Exception => () }
        }
      }
    })
    media.select(col(idCol).as("media_id"),
        explode(u(col(payloadCol))).as("__v"))
      .select(col("media_id"), col("__v.frameIdx").as("frame_idx"),
        col("__v.nFrames").as("n_frames"), col("__v.nPx").as("n_px"),
        col("__v.sumRgb").as("sum_rgb"))
  }

  /** Deterministic BLOCK-pattern PNG for perceptual-hash tests: the
    * 8×8 cell grid renders `pattern` bit `by*8+bx` as bright (220) or
    * dark (40) with a small per-pixel jitter (±10) that block averaging
    * must wash out — so `averageHash` recovers `pattern` exactly and a
    * k-bit pattern flip is exactly hamming k away. */
  def syntheticBlockPng(pattern: Long, w: Int = 64, h: Int = 64): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bit = by * 8 + x * 8 / w
        val base = if (((pattern >>> bit) & 1L) == 1L) 220 else 40
        val jitter = ((x * 13 + y * 7) % 21) - 10
        val v = base + jitter
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}

/** UDF return shapes for the round-10 multimodal feature ops —
  * TOP-LEVEL on purpose (nested private case classes break whole-stage
  * codegen's generated accessors; the Geo.GridPt lesson). */
final case class ImageBlock(bx: Long, by: Long, nPx: Long, sumRgb: Long)
final case class AudioFrame(frame: Long, nSamples: Long, sumSq: Long, zcr: Long)
final case class VideoFrame(frameIdx: Long, nFrames: Long, nPx: Long, sumRgb: Long)
