package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batched `mapPartitions`.
  *
  * IMAGE decode is REAL: payloads are actual PNGs and [[decodeImage]]
  * decodes them with the JDK's `javax.imageio` (no external dependency) —
  * dimensions + a luminance histogram from the decoded pixels. AUDIO
  * decode is REAL too: payloads are actual PCM WAV streams and
  * [[decodeAudio]] decodes them with the JDK's `javax.sound.sampled`
  * (zero external codecs for PCM WAV) — sample count, RMS, and Goertzel
  * spectral-band energies of the decoded samples. Only VIDEO decode
  * remains STUBBED (no video codec ships in the JDK or this container):
  * [[decodeStub]] derives a deterministic fake feature vector from the
  * bytes. Everything Spark-side — schema, batch iteration, partition
  * sizing, output shape — is real either way, so swapping the remaining
  * stub for a JNI/ONNX decoder changes one function.
  */
object Multimodal {

  /** Typed metadata carried beside the binary payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("payload", BinaryType, nullable = false)))

  /** A real PNG of deterministic pseudo-random pixels — what a repo's
    * image blobs look like to the pipeline, without any external data.
    */
  def syntheticPng(rnd: scala.util.Random, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, rnd.nextInt(0x1000000))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A real 16-bit mono PCM WAV (RIFF/WAVE via `AudioSystem.write`) of a
    * deterministic two-sine-plus-noise waveform — what a repo's audio
    * blobs look like to the pipeline, without any external data.
    */
  def syntheticWav(
      rnd: scala.util.Random, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val f1 = 100.0 + rnd.nextInt(3000)
    val f2 = 100.0 + rnd.nextInt(3000)
    val data = new Array[Byte](nSamples * 2)
    var t = 0
    while (t < nSamples) {
      val v = 0.5 * math.sin(2 * math.Pi * f1 * t / sampleRate) +
        0.25 * math.sin(2 * math.Pi * f2 * t / sampleRate) +
        0.1 * (rnd.nextDouble() * 2 - 1)
      val s = math.max(-32768L, math.min(32767L, math.round(v * 20000))).toInt
      data(2 * t) = (s & 0xFF).toByte // little-endian PCM
      data(2 * t + 1) = ((s >> 8) & 0xFF).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Pure per-row generator shared by the distributed path and the
    * driver-side oracle (determinism pin for the mapPartitions plumbing).
    * Image rows carry a REAL decodable PNG whose metadata matches its
    * actual dimensions; audio rows a REAL decodable PCM WAV whose
    * duration_ms matches its sample count; video rows opaque
    * pseudo-random bytes (the one remaining stub).
    */
  def syntheticRow(i: Long, seed: Long): (Long, String, String,
      Option[Int], Option[Int], Option[Long], Array[Byte]) = {
    val rnd = new scala.util.Random(seed ^ (i * 0x9E3779B97F4A7C15L))
    val kind = Seq("image", "audio", "video")((i % 3).toInt)
    if (kind == "image") {
      val w = 4 + rnd.nextInt(13)
      val h = 4 + rnd.nextInt(13)
      (i, kind, "image/png", Some(w), Some(h), None, syntheticPng(rnd, w, h))
    } else if (kind == "audio") {
      val rate = 8000
      val n = 400 + rnd.nextInt(1200)
      (i, kind, "audio/wav", None, None, Some(n * 1000L / rate),
        syntheticWav(rnd, n, rate))
    } else {
      val payload = new Array[Byte](256 + rnd.nextInt(256))
      rnd.nextBytes(payload)
      (i, kind, "video/mp4", None, None, Some(1000L + rnd.nextInt(60000)),
        payload)
    }
  }

  /** Deterministic synthetic media table (payload = pseudo-random bytes
    * derived from the id) for tests and benchmarks.
    */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .map(i => syntheticRow(i, seed))
      .toDF("media_id", "kind", "mime", "width", "height", "duration_ms",
        "payload")
  }

  /** STUB decoder (VIDEO only — images and audio have real decoders
    * above/below): a real implementation would decode the payload with a
    * codec library here. This fake derives a deterministic
    * `featureDim`-float vector from the payload bytes so the distributed
    * plumbing (batching, shuffle, schema) is exercised end-to-end.
    */
  def decodeStub(payload: Array[Byte], featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    var h = 0x811C9DC5
    var i = 0
    while (i < payload.length) {
      h = (h ^ payload(i)) * 0x01000193
      out(math.abs(h % featureDim)) += (h & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** REAL image decode via the JDK's ImageIO: feature vector =
    * [width, height, luminance histogram over the remaining dims] of the
    * decoded pixels (row-major accumulation — deterministic). Pure
    * function of the pixels, so oracle-side decode(encode(img)) agrees
    * regardless of PNG encoder byte details.
    */
  def decodeImage(payload: Array[Byte], featureDim: Int): Array[Float] = {
    require(featureDim >= 3, s"featureDim $featureDim < 3")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, "image payload is not decodable")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Float](featureDim)
    out(0) = w.toFloat
    out(1) = h.toFloat
    val n = w * h
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        out(2 + lum * (featureDim - 2) / 256) += 1.0f / n
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (PCM WAV needs
    * no external codec): feature vector = [sample count, RMS, Goertzel
    * amplitude in `featureDim - 2` equal-width frequency bands spanning
    * 0..Nyquist]. Pure function of the decoded samples, so oracle-side
    * decode(encode(samples)) agrees regardless of WAV container details.
    */
  def decodeAudio(payload: Array[Byte], featureDim: Int): Array[Float] = {
    require(featureDim >= 3, s"featureDim $featureDim < 3")
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      require(
        fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unsupported audio format: $fmt (16-bit signed mono PCM only)")
      val bytes = in.readAllBytes()
      val big = fmt.isBigEndian
      val n = bytes.length / 2
      val out = new Array[Float](featureDim)
      out(0) = n.toFloat
      if (n == 0) return out
      val samples = new Array[Double](n)
      var sumSq = 0.0
      var i = 0
      while (i < n) {
        val s =
          if (big) ((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xFF)).toShort
          else ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)).toShort
        val v = s / 32768.0
        samples(i) = v
        sumSq += v * v
        i += 1
      }
      out(1) = math.sqrt(sumSq / n).toFloat
      val nBands = featureDim - 2
      var b = 0
      while (b < nBands) {
        // Goertzel at the band-center normalized frequency
        val w = math.Pi * (b + 0.5) / nBands
        val coeff = 2.0 * math.cos(w)
        var s1 = 0.0
        var s2 = 0.0
        var t = 0
        while (t < n) {
          val s0 = samples(t) + coeff * s1 - s2
          s2 = s1
          s1 = s0
          t += 1
        }
        val power = s1 * s1 + s2 * s2 - coeff * s1 * s2
        out(2 + b) = (math.sqrt(math.max(0.0, power)) / n).toFloat
        b += 1
      }
      out
    } finally in.close()
  }

  /** Per-kind decode dispatch: real ImageIO for images, real
    * javax.sound.sampled for audio, stub for video.
    */
  def decode(kind: String, payload: Array[Byte], featureDim: Int): Array[Float] =
    if (kind == "image") decodeImage(payload, featureDim)
    else if (kind == "audio") decodeAudio(payload, featureDim)
    else decodeStub(payload, featureDim)

  /** Feature extraction over the binary column, batched per partition
    * (the mapPartitions shape a real decoder needs: reuse per-partition
    * decoder state, no per-row init).
    */
  def extractFeatures(media: DataFrame, featureDim: Int = 32): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val result: Dataset[(Long, String, Array[Float])] =
      media.select("media_id", "kind", "payload")
        .as[(Long, String, Array[Byte])]
        .mapPartitions { batch =>
          // per-partition decoder init happens here (ImageIO is stateless;
          // a JNI/ONNX audio/video decoder would be constructed once here)
          batch.map { case (id, kind, payload) =>
            (id, kind, decode(kind, payload, featureDim))
          }
        }
    result.toDF("media_id", "kind", "features")
  }

  /** Frame-sampling plan for video rows: deterministic sample timestamps
    * (every `everyMs`), exploded to one row per frame — the decode of each
    * frame is the same stub.
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 5000L): DataFrame =
    media
      .where(col("kind") === "video")
      .withColumn("frame_ts",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .select("media_id", "mime", "duration_ms", "frame_ts")
}
