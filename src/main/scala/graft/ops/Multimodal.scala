package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batched `mapPartitions`.
  *
  * IMAGE decode is REAL: payloads are actual PNGs and [[decodeImage]]
  * decodes them with the JDK's `javax.imageio` (no external dependency) —
  * dimensions + a luminance histogram from the decoded pixels. Audio/video
  * decode remains STUBBED (no media codecs ship in this container):
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

  /** Pure per-row generator shared by the distributed path and the
    * driver-side oracle (determinism pin for the mapPartitions plumbing).
    * Image rows carry a REAL decodable PNG whose metadata matches its
    * actual dimensions; audio/video rows carry opaque pseudo-random bytes.
    */
  def syntheticRow(i: Long, seed: Long): (Long, String, String,
      Option[Int], Option[Int], Option[Long], Array[Byte]) = {
    val rnd = new scala.util.Random(seed ^ (i * 0x9E3779B97F4A7C15L))
    val kind = Seq("image", "audio", "video")((i % 3).toInt)
    if (kind == "image") {
      val w = 4 + rnd.nextInt(13)
      val h = 4 + rnd.nextInt(13)
      (i, kind, "image/png", Some(w), Some(h), None, syntheticPng(rnd, w, h))
    } else {
      val payload = new Array[Byte](256 + rnd.nextInt(256))
      rnd.nextBytes(payload)
      (i, kind, if (kind == "audio") "audio/wav" else "video/mp4",
        None, None, Some(1000L + rnd.nextInt(60000)), payload)
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

  /** STUB decoder: a real implementation would decode the payload with an
    * image/audio library here. This fake derives a deterministic
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

  /** Per-kind decode dispatch: real ImageIO for images, stub otherwise. */
  def decode(kind: String, payload: Array[Byte], featureDim: Int): Array[Float] =
    if (kind == "image") decodeImage(payload, featureDim)
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
