package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batched `mapPartitions`.
  *
  * The actual media decode is STUBBED (no image/audio libraries ship in
  * this container): [[decodeStub]] produces a deterministic fake feature
  * vector from the bytes. Everything Spark-side — schema, batch iteration,
  * partition sizing, output shape — is real and tested, so swapping the
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

  /** Pure per-row generator shared by the distributed path and the
    * driver-side oracle (determinism pin for the mapPartitions plumbing).
    */
  def syntheticRow(i: Long, seed: Long): (Long, String, String,
      Option[Int], Option[Int], Option[Long], Array[Byte]) = {
    val rnd = new scala.util.Random(seed ^ (i * 0x9E3779B97F4A7C15L))
    val kind = Seq("image", "audio", "video")((i % 3).toInt)
    val payload = new Array[Byte](256 + rnd.nextInt(256))
    rnd.nextBytes(payload)
    (i, kind,
      kind match {
        case "image" => "image/png"
        case "audio" => "audio/wav"
        case _       => "video/mp4"
      },
      if (kind == "image") Some(64 + rnd.nextInt(512)) else None,
      if (kind == "image") Some(64 + rnd.nextInt(512)) else None,
      if (kind != "image") Some(1000L + rnd.nextInt(60000)) else None,
      payload)
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
          // per-partition "decoder" init happens here (stubbed)
          batch.map { case (id, kind, payload) =>
            (id, kind, decodeStub(payload, featureDim))
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
