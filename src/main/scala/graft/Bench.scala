package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Also reports encoder
  * throughput (rows/sec through all 12 phonetic expressions) as a
  * dedicated metric inside the same line.
  */
object Bench {

  def buildSession(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", true)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    s
  }

  /** Encoder+scoring throughput: run all phonetic expressions over n
    * generated names and count. Returns (rows, seconds).
    */
  def encoderThroughput(spark: SparkSession, n: Long): (Long, Double) = {
    import org.apache.spark.sql.functions._
    val names = graft.pipeline.RepoFiles
      .generate(spark, n, seed = 1L)
      .select(col("file_id"), lower(col("path")).as("token"))
    val t0 = System.nanoTime()
    val cnt = names.select(
      call_function("graft_soundex", col("token")),
      call_function("graft_refined_soundex", col("token")),
      call_function("graft_metaphone", col("token")),
      call_function("graft_double_metaphone", col("token")),
      call_function("graft_nysiis", col("token")),
      call_function("graft_phonex", col("token")),
      call_function("graft_cologne", col("token")),
      call_function("graft_caverphone1", col("token")),
      call_function("graft_caverphone2", col("token")),
      call_function("graft_mra_encode", col("token")),
      call_function("graft_dm_soundex", col("token")),
      call_function("graft_dm_encode", col("token")))
      .count()
    (cnt, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = buildSession(cpus)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
    }

    val (encRows, encSecs) = encoderThroughput(spark, 200000L)
    val encThroughput = (encRows / encSecs).toLong

    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""encoder_rows_per_sec":$encThroughput,"cpus":$cpus,""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
