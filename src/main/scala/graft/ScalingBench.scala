package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Two-parallelism scaling measurement (north rule: throughput scaling
  * efficiency >= 0.8 between N and 4N executors; sandboxed here as
  * local[8] vs local[32] on the same input — no real cluster available).
  *
  * Workload: the full linkage pipeline (generate -> tokenize -> block ->
  * pair -> score -> cluster) plus the 12-encoder throughput scan. Each
  * parallelism level runs in its own SparkSession (previous one stopped),
  * same seed and row count. Results are appended to BENCH.md.
  */
object ScalingBench {

  private def runPipeline(cpus: String, nFiles: Long): Double = {
    val spark = Bench.buildSession(cpus)
    try {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      val files = pipeline.RepoFiles.generate(spark, nFiles, seed = 42L)
      val tokens =
        pipeline.Tokenizer.pruneCommon(pipeline.Tokenizer.tokenize(files))
      val keys = pipeline.Blocking.blockingKeys(tokens)
      val pairs = pipeline.Blocking.candidatePairs(keys)
      val edges = pipeline.Scoring.edges(pipeline.Scoring.score(pairs))
      val clusters = pipeline.ConnectedComponents
        .run(spark, files.select("file_id"), edges)
      clusters.groupBy("cluster_id").agg(count(lit(1))).count()
      (System.nanoTime() - t0) / 1e9
    } finally spark.stop()
  }

  private def runEncoders(cpus: String, n: Long): (Long, Double) = {
    val spark = Bench.buildSession(cpus)
    try Bench.encoderThroughput(spark, n)
    finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toLong).getOrElse(100000L)
    val encRows = 400000L

    // warm JIT once at small scale so neither measured run pays compile
    runPipeline("8", 2000L)

    val pipe8 = runPipeline("8", nFiles)
    val pipe32 = runPipeline("32", nFiles)
    val (rows8, enc8) = runEncoders("8", encRows)
    val (_, enc32) = runEncoders("32", encRows)

    val pipeTp8 = nFiles / pipe8
    val pipeTp32 = nFiles / pipe32
    val pipeEff = (pipeTp32 / pipeTp8) / 4.0
    val encTp8 = rows8 / enc8
    val encTp32 = rows8 / enc32
    val encEff = (encTp32 / encTp8) / 4.0

    val report =
      f"""
         |## Scaling run (${java.time.Instant.now()})
         |
         || workload | local[8] | local[32] | throughput x | scaling efficiency |
         || --- | --- | --- | --- | --- |
         || linkage pipeline, $nFiles files | $pipe8%.1f s (${pipeTp8.toLong} rows/s) | $pipe32%.1f s (${pipeTp32.toLong} rows/s) | ${f"${pipeTp32 / pipeTp8}%.2f"} | $pipeEff%.2f |
         || 12-encoder scan, $encRows rows | $enc8%.1f s (${encTp8.toLong} rows/s) | $enc32%.1f s (${encTp32.toLong} rows/s) | ${f"${encTp32 / encTp8}%.2f"} | $encEff%.2f |
         |
         |Efficiency = (throughput at 4N cores / throughput at N cores) / 4.
         |""".stripMargin

    println(report)
    Files.write(Paths.get("BENCH.md"), report.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
