package graft.tools

import org.apache.spark.sql.functions._

/** Per-stage wall-time breakdown of the raw linkage chain at one
  * parallelism level — each stage forced (and localCheckpointed so the
  * next stage doesn't recompute it), so the printed seconds are additive.
  * Usage: PipelineProfile <nFiles> <cpus>
  */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = args.drop(1).headOption.getOrElse("16")
    val spark = graft.Bench.buildSession(cpus)
    graft.Bench.warmCpus(cpus.toInt)

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val files = timed("generate") {
      graft.pipeline.RepoFiles.generate(spark, nFiles, seed = 42L)
        .localCheckpoint()
    }
    val tokens = timed("tokenize") {
      graft.pipeline.Tokenizer.pruneCommon(
        graft.pipeline.Tokenizer.tokenize(files), knownFileCount = nFiles)
        .localCheckpoint()
    }
    val keys = timed("blocking_keys") {
      graft.pipeline.Blocking.blockingKeys(tokens).localCheckpoint()
    }
    val pairs = timed("cand_pairs") {
      graft.pipeline.Blocking.candidatePairs(keys).localCheckpoint()
    }
    val edges = timed("score_edges") {
      graft.pipeline.Scoring.edges(
        graft.pipeline.Scoring.score(pairs)).localCheckpoint()
    }
    val clusters = timed("connected_cc") {
      val (labels, rounds) = graft.pipeline.ConnectedComponents
        .runCounted(spark, files.select("file_id"), edges)
      val c = labels.groupBy("cluster_id").agg(count(lit(1))).count()
      println(s"  cc rounds=$rounds clusters=$c")
      labels
    }
    println(s"rows: files=${files.count()} tokens=${tokens.count()} " +
      s"keys=${keys.count()} pairs=${pairs.count()} edges=${edges.count()}")
    spark.stop()
  }
}
