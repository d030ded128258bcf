package graft.tools

import org.apache.spark.sql.functions._

/** Phase-level wall-time decomposition of the q_cc_resume shape:
  * pipeline-to-edges, phase-1 capped run (2 rounds + snapshot), phase-2
  * resume run, final join/agg, cleanup. Usage: CcResumeProbe [reps]
  */
object CcResumeProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val spark = graft.Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Bench.warmCpus(32)
    graft.functions.GraftFunctions.register(spark)
    import graft.pipeline._

    (1 to reps).foreach { r =>
      def t[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val res = f
        println(f"  PHASE $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
        res
      }
      val total0 = System.nanoTime()
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "ccprobe")
      try {
        val files = RepoFiles.generate(spark, 1000, 42L, partitions = 4)
        val edges = t("edges") {
          Scoring.edges(Scoring.score(
            Blocking.candidatePairs(Blocking.blockingKeys(
              Tokenizer.pruneCommon(
                Tokenizer.tokenize(files).localCheckpoint(),
                knownFileCount = 1000)))))
            .localCheckpoint()
        }
        val io1 = new graft.io.TableIO(spark, dir.toString)
        t("phase1") {
          ConnectedComponents.runCounted(
            spark, files.select("file_id"), edges, maxIterations = 2,
            durable = Some((io1, 2)), lineageToken = "v1",
            canonicalEdges = true)
        }
        val io2 = new graft.io.TableIO(spark, dir.toString)
        val labels = t("phase2") {
          ConnectedComponents.run(
            spark, files.select("file_id"), edges,
            durable = Some((io2, 2)), lineageToken = "v1",
            canonicalEdges = true)
        }
        t("final") {
          labels
            .join(files.select("file_id", "entity_id"), "file_id")
            .groupBy("cluster_id")
            .agg(count(lit(1)).as("cluster_size"),
              countDistinct("entity_id").as("n_families"))
            .localCheckpoint()
            .count()
        }
      } finally {
        t("cleanup") {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(dir).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
      println(f"  TOTAL rep$r ${(System.nanoTime() - total0) / 1e9}%6.3f s")
    }
    spark.stop()
  }
}
