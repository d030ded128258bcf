package graft.tools

/** Splits each ANN driver query's wall time into build (DataFrame
  * construction, incl. any centroid-sampling job), plan (optimize +
  * physical planning via explain), and execute (count). Usage: AnnProbe
  * [reps]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Bench.warmCpus(32)
    graft.SparkEntry.queries("q1_agg")(spark, sfDir).count()
    Seq("q_ann_brute", "q_ann_lsh", "q_ann_lsh_mp", "q_ann_ivf",
      "q_embedding_dedup").foreach { name =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"ANN $name%-18s rep$r build ${(t1 - t0) / 1e9}%6.3f  " +
          f"plan ${(t2 - t1) / 1e9}%6.3f  exec ${(t3 - t2) / 1e9}%6.3f")
      }
    }
    spark.stop()
  }
}
