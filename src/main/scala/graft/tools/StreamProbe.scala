package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Prints per-micro-batch durationMs breakdowns for the three streaming
  * driver queries — where does each batch's wall time go (addBatch,
  * queryPlanning, getBatch, walCommit, stateManagement...)?
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Bench.warmCpus(32)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val input = MemoryStream[(Long, String, Long)]
      val out = graft.streaming.StreamingDedup.dedupe(
        input.toDS().toDF("doc_id", "text", "event_sec"),
        ttlSeconds = 100L, eventTimeCol = Some("event_sec"))
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      try {
        val q = out.writeStream.format("memory")
          .queryName(s"probe_$rep").outputMode("append").start()
        val tStart = System.nanoTime()
        println(f"rep$rep start-to-running ${(tStart - t0) / 1e9}%.3f s")
        graft.streaming.StreamingDriverQueries.docBatches.zipWithIndex
          .foreach { case (b, i) =>
            val tb = System.nanoTime()
            input.addData(b: _*)
            q.processAllAvailable()
            println(f"rep$rep batch$i wall ${(System.nanoTime() - tb) / 1e9}%.3f s")
          }
        q.recentProgress.foreach { p =>
          println(s"rep$rep progress batch=${p.batchId} " +
            s"durationMs=${p.durationMs}")
        }
        val ts = System.nanoTime()
        q.stop()
        spark.catalog.dropTempView(s"probe_$rep")
        println(f"rep$rep stop ${(System.nanoTime() - ts) / 1e9}%.3f s " +
          f"total ${(System.nanoTime() - t0) / 1e9}%.3f s")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    spark.stop()
  }
}
