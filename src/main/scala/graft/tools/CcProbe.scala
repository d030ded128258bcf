package graft.tools

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** A/B probe for the connected-components inner loop: the DataFrame
  * frontier loop (per-round Catalyst planning + AQE stage jobs) vs an
  * RDD loop with a fixed HashPartitioner (edges co-partitioned once,
  * one job per round, no per-round planning/codegen). Prints per-variant
  * wall times and the label-set checksum so variants are provably
  * equivalent. Usage: CcProbe <nFiles> [reps]
  */
object CcProbe {

  /** RDD min-label + pointer-jumping loop — semantics identical to
    * ConnectedComponents.runCounted (same candidate/jump/changed rules).
    */
  def rddCc(spark: SparkSession, vertices: RDD[Long],
      biEdges: RDD[(Long, Long)], maxIterations: Int = 50): (RDD[(Long, Long)], Int) = {
    val p = new HashPartitioner(math.max(1, biEdges.getNumPartitions))
    val edges = biEdges.partitionBy(p)
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    var labels: RDD[(Long, Long)] = vertices.map(v => (v, v)).partitionBy(p)
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()
    var next: RDD[(Long, (Long, Boolean))] = null
    var frontier = labels
    var iter = 0
    var done = false
    while (!done && iter < maxIterations) {
      val acc = spark.sparkContext.longAccumulator(s"cc_changed_$iter")
      val msgs = edges.join(frontier, p)
        .map { case (_, (dst, lab)) => (dst, lab) }
        .reduceByKey(p, (a: Long, b: Long) => math.min(a, b))
      val cand = labels.leftOuterJoin(msgs, p)
        .mapValues { case (old, m) =>
          (old, math.min(old, m.getOrElse(old))) }
      val parents = cand
        .filter { case (id, (_, c)) => c != id }
        .mapValues(_._2)
      val n2 = cand
        .map { case (id, (old, c)) => (c, (id, old)) }
        .partitionBy(p)
        .leftOuterJoin(parents, p)
        .map { case (c, ((id, old), pc)) =>
          val nl = pc.getOrElse(c)
          if (nl != old) acc.add(1L)
          (id, (nl, nl != old))
        }
        .partitionBy(p)
        .persist(StorageLevel.MEMORY_AND_DISK)
      n2.count()
      done = acc.value == 0L
      val prev = next
      labels = n2.mapValues(_._1)
      frontier = n2.filter(_._2._2).mapValues(_._1)
      next = n2
      if (prev != null) prev.unpersist(false)
      iter += 1
    }
    (labels, iter)
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toLong).getOrElse(1000L)
    val reps = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(3)
    val spark = graft.Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Bench.warmCpus(32)
    import spark.implicits._

    val files = graft.pipeline.RepoFiles.generate(spark, nFiles, 42L)
    val tokens = graft.pipeline.Tokenizer.pruneCommon(
      graft.pipeline.Tokenizer.tokenize(files), knownFileCount = nFiles)
    val edges = graft.pipeline.Scoring.edges(graft.pipeline.Scoring.score(
      graft.pipeline.Blocking.candidatePairs(
        graft.pipeline.Blocking.blockingKeys(tokens))))
      .localCheckpoint()
    val vertices = files.select("file_id").localCheckpoint()
    println(s"edges=${edges.count()} vertices=${vertices.count()}")

    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val (lab, it) = graft.pipeline.ConnectedComponents.runCounted(
        spark, vertices, edges, canonicalEdges = true)
      val chk = lab.select(sum(col("file_id") * col("cluster_id")))
        .first().getLong(0)
      println(f"DF  rep$r ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        s"rounds=$it checksum=$chk")
    }
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val bi = edges.select("src", "dst")
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .as[(Long, Long)].rdd
      val (lab, it) = rddCc(spark, vertices.as[Long].rdd, bi)
      val chk = lab.map { case (id, c) => id * c }.sum().toLong
      println(f"RDD rep$r ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        s"rounds=$it checksum=$chk")
    }
    spark.stop()
  }
}
