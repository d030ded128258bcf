package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B: candidatePairs WITH the keys localCheckpoint (current) vs the
  * round-5 recompute-twice shape, interleaved in one JVM/window.
  * Usage: PairsProbe <nFiles> [reps]
  */
object PairsProbe {

  /** Round-5 shape: keys evaluated by both branches (no checkpoint). */
  private def pairsNoCkpt(keys: DataFrame, maxBlockSize: Int = 10000,
      window: Int = 3, degenerateBlockSize: Int = 1000000): DataFrame = {
    val oversized = keys
      .groupBy("key").agg(count(lit(1)).as("block_size"))
      .where(col("block_size") > maxBlockSize)
      .select(col("key"),
        when(col("block_size") > degenerateBlockSize, lit(-1))
          .otherwise((floor((col("block_size") - 1) / maxBlockSize) + 1)
            .cast("int"))
          .as("n_segments"))
    val sized = keys
      .join(broadcast(oversized), Seq("key"), "left")
      .where(coalesce(col("n_segments"), lit(1)) > 0)
      .select(
        when(col("n_segments").isNull, col("key"))
          .otherwise(concat(col("key"), lit("#"),
            pmod(xxhash64(col("file_id")), col("n_segments").cast("long"))
              .cast("string")))
          .as("key"),
        col("file_id"), col("token"))
    val w = Window.partitionBy("key").orderBy("file_id", "token")
    val rec = struct(col("file_id"), col("token"))
    sized.select(
      col("file_id").as("id_a"), col("token").as("token_a"),
      array((1 to window).map(k => lead(rec, k).over(w)): _*).as("neighbors"))
      .select(col("id_a"), col("token_a"), explode(col("neighbors")).as("n"))
      .where(col("n").isNotNull)
      .select(col("id_a"), col("token_a"),
        col("n.file_id").as("id_b"), col("n.token").as("token_b"))
      .where(col("id_a") =!= col("id_b"))
      .select(
        least(col("id_a"), col("id_b")).as("src"),
        greatest(col("id_a"), col("id_b")).as("dst"),
        when(col("id_a") < col("id_b"), col("token_a"))
          .otherwise(col("token_b")).as("token_a"),
        when(col("id_a") < col("id_b"), col("token_b"))
          .otherwise(col("token_a")).as("token_b"))
      .dropDuplicates("src", "dst", "token_a", "token_b")
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toLong).getOrElse(200000L)
    val reps = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(2)
    val spark = graft.Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Bench.warmCpus(32)
    def keysDf = graft.pipeline.Blocking.blockingKeys(
      graft.pipeline.Tokenizer.pruneCommon(
        graft.pipeline.Tokenizer.tokenize(
          graft.pipeline.RepoFiles.generate(spark, nFiles, 42L)),
        knownFileCount = nFiles))
    (1 to reps).foreach { r =>
      var t0 = System.nanoTime()
      val nNew = graft.pipeline.Blocking.candidatePairs(keysDf).count()
      val tNew = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val nOld = pairsNoCkpt(keysDf).count()
      val tOld = (System.nanoTime() - t0) / 1e9
      println(f"PAIRS rep$r ckpt $tNew%6.1f s ($nNew) | nockpt $tOld%6.1f s ($nOld)")
    }
    spark.stop()
  }
}
