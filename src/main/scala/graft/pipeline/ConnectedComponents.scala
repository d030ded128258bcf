package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transitive closure via min-label propagation with pointer jumping.
  *
  * Each round does two things:
  *   1. neighbor propagation — the *frontier* (vertices whose label changed
  *      last round) offers its label across the big static edge table (the
  *      north rule's "iterative large-to-small hash join": AQE broadcasts
  *      the frontier once it shrinks under the threshold);
  *   2. pointer jumping (path halving) — every vertex re-reads the label of
  *      its current label vertex, so label chains collapse geometrically.
  *
  * Propagation alone needs O(diameter) rounds; with halving the loop
  * converges in O(log diameter) — the property that matters when
  * sorted-neighborhood chains make long thin components at 10^12 rows.
  * Each round localCheckpoints to cut lineage so plans don't grow; a driver
  * restart resumes from the last pipeline-stage checkpoint (TableIO).
  */
object ConnectedComponents {

  /** edges(src, dst) + vertices(file_id) -> (file_id, cluster_id). */
  def run(
      spark: SparkSession,
      vertices: DataFrame,
      edges: DataFrame,
      maxIterations: Int = 50): DataFrame =
    runCounted(spark, vertices, edges, maxIterations)._1

  /** [[run]] plus the number of rounds executed — lets tests pin the
    * O(log diameter) convergence property of pointer jumping.
    */
  def runCounted(
      spark: SparkSession,
      vertices: DataFrame,
      edges: DataFrame,
      maxIterations: Int = 50): (DataFrame, Int) = {
    // undirected: both orientations, deduped
    val biEdges = edges
      .select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .dropDuplicates("src", "dst")
      .localCheckpoint()

    var labels = vertices
      .select(col("file_id"), col("file_id").as("cluster_id"))
      .localCheckpoint()

    var frontier = labels
    var iter = 0
    var done = false
    while (!done && iter < maxIterations) {
      // 1. frontier labels flow to neighbors (big edges x small frontier)
      val msgs = biEdges
        .join(frontier, biEdges("src") === frontier("file_id"))
        .select(biEdges("dst").as("file_id"), col("cluster_id"))
        // fresh attribute ids: msgs shares lineage with labels (round 1),
        // and Union constraint propagation chokes on duplicate expr ids
        .toDF("file_id", "cluster_id")

      val candidate = labels
        .toDF("file_id", "cluster_id")
        .union(msgs)
        .groupBy("file_id")
        .agg(min("cluster_id").as("cluster_id"))

      // 2. pointer jumping: take the label of my label's vertex
      val parents = candidate
        .select(col("file_id").as("p_id"), col("cluster_id").as("p_cid"))
      val jumped = candidate.as("c")
        .join(parents, col("c.cluster_id") === col("p_id"), "left")
        .select(col("c.file_id"),
          coalesce(col("p_cid"), col("c.cluster_id")).as("cluster_id"))

      val next = jumped.localCheckpoint()
      val changed = next.as("n")
        .join(labels.withColumnRenamed("cluster_id", "old_cid"), "file_id")
        .where(col("cluster_id") =!= col("old_cid"))
        .select(col("file_id"), col("cluster_id"))
        .localCheckpoint()

      done = changed.isEmpty
      labels = next
      frontier = changed
      iter += 1
    }
    (labels, iter)
  }
}
