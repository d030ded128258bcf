package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transitive closure via iterative min-label propagation.
  *
  * Each iteration is one shuffle: labels flow across edges in both
  * directions, and every vertex takes the min label seen. Iterates to
  * fixpoint (O(cluster diameter) rounds — name-variant clusters are
  * shallow). Each iteration is localCheckpoint'ed to cut the lineage so the
  * plan doesn't grow across iterations; a driver restart resumes from the
  * last pipeline-stage checkpoint (TableIO), not from scratch.
  *
  * The large-to-small discipline: the per-round message table is built by
  * joining the (small, shrinking) frontier of relabeled vertices against
  * the (large, static) edge table — with AQE deciding broadcast once the
  * frontier fits under the threshold.
  */
object ConnectedComponents {

  /** edges(src, dst) + vertices(file_id) -> (file_id, cluster_id). */
  def run(
      spark: SparkSession,
      vertices: DataFrame,
      edges: DataFrame,
      maxIterations: Int = 50): DataFrame = {
    // undirected: both orientations, deduped
    val biEdges = edges
      .select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .dropDuplicates("src", "dst")
      .localCheckpoint()

    var labels = vertices
      .select(col("file_id"), col("file_id").as("cluster_id"))
      .localCheckpoint()

    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // messages: each vertex offers its label to its neighbors
      val msgs = biEdges
        .join(labels, biEdges("src") === labels("file_id"))
        .select(biEdges("dst").as("file_id"), col("cluster_id"))

      val newLabels = labels
        .select(col("file_id"), col("cluster_id"))
        .union(msgs)
        .groupBy("file_id")
        .agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint()

      val changed = newLabels
        .join(labels.withColumnRenamed("cluster_id", "old_cluster_id"),
          "file_id")
        .where(col("cluster_id") =!= col("old_cluster_id"))
        .limit(1)
        .count()

      labels = newLabels
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
