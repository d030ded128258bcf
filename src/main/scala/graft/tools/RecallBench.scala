package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.SimilaritySearch

/** Measured recall of the banded-LSH ANN against the exact brute-force
  * baseline, at the SAME parameters as the driver queries
  * (`q_ann_lsh`: dim=64, nPlanes=8, bands=4, k=10) — so a parameter
  * regression (e.g. nPlanes bumped without adding bands) shows up as a
  * recall drop on the measured record (BENCH.md), not just as a silent
  * quality change.
  *
  * Usage: `runMain graft.tools.RecallBench [nQueries]` with
  * SPARK_GRAFT_SF_DIR (default sf0.1). Prints one JSON line.
  */
object RecallBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val nQueries = args.headOption.map(_.toInt).getOrElse(100)
    val k = 10
    val nPlanes = 8
    val bands = 4
    val spark = graft.Bench.buildSession(cpus)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < nQueries)

    def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    val brute = topkSets(SimilaritySearch.bruteForceTopK(
      emb, queries, "vec_id", "embedding", k = k))
    val lsh = topkSets(SimilaritySearch.lshTopK(
      emb, queries, "vec_id", "embedding", dim = 64, k = k,
      nPlanes = nPlanes, bands = bands))

    val perQuery = brute.toSeq.map { case (q, exact) =>
      val got = lsh.getOrElse(q, Set.empty)
      exact.intersect(got).size.toDouble / exact.size
    }
    val recall = perQuery.sum / perQuery.size
    val nVec = emb.count()
    // candidate fraction: how much of the table the LSH variant actually
    // scored (the scale argument — recall bought at a fraction of a scan)
    val cand = SimilaritySearch.lshCandidateCount(
      emb, queries, "vec_id", "embedding", dim = 64,
      nPlanes = nPlanes, bands = bands)
    println(
      s"""{"metric":"ann_lsh_recall_at_$k","value":${f"$recall%.4f"},""" +
        s""""n_queries":${perQuery.size},"n_vectors":$nVec,""" +
        s""""n_planes":$nPlanes,"bands":$bands,""" +
        s""""candidate_pairs":$cand,""" +
        s""""candidate_fraction":${f"${cand.toDouble / (nVec * perQuery.size)}%.4f"},""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
