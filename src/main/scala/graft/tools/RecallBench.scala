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
    val spark = graft.Bench.buildSession(cpus)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < nQueries)
    val nVec = emb.count()

    // exact baseline once: (query -> top-k ids with cosine)
    val brute = SimilaritySearch.bruteForceTopK(
      emb, queries, "vec_id", "embedding", k = k)
      .select("query_id", "vec_id", "cos_sim").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.map(r => r.getLong(1) -> r.getDouble(2)).toMap
      }

    // sweep: the driver-query setting plus cheaper/denser bandings, so
    // the recall-vs-cost CURVE is on the measured record (testdata
    // embeddings are near-random — max pairwise cosine ~0.48 — which is
    // the hyperplane-LSH worst case; real near-dup corpora sit at
    // cos>=0.9 where per-band collision is ~0.3 instead of ~0.02)
    // (nPlanes, bands, probes) — probes > 0 = margin-guided multi-probe
    // (query-side only; the data-side explode stays `bands` rows/vector)
    val configs = Seq((8, 4, 0), (8, 4, 2), (8, 4, 4), (6, 8, 0),
      (6, 8, 2), (4, 8, 0), (3, 12, 0))
    configs.foreach { case (nPlanes, bands, probes) =>
      val lsh = SimilaritySearch.lshTopK(
        emb, queries, "vec_id", "embedding", dim = 64, k = k,
        nPlanes = nPlanes, bands = bands, probes = probes)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val perQuery = brute.toSeq.map { case (q, exact) =>
        val got = lsh.getOrElse(q, Set.empty)
        exact.keySet.intersect(got).size.toDouble / exact.size
      }
      val recall = perQuery.sum / perQuery.size
      // recall over the STRONG neighbors (cos >= 0.3 — the only regime
      // q_embedding_dedup-style near-dup retrieval cares about)
      val strong = brute.toSeq.flatMap { case (q, exact) =>
        val s = exact.filter(_._2 >= 0.3).keySet
        if (s.isEmpty) None
        else Some(s.intersect(lsh.getOrElse(q, Set.empty)).size.toDouble / s.size)
      }
      val strongRecall =
        if (strong.isEmpty) -1.0 else strong.sum / strong.size
      // closed-form EXACT-BUCKET hyperplane-LSH prediction from the exact
      // cosines: P(plane agrees) = 1 - theta/pi, per-band collision
      // p^nPlanes, candidate if any of `bands` bands collides. Measured
      // (at probes=0) ~= model proves the plane sampling is unbiased (a
      // biased or duplicated plane set would read below model); probed
      // rows must read ABOVE it.
      val modelRecall = {
        val ps = brute.toSeq.flatMap { case (_, exact) =>
          exact.values.map { c =>
            val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, c))) / math.Pi
            1.0 - math.pow(1.0 - math.pow(p, nPlanes), bands)
          }
        }
        ps.sum / ps.size
      }
      val cand = SimilaritySearch.lshCandidateCount(
        emb, queries, "vec_id", "embedding", dim = 64,
        nPlanes = nPlanes, bands = bands, probes = probes)
      println(
        s"""{"metric":"ann_lsh_recall_at_$k","value":${f"$recall%.4f"},""" +
          s""""strong_recall_cos_ge_0.3":${f"$strongRecall%.4f"},""" +
          s""""model_recall":${f"$modelRecall%.4f"},""" +
          s""""strong_queries":${strong.size},""" +
          s""""n_queries":${perQuery.size},"n_vectors":$nVec,""" +
          s""""n_planes":$nPlanes,"bands":$bands,"probes":$probes,""" +
          s""""candidate_pairs":$cand,""" +
          s""""candidate_fraction":${f"${cand.toDouble / (nVec * perQuery.size)}%.4f"},""" +
          s""""sf":"$sfDir"}""")
    }
    // IVF-Flat sweep: same recall-vs-cost axes as the LSH rows, so the
    // two ANN families sit on one measured curve. (nCentroids, nProbe);
    // nProbe == nCentroids is exact (recall 1.0) by construction.
    // (nCentroids, nProbe, trained): trained=true swaps the sampled
    // quantizer for the spherical-k-means one (5 Lloyd rounds) so the
    // sampled-vs-trained gap is on the measured record at equal cost
    // knobs.
    val ivfConfigs = Seq(
      (16, 1, false), (16, 2, false), (16, 4, false), (16, 8, false),
      (64, 16, false),
      (16, 2, true), (16, 4, true), (64, 16, true))
    ivfConfigs.foreach { case (nCentroids, nProbe, trained) =>
      val cs =
        if (trained) Some(SimilaritySearch.trainCentroids(
          emb, "vec_id", "embedding", nCentroids = nCentroids, rounds = 5))
        else None
      val ivf = SimilaritySearch.ivfTopK(
        emb, queries, "vec_id", "embedding", k = k,
        nCentroids = nCentroids, nProbe = nProbe, centroids = cs)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val perQuery = brute.toSeq.map { case (q, exact) =>
        val got = ivf.getOrElse(q, Set.empty)
        exact.keySet.intersect(got).size.toDouble / exact.size
      }
      val recall = perQuery.sum / perQuery.size
      val cand = SimilaritySearch.ivfCandidateCount(
        emb, queries, "vec_id", "embedding",
        nCentroids = nCentroids, nProbe = nProbe, centroids = cs)
      println(
        s"""{"metric":"ann_ivf_recall_at_$k","value":${f"$recall%.4f"},""" +
          s""""n_queries":${perQuery.size},"n_vectors":$nVec,""" +
          s""""n_centroids":$nCentroids,"n_probe":$nProbe,""" +
          s""""trained":$trained,""" +
          s""""candidate_pairs":$cand,""" +
          s""""candidate_fraction":${f"${cand.toDouble / (nVec * perQuery.size)}%.4f"},""" +
          s""""sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
