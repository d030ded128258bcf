package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>).
  *
  * - Brute-force cosine top-k: broadcast the (tiny) query set, codegen'd
  *   `zip_with`/`aggregate` dot products, rank per query — the exact
  *   baseline, O(n) per query, one pass over the table.
  * - LSH-bucketed variant (random hyperplanes): each vector hashes to a
  *   signed projection signature; candidates searched only within the
  *   query's bucket (and its neighbors), the scale path when n makes even
  *   one full pass per query too expensive.
  */
object SimilaritySearch {

  /** Cosine similarity of two array<float>/array<double> columns (computed
    * in double, sequential index-order sums — deterministic and
    * bit-identical to the declarative zip_with/aggregate formulation).
    * Uses the fused codegen'd [[graft.functions.CosineExpr]] — the
    * higher-order-function chain runs interpreted lambdas per element;
    * callers must have `GraftFunctions.register`ed the session (every op
    * here does).
    */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Exact two-phase top-k per query: a single window over query_id would
    * funnel EVERY scored row of a query through one task; instead phase 1
    * takes a per-(query, salt) partial top-k in parallel (any row outside
    * its salt's top-k cannot be in the global top-k), and phase 2 ranks
    * only the surviving salts x k rows.
    */
  private def topKPerQuery(scored: DataFrame, k: Int,
      salts: Int = 64): DataFrame = {
    val salted = scored.withColumn("salt",
      pmod(hash(col("vec_id")), lit(salts)))
    val wPartial = Window.partitionBy("query_id", "salt")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val survivors = salted
      .withColumn("prank", row_number().over(wPartial))
      .where(col("prank") <= k)
    val wFinal = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    survivors
      .withColumn("rank", row_number().over(wFinal))
      .where(col("rank") <= k)
      .select("query_id", "vec_id", "cos_sim", "rank")
  }

  /** Brute-force top-k cosine neighbors for each query vector: (query_id,
    * vec_id, cos_sim, rank) with rank 1..k per query; the query set must
    * be small (broadcast).
    */
  def bruteForceTopK(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val v = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = v
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", round(cosine(col("vec"), col("qvec")), 6))
    topKPerQuery(scored, k)
  }

  /** Deterministic +/-1 hyperplane component for (seed, plane, dim) —
    * splitmix64 parity. Public so the driver oracle can embed the SAME
    * plane matrix as SQL literals.
    */
  def planeSign(seed: Int, p: Int, d: Int): Double = {
    var z = ((seed.toLong * 1000003L + p) * 1000003L + d) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if (((z >>> 17) & 1L) == 1L) 1.0 else -1.0
  }

  /** Random-hyperplane LSH signature (`nPlanes` sign bits packed into a
    * long) — the declarative reference formulation that DEFINES the
    * signature semantics; the fused [[graft.functions.LshSignaturesExpr]]
    * is asserted bit-identical to it and used on hot paths.
    */
  def lshSignature(vec: Column, dim: Int, nPlanes: Int = 16,
      seed: Int = 0): Column = {
    val bits = (0 until nPlanes).map { p =>
      // plane components are plan-time literals (no per-row hash calls);
      // the projection is a sequential left fold — bit-exactly
      // reproducible as `0 + x1*s1 + x2*s2 + ...` in any engine
      val signs = array((0 until dim).map(d =>
        lit(planeSign(seed, p, d))): _*)
      val proj = aggregate(
        zip_with(vec, signs, (x, h) => x.cast("double") * h),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Per-plane signed projections of `vec` for one band's plane set —
    * the same plan-time literal planes and sequential left fold as
    * [[lshSignature]] (band b of the fused signatures uses seed = b), as
    * array<double> so multi-probe can rank planes by |margin|.
    */
  def lshProjections(vec: Column, dim: Int, nPlanes: Int,
      seed: Int): Column =
    array((0 until nPlanes).map { p =>
      // one array literal per plane (not dim individual lit nodes): the
      // same fold over the same values, but the expression tree is dim x
      // smaller, which is what the per-invocation analysis/optimization
      // of the probe side actually pays for
      val signs = typedLit((0 until dim).map(d => planeSign(seed, p, d)))
      aggregate(
        zip_with(vec, signs, (x, h) => x.cast("double") * h),
        lit(0.0), (acc, x) => acc + x)
    }: _*)

  /** Deduped (query_id, vec_id, vec, qvec) LSH candidate pairs.
    *
    * Data side always emits exactly ONE (band, signature) bucket row per
    * band — at 10^12 vectors the big-table explode must not grow with
    * recall tuning. With `probes` > 0 the (tiny, broadcast) query side
    * additionally probes, per band, the `probes` single-bit-flip buckets
    * with the smallest |projection| margin — the buckets the query was
    * closest to hashing into (Lv et al. multi-probe LSH,
    * https://www.cs.princeton.edu/cass/papers/mplsh_vldb07.pdf) — so
    * recall is bought query-side at zero data-side cost.
    */
  private def lshCandidatePairs(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nPlanes: Int,
      bands: Int,
      probes: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    def banded(df: DataFrame, id: String, idAs: String, vecAs: String) =
      df.select(col(id).as(idAs), col(vecCol).as(vecAs),
        posexplode(call_function("graft_lsh_signatures", col(vecCol),
          lit(dim), lit(nPlanes), lit(bands), lit(0))))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "sig")
    val v = banded(vectors, idCol, "vec_id", "vec")
    val q =
      if (probes <= 0) banded(queries, idCol, "query_id", "qvec")
      else {
        val maxProbes = math.min(probes, nPlanes)
        // exact-bucket sigs come from the SAME fused expression as the
        // data side (fail-loud on a malformed vector, one codegen'd
        // pass); the per-band projection arrays are materialized ONCE
        // in this projection — the margin ranking below references the
        // column instead of re-embedding the nPlanes x dim plane
        // literals per use (CollapseProject keeps non-cheap aliases)
        val base = queries.select(
          col(idCol).as("query_id"), col(vecCol).as("qvec"),
          call_function("graft_lsh_signatures", col(vecCol),
            lit(dim), lit(nPlanes), lit(bands), lit(0)).as("xsigs"),
          array((0 until bands).map(b =>
            lshProjections(col(vecCol), dim, nPlanes, seed = b)): _*)
            .as("projs"))
        val perBand = (0 until bands).map { b =>
          val proj = element_at(col("projs"), b + 1)
          val sig = element_at(col("xsigs"), b + 1)
          // planes ranked by |margin| asc, plane index breaking exact
          // double ties (mask = 1L << p is monotone in p, so ordering by
          // mask == ordering by p) — the DuckDB oracle ranks identically
          val flips = transform(
            slice(
              array_sort(array((0 until nPlanes).map { p =>
                struct(abs(element_at(proj, p + 1)).as("m"),
                  lit(1L << p).as("mask"))
              }: _*)),
              1, maxProbes),
            s => sig.bitwiseXOR(s.getField("mask")))
          struct(lit(b).as("band"), concat(array(sig), flips).as("sigs"))
        }
        base
          .select(col("query_id"), col("qvec"),
            explode(array(perBand: _*)).as("bp"))
          .select(col("query_id"), col("qvec"),
            col("bp.band").as("band"), explode(col("bp.sigs")).as("sig"))
      }
    v.join(broadcast(q), Seq("band", "sig"))
      .where(col("vec_id") =!= col("query_id"))
      // a pair can collide in several bands/probes — dedupe before scoring
      .dropDuplicates("query_id", "vec_id")
  }

  /** Banded LSH ANN: `bands` independent signatures per vector, candidates
    * = vectors sharing at least one (band, signature) bucket with the
    * query (miss probability (1 - p^nPlanes)^bands; a single signature's
    * recall collapses as nPlanes grows). `probes` > 0 additionally probes
    * the lowest-margin single-bit-flip buckets per band, query-side only
    * — see [[lshCandidatePairs]]. Returns same shape as
    * [[bruteForceTopK]]; cost ~ bands x bucket size instead of n.
    */
  def lshTopK(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int = 10,
      nPlanes: Int = 12,
      bands: Int = 4,
      probes: Int = 0): DataFrame = {
    val scored = lshCandidatePairs(vectors, queries, idCol, vecCol, dim,
      nPlanes, bands, probes)
      .withColumn("cos_sim", round(cosine(col("vec"), col("qvec")), 6))
    topKPerQuery(scored, k)
  }

  /** IVF-Flat ANN: a coarse quantizer of `nCentroids` centroid vectors
    * partitions the corpus into inverted lists (each vector assigned to
    * its max-cosine centroid); a query exact-scans only its `nProbe`
    * closest lists. The default quantizer is a deterministic sample
    * (the `nCentroids` lowest-id vectors); pass
    * `centroids = Some(trainCentroids(...))` for the spherical-k-means
    * quantizer — the engine plumbing (materialize the quantizer once,
    * inline it as plan-time literals, narrow shuffle-free assignment
    * over the big table, broadcast probe join) is the identical 100-TB
    * shape either way.
    *
    * Scale path: assignment is a per-row codegen'd expression over
    * plan-time centroid literals — the corpus side never shuffles and
    * carries no per-key window; the probe side is tiny and broadcast;
    * candidate cost ~ n * nProbe / nCentroids per query vs n for brute
    * force. `nProbe == nCentroids` degrades gracefully to exact search
    * (every list scanned), which the spec pins against
    * [[bruteForceTopK]].
    */
  /** The sampled coarse quantizer: the `nCentroids` lowest-id vectors.
    * ONE tiny bounded job (<= nCentroids rows through a limit), like
    * parsing a rule table — not a per-row driver loop.
    */
  private def sampledCentroids(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int): Array[(Long, Seq[Double])] =
    vectors
      .select(col(idCol).cast("long").as("cid"),
        col(vecCol).cast("array<double>").as("cvec"))
      .orderBy("cid").limit(nCentroids)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))

  /** Per-centroid (-(rounded cosine), cid) sorted ascending: element 1
    * is the argmax-cosine centroid; rounding to 6 decimals BEFORE the
    * sort makes cross-engine ties exact, broken by lowest cid — the
    * DuckDB oracle ranks by (round(ccos,6) DESC, cid) identically.
    * 0.0 - x (not unary minus) so a rounded -0.0 collapses to 0.0.
    */
  private def rankedListsCol(cents: Array[(Long, Seq[Double])])(
      vec: Column): Column = array_sort(array(cents.map {
    case (cid, cv) =>
      struct(
        (lit(0.0) - round(cosine(vec, typedLit(cv)), 6)).as("negcos"),
        lit(cid).as("cid"))
  }: _*))

  /** Deterministic distributed spherical k-means for the IVF coarse
    * quantizer. Seeds = the `nCentroids` lowest-id vectors (the same
    * quantizer [[ivfTopK]] defaults to); each Lloyd round is ONE
    * distributed pass: assign every vector to its argmax-cosine
    * centroid via the identical plan-time-literal expression the query
    * path uses (narrow, no explode), then a single groupBy(list) with
    * `dim` codegen'd avg aggregates (partial map-side combine — the
    * shuffle carries nCentroids x (dim+1) partials per task, never
    * rows). New centroid = L2-renormalized per-dimension mean, rounded
    * to 6 decimals (collapses aggregation-order ULP noise, so training
    * is reproducible at round-6 resolution); a list that went empty
    * keeps its previous centroid. Centroid labels stay the seed ids.
    *
    * Scale note: training cost is rounds x one scan. At 100 TB you
    * train on a bounded sample (pass `vectors.limit(...)` /
    * `.sample(...)` — a quantizer only needs the density shape) and
    * hand the result to [[ivfTopK]]'s `centroids` parameter; the serve
    * path stays shuffle-free either way.
    */
  def trainCentroids(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int = 16,
      rounds: Int = 5): Array[(Long, Seq[Double])] = {
    require(nCentroids > 0 && nCentroids <= 4096,
      s"nCentroids $nCentroids out of (0, 4096]")
    require(rounds >= 0 && rounds <= 64, s"rounds $rounds out of [0, 64]")
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    var cents = sampledCentroids(vectors, idCol, vecCol, nCentroids)
    if (cents.isEmpty) return cents
    val dim = cents.head._2.length
    val v = vectors
      .select(col(vecCol).cast("array<double>").as("vec"))
      .where(col("vec").isNotNull && size(col("vec")) === dim)
    var r = 0
    while (r < rounds) {
      val assigned = v.select(
        element_at(rankedListsCol(cents)(col("vec")), 1)
          .getField("cid").as("list_id"),
        col("vec"))
      val aggCols = (0 until dim).map(i =>
        avg(element_at(col("vec"), i + 1)).as(s"d$i"))
      val means: Map[Long, Seq[Double]] = assigned
        .groupBy("list_id").agg(aggCols.head, aggCols.tail: _*)
        .collect()
        .map(row => row.getLong(0) ->
          (0 until dim).map(i => row.getDouble(i + 1)))
        .toMap
      cents = cents.map { case (cid, prev) =>
        cid -> means.get(cid).map { m =>
          val norm = math.sqrt(m.map(x => x * x).sum)
          if (norm == 0.0) prev
          else m.map(x => BigDecimal(x / norm)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.getOrElse(prev)
      }
      r += 1
    }
    cents
  }

  def ivfTopK(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      centroids: Option[Array[(Long, Seq[Double])]] = None): DataFrame = {
    require(nCentroids > 0 && nCentroids <= 4096,
      s"nCentroids $nCentroids out of (0, 4096]")
    require(nProbe > 0 && nProbe <= nCentroids,
      s"nProbe $nProbe out of (0, nCentroids]")
    centroids.foreach(c => require(c.length == nCentroids,
      s"centroids.length ${c.length} != nCentroids $nCentroids"))
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val cents: Array[(Long, Seq[Double])] = centroids.getOrElse(
      sampledCentroids(vectors, idCol, vecCol, nCentroids))
    def rankedLists(vec: Column): Column = rankedListsCol(cents)(vec)
    val v = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
      element_at(rankedLists(col(vecCol)), 1).getField("cid").as("list_id"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qvec"),
      explode(transform(
        slice(rankedLists(col(vecCol)), 1, nProbe),
        s => s.getField("cid"))).as("list_id"))
    // each corpus vector lives in exactly one list and a query probes
    // distinct lists, so pairs are already unique — no dedupe needed
    val scored = v.join(broadcast(q), Seq("list_id"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", round(cosine(col("vec"), col("qvec")), 6))
    topKPerQuery(scored, k)
  }

  /** Number of (query, vector) candidates IVF would exact-score — the
    * cost side of the recall/cost curve, comparable with
    * [[lshCandidateCount]].
    */
  def ivfCandidateCount(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      centroids: Option[Array[(Long, Seq[Double])]] = None): Long = {
    // k = 1 keeps the same candidate join; count BEFORE top-k by
    // rebuilding the scored side via a max-k run is wasteful, so this
    // recomputes the join shape with a count aggregate only
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val cents: Array[(Long, Seq[Double])] = centroids.getOrElse(
      sampledCentroids(vectors, idCol, vecCol, nCentroids))
    def rankedLists(vec: Column): Column = rankedListsCol(cents)(vec)
    val v = vectors.select(col(idCol).as("vec_id"),
      element_at(rankedLists(col(vecCol)), 1).getField("cid").as("list_id"))
    val q = queries.select(col(idCol).as("query_id"),
      explode(transform(
        slice(rankedLists(col(vecCol)), 1, nProbe),
        s => s.getField("cid"))).as("list_id"))
    v.join(broadcast(q), Seq("list_id"))
      .where(col("vec_id") =!= col("query_id"))
      .count()
  }

  /** Number of distinct (query, vector) candidates the banded LSH would
    * score — the cost side of the recall/cost tradeoff the RecallBench
    * puts on the measured record.
    */
  def lshCandidateCount(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nPlanes: Int = 12,
      bands: Int = 4,
      probes: Int = 0): Long =
    lshCandidatePairs(vectors, queries, idCol, vecCol, dim,
      nPlanes, bands, probes)
      .select("query_id", "vec_id").count()
}
