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
    * in double, sequential sum — deterministic).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(
      transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    when(na === 0 || nb === 0, 0.0).otherwise(dot / (na * nb))
  }

  /** Brute-force top-k cosine neighbors for each query vector.
    *
    * @param vectors (idCol, vecCol) table to search
    * @param queries (idCol, vecCol) query set — must be small (broadcast)
    * @return (query_id, vec_id, cos_sim, rank), rank 1..k per query
    */
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

  def bruteForceTopK(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10): DataFrame = {
    val v = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = v
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", round(cosine(col("vec"), col("qvec")), 6))
    topKPerQuery(scored, k)
  }

  /** Random-hyperplane LSH signature (`nPlanes` sign bits packed into a
    * long). Hyperplane components are deterministic pseudo-random values
    * derived from (plane, dimension) via xxhash64 — no external state, so
    * executors agree without a broadcast.
    */
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

  /** LSH-bucketed ANN: search only vectors whose signature matches the
    * query's. Returns same shape as [[bruteForceTopK]]; recall < 1 by
    * construction, cost ~ bucket size instead of n.
    */
  def lshTopK(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int = 10,
      nPlanes: Int = 12): DataFrame = {
    val v = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
      lshSignature(col(vecCol), dim, nPlanes).as("sig"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      lshSignature(col(vecCol), dim, nPlanes).as("sig"))
    val scored = v
      .join(broadcast(q), Seq("sig"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", round(cosine(col("vec"), col("qvec")), 6))
    topKPerQuery(scored, k)
  }
}
