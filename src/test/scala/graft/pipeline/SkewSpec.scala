package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSessionTestWrapper

/** Behavioral pin of the skew defuses on a deliberately hot-keyed input
  * (20% of files share one name — [[RepoFiles.generateSkewed]]). The plan
  * shape (groupBy cap + broadcast anti-join) is pinned in PlanQualitySpec;
  * this asserts what the defuses DO. The wall-clock claim at scale is
  * measured by ScalingBench's `skew` mode.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  private val n = 4000L

  test("pruneCommon removes the hot token before blocking ever sees it") {
    val skewed = RepoFiles.generateSkewed(spark, n, 42L, hotEveryK = 5)
    val tokens = Tokenizer.pruneCommon(
      Tokenizer.tokenize(skewed), knownFileCount = n)
    // the hot name rides 20% of files — far past the 5% document-frequency
    // cap, so the Zipf-head prune (first defuse layer) drops it entirely
    assert(tokens.where(col("token") === RepoFiles.HotName.toLowerCase)
      .isEmpty)
  }

  test("oversized blocks split into salted segments; pair volume stays linear") {
    val skewed = RepoFiles.generateSkewed(spark, n, 42L, hotEveryK = 5)
    // blocking WITHOUT pruneCommon, so the hot token reaches the pairing
    // stage and only the split tier (second defuse layer) stands between
    // it and an 800-row hot block in every one of its keys
    val keys = Blocking.blockingKeys(
      skewed.select(col("file_id"), col("path"), col("content"))
        .transform(Tokenizer.tokenize(_)))
    val keyRows = keys.count()
    val window = 3
    val pairs = Blocking.candidatePairs(keys, maxBlockSize = 500,
      window = window).select("src", "dst")
    // the hot name's 800-row blocks split into ceil(800/500)=2 segments —
    // hot files now DO pair (the pre-round-5 wholesale drop lost every
    // candidate pair of a legitimately common name)...
    val hotTouching = pairs
      .where(col("src") % 5 === 0 || col("dst") % 5 === 0)
      .count()
    assert(hotTouching > 0, "split hot blocks must still produce pairs")
    // ...but volume stays bounded: sorted-neighborhood emits at most
    // `window` pairs per key row regardless of block size
    val skewedPairs = pairs.count()
    assert(skewedPairs <= keyRows * window,
      s"pair volume $skewedPairs exceeds rows x window = ${keyRows * window}")
  }

  test("true pairs inside a >cap block are still found after the split") {
    import spark.implicits._
    // one 600-row block, cap 100 -> 6 salted segments; sorted-neighborhood
    // pairs consecutive (by file_id) rows WITHIN each segment
    val nRows = 600
    val cap = 100
    val keys = (0 until nRows).map(i => (i.toLong, f"tok$i%04d", "sx:TEST"))
      .toDF("file_id", "token", "key")
    val nSeg = (nRows + cap - 1) / cap
    // recover the segmentation the split applies (same deterministic
    // xxhash64), pick one segment and a consecutive id pair inside it:
    // that true pair MUST survive the split
    val segOf = keys
      .select(col("file_id"),
        pmod(xxhash64(col("file_id")), lit(nSeg.toLong)).as("seg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seg0 = segOf.filter(_._2 == segOf(0L))
      .keys.toSeq.sorted.take(2)
    assert(seg0.length == 2)
    val pairs = Blocking
      .candidatePairs(keys, maxBlockSize = cap, window = 3)
      .select("src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((seg0.head, seg0(1))),
      s"adjacent in-segment pair $seg0 lost by the split (got ${pairs.size} pairs)")
    // and the degenerate tier still kills boilerplate wholesale
    val degenerate = Blocking.candidatePairs(keys, maxBlockSize = cap,
      window = 3, degenerateBlockSize = 200)
    assert(degenerate.isEmpty,
      "a block past degenerateBlockSize must be dropped")
  }
}
