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

  test("block cap: hot blocks die before pairing; hot files pair with nobody") {
    val skewed = RepoFiles.generateSkewed(spark, n, 42L, hotEveryK = 5)
    // blocking WITHOUT pruneCommon, so the hot token reaches the pairing
    // stage and only the maxBlockSize cap (second defuse layer) stands
    // between it and an 800-row hot block in every one of its keys
    val keys = Blocking.blockingKeys(
      skewed.select(col("file_id"), col("path"), col("content"))
        .transform(Tokenizer.tokenize(_)))
    val pairs = Blocking.candidatePairs(keys, maxBlockSize = 500, window = 3)
      .select("src", "dst")
    // every token a hot file carries (the hot name + generator
    // boilerplate) has document frequency >= 800 > 500, so all its blocks
    // are dropped and no candidate pair touches a hot file
    val hotTouching = pairs
      .where(col("src") % 5 === 0 || col("dst") % 5 === 0)
      .count()
    assert(hotTouching == 0, s"$hotTouching pairs touch hot files")
    // and the cap keeps total pair volume at-or-below the uniform input's
    val uniformPairs = Blocking.candidatePairs(
      Blocking.blockingKeys(
        RepoFiles.generate(spark, n, 42L)
          .select(col("file_id"), col("path"), col("content"))
          .transform(Tokenizer.tokenize(_))),
      maxBlockSize = 500, window = 3).count()
    val skewedPairs = pairs.count()
    assert(skewedPairs <= uniformPairs,
      s"skewed input produced MORE pairs ($skewedPairs > $uniformPairs)")
  }
}
