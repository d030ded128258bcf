package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSessionTestWrapper

/** Corpus-trained BPE: merge determinism (distributed counting path ==
  * pure scalar path, tie-break pinned), encoder correctness, and the
  * codegen'd expression path.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  test("classic BPE hand example: frequent pairs merge in frequency order") {
    // 5x "low", 2x "lower": ('l','o') and ('lo','w') dominate
    val wf = Seq(("low", 5L), ("lower", 2L))
    val merges = Bpe.train(wf, 4)
    assert(merges.take(2) == Vector(("l", "o"), ("lo", "w")), merges)
    val ranks = Bpe.parseMerges(Bpe.mergesAsString(merges))
    val low = Bpe.encodeWord("low", ranks)
    // after 4 merges "low</w>" is a single learned token
    assert(low.length <= 2, low)
    // tokens always reassemble the word + sentinel exactly
    assert(low.mkString == "low" + Bpe.EndOfWord)
    assert(Bpe.encodeWord("lower", ranks).mkString ==
      "lower" + Bpe.EndOfWord)
    // unseen word: falls back to smaller learned units, still lossless
    assert(Bpe.encodeWord("slow", ranks).mkString == "slow" + Bpe.EndOfWord)
  }

  test("count ties break lexicographically (retrain is byte-identical)") {
    // "ab" and "cd" both appear exactly 3 times -> ('a','b') wins on lex
    val wf = Seq(("ab", 3L), ("cd", 3L))
    val m1 = Bpe.train(wf, 1)
    assert(m1 == Vector(("a", "b")), m1)
    // full retrain determinism on a larger corpus
    val wf2 = Bpe.pureWordFrequencies(Bpe.demoCorpus.map(_._2))
    assert(Bpe.train(wf2, 50) == Bpe.train(wf2, 50))
  }

  test("singleton pairs stop training (no signal merges)") {
    val merges = Bpe.train(Seq(("xyz", 1L)), 10)
    assert(merges.isEmpty, s"pairs seen once must not merge: $merges")
  }

  test("distributed word-freq + train == pure scalar train, bit-for-bit") {
    import spark.implicits._
    val docs = Bpe.demoCorpus.toDF("doc_id", "text")
    val distributed = Bpe.trainFromCorpus(docs, "text", numMerges = 200)
    val pure = Bpe.train(
      Bpe.pureWordFrequencies(Bpe.demoCorpus.map(_._2)), 200)
    assert(distributed == pure,
      s"paths diverge at ${distributed.zip(pure).indexWhere(p => p._1 != p._2)}")
    assert(distributed.nonEmpty)
  }

  test("expression path equals pure encode/count; stays codegen'd, no UDF") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // RDD-backed (not a LocalRelation, which ConvertToLocalRelation would
    // fold driver-side) so the assertion sees the real distributed plan
    val docs = spark.sparkContext.parallelize(Bpe.demoCorpus, 2)
      .toDF("doc_id", "text")
    val merges = Bpe.mergesAsString(
      Bpe.trainFromCorpus(docs, "text", numMerges = 200))
    val ranks = Bpe.parseMerges(merges)
    val got = docs.select(col("doc_id"),
      call_function("graft_bpe_count", col("text"), lit(merges)).as("n"),
      call_function("graft_bpe_encode", col("text"), lit(merges)).as("toks"))
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project [") && !p.contains("ScalaUDF"), p)
    got.collect().foreach { r =>
      val text = Bpe.demoCorpus.toMap.apply(r.getLong(0))
      val expected = Bpe.encode(text, ranks)
      assert(r.getInt(1) == expected.length, s"doc ${r.getLong(0)}")
      assert(r.getSeq[String](2) == expected, s"doc ${r.getLong(0)}")
    }
  }
}
