package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSessionTestWrapper

/** The ground-truth generator relies on driver-side scalar mirrors of the
  * Spark-side blocking and edge criteria ([[Blocking.scalarBlockKeys]],
  * [[Scoring.clusterMatch]]). These parity tests pin mirror == Spark for
  * every fixture token/pair, so a drift (e.g. an encoder added to
  * blockingKeys but not the mirror) fails here instead of silently bending
  * the end-to-end oracle toward a broken pipeline.
  */
class MirrorParitySpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  test("scalarBlockKeys == Spark blockingKeys for every fixture token") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val tokens = NameFixtures.families.flatten.distinct ++
      NameFixtures.negatives.flatMap(p => Seq(p._1, p._2))
    val df = tokens.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("file_id", "token")
    val sparkKeys = Blocking.blockingKeys(df)
      .groupBy("token").agg(collect_set("key").as("keys"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet)
      .toMap
    val failures = tokens.distinct.flatMap { t =>
      val mirror = Blocking.scalarBlockKeys(t)
      val viaSpark = sparkKeys.getOrElse(t, Set.empty)
      if (mirror != viaSpark)
        Some(s"$t: mirror-only=${mirror -- viaSpark} spark-only=${viaSpark -- mirror}")
      else None
    }
    assert(failures.isEmpty, failures.take(5).mkString("\n"))
  }

  test("clusterMatch == the Spark edges predicate for every labeled pair") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val pairs = (NameFixtures.mraPositives ++ NameFixtures.negatives ++
      NameFixtures.metaphoneClasses.flatMap(c => c.zip(c.tail)) ++
      // cross-family pairs that must NOT match
      NameFixtures.families.take(10).map(_.head).combinations(2)
        .map(p => (p(0), p(1))).toSeq).distinct
    val df = pairs.zipWithIndex
      .map { case ((a, b), i) => (i.toLong * 2, i.toLong * 2 + 1, a, b) }
      .toDF("src", "dst", "token_a", "token_b")
    val sparkEdges = Scoring.edges(Scoring.score(df))
      .select("src").collect().map(_.getLong(0)).toSet
    val failures = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val mirror = Scoring.clusterMatch(a, b)
      val viaSpark = sparkEdges.contains(i.toLong * 2)
      if (mirror != viaSpark)
        Some(s"($a, $b): mirror=$mirror spark=$viaSpark") else None
    }
    assert(failures.isEmpty, failures.take(5).mkString("\n"))
  }

  test("clusterMatchCoded with cached codes == clusterMatch on every fixture pair") {
    import graft.phonetic.{MatchRatingApproach, Metaphone}
    val names = (NameFixtures.families.flatten ++
      NameFixtures.mraPositives.flatMap(p => Seq(p._1, p._2)) ++
      NameFixtures.negatives.flatMap(p => Seq(p._1, p._2)) ++
      Seq("", " ", "a", "é", "smith")).distinct
    // cached-code form (what the streaming state stores) must decide
    // exactly like the encode-per-call form for every fixture pair
    val coded = names.map(n =>
      (n, Metaphone.unbounded.encode(n), MatchRatingApproach.encode(n)))
    for ((a, am, ar) <- coded; (b, bm, br) <- coded) {
      assert(Scoring.clusterMatchCoded(a, am, ar, b, bm, br) ==
        Scoring.clusterMatch(a, b), s"($a, $b)")
    }
  }

  test("synthetic entities: variants code-equal within, metaphone-distinct across") {
    import graft.phonetic.{Metaphone, Soundex}
    val bases = (41L until 241L).map(RepoFiles.synthBase)
    // within an entity: every perturbation kind keeps Soundex AND
    // unbounded Metaphone codes identical (the co-blocking +
    // cluster-match contract of the scale generator)
    bases.foreach { b =>
      Seq(0L, 0x4L, 0x8L, 0xCL, 0x55554L, 0x123456789CL, -1L).foreach { h =>
        val v = RepoFiles.synthVariant(b, h)
        assert(Soundex.default.encode(v) == Soundex.default.encode(b),
          s"soundex($b -> $v)")
        assert(Metaphone.unbounded.encode(v) == Metaphone.unbounded.encode(b),
          s"metaphone($b -> $v)")
        assert(!Tokenizer.StopWords.contains(v), v)
      }
    }
    // across entities: base names are metaphone-distinct BY CONSTRUCTION
    // (bijective consonant-digit code) — checked over a 50k-entity span
    // and across the 6->8-digit tier boundary, where the earlier hashed
    // code space had ~900 birthday collisions
    val wide = ((41L until 50041L) ++
      (531400L until 531500L)).map(RepoFiles.synthBase)
    val wideCodes = wide.map(Metaphone.unbounded.encode)
    assert(wideCodes.distinct.size == wideCodes.size,
      "cross-entity metaphone collision in synthBase")
  }
}
