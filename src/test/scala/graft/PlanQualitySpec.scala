package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the properties that make these queries viable
  * at 100 TB (predicate pushdown into the parquet scan, column pruning,
  * broadcast of small sides, whole-stage codegen around the phonetic
  * expressions) are checked here so a regression in plan shape fails CI,
  * not a cluster run.
  */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters push down to the parquet scan; columns prune") {
    val df = SparkEntry.queries("q_filter_project")(spark, sfDir)
    val p = plan(df)
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThan(l_quantity"), p)
    // projection of 3 columns + 2 filter columns; the 16-column lineitem
    // scan must not read more than those
    assert(p.contains("ReadSchema"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipdate"),
      readSchema)
  }

  test("dimension join broadcasts the small side") {
    val df = SparkEntry.queries("q_join_agg")(spark, sfDir)
    // AQE decides at runtime — force execution, then check the final plan
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("ANN brute force broadcasts the query set") {
    val df = SparkEntry.queries("q_ann_brute")(spark, sfDir)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("ANN IVF: corpus side has no exchange before the probe join") {
    val df = SparkEntry.queries("q_ann_ivf")(spark, sfDir)
    val p = plan(df)
    // the probe side broadcasts; the corpus side's list assignment is a
    // plan-time-literal expression, so the only Exchanges allowed are
    // the broadcast itself and the post-join top-k hash partitionings —
    // never a corpus-wide shuffle BEFORE candidates are pruned
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    val preJoin = p.substring(p.indexOf("BroadcastHashJoin") match {
      case -1 => p.indexOf("BroadcastExchange")
      case i => i
    })
    // everything below the join in the tree is the corpus scan branch +
    // broadcast branch: no shuffle Exchange may appear there
    assert(!preJoin.contains("Exchange hashpartitioning"), preJoin)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("phonetic expressions sit inside whole-stage codegen, no ScalaUDF") {
    graft.functions.GraftFunctions.register(spark)
    val df = spark.range(10)
      .select(concat(lit("name"), col("id")).as("name"))
      .select(
        call_function("graft_soundex", col("name")),
        call_function("graft_metaphone", col("name")),
        call_function("graft_beider_morse", col("name")))
    val p = plan(df)
    // '*(n)' is the executedPlan marker for a WholeStageCodegen stage
    assert(p.contains("*(1) Project [graft_soundex"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("driver contract: entry() produces clusters") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum === 500L) // all files clustered
  }

  test("blocking key generation is a single projection pipeline (no shuffle before explode)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val tokens = Seq((1L, "washington")).toDF("file_id", "token")
    val p = plan(graft.pipeline.Blocking.blockingKeys(tokens))
    assert(!p.contains("Exchange"), p)
  }

  test("block sizing uses aggregate + broadcast join, not a per-key window") {
    import spark.implicits._
    val keys = Seq((1L, "a", "sx:X100"), (2L, "b", "sx:X100"))
      .toDF("file_id", "token", "key")
    val df = graft.pipeline.Blocking.candidatePairs(keys)
    val p = plan(df)
    // exactly one Window (the sorted-neighborhood lead()) — the size
    // tiers must NOT add a count-over-partitionBy(key) window that
    // single-tasks each hot block
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows == 1, s"expected 1 window (sorted-neighborhood), got $windows\n$p")
    // the oversized-key side (tiny by construction) broadcasts; the full
    // key table is never shuffled for the sizing join
    assert(p.contains("Broadcast"), p)
  }

  test("degenerate hot block is dropped; oversized blocks split and keep pairing") {
    import spark.implicits._
    val hot = (0 until 300).map(i => (1000L + i, s"tok$i", "cv:111111"))
    val normal = Seq((1L, "smith", "sx:S530"), (2L, "smyth", "sx:S530"))
    val keys = (hot ++ normal).toDF("file_id", "token", "key")
    // degenerate tier: 300 rows > degenerateBlockSize=150 -> the hot
    // block dies wholesale, only the normal pair survives
    val dropped = graft.pipeline.Blocking
      .candidatePairs(keys, maxBlockSize = 100, degenerateBlockSize = 150)
      .collect()
    assert(dropped.length == 1)
    assert(dropped.head.getLong(0) == 1L && dropped.head.getLong(1) == 2L)
    // split tier: with the default degenerate threshold the same block is
    // salted into ceil(300/100)=3 segments — pairs ARE produced (a
    // legitimately common key no longer loses all recall) but volume
    // stays <= rows x window
    val split = graft.pipeline.Blocking
      .candidatePairs(keys, maxBlockSize = 100)
    val hotPairs = split
      .where(col("src") >= 1000L || col("dst") >= 1000L).count()
    assert(hotPairs > 0, "split block must still produce candidate pairs")
    assert(hotPairs <= 300L * 3,
      s"split block pair volume must stay O(rows x window), got $hotPairs")
  }

  test("ngram-jaccard joins on (lang, id-bucket), not lang alone") {
    val p = plan(SparkEntry.queries("q_ngram_jaccard")(spark, sfDir))
    // equi-join nodes print as 'XJoin [leftKeys], [rightKeys], type, ...';
    // the plan may sit under an AdaptiveSparkPlan wrapper, so match the
    // string form. The equi-key must include the id bucket (cardinality
    // ~ n/6), so the 5-value lang key alone never drives pair enumeration.
    val joinLines = p.linesIterator.filter(l =>
      l.contains("SortMergeJoin [") || l.contains("ShuffledHashJoin [") ||
        l.contains("BroadcastHashJoin [")).toSeq
    assert(joinLines.nonEmpty, p)
    assert(joinLines.forall(l => l.contains("lang#") && l.contains("bucket#")),
      joinLines.mkString("\n"))
  }

  test("dedup ops have no per-key windows (skew-safe shapes)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val pExact = plan(graft.ops.Dedup.exact(docs, "doc_id", "text"))
    assert(!pExact.contains("Window ["), pExact)
    val pMinhash = plan(graft.ops.Dedup.minhashCandidates(
      docs, "doc_id", "text", numHashes = 16, bands = 4))
    assert(!pMinhash.contains("Window ["),
      pMinhash)
    val vecs = Seq((1L, Seq(1.0f, 0.5f)), (2L, Seq(0.9f, 0.6f)))
      .toDF("vec_id", "embedding")
    val pEmb = plan(graft.ops.Dedup.embeddingNearDups(
      vecs, "vec_id", "embedding", dim = 2, nPlanes = 2, bands = 2))
    assert(!pEmb.contains("Window ["), pEmb)
  }
}
