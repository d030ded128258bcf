package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Deterministic two-micro-batch MemoryStream runs of the streaming ops,
  * shaped as driver contract queries (`SparkEntry.queries` entries) so the
  * stateful streaming machinery gets the same independent-oracle
  * correctness gate as every batch operator.
  *
  * Determinism rules the fixtures obey:
  *  - no two documents in the SAME micro-batch are exact- or near-dups of
  *    each other (within-batch arrival order inside a state group is not
  *    defined, so only cross-batch links are deterministic);
  *  - every duplicate/variant arrives in batch 2, its original in batch 1,
  *    so "first seen wins" has exactly one right answer;
  *  - per-pair multi-emissions (one link per shared band / blocking key —
  *    documented at-least-once semantics) are collapsed AFTER collection
  *    with a batch dropDuplicates, which is the documented consumer
  *    pattern.
  */
object StreamingDriverQueries {

  /** Batch-1 documents: mutually unrelated. */
  val docsBatch1: Seq[(Long, String)] = Seq(
    1L -> ("the quick brown fox jumps over the lazy dog and runs far away " +
      "into the deep green forest while nobody watches it"),
    2L -> ("distributed query engines shuffle large partitioned datasets " +
      "across many executor nodes and spill intermediate results to local " +
      "disk when memory fills"),
    3L -> "a completely standalone short note about nothing in particular")

  /** Batch-2 documents: 4 is a formatting variant of 1 (same fingerprint
    * AND identical token stream, so it is both an exact dup and an
    * est-Jaccard-1.0 near-dup); 5 is a one-word edit of 2 (near-dup only);
    * 6 is fresh.
    */
  val docsBatch2: Seq[(Long, String)] = Seq(
    4L -> ("  The   QUICK brown fox jumps over the lazy dog and runs far " +
      "away into the deep green forest while nobody watches it "),
    5L -> ("distributed query engines shuffle large partitioned datasets " +
      "across many executor machines and spill intermediate results to " +
      "local disk when memory fills"),
    6L -> "fresh unrelated content mentioning entirely new things altogether")

  /** Batch-1 token events for streaming linkage. */
  val tokensBatch1: Seq[(Long, String)] = Seq(
    100L -> "smith", 200L -> "jones")

  /** Batch-2 token events: smyth co-blocks and cluster-matches smith
    * (Metaphone equality); wilson matches nothing.
    */
  val tokensBatch2: Seq[(Long, String)] = Seq(
    300L -> "smyth", 400L -> "wilson")

  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger()

  /** Drive `build`'s streaming output through a memory sink for exactly
    * two micro-batches and return the sink rows as a local DataFrame (the
    * results are tiny by construction). The sink table is dropped before
    * returning so repeat invocations (bench warm + timed runs) never
    * collide.
    */
  private def runTwoBatches(
      spark: SparkSession,
      idCol: String,
      strCol: String,
      b1: Seq[(Long, String)],
      b2: Seq[(Long, String)])(
      build: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val name = s"graft_stream_q_${nameCounter.incrementAndGet()}"
    val out = build(input.toDS().toDF(idCol, strCol))
    // a six-row fixture does not need 32 state-store partitions — every
    // stateful-op partition costs a task + a store commit PER MICRO-BATCH,
    // which at the session default dominated the query's wall time ~8x.
    // (Real deployments size this to their ingest rate; the semantics
    // under test are partition-count independent.)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    // the override is restored only after the query is fully stopped (the
    // stream captures the setting during micro-batch planning, which runs
    // asynchronously after start()) — and on EVERY exit path, including
    // start() itself throwing, so a failed streaming query can never leak
    // partitions=2 into the rest of the session
    try {
      val query = out.writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try {
        input.addData(b1: _*)
        query.processAllAvailable()
        input.addData(b2: _*)
        query.processAllAvailable()
        val table = spark.table(name)
        val rows: Seq[Row] = table.collect().toSeq
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), table.schema)
      } finally {
        query.stop()
        spark.catalog.dropTempView(name)
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  /** Streaming exact dedup over the two batches: survivors =
    * first-arrival per fingerprint (doc 4 dropped).
    */
  def dedup(spark: SparkSession): DataFrame =
    runTwoBatches(spark, "doc_id", "text", docsBatch1, docsBatch2)(
      StreamingDedup.dedupe(_))

  /** Streaming MinHash near-dup links over the two batches, collapsed to
    * one row per pair (max est across band emissions — the ests are
    * identical, max is just the canonical collapse).
    */
  def nearDup(spark: SparkSession): DataFrame = {
    val links = runTwoBatches(
      spark, "doc_id", "text", docsBatch1, docsBatch2)(
      StreamingDedup.nearDupCandidates(_).toDF())
    links.groupBy("id_a", "id_b")
      .agg(org.apache.spark.sql.functions.max("est_jaccard")
        .as("est_jaccard"))
  }

  /** Streaming linkage edges over the two token batches, collapsed to
    * distinct (src, dst) pairs (one edge per shared blocking key
    * otherwise).
    */
  def linkage(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val edges = runTwoBatches(
      spark, "file_id", "token", tokensBatch1, tokensBatch2)(df =>
      StreamingLinkage.edges(spark, df.as[TokenEvent]).toDF())
    edges.select("src", "dst").dropDuplicates("src", "dst")
  }

  /** Driver-side recompute of the expected linkage edges from the SAME
    * scalar single-sources-of-truth the batch pipeline uses
    * ([[graft.pipeline.Blocking.scalarBlockKeys]] intersect +
    * [[graft.pipeline.Scoring.clusterMatch]]), restricted to cross-batch
    * pairs — the determinism pin for the stateful streaming path.
    */
  def expectedLinkageEdges: Seq[(Long, Long)] =
    for {
      (idA, tokA) <- tokensBatch1
      (idB, tokB) <- tokensBatch2
      if graft.pipeline.Blocking.scalarBlockKeys(tokA)
        .intersect(graft.pipeline.Blocking.scalarBlockKeys(tokB)).nonEmpty
      if graft.pipeline.Scoring.clusterMatch(tokA, tokB)
    } yield (math.min(idA, idB), math.max(idA, idB))
}
