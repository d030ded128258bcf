package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSessionTestWrapper

/** Streaming incremental linkage: records arriving in different
  * micro-batches still co-block and link (state carries the block across
  * batches).
  */
class StreamingLinkageSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  test("driver fixture: library recompute agrees with the static oracle") {
    // the q_streaming_linkage oracle is a STATIC reference-derived list
    // ((100,300): smith/smyth share Metaphone "SM0" in-window; smythe is
    // TTL-expired, smithe is late); the library's own scalar
    // blockKeys+clusterMatch+time-rules recompute over the fixture must
    // agree, so a fixture or criterion change that would silently
    // invalidate the oracle fails here first
    assert(StreamingDriverQueries.expectedLinkageEdges == Seq((100L, 300L)))
  }

  test("driver fixture end-to-end: TTL-expired block and late row emit nothing") {
    // the full 4-batch event-time fixture: smyth@1050 links smith@1000
    // (in-window); smythe@2050 does NOT (the t=2000 sentinel advanced the
    // watermark past the block's TTL, and the read-time check must hold
    // even though smythe's data lands in the same batch the timeout would
    // fire in); smithe@1500 is below the 2050 watermark (late) — nothing
    val got = StreamingDriverQueries.linkage(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 300L)), got.toSeq.sorted.mkString(","))
  }

  test("cross-micro-batch matches are emitted from block state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[TokenEvent]
    val edges = StreamingLinkage.edges(spark, input.toDS())
    val query = edges.writeStream
      .format("memory")
      .queryName("stream_edges")
      .outputMode("append")
      .start()
    try {
      // batch 1: smith + an unrelated name
      input.addData(TokenEvent(1L, "smith"), TokenEvent(2L, "alessandro"))
      query.processAllAvailable()
      val afterBatch1 = spark.table("stream_edges").collect()
      assert(afterBatch1.isEmpty, afterBatch1.mkString(","))

      // batch 2: smyth arrives later and must link to batch-1 smith
      input.addData(TokenEvent(3L, "smyth"))
      query.processAllAvailable()
      val pairs = spark.table("stream_edges").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 3L)), pairs.mkString(","))
      assert(!pairs.exists { case (a, b) => a == 2L || b == 2L })
    } finally query.stop()
  }

  test("idle block state is evicted by the watermark-driven TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[TokenEvent]
    val edges = StreamingLinkage.edges(spark, input.toDS(),
      stateTtl = java.time.Duration.ofMillis(1))
    val query = edges.writeStream
      .format("memory")
      .queryName("stream_edges_ttl")
      .outputMode("append")
      .start()
    try {
      input.addData(TokenEvent(1L, "smith"), TokenEvent(2L, "alessandro"))
      query.processAllAvailable()
      val stateAfter1 = query.lastProgress.stateOperators(0).numRowsTotal
      assert(stateAfter1 > 0, "batch 1 must create block state")

      // let the TTL lapse, then process another batch: the timeout pass
      // must evict every idle block from batch 1
      Thread.sleep(50)
      input.addData(TokenEvent(9L, "zzyzx"))
      query.processAllAvailable()
      // one more empty-ish tick so timeout eviction from the previous
      // batch is reflected in state metrics
      input.addData(TokenEvent(10L, "qqqq"))
      query.processAllAvailable()
      val stateAfterTtl = query.lastProgress.stateOperators(0).numRowsTotal
      assert(stateAfterTtl < stateAfter1,
        s"state must shrink after TTL eviction: $stateAfter1 -> $stateAfterTtl")

      // and a smith arriving after eviction does NOT link to the evicted 1L
      input.addData(TokenEvent(11L, "smyth"))
      query.processAllAvailable()
      val pairs = spark.table("stream_edges_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!pairs.contains((1L, 11L)), pairs.mkString(","))
    } finally query.stop()
  }
}
