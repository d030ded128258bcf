package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSessionTestWrapper

/** Streaming exact dedup: duplicates within and across micro-batches are
  * dropped; formatting variants collapse to one row (same fingerprint as
  * the batch op).
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  test("duplicates within and across micro-batches are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val events = input.toDS().toDF("doc_id", "text")
    val deduped = StreamingDedup.dedupe(events)
    // internal fp / ingest_ts columns must not leak into the output
    assert(deduped.schema.fieldNames.toSeq == events.schema.fieldNames.toSeq)
    val query = deduped.writeStream
      .format("memory")
      .queryName("stream_dedup")
      .outputMode("append")
      .start()
    try {
      input.addData(
        (1L, "Hello world  foo"),
        (2L, "hello   world foo"), // formatting variant of 1
        (3L, "something else"))
      query.processAllAvailable()
      val afterBatch1 = spark.table("stream_dedup")
        .collect().map(_.getLong(0)).toSet
      assert(afterBatch1.size == 2)
      assert(afterBatch1.contains(3L))
      assert(afterBatch1.intersect(Set(1L, 2L)).size == 1)

      // batch 2: cross-batch duplicate of doc 3 + a new doc
      input.addData((4L, "  Something ELSE "), (5L, "fresh content"))
      query.processAllAvailable()
      val afterBatch2 = spark.table("stream_dedup")
        .collect().map(_.getLong(0)).toSet
      assert(!afterBatch2.contains(4L), afterBatch2.mkString(","))
      assert(afterBatch2.contains(5L))

      // state is keyed by fingerprint and bounded by the watermark window
      assert(query.lastProgress.stateOperators.nonEmpty)
    } finally query.stop()
  }
}
