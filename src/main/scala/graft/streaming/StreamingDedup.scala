package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Streaming exact deduplication for document ingest: the batch
  * fingerprint (md5 of whitespace-collapsed lowercased text — same column
  * as [[TextAnalysis.fingerprintCol]], so batch and stream agree on what
  * a duplicate is) plus `dropDuplicatesWithinWatermark`, which keeps
  * fingerprint state only for the watermark window. State is therefore
  * bounded by ingest rate x `ttlSeconds`, not by the all-time distinct
  * count — the property that lets the dedup stream run for months.
  *
  * Documented tradeoff (same as the batch/stream split in
  * [[StreamingLinkage]]): a duplicate arriving more than `ttlSeconds`
  * after its original passes through; catching it is the batch exact-dedup
  * pass over the archived table.
  */
object StreamingDedup {

  /** events(doc_id, text) -> first-seen rows only, duplicates within the
    * watermark window dropped. Output schema equals the input schema: the
    * internal fingerprint and ingest-timestamp columns are both dropped.
    */
  def dedupe(events: DataFrame, ttlSeconds: Long = 3600L): DataFrame =
    events
      .withColumn("fp", TextAnalysis.fingerprintCol(col("text")))
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", s"$ttlSeconds seconds")
      .dropDuplicatesWithinWatermark("fp")
      .drop("ingest_ts", "fp")
}
