package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.TextAnalysis

/** A band bucket's remembered member: doc id + full MinHash signature, so
  * an arrival's estimated Jaccard against it needs no re-tokenization.
  * `lastTs` is the bucket's newest event time — checked against the
  * watermark at READ time, so members past the TTL can never link even
  * when the state-store timeout has not fired yet (a group receiving
  * data in the same micro-batch its timeout would fire in is delivered
  * WITH its stale state — the read-time check closes that race).
  */
final case class BucketMember(doc_id: Long, sig: Seq[Long])
final case class BucketState(members: Seq[BucketMember], lastTs: Long)

/** Near-duplicate candidate link between a new arrival and an earlier doc
  * sharing at least one MinHash band bucket. May be emitted once per
  * shared band (at-least-once per pair); downstream consumers dedupe on
  * (id_a, id_b) if exactly-once pairs matter.
  */
final case class NearDupLink(id_a: Long, id_b: Long, est_jaccard: Double)

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
    *
    * @param eventTimeCol when set, that input column (castable to
    *   timestamp) is the event time the watermark advances on — the
    *   production shape, where late/out-of-order data is defined by the
    *   source's clock. Late rows (event time below the watermark) are
    *   dropped by the engine; duplicates arriving after the TTL pass
    *   through (their state was evicted) — both are the documented
    *   batch-pass-catches-it tradeoff. Defaults to processing-time
    *   stamping for sources with no event-time column.
    */
  def dedupe(
      events: DataFrame,
      ttlSeconds: Long = 3600L,
      eventTimeCol: Option[String] = None): DataFrame =
    events
      .withColumn("fp", TextAnalysis.fingerprintCol(col("text")))
      .withColumn("ingest_ts",
        eventTimeCol.map(c => col(c).cast("timestamp"))
          .getOrElse(current_timestamp()))
      .withWatermark("ingest_ts", s"$ttlSeconds seconds")
      .dropDuplicatesWithinWatermark("fp")
      .drop("ingest_ts", "fp")

  /** Streaming NEAR-dup detection over document ingest: formatting-variant
    * and small-edit duplicates that slip past the exact fingerprint are
    * caught at arrival time, not only by the nightly batch pass.
    *
    * Same portable spec as the batch op ([[graft.ops.Dedup
    * .minhashCandidates]]): one codegen'd MinHash signature per doc
    * (Unicode token shingles), banded into `bands` bucket keys; state is
    * keyed by (band, bucket) in `flatMapGroupsWithState` and each arrival
    * emits a [[NearDupLink]] to every remembered member whose signature
    * agreement >= `minJaccard`. Batch and stream therefore agree on what a
    * near-duplicate is — a doc linked here would also pair in the batch
    * LSH join.
    *
    * State is BOUNDED the same two ways as [[StreamingLinkage]]: per-bucket
    * member cap (`maxBucketSize` — also the batch skew defuse: a hot
    * bucket stops accumulating instead of exploding state) and an
    * event-time TTL per bucket, renewed on arrival and fired by watermark
    * advance, so state tracks the ACTIVE bucket set. Duplicates arriving
    * more than `stateTtl` apart are the batch pass's job.
    */
  def nearDupCandidates(
      events: DataFrame,
      numHashes: Int = 32,
      bands: Int = 8,
      minJaccard: Double = 0.5,
      maxBucketSize: Int = 100,
      stateTtl: java.time.Duration = java.time.Duration.ofHours(1),
      eventTimeCol: Option[String] = None): Dataset[NearDupLink] = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "bands must divide numHashes")
    val spark = events.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    val tsCol = eventTimeCol.map(c => col(c).cast("timestamp"))
      .getOrElse(current_timestamp())
    val banded = events
      .select(col("doc_id"), tsCol.as("ts"),
        graft.functions.MinHash.signature(col("text"), numHashes).as("sig"))
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws("_",
            slice(col("sig"), b * rows + 1, lit(rows))), b.cast("string")))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
      .withWatermark("ts", "0 seconds")
      .as[(Long, java.sql.Timestamp, Seq[Long], Int, Long)]

    val ttlMs = stateTtl.toMillis

    banded
      .groupByKey(r => (r._4, r._5))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (_: (Int, Long),
            rws: Iterator[(Long, java.sql.Timestamp, Seq[Long], Int, Long)],
            state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            // read-time TTL: a bucket whose last activity is beyond the
            // TTL horizon is expired EVEN IF new data arrived in the same
            // micro-batch its timeout would have fired in (groups with
            // data are delivered with hasTimedOut=false and their old
            // state intact — without this check a stale member could
            // still link)
            val priorLast = state.getOption.map(_.lastTs).getOrElse(0L)
            var members = state.getOption
              .filter(_ => wm <= priorLast + ttlMs)
              .map(_.members.toVector).getOrElse(Vector.empty)
            val out = Vector.newBuilder[NearDupLink]
            var maxTs = if (members.isEmpty) 0L else priorLast
            rws.foreach { case (id, ts, sig, _, _) =>
              // late rows (event time below the watermark) neither link
              // nor enter state — deterministic mirror of the engine's
              // late-row filtering; at-horizon linkage is the batch
              // pass's job over the archived table
              if (ts.getTime >= wm) {
                if (ts.getTime > maxTs) maxTs = ts.getTime
                members.foreach { m =>
                  if (m.doc_id != id) {
                    var agree = 0
                    var i = 0
                    while (i < sig.length) {
                      if (sig(i) == m.sig(i)) agree += 1
                      i += 1
                    }
                    val est = BigDecimal(agree.toDouble / sig.length)
                      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                    if (est >= minJaccard)
                      out += NearDupLink(
                        math.min(id, m.doc_id), math.max(id, m.doc_id), est)
                  }
                }
                if (members.size < maxBucketSize &&
                    !members.exists(_.doc_id == id)) {
                  members = members :+ BucketMember(id, sig)
                }
              }
            }
            state.update(BucketState(members, maxTs))
            state.setTimeoutTimestamp(math.max(maxTs, wm + 1) + ttlMs)
            out.result().iterator
          }
        })
  }
}
