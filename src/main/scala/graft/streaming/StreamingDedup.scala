package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.TextAnalysis

/** A band bucket's remembered member: doc id + full MinHash signature, so
  * an arrival's estimated Jaccard against it needs no re-tokenization.
  */
final case class BucketMember(doc_id: Long, sig: Seq[Long])
final case class BucketState(members: Seq[BucketMember])

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
    */
  def dedupe(events: DataFrame, ttlSeconds: Long = 3600L): DataFrame =
    events
      .withColumn("fp", TextAnalysis.fingerprintCol(col("text")))
      .withColumn("ingest_ts", current_timestamp())
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
      stateTtl: java.time.Duration = java.time.Duration.ofHours(1)): Dataset[NearDupLink] = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "bands must divide numHashes")
    val spark = events.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    val banded = events
      .select(col("doc_id"),
        graft.functions.MinHash.signature(col("text"), numHashes).as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws("_",
            slice(col("sig"), b * rows + 1, lit(rows))), b.cast("string")))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
      .withColumn("ts", current_timestamp())
      .withWatermark("ts", "0 seconds")
      .as[(Long, Seq[Long], Int, Long, java.sql.Timestamp)]

    val ttlMs = stateTtl.toMillis

    banded
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (_: (Int, Long),
            rws: Iterator[(Long, Seq[Long], Int, Long, java.sql.Timestamp)],
            state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var members =
              state.getOption.map(_.members.toVector).getOrElse(Vector.empty)
            val out = Vector.newBuilder[NearDupLink]
            var maxTs = 0L
            rws.foreach { case (id, sig, _, _, ts) =>
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
            state.update(BucketState(members))
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(maxTs, wm + 1) + ttlMs)
            out.result().iterator
          }
        })
  }
}
