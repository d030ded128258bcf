package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class TokenEvent(file_id: Long, token: String)

/** A block's remembered member: raw token plus its unbounded-Metaphone and
  * MRA codes, cached at arrival time so matching a future arrival against
  * this member never re-encodes (the codes are computed ONCE per key row,
  * in the codegen'd projection — not O(state members) times per event).
  */
final case class BlockMember(file_id: Long, token: String,
    metaphone: String, mra: String)

/** `lastTs` = the block's newest event time, checked against the
  * watermark at READ time (see [[BucketState]] for the same-batch
  * timeout race it closes).
  */
final case class BlockState(members: Seq[BlockMember], lastTs: Long)
final case class MatchEdge(src: Long, dst: Long, key: String)

/** Incremental record linkage over a stream of (file_id, token) events.
  *
  * The blocking-key fanout reuses the exact batch projection
  * ([[graft.pipeline.Blocking.blockingKeys]] — stateless, so Structured
  * Streaming runs it unchanged per micro-batch); matching is stateful:
  * each blocking key's group keeps the members seen so far (capped at
  * `maxBlockSize`, the same skew defuse as batch) in
  * `flatMapGroupsWithState`, and every arrival emits an edge to each
  * state member it matches under the batch clustering criterion
  * ([[graft.pipeline.Scoring.clusterMatch]]). Records arriving in
  * different micro-batches therefore still link — the streaming
  * equivalent of the batch self-join.
  *
  * State is BOUNDED: events are stamped with an ingest timestamp +
  * watermark, and each block key's state carries an event-time TTL
  * (`stateTtl`) renewed on every arrival; once the stream's watermark
  * moves `stateTtl` past a block's last activity, the state-store timeout
  * evicts it. State size therefore tracks the ACTIVE key set, not every
  * key ever seen (BM/DM multi-codes fan each token into many keys —
  * without eviction a long-running stream's checkpoints grow forever).
  * Event-time (not processing-time) timeout is deliberate: timeouts fire
  * on watermark advancement, so an idle query does not spin no-data
  * micro-batches. Recall tradeoff (documented): two records of the same
  * entity arriving more than `stateTtl` apart no longer co-block
  * in-stream — at that horizon linkage is the batch pipeline's job over
  * the archived table.
  */
object StreamingLinkage {

  def edges(
      spark: SparkSession,
      events: Dataset[TokenEvent],
      maxBlockSize: Int = 1000,
      stateTtl: java.time.Duration = java.time.Duration.ofHours(1)): Dataset[MatchEdge] =
    edgesWithTime(spark, events.toDF(), maxBlockSize, stateTtl,
      eventTimeCol = None)

  /** [[edges]] over a DataFrame of (file_id, token[, event-time]) — the
    * production shape, where the watermark advances on the SOURCE's
    * event-time column and late/out-of-order arrivals are well defined.
    * Late rows (event time below the watermark) neither link nor enter
    * state; a block whose last activity is past `stateTtl` is expired at
    * read time, so its members never link even in the micro-batch whose
    * timeout would have evicted them.
    */
  def edgesWithTime(
      spark: SparkSession,
      events: org.apache.spark.sql.DataFrame,
      maxBlockSize: Int = 1000,
      stateTtl: java.time.Duration = java.time.Duration.ofHours(1),
      eventTimeCol: Option[String] = None): Dataset[MatchEdge] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col, current_timestamp, lit}
    graft.functions.GraftFunctions.register(spark)

    // phonetic codes computed ONCE per key row inside the codegen'd
    // projection — the state function below only compares cached codes.
    // The event-time column rides through the key fanout via `carry`.
    val keys = graft.pipeline.Blocking
      .blockingKeys(events, carry = eventTimeCol.toSeq)
      .withColumn("metaphone",
        call_function("graft_metaphone", col("token"), lit(0)))
      .withColumn("mra", call_function("graft_mra_encode", col("token")))
      .withColumn("ts",
        eventTimeCol.map(c => col(c).cast("timestamp"))
          .getOrElse(current_timestamp()))
      .select(col("file_id"), col("token"), col("key"),
        col("metaphone"), col("mra"), col("ts"))
      .withWatermark("ts", "0 seconds")
      .as[(Long, String, String, String, String, java.sql.Timestamp)]

    val ttlMs = stateTtl.toMillis

    keys
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (key: String,
            rows: Iterator[(Long, String, String, String, String, java.sql.Timestamp)],
            state: GroupState[BlockState]) => {
          if (state.hasTimedOut) {
            // idle block: evict its member list entirely
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            // read-time TTL (see BucketState doc): stale members must not
            // link even when data and timeout land in the same batch
            val priorLast = state.getOption.map(_.lastTs).getOrElse(0L)
            var members = state.getOption
              .filter(_ => wm <= priorLast + ttlMs)
              .map(_.members.toVector).getOrElse(Vector.empty)
            val out = Vector.newBuilder[MatchEdge]
            var maxTs = if (members.isEmpty) 0L else priorLast
            rows.foreach { case (id, token, _, meta, mra, ts) =>
              // late rows: the batch pass's job over the archived table
              if (ts.getTime >= wm) {
                if (ts.getTime > maxTs) maxTs = ts.getTime
                members.foreach { m =>
                  if (m.file_id != id &&
                      graft.pipeline.Scoring.clusterMatchCoded(
                        m.token, m.metaphone, m.mra, token, meta, mra)) {
                    out += MatchEdge(
                      math.min(id, m.file_id), math.max(id, m.file_id), key)
                  }
                }
                if (members.size < maxBlockSize &&
                    !members.exists(_.file_id == id)) {
                  members = members :+ BlockMember(id, token, meta, mra)
                }
              }
            }
            state.update(BlockState(members, maxTs))
            // renew the TTL from this block's newest event (must stay
            // ahead of the current watermark)
            state.setTimeoutTimestamp(math.max(maxTs, wm + 1) + ttlMs)
            out.result().iterator
          }
        })
  }
}
