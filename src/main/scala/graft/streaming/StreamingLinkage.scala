package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class TokenEvent(file_id: Long, token: String)
final case class BlockMember(file_id: Long, token: String)
final case class BlockState(members: Seq[BlockMember])
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
  */
object StreamingLinkage {

  def edges(
      spark: SparkSession,
      events: Dataset[TokenEvent],
      maxBlockSize: Int = 1000): Dataset[MatchEdge] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    val keys = graft.pipeline.Blocking
      .blockingKeys(events.toDF())
      .as[(Long, String, String)] // (file_id, token, key)

    keys
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[(Long, String, String)],
            state: GroupState[BlockState]) => {
          var members =
            state.getOption.map(_.members.toVector).getOrElse(Vector.empty)
          val out = Vector.newBuilder[MatchEdge]
          rows.foreach { case (id, token, _) =>
            members.foreach { m =>
              if (m.file_id != id &&
                  graft.pipeline.Scoring.clusterMatch(m.token, token)) {
                out += MatchEdge(
                  math.min(id, m.file_id), math.max(id, m.file_id), key)
              }
            }
            if (members.size < maxBlockSize &&
                !members.exists(_.file_id == id)) {
              members = members :+ BlockMember(id, token)
            }
          }
          state.update(BlockState(members))
          out.result().iterator
        })
  }
}
