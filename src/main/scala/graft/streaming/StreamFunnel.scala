package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Relational.funnel` (ordered stage progression
  * per user) as `flatMapGroupsWithState` custom state: one fixed-size
  * record per user — the per-stage earliest completion times — so
  * state is O(users × stages) regardless of event volume, and each
  * micro-batch emits the user's updated funnel row only when a stage
  * completes (update semantics, monotone output).
  *
  * Each batch's events for a user are processed in event-time order
  * (sorted within the batch — bounded by the batch, never the
  * stream), applying the same greedy earliest-completion recursion as
  * the batch operator: stage i completes at the first event of its
  * type strictly after stage i−1's completion. Within one drained
  * batch this IS the batch funnel (parity-tested); across batches the
  * fold is exact for in-order arrival, and a cross-batch late event
  * can only miss an improvement (bounded by the source's
  * disorder/watermark, the standard trade of O(1) state vs buffering
  * every event).
  */
object StreamFunnel {

  case class FunnelEvent(user_id: Long, us: Long, event_type: String)
  case class FunnelRow(user_id: Long, times: Seq[Long], stages_completed: Long)

  def funnel(
      spark: SparkSession,
      events: Dataset[FunnelEvent],
      stages: Seq[String]): Dataset[FunnelRow] = {
    import spark.implicits._
    val k = stages.length
    val stageOf = stages.zipWithIndex.toMap
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Long], FunnelRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[Array[Long]]) =>
          val times = state.getOption.getOrElse(Array.fill(k)(0L))
          val before = times.toSeq
          rows.toSeq.sortBy(e => (e.us, e.event_type)).foreach { e =>
            stageOf.get(e.event_type).foreach { i =>
              val prevDone = i == 0 || times(i - 1) != 0L
              val after = i == 0 || e.us > times(i - 1)
              if (times(i) == 0L && prevDone && after) times(i) = e.us
            }
          }
          if (times.toSeq != before) {
            state.update(times)
            Iterator.single(FunnelRow(user, times.toSeq,
              times.count(_ != 0L).toLong))
          } else Iterator.empty
      }
  }
}
