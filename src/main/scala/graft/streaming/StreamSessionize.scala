package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Relational.sessionize`: per-user max-gap
  * session assignment with O(1) custom state — just (last event time,
  * current session index) per user, vs `session_window`'s per-open-
  * window state. Every event is emitted exactly once, labeled with
  * its 1-based per-user session index (append semantics).
  *
  * Each micro-batch's events are folded in event-time order (sorted
  * within the batch); the fold across batches is exact for in-order
  * arrival — a cross-batch late event would start a new session that
  * an offline pass might have merged, the standard price of O(1)
  * state (the batch operator is the offline authority; parity-tested
  * on a drained stream).
  */
object StreamSessionize {

  case class SessEvent(user_id: Long, us: Long, event_id: Long)
  case class SessRow(user_id: Long, event_id: Long, us: Long, session_idx: Long)
  case class SessState(lastUs: Long, idx: Long)

  def sessionize(
      spark: SparkSession,
      events: Dataset[SessEvent],
      maxGapSec: Long): Dataset[SessRow] = {
    import spark.implicits._
    val gapUs = maxGapSec * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[SessState]) =>
          var s = state.getOption.getOrElse(SessState(Long.MinValue, 0L))
          val out = rows.toSeq.sortBy(e => (e.us, e.event_id)).map { e =>
            s =
              if (s.idx == 0L || e.us - s.lastUs > gapUs)
                SessState(e.us, s.idx + 1)
              else SessState(e.us, s.idx)
            SessRow(user, e.event_id, e.us, s.idx)
          }
          state.update(s)
          out.iterator
      }
  }
}
