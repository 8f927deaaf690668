package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with explicit keyed state — the
  * `flatMapGroupsWithState` counterpart of the batch window formulation
  * in [[Sessionize]]. One state entry per user holds the open session;
  * completed sessions are emitted as soon as a gap-crossing event (or a
  * state timeout) closes them.
  *
  * At scale the state store shards by the group key, so this is the
  * shape that handles unbounded users with bounded memory per
  * micro-batch — exactly what the batch window (which must see a user's
  * whole history) cannot do on an infinite stream.
  */
object StatefulSessionize {

  case class Event(user_id: Long, event_id: Long, ts_us: Long, value: Double)

  case class OpenSession(
      sessionSeq: Int, startTs: Long, lastTs: Long, n: Long,
      firstEvent: Long, sumValue: Double)

  case class SessionOut(
      user_id: Long, session_seq: Int, n_events: Long, duration_us: Long,
      first_event_id: Long, total_value: Double)

  /** Fold a user's batch of events into sessions. Events inside a batch
    * arrive unordered — sort before folding. Emits every session closed
    * by a gap within/across batches; the open session stays in state.
    */
  def sessionize(gapUs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var open = state.getOption.orNull
    val closed = Seq.newBuilder[SessionOut]
    for (e <- sorted) {
      if (open == null) {
        open = OpenSession(1, e.ts_us, e.ts_us, 1, e.event_id, e.value)
      } else if (e.ts_us - open.lastTs > gapUs) {
        closed += SessionOut(userId, open.sessionSeq, open.n,
          open.lastTs - open.startTs, open.firstEvent, open.sumValue)
        open = OpenSession(open.sessionSeq + 1, e.ts_us, e.ts_us, 1,
          e.event_id, e.value)
      } else {
        // a late cross-batch event (ts <= lastTs) is absorbed into the
        // open session WITHOUT regressing its clock — letting lastTs move
        // backwards would cause spurious splits on the next on-time event
        // and negative durations
        open = open.copy(
          startTs = math.min(open.startTs, e.ts_us),
          lastTs = math.max(open.lastTs, e.ts_us),
          n = open.n + 1,
          sumValue = open.sumValue + e.value)
      }
    }
    state.update(open)
    closed.result().iterator
  }

  /** Wire onto a typed event stream (append mode). */
  def sessions(events: Dataset[Event], gapUs: Long): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(sessionize(gapUs))
  }
}
