package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** S18 `streaming_funnel` — the batch `funnel_steps` state machine
  * (view → click → purchase, 24 h conversion window per step) emitted
  * LIVE: one row per completed step per user, in event-time order,
  * agreeing with the batch operator on closed data.
  *
  * The funnel is order-sensitive (step k qualifies only against the
  * FINAL step-(k−1) time, which is the event-time minimum), so an
  * event is folded only once no earlier event can still arrive —
  * strictly below the watermark, the S15 finality discipline. Folding
  * in (ts, event_id) order makes "first qualifying event seen" equal
  * the batch per-step `min` aggregations exactly: the first view IS
  * min(view ts); a click is tested against that settled view time
  * with the identical strict-after/within-24 h predicate.
  *
  * Mechanics: `flatMapGroupsWithState` keyed by user. State = the
  * not-yet-final event buffer (bounded by the watermark horizon) plus
  * three step-time scalars — O(1) per user once the horizon drains,
  * the same per-user scalar floor the batch funnel's step tables
  * carry. A completed funnel drops its buffer and stops re-arming;
  * otherwise an event-time timeout re-arms so other users' watermark
  * advances flush a quiet user's pending events (the S14/S15 wake
  * discipline). Events already behind the watermark on arrival are
  * dropped by the engine before the operator (pinned in the spec), so
  * settled steps can never be rewritten by late data — the funnel
  * only ever extends forward.
  */
object StreamingFunnel extends Serializable {

  case class FunnelEvent(ts: Timestamp, user_id: Long, event_type: String,
      event_id: Long)
  case class StepRow(user_id: Long, step: Int, step_name: String,
      ts: Timestamp)
  case class FunnelState(
      pending: Vector[(Long, Long, String)], // (tsMs, eventId, type)
      tView: Option[Long], tClick: Option[Long], tPurchase: Option[Long])

  private val WindowMs = 24L * 3600L * 1000L

  /** One event through the step machine: returns the updated state
    * and the completed step (1/2/3) if this event settled one.
    */
  private[streaming] def fold(st: FunnelState, tsMs: Long,
      typ: String): (FunnelState, Option[Int]) = typ match {
    case "view" if st.tView.isEmpty =>
      (st.copy(tView = Some(tsMs)), Some(1))
    case "click" if st.tView.isDefined && st.tClick.isEmpty &&
        tsMs > st.tView.get && tsMs <= st.tView.get + WindowMs =>
      (st.copy(tClick = Some(tsMs)), Some(2))
    case "purchase" if st.tClick.isDefined && st.tPurchase.isEmpty &&
        tsMs > st.tClick.get && tsMs <= st.tClick.get + WindowMs =>
      (st.copy(tPurchase = Some(tsMs)), Some(3))
    case _ => (st, None)
  }

  def funnelStream(events: Dataset[FunnelEvent]): Dataset[StepRow] = {
    import events.sparkSession.implicits._

    def update(uid: Long, rows: Iterator[FunnelEvent],
        state: GroupState[FunnelState]): Iterator[StepRow] = {
      val st0 = state.getOption
        .getOrElse(FunnelState(Vector.empty, None, None, None))
      val incoming =
        rows.map(e => (e.ts.getTime, e.event_id, e.event_type)).toVector
      val wm = state.getCurrentWatermarkMs()
      val sorted = (st0.pending ++ incoming).sortBy(t => (t._1, t._2))
      val (ready, still) = sorted.partition(_._1 < wm)
      var st = st0
      val out = Vector.newBuilder[StepRow]
      ready.foreach { case (tsMs, _, typ) =>
        val (next, done) = fold(st, tsMs, typ)
        st = next
        done.foreach { k =>
          out += StepRow(uid, k,
            k match { case 1 => "view"; case 2 => "click"
                      case _ => "purchase" },
            new Timestamp(tsMs))
        }
      }
      val complete = st.tPurchase.isDefined
      state.update(st.copy(pending = if (complete) Vector.empty else still))
      if (!complete && still.nonEmpty) state.setTimeoutTimestamp(wm + 1L)
      out.result().iterator
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
