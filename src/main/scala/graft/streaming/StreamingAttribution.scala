package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** S19 `streaming_attribution` — the batch `attribution_last_touch`
  * verdict emitted LIVE, one row per purchase: was it within the 24 h
  * lookback of the user's most recent click, and with what gap.
  *
  * Attribution is order-sensitive in the same way the funnel is (the
  * carried last-click must be the final event-time-latest click
  * before the purchase), so events settle only strictly below the
  * watermark and fold in (ts, event_id) order — the S15/S18 finality
  * discipline. Folding in order makes the carried click IDENTICAL to
  * the batch operator's `last(click, ignoreNulls)` over the sorted
  * window, including the strict `<` at equal timestamps (the click
  * sorts first via the tag/event order, the purchase's `gap > 0`
  * test then rejects it on both paths).
  *
  * State per user: the horizon-bounded pending buffer plus ONE long
  * (the last settled click time) — the streaming state floor for
  * last-touch; completed purchases hold no state. Watermark-late
  * events are engine-dropped before the operator, so a late click
  * can never retroactively re-attribute an emitted purchase.
  */
object StreamingAttribution extends Serializable {

  case class TouchEvent(ts: Timestamp, user_id: Long, event_type: String,
      event_id: Long)
  case class AttributionRow(user_id: Long, purchase_event_id: Long,
      ts: Timestamp, attributed: Boolean, gap_us: Long)
  case class TouchState(
      pending: Vector[(Long, Long, String)], // (tsMs, eventId, type)
      lastClickMs: Option[Long])

  private val WindowMs = 24L * 3600L * 1000L

  def attributionStream(events: Dataset[TouchEvent])
      : Dataset[AttributionRow] = {
    import events.sparkSession.implicits._

    def update(uid: Long, rows: Iterator[TouchEvent],
        state: GroupState[TouchState]): Iterator[AttributionRow] = {
      val st0 = state.getOption.getOrElse(TouchState(Vector.empty, None))
      val incoming =
        rows.map(e => (e.ts.getTime, e.event_id, e.event_type)).toVector
      val wm = state.getCurrentWatermarkMs()
      val sorted = (st0.pending ++ incoming).sortBy(t => (t._1, t._2))
      val (ready, still) = sorted.partition(_._1 < wm)
      var lastClick = st0.lastClickMs
      val out = Vector.newBuilder[AttributionRow]
      ready.foreach { case (tsMs, id, typ) =>
        typ match {
          case "click" => lastClick = Some(tsMs)
          case "purchase" =>
            val attr = lastClick.exists(c => c < tsMs && tsMs - c <= WindowMs)
            out += AttributionRow(uid, id, new Timestamp(tsMs), attr,
              if (attr) (tsMs - lastClick.get) * 1000L else 0L)
          case _ => ()
        }
      }
      state.update(TouchState(still, lastClick))
      if (still.nonEmpty) state.setTimeoutTimestamp(wm + 1L)
      out.result().iterator
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
