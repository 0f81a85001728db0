package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** S14 `streaming_gapfill` — the batch `gapfill_resample` (1-minute
  * grid + last-observation-carried-forward per symbol) emitted LIVE:
  * each grid minute is appended exactly once, as soon as it is final.
  *
  * A grid minute m is final when (a) the watermark has passed m — no
  * tick with ts ≤ m can still arrive — and (b) some tick at or after
  * m has been seen (the batch grid ends at the symbol's max tick
  * minute, so emission never runs ahead of the data; the minutes
  * between two distant ticks emit when the later tick lands or when
  * the watermark catches up, whichever is later). Minutes before the
  * first tick never emit, matching the batch inner ASOF semantics.
  *
  * Mechanics: `flatMapGroupsWithState` keyed by symbol. State holds
  * the not-yet-consumed ticks, the running (last tick, price) fill,
  * and the next minute to emit; each invocation drains every final
  * minute. Watermark advances WITHOUT new ticks for a symbol (other
  * symbols' events move it) must still emit that symbol's pending
  * minutes — an event-time timeout re-arms on the next un-emitted
  * minute each call, so the group wakes exactly when its next slot
  * becomes final. Equal-timestamp ticks break ties by event_id, the
  * batch operator's window order. State is O(pending ticks inside
  * the watermark horizon) per symbol.
  */
object StreamingGapfill extends Serializable {

  case class PricedEvent(ts: Timestamp, symbol: String, price: Double,
      event_id: Long)
  case class GapRow(symbol: String, m: Timestamp, price: Double,
      last_tick_ts: Timestamp)
  case class GapState(
      pending: Vector[(Long, Long, Double)], // (tsMs, eventId, price)
      hasLast: Boolean, lastTs: Long, lastPrice: Double,
      nextEmit: Long, // next grid minute (ms); -1 until origin known
      maxTick: Long)  // max tick ts seen (ms)

  private val MinuteMs = 60000L

  def gapfillStream(ticks: Dataset[PricedEvent]): Dataset[GapRow] = {
    import ticks.sparkSession.implicits._

    def update(sym: String, rows: Iterator[PricedEvent],
        state: GroupState[GapState]): Iterator[GapRow] = {
      val st0 = state.getOption.getOrElse(
        GapState(Vector.empty, hasLast = false, 0L, 0.0, -1L, Long.MinValue))
      val incoming = rows.map(t => (t.ts.getTime, t.event_id, t.price)).toVector
      var st = st0.copy(
        pending = st0.pending ++ incoming,
        maxTick = (st0.maxTick +: incoming.map(_._1)).max)
      val wm = state.getCurrentWatermarkMs()
      val out = Vector.newBuilder[GapRow]
      val sorted = st.pending.sortBy(t => (t._1, t._2))
      var idx = 0
      var hasLast = st.hasLast
      var lastTs = st.lastTs
      var lastPrice = st.lastPrice
      var next =
        if (st.nextEmit >= 0) st.nextEmit
        else if (sorted.nonEmpty) sorted.head._1 / MinuteMs * MinuteMs
        else -1L
      // a minute is final once the watermark AND the seen data both
      // pass it (emission never runs ahead of the symbol's last tick)
      val cap = math.min(wm, st.maxTick)
      while (next >= 0 && next <= cap) {
        while (idx < sorted.length && sorted(idx)._1 <= next) {
          val t = sorted(idx)
          hasLast = true; lastTs = t._1; lastPrice = t._3
          idx += 1
        }
        if (hasLast)
          out += GapRow(sym, new Timestamp(next), lastPrice,
            new Timestamp(lastTs))
        next += MinuteMs
      }
      st = st.copy(pending = sorted.drop(idx), hasLast = hasLast,
        lastTs = lastTs, lastPrice = lastPrice,
        nextEmit = if (next >= 0) next else st.nextEmit)
      state.update(st)
      // wake when the watermark passes the next un-emitted slot, even
      // if no further tick for this symbol ever arrives
      val target = if (st.nextEmit >= 0) st.nextEmit else wm + MinuteMs
      state.setTimeoutTimestamp(math.max(target, wm + 1L))
      out.result().iterator
    }

    ticks
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
