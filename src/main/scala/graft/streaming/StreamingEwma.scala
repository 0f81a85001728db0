package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** S15 `streaming_ewma` — the batch `ewma_smooth` (dyadic truncated
  * EWMA-8 per symbol) emitted LIVE, one row per tick, in event-time
  * order, bit-identical to the batch operator.
  *
  * The smoother is order-sensitive (each tick's value depends on the
  * 7 ticks BEFORE it in (ts, event_id) order), so a tick can only be
  * scored once no earlier tick can still arrive: when the watermark
  * has passed its event time. Mechanics: `flatMapGroupsWithState`
  * keyed by symbol; state buffers the not-yet-final ticks (bounded by
  * the watermark horizon) plus the last ≤ 7 finalized prices (the
  * EWMA ring — O(1)). Each invocation drains every tick strictly
  * below the watermark in sorted order, scoring with the identical
  * written fold the batch operator uses (ascending lag k, power-of-two
  * weights — every product exact, so stream == batch to the bit).
  * An event-time timeout re-arms while ticks are pending, so OTHER
  * symbols' watermark advances flush a quiet symbol's buffer — the
  * same wake discipline as S14.
  *
  * Strict `<` finality matters: a row at exactly the watermark is not
  * yet late, so a same-timestamp smaller-event_id sibling could still
  * arrive and would have to sort BEFORE an already-emitted row; ties
  * at the boundary therefore wait one advance.
  */
object StreamingEwma extends Serializable {

  case class PricedTick(ts: Timestamp, symbol: String, price: Double,
      event_id: Long)
  case class EwmaRow(symbol: String, ts: Timestamp, event_id: Long,
      price: Double, ewma: Double)
  case class EwmaState(
      pending: Vector[(Long, Long, Double)], // (tsMs, eventId, price)
      recent: Vector[Double])                // newest-first, ≤ 7

  /** The shared scoring fold: ascending lag index over (current price
    * +: newest-first recents), weight 2^-(k+1), renormalized over the
    * mass present — the batch operator's written op order exactly.
    */
  private[streaming] def score(price: Double, recent: Vector[Double]): Double = {
    var num = 0.0
    var den = 0.0
    var k = 0
    val window = price +: recent
    while (k < window.length && k < 8) {
      val wt = 1.0 / (1L << (k + 1)).toDouble
      num += window(k) * wt
      den += wt
      k += 1
    }
    math.floor(num / den * 1e6 + 0.5) / 1e6
  }

  def ewmaStream(ticks: Dataset[PricedTick]): Dataset[EwmaRow] = {
    import ticks.sparkSession.implicits._

    def update(sym: String, rows: Iterator[PricedTick],
        state: GroupState[EwmaState]): Iterator[EwmaRow] = {
      val st0 = state.getOption.getOrElse(EwmaState(Vector.empty, Vector.empty))
      val incoming = rows.map(t => (t.ts.getTime, t.event_id, t.price)).toVector
      val wm = state.getCurrentWatermarkMs()
      val sorted = (st0.pending ++ incoming).sortBy(t => (t._1, t._2))
      val (ready, still) = sorted.partition(_._1 < wm)
      var recent = st0.recent
      val out = ready.map { case (tsMs, id, p) =>
        val e = score(p, recent)
        recent = (p +: recent).take(7)
        EwmaRow(sym, new Timestamp(tsMs), id, p, e)
      }
      state.update(EwmaState(still, recent))
      // wake on the next watermark advance while anything is buffered
      if (still.nonEmpty) state.setTimeoutTimestamp(wm + 1L)
      out.iterator
    }

    ticks
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
