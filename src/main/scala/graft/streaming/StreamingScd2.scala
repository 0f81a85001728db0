package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** S27 `streaming_scd2` — the live twin of the batch `scd2_history`
  * build: a per-user version machine that turns the event stream into
  * type-2 dimension rows as they CLOSE. Each user's state holds the
  * one open version (attribute value, valid_from, event count); when
  * an arriving event carries a different `event_type`, the open
  * version closes — emitted with `valid_to` = the new version's start
  * — and the machine re-opens on the new value. The open version is
  * never emitted (it is by definition not final); a warehouse reads
  * closed rows from the stream and the current row from state /
  * the batch twin — exactly the split `scd2_history`'s `is_current`
  * column encodes.
  *
  * Ordering contract (the eager-rollover posture of the S25 OHLC
  * machine): rows are folded in (ts, event_id) order WITHIN each
  * micro-batch, so intra-batch disorder is free; ACROSS batches the
  * fold is arrival-ordered — an event older than the open version's
  * start that arrives after a type change would start a new version
  * rather than rewrite a closed one (closed rows are immutable, the
  * append-only contract). Feed order-preserving sources (the 5 s
  * polling ingest) or reconcile with the batch twin downstream.
  *
  * State is O(1) per user — one open version, no event history — so
  * the machine is 100 TB-honest: state size tracks the USER universe,
  * not the event tape.
  */
object StreamingScd2 {

  case class UserEvent(ts: Timestamp, event_id: Long, user_id: Long,
      event_type: String)

  case class OpenVersion(attr: String, fromUs: Long, n: Long,
      version: Long)

  case class ClosedVersion(user_id: Long, version: Long,
      attr_value: String, valid_from_us: Long, valid_to_us: Long,
      n_events: Long)

  /** Closed SCD2 versions per user, append mode. */
  def scd2Stream(events: Dataset[UserEvent]): Dataset[ClosedVersion] = {
    implicit val closedEnc = Encoders.product[ClosedVersion]
    implicit val stateEnc = Encoders.product[OpenVersion]
    implicit val keyEnc = Encoders.scalaLong

    def update(user: Long, rows: Iterator[UserEvent],
        state: GroupState[OpenVersion]): Iterator[ClosedVersion] = {
      // intra-batch total order; a micro-batch's group is bounded by
      // that user's trigger arrivals, not history
      val sorted = rows.toSeq
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      val out = Seq.newBuilder[ClosedVersion]
      var cur = state.getOption.orNull
      sorted.foreach { e =>
        // exact µs (the batch twin's unix_micros grain): seconds from
        // getTime, sub-second from nanos — getTime*1000 would floor
        // sub-ms event times
        val us =
          math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
        if (cur == null)
          cur = OpenVersion(e.event_type, us, 1L, 1L)
        else if (cur.attr == e.event_type)
          cur = cur.copy(n = cur.n + 1L)
        else {
          out += ClosedVersion(user, cur.version, cur.attr,
            cur.fromUs, us, cur.n)
          cur = OpenVersion(e.event_type, us, 1L, cur.version + 1L)
        }
      }
      if (cur != null) state.update(cur)
      out.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
