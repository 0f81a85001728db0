package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.engine.Determinism.r6

/** Streaming twins of the reference pipeline (SURVEY.md §2.2 S1/S2).
  *
  * The reference is a hand-rolled streaming job: a 5 s poll loop
  * (`dataCollector.py:17,220`), per-symbol in-memory OHLC state
  * (`dataCollector.py:20-30,80-94`), an hourly flush on wall-clock
  * rollover (`dataCollector.py:179-191`), and state reset
  * (`dataCollector.py:166-175`). Here that is Structured Streaming:
  * the same *logical* aggregation as the batch `ohlc_hourly`, with the
  * state store, window close, and late-data policy supplied by the
  * engine instead of hand-rolled.
  */
object StreamingOhlc {

  /** A tick as the reference builds it (`dataCollector.py:110-114`). */
  case class Tick(ts: Timestamp, symbol: String, price: Double)

  /** The reference's `running_metrics` dict (`dataCollector.py:21-29`)
    * as an explicit state type for S2.
    */
  case class OhlcState(
      openTs: Long, open: Double, high: Double, low: Double,
      closeTs: Long, close: Double, sum: Double, count: Long)

  /** One flushed row per (window, symbol) — the shape of
    * `downsampled_prices` (`dataCollector.py:62-75`).
    */
  case class OhlcRow(
      symbol: String, windowStart: Timestamp,
      open_price: Double, high_price: Double, low_price: Double,
      close_price: Double, avg_price: Double, sample_count: Long)

  /** S1 `streaming_ohlc` — watermark + tumbling window + append mode.
    * Late ticks beyond 10 min are dropped (the reference can't see
    * late data at all: event time is assigned at fetch,
    * `dataCollector.py:106`). Works on any streaming (or batch)
    * DataFrame with (ts, symbol, price).
    */
  def hourlyOhlcStream(ticks: DataFrame): DataFrame =
    hourlyOhlcOnWatermarked(ticks.withWatermark("ts", "10 minutes"))

  /** The S1 aggregation body over a stream whose watermark is already
    * set upstream (redefining a watermark is disallowed when chaining
    * stateful operators, e.g. dedup → window agg in PollingIngest).
    */
  def hourlyOhlcOnWatermarked(ticks: DataFrame): DataFrame =
    ticks
      .groupBy(window(col("ts"), "1 hour"), col("symbol"))
      .agg(
        min_by(col("price"), col("ts")).as("open_price"),
        max(col("price")).as("high_price"),
        min(col("price")).as("low_price"),
        max_by(col("price"), col("ts")).as("close_price"),
        r6(avg(col("price"))).as("avg_price"),
        count(lit(1)).as("sample_count"))
      .select(col("window.start").as("window_start"), col("symbol"),
        col("open_price"), col("high_price"), col("low_price"),
        col("close_price"), col("avg_price"), col("sample_count"))

  /** S3 `streaming_sessionize` — gap-based session windows on a
    * stream: the E16 batch sessionization as a native
    * `session_window` aggregation (30 min gap), emitting one row per
    * closed session once the watermark passes its end.
    */
  def sessionizeStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** S4 `streaming_dedup` — exactly-once tick landing on an
    * at-least-once transport: drop duplicate (symbol, ts) keys with
    * bounded state via `dropDuplicatesWithinWatermark` — the
    * streaming twin of `dedup_exact`, and the fix for the raw-layer
    * duplication noted on CryptoIngest re-runs.
    */
  def dedupStream(ticks: DataFrame): DataFrame =
    ticks
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("symbol", "ts")

  /** S6 `streaming_range_join` — stream-stream interval join, the
    * streaming twin of the batch `join_range`: purchases join the same
    * user's clicks from the preceding hour. Both sides are
    * watermarked, and the time-range condition bounds exactly how long
    * click state must be retained (clicks older than purchase-watermark
    * − 1 h are evicted) — the canonical bounded-state stream-stream
    * join. Inner join: Spark emits a match as soon as both sides
    * arrive.
    */
  def rangeJoinStream(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.select(col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    p.join(c,
      col("user_id") === col("c_user")
        && col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR")
        && col("click_ts") < col("purchase_ts"))
      .select(col("user_id"), col("purchase_ts"), col("click_ts"))
  }

  /** S6b — left-outer variant of `rangeJoinStream`: purchases with NO
    * qualifying click emit once with a null click_ts, but only after
    * the click-side watermark passes the end of their match interval
    * (the engine must prove no match can still arrive before emitting
    * the null row — the semantics hand-rolled outer stream joins
    * usually get wrong).
    */
  def rangeJoinStreamOuter(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.select(col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    p.join(c,
      col("user_id") === col("c_user")
        && col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR")
        && col("click_ts") < col("purchase_ts"),
      "left_outer")
      .select(col("user_id"), col("purchase_ts"), col("click_ts"))
  }

  /** S2 `streaming_state` — the reference's state machine made
    * explicit: `flatMapGroupsWithState` keyed by (symbol, hour),
    * carrying `OhlcState` (== the dict at `dataCollector.py:21-29`),
    * update logic == `update_running_metrics`
    * (`dataCollector.py:80-94`), flush-on-timeout == the hour
    * rollover + reset (`dataCollector.py:166-191`). Event-time
    * timeout fires when the watermark passes the window end.
    */
  def statefulOhlcStream(ticks: Dataset[Tick]): Dataset[OhlcRow] = {
    import ticks.sparkSession.implicits._
    val hourMs = 3600L * 1000L

    def update(
        key: (String, Long), rows: Iterator[Tick],
        state: GroupState[OhlcState]): Iterator[OhlcRow] = {
      if (state.hasTimedOut) {
        // window closed: flush one row and reset (drop) the state —
        // the reference's store_downsampled_data + reset_running_metrics
        val st = state.get
        state.remove()
        Iterator.single(OhlcRow(
          key._1, new Timestamp(key._2),
          st.open, st.high, st.low, st.close,
          // Determinism.r6 formula (half-up), NOT rint (half-to-even):
          // on an exact 6 dp tie the batch twin would disagree
          math.floor(st.sum / st.count * 1e6 + 0.5) / 1e6, st.count))
      } else {
        var st = state.getOption.getOrElse(
          OhlcState(Long.MaxValue, 0.0, Double.MinValue, Double.MaxValue,
            Long.MinValue, 0.0, 0.0, 0L))
        rows.foreach { t =>
          val ms = t.ts.getTime
          // first-by-time open / last-by-time close (true argmin/argmax,
          // not the reference's falsy-zero check at dataCollector.py:83)
          if (ms < st.openTs) st = st.copy(openTs = ms, open = t.price)
          if (ms > st.closeTs) st = st.copy(closeTs = ms, close = t.price)
          st = st.copy(
            high = math.max(st.high, t.price),
            low = math.min(st.low, t.price),
            sum = st.sum + t.price, count = st.count + 1L)
        }
        state.update(st)
        // flush when the watermark passes the end of this hour window
        state.setTimeoutTimestamp(key._2 + hourMs)
        Iterator.empty
      }
    }

    ticks
      .withWatermark("ts", "10 minutes")
      .groupByKey(t => (t.symbol, t.ts.getTime / hourMs * hourMs))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
