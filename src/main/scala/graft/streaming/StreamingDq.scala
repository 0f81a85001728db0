package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S22 `streaming_dq` — the `dq_audit` rule sweep on the ingest
  * path: per closed 1-hour event-time window, counters for each
  * row-local quality rule (null value, negative value, unusable
  * volume) plus the clean-row count — the live feed-health monitor
  * that pages BEFORE a bad drop lands in the lake.
  *
  * One stateful aggregation, conditional sums only (the
  * `dq_audit` one-pass discipline live); no row is ever filtered,
  * so every event — including violating ones — advances the
  * watermark. State per open window is O(4 longs). Referential
  * rules (orphan keys) are deliberately absent here: they need the
  * dimension state and belong to the batch sweep; the split mirrors
  * production monitors (cheap row rules stream, join rules batch).
  */
object StreamingDq {

  /** `events` streaming with (ts TIMESTAMP, value DOUBLE,
    * props STRING). Emits one row per closed hourly window. */
  def dqStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .withColumn("vol", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("value").isNull, 1L).otherwise(0L))
          .as("null_value"),
        sum(when(col("value") < 0.0, 1L).otherwise(0L))
          .as("negative_value"),
        sum(when(col("vol").isNull || col("vol") <= 0L, 1L).otherwise(0L))
          .as("bad_volume"))
      .select(col("window.start").as("window_start"), col("n_events"),
        col("null_value"), col("negative_value"), col("bad_volume"),
        (col("null_value") + col("negative_value") + col("bad_volume")
          === 0L).as("clean"))
}
