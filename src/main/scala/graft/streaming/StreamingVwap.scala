package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Determinism.r6

/** S21 `streaming_vwap` — the batch `vwap_hourly` execution
  * benchmark on the ingest path: per closed (1-hour window × symbol)
  * cell, volume-weighted average price from the same exact integer
  * folds the batch row uses (centi-price × JSON-`k` volume), emitted
  * once at watermark close (append mode).
  *
  * One stateful aggregation; state per open cell is three longs.
  * Ticks without a usable volume (null / non-positive `k`) can't
  * contribute, but they are excluded INSIDE the aggregate
  * (conditional sums) rather than by a row filter — deterministic
  * filters push below EventTimeWatermark, and a dropped row would
  * never advance the watermark (the S14/S20 wake discipline). The
  * ONE fenced division runs row-local after the aggregate with the
  * batch operator's exact expression, so stream == batch bit-for-bit
  * on any replayed slice.
  */
object StreamingVwap {

  /** `events` streaming with (ts TIMESTAMP, event_type STRING,
    * value DOUBLE, props STRING). Emits (window_start, symbol,
    * n_ticks, total_vol, vwap) once per closed hourly cell.
    */
  def vwapStream(events: DataFrame): DataFrame = {
    val withVol = events
      .withWatermark("ts", "10 minutes")
      .withColumn("centi",
        floor(col("value").cast("double") * lit(100.0) + lit(0.5))
          .cast("long"))
      .withColumn("vol",
        get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("ok", col("vol").isNotNull && col("vol") > 0)
    withVol
      .groupBy(window(col("ts"), "1 hour"),
        col("event_type").as("symbol"))
      .agg(
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_ticks"),
        sum(when(col("ok"), col("vol")).otherwise(0L)).as("total_vol"),
        sum(when(col("ok"), col("centi") * col("vol")).otherwise(0L))
          .as("pv_centi"))
      .where(col("total_vol") > 0)
      .select(col("window.start").as("window_start"), col("symbol"),
        col("n_ticks"), col("total_vol"),
        r6(col("pv_centi").cast("double")
          / (lit(100.0) * col("total_vol").cast("double"))).as("vwap"))
  }
}
