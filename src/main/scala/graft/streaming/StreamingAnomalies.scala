package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** S10 `streaming_anomalies` — the batch `value_anomalies` gate on
  * the live tick path: flag ticks more than 3σ from their symbol's
  * historical mean AS THEY ARRIVE (the monitoring loop the
  * reference's operator would watch; its daemon logs every poll —
  * `dataCollector.py:203-204` — but never scores one).
  *
  * This is the STATELESS streaming shape, the one the rest of the
  * streaming surface doesn't cover: no window, no watermark, no state
  * store — a broadcast enrichment join against driver-small per-symbol
  * statistics plus a row-local predicate, so every micro-batch is a
  * pure map and emits immediately. Per-symbol μ/σ come from the batch
  * history with the decimal-exact-moments recipe (order-proof sums);
  * refreshing them is a nightly batch job, not stream state.
  */
object StreamingAnomalies {

  /** Per-symbol (mu, sigma) from a static history frame with
    * (symbol, price) — DECIMAL-exact moments, the corr_matrix /
    * value_anomalies recipe. Persisted: the static side of a
    * stream-static join re-evaluates every micro-batch.
    */
  def symbolStats(history: DataFrame): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 6))
    history
      .groupBy(col("symbol"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(col("price"))).cast("double").as("s1"),
        sum(dec(col("price")) * dec(col("price"))).cast("double").as("s2"))
      .select(col("symbol"),
        (col("s1") / col("n")).as("mu"),
        sqrt(col("s2") / col("n")
          - (col("s1") / col("n")) * (col("s1") / col("n"))).as("sigma"))
      .persist()
  }

  /** `ticks` is a streaming frame with (ts, symbol, price); `stats` a
    * static (symbol, mu, sigma) frame from [[symbolStats]]. Emits
    * (ts, symbol, price, z) for |z| > 3 immediately — append mode,
    * zero state. Symbols with σ = 0 (constant history) never flag:
    * a division by zero would yield ±Infinity and flag every tick of
    * a flat-but-moved symbol, so they're filtered explicitly.
    */
  def anomalyStream(ticks: DataFrame, stats: DataFrame): DataFrame =
    ticks
      .join(broadcast(stats.where(col("sigma") > 0.0)), Seq("symbol"))
      .withColumn("z", (col("price") - col("mu")) / col("sigma"))
      .where(abs(col("z")) > 3.0)
      .select(col("ts"), col("symbol"), col("price"), col("z"))
}
