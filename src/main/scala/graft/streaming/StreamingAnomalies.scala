package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * (symbol, price) — `Determinism.muSigma`: decimal-exact moments
    * with the variance numerator kept IN DECIMAL, so a flat-history
    * symbol gets σ = exactly 0 (the double form rounds to ±1e-18 on
    * constant groups; sqrt of the negative side is NaN, and Spark's
    * `NaN > 0.0` is TRUE, so a σ > 0 guard would silently pass and
    * flag every tick of the symbol). Persisted: the static side of a
    * stream-static join re-evaluates every micro-batch.
    *
    * Lifecycle is CALLER-OWNED: the returned frame stays pinned in
    * the block manager until `unpersist()`. For the nightly-refresh
    * pattern, build the new stats frame, swap it into the stream's
    * enrichment side, then unpersist the PREVIOUS frame — otherwise
    * each refresh leaks one cached copy of the stats table.
    */
  def symbolStats(history: DataFrame): DataFrame =
    graft.engine.Determinism
      // scale 6, not the default 2: sub-cent crypto prices (ALT coins
      // at $0.03xx) would flatten to a constant at 2 dp, zero their
      // variance, and silently vanish from monitoring through the
      // σ > 0 guard. The scale-6 width budget bounds Σv² < 10¹³ —
      // window the history (per-day stats) rather than feeding years
      .muSigma(history.withColumnRenamed("price", "value"),
        "symbol", "value", scale = 6)
      .select(col("symbol"), col("mu"), col("sigma"))
      .persist()

  /** `ticks` is a streaming frame with (ts, symbol, price); `stats` a
    * static (symbol, mu, sigma) frame from [[symbolStats]]. Emits
    * (ts, symbol, price, z) for |z| > 3 immediately — append mode,
    * zero state.
    *
    * Monitoring scope is EXACTLY the stats frame's symbols (inner
    * join): σ = 0 symbols (constant history — the exact-decimal zero
    * makes this guard sound) and symbols absent from the history both
    * pass unscored. The latter matters operationally — a newly listed
    * symbol is unmonitored until the nightly stats refresh — so route
    * `ticks.join(stats, Seq("symbol"), "left_anti")` to a coverage
    * alarm; silently widening this join would instead flag every tick
    * of an unknown symbol or emit NaN z-scores.
    */
  def anomalyStream(ticks: DataFrame, stats: DataFrame): DataFrame =
    ticks
      .join(broadcast(stats.where(col("sigma") > 0.0)), Seq("symbol"))
      .withColumn("z", (col("price") - col("mu")) / col("sigma"))
      .where(abs(col("z")) > 3.0)
      .select(col("ts"), col("symbol"), col("price"), col("z"))
}
